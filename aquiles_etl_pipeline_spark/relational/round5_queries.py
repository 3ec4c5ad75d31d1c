"""Round-5 catalog entries: mergeable-sketch rollups and set algebra
(exact bitmaps), per-group top-k, weighted systematic sampling,
recursive hierarchy rollup, ledger correction/dedup balances, the
pre-1970 floor-bucket range join, and a decimal-safe joined OLS fit —
each driver-graded against a DuckDB oracle.

These extend the scale-pattern bank after the r04 verdict: the two
bitmap entries prove the re-aggregatable-sketch contract (materialize
fine, merge coarse) and set algebra without id-grain shuffles; the
recursive rollup covers the one relational surface Spark lacks natively
(recursive CTEs) with a bounded iterative join loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .catalog import load, register


# ---------------------------------------------------------------------------
# q146: mergeable bitmap rollup (hour -> day distinct users)
# ---------------------------------------------------------------------------

@register(
    "q146_hll_merge_rollup",
    sql="""
    WITH fine AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             strftime(ts, '%Y-%m-%d %H') AS hour,
             COUNT(DISTINCT user_id) AS nd
      FROM events GROUP BY 1, 2
    ),
    coarse AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             COUNT(DISTINCT user_id) AS cd
      FROM events GROUP BY 1
    )
    SELECT f.day,
           COUNT(*) AS n_fine,
           CAST(SUM(f.nd) AS BIGINT) AS sum_fine_distinct,
           CAST(MIN(c.cd) AS BIGINT) AS coarse_distinct,
           CAST(SUM(f.nd) AS DOUBLE) / COUNT(*) AS avg_fine_distinct,
           (CAST(SUM(f.nd) AS DOUBLE) / COUNT(*)) / MIN(c.cd) AS ratio
    FROM fine f JOIN coarse c USING (day)
    GROUP BY f.day
    """,
    doc="Re-aggregatable-sketch rollup under the gate (sketches."
        "bitmap_rollup): hourly distinct-user bitmaps MERGE (bit_or "
        "semilattice) into daily distincts — the fine grain is scanned "
        "once and every coarser grain is answered from its word frame, "
        "never from raw rows.  This is the contract that makes "
        "HLL/Theta sketch tables the backbone of petabyte rollups, "
        "kept exact (bitmaps) so the oracle grades values: per day, "
        "hour count, summed hourly DAU, exact daily DAU, and the "
        "avg-hourly/daily stickiness ratio.  Shuffles carry words "
        "(<= users/64 per hour), not user ids.",
    tags=("sketch", "rollup", "events"),
)
def q146(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sketches import bitmap_rollup

    e = load(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.date_format("ts", "yyyy-MM-dd HH").alias("hour"),
        "user_id",
    )
    return bitmap_rollup(e, fine_col="hour", coarse_col="day", id_col="user_id")


# ---------------------------------------------------------------------------
# q147: exact set algebra over event-type audiences
# ---------------------------------------------------------------------------

@register(
    "q147_theta_sketch_set_ops",
    sql="""
    WITH sets AS (
      SELECT DISTINCT event_type, user_id FROM events
      WHERE user_id IS NOT NULL
    ),
    sizes AS (SELECT event_type, COUNT(*) AS n FROM sets GROUP BY 1),
    inter AS (
      SELECT a.event_type AS set_a, b.event_type AS set_b,
             COUNT(*) AS n_inter
      FROM sets a
      JOIN sets b ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT sa.event_type AS set_a,
           sb.event_type AS set_b,
           CAST(sa.n AS BIGINT) AS n_a,
           CAST(sb.n AS BIGINT) AS n_b,
           CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
           CAST(sa.n + sb.n - COALESCE(i.n_inter, 0) AS BIGINT) AS n_union,
           CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
             / (sa.n + sb.n - COALESCE(i.n_inter, 0)) AS jaccard
    FROM sizes sa
    JOIN sizes sb ON sa.event_type < sb.event_type
    LEFT JOIN inter i
      ON i.set_a = sa.event_type AND i.set_b = sb.event_type
    """,
    doc="Exact audience set algebra under the gate (sketches."
        "bitmap_set_cardinalities): for every unordered event-type "
        "pair, |A|, |B|, |A n B|, |A u B|, and Jaccard — the Theta-"
        "sketch set-operation surface (cohort overlap) kept exact with "
        "64-bit bitmap words.  Each label collapses to words in one "
        "pass; intersections popcount `a & b` after a WORD-INDEX "
        "equi-join, so ids are never re-shuffled — L^2/2 word-pair "
        "rows of 16 bytes replace L^2 id-grain distinct joins.  The "
        "label-pair scaffold is a deliberate |labels|^2 cross join "
        "(5x5 here) so DISJOINT pairs still report, with n_inter 0.",
    tags=("sketch", "setops", "events"),
)
def q147(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sketches import bitmap_set_cardinalities

    e = load(spark, sf_dir, "events").select("event_type", "user_id")
    return bitmap_set_cardinalities(e, set_col="event_type", id_col="user_id")

# ---------------------------------------------------------------------------
# q148: per-group top-k terms
# ---------------------------------------------------------------------------

@register(
    "q148_top_terms_by_nation",
    sql="""
    WITH words AS (
      SELECT p_brand, UNNEST(string_split(p_name, ' ')) AS word FROM part
    ),
    cnt AS (
      SELECT p_brand, word, COUNT(*) AS cnt FROM words
      WHERE word <> '' GROUP BY 1, 2
    ),
    rk AS (
      SELECT p_brand, word, cnt,
             row_number() OVER (
               PARTITION BY p_brand ORDER BY cnt DESC, word) AS rnk
      FROM cnt
    )
    SELECT p_brand, word, CAST(cnt AS BIGINT) AS cnt,
           CAST(rnk AS BIGINT) AS rnk
    FROM rk WHERE rnk <= 3
    """,
    doc="Per-group top-k (top 3 name terms per brand): the two-stage "
        "shape that survives scale — raw rows collapse to the "
        "(group, term) aggregate grain FIRST (map-side combinable "
        "count), and the rank window runs over that vocabulary-sized "
        "grain, never over raw rows; rank<=3 cuts inside the window "
        "operator (TopK sort per group), and the deterministic "
        "(cnt DESC, word) tiebreak keeps the answer engine- and "
        "partitioning-independent.",
    tags=("window", "topk", "part"),
)
def q148(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    cnt = (
        p.select("p_brand", F.explode(F.split("p_name", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("p_brand", "word")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("cnt"), F.asc("word"))
    return (
        cnt.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("p_brand", "word", "cnt", "rnk")
    )


# ---------------------------------------------------------------------------
# q149: weighted systematic sample (integer-exact)
# ---------------------------------------------------------------------------

@register(
    "q149_weighted_sample_reservoir",
    sql="""
    WITH weighted AS (
      SELECT c_nationkey, c_custkey,
             CAST(ROUND((c_acctbal + 1000) * 100, 0) AS BIGINT) + 1 AS w,
             md5(CAST(c_custkey AS VARCHAR)) AS h
      FROM customer
    ),
    cum AS (
      SELECT c_nationkey, c_custkey, w,
             SUM(w) OVER (PARTITION BY c_nationkey ORDER BY h, c_custkey
                          ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(w) OVER (PARTITION BY c_nationkey) AS tw
      FROM weighted
    )
    SELECT c_nationkey, c_custkey, CAST(w AS BIGINT) AS weight,
           CAST(cw AS BIGINT) AS cum_weight
    FROM cum
    WHERE (cw // GREATEST(tw // 8, 1)) > ((cw - w) // GREATEST(tw // 8, 1))
    """,
    doc="Weighted systematic sampling, integer-exact: ~8 customers per "
        "nation drawn proportionally to (shifted) account balance.  "
        "Rows order by md5-of-key (the q117 reproducibility "
        "discipline), weights become integer cents, and a row is "
        "selected iff its cumulative-weight interval crosses a "
        "multiple of step = total/8 — the textbook systematic sampler "
        "with ZERO floating point, so the selection is bit-identical "
        "across engines, retries, and partitionings (where rand()-"
        "keyed reservoirs are not).  Scale: one window shuffle on the "
        "group key, selection is a codegen filter on the cumsum; "
        "per-group weight totals ride the same window (no extra scan).",
    tags=("sampling", "window", "customer"),
)
def q149(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    weighted = c.select(
        "c_nationkey",
        "c_custkey",
        (
            F.round((F.col("c_acctbal") + 1000) * 100, 0).cast("long") + 1
        ).alias("w"),
        F.md5(F.col("c_custkey").cast("string")).alias("h"),
    )
    wo = Window.partitionBy("c_nationkey").orderBy("h", "c_custkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy("c_nationkey")
    cum = weighted.select(
        "c_nationkey",
        "c_custkey",
        "w",
        F.sum("w").over(wo).alias("cw"),
        F.sum("w").over(wt).alias("tw"),
    )
    # select iff the row's cumulative interval crosses a step multiple:
    # floor(cw/step) != floor((cw-w)/step), all positive integers, so
    # the last-multiple-below comparison is exact with no division
    step = F.greatest(F.expr("tw div 8"), F.lit(1))
    prev = F.col("cw") - F.col("w")
    return (
        cum.where(
            (F.col("cw") - F.col("cw") % step) != (prev - prev % step)
        )
        .select(
            "c_nationkey",
            "c_custkey",
            F.col("w").alias("weight"),
            F.col("cw").alias("cum_weight"),
        )
    )


# ---------------------------------------------------------------------------
# q150: recursive hierarchy (BOM) rollup
# ---------------------------------------------------------------------------

@register(
    "q150_recursive_bom_rollup",
    sql="""
    WITH RECURSIVE edges AS (
      SELECT p_partkey AS child, p_partkey // 10 AS parent
      FROM part WHERE p_partkey >= 10
    ),
    anc AS (
      SELECT child AS descendant, parent AS ancestor FROM edges
      UNION ALL
      SELECT a.descendant, e.parent
      FROM anc a JOIN edges e ON e.child = a.ancestor
    ),
    pairs AS (
      SELECT descendant, ancestor FROM anc
      UNION ALL
      SELECT p_partkey, p_partkey FROM part
    ),
    roll AS (
      SELECT pr.ancestor AS p_partkey,
             COUNT(*) - 1 AS n_descendants,
             CAST(CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS DOUBLE) AS subtree_cost
      FROM pairs pr JOIN part p ON p.p_partkey = pr.descendant
      GROUP BY 1
    )
    SELECT p_partkey, CAST(n_descendants AS BIGINT) AS n_descendants,
           subtree_cost
    FROM roll
    """,
    doc="Recursive hierarchy (bill-of-materials) rollup — the one "
        "relational surface Spark has no native primitive for "
        "(recursive CTEs).  Parts form a decimal tree (parent = key "
        "div 10); every node's subtree cost and descendant count roll "
        "up via the transitive ancestor closure.  The closure is built "
        "as a bounded JOIN RECURSION: depth = digits(max key) is "
        "computed with ONE driver-side aggregate, then exactly that "
        "many frontier-edge joins run lazily in a single plan — no "
        "per-round actions, no unbounded loop; at 10^9 keys that is "
        "9 joins of node-grain frames.  Decimal-exact money sums; the "
        "oracle is the literal WITH RECURSIVE formulation.",
    tags=("recursive", "hierarchy", "part"),
)
def q150(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog import DEC, emit

    p = load(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    max_key = p.agg(F.max("p_partkey")).first()[0] or 0
    edges = p.where(F.col("p_partkey") >= 10).select(
        F.col("p_partkey").alias("_child"),
        F.expr("p_partkey div 10").alias("_parent"),
    )
    frontier = edges.select(
        F.col("_child").alias("_desc"), F.col("_parent").alias("_anc")
    )
    closure = [frontier]
    # chain length above the direct edge: ancestors of k are the div-10
    # prefixes down to a single digit, so digits(max_key) - 2 more hops
    for _ in range(max(0, len(str(max_key)) - 2)):
        frontier = (
            frontier.join(edges, frontier["_anc"] == edges["_child"])
            .select("_desc", F.col("_parent").alias("_anc"))
        )
        closure.append(frontier)
    pairs = p.select(
        F.col("p_partkey").alias("_desc"), F.col("p_partkey").alias("_anc")
    )
    for fr in closure:
        pairs = pairs.unionByName(fr)
    costs = p.select(
        F.col("p_partkey").alias("_desc"),
        F.col("p_retailprice").cast(DEC).alias("_cost"),
    )
    return (
        pairs.join(costs, "_desc")
        .groupBy("_anc")
        .agg(
            (F.count("*") - 1).cast("long").alias("n_descendants"),
            emit(F.sum("_cost").cast(DEC)).alias("subtree_cost"),
        )
        .select(
            F.col("_anc").alias("p_partkey"), "n_descendants", "subtree_cost"
        )
    )


# ---------------------------------------------------------------------------
# q151: ledger with corrections (dedup + exact balances)
# ---------------------------------------------------------------------------

@register(
    "q151_window_deduped_ledger",
    sql="""
    WITH entries AS (
      SELECT user_id, event_id % 50 AS entry_key, ts, event_id, value,
             row_number() OVER (
               PARTITION BY user_id, event_id % 50
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id,
           COUNT(*) FILTER (WHERE rn = 1) AS n_entries,
           COUNT(*) FILTER (WHERE rn > 1) AS n_superseded,
           CAST(CAST(SUM(CASE WHEN rn = 1
                         THEN CAST(value AS DECIMAL(18,2)) END)
                AS DECIMAL(18,2)) AS DOUBLE) AS balance
    FROM entries
    GROUP BY user_id
    """,
    doc="Correction-aware ledger balances: events sharing a logical "
        "entry key (event_id mod 50 per user) are amendments — only "
        "the LATEST version (ts, then event_id as the deterministic "
        "tiebreak) counts toward the balance; superseded versions are "
        "tallied for audit.  One window over (user, entry_key) + one "
        "aggregation, both sharing the hash(user) distribution — the "
        "accounting-grade dedup every financial mart runs before "
        "summing, with decimal-exact money sums.  At scale the window "
        "grain is bounded by versions-per-entry, never table size.",
    tags=("window", "ledger", "events"),
)
def q151(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog import DEC, emit

    e = load(spark, sf_dir, "events").select(
        "user_id",
        (F.col("event_id") % 50).alias("entry_key"),
        "ts",
        "event_id",
        "value",
    )
    w = Window.partitionBy("user_id", "entry_key").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    marked = e.withColumn("rn", F.row_number().over(w))
    return marked.groupBy("user_id").agg(
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("long").alias("n_entries"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).cast("long").alias("n_superseded"),
        emit(
            F.sum(F.when(F.col("rn") == 1, F.col("value").cast(DEC))).cast(DEC)
        ).alias("balance"),
    )


# ---------------------------------------------------------------------------
# q152: pre-1970 bucketized range join (grades the floor-div contract)
# ---------------------------------------------------------------------------

@register(
    "q152_range_join_pre1970",
    sql="""
    WITH facts AS (
      SELECT event_id, ts - INTERVAL 20000 DAY AS ts, value FROM events
    ),
    iv AS (
      SELECT n_nationkey AS interval_id,
             TIMESTAMP '1969-03-30 00:00:00'
               + n_nationkey * INTERVAL 2 DAY AS start_ts,
             TIMESTAMP '1969-03-30 00:00:00'
               + n_nationkey * INTERVAL 2 DAY + INTERVAL 1 DAY AS end_ts
      FROM nation WHERE n_nationkey < 15
    )
    SELECT iv.interval_id,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(f.value AS DECIMAL(18,2)))
                AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
    FROM facts f
    JOIN iv ON f.ts >= iv.start_ts AND f.ts < iv.end_ts
    GROUP BY 1
    """,
    doc="Interval-overlap join on NEGATIVE-epoch timestamps "
        "(relational.joins.bucketized_range_join): events shift back "
        "20000 days into 1969 and join 15 one-day windows.  Grades "
        "the floor-division bucket contract from the r04 advisory — "
        "`div` truncates toward zero, which for pre-1970 micros made "
        "bucket 0 twice as wide and could diverge from the oracle's "
        "floor `//`; the operator now floor-buckets via pmod-subtract, "
        "so buckets stay exactly bucket_seconds wide on both sides of "
        "the epoch.  Same binning physics as q109: facts map to ONE "
        "bucket, intervals explode to covered buckets, equi-join + "
        "residual predicate — never a theta-join cartesian.",
    tags=("join", "range", "events", "timestamps"),
)
def q152(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog import DEC, emit
    from .joins import bucketized_range_join

    e = load(spark, sf_dir, "events").select(
        "event_id",
        (F.col("ts") - F.expr("INTERVAL 20000 DAYS")).alias("ts"),
        "value",
    )
    base = F.to_timestamp(F.lit("1969-03-30 00:00:00"))
    iv = (
        load(spark, sf_dir, "nation")
        .where(F.col("n_nationkey") < 15)
        .select(
            F.col("n_nationkey").alias("interval_id"),
            (base + F.col("n_nationkey") * F.expr("INTERVAL 2 DAYS")).alias("start_ts"),
            (
                base
                + F.col("n_nationkey") * F.expr("INTERVAL 2 DAYS")
                + F.expr("INTERVAL 1 DAYS")
            ).alias("end_ts"),
        )
    )
    joined = bucketized_range_join(e, iv, bucket_seconds=21600)
    return joined.groupBy("interval_id").agg(
        F.count("*").alias("n_events"),
        emit(F.sum(F.col("value").cast(DEC)).cast(DEC)).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# q153: decimal-safe joined OLS fit
# ---------------------------------------------------------------------------

@register(
    "q153_decimal_safe_linear_fit",
    sql="""
    WITH j AS (
      SELECT n.n_regionkey AS region_key,
             c.c_acctbal AS x,
             o.o_totalprice AS y
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    s AS (
      SELECT region_key,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x AS DECIMAL(12,4))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(12,4))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(19,4))
                    * CAST(x AS DECIMAL(12,4))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(19,4))
                    * CAST(y AS DECIMAL(12,4))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(x AS DECIMAL(19,4))
                    * CAST(y AS DECIMAL(12,4))) AS DOUBLE) AS sxy
      FROM j
      GROUP BY region_key
    )
    SELECT region_key,
           CAST(n AS BIGINT) AS n,
           CAST(ROUND((CASE WHEN n * sxx - sx * sx > 0 THEN
                 (n * sxy - sx * sy) / (n * sxx - sx * sx) END) * 1e6) AS BIGINT) / 1e6 AS slope,
           CAST(ROUND((CASE WHEN n * sxx - sx * sx > 0 THEN
                 (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
                 END) * 1e6) AS BIGINT) / 1e6 AS intercept,
           CAST(ROUND((CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0 THEN
                 ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END) * 1e6) AS BIGINT) / 1e6 AS r2
    FROM s
    """,
    doc="OLS fit over a JOINED star (order totalprice ~ "
        "customer acctbal, per region): the q139 sufficient-statistics "
        "discipline composed with broadcast dimension joins, under "
        "linear_fit's decimal(12,4) input-domain guard (both inputs "
        "sit inside the documented |v| < 1e8 domain; an out-of-domain "
        "input now RAISES via the try_cast + conditional-raise plan "
        "instead of silently skewing sums, per the r04 advisory).  "
        "One fact-side aggregation pass to 5 "
        "region rows after two broadcast joins; identical double "
        "closed form both engines.",
    tags=("regression", "join", "orders", "ml-stats"),
)
def q153(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sketches import linear_fit

    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    j = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(
            F.col("n_regionkey").alias("region_key"),
            F.col("c_acctbal").alias("x"),
            F.col("o_totalprice").alias("y"),
        )
    )
    return linear_fit(j, "x", "y", "region_key")
