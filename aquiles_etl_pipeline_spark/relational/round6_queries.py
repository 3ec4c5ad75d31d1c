"""Round-6 catalog entries (q217+): the decorrelation-shaped TPC-H
fills the round-5 classics skipped — Q13-shape left-join count
distribution with a join-side predicate, Q17-shape per-group scalar-
average correlated predicate, and Q21-shape EXISTS + NOT EXISTS on the
same fact.  Each exercises an aggregate-in-predicate / existential
decorrelation no earlier entry covers (nearest: q208's plain EXISTS),
expressed in the physical shapes that survive 100 TB: broadcast dims,
one-key-family shuffles, window decorrelation instead of self-join
re-aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .catalog import load, register, pround

# ---------------------------------------------------------------------------
# q217: TPC-H Q13-shape — order-count distribution with JOIN-side filter
# ---------------------------------------------------------------------------

@register(
    "q217_filtered_order_counts",
    sql="""
    WITH per_cust AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON o_custkey = c_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY 1
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY 1
    """,
    doc="TPC-H Q13 shape (full form): distribution of customers by "
        "order count where the order predicate lives in the LEFT JOIN "
        "condition, NOT the WHERE clause — customers whose every order "
        "is urgent must still appear with c_count 0, which a WHERE "
        "would silently delete (the classic outer-join-filter "
        "placement bug; q135 covers only the unfiltered variant).  "
        "Physical shape: the predicate filters the ORDERS side before "
        "the join (equivalent to the ON placement, and it pushes to "
        "the scan), then two one-key-family aggregations: "
        "hash(custkey) count, hash(count) distribution.  At 100 TB "
        "the first agg is the only fact-sized shuffle.",
    tags=("relational", "tpch", "decorrelation", "orders", "customer"),
)
def q217(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )

# ---------------------------------------------------------------------------
# q218: TPC-H Q17-shape — correlated scalar-average predicate
# ---------------------------------------------------------------------------

@register(
    "q218_small_order_revenue",
    sql="""
    WITH sel AS (
      SELECT l_partkey,
             CAST(l_quantity AS BIGINT) AS qty,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS price
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#13' AND p_type = 'ECONOMY'
    ),
    win AS (
      SELECT price, qty,
             SUM(qty)  OVER (PARTITION BY l_partkey) AS sq,
             COUNT(*)  OVER (PARTITION BY l_partkey) AS cnt
      FROM sel
    )
    SELECT CAST(CAST(SUM(price) AS DECIMAL(18,2)) AS DOUBLE) / 7.0
             AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM win WHERE qty * 5 * cnt < sq
    """,
    doc="TPC-H Q17 shape: revenue of small orders — lineitems whose "
        "quantity is below 20% of the PER-PART average quantity "
        "(correlated scalar-aggregate predicate).  Decorrelation: the "
        "part filter restricts the correlation domain first (the avg "
        "is only ever consulted for Brand#13/ECONOMY parts, and "
        "correlating on p_partkey means the filtered domain computes "
        "the same per-part average), then the correlated average "
        "becomes a PARTITION BY l_partkey window over the filtered "
        "fact — ONE hash(partkey) exchange, no self-join "
        "re-aggregation, no per-row subquery.  The comparison is "
        "integer-exact (qty*5*cnt < sum — quantities are integral), "
        "so no 0.2*avg float boundary can flip between engines; "
        "revenue lands decimal then divides by 7.0 once as DOUBLE.  "
        "The tiny filtered part dim broadcasts.",
    tags=("relational", "tpch", "decorrelation", "lineitem", "part"),
)
def q218(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
    )
    pf = (
        load(spark, sf_dir, "part")
        .where((F.col("p_brand") == "Brand#13") & (F.col("p_type") == "ECONOMY"))
        .select("p_partkey")
    )
    sel = li.join(
        F.broadcast(pf), li["l_partkey"] == pf["p_partkey"]
    ).drop("p_partkey")
    w = Window.partitionBy("l_partkey")
    win = sel.select(
        "price",
        "qty",
        F.sum("qty").over(w).alias("sq"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    )
    return win.where(F.col("qty") * 5 * F.col("cnt") < F.col("sq")).agg(
        (F.sum("price").cast("decimal(18,2)").cast("double") / 7.0).alias(
            "avg_yearly"
        ),
        F.count(F.lit(1)).alias("n_lineitems"),
    )

# ---------------------------------------------------------------------------
# q219: TPC-H Q21-shape — EXISTS + NOT EXISTS on the same fact
# ---------------------------------------------------------------------------

@register(
    "q219_sole_late_supplier",
    sql="""
    WITH lio AS (
      SELECT l_orderkey AS ok, l_suppkey AS sk,
             (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    )
    SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lio a JOIN supplier ON s_suppkey = a.sk
    WHERE a.late
      AND EXISTS (SELECT 1 FROM lio b
                  WHERE b.ok = a.ok AND b.sk <> a.sk)
      AND NOT EXISTS (SELECT 1 FROM lio c
                      WHERE c.ok = a.ok AND c.sk <> a.sk AND c.late)
    GROUP BY 1, 2
    """,
    doc="TPC-H Q21 shape: suppliers who kept finished multi-supplier "
        "orders waiting — late lineitems (shipped >90 days after the "
        "order date; this schema carries no receipt/commit dates) in "
        "orders where ANOTHER supplier participated (EXISTS) but NO "
        "other supplier was late (NOT EXISTS) — the two existentials "
        "ranging over the SAME fact, the hardest of the classic "
        "decorrelations.  Physical shape: the order-status filter + "
        "late flag compute once on a lineitem-orders equi-join; the "
        "EXISTS decorrelates to a LEFT SEMI join and the NOT EXISTS "
        "to a LEFT ANTI join, both keyed on l_orderkey with the "
        "supplier inequality as a join residual — ONE key family, "
        "three hash(orderkey) exchanges, never an order-grain "
        "collect or a fact self-cartesian; the supplier dim "
        "broadcasts for naming.  No top-k LIMIT (tie order is not "
        "cross-engine deterministic); callers rank the returned "
        "per-supplier counts.",
    tags=("relational", "tpch", "decorrelation", "lineitem", "supplier"),
)
def q219(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    lio = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_suppkey").alias("sk"),
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).alias("late"),
    )
    a = lio.where("late").alias("a")
    b = lio.alias("b")
    c = lio.where("late").alias("c")
    waiting = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok")) & (F.col("a.sk") != F.col("b.sk")),
            "left_semi",
        )
        .join(
            c,
            (F.col("a.ok") == F.col("c.ok")) & (F.col("a.sk") != F.col("c.sk")),
            "left_anti",
        )
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(s), waiting["sk"] == s["s_suppkey"])
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )

# ---------------------------------------------------------------------------
# q220: root-snapshot paired read across a racing transaction
# ---------------------------------------------------------------------------

@register(
    "q220_root_snapshot_read",
    sql="""
    WITH f AS (
      SELECT o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS t
      FROM orders WHERE o_orderkey % 4 = 0
      GROUP BY 1
    )
    SELECT o_orderstatus,
           n AS n_fact, CAST(t AS DOUBLE) AS total_fact,
           n AS n_rollup, CAST(t AS DOUBLE) AS total_rollup
    FROM f
    """,
    doc="Cross-table SNAPSHOT-ISOLATION read through the root snapshot "
        "pointer (Warehouse.snapshot — closing VERDICT r05's "
        "documented gap): transaction 1 commits a fact+rollup pair "
        "(the %4==0 subset), a snapshot pins the root manifest, then "
        "transaction 2 commits the FULL pair; reading both tables "
        "through the pinned snapshot must still yield transaction 1's "
        "mutually-consistent pair (fact-derived aggregates == stored "
        "rollup == the oracle's subset recompute), with no version "
        "bookkeeping by the reader — unlike q211, which had to pin "
        "each table's generation number manually.  The root manifest "
        "moves once per transaction, after every per-table pointer "
        "flip, so a snapshot can never capture a mixed pair.",
    tags=("merge", "warehouse", "snapshot", "orders"),
)
def q220(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..merge import Warehouse

    DEC2 = "decimal(18,2)"
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        F.col("o_totalprice").cast(DEC2).alias("price"),
    )

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("price").cast(DEC2).alias("t"),
        )

    wh = Warehouse(spark, tempfile.mkdtemp(prefix="q220_snap_"))
    first = o.where(F.col("o_orderkey") % 4 == 0)
    wh.transaction({"fact_orders": first, "rollup_orders": rollup(first)})
    snap = wh.snapshot()
    wh.transaction({"fact_orders": o, "rollup_orders": rollup(o)})
    from_fact = rollup(snap.read("fact_orders")).select(
        "o_orderstatus",
        F.col("n").alias("n_fact"),
        F.col("t").cast("double").alias("total_fact"),
    )
    from_rollup = snap.read("rollup_orders").select(
        "o_orderstatus",
        F.col("n").alias("n_rollup"),
        F.col("t").cast("double").alias("total_rollup"),
    )
    return from_fact.join(from_rollup, "o_orderstatus")

# ---------------------------------------------------------------------------
# q221: two-sided trimmed mean per group (exact, rank-window based)
# ---------------------------------------------------------------------------

@register(
    "q221_trimmed_mean_values",
    sql="""
    WITH r AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           CAST(MIN(n) AS BIGINT) AS n_total,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(ROUND((CAST(SUM(cents) AS DOUBLE) / (COUNT(*) * 100)) * 1e6) AS BIGINT) / 1e6
             AS trimmed_mean
    FROM r
    WHERE rn > n // 10 AND rn <= n - n // 10
    GROUP BY event_type
    """,
    doc="Two-sided 10% trimmed mean of event value per type — the "
        "robust-location estimate monitoring pipelines prefer over the "
        "raw mean (a handful of corrupt extreme values cannot move "
        "it; complements q131's median/MAD anomaly flags with an "
        "aggregate the mean consumers can swap in directly).  EXACT by "
        "construction: ranks come from a deterministic composite order "
        "(value, event_id), the trim count is integer n div 10 per "
        "side, and the kept sum is integer cents with ONE double "
        "division at the end — no percentile interpolation, no float "
        "boundary to disagree on.  Shape: one hash(event_type) window "
        "sort shared by rank and count, then the same-key aggregation "
        "— a single exchange family.",
    tags=("ml-stats", "robust", "events", "window"),
)
def q221(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.row_number()
        .over(w.orderBy("value", "event_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    kept = r.where(
        (F.col("rn") > F.expr("n div 10"))
        & (F.col("rn") <= F.col("n") - F.expr("n div 10"))
    )
    return kept.groupBy("event_type").agg(
        F.min("n").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).alias("n_kept"),
        pround(F.sum("cents").cast("double") / (F.count(F.lit(1)) * 100), 6).alias("trimmed_mean"),
    )

# ---------------------------------------------------------------------------
# q222: inclusion-dependency (foreign-key candidate) profile
# ---------------------------------------------------------------------------

@register(
    "q222_inclusion_profile",
    sql="""
    WITH pair1 AS (
      SELECT 'lineitem.l_partkey' AS child_col, 'part.p_partkey' AS parent_col,
             CAST(COUNT(*) AS BIGINT) AS n_child_distinct,
             CAST(COUNT(*) FILTER (WHERE p IS NULL) AS BIGINT) AS n_orphans
      FROM (SELECT DISTINCT l_partkey AS k FROM lineitem) c
      LEFT JOIN (SELECT DISTINCT p_partkey AS k, 1 AS p FROM part) d USING (k)
    ),
    pair2 AS (
      SELECT 'lineitem.l_suppkey', 'supplier.s_suppkey',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) FILTER (WHERE p IS NULL) AS BIGINT)
      FROM (SELECT DISTINCT l_suppkey AS k FROM lineitem) c
      LEFT JOIN (SELECT DISTINCT s_suppkey AS k, 1 AS p FROM supplier) d USING (k)
    ),
    pair3 AS (
      SELECT 'orders.o_custkey', 'customer.c_custkey',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) FILTER (WHERE p IS NULL) AS BIGINT)
      FROM (SELECT DISTINCT o_custkey AS k FROM orders) c
      LEFT JOIN (SELECT DISTINCT c_custkey AS k, 1 AS p FROM customer) d USING (k)
    ),
    pair4 AS (
      SELECT 'customer.c_nationkey', 'nation.n_nationkey',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) FILTER (WHERE p IS NULL) AS BIGINT)
      FROM (SELECT DISTINCT c_nationkey AS k FROM customer) c
      LEFT JOIN (SELECT DISTINCT n_nationkey AS k, 1 AS p FROM nation) d USING (k)
    ),
    pair5 AS (
      SELECT 'part.p_partkey', 'lineitem.l_partkey',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) FILTER (WHERE p IS NULL) AS BIGINT)
      FROM (SELECT DISTINCT p_partkey AS k FROM part) c
      LEFT JOIN (SELECT DISTINCT l_partkey AS k, 1 AS p FROM lineitem) d USING (k)
    ),
    u AS (
      SELECT * FROM pair1 UNION ALL SELECT * FROM pair2
      UNION ALL SELECT * FROM pair3 UNION ALL SELECT * FROM pair4
      UNION ALL SELECT * FROM pair5
    )
    SELECT child_col, parent_col, n_child_distinct, n_orphans,
           CAST(ROUND((CAST(n_child_distinct - n_orphans AS DOUBLE)
                 / n_child_distinct) * 1e6) AS BIGINT) / 1e6 AS containment
    FROM u
    """,
    doc="Inclusion-dependency profile — the foreign-key DISCOVERY "
        "primitive (Bauckmann et al.'s SPIDER problem, the profiling "
        "complement of q82's referential-integrity CHECK and q185's "
        "functional deps): for each candidate (child, parent) column "
        "pair, the distinct child count, how many child values have "
        "no parent (orphans), and the containment ratio; pair 5 runs "
        "the REVERSE direction on purpose (parts never ordered) so "
        "the profile demonstrates asymmetry.  Shape per pair: child "
        "keys collapse to distinct FIRST (the fact-sized shuffle), "
        "then a left join against the distinct parent keys — dim "
        "parents broadcast; counting orphans needs no second scan.  "
        "Five independent pairs union as one plan.",
    tags=("profiling", "quality", "relational"),
)
def q222(spark: SparkSession, sf_dir: str) -> DataFrame:
    def pair(
        child: DataFrame, ckey: str, parent: DataFrame, pkey: str,
        clabel: str, plabel: str,
    ) -> DataFrame:
        c = child.select(F.col(ckey).alias("k")).distinct()
        d = parent.select(F.col(pkey).alias("k")).distinct().withColumn(
            "p", F.lit(1)
        )
        return c.join(d, "k", "left").agg(
            F.lit(clabel).alias("child_col"),
            F.lit(plabel).alias("parent_col"),
            F.count(F.lit(1)).alias("n_child_distinct"),
            F.count(F.when(F.col("p").isNull(), 1)).alias("n_orphans"),
        )

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    u = (
        pair(li, "l_partkey", p, "p_partkey", "lineitem.l_partkey", "part.p_partkey")
        .unionByName(pair(li, "l_suppkey", s, "s_suppkey", "lineitem.l_suppkey", "supplier.s_suppkey"))
        .unionByName(pair(o, "o_custkey", c, "c_custkey", "orders.o_custkey", "customer.c_custkey"))
        .unionByName(pair(c, "c_nationkey", n, "n_nationkey", "customer.c_nationkey", "nation.n_nationkey"))
        .unionByName(pair(p, "p_partkey", li, "l_partkey", "part.p_partkey", "lineitem.l_partkey"))
    )
    return u.select(
        "child_col", "parent_col", "n_child_distinct", "n_orphans",
        pround((F.col("n_child_distinct") - F.col("n_orphans")).cast("double")
            / F.col("n_child_distinct"), 6).alias("containment"),
    )

# ---------------------------------------------------------------------------
# q223: lexical diversity profile per source (TTR + hapax ratio)
# ---------------------------------------------------------------------------

@register(
    "q223_lexical_diversity",
    sql="""
    WITH tok AS (
      SELECT source, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
      FROM documents
    ),
    tc AS (
      SELECT source, t, COUNT(*) AS c FROM tok GROUP BY 1, 2
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(COUNT(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax,
           CAST(ROUND((CAST(COUNT(*) AS DOUBLE) / SUM(c)) * 1e6) AS BIGINT) / 1e6 AS type_token_ratio,
           CAST(ROUND((CAST(COUNT(*) FILTER (WHERE c = 1) AS DOUBLE)
                 / COUNT(*)) * 1e6) AS BIGINT) / 1e6 AS hapax_ratio
    FROM tc GROUP BY source
    """,
    doc="Lexical diversity profile per source: type-token ratio and "
        "hapax-legomenon ratio — the corpus-quality signals that "
        "separate template/boilerplate sources (low TTR, few hapaxes) "
        "from diverse natural text; the release-gating complement of "
        "q74's datacard and q86's vocab drift, neither of which "
        "measures within-source diversity.  Shape: tokens collapse to "
        "(source, token) counts at the FIRST aggregation (map-side "
        "partial combine eats the token stream), then a |vocab|-sized "
        "rollup per source — the exploded grain never reaches the "
        "second shuffle.  All counts integer-exact; two ratio "
        "divisions at output.",
    tags=("llmdata", "quality", "documents"),
)
def q223(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..partitioning import fan_out

    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    tok = fan_out(d).select("source", F.explode(toks).alias("t"))
    tc = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    return tc.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.count(F.when(F.col("c") == 1, 1)).alias("n_hapax"),
        pround(F.count(F.lit(1)).cast("double") / F.sum("c"), 6).alias(
            "type_token_ratio"
        ),
        pround(F.count(F.when(F.col("c") == 1, 1)).cast("double")
            / F.count(F.lit(1)), 6).alias("hapax_ratio"),
    )

# ---------------------------------------------------------------------------
# q224: hard-negative mining (top-1 cross-label neighbor per anchor)
# ---------------------------------------------------------------------------

@register(
    "q224_hard_negative_mining",
    sql="""
    WITH a AS (SELECT vec_id AS anchor_id, label AS anchor_label,
                      CAST(embedding AS DOUBLE[]) AS av
               FROM embeddings WHERE vec_id < 8),
         c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id >= 8)
    SELECT anchor_id, anchor_label,
           vec_id AS negative_id, label AS negative_label,
           CAST(ROUND((list_cosine_similarity(v, av)) * 1e4) AS BIGINT) / 1e4 AS cosine_sim
    FROM c CROSS JOIN a
    WHERE label <> anchor_label
    QUALIFY row_number() OVER (
      PARTITION BY anchor_id
      ORDER BY CAST(ROUND((list_cosine_similarity(v, av)) * 1e4) AS BIGINT) / 1e4 DESC, vec_id
    ) = 1
    """,
    doc="Hard-negative mining for contrastive training: for each "
        "anchor vector (vec_id < 8), the single most-similar corpus "
        "vector carrying a DIFFERENT label — the near-miss that makes "
        "the best negative example (easy random negatives teach "
        "nothing).  The label inequality is what q47's plain k-NN "
        "cannot express; the per-anchor top-1 runs on the same "
        "salted-two-phase discipline.  Physical shape: 8 anchors "
        "broadcast against the corpus — a constant-factor map (q47's "
        "deliberate shape), one Arrow-batched cosine pass, similarity "
        "rounded to 4dp with a vec_id tiebreak for cross-engine "
        "determinism.",
    tags=("similarity", "embeddings", "contrastive", "topk"),
)
def q224(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata.similarity import cosine_sim_batch

    e = load(spark, sf_dir, "embeddings")
    anchors = e.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").alias("_av"),
    )
    corpus = e.where(F.col("vec_id") >= 8)
    scored = (
        corpus.join(F.broadcast(anchors), F.col("label") != F.col("anchor_label"))
        .select(
            "anchor_id",
            "anchor_label",
            F.col("vec_id").alias("negative_id"),
            F.col("label").alias("negative_label"),
            pround(cosine_sim_batch(F.col("embedding"), F.col("_av")), 4).alias(
                "cosine_sim"
            ),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine_sim"), F.asc("negative_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

# ---------------------------------------------------------------------------
# q225: ETL quarantine split report (validity-gated routing, P4 semantics)
# ---------------------------------------------------------------------------

@register(
    "q225_etl_quarantine_report",
    sql="""
    WITH raw AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderkey % 7 = 0 THEN 'N/A'
                  ELSE '$' || CAST(o_orderkey % 900 + 100 AS VARCHAR) || ','
                        || lpad(CAST(o_orderkey % 100 AS VARCHAR), 2, '0')
             END AS price_str,
             CASE WHEN o_orderkey % 5 = 0 THEN '31/02/2024'
                  ELSE '15/03/2024' END AS date_str
      FROM orders
    ),
    flagged AS (
      SELECT o_orderpriority,
             CASE
               WHEN TRY_CAST(regexp_replace(price_str, '[.,$ ]', '', 'g')
                             AS DECIMAL(18,2)) IS NULL THEN 'invalid_price'
               WHEN try_strptime(date_str, '%d/%m/%Y') IS NULL
                 THEN 'invalid_date'
               ELSE 'valid'
             END AS reason
      FROM raw
    )
    SELECT o_orderpriority, reason,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(ROUND((CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (PARTITION BY o_orderpriority)) * 1e6) AS BIGINT) / 1e6
             AS share_of_priority
    FROM flagged GROUP BY 1, 2
    """,
    doc="ETL quarantine report — the medallion-architecture routing "
        "the reference's validity gate implies but never reports on: "
        "rows failing the price-parse rule (P4's IsValidPrice, "
        "/root/reference/core/data_processor.py:135-138) or the "
        "day-first date parse (F1) are routed to a quarantine reason "
        "instead of silently dropped, and the report counts each "
        "(priority, reason) cell with its within-priority share — "
        "what an operator pages on when a feed's reject rate jumps.  "
        "Inputs are synthesized deterministically from orders (every "
        "7th key an unparseable price, every 5th an impossible "
        "calendar date) so both engines construct identical rows; "
        "reason precedence is price-before-date, mirroring the "
        "pipeline's transform order.  Shape: pure codegen projection "
        "+ one hash(priority, reason) aggregation + a |priorities|-"
        "grain share window.",
    tags=("etl", "quality", "quarantine", "orders"),
)
def q225(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import scalar

    o = load(spark, sf_dir, "orders")
    price_str = F.when(F.col("o_orderkey") % 7 == 0, F.lit("N/A")).otherwise(
        F.concat(
            F.lit("$"),
            (F.col("o_orderkey") % 900 + 100).cast("string"),
            F.lit(","),
            F.lpad((F.col("o_orderkey") % 100).cast("string"), 2, "0"),
        )
    )
    date_str = F.when(
        F.col("o_orderkey") % 5 == 0, F.lit("31/02/2024")
    ).otherwise(F.lit("15/03/2024"))
    reason = (
        F.when(scalar.clean_price(price_str).isNull(), F.lit("invalid_price"))
        .when(
            F.expr("try_to_date(_ds, 'd/M/yyyy')").isNull(),
            F.lit("invalid_date"),
        )
        .otherwise(F.lit("valid"))
    )
    flagged = o.withColumn("_ds", date_str).select(
        "o_orderpriority", reason.alias("reason")
    )
    w = Window.partitionBy("o_orderpriority")
    return (
        flagged.groupBy("o_orderpriority", "reason")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn(
            "share_of_priority",
            pround(F.col("n_rows").cast("double") / F.sum("n_rows").over(w), 6),
        )
    )

# ---------------------------------------------------------------------------
# q226: population-stability-index drift between corpus halves
# ---------------------------------------------------------------------------

@register(
    "q226_psi_length_drift",
    sql="""
    WITH b AS (
      SELECT doc_id % 2 AS half,
             least(n_chars // 50, 9) AS bin
      FROM documents
    ),
    cells AS (
      SELECT bin,
             COUNT(*) FILTER (WHERE half = 0) AS c_ref,
             COUNT(*) FILTER (WHERE half = 1) AS c_cur
      FROM b GROUP BY 1
    ),
    tot AS (
      SELECT SUM(c_ref) AS t_ref, SUM(c_cur) AS t_cur FROM cells
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_bins_used,
           CAST(ROUND((SUM(
             (CAST(c_cur AS DOUBLE) / t_cur - CAST(c_ref AS DOUBLE) / t_ref)
             * ln((CAST(c_cur AS DOUBLE) * CAST(t_ref AS DOUBLE))
                  / (CAST(c_ref AS DOUBLE) * CAST(t_cur AS DOUBLE)))
           )) * 1e6) AS BIGINT) / 1e6 AS psi
    FROM cells, tot
    WHERE c_ref > 0 AND c_cur > 0
    """,
    doc="Population stability index of the document-length "
        "distribution between two corpus halves (doc_id parity as the "
        "release-over-release stand-in) — the standard drift gate a "
        "data pipeline runs before shipping a new snapshot (PSI < "
        "0.1 stable, > 0.25 action).  Bins are FIXED-WIDTH integer "
        "floor-divisions of n_chars (never engine-computed quantiles "
        "— those differ across engines); only bins populated on both "
        "sides contribute, with the used-bin count reported so a "
        "silent bin drop is visible.  The log argument is a ratio of "
        "exact integer products cast to double BEFORE multiplying "
        "(the q163/q140 ln-parity recipe), one rounding at the end.  "
        "Shape: one hash(bin) aggregation over a codegen projection; "
        "the totals row is a single-row broadcast (allowlisted NLJ "
        "shape).",
    tags=("ml-stats", "drift", "documents"),
)
def q226(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    b = d.select(
        (F.col("doc_id") % 2).alias("half"),
        F.least(F.expr("n_chars div 50"), F.lit(9)).alias("bin"),
    )
    cells = b.groupBy("bin").agg(
        F.count(F.when(F.col("half") == 0, 1)).alias("c_ref"),
        F.count(F.when(F.col("half") == 1, 1)).alias("c_cur"),
    )
    tot = cells.agg(
        F.sum("c_ref").alias("t_ref"), F.sum("c_cur").alias("t_cur")
    )
    term = (
        F.col("c_cur").cast("double") / F.col("t_cur")
        - F.col("c_ref").cast("double") / F.col("t_ref")
    ) * F.log(
        (F.col("c_cur").cast("double") * F.col("t_ref").cast("double"))
        / (F.col("c_ref").cast("double") * F.col("t_cur").cast("double"))
    )
    return (
        cells.join(F.broadcast(tot))
        .where((F.col("c_ref") > 0) & (F.col("c_cur") > 0))
        .agg(
            F.count(F.lit(1)).alias("n_bins_used"),
            pround(F.sum(term), 6).alias("psi"),
        )
    )

# ---------------------------------------------------------------------------
# q227: Benford first-digit forensics on order totals
# ---------------------------------------------------------------------------

@register(
    "q227_benford_first_digit",
    sql="""
    WITH d AS (
      SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                    AS VARCHAR), 1, 1) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    obs AS (
      SELECT digit, COUNT(*) AS n_obs FROM d GROUP BY 1
    ),
    w AS (
      SELECT digit, n_obs,
             SUM(n_obs) OVER () AS n,
             ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) AS e
      FROM obs
    )
    SELECT digit,
           CAST(n_obs AS BIGINT) AS n_obs,
           CAST(ROUND((e) * 1e6) AS BIGINT) / 1e6 AS expected_share,
           CAST(ROUND((CAST(n_obs AS DOUBLE) / n) * 1e6) AS BIGINT) / 1e6 AS observed_share,
           CAST(ROUND((SUM(pow(n_obs - n * e, 2) / (n * e)) OVER ()) * 1e6) AS BIGINT) / 1e6
             AS chi2_total
    FROM w
    """,
    doc="Benford's-law first-digit audit of order totals — the "
        "fabricated-data forensic every financial data-quality suite "
        "ships: observed first-digit shares of the integer cents vs "
        "the log10(1+1/d) expectation, with the chi-square statistic "
        "attached to every row (naturally-arising multiplicative "
        "amounts follow Benford; flat or spiky digit profiles flag "
        "synthetic or tampered feeds).  First digits extract from the "
        "EXACT integer cents as strings (no float leading-digit "
        "games); the expected shares are closed-form ln ratios of "
        "deterministic literals (the q163 ln-parity regime) and the "
        "single rounding happens at output.  Shape: one 9-row "
        "aggregation, then windows over the 9-row frame — the scan is "
        "the entire cost.",
    tags=("quality", "forensics", "orders"),
)
def q227(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
    )
    obs = o.groupBy(digit.alias("digit")).agg(F.count(F.lit(1)).alias("n_obs"))
    wall = Window.partitionBy()
    e = F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")) / F.log(
        F.lit(10.0)
    )
    w = obs.select(
        "digit", "n_obs", F.sum("n_obs").over(wall).alias("n"), e.alias("e")
    )
    chi = F.pow(F.col("n_obs") - F.col("n") * F.col("e"), 2) / (
        F.col("n") * F.col("e")
    )
    return w.select(
        "digit",
        F.col("n_obs").cast("bigint").alias("n_obs"),
        pround("e", 6).alias("expected_share"),
        pround(F.col("n_obs").cast("double") / F.col("n"), 6).alias(
            "observed_share"
        ),
        pround(F.sum(chi).over(wall), 6).alias("chi2_total"),
    )

# ---------------------------------------------------------------------------
# q228: FIFO allocation via cumulative-interval overlap join
# ---------------------------------------------------------------------------

@register(
    "q228_fifo_return_matching",
    sql="""
    WITH s AS (
      SELECT l_partkey, l_shipdate,
             CAST(l_quantity AS BIGINT) AS qty,
             SUM(CAST(l_quantity AS BIGINT))
               OVER (PARTITION BY l_partkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber
                     ROWS UNBOUNDED PRECEDING) AS s_end
      FROM lineitem WHERE l_returnflag <> 'R'
    ),
    dm AS (
      SELECT l_partkey, l_shipdate,
             CAST(l_quantity AS BIGINT) AS qty,
             SUM(CAST(l_quantity AS BIGINT))
               OVER (PARTITION BY l_partkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber
                     ROWS UNBOUNDED PRECEDING) AS d_end
      FROM lineitem WHERE l_returnflag = 'R'
    ),
    m AS (
      SELECT least(s.s_end, dm.d_end)
               - greatest(s.s_end - s.qty, dm.d_end - dm.qty) AS matched,
             date_diff('day', s.l_shipdate, dm.l_shipdate) AS age_days
      FROM s JOIN dm ON s.l_partkey = dm.l_partkey
       AND s.s_end - s.qty < dm.d_end
       AND dm.d_end - dm.qty < s.s_end
    )
    SELECT CASE WHEN age_days < 0 THEN 'pre_supply'
                WHEN age_days <= 30 THEN '0-30d'
                WHEN age_days <= 90 THEN '31-90d'
                ELSE 'over_90d' END AS age_bucket,
           CAST(SUM(matched) AS BIGINT) AS matched_qty,
           CAST(COUNT(*) AS BIGINT) AS n_allocations
    FROM m GROUP BY 1
    """,
    doc="FIFO allocation as a relational operator: returned units "
        "(l_returnflag = 'R') consume earlier shipments of the same "
        "part in ship order, first-in-first-out — the inventory-"
        "costing / lot-attribution primitive.  The classic imperative "
        "queue becomes PURE SQL via cumulative intervals: each side "
        "gets a running-total interval [cum-qty, cum) per part, and a "
        "FIFO match is exactly a nonzero overlap of supply and demand "
        "intervals (matched = min(ends) - max(starts)); the report "
        "buckets matched quantity by supply-to-return age.  All "
        "integer arithmetic on exact cumsums with a deterministic "
        "(shipdate, orderkey, linenumber) order.  Shape: two window "
        "cumsums sharing one hash(partkey) family, then a per-part "
        "interval-overlap join (q109's machinery on derived "
        "intervals) — pair volume is bounded by per-part overlap "
        "degree, never |supply| x |demand|.",
    tags=("relational", "fifo", "interval", "lineitem"),
)
def q228(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_orderkey", "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("qty"),
        "l_returnflag",
    )
    w = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, 0)

    def side(df: DataFrame, end: str) -> DataFrame:
        return df.select(
            "l_partkey", "l_shipdate", "qty", F.sum("qty").over(w).alias(end)
        )

    s = side(li.where(F.col("l_returnflag") != "R"), "s_end").select(
        F.col("l_partkey").alias("_pk"),
        F.col("l_shipdate").alias("_sd"),
        F.col("qty").alias("_sq"),
        "s_end",
    )
    dm = side(li.where(F.col("l_returnflag") == "R"), "d_end")
    m = s.join(
        dm,
        (F.col("_pk") == F.col("l_partkey"))
        & (F.col("s_end") - F.col("_sq") < F.col("d_end"))
        & (F.col("d_end") - F.col("qty") < F.col("s_end")),
    ).select(
        (
            F.least("s_end", "d_end")
            - F.greatest(F.col("s_end") - F.col("_sq"), F.col("d_end") - F.col("qty"))
        ).alias("matched"),
        F.datediff(F.col("l_shipdate"), F.col("_sd")).alias("age_days"),
    )
    bucket = (
        F.when(F.col("age_days") < 0, "pre_supply")
        .when(F.col("age_days") <= 30, "0-30d")
        .when(F.col("age_days") <= 90, "31-90d")
        .otherwise("over_90d")
    )
    return m.groupBy(bucket.alias("age_bucket")).agg(
        F.sum("matched").cast("bigint").alias("matched_qty"),
        F.count(F.lit(1)).alias("n_allocations"),
    )

# ---------------------------------------------------------------------------
# q229: nearest-event temporal align with tolerance (bidirectional as-of)
# ---------------------------------------------------------------------------

@register(
    "q229_nearest_click_align",
    sql="""
    WITH seq AS (
      SELECT user_id, event_id, ts, event_type,
             last_value(CASE WHEN event_type = 'click'
                             THEN epoch_us(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_click,
             first_value(CASE WHEN event_type = 'click'
                              THEN epoch_us(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_click
      FROM events
    ),
    err AS (
      SELECT user_id,
             epoch_us(ts) - prev_click AS back_us,
             next_click - epoch_us(ts) AS fwd_us
      FROM seq WHERE event_type = 'error'
    ),
    pick AS (
      SELECT user_id,
             CASE
               WHEN back_us IS NOT NULL AND back_us <= 600000000
                AND (fwd_us IS NULL OR back_us <= fwd_us OR fwd_us > 600000000)
                 THEN back_us
               WHEN fwd_us IS NOT NULL AND fwd_us <= 600000000
                 THEN fwd_us
             END AS matched_us
      FROM err
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_errors,
           CAST(COUNT(matched_us) AS BIGINT) AS n_matched,
           CAST(ROUND((CAST(SUM(matched_us) AS DOUBLE)
                 / COUNT(matched_us) / 1e6) * 1e6) AS BIGINT) / 1e6 AS avg_match_sec
    FROM pick GROUP BY user_id
    """,
    doc="Nearest-event temporal alignment with a tolerance window: "
        "each error event matches its CLOSEST click by the same user "
        "within +/-10 minutes, backward preferred on ties — the "
        "bidirectional generalization of q36's backward-only as-of "
        "join (sensor fusion, cause attribution, log stitching all "
        "need nearest, not merely last).  No join at all: one "
        "(user, ts, id)-sorted window yields the previous and next "
        "click timestamps via IGNORE NULLS frame endpoints, and the "
        "nearest pick is a pure CASE — the exchange the sessionizers "
        "already pay is the entire cost.  Deltas stay integer "
        "microseconds until the single average division.",
    tags=("timeseries", "asof", "events", "window"),
)
def q229(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    click_us = F.when(F.col("event_type") == "click", us)
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_click = F.last(click_us, ignorenulls=True).over(
        base.rowsBetween(Window.unboundedPreceding, -1)
    )
    next_click = F.first(click_us, ignorenulls=True).over(
        base.rowsBetween(1, Window.unboundedFollowing)
    )
    TOL = 600_000_000
    err = (
        ev.select(
            "user_id", "event_type",
            (us - prev_click).alias("back_us"),
            (next_click - us).alias("fwd_us"),
        )
        .where(F.col("event_type") == "error")
    )
    matched = (
        F.when(
            F.col("back_us").isNotNull()
            & (F.col("back_us") <= TOL)
            & (
                F.col("fwd_us").isNull()
                | (F.col("back_us") <= F.col("fwd_us"))
                | (F.col("fwd_us") > TOL)
            ),
            F.col("back_us"),
        )
        .when(
            F.col("fwd_us").isNotNull() & (F.col("fwd_us") <= TOL),
            F.col("fwd_us"),
        )
    )
    return err.select("user_id", matched.alias("matched_us")).groupBy(
        "user_id"
    ).agg(
        F.count(F.lit(1)).alias("n_errors"),
        F.count("matched_us").alias("n_matched"),
        pround(F.sum("matched_us").cast("double") / F.count("matched_us") / 1e6, 6).alias("avg_match_sec"),
    )

# ---------------------------------------------------------------------------
# q230: hierarchical ratio-to-parent revenue rollup
# ---------------------------------------------------------------------------

@register(
    "q230_revenue_share_hierarchy",
    sql="""
    WITH nat AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS rev
      FROM orders o
      JOIN customer c ON c_custkey = o_custkey
      JOIN nation n ON n_nationkey = c_nationkey
      JOIN region r ON r_regionkey = n_regionkey
      GROUP BY 1, 2
    )
    SELECT region, nation,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(ROUND((CAST(rev AS DOUBLE)
                 / CAST(SUM(rev) OVER (PARTITION BY region) AS DOUBLE)) * 1e6) AS BIGINT) / 1e6
             AS share_of_region,
           CAST(ROUND((CAST(rev AS DOUBLE)
                 / CAST(SUM(rev) OVER () AS DOUBLE)) * 1e6) AS BIGINT) / 1e6 AS share_of_total
    FROM nat
    """,
    doc="Hierarchical ratio-to-parent rollup: nation revenue with its "
        "share of the region and of the grand total — the percent-of-"
        "parent column every BI hierarchy renders, which q06's plain "
        "ROLLUP cannot produce (it emits parent ROWS, not parent "
        "RATIOS on the child rows).  Revenue sums land decimal-exact "
        "(the money discipline); the two share divisions happen once "
        "each in double over windows on the |nations|-sized rollup "
        "frame — parent totals come from windows, not a rollup "
        "self-join.  Shape: orders-customer is the one fact-scale "
        "join (shuffle on custkey — customer grows with the corpus, "
        "so it must NOT broadcast); nation/region broadcast; one "
        "hash(region, nation) aggregation; windows on the tiny "
        "result.",
    tags=("relational", "rollup", "orders", "window"),
)
def q230(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nat = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("rev")
        )
    )
    wr = Window.partitionBy("region")
    wall = Window.partitionBy()
    return nat.select(
        "region",
        "nation",
        F.col("rev").cast("double").alias("revenue"),
        pround(F.col("rev").cast("double") / F.sum("rev").over(wr).cast("double"), 6).alias("share_of_region"),
        pround(F.col("rev").cast("double") / F.sum("rev").over(wall).cast("double"), 6).alias("share_of_total"),
    )

# ---------------------------------------------------------------------------
# q231: Kaplan-Meier signup->purchase survival curve
# ---------------------------------------------------------------------------

@register(
    "q231_retention_survival",
    sql="""
    WITH su AS (
      SELECT user_id, MIN(ts) AS s0 FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ),
    fp AS (
      SELECT e.user_id, MIN(e.ts) AS p0
      FROM events e JOIN su ON su.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= su.s0
      GROUP BY 1
    ),
    horizon AS (SELECT MAX(ts) AS tmax FROM events),
    subj AS (
      SELECT su.user_id,
             CASE WHEN fp.p0 IS NOT NULL
                  THEN date_diff('day', CAST(su.s0 AS DATE), CAST(fp.p0 AS DATE))
                  ELSE date_diff('day', CAST(su.s0 AS DATE), CAST(tmax AS DATE))
             END AS t,
             (fp.p0 IS NOT NULL) AS converted
      FROM su LEFT JOIN fp USING (user_id) CROSS JOIN horizon
    ),
    day_grain AS (
      SELECT t,
             COUNT(*) FILTER (WHERE converted) AS d,
             COUNT(*) FILTER (WHERE NOT converted) AS c
      FROM subj GROUP BY 1
    ),
    risk AS (
      SELECT t, d, c,
             SUM(d + c) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING)
               AS n_risk
      FROM day_grain
    )
    SELECT CAST(t AS BIGINT) AS t_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_converted,
           CAST(c AS BIGINT) AS n_censored,
           CASE WHEN MAX(CASE WHEN d > 0 AND n_risk = d THEN 1 ELSE 0 END)
                     OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) = 1
                THEN 0.0
                ELSE CAST(ROUND((exp(SUM(CASE WHEN d > 0 AND n_risk > d
                                   THEN ln(CAST(n_risk - d AS DOUBLE)
                                           / CAST(n_risk AS DOUBLE))
                                   ELSE 0.0 END)
                          OVER (ORDER BY t ROWS UNBOUNDED PRECEDING))) * 1e6) AS BIGINT) / 1e6
           END AS survival
    FROM risk WHERE d > 0
    """,
    doc="Kaplan-Meier survival curve for signup-to-first-purchase lag "
        "— the censoring-correct retention metric (plain conversion "
        "rates understate retention because users who signed up late "
        "haven't had time to convert; KM credits them only for the "
        "days they were observed).  Users without a purchase censor "
        "at the corpus horizon.  The product-limit estimator becomes "
        "pure windows: the risk set is a DESCENDING cumulative sum "
        "over the day grain, and the survival product is "
        "exp(cumulative sum of ln((n-d)/n)) in an ORDERED window — "
        "sequential summation order is deterministic in both engines, "
        "log arguments are exact integer ratios cast to double (the "
        "q163 ln-parity recipe), one rounding at output.  Shape: two "
        "user-grain aggregations, then windows over the <=|days| "
        "frame; the horizon is a single-row broadcast (allowlisted).",
    tags=("ml-stats", "survival", "events", "window"),
)
def q231(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    su = ev.where(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("s0")
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .where(F.col("ts") >= F.col("s0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p0"))
    )
    horizon = ev.agg(F.max("ts").alias("tmax"))
    subj = (
        su.join(fp, "user_id", "left")
        .join(F.broadcast(horizon))
        .select(
            F.when(
                F.col("p0").isNotNull(),
                F.datediff(F.col("p0").cast("date"), F.col("s0").cast("date")),
            )
            .otherwise(
                F.datediff(F.col("tmax").cast("date"), F.col("s0").cast("date"))
            )
            .alias("t"),
            F.col("p0").isNotNull().alias("converted"),
        )
    )
    day_grain = subj.groupBy("t").agg(
        F.count(F.when(F.col("converted"), 1)).alias("d"),
        F.count(F.when(~F.col("converted"), 1)).alias("c"),
    )
    w_desc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = day_grain.select(
        "t", "d", "c", F.sum(F.col("d") + F.col("c")).over(w_desc).alias("n_risk")
    )
    w_asc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    # a day where the whole remaining risk set converts (n_risk == d)
    # drives survival to exactly 0 from then on — ln cannot express it,
    # so a cumulative flag pins those rows to 0.0 (both engines raise
    # on ln(0) otherwise)
    ln_term = F.when(
        (F.col("d") > 0) & (F.col("n_risk") > F.col("d")),
        F.log(
            (F.col("n_risk") - F.col("d")).cast("double")
            / F.col("n_risk").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    hit_zero = F.max(
        F.when((F.col("d") > 0) & (F.col("n_risk") == F.col("d")), 1).otherwise(0)
    ).over(w_asc)
    survival = F.when(hit_zero == 1, F.lit(0.0)).otherwise(
        pround(F.exp(F.sum(ln_term).over(w_asc)), 6)
    )
    return risk.select(
        F.col("t").cast("bigint").alias("t_days"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").cast("bigint").alias("n_converted"),
        F.col("c").cast("bigint").alias("n_censored"),
        survival.alias("survival"),
        F.col("d").alias("_d"),
    ).where(F.col("_d") > 0).drop("_d")

# ---------------------------------------------------------------------------
# q232: order fill-rate timeline (cumulative shipments vs order total)
# ---------------------------------------------------------------------------

@register(
    "q232_order_fill_timeline",
    sql="""
    WITH c AS (
      SELECT l_orderkey,
             l_shipdate,
             SUM(CAST(l_quantity AS BIGINT))
               OVER (PARTITION BY l_orderkey
                     ORDER BY l_shipdate, l_linenumber
                     ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(CAST(l_quantity AS BIGINT))
               OVER (PARTITION BY l_orderkey) AS total,
             MIN(l_shipdate) OVER (PARTITION BY l_orderkey) AS first_ship
      FROM lineitem
    ),
    per_order AS (
      SELECT l_orderkey,
             MIN(CASE WHEN cum * 2 >= total
                      THEN date_diff('day', first_ship, l_shipdate) END)
               AS days_to_half,
             date_diff('day', MIN(first_ship), MAX(l_shipdate))
               AS days_to_full
      FROM c GROUP BY 1
    )
    SELECT CASE WHEN days_to_half = 0 THEN 'same_day'
                WHEN days_to_half <= 30 THEN 'within_30d'
                WHEN days_to_half <= 90 THEN 'within_90d'
                ELSE 'over_90d' END AS half_fill_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MAX(days_to_full) AS BIGINT) AS max_days_to_full,
           CAST(ROUND((CAST(SUM(days_to_full) AS DOUBLE) / COUNT(*)) * 1e6) AS BIGINT) / 1e6
             AS avg_days_to_full
    FROM per_order GROUP BY 1
    """,
    doc="Order fill-rate timeline — the fulfillment SLA report: per "
        "order, the cumulative shipped quantity (deterministic "
        "(shipdate, linenumber) order) against the order's total, the "
        "day the order crossed 50% filled (integer cum*2 >= total — "
        "no float ratio), and first-to-last shipment spread; orders "
        "bucket by time-to-half-fill.  Shape: one hash(orderkey) "
        "window family (cumsum + total + first-ship share one "
        "exchange and sort), a per-order aggregation on the same key "
        "— zero extra shuffles — then a 4-row bucket rollup.",
    tags=("relational", "fulfillment", "lineitem", "window"),
)
def q232(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    wo = Window.partitionBy("l_orderkey")
    wcum = wo.orderBy("l_shipdate", "l_linenumber").rowsBetween(
        Window.unboundedPreceding, 0
    )
    qty = F.col("l_quantity").cast("bigint")
    c = li.select(
        "l_orderkey",
        "l_shipdate",
        F.sum(qty).over(wcum).alias("cum"),
        F.sum(qty).over(wo).alias("total"),
        F.min("l_shipdate").over(wo).alias("first_ship"),
    )
    per_order = c.groupBy("l_orderkey").agg(
        F.min(
            F.when(
                F.col("cum") * 2 >= F.col("total"),
                F.datediff("l_shipdate", "first_ship"),
            )
        ).alias("days_to_half"),
        F.datediff(F.max("l_shipdate"), F.min("first_ship")).alias(
            "days_to_full"
        ),
    )
    bucket = (
        F.when(F.col("days_to_half") == 0, "same_day")
        .when(F.col("days_to_half") <= 30, "within_30d")
        .when(F.col("days_to_half") <= 90, "within_90d")
        .otherwise("over_90d")
    )
    return per_order.groupBy(bucket.alias("half_fill_bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.max("days_to_full").cast("bigint").alias("max_days_to_full"),
        pround(F.sum("days_to_full").cast("double") / F.count(F.lit(1)), 6).alias("avg_days_to_full"),
    )

# ---------------------------------------------------------------------------
# q233: near-dup pair explanations (longest shared token run)
# ---------------------------------------------------------------------------

@register(
    "q233_shared_run_explanations",
    sql="""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    g AS (
      SELECT doc_id, u.i AS pos,
             substr(md5(array_to_string(t[u.i:u.i+4], ' ')), 1, 16) AS h
      FROM t, unnest(generate_series(1, greatest(len(t) - 4, 1))) AS u(i)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY 1),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             COUNT(DISTINCT a.h) AS shared_grams
      FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING COUNT(DISTINCT a.h) >= 8
    ),
    matches AS (
      SELECT p.doc_a, p.doc_b, a.pos AS pa, a.pos - b.pos AS diag
      FROM pairs p
      JOIN g a ON a.doc_id = p.doc_a
      JOIN g b ON b.doc_id = p.doc_b AND b.h = a.h
    ),
    islands AS (
      SELECT doc_a, doc_b, diag,
             pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, diag
                                     ORDER BY pa) AS grp
      FROM (SELECT DISTINCT doc_a, doc_b, diag, pa FROM matches)
    ),
    runs AS (
      SELECT doc_a, doc_b, COUNT(*) AS run_len
      FROM islands GROUP BY doc_a, doc_b, diag, grp
    )
    SELECT p.doc_a, p.doc_b,
           CAST(p.shared_grams AS BIGINT) AS shared_grams,
           CAST(MAX(r.run_len) + 4 AS BIGINT) AS longest_run_tokens
    FROM pairs p JOIN runs r ON r.doc_a = p.doc_a AND r.doc_b = p.doc_b
    GROUP BY 1, 2, 3
    """,
    doc="Near-duplicate pair EXPLANATIONS: for document pairs sharing "
        ">= 8 distinct 5-gram hashes, the longest CONTIGUOUS shared "
        "token run — the evidence a human reviews before deleting a "
        "flagged near-dup (a 40-token verbatim run is plagiarism; 8 "
        "scattered grams are boilerplate).  A contiguous shared run "
        "lies on one DIAGONAL of the gram-position match matrix "
        "(pos_a - pos_b constant), so longest-run = gaps-and-islands "
        "on pos_a within each (pair, diagonal) — the q116 island "
        "trick transplanted to alignment space; run tokens = island "
        "grams + k - 1.  Shape: postings self-join on the 64-bit "
        "gram hash (q24's inverted-index regime, never docs^2), "
        "match expansion restricted to the flagged pairs, islands on "
        "one (pair, diag)-keyed window family.",
    tags=("llmdata", "dedup", "explain", "documents"),
)
def q233(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..partitioning import fan_out

    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    k = 5
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - k, F.lit(0)) + 1)
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    g = fan_out(docs).select(
        "doc_id", F.posexplode(grams).alias("_p0", "_gram")
    ).select(
        "doc_id",
        (F.col("_p0") + 1).alias("pos"),
        F.substring(F.md5("_gram"), 1, 16).alias("h"),
    )
    a = g.select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pa"), "h"
    )
    b = g.select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb"), "h"
    )
    m = a.join(b, "h").where(F.col("doc_a") < F.col("doc_b"))
    pairs = (
        m.groupBy("doc_a", "doc_b")
        .agg(F.countDistinct("h").alias("shared_grams"))
        .where(F.col("shared_grams") >= 8)
    )
    matches = (
        m.join(pairs.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_semi")
        .select("doc_a", "doc_b", "pa", (F.col("pa") - F.col("pb")).alias("diag"))
        .distinct()
    )
    wi = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    islands = matches.select(
        "doc_a", "doc_b", "diag",
        (F.col("pa") - F.row_number().over(wi)).alias("grp"),
    )
    runs = islands.groupBy("doc_a", "doc_b", "diag", "grp").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        pairs.join(runs, ["doc_a", "doc_b"])
        .groupBy("doc_a", "doc_b", "shared_grams")
        .agg((F.max("run_len") + k - 1).cast("bigint").alias("longest_run_tokens"))
        .select(
            "doc_a", "doc_b",
            F.col("shared_grams").cast("bigint").alias("shared_grams"),
            "longest_run_tokens",
        )
    )

# ---------------------------------------------------------------------------
# q234: TPC-H Q2-shape — cheapest regional supplier per part
# ---------------------------------------------------------------------------

@register(
    "q234_cheapest_regional_supplier",
    sql="""
    WITH regional AS (
      SELECT s_suppkey, s_name
      FROM supplier JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'ASIA'
    ),
    offers AS (
      SELECT l_partkey, s_suppkey, s_name,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
      FROM lineitem JOIN regional ON s_suppkey = l_suppkey
    ),
    ranked AS (
      SELECT l_partkey, s_suppkey, s_name, price_c,
             ROW_NUMBER() OVER (PARTITION BY l_partkey
                                ORDER BY price_c, s_suppkey) AS rn
      FROM offers
    )
    SELECT p_partkey, p_brand, s_suppkey, s_name,
           CAST(ROUND((CAST(price_c AS DOUBLE) / 100) * 1e2) AS BIGINT) / 1e2 AS best_price
    FROM ranked JOIN part ON p_partkey = l_partkey
    WHERE rn = 1 AND p_size BETWEEN 1 AND 5
    """,
    doc="TPC-H Q2 shape: for every small part, the supplier offering "
        "the minimum price within one region — the correlated-MIN "
        "subquery (price = (SELECT MIN ... WHERE same part, same "
        "region)) decorrelated to a PARTITION BY part window with a "
        "deterministic (price, suppkey) tiebreak, so ties cannot "
        "diverge across engines.  (This schema has no partsupp; "
        "lineitem prices stand in for supply cost.)  Physical shape: "
        "region->nation->supplier broadcast chain prunes the fact "
        "FIRST, one hash(partkey) window, part dim broadcast onto the "
        "one-row-per-part winners.  Prices stay integer cents until "
        "the output render.",
    tags=("relational", "tpch", "decorrelation", "lineitem", "supplier"),
)
def q234(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_c"),
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA").select(
        "r_regionkey"
    )
    regional = s.join(
        F.broadcast(n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])),
        s["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    offers = li.join(F.broadcast(regional), li["l_suppkey"] == F.col("s_suppkey"))
    w = Window.partitionBy("l_partkey").orderBy("price_c", "s_suppkey")
    ranked = offers.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    p = load(spark, sf_dir, "part").where(F.col("p_size").between(1, 5)).select(
        "p_partkey", "p_brand"
    )
    return ranked.join(F.broadcast(p), ranked["l_partkey"] == p["p_partkey"]).select(
        "p_partkey", "p_brand", "s_suppkey", "s_name",
        pround(F.col("price_c").cast("double") / 100, 2).alias("best_price"),
    )

# ---------------------------------------------------------------------------
# q235: TPC-H Q11-shape — important part values vs a global threshold
# ---------------------------------------------------------------------------

@register(
    "q235_important_part_values",
    sql="""
    WITH pv AS (
      SELECT l_partkey,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS value_c
      FROM lineitem GROUP BY 1
    ),
    w AS (
      SELECT l_partkey, value_c, SUM(value_c) OVER () AS total_c FROM pv
    )
    SELECT l_partkey AS partkey,
           CAST(ROUND((CAST(value_c AS DOUBLE) / 100) * 1e2) AS BIGINT) / 1e2 AS value,
           CAST(ROUND((CAST(value_c AS DOUBLE) / total_c) * 1e6) AS BIGINT) / 1e6 AS share
    FROM w WHERE value_c * 2000 > total_c
    """,
    doc="TPC-H Q11 shape: parts whose total traded value exceeds a "
        "fraction (1/2000) of the GLOBAL total — the HAVING-against-a-"
        "different-grain-scalar decorrelation: the global total comes "
        "from an unpartitioned window over the |parts|-sized rollup "
        "(never a second fact scan), and the threshold compares exact "
        "integers (value*2000 > total) so no float fraction can flip "
        "the cut between engines.  One fact-sized hash(partkey) "
        "aggregation is the entire shuffle cost.",
    tags=("relational", "tpch", "decorrelation", "lineitem"),
)
def q235(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("value_c")
    )
    w = Window.partitionBy()
    return (
        pv.withColumn("total_c", F.sum("value_c").over(w))
        .where(F.col("value_c") * 2000 > F.col("total_c"))
        .select(
            F.col("l_partkey").alias("partkey"),
            pround(F.col("value_c").cast("double") / 100, 2).alias("value"),
            pround(F.col("value_c").cast("double") / F.col("total_c"), 6).alias("share"),
        )
    )

# ---------------------------------------------------------------------------
# q236: TPC-H Q15-shape — top supplier(s) by quarterly revenue
# ---------------------------------------------------------------------------

@register(
    "q236_top_quarter_supplier",
    sql="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,4))))
                  AS DECIMAL(24,6)) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1
    ),
    m AS (SELECT l_suppkey, total_rev, MAX(total_rev) OVER () AS mx FROM rev)
    SELECT s_suppkey, s_name,
           CAST(total_rev AS DOUBLE) AS total_rev
    FROM m JOIN supplier ON s_suppkey = l_suppkey
    WHERE total_rev = mx
    """,
    doc="TPC-H Q15 shape: the supplier(s) achieving the MAXIMUM "
        "quarterly revenue — the revenue-view + WHERE rev = (SELECT "
        "MAX(rev)) pattern decorrelated to an unpartitioned window "
        "max over the |suppliers|-sized rollup; equality on the EXACT "
        "decimal revenue (never a rounded double) keeps tie "
        "membership identical across engines, and ALL tied suppliers "
        "return (no arbitrary LIMIT election).  One quarter-pruned "
        "fact aggregation; supplier dim broadcasts.",
    tags=("relational", "tpch", "decorrelation", "lineitem", "supplier"),
)
def q236(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
        )
        .cast("decimal(24,6)")
        .alias("total_rev")
    )
    m = rev.withColumn("mx", F.max("total_rev").over(Window.partitionBy()))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        m.where(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev"))
    )

# ---------------------------------------------------------------------------
# q237: TPC-H Q16-shape — supplier diversity excluding a blacklist (NOT IN)
# ---------------------------------------------------------------------------

@register(
    "q237_supplier_diversity",
    sql="""
    WITH ps AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    ok AS (
      SELECT l_partkey, l_suppkey FROM ps
      WHERE l_suppkey NOT IN
            (SELECT s_suppkey FROM supplier WHERE s_suppkey % 13 = 0)
    )
    SELECT p_brand, p_type,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ok JOIN part ON p_partkey = l_partkey
    WHERE p_size <= 10
    GROUP BY 1, 2
    """,
    doc="TPC-H Q16 shape: distinct supplier counts per (brand, type) "
        "for small parts, EXCLUDING a blacklisted supplier set — the "
        "NOT IN subquery decorrelated to a LEFT ANTI join (the "
        "blacklist has no NULL keys by construction, so NOT IN and "
        "anti-join semantics coincide; a nullable blacklist is the "
        "classic NOT IN trap and would need a null guard).  The "
        "(part, supplier) grain collapses to DISTINCT first, the tiny "
        "blacklist broadcasts, the part dim broadcasts, then one "
        "count-distinct rollup.",
    tags=("relational", "tpch", "decorrelation", "lineitem", "part"),
)
def q237(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = (
        load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    bl = (
        load(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") % 13 == 0)
        .select("s_suppkey")
    )
    ok = ps.join(
        F.broadcast(bl), ps["l_suppkey"] == bl["s_suppkey"], "left_anti"
    )
    p = load(spark, sf_dir, "part").where(F.col("p_size") <= 10).select(
        "p_partkey", "p_brand", "p_type"
    )
    return (
        ok.join(F.broadcast(p), ok["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )

# ---------------------------------------------------------------------------
# q238: TPC-H Q18-shape — large-quantity orders (IN over grouped HAVING)
# ---------------------------------------------------------------------------

@register(
    "q238_large_quantity_orders",
    sql="""
    WITH big AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      FROM lineitem GROUP BY 1
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 180
    )
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           total_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
    doc="TPC-H Q18 shape: orders whose TOTAL lineitem quantity "
        "exceeds a threshold, reported with their customer — the "
        "o_orderkey IN (SELECT ... GROUP BY ... HAVING) pattern "
        "decorrelated to a plain join against the aggregated key set "
        "(the HAVING rollup IS the semi-join build side, and it also "
        "carries the total the report needs, so no second fact pass). "
        " Integer-exact quantities; one hash(orderkey) aggregation, "
        "then orderkey- and custkey-family joins.  No top-k LIMIT "
        "(tie order is not cross-engine deterministic).",
    tags=("relational", "tpch", "decorrelation", "lineitem", "orders"),
)
def q238(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("total_qty"))
        .where(F.col("total_qty") > 180)
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
    )

# ---------------------------------------------------------------------------
# q239: TPC-H Q20-shape — dominant suppliers of red parts
# ---------------------------------------------------------------------------

@register(
    "q239_dominant_part_suppliers",
    sql="""
    WITH gp AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
    ),
    sq AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS supp_qty
      FROM lineitem JOIN gp ON p_partkey = l_partkey
      GROUP BY 1, 2
    ),
    w AS (
      SELECT l_partkey, l_suppkey, supp_qty,
             SUM(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
      FROM sq
    ),
    dominant AS (
      SELECT DISTINCT l_suppkey FROM w WHERE supp_qty * 8 > part_qty
    )
    SELECT s_suppkey, s_name, n_name AS nation
    FROM dominant
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    """,
    doc="TPC-H Q20 shape: suppliers shipping MORE THAN HALF of some "
        "green part's total volume — the nested IN-chain (suppkey IN "
        "(... WHERE qty > 0.5 * (SELECT SUM ...))) decorrelated in "
        "two moves: the part filter prunes the fact through a "
        "broadcast join FIRST, and the correlated per-part total "
        "becomes a PARTITION BY part window over the (part, supplier) "
        "rollup; the share test is exact integers (qty*8 > total).  "
        "Distinct winners semi-join back to supplier + nation dims "
        "(both broadcast).  One fact aggregation, one window, no "
        "per-row subqueries.",
    tags=("relational", "tpch", "decorrelation", "lineitem", "supplier"),
)
def q239(spark: SparkSession, sf_dir: str) -> DataFrame:
    gp = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem")
    sq = (
        li.join(F.broadcast(gp), li["l_partkey"] == gp["p_partkey"])
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        sq.withColumn("part_qty", F.sum("supp_qty").over(w))
        .where(F.col("supp_qty") * 8 > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        dominant.join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )

# ---------------------------------------------------------------------------
# q240: TPC-H Q22-shape — wealthy inactive customers per nation
# ---------------------------------------------------------------------------

@register(
    "q240_wealthy_inactive_customers",
    sql="""
    WITH pos AS (
      SELECT c_custkey, c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
      FROM customer WHERE c_acctbal > 0
    ),
    tot AS (
      SELECT CAST(SUM(bal_c) AS BIGINT) AS sum_c,
             CAST(COUNT(*) AS BIGINT) AS n_pos
      FROM pos
    ),
    rich AS (
      SELECT c_custkey, c_nationkey, bal_c
      FROM pos, tot WHERE bal_c * n_pos > sum_c
    ),
    inactive AS (
      SELECT r.c_custkey, r.c_nationkey, r.bal_c
      FROM rich r
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = r.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    )
    SELECT n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(ROUND((CAST(SUM(bal_c) AS DOUBLE) / 100) * 1e2) AS BIGINT) / 1e2 AS total_balance
    FROM inactive JOIN nation ON n_nationkey = c_nationkey
    GROUP BY 1
    """,
    doc="TPC-H Q22 shape: customers with above-average positive "
        "balances with NO ORDER since 2000 (every customer here has "
        "SOME order, so recency defines inactivity), per nation — the "
        "scalar-average subquery PLUS NOT EXISTS combination.  The "
        "average test is exact integers (bal*n > sum beats any "
        "avg-as-double boundary), the global total is a single-row "
        "broadcast (allowlisted NLJ shape), and the NOT EXISTS "
        "decorrelates to a LEFT ANTI join against the orders custkey "
        "column.  One customer scan, one orders-key anti join, one "
        "tiny rollup with the nation dim broadcast.",
    tags=("relational", "tpch", "decorrelation", "customer", "orders"),
)
def q240(spark: SparkSession, sf_dir: str) -> DataFrame:
    pos = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 0)
        .select(
            "c_custkey", "c_nationkey",
            F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_c"),
        )
    )
    tot = pos.agg(
        F.sum("bal_c").cast("bigint").alias("sum_c"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    rich = pos.join(F.broadcast(tot)).where(
        F.col("bal_c") * F.col("n_pos") > F.col("sum_c")
    )
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    inactive = rich.join(
        o, rich["c_custkey"] == o["o_custkey"], "left_anti"
    )
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        inactive.join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            pround(F.sum("bal_c").cast("double") / 100, 2).alias(
                "total_balance"
            ),
        )
    )

# ---------------------------------------------------------------------------
# q242: TPC-H Q12-shape — shipping-class service levels (CASE-in-agg)
# ---------------------------------------------------------------------------

@register(
    "q242_shipping_class_service",
    sql="""
    SELECT l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
    doc="TPC-H Q12 shape: late shipments per shipping class, split "
        "into high- vs low-priority counts with CASE-in-aggregate — "
        "the conditional-aggregation pattern (this schema carries no "
        "l_shipmode; l_returnflag stands in as the class column, and "
        "lateness is ship > order date + 30 days since commit/receipt "
        "dates are absent).  Physical shape: both date predicates "
        "push to the lineitem scan, the orderkey equi-join is the one "
        "fact shuffle, and the CASE pair rides a single 3-group "
        "aggregation — never two passes.",
    tags=("relational", "tpch", "lineitem", "orders"),
)
def q242(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).select("l_orderkey", "l_shipdate", "l_returnflag")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy(F.col("l_returnflag").alias("ship_class")).agg(
        F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
    )

# ---------------------------------------------------------------------------
# q243: TPC-H Q9-shape — product-line profit by nation and year
# ---------------------------------------------------------------------------

@register(
    "q243_product_profit",
    sql="""
    SELECT n_name AS nation,
           CAST(year(l_shipdate) AS INT) AS o_year,
           CAST(CAST(SUM(
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,4)))
             - CAST(p_retailprice AS DECIMAL(18,2))
               * CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(18,0))
               * CAST(0.10 AS DECIMAL(6,2))
           ) AS DECIMAL(28,6)) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape: product-line profit (revenue minus supply "
        "cost) per supplier nation and ship year for parts matching a "
        "name pattern — the classic multi-dimension star rollup with "
        "an ARITHMETIC measure spanning two tables (no partsupp here: "
        "10% of p_retailprice per unit stands in for supply cost).  "
        "All money math in DECIMAL with single-digit-exact factors "
        "(qty lands as an exact integer-scaled decimal), summed wide "
        "(28,6) and emitted once as double.  Physical shape: the "
        "name-filtered part dim broadcasts and prunes the fact first, "
        "supplier and nation broadcast, one (nation, year) "
        "aggregation — a single fact pass.",
    tags=("relational", "tpch", "lineitem", "part", "supplier"),
)
def q243(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").like("%bolt%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    ) - F.col("p_retailprice").cast("decimal(18,2)") * F.col("l_quantity").cast(
        "bigint"
    ).cast("decimal(18,0)") * F.lit(0.10).cast("decimal(6,2)")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg(
            F.sum(profit).cast("decimal(28,6)").cast("double").alias("profit")
        )
    )

# ---------------------------------------------------------------------------
# q244: TPC-H Q8-shape — national market share within a regional market
# ---------------------------------------------------------------------------

@register(
    "q244_nation_market_share",
    sql="""
    WITH vol AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             sn.n_name AS supp_nation,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,4))) AS volume
      FROM lineitem
      JOIN orders    ON o_orderkey = l_orderkey
      JOIN customer  ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN region    ON r_regionkey = cn.n_regionkey
      JOIN part      ON p_partkey = l_partkey
      JOIN supplier  ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      WHERE r_name = 'ASIA'
        AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           CAST(
             CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_7'
                                THEN volume
                                ELSE CAST(0 AS DECIMAL(18,2)) END)
                       AS DECIMAL(28,6)) AS DOUBLE)
             / CAST(CAST(SUM(volume) AS DECIMAL(28,6)) AS DOUBLE)
           AS DOUBLE) AS mkt_share
    FROM vol GROUP BY 1
    """,
    doc="TPC-H Q8 shape: NATION_7's share of the ECONOMY-part revenue "
        "sold into the ASIA market per order year — the market-share "
        "ratio of two conditional aggregates over one seven-table "
        "star, completing the 22-shape TPC-H family (q01..q243 cover "
        "the other 21).  Numerator and denominator are summed as "
        "exact decimals and emitted through one IEEE double division "
        "(deterministic given exact inputs), never averaged as "
        "floats.  Physical shape: the type-filtered part dim "
        "broadcasts and prunes the fact first, region/nation/supplier "
        "broadcast, the orderkey equi-join is the one fact-fact "
        "shuffle, and customer joins shuffle-side because at 100 TB "
        "the customer table is fact-sized (the q230 rule); both CASE "
        "sums ride a single (year) aggregation.",
    tags=("relational", "tpch", "lineitem", "orders", "market-share"),
)
def q244(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = (
        load(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_nationkey"),
        F.col("n_regionkey").alias("cn_regionkey"),
    )
    r = (
        load(spark, sf_dir, "region")
        .where(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    volume = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )
    vol = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == cn["cn_nationkey"])
        .join(F.broadcast(r), cn["cn_regionkey"] == r["r_regionkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == sn["sn_nationkey"])
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.col("supp_nation"),
            volume.alias("volume"),
        )
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    ).cast("decimal(28,6)")
    den = F.sum("volume").cast("decimal(28,6)")
    return (
        vol.groupBy("o_year")
        .agg(num.alias("_num"), den.alias("_den"))
        .select(
            "o_year",
            (F.col("_num").cast("double") / F.col("_den").cast("double"))
            .cast("double")
            .alias("mkt_share"),
        )
    )

# ---------------------------------------------------------------------------
# q245: position-based (U-shaped) multi-touch attribution
# ---------------------------------------------------------------------------

@register(
    "q245_position_attribution",
    sql="""
    WITH marked AS (
      SELECT user_id, event_id, ts, event_type, value,
             CASE WHEN epoch_us(ts) // 1000000
                       - LAG(epoch_us(ts) // 1000000)
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    sess AS (
      SELECT user_id, event_id, ts, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    ),
    p AS (SELECT user_id, sid, event_id AS pid, ts AS pts, cents
          FROM sess WHERE event_type = 'purchase'),
    t AS (SELECT user_id, sid, event_id AS tid, ts AS tts,
                 event_type AS touchpoint
          FROM sess WHERE event_type <> 'purchase'),
    pairs AS (
      SELECT p.user_id, p.sid, p.pid, p.cents, t.touchpoint, t.tts, t.tid
      FROM t JOIN p USING (user_id, sid)
      WHERE t.tts < p.pts OR (t.tts = p.pts AND t.tid < p.pid)
    ),
    ranked AS (
      SELECT touchpoint, cents * 10000 AS total,
             COUNT(*) OVER (PARTITION BY user_id, sid, pid) AS n,
             ROW_NUMBER() OVER (PARTITION BY user_id, sid, pid
                                ORDER BY tts, tid) AS rn
      FROM pairs
    ),
    credited AS (
      SELECT touchpoint,
             CASE WHEN n = 1 THEN total
                  WHEN n = 2 THEN total // 2
                       + CASE WHEN rn = 1
                              THEN total - (total // 2) * 2 ELSE 0 END
                  ELSE CASE
                    WHEN rn = 1 OR rn = n THEN (total * 4) // 10
                    ELSE (total - 2 * ((total * 4) // 10)) // (n - 2)
                         + CASE WHEN rn = 2 THEN
                             (total - 2 * ((total * 4) // 10))
                             - ((total - 2 * ((total * 4) // 10))
                                // (n - 2)) * (n - 2)
                           ELSE 0 END
                  END
             END AS credit
      FROM ranked
    ),
    att AS (
      SELECT touchpoint, CAST(COUNT(*) AS BIGINT) AS n_credits,
             SUM(credit) AS micros
      FROM credited GROUP BY touchpoint
    ),
    unatt AS (
      SELECT '__unattributed__' AS touchpoint,
             CAST(COUNT(*) AS BIGINT) AS n_credits,
             SUM(cents * 10000) AS micros
      FROM p
      WHERE NOT EXISTS (SELECT 1 FROM pairs WHERE pairs.pid = p.pid)
      HAVING COUNT(*) > 0
    )
    SELECT touchpoint, n_credits,
           CAST(ROUND((CAST(micros AS DOUBLE) / 1e6) * 1e6) AS BIGINT) / 1e6 AS attributed_value
    FROM (SELECT * FROM att UNION ALL SELECT * FROM unatt)
    """,
    doc="Position-based (U-shaped 40/20/40) multi-touch attribution "
        "(relational.timeseries.position_attribution): completes the "
        "attribution family — last-touch (q93) and linear (q190) plus "
        "this, the standard U-shaped model.  First and last touch of "
        "each goal's session take floor(40%) each, the middles split "
        "the exact remainder (earliest middle absorbs the largest-"
        "remainder), one touch takes all, two split 50/50 — every "
        "division a true floor so refunds agree with DuckDB's // "
        "bit-for-bit and per-goal credits sum exactly.  Same physical "
        "shape as q190: session window, (user, session)-bounded "
        "expansion, pair-grain credit windows, one key family.",
    tags=("timeseries", "events", "attribution"),
)
def q245(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .timeseries import position_attribution

    return position_attribution(load(spark, sf_dir, "events"))

# ---------------------------------------------------------------------------
# q246: BPE merge-pair frequency mining (tokenizer-training inner loop)
# ---------------------------------------------------------------------------

@register(
    "q246_bpe_merge_pairs",
    sql="""
    WITH words AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
      FROM documents
    ),
    vocab AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
      FROM words WHERE w <> '' GROUP BY 1
    ),
    pairs AS (
      SELECT substr(w, i, 1) AS left_sym,
             substr(w, i + 1, 1) AS right_sym,
             freq, w
      FROM vocab, UNNEST(generate_series(1, length(w) - 1)) AS g(i)
      WHERE length(w) >= 2
    )
    SELECT left_sym, right_sym,
           CAST(SUM(freq) AS BIGINT) AS pair_count,
           CAST(COUNT(DISTINCT w) AS BIGINT) AS n_words
    FROM pairs GROUP BY 1, 2
    """,
    doc="BPE merge-pair frequency mining — the distributed inner loop "
        "of byte-pair-encoding tokenizer training (Sennrich et al.): "
        "count every adjacent symbol pair weighted by corpus word "
        "frequency; the argmax pair is the next merge rule.  The "
        "100 TB trick is the grain change: the corpus collapses to "
        "the DISTINCT-WORD vocabulary first (Zipf-bounded, millions "
        "of rows regardless of corpus size), and the position explode "
        "+ pair rollup run on the VOCAB — corpus scale is paid once "
        "in a hash(word) count, never in the per-character work.  "
        "n_words (distinct words containing the pair) rides the same "
        "aggregation.  Exact integer counts; ASCII test corpus so "
        "substr char semantics agree across engines.",
    tags=("text", "documents", "tokenizer"),
)
def q246(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w")
    ).where(F.col("w") != "")
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    pairs = (
        vocab.where(F.length("w") >= 2)
        .select(
            "w", "freq",
            F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
        )
        .select(
            "w", "freq",
            F.expr("substr(w, i, 1)").alias("left_sym"),
            F.expr("substr(w, i + 1, 1)").alias("right_sym"),
        )
    )
    return pairs.groupBy("left_sym", "right_sym").agg(
        F.sum("freq").cast("bigint").alias("pair_count"),
        F.countDistinct("w").alias("n_words"),
    )

# ---------------------------------------------------------------------------
# q247: rendezvous-hash shard rebalancing (consistent-hashing movement)
# ---------------------------------------------------------------------------

@register(
    "q247_rendezvous_rebalance",
    sql="""
    WITH keys AS (SELECT o_orderkey AS k FROM orders),
    nodes AS (SELECT unnest(generate_series(0, 5)) AS node),
    scored AS (
      SELECT k, node,
             (k * 48271 + node * 1299721) % 2147483647 AS h
      FROM keys CROSS JOIN nodes
    ),
    old AS (
      SELECT k, node AS old_node FROM (
        SELECT k, node,
               ROW_NUMBER() OVER (PARTITION BY k
                                  ORDER BY h DESC, node) AS rn
        FROM scored WHERE node < 5
      ) WHERE rn = 1
    ),
    neu AS (
      SELECT k, node AS new_node FROM (
        SELECT k, node,
               ROW_NUMBER() OVER (PARTITION BY k
                                  ORDER BY h DESC, node) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    j AS (SELECT old_node, new_node FROM old JOIN neu USING (k))
    SELECT node AS node_id,
           CAST(SUM(CASE WHEN old_node = node THEN 1 ELSE 0 END)
                AS BIGINT) AS n_before,
           CAST(SUM(CASE WHEN new_node = node THEN 1 ELSE 0 END)
                AS BIGINT) AS n_after,
           CAST(SUM(CASE WHEN old_node = node AND new_node = node
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_stayed
    FROM nodes CROSS JOIN j
    GROUP BY 1
    """,
    doc="Rendezvous (highest-random-weight) hashing shard rebalance "
        "report: every order key is assigned to the node whose "
        "per-(key, node) hash scores highest, under the old 5-node "
        "ring and a new 6-node ring; per node, keys held before, "
        "after, and inherited in place.  The consistent-hashing "
        "guarantee — only ~1/(n+1) of keys move, and ONLY onto the "
        "new node — falls out of the numbers.  Physical shape is the "
        "100 TB point: assignment is a PER-ROW argmax over an inline "
        "array of (hash, node) structs (array_max's lexicographic "
        "compare; node negated so ties pick the smallest), so both "
        "ring evaluations run inside the scan projection with ZERO "
        "joins or shuffles before the final 6-group rollup — the "
        "oracle's unnest + row_number formulation would shuffle "
        "|keys| x |nodes| rows.  The hash is plain 64-bit integer "
        "arithmetic ((k*48271 + node*1299721) mod 2^31-1) evaluated "
        "identically in both engines — no engine-specific hash "
        "function anywhere.",
    tags=("relational", "infra", "orders", "sharding"),
)
def q247(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.col("k")

    def assigned(nodes: list[int]):
        arr = F.array(
            *[
                F.struct(
                    ((k * 48271 + F.lit(n) * 1299721) % F.lit(2147483647)).alias(
                        "h"
                    ),
                    F.lit(-n).alias("m"),
                )
                for n in nodes
            ]
        )
        return (-F.array_max(arr)["m"]).cast("bigint")

    keys = load(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    assign = keys.select(
        assigned(list(range(5))).alias("old_node"),
        assigned(list(range(6))).alias("new_node"),
    )
    after = assign.groupBy(F.col("new_node").alias("node_id")).agg(
        F.count(F.lit(1)).alias("n_after"),
        F.sum(
            F.when(F.col("old_node") == F.col("new_node"), 1).otherwise(0)
        ).cast("bigint").alias("n_stayed"),
    )
    before = assign.groupBy(F.col("old_node").alias("node_id")).agg(
        F.count(F.lit(1)).alias("n_before")
    )
    nodes = spark.range(6).select(F.col("id").alias("node_id"))
    return (
        nodes.join(F.broadcast(before), "node_id", "left")
        .join(F.broadcast(after), "node_id", "left")
        .select(
            "node_id",
            F.coalesce("n_before", F.lit(0)).cast("bigint").alias("n_before"),
            F.coalesce("n_after", F.lit(0)).cast("bigint").alias("n_after"),
            F.coalesce("n_stayed", F.lit(0)).cast("bigint").alias("n_stayed"),
        )
    )
