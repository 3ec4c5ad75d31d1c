"""Round-5 catalog entries, second batch (q155–q164): interval-union
coverage (sweep line), degree-oriented triangle counting, Markov
transition matrices, weighted medians, largest-remainder apportionment,
Zipf-law fits, session path mining, Welch's t-test, entropy / KL
divergence, and SCD Type-2 dimension builds — each an analytics
primitive the reference's users would reach for next, each expressed as
the Spark plan that survives 100 TB (aggregate-grain windows, oriented
wedge joins instead of all-pairs, sufficient-statistics single passes),
and each graded against a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .catalog import load, register, pround


# ---------------------------------------------------------------------------
# q155: interval union coverage (sweep line)
# ---------------------------------------------------------------------------

@register(
    "q155_interval_union_coverage",
    sql="""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS s,
             epoch_us(ts) + (1 + event_id % 7) * 60000000 AS e
      FROM events
    ),
    marked AS (
      SELECT user_id, event_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pm
      FROM iv
    ),
    tagged AS (
      SELECT user_id, s, e,
             SUM(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, e, event_id
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    ),
    islands AS (
      SELECT user_id, island, COUNT(*) AS n_iv,
             MAX(e) - MIN(s) AS covered
      FROM tagged GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(SUM(n_iv) AS BIGINT) AS n_intervals,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(covered) AS BIGINT) AS covered_us
    FROM islands GROUP BY user_id
    """,
    doc="Interval-union coverage per user (the sweep line): each event "
        "opens an interval of 1 + event_id % 7 minutes; overlapping "
        "intervals MERGE and the output is exact covered microseconds "
        "— the double-counting-free utilization / uptime / on-screen "
        "time question.  Classic gaps-and-islands physics: one window "
        "shuffle on the user key orders intervals by start, a running "
        "MAX(end) over preceding rows marks island starts (start > "
        "max-prev-end), a cumulative sum labels islands, and covered "
        "time is max(end)-min(start) per island — O(n log n) per key, "
        "never the O(n^2) self-join.  Integer-microsecond arithmetic "
        "end to end (epoch micros), so the answer is engine-exact.",
    tags=("window", "intervals", "events"),
)
def q155(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + (1 + F.col("event_id") % 7) * F.lit(60_000_000)
        ).alias("e"),
    )
    wo = Window.partitionBy("user_id").orderBy("s", "e", "event_id")
    marked = e.select(
        "user_id",
        "event_id",
        "s",
        "e",
        F.max("e").over(wo.rowsBetween(Window.unboundedPreceding, -1)).alias("pm"),
    )
    tagged = marked.select(
        "user_id",
        "s",
        "e",
        F.sum(
            F.when(F.col("pm").isNull() | (F.col("s") > F.col("pm")), 1).otherwise(0)
        )
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    islands = tagged.groupBy("user_id", "island").agg(
        F.count("*").alias("n_iv"),
        (F.max("e") - F.min("s")).alias("covered"),
    )
    return islands.groupBy("user_id").agg(
        F.sum("n_iv").cast("long").alias("n_intervals"),
        F.count("*").cast("long").alias("n_islands"),
        F.sum("covered").cast("long").alias("covered_us"),
    )


# ---------------------------------------------------------------------------
# q156: degree-oriented triangle counting
# ---------------------------------------------------------------------------

@register(
    "q156_triangle_count",
    sql="""
    WITH pr AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a
      JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      WHERE a.l_quantity >= 25 AND b.l_quantity >= 25
    ),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM pr UNION ALL SELECT v AS node FROM pr
      ) GROUP BY node
    ),
    o AS (
      SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND pr.u < pr.v)
                  THEN pr.u ELSE pr.v END AS src,
             CASE WHEN du.d < dv.d OR (du.d = dv.d AND pr.u < pr.v)
                  THEN pr.v ELSE pr.u END AS dst
      FROM pr
      JOIN deg du ON du.node = pr.u
      JOIN deg dv ON dv.node = pr.v
    )
    SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
           (SELECT COUNT(*) FROM pr) AS n_edges,
           (SELECT COUNT(*)
            FROM o e1
            JOIN o e2 ON e2.src = e1.dst
            JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst) AS n_triangles
    """,
    doc="Exact triangle counting on the part co-purchase graph (parts "
        "linked when they ship in substantial quantity — >= 25 units — "
        "in the same order; the quantity floor models affinity above "
        "noise and bounds edge density) with the DEGREE-"
        "ORIENTED wedge algorithm: every undirected edge is directed "
        "from its lower-(degree, id) endpoint to the higher, so each "
        "triangle is counted exactly once and — the scale guarantee — "
        "every wedge join fans out on OUT-degree, which orientation "
        "bounds by O(sqrt(m)) even when raw degrees are power-law "
        "(the celebrity node's million edges all point IN).  Total "
        "work O(m^1.5) worst case vs the unoriented join's "
        "sum(deg^2); all equi-joins, no cartesians.  The clustering-"
        "coefficient / community-detection primitive.",
    tags=("graph", "join", "lineitem"),
)
def q156(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 25)
        .select("l_orderkey", "l_partkey")
    )
    a = li.alias("a")
    b = li.alias("b")
    pr = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    deg = (
        pr.select(F.col("u").alias("node"))
        .unionAll(pr.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # degree frame is node-grain (|V| rows) — broadcast both sides so
    # the edge frame never shuffles for orientation
    o = (
        pr.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
    )
    # the oriented edge frame feeds FIVE plan branches (both wedge
    # sides, the closing probe, and both counts); without truncation
    # each branch would recompute the distinct self-join + degree
    # joins (~9 rebuilds of pr — measured 14.5 s vs ~4 s at sf0.1).
    # persist() pins it once (r11: the lazy cache fills inside the
    # first consumer's job instead of costing a separate eager-
    # checkpoint blocking job — the q169 measurement, −54%); blocks are
    # ContextCleaner-owned and drain when the result is dropped
    # (pinned by the q156 sweep-hygiene test).
    o = o.persist()
    e1 = o.select(F.col("src").alias("a1"), F.col("dst").alias("b1"))
    e2 = o.select(F.col("src").alias("b1"), F.col("dst").alias("c1"))
    wedges = e1.join(e2, "b1").select("a1", "c1")
    closing = o.select(F.col("src").alias("a1"), F.col("dst").alias("c1"))
    tri = wedges.join(closing, ["a1", "c1"]).agg(
        F.count("*").alias("n_triangles")
    )
    # three single-row aggregates -> one row; deliberate 1x1 joins.
    # node/edge counts derive from the materialized oriented frame
    # (every pr edge appears exactly once; its endpoints are exactly
    # the degree-frame nodes)
    nn = (
        o.select(F.col("src").alias("node"))
        .unionAll(o.select(F.col("dst").alias("node")))
        .distinct()
        .agg(F.count("*").alias("n_nodes"))
    )
    ne = o.agg(F.count("*").alias("n_edges"))
    return nn.crossJoin(ne).crossJoin(tri)


# ---------------------------------------------------------------------------
# q157: Markov transition matrix over event types
# ---------------------------------------------------------------------------

@register(
    "q157_markov_transitions",
    sql="""
    WITH seq AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events
    )
    SELECT from_type, to_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND((CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (PARTITION BY from_type)) * 1e6) AS BIGINT) / 1e6 AS p
    FROM seq WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
    doc="First-order Markov transition matrix over per-user event "
        "sequences: one lead() window (ts, event_id deterministic "
        "order) pairs each event with its successor, a (from, to) "
        "count aggregation collapses to the |types|^2 grain, and row "
        "probabilities normalize via a window over that tiny grain — "
        "raw rows are touched exactly once, the matrix itself is "
        "vocabulary-sized.  The next-event-prediction / journey-"
        "analysis primitive; counts are exact, p is a single exact-"
        "integer division rendered at 6 places.",
    tags=("window", "sequence", "events"),
)
def q157(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        load(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
    )
    cnt = seq.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n")
    )
    return cnt.select(
        "from_type",
        "to_type",
        "n",
        pround(F.col("n").cast("double")
            / F.sum("n").over(Window.partitionBy("from_type")), 6).alias("p"),
    )


# ---------------------------------------------------------------------------
# q158: weighted median per group
# ---------------------------------------------------------------------------

@register(
    "q158_weighted_median",
    sql="""
    WITH w AS (
      SELECT l_returnflag, l_extendedprice AS v,
             SUM(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag) AS tw
      FROM lineitem
    ),
    sel AS (
      SELECT l_returnflag, v, tw,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY cw) AS rn
      FROM w WHERE 2 * cw >= tw
    )
    SELECT l_returnflag,
           CAST(tw AS BIGINT) AS total_weight,
           CAST(v AS DOUBLE) AS weighted_median
    FROM sel WHERE rn = 1
    """,
    doc="Quantity-weighted median price per return flag: the lower "
        "weighted median — first value whose cumulative weight reaches "
        "half the group total — via one ordered window (deterministic "
        "(price, orderkey, linenumber) tiebreak) and a cumulative-"
        "weight crossing filter, ALL integer arithmetic (2*cw >= tw, "
        "no halves, no floats) so the selection is engine-exact.  The "
        "robust-center primitive when observations carry multiplicity "
        "(shares, quantities, durations); one window shuffle on the "
        "group key, selection is a codegen filter.",
    tags=("window", "robust-stats", "lineitem"),
)
def q158(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog import emit

    li = load(spark, sf_dir, "lineitem")
    # r10 opt (q142 rule): the crossing VALUE is decided at the
    # (flag, price) grain — the row-level (orderkey, linenumber)
    # tiebreak only orders rows WITHIN one price, and the first row
    # with 2*cw >= tw always lands in the value group where the
    # value-grain cumulative weight first crosses, so the emitted
    # (v, tw) pair is identical.  Aggregate weights per value first
    # (partial/map-side), then run the cumulative window over the
    # distinct-price grain: the fact shuffles pre-aggregated narrow
    # rows instead of full rows, and the 3-partition ordered window
    # scans distinct values, not the table.
    g = li.groupBy("l_returnflag", F.col("l_extendedprice").alias("v")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("_w")
    )
    wo = (
        Window.partitionBy("l_returnflag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("l_returnflag")
    w = g.select(
        "l_returnflag",
        "v",
        F.sum("_w").over(wo).alias("cw"),
        F.sum("_w").over(wt).alias("tw"),
    )
    sel = w.where(2 * F.col("cw") >= F.col("tw")).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("l_returnflag").orderBy("cw")
        ),
    )
    return sel.where(F.col("rn") == 1).select(
        "l_returnflag",
        F.col("tw").alias("total_weight"),
        emit(F.col("v")).alias("weighted_median"),
    )


# ---------------------------------------------------------------------------
# q159: largest-remainder apportionment
# ---------------------------------------------------------------------------

@register(
    "q159_largest_remainder_seats",
    sql="""
    WITH cnt AS (
      SELECT c_nationkey, COUNT(*) AS n FROM customer GROUP BY 1
    ),
    q AS (
      SELECT c_nationkey, n,
             (n * 1000) // SUM(n) OVER () AS base,
             (n * 1000) % SUM(n) OVER () AS rem
      FROM cnt
    ),
    r AS (
      SELECT c_nationkey, n, base,
             1000 - SUM(base) OVER () AS leftover,
             row_number() OVER (ORDER BY rem DESC, c_nationkey) AS rk
      FROM q
    )
    SELECT c_nationkey,
           CAST(n AS BIGINT) AS n_customers,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS seats
    FROM r
    """,
    doc="Largest-remainder (Hamilton) apportionment: 1000 seats split "
        "across nations proportionally to customer count, integer-"
        "exact — floor quotas first, then the leftover seats go to the "
        "largest remainders (nationkey tiebreak), so seats always sum "
        "to exactly 1000 with no floating point anywhere.  The "
        "budget / shard / sampling-quota allocation primitive (how the "
        "sampling stack turns fractional mixture weights into exact "
        "per-domain document counts).  Raw rows collapse to the group "
        "grain in one pass; the quota windows run over #groups rows.",
    tags=("window", "allocation", "customer"),
)
def q159(spark: SparkSession, sf_dir: str) -> DataFrame:
    cnt = (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n"))
    )
    wall = Window.partitionBy()
    q = cnt.select(
        "c_nationkey",
        "n",
        (F.col("n") * 1000).alias("_num"),
        F.sum("n").over(wall).alias("_tot"),
    ).select(
        "c_nationkey",
        "n",
        F.expr("_num div _tot").alias("base"),
        (F.col("_num") % F.col("_tot")).alias("rem"),
    )
    r = q.select(
        "c_nationkey",
        "n",
        "base",
        (F.lit(1000) - F.sum("base").over(wall)).alias("leftover"),
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), F.asc("c_nationkey")))
        .alias("rk"),
    )
    return r.select(
        "c_nationkey",
        F.col("n").cast("long").alias("n_customers"),
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("seats"),
    )


# ---------------------------------------------------------------------------
# q160: Zipf-law fit over token frequencies
# ---------------------------------------------------------------------------

@register(
    "q160_zipf_law_fit",
    sql="""
    WITH tok AS (
      SELECT lower(UNNEST(string_split(text, ' '))) AS w FROM documents
    ),
    freq AS (
      SELECT w, COUNT(*) AS c FROM tok WHERE w <> '' GROUP BY w
    ),
    rk AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, w) AS r FROM freq
    ),
    pts AS (
      SELECT 'all' AS corpus,
             CAST(ROUND((ln(r)) * 1e4) AS BIGINT) / 1e4 AS x,
             CAST(ROUND((ln(c)) * 1e4) AS BIGINT) / 1e4 AS y
      FROM rk WHERE r <= 200
    ),
    s AS (
      SELECT corpus,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x AS DECIMAL(12,4))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(12,4))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(19,4))
                    * CAST(x AS DECIMAL(12,4))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(19,4))
                    * CAST(y AS DECIMAL(12,4))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(x AS DECIMAL(19,4))
                    * CAST(y AS DECIMAL(12,4))) AS DOUBLE) AS sxy
      FROM pts
      GROUP BY corpus
    )
    SELECT corpus,
           CAST(n AS BIGINT) AS n,
           CAST(ROUND(((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 1e6) AS BIGINT) / 1e6 AS slope,
           CAST(ROUND(((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n) * 1e6) AS BIGINT) / 1e6
             AS intercept,
           CAST(ROUND((((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy))) * 1e6) AS BIGINT) / 1e6 AS r2
    FROM s
    """,
    doc="Zipf's-law fit over the corpus vocabulary: token frequencies "
        "rank (deterministic (count desc, token) order), the top-200 "
        "log-log points (ln rank, ln freq) pre-rounded to 4 places so "
        "both engines feed IDENTICAL decimals into sketches.linear_fit"
        "'s sufficient-statistics pass, and the slope is the Zipf "
        "exponent (~-1 for natural text) with r2 as the fit quality — "
        "the corpus-health check every training-data pipeline runs "
        "(a slope far from -1 or a poor fit flags boilerplate, spam, "
        "or synthetic text).  Token counting is one shuffle at word "
        "grain; the regression runs over 200 points.",
    tags=("llm-data", "regression", "documents"),
)
def q160(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sketches import linear_fit

    tok = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .select(F.lower("w").alias("w"))
        .where(F.col("w") != "")
    )
    freq = tok.groupBy("w").agg(F.count("*").alias("c"))
    rk = freq.select(
        "c",
        F.row_number().over(Window.orderBy(F.desc("c"), F.asc("w"))).alias("r"),
    )
    pts = rk.where(F.col("r") <= 200).select(
        F.lit("all").alias("corpus"),
        pround(F.log("r"), 4).alias("x"),
        pround(F.log("c"), 4).alias("y"),
    )
    return linear_fit(pts, "x", "y", "corpus")


# ---------------------------------------------------------------------------
# q161: top session paths
# ---------------------------------------------------------------------------

@register(
    "q161_top_session_paths",
    sql="""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tagged AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    ),
    rn AS (
      SELECT user_id, sid, event_type,
             row_number() OVER (
               PARTITION BY user_id, sid ORDER BY ts, event_id) AS rn
      FROM tagged
    ),
    paths AS (
      SELECT user_id, sid,
             concat_ws('>',
               MAX(CASE WHEN rn = 1 THEN event_type END),
               MAX(CASE WHEN rn = 2 THEN event_type END),
               MAX(CASE WHEN rn = 3 THEN event_type END)) AS path
      FROM rn WHERE rn <= 3 GROUP BY user_id, sid
    ),
    agg AS (SELECT path, COUNT(*) AS n_sessions FROM paths GROUP BY path),
    top AS (
      SELECT path, n_sessions,
             row_number() OVER (ORDER BY n_sessions DESC, path) AS rnk
      FROM agg
    )
    SELECT path,
           CAST(n_sessions AS BIGINT) AS n_sessions,
           CAST(rnk AS BIGINT) AS rnk
    FROM top WHERE rnk <= 10
    """,
    doc="Top-10 session entry paths: 30-minute-gap sessions (q32's "
        "gaps-and-islands semantics, (ts, event_id) deterministic "
        "order), each session reduced to its first-3-event-type path "
        "string, counted, ranked with a deterministic (count desc, "
        "path) tiebreak.  The journey-mining primitive behind funnel "
        "discovery.  Scale: both windows ride ONE hash(user) "
        "distribution (sessionize, then rank within session); the "
        "path aggregation collapses to |distinct paths| <= |types|^3 "
        "rows before the final top-k window touches anything.",
    tags=("window", "session", "sequence", "events"),
)
def q161(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.withColumn(
        "new_s",
        F.when(
            F.lag("ts").over(wo).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wo))
                >= 1800 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    tagged = marked.withColumn(
        "sid", F.sum("new_s").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    )
    rn = tagged.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
        ),
    ).where(F.col("rn") <= 3)
    paths = rn.groupBy("user_id", "sid").agg(
        F.concat_ws(
            ">",
            F.max(F.when(F.col("rn") == 1, F.col("event_type"))),
            F.max(F.when(F.col("rn") == 2, F.col("event_type"))),
            F.max(F.when(F.col("rn") == 3, F.col("event_type"))),
        ).alias("path")
    )
    agg = paths.groupBy("path").agg(F.count("*").cast("long").alias("n_sessions"))
    return (
        agg.withColumn(
            "rnk",
            F.row_number()
            .over(Window.orderBy(F.desc("n_sessions"), F.asc("path")))
            .cast("long"),
        )
        .where(F.col("rnk") <= 10)
    )


# ---------------------------------------------------------------------------
# q162: Welch's t-test from sufficient statistics
# ---------------------------------------------------------------------------

@register(
    "q162_welch_ttest",
    sql="""
    WITH s AS (
      SELECT event_type, user_id % 2 AS v,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value AS DECIMAL(19,4))
                    * CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sxx
      FROM events GROUP BY 1, 2
    ),
    p AS (
      SELECT a.event_type,
             a.n AS n_a, b.n AS n_b,
             a.sx / a.n AS ma, b.sx / b.n AS mb,
             (a.sxx - a.sx * a.sx / a.n) / (a.n - 1) AS va,
             (b.sxx - b.sx * b.sx / b.n) / (b.n - 1) AS vb
      FROM s a JOIN s b ON a.event_type = b.event_type
      WHERE a.v = 0 AND b.v = 1
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(ROUND((ma - mb) * 1e6) AS BIGINT) / 1e6 AS mean_diff,
           CAST(ROUND(((ma - mb) / sqrt(va / n_a + vb / n_b)) * 1e6) AS BIGINT) / 1e6 AS t_stat,
           CAST(ROUND((((va / n_a + vb / n_b) * (va / n_a + vb / n_b))
                 / ((va / n_a) * (va / n_a) / (n_a - 1)
                    + (vb / n_b) * (vb / n_b) / (n_b - 1))) * 1e6) AS BIGINT) / 1e6 AS welch_df
    FROM p
    """,
    doc="Welch's unequal-variance t-test per event type (variant = "
        "user_id parity, the A/B-experiment readout): ONE aggregation "
        "pass collects decimal-exact sufficient statistics (n, sum, "
        "sum-of-squares — the q139 discipline, products cast to "
        "decimal BEFORE summing so the stats are order-independent), "
        "then mean difference, t statistic, and the Welch–"
        "Satterthwaite degrees of freedom come from the SAME closed-"
        "form double expression in both engines.  The experimentation "
        "primitive at 100 TB: no per-row second pass, no variance-of-"
        "stream numerical drift, group grain output.",
    tags=("ml-stats", "ab-test", "events"),
)
def q162(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    xd = F.col("value").try_cast("decimal(12,4)")
    x19 = F.col("value").try_cast("decimal(19,4)")
    # the linear_fit domain discipline: try_cast nulls out-of-domain
    # values in both ANSI and legacy modes, which would silently skew
    # the sums while n still counts the row — count the cast-nulled
    # inputs and raise at execution if any exist
    overflowed = (F.col("value").isNotNull() & xd.isNull()).cast("int")
    s = e.groupBy("event_type", (F.col("user_id") % 2).alias("v")).agg(
        F.count("*").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(x19 * xd).cast("double").alias("sxx"),
        F.coalesce(F.sum(overflowed), F.lit(0)).alias("ovf"),
    )
    a = s.where(F.col("v") == 0).select(
        "event_type",
        F.col("n").alias("n_a"),
        F.col("sx").alias("sxa"),
        F.col("sxx").alias("sxxa"),
        F.col("ovf").alias("ovfa"),
    )
    b = s.where(F.col("v") == 1).select(
        "event_type",
        F.col("n").alias("n_b"),
        F.col("sx").alias("sxb"),
        F.col("sxx").alias("sxxb"),
        F.col("ovf").alias("ovfb"),
    )
    p = a.join(b, "event_type")
    domain_error = F.raise_error(
        F.lit(
            "q162: value outside the decimal(12,4) domain (|v| >= 1e8)"
            " would be silently dropped from the sufficient statistics"
        )
    )

    def guarded(col):
        # in every output column, so any projection still carries the check
        return F.when(
            F.col("ovfa") + F.col("ovfb") > 0, domain_error.cast("double")
        ).otherwise(col)
    ma = F.col("sxa") / F.col("n_a")
    mb = F.col("sxb") / F.col("n_b")
    va = (F.col("sxxa") - F.col("sxa") * F.col("sxa") / F.col("n_a")) / (
        F.col("n_a") - 1
    )
    vb = (F.col("sxxb") - F.col("sxb") * F.col("sxb") / F.col("n_b")) / (
        F.col("n_b") - 1
    )
    sa = va / F.col("n_a")
    sb = vb / F.col("n_b")
    return p.select(
        "event_type",
        guarded(F.col("n_a")).cast("long").alias("n_a"),
        guarded(F.col("n_b")).cast("long").alias("n_b"),
        guarded(pround(ma - mb, 6)).alias("mean_diff"),
        guarded(pround((ma - mb) / F.sqrt(sa + sb), 6)).alias("t_stat"),
        guarded(
            pround(((sa + sb) * (sa + sb))
                / (sa * sa / (F.col("n_a") - 1) + sb * sb / (F.col("n_b") - 1)), 6)
        ).alias("welch_df"),
    )


# ---------------------------------------------------------------------------
# q163: entropy and KL divergence per segment
# ---------------------------------------------------------------------------

@register(
    "q163_segment_entropy_kl",
    sql="""
    WITH seg AS (
      SELECT user_id % 4 AS segment, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT segment, c,
             SUM(c) OVER (PARTITION BY segment) AS n,
             SUM(c) OVER (PARTITION BY event_type) AS g,
             SUM(c) OVER () AS bign
      FROM seg
    )
    SELECT segment,
           CAST(MIN(n) AS BIGINT) AS n_events,
           CAST(ROUND((ln(MIN(n)) - SUM(c * ln(c)) / MIN(n)) * 1e6) AS BIGINT) / 1e6 AS entropy,
           CAST(ROUND((SUM(c * ln((CAST(c AS DOUBLE) * CAST(bign AS DOUBLE))
                            / (CAST(n AS DOUBLE) * CAST(g AS DOUBLE))))
                 / MIN(n)) * 1e6) AS BIGINT) / 1e6
             AS kl_vs_global
    FROM w GROUP BY segment
    """,
    doc="Behavioral-mix entropy and KL divergence per user segment "
        "(user_id % 4): Shannon entropy of each segment's event-type "
        "distribution plus its KL divergence from the GLOBAL mix — the "
        "drift / segment-differentiation metric (a segment whose KL "
        "jumps has changed behavior; uniform-mix segments have max "
        "entropy).  Raw rows collapse once to the (segment, type) "
        "grain; segment totals, per-type global totals, and the grand "
        "total all come from windows over that <=|segments|x|types| "
        "frame — no joins, no second scan.  Exact integer counts feed "
        "closed-form logs via the factored identity "
        "H = ln(n) - sum(c ln c)/n (one rounding at the end).",
    tags=("ml-stats", "entropy", "events"),
)
def q163(spark: SparkSession, sf_dir: str) -> DataFrame:
    seg = (
        load(spark, sf_dir, "events")
        .groupBy((F.col("user_id") % 4).alias("segment"), "event_type")
        .agg(F.count("*").alias("c"))
    )
    w = seg.select(
        "segment",
        "c",
        F.sum("c").over(Window.partitionBy("segment")).alias("n"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("g"),
        F.sum("c").over(Window.partitionBy()).alias("bign"),
    )
    return w.groupBy("segment").agg(
        F.min("n").cast("long").alias("n_events"),
        pround(F.log(F.min("n")) - F.sum(F.col("c") * F.log("c")) / F.min("n"), 6).alias("entropy"),
        pround(F.sum(
                F.col("c")
                # each bigint factor casts to double BEFORE the product
                # (the q140 rule): a bigint*bigint product wraps int64
                # once c*bign passes 2^63 — well inside 100 TB counts
                * F.log(
                    (F.col("c").cast("double") * F.col("bign").cast("double"))
                    / (F.col("n").cast("double") * F.col("g").cast("double"))
                )
            )
            / F.min("n"), 6).alias("kl_vs_global"),
    )


# ---------------------------------------------------------------------------
# q164: SCD Type-2 dimension build
# ---------------------------------------------------------------------------

@register(
    "q164_scd2_dimension_build",
    sql="""
    WITH ordered AS (
      SELECT o_custkey, o_orderstatus,
             CAST(o_orderdate AS DATE) AS o_orderdate, o_orderkey,
             lag(o_orderstatus) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS prev_status
      FROM orders
    ),
    changes AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
      FROM ordered
      WHERE prev_status IS NULL OR prev_status <> o_orderstatus
    ),
    iv AS (
      SELECT o_custkey, o_orderstatus,
             o_orderdate AS valid_from,
             lead(o_orderdate) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS nxt
      FROM changes
    )
    SELECT o_custkey, o_orderstatus,
           CAST(valid_from AS VARCHAR) AS valid_from,
           CAST(COALESCE(nxt, DATE '9999-12-31') AS VARCHAR) AS valid_to,
           CAST(CASE WHEN nxt IS NULL THEN 1 ELSE 0 END AS BIGINT)
             AS is_current
    FROM iv
    """,
    doc="Slowly-changing-dimension Type-2 build from a change log: "
        "each customer's order-status history collapses to its CHANGE "
        "points (lag() dedup of consecutive equal values), which "
        "become half-open validity intervals [valid_from, valid_to) "
        "via lead(), the open current version capped at 9999-12-31 "
        "with an is_current flag — the dimension-versioning primitive "
        "every warehouse maintains, and the batch complement of the "
        "MERGE family's upserts.  Both windows ride ONE hash(custkey) "
        "distribution; the change filter shrinks the frame before the "
        "interval window runs.  Deterministic (date, orderkey) "
        "tiebreak makes same-day changes engine-stable.",
    tags=("window", "scd", "warehouse", "orders"),
)
def q164(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderstatus",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_orderkey",
    )
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        o.withColumn("prev_status", F.lag("o_orderstatus").over(wo))
        .where(
            F.col("prev_status").isNull()
            | (F.col("prev_status") != F.col("o_orderstatus"))
        )
        .drop("prev_status")
    )
    iv = changes.withColumn("nxt", F.lead("o_orderdate").over(wo))
    return iv.select(
        "o_custkey",
        "o_orderstatus",
        F.col("o_orderdate").cast("string").alias("valid_from"),
        F.coalesce("nxt", F.lit("9999-12-31").cast("date"))
        .cast("string")
        .alias("valid_to"),
        F.when(F.col("nxt").isNull(), 1).otherwise(0).cast("long").alias(
            "is_current"
        ),
    )
