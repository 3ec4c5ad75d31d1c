"""Sketch-shaped exact-aggregation + distribution catalog entries (q128+).

Each query states naive semantics in its DuckDB oracle while the engine
runs the sketch-shaped plan from ``relational.sketches``:

  q128  exact per-day distinct users via bit_or bitmap words
  q129  equi-width price histogram (codegen bin projection)
  q130  Misra-Gries candidate + exact-verify heavy-hitter words
  q131  median/MAD robust anomaly gate per event type
  q132  unpivot (melt) of lineitem measures to long form
  q135  TPC-H Q13-style order-count distribution (double aggregation)
  q136  equi-depth quantile bucketing (boundary row broadcast, CASE map)
  q137  declarative data-quality expectation suite (one-pass CASE sums)
  q139  per-group OLS regression via sufficient statistics (one pass)
  q140  chi-square contingency cells (independence-test primitive)
  q141  deterministic ordered string aggregation (LISTAGG surface)
  q142  Spearman rank correlation (average ranks + q139 closed form)
  q143  join-key skew report (exact Gini of the key distribution)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import emit, load, register, pround
from . import sketches


@register(
    "q128_bitmap_distinct_users",
    sql="""
    SELECT date_trunc('day', ts) AS day,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_distinct
    FROM events
    GROUP BY 1
    """,
    doc="Exact daily active users WITHOUT a distinct shuffle "
        "(relational.sketches.bitmap_distinct): user ids map to 64-bit "
        "bitmap words, bit_or folds them map-side (associative + "
        "commutative, so every repeated id collapses into an already-set "
        "bit before the exchange), and a popcount-sum yields the exact "
        "count.  The oracle states plain COUNT(DISTINCT); Spark's own "
        "plan for that is an Expand + double shuffle carrying every "
        "(day, user) pair — the bitmap plan ships at most n_users/64 "
        "longs per day instead, the roaring-bitmap shape with exactness "
        "kept.  n_events rides the SAME single scan (a row count next "
        "to each bitmap word, summed at group grain) — one scan, two "
        "word-grain exchanges of ~n_users/64 rows, no join.",
    tags=("events", "sketch", "distinct", "bitmap"),
)
def q128(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    )
    res = sketches.bitmap_distinct(e, ["day"], "user_id", count_rows=True)
    return res.select(
        "day", F.col("n_rows").alias("n_events"), "n_distinct"
    )


@register(
    "q129_price_histogram",
    sql="""
    SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bin,
           CAST(CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS DOUBLE)
             * 25000.0 AS bin_lo,
           COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS sum_value
    FROM orders
    WHERE o_totalprice IS NOT NULL
    GROUP BY 1
    """,
    doc="Equi-width order-value histogram "
        "(relational.sketches.equi_width_histogram): fixed 25k-wide bins "
        "as a codegen floor-divide projection + partial-agg groupBy — "
        "one scan, a shuffle of #bins rows, the profiling primitive "
        "behind layout/skew decisions.  Fixed bin edges keep it "
        "single-pass (a min/max-derived range would cost a second scan) "
        "and cross-engine float-reproducible.",
    tags=("orders", "histogram", "profiling"),
)
def q129(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketches.equi_width_histogram(
        load(spark, sf_dir, "orders"), "o_totalprice", 25000.0
    )


@register(
    "q130_heavy_hitter_words",
    sql="""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents
    ),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM toks)
    SELECT token,
           COUNT(*) AS cnt,
           CAST(ROUND((COUNT(*) / (SELECT n FROM tot)) * 1e6) AS BIGINT) / 1e6 AS freq
    FROM toks
    GROUP BY token
    HAVING COUNT(*) > (SELECT n FROM tot) / 50
    """,
    doc="Exact heavy-hitter vocabulary (count > N/50) via "
        "candidate-then-verify (relational.sketches.heavy_hitters): "
        "per-partition Misra-Gries summaries (50 counters, bounded "
        "memory, no shuffle) whose union is a guaranteed SUPERSET of "
        "the true heavy hitters by pigeonhole; then ONE exact counting "
        "pass restricted to the broadcast candidate set.  The oracle "
        "states the naive full-vocabulary GROUP BY ... HAVING; at "
        "100 TB that shuffle carries the whole vocabulary while the "
        "engine's carries <= 50 x partitions candidate keys.  The final "
        "filter runs on exact counts, so the answer is deterministic "
        "despite the partition-dependent candidate pass.",
    tags=("documents", "sketch", "frequent-items", "mapInPandas"),
)
def q130(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("token")
    )
    return sketches.heavy_hitters(tokens, "token", k=50)


@register(
    "q131_robust_value_anomalies",
    sql="""
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY 1
    ),
    mad AS (
      SELECT e.event_type, median(abs(e.value - m.med)) AS mad
      FROM events e JOIN med m USING (event_type) GROUP BY 1
    )
    SELECT e.event_type,
           COUNT(*) AS n_rows,
           CAST(COALESCE(SUM(CASE WHEN abs(e.value - m.med) > 3.0 * d.mad
                                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_anomalies,
           CAST(m.med AS DOUBLE) AS med,
           CAST(d.mad AS DOUBLE) AS mad
    FROM events e
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    GROUP BY e.event_type, m.med, d.mad
    """,
    doc="Robust (median/MAD) anomaly gate per event type "
        "(relational.sketches.robust_anomalies): two exact-median "
        "reductions at group grain broadcast back onto the fact stream, "
        "then a codegen comparison — three scans, ZERO fact-side "
        "shuffles (both joins broadcast #event_type rows).  MAD is the "
        "telemetry-grade outlier estimator: one corrupt batch moves a "
        "mean/stddev gate arbitrarily but a median/MAD gate by one "
        "rank.  Exact interpolating medians match DuckDB bit-for-bit; "
        "the 100 TB swap is approx_percentile(0.5) with the same plan "
        "shape.",
    tags=("events", "anomaly", "robust-stats"),
)
def q131(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketches.robust_anomalies(
        load(spark, sf_dir, "events"), "event_type", "value", k_sigma=3.0
    )


@register(
    "q132_unpivot_lineitem_measures",
    sql="""
    WITH long AS (
      SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT 'l_tax', l_tax FROM lineitem
    )
    SELECT measure,
           COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(val AS DECIMAL(18,4))) AS DECIMAL(18,4))
                AS DOUBLE) AS sum_val,
           CAST(CAST(CAST(SUM(CAST(val AS DECIMAL(18,4))) AS DECIMAL(18,4))
                AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_val
    FROM long
    GROUP BY measure
    """,
    doc="Unpivot / melt (DataFrame.unpivot, Spark's native Expand "
        "operator) of the four lineitem measures to long form, then a "
        "4-key aggregate — the wide-to-long reshape every metrics "
        "pipeline needs.  Expand multiplies rows 4x BEFORE the "
        "partial agg, but the map-side combine collapses each "
        "partition to 4 rows pre-shuffle, so the exchange carries "
        "4 x partitions rows regardless of fact size.  Decimal-exact "
        "sums (order-independent), average derived from the exact sum "
        "as double/count in both engines.",
    tags=("lineitem", "unpivot", "reshape"),
)
def q132(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    sum_dec = F.sum(F.col("val").cast("decimal(18,4)")).cast("decimal(18,4)")
    return long.groupBy("measure").agg(
        F.count("*").alias("n_rows"),
        emit(sum_dec).alias("sum_val"),
        (emit(sum_dec) / F.count("*")).cast("double").alias("avg_val"),
    )


@register(
    "q135_order_count_distribution",
    sql="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: distribution of customers by order count — "
        "the double-aggregation pattern (left join preserving "
        "zero-order customers, per-customer count, then a histogram "
        "over the counts).  Scale: the join + first agg share one "
        "hash-by-custkey Exchange (count rides the join's "
        "partitioning); the second agg reduces #customers rows to "
        "#distinct-counts — tiny.  The left join keeps c_count=0 "
        "customers, the detail naive GROUP BY formulations lose.",
    tags=("customer", "orders", "double-agg", "tpch"),
)
def q135(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q136_equi_depth_buckets",
    sql="""
    WITH b AS (
      SELECT quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.50) AS q2,
             quantile_cont(o_totalprice, 0.75) AS q3
      FROM orders
    )
    SELECT CASE WHEN o_totalprice <= b.q1 THEN 0
                WHEN o_totalprice <= b.q2 THEN 1
                WHEN o_totalprice <= b.q3 THEN 2
                ELSE 3 END AS bucket,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS sum_value
    FROM orders, b
    GROUP BY 1
    """,
    doc="Equi-DEPTH (quantile) bucketing: exact quartile boundaries "
        "computed once as a single-row aggregate, broadcast back onto "
        "the fact stream, and applied as a codegen CASE projection — "
        "range-partitioning boundary computation as a query (the "
        "RangePartitioner / Delta OPTIMIZE file-sizing primitive), "
        "complementing q129's equi-WIDTH bins.  The fact table is "
        "never sorted or shuffled for the bucketing itself; the only "
        "Exchange is the 4-row final agg.  Spark `percentile` and "
        "DuckDB quantile_cont share linear-interpolation semantics, "
        "so the boundaries are bit-identical; at 100 TB swap in "
        "approx_percentile (same plan shape, documented trade).  The "
        "1 x N conditionless broadcast of the boundary row is a "
        "degenerate map, not a real cartesian.",
    tags=("orders", "quantile", "bucketing", "profiling"),
)
def q136(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_totalprice")
    b = o.agg(
        F.percentile("o_totalprice", 0.25).alias("q1"),
        F.percentile("o_totalprice", 0.50).alias("q2"),
        F.percentile("o_totalprice", 0.75).alias("q3"),
    )
    v = F.col("o_totalprice")
    bucket = (
        F.when(v <= F.col("q1"), 0)
        .when(v <= F.col("q2"), 1)
        .when(v <= F.col("q3"), 2)
        .otherwise(3)
    )
    return (
        o.crossJoin(F.broadcast(b))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(v.cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("sum_value"),
        )
    )


@register(
    "q137_data_quality_expectations",
    sql="""
    SELECT 'quantity_in_range' AS rule, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN COALESCE(l_quantity BETWEEN 1 AND 50, FALSE)
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_violations,
           CAST(ROUND((SUM(CASE WHEN COALESCE(l_quantity BETWEEN 1 AND 50, FALSE)
                          THEN 0 ELSE 1 END) / COUNT(*)) * 1e6) AS BIGINT) / 1e6 AS violation_rate
    FROM lineitem
    UNION ALL
    SELECT 'discount_in_range', COUNT(*),
           CAST(SUM(CASE WHEN COALESCE(l_discount BETWEEN 0.0 AND 0.1, FALSE)
                         THEN 0 ELSE 1 END) AS BIGINT),
           CAST(ROUND((SUM(CASE WHEN COALESCE(l_discount BETWEEN 0.0 AND 0.1, FALSE)
                          THEN 0 ELSE 1 END) / COUNT(*)) * 1e6) AS BIGINT) / 1e6
    FROM lineitem
    UNION ALL
    SELECT 'tax_non_negative', COUNT(*),
           CAST(SUM(CASE WHEN COALESCE(l_tax >= 0.0, FALSE)
                         THEN 0 ELSE 1 END) AS BIGINT),
           CAST(ROUND((SUM(CASE WHEN COALESCE(l_tax >= 0.0, FALSE)
                          THEN 0 ELSE 1 END) / COUNT(*)) * 1e6) AS BIGINT) / 1e6
    FROM lineitem
    UNION ALL
    SELECT 'shipdate_present', COUNT(*),
           CAST(SUM(CASE WHEN l_shipdate IS NOT NULL
                         THEN 0 ELSE 1 END) AS BIGINT),
           CAST(ROUND((SUM(CASE WHEN l_shipdate IS NOT NULL
                          THEN 0 ELSE 1 END) / COUNT(*)) * 1e6) AS BIGINT) / 1e6
    FROM lineitem
    UNION ALL
    SELECT 'returnflag_valid', COUNT(*),
           CAST(SUM(CASE WHEN COALESCE(l_returnflag IN ('A','N','R'), FALSE)
                         THEN 0 ELSE 1 END) AS BIGINT),
           CAST(ROUND((SUM(CASE WHEN COALESCE(l_returnflag IN ('A','N','R'), FALSE)
                          THEN 0 ELSE 1 END) / COUNT(*)) * 1e6) AS BIGINT) / 1e6
    FROM lineitem
    """,
    doc="Declarative data-quality expectation suite "
        "(relational.quality.expectation_report): five rules over "
        "lineitem evaluated in ONE aggregation pass — every rule is a "
        "CASE sum folding map-side, the single stats row unpivots to "
        "the long report via stack().  The oracle states the naive "
        "one-scan-per-rule UNION ALL; the engine's plan reads the "
        "table once regardless of suite size (plan-tested: 1 scan, "
        "1 single-row Exchange).  Violations are null-hostile "
        "(unevaluable predicate = violated), the Great Expectations "
        "convention, pinned by COALESCE(..., FALSE) on both sides.  "
        "The DLT-expectations primitive every ingest gate needs.",
    tags=("quality", "lineitem", "profiling"),
)
def q137(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .quality import expectation_report

    li = load(spark, sf_dir, "lineitem")
    rules = [
        ("quantity_in_range", F.col("l_quantity").between(1, 50)),
        ("discount_in_range", F.col("l_discount").between(0.0, 0.1)),
        ("tax_non_negative", F.col("l_tax") >= 0.0),
        ("shipdate_present", F.col("l_shipdate").isNotNull()),
        ("returnflag_valid", F.col("l_returnflag").isin("A", "N", "R")),
    ]
    return expectation_report(li, rules)


@register(
    "q139_price_quantity_regression",
    sql="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sy,
             -- first factor DECIMAL(19,4): forces DuckDB's int128 multiply
             -- path (<=18-digit operands overflow int64); values identical
             CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))
                    * CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))
                    * CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))
                    * CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sxy
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag,
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
    doc="Distributed OLS via sufficient statistics "
        "(relational.sketches.linear_fit): extendedprice ~ quantity "
        "per returnflag.  Six map-side-combinable sums in ONE "
        "aggregation pass (#groups-row shuffle), closed-form "
        "slope/intercept/r2 on the tiny result — regression at 100 TB "
        "is a single scan, never an iterative solver, and generalizes "
        "to k features as the X'X normal equations (k^2 sums).  "
        "Second moments sum as exact decimals (the money rule), and "
        "both engines evaluate the IDENTICAL double closed form on "
        "those sums, so the gate hashes match bit-for-bit.",
    tags=("lineitem", "regression", "ml-stats"),
)
def q139(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketches.linear_fit(
        load(spark, sf_dir, "lineitem"),
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
    )


@register(
    "q140_chi_square_contingency",
    sql="""
    WITH cnt AS (
      SELECT event_type, EXTRACT(hour FROM ts) AS hr,
             COUNT(*) AS observed
      FROM events
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, hr, observed,
             CAST(SUM(observed) OVER (PARTITION BY event_type) AS DOUBLE) AS row_t,
             CAST(SUM(observed) OVER (PARTITION BY hr) AS DOUBLE) AS col_t,
             CAST(SUM(observed) OVER () AS DOUBLE) AS n
      FROM cnt
    )
    SELECT event_type,
           CAST(hr AS INT) AS hr,
           observed,
           CAST(ROUND((row_t * col_t / n) * 1e6) AS BIGINT) / 1e6 AS expected,
           CAST(ROUND((POWER(observed - row_t * col_t / n, 2)
                 / (row_t * col_t / n)) * 1e6) AS BIGINT) / 1e6 AS chi2_contrib
    FROM tot
    """,
    doc="Chi-square contingency analysis of event_type x hour-of-day: "
        "observed vs expected-under-independence counts and per-cell "
        "chi-square contributions — the independence-test primitive "
        "behind drift detection and feature screening.  One fact "
        "aggregation to cell grain (#types x 24 rows), then window "
        "sums over the TINY cell frame for the marginals (no second "
        "fact scan, no joins); all marginals are exact integer sums, "
        "and both engines evaluate the identical double closed form "
        "per cell (the q139 discipline), so rounding matches bit-for-"
        "bit.  The total statistic is the sum of chi2_contrib — left "
        "at cell grain because a 120-double sum is engine-order-"
        "sensitive; cells are exact.",
    tags=("events", "ml-stats", "contingency"),
)
def q140(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events")
    cnt = e.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hr")
    ).agg(F.count("*").alias("observed"))
    w_row = Window.partitionBy("event_type")
    w_col = Window.partitionBy("hr")
    w_all = Window.partitionBy()
    tot = cnt.select(
        "event_type",
        "hr",
        "observed",
        # marginals as DOUBLE before the product: a 64-bit integer
        # row_t*col_t wraps at ~1e12-event scale; double*double is
        # IEEE-identical in both engines (totals < 2^53 stay exact)
        F.sum("observed").over(w_row).cast("double").alias("row_t"),
        F.sum("observed").over(w_col).cast("double").alias("col_t"),
        F.sum("observed").over(w_all).cast("double").alias("n"),
    )
    expected = F.col("row_t") * F.col("col_t") / F.col("n")
    return tot.select(
        "event_type",
        "hr",
        "observed",
        pround(expected, 6).alias("expected"),
        pround(F.pow(F.col("observed") - expected, F.lit(2)) / expected, 6).alias("chi2_contrib"),
    )


@register(
    "q141_region_nation_roster",
    sql="""
    SELECT r.r_name,
           COUNT(*) AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS roster
    FROM nation n
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name
    """,
    doc="Deterministic string aggregation (LISTAGG / string_agg "
        "surface): sorted comma-joined nation roster per region — "
        "Spark has no ordered string_agg, so the engine composes "
        "array_sort(collect_list()) + array_join, which is exactly "
        "string_agg(... ORDER BY) and deterministic under ANY "
        "partitioning (the sort happens after collection).  Contract: "
        "roster grain must be bounded (collect_list is per-group "
        "memory) — at scale put a top-N window in front; here the "
        "grain is 5 nations/region.  Broadcast dim join, one "
        "group-grain Exchange.",
    tags=("nation", "region", "string-agg"),
)
def q141(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_nations"),
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "roster"
            ),
        )
    )


@register(
    "q142_spearman_rank_correlation",
    sql="""
    WITH ranked AS (
      SELECT l_returnflag,
             RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
               + (COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1) / 2.0
               AS rx,
             RANK() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
               + (COUNT(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1) / 2.0
               AS ry
      FROM lineitem
    ),
    s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(rx AS DECIMAL(14,1))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ry AS DECIMAL(14,1))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(rx AS DECIMAL(19,1))
                    * CAST(rx AS DECIMAL(14,1))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ry AS DECIMAL(19,1))
                    * CAST(ry AS DECIMAL(14,1))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(rx AS DECIMAL(19,1))
                    * CAST(ry AS DECIMAL(14,1))) AS DOUBLE) AS sxy
      FROM ranked
      GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           CAST(ROUND((CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0 THEN
                 (n * sxy - sx * sy)
                 / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)) END) * 1e6) AS BIGINT) / 1e6
             AS spearman_rho
    FROM s
    """,
    doc="Spearman rank correlation of quantity vs extendedprice per "
        "returnflag: fractional average ranks for ties (RANK + "
        "(tie_count-1)/2 — deterministic, engine-identical), then the "
        "q139 sufficient-statistics Pearson closed form over the "
        "ranks.  Ranks sum as exact decimals (halves have exact "
        "decimal scale 1), and both engines evaluate the identical "
        "double formula, so the nonparametric statistic hash-matches "
        "exactly.  Scale shape (r10): ranks are functions of "
        "(flag, value), so they compute on the distinct-VALUE grain "
        "(partial-aggregated counts + a cumulative sum over the tiny "
        "per-flag value lists) and join back — the fact is never "
        "sorted or shuffled at row grain, removing the 3-partition "
        "straggler sorts the row-grain rank windows forced.",
    tags=("lineitem", "ml-stats", "rank"),
)
def q142(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem")
    g = "l_returnflag"

    # r10 opt (guide §2.3/§2.5): the average rank is a function of
    # (flag, value) alone, so compute it on the DISTINCT-VALUE grain
    # and join it back, instead of 4 row-grain sort windows partitioned
    # by a 3-value key (3 straggler tasks each sorting a third of the
    # fact — at 100 TB, a third of the table per task).  RANK() of a
    # row with value v is 1 + (#rows with smaller v), i.e.
    # running_cnt - cnt + 1 over the value-grain counts; the tie term
    # (cnt-1)/2.0 is identical.  Integer arithmetic + one double half —
    # bit-identical to the window formulation.  The value-grain frames
    # are partial-aggregated before their (tiny) shuffles and the fact
    # is never exchanged: both rank tables broadcast when they fit
    # (3x~50 rows for quantity; distinct prices otherwise SMJ at scale).
    def rank_table(col: str, out: str) -> DataFrame:
        w = Window.partitionBy(g).orderBy(col)
        return (
            li.groupBy(g, col)
            .agg(F.count(F.lit(1)).alias("_c"))
            .select(
                g,
                col,
                (
                    (F.sum("_c").over(w) - F.col("_c") + F.lit(1))
                    + (F.col("_c") - 1) / 2.0
                ).alias(out),
            )
        )

    ranked = (
        li.select(g, "l_quantity", "l_extendedprice")
        .join(rank_table("l_quantity", "rx"), [g, "l_quantity"])
        .join(rank_table("l_extendedprice", "ry"), [g, "l_extendedprice"])
        .select(g, "rx", "ry")
    )
    xd = F.col("rx").cast("decimal(14,1)")
    yd = F.col("ry").cast("decimal(14,1)")
    s = ranked.groupBy(g).agg(
        F.count("*").cast("double").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(yd * yd).cast("double").alias("syy"),
        F.sum(xd * yd).cast("double").alias("sxy"),
    )
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        g,
        F.col("n").cast("long").alias("n"),
        # an all-tied group zeroes a rank variance: NULL rho, not an
        # ANSI division error (the round-6 guard rule)
        pround(F.when(var_x * var_y > 0, cov_n / F.sqrt(var_x * var_y)), 6).alias("spearman_rho"),
    )


@register(
    "q143_join_key_skew_report",
    sql="""
    WITH cnt AS (
      SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c, user_id) AS i FROM cnt
    ),
    s AS (
      SELECT COUNT(*) AS n_keys,
             CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(MAX(c) AS BIGINT) AS max_cnt,
             CAST(SUM(CAST(i AS DECIMAL(19,0)) * CAST(c AS DECIMAL(12,0)))
                  AS DOUBLE) AS weighted
      FROM ranked
    )
    SELECT 'user_id' AS key_col,
           n_keys, n_rows, max_cnt,
           CAST(ROUND((CAST(max_cnt AS DOUBLE) / n_rows) * 1e6) AS BIGINT) / 1e6 AS top1_share,
           CAST(ROUND((2.0 * weighted / (CAST(n_keys AS DOUBLE) * n_rows)
                 - (n_keys + 1.0) / n_keys) * 1e6) AS BIGINT) / 1e6 AS gini
    FROM s
    -- weighted sums as exact DECIMAL (int64 wraps at billions of keys;
    -- DuckDB's DECIMAL(19,0) factor forces the int128 multiply path)
    """,
    doc="Join-key skew report for events.user_id: key cardinality, "
        "hottest-key share, and the exact Gini coefficient of the key "
        "distribution (0 = uniform, ->1 = one key owns the table) — "
        "the diagnostic that DECIDES q112's salting and AQE skew "
        "thresholds before a 100 TB join is launched.  One fact "
        "aggregation to key grain, then rank/sum arithmetic on the "
        "tiny counts frame; the rank-weighted sum is order-"
        "deterministic under count ties (equal c contribute equally "
        "for any tie order, keys break residual ties) and sums as an "
        "exact DECIMAL (int64 wraps at billion-key grain), with the "
        "Gini closed form evaluated identically as "
        "doubles in both engines.  At extreme key cardinality the "
        "counts frame itself is sampled or bucketed first — the "
        "report grain is #keys, never #rows.",
    tags=("events", "skew", "profiling", "diagnostics"),
)
def q143(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events")
    cnt = e.groupBy("user_id").agg(F.count("*").alias("c"))
    ranked = cnt.select(
        "c",
        F.row_number().over(Window.orderBy("c", "user_id")).alias("i"),
    )
    s = ranked.agg(
        F.count("*").alias("n_keys"),
        F.sum("c").cast("long").alias("n_rows"),
        F.max("c").cast("long").alias("max_cnt"),
        # decimal-exact rank-weighted sum: i*c summed as int64 wraps
        # once n_keys x n_rows nears 2^63 (exactly the skew scale this
        # diagnostic exists for); decimal keeps it exact to 38 digits
        F.sum(
            F.col("i").cast("decimal(19,0)") * F.col("c").cast("decimal(12,0)")
        ).cast("double").alias("weighted"),
    )
    return s.select(
        F.lit("user_id").alias("key_col"),
        "n_keys",
        "n_rows",
        "max_cnt",
        pround(F.col("max_cnt").cast("double") / F.col("n_rows"), 6).alias(
            "top1_share"
        ),
        pround(F.lit(2.0) * F.col("weighted")
            / (F.col("n_keys").cast("double") * F.col("n_rows"))
            - (F.col("n_keys") + F.lit(1.0)) / F.col("n_keys"), 6).alias("gini"),
    )
