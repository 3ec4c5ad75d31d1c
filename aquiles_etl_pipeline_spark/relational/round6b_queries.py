"""Round-6b catalog entries (q248+): experimentation, time-series
mining, information theory, and IR/LLM-data fills no earlier entry
covers — CUPED variance reduction, calendar-aligned autocorrelation,
mutual-information cell grids, SAX symbol runs, reciprocal-rank
fusion, per-group Gini, seasonal-naive anomaly flags, and word2vec
subsampling probabilities.

Shared numeric discipline (the q78 pattern): all corpus statistics
accumulate as EXACT integers — cents via ``round(x*100)`` pinned to
BIGINT, squared/cross products through DECIMAL(19,0) operands so the
product width (36) stays inside both engines' DECIMAL(38) — and the
single conversion to double happens at the final expression, written
with the identical operation tree in the Spark code and the DuckDB
oracle so every IEEE operation rounds identically.  Where a power is
needed (f^0.75), it is decomposed into ``sqrt(f)*sqrt(sqrt(f))``:
IEEE-754 requires sqrt to be correctly rounded, so the composition is
bit-identical across engines, unlike libm ``pow``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .catalog import load, register, pround

# decimal(19,0), NOT (18,0): DuckDB computes a DECIMAL(18)xDECIMAL(18)
# product in int64 and raises Out of Range once the product passes
# 1e18 (q249 hit it at sf0.1: daily revenue ~1.6e9 cents squared);
# width 19 forces int128 there, while Spark caps 19+19+1 -> 38 with
# scale 0 — exact in both engines at any aggregate scale
_D18 = "decimal(19,0)"
_D38 = "decimal(38,0)"


def _cents(col: str) -> F.Column:
    """NULL-safe exact cents of a double money column."""
    return F.round(F.coalesce(F.col(col), F.lit(0.0)) * 100).cast("bigint")


# ---------------------------------------------------------------------------
# q248: CUPED variance-reduced experiment readout
# ---------------------------------------------------------------------------

@register(
    "q248_cuped_adjustment",
    sql="""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                           THEN CAST(round(coalesce(value, 0) * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS pre_c,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                           THEN CAST(round(coalesce(value, 0) * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS post_c
      FROM events GROUP BY 1
    ),
    v AS (
      SELECT user_id % 2 AS variant,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(pre_c) AS BIGINT) AS vpre_c,
             CAST(SUM(post_c) AS BIGINT) AS vpost_c,
             CAST(SUM(CAST(CAST(pre_c AS DECIMAL(19,0))
                           * CAST(pre_c AS DECIMAL(19,0))
                           AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS vxx,
             CAST(SUM(CAST(CAST(pre_c AS DECIMAL(19,0))
                           * CAST(post_c AS DECIMAL(19,0))
                           AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS vxy
      FROM per_user GROUP BY 1
    ),
    m AS (
      SELECT variant, n_users,
             CAST(vpre_c AS DOUBLE) AS spre,
             CAST(vpost_c AS DOUBLE) AS spost,
             CAST(CAST(SUM(n_users) OVER () AS BIGINT) AS DOUBLE) AS n,
             CAST(CAST(SUM(vpre_c) OVER () AS BIGINT) AS DOUBLE) AS sx,
             CAST(CAST(SUM(vpost_c) OVER () AS BIGINT) AS DOUBLE) AS sy,
             CAST(CAST(SUM(vxx) OVER () AS DECIMAL(38,0)) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(vxy) OVER () AS DECIMAL(38,0)) AS DOUBLE) AS sxy
      FROM v
    )
    SELECT variant, n_users,
           CAST(round((spost / CAST(n_users AS DOUBLE) / 100) * 1e6) AS BIGINT) / 1e6 AS mean_post,
           CAST(round((CASE WHEN n * sxx - sx * sx > 0 THEN
                 (spost / CAST(n_users AS DOUBLE)
                  - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                    * (spre / CAST(n_users AS DOUBLE) - sx / n)) / 100 END) * 1e6) AS BIGINT) / 1e6 AS mean_cuped,
           CAST(round((CASE WHEN n * sxx - sx * sx > 0 THEN
                 (n * sxy - sx * sy) / (n * sxx - sx * sx) END) * 1e6) AS BIGINT) / 1e6 AS theta
    FROM m
    """,
    doc="CUPED variance-reduced A/B readout (Deng et al., WSDM'13): "
        "users split into two variants by user_id parity, the first "
        "half of the event horizon is the pre-experiment covariate and "
        "the second half the treatment metric; theta = cov(pre, post) "
        "/ var(pre) is fit on the pooled population and each variant's "
        "post-period mean is adjusted by theta * (pre_mean_v - "
        "pre_grand_mean).  All moments accumulate as exact integers "
        "(cents in BIGINT, cross-products through DECIMAL(19,0) "
        "operands so the 36-digit product stays exact in both "
        "engines); theta and the adjusted means are single double "
        "expressions over those exact sums, written with the identical "
        "operation tree in both engines.  Physical shape: one "
        "user-grain shuffle (the only fact-sized exchange), a 2-row "
        "variant rollup that carries the per-variant MOMENTS, and the "
        "pooled moments as unpartitioned window sums over that 2-row "
        "frame — ZERO joins, one fact scan (moments of a union are "
        "sums of exact per-part moments, so no second pooled pass is "
        "ever needed).",
    tags=("experimentation", "events", "agg", "stats"),
)
def q248(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    cents = _cents("value")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, cents).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("pre_c"),
        F.sum(F.when(F.col("ts") >= cut, cents).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("post_c"),
    )
    pre_d = F.col("pre_c").cast(_D18)
    v = per_user.groupBy(F.expr("user_id % 2").alias("variant")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("pre_c").cast("bigint").alias("vpre_c"),
        F.sum("post_c").cast("bigint").alias("vpost_c"),
        F.sum((pre_d * F.col("pre_c").cast(_D18)).cast(_D38))
        .cast(_D38)
        .alias("vxx"),
        F.sum((pre_d * F.col("post_c").cast(_D18)).cast(_D38))
        .cast(_D38)
        .alias("vxy"),
    )
    w = Window.partitionBy()
    m = v.select(
        "variant",
        "n_users",
        F.col("vpre_c").cast("double").alias("spre"),
        F.col("vpost_c").cast("double").alias("spost"),
        F.sum("n_users").over(w).cast("bigint").cast("double").alias("n"),
        F.sum("vpre_c").over(w).cast("bigint").cast("double").alias("sx"),
        F.sum("vpost_c").over(w).cast("bigint").cast("double").alias("sy"),
        F.sum("vxx").over(w).cast(_D38).cast("double").alias("sxx"),
        F.sum("vxy").over(w).cast(_D38).cast("double").alias("sxy"),
    )
    n_d = F.col("n_users").cast("double")
    # pre-variance can be exactly zero on degenerate input (every user
    # identical pre-period); ANSI Spark errors on the division where
    # DuckDB would emit inf — the guard makes both emit NULL
    var_pre = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    theta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / var_pre
    return m.select(
        "variant",
        "n_users",
        pround(F.col("spost") / n_d / 100, 6).alias("mean_post"),
        pround(F.when(
                var_pre > 0,
                (
                    F.col("spost") / n_d
                    - theta * (F.col("spre") / n_d - F.col("sx") / F.col("n"))
                )
                / 100,
            ), 6).alias("mean_cuped"),
        pround(F.when(var_pre > 0, theta), 6).alias("theta"),
    )


# ---------------------------------------------------------------------------
# q249: calendar-aligned autocorrelation of the daily revenue series
# ---------------------------------------------------------------------------

@register(
    "q249_acf_daily_revenue",
    sql="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(round(coalesce(o_totalprice, 0) * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT g.k AS lag_k, a.rev_c AS x, b.rev_c AS y
      FROM daily a
      CROSS JOIN UNNEST(generate_series(1, 7)) AS g(k)
      JOIN daily b ON b.day = a.day - CAST(g.k AS INTEGER)
    ),
    s AS (
      SELECT lag_k,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) AS sx,
             CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(CAST(x AS DECIMAL(19,0))
                                * CAST(x AS DECIMAL(19,0))
                                AS DECIMAL(38,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(CAST(y AS DECIMAL(19,0))
                                * CAST(y AS DECIMAL(19,0))
                                AS DECIMAL(38,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS syy,
             CAST(CAST(SUM(CAST(CAST(x AS DECIMAL(19,0))
                                * CAST(y AS DECIMAL(19,0))
                                AS DECIMAL(38,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS sxy,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM pairs GROUP BY 1
    )
    SELECT CAST(lag_k AS BIGINT) AS lag_k, n_pairs,
           CAST(round((CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0 THEN
                 (n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) END) * 1e6) AS BIGINT) / 1e6 AS acf
    FROM s
    """,
    doc="Autocorrelation of the daily order-revenue series at lags "
        "1..7, computed as the per-lag Pearson correlation of "
        "CALENDAR-aligned pairs: lagged values come from an equi-join "
        "on day = day - k, not a row-offset window, so missing days "
        "cannot silently shift the alignment (the classic lag-window "
        "bug on sparse series).  Revenue accumulates as exact cents; "
        "the five moments per lag go through DECIMAL(19,0) products "
        "(width 36, exact in both engines) and r is one double "
        "expression with IEEE sqrt.  Physical shape: the fact scan "
        "collapses to day grain FIRST (the only fact-sized shuffle); "
        "the seven lagged values then come from RANGE windows over "
        "the integer day number (RANGE BETWEEN k PRECEDING AND k "
        "PRECEDING is exactly 'the value at day-k, if present'), so "
        "the Spark plan is ONE scan, one shuffle, one calendar-"
        "bounded sort, zero joins — the oracle keeps the naive "
        "self-join formulation, which is value-identical.",
    tags=("timeseries", "orders", "stats"),
)
def q249(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day"))
        .agg(F.sum(_cents("o_totalprice")).cast("bigint").alias("rev_c"))
        .withColumn("day_num", F.expr("datediff(day, DATE '1970-01-01')"))
    )
    lag_cols = [
        F.max("rev_c")
        .over(Window.orderBy("day_num").rangeBetween(-k, -k))
        .alias(f"y{k}")
        for k in range(1, 8)
    ]
    wide = daily.select(F.col("rev_c").alias("x"), *lag_cols)
    stack_expr = "stack(7, " + ", ".join(
        f"{k}L, y{k}" for k in range(1, 8)
    ) + ") AS (lag_k, y)"
    pairs = wide.select("x", F.expr(stack_expr)).where(F.col("y").isNotNull())
    xd, yd = F.col("x").cast(_D18), F.col("y").cast(_D18)
    s = pairs.groupBy("lag_k").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("bigint").cast("double").alias("sx"),
        F.sum("y").cast("bigint").cast("double").alias("sy"),
        F.sum((xd * xd).cast(_D38)).cast(_D38).cast("double").alias("sxx"),
        F.sum((yd * yd).cast(_D38)).cast(_D38).cast("double").alias("syy"),
        F.sum((xd * yd).cast(_D38)).cast(_D38).cast("double").alias("sxy"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    # a constant series makes a variance leg exactly zero — NULL, not
    # an ANSI division error (DuckDB would emit inf/nan)
    var_prod = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) * (
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    )
    return s.select(
        F.col("lag_k").cast("bigint").alias("lag_k"),
        "n_pairs",
        pround(F.when(
                var_prod > 0,
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / F.sqrt(var_prod),
            ), 6).alias("acf"),
    )


# ---------------------------------------------------------------------------
# q250: mutual-information cell grid (segment x order priority)
# ---------------------------------------------------------------------------

@register(
    "q250_segment_priority_mi",
    sql="""
    WITH cells AS (
      SELECT c_mktsegment AS segment, o_orderpriority AS priority,
             CAST(COUNT(*) AS BIGINT) AS n_xy
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ),
    m AS (
      SELECT segment, priority, n_xy,
             CAST(SUM(n_xy) OVER () AS BIGINT) AS n_tot,
             CAST(SUM(n_xy) OVER (PARTITION BY segment) AS BIGINT) AS n_x,
             CAST(SUM(n_xy) OVER (PARTITION BY priority) AS BIGINT) AS n_y
      FROM cells
    )
    SELECT segment, priority, n_xy,
           CAST(round((CAST(n_xy AS DOUBLE) / CAST(n_tot AS DOUBLE)) * 1e9) AS BIGINT) / 1e9 AS p_xy,
           CAST(round((ln(CAST(n_xy AS DOUBLE) * CAST(n_tot AS DOUBLE)
                    / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)))) * 1e6) AS BIGINT) / 1e6 AS pmi,
           CAST(round((CAST(n_xy AS DOUBLE) / CAST(n_tot AS DOUBLE)
                 * ln(CAST(n_xy AS DOUBLE) * CAST(n_tot AS DOUBLE)
                      / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)))) * 1e9) AS BIGINT) / 1e9 AS mi_contrib
    FROM m
    """,
    doc="Mutual-information cell grid between customer market segment "
        "and order priority: per (segment, priority) cell the joint "
        "count, joint probability, pointwise mutual information, and "
        "the cell's additive MI contribution p*ln(p/(px*py)).  "
        "Emitting the CELL GRID rather than the summed scalar is the "
        "cross-engine determinism move — each cell's value derives "
        "from exact integer counts via one double expression (the ln "
        "parity q163/q226 established), with no order-dependent "
        "double summation anywhere.  Physical shape: one custkey "
        "shuffle join (both sides fact-sized at 100 TB — no broadcast "
        "pretence), one 25-cell rollup, marginals via windows over "
        "the CELL frame (25 rows), not the facts.",
    tags=("stats", "orders", "customer", "profiling"),
)
def q250(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_xy"))
    )
    w_all = Window.partitionBy()
    m = cells.select(
        "segment",
        "priority",
        "n_xy",
        F.sum("n_xy").over(w_all).cast("bigint").alias("n_tot"),
        F.sum("n_xy").over(Window.partitionBy("segment")).cast("bigint").alias("n_x"),
        F.sum("n_xy").over(Window.partitionBy("priority")).cast("bigint").alias("n_y"),
    )
    nd = F.col("n_xy").cast("double")
    td = F.col("n_tot").cast("double")
    ratio = nd * td / (F.col("n_x").cast("double") * F.col("n_y").cast("double"))
    return m.select(
        "segment",
        "priority",
        "n_xy",
        pround(nd / td, 9).alias("p_xy"),
        pround(F.log(ratio), 6).alias("pmi"),
        pround(nd / td * F.log(ratio), 9).alias("mi_contrib"),
    )


# ---------------------------------------------------------------------------
# q251: SAX symbol runs over the daily revenue series
# ---------------------------------------------------------------------------

@register(
    "q251_sax_symbol_runs",
    sql="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(round(coalesce(o_totalprice, 0) * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    ),
    sym AS (
      SELECT day, rev_c,
             NTILE(4) OVER (ORDER BY rev_c, day) AS symbol
      FROM daily
    ),
    grp AS (
      SELECT day, rev_c, symbol,
             ROW_NUMBER() OVER (ORDER BY day)
             - ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY day) AS island
      FROM sym
    )
    SELECT CAST(symbol AS BIGINT) AS symbol,
           CAST(MIN(day) AS VARCHAR) AS start_day,
           CAST(MAX(day) AS VARCHAR) AS end_day,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(round((CAST(CAST(SUM(rev_c) AS BIGINT) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) / 100) * 1e6) AS BIGINT) / 1e6 AS avg_rev
    FROM grp GROUP BY symbol, island
    """,
    doc="SAX-style symbolization of the daily revenue series (Lin et "
        "al., DMKD'07, with equi-depth rather than Gaussian "
        "breakpoints): each day maps to a 4-letter alphabet symbol by "
        "revenue quartile (NTILE over (rev_c, day) — the day tiebreak "
        "makes the equi-depth assignment total-order deterministic in "
        "both engines), then consecutive same-symbol days collapse to "
        "runs via gaps-and-islands (difference of two ROW_NUMBERs).  "
        "Output is the run-length-encoded series: symbol, span, "
        "length, mean revenue.  Physical shape: the fact scan "
        "collapses to day grain first; every window runs over the "
        "calendar-bounded day frame (~2.4k rows/decade), so the "
        "global sorts are dimension-sized, never fact-sized.",
    tags=("timeseries", "orders", "mining"),
)
def q251(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day"))
        .agg(F.sum(_cents("o_totalprice")).cast("bigint").alias("rev_c"))
    )
    sym = daily.select(
        "day",
        "rev_c",
        F.ntile(4).over(Window.orderBy("rev_c", "day")).alias("symbol"),
    )
    grp = sym.select(
        "day",
        "rev_c",
        "symbol",
        (
            F.row_number().over(Window.orderBy("day"))
            - F.row_number().over(Window.partitionBy("symbol").orderBy("day"))
        ).alias("island"),
    )
    return (
        grp.groupBy("symbol", "island")
        .agg(
            F.min("day").cast("string").alias("start_day"),
            F.max("day").cast("string").alias("end_day"),
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            pround(F.sum("rev_c").cast("bigint").cast("double")
                / F.count(F.lit(1)).cast("double")
                / 100, 6).alias("avg_rev"),
        )
        .select(
            F.col("symbol").cast("bigint").alias("symbol"),
            "start_day",
            "end_day",
            "n_days",
            "avg_rev",
        )
    )


# ---------------------------------------------------------------------------
# q252: reciprocal-rank fusion of two part rankings
# ---------------------------------------------------------------------------

@register(
    "q252_rrf_part_fusion",
    sql="""
    WITH per_part AS (
      SELECT l_partkey,
             CAST(SUM(CAST(round(coalesce(l_extendedprice, 0) * 100) AS BIGINT))
                  AS BIGINT) AS rev_c,
             CAST(SUM(CAST(round(coalesce(l_quantity, 0)) AS BIGINT))
                  AS BIGINT) AS qty
      FROM lineitem GROUP BY 1
    ),
    ranked AS (
      SELECT l_partkey, rev_c, qty,
             ROW_NUMBER() OVER (ORDER BY rev_c DESC, l_partkey) AS r_rev,
             ROW_NUMBER() OVER (ORDER BY qty DESC, l_partkey) AS r_qty
      FROM per_part
    )
    SELECT l_partkey AS partkey, rev_c, qty,
           CAST(r_rev AS BIGINT) AS r_rev,
           CAST(r_qty AS BIGINT) AS r_qty,
           CAST(round((1.0 / CAST(60 + r_rev AS DOUBLE)
                 + 1.0 / CAST(60 + r_qty AS DOUBLE)) * 1e9) AS BIGINT) / 1e9 AS rrf
    FROM ranked
    WHERE r_rev <= 100 OR r_qty <= 100
    """,
    doc="Reciprocal-rank fusion (Cormack et al., SIGIR'09) of two "
        "part rankings — by revenue and by shipped quantity: each "
        "part in either top-100 gets rrf = 1/(60+r_rev) + "
        "1/(60+r_qty) from its GLOBAL ranks (partkey tiebreak makes "
        "both row_numbers deterministic).  The canonical multi-signal "
        "retrieval merge, applied to catalog ranking.  Physical "
        "shape: ONE part-grain aggregation computes both metrics in a "
        "single fact shuffle; the two rank windows then run at "
        "CATALOG grain, not fact grain.  At 100 TB the global sort "
        "would move to the two-phase exact variant (partition-local "
        "top-k, then re-rank candidates against per-partition "
        "better-than counts); at catalog grain the single sort is "
        "honest and the candidate filter keeps the output bounded.",
    tags=("relational", "lineitem", "ranking", "search"),
)
def q252(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_part = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(_cents("l_extendedprice")).cast("bigint").alias("rev_c"),
            F.sum(F.round(F.coalesce(F.col("l_quantity"), F.lit(0.0))).cast("bigint"))
            .cast("bigint")
            .alias("qty"),
        )
    )
    ranked = per_part.select(
        "l_partkey",
        "rev_c",
        "qty",
        F.row_number()
        .over(Window.orderBy(F.col("rev_c").desc(), "l_partkey"))
        .alias("r_rev"),
        F.row_number()
        .over(Window.orderBy(F.col("qty").desc(), "l_partkey"))
        .alias("r_qty"),
    )
    return ranked.where((F.col("r_rev") <= 100) | (F.col("r_qty") <= 100)).select(
        F.col("l_partkey").alias("partkey"),
        "rev_c",
        "qty",
        F.col("r_rev").cast("bigint").alias("r_rev"),
        F.col("r_qty").cast("bigint").alias("r_qty"),
        pround(F.lit(1.0) / (F.lit(60) + F.col("r_rev")).cast("double")
            + F.lit(1.0) / (F.lit(60) + F.col("r_qty")).cast("double"), 9).alias("rrf"),
    )


# ---------------------------------------------------------------------------
# q253: per-nation Gini coefficient of customer balances
# ---------------------------------------------------------------------------

@register(
    "q253_gini_acctbal_by_nation",
    sql="""
    WITH c AS (
      SELECT c_nationkey, c_custkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
      FROM customer WHERE c_acctbal >= 0
    ),
    r AS (
      SELECT c_nationkey, bal_c,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY bal_c, c_custkey) AS i
      FROM c
    ),
    g AS (
      SELECT c_nationkey,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(CAST(SUM(bal_c) AS BIGINT) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(CAST(i AS DECIMAL(19,0))
                                * CAST(bal_c AS DECIMAL(19,0))
                                AS DECIMAL(38,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS six,
             CAST(COUNT(*) AS DOUBLE) AS nd
      FROM r GROUP BY 1
    )
    SELECT n_name AS nation, n_customers,
           CAST(round((CASE WHEN sx > 0
                 THEN (2 * six - (nd + 1) * sx) / (nd * sx) END) * 1e6) AS BIGINT) / 1e6 AS gini
    FROM g JOIN nation ON c_nationkey = n_nationkey
    """,
    doc="Per-nation Gini coefficient of non-negative customer account "
        "balances via the exact rank formula G = (2*sum(i*x_i) - "
        "(n+1)*sum(x)) / (n*sum(x)) over the ascending-sorted "
        "balances (custkey tiebreak -> deterministic ranks).  The "
        "inequality metric every marketplace health dashboard "
        "carries.  Rank-value products go through DECIMAL(19,0) "
        "operands (exact in both engines); the Gini is one double "
        "expression, NULL when a nation's balances sum to zero.  "
        "Physical shape: one nationkey-partitioned sort window (the "
        "only fact-sized exchange — per-nation, never global), a "
        "nation-grain rollup, and a broadcast join to the 25-row "
        "nation dim.",
    tags=("stats", "customer", "nation", "agg"),
)
def q253(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") >= 0)
        .select(
            "c_nationkey",
            "c_custkey",
            F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_c"),
        )
    )
    r = c.select(
        "c_nationkey",
        "bal_c",
        F.row_number()
        .over(Window.partitionBy("c_nationkey").orderBy("bal_c", "c_custkey"))
        .alias("i"),
    )
    g = r.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("bal_c").cast("bigint").cast("double").alias("sx"),
        F.sum((F.col("i").cast(_D18) * F.col("bal_c").cast(_D18)).cast(_D38))
        .cast(_D38)
        .cast("double")
        .alias("six"),
        F.count(F.lit(1)).cast("double").alias("nd"),
    )
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        g.join(F.broadcast(nation), g["c_nationkey"] == nation["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            "n_customers",
            pround(F.when(
                    F.col("sx") > 0,
                    (2 * F.col("six") - (F.col("nd") + 1) * F.col("sx"))
                    / (F.col("nd") * F.col("sx")),
                ), 6).alias("gini"),
        )
    )


# ---------------------------------------------------------------------------
# q254: seasonal-naive (week-over-week) residual anomalies
# ---------------------------------------------------------------------------

@register(
    "q254_weekly_seasonal_anomalies",
    sql="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(round(coalesce(value, 0) * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM events GROUP BY 1
    ),
    resid AS (
      SELECT a.day, a.rev_c, a.rev_c - b.rev_c AS resid_c
      FROM daily a JOIN daily b ON b.day = a.day - 7
    ),
    s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(resid_c) AS BIGINT) AS DOUBLE) AS s1,
             CAST(CAST(SUM(CAST(CAST(resid_c AS DECIMAL(19,0))
                                * CAST(resid_c AS DECIMAL(19,0))
                                AS DECIMAL(38,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS s2
      FROM resid
    )
    SELECT CAST(day AS VARCHAR) AS day, rev_c, resid_c,
           CAST(round((CASE WHEN n > 1 THEN
                 2.0 * sqrt((s2 - s1 * s1 / n) / (n - 1.0)) END) * 1e6) AS BIGINT) / 1e6 AS threshold_c,
           CASE WHEN n > 1 THEN
                CAST(abs(CAST(resid_c AS DOUBLE))
                     > 2.0 * sqrt((s2 - s1 * s1 / n) / (n - 1.0))
                     AS BOOLEAN) END AS is_anomaly
    FROM resid CROSS JOIN s
    """,
    doc="Seasonal-naive anomaly flags on the daily event-revenue "
        "series: the forecast for day d is day d-7 (calendar-aligned "
        "equi-join, robust to missing days), the residual is exact "
        "integer cents, and a day is anomalous when |residual| "
        "exceeds 2 sample standard deviations of the residual "
        "population — the week-over-week health check that catches "
        "what a plain z-score misses on weekly-seasonal traffic.  "
        "Variance assembles from exact sums (q78's discipline).  "
        "Physical: one day-grain rollup of the facts, the lag-7 value "
        "from a RANGE window on the integer day number, and the "
        "population moments as unpartitioned window sums over the "
        "calendar-bounded residual frame — ONE scan, zero joins (the "
        "oracle keeps the value-identical naive join formulation).",
    tags=("timeseries", "events", "anomaly"),
)
def q254(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).cast("date").alias("day"))
        .agg(F.sum(_cents("value")).cast("bigint").alias("rev_c"))
        .withColumn("day_num", F.expr("datediff(day, DATE '1970-01-01')"))
    )
    brev = F.max("rev_c").over(Window.orderBy("day_num").rangeBetween(-7, -7))
    resid = (
        daily.select("day", "rev_c", brev.alias("brev"))
        .where(F.col("brev").isNotNull())
        .select("day", "rev_c", (F.col("rev_c") - F.col("brev")).alias("resid_c"))
    )
    rd = F.col("resid_c").cast(_D18)
    w = Window.partitionBy()
    stats = resid.select(
        "day",
        "rev_c",
        "resid_c",
        F.count(F.lit(1)).over(w).cast("double").alias("n"),
        F.sum("resid_c").over(w).cast("bigint").cast("double").alias("s1"),
        F.sum((rd * rd).cast(_D38)).over(w).cast(_D38).cast("double").alias("s2"),
    )
    # a single residual row makes n-1 zero — NULL, not an ANSI error
    thr = F.when(
        F.col("n") > 1,
        F.lit(2.0)
        * F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - F.lit(1.0))
        ),
    )
    return stats.select(
        F.col("day").cast("string").alias("day"),
        "rev_c",
        "resid_c",
        pround(thr, 6).alias("threshold_c"),
        (F.abs(F.col("resid_c").cast("double")) > thr).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# q255: word2vec subsampling keep-probabilities + negative-sampling mass
# ---------------------------------------------------------------------------

@register(
    "q255_subsample_keep_probs",
    sql="""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ),
    freq AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS f
      FROM tok WHERE tok <> '' GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(f) AS BIGINT) AS total FROM freq)
    SELECT tok, f,
           CAST(round((CAST(f AS DOUBLE) / CAST(total AS DOUBLE)) * 1e9) AS BIGINT) / 1e9 AS p,
           CAST(round((CASE
             WHEN CAST(f AS DOUBLE) / CAST(total AS DOUBLE) > 0.0001
             THEN (sqrt(CAST(f AS DOUBLE) / CAST(total AS DOUBLE) / 0.0001)
                   + 1.0)
                  * (0.0001 / (CAST(f AS DOUBLE) / CAST(total AS DOUBLE)))
             ELSE 1.0 END) * 1e9) AS BIGINT) / 1e9 AS keep_prob,
           CAST(round((sqrt(CAST(f AS DOUBLE))
                 * sqrt(sqrt(CAST(f AS DOUBLE)))) * 1e6) AS BIGINT) / 1e6 AS neg_mass
    FROM freq CROSS JOIN tot
    """,
    doc="word2vec corpus-frequency table (Mikolov et al., NIPS'13): "
        "per token its count, relative frequency, the subsampling "
        "keep-probability (sqrt(p/t)+1)*(t/p) with t = 1e-4 (capped "
        "at 1 for rare tokens), and the unnormalized negative-"
        "sampling mass f^0.75 — decomposed as sqrt(f)*sqrt(sqrt(f)) "
        "because IEEE-754 sqrt is correctly rounded while libm pow is "
        "not, making the value bit-identical across engines.  The "
        "normalizing sum of f^0.75 is deliberately NOT emitted: it "
        "would be an order-dependent double summation (the one thing "
        "the numeric discipline forbids); consumers divide by their "
        "own reduction.  Physical: fan-out before the interpreted "
        "split/explode (the one-file-corpus lesson), one token-grain "
        "count (vocab-bounded output by Zipf), corpus total joins as "
        "a broadcast single-row aggregate (q42's shape).",
    tags=("text", "documents", "llmdata", "tokenizer"),
)
def q255(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..partitioning import fan_out

    docs = fan_out(load(spark, sf_dir, "documents"))
    freq = (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok")
        )
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    tot = freq.agg(F.sum("f").cast("bigint").alias("total"))
    fd = F.col("f").cast("double")
    p = fd / F.col("total").cast("double")
    return freq.crossJoin(F.broadcast(tot)).select(
        "tok",
        "f",
        pround(p, 9).alias("p"),
        pround(F.when(
                p > 0.0001,
                (F.sqrt(p / F.lit(0.0001)) + F.lit(1.0)) * (F.lit(0.0001) / p),
            ).otherwise(F.lit(1.0)), 9).alias("keep_prob"),
        pround(F.sqrt(fd) * F.sqrt(F.sqrt(fd)), 6).alias("neg_mass"),
    )


# ---------------------------------------------------------------------------
# q256: per-user inter-arrival burstiness (CV of event gaps)
# ---------------------------------------------------------------------------

@register(
    "q256_interarrival_burstiness",
    sql="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    s AS (
      SELECT user_id,
             CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
             CAST(SUM(gap_us) AS BIGINT) AS s1,
             CAST(SUM(CAST(gap_us AS HUGEINT) * gap_us)
                  AS DECIMAL(38,0)) AS s2
      FROM g WHERE gap_us IS NOT NULL GROUP BY 1
    )
    SELECT user_id, n_gaps,
           CAST(CAST(round(CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                     AS BIGINT) AS DOUBLE) / 1e6 AS mean_gap_s,
           CAST(round((CASE WHEN n_gaps > 1 AND s1 > 0 THEN
                 sqrt((CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                         / CAST(n_gaps AS DOUBLE))
                      / (CAST(n_gaps AS DOUBLE) - 1.0))
                 / (CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE)) END) * 1e6) AS BIGINT) / 1e6 AS cv
    FROM s
    """,
    doc="Per-user inter-arrival burstiness: the coefficient of "
        "variation of the gaps between a user's consecutive events "
        "(CV 1 = Poisson baseline, >1 = bursty, <1 = regular — the "
        "Barabasi burstiness signal, and a bot-detection staple).  "
        "Gaps are exact integer microseconds from a per-user LAG; "
        "mean/variance assemble from BIGINT and DECIMAL(38,0) sums "
        "(q78's discipline; the oracle's squared-gap sum rides "
        "HUGEINT because a month-long gap squared overflows DuckDB's "
        "physical 64-bit DECIMAL(18) multiply) with one double "
        "expression at output.  "
        "Physical shape: the lag window partitions by user_id and the "
        "following user-grain aggregation reuses the SAME hash "
        "partitioning — one fact shuffle total, output bounded by "
        "|users|.",
    tags=("timeseries", "events", "stats", "quality"),
)
def q256(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    us = F.expr("unix_micros(ts)")
    gap = us - F.lag(us).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    g = ev.select("user_id", gap.alias("gap_us")).where(F.col("gap_us").isNotNull())
    gd = F.col("gap_us").cast(_D18)
    s = g.groupBy("user_id").agg(
        F.count("gap_us").cast("bigint").alias("n_gaps"),
        F.sum("gap_us").cast("bigint").alias("s1"),
        F.sum((gd * gd).cast(_D38)).cast(_D38).alias("s2"),
    )
    nd = F.col("n_gaps").cast("double")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    return s.select(
        "user_id",
        "n_gaps",
        # integer-micros discipline: ONE round-to-integer of the same
        # double (engine-identical), then an exact /1e6 — round(x, 6)
        # diverges at half boundaries because DuckDB multiplies by 1e6
        # before rounding while Spark scales the exact binary value
        # (sf0.1 sweep found a 1-ulp mean_gap_s flip)
        (F.round(s1d / nd).cast("bigint").cast("double") / F.lit(1e6)).alias(
            "mean_gap_s"
        ),
        pround(F.when(
                (F.col("n_gaps") > 1) & (F.col("s1") > 0),
                F.sqrt((s2d - s1d * s1d / nd) / (nd - F.lit(1.0)))
                / (s1d / nd),
            ), 6).alias("cv"),
    )


# ---------------------------------------------------------------------------
# q257: per-brand log-log price elasticity of demand
# ---------------------------------------------------------------------------

@register(
    "q257_price_elasticity",
    sql="""
    WITH li AS (
      SELECT p_brand AS brand,
             CAST(round(ln(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                                AS DOUBLE)) * 1e6) AS BIGINT) AS x,
             CAST(round(ln(CAST(CAST(round(l_quantity) AS BIGINT)
                                AS DOUBLE)) * 1e6) AS BIGINT) AS y
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_extendedprice > 0 AND l_quantity >= 1
    ),
    s AS (
      SELECT brand,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) AS sx,
             CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(CAST(x AS DECIMAL(19,0))
                                * CAST(x AS DECIMAL(19,0))
                                AS DECIMAL(38,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(CAST(x AS DECIMAL(19,0))
                                * CAST(y AS DECIMAL(19,0))
                                AS DECIMAL(38,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS sxy
      FROM li GROUP BY 1
    )
    SELECT brand, n_lines,
           CAST(round((CASE WHEN n * sxx - sx * sx > 0 THEN
                 (n * sxy - sx * sy) / (n * sxx - sx * sx) END) * 1e6) AS BIGINT) / 1e6 AS elasticity
    FROM s
    """,
    doc="Per-brand price elasticity of demand: the OLS slope of "
        "ln(quantity) on ln(price) across a brand's order lines — "
        "the log-log regression whose slope IS the elasticity.  The "
        "ln terms are scaled to integer MICROS before any sum (the "
        "q209/q86 exactness recipe: ln of an exact-integer-derived "
        "double is bit-identical across engines, and integerizing "
        "makes the unordered partial-aggregation sums exact, which a "
        "raw double SUM never is); the micros scale cancels in the "
        "slope ratio.  Physical shape: part joins by broadcast (the "
        "q243 star discipline), ONE brand-grain aggregation carries "
        "all five moments, output bounded by |brands|.",
    tags=("ml-stats", "lineitem", "part", "regression"),
)
def q257(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_extendedprice") > 0) & (F.col("l_quantity") >= 1)
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ln_micros = lambda c: F.round(  # noqa: E731
        F.log(F.round(c).cast("bigint").cast("double")) * 1e6
    ).cast("bigint")
    base = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        F.col("p_brand").alias("brand"),
        ln_micros(F.col("l_extendedprice") * 100).alias("x"),
        ln_micros(F.col("l_quantity")).alias("y"),
    )
    xd, yd = F.col("x").cast(_D18), F.col("y").cast(_D18)
    s = base.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("bigint").cast("double").alias("sx"),
        F.sum("y").cast("bigint").cast("double").alias("sy"),
        F.sum((xd * xd).cast(_D38)).cast(_D38).cast("double").alias("sxx"),
        F.sum((xd * yd).cast(_D38)).cast(_D38).cast("double").alias("sxy"),
    )
    # a brand whose every line has one price makes var(x) exactly zero
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "brand",
        "n_lines",
        pround(F.when(
                var_x > 0,
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / var_x,
            ), 6).alias("elasticity"),
    )


# ---------------------------------------------------------------------------
# q258: token burstiness (Church-Gale cf/df)
# ---------------------------------------------------------------------------

@register(
    "q258_token_burstiness",
    sql="""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ),
    f AS (
      SELECT tok,
             CAST(COUNT(*) AS BIGINT) AS cf,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM tok WHERE tok <> '' GROUP BY 1
    )
    SELECT tok, cf, df,
           CAST(round((CAST(cf AS DOUBLE) / CAST(df AS DOUBLE)) * 1e6) AS BIGINT) / 1e6 AS burstiness
    FROM f
    """,
    doc="Token burstiness (Church & Gale, 1995): collection frequency "
        "over document frequency per token — function words hover "
        "near cf/df = corpus-average occurrences, content words burst "
        "(high cf concentrated in few docs).  A keyword-extraction "
        "and stopword-induction primitive that needs no language "
        "resources.  Exact integer counts, one division at output.  "
        "Physical shape: fan-out before the interpreted split/explode "
        "(the one-file-corpus lesson), then a single (tok, doc) "
        "distinct-count aggregation — vocab-bounded output by Zipf.",
    tags=("text", "documents", "llmdata"),
)
def q258(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..partitioning import fan_out

    docs = fan_out(load(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    f = tok.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("cf"),
        F.countDistinct("doc_id").cast("bigint").alias("df"),
    )
    return f.select(
        "tok",
        "cf",
        "df",
        pround(F.col("cf").cast("double") / F.col("df").cast("double"), 6).alias(
            "burstiness"
        ),
    )


# ---------------------------------------------------------------------------
# q259: weekday seasonality profile
# ---------------------------------------------------------------------------

@register(
    "q259_weekday_profile",
    sql="""
    WITH d AS (
      SELECT isodow(o_orderdate) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(round(coalesce(o_totalprice, 0) * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    ),
    m AS (
      SELECT dow, n_orders, rev_c,
             CAST(SUM(n_orders) OVER () AS BIGINT) AS n_tot,
             CAST(SUM(rev_c) OVER () AS BIGINT) AS rev_tot
      FROM d
    )
    SELECT CAST(dow AS BIGINT) AS dow, n_orders, rev_c,
           CAST(round((CASE WHEN rev_tot > 0 THEN
                 CAST(rev_c AS DOUBLE) / CAST(rev_tot AS DOUBLE) END) * 1e9) AS BIGINT) / 1e9
             AS revenue_share,
           CAST(round((CASE WHEN rev_tot > 0 THEN
                 (CAST(rev_c AS DOUBLE) / CAST(n_orders AS DOUBLE))
                 / (CAST(rev_tot AS DOUBLE) / CAST(n_tot AS DOUBLE)) END) * 1e6) AS BIGINT) / 1e6 AS aov_index
    FROM m
    """,
    doc="Weekday seasonality profile: per ISO day-of-week (Mon=1) the "
        "order count, revenue, revenue share, and average-order-value "
        "index against the overall AOV — the seasonality fingerprint "
        "that feeds staffing and anomaly baselines.  Day-of-week "
        "parity is the trap: Spark's dayofweek is Sunday=1 while "
        "DuckDB's isodow is Monday=1, so the Spark side computes "
        "weekday()+1 (Monday=0-based) to match isodow exactly.  One "
        "7-row aggregation; totals via windows over the 7-row frame.",
    tags=("timeseries", "orders", "agg"),
)
def q259(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load(spark, sf_dir, "orders")
        .groupBy((F.expr("weekday(o_orderdate)") + 1).alias("dow"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(_cents("o_totalprice")).cast("bigint").alias("rev_c"),
        )
    )
    w = Window.partitionBy()
    m = d.select(
        "dow",
        "n_orders",
        "rev_c",
        F.sum("n_orders").over(w).cast("bigint").alias("n_tot"),
        F.sum("rev_c").over(w).cast("bigint").alias("rev_tot"),
    )
    # all-zero revenue (degenerate input) zeroes the denominators
    pos = F.col("rev_tot") > 0
    return m.select(
        F.col("dow").cast("bigint").alias("dow"),
        "n_orders",
        "rev_c",
        pround(F.when(pos, F.col("rev_c").cast("double") / F.col("rev_tot").cast("double")), 9).alias("revenue_share"),
        pround(F.when(
                pos,
                (F.col("rev_c").cast("double") / F.col("n_orders").cast("double"))
                / (F.col("rev_tot").cast("double") / F.col("n_tot").cast("double")),
            ), 6).alias("aov_index"),
    )


# ---------------------------------------------------------------------------
# q260: Theil inequality decomposition of customer balances by nation
# ---------------------------------------------------------------------------

@register(
    "q260_theil_decomposition",
    sql="""
    WITH c AS (
      SELECT c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS x,
             CAST(round(ln(CAST(CAST(round(c_acctbal * 100) AS BIGINT)
                                AS DOUBLE)) * 1e6) AS BIGINT) AS lx
      FROM customer WHERE c_acctbal > 0
    ),
    g AS (
      SELECT c_nationkey,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(x) AS BIGINT) AS sx_c,
             CAST(SUM(CAST(CAST(x AS DECIMAL(19,0))
                           * CAST(lx AS DECIMAL(19,0))
                           AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxl
      FROM c GROUP BY 1
    ),
    m AS (
      SELECT c_nationkey, n_customers,
             CAST(n_customers AS DOUBLE) AS nd,
             CAST(sx_c AS DOUBLE) AS sx,
             CAST(sxl AS DOUBLE) AS sl,
             CAST(CAST(SUM(n_customers) OVER () AS BIGINT) AS DOUBLE) AS ntd,
             CAST(CAST(SUM(sx_c) OVER () AS BIGINT) AS DOUBLE) AS sxt
      FROM g
    )
    SELECT n_name AS nation, n_customers,
           CAST(round((sx / nd / 100) * 1e6) AS BIGINT) / 1e6 AS mean_bal,
           CAST(round(((sl / 1e6 - ln(sx / nd) * sx) / (nd * (sx / nd))) * 1e9) AS BIGINT) / 1e9
             AS theil_within,
           CAST(round(((sx / sxt) * ln((sx / sxt) / (nd / ntd))) * 1e9) AS BIGINT) / 1e9
             AS between_term
    FROM m JOIN nation ON c_nationkey = n_nationkey
    """,
    doc="Theil-T inequality decomposition of positive customer "
        "balances by nation: per nation the within-group Theil index "
        "T_g = (1/(n_g*mu_g)) * (sum(x*ln x) - ln(mu_g)*sum(x)) and "
        "its between-group term s_g*ln(s_g/p_g) (income share vs "
        "population share) — total inequality = sum(between) + "
        "sum(share_g * T_g), the property Gini lacks and the reason "
        "Theil is the decomposition-of-inequality standard.  "
        "sum(x*ln x) is an UNORDERED sum of ln terms, so ln scales to "
        "integer micros first (the q209/q257 recipe) and the product "
        "x*lx accumulates exactly through DECIMAL(19,0) operands; "
        "every remaining ln runs on identical double ratios.  "
        "Physical: one nationkey-grain aggregation (no sort, unlike "
        "q253's rank-based Gini), windows over the 25-row frame, "
        "broadcast nation dim.",
    tags=("stats", "customer", "nation", "agg"),
)
def q260(spark: SparkSession, sf_dir: str) -> DataFrame:
    bal = F.round(F.col("c_acctbal") * 100).cast("bigint")
    c = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 0)
        .select(
            "c_nationkey",
            bal.alias("x"),
            F.round(F.log(bal.cast("double")) * 1e6).cast("bigint").alias("lx"),
        )
    )
    g = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("x").cast("bigint").alias("sx_c"),
        F.sum((F.col("x").cast(_D18) * F.col("lx").cast(_D18)).cast(_D38))
        .cast(_D38)
        .alias("sxl"),
    )
    w = Window.partitionBy()
    m = g.select(
        "c_nationkey",
        "n_customers",
        F.col("n_customers").cast("double").alias("nd"),
        F.col("sx_c").cast("double").alias("sx"),
        F.col("sxl").cast("double").alias("sl"),
        F.sum("n_customers").over(w).cast("bigint").cast("double").alias("ntd"),
        F.sum("sx_c").over(w).cast("bigint").cast("double").alias("sxt"),
    )
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    mu = F.col("sx") / F.col("nd")
    share = F.col("sx") / F.col("sxt")
    return (
        m.join(F.broadcast(nation), m["c_nationkey"] == nation["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            "n_customers",
            pround(mu / 100, 6).alias("mean_bal"),
            pround((F.col("sl") / F.lit(1e6) - F.log(mu) * F.col("sx"))
                / (F.col("nd") * mu), 9).alias("theil_within"),
            pround(share * F.log(share / (F.col("nd") / F.col("ntd"))), 9).alias("between_term"),
        )
    )


# ---------------------------------------------------------------------------
# q261: exact AUC via the tie-corrected Mann-Whitney rank sum
# ---------------------------------------------------------------------------

@register(
    "q261_exact_auc",
    sql="""
    WITH e AS (
      SELECT CAST(round(coalesce(value, 0) * 100) AS BIGINT) AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    g AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM e GROUP BY 1
    ),
    c AS (
      SELECT s, cnt, pos,
             CAST(COALESCE(SUM(cnt) OVER (ORDER BY s
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS r_lo
      FROM g
    ),
    t AS (
      SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(SUM(cnt - pos) AS BIGINT) AS n_neg,
             CAST(SUM(CAST(pos AS HUGEINT) * (2 * r_lo + cnt + 1))
                  AS DECIMAL(38,0)) AS two_ranksum
      FROM c
    )
    SELECT n_pos, n_neg,
           CAST(round((CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                 (CAST(two_ranksum AS DOUBLE) / 2.0
                  - CAST(n_pos AS DOUBLE) * (CAST(n_pos AS DOUBLE) + 1.0)
                    / 2.0)
                 / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) END) * 1e9) AS BIGINT) / 1e9 AS auc
    FROM t
    """,
    doc="EXACT ROC-AUC of 'event value predicts purchase' via the "
        "tie-corrected Mann-Whitney rank sum: AUC = (R_pos - "
        "n_pos(n_pos+1)/2) / (n_pos*n_neg), where tied scores take "
        "their average rank.  The whole computation runs at "
        "DISTINCT-SCORE grain — per score the count and positive "
        "count, ranks-below from one cumulative window, and the "
        "doubled average rank 2*r_lo + cnt + 1 stays integer, so the "
        "rank sum is an exact DECIMAL(38,0)/HUGEINT sum (no "
        "per-row global sort, no double accumulation; the classic "
        "sklearn roc_auc_score needs the full sorted score vector — "
        "this is the shuffle-bounded distributed equivalent).  "
        "Physical shape: one score-grain aggregation (the only "
        "fact-sized shuffle), one cumulative window over the "
        "value-bounded score frame, one single-row rollup.",
    tags=("ml-stats", "events", "ranking"),
)
def q261(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        _cents("value").alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    g = e.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    c = g.select(
        "s",
        "cnt",
        "pos",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("bigint").alias("r_lo"),
    )
    t = c.agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum((F.col("cnt") - F.col("pos"))).cast("bigint").alias("n_neg"),
        F.sum(
            (
                F.col("pos").cast(_D18)
                * (2 * F.col("r_lo") + F.col("cnt") + 1).cast(_D18)
            ).cast(_D38)
        )
        .cast(_D38)
        .alias("two_ranksum"),
    )
    npd = F.col("n_pos").cast("double")
    # single-class input: AUC undefined -> NULL, not an ANSI div error
    return t.select(
        "n_pos",
        "n_neg",
        pround(F.when(
                (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                (
                    F.col("two_ranksum").cast("double") / F.lit(2.0)
                    - npd * (npd + F.lit(1.0)) / F.lit(2.0)
                )
                / (npd * F.col("n_neg").cast("double")),
            ), 9).alias("auc"),
    )


# ---------------------------------------------------------------------------
# q262: decile lift / gains table
# ---------------------------------------------------------------------------

@register(
    "q262_lift_gains_table",
    sql="""
    WITH e AS (
      SELECT CAST(round(coalesce(value, 0) * 100) AS BIGINT) AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    g AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM e GROUP BY 1
    ),
    c AS (
      SELECT s, cnt, pos,
             CAST(COALESCE(SUM(cnt) OVER (ORDER BY s DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS r_lo,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n_tot,
             CAST(SUM(pos) OVER () AS BIGINT) AS pos_tot
      FROM g
    ),
    d AS (
      SELECT CAST((r_lo * 10) // n_tot AS BIGINT) AS decile,
             CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(pos) AS BIGINT) AS n_pos,
             MAX(n_tot) AS n_tot, MAX(pos_tot) AS pos_tot
      FROM c GROUP BY 1
    )
    SELECT decile, n, n_pos,
           CAST(round((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9) AS BIGINT) / 1e9
             AS response_rate,
           CAST(round((CASE WHEN pos_tot > 0 THEN
                 (CAST(CAST(SUM(n_pos) OVER (ORDER BY decile
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS DOUBLE)
                  / CAST(CAST(SUM(n) OVER (ORDER BY decile
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS DOUBLE))
                 / (CAST(pos_tot AS DOUBLE) / CAST(n_tot AS DOUBLE)) END) * 1e9) AS BIGINT) / 1e9 AS cum_lift
    FROM d
    """,
    doc="Decile lift / gains table for 'event value predicts "
        "purchase': rows ranked by score descending are cut into ten "
        "near-equal bins, per bin the response rate and the CUMULATIVE "
        "lift over the base rate — the model-targeting report every "
        "campaign readout uses.  Like q261 the binning runs at "
        "DISTINCT-SCORE grain: bin(s) = (ranks_below * 10) div N, so "
        "tied scores stay together, no fact-grain NTILE global sort "
        "exists anywhere, and every count is an exact integer (the "
        "only doubles are the two final ratios).  Physical shape: one "
        "score-grain aggregation, cumulative windows over the score "
        "frame then the 10-row decile frame.",
    tags=("ml-stats", "events", "ranking"),
)
def q262(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        _cents("value").alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    g = e.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    w_cum = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy()
    c = g.select(
        "cnt",
        "pos",
        F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).cast("bigint").alias("r_lo"),
        F.sum("cnt").over(w_all).cast("bigint").alias("n_tot"),
        F.sum("pos").over(w_all).cast("bigint").alias("pos_tot"),
    )
    d = c.groupBy(
        F.expr("div(r_lo * 10, n_tot)").cast("bigint").alias("decile")
    ).agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.max("n_tot").alias("n_tot"),
        F.max("pos_tot").alias("pos_tot"),
    )
    w_dec = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return d.select(
        "decile",
        "n",
        "n_pos",
        pround(F.col("n_pos").cast("double") / F.col("n").cast("double"), 9).alias(
            "response_rate"
        ),
        pround(F.when(
                F.col("pos_tot") > 0,
                (
                    F.sum("n_pos").over(w_dec).cast("bigint").cast("double")
                    / F.sum("n").over(w_dec).cast("bigint").cast("double")
                )
                / (F.col("pos_tot").cast("double") / F.col("n_tot").cast("double")),
            ), 9).alias("cum_lift"),
    )


# ---------------------------------------------------------------------------
# q263: Herfindahl-Hirschman supplier concentration per nation
# ---------------------------------------------------------------------------

@register(
    "q263_hhi_concentration",
    sql="""
    WITH s AS (
      SELECT s_nationkey, l_suppkey,
             CAST(SUM(CAST(round(coalesce(l_extendedprice, 0) * 100)
                           AS BIGINT)) AS BIGINT) AS rev_c
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1, 2
    ),
    n AS (
      SELECT s_nationkey,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             CAST(SUM(rev_c) AS BIGINT) AS rev_tot,
             CAST(SUM(CAST(rev_c AS HUGEINT) * rev_c)
                  AS DECIMAL(38,0)) AS rev_sq
      FROM s GROUP BY 1
    )
    SELECT n_name AS nation, n_suppliers,
           CAST(round((CAST(rev_tot AS DOUBLE) / 100) * 1e6) AS BIGINT) / 1e6 AS revenue,
           CAST(round((CASE WHEN rev_tot > 0 THEN
                 CAST(rev_sq AS DOUBLE)
                 / (CAST(rev_tot AS DOUBLE) * CAST(rev_tot AS DOUBLE)) END) * 1e9) AS BIGINT) / 1e9 AS hhi
    FROM n JOIN nation ON s_nationkey = n_nationkey
    """,
    doc="Herfindahl-Hirschman supplier-concentration index per "
        "nation: HHI = sum over suppliers of (revenue share)^2 = "
        "sum(rev^2)/sum(rev)^2 — the antitrust concentration metric "
        "(10000*HHI > 2500 = highly concentrated).  The share "
        "squares never materialize: per-supplier revenue accumulates "
        "as exact cents, the squared sum rides DECIMAL(38,0)/HUGEINT "
        "(a supplier's cents squared exceeds 64-bit — the q256 "
        "lesson), and HHI is one double ratio at output.  Physical "
        "shape: one suppkey-grain rollup (the only fact shuffle — "
        "supplier joins on the same key family), one nation-grain "
        "rollup, broadcast nation dim; NO per-nation window needed "
        "because sum-of-squares is algebraic.",
    tags=("stats", "lineitem", "supplier", "nation"),
)
def q263(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", _cents("l_extendedprice").alias("cents")
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    s = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum("cents").cast("bigint").alias("rev_c"))
    )
    rd = F.col("rev_c").cast(_D18)
    n = s.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum("rev_c").cast("bigint").alias("rev_tot"),
        F.sum((rd * rd).cast(_D38)).cast(_D38).alias("rev_sq"),
    )
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        n.join(F.broadcast(nation), n["s_nationkey"] == nation["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            "n_suppliers",
            pround(F.col("rev_tot").cast("double") / 100, 6).alias("revenue"),
            pround(F.when(
                    F.col("rev_tot") > 0,
                    F.col("rev_sq").cast("double")
                    / (
                        F.col("rev_tot").cast("double")
                        * F.col("rev_tot").cast("double")
                    ),
                ), 9).alias("hhi"),
        )
    )


# ---------------------------------------------------------------------------
# q264: ClickHouse-style windowFunnel (view -> click -> purchase)
# ---------------------------------------------------------------------------

@register(
    "q264_window_funnel",
    sql="""
    WITH ev AS (
      SELECT user_id, ts, event_id, event_type
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    anch AS (
      SELECT user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_purchase
      FROM ev
    ),
    clicks AS (
      SELECT user_id, ts AS click_ts,
             MIN(next_purchase) AS purchase_after_click
      FROM anch WHERE event_type = 'click'
      GROUP BY 1, 2
    ),
    views AS (
      SELECT a.user_id,
             CASE
               WHEN a.next_click IS NOT NULL
                    AND a.next_click <= a.ts + INTERVAL 30 MINUTE
               THEN CASE
                 WHEN c.purchase_after_click IS NOT NULL
                      AND c.purchase_after_click
                          <= a.ts + INTERVAL 30 MINUTE
                 THEN 3 ELSE 2 END
               ELSE 1 END AS level
      FROM anch a
      LEFT JOIN clicks c
        ON c.user_id = a.user_id AND c.click_ts = a.next_click
      WHERE a.event_type = 'view'
    ),
    per_user AS (
      SELECT user_id, MAX(level) AS level FROM views GROUP BY 1
    )
    SELECT CAST(level AS BIGINT) AS level,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM per_user GROUP BY 1
    """,
    doc="ClickHouse-style windowFunnel: per user the deepest "
        "view -> click -> purchase chain completed within 30 minutes "
        "of the chain's FIRST event, reported as a level histogram.  "
        "The chain search is greedy like ClickHouse's strict_order "
        "mode: each view anchors at the FIRST later click (a "
        "conditional MIN over the following frame), and that click's "
        "first later purchase must still fall inside the view's "
        "window.  The Spark side needs NO join for the second hop: "
        "with pac(row) = first purchase after the row (window pass "
        "1), the first FOLLOWING click's pac equals min over "
        "following clicks of pac (pac is monotone in click position — "
        "any purchase after a later click is also after an earlier "
        "one), so window pass 2 reads it straight off the same "
        "sorted frame.  The oracle keeps an independent join-based "
        "formulation of the same semantics.  A successor means a "
        "STRICTLY LATER TIMESTAMP (RANGE frames on epoch "
        "microseconds, 1 FOLLOWING): same-timestamp events are never "
        "each other's successors, so interleavings inside a tied "
        "timestamp cannot make the two formulations diverge — with "
        "ROWS frames the oracle's (user, ts) click grouping and the "
        "window pass disagree when a purchase sits between two "
        "same-ts clicks.  Physical shape: ONE scan, one user-grain "
        "shuffle, one sort shared by both stacked window passes, "
        "zero joins.",
    tags=("timeseries", "events", "funnel", "window"),
)
def q264(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "ts", F.expr("unix_micros(ts)").alias("us"), "event_type")
    )
    w = Window.partitionBy("user_id").orderBy("us").rangeBetween(
        1, Window.unboundedFollowing
    )
    pass1 = ev.select(
        "user_id",
        "ts",
        "us",
        "event_type",
        F.min(F.when(F.col("event_type") == "click", F.col("ts")))
        .over(w)
        .alias("next_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        .over(w)
        .alias("pac"),
    )
    pass2 = pass1.select(
        "user_id",
        "ts",
        "event_type",
        "next_click",
        F.min(F.when(F.col("event_type") == "click", F.col("pac")))
        .over(w)
        .alias("purchase_after_click"),
    )
    deadline = F.col("ts") + F.expr("INTERVAL 30 MINUTE")
    levels = pass2.where(F.col("event_type") == "view").select(
        "user_id",
        F.when(
            F.col("next_click").isNotNull() & (F.col("next_click") <= deadline),
            F.when(
                F.col("purchase_after_click").isNotNull()
                & (F.col("purchase_after_click") <= deadline),
                F.lit(3),
            ).otherwise(F.lit(2)),
        )
        .otherwise(F.lit(1))
        .alias("level"),
    )
    per_user = levels.groupBy("user_id").agg(F.max("level").alias("level"))
    return per_user.groupBy(F.col("level").cast("bigint").alias("level")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )


# ---------------------------------------------------------------------------
# q265: Mann-Kendall trend test on the daily revenue series
# ---------------------------------------------------------------------------

@register(
    "q265_mann_kendall_trend",
    sql="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(round(coalesce(o_totalprice, 0) * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN b.rev_c > a.rev_c THEN 1
                           WHEN b.rev_c < a.rev_c THEN -1
                           ELSE 0 END) AS BIGINT) AS s_stat
      FROM daily a JOIN daily b ON b.day > a.day
    ),
    ties AS (
      SELECT CAST(COALESCE(SUM(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)), 0)
                  AS DECIMAL(38,0)) AS tie_adj
      FROM (SELECT COUNT(*) AS t FROM daily GROUP BY rev_c) WHERE t > 1
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily)
    SELECT n_days, s_stat,
           CAST(round((CASE
             WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0)
               / sqrt((CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0)
                       * (2.0 * CAST(n_days AS DOUBLE) + 5.0)
                       - CAST(tie_adj AS DOUBLE)) / 18.0)
             WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0)
               / sqrt((CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0)
                       * (2.0 * CAST(n_days AS DOUBLE) + 5.0)
                       - CAST(tie_adj AS DOUBLE)) / 18.0)
             ELSE 0.0 END) * 1e6) AS BIGINT) / 1e6 AS z_stat
    FROM n CROSS JOIN s CROSS JOIN ties
    """,
    doc="Mann-Kendall nonparametric trend test on the daily revenue "
        "series: S = sum over day pairs i<j of sign(x_j - x_i), the "
        "tie-corrected variance n(n-1)(2n+5)/18 - sum t(t-1)(2t+5)/18, "
        "and the continuity-corrected z statistic — the standard "
        "monotone-trend detector that needs no distributional "
        "assumption and shrugs off outliers.  The O(n^2) pair space "
        "is CALENDAR-bounded (n = days, never fact rows), so the "
        "self-join is a ~3M-pair day-frame product per decade "
        "regardless of fact scale, with the right side broadcast.  S "
        "and the tie adjustment are exact integers; z is one double "
        "expression.  The three scalar legs assemble by single-row "
        "cross joins (allowlisted q42 shape).",
    tags=("timeseries", "orders", "stats", "trend"),
)
def q265(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day"))
        .agg(F.sum(_cents("o_totalprice")).cast("bigint").alias("rev_c"))
    )
    b = daily.select(F.col("day").alias("bday"), F.col("rev_c").alias("brev"))
    s = (
        daily.join(F.broadcast(b), F.col("bday") > F.col("day"))
        .agg(
            F.sum(
                F.when(F.col("brev") > F.col("rev_c"), 1)
                .when(F.col("brev") < F.col("rev_c"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    t = F.col("t")
    ties = (
        daily.groupBy("rev_c")
        .agg(F.count(F.lit(1)).alias("t"))
        .where(t > 1)
        .agg(
            F.coalesce(
                F.sum((t.cast(_D18) * (t - 1) * (2 * t + 5)).cast(_D38)),
                F.lit(0),
            )
            .cast(_D38)
            .alias("tie_adj")
        )
    )
    n = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    nd = F.col("n_days").cast("double")
    sd = F.col("s_stat").cast("double")
    var = (
        nd * (nd - F.lit(1.0)) * (F.lit(2.0) * nd + F.lit(5.0))
        - F.col("tie_adj").cast("double")
    ) / F.lit(18.0)
    return (
        n.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(ties))
        .select(
            "n_days",
            "s_stat",
            pround(F.when(F.col("s_stat") > 0, (sd - F.lit(1.0)) / F.sqrt(var))
                .when(F.col("s_stat") < 0, (sd + F.lit(1.0)) / F.sqrt(var))
                .otherwise(F.lit(0.0)), 6).alias("z_stat"),
        )
    )


# ---------------------------------------------------------------------------
# q266: additive seasonal decomposition (trend / weekly seasonal / remainder)
# ---------------------------------------------------------------------------

@register(
    "q266_seasonal_decompose",
    sql="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             isodow(CAST(date_trunc('day', o_orderdate) AS DATE)) AS dow,
             CAST(date_diff('day', DATE '1970-01-01',
                            CAST(date_trunc('day', o_orderdate) AS DATE))
                  AS BIGINT) AS day_num,
             CAST(SUM(CAST(round(coalesce(o_totalprice, 0) * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders GROUP BY 1, 2, 3
    ),
    tr AS (
      SELECT day, dow, rev_c,
             CAST(SUM(rev_c) OVER w AS BIGINT) AS s7,
             CAST(COUNT(*) OVER w AS BIGINT) AS n7
      FROM daily
      WINDOW w AS (ORDER BY day_num RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
      SELECT day, dow, rev_c,
             CAST(round(CAST(s7 AS DOUBLE) / 7.0 * 1e6) AS BIGINT) AS tm
      FROM tr WHERE n7 = 7
    ),
    seas AS (
      SELECT dow,
             CAST(SUM(CAST(CAST(rev_c AS DECIMAL(19,0)) * 1000000
                           AS DECIMAL(38,0)) - tm)
                  AS DECIMAL(38,0)) AS dsum,
             CAST(COUNT(*) AS BIGINT) AS dcnt
      FROM det GROUP BY 1
    )
    SELECT CAST(day AS VARCHAR) AS day, rev_c,
           CAST(CAST(round(CAST(tm AS DOUBLE) / 100.0) AS BIGINT)
                AS DOUBLE) / 1e6 AS trend,
           CAST(CAST(round(CAST(dsum AS DOUBLE) / CAST(dcnt AS DOUBLE)
                           / 100.0) AS BIGINT) AS DOUBLE) / 1e6 AS seasonal,
           CAST(CAST(round((CAST(CAST(CAST(rev_c AS DECIMAL(19,0)) * 1000000
                                      AS DECIMAL(38,0)) - tm AS DOUBLE)
                            - CAST(dsum AS DOUBLE) / CAST(dcnt AS DOUBLE))
                           / 100.0) AS BIGINT) AS DOUBLE) / 1e6 AS remainder
    FROM det JOIN seas USING (dow)
    """,
    doc="Additive seasonal decomposition of the daily revenue series "
        "(classical decompose, weekly period): trend = centered 7-day "
        "moving average over a calendar RANGE window (days missing "
        "from the calendar shrink the window and are EXCLUDED via the "
        "n7 = 7 guard rather than silently biasing the average), "
        "seasonal = per-ISO-weekday mean of the detrended series, "
        "remainder = the rest.  Cross-engine exactness: the trend is "
        "integerized to micros immediately (round of a double is "
        "deterministic), so the per-weekday seasonal means sum exact "
        "INTEGERS — never an unordered double sum.  Physical: one "
        "fact rollup to day grain, one calendar-bounded range window, "
        "a 7-row seasonal rollup broadcast back.",
    tags=("timeseries", "orders", "decomposition"),
)
def q266(spark: SparkSession, sf_dir: str) -> DataFrame:
    day = F.date_trunc("day", F.col("o_orderdate")).cast("date")
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(
            day.alias("day"),
            (F.expr("weekday(date_trunc('day', o_orderdate))") + 1).alias("dow"),
            F.expr("datediff(date_trunc('day', o_orderdate), DATE '1970-01-01')")
            .cast("bigint")
            .alias("day_num"),
        )
        .agg(F.sum(_cents("o_totalprice")).cast("bigint").alias("rev_c"))
    )
    w = Window.orderBy("day_num").rangeBetween(-3, 3)
    tr = daily.select(
        "day",
        "dow",
        "rev_c",
        F.sum("rev_c").over(w).cast("bigint").alias("s7"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n7"),
    )
    det = tr.where(F.col("n7") == 7).select(
        "day",
        "dow",
        "rev_c",
        F.round(F.col("s7").cast("double") / F.lit(7.0) * F.lit(1e6))
        .cast("bigint")
        .alias("tm"),
    )
    # rev_c*1e6 rides DECIMAL: a bare BIGINT multiply wraps silently in
    # Spark past ~9.2e12 daily cents while DuckDB errors (file header
    # discipline)
    detr = (F.col("rev_c").cast(_D18) * 1000000).cast(_D38) - F.col("tm")
    seas = det.groupBy("dow").agg(
        F.sum(detr).cast(_D38).alias("dsum"),
        F.count(F.lit(1)).cast("bigint").alias("dcnt"),
    )
    smean = F.col("dsum").cast("double") / F.col("dcnt").cast("double")

    # integer-micros discipline: round to integer micro-dollars FIRST
    # (one round-to-integer of an identically-computed double is
    # engine-identical), then divide — round(x, 6) flips at half
    # boundaries between the engines (sf0.1 sweep found a 1-ulp
    # remainder flip)
    def micro_dollars(x: F.Column) -> F.Column:
        return F.round(x / F.lit(100.0)).cast("bigint").cast("double") / F.lit(
            1e6
        )

    return det.join(F.broadcast(seas), "dow").select(
        F.col("day").cast("string").alias("day"),
        "rev_c",
        micro_dollars(F.col("tm").cast("double")).alias("trend"),
        micro_dollars(smean).alias("seasonal"),
        micro_dollars(detr.cast("double") - smean).alias("remainder"),
    )


# ---------------------------------------------------------------------------
# q267: exact two-sample Kolmogorov-Smirnov (weekday vs weekend orders)
# ---------------------------------------------------------------------------

@register(
    "q267_ks_two_sample",
    sql="""
    WITH o AS (
      SELECT CAST(round(coalesce(o_totalprice, 0) * 100) AS BIGINT) AS v,
             CASE WHEN isodow(o_orderdate) >= 6 THEN 1 ELSE 0 END AS wk
      FROM orders
    ),
    g AS (
      SELECT v,
             CAST(SUM(1 - wk) AS BIGINT) AS c1,
             CAST(SUM(wk) AS BIGINT) AS c2
      FROM o GROUP BY 1
    ),
    c AS (
      SELECT v,
             CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS f1,
             CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS f2,
             CAST(SUM(c1) OVER () AS BIGINT) AS n1,
             CAST(SUM(c2) OVER () AS BIGINT) AS n2
      FROM g
    ),
    d AS (
      SELECT v, n1, n2, abs(f1 * n2 - f2 * n1) AS gap,
             ROW_NUMBER() OVER (ORDER BY abs(f1 * n2 - f2 * n1) DESC, v) AS rn
      FROM c
    )
    SELECT n1, n2,
           CAST(round((CASE WHEN n1 > 0 AND n2 > 0 THEN
                 CAST(gap AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) END) * 1e9) AS BIGINT) / 1e9 AS d_stat,
           v AS at_value_cents
    FROM d WHERE rn = 1
    """,
    doc="Exact two-sample Kolmogorov-Smirnov statistic comparing "
        "weekday vs weekend order-value distributions: D = max over "
        "values of |F1(v) - F2(v)|, located at its argmax value "
        "(smallest value on ties).  The comparison |f1*n2 - f2*n1| "
        "stays INTEGER until the final division, so the argmax is "
        "exact — no epsilon fuzz in the supremum, which float ECDFs "
        "get wrong.  Everything runs at DISTINCT-VALUE grain: one "
        "fact shuffle to value counts, cumulative windows over the "
        "value frame, one ranked row out.  (f1*n2 products stay "
        "under 2^63 up to ~3e9-row samples; past that the q256 "
        "HUGEINT/DECIMAL widening applies.)",
    tags=("stats", "orders", "distribution"),
)
def q267(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        _cents("o_totalprice").alias("v"),
        F.when(F.expr("weekday(o_orderdate)") + 1 >= 6, 1).otherwise(0).alias("wk"),
    )
    g = o.groupBy("v").agg(
        F.sum(1 - F.col("wk")).cast("bigint").alias("c1"),
        F.sum("wk").cast("bigint").alias("c2"),
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    c = g.select(
        "v",
        F.sum("c1").over(w_cum).cast("bigint").alias("f1"),
        F.sum("c2").over(w_cum).cast("bigint").alias("f2"),
        F.sum("c1").over(w_all).cast("bigint").alias("n1"),
        F.sum("c2").over(w_all).cast("bigint").alias("n2"),
    )
    gap = F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1"))
    d = c.select(
        "v",
        "n1",
        "n2",
        gap.alias("gap"),
        F.row_number().over(Window.orderBy(gap.desc(), "v")).alias("rn"),
    )
    return d.where(F.col("rn") == 1).select(
        "n1",
        "n2",
        pround(F.when(
                (F.col("n1") > 0) & (F.col("n2") > 0),
                F.col("gap").cast("double")
                / (F.col("n1").cast("double") * F.col("n2").cast("double")),
            ), 9).alias("d_stat"),
        F.col("v").alias("at_value_cents"),
    )


# ---------------------------------------------------------------------------
# q268: CUSUM changepoint detection on the daily revenue series
# ---------------------------------------------------------------------------

@register(
    "q268_cusum_changepoint",
    sql="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(round(coalesce(o_totalprice, 0) * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    ),
    c AS (
      SELECT day, rev_c,
             CAST(SUM(rev_c) OVER (ORDER BY day) AS BIGINT) AS run_sum,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
             CAST(SUM(rev_c) OVER () AS BIGINT) AS s_tot,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM daily
    ),
    k AS (
      SELECT day, run_sum, t, s_tot, n,
             abs(CAST(run_sum AS DOUBLE)
                 - CAST(t AS DOUBLE) * CAST(s_tot AS DOUBLE)
                   / CAST(n AS DOUBLE)) AS cusum,
             ROW_NUMBER() OVER (ORDER BY
               abs(CAST(run_sum AS DOUBLE)
                   - CAST(t AS DOUBLE) * CAST(s_tot AS DOUBLE)
                     / CAST(n AS DOUBLE)) DESC, day) AS rn
      FROM c WHERE t < n
    )
    SELECT CAST(day AS VARCHAR) AS split_day,
           CAST(round((cusum / 100) * 1e6) AS BIGINT) / 1e6 AS max_cusum,
           CAST(round((CAST(run_sum AS DOUBLE) / CAST(t AS DOUBLE) / 100) * 1e6) AS BIGINT) / 1e6
             AS mean_before,
           CAST(round(((CAST(s_tot AS DOUBLE) - CAST(run_sum AS DOUBLE))
                 / (CAST(n AS DOUBLE) - CAST(t AS DOUBLE)) / 100) * 1e6) AS BIGINT) / 1e6
             AS mean_after
    FROM k WHERE rn = 1
    """,
    doc="CUSUM changepoint detection on the daily revenue series: the "
        "cumulative deviation from the grand mean |S_t - t*mu| peaks "
        "at the most likely single changepoint (Page's test / binary "
        "segmentation's first cut); reports the split day, the peak "
        "CUSUM, and the mean level on each side.  Running and grand "
        "sums are exact integers; each day's CUSUM is one double "
        "expression over them, and the argmax tie-breaks on day, so "
        "the located changepoint is deterministic in both engines.  "
        "Physical: one fact rollup to day grain, cumulative windows "
        "over the calendar-bounded frame, one ranked row out.",
    tags=("timeseries", "orders", "anomaly", "changepoint"),
)
def q268(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day"))
        .agg(F.sum(_cents("o_totalprice")).cast("bigint").alias("rev_c"))
    )
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    c = daily.select(
        "day",
        F.sum("rev_c").over(w_cum).cast("bigint").alias("run_sum"),
        F.row_number().over(Window.orderBy("day")).cast("bigint").alias("t"),
        F.sum("rev_c").over(w_all).cast("bigint").alias("s_tot"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
    )
    cusum = F.abs(
        F.col("run_sum").cast("double")
        - F.col("t").cast("double") * F.col("s_tot").cast("double")
        / F.col("n").cast("double")
    )
    k = c.where(F.col("t") < F.col("n")).select(
        "day",
        "run_sum",
        "t",
        "s_tot",
        "n",
        cusum.alias("cusum"),
        F.row_number().over(Window.orderBy(cusum.desc(), "day")).alias("rn"),
    )
    return k.where(F.col("rn") == 1).select(
        F.col("day").cast("string").alias("split_day"),
        pround(F.col("cusum") / 100, 6).alias("max_cusum"),
        pround(F.col("run_sum").cast("double") / F.col("t").cast("double") / 100, 6).alias("mean_before"),
        pround((F.col("s_tot").cast("double") - F.col("run_sum").cast("double"))
            / (F.col("n").cast("double") - F.col("t").cast("double"))
            / 100, 6).alias("mean_after"),
    )


# ---------------------------------------------------------------------------
# q269: Kneser-Ney smoothed bigram LM, held-out scoring
# ---------------------------------------------------------------------------

@register(
    "q269_kneser_ney_bigram",
    sql="""
    WITH tr AS (
      SELECT string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents WHERE doc_id % 2 = 0
    ),
    trb AS (
      SELECT array_to_string(t[i:i+1], ' ') AS bg
      FROM (SELECT t FROM tr WHERE len(t) >= 2),
           unnest(generate_series(1, len(t) - 1)) AS u(i)
    ),
    c2 AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c2 FROM trb GROUP BY 1),
    ctx AS (
      SELECT string_split(bg, ' ')[1] AS w1,
             CAST(COUNT(*) AS BIGINT) AS c1,
             CAST(COUNT(DISTINCT bg) AS BIGINT) AS n1fwd
      FROM trb GROUP BY 1
    ),
    cont AS (
      SELECT string_split(bg, ' ')[2] AS w2,
             CAST(COUNT(DISTINCT bg) AS BIGINT) AS n1bwd
      FROM trb GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(DISTINCT bg) AS BIGINT) AS n_bi,
             (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT)
              FROM (SELECT unnest(t) AS tok FROM tr)) AS v
      FROM trb
    ),
    te AS (
      SELECT doc_id, lang,
             string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents WHERE doc_id % 2 = 1
    ),
    teb AS (
      SELECT doc_id, lang,
             array_to_string(t[i:i+1], ' ') AS bg,
             string_split(array_to_string(t[i:i+1], ' '), ' ')[1] AS w1,
             string_split(array_to_string(t[i:i+1], ' '), ' ')[2] AS w2
      FROM (SELECT doc_id, lang, t FROM te WHERE len(t) >= 2),
           unnest(generate_series(1, len(t) - 1)) AS u(i)
    ),
    scored AS (
      SELECT teb.lang,
             CASE WHEN ctx.c1 IS NULL THEN 1 ELSE 0 END AS oov_ctx,
             CASE WHEN ctx.c1 IS NOT NULL THEN
               CAST(round(-ln(
                 greatest(CAST(COALESCE(c2.c2, 0) AS DOUBLE) - 0.75, 0.0)
                   / CAST(ctx.c1 AS DOUBLE)
                 + (0.75 * CAST(ctx.n1fwd AS DOUBLE) / CAST(ctx.c1 AS DOUBLE))
                   * ((CAST(COALESCE(cont.n1bwd, 0) AS DOUBLE) + 1.0)
                      / (CAST(tot.n_bi AS DOUBLE) + CAST(tot.v AS DOUBLE)))
               ) * 1e6) AS BIGINT) END AS nll_micros
      FROM teb LEFT JOIN c2 USING (bg)
               LEFT JOIN ctx USING (w1)
               LEFT JOIN cont USING (w2), tot
    )
    SELECT lang,
           CAST(SUM(1 - oov_ctx) AS BIGINT) AS n_scored,
           CAST(SUM(oov_ctx) AS BIGINT) AS n_oov_ctx,
           CAST(round((CASE WHEN SUM(1 - oov_ctx) > 0 THEN
                 CAST(CAST(SUM(nll_micros) AS BIGINT) AS DOUBLE)
                 / SUM(1 - oov_ctx) / 1e6 END) * 1e6) AS BIGINT) / 1e6 AS avg_nll
    FROM scored GROUP BY 1
    """,
    doc="Kneser-Ney smoothed bigram LM scored on the held-out split "
        "(absolute discount d = 0.75): P(w2|w1) = max(c(w1w2)-d,0)/"
        "c(w1) + (d*N1+(w1.)/c(w1)) * Pcont(w2), with the CONTINUATION "
        "probability Pcont = (N1+(.w2)+1)/(N_bigram_types+V) add-one "
        "smoothed so unseen successors stay scoreable — the step up "
        "from q209's Laplace bigram that fixes the 'Francisco' "
        "problem (frequent-but-unversatile tokens overweighted).  "
        "Bigrams with an UNSEEN context are counted out separately "
        "(n_oov_ctx), not silently smoothed.  Every count is integer; "
        "each per-bigram ln scales to integer micros before the "
        "unordered sums (q209/q257 recipe).  Physical shape: fan-out "
        "before gram building; ONE corpus pass aggregates to the "
        "bigram-type table (localCheckpointed — its four consumers "
        "would otherwise re-run the corpus explode four times), from "
        "which the w1/w2/total statistics derive at type grain; the "
        "test stream joins at those grains (plain shuffle joins, "
        "vocab unbounded); the 2-scalar totals row broadcasts "
        "(allowlisted q42 shape).",
    tags=("text", "documents", "llmdata", "lm"),
)
def q269(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata.dedup import tokens
    from ..partitioning import fan_out

    docs = load(spark, sf_dir, "documents")
    toks = tokens("text")  # the shared postings-kernel tokenizer class

    def bigrams(df: DataFrame, keep_lang: bool) -> DataFrame:
        # docs with <2 tokens contribute NO bigrams (a pseudo-gram
        # would make split(bg)[1] an ANSI out-of-bounds crash; the
        # oracle filters len(t) >= 2 symmetrically)
        idx = F.sequence(F.lit(1), F.size(toks) - 1)
        grams = F.when(
            F.size(toks) >= 2,
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, 2))),
        ).otherwise(F.expr("CAST(array() AS array<string>)"))
        cols = ["doc_id", "lang"] if keep_lang else ["doc_id"]
        return fan_out(df).select(*cols, F.explode(grams).alias("bg"))

    train = docs.where(F.col("doc_id") % 2 == 0)
    test = docs.where(F.col("doc_id") % 2 == 1)
    tr = bigrams(train, keep_lang=False)
    # ONE corpus-sized explode+groupBy builds the bigram-TYPE table;
    # every other train statistic derives from it at type grain:
    # c1 = SUM(c2) over w1 (token occurrences == bigram occurrences led
    # by w1), n1fwd/n1bwd = plain COUNT(*) over w1/w2 (the table is
    # already distinct-bg grain, so COUNT == COUNT(DISTINCT bg)), and
    # n_bi = COUNT(*).  The previous formulation referenced the raw
    # explode from four consumers, so Spark re-ran the corpus explode
    # four times per job — at 100 TB that is four corpus passes where
    # one suffices.  localCheckpoint pins the type table (orders of
    # magnitude smaller than the corpus) for its four consumers; the
    # ContextCleaner drains it when the Python ref drops (the
    # PERSIST_PRONE hygiene test covers this query).
    c2 = (
        tr.groupBy("bg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
        .select(
            "bg",
            "c2",
            F.split("bg", " ")[0].alias("w1"),
            F.split("bg", " ")[1].alias("w2"),
        )
        .localCheckpoint()
    )
    ctx = c2.groupBy("w1").agg(
        F.sum("c2").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("n1fwd"),
    )
    cont = c2.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n1bwd")
    )
    n_bi = c2.agg(F.count(F.lit(1)).cast("bigint").alias("n_bi"))
    v = (
        fan_out(train)
        .select(F.explode(toks).alias("tok"))
        .agg(F.countDistinct("tok").cast("bigint").alias("v"))
    )
    tot = n_bi.crossJoin(F.broadcast(v))
    te = bigrams(test, keep_lang=True).select(
        "lang",
        "bg",
        F.split("bg", " ")[0].alias("w1"),
        F.split("bg", " ")[1].alias("w2"),
    )
    p = (
        F.greatest(
            F.coalesce(F.col("c2"), F.lit(0)).cast("double") - F.lit(0.75),
            F.lit(0.0),
        )
        / F.col("c1").cast("double")
        + (F.lit(0.75) * F.col("n1fwd").cast("double") / F.col("c1").cast("double"))
        * (
            (F.coalesce(F.col("n1bwd"), F.lit(0)).cast("double") + F.lit(1.0))
            / (F.col("n_bi").cast("double") + F.col("v").cast("double"))
        )
    )
    scored = (
        te.join(c2.select("bg", "c2"), "bg", "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.when(F.col("c1").isNull(), 1).otherwise(0).alias("oov_ctx"),
            F.when(
                F.col("c1").isNotNull(),
                F.round(-F.log(p) * 1e6).cast("bigint"),
            ).alias("nll_micros"),
        )
    )
    return scored.groupBy("lang").agg(
        F.sum(1 - F.col("oov_ctx")).cast("bigint").alias("n_scored"),
        F.sum("oov_ctx").cast("bigint").alias("n_oov_ctx"),
        pround(F.when(
                F.sum(1 - F.col("oov_ctx")) > 0,
                F.sum("nll_micros").cast("bigint").cast("double")
                / F.sum(1 - F.col("oov_ctx"))
                / 1e6,
            ), 6).alias("avg_nll"),
    )


# ---------------------------------------------------------------------------
# q270: Heaps'-law vocabulary growth fit per source
# ---------------------------------------------------------------------------

@register(
    "q270_heaps_law_fit",
    sql="""
    WITH tok AS (
      SELECT source, doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ),
    tk AS (SELECT source, doc_id, tok FROM tok WHERE tok <> ''),
    per_doc AS (
      SELECT source, doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens
      FROM tk GROUP BY 1, 2
    ),
    first_seen AS (
      SELECT source, tok, MIN(doc_id) AS d0 FROM tk GROUP BY 1, 2
    ),
    new_types AS (
      SELECT source, d0 AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_new
      FROM first_seen GROUP BY 1, 2
    ),
    cum AS (
      SELECT p.source, p.doc_id,
             CAST(SUM(p.n_tokens) OVER w AS BIGINT) AS cum_tokens,
             CAST(SUM(COALESCE(n.n_new, 0)) OVER w AS BIGINT) AS cum_types
      FROM per_doc p LEFT JOIN new_types n USING (source, doc_id)
      WINDOW w AS (PARTITION BY p.source ORDER BY p.doc_id
                   ROWS UNBOUNDED PRECEDING)
    ),
    pts AS (
      SELECT source,
             CAST(round(ln(CAST(cum_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS x,
             CAST(round(ln(CAST(cum_types AS DOUBLE)) * 1e6) AS BIGINT) AS y
      FROM cum WHERE cum_tokens > 0 AND cum_types > 0
    ),
    s AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) AS sx,
             CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(CAST(x AS DECIMAL(19,0))
                                * CAST(x AS DECIMAL(19,0))
                                AS DECIMAL(38,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(CAST(x AS DECIMAL(19,0))
                                * CAST(y AS DECIMAL(19,0))
                                AS DECIMAL(38,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS sxy
      FROM pts GROUP BY 1
    )
    SELECT source, n_docs,
           CAST(round((CASE WHEN n * sxx - sx * sx > 0 THEN
                 (n * sxy - sx * sy) / (n * sxx - sx * sx) END) * 1e6) AS BIGINT) / 1e6 AS beta,
           CAST(round((CASE WHEN n * sxx - sx * sx > 0 THEN
                 exp(((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                      / n) / 1e6) END) * 1e6) AS BIGINT) / 1e6 AS k
    FROM s
    """,
    doc="Heaps'-law vocabulary-growth fit per source: V(n) = K*n^beta "
        "fit by OLS on (ln cumulative tokens, ln cumulative types) "
        "after each document in doc_id order — beta far from the "
        "corpus norm flags template/boilerplate sources (vocabulary "
        "saturates) or noisy ones (beta near 1); a data-curation "
        "fingerprint.  Cumulative TYPES come from the first-seen "
        "reduction (min doc_id per (source, token)) so no windowed "
        "distinct scan exists; ln points scale to integer micros "
        "before the unordered regression sums (q257 recipe; the "
        "micros scale cancels in beta, and the intercept unscales by "
        "1e6 inside exp for K).  Physical shape: one (source, token) "
        "rollup, one (source, doc) rollup, cumulative windows at "
        "document grain, a source-grain regression rollup.",
    tags=("text", "documents", "llmdata", "profiling"),
)
def q270(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..partitioning import fan_out

    docs = fan_out(load(spark, sf_dir, "documents"))
    tk = docs.select(
        "source",
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    per_doc = tk.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens")
    )
    first_seen = tk.groupBy("source", "tok").agg(F.min("doc_id").alias("d0"))
    new_types = first_seen.groupBy(
        "source", F.col("d0").alias("doc_id")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_new"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per_doc.join(new_types, ["source", "doc_id"], "left").select(
        "source",
        F.sum("n_tokens").over(w).cast("bigint").alias("cum_tokens"),
        F.sum(F.coalesce(F.col("n_new"), F.lit(0)))
        .over(w)
        .cast("bigint")
        .alias("cum_types"),
    )
    pts = cum.where((F.col("cum_tokens") > 0) & (F.col("cum_types") > 0)).select(
        "source",
        F.round(F.log(F.col("cum_tokens").cast("double")) * 1e6)
        .cast("bigint")
        .alias("x"),
        F.round(F.log(F.col("cum_types").cast("double")) * 1e6)
        .cast("bigint")
        .alias("y"),
    )
    xd, yd = F.col("x").cast(_D18), F.col("y").cast(_D18)
    s = pts.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("bigint").cast("double").alias("sx"),
        F.sum("y").cast("bigint").cast("double").alias("sy"),
        F.sum((xd * xd).cast(_D38)).cast(_D38).cast("double").alias("sxx"),
        F.sum((xd * yd).cast(_D38)).cast(_D38).cast("double").alias("sxy"),
    )
    # a one-document source has zero x-variance — NULL fit, not a div error
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    beta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / var_x
    return s.select(
        "source",
        "n_docs",
        pround(F.when(var_x > 0, beta), 6).alias("beta"),
        pround(F.when(
                var_x > 0,
                F.exp(((F.col("sy") - beta * F.col("sx")) / F.col("n")) / F.lit(1e6)),
            ), 6).alias("k"),
    )


# ---------------------------------------------------------------------------
# q271: contrastive embedding diagnostics — alignment & uniformity
# ---------------------------------------------------------------------------

@register(
    "q271_alignment_uniformity",
    sql="""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ),
    pos AS (
      SELECT CAST(round(list_sum(list_transform(generate_series(1, 64),
                    i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i]))) * 1e6)
                  AS BIGINT) AS d2m
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    ),
    unif AS (
      SELECT CAST(round(exp(-2.0 * list_sum(list_transform(
                    generate_series(1, 64),
                    i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i])))) * 1e12)
                  AS BIGINT) AS em
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE a.vec_id % 4 = 0 AND b.vec_id % 4 = 0
    ),
    pa AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pos_pairs,
             CAST(CAST(SUM(d2m) AS BIGINT) AS DOUBLE) AS s_align
      FROM pos
    ),
    ua AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_unif_pairs,
             CAST(CAST(SUM(em) AS BIGINT) AS DOUBLE) AS s_unif
      FROM unif
    )
    SELECT n_pos_pairs,
           CAST(round((CASE WHEN n_pos_pairs > 0 THEN
                 s_align / CAST(n_pos_pairs AS DOUBLE) / 1e6 END) * 1e6) AS BIGINT) / 1e6
             AS alignment,
           n_unif_pairs,
           CAST(round((CASE WHEN n_unif_pairs > 0 AND s_unif > 0 THEN
                 ln(s_unif / CAST(n_unif_pairs AS DOUBLE) / 1e12) END) * 1e6) AS BIGINT) / 1e6
             AS uniformity
    FROM pa CROSS JOIN ua
    """,
    doc="Contrastive-embedding diagnostics (Wang & Isola, ICML'20): "
        "ALIGNMENT = mean squared distance over same-label pairs "
        "(lower = positives cluster) and UNIFORMITY = ln of the mean "
        "Gaussian-kernel value exp(-2*d^2) over a deterministic "
        "hash-sampled pair set (lower = embeddings spread over the "
        "sphere) — the two axes that predict contrastive-representation "
        "quality.  Per-pair squared distances fold the 64 dims IN "
        "ARRAY ORDER on both engines (Spark aggregate/zip_with, "
        "DuckDB list_transform over generate_series — a GEMM would "
        "reorder the additions), then integerize to micros before "
        "the unordered pair sums.  Physical shape: within-label "
        "pair join for alignment (label-partitioned — the 100 TB "
        "posture samples per label), vec_id%4 subsample for the "
        "quadratic uniformity pairs, two single-row legs crossed "
        "(allowlisted q42 shape).",
    tags=("embeddings", "llmdata", "ml-stats"),
)
def q271(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    a = e.select(
        F.col("vec_id").alias("ida"), F.col("label").alias("la"),
        F.col("v").alias("va"),
    )
    b = e.select(
        F.col("vec_id").alias("idb"), F.col("label").alias("lb"),
        F.col("v").alias("vb"),
    )
    d2 = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, val: acc + val,
    )
    pos = (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("ida") < F.col("idb")))
        .select(F.round(d2 * 1e6).cast("bigint").alias("d2m"))
    )
    unif = (
        a.where(F.col("ida") % 4 == 0)
        .join(F.broadcast(b.where(F.col("idb") % 4 == 0)),
              F.col("ida") < F.col("idb"))
        .select(
            F.round(F.exp(F.lit(-2.0) * d2) * 1e12).cast("bigint").alias("em")
        )
    )
    pa = pos.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pos_pairs"),
        F.sum("d2m").cast("bigint").cast("double").alias("s_align"),
    )
    ua = unif.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_unif_pairs"),
        F.sum("em").cast("bigint").cast("double").alias("s_unif"),
    )
    # empty pair sets (or a kernel sum that integerizes to zero) must
    # yield NULL metrics, not an ANSI division error / ln(0)
    return pa.crossJoin(F.broadcast(ua)).select(
        "n_pos_pairs",
        pround(F.when(
                F.col("n_pos_pairs") > 0,
                F.col("s_align") / F.col("n_pos_pairs").cast("double") / F.lit(1e6),
            ), 6).alias("alignment"),
        "n_unif_pairs",
        pround(F.when(
                (F.col("n_unif_pairs") > 0) & (F.col("s_unif") > 0),
                F.log(
                    F.col("s_unif")
                    / F.col("n_unif_pairs").cast("double")
                    / F.lit(1e12)
                ),
            ), 6).alias("uniformity"),
    )


# ---------------------------------------------------------------------------
# q272: collocation extraction — bigram PMI with a frequency floor
# ---------------------------------------------------------------------------

@register(
    "q272_collocations_pmi",
    sql="""
    WITH tr AS (
      SELECT string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    trb AS (
      SELECT string_split(array_to_string(t[i:i+1], ' '), ' ')[1] AS w1,
             string_split(array_to_string(t[i:i+1], ' '), ' ')[2] AS w2
      FROM (SELECT t FROM tr WHERE len(t) >= 2),
           unnest(generate_series(1, len(t) - 1)) AS u(i)
    ),
    c2 AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
      FROM trb GROUP BY 1, 2
    ),
    uni AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c1
      FROM (SELECT unnest(t) AS tok FROM tr) WHERE tok <> '' GROUP BY 1
    ),
    tot AS (
      SELECT (SELECT CAST(SUM(c1) AS BIGINT) FROM uni) AS n_tok,
             CAST(COUNT(*) AS BIGINT) AS m_bi
      FROM trb
    )
    SELECT w1, w2, c2,
           CAST(round((ln(CAST(c2 AS DOUBLE) * CAST(n_tok AS DOUBLE)
                    * CAST(n_tok AS DOUBLE)
                    / (CAST(m_bi AS DOUBLE) * CAST(a.c1 AS DOUBLE)
                       * CAST(b.c1 AS DOUBLE)))) * 1e6) AS BIGINT) / 1e6 AS pmi
    FROM c2
    JOIN uni a ON a.tok = w1
    JOIN uni b ON b.tok = w2, tot
    WHERE c2 >= 5
    """,
    doc="Collocation extraction via bigram PMI with a frequency floor "
        "(Church & Hanks, 1990): pmi(w1,w2) = ln(P(w1w2)/(P(w1)P(w2)))"
        " over corpus-wide counts, reported for every bigram seen at "
        "least 5 times — the floor is what makes PMI usable (rare "
        "pairs otherwise dominate with inflated scores).  The "
        "multiword-expression miner for tokenizer pre-merges and "
        "index phrase dictionaries.  Exact integer counts; one ln on "
        "identical doubles per surviving bigram (q163 parity).  "
        "Physical shape: fan-out before gram building, bigram- and "
        "unigram-grain rollups joined at token grain (vocab unbounded "
        "— no broadcast pretence), the 2-scalar totals row broadcast "
        "(allowlisted q42 shape), output bounded by the c2 >= 5 "
        "survivors.",
    tags=("text", "documents", "llmdata", "collocations"),
)
def q272(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..partitioning import fan_out

    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    # <2-token docs contribute no bigrams — a pseudo-gram would make
    # split(bg)[1] an ANSI out-of-bounds crash (oracle filters
    # len(t) >= 2 symmetrically)
    idx = F.sequence(F.lit(1), F.size(toks) - 1)
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, 2))),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    trb = fan_out(docs).select(F.explode(grams).alias("bg")).select(
        F.split("bg", " ")[0].alias("w1"), F.split("bg", " ")[1].alias("w2")
    )
    c2 = trb.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
    uni = (
        fan_out(docs)
        .select(F.explode(toks).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    )
    tot = uni.agg(F.sum("c1").cast("bigint").alias("n_tok")).crossJoin(
        F.broadcast(trb.agg(F.count(F.lit(1)).cast("bigint").alias("m_bi")))
    )
    a = uni.select(F.col("tok").alias("w1"), F.col("c1").alias("c1a"))
    b = uni.select(F.col("tok").alias("w2"), F.col("c1").alias("c1b"))
    return (
        c2.where(F.col("c2") >= 5)
        .join(a, "w1")
        .join(b, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c2",
            pround(F.log(
                    F.col("c2").cast("double")
                    * F.col("n_tok").cast("double")
                    * F.col("n_tok").cast("double")
                    / (
                        F.col("m_bi").cast("double")
                        * F.col("c1a").cast("double")
                        * F.col("c1b").cast("double")
                    )
                ), 6).alias("pmi"),
        )
    )


# ---------------------------------------------------------------------------
# q273: cohort LTV curve (cumulative revenue per cohort customer by age)
# ---------------------------------------------------------------------------

@register(
    "q273_cohort_ltv",
    sql="""
    WITH o AS (
      SELECT o_custkey,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
             CAST(round(coalesce(o_totalprice, 0) * 100) AS BIGINT) AS cents
      FROM orders
    ),
    first_m AS (
      SELECT o_custkey, MIN(m) AS m0 FROM o GROUP BY 1
    ),
    sizes AS (
      SELECT m0, CAST(COUNT(*) AS BIGINT) AS cohort_size
      FROM first_m GROUP BY 1
    ),
    aged AS (
      SELECT f.m0,
             CAST((year(o.m) - year(f.m0)) * 12
                  + (month(o.m) - month(f.m0)) AS BIGINT) AS age,
             o.cents
      FROM o JOIN first_m f USING (o_custkey)
    ),
    rolled AS (
      SELECT m0, age,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(cents) AS BIGINT) AS rev_c
      FROM aged GROUP BY 1, 2
    )
    SELECT CAST(r.m0 AS VARCHAR) AS cohort, r.age, r.n_orders,
           CAST(round((CAST(r.rev_c AS DOUBLE) / 100) * 1e6) AS BIGINT) / 1e6 AS revenue,
           CAST(round((CAST(CAST(SUM(r.rev_c) OVER (PARTITION BY r.m0 ORDER BY r.age
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS DOUBLE)
                 / CAST(s.cohort_size AS DOUBLE) / 100) * 1e6) AS BIGINT) / 1e6 AS cum_ltv
    FROM rolled r JOIN sizes s USING (m0)
    """,
    doc="Cohort LTV curve: customers grouped by first-order month, "
        "revenue rolled up by cohort age in months, and the running "
        "cumulative revenue per cohort customer — the curve whose "
        "flattening point sets payback windows and CAC ceilings "
        "(complements q85's retention counts and q210's growth "
        "accounting with the MONEY view).  Month age is pure integer "
        "calendar arithmetic ((Δyear)*12 + Δmonth — months_between "
        "would hand back an engine-specific double).  Physical shape: "
        "one custkey-grain min (the cohort assignment), one "
        "(cohort, age) rollup, windows over the cohort-month frame, "
        "cohort sizes joined at cohort grain.",
    tags=("relational", "growth", "orders", "window"),
)
def q273(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("m"),
        _cents("o_totalprice").alias("cents"),
    )
    first_m = o.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    sizes = first_m.groupBy("m0").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    aged = o.join(first_m, "o_custkey").select(
        "m0",
        (
            (F.year("m") - F.year("m0")) * 12 + (F.month("m") - F.month("m0"))
        )
        .cast("bigint")
        .alias("age"),
        "cents",
    )
    rolled = aged.groupBy("m0", "age").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("rev_c"),
    )
    w = (
        Window.partitionBy("m0")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return rolled.join(sizes, "m0").select(
        F.col("m0").cast("string").alias("cohort"),
        "age",
        "n_orders",
        pround(F.col("rev_c").cast("double") / 100, 6).alias("revenue"),
        pround(F.sum("rev_c").over(w).cast("bigint").cast("double")
            / F.col("cohort_size").cast("double")
            / 100, 6).alias("cum_ltv"),
    )


# ---------------------------------------------------------------------------
# q274: exact 1-D Wasserstein distance (weekday vs weekend order values)
# ---------------------------------------------------------------------------

@register(
    "q274_wasserstein_1d",
    sql="""
    WITH o AS (
      SELECT CAST(round(coalesce(o_totalprice, 0) * 100) AS BIGINT) AS v,
             CASE WHEN isodow(o_orderdate) >= 6 THEN 1 ELSE 0 END AS wk
      FROM orders
    ),
    g AS (
      SELECT v,
             CAST(SUM(1 - wk) AS BIGINT) AS c1,
             CAST(SUM(wk) AS BIGINT) AS c2
      FROM o GROUP BY 1
    ),
    c AS (
      SELECT v,
             LEAD(v) OVER (ORDER BY v) AS v_next,
             CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS f1,
             CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS f2,
             CAST(SUM(c1) OVER () AS BIGINT) AS n1,
             CAST(SUM(c2) OVER () AS BIGINT) AS n2
      FROM g
    )
    SELECT CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
           CAST(round((CASE WHEN MAX(n1) > 0 AND MAX(n2) > 0 THEN
                 CAST(SUM(CAST(abs(f1 * CAST(n2 AS HUGEINT)
                                   - f2 * CAST(n1 AS HUGEINT))
                               * (v_next - v) AS DECIMAL(38,0)))
                      AS DOUBLE)
                 / (CAST(MAX(n1) AS DOUBLE) * CAST(MAX(n2) AS DOUBLE)) / 100
                 END) * 1e6) AS BIGINT) / 1e6 AS w1_distance
    FROM c WHERE v_next IS NOT NULL
    """,
    doc="Exact 1-D Wasserstein (earth mover's) distance between the "
        "weekday and weekend order-value distributions: W1 = integral "
        "of |F1 - F2| dv = sum over consecutive distinct values of "
        "the scaled CDF gap |f1*n2 - f2*n1| times the value gap — the "
        "full-shape drift metric that KS's single supremum (q267) "
        "misses; reported in dollars.  The integrand stays a 128-bit "
        "INTEGER (HUGEINT/DECIMAL) until the single final division, "
        "so the distance is exact to the cent-measure.  Same "
        "distinct-value-grain machinery as q267: one fact shuffle to "
        "value counts, cumulative + lead windows over the value "
        "frame, one single-row rollup.",
    tags=("stats", "orders", "distribution", "drift"),
)
def q274(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        _cents("o_totalprice").alias("v"),
        F.when(F.expr("weekday(o_orderdate)") + 1 >= 6, 1).otherwise(0).alias("wk"),
    )
    g = o.groupBy("v").agg(
        F.sum(1 - F.col("wk")).cast("bigint").alias("c1"),
        F.sum("wk").cast("bigint").alias("c2"),
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    c = g.select(
        "v",
        F.lead("v").over(Window.orderBy("v")).alias("v_next"),
        F.sum("c1").over(w_cum).cast("bigint").alias("f1"),
        F.sum("c2").over(w_cum).cast("bigint").alias("f2"),
        F.sum("c1").over(w_all).cast("bigint").alias("n1"),
        F.sum("c2").over(w_all).cast("bigint").alias("n2"),
    )
    term = (
        F.abs(
            F.col("f1").cast(_D18) * F.col("n2") - F.col("f2").cast(_D18) * F.col("n1")
        )
        * (F.col("v_next") - F.col("v"))
    ).cast(_D38)
    agg = c.where(F.col("v_next").isNotNull()).agg(
        F.max("n1").cast("bigint").alias("n1"),
        F.max("n2").cast("bigint").alias("n2"),
        F.sum(term).cast(_D38).alias("area"),
    )
    return agg.select(
        "n1",
        "n2",
        pround(F.when(
                (F.col("n1") > 0) & (F.col("n2") > 0),
                F.col("area").cast("double")
                / (F.col("n1").cast("double") * F.col("n2").cast("double"))
                / 100,
            ), 6).alias("w1_distance"),
    )


# ---------------------------------------------------------------------------
# q275: index of dispersion (overdispersion check) per event type
# ---------------------------------------------------------------------------

@register(
    "q275_dispersion_index",
    sql="""
    WITH d AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(COUNT(*) AS DOUBLE) AS nd,
             CAST(CAST(SUM(n) AS BIGINT) AS DOUBLE) AS s1,
             CAST(CAST(SUM(CAST(CAST(n AS DECIMAL(19,0))
                                * CAST(n AS DECIMAL(19,0))
                                AS DECIMAL(38,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS s2
      FROM d GROUP BY 1
    )
    SELECT event_type, n_days,
           CAST(round((s1 / nd) * 1e6) AS BIGINT) / 1e6 AS mean_daily,
           CAST(round((CASE WHEN n_days > 1 AND s1 > 0 THEN
                 ((s2 - s1 * s1 / nd) / (nd - 1.0)) / (s1 / nd) END) * 1e6) AS BIGINT) / 1e6 AS dispersion
    FROM s
    """,
    doc="Index of dispersion (variance-to-mean ratio of daily counts) "
        "per event type — the Poisson-ness check behind every count "
        "model: 1 = Poisson arrivals, >1 = overdispersed/bursty "
        "(negative-binomial territory), <1 = under-dispersed/regular; "
        "the per-type companion to q256's per-user CV.  Daily counts "
        "and their squares accumulate exactly (q78 discipline); one "
        "double expression per type, NULL-guarded for single-day or "
        "all-zero degenerates.  Physical shape: one (type, day) "
        "rollup, one type-grain rollup — both map-side combinable.",
    tags=("timeseries", "events", "stats"),
)
def q275(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    nd18 = F.col("n").cast(_D18)
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.sum("n").cast("bigint").cast("double").alias("s1"),
        F.sum((nd18 * nd18).cast(_D38)).cast(_D38).cast("double").alias("s2"),
    )
    return s.select(
        "event_type",
        "n_days",
        pround(F.col("s1") / F.col("nd"), 6).alias("mean_daily"),
        pround(F.when(
                (F.col("n_days") > 1) & (F.col("s1") > 0),
                (
                    (F.col("s2") - F.col("s1") * F.col("s1") / F.col("nd"))
                    / (F.col("nd") - F.lit(1.0))
                )
                / (F.col("s1") / F.col("nd")),
            ), 6).alias("dispersion"),
    )


# ---------------------------------------------------------------------------
# q276: Hill estimator of the order-value tail index
# ---------------------------------------------------------------------------

@register(
    "q276_hill_tail_index",
    sql="""
    WITH o AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v, o_orderkey
      FROM orders WHERE o_totalprice > 0
    ),
    r AS (
      SELECT v,
             ROW_NUMBER() OVER (ORDER BY v DESC, o_orderkey) AS rk,
             CAST(round(ln(CAST(v AS DOUBLE)) * 1e6) AS BIGINT) AS lv
      FROM o
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN rk <= 200 THEN lv END) AS BIGINT) AS s_top,
             CAST(MAX(CASE WHEN rk = 201 THEN lv END) AS BIGINT) AS l_ref,
             CAST(SUM(CASE WHEN rk <= 200 THEN 1 ELSE 0 END) AS BIGINT) AS k
      FROM r WHERE rk <= 201
    )
    SELECT k,
           CAST(round((CASE WHEN l_ref IS NOT NULL AND k > 0
                      AND CAST(s_top - k * l_ref AS DOUBLE) > 0 THEN
                 CAST(s_top - k * l_ref AS DOUBLE) / CAST(k AS DOUBLE) / 1e6
                 END) * 1e6) AS BIGINT) / 1e6 AS hill_h,
           CAST(round((CASE WHEN l_ref IS NOT NULL AND k > 0
                      AND CAST(s_top - k * l_ref AS DOUBLE) > 0 THEN
                 CAST(k AS DOUBLE) * 1e6 / CAST(s_top - k * l_ref AS DOUBLE)
                 END) * 1e6) AS BIGINT) / 1e6 AS alpha
    FROM s
    """,
    doc="Hill estimator of the order-value tail index over the top "
        "k = 200 order statistics: H = (1/k) * sum ln(x_i / x_(k+1)), "
        "alpha = 1/H — the standard heavy-tail diagnostic (alpha < 2 "
        "means infinite variance: sampling and capping policies must "
        "change).  Per-value ln scales to integer micros before the "
        "sum (q257 recipe), so H is one exact-integer expression "
        "divided once; ranks tie-break on orderkey.  Physical shape: "
        "at catalog runtime a single rank window; at 100 TB the "
        "two-phase top-k (partition-local top-201, then global rank "
        "among survivors — exact for the top block, q252's note) "
        "replaces the global sort.",
    tags=("stats", "orders", "distribution", "tail"),
)
def q276(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 0)
        .select(
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
            "o_orderkey",
        )
    )
    r = o.select(
        F.row_number()
        .over(Window.orderBy(F.col("v").desc(), "o_orderkey"))
        .alias("rk"),
        F.round(F.log(F.col("v").cast("double")) * 1e6).cast("bigint").alias("lv"),
    ).where(F.col("rk") <= 201)
    s = r.agg(
        F.sum(F.when(F.col("rk") <= 200, F.col("lv")))
        .cast("bigint")
        .alias("s_top"),
        F.max(F.when(F.col("rk") == 201, F.col("lv")))
        .cast("bigint")
        .alias("l_ref"),
        F.sum(F.when(F.col("rk") <= 200, 1).otherwise(0))
        .cast("bigint")
        .alias("k"),
    )
    num = (F.col("s_top") - F.col("k") * F.col("l_ref")).cast("double")
    ok = F.col("l_ref").isNotNull() & (F.col("k") > 0) & (num > 0)
    return s.select(
        "k",
        pround(F.when(ok, num / F.col("k").cast("double") / F.lit(1e6)), 6).alias("hill_h"),
        pround(F.when(ok, F.col("k").cast("double") * F.lit(1e6) / num), 6).alias("alpha"),
    )


# ---------------------------------------------------------------------------
# q277: assortment overlap between nations (Jaccard over supplied parts)
# ---------------------------------------------------------------------------

@register(
    "q277_nation_assortment_jaccard",
    sql="""
    WITH post AS (
      SELECT DISTINCT l_partkey AS pk, s_nationkey AS nk
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    ),
    sizes AS (
      SELECT nk, CAST(COUNT(*) AS BIGINT) AS sz FROM post GROUP BY 1
    ),
    inter AS (
      SELECT a.nk AS nk1, b.nk AS nk2, CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM post a JOIN post b ON a.pk = b.pk AND a.nk < b.nk
      GROUP BY 1, 2
    )
    SELECT na.n_name AS nation_a, nb.n_name AS nation_b,
           sa.sz AS size_a, sb.sz AS size_b, i.n_inter,
           CAST(round((CAST(i.n_inter AS DOUBLE)
                 / CAST(sa.sz + sb.sz - i.n_inter AS DOUBLE)) * 1e6) AS BIGINT) / 1e6 AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.nk = i.nk1
    JOIN sizes sb ON sb.nk = i.nk2
    JOIN nation na ON na.n_nationkey = i.nk1
    JOIN nation nb ON nb.n_nationkey = i.nk2
    """,
    doc="Assortment overlap between supplying nations: Jaccard "
        "similarity of each nation pair's supplied-part sets, via the "
        "POSTINGS pattern — distinct (part, nation) postings self-join "
        "on the part key, so intersection counting shuffles on the "
        "already-co-partitioned part key and only nation PAIRS (at "
        "most 300 rows) aggregate; the |A u B| denominator assembles "
        "from per-nation sizes, never from a union scan.  The same "
        "shape scales to arbitrary set-similarity matrices (the "
        "dedup family's q24 at dimension grain).  Exact integer "
        "counts, one division at output.  Only intersecting pairs "
        "report (Jaccard 0 pairs carry no information here).",
    tags=("relational", "lineitem", "supplier", "similarity"),
)
def q277(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    post = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .select(F.col("l_partkey").alias("pk"), F.col("s_nationkey").alias("nk"))
        .distinct()
    )
    a = post.select(F.col("pk"), F.col("nk").alias("nk1"))
    b = post.select(F.col("pk").alias("pkb"), F.col("nk").alias("nk2"))
    inter = (
        a.join(b, (F.col("pk") == F.col("pkb")) & (F.col("nk1") < F.col("nk2")))
        .groupBy("nk1", "nk2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    sizes = post.groupBy("nk").agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("nk").alias("nk1"), F.col("sz").alias("size_a"))),
            "nk1",
        )
        .join(
            F.broadcast(sizes.select(F.col("nk").alias("nk2"), F.col("sz").alias("size_b"))),
            "nk2",
        )
        .join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("nation_a"))),
            "nk1",
        )
        .join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("nation_b"))),
            "nk2",
        )
        .select(
            "nation_a",
            "nation_b",
            "size_a",
            "size_b",
            "n_inter",
            pround(F.col("n_inter").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("n_inter")).cast(
                    "double"
                ), 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# q278: bipartite degree assortativity of the supplier-part graph
# ---------------------------------------------------------------------------

@register(
    "q278_bipartite_assortativity",
    sql="""
    WITH e AS (
      SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ),
    ds AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS dsup FROM e GROUP BY 1),
    dp AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS dpart FROM e GROUP BY 1),
    j AS (
      SELECT dsup AS x, dpart AS y
      FROM e JOIN ds USING (s) JOIN dp USING (p)
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) AS sx,
             CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(CAST(x AS DECIMAL(19,0))
                                * CAST(x AS DECIMAL(19,0))
                                AS DECIMAL(38,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(CAST(y AS DECIMAL(19,0))
                                * CAST(y AS DECIMAL(19,0))
                                AS DECIMAL(38,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS syy,
             CAST(CAST(SUM(CAST(CAST(x AS DECIMAL(19,0))
                                * CAST(y AS DECIMAL(19,0))
                                AS DECIMAL(38,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS sxy
      FROM j
    )
    SELECT n_edges,
           CAST(round((CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0 THEN
                 (n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) END) * 1e6) AS BIGINT) / 1e6 AS assortativity
    FROM m
    """,
    doc="Bipartite degree assortativity of the supplier-part graph: "
        "the Pearson correlation, over EDGES, between the supplier's "
        "degree and the part's degree (Newman 2002 adapted to the "
        "bipartite case) — positive means hub suppliers stock hub "
        "parts (concentration risk), negative means hubs serve the "
        "long tail.  Degrees come from two rollups of the distinct "
        "edge set and join back on their own key families; the five "
        "correlation moments ride the exact-decimal discipline with "
        "one guarded double expression (q249's recipe).  Physical "
        "shape: one distinct-edge shuffle, two degree rollups, two "
        "same-key joins, a single-row rollup — no pairwise expansion "
        "anywhere.",
    tags=("graph", "lineitem", "stats"),
)
def q278(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    ds = e.groupBy("s").agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    dp = e.groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    j = e.join(ds, "s").join(dp, "p").select("x", "y")
    xd, yd = F.col("x").cast(_D18), F.col("y").cast(_D18)
    m = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("bigint").cast("double").alias("sx"),
        F.sum("y").cast("bigint").cast("double").alias("sy"),
        F.sum((xd * xd).cast(_D38)).cast(_D38).cast("double").alias("sxx"),
        F.sum((yd * yd).cast(_D38)).cast(_D38).cast("double").alias("syy"),
        F.sum((xd * yd).cast(_D38)).cast(_D38).cast("double").alias("sxy"),
    )
    var_prod = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) * (
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    )
    return m.select(
        "n_edges",
        pround(F.when(
                var_prod > 0,
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / F.sqrt(var_prod),
            ), 6).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# q279: A/B sample-ratio-mismatch (SRM) health check
# ---------------------------------------------------------------------------

@register(
    "q279_srm_check",
    sql="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    v AS (
      SELECT CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1
      FROM u
    )
    SELECT n0, n1,
           CAST(round((CASE WHEN n0 + n1 > 0 THEN
                 CAST(CAST(n0 - n1 AS DECIMAL(19,0))
                      * CAST(n0 - n1 AS DECIMAL(19,0)) AS DOUBLE)
                 / CAST(n0 + n1 AS DOUBLE) END) * 1e6) AS BIGINT) / 1e6 AS chi2,
           CASE WHEN n0 + n1 > 0 THEN
                CAST(CAST(n0 - n1 AS DECIMAL(19,0))
                     * CAST(n0 - n1 AS DECIMAL(19,0)) AS DOUBLE)
                / CAST(n0 + n1 AS DOUBLE) > 3.841 END AS srm_flag
    FROM v
    """,
    doc="Sample-ratio-mismatch check for the q248 experiment split: "
        "chi-square against the designed 50/50 allocation reduces to "
        "(n0-n1)^2/(n0+n1) for two equal-weight variants; crossing "
        "the 1-dof 95% critical value 3.841 flags a broken "
        "randomizer or a differentially-lossy logging path — the "
        "MANDATORY pre-read before trusting any A/B metric (Fabijan "
        "et al., KDD'19 diagnosis guide).  Unit grain matches the "
        "assignment grain (distinct users, not events — event-grain "
        "SRM tests are confounded by usage).  Exact integer counts, "
        "one guarded division.  Physical: one distinct-user rollup, "
        "one row out.",
    tags=("experimentation", "events", "quality"),
)
def q279(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = load(spark, sf_dir, "events").select("user_id").distinct()
    v = u.agg(
        F.sum(F.when(F.expr("user_id % 2") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n0"),
        F.sum(F.when(F.expr("user_id % 2") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
    )
    diff2 = (
        (F.col("n0") - F.col("n1")).cast(_D18)
        * (F.col("n0") - F.col("n1")).cast(_D18)
    ).cast("double")
    tot = (F.col("n0") + F.col("n1")).cast("double")
    chi2 = F.when(F.col("n0") + F.col("n1") > 0, diff2 / tot)
    return v.select(
        "n0",
        "n1",
        pround(chi2, 6).alias("chi2"),
        (chi2 > 3.841).alias("srm_flag"),
    )


# ---------------------------------------------------------------------------
# q280: capture-recapture (Chapman) active-population estimate
# ---------------------------------------------------------------------------

@register(
    "q280_capture_recapture",
    sql="""
    WITH flags AS (
      SELECT user_id,
             MAX(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
               AS in1,
             MAX(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
               AS in2
      FROM events GROUP BY 1
    )
    SELECT CAST(SUM(in1) AS BIGINT) AS n1,
           CAST(SUM(in2) AS BIGINT) AS n2,
           CAST(SUM(in1 * in2) AS BIGINT) AS m_both,
           CAST(round(((CAST(SUM(in1) AS DOUBLE) + 1.0)
                 * (CAST(SUM(in2) AS DOUBLE) + 1.0)
                 / (CAST(SUM(in1 * in2) AS DOUBLE) + 1.0) - 1.0) * 1e6) AS BIGINT) / 1e6 AS n_hat
    FROM flags
    """,
    doc="Capture-recapture estimate of the true active population "
        "from two observation windows (first vs second half of the "
        "event horizon): Chapman's bias-corrected Lincoln-Petersen "
        "N^ = (n1+1)(n2+1)/(m+1) - 1 — the ecology estimator that "
        "product analytics borrows to size the audience BEYOND what "
        "any single window observes (users the logs missed twice).  "
        "Chapman's +1s keep the estimator defined at zero overlap, so "
        "no division guard is needed.  Exact integer capture counts; "
        "one double expression.  Physical: one user-grain rollup with "
        "max-flags (never a self-join of the two windows), one row "
        "out.",
    tags=("experimentation", "events", "stats", "growth"),
)
def q280(spark: SparkSession, sf_dir: str) -> DataFrame:
    cut = F.lit("2024-01-16").cast("timestamp")
    flags = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("ts") < cut, 1).otherwise(0)).alias("in1"),
            F.max(F.when(F.col("ts") >= cut, 1).otherwise(0)).alias("in2"),
        )
    )
    return flags.agg(
        F.sum("in1").cast("bigint").alias("n1"),
        F.sum("in2").cast("bigint").alias("n2"),
        F.sum(F.col("in1") * F.col("in2")).cast("bigint").alias("m_both"),
    ).select(
        "n1",
        "n2",
        "m_both",
        pround((F.col("n1").cast("double") + F.lit(1.0))
            * (F.col("n2").cast("double") + F.lit(1.0))
            / (F.col("m_both").cast("double") + F.lit(1.0))
            - F.lit(1.0), 6).alias("n_hat"),
    )


# ---------------------------------------------------------------------------
# q281: one-way ANOVA F across market segments
# ---------------------------------------------------------------------------

@register(
    "q281_anova_oneway",
    sql="""
    WITH g AS (
      SELECT c_mktsegment AS seg,
             CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s_g,
             CAST(SUM(CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS HUGEINT)
                      * CAST(round(c_acctbal * 100) AS BIGINT))
                  AS DECIMAL(38,0)) AS ss_g
      FROM customer GROUP BY 1
    ),
    t AS (
      SELECT seg, n_g, s_g, ss_g,
             CAST(round(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
                        / CAST(n_g AS DOUBLE)) AS BIGINT) AS t_g
      FROM g
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(CAST(SUM(n_g) AS BIGINT) AS BIGINT) AS n,
             CAST(CAST(SUM(s_g) AS BIGINT) AS DOUBLE) AS s,
             CAST(CAST(SUM(ss_g) AS DECIMAL(38,0)) AS DOUBLE) AS ss,
             CAST(CAST(SUM(t_g) AS BIGINT) AS DOUBLE) AS a
      FROM t
    )
    SELECT k, n,
           CAST(round((CASE WHEN k > 1 AND n > k
                      AND (ss - a) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) > 0
                 THEN ((a - s * s / CAST(n AS DOUBLE))
                       / (CAST(k AS DOUBLE) - 1.0))
                      / ((ss - a) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
                 END) * 1e6) AS BIGINT) / 1e6 AS f_stat
    FROM m
    """,
    doc="One-way ANOVA F statistic for account balance across market "
        "segments: F = (SSB/(k-1)) / (SSW/(N-k)) with SSB = sum_g "
        "s_g^2/n_g - S^2/N and SSW = sum_g ss_g - sum_g s_g^2/n_g — "
        "the does-the-group-mean-differ omnibus test.  Cross-engine "
        "trick: the per-group term s_g^2/n_g is a DOUBLE but gets "
        "integerized with round() BEFORE the cross-group sum (the "
        "micros-ln recipe generalized), because an unordered SUM of "
        "raw doubles is partial-aggregation-order dependent; the "
        "sub-unit quantization error is identical in both engines.  "
        "Raw sums and sums of squares are exact "
        "(HUGEINT/DECIMAL(38,0) — balances squared exceed int64).  "
        "Physical: one segment rollup, one 5-row rollup, one row out.",
    tags=("stats", "customer", "anova"),
)
def q281(spark: SparkSession, sf_dir: str) -> DataFrame:
    bal = F.round(F.col("c_acctbal") * 100).cast("bigint")
    g = load(spark, sf_dir, "customer").groupBy(
        F.col("c_mktsegment").alias("seg")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum(bal).cast("bigint").alias("s_g"),
        F.sum((bal.cast(_D18) * bal.cast(_D18)).cast(_D38)).cast(_D38).alias("ss_g"),
    )
    t = g.select(
        "n_g",
        "s_g",
        "ss_g",
        F.round(
            F.col("s_g").cast("double")
            * F.col("s_g").cast("double")
            / F.col("n_g").cast("double")
        )
        .cast("bigint")
        .alias("t_g"),
    )
    m = t.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("bigint").cast("double").alias("s"),
        F.sum("ss_g").cast(_D38).cast("double").alias("ss"),
        F.sum("t_g").cast("bigint").cast("double").alias("a"),
    )
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    ssw_mean = (F.col("ss") - F.col("a")) / (nd - kd)
    # NESTED whens: the ssw_mean predicate itself divides by n-k, and
    # Spark's AND does not short-circuit — the count guards must
    # decide before that division is ever evaluated
    return m.select(
        "k",
        "n",
        pround(F.when(
                (F.col("k") > 1) & (F.col("n") > F.col("k")),
                F.when(
                    ssw_mean > 0,
                    (
                        (F.col("a") - F.col("s") * F.col("s") / nd)
                        / (kd - F.lit(1.0))
                    )
                    / ssw_mean,
                ),
            ), 6).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# q282: Wald-Wolfowitz runs test on daily revenue direction
# ---------------------------------------------------------------------------

@register(
    "q282_runs_test",
    sql="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(round(coalesce(o_totalprice, 0) * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    ),
    chg AS (
      SELECT day,
             CASE WHEN rev_c > LAG(rev_c) OVER (ORDER BY day) THEN 1
                  WHEN rev_c < LAG(rev_c) OVER (ORDER BY day) THEN -1 END AS s
      FROM daily
    ),
    runs AS (
      SELECT s,
             CASE WHEN LAG(s) OVER (ORDER BY day) IS NULL
                       OR s <> LAG(s) OVER (ORDER BY day)
                  THEN 1 ELSE 0 END AS new_run
      FROM (SELECT day, s FROM chg WHERE s IS NOT NULL)
    ),
    m AS (
      SELECT CAST(COALESCE(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_up,
             CAST(COALESCE(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_down,
             CAST(COALESCE(SUM(new_run), 0) AS BIGINT) AS n_runs
      FROM runs
    )
    SELECT n_up, n_down, n_runs,
           CAST(round((CASE WHEN n_up > 0 AND n_down > 0 AND n_up + n_down > 1
                      AND (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                           / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE)) + 1.0
                           - 1.0)
                          * (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                             / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                             + 1.0 - 2.0)
                          / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE) - 1.0)
                          > 0
                 THEN (CAST(n_runs AS DOUBLE)
                       - (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                          / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                          + 1.0))
                      / sqrt((2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                              / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                              + 1.0 - 1.0)
                             * (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                                / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                                + 1.0 - 2.0)
                             / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE)
                                - 1.0))
                 END) * 1e6) AS BIGINT) / 1e6 AS z_stat
    FROM m
    """,
    doc="Wald-Wolfowitz runs test on the daily revenue DIRECTION "
        "sequence (up/down, flats dropped): too few runs = momentum/"
        "trend, too many = mean-reversion/oscillation; z compares the "
        "observed run count to mu = 2*n1*n2/(n1+n2) + 1 with the "
        "classical variance (mu-1)(mu-2)/(n-1) — the nonparametric "
        "randomness check that complements q265's monotone-trend "
        "test.  Runs count via the lag-inequality flag summed (the "
        "gaps-and-islands counter), all exact integers; z is one "
        "guarded double expression written with the identical tree in "
        "both engines.  Physical: day-grain rollup, two stacked lag "
        "windows over the calendar frame, one row out.",
    tags=("timeseries", "orders", "stats"),
)
def q282(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day"))
        .agg(F.sum(_cents("o_totalprice")).cast("bigint").alias("rev_c"))
    )
    w = Window.orderBy("day")
    chg = daily.select(
        "day",
        F.when(F.col("rev_c") > F.lag("rev_c").over(w), 1)
        .when(F.col("rev_c") < F.lag("rev_c").over(w), -1)
        .alias("s"),
    ).where(F.col("s").isNotNull())
    runs = chg.select(
        "s",
        F.when(
            F.lag("s").over(w).isNull() | (F.col("s") != F.lag("s").over(w)), 1
        )
        .otherwise(0)
        .alias("new_run"),
    )
    # a flat series leaves ZERO direction rows: SUM over the empty
    # frame is NULL in both engines — coalesce to honest zero counts
    m = runs.agg(
        F.coalesce(F.sum(F.when(F.col("s") == 1, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("n_up"),
        F.coalesce(F.sum(F.when(F.col("s") == -1, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("n_down"),
        F.coalesce(F.sum("new_run"), F.lit(0)).cast("bigint").alias("n_runs"),
    )
    n1, n2 = F.col("n_up").cast("double"), F.col("n_down").cast("double")
    mu = F.lit(2.0) * n1 * n2 / (n1 + n2) + F.lit(1.0)
    var = (mu - F.lit(1.0)) * (mu - F.lit(2.0)) / (n1 + n2 - F.lit(1.0))
    # NESTED whens: mu/var divide by n1+n2 (0 on a flat series) and
    # Spark's AND does not short-circuit — count guards go first
    return m.select(
        "n_up",
        "n_down",
        "n_runs",
        pround(F.when(
                (F.col("n_up") > 0)
                & (F.col("n_down") > 0)
                & (F.col("n_up") + F.col("n_down") > 1),
                F.when(
                    var > 0,
                    (F.col("n_runs").cast("double") - mu) / F.sqrt(var),
                ),
            ), 6).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# q283: exact Kendall tau-b between daily revenue and daily order count
# ---------------------------------------------------------------------------

@register(
    "q283_kendall_tau_daily",
    sql="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(CAST(round(coalesce(o_totalprice, 0) * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT CAST(SUM(CASE WHEN (b.rev_c - a.rev_c) * (b.cnt - a.cnt) > 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN (b.rev_c - a.rev_c) * (b.cnt - a.cnt) < 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(SUM(CASE WHEN a.rev_c = b.rev_c
                           THEN 1 ELSE 0 END) AS BIGINT) AS tx,
             CAST(SUM(CASE WHEN a.cnt = b.cnt
                           THEN 1 ELSE 0 END) AS BIGINT) AS ty,
             CAST(COUNT(*) AS BIGINT) AS n0
      FROM daily a JOIN daily b ON b.day > a.day
    )
    SELECT n0, c AS concordant, d AS discordant,
           CAST(round((CASE WHEN (n0 - tx) * (n0 - ty) > 0 THEN
                 CAST(c - d AS DOUBLE)
                 / sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE)) END) * 1e6) AS BIGINT) / 1e6 AS tau_b
    FROM pairs
    """,
    doc="Exact Kendall tau-b between daily revenue and daily order "
        "count: concordant minus discordant pairs over the tie-"
        "corrected geometric mean — the rank-correlation estimator "
        "with a direct probabilistic reading (P(concordant) - "
        "P(discordant)) that q142's Spearman lacks; tau's O(n^2) pair "
        "space is why engines rarely ship it, and the CALENDAR bound "
        "makes it exact here (q265's trick: n = days, never facts; "
        "right side broadcast).  The tie adjustments are the standard "
        "tau-b terms: T_x counts pairs tied in x regardless of y and "
        "T_y vice versa (a pair tied in both enters both terms).  All "
        "integer counts; one guarded double.  Physical: day-grain "
        "rollup, one broadcast range pairing, one row out.",
    tags=("stats", "orders", "correlation", "timeseries"),
)
def q283(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum(_cents("o_totalprice")).cast("bigint").alias("rev_c"),
        )
    )
    b = daily.select(
        F.col("day").alias("bday"),
        F.col("cnt").alias("bcnt"),
        F.col("rev_c").alias("brev"),
    )
    prod = (F.col("brev") - F.col("rev_c")) * (F.col("bcnt") - F.col("cnt"))
    pairs = daily.join(F.broadcast(b), F.col("bday") > F.col("day")).agg(
        F.sum(F.when(prod > 0, 1).otherwise(0)).cast("bigint").alias("c"),
        F.sum(F.when(prod < 0, 1).otherwise(0)).cast("bigint").alias("d"),
        F.sum(F.when(F.col("rev_c") == F.col("brev"), 1).otherwise(0))
        .cast("bigint")
        .alias("tx"),
        F.sum(F.when(F.col("cnt") == F.col("bcnt"), 1).otherwise(0))
        .cast("bigint")
        .alias("ty"),
        F.count(F.lit(1)).cast("bigint").alias("n0"),
    )
    denom = (F.col("n0") - F.col("tx")).cast("double") * (
        F.col("n0") - F.col("ty")
    ).cast("double")
    return pairs.select(
        "n0",
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        pround(F.when(
                denom > 0,
                (F.col("c") - F.col("d")).cast("double") / F.sqrt(denom),
            ), 6).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# q284: quantile treatment effects (decile shift table) between variants
# ---------------------------------------------------------------------------

@register(
    "q284_quantile_treatment_effects",
    sql="""
    WITH e AS (
      SELECT user_id % 2 AS variant,
             CAST(round(coalesce(value, 0) * 100) AS BIGINT) AS v
      FROM events WHERE event_type = 'purchase'
    ),
    g AS (
      SELECT variant, v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM e GROUP BY 1, 2
    ),
    c AS (
      SELECT variant, v, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY variant ORDER BY v)
                  AS BIGINT) AS f,
             CAST(SUM(cnt) OVER (PARTITION BY variant) AS BIGINT) AS n
      FROM g
    ),
    targets AS (
      SELECT variant, d, CAST((d * n + 9) // 10 AS BIGINT) AS r
      FROM (SELECT DISTINCT variant, n FROM c),
           unnest(generate_series(1, 9)) AS u(d)
    ),
    q AS (
      SELECT t.variant, t.d AS decile, c.v AS qv
      FROM targets t JOIN c
        ON c.variant = t.variant AND c.f >= t.r AND c.f - c.cnt < t.r
    )
    SELECT decile,
           CAST(round((CAST(MIN(CASE WHEN variant = 0 THEN qv END) AS DOUBLE)
                 / 100) * 1e6) AS BIGINT) / 1e6 AS q_a,
           CAST(round((CAST(MIN(CASE WHEN variant = 1 THEN qv END) AS DOUBLE)
                 / 100) * 1e6) AS BIGINT) / 1e6 AS q_b,
           CAST(round((CAST(MIN(CASE WHEN variant = 1 THEN qv END)
                      - MIN(CASE WHEN variant = 0 THEN qv END) AS DOUBLE)
                 / 100) * 1e6) AS BIGINT) / 1e6 AS qte
    FROM q GROUP BY 1
    """,
    doc="Quantile treatment effects for the q248 experiment: at each "
        "decile (type-1 quantile, rank ceil(d*N/10) — an exact "
        "integer, so no interpolation ambiguity exists between "
        "engines), the purchase-value quantile per variant and their "
        "difference — the distribution-shift view that a mean lift "
        "hides (a treatment can move the p90 while leaving the median "
        "alone).  Quantile lookup is the distinct-value-grain trick "
        "again: cumulative counts per variant, and the target rank "
        "selects the unique value row with f_prev < r <= f via a "
        "broadcast HASH join on variant (18 target rows) with the "
        "rank range as a residual condition — no nested loop.  "
        "Physical: one (variant, value) rollup, cumulative windows "
        "per variant, a 9-row decile pivot.  NULL contract: if a "
        "variant has ZERO purchase rows its q_a/q_b (and qte) are NULL "
        "for every decile — the degenerate arm is signalled by NULLs, "
        "not an error; library reuse should pre-check arm counts if it "
        "needs a hard failure instead.",
    tags=("experimentation", "events", "distribution", "stats"),
)
def q284(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(F.expr("user_id % 2").alias("variant"), _cents("value").alias("v"))
    )
    g = e.groupBy("variant", "v").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    c = g.select(
        "variant",
        "v",
        "cnt",
        F.sum("cnt")
        .over(
            Window.partitionBy("variant")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .cast("bigint")
        .alias("f"),
        F.sum("cnt").over(Window.partitionBy("variant")).cast("bigint").alias("n"),
    )
    targets = (
        c.select("variant", "n")
        .distinct()
        .select(
            "variant",
            F.explode(F.sequence(F.lit(1), F.lit(9))).alias("d"),
            "n",
        )
        .select(
            "variant",
            "d",
            F.expr("div(d * n + 9, 10)").cast("bigint").alias("r"),
        )
    )
    q = c.alias("c").join(
        F.broadcast(targets.alias("t")),
        (F.col("c.variant") == F.col("t.variant"))
        & (F.col("c.f") >= F.col("t.r"))
        & (F.col("c.f") - F.col("c.cnt") < F.col("t.r")),
    ).select(F.col("t.variant").alias("variant"), F.col("t.d").alias("decile"),
             F.col("c.v").alias("qv"))
    qa = F.min(F.when(F.col("variant") == 0, F.col("qv")))
    qb = F.min(F.when(F.col("variant") == 1, F.col("qv")))
    return q.groupBy("decile").agg(
        pround(qa.cast("double") / 100, 6).alias("q_a"),
        pround(qb.cast("double") / 100, 6).alias("q_b"),
        pround((qb - qa).cast("double") / 100, 6).alias("qte"),
    )


# ---------------------------------------------------------------------------
# q285: dedup-cascade accounting (raw -> canonical -> bag-of-words)
# ---------------------------------------------------------------------------

@register(
    "q285_dedup_cascade_accounting",
    sql="""
    WITH keys AS (
      SELECT source,
             text AS k_raw,
             lower(trim(text)) AS k_canon,
             array_to_string(list_sort(string_split_regex(
               lower(trim(text)), '\\s+')), ' ') AS k_bow
      FROM documents
    ),
    flags AS (
      SELECT source,
             CASE WHEN COUNT(*) OVER (PARTITION BY k_raw) > 1
                  THEN 1 ELSE 0 END AS dup_raw,
             CASE WHEN COUNT(*) OVER (PARTITION BY k_canon) > 1
                  THEN 1 ELSE 0 END AS dup_canon,
             CASE WHEN COUNT(*) OVER (PARTITION BY k_bow) > 1
                  THEN 1 ELSE 0 END AS dup_bow
      FROM keys
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dup_raw) AS BIGINT) AS dup_raw,
           CAST(SUM(dup_canon) AS BIGINT) AS dup_canon,
           CAST(SUM(dup_bow) AS BIGINT) AS dup_bow,
           CAST(SUM(dup_canon - dup_raw) AS BIGINT) AS added_by_canon,
           CAST(SUM(dup_bow - dup_canon) AS BIGINT) AS added_by_bow
    FROM flags GROUP BY 1
    """,
    doc="Dedup-cascade accounting per source: how many documents each "
        "successive dedup key flags — exact raw text, canonical "
        "(lower+trim), and bag-of-words (sorted token multiset, which "
        "catches word-order shuffles) — and the INCREMENT each stage "
        "adds.  The stages are provably nested (raw-equal implies "
        "canon-equal implies bow-equal), so the increments are "
        "non-negative and tell the curation team what each "
        "normalization is worth BEFORE running it at scale.  "
        "Duplicate flags come from count-over-key windows (each an "
        "exact integer); sort order inside the bow key is the "
        "codepoint order both engines share on ASCII tokens.  "
        "Physical: three key-partitioned count windows over one scan, "
        "one source rollup.",
    tags=("llmdata", "documents", "dedup", "profiling"),
)
def q285(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    keys = load(spark, sf_dir, "documents").select(
        "source",
        F.col("text").alias("k_raw"),
        F.lower(F.trim(F.col("text"))).alias("k_canon"),
        F.array_join(F.array_sort(toks), " ").alias("k_bow"),
    )
    def dup(col: str) -> F.Column:
        return F.when(
            F.count(F.lit(1)).over(Window.partitionBy(col)) > 1, 1
        ).otherwise(0)

    flags = keys.select(
        "source",
        dup("k_raw").alias("dup_raw"),
        dup("k_canon").alias("dup_canon"),
        dup("k_bow").alias("dup_bow"),
    )
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dup_raw").cast("bigint").alias("dup_raw"),
        F.sum("dup_canon").cast("bigint").alias("dup_canon"),
        F.sum("dup_bow").cast("bigint").alias("dup_bow"),
        F.sum(F.col("dup_canon") - F.col("dup_raw"))
        .cast("bigint")
        .alias("added_by_canon"),
        F.sum(F.col("dup_bow") - F.col("dup_canon"))
        .cast("bigint")
        .alias("added_by_bow"),
    )


# ---------------------------------------------------------------------------
# q286: dead-stock report (catalog items never ordered, by brand)
# ---------------------------------------------------------------------------

@register(
    "q286_dead_stock_report",
    sql="""
    WITH ordered_parts AS (
      SELECT DISTINCT l_partkey FROM lineitem
    ),
    flags AS (
      SELECT p_brand AS brand,
             CASE WHEN o.l_partkey IS NULL THEN 1 ELSE 0 END AS dead
      FROM part LEFT JOIN ordered_parts o ON p_partkey = o.l_partkey
    )
    SELECT brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(dead) AS BIGINT) AS n_dead,
           CAST(round((CAST(SUM(dead) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) * 1e6) AS BIGINT) / 1e6
             AS dead_share
    FROM flags GROUP BY 1
    """,
    doc="Dead-stock report: per brand, how many catalog parts have "
        "NEVER appeared on an order line — the assortment-hygiene "
        "metric behind delisting decisions.  The never-ordered set is "
        "an anti-join shape expressed as LEFT JOIN + null flag so the "
        "kept/total counts ride ONE aggregation (a pure anti-join "
        "would need a second scan for the denominators).  The "
        "distinct-partkey reduction collapses the fact table before "
        "the join, so the join is catalog-vs-catalog sized.  Exact "
        "counts, one division.",
    tags=("relational", "part", "lineitem", "audit"),
)
def q286(spark: SparkSession, sf_dir: str) -> DataFrame:
    ordered = load(spark, sf_dir, "lineitem").select("l_partkey").distinct()
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    flags = part.join(
        ordered, part["p_partkey"] == ordered["l_partkey"], "left"
    ).select(
        F.col("p_brand").alias("brand"),
        F.when(F.col("l_partkey").isNull(), 1).otherwise(0).alias("dead"),
    )
    return flags.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("dead").cast("bigint").alias("n_dead"),
        pround(F.sum("dead").cast("double") / F.count(F.lit(1)).cast("double"), 6).alias("dead_share"),
    )


# ---------------------------------------------------------------------------
# q287: customer dormancy gaps (longest silence + current recency)
# ---------------------------------------------------------------------------

@register(
    "q287_dormancy_gaps",
    sql="""
    WITH o AS (
      SELECT o_custkey, CAST(date_trunc('day', o_orderdate) AS DATE) AS d
      FROM orders
    ),
    horizon AS (SELECT MAX(d) AS dmax FROM o),
    gaps AS (
      SELECT o_custkey,
             date_diff('day', LAG(d) OVER (PARTITION BY o_custkey ORDER BY d),
                       d) AS gap_days,
             d
      FROM o
    ),
    per_cust AS (
      SELECT o_custkey AS custkey,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(MAX(gap_days) AS BIGINT) AS max_gap_days,
             MAX(d) AS last_day
      FROM gaps GROUP BY 1
    )
    SELECT custkey, n_orders, max_gap_days,
           CAST(date_diff('day', last_day, dmax) AS BIGINT) AS recency_days,
           CAST(date_diff('day', last_day, dmax) > COALESCE(max_gap_days, 0)
                AS BOOLEAN) AS dormant_anomaly
    FROM per_cust CROSS JOIN horizon
    """,
    doc="Customer dormancy profile: each customer's LONGEST historical "
        "silence between orders, their current recency against the "
        "corpus horizon, and the churn-risk flag 'currently quieter "
        "than they have ever been' (recency exceeding the personal "
        "max gap) — the per-customer baseline that beats any global "
        "recency cutoff because regulars and occasionals get their "
        "own yardstick.  Single-order customers have NULL max gap and "
        "COALESCE(…, 0) makes any positive recency anomalous for "
        "them, documented here.  Date arithmetic is pure integer "
        "days.  Physical: one custkey lag window + rollup on the same "
        "key family, horizon broadcast as a single-row aggregate "
        "(allowlisted q42 shape).",
    tags=("relational", "orders", "crm", "window"),
)
def q287(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("d"),
    )
    horizon = o.agg(F.max("d").alias("dmax"))
    gaps = o.select(
        "o_custkey",
        F.expr("datediff(d, lag(d) OVER (PARTITION BY o_custkey ORDER BY d))")
        .alias("gap_days"),
        "d",
    )
    per_cust = gaps.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.max("gap_days").cast("bigint").alias("max_gap_days"),
        F.max("d").alias("last_day"),
    )
    return per_cust.crossJoin(F.broadcast(horizon)).select(
        "custkey",
        "n_orders",
        "max_gap_days",
        F.expr("datediff(dmax, last_day)").cast("bigint").alias("recency_days"),
        (
            F.expr("datediff(dmax, last_day)")
            > F.coalesce(F.col("max_gap_days"), F.lit(0))
        ).alias("dormant_anomaly"),
    )


# ---------------------------------------------------------------------------
# q288: ABC inventory classification by cumulative revenue share
# ---------------------------------------------------------------------------

@register(
    "q288_abc_classification",
    sql="""
    WITH per_part AS (
      SELECT l_partkey,
             CAST(SUM(CAST(round(coalesce(l_extendedprice, 0) * 100)
                           AS BIGINT)) AS BIGINT) AS rev_c
      FROM lineitem GROUP BY 1
    ),
    c AS (
      SELECT l_partkey, rev_c,
             CAST(SUM(rev_c) OVER (ORDER BY rev_c DESC, l_partkey)
                  AS BIGINT) AS cum_c,
             CAST(SUM(rev_c) OVER () AS BIGINT) AS tot_c
      FROM per_part
    ),
    cls AS (
      SELECT CASE WHEN cum_c * 100 <= tot_c * 80 THEN 'A'
                  WHEN cum_c * 100 <= tot_c * 95 THEN 'B'
                  ELSE 'C' END AS abc_class,
             rev_c
      FROM c
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(round((CAST(CAST(SUM(rev_c) AS BIGINT) AS DOUBLE) / 100) * 1e6) AS BIGINT) / 1e6
             AS revenue,
           CAST(round((CAST(CAST(SUM(rev_c) AS BIGINT) AS DOUBLE)
                 / CAST((SELECT CAST(SUM(rev_c) AS BIGINT) FROM per_part)
                        AS DOUBLE)) * 1e9) AS BIGINT) / 1e9 AS revenue_share
    FROM cls GROUP BY 1
    """,
    doc="ABC inventory classification: parts ranked by revenue, class "
        "A = the prefix holding the first 80% of cumulative revenue, "
        "B = to 95%, C = the tail — the Pareto working-capital "
        "policy split (count vs cash inversion: A is few parts, most "
        "money).  The class boundary test cum*100 <= tot*80 is PURE "
        "INTEGER arithmetic (cum_c*100 stays far under 2^63 at any "
        "realistic revenue) — a double share comparison would put "
        "boundary parts in different classes across engines.  "
        "Deterministic rank tiebreak on partkey.  Physical: one "
        "part-grain rollup, a catalog-grain cumulative window (q252's "
        "documented posture), a 3-row rollup.",
    tags=("relational", "lineitem", "pareto", "window"),
)
def q288(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_part = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum(_cents("l_extendedprice")).cast("bigint").alias("rev_c"))
    )
    w_cum = Window.orderBy(F.col("rev_c").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    c = per_part.select(
        "rev_c",
        F.sum("rev_c").over(w_cum).cast("bigint").alias("cum_c"),
        F.sum("rev_c").over(w_all).cast("bigint").alias("tot_c"),
    )
    cls = c.select(
        F.when(F.col("cum_c") * 100 <= F.col("tot_c") * 80, "A")
        .when(F.col("cum_c") * 100 <= F.col("tot_c") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "rev_c",
        "tot_c",
    )
    return cls.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        pround(F.sum("rev_c").cast("bigint").cast("double") / 100, 6).alias(
            "revenue"
        ),
        pround(F.sum("rev_c").cast("bigint").cast("double")
            / F.max("tot_c").cast("double"), 9).alias("revenue_share"),
    )
