"""Round-10 catalog entries, second wing (q372-q377): storage-layout and
sampling advisors plus causal/survival depth.

- q372 column-encoding advisor: per-column run/distinct/sortedness
  census over lineitem in storage order (shard-local lag, merged by
  addition — no global sort), recommending the Parquet encoding
  (dictionary / RLE / delta / plain) a 100 TB layout job would pick.
- q373 regression discontinuity: local-linear fit on each side of a
  price cutoff, closed-form from integer-cents sums (the q330/q344
  decimal-before-squaring discipline), effect = intercept jump.
- q374 log-rank test: two-group survival (signup -> first purchase,
  day grain, censored at corpus horizon) via the hypergeometric
  O-E/variance increments, accumulated in exact fixed-point integers.
- q375 Neyman allocation: stratified-sampling advisor — per-stratum
  sd from exact integer moments, weights N_h*S_h fixed-pointed, then
  the q159 largest-remainder integerization (sums to the budget
  exactly, no floats in the apportionment).
- q376 target-leakage audit: chi-square / Cramer's V between candidate
  feature columns and a label, every cell contribution an exact
  integer ratio (micro fixed-point) so the flag is engine-identical.
- q377 SLO burn-rate advisor: multi-window (1/6/24/72 h) error-budget
  burn from ONE conditional-aggregation pass, with the SRE paired
  fast/slow-window page rule on integer comparisons only.

Shared numeric discipline (see round9/round10 modules): cross-row
accumulation on exact integers (BIGINT / DECIMAL(38,0) Spark-side,
BIGINT / HUGEINT DuckDB-side) only; fractional outputs via one
round-to-integer + exact divide (numerics.pround) or a deterministic
scalar double expression tree written identically in both engines;
zero denominators CASE-guarded in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .catalog import emit, load, pround, register

# ---------------------------------------------------------------------------
# q372: column-encoding advisor (dictionary / RLE / delta / plain)
# ---------------------------------------------------------------------------

_Q372_SHARD = 4096  # orderkeys per shard — contiguous ranges keep storage order

_Q372_COLS = (
    "l_orderkey",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
    "l_quantity",
    "l_suppkey",
)


def _q372_sql() -> str:
    lags = ",\n             ".join(
        f"lag({c}) OVER w AS p_{i}" for i, c in enumerate(_Q372_COLS)
    )
    aggs = []
    for i, c in enumerate(_Q372_COLS):
        aggs.append(
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS d_{i},\n"
            f"         CAST(SUM(CASE WHEN p_{i} IS NULL OR {c} <> p_{i}"
            f" THEN 1 ELSE 0 END) AS BIGINT) AS r_{i},\n"
            f"         CAST(SUM(CASE WHEN p_{i} IS NOT NULL AND {c} >= p_{i}"
            f" THEN 1 ELSE 0 END) AS BIGINT) AS a_{i}"
        )
    branches = []
    for i, c in enumerate(_Q372_COLS):
        branches.append(
            f"""
      SELECT '{c}' AS col_name, n AS n_rows, d_{i} AS n_distinct,
             r_{i} AS runs, a_{i} AS asc_pairs, n - starts AS pairs,
             CASE WHEN d_{i} * 50 <= n THEN 'dictionary'
                  WHEN r_{i} * 10 <= n THEN 'rle'
                  WHEN a_{i} * 20 >= (n - starts) * 19 THEN 'delta'
                  ELSE 'plain' END AS encoding
      FROM agg"""
        )
    agg_block = ",\n         ".join(aggs)
    union_block = " UNION ALL ".join(branches)
    return f"""
    WITH ordered AS (
      SELECT {', '.join(_Q372_COLS)},
             {lags}
      FROM lineitem
      WINDOW w AS (PARTITION BY l_orderkey // {_Q372_SHARD}
                   ORDER BY l_orderkey, l_linenumber, l_shipdate,
                            l_quantity, l_suppkey, l_returnflag,
                            l_linestatus)
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN p_0 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS starts,
         {agg_block}
      FROM ordered
    )
    SELECT col_name, n_rows, n_distinct, runs, asc_pairs, pairs, encoding
    FROM ({union_block})
    ORDER BY col_name
    """


@register(
    "q372_column_encoding_advisor",
    sql=_q372_sql(),
    doc="Storage-layout advisor: for each lineitem column, a census of "
        "the three statistics Parquet's encoding chooser needs — exact "
        "distinct count (dictionary candidacy), run count in storage "
        "order (RLE candidacy), and adjacent non-descending fraction "
        "(delta candidacy) — then the recommendation by integer-only "
        "thresholds (dict if 50*distinct<=n, RLE if 10*runs<=n, delta "
        "if >=95% ascending adjacents).  Storage order is shard-local: "
        "runs are counted inside contiguous orderkey-range shards "
        "(lag over PARTITION BY orderkey div 4096) and merged by "
        "ADDITION, so no global sort exists at any scale — the "
        "boundary undercount is <= #shards, identical in both engines "
        "because the shard rule is part of the spec.  One window pass "
        "computes all six lag columns (one shuffle+sort), one "
        "aggregate produces every statistic; the 6-row report is "
        "projections of that single-row frame (no join).  At 100 TB "
        "the exact COUNT(DISTINCT)s would downgrade to "
        "approx_count_distinct — the decision thresholds are "
        "order-of-magnitude, not exact-sensitive.",
    tags=("lineitem", "ops-advisor", "storage", "window"),
)
def q372(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is not unique in the synthetic data, so
    # the remaining census columns join the sort key — any rows still
    # tied are full duplicates, for which order cannot change any lag
    # comparison, keeping the run/ascent counts engine-identical.
    w = (
        Window.partitionBy(F.expr(f"l_orderkey div {_Q372_SHARD}"))
        .orderBy(
            "l_orderkey",
            "l_linenumber",
            "l_shipdate",
            "l_quantity",
            "l_suppkey",
            "l_returnflag",
            "l_linestatus",
        )
    )
    ordered = li.select(
        *_Q372_COLS,
        *[F.lag(c).over(w).alias(f"p_{i}") for i, c in enumerate(_Q372_COLS)],
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("p_0").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("starts"),
    ]
    for i, c in enumerate(_Q372_COLS):
        p = F.col(f"p_{i}")
        aggs.append(F.countDistinct(c).cast("bigint").alias(f"d_{i}"))
        aggs.append(
            F.sum(F.when(p.isNull() | (F.col(c) != p), 1).otherwise(0))
            .cast("bigint")
            .alias(f"r_{i}")
        )
        aggs.append(
            F.sum(F.when(p.isNotNull() & (F.col(c) >= p), 1).otherwise(0))
            .cast("bigint")
            .alias(f"a_{i}")
        )
    # ONE-row census frame, pinned: the six per-column report rows below
    # each project from it, and without the pin every union branch
    # re-ran the whole window + aggregate subtree — the r10 plan audit
    # showed 6x (Scan -> Exchange -> Sort -> Window -> 2-level
    # HashAggregate), 18 Exchanges for one logical pass.  localCheckpoint
    # materializes the single row once; the ContextCleaner drains it
    # when the result drops (PERSIST_PRONE covers this query).
    agg = ordered.agg(*aggs).localCheckpoint(eager=True)
    n, starts = F.col("n"), F.col("starts")
    parts = []
    for i, c in enumerate(_Q372_COLS):
        d, r, a = F.col(f"d_{i}"), F.col(f"r_{i}"), F.col(f"a_{i}")
        parts.append(
            agg.select(
                F.lit(c).alias("col_name"),
                n.alias("n_rows"),
                d.alias("n_distinct"),
                r.alias("runs"),
                a.alias("asc_pairs"),
                (n - starts).alias("pairs"),
                F.when(d * 50 <= n, "dictionary")
                .when(r * 10 <= n, "rle")
                .when(a * 20 >= (n - starts) * 19, "delta")
                .otherwise("plain")
                .alias("encoding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("col_name")


# ---------------------------------------------------------------------------
# q373: regression discontinuity at a price cutoff
# ---------------------------------------------------------------------------

_Q373_CUT = 15_000_000  # cutoff in cents ($150k)
_Q373_BW = 5_000_000  # bandwidth in cents ($50k)


@register(
    "q373_regression_discontinuity",
    sql=f"""
    WITH f AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               - {_Q373_CUT} AS x,
             CASE WHEN o_orderpriority LIKE '1-%'
                    OR o_orderpriority LIKE '2-%'
                  THEN 1 ELSE 0 END AS y
      FROM orders
      WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            BETWEEN {_Q373_CUT - _Q373_BW} AND {_Q373_CUT + _Q373_BW}
    ),
    s AS (
      SELECT
        CAST(SUM(CASE WHEN x < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_l,
        CAST(SUM(CASE WHEN x >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
        CAST(SUM(CASE WHEN x < 0 THEN x ELSE 0 END) AS BIGINT) AS sx_l,
        CAST(SUM(CASE WHEN x >= 0 THEN x ELSE 0 END) AS BIGINT) AS sx_r,
        CAST(SUM(CASE WHEN x < 0 THEN y ELSE 0 END) AS BIGINT) AS sy_l,
        CAST(SUM(CASE WHEN x >= 0 THEN y ELSE 0 END) AS BIGINT) AS sy_r,
        SUM(CASE WHEN x < 0
                 THEN CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))
                 ELSE 0 END) AS sxx_l,
        SUM(CASE WHEN x >= 0
                 THEN CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))
                 ELSE 0 END) AS sxx_r,
        CAST(SUM(CASE WHEN x < 0 THEN x * y ELSE 0 END) AS BIGINT) AS sxy_l,
        CAST(SUM(CASE WHEN x >= 0 THEN x * y ELSE 0 END) AS BIGINT) AS sxy_r
      FROM f
    ),
    fit AS (
      SELECT n_l, n_r, sy_l, sy_r,
        CAST(n_l AS DOUBLE) * CAST(sxx_l AS DOUBLE)
          - CAST(sx_l AS DOUBLE) * CAST(sx_l AS DOUBLE) AS den_l,
        CAST(n_r AS DOUBLE) * CAST(sxx_r AS DOUBLE)
          - CAST(sx_r AS DOUBLE) * CAST(sx_r AS DOUBLE) AS den_r,
        CAST(n_l AS DOUBLE) * CAST(sxy_l AS DOUBLE)
          - CAST(sx_l AS DOUBLE) * CAST(sy_l AS DOUBLE) AS slnum_l,
        CAST(n_r AS DOUBLE) * CAST(sxy_r AS DOUBLE)
          - CAST(sx_r AS DOUBLE) * CAST(sy_r AS DOUBLE) AS slnum_r,
        CAST(sy_l AS DOUBLE) * CAST(sxx_l AS DOUBLE)
          - CAST(sx_l AS DOUBLE) * CAST(sxy_l AS DOUBLE) AS icnum_l,
        CAST(sy_r AS DOUBLE) * CAST(sxx_r AS DOUBLE)
          - CAST(sx_r AS DOUBLE) * CAST(sxy_r AS DOUBLE) AS icnum_r
      FROM s
    )
    SELECT n_l AS n_left, n_r AS n_right,
      CASE WHEN n_l > 0 THEN
        CAST(CAST(round(CAST(sy_l AS DOUBLE) / n_l * 1e6) AS BIGINT)
             AS DOUBLE) / 1e6 END AS urgent_share_left,
      CASE WHEN n_r > 0 THEN
        CAST(CAST(round(CAST(sy_r AS DOUBLE) / n_r * 1e6) AS BIGINT)
             AS DOUBLE) / 1e6 END AS urgent_share_right,
      CASE WHEN den_l > 0 THEN
        CAST(CAST(round(slnum_l / den_l * 100000 * 1e8) AS BIGINT)
             AS DOUBLE) / 1e8 END AS slope_left_per_k,
      CASE WHEN den_r > 0 THEN
        CAST(CAST(round(slnum_r / den_r * 100000 * 1e8) AS BIGINT)
             AS DOUBLE) / 1e8 END AS slope_right_per_k,
      CASE WHEN den_l > 0 THEN
        CAST(CAST(round(icnum_l / den_l * 1e6) AS BIGINT)
             AS DOUBLE) / 1e6 END AS y_left_at_cutoff,
      CASE WHEN den_r > 0 THEN
        CAST(CAST(round(icnum_r / den_r * 1e6) AS BIGINT)
             AS DOUBLE) / 1e6 END AS y_right_at_cutoff,
      CASE WHEN den_l > 0 AND den_r > 0 THEN
        CAST(CAST(round((icnum_r / den_r - icnum_l / den_l) * 1e6) AS BIGINT)
             AS DOUBLE) / 1e6 END AS rd_effect
    FROM fit
    """,
    doc="Sharp regression discontinuity: does crossing the $150k "
        "order-total cutoff jump the urgent-priority share?  Local "
        "linear fit on each side of the cutoff within a $50k "
        "bandwidth, closed-form from five integer sums per side "
        "(n, Sx, Sy, Sxy BIGINT cents; Sxx in DECIMAL(38,0) via the "
        "q330 decimal-before-squaring discipline), so ONE conditional "
        "aggregation pass over the banded scan produces the whole "
        "estimator — no join, no second scan, and the band predicate "
        "pushes to the parquet scan.  The final intercepts/slopes are "
        "fixed scalar double expression trees written identically in "
        "both engines (deterministic: no cross-row float "
        "accumulation), emitted through pround.  rd_effect = "
        "y(right, cutoff) - y(left, cutoff).",
    tags=("orders", "causal", "regression"),
)
def q373(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    f = (
        load(spark, sf_dir, "orders")
        .where(
            cents.between(_Q373_CUT - _Q373_BW, _Q373_CUT + _Q373_BW)
        )
        .select(
            (cents - _Q373_CUT).alias("x"),
            F.when(
                F.col("o_orderpriority").like("1-%")
                | F.col("o_orderpriority").like("2-%"),
                1,
            )
            .otherwise(0)
            .alias("y"),
        )
    )
    left, right = F.col("x") < 0, F.col("x") >= 0
    xd = F.col("x").cast("decimal(38,0)")
    zero_d = F.lit(0).cast("decimal(38,0)")
    s = f.agg(
        F.sum(F.when(left, 1).otherwise(0)).cast("bigint").alias("n_l"),
        F.sum(F.when(right, 1).otherwise(0)).cast("bigint").alias("n_r"),
        F.sum(F.when(left, F.col("x")).otherwise(0)).cast("bigint").alias("sx_l"),
        F.sum(F.when(right, F.col("x")).otherwise(0)).cast("bigint").alias("sx_r"),
        F.sum(F.when(left, F.col("y")).otherwise(0)).cast("bigint").alias("sy_l"),
        F.sum(F.when(right, F.col("y")).otherwise(0)).cast("bigint").alias("sy_r"),
        F.sum(F.when(left, xd * xd).otherwise(zero_d)).alias("sxx_l"),
        F.sum(F.when(right, xd * xd).otherwise(zero_d)).alias("sxx_r"),
        F.sum(F.when(left, F.col("x") * F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("sxy_l"),
        F.sum(F.when(right, F.col("x") * F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("sxy_r"),
    )

    def dbl(c: str) -> F.Column:
        return F.col(c).cast("double")

    fit = s.select(
        "n_l",
        "n_r",
        "sy_l",
        "sy_r",
        (dbl("n_l") * dbl("sxx_l") - dbl("sx_l") * dbl("sx_l")).alias("den_l"),
        (dbl("n_r") * dbl("sxx_r") - dbl("sx_r") * dbl("sx_r")).alias("den_r"),
        (dbl("n_l") * dbl("sxy_l") - dbl("sx_l") * dbl("sy_l")).alias("slnum_l"),
        (dbl("n_r") * dbl("sxy_r") - dbl("sx_r") * dbl("sy_r")).alias("slnum_r"),
        (dbl("sy_l") * dbl("sxx_l") - dbl("sx_l") * dbl("sxy_l")).alias("icnum_l"),
        (dbl("sy_r") * dbl("sxx_r") - dbl("sx_r") * dbl("sxy_r")).alias("icnum_r"),
    )
    den_l, den_r = F.col("den_l") > 0, F.col("den_r") > 0
    return fit.select(
        F.col("n_l").alias("n_left"),
        F.col("n_r").alias("n_right"),
        F.when(F.col("n_l") > 0, pround(dbl("sy_l") / F.col("n_l"), 6)).alias(
            "urgent_share_left"
        ),
        F.when(F.col("n_r") > 0, pround(dbl("sy_r") / F.col("n_r"), 6)).alias(
            "urgent_share_right"
        ),
        F.when(den_l, pround(F.col("slnum_l") / F.col("den_l") * 100000, 8)).alias(
            "slope_left_per_k"
        ),
        F.when(den_r, pround(F.col("slnum_r") / F.col("den_r") * 100000, 8)).alias(
            "slope_right_per_k"
        ),
        F.when(den_l, pround(F.col("icnum_l") / F.col("den_l"), 6)).alias(
            "y_left_at_cutoff"
        ),
        F.when(den_r, pround(F.col("icnum_r") / F.col("den_r"), 6)).alias(
            "y_right_at_cutoff"
        ),
        F.when(
            den_l & den_r,
            pround(
                F.col("icnum_r") / F.col("den_r")
                - F.col("icnum_l") / F.col("den_l"),
                6,
            ),
        ).alias("rd_effect"),
    )


# ---------------------------------------------------------------------------
# q374: two-group log-rank survival test (signup -> first purchase)
# ---------------------------------------------------------------------------


@register(
    "q374_logrank_test",
    sql="""
    WITH u AS (
      SELECT user_id % 2 AS g, MIN(ts) AS t0,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
             MAX(ts) AS tmax
      FROM events GROUP BY user_id
    ),
    u2 AS (
      SELECT g,
             CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev,
             CASE WHEN tp IS NOT NULL
                  THEN date_diff('day', CAST(t0 AS DATE), CAST(tp AS DATE))
                  ELSE date_diff('day', CAST(t0 AS DATE),
                                 CAST(MAX(tmax) OVER () AS DATE)) END AS t
      FROM u
    ),
    day AS (
      SELECT t,
             CAST(SUM(CASE WHEN ev = 1 AND g = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d1,
             CAST(SUM(ev) AS BIGINT) AS d,
             CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS rem1,
             CAST(COUNT(*) AS BIGINT) AS rem
      FROM u2 GROUP BY t
    ),
    risk AS (
      SELECT t, d1, d,
             CAST(SUM(rem1) OVER () AS BIGINT) AS totu1,
             CAST(SUM(rem) OVER () AS BIGINT) AS totu,
             CAST(SUM(rem1) OVER ()
                  - COALESCE(SUM(rem1) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n1,
             CAST(SUM(rem) OVER ()
                  - COALESCE(SUM(rem) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n
      FROM day
    ),
    terms AS (
      SELECT d1, d, n1, n, totu1, totu,
             (d * n1 * 1000000) // n AS e1m,
             CASE WHEN n > 1 THEN CAST(
               (CAST(d AS HUGEINT) * CAST(n1 AS HUGEINT)
                * CAST(n - n1 AS HUGEINT) * CAST(n - d AS HUGEINT)
                * 1000000)
               // (CAST(n AS HUGEINT) * CAST(n AS HUGEINT)
                   * CAST(n - 1 AS HUGEINT))
               AS BIGINT) ELSE 0 END AS vm
      FROM risk WHERE d > 0
    )
    SELECT COALESCE(CAST(MIN(totu1) AS BIGINT), 0) AS n1_users,
           COALESCE(CAST(MIN(totu - totu1) AS BIGINT), 0) AS n0_users,
           COALESCE(CAST(SUM(d1) AS BIGINT), 0) AS deaths1,
           COALESCE(CAST(SUM(d - d1) AS BIGINT), 0) AS deaths0,
           CAST(COUNT(*) AS BIGINT) AS death_days,
           CAST(SUM(e1m) AS DOUBLE) / 1e6 AS expected1,
           CAST(SUM(vm) AS DOUBLE) / 1e6 AS variance,
           CASE WHEN SUM(vm) > 0 THEN
             CAST(CAST(round(
               (CAST(SUM(d1) * 1000000 - SUM(e1m) AS DOUBLE) / 1e6)
               * (CAST(SUM(d1) * 1000000 - SUM(e1m) AS DOUBLE) / 1e6)
               / (CAST(SUM(vm) AS DOUBLE) / 1e6) * 1e6) AS BIGINT)
               AS DOUBLE) / 1e6 END AS chi2
    FROM terms
    """,
    doc="Two-group log-rank test at day grain: per user, survival time "
        "= days from first event to first purchase, censored at the "
        "corpus horizon; groups by user_id parity.  At each death day "
        "the hypergeometric increments O-E = d1 - d*n1/n and "
        "V = d*n1*(n-n1)*(n-d)/(n^2*(n-1)) are fixed-pointed to exact "
        "micro integers by INTEGER division (HUGEINT DuckDB-side, "
        "DECIMAL(38,0) Spark-side — identical floor on non-negative "
        "operands), then SUMmed as BIGINTs: zero cross-row float "
        "accumulation, so chi2 is engine-identical.  At-risk counts "
        "come from one cumulative window over the <=31-row day-grain "
        "frame (calendar-bounded, never row-bounded); the only "
        "row-scale work is the per-user groupBy (one shuffle).  "
        "Degenerate corpora (no purchases) emit the zeroed row in "
        "both engines — the q361 empty-input lesson.  Headroom: the "
        "micro terms need d*n1*1e6 within int64 — safe to ~3M users "
        "per day-tie; beyond that the scale raises to the "
        "DECIMAL(38,0)/HUGEINT path already used for V.",
    tags=("events", "survival", "stats", "window"),
)
def q374(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).alias("g"),
        F.min("ts").alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("tp"),
        F.max("ts").alias("tmax"),
    )
    wall = Window.partitionBy()
    u2 = u.select(
        F.col("g").cast("bigint").alias("g"),
        F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("ev"),
        F.when(
            F.col("tp").isNotNull(),
            F.datediff(F.to_date("tp"), F.to_date("t0")),
        )
        .otherwise(
            F.datediff(F.to_date(F.max("tmax").over(wall)), F.to_date("t0"))
        )
        .cast("bigint")
        .alias("t"),
    )
    day = u2.groupBy("t").agg(
        F.sum(F.when((F.col("ev") == 1) & (F.col("g") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("d1"),
        F.sum("ev").cast("bigint").alias("d"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).cast("bigint").alias("rem1"),
        F.count(F.lit(1)).cast("bigint").alias("rem"),
    )
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = day.select(
        "t",
        "d1",
        "d",
        F.sum("rem1").over(wall).cast("bigint").alias("totu1"),
        F.sum("rem").over(wall).cast("bigint").alias("totu"),
        (
            F.sum("rem1").over(wall)
            - F.coalesce(F.sum("rem1").over(wcum), F.lit(0))
        )
        .cast("bigint")
        .alias("n1"),
        (
            F.sum("rem").over(wall)
            - F.coalesce(F.sum("rem").over(wcum), F.lit(0))
        )
        .cast("bigint")
        .alias("n"),
    )
    terms = risk.where(F.col("d") > 0).select(
        "d1",
        "d",
        "n1",
        "n",
        "totu1",
        "totu",
        F.expr("(d * n1 * 1000000) div n").alias("e1m"),
        F.when(
            F.col("n") > 1,
            F.expr(
                "CAST((CAST(d AS DECIMAL(38,0)) * CAST(n1 AS DECIMAL(38,0))"
                " * CAST(n - n1 AS DECIMAL(38,0))"
                " * CAST(n - d AS DECIMAL(38,0)) * 1000000)"
                " div (CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))"
                " * CAST(n - 1 AS DECIMAL(38,0))) AS BIGINT)"
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("vm"),
    )
    num = F.col("sd1") * 1000000 - F.col("se1m")
    chi2 = (
        (num.cast("double") / F.lit(1e6))
        * (num.cast("double") / F.lit(1e6))
        / (F.col("svm").cast("double") / F.lit(1e6))
    )
    return terms.agg(
        F.coalesce(F.min("totu1"), F.lit(0)).cast("bigint").alias("n1_users"),
        F.coalesce(F.min(F.col("totu") - F.col("totu1")), F.lit(0))
        .cast("bigint")
        .alias("n0_users"),
        F.coalesce(F.sum("d1"), F.lit(0)).cast("bigint").alias("deaths1"),
        F.coalesce(F.sum(F.col("d") - F.col("d1")), F.lit(0))
        .cast("bigint")
        .alias("deaths0"),
        F.count(F.lit(1)).cast("bigint").alias("death_days"),
        F.sum("e1m").cast("bigint").alias("se1m"),
        F.sum("vm").cast("bigint").alias("svm"),
        F.sum("d1").cast("bigint").alias("sd1"),
    ).select(
        "n1_users",
        "n0_users",
        "deaths1",
        "deaths0",
        "death_days",
        emit(F.col("se1m").cast("double") / 1e6).alias("expected1"),
        emit(F.col("svm").cast("double") / 1e6).alias("variance"),
        F.when(F.col("svm") > 0, pround(chi2, 6)).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# q375: Neyman allocation for stratified sampling
# ---------------------------------------------------------------------------

_Q375_BUDGET = 1000


@register(
    "q375_neyman_allocation",
    sql=f"""
    WITH f AS (
      SELECT c_mktsegment AS segment,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM customer
    ),
    s AS (
      SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS sx,
             SUM(CAST(cents AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0)))
               AS sxx
      FROM f GROUP BY 1
    ),
    w AS (
      SELECT segment, n,
             CASE WHEN n > 1 THEN
               sqrt(GREATEST(
                 (CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                 / (n - 1), 0.0))
             ELSE 0.0 END AS sd_c
      FROM s
    ),
    w2 AS (
      SELECT segment, n, sd_c,
             CAST(round(CAST(n AS DOUBLE) * sd_c) AS BIGINT) AS wu
      FROM w
    ),
    q AS (
      SELECT segment, n, sd_c, wu,
             CAST(SUM(wu) OVER () AS BIGINT) AS wtot,
             CASE WHEN SUM(wu) OVER () > 0
                  THEN (wu * {_Q375_BUDGET}) // SUM(wu) OVER ()
                  ELSE 0 END AS base,
             CASE WHEN SUM(wu) OVER () > 0
                  THEN (wu * {_Q375_BUDGET}) % SUM(wu) OVER ()
                  ELSE 0 END AS rem
      FROM w2
    ),
    r AS (
      SELECT segment, n, sd_c, wu, wtot, base,
             {_Q375_BUDGET} - SUM(base) OVER () AS leftover,
             row_number() OVER (ORDER BY rem DESC, segment) AS rk
      FROM q
    )
    SELECT segment, n AS n_customers,
           CAST(CAST(round(sd_c / 100 * 1e4) AS BIGINT) AS DOUBLE) / 1e4
             AS acctbal_sd,
           wu AS weight_units,
           CASE WHEN wtot > 0 THEN
             CAST(CAST(round(CAST(wu AS DOUBLE) / wtot * 1e6) AS BIGINT)
                  AS DOUBLE) / 1e6 END AS alloc_share,
           CAST(base + CASE WHEN rk <= leftover AND wtot > 0 THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_n
    FROM r ORDER BY segment
    """,
    doc="Neyman allocation advisor: split a 1000-sample budget across "
        "market-segment strata proportionally to N_h * S_h (stratum "
        "size times acctbal standard deviation) — the variance-optimal "
        "allocation for stratified estimation, i.e. how a sampling "
        "pipeline should spend its label/inspection budget.  S_h comes "
        "from exact integer moments (BIGINT cent sums, DECIMAL(38,0) "
        "squares) through ONE deterministic double expression + IEEE "
        "sqrt (correctly rounded, hence engine-identical); weights are "
        "then fixed-pointed to integer units and integerized with the "
        "q159 largest-remainder rule, so allocations always sum to "
        "exactly the budget with no floats in the apportionment.  The "
        "raw scan collapses to the 5-row stratum grain in one pass; "
        "every window runs over those 5 rows (empty-partition window, "
        "q159's shape — constant-size at any corpus scale).",
    tags=("customer", "sampling", "ops-advisor", "allocation"),
)
def q375(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("bigint")
    f = load(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"), cents.alias("cents")
    )
    cd = F.col("cents").cast("decimal(38,0)")
    s = f.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("sx"),
        F.sum(cd * cd).alias("sxx"),
    )
    sd_c = F.when(
        F.col("n") > 1,
        F.sqrt(
            F.greatest(
                (
                    F.col("sxx").cast("double")
                    - F.col("sx").cast("double")
                    * F.col("sx").cast("double")
                    / F.col("n")
                )
                / (F.col("n") - 1),
                F.lit(0.0),
            )
        ),
    ).otherwise(F.lit(0.0))
    w2 = s.select(
        "segment",
        "n",
        sd_c.alias("sd_c"),
    ).select(
        "segment",
        "n",
        "sd_c",
        F.round(F.col("n").cast("double") * F.col("sd_c"))
        .cast("bigint")
        .alias("wu"),
    )
    wall = Window.partitionBy()
    q = w2.select(
        "segment",
        "n",
        "sd_c",
        "wu",
        F.sum("wu").over(wall).cast("bigint").alias("wtot"),
    ).select(
        "segment",
        "n",
        "sd_c",
        "wu",
        "wtot",
        F.when(
            F.col("wtot") > 0,
            F.expr(f"(wu * {_Q375_BUDGET}) div wtot"),
        )
        .otherwise(F.lit(0))
        .alias("base"),
        F.when(
            F.col("wtot") > 0, (F.col("wu") * _Q375_BUDGET) % F.col("wtot")
        )
        .otherwise(F.lit(0))
        .alias("rem"),
    )
    r = q.select(
        "segment",
        "n",
        "sd_c",
        "wu",
        "wtot",
        "base",
        (F.lit(_Q375_BUDGET) - F.sum("base").over(wall)).alias("leftover"),
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), F.asc("segment")))
        .alias("rk"),
    )
    return r.select(
        "segment",
        F.col("n").alias("n_customers"),
        pround(F.col("sd_c") / 100, 4).alias("acctbal_sd"),
        F.col("wu").alias("weight_units"),
        F.when(
            F.col("wtot") > 0,
            pround(F.col("wu").cast("double") / F.col("wtot"), 6),
        ).alias("alloc_share"),
        (
            F.col("base")
            + F.when((F.col("rk") <= F.col("leftover")) & (F.col("wtot") > 0), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_n"),
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# q376: target-leakage audit (Cramer's V per candidate feature)
# ---------------------------------------------------------------------------


@register(
    "q376_leakage_audit",
    sql="""
    WITH m AS (
      SELECT 'priority' AS feature, o_orderpriority AS fv,
             o_orderstatus AS label FROM orders
      UNION ALL
      SELECT 'order_month', lpad(CAST(month(o_orderdate) AS VARCHAR), 2, '0'),
             o_orderstatus FROM orders
      UNION ALL
      SELECT 'cust_bucket', CAST(o_custkey % 8 AS VARCHAR),
             o_orderstatus FROM orders
      UNION ALL
      SELECT 'price_band',
             CAST(LEAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT) // 5000000, 9) AS VARCHAR),
             o_orderstatus FROM orders
    ),
    cells AS (
      SELECT feature, fv, label, CAST(COUNT(*) AS BIGINT) AS obs
      FROM m GROUP BY 1, 2, 3
    ),
    rowt AS (
      SELECT feature, fv, CAST(SUM(obs) AS BIGINT) AS row_tot
      FROM cells GROUP BY 1, 2
    ),
    colt AS (
      SELECT feature, label, CAST(SUM(obs) AS BIGINT) AS col_tot
      FROM cells GROUP BY 1, 2
    ),
    per AS (
      SELECT feature, CAST(SUM(col_tot) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM colt GROUP BY 1
    ),
    perr AS (
      SELECT feature, CAST(COUNT(*) AS BIGINT) AS r FROM rowt GROUP BY 1
    ),
    contrib AS (
      SELECT c.feature,
             CAST((CAST(c.obs * p.n - r.row_tot * l.col_tot AS HUGEINT)
                   * CAST(c.obs * p.n - r.row_tot * l.col_tot AS HUGEINT)
                   * 1000000)
                  // (CAST(r.row_tot AS HUGEINT) * CAST(l.col_tot AS HUGEINT)
                      * CAST(p.n AS HUGEINT))
                  AS BIGINT) AS cell_micro
      FROM cells c
      JOIN rowt r ON r.feature = c.feature AND r.fv = c.fv
      JOIN colt l ON l.feature = c.feature AND l.label = c.label
      JOIN per p ON p.feature = c.feature
    ),
    chi AS (
      SELECT feature, CAST(SUM(cell_micro) AS BIGINT) AS chi2m
      FROM contrib GROUP BY 1
    )
    SELECT p.feature, p.n AS n_rows, rr.r AS n_levels, p.c AS n_labels,
           (rr.r - 1) * (p.c - 1) AS dof,
           CAST(h.chi2m AS DOUBLE) / 1e6 AS chi2,
           CASE WHEN rr.r > 1 AND p.c > 1 AND p.n > 0 THEN
             sqrt(CAST(h.chi2m AS DOUBLE)
                  / (1000000.0 * p.n * LEAST(rr.r - 1, p.c - 1))) END
             AS cramers_v,
           COALESCE(rr.r > 1 AND p.c > 1 AND p.n > 0
                    AND h.chi2m * 4 > 1000000 * p.n
                        * LEAST(rr.r - 1, p.c - 1), FALSE) AS leak_flag
    FROM per p
    JOIN perr rr ON rr.feature = p.feature
    JOIN chi h ON h.feature = p.feature
    ORDER BY p.feature
    """,
    doc="Target-leakage audit: for each candidate feature column "
        "(priority, order month, custkey bucket, price band) compute "
        "the chi-square association with the label (order status) and "
        "Cramer's V; flag V > 0.5 as a leak — the pre-training check "
        "that catches a feature that IS the label in disguise.  Every "
        "cell contribution (obs*n - row*col)^2 / (row*col*n) is an "
        "exact integer micro fixed-point via HUGEINT (DuckDB) / "
        "DECIMAL(38,0) (Spark) integer division, and the leak flag is "
        "a pure integer comparison (chi2m*4 > 1e6*n*dof <=> V^2 > "
        "0.25), so both the statistic and the decision are "
        "engine-identical bit for bit.  Physical: ONE fact scan melts "
        "to (feature, value, label) via inline explode (no 4x scan "
        "Spark-side), then everything is equi-joined at the "
        "feature/value grain — cells are bounded by "
        "levels x labels x features, never by rows.",
    tags=("orders", "quality", "ops-advisor", "stats"),
)
def q376(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    m = o.select(
        F.inline(
            F.array(
                F.struct(
                    F.lit("priority").alias("feature"),
                    F.col("o_orderpriority").alias("fv"),
                ),
                F.struct(
                    F.lit("order_month").alias("feature"),
                    F.lpad(F.month("o_orderdate").cast("string"), 2, "0").alias(
                        "fv"
                    ),
                ),
                F.struct(
                    F.lit("cust_bucket").alias("feature"),
                    (F.col("o_custkey") % 8).cast("string").alias("fv"),
                ),
                F.struct(
                    F.lit("price_band").alias("feature"),
                    F.least(
                        F.expr(
                            "CAST(CAST(o_totalprice AS DECIMAL(18,2))"
                            " * 100 AS BIGINT) div 5000000"
                        ),
                        F.lit(9),
                    )
                    .cast("string")
                    .alias("fv"),
                ),
            )
        ),
        F.col("o_orderstatus").alias("label"),
    )
    cells = m.groupBy("feature", "fv", "label").agg(
        F.count(F.lit(1)).cast("bigint").alias("obs")
    )
    rowt = cells.groupBy("feature", "fv").agg(
        F.sum("obs").cast("bigint").alias("row_tot")
    )
    colt = cells.groupBy("feature", "label").agg(
        F.sum("obs").cast("bigint").alias("col_tot")
    )
    per = colt.groupBy("feature").agg(
        F.sum("col_tot").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    perr = rowt.groupBy("feature").agg(
        F.count(F.lit(1)).cast("bigint").alias("r")
    )
    contrib = (
        cells.join(rowt, ["feature", "fv"])
        .join(colt, ["feature", "label"])
        .join(per, ["feature"])
        .select(
            "feature",
            F.expr(
                "CAST((CAST(obs * n - row_tot * col_tot AS DECIMAL(38,0))"
                " * CAST(obs * n - row_tot * col_tot AS DECIMAL(38,0))"
                " * 1000000)"
                " div (CAST(row_tot AS DECIMAL(38,0))"
                " * CAST(col_tot AS DECIMAL(38,0))"
                " * CAST(n AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("cell_micro"),
        )
    )
    chi = contrib.groupBy("feature").agg(
        F.sum("cell_micro").cast("bigint").alias("chi2m")
    )
    joined = per.join(perr, ["feature"]).join(chi, ["feature"])
    r, c, n, chi2m = F.col("r"), F.col("c"), F.col("n"), F.col("chi2m")
    nondeg = (r > 1) & (c > 1) & (n > 0)
    return joined.select(
        "feature",
        n.alias("n_rows"),
        r.alias("n_levels"),
        c.alias("n_labels"),
        ((r - 1) * (c - 1)).alias("dof"),
        emit(chi2m.cast("double") / 1e6).alias("chi2"),
        F.when(
            nondeg,
            F.sqrt(
                chi2m.cast("double")
                / (F.lit(1000000.0) * n * F.least(r - 1, c - 1))
            ),
        ).alias("cramers_v"),
        F.coalesce(
            nondeg & (chi2m * 4 > 1000000 * n * F.least(r - 1, c - 1)),
            F.lit(False),
        ).alias("leak_flag"),
    ).orderBy("feature")


# ---------------------------------------------------------------------------
# q377: multi-window SLO error-budget burn rate
# ---------------------------------------------------------------------------

_Q377_WINDOWS = (1, 6, 24, 72)  # hours
_Q377_BUDGET_PCT = 25  # SLO error budget: 25% of events may be errors


def _q377_sql() -> str:
    counts = []
    for h in _Q377_WINDOWS:
        counts.append(
            f"CAST(SUM(CASE WHEN e.ts > h.hmax - INTERVAL {h} HOUR"
            f" THEN 1 ELSE 0 END) AS BIGINT) AS t{h},\n"
            f"        CAST(SUM(CASE WHEN e.ts > h.hmax - INTERVAL {h} HOUR"
            f" AND e.event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS e{h}"
        )
    # paired-window page rule: a window breaches when its own burn AND
    # the next-longer window's burn both exceed 2x budget; the longest
    # window breaches on its own burn alone exceeding 1x.
    rows = []
    for i, h in enumerate(_Q377_WINDOWS):
        nxt = _Q377_WINDOWS[i + 1] if i + 1 < len(_Q377_WINDOWS) else None
        if nxt is not None:
            breach = (f"(e{h} * 100 * 2 > t{h} * {_Q377_BUDGET_PCT} * 2"
                      f" AND e{nxt} * 100 * 2 > t{nxt} * {_Q377_BUDGET_PCT} * 2)")
        else:
            breach = f"(e{h} * 100 > t{h} * {_Q377_BUDGET_PCT})"
        rows.append(
            f"""
      SELECT {h} AS window_h, t{h} AS total_events, e{h} AS errors,
             CASE WHEN t{h} > 0 THEN
               CAST(CAST(round(CAST(e{h} AS DOUBLE) / t{h} * 1e6) AS BIGINT)
                    AS DOUBLE) / 1e6 END AS err_rate,
             CASE WHEN t{h} > 0 THEN
               CAST(CAST(round(CAST(e{h} AS DOUBLE) * 100
                               / ({_Q377_BUDGET_PCT} * t{h}) * 1e6) AS BIGINT)
                    AS DOUBLE) / 1e6 END AS burn_rate,
             COALESCE(t{h} > 0 AND {breach}, FALSE) AS breach
      FROM c"""
        )
    counts_block = ",\n        ".join(counts)
    rows_block = " UNION ALL ".join(rows)
    return f"""
    WITH h AS (SELECT MAX(ts) AS hmax FROM events),
    c AS (
      SELECT
        {counts_block}
      FROM events e, h
    )
    SELECT window_h, total_events, errors, err_rate, burn_rate, breach
    FROM ({rows_block})
    ORDER BY window_h
    """


@register(
    "q377_slo_burn_rate",
    sql=_q377_sql(),
    doc="SRE error-budget burn-rate advisor: against a 25% error "
        "budget, compute the error rate and burn multiple over the "
        "trailing 1/6/24/72-hour windows (anchored at the corpus "
        "horizon MAX(ts)), with the classic paired-window page rule — "
        "a short window alone is jittery, a long window alone is slow, "
        "so a breach requires BOTH the window and its next-longer "
        "sibling to burn >2x (the longest window pages on >1x alone).  "
        "All four windows come from ONE conditional-aggregation pass "
        "over a single fact scan (the horizon is a broadcast "
        "single-row aggregate — q353's shape), and every breach "
        "decision is a pure integer comparison, so the page/no-page "
        "verdict is engine-identical.  The 4-row report is "
        "projections of the single-row count frame (no further "
        "join).  Streaming sibling: q361's SPRT monitor drains the "
        "same events continuously.",
    tags=("events", "ops-advisor", "timeseries"),
)
def q377(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    h = ev.agg(F.max("ts").alias("hmax"))
    joined = ev.crossJoin(F.broadcast(h))
    aggs = []
    for hh in _Q377_WINDOWS:
        in_w = F.col("ts") > F.col("hmax") - F.expr(f"INTERVAL {hh} HOUR")
        aggs.append(
            F.sum(F.when(in_w, 1).otherwise(0)).cast("bigint").alias(f"t{hh}")
        )
        aggs.append(
            F.sum(
                F.when(in_w & (F.col("event_type") == "error"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias(f"e{hh}")
        )
    # ONE-row burn census, pinned (the q372 rule): each per-window
    # union branch below projects from it — unpinned, every branch
    # re-ran the events scan + max-ts + window sums
    c = joined.agg(*aggs).localCheckpoint(eager=True)
    parts = []
    for i, hh in enumerate(_Q377_WINDOWS):
        t, e = F.col(f"t{hh}"), F.col(f"e{hh}")
        nxt = _Q377_WINDOWS[i + 1] if i + 1 < len(_Q377_WINDOWS) else None
        if nxt is not None:
            tn, en = F.col(f"t{nxt}"), F.col(f"e{nxt}")
            breach = (e * 100 * 2 > t * _Q377_BUDGET_PCT * 2) & (
                en * 100 * 2 > tn * _Q377_BUDGET_PCT * 2
            )
        else:
            breach = e * 100 > t * _Q377_BUDGET_PCT
        parts.append(
            c.select(
                F.lit(hh).alias("window_h"),
                t.alias("total_events"),
                e.alias("errors"),
                F.when(t > 0, pround(e.cast("double") / t, 6)).alias(
                    "err_rate"
                ),
                F.when(
                    t > 0,
                    pround(
                        e.cast("double") * 100 / (_Q377_BUDGET_PCT * t), 6
                    ),
                ).alias("burn_rate"),
                F.coalesce((t > 0) & breach, F.lit(False)).alias("breach"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("window_h")
