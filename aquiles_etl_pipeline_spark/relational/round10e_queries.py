"""Round-10 catalog entries, fifth wing (q390-q395): shuffle-layout
advisory, survival/distribution depth, lead-lag dynamics, and the
covariate-shift + calibration readouts of the in-engine NB model.

- q390 shuffle-partition advisor: per shuffle key (orderkey /
  partkey / suppkey), the exact key census + byte estimate that sizes
  spark.sql.shuffle.partitions and flags keys whose single-key volume
  exceeds a target partition — the config the 100-TB operator sets
  from evidence rather than folklore.
- q391 Kaplan-Meier product-limit: per-cohort survival at fixed
  horizons from exact hazard ratios, log-space accumulated in integer
  micros (the product-limit companion to q353's Nelson-Aalen and
  q374's log-rank).
- q392 Cramer-von Mises two-sample: the squared-integral EDF
  distance at DISTINCT-VALUE grain — q267's KS scaffold with the
  supremum replaced by the full-distribution integral, integer until
  the final division.
- q393 cross-correlation lead-lag: Pearson r of daily revenue vs
  daily shipment volume at lags -7..+7 over the calendar spine —
  does shipping volume lead or lag booked revenue?
- q394 covariate-shift ESS audit: importance weights that would
  rebalance each source to the uniform language target, and the
  effective sample size they leave — the q175/q343 reweighting
  honesty check.
- q395 NB margin calibration: confidence-band accuracy of q384's
  in-engine classifier from the exact integer score margin between
  the top two classes — train (q384) -> calibrate (q395).

Shared numeric discipline (round10b-d): cross-row accumulation on
exact integers / DECIMAL(38,0) only; identical scalar double trees;
pround on final fractional outputs; degenerate inputs CASE-guarded
symmetrically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .catalog import emit, load, pround, register

# ---------------------------------------------------------------------------
# q390: shuffle-partition advisor
# ---------------------------------------------------------------------------

# Estimated serialized bytes per lineitem row (3 bigint keys + 1 int +
# 4 doubles + 2 char(1) + 1 timestamp ~ 88 B).  A literal, not a
# measurement: the advisor's point is the KEY CENSUS; the width only
# scales counts into the bytes the config is denominated in.
_Q390_ROW_BYTES = 88
_Q390_TARGET = 134_217_728  # 128 MiB target shuffle partition


@register(
    "q390_shuffle_partition_advisor",
    sql=f"""
    WITH keys AS (
      SELECT 'l_orderkey' AS shuffle_key, l_orderkey AS k FROM lineitem
      UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
      UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem
    ),
    kc AS (
      SELECT shuffle_key, k, CAST(COUNT(*) AS BIGINT) AS c
      FROM keys GROUP BY 1, 2
    ),
    s AS (
      SELECT shuffle_key,
             CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(c) AS BIGINT) AS max_key_rows
      FROM kc GROUP BY 1
    )
    SELECT shuffle_key, n_rows, n_keys, max_key_rows,
           CAST(max_key_rows * 100 AS DOUBLE) / n_rows AS max_key_share_pct,
           CAST((n_rows * {_Q390_ROW_BYTES} + {_Q390_TARGET} - 1)
                // {_Q390_TARGET} AS BIGINT) AS rec_partitions,
           (max_key_rows * {_Q390_ROW_BYTES} > {_Q390_TARGET}) AS skew_limited
    FROM s
    ORDER BY shuffle_key
    """,
    doc="Shuffle-partition advisor: for each of lineitem's three "
        "shuffle keys, the exact key census (rows, distinct keys, max "
        "single-key rows) scaled by a documented row-width literal "
        "into the two numbers a 100-TB operator sets from evidence — "
        "rec_partitions = ceil(bytes / 128 MiB), and skew_limited = "
        "whether ONE key's volume alone exceeds the target partition "
        "(in which case more partitions cannot help and q112's "
        "salting / q351's advisory take over).  Physical: one "
        "explode x3 of the key columns, one map-side-combinable "
        "count at (key-name, key) grain, one 3-row rollup; every "
        "output integer exact, the share one double division.",
    tags=("lineitem", "ops-advisor", "agg"),
)
def q390(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    keys = li.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("l_orderkey").alias("shuffle_key"),
                    F.col("l_orderkey").alias("k"),
                ),
                F.struct(
                    F.lit("l_partkey").alias("shuffle_key"),
                    F.col("l_partkey").alias("k"),
                ),
                F.struct(
                    F.lit("l_suppkey").alias("shuffle_key"),
                    F.col("l_suppkey").alias("k"),
                ),
            )
        ).alias("e")
    ).select("e.shuffle_key", "e.k")
    kc = keys.groupBy("shuffle_key", "k").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    s = kc.groupBy("shuffle_key").agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("c").cast("bigint").alias("max_key_rows"),
    )
    return s.select(
        "shuffle_key",
        "n_rows",
        "n_keys",
        "max_key_rows",
        emit(
            (F.col("max_key_rows") * 100).cast("double") / F.col("n_rows")
        ).alias("max_key_share_pct"),
        F.expr(
            f"CAST((n_rows * {_Q390_ROW_BYTES} + {_Q390_TARGET} - 1)"
            f" div {_Q390_TARGET} AS BIGINT)"
        ).alias("rec_partitions"),
        (F.col("max_key_rows") * _Q390_ROW_BYTES > F.lit(_Q390_TARGET)).alias(
            "skew_limited"
        ),
    ).orderBy("shuffle_key")


# ---------------------------------------------------------------------------
# q391: Kaplan-Meier product-limit survival
# ---------------------------------------------------------------------------


@register(
    "q391_kaplan_meier",
    sql="""
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS g,
             MIN(ts) AS t0,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
             MAX(ts) AS tmax
      FROM events GROUP BY 1
    ),
    h AS (SELECT MAX(tmax) AS hz FROM u),
    u2 AS (
      SELECT g,
             CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev,
             CAST(CASE WHEN tp IS NOT NULL
                  THEN date_diff('day', CAST(t0 AS DATE), CAST(tp AS DATE))
                  ELSE date_diff('day', CAST(t0 AS DATE), CAST(h.hz AS DATE))
             END AS BIGINT) AS t
      FROM u, h
    ),
    day AS (
      SELECT g, t,
             CAST(SUM(ev) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS leave
      FROM u2 GROUP BY 1, 2
    ),
    risk AS (
      SELECT g, t, d,
             CAST(SUM(leave) OVER (PARTITION BY g) AS BIGINT)
               - CAST(COALESCE(SUM(leave) OVER (
                   PARTITION BY g ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS n
      FROM day
    ),
    terms AS (
      SELECT g, t, d, n,
             CASE WHEN d < n
                  THEN CAST(round(ln(CAST(n - d AS DOUBLE) / n) * 1e6)
                            AS BIGINT) END AS lnm,
             CASE WHEN d >= n THEN 1 ELSE 0 END AS dead
      FROM risk WHERE d > 0
    ),
    hs AS (SELECT * FROM (VALUES (7), (30), (60), (90)) AS v(horizon)),
    km AS (
      SELECT g.g, hs.horizon,
             COALESCE(SUM(CASE WHEN terms.t <= hs.horizon
                               THEN terms.lnm END), 0) AS ln_m,
             COALESCE(SUM(CASE WHEN terms.t <= hs.horizon
                               THEN terms.dead ELSE 0 END), 0) AS dead,
             COALESCE(SUM(CASE WHEN terms.t <= hs.horizon
                               THEN terms.d ELSE 0 END), 0) AS d_cum
      FROM (SELECT DISTINCT g FROM u) g
           CROSS JOIN hs
           LEFT JOIN terms ON terms.g = g.g
      GROUP BY 1, 2
    )
    SELECT g AS cohort, CAST(horizon AS BIGINT) AS horizon,
           CAST(d_cum AS BIGINT) AS n_events,
           CASE WHEN dead = 0
                THEN CAST(ln_m AS DOUBLE) / 1e6 ELSE NULL END AS ln_surv,
           CASE WHEN dead > 0 THEN CAST(0 AS DOUBLE) ELSE
             CAST(CAST(round(exp(CAST(ln_m AS DOUBLE) / 1e6) * 1e6)
                       AS BIGINT) AS DOUBLE) / 1e6 END AS surv
    FROM km
    ORDER BY cohort, horizon
    """,
    doc="Kaplan-Meier product-limit survival (signup -> first "
        "purchase, q374's cohort framing: even/odd user cohorts, "
        "horizon-censored at the corpus max timestamp): S(h) = "
        "product over event days t <= h of (1 - d_t/n_t), "
        "accumulated in LOG space with each ln((n-d)/n) hazard term "
        "micro-rounded to an integer before the sum — so ln_surv is "
        "engine-exact and surv differs only by one final exp() "
        "inside a pround boundary.  A day that exhausts the risk set "
        "(d = n) collapses survival to exactly 0 via an integer flag "
        "rather than ln(0).  Physical: one user-grain aggregate, "
        "day-grain windows per cohort (calendar-bounded), a 4-row "
        "horizon spine fan-out over the day-grain frame.",
    tags=("events", "survival", "stats", "window"),
)
def q391(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).cast("bigint").alias("g"),
        F.min("ts").alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "tp"
        ),
        F.max("ts").alias("tmax"),
    )
    wall = Window.partitionBy()
    u2 = u.select(
        "g",
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
    day = u2.groupBy("g", "t").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("leave"),
    )
    wg = Window.partitionBy("g")
    wcum = Window.partitionBy("g").orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = day.select(
        "g",
        "t",
        "d",
        (
            F.sum("leave").over(wg)
            - F.coalesce(F.sum("leave").over(wcum), F.lit(0))
        )
        .cast("bigint")
        .alias("n"),
    )
    terms = risk.where(F.col("d") > 0).select(
        "g",
        "t",
        "d",
        F.when(
            F.col("d") < F.col("n"),
            F.round(
                F.log((F.col("n") - F.col("d")).cast("double") / F.col("n"))
                * 1e6
            ).cast("bigint"),
        ).alias("lnm"),
        F.when(F.col("d") >= F.col("n"), 1).otherwise(0).alias("dead"),
    )
    cohorts = u2.select("g").distinct()
    hs = spark.range(1).select(
        F.explode(F.array(*[F.lit(h) for h in (7, 30, 60, 90)])).alias(
            "horizon"
        )
    )
    km = (
        cohorts.crossJoin(F.broadcast(hs))
        .join(terms, "g", "left")
        .groupBy("g", "horizon")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("t") <= F.col("horizon"), F.col("lnm"))),
                F.lit(0),
            ).alias("ln_m"),
            F.coalesce(
                F.sum(
                    F.when(F.col("t") <= F.col("horizon"), F.col("dead")).otherwise(0)
                ),
                F.lit(0),
            ).alias("dead"),
            F.coalesce(
                F.sum(
                    F.when(F.col("t") <= F.col("horizon"), F.col("d")).otherwise(0)
                ),
                F.lit(0),
            ).alias("d_cum"),
        )
    )
    return km.select(
        F.col("g").alias("cohort"),
        F.col("horizon").cast("bigint").alias("horizon"),
        F.col("d_cum").cast("bigint").alias("n_events"),
        F.when(
            F.col("dead") == 0, emit(F.col("ln_m").cast("double") / 1e6)
        ).alias("ln_surv"),
        F.when(F.col("dead") > 0, F.lit(0.0))
        .otherwise(pround(F.exp(F.col("ln_m").cast("double") / 1e6), 6))
        .alias("surv"),
    ).orderBy("cohort", "horizon")


# ---------------------------------------------------------------------------
# q392: Cramer-von Mises two-sample
# ---------------------------------------------------------------------------


@register(
    "q392_cramer_von_mises",
    sql="""
    WITH o AS (
      SELECT CAST(round(coalesce(o_totalprice, 0) * 100) AS BIGINT) AS v,
             CASE WHEN o_orderpriority LIKE '1-%'
                    OR o_orderpriority LIKE '2-%' THEN 1 ELSE 0 END AS hot
      FROM orders
    ),
    g AS (
      SELECT v,
             CAST(SUM(hot) AS BIGINT) AS c1,
             CAST(SUM(1 - hot) AS BIGINT) AS c2
      FROM o GROUP BY 1
    ),
    c AS (
      SELECT v, c1 + c2 AS cv,
             CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS f1,
             CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS f2,
             CAST(SUM(c1) OVER () AS BIGINT) AS n1,
             CAST(SUM(c2) OVER () AS BIGINT) AS n2
      FROM g
    ),
    s AS (
      SELECT MAX(n1) AS n1, MAX(n2) AS n2,
             SUM(CAST(cv AS HUGEINT)
                 * (CAST(f1 AS HUGEINT) * n2 - CAST(f2 AS HUGEINT) * n1)
                 * (CAST(f1 AS HUGEINT) * n2 - CAST(f2 AS HUGEINT) * n1))
               AS q
      FROM c
    )
    SELECT n1, n2,
           CASE WHEN n1 > 0 AND n2 > 0 THEN
             CAST(CAST(round(
               CAST(q AS DOUBLE)
               / (CAST(n1 AS DOUBLE) * n2 * (n1 + n2) * (n1 + n2)) * 1e9)
               AS BIGINT) AS DOUBLE) / 1e9
           END AS t_stat
    FROM s
    """,
    doc="Exact two-sample Cramer-von Mises statistic comparing "
        "urgent-priority vs normal-priority order-value "
        "distributions: T = (n1*n2/N^2) * sum over combined sample "
        "points of (F1(v) - F2(v))^2 — q267's KS scaffold with the "
        "supremum replaced by the squared-integral distance, which "
        "sees the WHOLE distribution difference instead of one "
        "point.  The per-value contribution cnt_v * (f1*n2 - "
        "f2*n1)^2 stays exact INTEGER (DECIMAL(38,0) before "
        "squaring, the q330 lesson) until one final division.  "
        "Physical: one fact shuffle to distinct-value grain, "
        "cumulative windows over the value frame, a single-row "
        "aggregate out.",
    tags=("stats", "orders", "distribution"),
)
def q392(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        F.round(F.coalesce(F.col("o_totalprice"), F.lit(0)) * 100)
        .cast("bigint")
        .alias("v"),
        F.when(
            F.col("o_orderpriority").like("1-%")
            | F.col("o_orderpriority").like("2-%"),
            1,
        )
        .otherwise(0)
        .alias("hot"),
    )
    g = o.groupBy("v").agg(
        F.sum("hot").cast("bigint").alias("c1"),
        F.sum(1 - F.col("hot")).cast("bigint").alias("c2"),
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    c = g.select(
        "v",
        (F.col("c1") + F.col("c2")).alias("cv"),
        F.sum("c1").over(w_cum).cast("bigint").alias("f1"),
        F.sum("c2").over(w_cum).cast("bigint").alias("f2"),
        F.sum("c1").over(w_all).cast("bigint").alias("n1"),
        F.sum("c2").over(w_all).cast("bigint").alias("n2"),
    )
    gap = F.expr(
        "CAST(f1 AS DECIMAL(38,0)) * n2 - CAST(f2 AS DECIMAL(38,0)) * n1"
    )
    s = c.agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.sum(F.expr("CAST(cv AS DECIMAL(38,0))") * gap * gap)
        .cast("decimal(38,0)")
        .alias("q"),
    )
    t = (
        F.col("q").cast("double")
        / (
            F.col("n1").cast("double")
            * F.col("n2")
            * (F.col("n1") + F.col("n2"))
            * (F.col("n1") + F.col("n2"))
        )
    )
    return s.select(
        "n1",
        "n2",
        F.when((F.col("n1") > 0) & (F.col("n2") > 0), pround(t, 9)).alias(
            "t_stat"
        ),
    )


# ---------------------------------------------------------------------------
# q393: cross-correlation lead-lag (revenue vs shipments)
# ---------------------------------------------------------------------------


@register(
    "q393_ccf_lead_lag",
    sql="""
    WITH r AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT CAST(l_shipdate AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM lineitem GROUP BY 1
    ),
    lags AS (SELECT * FROM (VALUES (-7),(-3),(-1),(0),(1),(3),(7)) AS v(lag)),
    j AS (
      SELECT lags.lag, r.x, s.y
      FROM lags JOIN r ON TRUE
                JOIN s ON s.day = r.day + CAST(lags.lag AS INTEGER)
    ),
    m AS (
      SELECT lag,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx,
             SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
             SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
             SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
      FROM j GROUP BY 1
    )
    SELECT CAST(lag AS BIGINT) AS lag, n,
           CASE WHEN n > 1
                 AND CAST(n * sxx - sx * sx AS DOUBLE) > 0
                 AND CAST(n * syy - sy * sy AS DOUBLE) > 0 THEN
             CAST(CAST(round(
               CAST(n * sxy - sx * sy AS DOUBLE)
               / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                      * CAST(n * syy - sy * sy AS DOUBLE)) * 1e6)
               AS BIGINT) AS DOUBLE) / 1e6
           END AS r
    FROM m
    ORDER BY lag
    """,
    doc="Cross-correlation lead-lag: Pearson r between daily booked "
        "revenue (orders, integer cents) and daily shipment volume "
        "(lineitem rows by shipdate) at lags -7..+7 — a positive "
        "peak at positive lag means shipments FOLLOW revenue by that "
        "many days, the lead-lag readout a supply-chain forecaster "
        "checks before regressing one series on the other (q249's "
        "ACF generalized to two series).  All five moment sums "
        "accumulate in DECIMAL(38,0) (day-grain cents x counts "
        "overflow int64 at warehouse scale — the q330 lesson); r is "
        "one identical double tree per lag, NULL-guarded for "
        "degenerate (constant) windows.  Physical: two day-grain "
        "aggregates, a 7-row literal lag spine fanned over the tiny "
        "calendar frame, equi-join on the shifted day.",
    tags=("orders", "lineitem", "timeseries", "stats"),
)
def q393(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    r = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(cents).cast("bigint").alias("x")
    )
    s = li.groupBy(F.col("l_shipdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("y")
    )
    lags = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(v) for v in (-7, -3, -1, 0, 1, 3, 7)])
        ).alias("lag")
    )
    j = (
        r.crossJoin(F.broadcast(lags))
        .join(
            s.withColumnRenamed("day", "sday"),
            F.col("sday")
            == F.expr("date_add(day, CAST(lag AS INT))"),
        )
    )
    dx = F.expr("CAST(x AS DECIMAL(38,0))")
    dy = F.expr("CAST(y AS DECIMAL(38,0))")
    m = j.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dx).cast("decimal(38,0)").alias("sx"),
        F.sum(dy).cast("decimal(38,0)").alias("sy"),
        F.sum(dx * dx).cast("decimal(38,0)").alias("sxx"),
        F.sum(dy * dy).cast("decimal(38,0)").alias("syy"),
        F.sum(dx * dy).cast("decimal(38,0)").alias("sxy"),
    )
    vx = F.expr("CAST(n * sxx - sx * sx AS DOUBLE)")
    vy = F.expr("CAST(n * syy - sy * sy AS DOUBLE)")
    num = F.expr("CAST(n * sxy - sx * sy AS DOUBLE)")
    return m.select(
        F.col("lag").cast("bigint").alias("lag"),
        "n",
        F.when(
            (F.col("n") > 1) & (vx > 0) & (vy > 0),
            pround(num / F.sqrt(vx * vy), 6),
        ).alias("r"),
    ).orderBy("lag")


# ---------------------------------------------------------------------------
# q394: covariate-shift effective-sample-size audit
# ---------------------------------------------------------------------------


@register(
    "q394_covariate_shift_ess",
    sql="""
    WITH d AS (
      SELECT source, lang FROM documents WHERE lang IS NOT NULL
    ),
    lt AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS nl,
             CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n,
             CAST(COUNT(*) OVER () AS BIGINT) AS l
      FROM d GROUP BY 1
    ),
    w AS (
      SELECT lang,
             CAST(round(1e6 * CAST(n AS DOUBLE) / (l * nl)) AS BIGINT) AS wm
      FROM lt
    ),
    sl AS (
      SELECT d.source, d.lang, CAST(COUNT(*) AS BIGINT) AS c
      FROM d GROUP BY 1, 2
    ),
    agg AS (
      SELECT sl.source,
             CAST(SUM(sl.c) AS BIGINT) AS n_docs,
             SUM(CAST(sl.c AS HUGEINT) * w.wm) AS sw,
             SUM(CAST(sl.c AS HUGEINT) * CAST(w.wm AS HUGEINT) * w.wm)
               AS sww
      FROM sl JOIN w USING (lang)
      GROUP BY 1
    )
    SELECT source, n_docs,
           CAST(CAST(round(CAST(sw * sw AS DOUBLE) / CAST(sww AS DOUBLE)
                           * 1e4) AS BIGINT) AS DOUBLE) / 1e4 AS ess,
           CAST(CAST(round(CAST(sw * sw AS DOUBLE) / CAST(sww AS DOUBLE)
                           / n_docs * 1e6) AS BIGINT) AS DOUBLE) / 1e6
             AS ess_ratio,
           (CAST(sw * sw AS DOUBLE) / CAST(sww AS DOUBLE) / n_docs < 0.5)
             AS reweight_risky
    FROM agg
    ORDER BY source
    """,
    doc="Covariate-shift effective-sample-size audit: the importance "
        "weights that would rebalance each source's language mix to "
        "the UNIFORM target (w = N/(L*n_lang), Kish weighting), and "
        "the effective sample size ESS = (sum w)^2 / sum w^2 they "
        "leave per source — the honesty check a reweighting pipeline "
        "(q175 DSIR, q343 IPS) runs BEFORE trusting a reweighted "
        "metric: ess_ratio < 0.5 means half the source's nominal "
        "sample is gone and the reweighted estimate is variance-"
        "dominated.  Weights are micro-rounded integers; both ESS "
        "sums accumulate in DECIMAL(38,0) (weights squared overflow "
        "int64 — the q330 lesson); everything runs at (source, "
        "lang) grain.  Physical: two map-side-combinable aggregates "
        "and one broadcast join on lang — no row-scale shuffle "
        "beyond the first groupBy.",
    tags=("documents", "llmdata", "ops-advisor", "agg"),
)
def q394(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load(spark, sf_dir, "documents")
        .where(F.col("lang").isNotNull())
        .select("source", "lang")
    )
    wall = Window.partitionBy()
    lt = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nl"))
        .withColumn("n", F.sum("nl").over(wall).cast("bigint"))
        .withColumn("l", F.count(F.lit(1)).over(wall).cast("bigint"))
    )
    w = lt.select(
        "lang",
        F.round(1e6 * F.col("n").cast("double") / (F.col("l") * F.col("nl")))
        .cast("bigint")
        .alias("wm"),
    )
    sl = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    cdec = F.expr("CAST(c AS DECIMAL(38,0))")
    wdec = F.expr("CAST(wm AS DECIMAL(38,0))")
    agg = (
        sl.join(F.broadcast(w), "lang")
        .groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_docs"),
            F.sum(cdec * F.col("wm")).cast("decimal(38,0)").alias("sw"),
            F.sum(cdec * wdec * F.col("wm"))
            .cast("decimal(38,0)")
            .alias("sww"),
        )
    )
    ess = F.expr("CAST(sw * sw AS DOUBLE) / CAST(sww AS DOUBLE)")
    return agg.select(
        "source",
        "n_docs",
        pround(ess, 4).alias("ess"),
        pround(ess / F.col("n_docs"), 6).alias("ess_ratio"),
        (ess / F.col("n_docs") < 0.5).alias("reweight_risky"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# q395: NB margin calibration
# ---------------------------------------------------------------------------

_Q395_NB_CTES = """
    WITH tr AS (
      SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents WHERE doc_id % 2 = 0 AND lang IS NOT NULL
    ),
    cls AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n
      FROM tr GROUP BY 1
    ),
    trt AS (
      SELECT lang, tok FROM tr, unnest(t) AS u(tok) WHERE tok <> ''
    ),
    tc AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c FROM trt GROUP BY 1, 2),
    tot AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS tc FROM trt GROUP BY 1),
    v AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM trt),
    te AS (
      SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents WHERE doc_id % 2 = 1 AND lang IS NOT NULL
    ),
    tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS m
      FROM te, unnest(t) AS u(tok) WHERE tok <> '' GROUP BY 1, 2
    ),
    scored AS (
      SELECT tf.doc_id, cls.lang,
             CAST(round(ln(CAST(cls.nd AS DOUBLE) / cls.n) * 1e6) AS BIGINT)
               + SUM(tf.m * CAST(round(ln(
                     (COALESCE(tc.c, 0) + CAST(1 AS DOUBLE))
                     / (COALESCE(tot.tc, 0) + v.v)) * 1e6) AS BIGINT))
               AS s
      FROM tf CROSS JOIN cls
              LEFT JOIN tc ON tc.lang = cls.lang AND tc.tok = tf.tok
              LEFT JOIN tot ON tot.lang = cls.lang, v
      WHERE v.v > 0
      GROUP BY 1, 2, cls.nd, cls.n
    ),
    ranked AS (
      SELECT doc_id, lang, s,
             row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lang)
               AS rk,
             lead(s) OVER (PARTITION BY doc_id ORDER BY s DESC, lang) AS s2
      FROM scored
    )
"""


@register(
    "q395_nb_margin_calibration",
    sql=_Q395_NB_CTES + """
    , pm AS (
      SELECT ranked.doc_id, ranked.lang AS pred_lang,
             COALESCE(ranked.s - ranked.s2, 3000000) AS margin,
             te.lang AS true_lang
      FROM ranked JOIN te ON te.doc_id = ranked.doc_id
      WHERE ranked.rk = 1
    )
    SELECT CASE WHEN margin < 100000 THEN 'a_lt_0.1'
                WHEN margin < 300000 THEN 'b_0.1_0.3'
                WHEN margin < 1000000 THEN 'c_0.3_1'
                ELSE 'd_ge_1' END AS margin_band,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN pred_lang = true_lang THEN 100 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS accuracy_pct
    FROM pm
    GROUP BY 1
    ORDER BY 1
    """,
    doc="Margin calibration of q384's in-engine NB classifier: the "
        "exact integer-micro score margin between the top two "
        "classes (a single-class corpus gets the top band) bucketed "
        "into nats bands, with held-out accuracy per band — "
        "confidence should predict correctness, and a band where it "
        "doesn't is the miscalibration a selective-prediction "
        "pipeline (route low-margin docs to a bigger model) needs "
        "to know about.  Train -> predict (q384) -> calibrate "
        "(here), all inside the engine.  The margin is a difference "
        "of the SAME micro-rounded integer scores q384 argmaxes, so "
        "band assignment is engine-identical by construction; band "
        "thresholds are integer compares; accuracy is an exact "
        "count ratio.  Physical: identical plan to q384 plus one "
        "lead() over the per-doc class ranking and a <=4-row "
        "aggregate.",
    tags=("documents", "llmdata", "ml-stats", "agg"),
)
def q395(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata.postings import term_frequencies, token_rows

    docs = load(spark, sf_dir, "documents")
    labeled = docs.where(F.col("lang").isNotNull())
    train = labeled.where(F.col("doc_id") % 2 == 0)
    test = labeled.where(F.col("doc_id") % 2 == 1)

    wall = Window.partitionBy()
    cls = (
        train.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
        .withColumn("n", F.sum("nd").over(wall).cast("bigint"))
    )
    # r10: ONE corpus tokenize pass — tc (lang x token counts) is the
    # pass's product, pinned; tot is its per-lang sum and v its
    # distinct-token count (identical values by construction), so the
    # explode no longer re-runs for each statistic.
    trt = token_rows(train, "lang")
    tc = (
        trt.groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    tot = tc.groupBy("lang").agg(F.sum("c").cast("bigint").alias("tc"))
    v = tc.select("tok").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    )
    tf = term_frequencies(test, "doc_id").withColumnRenamed("c", "m")
    prior_m = F.round(
        F.log(F.col("nd").cast("double") / F.col("n")) * 1e6
    ).cast("bigint")
    term_m = F.round(
        F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1).cast("double"))
            / (F.coalesce(F.col("tc"), F.lit(0)) + F.col("v"))
        )
        * 1e6
    ).cast("bigint")
    scored = (
        tf.crossJoin(F.broadcast(cls))
        .crossJoin(F.broadcast(v))
        .where(F.col("v") > 0)
        .join(F.broadcast(tot), "lang", "left")
        .join(tc, ["lang", "tok"], "left")
        .groupBy("doc_id", "lang", prior_m.alias("prior_m"))
        .agg(F.sum(F.col("m") * term_m).alias("tok_m"))
        .select("doc_id", "lang", (F.col("prior_m") + F.col("tok_m")).alias("s"))
    )
    wdoc = Window.partitionBy("doc_id").orderBy(F.desc("s"), F.asc("lang"))
    ranked = scored.select(
        "doc_id",
        F.col("lang").alias("pred_lang"),
        "s",
        F.row_number().over(wdoc).alias("rk"),
        F.lead("s").over(wdoc).alias("s2"),
    ).where(F.col("rk") == 1)
    pm = ranked.join(
        test.select("doc_id", F.col("lang").alias("true_lang")), "doc_id"
    ).select(
        "pred_lang",
        "true_lang",
        F.coalesce(F.col("s") - F.col("s2"), F.lit(3000000)).alias("margin"),
    )
    band = (
        F.when(F.col("margin") < 100000, "a_lt_0.1")
        .when(F.col("margin") < 300000, "b_0.1_0.3")
        .when(F.col("margin") < 1000000, "c_0.3_1")
        .otherwise("d_ge_1")
    )
    correct = F.when(F.col("pred_lang") == F.col("true_lang"), 1).otherwise(0)
    return (
        pm.groupBy(band.alias("margin_band"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(correct).cast("bigint").alias("n_correct"),
            emit(
                F.sum(correct * 100).cast("double") / F.count(F.lit(1))
            ).alias("accuracy_pct"),
        )
        .orderBy("margin_band")
    )
