"""Time-series feature engineering over the events stream: per-key
ordered-window features (lag deltas, moving aggregates, time-bounded
range frames, cumulative sums).

The reference has no time-series surface (SURVEY.md §2.4 "absent");
this rounds out the engine's native analytics on the events table —
the feature-extraction pass a behavioral-model pipeline runs before
training.

Exactness discipline for the double-valued aggregates: every summed
``value`` is cast to DECIMAL(18,6) first, so window sums/averages are
exact integer arithmetic — order-independent and bit-identical in any
engine — and only the emitted column converts to DOUBLE (the
catalog.money discipline applied to window frames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load, register, pround

_DEC = "decimal(18,6)"


def rolling_features(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    rows_window: int = 5,
    range_seconds: int = 600,
) -> DataFrame:
    """Per-key ordered features, one window shuffle total:

      ``seq``           — row_number within key by (ts, event_id)
      ``delta_s``       — seconds since the key's previous event
      ``delta_value``   — value change vs previous event
      ``moving_avg``    — mean of the last ``rows_window`` rows (ROWS frame)
      ``cum_value``     — running total (unbounded preceding)
      ``n_last_10m``    — events in the trailing ``range_seconds`` (RANGE frame)

    All six frames share one partitioning+ordering (key, ts, event_id),
    so Catalyst plans a SINGLE Exchange + Sort and evaluates every
    frame in one Window pass over it — at 100 TB the cost is one
    shuffle of the events table, not six.  Skewed keys (bot users)
    bound the longest partition; salt the key or pre-bucket by day if
    one key exceeds a task's memory.
    """
    order = [F.col(ts_col), F.col("event_id")]
    w = Window.partitionBy(key_col).orderBy(*order)
    w_rows = w.rowsBetween(-(rows_window - 1), 0)
    w_cum = w.rowsBetween(Window.unboundedPreceding, 0)
    # integer `div` of micros, never a double epoch: cast-to-bigint of a
    # fractional double epoch ROUNDS in some engines and FLOORS in
    # others — the same hazard catalog.load documents for nanos
    epoch = F.expr(f"unix_micros({ts_col}) div 1000000")
    w_range = (
        Window.partitionBy(key_col)
        .orderBy(epoch)
        .rangeBetween(-range_seconds, 0)
    )
    dec_val = F.col(value_col).cast(_DEC)
    return events.select(
        key_col,
        "event_id",
        ts_col,
        value_col,
        F.row_number().over(w).alias("seq"),
        (epoch - F.lag(epoch).over(w)).alias("delta_s"),
        (dec_val - F.lag(dec_val).over(w)).cast("double").alias("delta_value"),
        # exact decimal sum -> double, THEN double/bigint division:
        # decimal-division scale rules differ across engines, double
        # division of identical operands cannot
        (
            F.sum(dec_val).over(w_rows).cast("double")
            / F.count(F.lit(1)).over(w_rows)
        ).alias("moving_avg"),
        F.sum(dec_val).over(w_cum).cast("double").alias("cum_value"),
        F.count(F.lit(1)).over(w_range).alias("n_last_10m"),
    )


@register(
    "q61_event_rolling_features",
    sql="""
    SELECT user_id, event_id, ts, value,
           ROW_NUMBER() OVER w AS seq,
           epoch_us(ts) // 1000000
             - LAG(epoch_us(ts) // 1000000) OVER w AS delta_s,
           CAST(CAST(value AS DECIMAL(18,6))
                 - LAG(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
             AS delta_value,
           CAST(SUM(CAST(value AS DECIMAL(18,6)))
                  OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                AS DOUBLE)
                / COUNT(*) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                AS moving_avg,
           CAST(SUM(CAST(value AS DECIMAL(18,6)))
                  OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS cum_value,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
                  RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS n_last_10m
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Per-user rolling feature extraction (relational.timeseries."
        "rolling_features): lag deltas, 5-row moving average, running "
        "total, trailing-10-minute count — six frames, ONE Exchange "
        "(shared partitioning/ordering).  Decimal-cast sums keep window "
        "aggregates exact and engine-portable.",
    tags=("timeseries", "window", "events"),
)
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_features(load(spark, sf_dir, "events"))


def funnel(
    events: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: for each key, the earliest time each
    step of ``steps`` completes, where step k must occur at-or-after
    step k-1's completion time (the product-analytics conversion
    funnel).

    Physical strategy: ONE groupBy shuffle collecting each key's
    per-step sorted timestamp lists, then the cascade
    ``m_k = first(l_k >= m_{k-1})`` evaluates as native array
    expressions (filter + get) — no joins, no per-step passes, no
    Python.  Per-key state is that key's own event times only, the
    same boundedness argument sessionization relies on; a bot key with
    millions of events calls for pre-aggregating per (key, type, hour)
    minima first.

    Output: (key, t_step1..t_stepN, depth) — depth = number of steps
    completed in order.
    """
    aggs = [
        F.array_sort(
            F.collect_list(F.when(F.col(type_col) == s, F.col(ts_col)))
        ).alias(f"_l{i}")
        for i, s in enumerate(steps)
    ]
    g = events.groupBy(key_col).agg(*aggs)
    exprs: list[F.Column] = []
    prev: F.Column | None = None
    for i in range(len(steps)):
        lst = F.col(f"_l{i}")
        if prev is None:
            m = F.get(lst, 0)
        else:
            p = prev
            m = F.get(F.filter(lst, lambda x: x >= p), 0)
        exprs.append(m)
        prev = m
    # m_i non-null implies every earlier stage completed (cascade), so
    # the last non-null stage is the funnel depth
    depth = F.lit(0)
    for i, m in enumerate(exprs):
        depth = F.when(m.isNotNull(), F.lit(i + 1)).otherwise(depth)
    return g.select(
        key_col,
        *[e.alias(f"t_step{i + 1}") for i, e in enumerate(exprs)],
        depth.alias("depth"),
    )


@register(
    "q67_conversion_funnel",
    sql="""
    WITH g AS (
      SELECT user_id,
             list_sort(list(ts) FILTER (WHERE event_type = 'view')) AS l0,
             list_sort(list(ts) FILTER (WHERE event_type = 'click')) AS l1,
             list_sort(list(ts) FILTER (WHERE event_type = 'purchase')) AS l2
      FROM events GROUP BY user_id
    ),
    s1 AS (SELECT user_id, l1, l2, l0[1] AS t_step1 FROM g),
    s2 AS (SELECT user_id, l2, t_step1,
                  list_filter(l1, x -> x >= t_step1)[1] AS t_step2 FROM s1),
    s3 AS (SELECT user_id, t_step1, t_step2,
                  list_filter(l2, x -> x >= t_step2)[1] AS t_step3 FROM s2)
    SELECT user_id, t_step1, t_step2, t_step3,
           CASE WHEN t_step3 IS NOT NULL THEN 3
                WHEN t_step2 IS NOT NULL THEN 2
                WHEN t_step1 IS NOT NULL THEN 1
                ELSE 0 END AS depth
    FROM s3
    """,
    doc="Ordered conversion funnel view->click->purchase (relational."
        "timeseries.funnel): earliest completion time of each stage "
        "with stage k at-or-after stage k-1, plus funnel depth.  ONE "
        "groupBy shuffle; the stage cascade is native array "
        "expressions (sorted per-type lists + filter/get), no joins.",
    tags=("timeseries", "events", "funnel"),
)
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel(
        load(spark, sf_dir, "events"), steps=["view", "click", "purchase"]
    )


def resample_fill_gaps(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "1 hour",
) -> DataFrame:
    """Gap-filled resampling (the hypertable ``time_bucket_gapfill``):
    bucket each key's events, then DENSIFY — every key gets a row for
    EVERY bucket between its first and last event, with count 0 where
    nothing happened and the running last observed bucket-sum carried
    forward (LOCF).

    Downstream models need dense regular series; a groupBy alone emits
    only occupied buckets, silently skipping the gaps that often carry
    the signal (outages!).

    Physical strategy: aggregate first (shuffle on (key, bucket) —
    grain-sized), then per-key ``sequence(min, max, interval)`` +
    explode generates the dense spine (rows ∝ buckets, not events),
    left-joins the aggregate back on its own partitioning, and one
    window pass carries values forward.  The events table shuffles
    exactly once, at aggregate grain.

    Output: (key, bucket_start, n_events, bucket_sum, filled_sum).
    """
    dec_val = F.col(value_col).cast(_DEC)
    b = F.window(F.col(ts_col), bucket).start.alias("bucket_start")
    agg = events.groupBy(F.col(key_col), b).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec_val).cast("double").alias("bucket_sum"),
    )
    spine = (
        agg.groupBy(key_col)
        .agg(
            F.min("bucket_start").alias("_lo"),
            F.max("bucket_start").alias("_hi"),
        )
        .select(
            key_col,
            F.explode(
                F.sequence("_lo", "_hi", F.expr(f"INTERVAL {bucket}"))
            ).alias("bucket_start"),
        )
    )
    dense = spine.join(agg, [key_col, "bucket_start"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return dense.select(
        key_col,
        "bucket_start",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "bucket_sum",
        F.last("bucket_sum", ignorenulls=True).over(w).alias("filled_sum"),
    )


@register(
    "q73_resample_gapfill",
    sql="""
    WITH agg AS (
      SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS bucket_start,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS bucket_sum
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(bucket_start) AS lo, MAX(bucket_start) AS hi
      FROM agg GROUP BY 1
    ),
    spine AS (
      SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_start
      FROM bounds
    ),
    dense AS (
      SELECT s.event_type, s.bucket_start, a.n_events, a.bucket_sum
      FROM spine s LEFT JOIN agg a USING (event_type, bucket_start)
    )
    SELECT event_type, bucket_start,
           COALESCE(n_events, 0) AS n_events,
           bucket_sum,
           LAST_VALUE(bucket_sum IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY bucket_start
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum
    FROM dense
    """,
    doc="Gap-filled hourly resampling per event_type (relational."
        "timeseries.resample_fill_gaps): dense bucket spine via "
        "sequence+explode, zero-filled counts, LOCF carry-forward of "
        "the bucket sum — TimescaleDB's time_bucket_gapfill/locf as "
        "DataFrame composition.  Events shuffle ONCE at aggregate "
        "grain; the spine is rows-per-bucket, not rows-per-event.",
    tags=("timeseries", "events", "window"),
)
def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resample_fill_gaps(load(spark, sf_dir, "events"))


def rolling_zscore(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    rows_window: int = 5,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Rolling z-score anomaly detection: each event scored against
    the mean/stddev of the ``rows_window`` rows STRICTLY BEFORE it —
    the streaming outlier flag monitoring pipelines attach to metric
    streams.  The frame must EXCLUDE the current row: an inclusive
    n-row window bounds |z| at (n-1)/sqrt(n) (~1.79 for n=5), so an
    inclusive formulation can never fire a 3-sigma flag at all.

    Exactness discipline: windowed SUM(x) and SUM(x^2) run in EXACT
    decimal (x is 2dp-exact, x^2 6dp-exact in DECIMAL(38,12)), so the
    variance formula (s2 - s1*s1/n)/(n-1) sees bit-identical operands
    in any engine and the usual cancellation hazard of E[x^2]-E[x]^2
    never meets floating-point partial sums.  One Exchange (same
    window family as rolling_features).

    Output: (key, event_id, ts, value, zscore, is_anomaly) — zscore
    null for histories with fewer than 2 rows or zero variance.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col("event_id"))
        .rowsBetween(-rows_window, -1)
    )
    dec_val = F.col(value_col).cast(_DEC)
    s1 = F.sum(dec_val).over(w).cast("double")
    s2 = F.sum((dec_val * dec_val).cast("decimal(38,12)")).over(w).cast("double")
    n = F.count(F.lit(1)).over(w).cast("double")
    var = (s2 - s1 * s1 / n) / (n - F.lit(1.0))
    mean = s1 / n
    z = F.when(
        (n > 1) & (var > 0),
        (F.col(value_col) - mean) / F.sqrt(var),
    )
    return events.select(
        key_col,
        "event_id",
        ts_col,
        value_col,
        pround(z, 6).alias("zscore"),
        F.when(z.isNotNull(), F.abs(z) > z_threshold).alias("is_anomaly"),
    )


@register(
    "q78_rolling_zscore_anomalies",
    sql="""
    WITH w AS (
      SELECT user_id, event_id, ts, value,
             CAST(SUM(CAST(value AS DECIMAL(18,6)))
                  OVER win AS DOUBLE) AS s1,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,6))
                           * CAST(value AS DECIMAL(18,6)) AS DECIMAL(38,12)))
                  OVER win AS DOUBLE) AS s2,
             CAST(COUNT(*) OVER win AS DOUBLE) AS n
      FROM events
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, ts, value,
           CAST(ROUND((CASE WHEN n > 1 AND (s2 - s1*s1/n)/(n - 1.0) > 0
                 THEN (value - s1/n) / sqrt((s2 - s1*s1/n)/(n - 1.0))
                 END) * 1e6) AS BIGINT) / 1e6 AS zscore,
           CASE WHEN n > 1 AND (s2 - s1*s1/n)/(n - 1.0) > 0
                THEN abs((value - s1/n) / sqrt((s2 - s1*s1/n)/(n - 1.0))) > 3.0
                END AS is_anomaly
    FROM w
    """,
    doc="Rolling z-score anomaly detection per user (relational."
        "timeseries.rolling_zscore, 5-row PRECEDING window — inclusive "
        "frames bound |z| below any useful threshold): windowed "
        "SUM(x)/SUM(x^2) in EXACT decimal, variance assembled in "
        "double from bit-identical operands — cancellation-free and "
        "engine-portable.  One Exchange.",
    tags=("timeseries", "events", "window", "anomaly"),
)
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_zscore(load(spark, sf_dir, "events"))


def _assign_sessions(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    out_col: str = "session_id",
) -> DataFrame:
    """THE inactivity-session definition (q12/q32/q80/q190 all share
    it): a gap > ``gap_seconds`` between consecutive events of a key
    starts a new session; ``out_col`` gets the per-key 1-based session
    number via one lag + running-sum window.  Single source so a
    future change to the gap semantics cannot silently diverge the
    batch queries from each other.  (The STREAMING sessionizer,
    streaming.stateful.session_summaries, deliberately differs at the
    boundary: it splits on gap >= gap at microsecond precision, while
    this splits on gap > gap at whole-second precision — see its
    docstring before swapping one for the other.)"""
    epoch = F.expr(f"unix_micros({ts_col}) div 1000000")
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(id_col))
    new_sess = (
        (epoch - F.lag(epoch).over(w) > gap_seconds)
        | F.lag(epoch).over(w).isNull()
    ).cast("int")
    return events.withColumn(
        out_col,
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_conversion(
    events: DataFrame,
    gap_seconds: int = 1800,
    first_type: str = "view",
    goal_type: str = "purchase",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Sessionized conversion: split each key's events into inactivity
    sessions (gap > ``gap_seconds`` starts a new one — q12/q32's
    semantics), then flag sessions where a ``goal_type`` event happens
    at-or-after the session's first ``first_type`` event.  The
    per-session complement of the global funnel (q67): did THIS visit
    convert, not did this user ever.

    Output: (key, session_id, session_start, n_events, converted).

    Scale: session assignment is one lag+cumsum window; the per-session
    check aggregates sorted per-type ts lists and evaluates as array
    expressions — two shuffles total on the same key family.
    """
    with_sess = _assign_sessions(events, gap_seconds, key_col, ts_col)
    g = with_sess.groupBy(key_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        F.array_sort(
            F.collect_list(F.when(F.col(type_col) == first_type, F.col(ts_col)))
        ).alias("_lf"),
        F.array_sort(
            F.collect_list(F.when(F.col(type_col) == goal_type, F.col(ts_col)))
        ).alias("_lg"),
    )
    first_t = F.get(F.col("_lf"), 0)
    goal_t = F.get(F.filter(F.col("_lg"), lambda x: x >= first_t), 0)
    return g.select(
        key_col,
        "session_id",
        "session_start",
        "n_events",
        (first_t.isNotNull() & goal_t.isNotNull()).alias("converted"),
    )


@register(
    "q80_session_conversion",
    sql="""
    WITH marked AS (
      SELECT user_id, event_id, ts, event_type,
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
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    ),
    g AS (
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             MIN(ts) AS session_start,
             COUNT(*) AS n_events,
             list_sort(list(ts) FILTER (WHERE event_type = 'view')) AS lf,
             list_sort(list(ts) FILTER (WHERE event_type = 'purchase')) AS lg
      FROM sess GROUP BY user_id, session_id
    )
    SELECT user_id, session_id, session_start, n_events,
           lf[1] IS NOT NULL
             AND list_filter(lg, x -> x >= lf[1])[1] IS NOT NULL AS converted
    FROM g
    """,
    doc="Sessionized conversion (relational.timeseries."
        "session_conversion): 30-min inactivity sessions (q12's "
        "semantics), converted = a purchase at-or-after the session's "
        "first view — the per-visit complement of the global funnel "
        "q67.  Two shuffles on the user key family.",
    tags=("timeseries", "events", "funnel", "session"),
)
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_conversion(load(spark, sf_dir, "events"))


def cohort_retention(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users are cohorted by the week of
    their FIRST event; for every (cohort, week-offset) cell, count the
    cohort's users active that week — the retention triangle every
    product-analytics stack computes.

    Physical strategy: one window (min week per key, reusing the
    key-hash distribution), distinct (key, cohort, week) at key grain,
    then a cell-grain count-distinct — shuffles shrink monotonically:
    events -> key weeks -> cells.

    Output: (cohort_week, week_offset, n_active_users).
    """
    week = F.date_trunc("week", F.col(ts_col))
    w = Window.partitionBy(key_col)
    with_cohort = events.select(
        F.col(key_col), week.alias("_wk")
    ).withColumn("_cohort", F.min("_wk").over(w))
    cells = with_cohort.distinct().select(
        F.col(key_col),
        F.col("_cohort").cast("date").cast("string").alias("cohort_week"),
        (F.datediff(F.col("_wk"), F.col("_cohort")) / 7).cast("int").alias("week_offset"),
    )
    return cells.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct(key_col).alias("n_active_users")
    )


@register(
    "q85_cohort_retention",
    sql="""
    WITH wk AS (
      SELECT user_id, date_trunc('week', ts) AS w FROM events
    ),
    coh AS (
      SELECT user_id, w,
             MIN(w) OVER (PARTITION BY user_id) AS cohort
      FROM wk
    ),
    cells AS (
      SELECT DISTINCT user_id,
             CAST(CAST(cohort AS DATE) AS VARCHAR) AS cohort_week,
             CAST(date_diff('day', cohort, w) // 7 AS INT) AS week_offset
      FROM coh
    )
    SELECT cohort_week, week_offset, COUNT(DISTINCT user_id) AS n_active_users
    FROM cells GROUP BY cohort_week, week_offset
    """,
    doc="Weekly cohort retention triangle (relational.timeseries."
        "cohort_retention): cohort = week of first activity, cells "
        "count active users per week offset.  Shuffles shrink "
        "events -> key weeks -> cells; cohort week emitted as an ISO "
        "string (DATE outputs are hash-hazard, see the oracle-type "
        "test).",
    tags=("timeseries", "events", "cohort"),
)
def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cohort_retention(load(spark, sf_dir, "events"))


def transition_counts(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    k: int = 25,
) -> DataFrame:
    """Behavioral transition mining: count consecutive event-type
    pairs (A then B) within each key's timeline, globally ranked —
    the first-order Markov view of user behavior (what follows what),
    feeding next-action models and UX funnels.

    One window shuffle (lag over the key ordering) + one pair-count
    aggregation; ranking fully tie-broken for a deterministic top-k.

    Output: (from_type, to_type, n_transitions).
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col("event_id"))
    pairs = events.select(
        F.lag(type_col).over(w).alias("from_type"),
        F.col(type_col).alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    return (
        pairs.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy(F.desc("n_transitions"), F.asc("from_type"), F.asc("to_type"))
        .limit(k)
    )


@register(
    "q91_event_transitions",
    sql="""
    WITH p AS (
      SELECT LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS from_type,
             event_type AS to_type
      FROM events
    )
    SELECT from_type, to_type, COUNT(*) AS n_transitions
    FROM p WHERE from_type IS NOT NULL
    GROUP BY 1, 2
    ORDER BY n_transitions DESC, from_type, to_type
    LIMIT 25
    """,
    doc="First-order event-type transition counts (relational."
        "timeseries.transition_counts): consecutive (A then B) pairs "
        "per user timeline, global top-25 — the Markov view of "
        "behavior feeding next-action models.  One window shuffle + "
        "one pair aggregation; fully tie-broken ranking.",
    tags=("timeseries", "events", "markov"),
)
def q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transition_counts(load(spark, sf_dir, "events"))


def last_touch_attribution(
    events: DataFrame,
    goal_type: str = "purchase",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Last-touch attribution: for every goal event, the most recent
    PRECEDING non-goal event type in the same key's timeline — the
    marketing-attribution primitive (which touchpoint gets credit for
    this conversion), plus the global credit distribution downstream.

    One window pass: last(non-goal type, ignorenulls) over the rows
    strictly before each event, filtered to goals.  No joins.

    Output: (key, event_id, ts, attributed_to) — attributed_to null
    when the goal is the key's first event.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col(type_col) != goal_type, F.col(type_col)), ignorenulls=True
    ).over(w)
    return (
        events.withColumn("attributed_to", touch)
        .where(F.col(type_col) == goal_type)
        .select(key_col, "event_id", ts_col, "attributed_to")
    )


@register(
    "q93_last_touch_attribution",
    sql="""
    WITH t AS (
      SELECT user_id, event_id, ts, event_type,
             LAST_VALUE(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS attributed_to
      FROM events
    )
    SELECT user_id, event_id, ts, attributed_to
    FROM t WHERE event_type = 'purchase'
    """,
    doc="Last-touch attribution (relational.timeseries."
        "last_touch_attribution): each purchase credited to the most "
        "recent preceding non-purchase event in the user's timeline — "
        "one ignorenulls window pass, no joins.  Null when the "
        "purchase is the user's first event.",
    tags=("timeseries", "events", "attribution"),
)
def q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    return last_touch_attribution(load(spark, sf_dir, "events"))


@register(
    "q95_activity_heatmap",
    sql="""
    SELECT CAST(isodow(ts) AS INT) AS dow_iso,
           CAST(hour(ts) AS INT) AS hour,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    doc="Weekday x hour activity heatmap: event counts and decimal-"
        "exact value totals per (ISO weekday, hour) cell — the ops "
        "dashboard grid.  Weekday numbering is the classic cross-"
        "engine trap (Spark dayofweek is 1=Sunday, DuckDB dayofweek "
        "is 0=Sunday): both sides pin ISO numbering (1=Monday) "
        "explicitly — Spark weekday()+1, DuckDB isodow().  One "
        "partial-aggregated shuffle over 168 cells.",
    tags=("timeseries", "events", "agg"),
)
def q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        (F.expr("weekday(ts)") + 1).cast("int").alias("dow_iso"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .cast("double")
        .alias("total_value"),
    )


@register(
    "q100_rolling_dau",
    sql="""
    WITH daily AS (
      SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
             COUNT(DISTINCT user_id) AS dau
      FROM events GROUP BY 1
    )
    SELECT day, dau,
           CAST(CAST(SUM(dau) OVER (ORDER BY day
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
                AS DOUBLE)
             / COUNT(*) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             AS avg_dau_7d
    FROM daily
    """,
    doc="Daily active users with 7-day rolling average — the growth "
        "dashboard's headline pair.  The distinct-count shuffles at "
        "(day, user) grain; the rolling window runs over day-grain "
        "rows (one per day regardless of fact scale).  Integer sums "
        "through the BIGINT pin (DuckDB HUGEINT discipline), division "
        "on identical operands.",
    tags=("timeseries", "events", "agg"),
)
def q100(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").cast("string").alias("day")
    ).agg(F.countDistinct("user_id").alias("dau"))
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        "dau",
        (
            F.sum("dau").over(w).cast("double") / F.count(F.lit(1)).over(w)
        ).alias("avg_dau_7d"),
    )


def trailing_ewma(
    df: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    value_col: str = "value",
    depth: int = 8,
    decay: float = 0.5,
) -> DataFrame:
    """Exponentially-weighted trailing features over the last ``depth``
    events per key: appends ``ewma{depth}`` (decay-weighted mean,
    weight decay**j for the j-th most recent value), ``sma{depth}``
    (plain trailing mean) and ``n_trail`` (values present) to every
    row — the feature-engineering primitive for recency-weighted user
    state (fraud velocity, engagement decay, rate baselines).

    A true infinite-horizon EWMA is a sequential recurrence — on an
    engine it either becomes a per-key sequential scan or a
    numerically explosive prefix-product trick.  The BOUNDED-depth
    form is the distributed-native shape: ``depth`` ``lag()`` columns
    over one hash(key) window, pure codegen, one shuffle — and the
    dropped tail carries at most decay**depth (<0.4%% at 8/0.5) of the
    weight, which is noise for feature purposes.  Missing leads
    (early rows) and NULL values renormalize the weight mass over the
    values actually present, so early-history rows are unbiased
    instead of zero-padded.

    Exactness: each term is fixed-position arithmetic (no aggregation
    order), so the expression is bit-deterministic and a SQL twin
    computing the SAME left-to-right sum hash-matches.
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    num = F.lit(0.0)
    den = F.lit(0.0)
    cnt = F.lit(0)
    sm = F.lit(0.0)
    for j in range(depth):
        v = F.col(value_col) if j == 0 else F.lag(value_col, j).over(w)
        present = v.isNotNull()
        num = num + F.when(present, v * F.lit(decay**j)).otherwise(F.lit(0.0))
        den = den + F.when(present, F.lit(decay**j)).otherwise(F.lit(0.0))
        sm = sm + F.when(present, v).otherwise(F.lit(0.0))
        cnt = cnt + present.cast("int")
    # a row whose whole trailing window is NULL has no feature value:
    # NULL, not a 0/0 artifact
    return df.select(
        "*",
        F.when(cnt > 0, pround(num / den, 6)).alias(f"ewma{depth}"),
        F.when(cnt > 0, pround(sm / cnt, 6)).alias(f"sma{depth}"),
        cnt.alias("n_trail"),
    )


def linear_attribution(
    events: DataFrame,
    gap_seconds: int = 1800,
    goal_type: str = "purchase",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Linear multi-touch attribution: each goal event's value splits
    EQUALLY across every preceding touchpoint in the same inactivity
    session (q80's session semantics); goals with no preceding touch
    report under ``__unattributed__``.  The equal-credit counterpart
    of last_touch_attribution (q93) — together they bracket the
    single-touch vs multi-touch marketing models.

    Integer-exact split (the q165/q172 money rule): value lands as
    CENTS, each touch gets floor(cents*1e4 / n) dollar-micros and the
    EARLIEST touch absorbs the remainder (largest-remainder style), so
    per-goal credits sum to the goal's value exactly and every engine
    agrees bit-for-bit; the single double division happens once at
    output.  Floor is computed as ``(a - pmod(a, n)) div n`` — Spark's
    ``div`` truncates toward zero, which for NEGATIVE goal values
    (refunds) would hand the earliest touch a negative remainder and
    diverge from DuckDB's flooring ``//``; subtracting the
    always-non-negative pmod first makes the quotient a true floor and
    the remainder non-negative for every sign.

    Scale: session assignment is one lag+cumsum window; the
    touch-to-goal expansion joins WITHIN (key, session) only —
    bounded by session sizes, never cross-user; credit windows run on
    the pair grain partitioned by goal.  Three shuffles on the same
    key family.
    """
    base = _assign_sessions(
        events, gap_seconds, key_col, ts_col, id_col, out_col="_sid"
    ).select(
        F.col(key_col).alias("_k"),
        "_sid",
        F.col(id_col).alias("_id"),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_ty"),
        F.round(F.col(value_col) * 100).cast("bigint").alias("_cents"),
    )
    goals = base.where(F.col("_ty") == goal_type).select(
        "_k", "_sid",
        F.col("_id").alias("_pid"),
        F.col("_ts").alias("_pts"),
        "_cents",
    )
    touches = base.where(F.col("_ty") != goal_type).select(
        "_k", "_sid",
        F.col("_id").alias("_tid"),
        F.col("_ts").alias("_tts"),
        F.col("_ty").alias("touchpoint"),
    )
    pairs = touches.join(goals, ["_k", "_sid"]).where(
        (F.col("_tts") < F.col("_pts"))
        | ((F.col("_tts") == F.col("_pts")) & (F.col("_tid") < F.col("_pid")))
    )
    pw = Window.partitionBy("_k", "_sid", "_pid")
    ranked = pairs.select(
        "touchpoint",
        "_cents",
        F.count(F.lit(1)).over(pw).alias("_n"),
        F.row_number()
        .over(pw.orderBy(F.col("_tts"), F.col("_tid")))
        .alias("_rn"),
    )
    # true FLOOR division (see docstring): pmod >= 0, so the adjusted
    # numerator is exactly divisible and `div` returns the floor.
    share = F.expr(
        "(_cents * 10000 - pmod(_cents * 10000, _n)) div _n"
    )
    credit = share + F.when(
        F.col("_rn") == 1, F.expr("pmod(_cents * 10000, _n)")
    ).otherwise(F.lit(0))
    attributed = ranked.groupBy("touchpoint").agg(
        F.count(F.lit(1)).alias("n_credits"),
        F.sum(credit).alias("_micros"),
    )
    unattributed = (
        goals.join(
            pairs.select("_pid").distinct(), "_pid", "left_anti"
        )
        .groupBy(F.lit("__unattributed__").alias("touchpoint"))
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.sum(F.col("_cents") * 10000).alias("_micros"),
        )
    )
    return attributed.unionByName(unattributed).select(
        "touchpoint",
        "n_credits",
        pround(F.col("_micros").cast("double") / 1e6, 6).alias("attributed_value"),
    )


def position_attribution(
    events: DataFrame,
    gap_seconds: int = 1800,
    goal_type: str = "purchase",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: 40% of each
    goal's value to the FIRST same-session touch, 40% to the LAST,
    and the remaining 20% split equally over the middles — completing
    the attribution family (last-touch q93, linear q190; this is the
    industry's U-shaped model).  One touch takes 100%; two touches
    split 50/50.

    Integer-exact (the q190 money rule): value lands as dollar-micros,
    the 40% shares are floor(total*4/10), the middle pool is whatever
    remains after both ends (so the three buckets always sum to the
    goal's value exactly), and within the middles the EARLIEST absorbs
    the pool's remainder (largest-remainder).  Every division is a
    TRUE floor via ``(a - pmod(a, n)) div n`` so refunds (negative
    values) agree with DuckDB's flooring ``//`` bit-for-bit.

    Scale: identical physical shape to linear_attribution — one
    lag+cumsum session window, a (key, session)-bounded touch-goal
    expansion, credit windows on the pair grain.  Three shuffles on
    one key family.
    """
    base = _assign_sessions(
        events, gap_seconds, key_col, ts_col, id_col, out_col="_sid"
    ).select(
        F.col(key_col).alias("_k"),
        "_sid",
        F.col(id_col).alias("_id"),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_ty"),
        F.round(F.col(value_col) * 100).cast("bigint").alias("_cents"),
    )
    goals = base.where(F.col("_ty") == goal_type).select(
        "_k", "_sid",
        F.col("_id").alias("_pid"),
        F.col("_ts").alias("_pts"),
        "_cents",
    )
    touches = base.where(F.col("_ty") != goal_type).select(
        "_k", "_sid",
        F.col("_id").alias("_tid"),
        F.col("_ts").alias("_tts"),
        F.col("_ty").alias("touchpoint"),
    )
    pairs = touches.join(goals, ["_k", "_sid"]).where(
        (F.col("_tts") < F.col("_pts"))
        | ((F.col("_tts") == F.col("_pts")) & (F.col("_tid") < F.col("_pid")))
    )
    pw = Window.partitionBy("_k", "_sid", "_pid")
    ranked = pairs.select(
        "touchpoint",
        (F.col("_cents") * 10000).alias("_total"),
        F.count(F.lit(1)).over(pw).alias("_n"),
        F.row_number()
        .over(pw.orderBy(F.col("_tts"), F.col("_tid")))
        .alias("_rn"),
    )
    # all floors are (a - pmod(a, n)) div n — see linear_attribution
    credit = F.expr(
        """
        CASE WHEN _n = 1 THEN _total
             WHEN _n = 2 THEN
               (_total - pmod(_total, 2)) div 2
               + CASE WHEN _rn = 1 THEN pmod(_total, 2) ELSE 0 END
             ELSE
               CASE WHEN _rn = 1 OR _rn = _n THEN
                      (_total * 4 - pmod(_total * 4, 10)) div 10
                    ELSE
                      ((_total - 2 * ((_total * 4 - pmod(_total * 4, 10))
                                      div 10))
                       - pmod(_total - 2 * ((_total * 4
                                             - pmod(_total * 4, 10)) div 10),
                              _n - 2)) div (_n - 2)
                      + CASE WHEN _rn = 2 THEN
                          pmod(_total - 2 * ((_total * 4
                                              - pmod(_total * 4, 10)) div 10),
                               _n - 2)
                        ELSE 0 END
               END
        END
        """
    )
    attributed = ranked.groupBy("touchpoint").agg(
        F.count(F.lit(1)).alias("n_credits"),
        F.sum(credit).alias("_micros"),
    )
    unattributed = (
        goals.join(
            pairs.select("_pid").distinct(), "_pid", "left_anti"
        )
        .groupBy(F.lit("__unattributed__").alias("touchpoint"))
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.sum(F.col("_cents") * 10000).alias("_micros"),
        )
    )
    return attributed.unionByName(unattributed).select(
        "touchpoint",
        "n_credits",
        pround(F.col("_micros").cast("double") / 1e6, 6).alias("attributed_value"),
    )


def reflected_running_balance(
    deltas: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    delta_col: str = "delta",
    id_col: str = "event_id",
) -> DataFrame:
    """Floor-at-zero running balance per key — inventory that cannot
    go negative, credits that cannot overdraw: b_t = max(0, b_{t-1} +
    delta_t).  The recurrence is NON-associative, so it looks like it
    needs a stateful per-row scan; the Skorokhod reflection closed
    form makes it two plain window aggregates instead:

        B_t = X_t - least(0, min_{s<=t} X_s)

    where X is the UNCLIPPED cumulative sum — i.e. the running minimum
    of the free walk is exactly the total clipping ever applied.
    Property-tested against the sequential fold.

    Scale: ONE hash(key) exchange; both windows (cumsum and running
    min) share the same sort.  Integer deltas in, integer balances out
    — bit-identical across engines.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    x = F.sum(delta_col).over(w)
    # the running min OF the cumsum needs the cumsum materialized first
    # (nested window functions are illegal in one expression)
    with_x = deltas.withColumn("_x", x)
    clipped = F.least(F.lit(0).cast("long"), F.min("_x").over(w))
    return with_x.select(
        key_col,
        ts_col,
        id_col,
        F.col(delta_col),
        (F.col("_x") - clipped).cast("long").alias("balance"),
    )
