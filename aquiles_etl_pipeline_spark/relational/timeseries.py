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

from .catalog import load, register

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
