"""Stream-stream joins over event-time.

The reference's streaming surface is one-blob-one-batch micro-batching
(SURVEY.md §2.5) with no joins; this is the native Spark capability the
engine adds: watermarked stream-stream interval joins, where state for
each side is bounded by (watermark + interval) instead of growing with
the stream.

Dual-mode like streaming/windows.py: the same function serves batch
DataFrames (faces the DuckDB oracle via the q37 interval-join twin in
relational/joins.py) and streaming DataFrames (exercised with file
feeds in tests/test_streaming.py) — batch/streaming parity is the
correctness story.

Scale posture: the join key carries (key, time-bucket) semantics —
Spark co-partitions both streams on the equi-key; the time-range
predicate bounds per-key state.  Skewed keys: salt the equi-key, the
range predicate is unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int = 3600,
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join right-side events that fall within ``window_seconds`` AFTER
    each left-side event, per key.

    Streaming mode: BOTH sides get watermarks — the range condition
    lets Spark expire right-side state older than (watermark +
    window) and left-side state older than watermark; without the
    range bound a stream-stream join's state grows forever.
    Batch mode: the same predicate, a plain range join.

    Column contract: right's ts surfaces as ``right_ts_out`` so the
    output schema is join-order-stable.
    """
    l = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    l = l.select(
        F.col(on).alias("_lk"),
        F.col(left_ts).alias("_lts"),
        *[c for c in left.columns if c not in (on, left_ts)],
    )
    r = r.select(
        F.col(on).alias("_rk"),
        F.col(right_ts).alias("_rts"),
        *[
            F.col(c).alias(f"right_{c}")
            for c in right.columns
            if c not in (on, right_ts)
        ],
    )
    cond = (
        (F.col("_lk") == F.col("_rk"))
        & (F.col("_rts") > F.col("_lts"))
        & (F.col("_rts") <= F.col("_lts") + F.expr(f"INTERVAL {window_seconds} SECONDS"))
    )
    return (
        l.join(r, cond, how)
        .drop("_rk")
        .withColumnRenamed("_lk", on)
        .withColumnRenamed("_lts", left_ts)
        .withColumnRenamed("_rts", "right_ts_out")
    )
