"""Event-time windowed aggregations over the ``events`` stream table.

The reference's "streaming" is one-blob-one-batch micro-batching with no
event-time semantics (SURVEY.md §2.5) — these operators are the native
Spark capabilities the engine adds on top: tumbling / sliding / session
windows with watermark-based late-data handling.

Every function is **dual-mode**: it takes either a batch or a streaming
DataFrame with an event-time ``ts`` column and returns the same logical
aggregation — batch mode feeds the DuckDB oracle gate (catalog
q30–q32), streaming mode is exercised with file-source feeds in
tests/test_streaming.py.  That duality is the correctness story: the
streaming output must equal the batch output over the same rows.

Scale posture (100 TB of events): the groupBy keys are
(window, event_type) or (session, user_id) — high-cardinality and
uniform, so partial aggregation shrinks the shuffle to the distinct-key
count; in streaming mode the watermark bounds state size, which is the
thing that actually matters for an unbounded source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def _dec(col: str) -> Column:
    # decimal-sum discipline: see relational.catalog.money — exact,
    # order-independent, identical between Spark and DuckDB.  The SUM
    # itself stays decimal; the emitted column is cast to double
    # (relational.catalog.emit rationale: decimal outputs render with
    # trailing zeros in the driver's hash canon and mismatch DuckDB).
    return F.col(col).cast(DEC)


def _with_watermark(events: DataFrame, watermark: str | None) -> DataFrame:
    if watermark and events.isStreaming:
        return events.withWatermark("ts", watermark)
    return events


def dedup_events(
    df: DataFrame,
    keys: list[str] | tuple[str, ...] = ("event_id",),
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Exactly-once event dedup, dual-mode.

    Streaming: ``dropDuplicatesWithinWatermark`` — state holds only keys
    younger than the watermark, so memory is bounded by (arrival rate x
    watermark), not stream length; a duplicate arriving later than the
    watermark is by definition outside the lateness contract.
    Batch: plain ``dropDuplicates`` over the same keys.
    """
    keys = list(keys)
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def tumbling_stats(
    events: DataFrame, duration: str = "5 minutes", watermark: str | None = None
) -> DataFrame:
    """Per-(tumbling-window, event_type) counts and value sums."""
    src = _with_watermark(events, watermark)
    return (
        src.groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_dec("value")).cast(DEC).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_stats(
    events: DataFrame,
    duration: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window stats: each event lands in duration/slide windows."""
    src = _with_watermark(events, watermark)
    return (
        src.groupBy(F.window("ts", duration, slide).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_dec("value")).cast(DEC).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_stats(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = None
) -> DataFrame:
    """Per-user session windows (sessions split when consecutive events
    are >= ``gap`` apart — Spark merges the per-event [ts, ts+gap)
    windows, so a gap of exactly ``gap`` starts a new session).

    Output is watermark-mode-agnostic: session identity is
    (user_id, session_start = first event ts); ``last_ts`` rather than
    the session_window end (which bakes in the gap) keeps the DuckDB
    gaps-and-islands oracle trivial.
    """
    src = _with_watermark(events, watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_ts"),
            F.sum(_dec("value")).cast(DEC).cast("double").alias("sum_value"),
        )
        .select("user_id", "session_start", "last_ts", "n_events", "sum_value")
    )
