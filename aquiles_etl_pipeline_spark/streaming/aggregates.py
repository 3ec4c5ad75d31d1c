"""Streaming continuous aggregates: a file-source document stream
maintaining the warehouse corpus-stats rollup incrementally.

Combines the two halves the engine already owns — checkpointed
micro-batch ingest (streaming.ingest) and additive rollup merges
(merge.incremental.refresh_additive) — into the classic continuous-
aggregate pattern: each micro-batch is aggregated to the rollup grain
and merged into the stored table; the full document history is never
re-scanned.  Exactly-once effect: foreachBatch delivery is
at-least-once (a crash between the rollup flip and the checkpoint
commit redelivers the batch), so the merge is made idempotent per
batch — the applied batch_id commits atomically WITH the rollup
generation (``Warehouse.overwrite(meta=)``), and a redelivered
batch_id ≤ the stamped one is skipped.

At 100 TB this is THE way summary tables stay fresh: rollup cost per
trigger is O(batch + |rollup|), independent of corpus history size.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from ..merge.incremental import corpus_stats_delta, refresh_additive
from ..merge.warehouse import Warehouse
from ..sources.jsonl import CORRUPT_COL

_KEYS = ["lang", "source"]
_MINMAX = {"min_tokens": "min", "max_tokens": "max"}


@dataclass
class StreamAggStats:
    n_batches: int = 0
    n_docs: int = 0


def stream_corpus_stats(
    spark: SparkSession,
    input_dir: str,
    warehouse: Warehouse,
    checkpoint_dir: str,
    table: str = "corpus_stats",
    max_files_per_trigger: int | None = None,
) -> StreamAggStats:
    """Stream JSONL documents from ``input_dir`` (schema: doc_id, text,
    lang, source) and maintain the per-(lang, source) corpus-stats
    rollup in ``warehouse``.  Runs with Trigger.AvailableNow (drain
    what's there, then stop) — call again as more files land; the
    checkpoint ensures already-processed files are never re-counted.

    The checkpoint and the rollup table are a unit: batch ids are
    monotonic per checkpoint, and the rollup generation is stamped with
    the last applied id — pair a fresh checkpoint_dir with a fresh
    ``table`` (not one previously fed from another checkpoint).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField(CORRUPT_COL, StringType()),
        ]
    )
    stats = StreamAggStats()

    def _merge_batch(batch_df, batch_id: int) -> None:
        # idempotence gate: batch ids are monotonic per checkpoint; a
        # redelivered batch (crash after the rollup flip, before the
        # checkpoint commit) carries an id ≤ the one stamped on the
        # current rollup generation and must not double-count
        meta = warehouse.write_meta(table) or {}
        if batch_id <= meta.get("last_batch_id", -1):
            stats.n_batches += 1
            return
        clean = batch_df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
        delta = corpus_stats_delta(clean).cache()
        try:
            n = delta.agg(F.sum("n_docs")).collect()[0][0] or 0
            if n:
                refresh_additive(
                    warehouse, table, delta, _KEYS, _MINMAX,
                    meta={"last_batch_id": batch_id},
                )
            stats.n_batches += 1
            stats.n_docs += int(n)
        finally:
            delta.unpersist()

    stream = (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if max_files_per_trigger:
        stream = stream.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        stream.json(input_dir)
        .writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stats


def stream_daily_active_bitmaps(
    spark: SparkSession,
    input_dir: str,
    warehouse: Warehouse,
    checkpoint_dir: str,
    table: str = "dau_bitmap",
) -> StreamAggStats:
    """Maintain EXACT daily-active-user counts incrementally over a
    JSONL event stream (schema: day string, user_id long, event_id
    long) — the non-additive aggregate made additive.

    COUNT(DISTINCT) cannot merge across batches as a scalar (a user
    seen in two batches must count once), which is why streaming DAU
    is usually surrendered to approximate HLL.  Stored as per-(day,
    word) 64-bit bitmap words it becomes a mergeable sketch with NO
    approximation: each micro-batch reduces to its own word-grain
    bitmaps (relational.sketches shape) and ``bit_or``-merges into the
    rollup — idempotent per word, exact under any batch split, cost
    O(batch + touched words) per trigger.  n_events rides along as a
    plain additive sum.  Same exactly-once discipline as
    stream_corpus_stats: the applied batch_id commits atomically with
    the rollup generation, redelivered batches are skipped.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("day", StringType()),
            StructField("user_id", LongType()),
            StructField("event_id", LongType()),
            StructField(CORRUPT_COL, StringType()),
        ]
    )
    stats = StreamAggStats()

    def _merge_batch(batch_df, batch_id: int) -> None:
        meta = warehouse.write_meta(table) or {}
        if batch_id <= meta.get("last_batch_id", -1):
            stats.n_batches += 1
            return
        clean = batch_df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
        delta = (
            clean.select(
                "day",
                F.expr("user_id div 64").alias("word"),
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT))"
                ).alias("bit"),
            )
            .groupBy("day", "word")
            .agg(F.bit_or("bit").alias("bits"), F.count("*").alias("n_events"))
            .cache()
        )
        try:
            n = delta.agg(F.sum("n_events")).collect()[0][0] or 0
            if n:
                refresh_additive(
                    warehouse, table, delta, ["day", "word"],
                    {"bits": "bit_or", "n_events": "sum"},
                    meta={"last_batch_id": batch_id},
                )
            stats.n_batches += 1
            stats.n_docs += int(n)
        finally:
            delta.unpersist()

    q = (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(input_dir)
        .writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stats
