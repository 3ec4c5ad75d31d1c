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
