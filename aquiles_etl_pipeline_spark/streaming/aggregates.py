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



def _stream_rollup(
    spark: SparkSession,
    input_dir: str,
    warehouse: Warehouse,
    checkpoint_dir: str,
    table: str,
    schema,
    delta_fn,
    keys: list[str],
    merge: dict[str, str],
    count_col: str,
    max_files_per_trigger: int | None = None,
) -> StreamAggStats:
    """Shared continuous-aggregate skeleton: JSONL file stream ->
    per-batch ``delta_fn`` aggregation -> ``refresh_additive`` merge
    into ``table``.  Owns the exactly-once discipline ONCE for every
    rollup stream: corrupt-row quarantine, the batch-id idempotence
    gate (redelivered batch ids <= the generation-stamped last id are
    skipped), cache/unpersist hygiene around the double-pass delta,
    and the empty-batch fast path that leaves the rollup generation
    untouched.  ``count_col`` names the delta column whose sum is the
    batch's row count (for stats + the empty gate)."""
    from pyspark.sql import functions as F

    stats = StreamAggStats()

    def _merge_batch(batch_df, batch_id: int) -> None:
        meta = warehouse.write_meta(table) or {}
        if batch_id <= meta.get("last_batch_id", -1):
            stats.n_batches += 1
            return
        clean = batch_df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
        delta = delta_fn(clean).cache()
        try:
            n = delta.agg(F.sum(count_col)).collect()[0][0] or 0
            if n:
                refresh_additive(
                    warehouse, table, delta, keys, merge,
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
    from ..session import stream_batch_confs

    # input-sized shuffle partitions for the drain (see
    # session.stream_batch_confs): rollup merges are key-grained
    # aggregations, so partition count never changes their result
    with stream_batch_confs(spark, input_dir):
        q = (
            stream.json(input_dir)
            .writeStream.foreachBatch(_merge_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return stats


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
    return _stream_rollup(
        spark, input_dir, warehouse, checkpoint_dir, table, schema,
        corpus_stats_delta, _KEYS, _MINMAX, count_col="n_docs",
        max_files_per_trigger=max_files_per_trigger,
    )


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

    from ..relational.sketches import bitmap_word_bit

    schema = StructType(
        [
            StructField("day", StringType()),
            StructField("user_id", LongType()),
            StructField("event_id", LongType()),
            StructField(CORRUPT_COL, StringType()),
        ]
    )

    def dau_delta(clean):
        # shared (word, bit) mapping — inherits sketches' documented
        # ids-must-be->=-0 contract (negative ids alias via shift-count
        # masking and undercount)
        word, bit = bitmap_word_bit("user_id")
        return (
            clean.select("day", word.alias("word"), bit.alias("bit"))
            .groupBy("day", "word")
            .agg(F.bit_or("bit").alias("bits"), F.count("*").alias("n_events"))
        )

    return _stream_rollup(
        spark, input_dir, warehouse, checkpoint_dir, table, schema,
        dau_delta, ["day", "word"], {"bits": "bit_or", "n_events": "sum"},
        count_col="n_events",
    )
