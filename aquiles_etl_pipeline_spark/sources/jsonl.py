"""JSONL (newline-delimited JSON) source/sink — the interchange format
training-data pipelines actually ship: one JSON object per line,
gzip-splittable at the file level, schema carried in-band.

Thin, deliberate wrappers over Spark's native json reader/writer: the
value added is the contract — explicit schema on read (never
inference, which costs a full extra pass over 100 TB and silently
widens types), permissive corrupt-record capture instead of job
failure, and partitioned/compressed layout on write.

The reference has no JSON surface (CSV-only ingest); this extends the
engine's source matrix (SURVEY.md §2.1) the same way multimodal
binaryFile does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Schema-enforced JSONL read.

    PERMISSIVE mode with a captured corrupt-record column: a malformed
    line lands as (nulls..., raw_line) instead of killing a 100 TB
    job.  ``keep_corrupt=False`` (default) drops the capture column
    and the broken rows — the filter-don't-fail posture every crawl
    reader needs; ``keep_corrupt=True`` keeps both for quarantine
    sinks.  Gzip inputs (*.jsonl.gz) decompress transparently; they
    are file-splittable only, so shard uploads into many files.
    """
    full = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    if keep_corrupt:
        return df
    return df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str | None = "gzip",
    shards: int | None = None,
) -> None:
    """Partitioned, compressed JSONL write.

    ``shards`` repartitions before writing — the shard count IS the
    read parallelism for gzip output (gzip files are not splittable),
    so size it to downstream cores, not upstream partition counts.
    """
    if shards is not None:
        df = df.repartition(shards)
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def write_dataset_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    compression: str | None = "gzip",
) -> list[dict]:
    """Deterministic sharded dataset release: rows are assigned to
    shards by content-stable hash of ``key_col`` (NOT round-robin —
    re-running the job, adding executors, or reordering input files
    never moves a row between shards), written as one JSONL file per
    shard, and described by a manifest.

    Returns the manifest: one dict per shard with row count and byte
    size — what a dataset release publishes next to the data so
    consumers can verify transfer integrity and plan reads.  The
    manifest is derived from a driver-side listing of the written
    files (no second data pass).

    Scale: one hash-partition shuffle into exactly ``n_shards``
    writers; shard skew is bounded by hash uniformity over keys.
    """
    from pyspark.sql import functions as F

    shard = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
    (
        df.withColumn("_shard", shard)
        .repartition(n_shards, "_shard")
        .sortWithinPartitions("_shard", key_col)
        .write.mode("overwrite")
        .partitionBy("_shard")
        .option("compression", compression or "none")
        .json(path)
    )
    import json as _json
    from pathlib import Path

    out = []
    root = Path(path)
    for d in sorted(root.glob("_shard=*"), key=lambda p: int(p.name.split("=")[1])):
        files = sorted(f for f in d.iterdir() if f.name.startswith("part-"))
        n_rows = 0
        for f in files:
            import gzip

            opener = gzip.open if f.name.endswith(".gz") else open
            with opener(f, "rb") as fh:
                n_rows += sum(1 for _ in fh)
        out.append(
            {
                "shard": int(d.name.split("=")[1]),
                "n_files": len(files),
                "n_rows": n_rows,
                "bytes": sum(f.stat().st_size for f in files),
            }
        )
    (root / "_MANIFEST.json").write_text(_json.dumps(out, indent=1))
    return out
