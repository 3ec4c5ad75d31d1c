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
