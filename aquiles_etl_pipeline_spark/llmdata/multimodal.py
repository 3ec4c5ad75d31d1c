"""Multimodal column handling: images/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing is real and tested — binaryFile ingestion,
media schema, Arrow-batched mapInPandas with bounded batch sizes, and
deterministic feature extraction — while the actual codec work sits
behind a seam: the container has no image/audio libraries, so the
default decoder is a deterministic fake (byte-hash-derived metadata)
and the PIL/ffmpeg-backed decoder raises NotImplementedError until
wired.  This mirrors the invoice-extractor seam (sources/extractor.py),
which is the reference's own multimodal path
(/root/reference/core/etl_orchestrator.py:192-277).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("path", StringType()),
    StructField("modification_time", StringType()),
    StructField("length", LongType()),
    StructField("content", BinaryType()),
    StructField("media_type", StringType()),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("path", StringType()),
    StructField("length", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("sha256", StringType()),
])


def read_media_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """S4/S13 ingestion: binaryFile source with file metadata columns —
    Spark's native replacement for the reference's hand-rolled blob
    listing+download (/root/reference/core/storage.py:38-94)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    media_type = (
        F.when(ext.isin("png", "jpg", "jpeg", "gif", "bmp"), "image")
        .when(ext.isin("wav", "mp3", "flac", "ogg"), "audio")
        .when(ext.isin("mp4", "avi", "mkv", "webm"), "video")
        .otherwise("binary")
    )
    return df.select(
        "path",
        F.col("modificationTime").cast("string").alias("modification_time"),
        "length",
        "content",
        media_type.alias("media_type"),
    )


def _fake_decode(content: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for image decoding: dimensions derived
    from the content hash.  Replaced by a real codec in production."""
    import hashlib

    h = hashlib.sha256(content or b"").digest()
    return (64 + h[0] % 192, 64 + h[1] % 192, 3)


def extract_image_features(df: DataFrame, batch_size: int = 64) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction.

    The UDF contract (iterator of pandas batches in/out, bounded batch
    memory) is exactly what a real decoder needs; only _fake_decode is
    swapped out.  Binary payloads never leave the executor as Python
    objects row-at-a-time.

    Batch-size bounding is done INSIDE the UDF (re-chunking each
    incoming Arrow batch to ``batch_size`` rows before decoding) rather
    than by toggling spark.sql.execution.arrow.maxRecordsPerBatch
    around a lazy DataFrame — a session conf set here would be restored
    before the plan ever executes and would leak into concurrent
    queries; re-chunking bounds decoder working-set memory regardless
    of session settings.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for lo in range(0, len(pdf), batch_size):  # bound decoder memory
                chunk = pdf.iloc[lo : lo + batch_size]
                out = []
                for _, row in chunk.iterrows():
                    content = row["content"] or b""
                    w, h, c = _fake_decode(content)
                    out.append(
                        (row["path"], int(row["length"]), w, h, c,
                         hashlib.sha256(content).hexdigest())
                    )
                yield pd.DataFrame(
                    out, columns=["path", "length", "width", "height", "channels", "sha256"]
                )

    return df.select("path", "length", "content").mapInPandas(
        batches, IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = StructType([
    StructField("path", StringType()),
    StructField("length", LongType()),
    StructField("duration_s", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("sha256", StringType()),
])

FRAME_SCHEMA = StructType([
    StructField("path", StringType()),
    StructField("frame_index", IntegerType()),
    StructField("ts_offset_s", IntegerType()),
    StructField("frame", BinaryType()),
])


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Audio analogue of extract_image_features: same Arrow-batched
    mapInPandas contract; duration/rate come from the deterministic
    fake until a real decoder (soundfile/ffmpeg) replaces the seam."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for _, row in pdf.iterrows():
                content = row["content"] or b""
                h = hashlib.sha256(content).digest()
                out.append(
                    (row["path"], int(row["length"]), 1 + h[2] % 600,
                     (8, 16, 22, 44)[h[3] % 4] * 1000, 1 + h[4] % 2,
                     hashlib.sha256(content).hexdigest())
                )
            yield pd.DataFrame(
                out,
                columns=["path", "length", "duration_s", "sample_rate", "channels", "sha256"],
            )

    return df.select("path", "length", "content").mapInPandas(
        batches, AUDIO_FEATURES_SCHEMA
    )


def sample_frames(df: DataFrame, every_n_seconds: int = 10) -> DataFrame:
    """Video frame sampling: ONE input row fans out to one row per
    sampled frame — the mapInPandas iterator contract handles the 1->N
    expansion without ever holding a whole video's frames in memory
    (yield per input batch, frames bounded by duration/interval).  The
    frame bytes are a deterministic per-frame stub until an ffmpeg
    decoder replaces the seam; schema, fan-out, and batch shape are the
    real production plumbing."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for _, row in pdf.iterrows():
                content = row["content"] or b""
                h = hashlib.sha256(content).digest()
                duration = 1 + h[5] % 120
                for i, ts in enumerate(range(0, duration, every_n_seconds)):
                    out.append(
                        (row["path"], i, ts,
                         hashlib.sha256(content + ts.to_bytes(4, "little")).digest())
                    )
            yield pd.DataFrame(out, columns=["path", "frame_index", "ts_offset_s", "frame"])

    return df.select("path", "content").mapInPandas(batches, FRAME_SCHEMA)


def decode_image_real(content: bytes):  # pragma: no cover - seam
    """Real decoder seam: PIL/opencv are not in this container."""
    raise NotImplementedError(
        "image decoding requires an imaging library; swap _fake_decode "
        "for a real codec in extract_image_features"
    )


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes binary through mapInPandas with target
    dims recorded; the pixel work is the seam."""
    target = F.struct(F.lit(width).alias("width"), F.lit(height).alias("height"))
    return df.withColumn("resize_target", target)
