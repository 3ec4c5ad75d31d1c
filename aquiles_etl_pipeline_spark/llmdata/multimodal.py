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
    from the content hash.  Used only when the payload is not a
    recognizable image format (see parse_image_header)."""
    import hashlib

    h = hashlib.sha256(content or b"").digest()
    return (64 + h[0] % 192, 64 + h[1] % 192, 3)


def parse_image_header(content: bytes) -> tuple[int, int, int] | None:
    """REAL image metadata decode, pure stdlib: read (width, height,
    channels) from the container header of PNG / GIF / BMP / JPEG
    bytes without decoding any pixels.

    This is the production-correct fast path for metadata extraction
    at scale — header sniffing touches <1 KB per object, so a 100 TB
    image corpus's dimension pass is IO-bound on the first block of
    each blob, not on a full pixel decode.  Returns None for
    unrecognized formats (caller falls back or marks undecodable).
    """
    import struct

    if not content or len(content) < 12:
        return None
    # PNG: 8-byte signature, then IHDR chunk: len(4) 'IHDR' w(4) h(4)
    # bitdepth(1) colortype(1)
    if content[:8] == b"\x89PNG\r\n\x1a\n" and len(content) >= 29:
        w, h = struct.unpack(">II", content[16:24])
        color_type = content[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type, 3)
        return (int(w), int(h), channels)
    # GIF87a/GIF89a: logical screen descriptor at offset 6 (LE u16 pair)
    if content[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", content[6:10])
        return (int(w), int(h), 3)
    # BMP: BITMAPINFOHEADER at offset 14: size(4) w(i32) h(i32) planes
    # (2) bpp(2); height may be negative (top-down rows)
    if content[:2] == b"BM" and len(content) >= 30:
        w, h = struct.unpack("<ii", content[18:26])
        bpp = struct.unpack("<H", content[28:30])[0]
        return (int(w), abs(int(h)), max(1, bpp // 8))
    # JPEG: walk markers to the first SOFn frame header:
    # FF C0..CF (minus C4/C8/CC) then len(2) precision(1) h(2) w(2)
    # ncomponents(1)
    # WebP: RIFF....WEBP then VP8 (lossy: 14cc+3 then dims LE u16&0x3fff),
    # VP8L (lossless: 14-bit packed), or VP8X (extended: 24-bit minus one)
    if content[:4] == b"RIFF" and content[8:12] == b"WEBP" and len(content) >= 30:
        import struct as _st

        cc = content[12:16]
        if cc == b"VP8 " and len(content) >= 30 and content[23:26] == b"\x9d\x01\x2a":
            w = _st.unpack("<H", content[26:28])[0] & 0x3FFF
            h = _st.unpack("<H", content[28:30])[0] & 0x3FFF
            return (int(w), int(h), 3)
        if cc == b"VP8L" and len(content) >= 25 and content[20] == 0x2F:
            bits = _st.unpack("<I", content[21:25])[0]
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            return (int(w), int(h), 4 if (bits >> 28) & 1 else 3)
        if cc == b"VP8X" and len(content) >= 30:
            w = int.from_bytes(content[24:27], "little") + 1
            h = int.from_bytes(content[27:30], "little") + 1
            return (int(w), int(h), 4)
    if content[:2] == b"\xff\xd8":
        i, n = 2, len(content)
        while i + 9 < n:
            if content[i] != 0xFF:
                i += 1
                continue
            marker = content[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", content[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", content[i + 5 : i + 9])
                return (int(w), int(h), int(content[i + 9]))
            i += 2 + seg_len
    return None


def parse_wav_header(content: bytes) -> tuple[int, int, int] | None:
    """REAL audio metadata decode, pure stdlib: (duration_s,
    sample_rate, channels) from a RIFF/WAVE header.  Walks chunks to
    'fmt ' and 'data'; duration = data bytes / byte-rate.  Returns
    None for non-WAV payloads."""
    import struct

    if len(content) < 44 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    i, n = 12, len(content)
    sample_rate = channels = byte_rate = None
    data_size = None
    while i + 8 <= n:
        cid = content[i : i + 4]
        size = struct.unpack("<I", content[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= n:
            channels, sample_rate, byte_rate = struct.unpack(
                "<HII", content[i + 10 : i + 20]
            )
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size % 2)  # chunks are word-aligned
    if sample_rate and byte_rate and data_size is not None:
        return (max(0, round(data_size / byte_rate)), int(sample_rate), int(channels))
    return None


def parse_flac_header(content: bytes) -> tuple[int, int, int] | None:
    """REAL audio metadata decode, pure stdlib: (duration_s,
    sample_rate, channels) from a FLAC STREAMINFO block — 'fLaC' magic,
    then the mandatory first metadata block holds sample rate (20
    bits), channels-1 (3 bits), and total samples (36 bits) packed big-
    endian at byte 18 of the stream.  Returns None for non-FLAC."""
    if len(content) < 42 or content[:4] != b"fLaC":
        return None
    # first metadata block header at 4: type(1,low 7 bits)=0 STREAMINFO
    if content[4] & 0x7F != 0:
        return None
    si = content[8:42]  # 34-byte STREAMINFO
    bits = int.from_bytes(si[10:18], "big")  # rate/chan/bps/samples pack
    sample_rate = bits >> 44
    channels = ((bits >> 41) & 0x7) + 1
    total_samples = bits & ((1 << 36) - 1)
    if not sample_rate:
        return None
    return (round(total_samples / sample_rate), int(sample_rate), int(channels))


def parse_mp4_header(content: bytes) -> tuple[int, int, int] | None:
    """REAL video metadata decode, pure stdlib: (duration_s, timescale,
    n_tracks) from an ISO BMFF (MP4/MOV) container — walk the
    top-level boxes to ``moov``, read ``mvhd`` (v0 and v1 layouts),
    count ``trak`` children.  Header-only: touches no sample data, so
    a 100 TB video corpus's duration pass reads the first MB per
    object at most.  Returns None for non-BMFF payloads."""
    import struct

    def boxes(buf: bytes, start: int, end: int):
        i = start
        while i + 8 <= end:
            size = struct.unpack(">I", buf[i : i + 4])[0]
            typ = buf[i + 4 : i + 8]
            if size == 1:  # 64-bit largesize
                if i + 16 > end:
                    return
                size = struct.unpack(">Q", buf[i + 8 : i + 16])[0]
                payload = i + 16
            else:
                payload = i + 8
            if size < 8 or i + size > end + 0:
                return
            yield typ, payload, min(i + size, end)
            i += size

    n = len(content)
    if n < 16:
        return None
    # BMFF sniff: first box must be a known top-level type
    if content[4:8] not in (b"ftyp", b"moov", b"mdat", b"free", b"wide", b"skip"):
        return None
    for typ, p0, p1 in boxes(content, 0, n):
        if typ != b"moov":
            continue
        duration_s = timescale = None
        n_tracks = 0
        for ctyp, c0, c1 in boxes(content, p0, p1):
            if ctyp == b"mvhd" and c1 - c0 >= 20:
                version = content[c0]
                if version == 1:
                    # v1 layout reads through c0+32; a shorter (truncated)
                    # v1 payload must not fall through to the v0 offsets —
                    # that silently reads creation-time bytes as duration
                    if c1 - c0 < 32:
                        continue
                    timescale = struct.unpack(">I", content[c0 + 20 : c0 + 24])[0]
                    duration = struct.unpack(">Q", content[c0 + 24 : c0 + 32])[0]
                else:
                    timescale = struct.unpack(">I", content[c0 + 12 : c0 + 16])[0]
                    duration = struct.unpack(">I", content[c0 + 16 : c0 + 20])[0]
                if timescale:
                    duration_s = round(duration / timescale)
            elif ctyp == b"trak":
                n_tracks += 1
        if timescale is not None:
            return (int(duration_s), int(timescale), n_tracks)
    return None


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
                    # real header decode for PNG/GIF/BMP/JPEG; the
                    # deterministic fake only covers unknown formats
                    dims = parse_image_header(content) or _fake_decode(content)
                    w, h, c = dims
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
                # real RIFF/WAVE header decode; fake for other codecs
                parsed = parse_wav_header(content)
                if parsed is None:
                    h = hashlib.sha256(content).digest()
                    parsed = (1 + h[2] % 600, (8, 16, 22, 44)[h[3] % 4] * 1000, 1 + h[4] % 2)
                dur, rate, nch = parsed
                out.append(
                    (row["path"], int(row["length"]), dur, rate, nch,
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
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for _, row in pdf.iterrows():
                content = row["content"] or b""
                h = hashlib.sha256(content).digest()
                try:
                    parsed = parse_mp4_header(content)
                except (struct.error, IndexError):
                    # malformed container must degrade to the stub, not
                    # fail the whole task
                    parsed = None
                # REAL duration when the payload is an MP4/MOV
                # container; deterministic hash stub otherwise
                duration = parsed[0] if parsed else 1 + h[5] % 120
                for i, ts in enumerate(range(0, duration, every_n_seconds)):
                    out.append(
                        (row["path"], i, ts,
                         hashlib.sha256(content + ts.to_bytes(4, "little")).digest())
                    )
            yield pd.DataFrame(out, columns=["path", "frame_index", "ts_offset_s", "frame"])

    return df.select("path", "content").mapInPandas(batches, FRAME_SCHEMA)


# PIL availability probed ONCE at import: decode_image_real runs
# per-image on the hot decode path, and a failed `from PIL import ...`
# is not cached in sys.modules — re-probing per call would re-walk the
# import machinery for every image
try:  # pragma: no cover - env-dependent import
    from PIL import Image as _PIL_Image  # type: ignore[import-not-found]
except ImportError:  # pragma: no cover
    _PIL_Image = None


def decode_image_real(content: bytes) -> tuple[int, int, int]:
    """Full pixel-decode seam.  Uses PIL when the environment provides
    it (returns verified width/height/channels from the decoded image);
    otherwise falls back to the stdlib header parse, which covers
    PNG/GIF/BMP/JPEG metadata without pixel access.  PIL decode
    FAILURES (truncated/metadata-only containers a header-parse still
    understands, e.g. a GIF with no image frame) also fall back rather
    than failing the task.  Raises NotImplementedError only for
    formats neither path understands."""
    if _PIL_Image is not None:  # pragma: no cover - env-dependent
        import io

        try:
            with _PIL_Image.open(io.BytesIO(content)) as img:
                return (img.width, img.height, len(img.getbands()))
        except Exception:
            pass  # fall through to the header codec
    parsed = parse_image_header(content)
    if parsed is not None:
        return parsed
    raise NotImplementedError(
        "unrecognized image format: install PIL for full codec coverage"
    )


RESIZE_SCHEMA = (
    "path string, width int, height int, "
    "target_width int, target_height int, resized binary"
)


def resize_images(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Aspect-preserving image downscale over (path, content) rows —
    the thumbnail/normalization pass of a multimodal ingest pipeline,
    as Arrow-batched mapInPandas (one Python roundtrip per batch, never
    per row).

    Geometry is REAL and engine-portable: source dimensions come from
    the production header codec (parse_image_header) and the target
    size is pure integer arithmetic — scale the long side down to
    ``max_side`` (never upscale), preserving aspect ratio with floor
    division, floor 1px.  The PIXEL work is the documented seam: PIL
    re-encodes when the environment provides it; otherwise the resized
    payload is a deterministic content-addressed stub
    (sha256(content || dims)) so downstream plumbing (dedup on resized
    bytes, shard writes) stays testable.  Undecodable rows pass through
    with null dims rather than failing the task."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # pragma: no cover - env-dependent
            import io

            from PIL import Image  # type: ignore[import-not-found]
        except ImportError:
            Image = None
            io = None

        def resized_bytes(content: bytes, tw: int, th: int) -> bytes:
            if Image is not None:
                try:
                    with Image.open(io.BytesIO(content)) as img:
                        out = io.BytesIO()
                        img.resize((tw, th)).save(out, format="PNG")
                        return out.getvalue()
                except Exception:
                    pass
            return hashlib.sha256(
                content + tw.to_bytes(4, "little") + th.to_bytes(4, "little")
            ).digest()

        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                content = row["content"] or b""
                parsed = parse_image_header(content)
                if parsed is None:
                    rows.append((row["path"], None, None, None, None, None))
                    continue
                w, h, _ = parsed
                long_side = max(w, h)
                if long_side <= max_side:
                    tw, th = w, h
                else:
                    tw = max(1, (w * max_side) // long_side)
                    th = max(1, (h * max_side) // long_side)
                rows.append(
                    (row["path"], w, h, tw, th, resized_bytes(content, tw, th))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "width", "height",
                    "target_width", "target_height", "resized",
                ],
            )

    return df.select("path", "content").mapInPandas(batches, RESIZE_SCHEMA)
