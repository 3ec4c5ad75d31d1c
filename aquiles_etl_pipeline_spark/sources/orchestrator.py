"""End-to-end ingestion orchestration — the reference's four entry
points (SURVEY.md §3) re-expressed over the Spark pipeline:

  process_csv_file   — §3.1 blob-trigger path (ledger gate → parse →
                       canonicalize → transform → staging → merge)
  process_csv_text   — §3.4 validated string path (header gate → same)
  process_invoice_image — §3.3 image path (extractor seam → fence strip
                       → CSV parse → converges into the same pipeline),
                       WITH the ledger applied (the reference omits it
                       on this path — gap noted in SURVEY.md §3.3).
"""

from __future__ import annotations

import io
import uuid
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .. import ledger
from ..merge.upserts import merge_staging_to_fact_tables
from ..merge.warehouse import Warehouse
from ..pipeline import (
    apply_transformations,
    map_columns_to_apply_transformations,
    validate_csv_headers,
)
from ..staging import load_data_to_staging_tables
from .extractor import InvoiceExtractor


@dataclass
class ProcessingResult:
    """etl:27-44 ProcessingResult/InvoiceProcessingResult union."""

    success: bool
    message: str = ""
    rows_processed: int = 0
    batch_guid: str | None = None
    skipped: bool = False
    products_extracted: int = 0
    csv_filename: str | None = None
    staging_counts: dict = field(default_factory=dict)
    merge_stats: dict = field(default_factory=dict)


def _csv_text_to_df(spark: SparkSession, csv_text: str) -> DataFrame:
    """Parse CSV text to a DataFrame (reference: pd.read_csv on a
    buffer, etl:314/:270 — eager, driver-side; correct here because
    text payloads are single-file-sized.  Directory-scale ingest goes
    through spark.read.csv instead)."""
    pdf = pd.read_csv(io.StringIO(csv_text), dtype=str, skip_blank_lines=True)
    pdf = pdf.where(pdf.notna(), None)
    return spark.createDataFrame(pdf)


def _run_pipeline(
    spark: SparkSession, wh: Warehouse, df: DataFrame, mode: str = "exact"
) -> tuple[str, int, dict, dict]:
    """Steps 6-10 of §3.1: canonicalize → transform → staging → merge."""
    df = map_columns_to_apply_transformations(df)
    transformed = apply_transformations(df, mode=mode)
    transformed = transformed.cache()
    try:
        n_rows = transformed.count()
        if n_rows == 0:
            raise ValueError("CSV file is empty")  # etl:316-317
        batch_guid = str(uuid.uuid4())  # etl:323 — one GUID per file
        staging_counts = load_data_to_staging_tables(wh, transformed, batch_guid)
        merge_stats = merge_staging_to_fact_tables(wh, batch_guid)
    finally:
        transformed.unpersist()
    return batch_guid, n_rows, staging_counts, merge_stats


def process_csv_file(
    spark: SparkSession,
    wh: Warehouse,
    container: str,
    file_name: str,
    csv_text: str | None = None,
    path: str | None = None,
    mode: str = "exact",
) -> ProcessingResult:
    """§3.1: the main CSV path, ledgered."""
    if ledger.already_processed(wh, container, file_name):  # etl:303-308
        return ProcessingResult(True, "already processed", skipped=True)

    info = ledger.FileInfo(container, file_name, blob_size=len(csv_text) if csv_text else None)
    ledger.mark_in_progress(wh, info)  # etl:310-312
    try:
        if path is not None:
            df = spark.read.option("header", True).csv(path)
        elif csv_text is not None:
            df = _csv_text_to_df(spark, csv_text)
        else:
            raise ValueError("either csv_text or path is required")
        batch_guid, n_rows, staging_counts, merge_stats = _run_pipeline(spark, wh, df, mode)
        ledger.mark_success(wh, info)  # etl:329-331
        return ProcessingResult(
            True, f"processed {n_rows} rows", n_rows, batch_guid,
            staging_counts=staging_counts, merge_stats=merge_stats,
        )
    except Exception as exc:  # noqa: BLE001 — etl:338-350
        ledger.mark_failed(wh, info)
        return ProcessingResult(False, f"{type(exc).__name__}: {exc}")


def process_csv_text(
    spark: SparkSession,
    wh: Warehouse,
    container: str,
    file_name: str,
    csv_text: str,
    mode: str = "exact",
    land_dir: str | None = None,
) -> ProcessingResult:
    """§3.4: header-validated string path (etl:418-464).

    ``land_dir=None`` validates and processes in one pass (documented
    divergence).  ``land_dir`` set reproduces the reference's
    validate-AND-LAND semantics exactly (etl:451-453): the validated
    CSV is written into the landing directory — the same directory a
    `streaming.ingest.stream_ingest_files` source watches — and
    processing happens when the stream (re)triggers, exactly like the
    reference's blob-container re-trigger."""
    try:
        pdf = pd.read_csv(io.StringIO(csv_text), dtype=str, nrows=0)
    except Exception as exc:  # noqa: BLE001
        return ProcessingResult(False, f"unparseable CSV: {exc}")
    gate = validate_csv_headers(list(pdf.columns))
    if not gate.is_valid:
        return ProcessingResult(False, gate.message)
    if land_dir is not None:
        from pathlib import Path

        target_dir = Path(land_dir)
        target_dir.mkdir(parents=True, exist_ok=True)
        (target_dir / file_name).write_text(csv_text)
        return ProcessingResult(
            True, f"validated and landed {file_name} for stream ingest"
        )
    return process_csv_file(spark, wh, container, file_name, csv_text=csv_text, mode=mode)


def process_invoice_image(
    spark: SparkSession,
    wh: Warehouse,
    extractor: InvoiceExtractor,
    container: str,
    image_name: str,
    image_bytes: bytes,
    mode: str = "exact",
    archive_dir: str | None = None,
) -> ProcessingResult:
    """§3.3: image → extractor → fence-strip → CSV → same pipeline.
    Ledgered (unlike the reference).  Archive parity (etl:376-388): the
    extracted CSV is persisted as {stem}_{guid8}.csv — the reference
    uploads it back to blob storage as the replayable audit artifact;
    here it lands under ``archive_dir`` (default
    ``<warehouse>/_invoice_archive/<container>/``), driver-side because
    the payload is one extracted text per image."""
    if ledger.already_processed(wh, container, image_name):
        return ProcessingResult(True, "already processed", skipped=True)
    info = ledger.FileInfo(container, image_name, blob_size=len(image_bytes))
    ledger.mark_in_progress(wh, info)
    try:
        raw = extractor.extract(image_bytes, image_name)
        # F17 fence strip (etl:261-267) — driver-side here because the
        # extractor returns one text per image; the column-level variant
        # is functions.strip_markdown_fence.
        import re

        m = re.search(r"```(?:csv)?\s*(.*?)```", raw.strip(), re.DOTALL | re.IGNORECASE)
        csv_text = m.group(1).strip() if m else raw.strip()
        df = _csv_text_to_df(spark, csv_text)
        batch_guid, n_rows, staging_counts, merge_stats = _run_pipeline(spark, wh, df, mode)
        stem = image_name.rsplit(".", 1)[0]
        csv_filename = f"{stem}_{batch_guid[:8]}.csv"
        from pathlib import Path

        adir = Path(archive_dir) if archive_dir else wh.root / "_invoice_archive" / container
        adir.mkdir(parents=True, exist_ok=True)
        (adir / csv_filename).write_text(csv_text)
        ledger.mark_success(wh, info)
        return ProcessingResult(
            True, f"extracted {n_rows} products", n_rows, batch_guid,
            products_extracted=n_rows, csv_filename=csv_filename,
            staging_counts=staging_counts, merge_stats=merge_stats,
        )
    except Exception as exc:  # noqa: BLE001
        ledger.mark_failed(wh, info)
        return ProcessingResult(False, f"{type(exc).__name__}: {exc}")
