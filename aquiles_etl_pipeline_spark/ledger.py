"""ProcessFile idempotency ledger.

Reproduces the reference's per-file exactly-once bookkeeping
(/root/reference/core/etl_orchestrator.py:46-58 check, :285-296 row
construction, :303-311 skip/in-progress, :329-331 success, :342-344
failure; statuses docs/ETL_ENHANCEMENTS.md:9-12), applied uniformly to
both ingestion paths — fixing the reference's gap where the invoice
path has no ledger (SURVEY.md §3.3).

Keyed on (Container, FileName).  At scale the ledger gate is a
broadcast anti-join of the incoming file list against this table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import functions as F

from .merge.schemas import (
    FILE_STATUS_FAILED,
    FILE_STATUS_IN_PROGRESS,
    FILE_STATUS_SUCCESS,
)
from .merge.upserts import _next_ids
from .merge.warehouse import Warehouse


@dataclass
class FileInfo:
    container: str
    file_name: str
    blob_size: int | None = None
    content_type: str | None = None
    etag: str | None = None
    metadata: str | None = None


def get_status(wh: Warehouse, container: str, file_name: str) -> int | None:
    """etl:46-58 point lookup; None if never seen."""
    rows = (
        wh.read("process_file")
        .where((F.col("Container") == container) & (F.col("FileName") == file_name))
        .select("StatusId")
        .limit(1)
        .collect()
    )
    return rows[0]["StatusId"] if rows else None


def already_processed(wh: Warehouse, container: str, file_name: str) -> bool:
    """etl:303-308 skip gate: status 3 (success) → skip."""
    return get_status(wh, container, file_name) == FILE_STATUS_SUCCESS


def _set_status(wh: Warehouse, info: FileInfo, status: int) -> None:
    ledger = wh.read("process_file")
    key = (F.col("Container") == info.container) & (F.col("FileName") == info.file_name)
    existing = ledger.where(key)
    if existing.isEmpty():
        new_row = wh.spark.createDataFrame(
            [(info.container, info.file_name, status, info.blob_size,
              info.content_type, info.etag, info.metadata)],
            "Container string, FileName string, StatusId int, BlobSize long, "
            "ContentType string, ETag string, Metadata string",
        ).select(
            "Container", "FileName", "StatusId",
            F.current_timestamp().alias("ProcessDt"),
            "BlobSize", "ContentType",
            F.current_timestamp().alias("CreatedDt"),
            F.current_timestamp().alias("LastModifiedDt"),
            "ETag", "Metadata",
        )
        new_row = _next_ids(ledger, new_row, "FileName").select(*ledger.columns)
        wh.overwrite("process_file", ledger.unionByName(new_row))
    else:
        updated = ledger.withColumn(
            "StatusId", F.when(key, F.lit(status)).otherwise(F.col("StatusId"))
        ).withColumn(
            "ProcessDt", F.when(key, F.current_timestamp()).otherwise(F.col("ProcessDt"))
        ).withColumn(
            "LastModifiedDt", F.when(key, F.current_timestamp()).otherwise(F.col("LastModifiedDt"))
        )
        wh.overwrite("process_file", updated)


def mark_in_progress(wh: Warehouse, info: FileInfo) -> None:
    _set_status(wh, info, FILE_STATUS_IN_PROGRESS)


def mark_success(wh: Warehouse, info: FileInfo) -> None:
    _set_status(wh, info, FILE_STATUS_SUCCESS)


def mark_failed(wh: Warehouse, info: FileInfo) -> None:
    _set_status(wh, info, FILE_STATUS_FAILED)
