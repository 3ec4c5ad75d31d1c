"""Slowly-changing-dimension maintenance (SCD Type 2): attribute
changes close the current version row and open a new one, preserving
full history with validity intervals — the dimension-versioning
pattern every warehouse needs for as-of-correct joins (what did this
provider's terms look like when the order was placed?).

The reference's MERGE procs are Type 1 (overwrite in place,
SURVEY.md §2.6); Type 2 is the engine-native extension, built on the
same snapshot Warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .warehouse import Warehouse


def scd2_upsert(
    wh: Warehouse,
    table: str,
    updates: DataFrame,
    key_col: str,
    attr_cols: list[str],
    effective_date: str,
) -> None:
    """Apply one batch of dimension updates as SCD Type 2.

    ``updates`` carries one row per key (key_col + attr_cols).  Rows
    whose attributes differ from the key's CURRENT version get that
    version closed (``valid_to`` = effective_date, ``is_current`` =
    false) and a new open version inserted; unchanged keys are left
    alone; unseen keys insert as new open versions.  Closed history is
    immutable — it carries forward untouched.

    Determinism: re-applying the same batch at the same
    effective_date is a no-op (changed-detection sees equal
    attributes), so retries are safe — the idempotency contract the
    Type-1 merges (upserts.py) already follow.

    Scale: ONE join between the open-version slice and the batch
    (batch side broadcastable); history rows move by union, and with
    a Warehouse partitioned on is_current the rewrite is
    partition-scoped like the fact merges.
    """
    eff = F.lit(effective_date).cast("date")
    fresh = updates.select(
        key_col,
        *attr_cols,
        eff.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    if not wh.exists(table):
        wh.overwrite(table, fresh)
        return
    cur = wh.read(table)
    open_rows = cur.where(F.col("is_current"))
    history = cur.where(~F.col("is_current"))

    u = updates.select(
        F.col(key_col).alias("_uk"),
        *[F.col(c).alias(f"_u_{c}") for c in attr_cols],
    )
    joined = open_rows.join(u, open_rows[key_col] == u["_uk"], "left")
    differs = F.lit(False)
    for c in attr_cols:
        # null-safe inequality: a change to/from NULL is a change
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"_u_{c}"))
    changed_keys = joined.where(F.col("_uk").isNotNull() & differs)

    closed = changed_keys.select(
        key_col,
        *attr_cols,
        "valid_from",
        eff.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    surviving_open = joined.where(F.col("_uk").isNull() | ~differs).select(
        key_col, *attr_cols, "valid_from", "valid_to", "is_current"
    )
    new_keys = u.join(
        open_rows.select(F.col(key_col).alias("_uk")), "_uk", "left_anti"
    ).select(F.col("_uk").alias(key_col), *[F.col(f"_u_{c}").alias(c) for c in attr_cols])
    new_versions = (
        changed_keys.select(F.col(key_col), *[F.col(f"_u_{c}").alias(c) for c in attr_cols])
        .unionByName(new_keys)
        .select(
            key_col,
            *attr_cols,
            eff.alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    wh.overwrite(
        table,
        history.unionByName(closed).unionByName(surviving_open).unionByName(new_versions),
    )


def as_of(dim: DataFrame, date: str) -> DataFrame:
    """The dimension as it was on ``date``: the version whose validity
    interval covers it (valid_from <= date < valid_to, open-ended
    current rows included) — the join target for as-of-correct fact
    enrichment."""
    d = F.lit(date).cast("date")
    return dim.where(
        (F.col("valid_from") <= d)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > d))
    )
