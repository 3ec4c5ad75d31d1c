"""Change data feed between warehouse snapshot generations — the
Delta Lake ``table_changes`` analog, derived from retained versions
instead of per-write change logs.

The reference never exposes change history (its MERGE procs overwrite
SQL tables in place); the Warehouse here retains every generation as
an immutable hardlinked directory (warehouse.py), so the change feed
between two versions is a pure snapshot diff: full-outer join the two
generations on the merge key and classify each key as insert / delete
/ update, emitting Delta CDF's four row kinds (``insert``, ``delete``,
``update_preimage``, ``update_postimage``).

Scale: one key-grain full-outer join between the two snapshots — both
sides arrive partition-pruned if the caller's key carries the bucket
column, and unchanged keys (the overwhelming majority between adjacent
versions) emit ZERO rows via an empty explode, so the output is
O(changes), not O(table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .warehouse import Warehouse


def table_changes(
    wh: Warehouse,
    name: str,
    v_from: int,
    v_to: int,
    on: list[str] | str,
) -> DataFrame:
    """Rows that changed between generation ``v_from`` and ``v_to`` of
    ``name``, keyed on ``on``: columns = key cols + ``_change_type``
    + every non-key column (pre-values for deletes/update_preimage,
    post-values for inserts/update_postimage).  Updates emit BOTH
    images, exactly like Delta's CDF, so downstream consumers can
    replay or audit either side."""
    keys = [on] if isinstance(on, str) else list(on)
    old = wh.read(name, version=v_from)
    new = wh.read(name, version=v_to)
    val_cols = [c for c in old.columns if c not in keys]
    o = old.select(*keys, F.struct(*val_cols).alias("_o"))
    n = new.select(*keys, F.struct(*val_cols).alias("_n"))
    j = o.join(n, keys, "full_outer")
    row = lambda kind, img: F.struct(  # noqa: E731
        F.lit(kind).alias("_change_type"), F.col(img).alias("_img")
    )
    # unchanged keys emit ZERO rows: the otherwise-branch is an empty
    # array of the REAL element type (slice of a typed singleton)
    empty = F.slice(F.array(row("insert", "_o")), 1, 0)
    changes = (
        F.when(F.col("_o").isNull(), F.array(row("insert", "_n")))
        .when(F.col("_n").isNull(), F.array(row("delete", "_o")))
        .when(
            ~(F.col("_o").eqNullSafe(F.col("_n"))),
            F.array(row("update_preimage", "_o"), row("update_postimage", "_n")),
        )
        .otherwise(empty)
    )
    return (
        j.select(*keys, F.explode(changes).alias("_c"))
        .select(
            *keys,
            F.col("_c._change_type").alias("_change_type"),
            *[F.col(f"_c._img.{c}").alias(c) for c in val_cols],
        )
    )
