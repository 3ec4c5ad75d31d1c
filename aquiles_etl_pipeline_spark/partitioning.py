"""Partitioning helpers shared across operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ONLY when the input is under-partitioned.

    The CPU-bound kernels (minhash, simhash, LSH signatures, cosine
    verification, tokenize+explode) need one partition per core to
    parallelize a small single-file corpus in local mode.  But an
    unconditional ``repartition(n)`` is a full shuffle of the data —
    at 100 TB, where scans already arrive as thousands of partitions,
    that shuffle moves the entire corpus for zero parallelism gain.
    This helper makes the fan-out conditional: shuffle a one-file toy
    input, pass a well-partitioned production scan through untouched.

    ``getNumPartitions`` is a driver-side plan inspection — no job.
    """
    spark = df.sparkSession
    target = target or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def zorder_key(x_col: str, y_col: str, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative int columns.

    The clustering key behind multi-dimensional data skipping (Delta
    OPTIMIZE ZORDER, Hudi space-filling curves): sorting a rewrite by
    the interleaved key gives every file a tight min/max envelope on
    BOTH dimensions, so a predicate on either column prunes files —
    the property a single-column sort only provides for its leading
    column.  Pairs with ``merge.warehouse.Warehouse.compact(sort_by=)``.

    Pure codegen integer arithmetic via the classic magic-mask bit
    spread (5 ops per coordinate), bit-identical in any engine with
    64-bit ints — the same expression doubles as the DuckDB oracle.
    Coordinates are truncated to the low ``bits`` bits; callers bucket
    or range-partition the returned key.
    """
    from pyspark.sql import functions as F

    def spread(c: str) -> str:
        e = f"(CAST({c} AS BIGINT) & {(1 << bits) - 1})"
        for shift, mask in (
            (8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555),
        ):
            e = f"((({e}) | (({e}) << {shift})) & {mask})"
        return e

    return F.expr(f"({spread(x_col)}) | (({spread(y_col)}) << 1)")
