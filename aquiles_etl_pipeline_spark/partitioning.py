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


def zorder_sql(x_col: str, y_col: str, bits: int = 16) -> str:
    """SQL text of the Morton (Z-order) interleave — the SINGLE source
    of the expression, consumed both by ``zorder_key`` (Spark plans it
    via F.expr) and by the q133 DuckDB oracle, so the two sides are
    byte-identical by construction.

    Classic magic-mask bit spread over the full 64-bit word (6 ops per
    coordinate), supporting coordinates up to 32 bits; ``bits`` > 32
    is rejected rather than silently aliased.  Only &, |, << on BIGINT
    — portable, engine-identical integer arithmetic.
    """
    if not 1 <= bits <= 32:
        raise ValueError(f"zorder bits must be in [1, 32], got {bits}")

    def spread(c: str) -> str:
        e = f"(CAST({c} AS BIGINT) & {(1 << bits) - 1})"
        for shift, mask in (
            (16, 0x0000FFFF0000FFFF),
            (8, 0x00FF00FF00FF00FF),
            (4, 0x0F0F0F0F0F0F0F0F),
            (2, 0x3333333333333333),
            (1, 0x5555555555555555),
        ):
            e = f"((({e}) | (({e}) << {shift})) & {mask})"
        return e

    return f"({spread(x_col)}) | (({spread(y_col)}) << 1)"


def zorder_key(x_col: str, y_col: str, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative int columns.

    The clustering key behind multi-dimensional data skipping (Delta
    OPTIMIZE ZORDER, Hudi space-filling curves): sorting a rewrite by
    the interleaved key gives every file a tight min/max envelope on
    BOTH dimensions, so a predicate on either column prunes files —
    the property a single-column sort only provides for its leading
    column.  Pairs with ``merge.warehouse.Warehouse.compact(sort_by=)``.

    Pure codegen integer arithmetic (see ``zorder_sql`` for the shared
    expression text).  Coordinates are truncated to the low ``bits``
    bits (max 32); callers bucket or range-partition the returned key.
    """
    from pyspark.sql import functions as F

    return F.expr(zorder_sql(x_col, y_col, bits))
