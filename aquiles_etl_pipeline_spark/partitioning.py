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
