"""DuckDB-as-oracle differential tests over the query catalog at
sf0.001 (fast; the full sf0.01 sweep is `python tools/oracle_diff.py`,
mirroring the driver's correctness gate)."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aquiles_etl_pipeline_spark.relational import registry  # noqa: E402
from tools.oracle_diff import TABLES, canon  # noqa: E402


@pytest.fixture(scope="module")
def oracle(sf_dir_module):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir_module}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def sf_dir_module() -> str:
    return "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(registry()))
def test_query_matches_oracle(spark, oracle, sf_dir_module, name):
    spec = registry()[name]
    if spec.sql is None:
        pytest.skip("no oracle (rows-only check)")
    got = canon(spec.fn(spark, sf_dir_module).toPandas())
    want = canon(oracle.execute(spec.sql).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"rowcount {len(got)} != {len(want)}"
    assert got.equals(want), "value mismatch"


def test_q39_approx_distinct_within_tolerance(spark):
    """HLL++ at rsd=0.01 must land within 5% of the exact distinct
    count (it has no DuckDB oracle — sketches differ by engine)."""
    from pyspark.sql import functions as F

    from aquiles_etl_pipeline_spark.relational import registry

    sf = "/root/testdata/sf0.01"
    approx = {
        r["event_type"]: r["approx_users"]
        for r in registry()["q39_approx_distinct_users"].fn(spark, sf).collect()
    }
    ev = spark.read.parquet(f"{sf}/events.parquet")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(0.05 * n, 1), (k, approx[k], n)


def test_salted_join_matches_plain_join(spark):
    """Salted equi-join must be result-identical to the plain join —
    salting only changes the physical row distribution."""
    from pyspark.sql import functions as F

    from aquiles_etl_pipeline_spark.relational.joins import salted_join

    # degenerate skew: 90% of left rows share one key
    left = spark.range(0, 10000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(0, 500).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    got = salted_join(left, right, on="k", salt=8).groupBy("k").count().collect()
    want = left.join(right, "k").groupBy("k").count().collect()
    assert sorted((r["k"], r["count"]) for r in got) == sorted(
        (r["k"], r["count"]) for r in want
    )
