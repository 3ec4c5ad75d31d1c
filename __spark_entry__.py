"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the engine's declared capability
surface (the registry in aquiles_etl_pipeline_spark/relational/catalog.py)
for the driver's DuckDB differential gate.  Every entry here passes
``python tools/oracle_diff.py`` (the local mirror of that gate) at sf0.01.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from aquiles_etl_pipeline_spark.relational import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the end-to-end ETL star-schema pipeline (canonicalize →
    transform → staging → MERGE×3 → fact readback) at sf0.001."""
    spec = registry()["q41_etl_star_pipeline"]
    return spec.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    return {name: spec.fn for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible queries() entry."""
    return {
        name: spec.sql for name, spec in registry().items() if spec.sql is not None
    }
