"""Snapshot warehouse: the engine's table layer.

The reference persists to Azure SQL via SQLAlchemy + T-SQL MERGE procs
(/root/reference/core/database.py, core/etl_orchestrator.py:168-189).
Here tables are parquet directories managed with snapshot semantics:
readers always see a complete snapshot; writers replace the snapshot
atomically-enough for a single-writer pipeline (write new generation
dir, then flip a pointer file).

This is a deliberate seam: on a real cluster this class is swapped for
Delta/Iceberg tables (ACID MERGE INTO, time travel) without touching
the merge-job logic, which is pure DataFrame code.  Parquet snapshots
keep the container dependency-free (no delta-spark available here).

Scale posture: staging tables are written partitioned by batch_guid so
merge jobs prune to one partition; fact-table rewrite is the local-mode
stand-in for Delta MERGE's file-level rewrite.  Empty snapshots are a
schema marker file, not a Spark write job — bootstrapping a warehouse
launches zero jobs, and reading an empty table yields a local relation
(which Catalyst folds into trivially-broadcast join sides).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_EMPTY_MARKER = "_EMPTY_SCHEMA.json"


class Warehouse:
    def __init__(self, spark: SparkSession, root: str | Path):
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _table_dir(self, name: str) -> Path:
        return self.root / name

    def _current(self, name: str) -> Path | None:
        ptr = self._table_dir(name) / "_CURRENT"
        if not ptr.exists():
            return None
        return self._table_dir(name) / ptr.read_text().strip()

    def exists(self, name: str) -> bool:
        return self._current(name) is not None

    def read(self, name: str) -> DataFrame:
        cur = self._current(name)
        if cur is None:
            raise FileNotFoundError(f"table {name} does not exist in {self.root}")
        marker = cur / _EMPTY_MARKER
        if marker.exists():
            schema = StructType.fromJson(json.loads(marker.read_text()))
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(str(cur))

    def _new_gen(self, name: str) -> tuple[Path, list[int]]:
        tdir = self._table_dir(name)
        tdir.mkdir(parents=True, exist_ok=True)
        gens = [int(p.name[1:]) for p in tdir.glob("g*") if p.name[1:].isdigit()]
        return tdir / f"g{max(gens, default=-1) + 1}", gens

    def _flip(self, name: str, gen: Path, old_gens: list[int]) -> None:
        (self._table_dir(name) / "_CURRENT").write_text(gen.name)
        # retire old generations (keep previous one for in-flight readers)
        for old in sorted(old_gens)[:-1]:
            shutil.rmtree(self._table_dir(name) / f"g{old}", ignore_errors=True)

    def _write_empty(self, name: str, schema: StructType) -> None:
        gen, old = self._new_gen(name)
        gen.mkdir(parents=True, exist_ok=True)
        (gen / _EMPTY_MARKER).write_text(json.dumps(schema.jsonValue()))
        self._flip(name, gen, old)

    def create_if_absent(self, name: str, schema: StructType) -> None:
        if not self.exists(name):
            self._write_empty(name, schema)

    def overwrite(self, name: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        """Write a new snapshot generation and flip the pointer."""
        gen, old = self._new_gen(name)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(gen))
        # a partitioned write of an empty frame produces no footer at
        # all → unreadable snapshot; demote it to an empty-schema marker
        # (checked on the filesystem, not with a Spark job)
        if not any(gen.rglob("part-*")):
            shutil.rmtree(gen, ignore_errors=True)
            gen.mkdir(parents=True, exist_ok=True)
            (gen / _EMPTY_MARKER).write_text(json.dumps(df.schema.jsonValue()))
        self._flip(name, gen, old)

    def append(self, name: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        """Append = union with current snapshot, rewrite.  On Delta this
        is a true file append; here batches are small per-file batches,
        and staging tables are cleared per-batch, so the rewrite is
        bounded."""
        if self.exists(name):
            cur = self.read(name)
            df = cur.unionByName(df, allowMissingColumns=True)
        self.overwrite(name, df, partition_by=partition_by)

    def drop(self, name: str) -> None:
        shutil.rmtree(self._table_dir(name), ignore_errors=True)
