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
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_EMPTY_MARKER = "_EMPTY_SCHEMA.json"


class Warehouse:
    def __init__(
        self, spark: SparkSession, root: str | Path, keep_generations: int = 2
    ):
        """``keep_generations`` controls time-travel retention: how many
        snapshot generations (including the current one) survive a
        write.  2 = current + previous (the in-flight-reader minimum);
        larger values enable `read(name, version=)` further back, at
        the cost of retained hardlink trees (files shared across
        generations are linked, not copied, so retention costs only
        the *delta* files plus directory entries)."""
        import threading

        self.spark = spark
        self.root = Path(root)
        self.keep_generations = max(2, keep_generations)
        # root-manifest publishes are read-modify-replace; the merge
        # chain flips DIFFERENT tables from concurrent threads (see
        # upserts.merge_staging_to_fact_tables), so serialize them
        self._root_lock = threading.Lock()
        self.root.mkdir(parents=True, exist_ok=True)
        # roll forward any transaction interrupted after its commit
        # point — attaching is when a restarted writer re-appears
        self._recover_txn()

    def _table_dir(self, name: str) -> Path:
        return self.root / name

    def _current(self, name: str) -> Path | None:
        ptr = self._table_dir(name) / "_CURRENT"
        if not ptr.exists():
            return None
        return self._table_dir(name) / ptr.read_text().strip()

    def exists(self, name: str) -> bool:
        return self._current(name) is not None

    def read(self, name: str, version: int | None = None) -> DataFrame:
        """Read the current snapshot, or — time travel — a retained
        older generation by number (``version=``; see
        ``keep_generations`` and ``history()``).  The Delta/Iceberg
        `VERSION AS OF` analog: every write makes a new immutable
        generation, so an old version is just a different directory."""
        if version is not None:
            cur = self._table_dir(name) / f"g{version}"
            if not cur.exists():
                have = [g["version"] for g in self.history(name)]
                raise FileNotFoundError(
                    f"table {name} has no retained generation g{version}"
                    f" (retained: {have}; raise keep_generations to retain more)"
                )
        else:
            cur = self._current(name)
        if cur is None:
            raise FileNotFoundError(f"table {name} does not exist in {self.root}")
        return self._read_gen(cur)

    def _read_gen(self, cur: Path) -> DataFrame:
        """Read one resolved generation directory (shared by pointer
        reads, version reads, and snapshot reads)."""
        marker = cur / _EMPTY_MARKER
        if marker.exists():
            # Surface emptiness to Catalyst: range(1)+Filter(false) folds
            # to LocalRelation <empty> (PruneFilters), and then
            # PropagateEmptyRelation ELIMINATES every join against this
            # table from the plan.  createDataFrame([], schema) instead
            # yields an opaque LogicalRDD the optimizer can't see
            # through, so first-batch merges into a bootstrapped
            # warehouse paid broadcast-build + codegen for joins whose
            # result was statically empty.
            schema = StructType.fromJson(json.loads(marker.read_text()))
            return (
                self.spark.range(1)
                .select(*[F.lit(None).cast(f.dataType).alias(f.name) for f in schema.fields])
                .where(F.lit(False))
            )
        stored = self._stored_schema(cur)
        if stored is not None:
            # schema captured at write time: skips the footer-inference
            # job every read would otherwise launch — merge batches do
            # 3-4 reads each, and those jobs dominated the merge profile
            return self.spark.read.schema(stored).parquet(str(cur))
        return self.spark.read.parquet(str(cur))

    def _new_gen(self, name: str) -> tuple[Path, list[int]]:
        tdir = self._table_dir(name)
        tdir.mkdir(parents=True, exist_ok=True)
        self._ensure_epoch(name)
        gens = [int(p.name[1:]) for p in tdir.glob("g*") if p.name[1:].isdigit()]
        return tdir / f"g{max(gens, default=-1) + 1}", gens

    def _ensure_epoch(self, name: str) -> str:
        """A per-table-INCARNATION id: created with the table directory,
        destroyed with drop().  Generation numbers restart at g0 after a
        drop+recreate, so a snapshot pinning (table, gN) alone would
        silently read the NEW table's gN; the manifest pins the epoch
        too and snapshot reads verify it."""
        import uuid

        marker = self._table_dir(name) / "_TABLE_EPOCH"
        if not marker.exists():
            marker.write_text(uuid.uuid4().hex)
        return marker.read_text().strip()

    def _write_pointer(self, name: str, gen_name: str) -> None:
        """Atomically move a table's _CURRENT pointer (tmp + rename).
        A plain write_text truncates first, so a concurrent
        _publish_root (different table, different thread) could read an
        empty/partial pointer mid-write and persist it into the root
        manifest."""
        import threading

        ptr = self._table_dir(name) / "_CURRENT"
        tmp = self._table_dir(name) / (
            f"_CURRENT.tmp.{os.getpid()}.{threading.get_ident()}"
        )
        tmp.write_text(gen_name)
        os.replace(tmp, ptr)

    def _flip(
        self, name: str, gen: Path, old_gens: list[int], publish: bool = True
    ) -> None:
        # retention is computed relative to the PRE-flip current
        # generation, not the highest numbers: after rollback() the
        # pointer may sit on an old generation, and the one in-flight
        # readers hold is the pointer's target, which must always
        # survive the flip — the remaining keep budget then goes to the
        # newest other generations
        pre = self._current(name)
        pre_num = (
            int(pre.name[1:])
            if pre is not None and pre.name[1:].isdigit()
            else None
        )
        self._write_pointer(name, gen.name)
        keep: set[int] = set()
        if pre_num is not None:
            keep.add(pre_num)
        for g in sorted(old_gens, reverse=True):
            if len(keep) >= self.keep_generations - 1:
                break
            keep.add(g)
        for old in sorted(old_gens):
            if old not in keep:
                shutil.rmtree(self._table_dir(name) / f"g{old}", ignore_errors=True)
        if publish:
            self._publish_root()

    # -- root snapshot pointer (cross-table snapshot-isolation reads) ----

    def _root_manifest_path(self) -> Path:
        return self.root / "_ROOT_SNAPSHOT.json"

    def _publish_root(self) -> int:
        """Publish the root snapshot manifest: one atomically-replaced
        file naming every table's current generation.  Readers that
        want CROSS-TABLE snapshot isolation resolve tables through one
        manifest read (:meth:`snapshot`) instead of the per-table
        ``_CURRENT`` pointers — a multi-table :meth:`transaction`
        publishes the manifest once AFTER all its pointer flips, so a
        snapshot reader can never observe the microseconds-wide mixed
        state the per-table pointers go through.  The manifest is
        derived state (rebuilt from the pointers by the next publish),
        so it needs no fsync: losing it costs nothing but a stale
        version number.

        Thread-safe: the merge chain flips different tables from
        concurrent threads, so the read-modify-replace holds the
        instance lock AND the temp file is uniquely named (a shared
        tmp name let one thread's os.replace consume another's file —
        ENOENT under the q41 bench; cross-INSTANCE writers remain out
        of contract, like every other write here)."""
        with self._root_lock:
            tables = {}
            epochs = {}
            for tdir in sorted(self.root.iterdir()):
                ptr = tdir / "_CURRENT"
                if tdir.is_dir() and ptr.exists():
                    try:
                        gen_name = ptr.read_text().strip()
                    except FileNotFoundError:
                        # a concurrent drop() rmtree'd the table dir
                        # between exists() and read_text(); the table is
                        # going away — skip it rather than abort the
                        # whole manifest publish.
                        continue
                    if not gen_name:  # defense vs legacy non-atomic writers
                        continue
                    tables[tdir.name] = gen_name
                    epoch = tdir / "_TABLE_EPOCH"
                    if epoch.exists():
                        epochs[tdir.name] = epoch.read_text().strip()
            prev = 0
            path = self._root_manifest_path()
            if path.exists():
                try:
                    prev = int(json.loads(path.read_text()).get("version", 0))
                except (ValueError, json.JSONDecodeError):
                    prev = 0
            version = prev + 1
            import threading

            tmp = self.root / (
                f"_ROOT_SNAPSHOT.json.tmp.{os.getpid()}.{threading.get_ident()}"
            )
            tmp.write_text(
                json.dumps(
                    {"version": version, "tables": tables, "epochs": epochs}
                )
            )
            os.replace(tmp, path)
            return version

    def snapshot(self) -> "WarehouseSnapshot":
        """A frozen, mutually-consistent view of EVERY table — the
        cross-table analog of ``read(version=)``.  Resolves all tables
        through ONE read of the root manifest, so two tables committed
        together by :meth:`transaction` are always seen together, even
        if another transaction's pointer flips race the reads.  The
        pinned generations stay readable under the same retention
        contract as time travel (``keep_generations`` later writes may
        retire them — a retired read raises FileNotFoundError)."""
        path = self._root_manifest_path()
        if path.exists():
            m = json.loads(path.read_text())
            return WarehouseSnapshot(
                self, int(m["version"]), dict(m["tables"]),
                dict(m.get("epochs", {})),
            )
        # pre-manifest warehouse: derive from the per-table pointers
        # (no concurrent-flip protection until the first publish)
        tables = {}
        for tdir in sorted(self.root.iterdir()):
            ptr = tdir / "_CURRENT"
            if tdir.is_dir() and ptr.exists():
                tables[tdir.name] = ptr.read_text().strip()
        return WarehouseSnapshot(self, 0, tables)

    def _write_empty(self, name: str, schema: StructType) -> None:
        gen, old = self._new_gen(name)
        gen.mkdir(parents=True, exist_ok=True)
        (gen / _EMPTY_MARKER).write_text(json.dumps(schema.jsonValue()))
        self._flip(name, gen, old)

    def create_if_absent(self, name: str, schema: StructType) -> None:
        if not self.exists(name):
            self._write_empty(name, schema)

    def is_empty(self, name: str) -> bool:
        """Driver-side emptiness probe (no Spark job): the table is
        absent or its current generation is the empty-schema marker.
        Lets merges skip their touched-partition pre-flight on the
        bootstrap batch, where there is nothing to scope or carry."""
        cur = self._current(name) if self.exists(name) else None
        return cur is None or (cur / _EMPTY_MARKER).exists()

    def seed_rows(self, name: str, schema: StructType, rows: list[tuple]) -> None:
        """Seed a tiny lookup table with a DRIVER-SIDE pyarrow parquet
        write — no Spark job, preserving the zero-job bootstrap
        contract.  No-op if the table already holds data."""
        if self.exists(name):
            cur = self._current(name)
            if cur is not None and not (cur / _EMPTY_MARKER).exists():
                return
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        table = pa.Table.from_pylist(
            [dict(zip(schema.names, r)) for r in rows], schema=to_arrow_schema(schema)
        )
        gen, old = self._new_gen(name)
        gen.mkdir(parents=True, exist_ok=True)
        pq.write_table(table, gen / "part-00000-seed.parquet")
        self._write_partition_spec(gen, None, schema)
        self._flip(name, gen, old)

    def overwrite(
        self,
        name: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        meta: dict | None = None,
    ) -> None:
        """Write a new snapshot generation and flip the pointer.

        ``meta``: writer-supplied metadata persisted INSIDE the new
        generation before the flip, so it commits atomically with the
        table state (read back via :meth:`write_meta`).  This is how
        streaming continuous aggregates make at-least-once foreachBatch
        redelivery idempotent: the applied batch_id travels with the
        rollup snapshot itself."""
        gen, old = self._stage(name, df, partition_by, meta)
        self._flip(name, gen, old)

    def _stage(
        self,
        name: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        meta: dict | None = None,
    ) -> tuple[Path, list[int]]:
        """Write a fully-formed new generation WITHOUT flipping the
        pointer — the staging half of overwrite(), shared with
        :meth:`transaction` so multi-table commits stage everything
        before any table becomes visible."""
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
        else:
            self._write_partition_spec(gen, partition_by, df.schema)
        if meta is not None:
            (gen / "_WRITE_META.json").write_text(json.dumps(meta))
        return gen, old

    # -- atomic multi-table transactions ---------------------------------

    def _txn_path(self) -> Path:
        return self.root / "_TXN.json"

    def transaction(
        self,
        writes: dict[str, DataFrame | tuple[DataFrame, list[str] | None]],
    ) -> None:
        """Commit new snapshots of SEVERAL tables as one transaction —
        the cross-table atomicity the per-table ``_CURRENT`` flip can't
        give (fact + its rollup, dim + its index must move together).

        Protocol (single-writer, like every write here):

        1. STAGE every table's new generation fully (no pointer moves);
        2. write the transaction manifest via temp-file + atomic
           ``os.replace`` — this rename is the COMMIT POINT: before it,
           a crash aborts cleanly (staged orphans, tables unchanged);
           after it, the transaction is durable;
        3. flip each table's pointer; 4. remove the manifest.

        A crash between 3 and 4 leaves the manifest behind; the next
        ``Warehouse`` attach rolls the transaction FORWARD
        (:meth:`_recover_txn`), flipping whatever pointers remain — so
        observers never see a committed transaction half-applied
        across a restart.  During the microseconds of step 3 itself a
        reader following the PER-TABLE pointers could see mixed
        tables; readers that need cross-table snapshot isolation use
        :meth:`snapshot` instead — the root manifest it resolves
        through moves once, after every flip (step 3.5), so snapshot
        readers see the transaction all-old or all-new.
        """
        import os

        staged: dict[str, tuple[str, list[int]]] = {}
        for name, spec in writes.items():
            df, partition_by = spec if isinstance(spec, tuple) else (spec, None)
            gen, old = self._stage(name, df, partition_by)
            staged[name] = (gen.name, old)
        tmp = self.root / "_TXN.json.tmp"
        # Durability, not just process-crash atomicity: fsync the
        # manifest CONTENTS before the rename and the root DIRECTORY
        # after it, so the commit point cannot reach disk ahead of the
        # bytes it points at on an OS crash / power loss.  (Staged
        # parquet data is Spark-written; its durability is the
        # filesystem's ordinary write-back — the manifest fsync ensures
        # we never replay a manifest whose own contents were lost.)
        # buffered write + flush guards against short os.write returns
        # (a truncated manifest fsynced past the rename would become a
        # corrupt commit record)
        with open(tmp, "wb") as f:
            f.write(
                json.dumps(
                    {n: {"gen": g, "old": o} for n, (g, o) in staged.items()}
                ).encode()
            )
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._txn_path())  # COMMIT POINT (atomic rename)
        dfd = os.open(self.root, os.O_RDONLY)
        try:
            os.fsync(dfd)  # persist the rename itself
        finally:
            os.close(dfd)
        for name, (gen_name, old) in staged.items():
            # publish=False: the root manifest must move ONCE, after
            # every pointer has flipped, so snapshot() readers see the
            # transaction's tables all-old or all-new, never mixed
            self._flip(name, self._table_dir(name) / gen_name, old, publish=False)
        self._publish_root()
        self._txn_path().unlink(missing_ok=True)

    def _recover_txn(self) -> list[str]:
        """Roll forward a transaction interrupted between its commit
        point and its last pointer flip; returns the repaired tables.
        An aborted transaction (crash BEFORE the manifest rename)
        leaves no manifest — staged orphan generations are simply
        never pointed at and fall to retention."""
        path = self._txn_path()
        if not path.exists():
            return []
        try:
            manifest = json.loads(path.read_text())
        except (ValueError, json.JSONDecodeError):
            # an unparsable manifest cannot be a commit record — treat
            # as an abort: staged orphans stay unpointed, old pointers
            # are intact, and removing the debris unbricks the attach
            path.unlink(missing_ok=True)
            return []
        repaired = []
        for name, entry in manifest.items():
            gen = self._table_dir(name) / entry["gen"]
            cur = self._current(name)
            if cur is None or cur.name != entry["gen"]:
                if gen.exists():  # staged fully before the commit point
                    self._flip(name, gen, list(entry["old"]), publish=False)
                    repaired.append(name)
        if repaired:
            self._publish_root()
        path.unlink(missing_ok=True)
        return repaired

    def write_meta(self, name: str) -> dict | None:
        """Metadata recorded with the current generation's write (see
        ``overwrite(meta=)``), or None."""
        cur = self._current(name)
        if cur is None:
            return None
        meta = cur / "_WRITE_META.json"
        return json.loads(meta.read_text()) if meta.exists() else None

    def _link_files(
        self,
        src: Path,
        dest: Path,
        skip_top: str | None = None,
        only_top: str | None = None,
    ) -> bool:
        """Hardlink src's data files into dest, preserving partition
        paths.  ``skip_top`` excludes one top-level partition dir;
        ``only_top`` restricts to one.  Returns True if any file was
        linked."""
        linked = False
        for f in src.rglob("part-*"):
            rel = f.relative_to(src)
            if skip_top is not None and rel.parts[0] == skip_top:
                continue
            if only_top is not None and rel.parts[0] != only_top:
                continue
            target = dest / rel
            target.parent.mkdir(parents=True, exist_ok=True)
            os.link(f, target)
            linked = True
        return linked

    def _partition_spec(self, gen: Path) -> list[str]:
        meta = gen / "_PARTITION_SPEC.json"
        return json.loads(meta.read_text()) if meta.exists() else []

    def _write_partition_spec(
        self, gen: Path, partition_by: list[str] | None, schema: StructType | None = None
    ) -> None:
        (gen / "_PARTITION_SPEC.json").write_text(json.dumps(partition_by or []))
        if schema is not None:
            (gen / "_TABLE_SCHEMA.json").write_text(json.dumps(schema.jsonValue()))

    def _stored_schema(self, gen: Path) -> StructType | None:
        meta = gen / "_TABLE_SCHEMA.json"
        if not meta.exists():
            return None
        return StructType.fromJson(json.loads(meta.read_text()))

    def append(self, name: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        """True file-level append: write ONLY the new rows as parquet,
        hardlink the previous generation's data files into the new one
        (file names are UUID-unique, so partition dirs merge cleanly).

        This is the local stand-in for a Delta transaction-log append:
        cost is O(new data), never O(table history) — the difference
        between a staging table that scales and one that rewrites its
        whole past on every batch.  Falls back to union+rewrite if the
        incoming schema (names AND types) or partition layout diverges
        from the snapshot's — hardlinking mixed-type or mixed-layout
        files into one generation would corrupt the snapshot."""
        cur = self._current(name) if self.exists(name) else None
        cur_empty = cur is None or (cur / _EMPTY_MARKER).exists()
        if not cur_empty:
            # stored (or footer-derived) schema, driver-side; data
            # columns must match by name AND type, and the directory
            # layout by partition spec, for a file-level merge to be sound
            cur_schema = self._stored_schema(cur) or self.spark.read.parquet(str(cur)).schema
            cur_fields = {f.name: f.dataType for f in cur_schema.fields}
            new_fields = {f.name: f.dataType for f in df.schema.fields}
            if cur_fields != new_fields or self._partition_spec(cur) != list(partition_by or []):
                self.overwrite(
                    name,
                    self.read(name).unionByName(df, allowMissingColumns=True),
                    partition_by=partition_by,
                )
                return
        gen, old = self._new_gen(name)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(gen))
        wrote_new = any(gen.rglob("part-*"))
        linked = False if cur_empty else self._link_files(cur, gen)
        if not wrote_new and not linked:
            shutil.rmtree(gen, ignore_errors=True)
            gen.mkdir(parents=True, exist_ok=True)
            (gen / _EMPTY_MARKER).write_text(json.dumps(df.schema.jsonValue()))
        else:
            self._write_partition_spec(gen, partition_by, df.schema)
        self._flip(name, gen, old)

    def replace_partitions(
        self, name: str, df: DataFrame, partition_col: str, values: list
    ) -> None:
        """Delta-MERGE-style partition-scoped rewrite: write ``df`` (which
        must contain only rows whose ``partition_col`` is in ``values``)
        as the new content of exactly those partitions, and hardlink
        every OTHER partition's files from the current snapshot.  Cost is
        O(touched partitions), not O(table) — the difference between a
        fact-table merge that scales and one that rewrites its whole
        history every batch.  No Spark job touches the untouched
        partitions; their files move by hardlink only."""
        cur = self._current(name) if self.exists(name) else None
        cur_empty = cur is None or (cur / _EMPTY_MARKER).exists()
        if not cur_empty:
            # same name+type guard append() applies: _TABLE_SCHEMA.json
            # records only the newest write's schema while older
            # partitions' files ride along by hardlink, so a
            # type-evolving write would make later schema-forced reads
            # silently cast or null-out the carried-forward files.
            # Layout or schema divergence -> full rewrite through
            # unionByName, which surfaces incompatibilities loudly.
            cur_schema = self._stored_schema(cur) or self.spark.read.parquet(str(cur)).schema
            cur_fields = {f.name: f.dataType for f in cur_schema.fields}
            new_fields = {f.name: f.dataType for f in df.schema.fields}
            if cur_fields != new_fields or self._partition_spec(cur) != [partition_col]:
                untouched = self.read(name).where(~F.col(partition_col).isin(values))
                self.overwrite(
                    name, df.unionByName(untouched), partition_by=[partition_col]
                )
                return
        gen, old = self._new_gen(name)
        df.write.mode("overwrite").partitionBy(partition_col).parquet(str(gen))
        wrote_new = any(gen.rglob("part-*"))
        linked = False
        if not cur_empty:
            skip = {f"{partition_col}={v}" for v in values}
            for child in cur.iterdir():
                if child.is_dir() and child.name.startswith(f"{partition_col}=") and child.name not in skip:
                    linked = self._link_files(cur, gen, only_top=child.name) or linked
        if not wrote_new and not linked:
            shutil.rmtree(gen, ignore_errors=True)
            gen.mkdir(parents=True, exist_ok=True)
            (gen / _EMPTY_MARKER).write_text(json.dumps(df.schema.jsonValue()))
        else:
            self._write_partition_spec(gen, [partition_col], df.schema)
        self._flip(name, gen, old)

    def compact(
        self,
        name: str,
        max_files: int = 8,
        target_files: int = 1,
        sort_by: list[str] | None = None,
    ) -> dict[str, int]:
        """OPTIMIZE-style small-file compaction: rewrite every partition
        holding more than ``max_files`` data files down to
        ``target_files``, hardlinking untouched partitions forward.
        Appending micro-batches (streaming ingest, per-file staging
        loads) accumulates files; scan cost and task-scheduling overhead
        grow with file count, not data size — the lakehouse housekeeping
        Delta's OPTIMIZE / Iceberg's rewrite_data_files owns on a real
        cluster.  Cost is O(compacted partitions); returns
        {partition_path_or_'': files_before} for the rewritten ones.

        ``sort_by`` additionally CLUSTERS the rewrite (Delta's
        ``OPTIMIZE ... ZORDER BY``'s single-column analog): rows are
        range-partitioned and sorted on the given columns, so each
        output file covers a disjoint key range and parquet min/max
        footer stats let point/range scans skip whole files.  With
        ``sort_by``, data is row-identical (order changes); without,
        byte-identical.  Snapshot semantics make either safe next to
        readers.
        """
        cur = self._current(name)
        if cur is None or (cur / _EMPTY_MARKER).exists():
            return {}
        spec = self._partition_spec(cur)
        schema = self._stored_schema(cur)

        # group data files by their (possibly nested) partition dir
        groups: dict[Path, list[Path]] = {}
        for f in cur.rglob("part-*"):
            groups.setdefault(f.parent, []).append(f)
        todo = {d: fs for d, fs in groups.items() if len(fs) > max_files}
        if not todo:
            return {}

        if schema is not None and spec:
            # partition columns live in dir names, not in the files
            data_schema = StructType(
                [f for f in schema.fields if f.name not in spec]
            )
        else:
            data_schema = schema

        gen, old = self._new_gen(name)
        stats: dict[str, int] = {}
        for d, fs in todo.items():
            rel = d.relative_to(cur)
            reader = self.spark.read
            if data_schema is not None:
                reader = reader.schema(data_schema)
            df = reader.parquet(str(d))
            out_dir = gen / rel
            if sort_by:
                df = df.repartitionByRange(
                    target_files, *[F.col(c) for c in sort_by]
                ).sortWithinPartitions(*sort_by)
            else:
                df = df.coalesce(target_files)
            df.write.mode("overwrite").parquet(str(out_dir))
            # drop the write's _SUCCESS noise to keep generations uniform
            marker = out_dir / "_SUCCESS"
            if marker.exists():
                marker.unlink()
            stats[str(rel)] = len(fs)
        # hardlink every file of partitions we did not rewrite
        skip_dirs = set(todo)
        for f in cur.rglob("part-*"):
            if f.parent in skip_dirs:
                continue
            target = gen / f.relative_to(cur)
            target.parent.mkdir(parents=True, exist_ok=True)
            os.link(f, target)
        self._write_partition_spec(gen, spec, schema)
        self._flip(name, gen, old)
        return stats

    def delete_partition(self, name: str, col: str, value: str) -> None:
        """Drop one partition directory from the current snapshot — a
        metadata-only operation (Hive/Delta DROP PARTITION): the new
        generation hardlinks every data file except the dropped
        partition's.  No Spark job runs."""
        cur = self._current(name)
        if cur is None or (cur / _EMPTY_MARKER).exists():
            return
        schema = self._stored_schema(cur) or self.spark.read.parquet(str(cur)).schema
        gen, old = self._new_gen(name)
        gen.mkdir(parents=True, exist_ok=True)
        if self._link_files(cur, gen, skip_top=f"{col}={value}"):
            self._write_partition_spec(gen, self._partition_spec(cur), schema)
        else:
            (gen / _EMPTY_MARKER).write_text(json.dumps(schema.jsonValue()))
        self._flip(name, gen, old)

    def history(self, name: str) -> list[dict]:
        """Snapshot log (Delta DESCRIBE HISTORY analog): one entry per
        retained generation, oldest first — version, currentness,
        emptiness, data-file count, total bytes (hardlinked files
        counted at full size per generation), partition spec.  Pure
        driver-side filesystem walk; no Spark job."""
        tdir = self._table_dir(name)
        if not tdir.exists():
            raise FileNotFoundError(f"table {name} does not exist in {self.root}")
        cur = self._current(name)
        out = []
        for gen in sorted(
            (p for p in tdir.glob("g*") if p.name[1:].isdigit()),
            key=lambda p: int(p.name[1:]),
        ):
            files = list(gen.rglob("part-*"))
            out.append(
                {
                    "version": int(gen.name[1:]),
                    "is_current": gen == cur,
                    "is_empty": (gen / _EMPTY_MARKER).exists(),
                    "n_files": len(files),
                    "bytes": sum(f.stat().st_size for f in files),
                    "partition_by": self._partition_spec(gen),
                }
            )
        return out

    def rollback(self, name: str, version: int) -> None:
        """Point _CURRENT back at a retained older generation (Delta
        RESTORE analog).  Metadata-only: no data moves; newer
        generations stay on disk until a later write's retention pass
        retires them."""
        gen = self._table_dir(name) / f"g{version}"
        if not gen.exists():
            raise FileNotFoundError(
                f"table {name} has no retained generation g{version}"
            )
        self._write_pointer(name, gen.name)
        self._publish_root()

    def vacuum(self, name: str) -> list[int]:
        """Remove generation debris a crash can leave behind (Delta
        VACUUM analog): any generation NEWER than the current pointer
        (a write that died between data write and pointer flip) is
        unreachable garbage — readers can never see it, and its data
        files hold disk.  Older-than-retention cleanup happens on every
        flip; this handles the crash-orphan case on demand.  Returns
        the removed generation numbers.

        Writes are crash-safe by construction: the pointer flip is the
        commit point, so a died write leaves the previous snapshot
        intact and fully readable — vacuum is housekeeping, not
        recovery.

        Single-writer assumption (the whole warehouse is single-writer,
        like the reference's one-pipeline SQL database): vacuum must
        not race an in-flight writer — a not-yet-flipped generation
        being written RIGHT NOW is indistinguishable from crash debris.
        Run it from the writer's own control loop, never concurrently
        with a write."""
        cur = self._current(name)
        if cur is None:
            return []
        cur_no = int(cur.name[1:])
        removed = []
        for gen in self._table_dir(name).glob("g*"):
            if gen.name[1:].isdigit() and int(gen.name[1:]) > cur_no:
                shutil.rmtree(gen, ignore_errors=True)
                removed.append(int(gen.name[1:]))
        return sorted(removed)

    def drop(self, name: str) -> None:
        shutil.rmtree(self._table_dir(name), ignore_errors=True)
        self._publish_root()


class WarehouseSnapshot:
    """A frozen cross-table view produced by :meth:`Warehouse.snapshot`:
    every table pinned to the generation the root manifest named at one
    instant.  Immutable by construction — generations never mutate, so
    every ``read`` from one snapshot is mutually consistent no matter
    how many commits happen in between (subject to the warehouse's
    retention window, exactly like ``read(version=)``)."""

    def __init__(
        self,
        wh: Warehouse,
        version: int,
        tables: dict[str, str],
        epochs: dict[str, str] | None = None,
    ):
        self.version = version
        self.tables = dict(tables)
        self.epochs = dict(epochs or {})
        self._wh = wh

    def read(self, name: str) -> DataFrame:
        gen_name = self.tables.get(name)
        if gen_name is None:
            raise FileNotFoundError(
                f"table {name} was not in root snapshot v{self.version}"
            )
        pinned_epoch = self.epochs.get(name)
        if pinned_epoch is not None:
            marker = self._wh._table_dir(name) / "_TABLE_EPOCH"
            live = marker.read_text().strip() if marker.exists() else None
            if live != pinned_epoch:
                # generation numbers restart at g0 after drop+recreate,
                # so without this check a same-named gN of the NEW
                # incarnation would silently satisfy the pin
                raise FileNotFoundError(
                    f"snapshot v{self.version} pinned {name}@{gen_name} of a "
                    "table incarnation that has since been dropped and "
                    "re-created; the pinned data no longer exists"
                )
        gen = self._wh._table_dir(name) / gen_name
        if not gen.exists():
            raise FileNotFoundError(
                f"snapshot v{self.version} pinned {name}@{gen_name}, which "
                "retention has since retired (raise keep_generations to "
                "hold snapshots across more writes)"
            )
        return self._wh._read_gen(gen)
