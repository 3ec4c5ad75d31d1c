"""SparkSession factory for the engine.

Replaces the reference's connection bootstrap
(``/root/reference/core/database.py:12-50`` — ODBC engine factory + retry
probe): Spark owns connections/retries, so the only bootstrap we need is a
well-configured session. Tuned for local[N] testing but every setting is
cluster-sane (AQE, broadcast threshold, shuffle partitions sized to cores).
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from pathlib import Path

from pyspark.sql import SparkSession


_WARMED_SESSIONS: set[str] = set()


def session_key(spark: SparkSession) -> str:
    """Stable identity for per-session memoization: the underlying
    SparkContext's applicationId.  ``id(spark)`` is unsafe as a cache
    key — CPython reuses a garbage-collected session's address, which
    would alias a FRESH session to a dead one's cache entries (a
    warm-state skip on a session that still needs the package zip, a
    table-cache hit on a catalog that never saw the table).  The
    applicationId lives exactly as long as the JVM context owning all
    the cached state, and sessions sharing a context share that state
    (daemon, addPyFile, saveAsTable catalog), so sharing the cache
    entry is correct."""
    return spark.sparkContext.applicationId


@contextmanager
def scoped_confs(spark: SparkSession, confs: dict[str, str]):
    """Temporarily override session confs, restoring on exit.

    Used to scope *batch-sized* pipeline sections (the reference's
    one-CSV-file merge batches): AQE's per-broadcast job splitting and
    32-way shuffles are pure scheduler overhead on few-thousand-row
    frames — q41's merge chain drops 34 → 22 Spark jobs with AQE off,
    which is what a loaded driver machine actually pays for.  A
    cluster-scale run over big fact partitions keeps AQE on (the
    session default).  Not thread-safe across concurrently *planned*
    queries on the same session — callers are the sequential catalog /
    bench paths.
    """
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def batch_pipeline_confs(spark: SparkSession):
    """Conf scope for file-sized staging→merge batches (see scoped_confs)."""
    return scoped_confs(
        spark,
        {
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.shuffle.partitions": "8",
        },
    )


def stream_batch_confs(
    spark: SparkSession,
    *input_paths,
    target_bytes: int = 64 << 20,
    python_state: bool = False,
    no_data_batches: bool = True,
):
    """Conf scope for a micro-batch stream drain: size shuffle/state
    partitions to the LANDED INPUT, not to the core count.

    Structured Streaming fixes its state-store partition count to
    ``spark.sql.shuffle.partitions`` at first checkpoint commit and
    never coalesces it (no AQE inside streaming plans), so the session
    default — sized to cores for the batch catalog — hands every
    file-sized drain 32 state partitions: 32 state-store commits, 32
    sink files and 32 near-empty tasks per micro-batch of a few MB.
    Measured on the stateful-drain floor harness (r10): 32 partitions
    ≈ 1.4–1.9 s per drain, input-sized ≈ 0.9–1.0 s, identical results
    (all stateful operators here are key-partitioned; partition count
    never changes their output).

    The partition count derives from the bytes sitting in the source
    directory — ceil(bytes / target_bytes), floored at 1 — so the same
    code on a 100 TB backlog sizes UP automatically (capped at 4x
    defaultParallelism; past that, raise target throughput per
    partition, not partition count).  This is the guide's
    "derive partitioning from input size rather than a constant tuned
    for either local mode or the cluster" rule applied to streams; the
    64 MB default target matches the state-store sizing guidance of
    one task-sized chunk per partition.  AQE is additionally disabled
    inside the scope for the foreachBatch BATCH jobs (rollup merges,
    sink writes): on file-sized batches its per-stage re-planning is
    pure scheduler overhead (the q41 batch_pipeline_confs finding —
    34 -> 22 jobs); cluster-scale drains with big batches should pass
    a bigger target_bytes and keep their own session AQE.

    NOTE on restarts: the FIRST drain against a fresh checkpoint bakes
    the state partition count into the checkpoint; later drains reuse
    it regardless of this scope (Spark reads it back from offsets
    metadata), so growing input across drains never forks state layout.

    ``no_data_batches=False`` — disables
    ``spark.sql.streaming.noDataMicroBatches.enabled`` for the drain.
    Spark appends an extra empty "eager state management" micro-batch
    to a drain whenever the watermark advanced; profiled at r11
    (tools/profile_drain.py) that batch costs 0.3–2.8 s of pure
    machinery per drain while its only effect — evicting/emitting
    state the advanced watermark has passed — either does not apply
    (nothing expires under the fixture's long delays: q144/q154/q195)
    or happens identically in the NEXT batch against the restored
    watermark (update-mode eviction q127, append-mode session/window
    eviction in a later restart q165/q313/q241: emitted set is a pure
    function of the watermark sequence, which this flag does not
    change).  Drains whose FINAL flush is performed by the trailing
    no-data batch (single-sentinel queries: the sentinel's own batch
    only advances the watermark; the flush needs one more batch) must
    keep the default ``True`` for that last drain — the two-sentinel
    queries (q195/q241) flush in the second sentinel's data batch, so
    they can turn it off everywhere.

    ``python_state=True`` — for drains whose stateful operator is
    ``applyInPandasWithState``: the cost there is NOT state-store
    commits but per-GROUP Python/pandas invocations (one function call
    + Arrow round-trip per key per micro-batch), which parallelize
    across cores and do not shrink with input bytes.  Measured (r10,
    sf0.1, fresh session each): q241's sessionizer at input-sized n=1
    takes 48.7 s vs 19.0 s at n=8+ — the single Python worker is the
    bottleneck, not the 32 state commits.  So these drains floor the
    partition count at ``defaultParallelism`` (the actual cores of
    whatever cluster is running — not a local constant), keeping every
    Python worker busy; the input-derived count still takes over as
    soon as the backlog outgrows cores * target_bytes.
    """
    import math

    nbytes = 0
    for p in input_paths:
        path = Path(str(p))
        if path.is_dir():
            nbytes += sum(f.stat().st_size for f in path.rglob("*") if f.is_file())
        elif path.is_file():
            nbytes += path.stat().st_size
    n = max(1, math.ceil(nbytes / target_bytes))
    if python_state:
        n = max(n, spark.sparkContext.defaultParallelism)
    n = min(n, 4 * spark.sparkContext.defaultParallelism)
    confs = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": str(n),
    }
    if not no_data_batches:
        confs["spark.sql.streaming.noDataMicroBatches.enabled"] = "false"
    return scoped_confs(spark, confs)


_TUNED_SESSIONS: set[tuple[str, str]] = set()


def tune_batch_shuffle_partitions(
    spark: SparkSession, data_dir: str, target_bytes: int = 64 << 20
) -> None:
    """Size the session's ``spark.sql.shuffle.partitions`` to the BYTES
    of the dataset directory actually being queried — the batch-catalog
    twin of :func:`stream_batch_confs` (r11, guide §2 "derive
    partitioning from input size rather than a constant tuned for
    either local mode or the cluster").

    Why: AQE's coalescing only merges partitions DOWNWARD from the
    configured count, and every extra partition on a KB-scale shuffle
    is a scheduled task plus an AQE stage decision; with 395 catalog
    queries the sub-second tail paid ~0.1 s each for 32-way shuffles
    of a few MB.  Measured (r11, 12-query tail sample, min of 3 warm
    reps): cores-sized 6.29 s vs input-sized 5.20 s (−17%).

    The count is ceil(bytes / 64 MB) clamped to [max(1, cores/8), 4x
    defaultParallelism].  Both ends are cluster-derived, not local
    constants: the cap repeats the streaming scope's rationale (past
    4x cores, raise per-partition throughput, not partition count);
    the FLOOR exists because a reduce stage can be compute-bound at
    tiny shuffle bytes — pair-enumeration joins (q88/q201/q328/q352/
    q356) measured ~2x slower at n=1 (the whole pair explosion runs on
    one task) while n>=cores/8 kept them at their cores-sized times.
    On a 100 TB dataset the byte term saturates the cap, i.e. a real
    cluster keeps full parallelism; only file-sized inputs shrink.
    Applied once per (session, dataset dir): queries against the same
    dir share the setting, and a session that switches datasets
    re-derives it.  Partitioning never changes query RESULTS (every
    operator here is key- or order-insensitive to partition count),
    only scheduling.
    """
    import math

    key = (session_key(spark), str(data_dir))
    if key in _TUNED_SESSIONS:
        return
    _TUNED_SESSIONS.add(key)
    try:
        par = spark.sparkContext.defaultParallelism
        path = Path(str(data_dir))
        nbytes = sum(f.stat().st_size for f in path.rglob("*") if f.is_file())
        n = max(1, par // 8, math.ceil(nbytes / target_bytes))
        n = min(n, 4 * par)
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
    except Exception:  # tuning must never break a query
        pass


def get_spark(
    app_name: str = "aquiles-etl-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Scale posture: AQE on (runtime coalesce + skew-join splitting),
    shuffle partitions sized to the parallelism actually available
    locally — on a real cluster leave ``spark.sql.shuffle.partitions``
    to AQE's coalescing instead of the 200 default.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 4
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)

    # Preloading worker daemon: forked Python workers inherit pandas/
    # pyarrow already imported (copy-on-write), so the first Arrow UDF
    # stage doesn't serialize a wave of cold `import pandas` across
    # every task slot (~4 s on 32 slots).  Workers resolve the module
    # via PYTHONPATH, which must carry this package's parent dir —
    # set BEFORE the JVM launches so the daemon process inherits it.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_parent + (os.pathsep + existing if existing else "")
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Naive parquet timestamps (isAdjustedToUTC=false) must read as
        # TIMESTAMP, not TIMESTAMP_NTZ: event-time watermarks and
        # unix_micros() reject NTZ, and with a UTC session the two carry
        # identical wall-clock values anyway (matching DuckDB's naive
        # rendering).
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # iterative algorithms (connected components) reliable-checkpoint
        # path: let the ContextCleaner delete checkpoint files once their
        # RDD is collected, so long sessions don't accumulate them
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .config("spark.python.daemon.module", "aquiles_etl_pipeline_spark.worker_daemon")
        # local mode: the driver heap IS the whole executor heap; 8g
        # starves 32 cores' worth of caches + broadcast + shuffle and
        # showed up as 2x wall-time GC degradation over a bench sweep
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    warm_python_workers(spark)
    return spark


def ship_package_to_workers(spark: SparkSession) -> None:
    """Make this package importable by Python WORKERS of a foreign
    session.

    Our own sessions export PYTHONPATH before the JVM launches (see
    get_spark), but a foreign session (the correctness driver's, a
    notebook's) may have been built from any cwd — its workers then
    fail `import aquiles_etl_pipeline_spark` inside mapInPandas /
    pandas_udf closures that reference package functions (cloudpickle
    serializes those by module reference, not by value).  Shipping a
    zip of the package via ``addPyFile`` is the standard mid-session
    fix: workers unpack it onto their sys.path.  Idempotent per
    session via _WARMED_SESSIONS' caller; cheap (~100 KB zip, built
    once per process)."""
    import tempfile
    import zipfile

    global _PKG_ZIP
    try:
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        if _PKG_ZIP is None:
            fd, zpath = tempfile.mkstemp(prefix="aquiles_pkg_", suffix=".zip")
            os.close(fd)
            with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
                for root, _dirs, files in os.walk(pkg_dir):
                    for fn in files:
                        if not fn.endswith(".py"):
                            continue
                        full = os.path.join(root, fn)
                        rel = os.path.join(
                            "aquiles_etl_pipeline_spark",
                            os.path.relpath(full, pkg_dir),
                        )
                        zf.write(full, rel)
            _PKG_ZIP = zpath
        spark.sparkContext.addPyFile(_PKG_ZIP)
    except Exception:  # never let shipping break a real session
        pass


_PKG_ZIP: str | None = None


def warm_python_workers(spark: SparkSession) -> None:
    """Boot the Python worker daemon in the background.

    Spark launches the worker daemon lazily on the FIRST Python stage,
    and that launch serializes several seconds of interpreter + pandas/
    pyarrow imports (measured 4.5 s) in the critical path of whichever
    query happens to hit it.  Firing a one-row pandas-UDF job from a
    daemon thread at session creation moves that boot off the critical
    path — it overlaps parquet reads and planning the driver does
    anyway.  Idempotent per session; safe to call with a foreign
    session (the correctness driver's, a notebook's)."""
    key = session_key(spark)
    if key in _WARMED_SESSIONS:
        return
    _WARMED_SESSIONS.add(key)
    ship_package_to_workers(spark)

    def _boot() -> None:
        try:
            import pandas as pd
            from pyspark.sql.functions import pandas_udf

            @pandas_udf("long")
            def _noop(s: pd.Series) -> pd.Series:
                return s

            spark.range(1).select(_noop("id")).collect()
        except Exception:  # never let warm-up break a real session
            pass

    import threading

    threading.Thread(target=_boot, name="aquiles-worker-warmup", daemon=True).start()
