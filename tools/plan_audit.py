"""Plan-shape audit across the whole catalog (optimization round tooling).

For every catalog query, builds the DataFrame (no execution) and counts
physical-plan features from ``explain('formatted')``: Exchange nodes,
Python-boundary nodes (BatchEvalPython / ArrowEvalPython / MapInPandas /
MapInArrow / FlatMapGroupsInPandas), join strategies, and scans.  Emits
one JSON line per query to stdout plus an aggregate summary, and can dump
the formatted plan per query under plans/<tag>/.

Usage:
    python tools/plan_audit.py [--dump plans/r10 --suffix before] [q41 ...]

The audit is build-only (df._jdf plan string), so it is cheap: no jobs
run except whatever a query's own construction triggers (e.g. MERGE
pipelines that materialize intermediates — those run their writes).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


FEATURES = {
    "exchanges": re.compile(r"\bExchange\b"),
    "py_eval": re.compile(r"BatchEvalPython|ArrowEvalPython"),
    "map_in_py": re.compile(r"MapInPandas|MapInArrow|FlatMapGroupsInPandas"),
    "smj": re.compile(r"SortMergeJoin"),
    "bhj": re.compile(r"BroadcastHashJoin"),
    "shj": re.compile(r"ShuffledHashJoin"),
    "bnlj": re.compile(r"BroadcastNestedLoopJoin"),
    "cartesian": re.compile(r"CartesianProduct"),
    "sorts": re.compile(r"^\s*\(\d+\)\s+Sort\b", re.M),
    "scans": re.compile(r"Scan parquet|Scan ExistingRDD|LocalTableScan"),
    "windows": re.compile(r"^\s*\(\d+\)\s+Window\b", re.M),
    "aqe": re.compile(r"AdaptiveSparkPlan"),
}


def audit_plan(plan: str) -> dict[str, int]:
    return {k: len(rx.findall(plan)) for k, rx in FEATURES.items()}


def main() -> None:
    args = sys.argv[1:]
    dump_dir = None
    suffix = "before"
    if "--dump" in args:
        i = args.index("--dump")
        dump_dir = Path(args[i + 1])
        args = args[:i] + args[i + 2 :]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        args = args[:i] + args[i + 2 :]
    only = set(args)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from aquiles_etl_pipeline_spark.relational import registry
    from aquiles_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="aquiles-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    if dump_dir:
        dump_dir.mkdir(parents=True, exist_ok=True)

    rows = []
    for name, spec in sorted(registry().items()):
        short = name.split("_", 1)[0]
        if only and short not in only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"q": short, "err": str(exc)[:200]}), flush=True)
            continue
        build_s = round(time.perf_counter() - t0, 2)
        feats = audit_plan(plan)
        feats["q"] = short
        feats["build_s"] = build_s
        rows.append(feats)
        print(json.dumps(feats, separators=(",", ":")), flush=True)
        if dump_dir:
            (dump_dir / f"{short}_{suffix}.txt").write_text(plan)

    if rows:
        tot = {
            k: sum(r[k] for r in rows)
            for k in FEATURES
        }
        tot["n"] = len(rows)
        print(json.dumps({"TOTAL": tot}, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
