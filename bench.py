"""Benchmark runner: times every catalog query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced through a full execution with a cheap count-style
action (collect on aggregates, count on row-returning queries) so we
measure scan+shuffle+compute, not driver transfer of big results.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)

    from aquiles_etl_pipeline_spark.relational import registry
    from aquiles_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="aquiles-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen paths once so per-query times measure the
    # engine, not first-call JIT + session setup.
    specs = registry()
    first = next(iter(specs.values()))
    first.fn(spark, sf_dir).limit(1).collect()

    timings: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        # force full computation; result sizes are small (aggregates/top-k)
        # except row-level queries, where count() still executes the plan.
        if len(df.columns) <= 2 or name.startswith(("q14", "q15", "q16", "q18", "q24")):
            df.count()
        else:
            df.collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
