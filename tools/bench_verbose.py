"""Per-query live-timing variant of bench.py for local profiling:
prints `name seconds` as each catalog query completes (bench.py prints
one JSON line only at the end, which hides where time goes)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aquiles_etl_pipeline_spark.relational import registry
from aquiles_etl_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-verbose")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()
    only = set(sys.argv[1:])
    first = next(iter(specs.values()))
    first.fn(spark, sf_dir).limit(1).collect()
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        if len(df.columns) <= 2 or name.split("_")[0] in {"q14", "q15", "q16", "q18", "q24"}:
            df.count()
        else:
            df.collect()
        print(f"{name} {time.perf_counter() - t0:.2f}", flush=True)


if __name__ == "__main__":
    main()
