"""Stage-level wall-clock profile of q41's pipeline: transform, staging
load, each merge, readback.  Run:  python tools/profile_q41.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from aquiles_etl_pipeline_spark.merge import Warehouse, bootstrap
    from aquiles_etl_pipeline_spark.merge.upserts import (
        ensure_units_of_measure,
        merge_products,
        merge_provider_products,
        merge_providers,
        prepare_product_source,
    )
    from aquiles_etl_pipeline_spark.pipeline import (
        apply_transformations,
        map_columns_to_apply_transformations,
    )
    from aquiles_etl_pipeline_spark.relational.catalog import load
    from aquiles_etl_pipeline_spark.relational.etl_pipeline_query import _synth_input
    from aquiles_etl_pipeline_spark.session import get_spark
    from aquiles_etl_pipeline_spark.staging import load_data_to_staging_tables

    spark = get_spark(app_name="profile-q41")
    spark.sparkContext.setLogLevel("ERROR")
    # warm
    load(spark, sf_dir, "part").limit(1).collect()

    marks: list[tuple[str, float]] = []

    def mark(label: str, t0: float) -> None:
        marks.append((label, time.perf_counter() - t0))
        print(f"  {label:35s} {marks[-1][1]:7.2f}s", flush=True)

    t_all = time.perf_counter()
    t0 = time.perf_counter()
    par = spark.sparkContext.defaultParallelism
    wide = apply_transformations(
        map_columns_to_apply_transformations(
            _synth_input(load(spark, sf_dir, "part")).repartition(par)
        )
    ).persist()
    wide.count()
    mark("transform (persist+count)", t0)

    t0 = time.perf_counter()
    wh = Warehouse(spark, tempfile.mkdtemp(prefix="prof_q41_"))
    bootstrap(wh)
    mark("bootstrap", t0)

    guid = "prof-batch"
    t0 = time.perf_counter()
    load_data_to_staging_tables(wh, wide, guid, collect_counts=False)
    mark("staging load", t0)

    t0 = time.perf_counter()
    merge_providers(wh, guid, collect_stats=False)
    mark("M1 providers", t0)

    t0 = time.perf_counter()
    ensure_units_of_measure(wh, guid, collect_stats=False)
    mark("U1 units", t0)

    t0 = time.perf_counter()
    prepared = prepare_product_source(wh, guid)
    mark("M2 prep", t0)

    t0 = time.perf_counter()
    merge_products(wh, guid, collect_stats=False, prepared=prepared)
    mark("M2 products", t0)

    t0 = time.perf_counter()
    merge_provider_products(wh, guid, collect_stats=False)
    mark("M3 provider_products", t0)

    t0 = time.perf_counter()
    wide.unpersist()
    pp = wh.read("provider_product").alias("pp")
    prod = wh.read("product").alias("prod")
    prov = wh.read("provider").alias("prov")
    uom = wh.read("unit_of_measure").alias("uom")
    n = (
        pp.join(prod, F.col("pp.ProductId") == F.col("prod.Id"))
        .join(prov, F.col("pp.ProviderId") == F.col("prov.Id"))
        .join(uom, F.col("prod.UnitOfMeasureId") == F.col("uom.Id"), "left")
        .count()
    )
    mark("readback join+count", t0)

    print(f"  {'TOTAL':35s} {time.perf_counter() - t_all:7.2f}s  ({n} rows)")


if __name__ == "__main__":
    main()
