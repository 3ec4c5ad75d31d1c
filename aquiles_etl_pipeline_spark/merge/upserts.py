"""The three MERGE jobs + unit-of-measure auto-create.

Owns the reference's out-of-engine relational logic: the T-SQL procs
usp_MergeProvidersFromStaging / usp_MergeProductsFromStaging /
usp_MergeProviderProductsFromStaging invoked at
/root/reference/core/etl_orchestrator.py:168-189, whose bodies are not
in the repo.  Contracts reconstructed (SURVEY.md §2.6) from the staging
shapes, the placeholder-FK comment (etl:151-152), the DescriptionHash
identity index (core/entities.py:106,116) and docs/ETL_ENHANCEMENTS.md:
23-29:

  M1 Provider          — insert-if-absent by Name (synonyms resolve to
                         existing providers and are not re-inserted)
  M2 Product           — upsert keyed on sha256(Description)
  U1 UnitOfMeasure     — auto-create unseen acronyms before M2
  M3 Provider_Product  — upsert keyed on (ProductId, ProviderId) after
                         resolving FKs from denormalized staging names
  S11 cleanup          — drop the batch's staging rows

All merges are pure DataFrame joins against the batch's staging
partition (pruned by BatchGuid) and are idempotent per batch: re-running
the same batch_guid converges to the same table state — that is this
engine's substitute for the reference's single cross-table SQL
transaction (etl:171), which Delta/parquet cannot express.

Scale: staging batches are file-sized (small); every staging-vs-fact
join broadcasts the staging side.  Fact rewrites become Delta MERGE
file-level rewrites on a real cluster (see warehouse.py seam).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import scalar
from .schemas import N_BUCKETS
from .warehouse import Warehouse


def _bucket_of(*key_cols: str) -> F.Column:
    """Stable bucket id from the merge key — the fact-table partition
    column (see schemas.N_BUCKETS)."""
    return F.pmod(F.xxhash64(*key_cols), F.lit(N_BUCKETS)).cast("int")


def _next_ids(
    existing: DataFrame, new_rows: DataFrame, order_col: str, small: bool = True
) -> DataFrame:
    """Assign sequential Ids to new_rows above max(existing.Id),
    ordered by order_col.

    ``small=True`` (the default, and what every staging merge uses —
    inserts are batch-sized by construction): one single-partition
    window, ONE stage.  The range-sampling two-phase path below costs
    ~4 tiny stages of pure scheduler overhead on a few-hundred-row
    batch, which dominated r01's q41 profile.

    ``small=False`` — bulk-backfill path: scalable two-phase numbering
    with no global single-partition window: range-repartition by
    order_col so partitions are globally ordered key ranges, row_number
    within each partition, then shift by per-partition offsets (a
    running sum over the partition-count frame, which has at most
    #partitions rows).  Delta GENERATED ALWAYS AS IDENTITY replaces
    both on a real cluster."""
    if small:
        # max(Id) rides along as a broadcast 1-row cross join instead of
        # a .collect(): one fewer driver round-trip per merge, and the
        # whole id assignment stays a single lazy plan
        maxdf = existing.agg(
            F.coalesce(F.max("Id"), F.lit(0)).cast("long").alias("_maxid")
        )
        w = Window.partitionBy(F.lit(1)).orderBy(order_col)
        return (
            new_rows.coalesce(1)
            .crossJoin(F.broadcast(maxdf))
            .withColumn("Id", (F.col("_maxid") + F.row_number().over(w)).cast("long"))
            .drop("_maxid")
        )
    max_id = (existing.agg(F.coalesce(F.max("Id"), F.lit(0)).alias("m")).collect())[0]["m"]
    local = (
        new_rows.repartitionByRange(F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_rn", F.row_number().over(Window.partitionBy("_pid").orderBy(order_col)))
    )
    offsets = (
        local.groupBy("_pid")
        .agg(F.max("_rn").alias("_cnt"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("Id", (F.lit(max_id) + F.col("_off") + F.col("_rn")).cast("long"))
        .drop("_pid", "_rn", "_off")
    )


def _staging_batch(wh: Warehouse, table: str, batch_guid: str) -> DataFrame:
    # BatchGuid partition pruning: Catalyst pushes this filter to the
    # partitioned staging parquet, reading only this batch's files.
    return wh.read(table).where(F.col("BatchGuid") == batch_guid)


def merge_providers(wh: Warehouse, batch_guid: str, collect_stats: bool = True) -> int:
    """M1: insert staging provider names that match no provider and no synonym.

    ``collect_stats=False`` writes in ONE job (no persist+count gate) —
    the dim is tiny, so an occasional no-new-rows rewrite is cheaper
    than a second action over the anti-join chain every batch."""
    staging = _staging_batch(wh, "staging_provider", batch_guid).select("Name").distinct()
    provider = wh.read("provider")
    synonyms = wh.read("provider_synonym")

    new_names = (
        staging.join(F.broadcast(provider.select("Name")), "Name", "left_anti")
        .join(
            F.broadcast(synonyms.select(F.col("Synonym").alias("Name"))),
            "Name",
            "left_anti",
        )
    )
    new_rows = _next_ids(provider, new_names, "Name").select(
        "Id", "Name", F.current_timestamp().alias("CreateDt")
    )
    if not collect_stats:
        wh.overwrite("provider", provider.unionByName(new_rows))
        return -1
    # batch-sized: persist so the count gate and the write share one
    # materialization instead of re-running the anti-join chain
    new_rows = new_rows.persist()
    n = new_rows.count()
    if n:
        wh.overwrite("provider", provider.unionByName(new_rows))
    new_rows.unpersist()
    return n


def ensure_units_of_measure(wh: Warehouse, batch_guid: str, collect_stats: bool = True) -> int:
    """U1 (docs/ETL_ENHANCEMENTS.md:23): create unseen units before the
    product merge; acronym aliases (UnitOfMeasureAcronym) resolve to
    existing units and are not duplicated.  ``collect_stats=False``
    writes in one job (see merge_providers)."""
    staging = (
        _staging_batch(wh, "staging_product", batch_guid)
        .select(F.lower(F.col("UnitOfMeasure")).alias("Acronym"))
        .where(F.col("Acronym").isNotNull())
        .distinct()
    )
    uom = wh.read("unit_of_measure")
    alias = wh.read("unit_of_measure_acronym")
    unseen = (
        staging.join(F.broadcast(uom.select(F.lower("Acronym").alias("Acronym"))), "Acronym", "left_anti")
        .join(F.broadcast(alias.select(F.lower("Acronym").alias("Acronym"))), "Acronym", "left_anti")
    )
    new_rows = _next_ids(uom, unseen, "Acronym").select(
        "Id", "Acronym", F.col("Acronym").alias("Name")
    )
    if not collect_stats:
        wh.overwrite("unit_of_measure", uom.unionByName(new_rows))
        return -1
    new_rows = new_rows.persist()
    n = new_rows.count()
    if n:
        wh.overwrite("unit_of_measure", uom.unionByName(new_rows))
    new_rows.unpersist()
    return n


def _resolve_uom(wh: Warehouse, df: DataFrame, unit_col: str) -> DataFrame:
    """unit string → UnitOfMeasureId via acronym alias then unit table
    (reference lookup: etl:97-109 + UnitOfMeasureAcronym entities:136-147)."""
    uom = wh.read("unit_of_measure").select(
        F.lower("Acronym").alias("_acr"), F.col("Id").alias("_uom_id")
    )
    alias = wh.read("unit_of_measure_acronym").select(
        F.lower("Acronym").alias("_alias_acr"), F.col("UnitOfMeasureId").alias("_alias_uom_id")
    )
    return (
        df.withColumn("_unit_lc", F.lower(F.col(unit_col)))
        .join(F.broadcast(alias), F.col("_unit_lc") == F.col("_alias_acr"), "left")
        .join(F.broadcast(uom), F.col("_unit_lc") == F.col("_acr"), "left")
        .withColumn("UnitOfMeasureId", F.coalesce("_alias_uom_id", "_uom_id"))
        .drop("_unit_lc", "_alias_acr", "_alias_uom_id", "_acr", "_uom_id")
    )


def prepare_product_source(wh: Warehouse, batch_guid: str) -> tuple[DataFrame, list[int]]:
    """M2's staging-side prep, factored out so the orchestrator can run
    it CONCURRENTLY with M1/U1 (it reads only the staging partition —
    no dependency on providers or units): dedup the batch by
    DescriptionHash, persist it, and collect the touched fact-table
    buckets (the one driver round-trip the partition-scoped rewrite
    needs before it can prune its read)."""
    staging = _staging_batch(wh, "staging_product", batch_guid)
    # one row per distinct description within the batch (T-SQL MERGE
    # requires a unique source; keep the first by deterministic order)
    w = Window.partitionBy("DescriptionHash").orderBy("Description", "Measure", "UnitOfMeasure")
    src0 = (
        staging.withColumn("DescriptionHash", scalar.description_hash(F.col("Description")))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .persist()
    )
    # bootstrap fast path: an EMPTY product table has no partitions to
    # scope the read to or carry forward, so the touched-bucket driver
    # round-trip buys nothing — skip the whole pre-flight job (src0's
    # persist then materializes inside the write job instead; net one
    # fewer job on the first batch, the shape q41 pays every run)
    if wh.is_empty("product"):
        return src0, []
    # collect_set aggregation, not distinct().collect(): the partial
    # aggregate dedupes map-side and the driver round-trip is one
    # single-reduce job over #buckets values — no batch-wide distinct
    # shuffle (this job also materializes src0's persist)
    touched = sorted(
        src0.agg(
            F.collect_set(_bucket_of("DescriptionHash")).alias("_bs")
        ).first()["_bs"]
    )
    return src0, touched


class _ProductMergePlan:
    """Lazy M2 merge result, split from its commit so the orchestrator
    can overlap M2's write with M3 (which needs only the Id↔hash
    mapping carried by ``final``, not the durable parquet)."""

    __slots__ = ("final", "touched", "src0", "src", "new_rows")

    def __init__(self, final, touched, src0, src, new_rows):
        self.final = final
        self.touched = touched
        self.src0 = src0
        self.src = src
        self.new_rows = new_rows

    def release(self) -> None:
        for df in (self.final, self.src, self.src0):
            df.unpersist()


def plan_product_merge(
    wh: Warehouse,
    batch_guid: str,
    prepared: tuple[DataFrame, list[int]] | None = None,
    persist_mapping: bool = False,
) -> _ProductMergePlan:
    """Build M2's merged-table lineage (see :func:`merge_products` for
    the contract) without writing.  ``persist_mapping=True`` persists
    the final frame so a concurrent M3 and the commit's write job share
    one materialization."""
    src0, touched = prepared if prepared is not None else prepare_product_source(wh, batch_guid)
    # persist (lazily — the write job's first broadcast build fills the
    # cache) so the matched join, the insert anti-join, and the id
    # assignment don't each re-run the two uom-resolution joins
    src = _resolve_uom(wh, src0, "UnitOfMeasure").persist()

    # partition-scoped merge: the batch's keys touch a subset of the
    # fact table's buckets; only those partitions are scanned (pruned
    # read) and rewritten — untouched partitions hardlink forward.
    product = wh.read("product")
    base = product.where(F.col("_bucket").isin(touched))
    now = F.current_timestamp()

    matched = base.join(
        F.broadcast(
            src.select(
                "DescriptionHash",
                F.col("UnitPrice").alias("_new_unit_price"),
                F.col("Measure").cast("decimal(18,2)").alias("_new_measure"),
                F.col("UnitOfMeasureId").alias("_new_uom_id"),
            )
        ),
        "DescriptionHash",
        "left",
    )
    updated = matched.select(
        "Id",
        F.coalesce("_new_unit_price", "UnitPrice").alias("UnitPrice"),
        "Description",
        F.coalesce("_new_measure", "Measure").alias("Measure"),
        F.coalesce("_new_uom_id", "UnitOfMeasureId").alias("UnitOfMeasureId"),
        "CreatedDt",
        F.when(F.col("_new_measure").isNotNull() | F.col("_new_uom_id").isNotNull() | F.col("_new_unit_price").isNotNull(), now)
        .otherwise(F.col("UpdatedDt"))
        .alias("UpdatedDt"),
        "DescriptionHash",
        "_bucket",
    )

    inserts_src = src.join(
        F.broadcast(base.select("DescriptionHash")), "DescriptionHash", "left_anti"
    )
    new_rows = _next_ids(product, inserts_src, "DescriptionHash").select(
        "Id",
        F.col("UnitPrice"),
        "Description",
        F.col("Measure").cast("decimal(18,2)").alias("Measure"),
        "UnitOfMeasureId",
        now.alias("CreatedDt"),
        now.alias("UpdatedDt"),
        "DescriptionHash",
        _bucket_of("DescriptionHash").alias("_bucket"),
    )
    final = updated.unionByName(new_rows)
    if persist_mapping:
        final = final.persist()
    return _ProductMergePlan(final, touched, src0, src, new_rows)


def commit_product_merge(
    wh: Warehouse, plan: _ProductMergePlan, collect_stats: bool = True, release: bool = True
) -> dict[str, int]:
    """Write M2's merged touched-bucket content (untouched partitions
    hardlink forward).  ``release=False`` keeps the plan's caches alive
    for a concurrent M3 still reading ``plan.final``."""
    n_ins = plan.new_rows.count() if collect_stats else -1
    final = plan.final
    if not plan.touched:
        # bootstrap batch (empty target): the insert side rides the
        # single-partition id window, so the partitioned write would
        # run as ONE task creating every bucket dir serially; a cheap
        # post-id repartition by bucket writes them in parallel
        # (measured ~0.3s/write at 20k rows).  Incremental batches
        # keep their natural partitioning (the r05 measurement: a
        # blanket repartition costs more than it saves there).
        final = final.repartition(8, "_bucket")
    wh.replace_partitions("product", final, "_bucket", plan.touched)
    n_src = plan.src0.count() if collect_stats else -1
    if release:
        plan.release()
    return {"inserted": n_ins, "total_source": n_src}


def merge_products(
    wh: Warehouse,
    batch_guid: str,
    collect_stats: bool = True,
    prepared: tuple[DataFrame, list[int]] | None = None,
) -> dict[str, int]:
    """M2: upsert keyed on DescriptionHash = sha256(Description)
    (identity implied by the IX_Product_DescriptionHash index,
    core/entities.py:106). Matched → update Measure/UnitOfMeasureId/
    UpdatedDt ('update existing ones with latest data',
    docs/ETL_ENHANCEMENTS.md:28); not matched → insert.

    ``prepared`` is the output of :func:`prepare_product_source` when
    the orchestrator overlapped the prep with M1/U1; unit resolution
    stays lazy here (it must see U1's units), riding inside the write
    job's broadcast joins instead of costing its own action."""
    return commit_product_merge(
        wh, plan_product_merge(wh, batch_guid, prepared), collect_stats
    )


def merge_provider_products(
    wh: Warehouse,
    batch_guid: str,
    collect_stats: bool = True,
    product_mapping: DataFrame | None = None,
) -> dict[str, int]:
    """M3: resolve placeholder FKs from denormalized staging names
    (etl:151-152), then upsert keyed on (ProductId, ProviderId) —
    'insert new relationships, update existing ones'
    (docs/ETL_ENHANCEMENTS.md:29).

    ``product_mapping`` (Id, DescriptionHash): when the orchestrator
    overlaps M3 with M2's write, it passes M2's in-memory merged frame —
    every staged description's bucket is in M2's touched set by
    construction, so the mapping is complete without waiting for (or
    re-reading) the product parquet."""
    staging = _staging_batch(wh, "staging_provider_product", batch_guid)
    product = (
        product_mapping
        if product_mapping is not None
        else wh.read("product")
    ).select(F.col("Id").alias("_product_id"), "DescriptionHash")
    provider = wh.read("provider").select(F.col("Id").alias("_provider_id"), "Name")
    synonyms = wh.read("provider_synonym").select(
        "Synonym", F.col("ProviderId").alias("_syn_provider_id")
    )

    resolved = (
        staging.withColumn("DescriptionHash", scalar.description_hash(F.col("ProductDescription")))
        .join(F.broadcast(product), "DescriptionHash", "left")
        .join(F.broadcast(synonyms), staging.ProviderName == F.col("Synonym"), "left")
        .join(F.broadcast(provider), staging.ProviderName == provider.Name, "left")
        .withColumn("ProviderIdResolved", F.coalesce("_syn_provider_id", "_provider_id"))
        .where(F.col("_product_id").isNotNull() & F.col("ProviderIdResolved").isNotNull())
    )
    # one row per (product, provider): keep the latest review date
    w = Window.partitionBy("_product_id", "ProviderIdResolved").orderBy(
        F.desc_nulls_last("LastReviewDt"), F.desc_nulls_last("Price")
    )
    src = (
        resolved.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col("_product_id").alias("ProductId"),
            F.col("ProviderIdResolved").alias("ProviderId"),
            F.col("IsValidated"),
            F.to_timestamp("LastReviewDt", "yyyy-MM-dd").alias("LastReviewDt"),
            F.col("PackageUnits").try_cast("int").alias("PackageUnits"),
            "IVA",
            "Price",
        )
        .persist()  # batch-sized; shared by matched join + anti-join + write
    )

    # same collect_set fold as prepare_product_source: one single-reduce
    # job that doubles as src's persist materialization.  Bootstrap fast
    # path (see prepare_product_source): an empty target needs no
    # touched set — skip the pre-flight job.
    if wh.is_empty("provider_product"):
        touched: list[int] = []
    else:
        touched = sorted(
            src.agg(
                F.collect_set(_bucket_of("ProductId", "ProviderId")).alias("_bs")
            ).first()["_bs"]
        )
    pp = wh.read("provider_product")
    base = pp.where(F.col("_bucket").isin(touched))
    matched = base.alias("t").join(
        F.broadcast(src.alias("s")),
        (F.col("t.ProductId") == F.col("s.ProductId"))
        & (F.col("t.ProviderId") == F.col("s.ProviderId")),
        "left",
    )
    updated = matched.select(
        F.col("t.Id"),
        F.col("t.ProductId"),
        F.col("t.ProviderId"),
        F.coalesce(F.col("s.IsValidated"), F.col("t.IsValidated")).alias("IsValidated"),
        F.coalesce(F.col("s.LastReviewDt"), F.col("t.LastReviewDt")).alias("LastReviewDt"),
        F.coalesce(F.col("s.PackageUnits"), F.col("t.PackageUnits")).alias("PackageUnits"),
        F.coalesce(F.col("s.IVA"), F.col("t.IVA")).alias("IVA"),
        F.coalesce(F.col("s.Price"), F.col("t.Price")).alias("Price"),
        F.col("t._bucket").alias("_bucket"),
    )
    inserts_src = src.alias("s").join(
        base.select("ProductId", "ProviderId").alias("t"),
        ["ProductId", "ProviderId"],
        "left_anti",
    )
    new_rows = _next_ids(pp, inserts_src, "ProductId").select(
        "Id", "ProductId", "ProviderId", "IsValidated", "LastReviewDt",
        "PackageUnits", "IVA", "Price",
        _bucket_of("ProductId", "ProviderId").alias("_bucket"),
    )
    n_ins = new_rows.count() if collect_stats else -1
    merged = updated.unionByName(new_rows)
    if not touched:
        # bootstrap fast path: parallelize the single-task partitioned
        # write (see commit_product_merge)
        merged = merged.repartition(8, "_bucket")
    wh.replace_partitions("provider_product", merged, "_bucket", touched)
    n_src = src.count() if collect_stats else -1
    src.unpersist()
    return {"inserted": n_ins, "total_source": n_src}


def _cleanup_staging(wh: Warehouse, batch_guid: str) -> None:
    """S11 (etl:182-184): DELETE FROM staging WHERE BatchGuid = batch.
    Partition-aligned delete → metadata-only DROP PARTITION, no scan."""
    for t in ("staging_provider", "staging_product", "staging_provider_product"):
        wh.delete_partition(t, "BatchGuid", batch_guid)


def merge_staging_to_fact_tables(
    wh: Warehouse, batch_guid: str, collect_stats: bool = True
) -> dict[str, object]:
    """etl:168-189 — the three merges + cleanup, honoring the reference's
    dependency order: M1 (providers) and U1 (units) touch disjoint
    tables and staging partitions, so they submit CONCURRENTLY — along
    with M2's staging-side prep (dedup + touched-bucket collect), which
    depends on neither; M2's unit resolution then rides lazily inside
    its write job after U1 lands.  M3 (provider_products) needs M1's
    providers and M2's *merged rows* — not the durable product parquet —
    so M2's write and the whole of M3 overlap, sharing M2's persisted
    final frame as the Id↔DescriptionHash mapping.
    ``collect_stats=False`` skips the stats-only count jobs and writes
    dims in one job each."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        f_prov = pool.submit(merge_providers, wh, batch_guid, collect_stats)
        f_units = pool.submit(ensure_units_of_measure, wh, batch_guid, collect_stats)
        f_prep = pool.submit(prepare_product_source, wh, batch_guid)
        providers, units, prepared = f_prov.result(), f_units.result(), f_prep.result()
    plan = plan_product_merge(wh, batch_guid, prepared=prepared, persist_mapping=True)
    try:
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_m2 = pool.submit(commit_product_merge, wh, plan, collect_stats, False)
            f_m3 = pool.submit(
                merge_provider_products, wh, batch_guid, collect_stats, plan.final
            )
            products, provider_products = f_m2.result(), f_m3.result()
    finally:
        # release even when a merge fails: the persisted final/src
        # frames otherwise pin executor storage for the session's life,
        # and failed batches retry
        plan.release()
    _cleanup_staging(wh, batch_guid)
    return {
        "providers_inserted": providers,
        "units_created": units,
        "products": products,
        "provider_products": provider_products,
    }
