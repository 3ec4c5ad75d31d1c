"""Incremental aggregate maintenance — the continuous-aggregate /
materialized-view-refresh primitive.

A 100 TB corpus's summary tables (docs/tokens per language, revenue
per day, events per user) must NOT be recomputed from the full fact
history on every ingest batch; they are maintained additively:
aggregate the new batch alone, then merge it into the stored rollup by
key.  Cost is O(|stored agg| + |batch|) regardless of history size —
the TimescaleDB continuous-aggregate / Delta incremental-MV contract,
owned in-engine on the snapshot warehouse.

Only ADDITIVE aggregates (count, sum — and means/ratios derived from
them at read time) merge this way; min/max merge too (idempotent
semilattice), but avg/percentile columns must be stored as their
additive parts (sum + count), never pre-divided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .warehouse import Warehouse

# sum is additive; min/max/bit_or are idempotent semilattices (safe under
# re-merge of overlapping deltas) — bit_or is what makes EXACT distinct
# counts incrementally maintainable (mergeable bitmap sketches)
_MERGE_FNS = {"sum": F.sum, "min": F.min, "max": F.max, "bit_or": F.bit_or}


def refresh_additive(
    wh: Warehouse,
    table: str,
    delta_agg: DataFrame,
    keys: list[str],
    merge: dict[str, str] | None = None,
    meta: dict | None = None,
) -> None:
    """Merge a pre-aggregated batch into the stored rollup.

    ``delta_agg`` is the NEW BATCH aggregated to the same grain as the
    stored table (same key columns, same measure columns).  ``merge``
    maps measure column -> 'sum' | 'min' | 'max' (default: sum for
    every non-key column).  The stored rollup is replaced by
    (stored ∪ delta) re-aggregated by key — one small shuffle over
    grain-sized data, never a fact-table scan.

    ``meta`` commits atomically with the new rollup generation (see
    ``Warehouse.overwrite``) — streaming callers stamp the applied
    batch_id here to make redelivery idempotent.
    """
    measures = [c for c in delta_agg.columns if c not in keys]
    merge = {**{c: "sum" for c in measures}, **(merge or {})}
    bad = [c for c, how in merge.items() if how not in _MERGE_FNS]
    if bad:
        raise ValueError(f"non-mergeable aggregate spec: {bad}")
    if wh.exists(table):
        combined = wh.read(table).unionByName(delta_agg)
    else:
        combined = delta_agg
    rolled = combined.groupBy(*keys).agg(
        *[_MERGE_FNS[merge[c]](c).alias(c) for c in measures]
    )
    wh.overwrite(table, rolled, meta=meta)


def corpus_stats_delta(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-(lang, source) additive corpus stats for one ingest batch:
    doc count, token sum, char sum, min/max doc length — the grain the
    rollup table stores.  Derived metrics (mean tokens/doc) divide at
    read time."""
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens).alias("sum_tokens"),
        F.sum(F.length(text_col)).alias("sum_chars"),
        F.min(n_tokens).alias("min_tokens"),
        F.max(n_tokens).alias("max_tokens"),
    )
