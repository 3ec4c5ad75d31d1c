"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's only state is the ProcessFile ledger + staging tables
(SURVEY.md §2.5); the engine adds genuine cross-micro-batch state:
per-user running totals, the canonical "accumulate forever" shape for
per-entity counters at scale.

Why ``applyInPandasWithState``: built-in streaming aggregation in
update mode covers pure aggregates; this seam exists for semantics the
built-ins can't express (conditional resets, per-key timeouts,
non-algebraic state transitions).  Running totals keep the test oracle
trivial while exercising the full state machinery — Arrow-batched
per-group pandas, explicit state schema, timeout plumbing.

Scale posture: state is partitioned by user_id across the cluster
(hash shuffle, uniform keys) and lives in the state store (RocksDB in
prod).  State size = O(distinct users), not O(events);
``ttl_minutes`` evicts idle users to bound it on 100 TB streams.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
STATE_SCHEMA = "n bigint, s double"


def _update_user_totals(ttl_minutes: int | None):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle-user eviction: drop state, emit nothing
            state.remove()
            return
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, s))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})

    return fn


def user_running_totals(
    events: DataFrame, ttl_minutes: int | None = None
) -> DataFrame:
    """Streaming DataFrame of per-user running (n_events, sum_value),
    emitted for every user seen in each micro-batch (update semantics).
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals(ttl_minutes),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


TOPK_OUTPUT_SCHEMA = "shard int, user_id bigint, est_count bigint"
TOPK_STATE_SCHEMA = "ids array<bigint>, counts array<bigint>"


def _update_space_saving(capacity: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - not used with NoTimeout
            state.remove()
            return
        ids, counts = state.get if state.exists else ([], [])
        d = dict(zip(ids, counts))
        # accumulate the WHOLE micro-batch's per-user counts before the
        # space-saving update: applying per-Arrow-chunk would make the
        # eviction outcome depend on where maxRecordsPerBatch happens to
        # split the group — per-batch totals + one sorted pass keep the
        # result identical for any chunking.  Memory here is the batch's
        # DISTINCT users (count grain), not its rows.
        pending: dict[int, int] = {}
        for pdf in pdfs:
            for u, n in pdf.groupby("user_id").size().to_dict().items():
                pending[int(u)] = pending.get(int(u), 0) + int(n)
        # deterministic order (sorted user) so eviction ties resolve
        # identically on every run/engine
        for u, n in sorted(pending.items()):
            if u in d:
                d[u] += n
            elif len(d) < capacity:
                d[u] = n
            else:
                # space-saving eviction: the new item inherits the
                # minimum counter (+ its increment); min ties break
                # toward the smaller user id for determinism
                evict = min(d, key=lambda k: (d[k], k))
                d[u] = d.pop(evict) + n
        items = sorted(d.items())
        state.update(([k for k, _ in items], [v for _, v in items]))
        yield pd.DataFrame(
            {
                "shard": [int(key[0])] * len(items),
                "user_id": [k for k, _ in items],
                "est_count": [v for _, v in items],
            }
        )

    return fn


def shard_heavy_users(
    events: DataFrame,
    shards: int = 8,
    capacity: int = 4096,
) -> DataFrame:
    """Streaming space-saving heavy hitters (Metwally et al.): per
    hash-shard, a CAPACITY-BOUNDED counter table over user ids
    maintained across micro-batches in the state store — the second
    custom stateful operator (after user_running_totals), proving the
    applyInPandasWithState seam generalizes to ARRAY-typed state and
    non-algebraic transitions (eviction).

    Sharding by pmod(user_id, shards) means each user lives in exactly
    ONE shard, so per-user counts need no cross-shard merge; state per
    shard is O(capacity) regardless of stream length.  While distinct
    users per shard stay under capacity the counts are EXACT (the
    q130 sketch-shaped-exact trick — the driver oracle grades that
    regime); past capacity the space-saving guarantee holds
    (overestimate bounded by the evicted minimum; unit-tested).
    """
    from pyspark.sql import functions as F

    keyed = events.select(
        F.pmod(F.col("user_id"), F.lit(shards)).cast("int").alias("shard"),
        "user_id",
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _update_space_saving(capacity),
        outputStructType=TOPK_OUTPUT_SCHEMA,
        stateStructType=TOPK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
