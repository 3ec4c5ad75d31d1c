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
