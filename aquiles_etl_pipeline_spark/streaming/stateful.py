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


SESS_OUTPUT_SCHEMA = (
    "user_id bigint, start_us bigint, end_us bigint, "
    "n_events bigint, sum_cents bigint"
)
SESS_STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint, cents bigint"


def _update_sessions(gap_us: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        uid = int(key[0])

        def row(start, last, n, cents):
            return {
                "user_id": uid,
                "start_us": int(start),
                "end_us": int(last),
                "n_events": int(n),
                "sum_cents": int(cents),
            }

        if state.hasTimedOut:
            # the watermark passed last_event + gap with no new events:
            # the open session is definitively closed — emit + drop
            start, last, n, cents = state.get
            state.remove()
            yield pd.DataFrame([row(start, last, n, cents)])
            return
        # accumulate the WHOLE micro-batch before sessionizing (the
        # q194 chunk-independence rule), then process in deterministic
        # (ts, event_id) order
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts_us", "event_id"], kind="mergesort")
        closed: list[dict] = []
        if state.exists:
            start, last, n, cents = (int(v) for v in state.get)
        else:
            start = last = n = cents = -1  # no open session
        # null cents arrive as NaN (float64 column) — SUM-skips-null
        # parity means they contribute 0 while the event still counts
        for ts_us, c in zip(batch["ts_us"].astype("int64"),
                            batch["cents"].fillna(0).astype("int64")):
            ts_us, c = int(ts_us), int(c)
            if n < 0:
                start, last, n, cents = ts_us, ts_us, 1, c
            elif ts_us >= last:  # in-order (always true within a batch)
                if ts_us - last < gap_us:
                    last, n, cents = ts_us, n + 1, cents + c
                else:
                    # this event PROVES the gap: the previous session
                    # is closed by data (not by watermark)
                    closed.append(row(start, last, n, cents))
                    start, last, n, cents = ts_us, ts_us, 1, c
            elif start - ts_us < gap_us:
                # late arrival (earlier micro-batch order) inside or
                # within one gap BEFORE the open session: merge, and
                # let it extend the session's start backwards
                start, n, cents = min(start, ts_us), n + 1, cents + c
            else:
                # late arrival a full gap before the open session's
                # start: nothing still in flight can bridge it to the
                # open session, so it forms its own completed session
                closed.append(row(ts_us, ts_us, 1, c))
        state.update((start, last, n, cents))
        # close by timeout when the watermark passes last + gap; the
        # timestamp must exceed the current watermark (a session whose
        # expiry the watermark already passed fires on the next batch)
        expiry = last + gap_us
        wm = state.getCurrentWatermarkMs() * 1000
        state.setTimeoutTimestamp(max(expiry, wm + 1_000) // 1000)
        if closed:
            yield pd.DataFrame(closed)

    return fn


def session_summaries(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Custom inactivity-gap sessionizer with EVENT-TIME TIMEOUTS — the
    third applyInPandasWithState operator, and the one that exercises
    the state-timeout machinery the other two never touch
    (user_running_totals: ProcessingTime TTL eviction only;
    shard_heavy_users: NoTimeout).

    Gaps-and-islands semantics at MICROSECOND precision: events of a
    user share a session while consecutive gaps stay strictly under
    ``gap_minutes``; a gap >= ``gap_minutes`` starts a new session
    (this is what q241's oracle grades).  NOTE the deliberate boundary
    difference from the batch sessionizer
    ``relational.timeseries._assign_sessions`` (q12/q32/q80), which
    compares WHOLE-SECOND epochs with a strict ``>``: a gap of exactly
    ``gap_minutes`` (or any fraction within the following second)
    splits here but merges there.  Out-of-order events that cross
    micro-batches merge into the open session when they land within
    one gap of its ``start`` (extending it backwards); anything older
    closes immediately as its own single-event session — the
    best-effort reading of gaps-and-islands when a potential bridging
    event may simply never arrive.  A session closes two ways, both
    emitting exactly one final row (append semantics):

    * DATA-closed: a later event of the same user proves the gap;
    * TIMEOUT-closed: the WATERMARK passes last_event + gap
      (``GroupStateTimeout.EventTimeTimeout`` +
      ``state.setTimeoutTimestamp``) — the mechanism that closes the
      tail sessions no further event will ever close, and what bounds
      state at 100 TB: an idle user's state leaves the store one gap
      after their last event, not at stream end.

    Input must carry event-time micros (``ts_us``), ``event_id`` for
    deterministic intra-batch order, integer ``cents``, and a watermark
    on its ``ts`` column.  Output: one row per CLOSED session.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    return events.groupBy("user_id").applyInPandasWithState(
        _update_sessions(gap_us),
        outputStructType=SESS_OUTPUT_SCHEMA,
        stateStructType=SESS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
