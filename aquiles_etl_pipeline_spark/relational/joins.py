"""Temporal join operators Spark lacks as primitives: as-of join and
interval (range) join, built as compositions of existing DataFrame ops
so Catalyst keeps optimizing them.

The reference has no temporal joins (SURVEY.md §2.4 "absent"); these
are part of the engine's native analytics surface over the events
table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
) -> DataFrame:
    """For every left row, attach the latest right row with
    right_ts <= left_ts within the same `on` key (left outer).

    Physical strategy: union-then-window, the merge-join formulation —
    tag both sides, sort each key's rows by time once, and carry the
    most recent right values forward with last(ignorenulls) over an
    unbounded-preceding window.  ONE shuffle on the join key, linear in
    rows; the naive formulation (theta-join on ts <= ts, then max())
    explodes to the full key-pair cross product.  Ties (equal ts) sort
    the right row first, so an exactly-simultaneous right row is
    visible to the left row.
    """
    lt = left.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(1))
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_t"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    return (
        carried.where(F.col("_side") == 1)
        .drop("_t", "_side", *[f"_r_{c}" for c in right_cols])
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salted keys for pathological key skew.

    AQE's skew-join splitting handles most skew by splitting oversized
    partitions, but it cannot split a SINGLE hot key's hash bucket on
    the build side.  Salting can: the left (large, skewed) side gets a
    random salt in [0, salt); the right side is exploded `salt` times so
    every (key, salt) pair finds its match.  One hot key's rows now
    spread over `salt` tasks.  Cost: right side replicated salt-fold —
    use for large-large joins where the right side is modest but too
    big to broadcast and the left has degenerate keys.
    """
    lsalted = left.withColumn("_salt", (F.rand(seed=7) * salt).cast("int"))
    rsalted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return lsalted.join(rsalted, [on, "_salt"], how).drop("_salt")


def interval_count_join(
    anchors: DataFrame,
    others: DataFrame,
    on: str,
    anchor_ts: str = "ts",
    other_ts: str = "ts",
    window_seconds: int = 3600,
) -> DataFrame:
    """Count `others` rows landing in (anchor_ts, anchor_ts + window]
    per anchor row, same `on` key — an interval/range join.

    Equi-join on the key + range predicate: Catalyst plans a hash join
    on `on` with the range as a post-filter, so the blowup is bounded
    by rows-per-key, not table sizes.  At 100 TB add a coarse time-
    bucket to the equi-key (bucket join) so a key's history doesn't
    need to co-reside."""
    a = anchors.withColumn("_a_ts", F.col(anchor_ts))
    o = others.select(F.col(on).alias("_o_key"), F.col(other_ts).alias("_o_ts"))
    cond = (
        (F.col(on) == F.col("_o_key"))
        & (F.col("_o_ts") > F.col("_a_ts"))
        & (F.col("_o_ts") <= F.col("_a_ts") + F.expr(f"INTERVAL {window_seconds} SECONDS"))
    )
    return (
        a.join(o, cond, "left")
        .groupBy(*[F.col(c) for c in a.columns])
        .agg(F.count("_o_key").alias("n_in_window"))
        .drop("_a_ts")
    )


def fk_audit(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    relationship: str,
) -> DataFrame:
    """One-row referential-integrity audit for a FK relationship:
    (relationship, n_child_rows, n_orphans, orphan_rate) where orphans
    are child rows whose key has no match in the parent (NULL keys
    count as orphans — they reference nothing).

    Physical shape: ONE left join + conditional-count aggregation per
    relationship, fully lazy; dimension-sized parents broadcast, so
    the fact side is one pass with no shuffle.  Union the rows of
    several audits for a whole-schema report — the audits are
    independent branches Spark runs as parallel stages.
    """
    from pyspark.sql import functions as F

    p = parent.select(F.col(parent_key).alias("_pk")).distinct()
    joined = child.select(F.col(child_key).alias("_ck")).join(
        p, F.col("_ck") == F.col("_pk"), "left"
    )
    n_child = F.count(F.lit(1))
    n_orphan = F.sum(F.when(F.col("_pk").isNull(), 1).otherwise(0)).cast("long")
    return joined.agg(
        n_child.alias("n_child_rows"),
        n_orphan.alias("n_orphans"),
        (n_orphan.cast("double") / n_child).alias("orphan_rate"),
    ).select(
        F.lit(relationship).alias("relationship"),
        "n_child_rows",
        "n_orphans",
        "orphan_rate",
    )


def bucketized_range_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 21600,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Keyless interval-overlap join: every fact row whose ``ts_col``
    falls in [start, end) of an interval row — the range join Spark has
    no primitive for (and the shape Delta's range-join binning hint
    optimizes).

    Physical strategy — binning, never theta: a raw ``ts >= start AND
    ts < end`` join with no equi-key plans a broadcast-NLJ/cartesian
    whose cost is |facts| x |intervals|.  Instead both sides gain a
    coarse time bucket: facts map to ONE bucket (integer div of epoch
    micros — exact, no float), intervals EXPLODE to the buckets they
    cover (|interval| / bucket_seconds rows, bounded and small for
    operational windows), and Catalyst plans an equi-join on the bucket
    with the overlap predicate as a post-filter.  The blowup is
    rows-per-bucket, not table sizes — at 100 TB the fact side streams
    through a hash/broadcast join keyed on its scan-local bucket.

    Facts fall in exactly one bucket, so no dedup pass is needed:
    a fact matches an interval at most once.
    """
    bm = bucket_seconds * 1_000_000
    fb = facts.withColumn("_b", F.expr(f"unix_micros({ts_col}) div {bm}"))
    iv = intervals.where(F.col(start_col) < F.col(end_col)).withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros({start_col}) div {bm}"),
                F.expr(f"(unix_micros({end_col}) - 1) div {bm}"),
            )
        ),
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    return (
        fb.join(iv, "_b")
        .where((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_b")
    )
