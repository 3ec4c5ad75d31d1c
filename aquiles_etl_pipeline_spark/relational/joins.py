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
    salt_by: str | None = None,
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

    ``salt_by``: a left column (ideally unique, e.g. an event id) to
    derive the salt from deterministically via xxhash64 — same rows
    land in the same salt bucket on every run and retry, which keeps
    lineage-based recomputation and A/B plan comparisons bit-stable.
    Without it, a per-row ``rand(seed)`` assigns salts (deterministic
    per partition layout, sufficient for join correctness).

    Join types where the right side emits unmatched rows (right/full
    outer) are rejected: the right side is replicated per salt, so an
    unmatched right row would surface once PER SALT REPLICA instead of
    once.  Salt the other side (swap the arguments) instead.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join(how={how!r}): right/full outer joins would "
            "duplicate unmatched right rows salt-fold; salt the other side"
        )
    if salt_by is not None:
        lsalted = left.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(salt_by)), F.lit(salt)).cast("int")
        )
    else:
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

    Bucketing uses exact integer FLOOR division (``x - pmod(x, m)``
    before ``div``), not bare ``div``: Spark's ``div`` truncates toward
    zero, which for pre-1970 (negative-micros) timestamps makes bucket
    0 twice as wide and diverges from DuckDB's floor ``//`` — floor-div
    keeps every bucket exactly ``bucket_seconds`` wide on both sides of
    the epoch and matches oracle arithmetic.
    """
    bm = bucket_seconds * 1_000_000

    def floor_bucket(micros_sql: str) -> F.Column:
        # exact integer floor division: subtract the positive remainder
        # (pmod) so the numerator is an exact multiple — no float, no
        # toward-zero truncation on negatives
        return F.expr(
            f"(({micros_sql}) - pmod({micros_sql}, {bm})) div {bm}"
        )

    fb = facts.withColumn("_b", floor_bucket(f"unix_micros({ts_col})"))
    iv = intervals.where(F.col(start_col) < F.col(end_col)).withColumn(
        "_b",
        F.explode(
            F.sequence(
                floor_bucket(f"unix_micros({start_col})"),
                floor_bucket(f"unix_micros({end_col}) - 1"),
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


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = 1 << 17,
    n_hashes: int = 5,
) -> DataFrame:
    """Semi-join with an explicit Bloom-filter runtime row filter.

    The 100 TB problem: ``fact LEFT SEMI JOIN dim`` shuffles every fact
    row that *might* match, even when the dim predicate keeps only a
    sliver of keys.  Spark's own runtime bloom filter
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects this
    automatically for some shapes, but it is planner-discretionary and
    invisible; this operator makes the pattern explicit, tunable, and
    usable in front of ANY downstream stage (an expensive UDF, a sink,
    a second join), not just where the optimizer happens to fire.

    Build side: dim keys hash into an m-bit Bloom bitmap with k
    xxhash64 probes — built with ONE hash aggregation on the word
    index (m/64 longs, bit_or-combined map-side), collapsed to a
    single-row dense array and broadcast.  Probe side: a codegen'd
    expression tests all k bits; survivors (true matches + false
    positives, rate ~(1-e^(-kn/m))^k) then pass through an EXACT
    left-semi join, so the result is exactly ``fact ⋉ dim`` — the
    bloom stage only shrinks what the exact join must shuffle.

    Everything stays JVM-side: no Python UDF, no driver collect of
    keys (only the fixed-size bitmap crosses stages, via broadcast).
    The dim side is scanned twice (bitmap build + the exact probe) —
    it is the SMALL side by contract; persist it first if that scan is
    itself expensive.

    xxhash64 is TYPE-sensitive (int 7, bigint 7, and double 7.0 all
    hash differently), so both sides hash a COMMON rendering of the
    key: numeric-vs-numeric pairs hash the double cast (equality under
    Spark's numeric join coercion implies equal double casts, so no
    true match can be lost; collisions above 2^53 only add false
    positives the exact pass removes), and same-type pairs hash the
    string cast (equal values of one type render identically).  ANY
    other mixed pair — including numeric/string — is REJECTED: the
    post-coercion comparison type depends on the ANSI setting (ANSI
    casts the string to the numeric type and errors on malformed
    rows; legacy compares as double), and join-equal values with
    different string renderings ('7.00' vs 7.0) hash apart, so a
    wrongly modeled hash side silently drops true matches.  Cast both
    keys to one explicit type first.
    """
    from pyspark.sql.types import NumericType

    m, k = n_bits, n_hashes
    n_words = (m + 63) // 64
    ft = fact.schema[fact_key].dataType
    dt = dim.schema[dim_key].dataType
    if isinstance(ft, NumericType) and isinstance(dt, NumericType):
        hash_type = "double"
    elif type(ft) is type(dt):
        hash_type = "string"
    else:
        raise ValueError(
            f"bloom_semi_join: unsupported mixed key types {ft} vs {dt}; "
            "the post-coercion comparison type is ANSI-dependent and a "
            "wrong hash side silently drops matches — cast both keys to "
            "a common type first"
        )
    keys = (
        dim.select(F.col(dim_key).cast(hash_type).alias("_k"))
        .where(F.col("_k").isNotNull())
        .distinct()
    )
    pos = [F.pmod(F.xxhash64(F.col("_k"), F.lit(i)), F.lit(m)) for i in range(k)]
    bits = (
        keys.select(F.explode(F.array(*pos)).alias("_pos"))
        .select(
            F.expr("_pos div 64").alias("_w"),
            F.expr("shiftleft(1L, cast(_pos % 64 AS INT))").alias("_b"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_b").alias("_bits"))
    )
    spark = fact.sparkSession
    dense = (
        spark.range(n_words)
        .select(F.col("id").alias("_w"))
        .join(bits, "_w", "left")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_w", F.coalesce("_bits", F.lit(0)).alias("_bits")))
                ),
                lambda s: s["_bits"],
            ).alias("_bloom")
        )
    )

    def probe(i: int) -> str:
        p = f"pmod(xxhash64(cast({fact_key} AS {hash_type.upper()}), {i}), {m}L)"
        return (
            f"(element_at(_bloom, cast(({p}) div 64 AS INT) + 1)"
            f" & shiftleft(1L, cast(({p}) % 64 AS INT))) != 0"
        )

    candidates = (
        fact.join(F.broadcast(dense))
        .where(F.expr(" AND ".join(probe(i) for i in range(k))))
        .drop("_bloom")
    )
    # exact pass probes the raw dim keys (left-semi needs no distinct
    # build side) — the bitmap's string cast never touches join semantics
    exact_keys = dim.select(F.col(dim_key).alias("_k")).where(F.col("_k").isNotNull())
    return candidates.join(exact_keys, F.col(fact_key) == F.col("_k"), "left_semi")


def mutual_best_match(
    candidates: DataFrame,
    left_col: str,
    right_col: str,
    score_col: str,
) -> DataFrame:
    """Record-linkage election over a scored candidate-pair table:
    keep exactly the pairs where the right record is the LEFT record's
    best match AND vice versa (mutual argmax — the greedy first round
    of stable matching, and the standard one-to-one link rule in
    dedupe/Splink-style ER).  Ties break deterministically toward the
    smaller partner key, so the result is engine- and run-stable.

    Each record links at most once; a record whose best match prefers
    someone else stays unlinked (no transitive chaining — that is what
    dedup_clusters is for).

    Scale: two row_number windows, one per side's key grain — Spark's
    WindowGroupLimit pushes the rank-1 filter into the window sort, so
    each exchange carries candidate rows, never rank materialization
    for every pair.  Feed it blocked candidates (postings/prefix
    blocks), never a cross join.
    """
    wl = Window.partitionBy(left_col).orderBy(
        F.desc(score_col), F.asc(right_col)
    )
    wr = Window.partitionBy(right_col).orderBy(
        F.desc(score_col), F.asc(left_col)
    )
    return (
        candidates.withColumn("_rl", F.row_number().over(wl))
        .withColumn("_rr", F.row_number().over(wr))
        .where((F.col("_rl") == 1) & (F.col("_rr") == 1))
        .drop("_rl", "_rr")
    )


def grid_neighbor_join(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """All point pairs within ``radius`` (integer planar coordinates,
    Euclidean) — the grid-binned spatial self-join every spatial
    engine (Sedona, PostGIS ST_DWithin plans) uses instead of the
    quadratic cross join: bin points into radius-sized square cells,
    pair each point only against the 9-cell neighborhood (one side
    explodes its 3x3 offsets), then exact-filter on integer squared
    distance.  A qualifying pair is found exactly once (each point
    lives in ONE cell, and the offset b_cell - a_cell is unique), so
    no distinct pass is needed.

    Integer coordinates keep the distance test exact in bigint — no
    float epsilon at the radius boundary (callers with 2dp values
    scale to centi-units first).  Cell ids use EXACT INTEGER floor
    division, negative-coordinate safe and immune to the double-
    division misbinning that loses integer resolution past 2^53
    (the bucketized_range_join rule).

    Scale: shuffle keys are (cell_x, cell_y) — the 9x explode happens
    on ids+coords rows only, and per-cell population is bounded by
    density x radius^2, so skew follows spatial hot spots (salt the
    cell key if a cell exceeds executor memory).  Never O(n^2).
    """
    # exact integer floor division (the bucketized_range_join rule):
    # the double-division form misbins once |x|/radius loses integer
    # resolution in a double, silently dropping true neighbor pairs
    cx = F.expr(f"({x_col} - pmod({x_col}, {radius})) div {radius}")
    cy = F.expr(f"({y_col} - pmod({y_col}, {radius})) div {radius}")
    a = points.select(
        F.col(id_col).alias("_ida"),
        F.col(x_col).alias("_xa"),
        F.col(y_col).alias("_ya"),
        cx.alias("_cxa"),
        cy.alias("_cya"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    a9 = a.select(
        "*", F.explode(offsets).alias("_o")
    ).select(
        "_ida", "_xa", "_ya",
        (F.col("_cxa") + F.col("_o.dx")).alias("_cx"),
        (F.col("_cya") + F.col("_o.dy")).alias("_cy"),
    )
    b = points.select(
        F.col(id_col).alias("_idb"),
        F.col(x_col).alias("_xb"),
        F.col(y_col).alias("_yb"),
        cx.alias("_cx"),
        cy.alias("_cy"),
    )
    d2 = (F.col("_xa") - F.col("_xb")) * (F.col("_xa") - F.col("_xb")) + (
        F.col("_ya") - F.col("_yb")
    ) * (F.col("_ya") - F.col("_yb"))
    return (
        a9.join(b, ["_cx", "_cy"])
        .where((F.col("_ida") < F.col("_idb")) & (d2 <= F.lit(radius * radius)))
        .select(
            F.col("_ida").alias(f"{id_col}_a"),
            F.col("_idb").alias(f"{id_col}_b"),
            d2.cast("bigint").alias("dist_sq"),
        )
    )
