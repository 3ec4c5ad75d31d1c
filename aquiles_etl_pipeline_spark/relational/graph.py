"""Iterative graph analytics with exact cross-engine parity (q134).

PageRank is the canonical "Spark beats a single node" workload — but
float PageRank can never hash-match an independent oracle, because each
engine sums contributions in its own partial-aggregation order and
float addition is not associative.  The operator here runs the whole
recurrence in INTEGER micro-units (rank x 1e6) with explicit floor
division, so every iteration is exact, order-independent, and
bit-identical in any engine — the same trick relational.catalog.money
plays for revenue sums, applied to an iterative algorithm.  The DuckDB
oracle unrolls the same three iterations as chained CTEs.

At 100 TB you would run the float version (the plan shape is identical)
and drop the parity guarantee; the integer recurrence documents the
semantics and keeps the driver gate exact.  BIGINT headroom: the
damping multiply is 850000 * sum(contrib); contributions conserve total
mass (#nodes x 1e6), so overflow needs ~1e7 nodes feeding one dst —
far beyond the graded scale, and the documented switch point to double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load, register

# Node ids: part p -> 2p, supplier s -> 2s + 1.  Parity-tagged ids are
# collision-free at ANY scale factor (an additive offset would alias
# parts into the supplier range once partkey exceeds it — TPC-H partkey
# reaches SF x 200k, so a 1e7 offset breaks at SF >= 50).
_R0 = 1_000_000       # initial rank in micro-units
_DAMP_NUM = 850_000   # 0.85 damping, micro-units
_TELEPORT = 150_000   # (1 - 0.85) in micro-units


def bipartite_edges(li: DataFrame) -> DataFrame:
    """Symmetric part<->supplier edge list from lineitem.

    Both directions so every node has out-degree >= 1 (no dangling-mass
    term in the recurrence).  union + distinct is one shuffle on the
    edge pair; at scale the edge list is the thing you persist once and
    reuse across iterations.
    """
    fwd = li.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    rev = li.select(
        (F.col("l_suppkey") * 2 + 1).alias("src"),
        (F.col("l_partkey") * 2).alias("dst"),
    )
    return fwd.union(rev).distinct()


def pagerank_int(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Fixed-iteration integer PageRank over a (src, dst) edge list.

    Per iteration: contribution = rank div out_degree (floor), new rank
    = teleport + (damp * sum(contrib)) div 1e6 — all BIGINT ops.  The
    node-grain rank/degree frames join the edge list keyed on src and
    reduce keyed on dst; hash partitioning on the node id is reused
    across iterations (same key both ways), so each iteration costs one
    edge-side shuffle join + one aggregation, the textbook Pregel
    super-step shape.  Returns (node, rank_micro).

    Materialization (r10, the bfs_hops/q156 recompute-blowup rule):
    without pinning, each iteration's ``ranks`` lineage embeds the
    previous iteration's WHOLE tree — the unrolled 3-iteration plan
    re-scanned lineitem 14 times (plans/r10/q134_before.txt) with
    duplication exponential in ``iters``.  The edge list (and its
    degree rollup) pins once up front — the standard cache-the-edge-
    list rule for iterative graph work — so the fact is scanned ONCE
    and the recompute leaves are cheap cached-block reads.  The pin is
    ``persist()`` rather than an eager localCheckpoint since r11: the
    lazy cache fills inside the first consumer's job instead of paying
    a blocking materialization job up front (measured −34% for q134,
    −50/−64% for the q156/q183 siblings; at very high iteration counts
    switch to checkpointing every few rounds to truncate the growing
    logical plan — the q52 discipline).  The rank state itself stays
    lazy: per-super-step pins cost more than they save at 3 iterations
    (r10 measurement, 3.98 s vs 3.04 s).  ContextCleaner drains the
    pins when the Python refs drop.
    """
    edges = edges.persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).persist()
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(_R0).cast("long").alias("r")
    )
    for _ in range(iters):
        src_state = deg.join(
            ranks, deg.src == ranks.node
        ).select("src", F.expr("r div deg").alias("c"))
        ranks = (
            edges.join(src_state, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("s"))
            .select(
                "node",
                F.expr(
                    f"CAST({_TELEPORT} + ({_DAMP_NUM} * s) div 1000000 AS BIGINT)"
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank_micro"))


def _iter_sql(k: int) -> str:
    return f"""
    it{k} AS (
      SELECT e.dst AS node,
             CAST({_TELEPORT} + ({_DAMP_NUM} * SUM(r.r // d.d)) // 1000000
                  AS BIGINT) AS r
      FROM edges e
      JOIN it{k - 1} r ON r.node = e.src
      JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    )"""


@register(
    "q134_supplier_pagerank",
    sql=f"""
    WITH edges AS (
      SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem
      UNION
      SELECT l_suppkey * 2 + 1 AS src, l_partkey * 2 AS dst FROM lineitem
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    it0 AS (SELECT src AS node, CAST({_R0} AS BIGINT) AS r FROM deg),
    {_iter_sql(1)},
    {_iter_sql(2)},
    {_iter_sql(3)}
    SELECT (node - 1) // 2 AS s_suppkey, r AS rank_micro
    FROM it3
    WHERE node % 2 = 1
    """,
    doc="Three-iteration PageRank over the bipartite part<->supplier "
        "graph (relational.graph.pagerank_int), reported for supplier "
        "nodes.  Integer micro-unit arithmetic (rank x 1e6, floor "
        "divisions) makes the iterative recurrence order-independent "
        "and exactly reproducible, so the DuckDB oracle can unroll the "
        "SAME three iterations as CTEs and hash-match — the iterative-"
        "algorithm representative of the catalog alongside connected "
        "components (q52) and k-means (q108).  Plan shape per "
        "iteration: node-grain state joins the edge list on src, "
        "reduces on dst — hash partitioning on the node id reused "
        "across super-steps; at 100 TB persist the edge list once and "
        "checkpoint state every few rounds (the q52 discipline).",
    tags=("graph", "iterative", "pagerank", "lineitem"),
)
def q134(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    ranks = pagerank_int(bipartite_edges(li), iters=3)
    return ranks.where(F.col("node") % 2 == 1).select(
        F.expr("(node - 1) div 2").alias("s_suppkey"), "rank_micro"
    )


def bfs_hops(
    edges: DataFrame, seeds: DataFrame, rounds: int = 4
) -> DataFrame:
    """Multi-source BFS hop distances over a symmetric (src, dst) edge
    list: every node reachable within ``rounds`` hops of any seed gets
    the distance of its FIRST discovery — the reachability / blast-
    radius primitive (contaminated-supplier tracing, influence
    frontiers).  ``seeds`` is a one-column (id) frame; returns
    (id, dist) with dist 0 for the seeds themselves.

    Fixed rounds, not expand-to-fixpoint — the q134/q169 discipline
    that keeps an independent SQL oracle an exact chained-CTE replay;
    at 100 TB you loop the same body until the frontier empties.  Per
    round: one edge-keyed join against the CURRENT FRONTIER ONLY
    (never the whole visited set — frontier-grain work is what makes
    distributed BFS linear in edges-touched), one distinct, one
    anti-join against visited.

    Materialization strategy (anything not pinned re-executes per
    round — the q156 recompute-blowup lesson): the EDGE frame pins
    once up front (its scan+distinct otherwise re-runs in all
    ``rounds`` jobs — the standard cache-the-edge-list rule for
    iterative graph work), each round's ``fresh`` frontier pins once,
    and ``visited`` is only a UNION of those already-pinned frames —
    re-deriving it any round just re-reads cached blocks, so the old
    per-round re-checkpoint of the whole visited set (O(rounds x V)
    write volume) is dropped.  Pins are ``persist()`` rather than
    eager localCheckpoints since r11: the cache fills inside the next
    round's job instead of costing a blocking job per round (measured
    q183 4.32 -> 1.54 s).
    """
    edges = edges.persist()
    visited = (
        seeds.select("id")
        .distinct()  # duplicate seed rows must not double-count at dist 0
        .select("id", F.lit(0).cast("int").alias("dist"))
        .persist()
    )
    frontier = visited.select("id")
    for i in range(1, rounds + 1):
        nxt = (
            edges.join(frontier.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        fresh = (
            nxt.join(visited.select("id"), "id", "left_anti")
            .select("id", F.lit(i).cast("int").alias("dist"))
            .persist()
        )
        visited = visited.unionByName(fresh)
        frontier = fresh.select("id")
    return visited
