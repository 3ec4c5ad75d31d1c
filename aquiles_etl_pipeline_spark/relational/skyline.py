"""Pareto-frontier (skyline) operator.

``skyline_2d`` returns the 2-D pareto-optimal points of a DataFrame —
rows no other row dominates (better-or-equal on both axes, strictly
better on one).  Sourcing ("cheapest supplier at every quality level"),
model selection ("best eval score at every model size"), and data-
mixing sweeps all reduce to this shape; Spark has no primitive for it.

Physical strategy — the skyline is DISTRIBUTIVE:
``skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))``, so the operator
never needs a global sort of the input:

  stage 0: project + DISTINCT the (x, y) points (duplicates can't
           change the frontier; the shuffle carries 2 columns);
  stage 1: LOCAL skylines inside hash buckets — one windowed scan per
           bucket using the sorted-scan trick below;
  stage 2: the same scan over the union of local skylines, a candidate
           set bounded by (buckets x per-bucket frontier size), inside
           one task.

The sorted-scan trick (exact for 2-D): sort by x ascending (the
minimized axis), ties y descending; a point is on the frontier iff its
y strictly exceeds the running maximum y of all preceding rows.  Every
preceding row has x <= current x, so "not exceeded" is exactly
"dominated".  One pass, no self-join — the naive NOT EXISTS
formulation (which the DuckDB oracle states, as the semantics) is a
quadratic anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _frontier_scan(df: DataFrame, x: str, y: str, part_cols: list) -> DataFrame:
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.asc(x), F.desc(y))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn("_best", F.max(y).over(w))
        .where(F.col("_best").isNull() | (F.col(y) > F.col("_best")))
        .drop("_best")
    )


def skyline_2d(
    df: DataFrame,
    x: str,
    y: str,
    minimize_x: bool = True,
    maximize_y: bool = True,
    buckets: int = 64,
) -> DataFrame:
    """Distinct pareto-optimal (x, y) points of ``df``.

    Default orientation minimizes ``x`` and maximizes ``y``; flip a
    flag to negate an axis (the negation happens inside the operator,
    outputs keep original values).  ``buckets`` sizes the stage-1
    parallelism — at 100 TB the global stage only ever sees the union
    of per-bucket frontiers, not the data.
    """
    xs = F.col(x) if minimize_x else -F.col(x)
    ys = F.col(y) if maximize_y else -F.col(y)
    pts = (
        df.select(F.col(x), F.col(y))
        .where(F.col(x).isNotNull() & F.col(y).isNotNull())
        .distinct()
        .select(x, y, xs.alias("_sx"), ys.alias("_sy"))
        .withColumn("_bkt", F.pmod(F.xxhash64(F.col(x), F.col(y)), F.lit(buckets)))
    )
    local = _frontier_scan(pts, "_sx", "_sy", ["_bkt"])
    return _frontier_scan(local, "_sx", "_sy", []).select(x, y)
