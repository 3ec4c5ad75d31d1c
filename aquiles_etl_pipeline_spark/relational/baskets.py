"""Shared market-basket kernel.

The distinct-(order, part) -> size-capped-basket front-end is the
entry point of every co-purchase query (q328 Adamic-Adar, q352 local
clustering coefficient, q356 rule interest measures, and the q88/q201
lineage they extend).  One source keeps the eligibility rule — basket
size in [2, 16] — byte-identical across consumers and their SQL twins.

The size cap is the SCALE contract, not a convenience: a pair
expansion over capped baskets is bounded at C(max_size, 2) candidate
pairs per order regardless of any part's global popularity, which is
what lets the co-purchase queries survive a whale part (30% of all
lineitems on one l_partkey) with zero plan changes — see
SCALE_STRESS_r09.md §2/§4.

Persistence stays with the caller (the PERSIST_PRONE contract): these
helpers return lazy frames; a query that fans the basket table into
several consumers decides where the localCheckpoint goes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def distinct_order_parts(li: DataFrame) -> DataFrame:
    """Distinct ``(ord, part)`` rows from a lineitem-shaped frame —
    basket membership, multiplicity collapsed."""
    return li.select(
        F.col("l_orderkey").alias("ord"), F.col("l_partkey").alias("part")
    ).distinct()


def capped_basket_parts(
    li: DataFrame, min_size: int = 2, max_size: int = 16
) -> DataFrame:
    """``(ord, part)`` rows restricted to baskets whose DISTINCT part
    count lies in ``[min_size, max_size]`` — the eligible-basket table
    that co-purchase pair expansions and degree rollups both consume.
    """
    op = distinct_order_parts(li)
    bs = op.groupBy("ord").agg(F.count(F.lit(1)).alias("sz"))
    return op.join(
        bs.where(
            (F.col("sz") >= min_size) & (F.col("sz") <= max_size)
        ).select("ord"),
        "ord",
    )
