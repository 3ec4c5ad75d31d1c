"""Cross-engine-portable numeric helpers.

The oracle gate (tools/oracle_diff.py, driver CORRECTNESS runs) compares
Spark results against DuckDB twins by value hash, so every emitted
fractional value must be bit-identical across engines.  ORACLE_SF01.md
documents the one systematic hazard: `round(x, d>0)` — DuckDB multiplies
by 10^d before rounding while Spark scales the exact binary value, so a
computed double within 1 ulp of a half boundary can round differently
(observed live on q256/q266/q89 at sf0.1 and q293 under hypothesis).
Round-to-INTEGER of the same double agrees across engines (both round
half away from zero), so the portable form is ONE round to integer
units followed by an exact divide.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column | str, d: int) -> Column:
    """Portable fixed-point round to ``d`` decimal places: ONE
    round-to-integer in 10^d units, then an exact divide.

    SQL twin (DuckDB):  ``CAST(round(x * 1e<d>) AS BIGINT) / 1e<d>``
    (the divide by a double literal keeps the output DOUBLE; the
    multiply happens on the same double in both engines, so the
    rounded integer — and therefore the quotient — is bit-identical).

    Headroom: |x| must stay below ~9e12 at d=6 (bigint overflow).
    True for every ratio/mean/share/p-value output this is used on;
    totals that could outgrow it keep integer cents end-to-end
    instead (see the round7b money patterns).
    """
    if isinstance(col, str):
        col = F.col(col)
    p = F.lit(float(10**d))
    return (F.round(col * p).cast("bigint") / p).cast("double")
