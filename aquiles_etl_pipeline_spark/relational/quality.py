"""Declarative data-quality expectations (q137).

The Delta-Live-Tables / Great-Expectations primitive re-expressed as a
single aggregation pass: a rule is just a boolean Column, a rule SET is
one scan computing every rule's violation count simultaneously (CASE
sums fold map-side), and the single stats row unpivots to the long
(rule, violations) report via stack().  No per-rule jobs, no second
scan, no Python — the shape that holds when the table is 100 TB and
the expectation suite has 200 rules.

``quarantine`` gives the complementary operator: the rows failing ANY
rule, as a plain filter the scan can push down — run it only when the
violation report says there is something to quarantine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..numerics import pround


def expectation_report(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """One-pass violation report for a list of (name, predicate) rules.

    A row VIOLATES a rule when the predicate is false OR null (null-
    hostile on purpose: an expectation that cannot be evaluated is not
    met — the Great Expectations convention).  Returns one row per rule:
    (rule, n_rows, n_violations, violation_rate round-6).
    """
    if not rules:
        raise ValueError("expectation_report needs at least one rule")
    aggs = [F.count("*").alias("__n")]
    for i, (_, pred) in enumerate(rules):
        aggs.append(
            F.sum(
                F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)
            ).cast("long").alias(f"__v{i}")
        )
    one = df.agg(*aggs)

    def lit(name: str) -> str:
        # rule names land inside a SQL string literal — escape quotes
        # and backslashes so a name like "value isn't null" is legal
        return "'" + name.replace("\\", "\\\\").replace("'", "\\'") + "'"

    stack_args = ", ".join(f"{lit(name)}, __v{i}" for i, (name, _) in enumerate(rules))
    return (
        one.selectExpr(
            "__n", f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)"
        )
        .select(
            "rule",
            F.col("__n").alias("n_rows"),
            "n_violations",
            pround(F.col("n_violations") / F.col("__n"), 6).alias("violation_rate"),
        )
    )


def quarantine(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Rows failing ANY rule (predicate false or null) — the reject
    stream a pipeline writes to a quarantine table for replay."""
    failing = None
    for _, pred in rules:
        bad = ~F.coalesce(pred, F.lit(False))
        failing = bad if failing is None else (failing | bad)
    if failing is None:
        raise ValueError("quarantine needs at least one rule")
    return df.where(failing)
