"""Local differential harness mimicking the driver's correctness gate.

For every catalog entry with an oracle: run the Spark query and the
DuckDB SQL over the same sf dir, normalize (column-name sort,
row sort, canonical value rendering), and diff exactly.  Any query that
passes here should hash-match in the driver's CORRECTNESS_r{N}.json.

Usage: python tools/oracle_diff.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical rendering: sort columns by name, unify numeric types
    (Spark Decimal objects vs DuckDB float64), render every value as a
    string, then sort rows. Exact match here implies any sane
    order-insensitive value hash matches."""
    from decimal import Decimal

    def render(v):
        if v is None or v != v:
            return None
        if isinstance(v, Decimal):
            v = float(v)
        if isinstance(v, float):
            return format(round(v, 6), ".6f")
        if isinstance(v, bool):
            return str(v)
        if isinstance(v, int):
            return str(v)
        return str(v)

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.tz_localize(None).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.map(lambda v: None if v != v else format(round(float(v), 6), ".6f"))
        else:
            df[c] = s.map(render)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from aquiles_etl_pipeline_spark.relational import registry
    from aquiles_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="oracle-diff")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    specs = registry()
    if only:
        unknown = only - set(specs)
        if unknown:
            print(f"unknown queries: {sorted(unknown)} (known: {sorted(specs)})")
            return 2

    failures = []
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        if spec.sql is None:
            print(f"{name}: SKIP (no oracle, rows-only)")
            continue
        try:
            got = canon(spec.fn(spark, sf_dir).toPandas())
            want = canon(con.execute(spec.sql).df())
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            continue
        if list(got.columns) != list(want.columns):
            failures.append(name)
            print(f"{name}: SCHEMA MISMATCH spark={list(got.columns)} duckdb={list(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append(name)
            print(f"{name}: ROWCOUNT MISMATCH spark={len(got)} duckdb={len(want)}")
            continue
        if not got.equals(want):
            neq = (got != want) & ~(got.isna() & want.isna())
            bad_cols = [c for c in got.columns if neq[c].any()]
            failures.append(name)
            print(f"{name}: VALUE MISMATCH in {bad_cols}")
            for c in bad_cols[:2]:
                idx = neq[c].idxmax()
                print(f"    first diff col={c} row={idx}: spark={got[c][idx]!r} duckdb={want[c][idx]!r}")
        else:
            print(f"{name}: OK ({len(got)} rows)")

    print(f"\n{'FAIL ' + str(len(failures)) if failures else 'ALL OK'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
