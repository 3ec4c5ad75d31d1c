"""Local differential harness mimicking the driver's correctness gate.

For every catalog entry with an oracle: run the Spark query and the
DuckDB SQL over the same sf dir, normalize (column-name sort,
row sort, canonical value rendering), and diff exactly.  Any query that
passes here should hash-match in the driver's CORRECTNESS_r{N}.json.

STRICTNESS (round-1 lesson): the rendering is TYPE-SENSITIVE.  The
driver fetches Spark DECIMAL columns scale-preserving (``Decimal('5.40')``
renders "5.40") while DuckDB decimals come back as floats ("5.4"), so
r01's lenient canon (everything -> round-6 float) said OK on 18 queries
the driver hashed red.  Here a Decimal renders via str() with its scale
and a float via repr() — any Decimal-vs-float divergence or last-ulp
float drift between the two sides FAILS locally, exactly like the gate.
Catalog discipline that makes this pass: fractional outputs are DOUBLE
on both sides (see relational.catalog.emit).

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
    """Type-sensitive canonical rendering: sort columns by name, render
    every value as a string WITHOUT cross-type coercion (Decimal keeps
    its scale, float keeps its full repr), then sort rows.  Exact match
    here is the strongest local proxy for the driver's value hash — any
    representation difference the hash could see, this sees."""
    from decimal import Decimal

    import numpy as np

    def render(v):
        if v is None:
            return None
        if isinstance(v, (float, np.floating)):
            return None if v != v else repr(float(v))
        if isinstance(v, Decimal):
            return str(v)  # scale-preserving: 'Decimal('5.40')' -> '5.40'
        if isinstance(v, (bool, np.bool_)):
            return str(bool(v))
        if isinstance(v, (int, np.integer)):
            return str(int(v))
        if isinstance(v, (bytes, bytearray)):
            return bytes(v).hex()
        if isinstance(v, (list, tuple, dict, np.ndarray)):
            # The driver's canonicalizer CANNOT hash container-valued
            # cells — pandas sort_values raises 'unhashable type: list'
            # (q54, r02).  Stringifying here would hide exactly that
            # failure, so the local gate hard-fails instead:
            # local-green must imply driver-green.
            raise TypeError(
                f"container-valued output cell ({type(v).__name__}): graded "
                "queries must emit scalars only (serialize arrays with "
                "array_join / a hash digest)"
            )
        return str(v)

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.tz_localize(None).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        else:
            df[c] = s.map(render)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def main() -> int:
    # --report PATH: append a one-line machine-readable summary to PATH
    # (used for committed sweep records like ORACLE_SF01.md's data)
    args = list(sys.argv[1:])
    report = None
    if "--report" in args:
        i = args.index("--report")
        report = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

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
    if report:
        import json
        from pathlib import Path

        n_run = sum(
            1 for n, s in specs.items()
            if (not only or n in only) and s.sql is not None
        )
        line = json.dumps(
            {
                "metric": "oracle_diff",
                "sf_dir": sf_dir,
                "n_run": n_run,
                "n_fail": len(failures),
                "failures": sorted(failures),
            },
            separators=(",", ":"),
        )
        with Path(report).open("a") as fh:
            fh.write(line + "\n")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
