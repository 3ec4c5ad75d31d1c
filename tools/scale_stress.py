"""Scale-stress harness: does the 100x posture hold beyond sf0.1?

Builds a ~10x re-keyed copy of the sf0.1 parquet tables (an "sf1-ish"
dataset: every fact/entity table duplicated FACTOR times with disjoint
key ranges, referential integrity preserved within each copy, the tiny
region/nation dims left alone), then runs the flagship pipelines at
both scales and checks the two things a local bench can actually prove
about cluster behavior:

* **near-linear time scaling** — wall time at 10x data must stay under
  ~12x the sf0.1 time (a super-linear blow-up at 10x means an O(n^2)
  pair enumeration, an unbounded window, or a driver-side loop that a
  1000-executor cluster would hit 100x harder);
* **stable plan shape** — the physical plan at 10x must not flip into
  a CartesianProduct / BroadcastNestedLoopJoin that was absent at
  sf0.1 (the "worked small, degenerated big" failure mode).

Duplicated documents/embeddings are cross-copy EXACT duplicates by
design: the dedup flagships (q52/q60/q200) then stress the dup-heavy
corpus case where LSH buckets and IVF cells hold FACTOR copies of every
doc — the worst realistic input for pair enumeration.

Usage:
    python tools/scale_stress.py [--factor 10] [--queries q41,q52,...]
                                 [--src /root/testdata/sf0.1]
                                 [--workdir /tmp/scale_stress]
                                 [--report SCALE_STRESS_r07.md]

Exit code 0 = every query within budget and no plan flips.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# key offset between copies: even (preserves user_id % 2 variant splits)
# and far above every key in the sf0.1 tables (max ~6e5).
OFFSET = 2**33

# bigint key columns to re-key per table; everything else copies as-is.
# region/nation are dimensions with fixed semantic domains — scaling
# them would change query SEMANTICS (revenue per nation etc.), so they
# stay at 1x, exactly like a real warehouse's dims vs facts.
REKEY: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],
    "region": [],
}

FLAGSHIPS = [
    # batch pipelines
    "q41_etl_star_pipeline", "q52_dedup_clusters", "q60_semantic_dedup",
    "q177_gdpr_cascade_delete", "q200_curation_pipeline_v2",
    # streaming flagships (r08: drain cost must track batch size, not
    # history — the incremental-maintenance claim)
    "q102_streaming_rollup_parity", "q138_streaming_bitmap_dau",
    "q172_streaming_cdc_merge", "q326_stream_gram_pca",
    # round-8 wing corpus-scale entries
    "q328_adamic_adar_links", "q333_tfidf_cosine_topk",
    "q340_umass_topic_coherence", "q347_randomization_inference",
    # round-10 wing: restart-storm MERGE (drain cost must track batch,
    # not history) and the mergeable-sketch pair (pure two-level aggs)
    "q370_stream_restart_redelivery", "q367_histogram_quantile_merge",
    "q368_hll_register_union",
    # round-10 second wing: the entries with real shuffles — the
    # shard-local window census (one shuffle+sort over lineitem), the
    # per-user survival groupBy, and the melt + feature-grain joins
    # (q373/q375/q377 are single-scan conditional aggs, trivially
    # scan-bound, not separately stressed)
    "q372_column_encoding_advisor", "q374_logrank_test",
    "q376_leakage_audit",
    # round-10 third wing: the entries whose shuffles carry row-scale
    # data — the key-histogram census over all four star joins, the
    # order-grain reconciliation join, and the (custkey, band) audit
    # groupBy (q381/q382 are single-scan conditional aggs; q383's
    # windows run over the tiny day spine after the day-grain shuffle)
    "q378_join_size_estimator", "q379_order_amount_reconciliation",
    "q380_repeated_order_audit",
    # round-10 fourth wing: the in-engine training paths — NB token-
    # class counting + label-bounded scoring fan-out, and the capped-
    # basket Bradley-Terry pair mining (whale part = hot basket test);
    # plus the MV-advisor's six two-phase distincts over lineitem
    # (q385/q386 are conditional-agg scans, q389 is day-spine-tiny)
    "q384_nb_lang_classifier", "q387_rollup_mv_advisor",
    "q388_bradley_terry_brands",
    # round-10 fifth wing: the two new row-scale shuffle patterns —
    # the x3 key-column explode census and the distinct-value-grain
    # EDF windows (q391/q393/q394 aggregate at user/day/source grain,
    # shapes already stressed via q374/q383-family; q395 shares
    # q384's plan)
    "q390_shuffle_partition_advisor", "q392_cramer_von_mises",
]

# plan nodes that must not APPEAR at 10x if absent at 1x
FORBIDDEN_FLIPS = ("CartesianProduct", "BroadcastNestedLoopJoin")
SHAPE_NODES = FORBIDDEN_FLIPS + (
    "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin", "Exchange",
)


# adversarial-skew overrides (--skew): FOREIGN-key columns only — a
# deterministic 30% of each table's rows point at ONE whale key drawn
# from the BASE key range (min of the referenced dim, present in copy
# 0), so referential integrity holds while the join/degree distribution
# becomes the one-hot-key worst case every crawl corpus eventually
# grows (a null-ish user, a default provider).  PRIMARY keys are never
# whaled: collapsing them would change table semantics (dup pks,
# multi-match MERGE), not just the distribution.  Mapping: table ->
# (fk_col, table whose min key is the whale, pk col used to pick the
# deterministic 30%).
SKEW_FK: dict[str, list[tuple[str, str, str]]] = {
    "events": [("user_id", "customer.c_custkey", "event_id")],
    "orders": [("o_custkey", "customer.c_custkey", "o_orderkey")],
    "lineitem": [
        ("l_partkey", "part.p_partkey", "l_orderkey"),
        ("l_suppkey", "supplier.s_suppkey", "l_orderkey"),
    ],
}
SKEW_PCT = 30


def build_scaled(src: str, dst: Path, factor: int, skew: bool = False) -> None:
    """Materialize the re-keyed FACTOR-x dataset with DuckDB (no Spark
    session needed; a cross join against range(factor) emits all copies
    in one vectorized statement per table).  With ``skew``, FK columns
    additionally collapse onto a whale key for SKEW_PCT% of rows (see
    SKEW_FK)."""
    import duckdb

    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    whales: dict[str, int] = {}
    if skew:
        for refs in SKEW_FK.values():
            for _fk, ref, _pk in refs:
                if ref not in whales:
                    rt, rc = ref.split(".")
                    whales[ref] = con.execute(
                        f"SELECT MIN({rc}) FROM '{src}/{rt}.parquet'"
                    ).fetchone()[0]
    for table, keys in REKEY.items():
        out = dst / f"{table}.parquet"
        if out.exists():
            continue
        src_file = f"{src}/{table}.parquet"
        if not keys:
            con.execute(
                f"COPY (SELECT * FROM '{src_file}') TO '{out}' (FORMAT PARQUET)"
            )
            continue
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{src_file}'").fetchall()]
        skew_cols = {
            fk: (whales[ref], pk)
            for fk, ref, pk in SKEW_FK.get(table, [])
        } if skew else {}

        def render(c: str) -> str:
            rekeyed = f"t.{c} + c.i * {OFFSET}" if c in keys else f"t.{c}"
            if c in skew_cols:
                whale, pk = skew_cols[c]
                # hash(pk || ':fk') picks the same 30% of rows in every
                # copy — deterministic, rerun-stable, independent of the
                # fk value being overridden.  The fk name SALTS the
                # selector so two FKs on one table (lineitem's part +
                # supplier) whale INDEPENDENT 30% slices instead of
                # perfectly-correlated ones (whale-supplier rows must
                # also carry non-whale parts, and vice versa)
                return (
                    f"CASE WHEN hash(t.{pk} || ':{c}') % 10 < {SKEW_PCT // 10} "
                    f"THEN CAST({whale} AS BIGINT) ELSE {rekeyed} END AS {c}"
                )
            return f"{rekeyed} AS {c}"

        proj = ", ".join(render(c) for c in cols)
        con.execute(
            f"COPY (SELECT {proj} FROM '{src_file}' t, "
            f"range({factor}) c(i)) TO '{out}' (FORMAT PARQUET)"
        )
    con.close()


def plan_of(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def shape(plan: str) -> dict[str, int]:
    return {n: plan.count(n) for n in SHAPE_NODES}


def run_one(spark, spec, sf_dir: str) -> tuple[float, dict[str, int]]:
    t0 = time.perf_counter()
    df = spec.fn(spark, sf_dir)
    # collect() (not count()) so DF's OWN QueryExecution runs — count()
    # spawns a separate QE, leaving df's plan un-executed and its
    # explainString stuck at the pre-AQE initial plan
    # (isFinalPlan=false); flagship results are small (readbacks /
    # aggregates), so the transfer cost is noise
    df.collect()
    elapsed = time.perf_counter() - t0
    # plan captured AFTER execution so AQE's final decisions are visible
    return elapsed, shape(plan_of(df))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--queries", default=",".join(FLAGSHIPS))
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--workdir", default="/tmp/scale_stress")
    ap.add_argument("--budget", type=float, default=12.0,
                    help="max allowed time ratio at --factor x data")
    ap.add_argument("--report", default=None,
                    help="markdown report path (optional)")
    ap.add_argument("--skew", action="store_true",
                    help="adversarial FK skew: 30%% of events/orders/"
                         "lineitem rows point at one whale key (see "
                         "SKEW_FK); primary keys stay unique")
    args = ap.parse_args()

    from aquiles_etl_pipeline_spark.relational import registry
    from aquiles_etl_pipeline_spark.session import get_spark

    suffix = "skew" if args.skew else ""
    scaled = Path(args.workdir) / f"sf0.1x{args.factor}{suffix}"
    print(f"[scale_stress] building {scaled} (factor {args.factor}"
          f"{', skewed FKs' if args.skew else ''})",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    build_scaled(args.src, scaled, args.factor, skew=args.skew)
    print(f"[scale_stress] dataset ready in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    spark = get_spark(app_name="scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()
    names = [n for n in args.queries.split(",") if n]
    rows = []
    ok = True
    for name in names:
        spec = specs[name]
        # warm once at the TINY scale so JIT/codegen/session constants
        # don't contaminate the first measured run.  Warming at args.src
        # (the old behavior) silently corrupted the ratio for memoized
        # streaming queries: their per-(session, sf_dir) result cache
        # made base_t a ~0.2s cache hit while scaled_t was a full
        # multi-drain build, so ratios read as 60x or 0.2x noise.
        # The warm dir is derived as args.src's sf0.001 SIBLING (not a
        # hardcoded path, so --src works from any testdata root); when
        # no sibling exists fall back to args.src — accepting the memo
        # distortion beats crashing before the first measurement.
        warm = Path(args.src).parent / "sf0.001"
        warm_dir = str(warm) if warm.is_dir() else args.src
        if name == names[0] and Path(warm_dir).resolve() == Path(args.src).resolve():
            # two distinct ways to end up warming at --src, each with
            # its own memo-distortion story (review-found: the old
            # `warm_dir == args.src` string compare mislabeled the
            # src-IS-sf0.001 case as a missing sibling)
            if not warm.is_dir():
                print("[scale_stress] WARNING: no sf0.001 sibling; warming "
                      "at --src (memoized streaming base times will read "
                      "low)", file=sys.stderr, flush=True)
            else:
                print("[scale_stress] WARNING: --src IS the sf0.001 warm "
                      "dir; the warm pass primes per-(session, sf_dir) "
                      "memo caches at --src, so memoized streaming base "
                      "times will read low", file=sys.stderr, flush=True)
        spec.fn(spark, warm_dir).limit(1).collect()
        base_t, base_shape = run_one(spark, spec, args.src)
        scaled_t, scaled_shape = run_one(spark, spec, str(scaled))
        ratio = scaled_t / base_t if base_t > 0 else float("inf")
        flips = [
            n for n in FORBIDDEN_FLIPS
            if scaled_shape[n] > 0 and base_shape[n] == 0
        ]
        verdict = "OK"
        if flips:
            verdict, ok = f"PLAN FLIP: {flips}", False
        elif ratio > args.budget:
            # one isolated re-run before failing: a shared VM can stall
            # any single run by seconds (the r06 326s lesson)
            retry_t, _ = run_one(spark, spec, str(scaled))
            scaled_t = min(scaled_t, retry_t)
            ratio = scaled_t / base_t if base_t > 0 else float("inf")
            if ratio > args.budget:
                verdict, ok = f"RATIO {ratio:.1f} > {args.budget}", False
        rows.append({
            "query": name,
            "t_sf01": round(base_t, 2),
            "t_scaled": round(scaled_t, 2),
            "ratio": round(ratio, 2),
            "shape_sf01": base_shape,
            "shape_scaled": scaled_shape,
            "verdict": verdict,
        })
        print(f"[scale_stress] {name}: {base_t:.2f}s -> {scaled_t:.2f}s "
              f"({ratio:.1f}x at {args.factor}x data) {verdict}",
              file=sys.stderr, flush=True)

    print(json.dumps({"metric": "scale_stress", "factor": args.factor,
                      "budget": args.budget, "ok": ok, "results": rows},
                     separators=(",", ":")), flush=True)
    if args.report:
        _write_report(Path(args.report), args, rows, ok)
    return 0 if ok else 1


def _write_report(path: Path, args, rows, ok: bool) -> None:
    skew_note = (
        f" with ADVERSARIAL FK SKEW ({SKEW_PCT}% of events.user_id / "
        "orders.o_custkey / lineitem.l_partkey+l_suppkey rows collapsed "
        "onto one whale key each)"
        if getattr(args, "skew", False) else ""
    )
    lines = [
        "# Scale-stress report",
        "",
        f"`tools/scale_stress.py --factor {args.factor}"
        f"{' --skew' if getattr(args, 'skew', False) else ''}` — flagship "
        f"pipelines at sf0.1 vs a {args.factor}x re-keyed copy{skew_note} "
        f"(time budget {args.budget}x; plan must not flip to "
        "CartesianProduct / BroadcastNestedLoopJoin).",
        "",
        "| query | sf0.1 (s) | x" + str(args.factor) +
        " (s) | ratio | plan flips | verdict |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        flips = ", ".join(
            f"{n} {r['shape_sf01'][n]}->{r['shape_scaled'][n]}"
            for n in SHAPE_NODES
            if r["shape_sf01"][n] != r["shape_scaled"][n]
        ) or "none"
        lines.append(
            f"| {r['query']} | {r['t_sf01']} | {r['t_scaled']} | "
            f"{r['ratio']}x | {flips} | {r['verdict']} |"
        )
    lines += [
        "",
        f"**Overall: {'PASS' if ok else 'FAIL'}.**  Join-strategy "
        "count changes (extra Exchange/SortMergeJoin at the larger "
        "scale) are AQE doing its job and are reported, not failed; "
        "only a flip INTO a cartesian/nested-loop shape fails.",
        "",
    ]
    path.write_text("\n".join(lines))


if __name__ == "__main__":
    sys.exit(main())
