"""Brute-force property tests for the round-10 wing (q367-q370):
mergeable histogram quantiles, deterministic HLL register union, the
jitter-aware runtime-regression advisor, and the streaming
restart-storm exactly-once query."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from aquiles_etl_pipeline_spark.relational import registry
from test_round7b_property import _events_dir, _rhalf

T0 = pd.Timestamp("2024-01-01")
CENTS = st.integers(min_value=0, max_value=500000)
W = 2000  # q367 bin width (cents)


# ---------------------------------------------------------------------------
# q367 mergeable histogram quantiles
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(vals=st.lists(CENTS, min_size=1, max_size=50))
def test_q367_sketch_and_exact_match_bruteforce(spark, tmp_path_factory, vals):
    rows = [(i, T0, 0, "view", c / 100.0, None) for i, c in enumerate(vals)]
    sf = _events_dir(tmp_path_factory.mktemp("q367"), rows)
    got = {
        r["q_pct"]: r
        for r in registry()["q367_histogram_quantile_merge"].fn(spark, sf).collect()
    }
    n = len(vals)
    s = sorted(vals)
    hist = Counter(c // W for c in vals)
    cum, acc = {}, 0
    for b in sorted(hist):
        acc += hist[b]
        cum[b] = acc
    for q in (50, 90, 99):
        r = (q * n + 99) // 100
        exact = s[r - 1]
        est_bin = min(b for b in cum if cum[b] >= r)
        row = got[q]
        assert row["n"] == n and row["rank_target"] == r
        assert row["exact_value"] == exact / 100
        assert row["bin_lo"] == est_bin * W / 100
        assert row["bin_hi"] == (est_bin + 1) * W / 100
        # the certificate the query publishes must actually hold
        assert row["in_bin"] is True
        assert est_bin * W <= exact < (est_bin + 1) * W


# ---------------------------------------------------------------------------
# q368 HLL register union
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(users=st.sets(st.integers(min_value=0, max_value=10**6),
                     min_size=1, max_size=300))
def test_q368_hll_matches_python_reference(spark, tmp_path_factory, users):
    rows = [
        (i, T0, u, "view", 1.0, None) for i, u in enumerate(sorted(users))
    ]
    # duplicate every user once — HLL and COUNT(DISTINCT) must both
    # be insensitive to multiplicity
    rows += [
        (len(rows) + i, T0, u, "click", 1.0, None)
        for i, u in enumerate(sorted(users))
    ]
    sf = _events_dir(tmp_path_factory.mktemp("q368"), rows)
    got = registry()["q368_hll_register_union"].fn(spark, sf).collect()[0]

    regs = defaultdict(int)
    for u in users:
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16)
        idx, rest = h // (1 << 26), h % (1 << 26)
        rho = 27 if rest == 0 else 27 - rest.bit_length()
        regs[idx] = max(regs[idx], rho)
    s_scaled = sum(1 << (27 - regs.get(i, 0)) for i in range(64))
    v_empty = sum(1 for i in range(64) if regs.get(i, 0) == 0)
    raw = 0.709 * 64 * 64 * 134217728.0 / s_scaled
    est = 64.0 * math.log(64.0 / v_empty) if (raw <= 160.0 and v_empty > 0) else raw

    assert got["n_exact"] == len(users)
    assert got["v_empty"] == v_empty
    assert got["s_scaled"] == s_scaled
    assert got["hll_estimate"] == pytest.approx(_rhalf(est * 1e6) / 1e6, abs=2e-6)
    # the sketch must actually be a useful estimator (HLL with m=64:
    # ~13% standard error; 4 sigma + small-n slack as the sanity band)
    assert abs(got["hll_estimate"] - len(users)) <= max(0.55 * len(users), 16)


# ---------------------------------------------------------------------------
# q369 runtime-regression advisor
# ---------------------------------------------------------------------------

def _lower_median(xs: list[int]) -> int:
    ss = sorted(xs)
    return ss[(len(ss) + 1) // 2 - 1]


@settings(max_examples=5, deadline=None)
@given(
    days=st.lists(st.integers(min_value=0, max_value=30000),
                  min_size=1, max_size=25)
)
def test_q369_advisor_matches_bruteforce(spark, tmp_path_factory, days):
    rows = [
        (i, T0 + pd.Timedelta(days=i), 0, "view", c / 100.0, None)
        for i, c in enumerate(days)
    ]
    sf = _events_dir(tmp_path_factory.mktemp("q369"), rows)
    got = registry()["q369_runtime_regression_advisor"].fn(spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    base, curr = days[:14], days[14:]
    base_med = _lower_median(base)
    mad = _lower_median([abs(x - base_med) for x in base])
    assert r["n_base_days"] == len(base)
    assert r["n_curr_days"] == len(curr)
    assert r["base_median"] == base_med / 100
    assert r["mad"] == mad / 100
    if curr:
        curr_med = _lower_median(curr)
        assert r["curr_median"] == curr_med / 100
        want_flag = curr_med > base_med + max(3 * mad, base_med // 10)
        assert r["flagged"] is want_flag
        if base_med > 0:
            assert r["ratio"] == pytest.approx(
                _rhalf(curr_med / base_med * 1e6) / 1e6, abs=2e-6
            )
        else:
            assert r["ratio"] is None
    else:
        assert r["curr_median"] is None
        assert r["flagged"] is False
        assert r["ratio"] is None


# ---------------------------------------------------------------------------
# q370 streaming restart storm
# ---------------------------------------------------------------------------

@settings(max_examples=3, deadline=None)
@given(
    events=st.lists(
        st.tuples(st.sampled_from(["view", "click", "purchase"]), CENTS),
        min_size=1, max_size=30,
    )
)
@pytest.mark.slow
def test_q370_restart_storm_equals_batch(spark, tmp_path_factory, events):
    rows = [
        (i, T0, 0, et, c / 100.0, None) for i, (et, c) in enumerate(events)
    ]
    sf = _events_dir(tmp_path_factory.mktemp("q370"), rows)
    got = {
        r["event_type"]: (r["n_events"], r["total_value"])
        for r in registry()["q370_stream_restart_redelivery"].fn(spark, sf).collect()
    }
    cents: dict[str, int] = Counter()
    n: dict[str, int] = Counter()
    for et, c in events:
        cents[et] += c
        n[et] += 1
    want = {et: (n[et], cents[et] / 100) for et in n}
    assert got == want


def test_q370_empty_events_returns_empty(spark, tmp_path_factory):
    """Zero events: no batch ever merges, the facts table is never
    created, and the readback must be empty like the SQL oracle —
    not FileNotFoundError (the q361 lesson, baked in from day one)."""
    tmp = tmp_path_factory.mktemp("q370empty")
    d = tmp / "sf"
    d.mkdir()
    pd.DataFrame(
        {
            "event_id": pd.Series(dtype="int64"),
            "ts": pd.Series(dtype="datetime64[us]"),
            "user_id": pd.Series(dtype="int64"),
            "event_type": pd.Series(dtype="string"),
            "value": pd.Series(dtype="float64"),
            "props": pd.Series(dtype="string"),
        }
    ).to_parquet(d / "events.parquet", index=False)
    got = registry()["q370_stream_restart_redelivery"].fn(spark, str(d)).collect()
    assert got == []


# ---------------------------------------------------------------------------
# q371 count-min heavy hitters
# ---------------------------------------------------------------------------

WORD10 = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"])


@settings(max_examples=5, deadline=None)
@given(
    docs=st.lists(st.lists(WORD10, min_size=1, max_size=10),
                  min_size=1, max_size=15)
)
def test_q371_cms_matches_python_reference(spark, tmp_path_factory, docs):
    from test_round7b_property import _docs_dir

    rows = [
        (i, " ".join(ws), "en", "w", len(" ".join(ws)))
        for i, ws in enumerate(docs)
    ]
    sf = _docs_dir(tmp_path_factory.mktemp("q371"), rows)
    got = {
        r["token"]: r
        for r in registry()["q371_countmin_heavy_hitters"].fn(spark, sf).collect()
    }
    cf = Counter(w for ws in docs for w in ws)
    cells: dict[tuple[int, int], int] = Counter()
    buckets = {}
    for tok, c in cf.items():
        b0 = int(hashlib.md5(f"r0:{tok}".encode()).hexdigest()[:8], 16) % 256
        b1 = int(hashlib.md5(f"r1:{tok}".encode()).hexdigest()[:8], 16) % 256
        buckets[tok] = (b0, b1)
        cells[(0, b0)] += c
        cells[(1, b1)] += c
    top = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert set(got) == {t for t, _ in top}
    for tok, c in top:
        b0, b1 = buckets[tok]
        est = min(cells[(0, b0)], cells[(1, b1)])
        r = got[tok]
        assert r["exact_count"] == c
        assert r["cms_estimate"] == est
        assert r["overestimate"] == est - c
        assert r["never_undercounts"] is True
        assert r["n_tokens"] == sum(cf.values())
