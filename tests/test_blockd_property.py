"""Brute-force property tests for block-D rotation carriers
(q129/q131/q135/q136/q139/q140/q142) — the r09 verdict's ask #5
cadence: give the oldest driver-graded stats carriers independent
Python references BEFORE their r11 driver re-grade, since this class
(float closed forms, rank midpoints, interpolated quantiles) is where
hypothesis found q293's half-boundary edge."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import Decimal

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from aquiles_etl_pipeline_spark.relational import registry
from test_round7b_property import _rhalf
from test_stats_property import (
    _customer_dir,
    _events_dir,
    _lineitem_dir,
    _orders_dir,
)

T0 = pd.Timestamp("1996-01-01")


def _rp(x: float, d: int) -> float:
    p = float(10**d)
    return _rhalf(x * p) / p


# ---------------------------------------------------------------------------
# q129 equi-width price histogram
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    cents=st.lists(
        st.integers(min_value=0, max_value=12_000_000),  # up to $120k
        min_size=1,
        max_size=40,
    )
)
def test_q129_bins_match_bruteforce(spark, tmp_path_factory, cents):
    orders = [
        (i + 1, 1, "O", c / 100.0, T0, "1-URGENT") for i, c in enumerate(cents)
    ]
    sf = _orders_dir(tmp_path_factory.mktemp("hist"), orders)
    got = {
        r["bin"]: r
        for r in registry()["q129_price_histogram"].fn(spark, sf).collect()
    }
    bins = defaultdict(list)
    for c in cents:
        bins[math.floor((c / 100.0) / 25000.0)].append(c)
    assert set(got) == set(bins)
    for b, cs in bins.items():
        row = got[b]
        assert row["bin_lo"] == float(b) * 25000.0
        assert row["n_rows"] == len(cs)
        assert row["sum_value"] == float(Decimal(sum(cs)) / 100)


# ---------------------------------------------------------------------------
# q131 robust median/MAD anomaly gate
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["click", "view"]),
            st.integers(min_value=-100, max_value=100),  # value in quarters
        ),
        min_size=1,
        max_size=40,
    )
)
def test_q131_median_mad_match_bruteforce(spark, tmp_path_factory, rows):
    ev = [
        (i + 1, T0, 1, et, q / 4.0, "{}") for i, (et, q) in enumerate(rows)
    ]
    sf = _events_dir(tmp_path_factory.mktemp("mad"), ev)
    got = {
        r["event_type"]: r
        for r in registry()["q131_robust_value_anomalies"].fn(spark, sf).collect()
    }

    def med(xs):
        xs = sorted(xs)
        n = len(xs)
        return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2

    for et in {e for e, _ in rows}:
        vals = [q / 4.0 for e, q in rows if e == et]
        m = med(vals)
        d = med([abs(v - m) for v in vals])
        row = got[et]
        assert row["n_rows"] == len(vals)
        assert row["med"] == m
        assert row["mad"] == d
        assert row["n_anomalies"] == sum(1 for v in vals if abs(v - m) > 3.0 * d)


# ---------------------------------------------------------------------------
# q135 order-count distribution (TPC-H Q13 shape)
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    ckeys=st.sets(st.integers(min_value=1, max_value=12), min_size=1, max_size=12),
    ocust=st.lists(st.integers(min_value=1, max_value=12), min_size=0, max_size=40),
)
def test_q135_distribution_matches_bruteforce(
    spark, tmp_path_factory, ckeys, ocust
):
    t = tmp_path_factory.mktemp("q13")
    sf = _customer_dir(t, [(k, f"c#{k}", 1, 0.0, "BUILDING") for k in sorted(ckeys)])
    _orders_dir(t, [
        (i + 1, ck, "O", 100.0, T0, "1-URGENT") for i, ck in enumerate(ocust)
    ])
    got = {
        r["c_count"]: r["custdist"]
        for r in registry()["q135_order_count_distribution"].fn(spark, sf).collect()
    }
    per_cust = Counter(ck for ck in ocust if ck in ckeys)
    want = Counter(per_cust.get(k, 0) for k in ckeys)
    assert got == dict(want)


# ---------------------------------------------------------------------------
# q136 equi-depth (quartile) buckets
# ---------------------------------------------------------------------------

def _interp_quantile(xs, p):
    """Linear-interpolation quantile — percentile/quantile_cont."""
    xs = sorted(xs)
    h = p * (len(xs) - 1)
    i = math.floor(h)
    frac = h - i
    if i + 1 < len(xs):
        return xs[i] + frac * (xs[i + 1] - xs[i])
    return xs[i]


@settings(max_examples=5, deadline=None)
@given(
    cents=st.lists(
        st.integers(min_value=0, max_value=2_000_000),
        min_size=1,
        max_size=40,
    )
)
def test_q136_quartile_buckets_match_bruteforce(spark, tmp_path_factory, cents):
    orders = [
        (i + 1, 1, "O", c / 100.0, T0, "1-URGENT") for i, c in enumerate(cents)
    ]
    sf = _orders_dir(tmp_path_factory.mktemp("eqd"), orders)
    got = {
        r["bucket"]: r
        for r in registry()["q136_equi_depth_buckets"].fn(spark, sf).collect()
    }
    vals = [c / 100.0 for c in cents]
    q1, q2, q3 = (_interp_quantile(vals, p) for p in (0.25, 0.5, 0.75))
    want = defaultdict(list)
    for c in cents:
        v = c / 100.0
        b = 0 if v <= q1 else 1 if v <= q2 else 2 if v <= q3 else 3
        want[b].append(c)
    assert set(got) == set(want)
    for b, cs in want.items():
        assert got[b]["n_orders"] == len(cs)
        assert got[b]["sum_value"] == float(Decimal(sum(cs)) / 100)


# ---------------------------------------------------------------------------
# q139 OLS sufficient statistics
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "N"]),  # returnflag
            st.integers(min_value=1, max_value=50),  # quantity
            st.integers(min_value=100, max_value=1_000_000),  # price cents
        ),
        min_size=1,
        max_size=40,
    )
)
def test_q139_ols_matches_bruteforce(spark, tmp_path_factory, rows):
    li = [
        (i + 1, 1, 1, 1, float(q), c / 100.0, 0.0, 0.0, rf, "O", T0)
        for i, (rf, q, c) in enumerate(rows)
    ]
    sf = _lineitem_dir(tmp_path_factory.mktemp("ols"), li)
    got = {
        r["l_returnflag"]: r
        for r in registry()["q139_price_quantity_regression"].fn(spark, sf).collect()
    }
    for rf in {r for r, _, _ in rows}:
        pts = [(q, c) for f, q, c in rows if f == rf]
        n = float(len(pts))
        # decimal-exact sums cast to double, exactly as both engines do
        sx = float(Decimal(sum(q for q, _ in pts)))
        sy = float(Decimal(sum(c for _, c in pts)) / 100)
        sxx = float(Decimal(sum(q * q for q, _ in pts)))
        syy = float(Decimal(sum(c * c for _, c in pts)) / 10000)
        sxy = float(Decimal(sum(q * c for q, c in pts)) / 100)
        row = got[rf]
        assert row["n"] == len(pts)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        if vx > 0:
            slope = (n * sxy - sx * sy) / vx
            assert row["slope"] == _rp(slope, 6)
            assert row["intercept"] == _rp((sy - slope * sx) / n, 6)
        else:
            assert row["slope"] is None
            assert row["intercept"] is None
        if vx * vy > 0:
            r2 = ((n * sxy - sx * sy) ** 2) / (vx * vy)
            assert row["r2"] == _rp(r2, 6)
        else:
            assert row["r2"] is None


# ---------------------------------------------------------------------------
# q140 chi-square contingency cells
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["click", "view", "error"]),
            st.integers(min_value=0, max_value=5),  # hour
        ),
        min_size=1,
        max_size=40,
    )
)
def test_q140_chi2_cells_match_bruteforce(spark, tmp_path_factory, rows):
    ev = [
        (i + 1, T0 + pd.Timedelta(hours=h), 1, et, 1.0, "{}")
        for i, (et, h) in enumerate(rows)
    ]
    sf = _events_dir(tmp_path_factory.mktemp("chi"), ev)
    got = {
        (r["event_type"], r["hr"]): r
        for r in registry()["q140_chi_square_contingency"].fn(spark, sf).collect()
    }
    cells = Counter(rows)
    row_t = Counter(et for et, _ in rows)
    col_t = Counter(h for _, h in rows)
    n = float(len(rows))
    assert set(got) == set(cells)
    for (et, h), obs in cells.items():
        exp = float(row_t[et]) * float(col_t[h]) / n
        row = got[(et, h)]
        assert row["observed"] == obs
        assert row["expected"] == _rp(exp, 6)
        assert row["chi2_contrib"] == _rp((obs - exp) ** 2 / exp, 6)


# ---------------------------------------------------------------------------
# q142 Spearman rank correlation
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "N"]),
            st.integers(min_value=1, max_value=10),  # quantity (ties likely)
            st.integers(min_value=1, max_value=10),  # price dollars (ties)
        ),
        min_size=1,
        max_size=30,
    )
)
def test_q142_spearman_matches_bruteforce(spark, tmp_path_factory, rows):
    li = [
        (i + 1, 1, 1, 1, float(q), float(p), 0.0, 0.0, rf, "O", T0)
        for i, (rf, q, p) in enumerate(rows)
    ]
    sf = _lineitem_dir(tmp_path_factory.mktemp("sp"), li)
    got = {
        r["l_returnflag"]: r
        for r in registry()["q142_spearman_rank_correlation"].fn(spark, sf).collect()
    }

    def midranks(vals):
        out = []
        for v in vals:
            less = sum(1 for u in vals if u < v)
            ties = sum(1 for u in vals if u == v)
            out.append(less + 1 + (ties - 1) / 2.0)
        return out

    for rf in {r for r, _, _ in rows}:
        pts = [(q, p) for f, q, p in rows if f == rf]
        rx = midranks([q for q, _ in pts])
        ry = midranks([p for _, p in pts])
        n = float(len(pts))
        # ranks are exact halves: Decimal(scale 1) sums mirror exactly
        d = lambda x: Decimal(x).quantize(Decimal("0.1"))
        sx = float(sum(d(v) for v in rx))
        sy = float(sum(d(v) for v in ry))
        sxx = float(sum(d(a) * d(a) for a in rx))
        syy = float(sum(d(a) * d(a) for a in ry))
        sxy = float(sum(d(a) * d(b) for a, b in zip(rx, ry)))
        row = got[rf]
        assert row["n"] == len(pts)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        if vx * vy > 0:
            rho = (n * sxy - sx * sy) / math.sqrt(vx * vy)
            assert row["spearman_rho"] == _rp(rho, 6)
        else:
            assert row["spearman_rho"] is None


# ---------------------------------------------------------------------------
# q58 vocab coverage
# ---------------------------------------------------------------------------

_WORDS_D = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=6
)


@settings(max_examples=4, deadline=None)
@given(rows=st.lists(_WORDS_D, min_size=1, max_size=16))
def test_q58_vocab_coverage_matches_bruteforce(spark, tmp_path_factory, rows):
    from test_round7b_property import _docs_dir

    docs = [
        (i, " ".join(ws), "en", "web", len(" ".join(ws)))
        for i, ws in enumerate(rows)
    ]
    sf = _docs_dir(tmp_path_factory.mktemp("vc"), docs)
    got = [
        (r["token"], r["tf"], r["df"], r["rank"], r["cum_coverage"])
        for r in sorted(
            registry()["q58_vocab_coverage"].fn(spark, sf).collect(),
            key=lambda r: r["rank"],
        )
    ]
    tf = Counter(t for ws in rows for t in ws)
    df = Counter()
    for ws in rows:
        for t in set(ws):
            df[t] += 1
    total = float(sum(tf.values()))
    order = sorted(tf, key=lambda t: (-tf[t], t))[:100]
    want, cum = [], 0
    for rank, t in enumerate(order, start=1):
        cum += tf[t]
        want.append((t, tf[t], df[t], rank, _rp(cum / total, 6)))
    assert got == want


# ---------------------------------------------------------------------------
# q59 unigram perplexity
# ---------------------------------------------------------------------------

@settings(max_examples=4, deadline=None)
@given(rows=st.lists(_WORDS_D, min_size=1, max_size=12))
def test_q59_perplexity_matches_bruteforce(spark, tmp_path_factory, rows):
    from test_round7b_property import _docs_dir

    docs = [
        (i, " ".join(ws), "en", "web", len(" ".join(ws)))
        for i, ws in enumerate(rows)
    ]
    sf = _docs_dir(tmp_path_factory.mktemp("ppl"), docs)
    got = {
        r["doc_id"]: r
        for r in registry()["q59_unigram_perplexity"].fn(spark, sf).collect()
    }
    tf = Counter(t for ws in rows for t in ws)
    t = float(sum(tf.values()))
    for i, ws in enumerate(rows):
        s = sum(math.log(tf[w] / t) for w in ws)
        row = got[i]
        assert row["n_tokens"] == len(ws)
        assert row["neg_avg_logprob"] == _rp(-s / len(ws), 6)
        assert row["perplexity"] == _rp(math.exp(-s / len(ws)), 4)


# ---------------------------------------------------------------------------
# q116 activity islands
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),  # user_id
            st.integers(min_value=0, max_value=20),  # day offset
        ),
        min_size=1,
        max_size=40,
    )
)
def test_q116_islands_match_bruteforce(spark, tmp_path_factory, rows):
    ev = [
        (i + 1, T0 + pd.Timedelta(days=d, hours=3), u, "click", 1.0, "{}")
        for i, (u, d) in enumerate(rows)
    ]
    sf = _events_dir(tmp_path_factory.mktemp("isl"), ev)
    got = {
        r["user_id"]: r
        for r in registry()["q116_activity_islands"].fn(spark, sf).collect()
    }
    byu = defaultdict(set)
    for u, d in rows:
        byu[u].add(d)
    assert set(got) == set(byu)
    for u, days in byu.items():
        ds = sorted(days)
        streaks, cur = [], 1
        for a, b in zip(ds, ds[1:]):
            if b == a + 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        row = got[u]
        assert row["n_active_days"] == len(ds)
        assert row["n_islands"] == len(streaks)
        assert row["longest_streak"] == max(streaks)


# ---------------------------------------------------------------------------
# q113 pareto frontier
# ---------------------------------------------------------------------------

def _part_dir2(d, rows):
    import numpy as np

    pdf = pd.DataFrame(
        rows, columns=["p_partkey", "p_name", "p_brand", "p_type",
                       "p_size", "p_retailprice"],
    )
    pdf["p_partkey"] = pdf["p_partkey"].astype("int64")
    pdf["p_size"] = pdf["p_size"].astype(np.int32)
    pdf["p_retailprice"] = pdf["p_retailprice"].astype("float64")
    pdf.to_parquet(f"{d}/part.parquet", index=False)
    return d


@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),  # price dollars
            st.integers(min_value=1, max_value=8),  # size
        ),
        min_size=1,
        max_size=30,
    )
)
def test_q113_skyline_matches_bruteforce(spark, tmp_path_factory, rows):
    t = tmp_path_factory.mktemp("sky") / "sf"
    t.mkdir()
    parts = [
        (i + 1, f"part#{i}", "B1", "T1", sz, float(pr))
        for i, (pr, sz) in enumerate(rows)
    ]
    sf = str(_part_dir2(t, parts))
    got = {
        (r["price"], r["size"]): r["n_parts"]
        for r in registry()["q113_pareto_frontier_parts"].fn(spark, sf).collect()
    }
    pts = {(float(pr), sz) for pr, sz in rows}
    sky = {
        (p, s)
        for p, s in pts
        if not any(
            bp <= p and bs >= s and (bp < p or bs > s) for bp, bs in pts
        )
    }
    cnt = Counter((float(pr), sz) for pr, sz in rows)
    assert got == {k: cnt[k] for k in sky}


# ---------------------------------------------------------------------------
# q115 CDC last-write-wins
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),  # user_id
            st.integers(min_value=0, max_value=100),  # hour offset
            st.sampled_from(["click", "view"]),
            st.integers(min_value=0, max_value=40),  # value quarters
        ),
        min_size=1,
        max_size=40,
    )
)
def test_q115_lww_matches_bruteforce(spark, tmp_path_factory, rows):
    ev = [
        (i + 1, T0 + pd.Timedelta(hours=h), u, et, q / 4.0, "{}")
        for i, (u, h, et, q) in enumerate(rows)
    ]
    sf = _events_dir(tmp_path_factory.mktemp("lww"), ev)
    got = {
        r["user_id"]: r
        for r in registry()["q115_cdc_latest_events"].fn(spark, sf).collect()
    }
    byu = defaultdict(list)
    for i, (u, h, et, q) in enumerate(rows):
        byu[u].append((T0 + pd.Timedelta(hours=h), i + 1, et, q / 4.0))
    assert set(got) == set(byu)
    for u, evs in byu.items():
        ts, eid, et, val = max(evs)
        row = got[u]
        assert row["n_events"] == len(evs)
        assert row["last_ts"] == ts.strftime("%Y-%m-%d %H:%M:%S.%f")
        assert row["last_event_type"] == et
        assert row["last_value"] == val


# ---------------------------------------------------------------------------
# q123 correlated scalar subquery (TPC-H Q17 shape)
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),  # partkey
            st.integers(min_value=1, max_value=50),  # quantity (int-exact)
            st.integers(min_value=100, max_value=100_000),  # price cents
        ),
        min_size=1,
        max_size=40,
    )
)
def test_q123_q17_matches_bruteforce(spark, tmp_path_factory, rows):
    li = [
        (i + 1, pk, 1, 1, float(q), c / 100.0, 0.0, 0.0, "N", "O", T0)
        for i, (pk, q, c) in enumerate(rows)
    ]
    sf = _lineitem_dir(tmp_path_factory.mktemp("q17"), li)
    # q123 goes through register_views (the SQL front door), which
    # needs every table present — link the tiny real ones in
    import os

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "events", "documents", "embeddings"):
        dst = f"{sf}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"/root/testdata/sf0.001/{t}.parquet", dst)
    row = registry()["q123_small_quantity_revenue"].fn(spark, sf).collect()[0]
    qty = defaultdict(list)
    for pk, q, _ in rows:
        qty[pk].append(q)
    kept = [
        (q, c)
        for pk, q, c in rows
        if q < 0.2 * (sum(qty[pk]) / len(qty[pk]))
    ]
    assert row["n_items"] == len(kept)
    if kept:
        assert row["avg_yearly"] == float(
            Decimal(sum(c for _, c in kept)) / 100
        ) / 7.0
    else:
        assert row["avg_yearly"] is None
