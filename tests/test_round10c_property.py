"""Brute-force property tests for the round-10 third wing
(q378-q383): join-size estimator, order-amount reconciliation,
repeated-order audit, MCC, Cochran-Armitage trend, binary-segmentation
changepoint."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from aquiles_etl_pipeline_spark.relational import registry
from test_round7b_property import _docs_dir, _rhalf
from test_stats_property import _customer_dir, _lineitem_dir, _orders_dir

T0 = pd.Timestamp("1996-01-01")


def _rp(x: float, d: int) -> float:
    """Python mirror of numerics.pround: one round-half-away-from-zero
    to integer 10^d units on the same double, then an exact divide."""
    p = float(10**d)
    return _rhalf(x * p) / p


def _star_dir(tmpdir, orders, customer, lineitem, part, supplier):
    """All five star tables in ONE sf dir (q378 loads each)."""
    d = _orders_dir(tmpdir, orders)
    _customer_dir(tmpdir, customer)
    _lineitem_dir(tmpdir, lineitem)
    pd.DataFrame(
        {"p_partkey": pd.Series(part, dtype="int64"),
         "p_name": [f"part#{k}" for k in part]}
    ).to_parquet(f"{d}/part.parquet", index=False)
    pd.DataFrame(
        {"s_suppkey": pd.Series(supplier, dtype="int64"),
         "s_name": [f"supp#{k}" for k in supplier]}
    ).to_parquet(f"{d}/supplier.parquet", index=False)
    return d


# ---------------------------------------------------------------------------
# q378 join-size estimator
# ---------------------------------------------------------------------------

@settings(max_examples=4, deadline=None)
@given(
    ocust=st.lists(st.integers(min_value=1, max_value=8), min_size=1, max_size=25),
    ckeys=st.sets(st.integers(min_value=1, max_value=8), min_size=1, max_size=8),
    li=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10),  # orderkey
            st.integers(min_value=1, max_value=6),  # partkey
            st.integers(min_value=1, max_value=4),  # suppkey
        ),
        min_size=1,
        max_size=30,
    ),
    pkeys=st.sets(st.integers(min_value=1, max_value=6), min_size=1, max_size=6),
    skeys=st.sets(st.integers(min_value=1, max_value=4), min_size=1, max_size=4),
)
def test_q378_matches_bruteforce_histogram_product(
    spark, tmp_path_factory, ocust, ckeys, li, pkeys, skeys
):
    orders = [
        (i + 1, ck, "O", 100.0, T0, "1-URGENT") for i, ck in enumerate(ocust)
    ]
    lineitem = [
        (ok, pk, sk, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", T0)
        for ok, pk, sk in li
    ]
    sf = _star_dir(
        tmp_path_factory.mktemp("jse"),
        orders,
        [(k, f"c#{k}", 1, 0.0, "BUILDING") for k in sorted(ckeys)],
        lineitem,
        sorted(pkeys),
        sorted(skeys),
    )
    got = {
        r["join_name"]: r
        for r in registry()["q378_join_size_estimator"].fn(spark, sf).collect()
    }

    def bf(fact_keys, dim_keys):
        fc, dc = Counter(fact_keys), Counter(dim_keys)
        hit = [k for k in fc if k in dc]
        est = sum(fc[k] * dc[k] for k in hit) if hit else None
        mx = max(fc[k] for k in hit) if hit else None
        return len(fact_keys), len(dim_keys), est, mx

    want = {
        "orders_customer": bf(ocust, ckeys),
        "lineitem_orders": bf([t[0] for t in li], [o[0] for o in orders]),
        "lineitem_part": bf([t[1] for t in li], pkeys),
        "lineitem_supplier": bf([t[2] for t in li], skeys),
    }
    assert set(got) == set(want)
    for name, (fr, dr, est, mx) in want.items():
        row = got[name]
        assert row["fact_rows"] == fr, name
        assert row["dim_rows"] == dr, name
        assert row["est_join_rows"] == est, name
        assert row["max_key_rows"] == mx, name
        assert row["hot_key"] == (None if mx is None else mx * 20 > fr), name
        assert row["strategy"] == "broadcast", name  # dims are tiny here


# ---------------------------------------------------------------------------
# q379 order-amount reconciliation
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    heads=st.lists(
        st.integers(min_value=1, max_value=200_000),  # header cents
        min_size=1,
        max_size=20,
    ),
    lines=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=25),  # orderkey (may dangle)
            st.integers(min_value=1, max_value=100_000),  # line cents
        ),
        min_size=0,
        max_size=40,
    ),
)
def test_q379_buckets_match_bruteforce(spark, tmp_path_factory, heads, lines):
    # discount = tax = 0 and exact-cent prices: every per-line round is
    # exact, so the Python reference needs no float rounding model
    orders = [
        (i + 1, 1, "O", c / 100.0, T0, "1-URGENT") for i, c in enumerate(heads)
    ]
    li = [
        (ok, 1, 1, 1, 1.0, c / 100.0, 0.0, 0.0, "N", "O", T0)
        for ok, c in lines
    ]
    t = tmp_path_factory.mktemp("rec")
    sf = _orders_dir(t, orders)
    _lineitem_dir(t, li)
    row = (
        registry()["q379_order_amount_reconciliation"].fn(spark, sf).collect()[0]
    )
    line_c = defaultdict(int)
    for ok, c in lines:
        line_c[ok] += c
    n_missing = n_exact = n_within = n_over = n_under = gap = 0
    for i, head in enumerate(heads):
        ok = i + 1
        if ok not in line_c:
            n_missing += 1
            continue
        lc = line_c[ok]
        if lc == head:
            n_exact += 1
        elif abs(lc - head) * 100 <= head:
            n_within += 1
        if lc > head:
            n_over += 1
        elif lc < head:
            n_under += 1
        gap += abs(lc - head)
    assert row["n_orders"] == len(heads)
    assert row["n_missing_lines"] == n_missing
    assert row["n_exact"] == n_exact
    assert row["n_within_1pct"] == n_within
    assert row["n_over"] == n_over
    assert row["n_under"] == n_under
    assert row["total_abs_gap"] == float(gap) / 100


# ---------------------------------------------------------------------------
# q380 repeated-order audit
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),  # custkey
            st.integers(min_value=0, max_value=3),  # band index
            st.integers(min_value=0, max_value=99_999),  # cents within band
            st.integers(min_value=0, max_value=30),  # day offset
        ),
        min_size=1,
        max_size=40,
    )
)
def test_q380_groups_match_bruteforce(spark, tmp_path_factory, rows):
    orders = [
        (i + 1, ck, "O", (b * 100_000 + c) / 100.0,
         T0 + pd.Timedelta(days=d), "1-URGENT")
        for i, (ck, b, c, d) in enumerate(rows)
    ]
    sf = _orders_dir(tmp_path_factory.mktemp("rep"), orders)
    got = registry()["q380_repeated_order_audit"].fn(spark, sf).collect()
    groups = defaultdict(list)
    for ck, b, c, d in rows:
        groups[(ck, b)].append(d)
    want = []
    for (ck, b), days in groups.items():
        cnt = len(days)
        if cnt < 2:
            continue
        span = max(days) - min(days)
        want.append(
            (ck, float(b * 100_000) / 100, cnt, cnt * (cnt - 1) // 2, span,
             span <= 7)
        )
    want.sort(key=lambda r: (-r[3], r[4], r[0], r[1]))
    want = want[:20]
    assert [
        (r["custkey"], r["band_lo"], r["n_orders"], r["n_pairs"],
         r["day_span"], r["tight_window"])
        for r in got
    ] == want


# ---------------------------------------------------------------------------
# q381 Matthews correlation
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),  # n_chars
            st.sampled_from(["en", "zh", None]),  # lang
        ),
        min_size=1,
        max_size=40,
    )
)
def test_q381_mcc_matches_bruteforce(spark, tmp_path_factory, rows):
    docs = [
        (i, "t" * max(nc, 1), lang, "web", nc)
        for i, (nc, lang) in enumerate(rows)
    ]
    sf = _docs_dir(tmp_path_factory.mktemp("mcc"), docs)
    row = registry()["q381_langid_mcc"].fn(spark, sf).collect()[0]
    tp = sum(1 for nc, lg in rows if nc % 2 == 0 and lg == "en")
    fp = sum(1 for nc, lg in rows if nc % 2 == 0 and lg != "en")
    fn = sum(1 for nc, lg in rows if nc % 2 != 0 and lg == "en")
    tn = sum(1 for nc, lg in rows if nc % 2 != 0 and lg != "en")
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (tp, fp, fn, tn)
    prec = _rp(tp / (tp + fp), 6) if tp + fp > 0 else None
    rec = _rp(tp / (tp + fn), 6) if tp + fn > 0 else None
    f1 = _rp(2 * tp / (2 * tp + fp + fn), 6) if 2 * tp + fp + fn > 0 else None
    den2 = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    mcc = (
        _rp((tp * tn - fp * fn) / math.sqrt(float(den2)), 6)
        if den2 > 0
        else None
    )
    assert row["precision_"] == prec
    assert row["recall_"] == rec
    assert row["f1"] == f1
    assert row["mcc"] == mcc


# ---------------------------------------------------------------------------
# q382 Cochran-Armitage trend
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=11),  # band index (9-capped)
            st.booleans(),  # urgent?
        ),
        min_size=1,
        max_size=40,
    )
)
def test_q382_trend_matches_bruteforce(spark, tmp_path_factory, rows):
    orders = [
        (i + 1, 1, "O", (b * 5_000_000 + 250_000) / 100.0, T0,
         "1-URGENT" if y else "3-MEDIUM")
        for i, (b, y) in enumerate(rows)
    ]
    sf = _orders_dir(tmp_path_factory.mktemp("cat"), orders)
    row = registry()["q382_cochran_armitage_trend"].fn(spark, sf).collect()[0]
    ws = [min(b, 9) for b, _ in rows]
    ys = [1 if y else 0 for _, y in rows]
    n, r = len(rows), sum(ys)
    swr = sum(w * y for w, y in zip(ws, ys))
    sw, sww = sum(ws), sum(w * w for w in ws)
    assert (row["n"], row["r"], row["swr"], row["sw"], row["sww"]) == (
        n, r, swr, sw, sww,
    )
    den = n * sww - sw * sw
    if 0 < r < n and den > 0:
        num = float(n * swr - r * sw)
        chi2 = num * num * n / (float(r) * (n - r) * float(den))
        assert row["chi2_trend"] == _rp(chi2, 6)
        assert row["trend_up"] == (n * swr > r * sw)
    else:
        assert row["chi2_trend"] is None
        assert row["trend_up"] is None


# ---------------------------------------------------------------------------
# q383 binary-segmentation changepoint
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),  # day offset
            st.integers(min_value=1, max_value=100_000),  # cents
        ),
        min_size=1,
        max_size=40,
    )
)
def test_q383_split_matches_bruteforce(spark, tmp_path_factory, rows):
    orders = [
        (i + 1, 1, "O", c / 100.0, T0 + pd.Timedelta(days=d), "1-URGENT")
        for i, (d, c) in enumerate(rows)
    ]
    sf = _orders_dir(tmp_path_factory.mktemp("seg"), orders)
    got = registry()["q383_binseg_changepoint"].fn(spark, sf).collect()
    daily = defaultdict(int)
    for d, c in rows:
        daily[d] += c
    days = sorted(daily)
    nd, st_ = len(days), sum(daily.values())
    if nd < 2:
        assert got == []
        return
    best = None
    cs = 0
    for i, d in enumerate(days[:-1], start=1):
        cs += daily[d]
        gain = (
            float(cs) * float(cs) / i
            + float(st_ - cs) * float(st_ - cs) / (nd - i)
            - float(st_) * float(st_) / nd
        )
        key = (-gain, d)
        if best is None or key < best[0]:
            best = (key, d, i, cs, gain)
    _, d, i, cs, gain = best
    row = got[0]
    assert row["split_day"] == str((T0 + pd.Timedelta(days=d)).date())
    assert row["n_days"] == nd
    assert row["n_days_left"] == i
    assert row["sse_reduction"] == _rp(gain / 10000, 4)
    assert row["mean_left"] == _rp(float(cs) / (100.0 * i), 4)
    assert row["mean_right"] == _rp(float(st_ - cs) / (100.0 * (nd - i)), 4)
