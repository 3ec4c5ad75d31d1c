"""Brute-force property tests for the round-10 second wing
(q372-q377): column-encoding advisor, regression discontinuity,
log-rank test, Neyman allocation, leakage audit, SLO burn rate."""

from __future__ import annotations

import math
from collections import Counter

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

T0 = pd.Timestamp("2024-01-01")


# ---------------------------------------------------------------------------
# q372 column-encoding advisor
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=12),  # orderkey
            st.integers(min_value=1, max_value=4),  # linenumber
            st.sampled_from(["A", "N", "R"]),  # returnflag
            st.sampled_from(["F", "O"]),  # linestatus
            st.integers(min_value=0, max_value=5),  # shipdate day offset
            st.sampled_from([1.0, 2.0, 3.0]),  # quantity
            st.integers(min_value=1, max_value=3),  # suppkey
        ),
        min_size=1,
        max_size=40,
    )
)
def test_q372_census_matches_bruteforce(spark, tmp_path_factory, rows):
    li = [
        (ok, 1, sk, ln, qt, 10.0, 0.0, 0.0, rf, ls, T0 + pd.Timedelta(days=sd))
        for ok, ln, rf, ls, sd, qt, sk in rows
    ]
    sf = _lineitem_dir(tmp_path_factory.mktemp("enc"), li)
    got = {
        r["col_name"]: r
        for r in registry()["q372_column_encoding_advisor"].fn(spark, sf).collect()
    }
    # brute force: single shard (orderkeys <= 12 < 4096), full tiebreak
    # sort — duplicates sort adjacently so lag comparisons are stable
    recs = [
        (ok, ln, T0 + pd.Timedelta(days=sd), qt, sk, rf, ls)
        for ok, ln, rf, ls, sd, qt, sk in rows
    ]
    recs.sort()
    cols = {
        "l_orderkey": [r[0] for r in recs],
        "l_shipdate": [r[2] for r in recs],
        "l_quantity": [r[3] for r in recs],
        "l_suppkey": [r[4] for r in recs],
        "l_returnflag": [r[5] for r in recs],
        "l_linestatus": [r[6] for r in recs],
    }
    n = len(recs)
    for name, vals in cols.items():
        runs = 1 + sum(1 for i in range(1, n) if vals[i] != vals[i - 1])
        asc = sum(1 for i in range(1, n) if vals[i] >= vals[i - 1])
        dis = len(set(vals))
        row = got[name]
        assert row["n_rows"] == n
        assert row["n_distinct"] == dis
        assert row["runs"] == runs, name
        assert row["asc_pairs"] == asc, name
        assert row["pairs"] == n - 1
        if dis * 50 <= n:
            want = "dictionary"
        elif runs * 10 <= n:
            want = "rle"
        elif asc * 20 >= (n - 1) * 19:
            want = "delta"
        else:
            want = "plain"
        assert row["encoding"] == want, name


# ---------------------------------------------------------------------------
# q373 regression discontinuity
# ---------------------------------------------------------------------------

_PRICE_C = st.integers(min_value=10_000_000, max_value=20_000_000)  # cents in band
_PRIO = st.sampled_from(
    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
)


@settings(max_examples=5, deadline=None)
@given(rows=st.lists(st.tuples(_PRICE_C, _PRIO), min_size=1, max_size=50))
def test_q373_fit_matches_closed_form(spark, tmp_path_factory, rows):
    orders = [
        (i, 1, "O", c / 100.0, T0, pr) for i, (c, pr) in enumerate(rows)
    ]
    sf = _orders_dir(tmp_path_factory.mktemp("rdd"), orders)
    got = registry()["q373_regression_discontinuity"].fn(spark, sf).collect()[0]
    sides = {"l": [], "r": []}
    for c, pr in rows:
        x = c - 15_000_000
        y = 1 if pr[0] in "12" else 0
        sides["l" if x < 0 else "r"].append((x, y))
    out = {}
    for s, pts in sides.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        den = float(n) * float(sxx) - float(sx) * float(sx)
        out[s] = (n, sy, den,
                  float(n) * float(sxy) - float(sx) * float(sy),
                  float(sy) * float(sxx) - float(sx) * float(sxy))
    assert got["n_left"] == out["l"][0] and got["n_right"] == out["r"][0]
    for s, (nk, shk, slk, y0k) in (
        ("l", ("n_left", "urgent_share_left", "slope_left_per_k",
               "y_left_at_cutoff")),
        ("r", ("n_right", "urgent_share_right", "slope_right_per_k",
               "y_right_at_cutoff")),
    ):
        n, sy, den, slnum, icnum = out[s]
        if n > 0:
            assert got[shk] == _rhalf(sy / n * 1e6) / 1e6
        else:
            assert got[shk] is None
        if den > 0:
            assert got[slk] == _rhalf(slnum / den * 100000 * 1e8) / 1e8
            assert got[y0k] == _rhalf(icnum / den * 1e6) / 1e6
        else:
            assert got[slk] is None and got[y0k] is None
    if out["l"][2] > 0 and out["r"][2] > 0:
        eff = out["r"][4] / out["r"][2] - out["l"][4] / out["l"][2]
        assert got["rd_effect"] == _rhalf(eff * 1e6) / 1e6
    else:
        assert got["rd_effect"] is None


# ---------------------------------------------------------------------------
# q374 log-rank test
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    users=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),  # user id
            st.integers(min_value=0, max_value=20),  # first-event day
            st.one_of(st.none(), st.integers(min_value=0, max_value=10)),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda u: u[0],
    )
)
def test_q374_logrank_matches_bruteforce(spark, tmp_path_factory, users):
    rows, eid = [], 0
    for uid, d0, dp in users:
        rows.append((eid, T0 + pd.Timedelta(days=d0), uid, "view", 1.0, None))
        eid += 1
        if dp is not None:
            rows.append(
                (eid, T0 + pd.Timedelta(days=d0 + dp), uid, "purchase", 1.0, None)
            )
            eid += 1
    sf = _events_dir(tmp_path_factory.mktemp("lr"), rows)
    got = registry()["q374_logrank_test"].fn(spark, sf).collect()[0]
    horizon = max(
        d0 + dp if dp is not None else d0 for uid, d0, dp in users
    )
    subj = []
    for uid, d0, dp in users:
        g = uid % 2
        if dp is not None:
            subj.append((g, dp, 1))
        else:
            subj.append((g, horizon - d0, 0))
    n1_users = sum(1 for g, _, _ in subj if g == 1)
    deaths1 = sum(1 for g, _, e in subj if g == 1 and e)
    deaths0 = sum(1 for g, _, e in subj if g == 0 and e)
    o1, e1m, vm = 0, 0, 0
    death_days = sorted({t for _, t, e in subj if e})
    for t in death_days:
        d = sum(1 for _, tt, e in subj if e and tt == t)
        d1 = sum(1 for g, tt, e in subj if g == 1 and e and tt == t)
        at = [s for s in subj if s[1] >= t]
        n = len(at)
        n1 = sum(1 for g, _, _ in at if g == 1)
        o1 += d1
        e1m += (d * n1 * 1000000) // n
        if n > 1:
            vm += (d * n1 * (n - n1) * (n - d) * 1000000) // (n * n * (n - 1))
    if not death_days:
        # no deaths: the terms frame is empty, so (engine-symmetrically)
        # the totals degrade to 0/NULL — the q361 degenerate contract
        assert got["n1_users"] == 0 and got["n0_users"] == 0
        assert got["deaths1"] == 0 and got["deaths0"] == 0
        assert got["death_days"] == 0
        assert got["expected1"] is None and got["variance"] is None
        assert got["chi2"] is None
        return
    assert got["n1_users"] == n1_users
    assert got["n0_users"] == len(subj) - n1_users
    assert got["deaths1"] == deaths1 and got["deaths0"] == deaths0
    assert got["death_days"] == len(death_days)
    assert got["expected1"] == e1m / 1e6
    assert got["variance"] == vm / 1e6
    if vm > 0:
        chi2 = ((o1 * 1000000 - e1m) / 1e6) ** 2 / (vm / 1e6)
        assert got["chi2"] == _rhalf(chi2 * 1e6) / 1e6
    else:
        assert got["chi2"] is None


# ---------------------------------------------------------------------------
# q375 Neyman allocation
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["AUTOMOBILE", "BUILDING", "FURNITURE"]),
            st.integers(min_value=-99_400, max_value=999_400),  # cents
        ),
        min_size=1,
        max_size=40,
    )
)
def test_q375_allocation_matches_bruteforce(spark, tmp_path_factory, rows):
    cust = [
        (i, f"c{i}", 0, c / 100.0, seg) for i, (seg, c) in enumerate(rows)
    ]
    sf = _customer_dir(tmp_path_factory.mktemp("ney"), cust)
    got = {
        r["segment"]: r
        for r in registry()["q375_neyman_allocation"].fn(spark, sf).collect()
    }
    strata: dict[str, list[int]] = {}
    for seg, c in rows:
        strata.setdefault(seg, []).append(c)
    wus = {}
    for seg, cs in strata.items():
        n = len(cs)
        sx = sum(cs)
        sxx = sum(c * c for c in cs)
        if n > 1:
            var = max((float(sxx) - float(sx) * float(sx) / n) / (n - 1), 0.0)
            sd = math.sqrt(var)
        else:
            sd = 0.0
        wus[seg] = _rhalf(float(n) * sd)
        assert got[seg]["n_customers"] == n
        assert got[seg]["acctbal_sd"] == _rhalf(sd / 100 * 1e4) / 1e4
        assert got[seg]["weight_units"] == wus[seg]
    wtot = sum(wus.values())
    if wtot > 0:
        base = {s: (w * 1000) // wtot for s, w in wus.items()}
        rem = {s: (w * 1000) % wtot for s, w in wus.items()}
        leftover = 1000 - sum(base.values())
        order = sorted(wus, key=lambda s: (-rem[s], s))
        alloc = {
            s: base[s] + (1 if order.index(s) < leftover else 0) for s in wus
        }
        assert sum(alloc.values()) == 1000
        for s in wus:
            assert got[s]["alloc_n"] == alloc[s]
            assert got[s]["alloc_share"] == _rhalf(wus[s] / wtot * 1e6) / 1e6
    else:
        for s in wus:
            assert got[s]["alloc_n"] == 0
            assert got[s]["alloc_share"] is None


# ---------------------------------------------------------------------------
# q376 leakage audit
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=20),  # custkey
            st.sampled_from(["O", "F", "P"]),  # status
            st.sampled_from(["1-URGENT", "3-MEDIUM", "5-LOW"]),
            st.integers(min_value=1000, max_value=49_000_000),  # cents
            st.integers(min_value=0, max_value=40),  # orderdate day offset
        ),
        min_size=1,
        max_size=50,
    )
)
def test_q376_cramers_v_matches_bruteforce(spark, tmp_path_factory, rows):
    orders = [
        (i, ck, stt, c / 100.0, T0 + pd.Timedelta(days=dd), pr)
        for i, (ck, stt, pr, c, dd) in enumerate(rows)
    ]
    sf = _orders_dir(tmp_path_factory.mktemp("leak"), orders)
    got = {
        r["feature"]: r
        for r in registry()["q376_leakage_audit"].fn(spark, sf).collect()
    }
    feats = {
        "priority": lambda ck, pr, c, dd: pr,
        "order_month": lambda ck, pr, c, dd: "%02d" % (
            (T0 + pd.Timedelta(days=dd)).month
        ),
        "cust_bucket": lambda ck, pr, c, dd: str(ck % 8),
        "price_band": lambda ck, pr, c, dd: str(min(c // 5_000_000, 9)),
    }
    n = len(rows)
    for fname, fv in feats.items():
        cells = Counter(
            (fv(ck, pr, c, dd), stt) for ck, stt, pr, c, dd in rows
        )
        rowt = Counter()
        colt = Counter()
        for (v, lbl), obs in cells.items():
            rowt[v] += obs
            colt[lbl] += obs
        chi2m = 0
        for (v, lbl), obs in cells.items():
            num = (obs * n - rowt[v] * colt[lbl]) ** 2 * 1000000
            chi2m += num // (rowt[v] * colt[lbl] * n)
        r, c_ = len(rowt), len(colt)
        rec = got[fname]
        assert rec["n_rows"] == n
        assert rec["n_levels"] == r and rec["n_labels"] == c_
        assert rec["dof"] == (r - 1) * (c_ - 1)
        assert rec["chi2"] == chi2m / 1e6
        if r > 1 and c_ > 1:
            v_ = math.sqrt(chi2m / (1000000.0 * n * min(r - 1, c_ - 1)))
            assert rec["cramers_v"] == v_
            assert rec["leak_flag"] == (
                chi2m * 4 > 1000000 * n * min(r - 1, c_ - 1)
            )
        else:
            assert rec["cramers_v"] is None and rec["leak_flag"] is False


# ---------------------------------------------------------------------------
# q377 SLO burn rate
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100 * 3600),  # seconds back
            st.sampled_from(["error", "click", "view"]),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_q377_burn_windows_match_bruteforce(spark, tmp_path_factory, rows):
    tmax = T0 + pd.Timedelta(hours=120)
    ev = [
        (i, tmax - pd.Timedelta(seconds=s), i, et, 1.0, None)
        for i, (s, et) in enumerate(rows)
    ]
    sf = _events_dir(tmp_path_factory.mktemp("slo"), ev)
    got = {
        r["window_h"]: r
        for r in registry()["q377_slo_burn_rate"].fn(spark, sf).collect()
    }
    smin = min(s for s, _ in rows)  # the corpus horizon row
    stats = {}
    for h in (1, 6, 24, 72):
        tot = sum(1 for s, _ in rows if s - smin < h * 3600)
        err = sum(
            1 for s, et in rows if s - smin < h * 3600 and et == "error"
        )
        stats[h] = (tot, err)
    for i, h in enumerate((1, 6, 24, 72)):
        tot, err = stats[h]
        rec = got[h]
        assert rec["total_events"] == tot and rec["errors"] == err
        if tot > 0:
            assert rec["err_rate"] == _rhalf(err / tot * 1e6) / 1e6
            assert rec["burn_rate"] == _rhalf(err * 100 / (25 * tot) * 1e6) / 1e6
        else:
            assert rec["err_rate"] is None and rec["burn_rate"] is None
        nxt = (6, 24, 72)[i] if h != 72 else None
        if nxt is not None:
            tn, en = stats[nxt]
            breach = (
                tot > 0
                and err * 100 * 2 > tot * 25 * 2
                and en * 100 * 2 > tn * 25 * 2
            )
        else:
            breach = tot > 0 and err * 100 > tot * 25
        assert rec["breach"] == breach
