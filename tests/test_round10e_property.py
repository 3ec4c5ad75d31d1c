"""Brute-force property tests for the round-10 fifth wing
(q390-q395): shuffle-partition advisor, Kaplan-Meier, Cramer-von
Mises, CCF lead-lag, covariate-shift ESS, NB margin calibration."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from aquiles_etl_pipeline_spark.relational import registry
from test_round7b_property import _docs_dir, _rhalf
from test_round10d_property import _WORDS, _rp, _toks
from test_stats_property import _events_dir, _lineitem_dir, _orders_dir

T0 = pd.Timestamp("1996-01-01")


# ---------------------------------------------------------------------------
# q390 shuffle-partition advisor
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10),  # orderkey
            st.integers(min_value=1, max_value=5),  # partkey
            st.integers(min_value=1, max_value=3),  # suppkey
        ),
        min_size=1,
        max_size=40,
    )
)
def test_q390_key_census_matches_bruteforce(spark, tmp_path_factory, rows):
    li = [
        (ok, pk, sk, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", T0)
        for ok, pk, sk in rows
    ]
    sf = _lineitem_dir(tmp_path_factory.mktemp("shp"), li)
    got = {
        r["shuffle_key"]: r
        for r in registry()["q390_shuffle_partition_advisor"]
        .fn(spark, sf)
        .collect()
    }
    n = len(rows)
    for name, idx in (("l_orderkey", 0), ("l_partkey", 1), ("l_suppkey", 2)):
        cnt = Counter(r[idx] for r in rows)
        row = got[name]
        assert row["n_rows"] == n
        assert row["n_keys"] == len(cnt)
        assert row["max_key_rows"] == max(cnt.values())
        assert row["max_key_share_pct"] == max(cnt.values()) * 100 / n
        assert row["rec_partitions"] == (n * 88 + 134217728 - 1) // 134217728
        assert row["skew_limited"] == (max(cnt.values()) * 88 > 134217728)


# ---------------------------------------------------------------------------
# q391 Kaplan-Meier
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    users=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=12),  # user_id
            st.integers(min_value=0, max_value=100),  # first-seen day
            st.integers(min_value=0, max_value=100),  # purchase day offset
            st.booleans(),  # purchases at all?
        ),
        min_size=1,
        max_size=24,
        unique_by=lambda u: u[0],
    )
)
def test_q391_km_matches_bruteforce(spark, tmp_path_factory, users):
    rows = []
    eid = 0
    for uid, d0, dp, buys in users:
        eid += 1
        rows.append((eid, T0 + pd.Timedelta(days=d0), uid, "click", 1.0, "{}"))
        if buys:
            eid += 1
            rows.append(
                (eid, T0 + pd.Timedelta(days=d0 + dp), uid, "purchase", 1.0,
                 "{}")
            )
    sf = _events_dir(tmp_path_factory.mktemp("km"), rows)
    got = {
        (r["cohort"], r["horizon"]): r
        for r in registry()["q391_kaplan_meier"].fn(spark, sf).collect()
    }
    # brute force mirroring the query's cohort framing
    hz_day = max(r[1] for r in rows).floor("D")
    subj = []  # (g, ev, t)
    for uid, d0, dp, buys in users:
        t0 = d0
        if buys:
            subj.append((uid % 2, 1, dp))
        else:
            subj.append((uid % 2, 0, (hz_day - T0).days - d0))
    for g in {s[0] for s in subj}:
        gs = [s for s in subj if s[0] == g]
        day_d = Counter()
        day_leave = Counter()
        for _, ev, t in gs:
            day_leave[t] += 1
            if ev:
                day_d[t] += 1
        for h in (7, 30, 60, 90):
            ln_m, dead, d_cum = 0, 0, 0
            for t in sorted(day_d):
                n_at = sum(c for tt, c in day_leave.items() if tt >= t)
                d = day_d[t]
                if t <= h:
                    d_cum += d
                    if d >= n_at:
                        dead += 1
                    else:
                        ln_m += _rhalf(math.log((n_at - d) / n_at) * 1e6)
            row = got[(g, h)]
            assert row["n_events"] == d_cum, (g, h)
            if dead:
                assert row["surv"] == 0.0
                assert row["ln_surv"] is None
            else:
                assert row["ln_surv"] == ln_m / 1e6, (g, h)
                assert row["surv"] == _rp(math.exp(ln_m / 1e6), 6), (g, h)


# ---------------------------------------------------------------------------
# q392 Cramer-von Mises
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),  # cents (few ties)
            st.booleans(),  # hot priority?
        ),
        min_size=1,
        max_size=40,
    )
)
def test_q392_cvm_matches_bruteforce(spark, tmp_path_factory, rows):
    orders = [
        (i + 1, 1, "O", c / 100.0, T0, "1-URGENT" if hot else "3-MEDIUM")
        for i, (c, hot) in enumerate(rows)
    ]
    sf = _orders_dir(tmp_path_factory.mktemp("cvm"), orders)
    row = registry()["q392_cramer_von_mises"].fn(spark, sf).collect()[0]
    vals = sorted({c for c, _ in rows})
    n1 = sum(1 for _, hot in rows if hot)
    n2 = len(rows) - n1
    assert row["n1"] == n1 and row["n2"] == n2
    if n1 == 0 or n2 == 0:
        assert row["t_stat"] is None
        return
    q = 0
    f1 = f2 = 0
    for v in vals:
        c1 = sum(1 for c, hot in rows if c == v and hot)
        c2 = sum(1 for c, hot in rows if c == v and not hot)
        f1 += c1
        f2 += c2
        q += (c1 + c2) * (f1 * n2 - f2 * n1) ** 2
    n = n1 + n2
    t = q / (n1 * n2 * n * n)
    assert row["t_stat"] == _rp(t, 9)


# ---------------------------------------------------------------------------
# q393 CCF lead-lag
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    odays=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),  # order day
            st.integers(min_value=1, max_value=50_000),  # cents
        ),
        min_size=1,
        max_size=30,
    ),
    sdays=st.lists(
        st.integers(min_value=-8, max_value=23),  # ship day (may overhang)
        min_size=1,
        max_size=30,
    ),
)
def test_q393_ccf_matches_bruteforce(spark, tmp_path_factory, odays, sdays):
    orders = [
        (i + 1, 1, "O", c / 100.0, T0 + pd.Timedelta(days=d), "1-URGENT")
        for i, (d, c) in enumerate(odays)
    ]
    li = [
        (i + 1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
         T0 + pd.Timedelta(days=d))
        for i, d in enumerate(sdays)
    ]
    t = tmp_path_factory.mktemp("ccf")
    sf = _orders_dir(t, orders)
    _lineitem_dir(t, li)
    got = {
        r["lag"]: r
        for r in registry()["q393_ccf_lead_lag"].fn(spark, sf).collect()
    }
    rev = defaultdict(int)
    for d, c in odays:
        rev[d] += c
    ship = Counter(sdays)
    for lag in (-7, -3, -1, 0, 1, 3, 7):
        pairs = [
            (rev[d], ship[d + lag]) for d in rev if (d + lag) in ship
        ]
        if not pairs:
            assert lag not in got
            continue
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        row = got[lag]
        assert row["n"] == n
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if n > 1 and vx > 0 and vy > 0:
            r = (n * sxy - sx * sy) / math.sqrt(float(vx) * float(vy))
            assert row["r"] == _rp(r, 6), lag
        else:
            assert row["r"] is None, lag


# ---------------------------------------------------------------------------
# q394 covariate-shift ESS
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["s0", "s1", "s2"]),  # source
            st.sampled_from(["en", "zh", "de", None]),  # lang
        ),
        min_size=1,
        max_size=40,
    )
)
def test_q394_ess_matches_bruteforce(spark, tmp_path_factory, rows):
    docs = [
        (i, "text", lang, src, 4) for i, (src, lang) in enumerate(rows)
    ]
    sf = _docs_dir(tmp_path_factory.mktemp("ess"), docs)
    got = {
        r["source"]: r
        for r in registry()["q394_covariate_shift_ess"].fn(spark, sf).collect()
    }
    lab = [(s, lg) for s, lg in rows if lg is not None]
    if not lab:
        assert got == {}
        return
    nl = Counter(lg for _, lg in lab)
    n, l = len(lab), len(nl)
    wm = {lg: _rhalf(1e6 * n / (l * c)) for lg, c in nl.items()}
    for src in {s for s, _ in lab}:
        cnt = Counter(lg for s, lg in lab if s == src)
        nd = sum(cnt.values())
        sw = sum(c * wm[lg] for lg, c in cnt.items())
        sww = sum(c * wm[lg] ** 2 for lg, c in cnt.items())
        ess = float(sw * sw) / float(sww)
        row = got[src]
        assert row["n_docs"] == nd
        assert row["ess"] == _rp(ess, 4)
        assert row["ess_ratio"] == _rp(ess / nd, 6)
        assert row["reweight_risky"] == (ess / nd < 0.5)


# ---------------------------------------------------------------------------
# q395 NB margin calibration
# ---------------------------------------------------------------------------

@settings(max_examples=4, deadline=None)
@given(
    rows=st.lists(
        st.tuples(_WORDS, st.sampled_from(["en", "zh", None])),
        min_size=1,
        max_size=24,
    )
)
def test_q395_margin_bands_match_bruteforce(spark, tmp_path_factory, rows):
    docs = [
        (i, " ".join(ws), lang, "web", len(" ".join(ws)))
        for i, (ws, lang) in enumerate(rows)
    ]
    sf = _docs_dir(tmp_path_factory.mktemp("cal"), docs)
    got = {
        r["margin_band"]: r
        for r in registry()["q395_nb_margin_calibration"]
        .fn(spark, sf)
        .collect()
    }
    train = [(ws, lg) for i, (ws, lg) in enumerate(rows)
             if i % 2 == 0 and lg is not None]
    test = [(ws, lg) for i, (ws, lg) in enumerate(rows)
            if i % 2 == 1 and lg is not None]
    cls = Counter(lg for _, lg in train)
    n = sum(cls.values())
    tc, tot, vocab = Counter(), Counter(), set()
    for ws, lg in train:
        for t in _toks(" ".join(ws)):
            tc[(lg, t)] += 1
            tot[lg] += 1
            vocab.add(t)
    v = len(vocab)
    bands = Counter()
    correct = Counter()
    if v > 0:
        for ws, lg in test:
            tf = Counter(_toks(" ".join(ws)))
            if not tf:
                continue
            scores = []
            for c, nd in cls.items():
                s = _rhalf(math.log(nd / n) * 1e6)
                for t, m in tf.items():
                    s += m * _rhalf(
                        math.log((tc.get((c, t), 0) + 1) / (tot.get(c, 0) + v))
                        * 1e6
                    )
                scores.append((-s, c))
            scores.sort()
            pred = scores[0][1]
            margin = (
                scores[1][0] - scores[0][0] if len(scores) > 1 else 3000000
            )
            band = (
                "a_lt_0.1" if margin < 100000
                else "b_0.1_0.3" if margin < 300000
                else "c_0.3_1" if margin < 1000000
                else "d_ge_1"
            )
            bands[band] += 1
            if pred == lg:
                correct[band] += 1
    assert set(got) == set(bands)
    for band, cnt in bands.items():
        row = got[band]
        assert row["n_docs"] == cnt
        assert row["n_correct"] == correct[band]
        assert row["accuracy_pct"] == correct[band] * 100 / cnt
