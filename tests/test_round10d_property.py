"""Brute-force property tests for the round-10 fourth wing
(q384-q389): NB langid train/eval, WOE/IV screening, zone-map skip
advisor, rollup-MV advisor, Bradley-Terry ranking, permutation
entropy."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from aquiles_etl_pipeline_spark.relational import registry
from test_round7b_property import _docs_dir, _rhalf
from test_stats_property import _lineitem_dir, _orders_dir

T0 = pd.Timestamp("1996-01-01")
JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _rp(x: float, d: int) -> float:
    p = float(10**d)
    return _rhalf(x * p) / p


def _toks(text):
    if text is None:
        return []
    return [t for t in JAVA_WS.split(text.strip(" ").lower()) if t]


# ---------------------------------------------------------------------------
# q384 Naive Bayes langid
# ---------------------------------------------------------------------------

_WORDS = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=0, max_size=6
)


@settings(max_examples=4, deadline=None)
@given(
    rows=st.lists(
        st.tuples(_WORDS, st.sampled_from(["en", "zh", None])),
        min_size=1,
        max_size=24,
    )
)
def test_q384_confusion_matches_bruteforce(spark, tmp_path_factory, rows):
    docs = [
        (i, " ".join(ws), lang, "web", len(" ".join(ws)))
        for i, (ws, lang) in enumerate(rows)
    ]
    sf = _docs_dir(tmp_path_factory.mktemp("nb"), docs)
    got = sorted(
        (r["true_lang"], r["pred_lang"], r["n_docs"])
        for r in registry()["q384_nb_lang_classifier"].fn(spark, sf).collect()
    )
    train = [(i, ws, lg) for i, (ws, lg) in enumerate(rows)
             if i % 2 == 0 and lg is not None]
    test = [(i, ws, lg) for i, (ws, lg) in enumerate(rows)
            if i % 2 == 1 and lg is not None]
    cls = Counter(lg for _, _, lg in train)
    n = sum(cls.values())
    tc = Counter()
    tot = Counter()
    vocab = set()
    for _, ws, lg in train:
        for t in _toks(" ".join(ws)):
            tc[(lg, t)] += 1
            tot[lg] += 1
            vocab.add(t)
    v = len(vocab)
    want = Counter()
    if v > 0:
        for _, ws, lg in test:
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
            pred = min(scores)[1]
            want[(lg, pred)] += 1
    assert got == sorted((t, p, c) for (t, p), c in want.items())


# ---------------------------------------------------------------------------
# q385 WOE / IV screening
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),  # custkey
            st.integers(min_value=0, max_value=11),  # price band
            st.sampled_from(["O", "F", "P"]),  # status
            st.integers(min_value=0, max_value=330),  # day offset (months)
            st.booleans(),  # urgent?
        ),
        min_size=1,
        max_size=40,
    )
)
def test_q385_iv_matches_bruteforce(spark, tmp_path_factory, rows):
    orders = [
        (i + 1, ck, stt, (b * 5_000_000 + 123_400) / 100.0,
         T0 + pd.Timedelta(days=d), "1-URGENT" if y else "3-MEDIUM")
        for i, (ck, b, stt, d, y) in enumerate(rows)
    ]
    sf = _orders_dir(tmp_path_factory.mktemp("woe"), orders)
    got = {
        r["feature"]: r
        for r in registry()["q385_woe_iv_screening"].fn(spark, sf).collect()
    }
    feats = {
        "price_band": lambda r: str(min(r[1], 9)),
        "status": lambda r: r[2],
        "order_month": lambda r: str((T0 + pd.Timedelta(days=r[3])).month),
        "cust_bucket": lambda r: str(r[0] % 8),
    }
    for feature, fn in feats.items():
        bins = defaultdict(lambda: [0, 0])
        for r in rows:
            bins[fn(r)][0 if r[4] else 1] += 1
        nb = len(bins)
        gt = sum(g for g, _ in bins.values())
        bt = sum(b for _, b in bins.values())
        iv_m = 0
        for g, b in bins.values():
            pg = (g + 1) / (gt + nb)
            pb = (b + 1) / (bt + nb)
            iv_m += _rhalf((pg - pb) * math.log(pg / pb) * 1e6)
        row = got[feature]
        assert row["n_bins"] == nb
        assert row["n_good"] == gt and row["n_bad"] == bt
        assert row["iv"] == iv_m / 1e6, feature
        want_strength = (
            "weak" if iv_m < 20000 else "medium" if iv_m < 100000
            else "strong" if iv_m < 300000 else "suspicious"
        )
        assert row["strength"] == want_strength


# ---------------------------------------------------------------------------
# q386 zone-map skip advisor
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=12000),  # orderkey (2-3 shards)
            st.integers(min_value=0, max_value=600),  # shipdate day offset
            st.integers(min_value=1, max_value=50),  # quantity
            st.integers(min_value=100, max_value=60000),  # extendedprice $
            st.sampled_from([0.0, 0.05, 0.09, 0.1]),  # discount
        ),
        min_size=1,
        max_size=40,
    )
)
def test_q386_zonemap_matches_bruteforce(spark, tmp_path_factory, rows):
    li = [
        (ok, 1, 1, 1, float(q), float(ep), disc, 0.0, "N", "O",
         T0 + pd.Timedelta(days=d))
        for ok, d, q, ep, disc in rows
    ]
    sf = _lineitem_dir(tmp_path_factory.mktemp("zm"), li)
    got = {
        r["predicate"]: r
        for r in registry()["q386_zonemap_skip_advisor"].fn(spark, sf).collect()
    }
    cut = pd.Timestamp("1997-01-01")
    shards = defaultdict(list)
    for ok, d, q, ep, disc in rows:
        shards[ok // 4096].append((T0 + pd.Timedelta(days=d), q, ep, disc))
    zs = list(shards.values())
    n_shards, n_rows = len(zs), len(rows)
    preds = {
        "shipdate_ge_1997": (
            sum(1 for z in zs if max(t for t, _, _, _ in z) < cut),
            sum(1 for _, d, _, _, _ in rows if T0 + pd.Timedelta(days=d) >= cut),
        ),
        "quantity_ge_45": (
            sum(1 for z in zs if max(q for _, q, _, _ in z) < 45),
            sum(1 for _, _, q, _, _ in rows if q >= 45),
        ),
        "price_ge_50k": (
            sum(1 for z in zs if max(ep for _, _, ep, _ in z) < 50000),
            sum(1 for _, _, _, ep, _ in rows if ep >= 50000),
        ),
        "discount_ge_009": (
            sum(1 for z in zs if max(dc for _, _, _, dc in z) < 0.09),
            sum(1 for _, _, _, _, dc in rows if dc >= 0.09),
        ),
        "quantity_le_5": (
            sum(1 for z in zs if min(q for _, q, _, _ in z) > 5),
            sum(1 for _, _, q, _, _ in rows if q <= 5),
        ),
    }
    for name, (skip, match) in preds.items():
        row = got[name]
        assert row["n_shards"] == n_shards
        assert row["n_skippable"] == skip, name
        assert row["skip_pct"] == skip * 100 / n_shards
        assert row["n_rows"] == n_rows
        assert row["n_match"] == match, name
        assert row["match_pct"] == match * 100 / n_rows
        # the zone-map certificate: a skippable shard contains no match
        assert skip <= n_shards - (1 if match else 0)


# ---------------------------------------------------------------------------
# q387 rollup-MV advisor
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),  # orderkey
            st.integers(min_value=1, max_value=4),  # partkey
            st.integers(min_value=1, max_value=3),  # suppkey
            st.sampled_from(["A", "N", "R"]),  # returnflag
            st.sampled_from(["F", "O"]),  # linestatus
            st.integers(min_value=0, max_value=200),  # shipdate day offset
        ),
        min_size=1,
        max_size=40,
    )
)
def test_q387_group_census_matches_bruteforce(spark, tmp_path_factory, rows):
    li = [
        (ok, pk, sk, 1, 1.0, 10.0, 0.0, 0.0, rf, ls, T0 + pd.Timedelta(days=d))
        for ok, pk, sk, rf, ls, d in rows
    ]
    sf = _lineitem_dir(tmp_path_factory.mktemp("mv"), li)
    got = {
        r["candidate"]: r
        for r in registry()["q387_rollup_mv_advisor"].fn(spark, sf).collect()
    }
    month = lambda d: (T0 + pd.Timedelta(days=d)).to_period("M")
    want = {
        "flag_status": len({(rf, ls) for _, _, _, rf, ls, _ in rows}),
        "ship_month": len({month(d) for *_, d in rows}),
        "part": len({pk for _, pk, *_ in rows}),
        "supplier": len({sk for _, _, sk, *_ in rows}),
        "part_supplier": len({(pk, sk) for _, pk, sk, *_ in rows}),
        "order": len({ok for ok, *_ in rows}),
    }
    n = len(rows)
    assert set(got) == set(want)
    for cand, ng in want.items():
        row = got[cand]
        assert row["n_rows"] == n
        assert row["n_groups"] == ng, cand
        assert row["rows_per_group"] == n / ng
        assert row["materialize"] == (n >= 100 * ng)


# ---------------------------------------------------------------------------
# q388 Bradley-Terry
# ---------------------------------------------------------------------------

def _part_dir(d, brands):
    pd.DataFrame(
        {
            "p_partkey": pd.Series(range(1, len(brands) + 1), dtype="int64"),
            "p_name": [f"part#{i}" for i in range(1, len(brands) + 1)],
            "p_brand": pd.Series(brands, dtype="string"),
        }
    ).to_parquet(f"{d}/part.parquet", index=False)
    return d


@settings(max_examples=4, deadline=None)
@given(
    brands=st.lists(
        st.sampled_from(["B1", "B2", "B3", "B4"]), min_size=1, max_size=4
    ),
    li=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),  # orderkey
            st.integers(min_value=1, max_value=4),  # partkey (capped below)
            st.integers(min_value=100, max_value=9999),  # extprice cents
        ),
        min_size=1,
        max_size=40,
    ),
)
def test_q388_bt_matches_bruteforce(spark, tmp_path_factory, brands, li):
    np = len(brands)
    rows = [(ok, (pk - 1) % np + 1, c) for ok, pk, c in li]
    lineitem = [
        (ok, pk, 1, 1, 1.0, c / 100.0, 0.0, 0.0, "N", "O", T0)
        for ok, pk, c in rows
    ]
    t = tmp_path_factory.mktemp("bt")
    sf = _lineitem_dir(t, lineitem)
    _part_dir(sf, brands)
    got = registry()["q388_bradley_terry_brands"].fn(spark, sf).collect()

    # brute force: per (order, brand) cents, baskets 2..16 brands,
    # higher spend wins, ties are not games
    ob = defaultdict(int)
    for ok, pk, c in rows:
        ob[(ok, brands[pk - 1])] += c
    baskets = defaultdict(dict)
    for (ok, b), c in ob.items():
        baskets[ok][b] = c
    games = Counter()
    wins = Counter()
    pair_n = Counter()
    for items in baskets.values():
        if not 2 <= len(items) <= 16:
            continue
        bs = sorted(items)
        for i in range(len(bs)):
            for j in range(i + 1, len(bs)):
                a, b = bs[i], bs[j]
                if items[a] == items[b]:
                    continue
                pair_n[(a, b)] += 1
                games[a] += 1
                games[b] += 1
                wins[a if items[a] > items[b] else b] += 1
    # universe = brands in any CO-OCCURRING pair: sym is built from pw
    # rows, which exist whenever a pair shared a basket (n may be 0)
    co = set()
    for items in baskets.values():
        if not 2 <= len(items) <= 16:
            continue
        bs = sorted(items)
        for i in range(len(bs)):
            for j in range(i + 1, len(bs)):
                co.add((bs[i], bs[j]))
    univ = sorted({a for a, b in co} | {b for a, b in co})
    if not univ:
        assert got == []
        return
    sym_n = Counter()
    for (a, b) in co:
        n = pair_n.get((a, b), 0)
        sym_n[(a, b)] = n
        sym_n[(b, a)] = n
    p1 = {b: (2 * wins[b] + 1) / (games[b] + 1) for b in univ}
    p2m = {}
    for b in univ:
        dm = sum(
            _rhalf(sym_n[(b, o)] / (p1[b] + p1[o]) * 1e6)
            for o in univ
            if (b, o) in sym_n
        )
        virt = _rhalf(1e6 / (p1[b] + 1))
        p2 = float((2 * wins[b] + 1) * 1000000) / (2 * (dm + virt))
        p2m[b] = _rhalf(p2 * 1e6)
    totm = sum(p2m.values())
    want = sorted(univ, key=lambda b: (-p2m[b], b))
    assert [r["brand"] for r in got] == want
    for r in got:
        b = r["brand"]
        assert r["n_games"] == games[b]
        assert r["n_wins"] == wins[b]
        assert r["strength"] == p2m[b] / totm


# ---------------------------------------------------------------------------
# q389 permutation entropy
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10),  # day offset
            st.integers(min_value=1, max_value=50_000),  # cents
        ),
        min_size=1,
        max_size=40,
    )
)
def test_q389_entropy_matches_bruteforce(spark, tmp_path_factory, rows):
    orders = [
        (i + 1, 1, "O", c / 100.0, T0 + pd.Timedelta(days=d), "1-URGENT")
        for i, (d, c) in enumerate(rows)
    ]
    sf = _orders_dir(tmp_path_factory.mktemp("pe"), orders)
    row = registry()["q389_permutation_entropy"].fn(spark, sf).collect()[0]
    daily = defaultdict(int)
    for d, c in rows:
        daily[d] += c
    series = [daily[d] for d in sorted(daily)]
    pats = Counter()
    for i in range(2, len(series)):
        a, b, c = series[i - 2], series[i - 1], series[i]
        pats[4 * (a <= b) + 2 * (b <= c) + (a <= c)] += 1
    nw = sum(pats.values())
    assert row["n_windows"] == nw
    assert row["n_patterns"] == len(pats)
    if nw == 0:
        assert row["entropy"] is None
        assert row["entropy_norm"] is None
        assert row["top_pattern"] is None
        return
    h_m = sum(
        _rhalf(-(c / nw) * math.log(c / nw) * 1e6) for c in pats.values()
    )
    assert row["entropy"] == h_m / 1e6
    assert row["entropy_norm"] == _rp((h_m / 1e6) / 1.791759469228055, 6)
    top = max(pats, key=lambda k: (pats[k], -k))
    assert row["top_pattern"] == top
