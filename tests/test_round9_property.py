"""Brute-force property tests for the round-9 wing (q351-q360): each
query's distributed formulation must equal a naive pure-Python
recomputation on adversarial random inputs — duplicate values, ties,
singleton groups, and degenerate pools included.

Integer-exact formulations assert EXACT equality; float-emitting
outputs compare at micro/nano tolerance because the references use the
same micro-rounding (`_rhalf`, half away from zero — the Spark/DuckDB
round semantics)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from aquiles_etl_pipeline_spark.relational import registry
from test_round7b_property import _docs_dir, _events_dir, _rhalf
from test_round8_property import _lineitem_dir
from test_stats_property import _orders_dir

T0 = pd.Timestamp("2024-01-01")


# ---------------------------------------------------------------------------
# q351 join-skew advisor
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=1, max_value=6), min_size=1, max_size=60)
)
def test_skew_advisor_matches_bruteforce(spark, tmp_path_factory, keys):
    rows = [
        (i, k, "O", 10.0, T0, "1-URGENT") for i, k in enumerate(keys)
    ]
    sf = _orders_dir(tmp_path_factory.mktemp("adv"), rows)
    got = registry()["q351_join_skew_advisor"].fn(spark, sf).collect()
    cnt = Counter(keys)
    n_keys, n_rows = len(cnt), len(keys)
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r["custkey"], r["n_rows_key"]) for r in got] == want
    for r in got:
        n = r["n_rows_key"]
        assert r["is_hot"] == (n * n_keys > 10 * n_rows)
        salt = 1 if n * n_keys <= n_rows else -((n * n_keys) // -n_rows)
        assert r["salt_buckets"] == salt
        assert r["row_share"] == pytest.approx(
            _rhalf(n * 1e6 / n_rows) / 1e6, abs=1e-12
        )


# ---------------------------------------------------------------------------
# q352 local clustering coefficient
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    baskets=st.lists(
        st.sets(st.integers(min_value=1, max_value=7), min_size=2, max_size=5),
        min_size=2,
        max_size=14,
    )
)
def test_lcc_matches_bruteforce(spark, tmp_path_factory, baskets):
    rows = [
        (o + 1, p, 1, i + 1, 1.0, 1.0, 0.0, 0.0, "N", "O", T0)
        for o, parts in enumerate(baskets)
        for i, p in enumerate(sorted(parts))
    ]
    sf = str(_lineitem_dir(tmp_path_factory.mktemp("lcc"), rows))
    got = {
        r["part"]: r
        for r in registry()["q352_local_clustering_coefficient"].fn(spark, sf).collect()
    }
    pair_cnt: Counter = Counter()
    for parts in baskets:
        s = sorted(parts)
        for i, a in enumerate(s):
            for b in s[i + 1 :]:
                pair_cnt[(a, b)] += 1
    edges = {p for p, c in pair_cnt.items() if c >= 2}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for part, r in got.items():
        nbrs = adj[part]
        deg = len(nbrs)
        tri = sum(
            1
            for x in nbrs
            for y in nbrs
            if x < y and (min(x, y), max(x, y)) in edges
        )
        assert r["deg"] == deg and deg >= 2
        assert r["n_triangles"] == tri
        assert r["lcc"] == pytest.approx(2.0 * tri / (deg * (deg - 1)), abs=1e-12)


# ---------------------------------------------------------------------------
# q353 Nelson-Aalen
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    users=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),      # signup day
            st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_nelson_aalen_matches_bruteforce(spark, tmp_path_factory, users):
    rows, eid = [], 0
    for u, (sd, pd_) in enumerate(users):
        rows.append((eid, T0 + pd.Timedelta(days=sd), u, "signup", 1.0, None))
        eid += 1
        if pd_ is not None:
            rows.append(
                (eid, T0 + pd.Timedelta(days=sd + pd_), u, "purchase", 1.0, None)
            )
            eid += 1
    sf = _events_dir(tmp_path_factory.mktemp("na"), rows)
    got = registry()["q353_nelson_aalen_hazard"].fn(spark, sf).collect()

    max_day = max(
        sd + (pd_ if pd_ is not None else 0) for sd, pd_ in users
    )
    times = []
    for sd, pd_ in users:
        if pd_ is not None:
            times.append((pd_, 1))
        else:
            times.append((max_day - sd, 0))
    byday: dict[int, list[int]] = {}
    for t, ev in times:
        c = byday.setdefault(t, [0, 0])
        c[0] += 1
        c[1] += ev
    cum, out = 0, []
    seen = 0
    n_total = len(times)
    for t in sorted(byday):
        c_all, c_ev = byday[t]
        n_risk = n_total - seen
        seen += c_all
        cum += _rhalf(c_ev * 1e6 / n_risk)
        if c_ev > 0:
            out.append((t, c_ev, n_risk, cum / 1e6))
    assert [
        (r["day_lag"], r["n_events"], r["n_risk"], r["cum_hazard"]) for r in got
    ] == [(t, e, n, pytest.approx(h, abs=1e-12)) for t, e, n, h in out]


# ---------------------------------------------------------------------------
# q354 Good-Turing / q355 Chao1
# ---------------------------------------------------------------------------

WORD = st.sampled_from(["a", "b", "c", "d", "e", "f"])


@settings(max_examples=5, deadline=None)
@given(
    docs=st.lists(
        st.lists(WORD, min_size=1, max_size=8), min_size=1, max_size=15
    )
)
def test_good_turing_matches_bruteforce(spark, tmp_path_factory, docs):
    rows = [
        (i, " ".join(ws), "en", "w", len(" ".join(ws)))
        for i, ws in enumerate(docs)
    ]
    sf = _docs_dir(tmp_path_factory.mktemp("gt"), rows)
    got = registry()["q354_good_turing_smoothing"].fn(spark, sf).collect()
    cf = Counter(w for ws in docs for w in ws)
    fof = Counter(cf.values())
    n_tok = sum(cf.values())
    f1 = fof.get(1, 0)
    want = sorted(fof)[:10]
    assert [r["r"] for r in got] == want
    for r in got:
        n_r, nr1 = fof[r["r"]], fof.get(r["r"] + 1, 0)
        assert r["n_r"] == n_r and r["n_r_plus_1"] == nr1
        assert r["r_star"] == pytest.approx((r["r"] + 1) * nr1 / n_r, abs=1e-12)
        assert r["p_unseen"] == pytest.approx(f1 / n_tok, abs=1e-12)


@settings(max_examples=5, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2"]),
            st.lists(WORD, min_size=1, max_size=8),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_chao1_matches_bruteforce(spark, tmp_path_factory, docs):
    rows = [
        (i, " ".join(ws), "en", src, len(" ".join(ws)))
        for i, (src, ws) in enumerate(docs)
    ]
    sf = _docs_dir(tmp_path_factory.mktemp("chao"), rows)
    got = {
        r["source"]: r
        for r in registry()["q355_chao1_richness"].fn(spark, sf).collect()
    }
    per_src: dict[str, Counter] = {}
    for src, ws in docs:
        per_src.setdefault(src, Counter()).update(ws)
    assert set(got) == set(per_src)
    for src, cf in per_src.items():
        r = got[src]
        s_obs, n_tok = len(cf), sum(cf.values())
        f1 = sum(1 for v in cf.values() if v == 1)
        f2 = sum(1 for v in cf.values() if v == 2)
        assert (r["s_obs"], r["n_tok"], r["f1"], r["f2"]) == (s_obs, n_tok, f1, f2)
        assert r["chao1"] == pytest.approx(
            s_obs + f1 * (f1 - 1) / (2.0 * (f2 + 1)), abs=1e-9
        )
        assert r["coverage"] == pytest.approx(1.0 - f1 / n_tok, abs=1e-12)


# ---------------------------------------------------------------------------
# q356 rule interest measures
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    baskets=st.lists(
        st.sets(st.integers(min_value=1, max_value=6), min_size=2, max_size=5),
        min_size=2,
        max_size=12,
    )
)
def test_rule_measures_match_bruteforce(spark, tmp_path_factory, baskets):
    rows = [
        (o + 1, p, 1, i + 1, 1.0, 1.0, 0.0, 0.0, "N", "O", T0)
        for o, parts in enumerate(baskets)
        for i, p in enumerate(sorted(parts))
    ]
    sf = str(_lineitem_dir(tmp_path_factory.mktemp("rim"), rows))
    got = {
        (r["part_a"], r["part_b"]): r
        for r in registry()["q356_rule_interest_measures"].fn(spark, sf).collect()
    }
    n = len(baskets)
    deg: Counter = Counter()
    pair: Counter = Counter()
    for parts in baskets:
        s = sorted(parts)
        deg.update(s)
        for i, a in enumerate(s):
            for b in s[i + 1 :]:
                pair[(a, b)] += 1
    for (a, b), r in got.items():
        c, da, db = pair[(a, b)], deg[a], deg[b]
        assert c >= 2
        assert (r["common_orders"], r["n_a"], r["n_b"]) == (c, da, db)
        assert r["confidence"] == pytest.approx(c / da, abs=1e-12)
        assert r["lift"] == pytest.approx(c * n / (da * db), abs=1e-12)
        assert r["leverage"] == pytest.approx(
            (c * n - da * db) / (n * n), abs=1e-12
        )
        if da > c:
            assert r["conviction"] == pytest.approx(
                (n - db) * da / (n * (da - c)), abs=1e-9
            )
        else:
            assert r["conviction"] is None


# ---------------------------------------------------------------------------
# q358 SPRT
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    days=st.lists(
        st.tuples(st.integers(min_value=1, max_value=20),
                  st.integers(min_value=0, max_value=20)),
        min_size=1,
        max_size=12,
    )
)
def test_sprt_matches_bruteforce(spark, tmp_path_factory, days):
    rows, eid = [], 0
    for d, (trials, conv) in enumerate(days):
        conv = min(conv, trials)
        for i in range(trials):
            et = "purchase" if i < conv else "view"
            # user 0 -> cohort 0 only (single-cohort reference)
            rows.append((eid, T0 + pd.Timedelta(days=d), 0, et, 1.0, None))
            eid += 1
    sf = _events_dir(tmp_path_factory.mktemp("sprt"), rows)
    got = [
        r
        for r in registry()["q358_sprt_conversion"].fn(spark, sf).collect()
        if r["cohort"] == 0
    ][0]

    l1 = _rhalf(math.log(0.08 / 0.05) * 1e6)
    l0 = _rhalf(math.log(0.92 / 0.95) * 1e6)
    a_m = _rhalf(math.log(0.8 / 0.05) * 1e6)
    b_m = _rhalf(math.log(0.2 / 0.95) * 1e6)
    cc = ct = 0
    d1 = d0 = None
    final = 0
    for d, (trials, conv) in enumerate(days):
        conv = min(conv, trials)
        if trials == 0:
            continue
        cc += conv
        ct += trials
        llr = cc * l1 + (ct - cc) * l0
        final = llr
        day = (T0 + pd.Timedelta(days=d)).date()
        if llr >= a_m and d1 is None:
            d1 = day
        if llr <= b_m and d0 is None:
            d0 = day
    if d1 is not None and (d0 is None or d1 <= d0):
        want = ("accept_h1", str(d1))
    elif d0 is not None:
        want = ("accept_h0", str(d0))
    else:
        want = ("continue", None)
    assert (got["decision"], got["cross_day"]) == want
    assert got["final_llr"] == pytest.approx(final / 1e6, abs=1e-12)


# ---------------------------------------------------------------------------
# q359 Krippendorff alpha
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    docs=st.lists(
        # None lang included: a NULL-lang row must land in n00 for BOTH
        # coders (r09 ADVICE — the bare (pred == lang).cast(int) was
        # NULL-dropping the row from all four cells on the Spark side)
        st.tuples(st.integers(min_value=0, max_value=40),
                  st.sampled_from(["en", "zh", None]),
                  st.integers(min_value=1, max_value=40)),
        min_size=1,
        max_size=30,
    )
)
def test_krippendorff_matches_bruteforce(spark, tmp_path_factory, docs):
    rows = [
        (doc_id, "t", lang, "w", n_chars)
        for doc_id, lang, n_chars in docs
    ]
    # doc_id duplicates are fine — the query never joins on it
    sf = _docs_dir(tmp_path_factory.mktemp("ka"), rows)
    got = registry()["q359_krippendorff_alpha"].fn(spark, sf).collect()[0]
    cells = Counter()
    for doc_id, lang, n_chars in docs:
        a = ("en" if n_chars % 2 == 0 else "zh") == lang
        b = ("en" if doc_id % 3 == 0 else "zh") == lang
        cells[(a, b)] += 1
    n11, n10 = cells[(True, True)], cells[(True, False)]
    n01, n00 = cells[(False, True)], cells[(False, False)]
    n = len(docs)
    assert (got["n11"], got["n10"], got["n01"], got["n00"]) == (n11, n10, n01, n00)
    assert got["pct_agreement"] == pytest.approx((n11 + n00) / n, abs=1e-12)
    ones = 2 * n11 + n10 + n01
    zeros = 2 * n00 + n10 + n01
    if ones > 0 and zeros > 0:
        q = ones / (2 * n)
        do = (n10 + n01) / n
        de = 2 * q * (1 - q) * (2 * n / (2 * n - 1))
        assert got["alpha"] == pytest.approx(1 - do / de, abs=1e-9)
    else:
        assert got["alpha"] is None


def test_krippendorff_null_lang_matches_oracle(spark, tmp_path_factory):
    """Engine symmetry on NULL lang (r09 ADVICE): a NULL-lang row makes
    both coder predicates NULL; the SQL CASE counts it in n00, so the
    Spark side must too — and n11+n10+n01+n00 must equal n."""
    import duckdb

    tmp = tmp_path_factory.mktemp("kanull")
    d = tmp / "sf"
    d.mkdir()
    pd.DataFrame(
        [(0, "t", "en", "w", 2), (1, "t", None, "w", 3),
         (2, "t", "zh", "w", 5), (3, "t", None, "w", 4)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(d / "documents.parquet", index=False)
    spec = registry()["q359_krippendorff_alpha"]
    got = spec.fn(spark, str(d)).collect()[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    want = con.execute(spec.sql).fetchone()
    assert (got["n"], got["n11"], got["n10"], got["n01"], got["n00"]) == want[:5]
    assert got["n11"] + got["n10"] + got["n01"] + got["n00"] == got["n"]


def test_stream_sprt_empty_events_returns_empty(spark, tmp_path_factory):
    """q361 on a corpus with ZERO events (r09 ADVICE): no batch ever
    merges, the rollup table is never created, and the readback must
    return an empty frame like the SQL oracle — not FileNotFoundError."""
    tmp = tmp_path_factory.mktemp("sprtempty")
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
    got = registry()["q361_stream_sprt_monitor"].fn(spark, str(d)).collect()
    assert got == []


# ---------------------------------------------------------------------------
# q360 Poisson bootstrap
# ---------------------------------------------------------------------------

@settings(max_examples=4, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=0, max_value=50000),
                  min_size=1, max_size=30)
)
def test_poisson_bootstrap_matches_bruteforce(spark, tmp_path_factory, vals):
    rows = [(i, T0, i, "purchase", c / 100.0, None) for i, c in enumerate(vals)]
    sf = _events_dir(tmp_path_factory.mktemp("pb"), rows)
    got = registry()["q360_poisson_bootstrap_ci"].fn(spark, sf).collect()[0]

    TH = (0.36787944117144233, 0.7357588823428847,
          0.9196986029286058, 0.9810118431238462)
    means = []
    for b in range(32):
        sw = nw = 0
        for eid, c in enumerate(vals):
            u = int(hashlib.md5(f"{eid}:{b}".encode()).hexdigest()[:8], 16) / 2**32
            w = sum(1 for t in TH if u >= t)
            sw += w * c
            nw += w
        if nw > 0:
            means.append(_rhalf(sw * 1e4 / nw))
    means.sort()
    nb = len(means)
    assert got["n_draws"] == nb
    assert got["point_mean"] == pytest.approx(sum(vals) / (100 * len(vals)), abs=1e-9)
    if nb:
        lo = means[(25 * (nb - 1)) // 1000]
        hi = means[(975 * (nb - 1)) // 1000]
        assert got["ci_lo"] == pytest.approx(lo / 1e6, abs=1e-12)
        assert got["ci_hi"] == pytest.approx(hi / 1e6, abs=1e-12)
    else:
        assert got["ci_lo"] is None and got["ci_hi"] is None


def test_poisson_bootstrap_empty_input_keeps_row(spark, tmp_path_factory):
    # zero purchases: the draw frame is empty; both engines must still
    # emit ONE row of NULLs (the q347 left-join lesson)
    rows = [(0, T0, 0, "view", 1.0, None)]
    sf = _events_dir(tmp_path_factory.mktemp("pbe"), rows)
    got = registry()["q360_poisson_bootstrap_ci"].fn(spark, sf).collect()
    assert len(got) == 1
    assert got[0]["point_mean"] is None
    assert got[0]["ci_lo"] is None and got[0]["ci_hi"] is None


# ---------------------------------------------------------------------------
# q362 feature-hash collisions
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    docs=st.lists(
        st.lists(WORD, min_size=1, max_size=8), min_size=1, max_size=12
    )
)
def test_hash_collisions_match_bruteforce(spark, tmp_path_factory, docs):
    rows = [
        (i, " ".join(ws), "en", "w", len(" ".join(ws)))
        for i, ws in enumerate(docs)
    ]
    sf = _docs_dir(tmp_path_factory.mktemp("fh"), rows)
    got = registry()["q362_feature_hash_collisions"].fn(spark, sf).collect()
    cf = Counter(w for ws in docs for w in ws)
    bk: dict[int, list[str]] = {}
    for tok in cf:
        b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 1024
        bk.setdefault(b, []).append(tok)
    v = len(cf)
    collided = sum(len(ts) for ts in bk.values() if len(ts) >= 2)
    want = sorted(
        ((b, ts) for b, ts in bk.items()),
        key=lambda x: (-len(x[1]), x[0]),
    )[:10]
    assert [(r["bucket"], r["n_types"]) for r in got] == [
        (b, len(ts)) for b, ts in want
    ]
    for r, (b, ts) in zip(got, want):
        assert r["example_term"] == min(ts)
        assert r["n_tokens"] == sum(cf[t] for t in ts)
        assert r["vocab_size"] == v
        assert r["collision_rate"] == pytest.approx(collided / v, abs=1e-12)


# ---------------------------------------------------------------------------
# q363 compaction planner
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=200000),
                   min_size=1, max_size=30)
)
def test_compaction_matches_greedy_packing(spark, tmp_path_factory, sizes):
    rows = [(i, "t", "en", "w", s) for i, s in enumerate(sizes)]
    sf = _docs_dir(tmp_path_factory.mktemp("cp"), rows)
    got = [
        (r["bucket"], r["n_files"], r["bytes"])
        for r in registry()["q363_compaction_planner"].fn(spark, sf).collect()
    ]
    buckets: dict[int, list[int]] = {}
    cum = 0
    for s in sizes:  # doc_id order
        buckets.setdefault(cum // 65536, []).append(s)
        cum += s
    want = [
        (b, len(v), sum(v)) for b, v in sorted(buckets.items())
    ][:50]
    assert got == want


# ---------------------------------------------------------------------------
# q364 Kendall's W
# ---------------------------------------------------------------------------

def test_kendall_w_perfect_and_reversed_agreement(spark, tmp_path_factory):
    import pandas as pd_

    # brand A: price, size, and name all rank parts IDENTICALLY -> W = 1.
    # brand B: two judges agree, the third is exactly reversed.
    rows = []
    for i in range(6):
        rows.append((i, f"n{i}", "A", f"t{i}", 10.0 + i, 1 + i))
    for i in range(6):
        rows.append((100 + i, f"n{i}", "B", f"t{i}", 10.0 + i, 6 - i))
    pdf = pd_.DataFrame(
        rows,
        columns=["p_partkey", "p_name", "p_brand", "p_type",
                 "p_retailprice", "p_size"],
    )
    d = tmp_path_factory.mktemp("kw") / "sf"
    d.mkdir()
    pdf.to_parquet(d / "part.parquet", index=False)
    got = {
        r["brand"]: r
        for r in registry()["q364_kendall_w_concordance"].fn(spark, str(d)).collect()
    }
    assert got["A"]["w"] == pytest.approx(1.0, abs=1e-12)

    def brute(ranks_lists):
        n = len(ranks_lists[0])
        sums = [sum(r[i] for r in ranks_lists) for i in range(n)]
        mean = 3 * (n + 1) / 2
        s = sum((x - mean) ** 2 for x in sums)
        return 12 * s / (9 * (n ** 3 - n))

    r_fwd = list(range(1, 7))
    r_rev = list(range(6, 0, -1))
    assert got["B"]["w"] == pytest.approx(brute([r_fwd, r_rev, r_fwd]), abs=1e-12)


# ---------------------------------------------------------------------------
# q365 effect sizes
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    t=st.lists(st.integers(min_value=0, max_value=20000), min_size=2, max_size=20),
    c=st.lists(st.integers(min_value=0, max_value=20000), min_size=2, max_size=20),
)
def test_effect_sizes_match_bruteforce(spark, tmp_path_factory, t, c):
    rows, eid = [], 0
    for v in t:
        rows.append((eid, T0, 1, "purchase", v / 100.0, None)); eid += 1
    for v in c:
        rows.append((eid, T0, 2, "purchase", v / 100.0, None)); eid += 1
    sf = _events_dir(tmp_path_factory.mktemp("es"), rows)
    out = registry()["q365_effect_sizes"].fn(spark, sf).collect()
    n1, n0 = len(t), len(c)
    m1, m0 = sum(t) / n1, sum(c) / n0
    v1 = (sum(x * x for x in t) - sum(t) ** 2 / n1) / (n1 - 1)
    v0 = (sum(x * x for x in c) - sum(c) ** 2 / n0) / (n0 - 1)
    pooled = (((n1 - 1) * v1 + (n0 - 1) * v0) / (n1 + n0 - 2)) ** 0.5
    r = out[0]
    assert (r["n_treat"], r["n_ctrl"]) == (n1, n0)
    assert r["mean_diff"] == pytest.approx((m1 - m0) / 100.0, abs=1e-9)
    if pooled > 0:
        d = (m1 - m0) / pooled
        assert r["cohens_d"] == pytest.approx(d, rel=1e-9, abs=1e-9)
        assert r["hedges_g"] == pytest.approx(
            d * (1 - 3 / (4 * (n1 + n0) - 9)), rel=1e-9, abs=1e-9
        )
    else:
        assert r["cohens_d"] is None and r["hedges_g"] is None
    if v0 > 0:
        assert r["glass_delta"] == pytest.approx(
            (m1 - m0) / v0 ** 0.5, rel=1e-9, abs=1e-9
        )
    else:
        assert r["glass_delta"] is None


# ---------------------------------------------------------------------------
# q366 Page-Hinkley
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    revs=st.lists(st.integers(min_value=0, max_value=500000),
                  min_size=1, max_size=20)
)
def test_page_hinkley_matches_bruteforce(spark, tmp_path_factory, revs):
    rows = [
        (i, i, "O", v / 100.0, T0 + pd.Timedelta(days=i), "1-URGENT")
        for i, v in enumerate(revs)
    ]
    sf = _orders_dir(tmp_path_factory.mktemp("ph"), rows)
    got = registry()["q366_page_hinkley_drift"].fn(spark, sf).collect()[0]
    m = 0
    cum = 0
    ms = []
    for i, v in enumerate(revs):
        cum += v
        rm = _rhalf(cum * 1e6 / (i + 1))
        m += v * 1000000 - rm
        ms.append(m)
    mins, best, best_day = None, None, None
    for i, mt in enumerate(ms):
        mins = mt if mins is None else min(mins, mt)
        s = mt - mins
        if best is None or s > best:
            best, best_day = s, (T0 + pd.Timedelta(days=i)).date()
    assert got["n_days"] == len(revs)
    assert got["ph_stat_dollars"] == pytest.approx(best / 1e8, abs=1e-9)
    assert got["drift_day"] == str(best_day)
