"""Brute-force property tests for the round-8 kernels: each query's
distributed formulation (in-basket Adamic-Adar pair expansion, jackknife
cluster SEs from cross-multiplied integers, floor-division matrix
powers, greatest-rank RBO intersection counting, largest-remainder
sampling tables, exact-order-statistic conformal radii and q-q points,
and the DiD cell algebra) must equal a naive pure-Python recomputation
on adversarial random inputs — duplicate values and ties included,
because order statistics and rank windows are easiest to get wrong
there.

Integer-exact formulations assert EXACT equality; float-emitting
outputs allow only micro/nano-rounding tolerance.  q336 constrains
counts to perfect 4th powers so count^0.75 is an exact integer in IEEE
double on every libm — the allocation itself is then exact end-to-end
and asserted with ==.
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd
from hypothesis import given, settings, strategies as st

from aquiles_etl_pipeline_spark.relational import registry
from test_round7b_property import _docs_dir, _events_dir, _rhalf
from test_stats_property import _orders_dir

ETYPES = ["click", "error", "purchase", "signup", "view"]


def _lineitem_dir(tmpdir, rows):
    pdf = pd.DataFrame(
        rows,
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ],
    )
    pdf["l_shipdate"] = pdf["l_shipdate"].astype("datetime64[us]")
    d = tmpdir / "sf"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "lineitem.parquet", index=False)
    return d


def _customer_dir(d, rows):
    pdf = pd.DataFrame(
        rows,
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    pdf.to_parquet(d / "customer.parquet", index=False)
    return str(d)


# ---------------------------------------------------------------------------
# q328 Adamic-Adar link prediction
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    baskets=st.lists(
        st.sets(st.integers(min_value=1, max_value=8), min_size=1, max_size=6),
        min_size=1,
        max_size=12,
    )
)
def test_adamic_adar_matches_bruteforce(spark, tmp_path_factory, baskets):
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        (o + 1, p, 1, i + 1, 1.0, 1.0, 0.0, 0.0, "N", "O", t0)
        for o, parts in enumerate(baskets)
        for i, p in enumerate(sorted(parts))
    ]
    sf = str(_lineitem_dir(tmp_path_factory.mktemp("aa"), rows))
    got = {
        (r["part_a"], r["part_b"]): r
        for r in registry()["q328_adamic_adar_links"].fn(spark, sf).collect()
    }

    kept = [sorted(b) for b in baskets if 2 <= len(b) <= 16]
    deg: dict[int, int] = {}
    for b in kept:
        for p in b:
            deg[p] = deg.get(p, 0) + 1
    pairs: dict[tuple[int, int], list[int]] = {}
    for b in kept:
        aa_m = _rhalf(1e6 / math.log(len(b)))
        for i, pa in enumerate(b):
            for pb in b[i + 1:]:
                pairs.setdefault((pa, pb), []).append(aa_m)
    want = {
        k: (len(v), sum(v))
        for k, v in pairs.items()
        if len(v) >= 2
    }
    top = sorted(want.items(), key=lambda kv: (-kv[1][1], kv[0]))[:30]
    assert set(got) == {k for k, _ in top}
    for (pa, pb), (common, aa_sum) in top:
        r = got[(pa, pb)]
        assert r["common_orders"] == common
        assert abs(r["adamic_adar"] - aa_sum / 1e6) < 1e-9
        exp_j = common / (deg[pa] + deg[pb] - common)
        assert abs(r["jaccard"] - exp_j) < 1e-12


# ---------------------------------------------------------------------------
# q331 delete-one-cluster jackknife SE
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=40),      # custkey
            st.integers(min_value=0, max_value=50000),   # cents
        ),
        min_size=20,
        max_size=80,
    )
)
def test_cluster_jackknife_matches_bruteforce(spark, tmp_path_factory, data):
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        (i + 1, ck, "O", c / 100.0, t0, "1-URGENT")
        for i, (ck, c) in enumerate(data)
    ]
    sf = _orders_dir(tmp_path_factory.mktemp("jk"), rows)
    row = registry()["q331_cluster_jackknife_se"].fn(spark, sf).collect()[0]

    buckets: dict[int, list[int]] = {}
    for ck, c in data:
        b = int(hashlib.md5(str(ck).encode()).hexdigest()[:8], 16) % 16
        buckets.setdefault(b, []).append(c)
    nb = len(buckets)
    n = sum(len(v) for v in buckets.values())
    s = sum(sum(v) for v in buckets.values())
    thetas = [
        _rhalf((s - sum(v)) * 10000.0 / (n - len(v)))
        for v in buckets.values()
        if n > len(v)
    ]
    assert row["n_orders"] == n
    assert row["n_clusters"] == nb
    assert abs(row["grand_mean"] - s / (100.0 * n)) < 1e-9
    if len(thetas) == nb:  # every leave-one-out defined
        t_sum = sum(thetas)
        dev2 = sum((nb * t - t_sum) ** 2 for t in thetas)
        se = math.sqrt((nb - 1) * float(dev2) / (float(nb) * nb * nb)) / 1e6
        assert abs(row["jack_se"] - se) < max(1e-9, 1e-9 * se)


# ---------------------------------------------------------------------------
# q332 absorbing-chain matrix powers
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None)
@given(
    seqs=st.lists(
        st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=10),
        min_size=1,
        max_size=8,
    )
)
def test_absorbing_markov_matches_bruteforce(spark, tmp_path_factory, seqs):
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    for u, seq in enumerate(seqs):
        for step, e in enumerate(seq):
            rows.append(
                (eid, t0 + pd.Timedelta(seconds=step), u, ETYPES[e], 0.0, None)
            )
            eid += 1
    sf = _events_dir(tmp_path_factory.mktemp("mk"), rows)
    got = {
        r["event_type"]: r
        for r in registry()["q332_absorbing_markov_conversion"].fn(spark, sf).collect()
    }

    states = sorted({ETYPES[e] for seq in seqs for e in seq})
    cnt: dict[tuple[str, str], int] = {}
    for seq in seqs:
        for a, b in zip(seq, seq[1:]):
            cnt[(ETYPES[a], ETYPES[b])] = cnt.get((ETYPES[a], ETYPES[b]), 0) + 1
    tot: dict[str, int] = {}
    for (a, _), c in cnt.items():
        tot[a] = tot.get(a, 0) + c
    t_m = {k: (c * 1000000) // tot[k[0]] for k, c in cnt.items()}
    p = {s: (1000000 if s == "purchase" else 0) for s in states}
    snaps = {}
    for k in range(1, 5):
        nxt = {}
        for s in states:
            if s == "purchase":
                nxt[s] = 1000000
            else:
                nxt[s] = sum(
                    (t_m[(s, t)] * p[t]) // 1000000
                    for t in states
                    if (s, t) in t_m
                )
        p = nxt
        if k in (2, 4):
            snaps[k] = dict(p)
    assert set(got) == set(states)
    for s in states:
        assert abs(got[s]["p_convert_2"] - snaps[2][s] / 1e6) < 1e-12
        assert abs(got[s]["p_convert_4"] - snaps[4][s] / 1e6) < 1e-12


# ---------------------------------------------------------------------------
# q334 rank-biased overlap vs the set-intersection definition
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None)
@given(
    parts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=90000),  # revenue cents
            st.integers(min_value=0, max_value=9000),   # quantity cents
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t,
    )
)
def test_rbo_matches_set_intersection_definition(spark, tmp_path_factory, parts):
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        (i + 1, i + 1, 1, 1, q / 100.0, r / 100.0, 0.0, 0.0, "N", "O", t0)
        for i, (r, q) in enumerate(parts)
    ]
    sf = str(_lineitem_dir(tmp_path_factory.mktemp("rbo"), rows))
    row = registry()["q334_rank_biased_overlap"].fn(spark, sf).collect()[0]

    # the REAL definition: prefix sets of the two rankings
    keys = list(range(1, len(parts) + 1))
    ra = sorted(keys, key=lambda k: (-parts[k - 1][0], k))
    rb = sorted(keys, key=lambda k: (-parts[k - 1][1], k))
    wsum = 0
    for d in range(1, 21):
        overlap = len(set(ra[:d]) & set(rb[:d]))
        wsum += overlap * _rhalf(0.9 ** (d - 1) / d * 1e9)
    assert abs(row["rbo"] - 0.1 * wsum / 1e9) < 1e-9
    assert row["overlap_at_k"] == len(set(ra[:20]) & set(rb[:20]))


# ---------------------------------------------------------------------------
# q336 largest-remainder sampling table
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None)
@given(
    counts=st.dictionaries(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
        st.integers(min_value=1, max_value=5),  # k -> count = k^4
        min_size=1,
        max_size=6,
    )
)
def test_negative_sampling_table_exact(spark, tmp_path_factory, counts):
    # counts are perfect 4th powers so count^0.75 = k^3 is EXACT in
    # IEEE double on every libm — the allocation is then integer-exact
    # end-to-end and asserted with ==.
    text = " ".join(tok for tok, k in sorted(counts.items()) for _ in range(k**4))
    sf = _docs_dir(
        tmp_path_factory.mktemp("neg"), [(0, text, "en", "src0", len(text))]
    )
    got = {
        r["token"]: r
        for r in registry()["q336_negative_sampling_table"].fn(spark, sf).collect()
    }

    c = {tok: k**4 for tok, k in counts.items()}
    p_m = {tok: _rhalf((k**3) * 1e6) for tok, k in counts.items()}
    t = sum(p_m.values())
    f = {tok: (p_m[tok] * 1048576) // t for tok in c}
    rem = {tok: p_m[tok] * 1048576 - f[tok] * t for tok in c}
    leftover = 1048576 - sum(f.values())
    order = sorted(c, key=lambda tok: (-rem[tok], -c[tok], tok))
    buckets = dict(f)
    for tok in order[:leftover]:
        buckets[tok] += 1
    assert sum(buckets.values()) == 1048576
    out_order = sorted(c, key=lambda tok: (-c[tok], tok))
    start = 0
    for tok in out_order:
        assert got[tok]["n_occurrences"] == c[tok]
        assert got[tok]["n_buckets"] == buckets[tok]
        assert got[tok]["bucket_start"] == start
        start += buckets[tok]


# ---------------------------------------------------------------------------
# q337 split-conformal radius + coverage
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),     # event type idx
            st.integers(min_value=0, max_value=400),   # cents
        ),
        min_size=4,
        max_size=80,
    )
)
def test_conformal_matches_bruteforce(spark, tmp_path_factory, data):
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        (i, t0, 1, ETYPES[e], c / 100.0, None) for i, (e, c) in enumerate(data)
    ]
    sf = _events_dir(tmp_path_factory.mktemp("conf"), rows)
    got = {
        r["event_type"]: r
        for r in registry()["q337_conformal_interval"].fn(spark, sf).collect()
    }

    cal: dict[str, list[int]] = {}
    tst: dict[str, list[int]] = {}
    for i, (e, c) in enumerate(data):
        (cal if i % 2 == 0 else tst).setdefault(ETYPES[e], []).append(c)
    for et, cs in cal.items():
        if et not in tst:
            continue  # no holdout rows -> inner join drops the type
        n = len(cs)
        med = sorted(cs)[(n + 1) // 2 - 1]
        res = sorted(abs(x - med) for x in cs)
        k = min(n, (9 * (n + 1) + 9) // 10)
        q = res[k - 1]
        cov = sum(1 for x in tst[et] if abs(x - med) <= q) / len(tst[et])
        r = got[et]
        assert r["n_calib"] == n
        assert r["n_test"] == len(tst[et])
        assert abs(r["median"] - med / 100.0) < 1e-9
        assert abs(r["q_hat"] - q / 100.0) < 1e-9
        assert abs(r["coverage"] - cov) < 1e-12
    assert set(got) == {et for et in cal if et in tst}


# ---------------------------------------------------------------------------
# q338 exact q-q points
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None)
@given(
    aa=st.lists(st.integers(min_value=0, max_value=90000), min_size=1, max_size=50),
    bb=st.lists(st.integers(min_value=0, max_value=90000), min_size=1, max_size=50),
)
def test_qq_points_match_order_statistics(spark, tmp_path_factory, aa, bb):
    t0 = pd.Timestamp("2024-01-01")
    d = _lineitem_dir(tmp_path_factory.mktemp("qq"), [])
    custs = [(1, "a", 0, 0.0, "BUILDING"), (2, "b", 0, 0.0, "MACHINERY")]
    orows = [
        (i + 1, 1 if side == 0 else 2, "O", c / 100.0, t0, "1-URGENT")
        for i, (side, c) in enumerate(
            [(0, c) for c in aa] + [(1, c) for c in bb]
        )
    ]
    _orders_dir(d.parent, orows)
    sf = _customer_dir(d.parent / "sf", custs)
    got = {
        r["prob"]: r for r in registry()["q338_qq_quantile_points"].fn(spark, sf).collect()
    }

    sa, sb = sorted(aa), sorted(bb)
    for p in range(5, 100, 5):
        qa = sa[(p * (len(sa) - 1)) // 100]
        qb = sb[(p * (len(sb) - 1)) // 100]
        r = got[p]
        assert abs(r["q_building"] - qa / 100.0) < 1e-9
        assert abs(r["q_machinery"] - qb / 100.0) < 1e-9
        assert abs(r["diff"] - (qa - qb) / 100.0) < 1e-9


# ---------------------------------------------------------------------------
# q330 DiD cell algebra
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),    # user
            st.booleans(),                            # post period
            st.integers(min_value=0, max_value=400),  # cents
        ),
        min_size=8,
        max_size=60,
    )
)
def test_did_matches_bruteforce(spark, tmp_path_factory, data):
    pre = pd.Timestamp("2024-01-05")
    post = pd.Timestamp("2024-01-20")
    rows = [
        (i, post if is_post else pre, u, "purchase", c / 100.0, None)
        for i, (u, is_post, c) in enumerate(data)
    ]
    sf = _events_dir(tmp_path_factory.mktemp("did"), rows)
    row = registry()["q330_did_estimator"].fn(spark, sf).collect()[0]

    cells: dict[tuple[bool, bool], list[int]] = {}
    for u, is_post, c in data:
        cells.setdefault((u % 2 == 1, is_post), []).append(c)

    def m(k):
        v = cells.get(k, [])
        return sum(v) / (100.0 * len(v)) if v else None

    keys = [(True, False), (True, True), (False, False), (False, True)]
    names = ["n_treat_pre", "n_treat_post", "n_ctrl_pre", "n_ctrl_post"]
    for k, nm in zip(keys, names):
        assert row[nm] == len(cells.get(k, []))
    if all(m(k) is not None for k in keys):
        did = (m((True, True)) - m((True, False))) - (
            m((False, True)) - m((False, False))
        )
        assert abs(row["did"] - did) < 1e-9
    if all(len(cells.get(k, [])) > 1 for k in keys):
        var_n = 0.0
        for k in keys:
            v = cells[k]
            n, s = len(v), sum(v)
            ssq = sum(x * x for x in v)
            var_n += (ssq - s * s / n) / (n - 1) / n
        assert abs(row["se_did"] - math.sqrt(var_n) / 100.0) < 1e-9


# ---------------------------------------------------------------------------
# q340 UMass coherence
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["w0", "w1", "w2", "w3", "w4", "w5"]),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_umass_coherence_matches_bruteforce(spark, tmp_path_factory, docs):
    rows = [
        (i, " ".join(toks), "en", "src0", len(" ".join(toks)))
        for i, toks in enumerate(docs)
    ]
    sf = _docs_dir(tmp_path_factory.mktemp("um"), rows)
    row = registry()["q340_umass_topic_coherence"].fn(spark, sf).collect()[0]

    presence: dict[str, set[int]] = {}
    for i, toks in enumerate(docs):
        for t in set(toks):
            presence.setdefault(t, set()).add(i)
    ranked = sorted(presence, key=lambda t: (-len(presence[t]), t))[:10]
    total = 0
    for i, te in enumerate(ranked):
        for tl in ranked[i + 1:]:
            # DENSE pairs: dj = 0 contributes ln(1/D(e)) — the
            # smoothing penalty (review-found inversion when dropped)
            dj = len(presence[te] & presence[tl])
            total += _rhalf(math.log((dj + 1.0) / len(presence[te])) * 1e6)
    assert row["source"] == "src0"
    assert row["n_terms"] == len(ranked)
    assert abs(row["coherence"] - total / 1e6) < 1e-9


# ---------------------------------------------------------------------------
# q341 RAKE keyphrases
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["the", "a", "fast", "scan", "merge", "big"]),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_rake_matches_bruteforce(spark, tmp_path_factory, docs):
    stops = {"the", "a", "table", "data", "value", "row"}
    rows = [
        (i, " ".join(toks), "en", "src0", len(" ".join(toks)))
        for i, toks in enumerate(docs)
    ]
    sf = _docs_dir(tmp_path_factory.mktemp("rake"), rows)
    got = {
        r["phrase"]: r
        for r in registry()["q341_rake_keyphrases"].fn(spark, sf).collect()
    }

    phrases: list[list[str]] = []
    for toks in docs:
        run: list[str] = []
        for t in toks + ["the"]:  # sentinel flush
            if t in stops:
                if 1 <= len(run) <= 4:
                    phrases.append(run)
                run = []
            else:
                run.append(t)
    freq: dict[str, int] = {}
    degree: dict[str, int] = {}
    for ph in phrases:
        for w in ph:
            freq[w] = freq.get(w, 0) + 1
            degree[w] = degree.get(w, 0) + len(ph)
    score_m = {w: _rhalf(degree[w] / freq[w] * 1e6) for w in freq}
    pstat: dict[str, tuple[int, int]] = {}
    for ph in phrases:
        key = " ".join(ph)
        s = sum(score_m[w] for w in ph)
        n, _ = pstat.get(key, (0, s))
        pstat[key] = (n + 1, s)
    top = sorted(pstat.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    assert set(got) == {k for k, _ in top}
    for phrase, (n, s) in top:
        assert got[phrase]["n_occurrences"] == n
        assert abs(got[phrase]["rake_score"] - s / 1e6) < 1e-9


# ---------------------------------------------------------------------------
# q342 MMR greedy selection
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["fast", "scan", "merge", "big", "slow", "key"]),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_mmr_matches_greedy_reference(spark, tmp_path_factory, docs):
    texts = [" ".join(toks) for toks in docs]
    rows = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
    sf = _docs_dir(tmp_path_factory.mktemp("mmr"), rows)
    got = {
        r["step"]: r for r in registry()["q342_mmr_diverse_topk"].fn(spark, sf).collect()
    }

    cand = sorted(range(len(texts)), key=lambda i: (-len(texts[i]), i))[:8]
    maxc = max(len(texts[i]) for i in cand)
    rel = {
        i: (len(texts[i]) * 1000000) // maxc if maxc > 0 else 0 for i in cand
    }

    def bigrams(i):
        t = [x for x in texts[i].lower().strip(" ").split() if x]
        return {" ".join(t[j : j + 2]) for j in range(len(t) - 1)} if len(t) >= 2 else set()

    bs = {i: bigrams(i) for i in cand}

    def sim(a, b):
        u = len(bs[a] | bs[b])
        return (len(bs[a] & bs[b]) * 1000000) // u if u > 0 else 0

    selected: list[int] = []
    want = {}
    for step in range(1, min(4, len(cand)) + 1):
        remaining = [i for i in cand if i not in selected]
        scored = []
        for i in remaining:
            ms = max((sim(i, s) for s in selected), default=0)
            scored.append((7 * rel[i] - 3 * ms, -i, i, ms))
        scored.sort(reverse=True)
        _, _, pick, ms = scored[0]
        selected.append(pick)
        want[step] = (pick, rel[pick], ms)
    assert set(got) == set(want)
    for step, (pick, r, ms) in want.items():
        assert got[step]["doc_id"] == pick
        assert abs(got[step]["relevance"] - r / 1e6) < 1e-9
        assert abs(got[step]["max_sim"] - ms / 1e6) < 1e-9


# ---------------------------------------------------------------------------
# q343 IPS / SNIPS
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=11),   # user -> cohort u%4
            st.integers(min_value=0, max_value=4),    # event type idx
            st.integers(min_value=0, max_value=400),  # cents
        ),
        min_size=1,
        max_size=60,
    )
)
def test_ips_snips_match_bruteforce(spark, tmp_path_factory, data):
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        (i, t0, u, ETYPES[e], c / 100.0, None) for i, (u, e, c) in enumerate(data)
    ]
    sf = _events_dir(tmp_path_factory.mktemp("ips"), rows)
    row = registry()["q343_ips_offpolicy_eval"].fn(spark, sf).collect()[0]

    n_c: dict[int, int] = {}
    n_m: dict[int, int] = {}
    s_m: dict[int, int] = {}
    for u, e, c in data:
        coh = u % 4
        n_c[coh] = n_c.get(coh, 0) + 1
        target = "click" if coh % 2 == 0 else "view"
        if ETYPES[e] == target:
            n_m[coh] = n_m.get(coh, 0) + 1
            s_m[coh] = s_m.get(coh, 0) + c
    wr = sum(
        _rhalf(s_m[c] * n_c[c] / n_m[c] * 10000.0) for c in n_m
    )
    w = sum(_rhalf(n_m[c] * n_c[c] / n_m[c] * 1e6) for c in n_m)
    w2 = sum(
        _rhalf(n_m[c] * n_c[c] * n_c[c] / (n_m[c] * n_m[c]) * 1e6) for c in n_m
    )
    n = sum(n_c.values())
    assert row["n_rows"] == n
    assert row["n_matched"] == sum(n_m.values())
    assert abs(row["ips"] - wr / (n * 1e6)) < 1e-9
    if w > 0:
        assert abs(row["snips"] - wr / w) < 1e-9
        assert abs(row["ess"] - w * w / (w2 * 1e6)) < 1e-9
    else:
        assert row["snips"] is None and row["ess"] is None


# ---------------------------------------------------------------------------
# q344 winsorized stats
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["BUILDING", "MACHINERY"]),
            st.integers(min_value=-40000, max_value=40000),  # cents
        ),
        min_size=1,
        max_size=60,
    )
)
def test_winsorized_stats_match_bruteforce(spark, tmp_path_factory, data):
    rows = [
        (i + 1, f"c{i}", 0, c / 100.0, seg) for i, (seg, c) in enumerate(data)
    ]
    d = tmp_path_factory.mktemp("win") / "sf"
    d.mkdir(exist_ok=True)
    sf = _customer_dir(d, rows)
    got = {
        r["segment"]: r
        for r in registry()["q344_winsorized_stats"].fn(spark, sf).collect()
    }

    groups: dict[str, list[int]] = {}
    for seg, c in data:
        groups.setdefault(seg, []).append(c)
    for seg, cs in groups.items():
        cs = sorted(cs)
        n = len(cs)
        lo = cs[(10 * (n - 1)) // 100]
        hi = cs[(90 * (n - 1)) // 100]
        wc = [min(max(c, lo), hi) for c in cs]
        s, q = sum(wc), sum(x * x for x in wc)
        r = got[seg]
        assert r["n"] == n
        assert abs(r["lo_cut"] - lo / 100.0) < 1e-9
        assert abs(r["hi_cut"] - hi / 100.0) < 1e-9
        assert abs(r["win_mean"] - s / (100.0 * n)) < 1e-9
        if n > 1:
            sd = math.sqrt((q - s * s / n) / (n - 1)) / 100.0
            assert abs(r["win_sd"] - sd) < max(1e-9, 1e-9 * sd)
        else:
            assert r["win_sd"] is None


# ---------------------------------------------------------------------------
# q345 Mann-Whitney U (tie-corrected) vs per-row rank reference
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.booleans(),                            # group 1?
            st.integers(min_value=0, max_value=20),   # cents (dense ties)
        ),
        min_size=2,
        max_size=60,
    )
)
def test_mann_whitney_matches_rank_reference(spark, tmp_path_factory, data):
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        (i, t0, (1 if g else 2), "purchase", c / 100.0, None)
        for i, (g, c) in enumerate(data)
    ]
    sf = _events_dir(tmp_path_factory.mktemp("mwu"), rows)
    row = registry()["q345_mann_whitney_u"].fn(spark, sf).collect()[0]

    # literal tie-averaged per-row ranks
    vals = sorted(c for _, c in data)
    rank_of: dict[int, float] = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        avg = (i + 1 + j) / 2.0
        rank_of[vals[i]] = avg
        i = j
    g1 = [c for g, c in data if g]
    g2 = [c for g, c in data if not g]
    n1, n2, n = len(g1), len(g2), len(data)
    r1 = sum(rank_of[c] for c in g1)
    u_centered = (r1 - n1 * (n1 + 1) / 2.0) - n1 * n2 / 2.0
    assert row["n1"] == n1 and row["n2"] == n2
    assert abs(row["u_centered"] - u_centered) < 1e-9
    ties: dict[int, int] = {}
    for c in vals:
        ties[c] = ties.get(c, 0) + 1
    tie3 = sum(t**3 - t for t in ties.values())
    if n1 > 0 and n2 > 0 and n > 1:
        var = n1 * n2 / 12.0 * ((n + 1) - tie3 / (n * (n - 1)))
        if var > 0:
            assert abs(row["z"] - u_centered / math.sqrt(var)) < 1e-9
        else:
            assert row["z"] is None
    else:
        assert row["z"] is None


# ---------------------------------------------------------------------------
# q346 McNemar cells
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # doc_id offset
            st.sampled_from(["en", "zh"]),
            st.integers(min_value=0, max_value=99),  # n_chars
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_mcnemar_matches_bruteforce(spark, tmp_path_factory, docs):
    rows = [(i, "x", lang, "src0", nc) for i, lang, nc in docs]
    sf = _docs_dir(tmp_path_factory.mktemp("mcn"), rows)
    row = registry()["q346_mcnemar_paired"].fn(spark, sf).collect()[0]

    cells = {"11": 0, "10": 0, "01": 0, "00": 0}
    for i, lang, nc in docs:
        a = ("en" if nc % 2 == 0 else "zh") == lang
        b = ("en" if i % 3 == 0 else "zh") == lang
        cells[f"{int(a)}{int(b)}"] += 1
    assert row["n11"] == cells["11"]
    assert row["n10"] == cells["10"]
    assert row["n01"] == cells["01"]
    assert row["n00"] == cells["00"]
    disc = cells["10"] + cells["01"]
    if disc > 0:
        diff = cells["10"] - cells["01"]
        assert abs(row["chi2"] - diff * diff / disc) < 1e-9
        assert abs(row["chi2_cc"] - (abs(diff) - 1) ** 2 / disc) < 1e-9
    else:
        assert row["chi2"] is None and row["chi2_cc"] is None


# ---------------------------------------------------------------------------
# q347 randomization inference
# ---------------------------------------------------------------------------

@settings(max_examples=4, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),    # user
            st.integers(min_value=0, max_value=400),  # cents
        ),
        min_size=4,
        max_size=40,
    )
)
def test_randomization_inference_matches_bruteforce(
    spark, tmp_path_factory, data
):
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        (i, t0, u, "purchase", c / 100.0, None) for i, (u, c) in enumerate(data)
    ]
    sf = _events_dir(tmp_path_factory.mktemp("ri"), rows)
    row = registry()["q347_randomization_inference"].fn(spark, sf).collect()[0]

    t = [c for u, c in data if u % 2 == 1]
    c_ = [c for u, c in data if u % 2 == 0]
    obs_m = (
        _rhalf((sum(t) / len(t) - sum(c_) / len(c_)) * 10000.0)
        if t and c_
        else None
    )
    nulls = []
    for b in range(64):
        s1 = n1 = s0 = n0 = 0
        for u, c in data:
            h = int(hashlib.md5(f"{u}:{b}".encode()).hexdigest()[:8], 16) % 2
            if h == 1:
                s1 += c; n1 += 1
            else:
                s0 += c; n0 += 1
        if n1 > 0 and n0 > 0:
            nulls.append(_rhalf((s1 / n1 - s0 / n0) * 10000.0))
    assert row["n_draws"] == len(nulls)
    if obs_m is not None:
        assert abs(row["observed_diff"] - obs_m / 1e6) < 1e-9
        n_ge = sum(1 for x in nulls if abs(x) >= abs(obs_m))
        assert abs(row["p_value"] - (1 + n_ge) / (1 + len(nulls))) < 1e-12
