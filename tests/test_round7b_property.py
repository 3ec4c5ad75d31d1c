"""Brute-force property tests for the round-7b evaluation kernels:
each query's distributed formulation (block-cumulative average
precision, integer-marginal Cohen's kappa, micro-rounded NDCG/MRR,
sufficient-statistics LOO slopes, lattice Shapley values, and the
integer-exact power iteration) must equal a naive pure-Python
recomputation on adversarial random inputs — dense ties included,
because ties are where ranking metrics and tie-block PR curves are
easiest to get wrong.

The power-iteration and Shapley tests assert EXACT equality against a
straight-line integer reference (both formulations are integer-exact by
construction); the float-emitting metrics allow only the micro-rounding
tolerance (<=1e-4 absolute).
"""

from __future__ import annotations

import itertools
import math

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from aquiles_etl_pipeline_spark.relational import registry
from test_stats_property import _orders_dir


def _rhalf(x: float) -> int:
    """Round half away from zero on the EXACT fractional part —
    matching round() in Spark SQL and DuckDB.  Python's round() is
    banker's (round-half-even), which diverges on reachable exact-.5
    rationals like 62.5, and floor(x+0.5) misrounds boundary doubles
    like 0.49999999999999994."""
    t = math.trunc(x)
    f = x - t
    if f >= 0.5:
        return t + 1
    if f <= -0.5:
        return t - 1
    return t

CENTS = st.integers(min_value=0, max_value=300)
ETYPES = ["click", "error", "purchase", "signup", "view"]


def _events_dir(tmpdir, rows):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    d = tmpdir / "sf"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "events.parquet", index=False)
    return str(d)


def _docs_dir(tmpdir, rows):
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    # pin the real table schema: an all-None string column would
    # otherwise infer as a null-typed parquet column, which Spark
    # reads as a non-string type and mis-coerces comparisons against
    pdf = pdf.astype(
        {
            "doc_id": "int64",
            "text": "string",
            "lang": "string",
            "source": "string",
            "n_chars": "int64",
        }
    )
    d = tmpdir / "sf"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _emb_dir(tmpdir, rows):
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    d = tmpdir / "sf"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "embeddings.parquet", index=False)
    return str(d)


# ---------------------------------------------------------------------------
# q314 NDCG@5 / MRR
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),   # user
            st.integers(min_value=0, max_value=4),   # event type idx
            CENTS,
        ),
        min_size=1,
        max_size=60,
    )
)
def test_ndcg_mrr_matches_bruteforce(spark, tmp_path_factory, data):
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        (i, t0, u, ETYPES[e], c / 100.0, None) for i, (u, e, c) in enumerate(data)
    ]
    sf = _events_dir(tmp_path_factory.mktemp("ndcg"), rows)
    got = {
        r["cohort"]: r
        for r in registry()["q314_ranking_metric_eval"].fn(spark, sf).collect()
    }

    # pure-python reference with the same micro-rounding
    per: dict[tuple[int, str], list[int]] = {}
    for u, e, c in data:
        k = (u, ETYPES[e])
        per.setdefault(k, []).append(c)
    users: dict[int, list[tuple[str, int, int]]] = {}
    for (u, e), cs in per.items():
        users.setdefault(u, []).append((e, len(cs), sum(cs)))
    want: dict[int, list[tuple[int, int]]] = {}
    for u, items in users.items():
        pred = sorted(items, key=lambda t: (-t[1], t[0]))
        ideal = sorted(items, key=lambda t: (-t[2], t[0]))
        dcg = sum(
            round(rel / math.log2(r + 2) * 1e6)
            for r, (_, _, rel) in enumerate(pred[:5])
        )
        idcg = sum(
            round(rel / math.log2(r + 2) * 1e6)
            for r, (_, _, rel) in enumerate(ideal[:5])
        )
        ndcg_m = _rhalf(dcg / idcg * 1e6) if idcg > 0 else 0
        top = ideal[0][0]
        prank = next(r + 1 for r, (e, _, _) in enumerate(pred) if e == top)
        mrr_m = _rhalf(1e6 / prank)
        want.setdefault(u % 8, []).append((ndcg_m, mrr_m))
    assert set(got) == set(want)
    for coh, pairs in want.items():
        n = len(pairs)
        assert got[coh]["n_users"] == n
        assert abs(
            got[coh]["avg_ndcg5"] - sum(p[0] for p in pairs) / (n * 1e6)
        ) < 1e-4
        assert abs(
            got[coh]["avg_mrr"] - sum(p[1] for p in pairs) / (n * 1e6)
        ) < 1e-4


# ---------------------------------------------------------------------------
# q318 Cohen's kappa over the stopword classifier
# ---------------------------------------------------------------------------

_VOCAB = ["the", "a", "of", "la", "de", "en", "le", "et", "der", "und",
          "zu", "xyz", "foo"]


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=12),
            st.sampled_from(["en", "es", "fr", "de", "zh"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_kappa_matches_direct_confusion(spark, tmp_path_factory, docs):
    rows = [
        (i, " ".join(ws), lang, "s0", len(" ".join(ws)))
        for i, (ws, lang) in enumerate(docs)
    ]
    sf = _docs_dir(tmp_path_factory.mktemp("kap"), rows)
    got = {
        r["cls"]: r for r in registry()["q318_langid_kappa_f1"].fn(spark, sf).collect()
    }

    stops = {
        "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"},
        "es": {"el", "la", "de", "y", "que", "en", "un", "una", "los", "para"},
        "fr": {"le", "la", "de", "et", "que", "en", "un", "une", "les", "pour"},
        "de": {"der", "die", "das", "und", "zu", "in", "ist", "ein", "eine",
               "von"},
    }

    def predict(ws):
        toks = set(ws)
        s = {c: len(toks & v) for c, v in stops.items()}
        best = max(s.values())
        if best <= 0:
            return "und"
        for c in ("en", "es", "fr", "de"):
            if s[c] == best:
                return c

    conf: dict[tuple[str, str], int] = {}
    for ws, lang in docs:
        conf[(lang, predict(ws))] = conf.get((lang, predict(ws)), 0) + 1
    classes = {c for pair in conf for c in pair}
    rm = {c: sum(v for (a, _), v in conf.items() if a == c) for c in classes}
    cm = {c: sum(v for (_, p), v in conf.items() if p == c) for c in classes}
    n = sum(conf.values())
    dsum = sum(conf.get((c, c), 0) for c in classes)
    s = sum(rm[c] * cm[c] for c in classes)
    want_kappa = (n * dsum - s) / (n * n - s) if n * n - s > 0 else 0.0
    assert set(got) == classes
    for c in classes:
        tp = conf.get((c, c), 0)
        assert got[c]["tp"] == tp
        assert got[c]["fp"] == cm[c] - tp
        assert got[c]["fn"] == rm[c] - tp
        assert abs(got[c]["kappa"] - want_kappa) < 1e-12
        denom = 2 * tp + (cm[c] - tp) + (rm[c] - tp)
        want_f1 = 2 * tp / denom if denom > 0 else 0.0
        assert abs(got[c]["f1"] - want_f1) < 1e-12


# ---------------------------------------------------------------------------
# q319 average precision over tie blocks
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.lists(st.integers(min_value=-4, max_value=4), min_size=2,
                     max_size=2),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_average_precision_matches_bruteforce(spark, tmp_path_factory, data):
    # tiny integer/100 grid forces dense score ties
    rows = [
        (i, [k / 100.0 for k in ks], lab) for i, (ks, lab) in enumerate(data)
    ]
    sf = _emb_dir(tmp_path_factory.mktemp("ap"), rows)
    out = registry()["q319_pr_curve_average_precision"].fn(spark, sf).collect()

    scored = [
        (sum(round(k / 100.0 * 1000) ** 2 for k in ks), 1 if lab <= 1 else 0)
        for ks, lab in data
    ]
    p_tot = sum(y for _, y in scored)
    blocks: dict[int, list[int]] = {}
    for s_val, y in scored:
        blocks.setdefault(s_val, []).append(y)
    tp = n_ge = 0
    ap_num = 0
    curve = {}
    for s_val in sorted(blocks, reverse=True):
        pos = sum(blocks[s_val])
        tp += pos
        n_ge += len(blocks[s_val])
        ap_num += pos * _rhalf(tp / n_ge * 1e6)
        curve[s_val] = (tp, n_ge)
    want_ap = ap_num / (p_tot * 1e6) if p_tot > 0 else 0.0
    assert len(out) == len(blocks)
    for r in out:
        tp_b, n_b = curve[r["score_milli_sq"]]
        assert r["tp"] == tp_b
        assert r["fp"] == n_b - tp_b
        assert r["fn"] == p_tot - tp_b
        assert abs(r["precision"] - tp_b / n_b) < 1e-12
        assert abs(r["f1"] - 2 * tp_b / (n_b + p_tot)) < 1e-12
        assert abs(r["average_precision"] - want_ap) < 1e-12


# ---------------------------------------------------------------------------
# q320 leave-one-source-out slope
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),     # source idx
            st.integers(min_value=1, max_value=20),    # word count
            st.integers(min_value=0, max_value=400),   # n_chars
        ),
        min_size=2,
        max_size=40,
    )
)
def test_loo_slope_matches_sufficient_stats(spark, tmp_path_factory, docs):
    rows = [
        (i, " ".join(["w"] * w), "en", f"s{s}", y)
        for i, (s, w, y) in enumerate(docs)
    ]
    sf = _docs_dir(tmp_path_factory.mktemp("loo"), rows)
    got = {
        r["source"]: r
        for r in registry()["q320_loo_source_influence"].fn(spark, sf).collect()
    }

    def slope(pts):
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        den = n * sxx - sx * sx
        return (n * sxy - sx * sy) / den if den > 0 else 0.0

    pts = [(w, y) for _, w, y in docs]
    want_all = slope(pts)
    for src in {f"s{s}" for s, _, _ in docs}:
        rest = [(w, y) for s, w, y in docs if f"s{s}" != src]
        assert abs(got[src]["slope_all"] - want_all) < 1e-12
        assert abs(got[src]["slope_loo"] - slope(rest)) < 1e-12
        assert got[src]["n_docs"] == sum(1 for s, _, _ in docs if f"s{s}" == src)


# ---------------------------------------------------------------------------
# q321 Shapley: exact equality with the permutation definition
# ---------------------------------------------------------------------------

_CH = ["click", "error", "signup", "view"]


@settings(max_examples=6, deadline=None)
@given(
    users=st.lists(
        st.tuples(
            st.sets(st.sampled_from(_CH), max_size=4),
            st.booleans(),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_shapley_matches_permutation_average(spark, tmp_path_factory, users):
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    for u, (chs, conv) in enumerate(users):
        for c in chs:
            rows.append((eid, t0, u, c, 1.0, None))
            eid += 1
        if conv:
            rows.append((eid, t0, u, "purchase", 1.0, None))
            eid += 1
    # a user with no events at all disappears — that matches the query
    sf = _events_dir(tmp_path_factory.mktemp("shap"), rows)
    out = {
        r["channel"]: r
        for r in registry()["q321_shapley_attribution"].fn(spark, sf).collect()
    }

    touched = [
        (frozenset(chs), conv)
        for (chs, conv) in users
        if chs or conv  # users with zero rows are invisible to the engine
    ]

    def v(S: frozenset) -> int:
        return sum(1 for m, conv in touched if conv and m <= S)

    total_conv = sum(1 for _, conv in touched if conv)
    want = {c: 0.0 for c in _CH}
    perms = list(itertools.permutations(_CH))
    for perm in perms:
        pre: set[str] = set()
        for c in perm:
            want[c] += v(frozenset(pre | {c})) - v(frozenset(pre))
            pre.add(c)
    for c in _CH:
        want[c] /= len(perms)
        assert abs(out[c]["shapley_conversions"] - want[c]) < 1e-9, (
            c, out[c]["shapley_conversions"], want[c]
        )
        assert out[c]["total_conversions"] == total_conv
    # efficiency axiom: the credits sum to v(full) - v(empty)
    got_sum = sum(out[c]["shapley_conversions"] for c in _CH)
    assert abs(got_sum - (v(frozenset(_CH)) - v(frozenset()))) < 1e-9


# ---------------------------------------------------------------------------
# q315 power iteration: exact equality with a straight-line integer ref
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None)
@given(
    vecs=st.lists(
        st.lists(st.integers(min_value=-60, max_value=60), min_size=4,
                 max_size=4),
        min_size=1,
        max_size=12,
    )
)
def test_power_iteration_matches_integer_reference(
    spark, tmp_path_factory, vecs
):
    rows = [(i, [k / 100.0 for k in ks], 0) for i, (ks) in enumerate(vecs)]
    sf = _emb_dir(tmp_path_factory.mktemp("pca"), rows)
    out = {
        r["dim_idx"]: r
        for r in registry()["q315_pca_power_iteration"].fn(spark, sf).collect()
    }

    d = 4
    q = [[round((k / 100.0) * 1000) for k in ks] for ks in vecs]
    gram = [
        [sum(row[i] * row[j] for row in q) for j in range(d)] for i in range(d)
    ]

    def tdiv(a: int, s: int) -> int:  # trunc toward zero, like Spark's div
        return -((-a) // s) if a < 0 else a // s

    def rescale(w):
        s = max(1, max(abs(x) for x in w) // 1024)
        return [tdiv(x, s) for x in w], s

    v = [sum(gram[i]) for i in range(d)]
    v, _ = rescale(v)
    for _ in range(2):
        v = [sum(gram[i][j] * v[j] for j in range(d)) for i in range(d)]
        v, _ = rescale(v)
    v3 = v
    w4 = [sum(gram[i][j] * v3[j] for j in range(d)) for i in range(d)]
    v4, s4 = rescale(w4)
    dn = sum(a * b for a, b in zip(v4, v3))
    dd = sum(a * a for a in v3)
    ma = max(abs(x) for x in v3)
    want_eig = (dn / dd) * s4 if dd > 0 else 0.0
    assert set(out) == set(range(1, d + 1))
    for i in range(d):
        want_loading = v3[i] / ma if ma > 0 else 0.0
        assert out[i + 1]["loading"] == pytest.approx(want_loading, abs=0.0), (
            i, out[i + 1]["loading"], want_loading
        )
        assert out[i + 1]["eig_estimate"] == pytest.approx(want_eig, abs=0.0)


# ---------------------------------------------------------------------------
# q322 A-ES weighted sample: exact selection equality with a hashlib ref
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.integers(min_value=0, max_value=5000),  # n_chars (0 tests the w>=1 guard)
        min_size=1,
        max_size=60,
    )
)
def test_weighted_sample_matches_hashlib_reference(
    spark, tmp_path_factory, docs
):
    import hashlib

    rows = [(i, "t", "en", "s0", n) for i, n in enumerate(docs)]
    sf = _docs_dir(tmp_path_factory.mktemp("aes"), rows)
    out = registry()["q322_weighted_priority_sample"].fn(spark, sf).collect()

    def prio(doc_id: int, n: int) -> int:
        h = int(
            hashlib.sha256(str(doc_id).encode()).hexdigest()[:15], 16
        )
        u = (h + 1.0) / 1152921504606846976.0
        return round(math.log(u) / float(max(1, n)) * 1e9)

    ref = sorted(
        ((prio(i, n), i, n) for i, n in enumerate(docs)),
        key=lambda t: (-t[0], t[1]),
    )[:100]
    assert [r["doc_id"] for r in out] == [i for _, i, _ in ref]
    assert [r["priority_nano"] for r in out] == [p for p, _, _ in ref]
    assert [r["w"] for r in out] == [max(1, n) for _, _, n in ref]


# ---------------------------------------------------------------------------
# q323 l-diversity / t-closeness vs direct recomputation
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),    # lang idx
            st.integers(min_value=0, max_value=2),    # source idx
            st.integers(min_value=0, max_value=599),  # n_chars
        ),
        min_size=1,
        max_size=50,
    )
)
def test_ldiversity_tcloseness_matches_bruteforce(
    spark, tmp_path_factory, docs
):
    langs = ["en", "es", "fr"]
    rows = [
        (i, "t", langs[la], f"s{s}", n) for i, (la, s, n) in enumerate(docs)
    ]
    sf = _docs_dir(tmp_path_factory.mktemp("ldiv"), rows)
    out = {
        (r["lang"], r["source"]): r
        for r in registry()["q323_ldiversity_tcloseness"].fn(spark, sf).collect()
    }

    buckets = sorted({n // 100 for _, _, n in docs})
    nb = len(buckets)
    n_total = len(docs)
    g = {b: sum(1 for _, _, n in docs if n // 100 == b) for b in buckets}
    classes = {(langs[la], f"s{s}") for la, s, _ in docs}
    assert set(out) == classes
    for lang, src in classes:
        vals = [
            n // 100
            for la, s, n in docs
            if langs[la] == lang and f"s{s}" == src
        ]
        n = len(vals)
        cnt = {b: vals.count(b) for b in set(vals)}
        # entropy with the same micro-rounding
        s_clnc = sum(c * round(math.log(c) * 1e6) for c in cnt.values())
        want_ent = (n * round(math.log(n) * 1e6) - s_clnc) / (n * 1e6)
        # EMD over ordered buckets, exact cross-multiplied integers
        cum_c = cum_g = 0
        emd_num = 0
        for rn, b in enumerate(buckets, start=1):
            cum_c += cnt.get(b, 0)
            cum_g += g[b]
            if rn < nb:
                emd_num += abs(cum_c * n_total - cum_g * n)
        want_t = (
            emd_num / (n * n_total * (nb - 1)) if nb > 1 else 0.0
        )
        r = out[(lang, src)]
        assert r["n_rows"] == n
        assert r["l_distinct"] == len(cnt)
        assert abs(r["entropy_l"] - want_ent) < 1e-12
        assert abs(r["t_closeness"] - want_t) < 1e-12


# ---------------------------------------------------------------------------
# q325 forecast backtest vs direct recomputation
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None)
@given(
    days=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=59),   # day offset
            st.integers(min_value=0, max_value=500),  # cents
        ),
        min_size=2,
        max_size=60,
    )
)
def test_forecast_backtest_matches_bruteforce(spark, tmp_path_factory, days):
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        (i, 1, "O", c / 100.0, t0 + pd.Timedelta(days=d), "1-URGENT")
        for i, (d, c) in enumerate(days)
    ]
    sf = _orders_dir(tmp_path_factory.mktemp("fc"), rows)
    out = registry()["q325_forecast_backtest"].fn(spark, sf).collect()

    daily: dict[int, int] = {}
    for d, c in days:
        daily[d] = daily.get(d, 0) + c
    max_d = max(daily)
    pairs = [
        (d, daily[d], daily[d - 7], d > max_d - 28)
        for d in daily
        if d - 7 in daily
    ]
    if not pairs:
        # sparse-series contract: a group with zero d-7 counterparts
        # emits no row at all
        assert out == []
        return
    assert len(out) == 1
    r = out[0]
    test = [(a, f) for _, a, f, t in pairs if t]
    ins = [(a, f) for _, a, f, t in pairs if not t]
    assert r["n_test"] == len(test)
    if test:
        smape = sum(
            _rhalf((2.0 * abs(a - f) / (a + f) if a + f > 0 else 0.0) * 1e6)
            for a, f in test
        ) / (len(test) * 1e6)
        assert abs(r["smape"] - smape) < 1e-12
        sae_t = sum(abs(a - f) for a, f in test)
        sae_i = sum(abs(a - f) for a, f in ins)
        want_mase = (
            (sae_t * len(ins)) / (len(test) * sae_i)
            if sae_i > 0 and ins
            else 0.0
        )
        assert abs(r["mase"] - want_mase) < 1e-12
        assert abs(
            r["bias_cents"] - sum(a - f for a, f in test) / len(test)
        ) < 1e-12
    else:
        assert r["smape"] == 0.0 and r["mase"] == 0.0


# ---------------------------------------------------------------------------
# q324 LOO target encoding vs direct per-row recomputation
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None)
@given(
    rows_in=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),    # category idx
            st.integers(min_value=0, max_value=900),  # cents
        ),
        min_size=1,
        max_size=50,
    )
)
def test_loo_target_encoding_matches_bruteforce(
    spark, tmp_path_factory, rows_in
):
    cats = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        (i, 1, "O", c / 100.0, t0, cats[k]) for i, (k, c) in enumerate(rows_in)
    ]
    sf = _orders_dir(tmp_path_factory.mktemp("loo2"), rows)
    out = {
        r["category"]: r
        for r in registry()["q324_loo_target_encoding"].fn(spark, sf).collect()
    }

    ys: dict[str, list[int]] = {}
    for k, c in rows_in:
        ys.setdefault(cats[k], []).append(c)
    gn = len(rows_in)
    gs = sum(c for _, c in rows_in)
    prior = gs / gn
    assert set(out) == set(ys)
    for cat, vals in ys.items():
        n, s = len(vals), sum(vals)
        loo = [
            _rhalf(((s - y) + 10.0 * prior) / (n - 1.0 + 10.0) * 1000)
            for y in vals
        ]
        r = out[cat]
        assert r["n_rows"] == n
        assert abs(r["naive_enc_cents"] - s / n) < 1e-12
        assert abs(r["avg_loo_enc_cents"] - sum(loo) / (n * 1e3)) < 1e-12
        assert abs(r["min_loo_enc_cents"] - min(loo) / 1e3) < 1e-12
        assert abs(r["max_loo_enc_cents"] - max(loo) / 1e3) < 1e-12


# ---------------------------------------------------------------------------
# q327 Brier decomposition vs direct recomputation + Murphy identity
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=600),  # cents -> value
            st.booleans(),                             # purchase?
        ),
        min_size=1,
        max_size=60,
    )
)
def test_brier_decomposition_matches_bruteforce(spark, tmp_path_factory, evs):
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        (i, t0, 1, "purchase" if y else "click", c / 100.0, None)
        for i, (c, y) in enumerate(evs)
    ]
    sf = _events_dir(tmp_path_factory.mktemp("brier"), rows)
    r = registry()["q327_brier_decomposition"].fn(spark, sf).collect()[0]

    bins: dict[int, list[int]] = {}
    for c, y in evs:
        k = min(19, math.floor((c / 100.0) / 30.0))
        bins.setdefault(k, []).append(1 if y else 0)
    n = len(evs)
    p = sum(1 for _, y in evs if y)
    brier_num = sum(
        sum(ys) * (2 * k + 1 - 40) ** 2 + (len(ys) - sum(ys)) * (2 * k + 1) ** 2
        for k, ys in bins.items()
    )
    rel_m = sum(
        _rhalf(((2 * k + 1) * len(ys) - 40 * sum(ys)) ** 2 / (1600.0 * len(ys)) * 1e6)
        for k, ys in bins.items()
    )
    res_m = sum(
        _rhalf(
            (sum(ys) * n - p * len(ys)) ** 2 / (len(ys) * float(n) * n) * 1e6
        )
        for k, ys in bins.items()
    )
    assert r["n_events"] == n
    assert abs(r["brier"] - brier_num / (1600.0 * n)) < 1e-12
    assert abs(r["reliability"] - rel_m / (n * 1e6)) < 1e-12
    assert abs(r["resolution"] - res_m / (n * 1e6)) < 1e-12
    assert abs(r["uncertainty"] - p * (n - p) / (float(n) * n)) < 1e-12
    # Murphy identity (exact at forecast grain, up to the micro rounding)
    assert abs(
        r["brier"] - (r["reliability"] - r["resolution"] + r["uncertainty"])
    ) < 2e-5
