"""Brute-force property tests for the round-6b statistical kernels:
each query's distributed formulation (distinct-score-grain AUC,
integer-gap KS argmax, rank-formula Gini, pairwise Mann-Kendall,
strict-timestamp windowFunnel) must equal a naive pure-Python
recomputation on adversarial random inputs — heavy ties included,
because ties are where every one of these kernels is easiest to get
wrong (average ranks, ECDF suprema, funnel successor semantics).

Inputs are written as per-example parquet dirs because the catalog
queries read ``{sf_dir}/{table}.parquet`` — the same seam the driver
and oracle harness use.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from aquiles_etl_pipeline_spark.relational import registry

# small domains force dense ties
CENTS = st.integers(min_value=0, max_value=12)
LABEL = st.booleans()


def _events_dir(tmpdir, rows):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    # Spark cannot read TIMESTAMP(NANOS) parquet — pin to microseconds
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    d = tmpdir / "sf"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "events.parquet", index=False)
    return str(d)


def _orders_dir(tmpdir, rows):
    pdf = pd.DataFrame(
        rows,
        columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                 "o_orderdate", "o_orderpriority"],
    )
    pdf["o_orderdate"] = pdf["o_orderdate"].astype("datetime64[us]")
    d = tmpdir / "sf"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "orders.parquet", index=False)
    return str(d)


@settings(max_examples=6, deadline=None)
@given(data=st.lists(st.tuples(CENTS, LABEL), min_size=2, max_size=40))
def test_exact_auc_matches_pairwise_bruteforce(spark, tmp_path_factory, data):
    # guarantee both classes exist
    data = list(data) + [(3, True), (5, False)]
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        (i, t0, 1, "purchase" if y else "click", c / 100.0, None)
        for i, (c, y) in enumerate(data)
    ]
    sf = _events_dir(tmp_path_factory.mktemp("auc"), rows)
    got = registry()["q261_exact_auc"].fn(spark, sf).collect()[0]
    pos = [c for c, y in data if y]
    neg = [c for c, y in data if not y]
    want = (
        sum(1.0 for p in pos for n in neg if p > n)
        + 0.5 * sum(1.0 for p in pos for n in neg if p == n)
    ) / (len(pos) * len(neg))
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    assert abs(got["auc"] - want) < 1e-8, f"{got['auc']} != {want}"


@settings(max_examples=6, deadline=None)
@given(
    wk=st.lists(CENTS, min_size=1, max_size=30),
    we=st.lists(CENTS, min_size=1, max_size=30),
)
def test_ks_two_sample_matches_bruteforce(spark, tmp_path_factory, wk, we):
    # Mon 2024-01-01 is weekday, Sat 2024-01-06 is weekend
    rows = [
        (i, i, "O", c / 100.0, pd.Timestamp("2024-01-01"), "1-URGENT")
        for i, c in enumerate(wk)
    ] + [
        (1000 + i, i, "O", c / 100.0, pd.Timestamp("2024-01-06"), "1-URGENT")
        for i, c in enumerate(we)
    ]
    sf = _orders_dir(tmp_path_factory.mktemp("ks"), rows)
    got = registry()["q267_ks_two_sample"].fn(spark, sf).collect()[0]
    vals = sorted(set(wk) | set(we))
    best = None
    for v in vals:
        f1 = sum(1 for x in wk if x <= v)
        f2 = sum(1 for x in we if x <= v)
        gap = abs(f1 * len(we) - f2 * len(wk))
        if best is None or gap > best[0]:
            best = (gap, v)
    assert got["n1"] == len(wk) and got["n2"] == len(we)
    assert got["at_value_cents"] == best[1]
    assert abs(got["d_stat"] - best[0] / (len(wk) * len(we))) < 1e-8


@settings(max_examples=6, deadline=None)
@given(bals=st.lists(st.integers(min_value=0, max_value=500), min_size=1,
                     max_size=40))
def test_gini_matches_rank_formula_bruteforce(spark, tmp_path_factory, bals):
    tmp = tmp_path_factory.mktemp("gini")
    d = tmp / "sf"
    d.mkdir()
    pd.DataFrame(
        [(i, f"c{i}", 0, b / 100.0, "SEG") for i, b in enumerate(bals)],
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    ).to_parquet(d / "customer.parquet", index=False)
    pd.DataFrame(
        [(0, "NATION0", 0)], columns=["n_nationkey", "n_name", "n_regionkey"]
    ).to_parquet(d / "nation.parquet", index=False)
    got = registry()["q253_gini_acctbal_by_nation"].fn(spark, str(d)).collect()[0]
    xs = sorted(bals)
    n, sx = len(xs), sum(xs)
    if sx == 0:
        assert got["gini"] is None
        return
    six = sum((i + 1) * x for i, x in enumerate(xs))
    want = (2 * six - (n + 1) * sx) / (n * sx)
    assert got["n_customers"] == n
    # the query rounds to 6 decimals
    assert abs(got["gini"] - want) < 1.1e-6


@settings(max_examples=6, deadline=None)
@given(daily=st.lists(st.integers(min_value=0, max_value=8), min_size=3,
                      max_size=25))
def test_mann_kendall_matches_pairwise_bruteforce(spark, tmp_path_factory, daily):
    rows = [
        (i, i, "O", c / 100.0,
         pd.Timestamp("2024-01-01") + pd.Timedelta(days=i), "1-URGENT")
        for i, c in enumerate(daily)
    ]
    sf = _orders_dir(tmp_path_factory.mktemp("mk"), rows)
    got = registry()["q265_mann_kendall_trend"].fn(spark, sf).collect()[0]
    n = len(daily)
    s = sum(
        (1 if daily[j] > daily[i] else -1 if daily[j] < daily[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tie_adj = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(daily).values() if t > 1
    )
    var = (n * (n - 1) * (2 * n + 5) - tie_adj) / 18.0
    want = 0.0 if s == 0 else (s - (1 if s > 0 else -1)) / math.sqrt(var)
    assert got["n_days"] == n and got["s_stat"] == s
    # the query rounds to 6 decimals
    assert abs(got["z_stat"] - want) < 1.1e-6


# strategies that force timestamp ties: seconds drawn from a tiny range
FUNNEL_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),        # user
        st.integers(min_value=0, max_value=8),        # ts second (dense ties)
        st.sampled_from(["view", "click", "purchase", "error"]),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(events=FUNNEL_EVENTS)
def test_window_funnel_matches_simulation(spark, tmp_path_factory, events):
    t0 = pd.Timestamp("2024-01-01")
    window_s = 1800
    rows = [
        (i, t0 + pd.Timedelta(seconds=sec * 600), u, typ, 1.0, None)
        for i, (u, sec, typ) in enumerate(events)
    ]
    sf = _events_dir(tmp_path_factory.mktemp("funnel"), rows)
    got = {
        r["level"]: r["n_users"]
        for r in registry()["q264_window_funnel"].fn(spark, sf).collect()
    }

    # simulate the strict-timestamp semantics per user
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, sec, typ in events:
        by_user[u].append((sec * 600, typ))
    want: dict[int, int] = defaultdict(int)
    for u, evs in by_user.items():
        views = [t for t, typ in evs if typ == "view"]
        clicks = sorted(t for t, typ in evs if typ == "click")
        purchases = sorted(t for t, typ in evs if typ == "purchase")
        if not views:
            continue
        level = 1
        for vt in views:
            nc = next((c for c in clicks if c > vt), None)
            lv = 1
            if nc is not None and nc <= vt + window_s:
                lv = 2
                np_ = next((p for p in purchases if p > nc), None)
                if np_ is not None and np_ <= vt + window_s:
                    lv = 3
            level = max(level, lv)
        want[level] += 1
    assert got == dict(want), f"{got} != {dict(want)}"


def test_auc_degenerate_single_class(spark, tmp_path_factory):
    """All-positive input: n_neg = 0 must yield NULL auc, not a crash
    or a garbage division."""
    t0 = pd.Timestamp("2024-01-01")
    rows = [(i, t0, 1, "purchase", 1.0, None) for i in range(5)]
    sf = _events_dir(tmp_path_factory.mktemp("aucdeg"), rows)
    got = registry()["q261_exact_auc"].fn(spark, sf).collect()[0]
    assert got["n_neg"] == 0 and got["auc"] is None


@settings(max_examples=6, deadline=None)
@given(daily=st.lists(st.tuples(st.integers(min_value=0, max_value=6),
                                st.integers(min_value=0, max_value=4)),
                      min_size=2, max_size=25))
def test_kendall_tau_b_matches_bruteforce(spark, tmp_path_factory, daily):
    """tau-b with heavy ties in both series: the standard adjustment
    counts pairs tied in x REGARDLESS of y (and vice versa)."""
    rows = []
    oid = 0
    for i, (rev, cnt) in enumerate(daily):
        day = pd.Timestamp("2024-01-01") + pd.Timedelta(days=i)
        # cnt+1 orders on the day; first carries the whole revenue
        for j in range(cnt + 1):
            rows.append((oid, 0, "O", (rev if j == 0 else 0) / 100.0, day,
                         "1-URGENT"))
            oid += 1
    sf = _orders_dir(tmp_path_factory.mktemp("tau"), rows)
    got = registry()["q283_kendall_tau_daily"].fn(spark, sf).collect()[0]
    pts = [(rev, cnt + 1) for rev, cnt in daily]
    c = d = tx = ty = 0
    n = len(pts)
    for i in range(n):
        for j in range(i + 1, n):
            dx = pts[j][0] - pts[i][0]
            dy = pts[j][1] - pts[i][1]
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
    n0 = n * (n - 1) // 2
    assert got["n0"] == n0 and got["concordant"] == c and got["discordant"] == d
    denom = (n0 - tx) * (n0 - ty)
    if denom <= 0:
        assert got["tau_b"] is None
    else:
        want = (c - d) / math.sqrt(denom)
        assert abs(got["tau_b"] - want) < 1.1e-6


@settings(max_examples=6, deadline=None)
@given(daily=st.lists(st.integers(min_value=0, max_value=4), min_size=2,
                      max_size=25))
def test_runs_test_matches_simulation(spark, tmp_path_factory, daily):
    rows = [
        (i, i, "O", c / 100.0,
         pd.Timestamp("2024-01-01") + pd.Timedelta(days=i), "1-URGENT")
        for i, c in enumerate(daily)
    ]
    sf = _orders_dir(tmp_path_factory.mktemp("runs"), rows)
    got = registry()["q282_runs_test"].fn(spark, sf).collect()[0]
    signs = []
    for prev, cur in zip(daily, daily[1:]):
        if cur > prev:
            signs.append(1)
        elif cur < prev:
            signs.append(-1)
    n_up = signs.count(1)
    n_down = signs.count(-1)
    n_runs = 0 if not signs else 1 + sum(
        1 for a, b in zip(signs, signs[1:]) if a != b
    )
    assert (got["n_up"], got["n_down"], got["n_runs"]) == (n_up, n_down, n_runs)
    if n_up > 0 and n_down > 0 and n_up + n_down > 1:
        mu = 2 * n_up * n_down / (n_up + n_down) + 1
        var = (mu - 1) * (mu - 2) / (n_up + n_down - 1)
        if var > 0:
            want = (n_runs - mu) / math.sqrt(var)
            assert abs(got["z_stat"] - want) < 1.1e-6
            return
    assert got["z_stat"] is None


def test_bigram_queries_tolerate_sub2_token_docs(spark, tmp_path_factory):
    """q269/q272 regression: a document with fewer than two tokens must
    contribute NO bigrams in BOTH engines — the greatest(len-1, 1)
    pseudo-gram made split(bg)[1] an ANSI out-of-bounds crash in Spark
    while DuckDB returned NULL (engine divergence on degenerate
    input)."""
    import duckdb

    tmp = tmp_path_factory.mktemp("sub2")
    d = tmp / "sf"
    d.mkdir()
    pd.DataFrame(
        [
            (0, "alpha beta alpha beta gamma beta alpha beta gamma beta",
             "en", "s1", 10),
            (1, "word", "en", "s1", 1),               # single token
            (2, "", "en", "s1", 0),                   # empty text
            (3, "alpha beta alpha beta alpha beta gamma beta alpha beta",
             "en", "s1", 10),
        ],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(d / "documents.parquet", index=False)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    for name in ("q269_kneser_ney_bigram", "q272_collocations_pmi"):
        spec = registry()[name]
        got = sorted(map(tuple, spec.fn(spark, str(d)).collect()))
        want = sorted(map(tuple, con.execute(spec.sql).fetchall()))
        assert len(got) == len(want), f"{name}: {len(got)} != {len(want)} rows"


# ---------------------------------------------------------------------------
# round-7 kernels
# ---------------------------------------------------------------------------

def _documents_dir(tmpdir, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf["n_chars"] = pdf["n_chars"].astype("int64")
    d = tmpdir / "sf"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _customer_dir(tmpdir, rows):
    import numpy as np

    pdf = pd.DataFrame(
        rows, columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                       "c_mktsegment"],
    )
    pdf["c_custkey"] = pdf["c_custkey"].astype("int64")
    pdf["c_nationkey"] = pdf["c_nationkey"].astype(np.int32)
    pdf["c_acctbal"] = pdf["c_acctbal"].astype("float64")
    d = tmpdir / "sf"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "customer.parquet", index=False)
    return str(d)


def _lineitem_dir(tmpdir, rows):
    import numpy as np

    pdf = pd.DataFrame(
        rows,
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    )
    for c in ("l_orderkey", "l_partkey", "l_suppkey"):
        pdf[c] = pdf[c].astype("int64")
    pdf["l_linenumber"] = pdf["l_linenumber"].astype(np.int32)
    for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"):
        pdf[c] = pdf[c].astype("float64")
    pdf["l_shipdate"] = pdf["l_shipdate"].astype("datetime64[us]")
    d = tmpdir / "sf"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "lineitem.parquet", index=False)
    return str(d)


@settings(max_examples=6, deadline=None)
@given(
    days=st.lists(st.integers(min_value=0, max_value=20), min_size=2, max_size=25),
    cents=st.lists(st.integers(min_value=0, max_value=500), min_size=2, max_size=25),
)
def test_theil_sen_matches_bruteforce_median_of_slopes(
    spark, tmp_path_factory, days, cents
):
    n = min(len(days), len(cents))
    days, cents = days[:n], cents[:n]
    days[1] = days[0] + 1  # guarantee >= 2 distinct days
    rows = [
        (i, 1, "O", c / 100.0, pd.Timestamp("1996-01-01") + pd.Timedelta(days=d),
         "1-URGENT")
        for i, (d, c) in enumerate(zip(days, cents))
    ]
    sf = _orders_dir(tmp_path_factory.mktemp("ts"), rows)
    got = registry()["q293_theil_sen_slope"].fn(spark, sf).collect()[0]
    daily = {}
    for d, c in zip(days, cents):
        daily[d] = daily.get(d, 0) + c
    ds = sorted(daily)
    slopes = sorted(
        (daily[d2] - daily[d1]) / (d2 - d1)
        for i, d1 in enumerate(ds)
        for d2 in ds[i + 1:]
    )
    p = len(slopes)
    want = (slopes[(p - 1) // 2] + slopes[p // 2]) / 2
    assert got["n_days"] == len(ds) and got["n_pairs"] == p
    # _rhalf, not Python's banker's round(): the query rounds the
    # micro-dollar value half away from zero (Spark/DuckDB round()).
    # Deferred import: test_round7b_property imports fixtures from here.
    from test_round7b_property import _rhalf

    assert abs(got["slope_dollars_per_day"] - _rhalf(want * 1e4) / 1e6) < 1e-9


@settings(max_examples=6, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=1, max_value=40), min_size=2, max_size=12),
)
def test_waterfill_matches_iterative_reference(spark, tmp_path_factory, toks):
    rows = [
        (i, " ".join(["w"] * k), "en", f"s{i:02d}", 5 * k)
        for i, k in enumerate(toks)
    ]
    sf = _documents_dir(tmp_path_factory.mktemp("wf"), rows)
    got = {
        r["source"]: r
        for r in registry()["q300_token_budget_waterfill"].fn(spark, sf).collect()
    }
    avail = {f"s{i:02d}": k for i, k in enumerate(toks)}
    total = sum(avail.values())
    budget = total // 2
    # iterative reference: saturate smallest inventories first
    items = sorted(avail.items(), key=lambda kv: (kv[1], kv[0]))
    remaining, level = budget, None
    for i, (_, a) in enumerate(items):
        t_cand = remaining / (len(items) - i)
        if t_cand <= a:
            level = t_cand
            break
        remaining -= a
    assert level is not None  # budget < total, so the level always lands
    for s, a in avail.items():
        want_alloc = a if a < level else level
        assert abs(got[s]["allocation"] - round(want_alloc, 4)) < 1e-9, (
            s, a, level, got[s]["allocation"]
        )
        assert got[s]["saturated"] == (a < level)
        assert got[s]["budget"] == budget


@settings(max_examples=6, deadline=None)
@given(
    cells=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # nationkey
            st.booleans(),                           # segment A/B
            st.integers(min_value=-5, max_value=5),  # balance dollars
        ),
        min_size=4,
        max_size=60,
    ),
)
def test_bh_and_holm_match_direct_stepwise_reference(
    spark, tmp_path_factory, cells
):
    rows = [
        (i, f"c{i}", nk, float(bal), "SEGA" if seg else "SEGB")
        for i, (nk, seg, bal) in enumerate(cells)
    ]
    sf = _customer_dir(tmp_path_factory.mktemp("bh"), rows)
    # direct python replication of the score + both stepwise procedures
    from collections import defaultdict

    counts = defaultdict(lambda: [0, 0])
    for nk, seg, bal in cells:
        key = (nk, "SEGA" if seg else "SEGB")
        counts[key][0] += 1
        counts[key][1] += 1 if bal < 0 else 0
    n_all = sum(v[0] for v in counts.values())
    k_all = sum(v[1] for v in counts.values())
    scored = []
    for (nk, seg), (n_c, neg) in counts.items():
        dd = float(neg * n_all - n_c * k_all) / float(n_all)
        scored.append((1.0 / (1.0 + (dd * dd) / float(n_c)), nk, seg))
    scored.sort()
    m = len(scored)
    khat = max(
        (i + 1 for i, (p, _, _) in enumerate(scored) if p <= (i + 1) * 0.1 / m),
        default=0,
    )
    bh_rej = {(nk, seg) for i, (p, nk, seg) in enumerate(scored) if i + 1 <= khat}
    first_fail = next(
        (i + 1 for i, (p, _, _) in enumerate(scored) if p > 0.1 / (m - i)),
        m + 1,
    )
    holm_rej = {
        (nk, seg) for i, (p, nk, seg) in enumerate(scored) if i + 1 < first_fail
    }
    got_bh = {
        (r["nationkey"], r["segment"])
        for r in registry()["q292_fdr_bh_selection"].fn(spark, sf).collect()
        if r["rejected"]
    }
    got_holm = {
        (r["nationkey"], r["segment"])
        for r in registry()["q310_holm_bonferroni"].fn(spark, sf).collect()
        if r["rejected"]
    }
    assert got_bh == bh_rej
    assert got_holm == holm_rej
    # Holm (FWER) can never reject MORE than BH (FDR) at the same alpha
    assert holm_rej <= bh_rej


@settings(max_examples=6, deadline=None)
@given(
    lens=st.lists(
        st.tuples(st.integers(min_value=0, max_value=1),   # source a/b
                  st.integers(min_value=1, max_value=30)), # n_chars
        min_size=2,
        max_size=40,
    ),
)
def test_quantile_normalization_matches_direct_lookup(
    spark, tmp_path_factory, lens
):
    rows = [
        (i, "t", "en", f"s{s}", n) for i, (s, n) in enumerate(lens)
    ]
    sf = _documents_dir(tmp_path_factory.mktemp("qn"), rows)
    got = {
        r["doc_id"]: r["norm_chars"]
        for r in registry()["q301_quantile_normalization"].fn(spark, sf).collect()
    }
    from collections import defaultdict

    n_total = len(rows)
    pooled = sorted((n, i) for i, (s, n) in enumerate(lens))
    by_source = defaultdict(list)
    for i, (s, n) in enumerate(lens):
        by_source[s].append((n, i))
    want = {}
    for s, docs in by_source.items():
        docs.sort()
        ns = len(docs)
        for r0, (n, i) in enumerate(docs, start=1):
            k = ((2 * r0 - 1) * n_total + 2 * ns - 1) // (2 * ns)
            want[i] = pooled[k - 1][0]
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    items=st.lists(
        st.tuples(st.integers(min_value=1, max_value=8),  # quantity
                  st.booleans()),                         # returned
        min_size=2,
        max_size=60,
    ),
)
def test_gini_split_matches_direct_impurity_scan(spark, tmp_path_factory, items):
    rows = [
        (i, 1, 1, 1, float(q), 1.0, 0.0, 0.0, "R" if ret else "N", "O",
         pd.Timestamp("1996-06-01"))
        for i, (q, ret) in enumerate(items)
    ]
    sf = _lineitem_dir(tmp_path_factory.mktemp("gini"), rows)
    got = {
        r["threshold"]: r
        for r in registry()["q304_gini_split_finder"].fn(spark, sf).collect()
    }
    from collections import Counter

    n_all = Counter()
    n_ret = Counter()
    for q, ret in items:
        n_all[q] += 1
        n_ret[q] += 1 if ret else 0
    qs = sorted(n_all)
    n = sum(n_all.values())
    r = sum(n_ret.values())
    nl = rl = 0
    want = {}
    for q in qs:
        nl += n_all[q]
        rl += n_ret[q]
        nr, rr = n - nl, r - rl
        if nl > 0 and nr > 0:
            pl, ql_ = rl / nl, (nl - rl) / nl
            pr, qr_ = rr / nr, (nr - rr) / nr
            g = (nl / n) * (1.0 - pl * pl - ql_ * ql_) + (nr / n) * (
                1.0 - pr * pr - qr_ * qr_
            )
        else:
            g = None
        want[q] = g
    valid = {q: g for q, g in want.items() if g is not None}
    best_t = min(valid, key=lambda q: (valid[q], q)) if valid else None
    for q in qs:
        if want[q] is None:
            assert got[q]["gini"] is None and not got[q]["is_best"]
        else:
            assert abs(got[q]["gini"] - round(want[q], 9)) < 1e-8
            assert got[q]["is_best"] == (q == best_t)
