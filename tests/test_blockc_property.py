"""Brute-force property tests for the block-C grading rotation
(q01-q100 carriers last driver-graded r03, refactored repeatedly
since).  Each test generates tiny adversarial inputs with hypothesis
and checks the Spark query against an independent Python reference —
the cadence that caught q293's half-boundary divergence (r09 verdict
ask #5: property-test the rotation blocks before the driver does)."""

from __future__ import annotations

import hashlib
import math
import re
import unicodedata
from collections import Counter, defaultdict

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from aquiles_etl_pipeline_spark.relational import registry
from test_round7b_property import _docs_dir, _emb_dir, _events_dir, _rhalf

T0 = pd.Timestamp("2024-01-01")
CENTS = st.integers(min_value=0, max_value=100000)


def _star_dir(tmpdir, *, customer=None, orders=None, lineitem=None,
              nation=None, region=None):
    """Write any subset of the star schema into one sf dir."""
    d = tmpdir / "sf"
    d.mkdir(exist_ok=True)
    if customer is not None:
        pdf = pd.DataFrame(
            customer,
            columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                     "c_mktsegment"],
        )
        pdf["c_custkey"] = pdf["c_custkey"].astype("int64")
        pdf["c_nationkey"] = pdf["c_nationkey"].astype("int64")
        pdf["c_acctbal"] = pdf["c_acctbal"].astype("float64")
        pdf.to_parquet(d / "customer.parquet", index=False)
    if orders is not None:
        pdf = pd.DataFrame(
            orders,
            columns=["o_orderkey", "o_custkey", "o_orderstatus",
                     "o_totalprice", "o_orderdate", "o_orderpriority"],
        )
        pdf["o_orderkey"] = pdf["o_orderkey"].astype("int64")
        pdf["o_custkey"] = pdf["o_custkey"].astype("int64")
        pdf["o_orderdate"] = pdf["o_orderdate"].astype("datetime64[us]")
        pdf.to_parquet(d / "orders.parquet", index=False)
    if lineitem is not None:
        pdf = pd.DataFrame(lineitem, columns=["l_orderkey", "l_shipdate"])
        pdf["l_orderkey"] = pdf["l_orderkey"].astype("int64")
        pdf["l_shipdate"] = pdf["l_shipdate"].astype("datetime64[us]")
        pdf.to_parquet(d / "lineitem.parquet", index=False)
    if nation is not None:
        pdf = pd.DataFrame(
            nation, columns=["n_nationkey", "n_regionkey", "n_name"]
        )
        pdf["n_nationkey"] = pdf["n_nationkey"].astype("int64")
        pdf["n_regionkey"] = pdf["n_regionkey"].astype("int64")
        pdf.to_parquet(d / "nation.parquet", index=False)
    if region is not None:
        pdf = pd.DataFrame(region, columns=["r_regionkey", "r_name"])
        pdf["r_regionkey"] = pdf["r_regionkey"].astype("int64")
        pdf.to_parquet(d / "region.parquet", index=False)
    return str(d)


# ---------------------------------------------------------------------------
# q03 top customers
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    orders=st.lists(
        st.tuples(st.integers(min_value=1, max_value=8), CENTS),
        min_size=1, max_size=40,
    )
)
def test_q03_top_customers_matches_bruteforce(spark, tmp_path_factory, orders):
    custs = [(k, f"Customer#{k}", k % 3, 0.0, "BUILDING") for k in range(1, 9)]
    orows = [
        (i, ck, "O", c / 100.0, T0, "1-URGENT")
        for i, (ck, c) in enumerate(orders)
    ]
    sf = _star_dir(tmp_path_factory.mktemp("q03"), customer=custs, orders=orows)
    got = [
        (r["c_custkey"], r["c_name"], r["total_spent"], r["order_count"])
        for r in registry()["q03_top_customers"].fn(spark, sf).collect()
    ]
    spent: dict[int, int] = Counter()
    cnt: dict[int, int] = Counter()
    for ck, c in orders:
        spent[ck] += c
        cnt[ck] += 1
    want = sorted(
        ((k, f"Customer#{k}", spent[k] / 100, cnt[k]) for k in spent),
        key=lambda t: (-t[2], t[0]),
    )[:10]
    assert got == want


# ---------------------------------------------------------------------------
# q04 order priority (EXISTS semi-join)
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    orders=st.lists(
        st.tuples(st.integers(min_value=0, max_value=5),   # orderdate day
                  st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM"])),
        min_size=1, max_size=20,
    ),
    ships=st.lists(
        st.tuples(st.integers(min_value=0, max_value=25),  # orderkey
                  st.integers(min_value=0, max_value=6)),  # shipdate day
        min_size=0, max_size=40,
    ),
)
def test_q04_order_priority_matches_bruteforce(
    spark, tmp_path_factory, orders, ships
):
    orows = [
        (i, 1, "O", 1.0, T0 + pd.Timedelta(days=d), pri)
        for i, (d, pri) in enumerate(orders)
    ]
    lrows = [(ok, T0 + pd.Timedelta(days=d)) for ok, d in ships]
    sf = _star_dir(tmp_path_factory.mktemp("q04"), orders=orows, lineitem=lrows)
    got = {
        r["o_orderpriority"]: r["order_count"]
        for r in registry()["q04_order_priority"].fn(spark, sf).collect()
    }
    odate = {i: d for i, (d, _) in enumerate(orders)}
    late = {ok for ok, d in ships if ok in odate and d > odate[ok]}
    want: dict[str, int] = Counter()
    for i, (_, pri) in enumerate(orders):
        if i in late:
            want[pri] += 1
    assert got == dict(want)


# ---------------------------------------------------------------------------
# q05 rank window (top-3 per nation, deterministic tiebreak)
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    custs=st.lists(
        st.tuples(st.integers(min_value=0, max_value=2),       # nation
                  st.integers(min_value=-5, max_value=5)),     # acctbal (ties!)
        min_size=1, max_size=25,
    )
)
def test_q05_rank_window_matches_bruteforce(spark, tmp_path_factory, custs):
    crows = [
        (i, f"c{i}", nk, float(b), "AUTO") for i, (nk, b) in enumerate(custs)
    ]
    sf = _star_dir(tmp_path_factory.mktemp("q05"), customer=crows)
    got = sorted(
        (r["c_custkey"], r["c_nationkey"], r["acctbal"], r["rnk"])
        for r in registry()["q05_customer_rank_window"].fn(spark, sf).collect()
    )
    by_nation: dict[int, list] = defaultdict(list)
    for i, (nk, b) in enumerate(custs):
        by_nation[nk].append((i, float(b)))
    want = []
    for nk, members in by_nation.items():
        # RANK over (acctbal DESC, custkey): ordering key is unique, so
        # rank == position
        members.sort(key=lambda t: (-t[1], t[0]))
        for pos, (ck, b) in enumerate(members[:3], start=1):
            want.append((ck, nk, b, pos))
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# q06 rollup region -> nation -> grand total
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    orders=st.lists(
        st.tuples(st.integers(min_value=0, max_value=5), CENTS),
        min_size=1, max_size=30,
    )
)
def test_q06_rollup_matches_bruteforce(spark, tmp_path_factory, orders):
    regions = [(0, "AMERICA"), (1, "ASIA")]
    nations = [(n, n % 2, f"NATION{n}") for n in range(4)]
    custs = [(k, f"c{k}", k % 4, 0.0, "AUTO") for k in range(6)]
    orows = [
        (i, ck, "O", c / 100.0, T0, "1-URGENT")
        for i, (ck, c) in enumerate(orders)
    ]
    sf = _star_dir(
        tmp_path_factory.mktemp("q06"),
        customer=custs, orders=orows, nation=nations, region=regions,
    )
    got = sorted(
        (r["r_name"] or "", r["n_name"] or "", r["order_count"],
         r["total_price"])
        for r in registry()["q06_rollup_region_nation"].fn(spark, sf).collect()
    )
    per_rn: dict[tuple[str, str], list[int]] = defaultdict(lambda: [0, 0])
    for i, (ck, c) in enumerate(orders):
        nk = ck % 4
        rname = "AMERICA" if nk % 2 == 0 else "ASIA"
        nname = f"NATION{nk}"
        per_rn[(rname, nname)][0] += 1
        per_rn[(rname, nname)][1] += c
    want = []
    for (rn, nn), (n, cents) in per_rn.items():
        want.append((rn, nn, n, cents / 100))
    per_r: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for (rn, _), (n, cents) in per_rn.items():
        per_r[rn][0] += n
        per_r[rn][1] += cents
    for rn, (n, cents) in per_r.items():
        want.append((rn, "", n, cents / 100))
    want.append(("", "", sum(n for n, _ in per_r.values()),
                 sum(c for _, c in per_r.values()) / 100))
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# q37 errors followed by clicks (interval count join)
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    events=st.lists(
        st.tuples(st.integers(min_value=0, max_value=3),        # user
                  st.integers(min_value=0, max_value=7200),     # second
                  st.sampled_from(["error", "click", "view"])),
        min_size=1, max_size=40,
    )
)
def test_q37_interval_count_matches_bruteforce(
    spark, tmp_path_factory, events
):
    rows = [
        (i, T0 + pd.Timedelta(seconds=s), u, et, 1.0, None)
        for i, (u, s, et) in enumerate(events)
    ]
    sf = _events_dir(tmp_path_factory.mktemp("q37"), rows)
    got = sorted(
        (r["event_id"], r["n_in_window"])
        for r in registry()["q37_errors_followed_by_clicks"].fn(spark, sf).collect()
    )
    clicks = [(u, s) for u, s, et in events if et == "click"]
    want = sorted(
        (i, sum(1 for cu, cs in clicks if cu == u and s < cs <= s + 3600))
        for i, (u, s, et) in enumerate(events)
        if et == "error"
    )
    assert got == want


# ---------------------------------------------------------------------------
# q68 approx percentile vs exact band
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    vals=st.lists(CENTS, min_size=1, max_size=40),
)
def test_q68_exact_p95_matches_bruteforce(spark, tmp_path_factory, vals):
    rows = [
        (i, T0, 0, "view", c / 100.0, None) for i, c in enumerate(vals)
    ]
    sf = _events_dir(tmp_path_factory.mktemp("q68"), rows)
    got = registry()["q68_approx_percentile_sketch"].fn(spark, sf).collect()
    assert len(got) == 1 and got[0]["event_type"] == "view"
    # NOTE: approx_within_rank_band is intentionally NOT asserted here —
    # the +/-1.5%-RANK band is a VALUE interval, and on tiny/sparse
    # inputs (n=2, values 0 and 1000) the sketch's returned element sits
    # outside the interpolated band by construction.  The contract is a
    # corpus-scale one; the graded corpora assert it via the oracle's
    # literal TRUE.  The exact-percentile arithmetic is what this test
    # pins.
    s = sorted(c / 100.0 for c in vals)
    pos = (len(s) - 1) * 0.95
    lo = math.floor(pos)
    hi = min(lo + 1, len(s) - 1)
    want = s[lo] + (s[hi] - s[lo]) * (pos - lo)
    assert got[0]["exact_p95"] == pytest.approx(_rhalf(want * 1e6) / 1e6,
                                                abs=2e-6)


# ---------------------------------------------------------------------------
# q71 unicode NFC dedup keys
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=["a", "e", "́", "̀", "Å",
                      "Å", "é", " ", "z"],
            min_size=0, max_size=12,
        ),
        min_size=1, max_size=10,
    )
)
def test_q71_nfc_matches_python_unicodedata(spark, tmp_path_factory, texts):
    rows = [(i, t, "en", "w", len(t)) for i, t in enumerate(texts)]
    sf = _docs_dir(tmp_path_factory.mktemp("q71"), rows)
    got = sorted(
        (r["doc_id"], r["nfc_sha256"], r["n_chars_nfc"])
        for r in registry()["q71_unicode_nfc_dedup_keys"].fn(spark, sf).collect()
    )
    want = []
    for i, t in enumerate(texts):
        norm = unicodedata.normalize("NFC", t + " nfc:café Å")
        want.append(
            (i, hashlib.sha256(norm.encode("utf-8")).hexdigest(), len(norm))
        )
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# q74 corpus datacard
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.text(alphabet=["a", "b", " ", "\t"], min_size=0, max_size=15),
            st.sampled_from(["en", "zh"]),
            st.sampled_from(["s1", "s2", "s3"]),
        ),
        min_size=1, max_size=20,
    )
)
def test_q74_datacard_matches_bruteforce(spark, tmp_path_factory, docs):
    rows = [
        (i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(docs)
    ]
    sf = _docs_dir(tmp_path_factory.mktemp("q74"), rows)
    got = registry()["q74_corpus_datacard"].fn(spark, sf).collect()[0]
    # trim in BOTH engines strips 0x20 only (not \t) — mirror that,
    # not Python's all-whitespace str.strip()
    toks = [len(re.split(r"\s+", t.strip(" "))) for t, _, _ in docs]
    shas = {
        hashlib.sha256(
            re.sub(r"\s+", " ", t.strip(" ").lower()).encode()
        ).hexdigest()
        for t, _, _ in docs
    }
    n = len(docs)
    assert got["n_docs"] == n
    assert got["total_tokens"] == sum(toks)
    assert got["n_langs"] == len({l for _, l, _ in docs})
    assert got["n_sources"] == len({s for _, _, s in docs})
    assert got["mean_doc_tokens"] == pytest.approx(sum(toks) / n, abs=1e-12)
    assert (got["min_doc_tokens"], got["max_doc_tokens"]) == (min(toks), max(toks))
    assert got["n_exact_dup_docs"] == n - len(shas)
    assert got["exact_dup_rate"] == pytest.approx((n - len(shas)) / n, abs=1e-12)


# ---------------------------------------------------------------------------
# q77 URL dedup
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    ids=st.sets(st.integers(min_value=0, max_value=50), min_size=1, max_size=30)
)
def test_q77_url_dedup_matches_arithmetic_groups(spark, tmp_path_factory, ids):
    rows = [(i, "t", "en", "w", 1) for i in sorted(ids)]
    sf = _docs_dir(tmp_path_factory.mktemp("q77"), rows)
    got = sorted(
        r["doc_id"] for r in registry()["q77_url_dedup"].fn(spark, sf).collect()
    )
    groups: dict[int, int] = {}
    for i in ids:
        groups[i // 3] = min(groups.get(i // 3, i), i)
    assert got == sorted(groups.values())


# ---------------------------------------------------------------------------
# q79 embedding quality stats
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    vecs=st.lists(
        st.tuples(
            st.sampled_from(["good", "bad"]),
            st.lists(st.integers(min_value=-4, max_value=4),
                     min_size=3, max_size=3),
        ),
        min_size=1, max_size=20,
    )
)
def test_q79_quality_stats_match_bruteforce(spark, tmp_path_factory, vecs):
    rows = [
        (i, [float(x) for x in v], lab) for i, (lab, v) in enumerate(vecs)
    ]
    sf = _emb_dir(tmp_path_factory.mktemp("q79"), rows)
    got = {
        r["label"]: r
        for r in registry()["q79_embedding_quality_stats"].fn(spark, sf).collect()
    }
    by_label: dict[str, list[int]] = defaultdict(list)
    for lab, v in vecs:
        micro = _rhalf(math.sqrt(sum(x * x for x in v)) * 1e6)
        by_label[lab].append(micro)
    assert set(got) == set(by_label)
    for lab, micros in by_label.items():
        r = got[lab]
        assert r["n_vectors"] == len(micros)
        assert r["mean_norm"] == pytest.approx(
            (sum(micros) / 1e6) / len(micros), abs=1e-12
        )
        assert r["min_norm"] == min(micros) / 1e6
        assert r["max_norm"] == max(micros) / 1e6
        assert r["n_zero_vectors"] == sum(1 for m in micros if m == 0)


# ---------------------------------------------------------------------------
# q70 HTML extraction — engine symmetry on adversarial text
# ---------------------------------------------------------------------------

def test_q70_html_extraction_matches_oracle_on_adversarial_text(
    spark, tmp_path_factory
):
    """Text containing angle brackets, entities, and whitespace runs must
    extract identically in both engines (the regexp chains are written
    twice — this pins them to each other on inputs the sf corpora
    don't contain)."""
    import duckdb

    tmp = tmp_path_factory.mktemp("q70adv")
    d = tmp / "sf"
    d.mkdir()
    texts = [
        "plain words",
        "a <b>bold</b> claim",          # tag-like content inside text
        "x &amp; y &lt;= z",            # entities inside text
        "  spaced\t\tout   ",
        "",
    ]
    pd.DataFrame(
        [(i, t, "en", "w", len(t)) for i, t in enumerate(texts)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(d / "documents.parquet", index=False)
    spec = registry()["q70_html_text_extraction"]
    got = sorted(map(tuple, spec.fn(spark, str(d)).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    want = sorted(map(tuple, con.execute(spec.sql).fetchall()))
    assert got == want


# ---------------------------------------------------------------------------
# Block-D spillover (r11 rotation head): q110, q143 — the only two
# block-D carriers without an independent reference test
# ---------------------------------------------------------------------------

@settings(max_examples=4, deadline=None)
@given(
    ids=st.sets(st.integers(min_value=0, max_value=3000), min_size=1,
                max_size=15)
)
def test_q110_resize_geometry_matches_integer_reference(
    spark, tmp_path_factory, ids
):
    rows = [(i, "t", "en", "w", 1) for i in sorted(ids)]
    sf = _docs_dir(tmp_path_factory.mktemp("q110"), rows)
    got = sorted(
        map(tuple, registry()["q110_image_resize_geometry"].fn(spark, sf).collect())
    )
    want = []
    for i in sorted(ids):
        w, h = 16 + i % 480, 16 + (i * 7) % 480
        m = max(w, h)
        if m <= 64:
            tw, th = w, h
        else:
            tw, th = max(1, w * 64 // m), max(1, h * 64 // m)
        want.append((i, w, h, tw, th))
    assert got == sorted(want)


@settings(max_examples=5, deadline=None)
@given(
    events=st.lists(st.integers(min_value=0, max_value=6), min_size=1,
                    max_size=40)
)
def test_q143_skew_report_matches_bruteforce(spark, tmp_path_factory, events):
    rows = [
        (i, pd.Timestamp("2024-01-01"), u, "view", 1.0, None)
        for i, u in enumerate(events)
    ]
    sf = _events_dir(tmp_path_factory.mktemp("q143"), rows)
    got = registry()["q143_join_key_skew_report"].fn(spark, sf).collect()[0]
    cnt = Counter(events)
    n_rows = len(events)
    ordered = sorted(cnt.items(), key=lambda kv: (kv[1], kv[0]))
    weighted = sum((i + 1) * c for i, (_, c) in enumerate(ordered))
    n_keys = len(cnt)
    gini = 2.0 * weighted / (n_keys * n_rows) - (n_keys + 1.0) / n_keys
    assert got["n_keys"] == n_keys and got["n_rows"] == n_rows
    assert got["max_cnt"] == max(cnt.values())
    assert got["top1_share"] == pytest.approx(
        _rhalf(max(cnt.values()) / n_rows * 1e6) / 1e6, abs=2e-6
    )
    assert got["gini"] == pytest.approx(_rhalf(gini * 1e6) / 1e6, abs=2e-6)
