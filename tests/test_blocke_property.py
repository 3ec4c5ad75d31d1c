"""Brute-force property tests for block-E rotation carriers (q07-q53
refresh + q144-q150, queued for the r12 driver re-grade) — written one
round AHEAD of their rotation slot so the driver never re-grades a
carrier the local suite hasn't brute-forced (the q293 lesson)."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from aquiles_etl_pipeline_spark.relational import registry
from test_round7b_property import _docs_dir, _events_dir

T0 = pd.Timestamp("2024-01-01")
CENTS = st.integers(min_value=0, max_value=100000)


def _orders_dir(tmpdir, rows):
    pdf = pd.DataFrame(
        rows,
        columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                 "o_orderdate", "o_orderpriority"],
    )
    pdf["o_orderkey"] = pdf["o_orderkey"].astype("int64")
    pdf["o_custkey"] = pdf["o_custkey"].astype("int64")
    pdf["o_orderdate"] = pdf["o_orderdate"].astype("datetime64[us]")
    d = tmpdir / "sf"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "orders.parquet", index=False)
    return str(d)


def _lineitem_dir(tmpdir, rows):
    pdf = pd.DataFrame(
        rows, columns=["l_returnflag", "l_linestatus", "l_quantity"]
    )
    pdf["l_quantity"] = pdf["l_quantity"].astype("float64")
    d = tmpdir / "sf"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "lineitem.parquet", index=False)
    return str(d)


# ---------------------------------------------------------------------------
# q12 sessionization (30-min gap)
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    events=st.lists(
        st.tuples(st.integers(min_value=0, max_value=2),      # user
                  st.integers(min_value=0, max_value=7200)),  # second
        min_size=1, max_size=40,
    )
)
def test_q12_sessions_match_bruteforce(spark, tmp_path_factory, events):
    rows = [
        (i, T0 + pd.Timedelta(seconds=s), u, "view", 1.0, None)
        for i, (u, s) in enumerate(events)
    ]
    sf = _events_dir(tmp_path_factory.mktemp("q12"), rows)
    got = {
        r["user_id"]: r["session_count"]
        for r in registry()["q12_event_sessions"].fn(spark, sf).collect()
    }
    per_user: dict[int, list] = defaultdict(list)
    for i, (u, s) in enumerate(events):
        per_user[u].append((s, i))
    want = {}
    for u, evs in per_user.items():
        evs.sort()
        sessions, prev = 0, None
        for s, _ in evs:
            if prev is None or s - prev > 1800:
                sessions += 1
            prev = s
        want[u] = sessions
    assert got == want


# ---------------------------------------------------------------------------
# q36 as-of join (click -> latest error at-or-before)
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    clicks=st.lists(
        st.tuples(st.integers(min_value=0, max_value=2),
                  st.integers(min_value=0, max_value=100)),
        min_size=1, max_size=20,
    ),
    errors=st.sets(
        st.tuples(st.integers(min_value=0, max_value=2),
                  st.integers(min_value=0, max_value=100)),
        min_size=0, max_size=20,
    ),
)
def test_q36_asof_matches_bruteforce(spark, tmp_path_factory, clicks, errors):
    # error ts unique per user (the set strategy): the as-of match is
    # unambiguous, so engines cannot legally disagree on the value
    rows = [
        (i, T0 + pd.Timedelta(seconds=s), u, "click", 1.0, None)
        for i, (u, s) in enumerate(clicks)
    ]
    rows += [
        (1000 + i, T0 + pd.Timedelta(seconds=s), u, "error", (i + 1) * 1.0, None)
        for i, (u, s) in enumerate(sorted(errors))
    ]
    sf = _events_dir(tmp_path_factory.mktemp("q36"), rows)
    got = {
        r["event_id"]: (r["asof_error_ts"], r["asof_error_value"])
        for r in registry()["q36_asof_click_to_error"].fn(spark, sf).collect()
    }
    errs: dict[int, list] = defaultdict(list)
    for i, (u, s) in enumerate(sorted(errors)):
        errs[u].append((s, (i + 1) * 1.0))
    want = {}
    for i, (u, s) in enumerate(clicks):
        cand = [(es, ev) for es, ev in errs.get(u, []) if es <= s]
        if cand:
            es, ev = max(cand)
            want[i] = (T0 + pd.Timedelta(seconds=es), ev)
        else:
            want[i] = (None, None)
    assert len(got) == len(clicks)
    for i, (ts, v) in want.items():
        gts, gv = got[i]
        assert gv == v
        assert (gts is None) == (ts is None)
        if ts is not None:
            assert pd.Timestamp(gts) == ts


# ---------------------------------------------------------------------------
# q38 CUBE / q43 GROUPING SETS / q44 pivot
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    orders=st.lists(
        st.tuples(st.sampled_from(["F", "O", "P"]),
                  st.sampled_from(["1-URGENT", "2-HIGH"]), CENTS),
        min_size=1, max_size=30,
    )
)
def test_q38_cube_matches_bruteforce(spark, tmp_path_factory, orders):
    rows = [
        (i, 1, stat, c / 100.0, T0, pri)
        for i, (stat, pri, c) in enumerate(orders)
    ]
    sf = _orders_dir(tmp_path_factory.mktemp("q38"), rows)
    got = sorted(
        (r["o_orderstatus"] or "", r["o_orderpriority"] or "",
         r["n_orders"], r["total_price"])
        for r in registry()["q38_cube_status_priority"].fn(spark, sf).collect()
    )
    cells: dict[tuple, list] = defaultdict(lambda: [0, 0])
    for stat, pri, c in orders:
        for key in ((stat, pri), (stat, ""), ("", pri), ("", "")):
            cells[key][0] += 1
            cells[key][1] += c
    want = sorted(
        (s, p, n, cents / 100) for (s, p), (n, cents) in cells.items()
    )
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    items=st.lists(
        st.tuples(st.sampled_from(["A", "N", "R"]),
                  st.sampled_from(["F", "O"]),
                  st.integers(min_value=0, max_value=5000)),
        min_size=1, max_size=30,
    )
)
def test_q43_grouping_sets_match_bruteforce(spark, tmp_path_factory, items):
    rows = [(rf, ls, q / 100.0) for rf, ls, q in items]
    sf = _lineitem_dir(tmp_path_factory.mktemp("q43"), rows)
    got = sorted(
        (r["flag"], r["status"], r["sum_qty"], r["n"])
        for r in registry()["q43_grouping_sets_returns"].fn(spark, sf).collect()
    )
    cells: dict[tuple, list] = defaultdict(lambda: [0, 0])
    for rf, ls, q in items:
        for key in ((rf, ls), (rf, "ALL"), ("ALL", "ALL")):
            cells[key][0] += q
            cells[key][1] += 1
    want = sorted((f, s, q / 100, n) for (f, s), (q, n) in cells.items())
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    orders=st.lists(
        st.tuples(st.sampled_from(["F", "O", "P"]),
                  st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM"])),
        min_size=1, max_size=30,
    )
)
def test_q44_pivot_matches_bruteforce(spark, tmp_path_factory, orders):
    rows = [
        (i, 1, stat, 1.0, T0, pri) for i, (stat, pri) in enumerate(orders)
    ]
    sf = _orders_dir(tmp_path_factory.mktemp("q44"), rows)
    got = {
        r["o_orderpriority"]: (r["n_f"], r["n_o"], r["n_p"])
        for r in registry()["q44_order_status_pivot"].fn(spark, sf).collect()
    }
    cnt: dict[str, Counter] = defaultdict(Counter)
    for stat, pri in orders:
        cnt[pri][stat] += 1
    want = {
        pri: (c.get("F", 0), c.get("O", 0), c.get("P", 0))
        for pri, c in cnt.items()
    }
    assert got == want


# ---------------------------------------------------------------------------
# q17 exact dedup by content hash
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    texts=st.lists(st.sampled_from(["aa", "bb", "cc", "dd", ""]),
                   min_size=1, max_size=25)
)
def test_q17_exact_dedup_matches_bruteforce(spark, tmp_path_factory, texts):
    rows = [(i, t, "en", "w", len(t)) for i, t in enumerate(texts)]
    sf = _docs_dir(tmp_path_factory.mktemp("q17"), rows)
    got = sorted(
        (r["text_hash"], r["keep_doc_id"], r["dup_count"])
        for r in registry()["q17_doc_dedup_exact"].fn(spark, sf).collect()
    )
    groups: dict[str, list] = defaultdict(list)
    for i, t in enumerate(texts):
        groups[hashlib.sha256(t.encode()).hexdigest()].append(i)
    want = sorted((h, min(ids), len(ids)) for h, ids in groups.items())
    assert got == want
