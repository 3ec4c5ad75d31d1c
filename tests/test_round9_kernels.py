"""Round-9 regression tests: the shared postings kernel, the q347
empty-draw engine-parity fix, the q330 decimal-before-squaring fix, and
the adversarial-skew corpus builder.

The q347/q330 tests run the DuckDB oracle twin on the SAME degenerate /
adversarial parquet, so engine parity is asserted directly on exactly
the inputs the r08 ADVICE flagged — not just on the friendly driver
fixtures.
"""

from __future__ import annotations

import math
import re
import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

from aquiles_etl_pipeline_spark.llmdata.postings import (
    JAVA_WS_RE,
    doc_frequencies,
    positional_token_rows,
    presence_rows,
    term_frequencies,
    token_rows,
    weighted_postings,
)
from aquiles_etl_pipeline_spark.relational import registry
from test_round7b_property import _docs_dir, _events_dir

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


def _oracle(sf: str, sql: str, tables=("events",)) -> pd.DataFrame:
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    try:
        return con.execute(sql).df()
    finally:
        con.close()


# ---------------------------------------------------------------------------
# q347: degenerate null distributions must match the SQL twin
# ---------------------------------------------------------------------------

def test_q347_no_purchases_p_value_one(spark, tmp_path_factory):
    # zero purchase rows: the null-distribution frame is EMPTY, and the
    # r08 ADVICE showed the old crossJoin shape emitted p_value NULL
    # while the SQL twin emits (1+0)/(1+0) = 1.0
    t0 = pd.Timestamp("2024-01-01")
    rows = [(i, t0, i, "view", 1.0, None) for i in range(6)]
    sf = _events_dir(tmp_path_factory.mktemp("q347e"), rows)
    spec = registry()["q347_randomization_inference"]
    got = spec.fn(spark, sf).collect()
    want = _oracle(sf, spec.sql)
    assert len(got) == 1 and len(want) == 1
    assert got[0]["n_draws"] == int(want["n_draws"][0]) == 0
    assert got[0]["p_value"] == pytest.approx(1.0)
    assert want["p_value"][0] == pytest.approx(1.0)
    assert got[0]["observed_diff"] is None
    assert pd.isna(want["observed_diff"][0])


def test_q347_single_user_matches_oracle(spark, tmp_path_factory):
    # one user: every md5 draw has an empty arm, so every per-draw row
    # fails the c1>0 AND c0>0 filter — n_draws 0 again, but obs has a
    # one-sided mean (the other arm NULL) -> observed_diff NULL in both
    # engines and p_value exactly 1.0
    t0 = pd.Timestamp("2024-01-01")
    rows = [(i, t0, 7, "purchase", 2.5, None) for i in range(4)]
    sf = _events_dir(tmp_path_factory.mktemp("q347s"), rows)
    spec = registry()["q347_randomization_inference"]
    got = spec.fn(spark, sf).collect()
    want = _oracle(sf, spec.sql)
    assert got[0]["n_draws"] == int(want["n_draws"][0]) == 0
    assert got[0]["p_value"] == pytest.approx(1.0)
    assert want["p_value"][0] == pytest.approx(1.0)
    assert got[0]["observed_diff"] is None and pd.isna(want["observed_diff"][0])


# ---------------------------------------------------------------------------
# q330: cents squared must stay exact past the int64 wrap bound
# ---------------------------------------------------------------------------

def test_q330_exact_at_whale_values(spark, tmp_path_factory):
    # |cents| = 1e10 -> cents^2 = 1e20 > 2^63: a BIGINT square silently
    # wraps under non-ANSI Spark; the decimal-before-squaring fix keeps
    # the sufficient statistics exact.  Engine parity asserted against
    # the (identically fixed) SQL twin on the same parquet.
    t0 = pd.Timestamp("2024-01-01")
    t1 = pd.Timestamp("2024-01-20")  # post-period (>= 2024-01-16)
    rows = []
    eid = 0
    for user in (1, 3, 2, 4):  # odd = treated, even = control
        for ts in (t0, t1):
            for v in (1e8, 9.9e7, 7.5e7):  # $100M-scale purchase values
                rows.append((eid, ts, user, "purchase", v, None))
                eid += 1
    sf = _events_dir(tmp_path_factory.mktemp("q330w"), rows)
    spec = registry()["q330_did_estimator"]
    got = spec.fn(spark, sf).collect()[0].asDict()
    want = _oracle(sf, spec.sql).iloc[0].to_dict()
    assert set(got) == set(want)
    for k, v in want.items():
        if isinstance(v, float):
            assert got[k] == pytest.approx(v, rel=1e-12), k
        else:
            assert got[k] == v, k
    # the SE actually uses the squared sums — it must be finite and
    # positive here, proving the decimal path produced sane variance
    assert got["se_did"] is not None and got["se_did"] > 0


# ---------------------------------------------------------------------------
# postings kernel
# ---------------------------------------------------------------------------

def _tiny_docs(spark):
    return spark.createDataFrame(
        [
            (1, "  Apple banana apple ", "en", "web", 20),
            (2, "banana\tcherry", "en", "web", 13),
            (3, None, "en", "web", 0),
            (4, "", "en", "web", 0),
            (5, "cherry apple", "en", "book", 12),
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )


def test_token_rows_contract(spark):
    rows = sorted(
        (r["doc_id"], r["tok"]) for r in token_rows(_tiny_docs(spark), "doc_id").collect()
    )
    # NULL text -> no rows; empty text -> split('') = [''] dropped;
    # tokens lowercased; leading tab (not trimmed: SQL trim is
    # space-only) still yields clean tokens via the \s+ split
    assert rows == [
        (1, "apple"), (1, "apple"), (1, "banana"),
        (2, "banana"), (2, "cherry"),
        (5, "apple"), (5, "cherry"),
    ]


def test_positional_token_rows_keep_pre_drop_positions(spark):
    df = spark.createDataFrame(
        [(1, " x y", "en", "w", 4)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    # trim strips the leading space, so positions are 0-based over the
    # clean split; a doc whose raw split emits a leading empty token
    # (non-space whitespace edge) keeps the gap
    got = sorted(
        (r["pos"], r["tok"])
        for r in positional_token_rows(df, "doc_id").collect()
    )
    assert got == [(0, "x"), (1, "y")]
    df2 = spark.createDataFrame(
        [(1, "\tx y", "en", "w", 4)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    got2 = sorted(
        (r["pos"], r["tok"])
        for r in positional_token_rows(df2, "doc_id").collect()
    )
    assert got2 == [(1, "x"), (2, "y")]  # pos 0 was the dropped empty


def test_term_and_doc_frequencies(spark):
    tf = {
        (r["doc_id"], r["tok"]): r["c"]
        for r in term_frequencies(_tiny_docs(spark), "doc_id").collect()
    }
    assert tf[(1, "apple")] == 2 and tf[(2, "cherry")] == 1
    dfreq = {
        r["tok"]: r["df"]
        for r in doc_frequencies(
            presence_rows(_tiny_docs(spark), "doc_id")
        ).collect()
    }
    assert dfreq == {"apple": 2, "banana": 2, "cherry": 2}


def test_weighted_postings_matches_bruteforce(spark):
    docs = [
        (1, "a b c"), (2, "a b"), (3, "a c"), (4, "a d d"), (5, "b d e"),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "w", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    got = {
        (r["doc_id"], r["tok"]): r["w"]
        for r in weighted_postings(df, min_df=2, max_df=3).collect()
    }
    n = len(docs)
    tf: dict[tuple[int, str], int] = {}
    dfreq: dict[str, int] = {}
    for i, t in docs:
        toks = t.split()
        for tok in set(toks):
            dfreq[tok] = dfreq.get(tok, 0) + 1
        for tok in toks:
            tf[(i, tok)] = tf.get((i, tok), 0) + 1
    want = {
        (i, tok): c * round(math.log(n / dfreq[tok]) * 1e6)
        for (i, tok), c in tf.items()
        if 2 <= dfreq[tok] <= 3 and dfreq[tok] < n
    }
    assert got == want  # exact integer weights — 'a' (df=4) and 'e'
    # (df=1) fall outside the band


def test_java_ws_regex_matches_spark_split(spark):
    # exotic whitespace the corpus deliberately features (q317):
    # U+00A0/U+2009 are PYTHON-\s but not JAVA-\s — the shared
    # JAVA_WS_RE must tokenize exactly like Spark's split, and a
    # python-\s kernel would not
    texts = ["a b", "a b", "a \t b", "nfc café  x"]
    df = spark.createDataFrame(
        [(i, t, "en", "w", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    spark_toks = {}
    for r in token_rows(df, "doc_id").collect():
        spark_toks.setdefault(r["doc_id"], []).append(r["tok"])
    ws = re.compile(JAVA_WS_RE)
    for i, t in enumerate(texts):
        py = [x for x in ws.split(t.lower().strip(" ")) if x != ""]
        assert sorted(spark_toks.get(i, [])) == sorted(py), t


# ---------------------------------------------------------------------------
# adversarial-skew corpus builder
# ---------------------------------------------------------------------------

def test_skew_build_whales_fks_keeps_pks(tmp_path):
    import scale_stress as ss

    src = "/root/testdata/sf0.001"
    dst = tmp_path / "skewed"
    ss.build_scaled(src, dst, factor=3, skew=True)
    con = duckdb.connect()
    base_ev = con.execute(
        f"SELECT COUNT(*) FROM '{src}/events.parquet'"
    ).fetchone()[0]
    n_ev, n_eid = con.execute(
        f"SELECT COUNT(*), COUNT(DISTINCT event_id) FROM '{dst}/events.parquet'"
    ).fetchone()
    assert n_ev == 3 * base_ev
    assert n_eid == n_ev  # primary keys never whale
    whale = con.execute(
        f"SELECT MIN(c_custkey) FROM '{src}/customer.parquet'"
    ).fetchone()[0]
    share = con.execute(
        f"SELECT AVG(CASE WHEN user_id = {whale} THEN 1.0 ELSE 0.0 END) "
        f"FROM '{dst}/events.parquet'"
    ).fetchone()[0]
    assert 0.2 < share < 0.4  # ~30% of rows point at the whale key
    # referential integrity: every whaled l_partkey exists in part
    orphans = con.execute(
        f"SELECT COUNT(*) FROM '{dst}/lineitem.parquet' l "
        f"WHERE NOT EXISTS (SELECT 1 FROM '{dst}/part.parquet' p "
        f"WHERE p.p_partkey = l.l_partkey)"
    ).fetchone()[0]
    assert orphans == 0
    con.close()
