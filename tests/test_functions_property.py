"""Property-based parity tests: the engine's Column expressions vs an
independent Python re-statement of the reference's documented transform
semantics (SURVEY.md §2.3, citing /root/reference/core/data_processor.py
by line).  Golden tests pin the known cases; hypothesis sweeps the
input space — mixed scripts, stray separators, camel-case boundaries,
empty/whitespace strings — where regex-dialect or title-case
divergences would hide.

Each example generates a BATCH of strings and runs ONE Spark job over
it, so hypothesis' example count doesn't multiply job-scheduling
overhead.
"""

from __future__ import annotations

import re
from decimal import Decimal, InvalidOperation

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from aquiles_etl_pipeline_spark.functions import exact, scalar

# printable BMP text biased toward the messy-price-list alphabet
ALPHABET = st.sampled_from(
    list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")
    + list(" .,$/%()xX-_@#¹²*áéíñÁÉÍÑü ")
)
TEXTS = st.lists(st.text(ALPHABET, max_size=40), min_size=1, max_size=200)


def _run(spark, texts, col_fn):
    df = spark.createDataFrame([(t,) for t in texts], ["s"])
    return [r["out"] for r in df.select(col_fn(F.col("s")).alias("out")).collect()]


# -- reference semantics, restated from SURVEY.md §2.3 (dp:23-54) -----------

def ref_price(s: str) -> Decimal | None:
    try:
        cleaned = s.replace(".", "").replace(",", "").replace("$", "").replace(" ", "")
        return Decimal(cleaned)
    except (InvalidOperation, ValueError, ArithmeticError):
        return None


def ref_remove_special(s: str) -> str:
    return re.sub(r"[^A-Za-z0-9/% ]+", "", s)


def ref_camel(s: str) -> str:
    return re.sub(r"([a-z])([A-Z0-9])", r"\1 \2", s)


def ref_provider(s: str) -> str | None:
    cleaned = ref_remove_special(s)
    separated = ref_camel(cleaned) if cleaned else None
    return separated.title() if separated else None


def ref_capitalize(s: str) -> str | None:
    return s if not s else s.strip().title()


# ---------------------------------------------------------------------------

@settings(max_examples=25, deadline=None)
@given(TEXTS)
def test_clean_price_matches_reference(spark, texts):
    got = _run(spark, texts, lambda c: scalar.clean_price(c))
    for t, g in zip(texts, got):
        want = ref_price(t)
        # engine contract: DecimalType(18,2) — values the reference would
        # return but that overflow 18 digits degrade to null
        if want is not None and abs(want) < Decimal(10) ** 16:
            assert g is not None and Decimal(g) == want, (t, g, want)
        elif want is None:
            assert g is None, (t, g)


@settings(max_examples=25, deadline=None)
@given(TEXTS)
def test_remove_special_characters_matches_reference(spark, texts):
    got = _run(spark, texts, scalar.remove_special_characters)
    for t, g in zip(texts, got):
        assert g == ref_remove_special(t), (t, g)


@settings(max_examples=25, deadline=None)
@given(TEXTS)
def test_separate_camel_case_matches_reference(spark, texts):
    got = _run(spark, texts, scalar.separate_camel_case)
    for t, g in zip(texts, got):
        assert g == ref_camel(t), (t, g)


@pytest.mark.slow
@settings(max_examples=25, deadline=None)
@given(TEXTS)
def test_provider_name_matches_reference(spark, texts):
    got = _run(spark, texts, exact.clean_provider_name)
    for t, g in zip(texts, got):
        assert g == ref_provider(t), (t, g)


@pytest.mark.slow
@settings(max_examples=25, deadline=None)
@given(TEXTS)
def test_capitalize_first_letter_matches_reference(spark, texts):
    got = _run(spark, texts, exact.capitalize_first_letter)
    for t, g in zip(texts, got):
        assert g == ref_capitalize(t), (t, g)


@settings(max_examples=25, deadline=None)
@given(TEXTS)
def test_measure_unit_package_iva_extraction(spark, texts):
    """F8-F10, F13: regex extraction parity (group semantics + None on
    no-match) against Python re on the same patterns."""
    got = _run(
        spark,
        texts,
        lambda c: F.struct(
            scalar.extract_measure(c).alias("m"),
            scalar.extract_unit(c).alias("u"),
            scalar.extract_package_units(c).alias("p"),
            scalar.extract_iva(c).alias("i"),
        ),
    )
    for t, g in zip(texts, got):
        m = re.search(r"(\d+\.?\d*)\s*([a-zA-Z]{1,3})", t)
        p = re.search(r"[x]\s*(\d+)", t)
        i = re.search(r"\(\s*[Gg]\s*(\d+)\s*\)", t)
        assert g["m"] == (m.group(1) if m else None), (t, g["m"])
        assert g["u"] == (m.group(2) if m else None), (t, g["u"])
        assert g["p"] == (p.group(1) if p else None), (t, g["p"])
        want_iva = int(i.group(1)) if i else None
        if want_iva is not None and want_iva > 2**31 - 1:
            want_iva = None  # int-cast overflow degrades to null in-engine
        assert g["i"] == want_iva, (t, g["i"])


# -- round-4 operator invariants --------------------------------------------

URL_CHARS = st.sampled_from(
    list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")
    + list("-._~/?#&=%")
)
URL_TAILS = st.lists(st.text(URL_CHARS, max_size=30), min_size=1, max_size=60)


@settings(max_examples=10, deadline=None)
@given(URL_TAILS)
def test_url_canonicalization_is_idempotent(spark, tails):
    """canonical(canonical(url)) == canonical(url): URL-level dedup keys
    on the canonical form, so re-canonicalizing an already-canonical URL
    must be a fixed point — otherwise two ingest passes disagree."""
    from aquiles_etl_pipeline_spark.llmdata import urls

    raw = [f"HTTPS://WWW.example-{i % 7}.COM:443/{t}" for i, t in enumerate(tails)]
    df = spark.createDataFrame([(u,) for u in raw], ["url"])
    once = urls.parse_urls(df, "url").select(F.col("url_canonical").alias("url"))
    c1 = [r["url"] for r in once.collect()]
    twice = urls.parse_urls(once, "url").select("url_canonical")
    c2 = [r["url_canonical"] for r in twice.collect()]
    assert c1 == c2


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
            min_size=1,
            max_size=16,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_quantize_rmse_bounded_by_half_scale(spark, vecs):
    """Absmax int8 quantization's per-dimension error is at most
    scale/2 (round-to-nearest), so recon_rmse <= scale/2 for every
    vector — the quality bound q105's recall measurement relies on."""
    from aquiles_etl_pipeline_spark.llmdata import similarity

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    out = similarity.quantize_embeddings_int8(df).collect()
    assert len(out) == len(vecs)
    for r in out:
        if r["scale"] is None or r["scale"] == 0:
            continue
        assert r["recon_rmse"] <= r["scale"] / 2 + 1e-9
