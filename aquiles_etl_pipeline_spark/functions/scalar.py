"""Native (Catalyst-expression) scalar transform library.

Re-expresses the reference's scalar functions
(``/root/reference/core/data_processor.py:13-103``) as Column→Column
functions built purely from ``pyspark.sql.functions`` so they stay inside
whole-stage codegen — no Python in the hot path.  Every function is
null-safe the way the reference is: malformed input degrades to NULL,
never throws (the reference wraps each transform in try/except→None).
``try_cast``/``try_to_date`` are used so behavior is identical whether or
not the session runs in ANSI mode (Spark 4 default).

The two transforms whose exact semantics cannot be expressed natively
(Python ``str.title()`` and ``dateutil`` fuzzy parsing) live in
``exact.py`` as Arrow-vectorized pandas UDFs; this module carries their
native approximations for scale runs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

# Regexes from /root/reference/core/data_processor.py:13-14 (Java-regex
# compatible as written).
MEASURE_REGEX = r"(\d+\.?\d*)\s*([a-zA-Z]{1,3})"
PACKAGE_UNITS_REGEX = r"x\s*(\d+)"
IVA_REGEX = r"\(\s*[Gg]\s*(\d+)\s*\)"
SPECIAL_CHARS_REGEX = r"[^A-Za-z0-9/% ]+"
CAMEL_CASE_REGEX = r"([a-z])([A-Z0-9])"
# /root/reference/core/etl_orchestrator.py:261-267 (DOTALL+IGNORECASE inline)
MARKDOWN_FENCE_REGEX = r"(?is)```(?:csv)?\s*(.*?)```"


def _nullif_empty(col: Column) -> Column:
    return F.nullif(col, F.lit(""))


def clean_price(col: Column) -> Column:
    """transform_price (/root/reference/core/data_processor.py:23-28).

    Separator-STRIPPING, not locale parsing: drops ``. , $ space`` then
    casts — ``"$ 1.500,50" -> 150050``.  Golden pairs at
    reference tests/test_data_processor.py:60-78.  NULL on garbage.

    ``_`` is stripped too: the reference parses with Python's Decimal,
    which silently IGNORES underscores anywhere in the string
    (``Decimal('0_') == 0``, ``Decimal('-_5') == -5``) — found by the
    hypothesis parity sweep; Spark's decimal cast rejects them.
    """
    stripped = F.regexp_replace(col.cast("string"), r"[.,$ _]", "")
    return _nullif_empty(stripped).try_cast(DecimalType(18, 2))


def remove_special_characters(col: Column) -> Column:
    """F3 (/root/reference/core/data_processor.py:30-34): keep alnum, /, %, space."""
    return F.regexp_replace(col.cast("string"), SPECIAL_CHARS_REGEX, "")


def separate_camel_case(col: Column) -> Column:
    """F4 (/root/reference/core/data_processor.py:36-40): aB -> a B, a1 -> a 1."""
    return F.regexp_replace(col.cast("string"), CAMEL_CASE_REGEX, r"$1 $2")


def extract_measure(col: Column) -> Column:
    """F8 (/root/reference/core/data_processor.py:62-67): first number before a 1-3 letter unit."""
    return _nullif_empty(F.regexp_extract(col.cast("string"), MEASURE_REGEX, 1))


def extract_unit(col: Column) -> Column:
    """F9 (/root/reference/core/data_processor.py:69-74): that unit (original case)."""
    return _nullif_empty(F.regexp_extract(col.cast("string"), MEASURE_REGEX, 2))


def extract_package_units(col: Column) -> Column:
    """F10 (/root/reference/core/data_processor.py:76-81): digits after ``x``."""
    return _nullif_empty(F.regexp_extract(col.cast("string"), PACKAGE_UNITS_REGEX, 1))


def extract_measure_and_unit(col: Column) -> Column:
    """F11 (/root/reference/core/data_processor.py:83-88): struct of
    (Measure, UnitOfMeasure lowercased, PackageUnits) — the notebook's
    ``measure_unit_schema`` UDF, but a native struct expression."""
    return F.struct(
        extract_measure(col).alias("Measure"),
        F.lower(extract_unit(col)).alias("UnitOfMeasure"),
        extract_package_units(col).alias("PackageUnits"),
    )


def remove_package_units(col: Column) -> Column:
    """F12 (/root/reference/core/data_processor.py:90-94). Reference
    returns the *input* on failure (not NULL); with a native regex the
    only failure mode is NULL input, where both yield NULL."""
    return F.regexp_replace(col.cast("string"), PACKAGE_UNITS_REGEX, "")


def extract_iva(col: Column) -> Column:
    """F13 (/root/reference/core/data_processor.py:96-103): first
    ``(G13)``/``(g 1 )``-style tag -> int."""
    return _nullif_empty(
        F.regexp_extract(col.cast("string"), IVA_REGEX, 1)
    ).try_cast("int")


def clean_date_native(col: Column) -> Column:
    """Native approximation of F1 infer_and_transform_date
    (/root/reference/core/data_processor.py:16-21): day-first coalesce over
    the formats the reference's tests exercise
    (tests/test_data_processor.py:36-44) plus common ISO variants.
    Full fuzzy-parse parity lives in exact.fuzzy_date_udf; this version is
    the zero-Python scale path.  Output: 'yyyy-MM-dd' string or NULL.
    """
    s = F.trim(col.cast("string"))
    parsed = F.coalesce(
        F.try_to_date(s, "d/M/yyyy"),
        F.try_to_date(s, "M/d/yyyy"),
        F.try_to_date(s, "yyyy-M-d"),
        F.try_to_date(s, "MMMM d, yyyy"),
        F.try_to_date(s, "d MMMM yyyy"),
        F.try_to_date(s, "d-M-yyyy"),
        F.try_to_date(s, "yyyy/M/d"),
        F.try_to_date(s, "MMM d, yyyy"),
        F.try_to_date(s, "d MMM yyyy"),
    )
    return F.date_format(parsed, "yyyy-MM-dd")


def initcap_approx(col: Column) -> Column:
    """Native approximation of Python str.title() (F5-F7) via initcap.
    Diverges after non-space separators ("hello-world" -> "Hello-world"
    vs title's "Hello-World"); exact parity lives in exact.title_case_udf.
    """
    return F.initcap(F.lower(col.cast("string")))


def _strip_ws(col: Column) -> Column:
    # Python str.strip() parity: F.trim only removes spaces, not \n\t.
    return F.regexp_replace(col, r"^\s+|\s+$", "")


def strip_markdown_fence(col: Column) -> Column:
    """F17 (/root/reference/core/etl_orchestrator.py:261-267): extract the
    body of a ```` ```csv ```` fence (stripped, matching the reference's
    ``.strip()``), else pass text through unchanged."""
    extracted = _nullif_empty(
        F.regexp_extract(col.cast("string"), MARKDOWN_FENCE_REGEX, 1)
    )
    return F.coalesce(_strip_ws(extracted), _strip_ws(col.cast("string")))


def description_hash(col: Column) -> Column:
    """F18: SHA-256 identity hash implied by Product.DescriptionHash
    BINARY(32) + its index (/root/reference/core/entities.py:106,116).
    Returned as hex string; use unhex() where BINARY(32) parity matters."""
    return F.sha2(col.cast("string"), 256)


def today_str() -> Column:
    """F14 (/root/reference/core/data_processor.py:133): today as 'yyyy-MM-dd'."""
    return F.date_format(F.current_date(), "yyyy-MM-dd")


def batch_guid() -> str:
    """F15 (/root/reference/core/etl_orchestrator.py:323): one GUID per
    batch, generated driver-side exactly like the reference."""
    import uuid

    return str(uuid.uuid4())
