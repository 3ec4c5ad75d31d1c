"""Exact-parity transforms that need Python semantics.

Two reference behaviors have no Catalyst equivalent:

* Python ``str.title()`` (used by transform_provider_name /
  transform_description / capitalize_first_letter,
  /root/reference/core/data_processor.py:42-60) capitalizes after *any*
  non-letter and lowercases everything else — ``initcap`` only splits on
  whitespace.
* ``dateutil.parser.parse(dayfirst=True, fuzzy=True)``
  (/root/reference/core/data_processor.py:16-21) extracts a date out of
  surrounding text.

Both are implemented as Arrow-vectorized pandas UDFs (batched columnar
transfer, not row-at-a-time) — the documented Python escape hatches of
this engine.  Everything else is native; see scalar.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


@pandas_udf(StringType())
def _title_case_pd(s: pd.Series) -> pd.Series:
    # pandas .str.title() == Python str.title(), vectorized; preserves NULL.
    return s.str.title()


@pandas_udf(StringType())
def _fuzzy_date_pd(s: pd.Series) -> pd.Series:
    """infer_and_transform_date parity: dateutil fuzzy day-first parse.

    Fast path: vectorized pd.to_datetime(dayfirst=True); rows it cannot
    parse fall back to element-wise dateutil fuzzy parse.  NULL (never an
    error) for unparseable input, matching the reference's try/except.
    """
    from dateutil.parser import parse as du_parse

    trimmed = s.astype("string")
    # dictionary-encode: real price-list files carry a handful of
    # distinct date strings across thousands of rows — parse each
    # distinct value once, then map
    uniq = pd.Series(trimmed.dropna().unique(), dtype="string")
    fast = pd.to_datetime(uniq, dayfirst=True, errors="coerce", format="mixed")
    vals = fast.dt.strftime("%Y-%m-%d")

    def slow(v: str | None) -> str | None:
        if v is None or v is pd.NA:
            return None
        try:
            return du_parse(str(v), dayfirst=True, fuzzy=True).strftime("%Y-%m-%d")
        except Exception:
            return None

    missing = vals.isna()
    if missing.any():
        vals[missing] = uniq[missing].map(slow)
    mapping = dict(zip(uniq, vals.astype(object).where(vals.notna(), None)))
    out = trimmed.map(mapping)
    return out.astype(object).where(out.notna(), None)


def title_case(col: Column) -> Column:
    """Exact Python str.title() semantics (F6 capitalize_first_letter core)."""
    return _title_case_pd(col.cast("string"))


def fuzzy_date(col: Column) -> Column:
    """Exact infer_and_transform_date semantics -> 'YYYY-MM-DD' string or NULL."""
    return _fuzzy_date_pd(col.cast("string"))


def capitalize_first_letter(col: Column) -> Column:
    """F6 (/root/reference/core/data_processor.py:50-54):
    ``text if not text else text.strip().title()`` — empty string passes
    through unchanged (NOT nulled), NULL stays NULL.  Python str.strip()
    removes ALL whitespace (tabs/newlines), not just spaces — use the
    _strip_ws regex, not F.trim ('\\thello\\n' must become 'Hello')."""
    from .scalar import _strip_ws

    c = col.cast("string")
    return F.when(c == "", c).otherwise(title_case(_strip_ws(c)))


def clean_description(col: Column) -> Column:
    """F7 transform_description (/root/reference/core/data_processor.py:56-60):
    alias of capitalize_first_letter."""
    return capitalize_first_letter(col)


def clean_provider_name(col: Column) -> Column:
    """F5 transform_provider_name (/root/reference/core/data_processor.py:42-48):
    remove specials -> split camel-case -> title(); empty result -> NULL.
    Golden pairs: reference tests/test_data_processor.py:126-141
    ("ProveedorABC@123" -> "Proveedor Abc123", "@#$!" -> NULL)."""
    from . import scalar

    cleaned = F.nullif(scalar.remove_special_characters(col), F.lit(""))
    separated = F.nullif(scalar.separate_camel_case(cleaned), F.lit(""))
    return title_case(separated)
