"""The canonical wide-record transform chain (bronze → silver).

Reproduces apply_transformations
(/root/reference/core/data_processor.py:121-168) as a single lazy
DataFrame projection: every block applies conditionally on which
canonical columns exist, originals are preserved beside cleaned values
(Raw*/Clean* dual-column pattern), malformed cells degrade to NULL and
rows survive.  Catalyst fuses the whole chain into one whole-stage
codegen'd projection; only the title-case / fuzzy-date pandas UDFs (mode
="exact") sit outside codegen, as Arrow-batched vectorized stages.

mode="exact"  — byte-exact parity with Python str.title() + dateutil
                fuzzy dates (reference-golden-test faithful).
mode="native" — 100%-JVM variant (initcap + format-coalesce dates) for
                scale runs where approximate casing is acceptable.

Divergence note: pandas ``astype(str)`` renders missing values as the
literal string ``'nan'`` in Raw* columns; we keep NULL instead (a pandas
artifact, not a semantic of the pipeline — not exercised by any
reference test).
"""

from __future__ import annotations

from typing import Literal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import exact, scalar

Mode = Literal["exact", "native"]


def _clean_date(col: Column, mode: Mode) -> Column:
    return exact.fuzzy_date(col) if mode == "exact" else scalar.clean_date_native(col)


def _clean_description(col: Column, mode: Mode) -> Column:
    if mode == "exact":
        return exact.clean_description(col)
    c = col.cast("string")
    return F.when(c == "", c).otherwise(scalar.initcap_approx(F.trim(c)))


def _clean_provider(col: Column, mode: Mode) -> Column:
    if mode == "exact":
        return exact.clean_provider_name(col)
    cleaned = F.nullif(scalar.remove_special_characters(col), F.lit(""))
    separated = F.nullif(scalar.separate_camel_case(cleaned), F.lit(""))
    return scalar.initcap_approx(separated)


def apply_transformations(df: DataFrame, mode: Mode = "exact") -> DataFrame:
    """dp:130-168, one lazy projection. Conditional on present columns."""
    cols = set(df.columns)

    # dp:132-133 — default LastReviewDt = today (string yyyy-MM-dd)
    if "LastReviewDt" not in cols:
        df = df.withColumn("LastReviewDt", scalar.today_str())
        cols.add("LastReviewDt")

    new_cols: dict[str, Column] = {}

    if "Price" in cols:  # dp:135-138
        price = F.col("Price")
        new_cols["RawPrice"] = price.cast("string")
        new_cols["CleanPrice"] = scalar.clean_price(price)
        new_cols["IsValidPrice"] = price.isNotNull() & scalar.clean_price(price).isNotNull()

    # dp:140-142 (always true after the default above)
    new_cols["RawLastReviewDt"] = F.col("LastReviewDt").cast("string")
    new_cols["CleanLastReviewDt"] = _clean_date(F.col("LastReviewDt"), mode)

    if "Description" in cols:  # dp:144-156
        desc = F.col("Description")
        new_cols["RawDescription"] = desc.cast("string")
        new_cols["CleanDescription"] = _clean_description(desc, mode)
        new_cols["Measure"] = scalar.extract_measure(desc)
        new_cols["UnitOfMeasure"] = F.lower(scalar.extract_unit(desc))
        new_cols["PackageUnits"] = scalar.extract_package_units(desc)
        if "PercentageIVA" not in cols:  # dp:155-156
            new_cols["PercentageIVA"] = scalar.extract_iva(desc)

    if "ProviderName" in cols:  # dp:159-161
        prov = F.col("ProviderName")
        new_cols["RawProviderName"] = prov.cast("string")
        new_cols["CleanProviderName"] = _clean_provider(prov, mode)

    out = df.withColumns(new_cols)
    # dp:163 — drop rows where every ORIGINAL column is null (pandas
    # dropna runs on the already-extended frame; derived cols are null
    # exactly when their source is, and the constant default date column
    # exists in both engines, so the row sets match).
    return out.na.drop(how="all")
