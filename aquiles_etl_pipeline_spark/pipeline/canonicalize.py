"""P1: Spanish→canonical rename projection.

Reproduces map_columns_to_apply_transformations
(/root/reference/core/data_processor.py:105-119): only columns actually
present are renamed; unknown columns pass through untouched (reference
tests/test_data_processor.py:342-357).  Pure metadata operation — zero
cost at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

COLUMN_MAPPING: dict[str, str] = {
    "Producto": "Description",
    "Fecha 1": "LastReviewDt",
    "Fecha": "LastReviewDt",
    "Provedor": "ProviderName",
    "Precio": "Price",
    "IVA": "PercentageIVA",
    "Porcentaje de IVA": "PercentageIVA",
}


def map_columns_to_apply_transformations(df: DataFrame) -> DataFrame:
    present = {old: new for old, new in COLUMN_MAPPING.items() if old in df.columns}
    return df.withColumnsRenamed(present)
