"""DataFrame-level pipeline tests, ported from the reference's
tests/test_data_processor.py:315-409 (column mapping, full
apply_transformations run, auto-added date column)."""

from __future__ import annotations

import re
from decimal import Decimal

from aquiles_etl_pipeline_spark.pipeline import (
    apply_transformations,
    map_columns_to_apply_transformations,
    validate_csv_headers,
)


def test_map_columns_basic(spark):
    df = spark.createDataFrame(
        [("Arroz 500g", "2024-01-15", "Empresa A", "2500", "19"),
         ("Aceite 1L", "2024-01-16", "Empresa B", "4200", "19")],
        ["Producto", "Fecha 1", "Provedor", "Precio", "Porcentaje de IVA"],
    )
    out = map_columns_to_apply_transformations(df)
    assert out.columns == ["Description", "LastReviewDt", "ProviderName", "Price", "PercentageIVA"]
    rows = out.collect()
    assert len(rows) == 2
    assert rows[0]["Description"] == "Arroz 500g"
    assert rows[1]["ProviderName"] == "Empresa B"


def test_map_columns_partial(spark):
    df = spark.createDataFrame(
        [("Test Product", "1000", "Other Value")],
        ["Producto", "Precio", "OtherColumn"],
    )
    out = map_columns_to_apply_transformations(df)
    assert "Description" in out.columns
    assert "Price" in out.columns
    assert "OtherColumn" in out.columns
    assert "LastReviewDt" not in out.columns


def test_apply_transformations_complete_pipeline(spark):
    df = spark.createDataFrame(
        [("Arroz Premium 500g x 12 (G13)", "ProvedorA S.A.S", "2.500", "13"),
         ("Aceite Vegetal 1L (G19)", "ProvedorB Corp", "4.200", "19")],
        ["Producto", "Provedor", "Precio", "Porcentaje de IVA"],
    )
    out = apply_transformations(map_columns_to_apply_transformations(df))
    for c in ["RawPrice", "CleanPrice", "IsValidPrice", "RawDescription",
              "CleanDescription", "Measure", "UnitOfMeasure", "PackageUnits",
              "RawProviderName", "CleanProviderName", "LastReviewDt"]:
        assert c in out.columns, c
    first = out.orderBy("RawDescription").collect()[1]  # Arroz sorts after Aceite
    assert first["CleanPrice"] == Decimal("2500")
    assert first["UnitOfMeasure"] == "g"
    assert first["Measure"] == "500"
    assert first["PackageUnits"] == "12"
    assert first["CleanProviderName"] == "Provedor A Sas"
    assert first["IsValidPrice"] is True


def test_apply_transformations_missing_date_column(spark):
    df = spark.createDataFrame([("Test Product", "1000")], ["Description", "Price"])
    out = apply_transformations(df)
    for c in ["LastReviewDt", "RawLastReviewDt", "CleanLastReviewDt"]:
        assert c in out.columns
    row = out.collect()[0]
    assert re.match(r"^\d{4}-\d{2}-\d{2}$", row["LastReviewDt"])
    assert row["CleanLastReviewDt"] == row["LastReviewDt"]


def test_apply_transformations_native_mode(spark):
    df = spark.createDataFrame(
        [("Arroz Premium 500g x 12 (G13)", "ProvedorA S.A.S", "2.500", "15/03/2024")],
        ["Description", "ProviderName", "Price", "LastReviewDt"],
    )
    row = apply_transformations(df, mode="native").collect()[0]
    assert row["CleanPrice"] == Decimal("2500")
    assert row["CleanLastReviewDt"] == "2024-03-15"
    assert row["Measure"] == "500"
    assert row["CleanProviderName"] is not None


def test_header_validation_gate():
    ok = validate_csv_headers(["Producto", "Fecha 1", "Provedor", "Precio", "IVA"])
    assert ok.is_valid
    extra = validate_csv_headers(["Producto", "Fecha", "Provedor", "Precio", "IVA", "Zzz"])
    assert extra.is_valid and extra.extras == ["Zzz"]
    bad = validate_csv_headers(["Producto", "Precio"])
    assert not bad.is_valid and "Fecha" in bad.missing
    assert not validate_csv_headers([]).is_valid
