"""Golden scalar-transform tests, ported 1:1 from the reference's
tests/test_data_processor.py (parametrize blocks cited per case).
Each case evaluates the Column function over a one-column DataFrame.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from aquiles_etl_pipeline_spark import functions as fn


def ev(spark, column_fn, value):
    """Evaluate a Column->Column function on a single string value."""
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(column_fn(F.col("v")).alias("out")).collect()[0]["out"]


# --- dates: reference tests/test_data_processor.py:36-53 -----------------
@pytest.mark.parametrize(
    "inp,expected",
    [
        ("15/03/2024", "2024-03-15"),
        ("03/15/2024", "2024-03-15"),  # day-first fallback to month-first
        ("March 15, 2024", "2024-03-15"),
        ("2024-03-15", "2024-03-15"),
        ("", None),
        ("not a date", None),
        ("None", None),
    ],
)
def test_fuzzy_date_golden(spark, inp, expected):
    assert ev(spark, fn.fuzzy_date, inp) == expected


@pytest.mark.parametrize(
    "inp,expected",
    [
        ("15/03/2024", "2024-03-15"),
        ("03/15/2024", "2024-03-15"),
        ("March 15, 2024", "2024-03-15"),
        ("2024-03-15", "2024-03-15"),
        ("not a date", None),
    ],
)
def test_native_date_covers_golden_formats(spark, inp, expected):
    assert ev(spark, fn.clean_date_native, inp) == expected


# --- price: reference tests/test_data_processor.py:60-78 -----------------
@pytest.mark.parametrize(
    "inp,expected",
    [
        ("1000", Decimal("1000")),
        ("1,000", Decimal("1000")),
        ("$1,000", Decimal("1000")),
        ("1.000", Decimal("1000")),
        ("$ 1.500,50", Decimal("150050")),
        ("", None),
        ("not a price", None),
        ("$.,", None),
    ],
)
def test_clean_price_golden(spark, inp, expected):
    assert ev(spark, fn.clean_price, inp) == expected


# --- special chars: reference tests/test_data_processor.py:85-100 --------
@pytest.mark.parametrize(
    "inp,expected",
    [
        ("Harina@de#Trigo!", "HarinadeTrigo"),
        ("Producto 100% Natural/Organico", "Producto 100% Natural/Organico"),
        ("Producto123@#$", "Producto123"),
        ("", ""),
        ("@#$!", ""),
    ],
)
def test_remove_special_characters_golden(spark, inp, expected):
    assert ev(spark, fn.remove_special_characters, inp) == expected


# --- camel case: reference tests/test_data_processor.py:102-119 ----------
@pytest.mark.parametrize(
    "inp,expected",
    [
        ("HarinaDeTrigo", "Harina De Trigo"),
        ("Producto123ABC", "Producto 123ABC"),
        ("Already Separated", "Already Separated"),
        ("Word", "Word"),
        ("", ""),
        ("lowercase", "lowercase"),
        ("UPPERCASE", "UPPERCASE"),
    ],
)
def test_separate_camel_case_golden(spark, inp, expected):
    assert ev(spark, fn.separate_camel_case, inp) == expected


# --- provider: reference tests/test_data_processor.py:126-141 ------------
@pytest.mark.parametrize(
    "inp,expected",
    [
        ("ProveedorABC@123", "Proveedor Abc123"),
        ("MiProveedor", "Mi Proveedor"),
        ("Proveedor123ABC", "Proveedor 123Abc"),
        ("", None),
        ("@#$!", None),
    ],
)
def test_clean_provider_name_golden(spark, inp, expected):
    assert ev(spark, fn.clean_provider_name, inp) == expected


# --- description: reference tests/test_data_processor.py:143-155 ---------
@pytest.mark.parametrize(
    "inp,expected",
    [
        ("ProductoEspecial@123", "Productoespecial@123"),
        ("MiProducto", "Miproducto"),
        ("hello world", "Hello World"),
        ("HELLO WORLD", "Hello World"),
        ("hello-world test", "Hello-World Test"),
        ("product description here", "Product Description Here"),
        ("", ""),
        ("a", "A"),
    ],
)
def test_clean_description_golden(spark, inp, expected):
    assert ev(spark, fn.clean_description, inp) == expected


# --- measure/unit/pkg: reference tests/test_data_processor.py:162-221 ----
@pytest.mark.parametrize(
    "inp,expected",
    [
        ("500g de harina", "500"),
        ("1.5kg arroz", "1.5"),
        ("500g y 200ml", "500"),
        ("solo texto", None),
        ("", None),
    ],
)
def test_extract_measure_golden(spark, inp, expected):
    assert ev(spark, fn.extract_measure, inp) == expected


@pytest.mark.parametrize(
    "inp,expected",
    [
        ("500g de harina", "g"),
        ("1.5kg arroz", "kg"),
        ("200ml agua", "ml"),
        ("solo texto", None),
        ("", None),
    ],
)
def test_extract_unit_golden(spark, inp, expected):
    assert ev(spark, fn.extract_unit, inp) == expected


@pytest.mark.parametrize(
    "inp,expected",
    [
        ("Arroz x 12 unidades", "12"),
        ("Producto x 6 piezas", "6"),
        ("Itemx24", "24"),
        ("solo producto", None),
        ("", None),
    ],
)
def test_extract_package_units_golden(spark, inp, expected):
    assert ev(spark, fn.extract_package_units, inp) == expected


@pytest.mark.parametrize(
    "inp,expected",
    [
        ("Arroz 500g x 12 unidades", ("500", "g", "12")),
        ("Harina 1.5kg", ("1.5", "kg", None)),
        ("Producto x 6", (None, None, "6")),
        ("Solo texto", (None, None, None)),
    ],
)
def test_extract_measure_and_unit_struct_golden(spark, inp, expected):
    row = ev(spark, fn.extract_measure_and_unit, inp)
    assert (row["Measure"], row["UnitOfMeasure"], row["PackageUnits"]) == expected


# --- package removal: reference tests/test_data_processor.py:228-244 -----
def test_remove_package_units_golden(spark):
    out = ev(spark, fn.remove_package_units, "Arroz x 12 unidades")
    assert "x 12" not in out and "Arroz" in out and "unidades" in out
    assert ev(spark, fn.remove_package_units, "Solo texto") == "Solo texto"
    assert ev(spark, fn.remove_package_units, "") == ""


# --- IVA: reference tests/test_data_processor.py:251-312 -----------------
@pytest.mark.parametrize(
    "inp,expected",
    [
        ("MINI PAPA KITTY 1X30(G13)", 13),
        ("KIKUA CHIPOTLE KITTY 1X25(G13)", 13),
        ("GUSITITOS SALSA Y QUESO BD 17G 1X12(G13)", 13),
        ("BUENACHOS SALSAPEÑO BD 18G 1X 12(G13)", 13),
        ("BORRACHO GUAYABA MOANA 1X24(G 13)", 13),
        ("ROSCA QUESO MOANA 1X24(G1)", 1),
        ("GALLETA NATILLA MOANA 1X28(G1 )", 1),
        ("PRODUCTO (g13)", 13),
        ("PRODUCTO (g 13)", 13),
        ("PRODUCTO ( g1 )", 1),
        ("PRODUCTO SIN IVA", None),
        ("PRODUCTO (G)", None),
        ("", None),
        (None, None),
        ("PRODUCTO (G5) OTRO (G13)", 5),  # first match wins
        ("PRODUCTO (G123)", 123),
    ],
)
def test_extract_iva_golden(spark, inp, expected):
    assert ev(spark, fn.extract_iva, inp) == expected


# --- markdown fence strip: reference etl:261-267 + invoice test fixtures --
@pytest.mark.parametrize(
    "inp,expected",
    [
        ("```csv\na,b\n1,2\n```", "a,b\n1,2"),
        ("```\na,b\n1,2\n```", "a,b\n1,2"),
        ("a,b\n1,2", "a,b\n1,2"),
    ],
)
def test_strip_markdown_fence(spark, inp, expected):
    assert ev(spark, fn.strip_markdown_fence, inp) == expected


def test_description_hash_is_sha256(spark):
    import hashlib

    assert ev(spark, fn.description_hash, "Arroz") == hashlib.sha256(b"Arroz").hexdigest()
