from .canonicalize import COLUMN_MAPPING, map_columns_to_apply_transformations
from .transforms import apply_transformations
from .validation import REQUIRED_HEADERS, validate_csv_headers

__all__ = [
    "COLUMN_MAPPING",
    "REQUIRED_HEADERS",
    "apply_transformations",
    "map_columns_to_apply_transformations",
    "validate_csv_headers",
]
