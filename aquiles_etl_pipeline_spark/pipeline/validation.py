"""P9: header-set validation gate.

Reproduces the csv-from-string validation
(/root/reference/core/etl_orchestrator.py:423-447): require the canonical
Spanish header set, warn on extras, reject empty input.  Driver-side
schema check — runs on ``df.columns`` metadata, no job launched.
"""

from __future__ import annotations

from dataclasses import dataclass, field

REQUIRED_HEADERS: frozenset[str] = frozenset(
    {"Producto", "Fecha", "Provedor", "Precio", "IVA"}
)


@dataclass
class HeaderValidation:
    is_valid: bool
    missing: list[str] = field(default_factory=list)
    extras: list[str] = field(default_factory=list)
    message: str = ""


def validate_csv_headers(columns: list[str]) -> HeaderValidation:
    """etl:423-447 semantics: `Fecha 1` satisfies `Fecha`; extras warn only."""
    present = set(columns)
    normalized = {"Fecha" if c == "Fecha 1" else c for c in present}
    missing = sorted(REQUIRED_HEADERS - normalized)
    extras = sorted(normalized - REQUIRED_HEADERS)
    if not columns:
        return HeaderValidation(False, sorted(REQUIRED_HEADERS), [], "empty input")
    if missing:
        return HeaderValidation(False, missing, extras, f"missing required headers: {missing}")
    return HeaderValidation(True, [], extras, "ok" if not extras else f"extra headers ignored: {extras}")
