"""Contract test for bench.py's stdout record layout.

The driver keeps only the TAIL of bench stdout in a bounded buffer, so
the record must survive truncation from the front: per-query timings go
out as multiple small self-describing chunk lines, and the parseable
headline (no queries map) is the LAST line.  No Spark needed — this
tests the pure rendering function against a catalog-sized input.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import emit_lines


def _fake_timings(n: int) -> dict[str, float]:
    return {f"q{i:02d}": round(0.01 * i, 2) for i in range(1, n + 1)}


def test_every_line_parses_and_stays_under_4kb():
    lines = emit_lines(_fake_timings(288), sf=0.1)
    for line in lines:
        assert len(line.encode()) <= 4096, f"line too long: {len(line)}B"
        json.loads(line)


def test_chunks_cover_every_key_exactly_once():
    timings = _fake_timings(288)
    lines = emit_lines(timings, sf=0.1)
    seen: dict[str, float] = {}
    for line in lines[:-1]:
        rec = json.loads(line)
        assert rec["metric"] == "bench_chunk"
        assert rec["range"].count("-") >= 1
        for k, v in rec["queries"].items():
            assert k not in seen, f"duplicate key {k}"
            seen[k] = v
    assert seen == timings


def test_summary_is_last_small_and_mapless():
    timings = _fake_timings(288)
    lines = emit_lines(timings, sf=0.1)
    last = json.loads(lines[-1])
    assert last["metric"] == "catalog_total_runtime"
    assert "queries" not in last
    assert last["n_queries"] == 288
    assert last["value"] == round(sum(timings.values()), 2)
    assert len(lines[-1].encode()) < 200


def test_single_query_catalog_still_valid():
    lines = emit_lines({"q01": 1.23}, sf=0.001)
    assert json.loads(lines[0])["queries"] == {"q01": 1.23}
    assert json.loads(lines[-1])["n_queries"] == 1
