"""bench.py stdout-line contract: the driver records only a 2000-char
tail of stdout, so the single JSON line bench prints must NEVER exceed
its 1900-char budget — at any headliner count, any name length, any
error volume (ADVICE r9: the old fallback could exit its shrink loop at
keep=0 without re-encoding and still print an oversized line)."""

from __future__ import annotations

import json

from bench import encode_stdout_line

FULL = {
    "metric": "headline_suite_seconds",
    "value": 12.345,
    "completed": 0,
    "attempted": 0,
    "sf": 0.1,
}


def _line(results, errors=None, budget=1900):
    full = dict(FULL, completed=len(results), attempted=len(results))
    return encode_stdout_line(full, results, errors or {}, "BENCH_LOCAL.json", budget)


def test_small_suite_keeps_full_precision():
    results = {"q1": 1.234, "q2": 0.567}
    line = json.loads(_line(results))
    assert line["queries"] == results
    assert line["worst"] == ["q1", 1.234]


def test_many_queries_coarsen_then_truncate():
    results = {f"query_with_a_fairly_long_name_{i:03d}": i / 7 for i in range(120)}
    encoded = _line(results)
    assert len(encoded) <= 1900
    line = json.loads(encoded)
    # Shrunk to the worst-N, recorded how many survived.
    assert line["queries_truncated_to_worst"] == len(line["queries"])
    kept = set(line["queries"])
    worst = sorted(results, key=results.get, reverse=True)[: len(kept)]
    assert kept == set(worst)


def test_pathological_overflow_still_fits_budget():
    """Even when keep=5 of 400-char names overflows a tiny budget, the
    floor re-encodes with an empty query map instead of printing an
    oversized line."""
    results = {"q" * 400 + str(i): float(i) for i in range(40)}
    errors = {("e" * 300) + str(i): "boom" for i in range(20)}
    encoded = _line(results, errors, budget=600)
    assert len(encoded) <= 600
    line = json.loads(encoded)
    assert line["queries"] == {}
    assert line["queries_truncated_to_worst"] == 0
    assert "error_queries" not in line
    assert line["worst"] is None
    # The headline metric survives truncation — the driver always parses.
    assert line["metric"] == "headline_suite_seconds"
    assert line["value"] == 12.345
