"""Registry/driver-contract invariants: cheap structural checks that
protect the correctness gate itself — the window stays exactly the
driver's check size, never-checked queries outrank stale greens, and
every registration carries a full-strength oracle.
"""

from __future__ import annotations

import json
from pathlib import Path

from map_reduce_go_spark.registry import _DRIVER_PRIORITY, all_queries

REPO = Path(__file__).resolve().parent.parent


def test_window_is_exactly_driver_sized_and_resolvable():
    qs = all_queries()
    assert len(_DRIVER_PRIORITY) == 50
    assert len(set(_DRIVER_PRIORITY)) == 50  # no duplicate slots
    missing = [n for n in _DRIVER_PRIORITY if n not in qs]
    assert not missing, f"priority names not registered: {missing}"
    # The driver checks the FIRST 50 in iteration order — those must be
    # precisely the priority list, in order.
    assert list(qs)[:50] == list(_DRIVER_PRIORITY)


def test_every_query_has_full_oracle():
    """No rows-only registrations: the driver's strongest check (rows +
    schema + value hash) applies to every query we claim."""
    weak = [n for n, s in all_queries().items() if not s.oracle]
    assert not weak, f"rows-only queries: {weak}"


def test_never_checked_queries_lead_the_window():
    """Every query with no driver CORRECTNESS row yet must sit inside the
    50-slot window — a never-checked query has strictly less evidence
    than any stale green."""
    seen: set[str] = set()
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        seen |= set(json.loads(f.read_text()).keys())
    if not seen:  # first round: nothing recorded yet
        return
    new = set(all_queries()) - seen
    out_of_window = sorted(new - set(_DRIVER_PRIORITY))
    assert not out_of_window, (
        f"never-checked queries outside the driver window: {out_of_window}"
    )


def test_bench_headliners_are_registered():
    """Every bench.py HEADLINE name must resolve in the registry — a
    rename that orphans a headliner would make the driver's BENCH run
    silently skip it (per-query error isolation) and read as a perf
    regression."""
    import bench

    qs = all_queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"bench headliners not registered: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)  # no duplicates
