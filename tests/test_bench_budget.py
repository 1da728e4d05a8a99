"""Per-query warm-cost budget over the last official-scale bench
record (round-11 VERDICT #5): regressions should fail loudly at the
NEXT test run instead of accreting 1.8x at a time.

Reads BENCH_DETAIL.json (written by bench.py). Two bounds:

- soft budget 5.0s — bench.py reports violators in its own output
  (``over_budget``), visible to the driver every round;
- hard bound 8.0s — enforced HERE. It sits above the documented
  host-variance band around the soft budget (same-code spikes of
  ~1.5-2x on a >2s query re-measure to ~min in bench.py's in-run
  protocol, so a surviving 8s warm number is a real plan problem,
  not scheduler noise).

The test skips when no sf0.1 record exists (fresh clone) or when the
record predates the current registry (names it doesn't know) — a
stale file must not fail an unrelated change.
"""

from __future__ import annotations

import json
import os

import pytest

_DETAIL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_DETAIL.json",
)

HARD_WARM_BUDGET_SEC = 8.0


def test_no_registry_query_blows_the_warm_budget():
    if not os.path.exists(_DETAIL):
        pytest.skip("no bench record yet")
    with open(_DETAIL) as f:
        detail = json.load(f)
    if detail.get("sf") != 0.1:
        pytest.skip("last bench was not the official sf0.1 scale")
    from ursa_major_choir_etl_spark.plans.queries import QUERIES

    warm = detail.get("queries", {})
    known = {k: v for k, v in warm.items() if k in QUERIES}
    if not known:
        pytest.skip("bench record predates the current registry")
    over = {
        k: v for k, v in known.items() if v > HARD_WARM_BUDGET_SEC
    }
    assert not over, (
        f"warm cost over the {HARD_WARM_BUDGET_SEC}s hard bound at "
        f"sf0.1: {over} — re-run bench.py on an idle box; if it "
        "reproduces, the plan regressed"
    )
