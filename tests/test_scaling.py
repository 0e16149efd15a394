"""Scaling-curve gate (VERDICT r5 item 4).

`tools/scaling.py` times the whole suite at two scale factors (10x data)
and records per-query growth exponents in `scaling_results.json`. These
tests gate on the recorded artifact rather than re-timing (a double
bench inside pytest would both slow the suite and measure CONTENTION,
not scaling — timings on local[32] skew 20-40x under a concurrent
Spark process). The artifact is regenerated per round on a quiet box.

Gate: no oracle-checked query may grow worse than ~O(n^1.5) between
sf0.01 and sf0.1 — the red line that catches superlinear operators
(unbounded pair joins, hot-key windows) before a larger sf does.
"""

import json
import os

import pytest

from distributed_map_reduce_spark.registry import all_queries

ARTIFACT = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "scaling_results.json")


@pytest.fixture(scope="module")
def results():
    with open(ARTIFACT) as f:
        return json.load(f)


def test_artifact_covers_every_oracle_query(results):
    """Suite growth forces regeneration: a query added without a
    scaling measurement fails here until tools/scaling.py reruns."""
    measured = {r["query"] for r in results["rows"]}
    oracle_queries = {n for n, s in all_queries().items() if s.oracle is not None}
    missing = sorted(oracle_queries - measured)
    assert not missing, (
        f"queries missing from scaling_results.json (rerun tools/scaling.py "
        f"on a quiet box): {missing}"
    )


def test_no_oracle_query_superlinear(results):
    gate = results["max_exponent_gate"]
    assert gate == 1.5
    bad = [
        (r["query"], r["exponent"])
        for r in results["rows"]
        if r["oracle"] and r["exponent"] > gate
    ]
    assert not bad, f"superlinear oracle-checked queries: {bad}"


def test_artifact_is_a_real_two_point_measurement(results):
    assert results["ratio"] == 10.0
    assert results["lo"].endswith("sf0.01") and results["hi"].endswith("sf0.1")
    assert all(r["t_lo"] > 0 and r["t_hi"] > 0 for r in results["rows"])
