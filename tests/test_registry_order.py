"""Pin the registry ordering contract for the driver's 50-row window.

Round-1 lesson: the driver records CORRECTNESS rows for the first 50
registry entries only, and module discovery order left declared
contract queries (q18, q20–q23) with no row at all. Rounds 6 and 7
lesson: hardcoding a round's window composition here leaves the tree
red the moment the next rotation lands, so the expected window is now
DERIVED from the same artifact-driven policy the registry was generated
from (``tools.rotation.compute_window``) — the registry and this test
can only disagree if ``_PRIORITY`` was edited without re-running the
tool, which is exactly the mistake this gate exists to catch.
"""

from distributed_map_reduce_spark.registry import (
    CORRECTNESS_WINDOW,
    _PRIORITY,
    all_queries,
)
from tools.rotation import ANCHORS, compute_window, last_green_rounds


def test_window_matches_rotation_policy():
    window = list(all_queries())[:CORRECTNESS_WINDOW]
    assert window == compute_window(), (
        "registry _PRIORITY disagrees with tools.rotation policy — "
        "re-run `python -m tools.rotation --emit` and paste into _PRIORITY"
    )


def test_window_contains_anchors_and_never_green():
    qs = all_queries()
    window = list(qs)[:CORRECTNESS_WINDOW]
    missing_anchors = [q for q in ANCHORS if q not in window]
    assert not missing_anchors, f"anchor queries outside window: {missing_anchors}"
    green = last_green_rounds()
    never_green = [
        n for n, s in qs.items() if s.oracle is not None and n not in green
    ]
    missing = [q for q in never_green if q not in window]
    assert not missing, f"never-driver-green oracle entries outside window: {missing}"


def test_window_entries_all_have_oracles():
    qs = all_queries()
    window = list(qs)[:CORRECTNESS_WINDOW]
    rows_only = [n for n in window if qs[n].oracle is None]
    assert not rows_only, (
        f"rows-only entries waste hash-checkable window slots: {rows_only}"
    )


def test_oracle_entries_precede_rows_only():
    qs = all_queries()
    names = list(qs)
    first_rows_only = next(
        (i for i, n in enumerate(names) if qs[n].oracle is None), len(names)
    )
    late_oracle = [n for n in names[first_rows_only:] if qs[n].oracle is not None]
    assert not late_oracle, (
        f"oracle-bearing entries after rows-only ones: {late_oracle}"
    )


def test_no_oracle_entry_goes_stale_beyond_three_rounds():
    """Rotation keeps every oracle entry within 3 rounds of its last
    driver check *by construction*: the stalest-first fill means the
    window always contains the entries with the oldest last-green round.
    This asserts the policy input is sane — the stalest entry NOT in the
    window is no staler than the stalest entry IN the window."""
    qs = all_queries()
    window = set(list(qs)[:CORRECTNESS_WINDOW])
    green = last_green_rounds()
    outside = [
        green[n]
        for n, s in qs.items()
        if s.oracle is not None and n not in window and n in green
    ]
    inside = [
        green[n] for n in window if n in green and n not in set(ANCHORS)
    ]
    if outside and inside:
        assert min(outside) >= min(inside), (
            "a staler oracle entry sits outside the window than inside it"
        )


def test_priority_list_names_resolve_and_unique():
    assert len(set(_PRIORITY)) == len(_PRIORITY)
    qs = all_queries()  # raises KeyError on a stale _PRIORITY name
    assert list(qs)[: len(_PRIORITY)] == _PRIORITY
