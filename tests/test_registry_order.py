"""Pin the registry ordering contract for the driver's 50-row window.

Round-1 lesson: the driver records CORRECTNESS rows for the first 50
registry entries only, and module discovery order left declared
contract queries (q18, q20–q23) with no row at all. Rounds 6 and 7
lesson: hardcoding a round's window composition here leaves the tree
red the moment the next rotation lands, so the expected window is
DERIVED from the same artifact-driven policy the registry was generated
from (``tools.rotation.compute_window``). Round-8 lesson: deriving it
from ALL artifacts on disk turns the suite red the moment the driver
writes a POST-snapshot CORRECTNESS file the builder never had — so the
policy is now recomputed from the artifact set STAMPED into
``registry._WINDOW_ARTIFACTS`` by ``--emit``; a newer artifact on disk
raises a pytest warning (advisory), not a failure (the
``test_coverage_ledger_fresh`` pattern, VERDICT r8 item 1).
"""

import os
import warnings

from distributed_map_reduce_spark.registry import (
    CORRECTNESS_WINDOW,
    _PRIORITY,
    _WINDOW_ARTIFACTS,
    all_queries,
)
from tools.rotation import (
    ANCHORS,
    FORCE_RECHECK,
    REPO_ROOT,
    ROWS_ONLY_QUOTA,
    advise_if_newer,
    checked_names,
    compute_window,
    last_green_rounds,
)

STAMPED = list(_WINDOW_ARTIFACTS)


def test_stamped_artifacts_exist_and_advise_on_newer():
    missing = [
        b for b in STAMPED if not os.path.exists(os.path.join(REPO_ROOT, b))
    ]
    assert not missing, f"stamped artifacts missing from disk: {missing}"
    newer = advise_if_newer(STAMPED)  # one advisory implementation, not two
    if newer:
        warnings.warn(f"stamped window predates driver artifacts: {newer}",
                      stacklevel=1)


def test_window_matches_rotation_policy():
    window = list(all_queries())[:CORRECTNESS_WINDOW]
    assert window == compute_window(artifacts=STAMPED), (
        "registry _PRIORITY disagrees with tools.rotation policy computed "
        "from the STAMPED artifact set — _PRIORITY or _WINDOW_ARTIFACTS was "
        "edited without re-running `python -m tools.rotation --emit`"
    )


def test_window_contains_anchors_and_never_green():
    qs = all_queries()
    window = list(qs)[:CORRECTNESS_WINDOW]
    missing_anchors = [q for q in ANCHORS if q not in window]
    assert not missing_anchors, f"anchor queries outside window: {missing_anchors}"
    green = last_green_rounds(artifacts=STAMPED)
    never_green = [
        n for n, s in qs.items() if s.oracle is not None and n not in green
    ]
    missing = [q for q in never_green if q not in window]
    assert not missing, f"never-driver-green oracle entries outside window: {missing}"


def test_window_rows_only_entries_are_the_quota_picks():
    """Rows-only entries inside the window must be exactly the policy's
    never-driver-checked rotation picks (<= ROWS_ONLY_QUOTA, VERDICT r13
    item 3) — any other rows-only entry there wastes a hash-checkable
    slot (the r7 ``sketch_active_users`` mistake)."""
    qs = all_queries()
    window = list(qs)[:CORRECTNESS_WINDOW]
    in_window = [n for n in window if qs[n].oracle is None]
    assert len(in_window) <= ROWS_ONLY_QUOTA
    already = checked_names(artifacts=STAMPED)
    stray = [n for n in in_window if n in already]
    assert not stray, (
        f"already-driver-checked rows-only entries waste window slots: {stray}"
    )


def test_oracle_entries_precede_rows_only_outside_window():
    """Beyond the window, discovery order must still put oracle-bearing
    entries before rows-only ones (inside the window the rotation quota
    deliberately interleaves a few rows-only picks)."""
    qs = all_queries()
    names = list(qs)[CORRECTNESS_WINDOW:]
    first_rows_only = next(
        (i for i, n in enumerate(names) if qs[n].oracle is None), len(names)
    )
    late_oracle = [n for n in names[first_rows_only:] if qs[n].oracle is not None]
    assert not late_oracle, (
        f"oracle-bearing entries after rows-only ones: {late_oracle}"
    )


def test_window_fill_is_stalest_first():
    """The non-anchor window slots must service the STALEST green entries
    first (after never-green): no oracle entry outside the window may have
    an older last-green round than any non-anchor entry inside it.
    (Renamed from the r8 'three rounds' test, whose name promised a
    max-staleness bound the assert never enforced and which is
    arithmetically unsatisfiable at 201 entries x 38 slots/round — see
    README capacity math; ADVICE r8.) Computed on the stamped artifact
    set so a post-snapshot driver artifact cannot redden it."""
    qs = all_queries()
    window = set(list(qs)[:CORRECTNESS_WINDOW])
    green = last_green_rounds(artifacts=STAMPED)
    outside = [
        green[n]
        for n, s in qs.items()
        if s.oracle is not None and n not in window and n in green
    ]
    # FORCE_RECHECK entries ride the window despite a RECENT green —
    # their code/oracle changed after it, so the green is stale-by-edit
    # rather than stale-by-round (first non-empty use: r15's SESS_CTES
    # boundary hardening). They must not trip the stalest-first check.
    inside = [
        green[n]
        for n in window
        if n in green
        and n not in set(ANCHORS)
        and n not in set(FORCE_RECHECK)
    ]
    if outside and inside:
        assert min(outside) >= max(inside), (
            "a staler oracle entry sits outside the window than inside it"
        )


def test_priority_list_names_resolve_and_unique():
    assert len(set(_PRIORITY)) == len(_PRIORITY)
    qs = all_queries()  # raises KeyError on a stale _PRIORITY name
    assert list(qs)[: len(_PRIORITY)] == _PRIORITY


def test_force_recheck_reenters_window_and_rejects_typos(monkeypatch):
    """The FORCE_RECHECK policy (ADVICE r9): a listed oracle entry is
    treated as never-green so an edited query re-enters the very next
    window; an unknown name raises instead of silently no-oping (the
    stale-green failure the list exists to prevent)."""
    import pytest

    import tools.rotation as rot

    green = last_green_rounds(artifacts=STAMPED)
    # pick a green, non-anchor oracle entry currently OUTSIDE the window
    qs = all_queries()
    window = set(list(qs)[:CORRECTNESS_WINDOW])
    victim = next(
        n
        for n, s in qs.items()
        if s.oracle is not None
        and n in green
        and n not in window
        and n not in set(ANCHORS)
    )
    monkeypatch.setattr(rot, "FORCE_RECHECK", [victim])
    assert victim in compute_window(artifacts=STAMPED)

    monkeypatch.setattr(rot, "FORCE_RECHECK", ["q999_no_such_query"])
    with pytest.raises(RuntimeError, match="FORCE_RECHECK"):
        compute_window(artifacts=STAMPED)


def test_replace_block_surgery_is_line_anchored():
    """tools.rotation.replace_block must bind to the LINE-START block,
    not a docstring mention of the marker, and must stop at the
    column-0 closing bracket (ADVICE r9: the naive index() version
    would silently corrupt registry.py)."""
    from tools.rotation import replace_block

    src = (
        '"""Docstring that mentions _PRIORITY = [ in prose."""\n'
        "# _PRIORITY = [ in a comment too\n"
        "OTHER = [\n"
        '    "keep-me",\n'
        "]\n"
        "_PRIORITY = [\n"
        "    # leading comment to preserve\n"
        '    "old_a",\n'
        '    "old_b",\n'
        "]\n"
        "TAIL = 1\n"
    )
    out = replace_block(src, "_PRIORITY = [", ["new_x"])
    assert '"keep-me",' in out                      # other block untouched
    assert "# leading comment to preserve" in out   # comments preserved
    assert '"new_x",' in out and '"old_a",' not in out
    assert out.startswith('"""Docstring')           # docstring untouched
    assert out.endswith("TAIL = 1\n")               # tail untouched
    # the docstring/comment mentions are still there, unmodified
    assert "mentions _PRIORITY = [ in prose" in out
