"""Pin the registry ordering contract for the driver's 50-row window.

Round-1 lesson: the driver records CORRECTNESS rows for the first 50
registry entries only, and module discovery order left declared
contract queries (q18, q20–q23) with no row at all. These tests keep
the window spent on the queries whose green rows matter most.
"""

from distributed_map_reduce_spark.registry import (
    CORRECTNESS_WINDOW,
    _PRIORITY,
    all_queries,
)

# Round-6 rotation (VERDICT r5 item 1): the window is 12 anchor contract
# rows — each green in every CORRECTNESS round it appeared — plus ALL 38
# round-5 additions (q91–q128), the only oracle-bearing entries never
# driver-checked. Contract queries rotated out (q1–q3, q5, …) keep their
# green rows from rounds 1–5 and the per-round pytest parity gate.
ANCHORS = [
    "q4_pricing_summary", "q7_region_revenue", "q9_window_rank",
    "q14_hourly_windows", "q16_exact_dedup", "q18_nearest_neighbor",
    "q20_mr_wordcount", "q24_ngram_jaccard_dedup", "q25_minhash_lsh_dedup",
    "q33_click_attribution", "q89_dedup_clusters_star", "q90_incremental_dedup",
]


def test_window_is_anchors_plus_all_round5_entries():
    window = list(all_queries())[:CORRECTNESS_WINDOW]
    missing_anchors = [q for q in ANCHORS if q not in window]
    assert not missing_anchors, f"anchor queries outside window: {missing_anchors}"
    round5 = [
        n for n in all_queries()
        if n.split("_")[0][1:].isdigit() and 91 <= int(n.split("_")[0][1:]) <= 128
    ]
    assert len(round5) == 38
    missing_new = [q for q in round5 if q not in window]
    assert not missing_new, f"round-5 entries outside window: {missing_new}"
    assert len(window) == CORRECTNESS_WINDOW == len(ANCHORS) + len(round5)


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


def test_priority_list_names_resolve_and_unique():
    assert len(set(_PRIORITY)) == len(_PRIORITY)
    qs = all_queries()  # raises KeyError on a stale _PRIORITY name
    assert list(qs)[: len(_PRIORITY)] == _PRIORITY
