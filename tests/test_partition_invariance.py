"""Declared-query results must not depend on shuffle partitioning.

Analog of the reference's soak methodology (SURVEY §5): the same query
under different physical parallelism must produce identical results —
the distributed-vs-sequential differential generalized to
partition-count sweeps.
"""

import pytest

from distributed_map_reduce_spark.registry import all_queries

# Shuffle-heavy representatives of each operator family.
SWEEP = ["q1_wordcount", "q4_pricing_summary", "q7_region_revenue",
         "q9_window_rank", "q11_rollup", "q19_count_distinct",
         "q24_ngram_jaccard_dedup", "q18_nearest_neighbor",
         "q32_user_sessions", "q27_embedding_neardup",
         "q45_percentiles", "q46_small_qty_revenue",
         "q53_winnowing_fingerprints", "q54_tfidf",
         "q57_fuzzy_blocked", "q61_sequence_packing",
         "q62_split_assignment", "q65_decontamination",
         "q66_corpus_mix",
         # round-8: the fixed-point-quantized transcendental queries
         # (order-free by construction — this sweep is the proof) and
         # the new window/rollup shapes
         "q68_unigram_logprob", "q147_bigram_logprob", "q158_char_entropy",
         "q166_abc_pareto_twopass", "q167_source_quality_caps",
         "q168_zipf_exponent", "q173_sole_late_supplier"]


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", SWEEP)
def test_shuffle_partition_invariance(spark, sf_dir, name):
    spec = all_queries()[name]
    results = []
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n in (1, 3, 10):
            spark.conf.set("spark.sql.shuffle.partitions", str(n))
            results.append(_canon(spec.build(spark, sf_dir)))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert results[0] == results[1] == results[2]


@pytest.mark.parametrize(
    "name", ["q7_region_revenue", "q24_ngram_jaccard_dedup", "q46_small_qty_revenue"]
)
def test_aqe_invariance(spark, sf_dir, name):
    """AQE re-plans joins and coalesces partitions at runtime — it must
    never change RESULTS, only plans. Same canon with AQE on and off."""
    spec = all_queries()[name]
    orig = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        on = _canon(spec.build(spark, sf_dir))
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        off = _canon(spec.build(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", orig)
    assert on == off


def test_canonical_hash_partition_invariant(spark, sf_dir):
    """The canonical hashing sink must yield one hash for one logical
    result regardless of physical layout (SURVEY §2.4)."""
    from distributed_map_reduce_spark.oracle import canonical_hash

    df = all_queries()["q4_pricing_summary"].build(spark, sf_dir)
    h1 = canonical_hash(df)
    h2 = canonical_hash(df.repartition(7))
    h3 = canonical_hash(df.coalesce(1))
    assert h1 == h2 == h3
    assert len(h1) == 64
