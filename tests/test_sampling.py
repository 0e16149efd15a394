"""Statistical contracts for the sampling operators: seeded determinism,
per-stratum rate honored within binomial tolerance, provenance intact."""

import pyspark.sql.functions as F

from distributed_map_reduce_spark.operators.sampling import (
    stratified_sample,
    weighted_corpus_mix,
)
from distributed_map_reduce_spark.sources import load_table

SF = "/root/testdata/sf0.01"  # enough rows for tolerance bounds


def test_stratified_sample_rates_and_determinism(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "lang")
    fractions = {"en": 0.5, "de": 0.2}
    s1 = stratified_sample(docs, "lang", fractions, seed=7)
    s2 = stratified_sample(docs, "lang", fractions, seed=7)
    assert sorted(r["doc_id"] for r in s1.collect()) == sorted(
        r["doc_id"] for r in s2.collect()
    )

    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    kept = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # strata not in the fraction map are dropped entirely
    assert set(kept) <= set(fractions)
    for lang, frac in fractions.items():
        n, k = totals[lang], kept.get(lang, 0)
        sigma = (n * frac * (1 - frac)) ** 0.5
        assert abs(k - n * frac) <= 5 * sigma + 1, (lang, k, n)


def test_weighted_mix_provenance_and_rates(spark):
    docs = load_table(spark, SF, "documents").select("doc_id")
    events = load_table(spark, SF, "events").select(
        F.col("event_id").alias("doc_id")
    )
    mix = weighted_corpus_mix({"docs": (docs, 1.0), "events": (events, 0.25)})
    by_src = {r["mix_source"]: r["n"] for r in mix.groupBy("mix_source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert by_src["docs"] == docs.count()  # rate 1.0 keeps everything
    n = events.count()
    sigma = (n * 0.25 * 0.75) ** 0.5
    assert abs(by_src["events"] - n * 0.25) <= 5 * sigma + 1
