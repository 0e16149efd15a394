"""Sketch aggregates — the approximate counterparts of the exact queries.

At 100 TB exact COUNT(DISTINCT) (q19) shuffles every distinct key and
exact percentiles need a full sort; the sketch versions partial-
aggregate a constant-size state map-side (HyperLogLog++ registers,
KLL/GK quantile summaries) and merge — one narrow shuffle of sketches,
no key explosion. Approximations can never hash-match an exact oracle
(SURVEY §2.4 Q19 note), so these register rows-only; their accuracy
contract lives in tests/test_sketches.py against the exact queries
(HLL++ rsd<=2.5%, percentile within the value span of adjacent exact
quantiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import QuerySpec
from ..sources import load_table

HLL_RSD = 0.02  # target relative standard deviation for HLL++


def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch twin of q19: approx_count_distinct(l_partkey) per
    returnflag (HyperLogLog++)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_partkey")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=HLL_RSD).alias(
                "approx_parts"
            )
        )
        .orderBy("l_returnflag")
    )


def approx_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-price quantile sketch: approx_percentile keeps a bounded
    summary per group instead of sorting the column."""
    o = load_table(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.percentile_approx(
                "o_totalprice", [0.5, 0.9, 0.99], 10000
            ).alias("p50_p90_p99")
        )
        .orderBy("o_orderstatus")
    )


HH_SUPPORT = 0.002  # report tokens above ~0.2% of total occurrences


def approx_heavy_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters over the token stream: `freqItems` (Karp-
    Papadimitriou-Shenker counter-decrement, the deterministic cousin of
    count-min) finds every token whose frequency exceeds the support
    threshold in one pass with O(1/support) state per partition — no
    full token->count shuffle. Output is the candidate set (may include
    false positives, never false negatives); the accuracy test checks
    it against exact counts. One narrow column, support sized so the
    state map stays ~500 entries regardless of corpus size."""
    from ..functions.text import SPARK_TOKS_EXPR

    docs = load_table(spark, sf_dir, "documents").select("text")
    toks = docs.select(F.explode(F.expr(SPARK_TOKS_EXPR)).alias("token"))
    hits = toks.freqItems(["token"], support=HH_SUPPORT)
    return hits.select(
        F.explode(F.sort_array("token_freqItems")).alias("token")
    )


def hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches (Apache DataSketches HLL via
    hll_sketch_agg / hll_union_agg) — the 100 TB pattern the plain
    approx_count_distinct can't do: materialize one binary sketch PER
    SOURCE (a pre-aggregated sketch table maintained incrementally as
    crawls land), then answer "distinct tokens overall" by UNIONING the
    stored sketches — no re-scan of the corpus. Emits each source's
    estimate plus the union row ('ALL'), with the sketch byte size.

    Scale shape: one explode+groupBy builds the per-source sketches
    (shuffle carries sketch partials, not tokens); the union aggregate
    reduces n_sources sketch blobs — bytes, not data. The same two
    operators power cross-DAY or cross-SHARD rollups of any stored
    sketch table."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    per_source = toks.groupBy("source").agg(
        F.hll_sketch_agg("tok").alias("sk")
    )
    per_row = per_source.select(
        "source",
        F.hll_sketch_estimate("sk").alias("est_distinct"),
        F.octet_length("sk").alias("sketch_bytes"),
    )
    union_row = per_source.agg(
        F.hll_union_agg("sk").alias("sk")
    ).select(
        F.lit("ALL").alias("source"),
        F.hll_sketch_estimate("sk").alias("est_distinct"),
        F.octet_length("sk").alias("sketch_bytes"),
    )
    return per_row.unionByName(union_row).orderBy("source")


QUERIES = [
    QuerySpec("sketch_hll_union", hll_sketch_union, None,
              "per-source DataSketches HLL sketches + union rollup "
              "(mergeable distinct counts; rows-only, accuracy-tested)",
              ("sketch", "approx", "mergeable")),
    QuerySpec("sketch_distinct_parts", approx_distinct_parts, None,
              "HyperLogLog++ distinct partkeys per returnflag (approx twin of q19)",
              ("sketch", "approx")),
    QuerySpec("sketch_price_quantiles", approx_price_quantiles, None,
              "approx_percentile p50/p90/p99 of order totalprice per status",
              ("sketch", "approx")),
    QuerySpec("sketch_heavy_tokens", approx_heavy_tokens, None,
              "freqItems heavy-hitter tokens above 0.2% support (no false negatives)",
              ("sketch", "approx")),
]
