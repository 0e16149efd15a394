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


QUERIES = [
    QuerySpec("sketch_distinct_parts", approx_distinct_parts, None,
              "HyperLogLog++ distinct partkeys per returnflag (approx twin of q19)",
              ("sketch", "approx")),
    QuerySpec("sketch_price_quantiles", approx_price_quantiles, None,
              "approx_percentile p50/p90/p99 of order totalprice per status",
              ("sketch", "approx")),
]
