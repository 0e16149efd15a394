"""Runtime bloom-filter join pruning (semi-join reduction).

At 100 TB the dominant cost of a selective fact⋈dim shuffle join is
shuffling fact rows that the dim filter will discard anyway. Spark's
runtime filtering injects a bloom filter built from the (filtered)
creation side into the fact-side scan (``might_contain`` predicate), so
those rows die before the exchange. The optimizer gates injection on
size thresholds (application side > 10 GB by default) that local test
data never meets, so this test pins the *mechanism* with thresholds
opened — on a derived session, since the thresholds are not settings
the engine should force globally.
"""

from pyspark.sql import functions as F

from distributed_map_reduce_spark.plans.inspect import formatted_plan

SF = "/root/testdata/sf0.01"


def test_bloom_filter_reduces_fact_side_before_shuffle(spark):
    ns = spark.newSession()
    ns.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    ns.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold",
        "0",
    )
    ns.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "100MB",
    )
    # force a shuffle join: broadcast joins don't need runtime filters
    ns.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    li = ns.read.parquet(f"{SF}/lineitem.parquet")
    o = ns.read.parquet(f"{SF}/orders.parquet").filter(
        "o_orderpriority = '1-URGENT' AND o_totalprice > 150000"
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert "might_contain" in formatted_plan(j), (
        "runtime bloom filter not injected into the fact-side scan"
    )

    # the filter is a pure reduction: results equal the plain join
    plain = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF}/orders.parquet").filter(
                "o_orderpriority = '1-URGENT' AND o_totalprice > 150000"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))
