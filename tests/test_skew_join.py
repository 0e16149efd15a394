"""AQE skew-join engagement (SCALE.md ground rules): when one join key
dominates, the skewed shuffle partition must be split at runtime
(`skew=true` in the final plan) and results must stay correct. The
thresholds are lowered so the planted whale key trips them at test
scale — at 100 TB the defaults (256 MB partitions) play this role."""

import pyspark.sql.functions as F


def test_skew_join_splits_hot_partition(spark):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    }
    orig = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # whale key 0: 50k rows; 100 uniform keys: 100 rows each
        left = spark.range(50_000).select(
            F.when(F.col("id") < 40_000, 0)
            .otherwise((F.col("id") % 100) + 1)
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(101).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
        # correctness: every left row matches exactly one right row
        grouped = (
            left.join(right, "k").groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        )
        rows = {r["k"]: r["n"] for r in grouped.collect()}
        assert rows[0] == 40_000 and sum(rows.values()) == 50_000

        # skew engagement: a plan whose downstream does NOT require the
        # join key's partitioning (AQE refuses to split when splitting
        # would force an extra shuffle — e.g. a groupBy on the join key).
        # summing length(pad) keeps the wide column in the shuffle:
        # column pruning would otherwise shrink the hot partition below
        # the skew threshold (40k identical keys compress to ~nothing)
        df = left.join(right, "k").agg(
            F.sum("v").alias("s"), F.sum(F.length("pad")).alias("p")
        )
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE skew-join did not engage"
    finally:
        for k, v in orig.items():
            spark.conf.set(k, v)
