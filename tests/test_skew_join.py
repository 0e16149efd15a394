"""AQE skew-join engagement (SCALE.md ground rules): when one join key
dominates, the skewed shuffle partition must be split at runtime
(`skew=true` in the final plan) and results must stay correct. The
thresholds are lowered so the planted whale key trips them at test
scale — at 100 TB the defaults (256 MB partitions) play this role."""

import pyspark.sql.functions as F

from distributed_map_reduce_spark.registry import all_queries


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


def test_q77_skew_join_splits_hot_doc_partition(spark, tmp_path):
    """The skew demo on a REAL registry query (VERDICT r4 item 7): a
    dup-magnet corpus — one hub document every other doc near-dups, so
    every q24 pair carries ad = hub — makes q77's pair/decoration joins
    whale-keyed. With broadcast off (forcing the shuffled-join path a
    100 TB doc map takes) AQE must split the hot partition
    (skew=true) and the source matrix must stay exact."""
    n_sat = 800
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2KB",
    }
    orig = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # hub doc 0 = 8 boilerplate words (6 shingles); satellite doc i =
        # boilerplate + 5 unique words => J(i, hub) = 6/11 >= 0.5 but
        # J(i, j) = 6/16 < 0.5: the ONLY pairs are (0, i), a whale ad key.
        # Words are letters-only: the suite tokenizer splits on
        # [^a-zA-Z]+, so digit-distinguished words would collapse.
        def _letters(n):
            s = ""
            while True:
                s += chr(97 + n % 26)
                n //= 26
                if n == 0:
                    return s

        abc = "abcdefgh"
        boiler = " ".join(f"common{c}" for c in abc)
        rows = [(0, "hub", boiler)] + [
            (
                i,
                f"crawl{i % 2}",
                boiler
                + " "
                + " ".join(f"uq{_letters(i)}x{c}" for c in abc[:5]),
            )
            for i in range(1, n_sat + 1)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
        # multi-file write: a skewed reduce partition is split along map-
        # output chunk boundaries, so a single-mapper shuffle (1 input
        # file at this scale) is unsplittable and AQE correctly declines
        docs.repartition(4).write.parquet(f"{tmp_path}/documents.parquet")

        df = all_queries()["q77_source_dup_matrix"].build(spark, str(tmp_path))
        got = {
            (r["source_a"], r["source_b"]): r["n_pairs"] for r in df.collect()
        }
        # every satellite pairs with the hub exactly once, sources
        # fold canonically: (crawl0, hub) and (crawl1, hub)
        assert got == {("crawl0", "hub"): n_sat // 2, ("crawl1", "hub"): n_sat // 2}
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE skew-join did not engage on q77"
    finally:
        for k, v in orig.items():
            spark.conf.set(k, v)
