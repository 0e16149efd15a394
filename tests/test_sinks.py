"""Training-shard writer contract: Hive layout, lossless read-back,
partition-pruned reads, bounded files."""

import os

from pyspark.sql import functions as F

from distributed_map_reduce_spark.plans.inspect import formatted_plan
from distributed_map_reduce_spark.sinks import write_training_shards
from distributed_map_reduce_spark.sources import load_table


def _sharded(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = F.when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
    return docs.withColumn("split", split)


def test_shard_layout_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    df = _sharded(spark, sf_dir)
    out = str(tmp_path / "shards")
    write_training_shards(
        df, out, partition_by=("split", "source"), max_records_per_file=50
    )

    # Hive-style layout: split=<v>/source=<v> directories
    splits = sorted(d for d in os.listdir(out) if d.startswith("split="))
    assert splits == ["split=test", "split=train", "split=val"]
    train_sources = [
        d
        for d in os.listdir(os.path.join(out, "split=train"))
        if d.startswith("source=")
    ]
    assert train_sources, "no source partitions under split=train"

    # lossless read-back (partition columns come back as columns)
    back = spark.read.parquet(out)
    want = sorted(
        tuple(r) for r in df.select("doc_id", "split", "source").collect()
    )
    got = sorted(
        tuple(r) for r in back.select("doc_id", "split", "source").collect()
    )
    assert got == want

    # a filter on the partition column prunes at the source: the scan
    # carries it as a PartitionFilter, not a post-scan Filter
    q = back.filter(F.col("split") == "train").select("doc_id")
    plan = formatted_plan(q)
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters:" in l]
    assert pf_lines and "split" in pf_lines[0], (
        f"split filter not pushed to partition pruning: {pf_lines}"
    )
    n_train = q.count()
    n_all = back.count()
    assert 0 < n_train < n_all

    # maxRecordsPerFile held: no data file exceeds the cap
    for root, _dirs, files in os.walk(out):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            n = spark.read.parquet(os.path.join(root, f)).count()
            assert n <= 50, f"{f} has {n} rows > cap"


def test_compact_parquet_dir(spark, sf_dir, tmp_path):
    """Small-files compaction: a 40-file directory compacts to the
    byte-derived target count, loses no rows, and (with sort_within_by)
    re-clusters rows so row-group stats stay narrow."""
    import glob

    from distributed_map_reduce_spark.sinks import compact_parquet_dir
    from distributed_map_reduce_spark.sources import load_table

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    orders.repartition(40).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 40

    total_bytes = sum(
        __import__("os").path.getsize(f) for f in glob.glob(f"{src}/*.parquet")
    )
    n_out = compact_parquet_dir(
        spark, src, dst,
        target_file_bytes=(total_bytes + 1) // 2,  # ask for ~2 files
        sort_within_by=("o_orderkey",),
    )
    assert n_out == 2
    assert len(glob.glob(f"{dst}/*.parquet")) == 2

    want = sorted(r["o_orderkey"] for r in orders.collect())
    got = sorted(
        r["o_orderkey"] for r in spark.read.parquet(dst).collect()
    )
    assert got == want


def test_dynamic_partition_overwrite_replaces_only_touched_sources(
    spark, sf_dir, tmp_path
):
    """Incremental re-curation contract: rewriting ONE source's
    partition must leave every other source's files untouched —
    `partitionOverwriteMode=dynamic` overwrites only the partitions
    present in the incoming batch, where static mode would wipe the
    whole table root. This is how a 100 TB corpus re-processes a single
    crawl without rewriting the other 99%."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    out = str(tmp_path / "by_source")
    docs.write.partitionBy("source").parquet(out)
    before = spark.read.parquet(out)
    n_total = before.count()
    one = before.select("source").orderBy("source").first()["source"]
    n_one = before.filter(F.col("source") == one).count()

    orig = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            docs.filter(F.col("source") == one)
            .withColumn("n_chars", F.col("n_chars") + 1000000)
            .write.mode("overwrite")
            .partitionBy("source")
            .parquet(out)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", orig)

    after = spark.read.parquet(out)
    assert after.count() == n_total
    assert after.filter(F.col("source") == one).count() == n_one
    assert (
        after.filter(
            (F.col("source") == one) & (F.col("n_chars") < 1000000)
        ).count()
        == 0
    )
    assert (
        after.filter(
            (F.col("source") != one) & (F.col("n_chars") >= 1000000)
        ).count()
        == 0
    )
