"""Partition-pruning layout (SCALE.md / SURVEY §7 M6): a hive-
partitioned event layout must prune at the scan — the filter lands in
``PartitionFilters`` and non-matching partitions are never listed as
input files. At 100 TB date/type partitioning is the difference between
scanning a day and scanning the lake."""

import pyspark.sql.functions as F

from distributed_map_reduce_spark.plans.inspect import formatted_plan
from distributed_map_reduce_spark.sources import load_table


def test_partitioned_layout_prunes_scan(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_type")
    ev.write.partitionBy("event_type").parquet(out)

    df = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan
    # the partition predicate must appear in PartitionFilters, and the
    # pruned scan must read only the one matching directory
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "event_type" in pf_line

    n_purchase = df.count()
    n_all = ev.filter(F.col("event_type") == "purchase").count()
    assert n_purchase == n_all > 0
