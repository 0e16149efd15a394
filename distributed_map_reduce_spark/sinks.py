"""Sinks: training-shard writer.

The reference's only sink is the ``key value`` text file pair
(/root/reference/src/mr/worker.go:183-216, covered by
``operators.mapreduce.write_mr_output``). The pipeline-grade sink a
100 TB corpus actually ships through is layout-aware parquet:
partitioned by the columns queries filter on (split, source), with
bounded file sizes so a 1000-executor write neither emits million-file
partitions nor 100 GB monoliths.

``write_training_shards`` is deliberately thin over the built-in
writer: ``partitionBy`` gives Hive-style directories (=> partition
PRUNING on every later read that filters on those columns — the scan
never lists the other shards), ``maxRecordsPerFile`` bounds file size
without an extra repartition job, and parquet stats give row-group
pushdown within each shard. The value is the pinned contract, tested in
``tests/test_sinks.py``: layout on disk, lossless read-back, and
pruned reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_training_shards(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("split", "source"),
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a partitioned parquet shard tree.

    At cluster scale, callers should repartition on ``partition_by``
    first when the incoming distribution is row-scattered (otherwise
    every task writes a file into every partition directory — the
    small-files explosion); for already-clustered data the extra
    shuffle is wasted, so the choice stays with the caller.
    """
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )
