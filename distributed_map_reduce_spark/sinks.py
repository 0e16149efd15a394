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


def compact_parquet_dir(
    spark,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: tuple[str, ...] = (),
) -> int:
    """Rewrite a small-files parquet directory into ~target-sized files;
    returns the output file count.

    The small-files problem is the dual of the monolith problem: a
    1000-executor streaming/append pipeline leaves thousands of KB-scale
    files per partition, and every later scan pays per-file open/footer
    costs that dwarf the data read (driver-side listing + task-per-file
    scheduling at 100 TB is hours). Compaction = one read + one
    repartition to ceil(bytes/target) + one write; ``sort_within_by``
    optionally re-clusters rows inside each output file so row-group
    min/max stats stay narrow (tests/test_data_skipping.py is the
    companion property). File count derives from the SOURCE byte size —
    cheap directory metadata, no data pass — so the compaction plan is
    one job end to end.
    """
    import math
    import os

    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(src)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src)
    df = df.repartition(n_files)
    if sort_within_by:
        df = df.sortWithinPartitions(*sort_within_by)
    df.write.mode("overwrite").parquet(dst)
    return len(
        [
            f
            for r, _, fs in os.walk(dst)
            for f in fs
            if f.endswith(".parquet")
        ]
    )


def zorder_value(df: DataFrame, cols: tuple[str, ...], n_bits: int = 12):
    """Morton (Z-order) curve value over ``cols`` as a long Column.

    Each column is min-max scaled to an ``n_bits`` integer, then the
    bits are interleaved (column i contributes bit b to position
    ``b * len(cols) + i``) — the classic multi-dimensional clustering
    key (Morton 1966; the layout primitive behind Delta/Iceberg
    OPTIMIZE ZORDER BY). Rows close on the curve are close in EVERY
    dimension, so row-group min/max stats stay narrow on all of them at
    once — single-column sort can only do this for its leading column.

    The per-column min/max is one tiny aggregate (driver-side planning
    metadata, same class as AQE's size stats — NOT a per-row collect);
    the z-value itself is a fully unrolled shiftleft/AND/OR expression,
    whole-stage codegen, no Python. n_bits * len(cols) must fit a long
    (<= 63).
    """
    from pyspark.sql import functions as F

    if n_bits * len(cols) > 63:
        raise ValueError("n_bits * len(cols) must be <= 63")
    stats = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).first()
    top = (1 << n_bits) - 1
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        mn = float(stats[f"mn_{c}"])
        mx = float(stats[f"mx_{c}"])
        span = (mx - mn) or 1.0
        q = F.least(
            F.lit(top).cast("long"),
            F.greatest(
                F.lit(0).cast("long"),
                F.floor((F.col(c) - mn) / span * top + 0.5).cast("long"),
            ),
        )
        for b in range(n_bits):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, ...],
    n_bits: int = 12,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered on the Z-order curve of ``cols``.

    ``repartitionByRange`` on the z-value gives each output file a
    disjoint curve segment (≈ a spatial tile), and the within-partition
    sort keeps row groups narrow inside each file — so predicates on
    ANY of ``cols`` skip most files/row groups via parquet min/max
    stats. This is the storage-layout half of the 100 TB scan story
    that partitioning (categorical dirs) and single-column sorting
    (one dimension) cannot cover: multi-dimensional numeric filters.
    """
    z = zorder_value(df, cols, n_bits).alias("_z")
    out = df.select("*", z)
    out = (
        out.repartitionByRange(num_files, "_z")
        if num_files
        else out.repartitionByRange("_z")
    )
    out.sortWithinPartitions("_z").drop("_z").write.mode(mode).parquet(path)
