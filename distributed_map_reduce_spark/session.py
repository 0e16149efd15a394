"""SparkSession factory.

One place to encode the execution posture of the engine so every entry
point (driver contract, bench, tests) runs with the same configuration.

Scale notes (the configs below are chosen for a 1000-executor / 100 TB
deployment and merely *also* work on local[32]):

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast conversion are the main levers that keep the
  declared query suite healthy when the input grows 1000x.
- Arrow on: every Pandas-UDF path (similarity search, multimodal decode)
  moves batches over Arrow instead of pickled rows.
- UTC session timezone: timestamp semantics must not depend on the host.
- shuffle.partitions is a *default*, not a schema property; at cluster
  scale it should be ~2-3x total cores, and AQE coalesces the excess.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "distributed-map-reduce-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    when no cluster master is supplied — on a real cluster the deploy
    environment sets the master and this factory only applies SQL conf.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE sizes post-shuffle partitions by SHUFFLE BYTES, which
        # under-estimates stages whose per-row cost is compute (e.g. an
        # array_intersect verify over candidate pairs: 310k pairs
        # compress to ~3 MB and coalesced to 3 tasks, serializing ~3 s
        # of set intersections — measured on q104 at sf0.1, 6.5 s ->
        # 3.2 s with the floor lowered). parallelismFirst (default on)
        # already targets core-count partitions but respects this
        # minimum size; 64k only bites on small-but-expensive
        # intermediates. At cluster scale large shuffles still get
        # size-targeted partitions (total/parallelism >> 1 MB), so this
        # floor is inert there.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # parquet scans: vectorized reader + pushdown are on by default,
        # keep them pinned so a cluster-side conf can't silently regress.
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        # TIMESTAMP(NANOS) parquet (events.ts) reads as int64; sources/
        # tables.py truncates ns->us. An engine-level posture, declared
        # here — NOT flipped as a read side effect — because Spark
        # consults it again at execution time, so a set/restore scoped
        # to the (lazy) read would break the later action.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local mode: don't spam the console
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
