"""Binary / multimodal source layer.

Whole-file binary reading — the closest Spark analog to the reference's
one-file-per-map-task input model (/root/reference/src/mr/rpc.go:219-228,
file slurped whole at worker.go:221-232), generalized to opaque media
payloads: ``spark.read.format("binaryFile")`` yields
(path, modificationTime, length, content binary).

Scale note: binaryFile does NOT split files; parallelism = file count.
For 100 TB of media that is exactly right (millions of objects), and
``maxPartitionBytes``/``filesMaxPartitionNum`` shape the task sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata contract for media rows flowing through the engine.
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image/audio/video/...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)


def read_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Read a directory of opaque files as (path, length, content, ...)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_whole_text_files(spark: SparkSession, path: str, glob: str | None = None):
    """RDD of (filename, contents) — the reference's exact input contract
    (one whole file per map task, `mrworker wc.so pg-*.txt`): F1 as a
    disk source for :func:`operators.mapreduce.map_reduce`.

    Built on the binaryFile DataFrame source (not ``sc.wholeTextFiles``)
    so glob filtering, pruning, and file-listing parallelism come from
    the same code path as the media reader above.
    """
    import os

    df = read_binary_dir(spark, path, glob)
    return df.select("path", "content").rdd.map(
        lambda r: (os.path.basename(r[0]), bytes(r[1]).decode("utf-8", "replace"))
    )


def media_from_binary_files(df: DataFrame, media_type: str) -> DataFrame:
    """Lift a binaryFile frame into the MEDIA_SCHEMA contract (metadata
    unknown until decode — nulls, filled by operators.multimodal)."""
    return df.select(
        F.abs(F.xxhash64("path")).alias("media_id"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
