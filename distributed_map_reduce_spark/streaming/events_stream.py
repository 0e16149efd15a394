"""Structured Streaming twin of the batch event queries.

The reference has no streaming at all (SURVEY §2.3); this module is the
Spark-native answer: the SAME logical aggregation as q14 (tumbling 1 h
windows over events) expressed as a stream with a watermark, runnable
with Trigger.availableNow over the parquet table so tests can assert
batch/stream agreement (the oracle can't run a stream — the hash gate
lives on q14; here the contract is stream == batch).

Scale notes: at 100 TB/day the same code reads Kafka instead of
parquet — only ``readStream`` options change. The watermark bounds
state: windows older than (max event time - 10 min) are finalized and
evicted. 'append' output mode emits each window exactly once, on
watermark passage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# readStream needs an explicit schema (no inference on streams). ts is
# physically TIMESTAMP(NANOS) -> read as long under nanosAsLong, convert
# exactly like sources/tables.py does for batch.
_EVENTS_PHYS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The file-stream source requires a directory; target the sf dir and
    # glob-filter down to the events table file.
    raw = (
        spark.readStream.schema(_EVENTS_PHYS)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir.rstrip("/"))
    )
    # NOTE: stays TIMESTAMP (ltz) here — watermarks require it
    # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on NTZ). Session tz is UTC, so
    # wall-clock values equal the batch NTZ path; outputs cast back.
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def hourly_windows_stream(
    spark: SparkSession, sf_dir: str, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming q14: tumbling 1 h windows, late data bounded by the
    watermark. Returns the unstarted streaming DataFrame."""
    ev = events_stream(spark, sf_dir)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("w"),
            "event_type",
            "n",
            "total",
        )
    )


def run_available_now(
    stream_df: DataFrame, checkpoint_dir: str, table_name: str = "stream_out"
) -> None:
    """Drain the stream with Trigger.availableNow into an in-memory
    table; blocks until the backlog is fully processed."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
