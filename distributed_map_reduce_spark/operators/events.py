"""Event-table queries: time bucketing (Q14) and JSON extraction (Q15).

Q14 is the deterministic batch twin of the Structured Streaming path
(``distributed_map_reduce_spark.streaming``): the same tumbling-window
aggregation expressed with date_trunc so a DuckDB oracle can check it.
The streaming module runs the *same* logical aggregation with
``window()`` + watermark; tests assert batch/stream agreement — the
oracle can't run a stream, so the hash gate lives here.

Scale notes: events at 100 TB arrive time-partitioned; date_trunc
bucketing aggregates within natural partition boundaries (no repartition
by time needed), and get_json_object is a codegen-friendly JSON path
scan — no Python, no full JSON parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import QuerySpec
from ..sources import load_table


def q14_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .orderBy("w", "event_type")
    )


Q14_ORACLE = """
SELECT DATE_TRUNC('hour', ts) AS w,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 2) AS total
FROM events
GROUP BY DATE_TRUNC('hour', ts), event_type
ORDER BY w, event_type
"""


def q15_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(
                F.get_json_object("props", "$.k").cast("bigint")
            ).alias("sum_k")
        )
        .orderBy("event_type")
    )


Q15_ORACLE = """
SELECT event_type,
       SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS sum_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""

QUERIES = [
    QuerySpec("q14_hourly_windows", q14_hourly_windows, Q14_ORACLE,
              "tumbling 1h event windows (batch twin of the streaming path)",
              ("events", "window", "streaming-twin")),
    QuerySpec("q15_json_extract", q15_json_extract, Q15_ORACLE,
              "JSON property extraction + aggregation over events.props",
              ("events", "json")),
]
