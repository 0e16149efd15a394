"""Streaming/batch agreement: the Structured Streaming q14 twin must
produce exactly the batch q14 result once the backlog drains
(availableNow). This is the streaming analog of the reference's
sequential-vs-distributed differential."""

from distributed_map_reduce_spark.registry import all_queries
from distributed_map_reduce_spark.streaming.events_stream import (
    hourly_windows_stream,
    run_available_now,
)


def _canon(rows, cols):
    return sorted(tuple(str(r[c]) for c in cols) for r in rows)


def test_stream_equals_batch(spark, sf_dir, tmp_path):
    stream_df = hourly_windows_stream(spark, sf_dir)
    run_available_now(stream_df, str(tmp_path / "ckpt"), "hourly_stream_out")
    got = spark.table("hourly_stream_out").collect()

    batch = all_queries()["q14_hourly_windows"].build(spark, sf_dir).collect()
    cols = ["w", "event_type", "n", "total"]
    assert _canon(got, cols) == _canon(batch, cols)
    assert len(got) > 0
