"""Parallelism + exactly-once probes — ports of the reference's mtiming/
rtiming apps (concurrently-live worker check, mtiming.go:19-62) and the
jobcount app (no spurious re-execution, jobcount.go:22-32, asserted
exactly 8 invocations for 8 inputs in test-mr.sh:214)."""

import os
import tempfile
import time

from distributed_map_reduce_spark.operators.mapreduce import (
    map_reduce,
    wc_map,
    wc_reduce,
)

DOCS = [(f"doc-{i}", "alpha beta gamma " * 200) for i in range(8)]


def test_map_tasks_overlap(spark):
    """>=2 map tasks must be live simultaneously (the reference asserts
    its 2 workers overlapped). Each task records a [start, end] interval;
    a sleep makes overlap certain when tasks run concurrently."""
    probe_dir = tempfile.mkdtemp(prefix="mr-mtiming-")

    def probed_map(name: str, contents: str):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        t0 = time.monotonic()
        time.sleep(0.5)
        t1 = time.monotonic()
        with open(os.path.join(probe_dir, f"p{pid}"), "w") as f:
            f.write(f"{t0} {t1}")
        return wc_map(name, contents)

    map_reduce(spark, DOCS, probed_map, wc_reduce, n_reduce=4).collect()

    spans = []
    for p in os.listdir(probe_dir):
        with open(os.path.join(probe_dir, p)) as f:
            a, b = f.read().split()
            spans.append((float(a), float(b)))
    assert len(spans) >= 2
    spans.sort()
    overlaps = sum(
        1 for (a0, a1), (b0, _) in zip(spans, spans[1:]) if b0 < a1
    )
    assert overlaps >= 1, f"no two map tasks overlapped: {spans}"


def test_exactly_once_map_invocation(spark):
    """A clean run invokes the map function exactly once per input — the
    jobcount property: no speculative/spurious re-execution inflates the
    count (accumulators count attempts, so retries WOULD show up)."""
    acc = spark.sparkContext.accumulator(0)

    def counting_map(name: str, contents: str):
        acc.add(1)
        return wc_map(name, contents)

    map_reduce(spark, DOCS, counting_map, wc_reduce, n_reduce=4).collect()
    assert acc.value == len(DOCS)
