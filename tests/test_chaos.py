"""Fault-tolerance: results survive task failures.

Port of the reference's crash test (test-mr.sh:284-330: workers exit
with p=1/3 mid-task; final output must equal the no-crash golden run).
Spark's analog: a map function that fails on first attempt per
partition; with spark.task.maxFailures=2 (conftest master local[4,2])
the retry succeeds and output must equal the clean run — also proving
no duplicated emission from the failed attempt (the reference's
exactly-once output property, worker.go:184-216).
"""

import os
import tempfile

from distributed_map_reduce_spark.operators.mapreduce import (
    map_reduce,
    wc_map,
    wc_reduce,
)

DOCS = [(f"doc-{i}", "alpha beta beta gamma " * (i + 1)) for i in range(8)]


def _rows(df):
    return sorted((r["key"], r["value"]) for r in df.collect())


def test_output_identical_under_task_failures(spark):
    golden = _rows(map_reduce(spark, DOCS, wc_map, wc_reduce, n_reduce=4))

    marker_dir = tempfile.mkdtemp(prefix="mr-chaos-")

    def crashing_map(name: str, contents: str):
        # The first attempt of each map TASK dies (the reference kills
        # whole worker processes, crash.go:20-32 os.Exit(1) — a task, not
        # a record, is the failure unit); the re-dispatched attempt
        # completes. One marker per partition keeps failures within
        # maxFailures=2.
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        marker = os.path.join(marker_dir, f"p{pid}")
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("attempted")
            raise RuntimeError(f"injected crash in partition {pid}")
        return wc_map(name, contents)

    chaotic = _rows(map_reduce(spark, DOCS, crashing_map, wc_reduce, n_reduce=4))
    assert chaotic == golden
    # at least one partition actually crashed and was re-run
    assert len(os.listdir(marker_dir)) >= 1


def test_dataframe_path_survives_udf_task_failures(spark, sf_dir):
    """Same property on the DataFrame/Arrow path: a mapInPandas stage
    whose first attempt per partition dies mid-stream must retry to the
    identical result (Spark task retry + deterministic lineage — the
    crash test of the engine's Pandas-UDF operators)."""
    from distributed_map_reduce_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    golden = sorted(tuple(r) for r in docs.collect())

    marker_dir = tempfile.mkdtemp(prefix="df-chaos-")

    def flaky(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        marker = os.path.join(marker_dir, f"p{pid}")
        first_attempt = not os.path.exists(marker)
        if first_attempt:
            with open(marker, "w") as f:
                f.write("attempted")
        for i, pdf in enumerate(batches):
            if first_attempt and i == 0:
                raise RuntimeError(f"injected crash in partition {pid}")
            yield pdf

    out = docs.repartition(4).mapInPandas(flaky, "doc_id long, n_chars long")
    assert sorted(tuple(r) for r in out.collect()) == golden
    assert len(os.listdir(marker_dir)) >= 1


def test_file_sink_commit_is_atomic_under_failures(spark, sf_dir, tmp_path):
    """The A6 early_exit property (output visible == output final,
    worker.go:184-216 rename-commit): a file sink fed by a stage whose
    first attempt per partition crashes AFTER emitting rows must end up
    with exactly the golden rows — the failed attempt's partially
    written files are never committed — and no in-progress remnants
    survive in the output directory."""
    from distributed_map_reduce_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    golden = sorted(tuple(r) for r in docs.collect())

    marker_dir = tempfile.mkdtemp(prefix="sink-chaos-")

    def flaky(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        marker = os.path.join(marker_dir, f"p{pid}")
        first_attempt = not os.path.exists(marker)
        if first_attempt:
            with open(marker, "w") as f:
                f.write("attempted")
        emitted = False
        for pdf in batches:
            yield pdf  # rows reach the writer BEFORE the crash
            emitted = True
        if first_attempt and emitted:
            raise RuntimeError(f"injected crash in partition {pid} post-emit")

    out_dir = str(tmp_path / "out")
    (
        docs.repartition(4)
        .mapInPandas(flaky, "doc_id long, n_chars long")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    assert len(os.listdir(marker_dir)) >= 1  # failures actually happened
    got = sorted(tuple(r) for r in spark.read.parquet(out_dir).collect())
    assert got == golden
    leftovers = [f for f in os.listdir(out_dir) if "_temporary" in f]
    assert leftovers == []


def test_output_identical_under_python_worker_process_death(spark, sf_dir):
    """REAL process-kill chaos (not an injected exception): the first
    attempt per partition os._exit(1)s the Python worker mid-task — the
    direct analog of the reference's crash app, which os.Exit(1)s whole
    worker processes with p=1/3. Spark must detect the dead worker, re-
    dispatch the task, and produce output identical to the clean run."""
    from distributed_map_reduce_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    golden = sorted(tuple(r) for r in docs.collect())

    marker_dir = tempfile.mkdtemp(prefix="procdeath-chaos-")

    def killer(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        marker = os.path.join(marker_dir, f"p{pid}")
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            first_attempt = True
        except FileExistsError:
            first_attempt = False
        for i, pdf in enumerate(batches):
            if first_attempt:
                os._exit(1)  # kill the worker process, no cleanup
            yield pdf

    out = docs.repartition(4).mapInPandas(killer, "doc_id long, n_chars long")
    assert sorted(tuple(r) for r in out.collect()) == golden
    assert len(os.listdir(marker_dir)) >= 1


def test_executor_jvm_death_triggers_shuffle_refetch(tmp_path):
    """Executor-process death on a real multi-JVM cluster: a reduce-side
    task SIGKILLs its own executor JVM once; the lost map outputs force
    a FetchFailed -> map-stage recompute on the survivor, and the final
    result must equal the clean run — the closest Spark analog of the
    reference harness's kill-and-respawn loop (test-mr.sh:284-330).

    Runs in a subprocess because a local-cluster SparkContext cannot
    coexist with the session-scoped local[4,2] fixture in this JVM."""
    import json
    import subprocess
    import sys

    script = os.path.join(
        os.path.dirname(__file__), "chaos_executor_kill.py"
    )
    proc = subprocess.run(
        [sys.executable, script],
        capture_output=True,
        text=True,
        timeout=420,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert proc.returncode == 0, (
        f"subprocess failed\nstdout: {proc.stdout[-2000:]}"
        f"\nstderr: {proc.stderr[-2000:]}"
    )
    result = json.loads(lines[-1])
    assert result["killed"] is True, "no executor was actually killed"
    assert result["match"] is True, "post-kill result diverged from golden"


def test_docrange_stream_survives_task_failures(spark, sf_dir, tmp_path):
    """Streaming analog of the map-task crash test: every partition's
    FIRST read(partition) attempt dies inside the custom Python
    streaming DataSource (sources/pystreamsource.py); task retry
    (maxFailures=2) must re-read each row range deterministically, so
    the drained corpus is delivered exactly once — nothing lost to the
    failed attempts and nothing duplicated by the retries. This is the
    task-level half of q212's exactly-once story (the batch-replay half
    lives in tests/properties/test_round12_properties.py)."""
    from distributed_map_reduce_spark.sources.pystreamsource import (
        DocRangeStreamDataSource,
        _DocRangeStreamReader,
    )

    marker_dir = str(tmp_path / "markers")
    os.makedirs(marker_dir)

    class _ChaosReader(_DocRangeStreamReader):
        def read(self, partition):
            # one marker per row range: the first attempt dies, the
            # re-dispatched attempt re-reads the SAME [begin, end) and
            # completes (a task, not a record, is the failure unit)
            marker = os.path.join(marker_dir, f"b{partition.begin}")
            if not os.path.exists(marker):
                with open(marker, "w") as f:
                    f.write("attempted")
                raise RuntimeError(
                    f"injected crash at row {partition.begin}"
                )
            yield from super().read(partition)

    class _ChaosSource(DocRangeStreamDataSource):
        @classmethod
        def name(cls):
            return "docrange_chaos"

        def streamReader(self, schema):
            return _ChaosReader(self.options)

    spark.dataSource.register(_ChaosSource)
    path = f"{sf_dir.rstrip('/')}/documents.parquet"
    src = (
        spark.readStream.format("docrange_chaos")
        .option("path", path)
        .option("partitionRows", "100")
        .load()
    )
    q = (
        src.writeStream.format("memory")
        .queryName("chaos_docrange")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("chaos_docrange")
    want = spark.read.parquet(path).count()
    assert got.count() == want
    assert got.select("doc_id").distinct().count() == want
    # at least one partition actually crashed and was re-run
    assert len(os.listdir(marker_dir)) >= 1


def test_foreachbatch_sink_survives_write_task_failures(spark, sf_dir, tmp_path):
    """Sink-side chaos for q219's recipe: the first attempt of every
    per-batch WRITE task dies mid-batch; Spark's task retry
    (maxFailures=2) plus the parquet committer must land each
    batchId-keyed directory exactly once — the drained union equals
    the corpus with no loss and no duplication. Composes the two
    exactly-once layers the registered query relies on: task-level
    retry inside a batch (this test) and batch-level replay across
    restarts (the checkpoint-surgery probe in
    tests/properties/test_r13_candidate_probes.py)."""
    import glob

    from distributed_map_reduce_spark.sources.pystreamsource import (
        register_docrange,
    )

    register_docrange(spark)
    marker_dir = str(tmp_path / "markers")
    os.makedirs(marker_dir)
    out = str(tmp_path / "out")
    os.makedirs(out)
    path = f"{sf_dir.rstrip('/')}/documents.parquet"
    src = (
        spark.readStream.format("docrange")
        .option("path", path)
        .option("partitionRows", "100")
        .load()
    )
    schema = "doc_id bigint, source string, lang string, n_chars bigint"

    def sink(batch_df, batch_id):
        def crash_once(batches):
            from pyspark import TaskContext

            ctx = TaskContext.get()
            marker = os.path.join(
                marker_dir, f"b{batch_id}-p{ctx.partitionId()}"
            )
            if not os.path.exists(marker):
                with open(marker, "w") as f:
                    f.write("attempted")
                raise RuntimeError(
                    f"injected crash in write task of batch {batch_id}"
                )
            yield from batches

        (
            batch_df.mapInPandas(crash_once, schema)
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"b{batch_id}"))
        )

    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    written = spark.read.parquet(*glob.glob(os.path.join(out, "b*")))
    want = spark.read.parquet(path).count()
    assert written.count() == want
    assert written.select("doc_id").distinct().count() == want
    assert len(os.listdir(marker_dir)) >= 1
