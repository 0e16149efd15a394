"""The custom Python DataSource (format 'mrtext') — reference text I/O
contract as a pluggable Spark format.

Covers: per-file partition planning, whole-file reads, glob filtering,
SQL usability, writer part-file output (mr-out format), and equality
with the RDD-based whole-file reader the map_reduce() API uses.
"""

import os

import pytest
from pyspark.sql import functions as F

from distributed_map_reduce_spark.sources.binaryfile import (
    read_whole_text_files,
)
from distributed_map_reduce_spark.sources.pydatasource import register_mrtext


@pytest.fixture()
def text_dir(tmp_path):
    d = tmp_path / "books"
    d.mkdir()
    (d / "a.txt").write_text("the quick brown fox\n")
    (d / "b.txt").write_text("jumps over the lazy dog\n")
    (d / "c.log").write_text("not a book\n")
    return str(d)


def test_read_whole_files(spark, text_dir):
    register_mrtext(spark)
    df = spark.read.format("mrtext").load(text_dir)
    rows = {os.path.basename(r["path"]): r["text"] for r in df.collect()}
    assert rows == {
        "a.txt": "the quick brown fox\n",
        "b.txt": "jumps over the lazy dog\n",
        "c.log": "not a book\n",
    }


def test_one_partition_per_file(spark, text_dir):
    register_mrtext(spark)
    df = spark.read.format("mrtext").load(text_dir)
    assert df.rdd.getNumPartitions() == 3


def test_glob_filter(spark, text_dir):
    register_mrtext(spark)
    df = (
        spark.read.format("mrtext")
        .option("pathGlobFilter", "*.txt")
        .load(text_dir)
    )
    assert df.count() == 2


def test_matches_rdd_whole_text_reader(spark, text_dir):
    register_mrtext(spark)
    via_ds = {
        (os.path.basename(r["path"]), r["text"])
        for r in spark.read.format("mrtext")
        .option("pathGlobFilter", "*.txt")
        .load(text_dir)
        .collect()
    }
    via_rdd = {
        (os.path.basename(p), t)
        for p, t in read_whole_text_files(spark, text_dir, "*.txt").collect()
    }
    assert via_ds == via_rdd


def test_wordcount_over_mrtext(spark, text_dir):
    register_mrtext(spark)
    df = (
        spark.read.format("mrtext")
        .option("pathGlobFilter", "*.txt")
        .load(text_dir)
    )
    counts = {
        r["w"]: r["n"]
        for r in df.select(
            F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert counts["the"] == 2
    assert counts["fox"] == 1


def test_writer_emits_mr_out_part_files(spark, text_dir, tmp_path):
    register_mrtext(spark)
    out = str(tmp_path / "out")
    df = spark.createDataFrame(
        [("apple", 3), ("pear", 1)], "key string, n int"
    ).repartition(2)
    df.write.format("mrtext").mode("append").save(out)
    parts = sorted(os.listdir(out))
    assert all(p.startswith("mr-out-") for p in parts)
    lines = sorted(
        line
        for p in parts
        for line in open(os.path.join(out, p)).read().splitlines()
    )
    assert lines == ["apple 3", "pear 1"]


def test_writer_rejects_wrong_width(spark, tmp_path):
    register_mrtext(spark)
    df = spark.createDataFrame([(1, 2, 3)], "a int, b int, c int")
    with pytest.raises(Exception, match="two columns"):
        df.write.format("mrtext").mode("append").save(str(tmp_path / "x"))


def test_writer_atomic_under_task_failures(spark, tmp_path):
    """Every partition's FIRST write attempt dies after staging some
    rows; the retry must rewrite its range and commit() must promote
    only reported-success attempts — final content equals the clean
    run, and no staged orphan survives (the reference's atomic-rename
    discipline, worker.go:184-216, under the crash harness's rules)."""
    from distributed_map_reduce_spark.sources.pydatasource import (
        MRTextDataSource,
        _MRTextWriter,
        _STAGE_PREFIX,
    )

    marker_dir = str(tmp_path / "markers")
    os.makedirs(marker_dir)

    class _ChaosWriter(_MRTextWriter):
        def write(self, iterator):
            from pyspark import TaskContext

            ctx = TaskContext.get()
            pid = ctx.partitionId()
            marker = os.path.join(marker_dir, f"p{pid}")
            if not os.path.exists(marker):
                with open(marker, "w") as f:
                    f.write("attempted")
                # stage a PARTIAL file, then die: the orphan must never
                # be promoted to an mr-out name
                os.makedirs(self.path, exist_ok=True)
                staged = os.path.join(
                    self.path,
                    f"{_STAGE_PREFIX}{pid:05d}-{ctx.taskAttemptId()}",
                )
                rows = iter(iterator)
                with open(staged, "w", encoding="utf-8") as f:
                    first = next(rows, None)
                    if first is not None:
                        f.write(f"{first[0]} {first[1]}\n")
                raise RuntimeError(f"injected crash in write task {pid}")
            return super().write(iterator)

    class _ChaosSink(MRTextDataSource):
        @classmethod
        def name(cls):
            return "mrtext_chaos"

        def writer(self, schema, overwrite):
            return _ChaosWriter(self.options, overwrite)

    spark.dataSource.register(_ChaosSink)
    out = str(tmp_path / "out")
    df = spark.createDataFrame(
        [("apple", 3), ("pear", 1), ("plum", 7), ("fig", 2)],
        "key string, n int",
    ).repartition(2)
    df.write.format("mrtext_chaos").mode("append").save(out)

    parts = sorted(os.listdir(out))
    assert parts and all(p.startswith("mr-out-") for p in parts), parts
    lines = sorted(
        line
        for p in parts
        for line in open(os.path.join(out, p)).read().splitlines()
    )
    assert lines == ["apple 3", "fig 2", "pear 1", "plum 7"]
    assert len(os.listdir(marker_dir)) >= 1


def test_writer_abort_leaves_no_partial_output(spark, tmp_path):
    """When a write task exhausts maxFailures and the JOB aborts, the
    output directory must contain no mr-out part files and no staged
    orphans — a failed job is invisible to readers (output finality,
    the A6 property, on the pluggable sink)."""
    from distributed_map_reduce_spark.sources.pydatasource import (
        MRTextDataSource,
        _MRTextWriter,
        _STAGE_PREFIX,
    )

    class _AlwaysCrashWriter(_MRTextWriter):
        def write(self, iterator):
            from pyspark import TaskContext

            ctx = TaskContext.get()
            os.makedirs(self.path, exist_ok=True)
            staged = os.path.join(
                self.path,
                f"{_STAGE_PREFIX}00000-{ctx.taskAttemptId()}",
            )
            with open(staged, "w", encoding="utf-8") as f:
                f.write("partial 1\n")
            raise RuntimeError("injected crash on every attempt")

    class _AbortSink(MRTextDataSource):
        @classmethod
        def name(cls):
            return "mrtext_abort"

        def writer(self, schema, overwrite):
            return _AlwaysCrashWriter(self.options, overwrite)

    spark.dataSource.register(_AbortSink)
    out = str(tmp_path / "out")
    df = spark.createDataFrame([("apple", 3)], "key string, n int")
    with pytest.raises(Exception):
        df.write.format("mrtext_abort").mode("append").save(out)
    # commit() never ran, so a promoted part file can never exist —
    # readers match mr-out-* and are blind to dot-prefixed staging
    leftovers = os.listdir(out) if os.path.isdir(out) else []
    assert not [p for p in leftovers if p.startswith("mr-out-")], leftovers
    assert all(p.startswith("._staged") for p in leftovers), leftovers
    # abort()'s sweep is best-effort (a cancelled attempt can land its
    # staged file after the sweep); the DETERMINISTIC cleanup is the
    # next successful job's commit() — run one and check it swept
    from distributed_map_reduce_spark.sources.pydatasource import (
        register_mrtext,
    )

    register_mrtext(spark)
    spark.createDataFrame(
        [("apple", 3)], "key string, n int"
    ).coalesce(1).write.format("mrtext").mode("append").save(out)
    final = sorted(os.listdir(out))
    assert [p for p in final if p.startswith("mr-out-")], final
    assert not [p for p in final if p.startswith("._staged")], final


def test_writer_commit_promotes_only_reported_attempts(tmp_path):
    """The speculative-duplicate guarantee, pinned at protocol level:
    two attempts of one partition each stage a file, only one reports
    success, and commit() promotes exactly the reported attempt's file
    while sweeping the twin — so a speculative race can never surface
    a duplicate or partial part file. (Scheduler-launched speculation
    itself cannot be provoked in this build's local-cluster — measured:
    a 25 s straggler with speculation.quantile=0 / multiplier=1.0 /
    efficiency gate off never drew a speculative attempt — so the
    protocol invariant is the testable surface.)"""
    from distributed_map_reduce_spark.sources.pydatasource import (
        _MRTextCommit,
        _MRTextWriter,
        _STAGE_PREFIX,
    )

    out = str(tmp_path / "out")
    os.makedirs(out)
    winner = os.path.join(out, f"{_STAGE_PREFIX}00000-7")
    loser = os.path.join(out, f"{_STAGE_PREFIX}00000-8")
    with open(winner, "w") as f:
        f.write("apple 3\npear 1\n")
    with open(loser, "w") as f:
        f.write("apple 3\n")  # partial twin: died mid-write

    writer = _MRTextWriter({"path": out}, overwrite=False)
    writer.commit([_MRTextCommit(winner, 0, 2)])

    assert sorted(os.listdir(out)) == ["mr-out-00000"]
    assert open(os.path.join(out, "mr-out-00000")).read() == (
        "apple 3\npear 1\n"
    )

    # abort path: nothing promoted, every staged attempt swept
    for name in (winner, loser):
        with open(name, "w") as f:
            f.write("junk\n")
    writer.abort([None])
    assert sorted(os.listdir(out)) == ["mr-out-00000"]
