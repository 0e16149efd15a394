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
                staged = self._staged_name(pid, ctx.taskAttemptId())
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
    )

    class _AlwaysCrashWriter(_MRTextWriter):
        def write(self, iterator):
            from pyspark import TaskContext

            ctx = TaskContext.get()
            os.makedirs(self.path, exist_ok=True)
            staged = self._staged_name(0, ctx.taskAttemptId())
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
    # staged file after the sweep), and — since staging is namespaced
    # per job for concurrent-writer safety — a LATER job leaves another
    # job's orphans alone. What must hold: the next successful job
    # commits cleanly next to the orphans, and a reader sees ONLY
    # committed content (the hidden-file filter makes orphans
    # invisible even under the default '*' glob).
    from distributed_map_reduce_spark.sources.pydatasource import (
        register_mrtext,
    )

    register_mrtext(spark)
    spark.createDataFrame(
        [("apple", 3)], "key string, n int"
    ).coalesce(1).write.format("mrtext").mode("append").save(out)
    final = sorted(os.listdir(out))
    assert [p for p in final if p.startswith("mr-out-")], final
    seen = spark.read.format("mrtext").load(out).collect()
    assert [r["text"] for r in seen] == ["apple 3\n"]


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
    )

    out = str(tmp_path / "out")
    os.makedirs(out)
    writer = _MRTextWriter({"path": out}, overwrite=False)
    winner = writer._staged_name(0, 7)
    loser = writer._staged_name(0, 8)
    with open(winner, "w") as f:
        f.write("apple 3\npear 1\n")
    with open(loser, "w") as f:
        f.write("apple 3\n")  # partial twin: died mid-write

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


def test_concurrent_jobs_do_not_sweep_each_other(tmp_path):
    """Two jobs appending into ONE directory: job A's commit must not
    touch job B's in-flight staged file (staging is namespaced per job,
    the _temporary/<jobId> discipline), and B's later commit promotes
    its own file normally."""
    from distributed_map_reduce_spark.sources.pydatasource import (
        _MRTextCommit,
        _MRTextWriter,
    )

    out = str(tmp_path / "out")
    os.makedirs(out)
    a = _MRTextWriter({"path": out}, overwrite=False)
    b = _MRTextWriter({"path": out}, overwrite=False)
    assert a.job_token != b.job_token
    a_staged = a._staged_name(0, 1)
    b_staged = b._staged_name(1, 1)
    with open(a_staged, "w") as f:
        f.write("apple 1\n")
    with open(b_staged, "w") as f:
        f.write("pear 2\n")

    a.commit([_MRTextCommit(a_staged, 0, 1)])
    assert os.path.exists(b_staged), "A's sweep must spare B's staging"
    b.commit([_MRTextCommit(b_staged, 1, 1)])
    assert sorted(os.listdir(out)) == ["mr-out-00000", "mr-out-00001"]


def test_overwrite_removes_stale_part_files(spark, tmp_path):
    """mode('overwrite') with FEWER partitions than a prior run must
    not leave the prior run's extra mr-out-* files mixed into the new
    output (ADVICE r12): after the overwrite, the directory holds
    exactly this job's part files."""
    register_mrtext(spark)
    out = str(tmp_path / "out")
    wide = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3), ("d", 4)], "key string, n int"
    ).repartition(4)
    wide.write.format("mrtext").mode("append").save(out)
    assert len([p for p in os.listdir(out) if p.startswith("mr-out-")]) == 4

    narrow = spark.createDataFrame(
        [("z", 9)], "key string, n int"
    ).coalesce(1)
    narrow.write.format("mrtext").mode("overwrite").save(out)
    parts = sorted(p for p in os.listdir(out) if p.startswith("mr-out-"))
    lines = sorted(
        line
        for p in parts
        for line in open(os.path.join(out, p)).read().splitlines()
    )
    assert lines == ["z 9"], (parts, lines)


def test_reader_skips_hidden_files_under_default_glob(spark, tmp_path):
    """The default '*' glob must not surface dot/underscore-prefixed
    files (fnmatch gives leading dots no special treatment): staged
    orphans and Spark-convention metadata files are invisible to
    readers, matching InMemoryFileIndex (ADVICE r12)."""
    register_mrtext(spark)
    d = tmp_path / "in"
    d.mkdir()
    (d / "real.txt").write_text("visible\n")
    (d / "._staged-mr-out-deadbeef-00000-3").write_text("partial\n")
    (d / "_SUCCESS").write_text("")
    (d / ".hidden").write_text("nope\n")
    rows = spark.read.format("mrtext").load(str(d)).collect()
    assert [os.path.basename(r["path"]) for r in rows] == ["real.txt"]
