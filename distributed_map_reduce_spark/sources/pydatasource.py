"""Custom Python DataSource (Spark 4 extension API) for the reference's
text-file I/O contract.

The reference's input model is one whole text file per map task
(`mrworker wc.so pg-*.txt`; the coordinator hands out filenames at
/root/reference/src/mr/rpc.go:219-228 and the worker slurps the file at
worker.go:221-232), and its output model is `mr-out-*` part files of
``key value`` lines (mrsequential.go:38-42). This module re-expresses
both as a first-class pluggable format through
``pyspark.sql.datasource`` — the public extension point for sources the
built-ins don't cover:

    spark.dataSource.register(MRTextDataSource)
    df = spark.read.format("mrtext").load("/data/books")      # path, text
    out.write.format("mrtext").mode("append").save("/out")    # key value

Why this exists next to ``read_whole_text_files`` (binaryfile.py): that
helper returns an RDD for the map_reduce() compatibility API; this is
the DataFrame-native, catalog-compatible route — usable from SQL
(``CREATE TABLE ... USING mrtext``), and a worked example of the
partition-planning / per-partition-read contract a real connector
(object store, internal format) would implement.

Scale notes:
- planning lists files driver-side (same as every FileIndex) and emits
  ONE InputPartition per file — the reference's exact task granularity;
  parallelism = file count, and a 100 TB corpus of many files fans out
  across all executors. Files are NOT split (matching both the
  reference and Spark's own binaryFile source).
- reads happen executor-side in the Python worker, Arrow-batched back
  to the JVM; for text corpora the single-pass decode is I/O-bound.
- the writer emits one part file per task from its own iterator (no
  driver funnel); commit messages flow back to the driver, mirroring
  the V2 WriterCommitMessage protocol.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _MRTextReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("mrtext requires a path (load('<dir or file>'))")
        # NOTE: '.'/'_'-prefixed files are dropped BEFORE this glob is
        # applied (InMemoryFileIndex convention), so a glob that
        # explicitly targets them (e.g. pathGlobFilter='_stats-*')
        # silently matches nothing — hidden names are not readable
        # through this source at all (ADVICE r13).
        self.glob = options.get("pathGlobFilter", "*")

    def partitions(self):
        import fnmatch

        p = self.path
        if os.path.isdir(p):
            # Hidden files ('.'/'_'-prefixed) are excluded BEFORE the
            # glob, matching Spark's InMemoryFileIndex convention —
            # fnmatch gives leading dots no special treatment, so a
            # default '*' glob would otherwise read staged orphans
            # (._staged-mr-out-*) left by an aborted writer as partial
            # part files, breaking the "readers can never observe a
            # partial file" invariant the writer docstring promises.
            files = sorted(
                os.path.join(p, f)
                for f in os.listdir(p)
                if not f.startswith((".", "_"))
                and fnmatch.fnmatch(f, self.glob)
                and os.path.isfile(os.path.join(p, f))
            )
        else:
            files = [p]
        if not files:
            raise ValueError(f"mrtext: no input files under {p!r}")
        return [_FilePartition(f) for f in files]

    def read(self, partition):
        with open(partition.path, "r", encoding="utf-8", errors="replace") as f:
            yield (partition.path, f.read())


class _MRTextCommit(WriterCommitMessage):
    def __init__(self, staged: str, pid: int, rows: int):
        self.staged = staged
        self.pid = pid
        self.rows = rows


_STAGE_PREFIX = "._staged-mr-out-"


class _MRTextWriter(DataSourceWriter):
    """Writes ``<first-col> <second-col>`` lines, one part file per task
    — the reference's mr-out format (mrsequential.go:38-42 prints
    '%v %v') — with the reference's own atomic-commit discipline
    (worker.go:184-216 writes a temp file and os.Rename()s it into
    place): each task attempt stages to a hidden
    ``._staged-mr-out-<job>-<pid>-<attempt>`` file, and only the
    driver-side ``commit()`` promotes the files of attempts that
    REPORTED success to their final ``mr-out-<pid>`` names. A task that
    dies mid-write (or a speculative duplicate attempt — routine at
    1000-executor scale) leaves only a staged orphan; readers can never
    observe a partial part file, because the dot-prefix keeps staged
    files out of both the reader's listing (hidden-file filter) and
    every ``mr-out-*`` match.

    Staged names are NAMESPACED by a per-job token (the analog of
    Hadoop's ``_temporary/<jobId>``), so two concurrent APPEND jobs
    into one directory never touch each other's in-flight files:
    commit() and abort() sweep ONLY this job's staged prefix. The
    namespace protects in-flight staged files only — overwrite mode's
    stale-part sweep removes every committed ``mr-out-*`` not in THIS
    job's promoted set, so an overwrite concurrent with ANY other
    writer to the same directory is undefined (it deletes the other
    job's committed output), same as Hadoop's overwrite committer
    (ADVICE r13). The other cost is that an aborted job whose cancelled
    attempts land files AFTER its own best-effort sweep leaves hidden
    orphans behind (the same residue Hadoop's committer leaves in
    ``_temporary``) — harmless to readers, cleaned by any directory
    hygiene sweep of dot-files.

    ``mode("overwrite")`` promotes this job's files first, then removes
    stale ``mr-out-*`` part files a previous (wider) run left behind.
    Each single-file promotion is atomic; the directory-level swap is
    not — a reader racing the commit can briefly see old and new part
    files mixed, the standard posture for filesystem committers without
    a directory rename."""

    def __init__(self, options, overwrite: bool):
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("mrtext requires a path (save('<dir>'))")
        self.overwrite = overwrite
        # Driver-side, once per job; pickled with the writer so every
        # task attempt stages under the same namespace.
        self.job_token = uuid.uuid4().hex[:12]

    def _staged_name(self, pid: int, attempt_id) -> str:
        return os.path.join(
            self.path, f"{_STAGE_PREFIX}{self.job_token}-{pid:05d}-{attempt_id}"
        )

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        os.makedirs(self.path, exist_ok=True)
        staged = self._staged_name(pid, ctx.taskAttemptId())
        n = 0
        with open(staged, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(f"{row[0]} {row[1]}\n")
                n += 1
        return _MRTextCommit(staged, pid, n)

    def _sweep_staged(self):
        import glob

        pattern = os.path.join(
            self.path, f"{_STAGE_PREFIX}{self.job_token}-*"
        )
        for orphan in glob.glob(pattern):
            try:
                os.remove(orphan)
            except OSError:
                pass

    def commit(self, messages):
        # Promote exactly the staged files whose tasks reported success
        # (atomic os.replace per file), then sweep this job's staged
        # orphans left by failed or speculative attempts. Runs
        # driver-side, after Spark has one success message per
        # partition.
        promoted = set()
        for m in messages:
            if m is not None:
                final = os.path.join(self.path, f"mr-out-{m.pid:05d}")
                try:
                    os.replace(m.staged, final)
                except FileNotFoundError:
                    raise RuntimeError(
                        f"mrtext commit: staged file {m.staged!r} vanished "
                        "before promotion — something external swept the "
                        "output directory's hidden files mid-job"
                    ) from None
                promoted.add(os.path.basename(final))
        self._sweep_staged()
        if self.overwrite and os.path.isdir(self.path):
            # Remove part files this job did not produce (a prior run
            # with more partitions); append mode leaves them alone.
            # isdir guard: a zero-partition write never ran write(), so
            # the directory may not exist yet.
            for name in os.listdir(self.path):
                if name.startswith("mr-out-") and name not in promoted:
                    try:
                        os.remove(os.path.join(self.path, name))
                    except OSError:
                        pass
        return None

    def abort(self, messages):
        # Nothing was promoted; remove this job's staged attempt files.
        self._sweep_staged()


class MRTextDataSource(DataSource):
    """``format("mrtext")``: whole-file text read / key-value text write."""

    @classmethod
    def name(cls) -> str:
        return "mrtext"

    def schema(self) -> str:
        return "path string, text string"

    def reader(self, schema: StructType) -> DataSourceReader:
        return _MRTextReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        if len(schema.fields) != 2:
            raise ValueError(
                "mrtext writes exactly two columns (key, value); got "
                f"{len(schema.fields)}"
            )
        return _MRTextWriter(self.options, overwrite)


def register_mrtext(spark) -> None:
    """Idempotently register the mrtext format on a session."""
    spark.dataSource.register(MRTextDataSource)
