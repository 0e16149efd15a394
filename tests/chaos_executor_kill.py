"""Subprocess body for the executor-JVM-death chaos test.

Spins up a real multi-JVM cluster (local-cluster[2,1,1024]), runs a
shuffle -> mapInPandas pipeline whose first reduce task SIGKILLs its own
executor JVM, and checks the recovered result against the clean run.
Killing the executor loses its map-side shuffle files, so the retry path
exercises FetchFailed -> map-stage recompute, not just task re-run.

Prints one JSON line {"killed": bool, "match": bool} on success.
"""

import json
import os
import tempfile

from pyspark.sql import SparkSession

MARKER = os.path.join(
    tempfile.mkdtemp(prefix="executor-kill-"), "killed-once"
)


def _kill_own_executor_jvm():
    """Climb the process tree from this Python worker and SIGKILL the
    first java ancestor — the executor backend JVM that owns us."""
    pid = os.getppid()
    for _ in range(10):
        if pid <= 1:
            return
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read()
            if b"java" in cmd.split(b"\x00", 1)[0]:
                os.kill(pid, 9)
                return
            with open(f"/proc/{pid}/status") as f:
                ppid = next(
                    int(line.split()[1])
                    for line in f
                    if line.startswith("PPid:")
                )
        except (OSError, StopIteration):
            return
        pid = ppid


def killer(batches):
    first = False
    try:
        fd = os.open(MARKER, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
        first = True
    except FileExistsError:
        pass
    if first:
        _kill_own_executor_jvm()
        os._exit(1)  # ensure the task dies even if the climb failed
    for pdf in batches:
        yield pdf


def main():
    spark = (
        SparkSession.builder.master("local-cluster[2,1,1024]")
        .appName("executor-kill-chaos")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.task.maxFailures", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    try:
        df = (
            spark.range(0, 20000, 1, 4)
            .selectExpr("id", "id % 97 AS k")
            .groupBy("k")
            .count()
        )
        golden = sorted(tuple(r) for r in df.collect())
        survived = df.mapInPandas(killer, "k bigint, count bigint")
        got = sorted(tuple(r) for r in survived.collect())
        print(
            json.dumps(
                {"killed": os.path.exists(MARKER), "match": got == golden}
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
