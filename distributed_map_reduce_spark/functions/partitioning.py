"""Scale-adaptive parallelism helpers.

One shared gate for the r16 optimization round's scan-parallelism
repartitions (guide §2.5 input skew): every sf table in the local
corpus is ONE parquet row group, so a scan is ONE effective task and
any expensive row-local projection (tokenizer regexp, shingle explode,
try_* arithmetic, JSON rendering, map HOFs, vector math) serializes in
it — a tiny round-robin exchange buys a full-width codegen stage.

The r16 verdict's 100 TB caveat (VERDICT r16 "what's wrong" #1): a real
corpus scan has thousands of natural splits, where the same
unconditional ``repartition(defaultParallelism)`` would (a) shuffle the
full text payload and (b) CAP the stage at defaultParallelism. The gate
below skips the exchange whenever the input already plans at least the
target width, so the helper is a no-op exactly where the shuffle would
be a regression — and byte-identical to the unconditional repartition
on the local corpus (pinned in tests/test_parallelism.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_for_rowlocal(df: DataFrame, nparts: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` to ``nparts`` (default: the
    session's ``defaultParallelism``) ONLY when it plans fewer
    partitions than that target.

    * Batch frames report their planned width via
      ``rdd.getNumPartitions()`` — one driver-side planning pass, no
      job. A single-row-group scan plans 1-3 splits locally (< target,
      so the exchange is inserted exactly as before); a 100 TB scan
      plans thousands (>= target, exchange skipped).
    * Streaming frames cannot report a width before execution (``.rdd``
      is undefined on them) — they keep the unconditional repartition;
      a micro-batch is a crawl drop, not the corpus, so the exchange
      stays drop-sized (q130's rationale).

    Partition-count caveat: for a file with fewer row groups than byte
    splits the planned width OVERSTATES effective parallelism (empty
    splits). That skew direction is safe here: it can only happen when
    file bytes >> row-group count, and then the planned width still
    tracks bytes/``maxPartitionBytes`` — at any width >= the target the
    row-local work downstream is already distributed enough that the
    exchange buys nothing.
    """
    target = nparts or df.sparkSession.sparkContext.defaultParallelism
    if not df.isStreaming and df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
