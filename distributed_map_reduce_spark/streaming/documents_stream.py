"""Streaming curation over the ``documents`` table.

The 100 TB reality of a pretraining corpus is append-only crawl drops,
so the curation passes (quality rules, PII, dedup) must run as
Structured Streaming jobs over arriving files — not only as batch
backfills. This module streams the documents parquet through the SAME
stateless rule expressions the batch operators use (the projection is
shared verbatim — one codepath, two execution modes) and drains with
Trigger.availableNow so the DuckDB oracle gate covers the streaming
path too (same twin methodology as streaming/events_stream.py; the
reference's analog is re-running its apps over a grown input set,
/root/reference/src/main/test-mr.sh re-invocations).

On a real cluster the only change is the source options (a directory
watched with maxFilesPerTrigger, or a message bus) and a file/table
sink instead of the in-memory test sink.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from .events_stream import run_available_now


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents table. Schema comes from
    one batch footer read (streams cannot infer), matching the
    footer-adaptive posture of sources/tables.py."""
    root = sf_dir.rstrip("/")
    schema = spark.read.parquet(f"{root}/documents.parquet").schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(root)
    )


def q114_streaming_quality_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality funnel on the STREAMING path: the q91 rule
    projection (stateless, shared expression tree) over a documents
    file stream, aggregated per source in complete mode and drained
    with availableNow — hash-checked against q91's batch oracle, so
    the gate proves streaming curation == batch curation.

    Scale shape: the rule projection is row-local (whole-stage codegen,
    no Python); the only state is the per-source aggregate — one row
    per source, bounded by the source vocabulary, no watermark needed
    (complete mode, monotone counts). This is the template for running
    every stateless curation pass (q91 rules, q96 PII, q30 lang-id)
    over an append-only crawl without a backfill."""
    from ..operators.textanalysis import gopher_funnel, gopher_rule_frame

    table = f"stream_q114_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="dmrs_q114_stream_ckpt_")
    agged = gopher_funnel(gopher_rule_frame(documents_stream(spark, sf_dir)))
    run_available_now(
        agged,
        checkpoint_dir=ckpt,
        table_name=table,
        output_mode="complete",
    )
    return spark.table(table).orderBy("source")


def _build_queries():
    from ..operators.textanalysis import Q91_ORACLE
    from ..registry import QuerySpec

    return [
        QuerySpec(
            "q114_streaming_quality_twin",
            q114_streaming_quality_twin,
            Q91_ORACLE,
            "availableNow drain of the Gopher-rule funnel over a "
            "documents file stream (== batch q91)",
            ("streaming", "documents", "curation"),
        ),
    ]


QUERIES = _build_queries()
