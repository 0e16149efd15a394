"""End-to-end curated-corpus publish: the operators composed the way a
pipeline user composes them, with the storage contract asserted at the
end — the integration twin of the per-operator tests.

scan -> PII redaction (q96's engine) -> deterministic hash split (q62's
rule) -> partitioned shard write (split/source Hive layout) ->
pruned + lossless read-back, then a Z-order re-cluster of one shard
for multi-dimensional skipping. Every stage is the registry operator's
actual code, not a re-implementation.
"""

import glob
import os

import pyspark.sql.functions as F

from distributed_map_reduce_spark.operators.curation import (
    _INJECT_SPARK,
    redact_pii,
)
from distributed_map_reduce_spark.operators.training import (
    SPLIT_TRAIN_MAX,
    SPLIT_VAL_MAX,
)
from distributed_map_reduce_spark.sinks import (
    write_training_shards,
    write_zordered,
)
from distributed_map_reduce_spark.sources import load_table


def _publish(spark, sf_dir, out):
    # the synthetic corpus carries no natural PII, so plant q96's
    # deterministic emails/phones/IPs first — the scrub then has real
    # work to do and the no-leak assertion has teeth
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text", F.expr(_INJECT_SPARK)
    )
    clean = redact_pii(docs, "text").select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.col("text_redacted").alias("text"),
        (F.col("n_email") + F.col("n_phone") + F.col("n_ipv4")).alias(
            "n_redactions"
        ),
    )
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h < SPLIT_TRAIN_MAX, "train")
        .when(h < SPLIT_VAL_MAX, "val")
        .otherwise("test")
    )
    curated = clean.withColumn("split", split)
    write_training_shards(curated, out, partition_by=("split", "source"))
    return curated


def test_publish_layout_pruning_and_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus")
    curated = _publish(spark, sf_dir, out)

    # Hive layout: split=*/source=* directories
    assert glob.glob(os.path.join(out, "split=train", "source=*")), out

    back = spark.read.parquet(out)
    assert back.count() == curated.count()
    # roundtrip equality on the full content (column order differs:
    # partition columns append)
    cols = sorted(curated.columns)
    assert (
        back.select(*cols).exceptAll(curated.select(*cols)).count() == 0
        and curated.select(*cols).exceptAll(back.select(*cols)).count() == 0
    )

    # split filter prunes to the train directories only (PartitionFilters
    # in the scan; no other split directory is listed)
    plan = (
        back.filter(F.col("split") == "train")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "split" in plan

    # the corpus arrives scrubbed: no raw email survives in ANY split
    leaked = back.filter(F.col("text").rlike("@[A-Za-z0-9.-]+")).count()
    assert leaked == 0
    # and the redaction accounting is present
    assert back.agg(F.sum("n_redactions")).first()[0] > 0


def test_publish_then_zorder_recluster(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus")
    _publish(spark, sf_dir, out)
    train = spark.read.parquet(out).filter(F.col("split") == "train")
    z = str(tmp_path / "train_z")
    write_zordered(
        train.select("doc_id", "n_chars", "text"),
        z,
        ("doc_id", "n_chars"),
        num_files=4,
    )
    back = spark.read.parquet(z)
    assert back.count() == train.count()
    # each file covers a disjoint z-range: doc_id min/max spans per file
    # must be narrower than the global span for at least one file
    import pyarrow.parquet as pq

    spans = []
    for f in glob.glob(os.path.join(z, "*.parquet")):
        meta = pq.ParquetFile(f).metadata
        names = {
            meta.schema.column(i).name: i for i in range(meta.num_columns)
        }
        ci = names["doc_id"]
        mn = min(
            meta.row_group(g).column(ci).statistics.min
            for g in range(meta.num_row_groups)
        )
        mx = max(
            meta.row_group(g).column(ci).statistics.max
            for g in range(meta.num_row_groups)
        )
        spans.append((mn, mx))
    glo = (min(s[0] for s in spans), max(s[1] for s in spans))
    assert any(
        (s[1] - s[0]) < (glo[1] - glo[0]) for s in spans
    ), spans
