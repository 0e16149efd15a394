"""CSV / JSON-lines readers — the interchange formats around a parquet-
centric engine.

Always schema-explicit: at 100 TB schema inference is a full extra read
of the data (and silently types everything it guesses wrong); a reader
without a schema here is a bug, not a convenience. Both formats split
by line, so parallelism comes free from file splits; compression and
malformed-row policy are the knobs that matter at scale
(``mode=FAILFAST`` default — corrupt input should stop a pipeline, not
silently drop rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def load_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    sep: str = ",",
    mode: str = "FAILFAST",
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", mode)
        .csv(path)
    )


def load_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    mode: str = "FAILFAST",
) -> DataFrame:
    """JSON-lines (one object per line — the splittable JSON layout)."""
    return spark.read.schema(schema).option("mode", mode).json(path)


def load_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """ORC — the other columnar interchange format (Hive-ecosystem
    counterpart of parquet; same pushdown/pruning/split story, footer
    carries the schema so ``schema`` is an optional assertion, not a
    requirement like the text formats)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)
