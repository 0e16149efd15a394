"""Query registry — the single source of truth for the declared suite.

Every operator the engine claims is registered here as a :class:`QuerySpec`:
a Spark DataFrame builder plus (when SQL-expressible) the ANSI-SQL text a
DuckDB oracle runs over the same parquet tables. ``__spark_entry__.py``,
``bench.py`` and the pytest parity suite all consume this registry, so a
query cannot be "done" without being differentially testable — the port of
the reference's sequential-oracle methodology
(/root/reference/src/main/test-mr.sh:81-111).

Column-name contract: the driver compares Spark vs oracle results after
sorting columns *by name*, so every computed column is aliased identically
on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only check (non-SQL-expressible)
    description: str = ""
    tags: tuple[str, ...] = field(default=())


# Modules that contribute queries. Each exposes ``QUERIES: list[QuerySpec]``.
_OPERATOR_MODULES = [
    "distributed_map_reduce_spark.operators.text",
    "distributed_map_reduce_spark.operators.relational",
    "distributed_map_reduce_spark.operators.events",
    "distributed_map_reduce_spark.operators.asof",
    "distributed_map_reduce_spark.operators.dedup",
    "distributed_map_reduce_spark.operators.graph",
    "distributed_map_reduce_spark.operators.textanalysis",
    "distributed_map_reduce_spark.operators.similarity",
    "distributed_map_reduce_spark.operators.sketches",
    "distributed_map_reduce_spark.operators.mapreduce",
    "distributed_map_reduce_spark.operators.multimodal",
]


def all_queries() -> dict[str, QuerySpec]:
    out: dict[str, QuerySpec] = {}
    for mod_name in _OPERATOR_MODULES:
        mod = importlib.import_module(mod_name)
        for spec in getattr(mod, "QUERIES", []):
            if spec.name in out:
                raise ValueError(f"duplicate query name {spec.name!r}")
            out[spec.name] = spec
    return out
