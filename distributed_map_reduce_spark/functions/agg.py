"""Skew-tolerant aggregation helpers.

Algebraic aggregates (sum/count/min/avg) need no help — Spark partial-
aggregates them map-side and AQE splits skewed shuffle partitions. The
residual problem is *holistic* aggregation on a hot key: one
``collect_set`` group holding a whale key materializes every value in a
single task. ``salted_collect_set`` is the standard two-level fix
(SCALE.md): salt the key, collect per (key, salt) — the whale's values
split across n_salt tasks and deduplicate early — then merge the (much
smaller) partial sets. Results are identical by construction
(set-union is associative/commutative); only the physical distribution
changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_collect_set(
    df: DataFrame, key: str, value: str, n_salt: int = 8
) -> DataFrame:
    """(key, <value>s array) with the collection split over ``n_salt``
    partial groups per key. Output column is ``{value}s``, de-duplicated
    and unsorted (wrap in ``array_sort`` for deterministic output)."""
    salt: Column = F.pmod(F.xxhash64(F.col(value)), F.lit(n_salt))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(F.collect_set(value).alias("__ps"))
    )
    return partial.groupBy(key).agg(
        F.array_distinct(F.flatten(F.collect_list("__ps"))).alias(f"{value}s")
    )
