"""Vector math as built-in column expressions (JVM-side, no Python).

``embedding`` columns are ``array<float>``; all arithmetic casts to double
first so Spark and the DuckDB oracle accumulate in the same precision.

At 100 TB scale these expressions run inside whole-stage codegen; the
Pandas-UDF alternative (numpy dot) only wins when k (dimensions) is large
enough that per-element codegen overhead dominates — for 64-dim vectors
the builtin path benches faster and avoids Arrow transfer entirely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(v: Column) -> Column:
    return v.cast("array<double>")


def l2sq_col(a: Column, b: Column) -> Column:
    """Squared L2 distance between two float-array columns, in float64."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_dbl(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))
