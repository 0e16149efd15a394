"""Custom aggregate surface: vectorized Pandas UDAF.

The reference has no UDAF interface — its single extension point is the
map/reduce function pair (/root/reference/src/mr/worker.go:280-301,
SURVEY §2.3 "no UDAF/UDTF interfaces"). Spark's native analog is the
grouped-aggregate ``pandas_udf``: the UDAF receives each group's column
as an Arrow-backed pandas Series and returns one scalar — vectorized
(no per-row Python), partial-aggregation-free (holistic), and usable in
``groupBy().agg()`` like any built-in.

The demo aggregate is the geometric mean of order totals per order
priority — numerically exp(mean(log x)), so a DuckDB oracle can check
the Python path bit-for-bit (after the suite's standard ROUND). A real
pipeline would use this interface for aggregates SQL cannot express
(e.g. a streaming sketch merge); the point here is the wiring: Arrow
batches in, scalar out, engine handles the shuffle.

Scale note: grouped-agg pandas UDAFs are holistic — every group's
values materialize in one task, exactly like ``collect_set`` — so the
skew guidance from ``functions/agg.py`` (salt hot keys, merge partials)
applies when a group can be a whale. Priorities here have ~5 groups of
uniform size; the salted twin is the documented escape hatch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import QuerySpec
from ..sources import load_table


def _geomean_udaf():
    """Built lazily: ``pandas_udf`` parses its DDL return type against
    the active session, so decorating at import time would make the
    registry unimportable without Spark running. (pandas/numpy import
    at module level so the UDFs' postponed type hints resolve.)"""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        # exp(mean(log)) rather than prod()**(1/n): the product of 60k
        # prices overflows float64 immediately; the log-domain form is
        # the numerically standard geometric mean.
        return float(np.exp(np.log(v.to_numpy()).mean()))

    @pandas_udf("long")
    def n_values(v: pd.Series) -> int:
        # Spark disallows mixing grouped-agg pandas UDFs with built-in
        # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the
        # group size is a second UDAF over the same column.
        return len(v)

    return geomean, n_values


def q70_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    geomean, n_values = _geomean_udaf()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(geomean("o_totalprice"), 2).alias("geomean_price"),
            n_values("o_totalprice").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


Q70_ORACLE = """
SELECT o_orderpriority,
       ROUND(EXP(AVG(LN(o_totalprice))), 2) AS geomean_price,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


QUERIES = [
    QuerySpec("q70_udaf_geomean", q70_udaf_geomean, Q70_ORACLE,
              "grouped-agg pandas UDAF (vectorized custom aggregate)",
              ("udaf", "pandas")),
]
