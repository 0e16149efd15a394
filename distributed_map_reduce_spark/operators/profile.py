"""Table profiling — the DESCRIBE/statistics surface of an analytics
engine, as data.

``profile_table`` computes, for any set of columns, the audit row every
ingestion pipeline publishes before a table goes live: row count, null
count, exact distinct count, and min/max (stringified so heterogeneous
column types fit one result schema). The reference has no statistics
surface at all (SURVEY §2.3); Spark's own ANALYZE TABLE covers the
catalog side (sources/stats.py) — this is the queryable twin.

Scale shape: ONE aggregate job over the scan. Multiple exact
COUNT(DISTINCT) columns compile to a single Expand + two-phase
aggregate (rows replicate ×|cols| map-side — the documented price of
exactness; the 100 TB profiler swaps in approx_count_distinct and the
Expand disappears). min/max/count stay algebraic with map-side
partials. The long-form reshape at the end is a 1-row stack —
driver-free, shuffle-free.

Reference lineage: the closest thing the reference has is the job-count
audit app (/root/reference/src/mrapps/jobcount.go:15-44) — counting
facts ABOUT the run rather than the data; this operator covers the
data half.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import QuerySpec
from ..sources import load_table


def profile_table(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """One row per column: (col_name, n, n_null, n_distinct, min_s,
    max_s). Exact distinct counts; min/max cast to string after being
    computed on the native type (numeric min, not lexicographic)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"_nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(c).cast("string").alias(f"_mn_{c}"),
            F.max(c).cast("string").alias(f"_mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) as "
        "(col_name, _nn, n_distinct, min_s, max_s)",
        "_n",
    ).select(
        "col_name",
        F.col("_n").alias("n"),
        (F.col("_n") - F.col("_nn")).alias("n_null"),
        "n_distinct",
        "min_s",
        "max_s",
    ).orderBy("col_name")


PROFILE_COLS = (
    "l_orderkey",
    "l_quantity",
    "l_returnflag",
    "l_linestatus",
    "l_ship_day",
)


def q101_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile a mixed-type slice of lineitem (bigint, double, two
    strings, a date) — the pre-publication data-quality audit."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_quantity",
        "l_returnflag",
        "l_linestatus",
        F.col("l_shipdate").cast("date").alias("l_ship_day"),
    )
    return profile_table(li, PROFILE_COLS)


def _duck_profile_arm(expr: str, name: str) -> str:
    return (
        f"SELECT '{name}' AS col_name, COUNT(*) AS n,"
        f" COUNT(*) - COUNT({expr}) AS n_null,"
        f" COUNT(DISTINCT {expr}) AS n_distinct,"
        f" CAST(MIN({expr}) AS VARCHAR) AS min_s,"
        f" CAST(MAX({expr}) AS VARCHAR) AS max_s"
        " FROM lineitem"
    )


Q101_ORACLE = (
    " UNION ALL ".join(
        _duck_profile_arm(e, n)
        for e, n in [
            ("l_orderkey", "l_orderkey"),
            ("l_quantity", "l_quantity"),
            ("l_returnflag", "l_returnflag"),
            ("l_linestatus", "l_linestatus"),
            ("CAST(l_shipdate AS DATE)", "l_ship_day"),
        ]
    )
    + " ORDER BY col_name"
)


QUERIES = [
    QuerySpec(
        "q101_table_profile",
        q101_table_profile,
        Q101_ORACLE,
        "per-column profile (n/nulls/exact distinct/min/max) in one "
        "Expand aggregate pass",
        ("profile", "stats"),
    ),
]
