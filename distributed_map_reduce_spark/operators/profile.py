"""Table profiling — the DESCRIBE/statistics surface of an analytics
engine, as data.

``profile_table`` computes, for any set of columns, the audit row every
ingestion pipeline publishes before a table goes live: row count, null
count, exact distinct count, and min/max (stringified so heterogeneous
column types fit one result schema). The reference has no statistics
surface at all (SURVEY §2.3); Spark's own ANALYZE TABLE covers the
catalog side (sources/stats.py) — this is the queryable twin.

Scale shape: one independent arm per column — a groupBy(col) value
pre-aggregate (map-side combined, so the shuffle carries distinct
values, not rows) from which ALL FOUR statistics fall out of the same
tiny grouped frame: n = sum of counts, nulls = the null group's count,
exact distinct = the frame's row count, min/max = min/max over values.
The arms union into one action, so their stages run concurrently, and
each arm's scan prunes to its single column. This deliberately avoids
the multi-COUNT(DISTINCT) Expand plan, which replicates every row
×|cols| before the shuffle (measured 7-9 s vs ~2 s at sf0.1 for a
5-column lineitem profile); at 100 TB the per-arm shuffle is bounded
by column cardinality, and the hyperloglog swap
(approx_count_distinct) collapses each arm to a 1-pass aggregate when
even that is too much.

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
    arms = []
    for c in cols:
        g = df.groupBy(F.col(c).alias("_v")).agg(
            F.count(F.lit(1)).alias("_cnt")
        )
        arms.append(
            g.agg(
                F.sum("_cnt").alias("n"),
                F.coalesce(
                    F.sum(F.when(F.col("_v").isNull(), F.col("_cnt"))),
                    F.lit(0),
                ).alias("n_null"),
                F.count("_v").alias("n_distinct"),
                F.min("_v").cast("string").alias("min_s"),
                F.max("_v").cast("string").alias("max_s"),
            ).select(F.lit(c).alias("col_name"), "*")
        )
    out = arms[0]
    for arm in arms[1:]:
        out = out.unionByName(arm)
    return out.orderBy("col_name")


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


# --- q111: join-key skew profile ---------------------------------------------

SKEW_KEYS = (
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
)


def key_skew_profile(
    spark: SparkSession, sf_dir: str, keys: tuple[tuple[str, str], ...]
) -> DataFrame:
    """Join-key skew audit — the pre-flight check for "would this join
    hot-spot at 1000 executors": for each candidate shuffle key, the
    group-size distribution facts that predict stragglers. One row per
    key: row count, distinct keys, max/avg group size, skew factor
    (max/avg), the hottest key's share of all rows, exact p95 group
    size, and the singleton count (keys a broadcast-bloom semi-join
    would eliminate).

    Scale shape: one arm per key = a single-column pruned scan +
    map-side-combined groupBy(key).count — the shuffle carries distinct
    keys, not rows — then a scalar aggregate over the (bounded) group
    frame. Arms union into one action so their stages run concurrently.
    This is the measurement half of the salting/AQE-skew-join story
    (SCALE.md; tests/test_skew_join.py): you run THIS before choosing a
    mitigation."""
    arms = []
    for table, key in keys:
        g = (
            load_table(spark, sf_dir, table)
            .groupBy(F.col(key).alias("_k"))
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        arms.append(
            g.agg(
                F.sum("_cnt").alias("n_rows"),
                F.count(F.lit(1)).alias("n_keys"),
                F.max("_cnt").alias("max_group"),
                F.expr("CAST(percentile(_cnt, 0.95) AS DOUBLE)").alias(
                    "p95_group"
                ),
                F.sum(F.when(F.col("_cnt") == 1, 1).otherwise(0)).alias(
                    "n_singleton"
                ),
            ).select(
                F.lit(f"{table}.{key}").alias("key_name"),
                "n_rows",
                "n_keys",
                "max_group",
                F.round(
                    F.col("n_rows").cast("double") / F.col("n_keys"), 4
                ).alias("avg_group"),
                F.round(
                    F.col("max_group").cast("double")
                    * F.col("n_keys")
                    / F.col("n_rows"),
                    4,
                ).alias("skew_factor"),
                F.round(
                    F.lit(100.0) * F.col("max_group") / F.col("n_rows"), 4
                ).alias("top1_share_pct"),
                F.round("p95_group", 4).alias("p95_group"),
                "n_singleton",
            )
        )
    out = arms[0]
    for arm in arms[1:]:
        out = out.unionByName(arm)
    return out.orderBy("key_name")


def q111_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    return key_skew_profile(spark, sf_dir, SKEW_KEYS)


def _duck_skew_arm(table: str, key: str) -> str:
    return f"""
SELECT '{table}.{key}' AS key_name,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       COUNT(*) AS n_keys, MAX(c) AS max_group,
       ROUND(CAST(SUM(c) AS DOUBLE) / COUNT(*), 4) AS avg_group,
       ROUND(CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c), 4) AS skew_factor,
       ROUND(100.0 * MAX(c) / SUM(c), 4) AS top1_share_pct,
       ROUND(CAST(quantile_cont(c, 0.95) AS DOUBLE), 4) AS p95_group,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_singleton
FROM (SELECT COUNT(*) AS c FROM {table} GROUP BY {key})
"""


Q111_ORACLE = (
    " UNION ALL ".join(_duck_skew_arm(t, k) for t, k in SKEW_KEYS)
    + " ORDER BY key_name"
)




# --- q178: declarative expectation suite --------------------------------------

# (rule, SQL predicate describing a VIOLATION). The predicate text is
# the shared artifact: Spark evaluates each via F.expr and the DuckDB
# oracle embeds the identical string, so the rules themselves — not a
# translation of them — are what the differential check verifies. Kept
# to the SQL subset both engines parse identically.
EXPECTATION_RULES = [
    ("orderkey_complete", "l_orderkey IS NULL"),
    ("shipdate_complete", "l_shipdate IS NULL"),
    ("quantity_in_1_50", "l_quantity < 1 OR l_quantity > 50"),
    ("price_positive", "l_extendedprice <= 0"),
    ("discount_in_0_0p1", "l_discount < 0 OR l_discount > 0.1"),
    ("returnflag_in_set", "l_returnflag NOT IN ('A', 'N', 'R')"),
    ("linestatus_in_set", "l_linestatus NOT IN ('O', 'F')"),
]


def q178_expectation_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ/Great-Expectations-style declarative data-quality suite:
    a rule table of named violation predicates (completeness, range,
    set membership) plus a primary-key uniqueness check, evaluated in
    ONE aggregate pass over lineitem and reported long-format as
    (rule, n_violations, n_rows, passed). The contract-check sibling
    of q150 (cross-table FKs) and q101 (per-column profile): this one
    asserts EXPECTATIONS, the others describe state.

    Scale shape: every row-level rule is a conditional-sum arm of a
    single map-side-combinable aggregate — adding a rule adds a column
    to the partial, not a pass over the data; the uniqueness check
    rides the same aggregate as COUNT minus COUNT(DISTINCT pk). The
    unpivot to long format happens on the one-row result.

    Determinism: pure integer counts."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [
        F.sum(F.when(F.expr(pred), 1).otherwise(0)).alias(name)
        for name, pred in EXPECTATION_RULES
    ]
    # pk_unique counts duplicate (orderkey, linenumber) pairs among rows
    # where BOTH keys are present: count_distinct skips NULL-bearing rows,
    # so the minuend must too, or engines that count NULL-field structs
    # as distinct (DuckDB) would disagree the moment a key goes NULL.
    pk_present = F.col("l_orderkey").isNotNull() & F.col(
        "l_linenumber"
    ).isNotNull()
    row = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.sum(F.when(pk_present, 1).otherwise(0))
            - F.count_distinct(F.col("l_orderkey"), F.col("l_linenumber"))
        ).alias("pk_unique"),
        *aggs,
    )
    names = [name for name, _ in EXPECTATION_RULES] + ["pk_unique"]
    stack = ", ".join(f"'{n}', {n}" for n in names)
    return (
        row.select(
            F.expr(f"stack({len(names)}, {stack}) AS (rule, n_violations)"),
            "n_rows",
        )
        .select(
            "rule",
            F.col("n_violations").cast("bigint").alias("n_violations"),
            "n_rows",
            (F.col("n_violations") == 0).alias("passed"),
        )
        .orderBy("rule")
    )


def _q178_oracle() -> str:
    arms = ",\n".join(
        f"       CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS {name}"
        for name, pred in EXPECTATION_RULES
    )
    names = [name for name, _ in EXPECTATION_RULES] + ["pk_unique"]
    selects = "\nUNION ALL\n".join(
        f"SELECT '{n}' AS rule, {n} AS n_violations, n_rows FROM agg"
        for n in names
    )
    return f"""
WITH agg AS (
  SELECT COUNT(*) AS n_rows,
       CAST(COUNT(*) FILTER (WHERE l_orderkey IS NOT NULL
                               AND l_linenumber IS NOT NULL)
            - COUNT(DISTINCT (l_orderkey, l_linenumber))
                FILTER (WHERE l_orderkey IS NOT NULL
                          AND l_linenumber IS NOT NULL) AS BIGINT)
         AS pk_unique,
{arms}
  FROM lineitem
)
SELECT rule, n_violations, n_rows, n_violations = 0 AS passed
FROM ({selects})
ORDER BY rule
"""





def q228_regr_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus-drift fit with the native linear-regression
    aggregate family: is document LENGTH trending with ingest order
    (doc_id as crawl sequence)? ``regr_slope``/``regr_intercept``/
    ``regr_r2`` give the fitted line per source feed, ``regr_count``
    the paired-row count, ``regr_avgx``/``regr_avgy`` the centroid —
    the drift monitor a training-data pipeline runs per feed to catch a
    crawler that started truncating (slope < 0, r2 up) or a feed whose
    mix shifted. Complements q87 (events-over-time trend) with the
    corpus-over-ingest-order axis and the moment members q87 omits.

    The family agrees with DuckDB's same-named aggregates at the
    established 6-dp rounding (pinned in
    tests/properties/test_r15_candidate_probes.py — slope/intercept/r2
    are IEEE quotients of algebraic sums; counts are exact). The
    second-moment raw sums (regr_sxx/syy/sxy) stay OUT of the hashed
    output by the q49 float posture: their magnitude grows with n, so a
    fixed decimal rounding cannot absorb accumulation-order ulps at
    every scale factor.

    Scale shape: single-pass algebraic aggregate (sums of x, y, xy, x2
    per group under the hood) — map-side partials, one tiny shuffle on
    source (20 groups), no window, no second scan.

    Reference lineage: the per-key numeric rollup of
    src/mrapps/wc.go:24-29 generalized to sufficient-statistics state —
    the same partial-combine contract, richer merge."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.expr("regr_count(n_chars, doc_id)").alias("n_pairs"),
            F.round(F.expr("regr_slope(n_chars, doc_id)"), 6).alias(
                "slope"
            ),
            F.round(F.expr("regr_intercept(n_chars, doc_id)"), 6).alias(
                "intercept"
            ),
            F.round(F.expr("regr_r2(n_chars, doc_id)"), 6).alias("r2"),
            F.round(F.expr("regr_avgx(n_chars, doc_id)"), 6).alias(
                "avg_doc_id"
            ),
            F.round(F.expr("regr_avgy(n_chars, doc_id)"), 6).alias(
                "avg_chars"
            ),
        )
        .orderBy("source")
    )


Q228_ORACLE = """
SELECT source,
       regr_count(n_chars, doc_id) AS n_pairs,
       ROUND(regr_slope(n_chars, doc_id), 6) AS slope,
       ROUND(regr_intercept(n_chars, doc_id), 6) AS intercept,
       ROUND(regr_r2(n_chars, doc_id), 6) AS r2,
       ROUND(regr_avgx(n_chars, doc_id), 6) AS avg_doc_id,
       ROUND(regr_avgy(n_chars, doc_id), 6) AS avg_chars
FROM documents
GROUP BY source
ORDER BY source
"""


QUERIES = [
    QuerySpec(
        "q228_regr_drift",
        q228_regr_drift,
        Q228_ORACLE,
        "per-source regr_* drift fit of n_chars over ingest order "
        "(slope/intercept/r2/count/centroid, 6-dp oracle)",
        ("profile", "stats", "regression"),
    ),
    QuerySpec(
        "q178_expectation_checks",
        q178_expectation_checks,
        _q178_oracle(),
        "Deequ-style declarative expectation suite: named violation "
        "predicates + pk uniqueness in one aggregate pass",
        ("profile", "contract", "quality"),
    ),
    QuerySpec(
        "q101_table_profile",
        q101_table_profile,
        Q101_ORACLE,
        "per-column profile (n/nulls/exact distinct/min/max) in one "
        "Expand aggregate pass",
        ("profile", "stats"),
    ),
    QuerySpec(
        "q111_key_skew",
        q111_key_skew,
        Q111_ORACLE,
        "join-key skew audit: group-size max/avg/p95, hottest-key "
        "share, singletons — the pre-flight for salting/AQE decisions",
        ("profile", "stats", "skew"),
    ),
]
