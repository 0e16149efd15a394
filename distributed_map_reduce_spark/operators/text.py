"""Text workloads over the ``documents`` table.

Q1/Q2/Q3 re-express the reference's three data-bearing applications —
wc (/root/reference/src/mrapps/wc.go:19-40), indexer
(/root/reference/src/mrapps/indexer.go:20-39) and the sorted-values join
of crash/nocrash (/root/reference/src/mrapps/crash.go:45-55) — as
DataFrame aggregations. Q17 + the analysis queries are the
training-pipeline text operators (language-ID heuristic, quality score,
token counts, fingerprinting) the reference lacks.

Scale notes: every query here is scan → explode/project → hash-aggregate.
The explode fans out ~100x but stays inside one codegen stage; the only
shuffle is the final groupBy on the token/lang key. Token keys follow a
Zipf-ish distribution — partial aggregation (map-side combine, automatic
for count/sum/collect_set) is what keeps the hot keys from becoming a
shuffle skew problem at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import exploded_tokens
from ..registry import QuerySpec
from ..sources import load_table

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# --- Q1: wordcount (wc.go semantics over documents.text) -------------------

def q1_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = exploded_tokens(_docs(spark, sf_dir).select("text"))
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("token")
    )


Q1_ORACLE = """
SELECT token, COUNT(*) AS c
FROM (SELECT unnest(string_split_regex(text, '[^a-zA-Z]+')) AS token FROM documents)
WHERE token <> ''
GROUP BY token
ORDER BY token
"""

# --- Q2: inverted index (indexer.go semantics) ------------------------------

def q2_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = exploded_tokens(_docs(spark, sf_dir).select("doc_id", "text"))
    return (
        toks.groupBy("token")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.concat_ws(
                ",", F.sort_array(F.collect_set(F.col("doc_id").cast("string")))
            ).alias("doc_list"),
        )
        .orderBy("token")
    )


Q2_ORACLE = """
SELECT token,
       COUNT(DISTINCT doc_id) AS n_docs,
       STRING_AGG(DISTINCT CAST(doc_id AS VARCHAR), ','
                  ORDER BY CAST(doc_id AS VARCHAR)) AS doc_list
FROM (SELECT doc_id, unnest(string_split_regex(text, '[^a-zA-Z]+')) AS token
      FROM documents)
WHERE token <> ''
GROUP BY token
ORDER BY token
"""

# --- Q3: sorted-values roll-up (crash.go reduce semantics) ------------------

def q3_sorted_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.concat_ws(" ", F.sort_array(F.collect_set("source"))).alias("sources")
        )
        .orderBy("lang")
    )


Q3_ORACLE = """
SELECT lang,
       STRING_AGG(DISTINCT source, ' ' ORDER BY source) AS sources
FROM documents
GROUP BY lang
ORDER BY lang
"""

# --- Q16: exact deduplication (content-hash groupBy) ------------------------

def q16_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5(content) -> (count, keeper=min id). At 100 TB this
    is the cheapest dedup pass: one shuffle on a uniformly distributed
    128-bit key, no skew by construction."""
    return (
        _docs(spark, sf_dir)
        .groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.count(F.lit(1)).alias("c"), F.min("doc_id").alias("keeper"))
        .orderBy("h")
    )


Q16_ORACLE = """
SELECT md5(text) AS h, COUNT(*) AS c, MIN(doc_id) AS keeper
FROM documents
GROUP BY md5(text)
ORDER BY h
"""

# --- Q17: text stats --------------------------------------------------------

def q17_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.round(F.avg(F.length("text")), 2).alias("avg_len"),
        )
        .orderBy("lang")
    )


Q17_ORACLE = """
SELECT lang,
       COUNT(*) AS n_docs,
       ROUND(AVG(n_chars), 2) AS avg_chars,
       ROUND(AVG(LENGTH(text)), 2) AS avg_len
FROM documents
GROUP BY lang
ORDER BY lang
"""

def q51_positional_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First three tokens of each document WITH their array position —
    posexplode, the ordinal-aware flatten q1's plain explode doesn't
    cover (order matters for n-gram/windowed text features). Positions
    index the RAW split array (empties keep their slot, then drop), so
    both engines agree on pos without ordinal renumbering."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 50)
    return (
        docs.select(
            "doc_id",
            F.posexplode(F.split("text", "[^a-zA-Z]+")).alias("pos", "token"),
        )
        .filter((F.col("pos") < 3) & (F.col("token") != ""))
        .orderBy("doc_id", "pos")
    )


# DuckDB: index the raw split list with a tiny generate_series relation
# (1-based -> pos = i-1); same raw-slot position semantics as posexplode.
Q51_ORACLE = """
SELECT doc_id, i - 1 AS pos, toks[i] AS token
FROM (SELECT doc_id, string_split_regex(text, '[^a-zA-Z]+') AS toks
      FROM documents WHERE doc_id < 50),
     (SELECT unnest(generate_series(1, 3)) AS i)
WHERE i <= len(toks) AND toks[i] <> ''
ORDER BY doc_id, pos
"""


def q124_salted_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2's inverted index computed through SALTED two-phase holistic
    aggregation (functions.agg.salted_collect_set) and hash-checked
    against q2's plain oracle — the whale-key mitigation promoted from
    a property test (tests/test_salted_agg.py) to a driver-checked
    registry query. A hot token's posting list is collected across
    n_salt partial groups (each deduplicating early) and merged, so no
    single task materializes the whole list; results are identical
    because set-union is associative/commutative. This is the pattern
    for ANY holistic aggregate on a skewed key at 100 TB — measured by
    q111's skew audit, mitigated here."""
    from ..functions.agg import salted_collect_set

    toks = exploded_tokens(_docs(spark, sf_dir).select("doc_id", "text"))
    sets = salted_collect_set(toks, "token", "doc_id", n_salt=8)
    return (
        sets.select(
            "token",
            F.size("doc_ids").cast("bigint").alias("n_docs"),
            F.concat_ws(
                ",",
                F.sort_array(
                    F.transform("doc_ids", lambda x: x.cast("string"))
                ),
            ).alias("doc_list"),
        )
        .orderBy("token")
    )


QUERIES = [
    QuerySpec(
        "q124_salted_inverted_index",
        q124_salted_inverted_index,
        Q2_ORACLE,
        "q2's inverted index via salted two-phase collect_set "
        "(whale-key mitigation, same oracle)",
        ("text", "skew", "holistic"),
    ),
    QuerySpec(
        "q1_wordcount",
        q1_wordcount,
        Q1_ORACLE,
        "token -> count over documents.text (reference app A1, wc.go:19-40)",
        ("text", "reference-app"),
    ),
    QuerySpec(
        "q2_inverted_index",
        q2_inverted_index,
        Q2_ORACLE,
        "token -> (n_docs, sorted doc list) (reference app A2, indexer.go:20-39)",
        ("text", "reference-app"),
    ),
    QuerySpec(
        "q3_sorted_rollup",
        q3_sorted_rollup,
        Q3_ORACLE,
        "lang -> space-joined sorted distinct sources (A3/A4 reduce semantics)",
        ("text", "reference-app"),
    ),
    QuerySpec(
        "q16_exact_dedup",
        q16_exact_dedup,
        Q16_ORACLE,
        "exact dedup via content hash groupBy",
        ("dedup",),
    ),
    QuerySpec(
        "q17_text_stats",
        q17_text_stats,
        Q17_ORACLE,
        "per-language doc counts and length stats",
        ("text",),
    ),
    QuerySpec(
        "q51_positional_tokens",
        q51_positional_tokens,
        Q51_ORACLE,
        "posexplode: first three tokens per doc with array position",
        ("text", "explode"),
    ),
]
