"""Training-data pipeline operators: packing, splits, decontamination,
corpus mixing.

The reference engine ships none of these (its application surface is
wordcount-family apps, /root/reference/src/mrapps); they are the ops a
100 TB LLM-pretraining pipeline runs between "raw corpus" and "training
shards", implemented Spark-first on the documents table:

- q61 sequence packing: greedy token-budget collation of documents into
  training sequences — the collator step that turns a corpus into
  fixed-budget model inputs.
- q62 split assignment: deterministic content-hash train/val/test
  split — reproducible across runs/engines, no RNG state to ship.
- q65 decontamination: word-8-gram overlap of candidate documents
  against a benchmark probe set — the eval-contamination check every
  serious pretraining run performs.
- q66 corpus mixing: per-source hash-threshold sampling to hit a target
  mixture — deterministic "mix weights" without a shuffle or an RNG.

Every operator is a pure DataFrame plan (no Python in the hot path) and
every hash decision uses md5, which Spark and DuckDB evaluate
identically — the oracle SQL is generated from the same constants.

Scale notes are per-operator; the common theme: the only global
structures are (a) the benchmark shingle set (small by definition —
broadcast) and (b) per-source window state (one running sum per
source partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import DUCK_TOKS_EXPR, SPARK_TOKS_EXPR
from ..registry import QuerySpec
from ..sources import load_table

_TOKS = SPARK_TOKS_EXPR
_DUCK_TOKS = DUCK_TOKS_EXPR


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# --- q61: sequence packing ---------------------------------------------------

SEQ_BUDGET = 512  # tokens per training sequence


def q61_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy in-order packing of documents into token-budget sequences:
    a document starts a new sequence when the running token total of its
    shard crosses the budget (documents are not split; a sequence may
    overflow by one document, the standard greedy collator).

    Packing is per-source (= per output shard), NOT global: a global
    order would serialize the window into one partition, and training
    collators only need intra-shard determinism anyway. Each source
    packs independently under one hash exchange + per-partition sort;
    at 1000 shards that is 1000-way parallel with one running-sum row
    of state per shard."""
    d = _docs(spark, sf_dir).select(
        "source", "doc_id", F.size(F.expr(_TOKS)).alias("toks")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = d.withColumn(
        "prior", F.coalesce(F.sum("toks").over(w), F.lit(0))
    )
    return (
        c.groupBy(
            "source",
            F.floor(F.col("prior") / SEQ_BUDGET).alias("seq_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("bigint").alias("seq_tokens"),
        )
        .orderBy("source", "seq_id")
    )


Q61_ORACLE = f"""
WITH d AS (
  SELECT source, doc_id, len({_DUCK_TOKS}) AS toks FROM documents
),
c AS (
  SELECT source, doc_id, toks,
         COALESCE(SUM(toks) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS prior
  FROM d
)
SELECT source, CAST(prior // {SEQ_BUDGET} AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(toks) AS BIGINT) AS seq_tokens
FROM c
GROUP BY source, seq_id
ORDER BY source, seq_id
"""

# --- q62: deterministic train/val/test split ---------------------------------

# Lexicographic thresholds over the first md5 hex byte: 'cc' = 204/256
# (~80 % train), 'e6' = 230/256 (~10 % val), rest test. String compare,
# no hex->int conversion — identical in both engines by construction.
SPLIT_TRAIN_MAX = "cc"
SPLIT_VAL_MAX = "e6"


def q62_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash split with per-language stratification stats:
    split = f(md5(doc_id)) — stable under reruns, engine-agnostic,
    order-independent, and new documents never move old ones between
    splits (the property rand(seed) + row order cannot give).

    One scan + one tiny groupBy; the split column itself is the real
    product, the (split, lang) histogram is the auditable summary."""
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h < SPLIT_TRAIN_MAX, "train")
        .when(h < SPLIT_VAL_MAX, "val")
        .otherwise("test")
    )
    return (
        _docs(spark, sf_dir)
        .select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .orderBy("split", "lang")
    )


Q62_ORACLE = f"""
SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
              < '{SPLIT_TRAIN_MAX}' THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
              < '{SPLIT_VAL_MAX}' THEN 'val'
            ELSE 'test' END AS split,
       lang, COUNT(*) AS n,
       ROUND(AVG(n_chars), 2) AS avg_chars
FROM documents
GROUP BY split, lang
ORDER BY split, lang
"""

# --- q65: benchmark decontamination ------------------------------------------

DECON_GRAM_N = 8  # word n-gram width (the eval-overlap standard range)
DECON_PROBE_MAX_ID = 50  # doc_id < this = the "benchmark" probe set


def q65_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set contamination scan: for every candidate document, the
    number of distinct word-8-grams it shares with the benchmark probe
    set (here: doc_id < DECON_PROBE_MAX_ID standing in for an eval
    suite). Docs with any overlap surface with their hit count; the
    planted near-duplicates make several candidates light up.

    Scale shape: the probe side is small by definition (eval suites are
    KBs, not TBs) -> distinct shingle hashes broadcast; the corpus side
    is one scan + explode, the join is map-side against the broadcast
    set, and the only shuffle is the final per-doc count. md5 shingle
    hashing keeps the join key 32 bytes regardless of n-gram text."""
    toks = (
        _docs(spark, sf_dir)
        .select("doc_id", F.expr(_TOKS).alias("t"))
        .filter(F.size("t") >= DECON_GRAM_N)
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {DECON_GRAM_N - 1}),"
                f" i -> md5(concat_ws(' ', slice(t, i, {DECON_GRAM_N}))))"
            )
        ).alias("g"),
    )
    probe = (
        grams.filter(F.col("doc_id") < DECON_PROBE_MAX_ID)
        .select("g")
        .distinct()
    )
    cand = grams.filter(F.col("doc_id") >= DECON_PROBE_MAX_ID)
    return (
        cand.join(F.broadcast(probe), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_hit"))
        .orderBy("doc_id")
    )


Q65_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
grams AS (
  SELECT doc_id, md5(array_to_string(t[i:i+{DECON_GRAM_N - 1}], ' ')) AS g
  FROM toks, UNNEST(range(1, len(t) - {DECON_GRAM_N - 2})) AS u(i)
  WHERE len(t) >= {DECON_GRAM_N}
),
probe AS (SELECT DISTINCT g FROM grams WHERE doc_id < {DECON_PROBE_MAX_ID}),
cand AS (SELECT doc_id, g FROM grams WHERE doc_id >= {DECON_PROBE_MAX_ID})
SELECT c.doc_id, CAST(COUNT(DISTINCT c.g) AS BIGINT) AS n_hit
FROM cand c JOIN probe p USING (g)
GROUP BY c.doc_id
ORDER BY doc_id
"""

# --- q66: corpus mixing ------------------------------------------------------

# source-index (mod 4) -> md5 first-byte acceptance threshold (hex,
# lexicographic): '20' = 32/256 = 12.5 %, ... '50' = 80/256 = 31.25 %.
MIX_THRESHOLDS = ["20", "30", "40", "50"]


def _mix_keep() -> "F.Column":
    """The q66 acceptance rule as a Column (shared with q79).

    try_cast: a digit-free source extracts '' which must become NULL,
    not an ANSI-mode CAST_INVALID_INPUT crash. The threshold lookup is
    a CASE chain (not element_at) for two reasons: it mirrors the
    oracle SQL one-for-one, and element_at was observed returning the
    LAST array element — not NULL — for a runtime-NULL index in this
    Spark build (constant-folded NULL indexes behave correctly). The
    final coalesce pins NULL threshold -> reject, agreeing with the
    oracle's CASE (which yields 0, where a Spark SUM over an all-NULL
    group would yield NULL)."""
    idx = F.regexp_extract("source", "([0-9]+)", 1).try_cast("int")
    thr = F.lit(None).cast("string")
    for m, t in enumerate(MIX_THRESHOLDS):
        thr = F.when(idx % 4 == m, F.lit(t)).otherwise(thr)
    h = F.substring(
        F.md5(F.concat(F.col("source"), F.lit(":"), F.col("doc_id"))), 1, 2
    )
    return F.coalesce(h < thr, F.lit(False))


def q66_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus mixing: each source is downsampled to its
    target weight by a content-hash acceptance test — the "mixture
    weights" step of pretraining-data assembly, reproducible with no
    RNG and no coordination (each row decides locally from
    md5(source:doc_id)).

    One scan, one 20-group aggregate; conditional count keeps accepted
    and total in the same pass (no second scan, no join)."""
    return (
        _docs(spark, sf_dir)
        .select("source", _mix_keep().alias("keep"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("keep").cast("bigint")).alias("n_kept"),
        )
        .orderBy("source")
    )


_MIX_CASE = " ".join(
    f"WHEN {m} THEN '{t}'" for m, t in enumerate(MIX_THRESHOLDS)
)

# The q66 acceptance rule as a DuckDB boolean expression (shared with
# the q79 oracle) — generated from the same constants as _mix_keep().
_DUCK_MIX_KEEP = f"""substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 2)
                  < (CASE (TRY_CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 4)
                     {_MIX_CASE} END)"""

Q66_ORACLE = f"""
SELECT source, COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN {_DUCK_MIX_KEEP}
             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents
GROUP BY source
ORDER BY source
"""


# --- q79: mixture yield estimation -------------------------------------------

def q79_mixture_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much training data the mix actually yields: per source, the
    kept document count under the q66 acceptance rule, their total
    token mass, and the number of SEQ_BUDGET-token sequences that mass
    packs into (ceil) — the capacity-planning number every pretraining
    run needs before launching the full pipeline.

    One scan (tokenize + hash-accept in the same projection), one
    20-group aggregate with map-side partials; composition of the q66
    rule and q61's budget with no join at all. SEQ_BUDGET is a power of
    two, so tokens/budget is float-exact and ceil agrees across
    engines."""
    d = _docs(spark, sf_dir).select(
        "source",
        F.size(F.expr(_TOKS)).alias("toks"),
        _mix_keep().alias("keep"),
    )
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("keep").cast("bigint")).alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("toks")).otherwise(0))
            .cast("bigint")
            .alias("kept_tokens"),
        )
        .withColumn(
            "n_sequences",
            F.ceil(F.col("kept_tokens") / SEQ_BUDGET).cast("bigint"),
        )
        .orderBy("source")
    )


Q79_ORACLE = f"""
WITH d AS (
  SELECT source, len({_DUCK_TOKS}) AS toks,
         ({_DUCK_MIX_KEEP}) AS keep
  FROM documents
)
SELECT source, COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN keep THEN toks ELSE 0 END) AS BIGINT)
         AS kept_tokens,
       CAST(CEIL(CAST(SUM(CASE WHEN keep THEN toks ELSE 0 END) AS DOUBLE)
                 / {SEQ_BUDGET}) AS BIGINT) AS n_sequences
FROM d
GROUP BY source
ORDER BY source
"""


# --- q67: sliding token-window chunking --------------------------------------

CHUNK_SIZE = 48  # tokens per chunk
CHUNK_STRIDE = 32  # tokens between chunk starts (overlap = SIZE - STRIDE)


def q67_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: every document split into overlapping
    token windows (size 48, stride 32) with an md5 content fingerprint
    per chunk — the chunker feeding RAG indexes and fixed-context
    training examples. Chunk count per doc is ceil(max(n-size,0)/stride)
    + 1, so the final chunk may be short and every token is covered.

    Pure projection + explode (no shuffle at all before the output
    sort): chunking is row-local, the fingerprint keeps downstream
    chunk-dedup joins fixed-width, and the op scales embarrassingly."""
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.expr(_TOKS).alias("t")
    ).withColumn("n", F.size("t"))
    n_chunks = F.expr(
        f"(greatest(n - {CHUNK_SIZE}, 0) + {CHUNK_STRIDE} - 1)"
        f" div {CHUNK_STRIDE} + 1"
    )
    return (
        toks.withColumn(
            "chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1))
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.expr(
                f"slice(t, chunk_id * {CHUNK_STRIDE} + 1, {CHUNK_SIZE})"
            ).alias("c"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("c").cast("bigint").alias("n_tok"),
            F.md5(F.concat_ws(" ", "c")).alias("fp"),
        )
        .orderBy("doc_id", "chunk_id")
    )


# ORDER-BY-free body, exported so composers (q83) can embed it as a CTE
# without string surgery on the ordered text.
Q67_ORACLE_BODY = f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKS} AS t, len({_DUCK_TOKS}) AS n FROM documents
),
chunks AS (
  SELECT doc_id, i AS chunk_id,
         t[(i * {CHUNK_STRIDE} + 1):(i * {CHUNK_STRIDE} + {CHUNK_SIZE})] AS c
  FROM toks, UNNEST(range(0,
      CAST((GREATEST(n - {CHUNK_SIZE}, 0) + {CHUNK_STRIDE} - 1)
           // {CHUNK_STRIDE} AS BIGINT) + 1)) AS u(i)
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(len(c) AS BIGINT) AS n_tok,
       md5(array_to_string(c, ' ')) AS fp
FROM chunks
"""

Q67_ORACLE = Q67_ORACLE_BODY + "ORDER BY doc_id, chunk_id\n"


# --- q84: deterministic per-stratum k-sample ---------------------------------

SAMPLE_K = 5  # documents per stratum


def q84_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: the SAMPLE_K documents
    with the smallest md5(doc_id) in each language — how a pipeline
    pins a fixed eval/inspection subset per stratum that never changes
    under reruns, engine swaps, or corpus appends-at-the-end (contrast
    rate-based q66, which cannot promise an exact count).

    One shuffle on the stratum key; the rank<=k predicate triggers
    WindowGroupLimit (pinned for this pattern in test_plans.py), so
    each partition keeps k rows through the sort instead of sorting the
    stratum — at 100 TB the per-executor state is k rows per stratum,
    not the stratum."""
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        _docs(spark, sf_dir)
        .select("lang", "doc_id", h.alias("sample_rank_key"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SAMPLE_K)
        .select("lang", "doc_id", "rn")
        .orderBy("lang", "rn")
    )


Q84_ORACLE = f"""
SELECT lang, doc_id, CAST(rn AS INT) AS rn
FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC,
                                     doc_id ASC) AS rn
  FROM documents
)
WHERE rn <= {SAMPLE_K}
ORDER BY lang, rn
"""


# --- q83: exact-substring duplication via chunk fingerprints -----------------

def q83_substring_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication detector: full CHUNK_SIZE-token
    windows whose md5 fingerprint appears in more than one document —
    the windowed form of exact-substring dedup (long verbatim passages
    shared across documents are the strongest contamination/boilerplate
    signal, invisible to whole-doc hashing). Sliding windows with
    stride < size guarantee any verbatim run of >= size+stride-1 tokens
    produces at least one aligned colliding window in both documents.

    Composition: the q67 chunker (row-local explode) + one groupBy on
    the 16-byte fingerprint with map-side partials — cost is linear in
    corpus tokens, no pair join; the fingerprint groupBy is the same
    shape as exact dedup (q16) one level below document granularity."""
    chunks = q67_chunking(spark, sf_dir).filter(
        F.col("n_tok") == CHUNK_SIZE  # short tail windows collide trivially
    )
    return (
        chunks.groupBy("fp")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("fp")
    )


Q83_ORACLE = f"""
WITH chunks AS ({Q67_ORACLE_BODY})
SELECT fp, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       COUNT(*) AS n_occurrences,
       MIN(doc_id) AS first_doc
FROM chunks
WHERE n_tok = {CHUNK_SIZE}
GROUP BY fp HAVING COUNT(DISTINCT doc_id) > 1
ORDER BY fp
"""


# --- q72: canonical-document selection among near-duplicates -----------------

def q72_canonical_pairs(
    spark: SparkSession, sf_dir: str, pairs: DataFrame | None = None
) -> DataFrame:
    """Dedup POLICY: for every near-duplicate pair, keep the higher-
    quality copy (ties keep the lower doc_id) — the selection step
    between "pairs found" (q24/q25) and "corpus written". Composes the
    shingle-Jaccard pair detector with the per-doc quality frame; two
    hash joins on doc_id, no new shuffles beyond them. At 100 TB the
    same join runs against the LSH candidate pairs instead of the exact
    detector — the policy is detector-agnostic; ``pairs=`` accepts the
    persisted bucketed store (dedup.write_pair_store)."""
    from .dedup import resolve_pairs
    from .textanalysis import doc_quality_scores

    pairs = resolve_pairs(spark, sf_dir, pairs).select("ad", "bd")
    s = doc_quality_scores(spark, sf_dir)
    sa = s.select(F.col("doc_id").alias("ad"), F.col("score").alias("score_a"))
    sb = s.select(F.col("doc_id").alias("bd"), F.col("score").alias("score_b"))
    better_b = F.col("score_b") > F.col("score_a")
    return (
        pairs.join(sa, "ad")
        .join(sb, "bd")
        .select(
            "ad",
            "bd",
            F.when(better_b, F.col("bd")).otherwise(F.col("ad")).alias(
                "keep_doc"
            ),
            F.when(better_b, F.col("score_b"))
            .otherwise(F.col("score_a"))
            .alias("score_kept"),
        )
        .orderBy("ad", "bd")
    )


def _q72_oracle() -> str:
    from .dedup import Q24_ORACLE_BODY
    from .textanalysis import DUCK_SCORED_SQL

    return f"""
WITH pairs AS ({Q24_ORACLE_BODY}),
scored AS ({DUCK_SCORED_SQL})
SELECT p.ad, p.bd,
       CASE WHEN sb.score > sa.score THEN p.bd ELSE p.ad END AS keep_doc,
       CASE WHEN sb.score > sa.score THEN sb.score ELSE sa.score END
         AS score_kept
FROM pairs p
JOIN scored sa ON sa.doc_id = p.ad
JOIN scored sb ON sb.doc_id = p.bd
ORDER BY ad, bd
"""


# --- q95: deterministic epoch shuffle + sharding -----------------------------

EPOCH_SEED = "epoch17:"  # change the prefix -> a fresh, reproducible epoch order
N_SHARDS = 8


def q95_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-epoch shuffle: every document gets a
    pseudo-random but reproducible position from md5(seed || doc_id),
    is routed to one of {N_SHARDS} shards by the hash's top 32 bits,
    and ranked within its shard — the "global shuffle" step before
    writing epoch shards, with no RNG state to ship (new epoch = new
    seed prefix; same lineage as q62's hash split).

    Scale shape: the hash is row-local codegen; the ONLY shuffle is the
    per-shard ranking window (partitioned by shard — never a global
    sort). At 100 TB the same frame feeds
    ``write.partitionBy(shard)`` + ``sortWithinPartitions(m)`` so even
    the rank materializes as a local sort per shard file."""
    h = _docs(spark, sf_dir).select(
        "doc_id",
        F.md5(
            F.concat(F.lit(EPOCH_SEED), F.col("doc_id").cast("string"))
        ).alias("m"),
    )
    s = h.withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring("m", 1, 8), 16, 10).cast("bigint"),
            F.lit(N_SHARDS),
        ),
    )
    w = Window.partitionBy("shard").orderBy("m", "doc_id")
    return (
        s.select(
            "shard",
            F.row_number().over(w).alias("ord"),
            "doc_id",
        )
        .orderBy("shard", "ord")
    )


Q95_ORACLE = f"""
WITH h AS (
  SELECT doc_id,
         md5('{EPOCH_SEED}' || CAST(doc_id AS VARCHAR)) AS m
  FROM documents
),
s AS (
  SELECT doc_id, m,
         CAST(('0x' || substr(m, 1, 8)) AS BIGINT) % {N_SHARDS} AS shard
  FROM h
)
SELECT shard,
       ROW_NUMBER() OVER (PARTITION BY shard ORDER BY m, doc_id) AS ord,
       doc_id
FROM s
ORDER BY shard, ord
"""


def q109_split_leakage(
    spark: SparkSession, sf_dir: str, pairs: DataFrame | None = None
) -> DataFrame:
    """Cross-split near-dup leakage audit: every q24 near-dup pair
    classified by the q62 hash-split of its two documents — the check
    that says whether eval is contaminated by training near-duplicates
    (the leak n-gram decontamination (q65) exists to prevent, measured
    at the near-dup rather than exact-overlap level). Any off-diagonal
    mass (train|val, train|test, val|test) is leakage.

    Zero extra scans: the split is a row-local function of doc_id
    (q62's md5 prefix), so both labels compute directly on the pair
    frame — the whole audit is q24's detector plus one tiny groupBy.
    The detector swaps for LSH/prefix candidates at 100 TB as in
    q38/q72/q77, and ``pairs=`` accepts the persisted bucketed store."""
    from .dedup import resolve_pairs

    def split_of(col: str):
        h = F.substring(F.md5(F.col(col).cast("string")), 1, 2)
        return (
            F.when(h < SPLIT_TRAIN_MAX, "train")
            .when(h < SPLIT_VAL_MAX, "val")
            .otherwise("test")
        )

    pairs = resolve_pairs(spark, sf_dir, pairs)
    labeled = pairs.select(
        F.least(split_of("ad"), split_of("bd")).alias("split_a"),
        F.greatest(split_of("ad"), split_of("bd")).alias("split_b"),
    )
    return (
        labeled.groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .withColumn("leaks", F.col("split_a") != F.col("split_b"))
        .orderBy("split_a", "split_b")
    )


def _q109_oracle() -> str:
    from .dedup import Q24_ORACLE_BODY

    split_sql = (
        "CASE WHEN substr(md5(CAST({c} AS VARCHAR)), 1, 2)"
        f" < '{SPLIT_TRAIN_MAX}' THEN 'train'"
        " WHEN substr(md5(CAST({c} AS VARCHAR)), 1, 2)"
        f" < '{SPLIT_VAL_MAX}' THEN 'val'"
        " ELSE 'test' END"
    )
    sa, sb = split_sql.format(c="ad"), split_sql.format(c="bd")
    return f"""
WITH pairs AS ({Q24_ORACLE_BODY}),
lab AS (
  SELECT LEAST({sa}, {sb}) AS split_a, GREATEST({sa}, {sb}) AS split_b
  FROM pairs
)
SELECT split_a, split_b, COUNT(*) AS n_pairs,
       split_a <> split_b AS leaks
FROM lab
GROUP BY split_a, split_b
ORDER BY split_a, split_b
"""


# --- q125: temperature-weighted source mixture -------------------------------

TEMP_ALPHA = 0.7        # sampling temperature exponent (weights ∝ n^α)
TEMP_BUDGET_FRAC = 0.5  # corpus fraction the mixture may keep


def q125_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source mixture (the multilingual-pretraining
    standard: sampling weight ∝ n_s^α, α<1 upsamples small sources
    relative to their share): per source, the normalized weight, the
    integer document budget k = round(T·w), and the DETERMINISTIC
    exactly-k selection (smallest md5 rank, q84's mechanism) proving
    the budget is realizable. q66 hits a FIXED per-source rate; this
    derives the rate from corpus statistics — the knob α is the policy.

    Cross-engine determinism: the weight is ROUNDED to 6 dp before the
    budget multiply, so both engines compute k from bit-identical
    doubles — Σ n^α summation-order ulps cannot flip the floor(x+0.5)
    at the .5 boundary near-equal source sizes would otherwise sit on.

    Scale: counts + a 2-row broadcast scalar + one window shuffle on
    source (WindowGroupLimit keeps k rows per partition). The doc_id
    hash ranking never re-ranks old docs when a crawl appends — the
    selection is stable under growth, like q62's split."""
    c = (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    tot = c.agg(
        F.sum(F.pow("n_docs", F.lit(TEMP_ALPHA))).alias("z"),
        F.floor(F.sum("n_docs") * TEMP_BUDGET_FRAC).alias("t"),
    )
    k = c.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.round(
            F.pow("n_docs", F.lit(TEMP_ALPHA)) / F.col("z"), 6
        ).alias("weight"),
        "t",
    ).select(
        "source",
        "n_docs",
        "weight",
        F.least(
            F.col("n_docs"),
            F.floor(F.col("t") * F.col("weight") + 0.5).cast("bigint"),
        ).alias("k_target"),
    )
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    ranked = (
        _docs(spark, sf_dir)
        .select("source", "doc_id")
        .withColumn("rn", F.row_number().over(w))
    )
    return (
        ranked.join(k, "source")
        .filter(F.col("rn") <= F.col("k_target"))
        .groupBy("source", "n_docs", "weight", "k_target")
        .agg(
            F.count(F.lit(1)).alias("k_selected"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("source")
    )


Q125_ORACLE = f"""
WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
tot AS (
  SELECT SUM(POW(n_docs, {TEMP_ALPHA})) AS z,
         FLOOR(SUM(n_docs) * {TEMP_BUDGET_FRAC}) AS t
  FROM c
),
k AS (
  SELECT source, n_docs,
         ROUND(POW(n_docs, {TEMP_ALPHA}) / z, 6) AS weight,
         LEAST(n_docs,
               CAST(FLOOR(t * ROUND(POW(n_docs, {TEMP_ALPHA}) / z, 6) + 0.5)
                    AS BIGINT)) AS k_target
  FROM c CROSS JOIN tot
),
r AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC,
                                     doc_id ASC) AS rn
  FROM documents
)
SELECT k.source, k.n_docs, k.weight, k.k_target,
       COUNT(*) AS k_selected, MIN(r.doc_id) AS first_doc
FROM k JOIN r ON r.source = k.source AND r.rn <= k.k_target
GROUP BY k.source, k.n_docs, k.weight, k.k_target
ORDER BY k.source
"""


# --- q113: per-source equal-depth length bins (ntile) ------------------------

LENGTH_BINS = 4  # quartiles


def q113_length_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source equal-depth document-length quartiles — the "what
    does a length-balanced batch look like per corpus" diagnostic that
    sizes sequence-packing budgets (q61) and flags sources whose length
    distribution collapsed. ntile(4) over (n_chars, doc_id) gives
    deterministic equal-depth bins (both engines assign floor/ceil
    remainders to the leading bins the same way); output is each bin's
    row count, char range, and mean length.

    Scale shape: the window partitions by SOURCE, so no global sort /
    SinglePartition exchange ever appears — each source's rows sort
    within their shuffle partition. At 100 TB a single source is still
    billions of rows; the drop-in replacement there is binning against
    approx_percentile boundaries (one pass, no per-row window), which
    q102's band logic already demonstrates — ntile is the exact-answer
    variant."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return (
        docs.select(
            "source", "n_chars", F.ntile(LENGTH_BINS).over(w).alias("bin")
        )
        .groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("source", "bin")
    )


Q113_ORACLE = f"""
SELECT source, bin, COUNT(*) AS n,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
       ROUND(AVG(n_chars), 4) AS avg_chars
FROM (
  SELECT source, n_chars,
         ntile({LENGTH_BINS}) OVER (
           PARTITION BY source ORDER BY n_chars, doc_id) AS bin
  FROM documents
)
GROUP BY source, bin
ORDER BY source, bin
"""


# --- q137: quality-weighted importance sampling ------------------------------

IMP_HEX_DIGITS = 4  # md5-prefix resolution: u in {0..65535}/65536


def q137_importance_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality-weighted (importance) sampling: keep each
    document with probability equal to its quality score — the DCLM /
    FineWeb-style curation step between hard filtering (keep/drop
    rules) and uniform subsampling, here with md5 as the RNG so the
    sample is reproducible across runs AND engines (q62/q66's hash-
    threshold posture applied to a per-row weight instead of a global
    rate).

    keep(doc) <=> md5(doc_id)[:4] < printf('%04x', floor(score *
    16^4)) — a pure string comparison on hex, identical in both
    engines, no float RNG anywhere. Emits the per-source audit frame
    (docs, kept, exact integer score mass) rather than the sample
    itself, so the result is tiny and hash-checkable; the sample is
    the same frame without the final groupBy.

    Scale shape: row-local decision + one map-side-combinable groupBy —
    embarrassingly parallel at any corpus size."""
    from .textanalysis import doc_quality_scores

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    scored = docs.join(doc_quality_scores(spark, sf_dir), "doc_id")
    cap = 16 ** IMP_HEX_DIGITS
    keep = F.substring(
        F.md5(F.col("doc_id").cast("string")), 1, IMP_HEX_DIGITS
    ) < F.format_string(
        f"%0{IMP_HEX_DIGITS}x",
        F.least(
            F.floor(F.col("score") * cap), F.lit(cap - 1)
        ).cast("int"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(keep.cast("bigint")).alias("n_kept"),
            F.sum(F.round(F.col("score") * 100).cast("bigint")).alias(
                "score_cents"
            ),
        )
        .orderBy("source")
    )


def _q137_oracle() -> str:
    from .textanalysis import DUCK_SCORED_SQL

    cap = 16 ** IMP_HEX_DIGITS
    return f"""
WITH scored AS ({DUCK_SCORED_SQL}),
j AS (
  SELECT d.source, s.score,
         CASE WHEN substr(md5(CAST(s.doc_id AS VARCHAR)), 1,
                           {IMP_HEX_DIGITS})
                   < printf('%0{IMP_HEX_DIGITS}x',
                            LEAST(CAST(FLOOR(s.score * {cap}) AS BIGINT),
                                  {cap - 1}))
              THEN 1 ELSE 0 END AS keep
  FROM scored s JOIN documents d USING (doc_id)
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(keep) AS BIGINT) AS n_kept,
       CAST(SUM(ROUND(score * 100)) AS BIGINT) AS score_cents
FROM j
GROUP BY source
ORDER BY source
"""


# --- q138: contrastive span pairs --------------------------------------------

SPAN_LEN = 32  # tokens per span; docs need >= 2*SPAN_LEN tokens


def q138_contrastive_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-supervised contrastive pair generation (the Contriever /
    cropping recipe): from every document long enough, two disjoint
    token spans — anchor = tokens 1..32, positive = tokens 33..64 —
    that train "two views of one doc are closer than views of
    different docs". Emits span fingerprints (md5 prefixes) rather
    than the span text, keeping the result frame narrow; the actual
    training-pair materialization is the same projection minus the
    fingerprinting.

    Scale shape: pure row-local projection (slice + join + hash), no
    shuffle at all beyond the final presentation sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.expr(SPARK_TOKS_EXPR)
    return (
        docs.select(
            "doc_id",
            F.size(toks).alias("n_tok"),
            F.array_join(F.slice(toks, 1, SPAN_LEN), " ").alias("a"),
            F.array_join(F.slice(toks, SPAN_LEN + 1, SPAN_LEN), " ").alias(
                "b"
            ),
        )
        .filter(F.col("n_tok") >= 2 * SPAN_LEN)
        .select(
            "doc_id",
            "n_tok",
            F.substring(F.md5("a"), 1, 8).alias("anchor_fp"),
            F.substring(F.md5("b"), 1, 8).alias("positive_fp"),
        )
        .orderBy("doc_id")
    )


Q138_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {DUCK_TOKS_EXPR} AS toks FROM documents
),
s AS (
  SELECT doc_id, len(toks) AS n_tok,
         array_to_string(toks[1:{SPAN_LEN}], ' ') AS a,
         array_to_string(toks[{SPAN_LEN + 1}:{2 * SPAN_LEN}], ' ') AS b
  FROM t
)
SELECT doc_id, n_tok,
       substr(md5(a), 1, 8) AS anchor_fp,
       substr(md5(b), 1, 8) AS positive_fp
FROM s
WHERE n_tok >= {2 * SPAN_LEN}
ORDER BY doc_id
"""


# --- q167: per-source quality caps --------------------------------------------

CAP_K = 30  # max docs kept per source
CAP_SCALE = 10**6  # fixed-point units for the distinct-token quality score


def q167_source_quality_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document caps by quality rank — the CCNet/C4 "domain
    cap" pass: no source may contribute more than {CAP_K} documents,
    and when one over-contributes, the LOWEST-quality docs are dropped
    first. Quality = distinct-token ratio (the q37 repetition signal,
    inverted: templated/repetitive docs rank last), quantized to an
    integer so the rank ordering is exact. Reports each source's total
    docs, kept docs, surviving char mass and the drop rate.

    Determinism: quality_u is an exact integer (round of D/T in 1e-6
    units); rank is ROW_NUMBER over (quality_u DESC, doc_id ASC) — a
    total order, no fp ties.

    Scale shape: one explode -> two map-side-combinable groupBys for
    the per-doc quality, then a window PARTITIONED by source (never
    global — each source ranks independently; skew is bounded by the
    largest single source, the same per-domain sharding every CC
    pipeline accepts), then one tiny per-source rollup."""
    from pyspark.sql.window import Window

    per_doc = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.explode(F.expr(_TOKS)).alias("token"),
        )
        .groupBy("doc_id", "source", "n_chars")
        .agg(
            F.count(F.lit(1)).alias("t"),
            F.count_distinct(F.col("token")).alias("d"),
        )
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.round(
                F.col("d").cast("double")
                / F.col("t").cast("double")
                * CAP_SCALE
            )
            .cast("bigint")
            .alias("quality_u"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("quality_u"), F.asc("doc_id")
    )
    ranked = per_doc.withColumn("rank", F.row_number().over(w))
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("rank") <= CAP_K, 1).otherwise(0)).alias(
                "n_kept"
            ),
            F.sum(
                F.when(F.col("rank") <= CAP_K, F.col("n_chars")).otherwise(0)
            ).alias("kept_chars"),
        )
        .select(
            "source",
            "n_docs",
            "n_kept",
            "kept_chars",
            F.round(
                F.lit(1.0)
                - F.col("n_kept").cast("double")
                / F.col("n_docs").cast("double"),
                4,
            ).alias("drop_rate"),
        )
        .orderBy("source")
    )


Q167_ORACLE = f"""
WITH per_doc AS (
  SELECT doc_id, source, n_chars,
         CAST(ROUND(CAST(COUNT(DISTINCT token) AS DOUBLE)
                    / CAST(COUNT(*) AS DOUBLE) * {CAP_SCALE}) AS BIGINT)
           AS quality_u
  FROM (SELECT doc_id, source, n_chars, unnest({DUCK_TOKS_EXPR}) AS token
        FROM documents)
  GROUP BY doc_id, source, n_chars
),
ranked AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY quality_u DESC, doc_id ASC) AS rank
  FROM per_doc
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rank <= {CAP_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN rank <= {CAP_K} THEN n_chars ELSE 0 END) AS BIGINT)
         AS kept_chars,
       ROUND(1.0 - CAST(SUM(CASE WHEN rank <= {CAP_K} THEN 1 ELSE 0 END)
                        AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4)
         AS drop_rate
FROM ranked
GROUP BY source
ORDER BY source
"""


# --- q183: soft-dedup sampling weights ----------------------------------------

def q183_soft_dedup_weights(
    spark: SparkSession, sf_dir: str, pairs: DataFrame | None = None
) -> DataFrame:
    """Duplicate-aware SOFT dedup: instead of deleting near-duplicates
    (q170's hard keeper policy), every document gets sampling weight
    1/cluster_size, so each near-dup family contributes ONE document's
    worth of expected training mass while retaining intra-family
    variation — the downweighting alternative to removal used when
    near-dups carry distinct formatting/noise worth learning. Reports
    per source: docs, clustered docs, and the effective (weighted)
    doc and char mass in exact parts-per-million integers.

    Scale shape: cluster sizes come from the star-CC frame (clustered
    docs ONLY — a small fraction of any real corpus), broadcast-joined
    against the documents scan; the rollup is one map-side-combinable
    aggregate. Weights are integer micro-units (1e6 div size) — no
    float anywhere, so the per-source sums are exact BIGINTs in both
    engines. ``pairs=`` accepts the persisted bucketed store."""
    from .dedup import resolve_pairs
    from .graph import connected_components_star

    docs = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    pairs = resolve_pairs(spark, sf_dir, pairs)
    cc = connected_components_star(pairs, "ad", "bd")
    sizes = (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("csize"))
        .join(cc, "component")
        .select(F.col("node").alias("doc_id"), "csize")
    )
    weighted = docs.join(F.broadcast(sizes), "doc_id", "left").select(
        "source",
        "n_chars",
        F.coalesce(F.col("csize"), F.lit(1)).alias("sz"),
    )
    return (
        weighted.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("sz") > 1, 1).otherwise(0)).alias(
                "n_clustered"
            ),
            F.sum(F.expr("1000000 div sz")).alias("eff_docs_ppm"),
            F.sum(F.expr("n_chars * 1000000 div sz")).alias(
                "eff_chars_ppm"
            ),
        )
        .orderBy("source")
    )


def _q183_oracle() -> str:
    from .graph import _cc_closure_ctes

    return f"""
WITH RECURSIVE {_cc_closure_ctes()},
sizes AS (
  SELECT c1.doc_id, c2.csize
  FROM cc c1 JOIN (SELECT keeper, COUNT(*) AS csize
                   FROM cc GROUP BY keeper) c2
    ON c2.keeper = c1.keeper
),
weighted AS (
  SELECT d.source, d.n_chars, COALESCE(s.csize, 1) AS sz
  FROM documents d LEFT JOIN sizes s ON s.doc_id = d.doc_id
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clustered,
       CAST(SUM(1000000 // sz) AS BIGINT) AS eff_docs_ppm,
       CAST(SUM(n_chars * 1000000 // sz) AS BIGINT) AS eff_chars_ppm
FROM weighted
GROUP BY source
ORDER BY source
"""


QUERIES = [
    QuerySpec("q183_soft_dedup_weights", q183_soft_dedup_weights,
              _q183_oracle(),
              "duplicate-aware soft-dedup sampling weights (1/cluster "
              "size, exact ppm integers) rolled up per source",
              ("training", "dedup", "curation")),
    QuerySpec("q167_source_quality_caps", q167_source_quality_caps,
              Q167_ORACLE,
              "per-source doc caps dropping lowest distinct-token-ratio "
              "docs first (CCNet/C4 domain-cap pass)",
              ("training", "curation", "quality")),
    QuerySpec("q137_importance_sampling", q137_importance_sampling,
              _q137_oracle(),
              "deterministic quality-weighted sampling audit (md5-as-RNG "
              "keep probability = quality score)",
              ("training", "curation", "sampling")),
    QuerySpec("q138_contrastive_spans", q138_contrastive_spans, Q138_ORACLE,
              "contrastive anchor/positive span pairs per long doc "
              "(cropping recipe, fingerprinted)",
              ("training", "retrieval", "text")),
    QuerySpec("q61_sequence_packing", q61_sequence_packing, Q61_ORACLE,
              "greedy token-budget packing of docs into training sequences",
              ("training", "packing")),
    QuerySpec("q62_split_assignment", q62_split_assignment, Q62_ORACLE,
              "deterministic md5 train/val/test split, per-lang strata",
              ("training", "split")),
    QuerySpec("q65_decontamination", q65_decontamination, Q65_ORACLE,
              "word-8-gram overlap of candidates vs benchmark probe set",
              ("training", "dedup", "decontamination")),
    QuerySpec("q66_corpus_mix", q66_corpus_mix, Q66_ORACLE,
              "per-source hash-threshold downsampling to target mixture",
              ("training", "sampling")),
    QuerySpec("q67_chunking", q67_chunking, Q67_ORACLE,
              "sliding token-window chunking with md5 chunk fingerprints",
              ("training", "chunking")),
    QuerySpec("q72_canonical_pairs", q72_canonical_pairs, _q72_oracle(),
              "keep the higher-quality copy of each near-dup pair",
              ("training", "dedup", "policy")),
    QuerySpec("q79_mixture_yield", q79_mixture_yield, Q79_ORACLE,
              "per-source kept docs/tokens/sequences under the mix rule",
              ("training", "sampling", "capacity")),
    QuerySpec("q83_substring_dup", q83_substring_dup, Q83_ORACLE,
              "cross-doc duplicated full token windows (exact-substring dup)",
              ("training", "dedup", "substring")),
    QuerySpec("q84_stratified_sample", q84_stratified_sample, Q84_ORACLE,
              "deterministic exactly-k-per-language md5-ranked sample",
              ("training", "sampling")),
    QuerySpec("q95_epoch_shuffle", q95_epoch_shuffle, Q95_ORACLE,
              "deterministic md5 epoch shuffle + shard routing + rank",
              ("training", "shuffle")),
    QuerySpec("q125_temperature_mix", q125_temperature_mix, Q125_ORACLE,
              "temperature-weighted source mixture (w ∝ n^0.7) with "
              "deterministic exactly-k realization per source",
              ("training", "sampling", "mixture")),
    QuerySpec("q113_length_bins", q113_length_bins, Q113_ORACLE,
              "per-source equal-depth length quartiles (ntile) for "
              "packing-budget sizing",
              ("training", "stats", "window")),
    QuerySpec("q109_split_leakage", q109_split_leakage, _q109_oracle(),
              "near-dup pairs classified by train/val/test split of each "
              "side - the cross-split leakage audit",
              ("training", "dedup", "audit")),
]
