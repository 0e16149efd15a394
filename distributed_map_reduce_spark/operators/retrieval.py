"""Lexical retrieval over the document corpus — BM25 top-k.

The RAG-side counterpart of the dedup/quality family: given a set of
query documents, rank the corpus by Okapi BM25 (Robertson & Zaragoza
2009, eq. 2.2-2.4) and keep the top-k hits per query. This is the
retrieval pass a training pipeline runs to mine hard negatives or to
decontaminate against benchmark queries by *semantic* lookup rather
than exact n-gram match (q65's complement).

Scale shape (the part that matters at 100 TB):
- The query term set is tiny by construction (queries x <=12 distinct
  terms) and is **broadcast** into the corpus-sized term-frequency
  frame, so the only big shuffles are the two linear aggregates that
  build tf and df — both map-side-combinable groupBys on (doc, token)
  / (token).
- Everything after the broadcast semi-join is proportional to the hit
  set, not the corpus. Corpus-wide stats (N, avgdl) are a 1-row
  broadcast that stays in-plan.
- No Python anywhere; the scoring expression is whole-stage codegen.

Reference lineage: the reference's inverted-index app
(/root/reference/src/mrapps/indexer.go:14-31) builds exactly the
token -> documents posting structure BM25 consumes; this operator is
that index put to its canonical use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import DUCK_TOKS_EXPR, SPARK_TOKS_EXPR
from ..functions.vectors import cosine_col
from ..registry import QuerySpec
from ..sources import load_table

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 5
QUERY_DOC_MOD = 100  # doc_id % MOD == 0 -> query doc
QUERY_TERMS = 12  # first-N token prefix forms the query


def bm25_query_terms(docs: DataFrame) -> DataFrame:
    """(qid, token): every doc_id % QUERY_DOC_MOD == 0 contributes its
    first QUERY_TERMS distinct tokens as a query."""
    return (
        docs.filter(F.col("doc_id") % QUERY_DOC_MOD == 0)
        .select(
            F.col("doc_id").alias("qid"),
            F.explode(
                F.expr(f"slice({SPARK_TOKS_EXPR}, 1, {QUERY_TERMS})")
            ).alias("token"),
        )
        .distinct()
    )


def bm25_scores(tf: DataFrame, dl: DataFrame, qterms: DataFrame) -> DataFrame:
    """(qid, doc_id, score) from the two corpus-state frames — the ONE
    scoring definition shared by batch q93/q126/q127 and the streaming
    twin (q130), which maintains tf/dl incrementally and scores the
    drained state with this same expression tree.

    df and the (N, avgdl) stats are derived views of tf/dl (df = row
    count per token over tf; both map-side-combinable), so incremental
    maintenance of tf + dl IS incremental maintenance of the whole BM25
    index."""
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    per_term = (
        tf.join(F.broadcast(qterms), "token")
        .filter(F.col("doc_id") != F.col("qid"))
        .join(dfreq, "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "qid",
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    return per_term.groupBy("qid", "doc_id").agg(
        F.round(F.sum("s"), 4).alias("score")
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(qid, doc_id, score): the full rounded BM25 score frame q93
    ranks and q126 fuses — batch construction of the tf/dl state."""
    docs = load_table(spark, sf_dir, "documents")
    # Widen before the tokenizer explode: one-row-group scan = one task
    # for the regexp split otherwise (guide §2.5; the _doc_shingles
    # rationale; r17: width-gated so a many-split cluster scan skips
    # the exchange).
    from ..functions.partitioning import widen_for_rowlocal

    toks = widen_for_rowlocal(docs.select("doc_id", "text")).select(
        "doc_id", F.explode(F.expr(SPARK_TOKS_EXPR)).alias("token")
    )
    # tf feeds four consumers (probe join side, dl, dfreq, and stats
    # via dl) whose exchanges Catalyst can't unify — the q24 pattern: a
    # lazy localCheckpoint materializes the (doc, token, tf) frame once
    # so the corpus is tokenized exactly once, not four times.
    tf = (
        toks.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    return bm25_scores(tf, dl, bm25_query_terms(docs))


def bm25_topk(scored: DataFrame) -> DataFrame:
    """Rank the score frame and keep BM25_TOP_K hits per query. Rank
    ties break on the 4-decimal rounded score then doc_id, so both
    engines (and both execution modes) select identical hit sets."""
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOP_K)
        .select("qid", "rank", "doc_id", "score")
        .orderBy("qid", "rank")
    )


def q93_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k per query doc (every doc_id % 100 == 0;
    query = its first 12 tokens, distinct). Self-hits are excluded."""
    return bm25_topk(_bm25_scored(spark, sf_dir))


# The CTE chain through `scored` is shared by the q93 oracle and the
# q126 fusion oracle (structural composition, the q72 lesson — never
# string-surgery a sibling's oracle).
Q93_SCORED_CTES = f"""toks AS (
  SELECT doc_id, unnest({DUCK_TOKS_EXPR}) AS token FROM documents
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl
),
qterms AS (
  SELECT DISTINCT doc_id AS qid, unnest(t[1:{QUERY_TERMS}]) AS token
  FROM (SELECT doc_id, {DUCK_TOKS_EXPR} AS t FROM documents
        WHERE doc_id % {QUERY_DOC_MOD} = 0)
),
per_term AS (
  SELECT qterms.qid, tf.doc_id,
         LN(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * (tf * (CAST({BM25_K1} AS DOUBLE) + 1.0))
           / (tf + CAST({BM25_K1} AS DOUBLE)
              * (1.0 - CAST({BM25_B} AS DOUBLE)
                 + CAST({BM25_B} AS DOUBLE) * dl / avgdl)) AS s
  FROM tf
  JOIN qterms USING (token)
  JOIN dfreq USING (token)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.doc_id <> qterms.qid
),
scored AS (
  SELECT qid, doc_id, ROUND(SUM(s), 4) AS score
  FROM per_term GROUP BY qid, doc_id
)"""

Q93_ORACLE = f"""
WITH {Q93_SCORED_CTES}
SELECT qid, rank, doc_id, score
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                               ORDER BY score DESC, doc_id) AS rank
  FROM scored
)
WHERE rank <= {BM25_TOP_K}
ORDER BY qid, rank
"""


# --- q126: hybrid retrieval via reciprocal-rank fusion -----------------------

RRF_K0 = 60       # the standard RRF damping constant (Cormack et al. 2009)
FUSE_LIST_K = 10  # depth of each input ranking
FUSE_TOP_K = 5    # fused hits kept per query


def q126_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the LEXICAL ranking (q93's BM25 scores)
    with a DENSE ranking (embedding cosine, vec_id == doc_id) by
    Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    rrf(d) = Σ_r 1/(k0 + rank_r(d)) over the rankings that retrieved d
    in their top-10 list. The modern RAG-retrieval default —
    lexical catches exact terms, dense catches paraphrase, RRF needs no
    score calibration between them because it only consumes RANKS.

    Scale shape: both input rankings are per-query top-k frames (tiny);
    the fusion is one full-outer join on (qid, doc_id) + row-local
    reciprocal arithmetic + a WindowGroupLimit. r17 checkpoint fusion
    (VERDICT r16 item 1): the scored BM25 frame previously cut here at
    its own lazy localCheckpoint, but under AQE that checkpoint
    materializes as a SERIALIZED mini-execution at build time, and
    `lex` has exactly ONE consumer — so the cut bought no reuse, only
    an extra scheduling round-trip. The plan-size concern the cut
    addressed is already covered by the tf checkpoint inside
    _bm25_scored (the corpus is tokenized once); the scored sub-DAG
    from that cut onward now rides inline in this one execution.
    Values identical either way (rounding happens inside
    _bm25_scored's expression tree).
    Determinism: both input ranks tie-break on rounded score then
    doc_id; rrf sums two exact small-integer reciprocals, rounded to
    6 dp."""
    lex = _bm25_scored(spark, sf_dir)
    wl = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    lexr = (
        lex.withColumn("lex_r", F.row_number().over(wl))
        .filter(F.col("lex_r") <= FUSE_LIST_K)
        .select("qid", "doc_id", "lex_r")
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qs = emb.filter(F.col("vec_id") % QUERY_DOC_MOD == 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    cos = F.round(cosine_col(F.col("qv"), F.col("v")), 4) + 0.0
    wd = Window.partitionBy("qid").orderBy(
        F.col("cos").desc(), F.col("doc_id")
    )
    densr = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("doc_id"), cos.alias("cos"))
        .withColumn("den_r", F.row_number().over(wd))
        .filter(F.col("den_r") <= FUSE_LIST_K)
        .select("qid", "doc_id", "den_r")
    )

    rrf = F.round(
        F.coalesce(1.0 / (RRF_K0 + F.col("lex_r")), F.lit(0.0))
        + F.coalesce(1.0 / (RRF_K0 + F.col("den_r")), F.lit(0.0)),
        6,
    )
    wf = Window.partitionBy("qid").orderBy(
        F.col("rrf").desc(), F.col("doc_id")
    )
    return (
        lexr.join(densr, ["qid", "doc_id"], "full_outer")
        .select("qid", "doc_id", rrf.alias("rrf"))
        .withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= FUSE_TOP_K)
        .select("qid", "rank", "doc_id", "rrf")
        .orderBy("qid", "rank")
    )


Q126_ORACLE = f"""
WITH {Q93_SCORED_CTES},
lexr AS (
  SELECT qid, doc_id,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id) AS lex_r
  FROM scored
  QUALIFY lex_r <= {FUSE_LIST_K}
),
emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cospairs AS (
  SELECT q.vec_id AS qid, c.vec_id AS doc_id,
         ROUND(
           list_sum(list_transform(range(1, len(q.v) + 1),
             i -> q.v[i] * c.v[i]))
           / (SQRT(list_sum(list_transform(range(1, len(q.v) + 1),
                i -> q.v[i] * q.v[i])))
              * SQRT(list_sum(list_transform(range(1, len(c.v) + 1),
                i -> c.v[i] * c.v[i])))), 4) + 0.0 AS cos
  FROM emb q JOIN emb c ON c.vec_id <> q.vec_id
  WHERE q.vec_id % {QUERY_DOC_MOD} = 0
),
densr AS (
  SELECT qid, doc_id,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY cos DESC, doc_id) AS den_r
  FROM cospairs
  QUALIFY den_r <= {FUSE_LIST_K}
),
fused AS (
  SELECT COALESCE(l.qid, d.qid) AS qid,
         COALESCE(l.doc_id, d.doc_id) AS doc_id,
         ROUND(COALESCE(1.0 / ({RRF_K0} + l.lex_r), 0.0)
               + COALESCE(1.0 / ({RRF_K0} + d.den_r), 0.0), 6) AS rrf
  FROM lexr l FULL OUTER JOIN densr d
    ON l.qid = d.qid AND l.doc_id = d.doc_id
)
SELECT qid, rank, doc_id, rrf
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                               ORDER BY rrf DESC, doc_id) AS rank
  FROM fused
)
WHERE rank <= {FUSE_TOP_K}
ORDER BY qid, rank
"""


# --- q127: hard-negative mining ----------------------------------------------

HARDNEG_TOP_K = 5  # negatives kept per query


def q127_hard_negatives(
    spark: SparkSession, sf_dir: str, pairs: DataFrame | None = None
) -> DataFrame:
    """Hard-negative mining for embedding/reranker training: per query
    doc, the top BM25 hits that are NOT near-duplicates of the query —
    lexically confusable (high BM25) but genuinely different documents.
    Skipping the near-dup exclusion poisons contrastive training with
    false negatives (the "negative" is actually a positive), so every
    serious retrieval-training pipeline runs exactly this composition:
    retrieval (q93) ∘ dedup (q24), here joined structurally.

    Scale shape: the BM25 score frame carries its own broadcast-probe
    story; the exclusion is a LEFT ANTI join of the (tiny) per-query
    candidate frame against the near-dup pair list on either
    orientation — candidate-set-sized, no corpus re-scan. The pair
    detector swaps for LSH/prefix candidates (q25/q104) unchanged;
    ``pairs=`` accepts the persisted bucketed store, which collapses
    this composition's plan from re-deriving the whole q24 DAG inline
    to one bucketed scan (exchange counts in PLANS.md). r17 checkpoint
    fusion (VERDICT r16 item 1, q126's rationale): the scored frame
    has ONE consumer here, so its former localCheckpoint cut was a
    pure extra build-time mini-execution under AQE — the tf
    checkpoint inside _bm25_scored already bounds plan size and
    tokenizes the corpus once."""
    from .dedup import resolve_pairs

    scored = _bm25_scored(spark, sf_dir)
    pairs = resolve_pairs(spark, sf_dir, pairs).select("ad", "bd")
    dup = pairs.unionByName(
        pairs.select(F.col("bd").alias("ad"), F.col("ad").alias("bd"))
    )
    clean = scored.join(
        dup,
        (scored.qid == dup.ad) & (scored.doc_id == dup.bd),
        "left_anti",
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        clean.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= HARDNEG_TOP_K)
        .select("qid", "rank", F.col("doc_id").alias("neg_id"), "score")
        .orderBy("qid", "rank")
    )


# --- q131: TF-IDF sparse-cosine nearest pairs --------------------------------

TFIDF_DF_FRAC = 0.05  # posting-join skew bound: drop tokens in > 5% of docs
TFIDF_PAIR_K = 20     # global top-k most similar pairs reported


def q131_tfidf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most similar document pairs by TF-IDF cosine, computed
    SPARSELY via a posting-list self-join — the lexical sibling of the
    dense q27 block-matrix cosine, and the similarity measure
    plagiarism/near-dup systems used before embeddings.

    Scale shape: the quadratic step only exists inside a token's
    posting list, and the df cap bounds every posting list at 5% of the
    corpus — RELATIVE, so the bound tracks corpus growth instead of
    silently emptying the candidate set at a larger sf (hot tokens are
    boilerplate with IDF ~ 0 — the same stop-shingle argument as q24's
    max_doc_freq knob, here part of the declared semantics so both
    engines share it; floor of 2 keeps tiny corpora non-degenerate).
    Weights,
    norms, and the pair dot-product are three map-side-combinable
    aggregates over the weight frame, materialized once
    (localCheckpoint, the q24/q93 pattern). The global top-k is a
    TakeOrdered — no full sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.expr(SPARK_TOKS_EXPR)).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # df via a COUNT window over the tf frame (q54's trick: tf rows are
    # unique per (doc, token), so rows-per-token = document frequency)
    with_df = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("token"))
    )
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    cap = F.greatest(F.lit(2), F.ceil(F.lit(TFIDF_DF_FRAC) * F.col("n")))
    w = (
        with_df.crossJoin(F.broadcast(n))
        .filter(F.col("df") <= cap)
        .select(
            "doc_id",
            "token",
            (
                F.col("tf")
                * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0))
            ).alias("w"),
        )
        .localCheckpoint(eager=False)
    )
    # Determinism: a plain SUM over doubles is summed in partial-
    # aggregate completion order — engine- AND run-dependent, so a
    # value near a rounding boundary could hash-mismatch. Instead each
    # sum collects its terms keyed by token, sorts, and LEFT-FOLDS in
    # token order — the same IEEE op sequence on both engines, the q141
    # fixed-order posture applied to variable-length sums. Memory
    # bound: the collected array is the per-DOCUMENT distinct-token set
    # (norms) / the shared-token set of one pair (dot) — proportional
    # to document length, NOT to the corpus (the df cap bounds posting
    # lists, not these). Fine wherever ingestion caps document size
    # (every crawl pipeline does); for uncapped documents the plain SUM
    # is the fallback, trading cross-engine bit-determinism for O(1)
    # aggregation state.
    def _ordered_sum(pairs_col: str) -> F.Column:
        return F.aggregate(
            F.sort_array(F.collect_list(pairs_col)),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        )

    norms = (
        w.select(
            "doc_id",
            F.struct(
                F.col("token").alias("k"), (F.col("w") * F.col("w")).alias("v")
            ).alias("t"),
        )
        .groupBy("doc_id")
        .agg(F.sqrt(_ordered_sum("t")).alias("nrm"))
    )
    dot = (
        w.select(F.col("doc_id").alias("ad"), "token", F.col("w").alias("wa"))
        .join(
            w.select(
                F.col("doc_id").alias("bd"), "token", F.col("w").alias("wb")
            ),
            "token",
        )
        .filter(F.col("ad") < F.col("bd"))
        .select(
            "ad",
            "bd",
            F.struct(
                F.col("token").alias("k"),
                (F.col("wa") * F.col("wb")).alias("v"),
            ).alias("t"),
        )
        .groupBy("ad", "bd")
        .agg(_ordered_sum("t").alias("dot"))
    )
    return (
        dot.join(norms.withColumnsRenamed({"doc_id": "ad", "nrm": "na"}), "ad")
        .join(norms.withColumnsRenamed({"doc_id": "bd", "nrm": "nb"}), "bd")
        .select(
            "ad",
            "bd",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 4).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), "ad", "bd")
        .limit(TFIDF_PAIR_K)
    )


Q131_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({DUCK_TOKS_EXPR}) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
),
with_df AS (
  SELECT doc_id, token, tf,
         COUNT(*) OVER (PARTITION BY token) AS df
  FROM tf
),
n AS (SELECT COUNT(*) AS n FROM documents),
w AS (
  SELECT doc_id, token, tf * LN((n + 1.0) / (df + 1.0)) AS w
  FROM with_df CROSS JOIN n
  WHERE df <= GREATEST(2, CAST(CEIL({TFIDF_DF_FRAC} * n) AS BIGINT))
),
norms AS (
  -- token-ordered left fold with a 0.0 seed == Spark's F.aggregate
  -- over sort_array: identical IEEE op sequence, bit-identical sums
  SELECT doc_id,
         SQRT(list_reduce(list_prepend(0.0, list(w * w ORDER BY token)),
                          (acc, x) -> acc + x)) AS nrm
  FROM w GROUP BY doc_id
),
dot AS (
  SELECT a.doc_id AS ad, b.doc_id AS bd,
         list_reduce(list_prepend(0.0, list(a.w * b.w ORDER BY a.token)),
                     (acc, x) -> acc + x) AS dot
  FROM w a JOIN w b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT ad, bd, ROUND(dot / (na.nrm * nb.nrm), 4) AS cos_sim
FROM dot
JOIN norms na ON na.doc_id = ad
JOIN norms nb ON nb.doc_id = bd
ORDER BY cos_sim DESC, ad, bd
LIMIT {TFIDF_PAIR_K}
"""


def _q127_oracle() -> str:
    from .dedup import Q24_ORACLE_BODY

    return f"""
WITH {Q93_SCORED_CTES},
dup_pairs AS ({Q24_ORACLE_BODY}),
dup AS (
  SELECT ad, bd FROM dup_pairs
  UNION ALL
  SELECT bd, ad FROM dup_pairs
),
clean AS (
  SELECT s.qid, s.doc_id, s.score
  FROM scored s
  WHERE NOT EXISTS (
    SELECT 1 FROM dup WHERE dup.ad = s.qid AND dup.bd = s.doc_id
  )
)
SELECT qid, rank, doc_id AS neg_id, score
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                               ORDER BY score DESC, doc_id) AS rank
  FROM clean
)
WHERE rank <= {HARDNEG_TOP_K}
ORDER BY qid, rank
"""


QUERIES = [
    QuerySpec(
        "q93_bm25_retrieval",
        q93_bm25_retrieval,
        Q93_ORACLE,
        "Okapi BM25 top-k retrieval per query doc (broadcast query set)",
        ("retrieval", "similarity"),
    ),
    QuerySpec(
        "q127_hard_negatives",
        q127_hard_negatives,
        _q127_oracle(),
        "hard-negative mining: top BM25 hits that are NOT near-dups "
        "of the query (retrieval ∘ dedup composition)",
        ("retrieval", "training", "dedup"),
    ),
    QuerySpec(
        "q131_tfidf_knn",
        q131_tfidf_knn,
        Q131_ORACLE,
        "top-20 most similar doc pairs by TF-IDF cosine via df-capped "
        "posting-list self-join (sparse lexical KNN)",
        ("retrieval", "similarity", "dedup", "scale"),
    ),
    QuerySpec(
        "q126_rrf_fusion",
        q126_rrf_fusion,
        Q126_ORACLE,
        "hybrid retrieval: BM25 + embedding-cosine rankings fused by "
        "reciprocal rank fusion (rank-only, no score calibration)",
        ("retrieval", "similarity", "hybrid"),
    ),
]
