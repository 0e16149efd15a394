"""Corpus curation operators — PII redaction.

Every serious training-data pipeline scrubs personally identifiable
information before tokenization (emails, phone numbers, IP addresses —
the C4/Dolma/FineWeb "PII rules" pass). The operator here is a generic
rule table of (name, regex, replacement) applied as chained
``regexp_replace`` calls with per-rule match counts — entirely
whole-stage-codegen string work, zero shuffles until the final tiny
per-source report aggregate. At 100 TB this pass is embarrassingly
parallel and runs at scan speed; the only exchange in the registry
query is the per-source rollup (a handful of rows).

The regex dialect is kept to the RE2 ∩ Java-regex common subset
(character classes, bounded repeats, ``(?:...)`` groups, ``\\b``) so
the DuckDB oracle evaluates the *same* patterns — the cross-engine
check covers the rules themselves, not just the plumbing.

The synthetic corpus (TESTDATA.md) contains no natural PII, so the
registry query deterministically plants it first — emails on every
doc, a second email on every third, a phone on every second, an IPv4
on every fifth — with identical injection expressions on both engines
(the multimodal family's fabricated-payload posture: the fabrication
is part of the query, so the oracle still hash-checks end-to-end).

Reference lineage: the reference's map-phase text transforms
(/root/reference/src/mrapps/wc.go:14-24 — per-record rewrite inside
the map function) are the slot this pass occupies in its pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import QuerySpec
from ..sources import load_table

# (rule, pattern, replacement) — patterns valid and identical under
# Java regex (Spark) and RE2 (DuckDB). Order matters: emails first so
# an address's digit runs are never half-eaten by the later rules.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b555-[0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
)


def redact_pii(
    df: DataFrame,
    col: str = "text",
    rules: tuple[tuple[str, str, str], ...] = PII_RULES,
) -> DataFrame:
    """Append ``n_<rule>`` match-count columns (counted on the original
    text) and a ``<col>_redacted`` column with every rule's matches
    replaced, applying rules in order. Counts are per-occurrence, not
    per-doc. Row-local; adds no exchange to the plan."""
    out = df
    red = F.col(col)
    for name, pat, repl in rules:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col(col), F.lit(pat), F.lit(0))),
        )
        red = F.regexp_replace(red, pat, repl)
    return out.withColumn(f"{col}_redacted", red)


# Deterministic PII planting — doc_id-derived so both engines fabricate
# byte-identical corpora. Kept in one place so the Spark expression and
# the oracle SQL cannot drift independently.
_INJECT_SPARK = (
    "concat(text, ' contact user', cast(doc_id as string), '@example.com',"
    " if(doc_id % 3 = 0,"
    "    concat(' cc admin', cast(doc_id as string), '@mail.example.org'),"
    "    ''),"
    " if(doc_id % 2 = 0,"
    "    concat(' call 555-',"
    "           lpad(cast((doc_id * 7) % 10000 as string), 4, '0')),"
    "    ''),"
    " if(doc_id % 5 = 0,"
    "    concat(' ip 192.168.', cast(doc_id % 256 as string), '.',"
    "           cast((doc_id * 3) % 256 as string)),"
    "    ''))"
)
_INJECT_DUCK = (
    "text || ' contact user' || doc_id || '@example.com'"
    " || CASE WHEN doc_id % 3 = 0"
    "         THEN ' cc admin' || doc_id || '@mail.example.org'"
    "         ELSE '' END"
    " || CASE WHEN doc_id % 2 = 0"
    "         THEN ' call 555-'"
    "              || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')"
    "         ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0"
    "         THEN ' ip 192.168.' || (doc_id % 256) || '.'"
    "              || ((doc_id * 3) % 256)"
    "         ELSE '' END"
)


def q96_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-scrub audit report: plant deterministic emails/phones/IPs
    into the corpus, run :func:`redact_pii`, and roll up per source —
    docs scanned, occurrences redacted per rule, and byte sizes before
    and after. The per-rule counts double as the redaction-rate
    dashboard a curation run publishes.

    Scale shape: injection + three regex counts + three chained
    replaces are one row-local codegen projection over the scan; the
    only shuffle is the per-source rollup (rows = #sources). 100 TB
    runs at scan speed."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.expr(_INJECT_SPARK).alias("text")
    )
    red = redact_pii(docs, "text")
    return (
        red.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_email").cast("long").alias("n_email"),
            F.sum("n_phone").cast("long").alias("n_phone"),
            F.sum("n_ipv4").cast("long").alias("n_ipv4"),
            F.sum(F.length("text")).cast("long").alias("chars_in"),
            F.sum(F.length("text_redacted")).cast("long").alias("chars_out"),
        )
        .orderBy("source")
    )


_EMAIL_RE, _PHONE_RE, _IP_RE = (p for _, p, _ in PII_RULES)

Q96_ORACLE = f"""
WITH inj AS (
  SELECT source, {_INJECT_DUCK} AS t FROM documents
),
r AS (
  SELECT source,
         len(regexp_extract_all(t, '{_EMAIL_RE}')) AS ne,
         len(regexp_extract_all(t, '{_PHONE_RE}')) AS np,
         len(regexp_extract_all(t, '{_IP_RE}')) AS ni,
         length(t) AS ci,
         length(
           regexp_replace(
             regexp_replace(
               regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g'),
             '{_IP_RE}', '<IP>', 'g')) AS co
  FROM inj
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(ne) AS BIGINT) AS n_email,
       CAST(SUM(np) AS BIGINT) AS n_phone,
       CAST(SUM(ni) AS BIGINT) AS n_ipv4,
       CAST(SUM(ci) AS BIGINT) AS chars_in,
       CAST(SUM(co) AS BIGINT) AS chars_out
FROM r
GROUP BY source
ORDER BY source
"""


def observed_filter(df: DataFrame, keep, name: str = "curation_metrics"):
    """Attach free pipeline counters to a curation filter via the
    Observation API: returns ``(filtered_df, observation)`` where the
    observation yields ``{n_in, n_kept}`` after the FIRST action on the
    filtered frame — no second scan, no extra job, unlike a separate
    ``.count()`` (which would re-run the whole upstream pipeline at
    100 TB just to report a keep rate). The metrics ride the action's
    own tasks as accumulator-style observed aggregates.

    Usage::

        kept, obs = observed_filter(docs, passes_rules)
        kept.write.parquet(out)          # the real action
        rate = obs.get["n_kept"] / obs.get["n_in"]
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    tagged = df.withColumn("_keep", keep).observe(
        obs,
        F.count(F.lit(1)).alias("n_in"),
        F.sum(F.col("_keep").cast("long")).alias("n_kept"),
    )
    return tagged.filter(F.col("_keep")).drop("_keep"), obs


QUERIES = [
    QuerySpec(
        "q96_pii_redaction",
        q96_pii_redaction,
        Q96_ORACLE,
        "PII scrub (email/phone/IPv4 regex rules) with per-source "
        "redaction-rate report; rules checked cross-engine",
        ("curation", "text"),
    ),
]
