"""Shared text column expressions.

The reference's only tokenizer splits on any non-letter rune
(/root/reference/src/mrapps/wc.go:21-24, ``unicode.IsLetter``). The declared
suite narrows that to ``[^a-zA-Z]+`` (SURVEY §2.4 Q1 note) because the
testdata corpus is ASCII and Spark/DuckDB must agree on character classes.

All of these are built-in column expressions — JVM-side, whole-stage
codegen friendly; no Python UDFs in the tokenize path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mirrors the reference tokenizer for ASCII input (wc.go:21-24).
TOKEN_SPLIT_RE = "[^a-zA-Z]+"

# The same tokenizer as SQL-expression text, for operators that build
# higher-order-function expressions around it (shingling, stopword
# filters) — one definition each for Spark and the DuckDB oracle so the
# two engines tokenize identically by construction.
SPARK_TOKS_EXPR = f"filter(split(text, '{TOKEN_SPLIT_RE}'), x -> x != '')"
DUCK_TOKS_EXPR = (
    f"list_filter(string_split_regex(text, '{TOKEN_SPLIT_RE}'), x -> x <> '')"
)


def tokens_col(text: Column | str) -> Column:
    """``array<string>`` of tokens; may contain '' at the edges — callers
    exploding this must filter ``token != ''`` (same as the reference,
    whose FieldsFunc never emits empties)."""
    return F.split(F.col(text) if isinstance(text, str) else text, TOKEN_SPLIT_RE)


def exploded_tokens(df, text_col: str = "text", out: str = "token"):
    """documents -> one row per token, empties dropped.

    Scale note: explode multiplies rows ~100x (tokens/doc). The input is
    round-robin repartitioned first WHEN THE SCAN IS NARROWER THAN THE
    SESSION PARALLELISM (``widen_for_rowlocal`` — r17, gating the r16
    fix): each sf table is a single parquet row group, so the local scan
    is ONE task and the regexp tokenizer (the widest row-local work in
    the text family) would otherwise run serially in it (guide §2.5
    input skew; the _doc_shingles rationale). At cluster scale the scan
    already has thousands of splits and the gate skips the exchange —
    an unconditional repartition there would shuffle the full text
    payload and cap the stage (VERDICT r16 item 1).
    """
    from .partitioning import widen_for_rowlocal

    keep = [c for c in df.columns if c != text_col]
    return (
        widen_for_rowlocal(df)
        .select(*keep, F.explode(tokens_col(text_col)).alias(out))
        .filter(F.col(out) != "")
    )
