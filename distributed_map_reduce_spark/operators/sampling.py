"""Sampling / corpus-mixing operators for training-data assembly.

Not oracle queries (sampling is seed-deterministic but partition-layout
dependent — Spark's Bernoulli sampling draws per row in partition order,
so no cross-engine hash can match); contracts are statistical and
pinned in tests/test_sampling.py.

Scale notes: both operators are narrow — a per-row Bernoulli draw
against a broadcast fraction map, zero shuffle. That is the point:
downsampling/mixing 100 TB must not move data, only drop rows at the
scan. A `where rand(seed) < f` predicate does not push to parquet, but
it runs in codegen and costs no exchange; the downstream pipeline sees
only the survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame, strat_col: str, fractions: dict[str, float], seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sample: keep a row of stratum s with
    probability fractions[s] (strata absent from the map are dropped —
    explicit is better than silently keeping them)."""
    return df.sampleBy(strat_col, fractions, seed=seed)


def weighted_corpus_mix(
    sources: dict[str, tuple[DataFrame, float]], seed: int = 42
) -> DataFrame:
    """Mix corpora at given sampling rates into one frame with a
    ``mix_source`` provenance column — the 'data recipe' step of a
    training pipeline (e.g. {"web": (web_df, 0.1), "code": (code_df,
    1.0)}). Rates are per-source keep probabilities, not output
    proportions: output size ~ sum(|src| * rate).

    Each source samples independently (per-source seed offset decouples
    the draws), then unions by name — all narrow, no shuffle.
    """
    mixed = None
    for i, (name, (df, rate)) in enumerate(sorted(sources.items())):
        part = df.sample(fraction=rate, seed=seed + i).withColumn(
            "mix_source", F.lit(name)
        )
        mixed = part if mixed is None else mixed.unionByName(part)
    if mixed is None:
        raise ValueError("no sources given")
    return mixed
