"""Property-based differential: map_reduce(wc/indexer) vs plain-Python
oracles over hypothesis-generated corpora — generalizes the reference's
fixed-corpus differential (test-mr.sh:81-144) to arbitrary inputs.
Examples are capped: each one runs Spark jobs."""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distributed_map_reduce_spark.operators.mapreduce import (
    indexer_map,
    indexer_reduce,
    map_reduce,
    wc_map,
    wc_reduce,
)

# Text with letters, digits, punctuation, unicode separators.
_text = st.text(
    alphabet=st.characters(codec="ascii", exclude_categories=["Cc", "Cs"]),
    max_size=200,
)
_corpus = st.lists(_text, min_size=1, max_size=6)


def _wc_oracle(texts):
    c = Counter(t for doc in texts for t in wc_map("f", doc))
    return sorted((k, str(n)) for (k, _one), n in c.items())


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_corpus)
def test_wc_matches_python_oracle(spark, texts):
    docs = [(f"doc-{i}", t) for i, t in enumerate(texts)]
    got = sorted(
        (r["key"], r["value"])
        for r in map_reduce(spark, docs, wc_map, wc_reduce, n_reduce=3).collect()
    )
    assert got == _wc_oracle(texts)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_corpus)
def test_indexer_matches_python_oracle(spark, texts):
    docs = [(f"doc-{i}", t) for i, t in enumerate(texts)]
    by_token: dict[str, set] = {}
    for name, doc in docs:
        for tok, _ in indexer_map(name, doc):
            by_token.setdefault(tok, set()).add(name)
    want = sorted(
        (tok, f"{len(ds)} {','.join(sorted(ds))}") for tok, ds in by_token.items()
    )
    got = sorted(
        (r["key"], r["value"])
        for r in map_reduce(
            spark, docs, indexer_map, indexer_reduce, n_reduce=3
        ).collect()
    )
    assert got == want
