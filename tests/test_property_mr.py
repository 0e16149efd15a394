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


# --- weighted median (q117's mechanism) vs a numpy oracle --------------------

_wm_rows = st.lists(
    st.tuples(
        st.sampled_from(["A", "B", "C"]),
        st.integers(min_value=-1000, max_value=1000),  # value
        st.integers(min_value=1, max_value=20),        # integral weight
    ),
    min_size=1,
    max_size=60,
)


def _wm_oracle(rows):
    """Lower weighted median: smallest value whose cumulative weight
    reaches half the group total (ties merged — the RANGE-frame rule)."""
    out = {}
    for g in {r[0] for r in rows}:
        vw = sorted((v, w) for gg, v, w in rows if gg == g)
        tot = sum(w for _, w in vw)
        cum = 0.0
        i = 0
        while i < len(vw):
            j = i
            while j < len(vw) and vw[j][0] == vw[i][0]:
                cum += vw[j][1]
                j += 1
            if cum >= tot / 2.0:
                out[g] = vw[i][0]
                break
            i = j
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_wm_rows)
def test_weighted_median_window_matches_oracle(spark, rows):
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    df = spark.createDataFrame(rows, "g string, v long, w long")
    wcum = (
        Window.partitionBy("g")
        .orderBy("v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("g")
    c = df.select(
        "g",
        "v",
        F.sum("w").over(wcum).alias("cum"),
        F.sum("w").over(wtot).alias("tot"),
    )
    got = {
        r["g"]: r["m"]
        for r in c.groupBy("g")
        .agg(
            F.min(
                F.when(F.col("cum") >= F.col("tot") / 2.0, F.col("v"))
            ).alias("m")
        )
        .collect()
    }
    assert got == _wm_oracle(rows)


# --- weighted_median_approx (hot-group fallback) vs the exact answer ---------

_wma_rows = st.lists(
    st.tuples(
        st.sampled_from(["A", "B"]),
        # skewed value domain: cluster near 0 with rare large outliers,
        # the shape that makes fixed-width bins earn their error bound
        st.one_of(
            st.integers(min_value=0, max_value=10),
            st.integers(min_value=900, max_value=1000),
        ),
        st.integers(min_value=1, max_value=50),  # hot integral weights
    ),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_wma_rows)
def test_weighted_median_approx_within_one_bin(spark, rows):
    """The histogram fallback's contract: its answer is a real member
    value v with  0 <= exact_median - v <= (max-min)/n_bins  per group.
    n_bins=8 so the binning actually coarsens (512 would be exact at
    this data size)."""
    import pyspark.sql.functions as F

    from distributed_map_reduce_spark.operators.relational import (
        weighted_median_approx,
    )

    n_bins = 8
    df = spark.createDataFrame(rows, "g string, v long, w long")
    got = {
        r["g"]: r["wm_approx"]
        for r in weighted_median_approx(df, "g", "v", "w", n_bins=n_bins).collect()
    }
    exact = _wm_oracle(rows)
    values = {g: [v for gg, v, _ in rows if gg == g] for g in exact}
    assert set(got) == set(exact)
    for g, approx in got.items():
        width = (max(values[g]) - min(values[g])) / n_bins
        assert approx in values[g], (g, approx)
        assert 0 <= exact[g] - approx <= width, (g, approx, exact[g], width)


# --- gaps-and-islands (q136's mechanism) vs a python oracle ------------------

_streak_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),    # user
        st.integers(min_value=0, max_value=25),   # day offset (dups ok)
    ),
    min_size=1,
    max_size=50,
)


def _streak_oracle(rows):
    """Longest run of consecutive distinct days per user."""
    out = {}
    for u in {r[0] for r in rows}:
        days = sorted({d for uu, d in rows if uu == u})
        best = run = 1
        for a, b in zip(days, days[1:]):
            run = run + 1 if b == a + 1 else 1
            best = max(best, run)
        out[u] = best
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_streak_rows)
def test_gaps_and_islands_streaks_match_oracle(spark, rows):
    import datetime

    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    base = datetime.date(2024, 1, 1)
    df = spark.createDataFrame(
        [(u, base + datetime.timedelta(days=d)) for u, d in rows],
        "u int, d date",
    ).distinct()
    w = Window.partitionBy("u").orderBy("d")
    got = {
        r["u"]: r["streak"]
        for r in df.withColumn("island", F.date_sub("d", F.row_number().over(w)))
        .groupBy("u", "island")
        .agg(F.count(F.lit(1)).alias("len"))
        .groupBy("u")
        .agg(F.max("len").alias("streak"))
        .collect()
    }
    assert got == _streak_oracle(rows)
