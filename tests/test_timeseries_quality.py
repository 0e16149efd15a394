"""Property tests for the round-6 additions: the Bloom semi-join
prefilter (q145), the EWMA smoother (q146), the bigram LM scorer
(q147) and the CUSUM drift detector (q148). The DuckDB oracle already
hash-checks each query end-to-end (test_oracle_parity); these pin the
*operator-level* guarantees the hash can't express — zero bloom false
negatives, EWMA convexity, bigram < unigram entropy ordering on real
text, and CUSUM localizing an injected level shift.
"""

import pyspark.sql.functions as F

from distributed_map_reduce_spark.operators.relational import (
    q145_bloom_semi_join,
    q146_ewma_revenue,
)
from distributed_map_reduce_spark.operators.events import q148_cusum_drift
from distributed_map_reduce_spark.sources import load_table


def test_bloom_prefilter_has_no_false_negatives(spark, sf_dir):
    """A Bloom filter may pass strangers but must never drop a member:
    the prefiltered aggregate must equal the plain semi-join aggregate
    exactly (this is what makes the exact-confirm composition == the
    EXISTS oracle)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    build = cust.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 7500)
    ).select(F.col("c_custkey").alias("o_custkey"))
    exact = {
        (r["o_orderpriority"], r["n"], r["cents"])
        for r in orders.join(build, "o_custkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
            ).alias("cents"),
        )
        .collect()
    }
    got = {
        (r["o_orderpriority"], r["n_orders"], r["rev_cents"])
        for r in q145_bloom_semi_join(spark, sf_dir).collect()
    }
    assert got == exact and len(got) > 0


def test_ewma_is_a_convex_combination_of_its_frame(spark, sf_dir):
    """Each EWMA value must lie within [min, max] of the daily cents in
    its own 14-day frame (weights are positive and normalized)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            "o_orderpriority", F.col("o_orderdate").cast("date").alias("day")
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
            ).alias("cents")
        )
        .withColumn("day_num", F.unix_date("day"))
    )
    a = daily.select(
        F.col("o_orderpriority").alias("p"),
        F.col("day").alias("day"),
        F.col("day_num").alias("anchor"),
    )
    b = daily.select(
        F.col("o_orderpriority").alias("p2"),
        F.col("day_num").alias("d2"),
        F.col("cents").alias("c2"),
    )
    bounds = (
        a.join(
            b,
            (F.col("p") == F.col("p2"))
            & (F.col("d2") <= F.col("anchor"))
            & (F.col("d2") > F.col("anchor") - 14),
        )
        .groupBy(F.col("p").alias("o_orderpriority"), "day")
        .agg(F.min("c2").alias("lo"), F.max("c2").alias("hi"))
    )
    joined = (
        q146_ewma_revenue(spark, sf_dir)
        .join(bounds, ["o_orderpriority", "day"])
        .select(
            (
                (F.col("ewma_cents") >= F.col("lo") - 1e-6)
                & (F.col("ewma_cents") <= F.col("hi") + 1e-6)
            ).alias("ok")
        )
    )
    n_bad = joined.filter(~F.col("ok")).count()
    assert n_bad == 0 and joined.count() > 0


def test_active_user_ratios_are_monotone(spark, sf_dir):
    """DAU <= WAU <= MAU by containment of the trailing windows, and
    stickiness is a valid basis-point fraction."""
    from distributed_map_reduce_spark.operators.events import (
        q149_active_user_ratios,
    )

    rows = q149_active_user_ratios(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["dau"] <= r["wau"] <= r["mau"]
        assert 0 <= r["stick_bp"] <= 10000


def test_referential_integrity_clean_on_generated_corpus(spark, sf_dir):
    """The driver-generated TPC-H-ish tables are referentially closed on
    the parent-side checks; the audit must report zero orphans there
    (childless orders can legitimately exist in a sampled corpus, so
    that check only asserts n_bad <= n_total)."""
    from distributed_map_reduce_spark.operators.relational import (
        q150_referential_integrity,
    )

    out = {r["check_name"]: r for r in
           q150_referential_integrity(spark, sf_dir).collect()}
    assert set(out) == {
        "lineitem_orphan_order", "order_childless",
        "order_missing_customer", "customer_missing_nation",
    }
    assert out["lineitem_orphan_order"]["n_bad"] == 0
    assert out["order_missing_customer"]["n_bad"] == 0
    assert out["customer_missing_nation"]["n_bad"] == 0
    for r in out.values():
        assert 0 <= r["n_bad"] <= r["n_total"]


def test_benford_shares_form_a_distribution(spark, sf_dir):
    """Nine digits, observed shares sum to ~10000 bp (floor division
    loses at most 9 bp), and the expected shares are the Benford
    constants."""
    from distributed_map_reduce_spark.operators.relational import (
        q152_benford_digits,
    )

    rows = q152_benford_digits(spark, sf_dir).collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    total_bp = sum(r["share_bp"] for r in rows)
    assert 10000 - 9 <= total_bp <= 10000
    assert [r["benford_bp"] for r in rows] == [
        3010, 1760, 1249, 969, 791, 669, 579, 511, 457,
    ]


def test_vocab_overlap_triangle_is_complete_and_bounded(spark, sf_dir):
    """One row per unordered source pair; Jaccard bp in [0, 10000];
    intersection never exceeds either vocabulary."""
    from distributed_map_reduce_spark.operators.textanalysis import (
        q151_vocab_overlap,
    )

    rows = q151_vocab_overlap(spark, sf_dir).collect()
    n_sources = len({r["source_a"] for r in rows}
                    | {r["source_b"] for r in rows})
    assert len(rows) == n_sources * (n_sources - 1) // 2
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert r["n_common"] <= min(r["n_a"], r["n_b"])
        assert 0 <= r["jaccard_bp"] <= 10000


def test_cusum_flags_injected_level_shift(spark):
    """A synthetic series flat at 100 then flat at 200 must put the
    CUSUM peak exactly at the last day of the low regime."""
    import datetime

    rows = []
    base = datetime.datetime(2024, 1, 1)
    for d in range(40):
        val = 1.0 if d < 20 else 2.0
        rows.append(
            (d, base + datetime.timedelta(days=d), 7, "shifty", val, "{}")
        )
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        ev.write.parquet(f"{tmp}/events.parquet")
        out = {r["event_type"]: r for r in q148_cusum_drift(spark, tmp).collect()}
    r = out["shifty"]
    assert r["n_days"] == 40
    # deepest excursion of sum(x_i - mean) is at the regime boundary
    assert r["drift_day"] == datetime.date(2024, 1, 20)
    # n*S_k at k=20: prefix=2000, n=40, total=6000 -> |40*2000 - 20*6000| = 40000
    assert r["max_cusum_num"] == 40000
