"""Accuracy contracts for the sketch aggregates vs their exact twins —
the only meaningful check for approximations (no oracle can hash-match
them)."""

import pyspark.sql.functions as F

from distributed_map_reduce_spark.operators.sketches import (
    approx_distinct_parts,
    approx_price_quantiles,
)
from distributed_map_reduce_spark.registry import all_queries
from distributed_map_reduce_spark.sources import load_table


def test_hll_within_rsd_of_exact(spark, sf_dir):
    exact = {
        r["l_returnflag"]: r["n_parts"]
        for r in all_queries()["q19_count_distinct"].build(spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in approx_distinct_parts(spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        # rsd=2%: allow 5 sigma
        assert abs(approx[k] - n) <= max(3, 0.10 * n), (k, approx[k], n)


def test_heavy_hitters_have_no_false_negatives(spark, sf_dir):
    """freqItems guarantee: every token with frequency > support MUST be
    in the candidate set (false positives allowed, false negatives
    not); and the candidate set stays bounded (~1/support)."""
    from distributed_map_reduce_spark.operators.sketches import (
        HH_SUPPORT,
        approx_heavy_tokens,
    )

    got = {r["token"] for r in approx_heavy_tokens(spark, sf_dir).collect()}

    counts = all_queries()["q1_wordcount"].build(spark, sf_dir).collect()
    total = sum(r["c"] for r in counts)
    must_have = {r["token"] for r in counts if r["c"] / total > HH_SUPPORT}
    assert must_have <= got, must_have - got
    assert len(must_have) > 0
    assert len(got) <= 4 / HH_SUPPORT  # bounded candidate set


def test_quantile_sketch_brackets_exact(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    exact = {
        r["o_orderstatus"]: r["qs"]
        for r in o.groupBy("o_orderstatus")
        .agg(F.expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))").alias("qs"))
        .collect()
    }
    approx = {
        r["o_orderstatus"]: (r["p50"], r["p90"], r["p99"])
        for r in approx_price_quantiles(spark, sf_dir).collect()
    }
    for k, qs in exact.items():
        for e, a in zip(qs, approx[k]):
            assert abs(a - e) <= 0.05 * e + 1, (k, a, e)


def test_hll_active_users_tracks_exact_q149(spark, sf_dir):
    """The mergeable-sketch DAU/WAU/MAU must track the exact q149
    triple within HLL error on every anchor day — the accuracy floor
    that makes it a legitimate 100 TB substitute for the exact 30-day
    fan-out (same pattern as the ANN recall floors)."""
    from distributed_map_reduce_spark.operators.sketches import (
        hll_active_users,
    )

    exact = {
        r["anchor"]: (r["dau"], r["wau"], r["mau"])
        for r in all_queries()["q149_active_user_ratios"]
        .build(spark, sf_dir)
        .collect()
    }
    approx = {
        r["anchor"]: (r["dau_est"], r["wau_est"], r["mau_est"])
        for r in hll_active_users(spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for anchor, (dau, wau, mau) in exact.items():
        for est, ex in zip(approx[anchor], (dau, wau, mau)):
            assert abs(est - ex) <= max(2, 0.05 * ex), (anchor, est, ex)


def test_hll_sketch_union_accuracy_and_mergeability(spark, sf_dir):
    """The union of per-source sketches must estimate the GLOBAL exact
    distinct-token count (mergeability — no corpus re-scan), and each
    per-source estimate must track its exact count within HLL error."""
    import pyspark.sql.functions as F

    from distributed_map_reduce_spark.operators.sketches import (
        hll_sketch_union,
    )
    from distributed_map_reduce_spark.sources import load_table

    rows = {r["source"]: r for r in hll_sketch_union(spark, sf_dir).collect()}
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    exact_per = {
        r["source"]: r["n"]
        for r in toks.groupBy("source")
        .agg(F.count_distinct("tok").alias("n"))
        .collect()
    }
    exact_all = toks.select("tok").distinct().count()

    assert set(rows) == set(exact_per) | {"ALL"}
    for src, exact in exact_per.items():
        est = rows[src]["est_distinct"]
        assert abs(est - exact) <= max(2, 0.05 * exact), (src, est, exact)
        assert rows[src]["sketch_bytes"] > 0
    est_all = rows["ALL"]["est_distinct"]
    assert abs(est_all - exact_all) <= max(2, 0.05 * exact_all)
