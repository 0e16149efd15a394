"""Structural invariants of the round-8 additions (q179–q200).

The oracle parity gate already pins VALUE equality against DuckDB at
two scales; these tests pin the mathematical contracts the SQL twin
shares (and therefore cannot check): bound ranges, conservation
totals, monotonicity, and exact-fallback behaviour. All run at the
smoke scale off the shared session fixture.
"""

import math

import pyspark.sql.functions as F

from distributed_map_reduce_spark.operators.dedup import (
    q24_ngram_jaccard_dedup,
    q198_mutual_best_match,
)
from distributed_map_reduce_spark.operators.events import (
    q185_retention_hazard,
    q186_user_entropy,
)
from distributed_map_reduce_spark.operators.graph import (
    q182_degree_assortativity,
)
from distributed_map_reduce_spark.operators.relational import (
    PSI_BANDS,
    q187_percentile_bands_histo,
    q196_psi_value_drift,
    q199_spend_gini,
)
from distributed_map_reduce_spark.operators.sketches import (
    KMV_SKETCH_K,
    q197_kmv_distinct,
)
from distributed_map_reduce_spark.operators.textanalysis import (
    q189_js_source_similarity,
)
from distributed_map_reduce_spark.sources import load_table


def test_assortativity_is_a_correlation(spark, sf_dir):
    row = q182_degree_assortativity(spark, sf_dir).collect()[0]
    assert row["n_edges"] > 0
    if row["r_assort"] is not None:  # degenerate graphs yield NULL
        assert -1.0 <= row["r_assort"] <= 1.0


def test_percentile_bands_conserve_rows(spark, sf_dir):
    rows = q187_percentile_bands_histo(spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r["n_items"] for r in rows) == n_total
    assert [r["band"] for r in rows] == sorted(r["band"] for r in rows)
    assert {r["band"] for r in rows} <= {"Q1", "Q2", "Q3", "Q4"}
    # histogram cutoffs are off by at most one bin: every band holds
    # BETWEEN 15% and 35% of rows around the exact 25% target
    for r in rows:
        assert 0.15 * n_total <= r["n_items"] <= 0.35 * n_total, r


def test_retention_hazard_at_risk_is_a_survival_curve(spark, sf_dir):
    rows = q185_retention_hazard(spark, sf_dir).collect()
    users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_churned"] for r in rows) == users
    assert rows[0]["n_at_risk"] == users  # everyone is at risk at k=min
    at_risk = [r["n_at_risk"] for r in rows]
    assert at_risk == sorted(at_risk, reverse=True)  # non-increasing
    for r in rows:
        assert 0 <= r["hazard_bp"] <= 10000


def test_user_entropy_bounds(spark, sf_dir):
    rows = q186_user_entropy(spark, sf_dir).collect()
    for r in rows:
        # 0 <= H <= ln(n_types); quantization slack of 1e-3
        assert -1e-3 <= r["h_nats"] <= math.log(r["n_types"]) + 1e-3, r


def test_gini_bounds_and_total(spark, sf_dir):
    row = q199_spend_gini(spark, sf_dir).collect()[0]
    assert 0.0 <= row["gini"] < 1.0
    n_cust = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert row["n_customers"] == n_cust


def test_kmv_exact_fallback_and_error_bound(spark, sf_dir):
    rows = q197_kmv_distinct(spark, sf_dir).collect()
    for r in rows:
        if r["n_exact"] <= KMV_SKETCH_K:
            assert r["n_kmv"] == r["n_exact"], r
        else:
            # KMV rse ~ 1/sqrt(K-2) ≈ 6.3%; allow 5 sigma
            assert abs(r["n_kmv"] - r["n_exact"]) <= 0.32 * r["n_exact"], r


def test_jsd_matrix_is_complete_and_bounded(spark, sf_dir):
    rows = q189_js_source_similarity(spark, sf_dir).collect()
    n_sources = (
        load_table(spark, sf_dir, "documents")
        .select("source")
        .distinct()
        .count()
    )
    assert len(rows) == n_sources * (n_sources - 1) // 2  # full matrix
    ln2 = math.log(2.0)
    for r in rows:
        assert -1e-3 <= r["jsd_nats"] <= ln2 + 1e-3, r


def test_mutual_best_match_is_a_matching(spark, sf_dir):
    rows = q198_mutual_best_match(spark, sf_dir).collect()
    pair_keys = {
        (r["ad"], r["bd"])
        for r in q24_ngram_jaccard_dedup(spark, sf_dir).collect()
    }
    seen = set()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert (r["doc_a"], r["doc_b"]) in pair_keys  # subset of pairs
        # best is unique per node -> the result is a matching
        assert r["doc_a"] not in seen and r["doc_b"] not in seen, r
        seen.update((r["doc_a"], r["doc_b"]))


def test_psi_covers_every_adjacent_month_pair(spark, sf_dir):
    rows = q196_psi_value_drift(spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("m")
    )
    lo, hi = o.agg(F.min("m"), F.max("m")).collect()[0]
    n_months = (hi.year - lo.year) * 12 + (hi.month - lo.month) + 1
    assert len(rows) == n_months - 1  # one row per adjacent pair
    for r in rows:
        assert r["psi"] >= -1e-9  # PSI is non-negative
        assert r["n_from"] >= 0 and r["n_to"] >= 0


def test_psi_flags_an_empty_month(spark, sf_dir):
    # synthetic frame: Jan busy, Feb EMPTY, Mar busy — the drift monitor
    # must emit rows for both adjacent pairs (the round-8 review gap)
    df = spark.createDataFrame(
        [("1995-01-10", 10000.0), ("1995-01-20", 90000.0),
         ("1995-03-05", 10000.0), ("1995-03-06", 420000.0)],
        "o_orderdate string, o_totalprice double",
    ).select(
        F.to_timestamp("o_orderdate").alias("o_orderdate"), "o_totalprice"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/orders.parquet")
        rows = {
            r["month"]: r for r in q196_psi_value_drift(spark, d).collect()
        }
    assert set(rows) == {"1995-01", "1995-02"}
    assert rows["1995-01"]["n_to"] == 0  # Feb registered as empty
    assert rows["1995-02"]["n_from"] == 0
    assert rows["1995-01"]["psi"] > 0 and rows["1995-02"]["psi"] > 0
    assert PSI_BANDS == 10  # the grid contract the test above relies on
