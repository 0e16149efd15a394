"""Structural invariants of the round-9 additions (q201, q202).

The oracle parity gate pins VALUE equality against DuckDB at two
scales; these tests pin the contracts the SQL twin shares and
therefore cannot check: set-algebra consistency, exact-fallback and
estimator-error bounds for the theta set operations, and the
cross-surface agreement + Arrow-native plan shape of the applyInArrow
aggregate.
"""

import math

from distributed_map_reduce_spark.operators.events import q203_variant_json
from distributed_map_reduce_spark.operators.sketches import (
    KMV_SKETCH_K,
    q197_kmv_distinct,
    q201_theta_set_ops,
)
from distributed_map_reduce_spark.operators.udaf import (
    q70_udaf_geomean,
    q202_arrow_geomean,
    q204_sql_udf,
)


def test_theta_set_ops_exact_columns_are_set_algebra(spark, sf_dir):
    rows = q201_theta_set_ops(spark, sf_dir).collect()
    n_sources = q197_kmv_distinct(spark, sf_dir).count()
    assert len(rows) == n_sources * (n_sources - 1) // 2
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert r["n_inter_exact"] <= min(r["n_a"], r["n_b"])
        assert r["n_union_exact"] == r["n_a"] + r["n_b"] - r["n_inter_exact"]
        assert r["n_union_exact"] >= max(r["n_a"], r["n_b"])


def test_theta_set_ops_estimator_bounds(spark, sf_dir):
    """Small unions collapse to exact (the KMV sketch IS the set);
    large unions stay within 5 sigma of the (K-1)-th order-statistic
    estimator's relative error ~ 1/sqrt(K) (Beyer et al. 2007), and
    the intersection estimate can never exceed the union estimate."""
    sigma = 1.0 / math.sqrt(KMV_SKETCH_K)
    for r in q201_theta_set_ops(spark, sf_dir).collect():
        assert r["n_inter_kmv"] <= r["n_union_kmv"], r
        assert r["n_inter_kmv"] >= 0, r
        if r["n_union_exact"] <= KMV_SKETCH_K:
            assert r["n_union_kmv"] == r["n_union_exact"], r
            assert r["n_inter_kmv"] == r["n_inter_exact"], r
        else:
            rel = abs(r["n_union_kmv"] - r["n_union_exact"]) / r["n_union_exact"]
            assert rel <= 5 * sigma, r


def test_theta_set_ops_composes_with_q197(spark, sf_dir):
    """q201's per-source exact cardinalities must equal q197's — both
    ride the same _kmv_hash distinct-shingle frame (the shared-helper
    contract the self-review asked for)."""
    q197 = {
        r["source"]: r["n_exact"]
        for r in q197_kmv_distinct(spark, sf_dir).collect()
    }
    for r in q201_theta_set_ops(spark, sf_dir).collect():
        assert r["n_a"] == q197[r["src_a"]], r
        assert r["n_b"] == q197[r["src_b"]], r


def test_arrow_geomean_matches_pandas_udaf(spark, sf_dir):
    """The two custom-aggregate surfaces (grouped-agg pandas UDAF and
    applyInArrow group processor) must produce identical rows — they
    share one oracle, so a divergence would mean one surface drifted."""
    a = sorted(map(tuple, q70_udaf_geomean(spark, sf_dir).collect()))
    b = sorted(map(tuple, q202_arrow_geomean(spark, sf_dir).collect()))
    assert a == b


def test_arrow_geomean_plans_arrow_native(spark, sf_dir):
    """q202 must run through the Arrow group-map node, not the pandas
    one — the no-pandas-copy claim is the query's reason to exist."""
    plan = q202_arrow_geomean(spark, sf_dir)._jdf.queryExecution().toString()
    assert "FlatMapGroupsInArrow" in plan, plan


def test_sql_udf_inlines_into_codegen(spark, sf_dir):
    """q204's SQL UDFs must be INLINED by Catalyst — no function-call
    node, no Python eval; the physical plan carries the raw arithmetic
    inside the partial aggregate (the zero-invocation-cost claim)."""
    plan = q204_sql_udf(spark, sf_dir)._jdf.queryExecution().toString()
    physical = plan.split("== Physical Plan ==")[-1]
    assert "q204_disc_price" not in physical, physical
    assert "q204_charge" not in physical, physical
    assert "partial_sum" in physical, physical
    for node in ("BatchEvalPython", "ArrowEvalPython"):
        assert node not in physical, physical


def test_variant_json_parses_once(spark, sf_dir):
    """q203's scale claim vs q15 is parse-ONCE: the optimized plan must
    decode each props document into Variant exactly one time and probe
    it with typed variant_get — never fall back to per-call
    get_json_object string re-parsing (N extractions = N full parses)."""
    plan = (
        q203_variant_json(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # Catalyst renders parse_json as a static_invoke of
    # VariantExpressionEvalUtils.parseJson in the optimized plan.
    assert plan.count("parseJson") == 1, plan
    assert "get_json_object" not in plan, plan
    assert "variant_get" in plan, plan
