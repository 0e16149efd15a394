"""connected_components unit contract: chains close transitively, the
min node labels each component, separate components stay separate; the
large-star/small-star scale path agrees with label propagation."""

import random

from distributed_map_reduce_spark.operators.graph import (
    connected_components,
    connected_components_star,
    pagerank,
)


def test_connected_components_shapes(spark):
    # chain 1-2-3-4  |  triangle 10-11-12  |  pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "s long, d long",
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, "s", "d").collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_star_cc_shapes(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "s long, d long",
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(edges, "s", "d").collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_star_cc_long_chain_converges_in_log_rounds(spark):
    # A 200-node path has diameter 199: label propagation would need ~200
    # rounds, the star algorithm O(log^2 n). max_iter=12 passes only if
    # the logarithmic convergence actually holds.
    n = 200
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "s long, d long"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(edges, "s", "d", max_iter=12).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_star_cc_matches_label_propagation_on_random_graph(spark):
    rng = random.Random(7)
    nodes = 80
    edges = [
        (rng.randrange(nodes), rng.randrange(nodes)) for _ in range(60)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "s long, d long")
    lp = {
        r["node"]: r["component"]
        for r in connected_components(df, "s", "d").collect()
    }
    star = {
        r["node"]: r["component"]
        for r in connected_components_star(df, "s", "d").collect()
    }
    assert star == lp


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_pagerank_uniform_on_cycle(spark):
    # ring: every node structurally identical -> rank exactly 1/n
    n = 6
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "s long, d long"
    )
    got = _ranks(pagerank(edges, "s", "d", iters=5))
    for v in got.values():
        assert abs(v - 1.0 / n) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_star_center_dominates_and_mass_conserved(spark):
    # leaves 1..5 all point at 0; 0 is dangling (its mass redistributes)
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)], "s long, d long"
    )
    got = _ranks(pagerank(edges, "s", "d"))
    assert abs(sum(got.values()) - 1.0) < 1e-9, "dangling mass lost"
    center, leaves = got[0], [got[i] for i in range(1, 6)]
    assert all(center > lv for lv in leaves)
    assert len({round(lv, 12) for lv in leaves}) == 1  # leaves symmetric


def test_star_cc_raises_when_not_converged(spark):
    # The star-forest extraction is only valid at the edge-set fixpoint;
    # a too-low max_iter must fail loudly, not return wrong components.
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(15)], "s long, d long"
    )
    with pytest.raises(RuntimeError, match="not a fixpoint"):
        connected_components_star(edges, "s", "d", max_iter=1)


def test_scoped_shuffle_width_sizes_and_restores(spark):
    """The iterative loops scale their shuffle width to the edge count
    and must restore the session conf on every exit path — including
    the non-convergence RuntimeError."""
    import pytest

    from distributed_map_reduce_spark.operators.graph import (
        _EDGES_PER_PARTITION,
        _scoped_shuffle_width,
    )

    key = "spark.sql.shuffle.partitions"
    orig = spark.conf.get(key)
    with _scoped_shuffle_width(spark, 10) as s:
        assert spark.conf.get(key) == "2"  # tiny graph -> floor width
    assert spark.conf.get(key) == orig
    # proportional sizing, capped at the session width
    assert _scoped_shuffle_width(spark, 5 * _EDGES_PER_PARTITION)._width == min(
        int(orig), 6
    )
    # exception path restores too (star CC raising mid-loop)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(15)], "s long, d long"
    )
    with pytest.raises(RuntimeError):
        connected_components_star(edges, "s", "d", max_iter=1)
    assert spark.conf.get(key) == orig
