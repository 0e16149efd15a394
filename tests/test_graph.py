"""connected_components unit contract: chains close transitively, the
min node labels each component, separate components stay separate."""

from distributed_map_reduce_spark.operators.graph import connected_components


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
