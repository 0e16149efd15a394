"""ANN quality gates: the approximate paths (no oracle possible) must
still be structurally sound and recall-bounded against the exact query.
Seeded k-means + fixed data => the recall number is deterministic."""

from distributed_map_reduce_spark.operators.similarity import (
    ann_ivf_probe,
    q18_nearest_neighbor,
)


def test_ivf_structure_and_recall(spark, sf_dir):
    rows = ann_ivf_probe(spark, sf_dir).collect()

    by_q = {}
    for r in rows:
        by_q.setdefault(r["q"], []).append(r)
    for q, rs in by_q.items():
        assert 1 <= len(rs) <= 3
        ds = [r["d"] for r in sorted(rs, key=lambda r: r["rn"])]
        assert ds == sorted(ds), f"q={q} distances not ascending"
        assert all(r["c"] != q for r in rs)

    exact = {r["q"]: r["c"] for r in q18_nearest_neighbor(spark, sf_dir).collect()}
    top1 = {r["q"]: r["c"] for r in rows if r["rn"] == 1}
    hits = sum(1 for q, c in exact.items() if top1.get(q) == c)
    # nProbe=4 of k=16 cells: recall@1 is 11/20 on this corpus; pin a
    # floor that survives minor numeric drift.
    assert hits >= 0.5 * len(exact)
