"""ANN quality gates: the approximate paths (no oracle possible) must
still be structurally sound and recall-bounded against the exact query.
Seeded k-means + fixed data => the recall number is deterministic."""

import numpy as np

from distributed_map_reduce_spark.operators.similarity import (
    ann_ivf_probe,
    ann_lsh_bucketed,
    q18_nearest_neighbor,
)
from distributed_map_reduce_spark.sources import load_table


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


def test_lsh_candidates_have_true_distances(spark, sf_dir):
    """Every LSH candidate pair must satisfy the distance threshold with
    its TRUE L2 distance (numpy recompute) — the bucketing may miss
    pairs (approximate recall) but must never report a wrong distance
    or a pair outside the threshold."""
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    rows = ann_lsh_bucketed(spark, sf_dir).collect()
    assert rows
    for r in rows:
        true_d = float(np.linalg.norm(vecs[r["q"]] - vecs[r["c"]]))
        assert abs(round(true_d, 2) - r["dist"]) <= 0.01, (r, true_d)
        assert true_d <= 4.0 + 1e-6
        assert r["q"] != r["c"]


def test_kmeans_lloyd_improves_on_initial_assignment(spark, sf_dir):
    """Lloyd's guarantee: each (assign, update) round is monotonically
    non-increasing in total inertia. Compare the registered 2-round
    query's weighted inertia against the round-0 assignment (seeds as
    centroids) recomputed in numpy."""
    from distributed_map_reduce_spark.operators.similarity import (
        KMEANS_K,
        q110_kmeans_lloyd,
    )

    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    seeds = np.stack([np.round(vecs[i], 6) for i in range(KMEANS_K)])
    d0 = sum(
        min(float(((v - c) ** 2).sum()) for c in seeds) for v in vecs.values()
    )

    rows = q110_kmeans_lloyd(spark, sf_dir).collect()
    assert sum(r["n"] for r in rows) == len(vecs)
    assert 1 <= len(rows) <= KMEANS_K
    total = sum(r["n"] * r["inertia"] for r in rows)
    assert total <= d0 + 1e-6, (total, d0)


def test_pq_adc_structure_and_recall(spark, sf_dir):
    """PQ/ADC returns exactly top-3 per query by approximate distance;
    approximate distances must be non-negative and ascending, and
    recall@3 against the exact L2 neighbors must clear a floor (PQ with
    16 codewords/subspace is coarse — the floor pins 'useful', not
    'exact')."""
    from distributed_map_reduce_spark.operators.similarity import (
        PQ_TOPK,
        ann_pq_adc,
    )

    rows = ann_pq_adc(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q"], []).append(r)
    assert len(by_q) == 20
    for q, rs in by_q.items():
        assert len(rs) == PQ_TOPK
        ds = [r["adist"] for r in sorted(rs, key=lambda r: r["rn"])]
        assert ds == sorted(ds) and all(d >= 0 for d in ds), (q, ds)
        assert all(r["c"] != q for r in rs)

    # exact top-3 by L2 (numpy) for recall
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    hits = total = 0
    for q, rs in by_q.items():
        exact = sorted(
            ((float(((vecs[q] - v) ** 2).sum()), c) for c, v in vecs.items() if c != q)
        )[:PQ_TOPK]
        exact_ids = {c for _, c in exact}
        got = {r["c"] for r in rs}
        hits += len(exact_ids & got)
        total += PQ_TOPK
    assert hits / total >= 0.3, f"recall@3 {hits}/{total}"


def test_ivfpq_structure_and_recall(spark, sf_dir):
    """IVF-PQ returns <= top-3 per query (a query whose true neighbors
    all live outside the probed cells may return fewer candidates);
    distances ascend, and recall@3 vs exact clears the PQ floor —
    residual coding must not be WORSE than raw-vector PQ by more than
    the cell-miss rate."""
    from distributed_map_reduce_spark.operators.similarity import (
        PQ_TOPK,
        ann_ivfpq,
    )

    rows = ann_ivfpq(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q"], []).append(r)
    assert len(by_q) == 20
    for q, rs in by_q.items():
        assert 1 <= len(rs) <= PQ_TOPK
        ds = [r["adist"] for r in sorted(rs, key=lambda r: r["rn"])]
        assert ds == sorted(ds) and all(d >= 0 for d in ds), (q, ds)
        assert all(r["c"] != q for r in rs)

    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    hits = total = 0
    for q, rs in by_q.items():
        exact = sorted(
            ((float(((vecs[q] - v) ** 2).sum()), c) for c, v in vecs.items() if c != q)
        )[:PQ_TOPK]
        exact_ids = {c for _, c in exact}
        got = {r["c"] for r in rs}
        hits += len(exact_ids & got)
        total += PQ_TOPK
    assert hits / total >= 0.25, f"recall@3 {hits}/{total}"
