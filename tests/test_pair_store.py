"""Persisted pair-store surface (VERDICT r5 item 3).

Eight registered queries compose on the q24 near-dup pair frame. At
production scale that frame is computed ONCE per corpus snapshot and
persisted bucketed on `ad`; every consumer then reads the stored copy —
the same intermediate-reuse the reference gets from its mr-<m>-<r>
files (coordinator.go:17-24), generalized from q90's MinHash store.

Pins:
  1. the stored table round-trips the exact q24 rows;
  2. every ``pairs=`` consumer produces IDENTICAL results from the
     store and from the inline detector (oracle semantics unchanged);
  3. the stored side is shuffle-free: a per-`ad` aggregate over the
     bucketed table plans with ZERO Exchange, and a probe join against
     it shuffles only the probe side.
"""

import pyspark.sql.functions as F
import pytest

from distributed_map_reduce_spark import sinks
from distributed_map_reduce_spark.operators import dedup, graph, retrieval, training
from distributed_map_reduce_spark.operators.dedup import (
    q24_ngram_jaccard_dedup,
    read_pair_store,
    write_pair_store,
)
from distributed_map_reduce_spark.plans.inspect import formatted_plan

TABLE = "pair_store_test.neardup_pairs"


@pytest.fixture(scope="module")
def pair_table(spark, sf_dir, tmp_path_factory):
    loc = tmp_path_factory.mktemp("pair_store_wh")
    table = write_pair_store(
        spark, sf_dir, table=TABLE, location=str(loc)
    )
    yield table
    spark.sql("DROP DATABASE IF EXISTS pair_store_test CASCADE")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_store_roundtrips_q24(spark, sf_dir, pair_table):
    assert _rows(read_pair_store(spark, pair_table)) == _rows(
        q24_ngram_jaccard_dedup(spark, sf_dir)
    )


CONSUMERS = [
    ("q77", dedup.q77_source_dup_matrix),
    ("q38", graph.q38_dedup_clusters),
    ("q89", graph.q89_dedup_clusters_star),
    ("q107", graph.q107_triangle_count),
    ("q118", graph.q118_khop_reachability),
    ("q72", training.q72_canonical_pairs),
    ("q109", training.q109_split_leakage),
    ("q127", retrieval.q127_hard_negatives),
]


@pytest.mark.parametrize("name,fn", CONSUMERS, ids=[n for n, _ in CONSUMERS])
def test_consumer_store_equals_inline(spark, sf_dir, pair_table, name, fn):
    stored = read_pair_store(spark, pair_table)
    assert _rows(fn(spark, sf_dir, pairs=stored)) == _rows(fn(spark, sf_dir))


def test_amortization_inline_plans_more_exchanges_than_stored(
    spark, sf_dir, pair_table
):
    """VERDICT r10 "what's wrong" #1: the PLANS.md amortization table
    degenerated to stored-vs-stored because ``pairs=None`` auto-resolves
    to any fresh warehouse store. Pin the real contrast here: planned
    against the EXPLICIT inline detector frame, q127 must carry strictly
    more exchanges than planned against the bucketed store — the whole
    point of amortizing the pair computation across consumers. If this
    ever re-converges, the inline side is reading a store again."""
    from distributed_map_reduce_spark.plans.inspect import count_shuffles

    inline_pairs = q24_ngram_jaccard_dedup(spark, sf_dir)
    stored = read_pair_store(spark, pair_table)
    inline_ex = count_shuffles(
        retrieval.q127_hard_negatives(spark, sf_dir, pairs=inline_pairs)
    )
    stored_ex = count_shuffles(
        retrieval.q127_hard_negatives(spark, sf_dir, pairs=stored)
    )
    assert inline_ex > stored_ex, (inline_ex, stored_ex)


def test_default_resolution_prefers_fresh_store(spark, sf_dir, tmp_path_factory):
    """VERDICT r6 item 5: with the per-corpus store written, every
    ``pairs=None`` consumer must READ it (plan scans the bucketed table;
    no shingle self-join), results unchanged; and a store whose corpus
    fingerprint no longer matches the parquet on disk must be ignored
    in favor of inline recompute — never serve stale pairs."""
    import os

    from distributed_map_reduce_spark.operators.dedup import (
        default_pair_store_table,
        resolve_pairs,
    )
    from distributed_map_reduce_spark.sinks import (
        FP_SIDECAR as _FP_SIDECAR,
        table_location as _table_location,
    )

    table = default_pair_store_table(sf_dir)
    inline_rows = _rows(q24_ngram_jaccard_dedup(spark, sf_dir))
    loc = tmp_path_factory.mktemp("pair_store_default_wh")
    try:
        write_pair_store(spark, sf_dir, location=str(loc))

        resolved = resolve_pairs(spark, sf_dir, None)
        plan = formatted_plan(resolved)
        assert table.split(".", 1)[1] in plan, plan  # scans the store...
        assert "xxhash64" not in plan, plan  # ...not the shingle join
        assert _rows(resolved) == inline_rows

        # consumer end-to-end: q127 with pairs=None rides the store
        consumer_plan = formatted_plan(
            retrieval.q127_hard_negatives(spark, sf_dir)
        )
        assert table.split(".", 1)[1] in consumer_plan, consumer_plan

        # stale sidecar fingerprint => fall back to inline
        with open(
            os.path.join(_table_location(spark, table), _FP_SIDECAR), "w"
        ) as f:
            f.write("stale")
        fallback = resolve_pairs(spark, sf_dir, None)
        assert table.split(".", 1)[1] not in formatted_plan(fallback)
        assert _rows(fallback) == inline_rows
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_path_fallback_serves_fresh_store_without_catalog(spark, sf_dir):
    """Cross-session rung: the local in-memory catalog forgets
    saveAsTable metadata on JVM exit, so a LATER session must still
    find the store through its on-disk path + sidecar fingerprint
    (bucket metadata is lost, but the q24 recompute is saved). Emulated
    here by placing data + sidecar at the default path with no catalog
    entry."""
    import os
    import shutil

    from distributed_map_reduce_spark.operators.dedup import (
        _corpus_fingerprint,
        default_pair_store_table,
        resolve_pairs,
    )
    from distributed_map_reduce_spark.sinks import FP_SIDECAR as _FP_SIDECAR

    def _default_store_path(spark, sf_dir):
        return sinks.default_store_path(
            spark, default_pair_store_table(sf_dir)
        )

    assert not spark.catalog.tableExists(default_pair_store_table(sf_dir))
    path = _default_store_path(spark, sf_dir)
    inline = q24_ngram_jaccard_dedup(spark, sf_dir)
    inline_rows = _rows(inline)
    try:
        inline.write.mode("overwrite").parquet(path)
        with open(os.path.join(path, _FP_SIDECAR), "w") as f:
            f.write(_corpus_fingerprint(sf_dir))
        resolved = resolve_pairs(spark, sf_dir, None)
        assert "xxhash64" not in formatted_plan(resolved)
        assert _rows(resolved) == inline_rows
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_per_ad_aggregate_over_store_never_shuffles(spark, pair_table):
    """Bucket layout contract: groupBy on the bucket key satisfies the
    aggregate's required distribution, so the plan has NO Exchange —
    at 100 TB the pair table never re-shuffles for keeper-side rollups."""
    agg = (
        read_pair_store(spark, pair_table)
        .groupBy("ad")
        .agg(F.count(F.lit(1)).alias("n"), F.max("jacc").alias("max_jacc"))
    )
    plan = formatted_plan(agg)
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree, tree


def test_probe_join_shuffles_only_probe_side(spark, sf_dir, pair_table):
    """q90's append-only posture generalized: joining a (checkpointed)
    probe frame against the bucketed store on `ad` plans exactly ONE
    Exchange — the probe side. The stored corpus never moves."""
    orig = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        from distributed_map_reduce_spark.sources import load_table

        probe = (
            load_table(spark, sf_dir, "documents")
            .select(F.col("doc_id").alias("ad"), "source")
            .localCheckpoint()
        )
        joined = read_pair_store(spark, pair_table).join(probe, "ad")
        plan = formatted_plan(joined)
        assert "SelectedBucketsCount" in plan, plan
        tree = plan.split("\n\n")[0]
        assert tree.count("Exchange") == 1, tree
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig)


def test_write_recovers_from_orphaned_managed_location(spark, sf_dir):
    """Local-catalog amnesia, write side (round-8 regression): a fresh
    JVM's in-memory catalog forgets managed tables but their warehouse
    directories survive, and saveAsTable then fails with
    LOCATION_ALREADY_EXISTS. write_pair_store must treat such an
    orphaned managed location as the derived cache it is — clear it and
    write. Simulated by dropping the catalog entry while leaving the
    directory in place."""
    import os

    from distributed_map_reduce_spark.operators.dedup import (
        default_pair_store_table,
    )

    table = default_pair_store_table(sf_dir)
    write_pair_store(spark, sf_dir)  # ensure table + location exist
    loc = sinks.table_location(spark, table)
    assert loc and os.path.isdir(loc)
    # DROP TABLE on a managed table also deletes its directory, so
    # recreate the path by hand afterwards — exactly the on-disk state
    # a dead session leaves behind (dir present, catalog empty).
    spark.sql(f"DROP TABLE {table}")
    os.makedirs(loc, exist_ok=True)
    with open(os.path.join(loc, "stale-part"), "w") as f:
        f.write("leftover")
    write_pair_store(spark, sf_dir)  # must not raise
    assert not os.path.exists(os.path.join(loc, "stale-part"))
    assert _rows(read_pair_store(spark, table)) == _rows(
        q24_ngram_jaccard_dedup(spark, sf_dir)
    )


def test_write_recovers_orphan_under_custom_location(
    spark, sf_dir, tmp_path_factory
):
    """Same catalog-amnesia recovery, but for a database created with a
    custom LOCATION (round-8 review finding: the cleanup was gated on
    location=None, so the exact failure it fixes still reproduced when
    a caller pinned the store directory). The DESCRIBE DATABASE lookup
    resolves the custom path, so the orphaned table directory must be
    cleared and rewritten the same way."""
    import os

    loc = str(tmp_path_factory.mktemp("pair_store_custom_wh"))
    table = "pair_store_custom.neardup_pairs"
    write_pair_store(spark, sf_dir, table=table, location=loc)
    tloc = sinks.table_location(spark, table)
    assert tloc and os.path.isdir(tloc) and tloc.startswith(loc)
    spark.sql(f"DROP TABLE {table}")
    os.makedirs(tloc, exist_ok=True)
    with open(os.path.join(tloc, "stale-part"), "w") as f:
        f.write("leftover")
    try:
        write_pair_store(spark, sf_dir, table=table, location=loc)
        assert not os.path.exists(os.path.join(tloc, "stale-part"))
        assert _rows(read_pair_store(spark, table)) == _rows(
            q24_ngram_jaccard_dedup(spark, sf_dir)
        )
    finally:
        spark.sql("DROP DATABASE IF EXISTS pair_store_custom CASCADE")
