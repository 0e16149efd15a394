"""Structural invariants of the round-15 additions (q225–q229) plus the
SESS_CTES boundary hardening.

The oracle parity gate pins VALUE equality against DuckDB; these tests
pin the contracts the SQL twin cannot see: q225's anchor blocking has
full recall against an unblocked brute-force sweep on this corpus (and
the blocked plan contains no nested-loop join), q226's sessions tile
correctly under the CLOSED gap bound (strictly positive inter-session
gaps, minimum duration = the gap), the SESS_CTES replay now agrees with
session_window ON the exact-gap boundary (synthetic data the parquet
corpus never produces), q227's conditional aggregates are internally
consistent (FILTER == count_if == CASE-sum; NULL posture of the gated
SUM), q228's regr_ columns satisfy the regression identities
(slope == covar_pop/var_pop, r2 in [0,1], centroid == plain means), and
q229's observe() delivers exact single-execution metrics (the
range-partitioner double-count trap) while leaving rows untouched.
"""

import pytest
from pyspark.sql import functions as F


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


# --- q225: anchor-blocked levenshtein near-dup --------------------------------


def test_q225_blocking_has_full_recall_here(spark, sf_dir):
    """The anchor block is a heuristic (documented probabilistic-recall
    posture) — but on THIS corpus it must find exactly the pairs an
    unblocked length-banded brute-force sweep finds. If the generator
    ever plants near-dups whose edits straddle all three anchors, this
    fails and the anchor layout needs re-calibrating."""
    from distributed_map_reduce_spark.operators.dedup import (
        LEV_DOC_MAX,
        q225_levenshtein_neardup,
    )

    got = {
        (r.ad, r.bd, r.dist)
        for r in q225_levenshtein_neardup(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "n_chars"
    )
    a = docs.select(
        F.col("doc_id").alias("ad"),
        F.col("text").alias("ta"),
        F.col("n_chars").alias("la"),
    )
    b = docs.select(
        F.col("doc_id").alias("bd"),
        F.col("text").alias("tb"),
        F.col("n_chars").alias("lb"),
    )
    brute = {
        (r.ad, r.bd, r.dist)
        for r in (
            a.join(b, F.col("ad") < F.col("bd"))
            .filter(F.abs(F.col("la") - F.col("lb")) <= LEV_DOC_MAX)
            .select(
                "ad", "bd", F.levenshtein("ta", "tb").alias("dist")
            )
            .filter(F.col("dist") <= LEV_DOC_MAX)
        ).collect()
    }
    assert got == brute, (
        "anchor blocking missed (or fabricated) pairs vs brute force"
    )


def test_q225_plan_is_blocked_not_nested_loop(spark, sf_dir):
    """The candidate join must be an equi-join on the anchor key —
    never a nested-loop/cartesian pair scan (the brute force above is
    test-only)."""
    from distributed_map_reduce_spark.operators.dedup import (
        q225_levenshtein_neardup,
    )

    df = q225_levenshtein_neardup(spark, sf_dir)
    df.collect()
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q225_signature_drops_empty_anchors(spark, sf_dir):
    """The 100 TB skew guard, pinned on the PRODUCTION signature
    builder: a doc shorter than an anchor offset must not emit the bare
    'Ai:' key (one shared bucket holding the whole short stratum).
    Checked two ways — on a synthetic short doc where the dropped
    anchors are known exactly, and on the real corpus where the kept
    frame must contain no empty fragments while the doc's own real
    anchors all survive."""
    from distributed_map_reduce_spark.operators.dedup import (
        LEV_DOC_ANCHOR_OFFSETS,
        _q225_signature,
    )

    short = spark.createDataFrame(
        [(1, "0123456789", 10)], "doc_id LONG, text STRING, n_chars LONG"
    )
    kept = _q225_signature(short).collect()
    # a 10-char doc reaches only the first offset (1) — exactly one
    # anchor survives, and it carries the real fragment
    assert [r.anchor for r in kept] == ["A1:0123456789"]

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "n_chars"
    )
    sig = _q225_signature(docs)
    assert sig.filter(F.length("anchor") <= 3).count() == 0
    # every doc emits exactly one anchor per offset it reaches
    n_expected = docs.select(
        F.sum(
            sum(
                (F.col("n_chars") >= off).cast("int")
                for off in LEV_DOC_ANCHOR_OFFSETS
            )
        )
    ).collect()[0][0]
    assert sig.count() == n_expected


# --- q226: micro-sessions under the closed gap bound ---------------------------


def test_q226_sessions_tile_with_strict_gaps(spark, sf_dir):
    """Per user, sessions must be disjoint, ordered, last at least the
    gap (end = last event + gap >= start + gap), and separated by
    STRICTLY positive time: next_start - prev_end > 0 is exactly
    'inter-session inactivity strictly exceeds the gap' under the
    closed-bound merge rule — a >= separation would indicate the open
    bound this build does not implement."""
    from distributed_map_reduce_spark.operators.events import (
        MICRO_SESSION_GAP_MINUTES,
        q226_micro_sessions,
    )

    gap_us = MICRO_SESSION_GAP_MINUTES * 60 * 1_000_000
    rows = q226_micro_sessions(spark, sf_dir).collect()
    assert rows, "no sessions produced"
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, sess in by_user.items():
        sess.sort(key=lambda r: r.session_start_us)
        for r in sess:
            assert r.n_events >= 1
            assert r.session_end_us - r.session_start_us >= gap_us
        for prev, nxt in zip(sess, sess[1:]):
            assert nxt.session_start_us > prev.session_end_us, (
                f"user {user}: sessions overlap or touch — "
                "closed-bound merge should have fused them"
            )


def test_q226_fragments_strictly_finer_than_q32(spark, sf_dir):
    """A 10-minute gap can only split what a 6-hour gap keeps together:
    the micro-session count must be >= q32's session count, and total
    event mass must be identical (sessionization is a partition of the
    stream)."""
    from distributed_map_reduce_spark.operators.events import (
        q226_micro_sessions,
        user_sessions_frame,
    )

    micro = q226_micro_sessions(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    ).collect()[0]
    coarse = user_sessions_frame(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    ).collect()[0]
    assert micro.n_sessions >= coarse.n_sessions
    assert micro.n_events == coarse.n_events


def test_sess_replay_agrees_on_exact_gap_boundary(spark):
    """SESS_CTES hardening (r15): on an exact-gap step, session_window
    MERGES (closed bound) and the islands replay with the strict >
    break agrees — while the old >= break would have split. Synthetic
    data only: the parquet corpus never produces an exact 6 h gap,
    which is why every pre-r15 green stood on the buggy replay."""
    n_sw = spark.sql(
        """
SELECT COUNT(*) AS n FROM (
  SELECT session_window(ts, '6 hours')
  FROM VALUES (TIMESTAMP '2024-01-01 00:00:00'),
              (TIMESTAMP '2024-01-01 06:00:00') t(ts)
  GROUP BY session_window(ts, '6 hours'))
"""
    ).collect()[0].n
    n_strict = spark.sql(
        """
SELECT COUNT(DISTINCT island) AS n FROM (
  SELECT SUM(brk) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) AS island
  FROM (
    SELECT ts, CASE WHEN LAG(ts) OVER (ORDER BY ts) IS NULL
                    OR ts - LAG(ts) OVER (ORDER BY ts) > INTERVAL 6 HOUR
               THEN 1 ELSE 0 END AS brk
    FROM VALUES (TIMESTAMP '2024-01-01 00:00:00'),
                (TIMESTAMP '2024-01-01 06:00:00') t(ts)))
"""
    ).collect()[0].n
    n_old = spark.sql(
        """
SELECT COUNT(DISTINCT island) AS n FROM (
  SELECT SUM(brk) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) AS island
  FROM (
    SELECT ts, CASE WHEN LAG(ts) OVER (ORDER BY ts) IS NULL
                    OR ts - LAG(ts) OVER (ORDER BY ts) >= INTERVAL 6 HOUR
               THEN 1 ELSE 0 END AS brk
    FROM VALUES (TIMESTAMP '2024-01-01 00:00:00'),
                (TIMESTAMP '2024-01-01 06:00:00') t(ts)))
"""
    ).collect()[0].n
    assert (n_sw, n_strict, n_old) == (1, 1, 2), (
        "closed-bound agreement broke — re-derive the replay inequality"
    )


# --- q227: conditional-aggregate internal consistency -------------------------


def test_q227_conditionals_are_internally_consistent(spark, sf_dir):
    from distributed_map_reduce_spark.operators.relational import (
        q227_conditional_report,
    )

    rows = q227_conditional_report(spark, sf_dir).collect()
    assert rows
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    case_sum = {
        r.o_orderpriority: (r.nb, r.no)
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.sum(
                F.when(F.col("o_totalprice") > 150000, 1).otherwise(0)
            ).alias("nb"),
            F.sum(
                F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)
            ).alias("no"),
        )
        .collect()
    }
    for r in rows:
        nb, no = case_sum[r.o_orderpriority]
        assert r.n_big == nb, "count_if != CASE-sum"
        assert r.n_open == no, "COUNT FILTER != CASE-sum"
        assert r.n_big <= r.n and r.n_open <= r.n
        assert r.all_pos is True  # every o_totalprice > 0 in TPC-H data
        # NULL posture: the gated SUM is NULL exactly when no row
        # qualifies, which bool_or witnesses
        assert (r.f_cents is None) == (r.any_f is False)


# --- q228: regression identities ----------------------------------------------


def test_q228_regr_identities(spark, sf_dir):
    from distributed_map_reduce_spark.operators.profile import (
        q228_regr_drift,
    )

    rows = q228_regr_drift(spark, sf_dir).collect()
    assert rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ident = {
        r.source: r
        for r in docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.covar_pop("n_chars", "doc_id")
                / F.var_pop("doc_id"),
                6,
            ).alias("slope2"),
            F.round(F.avg("doc_id"), 6).alias("ax"),
            F.round(F.avg("n_chars"), 6).alias("ay"),
        )
        .collect()
    }
    for r in rows:
        i = ident[r.source]
        assert r.n_pairs == i.n, "regr_count != row count (no nulls here)"
        assert r.avg_doc_id == i.ax and r.avg_chars == i.ay
        assert abs(r.slope - i.slope2) < 1e-5, (
            "slope != covar_pop/var_pop replay"
        )
        assert 0.0 <= r.r2 <= 1.0


# --- q230: persisted distinct-rollup store -------------------------------------


def test_q230_store_round_trip_and_freshness(spark, sf_dir):
    """The stored rollup must answer EXACTLY what the inline q220 path
    answers (the materialize-once contract), the write must be
    idempotent (a fresh store is reused, not rewritten), and a
    fingerprint mismatch must disqualify the store (stale stores fall
    back to inline recompute, never serve stale counts)."""
    from distributed_map_reduce_spark.operators.sketches import (
        q220_bitmap_distinct_rollup,
        q230_stored_distinct_rollup,
    )
    from distributed_map_reduce_spark.sinks import (
        dataset_fingerprint,
        default_distinct_rollup_table,
        stored_table_if_fresh,
    )

    stored_rows = [
        tuple(r) for r in q230_stored_distinct_rollup(spark, sf_dir).collect()
    ]
    inline_rows = [
        tuple(r) for r in q220_bitmap_distinct_rollup(spark, sf_dir).collect()
    ]
    assert stored_rows == inline_rows
    table = default_distinct_rollup_table(sf_dir)
    fp = dataset_fingerprint(sf_dir, "lineitem")
    assert stored_table_if_fresh(spark, table, fp) is not None
    assert stored_table_if_fresh(spark, table, fp + ":stale") is None


def test_q230_stored_or_merge_is_shuffle_free(spark, sf_dir):
    """The q90 stored-side pin, rollup edition: the store is bucketed on
    ``bkt``, so the OR-merge group-by reads pre-partitioned buckets
    with ZERO Exchange — the reason a dashboard query over the store
    touches kilobytes and shuffles nothing at 100 TB."""
    from distributed_map_reduce_spark.plans.inspect import formatted_plan
    from distributed_map_reduce_spark.sinks import write_distinct_rollup

    table = write_distinct_rollup(spark, sf_dir)
    merged = (
        spark.table(table)
        .groupBy("bkt")
        .agg(F.expr("bitmap_or_agg(b)").alias("mb"))
    )
    plan = formatted_plan(merged)
    assert "SelectedBucketsCount" in plan, plan  # bucketed read used
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 0, tree


# --- q229: observe() metrics --------------------------------------------------


def test_q229_observe_exact_single_execution_metrics(spark, sf_dir):
    """The jobcount contract: after ONE action, the metrics equal the
    ground truth EXACTLY — not doubled (the range-partitioner
    sampling trap: observe sits above the orderBy, so the sort's
    sampling pass never re-executes the observed subtree) — and the
    observed frame's rows match the unobserved report."""
    from distributed_map_reduce_spark.operators.mapreduce import (
        observed_source_report,
    )

    observed, obs = observed_source_report(spark, sf_dir)
    rows = observed.collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    truth = docs.agg(
        F.countDistinct("source").alias("g"),
        F.count(F.lit(1)).alias("d"),
        F.sum("n_chars").alias("c"),
    ).collect()[0]
    m = obs.get
    assert m["n_groups"] == truth.g, "metric doubled or lost"
    assert m["docs_consumed"] == truth.d
    assert m["chars_consumed"] == truth.c
    plain = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    ).orderBy("source").collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in plain], (
        "observe() changed the report rows"
    )
