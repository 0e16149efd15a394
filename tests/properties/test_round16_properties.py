"""Structural invariants of the round-16 additions (q231–q236).

The oracle parity gate pins VALUE equality against DuckDB; these tests
pin the contracts the SQL twin cannot see: q235's count-filter blocking
finds pairs whose edits straddle ALL of q225's anchors (the recall
guarantee q225 cannot make — an anchor-evading synthetic corpus), and
its verified plan broadcasts the text lookups with no nested-loop join;
q236's degenerate-regime invariants (exactly one KEY-DERIVED row per
key, cross-batch state exercised) plus the initial-watermark trap (a
row landing exactly on the epoch-0 initial watermark is dropped late —
the reason q236's event times ride a day-one base); q231's word-algebra
consistency; q232's corrupt-stratum accounting against a batch replay;
q233's discreteness (every percentile is an exhibitable element); and
q234's internal quantifier consistency.
"""

import pytest
from pyspark.sql import functions as F


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


# --- q235: sound-and-complete q-gram twin --------------------------------------


def test_q235_equals_q225_on_corpus(spark, sf_dir):
    """The driver hashes q235 against q225's anchor-replay oracle; that
    is only honest while the two detectors agree on the corpus. Pin the
    agreement directly so a corpus regeneration that plants an
    anchor-evading pair fails HERE with a readable diff."""
    from distributed_map_reduce_spark.operators.dedup import (
        q225_levenshtein_neardup,
        q235_levenshtein_complete,
    )

    anchor = {
        (r.ad, r.bd, r.dist)
        for r in q225_levenshtein_neardup(spark, sf_dir).collect()
    }
    complete = {
        (r.ad, r.bd, r.dist)
        for r in q235_levenshtein_complete(spark, sf_dir).collect()
    }
    assert complete >= anchor, "complete blocking lost an anchor pair"
    assert complete == anchor, (
        "corpus now plants anchor-evading near-dups: q235 found "
        f"{sorted(complete - anchor)[:5]} — q235's oracle must switch "
        "to a complete replay"
    )


def test_q235_finds_anchor_evading_pair(spark):
    """The guarantee itself, on a corpus built to defeat q225: a pair
    whose three edits land INSIDE each of the three anchor windows
    (offsets 1/33/65, width 24) shares no anchor, so the anchor block
    misses it — the count-filter block must still emit it with the
    right distance."""
    from distributed_map_reduce_spark.operators.dedup import (
        _q225_signature,
        qgram_complete_pairs_frame,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "sleeps on the warm windowsill and birds sing in the garden "
        "under a bright morning sun near the old stone wall"
    )
    # edits at 1-based positions 5, 40, 70: one inside each anchor
    # window [1,24], [33,56], [65,88]
    mutated = list(base)
    for pos in (5, 40, 70):
        mutated[pos - 1] = "Z"
    docs = spark.createDataFrame(
        [
            (0, base, len(base)),
            (1, "".join(mutated), len(base)),
            # distant background doc: must NOT pair with either
            (2, "completely unrelated text " * 8, 26 * 8),
        ],
        "doc_id long, text string, n_chars long",
    )
    # anchor blocking shares no key for (0, 1)
    sig = _q225_signature(docs)
    a = sig.select(F.col("doc_id").alias("ad"), "anchor")
    b = sig.select(F.col("doc_id").alias("bd"), "anchor")
    anchor_cand = {
        (r.ad, r.bd)
        for r in a.join(b, "anchor")
        .filter(F.col("ad") < F.col("bd"))
        .select("ad", "bd")
        .distinct()
        .collect()
    }
    assert (0, 1) not in anchor_cand, (
        "synthetic corpus no longer evades the anchors — move the edits"
    )
    got = {
        (r.ad, r.bd, r.dist)
        for r in qgram_complete_pairs_frame(
            docs.select("doc_id", "text")
        ).collect()
    }
    assert got == {(0, 1, 3)}


def test_q235_plan_broadcasts_verify_and_has_no_nested_loop(spark, sf_dir):
    """Scale-shape pins: the text lookup joins broadcast the doc table
    (candidates outnumber docs — ship texts, not candidates), and
    nothing in the plan degenerates to a cartesian/nested-loop join."""
    from distributed_map_reduce_spark.operators.dedup import (
        q235_levenshtein_complete,
    )

    plan = _plan(q235_levenshtein_complete(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_q235_short_string_band_fallback(spark):
    """Docs below the count-filter guarantee threshold pair through the
    length-band elements: two 20-char strings at distance 2 (< k) have
    gram multisets far smaller than k*q, yet must still be found."""
    from distributed_map_reduce_spark.operators.dedup import (
        qgram_complete_pairs_frame,
    )

    docs = spark.createDataFrame(
        [(0, "abcdefghijklmnopqrst"), (1, "abXdefghijklmnopqrsY")],
        "doc_id long, text string",
    )
    got = {
        (r.ad, r.bd, r.dist)
        for r in qgram_complete_pairs_frame(docs).collect()
    }
    assert got == {(0, 1, 2)}


# --- q236: watermark dedup twin -------------------------------------------------


def test_q236_one_key_derived_row_per_key(spark, sf_dir):
    """Degenerate-regime invariants of the REGISTERED query: exactly one
    row per distinct key, and every column re-derivable from the key
    (the determinism that makes the hash safe under any intra-batch
    duplicate race)."""
    from distributed_map_reduce_spark.streaming.documents_stream import (
        Q236_KEY_MOD,
        Q236_TS_BASE,
        q236_watermark_dedup_twin,
    )

    df = q236_watermark_dedup_twin(spark, sf_dir)
    # key-derivation checked Spark-side in epoch micros: collect()
    # renders timestamps in the HOST timezone, which would skew a
    # driver-side datetime subtraction on any non-UTC machine
    rows = df.select(
        "k",
        F.expr(
            f"unix_micros(ets) = ({Q236_TS_BASE} + k) * 1000000"
        ).alias("derived"),
    ).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == min(Q236_KEY_MOD, n_docs)
    assert len({r.k for r in rows}) == len(rows)
    for r in rows:
        assert 0 <= r.k < Q236_KEY_MOD
        assert r.derived, "output column not key-derived"


def test_initial_watermark_drops_epoch_zero_row(spark, sf_dir, tmp_path):
    """The trap q236's day-one base exists for: a streaming query's
    INITIAL watermark is epoch 0, and dropDuplicatesWithinWatermark
    drops a row whose event time lands exactly ON the watermark as
    late — with a base-0 event-time domain the k=0 key vanishes
    (observed at q236 registration). If a Spark upgrade changes the
    initial-watermark or lateness bound semantics, this pin fails and
    q236's base comment needs revisiting."""
    from distributed_map_reduce_spark.sources.pystreamsource import (
        register_docrange,
    )

    register_docrange(spark)
    src = (
        spark.readStream.format("docrange")
        .option("path", f"{sf_dir.rstrip('/')}/documents.parquet")
        .option("progressDir", str(tmp_path / "prog"))
        .load()
    )
    dd = (
        src.select((F.col("doc_id") % 50).alias("k"))
        .withColumn(
            "ets", F.expr("timestamp_micros(CAST(k * 1000000 AS BIGINT))")
        )
        .withWatermark("ets", "3600 seconds")
        .dropDuplicatesWithinWatermark(["k"])
    )
    q = (
        dd.writeStream.format("memory")
        .queryName("ddw_epoch0")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    kept = {r.k for r in spark.sql("SELECT k FROM ddw_epoch0").collect()}
    assert 0 not in kept, (
        "epoch-0 row survived the initial watermark — the day-one base "
        "in q236 is no longer load-bearing"
    )
    assert kept == set(range(1, 50))


# --- q231: bitmask word algebra -------------------------------------------------


def test_q231_word_algebra(spark, sf_dir):
    """AND-word is a subset of the OR-word, parity is a subset of the
    OR-word, the coverage count popcounts the OR-word, and the global
    OR over classes covers every per-class OR."""
    from distributed_map_reduce_spark.operators.sketches import (
        q231_bitmask_rollup,
    )

    rows = q231_bitmask_rollup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.flags_all & r.flags_any == r.flags_all
        assert r.flags_parity & r.flags_any == r.flags_parity
        assert bin(r.flags_any).count("1") == r.n_flags_seen
        assert 0 <= r.flags_any < 16  # four defined flag bits


# --- q232: corrupt-stratum accounting -------------------------------------------


def test_q232_bad_count_matches_batch_replay(spark, sf_dir):
    """n_bad is exactly the every-13th corrupt stratum, and first/last
    parsed timestamps equal the batch min/max over the clean rows
    (second-truncated)."""
    from distributed_map_reduce_spark.operators.events import (
        q232_try_timestamp_census,
    )

    got = {r.event_type: r for r in
           q232_try_timestamp_census(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.expr("CASE WHEN event_id % 13 = 0 THEN 1 ELSE 0 END")
            ).alias("n_bad"),
            F.min(F.expr("CASE WHEN event_id % 13 != 0 "
                         "THEN date_trunc('second', ts) END"))
            .alias("first_ok"),
            F.max(F.expr("CASE WHEN event_id % 13 != 0 "
                         "THEN date_trunc('second', ts) END"))
            .alias("last_ok"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for t, g in got.items():
        w = want[t]
        assert (g.n, g.n_bad, g.first_ok, g.last_ok) == (
            w.n, w.n_bad, w.first_ok, w.last_ok,
        )


# --- q233: discreteness ----------------------------------------------------------


def test_q233_percentiles_are_actual_elements(spark, sf_dir):
    from distributed_map_reduce_spark.operators.relational import (
        q233_percentile_disc_report,
    )

    rows = q233_percentile_disc_report(spark, sf_dir).collect()
    prices = {
        round(r.o_totalprice, 2)
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_totalprice")
        .collect()
    }
    for r in rows:
        for c in ("p25", "p50", "p90"):
            assert r[c] in prices, f"{c} not an exhibitable order price"
        assert r.p25 <= r.p50 <= r.p90


# --- q234: quantifier consistency -------------------------------------------------


def test_q234_internal_consistency(spark, sf_dir):
    """forall/exists agree with the filter counts, head3 leads with the
    token count, and the vocab serialization is sorted ascending."""
    from distributed_map_reduce_spark.operators.relational import (
        q234_array_surgery,
    )

    rows = q234_array_surgery(spark, sf_dir).collect()
    assert rows
    for r in rows[:100]:
        head = [int(x) for x in r.head3.split(",")]
        n_tokens = head[0]
        assert r.n_big <= n_tokens
        assert r.n_multi <= n_tokens
        vocab = [int(x) for x in r.vocab.split(",")] if r.vocab else []
        assert vocab == sorted(vocab)
        assert r.has_long == any(v >= 12 for v in vocab)
        assert r.all_short == all(v < 40 for v in vocab)
        # the 3 smallest lengths ride sorted behind the count
        assert head[1:] == sorted(head[1:])
