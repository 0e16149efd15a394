"""Structural invariants of the round-16 second wave (q237–q244).

The oracle parity gate pins VALUE equality against DuckDB; these tests
pin the contracts the SQL twin cannot see, plus the two NEW cross-
engine traps this wave discovered while scouting (both invisible in
the r17 probe file's aligned-literal pins):

- Spark's unit ``date_diff(MINUTE|HOUR, a, b)`` returns COMPLETE
  elapsed units (floor of the difference) while DuckDB's ``date_diff``
  counts BOUNDARY CROSSINGS — on unaligned timestamps they differ by
  one, so q242's oracle replays spans as floor(epoch_us delta / unit).
- ``array_position`` over ``array_distinct`` output is ORDER-TRAPPED:
  Spark's array_distinct preserves first-seen order, DuckDB's
  list_distinct does not — q240 therefore positions into the RAW
  token array only.

Plus: q241's one-shuffle-both-directions plan shape, q244's policy
split/merge semantics on a synthetic stream, q237's rim exactness,
q238's total round trip, q239's live identity check, and q243's
fixed-width rendering contract.
"""

import re

import duckdb
import pytest


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _duck(sql):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


# --- the two wave-2 cross-engine traps, pinned live ----------------------------


def test_date_diff_unit_floor_vs_crossings_trap(spark):
    """Spark floor-counts complete units; DuckDB counts boundary
    crossings. 00:00:30 -> 00:02:29 spans 1m59s: one COMPLETE minute,
    two minute-boundary crossings. q242's oracle must therefore use the
    epoch-floor replay, never DuckDB's own date_diff."""
    got = spark.sql(
        "SELECT date_diff(MINUTE, TIMESTAMP '2024-01-01 00:00:30',"
        " TIMESTAMP '2024-01-01 00:02:29') m"
    ).collect()[0].m
    crossings = _duck(
        "SELECT date_diff('minute', TIMESTAMP '2024-01-01 00:00:30',"
        " TIMESTAMP '2024-01-01 00:02:29')"
    )[0][0]
    floor_replay = _duck(
        "SELECT CAST(floor((epoch_us(TIMESTAMP '2024-01-01 00:02:29')"
        " - epoch_us(TIMESTAMP '2024-01-01 00:00:30')) / 60000000)"
        " AS BIGINT)"
    )[0][0]
    assert got == floor_replay == 1
    assert crossings == 2  # the divergence that makes the replay necessary


def test_array_position_on_distinct_is_order_trapped(spark):
    """Spark's array_distinct preserves first-seen order; DuckDB's
    list_distinct does not (r16 probe pin 11). Positioning into the
    distinct list is therefore engine-dependent — pin the divergence
    on the probe literal and the raw-array rule q240 follows."""
    got = spark.sql(
        "SELECT array_distinct(array(1, 1, 2)) d,"
        "       array_position(array(3, 1, 2), 2) praw,"
        "       array_position(array(3, 1), 9) pmiss"
    ).collect()[0]
    assert got.d == [1, 2]  # first-seen order kept
    assert (got.praw, got.pmiss) == (3, 0)  # 1-based; 0 on miss
    duck_distinct = _duck("SELECT list_distinct([1, 1, 2])")[0][0]
    assert sorted(duck_distinct) == [1, 2]
    # DuckDB list_position here: 0 on miss, same as Spark (older DuckDB
    # releases returned NULL — q240's oracle coalesces as a version guard)
    assert _duck("SELECT list_position([3, 1], 9)")[0][0] in (0, None)
    # raw-array positions agree across engines
    assert _duck("SELECT list_position([3, 1, 2], 2)")[0][0] == 3


# --- q241: both window directions ride one shuffle -----------------------------


def test_q241_lag_and_lead_share_one_window_pass(spark, sf_dir):
    """The LOCF repair claims 'ONE shuffle serving both directions':
    lag and lead share the (user_id) partitioning and (ts, event_id)
    sort, so Spark must fuse them into a single Window node over a
    single user_id Exchange — a second Window or Exchange means the
    plan regressed to two passes."""
    from distributed_map_reduce_spark.operators.events import (
        q241_locf_gapfill,
    )

    plan = _plan(q241_locf_gapfill(spark, sf_dir))
    assert len(re.findall(r"\bWindow\b", plan)) == 1
    assert len(re.findall(r"hashpartitioning\(user_id", plan)) == 1
    assert "CartesianProduct" not in plan


# --- q244: the policy actually forks by class ----------------------------------


def test_q244_policy_splits_fast_class_merges_slow(spark):
    """15-minute spacing sits between the two policies: it must SPLIT
    an interactive (10 m gap) stream and MERGE a slow (40 m gap) one.
    And the closed-boundary rule carries over from q226: spacing of
    exactly the class gap merges."""
    rows = spark.sql(
        """
SELECT event_type, COUNT(*) AS n_sessions
FROM (
  SELECT user_id, event_type, session_window.start AS s
  FROM VALUES
    (1L, 'click',    TIMESTAMP_NTZ '2024-01-01 00:00:00'),
    (1L, 'click',    TIMESTAMP_NTZ '2024-01-01 00:15:00'),
    (1L, 'purchase', TIMESTAMP_NTZ '2024-01-01 00:00:00'),
    (1L, 'purchase', TIMESTAMP_NTZ '2024-01-01 00:15:00'),
    (2L, 'click',    TIMESTAMP_NTZ '2024-01-01 01:00:00'),
    (2L, 'click',    TIMESTAMP_NTZ '2024-01-01 01:10:00')
    t(user_id, event_type, ts)
  GROUP BY user_id, event_type,
           session_window(ts, CASE WHEN event_type IN ('click', 'view')
                                   THEN '10 minutes' ELSE '40 minutes' END)
)
GROUP BY event_type ORDER BY event_type
"""
    ).collect()
    by_type = {r.event_type: r.n_sessions for r in rows}
    # user 1 click: 15 m > 10 m gap -> split (2); purchase: 15 m < 40 m
    # -> merged (1); user 2 click: exactly 10 m -> closed bound merges.
    assert by_type == {"click": 3, "purchase": 1}


# --- q237: the overflow strata are exactly where the design says ---------------


def test_q237_rim_exactness(spark, sf_dir):
    """6 * 1537228672809129301 is the largest in-range multiple, so the
    product stratum flips exactly at l_linenumber == 7 — the NULL count
    must equal the linenumber-7 row count per returnflag. The rim
    literals themselves are pinned alongside."""
    from distributed_map_reduce_spark.operators.events import (  # noqa: F401
        load_table,
    )
    from distributed_map_reduce_spark.operators.relational import (
        Q237_RIM_WORD,
        q237_try_arithmetic_census,
    )

    r = spark.sql(
        f"SELECT try_multiply(6L, {Q237_RIM_WORD}L) ok,"
        f"       try_multiply(7L, {Q237_RIM_WORD}L) bad,"
        "       try_add(9223372036854775806L, 1L) rim,"
        "       try_add(9223372036854775807L, 1L) over"
    ).collect()[0]
    assert r.ok == 6 * Q237_RIM_WORD == 9223372036854775806
    assert r.bad is None
    assert r.rim == 9223372036854775807 and r.over is None

    got = {
        row.l_returnflag: row.n_mul_over
        for row in q237_try_arithmetic_census(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    want = {
        row.l_returnflag: row.n
        for row in li.filter("l_linenumber = 7")
        .groupBy("l_returnflag")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for flag, n_over in got.items():
        assert n_over == want.get(flag, 0)


# --- q238 / q239: the live identity checks actually hold everywhere ------------


def test_q238_roundtrip_and_corrupt_accounting(spark, sf_dir):
    """hex->unhex must be lossless on EVERY row (n_rt == n), and the
    corrupt stratum is exactly the doc_id % 9 == 0 slice."""
    from distributed_map_reduce_spark.operators.events import load_table
    from distributed_map_reduce_spark.operators.textanalysis import (
        q238_hex_codec_fingerprint,
    )

    rows = q238_hex_codec_fingerprint(spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents")
    want_corrupt = {
        r.source: r.n
        for r in docs.filter("doc_id % 9 = 0")
        .groupBy("source")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for r in rows:
        assert r.n_rt == r.n, f"{r.source}: codec round trip lost rows"
        assert r.n_corrupt == want_corrupt.get(r.source, 0)
        assert r.n_fp12 <= r.n_md5 <= r.n  # coarser fp never more distinct


def test_q239_make_date_identity_holds(spark, sf_dir):
    """make_date(year, month, day) == date must hold on every event —
    the census carries the identity as a live column; pin that it
    never silently decays into a partial count."""
    from distributed_map_reduce_spark.operators.events import (
        q239_calendar_eom_report,
    )

    rows = q239_calendar_eom_report(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_rebuilt == r.n
        assert 0 <= r.n_weekend <= r.n
        assert 1 <= r.min_week <= 53 and 1 <= r.max_doy <= 366


# --- q243: the rendering contract is fixed-width -------------------------------


def test_q243_render_shape(spark, sf_dir):
    """format_string('%s|%09d|%s') yields segment|9-digit-id|8-char
    prefix — pin the shape so a formatter change (locale, padding)
    surfaces here before it surfaces as an oracle hash diff."""
    from distributed_map_reduce_spark.operators.relational import (
        q243_string_surgery_report,
    )

    rows = q243_string_surgery_report(spark, sf_dir).collect()
    assert rows
    for r in rows:
        seg = r.c_mktsegment
        assert re.fullmatch(
            re.escape(seg) + r"\|\d{9}\|.{1,8}", r.max_render
        ), r.max_render
        assert r.n_prefix == 1  # every name shares the 'Customer' spine
        assert r.min_tail.count(" ") >= 2  # space(2) survived concat
