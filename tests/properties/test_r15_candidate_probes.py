"""Watch-list probes de-risking the round-15 intake candidates.

Same discipline as the r13/r14 probe files: before a surface becomes a
registry query, pin how THIS Spark build behaves — the working form,
the trap, and the oracle-matchability evidence. Scouted 2026-08-16;
nine candidates plus two rule-outs, all verified on pyspark 4.1.2:

1.  ``levenshtein()`` — same name, same edit-distance semantics in
    DuckDB: the strongest string-similarity oracle available, and the
    missing member of the near-dup ladder (q24/q25/q26 are set-based;
    edit distance catches transposition-class near-dups sets miss).
2.  Bitwise aggregates ``bit_and``/``bit_or``/``bit_xor`` — identical
    in DuckDB; flag-mask rollups (permission audits, feature-flag
    coverage) with map-side-combinable fixed-size state.
3.  ``count_if`` / ``bool_and`` / ``bool_or`` and the ANSI
    ``FILTER (WHERE ...)`` aggregate clause — conditional-aggregation
    surfaces, all value-identical in DuckDB.
4.  ``regr_*`` regression aggregates (slope/intercept/r2/count + the
    avgx/avgy/sxx/syy/sxy moments) — same Welford-style definitions in
    DuckDB; match at 6 dp rounding (the established float discipline).
5.  ``skewness()``/``kurtosis()`` CONVENTION pin: Spark computes the
    POPULATION moments (g1 = m3/m2^1.5, excess g2 = m4/m2^2 - 3);
    DuckDB's same-named builtins apply SAMPLE corrections and do NOT
    match — an oracle must replay the population formula from raw
    central moments (q49 already carries the moment plumbing).
6.  Batch ``session_window(ts, gap)`` — the builtin twin of q32's
    manual gaps-and-islands sessionization; micro-exact vs the islands
    replay on epoch microseconds. BOUNDARY TRAP pinned: an
    exactly-gap-sized step MERGES (closed bound) — the replay breaks
    on strictly > gap.
7.  ``posexplode`` == DuckDB ``UNNEST(range(...))`` ordinality
    (0-based vs 1-based pinned).
8.  ``df.observe(Observation, ...)`` — free accumulator-side metrics
    on an unchanged result frame (the engine-surface analog of the
    reference's jobcount accumulators); the observed frame's ROWS are
    untouched, so a registered query stays oracle-hashable while the
    metrics are property-pinned. TRAP pinned: metrics accumulate per
    EXECUTION of the observed subtree — a sort above the observe adds
    a range-partitioner sampling pass that doubles every metric.
9.  ``IS DISTINCT FROM`` — null-safe comparison, value-identical in
    DuckDB (Spark's ``<=>`` spelled portably).

Rule-outs pinned as raising probes (the Avro discipline):
``UNION ALL BY NAME`` does not parse in this build's SQL (DataFrame
``unionByName`` remains the spelling), and the ANSI window frame unit
``GROUPS BETWEEN`` does not parse (ROWS/RANGE only).

Second scouting batch (also 2026-08-16):

10. ``md5()`` / ``sha2(x, 256)`` — hex-identical to DuckDB's
    md5/sha256: the content-addressed fingerprint surface (q16's
    dedup key family) is directly hashable cross-engine.
11. ``base64(encode(...))`` — round-trips and matches DuckDB's
    ``to_base64(encode(...))`` byte-for-byte.
12. ``split_part()`` incl. NEGATIVE indexes (count from the end) —
    same name, same 1-based and -1-based semantics in DuckDB.
13. ``translate()`` / ``overlay()`` — translate is value-identical in
    DuckDB; DuckDB has NO overlay(), the oracle shape is the substr
    splice.
14. ``sequence(lo, hi[, step])`` == DuckDB ``generate_series`` for
    integers (both inclusive, negative steps agree); DATE sequences
    differ in TYPE only (Spark DATE array vs DuckDB TIMESTAMP array —
    cast before hashing).
15. ``str_to_map`` — works; ``map_entries`` preserves INSERTION order
    (first-seen key order), pinned so a registered query can sort
    entries explicitly instead of relying on it.
16. ``greatest``/``least`` skip NULLs in BOTH engines (no trap —
    scouted because the ANSI default differs in other engines).
17. ``any_value()`` POSTURE pin: non-deterministic by contract (like
    bare mode()/listagg) — only registrable over a domain where the
    group has exactly one distinct value; the ignoreNulls form picks
    the first non-null.
18. ``months_between`` — Spark's fractional 31-day convention has no
    DuckDB twin (datediff('month') is integer): an oracle must replay
    the closed form, or the query sticks to whole-month boundaries.
19. ``to_char(numeric, fmt)`` RENDERING trap: the group-separator
    format renders '## ###.##' here (locale-space grouping) — never
    hash a to_char numeric rendering cross-engine.
20. ``dropDuplicatesWithinWatermark`` — the streaming dedup operator
    (the incremental sibling of q16/q90's batch dedup): works over the
    docrange source. POSTURE pinned: the kept-row SET depends on
    micro-batch boundaries and watermark progression (state expires
    when the watermark passes a kept event's time + delay), so a
    registered query is rows-only/property-checked, never
    value-hashed — EXCEPT in the delay ≥ full-event-span regime, where
    it degenerates to exactly one row per key (oracle-safe).
"""

import duckdb
import pytest
from pyspark.sql import functions as F


def _view(spark, sf_dir, table, name):
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{table}.parquet")
    df.createOrReplaceTempView(name)
    return df


def _duck(sf_dir, sql, tables=("documents",)):
    con = duckdb.connect()
    try:
        for t in tables:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{sf_dir.rstrip('/')}/{t}.parquet'"
            )
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_levenshtein_matches_duckdb(spark, sf_dir):
    """Same function name, same distance, both engines — including the
    asymmetric-length and empty-string edges."""
    _view(spark, sf_dir, "documents", "probe15_docs")
    got = spark.sql(
        "SELECT doc_id, levenshtein(source, lang) AS d,"
        "       levenshtein(substr(text, 1, 30), substr(text, 3, 30)) AS dt"
        " FROM probe15_docs ORDER BY doc_id LIMIT 50"
    ).collect()
    want = _duck(
        sf_dir,
        "SELECT doc_id, levenshtein(source, lang) AS d,"
        "       levenshtein(substr(text, 1, 30), substr(text, 3, 30)) AS dt"
        " FROM documents ORDER BY doc_id LIMIT 50",
    )
    assert [(r.doc_id, r.d, r.dt) for r in got] == want
    edge = spark.sql(
        "SELECT levenshtein('', 'abc') a, levenshtein('abc', '') b,"
        "       levenshtein('', '') c"
    ).collect()[0]
    assert (edge.a, edge.b, edge.c) == (3, 3, 0)


def test_bitwise_aggregates_match_duckdb(spark, sf_dir):
    _view(spark, sf_dir, "documents", "probe15_docs")
    got = spark.sql(
        "SELECT source, bit_and(doc_id) a, bit_or(doc_id) o,"
        "       bit_xor(doc_id) x"
        " FROM probe15_docs GROUP BY source ORDER BY source"
    ).collect()
    want = _duck(
        sf_dir,
        "SELECT source, bit_and(doc_id), bit_or(doc_id), bit_xor(doc_id)"
        " FROM documents GROUP BY source ORDER BY source",
    )
    assert [tuple(r) for r in got] == want


def test_conditional_aggregates_and_filter_clause(spark, sf_dir):
    """count_if/bool_and/bool_or and FILTER (WHERE ...) are all
    value-identical in DuckDB; FILTER composes with any aggregate."""
    _view(spark, sf_dir, "documents", "probe15_docs")
    sql = (
        "SELECT source,"
        "  count_if(n_chars > 500) AS big,"
        "  bool_and(n_chars > 0) AS all_pos,"
        "  bool_or(n_chars > 5000) AS any_huge,"
        "  COUNT(*) FILTER (WHERE lang = 'en') AS n_en,"
        "  CAST(SUM(n_chars) FILTER (WHERE doc_id % 2 = 0) AS BIGINT)"
        "    AS even_chars"
        " FROM {t} GROUP BY source ORDER BY source"
    )
    got = spark.sql(sql.format(t="probe15_docs")).collect()
    want = _duck(sf_dir, sql.format(t="documents"))
    assert [tuple(r) for r in got] == want


def test_regr_family_matches_duckdb_at_6dp(spark, sf_dir):
    """The linear-regression aggregate family agrees at the established
    6-dp rounding (slope/intercept/r2 are IEEE quotients; the counts
    are exact)."""
    _view(spark, sf_dir, "documents", "probe15_docs")
    sql = (
        "SELECT round(regr_slope(n_chars, doc_id), 6) AS s,"
        "       round(regr_intercept(n_chars, doc_id), 6) AS i,"
        "       round(regr_r2(n_chars, doc_id), 6) AS r2,"
        "       regr_count(n_chars, doc_id) AS n,"
        "       round(regr_avgx(n_chars, doc_id), 6) AS ax,"
        "       round(regr_avgy(n_chars, doc_id), 6) AS ay"
        " FROM {t}"
    )
    got = spark.sql(sql.format(t="probe15_docs")).collect()[0]
    want = _duck(sf_dir, sql.format(t="documents"))[0]
    assert tuple(got) == want


def test_skewness_kurtosis_are_population_not_duckdb_sample(spark, sf_dir):
    """CONVENTION TRAP: Spark's skewness/kurtosis are the POPULATION
    g1/g2 (kurtosis excess); DuckDB's same-named builtins are
    sample-corrected and do NOT match. An oracle must replay the
    population formula from central moments. If the builtins ever start
    matching, this probe fails and the replay note gets dropped."""
    _view(spark, sf_dir, "documents", "probe15_docs")
    got = spark.sql(
        "SELECT round(skewness(n_chars), 6) sk, round(kurtosis(n_chars), 6) ku"
        " FROM probe15_docs"
    ).collect()[0]
    replay = _duck(
        sf_dir,
        """
WITH mu AS (SELECT AVG(n_chars) m FROM documents),
mom AS (
  SELECT COUNT(*)::DOUBLE n,
         SUM(POW(n_chars - mu.m, 2)) s2,
         SUM(POW(n_chars - mu.m, 3)) s3,
         SUM(POW(n_chars - mu.m, 4)) s4
  FROM documents, mu GROUP BY ALL
)
SELECT round((s3/n) / POW(s2/n, 1.5), 6) AS sk,
       round((s4/n) / POW(s2/n, 2) - 3, 6) AS ku
FROM mom
""",
    )[0]
    assert (got.sk, got.ku) == replay, "population-moment replay broke"
    builtin = _duck(
        sf_dir,
        "SELECT round(skewness(n_chars), 6), round(kurtosis(n_chars), 6)"
        " FROM documents",
    )[0]
    assert (got.sk, got.ku) != builtin, (
        "DuckDB builtins now match Spark — drop the replay-oracle note"
    )


def test_session_window_equals_islands_replay(spark, sf_dir):
    """Batch session_window(ts, gap) == the LAG/cumulative-SUM
    gaps-and-islands replay, micro-exact on epoch microseconds (start =
    first event, end = last event + gap). session_window.start is
    TIMESTAMP_NTZ in this build — unix_micros() rejects it; the
    portable epoch extraction is timestampdiff from the NTZ epoch."""
    _view(spark, sf_dir, "events", "probe15_events")
    got = spark.sql(
        """
SELECT user_id,
       timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',
                     session_window.start) AS st,
       timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',
                     session_window.end) AS en,
       COUNT(*) AS n
FROM probe15_events GROUP BY user_id, session_window(ts, '10 minutes')
ORDER BY user_id, st
"""
    ).collect()
    want = _duck(
        sf_dir,
        """
WITH e AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL OR
                   ts - LAG(ts) OVER w > INTERVAL 10 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), i AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts) AS island
  FROM e
)
SELECT user_id, epoch_us(MIN(ts)) AS st,
       epoch_us(MAX(ts) + INTERVAL 10 MINUTE) AS en, COUNT(*) AS n
FROM i GROUP BY user_id, island ORDER BY user_id, st
""",
        tables=("events",),
    )
    assert [tuple(r) for r in got] == want


def test_session_window_boundary_is_closed(spark):
    """BOUNDARY TRAP: an event exactly GAP after the previous one
    MERGES into the session (the end bound start+gap is inclusive for
    the merge test in this build) — so the islands replay must break
    on STRICTLY > gap; a >= break would split sessions Spark keeps
    together. One microsecond past the gap starts a new session."""
    merged = spark.sql(
        """
SELECT COUNT(*) AS n FROM (
  SELECT session_window(ts, '10 minutes')
  FROM VALUES (TIMESTAMP '2024-01-01 00:00:00'),
              (TIMESTAMP '2024-01-01 00:10:00') t(ts)
  GROUP BY session_window(ts, '10 minutes')
)
"""
    ).collect()[0].n
    split = spark.sql(
        """
SELECT COUNT(*) AS n FROM (
  SELECT session_window(ts, '10 minutes')
  FROM VALUES (TIMESTAMP '2024-01-01 00:00:00'),
              (TIMESTAMP '2024-01-01 00:10:00.000001') t(ts)
  GROUP BY session_window(ts, '10 minutes')
)
"""
    ).collect()[0].n
    assert (merged, split) == (1, 2), (
        "session boundary semantics changed — re-derive the islands "
        "replay inequality"
    )


def test_posexplode_matches_unnest_ordinality(spark, sf_dir):
    """posexplode is 0-based; DuckDB range-UNNEST is 1-based — the
    replay subtracts one."""
    _view(spark, sf_dir, "documents", "probe15_docs")
    got = spark.sql(
        "SELECT doc_id, pos, tok FROM ("
        "  SELECT doc_id, split(text, ' ') st FROM probe15_docs"
        "  WHERE doc_id < 20)"
        " LATERAL VIEW posexplode(st) AS pos, tok"
        " ORDER BY doc_id, pos"
    ).collect()
    want = _duck(
        sf_dir,
        "SELECT doc_id, u.i - 1 AS pos, st[u.i] AS tok FROM ("
        "  SELECT doc_id, string_split(text, ' ') st FROM documents"
        "  WHERE doc_id < 20), UNNEST(range(1, len(st) + 1)) u(i)"
        " ORDER BY doc_id, pos",
    )
    assert [tuple(r) for r in got] == want


def test_observe_metrics_leave_rows_untouched(spark, sf_dir):
    """df.observe() delivers accumulator-side metrics (the jobcount
    shape, reference mrapps/jobcount.go) without changing the observed
    frame's rows — so a registered query could observe itself and stay
    oracle-hashable; the metrics land after ONE action with no second
    scan. EXECUTION-COUNT TRAP: the metric accumulates once per
    EXECUTION of the observed subtree — an orderBy above it adds a
    range-partitioner sampling pass that executes the subtree again and
    DOUBLES every metric, so observe() must sit above any sort (or the
    action must avoid one)."""
    from pyspark.sql import Observation

    docs = _view(spark, sf_dir, "documents", "probe15_docs")
    obs = Observation("probe15")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_chars").alias("total_chars"),
        F.count_if(F.col("n_chars") > 500).alias("n_big"),
    )
    plain = sorted(tuple(r) for r in docs.collect())
    seen = sorted(tuple(r) for r in observed.collect())
    assert plain == seen, "observe() changed the observed rows"
    metrics = obs.get
    agg = docs.agg(
        F.count(F.lit(1)), F.sum("n_chars"),
        F.count_if(F.col("n_chars") > 500),
    ).collect()[0]
    assert (metrics["n_rows"], metrics["total_chars"], metrics["n_big"]) == (
        agg[0], agg[1], agg[2],
    )


def test_is_distinct_from_matches_duckdb(spark, sf_dir):
    _view(spark, sf_dir, "documents", "probe15_docs")
    sql = (
        "SELECT COUNT(*) FILTER (WHERE nullif(lang, 'en')"
        "  IS DISTINCT FROM nullif(source, 'src0')) AS n FROM {t}"
    )
    got = spark.sql(sql.format(t="probe15_docs")).collect()[0].n
    want = _duck(sf_dir, sql.format(t="documents"))[0][0]
    assert got == want


def test_union_by_name_and_groups_frame_are_ruled_out(spark):
    """Rule-out pins: SQL-level UNION ALL BY NAME and the GROUPS window
    frame unit both fail to parse in this build. If either starts
    working on an upgrade, the probe fails and the surface joins the
    candidate list (DataFrame unionByName already covers the first
    semantically)."""
    from pyspark.errors import ParseException

    with pytest.raises(ParseException):
        spark.sql(
            "SELECT 1 AS a, 2 AS b UNION ALL BY NAME SELECT 20 AS b, 10 AS a"
        ).collect()
    with pytest.raises(ParseException):
        spark.sql(
            "SELECT SUM(x) OVER (ORDER BY x GROUPS BETWEEN 1 PRECEDING"
            " AND CURRENT ROW) FROM VALUES (1), (2) t(x)"
        ).collect()
    # the DataFrame spelling of by-name union works (and is the posture)
    a = spark.createDataFrame([(1, 2)], "a INT, b INT")
    b = spark.createDataFrame([(20, 10)], "b INT, a INT")
    rows = a.unionByName(b).collect()
    assert [tuple(r) for r in rows] == [(1, 2), (10, 20)]


def test_hash_fingerprints_match_duckdb(spark, sf_dir):
    """md5/sha2-256 hex digests are byte-identical to DuckDB's
    md5/sha256 — the content-addressed dedup-key surface (q16's family)
    is directly hashable cross-engine."""
    _view(spark, sf_dir, "documents", "probe15_docs")
    got = spark.sql(
        "SELECT doc_id, md5(text) m, sha2(text, 256) s,"
        "       base64(encode(substr(text, 1, 40), 'UTF-8')) b"
        " FROM probe15_docs ORDER BY doc_id LIMIT 50"
    ).collect()
    want = _duck(
        sf_dir,
        "SELECT doc_id, md5(text), sha256(text),"
        "       to_base64(encode(substr(text, 1, 40)))"
        " FROM documents ORDER BY doc_id LIMIT 50",
    )
    assert [(r.doc_id, r.m, r.s, r.b) for r in got] == want


def test_string_surgery_matches_duckdb(spark, sf_dir):
    """split_part (1-based AND negative indexes), translate, overlay —
    same semantics both engines."""
    _view(spark, sf_dir, "documents", "probe15_docs")
    got = spark.sql(
        "SELECT doc_id, split_part(text, ' ', 2) p2,"
        "       split_part(text, ' ', -1) plast,"
        "       translate(source, 'src', 'XYZ') tr,"
        "       overlay(source PLACING '##' FROM 2 FOR 2) ov"
        " FROM probe15_docs ORDER BY doc_id LIMIT 50"
    ).collect()
    # DuckDB has no overlay() — the oracle shape is the substr splice
    want = _duck(
        sf_dir,
        "SELECT doc_id, split_part(text, ' ', 2),"
        "       split_part(text, ' ', -1),"
        "       translate(source, 'src', 'XYZ'),"
        "       substr(source, 1, 1) || '##' || substr(source, 4)"
        " FROM documents ORDER BY doc_id LIMIT 50",
    )
    assert [tuple(r) for r in got] == want


def test_sequence_matches_generate_series_for_integers(spark, sf_dir):
    """Integer sequence() == DuckDB generate_series (both ends
    inclusive, negative steps agree). DATE sequences differ in element
    TYPE only (Spark DATE vs DuckDB TIMESTAMP) — cast before hashing."""
    got = spark.sql(
        "SELECT sequence(1, 10, 3) a, sequence(10, 1, -4) b"
    ).collect()[0]
    want = _duck(
        sf_dir,
        "SELECT generate_series(1, 10, 3), generate_series(10, 1, -4)",
    )[0]
    assert (got.a, got.b) == (want[0], want[1])
    d = spark.sql(
        "SELECT CAST(sequence(DATE '2024-01-30', DATE '2024-02-02')"
        "  AS ARRAY<STRING>) d"
    ).collect()[0].d
    dd = _duck(
        sf_dir,
        "SELECT list_transform(generate_series(DATE '2024-01-30',"
        "  DATE '2024-02-02', INTERVAL 1 DAY),"
        "  x -> strftime(x, '%Y-%m-%d'))",
    )[0][0]
    assert d == dd


def test_str_to_map_entries_keep_insertion_order(spark):
    """map_entries(str_to_map(...)) preserves first-seen key order —
    pinned so a registered query sorts entries explicitly rather than
    relying on it (map order is an implementation detail)."""
    e = spark.sql(
        "SELECT map_entries(str_to_map('b:2,a:1,c:3', ',', ':')) e"
    ).collect()[0].e
    assert [(x.key, x.value) for x in e] == [("b", "2"), ("a", "1"), ("c", "3")]


def test_greatest_least_skip_nulls_in_both_engines(spark, sf_dir):
    """No trap here (scouted because other engines differ): both Spark
    and DuckDB skip NULL arguments."""
    got = spark.sql("SELECT greatest(1, NULL, 3) g, least(1, NULL, 3) l")
    want = _duck(sf_dir, "SELECT greatest(1, NULL, 3), least(1, NULL, 3)")
    assert tuple(got.collect()[0]) == want[0]


def test_any_value_posture_single_valued_domains_only(spark, sf_dir):
    """any_value is non-deterministic by contract (bare-mode()'s rule):
    registrable only where the group is single-valued — there it MUST
    return that value; the ignoreNulls form must skip leading nulls."""
    _view(spark, sf_dir, "documents", "probe15_docs")
    rows = spark.sql(
        "SELECT source, any_value(source) av"
        " FROM probe15_docs GROUP BY source ORDER BY source"
    ).collect()
    assert all(r.av == r.source for r in rows)
    iv = spark.sql(
        "SELECT any_value(x, true) v FROM VALUES (NULL), (NULL), (7) t(x)"
    ).collect()[0].v
    assert iv == 7


def test_months_between_needs_closed_form_replay(spark, sf_dir):
    """Spark's months_between uses the fractional 31-day convention;
    DuckDB's datediff('month') is integer-only — an oracle must replay
    the closed form or stay on whole-month boundaries. Pin the exact
    convention so a future registered query can replay it: whole months
    between anchor days, else (day2 - day1)/31 fractional remainder."""
    got = spark.sql(
        "SELECT months_between(DATE '2024-03-31', DATE '2024-02-29') a,"
        "       months_between(DATE '2024-03-30', DATE '2024-02-28') b,"
        "       months_between(DATE '2024-03-15', DATE '2024-01-15') c"
    ).collect()[0]
    # last-day-to-last-day and same-day anchors are WHOLE months; the
    # 30th-vs-28th case carries the (30-28)/31 remainder
    assert got.a == 1.0
    assert got.c == 2.0
    assert abs(got.b - (1 + 2 / 31)) < 1e-8


def test_drop_duplicates_within_watermark(spark, sf_dir, tmp_path):
    """The streaming dedup operator works over the docrange source, and
    its two registrable regimes hold: (a) with delay >= the full event
    span it keeps EXACTLY one row per key (the oracle-safe degenerate
    case — state never expires mid-stream), and (b) in the general case
    every pair of kept rows sharing a key is separated by MORE than the
    delay in event time (duplicates inside the horizon are dropped;
    re-admissions only after state expiry), while the kept-row COUNT
    depends on batch boundaries — rows-only posture."""
    from distributed_map_reduce_spark.sources.pystreamsource import (
        register_docrange,
    )

    register_docrange(spark)

    def _drain(name, delay):
        src = (
            spark.readStream.format("docrange")
            .option("path", f"{sf_dir.rstrip('/')}/documents.parquet")
            .option("rowsPerBatch", "200")
            .option("progressDir", str(tmp_path / f"prog_{name}"))
            .load()
        )
        dd = (
            src.withColumn("k", F.expr("doc_id % 100"))
            .withColumn(
                "ets",
                F.expr("timestamp_micros(CAST(doc_id * 1000000 AS BIGINT))"),
            )
            .withWatermark("ets", delay)
            .dropDuplicatesWithinWatermark(["k"])
        )
        q = (
            dd.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return spark.sql(f"SELECT k, ets FROM {name}").collect()

    n_docs = spark.read.parquet(
        f"{sf_dir.rstrip('/')}/documents.parquet"
    ).count()
    # (a) delay covers the whole span: exactly one row per key
    wide = _drain("ddw_wide", f"{n_docs + 10} seconds")
    assert len(wide) == min(100, n_docs)
    assert len({r.k for r in wide}) == len(wide)
    # (b) short delay: per-key kept events are > delay apart
    short = _drain("ddw_short", "10 seconds")
    assert len(short) >= min(100, n_docs), "lost keys entirely"
    by_key = {}
    for r in short:
        by_key.setdefault(r.k, []).append(r.ets)
    for k, times in by_key.items():
        times.sort()
        for a, b in zip(times, times[1:]):
            assert (b - a).total_seconds() > 10, (
                f"key {k}: two kept rows inside the watermark delay"
            )
