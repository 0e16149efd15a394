"""Watch-list probes de-risking the round-14 intake candidates.

Same discipline as the r13 probe file (which de-risked q215–q219 a
round before they were registered): before a surface becomes a registry
query, pin how THIS Spark build behaves — the working form, the trap,
and the oracle-matchability evidence. Ten candidates, all verified
available in pyspark 4.1.2 here (scouted 2026-08-16):

1. Bitmap aggregates (``bitmap_construct_agg`` / ``bitmap_or_agg`` /
   ``bitmap_count``) — EXACT distinct counting as mergeable 32768-bit
   bucket bitmaps: the strongest-oracle candidate (== COUNT DISTINCT,
   value-hashable), and the 100 TB shape is the Snowflake-style
   pre-aggregated bitmap rollup (count distinct over any group slice
   without rescanning rows).
2. Datasketches THETA sketches (``theta_sketch_agg`` + union /
   intersection / ``theta_difference``) — unlike HLL, theta supports
   set INTERSECTION and DIFFERENCE (q201's KMV does this manually).
   In the sub-k exact regime the estimates are EXACT (oracle-safe);
   past it they are error-bound only, same posture as HLL.
3. TIME type (``make_time`` / ``time_trunc`` / ``current_time``) —
   conf-gated behind ``spark.sql.timeType.enabled``; DuckDB has a
   native TIME so the oracle is value-matchable.
4. ``to_xml`` — the column-level write half of q217's file round trip;
   escapes on write, ``from_xml`` unescapes back.
5. ``try_*`` error-safe family — NULL-on-error semantics
   (``try_divide``/0, ``try_sum`` overflow, ``try_to_number``
   mismatch); oracle shape: CASE WHEN guards in DuckDB.
6. ``mode()`` — tie SELECTION is arbitrary (like approx_top_k's tie
   pick), so an oracle-hashed query needs a unique-mode domain or a
   deterministic re-rank; the ``WITHIN GROUP`` spelling works here.
7. Seeded ``uniform()``/``randstr()`` — stable across identical
   replays but a function of (seed, partition, row-position): any
   repartition reshuffles the values, so the md5-as-RNG discipline
   (q62/q95) stays the registry's sampling posture; seeded builtins
   are only safe downstream of a FIXED partitioning.
8. ``regexp_extract_all`` — strong oracle (DuckDB has the same
   function, same extraction semantics).
9. ``percentile_disc(...) WITHIN GROUP`` — discrete percentile;
   DuckDB twin is ``quantile_disc``.
10. ``approx_top_k_accumulate``/``_combine``/``_estimate`` — the
    sketch-state variant of approx_top_k; BUILD QUIRK pinned below:
    ``approx_top_k_estimate(approx_top_k_accumulate(col, k), k)``
    returns an EMPTY array in this build — the working composition
    goes through ``approx_top_k_combine``.
"""

import duckdb
import pytest
from pyspark.sql import functions as F


def _docs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    df.createOrReplaceTempView("probe14_docs")
    return df


def _duck(sf_dir, sql):
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir.rstrip('/')}/documents.parquet'"
        )
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_bitmap_rollup_is_exact_and_mergeable(spark, sf_dir):
    """The bucket-bitmap recipe: per (group, bitmap_bucket_number(id))
    build a bitmap, OR-merge the buckets, sum the counts — the result
    must EQUAL count(DISTINCT id) (exact, not approximate), and the
    merge must also absorb overlapping sub-bitmaps built from
    different slices (idempotent OR — what makes the rollup a
    pre-aggregation at 100 TB)."""
    _docs(spark, sf_dir)
    # note: bitmap_or_agg(bitmap_construct_agg(...)) in ONE grouping
    # level is a NESTED_AGGREGATE_FUNCTION error — each agg needs its
    # own query block (construct per bucket, OR-merge per bucket in an
    # outer block, count-sum at the top)
    got = spark.sql(
        "SELECT source, CAST(SUM(bitmap_count(b)) AS BIGINT) AS nd FROM ("
        "  SELECT source, bitmap_bucket_number(doc_id) AS bkt,"
        "         bitmap_construct_agg(bitmap_bit_position(doc_id)) AS b"
        "  FROM probe14_docs GROUP BY source, bkt"
        ") GROUP BY source ORDER BY source"
    ).collect()
    want = _duck(
        sf_dir,
        "SELECT source, COUNT(DISTINCT doc_id) FROM documents "
        "GROUP BY source ORDER BY source",
    )
    assert [(r.source, r.nd) for r in got] == want
    # overlapping slices OR to the same bitmap: distinct over the union
    merged = spark.sql(
        "SELECT CAST(SUM(bitmap_count(b)) AS BIGINT) AS nd FROM ("
        "  SELECT bkt, bitmap_or_agg(sb) AS b FROM ("
        "    SELECT slice, bitmap_bucket_number(doc_id) AS bkt,"
        "           bitmap_construct_agg(bitmap_bit_position(doc_id)) AS sb"
        "    FROM ("
        "      SELECT 0 AS slice, doc_id FROM probe14_docs"
        "      WHERE doc_id % 3 != 2"
        "      UNION ALL"
        "      SELECT 1 AS slice, doc_id FROM probe14_docs"
        "      WHERE doc_id % 3 != 0"
        "    ) GROUP BY slice, bkt"
        "  ) GROUP BY bkt)"
    ).collect()[0].nd
    exact = _duck(sf_dir, "SELECT COUNT(DISTINCT doc_id) FROM documents")
    assert merged == exact[0][0]


def test_theta_sketch_set_ops_exact_regime(spark, sf_dir):
    """Theta sketches support the set ops HLL cannot: in the sub-k
    exact regime (corpus doc_ids ≪ the default nominal 4096 entries)
    union, intersection AND difference estimates are EXACT, so a
    registry query restricted to this regime is value-hashable; past
    the regime only an error-bound oracle is honest (the HLL rule)."""
    _docs(spark, sf_dir)
    row = spark.sql(
        "SELECT CAST(theta_sketch_estimate(theta_union(a, b)) AS BIGINT)"
        "         AS u,"
        "       CAST(theta_sketch_estimate(theta_intersection(a, b))"
        "         AS BIGINT) AS i,"
        "       CAST(theta_sketch_estimate(theta_difference(a, b))"
        "         AS BIGINT) AS d"
        " FROM (SELECT"
        "   theta_sketch_agg(CASE WHEN doc_id < 300 THEN doc_id END) AS a,"
        "   theta_sketch_agg(CASE WHEN doc_id >= 200 THEN doc_id END) AS b"
        "   FROM probe14_docs)"
    ).collect()[0]
    lo, hi, total = _duck(
        sf_dir,
        "SELECT COUNT(DISTINCT CASE WHEN doc_id < 300 THEN doc_id END),"
        "       COUNT(DISTINCT CASE WHEN doc_id >= 200 THEN doc_id END),"
        "       COUNT(DISTINCT doc_id) FROM documents",
    )[0]
    inter = lo + hi - total
    assert (row.u, row.i, row.d) == (total, inter, lo - inter)


def test_time_type_is_conf_gated_and_duckdb_matchable(spark, sf_dir):
    """TIME is OFF by default in this build (UNSUPPORTED_TIME_TYPE)
    and turns on via spark.sql.timeType.enabled; once on, make_time /
    time_trunc values match DuckDB's native TIME arithmetic — so a
    registry query must set (and restore) the conf around its plan."""
    from pyspark.errors import AnalysisException

    _docs(spark, sf_dir)
    assert spark.conf.get("spark.sql.timeType.enabled") == "false"
    with pytest.raises(AnalysisException):
        spark.sql("SELECT make_time(1, 2, 3.0)").collect()
    spark.conf.set("spark.sql.timeType.enabled", "true")
    try:
        # time_trunc('MINUTE', t) on the Spark side vs seconds-zeroed
        # make_time on the DuckDB side (DuckDB's date_trunc does not
        # bind on TIME — the oracle replays the trunc arithmetically);
        # integral seconds avoid fraction-rendering differences in the
        # string casts
        got = spark.sql(
            "SELECT CAST(time_trunc('MINUTE',"
            "  make_time(CAST(doc_id % 24 AS INT),"
            "            CAST(doc_id % 60 AS INT), 7.0)) AS STRING) AS t"
            " FROM probe14_docs ORDER BY doc_id LIMIT 5"
        ).collect()
        want = _duck(
            sf_dir,
            "SELECT CAST("
            "  make_time(CAST(doc_id % 24 AS INT),"
            "            CAST(doc_id % 60 AS INT), 0.0) AS VARCHAR)"
            " FROM documents ORDER BY doc_id LIMIT 5",
        )
        assert [r.t for r in got] == [w[0] for w in want]
    finally:
        spark.conf.set("spark.sql.timeType.enabled", "false")


def test_to_xml_from_xml_column_roundtrip(spark, sf_dir):
    """to_xml is the column-level write half (q217 pinned the FILE
    level): struct -> XML string escapes `< & "`, and from_xml
    re-extracts the original typed values for every row."""
    docs = _docs(spark, sf_dir)
    rt = docs.select(
        "doc_id",
        "source",
        F.from_xml(
            F.to_xml(
                F.struct(
                    F.col("doc_id").alias("id"),
                    F.concat(
                        F.col("source"), F.lit(' <&"> '), F.col("doc_id")
                    ).alias("probe"),
                )
            ),
            "id BIGINT, probe STRING",
        ).alias("x"),
    )
    bad = rt.filter(
        (F.col("x.id") != F.col("doc_id"))
        | (
            F.col("x.probe")
            != F.concat(F.col("source"), F.lit(' <&"> '), F.col("doc_id"))
        )
    ).count()
    assert bad == 0


def test_try_family_nulls_on_error(spark, sf_dir):
    """try_divide / try_sum / try_to_number return NULL where the
    plain forms would error or wrap — the oracle shape is a CASE WHEN
    guard, so every try_* query is value-hashable."""
    rows = spark.sql(
        "SELECT try_divide(1, 0) AS a,"
        "       try_to_number('x12', '999') AS b,"
        "       (SELECT try_sum(x) FROM VALUES (9223372036854775807), (1)"
        "        t(x)) AS c"
    ).collect()[0]
    assert rows.a is None and rows.b is None and rows.c is None
    # per-row FLOOR before the sum: summing raw double quotients is
    # order-sensitive in the last unit across engines (the established
    # integer-cents rule), floored per-row integers are exact
    _docs(spark, sf_dir)
    got = spark.sql(
        "SELECT CAST(SUM(CAST(FLOOR(try_divide(n_chars, doc_id % 5))"
        "  AS BIGINT)) AS BIGINT) AS s FROM probe14_docs"
    )
    want = _duck(
        sf_dir,
        "SELECT CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN NULL "
        "ELSE CAST(FLOOR(n_chars / (doc_id % 5)) AS BIGINT) END)"
        "  AS BIGINT) FROM documents",
    )
    assert got.collect()[0].s == want[0][0]


def test_mode_tie_selection_is_arbitrary(spark, sf_dir):
    """mode() picks ONE of the tied values arbitrarily (both the
    direct and WITHIN GROUP spellings) — an oracle-hashed registry
    query needs a unique-mode domain or a deterministic re-rank
    (count-then-row_number), never raw mode() over tie-prone data."""
    tie = spark.sql(
        "SELECT mode(x) AS m FROM VALUES ('a'), ('a'), ('b'), ('b') t(x)"
    ).collect()[0].m
    assert tie in {"a", "b"}
    unique = spark.sql(
        "SELECT mode(x) AS m, mode() WITHIN GROUP (ORDER BY x) AS mw "
        "FROM VALUES ('a'), ('a'), ('b') t(x)"
    ).collect()[0]
    assert unique.m == "a" and unique.mw == "a"


def test_seeded_uniform_replays_but_is_partition_bound(spark, sf_dir):
    """Seeded uniform() replays identically for an IDENTICAL plan, but
    the value is a function of (seed, partition, row position) — after
    a repartition the per-row values change, so seeded builtins are
    only deterministic downstream of a fixed partitioning. The
    md5-as-RNG discipline (q62/q95) remains the registry's sampling
    posture; this pin documents why."""
    a = [r.u for r in spark.sql(
        "SELECT uniform(0, 1000000, 42) AS u FROM range(0, 64, 1, 4)"
    ).collect()]
    b = [r.u for r in spark.sql(
        "SELECT uniform(0, 1000000, 42) AS u FROM range(0, 64, 1, 4)"
    ).collect()]
    assert a == b, "identical plan must replay identical values"
    c = sorted(
        r.u
        for r in spark.range(0, 64, 1, 4)
        .repartition(7)
        .selectExpr("uniform(0, 1000000, 42) AS u")
        .collect()
    )
    assert sorted(a) != c, (
        "uniform() became partitioning-independent — revisit the posture"
    )


def test_regexp_extract_all_matches_duckdb(spark, sf_dir):
    """Same function name, same semantics in DuckDB — strong oracle."""
    _docs(spark, sf_dir)
    got = spark.sql(
        r"SELECT doc_id, size(regexp_extract_all(text, '(\\w{7,})', 1))"
        "  AS n7 FROM probe14_docs ORDER BY doc_id LIMIT 50"
    ).collect()
    want = _duck(
        sf_dir,
        r"SELECT doc_id, len(regexp_extract_all(text, '(\w{7,})', 1))"
        "  AS n7 FROM documents ORDER BY doc_id LIMIT 50",
    )
    assert [(r.doc_id, r.n7) for r in got] == want


def test_percentile_disc_matches_duckdb_quantile_disc(spark, sf_dir):
    """percentile_disc returns an ACTUAL data value (vs cont's
    interpolation); DuckDB's quantile_disc is the twin. Matchable at
    several cut points per group."""
    _docs(spark, sf_dir)
    got = spark.sql(
        "SELECT source,"
        "  percentile_disc(0.25) WITHIN GROUP (ORDER BY n_chars) AS p25,"
        "  percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS p50,"
        "  percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars) AS p90 "
        "FROM probe14_docs GROUP BY source ORDER BY source"
    ).collect()
    want = _duck(
        sf_dir,
        "SELECT source, quantile_disc(n_chars, 0.25),"
        "       quantile_disc(n_chars, 0.5), quantile_disc(n_chars, 0.9)"
        " FROM documents GROUP BY source ORDER BY source",
    )
    assert [(r.source, r.p25, r.p50, r.p90) for r in got] == [
        (s, float(a), float(b), float(c)) for s, a, b, c in want
    ]


def test_approx_top_k_accumulate_needs_combine(spark, sf_dir):
    """BUILD QUIRK: estimating an UN-combined accumulate state returns
    an EMPTY array in this build; the working composition is
    accumulate -> combine -> estimate. If the direct form starts
    working on an upgrade, this probe fails and the quirk note in any
    registered query gets dropped."""
    _docs(spark, sf_dir)
    direct = spark.sql(
        "SELECT approx_top_k_estimate("
        "  approx_top_k_accumulate(source, 3), 3) AS tk FROM probe14_docs"
    ).collect()[0].tk
    assert direct == [], "direct estimate now works — drop the quirk note"
    combined = spark.sql(
        "SELECT approx_top_k_estimate(approx_top_k_combine(st), 3) AS tk"
        " FROM (SELECT doc_id % 4 AS g,"
        "              approx_top_k_accumulate(source, 3) AS st"
        "       FROM probe14_docs GROUP BY g)"
    ).collect()[0].tk
    exact = dict(
        _duck(
            sf_dir,
            "SELECT source, COUNT(*) FROM documents GROUP BY source",
        )
    )
    assert len(combined) == 3
    for item in combined:
        assert exact[item.item] == item["count"], (
            "combined counts left the exact regime"
        )
