"""Watch-list probes de-risking the round-17 intake candidates.

Same discipline as the r13–r16 probe files: before a surface becomes a
registry query, pin how THIS Spark build behaves — the working form,
the trap, and the oracle-matchability evidence. Scouted 2026-08-16 on
pyspark 4.1.2 / DuckDB; nine candidates + four convention/rule-out
pins, plus a second batch (items 14-20 below the first tests: dynamic-
gap session_window, try_parse_json, date_diff units, from_utc_timestamp
replay, dayname/monthname rendering, aes-ECB posture, from_csv/sha1).

DRAIN NOTE: the round-16 continuation session landed batches one and
two (and the r15/r16 leftovers) as q237–q257 — see SURVEY §2.16. The
THIRD batch (items 21-30, appended at the end of this file) is the
live staged pool for the next intake: try_sum (with the try_avg
asymmetry trap), explicit GROUPING SETS + grouping_id, next_day/
weekday/timestampadd, arrays_zip+inline, F.product, mask(),
find_in_set, make_timestamp/try_make_timestamp, median, elt.

1.  ``try_add`` / ``try_subtract`` / ``try_multiply`` — NULL on BIGINT
    overflow (the q223/q232 error-safe family's arithmetic members);
    the DuckDB oracle shape is a HUGEINT range-check CASE.
2.  ``hex`` / ``unhex`` / ``to_binary(s, 'hex')`` / ``try_to_binary`` —
    binary codec round trip; DuckDB twins hex/from_hex; try_ form
    NULLs on non-hex input.
3.  Calendar extensions ``last_day`` / ``weekofyear`` / ``dayofyear`` /
    ``make_date`` — value-identical (INT casts on the DuckDB side).
    DAYOFWEEK TRAP: Spark counts Sunday=1..Saturday=7, DuckDB counts
    Sunday=0..Saturday=6 — the replay is dayofweek+1.
4.  Array set algebra ``array_union`` / ``array_except`` /
    ``array_intersect`` / ``arrays_overlap`` / ``array_position`` /
    ``array_remove`` / ``flatten`` — all replayable; the set-producing
    ones are registrable ONLY through array_sort on both sides (the
    q234/array_distinct order rule).
5.  ``max_by`` / ``min_by`` — value-identical on a UNIQUE-argmax
    domain; tie behavior is nondeterministic by contract in BOTH
    engines (the any_value posture: restrict the domain or don't hash).
6.  ``substring_index`` — no DuckDB twin by name; exact replay via
    string_split + list slice + array_to_string (negative counts take
    from the end — replay slices from the back).
7.  ``format_string`` == DuckDB ``printf`` — hashable rendering
    (locale-independent, unlike to_char/format_number). TRAP: a bare
    decimal literal (2.5) is DECIMAL and ``%f`` raises
    IllegalFormatConversionException — CAST AS DOUBLE first.
8.  Window ``IGNORE NULLS`` — Spark spells it AFTER the call
    (``lead(v) IGNORE NULLS OVER``), DuckDB INSIDE the parens
    (``lead(v IGNORE NULLS) OVER``); values agree. The gap-fill /
    LOCF surface (asof.py already uses the DataFrame ignorenulls form).
9.  ``left`` / ``right`` / ``space`` — identical (space replays as
    repeat(' ', n)).

Rule-outs / postures:

10. ``product()`` — NO SQL routine in this build (UNRESOLVED_ROUTINE);
    only the DataFrame ``F.product`` exists. DuckDB has product();
    registrable only via the DataFrame API on an integer-valued domain
    (fp-exact), or not at all.
11. ``url_encode`` / ``url_decode`` / ``parse_url`` — work in Spark,
    NO DuckDB twins (and Spark renders space as '+', the
    form-encoding convention) — Spark-side only.
12. ``dayofweek`` cross-engine divergence is pinned in the calendar
    probe (item 3) — never emit raw dayofweek without the +1 replay.
13. ``bin()`` — value-identical in DuckDB (free candidate rider on
    the hex sweep).
"""

import duckdb
import pytest
from pyspark.sql import functions as F


def _duck(sql):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_try_arithmetic_null_on_overflow(spark):
    got = spark.sql(
        "SELECT try_add(9223372036854775807L, 1L) a,"
        "       try_subtract(-9223372036854775807L, 2L) s,"
        "       try_multiply(9223372036854775807L, 2L) m,"
        "       try_add(1L, 2L) ok"
    ).collect()[0]
    # each CASE carries an ELSE with the actual HUGEINT result so a
    # wrong range check returns a VALUE (mismatch), not a vacuous NULL
    want = _duck(
        "SELECT CASE WHEN 9223372036854775807::HUGEINT + 1"
        "            > 9223372036854775807 THEN NULL"
        "            ELSE CAST(9223372036854775807::HUGEINT + 1"
        "                      AS BIGINT) END,"
        "       CASE WHEN -9223372036854775807::HUGEINT - 2"
        "            < -9223372036854775808 THEN NULL"
        "            ELSE CAST(-9223372036854775807::HUGEINT - 2"
        "                      AS BIGINT) END,"
        "       CASE WHEN 9223372036854775807::HUGEINT * 2"
        "            > 9223372036854775807 THEN NULL"
        "            ELSE CAST(9223372036854775807::HUGEINT * 2"
        "                      AS BIGINT) END,"
        "       CAST(3 AS BIGINT)"
    )[0]
    assert tuple(got) == want == (None, None, None, 3)
    # the ELSE rungs are live: an in-range sum takes them
    ok = _duck(
        "SELECT CASE WHEN 2::HUGEINT + 3 > 9223372036854775807 THEN NULL"
        "            ELSE CAST(2::HUGEINT + 3 AS BIGINT) END"
    )[0][0]
    assert ok == 5


def test_hex_codec_round_trip(spark):
    got = spark.sql(
        "SELECT hex('abc') h,"
        "       CAST(unhex('616263') AS STRING) u,"
        "       CAST(to_binary('616263', 'hex') AS STRING) tb,"
        "       try_to_binary('zz', 'hex') bad,"
        "       bin(10) b"
    ).collect()[0]
    want = _duck(
        "SELECT hex('abc'), CAST(from_hex('616263') AS VARCHAR),"
        "       CAST(from_hex('616263') AS VARCHAR), NULL, bin(10)"
    )[0]
    assert tuple(got) == want == ("616263", "abc", "abc", None, "1010")


def test_calendar_extensions_and_dayofweek_trap(spark):
    got = spark.sql(
        "SELECT last_day(DATE '2024-02-05') ld,"
        "       weekofyear(DATE '2024-01-04') w,"
        "       dayofyear(DATE '2024-03-01') dy,"
        "       make_date(2024, 2, 29) md,"
        "       dayofweek(DATE '2024-08-16') dw"
    ).collect()[0]
    want = _duck(
        "SELECT last_day(DATE '2024-02-05'),"
        "       CAST(weekofyear(DATE '2024-01-04') AS INT),"
        "       CAST(dayofyear(DATE '2024-03-01') AS INT),"
        "       make_date(2024, 2, 29),"
        "       CAST(dayofweek(DATE '2024-08-16') + 1 AS INT)"
    )[0]
    assert tuple(got) == want
    # the trap itself: raw dayofweek diverges (Spark Sunday=1, DuckDB 0)
    raw = _duck("SELECT dayofweek(DATE '2024-08-16')")[0][0]
    assert got.dw == raw + 1 == 6


def test_array_set_algebra_replays(spark):
    got = spark.sql(
        "SELECT array_sort(array_union(array(3,1), array(1,2))) u,"
        "       array_sort(array_except(array(3,1,2), array(2))) e,"
        "       array_sort(array_intersect(array(3,1,2), array(2,3))) i,"
        "       arrays_overlap(array(1,2), array(2,9)) o,"
        "       array_position(array(7,8,9), 8) p,"
        "       array_sort(array_remove(array(1,2,1,3), 1)) r,"
        "       flatten(array(array(1,2), array(3))) f"
    ).collect()[0]
    assert (got.u, got.e, got.i, got.o, got.p, got.r, got.f) == (
        [1, 2, 3], [1, 3], [2, 3], True, 2, [2, 3], [1, 2, 3],
    )
    # the replays run DuckDB's actual list machinery, not literals
    want = _duck(
        "SELECT list_sort(list_distinct(list_concat([3,1], [1,2]))),"
        "       list_sort(list_filter([3,1,2],"
        "                 x -> NOT list_contains([2], x))),"
        "       list_sort(list_filter([3,1,2],"
        "                 x -> list_contains([2,3], x))),"
        "       list_has_any([1,2], [2,9]),"
        "       CAST(list_position([7,8,9], 8) AS BIGINT),"
        "       list_sort(list_filter([1,2,1,3], x -> x != 1)),"
        "       flatten([[1,2], [3]])"
    )[0]
    assert (got.u, got.e, got.i, got.o, got.p, got.r, got.f) == want


def test_max_by_min_by_unique_argmax(spark):
    got = spark.sql(
        "SELECT max_by(k, v) mx, min_by(k, v) mn"
        " FROM VALUES ('a', 1), ('b', 5), ('c', 3) t(k, v)"
    ).collect()[0]
    want = _duck(
        "SELECT max_by(k, v), min_by(k, v)"
        " FROM (VALUES ('a', 1), ('b', 5), ('c', 3)) t(k, v)"
    )[0]
    assert tuple(got) == want == ("b", "a")


def test_substring_index_replay(spark):
    got = spark.sql(
        "SELECT substring_index('a.b.c', '.', 2) x,"
        "       substring_index('a.b.c', '.', -1) y"
    ).collect()[0]
    want = _duck(
        "SELECT array_to_string(string_split('a.b.c', '.')[1:2], '.'),"
        "       array_to_string(string_split('a.b.c', '.')[-1:], '.')"
    )[0]
    assert tuple(got) == want == ("a.b", "c")


def test_format_string_matches_printf_with_double_cast(spark):
    """TRAP: format_string('%.3f', 2.5) raises (DECIMAL literal is not
    a Java double) — CAST AS DOUBLE first; then it matches printf."""
    got = spark.sql(
        "SELECT format_string('%05d|%s|%.3f', 42, 'x',"
        " CAST(2.5 AS DOUBLE)) f"
    ).collect()[0].f
    want = _duck("SELECT printf('%05d|%s|%.3f', 42, 'x', 2.5)")[0][0]
    assert got == want == "00042|x|2.500"
    with pytest.raises(Exception, match="Format|format|DOUBLE|Decimal"):
        spark.sql("SELECT format_string('%.3f', 2.5)").collect()


def test_window_ignore_nulls_spellings_agree(spark):
    """Spark: lead(v) IGNORE NULLS OVER; DuckDB: lead(v IGNORE NULLS)
    OVER — different grammar positions, same values."""
    got = spark.sql(
        "SELECT x, lead(v) IGNORE NULLS OVER (ORDER BY x) nxt"
        " FROM VALUES (1, 'a'), (2, NULL), (3, 'c') t(x, v) ORDER BY x"
    ).collect()
    want = _duck(
        "SELECT x, lead(v IGNORE NULLS) OVER (ORDER BY x)"
        " FROM (VALUES (1, 'a'), (2, NULL), (3, 'c')) t(x, v) ORDER BY x"
    )
    assert [tuple(r) for r in got] == want == [
        (1, "c"), (2, "c"), (3, None),
    ]


def test_left_right_space(spark):
    got = spark.sql(
        "SELECT left('hello', 2) l, right('hello', 2) r, space(3) s"
    ).collect()[0]
    want = _duck(
        "SELECT left('hello', 2), right('hello', 2), repeat(' ', 3)"
    )[0]
    assert tuple(got) == want == ("he", "lo", "   ")


def test_product_is_dataframe_only(spark):
    """Rule-out pin: no SQL routine `product` in this build — the
    DataFrame F.product is the only spelling (and DuckDB has a native
    product() for the oracle, fp-exact on integer-valued domains)."""
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException, match="UNRESOLVED_ROUTINE"):
        spark.sql("SELECT product(x) FROM VALUES (1.0) t(x)").collect()
    got = (
        spark.sql("SELECT * FROM VALUES (2.0), (3.0), (4.0) t(x)")
        .agg(F.product("x").alias("p"))
        .collect()[0]
        .p
    )
    want = _duck(
        "SELECT product(x) FROM (VALUES (2.0::DOUBLE), (3.0), (4.0)) t(x)"
    )[0][0]
    assert got == want == 24.0


def test_url_functions_have_no_duckdb_twin(spark):
    """Rule-out: url_encode/url_decode/parse_url work Spark-side (note
    the form-encoding space -> '+') but DuckDB has no url_* scalar
    functions — Spark-internal only."""
    r = spark.sql(
        "SELECT url_encode('a b&c') e, url_decode('a%20b%26c') d,"
        "       parse_url('https://h/p?q=1', 'HOST') h"
    ).collect()[0]
    assert (r.e, r.d, r.h) == ("a+b%26c", "a b&c", "h")
    con = duckdb.connect()
    try:
        with pytest.raises(duckdb.CatalogException):
            con.execute("SELECT url_encode('x')")
    finally:
        con.close()


# --- second scouting batch (also 2026-08-16) ----------------------------------
#
# 14. DYNAMIC-GAP ``session_window(ts, CASE ...)`` — the per-key gap
#     expression form works in this build (per-class session policies:
#     bots vs humans); oracle shape is q32's islands replay with the
#     gap CASE folded into the lag comparison. The q226 extension.
# 15. ``try_parse_json`` — NULL-on-error VARIANT parse, the error-safe
#     family's VARIANT member; DuckDB twin is a json_valid CASE.
# 16. ``date_diff(UNIT, a, b)`` — value-identical to DuckDB's
#     date_diff('unit', a, b) for HOUR/DAY/MINUTE (BIGINT cast pin).
# 17. ``from_utc_timestamp(ts, tz)`` == DuckDB
#     ``CAST(timezone(tz, ts AT TIME ZONE 'UTC') AS TIMESTAMP)`` —
#     the exact replay spelling matters (two TZ hops).
# 18. ``date_format`` 'EEEE'/'MMMM' == DuckDB dayname/monthname
#     (both engines render English names under this build's default
#     locale — a locale-pinned rendering, unlike to_char's separators).
# 19. ``aes_encrypt``/``aes_decrypt`` ECB POSTURE: deterministic
#     ciphertext (stable base64) and exact round trip, but NO DuckDB
#     twin — registrable only as a Spark-side round-trip property or
#     with the plaintext hashed, never the ciphertext alone.
# 20. ``from_csv`` with an explicit schema — works (typed struct);
#     DuckDB replay is split_part + CASTs. ``sha1`` works Spark-side
#     with NO DuckDB twin (md5/sha256 are the portable pair — r15 pin).


def test_dynamic_gap_session_window(spark):
    """Per-key gap expressions: key 'a' sessions break at >10 s, key
    'b' merges across 45 s under its 100 s gap."""
    rows = spark.sql(
        "SELECT session_window(ts, CASE WHEN k = 'a' THEN '10 seconds'"
        " ELSE '100 seconds' END) w, k, COUNT(*) n"
        " FROM VALUES (TIMESTAMP '2024-01-01 00:00:00', 'a'),"
        " (TIMESTAMP '2024-01-01 00:00:15', 'a'),"
        " (TIMESTAMP '2024-01-01 00:00:15', 'b'),"
        " (TIMESTAMP '2024-01-01 00:01:00', 'b') t(ts, k)"
        " GROUP BY w, k ORDER BY k, w.start"
    ).collect()
    assert [(r.k, r.n) for r in rows] == [("a", 1), ("a", 1), ("b", 2)]


def test_try_parse_json_null_on_error(spark):
    got = spark.sql(
        "SELECT try_parse_json('{\"a\":1}') IS NULL ok_null,"
        "       try_parse_json('nope{') IS NULL bad_null"
    ).collect()[0]
    want = _duck(
        "SELECT NOT json_valid('{\"a\":1}'), NOT json_valid('nope{')"
    )[0]
    assert tuple(got) == want == (False, True)


def test_date_diff_units_match(spark):
    got = spark.sql(
        "SELECT date_diff(HOUR, TIMESTAMP '2024-01-01 00:00:00',"
        " TIMESTAMP '2024-01-02 03:30:00') h,"
        " date_diff(DAY, DATE '2024-01-01', DATE '2024-03-05') d,"
        " date_diff(MINUTE, TIMESTAMP '2024-01-01 00:00:00',"
        " TIMESTAMP '2024-01-01 01:30:30') m"
    ).collect()[0]
    want = _duck(
        "SELECT CAST(date_diff('hour', TIMESTAMP '2024-01-01 00:00:00',"
        " TIMESTAMP '2024-01-02 03:30:00') AS BIGINT),"
        " CAST(date_diff('day', DATE '2024-01-01', DATE '2024-03-05')"
        " AS BIGINT),"
        " CAST(date_diff('minute', TIMESTAMP '2024-01-01 00:00:00',"
        " TIMESTAMP '2024-01-01 01:30:30') AS BIGINT)"
    )[0]
    assert tuple(got) == want == (27, 64, 90)


def test_from_utc_timestamp_replay(spark):
    got = spark.sql(
        "SELECT from_utc_timestamp(TIMESTAMP '2024-01-01 12:00:00',"
        " 'America/New_York') t"
    ).collect()[0].t
    want = _duck(
        "SELECT CAST(timezone('America/New_York',"
        " TIMESTAMP '2024-01-01 12:00:00' AT TIME ZONE 'UTC')"
        " AS TIMESTAMP)"
    )[0][0]
    assert got == want


def test_date_format_names_match_dayname_monthname(spark):
    got = spark.sql(
        "SELECT date_format(DATE '2024-08-16', 'EEEE') dn,"
        "       date_format(DATE '2024-08-16', 'MMMM') mn"
    ).collect()[0]
    want = _duck(
        "SELECT dayname(DATE '2024-08-16'), monthname(DATE '2024-08-16')"
    )[0]
    assert tuple(got) == want == ("Friday", "August")


def test_aes_ecb_round_trip_posture(spark):
    """ECB is deterministic (same key + plaintext -> same ciphertext,
    pinned on the literal), and the decrypt round trip is exact. No
    DuckDB twin — Spark-side posture only."""
    r = spark.sql(
        "SELECT CAST(aes_decrypt(aes_encrypt('secret',"
        " '0123456789abcdef', 'ECB'), '0123456789abcdef', 'ECB')"
        " AS STRING) rt,"
        " base64(aes_encrypt('secret', '0123456789abcdef', 'ECB')) ct"
    ).collect()[0]
    assert r.rt == "secret"
    assert r.ct == "iNo+4RE7nEnpk338CYGhcw=="


def test_from_csv_and_sha1_spark_side(spark):
    r = spark.sql(
        "SELECT from_csv('7,x,2.5', 'a INT, b STRING, c DOUBLE') s,"
        "       sha1('abc') h"
    ).collect()[0]
    assert (r.s.a, r.s.b, r.s.c) == (7, "x", 2.5)
    assert r.h == "a9993e364706816aba3e25717850c26c9cd0d89d"
    # the typed-field values replay in DuckDB via split_part + CASTs
    want = _duck(
        "SELECT CAST(split_part('7,x,2.5', ',', 1) AS INT),"
        "       split_part('7,x,2.5', ',', 2),"
        "       CAST(split_part('7,x,2.5', ',', 3) AS DOUBLE)"
    )[0]
    assert (r.s.a, r.s.b, r.s.c) == want


# --- third scouting batch (2026-08-16, post-wave-4) ----------------------------
#
# The second/third/fourth round-16 waves drained the earlier batches;
# these pin the NEXT intake candidates:
#
# 21. ``try_sum`` — NULL on BIGINT sum overflow (the error-safe
#     family's aggregate member). TRY_AVG TRAP: try_avg does NOT null
#     on the same domain (it accumulates in a wider type) — pin the
#     asymmetry, register try_sum only.
# 22. explicit ``GROUPING SETS`` + ``grouping()`` / ``grouping_id()``
#     — value-identical in DuckDB INCLUDING the grouping_id bit
#     encoding (q11/q35 carry ROLLUP/CUBE; the explicit-sets form and
#     the id functions are the missing surface).
# 23. ``next_day`` (no DuckDB twin — dow-arithmetic replay),
#     ``weekday`` (Monday=0; replay (dayofweek+6)%7 — a THIRD dow
#     convention next to dayofweek's +1), ``timestampadd`` (== ts +
#     INTERVAL, exact).
# 24. ``arrays_zip`` + ``inline`` — zipped struct explosion; replay is
#     positional double-UNNEST (r16 pin 10's inline over a zip).
# 25. ``F.product`` (DataFrame-only — the SQL routine is still absent,
#     r17 pin 10) == DuckDB ``product()`` fp-exactly on small integer
#     domains.
# 26. ``mask()`` — deterministic char-class masking (upper->X,
#     lower->x, digit->n, other kept; all four chars overridable) ==
#     a chain of three regexp_replace calls in DuckDB.
# 27. ``find_in_set`` == ``coalesce(list_position(string_split(...)),
#     0)`` (0 on miss in BOTH).
# 28. ``make_timestamp`` with fractional seconds — value-identical;
#     ``try_make_timestamp`` NULLs an invalid civil date (Feb 30) —
#     the error-safe family's constructor member.
# 29. ``median`` — interpolated on even counts in BOTH engines
#     (midpoint of central pair) — unlike the q233 disc family, this
#     one needs no type pin beyond DOUBLE.
# 30. ``elt(n, ...)`` — 1-based variadic selector; replay is a CASE
#     chain (no DuckDB twin by name).


def test_try_sum_nulls_on_overflow_but_try_avg_does_not(spark):
    r = spark.sql(
        "SELECT try_sum(x) s, try_avg(x) a"
        " FROM VALUES (9223372036854775807L), (1L) t(x)"
    ).collect()[0]
    assert r.s is None  # the registrable NULL-on-overflow surface
    assert r.a is not None  # THE TRAP: avg widens internally, no NULL
    ok = spark.sql(
        "SELECT try_sum(x) s FROM VALUES (1L), (2L) t(x)"
    ).collect()[0]
    assert ok.s == 3


def test_grouping_sets_and_grouping_id_match(spark):
    q = (
        "SELECT COALESCE(k, '<all>') k2, grouping(k) g,"
        " grouping_id(k, j) gid, SUM(v) s"
        " FROM {src} t(k, j, v)"
        " GROUP BY GROUPING SETS ((k), (j), ())"
        " ORDER BY gid, k2, s"
    )
    got = [
        tuple(r)
        for r in spark.sql(
            q.format(src="VALUES ('a','x',1), ('a','y',2), ('b','x',4)")
        ).collect()
    ]
    want = _duck(
        q.format(
            src="(VALUES ('a','x',1), ('a','y',2), ('b','x',4))"
        )
    )
    assert got == want
    assert [r[2] for r in got] == [1, 1, 2, 2, 3]  # gid bit encoding


def test_next_day_weekday_timestampadd(spark):
    r = spark.sql(
        "SELECT next_day(DATE '2024-08-16', 'TU') nd,"
        "       weekday(DATE '2024-08-16') wd,"
        "       timestampadd(HOUR, 5, TIMESTAMP '2024-01-01 00:30:00') ta"
    ).collect()[0]
    # weekday is Monday=0 (a THIRD dow convention): Friday -> 4
    wd_replay, ta = _duck(
        "SELECT (dayofweek(DATE '2024-08-16') + 6) % 7,"
        "       TIMESTAMP '2024-01-01 00:30:00' + INTERVAL 5 HOUR"
    )[0]
    assert r.wd == wd_replay == 4
    assert r.ta == ta
    # next_day replay: days-ahead = ((target_dow - dow) + 6) % 7 + 1
    nd = _duck(
        "SELECT DATE '2024-08-16' + INTERVAL ("
        " ((2 - dayofweek(DATE '2024-08-16')) % 7 + 7) % 7"
        " + CASE WHEN dayofweek(DATE '2024-08-16') = 2 THEN 7 ELSE 0 END"
        ") DAY"
    )[0][0]
    assert str(r.nd) == str(nd)[:10] == "2024-08-20"


def test_arrays_zip_inline_positional_replay(spark):
    got = [
        tuple(r)
        for r in spark.sql(
            "SELECT k, v FROM (SELECT inline(arrays_zip("
            " array(1, 2), array('a', 'b'))) AS (k, v)) ORDER BY k"
        ).collect()
    ]
    want = _duck(
        "SELECT a[u.i] k, b[u.i] v FROM"
        " (SELECT [1, 2] a, ['a', 'b'] b),"
        " UNNEST(range(1, len(a) + 1)) u(i) ORDER BY k"
    )
    assert got == want == [(1, "a"), (2, "b")]


def test_product_dataframe_matches_duckdb_on_integer_domain(spark):
    from pyspark.sql import functions as F

    got = (
        spark.sql("SELECT * FROM VALUES (2.0), (3.0), (4.0) t(x)")
        .agg(F.product("x").alias("p"))
        .collect()[0]
        .p
    )
    want = _duck(
        "SELECT product(x) FROM (VALUES (2.0::DOUBLE), (3.0), (4.0)) t(x)"
    )[0][0]
    assert got == want == 24.0


def test_mask_char_classes_replay(spark):
    r = spark.sql(
        "SELECT mask('AbCD123-xyz') m,"
        "       mask('AbCD123-xyz', 'Q', 'q', 'd', '*') m2"
    ).collect()[0]
    assert (r.m, r.m2) == ("XxXXnnn-xxx", "QqQQddd*qqq")
    want = _duck(
        "SELECT regexp_replace(regexp_replace(regexp_replace("
        " 'AbCD123-xyz', '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),"
        " '[0-9]', 'n', 'g')"
    )[0][0]
    assert r.m == want


def test_find_in_set_replay(spark):
    r = spark.sql(
        "SELECT find_in_set('b', 'a,b,c') f, find_in_set('z', 'a,b,c') m"
    ).collect()[0]
    want = _duck(
        "SELECT list_position(string_split('a,b,c', ','), 'b'),"
        " coalesce(list_position(string_split('a,b,c', ','), 'z'), 0)"
    )[0]
    assert (r.f, r.m) == want == (2, 0)


def test_make_timestamp_and_try_constructor(spark):
    r = spark.sql(
        "SELECT make_timestamp(2024, 2, 29, 13, 30, 45.5) mt,"
        "       try_make_timestamp(2024, 2, 30, 0, 0, 0) bad"
    ).collect()[0]
    want = _duck("SELECT make_timestamp(2024, 2, 29, 13, 30, 45.5)")[0][0]
    assert r.mt == want
    assert r.bad is None  # invalid civil date quarantines as NULL


def test_median_interpolates_identically(spark):
    got = spark.sql(
        "SELECT median(x) m FROM VALUES (1.0), (2.0), (10.0), (11.0) t(x)"
    ).collect()[0].m
    want = _duck(
        "SELECT median(x) FROM (VALUES (1.0::DOUBLE), (2.0), (10.0),"
        " (11.0)) t(x)"
    )[0][0]
    assert got == want == 6.0  # midpoint of the central pair


def test_elt_is_case_chain(spark):
    r = spark.sql("SELECT elt(2, 'a', 'b', 'c') e").collect()[0]
    assert r.e == "b"
