"""Structural invariants of the round-16 fourth wave (q253–q257).

Pins the contracts the value oracle cannot see: q253's class-partition
arithmetic (the four null-classes tile the corpus exactly), the
regexp no-match convention divergence q254's oracle folds away, q255's
insertion-order pin (WHY outputs must go through array_sort), q256's
corrupt-stratum accounting, and q257's digit-alphabet agreement at the
radix extremes.
"""

import duckdb


def _duck(sql):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_q253_null_classes_tile_the_corpus(spark, sf_dir):
    """same + diff == n (IS DISTINCT FROM is NULL-total, unlike =),
    both-null and one-null land inside their parent classes, and the
    strata sizes match the planted mod-5/mod-7 design."""
    from distributed_map_reduce_spark.operators.events import (
        load_table,
        q253_null_safe_census,
    )

    rows = q253_null_safe_census(spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events")
    for r in rows:
        assert r.n_same + r.n_diff == r.n  # totality: no row unclassified
        assert r.n_both_null <= r.n_same
        assert r.n_one_null <= r.n_diff
    total = sum(r.n for r in rows)
    both = sum(r.n_both_null for r in rows)
    one = sum(r.n_one_null for r in rows)
    assert total == ev.count()
    assert both == ev.filter("event_id % 35 = 0").count()
    assert one == ev.filter(
        "(event_id % 5 = 0) != (event_id % 7 = 0)"
    ).count()


def test_q254_no_match_convention_divergence(spark):
    """The divergence q254's oracle folds away, pinned live: Spark
    regexp_substr misses as NULL; DuckDB regexp_extract misses as ''."""
    got = spark.sql(
        "SELECT regexp_substr('abc', '[0-9]+') m,"
        "       regexp_count('abc', '[0-9]+') c"
    ).collect()[0]
    assert got.m is None and got.c == 0
    want = _duck(
        "SELECT regexp_extract('abc', '[0-9]+'),"
        "       len(regexp_extract_all('abc', '[0-9]+'))"
    )[0]
    assert want == ("", 0)  # '' on miss — NOT NULL — hence the replay


def test_q255_map_insertion_order_is_why_outputs_sort(spark):
    """str_to_map/map_entries preserve insertion order in this build —
    pinned HERE (not relied on in q255, whose outputs all pass through
    array_sort): if a Spark upgrade changes iteration order, this test
    fails instead of a driver hash."""
    r = spark.sql(
        "SELECT map_keys(str_to_map('z:1,a:2', ',', ':')) ks,"
        "       transform(map_entries(str_to_map('z:1,a:2', ',', ':')),"
        "                 e -> e.key) ek"
    ).collect()[0]
    assert r.ks == ["z", "a"] == r.ek  # insertion order, not sorted


def test_q255_signature_is_order_free(spark, sf_dir):
    """Every group's keys_sig is the SORTED key set and every
    entries_sig round-trips to the source columns."""
    from distributed_map_reduce_spark.operators.relational import (
        q255_map_entries_report,
    )

    rows = q255_map_entries_report(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.keys_sig == "k|pr|st"  # sorted, not insertion (st first)
        assert 2 * r.n <= r.short_mass <= 3 * r.n  # k always 1-char; st too


def test_q256_corrupt_stratum_accounting(spark, sf_dir):
    """Exactly the mod-11 slice fails the JSON parse (props itself is
    valid JSON on every row — checked, not assumed), and the CSV
    round trip holds on every row."""
    from distributed_map_reduce_spark.operators.events import (
        load_table,
        q256_error_safe_parse_report,
    )

    ev = load_table(spark, sf_dir, "events")
    assert ev.filter("try_parse_json(props) IS NULL").count() == 0
    rows = q256_error_safe_parse_report(spark, sf_dir).collect()
    assert rows
    want_bad = {
        r.event_type: r.n
        for r in ev.filter("event_id % 11 = 0")
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for r in rows:
        assert r.n_bad_json == want_bad.get(r.event_type, 0)
        assert r.n_et_ok == r.n  # every CSV line re-parsed its own type


def test_q257_digit_alphabet_agreement(spark):
    """conv and to_base agree on the full hex alphabet (uppercase both
    engines) and at the radix extremes 2 and 36."""
    got = spark.sql(
        "SELECT conv('255', 10, 16) h, conv('255', 10, 2) b,"
        "       conv('1295', 10, 36) z"
    ).collect()[0]
    want = _duck(
        "SELECT to_base(255, 16), to_base(255, 2), to_base(1295, 36)"
    )[0]
    assert tuple(got) == want == ("FF", "11111111", "ZZ")
