"""Structural invariants of the round-16 third wave (q245–q252).

Headline pin: the base64 MIME-CHUNKING trap found while scouting —
Spark's ``base64`` inserts CRLF every 76 output chars (payloads over
57 bytes), DuckDB's ``to_base64`` never does; the r15 probe's short
literals could not see it. Plus the contracts the value oracle cannot
express: q247's generator-not-join plan shape, q248's injective
ordering value (the tie-discipline argmax rests on), q249's live field
-order signature, q250's checksum accounting against an independent
Python replay, q251's reshape arithmetic, and q252's planted-stratum
accounting.
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


# --- the base64 MIME-chunk trap, pinned live -----------------------------------


def test_base64_mime_chunking_trap(spark):
    """57 payload bytes encode to exactly 76 chars — the last unchunked
    width. 58 bytes force Spark's MIME line break; DuckDB never chunks.
    The portable rendering strips CRLF and both engines then agree."""
    r = spark.sql(
        "SELECT base64(encode(repeat('a', 57), 'UTF-8')) AS ok,"
        "       base64(encode(repeat('a', 58), 'UTF-8')) AS chunked,"
        "       replace(base64(encode(repeat('a', 58), 'UTF-8')),"
        "               '\r\n', '') AS norm"
    ).collect()[0]
    assert "\r\n" not in r.ok and len(r.ok) == 76
    assert "\r\n" in r.chunked  # the trap
    d57, d58 = _duck(
        "SELECT to_base64(encode(repeat('a', 57))),"
        "       to_base64(encode(repeat('a', 58)))"
    )[0]
    assert "\r" not in d58 and "\n" not in d58  # DuckDB never chunks
    assert r.ok == d57 and r.norm == d58  # normalized rendering agrees


def test_q245_roundtrip_and_chunk_accounting(spark, sf_dir):
    """The round trip must hold on EVERY row, and n_chunked must equal
    the over-57-byte stratum computed independently Spark-side."""
    from distributed_map_reduce_spark.operators.events import load_table
    from distributed_map_reduce_spark.operators.textanalysis import (
        q245_content_address_report,
    )

    rows = q245_content_address_report(spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents")
    want = {
        r.source: r.n
        for r in docs.filter("octet_length(text) > 57")
        .groupBy("source")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for r in rows:
        assert r.n_rt == r.n, f"{r.source}: base64 round trip lost rows"
        assert r.n_chunked == want.get(r.source, 0)
        assert len(r.min_sha) == 64  # sha-256 hex width


# --- q247: a generator, not a join ---------------------------------------------


def test_q247_expansion_is_generator_not_join(spark, sf_dir):
    """The fan-out must stream through a Generate node inside the scan
    stage — a numbers-table join (BroadcastNestedLoop / Cartesian)
    would be the 100x-at-scale mistake the docstring forbids."""
    from distributed_map_reduce_spark.operators.relational import (
        q247_sequence_expansion,
    )

    plan = _plan(q247_sequence_expansion(spark, sf_dir))
    assert "Generate" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert len(re.findall(r"\bJoin\b", plan)) == 0


def test_q247_fanout_arithmetic(spark, sf_dir):
    """Each order key k yields 1 + k % 5 rows with val 1..n and pos
    0..n-1 — so per status, val_mass - pos_mass == n_rows exactly."""
    from distributed_map_reduce_spark.operators.relational import (
        q247_sequence_expansion,
    )

    rows = q247_sequence_expansion(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.val_mass - r.pos_mass == r.n_rows


# --- q248: the injectivity the tie discipline rests on -------------------------


def test_q248_ordering_value_is_injective(spark, sf_dir):
    """max_by/min_by are nondeterministic on ties BY CONTRACT; q248 is
    registrable only because cents*1e7+orderkey is injective. Check it
    on the corpus, not by argument."""
    from distributed_map_reduce_spark.operators.events import load_table
    from distributed_map_reduce_spark.operators.relational import (
        Q248_UNIQ_EXPR,
    )

    orders = load_table(spark, sf_dir, "orders")
    n, nd = orders.selectExpr(
        "COUNT(*) AS n",
        f"COUNT(DISTINCT {Q248_UNIQ_EXPR}) AS nd",
    ).collect()[0]
    assert n == nd


def test_q248_extremes_agree_with_sorted_frame(spark, sf_dir):
    """top/bottom keys and the runner-up value re-derived by a plain
    sort must match the window/argmax path."""
    from distributed_map_reduce_spark.operators.events import load_table
    from distributed_map_reduce_spark.operators.relational import (
        q248_ranked_extremes,
    )

    from distributed_map_reduce_spark.operators.relational import (
        Q248_UNIQ_EXPR,
    )

    got = {r.pri: r for r in q248_ranked_extremes(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderpriority AS pri",
        "o_orderkey",
        f"{Q248_UNIQ_EXPR} AS uniq_v",
    )
    for pri, r in got.items():
        vals = sorted(
            (row.uniq_v, row.o_orderkey)
            for row in orders.filter(orders.pri == pri).collect()
        )
        assert r.bottom_key == vals[0][1]
        assert r.top_key == vals[-1][1]
        assert r.second_v == vals[1][0]


# --- q249: the field-order signature is live -----------------------------------


def test_q249_keys_signature_is_insertion_order(spark, sf_dir):
    """json_object_keys must return ('id', 'st') — document insertion
    order — on every group; alphabetical ('id','st' happens to be
    sorted, so ALSO pin the engine behavior on a reversed literal)."""
    from distributed_map_reduce_spark.operators.relational import (
        q249_json_shape_report,
    )

    rows = q249_json_shape_report(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.keys_sig == "id|st"
        assert r.n_obj == r.n  # orderkey makes every rendering distinct
    got = spark.sql(
        "SELECT json_object_keys(to_json(named_struct('z', 1, 'a', 2))) k"
    ).collect()[0].k
    assert got == ["z", "a"]  # insertion order, not sorted


# --- q250: checksum accounting vs an independent replay ------------------------


def _luhn_ok(pan: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(pan), start=1):
        d = int(ch)
        if i % 2 == 0:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def test_q250_matches_python_luhn(spark, sf_dir):
    """The DuckDB oracle replays luhn in SQL; replay it a THIRD way in
    plain Python so a shared SQL-side misreading can't self-confirm."""
    from distributed_map_reduce_spark.operators.events import load_table
    from distributed_map_reduce_spark.operators.relational import (
        q250_luhn_audit,
    )

    from distributed_map_reduce_spark.operators.relational import (
        q250_pan_expr,
    )

    got = {r.seg: r for r in q250_luhn_audit(spark, sf_dir).collect()}
    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "c_mktsegment AS seg",
        f"{q250_pan_expr('STRING')} AS pan",
    ).collect()
    from collections import defaultdict

    want_n = defaultdict(int)
    want_valid = defaultdict(int)
    for row in cust:
        want_n[row.seg] += 1
        want_valid[row.seg] += _luhn_ok(row.pan)
    for seg, r in got.items():
        assert r.n == want_n[seg]
        assert r.n_valid == want_valid[seg]
    # both strata present corpus-wide (a single tiny segment can land
    # all-invalid at sf0.001 — the ~10% rate is per-corpus, not per-group)
    total_valid = sum(r.n_valid for r in got.values())
    total = sum(r.n for r in got.values())
    assert 0 < total_valid < total
    # the classic test vectors, through the registered surface's fn
    v = spark.sql(
        "SELECT luhn_check('79927398713') a, luhn_check('79927398714') b"
    ).collect()[0]
    assert (v.a, v.b) == (True, False)
    assert _luhn_ok("79927398713") and not _luhn_ok("79927398714")


# --- q251: reshape arithmetic ---------------------------------------------------


def test_q251_unpivot_shape(spark, sf_dir):
    """3 metrics x |flags| rows, every (flag, metric) exactly once, and
    the values re-derivable from the wide aggregate."""
    from distributed_map_reduce_spark.operators.relational import (
        q251_stack_unpivot,
    )

    rows = q251_stack_unpivot(spark, sf_dir).collect()
    flags = {r.flag for r in rows}
    assert len(rows) == 3 * len(flags)
    seen = {(r.flag, r.metric) for r in rows}
    assert seen == {
        (f, m) for f in flags for m in ("qty", "n_items", "n_parts")
    }
    by = {(r.flag, r.metric): r.value for r in rows}
    for f in flags:
        assert by[(f, "n_parts")] <= by[(f, "n_items")]
        assert by[(f, "qty")] >= by[(f, "n_items")]  # qty >= 1 per line


# --- q252: the planted stratum is exactly where it was planted -----------------


def test_q252_multibyte_stratum_accounting(spark, sf_dir):
    """bytes > chars exactly on the doc_id % 7 == 0 slice (the corpus
    itself is ASCII — driver-checked here rather than assumed), and
    bits == 8 * bytes identically."""
    from distributed_map_reduce_spark.operators.events import load_table
    from distributed_map_reduce_spark.operators.textanalysis import (
        q252_utf8_budget_census,
    )

    rows = q252_utf8_budget_census(spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents")
    # precondition: the raw corpus is single-byte (else the stratum
    # accounting below would still hold only by accident)
    assert docs.filter("octet_length(text) > length(text)").count() == 0
    want = {
        r.source: r.n
        for r in docs.filter("doc_id % 7 = 0")
        .groupBy("source")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for r in rows:
        assert r.n_multibyte == want.get(r.source, 0)
        assert r.bits_mass == 8 * r.bytes_mass
        # 'é—' adds 2 chars and 5 bytes per planted doc
        assert r.bytes_mass - r.chars_mass == 3 * r.n_multibyte
