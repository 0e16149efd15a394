"""Behavioral tests for the PII redaction operator (q96's engine).

The registry parity test checks the end-to-end report against DuckDB;
these tests pin the rule semantics on adversarial hand-built rows —
multiple occurrences, adjacency, rule ordering, and clean text — the
cases a per-source rollup could mask.
"""

import pytest
from pyspark.sql import functions as F

from distributed_map_reduce_spark.operators.curation import redact_pii


def _rows(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    return {
        r["id"]: r
        for r in redact_pii(df, "text").orderBy("id").collect()
    }


def test_counts_and_replacements(spark):
    rows = _rows(
        spark,
        [
            "mail a.b+c@sub.example.com and d@e.io today",
            "call 555-1234 or 555-0000 now",
            "host 10.0.0.1 peer 192.168.255.3",
            "no pii here at all",
        ],
    )
    r0 = rows[0]
    assert (r0["n_email"], r0["n_phone"], r0["n_ipv4"]) == (2, 0, 0)
    assert r0["text_redacted"] == "mail <EMAIL> and <EMAIL> today"
    r1 = rows[1]
    assert r1["n_phone"] == 2
    assert r1["text_redacted"] == "call <PHONE> or <PHONE> now"
    r2 = rows[2]
    assert r2["n_ipv4"] == 2
    assert r2["text_redacted"] == "host <IP> peer <IP>"
    r3 = rows[3]
    assert (r3["n_email"], r3["n_phone"], r3["n_ipv4"]) == (0, 0, 0)
    assert r3["text_redacted"] == r3["text"]


def test_rule_order_email_wins_over_ip(spark):
    # digits+dots inside an email's domain must be eaten by the email
    # rule (applied first), never half-redacted by the IP rule
    rows = _rows(spark, ["ping user5@10.0.0.1.example.com done"])
    r = rows[0]
    assert r["n_email"] == 1
    assert r["text_redacted"] == "ping <EMAIL> done"


def test_mixed_pii_one_row(spark):
    rows = _rows(spark, ["u@v.com 555-9999 1.2.3.4"])
    r = rows[0]
    assert (r["n_email"], r["n_phone"], r["n_ipv4"]) == (1, 1, 1)
    assert r["text_redacted"] == "<EMAIL> <PHONE> <IP>"


def test_no_exchange_in_plan(spark):
    # the scrub itself must stay row-local: no shuffle in the plan
    df = spark.range(10).withColumn("text", F.lit("a@b.co x"))
    plan = redact_pii(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_observed_filter_counts_ride_the_real_action(spark, sf_dir, tmp_path):
    """The Observation metrics must equal the true in/kept counts after
    ONE action (the write) — no second scan issued to learn them."""
    import pyspark.sql.functions as F

    from distributed_map_reduce_spark.operators.curation import (
        observed_filter,
    )
    from distributed_map_reduce_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    kept, obs = observed_filter(docs, F.col("n_chars") >= 200)
    kept.write.mode("overwrite").parquet(str(tmp_path / "kept"))

    got = obs.get
    n_total = docs.count()
    n_expected = docs.filter("n_chars >= 200").count()
    assert got["n_in"] == n_total
    assert got["n_kept"] == n_expected
    assert spark.read.parquet(str(tmp_path / "kept")).count() == n_expected
