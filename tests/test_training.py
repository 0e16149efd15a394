"""Training-data operator contracts that the gate corpus cannot pin:
q66 with digit-free source names (the NULL-keep edge) and q61's
floor-bucket overflow semantics (a document bigger than the budget).

Both run the REAL query builders against a synthesized documents
parquet + the DuckDB oracle over the same file — the same differential
the driver applies, pointed at the corpus shape that exposes the edge.
"""

import duckdb
import pandas as pd
import pytest

from distributed_map_reduce_spark.operators.training import (
    Q61_ORACLE,
    Q66_ORACLE,
    SEQ_BUDGET,
    q61_sequence_packing,
    q66_corpus_mix,
)
from distributed_map_reduce_spark.oracle import compare


def _docs_dir(tmp_path, rows):
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def _docs_con(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con


def test_q66_digit_free_source_matches_oracle(spark, tmp_path):
    """A source name with no digits makes regexp_extract return '' ->
    NULL index -> NULL threshold. Spark must agree with the oracle's
    CASE semantics (NULL keep counts as rejected, n_kept = 0), not
    return a NULL sum for the all-NULL group."""
    rows = [(i, f"text {i}", "en", "webcrawl", 10) for i in range(8)]
    rows += [(100 + i, f"more {i}", "en", "src1", 10) for i in range(8)]
    sf_dir = _docs_dir(tmp_path, rows)
    res = compare(
        "q66_digit_free",
        q66_corpus_mix(spark, sf_dir),
        _docs_con(sf_dir),
        Q66_ORACLE,
    )
    assert res.ok, res.detail
    got = {
        r["source"]: r["n_kept"]
        for r in q66_corpus_mix(spark, sf_dir).collect()
    }
    assert got["webcrawl"] == 0  # NULL threshold -> every keep False


def test_q61_oversized_doc_floor_bucket_semantics(spark, tmp_path):
    """Documented q61 contract: bucket = floor(prior / budget). After a
    document longer than the whole budget, the next document's prior
    jumps past one or more bucket indexes — a seq_id may be SKIPPED
    rather than greedily closed. Pin both the skip and oracle parity."""
    big = " ".join(f"w{i}" for i in range(SEQ_BUDGET + 100))  # 612 toks
    rows = [
        (1, "alpha bravo charlie", "en", "s0", 10),  # 3 toks, prior 0
        (2, big, "en", "s0", len(big)),  # prior 3 -> seq 0
        (3, "delta echo", "en", "s0", 10),  # prior 615 -> seq 1
        (4, "foxtrot", "en", "s0", 10),  # prior 617 -> seq 1
    ]
    sf_dir = _docs_dir(tmp_path, rows)
    res = compare(
        "q61_overflow",
        q61_sequence_packing(spark, sf_dir),
        _docs_con(sf_dir),
        Q61_ORACLE,
    )
    assert res.ok, res.detail
    got = {
        r["seq_id"]: (r["n_docs"], r["seq_tokens"])
        for r in q61_sequence_packing(spark, sf_dir).collect()
    }
    # docs 1+2 land in seq 0 (prior 0 and 3); docs 3+4 in seq 1 (615//512,
    # 617//512). No seq is skipped here because 615 < 2*512 — now force a
    # skip with a doc crossing two budgets:
    assert got == {0: (2, 3 + SEQ_BUDGET + 100), 1: (2, 3)}


def test_q61_skipped_seq_id(spark, tmp_path):
    """A document spanning >2 budgets advances the floor bucket by >1:
    the intermediate seq_id never exists (overflow-skip, not strict
    greedy). The oracle pins the same rule, so this is a contract, not
    an accident."""
    huge = " ".join(f"w{i}" for i in range(3 * SEQ_BUDGET))  # 1536 toks
    rows = [
        (1, huge, "en", "s0", len(huge)),  # prior 0 -> seq 0
        (2, "tail doc", "en", "s0", 10),  # prior 1536 -> seq 3 (skip 1,2)
    ]
    sf_dir = _docs_dir(tmp_path, rows)
    res = compare(
        "q61_skip",
        q61_sequence_packing(spark, sf_dir),
        _docs_con(sf_dir),
        Q61_ORACLE,
    )
    assert res.ok, res.detail
    seqs = sorted(
        r["seq_id"] for r in q61_sequence_packing(spark, sf_dir).collect()
    )
    assert seqs == [0, 3]  # 1 and 2 skipped by the floor-bucket rule


@pytest.mark.parametrize(
    "tolerance,err",
    [("not-a-number", ValueError), ([1], TypeError)],
)
def test_asof_numeric_tolerance_validation(spark, tolerance, err):
    """ADVICE item: a bad tolerance on a numeric as-of axis must raise at
    plan time, not silently NULL every match via implicit coercion."""
    from distributed_map_reduce_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], "k long, x long")
    right = spark.createDataFrame([(1, 9, "p")], "k long, x long, v string")
    with pytest.raises(err):
        asof_join(
            left, right, by="k", left_ts="x", right_ts="x",
            right_payload={"v": "v"}, tiebreak="v", tolerance=tolerance,
        )


def test_asof_numeric_tolerance_accepts_numeric_string(spark):
    from distributed_map_reduce_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10), (1, 50)], "k long, x long")
    right = spark.createDataFrame(
        [(1, 9, "near"), (1, 20, "far")], "k long, x long, v string"
    )
    out = {
        r["x"]: r["v"]
        for r in asof_join(
            left, right, by="k", left_ts="x", right_ts="x",
            right_payload={"v": "v"}, tiebreak="v", tolerance="5",
        ).collect()
    }
    assert out == {10: "near", 50: None}  # 50-20=30 > 5 -> nulled
