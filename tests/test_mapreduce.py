"""Unit tests of the map_reduce() compatibility API.

Covers the contract points the reference's harness exercises: wc and
indexer semantics (test-mr.sh:81-144), partition-count invariance
(sequential-vs-distributed differential, test-mr.sh:103), duplicate
handling in the sorted-values join (crash.go:45-55), and the text sink
format (worker.go:209, `key value` lines).
"""

import pathlib

from distributed_map_reduce_spark.operators.mapreduce import (
    indexer_map,
    indexer_reduce,
    map_reduce,
    sorted_join_reduce,
    wc_map,
    wc_reduce,
    write_mr_output,
)

DOCS = [
    ("doc-a", "the quick brown fox; the lazy dog!"),
    ("doc-b", "the dog barks 42 times"),
    ("doc-c", ""),
]


def _rows(df):
    return sorted((r["key"], r["value"]) for r in df.collect())


def test_wc_semantics(spark):
    out = _rows(map_reduce(spark, DOCS, wc_map, wc_reduce))
    assert ("the", "3") in out
    assert ("dog", "2") in out
    assert ("fox", "1") in out
    # tokenizer splits on ANY non-letter: digits are separators, never tokens
    assert not any(k == "42" for k, _ in out)
    assert all(k.isalpha() for k, _ in out)


def test_partition_count_invariance(spark):
    # nReduce is an execution knob, not a semantic (mrcoordinator.go:23
    # hardcodes 10; results must not depend on it).
    r1 = _rows(map_reduce(spark, DOCS, wc_map, wc_reduce, n_reduce=1))
    r4 = _rows(map_reduce(spark, DOCS, wc_map, wc_reduce, n_reduce=4))
    r10 = _rows(map_reduce(spark, DOCS, wc_map, wc_reduce, n_reduce=10))
    assert r1 == r4 == r10


def test_indexer_semantics(spark):
    out = dict(_rows(map_reduce(spark, DOCS, indexer_map, indexer_reduce)))
    # indexer.go:36-39 format: "<n> <doc1,doc2,...>", docs sorted
    assert out["the"] == "2 doc-a,doc-b"
    assert out["fox"] == "1 doc-a"
    # distinct per doc: 'the' appears twice in doc-a but is emitted once
    assert out["the"].startswith("2 ")


def test_sorted_join_keeps_duplicates():
    # crash.go:45-55 sorts and joins ALL values — duplicates preserved
    assert sorted_join_reduce("k", ["b", "a", "b"]) == "a b b"


def test_empty_input(spark):
    assert _rows(map_reduce(spark, [("empty", "")], wc_map, wc_reduce)) == []


def test_text_sink_format(spark, tmp_path: pathlib.Path):
    df = map_reduce(spark, DOCS, wc_map, wc_reduce, n_reduce=3)
    out_dir = str(tmp_path / "mr-out")
    write_mr_output(df, out_dir, n_reduce=3)
    lines = sorted(
        line
        for p in pathlib.Path(out_dir).glob("part-*")
        for line in p.read_text().splitlines()
    )
    assert lines == sorted(f"{k} {v}" for k, v in _rows(df))
    assert all(" " in line for line in lines)
