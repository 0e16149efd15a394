"""The custom Python DataSource (format 'mrtext') — reference text I/O
contract as a pluggable Spark format.

Covers: per-file partition planning, whole-file reads, glob filtering,
SQL usability, writer part-file output (mr-out format), and equality
with the RDD-based whole-file reader the map_reduce() API uses.
"""

import os

import pytest
from pyspark.sql import functions as F

from distributed_map_reduce_spark.sources.binaryfile import (
    read_whole_text_files,
)
from distributed_map_reduce_spark.sources.pydatasource import register_mrtext


@pytest.fixture()
def text_dir(tmp_path):
    d = tmp_path / "books"
    d.mkdir()
    (d / "a.txt").write_text("the quick brown fox\n")
    (d / "b.txt").write_text("jumps over the lazy dog\n")
    (d / "c.log").write_text("not a book\n")
    return str(d)


def test_read_whole_files(spark, text_dir):
    register_mrtext(spark)
    df = spark.read.format("mrtext").load(text_dir)
    rows = {os.path.basename(r["path"]): r["text"] for r in df.collect()}
    assert rows == {
        "a.txt": "the quick brown fox\n",
        "b.txt": "jumps over the lazy dog\n",
        "c.log": "not a book\n",
    }


def test_one_partition_per_file(spark, text_dir):
    register_mrtext(spark)
    df = spark.read.format("mrtext").load(text_dir)
    assert df.rdd.getNumPartitions() == 3


def test_glob_filter(spark, text_dir):
    register_mrtext(spark)
    df = (
        spark.read.format("mrtext")
        .option("pathGlobFilter", "*.txt")
        .load(text_dir)
    )
    assert df.count() == 2


def test_matches_rdd_whole_text_reader(spark, text_dir):
    register_mrtext(spark)
    via_ds = {
        (os.path.basename(r["path"]), r["text"])
        for r in spark.read.format("mrtext")
        .option("pathGlobFilter", "*.txt")
        .load(text_dir)
        .collect()
    }
    via_rdd = {
        (os.path.basename(p), t)
        for p, t in read_whole_text_files(spark, text_dir, "*.txt").collect()
    }
    assert via_ds == via_rdd


def test_wordcount_over_mrtext(spark, text_dir):
    register_mrtext(spark)
    df = (
        spark.read.format("mrtext")
        .option("pathGlobFilter", "*.txt")
        .load(text_dir)
    )
    counts = {
        r["w"]: r["n"]
        for r in df.select(
            F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert counts["the"] == 2
    assert counts["fox"] == 1


def test_writer_emits_mr_out_part_files(spark, text_dir, tmp_path):
    register_mrtext(spark)
    out = str(tmp_path / "out")
    df = spark.createDataFrame(
        [("apple", 3), ("pear", 1)], "key string, n int"
    ).repartition(2)
    df.write.format("mrtext").mode("append").save(out)
    parts = sorted(os.listdir(out))
    assert all(p.startswith("mr-out-") for p in parts)
    lines = sorted(
        line
        for p in parts
        for line in open(os.path.join(out, p)).read().splitlines()
    )
    assert lines == ["apple 3", "pear 1"]


def test_writer_rejects_wrong_width(spark, tmp_path):
    register_mrtext(spark)
    df = spark.createDataFrame([(1, 2, 3)], "a int, b int, c int")
    with pytest.raises(Exception, match="two columns"):
        df.write.format("mrtext").mode("append").save(str(tmp_path / "x"))
