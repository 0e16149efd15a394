"""Differential-testing harness: Spark result vs DuckDB oracle.

This is the port of the reference's test methodology — run the real
engine and a sequential oracle on identical inputs and byte-compare
(/root/reference/src/main/test-mr.sh:81-111, oracle built at :81-83 by
mrsequential). Spark plays the distributed engine; DuckDB plays
mrsequential.

The comparison mirrors the driver's contract: row count, schema width,
and an order-insensitive value comparison with columns sorted by name.
Cells are canonicalized to strings (floats via repr of float64, which is
stricter than any hash the driver uses — if this passes, a value-hash
passes).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
from pyspark.sql import DataFrame, SparkSession

from .sources import TABLES


def duckdb_connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir.rstrip('/')}/{t}.parquet'"
        )
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v + 0.0 if v == 0 else v)  # -0.0 -> '0.0'
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon_cell(r[i]) for i in order) for r in rows)


def canonical_hash(df: DataFrame) -> str:
    """sha256 over the canonicalized result (SURVEY §2.4 rule: columns
    sorted by name, cells stringified, rows sorted, '|'/newline-joined) —
    the canonical hashing sink. Partition-count/order invariant by
    construction, so the same query hashes identically on local[1], a
    1000-executor cluster, or an oracle engine."""
    import hashlib

    rows = _canon_rows(list(df.columns), [tuple(r) for r in df.collect()])
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


@dataclass
class ParityResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def compare(
    name: str,
    spark_df: DataFrame,
    con: "duckdb.DuckDBPyConnection",
    oracle_sql: str,
    max_diff: int = 5,
) -> ParityResult:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    cur = con.execute(oracle_sql)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()

    if sorted(s_cols) != sorted(o_cols):
        return ParityResult(
            name, False, len(s_rows), len(o_rows),
            f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}",
        )
    if len(s_rows) != len(o_rows):
        return ParityResult(
            name, False, len(s_rows), len(o_rows),
            f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}",
        )
    sc = _canon_rows(s_cols, s_rows)
    oc = _canon_rows(o_cols, o_rows)
    if sc != oc:
        diffs = [
            f"  spark: {a!r}\n  oracle: {b!r}"
            for a, b in zip(sc, oc)
            if a != b
        ][:max_diff]
        return ParityResult(
            name, False, len(s_rows), len(o_rows),
            "value mismatch (first diffs):\n" + "\n".join(diffs),
        )
    return ParityResult(name, True, len(s_rows), len(o_rows))


def check_query(
    spark: SparkSession, sf_dir: str, name: str
) -> ParityResult:
    from .registry import all_queries

    spec = all_queries()[name]
    df = spec.build(spark, sf_dir)
    if spec.oracle is None:
        n = df.count()
        return ParityResult(name, n >= 0, n, -1, "rows-only check (no oracle)")
    con = duckdb_connect(sf_dir)
    try:
        return compare(name, df, con, spec.oracle)
    finally:
        con.close()
