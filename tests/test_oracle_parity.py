"""Differential test: every registered query vs its DuckDB oracle.

Port of the reference's oracle methodology (test-mr.sh:81-111: run the
distributed engine and the sequential implementation on identical
inputs, compare sorted outputs byte-for-byte). DuckDB plays
mrsequential; sf0.001 keeps the suite fast — the driver re-runs the
same comparison at sf0.01.
"""

import pytest

from distributed_map_reduce_spark.oracle import check_query
from distributed_map_reduce_spark.registry import all_queries

QUERY_NAMES = sorted(all_queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    res = check_query(spark, sf_dir, name)
    assert res.ok, f"{name}: {res.detail}"
