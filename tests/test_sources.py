"""Source layer: parquet footers must match the documented contract."""

import pytest

from distributed_map_reduce_spark.sources import TABLES, load_table
from distributed_map_reduce_spark.sources.tables import expected_schema


@pytest.mark.parametrize("name", TABLES)
def test_footer_matches_contract(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    assert df.schema == expected_schema(name), (
        f"{name}: footer {df.schema.simpleString()} != "
        f"contract {expected_schema(name).simpleString()}"
    )


def test_unknown_table_rejected(spark, sf_dir):
    with pytest.raises(KeyError):
        load_table(spark, sf_dir, "nope")
