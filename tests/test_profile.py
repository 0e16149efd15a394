"""profile_table semantics on adversarial inputs — the registry parity
test covers the lineitem profile, but that table has no nulls, so the
null-group arm and type-faithful min/max need hand-built rows."""

import pyspark.sql.functions as F

from distributed_map_reduce_spark.operators.profile import profile_table


def _rows(spark):
    return spark.createDataFrame(
        [
            (1, 10.5, "b"),
            (2, None, "a"),
            (3, 2.0, None),
            (4, 2.0, None),
            (5, None, "a"),
        ],
        "id long, x double, s string",
    )


def test_profile_counts_nulls_and_distinct(spark):
    got = {
        r["col_name"]: r
        for r in profile_table(_rows(spark), ("x", "s")).collect()
    }
    x = got["x"]
    assert (x["n"], x["n_null"], x["n_distinct"]) == (5, 2, 2)
    assert (x["min_s"], x["max_s"]) == ("2.0", "10.5")  # numeric, not lexicographic
    s = got["s"]
    assert (s["n"], s["n_null"], s["n_distinct"]) == (5, 2, 2)
    assert (s["min_s"], s["max_s"]) == ("a", "b")


def test_profile_no_expand_in_plan(spark):
    # the whole point of the per-column-arm design: no Expand (the
    # multi-COUNT(DISTINCT) plan's x|cols| row replication)
    df = profile_table(_rows(spark), ("x", "s", "id"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_profile_all_null_column(spark):
    df = _rows(spark).withColumn("z", F.lit(None).cast("double"))
    got = {
        r["col_name"]: r for r in profile_table(df, ("z",)).collect()
    }
    z = got["z"]
    assert (z["n"], z["n_null"], z["n_distinct"]) == (5, 5, 0)
    assert z["min_s"] is None and z["max_s"] is None
