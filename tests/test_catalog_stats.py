"""Catalog statistics (SURVEY §2.3: the reference has 'no statistics,
no catalog'): ANALYZE TABLE populates table- and column-level stats in
the catalog — the inputs Spark's cost-based planning (join reorder,
size-based broadcast without runtime AQE sampling) reads. At 100 TB
stats are how the optimizer knows a dim table is broadcastable before
running anything."""

DB = "stats_demo"


def test_analyze_populates_catalog_stats(spark, sf_dir, tmp_path):
    from distributed_map_reduce_spark.sources import load_table

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB} LOCATION '{tmp_path}/wh'")
    try:
        nation = load_table(spark, sf_dir, "nation")
        nation.write.saveAsTable(f"{DB}.nation_t")
        n_rows = nation.count()

        spark.sql(f"ANALYZE TABLE {DB}.nation_t COMPUTE STATISTICS")
        spark.sql(
            f"ANALYZE TABLE {DB}.nation_t COMPUTE STATISTICS "
            "FOR COLUMNS n_nationkey"
        )

        # table-level: row count + size land in the catalog entry
        stats_row = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {DB}.nation_t")
            .filter("col_name = 'Statistics'")
            .collect()
        )
        assert len(stats_row) == 1
        assert f"{n_rows} rows" in stats_row[0]["data_type"]

        # column-level: distinct count for the analyzed column
        col_stats = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(
                f"DESCRIBE TABLE EXTENDED {DB}.nation_t n_nationkey"
            ).collect()
        }
        assert int(col_stats["distinct_count"]) == n_rows
        assert int(col_stats["max"]) == n_rows - 1
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {DB} CASCADE")
