"""Row-group data skipping: the sorted-layout half of the 100 TB scan
story (SCALE.md ground rules). Partition pruning (directory level) is
covered in test_partition_pruning.py; this pins the NEXT level down —
parquet row-group min/max statistics. A layout clustered on the filter
column makes each row group's [min, max] narrow, so a point/range
predicate overlaps few groups and the reader (Spark's parquet filter
pushdown uses exactly these stats) skips the rest without touching
their pages. A shuffled layout makes every row group's range span the
whole domain — nothing can be skipped, even with identical pushdown.

The assertion is on the parquet statistics themselves (engine-neutral,
deterministic) plus Spark-side result equality over both layouts.
"""

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from distributed_map_reduce_spark.sources import load_table

ROWS_PER_GROUP = 150


def _overlapping_groups(path: str, lo, hi) -> tuple[int, int]:
    """(#row groups whose [min,max] overlaps [lo,hi], total #groups)
    across all parquet files under path."""
    import glob
    import os

    hit = total = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        ci = names["o_totalprice"]
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(ci).statistics
            total += 1
            if st.min <= hi and st.max >= lo:
                hit += 1
    return hit, total


def test_sorted_layout_skips_row_groups(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    import os

    import pyarrow as pa

    # pyarrow writer for exact row-group control (Spark's writer flushes
    # by buffered bytes — fine at real scale, opaque for a unit test);
    # Spark remains the reader under test.
    pdf = orders.toPandas()
    # a narrow band around the median: covers ~10% of rows, so every
    # domain-spanning group straddles it while a sorted layout confines
    # it to ~10% of groups
    lo = float(pdf["o_totalprice"].quantile(0.45))
    hi = float(pdf["o_totalprice"].quantile(0.55))
    by_price = pdf.sort_values("o_totalprice", kind="mergesort")
    by_hash = pdf.sample(frac=1.0, random_state=7)  # domain-spanning mix
    sorted_dir = str(tmp_path / "sorted")
    shuffled_dir = str(tmp_path / "shuffled")
    os.makedirs(sorted_dir), os.makedirs(shuffled_dir)
    pq.write_table(pa.Table.from_pandas(by_price, preserve_index=False),
                   f"{sorted_dir}/part-0.parquet",
                   row_group_size=ROWS_PER_GROUP)
    pq.write_table(pa.Table.from_pandas(by_hash, preserve_index=False),
                   f"{shuffled_dir}/part-0.parquet",
                   row_group_size=ROWS_PER_GROUP)

    s_hit, s_total = _overlapping_groups(sorted_dir, lo, hi)
    u_hit, u_total = _overlapping_groups(shuffled_dir, lo, hi)
    assert s_total > 3 and u_total > 3, "need multiple row groups to skip"
    # clustered: the band lives in a small fraction of groups;
    # shuffled: every group spans the domain -> zero skipping
    assert s_hit <= max(2, s_total // 3), (s_hit, s_total)
    assert u_hit == u_total, (u_hit, u_total)

    # both layouts answer identically (skipping is physical, not logical)
    pred = (F.col("o_totalprice") >= lo) & (F.col("o_totalprice") <= hi)
    want = sorted(
        r["o_orderkey"] for r in orders.filter(pred).collect()
    )
    for d in (sorted_dir, shuffled_dir):
        got = sorted(
            r["o_orderkey"]
            for r in spark.read.parquet(d).filter(pred).collect()
        )
        assert got == want
