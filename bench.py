#!/usr/bin/env python
"""Benchmark harness: runs the registered query suite and prints ONE JSON
line {"metric", "value", "unit", "queries", "sf"}.

- data dir: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
- parallelism: local[$SPARK_GRAFT_CPUS] (default local[*])

Each query is fully materialized with the noop sink (executes the whole
plan — scans, shuffles, sorts — without driver-side collect overhead).
A tiny warmup action runs first so JVM/session startup isn't billed to
the first query. BASELINE.md's working bound: every query < 45 s at
sf0.1 (the reference harness's per-test timeout analog).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distributed_map_reduce_spark.registry import all_queries  # noqa: E402
from distributed_map_reduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_label = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        sf = float(sf_label)
    except ValueError:
        sf = sf_label

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JVM + parquet footer caches, plus one tiny mapInPandas so
    # Python-worker spawn + Arrow init isn't billed to the first
    # Pandas-UDF query (measured ~9 s of pure startup on q27 otherwise).
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(4).mapInPandas(lambda it: it, "id long").count()

    timings: dict[str, float] = {}
    for name, spec in all_queries().items():
        t0 = time.perf_counter()
        df = spec.build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "suite_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
