#!/usr/bin/env python
"""Isolated query timing + plan capture (guide §1.1/§1.4/§1.5).

    python tools/qtime.py q235_levenshtein_complete --reps 2 \
        --sf /root/testdata/sf0.1 --plan plans/r16/q235_before.txt

Times each named query with the noop sink (full materialization, no
driver collect), labels the jobs so the UI/event log is readable, and
optionally writes the ``explain("formatted")`` output to a file — the
before/after artifact the optimization round commits under plans/r16/.
Reps > 1 separate cold (first-use JIT/codegen) from warm cost.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_map_reduce_spark.registry import all_queries  # noqa: E402
from distributed_map_reduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--plan",
        default=None,
        help="write explain('formatted') here (single query only)",
    )
    ap.add_argument(
        "--no-store",
        action="store_true",
        help="skip the pair/rollup store provision (for store-free queries)",
    )
    args = ap.parse_args()

    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = args.sf
    # same warmup as bench.py so rep-1 isn't billed session startup
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(4).mapInPandas(lambda it: it, "id long").count()
    if not args.no_store:
        from distributed_map_reduce_spark import sinks
        from distributed_map_reduce_spark.operators import dedup

        if dedup._stored_pairs_if_fresh(spark, sf_dir) is None:
            dedup.write_pair_store(spark, sf_dir)
        sinks.ensure_distinct_rollup(spark, sf_dir)

    specs = all_queries()
    for name in args.queries:
        spec = specs[name]
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            df = spec.build(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            print(f"{name} rep{rep}: {dt:.3f}s", flush=True)
            spark.sparkContext.setJobDescription(None)
        if args.plan and len(args.queries) == 1:
            from distributed_map_reduce_spark.plans.inspect import (
                formatted_plan,
            )

            df = spec.build(spark, sf_dir)
            with open(args.plan, "w") as f:
                f.write(formatted_plan(df))
            print(f"plan -> {args.plan}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
