#!/usr/bin/env python
"""Dump physical plans for registered queries.

    python tools/explain.py q5_filtered_revenue q7_region_revenue
    python tools/explain.py --all --sf /root/testdata/sf0.01

Prints each query's formatted plan plus the scale-relevant summary the
test suite pins (pushed filters, read schemas, broadcast, partial agg,
shuffle count) — the artifact to eyeball when tuning: is this the plan
you'd want at 100 TB?
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_map_reduce_spark.plans.inspect import (  # noqa: E402
    count_shuffles,
    formatted_plan,
    has_broadcast_join,
    has_partial_aggregation,
    pushed_filters,
    read_schemas,
)
from distributed_map_reduce_spark.registry import all_queries  # noqa: E402
from distributed_map_reduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    specs = all_queries()
    names = sorted(specs) if args.all else args.queries
    if not names:
        print("usage: explain.py [--all] <query>...; known:", ", ".join(sorted(specs)))
        return 2

    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = specs[name].build(spark, args.sf)
        print(f"\n=== {name} ===")
        print(formatted_plan(df).rstrip())
        print(f"--- summary: shuffles={count_shuffles(df)}"
              f" broadcast_join={has_broadcast_join(df)}"
              f" partial_agg={has_partial_aggregation(df)}")
        for f in pushed_filters(df):
            print(f"    pushed: {f}")
        for s in read_schemas(df):
            print(f"    reads:  {s}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
