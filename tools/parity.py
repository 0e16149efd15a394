#!/usr/bin/env python
"""Ad-hoc parity runner: python tools/parity.py [query ...] [--sf DIR]

Runs each registered query on Spark and its DuckDB oracle on the same
parquet tables and reports match/mismatch. Default sf dir: sf0.01 (the
driver's correctness gate scale).
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from distributed_map_reduce_spark.oracle import check_query  # noqa: E402
from distributed_map_reduce_spark.registry import all_queries  # noqa: E402
from distributed_map_reduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: all)")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_spark("parity")
    names = args.queries or list(all_queries())
    failed = 0
    for name in names:
        t0 = time.time()
        try:
            res = check_query(spark, args.sf, name)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: exception {type(e).__name__}: {e}")
            failed += 1
            continue
        dt = time.time() - t0
        status = "ok  " if res.ok else "FAIL"
        print(f"{status} {name}  rows={res.spark_rows} ({dt:.1f}s) {res.detail[:400]}")
        failed += 0 if res.ok else 1
    print(f"\n{len(names) - failed}/{len(names)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
