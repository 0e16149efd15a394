#!/usr/bin/env python
"""Compare two bench_results.json snapshots (per-round regression view).

The full suite keeps growing (~180 queries, ~15-30 s of new work per
round), so the headline total alone cannot distinguish "the stable set
regressed" from "we added queries" (VERDICT r6 item 8 / r7 missing item
4). This prints the common-set totals, the added/removed sets, and the
largest per-query deltas.

Usage:
    python tools/bench_delta.py OLD.json NEW.json [--top N]
    git show <round-commit>:bench_results.json > /tmp/old.json  # history

Per-query timings at sf0.1 carry a documented +-50% load variance;
deltas inside that band on an unchanged plan are noise — check PLANS.md
/ tests/test_plans.py before treating one as a regression.
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    return d["queries"] if "queries" in d else d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=8)
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    old_total = sum(old[q] for q in common)
    new_total = sum(new[q] for q in common)
    print(
        f"common set: {len(common)} queries, "
        f"{old_total:.1f} s -> {new_total:.1f} s "
        f"({new_total - old_total:+.1f} s, "
        f"{100 * (new_total / old_total - 1):+.1f}%)"
    )
    if added:
        add_total = sum(new[q] for q in added)
        print(f"added: {len(added)} queries, {add_total:.1f} s "
              f"(slowest: "
              + ", ".join(f"{q} {new[q]:.1f}s"
                          for q in sorted(added, key=new.get, reverse=True)[:3])
              + ")")
    if removed:
        print(f"removed: {len(removed)} queries: {', '.join(removed)}")

    deltas = sorted(common, key=lambda q: new[q] - old[q])
    print(f"\ntop {args.top} improvements (s):")
    for q in deltas[: args.top]:
        if new[q] - old[q] < -0.1:
            print(f"  {q:40s} {old[q]:6.2f} -> {new[q]:6.2f}  ({new[q]-old[q]:+.2f})")
    print(f"\ntop {args.top} regressions (s):")
    for q in reversed(deltas[-args.top:]):
        if new[q] - old[q] > 0.1:
            print(f"  {q:40s} {old[q]:6.2f} -> {new[q]:6.2f}  ({new[q]-old[q]:+.2f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
