#!/usr/bin/env python
"""Generate SCALING.md + scaling_results.json — per-query scaling slopes.

The 2x bench gate is measured at one scale factor; a superlinear
operator (pair join over a hot key, window over one giant partition)
can hide there and only explode at the next scale-up. This tool times
every registered query at TWO scale factors (default sf0.01 and sf0.1,
a 10x data ratio) with bench.py's noop-sink methodology and reports the
slope t(hi)/t(lo) and the implied growth exponent
log(slope)/log(ratio)  (1.0 = linear, 1.5 = the red line the pytest
gate enforces for oracle-checked queries; VERDICT r5 item 4).

Sub-second timings are dominated by fixed planning/dispatch overhead,
so slopes are computed over max(t, FLOOR_SEC) — without the floor a
20 ms -> 600 ms query reads as "30x superlinear" when it is actually
fixed-cost noise.

Usage: python tools/scaling.py [--lo DIR] [--hi DIR] [--merge-missing]
``--merge-missing`` times only queries absent from the existing
scaling_results.json and merges them in (for mid-round suite growth;
a full regeneration re-times everything).
NOTE: run on a quiet box — timing under pytest/another Spark process
skews 20-40x on local[32].
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from distributed_map_reduce_spark.registry import all_queries  # noqa: E402
from distributed_map_reduce_spark.session import get_spark  # noqa: E402

FLOOR_SEC = 0.25   # fixed-overhead floor for slope computation
MAX_EXPONENT = 1.5  # gate: no oracle-checked query grows worse than n^1.5

# One-line cause annotations for queries expected near the top of the
# slope table (the genuinely data-superlinear-by-design shapes).
CAUSES = {
    "q104_jaccard_prefix_join": "candidate-pair frame grows with near-dup density (prefix-filtered AllPairs; bounded by rarity ordering)",
    "q24_ngram_jaccard_dedup": "shingle self-join output grows with shared-shingle pair count (df-cap variant bounds it at scale)",
    "q25_minhash_lsh_dedup": "band-collision candidates grow with near-dup density; banding keeps it ~linear in docs",
    "q27_embedding_neardup": "block-matrix all-pairs cosine: O(n^2/B) FLOPs by design; blocks bound memory not work",
    "ann_ivfpq": "IVF cell scan + ADC table build per query batch; codebook fit is constant-size",
    "ann_pq_adc": "ADC distance tables scale with corpus; lookup itself is codegen",
    "q38_dedup_clusters": "label-propagation rounds over the pair graph; round count grows with component diameter",
    "q89_dedup_clusters_star": "star-contraction rounds O(log^2 n); per-round shuffle linear in edges",
    "q118_khop_reachability": "frontier expansion multiplies with dup-graph degree up to the hop bound",
    "q107_triangle_count": "ordered 3-way self-join grows with wedge count (degree-squared sum)",
    "q127_hard_negatives": "composes BM25 + pair detector inline (stored-pairs path cuts the detector re-derivation)",
    "q90_incremental_dedup": "delta-vs-store probe: linear in delta, store side shuffle-free",
    "q53_winnowing_fingerprints": "per-token rolling windows; linear but token-heavy",
    "q83_substring_dup": "fingerprint grams per doc ~ length; groupBy on gram hash",
}


def time_suite(spark, sf_dir: str, only: set[str] | None = None) -> dict[str, float]:
    """min-of-two timing per query: the first execution of a fresh
    session carries JIT/codegen/footer-cache warm-up that lands almost
    entirely on whichever sf runs first — one contaminated lo pass
    deflates EVERY exponent and the n^1.5 gate silently weakens
    (observed: a full refresh recorded q4 at 2.08 s @sf0.01 vs 0.38 s
    @sf0.1, a physically impossible negative slope). Two runs, keep the
    faster."""
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(4).mapInPandas(lambda it: it, "id long").count()
    out: dict[str, float] = {}
    for name, spec in all_queries().items():
        if only is not None and name not in only:
            continue
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            spec.build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", default="/root/testdata/sf0.01")
    ap.add_argument("--hi", default="/root/testdata/sf0.1")
    ap.add_argument("--ratio", type=float, default=10.0,
                    help="data-size ratio hi/lo")
    ap.add_argument("--merge-missing", action="store_true",
                    help="time only queries absent from the existing "
                         "artifact and merge")
    args = ap.parse_args()

    prior: dict[str, dict] = {}
    only: set[str] | None = None
    if args.merge_missing:
        with open(os.path.join(REPO, "scaling_results.json")) as f:
            prior = {r["query"]: r for r in json.load(f)["rows"]}
        only = {n for n in all_queries() if n not in prior}
        if not only:
            print("nothing missing; artifact already covers the registry")
            return 0

    spark = get_spark("scaling")
    spark.sparkContext.setLogLevel("ERROR")
    # Provision the persisted pair store for BOTH scale dirs before
    # timing anything (bench.py's posture): without this, whichever
    # pass finds its store absent/stale times the eight pair consumers
    # WITH an inline pair recompute while the other pass reads the
    # bucketed copy — round 9 saw exactly that skew the lo pass into
    # spurious negative exponents for q77/q89/q107/q109/q118.
    from distributed_map_reduce_spark.operators import dedup

    for d in (args.lo, args.hi):
        if dedup._stored_pairs_if_fresh(spark, d) is None:
            dedup.write_pair_store(spark, d)
    t_lo = time_suite(spark, args.lo, only)
    t_hi = time_suite(spark, args.hi, only)

    qs = all_queries()
    rows = [r for n, r in prior.items() if n in qs]
    for name in t_lo:
        lo, hi = t_lo[name], t_hi[name]
        slope = max(hi, FLOOR_SEC) / max(lo, FLOOR_SEC)
        exponent = round(math.log(slope) / math.log(args.ratio), 3)
        rows.append({
            "query": name,
            "t_lo": lo,
            "t_hi": hi,
            "slope": round(slope, 2),
            "exponent": exponent,
            "oracle": qs[name].oracle is not None,
        })
    rows.sort(key=lambda r: -r["exponent"])

    results = {
        "lo": args.lo,
        "hi": args.hi,
        "ratio": args.ratio,
        "floor_sec": FLOOR_SEC,
        "max_exponent_gate": MAX_EXPONENT,
        "rows": rows,
    }
    with open(os.path.join(REPO, "scaling_results.json"), "w") as f:
        json.dump(results, f, indent=1)

    lines = [
        "# SCALING — per-query growth between scale factors (generated)",
        "",
        f"Generated by `tools/scaling.py`: suite timed at `{args.lo}` and",
        f"`{args.hi}` ({args.ratio:g}x data) with bench.py's noop-sink",
        "methodology on a quiet box. slope = t(hi)/t(lo) over a",
        f"{FLOOR_SEC}s fixed-overhead floor; exponent = log(slope)/log(ratio)",
        "(1.0 linear). Gate (tests/test_scaling.py): every oracle-checked",
        f"query must stay at or under n^{MAX_EXPONENT}. Machine copy:",
        "`scaling_results.json`.",
        "",
        "## Worst 10 slopes",
        "",
        "| query | t(lo) s | t(hi) s | slope | exp | cause |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows[:10]:
        tags = qs[r["query"]].tags
        cause = CAUSES.get(
            r["query"], ("tags: " + ",".join(tags)) if tags else "-"
        )
        lines.append(
            f"| `{r['query']}` | {r['t_lo']} | {r['t_hi']} | "
            f"{r['slope']} | {r['exponent']} | {cause} |"
        )
    lines += [
        "",
        "## Full table (exponent desc)",
        "",
        "| query | t(lo) s | t(hi) s | slope | exp | oracle |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| `{r['query']}` | {r['t_lo']} | {r['t_hi']} | "
            f"{r['slope']} | {r['exponent']} | "
            f"{'yes' if r['oracle'] else 'rows-only'} |"
        )
    lines.append("")
    with open(os.path.join(REPO, "SCALING.md"), "w") as f:
        f.write("\n".join(lines))
    worst = rows[0]
    suspect = [r["query"] for r in rows if r["exponent"] < -0.2]
    if suspect:
        print(
            f"WARNING: {len(suspect)} queries show strongly negative "
            f"exponents (10x data running faster) — the lo pass was "
            f"likely contaminated; rerun on a quiet box: {suspect[:5]}"
        )
    print(
        f"wrote SCALING.md + scaling_results.json; worst exponent "
        f"{worst['exponent']} ({worst['query']})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
