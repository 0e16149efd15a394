"""Physical-plan inspection helpers.

The reference has no optimizer to inspect (SURVEY §4.1) — its plan is a
fixed M->R task table. Here the plan IS the performance story, so the
engine exposes what Catalyst chose and the test suite pins the
scale-critical properties: filters reach the parquet scan, scans prune
columns, small dimensions broadcast, algebraic aggregates partial-
aggregate map-side (the combiner the reference lacks,
/root/reference/src/mr/worker.go:207). A plan regression that silently
turns a broadcast join into a 100 TB shuffle fails tests, not prod.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (``df.explain`` only prints)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every non-empty ``PushedFilters`` list in the plan's scans."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            # split on commas between filters, not inside Filter(a,b) args
            out.extend(s.strip() for s in re.split(r",(?![^(]*\))", body))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """The ``ReadSchema`` struct string of each file scan (column pruning:
    a scan feeding a 2-column query must not read 10 columns)."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan)]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def count_shuffles(df: DataFrame) -> int:
    """Number of exchange operators — the unit of cost at 100 TB."""
    return formatted_plan(df).count("Exchange")


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when the aggregate runs in partial+final mode (map-side
    combine before the shuffle)."""
    plan = formatted_plan(df)
    return bool(re.search(r"Functions \[\d+\]: \[partial_", plan))


def whole_stage_codegen_subtrees(df: DataFrame, execute: bool = True) -> int:
    """How many whole-stage-codegen subtrees the plan compiles to — 0
    means the hot path runs interpreted. Executes the query first by
    default: under AQE the plan reports no codegen subtrees until its
    stages are finalized."""
    if execute:
        # collect(), not count(): count() plans a *different* query, so
        # this frame's AdaptiveSparkPlan would stay un-finalized.
        df.collect()
    plan = formatted_plan(df, "codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan)
    return int(m.group(1)) if m else 0


def shuffle_metrics(df: DataFrame, execute: bool = True) -> tuple[int, int]:
    """(bytes_written, records_written) summed over every shuffle
    exchange in the EXECUTED (AQE-finalized) plan — the measured cost of
    the plan's exchanges, not an estimate. Walks the physical tree via
    the JVM handles, descending through AQE wrappers (QueryStageExec /
    AdaptiveSparkPlanExec) and deduping reused exchanges by plan-node
    identity so a ReusedExchange is not double-counted.

    ``execute=False`` assumes the caller already ran an action on this
    exact frame (AQE metrics live on the executed instance)."""
    if execute:
        df.collect()
    root = df._jdf.queryExecution().executedPlan()
    tot_b = tot_r = 0
    seen: set[int] = set()

    def walk(node) -> None:
        nonlocal tot_b, tot_r
        nid = node.id()
        if nid in seen:
            return
        seen.add(nid)
        cls = node.getClass().getSimpleName()
        if cls == "ShuffleExchangeExec":
            m = node.metrics()
            it = m.iterator()
            while it.hasNext():
                kv = it.next()
                k = kv._1()
                if k == "shuffleBytesWritten":
                    tot_b += kv._2().value()
                elif k == "shuffleRecordsWritten":
                    tot_r += kv._2().value()
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
        elif cls.endswith("QueryStageExec"):
            walk(node.plan())

    walk(root)
    return int(tot_b), int(tot_r)
