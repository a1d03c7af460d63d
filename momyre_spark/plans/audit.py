"""Programmatic plan auditor: the scale-readiness facts of a DataFrame's
physical plan as a dict, instead of string-grepping explain() output in
every test.

The facts an operator review asks of any plan before it ships to a
1000-executor cluster:

- how many Exchanges (shuffles/broadcasts) and which kind;
- did filters/column pruning reach the scans (PushedFilters, ReadSchema
  width, PartitionFilters);
- is anything on the Python boundary (BatchEvalPython / mapInPandas) or
  quadratic (CartesianProduct, BroadcastNestedLoopJoin);
- how wide the WholeStageCodegen spans are.

Usage::

    from momyre_spark.plans.audit import audit_plan
    facts = audit_plan(df)
    assert facts["cartesian"] == 0 and facts["shuffle_exchanges"] <= 2
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _node_depth(line: str) -> int:
    """Column where a plan-tree node's name starts (tree prefix chars +
    optional ``*(n)`` codegen marker); deeper = descendant."""
    m = re.match(r"^[\s:+|-]*(\*\(\d+\)\s*)?", line)
    return m.end()


_AGG_NODES = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")
# nodes a SinglePartition exchange may pass through on its way to the
# consumer that required it (pure per-row / ordering ops)
_PASSTHROUGH = ("Sort", "Project", "Filter", "ColumnarToRow", "InputAdapter",
                "WholeStageCodegen", "AQEShuffleRead", "ShuffleQueryStage",
                "Coalesce")


def corpus_singlepartition_windows(plan: str) -> list[str]:
    """The canonical single-task scale-killer, detected structurally: an
    ``Exchange SinglePartition`` that feeds a ``Window`` (through
    sort/project pass-through nodes) with NO aggregation below the
    exchange — i.e. the windowed frame is input-sized, and the whole
    input is sorted in ONE task. ``Window.partitionBy()`` with no keys
    plans exactly this shape.

    SinglePartition exchanges ABOVE an aggregation are allowed: their
    frame is grouped (bucket tables, per-family test rows, final
    scalars) — bounded by key cardinality, the audited acceptable
    class. Returns the offending exchange lines (empty = clean).
    """
    lines = plan.splitlines()
    offenders = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        d = _node_depth(ln)
        # subtree: contiguous following lines strictly deeper
        subtree = []
        for nxt in lines[i + 1:]:
            if nxt.strip() and _node_depth(nxt) <= d:
                break
            subtree.append(nxt)
        if any(a in s for a in _AGG_NODES for s in subtree):
            continue  # post-aggregation frame: bounded, allowed
        # ancestors: walk up the nearest strictly-shallower lines until
        # the first non-pass-through consumer
        cur = d
        for prev in reversed(lines[:i]):
            if not prev.strip():
                continue
            pd = _node_depth(prev)
            if pd >= cur:
                continue
            cur = pd
            name = prev.strip().lstrip(":+|- ").lstrip("*(0123456789) ")
            if name.startswith("Window"):
                offenders.append(ln.strip())
                break
            if not any(name.startswith(p) for p in _PASSTHROUGH):
                break  # consumed by a join/limit/agg/collect — not a window
    return offenders


def audit_plan(df: DataFrame, execute: bool = False) -> dict:
    """Executed-plan facts for scale review / plan-pinning tests.

    Under AQE the codegen stages (and runtime join re-plans) only
    materialize once the query RUNS; pass ``execute=True`` to run a
    count() first and audit the final adaptive plan — otherwise codegen
    spans read 0 on an un-executed adaptive plan and join kinds reflect
    the static choice."""
    if execute:
        # run THIS queryExecution's plan (a separate action like a noop
        # write builds a fresh QueryExecution and leaves this one
        # isFinalPlan=false); after this the string carries the final
        # adaptive plan with codegen ids and runtime join choices
        df._jdf.queryExecution().executedPlan().execute().count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==")[0]
    scans = re.findall(r"FileScan \w+", plan)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    parts = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    return {
        "shuffle_exchanges": len(re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning|Exchange RoundRobinPartitioning", plan)),
        "broadcast_exchanges": plan.count("BroadcastExchange"),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "python_eval": plan.count("BatchEvalPython"),
        "corpus_singlepartition_windows": len(
            corpus_singlepartition_windows(plan)
        ),
        "arrow_eval": plan.count("ArrowEvalPython") + plan.count("MapInPandas"),
        "scans": len(scans),
        "pushed_filters": [p for p in pushed if p.strip()],
        "partition_filters": [p for p in parts if p.strip()],
        # the tree string renders codegen stages as "*(id) Op"; formatted
        # explain spells out "WholeStageCodegen (id)" — accept both
        "codegen_spans": len(
            set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
            | set(re.findall(r"\*\((\d+)\)", plan))
        ),
        "plan": plan,
    }
