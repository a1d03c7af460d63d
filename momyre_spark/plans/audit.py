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
