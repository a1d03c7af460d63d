"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the full registry (momyre_spark.plans)
for the driver's DuckDB-oracle correctness gate at sf0.01.

Every callable pins the engine's runtime SQL confs onto the caller's
SparkSession first (the driver builds its own session; events.parquet uses
NANOS timestamps that need ``nanosAsLong``, and oracle parity needs UTC).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import momyre_spark.plans as plans  # noqa: E402
from momyre_spark.session import apply_runtime_confs

plans.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped aggregation) on /root/testdata/sf0.001."""
    apply_runtime_confs(spark)
    return plans.QUERIES["q11_tpch_q1_agg"](spark, "/root/testdata/sf0.001")


def _wrap(fn: plans.QueryFn) -> plans.QueryFn:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        apply_runtime_confs(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered by ``plans.DRIVER_PRIORITY``: the driver records ~50 correctness
    rows per round in registry order, so queries lacking a round-1 row come
    first (round 1 + round 2 rows then cover all registered queries)."""
    return {name: _wrap(fn) for name, fn in plans.ordered_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(plans.ORACLES)
