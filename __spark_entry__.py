"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the full registry (momyre_spark.plans)
for the driver's DuckDB-oracle correctness gate at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import momyre_spark.plans as plans

plans.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped aggregation) on /root/testdata/sf0.001."""
    return plans.QUERIES["q11_tpch_q1_agg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(plans.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(plans.ORACLES)
