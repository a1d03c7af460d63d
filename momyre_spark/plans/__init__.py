"""Query plan registry.

``QUERIES`` maps query name -> callable(spark, sf_dir) -> DataFrame.
``ORACLES`` maps query name -> equivalent DuckDB SQL (the correctness oracle).

Queries without an oracle entry are genuinely non-SQL-expressible (or rely on
hash functions DuckDB lacks) and get a rows-only check from the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query-defining module (they self-register)."""
    from momyre_spark.plans import (  # noqa: F401
        analytics_queries,
        cdc_queries,
        core_queries,
        dedup_queries,
        multimodal_queries,
        similarity_queries,
        text_queries,
    )
