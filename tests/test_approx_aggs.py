"""Approximate-aggregation surface: HLL distinct counts and quantile
sketches within declared error bounds (the scale substitutes for exact
distinct/percentile when cardinality is billions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from momyre_spark.sources.parquet import load_table
from tests.conftest import SF_CORRECT


def test_approx_count_distinct_within_rsd(spark):
    orders = load_table(spark, SF_CORRECT, "orders")
    exact = orders.select(F.countDistinct("o_custkey").alias("n")).collect()[0]["n"]
    approx = orders.select(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n")
    ).collect()[0]["n"]
    assert abs(approx - exact) <= max(3, 0.06 * exact)  # 3x rsd margin


def test_approx_percentile_brackets_exact(spark):
    li = load_table(spark, SF_CORRECT, "lineitem")
    p50, p95 = li.select(
        F.percentile_approx("l_extendedprice", [0.5, 0.95], 10000).alias("p")
    ).collect()[0]["p"]
    exact_sorted = [r[0] for r in li.select("l_extendedprice").orderBy(
        "l_extendedprice").collect()]
    n = len(exact_sorted)
    # sketch answers must land within a small rank neighborhood
    assert exact_sorted[int(n * 0.49)] <= p50 <= exact_sorted[int(n * 0.51)]
    assert exact_sorted[int(n * 0.94)] <= p95 <= exact_sorted[min(n - 1, int(n * 0.96))]
