"""Partitioned/bucketed lake layout tests: pruning and shuffle elimination
must be visible in the physical plan, not just hoped for."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from momyre_spark.sinks.lake import write_bucketed, write_partitioned
from momyre_spark.sources.parquet import load_table
from tests.conftest import SF_CORRECT


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    out = str(tmp_path / "orders_by_status")
    orders = load_table(spark, SF_CORRECT, "orders")
    write_partitioned(orders, out, partition_by=["o_orderstatus"])

    # hive-style layout on disk
    assert sorted(
        d for d in os.listdir(out) if d.startswith("o_orderstatus=")
    ) == ["o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"]

    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
    # results intact
    want = orders.filter("o_orderstatus = 'F'").count()
    assert back.count() == want


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    # force the SortMergeJoin path: auto-broadcast would hide the
    # bucketing's shuffle elimination at this tiny SF
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    orders = load_table(spark, SF_CORRECT, "orders")
    li = load_table(spark, SF_CORRECT, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", num_buckets=8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", num_buckets=8,
    )
    joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located buckets: no shuffle at all
    assert joined.count() == li.count()
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
