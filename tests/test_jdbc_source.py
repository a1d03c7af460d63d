"""JDBC sink-side reads (reference S6) against an embedded Derby database —
the one real JDBC driver shipped with Spark, so the scan is exercised
end-to-end: the orphan anti-join's sink side is a distributed
``spark.read.jdbc`` relation, never a driver-side fetchall.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from momyre_spark.operators.antijoin import orphan_ids
from momyre_spark.sources.jdbc import read_sink_ids

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture
def derby_url(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/sinkdb;create=true"
    # seed the sink table through Spark's own JDBC writer
    df = spark.createDataFrame(
        [Row(_id=f"k{i:03d}", payload=f"v{i}") for i in range(40)]
    )
    df.write.jdbc(url, "users", mode="overwrite", properties=DERBY_PROPS)
    return url


def test_read_sink_ids_is_a_jdbc_scan(spark, derby_url):
    ids = read_sink_ids(spark, derby_url, "users", key="_id",
                        properties=DERBY_PROPS)
    assert ids.columns == ["_id"]
    assert ids.count() == 40
    plan = ids._jdf.queryExecution().executedPlan().toString()
    assert "JDBCRelation" in plan  # executor-side scan, not parallelize()


def test_orphan_antijoin_over_jdbc_scan(spark, derby_url):
    """Source lost k000..k004 -> those sink keys are orphans; the anti-join
    plan joins a JDBCRelation directly (no driver materialization)."""
    src = spark.createDataFrame(
        [Row(_id=f"k{i:03d}") for i in range(5, 40)]
    )
    sink = read_sink_ids(spark, derby_url, "users", key="_id",
                         properties=DERBY_PROPS)
    orphans = orphan_ids(sink, src, left_key="_id", right_key="_id")
    plan = orphans._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "JDBCRelation" in plan
    assert "LocalTableScan" not in plan.split("LeftAnti")[0]  # sink side scans JDBC
    got = sorted(r["_id"] for r in orphans.collect())
    assert got == [f"k{i:03d}" for i in range(5)]


def test_predicate_partitioned_jdbc_read(spark, derby_url):
    """String keys can't range-partition; predicate partitioning splits the
    scan into one remote query per clause (must cover rows exactly once)."""
    preds = ['MOD(LENGTH("payload"), 2) = 0', 'MOD(LENGTH("payload"), 2) = 1']
    ids = read_sink_ids(spark, derby_url, "users", key="_id",
                        properties=DERBY_PROPS, predicates=preds)
    assert ids.rdd.getNumPartitions() == 2
    assert ids.count() == 40


def test_engine_sink_ids_routes_to_jdbc(spark, derby_url, tmp_path):
    """ReplicationEngine with jdbc_url configured: sink_ids is the JDBC scan
    (the DBAPI fetchall fallback is for dialects without a driver only)."""
    import functools
    import sqlite3

    from momyre_spark.engine import ReplicationEngine
    from momyre_spark.spec import parse_spec

    spec = parse_spec("tables:\n  users:\n    payload: varchar(100)\n")
    eng = ReplicationEngine(
        spark,
        spec,
        source=lambda t: spark.createDataFrame([Row(_id="k000")]),
        connection_factory=functools.partial(
            sqlite3.connect, str(tmp_path / "unused.db")
        ),
        dialect_name="sqlite",
        jdbc_url=derby_url,
        jdbc_properties=DERBY_PROPS,
    )
    ids = eng.sink_ids("users")
    plan = ids._jdf.queryExecution().executedPlan().toString()
    assert "JDBCRelation" in plan
    assert ids.count() == 40
