"""JDBC source — read the sink side back as DataFrames (reference S6).

``scanTableIds`` (``/root/reference/app/mysql.go:590-604``) streams
``SELECT _id FROM t`` row-at-a-time; the Spark equivalent is a partitioned
JDBC read with only the key column projected (Catalyst pushes the SELECT
list and WHERE clauses into the remote query).

Partitioned reads matter at scale: ``partition_column/num_partitions`` split
the table into range-bounded queries executed concurrently — without them a
JDBC read is a single connection pulling the whole table through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    predicates: list[str] | None = None,
) -> DataFrame:
    """Read a sink table as a DataFrame.

    Partitioning options (pick one):
    - ``partition_column`` + bounds: numeric/date range splits;
    - ``predicates``: one WHERE clause per partition (the route for STRING
      keys like ``_id`` — e.g. bucketing on a key prefix). Predicates must
      cover every row exactly once.
    """
    if predicates is not None:
        return spark.read.jdbc(
            url=url, table=table, predicates=predicates,
            properties=dict(properties or {}),
        )
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower/upper bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.load()


def read_sink_ids(
    spark: SparkSession, url: str, table: str, key: str = "_id", **kwargs
) -> DataFrame:
    """S6 key-only scan; the projection prunes to the key in the pushed query."""
    return read_table(spark, url, table, **kwargs).select(key)
