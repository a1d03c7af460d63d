"""Parquet table source — the test/bench stand-in for the reference's
MongoDB snapshot scan (``/root/reference/app/mongo.go:569-593`` readTable).

At cluster scale the same entry points serve any DataSource-v2 path
(``spark.read.format("mongodb")``, JDBC, Delta, ...) — the engine only ever
sees DataFrames, so swapping the physical source is a config change.

Scans stay lazy and declarative: filters/projections applied by callers are
pushed into the parquet reader by Catalyst (PushedFilters / ReadSchema), which
is what makes the same query viable at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H fixes
# region=5 and nation=25 rows regardless of SF).
BROADCAST_TABLES = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is parquet TIMESTAMP(NANOS): Spark reads it as nanos-since-
    # epoch long (spark.sql.legacy.parquet.nanosAsLong) — truncate to a µs
    # timestamp, matching DuckDB's CAST(ts AS TIMESTAMP) on the same file.
    # `div` is exact long integer division (a double round-trip would lose
    # precision above 2^53 ns).
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return df


def load_events_since(spark: SparkSession, sf_dir: str, iso_ts: str) -> DataFrame:
    """Resume-token scan of the events stream (reference P5,
    mongo.go:481-492: the oplog query composes ``ts > resume`` into the
    source read).

    The raw column is nanos-since-epoch, so the predicate is applied on the
    RAW long *before* the timestamp conversion — that keeps it a parquet
    PushedFilter (row-group pruning / late materialization). Filtering the
    converted timestamp instead would silently turn this into a full scan —
    the difference between reading one day and reading 100 TB.
    """
    from datetime import datetime, timezone

    dt = datetime.fromisoformat(iso_ts).replace(tzinfo=timezone.utc)
    ns = int(dt.timestamp()) * 1_000_000_000 + dt.microsecond * 1000
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return raw.filter(F.col("ts") > ns).withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    )


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for ``spark.sql`` use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
