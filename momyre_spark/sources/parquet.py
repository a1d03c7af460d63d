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
    # Normalize events.ts across the generator's physical encodings:
    # - TIMESTAMP(NANOS): Spark reads it as nanos-since-epoch long
    #   (spark.sql.legacy.parquet.nanosAsLong) — truncate to a µs timestamp
    #   with exact `div` integer division (a double round-trip would lose
    #   precision above 2^53 ns);
    # - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
    #   TIMESTAMP_NTZ — cast to the session type (UTC session, so the
    #   instant is unchanged and matches DuckDB's naive read).
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_events_since(spark: SparkSession, sf_dir: str, iso_ts: str) -> DataFrame:
    """Resume-token scan of the events stream (reference P5,
    mongo.go:481-492: the oplog query composes ``ts > resume`` into the
    source read).

    The predicate is applied on the RAW column *before* any conversion —
    that keeps it a parquet PushedFilter (row-group pruning / late
    materialization). Filtering a converted/derived column instead would
    silently turn this into a full scan — the difference between reading
    one day and reading 100 TB. Handles both physical encodings of
    events.ts (see load_table): nanos-as-long gets a long predicate,
    µs timestamps get a typed timestamp literal (both push down).
    """
    from datetime import datetime, timezone

    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type == "bigint":
        dt = datetime.fromisoformat(iso_ts).replace(tzinfo=timezone.utc)
        ns = int(dt.timestamp()) * 1_000_000_000 + dt.microsecond * 1000
        return raw.filter(F.col("ts") > ns).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    lit_type = "TIMESTAMP_NTZ" if ts_type == "timestamp_ntz" else "TIMESTAMP"
    out = raw.filter(F.col("ts") > F.expr(f"{lit_type} '{iso_ts}'"))
    if ts_type == "timestamp_ntz":
        out = out.withColumn("ts", F.col("ts").cast("timestamp"))
    return out


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for ``spark.sql`` use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
