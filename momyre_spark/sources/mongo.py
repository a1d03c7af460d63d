"""MongoDB source (production path) — gated on the Spark connector jar.

The reference reads Mongo directly with the Go driver (snapshot:
``mongo.go:569-593`` readTable; CDC: ``mongo.go:456-539`` readLogs tailing
``local.oplog.rs``). On Spark the equivalent is the official MongoDB Spark
connector (DataSource v2, artifact ``org.mongodb.spark:mongo-spark-connector``):

- snapshot : ``spark.read.format("mongodb")`` — partitioned collection scan
  (sharded-cluster-aware partitioners replace the single cursor);
- CDC      : ``spark.readStream.format("mongodb")`` change streams — the
  connector surfaces ``operationType``/``documentKey``/``fullDocument``/
  ``updateDescription``, so decode collapses to column selects (C1-C9
  without the raw-oplog parsing; see sources/opslog.py for that path).

The connector jar is not present in this environment, so these builders
raise a clear error at call time if the format is unavailable; unit tests
cover only the option-plumbing (no network).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from momyre_spark.sources.opslog import DECODED_SCHEMA  # noqa: F401  (shared IR)


def snapshot_reader(
    spark: SparkSession, uri: str, database: str, collection: str
):
    """S2 full-collection snapshot scan (reader, unresolved until .load())."""
    return (
        spark.read.format("mongodb")
        .option("connection.uri", uri)
        .option("database", database)
        .option("collection", collection)
    )


def read_snapshot(
    spark: SparkSession, uri: str, database: str, collection: str
) -> DataFrame:
    try:
        return snapshot_reader(spark, uri, database, collection).load()
    except Exception as exc:  # connector jar absent in this environment
        raise NotImplementedError(
            "MongoDB Spark connector (org.mongodb.spark:mongo-spark-connector) "
            "is not on the classpath; add it via spark.jars.packages. "
            f"Underlying error: {exc}"
        ) from exc


def change_stream_reader(
    spark: SparkSession, uri: str, database: str, collection: str
):
    """S3 change-stream source (streaming reader).

    ``change.stream.publish.full.document.only=false`` keeps
    updateDescription so partial updates stay partial (K4 parity)."""
    return (
        spark.readStream.format("mongodb")
        .option("connection.uri", uri)
        .option("database", database)
        .option("collection", collection)
        .option("change.stream.publish.full.document.only", "false")
    )


def decode_change_stream(stream: DataFrame) -> DataFrame:
    """Connector change-stream frame -> the engine's ops IR
    (ts, ns, op, _id, payload-json).

    C1-C9 as column expressions: operationType maps to the 3-verb IR,
    updateDescription.updatedFields is already the partial payload,
    removedFields become explicit nulls, clusterTime is the resume order.
    """
    updated = F.from_json(
        F.col("updateDescription.updatedFields").cast("string"),
        "map<string,string>",
    )
    removed = F.coalesce(
        F.col("updateDescription.removedFields"),
        F.array().cast("array<string>"),
    )  # NULL removedFields must not null the whole merged payload map
    removed_nulls = F.map_from_arrays(
        removed, F.transform(removed, lambda _: F.lit(None).cast("string"))
    )
    op = (
        F.when(F.col("operationType") == "insert", F.lit("insert"))
        .when(F.col("operationType") == "replace", F.lit("insert"))
        .when(F.col("operationType") == "update", F.lit("update"))
        .when(F.col("operationType") == "delete", F.lit("delete"))
    )
    payload = (
        F.when(
            F.col("operationType").isin("insert", "replace"),
            F.col("fullDocument").cast("string"),
        )
        .when(
            F.col("operationType") == "update",
            F.to_json(F.map_concat(updated, removed_nulls)),
        )
        .otherwise(F.lit("{}"))
    )
    return stream.filter(op.isNotNull()).select(
        F.col("clusterTime").cast("long").alias("ts"),
        F.substring_index(F.col("ns.coll"), ".", -1).alias("ns"),
        op.alias("op"),
        F.col("documentKey._id").cast("string").alias("_id"),
        payload.alias("payload"),
    )
