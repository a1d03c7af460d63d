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


def _decode_cluster_time(ct) -> F.Column:
    """clusterTime -> packed T<<32|I resume order, defensively.

    The connector surfaces clusterTime as a BSON timestamp, which lands in
    Spark either as a castable long/timestamp OR as an extended-JSON string
    ``{"$timestamp": {"t": ..., "i": ...}}`` (schema-inference dependent).
    A naive ``cast('long')`` yields NULL on the extended-JSON form and
    silently breaks merge ordering and ts guards — so parse the struct form
    first, fall back to the cast, and FAIL-STOP (raise_error) if neither
    decodes: emitting unordered ops is the one thing a replicator must
    never do (reference fail-stop stance, mongo.go:183).
    """
    ct_str = ct.cast("string")
    parsed = F.from_json(ct_str, "struct<`$timestamp`:struct<t:long,i:long>>")
    tsi = parsed["$timestamp"]
    packed = F.when(
        tsi.isNotNull(), F.shiftleft(tsi["t"], 32).bitwiseOR(tsi["i"])
    )
    ts = F.coalesce(packed, ct.try_cast("long"))
    return F.when(
        ts.isNull(),
        F.raise_error(
            F.concat(
                F.lit("momyre: undecodable clusterTime: "),
                F.coalesce(ct_str, F.lit("NULL")),
            )
        ).cast("long"),
    ).otherwise(ts)


def decode_change_stream(stream: DataFrame) -> DataFrame:
    """Connector change-stream frame -> the engine's ops IR
    (ts, seq, [tok,] ns, op, _id, payload-json).

    C1-C9 as column expressions: operationType maps to the 3-verb IR,
    updateDescription.updatedFields is already the partial payload,
    removedFields become explicit nulls, clusterTime is the resume order.
    Events inside a multi-document transaction share one clusterTime, so
    when the frame carries the resume token (``_id._data``) it is emitted
    as ``tok`` — a lexicographically monotonic keystring — and the apply
    order becomes ``("ts", "seq", "tok")`` (pipeline auto-detects it).
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
    has_token = any(
        f.name == "_id"
        and f.dataType.typeName() == "struct"
        and "_data" in f.dataType.fieldNames()
        for f in stream.schema.fields
    )
    tok_cols = (
        [F.col("_id._data").cast("string").alias("tok")] if has_token else []
    )
    return stream.filter(op.isNotNull()).select(
        _decode_cluster_time(F.col("clusterTime")).alias("ts"),
        F.lit(0).cast("long").alias("seq"),
        *tok_cols,
        F.substring_index(F.col("ns.coll"), ".", -1).alias("ns"),
        op.alias("op"),
        F.col("documentKey._id").cast("string").alias("_id"),
        payload.alias("payload"),
    )
