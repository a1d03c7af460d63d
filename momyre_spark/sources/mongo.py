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


def _decode_cluster_time(ct, dtype=None) -> F.Column:
    """clusterTime -> packed T<<32|I resume order, defensively.

    The connector surfaces clusterTime as a BSON timestamp, which lands in
    Spark as a castable long/timestamp, an extended-JSON string
    ``{"$timestamp": {"t": ..., "i": ...}}``, or — under schema inference
    over extended-JSON events — an actual STRUCT of that shape (all three
    are in the golden corpus, tests/fixtures/mongo_change_events.jsonl).
    A naive ``cast('long')`` yields NULL on the non-long forms and
    silently breaks merge ordering and ts guards — so decode the typed
    struct, else parse the string form, else fall back to the cast, and
    FAIL-STOP (raise_error) if nothing decodes: emitting unordered ops is
    the one thing a replicator must never do (reference fail-stop stance,
    mongo.go:183).
    """
    if (
        dtype is not None
        and dtype.typeName() == "struct"
        and "$timestamp" in dtype.fieldNames()
    ):
        tsi = ct["$timestamp"]
        packed = F.when(
            tsi.isNotNull(),
            F.shiftleft(tsi["t"].cast("long"), 32).bitwiseOR(
                tsi["i"].cast("long")
            ),
        )
        return F.when(
            packed.isNull(),
            F.raise_error(F.lit("momyre: undecodable clusterTime struct"))
            .cast("long"),
        ).otherwise(packed)
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


def _field_type(stream: DataFrame, *path: str):
    """DataType at a dotted path in the stream schema, or None."""
    dt = stream.schema
    for name in path:
        if not hasattr(dt, "fieldNames") or name not in dt.fieldNames():
            return None
        dt = dt[name].dataType
    return dt


# BSON scalar wrappers from MongoDB Extended JSON v2: a struct whose single
# field is one of these IS a scalar (ObjectId -> 24-hex, Long/Decimal ->
# digit string, Date -> ISO text) — exactly the reference's value
# conversions (ObjectID->hex mysql.go:400-401; passthrough mysql.go:398-406).
_BSON_WRAPPERS = {"$oid", "$numberLong", "$numberDecimal", "$numberInt", "$date"}


def _unwrap_bson(col, dt):
    """Peel extended-JSON scalar wrappers ({$oid: x} -> x), possibly nested
    ({$date: {$numberLong: x}} -> x). Returns (column, datatype)."""
    from pyspark.sql.types import StructType

    while (
        isinstance(dt, StructType)
        and len(dt.fields) == 1
        and dt.fields[0].name in _BSON_WRAPPERS
    ):
        col = col[dt.fields[0].name]
        dt = dt.fields[0].dataType
    return col, dt


def _flatten_struct_json(col, dtype) -> F.Column:
    """Struct column -> JSON text of the FLATTENED document.

    Mirrors the reference's obj2plain (mongo.go:141-155) at plan time:
    nested structs flatten to '_'-joined names, dotted field names (the
    connector's updatedFields uses literal 'cfg.pub' keys) rewrite '.'->'_'
    (col4sql, mysql.go:54-56), extended-JSON scalar wrappers unwrap to
    scalars, arrays/maps JSON-serialize whole, scalars cast to string.
    Pure column expressions — no Python in the stream.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    names: list[str] = []
    values: list[F.Column] = []

    def walk(prefix: str, c, dt: StructType) -> None:
        for f in dt.fields:
            name = (prefix + f.name).replace(".", "_")
            child, cdt = _unwrap_bson(c[f.name], f.dataType)
            if isinstance(cdt, StructType):
                walk(name + "_", child, cdt)
            elif isinstance(cdt, (ArrayType, MapType)):
                names.append(name)
                values.append(F.to_json(child))
            else:
                names.append(name)
                values.append(child.cast("string"))

    walk("", col, dtype)
    if not names:
        return F.lit("{}")
    return F.to_json(
        F.map_from_arrays(
            F.array(*[F.lit(n) for n in names]), F.array(*values)
        )
    )


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

    Schema-form tolerance (the connector surfaces documents either as JSON
    text or as inferred structs, depending on configuration):
    - struct-typed ``fullDocument``/``updatedFields`` are flattened at plan
      time (nested structs -> '_'-joined names, reference obj2plain);
    - string-typed ``updatedFields`` keys have '.'-paths rewritten to '_'
      (col4sql parity) — string-typed ``fullDocument`` must already be flat
      (raw nested JSON needs the opslog decoder's Python flatten);
    - ``updateDescription.truncatedArrays``: the post-image of a truncated
      array is NOT in the event. With a looked-up ``fullDocument`` present
      the update is decoded as a full replace (correct last-write state);
      without one the row fail-stops — emitting a stale array silently is
      data corruption.
    """
    upd_t = _field_type(stream, "updateDescription", "updatedFields")
    if upd_t is not None and upd_t.typeName() == "struct":
        # A struct-typed updatedFields is the UNION of fields across all
        # events (schema inference), so fields this event didn't set are
        # null — they must be dropped or every patch would null its
        # siblings. Cost: an explicit {$set: {f: null}} is indistinguishable
        # from absent in struct form and is lost; removedFields still
        # carries explicit nulls, and the JSON-string event form (connector
        # outputExtendedJson) preserves set-to-null exactly.
        updated = F.map_filter(
            F.from_json(
                _flatten_struct_json(
                    F.col("updateDescription.updatedFields"), upd_t
                ),
                "map<string,string>",
            ),
            lambda _k, v: v.isNotNull(),
        )
    else:
        updated = F.transform_keys(
            F.from_json(
                F.col("updateDescription.updatedFields").cast("string"),
                "map<string,string>",
            ),
            lambda k, _v: F.replace(k, F.lit("."), F.lit("_")),
        )
    removed = F.coalesce(
        F.transform(
            F.col("updateDescription.removedFields"),
            lambda x: F.replace(x, F.lit("."), F.lit("_")),
        ),
        F.array().cast("array<string>"),
    )  # NULL removedFields must not null the whole merged payload map
    removed_nulls = F.map_from_arrays(
        removed, F.transform(removed, lambda _: F.lit(None).cast("string"))
    )

    full_t = _field_type(stream, "fullDocument")
    if full_t is not None and full_t.typeName() == "struct":
        full_doc = _flatten_struct_json(F.col("fullDocument"), full_t)
    else:
        full_doc = F.col("fullDocument").cast("string")

    trunc_t = _field_type(stream, "updateDescription", "truncatedArrays")
    has_trunc = (
        F.size(F.coalesce(
            F.col("updateDescription.truncatedArrays"),
            F.array().cast(trunc_t.simpleString() if trunc_t is not None else "array<string>"),
        )) > 0
        if trunc_t is not None
        else F.lit(False)
    )

    is_update = F.col("operationType") == "update"
    op = (
        F.when(F.col("operationType") == "insert", F.lit("insert"))
        .when(F.col("operationType") == "replace", F.lit("insert"))
        # truncated arrays + looked-up post-image -> decode as full replace
        .when(is_update & has_trunc & F.col("fullDocument").isNotNull(), F.lit("insert"))
        .when(is_update, F.lit("update"))
        .when(F.col("operationType") == "delete", F.lit("delete"))
    )
    update_payload = F.when(
        has_trunc & F.col("fullDocument").isNull(),
        F.raise_error(
            F.concat(
                F.lit("momyre: truncatedArrays without a fullDocument "
                      "post-image (configure fullDocument=updateLookup): key "),
                F.col("documentKey._id").cast("string"),
            )
        ).cast("string"),
    ).otherwise(F.to_json(F.map_concat(updated, removed_nulls)))
    payload = (
        F.when(op == "insert", F.coalesce(full_doc, F.lit("{}")))
        .when(is_update, update_payload)
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
    # documentKey._id arrives as a plain scalar or, under extended-JSON
    # schema inference, an {$oid: hex} struct -> unwrap to the 24-char hex
    # (reference ObjectID->hex, mysql.go:400-401)
    key_col, _ = _unwrap_bson(
        F.col("documentKey")["_id"],
        _field_type(stream, "documentKey", "_id"),
    )
    return stream.filter(op.isNotNull()).select(
        _decode_cluster_time(
            F.col("clusterTime"), _field_type(stream, "clusterTime")
        ).alias("ts"),
        F.lit(0).cast("long").alias("seq"),
        *tok_cols,
        F.substring_index(F.col("ns.coll"), ".", -1).alias("ns"),
        op.alias("op"),
        key_col.cast("string").alias("_id"),
        payload.alias("payload"),
    )
