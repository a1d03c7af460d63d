"""decode_change_stream unit tests — the production (connector) decode path,
exercised on a synthesized frame with the connector's change-stream schema."""

from __future__ import annotations

import json

from momyre_spark.sources.mongo import decode_change_stream

SCHEMA = (
    "operationType string, clusterTime long, "
    "ns struct<db:string, coll:string>, "
    "documentKey struct<_id:string>, "
    "fullDocument string, "
    "updateDescription struct<updatedFields:string, removedFields:array<string>>"
)


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_insert_replace_update_delete_decode(spark):
    df = _rows(spark, [
        ("insert", 1, ("db", "users"), ("k1",),
         json.dumps({"type": "admin"}), (None, None)),
        ("replace", 2, ("db", "users"), ("k1",),
         json.dumps({"type": "root"}), (None, None)),
        ("update", 3, ("db", "users"), ("k1",), None,
         (json.dumps({"email": "e@x"}), ["pubkey"])),
        ("delete", 4, ("db", "users"), ("k1",), None, (None, None)),
        ("drop", 5, ("db", "users"), (None,), None, (None, None)),  # non-data
    ])
    out = {r["ts"]: r.asDict() for r in decode_change_stream(df).collect()}
    assert len(out) == 4  # 'drop' filtered
    assert out[1]["op"] == "insert" and json.loads(out[1]["payload"]) == {"type": "admin"}
    assert out[2]["op"] == "insert"  # replace is a full reset
    assert out[3]["op"] == "update"
    assert json.loads(out[3]["payload"]) == {"email": "e@x", "pubkey": None}
    assert out[4]["op"] == "delete" and out[4]["payload"] == "{}"
    assert all(r["ns"] == "users" and r["_id"] == "k1" for r in out.values())


def test_update_with_no_removed_fields(spark):
    df = _rows(spark, [
        ("update", 9, ("db", "users"), ("k2",), None,
         (json.dumps({"type": "x"}), [])),
    ])
    [r] = decode_change_stream(df).collect()
    assert json.loads(r["payload"]) == {"type": "x"}


def test_update_with_null_removed_fields(spark):
    df = _rows(spark, [
        ("update", 10, ("db", "users"), ("k3",), None,
         (json.dumps({"type": "y"}), None)),
    ])
    [r] = decode_change_stream(df).collect()
    assert json.loads(r["payload"]) == {"type": "y"}
