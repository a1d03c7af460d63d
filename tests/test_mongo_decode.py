"""decode_change_stream unit tests — the production (connector) decode path,
exercised on a synthesized frame with the connector's change-stream schema."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

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


# --- documented connector change-event schema variants -----------------
# The connector's change events carry clusterTime in schema-inference-
# dependent forms and a resume token at `_id._data`; these fixtures pin the
# decode contract against the DOCUMENTED event shapes, not just the
# simplified long-typed one above.

EXT_SCHEMA = (
    "_id struct<_data:string>, "
    "operationType string, clusterTime string, "
    "ns struct<db:string, coll:string>, "
    "documentKey struct<_id:string>, "
    "fullDocument string, "
    "updateDescription struct<updatedFields:string, removedFields:array<string>>"
)


def _ext_ct(t, i):
    return json.dumps({"$timestamp": {"t": t, "i": i}})


def test_extended_json_cluster_time_packs_t_i(spark):
    df = spark.createDataFrame([
        (("tokA",), "insert", _ext_ct(7, 3), ("db", "users"), ("k1",),
         json.dumps({"type": "a"}), (None, None)),
    ], EXT_SCHEMA)
    [r] = decode_change_stream(df).collect()
    assert r["ts"] == (7 << 32) | 3  # packed exactly like the resume token
    assert r["tok"] == "tokA"


def test_undecodable_cluster_time_fails_stop(spark):
    import pytest

    df = spark.createDataFrame([
        (("tokB",), "insert", "garbage", ("db", "users"), ("k1",),
         json.dumps({"type": "a"}), (None, None)),
    ], EXT_SCHEMA)
    with pytest.raises(Exception, match="undecodable clusterTime"):
        decode_change_stream(df).collect()


def test_txn_events_ordered_by_resume_token(spark):
    """Events in one multi-document txn share clusterTime; the resume token
    (lexicographically monotonic) must break the tie so last-writer-wins
    matches the commit order."""
    from momyre_spark.operators.cdc import apply_ops

    ct = _ext_ct(9, 1)
    df = spark.createDataFrame([
        (("t01",), "insert", ct, ("db", "users"), ("k",),
         json.dumps({"v": "first"}), (None, None)),
        (("t02",), "update", ct, ("db", "users"), ("k",), None,
         (json.dumps({"v": "second"}), [])),
        (("t03",), "update", ct, ("db", "users"), ("k",), None,
         (json.dumps({"v": "third"}), [])),
    ], EXT_SCHEMA)
    ops = decode_change_stream(df)
    assert ops.columns[:3] == ["ts", "seq", "tok"]
    final = apply_ops(ops, {"v": "string"}, key="_id",
                      order=("ts", "seq", "tok"))
    assert {r["_id"]: r["v"] for r in final.collect()} == {"k": "third"}


def test_long_cluster_time_still_decodes(spark):
    df = _rows(spark, [
        ("insert", 42, ("db", "users"), ("k1",),
         json.dumps({"type": "a"}), (None, None)),
    ])
    [r] = decode_change_stream(df).collect()
    assert r["ts"] == 42 and r["seq"] == 0
    assert "tok" not in decode_change_stream(df).columns


# --- struct-typed event schemas (connector with inferred document schema) --

STRUCT_SCHEMA = (
    "_id struct<_data:string>, "
    "operationType string, clusterTime string, "
    "ns struct<db:string, coll:string>, "
    "documentKey struct<_id:string>, "
    "fullDocument struct<type:string, cfg:struct<pub:string, deep:struct<v:bigint>>, tags:array<string>>, "
    "updateDescription struct<updatedFields:struct<`cfg.pub`:string, email:string>, removedFields:array<string>>"
)


def test_struct_full_document_flattens_nested(spark):
    df = spark.createDataFrame([
        (("t1",), "insert", _ext_ct(5, 1), ("db", "users"), ("k1",),
         ("admin", ("pk", (9,)), ["x", "y"]), (None, None)),
    ], STRUCT_SCHEMA)
    [r] = decode_change_stream(df).collect()
    assert json.loads(r["payload"]) == {
        "type": "admin", "cfg_pub": "pk", "cfg_deep_v": "9",
        "tags": '["x","y"]',  # arrays JSON-serialize whole (reference §1.2)
    }


def test_struct_updated_fields_dotted_keys_rewrite(spark):
    df = spark.createDataFrame([
        (("t2",), "update", _ext_ct(5, 2), ("db", "users"), ("k1",), None,
         (("newpub", "e@x"), ["old.field"])),
    ], STRUCT_SCHEMA)
    [r] = decode_change_stream(df).collect()
    assert json.loads(r["payload"]) == {
        "cfg_pub": "newpub", "email": "e@x", "old_field": None,
    }


def test_string_updated_fields_dotted_keys_rewrite(spark):
    df = _rows(spark, [
        ("update", 11, ("db", "users"), ("k4",), None,
         (json.dumps({"cfg.pub": "z"}), [])),
    ])
    [r] = decode_change_stream(df).collect()
    assert json.loads(r["payload"]) == {"cfg_pub": "z"}


# --- truncatedArrays ------------------------------------------------------

TRUNC_SCHEMA = (
    "_id struct<_data:string>, "
    "operationType string, clusterTime string, "
    "ns struct<db:string, coll:string>, "
    "documentKey struct<_id:string>, "
    "fullDocument string, "
    "updateDescription struct<updatedFields:string, removedFields:array<string>, "
    "truncatedArrays:array<struct<field:string, newSize:int>>>"
)


def test_truncated_arrays_with_lookup_becomes_replace(spark):
    df = spark.createDataFrame([
        (("t3",), "update", _ext_ct(6, 1), ("db", "users"), ("k1",),
         json.dumps({"type": "post", "tags": "[1]"}),
         (json.dumps({"type": "post"}), [], [("tags", 1)])),
    ], TRUNC_SCHEMA)
    [r] = decode_change_stream(df).collect()
    assert r["op"] == "insert"  # full reset from the looked-up post-image
    assert json.loads(r["payload"])["tags"] == "[1]"


def test_truncated_arrays_without_lookup_fails_stop(spark):
    import pytest

    df = spark.createDataFrame([
        (("t4",), "update", _ext_ct(6, 2), ("db", "users"), ("k1",), None,
         (json.dumps({"type": "post"}), [], [("tags", 1)])),
    ], TRUNC_SCHEMA)
    with pytest.raises(Exception, match="truncatedArrays"):
        decode_change_stream(df).collect()


# --- golden corpus --------------------------------------------------------
# Checked-in change events in MongoDB Extended JSON v2 (the documented
# change-event wire shape for connector 10.x), loaded through Spark's own
# JSON schema inference — exactly how extended-JSON events land as structs.
# Pins: $timestamp struct clusterTime, $oid document keys, $numberLong
# unwrapping, dotted updatedFields, txn tie-break by resume token, and the
# two fail-stops.

_GOLDEN = os.path.join(
    os.path.dirname(__file__), "fixtures", "mongo_change_events.jsonl"
)


def _golden_cases():
    with open(_GOLDEN) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    return [r for r in rows if "name" in r]


def _golden_frame(spark, events):
    return spark.read.json(
        spark.sparkContext.parallelize([json.dumps(e) for e in events])
    )


def test_golden_corpus_decodes_to_expected_ops(spark):
    cases = [c for c in _golden_cases() if "event" in c]
    df = _golden_frame(spark, [c["event"] for c in cases])
    decoded = {r["tok"]: r.asDict() for r in decode_change_stream(df).collect()}
    for c in cases:
        tok = c["event"]["_id"]["_data"]
        if c["expect"] is None:  # non-data op, filtered
            assert tok not in decoded, c["name"]
            continue
        got = decoded[tok]
        exp = c["expect"]
        assert got["op"] == exp["op"], c["name"]
        assert got["_id"] == exp["_id"], c["name"]
        assert got["ns"] == exp["ns"], c["name"]
        assert got["ts"] == (exp["ts_t"] << 32) | exp["ts_i"], c["name"]
        assert json.loads(got["payload"]) == exp["payload"], c["name"]


def test_golden_txn_resume_token_breaks_clustertime_tie(spark):
    from momyre_spark.operators.cdc import apply_ops

    cases = [c for c in _golden_cases() if "event" in c]
    df = _golden_frame(spark, [c["event"] for c in cases])
    ops = decode_change_stream(df).filter(
        F.col("_id") == "65f1a2b3c4d5e6f7a8b9c0d2"
    )
    final = apply_ops(
        ops, {"name": "string"}, key="_id", order=("ts", "seq", "tok")
    )
    assert {r["_id"]: r["name"] for r in final.collect()} == {
        "65f1a2b3c4d5e6f7a8b9c0d2": "v3"
    }


@pytest.mark.parametrize(
    "case", [c for c in _golden_cases() if "error_event" in c],
    ids=lambda c: c["name"],
)
def test_golden_error_events_fail_stop(spark, case):
    df = _golden_frame(spark, [case["error_event"]])
    with pytest.raises(Exception, match=case["expect_error"]):
        decode_change_stream(df).collect()


def test_plain_update_with_trunc_schema_still_decodes(spark):
    df = spark.createDataFrame([
        (("t5",), "update", _ext_ct(6, 3), ("db", "users"), ("k1",), None,
         (json.dumps({"email": "e@x"}), [], None)),
    ], TRUNC_SCHEMA)
    [r] = decode_change_stream(df).collect()
    assert r["op"] == "update"
    assert json.loads(r["payload"]) == {"email": "e@x"}
