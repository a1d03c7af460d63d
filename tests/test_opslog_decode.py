"""Oplog decode tests (C1-C9 parity, SURVEY.md §2.3)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row

from momyre_spark.operators.cdc import apply_ops
from momyre_spark.sources.opslog import (
    decode_entry,
    decode_oplog,
    flatten_doc,
    pack_ts,
)


def test_pack_ts():
    assert pack_ts(5, 2) == (5 << 32) | 2


def test_flatten_doc_nested_and_arrays():
    doc = {"a": 1, "cfg": {"pub": "x", "deep": {"v": 2}}, "arr": [1, 2]}
    assert flatten_doc(doc) == {"a": 1, "cfg_pub": "x", "cfg_deep_v": 2, "arr": [1, 2]}


def test_insert_decode_c1():
    ops = decode_entry(
        {"op": "i", "ns": "db.users", "ts": {"t": 7, "i": 1},
         "o": {"_id": "k1", "type": "admin", "cfg": {"pub": "p"}}}
    )
    assert ops == [{"ts": pack_ts(7, 1), "seq": 0, "ns": "users",
                    "op": "insert", "_id": "k1",
                    "payload": {"type": "admin", "cfg_pub": "p"}}]


def test_update_set_unset_decode_c2():
    ops = decode_entry(
        {"op": "u", "ns": "db.users", "ts": {"t": 7, "i": 2},
         "o": {"$set": {"email": "e@x", "cfg": {"pub": "q"}},
               "$unset": {"pubkey": True}},
         "o2": {"_id": "k1"}}
    )
    assert ops[0]["op"] == "update" and ops[0]["_id"] == "k1"
    assert ops[0]["payload"] == {"email": "e@x", "cfg_pub": "q", "pubkey": None}


def test_update_v2_diff_decode_c3_c4():
    ops = decode_entry(
        {"op": "u", "ns": "db.users", "ts": {"t": 8, "i": 1},
         "o": {"$v": 2, "diff": {
             "i": {"newf": 1},
             "u": {"email": "n@x"},
             "d": {"pubkey": False},
             "scfg": {"u": {"pub": "z"}, "sdeep": {"u": {"v": 9}}},
         }},
         "o2": {"_id": "k2"}}
    )
    assert ops[0]["payload"] == {
        "newf": 1, "email": "n@x", "pubkey": None,
        "cfg_pub": "z", "cfg_deep_v": 9,  # third level handled (beyond ref)
    }


def test_full_replace_decode_c5():
    ops = decode_entry(
        {"op": "u", "ns": "db.users", "ts": {"t": 9, "i": 1},
         "o": {"_id": "k3", "type": "fresh"}, "o2": {"_id": "k3"}}
    )
    assert ops[0]["op"] == "insert"  # replace resets the whole row
    assert ops[0]["payload"] == {"type": "fresh"}


def test_delete_decode_c6():
    ops = decode_entry(
        {"op": "d", "ns": "db.users", "ts": {"t": 9, "i": 2}, "o": {"_id": "k3"}}
    )
    assert ops == [{"ts": pack_ts(9, 2), "seq": 0, "ns": "users",
                    "op": "delete", "_id": "k3", "payload": {}}]


def test_noop_dropped_c7():
    assert decode_entry({"op": "n", "ns": "", "ts": {"t": 1, "i": 1}, "o": {}}) == []


def test_txn_unwrap_c8():
    ops = decode_entry(
        {"op": "c", "ns": "admin.$cmd", "ts": {"t": 11, "i": 1},
         "o": {"applyOps": [
             {"op": "i", "ns": "db.users", "o": {"_id": "t1", "type": "a"}},
             {"op": "d", "ns": "db.regs", "o": {"_id": "t2"}},
         ]}}
    )
    assert [o["op"] for o in ops] == ["insert", "delete"]
    assert all(o["ts"] == pack_ts(11, 1) for o in ops)  # outer ts stamped
    assert [o["seq"] for o in ops] == [0, 1]  # applyOps array order preserved
    assert [o["ns"] for o in ops] == ["users", "regs"]


def test_unknown_shapes_fail_stop():
    with pytest.raises(ValueError):
        decode_entry({"op": "x", "ns": "db.t", "ts": {"t": 1, "i": 1}})
    with pytest.raises(ValueError):
        decode_entry({"op": "u", "ns": "db.t", "ts": {"t": 1, "i": 1},
                      "o": {"$weird": 1}, "o2": {"_id": "k"}})


def test_decode_oplog_to_final_state(spark):
    """Raw oplog entries -> decode -> CDC apply -> expected final state."""
    entries = [
        {"op": "i", "ns": "db.users", "ts": {"t": 1, "i": 1},
         "o": {"_id": "a", "type": "admin", "email": "a@x"}},
        {"op": "u", "ns": "db.users", "ts": {"t": 1, "i": 2},
         "o": {"$set": {"email": "a2@x"}}, "o2": {"_id": "a"}},
        {"op": "i", "ns": "db.users", "ts": {"t": 1, "i": 3},
         "o": {"_id": "b", "type": "user"}},
        {"op": "d", "ns": "db.users", "ts": {"t": 2, "i": 1}, "o": {"_id": "b"}},
        {"op": "c", "ns": "admin.$cmd", "ts": {"t": 3, "i": 1},
         "o": {"applyOps": [
             {"op": "u", "ns": "db.users",
              "o": {"$v": 2, "diff": {"u": {"type": "root"}}}, "o2": {"_id": "a"}},
         ]}},
        {"op": "i", "ns": "db.ignored", "ts": {"t": 4, "i": 1},
         "o": {"_id": "zz", "x": 1}},
    ]
    raw = spark.createDataFrame([Row(entry=json.dumps(e)) for e in entries])
    ops = decode_oplog(raw, tables=["users"])
    final = apply_ops(
        ops, {"type": "string", "email": "string"}, key="_id",
        order=("ts", "seq")
    )
    state = {r["_id"]: (r["type"], r["email"]) for r in final.collect()}
    assert state == {"a": ("root", "a2@x")}


def test_txn_same_key_applies_in_array_order(spark):
    """A txn inserting then updating the SAME key must converge to the
    update's state — ts ties (identical outer T<<32|I) are broken by seq
    (applyOps array position), matching the reference's strict in-order
    apply (mongo.go:428-454)."""
    entry = {"op": "c", "ns": "admin.$cmd", "ts": {"t": 20, "i": 1},
             "o": {"applyOps": [
                 {"op": "i", "ns": "db.users", "o": {"_id": "k", "v": "first"}},
                 {"op": "u", "ns": "db.users",
                  "o": {"$set": {"v": "second"}}, "o2": {"_id": "k"}},
                 {"op": "u", "ns": "db.users",
                  "o": {"$set": {"v": "third"}}, "o2": {"_id": "k"}},
             ]}}
    norm = decode_entry(entry)
    assert [o["seq"] for o in norm] == [0, 1, 2]
    raw = spark.createDataFrame([Row(entry=json.dumps(entry))])
    ops = decode_oplog(raw, tables=["users"])
    final = apply_ops(ops, {"v": "string"}, key="_id", order=("ts", "seq"))
    assert {r["_id"]: r["v"] for r in final.collect()} == {"k": "third"}


def test_quarantine_mode_routes_poison_to_dlq(spark):
    """One undecodable entry in a batch must not kill the job in
    quarantine mode — good ops decode, the poison row lands in the
    dead-letter split with its raw text and reason."""
    import json

    from momyre_spark.sources.opslog import decode_oplog, split_rejects

    good = json.dumps(
        {"ts": {"T": 10, "I": 1}, "ns": "db.users", "op": "i",
         "o": {"_id": "a1", "x": 1}}
    )
    poison = json.dumps(
        {"ts": {"T": 11, "I": 1}, "ns": "db.users", "op": "zz", "o": {}}
    )
    raw = spark.createDataFrame([(good,), (poison,)], "entry string")
    ops, rejects = split_rejects(
        decode_oplog(raw, tables=["users"], on_error="quarantine")
    )
    assert [r["op"] for r in ops.collect()] == ["insert"]
    (rej,) = rejects.collect()
    assert "unknown oplog op" in rej["error"] and '"zz"' in rej["payload"]


def test_quarantine_mode_clean_batch_matches_fail_mode(spark):
    import json

    from momyre_spark.sources.opslog import decode_oplog, split_rejects

    entries = [
        json.dumps({"ts": {"T": 9, "I": i}, "ns": "db.users", "op": "i",
                    "o": {"_id": f"k{i}", "x": i}})
        for i in range(5)
    ]
    raw = spark.createDataFrame([(e,) for e in entries], "entry string")
    strict = decode_oplog(raw, tables=["users"]).collect()
    ops, rejects = split_rejects(
        decode_oplog(raw, tables=["users"], on_error="quarantine")
    )
    assert rejects.count() == 0
    assert sorted(map(tuple, ops.collect())) == sorted(map(tuple, strict))


def test_fail_mode_still_raises_on_poison(spark):
    import json

    import pytest as _pytest

    from momyre_spark.sources.opslog import decode_oplog

    poison = json.dumps({"ts": {"T": 1, "I": 1}, "ns": "db.t", "op": "zz"})
    raw = spark.createDataFrame([(poison,)], "entry string")
    with _pytest.raises(Exception):
        decode_oplog(raw).collect()
