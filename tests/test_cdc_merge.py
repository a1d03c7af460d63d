"""CDC merge semantics vs the sequential reference applier (FIXTURES.md §C)."""

from __future__ import annotations

from pyspark.sql import functions as F

from momyre_spark.operators.cdc import apply_ops, merge_ops_microbatch
from tests.cdc_fixture import FIELDS, OPS_SCHEMA, make_ops, ops_as_rows, sequential_apply

FIELD_TYPES = {f: "string" for f in FIELDS}


def _spark_final_state(spark, ops):
    df = spark.createDataFrame(ops_as_rows(ops), OPS_SCHEMA)
    out = apply_ops(df, FIELD_TYPES, key="_id", order=("ts",))
    return {r["_id"]: {f: r[f] for f in FIELDS} for r in out.collect()}


def test_apply_ops_matches_sequential_reference(spark):
    ops = make_ops()
    assert _spark_final_state(spark, ops) == sequential_apply(ops)


def test_apply_ops_replay_idempotent(spark):
    """Re-applying a suffix of the log changes nothing (run.go:210-212)."""
    ops = make_ops()
    replayed = ops + [o for o in ops if o["ts"] % 3 == 0]  # duplicate a subset
    assert _spark_final_state(spark, replayed) == sequential_apply(ops)


def test_apply_ops_shuffled_input_order_insensitive(spark):
    """The operator must not depend on input row order (it will not hold
    after a shuffle at scale)."""
    import random

    ops = make_ops(n_keys=60)
    shuffled = ops[:]
    random.Random(7).shuffle(shuffled)
    assert _spark_final_state(spark, shuffled) == sequential_apply(ops)


def test_set_to_null_vs_absent(spark):
    ops = [
        {"ts": 1, "ns": "users", "op": "insert", "_id": "k1",
         "payload": {"type": "admin", "email": "a@b", "pubkey": "p"}},
        {"ts": 2, "ns": "users", "op": "update", "_id": "k1",
         "payload": {"email": None}},  # explicit null: email cleared
        {"ts": 3, "ns": "users", "op": "update", "_id": "k1",
         "payload": {"type": "user"}},  # absent fields survive
    ]
    state = _spark_final_state(spark, ops)
    assert state == {"k1": {"type": "user", "email": None, "pubkey": "p"}}


def test_update_before_any_insert_is_noop(spark):
    ops = [
        {"ts": 1, "ns": "users", "op": "update", "_id": "zz",
         "payload": {"type": "ghost"}},
    ]
    assert _spark_final_state(spark, ops) == {}


# ------------------------------------------------------------------
# microbatch action semantics
# ------------------------------------------------------------------
def _actions(spark, ops):
    df = spark.createDataFrame(ops_as_rows(ops), OPS_SCHEMA)
    out = merge_ops_microbatch(df, FIELD_TYPES, key="_id", order=("ts",))
    return {r["_id"]: r.asDict() for r in out.collect()}


def test_microbatch_update_only_becomes_patch(spark):
    acts = _actions(spark, [
        {"ts": 1, "ns": "users", "op": "update", "_id": "k",
         "payload": {"email": "new@x"}},
        {"ts": 2, "ns": "users", "op": "update", "_id": "k",
         "payload": {"pubkey": "pk2"}},
    ])
    a = acts["k"]
    assert a["__action"] == "patch"
    assert sorted(a["__present"]) == ["email", "pubkey"]
    assert a["email"] == "new@x" and a["pubkey"] == "pk2" and a["type"] is None


def test_microbatch_insert_wins_and_is_authoritative(spark):
    acts = _actions(spark, [
        {"ts": 1, "ns": "users", "op": "update", "_id": "k",
         "payload": {"email": "old@x"}},
        {"ts": 2, "ns": "users", "op": "insert", "_id": "k",
         "payload": {"type": "admin"}},  # email/pubkey absent -> NULL
        {"ts": 3, "ns": "users", "op": "update", "_id": "k",
         "payload": {"pubkey": "pk"}},
    ])
    a = acts["k"]
    assert a["__action"] == "upsert"
    assert a["type"] == "admin" and a["email"] is None and a["pubkey"] == "pk"


def test_microbatch_delete_then_update_stays_deleted(spark):
    acts = _actions(spark, [
        {"ts": 1, "ns": "users", "op": "insert", "_id": "k",
         "payload": {"type": "u"}},
        {"ts": 2, "ns": "users", "op": "delete", "_id": "k", "payload": {}},
        {"ts": 3, "ns": "users", "op": "update", "_id": "k",
         "payload": {"type": "ghost"}},
    ])
    assert list(acts) == ["k"]
    assert acts["k"]["__action"] == "delete"


def test_microbatch_delete_then_reinsert(spark):
    acts = _actions(spark, [
        {"ts": 1, "ns": "users", "op": "delete", "_id": "k", "payload": {}},
        {"ts": 2, "ns": "users", "op": "insert", "_id": "k",
         "payload": {"type": "fresh"}},
    ])
    assert acts["k"]["__action"] == "upsert" and acts["k"]["type"] == "fresh"


def test_microbatch_stream_equals_sequential(spark):
    """Splitting the log into consecutive microbatches and applying each
    batch's actions onto a dict-sink must equal the sequential reference."""
    ops = make_ops(n_keys=120)
    ops_sorted = sorted(ops, key=lambda o: o["ts"])
    chunks = [ops_sorted[i::1] for i in (0,)]  # placeholder, real chunks below
    size = max(1, len(ops_sorted) // 7)
    chunks = [ops_sorted[i : i + size] for i in range(0, len(ops_sorted), size)]

    state: dict[str, dict] = {}
    for chunk in chunks:
        for key, a in _actions(spark, chunk).items():
            if a["__action"] == "delete":
                state.pop(key, None)
            elif a["__action"] == "upsert":
                state[key] = {f: a[f] for f in FIELDS}
            else:  # patch
                if key in state:
                    for f in a["__present"]:
                        state[key][f] = a[f]
    assert state == sequential_apply(ops)


def test_apply_ops_empty_input(spark):
    df = spark.createDataFrame([], OPS_SCHEMA)
    out = apply_ops(df, FIELD_TYPES, key="_id", order=("ts",))
    assert out.count() == 0
    assert out.columns == ["_id"] + FIELDS


def test_merge_microbatch_empty_input(spark):
    df = spark.createDataFrame([], OPS_SCHEMA)
    out = merge_ops_microbatch(df, FIELD_TYPES, key="_id", order=("ts",))
    assert out.count() == 0
    assert out.columns == ["_id", "__action", "__present"] + FIELDS


def test_apply_ops_fail_stop_on_uncastable_value(spark):
    """ANSI casts make malformed payload values fail the job — the engine's
    analog of the reference's log.Fatalln fail-stop (mongo.go:183 et al.):
    a replicator must never silently corrupt data."""
    import pytest as _pytest
    from pyspark.errors import PySparkException

    ops = [
        {"ts": 1, "ns": "users", "op": "insert", "_id": "k",
         "payload": {"n": "not-a-number"}},
    ]
    df = spark.createDataFrame(ops_as_rows(ops), OPS_SCHEMA)
    out = apply_ops(df, {"n": "bigint"}, key="_id", order=("ts",))
    with _pytest.raises(PySparkException, match="CAST_INVALID_INPUT"):
        out.collect()
