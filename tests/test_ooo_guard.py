"""Out-of-order cross-batch delivery: sequence-guarded writes converge to
last-writer-wins regardless of batch arrival order."""

from __future__ import annotations

import functools
import json
import sqlite3

from momyre_spark.spec import parse_spec
from momyre_spark.streaming.pipeline import apply_ops_microbatch
from tests.cdc_fixture import OPS_SCHEMA

SPEC_YAML = """
tables:
  users:
    type: varchar(100)
    email: varchar(100)
    pubkey: varchar(100)
"""


def _mk(tmp_path):
    path = str(tmp_path / "ooo.db")
    factory = functools.partial(sqlite3.connect, path, timeout=60)
    conn = factory()
    conn.execute(
        'CREATE TABLE "users" ("_id" varchar(24) PRIMARY KEY, '
        '"type" varchar(100), "email" varchar(100), "pubkey" varchar(100), '
        '"_seq" bigint)'
    )
    conn.commit(); conn.close()
    return factory


def _apply(spark, factory, spec, rows, batch_id):
    batch = spark.createDataFrame(rows, OPS_SCHEMA)
    apply_ops_microbatch(
        batch, batch_id, spec, connection_factory=factory,
        dialect_name="sqlite", num_partitions=1, ts_guard_col="_seq",
    )


def _state(factory):
    conn = factory()
    try:
        cur = conn.execute('SELECT "_id","type","email","_seq" FROM "users"')
        return {r[0]: (r[1], r[2], r[3]) for r in cur.fetchall()}
    finally:
        conn.close()


def test_late_batch_cannot_regress_state(spark, tmp_path):
    factory = _mk(tmp_path)
    spec = parse_spec(SPEC_YAML)

    newer = [
        (10, "users", "insert", "k", json.dumps({"type": "v10", "email": "new@x"})),
        (11, "users", "update", "k", json.dumps({"email": "newer@x"})),
    ]
    older = [
        (1, "users", "insert", "k", json.dumps({"type": "v1", "email": "old@x"})),
        (2, "users", "update", "k", json.dumps({"email": "old2@x"})),
    ]
    # newer data lands FIRST (batch 0), the delayed older range arrives later
    _apply(spark, factory, spec, newer, batch_id=0)
    _apply(spark, factory, spec, older, batch_id=1)
    assert _state(factory) == {"k": ("v10", "newer@x", 11)}

    # in-order arrival produces the same state (convergence)
    sub = tmp_path / "b"
    sub.mkdir(exist_ok=True)
    factory2 = _mk(sub)
    _apply(spark, factory2, spec, older, batch_id=0)
    _apply(spark, factory2, spec, newer, batch_id=1)
    assert _state(factory2) == {"k": ("v10", "newer@x", 11)}


def test_late_delete_cannot_remove_newer_row(spark, tmp_path):
    factory = _mk(tmp_path)
    spec = parse_spec(SPEC_YAML)
    _apply(spark, factory, spec, [
        (20, "users", "insert", "k", json.dumps({"type": "fresh"})),
    ], batch_id=0)
    # stale delete from an earlier point in the log arrives late: no-op
    _apply(spark, factory, spec, [
        (5, "users", "delete", "k", "{}"),
    ], batch_id=1)
    assert "k" in _state(factory)
    # a genuinely newer delete works
    _apply(spark, factory, spec, [
        (30, "users", "delete", "k", "{}"),
    ], batch_id=2)
    assert _state(factory) == {}


def test_late_patch_guarded(spark, tmp_path):
    factory = _mk(tmp_path)
    spec = parse_spec(SPEC_YAML)
    _apply(spark, factory, spec, [
        (50, "users", "insert", "k", json.dumps({"type": "cur", "email": "c@x"})),
    ], batch_id=0)
    # stale patch: must not clobber
    _apply(spark, factory, spec, [
        (7, "users", "update", "k", json.dumps({"email": "stale@x"})),
    ], batch_id=1)
    assert _state(factory)["k"][1] == "c@x"
    # fresh patch applies and advances the high-water mark
    _apply(spark, factory, spec, [
        (60, "users", "update", "k", json.dumps({"email": "f@x"})),
    ], batch_id=2)
    assert _state(factory)["k"] == ("cur", "f@x", 60)
