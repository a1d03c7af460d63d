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


def _mk_tomb(tmp_path):
    path = str(tmp_path / "tomb.db")
    factory = functools.partial(sqlite3.connect, path, timeout=60)
    conn = factory()
    conn.execute(
        'CREATE TABLE "users" ("_id" varchar(24) PRIMARY KEY, '
        '"type" varchar(100), "email" varchar(100), "pubkey" varchar(100), '
        '"_seq" bigint, "_deleted" tinyint)'
    )
    conn.commit(); conn.close()
    return factory


def _apply_tomb(spark, factory, spec, rows, batch_id):
    batch = spark.createDataFrame(rows, OPS_SCHEMA)
    apply_ops_microbatch(
        batch, batch_id, spec, connection_factory=factory,
        dialect_name="sqlite", num_partitions=1, ts_guard_col="_seq",
        tombstone_col="_deleted",
    )


def _tomb_state(factory):
    conn = factory()
    try:
        cur = conn.execute('SELECT "_id","type","_seq","_deleted" FROM "users"')
        return {r[0]: (r[1], r[2], r[3]) for r in cur.fetchall()}
    finally:
        conn.close()


def test_tombstone_closes_resurrection_window(spark, tmp_path):
    """THE scenario physical guarded deletes get wrong (pipeline.py
    docstring): delete(ts=30) applied, then a stale upsert(ts=20) replays.
    A physical delete dropped the high-water mark and the stale row
    resurrects; the tombstone keeps the mark and rejects it."""
    factory = _mk_tomb(tmp_path)
    spec = parse_spec(SPEC_YAML)
    _apply_tomb(spark, factory, spec, [
        (10, "users", "insert", "k", json.dumps({"type": "v10"})),
    ], batch_id=0)
    _apply_tomb(spark, factory, spec, [
        (30, "users", "delete", "k", "{}"),
    ], batch_id=1)
    assert _tomb_state(factory)["k"][2] == 1  # flagged, key + mark kept
    # stale upsert arrives after the newer delete: must stay deleted
    _apply_tomb(spark, factory, spec, [
        (20, "users", "insert", "k", json.dumps({"type": "stale"})),
    ], batch_id=2)
    assert _tomb_state(factory)["k"] == ("v10", 30, 1)
    # genuinely newer upsert revives the key
    _apply_tomb(spark, factory, spec, [
        (40, "users", "insert", "k", json.dumps({"type": "v40"})),
    ], batch_id=3)
    assert _tomb_state(factory)["k"] == ("v40", 40, 0)


def test_tombstone_delete_of_absent_key_then_stale_upsert(spark, tmp_path):
    factory = _mk_tomb(tmp_path)
    spec = parse_spec(SPEC_YAML)
    # delete for a key never upserted (its insert is still in flight)
    _apply_tomb(spark, factory, spec, [
        (30, "users", "delete", "k", "{}"),
    ], batch_id=0)
    assert _tomb_state(factory)["k"][2] == 1
    # the delayed original insert (older ts) lands: rejected
    _apply_tomb(spark, factory, spec, [
        (10, "users", "insert", "k", json.dumps({"type": "late"})),
    ], batch_id=1)
    assert _tomb_state(factory)["k"][2] == 1


def test_purge_tombstones(spark, tmp_path):
    from momyre_spark.sinks.jdbc_upsert import purge_tombstones

    factory = _mk_tomb(tmp_path)
    spec = parse_spec(SPEC_YAML)
    _apply_tomb(spark, factory, spec, [
        (10, "users", "insert", "a", json.dumps({"type": "x"})),
        (30, "users", "delete", "a", "{}"),
        (100, "users", "insert", "b", json.dumps({"type": "y"})),
        (200, "users", "delete", "b", "{}"),
        (150, "users", "insert", "c", json.dumps({"type": "live"})),
    ], batch_id=0)
    # retention horizon 100: only a's tombstone (mark 30) is old enough
    n = purge_tombstones(
        connection_factory=factory, dialect_name="sqlite", table="users",
        tombstone_col="_deleted", ts_guard_col="_seq", older_than=100,
    )
    assert n == 1
    st = _tomb_state(factory)
    assert "a" not in st and st["b"][2] == 1 and st["c"][2] == 0


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
