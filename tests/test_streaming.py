"""Structured Streaming CDC pipeline end-to-end on sqlite.

Ops arrive as parquet files in a stream-watched directory (the test stand-in
for a change-stream source); the foreachBatch apply must converge the sink
to the sequential reference state, across multiple microbatches, with
exactly-once apply under batch replay.
"""

from __future__ import annotations

import functools
import sqlite3
import time

from momyre_spark.spec import parse_spec
from momyre_spark.streaming.pipeline import apply_ops_microbatch, start_cdc_stream
from tests.cdc_fixture import FIELDS, OPS_SCHEMA, make_ops, ops_as_rows, sequential_apply

SPEC_YAML = """
tables:
  users:
    type: varchar(100)
    email: varchar(100)
    pubkey: varchar(100)
"""


def _mk_sink(tmp_path):
    path = str(tmp_path / "stream_sink.db")
    factory = functools.partial(sqlite3.connect, path, timeout=60)
    conn = factory()
    conn.execute(
        'CREATE TABLE "users" ("_id" varchar(24) PRIMARY KEY, '
        '"type" varchar(100), "email" varchar(100), "pubkey" varchar(100))'
    )
    conn.commit()
    conn.close()
    return factory


def _sink_state(factory):
    conn = factory()
    try:
        cur = conn.execute('SELECT "_id","type","email","pubkey" FROM "users"')
        return {r[0]: dict(zip(FIELDS, r[1:])) for r in cur.fetchall()}
    finally:
        conn.close()


def test_foreachbatch_apply_converges(spark, tmp_path):
    factory = _mk_sink(tmp_path)
    spec = parse_spec(SPEC_YAML)
    ops = sorted(make_ops(n_keys=90), key=lambda o: o["ts"])
    size = len(ops) // 4 + 1
    for bid, i in enumerate(range(0, len(ops), size)):
        batch = spark.createDataFrame(ops_as_rows(ops[i : i + size]), OPS_SCHEMA)
        apply_ops_microbatch(
            batch, bid, spec, connection_factory=factory,
            dialect_name="sqlite", num_partitions=1,
        )
    assert _sink_state(factory) == sequential_apply(ops)


def test_foreachbatch_replay_is_noop(spark, tmp_path):
    factory = _mk_sink(tmp_path)
    spec = parse_spec(SPEC_YAML)
    ops = sorted(make_ops(n_keys=30), key=lambda o: o["ts"])
    batch = spark.createDataFrame(ops_as_rows(ops), OPS_SCHEMA)
    for _ in range(2):  # deliver the same batch id twice (crash-replay)
        apply_ops_microbatch(
            batch, 0, spec, connection_factory=factory,
            dialect_name="sqlite", num_partitions=1,
        )
    assert _sink_state(factory) == sequential_apply(ops)


def _write_ops_in_order(spark, ops_chunk, src_dir, n_files, mtime_base):
    """Land ``ops_chunk`` as ``n_files`` sequential single-file parquet
    writes with STRICTLY INCREASING mtimes matching ts order.

    The CDC contract models an in-order transport (the reference tails the
    oplog sequentially); this parquet-dir stand-in must deliver the same
    order. One bulk 32-partition write does NOT guarantee that:
    FileStreamSource orders new files by modification time, all parts of
    one write commit share an mtime, and the tie falls back to the
    filesystem's listing order — which ext4 returns hash-ordered, so an
    ``update``/``delete`` can land a batch BEFORE its key's ``insert``
    (observed on this host; path-sorted listings on earlier hosts hid it).
    Explicit per-file mtimes make the arrival order deterministic on any
    filesystem."""
    import glob
    import math
    import os

    chunk = math.ceil(len(ops_chunk) / n_files) or 1
    for i in range(0, len(ops_chunk), chunk):
        seen = set(glob.glob(f"{src_dir}/part-*.parquet"))
        spark.createDataFrame(
            ops_as_rows(ops_chunk[i : i + chunk]), OPS_SCHEMA
        ).repartition(1).write.parquet(src_dir, mode="append")
        mtime_base += 2
        for f in set(glob.glob(f"{src_dir}/part-*.parquet")) - seen:
            os.utime(f, (mtime_base, mtime_base))
    return mtime_base


def test_streaming_query_end_to_end(spark, tmp_path):
    factory = _mk_sink(tmp_path)
    spec = parse_spec(SPEC_YAML)
    ops = sorted(make_ops(n_keys=60), key=lambda o: o["ts"])

    src_dir = str(tmp_path / "ops_in")
    ckpt_dir = str(tmp_path / "ckpt")
    half = len(ops) // 2
    # mtimes start a minute in the past so every file is inside the
    # source's maxFileAge window yet strictly ordered
    mtime = _write_ops_in_order(
        spark, ops[:half], src_dir, n_files=8, mtime_base=time.time() - 60
    )

    stream = (
        spark.readStream.schema(OPS_SCHEMA)
        .option("maxFilesPerTrigger", "4")
        .parquet(src_dir)
    )
    q = start_cdc_stream(
        stream, spec, connection_factory=factory, dialect_name="sqlite",
        checkpoint_dir=ckpt_dir, num_partitions=1,
        trigger={"processingTime": "1 second"},
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and _sink_state(factory) != sequential_apply(ops[:half]):
            time.sleep(1)
        assert _sink_state(factory) == sequential_apply(ops[:half])

        # late arrivals: the rest of the log lands as new ordered files
        _write_ops_in_order(
            spark, ops[half:], src_dir, n_files=8, mtime_base=mtime
        )
        expected = sequential_apply(ops)
        deadline = time.time() + 60  # phase-2 budget, not shared with phase 1
        while time.time() < deadline and _sink_state(factory) != expected:
            time.sleep(1)
        assert _sink_state(factory) == expected
    finally:
        q.stop()


def test_multi_table_routing(spark, tmp_path):
    """Ops for two tables in one stream route to their own sinks."""
    path = str(tmp_path / "multi.db")
    factory = functools.partial(sqlite3.connect, path, timeout=60)
    conn = factory()
    for t in ("users", "regs"):
        conn.execute(
            f'CREATE TABLE "{t}" ("_id" varchar(24) PRIMARY KEY, '
            '"type" varchar(100), "email" varchar(100), "pubkey" varchar(100))'
        )
    conn.commit(); conn.close()

    spec = parse_spec(
        "tables:\n"
        "  users: {type: varchar(100), email: varchar(100), pubkey: varchar(100)}\n"
        "  regs: {type: varchar(100), email: varchar(100), pubkey: varchar(100)}\n"
    )
    import json as _json

    rows = [
        (1, "users", "insert", "u1", _json.dumps({"type": "a"})),
        (2, "regs", "insert", "r1", _json.dumps({"type": "b"})),
        (3, "users", "update", "u1", _json.dumps({"email": "u@x"})),
        (4, "regs", "delete", "r1", "{}"),
        (5, "regs", "insert", "r2", _json.dumps({"type": "c"})),
    ]
    batch = spark.createDataFrame(rows, OPS_SCHEMA)
    apply_ops_microbatch(
        batch, 0, spec, connection_factory=factory,
        dialect_name="sqlite", num_partitions=1,
    )
    conn = factory()
    users = conn.execute('SELECT "_id","type","email" FROM "users"').fetchall()
    regs = conn.execute('SELECT "_id","type" FROM "regs"').fetchall()
    conn.close()
    assert users == [("u1", "a", "u@x")]
    assert regs == [("r2", "c")]
