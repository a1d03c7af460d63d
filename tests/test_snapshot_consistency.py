"""Snapshot-then-stream consistency WITHOUT the reference's fsync write lock.

The reference pauses all source writes during the initial snapshot
(pauseWrites/unpauseWrites, mongo.go:618-675). The engine's documented
strategy (engine.py): capture the resume token BEFORE the snapshot, snapshot
a *moving* source, then replay the overlap — idempotent merge absorbs ops
the snapshot already included (the reference itself relies on this replay
safety for partial resync, run.go:210-212).

This test simulates the race: the source keeps mutating while the snapshot
is taken, the snapshot reflects some arbitrary mid-stream state, and
replaying from the pre-snapshot token must still converge the sink to the
source's final state.
"""

from __future__ import annotations

import functools
import json
import sqlite3

from momyre_spark.sinks.jdbc_upsert import upsert_dataframe
from momyre_spark.spec import parse_spec
from momyre_spark.streaming.pipeline import apply_ops_microbatch
from tests.cdc_fixture import FIELDS, OPS_SCHEMA, make_ops, ops_as_rows, sequential_apply

SPEC_YAML = """
tables:
  users:
    type: varchar(100)
    email: varchar(100)
    pubkey: varchar(100)
"""


def test_snapshot_of_moving_source_plus_overlap_replay(spark, tmp_path):
    ops = sorted(make_ops(n_keys=80), key=lambda o: o["ts"])
    # resume token taken at 60% of the log; the "snapshot" is read later,
    # while writes continued — it reflects the state at 80% of the log
    token_idx = int(len(ops) * 0.6)
    snap_idx = int(len(ops) * 0.8)
    token_ts = ops[token_idx - 1]["ts"]
    snapshot_state = sequential_apply(ops[:snap_idx])

    path = str(tmp_path / "snap.db")
    factory = functools.partial(sqlite3.connect, path, timeout=60)
    conn = factory()
    conn.execute(
        'CREATE TABLE "users" ("_id" varchar(24) PRIMARY KEY, '
        '"type" varchar(100), "email" varchar(100), "pubkey" varchar(100))'
    )
    conn.commit(); conn.close()

    # 1) snapshot upsert (mid-stream state)
    snap_rows = [
        (k, v["type"], v["email"], v["pubkey"]) for k, v in snapshot_state.items()
    ]
    snap_df = spark.createDataFrame(
        snap_rows, "`_id` string, type string, email string, pubkey string"
    )
    upsert_dataframe(snap_df, connection_factory=factory,
                     dialect_name="sqlite", table="users", num_partitions=1)

    # 2) stream everything after the PRE-snapshot token, in microbatches —
    # the ops in (token, snap_idx] are the overlap the snapshot already saw
    spec = parse_spec(SPEC_YAML)
    replay = [o for o in ops if o["ts"] > token_ts]
    size = max(1, len(replay) // 3)
    for bid, i in enumerate(range(0, len(replay), size)):
        batch = spark.createDataFrame(
            ops_as_rows(replay[i : i + size]), OPS_SCHEMA
        )
        apply_ops_microbatch(
            batch, bid, spec, connection_factory=factory,
            dialect_name="sqlite", num_partitions=1,
        )

    conn = factory()
    got = {
        r[0]: dict(zip(FIELDS, r[1:]))
        for r in conn.execute(
            'SELECT "_id","type","email","pubkey" FROM "users"'
        ).fetchall()
    }
    conn.close()
    assert got == sequential_apply(ops)
