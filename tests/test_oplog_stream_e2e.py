"""Full CDC path end-to-end: raw Mongo-oplog JSON files streamed -> C1-C9
decode -> microbatch merge -> transactional sqlite apply.

This is the whole reference program (§3.2) in one test: the only difference
from production is the physical source (files vs a live change stream).
"""

from __future__ import annotations

import functools
import json
import sqlite3
import time

from pyspark.sql import Row

from momyre_spark.sources.opslog import decode_oplog
from momyre_spark.spec import parse_spec
from momyre_spark.streaming.pipeline import start_cdc_stream

SPEC_YAML = """
tables:
  users:
    type: varchar(100)
    cfg.pub: varchar(100)
"""


def _entry(op, ts_i, **kw):
    e = {"op": op, "ts": {"t": 1, "i": ts_i}, **kw}
    return json.dumps(e)


def test_raw_oplog_stream_to_sink(spark, tmp_path):
    path = str(tmp_path / "sink.db")
    factory = functools.partial(sqlite3.connect, path, timeout=60)
    conn = factory()
    conn.execute(
        'CREATE TABLE "users" ("_id" varchar(24) PRIMARY KEY, '
        '"type" varchar(100), "cfg_pub" varchar(100))'
    )
    conn.commit(); conn.close()

    entries = [
        _entry("i", 1, ns="db.users",
               o={"_id": "a", "type": "admin", "cfg": {"pub": "k1"}}),
        _entry("i", 2, ns="db.users", o={"_id": "b", "type": "user"}),
        _entry("u", 3, ns="db.users", o={"$set": {"cfg": {"pub": "k2"}}},
               o2={"_id": "a"}),
        _entry("u", 4, ns="db.users",
               o={"$v": 2, "diff": {"u": {"type": "root"}}}, o2={"_id": "a"}),
        _entry("d", 5, ns="db.users", o={"_id": "b"}),
        _entry("c", 6, ns="admin.$cmd",
               o={"applyOps": [
                   {"op": "i", "ns": "db.users", "o": {"_id": "c", "type": "tx"}},
               ]}),
        _entry("i", 7, ns="db.ignored", o={"_id": "zz", "type": "x"}),
        _entry("n", 8, ns="", o={}),
    ]
    src = str(tmp_path / "oplog_in")
    spark.createDataFrame([Row(entry=e) for e in entries]).write.json(src)

    raw = spark.readStream.schema("entry string").json(src)
    ops = decode_oplog(raw, tables=["users"])
    spec = parse_spec(SPEC_YAML)
    q = start_cdc_stream(
        ops, spec, connection_factory=factory, dialect_name="sqlite",
        checkpoint_dir=str(tmp_path / "ckpt"), num_partitions=1,
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)

    conn = factory()
    rows = {r[0]: (r[1], r[2]) for r in
            conn.execute('SELECT "_id","type","cfg_pub" FROM "users"').fetchall()}
    conn.close()
    assert rows == {
        "a": ("root", "k2"),   # insert + $set (nested flatten) + v2 diff
        "c": ("tx", None),     # from the unwrapped transaction
    }  # b deleted; db.ignored filtered; noop dropped


# ---------------------------------------------------------------------------
# Live-connector smoke (stretch): runs ONLY when a sandbox provides both the
# MongoDB Spark connector jar and a reachable server via MOMYRE_MONGO_URI.
# Everywhere else it skips loudly with the reason; the decode contract is
# pinned environment-independently by the golden change-event corpus
# (tests/fixtures/mongo_change_events.jsonl, test_mongo_decode.py).
# ---------------------------------------------------------------------------
def test_live_mongo_connector_smoke(spark):
    import os

    import pytest

    uri = os.environ.get("MOMYRE_MONGO_URI")
    if not uri:
        pytest.skip(
            "MOMYRE_MONGO_URI not set (MongoDB Spark connector jar absent "
            "in this sandbox); decode contract carried by the golden corpus"
        )
    from momyre_spark.sources.mongo import read_snapshot

    df = read_snapshot(spark, uri, "momyre_smoke", "probe")
    assert df.count() >= 0  # connectivity + schema inference round-trip
