"""Restart-forever supervision: a stream whose first batch fails must
resume from the checkpoint and converge after restart (reference O5)."""

from __future__ import annotations

import functools
import json
import sqlite3

from pyspark.sql import Row

from momyre_spark.spec import parse_spec
from momyre_spark.streaming.pipeline import start_cdc_stream, supervise
from tests.cdc_fixture import OPS_SCHEMA

SPEC_YAML = "tables:\n  users:\n    type: varchar(100)\n"


def test_supervise_restarts_after_transient_failure(spark, tmp_path):
    path = str(tmp_path / "sup.db")
    factory = functools.partial(sqlite3.connect, path, timeout=60)
    conn = factory()
    conn.execute(
        'CREATE TABLE "users" ("_id" varchar(24) PRIMARY KEY, "type" varchar(100))'
    )
    conn.commit(); conn.close()

    rows = [
        (1, "users", "insert", "a", json.dumps({"type": "x"})),
        (2, "users", "insert", "b", json.dumps({"type": "y"})),
    ]
    src = str(tmp_path / "in")
    spark.createDataFrame(rows, OPS_SCHEMA).write.parquet(src)
    spec = parse_spec(SPEC_YAML)
    poison = tmp_path / "poison"
    poison.write_text("1")  # first attempt fails

    failures = []

    def start():
        # a connection factory that fails while the poison file exists —
        # simulating a transiently unreachable sink
        pfile = str(poison)

        def flaky_factory():
            import os

            if os.path.exists(pfile):
                os.remove(pfile)  # heal after first failure
                raise ConnectionError("sink temporarily unreachable")
            return factory()

        stream = spark.readStream.schema(OPS_SCHEMA).parquet(src)
        return start_cdc_stream(
            stream, spec, connection_factory=flaky_factory,
            dialect_name="sqlite",
            checkpoint_dir=str(tmp_path / "ckpt"), num_partitions=1,
            trigger={"availableNow": True},
        )

    restarts = supervise(
        start, max_restarts=3, backoff_seconds=0.5,
        on_failure=lambda e: failures.append(e),
    )
    assert restarts == 1 and len(failures) == 1
    conn = factory()
    got = dict(conn.execute('SELECT "_id","type" FROM "users"').fetchall())
    conn.close()
    assert got == {"a": "x", "b": "y"}
