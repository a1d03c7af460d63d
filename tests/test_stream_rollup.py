"""Streaming materialized rollup (streaming/windows.start_rollup_to_sink):
windowed aggregates continuously upserted into a serving table, converging
across micro-batches including late-but-within-watermark updates."""

from __future__ import annotations

import functools
import json
import sqlite3


def _mk_sink(tmp_path):
    path = str(tmp_path / "rollup.db")
    factory = functools.partial(sqlite3.connect, path, timeout=60)
    conn = factory()
    conn.execute(
        'CREATE TABLE "rollup" ("window_key" varchar(64) PRIMARY KEY, '
        '"window_start" varchar(32), "window_end" varchar(32), '
        '"event_type" varchar(16), "c" bigint, "total" double)'
    )
    conn.commit()
    conn.close()
    return factory


def _write(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for ts, et, v in rows:
            f.write(json.dumps({"ts": ts, "event_type": et, "value": v}) + "\n")


def _run(spark, srcdir, ckpt, factory):
    from momyre_spark.streaming.windows import start_rollup_to_sink

    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).json(str(srcdir))
    q = start_rollup_to_sink(
        stream,
        connection_factory=factory,
        dialect_name="sqlite",
        table="rollup",
        checkpoint_dir=str(ckpt),
        window="1 hour",
        watermark="2 hours",
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)


def _state(factory):
    conn = factory()
    try:
        cur = conn.execute(
            'SELECT "window_start","event_type","c","total" FROM "rollup"'
        )
        return {(r[0][:13], r[1]): (r[2], r[3]) for r in cur.fetchall()}
    finally:
        conn.close()


def test_rollup_converges_across_batches(spark, tmp_path):
    factory = _mk_sink(tmp_path)
    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"

    _write(src / "b1.json", [
        ("2024-01-01 10:05:00", "A", 1.0),
        ("2024-01-01 10:20:00", "A", 2.0),
        ("2024-01-01 10:40:00", "B", 10.0),
        ("2024-01-01 11:10:00", "A", 4.0),
    ])
    _run(spark, src, ckpt, factory)
    st = _state(factory)
    assert st[("2024-01-01 10", "A")] == (2, 3.0)
    assert st[("2024-01-01 10", "B")] == (1, 10.0)
    assert st[("2024-01-01 11", "A")] == (1, 4.0)

    # a late row for the 10:00 window (inside the 2h watermark) plus a new
    # window arrive in a second batch: the upsert converges the view
    _write(src / "b2.json", [
        ("2024-01-01 10:50:00", "B", 5.0),
        ("2024-01-01 11:30:00", "B", 7.0),
    ])
    _run(spark, src, ckpt, factory)
    st = _state(factory)
    assert st[("2024-01-01 10", "B")] == (2, 15.0)  # late row merged in
    assert st[("2024-01-01 11", "B")] == (1, 7.0)
    assert st[("2024-01-01 10", "A")] == (2, 3.0)   # untouched windows stable


def test_hopping_rollup_each_event_in_multiple_windows(spark):
    """slide < window: a batch-mode sanity of the hopping aggregate — one
    event at minute 30 belongs to both the :00 and :30 one-hour windows."""
    from pyspark.sql import functions as F

    from momyre_spark.streaming.windows import windowed_counts

    ev = spark.createDataFrame(
        [("2024-01-01 10:30:00", "click", 2.0)],
        "ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = windowed_counts(
        ev, window="1 hour", slide="30 minutes", group_cols=("event_type",)
    )
    starts = sorted(str(r["window_start"]) for r in out.collect())
    assert starts == ["2024-01-01 10:00:00", "2024-01-01 10:30:00"]
