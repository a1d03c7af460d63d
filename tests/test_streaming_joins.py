"""Stream-stream interval join (streaming/joins.py): the streaming result
must equal the equivalent batch interval join, and the plan must be a
watermarked stateful join (bounded state), not an unconstrained one."""

from __future__ import annotations

import json

CLICKS = [
    # (click_id, user_id, ts)
    (1, 1, "2024-01-01 10:00:00"),
    (2, 1, "2024-01-01 11:00:00"),
    (3, 2, "2024-01-01 10:30:00"),
    (4, 3, "2024-01-01 09:00:00"),
]
PURCHASES = [
    # (purchase_id, user_id, pts) — joins to a click within 30 min
    (100, 1, "2024-01-01 10:10:00"),   # -> click 1
    (101, 1, "2024-01-01 11:25:00"),   # -> click 2
    (102, 2, "2024-01-01 10:29:00"),   # before click 3: no match
    (103, 2, "2024-01-01 10:45:00"),   # -> click 3
    (104, 3, "2024-01-01 12:00:00"),   # 3h after click 4: out of window
]
EXPECTED = {(1, 100), (2, 101), (3, 103)}


def _write_jsonl(path, rows, cols):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / "part-0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(dict(zip(cols, r))) + "\n")


def _run_join(spark, tmp_path, how="inner"):
    from momyre_spark.streaming.joins import stream_interval_join

    cdir = tmp_path / "clicks"
    pdir = tmp_path / "purch"
    _write_jsonl(cdir, CLICKS, ["click_id", "user_id", "ts"])
    _write_jsonl(pdir, PURCHASES, ["purchase_id", "user_id", "pts"])

    clicks = spark.readStream.schema("click_id long, user_id long, ts timestamp").json(
        str(cdir)
    )
    purchases = spark.readStream.schema(
        "purchase_id long, user_id long, pts timestamp"
    ).json(str(pdir))

    joined = stream_interval_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="pts",
        max_delay="30 minutes",
        watermark="1 hour",
        how=how,
    )
    name = f"ssj_{how}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{how}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_stream_interval_join_matches_batch(spark, tmp_path):
    rows = _run_join(spark, tmp_path)
    got = {(r["click_id"], r["purchase_id"]) for r in rows}
    assert got == EXPECTED
    # same join expressed in batch over the same data agrees
    from pyspark.sql import functions as F

    c = spark.createDataFrame(
        [(a, b, t) for a, b, t in CLICKS], "click_id long, user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    p = spark.createDataFrame(
        [(a, b, t) for a, b, t in PURCHASES],
        "purchase_id long, user_id long, pts string",
    ).withColumn("pts", F.col("pts").cast("timestamp"))
    batch = c.join(
        p,
        (c.user_id == p.user_id)
        & (p.pts >= c.ts)
        & (p.pts <= c.ts + F.expr("INTERVAL 30 minutes")),
    )
    assert {(r["click_id"], r["purchase_id"]) for r in batch.collect()} == EXPECTED


def test_stream_interval_join_requires_distinct_ts_names():
    import pytest

    from momyre_spark.streaming.joins import stream_interval_join

    with pytest.raises(ValueError):
        stream_interval_join(None, None, key="k", left_ts="ts", right_ts="ts")
