"""Salted-join equivalence and event-time windowed streaming tests."""

from __future__ import annotations

import time

from pyspark.sql import Row
from pyspark.sql import functions as F

from momyre_spark.operators.skew import salted_join
from momyre_spark.streaming.windows import deduped_stream, windowed_counts


def _skewed(spark):
    # one hot key (0) holding 80% of rows
    rows = [Row(k=0, v=i) for i in range(800)] + [
        Row(k=i % 20 + 1, v=i) for i in range(200)
    ]
    dim = [Row(k=i, name=f"dim{i}") for i in range(25)]
    return spark.createDataFrame(rows), spark.createDataFrame(dim)


def test_salted_join_matches_plain_inner(spark):
    large, small = _skewed(spark)
    plain = large.join(small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("c"), F.sum("v").alias("s")
    )
    salted = salted_join(large, small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("c"), F.sum("v").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_matches_plain_left(spark):
    large, small = _skewed(spark)
    small_missing = small.filter(F.col("k") != 1)  # unmatched keys stay
    plain = large.join(small_missing, "k", "left")
    salted = salted_join(large, small_missing, "k", how="left")
    assert sorted(map(tuple, plain.select("k", "v", "name").collect())) == sorted(
        map(tuple, salted.select("k", "v", "name").collect())
    )


def _event_rows():
    base = "2024-01-01 "
    rows = []
    for h, n in [(0, 3), (1, 2), (2, 4)]:
        for i in range(n):
            rows.append(
                (f"{base}{h:02d}:1{i}:00", f"e{h}_{i}", "click", 2.5)
            )
    return rows


def test_windowed_counts_batch_semantics(spark):
    df = spark.createDataFrame(
        [Row(ts=t, event_id=e, event_type=ty, value=v) for t, e, ty, v in _event_rows()]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = windowed_counts(df, window="1 hour", watermark="2 hours")
    got = {
        (str(r["window_start"]), r["event_type"]): (r["c"], r["total"])
        for r in out.collect()
    }
    assert got[("2024-01-01 00:00:00", "click")] == (3, 7.5)
    assert got[("2024-01-01 02:00:00", "click")] == (4, 10.0)


def test_windowed_counts_streaming_with_watermark(spark, tmp_path):
    src = str(tmp_path / "ev_in")
    out_dir = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ev_ckpt")
    df = spark.createDataFrame(
        [Row(ts=t, event_id=e, event_type=ty, value=v) for t, e, ty, v in _event_rows()]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.parquet(src)

    def run_once():
        stream = spark.readStream.schema(df.schema).parquet(src)
        agg = windowed_counts(stream, window="1 hour", watermark="30 minutes")
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # run 1 ingests the events (watermark advances to 02:13-0:30 AFTER the
    # batch, so nothing is emitted yet in append mode)
    run_once()
    # a later event arrives; run 2's batch runs under the advanced watermark
    # and emits the now-closed 00:00 and 01:00 windows
    spark.createDataFrame(
        [Row(ts="2024-01-01 05:00:00", event_id="late", event_type="click", value=1.0)]
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(src, mode="append")
    run_once()

    res = spark.read.parquet(out_dir)
    rows = {str(r["window_start"]): (r["c"], r["total"]) for r in res.collect()}
    assert rows.get("2024-01-01 00:00:00") == (3, 7.5)
    assert rows.get("2024-01-01 01:00:00") == (2, 5.0)


def test_deduped_stream_drops_repeats(spark, tmp_path):
    src = str(tmp_path / "dd_in")
    out_dir = str(tmp_path / "dd_out")
    ckpt = str(tmp_path / "dd_ckpt")
    rows = [Row(ts="2024-01-01 00:00:00", event_id="a", event_type="x", value=1.0),
            Row(ts="2024-01-01 00:01:00", event_id="a", event_type="x", value=1.0),
            Row(ts="2024-01-01 00:02:00", event_id="b", event_type="x", value=1.0)]
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        deduped_stream(stream, keys=("event_id",))
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["event_id"] for r in spark.read.parquet(out_dir).collect())
    assert got == ["a", "b"]
