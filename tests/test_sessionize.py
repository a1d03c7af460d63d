"""applyInPandasWithState sessionization tests."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from momyre_spark.streaming.sessionize import sessionize


def _write_events(spark, path, rows, mode="overwrite"):
    df = spark.createDataFrame(
        [Row(ts=t, user_id=u, value=v) for t, u, v in rows]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.parquet(path, mode=mode)
    return df.schema


def test_sessionize_closes_on_gap_and_timeout(spark, tmp_path):
    src, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    # user 1: two bursts separated by > 30min -> two sessions
    # user 2: one burst
    schema = _write_events(spark, src, [
        ("2024-01-01 00:00:00", 1, 1.0),
        ("2024-01-01 00:05:00", 1, 2.0),
        ("2024-01-01 01:00:00", 1, 3.0),
        ("2024-01-01 01:02:00", 1, 4.0),
        ("2024-01-01 00:10:00", 2, 5.0),
    ])

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            sessionize(stream, gap="30 minutes", watermark="10 minutes")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # within-batch gap closes user 1's first session immediately
    got = {
        (r["user_id"], str(r["session_start"])): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got.get((1, "2024-01-01 00:00:00")) == (2, 3.0)

    # a much later event advances the watermark; run 2's timeout closes the
    # remaining open sessions
    _write_events(spark, src, [("2024-01-01 09:00:00", 3, 0.5)], mode="append")
    run_once()
    got = {
        (r["user_id"], str(r["session_start"])): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got.get((1, "2024-01-01 01:00:00")) == (2, 7.0)
    assert got.get((2, "2024-01-01 00:10:00")) == (1, 5.0)
