"""Stream-static enrichment (streaming/enrich.py): the dimension is
re-loaded per micro-batch, so a dim updated between batches is visible to
the next batch — the semantics a slowly-changing dimension needs, which
Spark's plain stream-static join does NOT give for file dims (file listing
is resolved once at plan time)."""

from __future__ import annotations

from pyspark.sql import functions as F

EV_SCHEMA = "id bigint, key string, x double"
DIM_SCHEMA = "key string, label string"


def _run_once(spark, src_dir, dim_dir, ckpt, collected):
    from momyre_spark.streaming.enrich import start_enriched_sink

    stream = spark.readStream.schema(EV_SCHEMA).parquet(src_dir)

    def loader(sess):
        return sess.read.schema(DIM_SCHEMA).parquet(dim_dir)

    def sink(df, epoch_id):
        collected.extend(
            (r["id"], r["key"], r["label"]) for r in df.collect()
        )

    q = start_enriched_sink(
        stream, loader, on="key", sink_fn=sink, checkpoint=ckpt,
        trigger_once=True,
    )
    q.awaitTermination(120)


def test_enriched_sink_sees_refreshed_dim(spark, tmp_path):
    src, dim, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "dim"), str(tmp_path / "ckpt")
    )
    collected: list[tuple] = []

    spark.createDataFrame([("a", "A1"), ("b", "B1")], DIM_SCHEMA).write.parquet(dim)
    spark.createDataFrame([(1, "a", 0.1), (2, "b", 0.2)], EV_SCHEMA).write.parquet(
        src, mode="append"
    )
    _run_once(spark, src, dim, ckpt, collected)
    assert sorted(collected) == [(1, "a", "A1"), (2, "b", "B1")]

    # dim changes; only NEW source files are processed (checkpoint), and
    # they join against the refreshed dim
    spark.createDataFrame([("a", "A2"), ("b", "B2")], DIM_SCHEMA).write.mode(
        "overwrite"
    ).parquet(dim)
    spark.createDataFrame([(3, "a", 0.3)], EV_SCHEMA).write.parquet(
        src, mode="append"
    )
    collected.clear()
    _run_once(spark, src, dim, ckpt, collected)
    assert collected == [(3, "a", "A2")]


def test_enrich_stream_is_broadcast_join(spark, tmp_path):
    """The batch twin: enrichment must plan as a broadcast join (stream side
    never shuffles)."""
    from momyre_spark.streaming.enrich import enrich_stream

    big = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 100).cast("string").alias("key")
    )
    dim = spark.createDataFrame(
        [(str(i), f"L{i}") for i in range(100)], DIM_SCHEMA
    )
    out = enrich_stream(big, dim, on="key")  # batch frames share the code path
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ------------------------------------------- latest-state compaction -----
def _run_latest(spark, src, out, ckpt):
    from momyre_spark.streaming.stateful import latest_state_stream

    stream = spark.readStream.schema("k string, ts long, v double").parquet(src)
    compacted = latest_state_stream(stream, "k", "ts", ["v"])
    q = (
        compacted.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_latest_state_stream_compacts_and_suppresses_late(spark, tmp_path):
    src, out, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    # batch 1: three updates for a (collapse to ts=3), one for b
    spark.createDataFrame(
        [("a", 1, 1.0), ("a", 3, 3.0), ("a", 2, 2.0), ("b", 5, 5.0)],
        "k string, ts long, v double",
    ).write.parquet(src, mode="append")
    _run_latest(spark, src, out, ckpt)
    got1 = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got1 == [("a", 3, 3.0), ("b", 5, 5.0)]

    # batch 2: late event for a (ts=2 < high-water 3) suppressed entirely;
    # b advances and re-emits
    spark.createDataFrame(
        [("a", 2, 9.9), ("b", 9, 9.0)], "k string, ts long, v double"
    ).write.parquet(src, mode="append")
    _run_latest(spark, src, out, ckpt)
    got2 = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got2 == [("a", 3, 3.0), ("b", 5, 5.0), ("b", 9, 9.0)]


def test_latest_state_stream_into_guarded_sink(spark, tmp_path):
    """The compacted stream composes with the ts-guarded JDBC sink: raw
    events with in-batch duplicates and a cross-batch late arrival converge
    to max-ts state per key, and the sink sees one write per (key, advance)
    instead of one per op."""
    import functools
    import sqlite3

    from momyre_spark.sinks.jdbc_upsert import upsert_dataframe
    from momyre_spark.streaming.stateful import latest_state_stream

    db = str(tmp_path / "sink.db")
    factory = functools.partial(sqlite3.connect, db, timeout=60)
    conn = factory()
    conn.execute(
        'CREATE TABLE "latest" ("k" varchar(16) PRIMARY KEY, '
        '"ts" bigint, "v" double)'
    )
    conn.commit()
    conn.close()

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    writes = []

    def sink(batch_df, epoch_id):
        rows = batch_df.count()
        if rows:
            writes.append(rows)
            upsert_dataframe(
                batch_df, connection_factory=factory, dialect_name="sqlite",
                table="latest", key="k", batch_id=epoch_id,
                ts_guard_col="ts", num_partitions=1,
            )

    def run_once():
        stream = spark.readStream.schema("k string, ts long, v double").parquet(src)
        q = (
            latest_state_stream(stream, "k", "ts", ["v"])
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [("a", 1, 1.0), ("a", 5, 5.0), ("a", 3, 3.0), ("b", 2, 2.0)],
        "k string, ts long, v double",
    ).write.parquet(src, mode="append")
    run_once()
    spark.createDataFrame(
        [("a", 4, 9.9), ("b", 7, 7.0)],  # late for a; advance for b
        "k string, ts long, v double",
    ).write.parquet(src, mode="append")
    run_once()

    conn = factory()
    got = {r[0]: (r[1], r[2]) for r in conn.execute('SELECT * FROM "latest"')}
    conn.close()
    assert got == {"a": (5, 5.0), "b": (7, 7.0)}
    # 6 raw ops compacted to 3 sink rows (a@5, b@2 then b@7)
    assert sum(writes) == 3


def test_latest_state_stream_equal_ts_deterministic(spark, tmp_path):
    """Equal-ts rows must resolve to ONE deterministic winner (lexicographic
    over the stringified payload), independent of partition layout."""
    src, out, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    rows = [("a", 7, 1.0), ("a", 7, 9.0), ("a", 7, 3.0)]
    spark.createDataFrame(rows, "k string, ts long, v double").repartition(
        3
    ).write.parquet(src, mode="append")
    _run_latest(spark, src, out, ckpt)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got == [("a", 7, 9.0)]  # '9.0' is the lexicographic max payload
