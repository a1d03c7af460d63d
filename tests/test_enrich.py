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
