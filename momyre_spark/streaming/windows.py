"""Event-time windowed aggregation + stream dedup with watermarks.

The reference never needed event-time semantics (an oplog is a total order,
SURVEY.md §2.10) — these operators cover the engine's own streaming-analytics
surface over event streams:

- ``windowed_counts``: tumbling event-time windows with a watermark bounding
  state; late rows beyond the watermark drop instead of growing state
  forever — the property that keeps a 100 TB/day stream's state finite;
- ``deduped_stream`` : at-most-once per key within the watermark horizon
  (``dropDuplicatesWithinWatermark``) — the streaming twin of exact dedup.

Both return transformed streaming DataFrames; callers attach sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    slide: str | None = None,
) -> DataFrame:
    """``slide`` < ``window`` makes it a HOPPING aggregate (each event in
    window/slide overlapping windows — the moving-average rollup); state
    and emissions scale by the same factor."""
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "c",
            "total",
        )
    )


def deduped_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def start_rollup_to_sink(
    events: DataFrame,
    *,
    connection_factory,
    dialect_name: str,
    table: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    trigger: dict | None = None,
    slide: str | None = None,
):
    """Continuously-maintained materialized rollup: the watermarked windowed
    aggregate is UPSERTED into a serving table every micro-batch (update
    mode), keyed by (window_start, *group_cols) — a streaming materialized
    view over a 100 TB/day event stream whose serving-store write volume is
    O(changed windows per batch), not O(events).

    The sink table needs columns: window_key (varchar PK), window_start,
    window_end, the group columns, c, total. Update-mode re-emissions of a
    window (late rows within the watermark) overwrite the previous row —
    upserts make the view converge; rows later than the watermark are
    dropped by the aggregation (state stays finite).
    """
    from momyre_spark.sinks.jdbc_upsert import upsert_dataframe

    agg = windowed_counts(
        events, window=window, watermark=watermark, ts_col=ts_col,
        group_cols=group_cols, slide=slide,
    )
    key = F.concat_ws(
        "|", F.col("window_start").cast("string"), *[F.col(c) for c in group_cols]
    )
    out = agg.select(
        key.alias("window_key"),
        F.col("window_start").cast("string").alias("window_start"),
        F.col("window_end").cast("string").alias("window_end"),
        *group_cols,
        "c",
        "total",
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        upsert_dataframe(
            batch_df,
            connection_factory=connection_factory,
            dialect_name=dialect_name,
            table=table,
            key="window_key",
            batch_id=batch_id,
        )

    writer = (
        out.writeStream.foreachBatch(handle)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def start_incremental_agg_to_sink(
    events: DataFrame,
    *,
    connection_factory,
    dialect_name: str,
    table: str,
    checkpoint_dir: str,
    keys: tuple[str, ...],
    aggs: dict[str, tuple[str, str | None]],
    trigger: dict | None = None,
    num_partitions: int | None = None,
):
    """Continuously-maintained UNWINDOWED aggregate: each micro-batch
    pre-aggregates its delta (operators/incremental.aggregate_delta) and
    FOLDS it into the serving table with a combining upsert
    (``cnt = cnt + delta``, ``lo = min(lo, delta)``, ...).

    Contrast with start_rollup_to_sink: no window, no watermark, no Spark
    aggregation state at all — the running total lives in the SINK, so
    state is zero on the cluster and the stream handles unbounded keys.
    Append-mode per batch; sink write volume is O(distinct keys per batch).
    Exactly-once: additive merges are NOT idempotent, so
    merge_upsert_dataframe runs its staged two-phase protocol — executors
    replace-upsert deltas into a (batch_id, key)-keyed staging table
    (idempotent under any replay/partition layout), then the driver applies
    staging -> target and records the per-(table, batch) marker in one
    transaction.

    The sink table needs columns: ``*keys`` (PK = the concatenated
    ``agg_key``) + one column per ``aggs`` entry.
    """
    from momyre_spark.operators.incremental import aggregate_delta
    from momyre_spark.sinks.jdbc_upsert import merge_upsert_dataframe

    kinds = {out: kind for out, (kind, _) in aggs.items()}
    merge = {
        out: {"count": "sum", "sum": "sum", "min": "min", "max": "max"}[k]
        for out, k in kinds.items()
    }

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        delta = aggregate_delta(batch_df, list(keys), aggs)
        key = F.concat_ws("|", *[F.col(c).cast("string") for c in keys])
        merge_upsert_dataframe(
            delta.select(key.alias("agg_key"), *keys, *aggs),
            connection_factory=connection_factory,
            dialect_name=dialect_name,
            table=table,
            merge=merge,
            key="agg_key",
            batch_id=batch_id,
            num_partitions=num_partitions,
        )

    writer = (
        events.writeStream.foreachBatch(handle)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
