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
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), *group_cols)
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
