"""Stream-stream interval joins with watermark-bounded state.

The reference has exactly one join — a batch orphan anti-join
(``/root/reference/app/run.go:249-279``); correlating two live streams is
part of the engine's own streaming-analytics surface. A stream-stream join
in Spark buffers both sides as state; the join is only scale-safe when BOTH
sides carry watermarks AND the join condition bounds event-time distance, so
the state store can evict rows the other side can no longer match. This
module packages that correct-by-construction shape:

- each input gets ``withWatermark`` (state eviction horizon);
- the join condition is equi-key AND ``right_ts ∈ [left_ts, left_ts + max_delay]``
  — the time bound is what lets Spark compute a state retention window
  instead of buffering the streams forever.

State size at steady state: O(rows within the watermark horizon) per side,
partitioned by the join key — NOT O(stream length). At 100 TB/day that is
the difference between a working join and an OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join right-stream rows to left-stream rows with the same ``key``
    occurring within ``[left_ts, left_ts + max_delay]``.

    ``left_ts`` and ``right_ts`` must be distinct column names (the joined
    frame carries both). ``how`` may be ``inner`` or the outer variants
    Spark supports for stream-stream joins (``leftOuter``/``rightOuter``/
    ``fullOuter`` — outer rows emit only after the watermark passes).
    """
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, how).drop(rw[key])
