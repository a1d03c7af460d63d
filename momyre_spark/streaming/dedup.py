"""Streaming deduplication with bounded state.

CDC transports are at-least-once (the reference re-reads the oplog from the
last checkpoint on restart, /root/reference/app/run.go:164-189, so the same
entry can be delivered twice); exactly-once SINKS handle replays of whole
batches, but duplicate EVENTS inside the stream (producer retries, fan-in
from overlapping readers) need stream-side dedup.

``dedup_stream`` wraps Spark's ``dropDuplicatesWithinWatermark``: state for
an event id is kept only within the watermark horizon, so memory is bounded
by (arrival rate x horizon) instead of growing with the key universe — the
only shape that survives an unbounded stream. A plain ``dropDuplicates`` on
a stream retains every key forever; at 100 TB of events that state is the
job's death. Duplicates separated by MORE than the horizon are not caught
here (they cannot be, in bounded memory) — the idempotent sink absorbs
those.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    id_cols: Sequence[str],
    ts_col: str = "ts",
    horizon: str = "10 minutes",
) -> DataFrame:
    """Drop re-deliveries of the same event id arriving within ``horizon``.

    ``events`` must be a STREAMING DataFrame; ``ts_col`` is the event-time
    column the watermark applies to. State per distinct id is dropped once
    the watermark passes its event time + horizon.
    """
    if not events.isStreaming:
        raise ValueError(
            "dedup_stream is for streaming DataFrames; use "
            "df.dropDuplicates(...) on batch data"
        )
    return events.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(
        list(id_cols)
    )
