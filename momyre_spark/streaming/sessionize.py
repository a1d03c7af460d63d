"""Custom stateful streaming operator: inactivity-gap sessionization.

Spark has no built-in "session per key with N-minute inactivity gap that
emits rich per-session aggregates" operator (``session_window`` covers only
windowed aggs), so this is the engine's example of the custom-stateful
pattern: ``applyInPandasWithState`` with event-time timeouts.

Per key, state holds the open session (start, last-seen, count, value sum).
A batch's rows extend or roll the session; the event-time timeout fires when
the watermark passes ``last_seen + gap``, closing and emitting the session.
State is one tiny tuple per active key — bounded by the watermark horizon,
which is what makes it safe at stream scale.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events int, total_value double"
)
STATE_SCHEMA = "start long, last long, n int, total double"

_US = 1_000_000


def _session_fn_factory(gap_seconds: int):
    gap_us = gap_seconds * _US

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                start, last, n, total = state.get
                closed.append((user_id, start, last, n, total))
            state.remove()
        else:
            rows: list[tuple[int, float]] = []  # (ts_us, value)
            for pdf in pdfs:
                ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us
                rows.extend(zip(ts_us.tolist(), pdf["value"].tolist()))
            rows.sort()
            if state.exists:
                start, last, n, total = state.get
            else:
                start, last, n, total = rows[0][0], rows[0][0], 0, 0.0
            for ts_us, value in rows:
                if ts_us - last > gap_us:
                    closed.append((user_id, start, last, n, total))
                    start, last, n, total = ts_us, ts_us, 0, 0.0
                last = max(last, ts_us)
                n += 1
                total += float(value)
            state.update((start, last, n, total))
            state.setTimeoutTimestamp((last + gap_us) // 1000)  # ms

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": pd.to_datetime([c[1] for c in closed], unit="us"),
                    "session_end": pd.to_datetime([c[2] for c in closed], unit="us"),
                    "n_events": pd.Series([c[3] for c in closed], dtype="int32"),
                    "total_value": [c[4] for c in closed],
                }
            )

    return fn


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming sessionization: emits one row per CLOSED session."""
    amount, unit = gap.split()
    unit_s = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
              "hour": 3600, "hours": 3600}[unit]
    gap_seconds = int(amount) * unit_s
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            _session_fn_factory(gap_seconds),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
