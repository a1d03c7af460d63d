"""Cross-batch latest-state compaction for CDC streams.

The reference applies every op to the sink in log order and lets the
database's row state absorb duplicates and stale updates
(/root/reference/app/run.go:301-322 — one UPDATE per op). At 100 TB of
oplog that write amplification is the bottleneck: a hot key updated 1000
times per batch costs 1000 sink writes. The engine's batch path already
collapses WITHIN a micro-batch (operators/cdc.merge_ops_microbatch); this
operator adds the CROSS-batch guard as in-stream state: each key carries
its high-water (ts, value) between batches, so

- in-batch duplicates collapse to one emitted row (latest wins),
- an op older than an already-emitted one is suppressed entirely — the
  late event never reaches the sink, instead of relying on the sink-side
  ts-guard (sinks/jdbc_upsert ``ts_guard_col``) to reject it with a read.

State is ONE (ts, value-payload) pair per key — bounded by the KEY
UNIVERSE (exactly what the sink table itself holds), not the stream
length. For high-churn key spaces an optional processing-time TTL
(``ttl_minutes``) expires quiet keys; a key that reappears after expiry
re-emits at most one stale row, which the idempotent sink absorbs
(exactly the dropDuplicatesWithinWatermark trade). NOTE: a stateful
processing-time timeout makes Spark consider every batch "may have timer
work", so ``availableNow``/``once`` triggers never terminate — use TTL
only with a continuous trigger (the CDC loop's processingTime trigger),
and leave it off for run-to-completion backfills.

Built on ``applyInPandasWithState``. Spark 4's
``transformWithStateInPandas`` is the successor API (ValueState + native
TTL); it requires the protobuf runtime, absent in this environment — the
semantics here are identical and the swap is mechanical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def latest_state_stream(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    ttl_minutes: int | None = None,
    output_mode: str = "append",
) -> DataFrame:
    """Per-key latest-wins compaction with cross-batch suppression of late
    arrivals. Emits one row per (key, batch) only when the batch ADVANCES
    the key's high-water ``ts_col``; output schema is
    ``(key, ts, *value_cols)``.

    One shuffle on the key per micro-batch; state bounded to one row per
    active key and expired after ``ttl_minutes`` of inactivity.

    ``output_mode='append'`` (default) treats the output as the append-only
    LOG of state advances — what a downstream file/queue sink wants; a key
    emits again when a later batch advances it. ``'update'`` declares
    upsert semantics for sinks that key on ``key_col``."""
    out_fields = [stream_df.schema[key_col], stream_df.schema[ts_col]] + [
        stream_df.schema[c] for c in value_cols
    ]
    out_schema = StructType(out_fields)
    state_schema = StructType(
        [stream_df.schema[ts_col]] + [stream_df.schema[c] for c in value_cols]
    )
    ttl_ms = int(ttl_minutes) * 60 * 1000 if ttl_minutes is not None else None

    def _tiebreak(cand: tuple) -> tuple:
        # deterministic order for EQUAL-ts rows: lexicographic over the
        # stringified payload, so the winner does not depend on partition
        # layout. (The CDC path's ts is pack_ts — unique — so this only
        # matters for generic ts columns with coarse granularity.)
        return tuple(str(v) for v in cand[1:])

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        best = state.get if state.exists else None  # (ts, *values)
        advanced = False
        for pdf in pdfs:
            if pdf.empty:
                continue
            # candidate = the max-(ts, stringified payload) row, picked
            # VECTORIZED: among the rows tied at max ts, a stable sort on
            # the stringified value columns makes the last row the
            # lexicographic max — same order _tiebreak compares in, without
            # a per-row Python loop (a hot key with coarse ts can tie its
            # whole chunk)
            sub = pdf[pdf[ts_col] == pdf[ts_col].max()]
            if len(sub) > 1:
                sub = sub.loc[
                    sub[value_cols].astype(str)
                    .sort_values(by=list(value_cols), kind="stable")
                    .index
                ]
            row = sub.iloc[-1]
            cand = (row[ts_col], *[row[c] for c in value_cols])
            if (
                best is None
                or cand[0] > best[0]
                or (cand[0] == best[0] and _tiebreak(cand) > _tiebreak(best))
            ):
                best = cand
                advanced = True
        if advanced:
            state.update(tuple(best))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    ts_col: [best[0]],
                    **{c: [best[1 + i]] for i, c in enumerate(value_cols)},
                }
            )
        elif state.exists and ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)  # quiet-but-probed key stays

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode=output_mode,
            timeoutConf=timeout,
        )
    )
