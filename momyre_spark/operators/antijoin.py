"""Orphan reconciliation as a distributed anti-join.

Reference J1 (``/root/reference/app/run.go:249-279``) finds sink rows whose
key no longer exists at the source by a sequential per-key point probe
(``checkHasId``, ``mongo.go:677-693``) — O(N) round-trips. Re-expressed as a
single ``LEFT ANTI JOIN``, which Spark executes as a broadcast or shuffled
hash anti-join: one pass, no per-row round trips, scales linearly with
executors.

Scale notes:
- if the source key set fits in memory (dimension-sized), pass
  ``broadcast_source=True`` to avoid shuffling the (huge) sink side;
- otherwise both sides shuffle on the key — keys are near-unique so skew is
  not a concern; AQE handles residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphan_ids(
    sink: DataFrame,
    source: DataFrame,
    left_key: str = "_id",
    right_key: str = "_id",
    broadcast_source: bool = False,
) -> DataFrame:
    """Rows of ``sink`` whose ``left_key`` has no match in ``source``."""
    src = source.select(F.col(right_key))
    if broadcast_source:
        src = F.broadcast(src)
    return sink.join(src, sink[left_key] == src[right_key], "left_anti")
