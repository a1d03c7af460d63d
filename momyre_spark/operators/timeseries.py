"""Time-series gap handling over keyed event streams.

The reference applies ops strictly in log order and keeps only latest state
(/root/reference/app/run.go:301-322); these operators add the time-series
views a warehouse builds NEXT TO that state: carrying the last known value
forward across gaps (sensor dropouts, sparse CDC columns) and bounding how
far a value may be carried.

Everything is a window composition over (key, order) — one shuffle on the
key, no UDFs, no state beyond the window frame.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def forward_fill(
    df: DataFrame,
    cols: Sequence[str],
    key: str = "_id",
    order: Sequence[str] = ("ts",),
) -> DataFrame:
    """Per-key forward fill: each NULL in ``cols`` takes the most recent
    non-null value earlier in ``order`` within its key (classic LOCF —
    last observation carried forward). Leading nulls stay null.

    ``last(col, ignorenulls=True)`` over a running frame — Spark evaluates
    the frame incrementally, so this is O(n) per key after ONE shuffle on
    the key, however long the gaps are.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def fill_with_max_age(
    df: DataFrame,
    col: str,
    key: str = "_id",
    ts_col: str = "ts",
    max_age: float | int = None,
) -> DataFrame:
    """Forward fill with a staleness bound: a carried value expires once the
    row's ``ts_col`` is more than ``max_age`` past the observation it came
    from (sensor feeds: a reading older than the freshness SLA is worse
    than NULL). ``max_age`` in the units of ``ts_col`` arithmetic.

    Same single-shuffle window shape as :func:`forward_fill`, carrying the
    (value, observed-at) pair and expiring at projection time.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs = F.when(
        F.col(col).isNotNull(), F.struct(F.col(ts_col).alias("at"), F.col(col).alias("v"))
    )
    carried = F.last(obs, ignorenulls=True).over(w)
    filled = F.when(
        carried.isNotNull()
        & (
            F.lit(True)
            if max_age is None
            else (F.col(ts_col) - carried["at"] <= F.lit(max_age))
        ),
        carried["v"],
    )
    return df.withColumn(col, filled)
