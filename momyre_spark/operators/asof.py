"""As-of join: each left row matched to the latest right row at-or-before it.

Spark has no native ASOF JOIN (DuckDB/kdb/Pandas do). The naive encoding —
inequality join + per-left-row max — explodes to O(L x R) pairs per key
before aggregating. This implementation is the scalable union-window form:

    tag left(side=1) and right(side=0) rows, union them,
    per key ORDER BY (ts, side): carry the last non-null right row forward
    as ONE struct with ``last(struct, ignorenulls=True)``, keep left rows.

Cost: ONE shuffle by key + one sort — linear in |L|+|R|, no pair blow-up.
``side`` in the sort key makes ties deterministic: a right row at exactly
left.ts sorts first and therefore matches (at-or-before semantics).

This is also the CDC-lookup primitive: "state of dimension D as of this
event's timestamp" against a change-log of D.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance: float | None = None,
) -> DataFrame:
    """Left as-of join: for every left row, the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` key (NULLs when none).

    ``right_cols``: right payload columns to carry (default: all but key/ts).
    ``tolerance``: maximum staleness of the match, in the ts column's units
    (seconds for timestamps): a matched right row older than
    ``left_ts - tolerance`` is treated as NO match — the standard as-of
    freshness bound (pandas merge_asof's ``tolerance``).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    # the tolerance check needs the matched right ts even when the caller
    # didn't ask for it — carry it inside the struct, expose only right_cols
    carry_cols = (
        right_cols if (tolerance is None or right_ts in right_cols)
        else right_cols + [right_ts]
    )

    # The whole right payload is carried as ONE struct with a single
    # last(ignorenulls=True): the matched left row gets every column from the
    # SAME right row, even when some of that row's payload columns are NULL.
    # (Per-column carries would backfill a NULL payload value from an older
    # right row, fabricating a row that never existed.)
    right_dtypes = dict(right.dtypes)
    r_struct_type = (
        "struct<" + ",".join(f"`{c}`:{right_dtypes[c]}" for c in carry_cols) + ">"
    )
    lhs = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__left"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    rhs = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"`{c}`:{t}" for c, t in left.dtypes) + ">"
        ).alias("__left"),
        F.struct(*[F.col(c) for c in carry_cols]).alias("__r"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        "__side",
        "__t",
        "__left",
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    if tolerance is not None:
        fresh = (
            F.col("__t").cast("double")
            - F.col(f"__r.{right_ts}").cast("double")
        ) <= F.lit(float(tolerance))
        carried = carried.withColumn(
            "__r", F.when(F.col("__r").isNotNull() & fresh, F.col("__r"))
        )
    return carried.filter(F.col("__side") == 1).select(
        "__left.*",
        *[F.col(f"__r.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
