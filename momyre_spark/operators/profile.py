"""Column-level statistics profiling (ANALYZE-style) in one scan.

A 100 TB pipeline needs table stats before it needs anything else: null
ratios gate quality filters, NDVs drive join-strategy choices (broadcast vs
shuffle), min/max feed partition-layout decisions (see sinks/lake.py
z-order). This computes, in a single pass over the table, per column:

    n_rows, n_nulls, ndv, min/max (numeric as double, strings lexically)

Plan shape: ONE aggregate. With ``exact_ndv=True`` Spark plans multiple
exact count-distincts via a single Expand (rows duplicated once per
distinct agg — the standard cost, still one scan). At 100 TB use the
default ``exact_ndv=False``: ``approx_count_distinct`` (HyperLogLog++,
relative error ~2.3%) keeps the aggregate a plain one-pass partial+final
hash agg with no Expand. The oracle queries pin the exact path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from momyre_spark.functions.numeric import round_half_up

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"} | {
    "decimal"
}


def _is_numeric(dtype: str) -> bool:
    return dtype.split("(")[0] in _NUMERIC


def profile_columns(
    df: DataFrame, cols: Sequence[str], exact_ndv: bool = False
) -> DataFrame:
    """Long-form stats: one output row per profiled column.

    Output: ``col_name, n_rows, n_nulls, ndv, min_num, max_num, min_str,
    max_str`` — numeric columns fill ``*_num`` (rounded half-up to 4),
    string-typed columns fill ``*_str``; the other pair is NULL.
    """
    dtypes = dict(df.dtypes)
    ndv = F.count_distinct if exact_ndv else F.approx_count_distinct
    aggs, rows = [], []
    for c in cols:
        num = _is_numeric(dtypes[c])
        aggs += [
            F.count(F.lit(1)).alias(f"__rows_{c}"),
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"),
            ndv(c).alias(f"__ndv_{c}"),
            (
                round_half_up(F.min(c).cast("double"), 4)
                if num
                else F.lit(None).cast("double")
            ).alias(f"__min_num_{c}"),
            (
                round_half_up(F.max(c).cast("double"), 4)
                if num
                else F.lit(None).cast("double")
            ).alias(f"__max_num_{c}"),
            (F.min(c).cast("string") if not num else F.lit(None).cast("string")).alias(
                f"__min_str_{c}"
            ),
            (F.max(c).cast("string") if not num else F.lit(None).cast("string")).alias(
                f"__max_str_{c}"
            ),
        ]
        rows.append(
            f"'{c}', `__rows_{c}`, `__nulls_{c}`, `__ndv_{c}`, "
            f"`__min_num_{c}`, `__max_num_{c}`, `__min_str_{c}`, `__max_str_{c}`"
        )
    wide = df.agg(*aggs)
    stack = (
        f"stack({len(cols)}, "
        + ", ".join(rows)
        + ") as (col_name, n_rows, n_nulls, ndv, min_num, max_num, min_str, max_str)"
    )
    return wide.selectExpr(stack)
