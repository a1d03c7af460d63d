"""Grouped top-k with bounded memory: two-level partial top-k.

The window-function formulation (``row_number() OVER (PARTITION BY g ORDER
BY v DESC) <= k``) shuffles every row to its group's partition and sorts
whole groups — a hot group with 10^9 rows sorts 10^9 rows to keep 3.
``grouped_topk`` instead folds top-k through aggregation so only candidate
rows ever travel:

  stage 1: group by (g, salt) — each of S salted sub-groups keeps its local
           top-k via sort_array(collect_list(...))[:k]; map-side partial
           aggregation applies, so executor memory is O(k) per sub-group;
  stage 2: group by g — merge S sorted candidate lists (≤ S·k rows per
           group) and keep the global top-k.

Per-group state is O(k·S) regardless of group size — the hot-group sort
never happens. This mirrors what Spark's TakeOrderedAndProject does
globally, applied per group.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    k: int,
    payload_cols: Sequence[str] = (),
    descending: bool = True,
    num_salts: int = 16,
) -> DataFrame:
    """Top-``k`` rows per group by ``order_col``; ties break on payload.

    Output: ``*group_cols, rank (1-based), order_col, *payload_cols``.
    Deterministic: the struct sort key is (order_col, *payload_cols)
    compared lexicographically, all fields in the same direction — with
    ``descending=True`` ties on the order column resolve by payload
    DESCENDING (SQL equivalent: ``ORDER BY o DESC, payload DESC``).
    """
    asc = not descending
    item = F.struct(F.col(order_col).alias("__o"), *[F.col(c) for c in payload_cols])
    salt = F.pmod(F.xxhash64(*(payload_cols or (order_col,))), F.lit(num_salts))
    s1 = (
        df.withColumn("__salt", salt)
        .groupBy(*group_cols, "__salt")
        .agg(F.slice(F.sort_array(F.collect_list(item), asc=asc), 1, k).alias("__top"))
    )
    s2 = s1.groupBy(*group_cols).agg(
        F.slice(
            F.sort_array(F.flatten(F.collect_list("__top")), asc=asc), 1, k
        ).alias("__top")
    )
    return s2.select(
        *group_cols, F.posexplode("__top").alias("__pos", "__item")
    ).select(
        *group_cols,
        (F.col("__pos") + 1).alias("rank"),
        F.col("__item.__o").alias(order_col),
        *[F.col(f"__item.{c}").alias(c) for c in payload_cols],
    )
