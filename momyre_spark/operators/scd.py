"""Slowly-changing-dimension (SCD Type-2) history from a CDC ops stream.

The reference replicator materializes only the *latest* state per key
(``/root/reference/app/mysql.go:292-355`` upsert/delete). A training-data /
analytics pipeline usually also wants the full change history as validity
intervals — "what did this row look like at time T" — which the reference
cannot answer. ``scd2_history`` derives that view from the same ops stream
the CDC apply consumes (operators/cdc.py IR: key, order columns, op,
payload columns).

Semantics:
- every non-delete op opens a version valid from its own (order) position;
- a version closes at the NEXT op for the same key (any op, including the
  delete that removes the row); the last open version has ``valid_to`` NULL
  and ``is_current`` true;
- delete ops emit no version row themselves — they only close their
  predecessor (the key simply has no current version afterwards).

Plan shape at 100 TB: ONE hash exchange on the key + one window sort —
``lead()`` over (key, order) is the whole algorithm. No join, no second
shuffle; at scale this is the same cost class as the latest-state merge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from momyre_spark.operators.cdc import DELETE


def scd2_history(
    ops: DataFrame,
    key: str = "_id",
    order: Sequence[str] = ("ts", "seq"),
    op_col: str = "op",
    value_cols: Sequence[str] = (),
) -> DataFrame:
    """Validity-interval (SCD2) rows from an ops log.

    Output columns: ``key``, ``*value_cols``, ``valid_from_<o>`` for each
    order column, ``valid_to`` (first order column of the next op, NULL if
    open) and ``is_current``.
    """
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order])
    nxt = F.lead(F.struct(*[F.col(c) for c in order])).over(w)
    first_o = order[0]
    return (
        ops.withColumn("__next", nxt)
        .filter(F.col(op_col) != DELETE)
        .select(
            key,
            *value_cols,
            *[F.col(c).alias(f"valid_from_{c}") for c in order],
            F.col(f"__next.{first_o}").alias("valid_to"),
            F.col("__next").isNull().alias("is_current"),
        )
    )
