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


def point_in_time_join(
    probe: DataFrame,
    history: DataFrame,
    key: str = "_id",
    ts_col: str = "ts",
    valid_from_col: str = "valid_from_ts",
    valid_to_col: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Join each probe row to the dimension version valid AT its
    timestamp: ``valid_from <= probe.ts < valid_to`` (open versions have
    ``valid_to`` NULL) — "what did this row look like when the event
    happened", the time-travel lookup the latest-state replica cannot
    answer.

    Input ``history`` is :func:`scd2_history` output (or any frame with
    half-open validity intervals per key). Because a key's intervals
    partition its timeline (SCD2 closes each version at the next op's
    position; equal-position duplicates produce zero-length intervals
    that match nothing), every probe row matches AT MOST one version —
    probes inside a delete gap match none (dropped under ``how='inner'``,
    NULL-padded under ``'left'``).

    Plan shape at 100 TB: ONE hash equi-join keyed on ``key`` — the
    interval predicate is a post-join filter, so per-probe fan-out before
    filtering is that key's version count (bounded by change frequency,
    not corpus size). No range/BNLJ join anywhere; both sides shuffle on
    the same key, so pre-bucketing either table by ``key`` co-locates the
    join. Output: every probe column plus the history's value columns
    (its key column dropped).
    """
    if how not in ("inner", "left"):
        raise ValueError("momyre: how must be 'inner' or 'left'")
    p = probe.alias("__p")
    h = history.alias("__h")
    pk, hk = F.col(f"__p.{key}"), F.col(f"__h.{key}")
    pts = F.col(f"__p.{ts_col}")
    vfrom, vto = F.col(f"__h.{valid_from_col}"), F.col(f"__h.{valid_to_col}")
    cond = (
        (pk == hk)
        & (vfrom <= pts)
        & (vto.isNull() | (pts < vto))
    )
    keep = [F.col(f"__p.{c}") for c in probe.columns] + [
        F.col(f"__h.{c}") for c in history.columns if c != key
    ]
    return p.join(h, cond, how).select(*keep)
