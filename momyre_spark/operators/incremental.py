"""Incremental aggregate maintenance: merge a delta into a maintained agg.

At 100 TB the difference between "recompute the aggregate over the whole
table" and "fold today's delta into yesterday's aggregate" is the difference
between scanning 100 TB and scanning the delta. The reference has no
aggregate surface at all; this is the standard warehouse pattern expressed
Spark-first: the maintained aggregate lives as a (small, per-group) table,
each micro-batch/partition of new rows is pre-aggregated with map-side
partials, and the two are combined group-wise.

Mergeable aggregates supported (``kind``):
- ``count``  — merged by SUM; retractable with ``weight_col`` (+1/-1);
- ``sum``    — merged by SUM; retractable with ``weight_col``;
- ``min``/``max`` — merged by MIN/MAX; only valid for *insert-only* deltas
  (a retraction could remove the current extremum — that needs a full
  recompute or an exact-NDV sketch per group, deliberately out of scope).

Plan shape: ``agg(delta)`` is one hash aggregate over the delta only;
``unionByName`` + second group-by touches |groups(base)| + |groups(delta)|
rows — both sides already aggregated, so the final exchange is tiny and
broadcast-joinable against serving queries. The base table is NEVER
rescanned.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def _delta_expr(kind: str, src: str | None, weight_col: str | None) -> Column:
    if kind == "count":
        if weight_col:
            return F.sum(F.col(weight_col))
        return F.count(F.lit(1))
    if kind == "sum":
        assert src is not None
        if weight_col:
            return F.sum(F.col(src) * F.col(weight_col))
        return F.sum(src)
    if kind in ("min", "max"):
        assert src is not None
        if weight_col:
            raise ValueError(f"{kind} is not retractable; drop weight_col")
        return _MERGE[kind](src)
    raise ValueError(f"unknown aggregate kind: {kind}")


def aggregate_delta(
    delta: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str | None]],
    weight_col: str | None = None,
) -> DataFrame:
    """Pre-aggregate a delta batch to the maintained-aggregate schema.

    ``aggs`` maps output column -> (kind, source column). With
    ``weight_col`` set, each delta row carries +1 (insert) / -1 (retract)
    and count/sum become signed folds.
    """
    return delta.groupBy(*keys).agg(
        *[
            _delta_expr(kind, src, weight_col).alias(out)
            for out, (kind, src) in aggs.items()
        ]
    )


def merge_aggregates(
    base_agg: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str | None]],
    weight_col: str | None = None,
    delta_is_aggregated: bool = False,
) -> DataFrame:
    """Fold ``delta`` into the maintained aggregate ``base_agg``.

    ``base_agg`` must already have the output schema (keys + agg columns).
    Groups appearing only in one side pass through; groups in both merge
    with the aggregate's combine function. A count that reaches 0 under
    retractions keeps its row (count=0) — dropping it is a policy choice
    left to the caller (``.filter("cnt > 0")``).
    """
    d = (
        delta
        if delta_is_aggregated
        else aggregate_delta(delta, keys, aggs, weight_col)
    )
    cols = [*keys, *aggs]
    merged = base_agg.select(*cols).unionByName(d.select(*cols))
    return merged.groupBy(*keys).agg(
        *[_MERGE[kind](out).alias(out) for out, (kind, _) in aggs.items()]
    )


def refresh_aggregate_from_cdf(
    base_agg: DataFrame,
    cdf: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str | None]],
    change_col: str = "__change",
) -> DataFrame:
    """Incrementally refresh a maintained aggregate from a CHANGE FEED — the
    materialized-view maintenance loop over the snapshot store:

        v1 full aggregate  ->  snapshot_diff(v1, v2, images=True)  ->
        refresh_aggregate_from_cdf  ==  full aggregate of v2

    ``cdf`` is the Delta-CDF row shape ``snapshot_diff(..., images=True)``
    emits: insert / delete / update_preimage / update_postimage, pre-images
    carrying the OLD values. Each row becomes a signed delta (+1 for
    insert/postimage, -1 for delete/preimage) folded in with
    :func:`merge_aggregates` — so the refresh scans only the CHANGED rows,
    never the table. Only retractable kinds (count/sum) are valid; min/max
    under deletes needs a recompute (enforced by aggregate_delta)."""
    for out, (kind, _src) in aggs.items():
        if kind in ("min", "max"):
            raise ValueError(
                f"{out}: {kind} is not retractable — a delete may remove "
                "the extremum; recompute that column instead"
            )
    signed = cdf.withColumn(
        "__weight",
        F.when(
            F.col(change_col).isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1)),
    )
    return merge_aggregates(
        base_agg, signed, keys, aggs, weight_col="__weight"
    )


def refresh_join_from_cdf(
    mat: DataFrame,
    left_new: DataFrame,
    right_new: DataFrame,
    cdf_left: DataFrame | None,
    cdf_right: DataFrame | None,
    join_col: str,
    how: str = "inner",
) -> DataFrame:
    """Incrementally refresh a materialized equi-join (``how``: inner or
    left) from change feeds — the join-view counterpart of
    :func:`refresh_aggregate_from_cdf`, via the dirty-key strategy:

        M_new = M_old ⋉̸ dirty  ∪  (L_new ⋉ dirty) ⋈ (R_new ⋉ dirty)

    ``dirty`` is every join-key value any change touched, from BOTH image
    sides: an update that moves a row to a different join key dirties the
    old key (pre-image) and the new one (post-image), so both neighborhoods
    rebuild. The change TYPE is deliberately not consumed: any key a
    change row touches is dirty, whatever the row was. Correct for any multiplicity on either side — the dirty
    neighborhoods are recomputed from current state, everything else is
    carried over untouched.

    Scale shape: dirty keys are change-sized, so the anti/semi joins
    broadcast and the recompute scans only the dirty slices of each side
    (partition/bucket pruning when the tables are laid out on the join
    key) — the view never recomputes, and the base tables never fully
    rescan. ``mat``'s columns must equal the join projection's (it IS a
    prior output of the same join). Join keys must be NON-NULL: a NULL
    key never matches the dirty-set anti/semi joins, so changes to
    NULL-key rows could not invalidate their carried view rows — filter
    or surrogate NULL keys upstream (an inner join drops them anyway)."""
    parts = [
        c.select(F.col(join_col)) for c in (cdf_left, cdf_right)
        if c is not None
    ]
    if not parts:
        return mat
    dirty = parts[0]
    for p in parts[1:]:
        dirty = dirty.unionByName(p)
    dirty = dirty.distinct()
    if how not in ("inner", "left"):
        raise ValueError(f"refresh_join_from_cdf: unsupported how={how!r}")
    kept = mat.join(dirty, join_col, "left_anti")
    l = left_new.join(dirty, join_col, "left_semi")
    r = right_new.join(dirty, join_col, "left_semi")
    return kept.unionByName(l.join(r, join_col, how).select(*mat.columns))


def refresh_star_join_from_cdf(
    mat: DataFrame,
    fact_new: DataFrame,
    dims: dict[str, tuple[DataFrame, DataFrame | None]],
    cdf_fact: DataFrame | None,
    fact_key: str,
    how: str = "inner",
) -> DataFrame:
    """Incrementally refresh a materialized STAR join (fact + N dims, each
    dim equi-joined to the fact on its own column) from change feeds — the
    multi-table lift of :func:`refresh_join_from_cdf`:

        M_new = M_old minus every dirty neighborhood
              ∪ (dirty fact rows) ⋈ dim_1 ⋈ ... ⋈ dim_N

    Dirtiness is tracked per join surface: a fact change dirties that fact
    ROW (by ``fact_key`` — fact rows have identity, unlike the keyed
    neighborhoods of the 2-table case); a dim change dirties every view
    row joined through the touched dim-key value, from BOTH images (a dim
    row that moves its join-key value invalidates the old neighborhood and
    populates the new one). The rebuild set is the union of (a) changed
    fact rows and (b) surviving fact rows in any dirty dim neighborhood —
    assembled as an EXCLUSIVE anti-then-semi chain so a fact row picked up
    by several dirty surfaces rebuilds exactly once, with no uniqueness
    assumption on any key.

    Scale shape: every dirty set is change-sized, so the anti/semi joins
    broadcast; the carried view rows never rescan, and the dim joins in
    the rebuild see only the rebuild slice on the probe side (dims are
    the build/broadcast side in a star). ``mat`` must carry ``fact_key``
    and every dim join column (it IS a prior output of the same join
    projection). Join keys must be NON-NULL, as in the 2-table case."""
    if how not in ("inner", "left"):
        raise ValueError(f"refresh_star_join_from_cdf: unsupported how={how!r}")
    surfaces: list[tuple[str, DataFrame]] = []
    if cdf_fact is not None:
        surfaces.append((fact_key, cdf_fact.select(fact_key).distinct()))
    for col, (_dim, cdf) in dims.items():
        if cdf is not None:
            surfaces.append((col, cdf.select(col).distinct()))
    if not surfaces:
        return mat
    kept = mat
    for col, dirty in surfaces:
        kept = kept.join(dirty, col, "left_anti")
    remaining = fact_new
    picked: list[DataFrame] = []
    for col, dirty in surfaces:
        picked.append(remaining.join(dirty, col, "left_semi"))
        remaining = remaining.join(dirty, col, "left_anti")
    rebuild = picked[0]
    for p in picked[1:]:
        rebuild = rebuild.unionByName(p)
    for col, (dim, _cdf) in dims.items():
        rebuild = rebuild.join(dim, col, how)
    return kept.unionByName(rebuild.select(*mat.columns))
