"""Link-graph analytics: distributed PageRank over an edge list.

Why in an LLM-data engine: domain/host authority is a standard crawl-
curation signal — Common-Crawl-scale pipelines weight or gate documents by
the rank of their host in the link graph (harmonic/PageRank centrality)
before the text ever reaches quality scoring. The reference has no graph
surface; this is the iterative-algorithm family (alongside
``dedup.duplicate_components``) expressed Spark-first.

Scale shape per iteration: ONE equi-join of the edge list with the rank
state (shuffle keyed on src), one hash aggregation keyed on dst, and the
dangling mass as a broadcast one-row aggregate (no per-iteration driver
collect). State is (node, rank): |V| rows, re-checkpointed every
iteration so the plan never grows with the iteration count. At
1000-executor scale, pre-partition ``edges`` by ``src`` once (bucketing)
and every iteration's join co-locates against the similarly-partitioned
rank state.

Determinism contract: ranks are stored as BIGINT units of 1e-10 — every
sum is exact integer arithmetic, and the only floating ops are over
values that convert from BIGINT EXACTLY (< 2^53), so each iteration is
bit-identical under any partitioning AND across engines. (A DECIMAL
formulation is NOT enough: DuckDB's DECIMAL->DOUBLE conversion
double-rounds — hugeint-to-double then /10^scale — while Spark's
BigDecimal.doubleValue rounds once, so round-at-1e-10 boundaries can
flip between engines. Integer units dodge the conversion entirely; the
unrolled-CTE oracle in plans/graph_queries.py mirrors the exact same
integer recipe.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# rank stored as integer units of 1e-10: |V| * SCALE stays far below 2^53
# for any graph whose node table fits a driver-side count
RANK_SCALE = 10_000_000_000


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 10,
    tol: float | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank over a directed edge list; returns ``(node, rank)`` with
    ``rank`` as double (internally exact 1e-10 integer units).

    Ranks follow the 1-initialized form, total mass ~|V|:
    ``rank(v) = (1-d) + d * (sum_{u->v} rank(u)/outdeg(u) + dangling/|V|)``
    with dangling mass (rank of nodes without out-edges) redistributed
    uniformly. Parallel edges should be pre-deduplicated by the caller if
    they are not meant to double-count.

    ``tol`` (optional) stops early when the max per-node change drops
    below it — at the cost of one extra aggregation per iteration; leave
    None for a fixed, cross-engine-reproducible iteration count.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError("momyre: damping must be in (0, 1)")
    if max_iter < 1:
        raise ValueError("momyre: max_iter must be >= 1")
    d = float(damping)
    base_units = (1.0 - d) * float(RANK_SCALE)

    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("__deg")
    ).localCheckpoint(eager=True)

    state = nodes.withColumn("units", F.lit(RANK_SCALE).cast("bigint"))
    for _ in range(max_iter):
        with_deg = state.join(deg, "node", "left")
        # dangling mass as a broadcast 1-row integer aggregate
        dang_frame = with_deg.filter(F.col("__deg").isNull()).agg(
            F.coalesce(F.sum("units"), F.lit(0)).cast("bigint").alias("__dang")
        )
        contribs = (
            e.join(
                with_deg.filter(F.col("__deg").isNotNull()).select(
                    F.col("node").alias("src"), "units", "__deg"
                ),
                "src",
            )
            .select(
                F.col("dst").alias("node"),
                F.floor(
                    F.col("units").cast("double") / F.col("__deg")
                    + F.lit(0.5)
                ).cast("bigint").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        new_state = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dang_frame))
            .select(
                "node",
                F.floor(
                    F.lit(base_units)
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("__in"), F.lit(0)).cast("double")
                        + F.col("__dang").cast("double")
                        / F.lit(float(n_nodes))
                    )
                    + F.lit(0.5)
                ).cast("bigint").alias("units"),
            )
        )
        if tol is not None:
            delta = (
                new_state.alias("n")
                .join(state.alias("o"), "node")
                .agg(
                    F.max(
                        F.abs(F.col("n.units") - F.col("o.units"))
                    ).alias("d")
                )
                .collect()[0]["d"]
            )
            state = new_state.localCheckpoint(eager=True)
            if delta is not None and delta < tol * RANK_SCALE:
                break
        else:
            # cut lineage so the plan stays iteration-count-independent
            state = new_state.localCheckpoint(eager=True)
    return state.select(
        "node",
        (F.col("units").cast("double") / F.lit(float(RANK_SCALE))).alias(
            "rank"
        ),
    )
