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

# default rank resolution: integer units of 1e-10. pagerank() coarsens
# this per graph (divide by 10) whenever |V| * scale would cross the 2^53
# exact-integer range, so large graphs trade resolution, never exactness
RANK_SCALE = 10_000_000_000

# lineage-cut cadence in the fixed-iteration path: checkpoint every N
# rounds instead of every round (values are exact integers, so the cadence
# cannot change results — it only trades plan depth for fewer jobs)
_CUT_EVERY = 3


def _resolve_scale(n_nodes: int, scale: int | None = None) -> int:
    """Largest power-of-10 rank scale (<= RANK_SCALE) keeping every unit
    sum below 2^53 — total mass is ~|V|, so the bound is |V| * scale.
    Raises only when even 1e-4 units would overflow (~9e14 nodes, beyond
    any driver-side node count)."""
    if scale is None:
        scale = RANK_SCALE
    while n_nodes * scale >= 2**53 and scale > 10_000:
        scale //= 10
    if n_nodes * scale >= 2**53:
        raise ValueError(
            f"momyre: {n_nodes} nodes exceeds the 2^53 exact-integer range "
            "even at 1e-4 rank units; shard the graph"
        )
    return scale


def _pagerank_driver(
    spark,
    probe,
    id_type,
    d: float,
    max_iter: int,
    tol: float | None,
    seeds: DataFrame | None,
    seed_col: str,
) -> DataFrame:
    """Driver-side numpy twin of the distributed iteration — BIT-EXACT by
    construction: every step is either an exact int64 operation (degree
    counts, per-node contribution sums, dangling mass — order-free) or a
    single correctly-rounded IEEE-754 double op replicated in the same
    tree shape as the Spark expression (`base + d * (in + dang/n)`,
    `floor(units/deg + 0.5)`). numpy float64 and the JVM double agree on
    every single operation, so 10 iterations agree bit-for-bit — pinned
    by test_pagerank_driver_fast_path_matches_distributed and by every
    unrolled-CTE oracle row."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        [
            StructField("node", id_type, False),
            StructField("rank", DoubleType(), False),
        ]
    )
    if len(probe) == 0:
        # a fully-filtered upstream yields zero edges; the distributed
        # loop returns an empty (node, rank) frame, so the twin must too
        # (the n=0 update below would divide dangling mass by zero)
        return spark.createDataFrame([], schema=schema)
    src = probe["src"].to_numpy()
    dst = probe["dst"].to_numpy()
    nodes = np.unique(np.concatenate([src, dst]))
    n = int(len(nodes))
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    scale = _resolve_scale(n)
    deg = np.bincount(si, minlength=n).astype(np.int64)
    has_out = deg > 0
    units = np.full(n, scale, dtype=np.int64)
    base_units = (1.0 - d) * float(scale)
    isseed = None
    if seeds is not None:
        sd = seeds.select(F.col(seed_col).alias("node")).distinct().toPandas()
        isseed = np.isin(nodes, sd["node"].to_numpy())
        n_seeds = int(isseed.sum())
        if n_seeds == 0:
            raise ValueError(
                "momyre: no seed node intersects the graph's node set"
            )
        # same double op order as the distributed form:
        # ((1-d) * M) / S with M = |V|*scale as one exact int->double
        seed_base = (1.0 - d) * float(n * scale) / float(n_seeds)
    for _ in range(max_iter):
        dang = int(units[~has_out].sum())
        c = np.floor(
            units[si].astype(np.float64) / deg[si].astype(np.float64) + 0.5
        ).astype(np.int64)
        inm = np.zeros(n, dtype=np.int64)
        np.add.at(inm, di, c)
        in_f = inm.astype(np.float64)
        if isseed is None:
            upd = base_units + d * (in_f + float(dang) / float(n))
        else:
            upd = np.where(isseed, seed_base, 0.0) + d * (
                in_f
                + np.where(isseed, float(dang) / float(n_seeds), 0.0)
            )
        new_units = np.floor(upd + 0.5).astype(np.int64)
        if tol is not None:
            delta = int(np.abs(new_units - units).max()) if n else 0
            units = new_units
            if delta < tol * scale:
                break
        else:
            units = new_units
    out = pd.DataFrame(
        {"node": nodes, "rank": units.astype(np.float64) / float(scale)}
    )
    return spark.createDataFrame(out, schema=schema)


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 10,
    tol: float | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_dir: str | None = None,
    seeds: DataFrame | None = None,
    seed_col: str = "node",
    driver_edge_gate: int = 1_000_000,
) -> DataFrame:
    """PageRank over a directed edge list; returns ``(node, rank)`` with
    ``rank`` as double (internally exact integer units, 1e-10 by default —
    auto-coarsened on graphs large enough to threaten 2^53 exactness).

    Ranks follow the 1-initialized form, total mass ~|V|:
    ``rank(v) = (1-d) + d * (sum_{u->v} rank(u)/outdeg(u) + dangling/|V|)``
    with dangling mass (rank of nodes without out-edges) redistributed
    uniformly. Parallel edges should be pre-deduplicated by the caller if
    they are not meant to double-count.

    ``tol`` (optional) stops early when the max per-node change drops
    below it — at the cost of one extra aggregation per iteration; leave
    None for a fixed, cross-engine-reproducible iteration count.

    ``checkpoint_dir``: per-iteration lineage cuts default to
    ``localCheckpoint`` — blocks pinned to their executors, fine in local
    mode but NOT fault-tolerant (an executor lost at iteration 9 of 10
    kills the run on a real cluster). Pass a reliable (HDFS/object-store)
    directory for durable cuts: each cut is an explicit parquet
    write+read under a per-run subdirectory, an executor loss recovers
    from files, a SUPERSEDED state cut is deleted as soon as the next one
    lands (the run holds at most nodes+degrees+two state versions, never
    one copy per iteration), and everything but the FINAL state is
    removed before returning. The session's global checkpoint location is
    never touched. The returned frame reads the final cut's files: the
    caller owns ``checkpoint_dir`` cleanup once the results are consumed. Exactness contract:
    every integer sum stays < 2^53 — on large graphs the rank scale
    AUTO-COARSENS (divides by 10 until ``|V| * scale < 2^53``, i.e. a
    10M-node graph runs at 1e-9-unit resolution instead of failing), and
    only a graph too large for even 1e-4 units raises. Within the active
    scale ranks are bit-identical under any partitioning and across
    engines.

    ``seeds`` (optional) personalizes the walk: teleport mass — the
    ``(1-d)`` restart AND the dangling redistribution — lands uniformly
    on the SEED nodes only instead of all nodes, i.e. personalized
    PageRank over the seed set (seed-proximity authority: rank hosts by
    link distance to a trusted allowlist, the crawl-curation use). Seeds
    outside the graph's node set are ignored; an empty effective seed
    set raises. State still initializes uniform (fixed-iteration results
    stay engine-reproducible); total mass remains ~|V|. ``seeds=None``
    is the classic uniform walk, bit-identical to previous behavior.

    ``driver_edge_gate``: the same data-driven small-graph fast path as
    ``dedup.duplicate_components`` — PageRank's graphs here are usually
    ENTITY graphs (domains, vocabulary terms), orders of magnitude
    smaller than the corpus that emitted them, yet the distributed loop
    pays 10 rounds of join+agg job latency. A limit-probe (one bounded
    action, never a second upstream scan) detects an edge list at or
    under the gate and runs the BIT-EXACT numpy twin of the iteration on
    the driver (see ``_pagerank_driver`` — every step is an exact int64
    sum or the same single IEEE double op tree). Over the gate, or
    whenever ``checkpoint_dir`` is set (the caller explicitly asked for
    durable distributed cuts — that machinery must actually run), the
    distributed loop is unchanged. ``driver_edge_gate=0`` forces it.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError("momyre: damping must be in (0, 1)")
    if max_iter < 1:
        raise ValueError("momyre: max_iter must be >= 1")
    d = float(damping)

    spark = edges.sparkSession
    if driver_edge_gate and checkpoint_dir is None:
        e0 = edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        probe = e0.limit(driver_edge_gate + 1).toPandas()
        if len(probe) <= driver_edge_gate:
            return _pagerank_driver(
                spark,
                probe,
                e0.schema["src"].dataType,
                d,
                max_iter,
                tol,
                seeds,
                seed_col,
            )
    run_dir = None
    ckpt_paths: list[str] = []
    ckpt_seq = 0
    prev_state_path: str | None = None
    if checkpoint_dir is not None:
        import uuid

        run_dir = f"{checkpoint_dir.rstrip('/')}/pagerank-{uuid.uuid4().hex[:12]}"

    def _rm(path: str) -> None:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        p.getFileSystem(conf).delete(p, True)

    def _persistent():
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {e.getKey(): e.getValue() for e in m.entrySet().toArray()}

    # ownership tracking (same rationale as dedup.duplicate_components):
    # release only block ids OUR eager cuts created, never an entry-diff —
    # a concurrent job on this session may persist blocks at any moment
    owned: set[int] = set()
    last_ids: set[int] = set()

    def _cut(df: DataFrame, state_chain: bool = False) -> DataFrame:
        nonlocal last_ids, prev_state_path, ckpt_seq
        if run_dir is not None:
            # monotonically numbered: deriving the name from the list
            # length would REUSE an index after a superseded path is
            # removed, making a later cut overwrite the very directory
            # its input is being read from mid-job
            path = f"{run_dir}/cut-{ckpt_seq}"
            ckpt_seq += 1
            ckpt_paths.append(path)
            df.write.mode("overwrite").parquet(path)
            out = spark.read.parquet(path)
            if state_chain:
                # the new state no longer references the previous one —
                # drop it now, so the run never holds O(iterations) copies
                if prev_state_path is not None:
                    _rm(prev_state_path)
                    ckpt_paths.remove(prev_state_path)
                prev_state_path = path
            return out
        before = set(_persistent())
        out = df.localCheckpoint(eager=True)
        last_ids = set(_persistent()) - before
        owned.update(last_ids)
        return out

    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    # cut the edge list ONCE at entry: every iteration's contribution join
    # re-reads it, and uncut it would re-execute the caller's edge DAG
    # (scan/generator + its distinct exchange) inside every lineage-cut
    # job — ~3 re-executions per cut at _CUT_EVERY=3 (guide §2.4: do the
    # work once, reuse the layout). On the durable path this is a parquet
    # cut like the state cuts, so executor loss recovers the edges from
    # files too.
    e = _cut(e)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # total mass stays ~|V| (the formulation conserves it), so every unit
    # sum — per-node in-mass, dangling mass — is bounded by |V|*scale.
    # Past 2^53 the BIGINT->DOUBLE steps stop being exact (and int64 wraps
    # silently near 2^63 under non-ANSI Spark): coarsen the rank
    # resolution instead of degrading silently, and refuse only when even
    # 1e-4 units would overflow (~9e16 nodes — beyond any driver count).
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("__deg")
    )

    # out-degree is STATIC across iterations, so join it into the anchor
    # (and therefore into every new state) ONCE instead of re-joining
    # state with deg at the top of every iteration (guide §2.1: a
    # per-iteration node-sized join — evaluated twice per round, once
    # under the dangling aggregate and once under the contributions —
    # for a value that never changes). The state rows simply carry
    # ``__deg`` along; every arithmetic step is unchanged, so the units
    # (and the unrolled-CTE oracles) are bit-identical.
    #
    # nodes, the seed flag, and the degree join land in ONE anchor cut
    # instead of three chained cuts (nodes, seed_flagged/deg, anchor):
    # each cut is a full materialization job (a parquet write+read on
    # the durable path), and on the entity-sized graphs this operator
    # sees, per-job latency — not data — is the whole cost. |V| and |S|
    # are read off the cut anchor afterwards, so the counts (and the
    # scale/seed_base derived from them) are unchanged.
    # |V|, |S| and the dangling-node count come off the cut anchor in ONE
    # aggregation job (counts are exact whatever the grouping): the seeds
    # path previously paid two separate count actions, and the dangling
    # count is new — it gates the per-iteration dangling machinery below.
    if seeds is not None:
        seed_set = seeds.select(F.col(seed_col).alias("node")).distinct()
        anchor = _cut(
            nodes.join(
                seed_set.withColumn("__isseed", F.lit(True)), "node", "left"
            )
            .select(
                "node",
                F.coalesce(F.col("__isseed"), F.lit(False)).alias("__isseed"),
            )
            .join(deg, "node", "left")
        )
        counts = anchor.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("__isseed"), F.lit(1))).alias("s"),
            F.count(F.when(F.col("__deg").isNull(), F.lit(1))).alias("g"),
        ).collect()[0]
        n_nodes, n_seeds, n_dang = counts["n"], counts["s"], counts["g"]
        if n_seeds == 0:
            raise ValueError(
                "momyre: no seed node intersects the graph's node set"
            )
    else:
        anchor = _cut(nodes.join(deg, "node", "left"))
        counts = anchor.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("__deg").isNull(), F.lit(1))).alias("g"),
        ).collect()[0]
        n_nodes, n_dang = counts["n"], counts["g"]
        n_seeds = 0
    scale = _resolve_scale(n_nodes)
    base_units = (1.0 - d) * float(scale)
    seed_base = 0.0
    if seeds is not None:
        # teleport share 1/|S| of the total mass |V|*scale — the double
        # op order ((1-d) * M) / S is the determinism contract the
        # unrolled oracle mirrors
        seed_base = (1.0 - d) * float(n_nodes * scale) / float(n_seeds)

    state = anchor.withColumn("units", F.lit(scale).cast("bigint"))
    # Dangling machinery is DATA-GATED: with zero dangling nodes (every
    # node has out-edges — common for symmetrized / link graphs) __dang
    # is the exact integer 0 every iteration, so its whole pipeline — a
    # state-sized filter+aggregate, a broadcast exchange and a crossJoin,
    # per iteration — computes a term that contributes +0.0. Skipping it
    # is bit-identical: coal_in >= 0.0, and x + 0.0 == x for every
    # non-negative IEEE double (the oracle's op tree evaluates the same
    # zero term). With any dangling node present the full path runs
    # unchanged. The gate is decided once from the anchor counts above —
    # the AQE move: runtime data, not configuration.
    for it in range(max_iter):
        # dangling mass as a broadcast 1-row integer aggregate
        dang_frame = None
        if n_dang > 0:
            dang_frame = state.filter(F.col("__deg").isNull()).agg(
                F.coalesce(F.sum("units"), F.lit(0))
                .cast("bigint")
                .alias("__dang")
            )
        contribs = (
            e.join(
                state.filter(F.col("__deg").isNotNull()).select(
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
        coal_in = F.coalesce(F.col("__in"), F.lit(0)).cast("double")
        if n_dang == 0:
            if seeds is None:
                upd = F.lit(base_units) + F.lit(d) * coal_in
            else:
                upd = F.when(
                    F.col("__isseed"), F.lit(seed_base)
                ).otherwise(F.lit(0.0)) + F.lit(d) * coal_in
            new_state = anchor.join(contribs, "node", "left").select(
                anchor["*"],
                F.floor(upd + F.lit(0.5)).cast("bigint").alias("units"),
            )
        elif seeds is None:
            upd = F.lit(base_units) + F.lit(d) * (
                coal_in
                + F.col("__dang").cast("double") / F.lit(float(n_nodes))
            )
            new_state = (
                anchor.join(contribs, "node", "left")
                .crossJoin(F.broadcast(dang_frame))
                .select(
                    anchor["*"],
                    F.floor(upd + F.lit(0.5)).cast("bigint").alias("units"),
                )
            )
        else:
            upd = F.when(F.col("__isseed"), F.lit(seed_base)).otherwise(
                F.lit(0.0)
            ) + F.lit(d) * (
                coal_in
                + F.when(
                    F.col("__isseed"),
                    F.col("__dang").cast("double")
                    / F.lit(float(n_seeds)),
                ).otherwise(F.lit(0.0))
            )
            new_state = (
                anchor.join(contribs, "node", "left")
                .crossJoin(F.broadcast(dang_frame))
                .select(
                    anchor["*"],
                    F.floor(upd + F.lit(0.5)).cast("bigint").alias("units"),
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
            state = _cut(new_state, state_chain=True)
            if delta is not None and delta < tol * scale:
                break
        else:
            # cut lineage every few iterations (and at the end) so the
            # plan stays bounded without paying one full materialization
            # job per iteration — each job's plan is then at most
            # _CUT_EVERY join+agg rounds deep, and wall-clock is dominated
            # by the joins, not 10x fixed scheduling overhead. Values are
            # exact integers: cut frequency cannot change the result.
            # skip a periodic cut that lands within one round of the
            # final mandatory cut (e.g. 10 iterations at _CUT_EVERY=3
            # cut after rounds 3 AND 10 back to back): the final cut
            # covers it, and on the durable path each skipped cut is a
            # whole parquet write+read+delete cycle
            if it == max_iter - 1 or (
                (it + 1) % _CUT_EVERY == 0 and max_iter - 1 - it >= 2
            ):
                state = _cut(new_state, state_chain=True)
            else:
                state = new_state
    # release every intermediate lineage-cut block (nodes, deg, earlier
    # rounds) — only the final state's block(s) (the last cut's ids) back
    # the returned frame. Only OWNED ids are touched, so a concurrent
    # job's blocks are never clobbered.
    for rid, j in _persistent().items():
        if rid in owned and rid not in last_ids:
            j.unpersist(False)
    if run_dir is not None:
        # only the FINAL state's files back the returned frame — the
        # nodes/degrees cuts (and any non-superseded leftovers) go now
        for path in list(ckpt_paths):
            if path != prev_state_path:
                _rm(path)
    return state.select(
        "node",
        (F.col("units").cast("double") / F.lit(float(scale))).alias(
            "rank"
        ),
    )


def connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components of an UNDIRECTED graph: ``(node, component)``
    with the component labeled by its smallest node id — the graph-level
    face of the same min-label propagation the dedup module runs over
    near-duplicate pair lists (``dedup.duplicate_components``; two hash
    aggregations per round, O(log diameter) rounds, no driver-side
    graph). Directed edges are treated as undirected — pass each edge
    once, direction irrelevant."""
    from momyre_spark.operators.dedup import duplicate_components

    pairs = edges.select(
        F.col(src_col).alias("a_id"), F.col(dst_col).alias("b_id")
    )
    return duplicate_components(
        pairs, max_iterations=max_iterations
    ).select(F.col("id").alias("node"), "component")


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle participation over an undirected graph —
    ``(node, n_triangles)`` for every node in at least one triangle. The
    local-clustering signal under community/spam heuristics.

    Shape: edges canonicalize to a < b (each undirected edge once), then
    two hash equi-joins enumerate wedges a-b-c (a < b < c) and close them
    against the edge set — every triangle is found exactly once in its
    canonical orientation, so no post-hoc dedup. Cost is the classic
    O(sum of wedge counts); at scale the first join keys on the wedge
    midpoint, so skew follows the degree distribution (salt hot nodes via
    skew.salted_join if one hub dominates)."""
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    ab = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    bc = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = ab.join(bc, "y").select("x", "y", "z")
    closing = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = wedges.join(closing, ["x", "z"])
    return (
        tri.select(
            F.explode(F.array("x", "y", "z")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )


def kcore(
    edges: DataFrame,
    k: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 30,
    driver_edge_gate: int = 1_000_000,
) -> DataFrame:
    """The k-core of an undirected simple graph: the maximal induced
    subgraph in which every node has degree >= k. Returns ``(node,
    degree)`` — the degree WITHIN the core — for every core member
    (empty frame if the core is empty).

    Why in an LLM-data engine: the dense core of a link graph is where
    spam farms and mirror rings live; crawl curation gates or down-weights
    hosts by coreness the same way it uses PageRank (graph.pagerank) and
    clustering (clustering_coefficients). This is the classic peeling
    algorithm expressed Spark-first: each round is ONE degree aggregation
    (explode both endpoints, hash agg) and one semi-join of the edge list
    against the surviving nodes — no driver-side graph, the only driver
    value per round is the survivor COUNT (the fixpoint test). Rounds are
    bounded by the peeling depth (<= longest degeneracy chain, typically
    << 30); lineage is cut every round so the plan never grows.

    Determinism: pure set operations on integer-keyed rows — no floats
    anywhere — so the fixpoint is engine-exact and the registered query
    (plans/graph_queries.py) carries a full value-hash oracle with the
    peel UNROLLED as chained CTEs.

    ``driver_edge_gate``: the same data-driven small-graph fast path as
    ``pagerank`` / ``dedup.duplicate_components`` — a limit-probe detects
    an edge list at or under the gate and peels on the driver in pure
    Python integers. The k-core fixpoint is CONFLUENT (peeling order
    cannot change it), so the result is identical by construction; pinned
    by the fast-vs-distributed pytest and the unrolled-CTE oracle. Over
    the gate the distributed peel is unchanged; ``driver_edge_gate=0``
    forces it. The canonicalized edge list is checkpointed BEFORE the
    probe: ``limit()`` cannot bound a ``distinct``'s shuffle anyway, and
    cutting first means an over-gate graph hands the already-materialized
    canon to the distributed peel instead of paying the corpus-wide
    canonicalization shuffle a second time.
    """
    if k < 1:
        raise ValueError("momyre: k must be >= 1")
    spark = edges.sparkSession

    def _persistent():
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {e.getKey(): e.getValue() for e in m.entrySet().toArray()}

    # block ownership, same rationale as pagerank: release only blocks our
    # eager cuts created, never an entry-diff. e_ids tracks the blocks the
    # RETURNED edge frame depends on (the last edge cut, not the last cut
    # of any kind — survivor cuts interleave since round 7)
    owned: set[int] = set()
    e_ids: set[int] = set()

    def _cut(df: DataFrame) -> tuple[DataFrame, set[int]]:
        before = set(_persistent())
        out = df.localCheckpoint(eager=True)
        made = set(_persistent()) - before
        owned.update(made)
        return out, made

    def _release(ids: set[int]) -> None:
        # drop superseded cuts ROUND BY ROUND: a deep peel would otherwise
        # pin every round's survivor + edge blocks in executor storage
        # until the function returns (~2 x rounds stale block sets)
        if not ids:
            return
        for rid, j in _persistent().items():
            if rid in ids:
                j.unpersist(False)
        owned.difference_update(ids)

    e, e_ids = _cut(
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    if driver_edge_gate:
        probe = e.limit(driver_edge_gate + 1).toPandas()
        if len(probe) <= driver_edge_gate:
            _release(e_ids)  # the driver rows ARE the graph now
            from collections import Counter

            from pyspark.sql.types import LongType, StructField, StructType

            es = list(
                zip(
                    (x.item() if hasattr(x, "item") else x
                     for x in probe["a"]),
                    (x.item() if hasattr(x, "item") else x
                     for x in probe["b"]),
                )
            )
            prev_n = None
            for _ in range(max_iterations):
                deg = Counter()
                for a, b in es:
                    deg[a] += 1
                    deg[b] += 1
                surv = {n for n, c in deg.items() if c >= k}
                if len(surv) == prev_n:
                    break
                prev_n = len(surv)
                if not surv:
                    es = []
                    break
                es = [(a, b) for a, b in es if a in surv and b in surv]
            deg = Counter()
            for a, b in es:
                deg[a] += 1
                deg[b] += 1
            schema = StructType(
                [
                    StructField("node", e.schema["a"].dataType, False),
                    StructField("degree", LongType(), False),
                ]
            )
            return spark.createDataFrame(sorted(deg.items()), schema=schema)

    prev_n: int | None = None
    for _ in range(max_iterations):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionByName(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("__deg"))
        )
        # materialize survivors (nodes-sized) BEFORE counting: the count
        # and the edge-filter join below otherwise each recompute the
        # degree aggregation — the round's dominant work — from scratch
        survivors, s_ids = _cut(deg.filter(F.col("__deg") >= k).select("node"))
        n = survivors.count()
        if n == prev_n:
            _release(s_ids)
            break  # nobody dropped: every remaining node has degree >= k
        prev_n = n
        if n == 0:
            e = e.limit(0)
            _release(s_ids)
            break
        new_e, new_ids = _cut(
            e.join(survivors.withColumnRenamed("node", "a"), "a")
            .join(survivors.withColumnRenamed("node", "b"), "b")
            .select("a", "b")
        )
        # the new edge cut is eagerly materialized: the previous edge
        # blocks and this round's survivors are unreachable from here
        _release(e_ids)
        _release(s_ids)
        e, e_ids = new_e, new_ids
    for rid, j in _persistent().items():
        if rid in owned and rid not in e_ids:
            j.unpersist(False)
    return (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )


def clustering_coefficients(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Local clustering coefficient per node: 2*triangles / (deg*(deg-1))
    over the undirected simple graph — how close each node's
    neighborhood is to a clique (community-density / spam-farm signal).
    Degree-1 nodes read 0.0. One triangle pass + one degree aggregation
    + a (node-keyed) join; rounded to 4 decimals for engine-stable
    hashing."""
    from momyre_spark.functions.numeric import round_half_up

    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    tri = triangle_counts(e, src_col="a", dst_col="b")
    cc = F.when(
        F.col("degree") >= 2,
        F.lit(2.0)
        * F.coalesce(F.col("n_triangles"), F.lit(0)).cast("double")
        / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
    ).otherwise(F.lit(0.0))
    return deg.join(tri, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("bigint").alias(
            "n_triangles"
        ),
        round_half_up(cc, 4).alias("clustering"),
    )


def neighbor_jaccard(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    min_common: int = 1,
    max_degree: int | None = None,
    digits: int = 6,
) -> DataFrame:
    """Structural node similarity / link prediction: for every node pair
    sharing at least ``min_common`` neighbors in the UNDIRECTED graph,
    ``jaccard = |N(a) n N(b)| / |N(a) u N(b)|`` — "these two domains are
    linked from the same places" without requiring an edge between them.
    Output: ``(node_a, node_b, common, deg_a, deg_b, jaccard)`` with
    ``node_a < node_b`` (each unordered pair once).

    Shape: symmetrize+distinct (one shuffle), then candidate pairs come
    from a WEDGE self-join through the shared neighbor — cost is
    ``sum_c deg(c)^2`` over center nodes, the standard bounded
    co-occurrence plan, NEVER all-pairs. At 100 TB the quadratic term is
    controlled the same way the dedup buckets are: ``max_degree`` drops
    hub centers (a celebrity node pairs everyone through itself) — the
    recall contract is explicit: pairs whose ONLY common neighbors are
    dropped hubs are missed, and degrees (computed before the cap) stay
    exact so reported Jaccard values are never inflated by the cap.

    Determinism: counts are exact BIGINT; the single final division is
    one mirrored float op rounded at ``digits``.
    """
    if min_common < 1:
        raise ValueError("momyre: min_common must be >= 1")
    sym = (
        edges.select(
            F.col(src_col).alias("c"), F.col(dst_col).alias("v")
        )
        .union(
            edges.select(
                F.col(dst_col).alias("c"), F.col(src_col).alias("v")
            )
        )
        .filter(F.col("c") != F.col("v"))
        .distinct()
    )
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    centers = sym
    if max_degree is not None:
        cdeg = sym.groupBy("c").agg(F.count(F.lit(1)).alias("__cd"))
        centers = (
            sym.join(
                F.broadcast(
                    cdeg.filter(F.col("__cd") > max_degree).select("c")
                ),
                "c",
                "left_anti",
            )
        )
    a = centers.select(F.col("c"), F.col("v").alias("a"))
    b = centers.select(F.col("c"), F.col("v").alias("b"))
    common = (
        a.join(b, "c")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(F.col("common") >= min_common)
    )
    out = (
        common.join(
            deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a")),
            "a",
        )
        .join(
            deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b")),
            "b",
        )
    )
    union = F.col("deg_a") + F.col("deg_b") - F.col("common")
    from momyre_spark.functions.numeric import round_half_up

    return out.select(
        F.col("a").alias("node_a"),
        F.col("b").alias("node_b"),
        "common",
        "deg_a",
        "deg_b",
        round_half_up(
            F.col("common").cast("double") / union.cast("double"), digits
        ).alias("jaccard"),
    )


def partition_modularity(
    edges: DataFrame,
    labels: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    label_col: str = "component",
    digits: int = 6,
) -> DataFrame:
    """Newman modularity decomposition of a node partition over an
    UNDIRECTED graph: per community ``c``,
    ``q_term = L_c / m - (d_c / (2m))^2`` (intra-edge fraction minus the
    degree-mass null model); the partition's modularity Q is the sum of
    the terms. The quality readout for ANY node labeling — connected
    components, LSH dedup clusters, a domain allowlist — "does this
    grouping actually concentrate the link structure?".

    Output: ``(component, n_nodes, intra_edges, degree_sum, q_term)``.
    Edges are canonicalized to distinct unordered pairs (direction and
    duplicates irrelevant, self-loops dropped); nodes missing from
    ``labels`` fail the intra-edge join visibly (their edges count in m
    and their degrees are absent from every community — pass a total
    labeling, e.g. connected_components output, for a well-formed Q).

    Shape: one distinct-pair shuffle, one degree agg, two label equi-
    joins, one per-community agg — all equi-joins, never quadratic.

    Determinism: m, L_c, d_c are exact BIGINT; each q_term is one
    mirrored float tree (division and squared ratio as an explicit
    product) rounded at ``digits``.
    """
    from momyre_spark.functions.numeric import round_half_up

    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    m_df = e.agg(F.count(F.lit(1)).alias("__m"))
    deg = (
        e.select(F.col("a").alias("v"))
        .union(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("__deg"))
    )
    lab = labels.select(
        F.col(node_col).alias("v"), F.col(label_col).alias("__c")
    )
    intra = (
        e.join(lab.select(F.col("v").alias("a"), F.col("__c").alias("__ca")), "a")
        .join(lab.select(F.col("v").alias("b"), F.col("__c").alias("__cb")), "b")
        .filter(F.col("__ca") == F.col("__cb"))
        .groupBy(F.col("__ca").alias("__c"))
        .agg(F.count(F.lit(1)).alias("__lc"))
    )
    dsum = (
        deg.join(lab, "v")
        .groupBy("__c")
        .agg(
            F.count(F.lit(1)).alias("__nn"),
            F.sum("__deg").alias("__dc"),
        )
    )
    joined = (
        dsum.join(intra, "__c", "left")
        .withColumn("__lc", F.coalesce(F.col("__lc"), F.lit(0)))
        .crossJoin(F.broadcast(m_df))
    )
    ld = F.col("__lc").cast("double")
    md = F.col("__m").cast("double")
    ratio = F.col("__dc").cast("double") / (F.lit(2.0) * md)
    q = ld / md - ratio * ratio
    return joined.select(
        F.col("__c").alias(label_col),
        F.col("__nn").alias("n_nodes"),
        F.col("__lc").alias("intra_edges"),
        F.col("__dc").alias("degree_sum"),
        round_half_up(q, digits).alias("q_term"),
    )


def degree_distribution(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    directed: bool = False,
    digits: int = 6,
) -> DataFrame:
    """Degree histogram with exact complementary CDF — the first
    health readout of any link/duplicate graph (a power-law tail says
    hub domains / boilerplate stars; a truncated tail says the dedup
    candidate graph is bounded, which is what the LSH band math
    promises). Output one row per observed degree: ``(degree, n_nodes,
    ccdf)`` where ``ccdf`` = fraction of nodes with degree >= that
    degree.

    ``directed=False`` counts each endpoint once per incident edge
    (out + in); ``directed=True`` counts out-degree only.

    Shape at 100 TB: one node-keyed hash agg over the edge list
    (map-side combinable — a 10^8-edge hub collapses per input
    partition), then everything else operates on the DISTINCT-degree
    frame: one bounded cumulative window (degrees observed in a real
    graph number in the thousands) + a broadcast 1-row total. Exact
    BIGINTs until the one ccdf division, rounded at ``digits``.
    """
    from pyspark.sql.window import Window

    from momyre_spark.functions.numeric import round_half_up

    ends = edges.select(F.col(src_col).alias("__node"))
    if not directed:
        ends = ends.unionByName(
            edges.select(F.col(dst_col).alias("__node"))
        )
    deg = ends.groupBy("__node").agg(
        F.count(F.lit(1)).cast("bigint").alias("__deg")
    )
    hist = deg.groupBy("__deg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )
    # nodes with degree >= d: cumulative from the top of the distinct-
    # degree frame (bounded), plus a broadcast grand total
    wtop = Window.orderBy(F.col("__deg").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        hist.withColumn("__ge", F.sum("n_nodes").over(wtop))
        .withColumn("__N", F.sum("n_nodes").over(wall))
        .select(
            F.col("__deg").alias("degree"),
            "n_nodes",
            round_half_up(
                F.col("__ge").cast("double") / F.col("__N").cast("double"),
                digits,
            ).alias("ccdf"),
        )
    )
