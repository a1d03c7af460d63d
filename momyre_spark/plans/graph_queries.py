"""Link-graph queries (operators/graph.py): domain PageRank over a
synthetic host graph.

The host graph is engine-neutral (md5-prefix arithmetic, the
dedup_hamming/_syn_docs trick), and the oracle UNROLLS the same fixed
iteration count as chained MATERIALIZED CTEs — each level is referenced
several times, and DuckDB inlines non-materialized CTEs, which would blow
the plan up exponentially with depth.

Determinism: rank state is BIGINT units of 1e-10 in BOTH engines (see
operators/graph.py — a DECIMAL formulation breaks on DuckDB's
double-rounding DECIMAL->DOUBLE conversion). Every sum is exact integer
arithmetic; every float op consumes exactly-converted integers, so all 10
iterations match bit-for-bit and the query carries a full value-hash
oracle — rare for an iterative algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from momyre_spark.plans import query

_N_HOSTS = 100
_N_EDGE_SEEDS = 1_000
_PR_ITERS = 10
_DAMP = 0.85
_SCALE = "10000000000"


def _host_edges(spark: SparkSession) -> DataFrame:
    return (
        spark.range(_N_EDGE_SEEDS)
        .selectExpr(
            "pmod(CAST(conv(substr(md5(CAST(id AS STRING)), 1, 15), 16, 10)"
            f" AS BIGINT), {_N_HOSTS}) AS src",
            "pmod(CAST(conv(substr(md5(concat('e', CAST(id AS STRING))), 1, 15),"
            f" 16, 10) AS BIGINT), {_N_HOSTS}) AS dst",
        )
        .filter("src <> dst")
        .distinct()
    )


def _pr_oracle() -> str:
    head = f"""
    edges AS (
        SELECT DISTINCT
            (('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15))::BIGINT
                % {_N_HOSTS}) AS src,
            (('0x' || substr(md5('e' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
                % {_N_HOSTS}) AS dst
        FROM range({_N_EDGE_SEEDS}) t(i)
    ),
    e2 AS MATERIALIZED (SELECT src, dst FROM edges WHERE src <> dst),
    nodes AS MATERIALIZED (
        SELECT DISTINCT node FROM (
            SELECT src AS node FROM e2 UNION ALL SELECT dst FROM e2)
    ),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    deg AS MATERIALIZED (SELECT src AS node, COUNT(*) AS dg FROM e2 GROUP BY 1),
    r0 AS MATERIALIZED (
        SELECT node, CAST({_SCALE} AS BIGINT) AS units FROM nodes)"""
    steps = []
    for i in range(1, _PR_ITERS + 1):
        p = f"r{i - 1}"
        contrib = (
            f"CAST(floor(CAST({p}.units AS DOUBLE) / deg.dg + 0.5) AS BIGINT)"
        )
        upd = (
            f"CAST(floor((1.0 - {_DAMP}) * {_SCALE}.0"
            f" + {_DAMP} * (CAST(COALESCE(c{i}.s, 0) AS DOUBLE)"
            f" + CAST((SELECT m FROM dang{i}) AS DOUBLE)"
            f" / CAST((SELECT n FROM nn) AS DOUBLE))"
            f" + 0.5) AS BIGINT)"
        )
        steps.append(f"""
    dang{i} AS MATERIALIZED (
        SELECT COALESCE(SUM(units), 0) AS m
        FROM {p} LEFT JOIN deg USING (node) WHERE deg.dg IS NULL
    ),
    c{i} AS MATERIALIZED (
        SELECT e2.dst AS node, SUM({contrib}) AS s
        FROM e2
        JOIN {p} ON e2.src = {p}.node
        JOIN deg ON deg.node = e2.src
        GROUP BY 1
    ),
    r{i} AS MATERIALIZED (
        SELECT nodes.node, {upd} AS units
        FROM nodes LEFT JOIN c{i} USING (node)
    )""")
    return (
        "WITH" + head + "," + ",".join(steps)
        + f"""
    SELECT node, CAST(units AS DOUBLE) / {_SCALE}.0 AS rank
    FROM r{_PR_ITERS} ORDER BY node"""
    )


@query("graph_domain_pagerank", oracle=_pr_oracle())
def graph_domain_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.graph import pagerank

    return pagerank(
        _host_edges(spark), damping=_DAMP, max_iter=_PR_ITERS
    ).orderBy("node")


# The durable-cut twin: identical ranks BY CONTRACT (the file-based
# lineage cut changes recovery semantics, never values — exactness is the
# BIGINT unit arithmetic either way), so it shares the unrolled-CTE
# oracle verbatim and the driver pins the checkpoint/recovery path with
# the same value hash. The cut directory is per-run (uuid) under the JVM
# temp dir; pagerank documents that the caller owns cleanup — a
# bench/correctness drive leaves a few KB of parquet in /tmp.
@query("graph_domain_pagerank_durable", oracle=_pr_oracle())
def graph_domain_pagerank_durable(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from momyre_spark.operators.graph import pagerank

    return pagerank(
        _host_edges(spark),
        damping=_DAMP,
        max_iter=_PR_ITERS,
        checkpoint_dir=f"{tempfile.gettempdir()}/momyre_pr_cuts",
    ).orderBy("node")


# --------------------------------------------------------------------------
# Connected components (operators/graph.connected_components -> the same
# min-label propagation as dedup.duplicate_components): a SPARSER slice of
# the synthetic host graph (60 edge seeds over 100 hosts -> ~12
# components), so fragmentation is real. The oracle is a DuckDB RECURSIVE
# CTE computing min-reachable-node over the undirected closure — set
# semantics of UNION guarantee termination; both engines label each
# component by its smallest node id, so the query carries a full
# value-hash oracle despite being an iterative algorithm.
# --------------------------------------------------------------------------
_N_CC_SEEDS = 60

_CC_ORACLE = f"""
    WITH RECURSIVE
    edges AS (
        SELECT DISTINCT
            (('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15))::BIGINT
                % {_N_HOSTS}) AS src,
            (('0x' || substr(md5('e' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
                % {_N_HOSTS}) AS dst
        FROM range({_N_CC_SEEDS}) t(i)
    ),
    e2 AS (SELECT src, dst FROM edges WHERE src <> dst),
    ue AS (SELECT src, dst FROM e2 UNION SELECT dst, src FROM e2),
    nodes AS (SELECT DISTINCT src AS node FROM ue),
    reach AS (
        SELECT node, node AS label FROM nodes
        UNION
        SELECT ue.dst AS node, r.label FROM reach r JOIN ue ON ue.src = r.node
    )
    SELECT node, CAST(min(label) AS BIGINT) AS component
    FROM reach GROUP BY node ORDER BY node
"""


@query("graph_connected_components", oracle=_CC_ORACLE)
def graph_connected_components(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import functions as F

    from momyre_spark.operators.graph import connected_components

    edges = (
        spark.range(_N_CC_SEEDS)
        .selectExpr(
            "pmod(CAST(conv(substr(md5(CAST(id AS STRING)), 1, 15), 16, 10)"
            f" AS BIGINT), {_N_HOSTS}) AS src",
            "pmod(CAST(conv(substr(md5(concat('e', CAST(id AS STRING))), 1, 15),"
            f" 16, 10) AS BIGINT), {_N_HOSTS}) AS dst",
        )
        .filter("src <> dst")
        .distinct()
    )
    return connected_components(edges).orderBy("node")


# --------------------------------------------------------------------------
# Triangle counting (operators/graph.triangle_counts): canonical a<b<c
# wedge enumeration + one closing equi-join — each triangle found exactly
# once, per-node counts by exploding its three corners. Same host graph
# as PageRank (dense enough for real triangles). Full SQL oracle.
# --------------------------------------------------------------------------
_TRI_ORACLE = f"""
    WITH edges AS (
        SELECT DISTINCT
            (('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15))::BIGINT
                % {_N_HOSTS}) AS src,
            (('0x' || substr(md5('e' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
                % {_N_HOSTS}) AS dst
        FROM range({_N_EDGE_SEEDS}) t(i)
    ),
    e AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst
    ),
    tri AS (
        SELECT ab.a AS x, ab.b AS y, bc.b AS z
        FROM e ab
        JOIN e bc ON bc.a = ab.b
        JOIN e ca ON ca.a = ab.a AND ca.b = bc.b
    ),
    corners AS (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
    )
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
    FROM corners GROUP BY node ORDER BY node
"""


@query("graph_triangle_counts", oracle=_TRI_ORACLE)
def graph_triangle_counts(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.graph import triangle_counts

    return triangle_counts(_host_edges(spark)).orderBy("node")


# --------------------------------------------------------------------------
# K-core decomposition (operators/graph.kcore): iterative peel — drop
# nodes with degree < k, re-induce, repeat to fixpoint. A MEDIUM-density
# slice of the host graph (220 seeds over 100 hosts, avg degree ~4) so
# the 3-core peel actually removes several waves of nodes. The oracle
# UNROLLS 12 peel rounds as chained MATERIALIZED CTEs — peeling is
# monotone, so once the fixpoint is reached further rounds are no-ops and
# any unroll depth >= the convergence depth (asserted < 12 in
# tests/test_graph.py) yields the identical core. Pure integer set
# algebra: full value-hash oracle despite the iterative algorithm.
# --------------------------------------------------------------------------
_N_KCORE_SEEDS = 220
_KCORE_K = 3
_KCORE_UNROLL = 12


def _kcore_oracle() -> str:
    head = f"""
    WITH edges AS (
        SELECT DISTINCT
            (('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15))::BIGINT
                % {_N_HOSTS}) AS src,
            (('0x' || substr(md5('e' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
                % {_N_HOSTS}) AS dst
        FROM range({_N_KCORE_SEEDS}) t(i)
    ),
    e0 AS MATERIALIZED (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst
    )"""
    steps = []
    for i in range(1, _KCORE_UNROLL + 1):
        p = f"e{i - 1}"
        steps.append(f"""
    n{i} AS MATERIALIZED (
        SELECT node FROM (
            SELECT a AS node FROM {p} UNION ALL SELECT b FROM {p})
        GROUP BY node HAVING count(*) >= {_KCORE_K}
    ),
    e{i} AS MATERIALIZED (
        SELECT a, b FROM {p}
        JOIN n{i} na ON {p}.a = na.node
        JOIN n{i} nb ON {p}.b = nb.node
    )""")
    last = f"e{_KCORE_UNROLL}"
    return (
        head + "," + ",".join(steps)
        + f"""
    SELECT node, CAST(count(*) AS BIGINT) AS degree
    FROM (SELECT a AS node FROM {last} UNION ALL SELECT b FROM {last})
    GROUP BY node ORDER BY node"""
    )


def _kcore_edges(spark: SparkSession) -> DataFrame:
    return (
        spark.range(_N_KCORE_SEEDS)
        .selectExpr(
            "pmod(CAST(conv(substr(md5(CAST(id AS STRING)), 1, 15), 16, 10)"
            f" AS BIGINT), {_N_HOSTS}) AS src",
            "pmod(CAST(conv(substr(md5(concat('e', CAST(id AS STRING))), 1, 15),"
            f" 16, 10) AS BIGINT), {_N_HOSTS}) AS dst",
        )
        .filter("src <> dst")
        .distinct()
    )


@query("graph_kcore", oracle=_kcore_oracle())
def graph_kcore(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.graph import kcore

    return kcore(_kcore_edges(spark), k=_KCORE_K).orderBy("node")


# --------------------------------------------------------------------------
# Local clustering coefficient (operators/graph.clustering_coefficients):
# triangles + degrees composed — 2*tri/(deg*(deg-1)), degree-1 nodes 0.
# Full SQL oracle over the same host graph.
# --------------------------------------------------------------------------
_CC2_ORACLE = f"""
    WITH edges AS (
        SELECT DISTINCT
            (('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15))::BIGINT
                % {_N_HOSTS}) AS src,
            (('0x' || substr(md5('e' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
                % {_N_HOSTS}) AS dst
        FROM range({_N_EDGE_SEEDS}) t(i)
    ),
    e AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst
    ),
    deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS degree
        FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        GROUP BY node
    ),
    tri AS (
        SELECT ab.a AS x, ab.b AS y, bc.b AS z
        FROM e ab JOIN e bc ON bc.a = ab.b
        JOIN e ca ON ca.a = ab.a AND ca.b = bc.b
    ),
    tcnt AS (
        SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        FROM (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri)
        GROUP BY node
    )
    SELECT deg.node AS node, degree,
           CAST(coalesce(n_triangles, 0) AS BIGINT) AS n_triangles,
           floor(CASE WHEN degree >= 2
                      THEN 2.0 * CAST(coalesce(n_triangles, 0) AS DOUBLE)
                           / CAST(degree * (degree - 1) AS DOUBLE)
                      ELSE 0.0 END * 10000 + 0.5) / 10000.0 AS clustering
    FROM deg LEFT JOIN tcnt ON deg.node = tcnt.node
    ORDER BY node
"""


@query("graph_clustering_coefficients", oracle=_CC2_ORACLE)
def graph_clustering_coefficients(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.graph import clustering_coefficients

    return clustering_coefficients(_host_edges(spark)).orderBy("node")


# --------------------------------------------------------------------------
# Personalized (seeded) PageRank (operators/graph.pagerank seeds=...):
# teleport mass AND dangling redistribution land uniformly on a trusted
# seed set only — the crawl-curation "distance from allowlist" authority
# signal. Seeds = hosts 0..9 of the same synthetic graph. The oracle
# unrolls the seeded update rule with the EXACT float op order of the
# operator: seed base (1-d) * (|V|*scale as double) / |S|, the 0/seed
# CASE split, then the single floor(+0.5) to integer units — so all 10
# iterations value-hash bit-for-bit like the classic walk.
# --------------------------------------------------------------------------
_N_SEED_HOSTS = 10


def _seed_pr_oracle() -> str:
    head = f"""
    edges AS (
        SELECT DISTINCT
            (('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15))::BIGINT
                % {_N_HOSTS}) AS src,
            (('0x' || substr(md5('e' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
                % {_N_HOSTS}) AS dst
        FROM range({_N_EDGE_SEEDS}) t(i)
    ),
    e2 AS MATERIALIZED (SELECT src, dst FROM edges WHERE src <> dst),
    nodes AS MATERIALIZED (
        SELECT DISTINCT node FROM (
            SELECT src AS node FROM e2 UNION ALL SELECT dst FROM e2)
    ),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    seeds AS MATERIALIZED (
        SELECT node FROM nodes WHERE node < {_N_SEED_HOSTS}),
    ns AS (SELECT COUNT(*) AS n FROM seeds),
    sf AS MATERIALIZED (
        SELECT nodes.node, (s.node IS NOT NULL) AS isseed
        FROM nodes LEFT JOIN seeds s ON nodes.node = s.node
    ),
    deg AS MATERIALIZED (SELECT src AS node, COUNT(*) AS dg FROM e2 GROUP BY 1),
    r0 AS MATERIALIZED (
        SELECT node, CAST({_SCALE} AS BIGINT) AS units FROM nodes)"""
    # seed teleport share: ((1-d) * (|V|*scale)) / |S| — left-assoc,
    # matching Python's (1.0-d) * float(n*scale) / float(n_seeds)
    sb = (
        f"(1.0 - {_DAMP}) * CAST((SELECT n FROM nn) * {_SCALE} AS DOUBLE)"
        f" / CAST((SELECT n FROM ns) AS DOUBLE)"
    )
    steps = []
    for i in range(1, _PR_ITERS + 1):
        p = f"r{i - 1}"
        contrib = (
            f"CAST(floor(CAST({p}.units AS DOUBLE) / deg.dg + 0.5) AS BIGINT)"
        )
        upd = (
            f"CAST(floor((CASE WHEN sf.isseed THEN {sb} ELSE 0.0 END)"
            f" + {_DAMP} * (CAST(COALESCE(c{i}.s, 0) AS DOUBLE)"
            f" + (CASE WHEN sf.isseed"
            f"         THEN CAST((SELECT m FROM dang{i}) AS DOUBLE)"
            f"              / CAST((SELECT n FROM ns) AS DOUBLE)"
            f"         ELSE 0.0 END))"
            f" + 0.5) AS BIGINT)"
        )
        steps.append(f"""
    dang{i} AS MATERIALIZED (
        SELECT COALESCE(SUM(units), 0) AS m
        FROM {p} LEFT JOIN deg USING (node) WHERE deg.dg IS NULL
    ),
    c{i} AS MATERIALIZED (
        SELECT e2.dst AS node, SUM({contrib}) AS s
        FROM e2
        JOIN {p} ON e2.src = {p}.node
        JOIN deg ON deg.node = e2.src
        GROUP BY 1
    ),
    r{i} AS MATERIALIZED (
        SELECT sf.node, {upd} AS units
        FROM sf LEFT JOIN c{i} ON sf.node = c{i}.node
    )""")
    return (
        "WITH" + head + "," + ",".join(steps)
        + f"""
    SELECT node, CAST(units AS DOUBLE) / {_SCALE}.0 AS rank
    FROM r{_PR_ITERS} ORDER BY node"""
    )


@query("graph_seed_pagerank", oracle=_seed_pr_oracle())
def graph_seed_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import functions as F

    from momyre_spark.operators.graph import pagerank

    seeds = spark.range(_N_SEED_HOSTS).select(F.col("id").alias("node"))
    return pagerank(
        _host_edges(spark), damping=_DAMP, max_iter=_PR_ITERS, seeds=seeds
    ).orderBy("node")


# --------------------------------------------------------------------------
# Neighbor-Jaccard link prediction (operators/graph.neighbor_jaccard):
# which host pairs are linked from the same places? Candidates from a
# wedge self-join through the shared neighbor (sum_c deg(c)^2, never
# all-pairs; max_degree hub cap is the 100 TB control). Exact BIGINT
# counts, one mirrored division, 6dp.
# --------------------------------------------------------------------------
def _nj_oracle() -> str:
    return f"""
    WITH edges AS (
        SELECT DISTINCT
            (('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15))::BIGINT
                % {_N_HOSTS}) AS src,
            (('0x' || substr(md5('e' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
                % {_N_HOSTS}) AS dst
        FROM range({_N_EDGE_SEEDS}) t(i)
    ),
    e2 AS (SELECT src, dst FROM edges WHERE src <> dst),
    sym AS (
        SELECT DISTINCT c, v FROM (
            SELECT src AS c, dst AS v FROM e2
            UNION ALL SELECT dst, src FROM e2)
    ),
    deg AS (SELECT v, COUNT(*) AS deg FROM sym GROUP BY 1),
    cm AS (
        SELECT a.v AS na, b.v AS nb, COUNT(*) AS common
        FROM sym a JOIN sym b ON a.c = b.c AND a.v < b.v
        GROUP BY 1, 2
    )
    SELECT na AS node_a, nb AS node_b, common,
           da.deg AS deg_a, db.deg AS deg_b,
           floor(CAST(common AS DOUBLE)
                 / CAST(da.deg + db.deg - common AS DOUBLE)
                 * 1000000 + 0.5) / 1000000.0 AS jaccard
    FROM cm
    JOIN deg da ON da.v = cm.na
    JOIN deg db ON db.v = cm.nb
    ORDER BY node_a, node_b
"""


@query("graph_neighbor_jaccard", oracle=_nj_oracle())
def graph_neighbor_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.graph import neighbor_jaccard

    return neighbor_jaccard(_host_edges(spark)).orderBy(
        "node_a", "node_b"
    )


# --------------------------------------------------------------------------
# Partition modularity (operators/graph.partition_modularity): does the
# component labeling concentrate the link structure? Composed with
# connected_components over the sparse CC slice; per-component
# ``L_c/m - (d_c/2m)^2`` with exact BIGINT counts and one mirrored
# float tree. Oracle reuses the recursive min-label CTE.
# --------------------------------------------------------------------------
def _modularity_oracle() -> str:
    return f"""
    WITH RECURSIVE
    edges AS (
        SELECT DISTINCT
            (('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15))::BIGINT
                % {_N_HOSTS}) AS src,
            (('0x' || substr(md5('e' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
                % {_N_HOSTS}) AS dst
        FROM range({_N_CC_SEEDS}) t(i)
    ),
    e2 AS (SELECT src, dst FROM edges WHERE src <> dst),
    ue AS (SELECT src, dst FROM e2 UNION SELECT dst, src FROM e2),
    nodes AS (SELECT DISTINCT src AS node FROM ue),
    reach AS (
        SELECT node, node AS label FROM nodes
        UNION
        SELECT ue.dst AS node, r.label FROM reach r
        JOIN ue ON ue.src = r.node
    ),
    lab AS MATERIALIZED (
        SELECT node AS v, CAST(min(label) AS BIGINT) AS c
        FROM reach GROUP BY node
    ),
    ce AS MATERIALIZED (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM e2
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM ce),
    deg AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
            SELECT a AS v FROM ce UNION ALL SELECT b FROM ce
        ) GROUP BY 1
    ),
    intra AS (
        SELECT la.c AS c, CAST(COUNT(*) AS BIGINT) AS lc
        FROM ce
        JOIN lab la ON la.v = ce.a
        JOIN lab lb ON lb.v = ce.b
        WHERE la.c = lb.c GROUP BY 1
    ),
    dsum AS (
        SELECT lab.c AS c, CAST(COUNT(*) AS BIGINT) AS nn,
               CAST(SUM(deg.deg) AS BIGINT) AS dc
        FROM deg JOIN lab ON lab.v = deg.v GROUP BY 1
    )
    SELECT dsum.c AS component, nn AS n_nodes,
           CAST(COALESCE(intra.lc, 0) AS BIGINT) AS intra_edges,
           dc AS degree_sum,
           floor((CAST(COALESCE(intra.lc, 0) AS DOUBLE)
                  / CAST((SELECT m FROM m) AS DOUBLE)
                  - (CAST(dc AS DOUBLE)
                     / (2.0 * CAST((SELECT m FROM m) AS DOUBLE)))
                    * (CAST(dc AS DOUBLE)
                     / (2.0 * CAST((SELECT m FROM m) AS DOUBLE))))
                 * 1000000 + 0.5) / 1000000.0 AS q_term
    FROM dsum LEFT JOIN intra ON intra.c = dsum.c
    ORDER BY component
"""


@query("graph_modularity", oracle=_modularity_oracle())
def graph_modularity(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import functions as F

    from momyre_spark.operators.graph import (
        connected_components,
        partition_modularity,
    )

    edges = (
        spark.range(_N_CC_SEEDS)
        .selectExpr(
            "pmod(CAST(conv(substr(md5(CAST(id AS STRING)), 1, 15), 16, 10)"
            f" AS BIGINT), {_N_HOSTS}) AS src",
            "pmod(CAST(conv(substr(md5(concat('e', CAST(id AS STRING))), 1,"
            f" 15), 16, 10) AS BIGINT), {_N_HOSTS}) AS dst",
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    labels = connected_components(edges)
    return partition_modularity(edges, labels).orderBy("component")


# --------------------------------------------------------------------------
# Degree distribution (operators/graph.degree_distribution): histogram +
# exact CCDF of the synthetic host graph — the first health readout of a
# link/duplicate graph (power-law tail = hub domains; truncated tail =
# the LSH candidate bound holding). One node-keyed hash agg over the
# edge list (map-side combinable), then a bounded distinct-degree window.
# Exact BIGINTs; one mirrored ccdf division, 6dp.
#
# STAGED for round-11 registration. Pre-validated by the staged-queue
# mirror and tests/test_graph.py::test_degree_distribution_known_values.
# --------------------------------------------------------------------------
_DEGDIST_ORACLE = f"""
    WITH edges AS (
        SELECT DISTINCT
            (('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15))::BIGINT
                % {_N_HOSTS}) AS src,
            (('0x' || substr(md5('e' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
                % {_N_HOSTS}) AS dst
        FROM range({_N_EDGE_SEEDS}) t(i)
    ),
    e2 AS (SELECT src, dst FROM edges WHERE src <> dst),
    ends AS (
        SELECT src AS node FROM e2 UNION ALL SELECT dst FROM e2
    ),
    deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS dg
            FROM ends GROUP BY 1),
    hist AS (SELECT dg, CAST(COUNT(*) AS BIGINT) AS n_nodes
             FROM deg GROUP BY 1),
    c AS (
        SELECT dg, n_nodes,
               SUM(n_nodes) OVER (ORDER BY dg DESC
                                  ROWS UNBOUNDED PRECEDING) AS ge,
               SUM(n_nodes) OVER () AS n
        FROM hist
    )
    SELECT dg AS degree, n_nodes,
           floor(CAST(ge AS DOUBLE) / CAST(n AS DOUBLE) * 1000000 + 0.5)
               / 1000000.0 AS ccdf
    FROM c ORDER BY degree
"""


@query("graph_degree_distribution", oracle=_DEGDIST_ORACLE)
def graph_degree_distribution(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.graph import degree_distribution

    return degree_distribution(_host_edges(spark)).orderBy("degree")
