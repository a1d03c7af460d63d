"""PageRank operator (operators/graph.py): known-graph values, rank-mass
conservation, dangling redistribution, early stop."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from momyre_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def test_star_center_ranks_highest(spark):
    # 5 leaves all pointing at the hub; hub points back at one leaf
    pairs = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    ranks = {r["node"]: float(r["rank"])
             for r in pagerank(_edges(spark, pairs), max_iter=15).collect()}
    assert ranks[0] == max(ranks.values())
    assert ranks[1] > ranks[2]  # the hub's endorsement outweighs none
    assert ranks[2] == ranks[3] == ranks[4] == ranks[5]


def test_two_node_cycle_symmetric_and_mass_conserved(spark):
    ranks = {r["node"]: float(r["rank"])
             for r in pagerank(_edges(spark, [(1, 2), (2, 1)]),
                               max_iter=10).collect()}
    assert ranks[1] == ranks[2] == pytest.approx(1.0, abs=1e-9)
    # general mass conservation on a graph WITH dangling nodes: node 3
    # has no out-edges, its mass redistributes — total stays ~|V|
    ranks2 = pagerank(
        _edges(spark, [(1, 2), (2, 3), (1, 3)]), max_iter=30
    ).collect()
    total = sum(float(r["rank"]) for r in ranks2)
    assert total == pytest.approx(3.0, abs=1e-6)


def test_matches_hand_computed_fixpoint(spark):
    """1->2, 2->1, 3->2 (3 dangling-free chain): closed-form fixpoint of
    the 1-initialized formulation, verified against the operator at
    convergence."""
    ranks = {r["node"]: float(r["rank"])
             for r in pagerank(_edges(spark, [(1, 2), (2, 1), (3, 2)]),
                               max_iter=90).collect()}
    d = 0.85
    # r3 = (1-d) + d * dangling-share... node 3 has out-edge, none in: r3 = (1-d)
    r3 = 1 - d
    # fixpoint: r1 = (1-d) + d*r2 ; r2 = (1-d) + d*(r1 + r3)
    r1 = ((1 - d) + d * ((1 - d) + d * r3)) / (1 - d * d)
    r2 = (1 - d) + d * (r1 + r3)
    assert ranks[3] == pytest.approx(r3, abs=1e-4)
    assert ranks[1] == pytest.approx(r1, abs=1e-4)
    assert ranks[2] == pytest.approx(r2, abs=1e-4)


def test_tol_early_stop_matches_full_run(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (4, 1)]
    full = {r["node"]: float(r["rank"])
            for r in pagerank(_edges(spark, pairs), max_iter=80).collect()}
    early = {r["node"]: float(r["rank"])
             for r in pagerank(_edges(spark, pairs), max_iter=80,
                               tol=1e-9).collect()}
    for n in full:
        assert early[n] == pytest.approx(full[n], abs=1e-6)


def test_parameter_validation(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError, match="damping"):
        pagerank(e, damping=1.0)
    with pytest.raises(ValueError, match="max_iter"):
        pagerank(e, max_iter=0)


def test_exactness_scale_coarsens_not_fails(spark):
    """|V| * RANK_SCALE past 2^53 must not silently degrade the exact
    contract (ADVICE r04) nor refuse normal graphs: the scale coarsens in
    powers of 10 until sums fit, raising only past the 1e-4-unit floor."""
    from momyre_spark.operators.graph import RANK_SCALE, _resolve_scale

    assert _resolve_scale(100) == RANK_SCALE  # small graphs: full 1e-10
    s = _resolve_scale(10_000_000)  # 1e7 nodes: coarsened, still exact
    assert s < RANK_SCALE and 10_000_000 * s < 2**53
    assert s == 10 ** len(str(s)) // 10  # stays a power of 10
    with pytest.raises(ValueError, match="2\\^53"):
        _resolve_scale(10**15)

    # e2e: a coarse scale produces the same ranks to its resolution
    import momyre_spark.operators.graph as graph

    pairs = [(1, 2), (2, 1), (3, 2)]
    full = {r["node"]: float(r["rank"])
            for r in pagerank(_edges(spark, pairs), max_iter=20).collect()}
    coarse_scale = _resolve_scale(3, scale=10**6)
    orig = graph._resolve_scale
    graph._resolve_scale = lambda n, scale=None: coarse_scale
    try:
        coarse = {r["node"]: float(r["rank"])
                  for r in pagerank(_edges(spark, pairs),
                                    max_iter=20).collect()}
    finally:
        graph._resolve_scale = orig
    for n in full:
        assert coarse[n] == pytest.approx(full[n], abs=1e-4)


def test_durable_checkpoint_matches_local_and_releases_blocks(
    spark, tmp_path
):
    """checkpoint_dir mode (reliable, cluster-survivable lineage cuts)
    must produce identical ranks to the localCheckpoint default, write its
    state under the given dir, and neither mode may leak one cached block
    per iteration (VERDICT r04 item #5)."""
    import os

    pairs = [(1, 2), (2, 3), (3, 1), (4, 1), (4, 2), (5, 4)]
    sc = spark.sparkContext
    before = sc._jsc.getPersistentRDDs().size()
    local = {r["node"]: float(r["rank"])
             for r in pagerank(_edges(spark, pairs), max_iter=10).collect()}
    # local mode: at most the final state's own block lingers per call
    assert sc._jsc.getPersistentRDDs().size() <= before + 1

    ckpt = str(tmp_path / "pr_ckpt")
    durable = {r["node"]: float(r["rank"])
               for r in pagerank(_edges(spark, pairs), max_iter=10,
                                 checkpoint_dir=ckpt).collect()}
    assert durable == local  # bit-identical: same integer recipe
    # the reliable checkpoints actually landed on (durable) storage
    found = any(files for _, _, files in os.walk(ckpt))
    assert found, "no checkpoint files written under checkpoint_dir"


def test_durable_checkpoint_bounds_files_and_restores_nothing_global(
    spark, tmp_path
):
    """The durable mode may leave AT MOST the final state's cut on disk
    (superseded state cuts and the nodes/degree cuts are deleted as the
    run advances / before return), and must not touch the session's
    global checkpoint location."""
    import glob
    import os

    ckpt = str(tmp_path / "pr_ckpt")
    pairs = [(1, 2), (2, 3), (3, 1), (4, 1), (4, 2), (5, 4)]
    before_global = spark.sparkContext._jsc.sc().getCheckpointDir()
    out = pagerank(_edges(spark, pairs), max_iter=10, checkpoint_dir=ckpt)
    ranks = {r["node"]: float(r["rank"]) for r in out.collect()}
    assert len(ranks) == 5
    # exactly one cut directory remains: the final state backing `out`
    cuts = glob.glob(f"{ckpt}/pagerank-*/cut-*")
    assert len(cuts) == 1, cuts
    # the returned frame still reads after the cleanup
    assert out.count() == 5
    after_global = spark.sparkContext._jsc.sc().getCheckpointDir()
    assert str(before_global) == str(after_global)


def test_triangle_counts_known_graph(spark):
    from pyspark.sql import Row

    from momyre_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant 4-5
    # (no triangle) and a duplicate/reversed edge (must not double-count)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
             (2, 1), (3, 1)]
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    out = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    assert 5 not in out


def test_clustering_coefficients_known_graph(spark):
    from pyspark.sql import Row

    from momyre_spark.operators.graph import clustering_coefficients

    # triangle {1,2,3} + pendant 3-4: nodes 1,2 have cc=1.0 (deg 2, 1
    # triangle); node 3 deg 3, 1 triangle -> 2/(3*2)=0.3333; node 4 deg 1
    # -> 0.0 by contract
    edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    out = {r["node"]: r for r in clustering_coefficients(df).collect()}
    assert out[1]["clustering"] == 1.0 and out[2]["clustering"] == 1.0
    assert out[3]["clustering"] == 0.3333 and out[3]["degree"] == 3
    assert out[4]["clustering"] == 0.0 and out[4]["n_triangles"] == 0


# ---------------------------------------------------------------- kcore


def test_kcore_triangle_with_tail(spark):
    """Triangle 1-2-3 plus tail 3-4-5: the 2-core is exactly the
    triangle (peeling removes 5, then 4), each member at degree 2."""
    from momyre_spark.operators.graph import kcore

    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    got = {r["node"]: r["degree"]
           for r in kcore(_edges(spark, pairs), k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_empty_core_and_validation(spark):
    from momyre_spark.operators.graph import kcore

    # a path has no 2-core
    out = kcore(_edges(spark, [(1, 2), (2, 3)]), k=2)
    assert out.count() == 0
    assert out.columns == ["node", "degree"]
    with pytest.raises(ValueError):
        kcore(_edges(spark, [(1, 2)]), k=0)


def test_kcore_direction_and_duplicates_ignored(spark):
    """Directed duplicates of one undirected edge collapse; a 4-clique
    with doubled edges is still the whole 3-core."""
    from momyre_spark.operators.graph import kcore

    clique = [(a, b) for a in range(4) for b in range(4) if a != b]
    got = {r["node"]: r["degree"]
           for r in kcore(_edges(spark, clique), k=3).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_fixture_peel_depth_below_oracle_unroll(spark):
    """The registered graph_kcore oracle unrolls 12 peel rounds; a
    driver-side reference peel over the (100-node) fixture graph must
    converge strictly below that — and produce the same core the Spark
    operator finds."""
    from momyre_spark.operators.graph import kcore
    from momyre_spark.plans.graph_queries import (
        _KCORE_K,
        _KCORE_UNROLL,
        _kcore_edges,
    )

    edges = {(r["src"], r["dst"]) for r in _kcore_edges(spark).collect()}
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    rounds = 0
    while True:
        deg: dict[int, int] = {}
        for a, b in und:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= _KCORE_K}
        nxt = {(a, b) for a, b in und if a in keep and b in keep}
        rounds += 1
        if nxt == und:
            break
        und = nxt
    assert rounds < _KCORE_UNROLL, rounds
    ref = {}
    for a, b in und:
        ref[a] = ref.get(a, 0) + 1
        ref[b] = ref.get(b, 0) + 1
    got = {r["node"]: r["degree"]
           for r in kcore(_kcore_edges(spark), k=_KCORE_K).collect()}
    assert got == ref


def test_seeded_pagerank_chain_fixpoint_and_zero_nonseeds(spark):
    """1->2->3 chain (3 dangling), seed {1}: teleport AND dangling mass
    land only on the seed. Closed form (mass-|V| units): r1 = 0.45 +
    d*r3, r2 = d*r1, r3 = d*r2 -> r1 = 0.45/(1-d^3)."""
    ranks = {r["node"]: float(r["rank"])
             for r in pagerank(
                 _edges(spark, [(1, 2), (2, 3)]),
                 seeds=spark.createDataFrame([Row(node=1)]),
                 max_iter=60,
             ).collect()}
    d = 0.85
    r1 = (1 - d) * 3 / (1 - d ** 3)
    # convergence factor ~d per iteration: 0.85^60 ~ 6e-5 residual, same
    # tolerance as test_matches_hand_computed_fixpoint
    assert ranks[1] == pytest.approx(r1, abs=1e-4)
    assert ranks[2] == pytest.approx(d * r1, abs=1e-4)
    assert ranks[3] == pytest.approx(d * d * r1, abs=1e-4)
    assert sum(ranks.values()) == pytest.approx(3.0, abs=1e-6)
    # a non-seed source node (out-edges only, no in-links) gets NO
    # teleport mass at all -> rank exactly 0
    ranks2 = {r["node"]: float(r["rank"])
              for r in pagerank(
                  _edges(spark, [(1, 2), (4, 2)]),
                  seeds=spark.createDataFrame([Row(node=1)]),
                  max_iter=20,
              ).collect()}
    assert ranks2[4] == 0.0


def test_seeded_all_nodes_matches_classic(spark):
    """Seeding EVERY node degenerates to the uniform walk — same teleport
    share (1-d)*M/|V| per node, same dangling split. Float op order
    differs by one reassociation, so equality is approx, not bitwise."""
    pairs = [(1, 2), (2, 3), (1, 3), (4, 1)]
    classic = {r["node"]: float(r["rank"])
               for r in pagerank(_edges(spark, pairs), max_iter=30).collect()}
    seeded = {r["node"]: float(r["rank"])
              for r in pagerank(
                  _edges(spark, pairs),
                  seeds=spark.createDataFrame(
                      [Row(node=n) for n in (1, 2, 3, 4)]),
                  max_iter=30,
              ).collect()}
    for n in classic:
        assert seeded[n] == pytest.approx(classic[n], abs=1e-6)


def test_seeded_pagerank_validation_and_outside_seeds_ignored(spark):
    e = _edges(spark, [(1, 2)])
    # seeds entirely outside the graph: empty effective set -> raise
    with pytest.raises(ValueError, match="seed"):
        pagerank(e, seeds=spark.createDataFrame([Row(node=99)]))
    # a mixed set silently drops the outside node: behaves as seed {1}
    mixed = {r["node"]: float(r["rank"])
             for r in pagerank(
                 e, seeds=spark.createDataFrame(
                     [Row(node=1), Row(node=99)]),
                 max_iter=15,
             ).collect()}
    only1 = {r["node"]: float(r["rank"])
             for r in pagerank(
                 e, seeds=spark.createDataFrame([Row(node=1)]),
                 max_iter=15,
             ).collect()}
    assert mixed == only1


def test_neighbor_jaccard_known_graph(spark):
    import pytest as _pytest

    from momyre_spark.operators.graph import neighbor_jaccard

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "src long, dst long"
    )
    got = {
        (r["node_a"], r["node_b"]): r
        for r in neighbor_jaccard(edges).collect()
    }
    # N(1)={2,3} N(2)={1,3} N(3)={1,2,4} N(4)={3}
    want = {
        (1, 2): (1, 2, 2, 1.0 / 3.0),
        (1, 3): (1, 2, 3, 0.25),
        (2, 3): (1, 2, 3, 0.25),
        (1, 4): (1, 2, 1, 0.5),
        (2, 4): (1, 2, 1, 0.5),
    }
    assert set(got) == set(want)
    for k, (common, da, db, j) in want.items():
        r = got[k]
        assert r["common"] == common and r["deg_a"] == da and r["deg_b"] == db
        assert r["jaccard"] == _pytest.approx(j, abs=1e-6)
    # hub cap: center 3 (degree 3) dropped -> only wedges through 1 and 2
    capped = {
        (r["node_a"], r["node_b"])
        for r in neighbor_jaccard(edges, max_degree=2).collect()
    }
    assert capped == {(2, 3), (1, 3)}
    # degrees reported stay UNcapped (jaccard never inflated)
    r13 = {
        (r["node_a"], r["node_b"]): r
        for r in neighbor_jaccard(edges, max_degree=2).collect()
    }[(1, 3)]
    assert r13["deg_b"] == 3
    with _pytest.raises(ValueError):
        neighbor_jaccard(edges, min_common=0)


def test_partition_modularity_known_graph(spark):
    import pytest as _pytest

    from momyre_spark.operators.graph import partition_modularity

    # two triangles joined by one bridge edge: m = 7
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4),
         (2, 1)],  # duplicate reversed edge: canonicalization dedups
        "src long, dst long",
    )
    labels = spark.createDataFrame(
        [(n, 1 if n <= 3 else 4) for n in range(1, 7)],
        "node long, component long",
    )
    got = {r["component"]: r
           for r in partition_modularity(edges, labels).collect()}
    assert set(got) == {1, 4}
    c1 = got[1]
    assert c1["n_nodes"] == 3 and c1["intra_edges"] == 3
    assert c1["degree_sum"] == 7  # degrees 2,2,3
    # q = 3/7 - (7/14)^2 = 3/7 - 1/4
    assert c1["q_term"] == _pytest.approx(3.0 / 7.0 - 0.25, abs=1e-6)
    assert got[4]["q_term"] == _pytest.approx(3.0 / 7.0 - 0.25, abs=1e-6)
    # Q of this partition = 2 * (3/7 - 1/4) ~ 0.357: strongly modular
    # all-one-community partition: Q = 7/7 - 1 = 0
    one = spark.createDataFrame(
        [(n, 0) for n in range(1, 7)], "node long, component long"
    )
    rows = partition_modularity(edges, one).collect()
    assert len(rows) == 1
    assert rows[0]["q_term"] == _pytest.approx(0.0, abs=1e-6)


@pytest.mark.slow
def test_pagerank_driver_fast_path_matches_distributed(spark):
    """The small-graph numpy fast path must be BIT-identical to the
    distributed rounds (driver_edge_gate=0 forces them): exact int64
    sums + the same single IEEE double op tree per step. Covered for
    the uniform walk, the seeded walk, and the tol early-stop."""
    from pyspark.sql import Row

    from momyre_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in
         [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (6, 1), (7, 3)]]
    )
    seeds = spark.createDataFrame([Row(node=1), Row(node=4)])
    for kw in (
        {},
        {"seeds": seeds},
        {"tol": 1e-6},
        {"damping": 0.5, "max_iter": 7},
    ):
        fast = {r["node"]: r["rank"]
                for r in pagerank(edges, **kw).collect()}
        dist = {r["node"]: r["rank"]
                for r in pagerank(edges, driver_edge_gate=0, **kw).collect()}
        assert fast == dist, kw  # exact equality, not approx
    # the durable path ignores the gate (checkpoint machinery must run)
    import tempfile

    with tempfile.TemporaryDirectory() as ck:
        dur = {r["node"]: r["rank"]
               for r in pagerank(edges, checkpoint_dir=ck).collect()}
    assert dur == {r["node"]: r["rank"] for r in pagerank(edges).collect()}


def test_kcore_driver_fast_path_matches_distributed(spark):
    """The driver peel must equal the distributed peel exactly — the
    k-core fixpoint is confluent, so any peeling order lands on the
    same (node, in-core degree) set. Includes an empty-core case."""
    from pyspark.sql import Row

    from momyre_spark.operators.graph import kcore

    # 4-clique (core at k=3) + a tail that peels away + duplicate and
    # reversed edges (canonicalization must collapse them)
    raw = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
           (4, 5), (5, 6), (2, 1), (3, 1)]
    edges = spark.createDataFrame([Row(src=a, dst=b) for a, b in raw])
    for kk in (2, 3, 5):
        fast = {(r["node"], r["degree"])
                for r in kcore(edges, k=kk).collect()}
        dist = {(r["node"], r["degree"])
                for r in kcore(edges, k=kk, driver_edge_gate=0).collect()}
        assert fast == dist, kk
    assert {r["node"] for r in kcore(edges, k=3).collect()} == {1, 2, 3, 4}
    assert kcore(edges, k=5).count() == 0  # empty core, stable schema


def test_pagerank_empty_edges_both_paths(spark):
    """A fully-filtered upstream yields ZERO edges. The fast path used to
    divide dangling mass by n=0 nodes (ADVICE r08); both paths must now
    return an empty (node, rank) frame with the stable schema."""
    from pyspark.sql import Row

    from momyre_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [Row(src=1, dst=2)]
    ).filter("src > 100")  # empty, but with a concrete schema
    for kw in ({}, {"driver_edge_gate": 0}):
        out = pagerank(edges, **kw)
        assert out.columns == ["node", "rank"]
        assert out.count() == 0


def test_kcore_driver_path_releases_probe_cut(spark):
    """Round-9 change: kcore checkpoints the canonicalized edges BEFORE
    the gate probe (so an over-gate graph reuses them instead of paying
    the distinct shuffle twice). The driver fast path must release that
    cut — a small-graph call leaves ZERO new persistent blocks behind."""
    from pyspark.sql import Row

    from momyre_spark.operators.graph import kcore

    sc = spark.sparkContext

    def n_blocks():
        return sc._jsc.getPersistentRDDs().size()

    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in
         [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]]
    )
    before = n_blocks()
    out = kcore(edges, k=3)
    out.collect()
    assert n_blocks() == before  # probe cut released on the fast path
    assert {r["node"] for r in out.collect()} == {1, 2, 3, 4}


def test_degree_distribution_known_values(spark):
    """Hand-checked histogram + exact CCDF, directed and undirected."""
    from momyre_spark.operators.graph import degree_distribution

    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 1)], "src long, dst long"
    )
    und = {r["degree"]: r for r in degree_distribution(e).collect()}
    # endpoint counts: 1->3, 2->2, 3->2, 4->1
    assert {d: r["n_nodes"] for d, r in und.items()} == {1: 1, 2: 2, 3: 1}
    assert und[1]["ccdf"] == 1.0
    assert und[2]["ccdf"] == 0.75
    assert und[3]["ccdf"] == 0.25
    dird = {r["degree"]: r for r in
            degree_distribution(e, directed=True).collect()}
    # out-degrees: 1->2, 2->1, 4->1  (node 3 emits nothing)
    assert {d: r["n_nodes"] for d, r in dird.items()} == {1: 2, 2: 1}
