"""Dedup operator unit tests (beyond the oracle queries): planted duplicates,
LSH candidate recall, simhash behavior, connected components."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from momyre_spark.operators.dedup import (
    dedup_exact,
    duplicate_components,
    exact_duplicates,
    hamming_neardup_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_pairs,
)

BASE = (
    "spark shuffles data between stages when a wide dependency requires "
    "repartitioning by key across the cluster nodes during execution"
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_exact_dedup_normalization(spark):
    docs = _docs(spark, [BASE, "  " + BASE.upper() + "  ", "totally different text here ok"])
    groups = exact_duplicates(docs).collect()
    by_keep = {r["keep_id"]: r["dup_cnt"] for r in groups}
    assert by_keep == {0: 2, 2: 1}  # 0 and 1 collapse (case/whitespace)
    survivors = sorted(r["doc_id"] for r in dedup_exact(docs).collect())
    assert survivors == [0, 2]


def test_ngram_jaccard_finds_planted_neardup(spark):
    words = BASE.split()
    mutated = " ".join(words[:-1] + ["finally"])  # one word changed
    unrelated = "completely unrelated content about cooking pasta at home yes"
    docs = _docs(spark, [BASE, mutated, unrelated])
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert [(p["a_id"], p["b_id"]) for p in pairs] == [(0, 1)]
    assert 0.5 < pairs[0]["jaccard"] < 1.0


def test_minhash_lsh_equals_exact_on_high_threshold(spark):
    words = BASE.split()
    texts = [BASE, " ".join(words[:-1] + ["finally"])]
    # add unrelated noise docs
    texts += [f"noise doc number {i} with its own distinct tail {i * 7}" for i in range(20)]
    docs = _docs(spark, texts)
    exact = {(p["a_id"], p["b_id"]) for p in
             ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    lsh = {(p["a_id"], p["b_id"]) for p in
           minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert lsh == exact == {(0, 1)}


def test_minhash_lsh_candidates_subquadratic(spark):
    texts = [f"doc {i} about topic {i % 5} body text {i * 13} end" for i in range(40)]
    docs = _docs(spark, texts)
    cand = minhash_lsh_pairs(docs, verify=False).count()
    assert cand < 40 * 39 / 2 / 4  # far below all-pairs


def test_simhash_similar_docs_close(spark):
    words = BASE.split()
    docs = _docs(spark, [BASE, " ".join(words[:-1] + ["finally"]),
                         "entirely different words about gardening tulips soil water sun"])
    fps = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    ham01 = bin(fps[0] ^ fps[1]).count("1")
    ham02 = bin(fps[0] ^ fps[2]).count("1")
    assert ham01 < ham02
    assert all(v >= 0 for v in fps.values())  # 63-bit: stays non-negative


def test_simhash_pairs_blocking(spark):
    docs = _docs(spark, [BASE, BASE, "other thing entirely about music theory"])
    pairs = simhash_pairs(docs, max_hamming=3).collect()
    assert [(p["a_id"], p["b_id"], p["hamming"]) for p in pairs] == [(0, 1, 0)]


def _components_reference(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_duplicate_components_matches_union_find(spark):
    pairs = [(1, 2), (2, 3), (10, 11), (11, 12), (12, 13), (20, 21), (3, 10)]
    df = spark.createDataFrame([Row(a_id=a, b_id=b) for a, b in pairs])
    # BOTH paths must equal the reference: the default driver fast path
    # (edge count under the gate) and the distributed min-label rounds
    # (gate=0 forces them) — the gate is a pure performance routing
    # decision, never a semantics change
    for gate in (1_000_000, 0):
        got = {
            r["id"]: r["component"]
            for r in duplicate_components(
                df, driver_edge_gate=gate
            ).collect()
        }
        assert got == _components_reference(pairs), gate
        # chain 1-2-3-10-11-12-13 collapses to min label 1; 20-21 separate
        assert got[13] == 1 and got[21] == 20


def test_semantic_synthetic_20k_scale_evidence(spark):
    """Scale evidence for the SRP-LSH semantic-dedup path at a PRODUCTION
    threshold (0.9) — the regime the 500-row fixture cannot exercise (its
    label-clustered embeddings at the oracle-scaled 0.4 threshold make a
    near-complete graph). On 20k synthetic embeddings: the verified pair
    set is EXACTLY the 200 planted one-coordinate flips (linear in N by
    construction — 1 per 100 rows), pair cosines are exactly 62/64, and
    the plan has no cartesian anywhere."""
    from momyre_spark.operators.dedup import embedding_neardup_pairs
    from momyre_spark.plans.dedup_queries import _N_SEM, _sem_emb

    emb = _sem_emb(spark)
    assert emb.count() == _N_SEM

    pairs = embedding_neardup_pairs(
        emb, threshold=0.9, num_planes=12, num_tables=24
    )
    rows = pairs.collect()
    assert len(rows) == _N_SEM // 100  # 200: linear, all planted
    for r in rows:
        assert r["b_id"] - r["a_id"] == 1 and r["b_id"] % 100 == 1
        assert float(r["cos"]) == 0.9688  # (64-2)/64 rounded to 4
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_duplicate_components_releases_caches(spark):
    """One-shot callers must not leak the edge cache or per-round
    checkpoint blocks: after the call, at most ONE new persistent block
    remains (the materialized result), and threading ``persisted`` +
    unpersisting releases even that (VERDICT r04 item #3 / ADVICE)."""
    sc = spark.sparkContext

    def n_blocks():
        return sc._jsc.getPersistentRDDs().size()

    pairs = [(i, i + 1) for i in range(0, 40, 2)] + [(1, 2), (3, 4), (5, 6)]
    df = spark.createDataFrame([Row(a_id=a, b_id=b) for a, b in pairs])
    before = n_blocks()
    # gate=0 forces the distributed rounds — the path whose lifecycle
    # this test pins
    out = duplicate_components(df, driver_edge_gate=0)
    out.collect()
    assert n_blocks() <= before + 1  # only the result's own block
    # threaded mode: the shim releases the result block too
    held: list = []
    out2 = duplicate_components(df, persisted=held, driver_edge_gate=0)
    got = {r["id"]: r["component"] for r in out2.collect()}
    assert got == _components_reference(pairs)
    for h in held:
        h.unpersist()
    assert n_blocks() <= before + 1  # back to just the first call's block
    # the driver fast path persists NOTHING (local-relation result)
    held3: list = []
    base = n_blocks()
    out3 = duplicate_components(df, persisted=held3)
    assert {r["id"]: r["component"] for r in out3.collect()} == got
    assert n_blocks() == base and held3 == []


def test_prefix_filter_matches_plain_inverted_index(spark):
    """Prefix filtering is lossless: identical pairs + jaccards on the
    fixture corpus, both orders of magnitude."""
    from momyre_spark.operators.dedup import ngram_jaccard_pairs
    from momyre_spark.sources.parquet import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    for t in (0.5, 0.8):
        fast = {(r["a_id"], r["b_id"], r["jaccard"]) for r in
                ngram_jaccard_pairs(docs, threshold=t).collect()}
        plain = {(r["a_id"], r["b_id"], r["jaccard"]) for r in
                 ngram_jaccard_pairs(docs, threshold=t, prefix_filter=False).collect()}
        assert fast == plain and len(plain) > 0


def test_prefix_filter_bounds_hot_shingle_candidates(spark):
    """A stop-phrase shared by EVERY document must not make candidate
    generation quadratic: with prefix filtering the hot shingles fall
    outside the rare-first prefixes, so candidates stay ~linear."""
    from pyspark.sql import Row

    from momyre_spark.operators.dedup import ngram_jaccard_pairs

    # 300 docs, each ending in the same hot phrase (7 shared shingles);
    # unique head per doc, so true J(a,b) ~ 7/25 << 0.5 for all pairs
    rows = [
        Row(doc_id=i,
            text=" ".join(f"u{i}w{j}" for j in range(12))
            + " the quick brown fox jumps over the lazy dog")
        for i in range(300)
    ]
    docs = spark.createDataFrame(rows)
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    assert pairs.count() == 0  # no true near-dups

    # candidate set (pre-verify) stays bounded: rerun candidate stage alone
    # by instrumenting via the plain path comparison — the plain inverted
    # index would generate 300*299/2 = 44850 candidate pairs from the hot
    # shingles; assert the prefix path's verify join stays tiny by timing
    # proxy: count distinct prefix-join pairs directly
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from momyre_spark.operators.dedup import _shingled

    sh = _shingled(docs, "doc_id", "text", 3)
    ex = sh.select("__id", F.size("__sh").alias("__n"), F.explode("__sh").alias("s"))
    freq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy("__id").orderBy(F.col("__df").asc(), F.col("s"))
    prefix = (ex.join(freq, "s").withColumn("__rk", F.row_number().over(w))
              .filter(F.col("__rk") <= F.col("__n") - F.ceil(F.lit(0.5) * F.col("__n")) + 1)
              .select("__id", "s"))
    a, b = prefix.alias("a"), prefix.alias("b")
    ncand = (a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.__id") < F.col("b.__id")))
             .select("a.__id", "b.__id").distinct().count())
    assert ncand == 0  # hot shingles excluded from every prefix


def test_segment_dedup_drops_boilerplate_keeps_first(spark):
    from momyre_spark.operators.dedup import segment_dedup

    boiler = "x " * 9 + "x"  # exactly one 10-word segment
    docs = spark.createDataFrame(
        [
            (1, boiler + " unique alpha words here"),
            (2, boiler + " other beta content words"),
            (3, boiler),  # nothing but boilerplate -> empty survivor
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in segment_dedup(docs, 10).collect()}
    assert got[1]["text"].startswith(boiler)       # first occurrence kept
    assert "unique alpha" in got[1]["text"]
    assert not got[2]["text"].startswith("x")      # later copy dropped
    assert "other beta" in got[2]["text"]
    assert got[3]["text"] == "" and got[3]["n_kept"] == 0
    assert got[3]["n_segments"] == 1


def test_segment_dedup_within_doc_repeat(spark):
    from momyre_spark.operators.dedup import segment_dedup

    seg = " ".join(["w"] * 10)
    docs = spark.createDataFrame(
        [(1, seg + " " + seg)], "doc_id long, text string"
    )
    row = segment_dedup(docs, 10).collect()[0]
    assert row["n_segments"] == 2 and row["n_kept"] == 1
    assert row["text"] == seg


def test_lsh_degenerate_duplicate_cluster_stays_linear(spark):
    """2,000 identical documents must NOT expand to ~2M candidate pairs
    (the K^2 bucket explosion): above MAX_FULL_BUCKET the generator emits
    star edges, and transitive grouping still collapses the whole cluster
    to one component."""
    from pyspark.sql import Row

    from momyre_spark.operators.dedup import (
        duplicate_components,
        minhash_lsh_pairs,
    )

    text = "the same boilerplate page body repeated across a crawl snapshot"
    df = spark.createDataFrame(
        [Row(doc_id=i, text=text) for i in range(2000)]
    )
    pairs = minhash_lsh_pairs(df, threshold=0.5)
    n_pairs = pairs.count()
    assert 0 < n_pairs < 50_000  # star edges per band, not ~2M
    comps = duplicate_components(pairs)
    assert (
        comps.selectExpr("min(component)").first()[0]
        == comps.selectExpr("max(component)").first()[0]
    )  # every doc in ONE component
    assert comps.count() == 2000


def test_hamming_synthetic_20k_scale_evidence(spark):
    """Scale evidence for the pigeonhole hamming family (the candidate
    generator under image-dhash / audio-envelope / SimHash dedup), mirroring
    dedup_minhash_synthetic_20k: on the 20k synthetic fingerprint corpus the
    block join must stay NEAR-LINEAR (bucket pair-count a small multiple of
    N, never quadratic) and the degenerate-fp collapse guard must absorb the
    planted 100-identical-fp group (K^2/2 = 4950 bucket pairs without it)
    into 99 star edges."""
    from momyre_spark.plans.dedup_queries import (
        _HAM_RADIUS,
        _N_HAM,
        _ham_fps,
    )

    fps = _ham_fps(spark)
    assert fps.count() == _N_HAM

    # ---- output shape: exactly the planted structures, nothing quadratic
    pairs = hamming_neardup_pairs(fps, max_hamming=_HAM_RADIUS, hash_col="fp")
    rows = pairs.collect()
    star = [r for r in rows if r["hamming"] == 0]
    near = [r for r in rows if r["hamming"] > 0]
    assert len(star) == 99 and all(r["a_id"] == 7 for r in star)
    assert len(near) == 200
    for r in near:  # planted at EXACTLY 1 + (i % 3) flipped bits
        assert r["b_id"] - r["a_id"] == 1 and r["b_id"] % 100 == 1
        assert r["hamming"] == 1 + r["b_id"] % 3
    # no cartesian anywhere in the physical plan
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan

    # ---- candidate volume: post-collapse bucket sizes give sum C(n,2)
    # bounded by a small multiple of N — the near-linear claim
    n_blocks = _HAM_RADIUS + 1
    bounds = [(i * 64) // n_blocks for i in range(n_blocks + 1)]
    reps = fps.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    blocked = reps.select(
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("fp"), bounds[i]).bitwiseAND(
                    F.lit((1 << (bounds[i + 1] - bounds[i])) - 1).cast("long")
                )
                for i in range(n_blocks)
            ])
        ).alias("block", "bv")
    )
    cand = (
        blocked.groupBy("block", "bv")
        .count()
        .select(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("c"))
        .collect()[0]["c"]
    )
    assert cand < 5 * _N_HAM, cand  # near-linear, nowhere near N^2/2
    # the collapse guard is what keeps it there: the identical group alone
    # would contribute C(100,2) = 4950 candidates in EVERY block
    uncollapsed = fps.select(
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("fp"), bounds[i]).bitwiseAND(
                    F.lit((1 << (bounds[i + 1] - bounds[i])) - 1).cast("long")
                )
                for i in range(n_blocks)
            ])
        ).alias("block", "bv")
    )
    unc = (
        uncollapsed.groupBy("block", "bv")
        .count()
        .select(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("c"))
        .collect()[0]["c"]
    )
    assert unc - cand >= 4950 * n_blocks * 0.99  # the blowup the guard kills


def test_dedup_semantic_collapses_planted_cluster(spark):
    """Three near-identical embeddings (plus noise) collapse to the min-id
    member; orthogonal-ish vectors all survive; survivors deterministic."""
    import random as _r

    from momyre_spark.operators.dedup import dedup_semantic

    _r.seed(21)
    base = [_r.gauss(0, 1) for _ in range(16)]

    def near(eps):
        return [x + _r.gauss(0, eps) for x in base]

    rows = [
        Row(vec_id=1, embedding=near(0.01)),
        Row(vec_id=5, embedding=near(0.01)),
        Row(vec_id=9, embedding=near(0.01)),
    ] + [
        Row(vec_id=100 + i,
            embedding=[_r.gauss(0, 1) for _ in range(16)])
        for i in range(30)
    ]
    emb = spark.createDataFrame(rows)
    kept = sorted(
        r["vec_id"]
        for r in dedup_semantic(emb, threshold=0.95, dim=16,
                                num_planes=8, num_tables=12).collect()
    )
    assert 1 in kept and 5 not in kept and 9 not in kept
    assert all(v in kept for v in range(100, 130))
    again = sorted(
        r["vec_id"]
        for r in dedup_semantic(emb, threshold=0.95, dim=16,
                                num_planes=8, num_tables=12).collect()
    )
    assert kept == again


def test_cross_source_fuzzy_overlap_counts_pairs(spark):
    """A near-dup pair across sources counts once under (least, greatest);
    same-source near-dups and exact-different docs don't count."""
    from momyre_spark.operators.dedup import cross_source_fuzzy_overlap

    words = BASE.split()
    near = " ".join(words[:-1] + ["finally"])
    rows = [
        Row(doc_id=0, source="crawlA", text=BASE),
        Row(doc_id=1, source="crawlB", text=near),        # cross-source pair
        Row(doc_id=2, source="crawlB", text=BASE),        # also pairs with 0
        Row(doc_id=3, source="crawlA", text="unrelated cooking content pasta sauce tomato basil recipe"),
    ]
    got = {
        (r["source_a"], r["source_b"]): r["neardup_pairs"]
        for r in cross_source_fuzzy_overlap(
            spark.createDataFrame(rows), threshold=0.5
        ).collect()
    }
    # pairs: (0,1) A-B, (0,2) A-B, (1,2) B-B filtered out
    assert got == {("crawlA", "crawlB"): 2}


def test_component_survivors_keeps_best_quality(spark):
    """Per duplicate cluster the HIGHEST-quality member survives (ties ->
    lowest id); min-id default unchanged; singletons always pass."""
    from momyre_spark.operators.dedup import component_survivors

    docs = spark.createDataFrame([
        Row(doc_id=1, q=0.2), Row(doc_id=2, q=0.9), Row(doc_id=3, q=0.5),
        Row(doc_id=10, q=0.4), Row(doc_id=11, q=0.4),
        Row(doc_id=99, q=0.1),  # not in any component
    ])
    comp = spark.createDataFrame([
        Row(id=1, component=1), Row(id=2, component=1), Row(id=3, component=1),
        Row(id=10, component=10), Row(id=11, component=10),
    ])
    best = {r["doc_id"] for r in component_survivors(
        docs, comp, quality_col="q").collect()}
    assert best == {2, 10, 99}  # 2 beats 1/3 on quality; 10 ties-to-min; 99 solo
    default = {r["doc_id"] for r in component_survivors(docs, comp).collect()}
    assert default == {1, 10, 99}  # min-id rule


def test_containment_pairs_asymmetric_and_lossless(spark):
    """Containment catches doc-inside-doc that Jaccard misses; the
    contained-side prefix filter is lossless vs brute force; both
    directions report independently for near-identical docs."""
    from pyspark.sql import Row

    from momyre_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs

    long = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
           "lam mu nu xi omicron pi rho sigma tau upsilon"
    short = "alpha beta gamma delta epsilon zeta eta theta"  # prefix quote
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=long),
            Row(doc_id=2, text=short),
            Row(doc_id=3, text="totally different words entirely here okay"),
            Row(doc_id=4, text=long),  # exact dup of 1 -> both directions
        ]
    )
    got = {(r["a_id"], r["b_id"]): r["containment"]
           for r in containment_pairs(docs, threshold=0.9).collect()}
    assert got[(2, 1)] == 1.0           # short fully contained in long
    assert (1, 2) not in got            # container direction fails t
    assert got[(1, 4)] == 1.0 and got[(4, 1)] == 1.0
    assert not any(3 in p for p in got)
    # Jaccard at the same threshold misses the quote (union-dominated)
    jac = {(r["a_id"], r["b_id"])
           for r in ngram_jaccard_pairs(docs, threshold=0.9).collect()}
    assert (2, 1) not in jac and (1, 2) not in jac


def test_frequency_cap_known_values(spark):
    from momyre_spark.operators.dedup import frequency_cap

    df = spark.createDataFrame(
        [(1, "aaa"), (2, "aaa"), (3, "aaa"), (4, "bbb"), (5, "bbb"),
         (6, "ccc")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in frequency_cap(df, k=2).collect()}
    assert len(got) == 6  # every row emitted with a verdict
    # copy_rank: exact while <= k, NULL past the cap (skew-safe contract)
    assert [got[i]["copy_rank"] for i in (1, 2, 3)] == [1, 2, None]
    assert [got[i]["kept"] for i in (1, 2, 3)] == [True, True, False]
    assert all(got[i]["n_copies"] == 3 for i in (1, 2, 3))
    assert got[4]["kept"] and got[5]["kept"] and got[6]["kept"]
    assert [got[i]["copy_rank"] for i in (4, 5, 6)] == [1, 2, 1]
    assert got[6]["n_copies"] == 1
    # route invariance: star_gate=1 forces EVERY cluster down the salted
    # giga path, salt_buckets=1 collapses its buckets — all three plans
    # must agree with the default (bounded-window) route exactly
    for kw in ({"star_gate": 1}, {"star_gate": 1, "salt_buckets": 1}):
        alt = {r["doc_id"]: r for r in
               frequency_cap(df, k=2, **kw).collect()}
        assert {i: (r["copy_rank"], r["kept"]) for i, r in got.items()} == {
            i: (r["copy_rank"], r["kept"]) for i, r in alt.items()
        }, kw
    import pytest as _pytest
    with _pytest.raises(ValueError):
        frequency_cap(df, k=0)


def test_frequency_cap_null_text_rows_kept(spark):
    """NULL-text rows must NOT vanish (md5(NULL) is NULL and an equi-join
    on NULL matches nothing — the null-safe __jkey guards this). They
    form ONE cluster (the window oracle's PARTITION BY groups all NULLs
    together), ranked by id, capped at k, with content_key NULL."""
    from momyre_spark.operators.dedup import frequency_cap

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, None), (4, "aaa")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in frequency_cap(df, k=2).collect()}
    assert len(got) == 4  # every row emitted with a verdict
    assert [got[i]["copy_rank"] for i in (1, 2, 3)] == [1, 2, None]
    assert [got[i]["kept"] for i in (1, 2, 3)] == [True, True, False]
    assert all(got[i]["n_copies"] == 3 for i in (1, 2, 3))
    assert all(got[i]["content_key"] is None for i in (1, 2, 3))
    assert got[4]["kept"] and got[4]["content_key"] is not None


def test_cluster_size_stats_known_values(spark):
    """Histogram hand-check: three identical + two identical + one unique
    doc -> sizes {3: 1 cluster, 2: 1, 1: 1}; conservation sum(n_docs) ==
    corpus; removable = keep-one cut."""
    import pytest as _pytest

    from momyre_spark.operators.dedup import cluster_size_stats

    df = spark.createDataFrame(
        [(1, "aaa"), (2, "aaa"), (3, "aaa"), (4, "bbb"), (5, "bbb"),
         (6, "ccc")],
        "doc_id long, text string",
    )
    got = {r["cluster_size"]: r for r in cluster_size_stats(df).collect()}
    assert {k: (got[k]["n_clusters"], got[k]["n_docs"],
                got[k]["removable_docs"]) for k in got} == {
        3: (1, 3, 2), 2: (1, 2, 1), 1: (1, 1, 0)}
    assert sum(r["n_docs"] for r in got.values()) == 6
    # bow keying merges order-shuffled docs
    shuf = spark.createDataFrame(
        [(1, "x y z"), (2, "z x y"), (3, "p q")],
        "doc_id long, text string",
    )
    bow = {r["cluster_size"]: r
           for r in cluster_size_stats(shuf, key="bow").collect()}
    assert bow[2]["n_clusters"] == 1 and bow[1]["n_clusters"] == 1
    with _pytest.raises(ValueError):
        cluster_size_stats(df, key="nope")


def test_duplicate_components_distributed_long_chain(spark):
    """Stale path halving (shortcut through the PREVIOUS round's labels)
    must still converge in O(log diameter) rounds on a long chain —
    a 120-node path is the halving-hostile worst case and must finish
    inside the default max_iterations with the distributed rounds."""
    pairs = [(i, i + 1) for i in range(120)]
    df = spark.createDataFrame([Row(a_id=a, b_id=b) for a, b in pairs])
    got = {
        r["id"]: r["component"]
        for r in duplicate_components(df, driver_edge_gate=0).collect()
    }
    assert got == {i: 0 for i in range(121)}
