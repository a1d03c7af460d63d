"""Dedup operator unit tests (beyond the oracle queries): planted duplicates,
LSH candidate recall, simhash behavior, connected components."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from momyre_spark.operators.dedup import (
    dedup_exact,
    duplicate_components,
    exact_duplicates,
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
    got = {r["id"]: r["component"] for r in duplicate_components(df).collect()}
    assert got == _components_reference(pairs)
    # chain 1-2-3-10-11-12-13 collapses to min label 1; 20-21 separate
    assert got[13] == 1 and got[21] == 20
