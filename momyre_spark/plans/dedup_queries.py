"""Dedup queries over ``documents``/``embeddings`` (operators/dedup.py).

The testdata plants true near-duplicates (Jaccard >= 0.9 pairs with a wide
gap to the ~0.03 background), so threshold 0.8 separates signal cleanly.

Oracle notes: DuckDB lacks xxhash64, so the MinHash-LSH query is validated
against the *exact* Jaccard oracle — legitimate because the operator
exact-verifies its candidates and banding recall at J>=0.9 with 32x4 bands
is 1-1e-15. SimHash has no DuckDB-expressible oracle (rows-only check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from momyre_spark.plans import query
from momyre_spark.sources.parquet import load_table

# Shared DuckDB fragments -------------------------------------------------
_DUCK_TOKENS = "string_split_regex(trim(lower(text)), '\\s+')"

_DUCK_JACCARD = """
    WITH d AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ),
    g AS (
        SELECT doc_id, list_distinct(list_transform(
            range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        )) AS sh
        FROM d WHERE len(w) >= 3
    ),
    e AS (SELECT doc_id, unnest(sh) AS s FROM g),
    sizes AS (SELECT doc_id, len(sh) AS n FROM g),
    pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
        FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT a_id, b_id,
           floor((inter / CAST(sa.n + sb.n - inter AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS jaccard
    FROM pairs
    JOIN sizes sa ON pairs.a_id = sa.doc_id
    JOIN sizes sb ON pairs.b_id = sb.doc_id
    WHERE inter / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.8
    ORDER BY a_id, b_id
"""


# --------------------------------------------------------------------------
# Exact dedup: hash-groupBy on a normalization fingerprint
# --------------------------------------------------------------------------
@query(
    "dedup_exact_groups",
    oracle=f"""
    SELECT md5(array_to_string({_DUCK_TOKENS}, ' ')) AS fp,
           min(doc_id) AS keep_id, count(*) AS dup_cnt
    FROM documents GROUP BY 1 ORDER BY keep_id
    """,
)
def dedup_exact_groups(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.dedup import exact_duplicates

    docs = load_table(spark, sf, "documents")
    return exact_duplicates(docs).orderBy("keep_id")


@query(
    "dedup_exact_corpus",
    oracle=f"""
    SELECT doc_id, n_chars FROM documents
    WHERE doc_id IN (
        SELECT min(doc_id) FROM documents
        GROUP BY md5(array_to_string({_DUCK_TOKENS}, ' '))
    )
    ORDER BY doc_id
    """,
)
def dedup_exact_corpus(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.dedup import dedup_exact

    docs = load_table(spark, sf, "documents")
    return dedup_exact(docs).select("doc_id", "n_chars").orderBy("doc_id")


# --------------------------------------------------------------------------
# Exact n-gram Jaccard pairs via shingle inverted index
# --------------------------------------------------------------------------
@query("dedup_ngram_jaccard", oracle=_DUCK_JACCARD)
def dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.8).orderBy("a_id", "b_id")


# --------------------------------------------------------------------------
# MinHash + LSH (band-bucket candidates, exact verify) — validated against
# the exact-Jaccard oracle (see module docstring)
# --------------------------------------------------------------------------
@query("dedup_minhash_lsh", oracle=_DUCK_JACCARD)
def dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf, "documents")
    return minhash_lsh_pairs(docs, threshold=0.8).orderBy("a_id", "b_id")


# --------------------------------------------------------------------------
# SimHash near-dups (no DuckDB oracle: xxhash64; driver rows-only check)
# --------------------------------------------------------------------------
@query("dedup_simhash")
def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.dedup import simhash_pairs

    docs = load_table(spark, sf, "documents")
    return simhash_pairs(docs, max_hamming=3).orderBy("a_id", "b_id")


# --------------------------------------------------------------------------
# Embedding-cosine near-dup pairs. Oracle mirrors the engine's exact float
# recipe: sequential-fold dot product in float64 (list_reduce), sqrt norms —
# bit-identical across engines.
# --------------------------------------------------------------------------
_DUCK_COSINE_PAIRS = """
    WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    nrm AS (SELECT vec_id,
                   sqrt(list_reduce(list_transform(range(1, 65), i -> v[i] * v[i]),
                                    (acc, x) -> acc + x)) AS nn
            FROM e0),
    e AS (SELECT e0.vec_id, list_transform(e0.v, x -> x / nrm.nn) AS v
          FROM e0 JOIN nrm USING (vec_id)),
    p AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               list_reduce(list_transform(range(1, 65), i -> a.v[i] * b.v[i]),
                           (acc, x) -> acc + x) AS cos
        FROM e a JOIN e b ON a.vec_id < b.vec_id
    )
    SELECT a_id, b_id, floor(cos * 10000 + 0.5) / 10000.0 AS cos FROM p
    WHERE cos >= 0.4 ORDER BY a_id, b_id
"""


@query("dedup_embedding_cosine", oracle=_DUCK_COSINE_PAIRS)
def dedup_embedding_cosine(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.dedup import embedding_neardup_pairs

    emb = load_table(spark, sf, "embeddings")
    return embedding_neardup_pairs(emb, threshold=0.4).orderBy("a_id", "b_id")


# --------------------------------------------------------------------------
# Duplicate groups: LSH pairs -> connected components (no SQL oracle —
# iterative algorithm; driver records a rows-only check, pytest validates
# against a Python union-find)
# --------------------------------------------------------------------------
@query("dedup_groups")
def dedup_groups(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.dedup import duplicate_components, minhash_lsh_pairs

    docs = load_table(spark, sf, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.8)
    return duplicate_components(pairs).orderBy("id")


# --------------------------------------------------------------------------
# Full curation pipeline (operators/curate.py): quality gate -> lang filter
# -> exact dedup -> LSH near-dup removal. Iterative components => rows-only
# driver check; pytest validates against a Python reference (test_curate.py).
# --------------------------------------------------------------------------
@query("curate_corpus")
def curate_corpus_q(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.curate import curate_corpus

    docs = load_table(spark, sf, "documents")
    curated, _report = curate_corpus(
        docs, min_tokens=10, min_quality=0.3, neardup_threshold=0.8
    )
    return curated.select("doc_id", "lang", "n_chars").orderBy("doc_id")


# --------------------------------------------------------------------------
# Synthetic-corpus LSH at scale: 20k generated docs (murmur3-derived word
# salad, ~100 planted near-dup pairs at one-perturbed-word-in-ten). Rows-only
# (generator uses Spark's hash); demonstrates the pipeline's scaling curve
# beyond the fixture corpus (measured near-linear: 5k->2.7s, 50k->13.5s).
# --------------------------------------------------------------------------
_N_SYN_DOCS = 20_000


@query("dedup_minhash_synthetic_20k")
def dedup_minhash_synthetic_20k(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.range(_N_SYN_DOCS).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat_ws(' ', transform(sequence(0, 119), "
            "j -> concat('w', CAST(pmod(hash(CASE WHEN id % 500 = 1 AND j % 10 <> 0 "
            "THEN id - 1 ELSE id END, j), 5000) AS STRING))))"
        ).alias("text"),
    )
    return minhash_lsh_pairs(docs, threshold=0.5).orderBy("a_id", "b_id")
