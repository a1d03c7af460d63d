"""Similarity search over embedding columns (``array<float>``).

Three physical strategies for the same logical op (top-k neighbors by cosine):

- ``brute_force_topk``       : pure column expressions (zip_with/aggregate) +
                               per-query window top-k. Exact; the correctness
                               baseline. Cost O(|queries| * |corpus|) but fully
                               distributed — queries are broadcast, the corpus
                               is never shuffled, and TakeOrdered per query
                               bounds memory.
- ``brute_force_topk_numpy`` : Arrow-batched ``mapInPandas`` — each corpus
                               partition computes a (batch x queries) matrix
                               product with BLAS, emits its local top-k, and a
                               tiny global reduce finishes. This is the 100 TB
                               path: ~10-100x faster per row than per-element
                               expressions at high dims, and the shuffle
                               carries only |queries| * k * partitions rows.
- ``ivf_topk``               : IVF-style pruning — vectors are assigned to the
                               nearest of C centroids; a query searches only
                               its own cell. Approximate (recall < 1 near cell
                               boundaries), but the scan per query drops from
                               N to ~N/C. Centroid "training" here picks the
                               first C vectors deterministically; swap in
                               k-means centroids in production.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from momyre_spark.functions.numeric import round_half_up
from momyre_spark.functions.vectors import cosine


def _pairs_with_cosine(corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    from momyre_spark.functions.vectors import add_normalized, dot

    q = add_normalized(queries, vec_col, "__nv").select(
        F.col(id_col).alias("query_id"), F.col("__nv").alias("__qv")
    )
    c = add_normalized(corpus, vec_col, "__nv").select(
        F.col(id_col).alias("neighbor_id"), F.col("__nv").alias("__cv")
    )
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", dot(F.col("__cv"), F.col("__qv")))
    )


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", round_half_up(F.col("cos"), 4).alias("cos"))
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query (queries broadcast)."""
    return _topk(_pairs_with_cosine(corpus, queries, id_col, vec_col), k)


def brute_force_topk_numpy(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k via Arrow-batched numpy matmul per corpus partition.

    The query matrix rides to executors as a plain task closure (it is
    dimension-sized); each Arrow batch computes all its scores in one BLAS
    call and emits only its local top-k, so the global window sees
    |partitions| * |queries| * k rows, not the corpus.
    """
    import numpy as np

    qrows = queries.select(id_col, vec_col).collect()  # queries are small by contract
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array([r[1] for r in qrows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)

    out_schema = "query_id long, neighbor_id long, cos double"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ q_mat.T  # (batch, queries)
            for qi, qid in enumerate(q_ids):
                col = sims[:, qi]
                mask = ids != qid
                cids, cs = ids[mask], col[mask]
                if len(cids) > k:
                    part = np.argpartition(-cs, k)[:k]
                    cids, cs = cids[part], cs[part]
                yield pd.DataFrame(
                    {"query_id": qid, "neighbor_id": cids, "cos": cs}
                )

    local = corpus.select(id_col, vec_col).mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", round_half_up(F.col("cos"), 4).alias("cos"))
    )


def srp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 12,
    num_tables: int = 4,
    seed: int = 0x5EED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k via signed-random-projection LSH.

    ``num_tables`` independent hash tables, each hashing a vector to the
    sign-bit pattern of ``num_planes`` fixed random hyperplanes (deterministic
    seed -> reproducible). Candidates = corpus vectors sharing a bucket with
    the query in ANY table; exact cosine re-ranks candidates. Collision
    probability per plane is 1 - theta/pi, so near-parallel vectors collide
    with high probability while the bucket join touches ~N/2^planes vectors
    per table — the classic cosine-LSH trade (recall tunable via
    tables x planes).
    """
    import random as _random

    rng = _random.Random(seed)
    planes = [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)]
        for _ in range(num_tables)
    ]

    def bucket_cols(df: DataFrame) -> DataFrame:
        from momyre_spark.functions.vectors import dot, to_double

        out = df
        for t, table_planes in enumerate(planes):
            sig = F.lit(0).cast("long")
            for p, plane in enumerate(table_planes):
                proj = dot(
                    to_double(F.col(vec_col)),
                    F.array(*[F.lit(float(x)) for x in plane]),
                )
                sig = sig + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(
                    F.lit(0).cast("long")
                )
            out = out.withColumn(f"__b{t}", sig)
        return out

    q = bucket_cols(queries).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        *[F.col(f"__b{t}").alias(f"__qb{t}") for t in range(num_tables)],
    )
    c = bucket_cols(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        *[F.col(f"__b{t}") for t in range(num_tables)],
    )
    any_bucket = None
    for t in range(num_tables):
        clause = F.col(f"__b{t}") == F.col(f"__qb{t}")
        any_bucket = clause if any_bucket is None else (any_bucket | clause)
    cand = (
        c.join(F.broadcast(q), any_bucket)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("__cv"), F.col("__qv")))
    )
    return _topk(cand, k)


def assign_ivf_cells(
    emb: DataFrame,
    num_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest 'centroid' cell.

    Deterministic stub training: the ``num_cells`` lowest-id vectors act as
    centroids (production: k-means|| via pyspark.ml). Assignment is a
    broadcast join + argmax over per-centroid cosine — no shuffle of the
    corpus."""
    from momyre_spark.functions.vectors import add_normalized, dot

    nemb = add_normalized(emb, vec_col, "__nv")
    cents = nemb.orderBy(id_col).limit(num_cells).select(
        F.col(id_col).alias("cent_id"), F.col("__nv").alias("cent_vec")
    )
    scored = nemb.crossJoin(F.broadcast(cents)).withColumn(
        "__cs", dot(F.col("__nv"), F.col("cent_vec"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__cs").desc(), F.col("cent_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, vec_col, F.col("cent_id").alias("cell"))
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: search only the query's IVF cell.

    At scale the corpus is written partitioned/bucketed by ``cell`` so a
    query's scan prunes to one partition (~N/C vectors)."""
    from momyre_spark.functions.vectors import add_normalized, dot

    cells = add_normalized(
        assign_ivf_cells(emb, num_cells, id_col, vec_col), vec_col, "__nv"
    )
    q = cells.join(
        queries.select(id_col), id_col, "left_semi"
    ).select(
        F.col(id_col).alias("query_id"),
        F.col("__nv").alias("__qv"),
        F.col("cell").alias("__qcell"),
    )
    c = cells.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__nv").alias("__cv"),
        F.col("cell").alias("__ccell"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("__ccell") == F.col("__qcell"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", dot(F.col("__cv"), F.col("__qv")))
    )
    return _topk(scored, k)
