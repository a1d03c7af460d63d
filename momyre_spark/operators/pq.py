"""Product quantization (PQ): compressed-domain ANN for corpora whose raw
vectors no longer fit the cluster.

IVF (operators/similarity.py) prunes WHICH vectors a query scans; PQ
shrinks WHAT each scanned vector costs: d float32 dims become m one-byte
codes (d=64 -> 64x compression at m=8), and search runs entirely in the
compressed domain via asymmetric distance computation (ADC) — the query
builds one (m x k) lookup table of exact sub-distances, and each candidate
costs m table lookups instead of d multiplies. The classical recipe
(Jegou et al., "Product Quantization for Nearest Neighbor Search", TPAMI
2011); FAISS's IVF-PQ pairs both prunings.

Spark shapes:

- **train**: driver-side Lloyd iterations on a deterministic hash-ordered
  sample (seeded, reproducible) — codebooks are (m, k, d/m), a few KB;
  centroid quality needs a distribution sketch, not the corpus.
- **encode**: `mapInPandas`, codebooks in the task closure; per Arrow
  batch one vectorized argmin per subspace. Map-only, fuses into a scan.
- **search**: per-partition ADC with numpy advanced indexing; each
  partition emits only its local top-k (the brute_force_topk_numpy
  reduction pattern) — the shuffle carries |partitions| * |q| * k rows.

PQ scores approximate true distances, so like every approximate op here
it is pinned by a recall-vs-exact test, not an equality oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hash_sample(df: DataFrame, n: int, id_col: str) -> DataFrame:
    h = F.md5(F.concat(F.lit("pq:"), F.col(id_col).cast("string")))
    return df.orderBy(h, id_col).limit(n)


def train_pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 10_000,
    iters: int = 10,
    seed: int = 7,
):
    """Train per-subspace codebooks: numpy Lloyd iterations over a
    hash-ordered sample (deterministic across runs/partitionings).
    Returns an (m, codes, d/m) float64 array."""
    import numpy as np

    rows = _hash_sample(emb.select(id_col, vec_col), sample, id_col).collect()
    x = np.array([r[1] for r in rows], dtype=np.float64)
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, codes, sub))
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        cent = xs[rng.choice(n, size=codes, replace=n < codes)].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(codes):
                pts = xs[assign == c]
                if len(pts):
                    cent[c] = pts.mean(axis=0)
        books[j] = cent
    return books


def pq_encode(
    emb: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Compress each vector to its m nearest-centroid codes:
    ``(id_col, pq_code: array<int>)``. Map-only."""
    import numpy as np

    books = np.asarray(codebooks)
    m, codes, sub = books.shape
    flat = books.reshape(m * codes, sub)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            out = np.empty((len(x), m), dtype=np.int32)
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                d2 = (
                    (xs**2).sum(axis=1, keepdims=True)
                    - 2 * xs @ books[j].T
                    + (books[j] ** 2).sum(axis=1)[None, :]
                )
                out[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "pq_code": list(out)}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        encode, schema=f"{id_col} long, pq_code array<integer>"
    )


def pq_topk(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine: int = 0,
    corpus: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k over PQ codes: per query one (m x codes) table of exact
    sub-distances to the codebook centroids, then every candidate costs m
    lookups. Each partition emits its local top-k; the global reduce sees
    |partitions| * |q| * k rows. Returns (query_id, neighbor_id, dist2) —
    squared L2, smaller is nearer.

    ``refine > 0`` (with ``corpus``) is the production configuration:
    take a ``refine * k`` ADC shortlist, join the shortlist's ORIGINAL
    vectors back (a |q| * refine * k row join — tiny), and re-rank by
    exact distance, so PQ lossiness only costs recall a neighbor must
    fall out of the shortlist to lose. The compressed scan still did all
    the heavy lifting: the raw vectors are touched for shortlist rows
    only."""
    import numpy as np

    MAX_QUERIES = 100_000
    qrows = queries.select(id_col, vec_col).limit(MAX_QUERIES + 1).collect()
    if len(qrows) > MAX_QUERIES:
        raise ValueError("pq_topk: query set must be broadcastable (100k cap)")
    books = np.asarray(codebooks)
    m, codes, sub = books.shape
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array([r[1] for r in qrows], dtype=np.float64)
    # distance tables: tables[qi, j, c] = ||q_sub - centroid||^2
    tables = np.empty((len(q_ids), m, codes))
    for j in range(m):
        qs = q_mat[:, j * sub : (j + 1) * sub]
        tables[:, j, :] = (
            (qs**2).sum(axis=1, keepdims=True)
            - 2 * qs @ books[j].T
            + (books[j] ** 2).sum(axis=1)[None, :]
        )

    shortlist = max(k, refine * k)

    def search(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        j_idx = np.arange(m)
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            cds = np.array(list(pdf["pq_code"]), dtype=np.int64)  # (n, m)
            for qi, qid in enumerate(q_ids):
                d2 = tables[qi][j_idx, cds].sum(axis=1)  # (n,)
                mask = ids != qid
                cids, cd = ids[mask], d2[mask]
                if len(cids) > shortlist:
                    part = np.argpartition(cd, shortlist)[:shortlist]
                    cids, cd = cids[part], cd[part]
                yield pd.DataFrame(
                    {"query_id": qid, "neighbor_id": cids, "dist2": cd}
                )

    local = encoded.mapInPandas(
        search, schema="query_id long, neighbor_id long, dist2 double"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy("dist2", "neighbor_id")
    adc = (
        local.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= shortlist)
        .drop("__r")
    )
    if not refine:
        return (
            adc.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= k)
            .drop("__r")
        )
    if corpus is None:
        raise ValueError("refine > 0 needs the corpus DataFrame for re-rank")
    nvec = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv")
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    exact = (
        adc.drop("dist2")
        .join(nvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .withColumn(
            "dist2",
            F.aggregate(
                F.zip_with(
                    F.col("__nv").cast("array<double>"),
                    F.col("__qv").cast("array<double>"),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .drop("__nv", "__qv")
    )
    return (
        exact.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )
