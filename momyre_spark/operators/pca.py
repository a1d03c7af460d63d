"""Distributed PCA / whitening for embedding columns.

Random projection (functions/embeddings.project) reduces dimension blind;
PCA reduces it along the directions the corpus actually varies — the
transform behind embedding compression, decorrelation before product
quantization, and whitening before cosine retrieval (hubness reduction).

The split that makes it scale:

1. **Moments on the cluster** — mean vector and the d x d covariance are
   ONE aggregation: per row, the outer product upper triangle
   (d*(d+1)/2 sums) via a numpy `mapInPandas` partial per batch, then a
   final sum of the tiny partial frames. The corpus is read once; nothing
   about the data's size reaches the driver — only O(d^2) floats.
2. **Eigen-decomposition on the driver** — `numpy.linalg.eigh` on the d x d
   symmetric matrix (d <= a few thousand: microseconds, exact).
3. **Projection on the cluster** — the k chosen components are embedded as
   literals into `functions/embeddings.project` (codegen fold, map-only),
   identical in shape to the JL projection path.

Sign convention: eigh's eigenvector signs are arbitrary, so each component
is flipped to make its largest-|coefficient| entry positive — the transform
is then a pure function of the data, stable across numpy versions/BLAS.

No SQL oracle (eigen-decomposition is not SQL); pinned by property tests:
orthonormal components, descending explained variance, projection equals
numpy's on the same data, reconstruction error <= JL's at equal k.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


_MOMENT_FANIN = 32


def _moments(emb: DataFrame, vec_col: str, dim: int) -> tuple[np.ndarray, np.ndarray, int]:
    """(sum_vec, sum_outer, n) over the corpus — one scan, O(d^2) result.

    Tree-reduced: the per-partition partials (one O(d^2) row EACH) are
    folded executor-side through a ~``_MOMENT_FANIN``-way intermediate
    level and a final single-task fold, so the driver receives exactly ONE
    row whatever the input parallelism. Without the tree, 10k partitions
    at d=1024 would ship ~80 GB of partial moments to the driver; with it
    the driver-facing traffic is ~8 MB at any scale (the intermediate
    shuffle moves the same partials executor-to-executor, where they
    belong)."""
    schema = StructType.fromDDL("n BIGINT, s ARRAY<DOUBLE>, o ARRAY<DOUBLE>")

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim)
        o = np.zeros((dim, dim))
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(list(pdf[vec_col]), dtype=np.float64)
            n += m.shape[0]
            s += m.sum(axis=0)
            o += m.T @ m
        yield pd.DataFrame({"n": [n], "s": [s.tolist()], "o": [o.ravel().tolist()]})

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim)
        o = np.zeros(dim * dim)
        for pdf in batches:
            for _, r in pdf.iterrows():
                n += int(r["n"])
                s += np.asarray(r["s"], dtype=np.float64)
                o += np.asarray(r["o"], dtype=np.float64)
        yield pd.DataFrame({"n": [n], "s": [s.tolist()], "o": [o.tolist()]})

    parts = emb.select(vec_col).mapInPandas(partial, schema=schema)
    mid = parts.repartition(_MOMENT_FANIN).mapInPandas(fold, schema=schema)
    rows = mid.repartition(1).mapInPandas(fold, schema=schema).collect()
    assert len(rows) == 1  # the whole point: O(1) driver-facing rows
    n = int(rows[0]["n"])
    if n == 0:
        raise ValueError("momyre: PCA needs a non-empty corpus")
    s = np.asarray(rows[0]["s"], dtype=np.float64)
    o = np.asarray(rows[0]["o"], dtype=np.float64).reshape(dim, dim)
    return s, o, n


def train_pca(
    emb: DataFrame,
    k: int,
    vec_col: str = "embedding",
    whiten: bool = False,
    eps: float = 1e-9,
) -> dict:
    """Fit a k-component PCA (optionally whitened) on the corpus.

    Returns ``{"mean": [d], "components": [k][d], "explained_variance": [k]}``
    — plain floats, serializable next to a snapshot manifest. ``components``
    rows are unit eigenvectors (scaled by 1/sqrt(var+eps) when whitening),
    sign-fixed so the transform is deterministic.
    """
    first = emb.select(vec_col).first()
    if first is None:
        raise ValueError("momyre: PCA needs a non-empty corpus")
    dim = len(first[0])
    if not 0 < k <= dim:
        raise ValueError(f"momyre: k={k} out of range for dim={dim}")
    s, o, n = _moments(emb, vec_col, dim)
    mean = s / n
    cov = o / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    vals = np.maximum(vals[order], 0.0)
    comps = vecs[:, order].T  # k x d
    # deterministic sign: largest-|coeff| entry positive
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    if whiten:
        comps = comps / np.sqrt(vals + eps)[:, None]
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained_variance": vals.tolist(),
    }


def apply_pca(
    emb: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project ``vec_col`` onto the fitted components: (x - mean) @ C^T.

    Map-only: mean subtraction and the per-component dot folds are plain
    column expressions with the model embedded as literals (same codegen
    shape as functions/embeddings.project) — no UDF, fuses into the scan.
    """
    from momyre_spark.functions.embeddings import project

    mean = model["mean"]
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.array(*[F.lit(float(m)) for m in mean]),
        lambda x, m: x - m,
    )
    return emb.withColumn(out_col, project(centered, model["components"]))
