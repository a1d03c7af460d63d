"""Distributed PCA / whitening (operators/pca.py).

Eigen-decomposition is not SQL, so no DuckDB oracle; the contract is
pinned here: components orthonormal, variance descending, projection
equals numpy's sklearn-style transform on the same data, and the
distributed moments equal the single-machine ones.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row

from momyre_spark.operators.pca import apply_pca, train_pca


def _frame(spark, n=400, d=16, seed=3):
    rng = np.random.default_rng(seed)
    # anisotropic cloud: variance concentrated in a few directions
    basis = rng.standard_normal((d, d))
    scales = np.array([10.0, 5.0, 2.0] + [0.3] * (d - 3))
    data = rng.standard_normal((n, d)) * scales @ basis / np.sqrt(d)
    data = data + rng.standard_normal(d)  # nonzero mean
    return (
        spark.createDataFrame(
            [Row(vec_id=i, embedding=[float(x) for x in row]) for i, row in enumerate(data)]
        ),
        data,
    )


def test_components_orthonormal_variance_descending(spark):
    df, _ = _frame(spark)
    m = train_pca(df, k=5)
    C = np.array(m["components"])
    assert np.allclose(C @ C.T, np.eye(5), atol=1e-8)
    ev = m["explained_variance"]
    assert all(ev[i] >= ev[i + 1] for i in range(len(ev) - 1))
    assert ev[0] > 10 * ev[4]  # anisotropy recovered


def test_matches_numpy_reference(spark):
    df, data = _frame(spark, n=300, d=8)
    m = train_pca(df, k=3)
    # reference: eigh of the same covariance
    mean = data.mean(axis=0)
    cov = np.cov(data.T, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:3]
    ref = vecs[:, order].T
    for i in range(3):
        j = int(np.argmax(np.abs(ref[i])))
        if ref[i, j] < 0:
            ref[i] = -ref[i]
    assert np.allclose(np.array(m["mean"]), mean, atol=1e-9)
    assert np.allclose(np.array(m["components"]), ref, atol=1e-7)
    # projection matches (x - mean) @ C^T
    out = apply_pca(df, m).orderBy("vec_id").collect()
    got = np.array([r["pca"] for r in out])
    want = (data - mean) @ ref.T
    assert np.allclose(got, want, atol=1e-7)


def test_partitioning_invariant(spark):
    df, _ = _frame(spark, n=200, d=8)
    a = train_pca(df.repartition(1), k=2)
    b = train_pca(df.repartition(11), k=2)
    assert np.allclose(a["components"], b["components"], atol=1e-9)
    assert np.allclose(a["mean"], b["mean"], atol=1e-12)


def test_whiten_unit_variance(spark):
    df, data = _frame(spark)
    m = train_pca(df, k=3, whiten=True)
    out = np.array([r["pca"] for r in apply_pca(df, m).collect()])
    assert np.allclose(out.var(axis=0), 1.0, atol=1e-3)


def test_pca_beats_random_projection_reconstruction(spark):
    """At equal k, PCA reconstruction error must undercut the blind JL
    projection's — the reason to pay for training."""
    from momyre_spark.functions.embeddings import projection_matrix

    df, data = _frame(spark, n=300, d=16)
    k = 3
    m = train_pca(df, k=k)
    C = np.array(m["components"])
    mean = np.array(m["mean"])
    pca_err = np.linalg.norm(data - ((data - mean) @ C.T @ C + mean))
    R = np.array(projection_matrix(16, k))  # k x d, rows not orthonormal
    Q, _ = np.linalg.qr(R.T)  # best-case orthonormalized JL
    jl_err = np.linalg.norm(data - (data @ Q @ Q.T))
    assert pca_err < jl_err


def test_plan_is_map_only_after_training(spark):
    df, _ = _frame(spark, n=100, d=8)
    m = train_pca(df, k=2)
    plan = apply_pca(df, m)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_moments_tree_reduce_driver_receives_one_row(spark):
    """VERDICT r05: _moments must not ship one O(d^2) partial row per
    partition to the driver (10k partitions x d=1024 ~ 80 GB). The tree
    fold collapses the partials executor-side; the driver-facing frame is
    exactly ONE row at any input parallelism, and the folded moments match
    a flat single-pass reference."""
    from momyre_spark.operators.pca import _moments

    df, data = _frame(spark, n=300, d=8)
    many = df.repartition(24)  # force many partials
    s, o, n = _moments(many, "embedding", 8)
    assert n == 300
    assert np.allclose(s, data.sum(axis=0), atol=1e-9)
    assert np.allclose(o, data.T @ data, atol=1e-8)
    # and train_pca over 24 partitions equals train_pca over 1
    m_many = train_pca(many, k=3)
    m_one = train_pca(df.coalesce(1), k=3)
    assert np.allclose(m_many["components"], m_one["components"], atol=1e-8)
