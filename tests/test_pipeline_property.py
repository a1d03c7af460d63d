"""Property-based checks for the training-pipeline operators: chunking,
weighted sampling, and global shuffle obey their invariants on arbitrary
inputs (hypothesis drives sizes, windows, strides, weights)."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row


_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    n=st.integers(min_value=0, max_value=60),
    window=st.integers(min_value=1, max_value=12),
    stride=st.integers(min_value=1, max_value=12),
)
def test_chunking_invariants(spark, n, window, stride):
    from momyre_spark.operators.chunking import chunk_documents

    toks = [f"t{i}" for i in range(n)]
    df = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join(toks))] if n else [Row(doc_id=1, text="")]
    )
    rows = sorted(
        chunk_documents(df, window=window, stride=stride).collect(),
        key=lambda r: r["chunk_id"],
    )
    if n == 0:
        assert rows == []
        return
    # chunk count: starts at every stride below n
    assert len(rows) == (n - 1) // stride + 1
    # ids dense from 0; sizes correct; every chunk matches the slice
    for r in rows:
        start = r["chunk_id"] * stride
        want = toks[start : start + window]
        assert r["chunk_text"] == " ".join(want)
        assert r["n_chunk_tokens"] == len(want) > 0
    # every token is covered when stride <= window
    if stride <= window:
        covered = set()
        for r in rows:
            start = r["chunk_id"] * stride
            covered.update(range(start, min(start + window, n)))
        assert covered == set(range(n))


@settings(**_SETTINGS)
@given(
    scale=st.floats(min_value=0.01, max_value=100.0),
    k=st.integers(min_value=1, max_value=30),
)
@pytest.mark.slow
def test_weighted_sample_scale_invariant(spark, scale, k):
    """Multiplying every weight by a constant must not change the draw
    (the race keys all scale by 1/c together)."""
    from momyre_spark.operators.sampling import weighted_sample_k

    rows = [Row(doc_id=i, w=float(1 + i % 5)) for i in range(80)]
    df = spark.createDataFrame(rows)
    scaled = spark.createDataFrame(
        [Row(doc_id=r.doc_id, w=r.w * scale) for r in rows]
    )
    a = sorted(r["doc_id"] for r in weighted_sample_k(df, k, "w").collect())
    b = sorted(r["doc_id"] for r in weighted_sample_k(scaled, k, "w").collect())
    assert a == b and len(a) == k


@settings(**_SETTINGS)
@given(
    n=st.integers(min_value=1, max_value=300),
    buckets=st.sampled_from([1, 2, 16, 64, 1024]),
)
@pytest.mark.slow
def test_global_shuffle_always_dense_permutation(spark, n, buckets):
    from momyre_spark.operators.sampling import global_shuffle

    df = spark.createDataFrame([Row(doc_id=i * 7 + 3) for i in range(n)])
    pos = [
        r["position"] for r in global_shuffle(df, num_buckets=buckets).collect()
    ]
    assert sorted(pos) == list(range(n))


@settings(**_SETTINGS)
@given(seed=st.integers(min_value=0, max_value=10**6))
@pytest.mark.slow
def test_unigram_lm_counts_conserve_tokens(spark, seed):
    """Vocab counts must sum to the total token count, and per-doc
    n_tokens must equal the doc's own count."""
    import random

    from momyre_spark.operators.lm import score_documents, train_unigram_lm

    rng = random.Random(seed)
    vocab = ["a", "bb", "ccc", "dd", "e"]
    docs = [
        Row(
            doc_id=i,
            text=" ".join(rng.choices(vocab, k=rng.randint(1, 12))),
        )
        for i in range(rng.randint(1, 8))
    ]
    df = spark.createDataFrame(docs)
    total_tokens = sum(len(d.text.split()) for d in docs)
    lm_total = sum(r["count"] for r in train_unigram_lm(df).collect())
    assert lm_total == total_tokens
    scored = {r["doc_id"]: r["n_tokens"] for r in score_documents(df).collect()}
    assert scored == {d.doc_id: len(d.text.split()) for d in docs}
