"""Feature hashing (operators/features.py): known buckets/signs vs the
same md5 arithmetic computed in Python, sparsity contracts, validation."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row

from momyre_spark.operators.features import feature_hash

_B = 64


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % _B


def _sign(tok: str) -> int:
    return 1 if hashlib.md5(tok.encode()).hexdigest()[15] <= "7" else -1


def test_feature_hash_known_weights(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="Alpha alpha beta"), Row(doc_id=2, text="beta")]
    )
    got = {(r["doc_id"], r["bucket"]): r["weight"]
           for r in feature_hash(df, n_buckets=_B).collect()}
    exp: dict[tuple[int, int], int] = {}
    for doc, toks in [(1, ["alpha", "alpha", "beta"]), (2, ["beta"])]:
        for t in toks:
            k = (doc, _bucket(t))
            exp[k] = exp.get(k, 0) + _sign(t)
    exp = {k: v for k, v in exp.items() if v != 0}
    assert got == exp


def test_feature_hash_empty_docs_and_case(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="   "), Row(doc_id=2, text=""),
         Row(doc_id=3, text="Tok TOK tok")]
    )
    rows = feature_hash(df, n_buckets=_B).collect()
    assert {r["doc_id"] for r in rows} == {3}  # empties emit nothing
    # lowercase folds all three occurrences into one signed count
    assert [abs(r["weight"]) for r in rows] == [3]
    raw = feature_hash(df, n_buckets=_B, lowercase=False).collect()
    assert len(raw) >= 2  # distinct cased forms hash apart (here: 3 does)


def test_feature_hash_validation_and_no_python_in_plan(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="x")])
    with pytest.raises(ValueError):
        feature_hash(df, n_buckets=1)
    plan = feature_hash(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
