"""Trained quality classifier: feature extraction, model fit/score parity,
separation on planted labels, map-only scoring plan."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from momyre_spark.operators.classifier import (
    QUALITY_FEATURES,
    featurize_documents,
    quality_logit,
    score_documents_model,
    train_quality_model,
)

CLEAN = [
    "the quick brown fox jumps over the lazy dog and runs through the field",
    "a clear and well written paragraph with the usual structure of prose",
    "she said that the meeting would be held in the morning and not at night",
    "the report was finished on time and the results were good for the team",
]
NOISY = [
    "$$$ CL1CK H3RE !!! ### 77777 @@@ %%% &&& *** 999 $$$ !!!",
    "xxxx 00000 ++++ ==== |||| ~~~~ ^^^^ 4444 #### $$$$ @@@@",
    ">>>> 1234567890 <<<< {{{{ }}}} //// \\\\ :::: ;;;; 8888",
    "%%% %%% %%% %%% 000 000 000 111 111 111 ### ### ###",
]


def _labeled(spark):
    rows = []
    for i, t in enumerate(CLEAN * 8):
        rows.append(Row(doc_id=i, text=t, label=1.0))
    for i, t in enumerate(NOISY * 8):
        rows.append(Row(doc_id=1000 + i, text=t, label=0.0))
    return spark.createDataFrame(rows)


def test_featurize_values(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="the the cat"),
                                Row(doc_id=2, text="")])
    rows = {r["doc_id"]: r for r in featurize_documents(df).collect()}
    r = rows[1]
    assert r["f_stopword_ratio"] > 0  # 'the' hits
    assert abs(r["f_dup_token_frac"] - 1 / 3) < 1e-9  # one dup of three
    assert abs(r["f_mean_token_len"] - 9 / 3) < 1e-9
    assert rows[2]["f_len_norm"] == 0.0
    assert rows[2]["f_mean_token_len"] == 0.0


def test_model_separates_planted_labels(spark):
    docs = _labeled(spark)
    feats = featurize_documents(docs).join(
        docs.select("doc_id", "label"), "doc_id"
    )
    model = train_quality_model(feats)
    scored = score_documents_model(docs, model)
    got = {r["doc_id"]: r["quality_prob"] for r in scored.collect()}
    clean_scores = [v for k, v in got.items() if k < 1000]
    noisy_scores = [v for k, v in got.items() if k >= 1000]
    # perfect separation on this planted corpus
    assert min(clean_scores) > max(noisy_scores)
    assert min(clean_scores) > 0.7 and max(noisy_scores) < 0.3


def test_score_matches_manual_sigmoid(spark):
    docs = _labeled(spark)
    feats = featurize_documents(docs).join(
        docs.select("doc_id", "label"), "doc_id"
    )
    model = train_quality_model(feats)
    frow = feats.filter(F.col("doc_id") == 0).collect()[0]
    z = model["__intercept"] + sum(
        model[c] * frow[c] for c in QUALITY_FEATURES
    )
    want = 1.0 / (1.0 + math.exp(-z))
    got = {
        r["doc_id"]: r["quality_prob"]
        for r in score_documents_model(docs, model).collect()
    }[0]
    assert abs(got - want) < 1e-9


def test_scoring_plan_is_map_only(spark):
    docs = _labeled(spark)
    model = {c: 0.5 for c in QUALITY_FEATURES}
    model["__intercept"] = -1.0
    plan = (
        score_documents_model(docs, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    assert "BatchEvalPython" not in plan


def test_logit_is_linear_in_features(spark):
    model = {c: 0.0 for c in QUALITY_FEATURES}
    model["f_len_norm"] = 2.0
    model["__intercept"] = 1.0
    df = spark.createDataFrame(
        [Row(**{c: 0.0 for c in QUALITY_FEATURES})]
    ).withColumn("f_len_norm", F.lit(0.25))
    got = df.select(quality_logit(model).alias("z")).collect()[0]["z"]
    assert abs(got - 1.5) < 1e-12
