"""Model-based corpus quality scoring: train a logistic classifier on
document features, score the corpus as a map-only literal expression.

The heuristic gates (functions/text.quality_score, Gopher repetition
filters) are hand-weighted; production corpus pipelines replace them with a
TRAINED quality model (a fastText/linear classifier over cheap features,
scored over everything). The Spark-first decomposition:

- **Featurize (map-only, codegen).** Every feature is a JVM expression over
  the text column — token count, stopword ratio, alphabetic density, digit
  and symbol fractions, repetition, mean token length. No Python.
- **Train (pyspark.ml on the cluster).** ``LogisticRegression`` over the
  assembled feature vector — distributed L-BFGS; labels come from whatever
  signal is available (human labels, an LLM judge sample, or a heuristic
  to distill into a calibrated score).
- **Score (map-only, codegen).** The fitted model is ~10 floats. They are
  extracted to the driver and re-applied as a LITERAL expression
  (sigmoid(w.x + b)) — the 100 TB scoring pass is whole-stage-codegen'd
  arithmetic fused into the scan, not an MLlib transform over assembled
  vectors (which would build a per-row Vector object just to dot 10
  numbers).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUALITY_FEATURES = (
    "f_len_norm",
    "f_stopword_ratio",
    "f_alpha_ratio",
    "f_digit_frac",
    "f_symbol_frac",
    "f_dup_token_frac",
    "f_mean_token_len",
)


def featurize_documents(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, f_*) feature frame — one map-only projection, tokens
    materialized once."""
    from momyre_spark.functions import text as T

    toks = T.tokens(F.col(text_col))
    out = df.select(F.col(id_col), F.col(text_col), toks.alias("__toks"))
    n = F.size("__toks").cast("double")
    alpha = F.length(F.regexp_replace(text_col, r"[^a-zA-Z]", "")).cast("double")
    nonspace = F.length(F.regexp_replace(text_col, r"\s", "")).cast("double")
    chars = F.length(text_col).cast("double")
    return out.select(
        id_col,
        (F.least(n, F.lit(200.0)) / 200.0).alias("f_len_norm"),
        T.stopword_ratio_from_tokens(F.col("__toks"), "en").alias(
            "f_stopword_ratio"
        ),
        F.when(nonspace == 0, 0.0).otherwise(alpha / nonspace).alias(
            "f_alpha_ratio"
        ),
        T.digit_fraction(F.col(text_col)).alias("f_digit_frac"),
        T.symbol_fraction(F.col(text_col)).alias("f_symbol_frac"),
        T.dup_token_fraction_from_tokens(F.col("__toks")).alias(
            "f_dup_token_frac"
        ),
        F.when(n == 0, 0.0).otherwise(
            F.aggregate(
                "__toks", F.lit(0.0), lambda acc, t: acc + F.length(t)
            )
            / n
        ).alias("f_mean_token_len"),
    )


def train_quality_model(
    features_df: DataFrame,
    label_col: str = "label",
    feature_cols: tuple[str, ...] = QUALITY_FEATURES,
    reg_param: float = 0.01,
    max_iter: int = 50,
) -> dict[str, float]:
    """Fit a logistic model; return ``{feature: weight, "__intercept": b}``
    — a plain dict of floats, the whole model."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    assembled = VectorAssembler(
        inputCols=list(feature_cols), outputCol="__fv"
    ).transform(features_df)
    lr = LogisticRegression(
        featuresCol="__fv",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
        standardization=True,
    )
    fitted = lr.fit(assembled)
    model = {c: float(w) for c, w in zip(feature_cols, fitted.coefficients)}
    model["__intercept"] = float(fitted.intercept)
    return model


def quality_logit(model: dict[str, float]) -> Column:
    """The fitted model as ONE literal codegen expression over the feature
    columns (no vector assembly, no MLlib at scoring time)."""
    z = F.lit(model["__intercept"])
    for c, w in model.items():
        if c != "__intercept":
            z = z + F.lit(w) * F.col(c)
    return z


def score_documents_model(
    df: DataFrame,
    model: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, quality_prob) for every document: featurize + literal sigmoid,
    all fused into the scan."""
    feats = featurize_documents(df, text_col=text_col, id_col=id_col)
    z = quality_logit(model)
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feats.select(id_col, prob.alias("quality_prob"))
