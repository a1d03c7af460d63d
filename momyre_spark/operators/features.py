"""Feature hashing (the "hashing trick"): fixed-width sparse feature
vectors from unbounded token vocabularies, without a fitted dictionary.

Why in an LLM-data engine: lightweight quality / topicality / language
classifiers over a 100 TB corpus (fastText-style gating, DataComp-style
filtering) need a featurizer that is STATELESS — no vocabulary scan, no
broadcast dictionary, no OOV problem — so it can run as a pure map over
any shard independently. Signed feature hashing (Weinberger et al., 2009)
is the standard answer: bucket = h(token) mod B, sign = one more hash
bit, weight = signed count; collisions cancel in expectation.

Spark-first shape: tokenize -> explode -> ONE hash aggregation keyed on
(doc, bucket). Everything is codegen'd expressions (md5/conv arithmetic —
the repo's engine-neutral determinism recipe, so the DuckDB oracle
reproduces every bucket and weight bit-for-bit); no Python anywhere. At
100 TB this is the same cost class as a token count: one explode + one
map-side-combinable agg, output bounded by docs x distinct buckets.

The sparse (doc, bucket, weight) row form is deliberate — downstream
trainers (pyspark.ml, export to a trainer) assemble vectors per batch;
a dense array column of width B would multiply the shuffle by B/nnz.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from momyre_spark.functions.text import tokens


def hash_bucket(token: Column, n_buckets: int) -> Column:
    """Engine-neutral bucket id in [0, n_buckets): first 15 hex digits of
    md5 (< 2^60, so always positive) mod B. DuckDB mirror:
    ``('0x' || substr(md5(t), 1, 15))::BIGINT % B``."""
    return F.pmod(
        F.conv(F.substring(F.md5(token), 1, 15), 16, 10).cast("bigint"),
        F.lit(n_buckets),
    )


def hash_sign(token: Column) -> Column:
    """+1 / -1 from md5 hex digit 16 (< '8' -> +1): independent of the
    bucket bits. DuckDB mirror: ``CASE WHEN substr(md5(t), 16, 1) <= '7'
    THEN 1 ELSE -1 END``."""
    return F.when(
        F.substring(F.md5(token), 16, 1) <= F.lit("7"), F.lit(1)
    ).otherwise(F.lit(-1))


def feature_hash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    lowercase: bool = True,
) -> DataFrame:
    """Signed hashed bag-of-words: ``(id_col, bucket, weight)`` rows with
    ``weight = sum of signs`` over the doc's token occurrences in that
    bucket. Zero-weight buckets (exact sign cancellation) are DROPPED —
    the vector stays sparse and the zero carries no information the
    absent entry doesn't.

    Empty/whitespace-only docs emit no rows (no tokens — same contract
    as the token counters)."""
    if n_buckets < 2:
        raise ValueError("momyre: n_buckets must be >= 2")
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    tok = df.select(
        F.col(id_col), F.explode(tokens(t)).alias("__tok")
    )
    return (
        tok.select(
            id_col,
            hash_bucket(F.col("__tok"), n_buckets).alias("bucket"),
            hash_sign(F.col("__tok")).alias("__sign"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.sum("__sign").cast("bigint").alias("weight"))
        .filter(F.col("weight") != 0)
    )
