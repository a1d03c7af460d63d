"""Document-analysis operator: one pass, all metrics.

Composes the column expressions in functions/text.py into a single projection
— one scan of the corpus, no shuffle, fully codegen'd. At 100 TB this is a
map-only job whose cost is the parquet scan itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from momyre_spark.functions import text as T
from momyre_spark.functions.numeric import round_half_up


def analyze_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    t = F.col(text_col)
    from momyre_spark.operators.parallelism import ensure_parallelism

    docs = ensure_parallelism(docs)
    # materialize the token arrays once: every metric reads the bound
    # columns instead of re-running the regex tokenizer (Catalyst does not
    # collapse expensive multi-referenced expressions across projections)
    staged = docs.select(
        F.col(id_col),
        t.alias("__text"),
        T.tokens(t).alias("__toks"),
        T.tokens(F.lower(t)).alias("__ltoks"),
    )
    toks, text = F.col("__toks"), F.col("__text")
    return staged.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        T.bpe_ish_count(text).cast("bigint").alias("n_bpe_tokens"),
        round_half_up(T.stopword_ratio_from_tokens(toks, "en"), 4).alias("stop_ratio"),
        T.quality_score_from_tokens(text, toks).alias("quality"),
        T.langid_from_tokens(toks).alias("pred_lang"),
        F.md5(F.concat_ws(" ", F.col("__ltoks"))).alias("fp"),
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(F.col("__ltoks"))))
        ).alias("content_fp"),
    )
