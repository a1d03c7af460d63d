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
    return docs.select(
        F.col(id_col),
        T.token_count(t).cast("bigint").alias("n_tokens"),
        T.bpe_ish_count(t).cast("bigint").alias("n_bpe_tokens"),
        round_half_up(T.stopword_ratio(t, "en"), 4).alias("stop_ratio"),
        T.quality_score(t).alias("quality"),
        T.langid(t).alias("pred_lang"),
        T.fingerprint(t).alias("fp"),
        T.content_fingerprint(t).alias("content_fp"),
    )
