"""Text-analysis queries over ``documents`` (operators/textops.py,
functions/text.py). All metrics avoid transcendental functions so both
engines produce bit-identical doubles (see functions/text.py docstring).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from momyre_spark.functions.numeric import round_half_up
from momyre_spark.functions.text import STOPWORDS
from momyre_spark.plans import query
from momyre_spark.sources.parquet import load_table

_TOK = "string_split_regex(trim(text), '\\s+')"
_LTOK = "string_split_regex(trim(lower(text)), '\\s+')"


def _hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({_TOK}, t -> list_contains([{words}], t)))"


# --------------------------------------------------------------------------
# Token counting: whitespace + BPE-ish regex pre-tokenizer
# --------------------------------------------------------------------------
@query(
    "text_token_counts",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOK}) END AS n_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe_tokens
    FROM documents ORDER BY doc_id
    """,
)
def text_token_counts(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions import text as T

    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        T.bpe_ish_count(F.col("text")).cast("bigint").alias("n_bpe_tokens"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Quality scoring: stopword / alphabetic-density / length-saturation mix
# --------------------------------------------------------------------------
@query(
    "text_quality",
    oracle=f"""
    WITH m AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOK}) END AS n,
               {_hits("en")} AS hits,
               length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha,
               length(regexp_replace(text, '\\s', '', 'g')) AS total
        FROM documents
    )
    SELECT doc_id,
           floor((CASE WHEN n = 0 THEN 0.0 ELSE hits / CAST(n AS DOUBLE) END) * 10000 + 0.5) / 10000.0 AS stop_ratio,
           floor((0.3 * (CASE WHEN n = 0 THEN 0.0 ELSE hits / CAST(n AS DOUBLE) END)
                 + 0.5 * (CASE WHEN total = 0 THEN 0.0 ELSE alpha / CAST(total AS DOUBLE) END)
                 + 0.2 * (least(CAST(n AS DOUBLE), 200.0) / 200.0)) * 10000 + 0.5) / 10000.0 AS quality
    FROM m ORDER BY doc_id
    """,
)
def text_quality(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions import text as T

    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        round_half_up(T.stopword_ratio(F.col("text"), "en"), 4).alias("stop_ratio"),
        T.quality_score(F.col("text")).alias("quality"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Language-ID heuristic: stopword-hit argmax (profile order breaks ties)
# --------------------------------------------------------------------------
_LANGS = list(STOPWORDS)
_HITS_SQL = ",\n               ".join(f"{_hits(lang)} AS h_{lang}" for lang in _LANGS)
_BEST_SQL = "greatest(" + ", ".join(f"h_{lang}" for lang in _LANGS) + ")"
_CASE_SQL = "\n           ".join(
    f"WHEN h_{lang} = best AND best > 0 THEN '{lang}'" for lang in _LANGS
)


@query(
    "text_langid",
    oracle=f"""
    WITH m AS (
        SELECT doc_id, lang,
               {_HITS_SQL}
        FROM documents
    ),
    b AS (SELECT *, {_BEST_SQL} AS best FROM m)
    SELECT doc_id, lang,
           CASE {_CASE_SQL} ELSE 'und' END AS pred_lang
    FROM b ORDER BY doc_id
    """,
)
def text_langid(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions import text as T

    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id", "lang", T.langid(F.col("text")).alias("pred_lang")
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Document fingerprints: normalized-content md5 + order-insensitive
# bag-of-words md5
# --------------------------------------------------------------------------
@query(
    "text_fingerprints",
    oracle=f"""
    SELECT doc_id,
           md5(array_to_string({_LTOK}, ' ')) AS fp,
           md5(array_to_string(list_sort(list_distinct({_LTOK})), ' ')) AS content_fp
    FROM documents ORDER BY doc_id
    """,
)
def text_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions import text as T

    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        T.fingerprint(F.col("text")).alias("fp"),
        T.content_fingerprint(F.col("text")).alias("content_fp"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Full analysis operator (one-pass projection over every metric)
# --------------------------------------------------------------------------
@query(
    "text_analyze_all",
    oracle=f"""
    WITH m AS (
        SELECT doc_id, text,
               CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOK}) END AS n,
               {_hits("en")} AS hits,
               length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha,
               length(regexp_replace(text, '\\s', '', 'g')) AS total
        FROM documents
    )
    SELECT doc_id,
           n AS n_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe_tokens,
           floor((CASE WHEN n = 0 THEN 0.0 ELSE hits / CAST(n AS DOUBLE) END) * 10000 + 0.5) / 10000.0 AS stop_ratio,
           floor((0.3 * (CASE WHEN n = 0 THEN 0.0 ELSE hits / CAST(n AS DOUBLE) END)
                 + 0.5 * (CASE WHEN total = 0 THEN 0.0 ELSE alpha / CAST(total AS DOUBLE) END)
                 + 0.2 * (least(CAST(n AS DOUBLE), 200.0) / 200.0)) * 10000 + 0.5) / 10000.0 AS quality,
           md5(array_to_string({_LTOK}, ' ')) AS fp
    FROM m ORDER BY doc_id
    """,
)
def text_analyze_all(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.textops import analyze_documents

    docs = load_table(spark, sf, "documents")
    return analyze_documents(docs).select(
        "doc_id", "n_tokens", "n_bpe_tokens", "stop_ratio", "quality", "fp"
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Vectorized pandas-UDF surface: the same token count computed by an
# Arrow-batched scalar pandas UDF — one logical op, Python-vectorized
# physical path, same oracle contract.
# --------------------------------------------------------------------------
@query(
    "text_token_counts_pandas_udf",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOK}) END AS n_tokens
    FROM documents ORDER BY doc_id
    """,
)
def text_token_counts_pandas_udf(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def n_tokens(texts: pd.Series) -> pd.Series:
        stripped = texts.str.strip()
        return (
            stripped.str.split(r"\s+").map(len).where(stripped != "", 0).astype("int64")
        )

    docs = load_table(spark, sf, "documents")
    return docs.select("doc_id", n_tokens(F.col("text")).alias("n_tokens")).orderBy(
        "doc_id"
    )


# --------------------------------------------------------------------------
# Corpus-level token statistics: explode/unnest + two-level aggregation.
# Integer-only outputs — no float risk.
# --------------------------------------------------------------------------
@query(
    "text_vocab_stats",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_LTOK}) AS t FROM documents)
    SELECT count(DISTINCT t) AS vocab,
           count(*) AS total_tokens,
           count(DISTINCT doc_id) AS docs
    FROM tok
    """,
)
def text_vocab_stats(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions.text import tokens

    docs = load_table(spark, sf, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("t"))
    return tok.agg(
        F.countDistinct("t").alias("vocab"),
        F.count(F.lit(1)).alias("total_tokens"),
        F.countDistinct("doc_id").alias("docs"),
    )


# --------------------------------------------------------------------------
# Term frequency / document frequency (the integer core of TF-IDF) + top
# terms per document with deterministic tie-breaks.
# --------------------------------------------------------------------------
@query(
    "text_term_stats",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_LTOK}) AS t FROM documents)
    SELECT t AS term,
           count(DISTINCT doc_id) AS df,
           count(*) AS tf_total
    FROM tok GROUP BY t ORDER BY term
    """,
)
def text_term_stats(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions.text import tokens

    docs = load_table(spark, sf, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("t"))
    return (
        tok.groupBy(F.col("t").alias("term"))
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("tf_total"),
        )
        .orderBy("term")
    )


@query(
    "text_top_terms_per_doc",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_LTOK}) AS t FROM documents),
    tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2)
    SELECT doc_id, t AS term, tf FROM (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY tf DESC, t) AS rn
        FROM tf) x
    WHERE rn <= 3 ORDER BY doc_id, tf DESC, term
    """,
)
def text_top_terms_per_doc(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    from momyre_spark.functions.text import tokens

    docs = load_table(spark, sf, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tf").desc(), F.col("t"))
    return (
        tf.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", F.col("t").alias("term"), "tf")
        .orderBy("doc_id", F.col("tf").desc(), "term")
    )
