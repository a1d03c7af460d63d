"""Text-analysis queries over ``documents`` (operators/textops.py,
functions/text.py). All metrics avoid transcendental functions so both
engines produce bit-identical doubles (see functions/text.py docstring).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from momyre_spark.functions.numeric import round4_sql, round_half_up
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


# --------------------------------------------------------------------------
# Gopher-style repetition / quality-filter metrics (pure map, no shuffle):
# duplicate-token fraction, digit density, symbol density, and a keep flag.
# --------------------------------------------------------------------------
@query(
    "text_repetition",
    oracle=f"""
    WITH m AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOK}) END AS n,
               CASE WHEN trim(text) = '' THEN 0 ELSE len(list_distinct({_TOK})) END AS nd,
               length(regexp_replace(text, '[^0-9]', '', 'g')) AS digits,
               length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS sym,
               length(regexp_replace(text, '\\s', '', 'g')) AS total
        FROM documents
    )
    SELECT doc_id, n AS n_tokens,
           floor((CASE WHEN n = 0 THEN 0.0 ELSE 1.0 - nd / CAST(n AS DOUBLE) END) * 10000 + 0.5) / 10000.0 AS dup_token_frac,
           floor((CASE WHEN total = 0 THEN 0.0 ELSE digits / CAST(total AS DOUBLE) END) * 10000 + 0.5) / 10000.0 AS digit_frac,
           floor((CASE WHEN total = 0 THEN 0.0 ELSE sym / CAST(total AS DOUBLE) END) * 10000 + 0.5) / 10000.0 AS symbol_frac,
           (n >= 5 AND (CASE WHEN n = 0 THEN 0.0 ELSE 1.0 - nd / CAST(n AS DOUBLE) END) <= 0.9) AS keep
    FROM m ORDER BY doc_id
    """,
)
def text_repetition(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions import text as T

    docs = load_table(spark, sf, "documents")
    toks = T.tokens(F.col("text"))
    dup = T.dup_token_fraction_from_tokens(toks)
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        round_half_up(dup, 4).alias("dup_token_frac"),
        round_half_up(T.digit_fraction(F.col("text")), 4).alias("digit_frac"),
        round_half_up(T.symbol_fraction(F.col("text")), 4).alias("symbol_frac"),
        ((F.size(toks) >= 5) & (dup <= 0.9)).alias("keep"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Top-bigram concentration (Gopher top-n-gram filter): the fraction of all
# word bigrams taken by the most frequent one. One explode + two hash aggs
# keyed by doc_id — map-side partial aggregation, no all-pairs anything.
# --------------------------------------------------------------------------
@query(
    "text_top_bigram_frac",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_LTOK} AS ts FROM documents),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS b
        FROM tok WHERE len(ts) >= 2
    ),
    c AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2)
    SELECT doc_id,
           CAST(max(c) AS BIGINT) AS top_bigram_count,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           floor(max(c) / CAST(sum(c) AS DOUBLE) * 10000 + 0.5) / 10000.0 AS top_bigram_frac
    FROM c GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_top_bigram_frac(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions.text import word_ngrams

    docs = load_table(spark, sf, "documents")
    bg = docs.select(
        "doc_id", F.explode(word_ngrams(F.lower(F.col("text")), 2)).alias("b")
    )
    cnt = bg.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
    return (
        cnt.groupBy("doc_id")
        .agg(
            F.max("c").alias("top_bigram_count"),
            F.sum("c").alias("n_bigrams"),
        )
        .select(
            "doc_id",
            "top_bigram_count",
            "n_bigrams",
            round_half_up(
                F.col("top_bigram_count") / F.col("n_bigrams").cast("double"), 4
            ).alias("top_bigram_frac"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# PII detection + redaction. The corpus is synthetic and PII-free, so each
# row is augmented with deterministic doc_id-derived PII — identically in
# both engines — making every regex actually fire. Patterns are an
# RE2/Java-portable subset (functions/text.py PII_*).
# --------------------------------------------------------------------------
@query(
    "text_pii_redact",
    oracle=f"""
    WITH a AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com from 10.0.0.' || CAST(doc_id % 250 AS VARCHAR)
                    || ' call +1555' || lpad(CAST(doc_id AS VARCHAR), 7, '0') AS aug
        FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(aug, '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{{2,}}')) AS n_emails,
           len(regexp_extract_all(aug, '\\b([0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b')) AS n_ips,
           len(regexp_extract_all(aug, '\\+[0-9]{{7,15}}')) AS n_phones,
           regexp_replace(
             regexp_replace(
               regexp_replace(aug, '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
               '\\b([0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b', '<IP>', 'g'),
             '\\+[0-9]{{7,15}}', '<PHONE>', 'g') AS redacted
    FROM a ORDER BY doc_id
    """,
)
def text_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions import text as T

    docs = load_table(spark, sf, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0.0."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(" call +1555"),
        F.lpad(F.col("doc_id").cast("string"), 7, "0"),
    )
    return (
        docs.select("doc_id", aug.alias("aug"))
        .select(
            "doc_id",
            T.pii_count(F.col("aug"), T.PII_EMAIL).cast("bigint").alias("n_emails"),
            T.pii_count(F.col("aug"), T.PII_IPV4).cast("bigint").alias("n_ips"),
            T.pii_count(F.col("aug"), T.PII_PHONE).cast("bigint").alias("n_phones"),
            T.redact_pii(F.col("aug")).alias("redacted"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# BM25 document ranking for a fixed query-term set. The IDF uses the
# rational Robertson surrogate (N - df + 0.5)/(df + 0.5) — no log — so
# every arithmetic step is +,*,/ over exact-integer inputs and both engines
# produce bit-identical doubles. Corpus stats (N, avgdl, per-term df) are a
# single-row aggregate broadcast to the scoring map — one tiny shuffle.
# --------------------------------------------------------------------------
_BM25_TERMS = ["spark", "table", "merge"]


def _bm25_tf_sql(term: str) -> str:
    return f"len(list_filter({_LTOK}, t -> t = '{term}'))"


@query(
    "text_bm25_topk",
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0 ELSE len({_LTOK}) END AS dl,
               {", ".join(f"{_bm25_tf_sql(t)} AS tf_{t}" for t in _BM25_TERMS)}
        FROM documents
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
               {", ".join(f"CAST(count(*) FILTER (WHERE tf_{t} > 0) AS BIGINT) AS df_{t}" for t in _BM25_TERMS)}
        FROM d
    )
    SELECT doc_id, dl,
           floor(({" + ".join(f"(n - df_{t} + 0.5) / (df_{t} + 0.5) * (tf_{t} * 2.2) / (tf_{t} + 1.2 * (0.25 + 0.75 * dl / avgdl))" for t in _BM25_TERMS)}) * 10000 + 0.5) / 10000.0 AS score
    FROM d, s
    ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def text_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions.text import tokens

    docs = load_table(spark, sf, "documents")
    toks = tokens(F.lower(F.col("text")))

    def _tf(term: str):
        # a two-arg lambda would receive (element, index) from F.filter —
        # bind the term via closure, not a default arg
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    d = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("dl"),
        *[_tf(t).cast("bigint").alias(f"tf_{t}") for t in _BM25_TERMS],
    )
    stats = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias("avgdl"),
        *[
            F.count_if(F.col(f"tf_{t}") > 0).cast("bigint").alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    scored = d.crossJoin(F.broadcast(stats))
    score = None
    for t in _BM25_TERMS:
        term_score = (
            (F.col("n") - F.col(f"df_{t}") + F.lit(0.5))
            / (F.col(f"df_{t}") + F.lit(0.5))
            * (F.col(f"tf_{t}") * F.lit(2.2))
            / (F.col(f"tf_{t}") + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.col("avgdl")))
        )
        score = term_score if score is None else score + term_score
    return (
        scored.select("doc_id", "dl", round_half_up(score, 4).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Benchmark decontamination: corpus docs sharing >= 3 distinct word
# trigrams with any doc of the "benchmark" set (fixture: the 20 lowest
# doc_ids). Broadcast bench shingles + map-side hash join — the corpus is
# never shuffled (operators/textops.ngram_contamination).
# --------------------------------------------------------------------------
_DECON_BENCH_MAX = 20  # doc_id < 20 plays the benchmark set
_DECON_MIN_SHARED = 3


@query(
    "text_decontaminate",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_LTOK} AS ts FROM documents),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(range(1, len(ts) - 1),
                      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS s
        FROM tok WHERE len(ts) >= 3
    ),
    b AS (SELECT doc_id AS bench_id, s FROM sh WHERE doc_id < {_DECON_BENCH_MAX}),
    c AS (SELECT doc_id, s FROM sh WHERE doc_id >= {_DECON_BENCH_MAX})
    SELECT c.doc_id, b.bench_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM c JOIN b USING (s)
    GROUP BY 1, 2 HAVING count(*) >= {_DECON_MIN_SHARED}
    ORDER BY doc_id, bench_id
    """,
)
def text_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.textops import ngram_contamination

    docs = load_table(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") < _DECON_BENCH_MAX)
    corpus = docs.filter(F.col("doc_id") >= _DECON_BENCH_MAX)
    return ngram_contamination(
        corpus, bench, n=3, min_shared=_DECON_MIN_SHARED
    ).orderBy("doc_id", "bench_id")


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


# --------------------------------------------------------------------------
# Corpus n-gram statistics (LM data work: contamination screens, boilerplate
# discovery, vocabulary curves all start from "what are the top n-grams").
# Frequency-preserving bigrams (functions/text.word_ngrams) exploded and
# hash-aggregated — partial aggregation map-side, then ONE shuffle on the
# gram; top-k by (tf, gram) is deterministic through ties.
# --------------------------------------------------------------------------
@query(
    "text_ngram_counts",
    oracle=f"""
    WITH g AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, len({_LTOK})),
                   i -> {_LTOK}[i] || ' ' || {_LTOK}[i + 1]
               )) AS gram
        FROM documents
    )
    SELECT gram, count(*) AS tf, count(DISTINCT doc_id) AS df
    FROM g GROUP BY gram
    ORDER BY tf DESC, gram LIMIT 50
    """,
)
def text_ngram_counts(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions.text import word_ngrams

    docs = load_table(spark, sf, "documents")
    grams = docs.select(
        "doc_id", F.explode(word_ngrams(F.lower(F.col("text")), 2)).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("tf"), "gram")
        .limit(50)
    )


# --------------------------------------------------------------------------
# Exact heavy hitters over the token stream (operators/heavyhitters):
# Misra-Gries candidates bound the shuffle to O(partitions x 1/support)
# regardless of vocabulary size; the exact recount makes the output equal
# the exhaustive groupBy (which is precisely what the oracle runs).
# --------------------------------------------------------------------------
_HH_SUPPORT = 0.008


@query(
    "text_heavy_terms",
    oracle=f"""
    WITH tok AS (SELECT unnest({_LTOK}) AS t FROM documents),
    tot AS (SELECT count(*) AS n FROM tok)
    SELECT t AS term, count(*) AS cnt
    FROM tok GROUP BY t
    HAVING count(*) >= ceil((SELECT n FROM tot) * {_HH_SUPPORT})
    ORDER BY cnt DESC, term
    """,
)
def text_heavy_terms(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions.text import tokens
    from momyre_spark.operators.heavyhitters import frequent_items

    docs = load_table(spark, sf, "documents")
    tok = docs.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("term")
    )
    return frequent_items(tok, "term", support=_HH_SUPPORT)


# --------------------------------------------------------------------------
# Corpus unigram LM scoring (operators/lm.py): CCNet-style cheap quality /
# outlier signal — per-doc mean token log-probability under the corpus's
# own unigram model. Each distinct token's logprob is rounded once to
# DECIMAL(18,6); per-doc sums are then exact decimal (order-independent,
# engine-identical), double again only at the final mean (round4). The
# oracle replays the identical two-aggregation + join pipeline.
# --------------------------------------------------------------------------
@query(
    "text_unigram_logprob",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOK}) AS token
        FROM documents WHERE trim(text) <> ''
    ),
    cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
    tot AS (SELECT sum(c) AS t FROM cnt),
    lm AS (
        SELECT token,
               CAST(floor((ln(c) - ln((SELECT t FROM tot))) * 1000000 + 0.5)
                    / 1000000.0 AS DECIMAL(18,6)) AS lp
        FROM cnt
    ),
    pt AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2)
    SELECT pt.doc_id,
           CAST(sum(pt.tf) AS BIGINT) AS n_tokens,
           CAST(0 AS BIGINT) AS n_oov,
           {round4_sql("CAST(sum(lm.lp * pt.tf) AS DOUBLE) / sum(pt.tf)")}
               AS mean_logprob
    FROM pt JOIN lm USING (token)
    GROUP BY 1 ORDER BY 1
    """,
)
def text_unigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.lm import score_documents

    docs = load_table(spark, sf, "documents")
    return score_documents(docs).orderBy("doc_id")


# --------------------------------------------------------------------------
# Per-source KL divergence vs the corpus blend (operators/lm.py): the
# corpus-mixing diagnostic. Same DECIMAL determinism contract as
# text_unigram_logprob — each (source, token) term fixed at DECIMAL(18,8),
# per-source sums exact, round4 at the end.
# --------------------------------------------------------------------------
@query(
    "text_source_divergence",
    oracle=f"""
    WITH tok AS (
        SELECT source AS src, unnest({_TOK}) AS token
        FROM documents WHERE trim(text) <> ''
    ),
    per_st AS (SELECT src, token, count(*) AS c_st FROM tok GROUP BY 1, 2),
    per_s AS (SELECT src, sum(c_st) AS t_s FROM per_st GROUP BY 1),
    per_t AS (SELECT token, sum(c_st) AS c_t FROM per_st GROUP BY 1),
    tot AS (SELECT sum(c_t) AS t_all FROM per_t),
    terms AS (
        SELECT per_st.src, per_st.c_st,
               CAST(floor(
                   ((per_st.c_st / per_s.t_s)
                    * (ln(per_st.c_st / per_s.t_s)
                       - ln(per_t.c_t / (SELECT t_all FROM tot))))
                   * 100000000 + 0.5) / 100000000.0 AS DECIMAL(18,8)) AS term
        FROM per_st
        JOIN per_s USING (src)
        JOIN per_t USING (token)
    )
    SELECT src AS source,
           CAST(sum(c_st) AS BIGINT) AS n_tokens,
           {round4_sql("CAST(sum(term) AS DOUBLE)")} AS kl_divergence
    FROM terms GROUP BY 1 ORDER BY 1
    """,
)
def text_source_divergence(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.lm import source_divergence

    docs = load_table(spark, sf, "documents")
    return source_divergence(docs).orderBy("source")


# --------------------------------------------------------------------------
# HTML stripping (functions/text.strip_html): crawl-page -> training text.
# The documents table has no markup, so the query wraps each doc in a
# deterministic HTML shell (tags + entities + a script block derived from
# the row) and strips it back — the oracle mirrors both the wrapping and
# the identical backref-free regex chain, so the output must equal the
# original text whitespace-collapsed.
# --------------------------------------------------------------------------
@query(
    "text_html_strip",
    oracle="""
    WITH wrapped AS (
        SELECT doc_id,
               '<html><head><script type="text/javascript">var x_' ||
               CAST(doc_id AS VARCHAR) ||
               ' = 1;</script></head><body><h1>T&amp;C ' ||
               CAST(doc_id AS VARCHAR) || '</h1><p>' || text ||
               '</p>&nbsp;<div class="f">&lt;end&gt;</div></body></html>'
                   AS page
        FROM documents
    )
    SELECT doc_id,
           trim(regexp_replace(
               regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(
                               regexp_replace(
                                   regexp_replace(
                                       regexp_replace(
                                           regexp_replace(
                                               regexp_replace(page,
                                                   '(?s)<script[^>]*>.*?</script\\s*>', ' ', 'g'),
                                               '(?s)<style[^>]*>.*?</style\\s*>', ' ', 'g'),
                                           '<[^>]+>', ' ', 'g'),
                                       '&nbsp;', ' ', 'g'),
                                   '&lt;', '<', 'g'),
                               '&gt;', '>', 'g'),
                           '&quot;', '"', 'g'),
                       '&#39;', CHR(39), 'g'),
                   '&amp;', '&', 'g'),
               '\\s+', ' ', 'g')) AS clean
    FROM wrapped
    ORDER BY doc_id
    """,
)
def text_html_strip(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions.text import strip_html

    docs = load_table(spark, sf, "documents")
    page = F.concat(
        F.lit('<html><head><script type="text/javascript">var x_'),
        F.col("doc_id").cast("string"),
        F.lit(" = 1;</script></head><body><h1>T&amp;C "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit('</p>&nbsp;<div class="f">&lt;end&gt;</div></body></html>'),
    )
    return docs.select("doc_id", strip_html(page).alias("clean")).orderBy(
        "doc_id"
    )


# --------------------------------------------------------------------------
# Learned-BPE token accounting (operators/bpe.py): word-type frequencies on
# the cluster (one shuffle, truncated), classical merge training on the
# driver, broadcast-merges apply as map-only Arrow batches. Rows-only: the
# iterative merge loop is not SQL-expressible; training order, unseen-word
# generalization, losslessness, partitioning determinism and the
# merge-prefix property are pinned in tests/test_bpe.py.
# --------------------------------------------------------------------------
@query("text_bpe_token_counts")
def text_bpe_token_counts(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.bpe import bpe_encode, train_bpe

    docs = load_table(spark, sf, "documents")
    # the fixture corpus has ~31 word types; a 60-merge budget leaves the
    # rarer/longer types split into subwords (a 200-merge budget would
    # fully merge every type and the counts would collapse to n_pretokens)
    merges = train_bpe(docs, num_merges=60, max_word_types=20_000)
    return (
        bpe_encode(docs, merges)
        .select("doc_id", "n_pretokens", "n_bpe_tokens")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Trained quality classifier (operators/classifier.py): distill the
# heuristic gate into a calibrated logistic model — weak labels from
# quality_score >= 0.574 (the fixture median), pyspark.ml L-BFGS fit, then
# a map-only literal-sigmoid scoring pass fused into the scan. Rows-only:
# L-BFGS is not SQL-expressible; separation/parity/plan properties are
# pinned in tests/test_classifier.py.
# --------------------------------------------------------------------------
@query("text_quality_model_scores")
def text_quality_model_scores(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions.text import quality_score
    from momyre_spark.operators.classifier import (
        featurize_documents,
        score_documents_model,
        train_quality_model,
    )

    docs = load_table(spark, sf, "documents")
    labeled = docs.select(
        "doc_id",
        (quality_score(F.col("text")) >= 0.574).cast("double").alias("label"),
    )
    feats = featurize_documents(docs).join(labeled, "doc_id")
    model = train_quality_model(feats)
    scored = score_documents_model(docs, model)
    return (
        scored.join(labeled, "doc_id")
        .select(
            "doc_id",
            F.col("label").cast("int").alias("weak_label"),
            round_half_up(F.col("quality_prob"), 3).alias("quality_prob"),
            (F.col("quality_prob") >= 0.5).cast("int").alias("model_label"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Gopher/MassiveText rule gates (operators/curate.gopher_gates): the
# published rule battery as one codegen scan — word-count band, mean word
# length, symbol ratio, bullet/ellipsis line fractions, alpha-word fraction,
# stop-word probe. The oracle mirrors every fold sequentially (list_reduce
# == F.aggregate over doubles), so each boolean matches bit-for-bit.
# Fixture note: docs are 10-99 words, so min_words=25 splits the corpus.
# --------------------------------------------------------------------------
_GOPHER_STOPS_SQL = "('the', 'be', 'to', 'of', 'and', 'that', 'have', 'with')"


@query(
    "text_gopher_gates",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_TOK} AS w,
               string_split(text, chr(10)) AS ls
        FROM documents
    ),
    m AS (
        SELECT doc_id,
            CAST(len(w) AS DOUBLE) AS n,
            CAST(len(ls) AS DOUBLE) AS nl,
            (0.0 + list_reduce(list_transform(w, x -> CAST(length(x) AS DOUBLE)),
                        (a, b) -> a + b)) / len(w) AS mean_wl,
            len(list_filter(w, x -> regexp_matches(x, '#|\\.\\.\\.|…')))
                / CAST(len(w) AS DOUBLE) AS symbol_ratio,
            len(list_filter(ls, l -> regexp_matches(l, '^\\s*[-*•]')))
                / CAST(len(ls) AS DOUBLE) AS bullet_frac,
            len(list_filter(ls, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$')))
                / CAST(len(ls) AS DOUBLE) AS ellipsis_frac,
            len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                / CAST(len(w) AS DOUBLE) AS alpha_frac,
            len(list_distinct(list_filter(list_transform(w, x -> lower(x)),
                                          x -> x IN {_GOPHER_STOPS_SQL})))
                AS stop_hits
        FROM d
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_words,
           (n >= 25 AND n <= 100000) AS gate_words,
           (mean_wl >= 3.0 AND mean_wl <= 10.0) AS gate_word_len,
           (symbol_ratio <= 0.1) AS gate_symbols,
           (bullet_frac <= 0.9) AS gate_bullets,
           (ellipsis_frac <= 0.3) AS gate_ellipsis,
           (alpha_frac >= 0.8) AS gate_alpha,
           (stop_hits >= 2) AS gate_stopwords,
           ((n >= 25 AND n <= 100000) AND (mean_wl >= 3.0 AND mean_wl <= 10.0)
            AND (symbol_ratio <= 0.1) AND (bullet_frac <= 0.9)
            AND (ellipsis_frac <= 0.3) AND (alpha_frac >= 0.8)
            AND (stop_hits >= 2)) AS passes
    FROM m ORDER BY doc_id
    """,
)
def text_gopher_gates(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.curate import gopher_gates

    docs = load_table(spark, sf, "documents")
    return gopher_gates(docs, min_words=25).orderBy("doc_id")


# --------------------------------------------------------------------------
# Interpolated bigram LM scoring (operators/lm.train_bigram_lm): transition-
# level quality signal. Constants: the oracle spells the unigram weight as
# (1.0 - 0.7) — the literal 0.3 is a DIFFERENT double and would flip round6
# at boundaries. Same DECIMAL determinism contract as the unigram query.
# --------------------------------------------------------------------------
@query(
    "text_bigram_logprob",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_TOK} AS w FROM documents WHERE trim(text) <> ''
    ),
    bg AS (
        SELECT doc_id, w[i] AS prev, w[i + 1] AS cur
        FROM d, UNNEST(range(1, len(w))) AS t(i)
        WHERE len(w) >= 2
    ),
    c_pc AS (SELECT prev, cur, count(*) AS c FROM bg GROUP BY 1, 2),
    c_p AS (SELECT prev, sum(c) AS cp FROM c_pc GROUP BY 1),
    c_c AS (SELECT cur, sum(c) AS cc FROM c_pc GROUP BY 1),
    tot AS (SELECT sum(c) AS t FROM c_pc),
    lm AS (
        SELECT prev, cur,
               CAST(floor(ln(0.7 * (c_pc.c / c_p.cp)
                             + (1.0 - 0.7) * (c_c.cc / (SELECT t FROM tot)))
                          * 1000000 + 0.5) / 1000000.0
                    AS DECIMAL(18,6)) AS lp
        FROM c_pc JOIN c_p USING (prev) JOIN c_c USING (cur)
    ),
    pt AS (SELECT doc_id, prev, cur, count(*) AS tf FROM bg GROUP BY 1, 2, 3)
    SELECT pt.doc_id,
           CAST(sum(pt.tf) AS BIGINT) AS n_bigrams,
           {round4_sql("CAST(sum(lm.lp * pt.tf) AS DOUBLE) / sum(pt.tf)")}
               AS mean_logprob
    FROM pt JOIN lm USING (prev, cur)
    GROUP BY 1 ORDER BY 1
    """,
)
def text_bigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.lm import score_documents_bigram

    docs = load_table(spark, sf, "documents")
    return score_documents_bigram(docs).orderBy("doc_id")


# --------------------------------------------------------------------------
# Cross-document boilerplate line removal (operators/textops.
# strip_boilerplate_lines): a line present in >= 20% of documents (cookie
# banners, nav, footers) strips from every document; rare lines survive.
# Multi-line docs are synthesized deterministically from the documents
# table (the fixture corpus is single-line): one universal banner, one
# unique body line, a 1-in-3 "subscribe" footer, and a 20-variant footer
# whose ~5% df sits BELOW the threshold and must be kept. concat_ws skips
# NULLs identically in both engines, so conditional lines need no branch
# duplication. Full value-hash oracle.
# --------------------------------------------------------------------------
_BOILER_SYNTH_SQL = """
        SELECT doc_id,
               concat_ws(chr(10),
                   'COOKIE NOTICE please accept our cookies',
                   'doc ' || CAST(doc_id AS VARCHAR) || ' body ' || source,
                   CASE WHEN doc_id % 3 = 0
                        THEN 'subscribe to the newsletter' END,
                   'footer variant ' || CAST(doc_id % 20 AS VARCHAR)
               ) AS text
        FROM documents
"""

_BOILER_ORACLE = f"""
    WITH d AS ({_BOILER_SYNTH_SQL}),
    s AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d),
    l AS (
        SELECT doc_id, CAST(p.p AS INT) - 1 AS pos, ls[CAST(p.p AS BIGINT)] AS line
        FROM s CROSS JOIN range(1, 9) p(p) WHERE p.p <= len(ls)
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS ndocs FROM d),
    dfl AS (
        SELECT line, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM l GROUP BY line
    ),
    boiler AS (
        SELECT line FROM dfl CROSS JOIN t WHERE df * 100 >= 20 * ndocs
    ),
    kept AS (
        SELECT l.* FROM l LEFT JOIN boiler b ON l.line = b.line
        WHERE b.line IS NULL
    ),
    re AS (
        SELECT doc_id,
               string_agg(line, chr(10) ORDER BY pos) AS clean_text,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM kept GROUP BY doc_id
    ),
    tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS total FROM l GROUP BY doc_id)
    SELECT tot.doc_id AS doc_id,
           coalesce(re.clean_text, '') AS clean_text,
           coalesce(re.n_lines, 0) AS n_lines,
           tot.total - coalesce(re.n_lines, 0) AS n_removed
    FROM tot LEFT JOIN re ON tot.doc_id = re.doc_id
    ORDER BY doc_id
"""


@query("text_boilerplate_strip", oracle=_BOILER_ORACLE)
def text_boilerplate_strip(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.textops import strip_boilerplate_lines

    docs = load_table(spark, sf, "documents").select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("COOKIE NOTICE please accept our cookies"),
            F.concat(
                F.lit("doc "), F.col("doc_id").cast("string"),
                F.lit(" body "), F.col("source"),
            ),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit("subscribe to the newsletter"),
            ),
            F.concat(
                F.lit("footer variant "),
                (F.col("doc_id") % 20).cast("string"),
            ),
        ).alias("text"),
    )
    return strip_boilerplate_lines(docs, min_df_pct=20).orderBy("doc_id")


# --------------------------------------------------------------------------
# PII detection / scrubbing (operators/pii.py): emails, SSN-shaped ids,
# phone numbers, IPv4 addresses — the release-safety pass every public
# training corpus runs. The fixture documents are PII-free (verified), so
# the queries run over a synthetic corpus GENERATED IDENTICALLY in both
# engines (id-mod planting over range(N)) — every count, every scrubbed
# byte, and the corpus rollup carry full value-hash oracles. The patterns
# use only the Java-regex/RE2 shared syntax, so the oracle is exact.
# --------------------------------------------------------------------------
_PII_N = 10_000

_DUCK_PII_CORPUS = f"""
    pii_docs AS (
        SELECT i AS doc_id,
               'doc ' || i || ' reach us at '
               || CASE WHEN i % 3 = 0
                       THEN 'user' || i || '@example.com ' ELSE '' END
               || CASE WHEN i % 5 = 0
                       THEN 'call 415-555-'
                            || lpad(CAST(i % 10000 AS VARCHAR), 4, '0')
                            || ' ' ELSE '' END
               || CASE WHEN i % 7 = 0
                       THEN 'ssn 219-09-'
                            || lpad(CAST(i % 10000 AS VARCHAR), 4, '0')
                            || ' ' ELSE '' END
               || CASE WHEN i % 11 = 0
                       THEN 'host 10.0.' || (i % 256) || '.'
                            || ((i * 7) % 256) || ' ' ELSE '' END
               || 'thanks' AS text
        FROM range({_PII_N}) t(i)
    )
"""

_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_SSN = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
_PII_PHONE = "\\(?\\d{3}\\)?[ .-]\\d{3}[ .-]\\d{4}\\b"
_PII_IP = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"


def _pii_corpus(spark: SparkSession) -> DataFrame:
    i = F.col("id")

    def part(mod: int, body) -> F.Column:
        return F.when(i % mod == 0, body).otherwise(F.lit(""))

    text = F.concat(
        F.lit("doc "), i.cast("string"), F.lit(" reach us at "),
        part(3, F.concat(F.lit("user"), i.cast("string"),
                         F.lit("@example.com "))),
        part(5, F.concat(F.lit("call 415-555-"),
                         F.lpad((i % 10000).cast("string"), 4, "0"),
                         F.lit(" "))),
        part(7, F.concat(F.lit("ssn 219-09-"),
                         F.lpad((i % 10000).cast("string"), 4, "0"),
                         F.lit(" "))),
        part(11, F.concat(F.lit("host 10.0."), (i % 256).cast("string"),
                          F.lit("."), ((i * 7) % 256).cast("string"),
                          F.lit(" "))),
        F.lit("thanks"),
    )
    return spark.range(_PII_N).select(
        i.alias("doc_id"), text.alias("text")
    )


@query(
    "text_pii_report",
    oracle=f"""
    WITH {_DUCK_PII_CORPUS}
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text, '{_PII_SSN}')) AS BIGINT) AS n_ssn,
           CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(text, '{_PII_IP}')) AS BIGINT) AS n_ip,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL}'))
                + len(regexp_extract_all(text, '{_PII_SSN}'))
                + len(regexp_extract_all(text, '{_PII_PHONE}'))
                + len(regexp_extract_all(text, '{_PII_IP}')) AS BIGINT) AS n_pii
    FROM pii_docs ORDER BY doc_id
    """,
)
def text_pii_report(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.pii import pii_report

    return pii_report(_pii_corpus(spark)).orderBy("doc_id")


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH {_DUCK_PII_CORPUS}
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                 '{_PII_SSN}', '<SSN>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g'),
             '{_PII_IP}', '<IP>', 'g') AS text
    FROM pii_docs ORDER BY doc_id
    """,
)
def text_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.pii import scrub_pii

    return scrub_pii(_pii_corpus(spark)).select("doc_id", "text").orderBy(
        "doc_id"
    )


@query(
    "text_pii_summary",
    oracle=f"""
    WITH {_DUCK_PII_CORPUS},
    c AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '{_PII_EMAIL}')) AS email,
               len(regexp_extract_all(text, '{_PII_SSN}')) AS ssn,
               len(regexp_extract_all(text, '{_PII_PHONE}')) AS phone,
               len(regexp_extract_all(text, '{_PII_IP}')) AS ip
        FROM pii_docs
    ),
    u AS (
        SELECT 'email' AS kind, email AS n FROM c
        UNION ALL SELECT 'ssn', ssn FROM c
        UNION ALL SELECT 'phone', phone FROM c
        UNION ALL SELECT 'ip', ip FROM c
    )
    SELECT kind, CAST(sum(n) AS BIGINT) AS n_matches,
           CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs
    FROM u GROUP BY kind ORDER BY kind
    """,
)
def text_pii_summary(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.pii import pii_summary

    return pii_summary(_pii_corpus(spark)).orderBy("kind")


# --------------------------------------------------------------------------
# Gopher repetition metrics (operators/curate.repetition_report): duplicate
# line/paragraph fractions (count + character) and top-n-gram character
# fractions — the repetition half of the MassiveText battery (gopher_gates
# covers the rule half). Fixture documents are single-line, so the query
# derives a line structure IDENTICALLY in both engines first: ' slow ' /
# ' fast ' become paragraph breaks, every remaining space a line break —
# each word a line, so within-doc duplicate structure is real and varied.
# Integer numerators + one rounded division per ratio = full value-hash
# oracle for all 9 columns.
# --------------------------------------------------------------------------
@query(
    "text_repetition_report",
    oracle=r"""
    WITH d AS (
        SELECT doc_id,
               regexp_replace(regexp_replace(text, ' (slow|fast) ',
                                             chr(10) || chr(10), 'g'),
                              ' ', chr(10), 'g') AS text
        FROM documents
    ),
    base AS (
        SELECT doc_id,
               list_filter(string_split(text, chr(10)),
                           x -> trim(x) <> '') AS lines,
               list_filter(string_split(text, chr(10) || chr(10)),
                           x -> trim(x) <> '') AS paras,
               CASE WHEN trim(text) = '' THEN []
                    ELSE string_split_regex(trim(text), '\s+') END AS toks
        FROM d
    ),
    lg AS (SELECT doc_id, u, count(*) AS c
           FROM base, UNNEST(lines) AS t(u) GROUP BY 1, 2),
    lstat AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
                     CAST(count(*) AS BIGINT) AS dn,
                     CAST(sum(c * len(u)) AS BIGINT) AS chars,
                     CAST(sum(CASE WHEN c > 1 THEN c * len(u) ELSE 0 END)
                          AS BIGINT) AS dchars
              FROM lg GROUP BY 1),
    pg AS (SELECT doc_id, u, count(*) AS c
           FROM base, UNNEST(paras) AS t(u) GROUP BY 1, 2),
    pstat AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
                     CAST(count(*) AS BIGINT) AS dn,
                     CAST(sum(c * len(u)) AS BIGINT) AS chars,
                     CAST(sum(CASE WHEN c > 1 THEN c * len(u) ELSE 0 END)
                          AS BIGINT) AS dchars
              FROM pg GROUP BY 1),
    tk AS (SELECT doc_id, CAST(len(array_to_string(toks, ' ')) AS BIGINT)
                      AS tok_chars, toks
           FROM base),
    gr AS (SELECT tk.doc_id, tk.tok_chars, nn.n AS n,
                  array_to_string(list_slice(tk.toks, j.j, j.j + nn.n - 1),
                                  ' ') AS g
           FROM tk,
                (SELECT unnest([2, 3, 4]) AS n) nn,
                UNNEST(range(1, greatest(len(tk.toks) - nn.n + 2, 1)))
                    AS j(j)),
    gc AS (SELECT doc_id, tok_chars, n, g, count(*) AS c
           FROM gr GROUP BY 1, 2, 3, 4),
    gtop AS (SELECT doc_id, tok_chars,
                    CAST(max(CASE WHEN n = 2 THEN c * len(g) END) AS BIGINT)
                        AS t2,
                    CAST(max(CASE WHEN n = 3 THEN c * len(g) END) AS BIGINT)
                        AS t3,
                    CAST(max(CASE WHEN n = 4 THEN c * len(g) END) AS BIGINT)
                        AS t4
             FROM gc GROUP BY 1, 2)
    SELECT b.doc_id,
           COALESCE(l.n, 0) AS n_lines,
           floor(CAST(l.n - l.dn AS DOUBLE) / CAST(l.n AS DOUBLE)
                 * 1000000 + 0.5) / 1000000.0 AS dup_line_frac,
           floor(CAST(l.dchars AS DOUBLE) / CAST(l.chars AS DOUBLE)
                 * 1000000 + 0.5) / 1000000.0 AS dup_line_char_frac,
           floor(CAST(p.n - p.dn AS DOUBLE) / CAST(p.n AS DOUBLE)
                 * 1000000 + 0.5) / 1000000.0 AS dup_para_frac,
           floor(CAST(p.dchars AS DOUBLE) / CAST(p.chars AS DOUBLE)
                 * 1000000 + 0.5) / 1000000.0 AS dup_para_char_frac,
           floor(CAST(g.t2 AS DOUBLE) / CAST(g.tok_chars AS DOUBLE)
                 * 1000000 + 0.5) / 1000000.0 AS top2_frac,
           floor(CAST(g.t3 AS DOUBLE) / CAST(g.tok_chars AS DOUBLE)
                 * 1000000 + 0.5) / 1000000.0 AS top3_frac,
           floor(CAST(g.t4 AS DOUBLE) / CAST(g.tok_chars AS DOUBLE)
                 * 1000000 + 0.5) / 1000000.0 AS top4_frac
    FROM base b
    LEFT JOIN lstat l USING (doc_id)
    LEFT JOIN pstat p USING (doc_id)
    LEFT JOIN gtop g USING (doc_id)
    ORDER BY b.doc_id
    """,
)
def text_repetition_report(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.curate import repetition_report

    docs = load_table(spark, sf, "documents").select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.col("text"), " (slow|fast) ", "\n\n"),
            " ", "\n",
        ).alias("text"),
    )
    return repetition_report(docs).orderBy("doc_id")


# --------------------------------------------------------------------------
# PMI collocations (operators/lm.pmi_collocations): corpus multi-word-
# expression extraction. Marginals over the FULL bigram table, min_count
# prunes output only; pmi/npmi are mirrored float trees over exact
# BIGINT counts, DECIMAL(18,6)-fixed like the bigram LM.
# --------------------------------------------------------------------------
_PMI_MIN = 5


@query(
    "text_pmi_collocations",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_TOK} AS w FROM documents WHERE trim(text) <> ''
    ),
    bg AS (
        SELECT w[i] AS prev, w[i + 1] AS cur
        FROM d, UNNEST(range(1, len(w))) AS t(i)
        WHERE len(w) >= 2
    ),
    c_pc AS (
        SELECT prev, cur, CAST(count(*) AS BIGINT) AS c
        FROM bg GROUP BY 1, 2
    ),
    c_p AS (SELECT prev, CAST(sum(c) AS BIGINT) AS cp FROM c_pc GROUP BY 1),
    c_c AS (SELECT cur, CAST(sum(c) AS BIGINT) AS cc FROM c_pc GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM c_pc),
    cand AS (
        SELECT prev, cur, c, cp, cc, (SELECT t FROM tot) AS t
        FROM c_pc JOIN c_p USING (prev) JOIN c_c USING (cur)
        WHERE c >= {_PMI_MIN}
    )
    SELECT prev, cur, c AS count,
           CAST(CAST(floor(ln(CAST(t * c AS DOUBLE)
                / CAST(cp * cc AS DOUBLE))
                * 1000000 + 0.5) / 1000000.0 AS DECIMAL(18,6))
                AS DOUBLE) AS pmi,
           CAST(CASE WHEN -ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) != 0
               THEN CAST(floor(ln(CAST(t * c AS DOUBLE)
                    / CAST(cp * cc AS DOUBLE))
                    / (-ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)))
                    * 1000000 + 0.5) / 1000000.0 AS DECIMAL(18,6))
           END AS DOUBLE) AS npmi
    FROM cand ORDER BY prev, cur
    """,
)
def text_pmi_collocations(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.lm import pmi_collocations

    docs = load_table(spark, sf, "documents")
    return pmi_collocations(docs, min_count=_PMI_MIN).orderBy(
        "prev", "cur"
    )


# --------------------------------------------------------------------------
# Cross-source vocabulary Jaccard (operators/textops.
# source_vocab_jaccard): the corpus-redundancy matrix. Pairs from the
# token-level inverted index (a token in k sources -> k(k-1)/2 rows),
# never a vocab cross join; exact BIGINT counts, one mirrored division.
# --------------------------------------------------------------------------
@query(
    "text_source_jaccard",
    oracle=f"""
    WITH d AS (
        SELECT source, {_TOK} AS w FROM documents
        WHERE source IS NOT NULL AND trim(text) <> ''
    ),
    b AS (SELECT DISTINCT source AS g, unnest(w) AS t FROM d),
    sizes AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS v FROM b GROUP BY 1),
    inter AS (
        SELECT a.g AS ga, b2.g AS gb, CAST(COUNT(*) AS BIGINT) AS i
        FROM b a JOIN b b2 ON a.t = b2.t AND a.g < b2.g
        GROUP BY 1, 2
    )
    SELECT ga AS source_a, gb AS source_b,
           sa.v AS vocab_a, sb.v AS vocab_b, i AS inter,
           {round4_sql("CAST(i AS DOUBLE) / CAST(sa.v + sb.v - i AS DOUBLE)").replace("10000", "1000000")}
               AS jaccard
    FROM inter
    JOIN sizes sa ON sa.g = inter.ga
    JOIN sizes sb ON sb.g = inter.gb
    ORDER BY source_a, source_b
    """,
)
def text_source_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.textops import source_vocab_jaccard

    docs = load_table(spark, sf, "documents")
    return source_vocab_jaccard(docs).orderBy("source_a", "source_b")


# --------------------------------------------------------------------------
# Duplicate-ngram coverage (operators/textops.dup_ngram_coverage): the
# per-document "corpus boilerplate fraction" — template families whose
# pages are each unique but whose building blocks are all shared.
# Linear in total shingles (inverted index + join back, NO pair
# expansion); exact BIGINT counts, one mirrored division.
# --------------------------------------------------------------------------
@query(
    "text_dup_ngram_coverage",
    oracle="""
    WITH d AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents
    ),
    g AS (
        SELECT doc_id, list_distinct(list_transform(
            range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        )) AS sh
        FROM d WHERE len(w) >= 3
    ),
    e AS (SELECT doc_id, unnest(sh) AS s FROM g),
    idx AS (SELECT s, CAST(count(*) AS BIGINT) AS docs FROM e GROUP BY 1),
    j AS (SELECT e.doc_id, idx.docs FROM e JOIN idx USING (s)),
    a AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN docs >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_shared
        FROM j GROUP BY 1
    )
    SELECT doc_id, n_shingles, n_shared,
           floor(CAST(n_shared AS DOUBLE) / CAST(n_shingles AS DOUBLE)
                 * 1000000 + 0.5) / 1000000.0 AS coverage
    FROM a ORDER BY doc_id
    """,
)
def text_dup_ngram_coverage(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.textops import dup_ngram_coverage

    docs = load_table(spark, sf, "documents")
    return dup_ngram_coverage(docs).orderBy("doc_id")


# --------------------------------------------------------------------------
# Exact duplicated-substring spans (operators/textops.duplicate_spans): the
# Lee-et-al exact-substring dedup signal as a per-document cut list —
# maximal runs of corpus-duplicated word trigrams reported as token spans.
# All-integer output (offsets + counts), directly hash-oracle-able.
#
# Registered round 8 (was staged through round 7 under the ~50-row
# driver budget).
# Pre-validated end-to-end by tests/test_textops.py::
# test_text_duplicate_spans_oracle_parity (same compare as the driver).
# --------------------------------------------------------------------------
_DUP_SPANS_ORACLE = r"""
    WITH w AS (
        SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
        WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 3
    ),
    pe AS (
        SELECT doc_id, p,
               array_to_string(toks[p + 1 : p + 3], ' ') AS s
        FROM (SELECT doc_id, toks,
                     unnest(range(0, len(toks) - 2)) AS p
              FROM w)
    ),
    idx AS (SELECT s, count(*) AS occ FROM pe GROUP BY s),
    dup AS (
        SELECT pe.doc_id, pe.p FROM pe JOIN idx USING (s)
        WHERE occ >= 2
    ),
    runs AS (
        SELECT doc_id, p,
               CASE WHEN p - lag(p) OVER (
                        PARTITION BY doc_id ORDER BY p
                    ) = 1 THEN 0 ELSE 1 END AS newf
        FROM dup
    ),
    r2 AS (
        SELECT doc_id, p,
               SUM(newf) OVER (
                   PARTITION BY doc_id ORDER BY p
               ) AS run
        FROM runs
    )
    SELECT doc_id,
           CAST(MIN(p) AS BIGINT) AS start_tok,
           CAST(MAX(p) + 2 AS BIGINT) AS end_tok,
           CAST(MAX(p) + 2 - MIN(p) + 1 AS BIGINT) AS span_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_dup_shingles
    FROM r2 GROUP BY doc_id, run
    ORDER BY doc_id, start_tok
"""


@query("text_duplicate_spans", oracle=_DUP_SPANS_ORACLE)
def text_duplicate_spans(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.textops import duplicate_spans

    docs = load_table(spark, sf, "documents")
    return duplicate_spans(docs).orderBy("doc_id", "start_tok")


# --------------------------------------------------------------------------
# TextRank keywords (operators/textops.textrank_keywords): corpus-level
# keyword extraction — PageRank over the stopword-filtered word adjacency
# graph (Mihalcea & Tarau 2004). The oracle unrolls the same 10
# fixed-point iterations as the graph family's _pr_oracle (BIGINT 1e-10
# rank units, materialized CTE per level) over a word-edge head, so the
# iterative part value-hashes bit-for-bit.
#
# Registered round 8 (was staged through round 7 under the ~50-row
# driver budget).
# Pre-validated end-to-end by
# tests/test_textops.py::test_textrank_oracle_parity (same compare as
# the driver).
# --------------------------------------------------------------------------
_TR_ITERS = 10
_TR_DAMP = 0.85
_TR_SCALE = "10000000000"
_TR_TOPK = 25


def _textrank_oracle() -> str:
    stop = "'the','a','of','and','to','in','is'"  # STOPWORDS["en"]
    head = rf"""
    tk AS (
        SELECT list_filter(
                   regexp_split_to_array(trim(lower(text)), '\s+'),
                   t -> regexp_matches(t, '^[a-z]+$')
                        AND t NOT IN ({stop})
               ) AS f
        FROM documents
    ),
    pairs AS (
        SELECT f[i] AS a, f[i + 1] AS b
        FROM tk, unnest(range(1, len(f))) t(i)
        WHERE len(f) >= 2
    ),
    e2 AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM (
            SELECT a AS src, b AS dst FROM pairs WHERE a <> b
            UNION ALL SELECT b, a FROM pairs WHERE a <> b)
    ),
    nodes AS MATERIALIZED (
        SELECT DISTINCT node FROM (
            SELECT src AS node FROM e2 UNION ALL SELECT dst FROM e2)
    ),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    deg AS MATERIALIZED (
        SELECT src AS node, COUNT(*) AS dg FROM e2 GROUP BY 1),
    r0 AS MATERIALIZED (
        SELECT node, CAST({_TR_SCALE} AS BIGINT) AS units FROM nodes)"""
    steps = []
    for i in range(1, _TR_ITERS + 1):
        p = f"r{i - 1}"
        contrib = (
            f"CAST(floor(CAST({p}.units AS DOUBLE) / deg.dg + 0.5)"
            " AS BIGINT)"
        )
        upd = (
            f"CAST(floor((1.0 - {_TR_DAMP}) * {_TR_SCALE}.0"
            f" + {_TR_DAMP} * (CAST(COALESCE(c{i}.s, 0) AS DOUBLE)"
            f" + CAST((SELECT m FROM dang{i}) AS DOUBLE)"
            f" / CAST((SELECT n FROM nn) AS DOUBLE))"
            f" + 0.5) AS BIGINT)"
        )
        steps.append(f"""
    dang{i} AS MATERIALIZED (
        SELECT COALESCE(SUM(units), 0) AS m
        FROM {p} LEFT JOIN deg USING (node) WHERE deg.dg IS NULL
    ),
    c{i} AS MATERIALIZED (
        SELECT e2.dst AS node, SUM({contrib}) AS s
        FROM e2
        JOIN {p} ON e2.src = {p}.node
        JOIN deg ON deg.node = e2.src
        GROUP BY 1
    ),
    r{i} AS MATERIALIZED (
        SELECT nodes.node, {upd} AS units
        FROM nodes LEFT JOIN c{i} USING (node)
    )""")
    return (
        "WITH" + head + "," + ",".join(steps)
        + f"""
    SELECT node AS word, CAST(units AS DOUBLE) / {_TR_SCALE}.0 AS rank
    FROM r{_TR_ITERS} ORDER BY units DESC, node LIMIT {_TR_TOPK}"""
    )


@query("text_textrank_keywords", oracle=_textrank_oracle())
def text_textrank_keywords(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.textops import textrank_keywords

    docs = load_table(spark, sf, "documents")
    return textrank_keywords(
        docs, top_k=_TR_TOPK, damping=_TR_DAMP, max_iter=_TR_ITERS
    )


# --------------------------------------------------------------------------
# Applied duplicated-span removal (operators/textops.remove_duplicate_spans):
# the executable Lee-et-al cut — duplicated token spans >= 4 tokens removed,
# survivors reassembled. One row per input document, integer counts.
#
# Registered round 8 (was staged through round 7 under the ~50-row
# driver budget).
# Pre-validated by tests/test_textops.py::
# test_text_remove_dup_spans_oracle_parity.
# --------------------------------------------------------------------------
_RM_SPANS_ORACLE = r"""
    WITH w AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        FROM documents
    ),
    pe AS (
        SELECT doc_id, p,
               array_to_string(toks[p + 1 : p + 3], ' ') AS s
        FROM (SELECT doc_id, toks,
                     unnest(range(0, len(toks) - 2)) AS p
              FROM w WHERE len(toks) >= 3)
    ),
    idx AS (SELECT s, count(*) AS occ FROM pe GROUP BY s),
    dup AS (
        SELECT pe.doc_id, pe.p FROM pe JOIN idx USING (s)
        WHERE occ >= 2
    ),
    runs AS (
        SELECT doc_id, p,
               CASE WHEN p - lag(p) OVER (
                        PARTITION BY doc_id ORDER BY p
                    ) = 1 THEN 0 ELSE 1 END AS newf
        FROM dup
    ),
    r2 AS (
        SELECT doc_id, p,
               SUM(newf) OVER (PARTITION BY doc_id ORDER BY p) AS run
        FROM runs
    ),
    spans AS (
        SELECT doc_id, MIN(p) AS st, MAX(p) + 2 AS en
        FROM r2 GROUP BY doc_id, run
        HAVING MAX(p) + 2 - MIN(p) + 1 >= 4
    ),
    rem AS (
        SELECT DISTINCT doc_id, p FROM (
            SELECT doc_id, unnest(range(st, en + 1)) AS p FROM spans)
    ),
    tokpos AS (
        SELECT doc_id, unnest(toks) AS tok,
               unnest(range(0, len(toks))) AS p
        FROM w
    ),
    kept AS (
        SELECT t.doc_id, t.tok, t.p
        FROM tokpos t ANTI JOIN rem USING (doc_id, p)
    ),
    tot AS (SELECT doc_id, len(toks) AS n_tokens FROM w)
    SELECT tot.doc_id,
           coalesce(string_agg(kept.tok, ' ' ORDER BY kept.p), '')
               AS clean_text,
           CAST(tot.n_tokens AS BIGINT) AS n_tokens,
           CAST(tot.n_tokens - COUNT(kept.tok) AS BIGINT)
               AS n_removed_tokens
    FROM tot LEFT JOIN kept USING (doc_id)
    GROUP BY tot.doc_id, tot.n_tokens
    ORDER BY doc_id
"""


@query("text_remove_dup_spans", oracle=_RM_SPANS_ORACLE)
def text_remove_dup_spans(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.textops import remove_duplicate_spans

    docs = load_table(spark, sf, "documents")
    return remove_duplicate_spans(docs).orderBy("doc_id")


# --------------------------------------------------------------------------
# Cross-corpus bigram perplexity (operators/lm.cross_score_bigram): train
# the interpolated bigram LM on every source except src0 and score src0's
# documents under it, charging unseen transitions the add-one unigram
# backoff — the CCNet/KenLM in-domain quality-filter pattern. Constants:
# the oracle spells the unigram weight as (1.0 - 0.7); P_uni's denominator
# is (T + V + 1) computed in BIGINT then converted once.
#
# Registered round 8 (was staged through round 7 under the ~50-row
# driver budget).
# Pre-validated by tests/test_chunking_lm_shuffle.py::
# test_text_cross_perplexity_oracle_parity.
# --------------------------------------------------------------------------
_XPPL_ORACLE = f"""
    WITH tr AS (
        SELECT doc_id, {_TOK} AS w FROM documents
        WHERE source <> 'src0' AND trim(text) <> ''
    ),
    bg AS (
        SELECT doc_id, w[i] AS prev, w[i + 1] AS cur
        FROM tr, UNNEST(range(1, len(w))) AS t(i)
        WHERE len(w) >= 2
    ),
    c_pc AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS c
             FROM bg GROUP BY 1, 2),
    c_p AS (SELECT prev, CAST(sum(c) AS BIGINT) AS cp FROM c_pc GROUP BY 1),
    c_c AS (SELECT cur, CAST(sum(c) AS BIGINT) AS cc FROM c_pc GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM c_pc),
    voc AS (SELECT CAST(count(*) AS BIGINT) AS v FROM c_c),
    ev AS (
        SELECT doc_id, {_TOK} AS w FROM documents
        WHERE source = 'src0' AND trim(text) <> ''
    ),
    ebg AS (
        SELECT doc_id, w[i] AS prev, w[i + 1] AS cur
        FROM ev, UNNEST(range(1, len(w))) AS t(i)
        WHERE len(w) >= 2
    ),
    pt AS (SELECT doc_id, prev, cur, CAST(count(*) AS BIGINT) AS tf
           FROM ebg GROUP BY 1, 2, 3),
    j AS (
        SELECT pt.doc_id, pt.tf, c_pc.c, c_p.cp, c_c.cc
        FROM pt
        LEFT JOIN c_p USING (prev)
        LEFT JOIN c_pc USING (prev, cur)
        LEFT JOIN c_c USING (cur)
    ),
    lp AS (
        SELECT doc_id, tf,
               CAST(floor(ln(
                   0.7 * (CASE WHEN c IS NOT NULL
                               THEN CAST(c AS DOUBLE) / CAST(cp AS DOUBLE)
                               ELSE 0.0 END)
                   + (1.0 - 0.7)
                     * (CAST(COALESCE(cc, 0) + 1 AS DOUBLE)
                        / CAST((SELECT t FROM tot) + (SELECT v FROM voc)
                               + 1 AS DOUBLE))
               ) * 1000000 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS lp
        FROM j
    )
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_bigrams,
           {round4_sql("CAST(sum(lp * tf) AS DOUBLE) / sum(tf)")}
               AS mean_logprob
    FROM lp GROUP BY 1 ORDER BY 1
"""


@query("text_cross_perplexity", oracle=_XPPL_ORACLE)
def text_cross_perplexity(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.lm import cross_score_bigram

    docs = load_table(spark, sf, "documents")
    return cross_score_bigram(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Zipf's-law fit (operators/textops.zipf_fit): one-row corpus health
# readout — OLS of ln(freq) on ln(rank) over the top-1000 frequency head.
# ln values fixed-pointed to 1e-6 BIGINT units per distinct term, so all
# five moment sums are exact; the slope/intercept/r2 tree is mirrored.
#
# Registered round 8 (was staged through round 7 under the ~50-row
# driver budget).
# Pre-validated by tests/test_textops.py::test_text_zipf_fit_oracle_parity.
# --------------------------------------------------------------------------
_ZIPF_ORACLE = f"""
    WITH f AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (
            SELECT unnest({_LTOK}) AS tok FROM documents
            WHERE trim(text) <> ''
        ) GROUP BY tok
    ),
    h AS (SELECT tok, c FROM f ORDER BY c DESC, tok LIMIT 1000),
    r AS (SELECT row_number() OVER (ORDER BY c DESC, tok) AS rk, c FROM h),
    m AS (
        SELECT CAST(floor(ln(CAST(rk AS DOUBLE)) * 1000000 + 0.5)
                    AS BIGINT) AS x,
               CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000 + 0.5)
                    AS BIGINT) AS y
        FROM r
    ),
    a AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM m
    )
    SELECT n AS n_terms,
           floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * 1000000 + 0.5) / 1000000.0 AS slope,
           floor((CAST(sy AS DOUBLE)
                  - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) / 1000000.0
                 * 1000000 + 0.5) / 1000000.0 AS intercept,
           CASE WHEN (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <> 0
                THEN floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                           * 1000000 + 0.5) / 1000000.0
           END AS r2
    FROM a WHERE n >= 2
      AND (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) <> 0
"""


@query("text_zipf_fit", oracle=_ZIPF_ORACLE)
def text_zipf_fit(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.textops import zipf_fit

    docs = load_table(spark, sf, "documents")
    return zipf_fit(docs, top_k=1000)


# --------------------------------------------------------------------------
# Readability (operators/textops.readability_report): Flesch-style score
# from three exact integer counts (words, sentence-punctuation runs,
# vowel-group syllables) — map-only codegen, the complexity gate beside
# the quality/Gopher battery. Constants are exact double literals; the
# two divisions are mirrored operand-for-operand.
#
# Registered round 9 (staged round 8). Pre-validated by the staged-queue
# mirror in test_oracle_queries.py and
# tests/test_textops.py::test_readability_known_values.
# --------------------------------------------------------------------------
_READABILITY_ORACLE = r"""
    WITH t AS (
        SELECT doc_id, text,
               string_split_regex(trim(lower(text)), '\s+') AS toks
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                    AS BIGINT) AS n_sentences,
               CAST(list_sum(list_transform(toks, w ->
                    greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1)))
                    AS BIGINT) AS n_syllables
        FROM t WHERE len(toks) >= 3
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           floor((206.835
                  - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                  - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words))
                 * 10000 + 0.5) / 10000.0 AS flesch
    FROM m ORDER BY doc_id
"""


@query("text_readability", oracle=_READABILITY_ORACLE)
def text_readability(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.textops import readability_report

    docs = load_table(spark, sf, "documents")
    return readability_report(docs).orderBy("doc_id")


# --------------------------------------------------------------------------
# Heaps'-law vocabulary-growth fit (operators/textops.heaps_fit): V ~ k*N^b
# over 32 md5-randomized cumulative corpus prefixes — the zipf_fit
# companion (junk vocabularies grow too fast, template soup too slow).
# The oracle replays the identical pipeline: md5-uniform bucket, min-bucket
# first appearances, running sums over the 32-row frame, 1e-6 fixed-point
# ln moments, the mirrored OLS tree, exp(intercept).
#
# Registered round 10 (staged round 9; pre-validated by the staged-queue
# mirror and tests/test_textops.py).
# --------------------------------------------------------------------------
_HEAPS_B = 32

_HEAPS_ORACLE = rf"""
    WITH toks AS (
        SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   % {_HEAPS_B} AS b,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents WHERE trim(text) <> ''
    ),
    per_bucket AS (SELECT b, CAST(count(*) AS BIGINT) AS nt
                   FROM toks GROUP BY b),
    new_terms AS (
        SELECT b, CAST(count(*) AS BIGINT) AS nv
        FROM (SELECT tok, min(b) AS b FROM toks GROUP BY tok) GROUP BY b
    ),
    cums AS (
        SELECT sum(nt) OVER win AS cn, sum(coalesce(nv, 0)) OVER win AS cv
        FROM per_bucket LEFT JOIN new_terms USING (b)
        WINDOW win AS (ORDER BY b ROWS UNBOUNDED PRECEDING)
    ),
    pts AS (
        SELECT CAST(floor(ln(CAST(cn AS DOUBLE)) * 1000000 + 0.5)
                    AS BIGINT) AS x,
               CAST(floor(ln(CAST(cv AS DOUBLE)) * 1000000 + 0.5)
                    AS BIGINT) AS y
        FROM cums WHERE cn > 0 AND cv > 0
    ),
    m AS (
        SELECT CAST(count(*) AS DOUBLE) AS nd,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(x * y) AS DOUBLE) AS sxy,
               CAST(sum(x * x) AS DOUBLE) AS sxx,
               CAST(sum(y * y) AS DOUBLE) AS syy
        FROM pts
    )
    SELECT n AS n_points,
           floor((nd * sxy - sx * sy) / (nd * sxx - sx * sx) * 1000000
                 + 0.5) / 1000000.0 AS beta,
           floor(exp((sy - (nd * sxy - sx * sy) / (nd * sxx - sx * sx) * sx)
                     / nd / 1000000.0) * 1000000 + 0.5) / 1000000.0
               AS k_coeff,
           CASE WHEN nd * syy - sy * sy <> 0 THEN
               floor(((nd * sxy - sx * sy) * (nd * sxy - sx * sy))
                     / ((nd * sxx - sx * sx) * (nd * syy - sy * sy))
                     * 1000000 + 0.5) / 1000000.0 END AS r2
    FROM m WHERE n >= 2 AND nd * sxx - sx * sx <> 0
"""


@query("text_heaps_fit", oracle=_HEAPS_ORACLE)
def text_heaps_fit(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.textops import heaps_fit

    docs = load_table(spark, sf, "documents")
    return heaps_fit(docs, n_buckets=_HEAPS_B)


# --------------------------------------------------------------------------
# Vocabulary richness (operators/textops.vocab_richness): Chao1 asymptote
# + Good-Turing unseen mass from the frequency-of-frequencies — the
# companion scalar to text_heaps_fit (growth curve) and text_zipf_fit
# (rank law). One vocab agg, one scalar agg; N/V/F1/F2 exact BIGINTs,
# chao1 and p0 each ONE mirrored float expression, 6dp.
#
# STAGED for round-11 registration. Pre-validated by the staged-queue
# mirror and tests/test_textops.py::test_vocab_richness_known_values.
# --------------------------------------------------------------------------
_RICH_ORACLE = rf"""
    WITH toks AS (
        SELECT unnest(CASE WHEN trim(lower(text)) = '' THEN []
                      ELSE {_LTOK} END) AS tok
        FROM documents
    ),
    tc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM toks GROUP BY 1),
    a AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS v,
               CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS f1,
               CAST(SUM(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS f2
        FROM tc
    )
    SELECT n AS n_tokens, v AS vocab_size, f1 AS hapax_count,
           f2 AS dis_count,
           floor((CAST(v AS DOUBLE) + CAST(f1 * (f1 - 1) AS DOUBLE)
                  / CAST(2 * (f2 + 1) AS DOUBLE)) * 1000000 + 0.5)
               / 1000000.0 AS chao1,
           floor(CAST(f1 AS DOUBLE) / CAST(n AS DOUBLE) * 1000000 + 0.5)
               / 1000000.0 AS gt_unseen_mass
    FROM a WHERE n > 0
"""


@query("text_vocab_richness", oracle=_RICH_ORACLE)
def text_vocab_richness(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.textops import vocab_richness

    return vocab_richness(load_table(spark, sf, "documents"))


# --------------------------------------------------------------------------
# Term burstiness (operators/textops.term_burstiness): Church-Gale mean
# within-document rate for the top-50 collection-frequency terms — the
# boilerplate-vs-content structural signal. (term, doc) pre-agg then
# (cf, df) agg (no count-distinct over raw occurrences); top-k plans as
# TakeOrderedAndProject. Exact BIGINTs, one division, 6dp.
#
# STAGED for round-11 registration. Pre-validated by the staged-queue
# mirror and tests/test_textops.py::test_term_burstiness_known_values.
# --------------------------------------------------------------------------
_BURST_K = 50
_BURST_MIN_DF = 2

_BURST_ORACLE = rf"""
    WITH toks AS (
        SELECT doc_id,
               unnest(CASE WHEN trim(lower(text)) = '' THEN []
                      ELSE {_LTOK} END) AS tok
        FROM documents
    ),
    pd AS (
        SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS c
        FROM toks GROUP BY 1, 2
    ),
    s AS (
        SELECT tok, CAST(SUM(c) AS BIGINT) AS cf,
               CAST(COUNT(*) AS BIGINT) AS df
        FROM pd GROUP BY 1
    )
    SELECT tok AS term, cf, df,
           floor(CAST(cf AS DOUBLE) / CAST(df AS DOUBLE) * 1000000 + 0.5)
               / 1000000.0 AS burstiness
    FROM s WHERE df >= {_BURST_MIN_DF}
    ORDER BY cf DESC, term LIMIT {_BURST_K}
"""


@query("text_term_burstiness", oracle=_BURST_ORACLE)
def text_term_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.textops import term_burstiness

    return term_burstiness(
        load_table(spark, sf, "documents"),
        top_k=_BURST_K,
        min_df=_BURST_MIN_DF,
    )
