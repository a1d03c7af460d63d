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


def ngram_contamination(
    corpus: DataFrame,
    bench: DataFrame,
    n: int = 3,
    min_shared: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination: (corpus doc, benchmark doc) pairs sharing
    >= ``min_shared`` distinct word n-gram shingles — the standard check
    that evaluation data has not leaked into a training corpus.

    Shape at scale: both sides explode to (doc, shingle); the benchmark set
    is tiny relative to the corpus, so its shingle frame is BROADCAST and
    the corpus is never shuffled — the whole check is a map-side hash join
    plus one hash agg on (doc_id, bench_id). Set ``broadcast_bench=False``
    for the (unusual) case of a corpus-sized right side, which falls back
    to a shuffle hash join on the shingle key. For very large n-gram
    spaces, swap `shingles` for `hashed_shingles` (64-bit hashes instead of
    strings) — same plan, 10x narrower shuffle rows; string shingles are
    kept here so cross-engine oracles can reproduce them.
    """
    c = corpus.withColumn(
        "__toks", T.tokens(F.lower(F.col(text_col)))
    ).select(
        F.col(id_col).alias("doc_id"),
        F.explode(T.shingles_from_tokens(F.col("__toks"), n)).alias("__s"),
    )
    b = bench.withColumn(
        "__toks", T.tokens(F.lower(F.col(text_col)))
    ).select(
        F.col(id_col).alias("bench_id"),
        F.explode(T.shingles_from_tokens(F.col("__toks"), n)).alias("__s"),
    )
    if broadcast_bench:
        b = F.broadcast(b)
    return (
        c.join(b, "__s")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def strip_boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df_pct: int = 20,
) -> DataFrame:
    """C4-style cross-document boilerplate removal: a LINE that appears in
    at least ``min_df_pct`` percent of documents (cookie banners, nav
    menus, "subscribe" footers) is boilerplate — strip it from every
    document and reassemble the rest in order.

    Shape: one explode (map-only), one line-keyed aggregation for the
    document frequencies, a broadcast-able anti-join of the line table
    against the boilerplate set (bounded by distinct frequent lines), and
    one per-doc reassembly aggregation. The threshold compare is integer
    (df * 100 >= pct * n_docs) — no float boundary to disagree across
    engines. Documents whose every line is boilerplate survive with empty
    text (visible, not silently dropped).

    Output: ``(id_col, clean_text, n_lines, n_removed)``."""
    # NULL text explodes to zero rows and the doc would VANISH from the
    # output (and still inflate n_docs) — treat it as empty text instead
    lines = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("pos", "line"),
    )
    n_docs = docs.select(
        F.count(F.lit(1)).cast("bigint").alias("__ndocs")
    )
    df_per_line = (
        lines.select("line", id_col)
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__df"))
    )
    boiler = (
        df_per_line.crossJoin(F.broadcast(n_docs))
        .filter(F.col("__df") * 100 >= F.lit(int(min_df_pct)) * F.col("__ndocs"))
        .select("line")
    )
    tagged = lines.join(F.broadcast(boiler.withColumn("__b", F.lit(1))), "line", "left")
    kept = tagged.filter(F.col("__b").isNull())
    out = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )
    totals = lines.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__total")
    )
    return (
        totals.join(out, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.coalesce(F.col("n_lines"), F.lit(0)).cast("bigint").alias("n_lines"),
            (F.col("__total") - F.coalesce(F.col("n_lines"), F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
        )
    )
