"""Document-analysis operator: one pass, all metrics.

Composes the column expressions in functions/text.py into a single projection
— one scan of the corpus, no shuffle, fully codegen'd. At 100 TB this is a
map-only job whose cost is the parquet scan itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def source_vocab_jaccard(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    digits: int = 6,
) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — "how much of these
    two crawls is the same language surface?" — the corpus-redundancy
    matrix that decides whether a new source is worth ingesting.
    Output one row per unordered source pair (``source_a < source_b``
    lexically): ``(source_a, source_b, vocab_a, vocab_b, inter,
    jaccard)`` over DISTINCT whitespace tokens.

    Shape: ONE corpus scan. The (source, token) distinct shuffle feeds
    BOTH consumers — a token-keyed aggregation that collects each
    token's sorted source set and expands pairs IN-ROW (k(k-1)/2
    structs for a token in k sources — inherently bounded by
    |sources|^2 per token, never a vocab-by-vocab cross join), and a
    source-keyed vocab-size count (map-side combinable, |sources| rows)
    that is broadcast-joined onto the pair counts at the very end. The
    two branches share the distinct exchange (ReusedExchange), so the
    expensive tokenize+explode pipeline still runs exactly once. No
    window: a per-source window would force every distinct token of a
    source into ONE task — an unsplittable straggler once a single
    source's vocabulary reaches 10^8 tokens — whereas the groupBy gets
    map-side partial aggregation.

    Determinism: all counts exact BIGINT; the in-row pair order is
    pinned by sorting the collected set; one mirrored division,
    ``digits`` rounding.
    """
    from momyre_spark.functions.numeric import round_half_up
    from momyre_spark.functions.text import tokens

    base = (
        docs.filter(
            F.col(group_col).isNotNull() & (F.trim(F.col(text_col)) != "")
        )
        .select(
            F.col(group_col).alias("__g"),
            F.explode(tokens(F.col(text_col))).alias("__t"),
        )
        .distinct()
    )
    sizes = base.groupBy("__g").agg(F.count(F.lit(1)).alias("__v"))
    by_tok = (
        base.groupBy("__t")
        .agg(F.sort_array(F.collect_set(F.col("__g"))).alias("__gs"))
        .filter(F.size("__gs") >= 2)
    )
    pair_expr = F.explode(
        F.flatten(
            F.transform(
                F.col("__gs"),
                lambda x, i: F.transform(
                    F.slice(
                        F.col("__gs"), i + 2, F.size(F.col("__gs"))
                    ),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        )
    )
    pairs = by_tok.select(pair_expr.alias("__p")).select(
        F.col("__p.a").alias("__ga"),
        F.col("__p.b").alias("__gb"),
    )
    inter = pairs.groupBy("__ga", "__gb").agg(
        F.count(F.lit(1)).alias("__i")
    )
    sized = inter.join(
        F.broadcast(
            sizes.select(
                F.col("__g").alias("__ga"), F.col("__v").alias("__va")
            )
        ),
        "__ga",
    ).join(
        F.broadcast(
            sizes.select(
                F.col("__g").alias("__gb"), F.col("__v").alias("__vb")
            )
        ),
        "__gb",
    )
    union = F.col("__va") + F.col("__vb") - F.col("__i")
    return sized.select(
        F.col("__ga").alias("source_a"),
        F.col("__gb").alias("source_b"),
        F.col("__va").alias("vocab_a"),
        F.col("__vb").alias("vocab_b"),
        F.col("__i").alias("inter"),
        round_half_up(
            F.col("__i").cast("double") / union.cast("double"), digits
        ).alias("jaccard"),
    )


def dup_ngram_coverage(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    digits: int = 6,
) -> DataFrame:
    """Per-document duplicate-ngram pressure: the fraction of a doc's
    DISTINCT word n-grams that also occur in at least one OTHER document
    — the Lee-et-al-style "how much of this page is corpus boilerplate"
    signal that catches template families exact/near dedup both miss
    (each page unique, every building block shared). Output:
    ``(doc_id, n_shingles, n_shared, coverage)``; docs shorter than n
    words are dropped visibly.

    Shape: one (shingle, doc) distinct explode, one shingle-keyed
    distinct-doc count (the inverted index), one equi-join back, one
    doc agg — identical skeleton to the n-gram dedup candidate
    generator, minus the pair expansion entirely: cost is linear in
    total shingles at any corpus size.

    Determinism: counts exact BIGINT; one mirrored division, ``digits``
    rounding.
    """
    from momyre_spark.functions.numeric import round_half_up
    from momyre_spark.functions.text import tokens
    from momyre_spark.operators.parallelism import ensure_parallelism

    w = ensure_parallelism(docs).withColumn(
        "__w", tokens(F.col(text_col))
    ).filter(F.size("__w") >= n)
    parts = [
        F.expr(f"slice(__w, {i + 1}, size(__w) - {n - 1})")
        for i in range(n)
    ]
    sh = F.array_distinct(
        F.zip_with(
            F.zip_with(parts[0], parts[1], lambda x, y: F.concat_ws(" ", x, y)),
            parts[2],
            lambda xy, z: F.concat_ws(" ", xy, z),
        )
    ) if n == 3 else None
    if sh is None:
        raise ValueError("momyre: dup_ngram_coverage supports n=3")
    # docs-per-shingle via the inverted-index groupBy + equi-join-back,
    # NOT a shingle-partitioned window: a boilerplate shingle present in
    # millions of documents (exactly the high-df shingles this operator
    # exists to find) would force all its rows into ONE unsplittable
    # window task. The groupBy shuffles only (shingle, partial_count)
    # pairs (map-side combine), and the join probe shuffle gets AQE
    # skew splitting — so the price of the second map-only explode scan
    # buys away the straggler/OOM cliff. `e` is (doc, shingle)-distinct
    # via array_distinct, so the row count per shingle IS its document
    # frequency.
    e = w.select(F.col(id_col), F.explode(sh).alias("__s"))
    idx = e.groupBy("__s").agg(F.count(F.lit(1)).alias("__docs"))
    joined = e.join(idx, "__s")
    agg = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.when(F.col("__docs") >= 2, 1).otherwise(0)).alias(
            "n_shared"
        ),
    )
    return agg.select(
        id_col,
        "n_shingles",
        "n_shared",
        round_half_up(
            F.col("n_shared").cast("double")
            / F.col("n_shingles").cast("double"),
            digits,
        ).alias("coverage"),
    )


def duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_occurrences: int = 2,
) -> DataFrame:
    """Exact duplicated-substring spans, token level: for every document,
    the maximal runs of consecutive word ``n``-grams that occur at least
    ``min_occurrences`` times in the WHOLE corpus (counting repeats inside
    one document) — the Lee-et-al "deduplicating training data" exact-
    substring signal, reported as removable spans rather than a coverage
    ratio (``dup_ngram_coverage`` gives the ratio; this gives the cut
    list). A run of k consecutive duplicated n-grams marks a duplicated
    token span of k + n - 1 tokens. Output one row per maximal span:
    ``(doc_id, start_tok, end_tok, span_tokens, n_dup_shingles)`` with
    0-based inclusive token offsets; row ORDER is unspecified
    (aggregation output) — callers needing (doc, start) order add their
    own orderBy, as the staged query wrapper does.

    Shape: one positional explode (position must survive, so no
    array_distinct), one shingle-keyed occurrence count via the
    inverted-index groupBy + equi-join-back (map-side combine + AQE skew
    splitting; NEVER a shingle-partitioned window — a boilerplate shingle
    in millions of docs would pin one task), then a per-document window
    to merge consecutive duplicated positions into maximal runs
    (lag-gap flag + running sum — the sessionize idiom). The only
    window is partitioned by document, so its worst task is the longest
    single document, not the corpus.

    Determinism: all counts and offsets are exact integers — no floats
    anywhere, directly hash-oracle-able.
    """
    from momyre_spark.functions.text import tokens
    from momyre_spark.operators.parallelism import ensure_parallelism

    if n < 2:
        raise ValueError("momyre: duplicate_spans needs n >= 2")
    # the positional shingle explode is the dominant map cost — do not
    # let a single-file corpus layout serialize it
    docs = ensure_parallelism(docs)
    w = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__w")
    ).filter(F.size("__w") >= n)
    # (doc, pos, shingle) with pos = 0-based start token index. slice() is
    # 1-based; shingle at pos p covers tokens [p, p+n-1].
    pe = w.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("__w") - F.lit(n)),
                lambda p: F.concat_ws(
                    " ", F.slice(F.col("__w"), p + F.lit(1), F.lit(n))
                ),
            )
        ).alias("__p", "__s"),
    )
    idx = pe.groupBy("__s").agg(F.count(F.lit(1)).alias("__occ"))
    dup = (
        pe.join(idx, "__s")
        .filter(F.col("__occ") >= min_occurrences)
        .select(id_col, "__p")
    )
    wdoc = Window.partitionBy(id_col).orderBy("__p")
    runs = dup.withColumn(
        "__new",
        F.when(
            F.col("__p") - F.lag("__p").over(wdoc) == 1, F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn(
        "__run",
        F.sum("__new").over(
            wdoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        runs.groupBy(id_col, "__run")
        .agg(
            F.min("__p").alias("start_tok"),
            (F.max("__p") + F.lit(n - 1)).alias("end_tok"),
            F.count(F.lit(1)).alias("n_dup_shingles"),
        )
        .select(
            id_col,
            F.col("start_tok").cast("bigint").alias("start_tok"),
            F.col("end_tok").cast("bigint").alias("end_tok"),
            (F.col("end_tok") - F.col("start_tok") + F.lit(1))
            .cast("bigint")
            .alias("span_tokens"),
            F.col("n_dup_shingles").cast("bigint").alias("n_dup_shingles"),
        )
    )


def textrank_keywords(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 25,
    damping: float = 0.85,
    max_iter: int = 10,
    lang: str = "en",
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004, public
    algorithm): build the corpus word co-occurrence graph — lowercase
    alphabetic tokens, stopwords removed, an undirected edge between
    words ADJACENT in the filtered token sequence — and rank words with
    PageRank; return the global ``top_k`` ``(word, rank)``. This is the
    corpus-level "what is this collection about" signal next to the
    per-doc tf-idf/BM25 term scores.

    Shape: one map-only explode to (binary, distinct) edges, then
    :func:`momyre_spark.operators.graph.pagerank` — fixed-iteration,
    exact integer rank units, so the iterative part is bit-identical
    under any partitioning and carries a full value-hash oracle (the
    graph family's recipe). Edge count is bounded by total corpus
    tokens; the vocabulary graph is orders of magnitude smaller than
    the corpus, so the iterations run on a frame that FITS — rank
    resolution auto-coarsens if the vocabulary is enormous.

    The final top-k is an ``orderBy(rank DESC, word).limit(k)`` — a
    TakeOrdered, never a full sort materialization.
    """
    from momyre_spark.functions.text import STOPWORDS, tokens
    from momyre_spark.operators.graph import pagerank

    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    filt = F.filter(
        tokens(F.lower(F.col(text_col))),
        lambda t: t.rlike("^[a-z]+$") & ~F.array_contains(stop_arr, t),
    )
    base = docs.select(filt.alias("__f")).filter(F.size("__f") >= 2)
    pairs = (
        base.select(
            F.explode(
                F.zip_with(
                    F.expr("slice(__f, 1, size(__f) - 1)"),
                    F.expr("slice(__f, 2, size(__f) - 1)"),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("__p")
        )
        .select(F.col("__p.a").alias("a"), F.col("__p.b").alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(
            pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        .distinct()
    )
    pr = pagerank(edges, damping=damping, max_iter=max_iter)
    return (
        pr.orderBy(F.desc("rank"), "node")
        .limit(top_k)
        .select(F.col("node").alias("word"), "rank")
    )


def remove_duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_occurrences: int = 2,
    min_span_tokens: int = 4,
) -> DataFrame:
    """The executable cut for :func:`duplicate_spans`: remove every
    duplicated token span of at least ``min_span_tokens`` tokens from
    each document and reassemble the survivors — the Lee-et-al exact
    substring dedup applied, not just reported. Spans shorter than the
    threshold stay (cutting every 3-token echo shreds text; the
    threshold is the precision/recall knob). Output one row per input
    document: ``(id_col, clean_text, n_tokens, n_removed_tokens)`` —
    clean_text is the kept tokens joined by single spaces (whitespace
    is normalized; token content is untouched).

    Shape: the span finder's plan (positional explode + occurrence
    index + per-doc run merge), then one per-doc interval list joined
    back to the corpus and applied as a positional array filter — a
    second map-side corpus scan, inherent to any find-then-cut pattern
    (persist the source between the two scans on a real cluster). The
    interval list per doc is bounded by doc length; the in-row filter
    is tokens x intervals per doc, never a shuffle.

    Determinism: interval bounds are exact integers; the filter and
    re-join are order-preserving by construction.
    """
    from momyre_spark.functions.text import tokens

    spans = duplicate_spans(
        docs, text_col, id_col, n, min_occurrences
    ).filter(F.col("span_tokens") >= min_span_tokens)
    ivs = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("start_tok", "end_tok")).alias("__ivs")
    )
    base = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("__w"))
    j = base.join(ivs, id_col, "left").withColumn(
        "__ivs",
        F.coalesce(
            "__ivs",
            F.array().cast(
                "array<struct<start_tok:bigint,end_tok:bigint>>"
            ),
        ),
    )
    kept = F.filter(
        F.col("__w"),
        lambda x, i: ~F.exists(
            F.col("__ivs"),
            lambda iv: (i.cast("bigint") >= iv["start_tok"])
            & (i.cast("bigint") <= iv["end_tok"]),
        ),
    )
    return j.select(
        id_col,
        F.concat_ws(" ", kept).alias("clean_text"),
        F.size("__w").cast("bigint").alias("n_tokens"),
        (F.size("__w") - F.size(kept)).cast("bigint").alias(
            "n_removed_tokens"
        ),
    )


def zipf_fit(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 1000,
    digits: int = 6,
) -> DataFrame:
    """Zipf's-law fit over the corpus frequency head: OLS of ln(freq) on
    ln(rank) for the ``top_k`` most frequent lowercase tokens — the
    one-row corpus health readout (natural language sits near slope -1;
    a much flatter slope says template soup, much steeper says tiny
    effective vocabulary). Output:
    ``(n_terms, slope, intercept, r2)``.

    Shape: one token-keyed hash agg (map-side combine) over one corpus
    scan, a TakeOrdered top-k (per-partition heaps, never a global
    sort), then rank assignment + 5 moment sums over the K-row head —
    K-bounded work regardless of corpus size. The rank window is a
    single partition of exactly K rows by construction.

    Determinism: ranks are exact; ln values are fixed-pointed to 1e-6
    units (BIGINT) per distinct term so all five moment sums are exact
    integers (K * (2.1e7)^2 stays < 2^63 up to K ~ 2e4); slope /
    intercept / r2 are one mirrored float tree over exactly-converted
    sums, rounded at ``digits``.
    """
    from momyre_spark.functions.text import tokens

    if not 2 <= top_k <= 20_000:
        raise ValueError("momyre: top_k must be in [2, 20000]")
    freqs = (
        docs.select(
            F.explode(tokens(F.lower(F.col(text_col)))).alias("__tok")
        )
        .groupBy("__tok")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    head = freqs.orderBy(F.desc("__c"), "__tok").limit(top_k)
    w = Window.orderBy(F.desc("__c"), "__tok")
    ranked = head.select(
        F.row_number().over(w).alias("__r"), "__c"
    ).select(
        F.floor(F.log(F.col("__r").cast("double")) * F.lit(1_000_000)
                + F.lit(0.5)).cast("bigint").alias("__x"),
        F.floor(F.log(F.col("__c").cast("double")) * F.lit(1_000_000)
                + F.lit(0.5)).cast("bigint").alias("__y"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    nd = F.col("__n").cast("double")
    sx, sy = F.col("__sx").cast("double"), F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    covn = nd * sxy - sx * sy
    varx = nd * sxx - sx * sx
    vary = nd * syy - sy * sy
    slope = covn / varx
    intercept = (sy - covn / varx * sx) / nd / F.lit(1_000_000.0)
    r2 = (covn * covn) / (varx * vary)
    return agg.filter((F.col("__n") >= 2) & (varx != 0)).select(
        F.col("__n").cast("bigint").alias("n_terms"),
        round_half_up(slope, digits).alias("slope"),
        round_half_up(intercept, digits).alias("intercept"),
        F.when(vary != 0, round_half_up(r2, digits)).alias("r2"),
    )


def readability_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
    digits: int = 4,
) -> DataFrame:
    """Flesch-reading-ease-style readability per document — the
    complexity gate a curation pipeline pairs with the quality/Gopher
    battery (too-hard and too-easy tails both correlate with boilerplate
    and OCR junk). Output per document:
    ``(id, n_words, n_sentences, n_syllables, flesch)``.

    Heuristics (the standard crude ones; the operator shape is the
    point): syllables = maximal ``[aeiouy]+`` runs per lowercased token,
    min 1 per word; sentences = maximal ``[.!?]+`` runs, min 1.
    Score = 206.835 - 1.015*(W/S) - 84.6*(Y/W) with the canonical
    constants as exact double literals.

    Shape: map-only — one corpus scan, tokens materialized ONCE per row
    (HOF references to an inline tokenizer re-evaluate it; see
    functions/text.shingles_from_tokens), counts folded in codegen
    aggregate(); zero shuffles. At 100 TB this costs the parquet scan.

    Determinism: all three counts are exact BIGINT; the two divisions
    and the constant tree are mirrored operand-for-operand in the
    oracle and rounded at ``digits``.
    """
    base = docs.select(
        id_col, F.col(text_col).alias("__t")
    ).withColumn("__toks", T.tokens(F.lower(F.col("__t"))))
    syll = F.aggregate(
        "__toks",
        F.lit(0).cast("bigint"),
        lambda acc, w: acc
        + F.greatest(
            F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0))),
            F.lit(1),
        ).cast("bigint"),
    )
    sents = F.greatest(
        F.size(F.regexp_extract_all(F.col("__t"), F.lit("[.!?]+"), F.lit(0))),
        F.lit(1),
    ).cast("bigint")
    m = (
        base.filter(F.size("__toks") >= min_words)
        .select(
            id_col,
            F.size("__toks").cast("bigint").alias("n_words"),
            sents.alias("n_sentences"),
            syll.alias("n_syllables"),
        )
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("n_words").cast("double") / F.col("n_sentences"))
        - F.lit(84.6)
        * (F.col("n_syllables").cast("double") / F.col("n_words"))
    )
    return m.withColumn("flesch", round_half_up(flesch, digits))


def heaps_fit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
    digits: int = 6,
) -> DataFrame:
    """Heaps'-law fit of vocabulary growth: OLS of ln(V) on ln(N) over
    ``n_buckets`` cumulative corpus prefixes, where N = tokens seen and
    V = distinct lowercase tokens seen — the one-row companion readout
    to :func:`zipf_fit` (natural corpora grow V ~ k * N^beta with beta
    ~ 0.4-0.6; beta near 1 says unbounded junk vocabulary — serial
    numbers, hashes; beta near 0 says template soup). Output:
    ``(n_points, beta, k_coeff, r2)``.

    Prefix ORDER is a derived random permutation, not ingest order:
    bucket(doc) = md5-uniform(id) mod B (the engine-neutral randomness
    recipe every sampling operator here uses), so the growth curve
    measures the corpus, not the crawl schedule — and the bucketing is
    a map-only expression, never a corpus-wide sort. "First appearance"
    then needs no per-prefix distinct: term t enters the vocabulary at
    min(bucket) over its occurrences, so V(prefix b) is the running sum
    of a B-row frame — one vocab-keyed hash agg (map-side combine),
    never B corpus passes.

    Shape: two aggregations over one token explode — tokens per bucket
    (B keys) and min-bucket per term (vocab-sized, the same exchange
    class as zipf_fit's frequency agg) — then windows/OLS over exactly
    B rows. Determinism: counts exact BIGINT; ln values fixed-pointed
    to 1e-6 units so the five moment sums are exact integers; the
    slope/intercept/r2 float tree is mirrored in the oracle, and
    k_coeff = exp(intercept) of an identical double.
    """
    from momyre_spark.functions.text import tokens

    if not 2 <= n_buckets <= 1024:
        raise ValueError("momyre: n_buckets must be in [2, 1024]")
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
        ).cast("bigint"),
        F.lit(int(n_buckets)),
    )
    toks = docs.select(
        bucket.alias("__b"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("__tok"),
    )
    per_bucket = toks.groupBy("__b").agg(
        F.count(F.lit(1)).cast("bigint").alias("__nt")
    )
    new_terms = (
        toks.groupBy("__tok")
        .agg(F.min("__b").alias("__b"))
        .groupBy("__b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__nv"))
    )
    w = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, 0)
    pts = (
        per_bucket.join(new_terms, "__b", "left")
        .select(
            "__b",
            F.sum("__nt").over(w).alias("__N"),
            F.sum(F.coalesce(F.col("__nv"), F.lit(0))).over(w).alias("__V"),
        )
        .filter((F.col("__N") > 0) & (F.col("__V") > 0))
        .select(
            F.floor(
                F.log(F.col("__N").cast("double")) * F.lit(1_000_000)
                + F.lit(0.5)
            ).cast("bigint").alias("__x"),
            F.floor(
                F.log(F.col("__V").cast("double")) * F.lit(1_000_000)
                + F.lit(0.5)
            ).cast("bigint").alias("__y"),
        )
    )
    agg = pts.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    nd = F.col("__n").cast("double")
    sx, sy = F.col("__sx").cast("double"), F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    covn = nd * sxy - sx * sy
    varx = nd * sxx - sx * sx
    vary = nd * syy - sy * sy
    slope = covn / varx
    intercept = (sy - covn / varx * sx) / nd / F.lit(1_000_000.0)
    r2 = (covn * covn) / (varx * vary)
    return agg.filter((F.col("__n") >= 2) & (varx != 0)).select(
        F.col("__n").cast("bigint").alias("n_points"),
        round_half_up(slope, digits).alias("beta"),
        round_half_up(F.exp(intercept), digits).alias("k_coeff"),
        F.when(vary != 0, round_half_up(r2, digits)).alias("r2"),
    )


def vocab_richness(
    docs: DataFrame,
    text_col: str = "text",
    digits: int = 6,
) -> DataFrame:
    """Vocabulary-richness scalars: Chao1 species-richness estimate and
    the Good-Turing unseen-probability mass, from the corpus's
    frequency-of-frequencies — the "how much vocabulary haven't we seen
    yet" readout that complements :func:`heaps_fit` (that one fits the
    growth CURVE; this one estimates its asymptote and the probability
    the next token is novel). One row: ``(n_tokens, vocab_size,
    hapax_count, dis_count, chao1, gt_unseen_mass)`` where hapax/dis are
    the once- and twice-seen term counts (F1/F2), ``chao1 = V +
    F1*(F1-1)/(2*(F2+1))`` (the bias-corrected form — defined even with
    no doubletons), and ``gt_unseen_mass = F1/N`` (Good 1953).

    Shape at 100 TB: one token explode -> ONE vocab-keyed hash agg
    (map-side combinable, the zipf_fit exchange class) -> one final
    scalar agg over the vocab frame. Nothing beyond the vocab agg ever
    shuffles.

    Determinism: N/V/F1/F2 are exact BIGINTs; chao1 and the unseen mass
    are each ONE mirrored float expression over exact integers, rounded
    at ``digits``.
    """
    from momyre_spark.functions.text import tokens

    term_counts = (
        docs.select(
            F.explode(tokens(F.lower(F.col(text_col)))).alias("__tok")
        )
        .groupBy("__tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__cnt"))
    )
    agg = term_counts.agg(
        F.sum("__cnt").cast("bigint").alias("__N"),
        F.count(F.lit(1)).cast("bigint").alias("__V"),
        F.sum(F.when(F.col("__cnt") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("__F1"),
        F.sum(F.when(F.col("__cnt") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("__F2"),
    )
    chao1 = F.col("__V").cast("double") + (
        F.col("__F1") * (F.col("__F1") - F.lit(1))
    ).cast("double") / (F.lit(2) * (F.col("__F2") + F.lit(1))).cast("double")
    p0 = F.col("__F1").cast("double") / F.col("__N").cast("double")
    return agg.filter(F.col("__N") > 0).select(
        F.col("__N").alias("n_tokens"),
        F.col("__V").alias("vocab_size"),
        F.col("__F1").alias("hapax_count"),
        F.col("__F2").alias("dis_count"),
        round_half_up(chao1, digits).alias("chao1"),
        round_half_up(p0, digits).alias("gt_unseen_mass"),
    )


def term_burstiness(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 50,
    min_df: int = 2,
    digits: int = 6,
) -> DataFrame:
    """Per-term burstiness (Church & Gale's mean within-document rate):
    for the ``top_k`` terms by collection frequency, ``(term, cf, df,
    burstiness = cf/df)`` — cf the total occurrence count, df the
    document count. A content word occurs many times in few documents
    (burstiness well above 1); boilerplate/template terms occur once
    per document everywhere (burstiness ~ 1 with giant df) — the cheap
    structural signal for navigation chrome and injected banners that
    per-document quality scores miss.

    Shape at 100 TB: one token explode -> ONE (term, doc) pre-agg ->
    the (cf, df) agg from that frame (df = count of the pre-agg rows,
    cf = sum of their per-doc counts — NO count-distinct over raw
    occurrences), then a global top-k that plans as
    TakeOrderedAndProject (per-partition heaps + a k-row driver merge),
    never a vocabulary sort.

    Determinism: cf/df exact BIGINTs; ties at the top-k boundary break
    by term; the single division rounds at ``digits``.
    """
    from momyre_spark.functions.text import tokens

    if top_k > 10_000_000:
        raise ValueError(
            "momyre: top_k merges partitions*k rows on the driver; keep it "
            "bounded (<= 10M)"
        )
    per_doc = (
        docs.select(
            F.col(id_col).alias("__id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("__tok"),
        )
        .groupBy("__tok", "__id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    stats = per_doc.groupBy("__tok").agg(
        F.sum("__c").cast("bigint").alias("cf"),
        F.count(F.lit(1)).cast("bigint").alias("df"),
    )
    return (
        stats.filter(F.col("df") >= int(min_df))
        .orderBy(F.col("cf").desc(), F.col("__tok"))
        .limit(int(top_k))
        .select(
            F.col("__tok").alias("term"),
            "cf",
            "df",
            round_half_up(
                F.col("cf").cast("double") / F.col("df").cast("double"),
                digits,
            ).alias("burstiness"),
        )
    )
