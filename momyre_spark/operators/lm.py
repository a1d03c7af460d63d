"""Corpus unigram language model: train token log-probabilities in one
aggregation, score documents by mean log-probability.

The classic cheap quality/outlier signal for corpus curation (CCNet-style
"perplexity" filtering, with the corpus itself as the LM): documents whose
tokens are globally rare score low; boilerplate-heavy or dictionary-word
documents score high. A real KenLM is out of scope for a SQL engine; the
unigram model is the piece that IS a pure aggregation problem, and the
filter downstream only needs a monotone score.

Determinism contract (the reason for the DECIMAL dance): ``ln`` of a count
ratio is irrational, and summing doubles is ordering-sensitive, so a naive
avg(ln p) would differ between runs and engines in the last bits. Instead
each DISTINCT token's logprob is rounded ONCE to 6 decimals and fixed as
DECIMAL(18,6); per-document sums of count*logprob are then exact decimal
arithmetic — order-independent, engine-identical — and only the final
per-token mean returns to double (round4). The oracle replays the identical
pipeline in SQL.

Scale: training is explode + one hash aggregation on token (partial maps
absorb the zipf head: every mapper pre-counts 'the' locally). Scoring joins
per-(doc, token) counts against the vocab — zipf-skewed on the probe side
but combined per doc first, and the vocab frame (distinct tokens, a few
million rows for a 100 TB web corpus) broadcasts by default; set
``broadcast_vocab=False`` to shuffle-join a vocabulary too large to ship.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from momyre_spark.functions.text import tokens


def _round6(col: Column) -> Column:
    return (F.floor(col * 1_000_000 + F.lit(0.5)) / F.lit(1_000_000.0)).cast(
        "decimal(18,6)"
    )


def train_unigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    smoothing_k: float = 0.0,
) -> DataFrame:
    """Token -> (count, logprob) over the whole corpus.

    ``smoothing_k=0`` (default): MLE, ``logprob = round6(ln c - ln total)``;
    tokens below ``min_count`` are dropped (scoring treats them as OOV and
    excludes them from the mean).

    ``smoothing_k>0``: add-k smoothing over the kept vocabulary V,
    ``logprob = round6(ln(c+k) - ln(total + k*(V+1)))`` — the +1 reserves
    one pseudo-type for OOV, whose logprob ``ln k - ln(total+k*(V+1))`` is
    what :func:`score_documents` charges unseen tokens when the LM was
    trained on a different corpus. Scoring new data with a trained LM
    needs this; scoring a corpus against itself does not.
    """
    tok = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
    )
    total = tok.agg(
        F.sum("count").alias("__total"),
        F.count(F.lit(1)).alias("__vocab"),
    )
    if smoothing_k > 0:
        k = F.lit(float(smoothing_k))
        denom = F.log(F.col("__total") + k * (F.col("__vocab") + 1))
        lp = _round6(F.log(F.col("count") + k) - denom)
        oov = _round6(F.log(k) - denom)
    else:
        lp = _round6(F.log("count") - F.log("__total"))
        oov = F.lit(None).cast("decimal(18,6)")
    return tok.join(F.broadcast(total)).select(
        "token", "count", lp.alias("logprob"), oov.alias("oov_logprob")
    )


def score_documents(
    docs: DataFrame,
    lm: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document mean token log-probability under the unigram LM.

    Returns ``(id_col, n_tokens, n_oov, mean_logprob)``; ``mean_logprob``
    averages over in-vocabulary tokens only (NULL when all tokens are OOV)
    and is round4-double. Lower = rarer-token document.
    """
    if lm is None:
        lm = train_unigram_lm(docs, text_col=text_col)
    oov_lp = None
    if "oov_logprob" in lm.columns:
        first = lm.select("oov_logprob").first()
        oov_lp = first["oov_logprob"] if first is not None else None
    vocab = lm.select("token", "logprob")
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    per_term = (
        docs.select(id_col, F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    joined = per_term.join(vocab, "token", "left")
    in_vocab = F.col("logprob").isNotNull()
    agg = joined.groupBy(id_col).agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        F.sum(F.when(~in_vocab, F.col("tf")).otherwise(0))
        .cast("bigint")
        .alias("n_oov"),
        F.sum(F.when(in_vocab, F.col("tf")).otherwise(0)).alias("__n_iv"),
        F.sum(
            F.when(in_vocab, F.col("logprob") * F.col("tf")).otherwise(
                F.lit(0).cast("decimal(18,6)")
            )
        ).alias("__lp_sum"),
    )
    from momyre_spark.functions.numeric import round_half_up

    if oov_lp is not None:
        # smoothed LM: OOV tokens are charged the reserved pseudo-type mass
        # and INCLUDED in the mean (the trained-LM-on-new-data contract)
        total_lp = (
            F.col("__lp_sum")
            + F.col("n_oov") * F.lit(oov_lp).cast("decimal(18,6)")
        )
        mean = round_half_up(
            total_lp.cast("double") / F.col("n_tokens"), 4
        )
    else:
        mean = F.when(
            F.col("__n_iv") > 0,
            round_half_up(
                F.col("__lp_sum").cast("double") / F.col("__n_iv"), 4
            ),
        )
    return agg.select(id_col, "n_tokens", "n_oov", mean.alias("mean_logprob"))


def source_divergence(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """KL(source || corpus) over unigram distributions — the corpus-mixing
    diagnostic: a source whose token distribution diverges hard from the
    blend (boilerplate farms, non-prose dumps, wrong-language pockets)
    shows up as a high-KL outlier before it ever reaches training.

    Per source s: ``KL_s = sum_t p_s(t) * ln(p_s(t) / p(t))`` with
    ``p_s = c_st / T_s`` and ``p = c_t / T``. Determinism follows the
    module's DECIMAL contract: each (source, token) term is rounded once to
    DECIMAL(18,8), the per-source sum is exact decimal arithmetic, and only
    the final KL returns to double (round4).

    Shape: one explode + three hash aggregations; the vocab and per-source
    totals broadcast back onto the (source, token) frame — no join ever
    shuffles more than the distinct (source, token) pairs.
    """
    from momyre_spark.functions.numeric import round_half_up

    tok = docs.select(
        F.col(source_col).alias("src"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    per_st = tok.groupBy("src", "token").agg(
        F.count(F.lit(1)).alias("c_st")
    )
    per_s = per_st.groupBy(F.col("src").alias("src_t")).agg(
        F.sum("c_st").alias("t_s")
    )
    per_t = per_st.groupBy("token").agg(F.sum("c_st").alias("c_t"))
    total = per_t.agg(F.sum("c_t").alias("t_all"))
    p_s = F.col("c_st") / F.col("t_s")
    p = F.col("c_t") / F.col("t_all")
    term6 = (
        F.floor((p_s * (F.log(p_s) - F.log(p))) * 100_000_000 + F.lit(0.5))
        / F.lit(100_000_000.0)
    ).cast("decimal(18,8)")
    return (
        per_st.join(F.broadcast(per_s), F.col("src") == F.col("src_t"))
        .join(F.broadcast(per_t), "token")
        .join(F.broadcast(total))
        .groupBy(F.col("src").alias("source"))
        .agg(
            F.sum(term6).alias("__kl"),
            F.sum("c_st").cast("bigint").alias("n_tokens"),
        )
        .select(
            "source",
            "n_tokens",
            round_half_up(F.col("__kl").cast("double"), 4).alias("kl_divergence"),
        )
    )


def _bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, prev, cur) for every adjacent token pair — ONE zip_with over
    the token array then one explode (never a self-join on position)."""
    w = docs.withColumn("__w", tokens(F.col(text_col))).filter(
        F.size("__w") >= 2
    )
    pair = F.zip_with(
        F.expr("slice(__w, 1, size(__w) - 1)"),
        F.expr("slice(__w, 2, size(__w) - 1)"),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    return w.select(F.col(id_col), F.explode(pair).alias("pc")).select(
        id_col, F.col("pc.prev").alias("prev"), F.col("pc.cur").alias("cur")
    )


def train_bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    lam: float = 0.7,
) -> DataFrame:
    """Interpolated bigram LM over the corpus:
    ``logprob(prev, cur) = round6(ln(lam·P(cur|prev) + (1−lam)·P(cur)))``
    with both distributions estimated from the bigram table (P(cur) is the
    right-marginal). The next step up from the unigram quality signal:
    word-salad documents whose TOKENS are common but whose TRANSITIONS are
    not score visibly lower.

    Same determinism contract as the unigram LM: each distinct (prev, cur)
    logprob is rounded once to DECIMAL(18,6); document sums are exact
    decimal arithmetic. The interpolation constants are evaluated as
    ``lam`` and ``1.0 - lam`` in doubles — an oracle must spell the second
    one the same way (``1.0 - 0.7``, never the literal ``0.3``, which is a
    DIFFERENT double).

    Scale: TWO corpus passes — one builds the distinct-bigram counts and
    chains both marginals as windows over that vocab-sized frame (the
    join-back formulation re-ran the dominant explode once per marginal
    — 4 passes); the second computes the broadcast 1-row grand total."""
    from pyspark.sql.window import Window as _W

    bg = _bigrams(docs, text_col, "doc_id") if "doc_id" in docs.columns else (
        _bigrams(docs.withColumn("__id", F.monotonically_increasing_id()),
                 text_col, "__id")
    )
    c_pc = bg.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("count"))
    tot = c_pc.agg(F.sum("count").alias("__t"))
    mix = F.lit(float(lam)) * (F.col("count") / F.col("__cp")) + (
        F.lit(1.0) - F.lit(float(lam))
    ) * (F.col("__cc") / F.col("__t"))
    return (
        c_pc.withColumn(
            "__cp", F.sum("count").over(_W.partitionBy("prev"))
        )
        .withColumn("__cc", F.sum("count").over(_W.partitionBy("cur")))
        .crossJoin(F.broadcast(tot))
        .select("prev", "cur", "count", _round6(F.log(mix)).alias("logprob"))
    )


def score_documents_bigram(
    docs: DataFrame,
    lm: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document mean bigram log-probability.

    Returns ``(id_col, n_bigrams, mean_logprob)`` over documents with >= 2
    tokens; self-scoring has no OOV bigrams by construction (a trained-LM
    cross-corpus variant would charge unseen transitions the unigram
    backoff — compose with train_unigram_lm's smoothing for that)."""
    from momyre_spark.functions.numeric import round_half_up

    if lm is None:
        lm = train_bigram_lm(docs, text_col=text_col, lam=lam)
    vocab = lm.select("prev", "cur", "logprob")
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    pt = (
        _bigrams(docs, text_col, id_col)
        .groupBy(id_col, "prev", "cur")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        pt.join(vocab, ["prev", "cur"])
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("logprob") * F.col("tf")).alias("__s"),
        )
        .select(
            id_col,
            "n_bigrams",
            round_half_up(
                F.col("__s").cast("double") / F.col("n_bigrams"), 4
            ).alias("mean_logprob"),
        )
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    digits: int = 6,
) -> DataFrame:
    """Pointwise-mutual-information collocations over the corpus bigram
    table: ``pmi(a, b) = ln(N * c_ab / (c_a * c_b))`` with the left/right
    bigram-table marginals, plus the normalized form
    ``npmi = pmi / -ln(c_ab / N)`` (1 = perfect association, 0 =
    independent) — the standard multi-word-expression / collocation
    extraction signal ("new york" vs "new the"). Output one row per
    surviving distinct bigram: ``(prev, cur, count, pmi, npmi)``.

    ``min_count`` prunes rare bigrams from the OUTPUT only — marginals
    are computed over the full table first (a PMI against truncated
    marginals would be inflated), then the filter cuts the join input,
    so the expensive joins touch only candidates.

    Shape: TWO corpus passes total — one builds the distinct-bigram
    counts and chains both marginals as windows over that vocab-sized
    frame (no join-back, so the dominant explode never re-runs per
    marginal); the second computes the 1-row grand total, broadcast on.
    (The join formulation re-scans the corpus once per marginal — 4x
    the dominant cost.)

    Determinism: all counts exact BIGINT (keep ``N * max(c) < 2^63``);
    pmi/npmi are mirrored float trees over exactly-converted integers,
    rounded at ``digits``. npmi is NULL when ``c_ab = N`` (single
    distinct bigram — the normalizer is 0).
    """
    if min_count < 1:
        raise ValueError("momyre: min_count must be >= 1")
    from pyspark.sql.window import Window as _W

    bg = _bigrams(docs, text_col, "doc_id") if "doc_id" in docs.columns else (
        _bigrams(docs.withColumn("__id", F.monotonically_increasing_id()),
                 text_col, "__id")
    )
    c_pc = bg.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("count"))
    tot = c_pc.agg(F.sum("count").alias("__t"))
    cand = (
        c_pc.withColumn(
            "__cp", F.sum("count").over(_W.partitionBy("prev"))
        )
        .withColumn("__cc", F.sum("count").over(_W.partitionBy("cur")))
        .filter(F.col("count") >= min_count)
        .crossJoin(F.broadcast(tot))
    )
    c = F.col("count")
    ratio = (F.col("__t") * c).cast("double") / (
        F.col("__cp") * F.col("__cc")
    ).cast("double")
    pmi_raw = F.log(ratio)
    denom = -F.log(c.cast("double") / F.col("__t").cast("double"))
    return cand.select(
        "prev",
        "cur",
        "count",
        _round6(pmi_raw).cast("double").alias("pmi"),
        F.when(denom != 0, _round6(pmi_raw / denom))
        .cast("double")
        .alias("npmi"),
    )


def cross_score_bigram(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
    broadcast_lm: bool = True,
) -> DataFrame:
    """Cross-corpus bigram LM scoring — train on corpus A, score corpus B
    (the CCNet/KenLM-style in-domain quality filter: score a crawl under
    a trusted corpus's LM and keep what reads like the target domain).
    Unlike :func:`score_documents_bigram`'s self-scoring inner join, an
    UNSEEN transition is charged the add-one-smoothed unigram backoff
    instead of silently vanishing from the sum:

        logprob(prev, cur) = round6(ln(lam*P_big + (1-lam)*P_uni))
        P_big = c_ab / c_a               (0.0 if prev or pair unseen)
        P_uni = (c_cur + 1) / (T + V + 1)  (add-one; OOV cur -> 1/(T+V+1))

    with c_* from the TRAIN bigram table, T its total count, V its
    distinct-cur vocabulary. Output per eval doc with >= 2 tokens:
    ``(id_col, n_bigrams, mean_logprob)``.

    Shape: the train corpus collapses to its vocab-sized bigram/marginal
    tables (the train_bigram_lm plan); the eval corpus is never
    shuffled when ``broadcast_lm`` — three broadcast left joins onto the
    per-doc bigram counts plus two broadcast 1-row totals. Set
    ``broadcast_lm=False`` for a train vocabulary too large to ship,
    which falls back to shuffle hash joins on the token keys.

    Determinism: each distinct (prev, cur) logprob is one mirrored float
    tree rounded once to DECIMAL(18,6); per-doc sums are exact decimal.
    An oracle must spell the unigram weight as ``1.0 - lam`` (the
    pre-folded literal is a different double).
    """
    bg_train = _bigrams(
        train_docs, text_col, id_col
    ) if id_col in train_docs.columns else _bigrams(
        train_docs.withColumn("__id", F.monotonically_increasing_id()),
        text_col,
        "__id",
    )
    c_pc = bg_train.groupBy("prev", "cur").agg(
        F.count(F.lit(1)).alias("__c")
    )
    c_p = c_pc.groupBy("prev").agg(F.sum("__c").alias("__cp"))
    c_c = c_pc.groupBy("cur").agg(F.sum("__c").alias("__cc"))
    tot = c_pc.agg(F.sum("__c").cast("bigint").alias("__t"))
    voc = c_c.agg(F.count(F.lit(1)).cast("bigint").alias("__v"))
    if broadcast_lm:
        c_pc, c_p, c_c = F.broadcast(c_pc), F.broadcast(c_p), F.broadcast(c_c)
    pt = (
        _bigrams(eval_docs, text_col, id_col)
        .groupBy(id_col, "prev", "cur")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    p_big = F.when(
        F.col("__c").isNotNull(),
        F.col("__c").cast("double") / F.col("__cp").cast("double"),
    ).otherwise(F.lit(0.0))
    p_uni = (F.coalesce(F.col("__cc"), F.lit(0)) + F.lit(1)).cast(
        "double"
    ) / (F.col("__t") + F.col("__v") + F.lit(1)).cast("double")
    mix = F.lit(float(lam)) * p_big + (F.lit(1.0) - F.lit(float(lam))) * p_uni
    scored = (
        pt.join(c_p, "prev", "left")
        .join(c_pc, ["prev", "cur"], "left")
        .join(c_c, "cur", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(voc))
        .withColumn("__lp", _round6(F.log(mix)))
    )
    from momyre_spark.functions.numeric import round_half_up

    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("tf").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("__lp") * F.col("tf")).alias("__s"),
        )
        .select(
            id_col,
            "n_bigrams",
            round_half_up(
                F.col("__s").cast("double") / F.col("n_bigrams"), 4
            ).alias("mean_logprob"),
        )
    )
