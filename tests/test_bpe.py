"""Learned-BPE tokenizer: classical merge order, generalization to unseen
words, distributed apply parity and determinism."""

from __future__ import annotations

from pyspark.sql import Row

from momyre_spark.operators.bpe import (
    bpe_encode,
    encode_word,
    train_bpe,
)


def _toy_corpus(spark):
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    return spark.createDataFrame([Row(doc_id=0, text=" ".join(words))])


def test_training_follows_classical_merge_order(spark):
    """The canonical BPE worked example: on {low x5, lower x2, newest x6,
    widest x3} the first merges are (e,s) -> (es,t) -> (est,</w>) -> (l,o),
    by exact pair counts with lexicographic tie-breaks."""
    merges = train_bpe(_toy_corpus(spark), num_merges=4)
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")]


def test_encode_generalizes_to_unseen_word(spark):
    """'lowest' never occurs in the corpus, but the learned units 'low' and
    'est</w>' compose it — the whole point of subword tokenization."""
    merges = train_bpe(_toy_corpus(spark), num_merges=30)
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("newest", ranks) == ["newest</w>"]
    assert encode_word("lowest", ranks) == ["low", "est</w>"]


def test_encode_reconstructs_text(spark):
    """Concatenated tokens (with </w> as the word boundary) reproduce the
    lowercased pre-token stream exactly — tokenization is lossless."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="The newest lower bound, clearly!"),
            Row(doc_id=2, text="widest low 123 low"),
            Row(doc_id=3, text=""),
        ]
    )
    merges = train_bpe(_toy_corpus(spark), num_merges=30)
    out = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    import re

    pretok = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")
    for did, text in [(1, "The newest lower bound, clearly!"),
                      (2, "widest low 123 low"), (3, "")]:
        words = pretok.findall(text.lower())
        rebuilt = "".join(out[did]["tokens"]).replace("</w>", "|").rstrip("|")
        assert rebuilt == "|".join(words), (did, rebuilt)
        assert out[did]["n_pretokens"] == len(words)
        assert out[did]["n_bpe_tokens"] >= out[did]["n_pretokens"] or not words


def test_apply_deterministic_across_partitioning(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"newest doc {i} with lower text") for i in range(40)]
    )
    merges = train_bpe(_toy_corpus(spark), num_merges=20)
    a = {r["doc_id"]: r["n_bpe_tokens"]
         for r in bpe_encode(docs.repartition(1), merges).collect()}
    b = {r["doc_id"]: r["n_bpe_tokens"]
         for r in bpe_encode(docs.repartition(13), merges).collect()}
    assert a == b


def test_training_compresses_real_documents(spark):
    """On the fixture corpus, a learned 200-merge vocabulary must tokenize
    to FEWER tokens than characters and no fewer than pre-tokens, and more
    merges can only help (monotone non-increasing token count)."""
    from tests.conftest import SF_CORRECT

    from momyre_spark.sources.parquet import load_table

    docs = load_table(spark, SF_CORRECT, "documents").limit(200)
    m_small = train_bpe(docs, num_merges=50)
    m_big = train_bpe(docs, num_merges=200)
    assert m_small == m_big[:50]  # training order is a prefix property
    small = bpe_encode(docs, m_small).agg({"n_bpe_tokens": "sum"}).collect()[0][0]
    big = bpe_encode(docs, m_big).agg({"n_bpe_tokens": "sum"}).collect()[0][0]
    pre = bpe_encode(docs, m_big).agg({"n_pretokens": "sum"}).collect()[0][0]
    assert big <= small
    assert big >= pre
