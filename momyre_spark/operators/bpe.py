"""Learned byte-pair-encoding tokenizer: distributed corpus statistics,
driver-side merge training, distributed application.

``bpe_ish_count`` (functions/text.py) counts tokens with a GPT-2-style
pre-tokenizer regex but no learned vocabulary. This module adds the real
thing, in the shape every large corpus forces:

1. **Word frequencies (cluster, one shuffle).** Pre-tokenize (lowercased
   word / number / punctuation runs — the same regex as ``bpe_ish_count``)
   and count word TYPES: ``explode -> groupBy(word).count()``, truncated to
   the ``max_word_types`` most frequent types. BPE training famously needs
   only the type-frequency table, never the corpus — 100 TB of text
   reduces to ~10^5 (word, count) rows.
2. **Merge loop (driver, pure Python).** Classical BPE over the frequency
   table: repeatedly merge the highest-count symbol pair, ties broken
   lexicographically so training is deterministic regardless of dict
   order. ``num_merges`` iterations over at most ``max_word_types`` short
   words — milliseconds, no reason to distribute.
3. **Apply (cluster, map-only).** The ranked merge table broadcasts
   (pickled closure); an Arrow-batched ``mapInPandas`` encodes each
   document with a per-batch word cache — each distinct word in a batch is
   encoded once, not once per occurrence.

The learned tokenizer lives entirely in the merge list — a plain
``list[tuple[str, str]]`` that can be persisted and shipped; no state on
the cluster.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# mirror of functions/text.bpe_ish_count's pre-tokenizer
_PRETOK = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")
_END = "</w>"  # end-of-word marker: merges cannot cross word boundaries


def _word_freqs(
    docs: DataFrame, text_col: str, max_word_types: int
) -> list[tuple[str, int]]:
    """(word, count) for the ``max_word_types`` most frequent word types.
    One explode + one hash-agg shuffle; the result is the ONLY thing that
    leaves the cluster."""
    words = docs.select(
        F.explode(
            F.expr(
                f"regexp_extract_all(lower({text_col}), "
                "'[a-z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0)"
            )
        ).alias("w")
    )
    top = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(max_word_types)
        .collect()
    )
    return [(r["w"], r["c"]) for r in top]


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_word_types: int = 20_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Deterministic:
    exact integer pair counts, ties broken by the pair's lexicographic
    order.

    Stops EARLY when the best remaining pair occurs only once — a merge
    seen in a single word type cannot compress anything else, so (unlike
    classical BPE, which merges count-1 pairs too) training may return
    fewer than ``num_merges`` merges on a small or low-diversity corpus.
    Size vocabulary expectations accordingly."""
    freqs = _word_freqs(docs, text_col, max_word_types)
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (_END,): c for w, c in freqs
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for symbols, c in vocab.items():
            for i in range(len(symbols) - 1):
                p = (symbols[i], symbols[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break  # nothing left worth merging
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for symbols, c in vocab.items():
            out, i = [], 0
            while i < len(symbols):
                if (
                    i < len(symbols) - 1
                    and symbols[i] == best[0]
                    and symbols[i + 1] == best[1]
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one pre-token with the learned merges: repeatedly apply the
    LOWEST-RANK applicable merge (the exact training order)."""
    symbols = list(word) + [_END]
    while len(symbols) > 1:
        best_rank, best_i = None, -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document: ``(id, n_pretokens, n_bpe_tokens, tokens)``.
    Map-only; each Arrow batch keeps a word->encoding cache so a word type
    is encoded once per batch however often it occurs."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def enc(word: str) -> list[str]:
            got = cache.get(word)
            if got is None:
                got = cache[word] = encode_word(word, ranks)
            return got

        for pdf in batches:
            ids, npre, nbpe, toks = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = _PRETOK.findall((text or "").lower())
                tokens: list[str] = []
                for w in words:
                    tokens.extend(enc(w))
                ids.append(int(did))
                npre.append(len(words))
                nbpe.append(len(tokens))
                toks.append(tokens)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "n_pretokens": pd.Series(npre, dtype="int64"),
                    "n_bpe_tokens": pd.Series(nbpe, dtype="int64"),
                    "tokens": pd.Series(toks, dtype="object"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        run,
        schema=f"{id_col} long, n_pretokens long, n_bpe_tokens long, "
        "tokens array<string>",
    )
