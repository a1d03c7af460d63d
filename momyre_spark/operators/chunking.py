"""Document chunking: sliding token windows for training-context packing.

Long documents must be cut into model-context-sized pieces before packing
(`operators/sampling.pack_sequences` bins whole documents; this operator
produces the pieces). The unit is the whitespace token
(`functions/text.tokens`), the window/stride contract is the standard
overlapping-windows one: chunk ``i`` covers tokens
``[i*stride, i*stride + window)``; starts run every ``stride`` tokens while
they are still inside the document, so trailing chunks may be shorter than
``window`` (flagged via ``n_chunk_tokens``). ``stride < window`` gives
overlapping chunks (context carry-over), ``stride == window`` a partition.

Plan shape: tokenize -> generate the start index array -> posexplode ->
slice. Map-only (one narrow explode, no shuffle, no UDF): at 100 TB this
fuses into the scan and parallelizes by input split. The token array is
materialized ONCE per row before the per-chunk lambda references it —
Catalyst does not CSE subexpressions into HOF loops (see
functions/text.shingles_from_tokens for the measured 17x).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from momyre_spark.functions.text import tokens


def chunk_documents(
    df: DataFrame,
    window: int,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode each document into sliding token-window chunks.

    Returns one row per chunk: the source ``id_col``, ``chunk_id`` (0-based,
    in token order), ``chunk_text`` (tokens re-joined with single spaces),
    and ``n_chunk_tokens``. Zero-token documents produce no chunks.
    """
    if stride is None:
        stride = window
    if window <= 0 or stride <= 0:
        raise ValueError("momyre: window and stride must be positive")
    out = df.withColumn("__toks", tokens(F.col(text_col)))
    n = F.size("__toks")
    # starts: 0, stride, 2*stride, ... strictly below n (empty doc -> none)
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.floor((n - 1) / F.lit(stride)).cast("int") + 1
    )
    starts = F.when(n_chunks <= 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), n_chunks - 1)
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") * stride + 1, window)
    return (
        out.select(
            id_col,
            F.posexplode(starts).alias("chunk_id", "__start"),
            "__toks",
        )
        .withColumn("__chunk", chunk)
        .select(
            id_col,
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.concat_ws(" ", "__chunk").alias("chunk_text"),
            F.size("__chunk").cast("bigint").alias("n_chunk_tokens"),
        )
    )
