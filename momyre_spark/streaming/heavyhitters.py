"""Streaming heavy hitters: a hash-bucketed Misra-Gries summary maintained
across micro-batches with bounded state.

The batch operator (operators/heavyhitters.frequent_items) gets exactness
from a second recount scan — a luxury a stream does not have. The streaming
form keeps the classical summary guarantee instead: after any prefix of the
stream, every item with running frequency >= support * N is present in the
state, with its count under-estimated by at most N_bucket / counters.

Distribution shape: items are routed to ``num_buckets`` hash buckets
(``xxhash64(item) % B``) and each bucket's ``applyInPandasWithState`` group
maintains ONE Misra-Gries summary of the items it owns. Buckets partition
the item universe disjointly, so an item's global count equals its bucket
count and the per-bucket MG guarantee (survives if freq > n_bucket /
counters) implies the global one whenever ``counters >= 1 / support`` —
same math as the batch operator, now with state bounded to B * counters
(item, count) pairs however long the stream runs and however many distinct
items pass. B scales the shuffle parallelism, not the guarantee.

Output (``update`` mode): each batch, a bucket that changed re-emits its
surviving candidates as ``(item, min_count, max_count, bucket)`` —
``min_count`` is the MG counter (never over the truth by construction;
under by at most the bucket's total decrement ``err``), ``max_count`` =
``min_count + err`` bounds the truth from above. A downstream exact pass
(the batch operator's recount) can confirm any candidate when an exact
answer is required.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("err", LongType()),  # total decrement: max undercount
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("item", StringType()),
        StructField("min_count", LongType()),
        StructField("max_count", LongType()),
        StructField("bucket", IntegerType()),
    ]
)


def _mg_fold(counts: dict[str, int], batch: pd.Series, counters: int,
             err: int) -> tuple[dict[str, int], int]:
    """Fold a batch of items into an MG summary; returns (counts, err)."""
    for item, c in batch.value_counts().items():
        counts[item] = counts.get(item, 0) + int(c)
    if len(counts) > counters:
        cut = sorted(counts.values(), reverse=True)[counters - 1]
        counts = {k: v - cut for k, v in counts.items() if v - cut > 0}
        err += cut
    return counts, err


def heavy_hitters_stream(
    stream_df: DataFrame,
    item_col: str,
    counters: int = 64,
    num_buckets: int = 32,
) -> DataFrame:
    """Maintain streaming heavy-hitter candidates for ``item_col``.

    ``counters`` per bucket bounds state; choose ``counters >= 1/support``
    for the target support level (e.g. 100 counters tracks every item above
    1% of its bucket). Returns an update-mode stream of
    ``(item, min_count, max_count, bucket)``.
    """
    if counters < 1:
        raise ValueError("counters must be >= 1")
    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")

    routed = stream_df.select(
        F.col(item_col).cast("string").alias("item")
    ).filter(F.col("item").isNotNull()).withColumn(
        "bucket",
        (F.pmod(F.xxhash64("item"), F.lit(num_buckets))).cast("int"),
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, cnts, err = state.get
            counts = dict(zip(items, cnts))
        else:
            counts, err = {}, 0
        changed = False
        for pdf in pdfs:
            if pdf.empty:
                continue
            counts, err = _mg_fold(counts, pdf["item"], counters, err)
            changed = True
        if not changed:
            return
        state.update((list(counts.keys()), list(counts.values()), err))
        yield pd.DataFrame(
            {
                "item": list(counts.keys()),
                "min_count": pd.Series(list(counts.values()), dtype="int64"),
                "max_count": pd.Series(
                    [v + err for v in counts.values()], dtype="int64"
                ),
                "bucket": pd.Series([key[0]] * len(counts), dtype="int32"),
            }
        )

    return routed.groupBy("bucket").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
