"""Exact heavy hitters with bounded memory: Misra-Gries candidates + one
exact recount pass.

A plain ``groupBy(col).count().filter(cnt >= s*N)`` is exact but shuffles
EVERY distinct value — at 100 TB of tokens/URLs/user-ids the shuffle is
sized by the long tail that can never be a heavy hitter. The classical fix
is the two-phase summary algorithm:

1. **Candidates (map-only).** Each partition runs a Misra-Gries summary
   with ``ceil(candidate_factor / support)`` counters. MG's guarantee:
   any item with partition frequency > partition_size / counters survives
   the summary — so any GLOBAL item with frequency >= support * N
   survives in at least one partition's summary. The union of summaries
   is a SUPERSET of the true heavy hitters, sized O(partitions *
   counters), independent of distinct-value cardinality.
2. **Exact recount (one broadcast semi-join + agg).** The candidate set
   broadcasts; the source is re-scanned counting ONLY candidate rows, and
   the exact global counts filter at the true threshold. No approximation
   survives to the output — the summary only bounded the shuffle.

Phase 1 is ``mapInPandas`` (Arrow batches into a Counter, trimmed MG-style
— vectorized value_counts per batch, counter arithmetic per batch, not per
row). Total cost: two scans, zero wide shuffles of the tail.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_items(
    df: DataFrame,
    col: str,
    support: float,
    candidate_factor: float = 2.0,
) -> DataFrame:
    """All values of ``col`` with global frequency >= ``support`` * N,
    with their EXACT counts — ``(item, cnt)``, deterministic.

    ``support`` in (0, 1]; ``candidate_factor`` > 1 widens the per-
    partition summary (more memory, fewer spurious candidates to recount).
    NULL values are excluded (they are not items); N counts all rows.
    The partition summaries carry their row counts, so N needs no separate
    pass — exactly two scans total.
    """
    if not (0 < support <= 1):
        raise ValueError(f"support must be in (0, 1], got {support}")
    counters = max(1, math.ceil(candidate_factor / support))

    def mg_summaries(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            for item, c in pdf[col].value_counts().items():
                counts[item] = counts.get(item, 0) + int(c)
            if len(counts) > counters:
                # MG decrement: subtract the (len-counters)-th largest count
                # from everyone; drop the non-positive. One vectorized pass.
                cut = sorted(counts.values(), reverse=True)[counters - 1]
                counts = {
                    k: v - cut for k, v in counts.items() if v - cut > 0
                }
        # candidate rows + ONE total-carrier row per partition (item NULL),
        # so N needs no separate count() pass over the data
        yield pd.DataFrame(
            {col: list(counts.keys()) + [None], "__n": [0] * len(counts) + [n_rows]}
        )

    summary_schema = df.select(col).schema.add("__n", "long")
    summaries = df.select(col).mapInPandas(mg_summaries, schema=summary_schema)
    summaries = summaries.localCheckpoint(eager=True)  # one phase-1 pass
    total = summaries.agg(F.sum("__n")).collect()[0][0] or 0
    candidates = summaries.filter(F.col(col).isNotNull()).select(col).distinct()

    threshold = math.ceil(support * total)
    return (
        df.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= threshold)
        .orderBy(F.desc("cnt"), col)
    )
