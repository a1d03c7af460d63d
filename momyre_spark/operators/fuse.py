"""Rank fusion: combine independent retrieval rankings into one list.

Reciprocal Rank Fusion (Cormack et al., SIGIR 2009): fused(d) = sum over
rankings r of 1/(k0 + rank_r(d)). The standard way to combine a lexical
(BM25) and a semantic (embedding-cosine) retriever without score
calibration — only ranks enter, so the two scores' incompatible scales
don't matter. k0=60 is the paper's robust default.

Determinism: ranks are integers, each contribution is ONE IEEE division,
and the contributions are added in the fixed argument order — engine-
identical without any decimal dance.

Scale: each ranking is usually a per-query top-k (small); the fusion is a
full-outer join on the item id + a map-side sum. Items missing from a
ranking contribute 0 (equivalently rank -> infinity).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = 60,
) -> DataFrame:
    """Fuse rankings (each ``(id_col, rank_col)``, rank 1-based) into
    ``(id_col, rrf_score, rank)`` ordered by fused score.

    ``rrf_score`` is left un-rounded (sum of at most len(rankings) fixed-
    order divisions); callers that need a cross-engine-stable projection
    round it once at the edge.
    """
    if not rankings:
        raise ValueError("momyre: rrf_fuse needs at least one ranking")
    named = [
        r.select(
            F.col(id_col), F.col(rank_col).alias(f"__r{i}")
        )
        for i, r in enumerate(rankings)
    ]
    joined = reduce(lambda a, b: a.join(b, id_col, "full_outer"), named)
    contribs = [
        F.when(
            F.col(f"__r{i}").isNotNull(),
            F.lit(1.0) / (F.lit(float(k0)) + F.col(f"__r{i}")),
        ).otherwise(F.lit(0.0))
        for i in range(len(rankings))
    ]
    score = reduce(lambda a, b: a + b, contribs)
    out = joined.select(id_col, score.alias("rrf_score"))
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("rrf_score"), F.col(id_col))
    return out.withColumn("rank", F.row_number().over(w))
