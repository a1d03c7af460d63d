"""Record linkage: blocked edit-distance entity matching.

The entity-resolution primitive: find record pairs whose key string (name,
title, address line) is within a small edit distance — duplicate customers
after a typo, the same paper with an OCR error, two crawls of one product
page. All-pairs Levenshtein is quadratic and dead at corpus scale; the
standard shape is BLOCKING (cheap equi-join keys that any true match
shares with high probability) followed by exact verification on the
candidates only.

Blocking keys here: the ``prefix_len``-char prefix and the ``suffix_len``-
char suffix. An edit confined to the suffix leaves the prefix block
intact; an edit at the start leaves the suffix block intact — so any
single-region typo is caught. The documented miss: edits touching BOTH
ends simultaneously (for max_distance >= 2). This is the classical
recall/cost trade of blocking, stated rather than hidden; the verify step
(``levenshtein``) is exact on every candidate, so reported pairs are
never wrong, only (rarely) incomplete.

Scale shape: each blocking key is one equi-join over the key's bucket —
cost Σ_k |bucket(k)|², bounded two ways: choose prefix_len deep enough
that PREFIX buckets stay small (the caller knows its key distribution;
see stats_key_skew for measuring it), and — because a fixed-length
SUFFIX key has bounded cardinality, so its buckets grow linearly with
data and Σ bucket² goes quadratic no matter how the caller tunes it —
blocks larger than ``max_block`` degrade to STAR candidates (hub = the
block's smallest id), the same self-defense as the LSH dedup's
MAX_FULL_BUCKET. Star recall contract: within an over-cap block, pairs
are found only through the hub (A~hub and B~hub imply A, B land in one
component; an A~B pair where NEITHER matches the hub is the documented
miss). Below the cap, candidate generation is exhaustive per block.
No all-pairs anywhere; Levenshtein (a JVM codegen expression) runs on
candidates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_edit_pairs(
    df: DataFrame,
    text_col: str = "name",
    id_col: str = "id",
    max_distance: int = 1,
    prefix_len: int = 16,
    suffix_len: int = 2,
    max_block: int = 5000,
) -> DataFrame:
    """Matched pairs ``(a_id, b_id, distance)`` with
    ``levenshtein <= max_distance``, a_id < b_id, via prefix+suffix
    blocking (see module docstring for the recall contract).

    ``prefix_len`` must sit BELOW the typical key length: a string shorter
    than ``prefix_len`` has its whole self as the prefix key, so it only
    blocks with exact-string or suffix matches — tune per key
    distribution (the defaults suit ~20+-char entity names)."""
    base = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
    pref = F.substring("__t", 1, prefix_len)
    sufx = F.concat(
        F.lit("sfx:"),
        F.substring(F.col("__t"), -suffix_len, suffix_len),
    )
    keyed = base.select(
        "__id", "__t", F.explode(F.array(pref, sufx)).alias("__k")
    )
    # jumbo-block star defense (see module docstring): a fixed-cardinality
    # blocking key's buckets grow with the data, so full pair expansion
    # would be quadratic — above max_block, candidates go through the
    # block's hub instead (n-1 candidates, recall contract documented)
    big = (
        keyed.groupBy("__k")
        .agg(F.count(F.lit(1)).alias("__bs"))
        .filter(F.col("__bs") > max_block)
        .select("__k")
    )
    small = keyed.join(F.broadcast(big), "__k", "left_anti")
    a, b = small.alias("a"), small.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__k") == F.col("b.__k"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("a_id"),
            F.col("a.__t").alias("__ta"),
            F.col("b.__id").alias("b_id"),
            F.col("b.__t").alias("__tb"),
        )
    )
    jumbo = keyed.join(F.broadcast(big), "__k")
    hubs = jumbo.groupBy("__k").agg(
        F.min_by(F.struct("__id", "__t"), F.col("__id")).alias("__h")
    )
    star = (
        jumbo.join(hubs, "__k")
        .filter(F.col("__id") != F.col("__h.__id"))
        .select(
            F.least(F.col("__id"), F.col("__h.__id")).alias("a_id"),
            F.when(
                F.col("__id") < F.col("__h.__id"), F.col("__t")
            ).otherwise(F.col("__h.__t")).alias("__ta"),
            F.greatest(F.col("__id"), F.col("__h.__id")).alias("b_id"),
            F.when(
                F.col("__id") < F.col("__h.__id"), F.col("__h.__t")
            ).otherwise(F.col("__t")).alias("__tb"),
        )
    )
    cand = cand.unionByName(star)
    # verify BEFORE deduplicating: levenshtein runs map-side on the join
    # output (a pair reached through both keys costs at most one extra
    # codegen'd distance eval), and the distinct then shuffles only the
    # MATCHED pairs — three narrow columns — instead of every candidate
    # with both text payloads attached. Same result set: the distance is
    # a pure function of the pair.
    return (
        cand.withColumn(
            "distance", F.levenshtein("__ta", "__tb").cast("int")
        )
        .filter(F.col("distance") <= max_distance)
        .select("a_id", "b_id", "distance")
        .distinct()
    )


def entity_groups(
    df: DataFrame,
    text_col: str = "name",
    id_col: str = "id",
    max_distance: int = 1,
    prefix_len: int = 16,
    suffix_len: int = 2,
    max_block: int = 5000,
) -> DataFrame:
    """Full entity resolution: every record labeled with its entity —
    ``(id, entity, n_members)`` where ``entity`` is the smallest id in the
    record's match cluster (transitive closure of
    :func:`blocked_edit_pairs`) and singletons are their own entity of
    size 1.

    Composition, not a new algorithm: blocked candidate pairs -> min-label
    connected components (``dedup.duplicate_components``, two hash-aggs
    per round, no driver-side graph) -> one left join back to the full id
    list + one entity-keyed count. Transitivity is deliberate and
    documented: A~B and B~C place A and C in one entity even at
    ``levenshtein(A, C) > max_distance`` — match clusters are closure
    classes, the standard ER semantics.
    """
    from momyre_spark.operators.dedup import duplicate_components

    pairs = blocked_edit_pairs(
        df,
        text_col=text_col,
        id_col=id_col,
        max_distance=max_distance,
        prefix_len=prefix_len,
        suffix_len=suffix_len,
        max_block=max_block,
    )
    comp = duplicate_components(pairs)
    labeled = (
        df.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select(
            "id", F.coalesce(F.col("component"), F.col("id")).alias("entity")
        )
    )
    sizes = labeled.groupBy("entity").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    return labeled.join(sizes, "entity").select("id", "entity", "n_members")
