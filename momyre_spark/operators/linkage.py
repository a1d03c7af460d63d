"""Record linkage: blocked edit-distance entity matching.

The entity-resolution primitive: find record pairs whose key string (name,
title, address line) is within a small edit distance — duplicate customers
after a typo, the same paper with an OCR error, two crawls of one product
page. All-pairs Levenshtein is quadratic and dead at corpus scale; the
standard shape is BLOCKING (cheap equi-join keys that any true match
shares) followed by exact verification on the candidates only.

Blocking here is the DELETION NEIGHBORHOOD (FastSS, Bocek et al. 2007;
popularized as SymSpell): each record emits ``md5`` of its key string and
of every variant reachable by deleting up to ``max_distance`` characters.
If ``levenshtein(A, B) <= d``, take an optimal alignment: deleting from A
the <= d positions it substitutes/deletes and from B the <= d positions it
substitutes/inserts leaves the SAME string — so A and B always share a
variant key. Recall is therefore EXACT for every edit pattern (early,
late, both ends, any string length) — unlike the prefix/suffix positional
blocking this replaces, which documented both a short-string hole and a
fixed-cardinality suffix key whose buckets grew linearly with data
(round-6 verdict: Σ bucket² quadratic at any tuning). The verify step
(``levenshtein``, a JVM codegen expression) is exact on every candidate,
so reported pairs are never wrong; false candidates from md5 collisions
or deletion coincidences are filtered there.

Scale shape, in order of the knobs that bound it:

- Emission: ``Σ_{k<=d} C(len, k)`` variant keys per record (len+1 at the
  default d=1) — generated entirely in codegen HOFs (no Python, no
  shuffle), hashed to fixed-width md5 so shuffle width never depends on
  key length. ``max_distance`` is capped at 3: beyond that the emission
  combinatorics, not the join, dominate — and d >= 3 name matching is a
  different problem (phonetic/embedding, not edit blocking).
- Join: cost Σ_k |bucket(k)|², where a bucket is the set of records
  sharing one variant — i.e. the actual near-match cluster around one
  string, a DATA-intrinsic quantity that does not grow with corpus size
  for distinguishing keys. Degenerate inputs (millions of records one
  edit from each other, e.g. sequential padded IDs sharing a variant)
  still exist, so blocks larger than ``max_block`` degrade to STAR
  candidates (hub = the block's smallest id), the same self-defense as
  the LSH dedup's MAX_FULL_BUCKET. Star recall contract: within an
  over-cap block, pairs are found only through the hub (A~hub and B~hub
  imply A, B land in one component; an A~B pair where NEITHER matches
  the hub is the documented miss). Below the cap, candidate generation
  is exhaustive. No all-pairs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _variant_keys(t: Column, max_distance: int) -> Column:
    """Hash keys of every <=``max_distance``-deletion variant of ``t``,
    duplicates removed, built from codegen HOFs only.

    xxhash64, not md5 (guide §2.2 — shuffle narrower types): the key is
    a pure BLOCKING key, so the only thing that matters is that equal
    variant strings collide (any hash) and unequal ones rarely do; the
    levenshtein verify filters every false candidate, so the emitted
    pair set is identical under either hash. xxhash64 is one cheap
    64-bit op per variant vs md5's digest+hex, and the join/shuffle key
    drops from a 32-char string to 8 bytes. (The DuckDB oracles keep
    their md5 blocking text — same output by the same argument.)"""
    variants = F.array(t)
    frontier = variants
    for _ in range(max_distance):
        frontier = F.array_distinct(
            F.flatten(
                F.transform(
                    frontier,
                    lambda s: F.transform(
                        # sequence(1, max(len, 1)): for an empty string the
                        # single p=1 "deletion" reproduces "" (dropped by
                        # array_distinct), never a descending sequence
                        F.sequence(
                            F.lit(1), F.greatest(F.length(s), F.lit(1))
                        ),
                        lambda p: F.concat(
                            s.substr(F.lit(1), p - F.lit(1)),
                            s.substr(p + F.lit(1), F.length(s)),
                        ),
                    ),
                )
            )
        )
        variants = F.array_distinct(F.concat(variants, frontier))
    return F.array_distinct(F.transform(variants, lambda s: F.xxhash64(s)))


def blocked_edit_pairs(
    df: DataFrame,
    text_col: str = "name",
    id_col: str = "id",
    max_distance: int = 1,
    max_block: int = 5000,
) -> DataFrame:
    """Matched pairs ``(a_id, b_id, distance)`` with
    ``levenshtein <= max_distance``, a_id < b_id, via deletion-
    neighborhood blocking (see module docstring: exact recall below the
    ``max_block`` cap, hub-star recall above it)."""
    if not (1 <= max_distance <= 3):
        raise ValueError(
            "momyre: max_distance must be in [1, 3] — deletion-"
            "neighborhood emission is C(len, d) keys per record; d > 3 "
            "edit matching wants phonetic/embedding blocking instead"
        )
    from momyre_spark.operators.parallelism import ensure_parallelism

    # the variant emission (nested HOFs + one md5 per variant) is the
    # dominant map cost: it must not serialize on a few-file input layout
    # (measured at sf0.1/local[32]: 7.9s -> 2.7s for the pair query from
    # this repartition alone). `keyed` IS recomputed once per plan
    # consumer (block-size agg, both self-join sides, jumbo probe) — a
    # persist was tried and measured NET-NEGATIVE here: materializing the
    # (record x variants)-sized frame costs more than three extra runs of
    # a cheap, fully-parallel map stage, and the pinned blocks pressure
    # executor storage for every downstream consumer (entity_groups
    # degraded 17s -> 27s across repeats with the persist in place).
    base = ensure_parallelism(
        df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
    )
    if max_distance == 1:
        # codegen emission for the common d=1 case: the nested-HOF array
        # build (`_variant_keys`) is a CodegenFallback tree — every
        # substr/concat/xxhash64 runs INTERPRETED, and the emission is the
        # dominant map cost of the whole operator (recomputed once per
        # plan consumer). Exploding a position sequence instead keeps the
        # identical variant set in pure whole-stage codegen:
        #   p = 0            -> the string itself,
        #   p in 1..len      -> the deletion at position p,
        # with within-record duplicates removed by the run rule — deleting
        # any position of a maximal run of equal characters yields the
        # same string, and deletions at positions holding DIFFERENT
        # characters always differ (first point of difference), so
        # "keep only the first position of each run" IS array_distinct
        # on the deletion set. The self variant can never equal a deletion
        # (lengths differ). NULL text: sequence(0, NULL) is NULL and
        # explode drops the row — the HOF path emitted xxhash64(NULL)
        # (= the seed) instead, but NULL-text rows can never verify
        # (levenshtein against NULL is NULL -> filtered), so the emitted
        # PAIR set is identical; only a never-matching blocking row
        # disappears. (`_variant_keys` also array_distinct-ed the HASH
        # array — dropping a cross-string xxhash64 collision within one
        # record, a 2^-64 event this path keeps as a duplicate candidate
        # that the verify+distinct dedups anyway.)
        t = F.col("__t")
        p = F.col("__p")
        keyed = (
            base.select(
                "__id",
                "__t",
                F.explode(
                    F.sequence(F.lit(0), F.length("__t"))
                ).alias("__p"),
            )
            .filter(
                (p <= F.lit(1))
                | (t.substr(p, F.lit(1)) != t.substr(p - F.lit(1), F.lit(1)))
            )
            .select(
                "__id",
                "__t",
                F.xxhash64(
                    F.when(p == F.lit(0), t).otherwise(
                        F.concat(
                            t.substr(F.lit(1), p - F.lit(1)),
                            t.substr(p + F.lit(1), F.length("__t")),
                        )
                    )
                ).alias("__k"),
            )
        )
    else:
        keyed = base.select(
            "__id",
            "__t",
            F.explode(_variant_keys(F.col("__t"), max_distance)).alias("__k"),
        )
    # jumbo-block star defense (see module docstring): degenerate inputs
    # (a variant shared by a large fraction of records) would make full
    # pair expansion quadratic — above max_block, candidates go through
    # the block's hub instead (n-1 candidates, recall contract documented)
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
    # output (a pair reached through several variants costs at most a few
    # extra codegen'd distance evals), and the distinct then shuffles only
    # the MATCHED pairs — three narrow columns — instead of every
    # candidate with both text payloads attached. Same result set: the
    # distance is a pure function of the pair.
    # BANDED verify (guide §1.2 "per-task work"): passing the threshold
    # turns Spark's full O(|a|*|b|) DP into the O(|a|*d) diagonal band —
    # ~len/d times less work per candidate (30x at 90-char names, d=1).
    # Above-threshold pairs return -1; for kept pairs the banded value IS
    # the exact distance, so the emitted rows are identical.
    return (
        cand.withColumn(
            "distance",
            F.levenshtein("__ta", "__tb", max_distance).cast("int"),
        )
        .filter(
            (F.col("distance") >= 0) & (F.col("distance") <= max_distance)
        )
        .select("a_id", "b_id", "distance")
        .distinct()
    )


def entity_groups(
    df: DataFrame,
    text_col: str = "name",
    id_col: str = "id",
    max_distance: int = 1,
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
