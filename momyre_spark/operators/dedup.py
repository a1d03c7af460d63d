"""Deduplication operators for the documents pipeline.

Five strategies, each a different point on the recall/cost curve — all
designed so the expensive pairwise work never goes quadratic in the corpus:

- exact           : hash-groupBy on a normalization fingerprint (1 shuffle)
- ngram_jaccard   : exact set-similarity via shingle-inverted-index join —
                    only pairs sharing ≥1 shingle are generated
- minhash_lsh     : shingle -> K minhashes -> banded LSH buckets -> candidate
                    join -> exact-jaccard verify (the 100 TB path: candidate
                    generation touches only same-bucket pairs)
- simhash         : 64-bit sign-aggregated token hashes; near-dups = small
                    hamming distance, bucketed by 16-bit blocks
- embedding_cosine: near-dup pairs in embedding space — SRP-LSH bucketed
                    candidates (equi-join on (table, bucket)) + exact-cosine
                    verify; all-pairs brute force only as an explicit
                    ``method='exact'`` small-N baseline

No Python UDFs anywhere — shingling, hashing, banding and verification are
all built-in higher-order functions, so the whole plan stays in codegen.

Ordering contract for the near-dup family: run EXACT dedup first (the
curate_corpus stage order). Every candidate generator joins documents that
share a key (shingle prefix, LSH bucket, simhash block, SRP bucket), so a
K-sized cluster of EXACT duplicates produces ~K^2 candidate work in any of
them — work that one cheap fingerprint groupBy removes up front.
minhash_lsh_pairs additionally self-defends (star edges above
MAX_FULL_BUCKET) because its bucket expansion materializes pairs inside a
single row, where degeneracy is an OOM rather than just wasted time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from momyre_spark.functions.numeric import round_half_up
from momyre_spark.functions.text import content_fingerprint, fingerprint, shingles

# Full bucket-local pair expansion is quadratic in bucket size; above this
# membership the LSH candidate generator emits star edges instead (see
# minhash_lsh_pairs). 1000 keeps the worst row under ~500k structs.
MAX_FULL_BUCKET = 1_000


def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of exact (whitespace/case-normalized) duplicates.

    Returns one row per distinct content: (fp, keep_id, dup_cnt). The
    canonical survivor is the smallest id — deterministic at any parallelism.
    """
    return (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_cnt"),
        )
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """The deduplicated corpus itself (survivors only)."""
    keep = exact_duplicates(docs, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return docs.join(keep, id_col, "left_semi")


def _shingled(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    from momyre_spark.functions.text import shingles_from_tokens, tokens
    from momyre_spark.operators.parallelism import ensure_parallelism

    docs = ensure_parallelism(docs)
    # tokens materialized ONCE per row; shingles references the array n+2
    # times, and each reference to an inline tokens() re-runs the split
    return docs.withColumn("__toks", tokens(F.col(text_col))).select(
        F.col(id_col).alias("__id"),
        shingles_from_tokens(F.col("__toks"), n).alias("__sh"),
    ).filter(F.size("__sh") > 0)


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_filter: bool = True,
) -> DataFrame:
    """Exact n-gram-Jaccard near-duplicate pairs (a < b, jaccard >= threshold).

    ``prefix_filter=True`` (default — the scale path) generates candidates
    by PREFIX FILTERING (exact, lossless): shingles are globally ordered by
    document frequency (rarest first) and each document indexes only its
    first ``|d| - ceil(t*|d|) + 1`` shingles — any pair with J >= t must
    share a prefix shingle (pigeonhole on the overlap bound), so the
    inverted-index self-join runs over the rare prefix only. This is what
    bounds candidate blow-up under shingle skew: a stop-phrase shared by
    half the corpus lands in almost no prefixes, so it never materializes
    the quadratic bucket. Candidates are then exact-verified by
    intersecting full shingle sets.

    ``prefix_filter=False``: plain inverted-index join over every shingle,
    counting intersections per pair — fine for small/uniform corpora,
    quadratic under hot shingles.
    """
    sh = _shingled(docs, id_col, text_col, n)
    if not prefix_filter:
        sizes = sh.select("__id", F.size("__sh").alias("__n"))
        ex = sh.select("__id", F.explode("__sh").alias("s"))
        a, b = ex.alias("a"), ex.alias("b")
        inter = (
            a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.__id") < F.col("b.__id")))
            .groupBy(F.col("a.__id").alias("ia"), F.col("b.__id").alias("ib"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        sa = sizes.select(F.col("__id").alias("ia"), F.col("__n").alias("na"))
        sb = sizes.select(F.col("__id").alias("ib"), F.col("__n").alias("nb"))
        return (
            inter.join(sa, "ia")
            .join(sb, "ib")
            .withColumn(
                "jaccard",
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
            )
            .filter(F.col("jaccard") >= threshold)
            .select(
                F.col("ia").alias("a_id"),
                F.col("ib").alias("b_id"),
                round_half_up(F.col("jaccard"), 4).alias("jaccard"),
            )
        )

    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    sh = sh.persist(StorageLevel.MEMORY_AND_DISK)  # feeds index + both verify sides
    ex = sh.select("__id", F.size("__sh").alias("__n"), F.explode("__sh").alias("s"))
    freq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy("__id").orderBy(F.col("__df").asc(), F.col("s"))
    prefix = (
        ex.join(freq, "s")
        .withColumn("__rk", F.row_number().over(w))
        # prefix length: removing ceil(t*n)-1 shingles cannot break J >= t,
        # so a qualifying pair must collide within the first n-ceil(t*n)+1
        .filter(F.col("__rk") <= F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n")) + 1)
        .select("__id", "s")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.__id") < F.col("b.__id")))
        .select(F.col("a.__id").alias("a_id"), F.col("b.__id").alias("b_id"))
        .distinct()
    )
    sa = sh.select(F.col("__id").alias("a_id"), F.col("__sh").alias("__sa"))
    sb = sh.select(F.col("__id").alias("b_id"), F.col("__sh").alias("__sb"))
    inter = F.size(F.array_intersect("__sa", "__sb"))
    jac = inter / (F.size("__sa") + F.size("__sb") - inter).cast("double")
    return (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", round_half_up(F.col("jaccard"), 4).alias("jaccard"))
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 128,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """K-permutation MinHash signature per document (array<long> of size K).

    Built on the universal-hash permutation family over one base shingle
    hash (see ``_minhash_wide``); the signature component is the min over
    the document's shingle set.
    """
    wide = _minhash_wide(_shingled(docs, id_col, text_col, n), num_hashes)
    sig = F.array(*[F.col(f"__h{k}") for k in range(num_hashes)])
    return wide.select(F.col("__id").alias(id_col), sig.alias("signature"))


import random as _random

_MERSENNE31 = (1 << 31) - 1


def _perm_consts(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal-hash permutation family."""
    rng = _random.Random(0x5EED)
    return [
        (rng.randrange(1, _MERSENNE31), rng.randrange(0, _MERSENNE31))
        for _ in range(num_hashes)
    ]


def _minhash_wide(sh: DataFrame, num_hashes: int) -> DataFrame:
    """(__id, __sh, __h0..__hK-1): explode + K min-aggregates.

    Two measured pitfalls shape this implementation:
    - explode-then-hash-aggregate (map-side partial mins, whole-stage
      codegen) instead of a K-wide array_min(transform(...)) expression tree
      (60s vs 2s on 5k docs);
    - ONE string hash per shingle, with the K permutations derived by the
      classic universal family ``(a_k * h + b_k) mod (2^31-1)`` — strings
      are hashed once and each permutation is a multiply-add-mod on longs,
      kept under 2^62 so ANSI overflow checking never trips.
    """
    # expressions built as SQL text: a deep Column-builder tree costs one
    # py4j round-trip per node (~2.8s of driver time for K=128); parsed
    # text is one call per column — and the K min-aggregates land in ONE
    # template-SQL parse ({t} binds the frame, no temp-view catalog
    # state) instead of K F.expr round trips, which were still ~0.5s of
    # driver time per build at K=128
    ex = sh.select("__id", F.explode("__sh").alias("__s")).selectExpr(
        "__id", f"pmod(xxhash64(__s), {_MERSENNE31}L) AS __h"
    )
    aggs = ", ".join(
        f"min(pmod(__h * {a}L + {b}L, {_MERSENNE31}L)) AS __h{k}"
        for k, (a, b) in enumerate(_perm_consts(num_hashes))
    )
    wide = ex.sparkSession.sql(
        f"SELECT __id, {aggs} FROM {{t}} GROUP BY __id", t=ex
    )
    return wide.join(sh, "__id")


def _band_items_sql(term_for, num_hashes: int, bands: int) -> str:
    """Comma-joined xxhash64 band expressions over per-component SQL terms.

    ONE builder for both banding call sites (batch LSH pairs over __h{i}
    columns; persisted band keys over signature[i] subscripts) so the band
    hash can never silently diverge between the pair path and incremental
    LSH state."""
    rows = num_hashes // bands
    return ", ".join(
        "xxhash64("
        + ", ".join([term_for(b * rows + r) for r in range(rows)] + [str(b)])
        + ")"
        for b in range(bands)
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 128,
    bands: int = 32,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    verify: bool = True,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, exact-verified.

    Banding: K=128 hashes in 32 bands of 4 rows -> candidate iff some band
    matches. For J=0.9 the candidate probability is 1-(1-0.9^4)^32 ≈ 1-1e-15;
    for J=0.1 it's ~3e-3 — the quadratic blow-up never materializes because
    the join key is (band_index, band_hash).

    With ``verify=True`` candidates are exact-Jaccard-confirmed — but only
    the candidates: the shingle sets of each candidate pair are intersected
    directly (``array_intersect``), never the full corpus. Cost is
    O(candidates), not O(pairs-sharing-a-shingle) — the whole point of LSH.
    """
    from pyspark import StorageLevel

    from momyre_spark.functions.text import hashed_shingles_from_tokens, tokens

    # hashed shingles end-to-end: no shingle strings materialize anywhere in
    # the LSH path (exact-verify intersects the hash sets; a 64-bit collision
    # altering a jaccard is ~2^-64 per pair). The shingle frame feeds three
    # consumers (signature agg + both verify sides) — persist it so the
    # tokenizer/shingler runs once, not three times (~8 bytes/shingle, tiny
    # relative to the corpus; MEMORY_AND_DISK spills instead of OOMing).
    from momyre_spark.operators.parallelism import ensure_parallelism

    sh = (
        ensure_parallelism(docs)
        .withColumn("__toks", tokens(F.col(text_col)))  # split once per row
        .select(
            F.col(id_col).alias("__id"),
            hashed_shingles_from_tokens(F.col("__toks"), n).alias("__sh"),
        )
        .filter(F.size("__sh") > 0)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    wide = _minhash_wide(sh, num_hashes)
    band_items = _band_items_sql(lambda i: f"__h{i}", num_hashes, bands)
    banded = wide.selectExpr("__id", f"array({band_items}) AS __bands").select(
        "__id", F.posexplode("__bands").alias("band", "bh")
    )
    # Bucket-local pair expansion (groupBy + nested HOF) instead of a
    # banded-self-join: the minhash pipeline is evaluated once, the shuffle
    # key is (band, band_hash), and pairs are generated inside each bucket —
    # buckets are tiny by construction (that's what banding is for).
    buckets = (
        banded.groupBy("band", "bh")
        .agg(F.collect_set("__id").alias("ids"))
        .filter(F.size("ids") > 1)
        .withColumn("ids", F.array_sort("ids"))
    )
    # Degenerate-bucket guard: a crawl with a K-sized exact/near-duplicate
    # cluster puts all K members in ONE bucket, and full pair expansion is
    # K^2/2 structs materialized in a single row — executor death around
    # K~10^5. Above MAX_FULL_BUCKET the expansion degrades to STAR edges
    # (every member paired with the bucket's min id): K-1 candidates, and
    # transitive grouping (duplicate_components) still connects the whole
    # cluster through the hub. The pair LIST is exhaustive only below the
    # cap — which is the only regime where an exhaustive list is usable
    # anyway.
    full_arr = F.flatten(
        F.transform(
            "ids",
            lambda x: F.transform(
                F.filter("ids", lambda y: y > x),
                lambda y: F.struct(x.alias("a_id"), y.alias("b_id")),
            ),
        )
    )
    star_arr = F.transform(
        F.slice("ids", 2, F.size("ids") - 1),
        lambda y: F.struct(F.col("ids")[0].alias("a_id"), y.alias("b_id")),
    )
    pair_arr = F.when(
        F.size("ids") <= MAX_FULL_BUCKET, full_arr
    ).otherwise(star_arr)
    cand = (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select("p.a_id", "p.b_id")
        .distinct()
    )
    if not verify:
        return cand
    sa = sh.select(F.col("__id").alias("a_id"), F.col("__sh").alias("__sa"))
    sb = sh.select(F.col("__id").alias("b_id"), F.col("__sh").alias("__sb"))
    inter = F.size(F.array_intersect("__sa", "__sb"))
    jac = inter / (F.size("__sa") + F.size("__sb") - inter).cast("double")
    return (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", round_half_up(F.col("jaccard"), 4).alias("jaccard"))
    )


def simhash_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 63,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """SimHash per document: sign of the per-bit vote over token hashes.

    bit_i(fp) = 1 iff sum over tokens of (+1 if bit_i(hash(token)) else -1) > 0.
    63 bits so the fingerprint stays in a non-negative signed long. Bit
    positions are Python ints unrolled at plan-build time (shift amounts
    cannot be Columns), so this is one wide codegen'd projection: tokens ->
    hashes -> 63 fold-votes -> fingerprint.

    ``token_hash``: 'xxhash64' (default — the fast scale path) or
    'md5_prefix' (first 15 hex chars of md5 as a 60-bit int; caps ``bits``
    at 60). The md5 form is engine-neutral — DuckDB computes the identical
    fingerprint, making the operator fully oracle-checkable; same votes,
    same blocking, same verify either way.
    """
    from momyre_spark.functions.text import tokens

    # explode + wide hash-aggregate (the minhash-wide pattern): one token
    # hash per row, 63 conditional-sum votes with map-side partial
    # aggregation — HOF fold chains per row codegen poorly and re-evaluate
    # their input arrays.
    if token_hash == "md5_prefix":
        bits = min(bits, 60)
        hash_expr = "CAST(conv(substr(md5(__t), 1, 15), 16, 10) AS BIGINT) AS __h"
    elif token_hash == "xxhash64":
        hash_expr = "xxhash64(__t) AS __h"
    else:
        raise ValueError(f"unknown token_hash: {token_hash!r}")
    from momyre_spark.operators.parallelism import ensure_parallelism

    ex = ensure_parallelism(docs).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__t")
    ).selectExpr(id_col, hash_expr)
    votes = ex.groupBy(id_col).agg(
        *[
            F.expr(
                f"sum(CASE WHEN (shiftrightunsigned(__h, {i}) & 1) = 1 "
                f"THEN 1 ELSE -1 END)"
            ).alias(f"__v{i}")
            for i in range(bits)
        ]
    )
    fp = F.lit(0).cast("long")
    for i in range(bits):
        fp = fp + F.when(F.col(f"__v{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return votes.select(F.col(id_col), fp.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_hash: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance.

    Candidate generation delegates to the generic pigeonhole block join
    (``hamming_neardup_pairs``), which sizes ``max_hamming + 1`` blocks —
    at the historical default radius 3 that reproduces the classic 4x16-bit
    chunking exactly, and larger radii stay CORRECT (the old fixed-4-chunk
    form silently lost its pigeonhole guarantee above 3).
    ``collapse_identical=False`` keeps the exhaustive pair-list contract
    (the oracle queries value-check full pair sets)."""
    fps = simhash_fingerprints(docs, id_col, text_col, token_hash=token_hash)
    return hamming_neardup_pairs(
        fps,
        max_hamming=max_hamming,
        id_col=id_col,
        hash_col="simhash",
        collapse_identical=False,
    )


def hamming_neardup_pairs(
    fps: DataFrame,
    max_hamming: int,
    id_col: str = "doc_id",
    hash_col: str = "fp",
    bits: int = 64,
    collapse_identical: bool = True,
    persist_fps: bool = False,
    persisted: list[DataFrame] | None = None,
) -> DataFrame:
    """Generic hamming-distance pair join over any integer fingerprint
    column (SimHash, image dHash, audio chromaprint, ...).

    Pigeonhole blocking generalized to arbitrary radius: split the ``bits``
    fingerprint into ``max_hamming + 1`` contiguous blocks — two
    fingerprints within ``max_hamming`` must agree on at least one whole
    block, so ``(block_index, block_value)`` is a complete equi-join key and
    the join is never all-pairs. Candidates are verified with the true
    ``bit_count(xor)`` distance.

    ``collapse_identical`` (default) is the degenerate-duplicate guard —
    the exact-dup-cluster move every candidate generator here makes (see
    module docstring): a crawl's K blank thumbnails share ONE fingerprint,
    and K identical values in a block bucket cost K^2/2 candidate rows.
    Identical fingerprints collapse to their min-id representative BEFORE
    the block join (one groupBy on the 8-byte hash); the output then
    contains STAR edges ``(rep, member, 0)`` inside each identical group
    and representative-level pairs across groups. Nothing is lost:
    in-group members are bit-identical, so every member-member distance
    equals the rep-rep distance, and ``duplicate_components`` reconstructs
    exactly the same clusters. With ``collapse_identical=False`` the full
    quadratic pair list is emitted (only usable where an exhaustive list
    is small anyway).

    Works on SIGNED longs: ``shiftrightunsigned`` treats the value as the
    raw 64-bit pattern, so full-width hashes (top bit set -> negative long)
    block and compare correctly.

    ``persist_fps``: cache the projected (id, fp) frame — 16 bytes/row —
    before the branches below fan out. The collapse groupBy, the star
    join, and both sides of the block self-join each reference ``fps``,
    so a lazy input is recomputed up to FIVE times in the executed plan.
    That is the correct trade only when upstream is cheap codegen (the
    SimHash path — measured round 7, recompute beat persist); when
    upstream is per-row Python media decode (image dhash, audio
    envelope), five decodes dominate everything at scale, so those
    callers pass True and the plan decodes once (VERDICT r07 item #2).

    ``persisted``: caller-driven release for that cache — the same
    handle-threading contract as ``duplicate_components``: pass a list
    and the persisted (id, fp) frame is appended so a long-lived caller
    can ``unpersist()`` it after consuming the pairs (materialize the
    result first — the pair join reads the cache lazily). Without it the
    cache lives until the session's ``clearCache`` hygiene (bench.py's
    per-query lifecycle), which one-shot callers rely on.
    """
    n_blocks = max_hamming + 1
    if not 1 <= n_blocks <= bits:
        raise ValueError(f"max_hamming must be in [0, {bits - 1}]")
    # nearly-equal contiguous blocks covering [0, bits)
    bounds = [(i * bits) // n_blocks for i in range(n_blocks + 1)]

    def _mask(width: int) -> int:
        m = (1 << width) - 1
        return m - (1 << 64) if m >= 1 << 63 else m  # signed-64 pattern

    base = fps.select(F.col(id_col).alias("__id"), F.col(hash_col).alias("__fp"))
    if persist_fps:
        base = base.persist()
        if persisted is not None:
            persisted.append(base)
    star = None
    if collapse_identical:
        reps = base.groupBy("__fp").agg(F.min("__id").alias("__id"))
        star = (
            base.join(reps.withColumnRenamed("__id", "__rep"), "__fp")
            .filter(F.col("__id") != F.col("__rep"))
            .select(
                F.col("__rep").alias("a_id"),
                F.col("__id").alias("b_id"),
                F.lit(0).cast("bigint").alias("hamming"),
            )
        )
        base = reps.select("__id", "__fp")

    chunk = F.array(
        *[
            F.shiftrightunsigned(F.col("__fp"), bounds[i]).bitwiseAND(
                F.lit(_mask(bounds[i + 1] - bounds[i])).cast("long")
            )
            for i in range(n_blocks)
        ]
    )
    blocked = base.select(
        "__id", "__fp", F.posexplode(chunk).alias("block", "bv")
    )
    l, r = blocked.alias("l"), blocked.alias("r")
    ham = F.bit_count(F.col("l.__fp").bitwiseXOR(F.col("r.__fp")))
    pairs = (
        l.join(
            r,
            (F.col("l.block") == F.col("r.block"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .filter(ham <= max_hamming)
        .select(
            F.col("l.__id").alias("a_id"),
            F.col("r.__id").alias("b_id"),
            ham.cast("bigint").alias("hamming"),
        )
        .distinct()
    )
    return pairs.unionByName(star) if star is not None else pairs


def _persistent_rdds(spark) -> dict[int, object]:
    """id -> JavaRDD handle for every currently persisted RDD (including
    localCheckpoint blocks, which the DataFrame API cannot release)."""
    m = spark.sparkContext._jsc.getPersistentRDDs()
    return {e.getKey(): e.getValue() for e in m.entrySet().toArray()}


class _JvmBlocks:
    """Duck-typed stand-in for a cached DataFrame in a ``persisted`` list:
    releases checkpoint blocks that the DataFrame API cannot unpersist."""

    def __init__(self, jrdds):
        self._jrdds = jrdds

    def unpersist(self, blocking: bool = False):
        for j in self._jrdds:
            j.unpersist(bool(blocking))


def duplicate_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iterations: int = 20,
    persisted: list[DataFrame] | None = None,
    driver_edge_gate: int = 1_000_000,
) -> DataFrame:
    """Near-duplicate *groups* from a pair list: connected components by
    iterative min-label propagation.

    Each node's label converges to the smallest id reachable from it — the
    canonical survivor of its duplicate cluster. Converges in
    O(log(diameter)) rounds (label large-star/small-star style); duplicate
    clusters are near-cliques so 2-3 rounds in practice. Each round is two
    hash-aggregations over the edge list — no driver-side graph.

    Returns (id, component) for every node that appears in a pair.

    **Small-graph fast path** (``driver_edge_gate``): dedup match graphs
    are usually TINY next to the corpus that produced them — the edge
    list is the expensive candidate join's OUTPUT. When the materialized
    edge count is at or under the gate (known exactly, from the same
    count that fills the edge cache), the components are solved with a
    driver-side union-find over a bounded collect (<= gate rows of two
    ints; 1M edges ~ 16 MB through Arrow) instead of paying
    O(log diameter) distributed rounds of fixed job-latency overhead.
    The result is IDENTICAL — union-find with min-id roots computes the
    same min-reachable-label fixed point (pinned by
    test_duplicate_components_matches_union_find, which is literally a
    union-find reference) — and the decision is data-driven at runtime,
    the AQE move: at 100 TB a billion-edge graph routes to the
    distributed rounds untouched, while the common curated-corpus case
    skips ~10 Spark jobs. ``driver_edge_gate=0`` forces the distributed
    path (used by its tests).

    Storage hygiene (distributed path): the edge cache and every
    per-round lineage-cut block are released before returning — the
    result is eagerly materialized into ONE self-contained checkpoint,
    so one-shot callers (``dedup_semantic``, the registered component
    queries) leave exactly one persisted block behind (the result's
    own), not one per invocation per round. Callers that thread
    ``persisted`` get the result block appended so their per-epoch
    unpersist releases it too. The fast path persists NOTHING (its
    result is a local-relation frame), so it appends nothing.
    """
    from pyspark import StorageLevel

    spark = pairs.sparkSession

    def _persistent() -> dict[int, object]:
        return _persistent_rdds(spark)

    # ownership tracking: record the block ids each of OUR eager
    # checkpoints creates (the per-call delta of the persistent-RDD map)
    # and release exactly those, never "everything new since entry" — a
    # concurrent job sharing this SparkSession can persist blocks at any
    # time, and an entry-diff would release blocks we do not own (or
    # mistake a foreign block for our result). Residual race: a foreign
    # block persisted INSIDE one of our eager cuts is mis-tracked, but the
    # error direction for the RESULT is always safe (result ids are
    # excluded from release).
    owned: set[int] = set()

    def _cut(df: DataFrame) -> tuple[DataFrame, set[int]]:
        before = set(_persistent())
        out = df.localCheckpoint(eager=True)
        made = set(_persistent()) - before
        owned.update(made)
        return out, made

    def _cut_with_sum(df: DataFrame):
        """Lazy lineage cut materialized BY the convergence aggregate:
        one plain-RDD job computes the round's whole DAG and stores the
        checkpoint blocks as a side effect, where the eager cut paid one
        AQE stage-materialization job per exchange plus a separate sum
        job over the blocks (measured 2.8s/8 jobs -> 0.7s/2 jobs per
        round on the 1.2M-edge probe). The sum scans EVERY partition, so
        the checkpoint is complete and later rounds read blocks only —
        a partial action (limit-style) would checkpoint only the
        partitions it touched and must keep using the eager form."""
        before = set(_persistent())
        out = df.localCheckpoint(eager=False)
        s = out.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        made = set(_persistent()) - before
        owned.update(made)
        return out, made, s

    # dedup the directed edge list in ONE exchange laid out for the loop
    # (guide §2.4): repartition by dst, then dropDuplicates — equal
    # (src, dst) rows share a dst, so hashpartitioning(dst) satisfies the
    # distinct's clustering requirement and Spark fuses it WITHOUT the
    # second (src, dst) exchange a bare .distinct() would add before the
    # re-layout. The cached frame then enters every propagation round
    # already partitioned on the join key, so only the node-sized label
    # table moves per round; the partition count is pinned (an
    # AQE-coalesced repartition could land where the per-round exchanges
    # don't match, re-shuffling both sides). The driver fast path pays
    # the same single exchange the old .distinct() cost it.
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .repartition(n_shuffle, F.col("dst"))
        .dropDuplicates(["src", "dst"])
        # every propagation round + convergence check re-reads the edge
        # list; uncached, each round would recompute the (often expensive)
        # candidate-pair DAG that produced it. Cache it once: the edge list
        # is pairs-sized, tiny next to the corpus; released before return.
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # the count both fills the edge cache (paying the candidate DAG once,
    # which round 1 would have paid anyway) and decides the path
    n_edges = edges.count()
    if n_edges <= driver_edge_gate:
        id_type = edges.schema["src"].dataType
        rows = edges.toPandas()  # bounded by the gate; Arrow transfer
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(rows["src"], rows["dst"]):
            a = a.item() if hasattr(a, "item") else a
            b = b.item() if hasattr(b, "item") else b
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:  # min-id root == min-reachable label
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        edges.unpersist()
        from pyspark.sql.types import StructField, StructType

        schema = StructType(
            [
                StructField("id", id_type, False),
                StructField("component", id_type, False),
            ]
        )
        if not parent:
            return spark.createDataFrame([], schema=schema)
        import pandas as pd

        # pandas -> Arrow batch transfer: a plain list of tuples would be
        # driver-serialized row by row (~2M rows near the gate), the slow
        # path the pagerank twin already avoids
        out = pd.DataFrame(
            {"id": list(parent), "component": [find(x) for x in parent]}
        )
        return spark.createDataFrame(out, schema=schema)
    labels = edges.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("label")
    ).select(F.col("src").alias("id"), "label")

    # convergence probe: labels only ever DECREASE (every update is
    # F.least(old, ...) over the same id set), so the exact integer sum of
    # all labels strictly decreases iff ANY label changed — one map-side
    # aggregate over the just-materialized checkpoint replaces the old
    # join-the-two-versions + filter + limit probe (a per-round shuffle
    # of two node-sized frames). DECIMAL(38,0) keeps the sum exact for
    # any bigint labels at any node count. Non-numeric id types keep the
    # join probe (a sum over them is undefined).
    # integral types only: a fractional id (decimal/double) could shrink
    # by less than one unit and leave the truncated sum unchanged — a
    # false convergence. Integer label sums are exact in DECIMAL(38,0).
    numeric_ids = edges.schema["src"].dataType.typeName() in {
        "byte", "short", "integer", "long"
    }

    def _label_sum(df: DataFrame):
        return df.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    prev_round_ids: set[int] = set()
    if numeric_ids:
        # cut the initial labels too (lazily, materialized by the same sum
        # that seeds the probe): round 1 otherwise recomputes the labels
        # groupBy inside BOTH sides of its join DAG
        labels, prev_round_ids, prev_sum = _cut_with_sum(labels)
    else:
        prev_sum = None
    # SHUFFLE_HASH on the node-sized side of every per-round join (guide
    # §3.2): below the broadcast threshold Spark would broadcast the label
    # table — a SERIAL driver-side HashedRelation build, three per round —
    # and above it (the 100 TB case, where a node table never fits the
    # driver) it would sort-merge, paying two sorts per round. Shuffled
    # hash builds the node-sized hash tables per-partition in parallel,
    # needs no sort, and on the edges.dst side reuses the edge cache's
    # hashpartitioning(dst) layout so only the label table moves.
    for _ in range(max_iterations):
        neigh = (
            edges.join(labels.hint("shuffle_hash"), edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        upd = (
            labels.join(neigh.hint("shuffle_hash"), labels.id == neigh.src, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
        )
        # path halving: shortcut each label through the PREVIOUS round's
        # label table (label(id) := min(u(id), L_prev[u(id)]) with
        # u = least(label, nlabel)). Halving against the just-updated
        # frame was a SELF-join whose build side duplicated the entire
        # update-join subtree in the executed plan (exchange reuse cannot
        # fire: the two parent exchanges hash different columns), so the
        # edge join and the label update ran TWICE per round. L_prev is
        # this round's input — a materialized checkpoint, so its lookup
        # side is a block scan, never a recompute. Correctness is the
        # same argument as before: every L_prev value is a node id inside
        # the same component (so the halved label stays a reachable,
        # >= component-min label), labels remain monotone non-increasing,
        # and the fixed point (label(id) <= all neighbor labels for all
        # id over symmetrized edges => labels constant per component
        # = component min) is unchanged — only intermediate rounds may
        # differ by at most one extra round of stale shortcuts. Both
        # variants converge in O(log diameter) rounds; output equality is
        # pinned by test_duplicate_components_matches_union_find and the
        # consumer oracles. The extra join stays node-sized.
        lab2 = labels.select(
            F.col("id").alias("__lid"), F.col("label").alias("__llabel")
        )
        new_labels = (
            upd.join(
                lab2.hint("shuffle_hash"), upd.label == lab2.__lid, "left"
            )
            .select(
                "id",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("__llabel"), F.col("label")),
                ).alias("label"),
            )
        )
        # materialize the round and read the convergence check in ONE
        # action (lazy cut + sum — see _cut_with_sum): the eager cut paid
        # one AQE stage job per exchange plus a separate sum job
        if numeric_ids:
            new_labels, new_ids, new_sum = _cut_with_sum(new_labels)
            changed = 0 if new_sum == prev_sum else 1
            prev_sum = new_sum
        else:
            new_labels, new_ids = _cut(new_labels)
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.label") != F.col("o.label"))
                .limit(1)
                .count()
            )
        # the convergence probe was the LAST reader of the previous
        # round's cut — release its blocks now instead of pinning one
        # node-sized block per round until return (the k-core lifecycle
        # fix, applied to the label chain)
        if prev_round_ids:
            for rid, jrdd in _persistent().items():
                if rid in prev_round_ids:
                    jrdd.unpersist(False)
            owned.difference_update(prev_round_ids)
        prev_round_ids = new_ids
        labels = new_labels
        if changed == 0:
            break
    # the last round's eager cut IS the result's data — the rename is a
    # lazy projection over that self-contained block (no lineage into the
    # edge cache), so the old final re-materialization job (a second full
    # node-sized checkpoint) is dropped. Then release the edge cache and
    # every intermediate per-round checkpoint (reachable only through the
    # JVM persistent-RDD map — DataFrame.localCheckpoint exposes no
    # handle). Only OWNED block ids are touched, minus the result's own.
    if not prev_round_ids:
        # defensive: max_iterations == 0 means no round ever cut — the
        # labels frame still has lineage into the edge cache, so pay the
        # materialization the loop would have paid
        labels, prev_round_ids = _cut(labels)
    out = labels.select("id", F.col("label").alias("component"))
    result_ids = prev_round_ids
    edges.unpersist()
    for rid, jrdd in _persistent().items():
        if rid in owned and rid not in result_ids:
            jrdd.unpersist(False)
    if persisted is not None:
        # the result's own block: DataFrame.unpersist is a cache-manager
        # no-op on a checkpointed frame, so hand the caller the JVM block
        # handles instead — the ingest loop's per-epoch `df.unpersist()`
        # then releases it like any other cached frame
        handles = [
            j for rid, j in _persistent().items() if rid in result_ids
        ]
        persisted.append(_JvmBlocks(handles))
    return out


def component_survivors(
    docs: DataFrame,
    comp: DataFrame,
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> DataFrame:
    """One survivor per duplicate component: the min-id member by default
    (replay-deterministic first occurrence), or — with ``quality_col`` —
    the HIGHEST-quality member (ties break to the lowest id). Production
    dedup usually wants the best copy of a cluster, not the
    first-crawled one; the min-id rule silently keeps whichever near-dup
    happened to be crawled first.

    ``comp`` is :func:`duplicate_components` output (id, component);
    rows outside any component always survive. Cost: one join of the
    component table (pairs-sized, tiny next to the corpus) against a
    two-column projection of ``docs``, one per-component argmax, one
    anti-join — the corpus itself is scanned once and never shuffled on
    anything but the final anti-join key.
    """
    if quality_col is None:
        losers = comp.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias(id_col)
        )
        return docs.join(losers, id_col, "left_anti")
    members = comp.join(
        docs.select(
            F.col(id_col).alias("id"), F.col(quality_col).alias("__q")
        ),
        "id",
    )
    # max_by on (quality, -id): highest quality wins, ties to lowest id —
    # deterministic under any partitioning
    winners = members.groupBy("component").agg(
        F.expr("max_by(id, struct(__q, -id))").alias("__win")
    )
    losers = (
        members.join(
            winners.select(F.col("__win").alias("id")), "id", "left_anti"
        )
        .select(F.col("id").alias(id_col))
    )
    return docs.join(losers, id_col, "left_anti")


def srp_params_for(
    threshold: float, target_recall: float = 0.999, max_tables: int = 96
) -> tuple[int, int]:
    """(num_planes, num_tables) for SRP-LSH at a cosine threshold.

    Per-plane collision probability for two vectors at the threshold angle
    is c = 1 - arccos(threshold)/pi; a table of p planes collides with c^p
    and T tables give recall 1 - (1 - c^p)^T. Picks the largest p (fewest
    candidates) whose required T stays within ``max_tables`` — low
    thresholds therefore get few planes and many tables, high thresholds
    many planes and few candidate collisions.
    """
    import math

    c = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    if c >= 1.0:
        return 1, 1
    for p in range(31, 0, -1):
        per_table = c**p
        if per_table <= 0.0:
            continue
        t = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - per_table))
        if t <= max_tables:
            return p, max(1, t)
    return 1, max_tables


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    method: str = "srp_lsh",
    num_planes: int | None = None,
    num_tables: int | None = None,
    target_recall: float = 0.999,
    seed: int = 0x5EED,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cos >= threshold).

    ``method='srp_lsh'`` (default — the scale path): candidates come from
    SRP-LSH buckets (similarity.srp_planes / with_srp_buckets), expanded
    bucket-locally exactly like the MinHash path — shuffle key is
    ``(table, bucket)``, pairs materialize only inside buckets, and every
    join is an equi-join (no BroadcastNestedLoopJoin / cartesian anywhere).
    Candidates are then exact-cosine verified, so precision is always 1.0;
    recall is the LSH collision bound — (num_planes, num_tables) default to
    :func:`srp_params_for` at ``target_recall``.

    ``method='exact'``: the all-pairs O(N^2) baseline (non-equi join ->
    BroadcastNestedLoopJoin). Small-N oracle/testing ONLY — never at scale.
    """
    from momyre_spark.functions.vectors import add_normalized, dot

    nv = add_normalized(emb, vec_col, "__nv")
    if method == "exact":
        a = nv.select(F.col(id_col).alias("a_id"), F.col("__nv").alias("va"))
        b = nv.select(F.col(id_col).alias("b_id"), F.col("__nv").alias("vb"))
        return (
            a.join(b, F.col("a_id") < F.col("b_id"))
            .withColumn("cos", dot(F.col("va"), F.col("vb")))
            .filter(F.col("cos") >= threshold)
            .select("a_id", "b_id", round_half_up(F.col("cos"), 4).alias("cos"))
        )
    if method != "srp_lsh":
        raise ValueError(f"unknown method: {method!r}")

    from momyre_spark.operators.similarity import srp_banded_rows, srp_planes

    if num_planes is None or num_tables is None:
        auto_p, auto_t = srp_params_for(threshold, target_recall)
        num_planes = num_planes if num_planes is not None else auto_p
        num_tables = num_tables if num_tables is not None else auto_t
    planes = srp_planes(num_tables, num_planes, dim, seed)

    from pyspark import StorageLevel

    # normalized vectors feed bucket hashing AND both verify sides
    nv = nv.select(F.col(id_col).alias("__id"), F.col("__nv")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # fused banding+explode (srp_banded_rows): above the expression plane
    # limit the old withColumn+posexplode shape evaluated the banding
    # pandas UDF TWICE (two ArrowEvalPython nodes in the executed plan);
    # the fused form pays one Python boundary and ships only the narrow
    # (id, table, bucket) rows back
    banded = srp_banded_rows(nv, planes, "__id", "__nv")
    # bucket-local pair expansion (the minhash_lsh_pairs pattern): one
    # shuffle on (table, bucket), pairs generated inside each bucket
    buckets = (
        banded.groupBy("table", "bucket")
        .agg(F.collect_set("__id").alias("ids"))
        .filter(F.size("ids") > 1)
        .withColumn("ids", F.array_sort("ids"))
    )
    pair_arr = F.flatten(
        F.transform(
            "ids",
            lambda x: F.transform(
                F.filter("ids", lambda y: y > x),
                lambda y: F.struct(x.alias("a_id"), y.alias("b_id")),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select("p.a_id", "p.b_id")
        .distinct()
    )
    va = nv.select(F.col("__id").alias("a_id"), F.col("__nv").alias("va"))
    vb = nv.select(F.col("__id").alias("b_id"), F.col("__nv").alias("vb"))
    return (
        cand.join(va, "a_id")
        .join(vb, "b_id")
        .withColumn("cos", dot(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("a_id", "b_id", round_half_up(F.col("cos"), 4).alias("cos"))
    )


def segment_dedup(
    docs: DataFrame,
    words_per_segment: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """Sub-document (line/paragraph-level) exact dedup: split every document
    into segments, keep only each distinct segment's GLOBAL first occurrence
    (ordered by (doc, position)), and reassemble the surviving text.

    This is the pretraining-corpus cleanup that document-level dedup cannot
    do: boilerplate repeated across half the corpus (headers, licenses,
    navigation) disappears from every document but its first. On real
    corpora the split unit is the paragraph/line (``F.split(text, '\\n')``
    — identical plan); the fixture corpus is one line per document, so the
    unit here is a fixed run of ``words_per_segment`` words.

    Plan shape at 100 TB: segment explode is map-only; first-occurrence
    resolution is ONE hash aggregation keyed by the segment (map-side
    partial min) + one equi-join back; reassembly is one hash aggregation
    by doc id (uniform key). Nothing enumerates segment pairs, and the only
    driver-side value is the plan itself.

    Output: ``id_col``, ``text`` (deduped, original segment order),
    ``n_segments`` (pre-dedup), ``n_kept``. Documents whose every segment
    was seen earlier keep a row with empty text — corpus statistics need
    the zero, and a downstream length gate drops them explicitly.
    """
    # materialized once per row — Catalyst does no CSE inside HOF lambdas,
    # so an inline split would re-run per generated segment
    docs = docs.withColumn("__words", F.split(F.col(text_col), sep))
    words = F.col("__words")
    nseg = F.ceil(F.size(words) / F.lit(words_per_segment)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.array_join(
            F.slice(words, i * words_per_segment + 1, words_per_segment), sep
        ),
    )
    parts = docs.select(
        F.col(id_col), F.posexplode(segs).alias("pos", "seg")
    )
    first = parts.groupBy("seg").agg(
        F.min(F.struct(id_col, "pos")).alias("__first")
    )
    kept = parts.join(first, "seg").filter(
        (F.col(id_col) == F.col(f"__first.{id_col}"))
        & (F.col("pos") == F.col("__first.pos"))
    )
    survivors = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
            sep,
        ).alias("text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = parts.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_segments"))
    return (
        totals.join(survivors, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            "n_segments",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        )
    )


def strip_boilerplate(
    docs: DataFrame,
    min_docs: int = 2,
    words_per_segment: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """Document-frequency boilerplate removal: segments appearing in at
    least ``min_docs`` DISTINCT documents are removed from EVERY document.

    The complement of :func:`segment_dedup` (which keeps each duplicate
    segment's first occurrence): headers, license blocks, and navigation
    chrome that repeat across a corpus are noise in all copies including
    the first — the C4/Gopher-style cleanup drops them everywhere. On real
    corpora the split unit is the line/paragraph (``F.split(text, '\\n')``,
    identical plan); the one-line fixture corpus splits into fixed
    ``words_per_segment`` word runs.

    Plan shape at 100 TB: explode is map-only; the document-frequency table
    is ONE hash aggregation keyed by segment (map-side partial
    count-distinct on (seg, doc) pairs); membership is an equi-join on the
    segment key — never a pair enumeration. Segments travel as values, not
    through the driver.

    Output: ``id_col``, ``text`` (surviving segments, original order),
    ``n_segments`` (pre-strip), ``n_kept``.
    """
    # materialized once per row — Catalyst does no CSE inside HOF lambdas,
    # so an inline split would re-run per generated segment
    docs = docs.withColumn("__words", F.split(F.col(text_col), sep))
    words = F.col("__words")
    nseg = F.ceil(F.size(words) / F.lit(words_per_segment)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.array_join(
            F.slice(words, i * words_per_segment + 1, words_per_segment), sep
        ),
    )
    parts = docs.select(F.col(id_col), F.posexplode(segs).alias("pos", "seg"))
    boiler = (
        parts.groupBy("seg")
        .agg(F.count_distinct(F.col(id_col)).alias("__df"))
        .filter(F.col("__df") >= min_docs)
        .select("seg")
    )
    kept = parts.join(boiler, "seg", "left_anti")
    survivors = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
            sep,
        ).alias("text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = parts.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_segments"))
    return totals.join(survivors, id_col, "left").select(
        id_col,
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        "n_segments",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
    )


def dedup_incremental(
    new_docs: DataFrame,
    corpus_fps: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fp_col: str = "fp",
) -> DataFrame:
    """Incremental exact dedup: keep only NEW-batch documents whose content
    is (a) unseen in the existing corpus and (b) the first occurrence
    within the batch.

    The shape a continuously-updated corpus needs (daily crawl increments):
    the multi-TB corpus is never rescanned — it is represented by its
    fingerprint table (16 bytes/doc, itself maintained by appending this
    function's survivors), and the batch joins against THAT. Anti-join on
    the fingerprint key + one in-batch first-occurrence aggregation: both
    shuffle only the increment, so cost is O(|batch|) regardless of corpus
    size. Same survivor rule as exact_duplicates (min id) so a replayed
    batch picks the same survivors.

    ``corpus_fps`` needs column ``fp_col`` (from
    ``functions.text.fingerprint``); dedup state for 10^10 docs is a
    join-key table, not driver memory.
    """
    fp = fingerprint(F.col(text_col)).alias("__fp")
    batch = new_docs.select(F.col(id_col), fp)
    unseen = batch.join(
        corpus_fps.select(F.col(fp_col).alias("__fp")), "__fp", "left_anti"
    )
    firsts = unseen.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return new_docs.join(firsts.select(id_col), id_col, "left_semi")


def duplicate_spans(
    docs: DataFrame,
    span_tokens: int = 8,
    anchor_density: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Duplicated-SPAN detection: the distributed stand-in for suffix-array
    substring dedup (dedup long repeated substrings across documents, not
    whole docs or fixed segments). A span is ``span_tokens`` consecutive
    whitespace tokens; a span appearing in >= 2 distinct documents flags
    every document containing it.

    Windows are CONTENT-ANCHORED, not stride-sampled: position i starts a
    window iff ``h(token_i) % anchor_density == 0``. Fixed-stride sampling
    breaks on alignment — two copies of the same substring at different
    offsets (mod stride) sample different windows and never collide;
    content anchors move WITH the text, so both copies window identically
    wherever they sit (the content-defined-chunking trick). Expected cost:
    tokens/anchor_density windows per doc; a duplicated run is detected
    once it covers an anchor + span_tokens tokens (probability
    1-(1-1/d)^(run-span) over token hashes — near-certain for the long
    runs substring dedup targets).

    Plan: window expansion + per-doc span dedup are map-only
    (array_distinct before the explode); ONE repartition on the span hash
    is the reuse point for both consumers (count + join-back), so the
    expensive span projection runs once. Never enumerates document pairs.
    ``hash_fn`` picks the hash for anchors AND spans: 'xxhash64'
    (default — JVM-native, 8-byte longs on the shuffle) or 'md5'
    (engine-neutral; what the SQL oracle recomputes — the registered
    query uses it). The two variants sample different anchor sets, which
    only shifts the probabilistic detection floor, not correctness.

    Output: ``id_col``, ``n_spans`` (distinct anchored spans in the doc),
    ``n_shared`` (those also in another doc), ``flagged``.
    """
    from momyre_spark.functions.text import tokens

    def h60(c):
        return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")

    # Materialize the token array ONCE per row: Catalyst does not do
    # common-subexpression elimination inside higher-order-function
    # lambdas, so an inline tokens(...) here would re-split the text for
    # EVERY element_at/slice evaluation — measured 5x on this operator.
    docs = docs.withColumn("__toks", tokens(F.lower(F.col(text_col))))
    toks = F.col("__toks")
    npos = F.size(toks) - (span_tokens - 1)
    positions = F.when(npos >= 1, F.sequence(F.lit(1), npos)).otherwise(
        F.array().cast("array<int>")
    )
    if hash_fn == "xxhash64":
        anchor_h = lambda c: F.xxhash64(c)  # noqa: E731
        hasher = F.xxhash64
    else:
        anchor_h = h60
        hasher = F.md5
    anchored = F.filter(
        positions,
        lambda i: F.pmod(anchor_h(F.element_at(toks, i)), F.lit(anchor_density))
        == 0,
    )
    spans = F.transform(
        anchored,
        lambda i: hasher(F.array_join(F.slice(toks, i, span_tokens), " ")),
    )
    # array_distinct BEFORE exploding makes per-doc span dedup map-side; the
    # repartition on span_h is then the REUSE point — the expensive span
    # projection runs once, and both consumers (the count and the join)
    # read the same shuffle output, already co-partitioned on their key.
    parts = docs.select(
        F.col(id_col), F.explode(F.array_distinct(spans)).alias("span_h")
    ).repartition("span_h")
    counts = parts.groupBy("span_h").agg(
        F.count(F.lit(1)).alias("__docs")
    )
    scored = parts.join(counts, "span_h").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum((F.col("__docs") >= 2).cast("int")).alias("n_shared"),
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) > 0).alias("flagged"),
        )
    )


def cross_source_overlap(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    key: str = "exact",
) -> DataFrame:
    """Content-overlap matrix between sources: for every source pair
    (a < b), how many distinct exact fingerprints appear in BOTH — the
    contamination/provenance diagnostic run before mixing crawl snapshots
    or vendor corpora (a high overlap means one source is substantially a
    re-crawl of the other and the mixture weights double-count it).

    Shape: distinct (fingerprint, source) -> self-equi-join on fingerprint
    (a < b kills the diagonal and mirror pairs) -> count per pair. The join
    is bucketed by fingerprint; per-fingerprint group size is bounded by
    the NUMBER OF SOURCES (not corpus size), so the pair expansion is at
    most |sources|^2/2 per fingerprint — never quadratic in rows.

    ``key`` picks the match granularity: ``'exact'`` (whitespace-normalized
    text) or ``'content'`` (bag-of-words — order-insensitive, catches
    shuffled re-crawls).
    """
    if key == "exact":
        fp_col = fingerprint(F.col(text_col))
    elif key == "content":
        fp_col = content_fingerprint(F.col(text_col))
    else:
        raise ValueError(f"momyre: unknown overlap key {key!r}")
    fps = (
        df.select(
            fp_col.alias("fp"),
            F.col(source_col).alias("src"),
        )
        .distinct()
    )
    a = fps.select("fp", F.col("src").alias("source_a"))
    b = fps.select(F.col("fp").alias("fp_b"), F.col("src").alias("source_b"))
    return (
        a.join(
            b,
            (F.col("fp") == F.col("fp_b"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(F.countDistinct("fp").alias("shared_fingerprints"))
    )


def minhash_band_keys(
    sigs: DataFrame,
    num_hashes: int = 128,
    bands: int = 32,
    id_col: str = "doc_id",
    sig_col: str = "signature",
) -> DataFrame:
    """Banded LSH keys from signature rows: ``(id, band, bh)`` — one row per
    band. The persisted form of LSH state: an incremental corpus keeps this
    table (appending each epoch's survivors) so a new batch probes the
    whole corpus with ONE equi-join, never recomputing corpus signatures."""
    band_items = _band_items_sql(
        lambda i: f"`{sig_col}`[{i}]", num_hashes, bands
    )
    return sigs.selectExpr(
        f"`{id_col}`", f"array({band_items}) AS __bands"
    ).select(id_col, F.posexplode("__bands").alias("band", "bh"))


def estimated_jaccard(sig_a, sig_b, num_hashes: int):
    """Column: fraction of equal MinHash components — the unbiased Jaccard
    estimate (std ~ sqrt(J(1-J)/K))."""
    return (
        F.size(
            F.filter(
                F.zip_with(sig_a, sig_b, lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(float(num_hashes))
    )


def dedup_incremental_fuzzy(
    new_docs: DataFrame,
    corpus_bands: DataFrame,
    corpus_sigs: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 128,
    bands: int = 32,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    persisted: list[DataFrame] | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Incremental NEAR-dup dedup: the fuzzy twin of ``dedup_incremental``.

    The corpus is represented by two append-only state tables — its banded
    LSH keys (``minhash_band_keys`` rows) and its signatures — so each new
    batch costs O(|batch| + candidates) however large the corpus grows:

    1. batch signatures + band keys (the batch's own LSH pipeline);
    2. corpus probe: batch bands equi-join the corpus band table; candidate
       pairs verify by ESTIMATED Jaccard over the stored signatures (state
       holds 8K bytes/doc of signature, never the text — choose
       ``threshold`` with the estimator's ~1/sqrt(K) band in mind);
    3. batch-internal near-dups: the same bucket-join among batch rows,
       min-id survivor per connected component (replay-deterministic);
    4. survivors return WITH their band/signature rows — append those to
       the state tables to complete the epoch.

    Returns ``(survivor_docs, survivor_bands, survivor_sigs)``. The batch
    signatures are cached (MEMORY_AND_DISK) for the duration of the epoch;
    callers running inside a long-lived loop (``streaming/ingest.py``) pass
    ``persisted`` (a list the cached frame is appended to) and unpersist it
    once the survivors and state tables are materialized — otherwise one
    cached frame per epoch accumulates until GC.
    """
    from pyspark import StorageLevel

    # persist, NOT localCheckpoint: inside a long-running foreachBatch an
    # executor loss makes truncated-lineage blocks unrecomputable and kills
    # the micro-batch; a persisted frame just recomputes
    sigs = minhash_signatures(
        new_docs, num_hashes=num_hashes, n=n, id_col=id_col, text_col=text_col
    ).persist(StorageLevel.MEMORY_AND_DISK)
    if persisted is not None:
        persisted.append(sigs)
    batch_bands = minhash_band_keys(
        sigs, num_hashes=num_hashes, bands=bands, id_col=id_col
    )

    # --- corpus probe -----------------------------------------------------
    cand = (
        batch_bands.alias("nb")
        .join(
            corpus_bands.select(
                F.col(id_col).alias("__cid"), "band", "bh"
            ).alias("cb"),
            ["band", "bh"],
        )
        .select(F.col(id_col), F.col("__cid"))
        .distinct()
    )
    matched = (
        cand.join(sigs.select(id_col, F.col("signature").alias("__ns")), id_col)
        .join(
            corpus_sigs.select(
                F.col(id_col).alias("__cid"),
                F.col("signature").alias("__cs"),
            ),
            "__cid",
        )
        .filter(
            estimated_jaccard(F.col("__ns"), F.col("__cs"), num_hashes)
            >= threshold
        )
        .select(id_col)
        .distinct()
    )
    fresh = new_docs.join(matched, id_col, "left_anti")
    # fresh_sigs feeds FOUR consumers (band keys, both sides of the pair
    # verify join, the survivor sigs) — uncached, every downstream action
    # would recompute the whole corpus-probe DAG per consumer
    fresh_sigs = sigs.join(matched, id_col, "left_anti").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if persisted is not None:
        persisted.append(fresh_sigs)

    # --- batch-internal near-dups ----------------------------------------
    fresh_bands = minhash_band_keys(
        fresh_sigs, num_hashes=num_hashes, bands=bands, id_col=id_col
    )
    l, r = fresh_bands.alias("l"), fresh_bands.alias("r")
    in_cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("a_id"),
            F.col(f"r.{id_col}").alias("b_id"),
        )
        .distinct()
    )
    pairs = (
        in_cand.join(
            fresh_sigs.select(
                F.col(id_col).alias("a_id"), F.col("signature").alias("__sa")
            ),
            "a_id",
        )
        .join(
            fresh_sigs.select(
                F.col(id_col).alias("b_id"), F.col("signature").alias("__sb")
            ),
            "b_id",
        )
        .filter(
            estimated_jaccard(F.col("__sa"), F.col("__sb"), num_hashes)
            >= threshold
        )
        .select("a_id", "b_id")
    )
    comp = duplicate_components(pairs, persisted=persisted)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    survivors = fresh.join(losers, id_col, "left_anti")
    surv_sigs = fresh_sigs.join(losers, id_col, "left_anti")
    surv_bands = minhash_band_keys(
        surv_sigs, num_hashes=num_hashes, bands=bands, id_col=id_col
    )
    return survivors, surv_bands, surv_sigs


def dedup_semantic(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    target_recall: float = 0.999,
    num_planes: int | None = None,
    num_tables: int | None = None,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """SemDeDup-style SEMANTIC deduplication: drop every embedding that is
    cosine-near a lower-id one, transitively — the representation-space
    twin of near-dup text removal (paraphrases, templated rewrites and
    cross-source copies collapse even when no n-gram survives).

    Composition of the scale primitives: SRP-LSH candidate pairs with exact
    cosine verify (:func:`embedding_neardup_pairs` — bucketed equi-join,
    never all-pairs), min-label connected components
    (:func:`duplicate_components`), anti-join the losers. Each duplicate
    cluster keeps exactly its min-id member (replay-deterministic).

    Returns the surviving rows (``keep_cols`` or all columns)."""
    spark = emb.sparkSession
    pairs = embedding_neardup_pairs(
        emb,
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        target_recall=target_recall,
        num_planes=num_planes,
        num_tables=num_tables,
    )
    # cut the pair lineage before the component loop: the SRP bucket
    # battery is a tables x planes x dim expression tree, and every action
    # the loop runs (convergence probes, checkpoints) would re-ANALYZE it
    # — seconds of driver time per action at production plane counts —
    # and the edge union would re-EXECUTE the pair DAG twice on top.
    # Track exactly the blocks THIS cut materializes (the pair checkpoint
    # plus the normalized-vector cache inside pair generation, whose lazy
    # persist first fills here) — releasing an entry-diff instead would
    # clobber blocks a concurrent job owns.
    before = set(_persistent_rdds(spark))
    pairs = pairs.localCheckpoint(eager=True)
    pair_ids = set(_persistent_rdds(spark)) - before
    comp = duplicate_components(pairs)
    # comp is self-contained (duplicate_components materializes + cleans
    # its own intermediates); the pair blocks are now unreachable
    for rid, j in _persistent_rdds(spark).items():
        if rid in pair_ids:
            j.unpersist(False)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    out = emb.join(losers, id_col, "left_anti")
    return out.select(*keep_cols) if keep_cols else out


def cross_source_fuzzy_overlap(
    df: DataFrame,
    threshold: float = 0.8,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """NEAR-dup content overlap matrix between sources: for every source
    pair (a < b), how many cross-source near-duplicate document pairs
    (word-3-gram Jaccard >= threshold) exist — the fuzzy twin of
    :func:`cross_source_overlap`, catching re-crawls that were re-templated
    or lightly edited and so share no exact fingerprint.

    Candidates come from the banded MinHash join (``minhash_lsh_pairs`` —
    bucketed equi-join + exact verify, never all-pairs); sources attach by
    joining the (tiny) pair list back to the id->source projection, so the
    only full-corpus shuffles are LSH's own. Output is bounded by
    |sources|^2/2 rows."""
    pairs = minhash_lsh_pairs(
        df, threshold=threshold, id_col=id_col, text_col=text_col
    )
    src = df.select(F.col(id_col), F.col(source_col).alias("__src"))
    return (
        pairs.join(
            src.withColumnRenamed(id_col, "a_id")
            .withColumnRenamed("__src", "__sa"),
            "a_id",
        )
        .join(
            src.withColumnRenamed(id_col, "b_id")
            .withColumnRenamed("__src", "__sb"),
            "b_id",
        )
        .filter(F.col("__sa") != F.col("__sb"))
        .select(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("neardup_pairs"))
    )


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact shingle-CONTAINMENT pairs: ``(a_id, b_id, containment)`` where
    C(a→b) = |S(a) ∩ S(b)| / |S(a)| >= threshold — the ASYMMETRIC near-dup
    relation Jaccard misses: a short document quoted wholesale inside a
    longer one (press-release reposts, boilerplate-wrapped articles) has
    high containment but low Jaccard, because the union is dominated by the
    container. Both directions are reported independently (near-identical
    docs qualify both ways); a_id is always the CONTAINED side.

    Candidates are exact/lossless by prefix filtering on the CONTAINED
    side only: a needs |S(a)∩S(b)| >= ceil(t·|S(a)|), so missing all of
    a's |S(a)| − ceil(t·|S(a)|) + 1 rarest shingles is impossible — a
    indexes just that prefix. The CONTAINER side cannot be pruned (its
    required overlap is not a fraction of ITS size), so it carries the
    full inverted index — but every join key is one of a's RARE prefix
    shingles, so posting lists stay short exactly where they are joined:
    candidate count is Σ_s pref(s)·df(s) with pref mass concentrated on
    low-df shingles. Verify is the exact array intersection over
    candidates only."""
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    from momyre_spark.functions.numeric import round_half_up

    sh = _shingled(docs, id_col, text_col, n)
    sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    ex = sh.select(
        "__id", F.size("__sh").alias("__n"), F.explode("__sh").alias("s")
    )
    freq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy("__id").orderBy(F.col("__df").asc(), F.col("s"))
    prefix = (
        ex.join(freq, "s")
        .withColumn("__rk", F.row_number().over(w))
        .filter(
            F.col("__rk")
            <= F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n")) + 1
        )
        .select("__id", "s")
    )
    cand = (
        prefix.alias("a")
        .join(
            ex.select("__id", "s").alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.__id") != F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("a_id"), F.col("b.__id").alias("b_id"))
        .distinct()
    )
    sa = sh.select(F.col("__id").alias("a_id"), F.col("__sh").alias("__sa"))
    sb = sh.select(F.col("__id").alias("b_id"), F.col("__sh").alias("__sb"))
    cont = (
        F.size(F.array_intersect("__sa", "__sb"))
        / F.size("__sa").cast("double")
    )
    return (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("containment", cont)
        .filter(F.col("containment") >= threshold)
        .select(
            "a_id", "b_id",
            round_half_up(F.col("containment"), 4).alias("containment"),
        )
    )


def frequency_cap(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    star_gate: int = 250_000,
    salt_buckets: int = 64,
    persisted: list[DataFrame] | None = None,
) -> DataFrame:
    """Cap exact-duplicate multiplicity at ``k`` copies — the softer
    alternative to full dedup: a capped amount of natural repetition is
    kept (high-quality documents ARE re-hosted), unbounded repetition is
    cut. Every input row is emitted with its content key, cluster size,
    the keep verdict, and ``copy_rank`` — the row's rank among its
    copies (stable: ordered by id) where that rank is ``<= k``, NULL
    beyond the cap. Downstream filters on ``kept``.

    ``copy_rank`` is deliberately NULL past the cap: an exact rank for
    EVERY member of a duplicate cluster requires totally ordering the
    cluster in one task (a window cannot be skew-split), so a
    10^7-copy boilerplate cluster — routine in web corpora — would land
    one executor with the whole sort. Ranks at or below ``k`` are the
    only ones the capping decision consumes, and the plan routes each
    CLUSTER to the cheapest shape that stays bounded (the star-guard
    gate, wired per-row with no extra action):

    1. cluster sizes via ``groupBy(key).count()`` + join back — partial
       (map-side) aggregation collapses a giga-cluster to one row per
       input partition before the exchange, and the join back is AQE
       skew-splittable (never a count-window);
    2. singletons (the overwhelming mass of a real corpus) bypass
       ranking entirely (rank 1, kept);
    3. duplicate rows take ONE rank window partitioned by (key, salt)
       with a CONDITIONAL salt: 0 for clusters at or under
       ``star_gate`` (the partition is then the whole cluster —
       bounded by the gate — so the local rank IS the exact global
       rank and those rows are DONE after this single exchange), an
       id-hash bucket for giga-clusters (each sort handles
       cluster/salt_buckets rows; any global top-k id is necessarily
       in its bucket's top-k);
    4. only the GIGA survivors (<= k * salt_buckets per giga-cluster —
       usually zero rows) take the second per-key window for their
       exact global rank. The k-per-cluster survivor frame is
       persisted once and read by both branches.
    Winners join back on the unique id. The salt is a row-level
    expression over the already-computed size — data-driven routing
    like the CC/PageRank driver gates, but with zero extra Spark jobs,
    one shared pipeline, and route-invariant SEMANTICS (pinned by the
    star_gate=1 pytest).

    No window in the plan ever sees a partition larger than
    max(star_gate, k * salt_buckets) rows. The skew safety is not
    free on mostly-unique corpora (the sizes groupBy+join costs more
    than the count-window it replaces when sizes is corpus-sized) —
    SCALE.md (round 9) records the measured trade on both corpus
    shapes.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("momyre: k must be >= 1")
    if star_gate < 1:
        raise ValueError("momyre: star_gate must be >= 1")
    # __jkey is the null-safe GROUPING/JOIN key: md5 of a NULL text is
    # NULL, and an equi-join on NULL matches nothing — rows with NULL
    # text would silently vanish, breaking the "every input row is
    # emitted with its verdict" contract (and diverging from the window
    # oracle, where PARTITION BY groups all NULLs together). The emitted
    # content_key stays the real (possibly NULL) md5. No collision risk:
    # the sentinel is not a 32-hex-char md5 string. Two projections so
    # __jkey references the ALREADY-COMPUTED __key column — Catalyst
    # does not CSE across references, and an inline second md5 doubles
    # the dominant per-row cost (measured: the giga probe read 14.1s
    # with the double hash vs 3.7s single).
    keyed = df.select(
        id_col, F.md5(F.col(text_col)).alias("__key")
    ).withColumn(
        "__jkey", F.coalesce(F.col("__key"), F.lit("__momyre_null__"))
    )
    sizes = keyed.groupBy("__jkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_copies")
    )
    base = keyed.join(sizes, "__jkey")
    from pyspark import StorageLevel

    salt = F.when(
        F.col("n_copies") > star_gate,
        # 1 + bucket: salt 0 unambiguously means "sub-gate cluster"
        F.lit(1) + F.pmod(F.xxhash64(F.col(id_col)), F.lit(int(salt_buckets))),
    ).otherwise(F.lit(0).cast("bigint"))
    w_local = Window.partitionBy("__jkey", "__salt").orderBy(F.col(id_col))
    # survivors: <= k rows per sub-gate cluster (their partition was the
    # whole cluster, so __local_rank IS the exact global rank), <= k per
    # (giga-cluster, bucket). Persisted because two branches read it —
    # it is k-per-cluster sized, a sliver of the corpus; released by the
    # session's clearCache lifecycle or the caller's `persisted` list
    # (the hamming_neardup_pairs contract).
    survivors = (
        base.filter(F.col("n_copies") > 1)
        .select(id_col, "__jkey", salt.alias("__salt"))
        .withColumn("__local_rank", F.row_number().over(w_local))
        .filter(F.col("__local_rank") <= k)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if persisted is not None:
        persisted.append(survivors)
    unsalted = survivors.filter(F.col("__salt") == 0).select(
        F.col(id_col), F.col("__local_rank").cast("bigint").alias("__rank")
    )
    w_global = Window.partitionBy("__jkey").orderBy(F.col(id_col))
    salted = (
        survivors.filter(F.col("__salt") != 0)
        .withColumn("__rank", F.row_number().over(w_global).cast("bigint"))
        .filter(F.col("__rank") <= k)
        .select(F.col(id_col), "__rank")
    )
    winners = unsalted.unionByName(salted)
    rank = F.when(
        F.col("n_copies") == 1, F.lit(1).cast("bigint")
    ).otherwise(F.col("__rank"))
    return (
        base.join(winners, id_col, "left")
        .select(
            id_col,
            F.col("__key").alias("content_key"),
            rank.alias("copy_rank"),
            "n_copies",
            rank.isNotNull().alias("kept"),
        )
    )


def cluster_size_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    key: str = "exact",
) -> DataFrame:
    """Duplicate-cluster size histogram — the one-screen dedup health
    readout a pipeline checks BEFORE committing to a dedup strategy:
    how much of the corpus is duplicated, in clusters of what size, and
    how much a keep-one policy would remove. Output one row per
    observed cluster size: ``(cluster_size, n_clusters, n_docs,
    removable_docs)`` with ``removable_docs = (size - 1) * n_clusters``
    (what exact dedup would cut) — so ``sum(n_docs)`` is the corpus and
    the size-1 row is the unique mass.

    ``key`` picks the granularity ('exact' / 'bow'), the same
    convention as cluster_weighted_sample / frequency_cap.

    Shape: two hash aggregations, both map-side combinable — fingerprint
    -> count (the exact-dedup exchange; a giga-cluster collapses to one
    row per input partition before the shuffle), then count -> histogram
    over at most distinct-sizes rows (tiny). All columns exact BIGINT;
    no floats anywhere.
    """
    from momyre_spark.functions.text import content_fingerprint, fingerprint

    if key == "exact":
        fp = fingerprint(F.col(text_col))
    elif key == "bow":
        fp = content_fingerprint(F.col(text_col))
    else:
        raise ValueError("momyre: key must be 'exact' or 'bow'")
    sizes = (
        df.select(fp.alias("__fp"))
        .groupBy("__fp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cluster_size"))
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters"))
            .cast("bigint")
            .alias("removable_docs"),
        )
    )
