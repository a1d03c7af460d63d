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
- embedding_cosine: near-dup pairs in embedding space (delegates to
                    operators/similarity.py primitives)

No Python UDFs anywhere — shingling, hashing, banding and verification are
all built-in higher-order functions, so the whole plan stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from momyre_spark.functions.numeric import round_half_up
from momyre_spark.functions.text import fingerprint, shingles


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
    return docs.select(
        F.col(id_col).alias("__id"), shingles(F.col(text_col), n).alias("__sh")
    ).filter(F.size("__sh") > 0)


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram-Jaccard near-duplicate pairs (a < b, jaccard >= threshold).

    Inverted-index join: explode distinct shingles, self-join on the shingle,
    count per pair. Candidate universe = pairs sharing at least one shingle —
    at scale, shingle frequency skew is the hazard; very frequent shingles
    can be capped (``max_shingle_freq``-style document-frequency pruning is a
    natural extension; for threshold >= 0.5 prune-safe variants exist).
    Output jaccard is exact integer arithmetic divided once at the end.
    """
    sh = _shingled(docs, id_col, text_col, n)
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


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 128,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """K-permutation MinHash signature per document.

    Permutation k is simulated as ``xxhash64(shingle, seed=k)`` (Spark's
    xxhash64 takes a per-call seed via extra literal column); the signature
    component is the min over the document's shingle set. Entirely columnar:
    one transform producing an array<long> of size K, min-aggregated via
    higher-order functions — no explode, no shuffle until LSH banding.
    """
    sh = _shingled(docs, id_col, text_col, n)

    # NB: the lambda must take exactly ONE parameter — PySpark binds a second
    # transform-lambda parameter to the array index, which would silently
    # replace the per-permutation seed.
    def component(k: int):
        return F.array_min(F.transform("__sh", lambda s: F.xxhash64(s, F.lit(k))))

    sig = F.array(*[component(k) for k in range(num_hashes)])
    return sh.select(F.col("__id").alias(id_col), sig.alias("signature"))


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

    With ``verify=True`` candidates are confirmed with the exact Jaccard on
    shingle sets, so output = true near-duplicates (same contract as
    ``ngram_jaccard_pairs``, at a fraction of the join fan-in).
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes, n, id_col, text_col)
    band_arr = F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at("signature", b * rows + r + 1).cast("string")
                        for r in range(rows)
                    ],
                ),
                F.lit(b),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select(
        F.col(id_col).alias("__id"), F.posexplode(band_arr).alias("band", "bh")
    )
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(F.col("l.__id").alias("a_id"), F.col("r.__id").alias("b_id"))
        .distinct()
    )
    if not verify:
        return cand
    exact = ngram_jaccard_pairs(docs, threshold, n, id_col, text_col)
    return cand.join(exact, ["a_id", "b_id"]).select("a_id", "b_id", "jaccard")


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 63
) -> DataFrame:
    """SimHash per document: sign of the per-bit vote over token hashes.

    bit_i(fp) = 1 iff sum over tokens of (+1 if bit_i(xxhash64(token)) else -1) > 0.
    63 bits so the fingerprint stays in a non-negative signed long. Bit
    positions are Python ints unrolled at plan-build time (shift amounts
    cannot be Columns), so this is one wide codegen'd projection: tokens ->
    hashes -> 63 fold-votes -> fingerprint.
    """
    from momyre_spark.functions.text import tokens

    toks = tokens(F.col(text_col))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def vote(i: int):
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftrightunsigned(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            ),
        )

    fp = F.lit(0).cast("long")
    for i in range(bits):
        fp = fp + F.when(vote(i) > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return docs.select(F.col(id_col), fp.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked by 16-bit chunks.

    Pigeonhole: distance <= 3 over 4 chunks -> at least one chunk identical,
    so the join key is (chunk_index, chunk_value) — never all-pairs.
    """
    fps = simhash_fingerprints(docs, id_col, text_col)
    chunk = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), k * 16).bitwiseAND(F.lit(0xFFFF))
            for k in range(4)
        ]
    )
    blocked = fps.select(
        F.col(id_col).alias("__id"),
        F.col("simhash"),
        F.posexplode(chunk).alias("chunk", "cv"),
    )
    l, r = blocked.alias("l"), blocked.alias("r")
    ham = F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash")))
    return (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.cv") == F.col("r.cv"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .filter(ham <= max_hamming)
        .select(
            F.col("l.__id").alias("a_id"),
            F.col("r.__id").alias("b_id"),
            ham.alias("hamming"),
        )
        .distinct()
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (brute force — see
    operators/similarity.py for the bucketed scale path)."""
    from momyre_spark.functions.vectors import cosine

    a = emb.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("a_id", "b_id", round_half_up(F.col("cos"), 4).alias("cos"))
    )
