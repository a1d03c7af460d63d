"""Multimodal-column queries (operators/multimodal.py).

The binary payload is manufactured from ``documents.text`` (utf-8) since the
testdata has no media table; the mapInPandas plumbing (Arrow batches, typed
output schema, 1->N frame fan-out) is exactly what a real decoder would use.
Payloads are pure ASCII here, so the DuckDB oracle can compute the same
digests over text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from momyre_spark.plans import query
from momyre_spark.sources.parquet import load_table


@query(
    "mm_image_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS digest,
           CAST(64 + octet_length(encode(text)) % 512 AS INT) AS width,
           CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INT) AS height,
           CAST(3 AS INT) AS channels
    FROM documents ORDER BY doc_id
    """,
)
def mm_image_meta(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.multimodal import extract_image_meta, with_binary_payload

    docs = load_table(spark, sf, "documents")
    return extract_image_meta(with_binary_payload(docs)).orderBy("doc_id")


@query(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id, CAST(fi AS INT) AS frame_idx,
           md5(substring(text, fi * 100 + 1, 100)) AS frame_digest
    FROM (SELECT doc_id, text,
                 unnest(range(0, length(text) // 100)) AS fi
          FROM documents) t
    WHERE fi % 4 = 0
    ORDER BY doc_id, frame_idx
    """,
)
def mm_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.multimodal import sample_frames, with_binary_payload

    docs = load_table(spark, sf, "documents")
    return sample_frames(with_binary_payload(docs)).orderBy("doc_id", "frame_idx")


@query(
    "mm_audio_meta",
    oracle="""
    WITH p AS (
        SELECT doc_id,
               8000 + (doc_id % 4) * 4000 AS rate,
               500 + n_chars % 1000 AS n_samples
        FROM documents
    ),
    s AS (
        SELECT doc_id, rate, n_samples,
               abs((doc_id * 31 + t.i * 7) % 65536 - 32768) AS a
        FROM p, unnest(range(0, n_samples)) AS t(i)
    )
    SELECT doc_id,
           CAST(rate AS INT) AS rate,
           CAST(1 AS INT) AS channels,
           CAST(n_samples AS BIGINT) AS n_samples,
           CAST((n_samples * 1000) // rate AS BIGINT) AS duration_ms,
           CAST(sum(a) AS BIGINT) AS sum_abs,
           CAST(max(a) AS INT) AS peak
    FROM s GROUP BY doc_id, rate, n_samples ORDER BY doc_id
    """,
)
def mm_audio_meta(spark: SparkSession, sf: str) -> DataFrame:
    """REAL RIFF/WAV container parse + int16 PCM decode (numpy, no audio
    lib — the netpbm move for audio); payloads synthesized deterministically
    so the oracle can mirror the expected aggregates arithmetically."""
    from momyre_spark.operators.multimodal import (
        extract_audio_meta, with_wav_payload,
    )

    docs = load_table(spark, sf, "documents")
    return extract_audio_meta(with_wav_payload(docs)).orderBy("doc_id")


# Rows-only: the image-dhash pipeline (netpbm decode -> integral-image box
# means -> difference bits) is not SQL-expressible. Correctness is pinned by
# tests/test_multimodal_ops.py: dhash invariance under re-rendering at other
# resolutions, noise tolerance, planted-pair recovery at exactly the
# expected ids, inter-image distance floor, and a no-CartesianProduct plan
# assert on the pigeonhole block join.
@query("mm_image_dhash_pairs")
def mm_image_dhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual near-dup image pairs: with_image_payload plants a
    scale-variant noisy copy of every 50th document's picture; dhash +
    pigeonhole hamming join recovers them without any all-pairs compare."""
    from momyre_spark.operators.multimodal import (
        image_neardup_pairs, with_image_payload,
    )

    docs = load_table(spark, sf, "documents")
    return image_neardup_pairs(
        with_image_payload(docs), max_hamming=6
    ).orderBy("a_id", "b_id")


@query(
    "mm_video_meta",
    oracle="""
    WITH p AS (
        SELECT doc_id,
               24 + n_chars % 480 AS n_frames,
               320 + (doc_id % 4) * 160 AS width,
               180 + (doc_id % 4) * 90 AS height,
               24 + (doc_id % 2) * 6 AS fps
        FROM documents
    )
    SELECT doc_id,
           CAST(width AS INT) AS width,
           CAST(height AS INT) AS height,
           CAST(round(1000000000.0 / (1000000 // fps)) AS BIGINT) AS fps_x1000,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST((n_frames * (1000000 // fps)) // 1000 AS BIGINT) AS duration_ms
    FROM p ORDER BY doc_id
    """,
)
def mm_video_meta(spark: SparkSession, sf: str) -> DataFrame:
    """REAL AVI container-header parse (RIFF walk into LIST(hdrl)/avih —
    the WAV move for video): typed dimensions/fps/duration at
    header-IO cost, no codec. Payloads synthesized deterministically so
    the oracle mirrors the header arithmetic (integer usec-per-frame
    rounding included)."""
    from momyre_spark.operators.multimodal import (
        extract_video_meta, with_avi_payload,
    )

    docs = load_table(spark, sf, "documents")
    return extract_video_meta(with_avi_payload(docs)).orderBy("doc_id")


# Rows-only: WAV decode -> integral envelope -> delta bits is not SQL.
# Correctness pinned by tests/test_multimodal_ops.py: duration/rate
# invariance (exact), edit tolerance, separation, fail-stop, planted
# transcode recovery, no-cartesian plan.
@query("mm_audio_dedup")
def mm_audio_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Audio near-dup pairs over deterministic AM-WAV payloads: every 50th
    document carries a TRANSCODE of its predecessor's recording (different
    length and sample rate); the envelope fingerprint collides exactly, so
    the collapse guard emits it as a (rep, member, 0) star edge."""
    from momyre_spark.operators.multimodal import (
        audio_neardup_pairs, with_am_wav_payload,
    )

    docs = load_table(spark, sf, "documents")
    return audio_neardup_pairs(
        with_am_wav_payload(docs), max_hamming=3
    ).orderBy("a_id", "b_id")


# Rows-only (image/audio decode not SQL): pinned by the per-modality tests
# plus determinism through the entry surface. The composition itself is
# pure DataFrame algebra: three pair sets union into one edge list, one
# min-label propagation.
@query("dedup_multimodal_groups")
def dedup_multimodal_groups(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-modal duplicate groups: two documents belong together if ANY
    modality says so — exact/near text (SimHash), perceptual image hash, or
    audio envelope fingerprint. The union of three bucketed pair joins
    feeds one connected-components pass; output is (doc_id, component,
    n_members) per grouped document.

    The shape a multimodal corpus needs: each modality's candidate
    generation stays its own bounded bucket join (never all-pairs), and
    evidence fuses at the EDGE level, so adding a modality is a unionByName
    — not a new pipeline."""
    from pyspark.sql import functions as F

    from momyre_spark.operators.dedup import (
        duplicate_components,
        simhash_pairs,
    )
    from momyre_spark.operators.multimodal import (
        audio_neardup_pairs,
        image_neardup_pairs,
        with_am_wav_payload,
        with_image_payload,
    )

    docs = load_table(spark, sf, "documents")
    # Radii are deliberately TIGHTER than the single-modality queries:
    # components take the transitive closure of the UNION, so each
    # modality's false-positive tail multiplies — loose radii chain the
    # corpus into one giant component (observed: radius 6/3 -> a 477-doc
    # blob at 500 docs; radius 2/1 -> true duplicate groups).
    text_pairs = simhash_pairs(docs, max_hamming=2).select("a_id", "b_id")
    img_pairs = image_neardup_pairs(
        with_image_payload(docs), max_hamming=2
    ).select("a_id", "b_id")
    audio_pairs = audio_neardup_pairs(
        with_am_wav_payload(docs), max_hamming=1
    ).select("a_id", "b_id")
    edges = text_pairs.unionByName(img_pairs).unionByName(audio_pairs)
    comp = duplicate_components(edges)
    sizes = comp.groupBy("component").agg(F.count("*").alias("n_members"))
    return (
        comp.join(sizes, "component")
        .select(F.col("id").alias("doc_id"), "component", "n_members")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Video scene-change detection (operators/multimodal.scene_changes): the
# per-frame luma track with a lag-window cut detector, over the same
# deterministic byte-window frame model as mm_frame_sample (payload =
# UTF-8 text bytes, one frame per 100-byte window; the fixture corpus is
# ASCII so the oracle can mirror byte sums as ascii(char) sums — the same
# assumption mm_frame_sample's green oracle already relies on).
#
# Registered round 8 (was staged through round 7 under the ~50-row
# driver budget).
# Pre-validated end-to-end by tests/test_multimodal_ops.py::
# test_mm_video_scenes_oracle_parity (same compare as the driver).
# --------------------------------------------------------------------------
_MM_SCENES_ORACLE = """
    WITH ch AS (
        SELECT doc_id, text,
               unnest(range(0, (length(text) // 100) * 100)) AS p
        FROM documents
    ),
    f AS (
        SELECT doc_id, (p // 100) AS fi,
               SUM(ascii(substr(text, CAST(p + 1 AS INT), 1))) AS s,
               COUNT(*) AS n
        FROM ch GROUP BY 1, 2
    ),
    luma AS (
        SELECT doc_id, CAST(fi AS INT) AS frame_idx,
               CAST((s * 100 + n // 2) // n AS BIGINT) AS luma_centi
        FROM f
    ),
    d AS (
        SELECT doc_id, frame_idx, luma_centi,
               luma_centi - lag(luma_centi) OVER (
                   PARTITION BY doc_id ORDER BY frame_idx
               ) AS delta_centi
        FROM luma
    )
    SELECT doc_id, frame_idx, luma_centi, delta_centi,
           CAST(CASE WHEN delta_centi IS NOT NULL
                     THEN abs(delta_centi) > 1500 END AS INT) AS is_cut
    FROM d ORDER BY doc_id, frame_idx
"""


@query("mm_video_scenes", oracle=_MM_SCENES_ORACLE)
def mm_video_scenes(spark: SparkSession, sf: str) -> DataFrame:
    # is_cut ships as nullable INT, not BOOLEAN: a NULL boolean renders
    # as None from Spark's toPandas but as float nan from DuckDB's
    # fetchdf, so the driver-mirror value hash can never match — a
    # nullable INT widens to float64/nan identically on BOTH sides
    # (found by the sf0.01 staged-queue mirror; the sf0.001 tuple
    # compare can't see pandas rendering).
    from pyspark.sql import functions as F

    from momyre_spark.operators.multimodal import (
        scene_changes,
        with_binary_payload,
    )

    docs = load_table(spark, sf, "documents")
    return (
        scene_changes(with_binary_payload(docs))
        .withColumn("is_cut", F.col("is_cut").cast("int"))
        .orderBy("doc_id", "frame_idx")
    )
