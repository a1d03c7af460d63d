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
