"""Streaming corpus ingestion: continuous crawl batches -> curated,
deduplicated, versioned training corpus.

The streaming twin of the batch curation path: each micro-batch of raw
documents is quality-gated (map-only), exact-deduplicated against the
WHOLE corpus so far (``operators/dedup.dedup_incremental`` — the corpus
participates as its fingerprint table, O(|batch|) whatever the corpus
size), and the survivors are committed to the versioned snapshot store as
a new copy-on-write version. Readers time-travel a consistent corpus while
ingestion runs; a stalled crawler resumes from its checkpoint.

Exactly-once without a transaction spanning the two sinks:

- the SNAPSHOT commit carries foreachBatch's epoch as ``batch_id`` —
  ``snapshot_merge_cdc`` skips a replayed epoch outright;
- the FINGERPRINT table is laid out one directory per epoch
  (``_fps/epoch=N``, dynamic overwrite) — a replay rewrites the same
  directory with the same rows (survivors are a deterministic function of
  the batch and the PRE-batch fingerprint state, which a replay sees
  unchanged because this epoch's own fps live in the directory being
  rewritten and are excluded from the anti-join by the epoch filter).

Crash between the two writes replays the epoch: the snapshot skips, the
fps directory is (re)written — both sides converge.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from momyre_spark.functions.text import fingerprint, quality_score, token_count


def start_corpus_ingest(
    docs_stream: DataFrame,
    root: str,
    checkpoint: str,
    fields: dict[str, str],
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 3,
    min_quality: float = 0.0,
    partition_by: list[str] | None = None,
    trigger: dict | None = None,
    fuzzy_threshold: float | None = None,
    fuzzy_num_hashes: int = 128,
    fuzzy_bands: int = 32,
) -> StreamingQuery:
    """Run the gate -> incremental-dedup -> snapshot-commit loop over a
    streaming frame of documents. ``fields`` is the snapshot column->type
    spec (must include ``text_col``; ``id_col`` is the merge key).

    ``fuzzy_threshold`` additionally drops NEAR-duplicates of the corpus:
    the LSH state (banded MinHash keys + signatures,
    ``operators/dedup.dedup_incremental_fuzzy``) is maintained next to the
    fingerprint table with the same epoch-directory idempotence — a replay
    rewrites its own epoch's state and probes only earlier epochs.
    Returns the started StreamingQuery."""
    from momyre_spark.operators.dedup import (
        dedup_incremental,
        dedup_incremental_fuzzy,
    )
    from momyre_spark.sinks.snapshots import snapshot_merge_cdc

    fps_dir = f"{root}/_fps"
    bands_dir = f"{root}/_lsh_bands"
    sigs_dir = f"{root}/_lsh_sigs"
    cols = list(fields)

    def _read_state(spark, path, schema, epoch):
        try:
            return spark.read.parquet(path).filter(F.col("epoch") < epoch)
        except AnalysisException as e:
            if ("PATH_NOT_FOUND" not in str(e)
                    and "Path does not exist" not in str(e)):
                raise
            return spark.createDataFrame([], schema + ", epoch long")

    def apply(batch_df: DataFrame, epoch: int) -> None:
        spark = batch_df.sparkSession
        t = F.col(text_col)
        gated = batch_df.filter(
            (token_count(t) >= min_tokens) & (quality_score(t) >= min_quality)
        )
        # ONLY a missing state table means "first epoch" (_read_state) —
        # any other read failure fails the batch rather than silently
        # deduping against an empty corpus and committing duplicates.
        fps = _read_state(spark, fps_dir, "fp string", epoch)
        survivors = dedup_incremental(
            gated, fps, id_col=id_col, text_col=text_col
        )
        surv_bands = surv_sigs = None
        if fuzzy_threshold is not None:
            bands = _read_state(
                spark, bands_dir, f"{id_col} long, band int, bh long", epoch
            )
            sigs = _read_state(
                spark, sigs_dir, f"{id_col} long, signature array<bigint>",
                epoch,
            )
            survivors, surv_bands, surv_sigs = dedup_incremental_fuzzy(
                survivors,
                bands.drop("epoch"),
                sigs.drop("epoch"),
                threshold=fuzzy_threshold,
                num_hashes=fuzzy_num_hashes,
                bands=fuzzy_bands,
                id_col=id_col,
                text_col=text_col,
            )
        acts = survivors.select(
            F.col(id_col).cast("string").alias("_id"),
            F.lit("upsert").alias("__action"),
            *cols,
            F.array(*[F.lit(c) for c in cols]).alias("__present"),
        )
        snapshot_merge_cdc(
            spark,
            root,
            acts,
            fields,
            partition_by=partition_by,
            batch_id=epoch,
        )
        (
            survivors.select(fingerprint(t).alias("fp"))
            .distinct()
            .write.mode("overwrite")
            .parquet(f"{fps_dir}/epoch={epoch}")
        )
        if fuzzy_threshold is not None:
            surv_bands.write.mode("overwrite").parquet(
                f"{bands_dir}/epoch={epoch}"
            )
            surv_sigs.write.mode("overwrite").parquet(
                f"{sigs_dir}/epoch={epoch}"
            )

    writer = docs_stream.writeStream.foreachBatch(apply).option(
        "checkpointLocation", checkpoint
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
