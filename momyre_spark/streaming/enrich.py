"""Stream-static enrichment: join a CDC/event stream against a slowly
changing dimension, refreshing the dimension per micro-batch.

The reference joins nothing at apply time — its sink rows are exactly the
decoded source fields (/root/reference/app/run.go:301-322). A warehouse
feed almost always wants the join ON THE WAY IN (events x user dim, ops x
routing table), and the 100 TB-scale rules are:

- the dimension is broadcast (it is dimension-sized by definition) so the
  stream side never shuffles — enrichment stays a map-only stage riding
  the stream's existing partitioning;
- Spark's built-in stream-static join evaluates the static plan inside
  each micro-batch, but file-source dims resolve their FILE LISTING once
  at plan time — an overwritten dim parquet dir is NOT picked up (and a
  mid-read overwrite can even fail the batch). ``start_enriched_sink``
  therefore re-LOADS the dimension per batch inside foreachBatch: each
  epoch reads a consistent snapshot (point a ``dim_loader`` at a
  sinks/snapshots.py table for versioned reads), which is the semantics a
  slowly-changing dim needs.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def enrich_stream(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: Sequence[str] | str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Plain stream-static join (dimension FIXED at plan time). Use for
    dims that do not change over the stream's lifetime; for refresh-per-
    batch semantics use :func:`start_enriched_sink`."""
    dim = F.broadcast(dim_df) if broadcast_dim else dim_df
    return stream_df.join(dim, on, how)


def start_enriched_sink(
    stream_df: DataFrame,
    dim_loader: Callable[[SparkSession], DataFrame],
    on: Sequence[str] | str,
    sink_fn: Callable[[DataFrame, int], Any],
    checkpoint: str,
    how: str = "left",
    broadcast_dim: bool = True,
    trigger_once: bool = False,
) -> StreamingQuery:
    """Enrich each micro-batch with a FRESHLY LOADED dimension and hand the
    joined frame to ``sink_fn(df, epoch_id)``.

    ``dim_loader`` runs on the driver once per batch — cheap (plan-only;
    the read itself is distributed) and the price of correctness for dims
    that change while the stream runs. Exactly-once composes the usual
    way: the checkpoint dedups epochs, and ``sink_fn`` should be
    idempotent per epoch (e.g. sinks/jdbc_upsert or snapshot_merge_cdc
    with ``batch_id=epoch_id``)."""

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        dim = dim_loader(batch_df.sparkSession)
        if broadcast_dim:
            dim = F.broadcast(dim)
        sink_fn(batch_df.join(dim, on, how), epoch_id)

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
