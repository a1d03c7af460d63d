"""Input-layout robustness: heavy map stages must not inherit a bad layout.

A corpus often arrives as few large files (one gzip shard, a single parquet
part) — the scan then has fewer partitions than the cluster has cores, and
every downstream map stage serializes. Operators whose per-row work is
expensive (shingling, hashing, K-wide aggregates) call
``ensure_parallelism`` before the heavy stage: one cheap round-robin
repartition up to the session's default parallelism, skipped whenever the
input is already parallel enough (the common case at scale, where upstream
layout is many ~128 MB splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the frame has fewer partitions than the session's
    parallelism (or ``min_partitions``). No-op on well-laid-out input."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
