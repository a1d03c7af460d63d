"""Tar-shard export/import — the WebDataset-style trainer handoff.

Training loaders stream tar shards of samples (one file per sample,
grouped so a reader consumes whole shards sequentially); this module
writes them straight from a DataFrame and reads them back, with no
library beyond stdlib ``tarfile``:

- ``write_tar_shards``: one tar per shard value, built executor-side by
  repartitioning on the shard column (each task owns whole shards — the
  writer never merges across tasks, so shard count = file count and the
  job parallelizes by shard). Entries are sorted by sample key within a
  shard and timestamps are fixed at epoch 0, so a shard's bytes are a
  deterministic function of its rows — re-exports are binary-identical,
  which makes trainer-side caching and checksum audits possible.
- ``read_tar_shards``: ``binaryFile`` scan of the tars + an Arrow-batched
  tar walk back to (shard, key, payload) rows.

Pair with ``operators/sampling.assign_shards`` (stable hash shards) and
``global_shuffle`` (deterministic order) for the full export path.
"""

from __future__ import annotations

import io
import os
import tarfile
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_tar_shards(
    df: DataFrame,
    out_dir: str,
    shard_col: str = "shard",
    key_col: str = "doc_id",
    payload_col: str = "payload",
    suffix: str = ".txt",
) -> int:
    """Write one ``shard-<N>.tar`` per distinct shard value; each row
    becomes a ``<key><suffix>`` member. Returns the shard count.

    Payloads may be str or bytes columns. Rows repartition BY SHARD so a
    task owns complete shards; within a shard, members are sorted by key
    and all tar metadata is pinned (mtime 0, uid/gid 0) — the same rows
    always produce the same bytes.

    A shard is buffered in executor memory while its tar is built — size
    shards for the trainer (the usual 100 MB–1 GB), not the corpus:
    shard count comes from upstream ``assign_shards``, so corpus growth
    should grow the shard COUNT, holding per-shard bytes constant.
    """
    os.makedirs(out_dir, exist_ok=True)
    n_shards = df.select(shard_col).distinct().count()

    sel = df.select(
        F.col(shard_col).alias("__shard"),
        F.col(key_col).cast("string").alias("__key"),
        F.col(payload_col).alias("__payload"),
    ).repartition(max(n_shards, 1), "__shard")

    def write_partition(rows) -> None:
        # executors write to THEIR local view of out_dir: in cluster mode
        # this must be a shared filesystem mount; create the dir on the
        # executor too (the driver-side makedirs does not exist there)
        os.makedirs(out_dir, exist_ok=True)
        by_shard: dict = {}
        for r in rows:
            by_shard.setdefault(r["__shard"], []).append(
                (r["__key"], r["__payload"])
            )
        for shard, members in by_shard.items():
            path = os.path.join(out_dir, f"shard-{shard}.tar")
            with tarfile.open(path, "w") as tar:
                for key, payload in sorted(members):
                    data = (
                        payload.encode("utf-8")
                        if isinstance(payload, str)
                        else bytes(payload)
                    )
                    info = tarfile.TarInfo(name=f"{key}{suffix}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(data))

    sel.rdd.foreachPartition(lambda rows: write_partition(rows))
    return n_shards


def read_tar_shards(spark, path_glob: str) -> DataFrame:
    """Read tar shards back as ``(shard string, key string, payload
    binary)`` rows — binaryFile scan + Arrow-batched tar walk; shards
    parallelize by file."""
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                base = os.path.basename(path)
                shard = base.removeprefix("shard-").removesuffix(".tar")
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tar:
                    for member in tar.getmembers():
                        f = tar.extractfile(member)
                        if f is None:
                            continue
                        key = member.name.rsplit(".", 1)[0]
                        rows.append((shard, key, f.read()))
            yield pd.DataFrame(rows, columns=["shard", "key", "payload"])

    return raw.mapInPandas(walk, schema="shard string, key string, payload binary")
