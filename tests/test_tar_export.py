"""Tar-shard export/import (sinks/export.py): the trainer handoff format."""

from __future__ import annotations

import glob
import hashlib
import os
import tarfile

from pyspark.sql import Row
from pyspark.sql import functions as F

from momyre_spark.operators.sampling import assign_shards
from momyre_spark.sinks.export import read_tar_shards, write_tar_shards


def _docs(spark, n=60):
    return assign_shards(
        spark.createDataFrame(
            [Row(doc_id=i, payload=f"document body {i} " * 3) for i in range(n)]
        ),
        num_shards=4,
    )


def test_roundtrip_preserves_every_sample(spark, tmp_path):
    out = str(tmp_path / "tars")
    df = _docs(spark)
    n = write_tar_shards(df, out, payload_col="payload")
    assert n == 4 and len(glob.glob(f"{out}/shard-*.tar")) == 4
    back = read_tar_shards(spark, f"{out}/shard-*.tar")
    got = {
        int(r["key"]): bytes(r["payload"]).decode()
        for r in back.collect()
    }
    want = {r["doc_id"]: r["payload"] for r in df.collect()}
    assert got == want


def test_export_bytes_are_deterministic(spark, tmp_path):
    """Same rows -> binary-identical shards, regardless of layout: the
    checksum-auditable trainer contract."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    df = _docs(spark, 40)
    write_tar_shards(df, a)
    write_tar_shards(df.repartition(13), b)

    def digests(d):
        return {
            os.path.basename(p): hashlib.sha256(open(p, "rb").read()).hexdigest()
            for p in glob.glob(f"{d}/shard-*.tar")
        }

    da, db = digests(a), digests(b)
    assert da == db and len(da) == 4


def test_members_sorted_and_metadata_pinned(spark, tmp_path):
    out = str(tmp_path / "tars")
    write_tar_shards(_docs(spark, 30), out)
    p = sorted(glob.glob(f"{out}/shard-*.tar"))[0]
    with tarfile.open(p) as tar:
        names = [m.name for m in tar.getmembers()]
        assert names == sorted(names)
        assert all(m.mtime == 0 and m.uid == 0 for m in tar.getmembers())


def test_binary_payloads(spark, tmp_path):
    out = str(tmp_path / "tars")
    df = spark.createDataFrame(
        [Row(doc_id=i, shard=i % 2, payload=bytes([i, 255 - i, 0]))
         for i in range(10)]
    )
    write_tar_shards(df, out, suffix=".bin")
    back = read_tar_shards(spark, f"{out}/shard-*.tar")
    got = {int(r["key"]): bytes(r["payload"]) for r in back.collect()}
    assert got == {i: bytes([i, 255 - i, 0]) for i in range(10)}
