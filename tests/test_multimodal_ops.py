"""Multimodal plumbing tests: Arrow batch schemas, 1->N fan-out, stub gating."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql.utils import PythonException

from momyre_spark.operators.multimodal import (
    extract_image_meta,
    sample_frames,
    with_binary_payload,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="a" * 250),
            Row(doc_id=2, text="hello world"),
            Row(doc_id=3, text="b" * 1000),
        ]
    )


def test_binary_payload_roundtrip(spark):
    df = with_binary_payload(_docs(spark))
    assert dict(df.dtypes) == {"doc_id": "bigint", "data": "binary"}
    row = {r["doc_id"]: bytes(r["data"]) for r in df.collect()}
    assert row[2] == b"hello world"


def test_extract_image_meta_schema_and_values(spark):
    out = extract_image_meta(with_binary_payload(_docs(spark)))
    assert dict(out.dtypes) == {
        "doc_id": "bigint", "n_bytes": "bigint", "digest": "string",
        "width": "int", "height": "int", "channels": "int",
    }
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_bytes"] == 250
    assert rows[1]["digest"] == hashlib.md5(b"a" * 250).hexdigest()
    assert rows[1]["width"] == 64 + 250 % 512
    assert rows[1]["height"] == 64 + (250 * 7) % 512
    assert rows[1]["channels"] == 3


def test_real_decode_mode_is_clearly_stubbed(spark):
    out = extract_image_meta(with_binary_payload(_docs(spark)), mode="real")
    with pytest.raises(PythonException, match="NotImplementedError"):
        out.collect()


def test_sample_frames_fanout(spark):
    out = sample_frames(with_binary_payload(_docs(spark)),
                        every_n_bytes=100, stride=4)
    rows = [r.asDict() for r in out.orderBy("doc_id", "frame_idx").collect()]
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 250 bytes -> 2 frames -> stride 4 keeps frame 0 only
    assert [f["frame_idx"] for f in by_doc[1]] == [0]
    # doc 2: 11 bytes -> 0 frames
    assert 2 not in by_doc
    # doc 3: 1000 bytes -> 10 frames -> 0,4,8
    assert [f["frame_idx"] for f in by_doc[3]] == [0, 4, 8]
    assert by_doc[3][1]["frame_digest"] == hashlib.md5(b"b" * 100).hexdigest()
