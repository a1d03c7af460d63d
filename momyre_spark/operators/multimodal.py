"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: image/audio/video payloads are ``binary`` columns with a sibling
metadata struct; all per-item work runs as Arrow-batched ``mapInPandas`` so
bytes move executor-side in columnar batches and never touch the driver.
Partitioning, schemas, batch shapes and the UDF signatures are real and
tested; the *decoders themselves* are STUBS — the imaging/audio libraries
(PIL, soundfile, av, ...) are not in this environment, so decode is either

- ``mode="fake"``  : a deterministic byte-derived fake (testable end-to-end), or
- ``mode="real"``  : guarded imports that raise ``NotImplementedError`` with
                     a clear message when the library is absent.

The testdata has no binary table, so ``with_binary_payload`` manufactures one
from ``documents.text`` (utf-8 bytes) — in production this column comes
straight from the lakehouse scan.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id long, n_bytes long, digest string, width int, height int, channels int"
)
FRAME_SAMPLE_SCHEMA = "doc_id long, frame_idx int, frame_digest string"


def with_binary_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Attach an opaque binary column (test stand-in: utf-8 of the text)."""
    return docs.select(
        F.col(id_col), F.encode(F.col(text_col), "utf-8").alias("data")
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake 'image header parse' from raw bytes."""
    n = len(payload)
    return (64 + n % 512, 64 + (n * 7) % 512, 3)


def extract_image_meta(
    df: DataFrame, id_col: str = "doc_id", data_col: str = "data", mode: str = "fake"
) -> DataFrame:
    """Decode/inspect every binary payload; emit typed metadata.

    Arrow-batched: each pandas batch is one columnar chunk of payloads; the
    output is a new typed frame — the pattern for any per-item media op
    (resize, feature-extract, transcode) at scale.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "real":
                # STUB: real decode needs an imaging library absent here.
                raise NotImplementedError(
                    "real image decode requires PIL/opencv — not available in "
                    "this environment; use mode='fake' for plumbing tests"
                )
            out = {
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": pdf[data_col].map(len).astype("int64"),
                "digest": pdf[data_col].map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
            }
            dims = pdf[data_col].map(lambda b: _fake_decode(bytes(b)))
            out["width"] = dims.map(lambda d: d[0]).astype("int32")
            out["height"] = dims.map(lambda d: d[1]).astype("int32")
            out["channels"] = dims.map(lambda d: d[2]).astype("int32")
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=IMAGE_META_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 100,
    stride: int = 4,
    id_col: str = "doc_id",
    data_col: str = "data",
) -> DataFrame:
    """Frame-sampling plumbing for 'video' payloads.

    Fake frame model: one frame per ``every_n_bytes`` window; keep every
    ``stride``-th frame; the frame digest is the md5 of its byte window.
    Demonstrates the 1->N mapInPandas fan-out shape a real ffmpeg-style
    sampler would use."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_digest": []}
            for did, payload in zip(pdf[id_col], pdf[data_col]):
                b = bytes(payload)
                n_frames = len(b) // every_n_bytes
                for fi in range(0, n_frames, stride):
                    window = b[fi * every_n_bytes : (fi + 1) * every_n_bytes]
                    rows["doc_id"].append(int(did))
                    rows["frame_idx"].append(fi)
                    rows["frame_digest"].append(hashlib.md5(window).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                    "frame_digest": pd.Series(rows["frame_digest"], dtype="object"),
                }
            )

    return df.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
