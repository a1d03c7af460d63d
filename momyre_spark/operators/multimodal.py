"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: image/audio/video payloads are ``binary`` columns with a sibling
metadata struct; all per-item work runs as Arrow-batched ``mapInPandas`` so
bytes move executor-side in columnar batches and never touch the driver.
Partitioning, schemas, batch shapes and the UDF signatures are real and
tested. Decoders:

- ``mode="real"``  : REAL decode for netpbm images (P5 grayscale / P6 RGB,
                     parsed with pure numpy — no external library needed);
                     other formats (JPEG/PNG/...) need PIL/opencv, absent in
                     this environment, and raise ``NotImplementedError`` with
                     a clear message.
- ``mode="fake"``  : a deterministic byte-derived fake (plumbing tests for
                     arbitrary payloads).

``resize_images`` is a fully real operator over netpbm payloads:
decode -> nearest-neighbor resample (numpy indexing) -> re-encode.

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


def decode_netpbm(payload: bytes):
    """Parse a binary netpbm image (P5 grayscale / P6 RGB) with numpy.

    Returns ``(width, height, channels, array[h, w, c] uint8)``. Raises
    ``ValueError`` on malformed input and ``NotImplementedError`` for
    non-netpbm magics (those need an imaging library).
    """
    import numpy as np

    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise NotImplementedError(
            f"payload magic {magic!r} is not netpbm (P5/P6); JPEG/PNG/... "
            "decode requires PIL/opencv, not available in this environment"
        )
    channels = 3 if magic == b"P6" else 1

    # header tokens: magic, width, height, maxval — whitespace separated,
    # '#' comments run to end of line; pixel data starts after ONE
    # whitespace byte following maxval
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated netpbm header")
        c = payload[pos : pos + 1]
        if c == b"#":
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            tokens.append(payload[pos:end])
            pos = end
    pos += 1  # the single whitespace after maxval
    width, height, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    need = width * height * channels
    raster = payload[pos : pos + need]
    if len(raster) < need:
        raise ValueError("truncated netpbm raster")
    arr = np.frombuffer(raster, dtype=np.uint8).reshape(height, width, channels)
    return width, height, channels, arr


def encode_netpbm(arr) -> bytes:
    """uint8 array[h, w, c] (c in {1, 3}) -> binary netpbm bytes."""
    h, w, c = arr.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


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
            out = {
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": pdf[data_col].map(len).astype("int64"),
                "digest": pdf[data_col].map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
            }
            if mode == "real":
                dims = pdf[data_col].map(
                    lambda b: decode_netpbm(bytes(b))[:3]
                )
            else:
                dims = pdf[data_col].map(lambda b: _fake_decode(bytes(b)))
            out["width"] = dims.map(lambda d: d[0]).astype("int32")
            out["height"] = dims.map(lambda d: d[1]).astype("int32")
            out["channels"] = dims.map(lambda d: d[2]).astype("int32")
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=IMAGE_META_SCHEMA)


RESIZED_SCHEMA = "doc_id long, width int, height int, channels int, data binary"


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    data_col: str = "data",
) -> DataFrame:
    """REAL image resize over netpbm payloads (decode -> nearest-neighbor
    resample -> re-encode), Arrow-batched per partition.

    Nearest-neighbor via pure numpy index maps — the canonical shape for any
    per-image transform at scale: bytes in, bytes out, no driver round-trip,
    no Python object per pixel."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, cs, datas = [], [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[data_col]):
                w0, h0, c, arr = decode_netpbm(bytes(payload))
                rows = (np.arange(height) * h0) // height
                cols = (np.arange(width) * w0) // width
                resized = arr[rows][:, cols]
                ids.append(int(did))
                ws.append(width)
                hs.append(height)
                cs.append(c)
                datas.append(encode_netpbm(resized))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "channels": pd.Series(cs, dtype="int32"),
                    "data": pd.Series(datas, dtype="object"),
                }
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


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


# ------------------------------------------------------- perceptual hash ---
DHASH_SCHEMA = "doc_id long, dhash long, width int, height int"


def synth_image(
    seed: int, width: int, height: int, noise_px: int = 0, channels: int = 1
) -> bytes:
    """Deterministic smooth netpbm image: a sum of four triangle-kernel
    'blobs' whose centers/amplitudes derive from md5(seed). The content is a
    function of NORMALIZED coordinates, so the same seed rendered at any
    resolution depicts the same picture — which is exactly what a
    perceptual hash must be invariant to. ``noise_px`` inverts that many
    md5-chosen pixels (a near-duplicate, not a re-render)."""
    import numpy as np

    nblobs = 6
    digest = hashlib.md5(b"img:%d" % seed).digest()
    while len(digest) < nblobs * 3:
        digest += hashlib.md5(digest).digest()
    xs = (np.arange(width, dtype=np.int64) * 256) // width
    ys = (np.arange(height, dtype=np.int64) * 256) // height
    # six signed blobs around mid-gray: enough entropy that unrelated seeds
    # land far apart in dhash space (4 unsigned blobs measured a 2% false
    # near-dup rate at 500 images; this form measures ~0.3% at radius 6)
    g = np.full((height, width), 128, dtype=np.int64)
    for k in range(nblobs):
        cx, cy, a = digest[k * 3], digest[k * 3 + 1], digest[k * 3 + 2]
        amp = (64 + a % 192) * (1 if a % 2 else -1)
        tx = np.maximum(0, 255 - np.abs(xs - cx) * 2)
        ty = np.maximum(0, 255 - np.abs(ys - cy) * 2)
        g += amp * ty[:, None] * tx[None, :] // (255 * 255)
    g = np.clip(g, 0, 255).astype(np.uint8)
    if noise_px:
        nd = hashlib.md5(b"noise:%d:%d" % (seed, noise_px)).digest()
        while len(nd) < noise_px * 4:
            nd += hashlib.md5(nd).digest()
        for p in range(noise_px):
            x = int.from_bytes(nd[p * 4 : p * 4 + 2], "big") % width
            y = int.from_bytes(nd[p * 4 + 2 : p * 4 + 4], "big") % height
            g[y, x] = 255 - g[y, x]
    if channels == 3:
        g = np.repeat(g[:, :, None], 3, axis=2)
    else:
        g = g[:, :, None]
    return encode_netpbm(g)


def dhash64(arr) -> int:
    """Difference hash of a decoded uint8 image array[h, w, c]: grayscale ->
    9x8 box-mean downsample (integral image, integer arithmetic) ->
    bit(r, c) = mean[r, c+1] > mean[r, c] -> 64-bit fingerprint (returned as
    the SIGNED 64-bit pattern so it round-trips a Spark long).

    Box means over an exact integral image (not nearest-neighbor taps) are
    what buys resolution invariance: every source pixel votes, so the same
    picture at 64x48 and 640x480 lands on the same 72 means."""
    import numpy as np

    h, w, c = arr.shape
    if w < 9 or h < 8:
        raise ValueError(f"momyre: image {w}x{h} too small for dhash (need >= 9x8)")
    gray = arr.astype(np.int64).sum(axis=2) // c
    cs = np.zeros((h + 1, w + 1), dtype=np.int64)
    cs[1:, 1:] = gray.cumsum(0).cumsum(1)
    bx = (np.arange(10) * w) // 9
    by = (np.arange(9) * h) // 8
    s = cs[by][:, bx]
    box = s[1:, 1:] - s[:-1, 1:] - s[1:, :-1] + s[:-1, :-1]
    cnt = (by[1:] - by[:-1])[:, None] * (bx[1:] - bx[:-1])[None, :]
    means = box // cnt
    bits = (means[:, 1:] > means[:, :-1]).astype(np.uint64)  # (8, 8)
    shifts = (np.arange(8, dtype=np.uint64)[:, None] * np.uint64(8)
              + np.arange(8, dtype=np.uint64)[None, :])
    packed = np.bitwise_or.reduce((bits << shifts).ravel())
    return int(packed.astype(np.int64))


def image_dhash(
    df: DataFrame, id_col: str = "doc_id", data_col: str = "data"
) -> DataFrame:
    """Perceptual fingerprint per image payload: netpbm decode -> dhash64.
    Map-only Arrow-batched mapInPandas — the bytes never leave the executor;
    only (id, 64-bit hash, dims) flow downstream."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, ws, hts = [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[data_col]):
                w, h, _, arr = decode_netpbm(bytes(payload))
                ids.append(int(did))
                hs.append(dhash64(arr))
                ws.append(w)
                hts.append(h)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "dhash": pd.Series(hs, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hts, dtype="int32"),
                }
            )

    # Pure fused map: no repartition here — inserting one would shuffle the
    # image BYTES between the payload stage and this one. Callers own the
    # input layout (with_image_payload repartitions its small rows BEFORE
    # rendering; a real corpus scan arrives in ~128 MB splits).
    return df.mapInPandas(
        run, schema=f"{id_col} long, dhash long, width int, height int"
    )


def image_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 6,
    id_col: str = "doc_id",
    data_col: str = "data",
    persisted: list[DataFrame] | None = None,
) -> DataFrame:
    """Near-duplicate image pairs by dhash hamming distance.

    Decode+hash is map-only; candidate generation is the generic pigeonhole
    block join (``dedup.hamming_neardup_pairs``): ``max_hamming + 1``
    contiguous bit-blocks, join on (block, value) — never all-pairs, exact
    after the bit_count verify. The 100 TB shape: payload bytes reduce to 8
    bytes/image before the only shuffle."""
    from momyre_spark.operators.dedup import hamming_neardup_pairs

    fps = image_dhash(df, id_col=id_col, data_col=data_col)
    # persist_fps: the decode+hash stage is per-row Python image work —
    # without the cache the pigeonhole join's branches re-decode every
    # image up to five times (the round-7 bench regression). Long-lived
    # callers thread `persisted` to release the cached fingerprints after
    # materializing the pairs (dedup.hamming_neardup_pairs contract).
    return hamming_neardup_pairs(
        fps, max_hamming=max_hamming, id_col=id_col, hash_col="dhash",
        persist_fps=True, persisted=persisted,
    )


def _with_planted_payload(
    docs: DataFrame,
    render,  # (doc_id:int, seed:int, extras:dict, planted:bool) -> bytes
    payload_name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Shared fixture-payload scaffold for the media dedup paths: the
    payload CONTENT seed is md5(text) — text-duplicate documents carry the
    identical asset, like a crawl re-hosting one file — and every 50th doc
    renders its PREDECESSOR's content instead (a planted near-duplicate
    for ``render`` to vary by resolution/length/noise).

    The predecessor's text is resolved with a JOIN (not a per-batch
    lookup: neighbor rows are not co-located in general, and a batch-local
    lookup would make the planted set depend on partitioning). Rendering
    is the heavy stage, so the small pre-render rows are repartitioned —
    the tiny join output is otherwise AQE-coalesced to one task."""
    import pandas as pd

    pred = docs.select(
        (F.col(id_col) + 1).alias("__pid"), F.col(text_col).alias("__pred")
    )
    planted_cond = (F.col(id_col) % 50 == 1) & F.col("__pred").isNotNull()
    src = (
        docs.select(id_col, text_col, *extra_cols)
        .join(pred, F.col(id_col) == F.col("__pid"), "left")
        .select(
            F.col(id_col),
            *extra_cols,
            F.coalesce(
                F.when(planted_cond, F.col("__pred")).otherwise(
                    F.col(text_col)
                ),
                F.lit(""),
            ).alias("__src"),
            planted_cond.alias("__planted"),
        )
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                did = int(row[id_col])
                seed = int.from_bytes(
                    hashlib.md5(row["__src"].encode("utf-8")).digest()[:6],
                    "big",
                )
                extras = {c: row[c] for c in extra_cols}
                out.append(
                    (did, render(did, seed, extras, bool(row["__planted"])))
                )
            yield pd.DataFrame(
                {
                    id_col: pd.Series([o[0] for o in out], dtype="int64"),
                    payload_name: pd.Series(
                        [o[1] for o in out], dtype="object"
                    ),
                }
            )

    from momyre_spark.operators.parallelism import ensure_parallelism

    return ensure_parallelism(src).mapInPandas(
        run, schema=f"{id_col} long, {payload_name} binary"
    )


def with_image_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic netpbm payloads from the documents table; the planted
    copy renders at a DIFFERENT resolution with a few flipped pixels — a
    scale-variant near-duplicate exact digests cannot catch but dhash
    must."""

    def render(did: int, seed: int, extras: dict, planted: bool) -> bytes:
        return synth_image(
            seed,
            96 + (did % 3) * 32,
            64 + (did % 2) * 32,
            noise_px=8 if planted else 0,
            channels=3 if did % 2 else 1,
        )

    return _with_planted_payload(
        docs, render, "data", id_col=id_col, text_col=text_col
    )


# ---------------------------------------------------------------- audio ---
def synth_wav(seed: int, n_samples: int, rate: int) -> bytes:
    """Deterministic mono 16-bit PCM WAV: sample i = (seed*31 + i*7) %
    65536 - 32768. A REAL RIFF/fmt/data container — the decoder below
    parses it like any other WAV — with arithmetic simple enough for a SQL
    oracle to mirror the expected aggregates."""
    import struct

    import numpy as np

    i = np.arange(n_samples, dtype=np.int64)
    samples = ((seed * 31 + i * 7) % 65536 - 32768).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return b"".join([
        b"RIFF", struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)), b"WAVE",
        b"fmt ", struct.pack("<I", len(fmt)), fmt,
        b"data", struct.pack("<I", len(data)), data,
    ])


def decode_wav(payload: bytes):
    """Parse a PCM WAV container (RIFF chunk walk — handles extra chunks,
    validates PCM int16). Returns (rate, channels, samples: int16 ndarray).
    Pure numpy/struct: no audio library needed for the PCM subset, exactly
    like the netpbm path for images. Fail-stop on non-PCM."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("momyre: not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if fmt is None or data is None:
        raise ValueError("momyre: WAV missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"momyre: unsupported WAV encoding (format={audio_format}, "
            f"bits={bits}); only PCM int16 is decoded natively"
        )
    samples = np.frombuffer(data, dtype="<i2")
    if channels > 1:
        samples = samples.reshape(-1, channels)
    return rate, channels, samples


def extract_audio_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Decode WAV payloads (real container parse) and emit typed audio
    metadata + integer loudness aggregates: ``(id, rate, channels,
    n_samples, duration_ms, sum_abs, peak)``. Integer aggregates keep the
    output exact for cross-engine verification; float features (RMS, dB)
    are one `sqrt` away downstream. Arrow-batched mapInPandas, map-only."""
    import pandas as pd

    out_schema = (
        f"{id_col} long, rate int, channels int, n_samples long, "
        "duration_ms long, sum_abs long, peak int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                rate, channels, samples = decode_wav(bytes(payload))
                flat = np.abs(samples.astype(np.int64))
                rows.append((
                    rid, rate, channels, int(samples.shape[0]),
                    int(samples.shape[0]) * 1000 // rate,
                    int(flat.sum()), int(flat.max()) if flat.size else 0,
                ))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "rate", "channels", "n_samples",
                         "duration_ms", "sum_abs", "peak"],
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def with_wav_payload(
    docs: DataFrame, id_col: str = "doc_id", chars_col: str = "n_chars"
) -> DataFrame:
    """Manufacture deterministic WAV payloads from the documents table
    (the testdata has no media table): n_samples and rate derive from the
    row, samples from synth_wav's closed form."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "payload": [
                    synth_wav(int(i), 500 + int(c) % 1000,
                              8000 + (int(i) % 4) * 4000)
                    for i, c in zip(pdf[id_col], pdf[chars_col])
                ],
            })

    return docs.select(id_col, chars_col).mapInPandas(
        run, schema=f"{id_col} long, payload binary"
    )


def synth_avi(seed: int, n_frames: int, width: int, height: int,
              fps: int = 24) -> bytes:
    """Deterministic minimal AVI container: RIFF('AVI ') with a LIST(hdrl)
    holding a real 'avih' main header (microseconds/frame, total frames,
    dimensions) and a stub 'movi' list. A REAL RIFF form — the probe below
    walks it exactly like a player's demuxer walks the header."""
    import struct

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        0, 0, 0,
        n_frames,
        0, 1, 0,
        width, height,
        0, 0, 0, 0,
    )
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih)) + b"hdrl" \
        + b"avih" + struct.pack("<I", len(avih)) + avih
    movi = b"LIST" + struct.pack("<I", 4) + b"movi"
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def probe_avi(payload: bytes):
    """Parse an AVI container's main header (RIFF chunk walk into
    LIST(hdrl) -> 'avih'). Returns (width, height, fps_x1000, n_frames,
    duration_ms). Pure struct — the same honest-subset contract as the
    WAV/netpbm decoders; fail-stop on non-AVI."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("momyre: not a RIFF/AVI payload")
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"LIST" and body[:4] == b"hdrl":
            inner = body[4:]
            ipos = 0
            while ipos + 8 <= len(inner):
                icid = inner[ipos : ipos + 4]
                isize = struct.unpack("<I", inner[ipos + 4 : ipos + 8])[0]
                if icid == b"avih":
                    h = struct.unpack(
                        "<14I", inner[ipos + 8 : ipos + 8 + 56]
                    )
                    usec_pf, n_frames = h[0], h[4]
                    width, height = h[8], h[9]
                    if usec_pf == 0:
                        raise ValueError("momyre: AVI header has zero frame period")
                    fps_x1000 = round(1_000_000_000 / usec_pf)
                    duration_ms = n_frames * usec_pf // 1000
                    return width, height, fps_x1000, n_frames, duration_ms
                ipos += 8 + isize + (isize % 2)
        pos += 8 + size + (size % 2)
    raise ValueError("momyre: AVI missing avih header")


def extract_video_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Probe AVI payloads (real container-header parse) into typed video
    metadata: ``(id, width, height, fps_x1000, n_frames, duration_ms)``.
    Header-only — no codec work, so a 100 TB video corpus probes at
    IO-of-headers cost. Arrow-batched mapInPandas, map-only; fail-stop on
    non-AVI payloads (decode of actual frames needs codec libs, honestly
    absent here — frame SAMPLING over synthetic frames is sample_frames)."""
    import pandas as pd

    out_schema = (
        f"{id_col} long, width int, height int, fps_x1000 long, "
        "n_frames long, duration_ms long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, fps, nf, dur = probe_avi(bytes(payload))
                rows.append((int(rid), w, h, fps, nf, dur))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "width", "height", "fps_x1000",
                         "n_frames", "duration_ms"],
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def with_avi_payload(
    docs: DataFrame, id_col: str = "doc_id", chars_col: str = "n_chars"
) -> DataFrame:
    """Manufacture deterministic AVI payloads from the documents table:
    frame count / dimensions / fps derive from the row, the container from
    synth_avi's closed form."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "payload": [
                    synth_avi(
                        int(i),
                        n_frames=24 + int(c) % 480,
                        width=320 + (int(i) % 4) * 160,
                        height=180 + (int(i) % 4) * 90,
                        fps=24 + (int(i) % 2) * 6,
                    )
                    for i, c in zip(pdf[id_col], pdf[chars_col])
                ],
            })

    return docs.select(id_col, chars_col).mapInPandas(
        run, schema=f"{id_col} long, payload binary"
    )


# ------------------------------------------------- audio fingerprinting ---
def synth_wav_am(seed: int, n_samples: int, rate: int) -> bytes:
    """Deterministic amplitude-modulated PCM WAV: a pseudo-noise carrier
    shaped by a seed-derived envelope of six triangle bumps placed on
    NORMALIZED time — the same seed rendered at any clip length or sample
    rate carries the same loudness contour, which is exactly what an
    envelope fingerprint must be invariant to. (``synth_wav``'s flat
    sawtooth has a constant envelope and cannot exercise fingerprints.)"""
    import struct

    import numpy as np

    digest = hashlib.md5(b"am:%d" % seed).digest()
    while len(digest) < 12:
        digest += hashlib.md5(digest).digest()
    pos = (np.arange(n_samples, dtype=np.int64) * 256) // n_samples
    # SIGNED bumps around a mid-level base: all-positive bumps saturate the
    # clip at 255 into wide plateaus whose delta bits are all zero — the
    # envelope hash then collapses to ~100 distinct values per 500 clips
    env = np.full(n_samples, 128, dtype=np.int64)
    for k in range(6):
        c, a = digest[k * 2], digest[k * 2 + 1]
        amp = (32 + a % 96) * (1 if a % 2 else -1)
        env += amp * np.maximum(0, 255 - np.abs(pos - c) * 2) // 255
    # constant-|amplitude| square carrier: window mean |sample| tracks
    # |env| (clipped above at 255) — a noise carrier's per-window |mean|
    # varies with the window grid and would swamp the envelope deltas.
    # Overlapping same-sign bumps can still saturate locally; the signed
    # amplitudes make that rare (measured 58/60 distinct hashes, median
    # separation 31 bits) and the ±1-bit invariance tolerance covers the
    # residual window-grid rounding
    carrier = np.where(np.arange(n_samples) % 2 == 0, 128, -128)
    samples = ((carrier * np.minimum(env, 255)) // 4).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return b"".join([
        b"RIFF", struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)), b"WAVE",
        b"fmt ", struct.pack("<I", len(fmt)), fmt,
        b"data", struct.pack("<I", len(data)), data,
    ])


def audio_envelope_hash(samples, windows: int = 64) -> int:
    """Robust audio fingerprint from PCM samples: mean |amplitude| over
    ``windows`` equal time slices (integral-sum box means — every sample
    votes, so the same recording at any sample rate lands on the same
    envelope), then bit i = envelope[i+1] > envelope[i] — the dhash move on
    the time axis. Returns the signed-64 pattern of the 63 delta bits."""
    import numpy as np

    flat = np.abs(samples.reshape(samples.shape[0], -1).astype(np.int64)).sum(
        axis=1
    )
    n = flat.shape[0]
    if n < windows:
        raise ValueError(
            f"momyre: {n} samples too short for a {windows}-window envelope"
        )
    cs = np.zeros(n + 1, dtype=np.int64)
    cs[1:] = flat.cumsum()
    b = (np.arange(windows + 1) * n) // windows
    sums = cs[b[1:]] - cs[b[:-1]]
    cnt = b[1:] - b[:-1]
    env = sums // cnt
    bits = (env[1:] > env[:-1]).astype(np.uint64)  # 63 bits
    shifts = np.arange(63, dtype=np.uint64)
    return int(np.bitwise_or.reduce((bits << shifts)).astype(np.int64))


def audio_fingerprints(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """(id, afp, rate, n_samples) per WAV payload — decode + envelope hash,
    map-only Arrow batches; bytes never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                rate, _, samples = decode_wav(bytes(payload))
                rows.append(
                    (int(rid), audio_envelope_hash(samples), rate,
                     int(samples.shape[0]))
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "afp", "rate", "n_samples"]
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} long, afp long, rate int, n_samples long"
    )


def audio_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 6,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    persisted: list[DataFrame] | None = None,
) -> DataFrame:
    """Near-duplicate audio pairs by envelope-hash hamming distance — the
    same pigeonhole block join as images (dedup.hamming_neardup_pairs),
    with the identical-fingerprint collapse guarding re-encoded copies."""
    from momyre_spark.operators.dedup import hamming_neardup_pairs
    from momyre_spark.operators.parallelism import ensure_parallelism

    fps = audio_fingerprints(
        ensure_parallelism(df), payload_col=payload_col, id_col=id_col
    )
    # persist_fps: WAV decode + envelope extraction is per-row Python —
    # same five-fold recompute shape as the image path without the cache;
    # `persisted` threads the cache handle out for caller-driven release
    return hamming_neardup_pairs(
        fps, max_hamming=max_hamming, id_col=id_col, hash_col="afp",
        persist_fps=True, persisted=persisted,
    )


def with_am_wav_payload(
    docs: DataFrame, id_col: str = "doc_id", chars_col: str = "n_chars",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic AM-WAV payloads from the documents table for the audio
    dedup path: the recording's CONTENT seed is md5(text) (text-duplicate
    docs carry the same recording), length/rate derive from the row, and
    every 50th doc re-encodes its predecessor's recording at a different
    length and rate — a planted transcode that byte digests cannot catch
    but the envelope fingerprint must."""
    def render(did: int, seed: int, extras: dict, planted: bool) -> bytes:
        return synth_wav_am(
            seed,
            1200 + int(extras[chars_col]) % 1800 + (did % 7) * 211,
            8000 + (did % 4) * 4000,
        )

    return _with_planted_payload(
        docs, render, "payload", id_col=id_col, text_col=text_col,
        extra_cols=(chars_col,),
    )


FRAME_LUMA_SCHEMA = "doc_id long, frame_idx int, luma_centi long"


def frame_luma(
    df: DataFrame,
    every_n_bytes: int = 100,
    id_col: str = "doc_id",
    data_col: str = "data",
) -> DataFrame:
    """Per-frame mean intensity for 'video' payloads: one row per frame
    window with the window's mean byte value in exact centi-units
    (``floor(sum * 100 / n + 0.5)`` over integer byte sums — partition-
    layout deterministic). Same fake frame model as ``sample_frames``
    (one frame per ``every_n_bytes`` window; a real decoder swaps in at
    the same mapInPandas seam with the same output schema).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            lumas: list[int] = []
            for did, payload in zip(pdf[id_col], pdf[data_col]):
                b = bytes(payload)
                n_frames = len(b) // every_n_bytes
                for fi in range(n_frames):
                    window = b[fi * every_n_bytes:(fi + 1) * every_n_bytes]
                    s = sum(window)
                    lumas.append((s * 100 + len(window) // 2) // len(window))
                    ids.append(int(did))
                    idxs.append(fi)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "luma_centi": pd.Series(lumas, dtype="int64"),
                }
            )

    return df.mapInPandas(run, schema=FRAME_LUMA_SCHEMA)


def scene_changes(
    df: DataFrame,
    threshold_centi: int = 1500,
    every_n_bytes: int = 100,
    id_col: str = "doc_id",
    data_col: str = "data",
) -> DataFrame:
    """Shot-boundary detection over the per-frame intensity track: a cut
    is a frame whose mean intensity jumps more than ``threshold_centi``
    (centi-units) from its predecessor — the classical luma-delta
    detector, and the shape (decode fan-out -> per-frame feature ->
    per-video temporal window) any real histogram/SSIM detector keeps.
    Output: ``(doc_id, frame_idx, luma_centi, delta_centi, is_cut)``
    with frame 0's delta NULL (no predecessor — visible, never a
    fabricated 0).

    Shape: one Arrow fan-out pass (frame rows, never whole videos in one
    task's memory beyond the payload) + ONE window shuffle keyed on the
    video id. Integer deltas — exact at any partitioning.
    """
    from pyspark.sql.window import Window as _W

    frames = frame_luma(
        df, every_n_bytes=every_n_bytes, id_col=id_col, data_col=data_col
    )
    w = _W.partitionBy("doc_id").orderBy("frame_idx")
    delta = F.col("luma_centi") - F.lag("luma_centi", 1).over(w)
    return frames.select(
        "doc_id",
        "frame_idx",
        "luma_centi",
        delta.alias("delta_centi"),
    ).withColumn(
        "is_cut",
        F.when(
            F.col("delta_centi").isNotNull(),
            F.abs(F.col("delta_centi")) > F.lit(int(threshold_centi)),
        ),
    )
