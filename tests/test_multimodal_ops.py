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


# ------------------------------------------------------------------
# REAL netpbm decode / resize (pure numpy — no imaging library)
# ------------------------------------------------------------------
def _ppm(w, h, seed=1):
    import numpy as np

    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    from momyre_spark.operators.multimodal import encode_netpbm

    return encode_netpbm(arr), arr


def test_netpbm_decode_roundtrip():
    import numpy as np

    from momyre_spark.operators.multimodal import decode_netpbm

    payload, arr = _ppm(17, 9)
    w, h, c, out = decode_netpbm(payload)
    assert (w, h, c) == (17, 9, 3)
    assert np.array_equal(out, arr)
    # comments + arbitrary whitespace in header
    with_comment = b"P5\n# a comment\n 4\t2 # trailing\n255\n" + bytes(range(8))
    w, h, c, out = decode_netpbm(with_comment)
    assert (w, h, c) == (4, 2, 1)
    assert out.flatten().tolist() == list(range(8))


def test_netpbm_unknown_magic_and_truncation():
    import pytest

    from momyre_spark.operators.multimodal import decode_netpbm

    with pytest.raises(NotImplementedError, match="netpbm"):
        decode_netpbm(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(ValueError, match="truncated"):
        decode_netpbm(b"P6\n4 4\n255\n\x00\x01")


def test_real_image_meta_on_ppm_payloads(spark):
    from pyspark.sql import Row

    from momyre_spark.operators.multimodal import extract_image_meta

    rows = []
    for i, (w, h) in enumerate([(8, 6), (12, 4), (5, 5)]):
        payload, _ = _ppm(w, h, seed=i)
        rows.append(Row(doc_id=i, data=bytearray(payload)))
    df = spark.createDataFrame(rows, "doc_id long, data binary")
    got = {r["doc_id"]: (r["width"], r["height"], r["channels"])
           for r in extract_image_meta(df, mode="real").collect()}
    assert got == {0: (8, 6, 3), 1: (12, 4, 3), 2: (5, 5, 3)}


def test_resize_images_end_to_end(spark):
    import numpy as np

    from pyspark.sql import Row

    from momyre_spark.operators.multimodal import decode_netpbm, resize_images

    payload, arr = _ppm(16, 8, seed=7)
    df = spark.createDataFrame(
        [Row(doc_id=1, data=bytearray(payload))], "doc_id long, data binary"
    )
    [r] = resize_images(df, width=4, height=4).collect()
    assert (r["width"], r["height"], r["channels"]) == (4, 4, 3)
    w, h, c, out = decode_netpbm(bytes(r["data"]))
    assert (w, h, c) == (4, 4, 3)
    # nearest-neighbor: out[y, x] == arr[y*8//4, x*16//4]
    rows_idx = (np.arange(4) * 8) // 4
    cols_idx = (np.arange(4) * 16) // 4
    assert np.array_equal(out, arr[rows_idx][:, cols_idx])


# ------------------------------------------------------------- audio -----
def test_wav_roundtrip_decode():
    import numpy as np

    from momyre_spark.operators.multimodal import decode_wav, synth_wav

    wav = synth_wav(seed=5, n_samples=300, rate=16000)
    rate, channels, samples = decode_wav(wav)
    assert (rate, channels, len(samples)) == (16000, 1, 300)
    i = np.arange(300)
    expect = (5 * 31 + i * 7) % 65536 - 32768
    assert np.array_equal(samples.astype(np.int64), expect)


def test_wav_decode_skips_extra_chunks_and_handles_stereo():
    import struct

    import numpy as np

    from momyre_spark.operators.multimodal import decode_wav

    data = np.array([1, -1, 2, -2], dtype="<i2").tobytes()  # 2 stereo frames
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 4, 4, 16)
    junk = b"LIST" + struct.pack("<I", 4) + b"INFO"
    wav = b"".join([
        b"RIFF", struct.pack("<I", 0), b"WAVE",
        junk,
        b"fmt ", struct.pack("<I", len(fmt)), fmt,
        b"data", struct.pack("<I", len(data)), data,
    ])
    rate, channels, samples = decode_wav(wav)
    assert (rate, channels) == (44100, 2)
    assert samples.shape == (2, 2)


def test_wav_decode_fail_stop_on_non_pcm():
    import struct

    import pytest

    from momyre_spark.operators.multimodal import decode_wav

    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # float32
    wav = b"".join([
        b"RIFF", struct.pack("<I", 0), b"WAVE",
        b"fmt ", struct.pack("<I", len(fmt)), fmt,
        b"data", struct.pack("<I", 0), b"",
    ])
    with pytest.raises(ValueError, match="only PCM int16"):
        decode_wav(wav)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS....")


def test_avi_probe_roundtrip_and_fail_stop():
    import pytest as _pytest

    from momyre_spark.operators.multimodal import probe_avi, synth_avi

    w, h, fps, nf, dur = probe_avi(synth_avi(7, n_frames=120, width=1280,
                                             height=720, fps=30))
    assert (w, h, nf) == (1280, 720, 120)
    assert fps == round(1_000_000_000 / (1_000_000 // 30))
    assert dur == 120 * (1_000_000 // 30) // 1000
    with _pytest.raises(ValueError, match="not a RIFF/AVI"):
        probe_avi(b"RIFF\x00\x00\x00\x00WAVE")
    with _pytest.raises(ValueError, match="missing avih"):
        import struct

        body = b"AVI " + b"LIST" + struct.pack("<I", 4) + b"movi"
        probe_avi(b"RIFF" + struct.pack("<I", len(body)) + body)


# ---------------------------------------------------- perceptual hashing ---
def _dh(seed, w, h, noise=0, ch=1):
    from momyre_spark.operators.multimodal import (
        decode_netpbm, dhash64, synth_image,
    )

    return dhash64(decode_netpbm(synth_image(seed, w, h, noise_px=noise,
                                             channels=ch))[3])


def _ham(a, b):
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def test_dhash_resolution_invariant():
    """The same picture rendered at 96x64, 160x120 and 320x240 (RGB) must
    hash within a few bits — integral-image box means make every source
    pixel vote regardless of resolution."""
    for seed in range(12):
        a = _dh(seed, 96, 64)
        b = _dh(seed, 160, 120)
        c = _dh(seed, 320, 240, ch=3)
        assert _ham(a, b) <= 4, (seed, _ham(a, b))
        assert _ham(a, c) <= 4, (seed, _ham(a, c))


def test_dhash_noise_tolerant_but_separating():
    import itertools

    for seed in range(12):
        assert _ham(_dh(seed, 128, 96), _dh(seed, 128, 96, noise=8)) <= 6
    hs = [_dh(s, 96, 64) for s in range(30)]
    seps = sorted(_ham(a, b) for a, b in itertools.combinations(hs, 2))
    # unrelated images are far apart on median; a rare tail collision is
    # exactly why the operator verifies with the true distance
    assert seps[len(seps) // 2] >= 14, seps[:5]


def test_dhash_rejects_too_small():
    import numpy as np
    import pytest as _pytest

    from momyre_spark.operators.multimodal import dhash64

    with _pytest.raises(ValueError, match="too small"):
        dhash64(np.zeros((4, 4, 1), dtype=np.uint8))


def test_image_dhash_dataframe(spark):
    from pyspark.sql import Row

    from momyre_spark.operators.multimodal import image_dhash, synth_image

    df = spark.createDataFrame(
        [Row(doc_id=i, data=bytearray(synth_image(i, 96, 64))) for i in range(4)]
    )
    out = image_dhash(df)
    assert dict(out.dtypes) == {
        "doc_id": "bigint", "dhash": "bigint", "width": "int", "height": "int",
    }
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[2]["dhash"] == _dh(2, 96, 64)
    assert (rows[2]["width"], rows[2]["height"]) == (96, 64)


def test_image_neardup_pairs_planted_and_plan(spark):
    """A scale-variant noisy copy must pair with its source; unrelated
    images must not; and the candidate join must be a hash join on the
    pigeonhole blocks, never a cartesian product."""
    from pyspark.sql import Row

    from momyre_spark.operators.multimodal import image_neardup_pairs, synth_image

    rows = [Row(doc_id=s, data=bytearray(synth_image(s, 96, 64)))
            for s in range(10)]
    # planted: seed 3 re-rendered at another resolution with noise, id 100
    rows.append(Row(doc_id=100,
                    data=bytearray(synth_image(3, 160, 120, noise_px=8))))
    df = spark.createDataFrame(rows)
    pairs = image_neardup_pairs(df, max_hamming=6)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the decode+hash stage is cached (persist_fps): every branch of the
    # block join must read InMemoryTableScan, so the per-row Python
    # decode executes ONCE, not once per plan reference (the r07
    # five-fold-decode regression)
    assert "InMemoryTableScan" in plan
    got = {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    assert (3, 100) in got
    # no unrelated seed pairs with the planted copy
    assert not any(b == 100 and a != 3 for a, b in got)


def test_hamming_neardup_pairs_signed_longs(spark):
    """Full-width fingerprints (top bit set -> negative long) must block and
    verify correctly, at every radius."""
    from pyspark.sql import Row

    from momyre_spark.operators.dedup import hamming_neardup_pairs

    base = -(2**63) + 0b1011  # top bit set
    rows = [
        Row(doc_id=1, fp=base),
        Row(doc_id=2, fp=base ^ (1 << 62)),       # hamming 1
        Row(doc_id=3, fp=base ^ 0b111),           # hamming 3
        Row(doc_id=4, fp=(base ^ -1) & -1),       # hamming 61 (complement)
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in hamming_neardup_pairs(df, max_hamming=3, id_col="doc_id",
                                       hash_col="fp").collect()
    }
    assert got == {(1, 2): 1, (1, 3): 3}
    got0 = hamming_neardup_pairs(df, max_hamming=0, id_col="doc_id",
                                 hash_col="fp").collect()
    assert got0 == []


def test_hamming_collapse_identical_guard(spark):
    """K identical fingerprints must cost K-1 star edges, not K^2/2 pairs —
    and duplicate_components must reconstruct the same cluster either way."""
    from pyspark.sql import Row

    from momyre_spark.operators.dedup import (
        duplicate_components,
        hamming_neardup_pairs,
    )

    rows = [Row(doc_id=i, fp=1 << 20) for i in (1, 2, 3, 4, 5)]
    rows.append(Row(doc_id=10, fp=(1 << 20) | 1))   # hamming 1 from the group
    rows.append(Row(doc_id=99, fp=-(2**60)))        # far away
    df = spark.createDataFrame(rows)

    collapsed = hamming_neardup_pairs(df, 2, id_col="doc_id", hash_col="fp")
    got = {(r["a_id"], r["b_id"]): r["hamming"] for r in collapsed.collect()}
    # star edges from the min-id rep + ONE rep-level cross pair
    assert got == {(1, 2): 0, (1, 3): 0, (1, 4): 0, (1, 5): 0, (1, 10): 1}

    full = hamming_neardup_pairs(df, 2, id_col="doc_id", hash_col="fp",
                                 collapse_identical=False)
    gf = {(r["a_id"], r["b_id"]) for r in full.collect()}
    assert len(gf) == 10 + 5  # C(5,2) zero-pairs + every member to 10

    # identical components either way: {1,2,3,4,5,10}, 99 isolated
    comp_a = {r["id"]: r["component"]
              for r in duplicate_components(collapsed).collect()}
    comp_b = {r["id"]: r["component"]
              for r in duplicate_components(full).collect()}
    assert comp_a == comp_b
    assert len({comp_a[i] for i in (1, 2, 3, 4, 5, 10)}) == 1
    assert 99 not in comp_a


# ---------------------------------------------------- audio fingerprints ---
def _afp(seed, n, rate=8000):
    from momyre_spark.operators.multimodal import (
        audio_envelope_hash, decode_wav, synth_wav_am,
    )

    return audio_envelope_hash(decode_wav(synth_wav_am(seed, n, rate))[2])


def test_audio_envelope_hash_duration_and_rate_invariant():
    """The same recording rendered at any clip length / sample rate must
    hash (near-)identically: the envelope lives on normalized time and
    every sample votes into its window — at most one bit of window-grid
    rounding may differ."""
    for seed in range(10):
        assert _ham(_afp(seed, 2000), _afp(seed, 5000, rate=16000)) <= 1
        assert _ham(_afp(seed, 2000), _afp(seed, 3333, rate=44100)) <= 1


def test_audio_envelope_hash_separates_and_tolerates_edits():
    import itertools
    import statistics

    import numpy as np

    from momyre_spark.operators.multimodal import (
        audio_envelope_hash, decode_wav, synth_wav_am,
    )

    hs = [_afp(s, 1500) for s in range(40)]
    seps = [_ham(a, b) for a, b in itertools.combinations(hs, 2)]
    assert statistics.median(seps) >= 8
    # a light edit (boost a short slice by 30%) moves the hash only a little
    for seed in range(8):
        _, _, samples = decode_wav(synth_wav_am(seed, 2000, 8000))
        edited = samples.astype(np.int64).copy()
        edited[100:200] = edited[100:200] * 13 // 10
        d = _ham(audio_envelope_hash(samples), audio_envelope_hash(edited.astype(np.int16)))
        assert d <= 6, (seed, d)


def test_audio_envelope_hash_too_short_fail_stop():
    import numpy as np
    import pytest as _pytest

    from momyre_spark.operators.multimodal import audio_envelope_hash

    with _pytest.raises(ValueError, match="too short"):
        audio_envelope_hash(np.zeros(10, dtype=np.int16))


def test_audio_neardup_pairs_reencoded_copy(spark):
    """A re-encoded copy (same recording, different length and rate) must
    pair with its source at hamming 0; the candidate join stays a hash
    join on pigeonhole blocks."""
    from pyspark.sql import Row

    from momyre_spark.operators.multimodal import audio_neardup_pairs, synth_wav_am

    rows = [Row(doc_id=s, payload=bytearray(synth_wav_am(s, 1500, 8000)))
            for s in range(10)]
    rows.append(Row(doc_id=100,
                    payload=bytearray(synth_wav_am(3, 4000, 16000))))
    df = spark.createDataFrame(rows)
    pairs = audio_neardup_pairs(df, max_hamming=2)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    got = {(r["a_id"], r["b_id"]): r["hamming"] for r in pairs.collect()}
    assert got.get((3, 100)) is not None and got[(3, 100)] <= 1


def test_scene_changes_detects_planted_cut(spark):
    from momyre_spark.operators.multimodal import scene_changes

    # 3 "frames" of 100 bytes: dark, dark, bright -> one cut at frame 2
    payload = bytes([10] * 200 + [200] * 100)
    steady = bytes([50] * 300)
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(steady))],
        "doc_id long, data binary",
    )
    out = {(r["doc_id"], r["frame_idx"]): r
           for r in scene_changes(df, threshold_centi=1500).collect()}
    assert out[(1, 0)]["delta_centi"] is None  # no predecessor: visible
    assert out[(1, 0)]["is_cut"] is None
    assert out[(1, 1)]["is_cut"] is False
    assert out[(1, 2)]["is_cut"] is True
    assert out[(1, 2)]["delta_centi"] == (200 - 10) * 100
    assert all(not out[(2, i)]["is_cut"] for i in (1, 2))
    # exact centi means
    assert out[(1, 0)]["luma_centi"] == 1000


def test_scene_changes_layout_invariant(spark):
    from momyre_spark.operators.multimodal import scene_changes

    import hashlib as _h

    payloads = [
        (i, bytearray(_h.md5(str(i).encode()).digest() * 50))
        for i in range(8)
    ]
    df = spark.createDataFrame(payloads, "doc_id long, data binary")
    a = sorted(map(tuple, scene_changes(df).collect()))
    b = sorted(map(tuple, scene_changes(df.repartition(5)).collect()))
    assert a == b


def test_mm_video_scenes_oracle_parity(spark):
    """Pre-validates the round-8 registration: run the (not yet
    registered) mm_video_scenes query and its DuckDB oracle at sf0.001
    and compare rows/schema/values exactly like the driver does."""
    import os

    import duckdb

    from momyre_spark.plans.multimodal_queries import (
        _MM_SCENES_ORACLE,
        mm_video_scenes,
    )

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/documents.parquet"):
        pytest.skip("sf0.001 testdata absent")
    got = mm_video_scenes(spark, sf).collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    cur = con.execute(_MM_SCENES_ORACLE)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert len(got) == len(orows) and len(got) > 0
    assert [c for c in got[0].asDict()] == ocols
    for g, o in zip(got, orows):
        assert tuple(g) == tuple(o), (tuple(g), tuple(o))
