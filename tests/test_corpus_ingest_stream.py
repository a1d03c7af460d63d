"""Streaming corpus ingestion e2e (streaming/ingest.py): raw document
batches -> gate -> corpus-wide incremental dedup -> versioned snapshot."""

from __future__ import annotations

import json
import os

from momyre_spark.sinks.snapshots import (
    current_version,
    read_manifest,
    snapshot_read,
)
from momyre_spark.streaming.ingest import start_corpus_ingest

FIELDS = {"text": "string", "src": "string"}
SCHEMA = "doc_id long, text string, src string"


def _write_batch(d, name, rows):
    with open(os.path.join(d, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _ingest(spark, src_dir, root, ck):
    stream = spark.readStream.schema(SCHEMA).json(src_dir)
    q = start_corpus_ingest(
        stream,
        root,
        ck,
        FIELDS,
        min_tokens=2,
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)


def test_ingest_gates_dedups_and_versions(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    root = str(tmp_path / "corpus")
    ck = str(tmp_path / "ck")

    _write_batch(
        src,
        "b1.json",
        [
            {"doc_id": 1, "text": "alpha beta gamma", "src": "a"},
            {"doc_id": 2, "text": "alpha beta gamma", "src": "b"},  # in-batch dup
            {"doc_id": 3, "text": "tiny", "src": "a"},  # gated: 1 token
            {"doc_id": 4, "text": "delta epsilon", "src": "b"},
        ],
    )
    _ingest(spark, src, root, ck)
    state = {r["_id"]: r["text"] for r in snapshot_read(spark, root).collect()}
    # min-id survivor of the dup pair; the 1-token doc gated out
    assert state == {"1": "alpha beta gamma", "4": "delta epsilon"}

    # batch 2: a cross-batch duplicate of doc 1 plus one genuinely new doc
    _write_batch(
        src,
        "b2.json",
        [
            {"doc_id": 9, "text": "alpha beta gamma", "src": "c"},  # corpus dup
            {"doc_id": 10, "text": "zeta eta theta", "src": "c"},
        ],
    )
    _ingest(spark, src, root, ck)
    state = {r["_id"]: r["text"] for r in snapshot_read(spark, root).collect()}
    assert "9" not in state  # deduped against the EXISTING corpus
    assert state["10"] == "zeta eta theta"
    assert len(state) == 3

    # versioned history: batch-1 state still readable via time travel
    v = current_version(spark, root)
    assert v >= 2
    old = {
        r["_id"] for r in snapshot_read(spark, root, version=v - 1).collect()
    }
    assert old == {"1", "4"}


def test_ingest_epoch_replay_is_noop(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    root = str(tmp_path / "corpus")

    _write_batch(
        src, "b1.json", [{"doc_id": 1, "text": "alpha beta", "src": "a"}]
    )
    _ingest(spark, src, root, str(tmp_path / "ck1"))
    v1 = current_version(spark, root)

    # a fresh checkpoint replays epoch 0 over the same input: the snapshot
    # must skip it (batch_id marker) and the fps dir rewrite is idempotent
    _ingest(spark, src, root, str(tmp_path / "ck2"))
    assert current_version(spark, root) == v1
    assert read_manifest(spark, root, v1)["batch_id"] == 0
    state = [r["_id"] for r in snapshot_read(spark, root).collect()]
    assert state == ["1"]


def test_ingest_compact_vacuum_ingest_lifecycle(spark, tmp_path):
    """The maintenance loop composes with live ingestion: several ingest
    versions -> OPTIMIZE compaction -> vacuum past the horizon -> more
    ingestion. State stays correct, epoch replay markers survive the
    compaction commit, and dedup still sees the whole corpus."""
    from momyre_spark.sinks.snapshots import (
        list_versions,
        snapshot_compact,
        snapshot_vacuum,
    )

    src = str(tmp_path / "in")
    os.makedirs(src)
    root = str(tmp_path / "corpus")
    ck = str(tmp_path / "ck")

    _write_batch(src, "b1.json",
                 [{"doc_id": 1, "text": "alpha beta gamma", "src": "a"}])
    _ingest(spark, src, root, ck)
    _write_batch(src, "b2.json",
                 [{"doc_id": 2, "text": "delta epsilon zeta", "src": "a"}])
    _ingest(spark, src, root, ck)
    _write_batch(src, "b2b.json",
                 [{"doc_id": 3, "text": "kappa lambda mu", "src": "a"}])
    _ingest(spark, src, root, ck)

    v = snapshot_compact(spark, root, target_file_bytes=1 << 30)  # may no-op
    dropped = snapshot_vacuum(spark, root, keep_last=2, sweep_orphans=True)
    assert dropped  # old ingest versions expired

    # ingestion continues after maintenance; corpus-wide dedup still holds
    _write_batch(src, "b3.json", [
        {"doc_id": 9, "text": "alpha beta gamma", "src": "b"},   # corpus dup
        {"doc_id": 10, "text": "eta theta iota", "src": "b"},
    ])
    _ingest(spark, src, root, ck)
    state = {r["_id"]: r["text"] for r in snapshot_read(spark, root).collect()}
    assert set(state) == {"1", "2", "3", "10"}
    assert list_versions(spark, root)[-1] > (v or 0)


def test_ingest_fuzzy_drops_near_dups_across_epochs(spark, tmp_path):
    """With fuzzy_threshold set, a batch-2 document that NEAR-duplicates a
    batch-1 document (one-token edit — different fingerprint, so exact
    dedup passes it) is dropped via the persisted LSH state."""
    src = str(tmp_path / "in")
    os.makedirs(src)
    root = str(tmp_path / "corpus")
    ck = str(tmp_path / "ck")

    base = " ".join(f"tok{i}" for i in range(40))
    near = base.replace("tok7", "EDITED")
    other = " ".join(f"zzz{i}" for i in range(40))

    def run():
        stream = spark.readStream.schema(SCHEMA).json(src)
        q = start_corpus_ingest(
            stream, root, ck, FIELDS, min_tokens=2,
            trigger={"availableNow": True}, fuzzy_threshold=0.8,
            fuzzy_num_hashes=32, fuzzy_bands=8,
        )
        # fail LOUDLY on a slow host instead of asserting half-finished
        # state (the full-suite flake mode of a bare awaitTermination)
        assert q.awaitTermination(300), "ingest epoch timed out"

    _write_batch(src, "b1.json", [
        {"doc_id": 1, "text": base, "src": "a"},
    ])
    run()
    _write_batch(src, "b2.json", [
        {"doc_id": 10, "text": near, "src": "b"},   # near-dup of doc 1
        {"doc_id": 11, "text": other, "src": "b"},  # genuinely new
    ])
    run()

    got = sorted(
        r["_id"] for r in snapshot_read(spark, root).select("_id").collect()
    )
    assert got == ["1", "11"], got
    # LSH state grew by the survivor only
    sigs = spark.read.parquet(f"{root}/_lsh_sigs")
    assert sorted(r["doc_id"] for r in sigs.collect()) == [1, 11]
