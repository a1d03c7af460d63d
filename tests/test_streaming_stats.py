"""Streaming maintenance of the mergeable quantile state
(streaming/stats.py): per-epoch records, summed compaction with a fold
watermark, replay-after-fold invisibility, crash hygiene."""

from __future__ import annotations

import glob

from pyspark.sql import Row

from momyre_spark.operators.sketches import (
    geometric_boundaries,
    quantiles_from_histogram,
    value_histogram,
)
from momyre_spark.streaming.stats import (
    compact_value_stats,
    read_value_stats,
    record_batch_stats,
)

BL = geometric_boundaries(-1, 2, 8)


def _batch(spark, epoch, n=200):
    return spark.createDataFrame(
        [Row(g=f"g{i % 2}", v=0.5 + ((i * 37 + epoch * 11) % 80) / 10.0)
         for i in range(n)]
    )


def test_epochs_merge_to_single_pass_state(spark, tmp_path):
    root = str(tmp_path)
    frames = []
    for e in range(4):
        b = _batch(spark, e)
        frames.append(b)
        record_batch_stats(b, e, root, ["g"], "v", BL)
    whole = frames[0]
    for f in frames[1:]:
        whole = whole.unionByName(f)
    got = read_value_stats(spark, root, ["g"])
    want = value_histogram(whole, ["g"], "v", BL)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # and the read feeds the quantile reader directly
    q = quantiles_from_histogram(got, ["g"], BL, qs=(0.5,)).collect()
    assert len(q) == 2 and all(r["est"] is not None for r in q)


def test_compaction_sums_and_replay_after_fold_is_invisible(spark, tmp_path):
    root = str(tmp_path)
    for e in range(6):
        record_batch_stats(_batch(spark, e), e, root, ["g"], "v", BL)
    before = sorted(map(tuple, read_value_stats(spark, root, ["g"]).collect()))
    folded = compact_value_stats(spark, root, ["g"], keep_tail=1)
    assert folded == 5
    after = sorted(map(tuple, read_value_stats(spark, root, ["g"]).collect()))
    assert after == before
    # base is SUMMED: one row per (group, bin), not one per epoch
    base_files = glob.glob(f"{root}/_hist_base/v=*/*.parquet")
    assert base_files
    base = spark.read.parquet(glob.glob(f"{root}/_hist_base/v=*")[0])
    assert base.groupBy("g", "bin").count().filter("count > 1").count() == 0
    # tail dirs bounded
    assert len(glob.glob(f"{root}/_hist/epoch=*")) == 1

    # REPLAY a folded epoch: its rewrite sits at or below the watermark and
    # must be structurally invisible — no double count
    record_batch_stats(_batch(spark, 2), 2, root, ["g"], "v", BL)
    again = sorted(map(tuple, read_value_stats(spark, root, ["g"]).collect()))
    assert again == before
    # compaction after the stale replay folds (cleans) the dead directory
    # without changing state or lowering the watermark
    assert compact_value_stats(spark, root, ["g"], keep_tail=1) == 1
    assert sorted(map(tuple, read_value_stats(spark, root, ["g"]).collect())) == before
    base2 = spark.read.parquet(glob.glob(f"{root}/_hist_base/v=*")[0])
    assert base2.agg({"epoch": "max"}).collect()[0][0] == 4
    # and with nothing left to fold it is a no-op
    assert compact_value_stats(spark, root, ["g"], keep_tail=1) == 0


def test_crash_partial_base_never_read_and_cleaned(spark, tmp_path):
    import os
    import shutil

    root = str(tmp_path)
    for e in range(3):
        record_batch_stats(_batch(spark, e), e, root, ["g"], "v", BL)
    compact_value_stats(spark, root, ["g"], keep_tail=1)
    good = sorted(map(tuple, read_value_stats(spark, root, ["g"]).collect()))
    # plant a marker-less partial v=99 (crashed rewrite)
    vdirs = glob.glob(f"{root}/_hist_base/v=*")
    part = f"{root}/_hist_base/v=99"
    shutil.copytree(vdirs[0], part)
    os.remove(f"{part}/_SUCCESS")
    # reads ignore it
    assert sorted(map(tuple, read_value_stats(spark, root, ["g"]).collect())) == good
    # the next compaction cleans it without changing state
    record_batch_stats(_batch(spark, 3), 3, root, ["g"], "v", BL)
    record_batch_stats(_batch(spark, 4), 4, root, ["g"], "v", BL)
    compact_value_stats(spark, root, ["g"], keep_tail=1)
    assert not os.path.exists(part)


def test_psi_against_state_detects_shift(spark, tmp_path):
    from momyre_spark.streaming.stats import (
        psi_against_state,
        record_batch_stats,
    )

    root = str(tmp_path / "state")
    bounds = ["10.0", "100.0"]
    ref_rows = [("a", float(v)) for v in (1, 5, 50, 50, 500, 500)] + [
        ("b", 5.0), ("b", 50.0)
    ]
    ref = spark.createDataFrame(ref_rows, "g string, v double")
    record_batch_stats(ref, 0, root, ["g"], "v", bounds)

    # identical-batch PSI ~ 0; shifted batch large; unknown group dropped
    same = spark.createDataFrame(ref_rows, "g string, v double")
    got = {r["g"]: r for r in psi_against_state(
        spark, root, same, ["g"], "v", bounds).collect()}
    assert set(got) == {"a", "b"}
    assert abs(got["a"]["psi"]) < 1e-9
    assert got["a"]["n_ref"] == 6 and got["a"]["n_cur"] == 6

    shifted = spark.createDataFrame(
        [("a", 500.0)] * 6 + [("new_group", 1.0)], "g string, v double"
    )
    got2 = {r["g"]: r for r in psi_against_state(
        spark, root, shifted, ["g"], "v", bounds).collect()}
    assert set(got2) == {"a"}  # no reference for new_group: dropped
    assert got2["a"]["psi"] > 0.25  # Nigrini "shifted" band

    # replayed epoch is idempotent: same reference, same PSI
    record_batch_stats(ref, 0, root, ["g"], "v", bounds)
    got3 = {r["g"]: r for r in psi_against_state(
        spark, root, same, ["g"], "v", bounds).collect()}
    assert got3["a"]["n_ref"] == 6
