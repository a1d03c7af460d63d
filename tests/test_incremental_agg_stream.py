"""Streaming incremental aggregate maintenance
(streaming/windows.start_incremental_agg_to_sink): per-batch deltas FOLDED
into a serving table via combining upserts — the running total lives in the
sink, Spark holds zero aggregation state. Also pins the merge_upsert sink
primitive: combine semantics, replay exactly-once, and the dialect SQL."""

from __future__ import annotations

import functools
import json
import sqlite3

import pytest


def _mk_sink(tmp_path, name="aggserve"):
    path = str(tmp_path / "agg.db")
    factory = functools.partial(sqlite3.connect, path, timeout=60)
    conn = factory()
    conn.execute(
        f'CREATE TABLE "{name}" ("agg_key" varchar(64) PRIMARY KEY, '
        '"user" varchar(16), "cnt" bigint, "total" double, '
        '"lo" double, "hi" double)'
    )
    conn.commit()
    conn.close()
    return factory


AGGS = {
    "cnt": ("count", None),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _write(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for u, v in rows:
            f.write(json.dumps({"user": u, "v": v}) + "\n")


def _run(spark, srcdir, ckpt, factory):
    from momyre_spark.streaming.windows import start_incremental_agg_to_sink

    stream = spark.readStream.schema("user string, v double").json(str(srcdir))
    q = start_incremental_agg_to_sink(
        stream,
        connection_factory=factory,
        dialect_name="sqlite",
        table="aggserve",
        checkpoint_dir=str(ckpt),
        keys=("user",),
        aggs=AGGS,
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)


def _state(factory):
    conn = factory()
    try:
        cur = conn.execute('SELECT "user","cnt","total","lo","hi" FROM "aggserve"')
        return {r[0]: r[1:] for r in cur.fetchall()}
    finally:
        conn.close()


def test_incremental_agg_folds_across_batches(spark, tmp_path):
    factory = _mk_sink(tmp_path)
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"

    _write(src / "b1.json", [("a", 1.0), ("a", 5.0), ("b", 10.0)])
    _run(spark, src, ckpt, factory)
    assert _state(factory) == {"a": (2, 6.0, 1.0, 5.0), "b": (1, 10.0, 10.0, 10.0)}

    # second batch folds INTO the stored rows (checkpoint resumes the stream)
    _write(src / "b2.json", [("a", 0.5), ("c", 7.0)])
    _run(spark, src, ckpt, factory)
    assert _state(factory) == {
        "a": (3, 6.5, 0.5, 5.0),
        "b": (1, 10.0, 10.0, 10.0),
        "c": (1, 7.0, 7.0, 7.0),
    }


def test_incremental_agg_matches_batch_groupby(spark, tmp_path):
    """Streamed-in-batches result == one-shot batch aggregate of all rows."""
    import random

    from momyre_spark.operators.incremental import aggregate_delta

    rng = random.Random(5)
    rows = [(f"u{rng.randrange(7)}", round(rng.uniform(-5, 5), 3)) for _ in range(300)]
    factory = _mk_sink(tmp_path)
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    third = len(rows) // 3
    for i in range(3):
        _write(src / f"b{i}.json", rows[i * third: None if i == 2 else (i + 1) * third])
        _run(spark, src, ckpt, factory)

    df = spark.createDataFrame(rows, "user string, v double")
    want = {
        r["user"]: (r["cnt"], r["total"], r["lo"], r["hi"])
        for r in aggregate_delta(df, ["user"], AGGS).collect()
    }
    got = _state(factory)
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert got[u][1] == pytest.approx(want[u][1], abs=1e-9)
        assert got[u][2:] == want[u][2:]


def test_merge_upsert_replay_is_skipped(spark, tmp_path):
    """Additive merges are not idempotent — the in-txn progress marker must
    make a replayed (same batch_id, same layout) partition a no-op."""
    from momyre_spark.sinks.jdbc_upsert import merge_upsert_dataframe

    factory = _mk_sink(tmp_path)
    df = spark.createDataFrame(
        [("a", "a", 1, 2.0, 2.0, 2.0)],
        "agg_key string, user string, cnt long, total double, lo double, hi double",
    ).coalesce(1)
    merge = {"cnt": "sum", "total": "sum", "lo": "min", "hi": "max"}
    for _ in range(3):  # replay the SAME batch three times
        merge_upsert_dataframe(
            df, connection_factory=factory, dialect_name="sqlite",
            table="aggserve", merge=merge, key="agg_key", batch_id=77,
        )
    assert _state(factory)["a"] == (1, 2.0, 2.0, 2.0)
    # a NEW batch id applies
    merge_upsert_dataframe(
        df, connection_factory=factory, dialect_name="sqlite",
        table="aggserve", merge=merge, key="agg_key", batch_id=78,
    )
    assert _state(factory)["a"] == (2, 4.0, 2.0, 2.0)


def test_merge_upsert_replay_under_different_layout_is_skipped(spark, tmp_path):
    """The ADVICE r02 scenario: a replayed micro-batch whose rows land in a
    DIFFERENT partition layout (changed num_partitions across a restart)
    must not double-apply the non-idempotent sum deltas. The staged
    protocol's per-(table, batch) marker is layout-independent."""
    from momyre_spark.sinks.jdbc_upsert import merge_upsert_dataframe

    factory = _mk_sink(tmp_path)
    rows = [(f"u{i}", f"u{i}", 1, float(i), float(i), float(i)) for i in range(8)]
    schema = (
        "agg_key string, user string, cnt long, total double, "
        "lo double, hi double"
    )
    merge = {"cnt": "sum", "total": "sum", "lo": "min", "hi": "max"}
    for nparts in (4, 1, 8):  # same batch, three different layouts
        df = spark.createDataFrame(rows, schema).repartition(nparts)
        merge_upsert_dataframe(
            df, connection_factory=factory, dialect_name="sqlite",
            table="aggserve", merge=merge, key="agg_key", batch_id=5,
        )
    state = _state(factory)
    assert state["u3"] == (1, 3.0, 3.0, 3.0)  # applied exactly once
    assert all(state[f"u{i}"][0] == 1 for i in range(8))
    # staging rows for the applied batch were purged in the same txn
    conn = factory()
    try:
        n = conn.execute('SELECT count(*) FROM "aggserve__stage"').fetchone()[0]
    finally:
        conn.close()
    assert n == 0


def test_stream_replay_under_changed_session_layout_applies_once(spark, tmp_path):
    """End-to-end staged-merge exactly-once across a RESTART that changes the
    physical layout: the same input replayed from a fresh checkpoint under
    different shuffle-partition and AQE settings (so the batch's rows land in
    different partitions/tasks) must not re-fold any delta; a genuinely new
    batch afterwards still applies."""
    factory = _mk_sink(tmp_path)
    src = tmp_path / "src"

    _write(src / "b1.json", [("a", 1.0), ("a", 5.0), ("b", 10.0)])
    _run(spark, src, tmp_path / "ck1", factory)
    want = _state(factory)
    assert want == {"a": (2, 6.0, 1.0, 5.0), "b": (1, 10.0, 10.0, 10.0)}

    # replay: fresh checkpoint re-reads everything as batch 0, but in a
    # session with a different layout (7 shuffle partitions, AQE off)
    s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "7")
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    _run(s2, src, tmp_path / "ck2", factory)
    assert _state(factory) == want  # batch 0 skipped, layout-independent

    # the original stream continues: a NEW batch still folds in
    _write(src / "b2.json", [("a", 0.5)])
    _run(spark, src, tmp_path / "ck1", factory)
    assert _state(factory)["a"] == (3, 6.5, 0.5, 5.0)


def test_staged_merge_dialect_spellings():
    from momyre_spark.sinks.dialects import DIALECTS

    merge = {"cnt": "sum", "lo": "min"}
    lite = DIALECTS["sqlite"].merge_from_staging_sql(
        "t", "t__stage", ["k", "cnt", "lo"], "k", merge
    )
    assert 'SELECT "k", "cnt", "lo" FROM "t__stage"' in lite
    assert 'WHERE "__batch_id" = ?' in lite
    assert '"cnt" = "t"."cnt" + excluded."cnt"' in lite
    my = DIALECTS["mysql"].merge_from_staging_sql(
        "t", "t__stage", ["k", "cnt", "lo"], "k", merge
    )
    assert "WHERE `__batch_id` = %s" in my
    assert "`cnt` = `cnt` + VALUES(`cnt`)" in my
    multi = DIALECTS["sqlite"].upsert_sql_multi(
        "t__stage", ["__batch_id", "k", "cnt"], ["__batch_id", "k"]
    )
    assert 'ON CONFLICT("__batch_id", "k")' in multi
    ddl = DIALECTS["mysql"].create_staging_sql(
        "t__stage",
        [("__batch_id", "bigint"), ("k", "string"), ("cnt", "bigint")],
        ["__batch_id", "k"],
    )
    assert "`k` VARCHAR(191)" in ddl and "PRIMARY KEY (`__batch_id`, `k`)" in ddl


def test_merge_upsert_sql_spellings():
    from momyre_spark.sinks.dialects import DIALECTS

    merge = {"cnt": "sum", "lo": "min", "hi": "max"}
    lite = DIALECTS["sqlite"].merge_upsert_sql("t", ["k", "cnt", "lo", "hi"], "k", merge)
    assert '"cnt" = "t"."cnt" + excluded."cnt"' in lite
    assert '"lo" = MIN("t"."lo", excluded."lo")' in lite
    my = DIALECTS["mysql"].merge_upsert_sql("t", ["k", "cnt", "lo", "hi"], "k", merge)
    assert "`cnt` = `cnt` + VALUES(`cnt`)" in my
    assert "`hi` = GREATEST(`hi`, VALUES(`hi`))" in my
    pg = DIALECTS["postgres"].merge_upsert_sql("t", ["k", "cnt", "lo", "hi"], "k", merge)
    assert '"lo" = LEAST("t"."lo", excluded."lo")' in pg
    with pytest.raises(ValueError, match="unknown merge kind"):
        DIALECTS["sqlite"].merge_upsert_sql("t", ["k", "x"], "k", {"x": "avg"})


def test_merge_upsert_folds_duplicate_key_deltas(spark, tmp_path):
    """Two delta rows for ONE key in a batch must both land (pre-folded by
    the merge functions) — the staging replace-upsert on (batch, key) would
    otherwise keep only one of them."""
    from momyre_spark.sinks.jdbc_upsert import merge_upsert_dataframe

    factory = _mk_sink(tmp_path)
    df = spark.createDataFrame(
        [("a", "a", 1, 2.0, 2.0, 2.0), ("a", "a", 1, 5.0, 5.0, 5.0)],
        "agg_key string, user string, cnt long, total double, lo double, hi double",
    )
    merge = {"cnt": "sum", "total": "sum", "lo": "min", "hi": "max"}
    merge_upsert_dataframe(
        df, connection_factory=factory, dialect_name="sqlite",
        table="aggserve", merge=merge, key="agg_key", batch_id=1,
    )
    assert _state(factory) == {"a": (2, 7.0, 2.0, 5.0)}


def test_merge_upsert_two_writers_isolated_staging(spark, tmp_path):
    """Two writers (distinct progress_labels) into ONE table must not share
    a staging table: overlapping epochs would replace-upsert over each
    other and purge each other's staged batches."""
    from momyre_spark.sinks.jdbc_upsert import merge_upsert_dataframe

    factory = _mk_sink(tmp_path)
    merge = {"cnt": "sum", "total": "sum", "lo": "min", "hi": "max"}

    def delta(k, v):
        return spark.createDataFrame(
            [(k, k, 1, v, v, v)],
            "agg_key string, user string, cnt long, total double, "
            "lo double, hi double",
        )

    # writer B applies its batch 9 BETWEEN writer A's phases — with a
    # shared stage, B's purge (<= 9) would delete A's staged batch-7 rows.
    # With per-label staging both writers' deltas land.
    merge_upsert_dataframe(
        delta("a", 2.0), connection_factory=factory, dialect_name="sqlite",
        table="aggserve", merge=merge, key="agg_key", batch_id=7,
        progress_label="writerA",
    )
    merge_upsert_dataframe(
        delta("a", 10.0), connection_factory=factory, dialect_name="sqlite",
        table="aggserve", merge=merge, key="agg_key", batch_id=9,
        progress_label="writerB",
    )
    # same-label replay of each is still skipped
    merge_upsert_dataframe(
        delta("a", 99.0), connection_factory=factory, dialect_name="sqlite",
        table="aggserve", merge=merge, key="agg_key", batch_id=7,
        progress_label="writerA",
    )
    assert _state(factory) == {"a": (2, 12.0, 2.0, 10.0)}
    # distinct staging tables exist (hex-suffixed per label)
    conn = factory()
    names = {r[0] for r in conn.execute(
        "SELECT name FROM sqlite_master WHERE type='table'").fetchall()}
    conn.close()
    stages = {n for n in names if "__stage" in n}
    assert len(stages) == 2, stages


def test_merge_upsert_replace_kind_keeps_whole_row(spark, tmp_path):
    """The staged path must accept the documented 'replace' merge kind and
    fold duplicate-key deltas by picking ONE whole source row (never a
    per-column mix of different rows)."""
    import functools
    import sqlite3

    from momyre_spark.sinks.jdbc_upsert import merge_upsert_dataframe

    path = str(tmp_path / "rk.db")
    factory = functools.partial(sqlite3.connect, path, timeout=60)
    conn = factory()
    conn.execute(
        'CREATE TABLE "t" ("k" varchar(16) PRIMARY KEY, "cnt" bigint, '
        '"status" varchar(16), "src" varchar(8))'
    )
    conn.commit()
    conn.close()
    df = spark.createDataFrame(
        [("a", 1, "active", "x"), ("a", 1, "done", "y")],
        "k string, cnt long, status string, src string",
    )
    merge_upsert_dataframe(
        df, connection_factory=factory, dialect_name="sqlite", table="t",
        merge={"cnt": "sum", "status": "replace"}, key="k", batch_id=1,
        num_partitions=1,
    )
    conn = factory()
    cnt, status, src = conn.execute(
        'SELECT "cnt","status","src" FROM "t"').fetchone()
    conn.close()
    assert cnt == 2                                      # summed delta
    assert (status, src) in {("active", "x"), ("done", "y")}  # one real row
