"""Round-3 surface additions: token-budget mixture sampling, boilerplate
stripping, fixed-bound histograms, forward fill, snapshot diff, and
streaming dedup with bounded state."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------- token budget mixture --
def test_token_budget_mixture_greedy_cut(spark):
    from momyre_spark.operators.sampling import token_budget_mixture

    docs = spark.createDataFrame(
        [(i, "en", 10) for i in range(10)] + [(100 + i, "de", 7) for i in range(10)],
        "doc_id bigint, lang string, n_tokens bigint",
    )
    out = token_budget_mixture(
        docs, {"en": 35, "de": 14}, strata_col="lang"
    ).collect()
    by_lang: dict[str, int] = {}
    for r in out:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + r["n_tokens"]
    # greedy cut: keep while cum-before < budget -> overshoot < one doc
    assert 35 <= by_lang["en"] < 45
    assert 14 <= by_lang["de"] < 21
    # deterministic: same selection on re-run
    again = token_budget_mixture(docs, {"en": 35, "de": 14}, strata_col="lang")
    assert sorted(r["doc_id"] for r in out) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_token_budget_mixture_zero_default_drops_stratum(spark):
    from momyre_spark.operators.sampling import token_budget_mixture

    docs = spark.createDataFrame(
        [(1, "en", 5), (2, "fr", 5)], "doc_id bigint, lang string, n_tokens bigint"
    )
    out = token_budget_mixture(docs, {"en": 100}, strata_col="lang").collect()
    assert [r["lang"] for r in out] == ["en"]


# ------------------------------------------------------- boilerplate -----
def test_strip_boilerplate_removes_all_occurrences(spark):
    from momyre_spark.operators.dedup import strip_boilerplate

    # segment = 2 words; 'x x' appears in docs 1,2,3 -> stripped everywhere
    docs = spark.createDataFrame(
        [
            (1, "x x a a"),
            (2, "x x b b"),
            (3, "c c x x"),
            (4, "d d e e"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in strip_boilerplate(docs, min_docs=2, words_per_segment=2).collect()
    }
    assert out[1]["text"] == "a a" and out[1]["n_kept"] == 1
    assert out[2]["text"] == "b b"
    assert out[3]["text"] == "c c"
    assert out[4]["text"] == "d d e e" and out[4]["n_kept"] == 2
    assert all(r["n_segments"] == 2 for r in out.values())


def test_strip_boilerplate_vs_segment_dedup_semantics(spark):
    """segment_dedup keeps the FIRST occurrence; strip_boilerplate keeps
    none — the two corpus-cleanup semantics, on the same input."""
    from momyre_spark.operators.dedup import segment_dedup, strip_boilerplate

    docs = spark.createDataFrame(
        [(1, "h h a a"), (2, "h h b b")], "doc_id bigint, text string"
    )
    first = {
        r["doc_id"]: r["text"]
        for r in segment_dedup(docs, words_per_segment=2).collect()
    }
    none = {
        r["doc_id"]: r["text"]
        for r in strip_boilerplate(docs, min_docs=2, words_per_segment=2).collect()
    }
    assert first[1] == "h h a a" and first[2] == "b b"
    assert none[1] == "a a" and none[2] == "b b"


def test_dedup_incremental_against_corpus_fps(spark):
    from momyre_spark.functions.text import fingerprint
    from momyre_spark.operators.dedup import dedup_incremental

    corpus = spark.createDataFrame(
        [(1, "seen before"), (2, "other doc")], "doc_id bigint, text string"
    )
    fps = corpus.select(fingerprint(F.col("text")).alias("fp"))
    batch = spark.createDataFrame(
        [
            (10, "seen  BEFORE"),   # normalizes to a corpus duplicate
            (11, "fresh content"),
            (12, "fresh content"),  # in-batch duplicate of 11
            (13, "also new"),
        ],
        "doc_id bigint, text string",
    )
    out = sorted(
        r["doc_id"] for r in dedup_incremental(batch, fps).collect()
    )
    assert out == [11, 13]
    # replay determinism: same survivors on re-run
    again = sorted(r["doc_id"] for r in dedup_incremental(batch, fps).collect())
    assert again == out


# -------------------------------------------------------- histogram ------
def test_column_histogram_bins_and_clamp(spark):
    from momyre_spark.operators.profile import column_histogram

    df = spark.createDataFrame(
        [(x,) for x in (-5.0, 0.0, 4.9, 5.0, 9.9, 25.0, None)], "v double"
    )
    out = {
        r["bin"]: r
        for r in column_histogram(df, {"v": (0.0, 10.0, 2)}).collect()
    }
    # -5 clamps into bin 0; 25 clamps into bin 1; null dropped
    assert out[0]["cnt"] == 3 and out[1]["cnt"] == 3
    assert out[0]["lo"] == 0.0 and out[0]["hi"] == 5.0
    assert out[1]["lo"] == 5.0 and out[1]["hi"] == 10.0


def test_column_histogram_no_clamp_drops_outliers(spark):
    from momyre_spark.operators.profile import column_histogram

    df = spark.createDataFrame([(x,) for x in (-1.0, 1.0, 11.0)], "v double")
    out = column_histogram(df, {"v": (0.0, 10.0, 2)}, clamp=False).collect()
    assert sum(r["cnt"] for r in out) == 1


def test_column_histogram_single_scan_multi_column(spark):
    from momyre_spark.operators.profile import column_histogram

    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 20.0)], "a double, b double"
    )
    out = column_histogram(df, {"a": (0, 4, 2), "b": (0, 40, 2)})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1  # one pass over the input
    got = {(r["col_name"], r["bin"]): r["cnt"] for r in out.collect()}
    assert got[("a", 0)] == 1 and got[("a", 1)] == 1
    assert got[("b", 0)] == 1 and got[("b", 1)] == 1


# ------------------------------------------------------ forward fill -----
def test_forward_fill_locf_and_leading_nulls(spark):
    from momyre_spark.operators.timeseries import forward_fill

    df = spark.createDataFrame(
        [
            ("u1", 1, None),
            ("u1", 2, 5.0),
            ("u1", 3, None),
            ("u1", 4, None),
            ("u1", 5, 7.0),
            ("u2", 1, None),
        ],
        "k string, ts int, v double",
    )
    out = {
        (r["k"], r["ts"]): r["v"]
        for r in forward_fill(df, ["v"], key="k", order=("ts",)).collect()
    }
    assert out[("u1", 1)] is None  # leading null stays
    assert out[("u1", 3)] == 5.0 and out[("u1", 4)] == 5.0
    assert out[("u1", 5)] == 7.0
    assert out[("u2", 1)] is None


def test_fill_with_max_age_expires_stale_values(spark):
    from momyre_spark.operators.timeseries import fill_with_max_age

    df = spark.createDataFrame(
        [("s", 0, 1.0), ("s", 5, None), ("s", 100, None)],
        "k string, ts long, v double",
    )
    out = {
        r["ts"]: r["v"]
        for r in fill_with_max_age(df, "v", key="k", max_age=10).collect()
    }
    assert out[5] == 1.0       # within freshness bound
    assert out[100] is None    # carried value expired


# ----------------------------------------------------- snapshot diff -----
def test_snapshot_diff_insert_update_delete(spark, tmp_path):
    from momyre_spark.sinks.snapshots import (
        snapshot_diff,
        snapshot_merge_cdc,
        snapshot_write,
    )

    root = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [("a", 1, "eu"), ("b", 2, "us"), ("c", 3, "ap")],
        "_id string, val bigint, region string",
    )
    v1 = snapshot_write(spark, base, root, partition_by=["region"])
    actions = spark.createDataFrame(
        [
            ("b", "upsert", 20, "us", None),
            ("c", "delete", None, None, None),
            ("d", "upsert", 4, "eu", None),
        ],
        "_id string, __action string, val bigint, region string, __present array<string>",
    )
    v2 = snapshot_merge_cdc(
        spark, root, actions, {"val": "bigint", "region": "string"},
        partition_by=["region"],
    )
    diff = {
        r["_id"]: r.asDict()
        for r in snapshot_diff(spark, root, v1, v2).collect()
    }
    assert diff["b"]["__change"] == "update" and diff["b"]["val"] == 20
    assert diff["c"]["__change"] == "delete" and diff["c"]["val"] is None
    assert diff["d"]["__change"] == "insert" and diff["d"]["val"] == 4
    assert "a" not in diff  # unchanged row in an untouched partition


def test_snapshot_diff_skips_shared_partitions(spark, tmp_path):
    """Copy-on-write re-referencing makes the diff read ONLY churned
    partitions: shared dirs are string-equal and never scanned."""
    from momyre_spark.sinks.snapshots import (
        read_manifest,
        snapshot_diff,
        snapshot_merge_cdc,
        snapshot_write,
    )

    root = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [("a", 1, "eu"), ("b", 2, "us")], "_id string, val bigint, region string"
    )
    v1 = snapshot_write(spark, base, root, partition_by=["region"])
    acts = spark.createDataFrame(
        [("b", "upsert", 20, "us", None)],
        "_id string, __action string, val bigint, region string, __present array<string>",
    )
    v2 = snapshot_merge_cdc(
        spark, root, acts, {"val": "bigint", "region": "string"},
        partition_by=["region"],
    )
    m1 = read_manifest(spark, root, v1)
    m2 = read_manifest(spark, root, v2)
    assert m1["partitions"]["region=eu"] == m2["partitions"]["region=eu"]
    plan = (
        snapshot_diff(spark, root, v1, v2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "region=eu" not in plan  # untouched partition never read
    [row] = snapshot_diff(spark, root, v1, v2).collect()
    assert row["_id"] == "b" and row["__change"] == "update"


# ---------------------------------------------------- streaming dedup ----
def test_dedup_stream_drops_redeliveries(spark, tmp_path):
    from momyre_spark.streaming.dedup import dedup_stream

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"event_id": "e1", "ts": "2024-01-01T00:00:01", "v": 1},
        {"event_id": "e1", "ts": "2024-01-01T00:00:02", "v": 1},  # redelivery
        {"event_id": "e2", "ts": "2024-01-01T00:00:03", "v": 2},
    ]
    with open(src / "b1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = (
        spark.readStream.schema("event_id string, ts timestamp, v long")
        .json(str(src))
    )
    deduped = dedup_stream(stream, ["event_id"], ts_col="ts", horizon="1 minute")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id FROM dedup_out").collect()
    assert sorted(r["event_id"] for r in got) == ["e1", "e2"]


def test_dedup_stream_rejects_batch_frames(spark):
    from momyre_spark.streaming.dedup import dedup_stream

    with pytest.raises(ValueError, match="streaming"):
        dedup_stream(spark.range(3), ["id"])


# ---------------------------------------------------- resample / interp --
def _ts_df(spark, rows):
    df = spark.createDataFrame(rows, "k string, epoch bigint, v double, id bigint")
    return df.withColumn("ts", F.timestamp_seconds(F.col("epoch"))).drop("epoch")


def test_resample_locf_grid_and_carry(spark):
    from momyre_spark.operators.timeseries import resample_locf

    df = _ts_df(
        spark,
        [
            ("a", 10, 1.0, 1),
            ("a", 50, 2.0, 2),   # same bucket as t=10 -> later wins
            ("a", 200, 9.0, 3),  # bucket 180; 60 and 120 are gaps
            ("b", 65, 5.0, 4),   # single-bucket key -> one grid row
        ],
    )
    out = resample_locf(df, key="k", ts_col="ts", value_col="v",
                        step_seconds=60, tiebreak=("id",))
    got = {(r["k"], r["bucket_epoch"]): r["v"] for r in out.collect()}
    assert got == {
        ("a", 0): 2.0,     # last event in bucket wins
        ("a", 60): 2.0,    # carried
        ("a", 120): 2.0,   # carried
        ("a", 180): 9.0,
        ("b", 60): 5.0,
    }


def test_resample_locf_tiebreak_within_bucket(spark):
    from momyre_spark.operators.timeseries import resample_locf

    df = _ts_df(spark, [("a", 30, 1.0, 1), ("a", 30, 7.0, 2)])
    out = resample_locf(df, key="k", ts_col="ts", value_col="v",
                        step_seconds=60, tiebreak=("id",)).collect()
    assert len(out) == 1 and out[0]["v"] == 7.0  # higher id wins the tie


def test_interpolate_linear_matches_numpy(spark):
    import numpy as np

    from momyre_spark.operators.timeseries import interpolate_linear

    obs = {0: 1.0, 40: 5.0, 100: 2.0}
    xs = list(range(0, 121, 10))
    rows = [("a", float(x), obs.get(x), i) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, x double, v double, id bigint")
    out = interpolate_linear(df, key="k", order_col="x", value_col="v")
    got = {r["x"]: r["v"] for r in out.collect()}
    xp = sorted(obs)
    fp = [obs[x] for x in xp]
    for x in xs:
        if x > max(xp):  # trailing gap stays NULL
            assert got[x] is None
        else:
            assert got[x] == pytest.approx(float(np.interp(x, xp, fp)))


def test_interpolate_leading_gap_stays_null(spark):
    from momyre_spark.operators.timeseries import interpolate_linear

    df = spark.createDataFrame(
        [("a", 0.0, None), ("a", 1.0, 4.0), ("a", 2.0, None), ("a", 3.0, 8.0)],
        "k string, x double, v double",
    )
    got = {r["x"]: r["v"] for r in
           interpolate_linear(df, "k", "x", "v").collect()}
    assert got[0.0] is None and got[2.0] == 6.0 and got[3.0] == 8.0


# ------------------------------------------------------- sample_exact_k --
def test_sample_exact_k_deterministic_and_append_stable(spark):
    from momyre_spark.operators.sampling import sample_exact_k

    base = spark.range(200).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"] for r in sample_exact_k(base, 20).collect()}
    s2 = {r["doc_id"] for r in sample_exact_k(base, 20).collect()}
    assert len(s1) == 20 and s1 == s2
    # appending m rows displaces at most m sampled rows
    grown = spark.range(210).withColumnRenamed("id", "doc_id")
    s3 = {r["doc_id"] for r in sample_exact_k(grown, 20).collect()}
    assert len(s1 & s3) >= 10
    # different salt -> independent draw (almost surely different)
    s4 = {r["doc_id"] for r in sample_exact_k(base, 20, salt="other").collect()}
    assert s4 != s1


def test_sample_exact_k_plans_as_topk_not_global_sort(spark):
    from momyre_spark.operators.sampling import sample_exact_k

    docs = spark.range(1000).withColumnRenamed("id", "doc_id")
    plan = sample_exact_k(docs, 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_sample_exact_k_guards_driver_merge(spark):
    from momyre_spark.operators.sampling import sample_exact_k

    with pytest.raises(ValueError, match="top-k"):
        sample_exact_k(spark.range(10), 20_000_000, id_col="id")


# ----------------------------------------------------- variant promotion --
def test_promote_json_fields_typed_and_null_safe(spark):
    from momyre_spark.functions.semistructured import promote_json_fields

    df = spark.createDataFrame(
        [(1, '{"k": 7, "tag": "x"}'), (2, '{"tag": "y"}'), (3, '{"k": "oops", "tag": "z"}')],
        "id bigint, props string",
    )
    out = promote_json_fields(
        df, "props", {"k": ("$.k", "bigint"), "tag": ("$.tag", "string")}
    )
    got = {r["id"]: (r["k"], r["tag"]) for r in out.collect()}
    # missing path and uncastable value both -> NULL under try_variant_get
    assert got == {1: (7, "x"), 2: (None, "y"), 3: (None, "z")}
    assert "__variant_props" not in out.columns


def test_promote_json_fields_keep_variant_for_adhoc_paths(spark):
    from momyre_spark.functions.semistructured import promote_json_fields

    df = spark.createDataFrame([(1, '{"a": {"b": 3}}')], "id bigint, props string")
    out = promote_json_fields(df, "props", {}, keep_variant="pv")
    deep = out.select(
        F.try_variant_get(F.col("pv"), "$.a.b", "bigint").alias("b")
    ).collect()
    assert deep[0]["b"] == 3


def test_variant_query_stays_jvm_side(spark):
    """q51's VARIANT path must not fall back to Python evaluation."""
    from momyre_spark.plans import QUERIES, load_all

    load_all()
    plan = (
        QUERIES["q51_variant_props"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


# ------------------------------------------------------ duplicate spans --
def test_duplicate_spans_alignment_independent(spark):
    """A shared substring must be detected at ANY offset in each document —
    the content-anchored windows move with the text (fixed-stride sampling
    would only match offsets equal mod stride)."""
    import hashlib

    def h60(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)

    anchor = next(
        t for t in (f"tok{i}" for i in range(1000)) if h60(t) % 4 == 0
    )
    run = [anchor] + [f"w{i}" for i in range(11)]  # 12-token shared run
    doc_a = " ".join(run + ["taila", "tailb"])
    doc_b = " ".join(["p1", "p2", "p3"] + run + ["tailz"])  # offset 3 (!= 0 mod 4)
    doc_c = " ".join(f"z{i}" for i in range(20))

    from momyre_spark.operators.dedup import duplicate_spans

    docs = spark.createDataFrame(
        [(1, doc_a), (2, doc_b), (3, doc_c)], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: r["flagged"]
        for r in duplicate_spans(docs, span_tokens=8, anchor_density=4, hash_fn="md5").collect()
    }
    assert got == {1: True, 2: True, 3: False}


def test_duplicate_spans_short_docs_are_safe(spark):
    from momyre_spark.operators.dedup import duplicate_spans

    docs = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, "a b")], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: (r["n_spans"], r["flagged"])
           for r in duplicate_spans(docs, span_tokens=8, hash_fn="md5").collect()}
    assert got == {1: (0, False), 2: (0, False), 3: (0, False)}


# -------------------------------------------------------- heavy hitters --
def test_frequent_items_exact_vs_full_groupby(spark):
    """MG candidates + recount must equal the exhaustive groupBy answer —
    the summary bounds memory, never the result."""
    import random

    from momyre_spark.operators.heavyhitters import frequent_items

    rng = random.Random(7)
    # zipf-ish: few heavy values over a large tail
    rows = (
        [("hot1",)] * 300 + [("hot2",)] * 200 + [("warm",)] * 60
        + [(f"tail{i}",) for i in range(1000)]
        + [(f"tail{rng.randrange(1000)}",) for _ in range(440)]
    )
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "item string").repartition(8)
    got = [(r["item"], r["cnt"]) for r in
           frequent_items(df, "item", support=0.025).collect()]

    exact = (
        df.groupBy("item").count()
        .filter(F.col("count") >= 0.025 * df.count())
        .orderBy(F.desc("count"), "item")
        .collect()
    )
    assert got == [(r["item"], r["count"]) for r in exact]
    assert [i for i, _ in got[:2]] == ["hot1", "hot2"]


def test_frequent_items_support_validation(spark):
    from momyre_spark.operators.heavyhitters import frequent_items

    with pytest.raises(ValueError, match="support"):
        frequent_items(spark.range(5), "id", support=0.0)


def test_canonicalize_url_edge_cases(spark):
    from pyspark.sql import Row

    from momyre_spark.functions.text import canonicalize_url

    cases = [
        # default ports stripped per scheme; host+scheme lowercased
        ("HTTP://WWW.Ex.COM:80/a", "http://www.ex.com/a"),
        ("https://Ex.com:443/a", "https://ex.com/a"),
        # non-default port kept
        ("http://ex.com:8080/a", "http://ex.com:8080/a"),
        # fragment dropped; empty path becomes /
        ("https://ex.com#frag", "https://ex.com/"),
        # trailing slash stripped except root
        ("https://ex.com/a/b/", "https://ex.com/a/b"),
        ("https://ex.com/", "https://ex.com/"),
        # tracking params dropped, remainder sorted; empty query vanishes
        ("https://ex.com/p?utm_source=x&b=2&a=1&gclid=g", "https://ex.com/p?a=1&b=2"),
        ("https://ex.com/p?utm_campaign=c&fbclid=f", "https://ex.com/p"),
        # path case is PRESERVED (case-sensitive on most servers)
        ("https://ex.com/CaseSensitive", "https://ex.com/CaseSensitive"),
        # a '?' that first appears INSIDE the fragment is not a query
        ("https://ex.com/a#frag?b=2", "https://ex.com/a"),
        # non-absolute URLs pass through unchanged (no shared ':///' key)
        ("ex.com/page?a=1", "ex.com/page?a=1"),
        ("//cdn.ex.com/x.js", "//cdn.ex.com/x.js"),
    ]
    df = spark.createDataFrame([Row(i=i, url=u) for i, (u, _) in enumerate(cases)])
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonicalize_url(df.url).alias("c")).collect()
    }
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)


@pytest.mark.slow
def test_dedup_incremental_fuzzy_epochs(spark):
    """The fuzzy twin of dedup_incremental: near-duplicates of the EXISTING
    corpus are dropped via the banded state tables (never rescanning corpus
    text), in-batch near-dup clusters keep their min id, and survivors'
    state rows append for the next epoch."""
    from pyspark.sql import Row

    from momyre_spark.operators.dedup import dedup_incremental_fuzzy

    def doc(i, base, edit=None):
        words = [f"w{base}x{j}" for j in range(60)]
        if edit is not None:
            words[edit] = "EDITED"
        return Row(doc_id=i, text=" ".join(words))

    # epoch 1: 1 and 2 are near-dups (one-token edit); 3 distinct
    e1 = spark.createDataFrame([doc(1, "a"), doc(2, "a", edit=5), doc(3, "b")])
    empty_bands = spark.createDataFrame([], "doc_id long, band int, bh long")
    empty_sigs = spark.createDataFrame([], "doc_id long, signature array<bigint>")
    s1, b1, g1 = dedup_incremental_fuzzy(e1, empty_bands, empty_sigs,
                                         threshold=0.8)
    assert sorted(r["doc_id"] for r in s1.collect()) == [1, 3]
    bands_state = b1.localCheckpoint(eager=True)
    sigs_state = g1.localCheckpoint(eager=True)

    # epoch 2: 20 near-dups corpus doc 1; 21 fresh; 22/23 an in-batch pair
    e2 = spark.createDataFrame(
        [doc(20, "a", edit=9), doc(21, "c"), doc(22, "d"), doc(23, "d", edit=7)]
    )
    s2, b2, g2 = dedup_incremental_fuzzy(e2, bands_state, sigs_state,
                                         threshold=0.8)
    assert sorted(r["doc_id"] for r in s2.collect()) == [21, 22]
    # survivors' state rows cover exactly the survivors
    assert sorted({r["doc_id"] for r in b2.collect()}) == [21, 22]
    assert sorted(r["doc_id"] for r in g2.collect()) == [21, 22]

    # epoch 3 against the grown state: a near-dup of epoch-2's survivor 22
    bands3 = bands_state.unionByName(b2).localCheckpoint(eager=True)
    sigs3 = sigs_state.unionByName(g2).localCheckpoint(eager=True)
    e3 = spark.createDataFrame([doc(30, "d", edit=11), doc(31, "e")])
    s3, _, _ = dedup_incremental_fuzzy(e3, bands3, sigs3, threshold=0.8)
    assert sorted(r["doc_id"] for r in s3.collect()) == [31]
