"""Tests: document chunking, unigram-LM scoring, global shuffle,
cross-source overlap (the round-3 training-pipeline additions)."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from momyre_spark.operators.chunking import chunk_documents
from momyre_spark.operators.dedup import cross_source_overlap
from momyre_spark.operators.lm import score_documents, train_unigram_lm
from momyre_spark.operators.sampling import global_shuffle


# ------------------------------------------------------------- chunking --
def test_chunk_windows_and_overlap(spark):
    toks = [f"t{i}" for i in range(10)]
    df = spark.createDataFrame([Row(doc_id=1, text=" ".join(toks))])
    out = {
        r["chunk_id"]: (r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_documents(df, window=4, stride=3).collect()
    }
    # starts at 0,3,6,9 -> 4 chunks; last has a single token
    assert set(out) == {0, 1, 2, 3}
    assert out[0] == ("t0 t1 t2 t3", 4)
    assert out[1] == ("t3 t4 t5 t6", 4)
    assert out[3] == ("t9", 1)


def test_chunk_stride_equals_window_partitions(spark):
    toks = [f"t{i}" for i in range(9)]
    df = spark.createDataFrame([Row(doc_id=1, text=" ".join(toks))])
    rows = chunk_documents(df, window=3).collect()
    rebuilt = " ".join(
        r["chunk_text"] for r in sorted(rows, key=lambda r: r["chunk_id"])
    )
    assert rebuilt == " ".join(toks)
    assert all(r["n_chunk_tokens"] == 3 for r in rows)


def test_chunk_empty_and_short_docs(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="   "), Row(doc_id=2, text="only two")]
    )
    rows = chunk_documents(df, window=5, stride=2).collect()
    assert len(rows) == 1  # empty doc contributes nothing
    assert rows[0]["doc_id"] == 2
    assert rows[0]["chunk_text"] == "only two"


# ------------------------------------------------------------ unigram LM --
def test_unigram_lm_probabilities(spark):
    # corpus: 'a' x3, 'b' x1 -> p(a)=3/4, p(b)=1/4
    df = spark.createDataFrame([Row(doc_id=1, text="a a a b")])
    lm = {r["token"]: r for r in train_unigram_lm(df).collect()}
    assert lm["a"]["count"] == 3 and lm["b"]["count"] == 1
    assert abs(float(lm["a"]["logprob"]) - math.log(0.75)) < 1e-5
    assert abs(float(lm["b"]["logprob"]) - math.log(0.25)) < 1e-5


def test_score_rare_token_doc_scores_lower(spark):
    rows = [Row(doc_id=i, text="the common words here") for i in range(10)]
    rows.append(Row(doc_id=99, text="zyzzyva qwertyuiop"))
    df = spark.createDataFrame(rows)
    scores = {
        r["doc_id"]: r["mean_logprob"] for r in score_documents(df).collect()
    }
    assert scores[99] < scores[0]


def test_score_oov_with_min_count(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="x x x"), Row(doc_id=2, text="x rare")]
    )
    lm = train_unigram_lm(df, min_count=2)  # 'rare' dropped
    out = {r["doc_id"]: r for r in score_documents(df, lm=lm).collect()}
    assert out[2]["n_oov"] == 1 and out[1]["n_oov"] == 0
    # doc 2 mean over in-vocab tokens only
    assert out[2]["mean_logprob"] == out[1]["mean_logprob"]


def test_score_all_oov_is_null(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b")])
    lm = train_unigram_lm(
        spark.createDataFrame([Row(doc_id=9, text="z z")]),
    )
    (row,) = score_documents(df, lm=lm).collect()
    assert row["mean_logprob"] is None and row["n_oov"] == 2


# --------------------------------------------------------- global shuffle --
def test_global_shuffle_is_dense_permutation(spark):
    df = spark.createDataFrame([Row(doc_id=i) for i in range(500)])
    pos = [r["position"] for r in global_shuffle(df, num_buckets=16).collect()]
    assert sorted(pos) == list(range(500))


def test_global_shuffle_partitioning_invariant(spark):
    df = spark.createDataFrame([Row(doc_id=i) for i in range(300)])
    a = {
        r["doc_id"]: r["position"]
        for r in global_shuffle(df.repartition(1), num_buckets=8).collect()
    }
    b = {
        r["doc_id"]: r["position"]
        for r in global_shuffle(df.repartition(13), num_buckets=64).collect()
    }
    assert a == b  # order depends only on the hash, not layout or buckets


def test_global_shuffle_salt_gives_new_permutation(spark):
    df = spark.createDataFrame([Row(doc_id=i) for i in range(200)])
    a = {r["doc_id"]: r["position"] for r in global_shuffle(df).collect()}
    b = {
        r["doc_id"]: r["position"]
        for r in global_shuffle(df, salt="s2").collect()
    }
    assert a != b
    assert sorted(b.values()) == list(range(200))


def test_global_shuffle_no_single_partition_window(spark):
    df = spark.createDataFrame([Row(doc_id=i) for i in range(100)])
    plan = (
        global_shuffle(df, num_buckets=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the big-side window must partition by bucket, never a global sort of
    # the full frame in one task (the offsets frame is 16 rows, fine)
    assert "partitionBy=[__bucket" in plan or "__bucket" in plan


# ----------------------------------------------------- cross-source overlap --
def test_cross_source_overlap_counts_shared(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, source="s1", text="shared doc one"),
            Row(doc_id=2, source="s2", text="shared doc one"),
            Row(doc_id=3, source="s2", text="Shared DOC one"),  # same fp
            Row(doc_id=4, source="s3", text="unique to s3"),
            Row(doc_id=5, source="s1", text="another shared"),
            Row(doc_id=6, source="s3", text="another shared"),
        ]
    )
    out = {
        (r["source_a"], r["source_b"]): r["shared_fingerprints"]
        for r in cross_source_overlap(df).collect()
    }
    assert out == {("s1", "s2"): 1, ("s1", "s3"): 1}


# ------------------------------------------------------------- rank fusion --
def test_rrf_fuse_orders_by_agreement(spark):
    from momyre_spark.operators.fuse import rrf_fuse

    a = spark.createDataFrame([Row(doc_id=i, rank=r) for r, i in enumerate([1, 2, 3], 1)])
    b = spark.createDataFrame([Row(doc_id=i, rank=r) for r, i in enumerate([2, 1, 9], 1)])
    out = {r["doc_id"]: (r["rrf_score"], r["rank"]) for r in rrf_fuse([a, b]).collect()}
    # docs 1 and 2 appear high in both lists; 1 has ranks (1,2), 2 has (2,1)
    assert out[1][0] == out[2][0]          # symmetric rank pairs tie
    assert out[1][1] == 1 and out[2][1] == 2  # tie broken by id
    # item only in one list scores below items in both
    assert out[9][0] < out[3][0] + 1e-12 or out[9][1] > 2


def test_rrf_missing_rank_contributes_zero(spark):
    from momyre_spark.operators.fuse import rrf_fuse

    a = spark.createDataFrame([Row(doc_id=1, rank=1)])
    b = spark.createDataFrame([Row(doc_id=2, rank=1)])
    out = {r["doc_id"]: r["rrf_score"] for r in rrf_fuse([a, b]).collect()}
    assert abs(out[1] - 1 / 61) < 1e-12 and abs(out[2] - 1 / 61) < 1e-12


# ------------------------------------------------------ per-group sampling --
def test_sample_per_group_caps_and_keeps_small_groups(spark):
    from momyre_spark.operators.sampling import sample_per_group

    rows = [Row(doc_id=i, g="big") for i in range(50)]
    rows += [Row(doc_id=100 + i, g="small") for i in range(3)]
    df = spark.createDataFrame(rows)
    out = sample_per_group(df, 10, ["g"]).groupBy("g").count().collect()
    counts = {r["g"]: r["count"] for r in out}
    assert counts == {"big": 10, "small": 3}


def test_sample_per_group_deterministic_and_append_stable(spark):
    from momyre_spark.operators.sampling import sample_per_group

    base = spark.createDataFrame([Row(doc_id=i, g=i % 2) for i in range(100)])
    more = spark.createDataFrame([Row(doc_id=i, g=i % 2) for i in range(140)])
    a = {r["doc_id"] for r in sample_per_group(base, 8, ["g"]).collect()}
    a2 = {r["doc_id"] for r in sample_per_group(base.repartition(7), 8, ["g"]).collect()}
    assert a == a2  # layout-independent
    b = {r["doc_id"] for r in sample_per_group(more, 8, ["g"]).collect()}
    # appends can only displace, never reshuffle: old sample mostly survives
    assert len(a & b) >= 10


# ---------------------------------------------------- weighted sampling --
def test_weighted_sample_biases_toward_heavy_rows(spark):
    from momyre_spark.operators.sampling import weighted_sample_k

    # two strata: weight 100 vs weight 1, equal counts
    rows = [Row(doc_id=i, w=100 if i < 500 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows)
    out = weighted_sample_k(df, 100, weight_col="w")
    heavy = sum(1 for r in out.collect() if r["w"] == 100)
    assert heavy > 80  # ~99% expected; 80 is a 5-sigma-safe floor


def test_weighted_sample_exact_k_and_deterministic(spark):
    from momyre_spark.operators.sampling import weighted_sample_k

    df = spark.createDataFrame([Row(doc_id=i, w=1 + i % 7) for i in range(500)])
    a = sorted(r["doc_id"] for r in weighted_sample_k(df, 50, "w").collect())
    b = sorted(
        r["doc_id"]
        for r in weighted_sample_k(df.repartition(9), 50, "w").collect()
    )
    assert len(a) == 50 and a == b


def test_weighted_sample_drops_nonpositive_weights(spark):
    from momyre_spark.operators.sampling import weighted_sample_k

    df = spark.createDataFrame(
        [Row(doc_id=1, w=0), Row(doc_id=2, w=-3), Row(doc_id=3, w=5)]
    )
    out = [r["doc_id"] for r in weighted_sample_k(df, 10, "w").collect()]
    assert out == [3]


# ------------------------------------------------------------ smoothing --
def test_smoothed_lm_charges_oov(spark):
    from momyre_spark.operators.lm import score_documents, train_unigram_lm

    train = spark.createDataFrame([Row(doc_id=1, text="a a a b")])
    lm = train_unigram_lm(train, smoothing_k=1.0)
    # V=2, total=4, denom = ln(4 + 3) ; p(a)=(3+1)/7, p(b)=(1+1)/7, oov=1/7
    got = {r["token"]: float(r["logprob"]) for r in lm.collect()}
    assert abs(got["a"] - math.log(4 / 7)) < 1e-5
    assert abs(got["b"] - math.log(2 / 7)) < 1e-5
    new = spark.createDataFrame([Row(doc_id=9, text="a zzz")])
    (row,) = score_documents(new, lm=lm).collect()
    assert row["n_oov"] == 1
    want = (math.log(4 / 7) + math.log(1 / 7)) / 2
    assert abs(row["mean_logprob"] - want) < 1e-3


def test_score_shuffle_join_path_matches_broadcast(spark):
    from momyre_spark.operators.lm import score_documents

    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"common words t{i % 4}") for i in range(40)]
    )
    a = {r["doc_id"]: r["mean_logprob"]
         for r in score_documents(df, broadcast_vocab=True).collect()}
    b = {r["doc_id"]: r["mean_logprob"]
         for r in score_documents(df, broadcast_vocab=False).collect()}
    assert a == b


def test_dense_positions_matches_global_window_and_is_layout_invariant(spark):
    """Two-pass range rank == the exact global row_number, including a
    massive equal-value group (ties can never straddle a bucket boundary),
    at any input partitioning."""
    from pyspark.sql import Row, Window
    from pyspark.sql import functions as F

    from momyre_spark.operators.sampling import dense_positions

    rows = [Row(doc_id=i, score=(i * 37) % 19) for i in range(400)]
    rows += [Row(doc_id=1000 + i, score=7) for i in range(200)]  # huge tie
    df = spark.createDataFrame(rows)
    want = {
        r["doc_id"]: r["pos"]
        for r in df.withColumn(
            "pos",
            F.row_number().over(Window.orderBy("score", "doc_id")) - 1,
        ).collect()
    }
    for parts in (1, 7):
        got = {
            r["doc_id"]: r["position"]
            for r in dense_positions(
                df.repartition(parts), "score", num_buckets=8
            ).collect()
        }
        assert got == want


def test_bigram_lm_penalizes_scrambled_transitions(spark):
    """Tokens identical, transitions different: a scrambled twin of a
    repetitive corpus must score LOWER under the bigram LM even though the
    unigram LM cannot tell them apart."""
    from momyre_spark.operators.lm import (
        score_documents_bigram,
        train_bigram_lm,
    )

    fluent = "the cat sat on the mat " * 8
    # same multiset of tokens, transitions broken
    scrambled = "cat the on sat mat the " * 8
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=fluent.strip()),
         Row(doc_id=2, text=fluent.strip()),
         Row(doc_id=3, text=fluent.strip()),
         Row(doc_id=4, text=scrambled.strip())]
    )
    got = {r["doc_id"]: r for r in score_documents_bigram(docs).collect()}
    assert got[1]["n_bigrams"] == 47
    assert got[1]["mean_logprob"] == got[2]["mean_logprob"]
    assert got[4]["mean_logprob"] < got[1]["mean_logprob"]

    # the trained table is a proper conditional: sum over cur of
    # P(cur|prev) mass reconstructed from counts equals 1 per prev
    lm = train_bigram_lm(docs)
    chk = (
        lm.groupBy("prev")
        .agg((F.sum("count") / F.sum("count")).alias("one"))
        .collect()
    )
    assert all(abs(r["one"] - 1.0) < 1e-12 for r in chk)


def test_bigram_lm_short_docs_excluded(spark):
    from momyre_spark.operators.lm import score_documents_bigram

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="hello"), Row(doc_id=2, text="hello world")]
    )
    got = {r["doc_id"]: r for r in score_documents_bigram(docs).collect()}
    assert 1 not in got          # a 1-token doc has no transitions
    assert got[2]["n_bigrams"] == 1


def test_calibrate_scores_quantiles_and_buckets(spark):
    from momyre_spark.operators.sampling import calibrate_scores

    rows = ([("s1", i, float(i)) for i in range(1, 6)]          # 1..5
            + [("s2", i, 100.0 * i) for i in range(1, 3)]       # wild scale
            + [("s3", 1, 7.0)]                                  # single row
            + [("s1", 99, None)])                               # NULL dropped
    df = spark.createDataFrame(rows, "source string, id long, score double")
    out = calibrate_scores(df, ["source"], "score", ["id"], buckets=2)
    got = {(r["source"], r["id"]): r for r in out.collect()}
    assert len(got) == 8  # NULL-score row dropped
    # percent_rank = (rank-1)/(n-1) inside each source
    assert got[("s1", 1)]["calibrated"] == 0.0
    assert got[("s1", 3)]["calibrated"] == 0.5
    assert got[("s1", 5)]["calibrated"] == 1.0
    # scale-free: s2's top item calibrates to 1.0 like s1's
    assert got[("s2", 2)]["calibrated"] == 1.0
    # single-row group -> 0.0, bucket 1
    assert got[("s3", 1)]["calibrated"] == 0.0
    assert got[("s3", 1)]["calibrated_bucket"] == 1
    # ntile(2) over 5 rows: first bucket gets the extra row
    assert [got[("s1", i)]["calibrated_bucket"] for i in (1, 2, 3, 4, 5)] \
        == [1, 1, 1, 2, 2]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="tiebreak"):
        calibrate_scores(df, ["source"], "score", [])


def test_cross_score_bigram_oov_backoff(spark):
    import math

    import pytest as _pytest

    from momyre_spark.operators.lm import cross_score_bigram

    train = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "b c")], "doc_id long, text string"
    )
    # eval doc 10: seen pair (a b); doc 11: unseen pair with seen cur
    # (c) and unseen prev; doc 12: fully OOV pair — must still score
    ev = spark.createDataFrame(
        [(10, "a b"), (11, "zz c"), (12, "qq ww")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in cross_score_bigram(train, ev).collect()}
    assert set(got) == {10, 11, 12}  # nothing vanished
    # train bigram table: (a,b):2 (b,c):1 -> T=3, V(cur)={b,c} -> V=2
    t, v = 3, 2
    p_uni_b = (2 + 1) / (t + v + 1)
    want10 = math.log(0.7 * (2 / 2) + (1.0 - 0.7) * p_uni_b)
    assert float(got[10]["mean_logprob"]) == _pytest.approx(
        want10, abs=1e-4
    )
    p_uni_c = (1 + 1) / (t + v + 1)
    want11 = math.log(0.7 * 0.0 + (1.0 - 0.7) * p_uni_c)
    assert float(got[11]["mean_logprob"]) == _pytest.approx(
        want11, abs=1e-4
    )
    p_oov = (0 + 1) / (t + v + 1)
    want12 = math.log((1.0 - 0.7) * p_oov)
    assert float(got[12]["mean_logprob"]) == _pytest.approx(
        want12, abs=1e-4
    )
    # in-domain text must outscore OOV salad
    assert got[10]["mean_logprob"] > got[12]["mean_logprob"]


def test_cross_score_bigram_partition_invariant_and_shuffle_path(spark):
    from momyre_spark.operators.lm import cross_score_bigram

    train = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{(i + 1) % 7} tok{(i + 2) % 7}")
         for i in range(50)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100 + i, f"tok{i % 9} tok{(i + 3) % 9}") for i in range(20)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, cross_score_bigram(train, ev).collect()))
    b = sorted(
        map(
            tuple,
            cross_score_bigram(
                train.repartition(5), ev.repartition(3),
                broadcast_lm=False,
            ).collect(),
        )
    )
    assert a == b and len(a) == 20


def test_text_cross_perplexity_oracle_parity(spark):
    """Pre-validates the round-8 registration (driver-mirror compare)."""
    import os

    import duckdb
    import pytest as _pytest

    from momyre_spark.plans.text_queries import (
        _XPPL_ORACLE,
        text_cross_perplexity,
    )
    from tests.oracle_compare import compare

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/documents.parquet"):
        _pytest.skip("sf0.001 testdata absent")
    sdf = text_cross_perplexity(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    ddf = con.execute(_XPPL_ORACLE).fetchdf()
    ok, msg = compare(sdf, ddf)
    assert ok and len(sdf) > 0, msg
