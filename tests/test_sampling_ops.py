"""Sharding / split / stratified-sample / packing operator tests."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from momyre_spark.operators.sampling import (
    assign_shards,
    pack_sequences,
    stratified_sample,
    train_val_split,
)


def _docs(spark, n=200):
    return spark.createDataFrame(
        [Row(doc_id=i, lang="en" if i % 3 else "de", n_tokens=50 + (i * 37) % 400)
         for i in range(n)]
    )


def test_shards_are_stable_under_growth(spark):
    """Adding rows must not move existing rows between shards."""
    small = assign_shards(_docs(spark, 100), 8)
    big = assign_shards(_docs(spark, 200), 8)
    a = {r["doc_id"]: r["shard"] for r in small.collect()}
    b = {r["doc_id"]: r["shard"] for r in big.collect()}
    assert all(b[k] == v for k, v in a.items())
    assert set(b.values()) == set(range(8))  # all shards populated


def test_split_is_deterministic_and_disjoint(spark):
    out = train_val_split(_docs(spark), 0.1)
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    rows2 = {r["doc_id"]: r["split"] for r in train_val_split(_docs(spark), 0.1).collect()}
    assert rows == rows2
    n_val = sum(1 for v in rows.values() if v == "val")
    assert 0 < n_val < 60  # ~10% of 200, loose deterministic bound


def test_stratified_sample_exact_counts(spark):
    docs = _docs(spark, 300)
    out = stratified_sample(docs, {"en": 0.5, "de": 0.2}, strata_col="lang")
    got = out.groupBy("lang").count().collect()
    import math

    want = {
        "en": math.ceil(0.5 * docs.filter("lang = 'en'").count()),
        "de": math.ceil(0.2 * docs.filter("lang = 'de'").count()),
    }
    assert {r["lang"]: r["count"] for r in got} == want
    # deterministic: same rows every run
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in stratified_sample(docs, {"en": 0.5, "de": 0.2}, strata_col="lang").collect()
    )
    assert ids1 == ids2


def test_pack_sequences_bins_respect_stream_order(spark):
    """Bins are the concat-and-chunk layout: cumulative tokens before a doc
    determine its bin; totals per bin hover around the budget."""
    docs = _docs(spark, 120)
    out = pack_sequences(docs, max_tokens=1000).collect()
    # reconstruct the stream order and verify the bin formula row by row
    rows = sorted(out, key=lambda r: r["bin"])  # bins follow the hash order
    by_bin: dict[int, int] = {}
    for r in out:
        by_bin[r["bin"]] = by_bin.get(r["bin"], 0) + r["n_tokens"]
    # every bin except possibly the last starts within budget: the doc
    # starting a bin began before the cut, so bin sums exceed 1000 only by
    # one document's carryover
    max_doc = max(r["n_tokens"] for r in out)
    assert all(v <= 1000 + max_doc for v in by_bin.values())
    bins = sorted(by_bin)
    assert bins == list(range(len(bins)))  # contiguous bin ids
    assert not any(r["overflow"] for r in out)  # no doc exceeds the budget


def test_pack_sequences_flags_oversized_docs(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, n_tokens=50), Row(doc_id=2, n_tokens=5000)]
    )
    out = {r["doc_id"]: r["overflow"] for r in
           pack_sequences(docs, max_tokens=1000).collect()}
    assert out == {1: False, 2: True}


def test_pack_sequences_per_shard_windows(spark):
    """With shard_col the window partitions per shard — bin ids restart per
    shard and the plan never globally sorts."""
    docs = assign_shards(_docs(spark, 200), 4)
    out = pack_sequences(docs, max_tokens=1000, shard_col="shard")
    per_shard_bins = {
        r["shard"]: r["mn"] for r in
        out.groupBy("shard").agg(F.min("bin").alias("mn")).collect()
    }
    assert all(v == 0 for v in per_shard_bins.values())


def test_temperature_mixture_report_math_and_monotonicity(spark):
    """tau=0.5 weights: exact hand-computed values on planted strata;
    temperature up-samples the SMALL source relative to natural share and
    down-samples the large; budget allocation + epochs follow the weights;
    tau=1.0 (pow path) reproduces natural proportions."""
    import math

    from momyre_spark.operators.sampling import temperature_mixture_report

    rows = (
        [Row(doc_id=i, source="big", n_tokens=100) for i in range(90)]
        + [Row(doc_id=100 + i, source="small", n_tokens=100) for i in range(10)]
    )
    df = spark.createDataFrame(rows)
    got = {
        r["stratum"]: r
        for r in temperature_mixture_report(
            df, tau=0.5, global_budget=1_000_000
        ).collect()
    }
    assert got["big"]["tokens"] == 9000 and got["small"]["tokens"] == 1000
    s_big, s_small = math.sqrt(9000), math.sqrt(1000)
    w_big = s_big / (s_big + s_small)
    assert abs(got["big"]["weight"] - w_big) < 1e-5
    # temperature pulls weights toward uniform: small gains, big loses
    assert got["small"]["weight"] > got["small"]["nat_frac"]
    assert got["big"]["weight"] < got["big"]["nat_frac"]
    assert got["big"]["weight"] + got["small"]["weight"] > 0.999
    # allocation follows weight; epochs = alloc / corpus tokens
    assert got["big"]["alloc_tokens"] == int(got["big"]["weight"] * 1_000_000)
    assert abs(
        got["small"]["epochs"]
        - got["small"]["alloc_tokens"] / 1000
    ) < 1e-3

    nat = {
        r["stratum"]: r
        for r in temperature_mixture_report(df, tau=1.0).collect()
    }
    assert abs(nat["big"]["weight"] - 0.9) < 1e-5
    assert "alloc_tokens" not in nat["big"].asDict()


def test_materialize_mixture_repeats_and_downsamples(spark):
    """floor(e) full copies for everyone; the fractional extra copy hits
    ~frac of docs (hash threshold); e<1 keeps ~e of docs; e=0 drops the
    stratum; copies are 0..n-1 and deterministic across calls."""
    from momyre_spark.operators.sampling import materialize_mixture

    rows = [
        Row(doc_id=i, source=("rep" if i < 400 else "down"))
        for i in range(800)
    ]
    df = spark.createDataFrame(rows)
    out = materialize_mixture(
        df, {"rep": 2.5, "down": 0.5}, default_epochs=1.0
    )
    got = out.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    # rep: 400 docs x (2 + ~0.5 extra) ~ 1000; down: ~200
    assert 900 <= counts["rep"] <= 1100, counts
    assert 150 <= counts["down"] <= 250, counts
    per = {(r["doc_id"], r["copy"]) for r in out.collect()}
    # every rep doc has copies 0 and 1; copy indices dense from 0
    for i in range(400):
        assert (i, 0) in per and (i, 1) in per
    # determinism: second call identical
    per2 = {(r["doc_id"], r["copy"])
            for r in materialize_mixture(
                df, {"rep": 2.5, "down": 0.5}).collect()}
    assert per == per2
    # e=0 drops the stratum entirely
    none = materialize_mixture(df, {"rep": 0.0, "down": 0.0})
    assert none.count() == 0
    import pytest as _pt
    with _pt.raises(ValueError, match="epochs"):
        materialize_mixture(df, {"rep": -1.0})


def test_split_leakage_report_counts_and_group_split_is_leakproof(spark):
    from pyspark.sql import Row

    from momyre_spark.operators.sampling import (
        split_leakage_report,
        train_val_split,
    )

    # two dup groups (fp a: 3 docs, fp b: 2 docs) + singletons; force a
    # straddle by hand-assigning splits
    rows = [
        Row(doc_id=1, fp="a", split="train"),
        Row(doc_id=2, fp="a", split="train"),
        Row(doc_id=3, fp="a", split="val"),    # group a straddles
        Row(doc_id=4, fp="b", split="train"),
        Row(doc_id=5, fp="b", split="train"),  # group b does not
        Row(doc_id=6, fp="c", split="val"),
    ]
    rep = split_leakage_report(spark.createDataFrame(rows), "fp").collect()[0]
    assert rep["n_groups"] == 3
    assert rep["n_leaky_groups"] == 1
    assert rep["n_leaky_docs"] == 3
    assert rep["leak_frac"] == 0.3333

    # splitting on the group key makes straddling structurally impossible
    df = spark.createDataFrame(
        [Row(doc_id=i, fp=f"g{i % 7}") for i in range(100)]
    )
    grouped = train_val_split(df, 0.4, id_col="fp")
    rep2 = split_leakage_report(grouped, "fp").collect()[0]
    assert rep2["n_leaky_groups"] == 0 and rep2["n_leaky_docs"] == 0
    # while the doc-id split at the same fraction does leak on shared fps
    leaky = train_val_split(df, 0.4, id_col="doc_id")
    assert split_leakage_report(leaky, "fp").collect()[0]["n_leaky_groups"] > 0


def test_fim_transform_reassembles_and_is_stable(spark):
    import pytest as _pytest

    from momyre_spark.operators.sampling import fim_transform

    docs = spark.createDataFrame(
        [(i, f"doc-{i:04d}-" + "abcdefghij" * 8) for i in range(40)]
        + [(999, "tiny")],
        "doc_id long, text string",
    )
    out = fim_transform(docs, rate=0.6, spm_rate=0.5).collect()
    by_id = {r["doc_id"]: r for r in out}
    # short doc never transforms
    assert by_id[999]["fim_mode"] == "none"
    assert by_id[999]["fim_text"] == "tiny"
    modes = {m: sum(1 for r in out if r["fim_mode"] == m)
             for m in ("psm", "spm", "none")}
    assert modes["psm"] > 0 and modes["spm"] > 0 and modes["none"] > 0
    # every transformed doc reassembles to the original text exactly
    for r in out:
        t = r["fim_text"]
        if r["fim_mode"] == "psm":
            body = t[len("<fim_prefix>"):]
            pre, rest = body.split("<fim_suffix>", 1)
            suf, mid = rest.split("<fim_middle>", 1)
        elif r["fim_mode"] == "spm":
            body = t[len("<fim_suffix>"):]
            suf, rest = body.split("<fim_prefix>", 1)
            pre, mid = rest.split("<fim_middle>", 1)
        else:
            continue
        original = docs.filter(f"doc_id = {r['doc_id']}").collect()[0]["text"]
        assert pre + mid + suf == original, r["doc_id"]
        assert len(mid) >= 1 and len(pre) >= 1
    # layout-invariance: repartitioned input gives byte-identical output
    again = {
        r["doc_id"]: (r["fim_text"], r["fim_mode"])
        for r in fim_transform(
            docs.repartition(7), rate=0.6, spm_rate=0.5
        ).collect()
    }
    assert again == {
        r["doc_id"]: (r["fim_text"], r["fim_mode"]) for r in out
    }
    with _pytest.raises(ValueError):
        fim_transform(docs, rate=1.5)


def test_fim_transform_is_map_only(spark):
    from momyre_spark.operators.sampling import fim_transform

    docs = spark.createDataFrame(
        [(1, "x" * 64)], "doc_id long, text string"
    )
    plan = (
        fim_transform(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_packing_efficiency_conserves_tokens(spark):
    """sum(n_tokens) over bins == corpus total (spill is the next bin's
    prefix, so raw per-bin sums conserve); every doc lands in exactly
    one bin; overflow counts match the packing flags."""
    from momyre_spark.operators.sampling import (
        pack_sequences,
        packing_efficiency,
    )

    df = spark.createDataFrame(
        [(i, 100 + (i * 37) % 400) for i in range(200)] + [(999, 5000)],
        "doc_id long, n_tokens long",
    )
    rep = packing_efficiency(df, 1024).collect()
    packed = pack_sequences(df, 1024)
    assert sum(r["n_tokens"] for r in rep) == 100 * 200 + sum(
        (i * 37) % 400 for i in range(200)
    ) + 5000
    assert sum(r["n_docs"] for r in rep) == 201
    assert sum(r["overflow_docs"] for r in rep) == 1
    by_bin = {r["bin"]: r for r in rep}
    agg = packed.groupBy("bin").count().collect()
    assert {r["bin"]: r["count"] for r in agg} == {
        b: r["n_docs"] for b, r in by_bin.items()
    }


def test_cluster_weighted_sample_expected_mass(spark):
    """Every row gets a verdict; u is id-derived (copies of the same
    content get DIFFERENT draws); singleton clusters always keep
    (u*1 < 1); and keep probability is 1/n by construction — checked
    exactly via the derived uniforms, not statistically."""
    import pytest as _pytest

    from momyre_spark.operators.sampling import cluster_weighted_sample

    rows = [(i, "shared content here") for i in range(10)] + [
        (100 + i, f"unique text number {i}") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in cluster_weighted_sample(df).collect()}
    assert len(got) == 15
    assert all(got[i]["n_copies"] == 10 for i in range(10))
    assert all(got[100 + i]["kept"] for i in range(5))  # singletons
    for i in range(10):  # verdict is exactly u * n < 1
        assert got[i]["kept"] == (got[i]["u"] * 10 < 1.0)
    # bow key clusters shuffled copies; exact key does not
    shuf = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta")],
        "doc_id long, text string",
    )
    bow = {r["doc_id"]: r["n_copies"]
           for r in cluster_weighted_sample(shuf, key="bow").collect()}
    assert bow == {1: 2, 2: 2}
    ex = {r["doc_id"]: r["n_copies"]
          for r in cluster_weighted_sample(shuf, key="exact").collect()}
    assert ex == {1: 1, 2: 1}
    with _pytest.raises(ValueError):
        cluster_weighted_sample(df, key="nope")
