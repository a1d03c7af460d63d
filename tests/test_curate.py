"""Corpus-curation pipeline vs an independent Python reference."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import Row

from momyre_spark.operators.curate import curate_corpus
from momyre_spark.sources.parquet import load_table
from tests.conftest import SF_CORRECT


@pytest.mark.slow
def test_curate_stages_and_counts(spark):
    docs = load_table(spark, SF_CORRECT, "documents")
    curated, report = curate_corpus(
        docs, min_tokens=10, min_quality=0.3, languages=("en", "es"),
        neardup_threshold=0.8,
    )
    rep = {r["stage"]: r["docs"] for r in report.collect()}
    assert rep["input"] == 500
    assert rep["quality_lang_gate"] <= rep["input"]
    assert rep["exact_dedup"] <= rep["quality_lang_gate"]
    assert rep["neardup_removed"] <= rep["exact_dedup"]
    assert curated.count() == rep["neardup_removed"]
    # gated languages only
    assert {r[0] for r in curated.select("lang").distinct().collect()} <= {"en", "es"}


@pytest.mark.slow
def test_curate_matches_python_reference(spark):
    """Synthetic corpus with known exact dups, near-dups and junk."""
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest tonight").split()
    rows = []
    # 0,1: exact dups (case); 2: near-dup of 0 (one word); 3: distinct;
    # 4: too short; 5: wrong language; 6,7: near-dup pair of each other
    rows.append(Row(doc_id=0, lang="en", text=" ".join(base)))
    rows.append(Row(doc_id=1, lang="en", text=" ".join(base).upper()))
    rows.append(Row(doc_id=2, lang="en", text=" ".join(base[:-1] + ["today"])))
    rows.append(Row(doc_id=3, lang="en",
                    text="a completely different document about the engines of "
                         "distributed computation in the modern data stack era"))
    rows.append(Row(doc_id=4, lang="en", text="too short"))
    rows.append(Row(doc_id=5, lang="zz", text=" ".join(base)))
    other = ("many unrelated words describing the cooking of pasta with a "
             "rich tomato sauce and fresh basil leaves in the summer").split()
    rows.append(Row(doc_id=6, lang="en", text=" ".join(other)))
    rows.append(Row(doc_id=7, lang="en", text=" ".join(other[:-1] + ["autumn"])))

    docs = spark.createDataFrame(rows)
    curated, report = curate_corpus(
        docs, min_tokens=10, min_quality=0.0, languages=("en",),
        neardup_threshold=0.5,
    )
    survivors = sorted(r["doc_id"] for r in curated.collect())
    # 4 (short) and 5 (lang) gated; 1 exact-dups to 0; 2 near-dups to 0;
    # 7 near-dups to 6 -> survivors 0, 3, 6
    assert survivors == [0, 3, 6]
    rep = {r["stage"]: r["docs"] for r in report.collect()}
    assert rep == {"input": 8, "quality_lang_gate": 6,
                   "exact_dedup": 5, "neardup_removed": 3}


@pytest.mark.slow
def test_curate_to_lake_roundtrip(spark, tmp_path):
    """Curated corpus persisted to lang-partitioned lake layout and read
    back with partition pruning — the full training-data delivery path."""
    from pyspark.sql import functions as F

    from momyre_spark.sinks.lake import write_partitioned

    docs = load_table(spark, SF_CORRECT, "documents")
    curated, _ = curate_corpus(docs, min_tokens=10, min_quality=0.3,
                               neardup_threshold=0.8)
    out = str(tmp_path / "curated")
    write_partitioned(curated, out, partition_by=["lang"])
    back = spark.read.parquet(out)
    assert back.count() == curated.count()
    en = back.filter(F.col("lang") == "en")
    plan = en._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan
    assert en.count() == curated.filter("lang = 'en'").count()


def test_gopher_gates_planted_failures(spark):
    """Each rule trips on exactly the document planted to violate it."""
    from momyre_spark.operators.curate import gopher_gates

    good = "the quick brown fox and the lazy dog have gone to the old barn " \
           "of that keeper with plenty more words to clear the minimum " \
           "count for this gate battery today"  # > 25 words, stopword-rich
    docs = [
        Row(doc_id=1, text=good),
        Row(doc_id=2, text="too short but the and of that have with be to"),
        Row(doc_id=3, text=" ".join(["a an to of it by"] * 6)),  # mean len < 3
        Row(doc_id=4, text=good + " " + "#tag " * 6),        # symbols > 0.1
        Row(doc_id=5, text="\n".join("- " + line for line in [good] * 3)),
        Row(doc_id=6, text="\n".join(line + " ..." for line in [good] * 3)),
        Row(doc_id=7, text=good + " " + "123 456 789 " * 4),  # alpha < 0.8
        Row(doc_id=8, text=" ".join(f"w{i}ord here" for i in range(20))),
        # one stopword repeated 30x: occurrences pass, DISTINCT count fails
        Row(doc_id=9, text=" ".join(["the"] * 30) + " word another thing"),
    ]
    got = {r["doc_id"]: r for r in gopher_gates(
        spark.createDataFrame(docs), min_words=25,
        max_bullet_line_frac=0.5, max_ellipsis_line_frac=0.5,
    ).collect()}
    assert got[1]["passes"]
    assert not got[2]["gate_words"] and got[2]["gate_stopwords"]
    assert not got[3]["gate_word_len"]
    assert not got[4]["gate_symbols"]
    assert not got[5]["gate_bullets"] and got[1]["gate_bullets"]
    assert not got[6]["gate_ellipsis"]
    assert not got[7]["gate_alpha"]
    assert not got[8]["gate_stopwords"]  # no Gopher stopwords at all
    assert not got[9]["gate_stopwords"]  # 30x "the" is only 1 DISTINCT stop
    for d in (2, 3, 4, 5, 6, 7, 8, 9):
        assert not got[d]["passes"]


def test_repetition_report_hand_computed(spark):
    """Gopher repetition metrics against hand-computed values: duplicate
    lines/paragraphs by count and by character mass, top-n-gram character
    fraction (overlap-correct), NULL (never 0) for empty docs."""
    from pyspark.sql import Row

    from momyre_spark.operators.curate import repetition_report

    docs = spark.createDataFrame(
        [
            # lines: [a b, a b, c d, a b, a b] -> 5 lines, 3 distinct,
            # dup chars 4*3=12 of 15; paras: [a b\na b\nc d, a b\na b]
            Row(doc_id=0, text="a b\na b\nc d\n\na b\na b"),
            # tokens x y z x3: top2 'x y'x3*3=9/17, top3 'x y z'x3*5=15/17,
            # top4 'x y z x'x2*7=14/17
            Row(doc_id=1, text="x y z x y z x y z"),
            Row(doc_id=2, text=""),
        ]
    )
    rep = {r["doc_id"]: r for r in repetition_report(docs).collect()}
    r0 = rep[0]
    assert r0["n_lines"] == 5
    assert r0["dup_line_frac"] == 0.6            # (5-3)/5
    assert r0["dup_line_char_frac"] == 0.8       # 12/15
    assert r0["dup_para_frac"] == 0.0
    assert r0["top2_frac"] == 0.631579           # 'a b'x4*3 / 19
    r1 = rep[1]
    assert r1["top2_frac"] == 0.529412
    assert r1["top3_frac"] == 0.882353
    assert r1["top4_frac"] == 0.823529           # 2 overlap-free of 3 windows
    r2 = rep[2]
    assert r2["n_lines"] == 0
    assert all(
        r2[c] is None
        for c in ("dup_line_frac", "dup_para_frac", "top2_frac", "top4_frac")
    )


def test_domain_quality_report_gates_and_small_domain_immunity(spark):
    """Planted domains: duplicate-heavy, non-alphabetic, and too-short
    domains block; a clean domain passes; a domain under min_docs never
    blocks regardless of how bad it looks (insufficient evidence)."""
    import pytest as _pytest

    from momyre_spark.operators.curate import domain_quality_report

    rows = []
    long_text = " ".join(f"alpha bravo charlie delta echo w{i}" for i in range(10))
    # dupfarm: 6 docs, 4 of them identical
    for i in range(6):
        rows.append((100 + i, "dupfarm",
                     long_text if i < 4 else long_text + f" unique{i}"))
    # junk: 6 docs of digits/punctuation
    for i in range(6):
        rows.append((200 + i, "junk", f"123456 !!! 789-{i} 000 ### " * 12))
    # short: 6 docs of 3 tokens
    for i in range(6):
        rows.append((300 + i, "short", f"tiny doc {i}"))
    # clean: 6 long unique alphabetic docs
    for i in range(6):
        rows.append((400 + i, "clean", long_text + f" tail{i} " + long_text))
    # tiny: 3 identical junk docs — under min_docs, must NOT block
    for i in range(3):
        rows.append((500 + i, "tiny", "999 888"))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["domain"]: r for r in domain_quality_report(
        df, min_docs=5, max_dup_frac=0.5, min_alpha_frac=0.6,
        min_mean_tokens=20.0).collect()}
    assert got["dupfarm"]["blocked"] and got["dupfarm"]["n_dup_docs"] == 4
    assert got["junk"]["blocked"] and got["junk"]["alpha_frac"] < 0.6
    assert got["short"]["blocked"] and got["short"]["mean_tokens"] == 3.0
    assert not got["clean"]["blocked"]
    assert not got["tiny"]["blocked"] and got["tiny"]["n_dup_docs"] == 3

    # bow keying clusters shuffled re-hostings the exact key misses
    shuf = spark.createDataFrame(
        [(1, "s", "alpha bravo charlie"), (2, "s", "charlie alpha bravo"),
         (3, "s", "delta echo foxtrot")],
        "doc_id long, source string, text string",
    )
    exact = {r["domain"]: r for r in domain_quality_report(shuf).collect()}
    bow = {r["domain"]: r for r in domain_quality_report(
        shuf, key="bow").collect()}
    assert exact["s"]["n_dup_docs"] == 0 and bow["s"]["n_dup_docs"] == 2

    with _pytest.raises(ValueError):
        domain_quality_report(shuf, key="nope")
