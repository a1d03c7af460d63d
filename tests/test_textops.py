

def test_strip_boilerplate_lines_threshold_and_empty_doc(spark):
    from pyspark.sql import Row

    from momyre_spark.operators.textops import strip_boilerplate_lines

    # banner in 10/10 docs (strip), footer in 3/10 (strip at 20%),
    # uniques kept; doc 9 is banner-only -> survives with empty text
    rows = []
    for i in range(9):
        lines = ["BANNER", f"unique {i}"]
        if i < 3:
            lines.append("FOOTER")
        rows.append(Row(doc_id=i, text="\n".join(lines)))
    rows.append(Row(doc_id=9, text="BANNER"))
    out = {r["doc_id"]: r for r in strip_boilerplate_lines(
        spark.createDataFrame(rows)).collect()}
    assert out[0]["clean_text"] == "unique 0" and out[0]["n_removed"] == 2
    assert out[4]["clean_text"] == "unique 4" and out[4]["n_removed"] == 1
    assert out[9]["clean_text"] == "" and out[9]["n_lines"] == 0
    # order preserved on multi-line survivors (uniques must be per-doc —
    # identical docs would make every line 100%-df boilerplate)
    multi = spark.createDataFrame(
        [Row(doc_id=i, text=f"BANNER\nfirst {i}\nsecond {i}\nthird {i}")
         for i in range(20)]  # 20 docs: a unique line is 5% df, kept
    )
    kept = {r["doc_id"]: r for r in strip_boilerplate_lines(multi).collect()}
    assert kept[2]["clean_text"] == "first 2\nsecond 2\nthird 2"


def test_strip_boilerplate_null_text_stays_visible(spark):
    from pyspark.sql import Row

    from momyre_spark.operators.textops import strip_boilerplate_lines

    rows = [Row(doc_id=i, text=f"unique {i}") for i in range(9)]
    rows.append(Row(doc_id=9, text=None))
    out = {r["doc_id"]: r for r in strip_boilerplate_lines(
        spark.createDataFrame(rows, "doc_id long, text string")).collect()}
    assert 9 in out  # the NULL-text doc did not vanish
    assert out[9]["clean_text"] == "" or out[9]["n_lines"] >= 0


def test_pmi_collocations_known_corpus(spark):
    import math

    import pytest as _pytest

    from momyre_spark.operators.lm import pmi_collocations

    # corpus bigrams: "a b" x3, "b c" x1 (from "a b c"), plus "d d" x2
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b c"), (4, "d d d")],
        "doc_id long, text string",
    )
    out = {
        (r["prev"], r["cur"]): r
        for r in pmi_collocations(docs, min_count=1).collect()
    }
    # bigram table: (a,b):3 (b,c):1 (d,d):2 -> N=6
    assert set(out) == {("a", "b"), ("b", "c"), ("d", "d")}
    ab = out[("a", "b")]
    # prev-marginal a=3, cur-marginal b=3: pmi = ln(6*3/(3*3))
    want = math.log(6.0 * 3.0 / 9.0)
    assert float(ab["pmi"]) == _pytest.approx(want, abs=1e-6)
    want_npmi = want / -math.log(3.0 / 6.0)
    assert float(ab["npmi"]) == _pytest.approx(want_npmi, abs=1e-6)
    dd = out[("d", "d")]
    # prev d=2, cur d=2: pmi = ln(6*2/4) = ln(3)
    assert float(dd["pmi"]) == _pytest.approx(math.log(3.0), abs=1e-6)
    # min_count prunes output but NOT the marginals
    pruned = {
        (r["prev"], r["cur"]): r
        for r in pmi_collocations(docs, min_count=2).collect()
    }
    assert set(pruned) == {("a", "b"), ("d", "d")}
    assert float(pruned[("a", "b")]["pmi"]) == _pytest.approx(
        want, abs=1e-6
    )
    with _pytest.raises(ValueError):
        pmi_collocations(docs, min_count=0)


def test_source_vocab_jaccard_known(spark):
    import pytest as _pytest

    from momyre_spark.operators.textops import source_vocab_jaccard

    docs = spark.createDataFrame(
        [("s1", "a b c"), ("s1", "a d"),
         ("s2", "a b e"), ("s3", "x y"), ("s4", "  ")],
        "source string, text string",
    )
    got = {(r["source_a"], r["source_b"]): r
           for r in source_vocab_jaccard(docs).collect()}
    # s3 shares nothing; s4 is blank (dropped); only (s1, s2) intersect
    assert set(got) == {("s1", "s2")}
    r = got[("s1", "s2")]
    # V1 = {a,b,c,d} V2 = {a,b,e}: inter 2, union 5
    assert r["vocab_a"] == 4 and r["vocab_b"] == 3 and r["inter"] == 2
    assert r["jaccard"] == _pytest.approx(0.4, abs=1e-6)


def test_dup_ngram_coverage_known(spark):
    import pytest as _pytest

    from momyre_spark.operators.textops import dup_ngram_coverage

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"),
         (2, "the quick brown cat sits"),
         (3, "completely different text here"),
         (4, "too short")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dup_ngram_coverage(docs).collect()}
    assert set(got) == {1, 2, 3}  # doc 4 has < 3 words
    # doc1 trigrams: [the quick brown, quick brown fox, brown fox jumps]
    # only "the quick brown" is shared (with doc 2)
    assert got[1]["n_shingles"] == 3 and got[1]["n_shared"] == 1
    assert got[1]["coverage"] == _pytest.approx(1.0 / 3.0, abs=1e-6)
    assert got[2]["n_shared"] == 1
    assert got[3]["n_shared"] == 0 and got[3]["coverage"] == 0.0
    with _pytest.raises(ValueError):
        dup_ngram_coverage(docs, n=2)


def test_duplicate_spans_known(spark):
    import pytest as _pytest

    from momyre_spark.operators.textops import duplicate_spans

    docs = spark.createDataFrame(
        [
            # docs 1 and 2 share the 5-token prefix "a b c d e":
            # duplicated trigram positions 0,1,2 -> one maximal span
            # covering tokens 0..4 (5 tokens, 3 shingles)
            (1, "a b c d e x1 y1 z1 a b c"),
            (2, "a b c d e x2 y2 z2"),
            (3, "totally unrelated words here"),
            (4, "no dup"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["start_tok"]): r
        for r in duplicate_spans(docs).collect()
    }
    # doc1: prefix span 0..4 AND the tail "a b c" repeats the corpus
    # trigram "a b c" (occurs in doc1 twice + doc2) -> span at p=8
    assert (1, 0) in got and (2, 0) in got and (1, 8) in got
    s = got[(1, 0)]
    assert s["end_tok"] == 4 and s["span_tokens"] == 5
    assert s["n_dup_shingles"] == 3
    tail = got[(1, 8)]
    assert tail["end_tok"] == 10 and tail["span_tokens"] == 3
    # doc3 has trigrams but none duplicated; doc4 too short
    assert not any(d == 3 or d == 4 for d, _ in got)
    with _pytest.raises(ValueError):
        duplicate_spans(docs, n=1)


def test_duplicate_spans_partition_invariant(spark):
    from momyre_spark.operators.textops import duplicate_spans

    docs = spark.createDataFrame(
        [(i, f"w{i % 3} w{(i + 1) % 3} w{(i + 2) % 3} tail{i} end{i}")
         for i in range(30)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, duplicate_spans(docs).collect()))
    b = sorted(map(tuple, duplicate_spans(docs.repartition(7)).collect()))
    assert a == b and len(a) > 0


def test_text_duplicate_spans_oracle_parity(spark):
    """Pre-validates the round-8 registration: run the (not yet
    registered) text_duplicate_spans query and its DuckDB oracle at
    sf0.001 with the driver-mirror compare."""
    import os

    import duckdb
    import pytest as _pytest

    from momyre_spark.plans.text_queries import (
        _DUP_SPANS_ORACLE,
        text_duplicate_spans,
    )
    from tests.oracle_compare import compare

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/documents.parquet"):
        _pytest.skip("sf0.001 testdata absent")
    sdf = text_duplicate_spans(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    ddf = con.execute(_DUP_SPANS_ORACLE).fetchdf()
    ok, msg = compare(sdf, ddf)
    assert ok and len(sdf) > 0, msg


def test_textrank_keywords_hub_word_wins(spark):
    from momyre_spark.operators.textops import textrank_keywords

    # "spark" is adjacent to many distinct words; each "leafN" only to
    # spark — the hub must outrank every leaf. Stopwords ("the") and
    # non-alphabetic tokens must never appear.
    leaf = "abcdefgh"
    docs = spark.createDataFrame(
        [(i, f"the spark leaf{leaf[i]} 42 spark extra{leaf[i]}")
         for i in range(8)],
        "doc_id long, text string",
    )
    rows = textrank_keywords(docs, top_k=5).collect()
    assert rows[0]["word"] == "spark"
    words = {r["word"] for r in rows}
    assert "the" not in words and "42" not in words
    leaf_ranks = [r["rank"] for r in rows if r["word"].startswith("leaf")]
    assert all(rows[0]["rank"] > lr for lr in leaf_ranks)


def test_textrank_keywords_partition_invariant(spark):
    from momyre_spark.operators.textops import textrank_keywords

    w = "abcdefg"
    docs = spark.createDataFrame(
        [(i, f"alpha w{w[i % 5]} beta w{w[(i + 2) % 7]} gamma")
         for i in range(40)],
        "doc_id long, text string",
    )
    a = [tuple(r) for r in textrank_keywords(docs, top_k=10).collect()]
    b = [tuple(r) for r in
         textrank_keywords(docs.repartition(9), top_k=10).collect()]
    assert a == b and len(a) == 10


def test_textrank_oracle_parity(spark):
    """Pre-validates the round-8 registration: run the (not yet
    registered) text_textrank_keywords query and its DuckDB oracle at
    sf0.001 with the driver-mirror compare."""
    import os

    import duckdb
    import pytest as _pytest

    from momyre_spark.plans.text_queries import (
        _textrank_oracle,
        text_textrank_keywords,
    )
    from tests.oracle_compare import compare

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/documents.parquet"):
        _pytest.skip("sf0.001 testdata absent")
    sdf = text_textrank_keywords(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    ddf = con.execute(_textrank_oracle()).fetchdf()
    ok, msg = compare(sdf, ddf)
    assert ok and len(sdf) > 0, msg


def test_remove_duplicate_spans_known(spark):
    from momyre_spark.operators.textops import remove_duplicate_spans

    docs = spark.createDataFrame(
        [
            # 5-token shared prefix (span >= 4 -> cut); unique tails stay
            (1, "a b c d e tailone tailtwo tailthree"),
            (2, "a b c d e othera otherb otherc"),
            # 3-token duplicated span is BELOW min_span_tokens=4 -> kept
            (3, "x y z uniqueone uniquetwo uniquethree"),
            (4, "x y z otherx othery otherz"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in remove_duplicate_spans(docs).collect()}
    assert got[1]["clean_text"] == "tailone tailtwo tailthree"
    assert got[1]["n_tokens"] == 8 and got[1]["n_removed_tokens"] == 5
    assert got[2]["clean_text"] == "othera otherb otherc"
    # short duplicated span survives the threshold
    assert got[3]["clean_text"].startswith("x y z")
    assert got[3]["n_removed_tokens"] == 0
    # empty doc survives visibly
    assert got[5]["clean_text"] == "" and got[5]["n_tokens"] == 0


def test_remove_duplicate_spans_partition_invariant(spark):
    from momyre_spark.operators.textops import remove_duplicate_spans

    docs = spark.createDataFrame(
        [(i, f"p q r s t u{i % 4} v{i % 7} w{i % 3}") for i in range(24)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, remove_duplicate_spans(docs).collect()))
    b = sorted(map(tuple,
                   remove_duplicate_spans(docs.repartition(5)).collect()))
    assert a == b and len(a) == 24


def test_text_remove_dup_spans_oracle_parity(spark):
    """Pre-validates the round-8 registration (driver-mirror compare)."""
    import os

    import duckdb
    import pytest as _pytest

    from momyre_spark.plans.text_queries import (
        _RM_SPANS_ORACLE,
        text_remove_dup_spans,
    )
    from tests.oracle_compare import compare

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/documents.parquet"):
        _pytest.skip("sf0.001 testdata absent")
    sdf = text_remove_dup_spans(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    ddf = con.execute(_RM_SPANS_ORACLE).fetchdf()
    ok, msg = compare(sdf, ddf)
    assert ok and len(sdf) > 0, msg


def test_zipf_fit_known_values(spark):
    import pytest as _pytest

    from momyre_spark.operators.textops import zipf_fit

    # two points: freq 4 at rank 1, freq 2 at rank 2 ->
    # slope = (ln2 - ln4)/(ln2 - ln1) = -1 exactly, r2 = 1
    docs = spark.createDataFrame(
        [(1, "aa aa aa aa bb bb")], "doc_id long, text string"
    )
    r = zipf_fit(docs, top_k=10).collect()[0]
    assert r["n_terms"] == 2
    assert r["slope"] == _pytest.approx(-1.0, abs=1e-5)
    assert r["r2"] == _pytest.approx(1.0, abs=1e-5)
    # a planted Zipfian head fits near slope -1 with high r2
    words = []
    for rank in range(1, 21):
        words += [f"w{chr(96 + rank)}"] * (1200 // rank)
    zdocs = spark.createDataFrame(
        [(i, " ".join(words[i::10])) for i in range(10)],
        "doc_id long, text string",
    )
    z = zipf_fit(zdocs, top_k=20).collect()[0]
    assert z["slope"] == _pytest.approx(-1.0, abs=0.05)
    assert z["r2"] > 0.99
    with _pytest.raises(ValueError):
        zipf_fit(docs, top_k=1)


def test_zipf_fit_partition_invariant(spark):
    from momyre_spark.operators.textops import zipf_fit

    docs = spark.createDataFrame(
        [(i, f"ca cb cc cd ce cf cg ch ci cj"[: 3 * (i % 9 + 2)])
         for i in range(50)],
        "doc_id long, text string",
    )
    a = [tuple(r) for r in zipf_fit(docs).collect()]
    b = [tuple(r) for r in zipf_fit(docs.repartition(7)).collect()]
    assert a == b and len(a) == 1


def test_text_zipf_fit_oracle_parity(spark):
    """Pre-validates the round-8 registration (driver-mirror compare)."""
    import os

    import duckdb
    import pytest as _pytest

    from momyre_spark.plans.text_queries import (
        _ZIPF_ORACLE,
        text_zipf_fit,
    )
    from tests.oracle_compare import compare

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/documents.parquet"):
        _pytest.skip("sf0.001 testdata absent")
    sdf = text_zipf_fit(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    ddf = con.execute(_ZIPF_ORACLE).fetchdf()
    ok, msg = compare(sdf, ddf)
    assert ok and len(sdf) > 0, msg


def _py_duplicate_spans(texts, n=3, min_occ=2):
    """Brute-force reference: corpus occurrence counts of token n-grams,
    per-doc maximal runs of duplicated positions."""
    toks = {d: t.split() for d, t in texts.items() if t.strip()}
    shingles = {}
    for d, ws in toks.items():
        for p in range(len(ws) - n + 1):
            s = " ".join(ws[p:p + n])
            shingles[s] = shingles.get(s, 0) + 1
    out = []
    for d, ws in toks.items():
        dup = [p for p in range(len(ws) - n + 1)
               if shingles[" ".join(ws[p:p + n])] >= min_occ]
        run = []
        for p in dup:
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    out.append((d, run[0], run[-1] + n - 1,
                                run[-1] + n - run[0], len(run)))
                run = [p]
        if run:
            out.append((d, run[0], run[-1] + n - 1,
                        run[-1] + n - run[0], len(run)))
    return sorted(out)


def test_duplicate_spans_matches_python_reference_hypothesis(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from momyre_spark.operators.textops import duplicate_spans

    word = st.sampled_from(["aa", "bb", "cc", "dd"])
    doc = st.lists(word, min_size=0, max_size=12).map(" ".join)

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(docs=st.lists(doc, min_size=1, max_size=8))
    def inner(docs):
        texts = {i: t for i, t in enumerate(docs)}
        df = spark.createDataFrame(
            list(texts.items()), "doc_id long, text string"
        )
        got = sorted(tuple(r) for r in duplicate_spans(df).collect())
        assert got == _py_duplicate_spans(texts)

    inner()


def test_readability_known_values(spark):
    from momyre_spark.operators.textops import readability_report

    df = spark.createDataFrame(
        [
            (1, "The cat sat. It ran!"),
            (2, "xyz brr tsk."),  # brr/tsk have no vowel run -> min 1
            (3, "too short"),     # < 3 words: dropped visibly
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in readability_report(df).collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (5, 2, 5)
    # 206.835 - 1.015*(5/2) - 84.6*(5/5) = 119.6975
    assert r1["flesch"] == 119.6975
    r2 = got[2]
    assert (r2["n_words"], r2["n_sentences"], r2["n_syllables"]) == (3, 1, 3)
    assert r2["flesch"] == 119.19


def test_heaps_fit_matches_python_reference_and_is_partition_invariant(spark):
    """heaps_fit must equal a from-scratch Python replication (md5 bucket,
    min-bucket first appearances, 1e-6 fixed-point ln OLS) and be invariant
    to the input partition layout."""
    import hashlib
    import math

    import pytest as _pytest

    from momyre_spark.operators.textops import heaps_fit

    rows = [(i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(5)))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    B = 8
    got = heaps_fit(df, n_buckets=B).collect()
    assert len(got) == 1

    # python reference
    buckets = {i: int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % B
               for i, _ in rows}
    nt = {b: 0 for b in range(B)}
    first = {}
    for i, text in rows:
        for tok in text.lower().split():
            nt[buckets[i]] += 1
            first[tok] = min(first.get(tok, B), buckets[i])
    nv = {b: 0 for b in range(B)}
    for tok, b in first.items():
        nv[b] += 1
    pts, cn, cv = [], 0, 0
    for b in range(B):
        cn, cv = cn + nt[b], cv + nv[b]
        if cn > 0 and cv > 0:
            pts.append((math.floor(math.log(cn) * 1e6 + 0.5),
                        math.floor(math.log(cv) * 1e6 + 0.5)))
    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts); syy = sum(y * y for _, y in pts)
    covn = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    beta = math.floor(covn / varx * 1e6 + 0.5) / 1e6
    k = math.floor(
        math.exp((sy - covn / varx * sx) / n / 1e6) * 1e6 + 0.5) / 1e6
    r2 = math.floor((covn * covn) / (varx * vary) * 1e6 + 0.5) / 1e6
    r = got[0]
    assert (r["n_points"], r["beta"], r["k_coeff"], r["r2"]) == (n, beta, k, r2)

    # partition invariance: bucketing/aggs are layout-free by construction
    again = heaps_fit(df.repartition(13), n_buckets=B).collect()[0]
    assert (again["beta"], again["k_coeff"], again["r2"]) == (
        r["beta"], r["k_coeff"], r["r2"])

    with _pytest.raises(ValueError):
        heaps_fit(df, n_buckets=1)


def test_vocab_richness_known_values(spark):
    """Hand-counted frequency-of-frequencies: chao1's bias-corrected
    form and Good-Turing unseen mass on a tiny corpus (counts: the=3,
    cat=2, dog=2, sat=ran=a=1 -> N=10 V=6 F1=3 F2=2)."""
    from momyre_spark.operators.textops import vocab_richness

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog THE dog ran"), (3, "a cat"),
         (4, "")],
        "doc_id long, text string",
    )
    [r] = vocab_richness(docs).collect()
    assert (r["n_tokens"], r["vocab_size"]) == (10, 6)
    assert (r["hapax_count"], r["dis_count"]) == (3, 2)
    assert r["chao1"] == 7.0  # 6 + 3*2 / (2*(2+1))
    assert r["gt_unseen_mass"] == 0.3  # F1/N
    # no-doubleton corpus stays defined (the +1 correction)
    docs2 = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    [r2] = vocab_richness(docs2).collect()
    assert r2["chao1"] == 3.0 + 3 * 2 / 2  # V + F1(F1-1)/(2*(0+1))


def test_term_burstiness_known_values(spark):
    """cf/df by hand; min_df prunes; top_k boundary ties break by term;
    plans as TakeOrderedAndProject (no vocabulary sort)."""
    from momyre_spark.operators.textops import term_burstiness

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog the dog ran"), (3, "a cat")],
        "doc_id long, text string",
    )
    got = {r["term"]: r for r in
           term_burstiness(docs, top_k=10, min_df=1).collect()}
    assert (got["the"]["cf"], got["the"]["df"]) == (3, 2)
    assert got["the"]["burstiness"] == 1.5
    assert (got["dog"]["cf"], got["dog"]["df"]) == (2, 1)
    assert got["dog"]["burstiness"] == 2.0
    only_multi = term_burstiness(docs, top_k=10, min_df=2)
    assert {r["term"] for r in only_multi.collect()} == {"the", "cat"}
    plan = only_multi._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
