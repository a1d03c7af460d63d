

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
