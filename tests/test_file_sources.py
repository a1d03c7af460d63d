"""CSV / JSON-lines sources: declared-schema reads, enforce_schema parity
with the parquet path, and corrupt-record fail-stop."""

from __future__ import annotations

import pytest

from momyre_spark.sources.files import infer_schema_sample, load_csv, load_jsonl
from momyre_spark.spec import TableSpec

USERS = TableSpec(
    name="users",
    columns={"name": "varchar(64)", "age": "bigint", "score": "double"},
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_roundtrip_with_declared_schema(spark, tmp_path):
    p = str(tmp_path / "users.csv")
    with open(p, "w") as f:
        f.write("_id,name,age,score\n1,ann,33,1.5\n2,bob,44,2.5\n")
    got = load_csv(spark, p, USERS)
    assert got.columns == ["_id", "name", "age", "score"]
    assert _rows(got) == [("1", "ann", 33, 1.5), ("2", "bob", 44, 2.5)]


def test_jsonl_ignores_undeclared_fields_and_nulls_missing(spark, tmp_path):
    p = str(tmp_path / "users.jsonl")
    with open(p, "w") as f:
        f.write('{"_id": "1", "name": "ann", "age": 33, "extra": "zzz"}\n')
        f.write('{"_id": "2", "score": 9.0}\n')
    got = load_jsonl(spark, p, USERS)
    assert got.columns == ["_id", "name", "age", "score"]
    assert _rows(got) == [("1", "ann", 33, None), ("2", None, None, 9.0)]


def test_jsonl_corrupt_record_fails_stop(spark, tmp_path):
    p = str(tmp_path / "bad.jsonl")
    with open(p, "w") as f:
        f.write('{"_id": "1", "name": "ok"}\n')
        f.write("{not json at all\n")
    with pytest.raises(Exception, match="momyre: corrupt input record"):
        load_jsonl(spark, p, USERS).collect()


def test_jsonl_corrupt_record_tolerated_when_opted_out(spark, tmp_path):
    p = str(tmp_path / "bad.jsonl")
    with open(p, "w") as f:
        f.write('{"_id": "1", "name": "ok"}\n')
        f.write("{not json at all\n")
    got = load_jsonl(spark, p, USERS, fail_on_corrupt=False)
    # the corrupt line survives as an all-NULL row (PERMISSIVE) — visible,
    # not silently dropped
    assert got.count() == 2


def test_csv_type_mismatch_fails_stop(spark, tmp_path):
    p = str(tmp_path / "bad.csv")
    with open(p, "w") as f:
        f.write("_id,name,age,score\n1,ann,NOT_A_NUMBER,1.5\n")
    with pytest.raises(Exception, match="momyre: corrupt input record"):
        load_csv(spark, p, USERS).collect()


def test_infer_schema_sample_is_bounded(spark, tmp_path):
    for i in range(3):
        with open(tmp_path / f"part-{i}.jsonl", "w") as f:
            f.write('{"a": 1, "b": "x"}\n')
    schema = infer_schema_sample(spark, str(tmp_path), fmt="jsonl")
    assert set(schema.fieldNames()) == {"a", "b"}


def test_orc_roundtrip_and_schema_enforcement(spark, tmp_path):
    from momyre_spark.sources.files import load_orc, write_orc

    p = str(tmp_path / "users_orc")
    src = spark.createDataFrame(
        [("1", "ann", 33, 1.5, "zzz"), ("2", "bob", 44, 2.5, "yyy")],
        "_id string, name string, age int, score double, extra string",
    )
    write_orc(src, p)
    got = load_orc(spark, p, USERS)
    # undeclared column dropped, declared order enforced
    assert got.columns == ["_id", "name", "age", "score"]
    assert _rows(got) == [("1", "ann", 33, 1.5), ("2", "bob", 44, 2.5)]


def test_orc_pushdown_reaches_scan(spark, tmp_path):
    from momyre_spark.sources.files import load_orc, write_orc

    p = str(tmp_path / "users_orc")
    write_orc(
        spark.createDataFrame(
            [(str(i), f"u{i}", i, float(i)) for i in range(100)],
            "_id string, name string, age int, score double",
        ),
        p,
    )
    df = load_orc(spark, p, USERS).filter("age > 90").select("_id", "age")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "age" in plan.split("PushedFilters")[1][:80]
