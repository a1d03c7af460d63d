"""Spec compiler tests (reference P1-P3, momyre.yml semantics)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from momyre_spark.spec import (
    TableSpec,
    col4sql,
    enforce_schema,
    flatten,
    mysql_to_spark_type,
    parse_spec,
)

# mirrors /root/reference/momyre.yml:3-15
SPEC_YAML = """
tables:
  infos:
    index: bigint(20)
    cfg.pub: varchar(100)
    srv: tinyint(1)
  users:
    type: varchar(100)
    email: varchar(100)
    pubkey: varchar(100)
  emails:
    from: varchar(100)
    rcpts: blob
    subj: varchar(100)
"""


def test_parse_spec_tables_and_types():
    spec = parse_spec(SPEC_YAML)
    assert set(spec.tables) == {"infos", "users", "emails"}
    infos = spec.tables["infos"]
    # _id implicit + declared order preserved, dotted name flattened
    assert list(infos.sql_columns) == ["_id", "index", "cfg_pub", "srv"]
    assert infos.sql_columns["index"] == "bigint"
    assert infos.sql_columns["cfg_pub"] == "string"
    assert infos.sql_columns["srv"] == "boolean"  # tinyint(1) => bool
    assert spec.tables["emails"].sql_columns["rcpts"] == "string"  # blob => JSON text


def test_id_in_config_ignored():
    spec = parse_spec("tables:\n  t:\n    _id: varchar(24)\n    a: bigint\n")
    assert list(spec.tables["t"].sql_columns) == ["_id", "a"]


def test_type_mapping():
    assert mysql_to_spark_type("bigint(20)") == "bigint"
    assert mysql_to_spark_type("tinyint(1)") == "boolean"
    assert mysql_to_spark_type("tinyint(4)") == "tinyint"
    assert mysql_to_spark_type("decimal(10,2)") == "decimal(10,2)"
    assert mysql_to_spark_type("datetime") == "timestamp"
    assert col4sql("cfg.pub") == "cfg_pub"


def test_flatten_nested_structs(spark):
    df = spark.createDataFrame(
        [Row(_id="a", cfg=Row(pub="x", deep=Row(v=1)), srv=True)]
    )
    out = flatten(df)
    assert set(out.columns) == {"_id", "cfg_pub", "cfg_deep_v", "srv"}
    row = out.collect()[0]
    assert row["cfg_pub"] == "x" and row["cfg_deep_v"] == 1


def test_enforce_schema_drops_extra_nulls_missing_serializes_arrays(spark):
    spec = parse_spec(SPEC_YAML)
    df = spark.createDataFrame(
        [
            Row(
                _id="aa", **{"from": "x@y"}, rcpts=["a@b", "c@d"], subj="s",
                extra_field="DROP ME",
            ),
            Row(_id="bb", **{"from": None}, rcpts=None, subj=None, extra_field="z"),
        ]
    )
    out = enforce_schema(df, spec.tables["emails"])
    assert out.columns == ["_id", "from", "rcpts", "subj"]  # extra dropped, order kept
    rows = {r["_id"]: r for r in out.collect()}
    assert rows["aa"]["rcpts"] == '["a@b","c@d"]'  # array -> JSON (mysql.go:402-405)
    assert rows["bb"]["rcpts"] is None and rows["bb"]["subj"] is None


def test_enforce_schema_missing_column_becomes_null(spark):
    spec = parse_spec(SPEC_YAML)
    df = spark.createDataFrame([Row(_id="aa", type="admin")])  # email/pubkey absent
    out = enforce_schema(df, spec.tables["users"])
    row = out.collect()[0]
    assert row["email"] is None and row["pubkey"] is None and row["type"] == "admin"


def test_enforce_schema_flattens_nested(spark):
    spec = parse_spec(SPEC_YAML)
    df = spark.createDataFrame(
        [
            Row(_id="aa", index=1, cfg=Row(pub="k1"), srv=True),
            Row(_id="bb", index=2, cfg=None, srv=False),  # missing cfg -> NULL
        ]
    )
    out = enforce_schema(df, spec.tables["infos"])
    rows = {r["_id"]: r for r in out.collect()}
    assert rows["aa"]["cfg_pub"] == "k1"
    assert rows["bb"]["cfg_pub"] is None
    assert out.schema["srv"].dataType.typeName() == "boolean"


def test_defaults_applied(spark):
    spec = parse_spec(
        "tables:\n  t:\n    a: varchar(10)\n    defaults:\n      a: zz\n"
    )
    df = spark.createDataFrame([Row(_id="x", a=None), Row(_id="y", a="set")])
    out = enforce_schema(df, spec.tables["t"])
    rows = {r["_id"]: r for r in out.collect()}
    assert rows["x"]["a"] == "zz" and rows["y"]["a"] == "set"


def test_flatten_collision_raises(spark):
    df = spark.createDataFrame([Row(a_b=1, a=Row(b=2))])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collision.*a_b"):
        flatten(df)
