"""Embedding transform tests: normalization, quantization round-trip error."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from momyre_spark.functions.embeddings import dequantize_int8, l2_normalize, quantize_int8
from momyre_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def test_l2_normalize_unit_norm(spark):
    df = spark.createDataFrame([Row(v=[3.0, 4.0]), Row(v=[0.5, 0.5, 0.5, 0.5])])
    out = df.select(l2_normalize(F.col("v")).alias("n")).collect()
    for r in out:
        assert abs(math.sqrt(sum(x * x for x in r["n"])) - 1.0) < 1e-12
    assert out[0]["n"] == [0.6, 0.8]


def test_quantize_roundtrip_error_bounded(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings").limit(100)
    q = emb.select("vec_id", "embedding", quantize_int8(F.col("embedding")).alias("qz"))
    back = q.select(
        "vec_id", "embedding", dequantize_int8(F.col("qz")).alias("deq"),
        F.col("qz.scale").alias("scale"),
    ).collect()
    for r in back:
        scale = r["scale"]
        assert scale > 0
        for orig, deq in zip(r["embedding"], r["deq"]):
            # symmetric quantization error bound: half a quantization step
            assert abs(float(orig) - deq) <= scale / 2 + 1e-9


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame([Row(v=[0.0, 0.0, 0.0])])
    r = df.select(quantize_int8(F.col("v")).alias("qz")).collect()[0]["qz"]
    assert r["scale"] == 0.0 and list(r["q"]) == [0, 0, 0]
