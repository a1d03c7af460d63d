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


def test_binary_sign_bits_and_code(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from momyre_spark.functions.embeddings import (
        binary_sign_bits,
        binary_sign_code,
    )

    vec = [1.0, -2.0, 0.0, 0.5] + [-1.0] * 60
    df = spark.createDataFrame([Row(v=vec)])
    bits = df.select(binary_sign_bits(F.col("v")).alias("b")).collect()[0]["b"]
    assert bits == "1001" + "0" * 60
    assert len(bits) == 64
    # conv reads the first 63 chars most-significant-first
    code = df.select(binary_sign_code(F.col("v")).alias("c")).collect()[0]["c"]
    assert code == int(("1001" + "0" * 60)[:63], 2)
    assert code >= 0  # 63 bits always fits a signed long


def test_binary_shortlist_recall_improves_with_k(spark):
    """1-bit hamming as a SHORTLIST: on the fixture corpus the shortlist's
    recall of the exact cosine top-10 grows with shortlist size and far
    exceeds the random baseline (K/N). Measured on the pinned fixture:
    ~0.51 @30, ~0.60 @50, ~0.84 @100."""
    from collections import defaultdict

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import momyre_spark.plans as plans
    from momyre_spark.functions.embeddings import binary_sign_code
    from momyre_spark.sources.parquet import load_table
    from tests.conftest import SF_CORRECT

    plans.load_all()
    exact = plans.QUERIES["sim_topk_bruteforce"](spark, SF_CORRECT).collect()
    ex = defaultdict(set)
    for r in exact:
        ex[r["query_id"]].add(r["neighbor_id"])

    emb = load_table(spark, SF_CORRECT, "embeddings")
    codes = emb.select(
        "vec_id", binary_sign_code(F.col("embedding")).alias("code")
    )
    q = codes.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("code").alias("qc")
    )
    scored = (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.bit_count(F.col("code").bitwiseXOR(F.col("qc"))).alias("h"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("h", "neighbor_id")

    def recall_at(k):
        top = scored.withColumn("r", F.row_number().over(w)).filter(
            F.col("r") <= k
        ).collect()
        bi = defaultdict(set)
        for r in top:
            bi[r["query_id"]].add(r["neighbor_id"])
        rec = [len(ex[qq] & bi[qq]) / len(ex[qq]) for qq in ex]
        return sum(rec) / len(rec)

    r30, r100 = recall_at(30), recall_at(100)
    assert r30 >= 0.4            # random baseline would be ~0.06
    assert r100 >= 0.7
    assert r100 > r30
