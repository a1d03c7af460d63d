"""Embedding-column transforms: normalization and int8 quantization.

Storage math at 100 TB: a float32 64-dim embedding is 256 bytes/row; int8
symmetric quantization cuts it to 64 bytes + one float scale — 4x smaller
scans for ANN candidate generation, with the full-precision rerank reading
only the surviving candidates. All JVM-side higher-order functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from momyre_spark.functions.vectors import norm, to_double


def l2_normalize(vec: Column) -> Column:
    """Unit-norm the vector (cosine becomes a plain dot product downstream)."""
    n = norm(vec)
    return F.transform(to_double(vec), lambda x: x / n)


def quantize_int8(vec: Column) -> Column:
    """Symmetric int8 quantization: returns struct(scale double, q array<tinyint>).

    ``q[i] = round(v[i] * 127 / max_abs)``; dequantize as ``q[i] * scale``
    with ``scale = max_abs / 127``. Zero vectors quantize to all-zero with
    scale 0."""
    v = to_double(vec)
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    safe = F.when(max_abs == 0.0, F.lit(1.0)).otherwise(max_abs)
    q = F.transform(v, lambda x: F.round(x * 127.0 / safe).cast("tinyint"))
    return F.struct((max_abs / 127.0).alias("scale"), q.alias("q"))


def dequantize_int8(quant: Column) -> Column:
    return F.transform(
        quant["q"], lambda x: x.cast("double") * quant["scale"]
    )
