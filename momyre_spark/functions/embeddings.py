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


def projection_matrix(
    in_dim: int, out_dim: int, seed: int = 7, scale: int = 10_000
) -> list[list[float]]:
    """Deterministic dense random-projection matrix (out_dim x in_dim).

    Johnson–Lindenstrauss style Gaussian projection, quantized to 4 decimal
    places so the exact same literals can be embedded in an oracle SQL
    string — the Spark plan and the oracle then multiply identical numbers
    and agree bit-for-bit at double precision."""
    import numpy as np

    rng = np.random.default_rng(seed)
    m = rng.standard_normal((out_dim, in_dim)) / np.sqrt(out_dim)
    return (np.round(m * scale) / scale).tolist()


def project(vec: Column, matrix: list[list[float]]) -> Column:
    """Dense matrix-vector product as a JVM-side expression: array<double>.

    One fold per output dimension (``aggregate(zip_with(v, row, *), +)``) —
    stays inside whole-stage codegen, no UDF, no shuffle; at 100 TB this is
    a map-only stage fused into the scan."""
    v = to_double(vec)
    outs = []
    for row in matrix:
        lit_row = F.array(*[F.lit(float(x)) for x in row])
        prod = F.zip_with(v, lit_row, lambda x, y: x * y)
        outs.append(
            F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)
        )
    return F.array(*outs)


def binary_sign_bits(vec: Column) -> Column:
    """1-bit (sign) quantization as a '0'/'1' character string, one char per
    dimension — 32x smaller than float32, and hamming distance over the
    codes approximates angular distance (the classic binary-embedding
    trade). The string form is engine-neutral (a DuckDB oracle reproduces
    it with the same CASE-per-dimension transform); pack with
    ``binary_sign_code`` for the 8-byte compute form."""
    return F.array_join(
        F.transform(vec, lambda x: F.when(x > 0, F.lit("1")).otherwise(F.lit("0"))),
        "",
    )


def binary_sign_code(vec: Column, bits: int = 63) -> Column:
    """Sign mask of the first ``bits`` dimensions packed into ONE long
    (63 bits keeps the value non-negative in a signed long). Built from
    the bit string via ``conv(_, 2, 10)`` — bit 0 of the code is the LAST
    of the ``bits`` dimensions (conv reads left-to-right as
    most-significant-first). XOR + bit_count over these codes is the whole
    distance computation: 63 dims per cycle instead of per element.

    ``bits`` is capped at 63: a 64-bit pack whose top bit is set exceeds
    Long.MAX on the conv->cast path and would silently become NULL."""
    if not 1 <= bits <= 63:
        raise ValueError(f"bits must be in [1, 63], got {bits}")
    s = F.substring(binary_sign_bits(vec), 1, bits)
    return F.conv(s, 2, 10).cast("long")
