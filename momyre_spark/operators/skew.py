"""Skew-mitigation joins: salting for hot keys.

AQE's skew-join splitting (on by default in the engine session) handles most
cases at runtime; explicit salting is for the pathological ones AQE can't
split — e.g. a single key holding >1 executor's worth of rows on the build
side of an aggregation join, or pre-AQE Spark.

``salted_join``: the skewed (large) side gets a random salt 0..S-1 appended
to its key; the small side is replicated S times, once per salt value. Every
(key, salt) shard then lands in its own partition — a hot key fans out over
S partitions instead of melting one.

Replication multiplies the small side by S — use only when the small side is
dimension-sized (same regime where broadcasting is on the table but the big
side's hot-key partition would still spill).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salts: int = 16,
) -> DataFrame:
    """Equi-join equivalent to ``large.join(small, on, how)`` with the large
    side's hot keys spread over ``salts`` partitions.

    Supported ``how``: inner / left (the semantics where row multiplicity is
    defined by the large side)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_l = large.withColumn(
        "__salt", (F.rand(seed=42) * salts).cast("int")
    )
    salt_values = F.explode(
        F.sequence(F.lit(0), F.lit(salts - 1))
    ).alias("__salt")
    salted_s = small.select("*", salt_values)
    out = salted_l.join(salted_s, [on, "__salt"], how)
    return out.drop("__salt")
