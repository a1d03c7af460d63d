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


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """Hot-key diagnosis: the top-N heaviest values of a join/group key,
    each with its row count, share of the table, skew vs the mean key, and
    the salt factor that would level it — the number :func:`salted_join`
    takes, read from data instead of guessed. Run it BEFORE a big join
    ships: a key with skew 40 on a 1000-partition shuffle is one straggler
    task doing 40 keys' worth of work (or spilling).

    Cost: one key-keyed aggregation (map-side combine) + a 1-row total
    broadcast + a distributed TakeOrdered over the per-key counts (orderBy
    + limit, NOT an unpartitioned window — the per-key table's row count
    is the key's NDV, which can be billions; a global window would funnel
    it through one task). Output: ``(key, n, share, skew, suggested_salt)``
    ordered heaviest first. ``suggested_salt`` is ceil(skew) clamped at
    >= 1 — shards the hot key into ~mean-sized slices."""
    from momyre_spark.functions.numeric import round_half_up

    per_key = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = per_key.agg(
        F.sum("n").cast("bigint").alias("__total"),
        F.count(F.lit(1)).cast("bigint").alias("__nkeys"),
    )
    top = per_key.orderBy(F.col("n").desc(), "key").limit(top_n)
    skew = (
        F.col("n").cast("double")
        * F.col("__nkeys").cast("double")
        / F.col("__total").cast("double")
    )
    return (
        top.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "n",
            round_half_up(
                F.col("n").cast("double") / F.col("__total").cast("double"), 6
            ).alias("share"),
            round_half_up(skew, 4).alias("skew"),
            F.greatest(F.ceil(skew), F.lit(1)).cast("bigint").alias(
                "suggested_salt"
            ),
        )
        .orderBy(F.col("n").desc(), "key")
    )
