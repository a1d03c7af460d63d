"""As-of join operator unit tests (vs a Python reference)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from momyre_spark.operators.asof import asof_join


def _t(s):
    return f"2024-01-01 {s}"


def test_asof_basic_semantics(spark):
    left = spark.createDataFrame([
        Row(k=1, ts=_t("10:00:00"), lv="L1"),
        Row(k=1, ts=_t("12:00:00"), lv="L2"),
        Row(k=2, ts=_t("10:30:00"), lv="L3"),
        Row(k=3, ts=_t("09:00:00"), lv="L4"),   # no right rows for k=3
    ]).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame([
        Row(k=1, ts=_t("09:00:00"), rv="R-early"),
        Row(k=1, ts=_t("11:00:00"), rv="R-mid"),
        Row(k=1, ts=_t("13:00:00"), rv="R-late"),
        Row(k=2, ts=_t("10:30:00"), rv="R-exact"),  # ties: at-or-before matches
    ]).withColumn("ts", F.col("ts").cast("timestamp"))

    out = {r["lv"]: r["rv_r"] for r in
           asof_join(left, right, on="k", right_cols=["rv"], suffix="_r").collect()}
    assert out == {
        "L1": "R-early",   # 10:00 -> latest right <= is 09:00
        "L2": "R-mid",     # 12:00 -> 11:00 (13:00 is in the future)
        "L3": "R-exact",   # exact-timestamp right row matches (inclusive)
        "L4": None,        # no right row at or before
    }


def test_asof_join_matches_python_reference(spark):
    import random

    rng = random.Random(11)
    left_rows = [Row(k=rng.randrange(5), ts=rng.randrange(1000), lid=i)
                 for i in range(200)]
    right_rows = [Row(k=rng.randrange(5), ts=rng.randrange(1000), rid=i)
                  for i in range(200)]
    # unique (k, ts) on the right so the match is well-defined
    seen = set()
    right_rows = [r for r in right_rows
                  if (r.k, r.ts) not in seen and not seen.add((r.k, r.ts))]

    left = spark.createDataFrame(left_rows)
    right = spark.createDataFrame(right_rows)
    got = {r["lid"]: r["rid_r"] for r in
           asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                     right_cols=["rid"], suffix="_r").collect()}

    by_key: dict[int, list] = {}
    for r in right_rows:
        by_key.setdefault(r.k, []).append((r.ts, r.rid))
    for rows in by_key.values():
        rows.sort()
    want = {}
    for r in left_rows:
        cand = [(t, rid) for t, rid in by_key.get(r.k, []) if t <= r.ts]
        want[r.lid] = cand[-1][1] if cand else None
    assert got == want


def test_asof_null_right_payload_not_backfilled(spark):
    """A NULL payload value in the MATCHED right row must stay NULL — not be
    backfilled from an older right row (regression: per-column carries would
    combine columns from different right rows into a row that never existed).
    """
    left = spark.createDataFrame([Row(k=1, ts=10, lid="L")])
    right = spark.createDataFrame(
        [
            Row(k=1, ts=1, a="old-a", b="old-b"),
            Row(k=1, ts=5, a=None, b="new-b"),  # matched row: a IS NULL
        ]
    )
    row = asof_join(
        left, right, on="k", right_cols=["a", "b"], suffix="_r"
    ).collect()[0]
    assert row["b_r"] == "new-b"
    assert row["a_r"] is None  # NOT "old-a"


def test_asof_tolerance_nulls_stale_matches(spark):
    """tolerance: a match older than the bound becomes NO match; the
    matched right ts need not be in right_cols for the check to work."""
    from pyspark.sql import Row

    from momyre_spark.operators.asof import asof_join

    left = spark.createDataFrame([
        Row(k="a", ts=100.0, lid=1),   # click at 95 -> fresh (lag 5)
        Row(k="a", ts=200.0, lid=2),   # latest click 95 -> stale (lag 105)
        Row(k="b", ts=50.0, lid=3),    # no click at all
    ])
    right = spark.createDataFrame([
        Row(k="a", ts=95.0, payload="x"),
    ])
    out = {r["lid"]: r["payload_right"]
           for r in asof_join(left, right, on="k",
                              right_cols=["payload"],
                              tolerance=10.0).collect()}
    assert out == {1: "x", 2: None, 3: None}
    # without tolerance the stale match is kept
    out2 = {r["lid"]: r["payload_right"]
            for r in asof_join(left, right, on="k",
                               right_cols=["payload"]).collect()}
    assert out2 == {1: "x", 2: "x", 3: None}
