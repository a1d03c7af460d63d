"""Mergeable HLL distinct-count sketches (operators/sketches.py).

No SQL oracle exists (sketch bytes are engine-specific), so correctness is
pinned here: estimate-vs-exact tolerance and the merge law.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from momyre_spark.operators.sketches import (
    estimate_ndv,
    merge_ndv_sketches,
    ndv_sketch_table,
)


def _events(spark, n=20_000, groups=4):
    return spark.createDataFrame(
        [Row(g=f"g{i % groups}", uid=i % (997 * (1 + i % groups))) for i in range(n)]
    )


def test_estimate_within_tolerance(spark):
    df = _events(spark)
    est = {
        r["g"]: r["ndv_estimate"]
        for r in estimate_ndv(ndv_sketch_table(df, ["g"], "uid")).collect()
    }
    exact = {
        r["g"]: r["x"]
        for r in df.groupBy("g").agg(F.countDistinct("uid").alias("x")).collect()
    }
    for g in exact:
        assert abs(est[g] - exact[g]) / exact[g] < 0.05, (g, est[g], exact[g])


def test_merge_law_union_of_batches_equals_whole(spark):
    """Sketch state must be mergeable: per-batch sketches unioned estimate
    the same set as one sketch over the whole frame.

    NOT asserted bit-equal: Spark's HLL functions are Apache DataSketches
    HLL, whose union runs through an HLL_8 "gadget" — the merged sketch is
    a valid sketch OF THE SAME SET but not guaranteed byte-identical to
    the directly-built one, so estimates can differ within sketch error
    (observed ~1.3% at lgK=12 on this Spark build; earlier builds happened
    to agree exactly on this data). The merge LAW pinned here is that the
    union estimate stays within HLL tolerance of the whole-frame estimate,
    which itself is within tolerance of exact (test above)."""
    df = _events(spark, n=10_000)
    whole = {
        r["g"]: r["ndv_estimate"]
        for r in estimate_ndv(ndv_sketch_table(df, ["g"], "uid")).collect()
    }
    b1 = ndv_sketch_table(df.filter(F.col("uid") % 2 == 0), ["g"], "uid")
    b2 = ndv_sketch_table(df.filter(F.col("uid") % 2 == 1), ["g"], "uid")
    merged = {
        r["g"]: r["ndv_estimate"]
        for r in estimate_ndv(
            merge_ndv_sketches(b1.unionByName(b2), ["g"])
        ).collect()
    }
    assert set(merged) == set(whole)
    for g in whole:
        # 3x the lgK=12 relative standard error (1.04/sqrt(4096) ~ 1.6%)
        assert abs(merged[g] - whole[g]) / whole[g] < 0.05, (
            g, merged[g], whole[g],
        )


def test_rollup_merge_to_coarser_grouping(spark):
    """Fine-grained sketches roll up to the global NDV without rescanning."""
    df = _events(spark, n=8_000)
    fine = ndv_sketch_table(df, ["g"], "uid")
    (row,) = estimate_ndv(
        merge_ndv_sketches(fine.withColumn("all", F.lit(1)), ["all"])
    ).collect()
    exact = df.select(F.countDistinct("uid")).first()[0]
    assert abs(row["ndv_estimate"] - exact) / exact < 0.05


def test_hourly_to_daily_rollup_matches_direct_daily(spark):
    """Merging hourly sketches must equal sketching the day directly —
    the maintained-rollup contract on the time axis."""
    import datetime as dt

    from pyspark.sql import functions as F

    rows = [
        Row(
            ts=dt.datetime(2024, 1, 1 + (i % 3), (i * 7) % 24, 0, 0),
            user_id=i % 311,
        )
        for i in range(5000)
    ]
    ev = spark.createDataFrame(rows).select(
        F.date_trunc("hour", "ts").cast("date").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        "user_id",
    )
    hourly = ndv_sketch_table(ev, ["day", "hour"], "user_id")
    rolled = {
        str(r["day"]): r["ndv_estimate"]
        for r in estimate_ndv(
            merge_ndv_sketches(hourly.drop("hour"), ["day"])
        ).collect()
    }
    direct = {
        str(r["day"]): r["ndv_estimate"]
        for r in estimate_ndv(ndv_sketch_table(ev, ["day"], "user_id")).collect()
    }
    assert rolled == direct


def test_sketch_overlap_matrix_estimates_planted_overlap(spark):
    """Two sources share exactly 300 fingerprints (of 1000 each), a third
    shares none: the estimate lands within HLL tolerance of truth, with no
    join of the underlying data."""
    from momyre_spark.operators.sketches import sketch_overlap_matrix

    rows = (
        [("A", f"shared{i}") for i in range(300)]
        + [("A", f"onlyA{i}") for i in range(700)]
        + [("B", f"shared{i}") for i in range(300)]
        + [("B", f"onlyB{i}") for i in range(700)]
        + [("C", f"onlyC{i}") for i in range(500)]
    )
    df = spark.createDataFrame(rows, "source string, fp string")
    got = {
        (r["group_a"], r["group_b"]): r
        for r in sketch_overlap_matrix(df, "source", "fp").collect()
    }
    ab = got[("A", "B")]
    # three chained estimates at lgK=14: ~2% rsd each; assert within 10%
    assert abs(ab["overlap_estimate"] - 300) <= 100, ab
    assert abs(ab["ndv_a"] - 1000) <= 50
    # disjoint pairs estimate near zero (clamped at 0)
    assert got[("A", "C")]["overlap_estimate"] <= 60
    assert got[("B", "C")]["overlap_estimate"] <= 60


# ---------------------------------------------------------------------------
# Geometric-histogram quantile state
# ---------------------------------------------------------------------------
def _vals(spark, n=5000, groups=3):
    # deterministic positive heavy-tailed-ish values in [0.01, ~500)
    rows = [
        Row(g=f"g{i % groups}", v=0.01 + ((i * 2654435761) % 49_000) / 100.0)
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def test_histogram_quantile_merge_law_and_error_bound(spark):
    from momyre_spark.operators.sketches import (
        geometric_boundaries,
        merge_value_histograms,
        quantiles_from_histogram,
        value_histogram,
    )

    bl = geometric_boundaries(-2, 3, 32)
    df = _vals(spark)
    whole = value_histogram(df, ["g"], "v", bl)
    # merge law: union of two batch states == single-pass state, exactly
    h0 = value_histogram(df.filter("v < 100"), ["g"], "v", bl)
    h1 = value_histogram(df.filter("v >= 100"), ["g"], "v", bl)
    merged = merge_value_histograms(h0.unionByName(h1), ["g"])
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )
    # state is bounded: at most |bins|+1 rows per group
    assert whole.count() <= 3 * (len(bl) + 1)

    # error bound: the estimate is an upper edge — at least the exact
    # quantile and at most one bin ratio above it
    est = {
        (r["g"], r["q"]): r
        for r in quantiles_from_histogram(merged, ["g"], bl).collect()
    }
    pdf = df.toPandas()
    ratio = 10 ** (1 / 32)
    import math
    for (g, q), r in est.items():
        grp = sorted(pdf[pdf["g"] == g]["v"])
        exact = grp[math.ceil(q * len(grp)) - 1]
        assert r["n_total"] == len(grp)
        assert r["est"] is not None
        assert exact <= r["est"] <= exact * ratio + 1e-9, (g, q, exact, r["est"])


def test_histogram_quantile_overflow_is_null_not_wrong(spark):
    from momyre_spark.operators.sketches import (
        geometric_boundaries,
        quantiles_from_histogram,
        value_histogram,
    )

    # grid tops out at 10^1; values above it land in the overflow bin and
    # any quantile that resolves there reads NULL, not a fabricated number
    bl = geometric_boundaries(-1, 1, 8)
    df = spark.createDataFrame([Row(g="a", v=float(x)) for x in (1, 2, 3, 500, 900)])
    out = {
        r["q"]: r for r in quantiles_from_histogram(
            value_histogram(df, ["g"], "v", bl), ["g"], bl
        ).collect()
    }
    assert out[0.5]["est"] is not None       # median 3 is on-grid
    assert out[0.99]["est"] is None          # p99 is off-grid -> NULL
    # values below the first edge land in bin 0 and read the first edge
    low = spark.createDataFrame([Row(g="a", v=0.0001)])
    lo = quantiles_from_histogram(
        value_histogram(low, ["g"], "v", bl), ["g"], bl, qs=(0.5,)
    ).collect()[0]
    assert abs(lo["est"] - 0.1) < 1e-9


def test_quantile_gate_drops_tail_keeps_on_null_threshold(spark):
    from momyre_spark.operators.curate import quantile_gate
    from momyre_spark.operators.sketches import geometric_boundaries

    bl = geometric_boundaries(-1, 2, 16)
    # group a: 99 values ~1, one huge outlier; p90 gate must drop the
    # outlier and keep the bulk (upper-edge semantics keep the p90 bin)
    rows = [Row(g="a", v=1.0 + (i % 7) / 100) for i in range(99)]
    rows.append(Row(g="a", v=95.0))
    df = spark.createDataFrame(rows)
    kept = quantile_gate(df, ["g"], "v", bl, q=0.9)
    vals = [r["v"] for r in kept.collect()]
    assert 95.0 not in vals and len(vals) == 99

    # values beyond the grid -> NULL threshold -> nothing dropped
    wild = spark.createDataFrame([Row(g="b", v=1e6) for _ in range(10)])
    assert quantile_gate(wild, ["g"], "v", bl, q=0.5).count() == 10

    # production shape: a PRE-maintained state gates a new batch without
    # rescanning anything
    from momyre_spark.operators.sketches import value_histogram

    state = value_histogram(df, ["g"], "v", bl)
    batch = spark.createDataFrame([Row(g="a", v=1.02), Row(g="a", v=50.0)])
    out = quantile_gate(batch, ["g"], "v", bl, q=0.9, state=state).collect()
    assert [r["v"] for r in out] == [1.02]


def test_histogram_excludes_nulls_from_distribution(spark):
    from momyre_spark.operators.sketches import (
        geometric_boundaries,
        quantiles_from_histogram,
        value_histogram,
    )

    bl = geometric_boundaries(-1, 1, 8)
    df = spark.createDataFrame(
        [Row(g="a", v=1.0), Row(g="a", v=2.0), Row(g="a", v=None),
         Row(g="a", v=None)],
        "g string, v double",
    )
    state = value_histogram(df, ["g"], "v", bl)
    # NULLs excluded: n_total is 2, not 4 (and they never read as the
    # smallest values — a NULL comparison would descend to bin 0)
    out = quantiles_from_histogram(state, ["g"], bl, qs=(0.5,)).collect()[0]
    assert out["n_total"] == 2
    assert out["est"] >= 1.0


def test_quantile_gate_keeps_null_values(spark):
    from momyre_spark.operators.curate import quantile_gate
    from momyre_spark.operators.sketches import geometric_boundaries

    bl = geometric_boundaries(-1, 2, 16)
    df = spark.createDataFrame(
        [Row(g="a", v=float(x)) for x in range(1, 11)]
        + [Row(g="a", v=None)],
        "g string, v double",
    )
    out = quantile_gate(df, ["g"], "v", bl, q=0.5).collect()
    # the NULL row survives: the gate never measured it, so it cannot
    # have exceeded the threshold
    assert any(r["v"] is None for r in out)


def test_histogram_decimal_overflow_routes_to_overflow_bin(spark):
    """ADVICE r05: values whose DECIMAL(18,6) cast overflows (>= ~1e12)
    must land in the OVERFLOW bin, not silently count as the smallest
    value (a NULL decimal makes every WHEN comparison false, descending
    to bin 0). NaN is excluded like NULL; negative overflow is below the
    grid, i.e. bin 0."""
    from momyre_spark.operators.sketches import (
        geometric_boundaries,
        quantiles_from_histogram,
        value_histogram,
    )

    bl = geometric_boundaries(-1, 1, 8)
    df = spark.createDataFrame(
        [
            Row(g="a", v=1.0),
            Row(g="a", v=2.0),
            Row(g="a", v=1e13),        # decimal overflow -> overflow bin
            Row(g="a", v=float("nan")),  # excluded entirely
            Row(g="a", v=-1e13),       # negative overflow -> bin 0
        ],
        "g string, v double",
    )
    state = {r["bin"]: r["n"] for r in
             value_histogram(df, ["g"], "v", bl).collect()}
    assert state.get(len(bl)) == 1          # 1e13 in the unbounded bin
    assert state.get(0) == 1                # -1e13 below the grid
    assert sum(state.values()) == 4         # NaN never counted
    # and the quantile that resolves in the overflow bin reads NULL
    out = {r["q"]: r for r in quantiles_from_histogram(
        value_histogram(df, ["g"], "v", bl), ["g"], bl, qs=(0.99,)
    ).collect()}
    assert out[0.99]["est"] is None
