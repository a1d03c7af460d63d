"""Unit tests for the maintenance operators: SCD2 history, incremental
aggregate maintenance (incl. retractions), stats profiling, and the
two-level grouped top-k (incl. plan shape: no Window, no whole-group sort).

Oracle parity for the registered queries is covered by
test_oracle_queries.py; these pin the operator semantics the oracles
can't reach (retraction weights, approx-NDV plan shape, hot-group
bounded memory).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from momyre_spark.operators.incremental import aggregate_delta, merge_aggregates
from momyre_spark.operators.profile import profile_columns
from momyre_spark.operators.scd import scd2_history
from momyre_spark.operators.topk import grouped_topk

AGGS = {"cnt": ("count", None), "total": ("sum", "v")}


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------- SCD2 ----
def test_scd2_intervals_and_delete_closes(spark):
    ops = spark.createDataFrame(
        [
            ("a", 1, 0, "insert", 10),
            ("a", 2, 0, "update", 11),
            ("a", 3, 0, "delete", None),
            ("a", 4, 0, "insert", 12),
            ("b", 1, 0, "insert", 20),
        ],
        "_id string, ts long, seq long, op string, k int",
    )
    out = scd2_history(ops, key="_id", order=("ts", "seq"), value_cols=("k",))
    got = _rows(
        out.select("_id", "k", "valid_from_ts", "valid_to", "is_current")
    )
    assert got == sorted(
        [
            ("a", 10, 1, 2, False),   # closed by the update
            ("a", 11, 2, 3, False),   # closed by the DELETE (no version row)
            ("a", 12, 4, None, True),  # re-insert reopens
            ("b", 20, 1, None, True),
        ]
    )


def test_scd2_delete_only_key_yields_no_rows(spark):
    ops = spark.createDataFrame(
        [("x", 5, 0, "delete", None)],
        "_id string, ts long, seq long, op string, k int",
    )
    assert scd2_history(ops, order=("ts", "seq"), value_cols=("k",)).count() == 0


# ----------------------------------------------------- incremental agg ----
def test_merge_aggregates_equals_full_recompute(spark):
    full = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0), ("c", 4.0)], "g string, v double"
    )
    base = aggregate_delta(full.filter(F.col("v") <= 2.0), ["g"], AGGS)
    delta = full.filter(F.col("v") > 2.0)
    merged = merge_aggregates(base, delta, ["g"], AGGS)
    assert _rows(merged) == _rows(aggregate_delta(full, ["g"], AGGS))


def test_merge_aggregates_retraction_weights(spark):
    base = spark.createDataFrame([("a", 3, 6.0)], "g string, cnt long, total double")
    # retract one (a, 2.0) row, add one (a, 5.0) row
    delta = spark.createDataFrame(
        [("a", 2.0, -1), ("a", 5.0, 1)], "g string, v double, w int"
    )
    out = merge_aggregates(base, delta, ["g"], AGGS, weight_col="w").collect()[0]
    assert (out["cnt"], out["total"]) == (3, 9.0)


def test_minmax_rejects_retraction_weights(spark):
    import pytest

    delta = spark.createDataFrame([("a", 1.0, 1)], "g string, v double, w int")
    with pytest.raises(ValueError, match="not retractable"):
        aggregate_delta(delta, ["g"], {"lo": ("min", "v")}, weight_col="w")


def test_merge_only_touches_delta_groups(spark):
    """Groups absent from the delta pass through the merge unchanged."""
    base = spark.createDataFrame(
        [("a", 1, 1.0), ("b", 2, 5.0)], "g string, cnt long, total double"
    )
    delta = spark.createDataFrame([("b", 7.0)], "g string, v double")
    got = {r["g"]: (r["cnt"], r["total"]) for r in
           merge_aggregates(base, delta, ["g"], AGGS).collect()}
    assert got == {"a": (1, 1.0), "b": (3, 12.0)}


# --------------------------------------------------------------- profile --
def test_profile_exact_counts(spark):
    df = spark.createDataFrame(
        [(1.0, "x"), (2.0, "y"), (None, "x")], "n double, s string"
    )
    got = {r["col_name"]: r for r in profile_columns(df, ["n", "s"], exact_ndv=True).collect()}
    n, s = got["n"], got["s"]
    assert (n["n_rows"], n["n_nulls"], n["ndv"], n["min_num"], n["max_num"]) == (3, 1, 2, 1.0, 2.0)
    assert n["min_str"] is None
    assert (s["n_nulls"], s["ndv"], s["min_str"], s["max_str"]) == (0, 2, "x", "y")
    assert s["min_num"] is None


def test_profile_approx_path_has_no_expand(spark):
    """exact_ndv=False must stay a plain one-pass agg: no Expand operator."""
    df = spark.range(100).select(
        F.col("id").cast("double").alias("n"), F.col("id").cast("string").alias("s")
    )
    exact_plan = profile_columns(df, ["n", "s"], exact_ndv=True)._jdf.queryExecution().executedPlan().toString()
    approx_plan = profile_columns(df, ["n", "s"], exact_ndv=False)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan  # multiple exact distincts need Expand
    assert "Expand" not in approx_plan


def test_profile_approx_ndv_within_tolerance(spark):
    """The honest check for the scale-default path: HLL++ NDV estimates must
    land within 3x the default relative standard deviation (rsd 0.05 ->
    ±15%) of the exact distinct counts. The estimate is deterministic per
    dataset; this also pins the stats_profile_approx headline query's
    accuracy."""
    df = spark.range(20_000).select(
        (F.col("id") % 1337).cast("double").alias("n"),
        F.concat(F.lit("v"), (F.col("id") % 4211).cast("string")).alias("s"),
    )
    exact = {
        r["col_name"]: r["ndv"]
        for r in profile_columns(df, ["n", "s"], exact_ndv=True).collect()
    }
    approx = {
        r["col_name"]: r["ndv"]
        for r in profile_columns(df, ["n", "s"], exact_ndv=False).collect()
    }
    for c in ("n", "s"):
        assert abs(approx[c] - exact[c]) <= 0.15 * exact[c], (c, approx[c], exact[c])


# ---------------------------------------------------------------- top-k ---
def test_grouped_topk_matches_window_formulation(spark):
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [(g, i * 31 % 97, i) for g in ("a", "b") for i in range(200)],
        "g string, v int, id int",
    )
    got = _rows(grouped_topk(df, ["g"], "v", 5, ["id"]).select("g", "rank", "v", "id"))
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id").desc())
    want = _rows(
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("g", "rank", "v", "id")
    )
    assert got == want


def test_grouped_topk_plan_has_no_window(spark):
    df = spark.range(100).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("v")
    )
    plan = grouped_topk(df, ["g"], "v", 3)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Sort" not in plan.replace("sort_array", "")  # no whole-group sort


def test_grouped_topk_ascending(spark):
    df = spark.createDataFrame([("a", 3), ("a", 1), ("a", 2)], "g string, v int")
    got = [r["v"] for r in grouped_topk(df, ["g"], "v", 2, descending=False).orderBy("rank").collect()]
    assert got == [1, 2]


def test_drift_report_between_snapshot_versions(spark, tmp_path):
    from momyre_spark.operators.profile import drift_report
    from momyre_spark.sinks.snapshots import snapshot_write

    root = str(tmp_path / "tbl")
    v1 = spark.createDataFrame(
        [(i, float(i % 10), f"s{i % 3}") for i in range(100)],
        "id long, val double, cat string",
    )
    snapshot_write(spark, v1, root)
    v2 = spark.createDataFrame(
        [(i, None if i % 4 == 0 else float(i % 10), f"s{i % 5}")
         for i in range(200)],
        "id long, val double, cat string",
    )
    snapshot_write(spark, v2, root)

    rep = {
        r["col_name"]: r
        for r in drift_report(
            spark, root, ["val", "cat"], from_version=1, exact_ndv=True
        ).collect()
    }
    assert rep["val"]["rows_from"] == 100 and rep["val"]["rows_to"] == 200
    assert rep["val"]["null_rate_delta"] == 0.25  # 0 -> 50/200
    assert rep["cat"]["ndv_delta"] == 2  # 3 -> 5 categories
    assert rep["val"]["range_widened"] is False
    # STRING-column range drift must alert too: 'cat' gained 's3'/'s4',
    # widening the lexicographic [min_str, max_str] bound ('s2' -> 's4')
    assert rep["cat"]["range_widened"] is True
    assert (rep["cat"]["min_to"], rep["cat"]["max_to"]) == ("s0", "s4")


def test_refresh_join_from_cdf_dirty_keys_only(spark):
    """Dirty-key join maintenance: inserts, deletes, and a join-key-moving
    update all land correctly; untouched keys carry over; the plan keeps
    the carry-over as an anti-join (never a recompute)."""
    from pyspark.sql import Row, functions as F

    from momyre_spark.operators.incremental import refresh_join_from_cdf

    left_v1 = spark.createDataFrame(
        [Row(k=1, lid=10), Row(k=1, lid=11), Row(k=2, lid=20), Row(k=3, lid=30)]
    )
    right_v1 = spark.createDataFrame(
        [Row(k=1, rname="a"), Row(k=2, rname="b"), Row(k=3, rname="c")]
    )
    mat = left_v1.join(right_v1, "k")
    # changes: lid=20 moves k 2 -> 3; lid=40 inserted at k=9 (no right match);
    # right gets a new k=9 row so the insert joins; k=1 untouched
    left_v2 = spark.createDataFrame(
        [Row(k=1, lid=10), Row(k=1, lid=11), Row(k=3, lid=20), Row(k=3, lid=30),
         Row(k=9, lid=40)]
    )
    right_v2 = right_v1.unionByName(spark.createDataFrame([Row(k=9, rname="z")]))
    cdf_l = spark.createDataFrame(
        [Row(k=2, __change="update_preimage"), Row(k=3, __change="update_postimage"),
         Row(k=9, __change="insert")]
    )
    cdf_r = spark.createDataFrame([Row(k=9, __change="insert")])
    out = refresh_join_from_cdf(
        mat, left_v2, right_v2, cdf_l, cdf_r, "k"
    )
    want = left_v2.join(right_v2, "k")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, want.collect()))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "LeftSemi" in plan

    # no changes at all -> the view is returned as-is
    same = refresh_join_from_cdf(mat, left_v2, right_v2, None, None, "k")
    assert sorted(map(tuple, same.collect())) == sorted(map(tuple, mat.collect()))


def test_key_skew_report_flags_hot_key(spark):
    from pyspark.sql import Row

    from momyre_spark.operators.skew import key_skew_report

    # 4 keys: one holds 70 of 100 rows -> skew 2.8, salt 3
    rows = [Row(k=0)] * 70 + [Row(k=1)] * 10 + [Row(k=2)] * 10 + [Row(k=3)] * 10
    rep = key_skew_report(spark.createDataFrame(rows), "k", top_n=2).collect()
    assert [r["key"] for r in rep] == ["0", "1"]
    hot = rep[0]
    assert hot["n"] == 70 and hot["share"] == 0.7
    assert hot["skew"] == 2.8 and hot["suggested_salt"] == 3
    # uniform keys read skew ~1 / salt 1
    flat = key_skew_report(
        spark.createDataFrame([Row(k=i % 5) for i in range(100)]), "k"
    ).collect()
    assert all(r["skew"] == 1.0 and r["suggested_salt"] == 1 for r in flat)
    # one INPUT scan at execution: the totals and the top-N consume the
    # same per-key exchange (ReuseExchange), not two passes over the table
    from momyre_spark.plans.audit import audit_plan

    facts = audit_plan(
        key_skew_report(spark.createDataFrame(rows), "k", top_n=2),
        execute=True,
    )
    assert facts["plan"].count("ReusedExchange") >= 1


def test_refresh_join_from_cdf_left_join_variant(spark):
    """Left-join views maintain identically: a dirty RIGHT key re-derives
    the null-extension for left rows that gained/lost a match."""
    from pyspark.sql import Row

    from momyre_spark.operators.incremental import refresh_join_from_cdf

    left = spark.createDataFrame([Row(k=1, lid=10), Row(k=2, lid=20), Row(k=4, lid=40)])
    right_v1 = spark.createDataFrame([Row(k=1, rname="a")])
    mat = left.join(right_v1, "k", "left")
    # right gains k=2 (left row 20 flips null->match) and loses k=1
    right_v2 = spark.createDataFrame([Row(k=2, rname="b")])
    cdf_r = spark.createDataFrame(
        [Row(k=1, __change="delete"), Row(k=2, __change="insert")]
    )
    out = refresh_join_from_cdf(
        mat, left, right_v2, None, cdf_r, "k", how="left"
    )
    want = left.join(right_v2, "k", "left")
    assert sorted(map(tuple, out.collect()), key=str) == sorted(
        map(tuple, want.collect()), key=str
    )


def test_join_cardinality_estimate_exact_under_containment_and_skew_gap(spark):
    from pyspark.sql import Row

    from momyre_spark.operators.profile import join_cardinality_estimate

    # containment + uniform: estimate == actual
    left = spark.createDataFrame([Row(k=i % 10, v=i) for i in range(100)])
    right = spark.createDataFrame([Row(k=i, w=i) for i in range(10)])
    r = join_cardinality_estimate(left, right, "k").collect()[0]
    assert r["estimated_rows"] == r["actual_rows"] == 100
    # skew breaks the uniformity assumption visibly: estimate < actual
    skew = spark.createDataFrame(
        [Row(k=0, v=i) for i in range(90)] + [Row(k=i, v=i) for i in range(1, 11)]
    )
    r2 = join_cardinality_estimate(skew, skew.select("k"), "k").collect()[0]
    assert r2["actual_rows"] > r2["estimated_rows"]
    # disjoint keys: actual 0, estimate > 0 — the report shows the gap
    dis = join_cardinality_estimate(
        spark.createDataFrame([Row(k=1, v=1)]),
        spark.createDataFrame([Row(k=2, w=1)]),
        "k",
    ).collect()[0]
    assert dis["actual_rows"] == 0 and dis["estimated_rows"] == 1


def test_refresh_star_join_from_cdf_mixed_surfaces(spark):
    """Star-view maintenance (fact + 2 dims): fact insert, fact update
    that MOVES a dim join key, dim non-key update, and one dim with NO
    feed this batch. Untouched rows carry via anti-joins; a fact row
    dirtied through several surfaces rebuilds exactly once."""
    from pyspark.sql import Row

    from momyre_spark.operators.incremental import refresh_star_join_from_cdf

    dim_a = spark.createDataFrame(
        [Row(a=1, aname="a1"), Row(a=2, aname="a2"), Row(a=3, aname="a3")]
    )

    def dim_b(v1):
        return spark.createDataFrame(
            [Row(b=7, bval=70 + (100 if v1 else 0)), Row(b=8, bval=80)]
        )

    fact_v1 = spark.createDataFrame(
        [Row(fid=1, a=1, b=8), Row(fid=2, a=2, b=7), Row(fid=3, a=3, b=8)]
    )
    # fid=2 moves a 2->3 (fact change); fid=4 inserted; dim_b(7) updated
    fact_v2 = spark.createDataFrame(
        [Row(fid=1, a=1, b=8), Row(fid=2, a=3, b=7), Row(fid=3, a=3, b=8),
         Row(fid=4, a=1, b=7)]
    )
    mat = fact_v1.join(dim_a, "a").join(dim_b(True), "b")
    cdf_fact = spark.createDataFrame(
        [Row(fid=2, __change="update_postimage"), Row(fid=4, __change="insert")]
    )
    cdf_b = spark.createDataFrame([Row(b=7, __change="update_postimage")])
    out = refresh_star_join_from_cdf(
        mat, fact_v2,
        {"a": (dim_a, None), "b": (dim_b(False), cdf_b)},
        cdf_fact, "fid",
    )
    want = fact_v2.join(dim_a, "a").join(dim_b(False), "b")
    assert sorted(map(tuple, out.select(*want.columns).collect())) == sorted(
        map(tuple, want.collect())
    )
    # each output fid appears exactly once (no double rebuild: fid=2 is
    # dirty via BOTH the fact feed and dim_b's key 7)
    fids = [r["fid"] for r in out.collect()]
    assert sorted(fids) == [1, 2, 3, 4]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "LeftSemi" in plan

    # no feeds at all -> the view returns as-is
    same = refresh_star_join_from_cdf(
        mat, fact_v2, {"a": (dim_a, None), "b": (dim_b(False), None)},
        None, "fid",
    )
    assert sorted(map(tuple, same.collect())) == sorted(map(tuple, mat.collect()))


def test_point_in_time_join_versions_gaps_and_open(spark):
    """Probes hit the version covering their ts; a probe inside the
    delete gap matches nothing (inner) / NULL-pads (left); a probe at a
    version boundary belongs to the NEWER version (half-open)."""
    from momyre_spark.operators.scd import point_in_time_join

    ops = spark.createDataFrame(
        [
            ("a", 1, 0, "insert", 10),
            ("a", 2, 0, "update", 11),
            ("a", 3, 0, "delete", None),
            ("a", 4, 0, "insert", 12),
        ],
        "_id string, ts long, seq long, op string, k int",
    )
    hist = scd2_history(
        ops, key="_id", order=("ts", "seq"), value_cols=("k",)
    ).select("_id", "k", "valid_from_ts", "valid_to")
    probe = spark.createDataFrame(
        [("a", 1, "p1"), ("a", 2, "p2"), ("a", 3, "p3"), ("a", 9, "p9"),
         ("zz", 5, "pz")],
        "_id string, ts long, pid string",
    )
    inner = {(r["pid"], r["k"]) for r in
             point_in_time_join(probe, hist, key="_id", ts_col="ts").collect()}
    # p1 -> k=10; p2 -> boundary, newer version k=11; p3 -> delete gap
    # (no match); p9 -> open version k=12; pz -> unknown key (no match)
    assert inner == {("p1", 10), ("p2", 11), ("p9", 12)}
    left = point_in_time_join(
        probe, hist, key="_id", ts_col="ts", how="left"
    )
    got = {r["pid"]: r["k"] for r in left.collect()}
    assert got == {"p1": 10, "p2": 11, "p3": None, "p9": 12, "pz": None}
    assert left.count() == 5  # at-most-one match: no fan-out ever
    import pytest as _pytest

    with _pytest.raises(ValueError):
        point_in_time_join(probe, hist, how="full")


def test_mad_outliers_known_values_and_identical_group(spark):
    from momyre_spark.operators.profile import mad_outliers

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 100.0),
         ("b", 7.0), ("b", 7.0), ("b", 7.0)],
        "g string, v double",
    )
    got = {r["g"]: r for r in mad_outliers(df, "v", ["g"], k=3.0).collect()}
    # a: med 2.5, deviations [1.5,.5,.5,97.5] -> mad 1.0, one point > 3.0
    assert got["a"]["med"] == 2.5 and got["a"]["mad"] == 1.0
    assert got["a"]["n"] == 4 and got["a"]["n_outliers"] == 1
    # identical group: MAD 0, |x-med|=0 is never > 0 -> nothing flagged
    assert got["b"]["mad"] == 0.0 and got["b"]["n_outliers"] == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mad_outliers(df, "v", [])


def test_wilson_bounds_known_values(spark):
    import pytest as _pytest

    from momyre_spark.operators.profile import wilson_bounds

    df = spark.createDataFrame(
        [("a", i < 8) for i in range(10)] + [("b", True)] * 3
        + [("c", None)] * 2 + [("c", True)],
        "g string, ok boolean",
    )
    got = {r["g"]: r for r in wilson_bounds(df, ["g"], "ok").collect()}
    # a: 8/10 — the classic Wilson example
    z = 1.96
    p, n = 0.8, 10.0
    denom = 1.0 + z * z / n
    center = (p + z * z / (2.0 * n)) / denom
    half = (z * ((p * (1.0 - p) / n + z * z / (4.0 * n * n)) ** 0.5)
            / denom)
    assert got["a"]["n"] == 10 and got["a"]["successes"] == 8
    assert got["a"]["wilson_low"] == _pytest.approx(center - half, abs=1e-6)
    assert got["a"]["wilson_high"] == _pytest.approx(center + half, abs=1e-6)
    # b: 3/3 — Wilson pulls away from the degenerate [1, 1]
    assert got["b"]["rate"] == 1.0
    assert 0.3 < got["b"]["wilson_low"] < 1.0
    assert got["b"]["wilson_high"] == 1.0
    # c: NULLs excluded from n, not counted as failures
    assert got["c"]["n"] == 1 and got["c"]["successes"] == 1
    with _pytest.raises(ValueError):
        wilson_bounds(df, [], "ok")


def test_welch_ab_report_known_values_and_drops(spark):
    import pytest as _pytest

    from momyre_spark.operators.profile import welch_ab_report

    rows = ([("g", "A", v) for v in (1.0, 2.0, 3.0, 4.0)]
            + [("g", "B", v) for v in (2.0, 4.0, 6.0, 8.0)]
            + [("one_arm", "A", 1.0), ("one_arm", "A", 2.0)]
            + [("tiny", "A", 1.0), ("tiny", "B", 5.0)])
    df = spark.createDataFrame(rows, "g string, arm string, v double")
    out = welch_ab_report(df, ["g"], "arm", "v", "A", "B").collect()
    # one_arm lacks B; tiny has n=1 per arm: both dropped
    assert [r["g"] for r in out] == ["g"]
    r = out[0]
    va, vb = 5.0 / 3.0, 20.0 / 3.0
    se2 = va / 4.0 + vb / 4.0
    t = (2.5 - 5.0) / se2 ** 0.5
    dfw = se2 * se2 / ((va / 4.0) ** 2 / 3.0 + (vb / 4.0) ** 2 / 3.0)
    assert r["n_a"] == 4 and r["n_b"] == 4
    assert r["mean_a"] == 2.5 and r["mean_b"] == 5.0
    assert r["var_a"] == _pytest.approx(va, abs=1e-6)
    assert r["var_b"] == _pytest.approx(vb, abs=1e-6)
    assert r["t_stat"] == _pytest.approx(t, abs=1e-6)
    assert r["df_welch"] == _pytest.approx(dfw, abs=1e-6)


def test_group_ols_trend_known_values(spark):
    import pytest as _pytest

    from momyre_spark.operators.profile import group_ols_trend

    rows = ([("exact", x, 1.0 + 2.0 * x) for x in range(3)]
            + [("noisy", 0, 0.0), ("noisy", 1, 2.0), ("noisy", 2, 1.0),
               ("noisy", 3, 3.0)]
            + [("flat_y", 0, 5.0), ("flat_y", 1, 5.0)]
            + [("const_x", 7, 1.0), ("const_x", 7, 2.0)]
            + [("single", 0, 1.0)]
            + [("nulls", 0, None), ("nulls", None, 1.0)])
    df = spark.createDataFrame(rows, "g string, x long, y double")
    got = {r["g"]: r for r in group_ols_trend(df, ["g"], "x", "y").collect()}
    # const_x has no x variance, single has n=1, nulls has no valid rows
    assert set(got) == {"exact", "noisy", "flat_y"}
    assert got["exact"]["slope"] == 2.0
    assert got["exact"]["intercept"] == 1.0
    assert got["exact"]["r2"] == 1.0
    # hand-computed: slope 16/20, intercept 0.3, r2 0.64
    assert got["noisy"]["slope"] == _pytest.approx(0.8, abs=1e-6)
    assert got["noisy"]["intercept"] == _pytest.approx(0.3, abs=1e-6)
    assert got["noisy"]["r2"] == _pytest.approx(0.64, abs=1e-6)
    # constant y: zero y-variance -> r2 undefined (NULL), slope 0
    assert got["flat_y"]["slope"] == 0.0 and got["flat_y"]["r2"] is None
    with _pytest.raises(ValueError):
        group_ols_trend(df, [], "x", "y")


def test_chi2_independence_known_table(spark):
    import pytest as _pytest

    from momyre_spark.operators.profile import chi2_independence

    # classic 2x2: a/x 10, a/y 20, b/x 20, b/y 10 -> chi2 = 60/9*... hand:
    # N=60, rows a=30 b=30, cols x=30 y=30, e=15 each, (o-e)^2/e = 25/15
    # per cell -> chi2 = 4 * 5/3 = 20/3; V = sqrt((20/3)/60) = 1/3
    rows = ([("a", "x")] * 10 + [("a", "y")] * 20
            + [("b", "x")] * 20 + [("b", "y")] * 10
            + [(None, "x"), ("a", None)])
    df = spark.createDataFrame(rows, "u string, v string")
    r = chi2_independence(df, "u", "v").collect()[0]
    assert r["n"] == 60 and r["dof"] == 1
    assert r["chi2"] == _pytest.approx(20 / 3, abs=1e-5)
    assert r["cramers_v"] == _pytest.approx(1 / 3, abs=1e-5)
    # unobserved cell contributes its full expected count
    df2 = spark.createDataFrame(
        [("a", "x")] * 6 + [("a", "y")] * 3 + [("b", "y")] * 3,
        "u string, v string",
    )
    r2 = chi2_independence(df2, "u", "v").collect()[0]
    # e(b,x) = 3*6/12 = 1.5; its term is 1.5 even though o=0
    # full chi2: cells (a,x):(6-4.5)^2/4.5=.5 (a,y):(3-4.5)^2/4.5=.5
    #            (b,x):1.5  (b,y):(3-1.5)^2/1.5=1.5  -> 4.0
    assert r2["chi2"] == _pytest.approx(4.0, abs=1e-5)


def test_group_auc_known_values(spark):
    import pytest as _pytest

    from momyre_spark.operators.profile import group_auc

    # perfect: all positives score above all negatives -> AUC 1
    # random-ish: hand-computed mid-rank Mann-Whitney
    rows = (
        [("perfect", True, v) for v in (3.0, 4.0)]
        + [("perfect", False, v) for v in (1.0, 2.0)]
        + [("mixed", True, 3.0), ("mixed", False, 3.0),
           ("mixed", True, 1.0), ("mixed", False, 2.0)]
        + [("all_pos", True, 1.0), ("all_pos", True, 2.0)]
        + [("nullish", None, 1.0), ("nullish", True, None)]
    )
    df = spark.createDataFrame(rows, "g string, y boolean, s double")
    got = {r["g"]: r for r in group_auc(df, ["g"], "y", "s").collect()}
    # all_pos lacks negatives; nullish has no scored labeled rows
    assert set(got) == {"perfect", "mixed"}
    assert got["perfect"]["auc"] == 1.0
    assert got["perfect"]["n_pos"] == 2 and got["perfect"]["n_neg"] == 2
    # mixed: values 1(+), 2(-), 3(+), 3(-); mid-ranks 1, 2, 3.5, 3.5
    # R_pos = 1 + 3.5 = 4.5; AUC = (4.5 - 3) / 4 = 0.375
    assert got["mixed"]["auc"] == _pytest.approx(0.375, abs=1e-6)
    with _pytest.raises(ValueError):
        group_auc(df, [], "y", "s")


def test_ks_2sample_known_values(spark):
    import pytest as _pytest

    from momyre_spark.operators.profile import ks_2sample

    # disjoint supports -> D = 1; identical samples -> D = 0
    rows = (
        [("disjoint", "A", v) for v in (1.0, 2.0)]
        + [("disjoint", "B", v) for v in (3.0, 4.0)]
        + [("same", "A", 1.0), ("same", "A", 2.0),
           ("same", "B", 1.0), ("same", "B", 2.0)]
        + [("shift", "A", 1.0), ("shift", "A", 2.0), ("shift", "A", 3.0),
           ("shift", "B", 2.0), ("shift", "B", 3.0), ("shift", "B", 4.0)]
        + [("one_arm", "A", 1.0)]
    )
    df = spark.createDataFrame(rows, "g string, arm string, v double")
    got = {r["g"]: r for r in
           ks_2sample(df, ["g"], "arm", "v", "A", "B").collect()}
    assert set(got) == {"disjoint", "same", "shift"}
    assert got["disjoint"]["ks_stat"] == 1.0
    assert got["same"]["ks_stat"] == 0.0
    # shift by one step of 3: ECDFs differ by 1/3 at v in {1, 3}
    assert got["shift"]["ks_stat"] == _pytest.approx(1.0 / 3.0, abs=1e-6)
    assert got["shift"]["n_a"] == 3 and got["shift"]["n_b"] == 3


def test_psi_report_known_values(spark):
    import math

    import pytest as _pytest

    from momyre_spark.operators.profile import psi_report

    rows = (
        [("ref", v) for v in (1.0, 1.0, 5.0, 5.0)]
        + [("same", v) for v in (1.0, 1.0, 5.0, 5.0)]
        + [("shifted", v) for v in (5.0, 5.0, 5.0, 5.0)]
    )
    df = spark.createDataFrame(rows, "src string, v double")
    out = {r["src"]: r for r in
           psi_report(df, "src", "v", [3.0], "ref").collect()}
    assert set(out) == {"ref", "same", "shifted"}
    assert out["ref"]["psi"] == 0.0
    assert out["same"]["psi"] == 0.0
    # bins of ref: [2, 2] smoothed (2.5/5, 2.5/5); shifted: (0.5/5, 4.5/5)
    def term(pg, pr):
        t = (pg - pr) * math.log(pg / pr)
        return math.floor(t * 1e6 + 0.5) / 1e6

    want = term(0.1, 0.5) + term(0.9, 0.5)
    assert out["shifted"]["psi"] == _pytest.approx(want, abs=1e-6)
    with _pytest.raises(ValueError):
        psi_report(df, "src", "v", [3.0, 1.0], "ref")


def test_gini_concentration_known_values(spark):
    import pytest as _pytest

    from momyre_spark.operators.profile import gini_concentration

    rows = (
        [("equal", 5), ("equal", 5), ("equal", 5), ("equal", 5)]
        + [("concentrated", 0), ("concentrated", 0),
           ("concentrated", 0), ("concentrated", 10)]
        + [("pair", 1), ("pair", 3)]
        + [("zero", 0), ("zero", 0)]
        + [("nullv", None)]
    )
    df = spark.createDataFrame(rows, "g string, x long")
    got = {r["g"]: r for r in
           gini_concentration(df, ["g"], "x").collect()}
    # zero total and all-null groups dropped
    assert set(got) == {"equal", "concentrated", "pair"}
    assert got["equal"]["gini"] == 0.0
    # one holder of everything among 4: G = (n-1)/n = 0.75
    assert got["concentrated"]["gini"] == _pytest.approx(0.75, abs=1e-6)
    # x = [1, 3]: G = (2*(1*1 + 2*3) - 3*4) / (2*4) = 2/8 = 0.25
    assert got["pair"]["gini"] == _pytest.approx(0.25, abs=1e-6)
    assert got["pair"]["total"] == 4 and got["pair"]["n"] == 2


def test_entropy_report_known_values(spark):
    import pytest as _pytest

    from momyre_spark.operators.profile import entropy_report

    rows = (
        [("even", "a"), ("even", "a"), ("even", "b"), ("even", "b")]
        + [("single", "a"), ("single", "a")]
        + [("skew", "a"), ("skew", "a"), ("skew", "a"), ("skew", "b")]
        + [("nulls", None)]
    )
    df = spark.createDataFrame(rows, "g string, l string")
    got = {r["g"]: r for r in entropy_report(df, "g", "l").collect()}
    assert set(got) == {"even", "single", "skew"}
    import math

    assert got["even"]["entropy"] == _pytest.approx(
        math.log(2), abs=2e-6
    )
    assert got["even"]["entropy_norm"] == _pytest.approx(1.0, abs=2e-6)
    assert got["even"]["n_labels"] == 2 and got["even"]["n"] == 4
    assert got["single"]["entropy"] == 0.0
    assert got["single"]["entropy_norm"] is None
    want = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert got["skew"]["entropy"] == _pytest.approx(want, abs=2e-6)


def test_cuped_report_known_values(spark):
    import pytest as _pytest

    from momyre_spark.operators.profile import cuped_report

    # 6 units, arm balanced across x, y = 2x + 5*(arm=b):
    # theta = 2 exactly, diff_raw = 5, x-means equal -> diff_cuped = 5
    rows = []
    for i, xv in enumerate([1, 1, 2, 2, 3, 3]):
        arm = "a" if i % 2 == 0 else "b"
        yv = 2 * xv + (5 if arm == "b" else 0)
        rows.append(("g", f"u{i}", arm, False, float(xv)))
        rows.append(("g", f"u{i}", arm, True, float(yv)))
    # a unit with only a pre period: dropped
    rows.append(("g", "pre_only", "a", False, 9.0))
    # one-arm group: dropped
    rows += [("one_arm", "u0", "a", False, 1.0),
             ("one_arm", "u0", "a", True, 2.0)]
    # zero x-variance group: dropped
    rows += [("flat_x", "u0", "a", False, 1.0),
             ("flat_x", "u0", "a", True, 2.0),
             ("flat_x", "u1", "b", False, 1.0),
             ("flat_x", "u1", "b", True, 9.0)]
    df = spark.createDataFrame(
        rows, "g string, unit string, arm string, is_post boolean, v double"
    )
    out = cuped_report(
        df, ["g"], "unit", "arm", "is_post", "v", "a", "b"
    ).collect()
    assert [r["g"] for r in out] == ["g"]
    r = out[0]
    assert r["n_a"] == 3 and r["n_b"] == 3
    assert r["theta"] == _pytest.approx(2.0, abs=1e-6)
    assert r["diff_raw"] == _pytest.approx(5.0, abs=1e-6)
    assert r["diff_cuped"] == _pytest.approx(5.0, abs=1e-6)
    assert r["var_reduction"] == _pytest.approx(
        2304.0 / 7704.0, abs=1e-6
    )
    with _pytest.raises(ValueError):
        cuped_report(df, [], "unit", "arm", "is_post", "v", "a", "b")


def test_cuped_covariate_removes_known_noise(spark):
    import pytest as _pytest

    from momyre_spark.operators.profile import cuped_report

    # y = x + 1 exactly (no arm effect): theta = 1, diff_cuped = 0 even
    # though the arms have different x mixes (raw diff is nonzero)
    rows = []
    xs = {"a": [1, 2, 3], "b": [4, 5, 6]}
    i = 0
    for arm, vals in xs.items():
        for xv in vals:
            rows.append(("g", f"u{i}", arm, False, float(xv)))
            rows.append(("g", f"u{i}", arm, True, float(xv + 1)))
            i += 1
    df = spark.createDataFrame(
        rows, "g string, unit string, arm string, is_post boolean, v double"
    )
    r = cuped_report(
        df, ["g"], "unit", "arm", "is_post", "v", "a", "b"
    ).collect()[0]
    assert r["theta"] == _pytest.approx(1.0, abs=1e-6)
    assert r["diff_raw"] == _pytest.approx(3.0, abs=1e-6)
    assert r["diff_cuped"] == _pytest.approx(0.0, abs=1e-6)
    assert r["var_reduction"] == _pytest.approx(1.0, abs=1e-6)


def test_hill_tail_index_known_values(spark):
    import math

    import pytest as _pytest

    from momyre_spark.operators.profile import hill_tail_index

    rows = ([("pareto", v) for v in (1000, 100, 10, 1, 1)]
            + [("tied", 5), ("tied", 5), ("tied", 5)]
            + [("single", 7)]
            + [("small", 8), ("small", 2)]
            + [("nonpos", 0), ("nonpos", -3)])
    df = spark.createDataFrame(rows, "g string, x long")
    got = {r["g"]: r for r in
           hill_tail_index(df, ["g"], "x", k=2).collect()}
    assert set(got) == {"pareto", "tied", "small"}
    p = got["pareto"]
    # top-3 = [1000, 100, 10]; ref = 10; terms ln(100), ln(10)
    want_h = (math.floor(math.log(100.0) * 1e6 + 0.5) / 1e6
              + math.floor(math.log(10.0) * 1e6 + 0.5) / 1e6) / 2.0
    assert p["x_ref"] == 10 and p["k_used"] == 2 and p["n_top"] == 3
    assert p["hill"] == _pytest.approx(want_h, abs=1e-6)
    assert p["alpha"] == _pytest.approx(1.0 / want_h, abs=1e-6)
    t = got["tied"]
    assert t["hill"] == 0.0 and t["alpha"] is None
    s = got["small"]
    assert s["k_used"] == 1 and s["x_ref"] == 2
    assert s["hill"] == _pytest.approx(math.log(4.0), abs=1e-6)
    with _pytest.raises(ValueError):
        hill_tail_index(df, ["g"], "x", k=0)


def test_benford_report_known_values(spark):
    import pytest as _pytest

    from momyre_spark.operators.profile import (
        _BENFORD_E,
        benford_report,
    )

    def r6(v):
        import math

        return math.floor(v * 1e6 + 0.5) / 1e6

    rows = ([("uniform", float(d)) for d in range(1, 10)]
            + [("ones", 1.0)] * 4
            + [("ones", -5.0), ("ones", 0.001)])  # dropped: <= 0 fixed
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in benford_report(df, "g", "v").collect()}
    assert set(got) == {"uniform", "ones"}
    u = got["uniform"]
    assert u["n"] == 9
    want_chi = sum(
        r6((1.0 - 9.0 * e) ** 2 / (9.0 * e)) for e in _BENFORD_E
    )
    want_mad = r6(sum(r6(abs(1.0 / 9.0 - e)) for e in _BENFORD_E) / 9.0)
    assert u["chi2"] == _pytest.approx(want_chi, abs=1e-6)
    assert u["mad"] == _pytest.approx(want_mad, abs=1e-6)
    o = got["ones"]
    assert o["n"] == 4  # negatives and zero-fixed values excluded
    want_chi_o = r6((4.0 - 4.0 * _BENFORD_E[0]) ** 2
                    / (4.0 * _BENFORD_E[0])) + sum(
        r6((0.0 - 4.0 * e) ** 2 / (4.0 * e)) for e in _BENFORD_E[1:]
    )
    assert o["chi2"] == _pytest.approx(want_chi_o, abs=1e-6)


def test_spearman_corr_known_values(spark):
    import numpy as np
    import pytest as _pytest

    from momyre_spark.operators.profile import spearman_corr

    def ref_spearman(xs, ys):
        def midranks(v):
            v = np.asarray(v, dtype=float)
            order = v.argsort(kind="mergesort")
            r = np.empty(len(v))
            i = 0
            sv = v[order]
            while i < len(v):
                j = i
                while j < len(v) and sv[j] == sv[i]:
                    j += 1
                r[order[i:j]] = (i + j + 1) / 2.0
                i = j
            return r
        rx, ry = midranks(xs), midranks(ys)
        return np.corrcoef(rx, ry)[0, 1]

    cases = {
        "mono": ([1, 2, 3, 4], [1, 4, 9, 16]),
        "inv": ([1, 2, 3, 4], [16, 9, 4, 1]),
        "tied": ([1, 1, 2, 2, 3], [1, 2, 3, 4, 4]),
        "noisy": ([1, 2, 3, 4, 5, 6], [2, 1, 4, 3, 6, 5]),
    }
    rows = []
    for g, (xs, ys) in cases.items():
        rows += [(g, x, y) for x, y in zip(xs, ys)]
    rows += [("flat_x", 1, 1), ("flat_x", 1, 2)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r["g"]: r for r in spearman_corr(df, ["g"], "x", "y").collect()}
    assert set(got) == set(cases)  # flat_x dropped (zero x variance)
    assert got["mono"]["spearman"] == 1.0
    assert got["inv"]["spearman"] == -1.0
    for g, (xs, ys) in cases.items():
        assert got[g]["spearman"] == _pytest.approx(
            ref_spearman(xs, ys), abs=1e-6
        ), g
    with _pytest.raises(ValueError):
        spearman_corr(df, [], "x", "y")


def test_ab_power_report_known_values(spark):
    import math

    import pytest as _pytest

    from momyre_spark.operators.profile import (
        _Z_ALPHA_2,
        _Z_BETA,
        ab_power_report,
    )

    rows = ([("g", "A", v) for v in (1.0, 2.0, 3.0, 4.0)]
            + [("g", "B", v) for v in (2.0, 4.0, 6.0, 8.0)]
            + [("flat", "A", 3.0), ("flat", "A", 3.0),
               ("flat", "B", 3.0), ("flat", "B", 3.0)])
    df = spark.createDataFrame(rows, "g string, arm string, v double")
    out = ab_power_report(df, ["g"], "arm", "v", "A", "B").collect()
    # flat: zero pooled variance -> dropped
    assert [r["g"] for r in out] == ["g"]
    r = out[0]
    va, vb = 5.0 / 3.0, 20.0 / 3.0
    sp2 = (3 * va + 3 * vb) / 6.0
    sp = math.sqrt(sp2)
    delta = 2.5 - 5.0
    d = delta / sp
    g = d * (1.0 - 3.0 / (4.0 * 8 - 9.0))
    zz = _Z_ALPHA_2 + _Z_BETA
    mde = zz * sp * math.sqrt(0.25 + 0.25)
    n_req = math.ceil(2.0 * sp2 * zz * zz / (delta * delta))
    assert r["cohens_d"] == _pytest.approx(d, abs=1e-6)
    assert r["hedges_g"] == _pytest.approx(g, abs=1e-6)
    assert r["mde"] == _pytest.approx(mde, abs=1e-6)
    assert r["n_required"] == n_req


def test_gini_negative_values_report_null(spark):
    from momyre_spark.operators.profile import gini_concentration

    df = spark.createDataFrame(
        [("neg", -1), ("neg", 5), ("ok", 1), ("ok", 3)],
        "g string, x long",
    )
    got = {r["g"]: r for r in gini_concentration(df, ["g"], "x").collect()}
    assert got["neg"]["gini"] is None  # invalid Lorenz input: visible NULL
    assert got["ok"]["gini"] is not None


def test_psi_missing_reference_fail_stops(spark):
    import pytest as _pytest

    from momyre_spark.operators.profile import psi_report

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 5.0)], "src string, v double"
    )
    with _pytest.raises(ValueError, match="reference group"):
        psi_report(df, "src", "v", [3.0], "nope")


def test_kaplan_meier_known_values(spark):
    import pytest as _pytest

    from momyre_spark.operators.profile import kaplan_meier

    # classic textbook example: events at t=1 (2 of 10), t=3 (1 of 7),
    # censored at t=2 (1) : S(1)=0.8, S(2)=0.8, S(3)=0.8*(1-1/7)
    rows = (
        [(1, 1)] * 2
        + [(2, 0)]
        + [(3, 1)]
        + [(4, 0)] * 6
    )
    df = spark.createDataFrame(rows, "dur long, obs int")
    got = {r["t"]: r for r in kaplan_meier(df, [], "dur", "obs").collect()}
    assert got[1]["n_risk"] == 10 and got[1]["d_events"] == 2
    assert got[1]["surv"] == _pytest.approx(0.8, abs=1e-6)
    assert got[2]["n_risk"] == 8 and got[2]["c_censored"] == 1
    assert got[2]["surv"] == _pytest.approx(0.8, abs=1e-6)  # censoring only
    assert got[3]["n_risk"] == 7 and got[3]["d_events"] == 1
    assert got[3]["surv"] == _pytest.approx(0.8 * (1 - 1 / 7), abs=1e-6)
    assert got[4]["n_risk"] == 6 and got[4]["surv"] == got[3]["surv"]


def test_kaplan_meier_grouped_and_partition_invariant(spark):
    from momyre_spark.operators.profile import kaplan_meier

    rows = [(g, t % 5 + 1, (t * 7 + gi) % 3 != 0)
            for gi, g in enumerate(("a", "b")) for t in range(40)]
    df = spark.createDataFrame(rows, "g string, dur long, obs boolean")
    df = df.withColumn("obs", df.obs.cast("int"))
    a = sorted(map(tuple, kaplan_meier(df, ["g"], "dur", "obs").collect()))
    b = sorted(map(tuple,
                   kaplan_meier(df.repartition(7), ["g"], "dur",
                                "obs").collect()))
    assert a == b and len(a) == 10  # 2 groups x 5 distinct times
    # survival is non-increasing in t within each group
    for g in ("a", "b"):
        curve = [r[-1] for r in a if r[0] == g]
        assert all(x >= y for x, y in zip(curve, curve[1:]))


def test_stats_kaplan_meier_oracle_parity(spark):
    """Pre-validates the round-8 registration: run the (not yet
    registered) stats_kaplan_meier query and its DuckDB oracle at
    sf0.001 with the driver-mirror compare."""
    import os

    import duckdb
    import pytest as _pytest

    from momyre_spark.plans.maintenance_queries import (
        _KM_ORACLE,
        stats_kaplan_meier,
    )
    from tests.oracle_compare import compare

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/events.parquet"):
        _pytest.skip("sf0.001 testdata absent")
    sdf = stats_kaplan_meier(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet')"
    )
    ddf = con.execute(_KM_ORACLE).fetchdf()
    ok, msg = compare(sdf, ddf)
    assert ok and len(sdf) > 0, msg


def test_trimmed_mean_known_values(spark):
    import pytest as _pytest

    from momyre_spark.operators.profile import trimmed_mean

    # group a: values 0..19 plus outliers -1000 and +1000 (n=22, 5% ->
    # k=1): exactly the two outliers fall, mean of 0..19 = 9.5
    rows = [("a", float(v)) for v in range(20)] + [
        ("a", -1000.0), ("a", 1000.0)
    ]
    # group b: too small to trim (n=4, k=0) -> plain mean
    rows += [("b", 1.0), ("b", 2.0), ("b", 3.0), ("b", 10.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in trimmed_mean(df, ["g"], "v").collect()}
    assert got["a"]["n"] == 22 and got["a"]["k_trimmed"] == 1
    assert got["a"]["trimmed_mean"] == _pytest.approx(9.5, abs=1e-6)
    assert got["b"]["k_trimmed"] == 0
    assert got["b"]["trimmed_mean"] == _pytest.approx(4.0, abs=1e-6)
    # ties across the cut boundary: multiset semantics — only k copies
    # of the boundary value fall
    ties = spark.createDataFrame(
        [("t", 5.0)] * 30 + [("t", 0.0)] * 2,
        "g string, v double",
    )  # n=32, k=1: drop one 0.0 low, one 5.0 high -> (0 + 5*29)/30
    r = trimmed_mean(ties, ["g"], "v").collect()[0]
    assert r["trimmed_mean"] == _pytest.approx((0.0 + 5.0 * 29) / 30, abs=1e-6)
    with _pytest.raises(ValueError):
        trimmed_mean(df, ["g"], "v", trim_pct=50)


def test_trimmed_mean_partition_invariant(spark):
    from momyre_spark.operators.profile import trimmed_mean

    rows = [("g" + str(i % 3), float((i * 37) % 101)) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, v double")
    a = sorted(map(tuple, trimmed_mean(df, ["g"], "v").collect()))
    b = sorted(map(tuple,
                   trimmed_mean(df.repartition(11), ["g"], "v").collect()))
    assert a == b and len(a) == 3


def test_stats_trimmed_mean_oracle_parity(spark):
    """Pre-validates the round-8 registration (driver-mirror compare)."""
    import os

    import duckdb
    import pytest as _pytest

    from momyre_spark.plans.maintenance_queries import (
        _TRIM_ORACLE,
        stats_trimmed_mean,
    )
    from tests.oracle_compare import compare

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/events.parquet"):
        _pytest.skip("sf0.001 testdata absent")
    sdf = stats_trimmed_mean(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet')"
    )
    ddf = con.execute(_TRIM_ORACLE).fetchdf()
    ok, msg = compare(sdf, ddf)
    assert ok and len(sdf) > 0, msg


def test_bootstrap_ci_brackets_mean_and_shrinks(spark):
    from momyre_spark.operators.profile import bootstrap_ci

    rows = [("a", i, float(40 + (i * 17) % 21)) for i in range(400)]
    rows += [("b", 10_000 + i, float((i * 13) % 7)) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = {r["g"]: r for r in
           bootstrap_ci(df, ["g"], "id", "v", n_boot=100).collect()}
    for g in ("a", "b"):
        r = got[g]
        assert r["ci_lo"] <= r["mean"] <= r["ci_hi"], r
        assert r["ci_lo"] < r["ci_hi"]
    # 8x the data at the same spread -> materially tighter interval
    wide = got["a"]["ci_hi"] - got["a"]["ci_lo"]
    big = spark.createDataFrame(
        [("a", i, float(40 + (i * 17) % 21)) for i in range(3200)],
        "g string, id long, v double",
    )
    rb = bootstrap_ci(big, ["g"], "id", "v", n_boot=100).collect()[0]
    assert (rb["ci_hi"] - rb["ci_lo"]) < wide * 0.6
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bootstrap_ci(df, ["g"], "id", "v", n_boot=1)


def test_bootstrap_ci_partition_invariant(spark):
    from momyre_spark.operators.profile import bootstrap_ci

    df = spark.createDataFrame(
        [("g", i, float(i % 13)) for i in range(300)],
        "g string, id long, v double",
    )
    a = sorted(map(tuple, bootstrap_ci(df, ["g"], "id", "v",
                                       n_boot=50).collect()))
    b = sorted(map(tuple, bootstrap_ci(df.repartition(9), ["g"], "id",
                                       "v", n_boot=50).collect()))
    assert a == b


def test_stats_bootstrap_ci_oracle_parity(spark):
    """Pre-validates the round-8 registration (driver-mirror compare)."""
    import os

    import duckdb
    import pytest as _pytest

    from momyre_spark.plans.maintenance_queries import (
        _bootstrap_oracle,
        stats_bootstrap_ci,
    )
    from tests.oracle_compare import compare

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/events.parquet"):
        _pytest.skip("sf0.001 testdata absent")
    sdf = stats_bootstrap_ci(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet')"
    )
    ddf = con.execute(_bootstrap_oracle()).fetchdf()
    ok, msg = compare(sdf, ddf)
    assert ok and len(sdf) > 0, msg


def _py_kaplan_meier(pairs):
    """Sequential reference: pairs = [(duration, observed)] one group."""
    from collections import Counter

    d = Counter(t for t, e in pairs if e)
    c = Counter(t for t, e in pairs if not e)
    times = sorted(set(d) | set(c))
    n = len(pairs)
    out, s = [], 1.0
    for t in times:
        s *= 1.0 - d[t] / n
        out.append((t, n, d[t], c[t], s))
        n -= d[t] + c[t]
    return out


def test_kaplan_meier_matches_python_reference_hypothesis(spark):
    import pytest as _pytest
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from momyre_spark.operators.profile import kaplan_meier

    subj = st.tuples(st.integers(min_value=0, max_value=8),
                     st.booleans())

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(pairs=st.lists(subj, min_size=1, max_size=40))
    def inner(pairs):
        df = spark.createDataFrame(
            [(t, int(e)) for t, e in pairs], "dur long, obs int"
        )
        got = sorted(
            (r["t"], r["n_risk"], r["d_events"], r["c_censored"], r["surv"])
            for r in kaplan_meier(df, [], "dur", "obs").collect()
        )
        want = _py_kaplan_meier(pairs)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g[:4] == w[:4], (g, w)
            assert g[4] == _pytest.approx(w[4], abs=1e-6), (g, w)

    inner()


def test_bootstrap_ci_global_group(spark):
    """Empty group_cols = one global CI row (the kaplan_meier/trimmed_mean
    convention) — must not crash on the empty join key."""
    from momyre_spark.operators.profile import bootstrap_ci

    df = spark.createDataFrame(
        [(i, float(i % 11)) for i in range(200)], "id long, v double"
    )
    rows = bootstrap_ci(df, [], "id", "v", n_boot=50).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]


def _py_trimmed_mean(vals, pct=5, scale=100):
    s = sorted(
        int(__import__("math").floor(v * scale + 0.5)) for v in vals
    )
    n = len(s)
    k = n * pct // 100
    kept = s[k:n - k]
    if not kept:
        return None
    m = sum(kept) / len(kept) / scale
    import math

    return math.floor(m * 10**6 + 0.5) / 10**6


def test_trimmed_mean_matches_python_reference_hypothesis(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from momyre_spark.operators.profile import trimmed_mean

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(vals=st.lists(
        st.floats(min_value=-1000, max_value=1000, allow_nan=False,
                  allow_infinity=False),
        min_size=1, max_size=60))
    def inner(vals):
        df = spark.createDataFrame(
            [("g", float(v)) for v in vals], "g string, v double"
        )
        got = trimmed_mean(df, ["g"], "v").collect()
        want = _py_trimmed_mean(vals)
        if want is None:
            assert got == []
        else:
            assert got[0]["trimmed_mean"] == want, (vals, got, want)

    inner()


def _py_bootstrap_ci(rows, n_boot, alpha_pct=5, scale=100):
    """Pure-Python mirror of bootstrap_ci for one group: same md5 ladder,
    same exact-integer sums, same order-statistic pick, same rounding."""
    import hashlib
    import math

    from momyre_spark.operators.profile import _POISSON1_CDF

    def fp(x):
        return math.floor(x * 10**6 + 0.5) / 10**6

    vs = {str(i): int(math.floor(v * scale + 0.5)) for i, v in rows}
    means = []
    for b in range(n_boot):
        s = wn = 0
        for i, v in vs.items():
            h = hashlib.md5(f"{i}-{b}".encode()).hexdigest()
            u = int(h[:15], 16) / float(1 << 60)
            w = len(_POISSON1_CDF)
            for k, t in enumerate(_POISSON1_CDF):
                if u < t:
                    w = k
                    break
            s += w * v
            wn += w
        if wn > 0:
            means.append(s / wn / scale)
    means.sort()
    nb = len(means)
    lo = max(1, (nb * alpha_pct + 199) // 200)
    n = len(vs)
    mean = fp(sum(vs.values()) / n / scale)
    return n, mean, fp(means[lo - 1]), fp(means[nb - lo])


def test_bootstrap_ci_matches_python_reference(spark):
    """Three-way determinism: the Spark CI must equal a pure-Python
    replay of the md5 ladder bit-for-bit (the DuckDB oracle is the
    third leg, exercised by the staged-queue mirror)."""
    from momyre_spark.operators.profile import bootstrap_ci

    rows = [(i, float((i * 37) % 50) / 3.0) for i in range(80)]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in rows], "g string, id long, v double"
    )
    r = bootstrap_ci(df, ["g"], "id", "v", n_boot=40).collect()[0]
    n, mean, lo, hi = _py_bootstrap_ci(rows, n_boot=40)
    assert (r["n"], r["mean"], r["ci_lo"], r["ci_hi"]) == (n, mean, lo, hi)


def test_stats_kaplan_meier_epoch_boundary_fixture(spark, tmp_path):
    """Adversarial epoch/hour-boundary fixture for the registered KM
    query (VERDICT r07 item #6): the sf0.1-only bug fixed in commit
    b60460f was an un-floored DuckDB epoch() flipping an hour bucket
    for fractional-second timestamps near a 3600s boundary. This pins
    the exact failure mode at unit scale: microsecond fractions
    straddling whole-hour differences (3599.999999s vs 3600.000001s vs
    exactly 3600s), a single-event user (duration 0, censored), an
    all-censored tail, and a window spanning a US DST transition date
    (the session is UTC-pinned, so both engines must treat it as
    linear time). Spark query and DuckDB oracle run on the SAME parquet
    with the driver-mirror compare."""
    import duckdb
    import pandas as pd

    from momyre_spark.plans.maintenance_queries import (
        _KM_ORACLE,
        stats_kaplan_meier,
    )
    from tests.oracle_compare import compare

    base = pd.Timestamp("2026-03-08 06:59:59.999999")  # DST-change date
    us = pd.Timedelta(microseconds=1)
    hr = pd.Timedelta(hours=1)
    rows = []  # (user_id, event_type, ts)
    # u1: fractional start, purchase 3600.000002s later — per-timestamp
    # floor gives floor diff 3600 -> bucket 1 on BOTH engines
    rows += [(1, "view", base), (1, "purchase", base + hr + us)]
    # u2: purchase EXACTLY 3600s later (bucket boundary) -> bucket 1
    rows += [(2, "view", base + us), (2, "purchase", base + hr + us)]
    # u3: whole-second start, purchase 3599.999999s later — the floors
    # differ by 3599 -> bucket 0 (semantics are DIFF OF FLOORS, not
    # floor of the true diff: with a fractional start the same true
    # duration would land in bucket 1, which is what u1 pins)
    rows += [(3, "view", base + us), (3, "purchase", base + hr)]
    # u4: exactly 2 hours, whole-second stamps -> bucket 2
    rows += [(4, "view", base + us), (4, "purchase", base + us + 2 * hr)]
    # u5: never purchases, censored at last event 90 min out -> bucket 1
    rows += [(5, "view", base), (5, "click", base + hr + hr / 2)]
    # u6: single event, no purchase -> duration 0, censored
    rows += [(6, "view", base + 3 * us)]
    df = pd.DataFrame(
        [
            {
                "event_id": i,
                "ts": ts,
                "user_id": uid,
                "event_type": et,
                "value": 1.0,
                "props": "{}",
            }
            for i, (uid, et, ts) in enumerate(rows)
        ]
    )
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(str(tmp_path / "events.parquet"), index=False)

    sdf = stats_kaplan_meier(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    ddf = con.execute(_KM_ORACLE).fetchdf()
    con.close()
    ok, msg = compare(sdf, ddf)
    assert ok, msg
    got = {int(r["t"]): r for _, r in sdf.iterrows()}
    # bucket landings prove the per-timestamp flooring semantics
    assert set(got) == {0, 1, 2}
    assert got[0]["d_events"] == 1 and got[0]["c_censored"] == 1  # u3, u6
    assert got[1]["d_events"] == 2 and got[1]["c_censored"] == 1  # u1,u2; u5
    assert got[2]["d_events"] == 1  # u4
    assert got[0]["n_risk"] == 6 and got[1]["n_risk"] == 4


def test_kaplan_meier_all_censored_group(spark):
    """No observed events at all: S(t) must stay exactly 1.0 at every
    distinct time (each factor is 1 - 0/n), with censor counts intact."""
    from momyre_spark.operators.profile import kaplan_meier

    df = spark.createDataFrame(
        [(t % 4 + 1, 0) for t in range(12)], "dur long, obs int"
    )
    rows = kaplan_meier(df, [], "dur", "obs").collect()
    assert len(rows) == 4
    assert all(r["d_events"] == 0 and r["surv"] == 1.0 for r in rows)
    assert sum(r["c_censored"] for r in rows) == 12


def test_bootstrap_ci_degenerate_strata(spark):
    """Degenerate strata must not crash or emit garbage (VERDICT r07
    item #6): an n=1 stratum's Poisson replicates are weight-0 ~37% of
    the time — those replicates are dropped (sum __n > 0 filter) and
    every survivor's mean IS the single value, so ci_lo == ci_hi ==
    mean; a constant-valued stratum likewise collapses to a zero-width
    interval. Both must be partition-invariant."""
    from momyre_spark.operators.profile import bootstrap_ci

    rows = (
        [("one", 100, 7.25)]  # n=1 stratum
        + [("const", 200 + i, 3.5) for i in range(20)]  # constant stratum
        + [("mix", 300 + i, float(i)) for i in range(20)]  # control
    )
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = {
        r["g"]: r
        for r in bootstrap_ci(df, ["g"], "id", "v", n_boot=50).collect()
    }
    assert got["one"]["n"] == 1
    assert got["one"]["ci_lo"] == got["one"]["ci_hi"] == got["one"]["mean"] == 7.25
    assert got["const"]["ci_lo"] == got["const"]["ci_hi"] == 3.5
    assert got["mix"]["ci_lo"] < got["mix"]["mean"] < got["mix"]["ci_hi"]
    again = {
        r["g"]: r
        for r in bootstrap_ci(
            df.repartition(7), ["g"], "id", "v", n_boot=50
        ).collect()
    }
    assert {g: tuple(r) for g, r in got.items()} == {
        g: tuple(r) for g, r in again.items()
    }


def test_bh_adjust_known_values(spark):
    """Textbook BH example plus the q=1 clip and grouped families."""
    from momyre_spark.operators.profile import bh_adjust

    rows = [("a", "t1", 0.01), ("a", "t2", 0.02), ("a", "t3", 0.03),
            ("a", "t4", 0.04), ("a", "t5", 0.2),
            ("b", "s1", 0.9), ("b", "s2", 0.95)]
    df = spark.createDataFrame(rows, "fam string, id string, p double")
    got = {(r["fam"], r["id"]): r
           for r in bh_adjust(df, "p", "id", ["fam"], alpha_pct=10).collect()}
    # family a: raw = [5*.01/1, 5*.02/2, 5*.03/3, 5*.04/4, 5*.2/5]
    #         = [.05,.05,.05,.05,.2]; reverse-min q identical
    for tid in ("t1", "t2", "t3", "t4"):
        assert got[("a", tid)]["q"] == 0.05
        assert got[("a", tid)]["is_discovery"]
    assert got[("a", "t5")]["q"] == 0.2 and not got[("a", "t5")]["is_discovery"]
    # family b: raw = [2*.9/1, 2*.95/2] = [1.8, .95] -> q = [.95 clip? ]
    # q(s1) = min(1.8, .95) = .95; q(s2) = .95; both clipped under 1
    assert got[("b", "s1")]["q"] == 0.95 and got[("b", "s2")]["q"] == 0.95
    assert not got[("b", "s1")]["is_discovery"]
    # ranks are deterministic with id tiebreak
    assert got[("a", "t1")]["rank"] == 1 and got[("b", "s2")]["rank"] == 2
    import pytest as _pytest
    with _pytest.raises(ValueError):
        bh_adjust(df, "p", "id", alpha_pct=0)


def test_bh_adjust_q_monotone_and_partition_invariant(spark):
    """q-values must be non-decreasing in p within a family (the
    reverse-running-min realizes the step-up min-over-tail), and the
    whole output must be partition-invariant."""
    from momyre_spark.operators.profile import bh_adjust

    rows = [("f", f"t{i:03d}", ((i * 61) % 97) / 97.0) for i in range(60)]
    df = spark.createDataFrame(rows, "fam string, id string, p double")
    out = sorted(
        bh_adjust(df, "p", "id", ["fam"]).collect(), key=lambda r: r["rank"]
    )
    qs = [r["q"] for r in out]
    assert all(a <= b for a, b in zip(qs, qs[1:]))
    assert all(0.0 <= v <= 1.0 for v in qs)
    again = sorted(
        bh_adjust(df.repartition(7), "p", "id", ["fam"]).collect(),
        key=lambda r: r["rank"],
    )
    assert list(map(tuple, out)) == list(map(tuple, again))


def test_isotonic_calibrate_matches_pav_reference(spark):
    """The minimax-formulation isotonic fit must equal the classical
    sequential pool-adjacent-violators sweep (they characterize the same
    L2-optimal monotone fit), be monotone non-decreasing, and preserve
    bucket stats exactly."""
    import pytest as _pytest

    from momyre_spark.operators.profile import isotonic_calibrate

    # scores 0..9 with a deliberate violation: bucket 3 dips below 2
    data = []
    rates = [0.0, 0.1, 0.5, 0.2, 0.3, 0.9, 0.7, 1.0]
    for b, rate in enumerate(rates):
        for i in range(10):
            data.append((float(b) + 0.5, 1 if i < rate * 10 else 0))
    df = spark.createDataFrame(data, "score double, label int")
    got = {r["bucket"]: r for r in
           isotonic_calibrate(df, "score", "label", lo=0.0, hi=8.0,
                              n_buckets=8).collect()}
    assert len(got) == 8

    # sequential PAV reference
    blocks = [[n, s] for n, s in ((10, int(r * 10)) for r in rates)]
    pooled = []
    for blk in blocks:
        pooled.append(list(blk))
        while len(pooled) >= 2 and (
            pooled[-2][1] * pooled[-1][0] >= pooled[-1][1] * pooled[-2][0]
        ):
            b2 = pooled.pop()
            pooled[-1][0] += b2[0]
            pooled[-1][1] += b2[1]
    fit = []
    for n, s in pooled:
        fit.extend([s / n] * (n // 10))
    for b in range(8):
        import math
        assert got[b]["iso_prob"] == math.floor(fit[b] * 1e6 + 0.5) / 1e6, b
        assert got[b]["n"] == 10
        assert got[b]["sum_label"] == int(rates[b] * 10)
    iso = [got[b]["iso_prob"] for b in range(8)]
    assert iso == sorted(iso)  # monotone non-decreasing

    with _pytest.raises(ValueError):
        isotonic_calibrate(df, "score", "label", lo=0.0, hi=8.0, n_buckets=1)
    with _pytest.raises(ValueError):
        isotonic_calibrate(df, "score", "label", lo=5.0, hi=5.0)

    # NULL hygiene: a NULL score must NOT land in bucket 0 (Spark's
    # greatest() skips NULLs, so floor(NULL)->greatest(NULL,0)=0 would
    # silently contaminate the lowest bucket); NULL rows are dropped.
    with_nulls = spark.createDataFrame(
        data + [(None, 1), (None, 1), (0.5, None)], "score double, label int"
    )
    got_n = {r["bucket"]: r for r in
             isotonic_calibrate(with_nulls, "score", "label", lo=0.0,
                                hi=8.0, n_buckets=8).collect()}
    assert {b: (r["n"], r["sum_label"]) for b, r in got_n.items()} == {
        b: (r["n"], r["sum_label"]) for b, r in got.items()
    }


def test_qq_table_exact_order_statistics(spark):
    """Hand-check: type-1 quantiles are the value at rank ceil(p*n) per
    group — identical distributions give zero diffs everywhere, a
    constant shift reads back exactly, and the median of 1..10 at p=0.5
    is 5 (rank ceil(0.5*10) = 5)."""
    import pytest as _pytest

    from momyre_spark.operators.profile import qq_table

    rows = [("a", float(v)) for v in range(1, 11)]
    rows += [("b", float(v) + 2.5) for v in range(1, 11)]
    df = spark.createDataFrame(rows, "grp string, value double")
    got = {r["p"]: r for r in
           qq_table(df, "value", "grp", "a", "b", n_quantiles=9).collect()}
    assert len(got) == 9
    assert got[0.5]["q_a"] == 5.0 and got[0.5]["q_b"] == 7.5
    assert all(r["qq_diff"] == -2.5 for r in got.values())  # pure shift
    # identical groups: zero everywhere
    same = qq_table(
        df.withColumn("g2", df.grp.substr(0, 0).isNull().cast("string")),
        "value", "grp", "a", "a", n_quantiles=9,
    ).collect()
    assert all(r["qq_diff"] == 0.0 for r in same)
    # ranks: p=0.1 over n=10 -> ceil(1.0) = rank 1 -> minimum
    assert got[0.1]["q_a"] == 1.0
    with _pytest.raises(ValueError):
        qq_table(df, "value", "grp", "a", "b", n_quantiles=0)


def test_calibration_report_known_values(spark):
    """Hand-checked reliability table: per-bucket means/rates/gaps and
    the ECE identity sum(ece_contrib) == sum(n/N * |gap|); NULL rows
    dropped (the isotonic hygiene)."""
    import math

    import pytest as _pytest

    from momyre_spark.operators.profile import calibration_report

    rows = [(0.05, 0), (0.15, 0), (0.18, 1), (0.35, 0), (0.42, 1),
            (0.55, 1), (0.61, 0), (0.77, 1), (0.88, 1), (0.93, 1),
            (None, 1), (0.5, None)]
    df = spark.createDataFrame(rows, "score double, label int")
    got = {r["bucket"]: r for r in
           calibration_report(df, "score", "label", 0.0, 1.0,
                              n_buckets=5).collect()}
    vals = [(s, l) for s, l in rows if s is not None and l is not None]
    n_total = len(vals)
    byb: dict[int, list] = {}
    for s, l in vals:
        byb.setdefault(min(max(int(s // 0.2), 0), 4), []).append((s, l))
    assert set(got) == set(byb)
    for b, grp in byb.items():
        n = len(grp)
        ms = (sum(math.floor(s * 1e6 + 0.5) for s, _ in grp) / 1e6) / n
        fp = sum(l for _, l in grp) / n
        assert got[b]["n"] == n
        assert got[b]["mean_score"] == math.floor(ms * 1e6 + 0.5) / 1e6
        assert got[b]["frac_pos"] == math.floor(fp * 1e6 + 0.5) / 1e6
        assert got[b]["ece_contrib"] == math.floor(
            n / n_total * abs(fp - ms) * 1e6 + 0.5) / 1e6
    with _pytest.raises(ValueError):
        calibration_report(df, "score", "label", 0.0, 1.0, n_buckets=1)
    with _pytest.raises(ValueError):
        calibration_report(df, "score", "label", 1.0, 1.0)


def test_quantile_normalize_known_values(spark):
    """Mid-ECDF -> pooled type-1 quantile map, checked by hand; and the
    single-group identity: a group that IS the pool maps every value to
    itself."""
    from momyre_spark.operators.profile import quantile_normalize

    data = [("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 3.0),
            ("b", 10.0), ("b", 11.0), ("b", 12.0), ("b", 13.0)]
    df = spark.createDataFrame(data, "g string, v double")
    got = {(r["g"], r["value"]): r["norm_value"]
           for r in quantile_normalize(df, "g", "v").collect()}
    # pooled sorted: 1,2,2,3,10,11,12,13; group a (n=4): v=1 -> mid-pos
    # 1/8 -> pooled rank 1 -> 1.0; v=2 (ties) -> 4/8 -> rank 4 -> 3.0;
    # v=3 -> 7/8 -> rank 7 -> 12.0; group b mirrors at its own ranks
    assert got == {("a", 1.0): 1.0, ("a", 2.0): 3.0, ("a", 3.0): 12.0,
                   ("b", 10.0): 1.0, ("b", 11.0): 2.0,
                   ("b", 12.0): 10.0, ("b", 13.0): 12.0}
    solo = spark.createDataFrame(
        [("x", float(v)) for v in (5, 7, 7, 9, 12)], "g string, v double"
    )
    for r in quantile_normalize(solo, "g", "v").collect():
        assert r["norm_value"] == r["value"]
