

def test_ewma_bounded_matches_pandas_and_starts_clean(spark):
    import pandas as pd
    from pyspark.sql import Row

    from momyre_spark.operators.timeseries import ewma_bounded

    vals = [10.0, 12.0, 9.0, 14.0, 11.0, 13.0, 8.0, 15.0, 10.5, 12.5]
    df = spark.createDataFrame(
        [Row(k="a", t=i, v=float(x)) for i, x in enumerate(vals)]
    )
    out = {r["t"]: r["ewma"] for r in
           ewma_bounded(df, ["k"], ["t"], "v", alpha=0.3, lookback=8).collect()}
    # pandas adjust=True EWMA truncated at 8 lags == the definition here
    ref = []
    w = [(1 - 0.3) ** i for i in range(8)]
    for t in range(len(vals)):
        lags = [vals[t - i] for i in range(min(t + 1, 8))]
        ref.append(sum(c * x for c, x in zip(w, lags)) / sum(w[: len(lags)]))
    for t, want in enumerate(ref):
        assert abs(out[t] - want) < 1e-9, t
    # the first row IS its value (renormalized start, no damped artifact)
    assert out[0] == 10.0
    # against full pandas ewm the truncation error is tiny once warm
    full = pd.Series(vals).ewm(alpha=0.3, adjust=True).mean()
    assert abs(out[9] - full[9]) < 0.06 * abs(full[9])


def test_ewma_all_null_window_is_null_not_nan(spark):
    import math

    from pyspark.sql import Row

    from momyre_spark.operators.timeseries import ewma_bounded

    df = spark.createDataFrame(
        [Row(k="a", t=0, v=None), Row(k="a", t=1, v=None),
         Row(k="a", t=2, v=4.0)],
        "k string, t int, v double",
    )
    out = {r["t"]: r["ewma"]
           for r in ewma_bounded(df, ["k"], ["t"], "v", lookback=2).collect()}
    assert out[0] is None and out[1] is None
    assert out[2] == 4.0 and not math.isnan(out[2])


def test_cusum_known_sequence_and_reduction_identity(spark):
    """Hand-computed two-sided CUSUM vs the window reduction: values
    step from 0 to 10 at position 3; target fixed at 0, allowance 1,
    threshold 15 -> S+ = [0,0,9,18,27,26,25] flags from the 4th row."""
    from momyre_spark.operators.timeseries import cusum_changepoints

    rows = [("a", i, v) for i, v in enumerate([0.0, 0.0, 10.0, 10.0,
                                               10.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    out = cusum_changepoints(
        df, "v", ["k"], ["i"], allowance=1.0, threshold=15.0, target=0.0
    ).orderBy("i").collect()
    assert [r["cusum_pos"] for r in out] == [0.0, 0.0, 9.0, 18.0, 27.0,
                                             26.0, 25.0]
    assert all(r["cusum_neg"] == 0.0 for r in out)
    assert [r["is_change"] for r in out] == [False, False, False, True,
                                             True, True, True]


def test_cusum_negative_side_and_mean_target(spark):
    from momyre_spark.operators.timeseries import cusum_changepoints

    # symmetric values around mean 5; a downward run trips the negative
    # side only. target=None -> per-key mean (= 5 exactly here)
    vals = [5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 0.0, 0.0, 0.0, 10.0, 10.0, 10.0]
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(vals)],
        "k string, i long, v double",
    )
    out = cusum_changepoints(
        df, "v", ["k"], ["i"], allowance=1.0, threshold=7.0
    ).orderBy("i").collect()
    # downward run: y- = 5-1-0 = 4 per step -> S- = 4, 8, 12
    assert [r["cusum_neg"] for r in out][6:9] == [4.0, 8.0, 12.0]
    assert out[7]["is_change"] and not out[6]["is_change"]
    # NULL values are dropped, not zero-filled
    df2 = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, None), ("a", 2, 3.0)],
        "k string, i long, v double",
    )
    assert cusum_changepoints(
        df2, "v", ["k"], ["i"], allowance=0.0, threshold=1.0, target=2.0
    ).count() == 2


def test_cusum_validation(spark):
    import pytest as _pytest

    from momyre_spark.operators.timeseries import cusum_changepoints

    df = spark.createDataFrame([("a", 0, 1.0)], "k string, i long, v double")
    with _pytest.raises(ValueError, match="key_cols"):
        cusum_changepoints(df, "v", [], ["i"], 1.0, 1.0)
    with _pytest.raises(ValueError, match="threshold"):
        cusum_changepoints(df, "v", ["k"], ["i"], 1.0, 0.0)


def test_ohlc_bars_known_buckets(spark):
    from pyspark.sql import functions as F

    from momyre_spark.operators.timeseries import ohlc_bars

    rows = [
        ("k", "2024-01-01 00:00:01", 1, 10.0),
        ("k", "2024-01-01 00:00:30", 2, 30.0),
        ("k", "2024-01-01 00:00:59", 3, 20.0),   # bucket 0: o=10 c=20
        ("k", "2024-01-01 00:01:10", 4, 5.0),    # bucket 1: single row
        ("k2", "2024-01-01 00:00:10", 5, 7.0),
        ("k", None, 9, 1.0), ("k", "2024-01-01 00:00:02", 10, None),
    ]
    df = spark.createDataFrame(
        rows, "k string, ts string, event_id long, v double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = ohlc_bars(df, ["k"], "ts", "v", 60, ["event_id"]).collect()
    got = {(r["k"], r["bucket_start"]): r for r in out}
    b0 = int(1704067200 / 60)  # 2024-01-01 00:00 UTC epoch minute
    r = got[("k", b0)]
    assert (r["open"], r["high"], r["low"], r["close"]) == (10.0, 30.0,
                                                            10.0, 20.0)
    assert r["n"] == 3 and r["volume"] == 60.0
    r1 = got[("k", b0 + 1)]
    assert (r1["open"], r1["close"], r1["n"]) == (5.0, 5.0, 1)
    assert got[("k2", b0)]["open"] == 7.0
    assert len(got) == 3  # NULL ts / NULL value rows dropped
    import pytest as _pytest

    with _pytest.raises(ValueError, match="tiebreak"):
        ohlc_bars(df, ["k"], "ts", "v", 60, [])


def test_time_weighted_avg_step_function(spark):
    from pyspark.sql import functions as F

    from momyre_spark.operators.timeseries import time_weighted_avg

    # value 10 holds 30s, value 20 holds 10s, final value closes span:
    # twap = (10*30 + 20*10) / 40 = 12.5  (row mean would be 40/3)
    rows = [
        ("k", "2024-01-01 00:00:00", 10.0),
        ("k", "2024-01-01 00:00:30", 20.0),
        ("k", "2024-01-01 00:00:40", 99.0),
        ("single", "2024-01-01 00:00:00", 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = {r["k"]: r for r in time_weighted_avg(df, ["k"], "ts", "v").collect()}
    assert set(out) == {"k"}  # single-observation key dropped
    assert out["k"]["twap"] == 12.5
    assert out["k"]["span_seconds"] == 40.0
    assert out["k"]["n"] == 3


def test_time_weighted_avg_tie_pairing_deterministic(spark):
    from pyspark.sql import functions as F

    from momyre_spark.operators.timeseries import time_weighted_avg

    # two observations at the SAME instant: with the id tiebreak the
    # later id (v=100) supersedes instantly and holds the 10s interval
    rows = [
        ("k", "2024-01-01 00:00:00", 1, 0.0),
        ("k", "2024-01-01 00:00:00", 2, 100.0),
        ("k", "2024-01-01 00:00:10", 3, 50.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, id long, v double") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = time_weighted_avg(df, ["k"], "ts", "v", ["id"]).collect()[0]
    assert out["twap"] == 100.0 and out["span_seconds"] == 10.0


def test_acf_report_known_values(spark):
    import pytest as _pytest

    from momyre_spark.operators.timeseries import acf_report

    # alternating series: acf(1) strongly negative, acf(2) positive
    alt = [("alt", t, 10 if t % 2 == 0 else 0) for t in range(8)]
    # linear ramp: acf(1) high positive
    ramp = [("ramp", t, t) for t in range(10)]
    # constant: zero variance -> dropped
    flat = [("flat", t, 7) for t in range(5)]
    df = spark.createDataFrame(
        alt + ramp + flat, "g string, t long, x long"
    )
    out = acf_report(df, ["g"], "t", "x", lags=(1, 2))
    got = {(r["g"], r["lag"]): r for r in out.collect()}
    assert ("flat", 1) not in got and ("flat", 2) not in got

    def ref_acf(xs, lag):
        n = len(xs)
        mean = sum(xs) / n
        num = sum(
            (xs[t] - mean) * (xs[t - lag] - mean) for t in range(lag, n)
        )
        den = sum((v - mean) ** 2 for v in xs)
        return num / den

    for g, xs in (("alt", [10, 0] * 4), ("ramp", list(range(10)))):
        for lag in (1, 2):
            assert got[(g, lag)]["acf"] == _pytest.approx(
                ref_acf(xs, lag), abs=1e-6
            ), (g, lag)
    assert got[("alt", 1)]["acf"] < -0.8
    assert got[("alt", 2)]["acf"] > 0.6
    assert got[("ramp", 1)]["acf"] > 0.5
    assert got[("ramp", 1)]["n_pairs"] == 9
    with _pytest.raises(ValueError):
        acf_report(df, ["g"], "t", "x", lags=(0,))


def test_seasonal_naive_error_known_values(spark):
    import pytest as _pytest

    from momyre_spark.operators.timeseries import seasonal_naive_error

    ramp = [("ramp", t, t + 1) for t in range(6)]  # 1..6, season 2
    withzero = [("z", 0, 0), ("z", 1, 2), ("z", 2, 0), ("z", 3, 4)]
    short = [("short", 0, 5)]
    df = spark.createDataFrame(
        ramp + withzero + short, "g string, t long, x long"
    )
    got = {r["g"]: r for r in
           seasonal_naive_error(df, ["g"], "t", "x", season=2).collect()}
    assert set(got) == {"ramp", "z"}  # short has no lag-2 pair
    r = got["ramp"]
    assert r["n"] == 6 and r["n_pairs"] == 4
    assert r["mae"] == 2.0 and r["bias"] == 2.0
    # APE terms: 2/3, 2/4, 2/5, 2/6 (6dp-rounded each)
    want = (0.666667 + 0.5 + 0.4 + 0.333333) / 4.0
    assert r["mape"] == _pytest.approx(want, abs=1e-6)
    z = got["z"]
    # pairs: x=0 (skipped for MAPE), x=4 -> |4-2|/4 = 0.5
    assert z["n_pairs"] == 2
    assert z["mae"] == _pytest.approx(1.0, abs=1e-6)  # |0-0|=0, |4-2|=2
    assert z["mape"] == _pytest.approx(0.5, abs=1e-6)
    with _pytest.raises(ValueError):
        seasonal_naive_error(df, ["g"], "t", "x", season=0)


def test_theil_sen_trend_known_values(spark):
    import pytest as _pytest

    from momyre_spark.operators.timeseries import theil_sen_trend

    def ref_slope(pts):
        slopes = sorted(
            (y2 - y1) / (x2 - x1)
            for i, (x1, y1) in enumerate(pts)
            for (x2, y2) in pts[i + 1:]
        )
        m = len(slopes)
        if m % 2:
            return slopes[m // 2]
        return (slopes[m // 2 - 1] + slopes[m // 2]) / 2.0

    line = [(x, 3 * x + 1) for x in range(5)]
    outlier = [(x, x if x != 3 else 100) for x in range(7)]
    pair = [(0, 5), (2, 9)]
    rows = ([("line", x, y) for x, y in line]
            + [("outlier", x, y) for x, y in outlier]
            + [("pair", x, y) for x, y in pair])
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r["g"]: r for r in theil_sen_trend(df, ["g"], "x", "y").collect()}
    assert got["line"]["slope"] == 3.0
    assert got["line"]["n_points"] == 5 and got["line"]["n_pairs"] == 10
    assert got["outlier"]["slope"] == _pytest.approx(
        ref_slope(outlier), abs=1e-6
    )
    assert abs(got["outlier"]["slope"] - 1.0) < 0.2  # robust to the spike
    assert got["pair"]["slope"] == 2.0
    with _pytest.raises(ValueError, match="max_points"):
        theil_sen_trend(df, ["g"], "x", "y", max_points=3)
    with _pytest.raises(ValueError):
        theil_sen_trend(df, [], "x", "y")


def test_weekday_seasonal_index_known_values(spark):
    import pytest as _pytest

    from momyre_spark.operators.timeseries import weekday_seasonal_index

    # epoch day 0 = Thursday -> weekday 3; day 4 = Monday -> weekday 0
    rows = [("g", 0, 10), ("g", 0, 30), ("g", 4, 20),
            ("zero", 0, 5), ("zero", 1, -5)]
    df = spark.createDataFrame(rows, "g string, day long, v long")
    got = {(r["g"], r["weekday"]): r
           for r in weekday_seasonal_index(df, ["g"], "day", "v").collect()}
    assert set(got) == {("g", 3), ("g", 0), ("zero", 3), ("zero", 4)}
    thu = got[("g", 3)]
    assert thu["n"] == 2 and thu["mean"] == 20.0
    # overall mean = 60/3 = 20 -> thursday index 1.0, monday 1.0
    assert thu["seasonal_index"] == _pytest.approx(1.0, abs=1e-6)
    assert got[("g", 0)]["seasonal_index"] == _pytest.approx(1.0, abs=1e-6)
    # zero-total group: mean reported, index NULL
    assert got[("zero", 3)]["seasonal_index"] is None
    assert got[("zero", 3)]["mean"] == 5.0
