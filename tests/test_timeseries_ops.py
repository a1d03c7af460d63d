

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
