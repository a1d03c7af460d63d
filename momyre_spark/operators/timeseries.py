"""Time-series gap handling over keyed event streams.

The reference applies ops strictly in log order and keeps only latest state
(/root/reference/app/run.go:301-322); these operators add the time-series
views a warehouse builds NEXT TO that state: carrying the last known value
forward across gaps (sensor dropouts, sparse CDC columns) and bounding how
far a value may be carried.

Everything is a window composition over (key, order) — one shuffle on the
key, no UDFs, no state beyond the window frame.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def forward_fill(
    df: DataFrame,
    cols: Sequence[str],
    key: str = "_id",
    order: Sequence[str] = ("ts",),
) -> DataFrame:
    """Per-key forward fill: each NULL in ``cols`` takes the most recent
    non-null value earlier in ``order`` within its key (classic LOCF —
    last observation carried forward). Leading nulls stay null.

    ``last(col, ignorenulls=True)`` over a running frame — Spark evaluates
    the frame incrementally, so this is O(n) per key after ONE shuffle on
    the key, however long the gaps are.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def fill_with_max_age(
    df: DataFrame,
    col: str,
    key: str = "_id",
    ts_col: str = "ts",
    max_age: float | int = None,
) -> DataFrame:
    """Forward fill with a staleness bound: a carried value expires once the
    row's ``ts_col`` is more than ``max_age`` past the observation it came
    from (sensor feeds: a reading older than the freshness SLA is worse
    than NULL). ``max_age`` in the units of ``ts_col`` arithmetic.

    Same single-shuffle window shape as :func:`forward_fill`, carrying the
    (value, observed-at) pair and expiring at projection time.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs = F.when(
        F.col(col).isNotNull(), F.struct(F.col(ts_col).alias("at"), F.col(col).alias("v"))
    )
    carried = F.last(obs, ignorenulls=True).over(w)
    filled = F.when(
        carried.isNotNull()
        & (
            F.lit(True)
            if max_age is None
            else (F.col(ts_col) - carried["at"] <= F.lit(max_age))
        ),
        carried["v"],
    )
    return df.withColumn(col, filled)


def resample_locf(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Resample an irregular per-key event stream onto a regular
    ``step_seconds`` grid, carrying the last observation forward into empty
    buckets (the downsample-to-dashboard / align-sensors-to-a-grid op).

    Output: one row per (key, grid bucket) from each key's first to last
    observed bucket — ``(key, bucket_epoch: long, value)`` where
    ``bucket_epoch`` is the bucket start in epoch seconds (emitted as a
    LONG: engine-neutral, no timezone semantics; callers wanting a
    timestamp cast it back). Within a bucket the LAST event wins, ordered
    by (``ts_col``, *tiebreak*) — the same latest-wins rule the CDC applier
    uses (reference run.go:301-322 keeps only latest state per key).

    Scale shape: ONE scan of the raw data feeding one hash aggregation per
    (key, bucket) — the data-proportional part, with map-side partial
    aggregation. The grid is then *generated*, not joined from a calendar
    table, and the carry is fused into the generation: each observed
    bucket looks at the NEXT observed bucket in its key (``lead`` over the
    already-aggregated rows) and explodes ``sequence(bucket, next-step,
    step)`` carrying its own value — LOCF without a join back and without
    a second consumption of the aggregate (which Spark would plan as a
    second scan of the source). Post-aggregation rows are
    buckets-cardinality, so the window exchange is small.
    """
    epoch = F.col(ts_col).cast("long")
    bucket = (F.floor(epoch / F.lit(step_seconds)) * step_seconds).cast("long")
    order = F.struct(
        F.col(ts_col), *[F.col(c) for c in tiebreak]
    )
    per_bucket = (
        df.withColumn("bucket_epoch", bucket)
        .groupBy(key, "bucket_epoch")
        .agg(F.max_by(F.col(value_col), order).alias("__last"))
    )
    w = Window.partitionBy(key).orderBy("bucket_epoch")
    step = F.lit(step_seconds).cast("long")
    run_end = F.coalesce(
        F.lead("bucket_epoch").over(w) - step, F.col("bucket_epoch")
    )
    return per_bucket.withColumn("__end", run_end).select(
        key,
        F.explode(
            F.sequence(F.col("bucket_epoch"), F.col("__end"), step)
        ).alias("bucket_epoch"),
        F.col("__last").alias(value_col),
    )


def interpolate_linear(
    df: DataFrame,
    key: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Fill NULL ``value_col`` gaps per key by linear interpolation between
    the nearest non-null observations on either side (the numeric cousin of
    LOCF — sensor calibration, gap repair before feature extraction).
    Leading/trailing gaps (no observation on one side) stay NULL.

    Two windows over the SAME (key, order) partitioning — before/after
    carries of the (order, value) pair — so the whole op is one shuffle;
    the blend is a pure arithmetic projection.
    """
    ord_c = F.col(order_col).cast("double")
    obs = F.when(
        F.col(value_col).isNotNull(),
        F.struct(ord_c.alias("at"), F.col(value_col).cast("double").alias("v")),
    )
    wb = (
        Window.partitionBy(key)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wa = (
        Window.partitionBy(key)
        .orderBy(order_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev = F.last(obs, ignorenulls=True).over(wb)
    nxt = F.first(obs, ignorenulls=True).over(wa)
    span = nxt["at"] - prev["at"]
    frac = F.when(span == 0, F.lit(0.0)).otherwise((ord_c - prev["at"]) / span)
    blended = prev["v"] + frac * (nxt["v"] - prev["v"])
    filled = (
        F.when(F.col(value_col).isNotNull(), F.col(value_col).cast("double"))
        .when(prev.isNotNull() & nxt.isNotNull(), blended)
    )
    return df.withColumn(value_col, filled)


def ewma_bounded(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.3,
    lookback: int = 8,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially weighted moving average with a BOUNDED lookback:
    ewma_t = sum_{i<K} (1-a)^i * x_{t-i} / sum_{i<K, present} (1-a)^i —
    the smoothing signal next to `rolling` z-scores, truncated at K lags
    so it is a fixed window expression instead of an unbounded recurrence
    (the infinite-memory EWMA is inherently sequential; truncation error
    is (1-a)^K, under 6% of the weight at the defaults and shrinking
    geometrically). Early rows renormalize over the lags that exist, so
    the series starts at x_0, not at a damped artifact.

    NULL values act as missing observations: their term contributes
    nothing and the denominator renormalizes over the lags present, so a
    gap damps the smoothing window rather than poisoning it with NULL.

    Determinism: the weights are Python float literals shared with any
    SQL mirror, and both numerator and denominator are FIXED-ORDER chains
    of +/* — the same IEEE sequence in every engine and under any
    partitioning (one shuffle on the key, a window, no aggregation whose
    order could float)."""
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(
        *[F.col(c) for c in order_cols]
    )
    v = F.col(value_col).cast("double")
    num = None
    den = None
    for i in range(lookback):
        coeff = float((1.0 - alpha) ** i)
        x_i = v if i == 0 else F.lag(v, i).over(w)
        term = F.when(x_i.isNotNull(), x_i * F.lit(coeff)).otherwise(F.lit(0.0))
        dterm = F.when(x_i.isNotNull(), F.lit(coeff)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = dterm if den is None else den + dterm
    # a row whose value and every lookback lag are NULL has nothing to
    # smooth: emit NULL, not 0.0/0.0 = NaN (NaN sorts above every value)
    return df.withColumn(out_col, F.when(den > 0, num / den))


def cusum_changepoints(
    df: DataFrame,
    value_col: str,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    allowance: float,
    threshold: float,
    target: float | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Two-sided CUSUM change detection per key: appends ``cusum_pos`` /
    ``cusum_neg`` (the one-sided cumulative-sum statistics) and
    ``is_change`` (either side above ``threshold``). The standard
    sequential drift detector — an EWMA/zscore flags single outliers, a
    CUSUM accumulates SMALL persistent shifts (a metric that drifted 2%
    and stayed there), which is the corpus-monitoring failure mode
    batch-level stats miss.

    ``target`` is the in-control level (per-key mean when None),
    ``allowance`` the slack per observation (drift smaller than this is
    ignored), both in value units. Recurrences
    ``S+ = max(0, S+ + (x - target - allowance))`` and
    ``S- = max(0, S- + (target - allowance - x))`` are NOT window
    primitives, but reduce to one: ``S_i = P_i - min(0, min_{j<=i} P_j)``
    where ``P`` is the plain running sum of the increments — so the whole
    detector is ONE shuffle on the key and four running-frame window
    expressions, no UDF, no iteration.

    Determinism contract (the house integer-units recipe): values are
    fixed to integer ``1/scale`` units via ``floor(x*scale+0.5)`` first,
    so every running sum is exact integer arithmetic — bit-identical
    under any partitioning and across engines. Keep
    ``|x|*scale*rows_per_key < 2^53`` (at the default micro-units: ~9e9
    value-rows per key — coarsen ``scale`` for hotter keys). Rows with a
    NULL value carry no evidence and are DROPPED (visible in the row
    count, never silently zero-filled).
    """
    if not key_cols or not order_cols:
        raise ValueError("momyre: key_cols and order_cols must be non-empty")
    if allowance < 0 or threshold <= 0:
        raise ValueError(
            "momyre: allowance must be >= 0 and threshold > 0"
        )
    import math

    keys = [F.col(c) for c in key_cols]
    orders = [F.col(c) for c in order_cols]
    k_units = int(math.floor(allowance * scale + 0.5))
    h_units = int(math.floor(threshold * scale + 0.5))

    out = df.filter(F.col(value_col).isNotNull()).withColumn(
        "__u",
        F.floor(
            F.col(value_col).cast("double") * F.lit(float(scale)) + F.lit(0.5)
        ).cast("bigint"),
    )
    if target is None:
        # in-control level = per-key mean, as a full-frame window agg so
        # the detector stays ONE shuffle (no groupBy+join round trip);
        # floor(sum/count + 0.5) on exactly-converted integers < 2^53
        wk = Window.partitionBy(*keys)
        mu = F.floor(
            F.sum("__u").over(wk).cast("double")
            / F.count(F.lit(1)).over(wk).cast("double")
            + F.lit(0.5)
        ).cast("bigint")
    else:
        mu = F.lit(int(math.floor(target * scale + 0.5))).cast("bigint")
    w = (
        Window.partitionBy(*keys)
        .orderBy(*orders)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        out.withColumn("__mu", mu)
        .withColumn(
            "__pp",
            F.sum(F.col("__u") - F.col("__mu") - F.lit(k_units)).over(w),
        )
        .withColumn(
            "__qq",
            F.sum(F.col("__mu") - F.lit(k_units) - F.col("__u")).over(w),
        )
        .withColumn(
            "__sp",
            F.col("__pp")
            - F.least(F.lit(0).cast("bigint"), F.min("__pp").over(w)),
        )
        .withColumn(
            "__sn",
            F.col("__qq")
            - F.least(F.lit(0).cast("bigint"), F.min("__qq").over(w)),
        )
    )
    return (
        out.withColumn(
            "cusum_pos", F.col("__sp").cast("double") / F.lit(float(scale))
        )
        .withColumn(
            "cusum_neg", F.col("__sn").cast("double") / F.lit(float(scale))
        )
        .withColumn(
            "is_change",
            (F.col("__sp") > F.lit(h_units)) | (F.col("__sn") > F.lit(h_units)),
        )
        .drop("__u", "__mu", "__pp", "__qq", "__sp", "__sn")
    )


def ohlc_bars(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    bucket_seconds: int,
    tiebreak_cols: Sequence[str],
) -> DataFrame:
    """Open/high/low/close resampling: per key and fixed time bucket,
    ``(keys, bucket_start, open, high, low, close, n, volume)`` — the
    standard downsampled view of a high-frequency metric (first/last
    need ORDER, which plain groupBy aggregation cannot see; this is the
    canonical window+agg composition for it).

    ``open``/``close`` are the first/last values in ``(ts, *tiebreaks)``
    order — the tiebreak makes them a function of the data, not of row
    arrival (required; same contract as ``calibrate_scores``). ``high``/
    ``low``/``volume`` are order-free. ``volume`` is the exact
    centi-unit sum of values, reported in value units.

    Shape: one shuffle on (key, bucket): the rank window and the final
    aggregation share the same hash partitioning, so Catalyst plans a
    single Exchange. Values pass through untouched (no float
    arithmetic), so the whole frame value-hashes.
    """
    if not tiebreak_cols:
        raise ValueError("momyre: tiebreak_cols must be non-empty")
    keys = [F.col(c) for c in key_cols]
    bucket = (
        F.expr(f"unix_micros({ts_col})")
        / F.lit(bucket_seconds * 1_000_000)
    )
    base = df.filter(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    ).withColumn("__b", F.floor(bucket).cast("bigint"))
    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak_cols]
    wf = Window.partitionBy(*keys, F.col("__b")).orderBy(*order)
    wl = Window.partitionBy(*keys, F.col("__b")).orderBy(
        *[o.desc() for o in order]
    )
    v = F.col(value_col)
    cu = F.floor(v.cast("double") * F.lit(100.0) + F.lit(0.5)).cast(
        "bigint"
    )
    return (
        base.withColumn("__rf", F.row_number().over(wf))
        .withColumn("__rl", F.row_number().over(wl))
        .groupBy(*keys, F.col("__b").alias("bucket_start"))
        .agg(
            F.max(F.when(F.col("__rf") == 1, v)).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max(F.when(F.col("__rl") == 1, v)).alias("close"),
            F.count(F.lit(1)).alias("n"),
            (F.sum(cu).cast("double") / F.lit(100.0)).alias("volume"),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-key time-weighted average: ``(keys, n, span_seconds, twap)``
    where each value is weighted by how LONG it held (until the next
    observation) — the correct mean for irregularly-sampled state
    (config values, prices, gauge metrics), where the row-mean
    over-weights chatty periods.

    Step-function (LOCF) semantics over ``[t_0, t_n]``: the last
    observation closes the span with weight 0. Keys with fewer than 2
    observations have no span and are dropped (visible, never a
    fabricated row-mean).

    Determinism: durations are exact integer microseconds (one lead
    window), values fix to exact centi-units; each duration*value
    product is exact DECIMAL(38,0) arithmetic and their sum is exact,
    leaving ONE mirrored float division chain. Equal timestamps need
    ``tiebreak_cols`` to pair deterministically: the step function reads
    "the later row in tiebreak order supersedes instantly" (the earlier
    one holds for zero time) — WITHOUT a tiebreak, which of two
    different values gets the following interval's duration depends on
    arrival order, so pass one whenever timestamps can tie.
    Shape: one key shuffle (window + agg co-partitioned).
    """
    keys = [F.col(c) for c in key_cols]
    base = df.filter(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    ).withColumn("__t", F.expr(f"unix_micros({ts_col})"))
    w = Window.partitionBy(*keys).orderBy(
        F.col("__t"), *[F.col(c) for c in tiebreak_cols]
    )
    cu = F.floor(
        F.col(value_col).cast("double") * F.lit(100.0) + F.lit(0.5)
    ).cast("bigint")
    out = (
        base.withColumn("__next", F.lead("__t").over(w))
        .withColumn(
            "__dur", F.coalesce(F.col("__next") - F.col("__t"), F.lit(0))
        )
        .withColumn(
            "__wv",
            (cu.cast("decimal(38,0)") * F.col("__dur").cast("decimal(38,0)")),
        )
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__dur").alias("__span"),
            F.sum("__wv").alias("__num"),
        )
        .filter(F.col("__span") > 0)
    )
    twap = (
        F.col("__num").cast("double")
        / F.col("__span").cast("double")
        / F.lit(100.0)
    )
    from momyre_spark.functions.numeric import round_half_up

    return out.select(
        *key_cols,
        "n",
        (F.col("__span").cast("double") / F.lit(1_000_000.0)).alias(
            "span_seconds"
        ),
        round_half_up(twap, 6).alias("twap"),
    )


def acf_report(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str,
    lags: Sequence[int] = (1, 2, 3),
    digits: int = 6,
) -> DataFrame:
    """Per-group sample autocorrelation of integer-valued ``value_col`` at
    each requested lag — the seasonality/persistence readout ("does
    yesterday's volume predict today's?") for a keyed series:

        r_l = sum_{t>l} (x_t - mean)(x_{t-l} - mean) / sum_t (x_t - mean)^2

    the standard estimator (global mean and global denominator, so
    ``r_0 = 1`` and ``|r_l| <= 1``). Lags are in OBSERVATION steps along
    ``order_col``'s sort order — resample to a regular grid first
    (``resample_locf``) when calendar-lag semantics are required across
    gaps.

    Shape: ONE window sort per group producing all lag columns in the
    same pass, then one hash aggregation per group carrying the 3+2L
    moment sums; output is |groups| x |lags| rows via an inline stack —
    no per-lag rescan.

    Determinism: ``value_col`` must already be integer-valued (fix floats
    to units upstream, e.g. ``floor(x*100+0.5)``); expanding the estimator
    around the exact rational mean ``S/n`` gives numerator
    ``n^2*Sxy - n*S*(Sa+Sb) + m*S^2`` and denominator ``n*(n*Sxx - S^2)``
    — every term an exact BIGINT product (keep
    ``n^2 * max|x|^2 * n < 2^63``; ANSI raises on overflow), and the
    single final division is one mirrored float op rounded at ``digits``.
    Groups with zero variance or fewer than ``lag+1`` rows drop that
    lag's row visibly, never NULL-fill.
    """
    from momyre_spark.functions.numeric import round_half_up

    if not group_cols:
        raise ValueError("momyre: group_cols must be non-empty")
    if not lags or any(int(ll) < 1 for ll in lags):
        raise ValueError("momyre: lags must be positive")
    lags = [int(ll) for ll in lags]
    x = F.col(value_col).cast("bigint")
    base = df.filter(
        F.col(order_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(*group_cols, F.col(order_col).alias("__t"), x.alias("__x"))
    w = Window.partitionBy(*group_cols).orderBy("__t")
    lagged = base
    for ll in lags:
        lagged = lagged.withColumn(f"__x{ll}", F.lag("__x", ll).over(w))
    aggs = [
        F.count(F.lit(1)).alias("__n"),
        F.sum("__x").alias("__s"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
    ]
    for ll in lags:
        pair = F.col(f"__x{ll}").isNotNull()
        aggs += [
            F.sum(F.when(pair, 1).otherwise(0)).alias(f"__m{ll}"),
            F.sum(F.when(pair, F.col("__x") * F.col(f"__x{ll}"))).alias(
                f"__sxy{ll}"
            ),
            F.sum(F.when(pair, F.col("__x"))).alias(f"__sa{ll}"),
            F.sum(F.when(pair, F.col(f"__x{ll}"))).alias(f"__sb{ll}"),
        ]
    agg = lagged.groupBy(*group_cols).agg(*aggs)
    n = F.col("__n")
    s = F.col("__s")
    den = n * (n * F.col("__sxx") - s * s)
    rows = []
    for ll in lags:
        num = (
            n * n * F.col(f"__sxy{ll}")
            - n * s * (F.col(f"__sa{ll}") + F.col(f"__sb{ll}"))
            + F.col(f"__m{ll}") * s * s
        )
        rows.append(
            F.struct(
                F.lit(ll).alias("lag"),
                F.col(f"__m{ll}").alias("n_pairs"),
                F.when(
                    (den != 0) & (F.col(f"__m{ll}") >= 1),
                    round_half_up(
                        num.cast("double") / den.cast("double"), digits
                    ),
                ).alias("acf"),
            )
        )
    out = agg.select(
        *group_cols,
        n.alias("n"),
        F.explode(F.array(*rows)).alias("__r"),
    )
    return out.select(
        *group_cols,
        "n",
        F.col("__r.lag").alias("lag"),
        F.col("__r.n_pairs").alias("n_pairs"),
        F.col("__r.acf").alias("acf"),
    ).filter(F.col("acf").isNotNull())


def seasonal_naive_error(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str,
    season: int = 7,
    digits: int = 6,
) -> DataFrame:
    """Per-group forecast-baseline error of the SEASONAL NAIVE predictor
    (forecast ``x_t = x_{t-season}``) — the floor any real forecasting
    model must beat, and by itself the cheapest seasonality-strength
    readout (low error = strongly weekly-periodic series):
    ``(group, n, n_pairs, mae, bias, mape)`` where bias is the mean
    signed error (forecast drift direction) and MAPE skips zero actuals
    (reported over ``n_pairs`` nonzero pairs only — visible via the
    count, never a fabricated 0).

    Lags are OBSERVATION steps along ``order_col`` (resample to a
    regular grid first for calendar semantics across gaps — the
    acf_report contract).

    Shape: ONE window sort per group + one hash agg.

    Determinism: ``value_col`` must be integer-valued (fix floats to
    units upstream); MAE/bias are exact BIGINT sums with one mirrored
    final division; each MAPE term ``|e|/|x|`` is rounded at ``digits``
    and fixed to DECIMAL(38,6) before the exact sum, then one mirrored
    division by the pair count (the chi2/PSI recipe).
    """
    from momyre_spark.functions.numeric import round_half_up

    if not group_cols:
        raise ValueError("momyre: group_cols must be non-empty")
    if season < 1:
        raise ValueError("momyre: season must be >= 1")
    x = F.col(value_col).cast("bigint")
    base = df.filter(
        F.col(order_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(*group_cols, F.col(order_col).alias("__t"), x.alias("__x"))
    w = Window.partitionBy(*group_cols).orderBy("__t")
    lagged = base.withColumn("__f", F.lag("__x", season).over(w))
    err = F.col("__x") - F.col("__f")
    pair = F.col("__f").isNotNull()
    nz = pair & (F.col("__x") != 0)
    ape = F.abs(err).cast("double") / F.abs(F.col("__x")).cast("double")
    agg = lagged.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.when(pair, 1).otherwise(0)).alias("__m"),
        F.sum(F.when(pair, F.abs(err))).alias("__sae"),
        F.sum(F.when(pair, err)).alias("__se"),
        F.sum(F.when(nz, 1).otherwise(0)).alias("__mnz"),
        F.sum(
            F.when(
                nz,
                round_half_up(ape, digits).cast("decimal(38,6)"),
            )
        ).alias("__sape"),
    )
    md = F.col("__m").cast("double")
    return agg.filter(F.col("__m") >= 1).select(
        *group_cols,
        F.col("__n").alias("n"),
        F.col("__m").alias("n_pairs"),
        round_half_up(F.col("__sae").cast("double") / md, digits).alias(
            "mae"
        ),
        round_half_up(F.col("__se").cast("double") / md, digits).alias(
            "bias"
        ),
        F.when(
            F.col("__mnz") >= 1,
            round_half_up(
                F.col("__sape").cast("double")
                / F.col("__mnz").cast("double"),
                digits,
            ),
        ).alias("mape"),
    )


def theil_sen_trend(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    max_points: int = 2000,
    digits: int = 6,
) -> DataFrame:
    """Per-group Theil-Sen robust trend: the MEDIAN of all pairwise
    slopes ``(y_j - y_i) / (x_j - x_i)`` over ``x_i < x_j`` — the slope
    estimate with a 29% breakdown point (one broken day cannot bend it,
    unlike OLS; the trend twin of stats_mad_outliers), as
    ``(*group_cols, n_points, n_pairs, slope)``.

    INPUT CONTRACT: a pre-aggregated series — one row per (group, x) on
    a bounded grid (days, batch indexes), integer x and y. The pair
    join is quadratic in the GRID (n_points^2 / 2 pairs per group),
    which is exactly why the operator demands grid input: a year of
    daily points is ~66k pairs, nothing, at any corpus size. A
    limit-probe guard fail-stops when any group exceeds ``max_points``
    (cost O(cap) IO, never a full count) rather than silently launching
    a quadratic job over raw rows.

    Determinism: slope doubles come from exact integer differences via
    one mirrored division; the median is position-based (middle one or
    mean of the middle two), and duplicate slope values make the
    tie-order irrelevant by value. Zero x-gaps cannot occur (grid rows
    are distinct x). Rounded at ``digits``.
    """
    from momyre_spark.functions.numeric import round_half_up

    if not group_cols:
        raise ValueError("momyre: group_cols must be non-empty")
    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        *group_cols,
        F.col(x_col).cast("bigint").alias("__x"),
        F.col(y_col).cast("bigint").alias("__y"),
    )
    probe = (
        base.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("__np"))
        .filter(F.col("__np") > max_points)
        .limit(1)
        .take(1)
    )
    if probe:
        raise ValueError(
            "momyre: theil_sen_trend input exceeds max_points="
            f"{max_points} for group {probe[0]} — pre-aggregate to a"
            " bounded grid (daily means) before calling"
        )
    a = base.select(
        *group_cols, F.col("__x").alias("__xa"), F.col("__y").alias("__ya")
    )
    b = base.select(
        *group_cols, F.col("__x").alias("__xb"), F.col("__y").alias("__yb")
    )
    pairs = a.join(b, list(group_cols)).filter(
        F.col("__xa") < F.col("__xb")
    )
    slope = (F.col("__yb") - F.col("__ya")).cast("double") / (
        F.col("__xb") - F.col("__xa")
    ).cast("double")
    sl = pairs.select(*group_cols, slope.alias("__s"))
    w = Window.partitionBy(*group_cols).orderBy("__s")
    wall = Window.partitionBy(*group_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = sl.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__m", F.count(F.lit(1)).over(wall)
    )
    lo = F.floor((F.col("__m") + 1) / 2)
    hi = F.floor(F.col("__m") / 2) + 1
    mid = ranked.filter(
        (F.col("__rn") == lo) | (F.col("__rn") == hi)
    )
    npoints = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_points")
    )
    agg = mid.groupBy(*group_cols).agg(
        F.max("__m").alias("__m"),
        (F.sum("__s") / F.count(F.lit(1))).alias("__med"),
    )
    return (
        agg.join(npoints, list(group_cols))
        .select(
            *group_cols,
            F.col("n_points"),
            F.col("__m").alias("n_pairs"),
            round_half_up(F.col("__med"), digits).alias("slope"),
        )
    )


def weekday_seasonal_index(
    df: DataFrame,
    group_cols: Sequence[str],
    day_col: str,
    value_col: str,
    digits: int = 6,
) -> DataFrame:
    """Per-group weekday seasonal indices: each weekday's mean value as
    a ratio to the group's overall mean (1.0 = no weekly effect) — the
    cheapest seasonality profile, and the deseasonalizer input for any
    weekly-periodic metric. Output: ``(*group_cols, weekday, n, mean,
    seasonal_index)`` with ``weekday`` 0=Monday..6=Sunday derived by pure integer
    arithmetic from the epoch day (``(day + 3) mod 7`` — 1970-01-01 was
    a Thursday; no timezone/calendar functions, engine-exact).

    INPUT CONTRACT: integer epoch-day ``day_col``, integer-valued
    ``value_col`` (fix floats to units upstream).

    Shape: one (group, weekday) hash agg + full-frame window totals over
    the <= 7 rows per group. Exact BIGINT sums; the index is the exact
    cross-multiplied ratio ``(sw * N) / (nw * S)`` in one mirrored
    division (keep ``sum|v| * rows < 2^63``), rounded at ``digits``.
    Groups with zero total sum report NULL index (mean ratio of a zero
    baseline is undefined), never a fabricated value.
    """
    from momyre_spark.functions.numeric import round_half_up

    if not group_cols:
        raise ValueError("momyre: group_cols must be non-empty")
    base = df.filter(
        F.col(day_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        *group_cols,
        F.pmod(F.col(day_col).cast("bigint") + F.lit(3), F.lit(7)).alias(
            "__wd"
        ),
        F.col(value_col).cast("bigint").alias("__v"),
    )
    per = base.groupBy(*group_cols, F.col("__wd")).agg(
        F.count(F.lit(1)).alias("__nw"), F.sum("__v").alias("__sw")
    )
    wall = Window.partitionBy(*group_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tot = per.withColumn("__n", F.sum("__nw").over(wall)).withColumn(
        "__s", F.sum("__sw").over(wall)
    )
    mean = F.col("__sw").cast("double") / F.col("__nw").cast("double")
    index = F.when(
        F.col("__s") != 0,
        (F.col("__sw") * F.col("__n")).cast("double")
        / (F.col("__nw") * F.col("__s")).cast("double"),
    )
    return tot.select(
        *group_cols,
        F.col("__wd").alias("weekday"),
        F.col("__nw").alias("n"),
        round_half_up(mean, digits).alias("mean"),
        round_half_up(index, digits).alias("seasonal_index"),
    )
