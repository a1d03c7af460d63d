"""Property-based checks for the time-series operators: resample_locf and
interpolate_linear must match plain-Python references on arbitrary keyed
series (hypothesis drives sizes, gaps, duplicates, and value patterns)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


def series():
    event = st.tuples(
        st.integers(min_value=0, max_value=500),     # ts seconds
        st.floats(min_value=-100, max_value=100, allow_nan=False),
    )
    return st.lists(event, min_size=1, max_size=40)


def _py_resample_locf(rows, step):
    # rows: [(ts, v)] one key; latest (ts, idx) wins per bucket, LOCF between
    buckets = {}
    for idx, (ts, v) in enumerate(rows):
        b = (ts // step) * step
        cur = buckets.get(b)
        if cur is None or (ts, idx) > cur[0]:
            buckets[b] = ((ts, idx), v)
    lo, hi = min(buckets), max(buckets)
    out, last = {}, None
    for b in range(lo, hi + 1, step):
        if b in buckets:
            last = buckets[b][1]
        out[b] = last
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=series(), step=st.sampled_from([7, 60]))
def test_resample_locf_matches_python_reference(spark, rows, step):
    from momyre_spark.operators.timeseries import resample_locf

    df = spark.createDataFrame(
        [("k", ts, v, i) for i, (ts, v) in enumerate(rows)],
        "k string, epoch bigint, v double, id bigint",
    ).withColumn("ts", F.timestamp_seconds(F.col("epoch")))
    out = resample_locf(df, key="k", ts_col="ts", value_col="v",
                        step_seconds=step, tiebreak=("id",))
    got = {r["bucket_epoch"]: r["v"] for r in out.collect()}
    assert got == _py_resample_locf(rows, step)


def _py_interp(xs, vs):
    obs = [(x, v) for x, v in zip(xs, vs) if v is not None]
    out = []
    for x, v in zip(xs, vs):
        if v is not None:
            out.append(float(v))
            continue
        prev = max(((a, b) for a, b in obs if a <= x), default=None)
        nxt = min(((a, b) for a, b in obs if a >= x), default=None)
        if prev is None or nxt is None:
            out.append(None)
        elif nxt[0] == prev[0]:
            out.append(float(prev[1]))
        else:
            f = (x - prev[0]) / (nxt[0] - prev[0])
            out.append(prev[1] + f * (nxt[1] - prev[1]))
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.lists(
    st.tuples(st.floats(min_value=0, max_value=1000, allow_nan=False),
              st.one_of(st.none(),
                        st.floats(min_value=-50, max_value=50, allow_nan=False))),
    min_size=1, max_size=40,
    unique_by=lambda t: t[0],
))
def test_interpolate_linear_matches_python_reference(spark, data):
    from momyre_spark.operators.timeseries import interpolate_linear

    data = sorted(data)
    xs = [x for x, _ in data]
    vs = [v for _, v in data]
    df = spark.createDataFrame(
        [("k", x, v) for x, v in data], "k string, x double, v double"
    )
    out = interpolate_linear(df, key="k", order_col="x", value_col="v")
    got = {r["x"]: r["v"] for r in out.collect()}
    for x, want in zip(xs, _py_interp(xs, vs)):
        g = got[x]
        if want is None:
            assert g is None
        else:
            assert g is not None and math.isclose(g, want, rel_tol=1e-9, abs_tol=1e-9)


# --------------------------------------------------- duplicate spans -----
def _py_duplicate_spans(texts, span=4, density=2):
    """Plain-Python mirror of operators/dedup.duplicate_spans(hash_fn='md5')."""
    import hashlib

    def h60(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)

    per_doc = {}
    for doc_id, text in texts:
        toks = text.lower().split()
        spans = set()
        for i in range(len(toks) - span + 1):
            if h60(toks[i]) % density == 0:
                spans.add(hashlib.md5(" ".join(toks[i : i + span]).encode()).hexdigest())
        per_doc[doc_id] = spans
    counts = {}
    for s in (x for v in per_doc.values() for x in v):
        counts[s] = counts.get(s, 0) + 1
    return {
        d: (len(v), sum(1 for s in v if counts[s] >= 2))
        for d, v in per_doc.items()
    }


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(
    st.lists(st.sampled_from("aa bb cc dd ee ff gg hh".split()),
             min_size=0, max_size=20).map(" ".join),
    min_size=1, max_size=12,
))
def test_duplicate_spans_matches_python_reference(spark, docs):
    from momyre_spark.operators.dedup import duplicate_spans

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_spans"], r["n_shared"])
        for r in duplicate_spans(
            df, span_tokens=4, anchor_density=2, hash_fn="md5"
        ).collect()
    }
    assert got == _py_duplicate_spans(rows, span=4, density=2)


# ---------------------------------------------------- heavy hitters ------
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    counts=st.lists(st.integers(min_value=1, max_value=60),
                    min_size=1, max_size=25),
    support=st.sampled_from([0.05, 0.1, 0.25]),
    parts=st.sampled_from([1, 3, 7]),
)
def test_frequent_items_always_equals_exhaustive(spark, counts, support, parts):
    """The Misra-Gries candidate pass must never lose a true heavy hitter,
    whatever the frequency profile, support level, or partitioning."""
    import math

    from momyre_spark.operators.heavyhitters import frequent_items

    rows = [(f"v{i}",) for i, c in enumerate(counts) for _ in range(c)]
    df = spark.createDataFrame(rows, "item string").repartition(parts)
    got = {(r["item"], r["cnt"]) for r in
           frequent_items(df, "item", support=support).collect()}
    total = sum(counts)
    want = {
        (f"v{i}", c)
        for i, c in enumerate(counts)
        if c >= math.ceil(support * total)
    }
    assert got == want
