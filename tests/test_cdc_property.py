"""Property-based CDC merge testing: for ANY op sequence, the distributed
single-pass merge must equal the sequential reference applier — hypothesis
explores op-order/shape combinations the handwritten fixtures don't."""

from __future__ import annotations

import pytest

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from momyre_spark.operators.cdc import apply_ops
from tests.cdc_fixture import FIELDS, OPS_SCHEMA, sequential_apply

KEYS = ["k1", "k2", "k3"]

_value = st.one_of(st.none(), st.text(alphabet="abcxyz", min_size=1, max_size=4))
_payload_update = st.dictionaries(
    st.sampled_from(FIELDS + ["undeclared"]), _value, max_size=3
)
_payload_insert = st.dictionaries(st.sampled_from(FIELDS), _value, max_size=3)


@st.composite
def _op(draw, ts):
    kind = draw(st.sampled_from(["insert", "update", "delete"]))
    payload = {}
    if kind == "insert":
        payload = draw(_payload_insert)
    elif kind == "update":
        payload = draw(_payload_update)
    return {
        "ts": ts,
        "ns": "users",
        "op": kind,
        "_id": draw(st.sampled_from(KEYS)),
        "payload": payload,
    }


@st.composite
def op_logs(draw):
    n = draw(st.integers(min_value=1, max_value=14))
    return [draw(_op(ts)) for ts in range(1, n + 1)]


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=op_logs())
@pytest.mark.slow
def test_apply_ops_equals_sequential_for_any_log(spark, ops):
    df = spark.createDataFrame(
        [(o["ts"], o["ns"], o["op"], o["_id"], json.dumps(o["payload"])) for o in ops],
        OPS_SCHEMA,
    )
    got_rows = apply_ops(
        df, {f: "string" for f in FIELDS}, key="_id", order=("ts",)
    ).collect()
    got = {r["_id"]: {f: r[f] for f in FIELDS} for r in got_rows}

    want = sequential_apply(
        [
            {**o, "payload": {k: v for k, v in o["payload"].items()}}
            for o in ops
        ]
    )
    assert got == want
