"""Every registered query with an oracle must hash-match DuckDB at sf0.01.

This is a local mirror of the driver's t2 gate (CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import pytest

import momyre_spark.plans as plans
from tests.conftest import SF_CORRECT
from tests.oracle_compare import compare

plans.load_all()


def _oracle_names():
    return sorted(plans.ORACLES)


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(spark, duck, name):
    sdf = plans.QUERIES[name](spark, SF_CORRECT).toPandas()
    ddf = duck.execute(plans.ORACLES[name]).fetchdf()
    ok, msg = compare(sdf, ddf)
    assert ok, f"{name}: {msg}\nspark:\n{sdf.head(5)}\nduck:\n{ddf.head(5)}"


def test_all_queries_return_rows_or_schema(spark):
    # queries without an oracle still must run and have a stable schema
    for name, fn in plans.QUERIES.items():
        df = fn(spark, SF_CORRECT)
        assert df.columns, name
