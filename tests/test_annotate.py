"""Annotation QA (operators/annotate.py): majority vote with
deterministic tie-break, per-item pair agreement, Fleiss kappa on a
hand-computed table, constant-rater fail-stop."""

from __future__ import annotations

import pytest

from momyre_spark.operators.annotate import fleiss_kappa, majority_labels


def _ann(spark, rows):
    return spark.createDataFrame(rows, "item long, label string")


def test_majority_vote_ties_and_agreement(spark):
    df = _ann(spark, [
        (1, "a"), (1, "a"), (1, "a"),              # unanimous
        (2, "b"), (2, "a"), (2, "b"),              # 2-1
        (3, "c"), (3, "a"), (3, "b"),              # all distinct
        (4, "b"), (4, "a"),                        # 1-1 tie -> smallest
        (5, "a"),                                  # single vote
        (6, None), (6, "b"), (6, "b"),             # NULL dropped
    ])
    got = {r["item"]: r for r in majority_labels(df, "item", "label").collect()}
    assert got[1]["majority_label"] == "a" and got[1]["agreement"] == 1.0
    assert got[2]["majority_label"] == "b"
    assert got[2]["agreement"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[3]["agreement"] == 0.0
    assert got[4]["majority_label"] == "a" and got[4]["majority_votes"] == 1
    assert got[5]["n_votes"] == 1 and got[5]["agreement"] is None
    assert got[6]["n_votes"] == 2 and got[6]["majority_label"] == "b"


def test_fleiss_kappa_hand_computed(spark):
    # items: [a,a,a], [a,a,b], [a,b,c] -> p_bar = 4/9,
    # totals a=6,b=2,c=1 of N=9 -> p_e = 41/81, kappa = -0.125
    df = _ann(spark, [
        (1, "a"), (1, "a"), (1, "a"),
        (2, "a"), (2, "a"), (2, "b"),
        (3, "a"), (3, "b"), (3, "c"),
    ])
    r = fleiss_kappa(df, "item", "label").collect()[0]
    assert r["n_items"] == 3 and r["n_raters"] == 3
    assert r["p_bar"] == pytest.approx(4 / 9, abs=1e-6)
    assert r["p_e"] == pytest.approx(41 / 81, abs=1e-6)
    assert r["kappa"] == pytest.approx(-0.125, abs=1e-6)


def test_fleiss_kappa_failstops_on_varying_raters(spark):

    df = _ann(spark, [(1, "a"), (1, "b"), (2, "a")])
    with pytest.raises(Exception, match="constant rater count"):
        fleiss_kappa(df, "item", "label").collect()
