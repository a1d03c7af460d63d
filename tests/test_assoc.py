"""Pairwise association rules (operators/assoc.py)."""

from __future__ import annotations

import pytest

from momyre_spark.operators.assoc import association_rules


def _baskets(spark):
    rows = (
        [("b1", i) for i in ("A", "B", "C")]
        + [("b2", i) for i in ("A", "B")]
        + [("b3", "A"), ("b3", "A")]  # dup item in basket counts once
        + [("b4", "B"), ("b4", "D"), ("b4", None)]
    )
    return spark.createDataFrame(rows, "bk string, item string")


def test_association_rules_known_counts(spark):
    df = _baskets(spark)
    got = {
        (r["item_a"], r["item_b"]): r
        for r in association_rules(df, ["bk"], "item").collect()
    }
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C"), ("B", "D")}
    ab = got[("A", "B")]
    assert ab["n_baskets"] == 4
    assert ab["cnt_a"] == 3 and ab["cnt_b"] == 3 and ab["cnt_ab"] == 2
    assert ab["support"] == pytest.approx(0.5, abs=1e-6)
    assert ab["conf_a_b"] == pytest.approx(2.0 / 3.0, abs=1e-6)
    assert ab["conf_b_a"] == pytest.approx(2.0 / 3.0, abs=1e-6)
    assert ab["lift"] == pytest.approx(8.0 / 9.0, abs=1e-6)
    bd = got[("B", "D")]
    assert bd["cnt_ab"] == 1 and bd["cnt_b"] == 1
    assert bd["lift"] == pytest.approx(4.0 / 3.0, abs=1e-6)


def test_association_rules_min_item_count_prunes(spark):
    df = _baskets(spark)
    got = {
        (r["item_a"], r["item_b"])
        for r in association_rules(
            df, ["bk"], "item", min_item_count=2
        ).collect()
    }
    assert got == {("A", "B")}


def test_association_rules_jumbo_basket_cap(spark):
    df = _baskets(spark)
    got = {
        (r["item_a"], r["item_b"]): r
        for r in association_rules(
            df, ["bk"], "item", max_basket_items=2
        ).collect()
    }
    # b1 (3 items) dropped entirely, including from n_baskets and counts
    assert set(got) == {("A", "B"), ("B", "D")}
    ab = got[("A", "B")]
    assert ab["n_baskets"] == 3
    assert ab["cnt_a"] == 2 and ab["cnt_b"] == 2 and ab["cnt_ab"] == 1


def test_association_rules_validation(spark):
    df = _baskets(spark)
    with pytest.raises(ValueError):
        association_rules(df, [], "item")
    with pytest.raises(ValueError):
        association_rules(df, ["bk"], "item", min_item_count=0)
