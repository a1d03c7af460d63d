"""Record linkage (operators/linkage.py): blocking recall contract and
exact verify."""

from __future__ import annotations

from pyspark.sql import Row

from momyre_spark.operators.linkage import blocked_edit_pairs


def _names(spark, rows):
    return spark.createDataFrame([Row(id=i, name=n) for i, n in rows])


def test_single_region_typos_caught_everywhere(spark):
    df = _names(
        spark,
        [
            (1, "jonathan smith"),
            (2, "jonathan smitt"),   # end typo -> prefix block
            (3, "ronathan smith"),   # start typo -> suffix block
            (4, "jonathan_smith"),   # middle typo -> both blocks
            (5, "completely other"),
        ],
    )
    got = {(r["a_id"], r["b_id"]): r["distance"]
           for r in blocked_edit_pairs(df, text_col="name",
                                       max_distance=1,
                                       prefix_len=8).collect()}
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1 and got[(1, 4)] == 1
    assert not any(5 in p for p in got)
    # distance is exact, pairs are a<b, no duplicates
    assert all(a < b for a, b in got)


def test_verify_is_exact_distance_bound(spark):
    df = _names(spark, [(1, "alpha beta"), (2, "alpha bexx")])  # distance 2
    assert blocked_edit_pairs(df, text_col="name", max_distance=1,
                              prefix_len=8).count() == 0
    out = blocked_edit_pairs(df, text_col="name", max_distance=2,
                             prefix_len=8).collect()
    assert [(r["a_id"], r["b_id"], r["distance"]) for r in out] == [(1, 2, 2)]


def test_no_cartesian_in_plan(spark):
    df = _names(spark, [(i, f"name {i:04d}") for i in range(50)])
    out = blocked_edit_pairs(df, text_col="name")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------------- entity_groups


def test_entity_groups_transitive_closure_and_singletons(spark):
    """abcdexxxxxxxxxxxxxxxxQ ~ ...QX ~ ...QXY chain: one entity via
    closure even though ends are distance 2 apart; unrelated record is
    its own singleton entity."""
    from pyspark.sql import Row

    from momyre_spark.operators.linkage import entity_groups

    base = "abcdexxxxxxxxxxxxxxxxQ"  # > prefix_len so blocking fires
    rows = [
        Row(id=1, name=base),
        Row(id=2, name=base + "X"),
        Row(id=3, name=base + "XY"),
        Row(id=9, name="completely different entity zz"),
    ]
    out = {r["id"]: (r["entity"], r["n_members"])
           for r in entity_groups(spark.createDataFrame(rows)).collect()}
    assert out[1] == (1, 3) and out[2] == (1, 3) and out[3] == (1, 3)
    assert out[9] == (9, 1)


def test_entity_groups_all_singletons(spark):
    from pyspark.sql import Row

    from momyre_spark.operators.linkage import entity_groups

    rows = [Row(id=i, name=f"wholly distinct entity number {i * 7919}")
            for i in range(1, 5)]
    out = entity_groups(spark.createDataFrame(rows)).collect()
    assert {r["id"] for r in out} == {1, 2, 3, 4}
    assert all(r["entity"] == r["id"] and r["n_members"] == 1 for r in out)


def test_blocked_edit_pairs_jumbo_block_star_defense(spark):
    from momyre_spark.operators.linkage import (
        blocked_edit_pairs,
        entity_groups,
    )

    # 30 names sharing ONE degenerate suffix block ("sfx:XX" with a tiny
    # cap): all within distance 1 of the hub "nameXX" variants
    rows = [(i, f"base-{i:03d}-XX") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, name string")
    # prefix 5 groups "base-" -> also one jumbo prefix block
    full = blocked_edit_pairs(
        df, prefix_len=5, suffix_len=2, max_distance=2, max_block=100
    )
    star = blocked_edit_pairs(
        df, prefix_len=5, suffix_len=2, max_distance=2, max_block=10
    )
    # candidate set under the cap is star-shaped: <= n-1 per block vs
    # n(n-1)/2; verified pairs can only shrink
    assert star.count() <= full.count()
    # connectivity through the hub survives: records within distance 2 of
    # the hub still cluster with it
    close = spark.createDataFrame(
        [(i, f"dup-name-{chr(65 + i)}") for i in range(12)],
        "id long, name string",
    )  # all pairwise distance <= 2, one char differs near the end
    groups = {
        r["id"]: r["entity"]
        for r in entity_groups(
            close, text_col="name", id_col="id", max_distance=2,
            prefix_len=8, suffix_len=2,
        ).collect()
    }
    star_groups = {
        r["id"]: r["entity"]
        for r in entity_groups(
            close, text_col="name", id_col="id", max_distance=2,
            prefix_len=8, suffix_len=2, max_block=5,
        ).collect()
    }
    # with every member within distance of the hub, the component is
    # identical under the cap
    assert groups == star_groups
    assert len(set(groups.values())) == 1
