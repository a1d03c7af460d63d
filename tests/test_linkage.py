"""Record linkage (operators/linkage.py): deletion-neighborhood blocking
recall contract and exact verify."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from momyre_spark.operators.linkage import blocked_edit_pairs


def _names(spark, rows):
    return spark.createDataFrame([Row(id=i, name=n) for i, n in rows])


def test_single_edit_typos_caught_everywhere(spark):
    df = _names(
        spark,
        [
            (1, "jonathan smith"),
            (2, "jonathan smitt"),   # end typo
            (3, "ronathan smith"),   # start typo
            (4, "jonathan_smith"),   # middle typo
            (5, "completely other"),
        ],
    )
    got = {(r["a_id"], r["b_id"]): r["distance"]
           for r in blocked_edit_pairs(df, text_col="name",
                                       max_distance=1).collect()}
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1 and got[(1, 4)] == 1
    assert not any(5 in p for p in got)
    # distance is exact, pairs are a<b, no duplicates
    assert all(a < b for a, b in got)


def test_indels_and_short_strings_caught(spark):
    """The retired positional (prefix+suffix) blocking documented misses
    for short strings and mixed-position edits; deletion-neighborhood
    recall is exact for every single-edit pattern at every length."""
    rows = [
        (1, "ab"),
        (2, "ba"),                       # 2 substitutions -> distance 2
        (3, "abc"),                      # 1 insertion
        (4, "b"),                        # 1 deletion
        (5, "Customer#0000012"),
        (6, "Customer#0000082"),         # differ mid-string, len 16
        (7, "abcdefgh-tail-anchor"),
        (8, "Xabcdefgh-tail-anchor"),    # prepend shifts every position
        (9, "abcdefg-tail-anchor"),      # early deletion
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r["a_id"], r["b_id"]) for r in blocked_edit_pairs(
        df, max_distance=1).collect()}
    assert {(1, 3), (1, 4), (5, 6), (7, 8), (7, 9)} <= got
    assert (1, 2) not in got  # distance 2 > max_distance


def test_verify_is_exact_distance_bound(spark):
    df = _names(spark, [(1, "alpha beta"), (2, "alpha bexx")])  # distance 2
    assert blocked_edit_pairs(df, text_col="name",
                              max_distance=1).count() == 0
    out = blocked_edit_pairs(df, text_col="name", max_distance=2).collect()
    assert [(r["a_id"], r["b_id"], r["distance"]) for r in out] == [(1, 2, 2)]


def test_max_distance_cap_validated(spark):
    df = _names(spark, [(1, "x")])
    with pytest.raises(ValueError):
        blocked_edit_pairs(df, text_col="name", max_distance=4)


def test_no_cartesian_in_plan(spark):
    df = _names(spark, [(i, f"name {i:04d}") for i in range(50)])
    out = blocked_edit_pairs(df, text_col="name")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


# ------------------------------------------------------- entity_groups


def test_entity_groups_transitive_closure_and_singletons(spark):
    """base ~ baseX ~ baseXY chain: one entity via closure even though
    the ends are distance 2 apart; unrelated record is its own
    singleton entity."""
    from momyre_spark.operators.linkage import entity_groups

    base = "abcdexxxxxxxxxxxxxxxxQ"
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
    from momyre_spark.operators.linkage import entity_groups

    rows = [Row(id=i, name=f"wholly distinct entity number {i * 7919}")
            for i in range(1, 5)]
    out = entity_groups(spark.createDataFrame(rows)).collect()
    assert {r["id"] for r in out} == {1, 2, 3, 4}
    assert all(r["entity"] == r["id"] and r["n_members"] == 1 for r in out)


# ------------------------------------------- star-cap recall contract


def test_over_cap_star_recall_contract(spark):
    """Force max_block overflow on a degenerate block (every record one
    substitution from every other at position 1, so ALL share the
    delete-position-1 variant) and pin the documented contract: pairs
    through the hub survive, candidate volume stays O(block), and
    entity labeling is unchanged because the hub connects the block."""
    from momyre_spark.operators.linkage import entity_groups

    n = 40
    rows = [(i, chr(65 + i) + "ommon-entity-name") for i in range(n)]
    df = spark.createDataFrame(rows, "id long, name string")

    full = blocked_edit_pairs(df, max_distance=1, max_block=1000)
    got_full = {(r["a_id"], r["b_id"]) for r in full.collect()}
    assert len(got_full) == n * (n - 1) // 2  # exhaustive below the cap

    capped = blocked_edit_pairs(df, max_distance=1, max_block=10)
    got_star = {(r["a_id"], r["b_id"]) for r in capped.collect()}
    # star shape: exactly the n-1 hub pairs (hub = min id = 0)
    assert got_star == {(0, i) for i in range(1, n)}
    assert got_star <= got_full

    # transitive closure through the hub rebuilds the full entity:
    # labeling is IDENTICAL capped vs uncapped
    g_full = {r["id"]: r["entity"] for r in entity_groups(
        df, max_distance=1, max_block=1000).collect()}
    g_star = {r["id"]: r["entity"] for r in entity_groups(
        df, max_distance=1, max_block=10).collect()}
    assert g_full == g_star and set(g_star.values()) == {0}


def test_over_cap_hub_free_pair_is_the_documented_miss(spark):
    """A pair matching each other but not the hub survives the cap if it
    shares ANY small block; it is missed only when its EVERY shared
    block is over-cap — the precise star contract."""
    n = 40
    rows = [(i, chr(65 + i) + "ommon-entity-name") for i in range(n)]
    # 100/101: distance 1 from each other (last char); their shared
    # variants ("Zommon-entity-nam" + last-char deletions) are tiny
    # blocks, NOT the jumbo delete-pos-1 block
    rows += [(100, "Zommon-entity-namX"), (101, "Zommon-entity-namY")]
    df = spark.createDataFrame(rows, "id long, name string")
    full = {(r["a_id"], r["b_id"]) for r in blocked_edit_pairs(
        df, max_distance=1, max_block=1000).collect()}
    star = {(r["a_id"], r["b_id"]) for r in blocked_edit_pairs(
        df, max_distance=1, max_block=10).collect()}
    assert (100, 101) in full
    assert (100, 101) in star  # found through a below-cap block

    # position-1-substitution pairs share ONLY the jumbo block: every
    # non-hub pair is the documented miss
    assert (1, 2) in full
    assert (1, 2) not in star


# ------------------------------------ property: exact recall theorem


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_deletion_neighborhood_recall_property(spark):
    """FastSS theorem, fuzzed: for random strings over a tiny alphabet
    (forcing repeated-char edge cases) and random single/double edits,
    every pair within max_distance is found and every reported distance
    is exact. Batched into one frame per max_distance so the whole fuzz
    costs two Spark jobs."""
    import random

    rng = random.Random(7919)
    alpha = "abz"

    def mutate(s: str) -> str:
        ops = ["sub", "ins", "del"] if s else ["ins"]
        op = rng.choice(ops)
        p = rng.randrange(len(s) + (op == "ins"))
        if op == "sub":
            return s[:p] + rng.choice(alpha) + s[p + 1:]
        if op == "ins":
            return s[:p] + rng.choice(alpha) + s[p:]
        return s[:p] + s[p + 1:]

    for d in (1, 2):
        rows, expect = [], {}
        for i in range(60):
            base = "".join(rng.choice(alpha)
                           for _ in range(rng.randrange(1, 25)))
            mut = base
            for _ in range(d):
                mut = mutate(mut)
            rows += [(2 * i, base), (2 * i + 1, mut)]
            a, b = sorted([2 * i, 2 * i + 1])
            expect[(a, b)] = _lev(base, mut)
        df = spark.createDataFrame(rows, "id long, name string")
        got = {(r["a_id"], r["b_id"]): r["distance"]
               for r in blocked_edit_pairs(df, max_distance=d).collect()}
        by_id = dict(rows)
        # every reported distance is the exact levenshtein and <= d
        for (a, b), dist in got.items():
            assert dist == _lev(by_id[a], by_id[b]) and dist <= d
        # every planted pair within d is found (exact recall)
        for pair, dist in expect.items():
            if dist <= d and pair[0] != pair[1]:
                assert pair in got, (pair, by_id[pair[0]], by_id[pair[1]], d)


def test_synthetic_names_probe_exact_recall(spark):
    """The SCALE.md synthetic linkage probe (_syn_names) must find
    EXACTLY the planted twin set and nothing else: names are 16-hex md5
    prefixes, so the only edit-1 pairs are (id, id+10M) for id % 7 == 0.
    Pinned at small n — the probe's value as a scaling point rests on
    its match density being data-intrinsic, fixed, and exactly known."""
    from momyre_spark.operators.linkage import entity_groups
    from momyre_spark.plans.dedup_queries import _syn_names

    n = 1400
    names = _syn_names(spark, n)
    got = {
        (r["a_id"], r["b_id"])
        for r in blocked_edit_pairs(
            names, text_col="t", id_col="id", max_distance=1
        ).collect()
    }
    expect = {(i, i + 10_000_000) for i in range(0, n, 7)}
    assert got == expect
    # the closure labels each twin with its base record; everything else
    # is a singleton
    ent = entity_groups(
        names, text_col="t", id_col="id", max_distance=1
    ).collect()
    assert len(ent) == n + n // 7  # base records + planted twins
    twos = {r["id"]: r for r in ent if r["n_members"] == 2}
    assert set(twos) == {i for i in range(0, n, 7)} | {
        i + 10_000_000 for i in range(0, n, 7)
    }
    assert all(r["entity"] == r["id"] % 10_000_000 for r in twos.values())
    assert all(r["n_members"] == 1 for r in ent if r["id"] not in twos)

def test_codegen_emission_matches_hof_variant_keys(spark):
    """The d=1 posexplode emission must produce EXACTLY the HOF
    `_variant_keys` key multiset per record (modulo the documented
    NULL-text and 2^-64 hash-collision divergences): same variant set,
    run-dedup rule == array_distinct on deletions, xxhash64-compatible."""
    from pyspark.sql import functions as F

    from momyre_spark.operators.linkage import _variant_keys

    rows = [
        (1, "aabbccaa"),        # interior + boundary runs
        (2, "aaaa"),            # one maximal run -> 1 distinct deletion
        (3, ""),                # empty string -> exactly the self key
        (4, "x"),               # single char
        (5, "abcabc"),          # no runs -> all deletions distinct
        (6, "naïve café"),      # multi-byte chars (substr is char-based)
        (7, "a a  a"),          # spaces incl. a 2-space run
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    hof = (
        df.select(
            "id", F.explode(_variant_keys(F.col("t"), 1)).alias("k")
        )
        .collect()
    )
    t, p = F.col("t"), F.col("p")
    cg = (
        df.select(
            "id",
            "t",
            F.explode(F.sequence(F.lit(0), F.length("t"))).alias("p"),
        )
        .filter(
            (p <= F.lit(1))
            | (t.substr(p, F.lit(1)) != t.substr(p - F.lit(1), F.lit(1)))
        )
        .select(
            "id",
            F.xxhash64(
                F.when(p == F.lit(0), t).otherwise(
                    F.concat(
                        t.substr(F.lit(1), p - F.lit(1)),
                        t.substr(p + F.lit(1), F.length("t")),
                    )
                )
            ).alias("k"),
        )
        .collect()
    )
    # multiset equality per record: both paths emit each variant once
    from collections import Counter

    assert Counter((r["id"], r["k"]) for r in hof) == Counter(
        (r["id"], r["k"]) for r in cg
    )


def test_codegen_emission_pairs_match_hof_pairs(spark):
    """End-to-end: blocked_edit_pairs at d=1 (codegen emission) returns the
    same pair set as a d=1 run forced through the HOF emission."""
    from pyspark.sql import functions as F

    from momyre_spark.operators.linkage import _variant_keys

    rows = (
        [(i, f"record name {i:03d}") for i in range(40)]
        + [(100, "record name 007x"), (101, None), (102, None), (103, "")]
    )
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r["a_id"], r["b_id"], r["distance"])
        for r in blocked_edit_pairs(df, text_col="name").collect()
    }
    # reference: candidates from the HOF keys + the same banded verify
    keyed = df.select(
        F.col("id").alias("__id"),
        F.col("name").alias("__t"),
        F.explode(_variant_keys(F.col("name"), 1)).alias("__k"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    ref = {
        (r["a_id"], r["b_id"], r["distance"])
        for r in (
            a.join(
                b,
                (F.col("a.__k") == F.col("b.__k"))
                & (F.col("a.__id") < F.col("b.__id")),
            )
            .select(
                F.col("a.__id").alias("a_id"),
                F.col("b.__id").alias("b_id"),
                F.levenshtein("a.__t", "b.__t", 1).cast("int").alias(
                    "distance"
                ),
            )
            .filter((F.col("distance") >= 0) & (F.col("distance") <= 1))
            .distinct()
            .collect()
        )
    }
    assert got == ref
