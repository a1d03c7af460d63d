"""Every registered query with an oracle must hash-match DuckDB at sf0.01.

This is a local mirror of the driver's t2 gate (CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import pytest

import momyre_spark.plans as plans
from tests.conftest import SF_CORRECT
from tests.oracle_compare import compare

plans.load_all()


# the heaviest per-query compares move to the slow lane (their operators
# keep dedicated fast-lane tests; the full suite still runs them all)
_SLOW_ORACLE = {
    "dedup_minhash_synthetic_20k",
    "dedup_semantic_synthetic_20k",
    "dedup_entity_groups",
}


def _oracle_names():
    return [
        pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_ORACLE else n
        for n in sorted(plans.ORACLES)
    ]


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(spark, duck, name):
    sdf = plans.QUERIES[name](spark, SF_CORRECT).toPandas()
    ddf = duck.execute(plans.ORACLES[name]).fetchdf()
    ok, msg = compare(sdf, ddf)
    assert ok, f"{name}: {msg}\nspark:\n{sdf.head(5)}\nduck:\n{ddf.head(5)}"


@pytest.mark.slow
def test_all_queries_return_rows_or_schema(spark):
    # queries without an oracle still must run and have a stable schema
    for name, fn in plans.QUERIES.items():
        df = fn(spark, SF_CORRECT)
        assert df.columns, name


def _staged_names():
    return sorted(plans.staged_queries())


@pytest.mark.parametrize("name", _staged_names())
def test_staged_query_matches_oracle(spark, duck, name):
    """The round-8 registration queue gets the SAME sf0.01 compare the
    driver will apply once registered — a staged query may not rot
    between the round it was written and the round it registers."""
    fn, oracle = plans.staged_queries()[name]
    assert name not in plans.QUERIES  # staged means staged
    sdf = fn(spark, SF_CORRECT).toPandas()
    assert oracle is not None
    ddf = duck.execute(oracle).fetchdf()
    ok, msg = compare(sdf, ddf)
    assert ok, f"{name}: {msg}"


def test_staged_queries_pass_plan_gate(spark):
    """Same repo-wide plan gate as registered queries: no row-wise
    Python, no cartesian product, no corpus-sized SinglePartition window
    — a staged operator may not carry the single-task-sort shape into
    registration (the round-9 packing family did exactly that)."""
    from momyre_spark.plans.audit import corpus_singlepartition_windows

    offenders = {}
    for name, (fn, _) in plans.staged_queries().items():
        plan = (
            fn(spark, SF_CORRECT)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        bad = [
            m
            for m in ("BatchEvalPython", "CartesianProduct")
            if m in plan
        ]
        if corpus_singlepartition_windows(plan):
            bad.append("corpus-sized SinglePartition window")
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


# Queries that must ALSO hold at sf0.1 — the bench scale. This sweep has
# caught two real data-dependent divergences the smaller fixtures hid
# (mm_video_scenes' nullable-boolean rendering appeared only at sf0.01;
# stats_kaplan_meier's un-floored DuckDB epoch() flipped an hour bucket
# only at sf0.1). It covers the current staged queue (if any) plus the
# round-8 registrations that graduated from it — registration must not
# lose the multi-scale protection that staging had.
SF01_SWEEP = [
    "mm_video_scenes",
    "text_duplicate_spans",
    "text_remove_dup_spans",
    "text_textrank_keywords",
    "text_cross_perplexity",
    "text_zipf_fit",
    "stats_bootstrap_ci",
    "stats_kaplan_meier",
    "stats_trimmed_mean",
    # round-9 registrations (graduated from the round-8 staged queue)
    "text_readability",
    "stats_bh_fdr",
    "dedup_frequency_cap",
    "pipe_packing_efficiency",
    "pipe_cluster_weighted_sample",
    # round-10 registrations (graduated from the round-9 staged queue)
    "text_heaps_fit",
    "stats_isotonic_calibrate",
    "sim_rbo_eval",
    "stats_qq_table",
    "emb_intrinsic_dim",
    "curate_domain_blocklist",
    "dedup_cluster_stats",
    # round-11 registrations (graduated from the round-10 staged queue)
    "stats_ece_report",
    "stats_quantile_normalize",
    "text_vocab_richness",
    "text_term_burstiness",
    "emb_source_centroid_sim",
    "emb_norm_outliers",
    "graph_degree_distribution",
]


@pytest.mark.slow
def test_staged_queries_match_oracle_at_sf01(spark):
    import os

    import duckdb

    sf = "/root/testdata/sf0.1"
    if not os.path.exists(f"{sf}/events.parquet"):
        pytest.skip("sf0.1 testdata absent")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    sweep = {
        name: (plans.QUERIES[name], plans.ORACLES[name])
        for name in SF01_SWEEP
    }
    sweep.update(plans.staged_queries())
    failures = []
    for name, (fn, oracle) in sorted(sweep.items()):
        sdf = fn(spark, sf).toPandas()
        ddf = con.execute(oracle).fetchdf()
        ok, msg = compare(sdf, ddf)
        if not ok:
            failures.append(f"{name}: {msg}")
    con.close()
    assert not failures, failures
