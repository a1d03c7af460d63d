"""Physical-plan assertions: the 100 TB posture, checked in CI.

Correct results are necessary but not sufficient — these tests pin the plan
*shape*: predicate pushdown reaching the parquet scan, column pruning,
broadcast joins for dimension tables, top-k as TakeOrderedAndProject, partial
aggregation, and no Python-UDF evaluation nodes in pure-expression pipelines.
A refactor that silently turns a pushed filter into a full scan fails here,
not in production.
"""

from __future__ import annotations

import pytest

import momyre_spark.plans as plans
from tests.conftest import SF_CORRECT

plans.load_all()


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def full_plan_of(df) -> str:
    return df._jdf.queryExecution().toString()


def q(spark, name):
    return plans.QUERIES[name](spark, SF_CORRECT)


def test_q01_scan_prunes_columns(spark):
    plan = plan_of(q(spark, "q01_snapshot_project"))  # physical plan only
    assert "ReadSchema" in plan and "c_custkey" in plan
    assert "c_acctbal" not in plan  # unused column must not reach the scan
    assert "c_nationkey" not in plan


def test_q02_inlist_filter_pushed_to_parquet(spark):
    plan = full_plan_of(q(spark, "q02_inlist_filter"))
    assert "PushedFilters: [In(o_orderstatus" in plan


def test_q03_resume_scan_pushes_raw_ts_predicate(spark):
    plan = full_plan_of(q(spark, "q03_ts_range_filter"))
    assert "PushedFilters: [IsNotNull(ts), GreaterThan(ts," in plan


def test_q05_point_lookup_pushed(spark):
    plan = full_plan_of(q(spark, "q05_point_lookup"))
    assert "PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,42)]" in plan


def test_q08_q09_dimension_joins_broadcast(spark):
    assert plan_of(q(spark, "q08_join_agg")).count("BroadcastHashJoin") == 1
    assert plan_of(q(spark, "q09_multiway_join")).count("BroadcastHashJoin") == 2


def test_q06_antijoin_is_hash_antijoin(spark):
    plan = plan_of(q(spark, "q06_orphan_antijoin"))
    assert "LeftAnti" in plan  # a real anti-join, not a nested-loop probe


def test_q11_has_partial_aggregation(spark):
    plan = plan_of(q(spark, "q11_tpch_q1_agg"))
    # map-side partial + final aggregate around one exchange
    assert plan.count("HashAggregate") >= 2


def test_q13_topk_avoids_global_sort(spark):
    plan = plan_of(q(spark, "q13_topk"))
    assert "TakeOrderedAndProject" in plan


def test_pure_expression_pipelines_have_no_python_eval(spark):
    """Text/dedup pipelines must stay JVM-side (no BatchEvalPython /
    ArrowEvalPython nodes) — Python evaluation is the slow path."""
    for name in [
        "text_analyze_all",
        "text_repetition",
        "text_pii_redact",
        "text_top_bigram_frac",
        "text_bm25_topk",
        "sim_cluster_profile",
        "dedup_exact_groups",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "sim_topk_bruteforce",
        "cdc_apply_ops",
    ]:
        plan = plan_of(q(spark, name))
        assert "EvalPython" not in plan, name


def test_cdc_apply_single_exchange_per_aggregation(spark):
    """The CDC merge is ONE hash shuffle by key (single aggregation pass) —
    no window sort, no reset-join second exchange."""
    plan = plan_of(q(spark, "cdc_apply_ops"))
    assert "max_by" in plan or "MaxBy" in plan
    assert "Window" not in plan  # merge path uses aggregates, not window sort
    # exactly one hash exchange (the key shuffle); the only other exchange
    # is the final presentation orderBy's range partitioning
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_decontaminate_broadcasts_bench_side(spark):
    """The benchmark shingle frame is broadcast — the corpus never shuffles
    for the join, and there is no nested-loop fallback."""
    plan = plan_of(q(spark, "text_decontaminate"))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q32_q33_join_shapes(spark):
    p32 = plan_of(q(spark, "q32_tpch_q3_shape"))
    assert p32.count("BroadcastHashJoin") >= 2  # filtered dims broadcast
    assert "TakeOrderedAndProject" in p32      # top-10 without global sort
    assert "(c_mktsegment" in p32              # segment filter reaches the scan
    p33 = plan_of(q(spark, "q33_tpch_q5_shape"))
    assert "BroadcastHashJoin" in p33 or "SortMergeJoin" in p33


def test_runtime_bloom_filter_prunes_shuffle_join(spark):
    """At 100 TB a selective dimension filter must reach the fact scan as a
    runtime bloom filter (Spark injects it when the application side exceeds
    its size threshold — scaled to 0 here to demonstrate at test SF). The
    engine's session keeps the optimization enabled; this pins both the conf
    and the plan shape so a conf regression fails CI."""
    from pyspark.sql import functions as F

    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    saved_app = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    saved_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        big = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet")
        dim = spark.read.parquet(f"{SF_CORRECT}/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        j = (
            big.join(dim, big.l_orderkey == dim.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = plan_of(j)
        assert "might_contain" in plan  # fact scan probes the bloom filter
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            saved_app,
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_bc)


def test_q52_resample_scans_events_once(spark):
    """The grid is GENERATED (sequence per key), never joined from a
    calendar scan — the raw events table must appear exactly once in the
    plan. A second scan would double the IO of every resample at 100 TB."""
    plan = plan_of(q(spark, "q52_resample_locf"))
    assert plan.count("FileScan parquet") == 1


def test_q51_variant_single_parse(spark):
    """VARIANT path: one parse_json in the projection (not one per
    extracted field) and no Python evaluation."""
    plan = full_plan_of(q(spark, "q51_variant_props"))
    assert "EvalPython" not in plan
    assert plan.count("parse_json") <= 2  # logical + physical rendering


def test_q56_rolling_zscore_single_window_exchange(spark):
    """All three moments (n, sx, sxx) ride ONE window over one exchange —
    Spark must not plan a shuffle per aggregate."""
    plan = plan_of(q(spark, "q56_rolling_zscore"))
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_chunking_is_map_only(spark):
    """Sliding-window chunking must be a narrow explode fused with the
    scan: no Exchange, no Python eval."""
    plan = plan_of(q(spark, "pipe_chunk_documents").limit(10))
    body = plan.split("TakeOrderedAndProject")[-1]
    assert "Generate" in plan  # posexplode present
    assert "EvalPython" not in plan
    # the only exchange allowed is the final orderBy of the query wrapper;
    # chunking itself (scan -> generate -> project) must not shuffle
    before_sort = plan.split("Sort")[-1]
    assert "Exchange" not in before_sort


def test_q71_disjunctive_predicate_pushed(spark):
    """TPC-H Q19 shape: Catalyst must project the OR-of-conjuncts onto
    EACH join side and push both derived disjunctions into the scans
    (lineitem prunes on quantity ranges, part on brand/size) — not filter
    only after the join."""
    plan = plan_of(q(spark, "q71_tpch_q19_shape"))
    li_scan = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "lineitem" in ln
    ]
    p_scan = [
        ln for ln in plan.splitlines() if "FileScan" in ln and "part.parq" in ln
    ]
    assert li_scan and "l_quantity" in li_scan[0] and " OR " in li_scan[0]
    assert p_scan and "p_brand" in p_scan[0]


def test_global_shuffle_windows_by_bucket(spark):
    """The big-side window must partition by the hash bucket — a global
    single-partition window over the corpus would serialize at scale."""
    from momyre_spark.operators.sampling import global_shuffle

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    plan = plan_of(global_shuffle(df, num_buckets=16))
    import re

    # every Window node over the full frame partitions by __bucket; the
    # only unpartitioned window is over the 16-row offsets frame
    wins = re.findall(r"Window \[[^\]]*row_number[^\]]*\], \[([^\]]*)\]", plan)
    assert any("__bucket" in w for w in wins), plan[:2000]


def test_unigram_scoring_broadcasts_vocab(spark):
    """score_documents must broadcast the vocab frame onto per-doc term
    counts (the probe side shuffles only for its own aggregations)."""
    plan = plan_of(q(spark, "text_unigram_logprob"))
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_source_divergence_broadcasts_stats(spark):
    """All three stats frames (per-source totals, vocab counts, grand
    total) broadcast back; only the (source, token) aggs shuffle."""
    plan = plan_of(q(spark, "text_source_divergence"))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" not in plan or plan.count(
        "BroadcastNestedLoopJoin"
    ) <= 1  # the 1-row grand-total cross join is dimension-sized


@pytest.mark.slow
def test_no_query_plans_rowwise_python_or_cartesian(spark):
    """Repo-wide plan gate: NO registered query may plan a row-at-a-time
    Python eval (BatchEvalPython), an unbroadcast CartesianProduct, or a
    corpus-sized SinglePartition window (``Window.partitionBy()`` with no
    keys — the whole input sorted in ONE task; the round-9 packing family
    shipped this shape twice before the gate existed). SinglePartition
    exchanges over POST-AGGREGATION frames (bucket/offset tables, final
    scalars) are allowed — the detector checks the subtree structurally.
    Arrow-batched nodes (mapInPandas / pandas_udf) are allowed — they are
    the sanctioned Python path. The one whitelisted BatchEvalPython is
    q36's deliberate Python-UDTF showcase."""
    from momyre_spark.plans.audit import corpus_singlepartition_windows

    allowed_batch_eval = {"q36_udtf_tokenize"}
    offenders = {}
    for name, fn in plans.QUERIES.items():
        plan = plan_of(fn(spark, SF_CORRECT))
        bad = []
        if "BatchEvalPython" in plan and name not in allowed_batch_eval:
            bad.append("BatchEvalPython")
        if "CartesianProduct" in plan:
            bad.append("CartesianProduct")
        if corpus_singlepartition_windows(plan):
            bad.append("corpus-sized SinglePartition window")
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


def test_singlepartition_window_detector_shapes(spark):
    """The detector itself: flags the exact shape the packing family
    shipped (empty partitionBy over the corpus), passes the two-phase
    rewrite, and passes a window over a post-aggregation frame."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from momyre_spark.operators.sampling import pack_sequences
    from momyre_spark.plans.audit import corpus_singlepartition_windows

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("n_tokens")
    )
    bad = df.withColumn(
        "cum",
        F.sum("n_tokens").over(
            Window.orderBy("doc_id").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    assert corpus_singlepartition_windows(plan_of(bad)), plan_of(bad)[:1500]

    good = pack_sequences(df, 64, num_buckets=16)
    assert not corpus_singlepartition_windows(plan_of(good))

    post_agg = (
        df.groupBy((F.col("doc_id") % 5).alias("g"))
        .agg(F.sum("n_tokens").alias("s"))
        .withColumn("cum", F.sum("s").over(
            Window.orderBy("g").rowsBetween(Window.unboundedPreceding, 0)
        ))
    )
    assert not corpus_singlepartition_windows(plan_of(post_agg))


def test_pack_sequences_windows_by_bucket(spark):
    """The packing cumsum must partition by the hash bucket (the
    global_shuffle two-phase shape) — the corpus-frame window may never
    be SinglePartition, and both registered consumers inherit it."""
    import re

    for name in ("pipe_pack_sequences", "pipe_packing_efficiency"):
        plan = plan_of(q(spark, name))
        wins = re.findall(r"Window \[[^\]]*sum\([^\]]*\], \[([^\]]*)\]", plan)
        assert any("__bucket" in w for w in wins), (name, plan[:2000])


def test_stratified_and_mixture_windows_by_bucket(spark):
    """stratified_sample's rank and token_budget_mixture's cumsum must
    partition by (stratum, hash bucket) — a per-stratum-only window is
    bounded by the LARGEST stratum, which can be the whole corpus."""
    import re

    for name, fn_kind in (
        ("pipe_stratified_sample", "row_number"),
        ("pipe_token_budget_mixture", "sum"),
    ):
        plan = plan_of(q(spark, name))
        wins = re.findall(
            rf"Window \[[^\]]*{fn_kind}\([^\]]*\], \[([^\]]*)\]", plan
        )
        assert any("__bucket" in w for w in wins), (name, plan[:2000])


def test_gopher_gates_is_map_only(spark):
    """The rule-gate battery must fuse into the scan: no Exchange (beyond
    the wrapper's orderBy), no Python eval, no Generate (HOFs, not
    explode)."""
    plan = plan_of(q(spark, "text_gopher_gates"))
    assert "EvalPython" not in plan and "Generate" not in plan
    # exactly ONE exchange in the whole plan: the orderBy's range partition
    import re as _re

    assert len(_re.findall(r"Exchange (hash|range)partitioning", plan)) <= 1, plan


def test_mixture_materialize_is_map_only(spark):
    """materialize_mixture must fuse into the scan: scan -> generate
    (explode of the copy sequence) with NO hash shuffle — the only
    exchange is the presentation orderBy's range partitioning."""
    import re as _re

    plan = plan_of(q(spark, "pipe_mixture_materialize"))
    assert "EvalPython" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert len(_re.findall(r"Exchange rangepartitioning", plan)) <= 1, plan


def test_temperature_mixture_broadcasts_totals(spark):
    """The mixture-weight totals join must broadcast the 1-row total —
    never shuffle the per-stratum aggregate against it — and the corpus
    aggregation must execute ONCE: the totals branch re-reads the
    per-stratum exchange (AQE ReusedExchange), not the corpus."""
    df = q(spark, "pipe_temperature_mixture")
    df.collect()  # finalize the adaptive plan so reuse is visible
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "ReusedExchange" in plan, plan


def test_bigram_scoring_broadcasts_vocab(spark):
    """The bigram LM vocab join must broadcast the (distinct-bigram) vocab
    side — shuffling per-(doc,bigram) counts against it would move the
    corpus."""
    plan = plan_of(q(spark, "text_bigram_logprob"))
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_audit_plan_reports_shape_facts(spark):
    """The programmatic auditor agrees with the string checks the suite
    pins elsewhere: pushdown reaches the scan, joins classify correctly,
    the Python boundary is visible."""
    from momyre_spark.plans.audit import audit_plan
    from momyre_spark.sources.parquet import load_table
    from tests.conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem").filter("l_quantity > 40")
    o = load_table(spark, SF_SMOKE, "orders")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )
    facts = audit_plan(joined, execute=True)
    assert facts["scans"] == 2
    assert any("l_quantity" in p for p in facts["pushed_filters"])
    assert facts["cartesian"] == 0 and facts["python_eval"] == 0
    assert facts["broadcast_hash_joins"] + facts["sort_merge_joins"] >= 1
    assert facts["codegen_spans"] >= 1

    crossed = li.crossJoin(o.limit(1))
    assert audit_plan(crossed)["bnlj"] + audit_plan(crossed)["cartesian"] >= 1


def test_assoc_rules_broadcasts_dims_single_bnlj(spark):
    """Association rules: item counts and the 1-row grand total broadcast
    (the rare-item prune + final stats joins are BroadcastHashJoins); the
    only nested-loop join is the dimension-sized grand-total cross join
    (the text_source_divergence pattern), and never a CartesianProduct."""
    plan = plan_of(q(spark, "q80_assoc_rules"))
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in plan


def test_zipf_and_textrank_use_takeordered_not_global_sort(spark):
    """Top-K heads must plan as TakeOrdered (per-partition heaps + driver
    merge of K), never a full global sort of the vocabulary."""
    from momyre_spark.plans.text_queries import text_zipf_fit
    from momyre_spark.operators.textops import textrank_keywords

    p = plan_of(text_zipf_fit(spark, SF_CORRECT))
    assert "TakeOrdered" in p
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    p2 = plan_of(textrank_keywords(docs))
    assert "TakeOrdered" in p2


def test_remove_duplicate_spans_two_joins_only(spark):
    """Find-then-cut must be: occurrence-index equi-join + one interval
    list join-back — the interval APPLICATION is an in-row array filter,
    never a positions-by-intervals join."""
    import re as _re

    from momyre_spark.plans.text_queries import text_remove_dup_spans

    p = plan_of(text_remove_dup_spans(spark, SF_CORRECT))
    assert len(_re.findall(r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin", p)) <= 2, p
    assert "CartesianProduct" not in p
