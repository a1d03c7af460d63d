"""Regenerate PLANS.md: the physical plans of the headline queries at
sf0.01, as greppable evidence of the shapes SCALE.md claims (pushdown,
broadcasts, partial aggregation, no Python eval in pure pipelines).

Run: ``python tools/dump_plans.py``
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOWCASE = [
    # query -> the property the plan demonstrates
    ("q02_inlist_filter", "IN-list reaches the parquet scan (PushedFilters)"),
    ("q08_join_agg", "dimension join broadcasts; agg is partial+final"),
    ("q11_tpch_q1_agg", "hash aggregate with map-side partials"),
    ("q13_topk", "top-k plans as TakeOrderedAndProject, no global sort"),
    ("cdc_apply_ops", "CDC merge: ONE exchange, no join/window"),
    ("q51_variant_props", "VARIANT promotion stays in codegen (no EvalPython)"),
    ("q52_resample_locf", "resample: single scan, generated grid"),
    ("dedup_span_overlap_fast", "span dedup: map-side expansion, one span-hash exchange"),
    ("text_decontaminate", "bench side broadcast; corpus never shuffles"),
    ("agg_grouped_topk", "salted partial top-k, no whole-group Window sort"),
    ("q71_tpch_q19_shape", "OR-of-conjuncts projected per side, pushed into both scans"),
    ("pipe_chunk_documents", "chunking is map-only: scan -> generate -> project"),
    ("text_unigram_logprob", "vocab broadcasts onto per-doc term counts"),
    ("pipe_global_shuffle", "rank windows partition by hash bucket, not globally"),
    ("mm_image_dhash_pairs", "hamming candidates via hash join on pigeonhole blocks (no cartesian); every branch reads the ONE cached (id, dhash) InMemoryRelation, so the Python image decode executes once — the plan text reprints the cached chain under each InMemoryTableScan, but all scans share the same storage"),
    ("dedup_url_canonical", "URL canonicalization fused into the scan; one groupBy exchange"),
    ("text_gopher_gates", "whole rule battery map-only: one exchange (the orderBy), no Generate/EvalPython"),
    ("sim_topk_ivf_indexed", "probe cells as literal PartitionFilters on the cell-partitioned index"),
    ("text_bigram_logprob", "bigram vocab broadcasts; zip_with pairs, single Generate"),
    ("dedup_hamming_synthetic_20k", "pigeonhole block equi-join at 20k fps; star-edge collapse, no cartesian"),
    ("pipe_temperature_mixture", "mixture weights: one hash agg + broadcast 1-row totals"),
    ("pipe_mixture_materialize", "epoch materialization map-only: scan -> generate, zero shuffle"),
    # round 5
    ("sim_maxsim_pruned", "maxsim re-rank: candidates by equi-join, query tokens broadcast, decimal max/sum aggs"),
    ("sim_topk_ivfpq", "IVF-PQ: PartitionFilters prune the scan; ADC is an expression fold (no Python)"),
    ("stats_value_quantiles", "mergeable histogram: two states union into one merge agg + tiny window read"),
    ("cdc_join_view_refresh", "dirty-key view refresh: LeftAnti carry-over + LeftSemi-restricted recompute"),
    ("pipe_split_leakage", "leakage audit: one fingerprint groupBy + 1-row rollups, map-side splits"),
    ("text_boilerplate_strip", "boilerplate strip: line-df agg, broadcast anti-join, ordered reassembly"),
    ("ts_ewma_bounded", "EWMA: one window, fixed-order lag chains, no aggregation ordering"),
    # round 6
    ("ts_cusum_changepoints", "CUSUM: ONE key exchange feeds all five window exprs (mean + 2 sums + 2 mins)"),
    ("stats_group_ols", "OLS trend: one partial+final hash agg over five moment sums, no window"),
    ("pipe_score_calibrate", "calibration: one source exchange, percent_rank + ntile share the sort"),
    ("stats_group_auc", "AUC: rank work on DISTINCT scores only — agg, one value window, re-agg"),
    ("q80_assoc_rules", "basket pairs: broadcast Apriori prune + broadcast stats joins, no cartesian"),
    ("graph_neighbor_jaccard", "wedge self-join through shared neighbor; degree joins stay equi-joins"),
    ("stats_spearman", "Spearman: doubled mid-ranks join back co-partitioned; one moment agg"),
    # round 7
    ("dedup_record_linkage", "FastSS deletion variants generated in codegen HOFs; md5 equi-join candidates, levenshtein verify map-side, no cartesian"),
    ("pipe_fim_transform", "FIM re-serialization fused into the scan: map-only hash+substring expressions, zero shuffles before the orderBy"),
    ("chat_loss_mask", "loss spans from ONE aggregate HOF fold: no Generate, no EvalPython, no exchange before the orderBy"),
    # round-7-staged, registered round 8
    ("text_duplicate_spans", "Lee-style span finder: positional explode, occurrence groupBy + equi-join back, the ONLY window is doc-partitioned"),
    ("text_remove_dup_spans", "find-then-cut: two equi-joins total; interval application is an in-row array filter, not a join"),
    ("text_zipf_fit", "frequency head: TakeOrdered (no global vocab sort); moments are one tiny agg"),
    ("text_cross_perplexity", "train LM broadcasts (3 BroadcastHashJoins + 2 one-row totals); eval corpus never shuffles"),
    ("stats_kaplan_meier", "survival: subjects collapse map-side to distinct times; ordered fold over bounded rows"),
    ("stats_trimmed_mean", "trim by distinct-value index overlap: agg + value window + re-agg, no per-row sort"),
    ("stats_bootstrap_ci", "200 Poisson replicates through ONE map-side-combinable agg; no resampled table"),
    # round-8 staged, registered round 9
    ("text_readability", "readability map-only: counts folded in codegen aggregate(), zero shuffles before the orderBy"),
    ("stats_bh_fdr", "BH-FDR: one family exchange, three window reads (rank, count, reverse running min)"),
    ("dedup_frequency_cap", "frequency cap, skew-safe: groupBy+broadcast-join sizes (partial agg), salted two-phase top-k ranks with map-side WindowGroupLimit below every exchange — no unbounded window partition"),
    ("pipe_packing_efficiency", "packing report: the packing window's exchange + one bin hash agg, nothing else"),
    ("pipe_cluster_weighted_sample", "cluster-weighted sample: groupBy(count)+broadcast join back (partial agg, AQE-splittable) — NO count window; map-only hash ladder"),
]

# round-9 staged (round-10 registration queue): shown from staged_queries()
STAGED_SHOWCASE = [
    ("text_heaps_fit", "Heaps fit: md5 bucket is a map expression (no corpus sort); two token aggs; windows/OLS over B rows"),
    ("stats_isotonic_calibrate", "isotonic: corpus collapses to <=64 bucket rows in ONE partial+final agg; the minimax fit joins only that frame"),
    ("sim_rbo_eval", "RBO: one equi-join of two (queries x k)-row rankings + literal weight lookup; no per-depth prefix expansion"),
    ("emb_intrinsic_dim", "TwoNN numpy twin: mapInPandas batch scoring, local top-2 per batch, rank window sees |parts| x anchors x 2 rows"),
    ("curate_domain_blocklist", "domain gates: fingerprint groupBy (partial agg) + broadcast join back + ONE low-cardinality domain agg"),
    ("dedup_cluster_stats", "cluster histogram: two map-side-combinable hash aggs, integer-only"),
    ("stats_qq_table", "Q-Q table: rank work on DISTINCT values (agg + NDV-bounded cumulative window); p grid broadcast"),
]


def main() -> None:
    import momyre_spark.plans as plans
    from momyre_spark.session import get_spark

    plans.load_all()
    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"

    out = io.StringIO()
    out.write(
        "# PLANS — physical plans of showcase queries (auto-generated)\n\n"
        "Regenerate with `python tools/dump_plans.py`. Each section names\n"
        "the property the plan is evidence FOR; the same properties are\n"
        "pinned as assertions in `tests/test_plan_quality.py`.\n"
    )
    staged = plans.staged_queries()
    for name, why in SHOWCASE + STAGED_SHOWCASE:
        fn = plans.QUERIES.get(name) or staged[name][0]
        df = fn(spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out.write(f"\n## {name}\n\n*{why}*\n\n```\n{plan}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as fh:
        fh.write(out.getvalue())
    print("PLANS.md written")


if __name__ == "__main__":
    main()
