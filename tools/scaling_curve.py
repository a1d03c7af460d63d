#!/usr/bin/env python
"""Weak-scaling evidence: time representative queries at sf0.001/0.01/0.1
(TPC-H-family tables grow ~100x across that range) and print the measured
runtime ratios per 10x of data. A scan-bound or hash-agg plan should grow
well below 10x per decade at these sizes (fixed overheads dominate small
SFs); anything super-linear is a red flag. Results are recorded in
SCALE.md ("Measured scaling" section)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "q11_tpch_q1_agg",       # scan + hash agg
    "q32_tpch_q3_shape",     # multiway join + agg + topk
    "cdc_apply_ops",         # CDC merge reduction
    "q52_resample_locf",     # window + generated grid over events
    "q06_orphan_antijoin",   # anti-join
    # round 5: candidate-bounded maxsim re-rank (cost tracks candidates,
    # not corpus) and mergeable histogram-quantile state (hash agg + tiny
    # window read)
    "sim_maxsim_pruned",
    "stats_value_quantiles",
    # round 6: compressed-domain search against the persisted IVF-PQ index
    # (probe -> partition filter, ADC in codegen; cost tracks the probed
    # cells' population, not the corpus)
    "sim_topk_ivfpq",
    # round 6 late waves: blocked entity resolution (cost = sum of
    # bucket^2 over blocking keys — the quadratic term must track bucket
    # sizes, not corpus size) and distinct-value rank statistics (AUC —
    # post-agg work tracks distinct scores, not rows)
    "dedup_entity_groups",
    "stats_group_auc",
    # round 8: two newly registered shapes whose cost model must hold —
    # KM collapses subjects to distinct durations before anything ordered
    # (cost tracks time resolution, not subjects); span dedup's inverted
    # index is linear in shingles with no pair expansion
    "stats_kaplan_meier",
    "text_duplicate_spans",
]
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    import momyre_spark.plans as plans
    from momyre_spark.session import get_spark

    plans.load_all()
    spark = get_spark(app_name="scaling-curve")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    out: dict[str, dict[str, float]] = {}
    for name in QUERIES:
        fn = plans.QUERIES[name]
        out[name] = {}
        for sf in SFS:
            def run() -> float:
                t0 = time.perf_counter()
                fn(spark, sf).write.format("noop").mode("overwrite").save()
                return time.perf_counter() - t0

            run()
            out[name][sf.rsplit("sf", 1)[-1]] = round(
                min(run(), run(), run()), 3
            )
            spark.catalog.clearCache()
    print(json.dumps(out, indent=1))
    for name, row in out.items():
        r1 = row["0.01"] / row["0.001"]
        r2 = row["0.1"] / row["0.01"]
        print(
            f"{name:24s} {row['0.001']:6.2f}s -> {row['0.01']:6.2f}s -> "
            f"{row['0.1']:6.2f}s   x{r1:.2f} / x{r2:.2f} per 10x data"
        )


if __name__ == "__main__":
    main()
