"""End-to-end tour of the similarity / retrieval stack.

Run: ``python examples/retrieval_stack_demo.py`` (local Spark, reads the
sf0.001 test embeddings). Walks the path a production vector corpus takes:

  build a persisted IVF-PQ index  ->  stream O(batch) adds into it
  ->  health report (cell skew, tail depth)  ->  compact the tail
  ->  search it (partition-pruned scan + expression ADC + exact refine)
  ->  MEASURE recall vs exact brute force (ann_recall_report)
  ->  late-interaction MaxSim re-rank over the candidates

Every stage prints the numbers an index operator watches: file/cell
layout, tail depth, recall@k at each (nprobe, refine) operating point —
recall is a measured dial here, never an assumption.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from momyre_spark.operators.pq import (
        build_ivfpq_index,
        ivfpq_index_add,
        ivfpq_topk_indexed,
    )
    from momyre_spark.operators.similarity import (
        ann_recall_report,
        brute_force_topk,
        ivf_index_compact,
        ivf_index_report,
        maxsim_topk,
        token_slices,
    )
    from momyre_spark.session import get_spark

    spark = get_spark(app_name="retrieval-stack-demo")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n = emb.count()
    root = tempfile.mkdtemp(prefix="momyre_demo_") + "/ivfpq"
    try:
        # 1. build on the first 80%, stream the rest in as two epochs
        cut = int(n * 0.8)
        cells = build_ivfpq_index(
            emb.filter(f"vec_id < {cut}"), root, num_cells=8, m=8, codes=16,
            centroids="first_c",
        )
        print(f"[build] {cut} vectors -> {cells} cells at {root}")
        for e, lo in enumerate(range(cut, n, max(1, (n - cut) // 2 + 1))):
            hi = min(n, lo + (n - cut) // 2 + 1)
            ivfpq_index_add(
                spark, root, emb.filter(f"vec_id >= {lo} AND vec_id < {hi}")
            )
            print(f"[add] epoch {e}: vectors [{lo}, {hi})")
        rep = ivf_index_report(spark, root)
        print(f"[report] {rep}")

        # 2. search at two operating points and MEASURE recall
        q = emb.filter("vec_id < 8")
        exact = brute_force_topk(emb, q, k=10)
        for nprobe, refine in ((1, 4), (4, 8)):
            got = ivfpq_topk_indexed(spark, root, q, k=10, nprobe=nprobe,
                                     refine=refine)
            rec = ann_recall_report(exact, got, k=10).agg(
                F.avg("recall").alias("r")
            ).collect()[0]["r"]
            print(f"[search] nprobe={nprobe} refine={refine} "
                  f"mean recall@10 = {rec:.3f}")

        # 3. compact the add-tail back into the base; search is invariant
        ivf_index_compact(spark, root)
        rep2 = ivf_index_report(spark, root)
        print(f"[compact] {rep2}")

        # 4. late-interaction re-rank of the IVF candidates (PLAID shape):
        #    pooled search supplies candidates, MaxSim re-scores per token
        cand = (
            ivfpq_topk_indexed(spark, root, q, k=30, nprobe=4, refine=4)
            .select("query_id", F.col("neighbor_id").alias("doc_id"))
        )
        toks = token_slices(emb, n_tokens=8)
        rer = maxsim_topk(
            toks, toks.join(q.select("vec_id"), "vec_id", "left_semi"),
            k=5, doc_id_col="vec_id", query_id_col="vec_id", candidates=cand,
        )
        print("[maxsim rerank] top-1 per query:")
        for r in rer.filter("rank = 1").orderBy("query_id").collect():
            print(f"  q{r['query_id']} -> doc {r['doc_id']} "
                  f"(maxsim {r['score']})")
    finally:
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
