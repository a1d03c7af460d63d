"""End-to-end tour of the training-data pipeline operators.

Run: ``python examples/corpus_pipeline_demo.py`` (local Spark, reads the
sf0.001 test corpus). Walks the path a pretraining corpus takes:

  quality gate -> exact + near dedup -> quality scoring (unigram LM)
  -> per-source diagnostics (KL, overlap) -> chunk -> weighted sample
  -> shard + pack -> deterministic shuffle

Every step prints the numbers a 100 TB operator would watch: survivor
counts per stage, score distributions, shard balance — and every step is
a deterministic pure function of the data (hash-keyed, no RNG), so the
same corpus produces the same artifacts on any cluster layout.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from momyre_spark.operators.chunking import chunk_documents  # noqa: E402
from momyre_spark.operators.curate import curate_corpus  # noqa: E402
from momyre_spark.operators.dedup import cross_source_overlap  # noqa: E402
from momyre_spark.operators.lm import (  # noqa: E402
    score_documents,
    source_divergence,
)
from momyre_spark.operators.sampling import (  # noqa: E402
    assign_shards,
    global_shuffle,
    pack_sequences,
    weighted_sample_k,
)
from momyre_spark.session import get_spark  # noqa: E402
from momyre_spark.sources.parquet import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="corpus-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF, "documents")
    print(f"input: {docs.count()} documents from {SF}")

    # 1. curate: gate -> exact dedup -> LSH near-dup components
    curated, report = curate_corpus(docs, min_tokens=10, min_quality=0.3)
    print("\ncuration funnel:")
    for r in report.collect():
        print(f"  {r['stage']:<20} {r['docs']}")

    # 2. quality scoring: corpus unigram LM, low scorers are outliers
    scored = score_documents(curated)
    lo = scored.orderBy("mean_logprob").limit(3).collect()
    print("\nlowest unigram-LM scores (rarest-token docs):")
    for r in lo:
        print(f"  doc {r['doc_id']}: mean_logprob={r['mean_logprob']}")

    # 3. per-source diagnostics
    kl = source_divergence(docs).orderBy(F.desc("kl_divergence")).limit(3)
    print("\nmost-divergent sources (KL vs corpus blend):")
    for r in kl.collect():
        print(f"  {r['source']}: KL={r['kl_divergence']} ({r['n_tokens']} tokens)")
    overlap = cross_source_overlap(docs, key="content")
    print(f"cross-source content-overlap pairs: {overlap.count()}")

    # 3b. model-based quality: distill the heuristic gate into a logistic
    # model, score everything with a literal-sigmoid map pass
    from momyre_spark.functions.text import quality_score
    from momyre_spark.operators.classifier import (
        featurize_documents,
        score_documents_model,
        train_quality_model,
    )

    labeled = docs.select(
        "doc_id", (quality_score(F.col("text")) >= 0.574).cast("double").alias("label")
    )
    model = train_quality_model(
        featurize_documents(docs).join(labeled, "doc_id")
    )
    probs = score_documents_model(docs, model)
    agree = probs.join(labeled, "doc_id").filter(
        ((F.col("quality_prob") >= 0.5).cast("int")) == F.col("label").cast("int")
    ).count()
    print(f"\ntrained quality model: {agree}/{docs.count()} teacher agreement")

    # 3c. learned-BPE token accounting (type-frequency train, map apply)
    from momyre_spark.operators.bpe import bpe_encode, train_bpe

    merges = train_bpe(docs, num_merges=60)
    tok = bpe_encode(docs, merges).agg(
        F.sum("n_pretokens").alias("pre"), F.sum("n_bpe_tokens").alias("bpe")
    ).first()
    print(f"BPE(60 merges): {tok['pre']} pretokens -> {tok['bpe']} subwords")

    # 4. chunk to context windows
    chunks = chunk_documents(curated, window=64, stride=64)
    print(f"\nchunks (64-token windows): {chunks.count()}")

    # 5. length-weighted deterministic sample (token-budget-aware draw)
    sample = weighted_sample_k(curated, 50, weight_col="n_chars")
    print(f"weighted sample: {sample.count()} docs "
          f"(mean n_chars {sample.agg(F.avg('n_chars')).first()[0]:.0f} vs "
          f"corpus {curated.agg(F.avg('n_chars')).first()[0]:.0f})")

    # 6. shard + pack + shuffle: the trainer-facing layout
    chunks = chunks.withColumn("n_tokens", F.col("n_chunk_tokens"))
    sharded = assign_shards(
        chunks.withColumn(
            "key", F.concat("doc_id", F.lit(":"), "chunk_id")
        ),
        num_shards=4,
        id_col="key",
    )
    packed = pack_sequences(sharded, max_tokens=256, id_col="key", shard_col="shard")
    balance = sharded.groupBy("shard").count().orderBy("shard").collect()
    print(f"shard balance: {[r['count'] for r in balance]}")
    print(f"packed bins: {packed.select('shard', 'bin').distinct().count()}")
    order = global_shuffle(curated, num_buckets=16)
    print(f"global shuffle positions assigned: {order.count()} "
          "(dense, layout-independent)")

    # 7. round-6 additions: corpus-boilerplate pressure and FIM prep
    from momyre_spark.operators.sampling import fim_transform
    from momyre_spark.operators.textops import dup_ngram_coverage

    cov = dup_ngram_coverage(curated)
    heavy = cov.filter(F.col("coverage") > 0.5).count()
    print(f"dup-ngram coverage: {heavy} docs are >50% shared trigrams "
          "(template-family pressure exact dedup misses)")
    fim = fim_transform(curated, rate=0.5)
    mix = {r["fim_mode"]: r["count"]
           for r in fim.groupBy("fim_mode").count().collect()}
    print(f"FIM re-serialization mix: {mix} (hash-chosen, map-only)")

    # 8. round-7 additions: exact substring dedup (find -> cut), held-out
    # LM quality scoring, and the one-row corpus health readout
    from momyre_spark.operators.lm import cross_score_bigram
    from momyre_spark.operators.textops import (
        remove_duplicate_spans,
        zipf_fit,
    )

    cut = remove_duplicate_spans(docs)
    removed = cut.agg(
        F.sum("n_removed_tokens").alias("r"), F.sum("n_tokens").alias("t")
    ).collect()[0]
    print(f"exact-substring cut: {removed['r']}/{removed['t']} tokens in "
          "duplicated spans >= 4 tokens (Lee-style find-then-cut)")
    heldout = cross_score_bigram(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
    )
    stats = heldout.agg(F.min("mean_logprob"), F.max("mean_logprob")).collect()[0]
    print(f"held-out bigram logprob (train != src0, score src0): "
          f"[{stats[0]:.3f}, {stats[1]:.3f}] per-doc mean range "
          "(OOV transitions charged the unigram backoff)")
    z = zipf_fit(docs).collect()[0]
    print(f"Zipf head fit: slope {z['slope']:.3f}, r2 {z['r2']:.3f} "
          "(natural text sits near -1; flat slope = template soup)")

    print("\nDONE — every artifact above is reproducible bit-for-bit on any "
          "partitioning: the pipeline is a pure function of the corpus.")


if __name__ == "__main__":
    main()
