"""Operator library — import the modules directly for full surfaces.

Convenience re-exports cover the most common entry points.
"""

from momyre_spark.operators.antijoin import orphan_ids  # noqa: F401
from momyre_spark.operators.asof import asof_join  # noqa: F401
from momyre_spark.operators.cdc import (  # noqa: F401
    apply_ops,
    latest_state_per_key,
    merge_ops_microbatch,
)
from momyre_spark.operators.curate import curate_corpus  # noqa: F401
from momyre_spark.operators.dedup import (  # noqa: F401
    dedup_exact,
    duplicate_components,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from momyre_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    brute_force_topk_numpy,
    ivf_topk,
    srp_lsh_topk,
)
from momyre_spark.operators.skew import salted_join  # noqa: F401
from momyre_spark.operators.textops import analyze_documents  # noqa: F401
