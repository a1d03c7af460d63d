"""Annotation / labeling QA: majority vote and inter-rater agreement.

Why in an LLM-data engine: RLHF and SFT corpora are built from human (or
model-judge) labels, and the first question about any labeled batch is
"do the raters even agree?" — low-agreement items are routed to
re-annotation, and a batch whose chance-corrected agreement (Fleiss
kappa) collapses signals a broken rubric or a drifted judge. The
reference has no annotation surface; this is the standard QA layer next
to ``chat.py``'s preference-pair assembly.

Scale shape: everything reduces over ``(item, label)`` vote counts — one
hash aggregation keyed on the item (any number of items), one window or
re-agg co-keyed on it, and for kappa two one-row aggregates crossed at
the end. No step holds more than a label histogram per item.

Determinism: vote counts are exact integers; every reported fraction is
a single division of two exactly-converted integers (or a mirrored
float expression over such), rounded half-up — so the registered
queries carry full value-hash oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from momyre_spark.functions.numeric import round_half_up


def majority_labels(
    df: DataFrame,
    item_col: str,
    label_col: str,
    digits: int = 6,
) -> DataFrame:
    """Per-item majority vote: ``(item, n_votes, majority_label,
    majority_votes, agreement)`` where ``agreement`` is the standard
    per-item observed agreement ``P_i = (sum_j c_j^2 - n) / (n*(n-1))``
    — the fraction of rater PAIRS that agree (1.0 unanimous, 0.0 all
    distinct). Ties break to the SMALLEST label, deterministically.

    Shape: one ``(item, label)`` count aggregation, then ONE window over
    the item (vote totals + rank in the same frame). Items with a single
    vote have no pair to agree: ``agreement`` is NULL there (visible,
    never a fabricated 1.0). NULL labels are dropped — an abstention is
    not a vote.
    """
    counts = (
        df.filter(F.col(label_col).isNotNull())
        .groupBy(
            F.col(item_col).alias("item"), F.col(label_col).alias("label")
        )
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    wi = Window.partitionBy("item")
    wr = Window.partitionBy("item").orderBy(
        F.col("__c").desc(), F.col("label").asc()
    )
    out = (
        counts.withColumn("n_votes", F.sum("__c").over(wi))
        .withColumn("__s", F.sum(F.col("__c") * F.col("__c")).over(wi))
        .withColumn("__rn", F.row_number().over(wr))
        .filter(F.col("__rn") == 1)
    )
    n = F.col("n_votes").cast("double")
    agree = (F.col("__s").cast("double") - n) / (n * (n - F.lit(1.0)))
    return out.select(
        F.col("item").alias(item_col),
        "n_votes",
        F.col("label").alias("majority_label"),
        F.col("__c").alias("majority_votes"),
        F.when(
            F.col("n_votes") >= 2, round_half_up(agree, digits)
        ).alias("agreement"),
    )


def fleiss_kappa(
    df: DataFrame,
    item_col: str,
    label_col: str,
    digits: int = 6,
) -> DataFrame:
    """Fleiss kappa over a constant-raters-per-item annotation table:
    ONE row ``(n_items, n_raters, p_bar, p_e, kappa)``. Chance-corrected
    multi-rater agreement — the batch-level health number next to
    :func:`majority_labels`' per-item view.

    Classical Fleiss requires the same rater count n on every item; the
    operator FAIL-STOPS (``raise_error``) if counts vary rather than
    silently averaging mismatched denominators. With constant n the
    whole statistic is exact integer arithmetic until three final
    divisions: ``p_bar = (sum_i S_i - I*n) / (I*n*(n-1))`` with
    ``S_i = sum_j c_ij^2``, ``p_e = sum_j C_j^2 / N^2`` with ``C_j`` the
    global label totals and ``N = I*n``, and
    ``kappa = (p_bar - p_e) / (1.0 - p_e)`` — each mirrored literally in
    the oracle SQL, so even this composite statistic value-hashes.

    Shape: the ``(item, label)`` count agg, one item-level re-agg and
    one label-level agg, each collapsing to a single row crossed at the
    end — nothing driver-side, nothing proportional to the corpus.
    """
    counts = (
        df.filter(F.col(label_col).isNotNull())
        .groupBy(
            F.col(item_col).alias("item"), F.col(label_col).alias("label")
        )
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    items = counts.groupBy("item").agg(
        F.sum("__c").alias("__n"),
        F.sum(F.col("__c") * F.col("__c")).alias("__s"),
    )
    itot = items.agg(
        F.count(F.lit(1)).alias("__i"),
        F.sum("__s").alias("__ss"),
        F.min("__n").alias("__nmin"),
        F.max("__n").alias("__nmax"),
    )
    ltot = (
        counts.groupBy("label")
        .agg(F.sum("__c").alias("__cj"))
        .agg(F.sum(F.col("__cj") * F.col("__cj")).alias("__sc"))
    )
    both = itot.crossJoin(F.broadcast(ltot))
    n = F.when(
        F.col("__nmin") != F.col("__nmax"),
        F.raise_error(
            F.lit(
                "momyre: fleiss_kappa requires a constant rater count "
                "per item"
            )
        ).cast("bigint"),
    ).otherwise(F.col("__nmin"))
    both = both.withColumn("__nr", n)
    big_n = F.col("__i") * F.col("__nr")
    p_bar = (F.col("__ss") - big_n).cast("double") / (
        big_n * (F.col("__nr") - F.lit(1))
    ).cast("double")
    p_e = F.col("__sc").cast("double") / (big_n * big_n).cast("double")
    kappa = (p_bar - p_e) / (F.lit(1.0) - p_e)
    return both.select(
        F.col("__i").alias("n_items"),
        F.col("__nr").alias("n_raters"),
        round_half_up(p_bar, digits).alias("p_bar"),
        round_half_up(p_e, digits).alias("p_e"),
        round_half_up(kappa, digits).alias("kappa"),
    )
