"""Market-basket association rules (pairwise support / confidence / lift).

The co-occurrence readout over any (basket, item) relation — "users who
trigger `error` in a session also trigger `purchase`?" for event streams,
"docs tagged A are also tagged B" for labeled corpora. Pairwise only (the
useful head of Apriori): higher-order itemsets explode combinatorially and
are rarely actionable; the pairwise table IS the lift matrix.

Scale shape: the quadratic step is the per-basket pair join, cost
``sum_b items(b)^2``. Two explicit controls keep it bounded at 100 TB:
``min_item_count`` prunes rare items BEFORE the pair join (the Apriori
monotonicity argument: a pair can never be more frequent than its rarer
item), and ``max_basket_items`` drops degenerate jumbo baskets (a crawler
session touching every item pairs everything with everything) — dropped
visibly, documented recall contract, same star-defense as the dedup
buckets and graph wedges.

Determinism: all counts are exact BIGINT; support/confidence/lift are a
handful of mirrored float divisions rounded at ``digits``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from momyre_spark.functions.numeric import round_half_up


def association_rules(
    df: DataFrame,
    basket_cols: Sequence[str],
    item_col: str,
    min_item_count: int = 1,
    max_basket_items: int | None = None,
    digits: int = 6,
    min_pair_count: int = 1,
) -> DataFrame:
    """Pairwise association rules over baskets keyed by ``basket_cols``.

    Output, one row per unordered item pair (``item_a < item_b``
    lexically): ``item_a, item_b, n_baskets, cnt_a, cnt_b, cnt_ab,
    support, conf_a_b, conf_b_a, lift`` where support = cnt_ab/n_baskets,
    conf_a_b = P(b|a) = cnt_ab/cnt_a, lift = n*cnt_ab/(cnt_a*cnt_b)
    (>1: positively associated).

    ``min_item_count`` prunes rare ITEMS before the quadratic pair join
    (the Apriori bound); ``min_pair_count`` separately prunes output
    PAIRS by co-occurrence count (default 1 — a pair of two frequent
    items is kept even if it co-occurs only once).

    Counts are BASKET counts (distinct-basket semantics — an item seen
    twice in one basket counts once), the standard formulation.
    """
    if not basket_cols:
        raise ValueError("momyre: basket_cols must be non-empty")
    if min_item_count < 1:
        raise ValueError("momyre: min_item_count must be >= 1")
    if min_pair_count < 1:
        raise ValueError("momyre: min_pair_count must be >= 1")
    items = (
        df.filter(F.col(item_col).isNotNull())
        .select(*basket_cols, F.col(item_col).alias("__i"))
        .distinct()
    )
    if max_basket_items is not None:
        sizes = items.groupBy(*basket_cols).agg(
            F.count(F.lit(1)).alias("__bs")
        )
        items = items.join(
            sizes.filter(F.col("__bs") > max_basket_items).select(
                *basket_cols
            ),
            list(basket_cols),
            "left_anti",
        )
    # 1-row grand total, broadcast-cross-joined at the end (the
    # text_source_divergence pattern) — no driver collect, no persist
    nb_df = (
        items.select(*basket_cols)
        .distinct()
        .agg(F.count(F.lit(1)).alias("__nb"))
    )
    item_counts = (
        items.groupBy("__i")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= min_item_count)
    )
    # prune rare items BEFORE the quadratic pair join (Apriori bound)
    kept = items.join(
        F.broadcast(item_counts.select("__i")), "__i"
    ).select(*basket_cols, "__i")
    a = kept.select(*basket_cols, F.col("__i").alias("__a"))
    b = kept.select(*basket_cols, F.col("__i").alias("__b"))
    pairs = (
        a.join(b, list(basket_cols))
        .filter(F.col("__a") < F.col("__b"))
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).alias("__cab"))
        .filter(F.col("__cab") >= min_pair_count)
    )
    out = (
        pairs.join(
            F.broadcast(
                item_counts.select(
                    F.col("__i").alias("__a"), F.col("__c").alias("__ca")
                )
            ),
            "__a",
        )
        .join(
            F.broadcast(
                item_counts.select(
                    F.col("__i").alias("__b"), F.col("__c").alias("__cb")
                )
            ),
            "__b",
        )
        .crossJoin(F.broadcast(nb_df))
    )
    nb = F.col("__nb")
    cab = F.col("__cab").cast("double")
    return out.select(
        F.col("__a").alias("item_a"),
        F.col("__b").alias("item_b"),
        nb.alias("n_baskets"),
        F.col("__ca").alias("cnt_a"),
        F.col("__cb").alias("cnt_b"),
        F.col("__cab").alias("cnt_ab"),
        round_half_up(cab / nb.cast("double"), digits).alias("support"),
        round_half_up(cab / F.col("__ca").cast("double"), digits).alias(
            "conf_a_b"
        ),
        round_half_up(cab / F.col("__cb").cast("double"), digits).alias(
            "conf_b_a"
        ),
        round_half_up(
            (nb * F.col("__cab")).cast("double")
            / (F.col("__ca") * F.col("__cb")).cast("double"),
            digits,
        ).alias("lift"),
    )
