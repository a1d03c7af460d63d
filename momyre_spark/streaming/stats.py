"""Streaming maintenance of mergeable quantile (histogram) state.

The batch half lives in ``operators/sketches.py``: per-group bin counts
over a fixed geometric grid merge by integer addition. This module keeps
that state ALIVE under a streaming ingest loop with the same directory
discipline as the dedup state (``streaming/ingest.py``): each epoch
overwrites its own ``{root}/{table}/epoch=N`` directory (replay-idempotent),
and compaction folds old epochs into a single summed base version behind a
``_SUCCESS``-verified commit.

One wrinkle the dedup states don't have: histogram state is ADDITIVE, not
set-valued, so "fold then replay a folded epoch" would double-count — the
folded base already contains the epoch, and the replay rewrites a tail
directory for it. The base therefore records the highest epoch it folded
(its ``epoch`` column, one value for the whole version), and reads ignore
any tail epoch at or below that watermark: a replayed folded epoch's
rewrite is structurally invisible. (The dedup states tolerate the overlap
because their reads are set-membership; an additive state needs the
watermark.)

Read cost is O(base + tail epochs) files forever once compaction runs on a
cadence; the state itself is |groups| x |bins| rows per epoch regardless of
batch size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from momyre_spark.streaming.ingest import (
    _base_versions,
    _fs,
    _list_base_versions,
    _missing,
    _tail_epochs,
)


def record_batch_stats(
    batch_df: DataFrame,
    epoch: int,
    root: str,
    group_cols: list[str],
    value_col: str,
    boundaries: list[str],
    table: str = "_hist",
) -> None:
    """Write this epoch's histogram state under ``{root}/{table}/epoch=N``
    — one tiny (groups x bins) parquet per epoch, overwrite-idempotent on
    replay. Call from foreachBatch next to the ingest writes."""
    from momyre_spark.operators.sketches import value_histogram

    state = value_histogram(batch_df, group_cols, value_col, boundaries)
    state.write.mode("overwrite").parquet(f"{root}/{table}/epoch={epoch}")


def read_value_stats(
    spark: SparkSession,
    root: str,
    group_cols: list[str],
    epoch: int | None = None,
    table: str = "_hist",
) -> DataFrame:
    """The merged (group, bin, n) state visible to ``epoch`` (None = all
    recorded epochs): committed base + tail epochs above the base's fold
    watermark and below ``epoch``. Feed straight into
    ``sketches.quantiles_from_histogram``."""
    from momyre_spark.operators.sketches import merge_value_histograms

    tail_dir = f"{root}/{table}"
    base_dir = f"{root}/{table}_base"
    frames = []
    watermark = -1
    versions = _base_versions(spark, base_dir)
    if versions:
        base = spark.read.parquet(f"{base_dir}/v={versions[-1]}")
        watermark = base.agg(F.max("epoch")).collect()[0][0]
        watermark = -1 if watermark is None else int(watermark)
        frames.append(base.drop("epoch"))
    try:
        tail = spark.read.parquet(tail_dir).filter(
            F.col("epoch") > watermark
        )
        if epoch is not None:
            tail = tail.filter(F.col("epoch") < epoch)
        frames.append(tail.drop("epoch"))
    except AnalysisException as e:
        if not _missing(e):
            raise
    if not frames:
        return spark.createDataFrame(
            [], ", ".join(f"{c} string" for c in group_cols) + ", bin int, n bigint"
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f.select(*out.columns))
    return merge_value_histograms(out, group_cols)


def compact_value_stats(
    spark: SparkSession,
    root: str,
    group_cols: list[str],
    table: str = "_hist",
    keep_tail: int = 1,
) -> int:
    """Fold tail epochs into one SUMMED base version (merge, not concat —
    the base stays |groups| x |bins| rows however many epochs folded),
    stamped with the highest folded epoch as the read watermark. Same
    crash discipline as ``compact_ingest_state``: marker-less partial
    bases are cleaned and never read; prior state drops only after the
    new version's ``_SUCCESS`` verifies. Returns epochs folded."""
    from momyre_spark.operators.sketches import merge_value_histograms

    if keep_tail < 1:
        raise ValueError("momyre: keep_tail must be >= 1")
    tail_dir = f"{root}/{table}"
    base_dir = f"{root}/{table}_base"
    epochs = _tail_epochs(spark, tail_dir)
    to_fold = epochs[:-keep_tail]
    versions, partial = _list_base_versions(spark, base_dir)
    jvm, fs = _fs(spark, root)
    P = jvm.org.apache.hadoop.fs.Path
    for v in partial + versions[:-1]:
        fs.delete(P(f"{base_dir}/v={v}"), True)
    highest = max(versions + partial) if (versions or partial) else 0
    versions = versions[-1:]
    if not to_fold:
        return 0
    frames = []
    watermark = -1
    if versions:
        base = spark.read.parquet(f"{base_dir}/v={versions[0]}")
        watermark = base.agg(F.max("epoch")).collect()[0][0]
        watermark = -1 if watermark is None else int(watermark)
        frames.append(base.drop("epoch"))
    tail = (
        spark.read.parquet(tail_dir)
        .filter(
            (F.col("epoch") > watermark) & (F.col("epoch") <= to_fold[-1])
        )
        .drop("epoch")
    )
    frames.append(tail.select(*frames[0].columns) if frames else tail)
    merged = frames[0]
    for f in frames[1:]:
        merged = merged.unionByName(f)
    # the watermark NEVER lowers: folding a stale replayed dir (epoch below
    # the current watermark) must not re-expose already-folded epochs to a
    # future replay's double count
    new_mark = max([watermark, *to_fold])
    merged = merge_value_histograms(merged, group_cols).withColumn(
        "epoch", F.lit(new_mark).cast("long")
    )
    new_v = highest + 1
    merged.coalesce(1).write.mode("overwrite").parquet(f"{base_dir}/v={new_v}")
    if not fs.exists(P(f"{base_dir}/v={new_v}/_SUCCESS")):
        raise RuntimeError(
            f"momyre: stats base rewrite {base_dir}/v={new_v} completed "
            "without a _SUCCESS marker; refusing to drop prior state"
        )
    for e in to_fold:
        fs.delete(P(f"{tail_dir}/epoch={e}"), True)
    if versions:
        fs.delete(P(f"{base_dir}/v={versions[0]}"), True)
    return len(to_fold)


def psi_against_state(
    spark: SparkSession,
    root: str,
    current: DataFrame,
    group_cols: list[str],
    value_col: str,
    boundaries: list[str],
    table: str = "_hist",
    digits: int = 6,
) -> DataFrame:
    """Online drift monitor: PSI of ``current``'s value distribution
    against the streaming-maintained histogram state (the reference =
    everything the ingest loop has recorded so far), per group and over
    the SAME fixed grid the state uses — so the comparison is exact and
    the reference never has to be rescanned from raw data. Output:
    ``(*group_cols, n_ref, n_cur, psi)`` — Laplace-smoothed
    ``sum (p_cur - p_ref) * ln(p_cur / p_ref)`` over all grid bins
    (0.1 / 0.25 conformance bands, as operators/profile.psi_report).
    Groups absent from the reference are dropped visibly (no baseline =
    no drift statement), not reported as 0.

    Call from foreachBatch (alert before committing a drifted batch) or
    on a cadence. Cost: one histogram agg over the batch + a read of the
    |groups| x |bins| state — never the historical corpus.
    """
    from momyre_spark.functions.numeric import round_half_up
    from momyre_spark.operators.sketches import value_histogram

    n_bins = len(boundaries) + 1
    ref = read_value_stats(spark, root, group_cols, table=table)
    cur = value_histogram(current, group_cols, value_col, boundaries)

    def dense(counts: DataFrame, tag: str) -> DataFrame:
        totals = counts.groupBy(*group_cols).agg(
            F.sum("n").alias(f"__n_{tag}")
        )
        grid = totals.withColumn(
            "bin",
            F.explode(
                F.array(*[F.lit(i).cast("int") for i in range(n_bins)])
            ),
        )
        return grid.join(counts, [*group_cols, "bin"], "left").select(
            *group_cols,
            "bin",
            f"__n_{tag}",
            F.coalesce(F.col("n"), F.lit(0)).alias(f"__c_{tag}"),
        )

    joined = dense(ref, "ref").join(
        dense(cur, "cur"), [*group_cols, "bin"]
    )

    def p(tag: str):
        return (F.col(f"__c_{tag}").cast("double") + F.lit(0.5)) / (
            F.col(f"__n_{tag}").cast("double") + F.lit(0.5 * n_bins)
        )

    term = (p("cur") - p("ref")) * F.log(p("cur") / p("ref"))
    out = (
        joined.select(
            *group_cols,
            "__n_ref",
            "__n_cur",
            round_half_up(term, digits).cast("decimal(38,6)").alias("__t"),
        )
        .groupBy(*group_cols, "__n_ref", "__n_cur")
        .agg(F.sum("__t").alias("__psi"))
    )
    return out.select(
        *group_cols,
        F.col("__n_ref").alias("n_ref"),
        F.col("__n_cur").alias("n_cur"),
        F.col("__psi").cast("double").alias("psi"),
    )
