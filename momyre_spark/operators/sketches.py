"""Mergeable distinct-count sketches: materialize, merge, estimate.

The 100 TB pattern for maintained NDV stats: a full recount of
count(DISTINCT x) per partition/day/source is a full-corpus shuffle every
time, but a Datasketches HLL sketch is an associative, commutative
aggregate — each ingest batch contributes a small binary sketch, and the
corpus-wide (or any rollup's) distinct count is a cheap union of sketches,
never a re-scan. Spark ships the Apache DataSketches HLL family
(`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`), which this
module wraps into a maintained-stats workflow:

    sketches = ndv_sketch_table(batch, ["source"], "doc_id")   # per batch
    total    = merge_ndv_sketches(sketches_over_many_batches, ["source"])

Estimates carry the usual HLL relative error (~1.6% at lgK=12, tunable).
Sketch bytes are engine-specific (no SQL oracle); correctness is pinned by
property tests: estimate-vs-exact tolerance and the merge law
(union of per-partition sketches == sketch of the whole).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SKETCH_COL = "ndv_sketch"


def ndv_sketch_table(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketch of ``value_col`` — the mergeable unit of
    distinct-count state. One hash aggregation; the output is
    ``group_cols + [ndv_sketch BINARY]`` and is small (≤ ~2^lg_k bytes per
    group), safe to persist alongside a snapshot manifest or serving table.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col).cast("string"), F.lit(lg_k)).alias(
            SKETCH_COL
        )
    )


def merge_ndv_sketches(
    sketches: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Union sketch state per group (e.g. many batch-sketch tables unioned
    row-wise, or a finer grouping rolled up to a coarser one). Associative
    and commutative — ingest order never changes the state."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_union_agg(SKETCH_COL).alias(SKETCH_COL)
    )


def estimate_ndv(sketches: DataFrame) -> DataFrame:
    """Replace the sketch column with its distinct-count estimate."""
    keep = [c for c in sketches.columns if c != SKETCH_COL]
    return sketches.select(
        *keep,
        F.hll_sketch_estimate(SKETCH_COL).cast("bigint").alias("ndv_estimate"),
    )


def sketch_overlap_matrix(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """ESTIMATED distinct-value overlap between every group pair, with no
    pairwise join of the data — the sketch twin of
    ``dedup.cross_source_overlap`` for corpora too large to equi-join.

    Inclusion–exclusion over HLL sketches:
    ``|A ∩ B| ≈ est(A) + est(B) − est(A ∪ B)``. One hash aggregation
    builds a KB-scale sketch per group; the pair expansion then happens
    over the |groups|-row SKETCH table (all-pairs there is |groups|²/2
    rows of KB payloads — trivial), never over the corpus. Error compounds
    across three estimates (~3·1.6% of the larger set at lgK=14), so small
    overlaps between huge sets read as noise — this is the triage pass
    that decides WHICH source pairs are worth the exact join.

    Returns ``(group_a, group_b, ndv_a, ndv_b, overlap_estimate)`` with
    the overlap clamped at >= 0."""
    sk = ndv_sketch_table(df, [group_col], value_col, lg_k=lg_k)
    a = sk.select(
        F.col(group_col).alias("group_a"), F.col(SKETCH_COL).alias("__ska")
    )
    b = sk.select(
        F.col(group_col).alias("group_b"), F.col(SKETCH_COL).alias("__skb")
    )
    pairs = a.join(b, F.col("group_a") < F.col("group_b"))
    est_a = F.hll_sketch_estimate("__ska")
    est_b = F.hll_sketch_estimate("__skb")
    est_union = F.hll_sketch_estimate(F.hll_union("__ska", "__skb"))
    return pairs.select(
        "group_a",
        "group_b",
        est_a.cast("bigint").alias("ndv_a"),
        est_b.cast("bigint").alias("ndv_b"),
        F.greatest(
            (est_a + est_b - est_union).cast("bigint"), F.lit(0)
        ).alias("overlap_estimate"),
    )


# ---------------------------------------------------------------------------
# Mergeable quantile state: fixed geometric histogram
# ---------------------------------------------------------------------------
#
# The same 100 TB maintenance argument as the NDV sketches, for percentiles:
# an exact percentile (or approx_percentile) over a maintained corpus is a
# full re-scan per refresh, but a histogram over a FIXED bin grid is an
# associative, commutative aggregate — per-batch bin counts merge by
# integer addition, and any rollup's quantiles read off the merged counts.
# A geometric (log-spaced) grid bounds the RELATIVE error of every estimate
# by its bin ratio (10^(1/per_decade) − 1, ~7.5% at 32 bins/decade), the
# right guarantee for positive heavy-tailed metrics (sizes, latencies,
# token counts). Unlike HLL bytes the state is engine-neutral — plain
# (group, bin, n) rows — so the whole path carries a value-hash SQL oracle.
#
# Determinism: bin boundaries are DECIMAL literals generated once in Python
# and shared verbatim with the oracle; assignment compares the value
# (rounded half-up to 6 decimals, cast DECIMAL) against them — no floats,
# no log() calls, bit-identical in any engine and under any partitioning.

QUANTILE_VALUE_SCALE = 6  # decimals the value is rounded to before binning


def geometric_boundaries(
    lo_decade: int = -2, hi_decade: int = 3, per_decade: int = 32
) -> list[str]:
    """Geometric bin edges 10^lo .. 10^hi as exact 6-decimal string
    literals — the shared vocabulary between engine state and SQL oracle.
    The grid must cover the data's positive range: values below the first
    edge land in bin 0 (estimate = first edge), values at or above the
    last edge land in the unbounded overflow bin (estimate = NULL), so an
    undersized grid is visible in the output, never silently wrong."""
    n = (hi_decade - lo_decade) * per_decade
    out = []
    for i in range(n + 1):
        v = 10.0 ** (lo_decade + i / per_decade)
        out.append(f"{v:.6f}")
    return out


def _boundary_array(boundaries: list[str]):
    from decimal import Decimal

    return F.array(
        *[F.lit(Decimal(b)).cast("decimal(18,6)") for b in boundaries]
    )


def _bin_search_expr(val, boundaries: list[str]):
    """Number of boundaries <= val as an unrolled binary-search WHEN tree:
    log2(|edges|) exact DECIMAL comparisons per row, and — deliberately —
    no higher-order function: a lambda capturing an outer column breaks
    Spark's attribute dedup when two states built from the same source are
    unioned (the exact shape every merge caller has).

    Built as ONE parsed SQL string, not a ``F.when`` Column tree — the
    srp/minhash-wide lesson (``_srp_bucket_sql``): a |edges|-literal
    Column tree costs one py4j round trip per ``F.lit``/``F.when`` call
    (measured ~2s of pure driver-side Python per histogram build at 161
    edges); one ``F.expr`` parse of the identical CASE tree is flat. The
    parsed tree is the same Catalyst expression, so bins — and every
    value-hash oracle over them — are unchanged.

    ``val`` is the NAME of a DECIMAL(18,6) column already bound on the
    frame (the caller projects it first), so the CASE text references a
    plain attribute."""

    def go(lo: int, hi: int) -> str:
        # invariant: edges[:lo] <= val, edges[hi:] > val; answer in [lo, hi]
        if lo == hi:
            return str(lo)
        mid = (lo + hi) // 2
        return (
            f"(CASE WHEN `{val}` >= CAST('{boundaries[mid]}' AS "
            f"DECIMAL(18,6)) THEN {go(mid + 1, hi)} ELSE {go(lo, mid)} END)"
        )

    return F.expr(go(0, len(boundaries)))


def value_histogram(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    boundaries: list[str],
) -> DataFrame:
    """Per-group geometric-histogram state: ``group_cols + (bin, n)``.

    ``bin`` = number of boundaries <= value (binary-search WHEN tree of
    DECIMAL comparisons against the literal grid — exact). One hash
    aggregation with map-side partial combine; the state is <=
    len(boundaries)+1 rows per group whatever the input size, safe to
    persist per ingest batch.

    NULL values are EXCLUDED from the distribution (the standard
    percentile contract) — without the filter every NULL comparison would
    descend the low branch and silently count as the smallest value. NaN
    is excluded alongside NULL (it casts to a NULL decimal, which would
    otherwise be indistinguishable from overflow). Values whose DECIMAL
    cast overflows (|v| >= 1e12 at scale 6) cannot enter the WHEN tree —
    every NULL comparison is false and would descend to bin 0, silently
    counting extremes as the SMALLEST value; instead they are routed by
    sign: positive overflow to the unbounded overflow bin
    (len(boundaries), estimate = NULL downstream — visible, never
    fabricated), negative overflow to bin 0 (below the first edge, same
    as any other sub-grid value)."""
    from momyre_spark.functions.numeric import round_half_up

    raw = F.col(value_col).cast("double")
    rd = round_half_up(raw, QUANTILE_VALUE_SCALE)
    # range-guard BEFORE the decimal cast: |v| >= 1e12 cannot fit
    # DECIMAL(18,6) — under ANSI the cast would throw, under non-ANSI it
    # NULLs (and a NULL comparison descends the WHEN tree to bin 0)
    in_range = (rd > F.lit(-1.0e12)) & (rd < F.lit(1.0e12))
    val = (
        F.when(in_range, rd).otherwise(F.lit(None)).cast("decimal(18,6)")
    )
    # the decimal value is BOUND to a projection first so the parsed CASE
    # tree (see _bin_search_expr) reads one attribute, not a repeated
    # subexpression
    bin_expr = (
        F.when(F.col("__vq_val").isNull() & (raw < 0), F.lit(0))
        .when(F.col("__vq_val").isNull(), F.lit(len(boundaries)))
        .otherwise(_bin_search_expr("__vq_val", boundaries))
    )
    return (
        df.filter(F.col(value_col).isNotNull() & ~F.isnan(raw))
        .withColumn("__vq_val", val)
        .withColumn("bin", bin_expr.cast("int"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def merge_value_histograms(
    states: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Merge histogram states (e.g. many batch states unioned row-wise, or
    a finer grouping rolled up): integer addition per (group, bin) —
    associative, commutative, ingest-order-free."""
    return states.groupBy(*group_cols, "bin").agg(
        F.sum("n").cast("bigint").alias("n")
    )


def quantiles_from_histogram(
    state: DataFrame,
    group_cols: list[str],
    boundaries: list[str],
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Read quantile estimates off histogram state: for each q, the UPPER
    edge of the bin where the cumulative count first reaches ceil(q·n) —
    an overestimate by at most one bin ratio of the true quantile (tested).
    Overflow-bin hits surface as NULL estimates (grid too small), never a
    fabricated number.

    Cost: the state is bins x groups rows — the window and join here are
    over KB of data regardless of corpus size. Output:
    ``group_cols + (q, n_total, est)``."""
    spark = state.sparkSession
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # n_total rides the same frame as the running sum (no self-join of the
    # state), so the whole read is one window pass + one tiny broadcast
    cum = state.withColumn("cum", F.sum("n").over(w)).withColumn(
        "n_total",
        F.sum("n").over(Window.partitionBy(*group_cols)).cast("bigint"),
    )
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    # rank in DECIMAL: ceil(q*n) in doubles can land on either side of an
    # integer depending on the engine's rounding; the decimal product is
    # exact, so the rank (and therefore the chosen bin) is engine-stable
    sel = (
        cum.crossJoin(F.broadcast(qdf))
        .withColumn(
            "rank",
            F.ceil(F.col("q").cast("decimal(10,6)") * F.col("n_total")).cast(
                "bigint"
            ),
        )
        .filter(F.col("cum") >= F.col("rank"))
        .groupBy(*group_cols, "q", "n_total")
        .agg(F.min("bin").alias("__bin"))
    )
    bl = _boundary_array(boundaries)
    est = F.when(
        F.col("__bin") < F.lit(len(boundaries)),
        F.element_at(bl, F.col("__bin") + 1).cast("double"),
    )
    return sel.select(*group_cols, "q", "n_total", est.alias("est"))
