"""Deterministic sharding / splitting / sampling / packing for training data.

The operators a corpus pipeline needs between curation and the trainer:

- ``assign_shards``      : stable hash-sharding (export fan-out, data-parallel
                           reader assignment);
- ``train_val_split``    : deterministic holdout by key hash — the same doc
                           lands in the same split on every run and at every
                           scale, with no coordination;
- ``stratified_sample``  : EXACT per-stratum fractions (window rank over a
                           hash order), unlike ``df.sampleBy`` which is only
                           approximate;
- ``pack_sequences``     : contiguous token-budget packing — assign documents
                           to fixed-token-budget bins (context-window packing
                           for pretraining batches).

Everything is a pure column/window composition (no UDFs, no RNG): the
"randomness" is a hash of the key, so results are reproducible across runs,
engines and partitionings. Hashes use the md5-prefix trick (first 15 hex
chars as a 60-bit int) so a SQL oracle can recompute them bit-identically.

At 100 TB: assign_shards/train_val_split are map-only (fuse into the scan);
stratified_sample, token_budget_mixture and pack_sequences all use the
two-phase bucket decomposition (rank/cumsum inside hash-prefix buckets +
a broadcast per-bucket offset table) so no stratum — and no corpus —
ever sorts in one task; and because bins are contiguous in hash order,
downstream per-bin reads are range reads, not gathers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _key_hash(name: str) -> Column:
    """Engine-neutral 60-bit key hash: int(md5(key)[:15], 16)."""
    return F.expr(
        f"CAST(conv(substr(md5(CAST(`{name}` AS STRING)), 1, 15), 16, 10) AS BIGINT)"
    )


def _salted_hash60(id_col: str, salt: str):
    """60-bit uniform hash of (salt || id), built from Column expressions —
    NOT an interpolated SQL string, so a salt containing quotes/backslashes
    is data, not syntax. Value-identical to the previous expr form
    (conv(substr(md5(concat(...)), 1, 15), 16, 10))."""
    parts = ([F.lit(salt)] if salt else []) + [F.col(id_col).cast("string")]
    return F.conv(
        F.substring(F.md5(F.concat(*parts)), 1, 15), 16, 10
    ).cast("bigint")


def assign_shards(
    df: DataFrame, num_shards: int, id_col: str = "doc_id", out_col: str = "shard"
) -> DataFrame:
    """Stable hash-shard per row: ``md5hash(id) % num_shards``.

    Map-only; adding rows never moves existing rows between shards (unlike
    round-robin or monotonically_increasing_id schemes)."""
    return df.withColumn(
        out_col, F.pmod(_key_hash(id_col), F.lit(num_shards)).cast("bigint")
    )


def train_val_split(
    df: DataFrame,
    val_fraction: float = 0.01,
    id_col: str = "doc_id",
    out_col: str = "split",
    resolution: int = 1_000_000,
) -> DataFrame:
    """Deterministic holdout: ``val`` iff ``md5hash(id) % R < frac * R``.

    Coordination-free and stable under corpus growth — a document's split
    never changes when other documents are added or the job re-runs."""
    cut = int(val_fraction * resolution)
    return df.withColumn(
        out_col,
        F.when(
            F.pmod(_key_hash(id_col), F.lit(resolution)) < cut, F.lit("val")
        ).otherwise(F.lit("train")),
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    num_buckets: int = 256,
) -> DataFrame:
    """EXACT stratified sample: ``ceil(frac * |stratum|)`` rows per stratum.

    Rows are ranked inside each stratum by key hash (a deterministic
    pseudo-random order) and the first ``ceil(frac * n)`` kept — so the
    sample size is exact, not binomial like ``DataFrame.sampleBy``, and the
    same rows are chosen on every run. Strata missing from ``fractions``
    use ``default_fraction``.

    Skew shape: the per-stratum rank uses the two-phase bucket
    decomposition (:func:`global_shuffle` / :func:`pack_sequences`): rows
    rank locally inside (stratum, hash-prefix bucket) partitions — each
    sort bounded by ~|stratum|/num_buckets — and exact per-bucket row
    counts (a strata x buckets frame, broadcast) compose the local rank
    into the true per-stratum rank. A stratum that is the whole corpus
    no longer serializes into one task; the selection is bit-identical
    to a single per-stratum window by integer-count decomposition.
    """
    frac = F.lit(float(default_fraction))
    for k, v in fractions.items():
        frac = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(frac)
    shift = 60 - max(1, num_buckets - 1).bit_length()
    b = df.withColumn("__h", _key_hash(id_col)).withColumn(
        "__bucket", F.coalesce(F.shiftright("__h", shift), F.lit(-1))
    )
    w = Window.partitionBy(strata_col, "__bucket").orderBy(
        F.col("__h"), F.col(id_col)
    )
    woff = (
        Window.partitionBy(strata_col)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy(strata_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = (
        b.groupBy(strata_col, "__bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__cnt"))
        .withColumn(
            "__offset", F.coalesce(F.sum("__cnt").over(woff), F.lit(0))
        )
        .withColumn("__n", F.sum("__cnt").over(wall))
        .select(
            F.col(strata_col).alias("__os"),
            F.col("__bucket").alias("__ob"),
            "__offset",
            "__n",
        )
    )
    # null-safe on the stratum key: a NULL stratum is a group (window
    # semantics), so the offsets join must not drop its rows
    cond = F.col(strata_col).eqNullSafe(F.col("__os")) & (
        F.col("__bucket") == F.col("__ob")
    )
    return (
        b.withColumn("__lrk", F.row_number().over(w))
        .join(F.broadcast(offsets), cond)
        .filter(
            F.col("__offset") + F.col("__lrk")
            <= F.ceil(frac * F.col("__n"))
        )
        .drop("__h", "__bucket", "__lrk", "__os", "__ob", "__offset", "__n")
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    shard_col: str | None = None,
    bin_col: str = "bin",
    num_buckets: int = 1024,
) -> DataFrame:
    """Contiguous token-budget packing (concat-and-chunk): documents are
    laid out in hash-of-id order as one token stream cut every
    ``max_tokens``; a document's ``bin`` is the chunk index where its FIRST
    token lands.

    This is streaming context-window packing for pretraining:
    deterministic, bins are contiguous ranges of the order so per-bin
    reads stay sequential. Documents longer than ``max_tokens`` get a bin
    of their own (they must be truncated/split downstream — flagged via
    ``overflow``). With ``shard_col`` the window partitions per shard and
    bins restart per shard.

    Scale shape (the :func:`global_shuffle` two-phase decomposition — NOT
    ``Window.partitionBy()`` with no keys, which Spark executes as
    ``Exchange SinglePartition``: the whole corpus through one task's
    sort): the hash-of-id order key is uniform on [0, 2^60), so its high
    bits ARE a range partitioning of that order. Token counts cumsum
    inside each ``hash >> shift`` bucket (bounded ~N/num_buckets rows per
    sort), and a ``num_buckets``-row cumulative token-offset table —
    exact BIGint sums, so bucket-decomposed cumsums are bit-identical to
    the single global window — broadcasts back. No stage ever holds the
    global order. With ``shard_col`` the same decomposition nests inside
    each shard.
    """
    part = [shard_col] if shard_col else []
    shift = 60 - max(1, num_buckets - 1).bit_length()
    # bucket -1 collects NULL order keys (NULL id): ascending bucket order
    # puts it first, matching the single window's NULLS FIRST — and keeps
    # those rows (an equi-join on a NULL bucket would drop them).
    b = df.withColumn("__h", _key_hash(id_col)).withColumn(
        "__bucket", F.coalesce(F.shiftright("__h", shift), F.lit(-1))
    )
    w = (
        Window.partitionBy(*part, "__bucket")
        .orderBy(F.col("__h"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    woff = (
        Window.partitionBy(*part)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        b.groupBy(*part, "__bucket")
        .agg(F.sum(F.col(token_col)).cast("bigint").alias("__tok"))
        .withColumn(
            "__offset", F.coalesce(F.sum("__tok").over(woff), F.lit(0))
        )
        .select(*part, "__bucket", "__offset")
    )
    cum_local = F.sum(F.col(token_col)).over(w)
    if part:
        # null-safe on the shard key: a NULL shard is a window group and
        # must not drop out of the offsets equi-join
        offsets = offsets.withColumnRenamed(part[0], "__oshard")
        join_cond = F.col(part[0]).eqNullSafe(F.col("__oshard")) & (
            F.col("__bucket") == F.col("__obucket")
        )
    else:
        join_cond = F.col("__bucket") == F.col("__obucket")
    offsets = offsets.withColumnRenamed("__bucket", "__obucket")
    return (
        b.withColumn("__cumloc", cum_local)
        .join(F.broadcast(offsets), join_cond)
        .withColumn("__cum", F.col("__offset") + F.col("__cumloc"))
        .withColumn(
            bin_col,
            F.floor((F.col("__cum") - F.col(token_col)) / F.lit(max_tokens)).cast(
                "bigint"
            ),
        )
        .withColumn("overflow", F.col(token_col) > F.lit(max_tokens))
        .drop(
            "__h", "__bucket", "__cumloc", "__offset", "__cum",
            "__obucket", "__oshard",
        )
    )


def token_budget_mixture(
    df: DataFrame,
    budgets: dict[str, int],
    strata_col: str = "lang",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    default_budget: int = 0,
    num_buckets: int = 256,
) -> DataFrame:
    """Data-mixture sampling by TOKEN budget: per stratum (language, source,
    domain), take documents in hash-of-id order until the stratum's token
    budget is reached.

    This is how pretraining mixtures are actually specified — "200B tokens
    of web, 30B of code, 5B of math" — and differs from row-fraction
    sampling (stratified_sample) because documents have wildly different
    lengths. A document is kept iff the cumulative token count BEFORE it is
    still under budget, so each stratum overshoots by at most one document
    (the standard greedy cut) and the selection is a deterministic function
    of the ids — reproducible across runs, engines, partitionings.

    Skew shape: per-stratum cumulative token sums use the two-phase
    bucket decomposition (:func:`pack_sequences`): cumsum inside
    (stratum, hash-prefix bucket) partitions + broadcast per-bucket
    token offsets (exact BIGINT decomposition — bit-identical to a
    single per-stratum window). A stratum that is the whole corpus no
    longer serializes into one task's sort.
    """
    budget = F.lit(int(default_budget))
    for k, v in budgets.items():
        budget = F.when(F.col(strata_col) == k, F.lit(int(v))).otherwise(budget)
    shift = 60 - max(1, num_buckets - 1).bit_length()
    b = df.withColumn("__h", _key_hash(id_col)).withColumn(
        "__bucket", F.coalesce(F.shiftright("__h", shift), F.lit(-1))
    )
    w = (
        Window.partitionBy(strata_col, "__bucket")
        .orderBy(F.col("__h"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    woff = (
        Window.partitionBy(strata_col)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        b.groupBy(strata_col, "__bucket")
        .agg(F.sum(F.col(token_col)).cast("bigint").alias("__tok"))
        .withColumn(
            "__offset", F.coalesce(F.sum("__tok").over(woff), F.lit(0))
        )
        .select(
            F.col(strata_col).alias("__os"),
            F.col("__bucket").alias("__ob"),
            "__offset",
        )
    )
    cond = F.col(strata_col).eqNullSafe(F.col("__os")) & (
        F.col("__bucket") == F.col("__ob")
    )
    return (
        b.withColumn("__cumloc", F.sum(F.col(token_col)).over(w))
        .join(F.broadcast(offsets), cond)
        .filter(
            F.col("__offset") + F.col("__cumloc") - F.col(token_col) < budget
        )
        .drop("__h", "__bucket", "__cumloc", "__os", "__ob", "__offset")
    )


def temperature_mixture_report(
    df: DataFrame,
    tau: float = 0.5,
    global_budget: int | None = None,
    strata_col: str = "source",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Temperature-scaled data-mixture weights: per stratum (source, lang,
    domain), the sampling weight ``p_s ∝ n_s^tau`` — the standard
    pretraining re-balancing (XLM-R/mT5 style) that up-samples small
    sources relative to their natural share without letting any one source
    dominate. ``tau=1`` is natural proportions, ``tau=0`` uniform.

    With ``global_budget`` (total training tokens) the report also
    allocates per-stratum token budgets (feed them to
    :func:`token_budget_mixture` for the actual selection) and the implied
    epoch/repeat factor per stratum (``alloc/n_s`` — the data-constrained
    signal: an epochs value far above ~4 means the temperature is asking
    for more repetition than small-source data can usefully give).

    Shape at 100 TB: ONE hash aggregation to per-stratum token sums (rows
    = #strata, tiny), then a broadcast 1-row total — the corpus is
    touched once, map-side combined.

    Cross-engine determinism: per-stratum token sums are exact BIGINTs;
    ``n^tau`` is rounded to 6 decimals and summed as DECIMAL (exact,
    order-independent) before the weight ratio, and every emitted float is
    decimal-rounded — the oracled-floating-aggregate pattern. ``tau=0.5``
    maps to sqrt(), correctly rounded in every IEEE engine; other tau use
    pow(), whose last-ulp behavior is engine-specific (fine in production,
    not oracle-pinned).
    """
    from momyre_spark.functions.numeric import round_half_up

    per = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.sum(F.col(token_col)).cast("bigint").alias("tokens")
    )
    scaled = (
        F.sqrt(F.col("tokens").cast("double"))
        if tau == 0.5
        else F.pow(F.col("tokens").cast("double"), F.lit(float(tau)))
    )
    # decimal(38,6): 32 integer digits — n^tau for a 5e13-token stratum at
    # tau->1 is ~5e13, far past decimal(18,6)'s 12 digits, and a silent
    # NULL overflow here would drop the LARGEST stratum from the weight
    # denominator. (The cross-engine single-rounding argument needs the
    # scaled integer < 2^53 — holds through ~9e9, i.e. any tau<=0.5 corpus
    # and every oracle fixture; beyond that weights are engine-local.)
    per = per.withColumn(
        "__s", round_half_up(scaled, 6).cast("decimal(38,6)")
    )
    totals = per.agg(
        F.sum("tokens").cast("bigint").alias("__tot_tokens"),
        F.sum("__s").alias("__tot_s"),
    )
    out = (
        per.crossJoin(F.broadcast(totals))
        .select(
            "stratum",
            "tokens",
            round_half_up(
                F.col("tokens").cast("double")
                / F.col("__tot_tokens").cast("double"),
                6,
            ).alias("nat_frac"),
            round_half_up(
                F.col("__s").cast("double") / F.col("__tot_s").cast("double"),
                6,
            ).alias("weight"),
        )
    )
    if global_budget is not None:
        alloc = F.floor(F.col("weight") * F.lit(int(global_budget))).cast(
            "bigint"
        )
        out = out.withColumn("alloc_tokens", alloc).withColumn(
            "epochs",
            round_half_up(
                F.col("alloc_tokens").cast("double")
                / F.col("tokens").cast("double"),
                4,
            ),
        )
    return out.orderBy("stratum")


def materialize_mixture(
    df: DataFrame,
    epochs: dict[str, float],
    default_epochs: float = 1.0,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize a mixture as the actual repeated dataset: per stratum
    with repeat factor ``e``, every document gets ``floor(e)`` full copies
    plus ONE more iff its id-hash falls under the fractional part — the
    executable form of :func:`temperature_mixture_report`'s ``epochs``
    column (e=2.5 → two copies of everything, half the docs a third).

    Adds ``copy`` (0-based repeat index, so downstream shuffles can keep
    copies apart). e < 1 downsamples (e=0.25 keeps a quarter, zero
    copies drop the row); the fractional selection is a HASH THRESHOLD,
    not an exact window rank — approximate fraction, but MAP-ONLY: the
    whole materialization fuses into the scan with no shuffle at all,
    which is the right trade at 100 TB (an exact per-stratum cut needs a
    stratum window sort; use stratified_sample when exactness matters
    more than a shuffle). Deterministic: same doc → same copies on every
    run, engine, partitioning (md5-prefix hash, thresholds precomputed
    driver-side as integers)."""
    if any(e < 0 for e in epochs.values()) or default_epochs < 0:
        raise ValueError("momyre: epochs must be >= 0")

    def _thr(e: float) -> int:
        return int((e - int(e)) * (1 << 60))

    full = F.lit(int(default_epochs))
    thr = F.lit(_thr(default_epochs))
    for k, e in epochs.items():
        cond = F.col(strata_col) == k
        full = F.when(cond, F.lit(int(e))).otherwise(full)
        thr = F.when(cond, F.lit(_thr(e))).otherwise(thr)
    copies = (
        full + (_key_hash(id_col) < thr).cast("int")
    ).cast("int")
    seq = F.when(
        copies > 0, F.sequence(F.lit(0), copies - F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn("copy", F.explode(seq))


def sample_exact_k(
    df: DataFrame, k: int, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Deterministic uniform sample of EXACTLY ``k`` rows: the k smallest
    values of ``md5(salt || id)`` (ties broken by id). Equivalent to a
    seeded reservoir sample, but with properties a reservoir lacks:
    reproducible across runs/engines/partitionings, stable under appends
    (a new row displaces at most one sampled row), and different ``salt``
    values give independent samples (bootstrap resamples, eval subsets).

    Scale shape: this is a global top-k on the hash, NOT a global sort —
    Spark plans orderBy+limit as TakeOrderedAndProject (each partition
    keeps its local k, the driver merges P*k rows). ``df.sample()`` is
    cheaper (map-only) but only approximate in count and unstable across
    partitionings; ``RDD.takeSample`` collects to the driver. k must be
    driver-merge small (guarded at 10M).
    """
    if k > 10_000_000:
        raise ValueError(
            f"sample_exact_k(k={k}): top-k merges P*k rows on the driver; "
            "past ~10M use train_val_split fractions instead"
        )
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return (
        df.withColumn("__h", h)
        .orderBy("__h", id_col)
        .limit(k)
        .drop("__h")
    )


def global_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "",
    out_col: str = "position",
    num_buckets: int = 1024,
) -> DataFrame:
    """Deterministic global shuffle order: every row gets a dense 0-based
    ``position`` in md5-hash-of-(salt||id) order — the "shuffle the corpus
    once before training" step, reproducible across runs, engines and
    partitionings (different ``salt`` = a fresh independent permutation).

    Scale shape: NOT a single global window (Window.orderBy with no
    partition collapses to one task). The hash is uniform on [0, 2^60), so
    its high bits are already a range partitioning: rows rank locally
    within ``hash >> shift`` buckets, and each bucket adds the exact count
    of all earlier buckets (a ``num_buckets``-row cumulative offset,
    broadcast back). Two shuffles bounded by bucket size ~N/num_buckets;
    no stage sees the global order.
    """
    shift = 60 - max(1, num_buckets - 1).bit_length()
    h = _salted_hash60(id_col, salt)
    b = df.withColumn("__h", h).withColumn(
        "__bucket", F.shiftright("__h", shift)
    )
    w = Window.partitionBy("__bucket").orderBy("__h", id_col)
    offsets = (
        b.groupBy("__bucket")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__cnt").over(
                    Window.orderBy("__bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__bucket", "__offset")
    )
    return (
        b.withColumn("__rk", F.row_number().over(w) - 1)
        .join(F.broadcast(offsets), "__bucket")
        .withColumn(out_col, (F.col("__offset") + F.col("__rk")).cast("bigint"))
        .drop("__h", "__bucket", "__rk", "__offset")
    )


def sample_per_group(
    df: DataFrame,
    k: int,
    group_cols: list[str],
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic uniform sample of AT MOST ``k`` rows per group (the
    balanced-subset draw: k docs per source/language for evals, audits,
    or mixture floors). Same hash order as :func:`sample_exact_k`, but
    ranked within each group by a window — no driver merge at all, so
    group count and k are unbounded; groups smaller than k keep all rows.

    One shuffle on ``group_cols``; skew-safe for any k because only the
    per-group top-k survives the rank filter (Spark pushes the limit into
    the window sort as a partial top-k per map task).
    """
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(*group_cols).orderBy(h, F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of exactly ``k``
    rows: inclusion probability proportional to ``weight_col`` (the
    Efraimidis–Spirakis exponential race, with the hash as the uniform
    draw). Upweight curated sources, downweight crawl dumps — and get the
    same sample on every run, engine, and partitioning.

    Key per row: ``-ln(u) / w`` with ``u = (md5hash + 1) / 2^60`` in (0,1];
    the k smallest keys win. Like :func:`sample_exact_k` this plans as a
    global top-k (TakeOrderedAndProject, per-partition k then a P*k driver
    merge), never a global sort; the same 10M guard applies. Rows with
    non-positive weight are excluded (their key would be infinite).
    """
    if k > 10_000_000:
        raise ValueError(
            f"weighted_sample_k(k={k}): top-k merges P*k rows on the driver; "
            "past ~10M split the draw per shard instead"
        )
    h = _salted_hash60(id_col, salt)
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    key = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__k", key)
        .orderBy("__k", id_col)
        .limit(k)
        .drop("__k")
    )


def length_batches(
    df: DataFrame,
    batch_size: int,
    length_col: str = "n_chars",
    shard_col: str = "shard",
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed training batches: within each shard, rows sort by
    (length DESC, id) and chunk into consecutive ``batch_size`` groups, so
    every batch holds similar-length rows and padding-to-max waste stays
    low. One window per SHARD (bounded partitions — never a global sort),
    then one aggregation; all arithmetic is integer, so the report is
    bit-identical on any engine.

    Output: one row per (shard, batch_id) with ``n_rows``, ``max_len``,
    ``sum_len`` and ``padding`` (= n_rows * max_len - sum_len, the tokens a
    pad-to-max collator would waste)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(shard_col).orderBy(
        F.col(length_col).desc(), F.col(id_col)
    )
    batched = df.withColumn(
        "batch_id",
        ((F.row_number().over(w) - 1) / batch_size).cast("bigint"),
    )
    return (
        batched.groupBy(shard_col, "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max(length_col).cast("bigint").alias("max_len"),
            F.sum(length_col).cast("bigint").alias("sum_len"),
        )
        .withColumn(
            "padding",
            F.col("n_rows") * F.col("max_len") - F.col("sum_len"),
        )
    )


def dense_positions(
    df: DataFrame,
    order_col: str,
    id_col: str = "doc_id",
    out_col: str = "position",
    num_buckets: int = 256,
) -> DataFrame:
    """Dense 0-based global rank by ``(order_col, id_col)`` WITHOUT a
    single-partition window — the value-ordered sibling of global_shuffle
    (curriculum ordering, score-sorted exports, leaderboards).

    Two-pass range rank: bucket boundaries come from approximate quantiles
    of ``order_col`` (deterministic for a given dataset); a row's bucket is
    the count of boundaries strictly below its value, so EQUAL values can
    never straddle a boundary and the within-bucket window ordered by
    ``(order_col, id_col)`` composes with the exact cumulative bucket
    offsets into the true global rank. Bucket skew follows value skew —
    a single massive equal-value group degrades that bucket to its own
    window (the honest bound for any rank of that group).
    """
    bounds = sorted(
        set(
            df.approxQuantile(
                order_col,
                [i / num_buckets for i in range(1, num_buckets)],
                0.001,
            )
        )
    )
    bucket = F.lit(0)
    for x in bounds:
        bucket = bucket + F.when(F.col(order_col) > x, 1).otherwise(0)
    b = df.withColumn("__bucket", bucket)
    w = Window.partitionBy("__bucket").orderBy(order_col, id_col)
    offsets = (
        b.groupBy("__bucket")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__cnt").over(
                    Window.orderBy("__bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__bucket", "__offset")
    )
    return (
        b.withColumn("__rk", F.row_number().over(w) - 1)
        .join(F.broadcast(offsets), "__bucket")
        .withColumn(out_col, (F.col("__offset") + F.col("__rk")).cast("bigint"))
        .drop("__bucket", "__rk", "__offset")
    )


def split_leakage_report(
    df: DataFrame,
    group_col: str,
    split_col: str = "split",
) -> DataFrame:
    """Split-integrity audit: how much duplicate/near-duplicate content
    straddles the train/holdout boundary. ``group_col`` is any
    same-content key (exact fingerprint, MinHash component label, domain);
    a group whose members land in more than one split leaks — its holdout
    half is memorizable from its training half, so the holdout loss reads
    too low.

    One row: (n_groups, n_leaky_groups, n_leaky_docs, leak_frac). Cost:
    one group-keyed aggregation + a single-row rollup — the audit is one
    shuffle over (group, split) pairs regardless of corpus size. The fix
    it motivates is free: split on the GROUP key instead of the doc id
    (``train_val_split(df, id_col=group_col)``), which makes straddling
    structurally impossible — pin that with this report reading zero."""
    from momyre_spark.functions.numeric import round_half_up

    per_group = df.groupBy(group_col).agg(
        F.countDistinct(split_col).alias("__ns"),
        F.count(F.lit(1)).alias("__nd"),
    )
    leaky = F.col("__ns") > 1
    return per_group.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(leaky, 1).otherwise(0)).cast("bigint").alias("n_leaky_groups"),
        F.sum(F.when(leaky, F.col("__nd")).otherwise(0)).cast("bigint").alias("n_leaky_docs"),
        round_half_up(
            F.sum(F.when(leaky, 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("leak_frac"),
    )


def calibrate_scores(
    df: DataFrame,
    group_cols: Sequence[str],
    score_col: str,
    tiebreak_cols: Sequence[str],
    out_col: str = "calibrated",
    buckets: int = 10,
    digits: int = 6,
) -> DataFrame:
    """Per-group quantile calibration of a score column: appends
    ``out_col`` (the score's percent-rank WITHIN its group, [0,1]) and
    ``{out_col}_bucket`` (its ntile bucket, 1..buckets).

    The cross-source mixing fix: quality scores from different
    classifiers/sources live on incomparable scales, so one global
    threshold over-prunes some sources and under-prunes others.
    Calibrating each source onto its own quantile scale makes "keep the
    top 30%" mean the same thing everywhere — the standard move before
    `materialize_mixture` blends sources.

    Shape: ONE window shuffle keyed on the group; percent_rank is
    ``(rank-1)/(n-1)`` — a single division of two exact integers, so the
    output value-hashes across engines (ties share a rank by
    definition; a single-row group calibrates to 0.0). Rows with a NULL
    score are DROPPED — engines disagree on NULL ordering, and a NULL
    score has no rank (visible in the row count, never a silent
    extreme).
    """
    from momyre_spark.functions.numeric import round_half_up

    if buckets < 1:
        raise ValueError("momyre: buckets must be >= 1")
    if not tiebreak_cols:
        # ntile assigns by row POSITION: equal scores land in different
        # buckets depending on arrival order, which is partitioning-
        # dependent — a unique tiebreak makes the buckets a function of
        # the data. (percent_rank needs no tiebreak: ties share a rank.)
        raise ValueError("momyre: tiebreak_cols must be non-empty")
    groups = [F.col(c) for c in group_cols]
    wq = Window.partitionBy(*groups).orderBy(F.col(score_col))
    wt = Window.partitionBy(*groups).orderBy(
        F.col(score_col), *[F.col(c) for c in tiebreak_cols]
    )
    return (
        df.filter(F.col(score_col).isNotNull())
        .withColumn(out_col, round_half_up(F.percent_rank().over(wq), digits))
        .withColumn(f"{out_col}_bucket", F.ntile(buckets).over(wt))
    )


def fim_transform(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rate: float = 0.5,
    spm_rate: float = 0.5,
    min_chars: int = 32,
    prefix_tok: str = "<fim_prefix>",
    middle_tok: str = "<fim_middle>",
    suffix_tok: str = "<fim_suffix>",
    out_col: str = "fim_text",
    resolution: int = 1_000_000,
) -> DataFrame:
    """Fill-in-the-middle pretraining transform (Bavarian et al. 2022,
    "Efficient Training of Language Models to Fill in the Middle"): a
    hash-chosen ``rate`` of eligible documents are split at two
    hash-chosen character positions into (prefix, middle, suffix) and
    re-serialized in PSM order — or SPM for a hash-chosen ``spm_rate``
    of the transformed docs — with the untouched remainder passing
    through verbatim. Output adds ``out_col`` plus a ``fim_mode``
    column (``'psm' | 'spm' | 'none'``).

    Everything is derived from md5 of the document id (the house
    60-bit-hash recipe): WHICH docs transform, WHERE the cuts fall, and
    WHICH format — so the corpus re-serializes identically on any
    cluster layout, any partitioning, any rerun, and adding documents
    never changes existing ones (the shard/split stability contract).
    Docs shorter than ``min_chars`` never transform (a 3-char middle
    teaches nothing and the sentinel overhead dominates).

    Cut construction: with L = length, cut1 in [1, L-1] and cut2 in
    [cut1+1, L] from two salted hashes — prefix = chars [1, cut1],
    middle = (cut1, cut2], suffix = (cut2, L]; middle is always >= 1
    char, prefix >= 1, suffix >= 0 (an end-anchored middle is valid
    FIM).

    Shape: map-only — pure codegen string/hash expressions fused into
    the scan; zero shuffles at any corpus size.
    """
    if not (0.0 <= rate <= 1.0 and 0.0 <= spm_rate <= 1.0):
        raise ValueError("momyre: rate/spm_rate must be in [0, 1]")
    text = F.col(text_col)
    length = F.length(text)
    pick = F.pmod(_salted_hash60(id_col, "fim:pick"), F.lit(resolution))
    spm = F.pmod(_salted_hash60(id_col, "fim:spm"), F.lit(resolution))
    transform = (
        (length >= F.lit(int(min_chars)))
        & (pick < F.lit(int(rate * resolution)))
    )
    # cut1 in [1, L-1]; cut2 in [cut1+1, L] — both from independent salts
    cut1 = F.lit(1) + F.pmod(
        _salted_hash60(id_col, "fim:c1"), (length - F.lit(1))
    )
    cut2 = cut1 + F.lit(1) + F.pmod(
        _salted_hash60(id_col, "fim:c2"), (length - cut1)
    )
    pre = F.substring(text, F.lit(1), cut1)
    mid = F.substring(text, cut1 + F.lit(1), cut2 - cut1)
    suf = F.substring(text, cut2 + F.lit(1), length - cut2)
    psm = F.concat(
        F.lit(prefix_tok), pre, F.lit(suffix_tok), suf,
        F.lit(middle_tok), mid,
    )
    spm_text = F.concat(
        F.lit(suffix_tok), suf, F.lit(prefix_tok), pre,
        F.lit(middle_tok), mid,
    )
    use_spm = spm < F.lit(int(spm_rate * resolution))
    mode = F.when(~transform, F.lit("none")).otherwise(
        F.when(use_spm, F.lit("spm")).otherwise(F.lit("psm"))
    )
    out = F.when(~transform, text).otherwise(
        F.when(use_spm, spm_text).otherwise(psm)
    )
    return df.withColumn(out_col, out).withColumn("fim_mode", mode)


def packing_efficiency(
    df: DataFrame,
    max_tokens: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    shard_col: str | None = None,
    digits: int = 6,
) -> DataFrame:
    """Per-bin utilization report over :func:`pack_sequences`'s
    assignment — the packing-quality readout a pretraining run watches
    (average fill tells you how much context window is wasted padding;
    overflow counts tell you how much needs splitting). Output per bin:
    ``(bin, n_docs, n_tokens, overflow_docs, fill_ratio)``.

    ``fill_ratio`` can exceed 1: packing is concat-and-chunk, so a
    document whose first token lands in a bin may spill past the
    boundary — that spill is the next bin's prefix, and reporting the
    raw sum keeps the column an honest conservation check
    (sum(n_tokens) over bins == corpus total).

    Shape: the packing window (one exchange, per shard if sharded)
    followed by one hash agg on the bin id — nothing new shuffles
    beyond what pack_sequences already pays.

    Determinism: all counts exact BIGINT; the single division is
    mirrored and rounded at ``digits``.
    """
    from momyre_spark.functions.numeric import round_half_up

    packed = pack_sequences(
        df,
        max_tokens,
        token_col=token_col,
        id_col=id_col,
        shard_col=shard_col,
    )
    return (
        packed.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col(token_col)).cast("bigint").alias("n_tokens"),
            F.sum(F.col("overflow").cast("int"))
            .cast("bigint")
            .alias("overflow_docs"),
        )
        .withColumn(
            "fill_ratio",
            round_half_up(
                F.col("n_tokens").cast("double") / F.lit(float(max_tokens)),
                digits,
            ),
        )
    )


def cluster_weighted_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    key: str = "exact",
) -> DataFrame:
    """Duplicate-cluster-weighted sampling: keep each row with probability
    1/n_copies of its duplicate cluster, so every distinct CONTENT
    contributes the same expected mass to the sample — the soft
    de-biasing alternative to hard dedup (hard dedup keeps exactly one
    copy; frequency capping keeps up to k; this keeps a cluster-size-free
    expectation while preserving natural variety in which copy survives).

    ``key`` picks the cluster granularity, the same convention as the
    incremental-dedup state: ``'exact'`` (whitespace/case-normalized
    fingerprint) or ``'bow'`` (order-insensitive bag-of-words
    fingerprint — re-hosted content with shuffled boilerplate clusters
    together).

    The keep decision is DERIVED, not drawn: u = md5(id) -> uniform in
    [0,1), keep iff u * n_copies < 1 — deterministic, partition-
    invariant, replay-stable (the engine-neutral randomness recipe every
    sampling operator here uses). Every row is emitted with its verdict
    and the evidence (cluster size, u), so the output is corpus-sized
    and fully hash-oracled; downstream filters on ``kept``.

    Shape: one fingerprint projection (codegen), then ``groupBy(key).
    count()`` joined back on the key — NOT a count window. The groupBy
    gets map-side partial aggregation (a giga-cluster collapses to one
    row per input partition before the exchange) and the join back is
    AQE skew-splittable; a count window over the same key would sort
    every copy of a 10^7-duplicated boilerplate cluster into ONE task's
    buffer with no partial-agg relief. Same exchange count as exact
    dedup, skew-safe at corpus scale.
    """
    from momyre_spark.functions.text import content_fingerprint, fingerprint

    if key == "exact":
        fp = fingerprint(F.col(text_col))
    elif key == "bow":
        fp = content_fingerprint(F.col(text_col))
    else:
        raise ValueError("momyre: key must be 'exact' or 'bow'")
    u = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
        ).cast("bigint")
        / F.lit(float(1 << 60))
    )
    keyed = df.select(id_col, fp.alias("__key"))
    sizes = keyed.groupBy("__key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_copies")
    )
    return (
        keyed.join(sizes, "__key")
        .select(
            id_col,
            F.col("__key").alias("content_key"),
            "n_copies",
            u.alias("u"),
            (u * F.col("n_copies").cast("double") < F.lit(1.0)).alias(
                "kept"
            ),
        )
    )
