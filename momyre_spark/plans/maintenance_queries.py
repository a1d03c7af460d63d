"""Maintenance-surface queries: SCD2 history, incremental aggregate
maintenance, table stats profiling, bounded-memory grouped top-k, and
random-projection embedding reduction.

These extend the CDC/analytics surface with the operations a warehouse
maintains *around* the replicated tables: history tracking
(operators/scd.py), delta-folded aggregates (operators/incremental.py),
ANALYZE-style column stats (operators/profile.py), and the two-level
top-k (operators/topk.py). Each carries a full DuckDB value-hash oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from momyre_spark.functions.numeric import round4_sql, round_half_up
from momyre_spark.plans import query
from momyre_spark.sources.parquet import load_table

_OPS_SQL = """
    SELECT user_id AS _id, CAST(ts AS TIMESTAMP) AS ts, event_id,
           CASE event_type WHEN 'signup' THEN 'insert'
                           WHEN 'error'  THEN 'delete'
                           ELSE 'update' END AS op,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
"""


# --------------------------------------------------------------------------
# SCD Type-2 history (operators/scd.py): every non-delete op opens a
# validity interval, closed by the key's next op. The reference only keeps
# latest state (mysql.go:292-355); this is the time-travel view of the same
# ops stream. ONE shuffle + one window sort.
# --------------------------------------------------------------------------
@query(
    "cdc_scd2_history",
    oracle=f"""
    WITH ops AS ({_OPS_SQL}),
    v AS (
        SELECT _id, k, op, ts, event_id,
               lead(ts) OVER (PARTITION BY _id ORDER BY ts, event_id) AS valid_to
        FROM ops
    )
    SELECT _id, k, epoch_us(ts) AS valid_from_us, event_id AS valid_from_event_id,
           epoch_us(valid_to) AS valid_to_us, valid_to IS NULL AS is_current
    FROM v WHERE op <> 'delete'
    ORDER BY _id, valid_from_us, valid_from_event_id
    """,
)
def cdc_scd2_history(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.scd import scd2_history

    ev = load_table(spark, sf, "events")
    ops = ev.select(
        F.col("user_id").alias("_id"),
        "ts",
        "event_id",
        F.when(F.col("event_type") == "signup", F.lit("insert"))
        .when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("op"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    hist = scd2_history(
        ops, key="_id", order=("ts", "event_id"), value_cols=("k",)
    )
    return hist.select(
        "_id",
        "k",
        F.unix_micros("valid_from_ts").alias("valid_from_us"),
        F.col("valid_from_event_id"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "is_current",
    ).orderBy("_id", "valid_from_us", "valid_from_event_id")


# --------------------------------------------------------------------------
# Incremental aggregate maintenance (operators/incremental.py): the
# maintained per-user aggregate over "yesterday" (ts < cutoff) folded with
# the delta (ts >= cutoff) — result must equal the full recompute, which IS
# the oracle. The base table is never rescanned; only the delta aggregates.
# --------------------------------------------------------------------------
_CUTOFF = "2024-01-20 00:00:00"

@query(
    "cdc_incremental_agg",
    oracle=f"""
    SELECT user_id,
           count(*) AS cnt,
           {round4_sql('sum(value)')} AS sum_value,
           {round4_sql('min(value)')} AS min_value,
           {round4_sql('max(value)')} AS max_value
    FROM events
    GROUP BY user_id ORDER BY user_id
    """,
)
def cdc_incremental_agg(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.incremental import (
        aggregate_delta,
        merge_aggregates,
    )

    aggs = {
        "cnt": ("count", None),
        "sum_value": ("sum", "value"),
        "min_value": ("min", "value"),
        "max_value": ("max", "value"),
    }
    ev = load_table(spark, sf, "events").select("user_id", "ts", "value")
    cutoff = F.expr(f"TIMESTAMP '{_CUTOFF}'")
    # the maintained aggregate (in production: a stored table, not a scan)
    base_agg = aggregate_delta(
        ev.filter(F.col("ts") < cutoff), ["user_id"], aggs
    )
    delta = ev.filter(F.col("ts") >= cutoff)
    merged = merge_aggregates(base_agg, delta, ["user_id"], aggs)
    return merged.select(
        "user_id",
        "cnt",
        round_half_up(F.col("sum_value"), 4).alias("sum_value"),
        round_half_up(F.col("min_value"), 4).alias("min_value"),
        round_half_up(F.col("max_value"), 4).alias("max_value"),
    ).orderBy("user_id")


# --------------------------------------------------------------------------
# ANALYZE-style column stats in one scan (operators/profile.py). The query
# pins the exact-NDV path; at 100 TB the operator defaults to HLL++ NDVs
# (no Expand in the plan).
# --------------------------------------------------------------------------
_PROFILE_COLS = ("l_quantity", "l_discount", "l_returnflag", "l_linestatus")


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        num = c in ("l_quantity", "l_discount")
        if num:
            mn, mx = (
                f"{round4_sql(f'min({c})')}",
                f"{round4_sql(f'max({c})')}",
            )
            ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
        else:
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            ms, xs = f"CAST(min({c}) AS VARCHAR)", f"CAST(max({c}) AS VARCHAR)"
        parts.append(
            f"SELECT '{c}' AS col_name, count(*) AS n_rows, "
            f"count(*) - count({c}) AS n_nulls, "
            f"count(DISTINCT {c}) AS ndv, {mn} AS min_num, {mx} AS max_num, "
            f"{ms} AS min_str, {xs} AS max_str FROM lineitem"
        )
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


@query("stats_profile", oracle=_profile_oracle())
def stats_profile(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import profile_columns

    li = load_table(spark, sf, "lineitem")
    return profile_columns(li, list(_PROFILE_COLS), exact_ndv=True).orderBy(
        "col_name"
    )


# Fixed-bound equi-width histograms (operators/profile.column_histogram):
# one scan, one tiny (cols*bins)-cardinality aggregation. Fixed bounds keep
# the arithmetic bit-identical across engines: bin = floor((x-lo)/width),
# clamped to the edge bins.
_HIST_SPECS = {
    "l_quantity": (0.0, 50.0, 10),
    "l_discount": (0.0, 0.1, 5),
    "l_extendedprice": (0.0, 110000.0, 11),
}


def _hist_oracle() -> str:
    parts = []
    for c, (lo, hi, bins) in _HIST_SPECS.items():
        width = (hi - lo) / bins
        b = f"least(greatest(floor((CAST({c} AS DOUBLE) - {lo!r}) / {width!r}), 0), {bins - 1})"
        parts.append(
            f"SELECT '{c}' AS col_name, CAST({b} AS BIGINT) AS bin, "
            f"{lo!r} + {b} * {width!r} AS lo, "
            f"{lo!r} + ({b} + 1) * {width!r} AS hi, "
            f"count(*) AS cnt FROM lineitem WHERE {c} IS NOT NULL "
            f"GROUP BY 1, 2, 3, 4"
        )
    return " UNION ALL ".join(parts) + " ORDER BY col_name, bin"


@query("stats_histogram", oracle=_hist_oracle())
def stats_histogram(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import column_histogram

    li = load_table(spark, sf, "lineitem")
    return column_histogram(li, _HIST_SPECS).orderBy("col_name", "bin")


# The 100 TB default: HLL++ NDVs keep the aggregate a plain partial+final
# hash agg (no Expand duplicating every row once per distinct-agg). No SQL
# oracle — HLL sketches aren't cross-engine reproducible; the driver records
# a rows-only check and tests/test_maintenance_ops.py bounds the estimate
# against the exact NDV (±5%).
@query("stats_profile_approx")
def stats_profile_approx(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import profile_columns

    li = load_table(spark, sf, "lineitem")
    return profile_columns(li, list(_PROFILE_COLS), exact_ndv=False).orderBy(
        "col_name"
    )


# --------------------------------------------------------------------------
# Bounded-memory grouped top-k (operators/topk.py): top-3 customers per
# nation by balance, merged from salted partial top-ks — never sorts a whole
# group. Oracle is the window-function formulation.
# --------------------------------------------------------------------------
@query(
    "agg_grouped_topk",
    oracle="""
    SELECT c_nationkey, CAST(rank AS BIGINT) AS rank, c_acctbal, c_custkey
    FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               row_number() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey DESC
               ) AS rank
        FROM customer
    ) WHERE rank <= 3
    ORDER BY c_nationkey, rank
    """,
)
def agg_grouped_topk(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.topk import grouped_topk

    cust = load_table(spark, sf, "customer")
    return (
        grouped_topk(
            cust,
            group_cols=["c_nationkey"],
            order_col="c_acctbal",
            k=3,
            payload_cols=["c_custkey"],
            descending=True,
        )
        .select(
            "c_nationkey",
            F.col("rank").cast("bigint").alias("rank"),
            "c_acctbal",
            "c_custkey",
        )
        .orderBy("c_nationkey", "rank")
    )


# --------------------------------------------------------------------------
# Random-projection dimensionality reduction (functions/embeddings.project):
# 64 -> 8 dims with a seeded JL matrix whose 4-decimal literals are embedded
# in BOTH plans, so Spark's fold and DuckDB's list_dot_product multiply
# identical numbers. Map-only, fused into the scan.
#
# The projected vector is emitted as a "[a,b,...]" STRING, not
# array<double>: the driver's pandas canonicalizer cannot factorize an
# array column (r02 err: unhashable numpy.ndarray). Each element goes
# through round_half_up -> DECIMAL(20,4) -> string on both engines, which
# sidesteps their different double->string shortest-repr formatting.
# --------------------------------------------------------------------------
_RP_OUT = 8
_RP_SEED = 7


def _rp_matrix() -> list[list[float]]:
    from momyre_spark.functions.embeddings import projection_matrix

    return projection_matrix(64, _RP_OUT, seed=_RP_SEED)


def _rp_oracle() -> str:
    rows = _rp_matrix()
    elems = ", ".join(
        "CAST(CAST("
        + round4_sql(
            "list_dot_product(embedding::DOUBLE[], ["
            + ",".join(repr(x) for x in row)
            + "]::DOUBLE[])"
        )
        + " AS DECIMAL(20,4)) AS VARCHAR)"
        for row in rows
    )
    return (
        f"SELECT vec_id, '[' || concat_ws(',', {elems}) || ']' AS proj "
        "FROM embeddings ORDER BY vec_id"
    )


@query("emb_random_projection", oracle=_rp_oracle())
def emb_random_projection(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions.embeddings import project

    emb = load_table(spark, sf, "embeddings")
    proj = project(F.col("embedding"), _rp_matrix())
    rounded = F.transform(
        proj,
        lambda x: round_half_up(x, 4).cast("decimal(20,4)").cast("string"),
    )
    return emb.select(
        "vec_id",
        F.concat(F.lit("["), F.concat_ws(",", rounded), F.lit("]")).alias(
            "proj"
        ),
    ).orderBy("vec_id")


# --------------------------------------------------------------------------
# Mergeable NDV sketch state (operators/sketches.py): per-source distinct
# doc_id estimates from HLL sketches. No SQL oracle — DataSketches HLL
# bytes/estimates are engine-specific; the driver records a rows-only
# check, and tests/test_sketches.py pins tolerance-vs-exact and the merge
# law (union of per-batch sketches == sketch of the whole).
# --------------------------------------------------------------------------
@query("stats_ndv_sketch")
def stats_ndv_sketch(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.sketches import estimate_ndv, ndv_sketch_table

    docs = load_table(spark, sf, "documents")
    return estimate_ndv(ndv_sketch_table(docs, ["source"], "doc_id")).orderBy(
        "source"
    )


# --------------------------------------------------------------------------
# Distributed PCA (operators/pca.py): moments on the cluster (one scan,
# O(d^2) to the driver), eigh on the driver, map-only literal-matrix
# projection back on the cluster. No SQL oracle (eigen-decomposition);
# rows-only driver check + tests/test_pca.py property suite (orthonormal
# components, numpy parity, partitioning invariance, whitening variance,
# JL-beating reconstruction).
# --------------------------------------------------------------------------
@query("emb_pca_project")
def emb_pca_project(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.pca import apply_pca, train_pca

    emb = load_table(spark, sf, "embeddings")
    model = train_pca(emb, k=8)
    proj = apply_pca(emb, model)
    return proj.select(
        "vec_id",
        F.concat_ws(
            ",",
            F.transform(
                F.col("pca"),
                lambda x: (F.floor(x * 10000 + F.lit(0.5)) / 10000.0).cast(
                    "string"
                ),
            ),
        ).alias("pca"),
    ).orderBy("vec_id")


# --------------------------------------------------------------------------
# Sketch mergeability on the time axis (operators/sketches.py): hourly HLL
# sketches of active users merged into daily distinct counts WITHOUT
# rescanning events — the maintained-rollup shape (each ingest hour adds a
# sketch row; any coarser rollup is a union of sketch state). Rows-only
# (sketch bytes engine-specific); tests/test_sketches.py pins the merge
# law, and the hourly->daily rollup here is the same union path.
# --------------------------------------------------------------------------
@query("stats_window_ndv_sketch")
def stats_window_ndv_sketch(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.sketches import (
        estimate_ndv,
        merge_ndv_sketches,
        ndv_sketch_table,
    )

    ev = load_table(spark, sf, "events").select(
        F.date_trunc("hour", "ts").cast("date").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        "user_id",
    )
    hourly = ndv_sketch_table(ev, ["day", "hour"], "user_id")
    daily = merge_ndv_sketches(hourly.drop("hour"), ["day"])
    return (
        estimate_ndv(daily)
        .select(F.col("day").cast("string").alias("day"), "ndv_estimate")
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Pairwise correlation matrix in ONE scan (ANALYZE depth): moments are
# DECIMAL-exact (inputs rounded to DECIMAL(18,4), products/sums exact
# integer arithmetic), and the final Pearson formula runs the identical
# double-op sequence on both engines — fold-order float drift never enters
# an aggregate. 4 columns -> 6 pairs from one scan's moment set.
# --------------------------------------------------------------------------
_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_pairs():
    cols = _CORR_COLS
    return [(cols[i], cols[j]) for i in range(len(cols))
            for j in range(i + 1, len(cols))]


def _corr_oracle() -> str:
    moments = ["count(*) AS n"]
    for c in _CORR_COLS:
        d = f"CAST(floor({c} * 10000 + 0.5) / 10000.0 AS DECIMAL(18,4))"
        moments.append(f"sum(CAST({d} AS DECIMAL(38,8))) AS s_{c}")
        moments.append(f"sum(CAST({d} AS DECIMAL(38,8)) * {d}) AS q_{c}")
    for a, b in _corr_pairs():
        da = f"CAST(floor({a} * 10000 + 0.5) / 10000.0 AS DECIMAL(18,4))"
        db = f"CAST(floor({b} * 10000 + 0.5) / 10000.0 AS DECIMAL(18,4))"
        moments.append(f"sum(CAST({da} AS DECIMAL(38,8)) * {db}) AS x_{a}_{b}")
    selects = []
    for a, b in _corr_pairs():
        corr = (
            f"(n * CAST(x_{a}_{b} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
            f" / sqrt(n * CAST(q_{a} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
            f" / sqrt(n * CAST(q_{b} AS DOUBLE)"
            f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
        )
        selects.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, CAST(n AS BIGINT) AS n, "
            f"floor(({corr}) * 10000 + 0.5) / 10000.0 AS corr FROM m"
        )
    return (
        "WITH m AS (SELECT " + ", ".join(moments) + " FROM lineitem) "
        + " UNION ALL ".join(selects)
        + " ORDER BY col_a, col_b"
    )


@query("stats_corr_matrix", oracle=_corr_oracle())
def stats_corr_matrix(spark: SparkSession, sf: str) -> DataFrame:
    from functools import reduce

    li = load_table(spark, sf, "lineitem")
    dec = {
        c: round_half_up(F.col(c), 4).cast("decimal(18,4)")
        for c in _CORR_COLS
    }
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _CORR_COLS:
        aggs.append(
            F.sum(dec[c].cast("decimal(38,8)")).alias(f"s_{c}")
        )
        aggs.append(
            F.sum(dec[c].cast("decimal(38,8)") * dec[c]).alias(f"q_{c}")
        )
    for a, b in _corr_pairs():
        aggs.append(
            F.sum(dec[a].cast("decimal(38,8)") * dec[b]).alias(f"x_{a}_{b}")
        )
    m = li.agg(*aggs)

    outs = []
    for a, b in _corr_pairs():
        n = F.col("n")
        sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        qa, qb = F.col(f"q_{a}").cast("double"), F.col(f"q_{b}").cast("double")
        xab = F.col(f"x_{a}_{b}").cast("double")
        corr = (
            (n * xab - sa * sb)
            / F.sqrt(n * qa - sa * sa)
            / F.sqrt(n * qb - sb * sb)
        )
        outs.append(
            m.select(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                n.cast("bigint").alias("n"),
                round_half_up(corr, 4).alias("corr"),
            )
        )
    return reduce(lambda x, y: x.unionByName(y), outs).orderBy(
        "col_a", "col_b"
    )


# --------------------------------------------------------------------------
# Sketch-estimated cross-source overlap (operators/sketches.
# sketch_overlap_matrix): the join-free triage twin of dedup_cross_source.
# HLL estimates are engine-specific (rows-only); accuracy vs the exact
# overlap and the no-corpus-join shape are pinned in test_sketches.py.
# --------------------------------------------------------------------------
@query("stats_source_overlap_sketch")
def stats_source_overlap_sketch(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions.text import fingerprint
    from momyre_spark.operators.sketches import sketch_overlap_matrix

    docs = load_table(spark, sf, "documents")
    fps = docs.select(
        F.col("source"), fingerprint(F.col("text")).alias("fp")
    )
    return sketch_overlap_matrix(fps, "source", "fp").orderBy(
        "group_a", "group_b"
    )


# --------------------------------------------------------------------------
# Mergeable geometric-histogram quantiles (operators/sketches.py): the
# maintained-percentile pattern — per-batch (group, bin, n) states merge by
# integer addition; quantiles read off the merged counts. Unlike HLL bytes
# the state is engine-neutral, so the WHOLE path (state -> merge -> read)
# composes in SQL and carries a full value-hash oracle. The merge law is
# part of the query: the state is built as two half-states (event_id
# parity) merged, which must equal the single-pass state.
# --------------------------------------------------------------------------
def _quantile_oracle() -> str:
    from momyre_spark.operators.sketches import geometric_boundaries

    bl = "[" + ", ".join(geometric_boundaries(-2, 3, 32)) + "]::DECIMAL(18,6)[]"
    n_edges = len(geometric_boundaries(-2, 3, 32))
    return f"""
    WITH v AS (
        SELECT event_type, event_id,
               CAST(floor(CAST(value AS DOUBLE) * 1000000 + 0.5) / 1000000.0
                    AS DECIMAL(18,6)) AS val
        FROM events
    ),
    h AS (
        SELECT event_type, len(list_filter({bl}, b -> b <= val)) AS bin,
               CAST(count(*) AS BIGINT) AS n
        FROM v GROUP BY 1, 2
    ),
    c AS (
        SELECT *, sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
               sum(n) OVER (PARTITION BY event_type) AS n_total
        FROM h
    ),
    r AS (
        SELECT event_type, n_total, q.q,
               CAST(ceil(CAST(q.q AS DECIMAL(10,6)) * n_total) AS BIGINT) AS rank
        FROM (SELECT DISTINCT event_type, n_total FROM c)
        CROSS JOIN (SELECT unnest([0.5, 0.95, 0.99]) AS q) q
    ),
    sel AS (
        SELECT r.event_type, r.q, r.n_total, min(c.bin) AS bin
        FROM r JOIN c ON c.event_type = r.event_type AND c.cum >= r.rank
        GROUP BY 1, 2, 3
    )
    SELECT event_type, CAST(q AS DOUBLE) AS q,
           CAST(n_total AS BIGINT) AS n_total,
           CASE WHEN bin < {n_edges}
                THEN CAST(list_extract({bl}, bin + 1) AS DOUBLE) END AS est
    FROM sel ORDER BY event_type, q
    """


@query("stats_value_quantiles", oracle=_quantile_oracle())
def stats_value_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.sketches import (
        geometric_boundaries,
        merge_value_histograms,
        quantiles_from_histogram,
        value_histogram,
    )

    bl = geometric_boundaries(-2, 3, 32)
    ev = load_table(spark, sf, "events")
    # two per-"batch" states (event_id parity stands in for ingest epochs)
    # merged — the maintained path; the oracle computes the single pass,
    # so a hash match IS the merge law checked end-to-end. The two epoch
    # states are built in ONE pass (epoch in the state's group key, the
    # same rollup shape the hourly->daily query uses) instead of two
    # parity-filtered scans: the 161-edge binary-search bin tree — the
    # query's whole compile+execute cost — is planned and codegen'd once,
    # and the merge is the same integer addition over the same per-epoch
    # rows, so the result (and the oracle) is bit-identical.
    ev2 = ev.withColumn("__epoch", (F.col("event_id") % 2).cast("int"))
    fine = value_histogram(ev2, ["event_type", "__epoch"], "value", bl)
    merged = merge_value_histograms(fine.drop("__epoch"), ["event_type"])
    return quantiles_from_histogram(
        merged, ["event_type"], bl, qs=(0.5, 0.95, 0.99)
    ).orderBy("event_type", "q")


# --------------------------------------------------------------------------
# Windowed maintained quantiles: HOURLY histogram states roll up to DAILY
# p50/p95 by integer addition — the time-dimension version of the merge
# law (the window an ops dashboard actually reads). The oracle computes
# the daily quantiles in one pass; a hash match proves the rollup.
# --------------------------------------------------------------------------
def _window_quantile_oracle() -> str:
    from momyre_spark.operators.sketches import geometric_boundaries

    bl = "[" + ", ".join(geometric_boundaries(-2, 3, 32)) + "]::DECIMAL(18,6)[]"
    n_edges = len(geometric_boundaries(-2, 3, 32))
    return f"""
    WITH v AS (
        SELECT CAST(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS VARCHAR) AS day,
               CAST(floor(CAST(value AS DOUBLE) * 1000000 + 0.5) / 1000000.0
                    AS DECIMAL(18,6)) AS val
        FROM events
    ),
    h AS (
        SELECT day, len(list_filter({bl}, b -> b <= val)) AS bin,
               CAST(count(*) AS BIGINT) AS n
        FROM v GROUP BY 1, 2
    ),
    c AS (
        SELECT *, sum(n) OVER (PARTITION BY day ORDER BY bin) AS cum,
               sum(n) OVER (PARTITION BY day) AS n_total
        FROM h
    ),
    sel AS (
        SELECT c.day, q.q, c.n_total, min(c.bin) AS bin
        FROM c CROSS JOIN (SELECT unnest([0.5, 0.95]) AS q) q
        WHERE c.cum >= CAST(ceil(CAST(q.q AS DECIMAL(10,6)) * c.n_total) AS BIGINT)
        GROUP BY 1, 2, 3
    )
    SELECT day, CAST(q AS DOUBLE) AS q, CAST(n_total AS BIGINT) AS n_total,
           CASE WHEN bin < {n_edges}
                THEN CAST(list_extract({bl}, bin + 1) AS DOUBLE) END AS est
    FROM sel ORDER BY day, q
    """


@query("stats_window_quantiles", oracle=_window_quantile_oracle())
def stats_window_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.sketches import (
        geometric_boundaries,
        merge_value_histograms,
        quantiles_from_histogram,
        value_histogram,
    )

    bl = geometric_boundaries(-2, 3, 32)
    ev = load_table(spark, sf, "events").select(
        F.date_trunc("day", "ts").cast("date").cast("string").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        "value",
    )
    hourly = value_histogram(ev, ["day", "hour"], "value", bl)
    daily = merge_value_histograms(hourly.drop("hour"), ["day"])
    return quantiles_from_histogram(daily, ["day"], bl, qs=(0.5, 0.95)).orderBy(
        "day", "q"
    )


# --------------------------------------------------------------------------
# Incremental JOIN-view maintenance (operators/incremental.
# refresh_join_from_cdf): the dirty-key strategy — rows of the maintained
# orders x customer view whose join key no change touched carry over
# untouched; dirty neighborhoods recompute from current state. The batch
# simulates all three change shapes (inserts, a non-key column update on
# the customer side, and a JOIN-KEY-MOVING update on the orders side —
# the case that dirties both the old and new key). The oracle is simply
# the full join of the new state: a hash match proves the maintenance.
# --------------------------------------------------------------------------
@query(
    "cdc_join_view_refresh",
    oracle=f"""
    SELECT o_orderkey, o_custkey AS custkey, c_name,
           {round4_sql('o_totalprice')} AS o_totalprice,
           {round4_sql('c_acctbal')} AS acctbal
    FROM orders JOIN customer ON o_custkey = c_custkey
    ORDER BY o_orderkey
    """,
)
def cdc_join_view_refresh(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.incremental import refresh_join_from_cdf

    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    ins = F.col("o_orderkey") % 7 == 0          # rows absent yesterday
    moved = (F.col("o_orderkey") % 97 == 0) & ~ins  # join key moved today
    old_key = (F.col("o_custkey") % 100) + 1
    upd_c = F.col("c_custkey") % 50 == 0        # non-key column updated

    def left_side(as_of_v1: bool) -> DataFrame:
        key = (
            F.when(moved, old_key).otherwise(F.col("o_custkey"))
            if as_of_v1
            else F.col("o_custkey")
        )
        df = orders.select(
            key.alias("custkey"), "o_orderkey", "o_totalprice"
        )
        return df.filter(~ins) if as_of_v1 else df

    def right_side(as_of_v1: bool) -> DataFrame:
        bal = (
            F.when(upd_c, F.col("c_acctbal") + 100).otherwise(F.col("c_acctbal"))
            if as_of_v1
            else F.col("c_acctbal")
        )
        return customer.select(
            F.col("c_custkey").alias("custkey"), "c_name", bal.alias("acctbal")
        )

    mat = left_side(True).join(right_side(True), "custkey")
    cdf_left = (
        orders.filter(ins)
        .select(F.col("o_custkey").alias("custkey"), F.lit("insert").alias("__change"))
        .unionByName(
            orders.filter(moved).select(
                old_key.alias("custkey"),
                F.lit("update_preimage").alias("__change"),
            )
        )
        .unionByName(
            orders.filter(moved).select(
                F.col("o_custkey").alias("custkey"),
                F.lit("update_postimage").alias("__change"),
            )
        )
    )
    cdf_right = customer.filter(upd_c).select(
        F.col("c_custkey").alias("custkey"),
        F.lit("update_postimage").alias("__change"),
    )
    out = refresh_join_from_cdf(
        mat, left_side(False), right_side(False), cdf_left, cdf_right,
        "custkey",
    )
    return out.select(
        "o_orderkey",
        "custkey",
        "c_name",
        round_half_up(F.col("o_totalprice"), 4).alias("o_totalprice"),
        round_half_up(F.col("acctbal"), 4).alias("acctbal"),
    ).orderBy("o_orderkey")


# --------------------------------------------------------------------------
# Multi-table incremental view maintenance (operators/incremental.
# refresh_star_join_from_cdf): a lineitem x part x supplier STAR view
# maintained from changes on BOTH the fact and one dim — the shape real
# serving views have. The batch simulates: fact inserts, a fact update
# that MOVES its part join key (handled by fact-row identity: the old
# view row dies by fact_id, the new key's neighborhood rebuilds), and a
# non-key supplier update (dirties every view row through that suppkey).
# The part dim has NO feed this batch (cdf=None) — the mixed case. The
# oracle is the full recompute of the new state: a hash match proves the
# maintenance.
# --------------------------------------------------------------------------
@query(
    "cdc_two_join_view_refresh",
    oracle=f"""
    SELECT l_orderkey * 10 + l_linenumber AS fact_id,
           l_partkey AS partkey, l_suppkey AS suppkey, p_name,
           {round4_sql('s_acctbal')} AS acctbal,
           {round4_sql('l_extendedprice')} AS price
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    ORDER BY fact_id
    """,
)
def cdc_two_join_view_refresh(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.incremental import refresh_star_join_from_cdf

    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").select(
        F.col("p_partkey").alias("partkey"), "p_name"
    )
    supp = load_table(spark, sf, "supplier")
    fact_id = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("fact_id")
    ins = F.col("l_orderkey") % 7 == 0              # rows absent yesterday
    moved = (F.col("l_orderkey") % 97 == 0) & ~ins  # part key moved today
    old_key = (F.col("l_partkey") % 100) + 1
    upd_s = F.col("s_suppkey") % 10 == 0            # non-key dim update

    def fact_side(as_of_v1: bool) -> DataFrame:
        key = (
            F.when(moved, old_key).otherwise(F.col("l_partkey"))
            if as_of_v1
            else F.col("l_partkey")
        )
        df = li.select(
            fact_id, key.alias("partkey"),
            F.col("l_suppkey").alias("suppkey"), "l_extendedprice",
        )
        return df.filter(~ins) if as_of_v1 else df

    def supp_side(as_of_v1: bool) -> DataFrame:
        bal = (
            F.when(upd_s, F.col("s_acctbal") + 100).otherwise(F.col("s_acctbal"))
            if as_of_v1
            else F.col("s_acctbal")
        )
        return supp.select(
            F.col("s_suppkey").alias("suppkey"), bal.alias("s_acctbal")
        )

    mat = fact_side(True).join(part, "partkey").join(supp_side(True), "suppkey")
    cdf_fact = (
        li.filter(ins)
        .select(fact_id, F.lit("insert").alias("__change"))
        .unionByName(
            li.filter(moved).select(
                fact_id, F.lit("update_postimage").alias("__change")
            )
        )
    )
    cdf_supp = supp.filter(upd_s).select(
        F.col("s_suppkey").alias("suppkey"),
        F.lit("update_postimage").alias("__change"),
    )
    out = refresh_star_join_from_cdf(
        mat,
        fact_side(False),
        {"partkey": (part, None), "suppkey": (supp_side(False), cdf_supp)},
        cdf_fact,
        "fact_id",
    )
    return out.select(
        "fact_id",
        "partkey",
        "suppkey",
        "p_name",
        round_half_up(F.col("s_acctbal"), 4).alias("acctbal"),
        round_half_up(F.col("l_extendedprice"), 4).alias("price"),
    ).orderBy("fact_id")


# --------------------------------------------------------------------------
# Hot-key diagnosis (operators/skew.key_skew_report): the top heaviest
# join-key values with their skew vs the mean key and the salt factor
# salted_join would need — read from data, not guessed. TakeOrdered top-N
# (never an unpartitioned window over the key NDV). Full SQL oracle.
# --------------------------------------------------------------------------
@query(
    "stats_key_skew",
    oracle="""
    WITH pk AS (
        SELECT CAST(user_id AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total,
                 CAST(count(*) AS BIGINT) AS nkeys FROM pk),
    top AS (SELECT * FROM pk ORDER BY n DESC, key LIMIT 10)
    SELECT key, n,
           floor(CAST(n AS DOUBLE) / total * 1000000 + 0.5) / 1000000.0 AS share,
           floor(CAST(n AS DOUBLE) * nkeys / total * 10000 + 0.5) / 10000.0 AS skew,
           CAST(greatest(ceil(CAST(n AS DOUBLE) * nkeys / total), 1) AS BIGINT)
               AS suggested_salt
    FROM top CROSS JOIN t ORDER BY n DESC, key
    """,
)
def stats_key_skew(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.skew import key_skew_report

    return key_skew_report(load_table(spark, sf, "events"), "user_id", top_n=10)


# --------------------------------------------------------------------------
# Quantile-threshold outlier gate (operators/curate.quantile_gate): keep
# events at or below the per-type p95 ESTIMATE from the histogram state —
# the maintained state made actionable. Conservative by construction (bin
# upper edge: over-keeps within one bin ratio, never over-drops). Oracle
# recomputes the same thresholds in SQL and applies the same filter.
# --------------------------------------------------------------------------
def _quantile_gate_oracle() -> str:
    from momyre_spark.operators.sketches import geometric_boundaries

    bl = "[" + ", ".join(geometric_boundaries(-2, 3, 32)) + "]::DECIMAL(18,6)[]"
    n_edges = len(geometric_boundaries(-2, 3, 32))
    return f"""
    WITH v AS (
        SELECT event_type,
               CAST(floor(CAST(value AS DOUBLE) * 1000000 + 0.5) / 1000000.0
                    AS DECIMAL(18,6)) AS val
        FROM events
    ),
    h AS (
        SELECT event_type, len(list_filter({bl}, b -> b <= val)) AS bin,
               CAST(count(*) AS BIGINT) AS n
        FROM v GROUP BY 1, 2
    ),
    c AS (
        SELECT *, sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
               sum(n) OVER (PARTITION BY event_type) AS n_total
        FROM h
    ),
    sel AS (
        SELECT event_type, min(bin) AS bin
        FROM c
        WHERE cum >= CAST(ceil(CAST(0.95 AS DECIMAL(10,6)) * n_total) AS BIGINT)
        GROUP BY 1
    ),
    thr AS (
        SELECT event_type,
               CASE WHEN bin < {n_edges}
                    THEN CAST(list_extract({bl}, bin + 1) AS DOUBLE) END AS t
        FROM sel
    )
    SELECT e.event_id, e.event_type,
           floor(CAST(e.value AS DOUBLE) * 10000 + 0.5) / 10000.0 AS value
    FROM events e LEFT JOIN thr ON e.event_type = thr.event_type
    WHERE thr.t IS NULL
       OR floor(CAST(e.value AS DOUBLE) * 1000000 + 0.5) / 1000000.0 <= thr.t
    ORDER BY e.event_id
    """


@query("pipe_quantile_gate", oracle=_quantile_gate_oracle())
def pipe_quantile_gate(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.curate import quantile_gate
    from momyre_spark.operators.sketches import geometric_boundaries

    ev = load_table(spark, sf, "events")
    kept = quantile_gate(ev, ["event_type"], "value",
                         geometric_boundaries(-2, 3, 32), q=0.95)
    return kept.select(
        "event_id",
        "event_type",
        round_half_up(F.col("value"), 4).alias("value"),
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# Quantile-state ROLLUP reuse: ONE set of fine-grained (event_type, day)
# histogram states answers BOTH coarser questions — per-type and per-day
# quantiles — by merging away the other key; the corpus is scanned once
# for the fine states and never again. The oracle computes each rollup
# from scratch, so the hash match proves state reuse loses nothing.
# --------------------------------------------------------------------------
def _quantile_rollup_oracle() -> str:
    from momyre_spark.operators.sketches import geometric_boundaries

    bl = "[" + ", ".join(geometric_boundaries(-2, 3, 32)) + "]::DECIMAL(18,6)[]"
    n_edges = len(geometric_boundaries(-2, 3, 32))

    def side(key_expr: str, tag: str) -> str:
        return f"""
        SELECT '{tag}' AS dim, key, CAST(q AS DOUBLE) AS q,
               CAST(n_total AS BIGINT) AS n_total,
               CASE WHEN bin < {n_edges}
                    THEN CAST(list_extract({bl}, bin + 1) AS DOUBLE) END AS est
        FROM (
            SELECT key, q.q, n_total, min(bin) AS bin
            FROM (
                SELECT *, sum(n) OVER (PARTITION BY key ORDER BY bin) AS cum,
                       sum(n) OVER (PARTITION BY key) AS n_total
                FROM (
                    SELECT {key_expr} AS key,
                           len(list_filter({bl}, b -> b <= val)) AS bin,
                           CAST(count(*) AS BIGINT) AS n
                    FROM (SELECT event_type,
                                 CAST(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS VARCHAR) AS day,
                                 CAST(floor(CAST(value AS DOUBLE) * 1000000 + 0.5)
                                      / 1000000.0 AS DECIMAL(18,6)) AS val
                          FROM events) v
                    GROUP BY 1, 2
                ) h
            ) c CROSS JOIN (SELECT unnest([0.5, 0.95]) AS q) q
            WHERE cum >= CAST(ceil(CAST(q.q AS DECIMAL(10,6)) * n_total) AS BIGINT)
            GROUP BY 1, 2, 3
        ) s
        """

    return (f"SELECT * FROM ({side('event_type', 'by_type')}) a "
            f"UNION ALL SELECT * FROM ({side('day', 'by_day')}) b "
            "ORDER BY dim, key, q")


@query("stats_quantile_rollup", oracle=_quantile_rollup_oracle())
def stats_quantile_rollup(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.sketches import (
        geometric_boundaries,
        merge_value_histograms,
        quantiles_from_histogram,
        value_histogram,
    )

    bl = geometric_boundaries(-2, 3, 32)
    ev = load_table(spark, sf, "events").select(
        "event_type",
        F.date_trunc("day", "ts").cast("date").cast("string").alias("day"),
        "value",
    )
    fine = value_histogram(ev, ["event_type", "day"], "value", bl)
    by_type = quantiles_from_histogram(
        merge_value_histograms(fine.drop("day"), ["event_type"]),
        ["event_type"], bl, qs=(0.5, 0.95),
    ).select(
        F.lit("by_type").alias("dim"), F.col("event_type").alias("key"),
        "q", "n_total", "est",
    )
    by_day = quantiles_from_histogram(
        merge_value_histograms(fine.drop("event_type"), ["day"]),
        ["day"], bl, qs=(0.5, 0.95),
    ).select(
        F.lit("by_day").alias("dim"), F.col("day").alias("key"),
        "q", "n_total", "est",
    )
    return by_type.unionByName(by_day).orderBy("dim", "key", "q")


# --------------------------------------------------------------------------
# Join-cardinality estimation (operators/profile.join_cardinality_estimate):
# the planner's |A|*|B|/max(ndv) uniform estimate next to the ACTUAL join
# count (computed on NDV-sized per-key count tables, never the join
# output). orders x lineitem on orderkey: containment holds, so estimate
# == actual — the oracle checks both columns. Full value-hash oracle.
# --------------------------------------------------------------------------
@query(
    "stats_join_cardinality",
    oracle="""
    WITH la AS (SELECT CAST(count(*) AS BIGINT) AS n_left,
                       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS ndv_left
                FROM orders),
    ra AS (SELECT CAST(count(*) AS BIGINT) AS n_right,
                  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS ndv_right
           FROM lineitem),
    act AS (
        SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT) AS actual_rows
        FROM (SELECT o_orderkey AS k, count(*) AS ca FROM orders GROUP BY 1) a
        JOIN (SELECT l_orderkey AS k, count(*) AS cb FROM lineitem GROUP BY 1) b
          USING (k)
    )
    SELECT n_left, ndv_left, n_right, ndv_right,
           CAST(floor(CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE)
                      / greatest(ndv_left, ndv_right)) AS BIGINT)
               AS estimated_rows,
           actual_rows
    FROM la CROSS JOIN ra CROSS JOIN act
    """,
)
def stats_join_cardinality(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import join_cardinality_estimate

    orders = load_table(spark, sf, "orders").withColumnRenamed(
        "o_orderkey", "orderkey"
    )
    li = load_table(spark, sf, "lineitem").withColumnRenamed(
        "l_orderkey", "orderkey"
    )
    return join_cardinality_estimate(orders, li, "orderkey")


# --------------------------------------------------------------------------
# Point-in-time join (operators/scd.point_in_time_join): every event
# probed 30 minutes later against the SCD2 history derived from the SAME
# ops stream — "what was this user's k when the probe fired". One hash
# equi-join on the key; the half-open interval test is a post-join filter
# (per-probe fan-out = that key's version count, never corpus-sized).
# Probes landing in a delete gap drop out (inner join) — the oracle
# reproduces exactly that via the identical interval predicate.
# --------------------------------------------------------------------------
@query(
    "cdc_point_in_time_join",
    oracle=f"""
    WITH ops AS ({_OPS_SQL}),
    v AS (
        SELECT _id, k, op, ts, event_id,
               lead(ts) OVER (PARTITION BY _id ORDER BY ts, event_id) AS valid_to
        FROM ops
    ),
    hist AS (
        SELECT _id, k, ts AS valid_from, valid_to FROM v WHERE op <> 'delete'
    ),
    probe AS (
        SELECT _id, ts + INTERVAL 30 MINUTE AS pts, event_id FROM ops
    )
    SELECT probe._id AS _id, probe.event_id AS probe_event_id,
           epoch_us(probe.pts) AS probe_ts_us, hist.k AS k,
           epoch_us(hist.valid_from) AS valid_from_us
    FROM probe JOIN hist
      ON probe._id = hist._id
     AND hist.valid_from <= probe.pts
     AND (hist.valid_to IS NULL OR probe.pts < hist.valid_to)
    ORDER BY _id, probe_ts_us, probe_event_id
    """,
)
def cdc_point_in_time_join(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.scd import point_in_time_join, scd2_history

    ev = load_table(spark, sf, "events")
    ops = ev.select(
        F.col("user_id").alias("_id"),
        "ts",
        "event_id",
        F.when(F.col("event_type") == "signup", F.lit("insert"))
        .when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("op"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    hist = scd2_history(
        ops, key="_id", order=("ts", "event_id"), value_cols=("k",)
    ).select("_id", "k", "valid_from_ts", "valid_to")
    probe = ops.select(
        "_id",
        F.expr("ts + INTERVAL 30 MINUTES").alias("ts"),
        "event_id",
    )
    joined = point_in_time_join(probe, hist, key="_id", ts_col="ts")
    return joined.select(
        "_id",
        F.col("event_id").alias("probe_event_id"),
        F.unix_micros("ts").alias("probe_ts_us"),
        "k",
        F.unix_micros("valid_from_ts").alias("valid_from_us"),
    ).orderBy("_id", "probe_ts_us", "probe_event_id")


# --------------------------------------------------------------------------
# Robust outlier report (operators/profile.mad_outliers): per-user median
# / MAD / |x-med| > 3*MAD count over event values in ONE grouped-map
# pandas pass. Medians are exactly determined (mean of the two middle
# doubles — numpy and DuckDB bit-agree, the q35 precedent), deviations
# and the 3*MAD threshold are single exact double ops, so the whole
# report value-hashes.
# --------------------------------------------------------------------------
@query(
    "stats_mad_outliers",
    oracle="""
    WITH m AS (
        SELECT user_id, median(value) AS med, count(*) AS n
        FROM events GROUP BY user_id
    ),
    d AS (
        SELECT e.user_id, abs(e.value - m.med) AS ad
        FROM events e JOIN m USING (user_id)
    ),
    md AS (SELECT user_id, median(ad) AS mad FROM d GROUP BY user_id)
    SELECT m.user_id, m.med, md.mad, m.n,
           CAST(sum(CASE WHEN d.ad > 3.0 * md.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM d JOIN m USING (user_id) JOIN md USING (user_id)
    GROUP BY m.user_id, m.med, md.mad, m.n
    ORDER BY m.user_id
    """,
)
def stats_mad_outliers(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import mad_outliers

    ev = load_table(spark, sf, "events").select("user_id", "value")
    return mad_outliers(ev, "value", ["user_id"], k=3.0).orderBy("user_id")


def _r6(expr: str) -> str:
    """DuckDB twin of round_half_up(col, 6)."""
    return f"floor(({expr}) * 1000000 + 0.5) / 1000000.0"


# --------------------------------------------------------------------------
# Wilson score intervals (operators/profile.wilson_bounds): per-event-type
# pass rate for value > 250 with small-sample-safe bounds. ONE hash agg;
# the interval expression tree is mirrored literally below (shared z^2
# literal via repr), outputs rounded at 6dp on both sides.
# --------------------------------------------------------------------------
_WZ = 1.96
_WZ2 = repr(_WZ * _WZ)


def _wilson_oracle() -> str:
    nd = "CAST(n AS DOUBLE)"
    sd = "CAST(successes AS DOUBLE)"
    p = f"({sd} / {nd})"
    denom = f"(1.0 + {_WZ2} / {nd})"
    center = f"(({p} + {_WZ2} / (2.0 * {nd})) / {denom})"
    half = (
        f"({_WZ} * sqrt({p} * (1.0 - {p}) / {nd}"
        f" + {_WZ2} / (4.0 * {nd} * {nd})) / {denom})"
    )
    return f"""
    WITH a AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CASE WHEN value > 250.0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS successes
        FROM events WHERE (value > 250.0) IS NOT NULL
        GROUP BY event_type
    )
    SELECT event_type, n, successes,
           {_r6(p)} AS rate,
           {_r6(f"{center} - {half}")} AS wilson_low,
           {_r6(f"{center} + {half}")} AS wilson_high
    FROM a ORDER BY event_type
"""


@query("stats_wilson_bounds", oracle=_wilson_oracle())
def stats_wilson_bounds(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import wilson_bounds

    ev = load_table(spark, sf, "events").select(
        "event_type", (F.col("value") > F.lit(250.0)).alias("ok")
    )
    return wilson_bounds(ev, ["event_type"], "ok", z=_WZ).orderBy(
        "event_type"
    )


# --------------------------------------------------------------------------
# Welch A/B report (operators/profile.welch_ab_report): unequal-variance
# t + Welch–Satterthwaite df per event_type between user_id-parity arms.
# Exact BIGINT centi-unit sums/sum-of-squares, conditional-max arm
# pairing (two shuffles, the second over |groups| rows), float tree
# mirrored literally, 6dp rounding.
# --------------------------------------------------------------------------
def _welch_oracle() -> str:
    def stats(tag):
        nd = f"CAST(n_{tag} AS DOUBLE)"
        su = f"CAST(su_{tag} AS DOUBLE)"
        ssq = f"CAST(ssq_{tag} AS DOUBLE)"
        mean = f"({su} / {nd} / 100.0)"
        var = f"(({ssq} - {su} * {su} / {nd}) / ({nd} - 1.0) / 10000.0)"
        return nd, mean, var

    nd_a, mean_a, var_a = stats("a")
    nd_b, mean_b, var_b = stats("b")
    se2 = f"({var_a} / {nd_a} + {var_b} / {nd_b})"
    t = f"(({mean_a} - {mean_b}) / sqrt({se2}))"
    dfw = (
        f"({se2} * {se2} / (({var_a} / {nd_a}) * ({var_a} / {nd_a})"
        f" / ({nd_a} - 1.0) + ({var_b} / {nd_b}) * ({var_b} / {nd_b})"
        f" / ({nd_b} - 1.0)))"
    )
    return f"""
    WITH u AS (
        SELECT event_type, user_id % 2 AS arm,
               CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5)
                    AS BIGINT) AS uu
        FROM events WHERE value IS NOT NULL
    ),
    per AS (
        SELECT event_type, arm, COUNT(*) AS n,
               SUM(uu) AS su, SUM(uu * uu) AS ssq
        FROM u WHERE arm IN (0, 1) GROUP BY 1, 2
    ),
    paired AS (
        SELECT event_type,
               MAX(CASE WHEN arm = 0 THEN n END) AS n_a,
               MAX(CASE WHEN arm = 0 THEN su END) AS su_a,
               MAX(CASE WHEN arm = 0 THEN ssq END) AS ssq_a,
               MAX(CASE WHEN arm = 1 THEN n END) AS n_b,
               MAX(CASE WHEN arm = 1 THEN su END) AS su_b,
               MAX(CASE WHEN arm = 1 THEN ssq END) AS ssq_b
        FROM per GROUP BY event_type
    )
    SELECT event_type, n_a, n_b,
           {_r6(mean_a)} AS mean_a,
           {_r6(mean_b)} AS mean_b,
           {_r6(var_a)} AS var_a,
           {_r6(var_b)} AS var_b,
           {_r6(t)} AS t_stat,
           {_r6(dfw)} AS df_welch
    FROM paired WHERE n_a >= 2 AND n_b >= 2
    ORDER BY event_type
"""


@query("stats_ab_welch", oracle=_welch_oracle())
def stats_ab_welch(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import welch_ab_report

    ev = load_table(spark, sf, "events").select(
        "event_type",
        F.pmod(F.col("user_id"), F.lit(2)).alias("arm"),
        "value",
    )
    return welch_ab_report(
        ev, ["event_type"], "arm", "value", 0, 1, scale=100
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Per-group OLS trend (operators/profile.group_ols_trend): slope /
# intercept / r² of event value vs epoch day, per event_type — the
# metric-drift readout in ONE hash agg. Exact BIGINT moment sums,
# exact BIGINT closed-form numerators, mirrored float tail, 6dp.
# --------------------------------------------------------------------------
def _ols_oracle() -> str:
    num = "CAST(n * sxy - sx * sy AS DOUBLE)"
    denx = "CAST(n * sxx - sx * sx AS DOUBLE)"
    deny = "CAST(n * syy - sy * sy AS DOUBLE)"
    nd = "CAST(n AS DOUBLE)"
    slope = f"({num} / {denx} / 100.0)"
    intercept = (
        f"((CAST(sy AS DOUBLE) / {nd} - {num} / {denx}"
        f" * (CAST(sx AS DOUBLE) / {nd})) / 100.0)"
    )
    r2 = (
        f"(CASE WHEN (n * syy - sy * sy) != 0"
        f" THEN {num} * {num} / ({denx} * {deny}) END)"
    )
    return f"""
    WITH b AS (
        SELECT event_type,
               (epoch_us(ts) // 86400000000) AS x,
               CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5)
                    AS BIGINT) AS y
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    a AS (
        SELECT event_type, COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
               SUM(x * x) AS sxx, SUM(y * y) AS syy
        FROM b GROUP BY 1
    )
    SELECT event_type, n,
           {_r6(slope)} AS slope,
           {_r6(intercept)} AS intercept,
           {_r6(r2)} AS r2
    FROM a WHERE n >= 2 AND (n * sxx - sx * sx) != 0
    ORDER BY event_type
"""


@query("stats_group_ols", oracle=_ols_oracle())
def stats_group_ols(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import group_ols_trend

    ev = (
        load_table(spark, sf, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_type",
            F.expr("unix_micros(ts) DIV 86400000000").alias("day"),
            "value",
        )
    )
    return group_ols_trend(
        ev, ["event_type"], "day", "value", y_scale=100
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Chi-squared independence (operators/profile.chi2_independence): is
# document language independent of source? Full r x c grid (unobserved
# cells contribute their expected count), terms 6dp-fixed to
# DECIMAL(38,6) before the exact sum, mirrored float tail.
# --------------------------------------------------------------------------
@query(
    "stats_chi2_independence",
    oracle="""
    WITH base AS (
        SELECT lang AS a, source AS b FROM documents
        WHERE lang IS NOT NULL AND source IS NOT NULL
    ),
    counts AS (SELECT a, b, COUNT(*) AS o FROM base GROUP BY 1, 2),
    rowt AS (SELECT a, COUNT(*) AS ra FROM base GROUP BY 1),
    colt AS (SELECT b, COUNT(*) AS cb FROM base GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n FROM base),
    cells AS (
        SELECT rowt.a, colt.b, ra, cb,
               CAST(COALESCE(o, 0) AS BIGINT) AS o
        FROM rowt CROSS JOIN colt
        LEFT JOIN counts ON counts.a = rowt.a AND counts.b = colt.b
    ),
    terms AS (
        SELECT CAST(floor(((CAST(o AS DOUBLE)
                    - CAST(ra * cb AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(o AS DOUBLE)
                    - CAST(ra * cb AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(ra * cb AS DOUBLE) / CAST(n AS DOUBLE)))
                  * 1000000 + 0.5) / 1000000.0 AS DECIMAL(38,6)) AS t,
               n
        FROM cells, tot
    ),
    s AS (SELECT n, SUM(t) AS chi2d FROM terms GROUP BY n),
    shape AS (
        SELECT (SELECT COUNT(*) FROM rowt) AS nr,
               (SELECT COUNT(*) FROM colt) AS nc
    )
    SELECT n, nr AS n_a, nc AS n_b,
           (nr - 1) * (nc - 1) AS dof,
           floor(CAST(chi2d AS DOUBLE) * 1000000 + 0.5) / 1000000.0
               AS chi2,
           CASE WHEN least(nr - 1, nc - 1) > 0 THEN
               floor(sqrt(CAST(chi2d AS DOUBLE)
                          / CAST(n * least(nr - 1, nc - 1) AS DOUBLE))
                     * 1000000 + 0.5) / 1000000.0 END AS cramers_v
    FROM s, shape
""",
)
def stats_chi2_independence(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import chi2_independence

    docs = load_table(spark, sf, "documents").select("lang", "source")
    return chi2_independence(docs, "lang", "source")


# --------------------------------------------------------------------------
# Per-group ROC AUC (operators/profile.group_auc): does document length
# separate English from non-English, per source? Mann-Whitney mid-rank
# identity over DISTINCT score values (one agg + one distinct-value
# window + one re-agg) — never a per-row rank. Exact BIGINT rank sums
# (2x mid-rank stays integral), single mirrored final division, 6dp.
# --------------------------------------------------------------------------
def _auc_oracle() -> str:
    auc = (
        "CAST(r2 - npos * (npos + 1) AS DOUBLE)"
        " / CAST(2 * npos * (n - npos) AS DOUBLE)"
    )
    return f"""
    WITH b AS (
        SELECT source, (lang = 'en') AS y,
               CAST(floor(CAST(n_chars AS DOUBLE) * 100.0 + 0.5)
                    AS BIGINT) AS u
        FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL
    ),
    per AS (
        SELECT source, u, COUNT(*) AS cnt,
               CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pos
        FROM b GROUP BY 1, 2
    ),
    r AS (
        SELECT source, cnt, pos,
               SUM(cnt) OVER (PARTITION BY source ORDER BY u
                              ROWS UNBOUNDED PRECEDING) - cnt AS cb
        FROM per
    ),
    a AS (
        SELECT source, CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(SUM(pos) AS BIGINT) AS npos,
               CAST(SUM(pos * (2 * cb + cnt + 1)) AS BIGINT) AS r2
        FROM r GROUP BY 1
    )
    SELECT source, npos AS n_pos, n - npos AS n_neg,
           {_r6(auc)} AS auc
    FROM a WHERE npos >= 1 AND n - npos >= 1
    ORDER BY source
"""


@query("stats_group_auc", oracle=_auc_oracle())
def stats_group_auc(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import group_auc

    docs = load_table(spark, sf, "documents").select(
        "source", (F.col("lang") == F.lit("en")).alias("is_en"), "n_chars"
    )
    return group_auc(docs, ["source"], "is_en", "n_chars").orderBy(
        "source"
    )


# --------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov (operators/profile.ks_2sample): did the
# B arm change the metric's SHAPE, not just its mean (the readout
# stats_ab_welch cannot give)? Exact BIGINT cross-multiplied ECDF max
# over distinct values; one mirrored final division, 6dp.
# --------------------------------------------------------------------------
def _ks_oracle() -> str:
    return f"""
    WITH b AS (
        SELECT event_type, user_id % 2 AS arm,
               CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5)
                    AS BIGINT) AS u
        FROM events WHERE value IS NOT NULL
    ),
    per AS (
        SELECT event_type, u,
               CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS ca,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS cb
        FROM b WHERE arm IN (0, 1) GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type,
               CAST(SUM(ca) OVER (PARTITION BY event_type ORDER BY u
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cuma,
               CAST(SUM(cb) OVER (PARTITION BY event_type ORDER BY u
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumb,
               CAST(SUM(ca) OVER (PARTITION BY event_type)
                    AS BIGINT) AS na,
               CAST(SUM(cb) OVER (PARTITION BY event_type)
                    AS BIGINT) AS nb
        FROM per
    ),
    a AS (
        SELECT event_type,
               CAST(MAX(abs(cuma * nb - cumb * na)) AS BIGINT) AS d,
               MAX(na) AS na, MAX(nb) AS nb
        FROM s GROUP BY 1
    )
    SELECT event_type, na AS n_a, nb AS n_b,
           {_r6('CAST(d AS DOUBLE) / CAST(na * nb AS DOUBLE)')} AS ks_stat
    FROM a WHERE na >= 1 AND nb >= 1
    ORDER BY event_type
"""


@query("stats_ks_2sample", oracle=_ks_oracle())
def stats_ks_2sample(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import ks_2sample

    ev = load_table(spark, sf, "events").select(
        "event_type",
        F.pmod(F.col("user_id"), F.lit(2)).alias("arm"),
        "value",
    )
    return ks_2sample(ev, ["event_type"], "arm", "value", 0, 1).orderBy(
        "event_type"
    )


# --------------------------------------------------------------------------
# Population Stability Index (operators/profile.psi_report): length-
# distribution drift of every source against the src0 reference over
# fixed bins — the standard <0.1 / >0.25 drift gate. Laplace-smoothed
# bin probabilities; each term 6dp-fixed to DECIMAL(38,6) BEFORE the
# exact sum (the chi2 recipe).
# --------------------------------------------------------------------------
_PSI_EDGES = [150.0, 250.0, 350.0, 450.0]


def _psi_oracle() -> str:
    edges = [int(e * 100) for e in _PSI_EDGES]
    n_bins = len(edges) + 1
    bin_expr = " + ".join(
        f"(CASE WHEN u >= {e} THEN 1 ELSE 0 END)" for e in edges
    )
    return f"""
    WITH b AS (
        SELECT source AS g,
               CAST(floor(CAST(n_chars AS DOUBLE) * 100.0 + 0.5)
                    AS BIGINT) AS u
        FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL
    ),
    binned AS (SELECT g, ({bin_expr}) AS bin FROM b),
    counts AS (SELECT g, bin, COUNT(*) AS c FROM binned GROUP BY 1, 2),
    totals AS (SELECT g, COUNT(*) AS n FROM binned GROUP BY 1),
    bins AS (SELECT CAST(range AS INT) AS bin FROM range({n_bins})),
    grid AS (
        SELECT totals.g, bins.bin, totals.n,
               COALESCE(counts.c, 0) AS c
        FROM totals CROSS JOIN bins
        LEFT JOIN counts ON counts.g = totals.g AND counts.bin = bins.bin
    ),
    p AS (
        SELECT g, bin, n,
               (CAST(c AS DOUBLE) + 0.5)
               / (CAST(n AS DOUBLE) + {0.5 * n_bins}) AS p
        FROM grid
    ),
    ref AS (SELECT bin, p AS pr FROM p WHERE g = 'src0'),
    terms AS (
        SELECT g, n,
               CAST(floor(((p.p - ref.pr) * ln(p.p / ref.pr))
                    * 1000000 + 0.5) / 1000000.0 AS DECIMAL(38,6)) AS t
        FROM p JOIN ref ON p.bin = ref.bin
    )
    SELECT g AS source, n, CAST(SUM(t) AS DOUBLE) AS psi
    FROM terms GROUP BY 1, 2
    ORDER BY source
"""


@query("stats_psi_report", oracle=_psi_oracle())
def stats_psi_report(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import psi_report

    docs = load_table(spark, sf, "documents").select("source", "n_chars")
    return psi_report(
        docs, "source", "n_chars", _PSI_EDGES, "src0"
    ).orderBy("source")


# --------------------------------------------------------------------------
# Gini concentration (operators/profile.gini_concentration): is one
# source's char mass concentrated in a few huge documents? Sorted-rank
# closed form — exact BIGINT terms, one window sort per source, one
# mirrored final division, 6dp.
# --------------------------------------------------------------------------
def _gini_oracle() -> str:
    gini = (
        "(CASE WHEN minx >= 0 THEN CAST(2 * six - (n + 1) * sx AS DOUBLE)"
        " / CAST(n * sx AS DOUBLE) END)"
    )
    return f"""
    WITH b AS (
        SELECT source, CAST(n_chars AS BIGINT) AS x
        FROM documents WHERE n_chars IS NOT NULL
    ),
    r AS (
        SELECT source, x,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY x) AS i
        FROM b
    ),
    a AS (
        SELECT source, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(i * x) AS BIGINT) AS six,
               CAST(MIN(x) AS BIGINT) AS minx
        FROM r GROUP BY 1
    )
    SELECT source, n, sx AS total, {_r6(gini)} AS gini
    FROM a WHERE sx > 0 ORDER BY source
"""


@query("stats_gini_concentration", oracle=_gini_oracle())
def stats_gini_concentration(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import gini_concentration

    docs = load_table(spark, sf, "documents").select("source", "n_chars")
    return gini_concentration(docs, ["source"], "n_chars").orderBy(
        "source"
    )


# --------------------------------------------------------------------------
# Per-source label entropy (operators/profile.entropy_report): how
# language-diverse is each source? Terms 6dp-fixed to DECIMAL before
# the exact sum (chi2/PSI recipe); normalized form NULL for one-label
# groups.
# --------------------------------------------------------------------------
def _entropy_oracle() -> str:
    p = "(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
    return f"""
    WITH b AS (
        SELECT source AS g, lang AS l FROM documents
        WHERE lang IS NOT NULL AND source IS NOT NULL
    ),
    c AS (SELECT g, l, COUNT(*) AS c FROM b GROUP BY 1, 2),
    w AS (
        SELECT g, c, CAST(SUM(c) OVER (PARTITION BY g) AS BIGINT) AS n
        FROM c
    ),
    t AS (
        SELECT g, n,
               CAST(floor((-({p}) * ln({p})) * 1000000 + 0.5)
                    / 1000000.0 AS DECIMAL(38,6)) AS t
        FROM w
    ),
    a AS (
        SELECT g, n, SUM(t) AS h, CAST(COUNT(*) AS BIGINT) AS k
        FROM t GROUP BY 1, 2
    )
    SELECT g AS source, n, k AS n_labels,
           CAST(h AS DOUBLE) AS entropy,
           CASE WHEN k > 1 THEN
               floor(CAST(h AS DOUBLE) / ln(CAST(k AS DOUBLE))
                     * 1000000 + 0.5) / 1000000.0
           END AS entropy_norm
    FROM a ORDER BY source
"""


@query("stats_entropy_report", oracle=_entropy_oracle())
def stats_entropy_report(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import entropy_report

    docs = load_table(spark, sf, "documents").select("source", "lang")
    return entropy_report(docs, "source", "lang").orderBy("source")


# --------------------------------------------------------------------------
# CUPED variance-reduced A/B (operators/profile.cuped_report): the
# experiment readout with each user's pre-period (even-day) mean as the
# control covariate — theta, raw vs adjusted lift, and the variance
# fraction removed. Exact BIGINT unit means and moment sums; the whole
# float tail is one mirrored tree, 6dp.
# --------------------------------------------------------------------------
def _cuped_oracle() -> str:
    nd = "CAST(n AS DOUBLE)"
    sxd, syd = "CAST(sx AS DOUBLE)", "CAST(sy AS DOUBLE)"
    covn = f"({nd} * CAST(sxy AS DOUBLE) - {sxd} * {syd})"
    varxn = f"({nd} * CAST(sxx AS DOUBLE) - {sxd} * {sxd})"
    varyn = f"({nd} * CAST(syy AS DOUBLE) - {syd} * {syd})"
    theta = f"({covn} / {varxn})"
    diff_raw = (
        "((CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE)"
        " - CAST(sya AS DOUBLE) / CAST(na AS DOUBLE)) / 100.0)"
    )
    diff_x = (
        "((CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE)"
        " - CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE)) / 100.0)"
    )
    rho2 = (
        f"(CASE WHEN {varyn} != 0"
        f" THEN {covn} * {covn} / ({varxn} * {varyn}) END)"
    )
    return f"""
    WITH u AS (
        SELECT event_type, user_id, user_id % 2 AS arm,
               ((epoch_us(ts) // 86400000000) % 2 = 1) AS post,
               CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5)
                    AS BIGINT) AS uu
        FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    pu AS (
        SELECT event_type, user_id, MAX(arm) AS arm,
               CAST(SUM(CASE WHEN NOT post THEN uu END) AS BIGINT)
                   AS su_pre,
               CAST(SUM(CASE WHEN NOT post THEN 1 ELSE 0 END)
                   AS BIGINT) AS c_pre,
               CAST(SUM(CASE WHEN post THEN uu END) AS BIGINT)
                   AS su_post,
               CAST(SUM(CASE WHEN post THEN 1 ELSE 0 END)
                   AS BIGINT) AS c_post
        FROM u WHERE arm IN (0, 1) GROUP BY 1, 2
    ),
    un AS (
        SELECT event_type, arm,
               CAST(floor(CAST(su_pre AS DOUBLE)
                    / CAST(c_pre AS DOUBLE) + 0.5) AS BIGINT) AS x,
               CAST(floor(CAST(su_post AS DOUBLE)
                    / CAST(c_post AS DOUBLE) + 0.5) AS BIGINT) AS y
        FROM pu WHERE c_pre >= 1 AND c_post >= 1
    ),
    a AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS na,
               CAST(SUM(CASE WHEN arm = 0 THEN x END) AS BIGINT) AS sxa,
               CAST(SUM(CASE WHEN arm = 0 THEN y END) AS BIGINT) AS sya,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS nb,
               CAST(SUM(CASE WHEN arm = 1 THEN x END) AS BIGINT) AS sxb,
               CAST(SUM(CASE WHEN arm = 1 THEN y END) AS BIGINT) AS syb
        FROM un GROUP BY 1
    )
    SELECT event_type, na AS n_a, nb AS n_b,
           {_r6(theta)} AS theta,
           {_r6(diff_raw)} AS diff_raw,
           {_r6(f"({diff_raw} - {theta} * {diff_x})")} AS diff_cuped,
           {_r6(rho2)} AS var_reduction
    FROM a WHERE na >= 1 AND nb >= 1 AND {varxn} != 0
    ORDER BY event_type
"""


@query("stats_ab_cuped", oracle=_cuped_oracle())
def stats_ab_cuped(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import cuped_report

    ev = (
        load_table(spark, sf, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_type",
            "user_id",
            F.pmod(F.col("user_id"), F.lit(2)).alias("arm"),
            (
                F.pmod(
                    F.expr("unix_micros(ts) DIV 86400000000"), F.lit(2)
                )
                == F.lit(1)
            ).alias("post"),
            "value",
        )
    )
    return cuped_report(
        ev, ["event_type"], "user_id", "arm", "post", "value", 0, 1
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Hill tail-index (operators/profile.hill_tail_index): how heavy is
# each source's document-size tail? Top-(k+1) order statistics only —
# the window truncates at rank k+1; at 100 TB pre-filter via the
# quantile-state CDF. Terms 6dp-fixed to DECIMAL before the exact sum.
# --------------------------------------------------------------------------
_HILL_K = 10


def _hill_oracle() -> str:
    h = "(CAST(s AS DOUBLE) / CAST(mm - 1 AS DOUBLE))"
    return f"""
    WITH b AS (
        SELECT source AS g, CAST(n_chars AS BIGINT) AS x
        FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    r AS (
        SELECT g, x,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY x DESC) AS rn
        FROM b
    ),
    top AS (SELECT * FROM r WHERE rn <= {_HILL_K + 1}),
    m AS (
        SELECT g, x, rn,
               MIN(x) OVER (PARTITION BY g) AS ref,
               COUNT(*) OVER (PARTITION BY g) AS mm
        FROM top
    ),
    a AS (
        SELECT g, CAST(MAX(mm) AS BIGINT) AS mm,
               CAST(MAX(ref) AS BIGINT) AS ref,
               SUM(CASE WHEN rn < mm THEN
                   CAST(floor(ln(CAST(x AS DOUBLE) / CAST(ref AS DOUBLE))
                        * 1000000 + 0.5) / 1000000.0 AS DECIMAL(38,6))
               END) AS s
        FROM m GROUP BY 1
    )
    SELECT g AS source, mm AS n_top, mm - 1 AS k_used, ref AS x_ref,
           {_r6(h)} AS hill,
           CASE WHEN {h} != 0 THEN {_r6(f"(1.0 / {h})")} END AS alpha
    FROM a WHERE mm >= 2 ORDER BY source
"""


@query("stats_hill_tail", oracle=_hill_oracle())
def stats_hill_tail(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import hill_tail_index

    docs = load_table(spark, sf, "documents").select("source", "n_chars")
    return hill_tail_index(docs, ["source"], "n_chars", k=_HILL_K).orderBy(
        "source"
    )


# --------------------------------------------------------------------------
# Benford first-digit conformance (operators/profile.benford_report):
# is each event type's value feed organically distributed? First digit
# from the fixed-point BIGINT's decimal string (no float log10); the
# 9-digit grid is a map-side explode; chi2/MAD terms 6dp-fixed before
# the exact sum. Expected-probability literals embedded verbatim.
# --------------------------------------------------------------------------
def _benford_oracle() -> str:
    from momyre_spark.operators.profile import _BENFORD_E

    e_case = " ".join(
        f"WHEN {d} THEN {v!r}" for d, v in enumerate(_BENFORD_E, start=1)
    )
    return f"""
    WITH b AS (
        SELECT event_type AS g,
               CAST(substr(CAST(u AS VARCHAR), 1, 1) AS INT) AS d
        FROM (
            SELECT event_type,
                   CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5)
                        AS BIGINT) AS u
            FROM events
            WHERE value IS NOT NULL AND event_type IS NOT NULL
        ) WHERE u > 0
    ),
    counts AS (SELECT g, d, COUNT(*) AS c FROM b GROUP BY 1, 2),
    totals AS (SELECT g, COUNT(*) AS n FROM b GROUP BY 1),
    digits AS (SELECT CAST(range AS INT) AS d FROM range(1, 10)),
    grid AS (
        SELECT totals.g, digits.d, totals.n, COALESCE(counts.c, 0) AS c
        FROM totals CROSS JOIN digits
        LEFT JOIN counts ON counts.g = totals.g AND counts.d = digits.d
    ),
    terms AS (
        SELECT g, n,
               (CASE d {e_case} END) AS e,
               CAST(c AS DOUBLE) AS od, CAST(n AS DOUBLE) AS nd
        FROM grid
    ),
    fixed AS (
        SELECT g, n,
               CAST(floor(((od - nd * e) * (od - nd * e) / (nd * e))
                    * 1000000 + 0.5) / 1000000.0 AS DECIMAL(38,6)) AS tc,
               CAST(floor(abs(od / nd - e) * 1000000 + 0.5)
                    / 1000000.0 AS DECIMAL(38,6)) AS tm
        FROM terms
    ),
    a AS (
        SELECT g, n, SUM(tc) AS chi2, SUM(tm) AS madsum
        FROM fixed GROUP BY 1, 2
    )
    SELECT g AS event_type, n, CAST(chi2 AS DOUBLE) AS chi2,
           {_r6('(CAST(madsum AS DOUBLE) / 9.0)')} AS mad
    FROM a ORDER BY event_type
"""


@query("stats_benford", oracle=_benford_oracle())
def stats_benford(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import benford_report

    ev = load_table(spark, sf, "events").select("event_type", "value")
    return benford_report(ev, "event_type", "value").orderBy("event_type")


# --------------------------------------------------------------------------
# Spearman trend (operators/profile.spearman_corr): rank correlation of
# event value against epoch day — the outlier-proof monotonic-trend twin
# of stats_group_ols. Mid-ranks per DISTINCT value (doubled, exact
# BIGINT), never a per-row window; one mirrored float tree, 6dp.
# --------------------------------------------------------------------------
def _spearman_oracle() -> str:
    covn = (
        "(CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)"
        " - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE))"
    )
    varx = (
        "(CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE)"
        " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))"
    )
    vary = (
        "(CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE)"
        " - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))"
    )
    return f"""
    WITH b AS (
        SELECT event_type AS g,
               (epoch_us(ts) // 86400000000) AS x,
               CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5)
                    AS BIGINT) AS y
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    rx AS (
        SELECT g, x,
               2 * (SUM(cnt) OVER (PARTITION BY g ORDER BY x
                    ROWS UNBOUNDED PRECEDING) - cnt) + cnt + 1 AS rx
        FROM (SELECT g, x, COUNT(*) AS cnt FROM b GROUP BY 1, 2)
    ),
    ry AS (
        SELECT g, y,
               2 * (SUM(cnt) OVER (PARTITION BY g ORDER BY y
                    ROWS UNBOUNDED PRECEDING) - cnt) + cnt + 1 AS ry
        FROM (SELECT g, y, COUNT(*) AS cnt FROM b GROUP BY 1, 2)
    ),
    r AS (
        SELECT b.g, rx.rx, ry.ry
        FROM b JOIN rx ON rx.g = b.g AND rx.x = b.x
               JOIN ry ON ry.g = b.g AND ry.y = b.y
    ),
    a AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(rx) AS BIGINT) AS s1,
               CAST(SUM(ry) AS BIGINT) AS s2,
               CAST(SUM(rx * ry) AS BIGINT) AS s12,
               CAST(SUM(rx * rx) AS BIGINT) AS s11,
               CAST(SUM(ry * ry) AS BIGINT) AS s22
        FROM r GROUP BY 1
    )
    SELECT g AS event_type, n,
           {_r6(f"({covn} / sqrt({varx} * {vary}))")} AS spearman
    FROM a WHERE {varx} != 0 AND {vary} != 0
    ORDER BY event_type
"""


@query("stats_spearman", oracle=_spearman_oracle())
def stats_spearman(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import spearman_corr

    ev = (
        load_table(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr("unix_micros(ts) DIV 86400000000").alias("day"),
            F.floor(
                F.col("value").cast("double") * F.lit(100.0) + F.lit(0.5)
            ).cast("bigint").alias("v"),
        )
    )
    return spearman_corr(ev, ["event_type"], "day", "v").orderBy(
        "event_type"
    )


# --------------------------------------------------------------------------
# A/B power planning (operators/profile.ab_power_report): effect size
# (Cohen's d / Hedges g), minimum detectable effect at the current n,
# and the per-arm n required for the observed difference at alpha=.05 /
# power=80%. Same exact-BIGINT moment pass as stats_ab_welch; the z
# literals are embedded verbatim.
# --------------------------------------------------------------------------
def _power_oracle() -> str:
    from momyre_spark.operators.profile import _Z_ALPHA_2, _Z_BETA

    def stats(tag):
        nd = f"CAST(n_{tag} AS DOUBLE)"
        su = f"CAST(su_{tag} AS DOUBLE)"
        ssq = f"CAST(ssq_{tag} AS DOUBLE)"
        mean = f"({su} / {nd} / 100.0)"
        var = f"(({ssq} - {su} * {su} / {nd}) / ({nd} - 1.0) / 10000.0)"
        return nd, mean, var

    na, mean_a, var_a = stats("a")
    nb, mean_b, var_b = stats("b")
    sp2 = (
        f"((({na} - 1.0) * {var_a} + ({nb} - 1.0) * {var_b})"
        f" / ({na} + {nb} - 2.0))"
    )
    sp = f"sqrt({sp2})"
    delta = f"({mean_a} - {mean_b})"
    d = f"({delta} / {sp})"
    g = f"({d} * (1.0 - 3.0 / (4.0 * ({na} + {nb}) - 9.0)))"
    zz = f"({_Z_ALPHA_2!r} + {_Z_BETA!r})"
    mde = f"({zz} * {sp} * sqrt(1.0 / {na} + 1.0 / {nb}))"
    nreq = (
        f"(CASE WHEN {delta} != 0 THEN CAST(ceil(2.0 * {sp2} * {zz} * {zz}"
        f" / ({delta} * {delta})) AS BIGINT) END)"
    )
    return f"""
    WITH u AS (
        SELECT event_type, user_id % 2 AS arm,
               CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5)
                    AS BIGINT) AS uu
        FROM events WHERE value IS NOT NULL
    ),
    per AS (
        SELECT event_type, arm, COUNT(*) AS n,
               SUM(uu) AS su, SUM(uu * uu) AS ssq
        FROM u WHERE arm IN (0, 1) GROUP BY 1, 2
    ),
    paired AS (
        SELECT event_type,
               MAX(CASE WHEN arm = 0 THEN n END) AS n_a,
               MAX(CASE WHEN arm = 0 THEN su END) AS su_a,
               MAX(CASE WHEN arm = 0 THEN ssq END) AS ssq_a,
               MAX(CASE WHEN arm = 1 THEN n END) AS n_b,
               MAX(CASE WHEN arm = 1 THEN su END) AS su_b,
               MAX(CASE WHEN arm = 1 THEN ssq END) AS ssq_b
        FROM per GROUP BY event_type
    )
    SELECT event_type, n_a, n_b,
           {_r6(d)} AS cohens_d,
           {_r6(g)} AS hedges_g,
           {_r6(mde)} AS mde,
           {nreq} AS n_required
    FROM paired
    WHERE n_a >= 2 AND n_b >= 2 AND {sp2} != 0
    ORDER BY event_type
"""


@query("stats_ab_power", oracle=_power_oracle())
def stats_ab_power(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import ab_power_report

    ev = load_table(spark, sf, "events").select(
        "event_type",
        F.pmod(F.col("user_id"), F.lit(2)).alias("arm"),
        "value",
    )
    return ab_power_report(
        ev, ["event_type"], "arm", "value", 0, 1
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Kaplan-Meier survival curve (operators/profile.kaplan_meier): global
# time-to-first-purchase curve over users, right-censored at each user's
# last event — the conversion-latency readout that handles non-converters
# correctly. Distinct-hour rows only; product via a fixed-order ascending
# fold (engine-identical IEEE sequence), counts exact BIGINT.
#
# Registered round 8 (was staged through round 7 under the ~50-row
# driver budget).
# Pre-validated end-to-end by tests/test_maintenance_ops.py::
# test_stats_kaplan_meier_oracle_parity (same compare as the driver).
# --------------------------------------------------------------------------
_KM_ORACLE = """
    WITH u AS (
        -- floor(epoch(...)) per event, NOT raw epoch(): DuckDB's epoch()
        -- keeps fractional seconds while Spark's unix_timestamp()
        -- truncates to whole seconds — an un-floored difference near a
        -- 3600s boundary lands one subject in the adjacent hour bucket
        -- (found by the sf0.1 staged sweep; min/max commute with floor,
        -- so flooring inside the aggregate is exact)
        SELECT user_id,
               min(floor(epoch(CAST(ts AS TIMESTAMP)))) AS e0,
               min(CASE WHEN event_type = 'purchase'
                        THEN floor(epoch(CAST(ts AS TIMESTAMP))) END) AS ep,
               max(floor(epoch(CAST(ts AS TIMESTAMP)))) AS emax
        FROM events GROUP BY user_id
    ),
    dur AS (
        SELECT CAST(floor((coalesce(ep, emax) - e0) / 3600) AS BIGINT)
                   AS t,
               CASE WHEN ep IS NOT NULL THEN 1 ELSE 0 END AS e
        FROM u
    ),
    per AS (
        SELECT t, CAST(SUM(e) AS BIGINT) AS d_events,
               CAST(COUNT(*) - SUM(e) AS BIGINT) AS c_censored
        FROM dur GROUP BY t
    ),
    w AS (
        SELECT *, SUM(d_events + c_censored) OVER () AS total,
               SUM(d_events + c_censored) OVER (ORDER BY t)
                 - (d_events + c_censored) AS cumprev
        FROM per
    ),
    l AS (
        SELECT list(struct_pack(
                   t := t, d := d_events, c := c_censored,
                   n := CAST(total - cumprev AS BIGINT)
               ) ORDER BY t) AS sl
        FROM w
    ),
    ix AS (SELECT sl, unnest(range(1, len(sl) + 1)) AS i FROM l)
    SELECT sl[i].t AS t, sl[i].n AS n_risk, sl[i].d AS d_events,
           sl[i].c AS c_censored,
           floor(list_reduce(
               (list_transform(sl, x ->
                   1.0 - CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE)))[1:i],
               (a, b) -> a * b) * 1000000 + 0.5) / 1000000.0 AS surv
    FROM ix ORDER BY t
"""


@query("stats_kaplan_meier", oracle=_KM_ORACLE)
def stats_kaplan_meier(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import kaplan_meier

    ev = load_table(spark, sf, "events")
    u = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("tp"),
        F.max("ts").alias("tmax"),
    )
    d = u.select(
        F.floor(
            (
                F.unix_timestamp(F.coalesce("tp", "tmax"))
                - F.unix_timestamp("t0")
            )
            / F.lit(3600)
        ).alias("dur_h"),
        F.when(F.col("tp").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("observed"),
    )
    return kaplan_meier(d, [], "dur_h", "observed").orderBy("t")


# --------------------------------------------------------------------------
# Trimmed mean (operators/profile.trimmed_mean): robust per-event-type
# location estimate — 5% of each tail dropped as a sorted multiset via
# the distinct-value rank machinery; every sum exact BIGINT centi-units.
#
# Registered round 8 (was staged through round 7).
# Pre-validated by tests/test_maintenance_ops.py::
# test_stats_trimmed_mean_oracle_parity.
# --------------------------------------------------------------------------
_TRIM_ORACLE = """
    WITH base AS (
        SELECT event_type AS g,
               CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL
    ),
    per AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY 1, 2),
    cum AS (
        SELECT g, v, c,
               CAST(SUM(c) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cm,
               CAST(SUM(c) OVER (PARTITION BY g) AS BIGINT) AS n
        FROM per
    ),
    kept AS (
        SELECT g, v, n,
               CAST(floor(n * 5 / 100) AS BIGINT) AS k,
               GREATEST(CAST(0 AS BIGINT),
                        LEAST(cm, n - CAST(floor(n * 5 / 100) AS BIGINT))
                        - GREATEST(cm - c + 1,
                                   CAST(floor(n * 5 / 100) AS BIGINT) + 1)
                        + 1) AS kp
        FROM cum
    ),
    a AS (
        SELECT g AS event_type,
               CAST(MAX(n) AS BIGINT) AS n,
               CAST(MAX(k) AS BIGINT) AS k_trimmed,
               CAST(SUM(v * kp) AS BIGINT) AS s,
               CAST(SUM(kp) AS BIGINT) AS nk
        FROM kept GROUP BY 1 HAVING SUM(kp) > 0
    )
    SELECT event_type, n, k_trimmed,
           floor(CAST(s AS DOUBLE) / CAST(nk AS DOUBLE) / 100.0
                 * 1000000 + 0.5) / 1000000.0 AS trimmed_mean
    FROM a ORDER BY event_type
"""


@query("stats_trimmed_mean", oracle=_TRIM_ORACLE)
def stats_trimmed_mean(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import trimmed_mean

    ev = load_table(spark, sf, "events")
    return trimmed_mean(
        ev, ["event_type"], "value", trim_pct=5, scale=100
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Poisson-bootstrap mean CI (operators/profile.bootstrap_ci): 200
# hash-derived Poisson(1) replicate weights per event, percentile CI of
# the per-event-type mean. The weight ladder constants come verbatim from
# operators/profile._POISSON1_CDF — recomputing e^-1/k! in SQL would
# yield different doubles.
#
# Registered round 8 (was staged through round 7). Pre-validated by
# tests/test_maintenance_ops.py::test_stats_bootstrap_ci_oracle_parity
# and the staged-queue mirror in test_oracle_queries.py.
# --------------------------------------------------------------------------
def _bootstrap_oracle() -> str:
    from momyre_spark.operators.profile import _POISSON1_CDF

    ladder = (
        "CASE "
        + " ".join(
            f"WHEN u < {t!r} THEN {k}" for k, t in enumerate(_POISSON1_CDF)
        )
        + f" ELSE {len(_POISSON1_CDF)} END"
    )
    return f"""
    WITH base AS (
        SELECT event_type AS g, CAST(event_id AS VARCHAR) AS id,
               CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL
    ),
    rep AS (
        SELECT g, id, v, unnest(range(0, 200)) AS b FROM base
    ),
    uu AS (
        SELECT g, b, v,
               (('0x' || substr(md5(id || '-' || CAST(b AS VARCHAR)),
                                1, 15))::BIGINT
                / 1152921504606846976.0) AS u
        FROM rep
    ),
    ww AS (SELECT g, b, v, {ladder} AS w FROM uu),
    mm AS (
        SELECT g, b, CAST(SUM(w * v) AS BIGINT) AS s,
               CAST(SUM(w) AS BIGINT) AS wn
        FROM ww GROUP BY 1, 2 HAVING SUM(w) > 0
    ),
    ms AS (
        SELECT g,
               list(CAST(s AS DOUBLE) / CAST(wn AS DOUBLE) / 100.0
                    ORDER BY CAST(s AS DOUBLE) / CAST(wn AS DOUBLE)
                             / 100.0) AS l,
               CAST(COUNT(*) AS BIGINT) AS nb
        FROM mm GROUP BY 1
    ),
    ov AS (
        SELECT event_type AS g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5)
                             AS BIGINT)) AS BIGINT) AS sv
        FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    ix AS (
        SELECT g, l, nb,
               GREATEST(1, CAST(floor((nb * 5 + 199) / 200) AS INT)) AS lo
        FROM ms
    )
    SELECT ov.g AS event_type, ov.n,
           floor(CAST(ov.sv AS DOUBLE) / CAST(ov.n AS DOUBLE) / 100.0
                 * 1000000 + 0.5) / 1000000.0 AS mean,
           floor(l[lo] * 1000000 + 0.5) / 1000000.0 AS ci_lo,
           floor(l[CAST(nb + 1 - lo AS INT)] * 1000000 + 0.5) / 1000000.0
               AS ci_hi
    FROM ov JOIN ix ON ov.g = ix.g
    ORDER BY event_type
"""


@query("stats_bootstrap_ci", oracle=_bootstrap_oracle())
def stats_bootstrap_ci(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import bootstrap_ci

    ev = load_table(spark, sf, "events")
    return bootstrap_ci(
        ev, ["event_type"], "event_id", "value", n_boot=200, alpha_pct=5
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Benjamini-Hochberg FDR (operators/profile.bh_adjust): q-values + the
# step-up discovery set over a planted family of per-cell p-values. The
# family is the (event_type, hour-of-day) grid; p-values are md5-derived
# uniforms (the engine-neutral randomness recipe, _SEM_LO style) with a
# planted signal — cells at hour % 5 == 0 get p/1000 — so the discovery
# set is non-trivial and exactly mirrored. The operator's windows (rank,
# family count, reverse running min) value-hash bit-for-bit.
#
# Registered round 9 (staged round 8). Pre-validated by the staged-queue
# mirror and tests/test_maintenance_ops.py::test_bh_adjust_known_values.
# --------------------------------------------------------------------------
_BH_ORACLE = """
    WITH cells AS (
        SELECT DISTINCT event_type,
               CAST(extract(hour FROM CAST(ts AS TIMESTAMP)) AS BIGINT)
                   AS hh
        FROM events
    ),
    pv AS (
        SELECT event_type || '|' || hh AS cell,
               CASE WHEN hh % 5 = 0 THEN u / 1000 ELSE u END AS p
        FROM (SELECT event_type, hh,
                     CAST(('0x' || substr(md5(event_type || '|' || hh),
                                          1, 15)) AS BIGINT)
                       / 1152921504606846976.0 AS u
              FROM cells)
    ),
    r AS (
        SELECT cell, p,
               row_number() OVER (ORDER BY p, cell) AS i,
               count(*) OVER () AS m
        FROM pv
    ),
    q AS (
        SELECT cell, p, i,
               least(min(CAST(m AS DOUBLE) * p / i) OVER (
                         ORDER BY p DESC, cell DESC
                         ROWS UNBOUNDED PRECEDING),
                     1.0) AS qv
        FROM r
    )
    SELECT cell, p,
           CAST(i AS BIGINT) AS rank,
           floor(qv * 1000000 + 0.5) / 1000000.0 AS q,
           qv <= 10 / 100.0 AS is_discovery
    FROM q ORDER BY cell
"""


@query("stats_bh_fdr", oracle=_BH_ORACLE)
def stats_bh_fdr(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import bh_adjust

    ev = load_table(spark, sf, "events")
    cells = ev.select(
        F.col("event_type"), F.hour("ts").cast("bigint").alias("hh")
    ).distinct()
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("event_type"), F.col("hh"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(float(1 << 60))
    )
    pv = cells.select(
        F.concat_ws("|", F.col("event_type"), F.col("hh")).alias("cell"),
        F.when(F.col("hh") % 5 == 0, u / F.lit(1000)).otherwise(u).alias("p"),
    )
    return bh_adjust(pv, "p", "cell", alpha_pct=10).orderBy("cell")


# --------------------------------------------------------------------------
# Isotonic calibration (operators/profile.isotonic_calibrate): PAV-optimal
# monotone fit of P(event_type = 'purchase' | value) over 64 fixed-width
# value buckets — the calibration map a quality-classifier gate applies
# before thresholding. The corpus collapses to <= 64 (n, sum_label) rows in
# one map-side-combinable agg; the fit is the exact minimax
# characterization (max over left ends of min over right ends of the
# interval average), O(B^3) join rows over the bucket frame, no collect.
# The oracle replays the identical minimax over the identical buckets.
#
# Registered round 10 (staged round 9; pre-validated by the staged-queue
# mirror and tests/test_maintenance_ops.py::
# test_isotonic_calibrate_matches_pav_reference).
# --------------------------------------------------------------------------
_ISO_B = 64
_ISO_LO, _ISO_HI = 0.0, 320.0

_ISOTONIC_ORACLE = f"""
    WITH stats AS (
        SELECT CAST(least(greatest(floor((CAST(value AS DOUBLE) - {_ISO_LO})
                                         / {(_ISO_HI - _ISO_LO) / _ISO_B}),
                                   0), {_ISO_B - 1}) AS INT) AS bucket,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS sum_label
        FROM events GROUP BY 1
    ),
    pre AS (
        SELECT bucket, n, sum_label,
               sum(n) OVER win AS w_cum, sum(sum_label) OVER win AS p_cum
        FROM stats WINDOW win AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
    ),
    intervals AS (
        SELECT j.bucket AS jb, k.bucket AS kb,
               CAST(k.p_cum - (j.p_cum - j.sum_label) AS DOUBLE)
                   / CAST(k.w_cum - (j.w_cum - j.n) AS DOUBLE) AS avgv
        FROM pre j JOIN pre k ON j.bucket <= k.bucket
    ),
    iso AS (
        SELECT i.bucket, max(m.mn) AS iso_raw
        FROM pre i JOIN (
            SELECT a.bucket AS ib, v.jb, min(v.avgv) AS mn
            FROM pre a JOIN intervals v
              ON v.jb <= a.bucket AND v.kb >= a.bucket
            GROUP BY 1, 2
        ) m ON m.ib = i.bucket
        GROUP BY 1
    )
    SELECT pre.bucket,
           floor(({_ISO_LO} + CAST(pre.bucket AS DOUBLE)
                  * {(_ISO_HI - _ISO_LO) / _ISO_B}) * 1000000 + 0.5)
               / 1000000.0 AS score_lo,
           pre.n, pre.sum_label,
           floor(CAST(pre.sum_label AS DOUBLE) / CAST(pre.n AS DOUBLE)
                 * 1000000 + 0.5) / 1000000.0 AS mean_label,
           floor(iso_raw * 1000000 + 0.5) / 1000000.0 AS iso_prob
    FROM pre JOIN iso USING (bucket) ORDER BY bucket
"""


@query("stats_isotonic_calibrate", oracle=_ISOTONIC_ORACLE)
def stats_isotonic_calibrate(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import isotonic_calibrate

    ev = load_table(spark, sf, "events")
    ev = ev.select(
        "value",
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
    )
    return isotonic_calibrate(
        ev, "value", "is_purchase", lo=_ISO_LO, hi=_ISO_HI, n_buckets=_ISO_B
    ).orderBy("bucket")


# --------------------------------------------------------------------------
# Two-sample Q-Q table (operators/profile.qq_table): purchase-vs-click
# value distributions at the 19-point ventile grid — WHERE the two
# distributions diverge, complementing the single-number KS statistic.
# Exact type-1 order statistics on distinct values (the stats_group_auc
# rank-on-distinct move); the oracle recomputes the identical grid.
#
# Registered round 10 (staged round 9; pre-validated by the staged-queue
# mirror and tests/test_maintenance_ops.py).
# --------------------------------------------------------------------------
_QQ_N = 19

_QQ_ORACLE = f"""
    WITH g AS (
        SELECT event_type AS grp, CAST(value AS DOUBLE) AS v
        FROM events WHERE event_type IN ('purchase', 'click')
    ),
    counts AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY grp),
    dv AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS c FROM g GROUP BY grp, v),
    cum AS (
        SELECT grp, v,
               sum(c) OVER (PARTITION BY grp ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM dv
    ),
    ps AS (SELECT CAST(i AS DOUBLE) / {_QQ_N + 1}.0 AS p
           FROM range(1, {_QQ_N + 1}) t(i)),
    picked AS (
        SELECT grp, p, min(v) AS q
        FROM cum JOIN counts USING (grp) JOIN ps
          ON cum.cum >= CAST(ceiling(p * CAST(n AS DOUBLE)) AS BIGINT)
        GROUP BY grp, p
    )
    SELECT a.p, a.q AS q_a, b.q AS q_b,
           floor((a.q - b.q) * 1000000 + 0.5) / 1000000.0 AS qq_diff
    FROM (SELECT p, q FROM picked WHERE grp = 'purchase') a
    JOIN (SELECT p, q FROM picked WHERE grp = 'click') b USING (p)
    ORDER BY p
"""


@query("stats_qq_table", oracle=_QQ_ORACLE)
def stats_qq_table(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import qq_table

    ev = load_table(spark, sf, "events")
    return qq_table(
        ev, "value", "event_type", "purchase", "click", n_quantiles=_QQ_N
    ).orderBy("p")


# --------------------------------------------------------------------------
# Binned ECE / reliability table (operators/profile.calibration_report):
# is the squashed engagement score value/(value+100) calibrated against
# the purchase label? ONE map-side hash agg onto 10 buckets; scores enter
# the mean as 1e-6 fixed-point BIGINTs, one mirrored division per emitted
# float, sum(ece_contrib) IS the ECE. Companion readout to
# stats_isotonic_calibrate (that one FIXES miscalibration; this one
# measures it).
#
# STAGED for round-11 registration (the round-10 driver budget went to
# the seven round-9-staged registrations + the r04/r05 refresh tiers).
# Pre-validated by the staged-queue mirror and
# tests/test_maintenance_ops.py::test_calibration_report_known_values.
# --------------------------------------------------------------------------
_ECE_B = 10

_ECE_ORACLE = f"""
    WITH b AS (
        SELECT least(greatest(CAST(floor(
                   (CAST(value AS DOUBLE) / (CAST(value AS DOUBLE) + 100.0))
                   / 0.1) AS INT), 0), {_ECE_B - 1}) AS bucket,
               CAST(floor((CAST(value AS DOUBLE)
                   / (CAST(value AS DOUBLE) + 100.0)) * 1000000 + 0.5)
                   AS BIGINT) AS u,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events WHERE value IS NOT NULL
    ),
    s AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(u) AS BIGINT) AS su,
               CAST(SUM(y) AS BIGINT) AS sum_label
        FROM b GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM s)
    SELECT CAST(bucket AS INTEGER) AS bucket, n, sum_label,
           {_r6('(CAST(su AS DOUBLE) / 1000000.0) / CAST(n AS DOUBLE)')}
               AS mean_score,
           {_r6('CAST(sum_label AS DOUBLE) / CAST(n AS DOUBLE)')}
               AS frac_pos,
           {_r6('''abs(CAST(sum_label AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(su AS DOUBLE) / 1000000.0) / CAST(n AS DOUBLE))''')}
               AS abs_gap,
           {_r6('''(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE))
               * abs(CAST(sum_label AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(su AS DOUBLE) / 1000000.0) / CAST(n AS DOUBLE))''')}
               AS ece_contrib
    FROM s, t ORDER BY bucket
"""


@query("stats_ece_report", oracle=_ECE_ORACLE)
def stats_ece_report(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import calibration_report

    ev = load_table(spark, sf, "events").select(
        (
            F.col("value").cast("double")
            / (F.col("value").cast("double") + F.lit(100.0))
        ).alias("score"),
        (F.col("event_type") == F.lit("purchase")).cast("int").alias("y"),
    )
    return calibration_report(
        ev, "score", "y", 0.0, 1.0, n_buckets=_ECE_B
    ).orderBy("bucket")


# --------------------------------------------------------------------------
# Cross-group quantile normalization (operators/profile.quantile_normalize):
# map each event_type's SCORE distribution (the [0,1)-squashed engagement
# score, the stats_ece_report column) onto the pooled one so a single
# global threshold is meaningful. Rank math is EXACT integers end to end
# (doubled mid-ECDF numerator, one BIGINT ceiling division, interval join
# into the pooled distinct-value table); only the 1/scale de-fixing
# divisions are floats, mirrored. Output is the NDV-bounded MAP, not a
# corpus rewrite. The operator's documented domain is a BOUNDED score
# grid: at scale=1000 on [0,1) both the pooled table and the per-group
# map hold at most 1001 distinct values, so the broadcast interval join
# is grid^2-bounded regardless of corpus size. (A first staged cut
# normalized the RAW value column — range ~[0, 5e4], NDV ~rows — and
# benched at 8.4s at sf0.1: the interval join is quadratic in NDV, the
# honest reason the contract demands a bounded grid.)
#
# STAGED for round-11 registration. Pre-validated by the staged-queue
# mirror and tests/test_maintenance_ops.py::
# test_quantile_normalize_known_values.
# --------------------------------------------------------------------------
_QN_ORACLE = f"""
    WITH v AS (
        SELECT event_type AS g,
               CAST(floor((CAST(value AS DOUBLE)
                   / (CAST(value AS DOUBLE) + 100.0)) * 1000.0 + 0.5)
                   AS BIGINT) AS u
        FROM events WHERE value IS NOT NULL
    ),
    per AS (
        SELECT g, u, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY 1, 2
    ),
    gm AS (
        SELECT g, u, cnt,
               2 * SUM(cnt) OVER (PARTITION BY g ORDER BY u
                                  ROWS UNBOUNDED PRECEDING) - cnt AS p2,
               SUM(cnt) OVER (PARTITION BY g) AS ng
        FROM per
    ),
    pooled AS (
        SELECT u, CAST(COUNT(*) AS BIGINT) AS pc FROM v GROUP BY 1
    ),
    ptab AS (
        SELECT u AS pu,
               SUM(pc) OVER (ORDER BY u ROWS UNBOUNDED PRECEDING)
                   - pc + 1 AS plo,
               SUM(pc) OVER (ORDER BY u ROWS UNBOUNDED PRECEDING) AS phi
        FROM pooled
    ),
    nt AS (SELECT CAST(SUM(pc) AS BIGINT) AS n FROM pooled),
    rk AS (
        SELECT g, u, cnt,
               (p2 * (SELECT n FROM nt) + 2 * ng - 1) // (2 * ng) AS r
        FROM gm
    )
    SELECT rk.g AS event_type,
           {_r6('CAST(rk.u AS DOUBLE) / 1000.0')} AS value,
           rk.cnt AS n,
           {_r6('CAST(ptab.pu AS DOUBLE) / 1000.0')} AS norm_value
    FROM rk JOIN ptab ON rk.r >= ptab.plo AND rk.r <= ptab.phi
    ORDER BY event_type, value
"""


@query("stats_quantile_normalize", oracle=_QN_ORACLE)
def stats_quantile_normalize(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.profile import quantile_normalize

    ev = load_table(spark, sf, "events").select(
        "event_type",
        (
            F.col("value").cast("double")
            / (F.col("value").cast("double") + F.lit(100.0))
        ).alias("score"),
    )
    return quantile_normalize(
        ev, "event_type", "score", scale=1000
    ).orderBy("event_type", "value")
