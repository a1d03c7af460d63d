"""Product quantization (PQ): compressed-domain ANN for corpora whose raw
vectors no longer fit the cluster.

IVF (operators/similarity.py) prunes WHICH vectors a query scans; PQ
shrinks WHAT each scanned vector costs: d float32 dims become m one-byte
codes (d=64 -> 64x compression at m=8), and search runs entirely in the
compressed domain via asymmetric distance computation (ADC) — the query
builds one (m x k) lookup table of exact sub-distances, and each candidate
costs m table lookups instead of d multiplies. The classical recipe
(Jegou et al., "Product Quantization for Nearest Neighbor Search", TPAMI
2011); FAISS's IVF-PQ pairs both prunings.

Spark shapes:

- **train**: driver-side Lloyd iterations on a deterministic hash-ordered
  sample (seeded, reproducible) — codebooks are (m, k, d/m), a few KB;
  centroid quality needs a distribution sketch, not the corpus.
- **encode**: `mapInPandas`, codebooks in the task closure; per Arrow
  batch one vectorized argmin per subspace. Map-only, fuses into a scan.
- **search**: per-partition ADC with numpy advanced indexing; each
  partition emits only its local top-k (the brute_force_topk_numpy
  reduction pattern) — the shuffle carries |partitions| * |q| * k rows.

PQ scores approximate true distances, so like every approximate op here
it is pinned by a recall-vs-exact test, not an equality oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hash_sample(df: DataFrame, n: int, id_col: str) -> DataFrame:
    h = F.md5(F.concat(F.lit("pq:"), F.col(id_col).cast("string")))
    return df.orderBy(h, id_col).limit(n)


def train_pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 10_000,
    iters: int = 10,
    seed: int = 7,
):
    """Train per-subspace codebooks: numpy Lloyd iterations over a
    hash-ordered sample (deterministic across runs/partitionings).
    Returns an (m, codes, d/m) float64 array."""
    import numpy as np

    rows = _hash_sample(emb.select(id_col, vec_col), sample, id_col).collect()
    x = np.array([r[1] for r in rows], dtype=np.float64)
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, codes, sub))
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        cent = xs[rng.choice(n, size=codes, replace=n < codes)].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(codes):
                pts = xs[assign == c]
                if len(pts):
                    cent[c] = pts.mean(axis=0)
        books[j] = cent
    return books


def pq_encode(
    emb: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Compress each vector to its m nearest-centroid codes:
    ``(id_col, pq_code: array<int>)``. Map-only; the id rides through
    with its NATIVE type (string/UUID ids are as valid as ints)."""
    import numpy as np

    books = np.asarray(codebooks)
    m, codes, sub = books.shape
    flat = books.reshape(m * codes, sub)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            out = np.empty((len(x), m), dtype=np.int32)
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                d2 = (
                    (xs**2).sum(axis=1, keepdims=True)
                    - 2 * xs @ books[j].T
                    + (books[j] ** 2).sum(axis=1)[None, :]
                )
                out[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "pq_code": list(out)}
            )

    id_type = emb.schema[id_col].dataType.simpleString()
    return emb.select(id_col, vec_col).mapInPandas(
        encode, schema=f"{id_col} {id_type}, pq_code array<integer>"
    )


def pq_topk(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine: int = 0,
    corpus: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k over PQ codes: per query one (m x codes) table of exact
    sub-distances to the codebook centroids, then every candidate costs m
    lookups. Each partition emits its local top-k; the global reduce sees
    |partitions| * |q| * k rows. Returns (query_id, neighbor_id, dist2) —
    squared L2, smaller is nearer.

    ``refine > 0`` (with ``corpus``) is the production configuration:
    take a ``refine * k`` ADC shortlist, join the shortlist's ORIGINAL
    vectors back (a |q| * refine * k row join — tiny), and re-rank by
    exact distance, so PQ lossiness only costs recall a neighbor must
    fall out of the shortlist to lose. The compressed scan still did all
    the heavy lifting: the raw vectors are touched for shortlist rows
    only."""
    import numpy as np

    MAX_QUERIES = 100_000
    qrows = queries.select(id_col, vec_col).limit(MAX_QUERIES + 1).collect()
    if len(qrows) > MAX_QUERIES:
        raise ValueError("pq_topk: query set must be broadcastable (100k cap)")
    books = np.asarray(codebooks)
    m, codes, sub = books.shape
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array([r[1] for r in qrows], dtype=np.float64)
    # distance tables: tables[qi, j, c] = ||q_sub - centroid||^2
    tables = np.empty((len(q_ids), m, codes))
    for j in range(m):
        qs = q_mat[:, j * sub : (j + 1) * sub]
        tables[:, j, :] = (
            (qs**2).sum(axis=1, keepdims=True)
            - 2 * qs @ books[j].T
            + (books[j] ** 2).sum(axis=1)[None, :]
        )

    shortlist = max(k, refine * k)

    def search(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        j_idx = np.arange(m)
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            cds = np.array(list(pdf["pq_code"]), dtype=np.int64)  # (n, m)
            for qi, qid in enumerate(q_ids):
                d2 = tables[qi][j_idx, cds].sum(axis=1)  # (n,)
                mask = ids != qid
                cids, cd = ids[mask], d2[mask]
                if len(cids) > shortlist:
                    part = np.argpartition(cd, shortlist)[:shortlist]
                    cids, cd = cids[part], cd[part]
                yield pd.DataFrame(
                    {"query_id": qid, "neighbor_id": cids, "dist2": cd}
                )

    local = encoded.mapInPandas(
        search, schema="query_id long, neighbor_id long, dist2 double"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy("dist2", "neighbor_id")
    adc = (
        local.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= shortlist)
        .drop("__r")
    )
    if not refine:
        return (
            adc.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= k)
            .drop("__r")
        )
    if corpus is None:
        raise ValueError("refine > 0 needs the corpus DataFrame for re-rank")
    nvec = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv")
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    exact = (
        adc.drop("dist2")
        .join(nvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .withColumn(
            "dist2",
            F.aggregate(
                F.zip_with(
                    F.col("__nv").cast("array<double>"),
                    F.col("__qv").cast("array<double>"),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .drop("__nv", "__qv")
    )
    return (
        exact.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


def build_ivfpq_index(
    emb: DataFrame,
    root: str,
    num_cells: int = 16,
    m: int = 8,
    codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids="kmeans",
    files_per_cell: int = 1,
) -> int:
    """FAISS-style IVF-PQ index on disk: both prunings persisted together.
    Each vector is unit-normalized ONCE at build, assigned to its nearest
    coarse cell (IVF — prunes WHICH rows a query opens, via partition
    pruning), and PQ-encoded over the normalized coordinates (prunes WHAT
    each opened row costs to score). The layout is the existing IVF index
    plus a ``pq_code`` column per row and a ``codebooks`` table
    (m x codes sub-centroids, KB-scale) next to the centroids.

    Costs one extra equi-join at build (codes back onto rows); search can
    then scan probe cells in the compressed domain and touch raw vectors
    only for a shortlist. Returns the number of cells."""
    from momyre_spark.functions.vectors import add_normalized
    from momyre_spark.operators.similarity import (
        _centroid_rows,
        _nearest_cells,
        _write_by_cell,
    )

    spark = emb.sparkSession
    nemb = add_normalized(emb, vec_col, "__nv")
    books = train_pq_codebooks(nemb, m=m, codes=codes, id_col=id_col, vec_col="__nv")
    coded = pq_encode(nemb, books, id_col=id_col, vec_col="__nv")
    cents = _centroid_rows(emb, num_cells, id_col, centroids, vec_col)
    assigned = (
        _nearest_cells(nemb, cents, id_col, n_best=1)
        .select(
            id_col,
            F.col("__nv").alias("nvec"),
            F.col("cent_id").alias("cell"),
        )
        .join(coded, id_col)
    )
    _write_by_cell(
        assigned, f"{root}/vectors", num_cells, files_per_cell, id_col
    )
    cdf = spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in cents],
        "cent_id int, centroid array<double>",
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(f"{root}/centroids")
    bdf = spark.createDataFrame(
        [
            (j, c, [float(x) for x in books[j][c]])
            for j in range(m)
            for c in range(codes)
        ],
        "j int, c int, centroid array<double>",
    )
    bdf.coalesce(1).write.mode("overwrite").parquet(f"{root}/codebooks")
    # a rebuild indexes the caller's full corpus AND retrains codebooks:
    # any add-tail from a previous index generation is stale on both
    # counts (old rows duplicate the new base; old pq_code/cell were
    # computed against the old codebooks/centroids) — drop it
    from momyre_spark.operators.similarity import _ivf_fs

    jvm, fs = _ivf_fs(spark, root)
    fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/adds"), True)
    return len(cents)


def ivfpq_topk_indexed(
    spark,
    root: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 1,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k against a :func:`build_ivfpq_index` index, Spark-native ADC:

    1. probe cells resolve driver-side (centroids are KB) into a literal
       partition filter — only ~nprobe/C of the index is ever opened;
    2. per (query, probe-cell) row of a BROADCAST frame carries the
       query's flattened ADC table (m·codes exact sub-distances, built
       once on the driver) — candidates attach by one equi-join on the
       cell id, so restriction is strictly per-query;
    3. ADC cost per candidate is an m-lookup ``aggregate`` fold over the
       broadcast table — plain codegen'd JVM expressions, no Python in
       the scan path;
    4. the ADC shortlist (``max(k, refine*k)`` per query) is re-ranked by
       EXACT cosine from the stored normalized vectors — the standard
       refine step, touching raw vectors for shortlist rows only.

    Output matches ivf_topk: (query_id, neighbor_id, rank, cos), ranked
    by exact cosine within the shortlist. PQ lossiness therefore only
    costs recall when a true neighbor misses the shortlist entirely
    (recall-vs-exact pinned in tests; widen refine/nprobe to recover)."""
    import numpy as np

    from momyre_spark.functions.vectors import add_normalized, dot
    from momyre_spark.operators.similarity import (
        _ivf_heal,
        _nearest_cells,
        _topk,
    )

    # heal FIRST: loading centroids before the heal could mix an old
    # centroid geometry with a committed-but-unswapped reclustered base
    _ivf_heal(spark, root)
    cents = [
        (int(r["cent_id"]), list(r["centroid"]))
        for r in spark.read.parquet(f"{root}/centroids").collect()
    ]
    brows = spark.read.parquet(f"{root}/codebooks").collect()
    m = 1 + max(r["j"] for r in brows)
    codes = 1 + max(r["c"] for r in brows)
    books = np.empty((m, codes, len(brows[0]["centroid"])))
    for r in brows:
        books[r["j"]][r["c"]] = r["centroid"]
    sub = books.shape[2]

    nq = add_normalized(queries, vec_col, "__nv")
    qcells = _nearest_cells(nq, cents, id_col, n_best=nprobe).select(
        F.col(id_col).alias("query_id"),
        F.col("__nv").alias("__qv"),
        F.col("cent_id").alias("__qcell"),
    )
    MAX_QUERIES = 100_000
    # the frame has nprobe rows per query — cap the QUERY count (what the
    # sibling searches cap), not the row count, or raising nprobe would
    # spuriously reject valid workloads
    qrows = qcells.limit(MAX_QUERIES * max(1, nprobe) + 1).collect()
    if len({r["query_id"] for r in qrows}) > MAX_QUERIES:
        raise ValueError(
            "ivfpq_topk_indexed: query set must be broadcastable (100k cap)"
        )
    # ids ride through with their NATIVE type (string/UUID ids are as
    # valid as ints — the broadcast schema is built from the query frame,
    # matching the sibling ivf_topk_indexed's contract)
    tables: dict = {}
    qvecs: dict = {}
    for r in qrows:
        qid = r["query_id"]
        if qid not in tables:
            qv = np.asarray(r["__qv"], dtype=np.float64)
            tbl = np.empty((m, codes))
            for j in range(m):
                qs = qv[j * sub : (j + 1) * sub]
                tbl[j] = ((books[j] - qs[None, :]) ** 2).sum(axis=1)
            tables[qid] = [float(x) for x in tbl.ravel()]
            qvecs[qid] = [float(x) for x in qv]
    from pyspark.sql import types as T

    id_type = qcells.schema["query_id"].dataType
    qschema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("__qcell", T.IntegerType()),
            T.StructField("__tbl", T.ArrayType(T.DoubleType())),
            T.StructField("__qv", T.ArrayType(T.DoubleType())),
        ]
    )
    qframe = spark.createDataFrame(
        [
            (r["query_id"], int(r["__qcell"]),
             tables[r["query_id"]], qvecs[r["query_id"]])
            for r in qrows
        ],
        qschema,
    )
    probe = sorted({int(r["__qcell"]) for r in qrows})
    from momyre_spark.operators.similarity import _ivf_corpus

    # pq_code IS NOT NULL: a PQ index fed through plain ivf_index_add
    # (ivf_kind left at 'ivf') reads NULL pq_code via the explicit-schema
    # union; a NULL ADC distance under default NULLS FIRST would flood
    # every shortlist and silently displace real candidates. Un-encoded
    # rows cannot be ADC-ranked at all, so they are excluded here — use
    # ivfpq_index_add to keep tail rows searchable.
    corpus = (
        _ivf_corpus(spark, root)
        .filter(F.col("cell").isin(probe))
        .filter(F.col("pq_code").isNotNull())
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col("nvec").alias("__cv"),
            F.col("pq_code"),
            F.col("cell").alias("__ccell"),
        )
    )
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.col("__tbl"),
            (j * codes + F.element_at(F.col("pq_code"), j + 1) + 1).cast("int"),
        ),
    )
    shortlist = max(k, refine * k)
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("__d2").asc_nulls_last(), F.col("neighbor_id")
    )
    cand = (
        corpus.join(
            F.broadcast(qframe), F.col("__ccell") == F.col("__qcell")
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("__d2", adc)
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= shortlist)
    )
    scored = cand.withColumn("cos", dot(F.col("__cv"), F.col("__qv")))
    return _topk(scored, k)


def ivfpq_index_add(
    spark,
    root: str,
    new_vectors: DataFrame,
    epoch: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Incrementally add vectors to a :func:`build_ivfpq_index` index —
    O(|batch|), same layout contract as ``similarity.ivf_index_add``
    (epoch-idempotent ``adds/epoch=N/cell=C`` tail, one file per cell).

    New rows are encoded with the STORED codebooks and assigned to the
    STORED cells, so search over base+tail stays one consistent index; the
    codebooks never move between compactions for the same reason the
    coarse centroids never move (ADC tables built against them must rank
    every indexed row). Fold the tail with ``similarity.ivf_index_compact``
    (``recluster=False`` — the pq_code column passes through the merge);
    a RE-clustered IVF-PQ index means retrained codebooks, which is a
    :func:`build_ivfpq_index` rebuild by definition."""
    import numpy as np

    from momyre_spark.functions.vectors import add_normalized
    from momyre_spark.operators.similarity import (
        _ivf_add_epochs,
        _ivf_heal,
        _nearest_cells,
        _write_by_cell,
    )

    _ivf_heal(spark, root)
    cents = [
        (int(r["cent_id"]), list(r["centroid"]))
        for r in spark.read.parquet(f"{root}/centroids").collect()
    ]
    brows = spark.read.parquet(f"{root}/codebooks").collect()
    m = 1 + max(r["j"] for r in brows)
    codes = 1 + max(r["c"] for r in brows)
    books = np.empty((m, codes, len(brows[0]["centroid"])))
    for r in brows:
        books[r["j"]][r["c"]] = r["centroid"]
    if epoch is None:
        prior = _ivf_add_epochs(spark, root)
        epoch = (prior[-1] + 1) if prior else 0
    nemb = add_normalized(new_vectors, vec_col, "__nv")
    coded = pq_encode(nemb, books, id_col=id_col, vec_col="__nv")
    assigned = (
        _nearest_cells(nemb, cents, id_col, n_best=1)
        .select(
            id_col,
            F.col("__nv").alias("nvec"),
            F.col("cent_id").alias("cell"),
        )
        .join(coded, id_col)
    )
    _write_by_cell(
        assigned, f"{root}/adds/epoch={epoch}", len(cents), 1, id_col
    )
    return int(epoch)
