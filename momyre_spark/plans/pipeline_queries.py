"""Training-pipeline queries: sharding / splits / sampling / packing
(operators/sampling.py) over ``documents``.

All four operators are hash-deterministic with the engine-neutral md5-prefix
key hash, so every query carries a full DuckDB value-hash oracle — the
"random" sample is bit-identically reproducible in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from momyre_spark.plans import query
from momyre_spark.sources.parquet import load_table

# engine-neutral 60-bit key hash, DuckDB form
_H = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"

_N_SHARDS = 8
_VAL_RES = 1_000_000
_VAL_FRAC = 0.05
_STRATA = {"en": 0.5, "de": 0.25}
_DEFAULT_FRAC = 0.1
_PACK_BUDGET = 2048


@query(
    "pipe_shard_assignment",
    oracle=f"""
    SELECT doc_id, {_H} % {_N_SHARDS} AS shard
    FROM documents ORDER BY doc_id
    """,
)
def pipe_shard_assignment(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.sampling import assign_shards

    docs = load_table(spark, sf, "documents")
    return assign_shards(docs, _N_SHARDS).select("doc_id", "shard").orderBy("doc_id")


@query(
    "pipe_train_val_split",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_H} % {_VAL_RES} < {int(_VAL_FRAC * _VAL_RES)}
                THEN 'val' ELSE 'train' END AS split
    FROM documents ORDER BY doc_id
    """,
)
def pipe_train_val_split(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.sampling import train_val_split

    docs = load_table(spark, sf, "documents")
    return (
        train_val_split(docs, _VAL_FRAC, resolution=_VAL_RES)
        .select("doc_id", "split")
        .orderBy("doc_id")
    )


@query(
    "pipe_stratified_sample",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang ORDER BY {_H}, doc_id) AS rk,
               count(*) OVER (PARTITION BY lang) AS n,
               CASE lang WHEN 'en' THEN {_STRATA['en']} WHEN 'de' THEN {_STRATA['de']}
                    ELSE {_DEFAULT_FRAC} END AS frac
        FROM documents
    )
    SELECT doc_id, lang FROM ranked
    WHERE rk <= ceil(frac * n)
    ORDER BY doc_id
    """,
)
def pipe_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf, "documents")
    return (
        stratified_sample(
            docs, _STRATA, strata_col="lang", default_fraction=_DEFAULT_FRAC
        )
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@query(
    "pipe_pack_sequences",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS n
        FROM documents
    ),
    c AS (
        SELECT doc_id, n,
               sum(n) OVER (ORDER BY {_H}, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT doc_id,
           CAST(floor((cum - n) / {_PACK_BUDGET}) AS BIGINT) AS bin,
           n > {_PACK_BUDGET} AS overflow
    FROM c ORDER BY doc_id
    """,
)
def pipe_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions.text import token_count
    from momyre_spark.operators.sampling import pack_sequences

    docs = load_table(spark, sf, "documents").withColumn(
        "n_tokens", token_count(F.col("text"))
    )
    return (
        pack_sequences(docs, _PACK_BUDGET)
        .select("doc_id", "bin", "overflow")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Token-budget mixture sampling (operators/sampling.token_budget_mixture):
# per language, take documents in hash order until the stratum's token
# budget fills — how pretraining mixtures are specified ("N tokens of X"),
# as opposed to row fractions. Greedy cut: keep iff cumulative BEFORE the
# doc is under budget.
# --------------------------------------------------------------------------
_MIX_BUDGETS = {"en": 3000, "de": 1500}
_MIX_DEFAULT = 800

_MIX_CASE = (
    "CASE lang WHEN 'en' THEN 3000 WHEN 'de' THEN 1500 ELSE 800 END"
)


@query(
    "pipe_token_budget_mixture",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, lang, n_tokens,
               sum(n_tokens) OVER (
                   PARTITION BY lang ORDER BY {_H}, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM t
    )
    SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens
    FROM c WHERE cum - n_tokens < {_MIX_CASE}
    ORDER BY doc_id
    """,
)
def pipe_token_budget_mixture(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.sampling import token_budget_mixture

    docs = load_table(spark, sf, "documents").withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " ")).cast("bigint")
    )
    return (
        token_budget_mixture(
            docs, _MIX_BUDGETS, strata_col="lang", default_budget=_MIX_DEFAULT
        )
        .select("doc_id", "lang", "n_tokens")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Temperature-scaled mixture weights (operators/sampling.
# temperature_mixture_report): p_s ∝ n_s^tau per source — the standard
# pretraining re-balancing; with a global budget the report allocates
# per-source tokens + the implied repeat epochs (data-constrained signal).
# tau = 0.5 so the power is sqrt() — correctly rounded in BOTH engines;
# the scaled terms round to DECIMAL(18,6) BEFORE summation (exact,
# order-independent) and every float output is decimal-rounded, so the
# weight ratio is bit-identical (the oracled-floating-aggregate pattern;
# scale 6 keeps decimal->double conversion a single rounding in DuckDB).
# --------------------------------------------------------------------------
_TMIX_BUDGET = 1_000_000


@query(
    "pipe_temperature_mixture",
    oracle=f"""
    WITH per AS (
        SELECT source AS stratum,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
        FROM documents GROUP BY source
    ),
    s AS (
        SELECT stratum, tokens,
               CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * 1000000 + 0.5)
                    / 1000000.0 AS DECIMAL(38,6)) AS sv
        FROM per
    ),
    tot AS (
        SELECT CAST(sum(tokens) AS BIGINT) AS tt, sum(sv) AS ts FROM s
    ),
    w AS (
        SELECT stratum, tokens,
               floor(CAST(tokens AS DOUBLE) / CAST(tt AS DOUBLE)
                     * 1000000 + 0.5) / 1000000.0 AS nat_frac,
               floor(CAST(sv AS DOUBLE) / CAST(ts AS DOUBLE)
                     * 1000000 + 0.5) / 1000000.0 AS weight
        FROM s, tot
    )
    SELECT stratum, tokens, nat_frac, weight,
           CAST(floor(weight * {_TMIX_BUDGET}) AS BIGINT) AS alloc_tokens,
           floor(CAST(floor(weight * {_TMIX_BUDGET}) AS BIGINT)
                 / CAST(tokens AS DOUBLE) * 10000 + 0.5) / 10000.0 AS epochs
    FROM w ORDER BY stratum
    """,
)
def pipe_temperature_mixture(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.sampling import temperature_mixture_report

    docs = load_table(spark, sf, "documents").withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " ")).cast("bigint")
    )
    return temperature_mixture_report(
        docs, tau=0.5, global_budget=_TMIX_BUDGET
    )


# --------------------------------------------------------------------------
# Mixture materialization (operators/sampling.materialize_mixture): the
# executable form of the mixture report — floor(e) full copies per doc plus
# one more under a fractional hash threshold; e < 1 downsamples. MAP-ONLY
# (the explode fuses into the scan; no shuffle at all) — the 100 TB trade
# vs an exact window cut. Thresholds are driver-side integer literals, so
# both engines compare the same BIGINTs.
# --------------------------------------------------------------------------
_MAT_EPOCHS = {"src0": 2.0, "src1": 1.5, "src5": 0.25}


def _mat_case(expr: str) -> str:
    full, thr = [], []
    for k, e in _MAT_EPOCHS.items():
        full.append(f"WHEN '{k}' THEN {int(e)}")
        thr.append(f"WHEN '{k}' THEN {int((e - int(e)) * (1 << 60))}")
    return (
        f"(CASE source {' '.join(full)} ELSE 1 END"
        f" + CASE WHEN {expr} < (CASE source {' '.join(thr)} ELSE 0 END)"
        " THEN 1 ELSE 0 END)"
    )


@query(
    "pipe_mixture_materialize",
    oracle=f"""
    WITH c AS (
        SELECT doc_id, source, {_mat_case(_H)} AS copies FROM documents
    )
    SELECT doc_id, source, CAST(u.c AS INT) AS copy
    FROM c, UNNEST(range(copies)) AS u(c)
    ORDER BY doc_id, copy
    """,
)
def pipe_mixture_materialize(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.sampling import materialize_mixture

    docs = load_table(spark, sf, "documents").select("doc_id", "source")
    return materialize_mixture(docs, _MAT_EPOCHS).orderBy("doc_id", "copy")


# --------------------------------------------------------------------------
# Deterministic exact-k sample (operators/sampling.sample_exact_k): the k
# smallest md5(salt||id) — a seeded reservoir sample that is reproducible
# across engines and stable under appends. Planned as TakeOrderedAndProject
# (per-partition top-k, driver merge), never a global sort.
# --------------------------------------------------------------------------
_SAMPLE_K = 100
_SAMPLE_SALT = "eval-v1:"


@query(
    "pipe_sample_exact_k",
    oracle=f"""
    SELECT doc_id, source FROM (
        SELECT doc_id, source FROM documents
        ORDER BY md5('{_SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), doc_id
        LIMIT {_SAMPLE_K}
    ) ORDER BY doc_id
    """,
)
def pipe_sample_exact_k(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.sampling import sample_exact_k

    docs = load_table(spark, sf, "documents").select("doc_id", "source")
    return sample_exact_k(docs, _SAMPLE_K, id_col="doc_id", salt=_SAMPLE_SALT).orderBy(
        "doc_id"
    )


_CHUNK_W = 32
_CHUNK_S = 24
_SQL_TOK = "string_split_regex(trim(text), '\\s+')"


@query(
    "pipe_chunk_documents",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_SQL_TOK} AS toks
        FROM documents WHERE trim(text) <> ''
    ),
    s AS (
        SELECT doc_id, toks,
               unnest(range(0, CAST(floor((len(toks) - 1) / {_CHUNK_S})
                                    AS BIGINT) + 1)) AS chunk_id
        FROM t WHERE len(toks) > 0
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           array_to_string(
               toks[chunk_id * {_CHUNK_S} + 1 :
                    chunk_id * {_CHUNK_S} + {_CHUNK_W}], ' ') AS chunk_text,
           CAST(len(toks[chunk_id * {_CHUNK_S} + 1 :
                         chunk_id * {_CHUNK_S} + {_CHUNK_W}]) AS BIGINT)
               AS n_chunk_tokens
    FROM s ORDER BY doc_id, chunk_id
    """,
)
def pipe_chunk_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-window context chunking (operators/chunking.py): 32-token
    windows every 24 tokens — overlapping chunks ready for sequence
    packing. Map-only explode; no shuffle."""
    from momyre_spark.operators.chunking import chunk_documents

    docs = load_table(spark, sf, "documents")
    return chunk_documents(docs, window=_CHUNK_W, stride=_CHUNK_S).orderBy(
        "doc_id", "chunk_id"
    )


@query(
    "pipe_global_shuffle",
    oracle=f"""
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY {_H}, doc_id) - 1 AS BIGINT)
               AS position
    FROM documents ORDER BY doc_id
    """,
)
def pipe_global_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic corpus shuffle (operators/sampling.global_shuffle):
    dense position in hash order via range-bucketed two-pass ranking — the
    oracle's single global window is exactly what the operator avoids."""
    from momyre_spark.operators.sampling import global_shuffle

    docs = load_table(spark, sf, "documents")
    return global_shuffle(docs, num_buckets=64).select(
        "doc_id", "position"
    ).orderBy("doc_id")


_PG_K = 5


@query(
    "pipe_sample_per_group",
    oracle=f"""
    SELECT doc_id, source
    FROM (
        SELECT doc_id, source, row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents
    ) WHERE rk <= {_PG_K}
    ORDER BY source, doc_id
    """,
)
def pipe_sample_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Balanced per-source subset (operators/sampling.sample_per_group):
    at most 5 docs per source, drawn by the deterministic hash order."""
    from momyre_spark.operators.sampling import sample_per_group

    docs = load_table(spark, sf, "documents")
    return (
        sample_per_group(docs, _PG_K, ["source"])
        .select("doc_id", "source")
        .orderBy("source", "doc_id")
    )


_WS_K = 100


@query(
    "pipe_weighted_sample",
    oracle=f"""
    SELECT doc_id, n_chars
    FROM (
        SELECT doc_id, n_chars,
               -ln(({_H} + 1) / 1152921504606846976.0)
                   / CAST(n_chars AS DOUBLE) AS key
        FROM documents WHERE n_chars > 0
    )
    ORDER BY key, doc_id LIMIT {_WS_K}
    """,
)
def pipe_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Length-weighted deterministic sample (Efraimidis–Spirakis race with
    hash uniforms): longer documents proportionally likelier — the draw a
    token-budget-aware subset uses. Exactly k rows, reproducible anywhere.
    """
    from momyre_spark.operators.sampling import weighted_sample_k

    docs = load_table(spark, sf, "documents")
    out = weighted_sample_k(docs, _WS_K, weight_col="n_chars")
    return out.select("doc_id", "n_chars")


# --------------------------------------------------------------------------
# End-to-end pretraining prep (the composition the engine exists for):
# quality gate -> exact dedup (min-id survivor) -> sliding-window chunking
# -> hash-shard assignment of chunks. Every stage reuses a tested operator
# (curate gate / dedup_exact / chunk_documents / assign_shards) and every
# stage is SQL-expressible, so the COMPOSED pipeline carries a full
# value-hash oracle — integration correctness, not just per-op.
# Stage order is the scale order: map-only gates first, the one dedup
# shuffle before the explode multiplies rows, sharding map-only at the end.
# --------------------------------------------------------------------------
_PREP_W = 64
_PREP_S = 64
_PREP_SHARDS = 8


@query(
    "pipe_pretrain_prep",
    oracle=f"""
    WITH m AS (
        SELECT *,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS n,
               len(list_filter(string_split_regex(trim(text), '\\s+'),
                   t -> list_contains(['the','a','of','and','to','in','is'], t))) AS hits,
               length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha,
               length(regexp_replace(text, '\\s', '', 'g')) AS total
        FROM documents
    ),
    gated AS (
        SELECT * FROM m
        WHERE n >= 10
          AND floor((0.3 * (CASE WHEN n = 0 THEN 0.0 ELSE hits / CAST(n AS DOUBLE) END)
                   + 0.5 * (CASE WHEN total = 0 THEN 0.0 ELSE alpha / CAST(total AS DOUBLE) END)
                   + 0.2 * (least(CAST(n AS DOUBLE), 200.0) / 200.0)) * 10000 + 0.5) / 10000.0 >= 0.3
    ),
    exact AS (
        SELECT * FROM gated WHERE doc_id IN (
            SELECT min(doc_id) FROM gated
            GROUP BY md5(array_to_string(string_split_regex(trim(lower(text)), '\\s+'), ' '))
        )
    ),
    t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        FROM exact WHERE trim(text) <> ''
    ),
    c AS (
        SELECT doc_id, toks,
               unnest(range(0, CAST(floor((len(toks) - 1) / {_PREP_S})
                                    AS BIGINT) + 1)) AS chunk_id
        FROM t WHERE len(toks) > 0
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                     || CAST(chunk_id AS VARCHAR)), 1, 15))::BIGINT
                % {_PREP_SHARDS} AS BIGINT) AS shard,
           CAST(len(toks[chunk_id * {_PREP_S} + 1 :
                         chunk_id * {_PREP_S} + {_PREP_W}]) AS BIGINT)
               AS n_chunk_tokens
    FROM c ORDER BY doc_id, chunk_id
    """,
)
def pipe_pretrain_prep(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions.text import quality_score, token_count
    from momyre_spark.operators.chunking import chunk_documents
    from momyre_spark.operators.dedup import dedup_exact
    from momyre_spark.operators.sampling import assign_shards

    docs = load_table(spark, sf, "documents")
    t = F.col("text")
    gated = docs.filter((token_count(t) >= 10) & (quality_score(t) >= 0.3))
    deduped = dedup_exact(gated)
    chunks = chunk_documents(deduped, window=_PREP_W, stride=_PREP_S)
    keyed = chunks.withColumn(
        "__ck",
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.col("chunk_id").cast("string"),
        ),
    )
    return (
        assign_shards(keyed, _PREP_SHARDS, id_col="__ck")
        .select("doc_id", "chunk_id", "shard", "n_chunk_tokens")
        .orderBy("doc_id", "chunk_id")
    )


# --------------------------------------------------------------------------
# Scale evidence for the two-pass global shuffle: 1M synthetic ids get a
# dense position in hash order; the oracle computes the same permutation
# with one global window. Output is a 1-row checksum (count, sum, and a
# position-weighted fingerprint) so the driver compares three numbers, not
# a million rows. A wrong offset in ANY bucket shifts the fingerprint.
# --------------------------------------------------------------------------
_GS_N = 1_000_000


@query(
    "pipe_global_shuffle_synthetic_1m",
    oracle=f"""
    WITH ids AS (SELECT i AS doc_id FROM range({_GS_N}) t(i)),
    pos AS (
        SELECT doc_id,
               CAST(row_number() OVER (
                   ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                  1, 15)) AS BIGINT), doc_id) - 1 AS BIGINT)
                   AS position
        FROM ids
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(position) AS BIGINT) AS pos_sum,
           CAST(sum(position * (doc_id % 97)) AS BIGINT) AS fingerprint
    FROM pos
    """,
)
def pipe_global_shuffle_synthetic_1m(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.sampling import global_shuffle

    ids = spark.range(_GS_N).withColumnRenamed("id", "doc_id")
    out = global_shuffle(ids, num_buckets=1024)
    return out.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("position").cast("bigint").alias("pos_sum"),
        F.sum(F.col("position") * (F.col("doc_id") % 97))
        .cast("bigint")
        .alias("fingerprint"),
    )


# --------------------------------------------------------------------------
# Chat / SFT transcript preparation (operators/chat.py). The testdata has no
# conversation table, so a transcript is synthesized per document (120-char
# chunks, roles alternating user-first) with Spark's own to_json, then
# parsed back through the REAL pipeline (from_json ONCE -> posexplode ->
# expression token counts). The oracle computes the same rows directly from
# substrings — JSON escaping round-trips inside each engine, so the
# compared output is engine-neutral.
# --------------------------------------------------------------------------
_CHAT_SYNTH = """
    CASE WHEN length(text) = 0 THEN array()
         ELSE transform(
            sequence(0, CAST((length(text) + 119) / 120 AS INT) - 1),
            i -> named_struct(
                'role',
                CASE WHEN i % 2 = 0 THEN 'user' ELSE 'assistant' END,
                'content', substring(text, i * 120 + 1, 120)))
    END
"""

_CHAT_TURNS_ORACLE = """
    WITH c AS (
        SELECT doc_id,
               unnest(range(0, (length(text) + 119) // 120)) AS i,
               text
        FROM documents
    ),
    t AS (
        SELECT doc_id, CAST(i AS INT) AS turn_idx,
               CASE WHEN i % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
               substring(text, CAST(i * 120 + 1 AS INT), 120) AS content
        FROM c
    )
    SELECT doc_id, turn_idx, role,
           CAST(CASE WHEN trim(content) = '' THEN 0
                ELSE len(string_split_regex(trim(content), '\\s+')) END
                AS BIGINT) AS n_tokens
    FROM t ORDER BY doc_id, turn_idx
"""


@query("chat_turn_tokens", oracle=_CHAT_TURNS_ORACLE)
def chat_turn_tokens(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.chat import chat_turns

    docs = load_table(spark, sf, "documents")
    convo = docs.select(
        "doc_id", F.to_json(F.expr(_CHAT_SYNTH)).alias("convo")
    )
    turns = chat_turns(convo, "convo")
    n_tokens = (
        F.when(F.trim("content") == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim("content"), r"\s+")))
        .cast("bigint")
    )
    return turns.select(
        "doc_id", "turn_idx", "role", n_tokens.alias("n_tokens")
    ).orderBy("doc_id", "turn_idx")


_CHAT_STATS_ORACLE = """
    WITH c AS (
        SELECT doc_id,
               unnest(range(0, (length(text) + 119) // 120)) AS i,
               text
        FROM documents
    ),
    t AS (
        SELECT doc_id, i,
               substring(text, CAST(i * 120 + 1 AS INT), 120) AS content
        FROM c
    ),
    agg AS (
        SELECT doc_id,
               count(*) AS n_turns,
               sum(CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END) AS n_user,
               sum(CASE WHEN i % 2 = 1 THEN 1 ELSE 0 END) AS n_assistant,
               sum(CASE WHEN i % 2 = 1 THEN
                     CASE WHEN trim(content) = '' THEN 0
                          ELSE len(string_split_regex(trim(content), '\\s+'))
                     END ELSE 0 END) AS assistant_tokens
        FROM t GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(a.n_turns, 0) AS INT) AS n_turns,
           CAST(coalesce(a.n_user, 0) AS INT) AS n_user,
           CAST(coalesce(a.n_assistant, 0) AS INT) AS n_assistant,
           coalesce(a.n_turns, 0) > 0 AS alternates,
           CAST(coalesce(a.assistant_tokens, 0) AS BIGINT) AS assistant_tokens
    FROM documents d LEFT JOIN agg a USING (doc_id)
    ORDER BY doc_id
"""


@query("chat_stats_gate", oracle=_CHAT_STATS_ORACLE)
def chat_stats_gate(spark: SparkSession, sf: str) -> DataFrame:
    """Per-conversation gate features WITHOUT an explode (HOFs over the
    parsed array, map-only). The synthetic transcripts always alternate
    user-first, so `alternates` here reduces to n_turns > 0; the
    non-alternating/malformed branches are pinned by test_chat_ops.py."""
    from momyre_spark.operators.chat import chat_stats

    docs = load_table(spark, sf, "documents")
    convo = docs.select(
        "doc_id", F.to_json(F.expr(_CHAT_SYNTH)).alias("convo")
    )
    return chat_stats(convo, "convo").orderBy("doc_id")


_CHAT_PAIRS_ORACLE = """
    WITH c AS (
        SELECT doc_id,
               unnest(range(0, (length(text) + 119) // 120)) AS i,
               text
        FROM documents
    )
    SELECT doc_id,
           CAST(i AS INT) AS response_idx,
           substring(text, CAST((i - 1) * 120 + 1 AS INT), 120) AS prompt,
           substring(text, CAST(i * 120 + 1 AS INT), 120) AS response
    FROM c WHERE i % 2 = 1
    ORDER BY doc_id, response_idx
"""


@query("chat_training_pairs", oracle=_CHAT_PAIRS_ORACLE)
def chat_training_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """(prompt, response) training pairs assembled from the parsed
    transcripts (operators/chat.chat_pairs: lag window per conversation).
    The synthetic transcripts alternate user-first, so the oracle is the
    even/odd chunk pairing computed directly from substrings."""
    from momyre_spark.operators.chat import chat_pairs, chat_turns

    docs = load_table(spark, sf, "documents")
    convo = docs.select(
        "doc_id", F.to_json(F.expr(_CHAT_SYNTH)).alias("convo")
    )
    return chat_pairs(chat_turns(convo, "convo")).orderBy(
        "doc_id", "response_idx"
    )


# --------------------------------------------------------------------------
# SFT loss masking (operators/chat.chat_loss_mask): serialize each synthetic
# transcript to its training string and emit the char spans receiving loss
# (assistant contents only). Spans are flattened to a "start:end;start:end"
# string so the compared value is engine-neutral scalars, not a nested
# array<struct> whose formatting differs between engines. The oracle
# recomputes the offsets with a running window over per-turn serialized
# lengths: header '<|user|>\n' = 9 chars, '<|assistant|>\n' = 14,
# '<|end|>\n' = 8.
# --------------------------------------------------------------------------
_LOSS_MASK_ORACLE = """
    WITH c AS (
        SELECT doc_id,
               unnest(range(0, (length(text) + 119) // 120)) AS i,
               text
        FROM documents
    ),
    t AS (
        SELECT doc_id, i,
               CASE WHEN i % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
               substring(text, CAST(i * 120 + 1 AS INT), 120) AS content
        FROM c
    ),
    seg AS (
        SELECT doc_id, i, role, content,
               CASE WHEN role = 'user' THEN 9 ELSE 14 END AS hlen,
               length(content) AS clen
        FROM t
    ),
    off AS (
        SELECT *,
               COALESCE(SUM(hlen + clen + 8) OVER (
                   PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS prior
        FROM seg
    ),
    agg AS (
        SELECT doc_id,
               string_agg('<|' || role || '|>' || chr(10) || content
                          || '<|end|>' || chr(10), '' ORDER BY i)
                   AS train_text,
               CAST(count(*) FILTER (role = 'assistant') AS BIGINT)
                   AS n_spans,
               COALESCE(string_agg(
                   CASE WHEN role = 'assistant'
                        THEN CAST(prior + hlen AS VARCHAR) || ':'
                             || CAST(prior + hlen + clen AS VARCHAR) END,
                   ';' ORDER BY i), '') AS loss_spans
        FROM off GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.train_text, '') AS train_text,
           COALESCE(a.n_spans, 0) AS n_spans,
           COALESCE(a.loss_spans, '') AS loss_spans
    FROM documents d LEFT JOIN agg a USING (doc_id)
    ORDER BY doc_id
"""


@query("chat_loss_mask", oracle=_LOSS_MASK_ORACLE)
def chat_loss_mask_q(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.chat import chat_loss_mask

    docs = load_table(spark, sf, "documents")
    convo = docs.select(
        "doc_id", F.to_json(F.expr(_CHAT_SYNTH)).alias("convo")
    )
    out = chat_loss_mask(convo, "convo")
    spans_str = F.concat_ws(
        ";",
        F.transform(
            F.col("loss_spans"),
            lambda s: F.concat_ws(
                ":", s["start"].cast("string"), s["end"].cast("string")
            ),
        ),
    )
    return out.select(
        "doc_id",
        "train_text",
        F.size("loss_spans").cast("bigint").alias("n_spans"),
        spans_str.alias("loss_spans"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Fill-in-the-middle pretraining transform (operators/sampling.
# fim_transform, Bavarian et al. 2022): a hash-chosen half of eligible
# documents re-serialize as PSM/SPM around two hash-chosen cut points —
# everything md5(doc_id)-derived, so the oracle mirrors the exact same
# substring arithmetic. Map-only, zero shuffles at any corpus size.
# --------------------------------------------------------------------------
_FIM_ORACLE = """
    WITH p AS (
        SELECT doc_id, text, length(text) AS L,
               (length(text) >= 32 AND
                ('0x' || substr(md5('fim:pick' || CAST(doc_id AS VARCHAR)),
                 1, 15))::BIGINT % 1000000 < 500000) AS tf,
               (('0x' || substr(md5('fim:spm' || CAST(doc_id AS VARCHAR)),
                 1, 15))::BIGINT % 1000000 < 500000) AS use_spm
        FROM documents WHERE text IS NOT NULL
    ),
    c1 AS (
        SELECT *,
               CASE WHEN tf THEN 1 +
                   ('0x' || substr(md5('fim:c1' || CAST(doc_id AS VARCHAR)),
                    1, 15))::BIGINT % (L - 1) END AS cut1
        FROM p
    ),
    c2 AS (
        SELECT *,
               CASE WHEN tf THEN cut1 + 1 +
                   ('0x' || substr(md5('fim:c2' || CAST(doc_id AS VARCHAR)),
                    1, 15))::BIGINT % (L - cut1) END AS cut2
        FROM c1
    )
    SELECT doc_id,
           CASE WHEN NOT tf THEN 'none'
                WHEN use_spm THEN 'spm' ELSE 'psm' END AS fim_mode,
           CASE WHEN NOT tf THEN text
                WHEN use_spm THEN
                    '<fim_suffix>'
                    || substr(text, CAST(cut2 + 1 AS INT), CAST(L - cut2 AS INT))
                    || '<fim_prefix>' || substr(text, 1, CAST(cut1 AS INT))
                    || '<fim_middle>'
                    || substr(text, CAST(cut1 + 1 AS INT), CAST(cut2 - cut1 AS INT))
                ELSE
                    '<fim_prefix>' || substr(text, 1, CAST(cut1 AS INT))
                    || '<fim_suffix>'
                    || substr(text, CAST(cut2 + 1 AS INT), CAST(L - cut2 AS INT))
                    || '<fim_middle>'
                    || substr(text, CAST(cut1 + 1 AS INT), CAST(cut2 - cut1 AS INT))
           END AS fim_text
    FROM c2 ORDER BY doc_id
"""


@query("pipe_fim_transform", oracle=_FIM_ORACLE)
def pipe_fim_transform(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.sampling import fim_transform

    docs = (
        load_table(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    return (
        fim_transform(docs)
        .select("doc_id", "fim_mode", "fim_text")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Length-bucketed batching report (operators/sampling.length_batches):
# within each hash shard, docs sort by length and chunk into fixed-size
# batches — the collator-padding minimization every trainer wants. The
# whole report is integer arithmetic (count/max/sum/padding), so the
# oracle is a direct window-mirror.
# --------------------------------------------------------------------------
_LB_SIZE = 16


@query(
    "pipe_length_batches",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, n_chars, {_H} % {_N_SHARDS} AS shard FROM documents
    ),
    b AS (
        SELECT shard, n_chars,
               (row_number() OVER (
                   PARTITION BY shard ORDER BY n_chars DESC, doc_id
               ) - 1) // {_LB_SIZE} AS batch_id
        FROM s
    )
    SELECT shard, CAST(batch_id AS BIGINT) AS batch_id,
           count(*) AS n_rows,
           CAST(max(n_chars) AS BIGINT) AS max_len,
           CAST(sum(n_chars) AS BIGINT) AS sum_len,
           count(*) * CAST(max(n_chars) AS BIGINT)
               - CAST(sum(n_chars) AS BIGINT) AS padding
    FROM b GROUP BY shard, batch_id ORDER BY shard, batch_id
    """,
)
def pipe_length_batches(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.sampling import assign_shards, length_batches

    docs = load_table(spark, sf, "documents")
    sharded = assign_shards(docs, _N_SHARDS)
    return length_batches(sharded, _LB_SIZE).orderBy("shard", "batch_id")


# --------------------------------------------------------------------------
# Curriculum ordering (operators/sampling.dense_positions): dense global
# rank by (quality proxy, id) via the two-pass range rank — no
# single-partition window anywhere. Oracle is the direct global
# row_number.
# --------------------------------------------------------------------------
@query(
    "pipe_curriculum_order",
    oracle="""
    SELECT doc_id,
           row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS position
    FROM documents ORDER BY doc_id
    """,
)
def pipe_curriculum_order(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.sampling import dense_positions

    docs = load_table(spark, sf, "documents")
    return (
        dense_positions(docs, "n_chars", num_buckets=16)
        .select("doc_id", "position")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Preference (chosen/rejected) pair prep (operators/chat.py
# build_preference_pairs): within each source, quality-rank the documents
# and pair i-th best with i-th worst — the DPO-style dataset assembly.
# Quality is the shared deterministic heuristic (text_quality's recipe),
# so the whole path carries a value-hash oracle.
# --------------------------------------------------------------------------
def _pref_pairs_oracle() -> str:
    from momyre_spark.plans.text_queries import _TOK, _hits

    return f"""
    WITH m AS (
        SELECT doc_id, source,
               CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOK}) END AS n,
               {_hits("en")} AS hits,
               length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha,
               length(regexp_replace(text, '\\s', '', 'g')) AS total
        FROM documents
    ),
    sc AS (
        SELECT doc_id, source,
               floor((0.3 * (CASE WHEN n = 0 THEN 0.0 ELSE hits / CAST(n AS DOUBLE) END)
                    + 0.5 * (CASE WHEN total = 0 THEN 0.0 ELSE alpha / CAST(total AS DOUBLE) END)
                    + 0.2 * (least(CAST(n AS DOUBLE), 200.0) / 200.0)) * 10000 + 0.5)
                   / 10000.0 AS q
        FROM m
    ),
    r AS (
        SELECT *,
               row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id ASC) AS rd,
               row_number() OVER (PARTITION BY source ORDER BY q ASC, doc_id DESC) AS ra,
               count(*) OVER (PARTITION BY source) AS nn
        FROM sc
    ),
    c AS (SELECT source, CAST(rd AS BIGINT) AS pair_idx, doc_id AS chosen_id,
                 q AS chosen_score
          FROM r WHERE rd <= nn // 2),
    x AS (SELECT source, CAST(ra AS BIGINT) AS pair_idx, doc_id AS rejected_id,
                 q AS rejected_score
          FROM r WHERE ra <= nn // 2)
    SELECT c.source AS source, c.pair_idx AS pair_idx, chosen_id, rejected_id,
           chosen_score, rejected_score,
           floor((chosen_score - rejected_score) * 10000 + 0.5) / 10000.0 AS margin
    FROM c JOIN x ON c.source = x.source AND c.pair_idx = x.pair_idx
    WHERE floor((chosen_score - rejected_score) * 10000 + 0.5) / 10000.0 > 0
    ORDER BY c.source, c.pair_idx
    """


@query("pipe_preference_pairs", oracle=_pref_pairs_oracle())
def pipe_preference_pairs(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions.text import quality_score
    from momyre_spark.operators.chat import build_preference_pairs

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "source", quality_score(F.col("text")).alias("q")
    )
    return build_preference_pairs(
        docs, ["source"], "q", id_col="doc_id"
    ).orderBy("source", "pair_idx")


# --------------------------------------------------------------------------
# Split-integrity audit (operators/sampling.split_leakage_report): how many
# same-content groups straddle the train/val boundary under a doc-id hash
# split, vs ZERO under a group-key hash split — the side-by-side that
# motivates leakage-safe splitting. The group key is a cheap near-dup
# blocking key (md5 of the first-8-token prefix) rather than the full
# exact fingerprint, because this fixture has no byte-identical dups but
# DOES have shared-prefix clusters — the realistic leak shape. Full SQL
# oracle.
# --------------------------------------------------------------------------
_LEAK_FRAC = 0.2
_LEAK_CUT = int(_LEAK_FRAC * _VAL_RES)
_FP_SQL = ("md5(array_to_string("
           "(string_split_regex(trim(lower(text)), '\\s+'))[1:8], ' '))")


def _leak_split(key_expr: str) -> str:
    return (f"CASE WHEN CAST(('0x' || substr(md5({key_expr}), 1, 15)) AS BIGINT)"
            f" % {_VAL_RES} < {_LEAK_CUT} THEN 'val' ELSE 'train' END")


def _leak_report(tag: str, split_col: str) -> str:
    return f"""
        SELECT '{tag}' AS strategy,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky_groups,
               CAST(sum(CASE WHEN ns > 1 THEN nd ELSE 0 END) AS BIGINT) AS n_leaky_docs,
               floor(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE) * 10000 + 0.5) / 10000.0 AS leak_frac
        FROM (SELECT fp, count(DISTINCT {split_col}) AS ns, count(*) AS nd
              FROM s GROUP BY fp) g
    """


@query(
    "pipe_split_leakage",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_FP_SQL} AS fp FROM documents),
    s AS (
        SELECT *,
               {_leak_split("CAST(doc_id AS VARCHAR)")} AS split_doc,
               {_leak_split("fp")} AS split_grp
        FROM d
    )
    SELECT * FROM ({_leak_report("by_doc", "split_doc")}) a
    UNION ALL
    SELECT * FROM ({_leak_report("by_group", "split_grp")}) b
    ORDER BY strategy
    """,
)
def pipe_split_leakage(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.sampling import (
        split_leakage_report,
        train_val_split,
    )

    from momyre_spark.functions.text import tokens

    docs = load_table(spark, sf, "documents").select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.slice(tokens(F.lower(F.col("text"))), 1, 8))
        ).alias("fp"),
    )
    by_doc = train_val_split(docs, _LEAK_FRAC, id_col="doc_id")
    by_grp = train_val_split(docs, _LEAK_FRAC, id_col="fp")
    r1 = split_leakage_report(by_doc, "fp").select(
        F.lit("by_doc").alias("strategy"), "*"
    )
    r2 = split_leakage_report(by_grp, "fp").select(
        F.lit("by_group").alias("strategy"), "*"
    )
    return r1.unionByName(r2).orderBy("strategy")


# --------------------------------------------------------------------------
# Signed feature hashing (operators/features.feature_hash): the stateless
# fastText-style featurizer — bucket/sign from the engine-neutral md5
# recipe, ONE explode + one map-side-combinable hash agg, sparse
# (doc, bucket, weight) rows, exact-cancellation buckets dropped. Every
# bucket id and weight value-hashes against the identical DuckDB
# arithmetic. Restricted to doc_id % 5 = 0 to keep the oracle-side
# explode proportionate; the operator itself takes the full frame.
# --------------------------------------------------------------------------
_FH_BUCKETS = 256

@query(
    "pipe_feature_hash",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
        FROM documents WHERE doc_id % 5 = 0
    )
    SELECT doc_id,
           (('0x' || substr(md5(t), 1, 15))::BIGINT % {_FH_BUCKETS}) AS bucket,
           CAST(SUM(CASE WHEN substr(md5(t), 16, 1) <= '7'
                         THEN 1 ELSE -1 END) AS BIGINT) AS weight
    FROM tok
    GROUP BY doc_id, bucket
    HAVING SUM(CASE WHEN substr(md5(t), 16, 1) <= '7' THEN 1 ELSE -1 END) <> 0
    ORDER BY doc_id, bucket
    """,
)
def pipe_feature_hash(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.features import feature_hash

    docs = load_table(spark, sf, "documents").filter(
        F.col("doc_id") % 5 == 0
    )
    return feature_hash(docs, n_buckets=_FH_BUCKETS).orderBy(
        "doc_id", "bucket"
    )


# --------------------------------------------------------------------------
# Annotation QA (operators/annotate.py): majority vote + Fleiss kappa
# over a synthetic 300-item x 5-rater table (engine-neutral md5-prefix
# noise at ~30% over a planted item%3 ground truth). Vote counts are
# exact integers; every reported fraction is a division of exactly-
# converted integers (kappa's three divisions mirrored literally), so
# both queries carry full value-hash oracles.
# --------------------------------------------------------------------------
_ANN_ITEMS = 300
_ANN_RATERS = 5

_ANN_SQL_SPARK = f"""
    SELECT id DIV {_ANN_RATERS} AS item,
           CASE WHEN pmod(CAST(conv(substr(md5(concat('n',
                    CAST(id DIV {_ANN_RATERS} AS STRING), '_',
                    CAST(pmod(id, {_ANN_RATERS}) AS STRING))), 1, 15),
                    16, 10) AS BIGINT), 10) < 3
                THEN pmod(CAST(conv(substr(md5(concat('l',
                    CAST(id DIV {_ANN_RATERS} AS STRING), '_',
                    CAST(pmod(id, {_ANN_RATERS}) AS STRING))), 1, 15),
                    16, 10) AS BIGINT), 3)
                ELSE pmod(id DIV {_ANN_RATERS}, 3) END AS label
    FROM range({_ANN_ITEMS * _ANN_RATERS})
"""

_ANN_SQL_DUCK = f"""
    ann AS (
        SELECT (i // {_ANN_RATERS}) AS item,
               CASE WHEN (('0x' || substr(md5('n'
                        || CAST((i // {_ANN_RATERS}) AS VARCHAR) || '_'
                        || CAST((i % {_ANN_RATERS}) AS VARCHAR)), 1, 15)
                        )::BIGINT % 10) < 3
                    THEN (('0x' || substr(md5('l'
                        || CAST((i // {_ANN_RATERS}) AS VARCHAR) || '_'
                        || CAST((i % {_ANN_RATERS}) AS VARCHAR)), 1, 15)
                        )::BIGINT % 3)
                    ELSE (i // {_ANN_RATERS}) % 3 END AS label
        FROM range({_ANN_ITEMS * _ANN_RATERS}) t(i)
    )
"""


def _annotations(spark: SparkSession) -> DataFrame:
    return spark.sql(_ANN_SQL_SPARK)


@query(
    "pipe_label_agreement",
    oracle=f"""
    WITH {_ANN_SQL_DUCK},
    c AS (SELECT item, label, COUNT(*) AS c FROM ann GROUP BY 1, 2),
    w AS (
        SELECT item, label, c,
               CAST(SUM(c) OVER (PARTITION BY item)
                    AS BIGINT) AS n_votes,
               SUM(c * c) OVER (PARTITION BY item) AS s,
               ROW_NUMBER() OVER (PARTITION BY item
                                  ORDER BY c DESC, label ASC) AS rn
        FROM c)
    SELECT item, n_votes, label AS majority_label, c AS majority_votes,
           CASE WHEN n_votes >= 2 THEN
               floor(((CAST(s AS DOUBLE) - CAST(n_votes AS DOUBLE))
                      / (CAST(n_votes AS DOUBLE)
                         * (CAST(n_votes AS DOUBLE) - 1.0)))
                     * 1000000 + 0.5) / 1000000.0 END AS agreement
    FROM w WHERE rn = 1 ORDER BY item
""",
)
def pipe_label_agreement(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.annotate import majority_labels

    return majority_labels(_annotations(spark), "item", "label").orderBy(
        "item"
    )


@query(
    "pipe_fleiss_kappa",
    oracle=f"""
    WITH {_ANN_SQL_DUCK},
    c AS (SELECT item, label, COUNT(*) AS c FROM ann GROUP BY 1, 2),
    it AS (SELECT item, SUM(c) AS n, SUM(c * c) AS s FROM c GROUP BY 1),
    itot AS (SELECT COUNT(*) AS i, SUM(s) AS ss,
                  CAST(MIN(n) AS BIGINT) AS nr FROM it),
    lt AS (SELECT label, SUM(c) AS cj FROM c GROUP BY 1),
    ltot AS (SELECT SUM(cj * cj) AS sc FROM lt)
    SELECT i AS n_items, nr AS n_raters,
           floor((CAST(ss - i * nr AS DOUBLE)
                  / CAST((i * nr) * (nr - 1) AS DOUBLE))
                 * 1000000 + 0.5) / 1000000.0 AS p_bar,
           floor((CAST(sc AS DOUBLE)
                  / CAST((i * nr) * (i * nr) AS DOUBLE))
                 * 1000000 + 0.5) / 1000000.0 AS p_e,
           floor((((CAST(ss - i * nr AS DOUBLE)
                    / CAST((i * nr) * (nr - 1) AS DOUBLE))
                   - (CAST(sc AS DOUBLE)
                      / CAST((i * nr) * (i * nr) AS DOUBLE)))
                  / (1.0 - (CAST(sc AS DOUBLE)
                            / CAST((i * nr) * (i * nr) AS DOUBLE))))
                 * 1000000 + 0.5) / 1000000.0 AS kappa
    FROM itot, ltot
""",
)
def pipe_fleiss_kappa(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.annotate import fleiss_kappa

    return fleiss_kappa(_annotations(spark), "item", "label")


# --------------------------------------------------------------------------
# Cross-source score calibration (operators/sampling.calibrate_scores):
# per-source percent-rank + ntile decile of n_chars — one global quality
# threshold means the same quantile in every source. percent_rank is one
# exact-integer division; ntile is deterministic under the doc_id
# tiebreak; ONE window shuffle keyed on source.
# --------------------------------------------------------------------------
@query(
    "pipe_score_calibrate",
    oracle="""
    SELECT doc_id, source, n_chars,
           floor(percent_rank() OVER (PARTITION BY source ORDER BY n_chars)
                 * 1000000 + 0.5) / 1000000.0 AS calibrated,
           CAST(ntile(10) OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id)
                AS INTEGER) AS calibrated_bucket
    FROM documents WHERE n_chars IS NOT NULL
    ORDER BY doc_id
""",
)
def pipe_score_calibrate(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.sampling import calibrate_scores

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return calibrate_scores(
        docs, ["source"], "n_chars", ["doc_id"], buckets=10
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Packing-efficiency report (operators/sampling.packing_efficiency):
# per-bin utilization over the pipe_pack_sequences assignment — the
# padding-waste readout a pretraining run watches. Reuses the packing
# CTE; one extra hash agg on the bin id. fill_ratio may exceed 1 by
# design (concat-and-chunk spill; the raw sum keeps conservation
# checkable: sum(n_tokens) over bins == corpus total).
#
# Registered round 9 (staged round 8). Pre-validated by the staged-queue
# mirror and tests/test_sampling_ops.py.
# --------------------------------------------------------------------------
_PACK_EFF_ORACLE = f"""
    WITH t AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS n
        FROM documents
    ),
    c AS (
        SELECT doc_id, n,
               sum(n) OVER (ORDER BY {_H}, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    ),
    b AS (
        SELECT CAST(floor((cum - n) / {_PACK_BUDGET}) AS BIGINT) AS bin,
               n, n > {_PACK_BUDGET} AS overflow
        FROM c
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN overflow THEN 1 ELSE 0 END) AS BIGINT)
               AS overflow_docs,
           floor((CAST(sum(n) AS DOUBLE) / {_PACK_BUDGET}.0)
                 * 1000000 + 0.5) / 1000000.0 AS fill_ratio
    FROM b GROUP BY bin ORDER BY bin
"""


@query("pipe_packing_efficiency", oracle=_PACK_EFF_ORACLE)
def pipe_packing_efficiency(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions.text import token_count
    from momyre_spark.operators.sampling import packing_efficiency

    docs = load_table(spark, sf, "documents").withColumn(
        "n_tokens", token_count(F.col("text"))
    )
    return packing_efficiency(docs, _PACK_BUDGET).orderBy("bin")


# --------------------------------------------------------------------------
# Cluster-weighted sampling (operators/sampling.cluster_weighted_sample):
# keep each row with probability 1/n_copies of its duplicate cluster —
# equal expected mass per distinct content, the soft de-biasing
# alternative to hard dedup. Clustered on the order-insensitive
# bag-of-words fingerprint (key='bow': the fixture corpus has shuffled
# re-hostings but no byte-exact dups, so 'bow' makes the verdict column
# non-trivial — 54 dup rows across 446 clusters at sf0.01). md5-derived
# uniforms (the _SEM_LO recipe), corpus-sized verdict output, fully
# hash-oracled.
#
# Registered round 9 (staged round 8). Pre-validated by the staged-queue
# mirror and tests/test_sampling_ops.py.
# --------------------------------------------------------------------------
_CLUSTER_SAMPLE_ORACLE = r"""
    WITH k AS (
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(
                   string_split_regex(trim(lower(text)), '\s+'))), ' '))
                   AS content_key,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) / 1152921504606846976.0 AS u
        FROM documents
    ),
    c AS (
        SELECT *, CAST(count(*) OVER (PARTITION BY content_key) AS BIGINT)
                      AS n_copies
        FROM k
    )
    SELECT doc_id, content_key, n_copies, u,
           u * CAST(n_copies AS DOUBLE) < 1.0 AS kept
    FROM c ORDER BY doc_id
"""


@query("pipe_cluster_weighted_sample", oracle=_CLUSTER_SAMPLE_ORACLE)
def pipe_cluster_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.sampling import cluster_weighted_sample

    docs = load_table(spark, sf, "documents")
    return cluster_weighted_sample(docs, key="bow").orderBy("doc_id")
