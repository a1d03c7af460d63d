"""Conversation (SFT/chat) data preparation: explode JSON transcripts into
typed turn rows and aggregate per-conversation statistics.

Instruction-tuning corpora arrive as one JSON transcript per row
(``[{"role": "user", "content": ...}, {"role": "assistant", ...}, ...]``).
The Spark-first shape: ``from_json`` parses each transcript ONCE into an
``array<struct<role,content>>`` (binary rows, not text), ``posexplode``
fans out to one row per turn, and everything downstream (token counts,
role filters, pair assembly) is plain codegen'd expressions. No Python in
the pipeline; cost is one parse + one generate per document — the explode
is map-only, so a 100 TB transcript corpus never shuffles until an
aggregate asks it to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TURN_SCHEMA = "array<struct<role:string,content:string>>"


def chat_turns(
    df: DataFrame, json_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """One row per conversation turn: ``(id, turn_idx, role, content)``.

    Malformed JSON parses to NULL and yields zero turns (from_json's
    PERMISSIVE contract) — a gate can count them via ``chat_stats``'s
    ``n_turns = 0``. Map-only."""
    parsed = F.from_json(F.col(json_col), TURN_SCHEMA)
    return df.select(
        F.col(id_col), F.posexplode(parsed).alias("turn_idx", "__t")
    ).select(
        id_col,
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.col("__t.role").alias("role"),
        F.col("__t.content").alias("content"),
    )


def chat_stats(
    df: DataFrame, json_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Per-conversation gate features, computed WITHOUT an explode+shuffle:
    higher-order functions aggregate the parsed array in place (map-only),
    emitting ``(id, n_turns, n_user, n_assistant, alternates,
    assistant_tokens)``.

    ``alternates`` is the SFT sanity gate: roles strictly alternate and the
    first speaker is the user. ``assistant_tokens`` counts whitespace
    tokens over assistant turns only — the tokens a trainer would actually
    compute loss on."""
    parsed = F.from_json(F.col(json_col), TURN_SCHEMA)
    n_turns = F.size(parsed)
    n_user = F.size(F.filter(parsed, lambda t: t["role"] == "user"))
    n_assistant = F.size(F.filter(parsed, lambda t: t["role"] == "assistant"))
    alternates = F.coalesce(
        F.forall(
            F.zip_with(
                parsed,
                F.sequence(F.lit(0), n_turns - 1),
                lambda t, i: t["role"]
                == F.when(i % 2 == 0, F.lit("user")).otherwise(
                    F.lit("assistant")
                ),
            ),
            lambda ok: ok,
        )
        & (n_turns > 0),
        F.lit(False),
    )
    # per-turn NULL guard: one assistant turn with missing content must
    # count as 0 tokens, not poison the whole sum to NULL (acc + NULL)
    assistant_tokens = F.aggregate(
        F.filter(parsed, lambda t: t["role"] == "assistant"),
        F.lit(0).cast("bigint"),
        lambda acc, t: acc
        + F.when(
            t["content"].isNull() | (F.trim(t["content"]) == ""), F.lit(0)
        ).otherwise(F.size(F.split(F.trim(t["content"]), r"\s+"))).cast(
            "bigint"
        ),
    )
    return df.select(
        F.col(id_col),
        F.coalesce(n_turns, F.lit(0)).cast("int").alias("n_turns"),
        F.coalesce(n_user, F.lit(0)).cast("int").alias("n_user"),
        F.coalesce(n_assistant, F.lit(0)).cast("int").alias("n_assistant"),
        alternates.alias("alternates"),
        F.coalesce(assistant_tokens, F.lit(0)).alias("assistant_tokens"),
    )


def chat_pairs(
    turns: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Assemble (prompt, response) training pairs from turn rows: each
    assistant turn pairs with the user turn immediately before it. One
    window shuffle on the conversation id."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("turn_idx")
    prev_role = F.lag("role").over(w)
    prev_content = F.lag("content").over(w)
    return (
        turns.withColumn("__pr", prev_role)
        .withColumn("__pc", prev_content)
        .filter((F.col("role") == "assistant") & (F.col("__pr") == "user"))
        .select(
            id_col,
            F.col("turn_idx").alias("response_idx"),
            F.col("__pc").alias("prompt"),
            F.col("content").alias("response"),
        )
    )


def build_preference_pairs(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    id_col: str = "doc_id",
    min_margin: float = 0.0,
) -> DataFrame:
    """Preference (chosen/rejected) pair assembly for DPO/RLHF-style
    training: within each group, rank candidates by score and pair the
    i-th best with the i-th worst (i <= floor(n/2)), so every pair has the
    widest margin available at its rank and no candidate appears twice.
    Pairs with margin <= ``min_margin`` are dropped — equal-score pairs
    teach nothing and their chosen/rejected assignment would be arbitrary.

    Shape: one shuffle by group for the two rank windows (same exchange,
    two sort orders), then a co-partitioned self-join on (group, pair_idx)
    — at corpus scale the join keys inherit the window partitioning. Ties
    break on id (desc on the ascending rank) so the pairing is total-order
    deterministic in any engine.

    Output: ``group_cols + (pair_idx, chosen_id, rejected_id,
    chosen_score, rejected_score, margin)``."""
    from momyre_spark.functions.numeric import round_half_up
    from pyspark.sql.window import Window

    gp = [F.col(c) for c in group_cols]
    wd = Window.partitionBy(*gp).orderBy(
        F.col("__s").desc(), F.col("__id").asc()
    )
    wa = Window.partitionBy(*gp).orderBy(
        F.col("__s").asc(), F.col("__id").desc()
    )
    # NULL scores are excluded up front: NULLS FIRST in the ascending
    # window would otherwise consume rejected slots and null out the
    # widest-margin pairs
    ranked = df.filter(F.col(score_col).isNotNull()).select(
        *group_cols,
        F.col(id_col).alias("__id"),
        F.col(score_col).alias("__s"),
    ).select(
        "*",
        F.row_number().over(wd).alias("__rd"),
        F.row_number().over(wa).alias("__ra"),
        F.count(F.lit(1)).over(Window.partitionBy(*gp)).alias("__n"),
    )
    half = F.floor(F.col("__n") / F.lit(2))
    chosen = ranked.filter(F.col("__rd") <= half).select(
        *group_cols,
        F.col("__rd").cast("bigint").alias("pair_idx"),
        F.col("__id").alias("chosen_id"),
        F.col("__s").alias("chosen_score"),
    )
    rejected = ranked.filter(F.col("__ra") <= half).select(
        *group_cols,
        F.col("__ra").cast("bigint").alias("pair_idx"),
        F.col("__id").alias("rejected_id"),
        F.col("__s").alias("rejected_score"),
    )
    return (
        chosen.join(rejected, [*group_cols, "pair_idx"])
        .withColumn(
            "margin",
            round_half_up(
                F.col("chosen_score") - F.col("rejected_score"), 4
            ),
        )
        .filter(F.col("margin") > F.lit(float(min_margin)))
    )


def chat_loss_mask(
    df: DataFrame,
    json_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Serialize each conversation to its training string and emit the
    character spans that receive loss — assistant turn CONTENTS only,
    never the role headers, user turns, or end sentinels (the standard
    SFT masking rule; a trainer multiplies token loss by membership in
    these spans after tokenizer offset-mapping). Output:
    ``(id_col, train_text, loss_spans)`` with ``loss_spans`` an array of
    ``(start, end)`` 0-based half-open char offsets into ``train_text``.

    Template per turn: ``<|role|>\\n`` + content + ``<|end|>\\n``.

    Shape: ONE ``aggregate`` higher-order fold over the parsed turn
    array — the serialized text and the span offsets accumulate in the
    same pass, entirely in codegen (no explode, no window, no Python),
    so the op fuses into the scan like chat_stats does. Malformed JSON
    parses to NULL and is dropped visibly; so is any conversation with
    a turn missing ``role`` or ``content`` (a NULL in either would
    otherwise NULL the whole concat fold and poison the spans).
    """
    parsed = F.from_json(F.col(json_col), TURN_SCHEMA)
    well_formed = F.forall(
        parsed,
        lambda x: x["role"].isNotNull() & x["content"].isNotNull(),
    )
    init = F.struct(
        F.lit("").alias("t"),
        F.expr(
            "CAST(array() AS array<struct<start:int,end:int>>)"
        ).alias("spans"),
    )

    def merge(acc, x):
        header = F.concat(F.lit("<|"), x["role"], F.lit("|>\n"))
        start = F.length(acc["t"]) + F.length(header)
        end = start + F.length(x["content"])
        newt = F.concat(
            acc["t"], header, x["content"], F.lit("<|end|>\n")
        )
        span = F.struct(
            start.cast("int").alias("start"), end.cast("int").alias("end")
        )
        newspans = F.when(
            x["role"] == F.lit("assistant"),
            F.array_append(acc["spans"], span),
        ).otherwise(acc["spans"])
        return F.struct(newt.alias("t"), newspans.alias("spans"))

    folded = F.aggregate(parsed, init, merge)
    return (
        df.filter(parsed.isNotNull() & well_formed)
        .select(
            id_col,
            folded["t"].alias("train_text"),
            folded["spans"].alias("loss_spans"),
        )
    )
