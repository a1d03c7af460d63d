"""CDC apply semantics, re-expressed order-insensitively for Spark.

The reference applies its ops log strictly sequentially — one goroutine, one
MySQL transaction per oplog entry (``/root/reference/app/run.go:301-322``,
``mysql.go:292-355``). That gives correctness via total order but caps
throughput at 1. The Spark-native equivalent reduces a batch of ops to the
*final state per key* before writing, which is order-insensitive within the
batch and therefore embarrassingly parallel: one shuffle by ``_id``, then a
single aggregate — no sequential anything.

Semantics preserved from the reference (SURVEY.md §2.3/§2.7):
- ``insert`` replaces the whole row (mysql.go:376-431 appendRow / upsert);
- ``update`` merges only the fields present in the op's payload; untouched
  fields survive (mysql.go:449-476 updateRow builds SET only from present
  fields); a field explicitly set to JSON ``null`` becomes NULL (distinct
  from "absent");
- ``delete`` removes the key (mysql.go:507-534 deleteRow);
- updates/deletes targeting a key whose latest reset is a delete (or that was
  never inserted) are no-ops — exactly like an UPDATE/DELETE matching 0 rows
  in MySQL;
- replay idempotence: re-applying any suffix of the log yields the same final
  state (run.go:210-212 relies on the same property).

Algorithm (all JVM-side built-ins — no UDFs, no driver collect):
1. per key, find the latest *reset* op (insert or delete) by sequence;
2. keys whose latest reset is an insert are alive (keys never inserted die);
3. for each alive key, each field's final value comes from the latest op at
   or after the reset whose payload *mentions* that field
   (``max_by(payload[f], seq if map_contains_key(payload, f))``);
4. cast to the declared sink type (SURVEY.md §1.2 type mapping).

Cost model at 100 TB: one hash-partition by ``_id`` feeding two hash
aggregates that Catalyst executes with map-side partial aggregation; payload
maps stay columnar; no window sort is needed (max_by replaces
row_number-then-filter for the merge path).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

INSERT, UPDATE, DELETE = "insert", "update", "delete"


def latest_state_per_key(
    df: DataFrame, key: str | Sequence[str], order: Sequence[str]
) -> DataFrame:
    """Last-writer-wins row per key (reference K1 collapsed per batch).

    ``order`` must be a deterministic total order within each key (e.g.
    ``["ts", "event_id"]`` — the reference's resume token ``T<<32|I`` is the
    same idea, mongo.go:171).
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _seq(order: Sequence[str]) -> Column:
    cols = [F.col(c) for c in order]
    return cols[0] if len(cols) == 1 else F.struct(*cols)


def apply_ops(
    ops: DataFrame,
    fields: dict[str, str],
    key: str = "_id",
    op_col: str = "op",
    payload_col: str = "payload",
    order: Sequence[str] = ("ts",),
) -> DataFrame:
    """Reduce an ops log to the final table state.

    Parameters
    ----------
    ops
        DataFrame with columns ``key``, ``op_col`` (insert/update/delete),
        ``payload_col`` and the ``order`` columns. ``payload_col`` is either a
        ``map<string,string>`` column or a JSON-text column (parsed here —
        a JSON ``null`` value keeps its key in the map, preserving the
        "set to null" vs "absent" distinction).
    fields
        Declared sink columns: name -> Spark SQL type string (the engine's
        analog of the reference's YAML column map, momyre.yml:3-15).
    """
    payload_t = dict(ops.dtypes).get(payload_col, "string")
    if payload_t == "string":
        ops = ops.withColumn(payload_col, F.from_json(payload_col, "map<string,string>"))

    seq = _seq(order)
    ops = ops.withColumn("__seq", seq)

    # (1)+(2): latest reset per key; alive iff it is an insert.
    resets = (
        ops.filter(F.col(op_col).isin(INSERT, DELETE))
        .groupBy(key)
        .agg(
            F.max("__seq").alias("__reset_seq"),
            F.max_by(op_col, "__seq").alias("__reset_op"),
        )
        .filter(F.col("__reset_op") == INSERT)
        .select(key, "__reset_seq")
    )

    # (3): ops contributing to the final row = the reset insert itself plus
    # every later update. Join is co-partitioned with the following groupBy
    # on the same key, so Spark reuses one exchange.
    relevant = (
        ops.join(resets, key)
        .filter(
            (F.col("__seq") >= F.col("__reset_seq")) & (F.col(op_col) != DELETE)
        )
    )

    merge_aggs = [
        F.max_by(
            F.element_at(F.col(payload_col), F.lit(f)),
            F.when(F.map_contains_key(F.col(payload_col), F.lit(f)), F.col("__seq")),
        )
        .cast(t)
        .alias(f)
        for f, t in fields.items()
    ]
    return relevant.groupBy(key).agg(*merge_aggs)


def merge_ops_microbatch(
    ops: DataFrame,
    fields: dict[str, str],
    key: str = "_id",
    op_col: str = "op",
    payload_col: str = "payload",
    order: Sequence[str] = ("ts",),
) -> DataFrame:
    """Reduce one *microbatch* of ops to per-key apply actions.

    Unlike :func:`apply_ops` (which assumes it sees the whole log), a
    microbatch may contain only partial history for a key — an update to a
    row whose insert happened in an earlier batch must become a *partial
    patch*, not a full row. Per key, the batch collapses to ONE action:

    - ``__action='upsert'``: batch contains an insert as its latest reset —
      the merged row is authoritative (absent fields -> NULL), write whole row;
    - ``__action='delete'``: latest reset is a delete with no later insert;
    - ``__action='patch'`` : updates only — merged changed fields, with
      ``__present`` listing which fields the patch actually sets (so the
      sink updates only those columns, reference K4 mysql.go:449-476).

    Output columns: key, __action, __present (array<string>), then one typed
    column per declared field. One shuffle by key; order-insensitive;
    replay-idempotent (same batch -> same actions).
    """
    payload_t = dict(ops.dtypes).get(payload_col, "string")
    if payload_t == "string":
        ops = ops.withColumn(payload_col, F.from_json(payload_col, "map<string,string>"))
    ops = ops.withColumn("__seq", _seq(order))

    resets = (
        ops.filter(F.col(op_col).isin(INSERT, DELETE))
        .groupBy(key)
        .agg(
            F.max("__seq").alias("__reset_seq"),
            F.max_by(op_col, "__seq").alias("__reset_op"),
        )
    )
    enriched = ops.join(resets, key, "left")

    # Ops contributing to the final value of each field: for insert-reset
    # keys, the insert + later updates; for update-only keys, all updates.
    # Keys whose latest reset is a delete contribute NOTHING — updates after
    # a delete are no-ops (an UPDATE matching 0 rows in the reference), the
    # key only gets its delete action.
    contributing = enriched.filter(
        (F.col(op_col) != DELETE)
        & (
            F.col("__reset_seq").isNull()
            | (
                (F.col("__seq") >= F.col("__reset_seq"))
                & (F.col("__reset_op") == INSERT)
            )
        )
    )

    field_aggs = []
    for f, t in fields.items():
        mentioned = F.map_contains_key(F.col(payload_col), F.lit(f))
        field_aggs.append(
            F.max_by(
                F.element_at(F.col(payload_col), F.lit(f)),
                F.when(mentioned, F.col("__seq")),
            )
            .cast(t)
            .alias(f)
        )
        field_aggs.append(F.max(mentioned).alias(f"__has_{f}"))
    merged = contributing.groupBy(key).agg(
        F.max(F.col("__reset_op") == INSERT).alias("__is_insert"), *field_aggs
    )

    deletes = resets.filter(F.col("__reset_op") == DELETE).select(
        key,
        F.lit(DELETE).alias("__action"),
        F.array().cast("array<string>").alias("__present"),
        *[F.lit(None).cast(t).alias(f) for f, t in fields.items()],
    )

    present = F.filter(
        F.array(
            *[
                F.when(F.col(f"__has_{f}"), F.lit(f)).otherwise(F.lit(None))
                for f in fields
            ]
        ),
        lambda x: x.isNotNull(),
    )
    actions = merged.select(
        key,
        F.when(F.col("__is_insert"), F.lit("upsert")).otherwise(F.lit("patch")).alias(
            "__action"
        ),
        present.alias("__present"),
        *[F.col(f) for f in fields],
    )
    return actions.unionByName(deletes)
