"""CDC-semantics queries over the ``events`` table (treated as an ops log).

These exercise the engine's CDC apply operator (operators/cdc.py) — the
Spark-native re-expression of the reference's sequential applier
(``/root/reference/app/run.go:301-322``, ``mysql.go:292-355``) — against a
SQL oracle, by interpreting events as an ops stream:

    signup -> insert, error -> delete, anything else -> partial update
    payload = props (JSON), sequence = (ts, event_id)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from momyre_spark.plans import query
from momyre_spark.sources.parquet import load_table


def _events_as_ops(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return ev.select(
        F.col("user_id").alias("_id"),
        "ts",
        "event_id",
        F.when(F.col("event_type") == "signup", F.lit("insert"))
        .when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("op"),
        F.col("props").alias("payload"),
    )


# --------------------------------------------------------------------------
# Full CDC apply: reset/merge/delete semantics (reference K1–K5 collapsed to
# final-state-per-key; see operators/cdc.py docstring)
# --------------------------------------------------------------------------
@query(
    "cdc_apply_ops",
    oracle="""
    WITH ops AS (
        SELECT user_id AS _id, CAST(ts AS TIMESTAMP) AS ts, event_id,
               CASE event_type WHEN 'signup' THEN 'insert'
                               WHEN 'error'  THEN 'delete'
                               ELSE 'update' END AS op,
               CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k
        FROM events
    ),
    resets AS (
        SELECT _id, op AS reset_op, ts AS reset_ts, event_id AS reset_eid
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY _id ORDER BY ts DESC, event_id DESC) AS rn
              FROM ops WHERE op IN ('insert','delete')) t
        WHERE rn = 1
    ),
    alive AS (SELECT * FROM resets WHERE reset_op = 'insert')
    SELECT o._id, CAST(o.k AS BIGINT) AS k
    FROM ops o JOIN alive a ON o._id = a._id
    WHERE o.op <> 'delete' AND (o.ts, o.event_id) >= (a.reset_ts, a.reset_eid)
    QUALIFY row_number() OVER (PARTITION BY o._id ORDER BY o.ts DESC, o.event_id DESC) = 1
    ORDER BY o._id
    """,
)
def cdc_apply_ops(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.cdc import apply_ops

    ops = _events_as_ops(spark, sf)
    return (
        apply_ops(ops, fields={"k": "bigint"}, order=("ts", "event_id"))
        .orderBy("_id")
    )


# --------------------------------------------------------------------------
# JSON field extraction + latest-wins (reference C2 updatedFields decode +
# K4 partial update, single-field shape)
# --------------------------------------------------------------------------
@query(
    "cdc_json_field_latest",
    oracle="""
    SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM (SELECT *, row_number() OVER (
              PARTITION BY user_id
              ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
          FROM events) t
    WHERE rn = 1 ORDER BY user_id
    """,
)
def cdc_json_field_latest(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.cdc import latest_state_per_key

    ev = load_table(spark, sf, "events")
    return (
        latest_state_per_key(ev, key="user_id", order=["ts", "event_id"])
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Flatten projection (reference P1/P2: obj2plain mongo.go:141-155 +
# col4sql mysql.go:54-56): parse props into a struct, flatten to `props_k`
# --------------------------------------------------------------------------
@query(
    "cdc_flatten_project",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS props_k,
           event_type
    FROM events ORDER BY event_id
    """,
)
def cdc_flatten_project(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.spec import flatten

    ev = load_table(spark, sf, "events").select(
        "event_id",
        F.from_json("props", "struct<k:bigint>").alias("props"),
        "event_type",
    )
    return flatten(ev).orderBy("event_id")


# --------------------------------------------------------------------------
# As-of join (operators/asof.py): each purchase matched to the user's latest
# click at-or-before it. Oracle = DuckDB's native ASOF LEFT JOIN.
# --------------------------------------------------------------------------
@query(
    "asof_join_purchase_click",
    oracle="""
    WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
          FROM events WHERE event_type = 'click')
    SELECT p.event_id, CAST(c.ts AS VARCHAR) AS click_ts, c.value AS click_value
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
    ORDER BY p.event_id
    """,
)
def asof_join_purchase_click(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.asof import asof_join

    ev = load_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    return (
        asof_join(purchases, clicks, on="user_id", right_cols=["ts", "value"],
                  suffix="_click")
        .select(
            "event_id",
            F.col("ts_click").cast("string").alias("click_ts"),
            F.col("value_click").alias("click_value"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Range join: lineitems shipped within 30 days of their order date
# (equi key + time-range condition)
# --------------------------------------------------------------------------
@query(
    "range_join_ship_lag",
    oracle="""
    SELECT o.o_orderkey, count(*) AS fast_lines
    FROM orders o JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
    GROUP BY o.o_orderkey ORDER BY o.o_orderkey
    """,
)
def range_join_ship_lag(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    l = load_table(spark, sf, "lineitem")
    return (
        o.join(
            l,
            (l.l_orderkey == o.o_orderkey)
            & (l.l_shipdate >= o.o_orderdate)
            & (l.l_shipdate < F.date_add(o.o_orderdate.cast("date"), 30).cast("timestamp")),
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("fast_lines"))
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Synthetic CDC merge at scale: 1M ops over 50k keys generated from pure
# modular arithmetic (engine-neutral, so the full merge is oracle-checkable
# at any size). The headline CDC-throughput benchmark.
# --------------------------------------------------------------------------
_N_SYN = 1_000_000
_K_SYN = 50_000

_SYN_ORACLE = f"""
    WITH seq AS (SELECT i FROM generate_series(0, {_N_SYN - 1}) t(i)),
    ops AS (
        SELECT i AS ts, 'k' || CAST(i % {_K_SYN} AS VARCHAR) AS _id,
               CASE WHEN i % 11 = 0 THEN 'delete'
                    WHEN i % 3 = 0 THEN 'insert'
                    ELSE 'update' END AS op,
               i
        FROM seq
    ),
    resets AS (
        SELECT _id, max(ts) AS rts
        FROM ops WHERE op IN ('insert', 'delete') GROUP BY _id
    ),
    alive AS (
        SELECT o._id, r.rts FROM ops o JOIN resets r
          ON o._id = r._id AND o.ts = r.rts AND o.op = 'insert'
    ),
    merged AS (
        SELECT o._id,
               max(CASE WHEN o.op = 'insert' OR o.i % 2 = 0 THEN o.ts END) AS ta,
               max(CASE WHEN o.op = 'insert' OR o.i % 2 = 1 THEN o.ts END) AS tb
        FROM ops o JOIN alive a ON o._id = a._id
        WHERE o.ts >= a.rts AND o.op <> 'delete'
        GROUP BY o._id
    )
    SELECT _id, CAST(ta % 97 AS BIGINT) AS a, CAST(tb % 13 AS BIGINT) AS b
    FROM merged ORDER BY _id
"""


@query("cdc_apply_synthetic_1m", oracle=_SYN_ORACLE)
def cdc_apply_synthetic_1m(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.cdc import apply_ops

    i = F.col("id")
    op = (
        F.when(i % 11 == 0, F.lit("delete"))
        .when(i % 3 == 0, F.lit("insert"))
        .otherwise(F.lit("update"))
    )
    payload = (
        F.when(
            op == "insert",
            F.concat(F.lit('{"a":'), (i % 97).cast("string"),
                     F.lit(',"b":'), (i % 13).cast("string"), F.lit("}")),
        )
        .when(op == "delete", F.lit("{}"))
        .when(i % 2 == 0,
              F.concat(F.lit('{"a":'), (i % 97).cast("string"), F.lit("}")))
        .otherwise(
            F.concat(F.lit('{"b":'), (i % 13).cast("string"), F.lit("}")))
    )
    ops = spark.range(_N_SYN).select(
        i.alias("ts"),
        F.concat(F.lit("k"), (i % _K_SYN).cast("string")).alias("_id"),
        op.alias("op"),
        payload.alias("payload"),
    )
    return (
        apply_ops(ops, {"a": "bigint", "b": "bigint"}, key="_id", order=("ts",))
        .orderBy("_id")
    )


# --------------------------------------------------------------------------
# As-of join with a freshness bound: a click older than 1 hour before the
# purchase is NO match (pandas merge_asof's `tolerance`). Oracle: native
# ASOF LEFT JOIN with the staleness CASE applied on top.
# --------------------------------------------------------------------------
@query(
    "asof_join_tolerance",
    oracle="""
    WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
          FROM events WHERE event_type = 'click')
    SELECT p.event_id,
           CASE WHEN c.ts IS NOT NULL AND p.ts - c.ts <= INTERVAL '1 hour'
                THEN CAST(c.ts AS VARCHAR) END AS click_ts,
           CASE WHEN c.ts IS NOT NULL AND p.ts - c.ts <= INTERVAL '1 hour'
                THEN c.value END AS click_value
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
    ORDER BY p.event_id
    """,
)
def asof_join_tolerance(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.asof import asof_join

    ev = load_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    return (
        asof_join(purchases, clicks, on="user_id",
                  right_cols=["ts", "value"], suffix="_click",
                  tolerance=3600.0)
        .select(
            "event_id",
            F.col("ts_click").cast("string").alias("click_ts"),
            F.col("value_click").alias("click_value"),
        )
        .orderBy("event_id")
    )
