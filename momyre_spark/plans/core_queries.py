"""Declared correctness queries Q1–Q16 (SURVEY.md §2.10).

Q1–Q7 are direct encodings of reference operators (snapshot projection,
IN-list/range filters, timestamp probe, point lookup, orphan anti-join,
last-writer-wins CDC merge); Q8–Q16 cover the analytics surface the north
star mandates (joins, aggregations, distinct, top-k, set ops, scalar
functions, windows).

Cross-engine determinism rules used throughout (Spark must value-hash-match
DuckDB on identical parquet):

- every floating-point SUM goes through ``DECIMAL`` *element-wise first*
  (decimal addition is exact and associative, so shuffle/aggregation order —
  which differs between engines and between runs — cannot change the result);
- every query has a total ORDER BY;
- aggregate/computed columns are aliased identically in both dialects.

Scale notes: joins against ``nation``/``region`` are explicitly broadcast
(they are constant-size in TPC-H at any SF); everything else is expressed
declaratively so Catalyst keeps pushdown/pruning and AQE picks shuffle
strategy at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from momyre_spark.plans import query
from momyre_spark.sources.parquet import load_table


def _dec_sum(col, out: str, scale: str = "12,2"):
    """Exact (order-independent) sum of a float money column.

    Summed as DECIMAL (exact, associative — immune to shuffle order), then
    surfaced as DOUBLE so both engines deliver the identical IEEE value to
    the comparison layer regardless of decimal-width conventions."""
    return F.sum(F.col(col).cast(f"decimal({scale})")).cast("double").alias(out)


# --------------------------------------------------------------------------
# Q1 — snapshot scan + projection + rename (reference S2+P1–P3:
# mongo.go:569-593 readTable; mysql.go:381-407 schema-enforcing insert)
# --------------------------------------------------------------------------
@query(
    "q01_snapshot_project",
    oracle="""
    SELECT c_custkey AS _id, c_name, c_mktsegment
    FROM customer ORDER BY _id
    """,
)
def q01(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "customer")
        .select(F.col("c_custkey").alias("_id"), "c_name", "c_mktsegment")
        .orderBy("_id")
    )


# --------------------------------------------------------------------------
# Q2 — IN-list filter (reference P4 ns-filter: mongo.go:463-479)
# --------------------------------------------------------------------------
@query(
    "q02_inlist_filter",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders WHERE o_orderstatus IN ('O', 'F')
    ORDER BY o_orderkey
    """,
)
def q02(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderstatus").isin("O", "F"))
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Q3 — timestamp range filter / resume-token semantics (reference P5:
# mongo.go:481-492 "ts > resume point")
# --------------------------------------------------------------------------
@query(
    "q03_ts_range_filter",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events WHERE CAST(ts AS TIMESTAMP) > TIMESTAMP '2024-01-15 00:00:00'
    ORDER BY event_id
    """,
)
def q03(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.sources.parquet import load_events_since

    return (
        load_events_since(spark, sf, "2024-01-15 00:00:00")
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Q4 — latest-timestamp probe (reference S5: mongo.go:595-616 readTimestamp,
# a $natural-desc top-1 scan)
# --------------------------------------------------------------------------
@query(
    "q04_latest_ts_probe",
    oracle="SELECT CAST(CAST(max(ts) AS TIMESTAMP) AS VARCHAR) AS ts FROM events",
)
def q04(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "events")
        .agg(F.max("ts").cast("string").alias("ts"))
    )


# --------------------------------------------------------------------------
# Q5 — point existence probe (reference S7: mongo.go:677-693 checkHasId)
# --------------------------------------------------------------------------
@query(
    "q05_point_lookup",
    oracle="SELECT count(*) AS n FROM customer WHERE c_custkey = 42",
)
def q05(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "customer")
        .filter(F.col("c_custkey") == 42)
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# Q6 — orphan anti-join (reference J1: run.go:249-279 — an O(N) point-probe
# loop there; a single distributed hash anti-join here)
# --------------------------------------------------------------------------
@query(
    "q06_orphan_antijoin",
    oracle="""
    SELECT e.event_id FROM events e
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
    ORDER BY e.event_id
    """,
)
def q06(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.antijoin import orphan_ids

    events = load_table(spark, sf, "events")
    customer = load_table(spark, sf, "customer")
    return (
        orphan_ids(events, customer, left_key="user_id", right_key="c_custkey")
        .select("event_id")
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Q7 — last-writer-wins CDC merge (reference K1–K4 semantics made
# order-insensitive: the sequential applier run.go:301-322 becomes a
# per-key latest-state reduction)
# --------------------------------------------------------------------------
@query(
    "q07_latest_wins_merge",
    oracle="""
    SELECT user_id, event_type, value FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id
            ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events) t
    WHERE rn = 1 ORDER BY user_id
    """,
)
def q07(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.cdc import latest_state_per_key

    events = load_table(spark, sf, "events")
    return (
        latest_state_per_key(events, key="user_id", order=["ts", "event_id"])
        .select("user_id", "event_type", "value")
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Q8 — inner equi-join + hash aggregation (broadcast dim)
# --------------------------------------------------------------------------
@query(
    "q08_join_agg",
    oracle="""
    SELECT n_name, count(*) AS c,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def q08(spark: SparkSession, sf: str) -> DataFrame:
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("c"), _dec_sum("c_acctbal", "bal"))
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# Q9 — multi-way join over broadcast-able dims
# --------------------------------------------------------------------------
@query(
    "q09_multiway_join",
    oracle="""
    SELECT r_name, count(*) AS c
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
)
def q09(spark: SparkSession, sf: str) -> DataFrame:
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("r_name")
    )


# --------------------------------------------------------------------------
# Q10 — left semi join
# --------------------------------------------------------------------------
@query(
    "q10_semi_join",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
    ORDER BY s_suppkey
    """,
)
def q10(spark: SparkSession, sf: str) -> DataFrame:
    supplier = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation").filter(F.col("n_regionkey") == 0)
    return (
        supplier.join(
            F.broadcast(nation),
            supplier.s_nationkey == nation.n_nationkey,
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q11 — TPC-H Q1-shaped hash aggregation (the flagship query; partial
# aggregation map-side, exact decimal arithmetic)
# --------------------------------------------------------------------------
@query(
    "q11_tpch_q1_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           count(*) AS c
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    revenue_expr = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(12,2)")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum("l_quantity", "sum_qty"),
            F.sum(revenue_expr).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("c"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Q12 — distinct
# --------------------------------------------------------------------------
@query(
    "q12_distinct",
    oracle="SELECT DISTINCT o_orderstatus FROM orders ORDER BY o_orderstatus",
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "orders")
        .select("o_orderstatus")
        .distinct()
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# Q13 — sort + top-k (Spark plans TakeOrderedAndProject: no full sort at scale)
# --------------------------------------------------------------------------
@query(
    "q13_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice AS p
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q13(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", F.col("o_totalprice").alias("p"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q14 — set op (INTERSECT)
# --------------------------------------------------------------------------
@query(
    "q14_intersect",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    INTERSECT
    SELECT s_nationkey AS k FROM supplier
    ORDER BY k
    """,
)
def q14(spark: SparkSession, sf: str) -> DataFrame:
    customer = load_table(spark, sf, "customer")
    supplier = load_table(spark, sf, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("k"))
        .intersect(supplier.select(F.col("s_nationkey").alias("k")))
        .orderBy("k")
    )


# --------------------------------------------------------------------------
# Q15 — scalar string/date functions
# --------------------------------------------------------------------------
@query(
    "q15_scalar_functions",
    oracle="""
    SELECT o_orderkey, upper(o_orderpriority) AS pr, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d
    FROM orders WHERE year(o_orderdate) = 1997
    ORDER BY o_orderkey
    """,
)
def q15(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "orders")
        .filter(F.year("o_orderdate") == 1997)
        .select(
            "o_orderkey",
            F.upper("o_orderpriority").alias("pr"),
            F.col("o_orderdate").cast("date").cast("string").alias("d"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Q16 — window function: running sum per key (decimal-exact so the
# cumulative accumulation order cannot produce float drift)
# --------------------------------------------------------------------------
@query(
    "q16_window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS run
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
)
def q16(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load_table(spark, sf, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .over(w)
            .cast("double")
            .alias("run"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )
