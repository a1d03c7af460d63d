"""Analytics-surface breadth queries (SURVEY.md §2.4-2.6, §2.10 Q8-Q16 family).

The reference has no joins/aggregations/windows beyond what Q1-Q16 already
encode; the engine's mandate is the full Spark SQL surface. Each query here
pins one more operator class against the DuckDB oracle: outer joins,
grouping sets/rollup, except/union, correlated and scalar subqueries, the
window-function family (lag/lead/rank/ntile), conditional aggregation, and
string/date scalar breadth.

Determinism rules as in core_queries (decimal-exact sums surfaced as double,
total ORDER BY, shared aliases).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from momyre_spark.functions.numeric import round4_sql, round_half_up
from momyre_spark.plans import query
from momyre_spark.sources.parquet import load_table


# --------------------------------------------------------------------------
# outer joins
# --------------------------------------------------------------------------
@query(
    "q17_left_outer_join",
    oracle="""
    SELECT n.n_nationkey, n.n_name, count(s.s_suppkey) AS suppliers
    FROM nation n LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_nationkey, n.n_name
    ORDER BY n.n_nationkey
    """,
)
def q17(spark: SparkSession, sf: str) -> DataFrame:
    nation = load_table(spark, sf, "nation")
    supplier = load_table(spark, sf, "supplier")
    return (
        nation.join(supplier, supplier.s_nationkey == nation.n_nationkey, "left")
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("s_suppkey").alias("suppliers"))
        .orderBy("n_nationkey")
    )


@query(
    "q18_full_outer_join",
    oracle="""
    SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nk,
           count(DISTINCT c.c_custkey) AS customers,
           count(DISTINCT s.s_suppkey) AS suppliers
    FROM customer c FULL OUTER JOIN supplier s ON c.c_nationkey = s.s_nationkey
    GROUP BY 1 ORDER BY nk
    """,
)
def q18(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    s = load_table(spark, sf, "supplier")
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
        .select(
            F.coalesce(c.c_nationkey, s.s_nationkey).alias("nk"),
            "c_custkey",
            "s_suppkey",
        )
        .groupBy("nk")
        .agg(
            F.countDistinct("c_custkey").alias("customers"),
            F.countDistinct("s_suppkey").alias("suppliers"),
        )
        .orderBy("nk")
    )


# --------------------------------------------------------------------------
# grouping sets / rollup  (NULL grouping keys rendered as sentinel strings so
# both engines hash identically)
# --------------------------------------------------------------------------
@query(
    "q19_rollup",
    oracle="""
    SELECT coalesce(l_returnflag, '<all>') AS rf,
           coalesce(l_linestatus, '<all>') AS ls,
           count(*) AS c
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY rf, ls
    """,
)
def q19(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("ls"),
            "c",
        )
        .orderBy("rf", "ls")
    )


@query(
    "q20_cube",
    oracle="""
    SELECT coalesce(o_orderstatus, '<all>') AS st,
           coalesce(o_orderpriority, '<all>') AS pr,
           count(*) AS c
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY st, pr
    """,
)
def q20(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("st"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("pr"),
            "c",
        )
        .orderBy("st", "pr")
    )


# --------------------------------------------------------------------------
# set ops: EXCEPT / UNION ALL
# --------------------------------------------------------------------------
@query(
    "q21_except",
    oracle="""
    SELECT n_nationkey AS k FROM nation
    EXCEPT
    SELECT s_nationkey AS k FROM supplier
    ORDER BY k
    """,
)
def q21(spark: SparkSession, sf: str) -> DataFrame:
    nation = load_table(spark, sf, "nation")
    supplier = load_table(spark, sf, "supplier")
    return (
        nation.select(F.col("n_nationkey").alias("k"))
        .exceptAll(supplier.select(F.col("s_nationkey").alias("k")).distinct())
        .distinct()
        .orderBy("k")
    )


@query(
    "q22_union_all_agg",
    oracle="""
    SELECT side, count(*) AS c FROM (
        SELECT 'cust' AS side FROM customer
        UNION ALL
        SELECT 'supp' AS side FROM supplier
    ) t GROUP BY side ORDER BY side
    """,
)
def q22(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer").select(F.lit("cust").alias("side"))
    s = load_table(spark, sf, "supplier").select(F.lit("supp").alias("side"))
    return (
        c.unionByName(s).groupBy("side").agg(F.count(F.lit(1)).alias("c")).orderBy("side")
    )


# --------------------------------------------------------------------------
# subqueries: correlated EXISTS and scalar
# --------------------------------------------------------------------------
@query(
    "q23_exists_subquery",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    ORDER BY c_custkey
    """,
)
def q23(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "q24_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice AS p FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.8 FROM orders)
    ORDER BY o_orderkey
    """,
)
def q24(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    o.createOrReplaceTempView("__q24_orders")
    # expressed in Spark SQL to exercise the scalar-subquery planner path
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice AS p FROM __q24_orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.8 FROM __q24_orders)
        ORDER BY o_orderkey
        """
    )


# --------------------------------------------------------------------------
# window family: lag/lead, rank/dense_rank, ntile
# --------------------------------------------------------------------------
@query(
    "q25_window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lag(o_orderkey) OVER w AS prev_order,
           lead(o_orderkey) OVER w AS next_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def q25(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        load_table(spark, sf, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.lag("o_orderkey").over(w).alias("prev_order"),
            F.lead("o_orderkey").over(w).alias("next_order"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "q26_window_rank_ntile",
    oracle="""
    SELECT o_custkey, o_orderkey,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def q26(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load_table(spark, sf, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# conditional aggregation + min/max/avg breadth
# --------------------------------------------------------------------------
@query(
    "q27_conditional_agg",
    oracle="""
    SELECT l_linestatus,
           count(*) FILTER (WHERE l_returnflag = 'R') AS returned,
           count(*) FILTER (WHERE l_discount > 0.05) AS discounted,
           CAST(min(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS min_q,
           CAST(max(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS max_q
    FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def q27(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("returned"),
            F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("discounted"),
            F.min(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("min_q"),
            F.max(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("max_q"),
        )
        .orderBy("l_linestatus")
    )


# --------------------------------------------------------------------------
# string scalar breadth
# --------------------------------------------------------------------------
@query(
    "q28_string_functions",
    oracle="""
    SELECT p_partkey,
           substring(p_name, 1, 8) AS pfx,
           replace(p_type, ' ', '_') AS typ,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4,
           length(p_brand) AS blen,
           reverse(p_brand) AS brev,
           concat(p_brand, ':', p_type) AS tag
    FROM part ORDER BY p_partkey
    """,
)
def q28(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "part")
        .select(
            "p_partkey",
            F.substring("p_name", 1, 8).alias("pfx"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("typ"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size4"),
            F.length("p_brand").cast("bigint").alias("blen"),
            F.reverse("p_brand").alias("brev"),
            F.concat_ws("", F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("tag"),
        )
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# date scalar breadth
# --------------------------------------------------------------------------
@query(
    "q29_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
           year(o_orderdate) * 100 + month(o_orderdate) AS yyyymm,
           dayofweek(CAST(o_orderdate AS DATE)) AS dow,
           CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS due
    FROM orders WHERE year(o_orderdate) = 1996
    ORDER BY o_orderkey
    """,
)
def q29(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders").filter(F.year("o_orderdate") == 1996)
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias(
            "month_start"
        ),
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("bigint").alias("yyyymm"),
        (F.dayofweek(F.col("o_orderdate").cast("date")) - 1).cast("bigint").alias("dow"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("string").alias("due"),
    ).orderBy("o_orderkey")


# --------------------------------------------------------------------------
# array/map expression surface over JSON props
# --------------------------------------------------------------------------
@query(
    "q30_array_map_functions",
    oracle="""
    SELECT event_type,
           count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS distinct_k,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q30(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("bigint")
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("k").alias("distinct_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Tumbling event-time window (batch form of streaming/windows.py
# windowed_counts — same logical op, verifiable against the SQL oracle)
# --------------------------------------------------------------------------
@query(
    "q31_tumbling_window",
    oracle="""
    SELECT CAST(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS VARCHAR) AS window_start,
           event_type, count(*) AS c,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events
    GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
)
def q31(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "c",
            "total",
        )
        .orderBy("window_start", "event_type")
    )


# --------------------------------------------------------------------------
# TPC-H Q3 shape: selective filters + 3-way join + grouped revenue + top-k
# --------------------------------------------------------------------------
@query(
    "q32_tpch_q3_shape",
    oracle="""
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS o_orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q32(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(12,2)")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# TPC-H Q5 shape: 5-way join through dims with broadcast, grouped revenue
# --------------------------------------------------------------------------
@query(
    "q33_tpch_q5_shape",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name ORDER BY n.n_name
    """,
)
def q33(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    l = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(12,2)")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == o.o_orderkey)
        # supplier scales with SF (unlike nation/region) — no broadcast hint;
        # AQE picks broadcast at small SF and shuffle join at scale
        .join(
            s,
            (F.col("l_suppkey") == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# (Numbering note: there is intentionally no q34 — a draft query was folded
# into q33 during development; the gap is kept to avoid renaming keys the
# driver has already recorded correctness rows for.)
# --------------------------------------------------------------------------
# Grouped-map pandas UDF (applyInPandas): per-key numpy computation.
# Median is exactly determined (mean of the two middle doubles), so both
# engines produce bit-identical results.
# --------------------------------------------------------------------------
@query(
    "q35_grouped_map_median",
    oracle="""
    SELECT user_id, median(value) AS med, count(*) AS n
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def q35(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "med": [float(np.median(pdf["value"].to_numpy()))],
                "n": [len(pdf)],
            }
        )

    ev = load_table(spark, sf, "events").select("user_id", "value")
    return (
        ev.groupBy("user_id")
        .applyInPandas(stats, schema="user_id long, med double, n long")
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Python UDTF: one input row -> many output rows (tokenizer as a table
# function), registered and invoked from SQL with LATERAL.
# --------------------------------------------------------------------------
@query(
    "q36_udtf_tokenize",
    oracle=r"""
    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
    FROM documents WHERE doc_id < 20 ORDER BY ALL
    """,
)
def q36(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string")
    class Tokenize:
        def eval(self, text: str):
            for tok in text.strip().split():
                yield (tok,)

    spark.udtf.register("tokenize_udtf", Tokenize)
    load_table(spark, sf, "documents").createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.token
        FROM __docs_udtf d, LATERAL tokenize_udtf(d.text) t
        WHERE d.doc_id < 20
        ORDER BY d.doc_id, t.token
        """
    )


# --------------------------------------------------------------------------
# Regex scalar surface: extract / match / replace / count
# --------------------------------------------------------------------------
@query(
    "q37_regex_functions",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
           CASE WHEN regexp_matches(p_name, '[0-9]') THEN 1 ELSE 0 END AS has_digit,
           regexp_replace(p_brand, '[0-9]+', '#', 'g') AS brand_norm,
           len(regexp_extract_all(p_type, '[A-Z]+')) AS n_words
    FROM part ORDER BY p_partkey
    """,
)
def q37(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "part")
        .select(
            "p_partkey",
            F.regexp_extract("p_type", "([A-Z]+)", 1).alias("first_word"),
            F.when(F.col("p_name").rlike("[0-9]"), 1).otherwise(0).alias("has_digit"),
            F.regexp_replace("p_brand", "[0-9]+", "#").alias("brand_norm"),
            F.size(F.regexp_extract_all("p_type", F.lit("[A-Z]+"), F.lit(0)))
            .cast("bigint")
            .alias("n_words"),
        )
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# Collect/array aggregation surface: deterministic via sort-then-join
# --------------------------------------------------------------------------
@query(
    "q38_collect_agg",
    oracle="""
    SELECT n_nationkey,
           array_to_string(list_sort(list(s_name)), ',') AS suppliers,
           count(*) AS n
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_nationkey ORDER BY n_nationkey
    """,
)
def q38(spark: SparkSession, sf: str) -> DataFrame:
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_nationkey")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("s_name"))).alias("suppliers"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("n_nationkey")
    )


# --------------------------------------------------------------------------
# Pivot: event counts per user-decile pivoted by event type. The oracle uses
# portable conditional aggregation; pivot cells are coalesced to 0 so both
# engines agree on combos absent from the data.
# --------------------------------------------------------------------------
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "q39_pivot",
    oracle="""
    SELECT user_id % 10 AS decile,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'error') AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS signup,
           count(*) FILTER (WHERE event_type = 'view') AS view
    FROM events GROUP BY 1 ORDER BY decile
    """,
)
def q39(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").withColumn(
        "decile", F.col("user_id") % 10
    )
    pivoted = (
        ev.groupBy("decile")
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    return pivoted.select(
        "decile",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
    ).orderBy("decile")


# --------------------------------------------------------------------------
# Null-handling scalar surface: nullif / ifnull / nvl2-style branching
# --------------------------------------------------------------------------
@query(
    "q40_null_functions",
    oracle="""
    SELECT s_suppkey,
           nullif(s_nationkey, 0) AS nk_or_null,
           coalesce(nullif(s_name, ''), '<unnamed>') AS name_or_default,
           CASE WHEN s_acctbal IS NULL THEN 'missing' ELSE 'present' END AS bal_state
    FROM supplier ORDER BY s_suppkey
    """,
)
def q40(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "supplier")
        .select(
            "s_suppkey",
            F.nullif(F.col("s_nationkey"), F.lit(0)).alias("nk_or_null"),
            F.coalesce(
                F.nullif(F.col("s_name"), F.lit("")), F.lit("<unnamed>")
            ).alias("name_or_default"),
            F.when(F.col("s_acctbal").isNull(), "missing")
            .otherwise("present")
            .alias("bal_state"),
        )
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# split_part / array-index string surface
# --------------------------------------------------------------------------
@query(
    "q41_split_part",
    oracle="""
    SELECT p_partkey,
           split_part(p_type, ' ', 1) AS t1,
           split_part(p_type, ' ', -1) AS tlast,
           len(string_split(p_type, ' ')) AS nparts
    FROM part ORDER BY p_partkey
    """,
)
def q41(spark: SparkSession, sf: str) -> DataFrame:
    parts = F.split(F.col("p_type"), " ")
    return (
        load_table(spark, sf, "part")
        .select(
            "p_partkey",
            F.element_at(parts, 1).alias("t1"),
            F.element_at(parts, -1).alias("tlast"),
            F.size(parts).cast("bigint").alias("nparts"),
        )
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# Exact percentiles (interpolated, = DuckDB quantile_cont): the reporting
# workhorse the approximate sketches (approx_percentile) trade away.
# --------------------------------------------------------------------------
@query(
    "q42_percentiles",
    oracle="""
    SELECT l_returnflag,
           floor(quantile_cont(l_extendedprice, 0.25) * 10000 + 0.5) / 10000.0 AS p25,
           floor(quantile_cont(l_extendedprice, 0.5)  * 10000 + 0.5) / 10000.0 AS p50,
           floor(quantile_cont(l_extendedprice, 0.9)  * 10000 + 0.5) / 10000.0 AS p90,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q42(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions.numeric import round_half_up

    li = load_table(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            round_half_up(F.expr("percentile(l_extendedprice, 0.25)"), 4).alias("p25"),
            round_half_up(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
            round_half_up(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Edit-distance scalar surface (fuzzy matching / dedup pre-filter)
# --------------------------------------------------------------------------
@query(
    "q43_levenshtein",
    oracle="""
    SELECT p_partkey,
           levenshtein(split_part(p_type, ' ', 1), split_part(p_type, ' ', -1)) AS d_type,
           levenshtein(p_brand, 'Brand#33') AS d_brand
    FROM part ORDER BY p_partkey
    """,
)
def q43(spark: SparkSession, sf: str) -> DataFrame:
    parts = F.split(F.col("p_type"), " ")
    return (
        load_table(spark, sf, "part")
        .select(
            "p_partkey",
            F.levenshtein(F.element_at(parts, 1), F.element_at(parts, -1))
            .cast("bigint").alias("d_type"),
            F.levenshtein(F.col("p_brand"), F.lit("Brand#33"))
            .cast("bigint").alias("d_brand"),
        )
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# Batch sessionization: gap-based sessions via lag + running sum of
# boundary flags — the batch twin of streaming/sessionize.py (same session
# definition, 30-minute inactivity gap).
# --------------------------------------------------------------------------
_SESSION_GAP_S = 1800


@query(
    "q44_sessionize_batch",
    oracle=f"""
    WITH o AS (
        SELECT user_id, event_id, CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es,
               lag(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
               ) AS prev_es
        FROM events
    ),
    f AS (
        SELECT *, CASE WHEN prev_es IS NULL OR es - prev_es > {_SESSION_GAP_S}
                       THEN 1 ELSE 0 END AS new_s
        FROM o
    ),
    s AS (
        SELECT user_id, event_id, es,
               sum(new_s) OVER (
                   PARTITION BY user_id ORDER BY es, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS session_id
        FROM f
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events, min(es) AS start_es, max(es) AS end_es
    FROM s GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def q44(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf, "events").select(
        "user_id", "event_id", F.col("ts").cast("long").alias("es")
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    flagged = ev.withColumn(
        "new_s",
        F.when(
            F.lag("es").over(w).isNull()
            | ((F.col("es") - F.lag("es").over(w)) > _SESSION_GAP_S),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    run = Window.partitionBy("user_id").orderBy("es", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        flagged.withColumn("session_id", F.sum("new_s").over(run).cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("es").alias("start_es"),
            F.max("es").alias("end_es"),
        )
        .orderBy("user_id", "session_id")
    )


# --------------------------------------------------------------------------
# Salted skew join (operators/skew.py): result-equivalent to the plain
# equi-join — the oracle IS the plain join — while the physical plan spreads
# a hot key over `salts` partitions. Driver-verifies the skew path's
# correctness; the skew-distribution property is tested in
# test_skew_and_windows.py.
# --------------------------------------------------------------------------
@query(
    "q45_salted_join",
    oracle="""
    SELECT o.o_orderkey, c.c_name, o.o_totalprice AS p
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 350000
    ORDER BY o.o_orderkey
    """,
)
def q45(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.skew import salted_join

    o = load_table(spark, sf, "orders").filter(F.col("o_totalprice") > 350000)
    c = load_table(spark, sf, "customer").withColumnRenamed("c_custkey", "o_custkey")
    return (
        salted_join(o, c.select("o_custkey", "c_name"), on="o_custkey")
        .select("o_orderkey", "c_name", F.col("o_totalprice").alias("p"))
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Event-time RANGE window frame: trailing 30-day revenue per customer —
# value-based frames (RANGE), unlike q16's row-count frame (ROWS). The
# order key is integer epoch-days so both engines use the same numeric
# frame; the measure is summed as DECIMAL(18,2) (exact arithmetic — a
# RANGE frame's aggregation order is engine-internal, so float sums would
# be order-sensitive).
# --------------------------------------------------------------------------
@query(
    "q46_range_interval_window",
    oracle="""
    WITH o AS (
        SELECT o_custkey, o_orderkey,
               date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
               CAST(o_totalprice AS DECIMAL(18,2)) AS p
        FROM orders
    )
    SELECT o_custkey, o_orderkey,
           CAST(CAST(sum(p) OVER (
               PARTITION BY o_custkey ORDER BY d
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ) AS DECIMAL(18,2)) AS DOUBLE) AS trailing_30d
    FROM o ORDER BY o_custkey, o_orderkey
    """,
)
def q46(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("d"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("d")
        .rangeBetween(-30, Window.currentRow)
    )
    return (
        o.withColumn(
            "trailing_30d",
            F.sum("p").over(w).cast("decimal(18,2)").cast("double"),
        )
        .select("o_custkey", "o_orderkey", "trailing_30d")
        .orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# GROUPING SETS — the general form rollup/cube (q19/q20) specialize.
# Expressed through the engine's SQL entry point. Exact decimal sums, so
# no float-summation order sensitivity across grouping combinations.
# --------------------------------------------------------------------------
_Q47_SQL = """
    SELECT o_orderstatus, o_orderpriority, count(*) AS c,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total
    FROM {table}
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority), ())
    ORDER BY o_orderstatus, o_orderpriority
"""


@query("q47_grouping_sets", oracle=_Q47_SQL.format(table="orders"))
def q47(spark: SparkSession, sf: str) -> DataFrame:
    load_table(spark, sf, "orders").createOrReplaceTempView("__q47_orders")
    return spark.sql(_Q47_SQL.format(table="__q47_orders"))


# --------------------------------------------------------------------------
# PIVOT: order-priority x order-year totals as a wide table. Spark's
# .pivot() with an EXPLICIT value list (no extra distinct-scan pass, the
# form that scales); the oracle is the equivalent conditional aggregation.
# Exact decimal sums avoid float summation-order drift.
# --------------------------------------------------------------------------
_Q48_YEARS = (1995, 1996, 1997)


@query(
    "q48_pivot",
    oracle=f"""
    SELECT o_orderpriority,
           {", ".join(
               "CAST(CAST(COALESCE(sum(CASE WHEN year(o_orderdate) = " + str(y)
               + " THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) "
               "AS DECIMAL(18,2)) AS DOUBLE) AS y" + str(y)
               for y in _Q48_YEARS
           )}
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q48(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders").select(
        "o_orderpriority",
        F.year("o_orderdate").alias("yr"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("yr", list(_Q48_YEARS))
        .agg(F.sum("p"))
    )
    return wide.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(str(y)), F.lit(0))
            .cast("decimal(18,2)")
            .cast("double")
            .alias(f"y{y}")
            for y in _Q48_YEARS
        ],
    ).orderBy("o_orderpriority")


# --------------------------------------------------------------------------
# INTERSECT set op (q21 covers EXCEPT): customers ordering in BOTH years.
# --------------------------------------------------------------------------
@query(
    "q49_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    ORDER BY o_custkey
    """,
)
def q49(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.intersect(y96).orderBy("o_custkey")


# --------------------------------------------------------------------------
# Forward fill / LOCF (operators/timeseries.forward_fill): error events
# report no value; each takes the user's most recent earlier reading.
# last(... IGNORE NULLS) over a running frame on both engines.
# --------------------------------------------------------------------------
@query(
    "q50_forward_fill",
    oracle=f"""
    WITH base AS (
        SELECT user_id, event_id, ts,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        FROM events
    )
    SELECT user_id, event_id,
           {round4_sql("last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS filled
    FROM base ORDER BY user_id, event_id
    """,
)
def q50(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.timeseries import forward_fill

    ev = load_table(spark, sf, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") != "error", F.col("value")).alias("v"),
    )
    filled = forward_fill(ev, ["v"], key="user_id", order=("ts", "event_id"))
    return filled.select(
        "user_id",
        "event_id",
        round_half_up(F.col("v"), 4).alias("filled"),
    ).orderBy("user_id", "event_id")


# --------------------------------------------------------------------------
# Semi-structured props via Spark 4 VARIANT (functions/semistructured.py):
# parse the JSON ONCE into VARIANT binary, promote a typed field, aggregate.
# The pre-variant analog (get_json_object per field) re-parses the full text
# per extraction — at 100 TB the parse count IS the scan CPU. Oracle uses
# DuckDB's json_extract on the same path.
# --------------------------------------------------------------------------
@query(
    "q51_variant_props",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS c,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events
    WHERE props IS NOT NULL
    GROUP BY 1 ORDER BY k_bucket
    """,
)
def q51(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.functions.semistructured import promote_json_fields

    ev = load_table(spark, sf, "events").filter(F.col("props").isNotNull())
    typed = promote_json_fields(ev, "props", {"k": ("$.k", "bigint")})
    return (
        typed.groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .orderBy("k_bucket")
    )


# --------------------------------------------------------------------------
# Regular-grid resample + LOCF (operators/timeseries.resample_locf): each
# user's irregular events onto a 4-hour grid, last observed value carried into
# empty buckets. Grid is GENERATED per key (sequence), not joined from a
# calendar table; bucket emitted as epoch-seconds LONG (engine-neutral).
# --------------------------------------------------------------------------
@query(
    "q52_resample_locf",
    oracle=f"""
    WITH b AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / 14400) * 14400 AS BIGINT) AS bucket_epoch,
               value,
               row_number() OVER (
                   PARTITION BY user_id, floor(epoch(ts) / 14400)
                   ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    ),
    lastv AS (SELECT user_id, bucket_epoch, value FROM b WHERE rn = 1),
    bounds AS (
        SELECT user_id, min(bucket_epoch) AS lo, max(bucket_epoch) AS hi
        FROM lastv GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(range(lo, hi + 1, 14400)) AS bucket_epoch
        FROM bounds
    )
    SELECT g.user_id, g.bucket_epoch,
           {round4_sql("last_value(l.value IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.bucket_epoch)")} AS v
    FROM grid g LEFT JOIN lastv l
      ON g.user_id = l.user_id AND g.bucket_epoch = l.bucket_epoch
    ORDER BY g.user_id, g.bucket_epoch
    """,
)
def q52(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.timeseries import resample_locf

    ev = load_table(spark, sf, "events")
    out = resample_locf(
        ev, key="user_id", ts_col="ts", value_col="value",
        step_seconds=14400, tiebreak=("event_id",),
    )
    return out.select(
        "user_id",
        "bucket_epoch",
        round_half_up(F.col("value"), 4).alias("v"),
    ).orderBy("user_id", "bucket_epoch")


# --------------------------------------------------------------------------
# Funnel analysis: users progressing view -> click -> purchase in temporal
# order. Staged min-ts chaining (each stage joins the previous stage's
# first-completion time) — the standard warehouse funnel; each stage is one
# (user) agg + one equi-join, all broadcastable once stages shrink.
# --------------------------------------------------------------------------
@query(
    "q53_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
        GROUP BY e.user_id
    )
    SELECT * FROM (
        SELECT '1_view' AS stage, count(*) AS users FROM v
        UNION ALL SELECT '2_click' AS stage, count(*) AS users FROM c
        UNION ALL SELECT '3_purchase' AS stage, count(*) AS users FROM p
    ) ORDER BY stage
    """,
)
def q53(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    one = (
        v.agg(F.count(F.lit(1)).alias("users")).select(F.lit("1_view").alias("stage"), "users")
        .unionAll(c.agg(F.count(F.lit(1)).alias("users")).select(F.lit("2_click").alias("stage"), "users"))
        .unionAll(p.agg(F.count(F.lit(1)).alias("users")).select(F.lit("3_purchase").alias("stage"), "users"))
    )
    return one.orderBy("stage")


# --------------------------------------------------------------------------
# Retention cohorts: users grouped by first-seen day, distinct-user counts
# at each week-of-age. First-touch agg + one join back + one (cohort, age)
# agg — the whole analysis is two shuffles regardless of scale. Epoch
# arithmetic keeps week-age engine-neutral (no week-truncation semantics).
# --------------------------------------------------------------------------
@query(
    "q54_retention_cohorts",
    oracle="""
    WITH first AS (
        SELECT user_id, min(ts) AS t0 FROM events GROUP BY user_id
    )
    SELECT CAST(CAST(date_trunc('day', f.t0) AS DATE) AS VARCHAR) AS cohort,
           CAST(floor((epoch_us(e.ts) - epoch_us(f.t0)) / (604800.0 * 1e6)) AS BIGINT) AS age_weeks,
           count(DISTINCT e.user_id) AS active_users
    FROM events e JOIN first f ON e.user_id = f.user_id
    GROUP BY 1, 2 ORDER BY cohort, age_weeks
    """,
)
def q54(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(F.min("ts").alias("t0"))
    joined = load_table(spark, sf, "events").join(first, "user_id")
    age = F.floor(
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("t0")))
        / F.lit(604800.0 * 1e6)
    ).cast("bigint")
    return (
        joined.groupBy(
            F.date_trunc("day", F.col("t0")).cast("date").cast("string").alias("cohort"),
            age.alias("age_weeks"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort", "age_weeks")
    )


# --------------------------------------------------------------------------
# Linear gap interpolation (operators/timeseries.interpolate_linear): error
# events report no value; fill by blending the neighboring observations in
# event-time. Identical IEEE arithmetic on both engines (same blend
# expression over the same doubles), so filled values hash-match exactly.
# --------------------------------------------------------------------------
@query(
    "q55_interpolate",
    oracle="""
    WITH base AS (
        SELECT user_id, event_id,
               CAST(epoch_us(ts) AS DOUBLE) AS x,
               CASE WHEN event_type = 'error' THEN NULL
                    ELSE CAST(value AS DOUBLE) END AS v
        FROM events
    ),
    w AS (
        SELECT user_id, event_id, x, v,
               last_value(CASE WHEN v IS NOT NULL
                               THEN struct_pack(at := x, val := v) END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY x
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
               first_value(CASE WHEN v IS NOT NULL
                                THEN struct_pack(at := x, val := v) END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY x
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
        FROM base
    )
    SELECT user_id, event_id,
           floor((CASE WHEN v IS NOT NULL THEN v
                       WHEN prev IS NOT NULL AND nxt IS NOT NULL THEN
                            prev.val + (CASE WHEN nxt.at = prev.at THEN 0.0
                                             ELSE (x - prev.at) / (nxt.at - prev.at) END)
                                       * (nxt.val - prev.val)
                  END) * 10000 + 0.5) / 10000.0 AS filled
    FROM w ORDER BY user_id, event_id
    """,
)
def q55(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.timeseries import interpolate_linear

    ev = load_table(spark, sf, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("x"),
        F.when(F.col("event_type") != "error", F.col("value")).alias("v"),
    )
    out = interpolate_linear(ev, key="user_id", order_col="x", value_col="v")
    return out.select(
        "user_id",
        "event_id",
        round_half_up(F.col("v"), 4).alias("filled"),
    ).orderBy("user_id", "event_id")


# --------------------------------------------------------------------------
# Rolling z-score anomaly signal: each event scored against its key's
# trailing 10-row window. Moments come from DECIMAL window sums (exact,
# order-independent) and only the final variance/sqrt runs in double — the
# one formulation where both engines produce bit-identical scores. One
# shuffle on the key; the frame is evaluated incrementally.
# --------------------------------------------------------------------------
@query(
    "q56_rolling_zscore",
    oracle=f"""
    WITH w AS (
        SELECT user_id, event_id,
               CAST(value AS DOUBLE) AS v,
               CAST(count(*) OVER fr AS BIGINT) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) OVER fr AS DOUBLE) AS sx,
               CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) OVER fr AS DOUBLE) AS sxx
        FROM events
        WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id,
           {round4_sql("CASE WHEN n >= 5 AND n * sxx - sx * sx > 0 THEN (v - sx / n) / sqrt((n * sxx - sx * sx) / (n * n)) END")} AS z
    FROM w ORDER BY user_id, event_id
    """,
)
def q56(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    fr = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    dec = F.col("value").cast("decimal(18,2)")
    n = F.count(F.lit(1)).over(fr).cast("bigint")
    sx = F.sum(dec).over(fr).cast("double")
    sxx = F.sum(dec * dec).over(fr).cast("double")
    v = F.col("value").cast("double")
    var_num = n * sxx - sx * sx
    z = F.when(
        (n >= 5) & (var_num > 0),
        (v - sx / n) / F.sqrt(var_num / (n * n)),
    )
    return ev.select(
        "user_id",
        "event_id",
        round_half_up(z, 4).alias("z"),
    ).orderBy("user_id", "event_id")


# --------------------------------------------------------------------------
# Sliding (hopping) windows: 1-day windows every 6 hours — each event lands
# in 4 windows. Spark's window() explodes window membership JVM-side; the
# oracle derives the same memberships from epoch arithmetic. The batch twin
# of the streaming rollup's hop mode.
# --------------------------------------------------------------------------
@query(
    "q57_sliding_window",
    oracle="""
    WITH e AS (
        SELECT event_type, value,
               CAST(floor(epoch_us(ts) / (21600.0 * 1e6)) AS BIGINT) AS slot
        FROM events
    ),
    m AS (
        SELECT event_type, value, (slot - k) * 21600 AS win_start
        FROM e CROSS JOIN (SELECT unnest(range(0, 4)) AS k)
        WHERE slot - k >= 0
    )
    SELECT win_start, event_type, count(*) AS c,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM m GROUP BY 1, 2 ORDER BY win_start, event_type
    """,
)
def q57(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 day", "6 hours").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("win_start"),
            "event_type",
            "c",
            "total",
        )
        .orderBy("win_start", "event_type")
    )


# --------------------------------------------------------------------------
# TPC-H Q7 shape: bidirectional two-nation trade volume by ship year — a
# 5-way join (fact x fact x dims) with an OR'd nation-pair predicate and a
# decimal volume aggregate. The two nation joins broadcast (constant-size
# dim at any SF); the lineitem-orders join is the only SF-proportional
# shuffle, left to AQE.
# --------------------------------------------------------------------------
@query(
    "q58_tpch_q7_shape",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l.l_shipdate) AS l_year,
               CAST(l.l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(12,2))) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
           OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    ) GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def q58(spark: SparkSession, sf: str) -> DataFrame:
    s = load_table(spark, sf, "supplier")
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    n1 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    )
    vol = F.col("l_extendedprice").cast("decimal(12,2)") * (
        1 - F.col("l_discount").cast("decimal(12,2)")
    )
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(vol).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# TPC-H Q12 shape (service levels): fact-fact join + CASE bucket counting —
# high- vs low-priority line counts per return flag. (The testdata carries
# no l_shipmode/receiptdate, so the bucket predicate adapts to priorities;
# the plan shape — big join + conditional agg — is Q12's.)
# --------------------------------------------------------------------------
@query(
    "q59_tpch_q12_shape",
    oracle="""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate
    GROUP BY 1 ORDER BY 1
    """,
)
def q59(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(hi.cast("bigint")).alias("high_line_count"),
            F.sum((~hi).cast("bigint")).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# TPC-H Q14 shape (promo revenue ratio): fact x dim join + a ratio of two
# conditional decimal sums. Both sums are exact decimals cast to double
# before ONE division — identical IEEE inputs, identical quotient.
# --------------------------------------------------------------------------
@query(
    "q60_tpch_q14_shape",
    oracle=f"""
    WITH s AS (
        SELECT
            CAST(sum(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(12,2)))
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo,
            CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS total
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE year(l.l_shipdate) = 1996
    )
    SELECT {round4_sql("100.0 * promo / total")} AS promo_revenue_pct FROM s
    """,
)
def q60(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").filter(F.year("l_shipdate") == 1996)
    p = load_table(spark, sf, "part")
    vol = F.col("l_extendedprice").cast("decimal(12,2)") * (
        1 - F.col("l_discount").cast("decimal(12,2)")
    )
    promo_vol = F.when(F.col("p_type") == "PROMO", vol).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    agg = li.join(p, li.l_partkey == p.p_partkey).agg(
        F.sum(promo_vol).cast("double").alias("promo"),
        F.sum(vol).cast("double").alias("total"),
    )
    return agg.select(
        round_half_up(100.0 * F.col("promo") / F.col("total"), 4).alias(
            "promo_revenue_pct"
        )
    )


# --------------------------------------------------------------------------
# Window distribution functions: percent_rank / cume_dist / nth_value —
# the last window family not yet pinned (q16 running frames, q25 lag/lead,
# q26 rank/ntile, q46 RANGE frames). Ratios are exact integer-count
# divisions (identical IEEE), so no rounding dance is needed beyond the
# final guard.
# --------------------------------------------------------------------------
@query(
    "q75_window_distribution",
    oracle=f"""
    SELECT c_custkey, c_nationkey,
           {round4_sql("percent_rank() OVER w")} AS pr,
           {round4_sql("cume_dist() OVER w")} AS cd,
           nth_value(c_custkey, 2) OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS second_richest
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_custkey
    """,
)
def q75(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), "c_custkey"
    )
    wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return cust.select(
        "c_custkey",
        "c_nationkey",
        round_half_up(F.percent_rank().over(w), 4).alias("pr"),
        round_half_up(F.cume_dist().over(w), 4).alias("cd"),
        F.nth_value("c_custkey", 2).over(wrows).alias("second_richest"),
    ).orderBy("c_custkey")


# --------------------------------------------------------------------------
# Behavioral path analysis: per-user event-type bigrams (which action
# follows which) — the sequence-mining primitive under funnels (q53) and
# sessionization (q44). Order within a user is (ts, event_id) — total, so
# both engines walk identical sequences. One window shuffle on user_id,
# then a plain hash agg on the bigram.
# --------------------------------------------------------------------------
@query(
    "q76_event_bigrams",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events
    )
    SELECT event_type, next_type, count(*) AS transitions
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1, 2 ORDER BY transitions DESC, event_type, next_type
    """,
)
def q76(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("transitions"))
        .orderBy(F.desc("transitions"), "event_type", "next_type")
    )


# --------------------------------------------------------------------------
# Growth analytics: month-over-month revenue with pct change — lag over an
# AGGREGATED frame (the two-level window-after-groupBy shape). Months are
# epoch-truncated bigints (engine-neutral); revenue is the exact decimal
# sum; the pct ratio divides two identical doubles, then one round4.
# --------------------------------------------------------------------------
@query(
    "q77_mom_growth",
    oracle=f"""
    WITH m AS (
        SELECT CAST(floor(epoch(date_trunc('month', o_orderdate))) AS BIGINT)
                   AS month_epoch,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                   AS revenue
        FROM orders GROUP BY 1
    )
    SELECT month_epoch, revenue,
           {round4_sql("CASE WHEN lag(revenue) OVER (ORDER BY month_epoch) IS NULL THEN NULL ELSE 100.0 * (revenue - lag(revenue) OVER (ORDER BY month_epoch)) / lag(revenue) OVER (ORDER BY month_epoch) END")}
               AS mom_pct
    FROM m ORDER BY month_epoch
    """,
)
def q77(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    m = o.groupBy(
        F.date_trunc("month", "o_orderdate")
        .cast("timestamp")
        .cast("long")
        .alias("month_epoch")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("revenue")
    )
    w = Window.orderBy("month_epoch")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month_epoch",
        "revenue",
        F.when(
            prev.isNotNull(),
            round_half_up(F.lit(100.0) * (F.col("revenue") - prev) / prev, 4),
        ).alias("mom_pct"),
    ).orderBy("month_epoch")


# --------------------------------------------------------------------------
# Bounded-lookback EWMA (operators/timeseries.ewma_bounded): the smoothing
# signal next to q56's rolling z-score; 8-lag truncation keeps it a fixed
# window expression (<6% of the weight beyond the horizon at alpha=0.3),
# and early rows renormalize over the lags that exist. Numerator and
# denominator are fixed-order +/* chains with shared float-literal
# weights, so the value hashes identically across engines.
# --------------------------------------------------------------------------
@query(
    "ts_ewma_bounded",
    oracle="""
    WITH w AS (
        SELECT user_id, event_id,
               ((CASE WHEN CAST(value AS DOUBLE) IS NOT NULL THEN CAST(value AS DOUBLE) * 1.0 ELSE 0.0 END) + (CASE WHEN lag(CAST(value AS DOUBLE), 1) OVER fr IS NOT NULL THEN lag(CAST(value AS DOUBLE), 1) OVER fr * 0.7 ELSE 0.0 END) + (CASE WHEN lag(CAST(value AS DOUBLE), 2) OVER fr IS NOT NULL THEN lag(CAST(value AS DOUBLE), 2) OVER fr * 0.48999999999999994 ELSE 0.0 END) + (CASE WHEN lag(CAST(value AS DOUBLE), 3) OVER fr IS NOT NULL THEN lag(CAST(value AS DOUBLE), 3) OVER fr * 0.3429999999999999 ELSE 0.0 END) + (CASE WHEN lag(CAST(value AS DOUBLE), 4) OVER fr IS NOT NULL THEN lag(CAST(value AS DOUBLE), 4) OVER fr * 0.24009999999999995 ELSE 0.0 END) + (CASE WHEN lag(CAST(value AS DOUBLE), 5) OVER fr IS NOT NULL THEN lag(CAST(value AS DOUBLE), 5) OVER fr * 0.16806999999999994 ELSE 0.0 END) + (CASE WHEN lag(CAST(value AS DOUBLE), 6) OVER fr IS NOT NULL THEN lag(CAST(value AS DOUBLE), 6) OVER fr * 0.11764899999999996 ELSE 0.0 END) + (CASE WHEN lag(CAST(value AS DOUBLE), 7) OVER fr IS NOT NULL THEN lag(CAST(value AS DOUBLE), 7) OVER fr * 0.08235429999999996 ELSE 0.0 END)) AS num, ((CASE WHEN CAST(value AS DOUBLE) IS NOT NULL THEN 1.0 ELSE 0.0 END) + (CASE WHEN lag(CAST(value AS DOUBLE), 1) OVER fr IS NOT NULL THEN 0.7 ELSE 0.0 END) + (CASE WHEN lag(CAST(value AS DOUBLE), 2) OVER fr IS NOT NULL THEN 0.48999999999999994 ELSE 0.0 END) + (CASE WHEN lag(CAST(value AS DOUBLE), 3) OVER fr IS NOT NULL THEN 0.3429999999999999 ELSE 0.0 END) + (CASE WHEN lag(CAST(value AS DOUBLE), 4) OVER fr IS NOT NULL THEN 0.24009999999999995 ELSE 0.0 END) + (CASE WHEN lag(CAST(value AS DOUBLE), 5) OVER fr IS NOT NULL THEN 0.16806999999999994 ELSE 0.0 END) + (CASE WHEN lag(CAST(value AS DOUBLE), 6) OVER fr IS NOT NULL THEN 0.11764899999999996 ELSE 0.0 END) + (CASE WHEN lag(CAST(value AS DOUBLE), 7) OVER fr IS NOT NULL THEN 0.08235429999999996 ELSE 0.0 END)) AS den
        FROM events
        WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           floor(num / den * 10000 + 0.5) / 10000.0 AS ewma
    FROM w ORDER BY user_id, event_id
""",
)
def ts_ewma_bounded(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.timeseries import ewma_bounded

    ev = load_table(spark, sf, "events").select("user_id", "ts", "event_id", "value")
    out = ewma_bounded(ev, ["user_id"], ["ts", "event_id"], "value",
                       alpha=0.3, lookback=8)
    return out.select(
        "user_id",
        "event_id",
        round_half_up(F.col("ewma"), 4).alias("ewma"),
    ).orderBy("user_id", "event_id")


# --------------------------------------------------------------------------
# Two-sided CUSUM drift detection (operators/timeseries.cusum_changepoints):
# the sequential detector that catches small PERSISTENT shifts a rolling
# zscore (q56) misses. max(0, S+y) recurrences reduce to prefix-sum minus
# running-min — four running-frame window expressions over ONE key
# shuffle. Exact integer micro-units end-to-end (the graph/quantile
# recipe), so every statistic value-hashes bit-for-bit.
# --------------------------------------------------------------------------
@query(
    "ts_cusum_changepoints",
    oracle="""
    WITH u AS (
        SELECT user_id, event_id, ts,
               CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5)
                    AS BIGINT) AS uu
        FROM events WHERE value IS NOT NULL
    ),
    m AS (
        SELECT *, CAST(floor(CAST(SUM(uu) OVER pk AS DOUBLE)
                   / CAST(COUNT(*) OVER pk AS DOUBLE) + 0.5) AS BIGINT) AS mu
        FROM u WINDOW pk AS (PARTITION BY user_id)
    ),
    p AS (
        SELECT user_id, event_id, ts,
               SUM(uu - mu - 5000000) OVER w AS pp,
               SUM(mu - 5000000 - uu) OVER w AS qq
        FROM m WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    s AS (
        SELECT user_id, event_id,
               pp - LEAST(CAST(0 AS BIGINT), MIN(pp) OVER w) AS sp,
               qq - LEAST(CAST(0 AS BIGINT), MIN(qq) OVER w) AS sn
        FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id,
           CAST(sp AS DOUBLE) / 1000000.0 AS cusum_pos,
           CAST(sn AS DOUBLE) / 1000000.0 AS cusum_neg,
           (sp > 50000000 OR sn > 50000000) AS is_change
    FROM s ORDER BY user_id, event_id
""",
)
def ts_cusum_changepoints(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.timeseries import cusum_changepoints

    ev = load_table(spark, sf, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    out = cusum_changepoints(
        ev, "value", ["user_id"], ["ts", "event_id"],
        allowance=5.0, threshold=50.0,
    )
    return out.select(
        "user_id", "event_id", "cusum_pos", "cusum_neg", "is_change"
    ).orderBy("user_id", "event_id")


# --------------------------------------------------------------------------
# OHLC resampling (operators/timeseries.ohlc_bars): per-event-type daily
# bars. The rank window and the aggregation share one (key,bucket)
# partitioning — a single Exchange; values pass through untouched, the
# volume sum is exact centi-units.
# --------------------------------------------------------------------------
@query(
    "ts_ohlc_bars",
    oracle="""
    WITH b AS (
        SELECT event_type, event_id, value, epoch_us(ts) AS t,
               (epoch_us(ts) // 86400000000) AS bucket_start
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    r AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY event_type, bucket_start
                                  ORDER BY t, event_id) AS rf,
               ROW_NUMBER() OVER (PARTITION BY event_type, bucket_start
                                  ORDER BY t DESC, event_id DESC) AS rl
        FROM b
    )
    SELECT event_type, bucket_start,
           MAX(CASE WHEN rf = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rl = 1 THEN value END) AS close,
           COUNT(*) AS n,
           CAST(SUM(CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 100.0 AS volume
    FROM r GROUP BY 1, 2 ORDER BY event_type, bucket_start
""",
)
def ts_ohlc_bars(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.timeseries import ohlc_bars

    ev = load_table(spark, sf, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    return ohlc_bars(
        ev, ["event_type"], "ts", "value", 86400, ["event_id"]
    ).orderBy("event_type", "bucket_start")


# --------------------------------------------------------------------------
# Time-weighted average (operators/timeseries.time_weighted_avg): per-user
# TWAP of the event value — the correct mean for irregular sampling.
# Exact integer-microsecond durations, exact DECIMAL(38,0) weighted sums,
# one mirrored division chain.
# --------------------------------------------------------------------------
@query(
    "ts_time_weighted_avg",
    oracle="""
    WITH b AS (
        SELECT user_id, event_id, epoch_us(ts) AS t,
               CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5)
                    AS BIGINT) AS cu
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    l AS (
        SELECT user_id, cu,
               COALESCE(LEAD(t) OVER (PARTITION BY user_id
                                      ORDER BY t, event_id) - t,
                        0) AS dur
        FROM b
    ),
    a AS (
        SELECT user_id, COUNT(*) AS n,
               CAST(SUM(dur) AS BIGINT) AS span,
               SUM(CAST(cu AS DECIMAL(38,0))
                   * CAST(dur AS DECIMAL(38,0))) AS num
        FROM l GROUP BY 1
    )
    SELECT user_id, n,
           CAST(span AS DOUBLE) / 1000000.0 AS span_seconds,
           floor((CAST(num AS DOUBLE) / CAST(span AS DOUBLE) / 100.0)
                 * 1000000 + 0.5) / 1000000.0 AS twap
    FROM a WHERE span > 0 ORDER BY user_id
""",
)
def ts_time_weighted_avg(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.timeseries import time_weighted_avg

    ev = load_table(spark, sf, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    return time_weighted_avg(
        ev, ["user_id"], "ts", "value", ["event_id"]
    ).orderBy("user_id")


# --------------------------------------------------------------------------
# Daily-series autocorrelation (operators/timeseries.acf_report): does
# yesterday's per-type mean value predict today's, at lags 1-3? The
# series is the per-(type, day) mean fixed to centi-units (one exact
# BIGINT sum/count then a single mirrored division+floor), the ACF is
# the standard global-mean estimator expanded to exact BIGINT moment
# products — one window sort per type computes all lags in one pass.
# --------------------------------------------------------------------------
def _acf_oracle() -> str:
    den = "(n * (n * sxx - s * s))"

    def lag_select(ll: int) -> str:
        num = (
            f"(n * n * sxy{ll} - n * s * (sa{ll} + sb{ll})"
            f" + m{ll} * s * s)"
        )
        acf = f"CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE)"
        return f"""
        SELECT event_type, n, {ll} AS lag, m{ll} AS n_pairs,
               floor(({acf}) * 1000000 + 0.5) / 1000000.0 AS acf
        FROM a WHERE {den} != 0 AND m{ll} >= 1"""

    sides = " UNION ALL ".join(lag_select(ll) for ll in (1, 2, 3))
    lag_aggs = ", ".join(
        f"CAST(COUNT(x{ll}) AS BIGINT) AS m{ll},"
        f" CAST(SUM(x * x{ll}) AS BIGINT) AS sxy{ll},"
        f" CAST(SUM(CASE WHEN x{ll} IS NOT NULL THEN x END)"
        f" AS BIGINT) AS sa{ll},"
        f" CAST(SUM(x{ll}) AS BIGINT) AS sb{ll}"
        for ll in (1, 2, 3)
    )
    lag_cols = ", ".join(
        f"lag(x, {ll}) OVER w AS x{ll}" for ll in (1, 2, 3)
    )
    return f"""
    WITH u AS (
        SELECT event_type, (epoch_us(ts) // 86400000000) AS day,
               CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5)
                    AS BIGINT) AS uu
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    d AS (
        SELECT event_type, day,
               CAST(floor(CAST(SUM(uu) AS DOUBLE)
                    / CAST(COUNT(*) AS DOUBLE) + 0.5) AS BIGINT) AS x
        FROM u GROUP BY 1, 2
    ),
    l AS (
        SELECT event_type, x, {lag_cols}
        FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    a AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS s,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               {lag_aggs}
        FROM l GROUP BY 1
    )
    SELECT * FROM ({sides}) ORDER BY event_type, lag
"""


@query("ts_acf_daily", oracle=_acf_oracle())
def ts_acf_daily(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.timeseries import acf_report

    ev = (
        load_table(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr("unix_micros(ts) DIV 86400000000").alias("day"),
            F.floor(
                F.col("value").cast("double") * F.lit(100.0) + F.lit(0.5)
            ).cast("bigint").alias("uu"),
        )
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.sum("uu").alias("su"), F.count(F.lit(1)).alias("cnt")
    )
    series = daily.select(
        "event_type",
        "day",
        F.floor(
            F.col("su").cast("double") / F.col("cnt").cast("double")
            + F.lit(0.5)
        ).cast("bigint").alias("x"),
    )
    return acf_report(
        series, ["event_type"], "day", "x", lags=(1, 2, 3)
    ).orderBy("event_type", "lag")


# --------------------------------------------------------------------------
# Pairwise association rules (operators/assoc.association_rules): which
# event types co-occur within a (user, day) session basket, with
# support/confidence/lift. Rare items pruned BEFORE the quadratic
# per-basket pair join (Apriori bound); jumbo baskets droppable via
# max_basket_items. Exact BIGINT basket counts, mirrored divisions, 6dp.
# --------------------------------------------------------------------------
def _assoc_r6(expr: str) -> str:
    return f"floor(({expr}) * 1000000 + 0.5) / 1000000.0"


def _assoc_oracle() -> str:
    nb = "CAST((SELECT n FROM nb) AS BIGINT)"
    cabd = "CAST(cab AS DOUBLE)"
    return f"""
    WITH items AS (
        SELECT DISTINCT user_id, (epoch_us(ts) // 86400000000) AS day,
               event_type AS i
        FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
    ),
    nb AS (
        SELECT COUNT(*) AS n
        FROM (SELECT DISTINCT user_id, day FROM items)
    ),
    ic AS (SELECT i, COUNT(*) AS c FROM items GROUP BY 1),
    pairs AS (
        SELECT a.i AS ia, b.i AS ib, COUNT(*) AS cab
        FROM items a
        JOIN items b ON a.user_id = b.user_id AND a.day = b.day
                    AND a.i < b.i
        GROUP BY 1, 2
    )
    SELECT ia AS item_a, ib AS item_b, {nb} AS n_baskets,
           ca.c AS cnt_a, cb.c AS cnt_b, cab AS cnt_ab,
           {_assoc_r6(f"{cabd} / CAST((SELECT n FROM nb) AS DOUBLE)")}
               AS support,
           {_assoc_r6(f"{cabd} / CAST(ca.c AS DOUBLE)")} AS conf_a_b,
           {_assoc_r6(f"{cabd} / CAST(cb.c AS DOUBLE)")} AS conf_b_a,
           {_assoc_r6(
               f"CAST({nb} * cab AS DOUBLE)"
               f" / CAST(ca.c * cb.c AS DOUBLE)"
           )} AS lift
    FROM pairs
    JOIN ic ca ON ca.i = pairs.ia
    JOIN ic cb ON cb.i = pairs.ib
    ORDER BY item_a, item_b
"""


@query("q80_assoc_rules", oracle=_assoc_oracle())
def q80_assoc_rules(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.assoc import association_rules

    ev = (
        load_table(spark, sf, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "user_id",
            F.expr("unix_micros(ts) DIV 86400000000").alias("day"),
            "event_type",
        )
    )
    return association_rules(ev, ["user_id", "day"], "event_type").orderBy(
        "item_a", "item_b"
    )


# --------------------------------------------------------------------------
# Seasonal-naive forecast baseline (operators/timeseries.
# seasonal_naive_error): per-type error of "this day = same day last
# week" over the daily mean series — the floor a real model must beat
# and the cheapest weekly-seasonality strength readout. Exact BIGINT
# MAE/bias; MAPE terms 6dp-fixed to DECIMAL before the exact sum.
# --------------------------------------------------------------------------
def _snaive_oracle() -> str:
    r6 = _assoc_r6
    return f"""
    WITH u AS (
        SELECT event_type, (epoch_us(ts) // 86400000000) AS day,
               CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5)
                    AS BIGINT) AS uu
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    d AS (
        SELECT event_type, day,
               CAST(floor(CAST(SUM(uu) AS DOUBLE)
                    / CAST(COUNT(*) AS DOUBLE) + 0.5) AS BIGINT) AS x
        FROM u GROUP BY 1, 2
    ),
    l AS (
        SELECT event_type, x,
               lag(x, 7) OVER (PARTITION BY event_type ORDER BY day) AS f
        FROM d
    ),
    a AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN f IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS m,
               CAST(SUM(CASE WHEN f IS NOT NULL THEN abs(x - f) END)
                    AS BIGINT) AS sae,
               CAST(SUM(CASE WHEN f IS NOT NULL THEN x - f END)
                    AS BIGINT) AS se,
               CAST(SUM(CASE WHEN f IS NOT NULL AND x != 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS mnz,
               SUM(CASE WHEN f IS NOT NULL AND x != 0 THEN
                   CAST(floor(CAST(abs(x - f) AS DOUBLE)
                        / CAST(abs(x) AS DOUBLE) * 1000000 + 0.5)
                        / 1000000.0 AS DECIMAL(38,6)) END) AS sape
        FROM l GROUP BY 1
    )
    SELECT event_type, n, m AS n_pairs,
           {r6('CAST(sae AS DOUBLE) / CAST(m AS DOUBLE)')} AS mae,
           {r6('CAST(se AS DOUBLE) / CAST(m AS DOUBLE)')} AS bias,
           CASE WHEN mnz >= 1 THEN
               {r6('CAST(sape AS DOUBLE) / CAST(mnz AS DOUBLE)')}
           END AS mape
    FROM a WHERE m >= 1 ORDER BY event_type
"""


@query("ts_seasonal_naive", oracle=_snaive_oracle())
def ts_seasonal_naive(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.timeseries import seasonal_naive_error

    ev = (
        load_table(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr("unix_micros(ts) DIV 86400000000").alias("day"),
            F.floor(
                F.col("value").cast("double") * F.lit(100.0) + F.lit(0.5)
            ).cast("bigint").alias("uu"),
        )
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.sum("uu").alias("su"), F.count(F.lit(1)).alias("cnt")
    )
    series = daily.select(
        "event_type",
        "day",
        F.floor(
            F.col("su").cast("double") / F.col("cnt").cast("double")
            + F.lit(0.5)
        ).cast("bigint").alias("x"),
    )
    return seasonal_naive_error(
        series, ["event_type"], "day", "x", season=7
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Theil-Sen robust trend (operators/timeseries.theil_sen_trend): median
# of pairwise slopes over the daily grid — the 29%-breakdown trend twin
# of stats_group_ols (one bad day cannot bend it). Quadratic ONLY in
# the bounded grid (guarded by a limit-probe fail-stop); position-based
# median, mirrored division, 6dp.
# --------------------------------------------------------------------------
def _theil_sen_oracle() -> str:
    return f"""
    WITH u AS (
        SELECT event_type, (epoch_us(ts) // 86400000000) AS day,
               CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5)
                    AS BIGINT) AS uu
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    d AS (
        SELECT event_type, day,
               CAST(floor(CAST(SUM(uu) AS DOUBLE)
                    / CAST(COUNT(*) AS DOUBLE) + 0.5) AS BIGINT) AS x
        FROM u GROUP BY 1, 2
    ),
    np AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_points
        FROM d GROUP BY 1
    ),
    sl AS (
        SELECT a.event_type,
               CAST(b.x - a.x AS DOUBLE)
               / CAST(b.day - a.day AS DOUBLE) AS s
        FROM d a JOIN d b ON a.event_type = b.event_type
                         AND a.day < b.day
    ),
    r AS (
        SELECT event_type, s,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY s)
                   AS rn,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                   AS m
        FROM sl
    ),
    mid AS (
        SELECT event_type, MAX(m) AS m,
               SUM(s) / COUNT(*) AS med
        FROM r
        WHERE rn = CAST(floor((m + 1) / 2) AS BIGINT)
           OR rn = CAST(floor(m / 2) AS BIGINT) + 1
        GROUP BY 1
    )
    SELECT mid.event_type AS event_type, np.n_points, mid.m AS n_pairs,
           floor(med * 1000000 + 0.5) / 1000000.0 AS slope
    FROM mid JOIN np ON np.event_type = mid.event_type
    ORDER BY mid.event_type
"""


@query("ts_theil_sen", oracle=_theil_sen_oracle())
def ts_theil_sen(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.timeseries import theil_sen_trend

    ev = (
        load_table(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr("unix_micros(ts) DIV 86400000000").alias("day"),
            F.floor(
                F.col("value").cast("double") * F.lit(100.0) + F.lit(0.5)
            ).cast("bigint").alias("uu"),
        )
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.sum("uu").alias("su"), F.count(F.lit(1)).alias("cnt")
    )
    series = daily.select(
        "event_type",
        "day",
        F.floor(
            F.col("su").cast("double") / F.col("cnt").cast("double")
            + F.lit(0.5)
        ).cast("bigint").alias("x"),
    )
    return theil_sen_trend(series, ["event_type"], "day", "x").orderBy(
        "event_type"
    )


# --------------------------------------------------------------------------
# Weekday seasonal indices (operators/timeseries.weekday_seasonal_index):
# each weekday's mean value vs the type's overall mean — the weekly
# seasonality profile, weekday derived by pure integer arithmetic
# ((day + 3) mod 7; 1970-01-01 = Thursday), no calendar functions.
# Exact cross-multiplied ratio, 6dp.
# --------------------------------------------------------------------------
def _weekday_oracle() -> str:
    r6 = _assoc_r6
    return f"""
    WITH u AS (
        SELECT event_type, (epoch_us(ts) // 86400000000) AS day,
               CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5)
                    AS BIGINT) AS uu
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    b AS (SELECT event_type, (day + 3) % 7 AS wd, uu FROM u),
    per AS (
        SELECT event_type, wd, CAST(COUNT(*) AS BIGINT) AS nw,
               CAST(SUM(uu) AS BIGINT) AS sw
        FROM b GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, wd, nw, sw,
               CAST(SUM(nw) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n,
               CAST(SUM(sw) OVER (PARTITION BY event_type) AS BIGINT)
                   AS s
        FROM per
    )
    SELECT event_type, wd AS weekday, nw AS n,
           {r6('CAST(sw AS DOUBLE) / CAST(nw AS DOUBLE)')} AS mean,
           CASE WHEN s != 0 THEN
               {r6('CAST(sw * n AS DOUBLE) / CAST(nw * s AS DOUBLE)')}
           END AS seasonal_index
    FROM tot ORDER BY event_type, weekday
"""


@query("ts_weekday_index", oracle=_weekday_oracle())
def ts_weekday_index(spark: SparkSession, sf: str) -> DataFrame:
    from momyre_spark.operators.timeseries import weekday_seasonal_index

    ev = (
        load_table(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr("unix_micros(ts) DIV 86400000000").alias("day"),
            F.floor(
                F.col("value").cast("double") * F.lit(100.0) + F.lit(0.5)
            ).cast("bigint").alias("uu"),
        )
    )
    return weekday_seasonal_index(
        ev, ["event_type"], "day", "uu"
    ).orderBy("event_type", "weekday")
