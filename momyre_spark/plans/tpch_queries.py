"""TPC-H shape completion: the 16 query shapes (Q2, Q4, Q6, Q8-Q11, Q13,
Q15-Q22) not already covered by core/analytics queries (Q1 -> q11, Q3 ->
q32, Q5 -> q33, Q7 -> q58, Q12 -> q59, Q14 -> q60). With this module the
engine pins every TPC-H access pattern — all 22: correlated min (Q2),
EXISTS with a date offset (Q4), pure scan-filter-aggregate (Q6), market
share conditional-sum ratio (Q8), multi-way profit rollup (Q9), top-k
revenue report (Q10), global-threshold scalar subquery (Q11), outer-join
count distribution (Q13), argmax-by-aggregate (Q15), NOT IN +
count-distinct (Q16), per-group-average correlated filter (Q17),
HAVING-IN join-back (Q18), disjunctive multi-column OR predicates (Q19),
nested IN chain (Q20), waiting-supplier multi-EXISTS (Q21), and anti-join
+ scalar-average threshold (Q22).

Schema adaptations (testdata has no partsupp / shipmode / receiptdate /
phone): the distinct (l_partkey, l_suppkey) projection of lineitem stands
in for partsupp, l_shipdate vs o_orderdate + INTERVAL stands in for
receipt-vs-commit lateness, and c_mktsegment stands in for the phone
country code. Every query keeps the original's plan shape — that is what
is being pinned, not the constants.

Determinism rules as elsewhere: money math in DECIMAL(12,2) (exact,
order-independent sums) surfaced as DOUBLE only at the end; integral-valued
DOUBLE sums (l_quantity in 1..50) are exact in IEEE; every result totally
ordered with key tiebreaks.

Scale notes (100 TB lens): small dims (region, nation, supplier at ref
scale) broadcast; fact-fact joins shuffle on their keys and are left to AQE;
scalar thresholds computed as 1-row aggregates and broadcast-crossed, never
collected; Q17/Q21 use the two-aggregation reformulation (per-group
threshold / per-order stats + join back) instead of correlated per-row
subqueries, which is the distributed-friendly plan Catalyst would otherwise
have to derive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from momyre_spark.functions.numeric import round4_sql, round_half_up
from momyre_spark.plans import query
from momyre_spark.sources.parquet import load_table


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(12,2)")


_VOL = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))"


def _vol() -> F.Column:
    return _dec("l_extendedprice") * (1 - _dec("l_discount"))


# --------------------------------------------------------------------------
# Q2 shape: min-cost supplier. partsupp stand-in = DISTINCT (part, supp)
# pairs from lineitem; "cost" = s_acctbal. Correlated min resolved as
# groupBy-min + join-back (one shuffle on p_partkey, no per-row subquery).
# --------------------------------------------------------------------------
@query(
    "q61_tpch_q2_shape",
    oracle="""
    WITH sp AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    eligible AS (
        SELECT p.p_partkey, p.p_name, s.s_name, s.s_acctbal
        FROM sp
        JOIN part p ON p.p_partkey = sp.l_partkey
        JOIN supplier s ON s.s_suppkey = sp.l_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE' AND p.p_type = 'LARGE' AND p.p_size <= 15
    )
    SELECT e.p_partkey, e.p_name, e.s_name, e.s_acctbal
    FROM eligible e
    JOIN (SELECT p_partkey, min(s_acctbal) AS min_bal
          FROM eligible GROUP BY 1) m
      ON e.p_partkey = m.p_partkey AND e.s_acctbal = m.min_bal
    ORDER BY e.p_partkey, e.s_name
    """,
)
def q61(spark: SparkSession, sf: str) -> DataFrame:
    sp = (
        load_table(spark, sf, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = load_table(spark, sf, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 15)
    )
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (
        sp.join(p, sp.l_partkey == p.p_partkey)
        .join(F.broadcast(s), sp.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("p_partkey", "p_name", "s_name", "s_acctbal")
    )
    mins = eligible.groupBy(
        F.col("p_partkey").alias("m_partkey")
    ).agg(F.min("s_acctbal").alias("min_bal"))
    return (
        eligible.join(
            mins,
            (F.col("p_partkey") == F.col("m_partkey"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .select("p_partkey", "p_name", "s_name", "s_acctbal")
        .orderBy("p_partkey", "s_name")
    )


# --------------------------------------------------------------------------
# Q4 shape: order-priority checking. EXISTS(line shipped >30 days after
# order date) -> left-semi join with an inequality residual; counts per
# priority. receiptdate>commitdate stand-in: l_shipdate > o_orderdate + 30d.
# --------------------------------------------------------------------------
@query(
    "q62_tpch_q4_shape",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY 1 ORDER BY 1
    """,
)
def q62(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q9 shape: product-type profit rollup. supplycost stand-in = 10% of
# p_retailprice. Profit per line = volume - 0.1*retail*qty, grouped by the
# supplier's nation and order year. All money math exact decimal.
# --------------------------------------------------------------------------
@query(
    "q63_tpch_q9_shape",
    oracle=f"""
    SELECT n.n_name AS nation,
           year(o.o_orderdate) AS o_year,
           CAST(sum(
               CAST({_VOL} AS DECIMAL(18,4))
               - CAST(CAST(p.p_retailprice AS DECIMAL(12,2))
                      * CAST(l.l_quantity AS DECIMAL(12,2))
                      * CAST(0.1 AS DECIMAL(3,1)) AS DECIMAL(18,4))
           ) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q63(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    o = load_table(spark, sf, "orders")
    cost = (
        _dec("p_retailprice")
        * _dec("l_quantity")
        * F.lit(0.1).cast("decimal(3,1)")
    ).cast("decimal(18,4)")
    profit = _vol().cast("decimal(18,4)") - cost
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
        .orderBy("nation", "o_year")
    )


# --------------------------------------------------------------------------
# Q10 shape: returned-item report — top 20 customers by revenue lost to
# returns in a quarter. Revenue is the exact-decimal sum; the top-k is a
# TakeOrderedAndProject with c_custkey tiebreak.
# --------------------------------------------------------------------------
@query(
    "q64_tpch_q10_shape",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(sum({_VOL}) AS DOUBLE) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
    GROUP BY 1, 2, 4
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q64(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf, "nation")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_vol()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q11 shape: important stock — per-part value from one nation's suppliers,
# kept only above a fraction of the GLOBAL total. The threshold is a 1-row
# aggregate broadcast-crossed against the grouped frame (never collected);
# both sides stay exact decimal so the comparison is engine-identical.
# --------------------------------------------------------------------------
@query(
    "q65_tpch_q11_shape",
    oracle="""
    WITH v AS (
        SELECT l.l_partkey,
               sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_3'
        GROUP BY 1
    )
    SELECT l_partkey, CAST(value AS DOUBLE) AS value
    FROM v
    WHERE value > (SELECT sum(value) * CAST(0.001 AS DECIMAL(4,3)) FROM v)
    ORDER BY value DESC, l_partkey
    """,
)
def q65(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
    v = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("value"))
    )
    thr = v.agg(
        (F.sum("value") * F.lit(0.001).cast("decimal(4,3)")).alias("__thr")
    )
    return (
        v.join(F.broadcast(thr))
        .filter(F.col("value") > F.col("__thr"))
        .select("l_partkey", F.col("value").cast("double").alias("value"))
        .orderBy(F.desc("value"), "l_partkey")
    )


# --------------------------------------------------------------------------
# Q13 shape: customer order-count distribution. LEFT OUTER join with an
# extra join-side predicate (so customers keep their zero), two stacked
# aggregations.
# --------------------------------------------------------------------------
@query(
    "q66_tpch_q13_shape",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                          AND o.o_orderpriority <> '5-LOW'
        GROUP BY 1
    )
    GROUP BY 1 ORDER BY custdist DESC, c_count DESC
    """,
)
def q66(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey)
            & (o.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------------
# Q15 shape: top supplier — argmax by aggregated revenue. The max is a
# 1-row aggregate broadcast back; equality is on the exact decimal sum, so
# ties (all argmax rows) surface deterministically.
# --------------------------------------------------------------------------
@query(
    "q67_tpch_q15_shape",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey, sum({_VOL}) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def q67(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_vol()).alias("total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    s = load_table(spark, sf, "supplier")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q16 shape: parts/supplier relationship — NOT IN excluded suppliers, then
# count(DISTINCT supplier) per (brand, type, size) bucket. partsupp stand-in
# = distinct lineitem pairs; excluded set = negative-balance suppliers.
# --------------------------------------------------------------------------
@query(
    "q68_tpch_q16_shape",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT sp.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) sp
    JOIN part p ON p.p_partkey = sp.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND sp.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q68(spark: SparkSession, sf: str) -> DataFrame:
    sp = (
        load_table(spark, sf, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = load_table(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad = load_table(spark, sf, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        sp.join(F.broadcast(bad), sp.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), sp.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# Q17 shape: small-quantity-order revenue. The correlated per-part average
# is reformulated distributed-style: per-part thresholds from ONE grouped
# aggregation, joined back to the lines. l_quantity is integral-valued so
# the double sum/count is exact on both engines; one final round4 guards
# the division.
# --------------------------------------------------------------------------
@query(
    "q69_tpch_q17_shape",
    oracle=f"""
    WITH thr AS (
        SELECT l_partkey,
               0.2 * (sum(l_quantity) / count(l_quantity)) AS qty_thr
        FROM lineitem GROUP BY 1
    )
    SELECT {round4_sql("CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0")}
           AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN thr t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND l.l_quantity < t.qty_thr
    """,
)
def q69(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    thr = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.lit(0.2) * (F.sum("l_quantity") / F.count("l_quantity"))
        ).alias("qty_thr")
    )
    p = load_table(spark, sf, "part").filter(F.col("p_brand") == "Brand#3")
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thr, li.l_partkey == thr.t_partkey)
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(F.sum(_dec("l_extendedprice")).cast("double").alias("__s"))
    )
    return agg.select(
        round_half_up(F.col("__s") / 7.0, 4).alias("avg_yearly")
    )


# --------------------------------------------------------------------------
# Q18 shape: large-volume customers — orders HAVING sum(qty) above a
# threshold, joined back for the customer report. Integral-double qty sums
# are exact; top-100 with (o_totalprice DESC, o_orderkey) tiebreak.
# --------------------------------------------------------------------------
@query(
    "q70_tpch_q18_shape",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(floor(epoch(o.o_orderdate)) AS BIGINT) AS o_orderdate_epoch,
           o.o_totalprice, CAST(sum(l.l_quantity) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150)
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def q70(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 150)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return (
        o.join(big, o.o_orderkey == big.big_orderkey, "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp").cast("long").alias("o_orderdate_epoch"),
            "o_totalprice",
        )
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q19 shape: disjunctive predicates — three OR'd (brand, size-range,
# qty-range) conjuncts over the part join. Pins that the OR of sargable
# conjuncts still reaches the scan as one pushed filter.
# --------------------------------------------------------------------------
@query(
    "q71_tpch_q19_shape",
    oracle=f"""
    SELECT CAST(sum({_VOL}) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 20
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 40
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q71(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")

    def arm(brand: str, slo: int, shi: int, qlo: int, qhi: int) -> F.Column:
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(slo, shi)
            & F.col("l_quantity").between(qlo, qhi)
        )

    cond = (
        arm("Brand#1", 1, 10, 1, 20)
        | arm("Brand#2", 5, 20, 10, 30)
        | arm("Brand#3", 10, 40, 20, 50)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.sum(_vol()).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q20 shape: potential part promotion — nested IN chain: suppliers (in one
# nation) who shipped > 300 units of 'red%' parts. Both INs become semi
# joins; the inner HAVING is a grouped aggregate, not a correlated probe.
# --------------------------------------------------------------------------
@query(
    "q72_tpch_q20_shape",
    oracle="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_5'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'red%'
        GROUP BY 1 HAVING sum(l.l_quantity) > 300)
    ORDER BY s_name
    """,
)
def q72(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").filter(F.col("p_name").like("red%"))
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 300)
        .select("l_suppkey")
    )
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation").filter(F.col("n_name") == "NATION_5")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# Q21 shape: suppliers who kept orders waiting — the sole late supplier on
# a multi-supplier 'F' order. The classic EXISTS/NOT-EXISTS pair is
# reformulated as two aggregations (per-(order,supplier) late flag, then
# per-order supplier/late counts) + join back: one shuffle per agg, no
# nested correlated probes. Counted at order granularity.
# --------------------------------------------------------------------------
@query(
    "q73_tpch_q21_shape",
    oracle="""
    WITH ol AS (
        SELECT l.l_orderkey, l.l_suppkey,
               max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                   THEN 1 ELSE 0 END) AS late
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY 1, 2
    ),
    stats AS (
        SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
        FROM ol GROUP BY 1
    )
    SELECT s.s_name, count(*) AS numwait
    FROM ol
    JOIN stats USING (l_orderkey)
    JOIN supplier s ON s.s_suppkey = ol.l_suppkey
    WHERE ol.late = 1 AND stats.n_supp >= 2 AND stats.n_late = 1
    GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20
    """,
)
def q73(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    late_flag = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).cast("int")
    ol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late_flag).alias("late"))
    )
    stats = ol.groupBy(F.col("l_orderkey").alias("st_orderkey")).agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("late").alias("n_late")
    )
    s = load_table(spark, sf, "supplier")
    return (
        ol.join(stats, ol.l_orderkey == stats.st_orderkey)
        .filter(
            (F.col("late") == 1)
            & (F.col("n_supp") >= 2)
            & (F.col("n_late") == 1)
        )
        .join(F.broadcast(s), ol.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q22 shape: global sales opportunity — customers with no RECENT orders
# whose balance beats the positive-balance average, bucketed by market segment
# (phone-country-code stand-in). Anti-join + broadcast scalar threshold;
# the average is exact-decimal-sum / count cast through identical IEEE ops.
# --------------------------------------------------------------------------
@query(
    "q74_tpch_q22_shape",
    oracle="""
    WITH thr AS (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               / count(*) AS avg_bal
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment, count(*) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg_bal FROM thr)
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY 1 ORDER BY 1
    """,
)
def q74(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    thr = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    o = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Q6 shape: forecasting revenue change — the pure scan-filter-aggregate
# (no join at all); every predicate sargable and pushed. The simplest TPC-H
# query and the purest pushdown/codegen test.
# --------------------------------------------------------------------------
@query(
    "q78_tpch_q6_shape",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q78(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Q8 shape: national market share — one nation's volume fraction within a
# region's market per year. Conditional-sum ratio over a 6-way join; both
# sums exact decimal cast to double before ONE division per year.
# --------------------------------------------------------------------------
@query(
    "q79_tpch_q8_shape",
    oracle=f"""
    WITH all_nations AS (
        SELECT year(o.o_orderdate) AS o_year,
               CAST({_VOL} AS DECIMAL(18,4)) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n1.n_regionkey
        JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
    )
    SELECT o_year,
           {round4_sql(
               "CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume "
               "ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)"
               " / CAST(sum(volume) AS DOUBLE)")} AS mkt_share
    FROM all_nations GROUP BY 1 ORDER BY 1
    """,
)
def q79(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").filter(F.col("p_type") == "STANDARD")
    s = load_table(spark, sf, "supplier")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    n1 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"),
    )
    n2 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("supp_nation"),
    )
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    vol = _vol().cast("decimal(18,4)")
    nation_vol = F.when(
        F.col("supp_nation") == "NATION_7", F.col("volume")
    ).otherwise(F.lit(0).cast("decimal(18,4)"))
    an = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    return (
        an.groupBy("o_year")
        .agg(
            F.sum(nation_vol).cast("double").alias("__nat"),
            F.sum("volume").cast("double").alias("__all"),
        )
        .select(
            "o_year",
            round_half_up(F.col("__nat") / F.col("__all"), 4).alias(
                "mkt_share"
            ),
        )
        .orderBy("o_year")
    )
