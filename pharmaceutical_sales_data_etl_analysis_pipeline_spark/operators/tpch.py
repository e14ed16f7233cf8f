"""TPC-H classics reshaped onto the test corpus — the industry-standard
shapes a warehouse engine is judged by. Q1 (pricing summary: wide hash agg),
Q6 (filter-sum: pushdown + single agg), Q3 (shipping priority: join + agg +
top-k). Date cutoffs adapted to the corpus' 1995-2001 range.

Determinism: every SUM/AVG routes through DECIMAL (per-term rounding then
exact accumulation), so results are independent of partitioning and match
the oracle bit-for-bit; averages are decimal-sum / count divisions.

Plans to expect (guarded in tests/test_plans.py patterns): Q1/Q6 scan once
with predicate pushdown and aggregate partial+final; Q3 broadcasts customer,
shuffles lineitem⋈orders once, and plans TakeOrderedAndProject for the
top-10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

DEC = "decimal(28,6)"

Q1_CUTOFF = "2001-06-01"
Q6_YEAR = 1997
Q3_DATE = "1998-03-15"
Q3_SEGMENT = "BUILDING"


def _dsum(col, alias: str):
    return F.sum(col.cast(DEC)).cast("double").alias(alias)


def _davg(col, alias: str):
    return (
        F.sum(col.cast(DEC)).cast("double") / F.count(F.lit(1)).cast("double")
    ).alias(alias)


# ---------------------------------------------------------------------------
# Q1 — pricing summary report.
# ---------------------------------------------------------------------------

def tpch_q1(lineitem: DataFrame) -> DataFrame:
    price = F.col("l_extendedprice")
    disc_price = price * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(price, "sum_base_price"),
            _dsum(disc_price, "sum_disc_price"),
            _dsum(charge, "sum_charge"),
            _davg(F.col("l_quantity"), "avg_qty"),
            _davg(price, "avg_price"),
            _davg(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_q1(load_table(spark, sf_dir, "lineitem"))


SQL_TPCH_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change.
# ---------------------------------------------------------------------------

def tpch_q6(lineitem: DataFrame) -> DataFrame:
    return (
        lineitem.filter(
            (F.year("l_shipdate") == Q6_YEAR)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_q6(load_table(spark, sf_dir, "lineitem"))


SQL_TPCH_Q6 = f"""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM lineitem
WHERE year(l_shipdate) = {Q6_YEAR}
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q3 — shipping priority (top-10 unshipped orders by revenue).
# ---------------------------------------------------------------------------

def tpch_q3(customer: DataFrame, orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    cust = customer.filter(F.col("c_mktsegment") == Q3_SEGMENT).select("c_custkey")
    return (
        lineitem.filter(F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp"))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_q3(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


SQL_TPCH_Q3 = f"""
SELECT l_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
  AND l_shipdate > TIMESTAMP '{Q3_DATE} 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Table profiling: per-column nulls / distincts / extremes in one pass —
# the warehouse data-quality primitive.
# ---------------------------------------------------------------------------

def profile_orders(orders: DataFrame) -> DataFrame:
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    profiles = []
    for c in cols:
        profiles.append(
            orders.agg(
                F.lit(c).alias("column_name"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias("n_nulls"),
                F.countDistinct(c).cast("long").alias("n_distinct"),
                F.min(F.col(c).cast("string")).alias("min_str"),
                F.max(F.col(c).cast("string")).alias("max_str"),
            )
        )
    out = profiles[0]
    for p in profiles[1:]:
        out = out.unionByName(p)
    return out


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_orders(load_table(spark, sf_dir, "orders"))


def _profile_sql() -> str:
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    parts = [
        f"""SELECT '{c}' AS column_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       MIN(CAST({c} AS VARCHAR)) AS min_str,
       MAX(CAST({c} AS VARCHAR)) AS max_str
FROM orders"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)


SQL_PROFILE_ORDERS = _profile_sql()


# ---------------------------------------------------------------------------
# Q5 — local supplier volume: the 6-way join (region->nation->customer->
# orders->lineitem->supplier with the customer/supplier same-nation
# condition). Exercises Catalyst join ordering + dual broadcast.
# ---------------------------------------------------------------------------

Q5_REGION = "ASIA"
Q5_YEAR = 1996


def tpch_q5(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    nat = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == Q5_REGION)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    return (
        lineitem.join(
            orders.filter(F.year("o_orderdate") == Q5_YEAR),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              (F.col("o_custkey") == F.col("c_custkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_q5(
        load_table(spark, sf_dir, "region"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
    )


SQL_TPCH_Q5 = f"""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}' AND year(o_orderdate) = {Q5_YEAR}
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


# ---------------------------------------------------------------------------
# Q4 — order priority checking: EXISTS semi-join with a correlated
# predicate (a lineitem shipped after the order date).
# ---------------------------------------------------------------------------

Q4_YEAR = 1997


def tpch_q4(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    late_items = lineitem.select("l_orderkey", "l_shipdate")
    qualifying = (
        orders.filter(F.year("o_orderdate") == Q4_YEAR)
        .join(
            late_items,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
    )
    return (
        qualifying.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_q4(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


SQL_TPCH_Q4 = f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE year(o_orderdate) = {Q4_YEAR}
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q2-style correlated scalar subquery: suppliers offering a part at that
# part's minimum retail-weighted price — decorrelated as a per-group min
# join (window/groupBy min + equi-join back), the at-scale formulation.
# ---------------------------------------------------------------------------

def cheapest_supplier_per_part(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    offer = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("best_price")
    )
    part_min = offer.groupBy("l_partkey").agg(F.min("best_price").alias("min_price")).select(
        F.col("l_partkey").alias("pm_partkey"), "min_price"
    )
    return (
        offer.join(
            part_min,
            (F.col("l_partkey") == F.col("pm_partkey"))
            & (F.col("best_price") == F.col("min_price")),
        )
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("s_name"),
            F.col("best_price"),
        )
    )


def q_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cheapest_supplier_per_part(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "supplier")
    )


SQL_CHEAPEST_SUPPLIER_PER_PART = """
WITH offer AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS best_price
  FROM lineitem GROUP BY 1, 2
)
SELECT o.l_partkey AS p_partkey, s.s_name, o.best_price
FROM offer o
JOIN supplier s ON o.l_suppkey = s.s_suppkey
WHERE o.best_price = (SELECT MIN(best_price) FROM offer o2 WHERE o2.l_partkey = o.l_partkey)
"""


# ---------------------------------------------------------------------------
# Q18 — large-volume customers: HAVING-filtered aggregate as a semi-join
# driver (orders whose total quantity exceeds a threshold, joined back to
# customers and re-aggregated).
# ---------------------------------------------------------------------------

Q18_MIN_QTY = 210.0


def tpch_q18(customer: DataFrame, orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
        .filter(F.col("qty") > Q18_MIN_QTY)
        .select("l_orderkey", F.col("qty").cast("double").alias("total_qty"))
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(customer.select("c_custkey", "c_name")),
              orders.o_custkey == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_q18(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


SQL_TPCH_Q18 = f"""
SELECT c_name, c_custkey, o_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
       o_totalprice,
       CAST(qty AS DOUBLE) AS total_qty
FROM orders
JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(28,6))) AS qty
      FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS DECIMAL(28,6))) > {Q18_MIN_QTY}) b
  ON o_orderkey = b.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


QUERIES = {
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "tpch_q4": q_tpch_q4,
    "tpch_q5": q_tpch_q5,
    "cheapest_supplier_per_part": q_cheapest_supplier_per_part,
    "tpch_q6": q_tpch_q6,
    "tpch_q18": q_tpch_q18,
    "profile_orders": q_profile_orders,
}

ORACLES = {
    "tpch_q1": SQL_TPCH_Q1,
    "tpch_q3": SQL_TPCH_Q3,
    "tpch_q4": SQL_TPCH_Q4,
    "tpch_q5": SQL_TPCH_Q5,
    "cheapest_supplier_per_part": SQL_CHEAPEST_SUPPLIER_PER_PART,
    "tpch_q6": SQL_TPCH_Q6,
    "tpch_q18": SQL_TPCH_Q18,
    "profile_orders": SQL_PROFILE_ORDERS,
}
