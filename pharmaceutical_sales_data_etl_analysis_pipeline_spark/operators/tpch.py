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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

# Per-VALUE cast width for exact money sums. 18 digits keeps Spark's
# long-backed Decimal fast path (measured 1.5x faster than precision>18,
# which boxes to BigDecimal); the SUM accumulator still auto-widens
# (Spark decimal(28,6) / DuckDB decimal(38,6)), so the sum is exact and
# the final double is bit-identical to the oracle's DECIMAL(28,6) per-value
# form — both are exact sums of the same 6dp-rounded values. Bound: values
# must fit 12 integral digits (TPC-H prices/charges ≤ ~2e5 — ample).
DEC = "decimal(18,6)"

Q1_CUTOFF = "2001-06-01"
Q6_YEAR = 1997
Q3_DATE = "1998-03-15"
Q3_SEGMENT = "BUILDING"


MICRO = 1_000_000  # 6dp fixed-point unit for the exact-sum construction


def _micro(col):
    """Exact integer micro-units of the 6dp-rounded value: cast to
    DECIMAL(18,6) (per-row rounding proven bit-identical across engines),
    scale by 10^6 (exact decimal multiply), store as DECIMAL(38,0)."""
    return (col.cast(DEC) * F.lit(MICRO)).cast("decimal(38,0)")


def _exact_sum(col):
    """Engine-exact decimal sum emitted as double. The r5 sf1 sweep caught
    the old form (SUM(DECIMAL) -> CAST AS DOUBLE): once a group's sum
    exceeds 2^53 micro-units (~9e9 in value units — any money sum at
    scale), the two engines' decimal->double conversions double-round
    differently (1-ulp disagreement on tpch_q1's sum_charge at sf1,
    invisible at sf0.1). Summing exact INTEGER micro-units and converting
    that one integer to double makes the conversion a single correctly-
    rounded IEEE operation in both engines; the final /1e6 is the same
    IEEE divide on the same double."""
    return F.sum(_micro(col)).cast("double") / F.lit(1000000.0)


def _dsum(col, alias: str):
    return _exact_sum(col).alias(alias)


def _davg(col, alias: str):
    return (_exact_sum(col) / F.count(F.lit(1)).cast("double")).alias(alias)


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
    # spread=True: 7 decimal micro-unit aggregates per row make the
    # pre-exchange scan work the measured bottleneck (r13 A/B 0.72x)
    return tpch_q1(load_table(spark, sf_dir, "lineitem", spread=True))


SQL_TPCH_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       (CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) AS sum_qty,
       (CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) AS sum_base_price,
       (CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) AS sum_disc_price,
       (CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) AS sum_charge,
       (CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
       (CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) / CAST(COUNT(*) AS DOUBLE) AS avg_price,
       (CAST(SUM(CAST(CAST(l_discount AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
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
SELECT (CAST(SUM(CAST(CAST(l_extendedprice * l_discount AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) AS revenue
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
       (CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) AS revenue
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
    """All five column profiles from ONE scan: a single wide aggregation
    (Spark plans the five distinct-counts via one Expand) unpivoted with
    stack() — versus the naive per-column union of five full scans, the
    at-scale difference between reading the fact table once and five
    times."""
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"{c}__nulls"),
            F.countDistinct(c).cast("long").alias(f"{c}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    one = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', n_rows, {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) "
            "AS (column_name, n_rows, n_nulls, n_distinct, min_str, max_str)"
        )
    )


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_orders(load_table(spark, sf_dir, "orders", spread=True))


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
       (CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) AS revenue
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
    """Decorrelated as a per-part window min (ties kept), not a
    re-aggregate + join-back: two shuffles (offer agg, window repartition)
    instead of three plus a fact-sized join."""
    from pyspark.sql import Window

    offer = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("best_price")
    )
    w = Window.partitionBy("l_partkey")
    return (
        offer.withColumn("min_price", F.min("best_price").over(w))
        .filter(F.col("best_price") == F.col("min_price"))
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


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations: revenue flowing supplier-nation
# → customer-nation per ship year, for one nation pair in both directions.
# Fact⋈fact shuffle on orderkey; both nation lookups broadcast.
# ---------------------------------------------------------------------------

Q7_N1, Q7_N2 = "NATION_1", "NATION_2"
Q7_YEARS = (1996, 1997)


def tpch_q7(
    nation: DataFrame, customer: DataFrame, orders: DataFrame,
    lineitem: DataFrame, supplier: DataFrame,
) -> DataFrame:
    supp_nat = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust_nat = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == Q7_N1) & (F.col("cust_nation") == Q7_N2))
        | ((F.col("supp_nation") == Q7_N2) & (F.col("cust_nation") == Q7_N1))
    )
    return (
        lineitem.filter(F.year("l_shipdate").isin(*Q7_YEARS))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust_nat), F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_q7(
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
    )


SQL_TPCH_Q7 = f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       (CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE year(l_shipdate) IN {Q7_YEARS}
  AND ((sn.n_name = '{Q7_N1}' AND cn.n_name = '{Q7_N2}')
    OR (sn.n_name = '{Q7_N2}' AND cn.n_name = '{Q7_N1}'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q8 — national market share: of all PROMO-type parts sold to customers in
# one region, the revenue fraction supplied by one nation, per order year.
# The share is a CASE-guarded decimal sum over a plain decimal sum — both
# engines divide identical doubles.
# ---------------------------------------------------------------------------

Q8_REGION = "EUROPE"
Q8_NATION = "NATION_3"
Q8_TYPE = "PROMO"


def tpch_q8(
    region: DataFrame, nation: DataFrame, customer: DataFrame, orders: DataFrame,
    lineitem: DataFrame, supplier: DataFrame, part: DataFrame,
) -> DataFrame:
    cust_region = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == Q8_REGION)),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nat = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_rev = F.when(F.col("supp_nation") == Q8_NATION, rev).otherwise(F.lit(0.0))
    return (
        lineitem.join(F.broadcast(part.filter(F.col("p_type") == Q8_TYPE).select("p_partkey")),
                      F.col("l_partkey") == F.col("p_partkey"))
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_region), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (_exact_sum(nation_rev) / _exact_sum(rev)).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_q8(
        load_table(spark, sf_dir, "region"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "part"),
    )


SQL_TPCH_Q8 = f"""
SELECT year(o_orderdate) AS o_year,
       (CAST(SUM(CAST(CAST(CASE WHEN sn.n_name = '{Q8_NATION}'
                          THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
                     AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0)
       / (CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0)
         AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region    ON cn.n_regionkey = r_regionkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE r_name = '{Q8_REGION}' AND p_type = '{Q8_TYPE}'
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting: top-20 customers by revenue lost to
# returns in one half-year. lineitem⋈orders shuffle; customer and nation
# broadcast; TakeOrderedAndProject top-k.
# ---------------------------------------------------------------------------

Q10_FROM, Q10_TO = "1997-01-01", "1997-07-01"


def tpch_q10(
    nation: DataFrame, customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    cust = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit(Q10_FROM).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(Q10_TO).cast("timestamp"))
            ).select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_q10(
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


SQL_TPCH_Q10 = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       (CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{Q10_FROM} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q10_TO} 00:00:00'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q12 (adapted) — shipping-delay analysis: the corpus has no l_shipmode /
# l_commitdate, so Q12's mode dimension becomes a ship-delay bucket
# (days from order to ship: FAST<=30 < NORMAL<=90 < SLOW) and the CASE
# split counts urgent (1-URGENT/2-HIGH) vs other line items per bucket —
# the same join + CASE-conditional-count shape as the spec query.
# ---------------------------------------------------------------------------

Q12_YEAR = 1997


def tpch_q12(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "FAST").when(delay <= 90, "NORMAL").otherwise("SLOW")
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.filter(F.year("l_shipdate") == Q12_YEAR)
        .join(orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_q12(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


SQL_TPCH_Q12 = f"""
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 'FAST'
            WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 'NORMAL'
            ELSE 'SLOW' END AS delay_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE year(l_shipdate) = {Q12_YEAR}
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Q14 — promotion effect: percentage of one year's revenue from PROMO-type
# parts. Single scan + broadcast part join; two decimal sums divided.
# ---------------------------------------------------------------------------

Q14_YEAR = 1997


def tpch_q14(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        lineitem.filter(F.year("l_shipdate") == Q14_YEAR)
        .join(F.broadcast(part.select("p_partkey", "p_type")),
              F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0) * _exact_sum(promo) / _exact_sum(rev)
            ).alias("promo_revenue_pct")
        )
    )


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_q14(
        load_table(spark, sf_dir, "part"), load_table(spark, sf_dir, "lineitem")
    )


SQL_TPCH_Q14 = f"""
SELECT 100.0 * (CAST(SUM(CAST(CAST(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
                             AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0)
       / (CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0)
         AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE year(l_shipdate) = {Q14_YEAR}
"""


# ---------------------------------------------------------------------------
# Q16 (adapted) — supplier diversity per part profile: distinct suppliers
# by (brand, type, size) for selected sizes, excluding one brand and any
# supplier with a negative account balance (the spec's complaint-supplier
# NOT IN, driven here by s_acctbal < 0). Anti-join replaces NOT IN.
# ---------------------------------------------------------------------------

Q16_SIZES = (1, 14, 23, 45)
Q16_EXCLUDED_BRAND = "Brand#1"


def tpch_q16(part: DataFrame, supplier: DataFrame, lineitem: DataFrame) -> DataFrame:
    parts = part.filter(
        (F.col("p_brand") != Q16_EXCLUDED_BRAND) & F.col("p_size").isin(*Q16_SIZES)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_q16(
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "lineitem"),
    )


SQL_TPCH_Q16 = f"""
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCLUDED_BRAND}'
  AND p_size IN {Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q19 — discounted revenue under disjunctive brand/size/quantity predicates
# (three OR'd conjunction arms). One broadcast part join; the disjunction
# stays a single post-join filter Catalyst can simplify per arm.
# ---------------------------------------------------------------------------

def tpch_q19(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    arms = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 30))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 40))
        | ((F.col("p_brand") == "Brand#21") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 50))
    )
    return (
        lineitem.join(F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
                      F.col("l_partkey") == F.col("p_partkey"))
        .filter(arms)
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_q19(
        load_table(spark, sf_dir, "part"), load_table(spark, sf_dir, "lineitem")
    )


SQL_TPCH_Q19 = """
SELECT (CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 30)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 40)
   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 50)
"""


# ---------------------------------------------------------------------------
# Q11 (adapted) — important part volumes: per-part revenue supplied by one
# nation's suppliers, kept where it exceeds a fraction of that nation's
# total (the spec's HAVING > scalar-subquery). Spark decorrelates as a
# broadcast cross-join against the 1-row total — no driver round-trip.
# ---------------------------------------------------------------------------

Q11_NATION = "NATION_7"
Q11_FRACTION = 0.001


def tpch_q11(
    nation: DataFrame, supplier: DataFrame, lineitem: DataFrame
) -> DataFrame:
    nat_supp = (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name") == Q11_NATION)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey")
    )
    contrib = (
        lineitem.join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "part_value"))
    )
    total = contrib.agg(_exact_sum(F.col("part_value")).alias("total_value"))
    return (
        contrib.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("total_value") * Q11_FRACTION)
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_q11(
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "lineitem"),
    )


SQL_TPCH_Q11 = f"""
WITH contrib AS (
  SELECT l_partkey,
         (CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = '{Q11_NATION}'
  GROUP BY 1
)
SELECT l_partkey, part_value
FROM contrib
WHERE part_value > (SELECT (CAST(SUM(CAST(CAST(part_value AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) FROM contrib) * {Q11_FRACTION}
ORDER BY part_value DESC, l_partkey ASC
"""


# ---------------------------------------------------------------------------
# Q22 (adapted) — wealthy quiet customers: customers whose balance exceeds
# the global positive-balance average (scalar subquery → broadcast 1-row
# cross join) and who never placed an order above a threshold (NOT EXISTS →
# left anti join), aggregated per market segment.
# ---------------------------------------------------------------------------

Q22_BIG_ORDER = 450_000.0


def tpch_q22(customer: DataFrame, orders: DataFrame) -> DataFrame:
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        (
            _exact_sum(F.col("c_acctbal"))
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_bal")
    )
    big_orders = orders.filter(F.col("o_totalprice") > Q22_BIG_ORDER).select("o_custkey")
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(big_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            _dsum(F.col("c_acctbal"), "totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_q22(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


SQL_TPCH_Q22 = f"""
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS numcust,
       (CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT (CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0)
                          / CAST(COUNT(*) AS DOUBLE)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > {Q22_BIG_ORDER})
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution: LEFT outer join (customers with
# zero orders kept), per-customer count, then a histogram over the counts.
# Two hash aggs; the outer join shuffles once on custkey.
# ---------------------------------------------------------------------------

def tpch_q13(customer: DataFrame, orders: DataFrame) -> DataFrame:
    per_cust = (
        customer.select("c_custkey")
        .join(orders.select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_custkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_q13(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


SQL_TPCH_Q13 = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_custkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q15 — top supplier(s) by one quarter's revenue: the revenue "view" is a
# grouped aggregate; the max is a 1-row broadcast cross join (ties kept,
# as in the spec).
# ---------------------------------------------------------------------------

Q15_FROM, Q15_TO = "1997-01-01", "1997-04-01"


def tpch_q15(supplier: DataFrame, lineitem: DataFrame) -> DataFrame:
    revenue = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(Q15_FROM).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q15_TO).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.col("s_suppkey"), "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_q15(
        load_table(spark, sf_dir, "supplier"), load_table(spark, sf_dir, "lineitem")
    )


SQL_TPCH_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey,
         (CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_FROM} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{Q15_TO} 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: lineitems of one brand below 40% of
# that part's average quantity (correlated scalar avg decorrelated as a
# per-part aggregate joined back — broadcast, parts are dim-sized).
# ---------------------------------------------------------------------------

Q17_BRAND = "Brand#13"


def tpch_q17(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    brand_parts = part.filter(F.col("p_brand") == Q17_BRAND).select("p_partkey")
    li = lineitem.join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"))
    avg_qty = li.groupBy("l_partkey").agg(
        (
            _exact_sum(F.col("l_quantity"))
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_qty")
    ).select(F.col("l_partkey").alias("aq_partkey"), "avg_qty")
    return (
        li.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("aq_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.4) * F.col("avg_qty"))
        .agg(
            (_exact_sum(F.col("l_extendedprice")) / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_q17(
        load_table(spark, sf_dir, "part"), load_table(spark, sf_dir, "lineitem")
    )


SQL_TPCH_Q17 = f"""
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{Q17_BRAND}'
),
aq AS (
  SELECT l_partkey,
         (CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) / CAST(COUNT(*) AS DOUBLE) AS avg_qty
  FROM li GROUP BY 1
)
SELECT (CAST(SUM(CAST(CAST(li.l_extendedprice AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) / 7.0 AS avg_yearly
FROM li JOIN aq ON li.l_partkey = aq.l_partkey
WHERE li.l_quantity < 0.4 * aq.avg_qty
"""


# ---------------------------------------------------------------------------
# Q21 (adapted) — suppliers who were the ONLY late supplier of a
# multi-supplier order: EXISTS (another supplier on the order) + NOT EXISTS
# (another LATE supplier on the order), late = shipped > 90 days after the
# order date (the corpus has no receipt/commit dates). Both quantifiers
# become semi/anti joins on orderkey.
# ---------------------------------------------------------------------------

Q21_LATE_DAYS = 90
Q21_TOP = 20


def tpch_q21(supplier: DataFrame, orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    li = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "late",
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > Q21_LATE_DAYS,
        )
        .select("l_orderkey", "l_suppkey", "late")
    )
    late_li = li.filter(F.col("late")).select("l_orderkey", "l_suppkey").alias("l1")
    other_supp = li.select("l_orderkey", "l_suppkey").alias("l2")
    other_late = late_li.alias("l3")
    qualifying = (
        late_li.join(
            other_supp,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        qualifying.join(F.broadcast(supplier.select("s_suppkey", "s_name")),
                        F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(Q21_TOP)
    )


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_q21(
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


SQL_TPCH_Q21 = f"""
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         date_diff('day', o_orderdate, l_shipdate) > {Q21_LATE_DAYS} AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM li l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM li l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM li l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT {Q21_TOP}
"""


# ---------------------------------------------------------------------------
# Q2 (adapted) — minimum-cost supplier per part within a region. The corpus
# has no partsupp, so the supply "cost" is the best (minimum) unit price the
# supplier has ever sold the part at (min l_extendedprice/l_quantity over
# lineitem). Region scoping via a broadcast nation⋈region dim; the per-part
# min is a window over the region-filtered offers (ties kept, as in the
# spec); top-100 by account balance plans TakeOrderedAndProject.
# ---------------------------------------------------------------------------

Q2_REGION = "EUROPE"
Q2_TYPE = "STANDARD"
Q2_SIZE = 14
Q2_TOP = 100


def tpch_q2(
    region: DataFrame,
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    from pyspark.sql import Window

    supp = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == Q2_REGION)),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = part.filter(
        (F.col("p_type") == Q2_TYPE) & (F.col("p_size") == Q2_SIZE)
    ).select("p_partkey", "p_brand")
    offer = (
        lineitem.select(
            "l_partkey", "l_suppkey",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"),
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min("unit_cost").alias("supply_cost"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        offer.withColumn("min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "supply_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(Q2_TOP)
    )


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_q2(
        load_table(spark, sf_dir, "region"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "lineitem"),
    )


SQL_TPCH_Q2 = f"""
WITH offer AS (
  SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name,
         MIN(l_extendedprice / l_quantity) AS supply_cost
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_type = '{Q2_TYPE}' AND p_size = {Q2_SIZE} AND r_name = '{Q2_REGION}'
  GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, supply_cost
FROM offer o
WHERE supply_cost = (SELECT MIN(supply_cost) FROM offer o2
                     WHERE o2.p_partkey = o.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT {Q2_TOP}
"""


# ---------------------------------------------------------------------------
# Q9 (adapted) — product-type profit by nation and year. No partsupp, so
# line cost is proxied as 60% of the part's retail price × quantity
# (profit = discounted revenue − cost). Part and supplier/nation dims
# broadcast; the one fact⋈fact shuffle is lineitem⋈orders; decimal
# accumulation keeps the sums partition-independent.
# ---------------------------------------------------------------------------

Q9_PATTERN = "%red%"
Q9_COST_FRACTION = 0.6


def tpch_q9(
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    parts = part.filter(F.col("p_name").like(Q9_PATTERN)).select(
        "p_partkey", "p_retailprice"
    )
    supp = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(Q9_COST_FRACTION) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        lineitem.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(_dsum(profit, "sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_q9(
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


SQL_TPCH_Q9 = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INT) AS o_year,
       (CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount)
                     - {Q9_COST_FRACTION} * p_retailprice * l_quantity
                AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '{Q9_PATTERN}'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# Q20 (adapted) — dominant suppliers of a part family: suppliers in one
# nation who shipped more than a quarter of some matching part's total 1997
# volume (the spec's availqty > half-of-shipped nested aggregate, re-based
# on shipped volume since there is no partsupp). Nested agg: per
# (part, supplier) quantity vs per-part total, compared as exact decimal
# sums; the qualifying supplier set drives a semi-join onto the nation-
# filtered supplier dim.
# ---------------------------------------------------------------------------

Q20_PATTERN = "%bolt%"
Q20_YEAR = 1997
Q20_SHARE = 0.25
Q20_NATION = "NATION_3"


def tpch_q20(
    nation: DataFrame, supplier: DataFrame, part: DataFrame, lineitem: DataFrame
) -> DataFrame:
    li = (
        lineitem.filter(F.year("l_shipdate") == Q20_YEAR)
        .join(
            F.broadcast(part.filter(F.col("p_name").like(Q20_PATTERN))
                        .select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("p_partkey", "l_suppkey", "l_quantity")
    )
    per_supp = li.groupBy("p_partkey", "l_suppkey").agg(
        _dsum(F.col("l_quantity"), "supp_qty")
    )
    per_part = li.groupBy("p_partkey").agg(_dsum(F.col("l_quantity"), "part_qty"))
    dominant = (
        per_supp.join(
            per_part.withColumnRenamed("p_partkey", "t_partkey"),
            F.col("p_partkey") == F.col("t_partkey"),
        )
        .filter(F.col("supp_qty") > F.lit(Q20_SHARE) * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    nat = nation.filter(F.col("n_name") == Q20_NATION).select("n_nationkey")
    return (
        supplier.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_q20(
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "lineitem"),
    )


SQL_TPCH_Q20 = f"""
WITH li AS (
  SELECT p_partkey, l_suppkey, l_quantity
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE year(l_shipdate) = {Q20_YEAR} AND p_name LIKE '{Q20_PATTERN}'
),
per_supp AS (
  SELECT p_partkey, l_suppkey,
         (CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) AS supp_qty
  FROM li GROUP BY 1, 2
),
per_part AS (
  SELECT p_partkey,
         (CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(28,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) AS part_qty
  FROM li GROUP BY 1
),
dominant AS (
  SELECT DISTINCT s.l_suppkey
  FROM per_supp s JOIN per_part t ON s.p_partkey = t.p_partkey
  WHERE s.supp_qty > {Q20_SHARE} * t.part_qty
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = '{Q20_NATION}'
  AND s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s_name
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
    "tpch_q13": q_tpch_q13,
    "tpch_q15": q_tpch_q15,
    "tpch_q17": q_tpch_q17,
    "tpch_q21": q_tpch_q21,
    "tpch_q2": q_tpch_q2,
    "tpch_q9": q_tpch_q9,
    "tpch_q20": q_tpch_q20,
    "tpch_q7": q_tpch_q7,
    "tpch_q8": q_tpch_q8,
    "tpch_q10": q_tpch_q10,
    "tpch_q11": q_tpch_q11,
    "tpch_q12": q_tpch_q12,
    "tpch_q14": q_tpch_q14,
    "tpch_q16": q_tpch_q16,
    "tpch_q19": q_tpch_q19,
    "tpch_q22": q_tpch_q22,
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
    "tpch_q13": SQL_TPCH_Q13,
    "tpch_q15": SQL_TPCH_Q15,
    "tpch_q17": SQL_TPCH_Q17,
    "tpch_q21": SQL_TPCH_Q21,
    "tpch_q2": SQL_TPCH_Q2,
    "tpch_q9": SQL_TPCH_Q9,
    "tpch_q20": SQL_TPCH_Q20,
    "tpch_q7": SQL_TPCH_Q7,
    "tpch_q8": SQL_TPCH_Q8,
    "tpch_q10": SQL_TPCH_Q10,
    "tpch_q11": SQL_TPCH_Q11,
    "tpch_q12": SQL_TPCH_Q12,
    "tpch_q14": SQL_TPCH_Q14,
    "tpch_q16": SQL_TPCH_Q16,
    "tpch_q19": SQL_TPCH_Q19,
    "tpch_q22": SQL_TPCH_Q22,
}



# ---------------------------------------------------------------------------
# Join-key skew report: the diagnostic a 100 TB engine runs BEFORE a big
# join — per-key row counts summarized into max/percentile shares, telling
# you whether the key needs salting or AQE skew handling. The percentile
# is the explicit rank form (engine-portable, no percentile-convention
# dependence), computed with the shared distributed-rank construction
# (r4: the r3 form ranked and totaled via unpartitioned windows over the
# per-key counts — ironic for the pre-join skew diagnostic; n_keys/
# n_rows/max now come from one scalar hash agg, broadcast back).
# ---------------------------------------------------------------------------

def key_skew_report(orders: DataFrame) -> DataFrame:
    from ..functions.numeric import round_half_up
    from .distrank import with_global_rank

    per_key = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ranked = with_global_rank(
        per_key, [F.asc("n"), F.asc("o_custkey")], "rn"
    )
    totals = per_key.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("total"),
        F.max("n").cast("long").alias("mx"),
    )
    picks = (
        ranked.crossJoin(F.broadcast(totals))
        .filter(
            (F.col("rn") == F.ceil(F.col("k") * 0.5))
            | (F.col("rn") == F.ceil(F.col("k") * 0.99))
        )
        .groupBy()
        .agg(
            F.max(F.when(F.col("rn") == F.ceil(F.col("k") * 0.5), F.col("n")))
            .cast("long")
            .alias("p50_key_rows"),
            F.max(F.when(F.col("rn") == F.ceil(F.col("k") * 0.99), F.col("n")))
            .cast("long")
            .alias("p99_key_rows"),
        )
    )
    return picks.crossJoin(F.broadcast(totals)).select(
        F.col("k").alias("n_keys"),
        F.col("total").alias("n_rows"),
        F.col("mx").alias("max_key_rows"),
        round_half_up(
            F.col("mx").cast("double") / F.col("total").cast("double"), 6
        ).alias("max_key_share"),
        "p50_key_rows",
        "p99_key_rows",
    )


def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return key_skew_report(load_table(spark, sf_dir, "orders"))


SQL_KEY_SKEW_REPORT = """
WITH per_key AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1
),
ranked AS (
  SELECT n,
         row_number() OVER (ORDER BY n ASC, o_custkey ASC) AS rn,
         count(*) OVER () AS k,
         sum(n) OVER () AS total
  FROM per_key
)
SELECT CAST(max(k) AS BIGINT) AS n_keys,
       CAST(max(total) AS BIGINT) AS n_rows,
       CAST(max(n) AS BIGINT) AS max_key_rows,
       floor((CAST(max(n) AS DOUBLE) / CAST(max(total) AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS max_key_share,
       CAST(max(CASE WHEN rn = CAST(ceil(k * 0.5) AS BIGINT) THEN n END) AS BIGINT) AS p50_key_rows,
       CAST(max(CASE WHEN rn = CAST(ceil(k * 0.99) AS BIGINT) THEN n END) AS BIGINT) AS p99_key_rows
FROM ranked
"""

QUERIES["key_skew_report"] = q_key_skew_report
ORACLES["key_skew_report"] = SQL_KEY_SKEW_REPORT


# ---------------------------------------------------------------------------
# Distribution drift (r3, data quality): total-variation distance between
# the order-priority mix of two adjacent years — the rational-arithmetic
# stand-in for PSI/KL drift monitors (those need log; TVD = ½·Σ|p−q| is
# exact in IEEE given exact counts, so the oracle matches bit-for-bit).
# Per-category shares and |p-q| contributions plus the whole-set TVD via
# a window over the 5 category rows. One scan, one tiny agg. The TVD sum
# runs over QUANTIZED integer contributions (floats summed across rows
# would depend on accumulation order — same discipline as every
# cross-row sum in this repo).
# ---------------------------------------------------------------------------

DRIFT_YEAR_A = 1995
DRIFT_YEAR_B = 1996


def distribution_drift(orders: DataFrame) -> DataFrame:
    yr = F.year("o_orderdate")
    base = (
        orders.filter(yr.isin(DRIFT_YEAR_A, DRIFT_YEAR_B))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(yr == DRIFT_YEAR_A, 1).otherwise(0)).cast("long").alias("n_a"),
            F.sum(F.when(yr == DRIFT_YEAR_B, 1).otherwise(0)).cast("long").alias("n_b"),
        )
    )
    w = Window.partitionBy()
    p = F.col("n_a").cast("double") / F.sum("n_a").over(w).cast("double")
    q = F.col("n_b").cast("double") / F.sum("n_b").over(w).cast("double")
    contrib_q = F.floor(F.abs(p - q) * F.lit(1_000_000_000.0) + F.lit(0.5)).cast("long")
    return base.select(
        "o_orderpriority",
        "n_a",
        "n_b",
        _round9(p).alias("share_a"),
        _round9(q).alias("share_b"),
        (contrib_q.cast("double") / F.lit(1_000_000_000.0)).alias("abs_diff"),
        (
            F.lit(0.5) * F.sum(contrib_q).over(w).cast("double")
            / F.lit(1_000_000_000.0)
        ).alias("tvd"),
    )


def _round9(c):
    from ..functions.numeric import round_half_up

    return round_half_up(c, 9)


def q_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return distribution_drift(load_table(spark, sf_dir, "orders"))


SQL_DISTRIBUTION_DRIFT = f"""
WITH base AS (
  SELECT o_orderpriority,
         CAST(sum(CASE WHEN year(o_orderdate) = {DRIFT_YEAR_A} THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN year(o_orderdate) = {DRIFT_YEAR_B} THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM orders
  WHERE year(o_orderdate) IN ({DRIFT_YEAR_A}, {DRIFT_YEAR_B})
  GROUP BY o_orderpriority
),
m AS (
  SELECT o_orderpriority, n_a, n_b,
         CAST(n_a AS DOUBLE) / CAST(SUM(n_a) OVER () AS DOUBLE) AS p,
         CAST(n_b AS DOUBLE) / CAST(SUM(n_b) OVER () AS DOUBLE) AS q
  FROM base
)
SELECT o_orderpriority, n_a, n_b,
       floor(p * 1000000000.0 + 0.5) / 1000000000.0 AS share_a,
       floor(q * 1000000000.0 + 0.5) / 1000000000.0 AS share_b,
       CAST(CAST(floor(abs(p - q) * 1000000000.0 + 0.5) AS BIGINT) AS DOUBLE)
         / 1000000000.0 AS abs_diff,
       0.5 * CAST(SUM(CAST(floor(abs(p - q) * 1000000000.0 + 0.5) AS BIGINT)) OVER () AS DOUBLE)
         / 1000000000.0 AS tvd
FROM m
"""

QUERIES["distribution_drift"] = q_distribution_drift
ORACLES["distribution_drift"] = SQL_DISTRIBUTION_DRIFT
