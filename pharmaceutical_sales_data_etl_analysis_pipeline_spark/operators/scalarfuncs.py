"""Scalar-function surface beyond §2.8's F1-F7: JSON path extraction, date
arithmetic, null-handling combinators, and regex group extraction. All
JVM-side built-ins; each query pins the exact cross-engine semantics (the
subtle ones — month arithmetic clamping, trunc return types, day-diff sign —
are chosen so Spark and DuckDB agree by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


# ---------------------------------------------------------------------------
# JSON path extraction over events.props ({"k": <int>}).
# ---------------------------------------------------------------------------

def json_extract_props(events: DataFrame) -> DataFrame:
    k = F.get_json_object(F.col("props"), "$.k")
    return events.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
        (k.cast("int") % 10).cast("int").alias("k_mod10"),
    )


def q_json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    return json_extract_props(load_table(spark, sf_dir, "events"))


SQL_JSON_EXTRACT_PROPS = """
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
       CAST(CAST(json_extract_string(props, '$.k') AS INT) % 10 AS INT) AS k_mod10
FROM events
"""


# ---------------------------------------------------------------------------
# Date arithmetic: add_months clamps to month end in both engines;
# trunc-to-month yields DATE; day diffs are (end - start).
# ---------------------------------------------------------------------------

def date_arithmetic(orders: DataFrame) -> DataFrame:
    d = F.to_date("o_orderdate")
    iso = lambda c: F.date_format(c, "yyyy-MM-dd")  # DATE -> ISO string for
    # dtype-stable cross-engine comparison (harness hashes values)
    return orders.select(
        "o_orderkey",
        iso(d).alias("order_date"),
        iso(F.add_months(d, 1)).alias("plus_month"),
        iso(F.date_add(d, 30)).alias("plus_30d"),
        iso(F.trunc(d, "month")).alias("month_start"),
        iso(F.last_day(d)).alias("month_end"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).cast("int").alias("days_to_2002"),
        F.month(d).cast("int").alias("month"),
        F.dayofmonth(d).cast("int").alias("day"),
    )


def q_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return date_arithmetic(load_table(spark, sf_dir, "orders"))


SQL_DATE_ARITHMETIC = """
SELECT o_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH, '%Y-%m-%d') AS plus_month,
       strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus_30d,
       strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_start,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
       CAST(month(o_orderdate) AS INT) AS month,
       CAST(day(o_orderdate) AS INT) AS day
FROM orders
"""


# ---------------------------------------------------------------------------
# Null-handling combinators: NULLIF/COALESCE/NVL2-style chains and
# null-aware equality, exercised on manufactured nulls.
# ---------------------------------------------------------------------------

def null_handling(lineitem: DataFrame) -> DataFrame:
    disc = F.nullif(F.col("l_discount"), F.lit(0.0))
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        disc.alias("disc_or_null"),
        F.coalesce(disc, F.lit(-1.0)).alias("disc_coalesced"),
        F.when(disc.isNull(), "zero").otherwise("nonzero").alias("disc_class"),
        (disc.eqNullSafe(F.lit(0.05))).alias("is_5pct"),
    )


def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return null_handling(load_table(spark, sf_dir, "lineitem"))


SQL_NULL_HANDLING = """
SELECT l_orderkey, l_linenumber,
       NULLIF(l_discount, 0.0) AS disc_or_null,
       COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_coalesced,
       CASE WHEN NULLIF(l_discount, 0.0) IS NULL THEN 'zero' ELSE 'nonzero' END AS disc_class,
       NULLIF(l_discount, 0.0) IS NOT DISTINCT FROM 0.05 AS is_5pct
FROM lineitem
"""


# ---------------------------------------------------------------------------
# Regex group extraction: split p_name into first/last word + digit runs of
# the brand id.
# ---------------------------------------------------------------------------

def regexp_extract_parts(part: DataFrame) -> DataFrame:
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_extract("p_name", r"(\w+)$", 1).alias("last_word"),
        F.regexp_extract("p_brand", r"(\d+)", 1).cast("int").alias("brand_num"),
        F.split(F.col("p_name"), " ").getItem(0).alias("split_head"),
        F.size(F.split(F.col("p_name"), " ")).cast("int").alias("n_words"),
    )


def q_regexp_extract_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return regexp_extract_parts(load_table(spark, sf_dir, "part"))


SQL_REGEXP_EXTRACT_PARTS = """
SELECT p_partkey,
       regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
       regexp_extract(p_name, '(\\w+)$', 1) AS last_word,
       CAST(regexp_extract(p_brand, '(\\d+)', 1) AS INT) AS brand_num,
       string_split(p_name, ' ')[1] AS split_head,
       CAST(len(string_split(p_name, ' ')) AS INT) AS n_words
FROM part
"""


# ---------------------------------------------------------------------------
# Array aggregation / explode roundtrip: collect_list is unordered in a
# distributed engine, so parity pins it with sort_array before use — the
# same discipline any cluster job needs. Arrays cross the oracle boundary
# as joined strings (dtype-stable hashing).
# ---------------------------------------------------------------------------

def array_agg_per_brand(part: DataFrame) -> DataFrame:
    sizes = F.sort_array(F.collect_list("p_size"))
    return (
        part.groupBy("p_brand")
        .agg(
            F.array_join(sizes, ",").alias("sizes_sorted"),
            F.size(sizes).cast("int").alias("n_parts"),
            F.array_contains(sizes, 25).alias("has_size_25"),
            F.size(F.array_distinct(sizes)).cast("int").alias("n_distinct_sizes"),
        )
    )


def q_array_agg_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    return array_agg_per_brand(load_table(spark, sf_dir, "part"))


SQL_ARRAY_AGG_PER_BRAND = """
SELECT p_brand,
       array_to_string(list_sort(list(p_size)), ',') AS sizes_sorted,
       CAST(len(list_sort(list(p_size))) AS INT) AS n_parts,
       list_contains(list(p_size), 25) AS has_size_25,
       CAST(len(list_distinct(list(p_size))) AS INT) AS n_distinct_sizes
FROM part
GROUP BY p_brand
"""


def explode_roundtrip(part: DataFrame) -> DataFrame:
    """split -> explode -> re-aggregate: the UDTF-shaped lateral surface."""
    words = part.select(
        "p_partkey", F.explode(F.split(F.col("p_name"), " ")).alias("word")
    )
    return words.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.countDistinct("p_partkey").cast("long").alias("n_parts"),
    )


def q_explode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return explode_roundtrip(load_table(spark, sf_dir, "part"))


SQL_EXPLODE_ROUNDTRIP = """
SELECT word,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT p_partkey) AS BIGINT) AS n_parts
FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word FROM part) t
GROUP BY word
"""


# ---------------------------------------------------------------------------
# Math-function surface: functions whose results are IEEE-exact and
# therefore safe to hash-compare cross-engine — abs/ceil/floor/sign are
# exact; sqrt is IEEE-754 correctly rounded in both engines; round(x, 2)
# is half-up for positive values in both; pmod on non-negative ints equals
# %. Deliberately NO pow/exp/ln: those are not correctly-rounded and may
# differ in the last ulp between Java and C math libraries.
# ---------------------------------------------------------------------------

def math_functions(customer: DataFrame) -> DataFrame:
    b = F.col("c_acctbal")
    return customer.select(
        "c_custkey",
        F.abs(b).alias("abs_bal"),
        F.ceil(b).cast("long").alias("ceil_bal"),
        F.floor(b).cast("long").alias("floor_bal"),
        F.round(b, 1).alias("round_bal_1"),
        F.sqrt(F.abs(b)).alias("sqrt_abs_bal"),
        F.signum(b).cast("int").alias("sign_bal"),
        F.greatest(b, F.lit(0.0)).alias("pos_part"),
        F.least(b, F.lit(0.0)).alias("neg_part"),
        F.pmod(F.col("c_custkey"), F.lit(7)).cast("int").alias("key_mod7"),
    )


def q_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return math_functions(load_table(spark, sf_dir, "customer"))


SQL_MATH_FUNCTIONS = """
SELECT c_custkey,
       abs(c_acctbal) AS abs_bal,
       CAST(ceil(c_acctbal) AS BIGINT) AS ceil_bal,
       CAST(floor(c_acctbal) AS BIGINT) AS floor_bal,
       round(c_acctbal, 1) AS round_bal_1,
       sqrt(abs(c_acctbal)) AS sqrt_abs_bal,
       CAST(sign(c_acctbal) AS INT) AS sign_bal,
       greatest(c_acctbal, 0.0) AS pos_part,
       least(c_acctbal, 0.0) AS neg_part,
       CAST(c_custkey % 7 AS INT) AS key_mod7
FROM customer
"""


QUERIES = {
    "json_extract_props": q_json_extract_props,
    "date_arithmetic": q_date_arithmetic,
    "null_handling": q_null_handling,
    "regexp_extract_parts": q_regexp_extract_parts,
    "array_agg_per_brand": q_array_agg_per_brand,
    "explode_roundtrip": q_explode_roundtrip,
    "math_functions": q_math_functions,
}

ORACLES = {
    "json_extract_props": SQL_JSON_EXTRACT_PROPS,
    "date_arithmetic": SQL_DATE_ARITHMETIC,
    "null_handling": SQL_NULL_HANDLING,
    "regexp_extract_parts": SQL_REGEXP_EXTRACT_PARTS,
    "array_agg_per_brand": SQL_ARRAY_AGG_PER_BRAND,
    "explode_roundtrip": SQL_EXPLODE_ROUNDTRIP,
    "math_functions": SQL_MATH_FUNCTIONS,
}


# ---------------------------------------------------------------------------
# Higher-order array functions over embeddings: transform / filter /
# aggregate / slice — per-row left-to-right folds, which both engines
# evaluate in list order (same discipline as similarity.py's cosine fold);
# the float sum is rounded (engine-portable round_half_up) and the other
# outputs are integers. Zero shuffle: pure projection.
# ---------------------------------------------------------------------------

def array_functions(embeddings: DataFrame) -> DataFrame:
    from ..functions.numeric import round_half_up

    emb = F.col("embedding")
    dbl = F.transform(emb, lambda x: x.cast("double"))
    sumsq = F.aggregate(
        F.transform(dbl, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    return embeddings.select(
        "vec_id",
        F.size(emb).cast("int").alias("dim"),
        F.size(F.filter(dbl, lambda x: x > 0)).cast("int").alias("n_positive"),
        round_half_up(sumsq, 4).alias("sum_squares"),
        round_half_up(
            F.aggregate(F.slice(dbl, 1, 4), F.lit(0.0), lambda a, x: a + x), 4
        ).alias("head4_sum"),
    )


def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return array_functions(load_table(spark, sf_dir, "embeddings"))


def _array_functions_sql() -> str:
    from ..functions.numeric import round_half_up_sql

    sumsq = round_half_up_sql(
        "list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')",
        4,
    )
    head4 = round_half_up_sql(
        "list_aggregate(list_transform(embedding[1:4], x -> CAST(x AS DOUBLE)), 'sum')",
        4,
    )
    return f"""
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0)) AS INTEGER) AS n_positive,
       {sumsq} AS sum_squares,
       {head4} AS head4_sum
FROM embeddings
"""


SQL_ARRAY_FUNCTIONS = _array_functions_sql()

QUERIES["array_functions"] = q_array_functions
ORACLES["array_functions"] = SQL_ARRAY_FUNCTIONS


# ---------------------------------------------------------------------------
# VARIANT semi-structured access (Spark 4): parse the JSON props column
# once into a VARIANT and extract typed fields with variant_get — the
# modern engine path for schema-flexible columns (shredded binary
# encoding, no per-access re-parse, unlike get_json_object). Oracle uses
# DuckDB's JSON extraction; both type the result identically.
# ---------------------------------------------------------------------------

def variant_props(events: DataFrame) -> DataFrame:
    # try_parse_json: a malformed props row becomes NULL (matching the
    # null-tolerance of the sibling get_json_object path) instead of
    # failing the whole aggregate
    v = F.try_parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count(F.col("k")).cast("long").alias("n_with_k"),
            F.sum(F.col("k").cast("long")).cast("long").alias("sum_k"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
        )
    )


def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import load_table

    return variant_props(load_table(spark, sf_dir, "events", spread=True))


SQL_VARIANT_PROPS = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS n_with_k,
       CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract(props, '$.k') AS INTEGER)) AS INT) AS min_k,
       CAST(max(CAST(json_extract(props, '$.k') AS INTEGER)) AS INT) AS max_k
FROM events
GROUP BY 1
"""

QUERIES["variant_props"] = q_variant_props
ORACLES["variant_props"] = SQL_VARIANT_PROPS


# ---------------------------------------------------------------------------
# MAP-type surface (r3): the one Spark complex type the registry had not
# exercised (arrays, structs, and VARIANT are covered above). Builds a
# map from columns, then drives the map API — element_at lookup,
# map_keys/map_values, size, map_concat, map_filter, transform_values —
# projecting every result to a scalar/string so the cross-engine compare
# stays value-level (the ORACLE verifies the semantics from first
# principles rather than mirroring map internals: map results are fully
# determined by the input columns, so the expected scalars are direct
# expressions — same oracle philosophy as the pandas-UDF twins).
# All zero-shuffle projections.
# ---------------------------------------------------------------------------

def map_functions(part: DataFrame) -> DataFrame:
    m = F.map_from_arrays(
        F.array(F.lit("brand"), F.lit("type")),
        F.array(F.col("p_brand"), F.col("p_type")),
    )
    mc = F.map_concat(m, F.create_map(F.lit("name"), F.col("p_name")))
    filtered = F.map_filter(mc, lambda k, v: k != F.lit("type"))
    upper_vals = F.transform_values(mc, lambda k, v: F.upper(v))
    return part.select(
        "p_partkey",
        F.element_at(m, F.lit("brand")).alias("brand_val"),
        F.size(m).cast("int").alias("m_size"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        F.size(mc).cast("int").alias("mc_size"),
        F.size(filtered).cast("int").alias("filtered_size"),
        F.element_at(upper_vals, F.lit("name")).alias("name_upper"),
    )


def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return map_functions(load_table(spark, sf_dir, "part"))


SQL_MAP_FUNCTIONS = """
SELECT p_partkey,
       p_brand AS brand_val,
       CAST(2 AS INT) AS m_size,
       'brand,type' AS keys_csv,
       CAST(3 AS INT) AS mc_size,
       CAST(2 AS INT) AS filtered_size,
       upper(p_name) AS name_upper
FROM part
"""

QUERIES["map_functions"] = q_map_functions
ORACLES["map_functions"] = SQL_MAP_FUNCTIONS
