"""Skew-stress lab: deterministic Zipf-ish fixtures + the join/agg shapes
whose behavior under a hot key we claim to handle at 100 TB.

Every scale claim in this repo about skew ("AQE skew-join splits the hot
partition", "salting mitigates hot-key aggregation") was, until r5,
plan-shape-based: AQE skew handling was enabled but never EXERCISED by a
key skewed enough to trigger it (the synthetic testdata is near-uniform).
This module makes the claims testable and measurable:

- make_skewed_facts writes two scratch parquet tables where ONE key owns
  `hot_frac` (default 20%) of the fact rows — the r4 verdict's prescribed
  stress shape — with a payload column sized so the hot shuffle partition
  crosses AQE's skew thresholds at test scale.
- skewed_join is the fact-to-fact equi-join on that key (sort-merge at any
  realistic size: both sides exceed any sane broadcast threshold at scale,
  and the test pins autoBroadcastJoinThreshold=-1 to keep local behavior
  representative).
- salted/direct aggregation pairs over the skewed key, in TWO flavors:
  algebraic (sum/count — map-side partial aggregation already absorbs the
  hot key, measured and documented in BENCH_NOTES) and holistic
  (collect_list — partial aggregation cannot reduce list payloads, so the
  hot key's entire payload routes to one reducer; THIS is where salting
  pays. The two-stage salted form collects per (key, salt), then flattens).

Used by tests/test_skew_stress.py (plan-level + equivalence assertions)
and examples/skew_stress_bench.py (the timing ladder recorded in
BENCH_NOTES.md). Not part of the query registry: the fixtures write
scratch tables, and registry entries must be pure reads of the driver's
testdata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOT_KEY = 0
N_SALT = 16


def make_skewed_facts(
    spark: SparkSession,
    out_dir: str,
    n_rows: int,
    hot_frac: float = 0.2,
    n_keys: int = 10_000,
    payload_chars: int = 96,
) -> tuple[str, str]:
    """Write factA (skewed: HOT_KEY owns hot_frac of rows, remainder
    uniform over n_keys) and factB (every key exactly once) under out_dir;
    returns (a_path, b_path). Fully deterministic (id-derived, no rand)."""
    period = max(2, int(round(1.0 / hot_frac)))
    a = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("row_id"),
            F.when(F.col("id") % period == 0, F.lit(HOT_KEY))
            .otherwise((F.col("id") % n_keys) + 1)
            .cast("long")
            .alias("key"),
            (F.col("id") % 1000).cast("double").alias("value"),
            F.rpad(F.conv(F.col("id").cast("string"), 10, 16), payload_chars, "x").alias(
                "payload"
            ),
        )
    )
    b = spark.range(n_keys + 1).select(
        F.col("id").alias("key"),
        (F.col("id") * 7 % 100).cast("double").alias("dim_weight"),
    )
    a_path, b_path = f"{out_dir}/fact_a", f"{out_dir}/fact_b"
    a.write.mode("overwrite").parquet(a_path)
    b.write.mode("overwrite").parquet(b_path)
    return a_path, b_path


def skewed_join(spark: SparkSession, a_path: str, b_path: str) -> DataFrame:
    """fact-to-fact equi-join on the skewed key, reduced to one row so the
    timing measures the join, not result transfer. At 100 TB this is a
    sort-merge join whose hot partition AQE must split."""
    a = spark.read.parquet(a_path)
    b = spark.read.parquet(b_path)
    return a.join(b, "key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value") * F.col("dim_weight")).alias("weighted"),
    )


def direct_totals(a: DataFrame) -> DataFrame:
    """Algebraic agg, unsalted: map-side partial aggregation reduces each
    task's hot-key rows to ONE partial row, so the hot reducer receives at
    most n_tasks rows for the hot key."""
    return a.groupBy("key").agg(
        F.sum(F.col("value").cast("decimal(27,6)")).alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


def salted_totals(a: DataFrame, n_salt: int = N_SALT) -> DataFrame:
    """Algebraic agg, salted two-stage (same result as direct_totals:
    decimal sums re-associate exactly)."""
    partial = (
        a.withColumn("salt", (F.col("row_id") % n_salt).cast("int"))
        .groupBy("key", "salt")
        .agg(
            F.sum(F.col("value").cast("decimal(27,6)")).alias("psum"),
            F.count(F.lit(1)).alias("pcnt"),
        )
    )
    return partial.groupBy("key").agg(
        F.sum("psum").alias("total"), F.sum("pcnt").alias("n")
    )


def direct_payload_lists(a: DataFrame) -> DataFrame:
    """Holistic agg, unsalted: collect_list partials CONCATENATE (never
    shrink), so the hot key's full 20% of all payload bytes funnels into a
    single reducer task — the shape that actually dies under skew. Reduced
    to (key, n_items, n_bytes) so timing excludes result transfer."""
    return (
        a.groupBy("key")
        .agg(F.collect_list("payload").alias("items"))
        .select(
            "key",
            F.size("items").alias("n_items"),
            F.aggregate(
                F.transform("items", lambda s: F.length(s).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("n_bytes"),
        )
    )


def salted_payload_lists(a: DataFrame, n_salt: int = N_SALT) -> DataFrame:
    """Holistic agg, salted: stage 1 collects per (key, salt) — the hot
    key's payload spreads across n_salt reducers — stage 2 merges the
    already-reduced per-salt summaries (n_salt rows per key), never the
    payload itself. Same (key, n_items, n_bytes) result; item ORDER inside
    the list is not part of the contract (collect_list order is partition-
    dependent even unsalted)."""
    partial = (
        a.withColumn("salt", (F.col("row_id") % n_salt).cast("int"))
        .groupBy("key", "salt")
        .agg(F.collect_list("payload").alias("items"))
        .select(
            "key",
            F.size("items").cast("long").alias("p_items"),
            F.aggregate(
                F.transform("items", lambda s: F.length(s).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("p_bytes"),
        )
    )
    return partial.groupBy("key").agg(
        F.sum("p_items").cast("int").alias("n_items"),
        F.sum("p_bytes").alias("n_bytes"),
    )
