"""Environment-drift canaries: cheap value-level sanity checks on every
corpus table as loaded through catalog.load_table.

Motivation: a Spark upgrade changed TIMESTAMP(NANOS) parquet reads from
nanos-as-long to native timestamp_ntz between rounds, and the previous
conversion silently produced timestamps 1000x too small — every events
query was wrong while all the plumbing "worked". These assertions pin the
*values* (plausible ranges, internal consistency), so the next reader
behavior change fails here with an obvious message instead of as 50
opaque oracle mismatches.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.catalog import load_table


def test_events_ts_in_plausible_range(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    # driver corpus is generated in 2024; anything outside [2000, 2100]
    # means a unit error (nanos/micros/millis confusion), not new data
    assert datetime.datetime(2000, 1, 1) <= lo <= hi <= datetime.datetime(2100, 1, 1), (
        f"events.ts range [{lo}, {hi}] implausible - timestamp unit drift?"
    )


def test_documents_n_chars_matches_text(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bad = docs.filter(F.length("text") != F.col("n_chars")).count()
    assert bad == 0


def test_embeddings_fixed_dim_and_finite(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(F.size("embedding").alias("d")).distinct().collect()
    assert len(dims) == 1 and dims[0]["d"] > 0
    n_nonfinite = emb.filter(
        F.exists("embedding", lambda x: F.isnan(x) | x.isNull())
    ).count()
    assert n_nonfinite == 0
    # zero-norm vectors would make cosine 0/0: Spark's non-ANSI Divide
    # yields NULL there while the Arrow kernels yield NaN (r13 ADVICE) —
    # the engine's cross-engine parity relies on the corpus excluding them
    n_zero_norm = emb.filter(
        ~F.exists("embedding", lambda x: x != F.lit(0.0))
    ).count()
    assert n_zero_norm == 0


def test_star_keys_resolve(spark, sf_dir):
    """Fact->dim FK integrity of the generated corpus (the star queries
    assume inner joins don't drop rows; a generator change that breaks
    referential integrity should fail loudly here)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    dangling = orders.join(
        customer, orders.o_custkey == customer.c_custkey, "left_anti"
    ).count()
    assert dangling == 0
    lineitem = load_table(spark, sf_dir, "lineitem")
    dangling = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti"
    ).count()
    assert dangling == 0
