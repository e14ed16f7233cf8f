"""kmeans training memo: pure-function caching keyed by (backing files,
semantic plan hash, K) — must return identical centroids, must NOT
collide across subspace projections of the same files, and must skip
non-file-backed inputs entirely."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.catalog import load_table
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators import kmeans_core


def test_cache_hit_returns_identical_centroids(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    kmeans_core._CENTROID_CACHE.clear()
    first = kmeans_core.kmeans_centroids(emb)
    assert kmeans_core._CENTROID_CACHE  # populated
    second = kmeans_core.kmeans_centroids(load_table(spark, sf_dir, "embeddings"))
    assert first == second
    assert second is first  # the cached object, not a retrain


def test_projections_key_apart(spark, sf_dir):
    """pq_codes trains per-subspace slices of the same parquet files; the
    memo must never serve one subspace's centroids for another."""
    emb = load_table(spark, sf_dir, "embeddings")
    lo = emb.select("vec_id", F.slice("embedding", 1, 8).alias("embedding"))
    hi = emb.select("vec_id", F.slice("embedding", 9, 8).alias("embedding"))
    kmeans_core._CENTROID_CACHE.clear()
    c_lo = kmeans_core.kmeans_centroids(lo, 4)
    c_hi = kmeans_core.kmeans_centroids(hi, 4)
    assert c_lo != c_hi


def test_non_file_input_skips_cache(spark):
    rows = [(i, [float(i % 3), float(i % 5)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kmeans_core._CENTROID_CACHE.clear()
    kmeans_core.kmeans_centroids(df, 2)
    assert not kmeans_core._CENTROID_CACHE


def test_kill_switch(spark, sf_dir):
    saved = os.environ.get("SPARK_GRAFT_KMEANS_CACHE")
    os.environ["SPARK_GRAFT_KMEANS_CACHE"] = "0"
    try:
        kmeans_core._CENTROID_CACHE.clear()
        kmeans_core.kmeans_centroids(load_table(spark, sf_dir, "embeddings"))
        assert not kmeans_core._CENTROID_CACHE
    finally:
        if saved is None:
            os.environ.pop("SPARK_GRAFT_KMEANS_CACHE", None)
        else:
            os.environ["SPARK_GRAFT_KMEANS_CACHE"] = saved
