"""Up-scaler invariants (r5 scale ladder): the derived sf-N directory must
be a faithful scale-up — exact row multiples, FK-closed, key-disjoint
replicas, and WITHOUT the naive-replication pathology (replicas being
near-duplicates of their originals)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.scaleup import TABLES, upscale

FACTOR = 3


@pytest.fixture(scope="module")
def scaled_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scaled"))
    upscale(spark, sf_dir, out, FACTOR)
    return out


def test_row_counts_scale_exactly(spark, sf_dir, scaled_dir):
    for t in TABLES:
        src = spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        dst = spark.read.parquet(f"{scaled_dir}/{t}.parquet").count()
        want = src if t in ("region", "nation") else src * FACTOR
        assert dst == want, (t, src, dst)


def test_keys_stay_unique(spark, scaled_dir):
    for t, key in [("customer", "c_custkey"), ("orders", "o_orderkey"),
                   ("part", "p_partkey"), ("documents", "doc_id"),
                   ("embeddings", "vec_id")]:
        df = spark.read.parquet(f"{scaled_dir}/{t}.parquet")
        assert df.count() == df.select(key).distinct().count(), t


def test_foreign_keys_closed(spark, scaled_dir):
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.registry import all_queries

    audit = all_queries()["fk_integrity_audit"](spark, scaled_dir)
    assert audit.agg(F.sum("orphan_rows")).first()[0] == 0


def test_replicas_are_not_near_duplicates(spark, sf_dir, scaled_dir):
    """The pathology the 50%-mutation rate exists to prevent: candidate
    pairs must scale ~linearly with the corpus, not explode into
    replica-family cliques (measured 80x for 10x data before the fix)."""
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.registry import all_queries

    qs = all_queries()
    base = qs["minhash_lsh_candidates"](spark, sf_dir).count()
    scaled = qs["minhash_lsh_candidates"](spark, scaled_dir).count()
    # linear-ish: allow 2x headroom over the exact factor
    assert scaled <= max(base, 1) * FACTOR * 2, (base, scaled)


def test_embedding_replicas_leave_neardup_range(spark, sf_dir, scaled_dir):
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.registry import all_queries

    qs = all_queries()
    base = qs["embedding_near_dups"](spark, sf_dir).count()
    scaled = qs["embedding_near_dups"](spark, scaled_dir).count()
    assert scaled <= max(base, 1) * FACTOR * 2, (base, scaled)


# ---------------------------------------------------------------------------
# Planted-variant / up-scaler coupling (r6, VERDICT ask #6): the
# *_planted near-dup queries UNION literal rows under shifted ids inside
# both engines' plans. Two invariants keep that coupling sound at every
# rung the ladder measures:
#   1. planted sets are O(1) — literal constants, never corpus-scaled;
#   2. planted id ranges can never collide with real ids produced by the
#      up-scaler at any measured rung (largest = sf0.1 x 100 = sf10).
# Today's constants satisfy both with wide margin; this pins the margin
# so a future re-tune fails loudly instead of silently double-keying.
# ---------------------------------------------------------------------------

MAX_MEASURED_FACTOR = 100  # sf0.1 -> sf10, the largest local rung


def test_planted_sets_are_constant_size():
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators.dedup import (
        DOC_PLANT_N,
    )
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators.similarity import (
        PLANT_N,
    )

    assert DOC_PLANT_N <= 32 and PLANT_N <= 32


def test_planted_ids_clear_upscaled_ranges(spark, sf_dir):
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators.dedup import (
        DOC_PLANT_N,
        DOC_PLANT_OFFSET,
    )
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators.similarity import (
        PLANT_N,
        PLANT_OFFSET,
    )

    # sf0.1 is the ladder's up-scale SOURCE; ids are dense 0..n-1, so the
    # max real id at factor f is n*f - 1 (test_keys_stay_unique +
    # test_row_counts_scale_exactly pin the density/stride)
    n_docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").count()
    n_vecs = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").count()
    assert n_docs * MAX_MEASURED_FACTOR <= DOC_PLANT_OFFSET
    assert n_vecs * MAX_MEASURED_FACTOR <= PLANT_OFFSET
    # and the planted block itself stays inside long range trivially
    assert DOC_PLANT_OFFSET + DOC_PLANT_N < 2**62
    assert PLANT_OFFSET + PLANT_N < 2**62
