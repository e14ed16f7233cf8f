"""pin() mode equivalence: the durable parquet-table materialization must
be a pure execution-strategy switch — identical results to the default
localCheckpoint mode for every pin-using query family (branch-reuse
self-join, fixed-point iteration, component propagation)."""

from __future__ import annotations

import os

import pytest

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.registry import all_queries


@pytest.mark.parametrize(
    "name", ["basket_affinity", "pagerank_fixedpoint", "neardup_components"]
)
def test_pin_table_mode_matches_local(spark, sf_dir, name):
    q = all_queries()[name]
    saved = os.environ.get("SPARK_GRAFT_PIN")
    try:
        os.environ["SPARK_GRAFT_PIN"] = "local"
        local_rows = sorted(map(tuple, q(spark, sf_dir).collect()))
        os.environ["SPARK_GRAFT_PIN"] = "table"
        table_rows = sorted(map(tuple, q(spark, sf_dir).collect()))
    finally:
        if saved is None:
            os.environ.pop("SPARK_GRAFT_PIN", None)
        else:
            os.environ["SPARK_GRAFT_PIN"] = saved
    assert local_rows == table_rows
