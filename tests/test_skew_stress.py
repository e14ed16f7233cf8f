"""Skew-stress gate (r5): the repo's skew claims, exercised under a real
hot key instead of merely having the confs enabled.

- AQE skew-join splitting: the fact-to-fact join on a key owning 20% of
  rows must show a split ("skewed" AQEShuffleRead) in the FINAL adaptive
  plan, and the split must not change the result.
- Salted aggregation: both the algebraic (sum/count) and holistic
  (collect_list) salted forms must reproduce their direct equivalents
  exactly — the perf deltas are measured in examples/skew_stress_bench.py
  and recorded in BENCH_NOTES.md (the honest finding: salting only pays
  for holistic aggs; partial aggregation already absorbs algebraic ones).
"""

from __future__ import annotations

import pytest

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.skewlab import (
    HOT_KEY,
    direct_payload_lists,
    direct_totals,
    make_skewed_facts,
    salted_payload_lists,
    salted_totals,
    skewed_join,
)

N_ROWS = 300_000


@pytest.fixture(scope="module")
def skew_paths(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("skewlab"))
    return make_skewed_facts(spark, out, N_ROWS)


@pytest.fixture()
def skew_confs(spark):
    """Shrink AQE's skew thresholds so the ~10 MB hot partition of the
    test fixture triggers the same split a multi-GB partition would on a
    cluster; force SMJ (no broadcast) so the join shape matches scale."""
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "262144",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "131072",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "65536",
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_the_hot_join_partition(spark, skew_paths, skew_confs):
    a_path, b_path = skew_paths
    df = skewed_join(spark, a_path, b_path)
    rows = df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    # the hot partition was actually split at runtime
    assert "skewed" in final, final
    # and the split changed nothing: every factA row has a factB match
    assert rows[0]["n"] == N_ROWS


def test_skew_split_result_equals_unsplit(spark, skew_paths, skew_confs):
    a_path, b_path = skew_paths
    with_split = skewed_join(spark, a_path, b_path).collect()
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        without = skewed_join(spark, a_path, b_path).collect()
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    assert with_split == without


def test_salted_algebraic_agg_equals_direct(spark, skew_paths):
    a = spark.read.parquet(skew_paths[0])
    direct = {r["key"]: (r["total"], r["n"]) for r in direct_totals(a).collect()}
    salted = {r["key"]: (r["total"], r["n"]) for r in salted_totals(a).collect()}
    assert direct == salted
    assert direct[HOT_KEY][1] == N_ROWS // 5  # the hot key really owns 20%


def test_salted_holistic_agg_equals_direct(spark, skew_paths):
    a = spark.read.parquet(skew_paths[0])
    direct = {
        r["key"]: (r["n_items"], r["n_bytes"])
        for r in direct_payload_lists(a).collect()
    }
    salted = {
        r["key"]: (r["n_items"], r["n_bytes"])
        for r in salted_payload_lists(a).collect()
    }
    assert direct == salted
