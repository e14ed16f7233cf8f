"""Direct tests for the shared distributed-order-statistics primitive
(operators/distrank.py) and the bucketed gap construction that replaced
the r3 global windows. The oracle-parity harness checks the composed
queries; these pin the primitives themselves on adversarial inputs —
heavy ties, skewed range partitions, empty buckets, bucket width 1 —
against brute-force Python ground truth."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators import warehouse
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators.distrank import (
    ntile_from_rank,
    with_global_rank,
)


def _rank_df(spark, rows):
    return spark.createDataFrame(rows, "id long, val long")


@pytest.mark.parametrize("seed,n", [(1, 7), (2, 100), (3, 1000)])
def test_with_global_rank_matches_sorted_order(spark, seed, n):
    rng = random.Random(seed)
    # heavy ties on val: the tie-break column (id, unique) makes the total
    # order tie-free as the helper's contract requires
    rows = [(i, rng.randrange(10)) for i in range(n)]
    df = _rank_df(spark, rows).repartition(5)
    out = with_global_rank(df, [F.asc("val"), F.asc("id")], "rk").collect()
    expected = {
        row_id: rank + 1
        for rank, (row_id, _) in enumerate(sorted(rows, key=lambda r: (r[1], r[0])))
    }
    got = {r["id"]: r["rk"] for r in out}
    assert got == expected
    assert sorted(r["rk"] for r in out) == list(range(1, n + 1))


def test_with_global_rank_descending_order(spark):
    rows = [(i, i % 3) for i in range(50)]
    df = _rank_df(spark, rows)
    out = with_global_rank(df, [F.desc("val"), F.asc("id")], "rk").collect()
    expected = {
        row_id: rank + 1
        for rank, (row_id, _) in enumerate(sorted(rows, key=lambda r: (-r[1], r[0])))
    }
    assert {r["id"]: r["rk"] for r in out} == expected


@pytest.mark.parametrize("n,k", [(1, 5), (4, 5), (5, 5), (23, 5), (100, 7), (10, 2)])
def test_ntile_from_rank_matches_spark_ntile(spark, n, k):
    """Closed-form bucket from global rank == Spark's own ntile() on a
    single partition (the semantics the distributed form must replicate)."""
    from pyspark.sql import Window

    df = spark.range(n).select(F.col("id").cast("long").alias("id"))
    w = Window.orderBy("id")
    native = {
        r["id"]: r["nt"]
        for r in df.select("id", F.ntile(k).over(w).alias("nt")).collect()
    }
    closed = {
        r["id"]: r["nt"]
        for r in df.select(
            "id",
            ntile_from_rank(F.col("id") + 1, F.lit(n).cast("long"), k).alias("nt"),
        ).collect()
    }
    assert closed == native


def _expected_gaps(keys):
    ks = sorted(set(keys))
    return sorted(
        (a, b, b - a - 1) for a, b in zip(ks, ks[1:]) if b > a + 1
    )


@pytest.mark.parametrize("bucket", [1, 2, 7, 4096])
def test_id_gap_analysis_bucket_widths(spark, monkeypatch, bucket):
    """The two-level bucketed lead finds exactly the gaps of the global
    lead for any bucket width — including width 1 (every key its own
    bucket: all gaps cross-bucket) and widths that leave empty buckets
    between occupied ones."""
    monkeypatch.setattr(warehouse, "GAP_BUCKET", bucket)
    rng = random.Random(42)
    keys = sorted(rng.sample(range(0, 500), 120))
    orders = spark.createDataFrame(
        [(k, "F") for k in keys for _ in range(rng.randrange(1, 3))],
        "o_orderkey long, o_orderstatus string",
    )
    out = sorted(
        (r["gap_after"], r["gap_before"], r["missing"])
        for r in warehouse.id_gap_analysis(orders).collect()
    )
    assert out == _expected_gaps(keys)


def test_id_gap_analysis_degenerate_inputs(spark):
    dense = spark.createDataFrame(
        [(k,) for k in range(10)], "o_orderkey long"
    )
    assert warehouse.id_gap_analysis(dense).count() == 0
    single = spark.createDataFrame([(7,)], "o_orderkey long")
    assert warehouse.id_gap_analysis(single).count() == 0


def test_triangle_packed_key_guard_fires(spark):
    """ADVICE r3: node ids >= 2^31 must fail loudly (SparkRuntimeException
    from assert_true), never silently alias packed join keys."""
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators.graphops import (
        graph_triangle_stats,
    )

    big = 1 << 31
    # a triangle among three out-of-range part ids in one order
    lineitem = spark.createDataFrame(
        [(1, big), (1, big + 1), (1, big + 2)],
        "l_orderkey long, l_partkey long",
    )
    with pytest.raises(Exception, match="(?i)assert|2\\^31|packed"):
        graph_triangle_stats(lineitem).collect()


def test_triangle_stats_in_range_unaffected_by_guard(spark):
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators.graphops import (
        graph_triangle_stats,
    )

    lineitem = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12)],
        "l_orderkey long, l_partkey long",
    )
    row = graph_triangle_stats(lineitem).collect()[0]
    assert row["n_triangles"] == 1 and row["n_nodes"] == 3


def _hist_quantile(spark, prices):
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators.sketches import (
        histogram_quantile_calibration,
    )

    orders = spark.createDataFrame(
        [(float(p), i) for i, p in enumerate(prices)],
        "o_totalprice double, o_orderkey long",
    )
    return {
        r["pct"]: r["exact_value"]
        for r in histogram_quantile_calibration(orders).collect()
    }


def test_two_phase_quantile_matches_sorted_order_statistic(spark):
    """The bucket-pruned exact comparator must equal the k-th smallest of
    the fully sorted data (k = ceil(p*n/100)) — including when the target
    rank is the first or last row of its bucket."""
    import math

    for prices in (
        list(range(1, 101)),                      # uniform, ranks at bucket edges
        [1] * 50 + [2] * 50,                      # heavy ties straddling buckets
        [10 ** (i % 5) for i in range(1, 200)],   # skewed magnitudes
        [5.0, 7.0],                               # n < buckets
    ):
        got = _hist_quantile(spark, prices)
        s = sorted(float(p) for p in prices)
        for pct, val in got.items():
            k = math.ceil(len(s) * pct / 100.0)
            assert val == s[k - 1], (prices[:5], pct, val, s[k - 1])


def test_two_phase_quantile_empty_input(spark):
    assert _hist_quantile(spark, []) == {}


def test_triangle_strategy_tiers_agree_and_follow_the_derived_bound(
    spark, sf_dir, monkeypatch
):
    """r6: the triangle kernel derives its join strategy from a pair-count
    bound (the unconditional edge broadcast failed at the sf10 rung; the
    unfiltered shuffled closing join then filled the box's spill disk).
    All three tiers — edge-broadcast, bloom-prefiltered closing, plain
    shuffled closing — must return identical stats, and each tier's
    FORCED hints must match its contract (physical selection beyond the
    hints belongs to Catalyst/AQE)."""
    import pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators.graphops as g
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.catalog import load_table

    def _hints(df):
        return df._jdf.queryExecution().analyzed().toString().count("strategy=broadcast")

    li = load_table(spark, sf_dir, "lineitem")
    small_df = g.graph_triangle_stats(li)
    small = small_df.collect()[0]
    # wedge + closing edge-broadcast hints (the two deg-attach hints sit
    # inside the pinned edge subtree, seen as a LogicalRDD here)
    assert _hints(small_df) >= 2

    monkeypatch.setattr(g, "TRI_BROADCAST_PAIR_MAX", 0)  # tier 2: bloom
    med_df = g.graph_triangle_stats(li)
    assert small.asDict() == med_df.collect()[0].asDict()
    # exactly the two bloom-probe broadcasts; the data-sized edge relation
    # is never hint-broadcast on this tier
    assert _hints(med_df) == 2

    monkeypatch.setattr(g, "TRI_BLOOM_PAIR_MAX", 0)  # tier 3: plain shuffle
    big_df = g.graph_triangle_stats(li)
    assert small.asDict() == big_df.collect()[0].asDict()
    assert _hints(big_df) == 0


def test_triangle_shuffled_tier_derives_partition_width(spark, sf_dir, monkeypatch):
    """r7: the shuffled tier's exchanges are sized from the EXACT wedge
    volume (rows-per-task target), not the static conf — the sf10 rung
    lost 1.5x to 32 static partitions. Pure derivation clamps to
    [session conf, cap]; with a tiny rows-per-task the derived width
    must show up as the wedge join's hashpartitioning count, and the
    result stays tier-invariant."""
    import pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators.graphops as g
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.catalog import load_table

    # pure clamp behavior
    assert g.derive_tri_shuffle_partitions(0, 32) == 32           # floor: conf
    assert g.derive_tri_shuffle_partitions(4_900_000_000, 32) == 307  # sf10 shape
    assert g.derive_tri_shuffle_partitions(10**12, 32) == g.TRI_MAX_SHUFFLE_PARTITIONS

    li = load_table(spark, sf_dir, "lineitem")
    baseline = g.graph_triangle_stats(li).collect()[0]

    monkeypatch.setattr(g, "TRI_BROADCAST_PAIR_MAX", 0)   # force shuffled tier
    monkeypatch.setattr(g, "TRI_BLOOM_PAIR_MAX", 0)       # plain closing
    monkeypatch.setattr(g, "TRI_ROWS_PER_TASK", 100)      # tiny target
    captured = {}
    real = g.derive_tri_shuffle_partitions

    def spy(wedge_rows, session_parts):
        captured["out"] = real(wedge_rows, session_parts)
        captured["in"] = (wedge_rows, session_parts)
        return captured["out"]

    monkeypatch.setattr(g, "derive_tri_shuffle_partitions", spy)
    big_df = g.graph_triangle_stats(li)
    # the probe measured a real wedge volume and, at 100 rows/task, the
    # derived width must exceed the 8-partition session conf...
    assert captured["in"][1] == 8 and captured["out"] > 8
    # ...and that exact width is what the wedge-join exchanges carry
    plan = big_df._jdf.queryExecution().executedPlan().toString()
    assert f", {captured['out']})" in plan
    assert baseline.asDict() == big_df.collect()[0].asDict()
