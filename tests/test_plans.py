"""Physical-plan guards: the scale properties SURVEY §7/§4.3 promises are
asserted on the actual Catalyst output, not just claimed — broadcast star
joins, parquet filter pushdown, partition pruning, and shuffle-free bucketed
joins. A regression that silently degrades a plan (e.g. a dim join falling
back to sort-merge) fails here long before it matters at scale."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.catalog import load_table
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.registry import all_queries


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_product_facts_star_is_all_broadcast(spark, sf_dir):
    plan = _plan(all_queries()["product_facts"](spark, sf_dir))
    # formatted explain mentions each node in the tree and the detail list
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_filter_conjunction_pushes_down_to_scan(spark, sf_dir):
    plan = _plan(all_queries()["filter_conjunction"](spark, sf_dir))
    assert "PushedFilters: [" in plan
    # at least one real predicate reached the parquet reader
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert pushed.strip()


def test_column_pruning_reads_narrow_schema(spark, sf_dir):
    plan = _plan(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey").filter(F.col("l_orderkey") > 0)
    )
    # ReadSchema should contain only the selected column, not all 11
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "l_orderkey" in read_schema
    assert "l_extendedprice" not in read_schema


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    dest = str(tmp_path / "orders_by_year")
    orders.write.partitionBy("order_year").mode("overwrite").parquet(dest)
    back = spark.read.parquet(dest).filter(F.col("order_year") == 1995)
    plan = _plan(back)
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "order_year" in pf
    # pruning is effective, not just syntactic
    expected = orders.filter(F.year("o_orderdate") == 1995).count()
    assert back.count() == expected


def test_bucketed_join_runs_without_shuffle(spark, sf_dir, tmp_path):
    """Co-located fact⋈fact: bucketing both sides on the join key removes
    the Exchange entirely — the 100 TB strategy for repeated big joins."""
    spark.sql("CREATE DATABASE IF NOT EXISTS buckdb LOCATION '%s'" % (tmp_path / "wh"))
    try:
        load_table(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
            "o_orderkey"
        ).mode("overwrite").saveAsTable("buckdb.orders_b")
        load_table(spark, sf_dir, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
            "l_orderkey"
        ).mode("overwrite").saveAsTable("buckdb.lineitem_b")
        joined = spark.table("buckdb.lineitem_b").join(
            spark.table("buckdb.orders_b").hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == load_table(spark, sf_dir, "lineitem").count()
    finally:
        spark.sql("DROP TABLE IF EXISTS buckdb.orders_b")
        spark.sql("DROP TABLE IF EXISTS buckdb.lineitem_b")
        spark.sql("DROP DATABASE IF EXISTS buckdb")


def test_topk_plans_take_ordered(spark, sf_dir):
    plan = _plan(all_queries()["top5_users_by_value"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
