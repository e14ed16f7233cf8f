"""ORC boundary (sources/columnar.py): round-trip exactness against the
parquet source of truth, plus the §4.3 plan properties (predicate pushdown
+ column pruning) on the ORC reader — the format swap must not cost the
optimizer anything."""

from __future__ import annotations

from pyspark.sql import functions as F

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.catalog import load_table
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.sources.columnar import (
    read_orc,
    write_orc,
)


def test_orc_roundtrip_exact(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(src, path)
    back = read_orc(spark, path, src.schema)
    assert back.schema == src.schema
    assert back.count() == src.count()
    # exact content equality, both directions (bag semantics via exceptAll)
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0


def test_orc_append_mode_accumulates(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "region")
    path = str(tmp_path / "region_orc")
    write_orc(src, path)
    write_orc(src, path, mode="append")
    back = read_orc(spark, path, src.schema)
    assert back.count() == 2 * src.count()


def test_orc_reader_pushes_down_and_prunes(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc_plan")
    write_orc(src, path)
    df = (
        read_orc(spark, path, src.schema)
        .filter(F.col("o_custkey") == 7)
        .select("o_orderkey")
    )
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "o_custkey" in pushed
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "o_totalprice" not in read_schema


def test_orc_partitioned_write_prunes(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_orc_part")
    write_orc(src, path, partition_by=["order_year"])
    back = spark.read.orc(path).filter(F.col("order_year") == 1995)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert back.count() == src.filter(F.col("order_year") == 1995).count()
