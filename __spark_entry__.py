"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship star query at sf0.001 (smoke: rows > 0).
queries()         — every implemented operator from SURVEY.md §2 (+ the
                    LLM-data-pipeline extensions), (spark, sf_dir) -> DF.
oracle_sql()      — DuckDB twin per query (same column names/types); omitted
                    only for non-SQL-expressible ops (rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.registry import (
    all_oracles,
    all_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the product_facts star (scan → broadcast joins →
    date functions → hash agg) on /root/testdata/sf0.001."""
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators.relational import (
        q_product_facts,
    )

    return q_product_facts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
