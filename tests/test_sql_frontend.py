"""SQL front-end parity: the ENGINE-PORTABLE oracle SQL strings run
unmodified through spark.sql over registered views and reproduce the
DataFrame API's results exactly.

Two claims in one test: (a) users can drive the engine through either
surface interchangeably (SURVEY.md §3.2: the reference's CTAS SQL "ports
almost verbatim"), and (b) the oracle strings for these shapes really are
the dialect-neutral ANSI subset they claim to be — the same text executes
on DuckDB (driver correctness gate) and Spark SQL (here) with identical
results. Shapes covered: scan+filter+agg, star CTAS, re-aggregation,
ranked window top-k, EXISTS semi-join.
"""

from __future__ import annotations

import pytest

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.catalog import register_views
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators.relational import (
    SQL_CUSTOMERS_WITH_ORDERS,
    SQL_PRODUCT_FACTS,
    SQL_QUARTERLY_TOTALS,
    SQL_TOP3_PARTS_PER_BRAND,
)
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators.tpch import (
    SQL_TPCH_Q6,
)
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.registry import all_queries

CASES = {
    "tpch_q6": SQL_TPCH_Q6,
    "product_facts": SQL_PRODUCT_FACTS,
    "quarterly_totals": SQL_QUARTERLY_TOTALS,
    "top3_parts_per_brand": SQL_TOP3_PARTS_PER_BRAND,
    "customers_with_orders": SQL_CUSTOMERS_WITH_ORDERS,
}


def _key(row):
    return tuple(str(v) for v in row)


@pytest.mark.parametrize("name", sorted(CASES))
def test_oracle_sql_runs_on_spark_and_matches_dataframe(spark, sf_dir, name):
    register_views(spark, sf_dir)
    df_api = all_queries()[name](spark, sf_dir)
    sql = spark.sql(CASES[name])
    assert [f.name for f in sql.schema.fields] == [f.name for f in df_api.schema.fields]
    a = sorted(map(_key, df_api.collect()))
    b = sorted(map(_key, sql.collect()))
    assert a == b
