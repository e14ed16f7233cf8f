"""Golden parity tests: run the full Spark pipeline on XML synthesized from
the shipped pharma.db and compare against BASELINE.md's golden results."""

from __future__ import annotations

import pytest

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.plans import pharma_pipeline as pp

from .pharma_fixtures import golden_tables, synth_xml_fixtures

GOLDEN_QUARTERS = {1: 3_880_526.0, 2: 4_848_656.0, 3: 4_762_835.0, 4: 4_197_137.0}
GOLDEN_BEST = ("Xinoprozen", 4_757_340.0)
GOLDEN_REP_TOTALS = {
    ("Walison", "da Silva"): 5_397_929.0,
    ("Aneeta", "Kappoorthy"): 4_032_183.0,
    ("Lynette", "McRowe"): 2_770_588.0,
    ("Helmut", "Schwab"): 2_031_307.0,
    ("Prasad", "Patel"): 1_999_163.0,
    ("Veronika", "Sixt"): 1_457_984.0,
}


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    reps_xml, txn_xmls = synth_xml_fixtures(tmp_path_factory.mktemp("pharma_xml"))
    wh = pp.run_pipeline(spark, reps_xml, txn_xmls)
    # cache the fact bag: several assertions re-read it
    wh.salestxn.cache()
    return wh


def test_reps_dim(warehouse):
    got = {tuple(r) for r in warehouse.reps.collect()}
    assert got == set(golden_tables()["reps"])


def test_customers_dim_first_seen_order(warehouse):
    got = sorted(tuple(r) for r in warehouse.customers.collect())
    assert got == sorted(golden_tables()["customers"])


def test_products_dim_first_seen_order(warehouse):
    got = sorted(tuple(r) for r in warehouse.products.collect())
    assert got == sorted(golden_tables()["products"])


def test_salestxn_bag_semantics(warehouse):
    n = warehouse.salestxn.count()
    n_distinct = warehouse.salestxn.select("txn_id").distinct().count()
    assert n == 11_060  # duplicates preserved (U1)
    assert n_distinct == 4_000


def test_salestxn_no_null_fks(warehouse):
    from pyspark.sql import functions as F

    nulls = warehouse.salestxn.filter(
        F.col("product_id").isNull() | F.col("customer_id").isNull()
    ).count()
    assert nulls == 0  # golden data has no lookup misses


def test_product_facts_cardinality(warehouse):
    assert warehouse.product_facts.count() == 96


def test_quarterly_totals_2020(warehouse):
    got = {r["quarter"]: r["total"] for r in pp.quarterly_totals_2020(warehouse.product_facts).collect()}
    assert got == GOLDEN_QUARTERS


def test_best_product_2020(warehouse):
    [row] = pp.best_product_2020(warehouse.product_facts).collect()
    assert (row["product_name"], row["total_sold"]) == GOLDEN_BEST


def test_rep_totals_2020(warehouse):
    got = {
        (r["first_name"], r["last_name"]): r["total_sales"]
        for r in pp.rep_totals_2020(warehouse.rep_facts).collect()
    }
    assert got == GOLDEN_REP_TOTALS


@pytest.fixture(scope="module")
def persisted(spark, warehouse, tmp_path_factory):
    """The warehouse materialized via saveAsTable/CTAS and re-read from the
    catalog — golden results must survive the table lifecycle (S12/S10)."""
    loc = str(tmp_path_factory.mktemp("pharma_wh"))
    wh = pp.persist_warehouse(spark, warehouse, database="pharma_wh_test", location=loc)
    yield wh
    for t in ("reps", "customers", "products", "salestxn", "product_facts", "rep_facts"):
        spark.sql(f"DROP TABLE IF EXISTS pharma_wh_test.{t}")
    spark.sql("DROP DATABASE IF EXISTS pharma_wh_test")


def test_persisted_golden_results(persisted):
    assert persisted.salestxn.count() == 11_060
    assert persisted.product_facts.count() == 96
    got_q = {r["quarter"]: r["total"] for r in pp.quarterly_totals_2020(persisted.product_facts).collect()}
    assert got_q == GOLDEN_QUARTERS
    [row] = pp.best_product_2020(persisted.product_facts).collect()
    assert (row["product_name"], row["total_sold"]) == GOLDEN_BEST
    got_r = {
        (r["first_name"], r["last_name"]): r["total_sales"]
        for r in pp.rep_totals_2020(persisted.rep_facts).collect()
    }
    assert got_r == GOLDEN_REP_TOTALS


def test_persisted_facts_prune_year_partitions(persisted):
    """The year-partitioned layout must turn the year-2020 analytics filter
    into partition pruning on the re-read table."""
    from pyspark.sql import functions as F

    df = persisted.product_facts.filter(F.col("year") == 2020)
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters: [" in plan
    assert "year" in plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]


def test_key_repair_sequencing(warehouse):
    """rep_facts must exclude nothing (all 6 active reps resolve after
    repair), and the pre-repair fact table must still carry bare ids."""
    raw_ids = [r["rep_id"] for r in warehouse.salestxn.select("rep_id").distinct().collect()]
    assert all(not i.startswith("r") for i in raw_ids)
    repaired_ids = [
        r["rep_id"] for r in warehouse.salestxn_repaired.select("rep_id").distinct().collect()
    ]
    assert all(i.startswith("r") for i in repaired_ids)
    # 6 of 8 reps appear in sales (r655, r988 absent) — inner join keeps 6
    assert warehouse.rep_facts.select("first_name", "last_name").distinct().count() == 6
