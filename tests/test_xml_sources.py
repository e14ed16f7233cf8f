"""XML source equivalence: the xpath fallback reader must produce the same
frame as the native Spark XML source on the pharma fixtures — it exists to
survive environments without the native reader, which is only true if its
output is interchangeable (VERDICT r1 gap #7)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.plans import pharma_pipeline as pp
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.sources.xml import read_xml_xpath

from .pharma_fixtures import synth_xml_fixtures


@pytest.fixture(scope="module")
def xml_paths(tmp_path_factory):
    return synth_xml_fixtures(tmp_path_factory.mktemp("xml_fb"))


def test_xpath_fallback_matches_native_reps(spark, xml_paths):
    reps_xml, _ = xml_paths
    native = sorted(tuple(r) for r in pp.load_reps(spark, reps_xml).collect())
    fb = read_xml_xpath(
        spark,
        reps_xml,
        "rep",
        {
            "rep_id": "rep/@rID",
            "first_name": "rep/first_name",
            "last_name": "rep/last_name",
            "territory": "rep/territory",
        },
    )
    fallback = sorted(tuple(r) for r in fb.collect())
    assert fallback == native
    assert len(fallback) == 8


def test_xpath_fallback_matches_native_txns(spark, xml_paths):
    """One txn file, including the descendant-axis customer fields and the
    record adjacent to the <txns> wrapper (regression: the record-split
    regex must not swallow it)."""
    _, txn_xmls = xml_paths
    native_df = pp.load_txns_ordered(spark, [txn_xmls[0]]).select(
        "txn_id", "product_name", "rep_id_raw", "customer_name", "country",
        "sale_date", "sale_amount",
    )
    fb = read_xml_xpath(
        spark,
        txn_xmls[0],
        "txn",
        {
            "txn_id": "txn/txnID",
            "product_name": "txn/prod",
            "rep_id_raw": "txn/repID",
            "customer_name": "txn//cust",
            "country": "txn//country",
            "sale_date": "txn/date",
            "sale_amount": "txn/amount",
        },
    ).select(
        F.col("txn_id").cast("int"),
        "product_name",
        "rep_id_raw",
        "customer_name",
        "country",
        "sale_date",
        F.col("sale_amount").cast("double"),
    )
    native = sorted(tuple(r) for r in native_df.collect())
    fallback = sorted(tuple(r) for r in fb.collect())
    assert fallback == native
    assert len(fallback) > 0
