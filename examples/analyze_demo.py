#!/usr/bin/env python3
"""Stage-3 analytics demo — the Spark-first equivalent of the reference's
AnalyzeData.ChatterjeeP.Rmd (reference lines :38-44 top-5 reps by year,
:63-68 per-quarter sales trend; chart rendering stays client-side and out of
engine scope, exactly as in the reference).

Runs the full ETL (XML → star schema → fact tables) on XML inputs, then the
two analytical queries. With no arguments, synthesizes the 7 XML inputs from
the shipped pharma.db via tests/pharma_fixtures.py.

Usage:
  python examples/analyze_demo.py [reps.xml txn1.xml txn2.xml ...]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.plans.pharma_pipeline import (
    best_product_2020,
    quarterly_totals_2020,
    rep_quarterly_sales,
    rep_totals_2020,
    run_pipeline,
)
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.session import get_spark


def main() -> None:
    if len(sys.argv) > 2:
        reps_xml, txn_xmls = sys.argv[1], sys.argv[2:]
        tmp = None
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
        from pharma_fixtures import synth_xml_fixtures

        tmp = tempfile.TemporaryDirectory()
        reps_xml, txn_xmls = synth_xml_fixtures(tmp.name)

    spark = get_spark("analyze-demo")
    spark.sparkContext.setLogLevel("ERROR")
    wh = run_pipeline(spark, str(reps_xml), [str(p) for p in txn_xmls])

    print("== Quarterly totals 2020 (LoadDataWarehouse :142-152) ==")
    quarterly_totals_2020(wh.product_facts).show()

    print("== Best product 2020 (LoadDataWarehouse :179-196) ==")
    best_product_2020(wh.product_facts).show()

    print("== Per-rep totals 2020 (LoadDataWarehouse :199-215) ==")
    rep_totals_2020(wh.rep_facts).show()

    print("== Rep quarterly sales trend (AnalyzeData :63-68; chart input) ==")
    rep_quarterly_sales(wh.rep_facts).show(40)

    if tmp is not None:
        tmp.cleanup()


if __name__ == "__main__":
    main()
