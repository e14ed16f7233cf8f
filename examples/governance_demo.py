#!/usr/bin/env python3
"""Data-governance report demo: the audit surface a platform team runs
before signing off a dataset release — privacy, drift, integrity,
provenance, and per-source accounting, all r2/r3 operators composed from
the same registry the driver verifies.

  1. privacy: quasi-identifier k-anonymity audit
  2. drift: year-over-year category mix (total-variation distance)
  3. integrity: FK orphan audit + key-sequence gaps + table content hashes
  4. provenance: per-source data cards + source vocabulary overlap
  5. eval health: language-ID confusion vs the labeled column

Usage:
  python examples/governance_demo.py [sf_dir]   (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.registry import all_queries
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("governance-demo")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()

    print("== 1. Privacy: k-anonymity over (nation, segment) ==")
    q["k_anonymity_audit"](spark, sf_dir).filter("risky").show(5)

    print("== 2. Drift: 1995 vs 1996 order-priority mix (TVD) ==")
    q["distribution_drift"](spark, sf_dir).orderBy("o_orderpriority").show()

    print("== 3. Integrity: FK orphans / key gaps / content hashes ==")
    q["fk_integrity_audit"](spark, sf_dir).show()
    q["id_gap_analysis"](spark, sf_dir).orderBy("gap_after").show(5)
    q["table_content_hash"](spark, sf_dir).show(truncate=False)

    print("== 4. Provenance: data cards + source overlap ==")
    q["dataset_cards"](spark, sf_dir).orderBy("source").show(5)
    q["source_overlap"](spark, sf_dir).orderBy("jaccard", ascending=False).show(5)

    print("== 5. Eval health: lang-ID confusion matrix ==")
    q["lang_id_confusion"](spark, sf_dir).orderBy("true_lang", "predicted_lang").show()

    spark.stop()


if __name__ == "__main__":
    main()
