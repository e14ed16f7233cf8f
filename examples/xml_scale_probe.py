#!/usr/bin/env python3
"""XML source scale rung (r7, VERDICT ask #6): the reference's core
source family (S1-S5) was exercised only at pharma size (11k rows);
every other scale rung is parquet. This probe measures the two XML read
paths — the native distributed `format("xml")` scan and the
wholetext+xpath fallback — on a deterministic pharma-shaped corpus at
configurable size, so SCALE.md can record a real decade instead of an
asserted one.

Corpus: pharmaSalesTxn-shaped records (product element, rep attribute,
nested customer struct, decimal amount), generated DISTRIBUTED from
spark.range — fully deterministic in n_records (id arithmetic, no RNG),
one text part-file per requested shard. ~130 B/record: 1 GB ≈ 8M
records.

Timed work per path: full-scan aggregation (count, exact decimal
SUM(amount), distinct rep count) — forces every record through the
shred + field extraction, the same shape stage 1 of the pharma pipeline
pays. The two paths must agree exactly (asserted) before timing counts.

Usage:
  python examples/xml_scale_probe.py OUT_DIR N_RECORDS N_FILES [--keep]
Prints one JSON line:
  {"n_records": N, "bytes": B, "native_sec": s, "xpath_sec": s, ...}

The same generator/aggregations back tests/test_xml_sources.py's
equivalence + one-scan plan assertions at tiny size; this script exists
for the big rungs (see SCALE.md "XML source" for recorded numbers).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.session import get_spark
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.sources.xml import (
    read_xml,
    read_xml_xpath,
    write_xml_shards,
)

ROW_TAG = "txn"
XPATH_FIELDS = {
    "product": "txn/product",
    "rep_id": "txn/rep/@rID",
    "cust": "txn/customer/cust",
    "country": "txn/customer/country",
    "amount": "txn/amount",
}


def build_xml_corpus(spark: SparkSession, out_dir: str, n_records: int, n_files: int) -> None:
    """Write n_records pharma-shaped <txn> records as n_files well-formed
    XML shards (each wrapped in a <txns> document root — the native
    source parses per-file DOCUMENTS and stops at the root's end, so
    rootless record streams silently yield ~1 record/file). Fully
    deterministic: every field is id arithmetic. The root wrap happens
    in mapPartitions, so generation stays distributed and record order
    within a shard is the partition's."""
    idc = F.col("id")
    xml = spark.range(n_records).select(
        F.concat(
            F.lit('<txn><product>Drug'), (idc % 997).cast("string"),
            F.lit('</product><rep rID="r'), (idc % 97).cast("string"),
            F.lit('"/><customer><cust>Customer '), (idc % 10007).cast("string"),
            F.lit("</cust><country>"),
            F.element_at(
                F.array(F.lit("USA"), F.lit("Brazil"), F.lit("India"), F.lit("Kenya")),
                (idc % 4 + 1).cast("int"),
            ),
            F.lit("</country></customer><amount>"),
            ((idc * 37 % 900000 + 100) / F.lit(100)).cast("decimal(18,2)").cast("string"),
            F.lit("</amount></txn>"),
        ).alias("value")
    )

    write_xml_shards(xml, out_dir, n_files)


def native_agg(spark: SparkSession, corpus_dir: str) -> DataFrame:
    df = read_xml(spark, corpus_dir, ROW_TAG)
    return df.select(
        F.col("product"),
        F.col("rep._rID").alias("rep_id"),
        F.col("amount").cast("decimal(18,2)").alias("amount"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("amount").cast("decimal(28,2)").alias("total"),
        F.countDistinct("rep_id").alias("n_reps"),
        F.countDistinct("product").alias("n_products"),
    )


def xpath_agg(spark: SparkSession, corpus_dir: str) -> DataFrame:
    df = read_xml_xpath(spark, f"{corpus_dir}/part-*", ROW_TAG, XPATH_FIELDS)
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("amount").cast("decimal(18,2)")).cast("decimal(28,2)").alias("total"),
        F.countDistinct("rep_id").alias("n_reps"),
        F.countDistinct("product").alias("n_products"),
    )


def corpus_bytes(out_dir: str) -> int:
    return sum(
        os.path.getsize(os.path.join(out_dir, f))
        for f in os.listdir(out_dir)
        if f.startswith("part-")
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--keep"]
    keep = "--keep" in sys.argv
    out_dir, n_records, n_files = args[0], int(args[1]), int(args[2])
    spark = get_spark("xml-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    build_xml_corpus(spark, out_dir, n_records, n_files)
    nbytes = corpus_bytes(out_dir)

    # equivalence gate before timing: both paths, same answer
    a = native_agg(spark, out_dir).collect()[0].asDict()
    b = xpath_agg(spark, out_dir).collect()[0].asDict()
    assert a == b, f"native vs xpath disagree: {a} vs {b}"

    def timed(fn) -> float:
        t0 = time.time()
        fn(spark, out_dir).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    # warm pass already ran (the equivalence gate); time steady state
    result = {
        "n_records": n_records,
        "n_files": n_files,
        "bytes": nbytes,
        "native_sec": timed(native_agg),
        "xpath_sec": timed(xpath_agg),
        "agg": {k: str(v) for k, v in a.items()},
    }
    if not keep:
        shutil.rmtree(out_dir, ignore_errors=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
