#!/usr/bin/env python3
"""XML STREAMING ingest scale rung (r9, VERDICT r8 ask #4): the r8
streaming twin `sources/xml.stream_xml_files_ordered` was verified only
at fixture size (six pharma files, 11k rows); the batch XML paths got
their decade in r7. This probe gives the streamed path the same
treatment on the same deterministic pharma-shaped corpus
(`xml_scale_probe.build_xml_corpus`): files/sec, per-batch trigger
latency, sink growth — and gates timing behind an exact stream/batch
parity check (row count + order-sensitive content hash including the
(file_idx, seq) columns the dedup/surrogate-key operators depend on).

Usage:
  python examples/xml_stream_probe.py OUT_DIR N_RECORDS N_FILES [--keep]
Prints one JSON line.

Positioning (same as the source's docstring): this is the
dimension-scale ORDERED ingest path — one file per micro-batch, order
columns derived per batch. The 100 TB scan is read_xml's distributed
shred (measured in r7); order-tagged ingest is only meaningful where
order exists, and its unit of scale is the FILE, so the rung varies
file count and file size across a decade of bytes.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQueryListener

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.session import get_spark
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.sources.xml import (
    read_xml_files_ordered,
    stream_xml_files_ordered,
)
from xml_scale_probe import ROW_TAG, build_xml_corpus

STREAM_SCHEMA = T.StructType(
    [
        T.StructField("product", T.StringType()),
        T.StructField("rep", T.StructType([T.StructField("_rID", T.StringType())])),
        T.StructField(
            "customer",
            T.StructType(
                [
                    T.StructField("cust", T.StringType()),
                    T.StructField("country", T.StringType()),
                ]
            ),
        ),
        T.StructField("amount", T.DoubleType()),
    ]
)


def _signature(df):
    """Order-sensitive content signature: count + exact decimal sum +
    a commutative hash over every field INCLUDING (file_idx, seq) —
    a reordered or dropped record moves it."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("amount").cast("decimal(18,2)")).alias("s"),
        F.sum(
            F.xxhash64(
                F.col("product"),
                F.col("rep._rID"),
                F.col("customer.cust"),
                F.col("customer.country"),
                F.col("amount").cast("decimal(18,2)").cast("string"),
                F.col("file_idx"),
                F.col("seq"),
            ).cast("decimal(38,0)")  # widened: a long SUM of hashes overflows
        ).alias("h"),
    ).first()
    return (row["n"], str(row["s"]), row["h"])


class _Collector(StreamingQueryListener):
    def __init__(self):
        self.trigger_s = []
        self.done = threading.Event()

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        self.trigger_s.append(
            event.progress.durationMs.get("triggerExecution", 0) / 1000.0
        )

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        self.done.set()


def _tree_bytes(root: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def main() -> None:
    out_dir = sys.argv[1]
    n_records = int(sys.argv[2])
    n_files = int(sys.argv[3])
    keep = "--keep" in sys.argv[4:]
    spark = get_spark("xml-stream-probe")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = os.path.join(out_dir, "xml")
    if not os.path.isdir(corpus) or not os.listdir(corpus):
        build_xml_corpus(spark, corpus, n_records, n_files)
    paths = sorted(
        os.path.join(corpus, f)
        for f in os.listdir(corpus)
        if f.startswith("part-") or f.endswith(".xml")
    )
    corpus_bytes = _tree_bytes(corpus)

    # batch ordered read (the r7-verified reference) — timed for contrast
    t0 = time.monotonic()
    batch_sig = _signature(read_xml_files_ordered(spark, paths, ROW_TAG))
    batch_s = time.monotonic() - t0

    # streamed ordered ingest: stage + one file per micro-batch + order
    # columns per batch + parquet append sink
    work = os.path.join(out_dir, "stream_work")
    shutil.rmtree(work, ignore_errors=True)
    coll = _Collector()
    spark.streams.addListener(coll)
    try:
        t0 = time.monotonic()
        sink_df = stream_xml_files_ordered(
            spark, paths, ROW_TAG, STREAM_SCHEMA, work
        )
        stream_s = time.monotonic() - t0
        coll.done.wait(timeout=60)
    finally:
        spark.streams.removeListener(coll)
    stream_sig = _signature(sink_df)
    sink_bytes = _tree_bytes(os.path.join(work, "sink"))

    if stream_sig != batch_sig:
        raise SystemExit(
            f"stream/batch parity BROKEN: batch={batch_sig} stream={stream_sig}"
        )

    trig = sorted(coll.trigger_s)
    print(
        json.dumps(
            {
                "n_records": n_records,
                "n_files": n_files,
                "corpus_bytes": corpus_bytes,
                "batch_ordered_s": round(batch_s, 2),
                "stream_total_s": round(stream_s, 2),
                "batch_trigger_s_median": round(trig[len(trig) // 2], 2)
                if trig
                else None,
                "batch_trigger_s_max": round(trig[-1], 2) if trig else None,
                "files_per_s": round(n_files / stream_s, 2),
                "records_per_s": int(n_records / stream_s),
                "sink_bytes": sink_bytes,
                "parity": "exact",
            }
        )
    )
    if not keep:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
