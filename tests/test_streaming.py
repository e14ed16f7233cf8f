"""Structured Streaming: bounded file-source streams with availableNow,
cross-checked against the batch twins (which are themselves oracle-checked)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.catalog import load_table
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming import ingest, windows


def test_tumbling_stream_matches_batch(spark, sf_dir, tmp_path):
    ev_stream = windows.read_events_stream(spark, sf_dir)
    got = windows.run_to_memory(
        windows.tumbling_counts_stream(ev_stream), "t_tumbling"
    )
    # batch twin (oracle-checked in test_oracle_parity)
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators.eventsops import (
        q_tumbling_hourly,
    )

    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in q_tumbling_hourly(spark, sf_dir).collect()
    }
    stream = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in got.collect()
    }
    assert stream == batch


def test_session_stream_window_counts(spark, sf_dir):
    ev_stream = windows.read_events_stream(spark, sf_dir)
    got = windows.run_to_memory(
        windows.session_counts_stream(ev_stream), "t_sessions"
    )
    # total events across sessions == table size; session count matches the
    # batch gaps-and-islands sessionization
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators.eventsops import (
        q_session_stats,
    )

    n_events_total = got.agg(F.sum("n_events")).collect()[0][0]
    assert n_events_total == load_table(spark, sf_dir, "events").count()
    assert got.count() == q_session_stats(spark, sf_dir).count()


def test_stream_append_ingest_bag_semantics(spark, tmp_path):
    """Six overlapping files through the streaming appender: every row of
    every file lands (bag), one micro-batch per file."""
    src = tmp_path / "src"
    src.mkdir()
    rows_per_file = [4, 4, 3, 2, 2, 2]
    for i, n in enumerate(rows_per_file):
        with open(src / f"txn-{i}.json", "w") as f:
            for j in range(n):
                f.write(
                    json.dumps(
                        {
                            "txn_id": 1000 + j,  # ids overlap across files
                            "product_name": f"p{j}",
                            "rep_id": "332",
                            "customer_name": f"c{j}",
                            "country": "USA",
                            "sale_date": "9/8/2020",
                            "sale_amount": 100.0 + j,
                        }
                    )
                    + "\n"
                )
    dest = str(tmp_path / "dest")
    n_batches = ingest.stream_append_ingest(
        spark, str(src), dest, str(tmp_path / "ckpt")
    )
    out = spark.read.parquet(dest)
    assert out.count() == sum(rows_per_file)          # duplicates preserved
    assert out.select("txn_id").distinct().count() == 4
    assert n_batches == len(rows_per_file)            # one file per trigger
