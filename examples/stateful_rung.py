#!/usr/bin/env python3
"""Stateful-streaming scale rung (r9): applyInPandasWithState throughput.

The registered stream_stateful_user_totals fixture is 3 tiny batches —
right for the driver's hash gate, useless as scale evidence. This probe
drives the same operator (streaming/stateful.running_user_totals_cents)
the way a deployment would: the events table split into N_SLICES
single-file batches (pinned mtimes, maxFilesPerTrigger=1), so per-key
state accumulates across N real micro-batches while the state store
grows to the full user population.

Timing is gated behind an EXACT check: the last emit per key must equal
the one-shot batch groupBy bit-for-bit (int-cents state — the fold is
order- and batch-grouping-invariant by construction, so any mismatch is
an operator bug, not noise).

Measured per rung: per-batch trigger latency (median/max, first vs last
— a growing state store must NOT slow later batches), end-to-end drain
wall, stateful rows/s, emitted-update amplification (update-mode emits
one row per key per batch it appears in). The scale-relevant reading is
rows/s ACROSS rungs: 10x rows and 10x distinct keys should hold
throughput ~flat (state touch is per-key-present-in-batch; the pandas
kernel is O(batch)); a super-linear drop would mean the state store or
the Arrow exchange grows with TOTAL state, which would kill the
operator at 100 TB.

Usage: python examples/stateful_rung.py SF_DIR [N_SLICES]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.catalog import load_table
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators.streamingq import (
    _publish_single_file_batch,
)
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.session import get_spark
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming.stateful import (
    running_user_totals_cents,
)


def main() -> None:
    sf_dir = sys.argv[1]
    n_slices = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("stateful-rung")
    spark.sparkContext.setLogLevel("ERROR")

    work = f"/tmp/stateful_rung_{os.path.basename(os.path.normpath(sf_dir))}_{int(time.time())}"
    src = os.path.join(work, "src")
    out = os.path.join(work, "result")
    ckpt = os.path.join(work, "ckpt")

    cents_rows = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
            F.col("event_id"),
        )
    )
    t_pub0 = time.monotonic()
    for j in range(n_slices):
        _publish_single_file_batch(
            spark,
            cents_rows.filter(F.col("event_id") % n_slices == j).drop("event_id"),
            src,
            f"b{j}",
            seq=j,
        )
    publish_s = time.monotonic() - t_pub0

    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming.progress import (
        ProgressLog as _Collector,
    )

    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("cents", T.LongType())]
    )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    totals = running_user_totals_cents(stream)

    def write_epoch(batch_df, epoch_id):
        batch_df.withColumn("_epoch", F.lit(int(epoch_id))).write.mode(
            "append"
        ).parquet(out)

    collector = _Collector()
    spark.streams.addListener(collector)
    t0 = time.monotonic()
    try:
        q = (
            totals.writeStream.outputMode("update")
            .foreachBatch(write_epoch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        qid = str(q.id)
        collector.wait_terminated(qid, 30)
        drain_s = time.monotonic() - t0
        batches = [d for d in collector.batches(qid) if d["input_rows"] > 0]
    finally:
        spark.streams.removeListener(collector)

    if not batches:
        # named failure instead of an IndexError at batches[0]/secs[-1]
        # below: either the events table was empty or the listener missed
        # the progress events inside the 30 s termination wait — the rung
        # numbers would be meaningless either way (ADVICE r9)
        raise SystemExit(
            "NO PROGRESS OBSERVED: listener delivered no batches with "
            f"input_rows>0 for query {qid} after drain ({drain_s:.1f}s) — "
            "empty source or missed termination event; rerun the rung"
        )

    # ---- exactness gate: last emit per key == one-shot batch groupBy ----
    # (same collapse the registered query ships — replay-idempotence
    # pinned in tests/test_streaming.py)
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators.streamingq import (
        last_emit_per_key,
    )

    emitted = spark.read.parquet(out)
    final = last_emit_per_key(emitted)
    want = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(F.col("user_id").cast("long").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "total_cents"
            ),
        )
    )
    n_mismatch = final.exceptAll(want).count() + want.exceptAll(final).count()
    if n_mismatch:
        raise SystemExit(f"EXACTNESS FAILED: {n_mismatch} mismatching rows")

    in_rows = sum(b["input_rows"] for b in batches)
    secs = sorted(b["trigger_s"] for b in batches)
    print(
        json.dumps(
            {
                "rung": "stateful_running_totals",
                "sf_dir": sf_dir,
                "n_slices": n_slices,
                "input_rows": in_rows,
                "n_keys": want.count(),
                "emitted_updates": emitted.count(),
                "publish_s": round(publish_s, 2),
                "drain_s": round(drain_s, 2),
                "rows_per_s": round(in_rows / drain_s, 0),
                "batch_trigger_s_median": round(secs[len(secs) // 2], 2),
                "batch_trigger_s_max": round(secs[-1], 2),
                "batch_trigger_s_first": round(batches[0]["trigger_s"], 2),
                "batch_trigger_s_last": round(batches[-1]["trigger_s"], 2),
                "exact": True,
            }
        )
    )


if __name__ == "__main__":
    main()
