#!/usr/bin/env python3
"""Watermark-bounded state rung (r10): the event-time twin of
stateful_expiry_rung.

Same full-churn topology (S time-ordered slices of U fresh keys, E
events per key inside one gap), driven through
streaming/stateful.event_time_sessions — where expiry is the WATERMARK
passing each session's gap horizon, not a wall clock. Two runs:

  short: gap smaller than the inter-slice spacing — each slice's
         sessions expire as soon as the next slice's watermark arrives;
         the store stays O(one slice of keys) and every key's single
         session is emitted, checked bit-exact against the batch
         sessionization;
  long:  gap beyond the whole time range — no horizon is ever passed;
         the store grows to O(all keys ever seen) and nothing emits
         (sessions never close), the unbounded baseline.

Both runs use plain trigger(availableNow) + awaitTermination — the
event-time timeout self-terminates (extra batches only on watermark
advance), which is itself part of what this rung demonstrates. Metrics
from the engine's stateOperators rows. Prints one JSON line.

Usage: python examples/eventtime_expiry_rung.py [SLICES] [KEYS_PER_SLICE] [EVENTS_PER_KEY]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SLICE_SPACING_US = 60_000_000  # slices 60 s apart in event time
# synthetic timeline base: an event at epoch 0 sits exactly AT the
# initial watermark (0) and is dropped as late — start well above it
BASE_US = 1_700_000_000_000_000
SHORT_GAP_US = 1_000_000  # 1 s: expires at the next slice's watermark
LONG_GAP_US = 10**15  # beyond the range: nothing ever expires


def run_once(spark, src: str, workdir: str, tag: str, gap_us: int) -> dict:
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming.progress import (
        ProgressLog,
    )
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming.stateful import (
        event_time_sessions,
    )

    out = os.path.join(workdir, f"out_{tag}")
    ckpt = os.path.join(workdir, f"ckpt_{tag}")
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "0 seconds")
    )
    collector = ProgressLog()
    spark.streams.addListener(collector)
    t0 = time.monotonic()
    try:
        q = (
            event_time_sessions(stream, gap_us)
            .writeStream.outputMode("append")
            .foreachBatch(lambda b, e: b.write.mode("append").parquet(out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            raise SystemExit(f"[{tag}] stream did not self-terminate in 600s")
        qid = str(q.id)
        collector.wait_terminated(qid, 30)
        drain_s = time.monotonic() - t0
    finally:
        spark.streams.removeListener(collector)
    rows = collector.batches(qid)
    curve = [d["state_rows"] for d in rows]
    return {
        "tag": tag,
        "gap_us": gap_us,
        "drain_s": round(drain_s, 2),
        "n_batches": len(rows),
        "max_state_rows": max(curve) if curve else 0,
        "end_state_rows": curve[-1] if curve else 0,
        "rows_removed": sum(d["state_removed"] for d in rows),
        "out_dir": out,
    }


def main() -> None:
    n_slices = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    keys_per_slice = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    events_per_key = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.session import get_spark

    spark = get_spark("eventtime-expiry-rung", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    work = f"/tmp/eventtime_expiry_{int(time.time())}"
    src = os.path.join(work, "src")
    os.makedirs(src)

    total_keys = n_slices * keys_per_slice
    base = spark.range(total_keys).select(
        F.col("id").alias("user_id"),
        F.floor(F.col("id") / keys_per_slice).cast("long").alias("slice"),
    )
    events = base.crossJoin(
        spark.range(events_per_key).select(F.col("id").alias("e"))
    ).select(
        "user_id",
        "slice",
        F.timestamp_micros(
            F.lit(BASE_US)
            + F.col("slice") * SLICE_SPACING_US
            + F.col("user_id") * 10
            + F.col("e") * 10_000
        ).alias("ts"),
    )

    # the shared fixture publisher owns the load-bearing mtime pinning
    # (coarse-granularity timestamp ties silently invert delivery order)
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators.streamingq import (
        _publish_single_file_batch,
    )

    def publish(df, name: str, seq: int) -> None:
        _publish_single_file_batch(spark, df, src, name, seq)

    for j in range(n_slices):
        publish(events.filter(F.col("slice") == j).drop("slice"), f"s{j:03d}", j)
    hi_us = BASE_US + n_slices * SLICE_SPACING_US + SHORT_GAP_US + 60_000_000
    publish(
        spark.range(1).select(
            F.lit(-1).cast("long").alias("user_id"),
            F.timestamp_micros(F.lit(hi_us)).alias("ts"),
        ),
        "s_sentinel",
        n_slices,
    )

    short = run_once(spark, src, work, "short", SHORT_GAP_US)
    long_ = run_once(spark, src, work, "long", LONG_GAP_US)

    emitted = (
        spark.read.parquet(short["out_dir"])
        .filter(F.col("user_id") >= 0)
        .select("user_id", "n_events", "session_start_us", "session_end_us")
        # a replayed foreachBatch epoch re-appends byte-identical rows;
        # collapse them like the registered query does, or the multiset
        # exceptAll below would report a false mismatch
        .distinct()
    )
    want = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.unix_micros("ts")).alias("session_start_us"),
        F.max(F.unix_micros("ts")).alias("session_end_us"),
    )
    n_mismatch = emitted.exceptAll(want).count() + want.exceptAll(emitted).count()
    if n_mismatch:
        raise SystemExit(f"EXACTNESS FAILED: {n_mismatch} mismatching rows")
    long_emitted = (
        spark.read.parquet(long_["out_dir"]).count()
        if os.path.isdir(long_["out_dir"])
        else 0
    )

    print(
        json.dumps(
            {
                "rung": "eventtime_expiry",
                "slices": n_slices,
                "total_keys": total_keys,
                "keys_per_slice": keys_per_slice,
                "input_rows": total_keys * events_per_key,
                "short": {k: v for k, v in short.items() if k != "out_dir"},
                "long": {k: v for k, v in long_.items() if k != "out_dir"},
                "long_emitted_rows": long_emitted,
                "state_bound_ratio": round(
                    short["max_state_rows"] / max(1, long_["max_state_rows"]), 3
                ),
                "exact": True,
            }
        )
    )


if __name__ == "__main__":
    main()
