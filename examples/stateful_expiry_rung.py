#!/usr/bin/env python3
"""State-EXPIRY rung (r10, VERDICT ask #4): measure what bounds the
state store under key churn — the property that decides whether a
sessionization workload survives 100 TB.

Topology: S slices of U fresh keys each (full churn — every key is
active in exactly one slice, the worst case for an expiry-less store),
E events per key inside one session gap. The same stream runs twice
through streaming/stateful.gap_sessions (applyInPandasWithState under
GroupStateTimeout.ProcessingTimeTimeout):

  short: timeout_ms well under the drain wall — silent keys EVICT while
         later slices are still arriving; the store stays O(active keys)
         and every eviction emits the key's completed session
         (closed_by='timeout'), checked bit-exact against the one-shot
         batch sessionization;
  long:  timeout_ms past the whole run — nothing evicts; the store grows
         to O(all keys ever seen), the unbounded baseline the short run
         is measured against.

Metrics come from the engine's own stateOperators progress rows
(numRowsTotal / numRowsRemoved), not from instrumentation inside the
state function. Prints one JSON line; findings go to SCALE.md.

Usage: python examples/stateful_expiry_rung.py [SLICES] [KEYS_PER_SLICE] [EVENTS_PER_KEY]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

GAP_US = 1_000_000  # 1 s event-time gap; each key's events fit inside


def run_once(
    spark, src: str, workdir: str, tag: str, timeout_ms: int, n_rows_expected: int
) -> dict:
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming.stateful import (
        gap_sessions,
    )

    out = os.path.join(workdir, f"out_{tag}")
    ckpt = os.path.join(workdir, f"ckpt_{tag}")

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts_us", T.LongType()),
            T.StructField("flush", T.BooleanType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming.progress import (
        ProgressLog,
    )

    collector = ProgressLog()
    spark.streams.addListener(collector)
    t0 = time.monotonic()
    try:
        q = (
            gap_sessions(stream, GAP_US, timeout_ms=timeout_ms)
            .writeStream.outputMode("append")
            .foreachBatch(
                lambda b, e: b.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="300 milliseconds")
            .start()
        )
        qid = str(q.id)
        deadline = time.monotonic() + 600
        while (
            time.monotonic() < deadline
            and collector.input_rows(qid) < n_rows_expected
        ):
            time.sleep(0.3)
        if collector.input_rows(qid) < n_rows_expected:
            raise SystemExit(
                f"[{tag}] drained only {collector.input_rows(qid)}"
                f"/{n_rows_expected} rows in 600s"
            )
        drain_s = time.monotonic() - t0
        # post-drain window: let pending timeouts fire (short run) so the
        # end-state row count reflects eviction, not just drain timing.
        # Capped: the LONG baseline's timeout is deliberately beyond the
        # run, so waiting it out would measure nothing but wall-clock
        settle_until = time.monotonic() + min(
            15.0, max(3.0, timeout_ms / 1000 + 3.0)
        )
        while time.monotonic() < settle_until:
            time.sleep(0.5)
        q.stop()
        q.awaitTermination()
    finally:
        spark.streams.removeListener(collector)

    rows = collector.batches(qid)
    state_curve = [d["state_rows"] for d in rows]
    return {
        "tag": tag,
        "timeout_ms": timeout_ms,
        "drain_s": round(drain_s, 2),
        "max_state_rows": max(state_curve) if state_curve else 0,
        "end_state_rows": state_curve[-1] if state_curve else 0,
        "rows_removed": sum(d["state_removed"] for d in rows),
        "out_dir": out,
    }


def main() -> None:
    n_slices = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    keys_per_slice = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    events_per_key = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.session import get_spark

    spark = get_spark("stateful-expiry-rung", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    work = f"/tmp/stateful_expiry_{int(time.time())}"
    src = os.path.join(work, "src")
    os.makedirs(src)

    # slice j: keys [j*K, (j+1)*K), each with E events 10ms apart (one
    # session per key); published with pinned mtimes => delivery order
    total_keys = n_slices * keys_per_slice
    n_rows = total_keys * events_per_key
    base = spark.range(total_keys).select(
        F.col("id").alias("user_id"),
        F.floor(F.col("id") / keys_per_slice).cast("long").alias("slice"),
    )
    events = base.crossJoin(spark.range(events_per_key).select(F.col("id").alias("e"))).select(
        "user_id",
        "slice",
        (F.col("slice") * 60_000_000 + F.col("user_id") * 10 + F.col("e") * 10_000)
        .cast("long")
        .alias("ts_us"),
        F.lit(False).alias("flush"),
    )
    for j in range(n_slices):
        p = os.path.join(src, f"s{j:03d}")
        events.filter(F.col("slice") == j).drop("slice").coalesce(1).write.parquet(p)
        part = [f for f in os.listdir(p) if f.endswith(".parquet")]
        assert len(part) == 1
        final = os.path.join(src, f"s{j:03d}.parquet")
        os.rename(os.path.join(p, part[0]), final)
        os.utime(final, (1_000_000_000 + 60 * j, 1_000_000_000 + 60 * j))
        import shutil

        shutil.rmtree(p)

    short = run_once(spark, src, work, "short", 1_000, n_rows)
    long_ = run_once(spark, src, work, "long", 600_000, n_rows)

    # exactness for the SHORT run: every evicted key emitted its one full
    # session; union must equal the batch sessionization (1 session/key)
    emitted = spark.read.parquet(short["out_dir"]).select(
        "user_id", "session_seq", "n_events", "session_start_us", "session_end_us"
    )
    want = (
        events.groupBy("user_id")
        .agg(
            F.lit(1).cast("long").alias("session_seq"),
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
        )
    )
    n_mismatch = emitted.exceptAll(want).count() + want.exceptAll(emitted).count()
    if n_mismatch:
        raise SystemExit(f"EXACTNESS FAILED: {n_mismatch} mismatching rows")

    print(
        json.dumps(
            {
                "rung": "stateful_expiry",
                "slices": n_slices,
                "total_keys": total_keys,
                "keys_per_slice": keys_per_slice,
                "input_rows": n_rows,
                "short": {k: v for k, v in short.items() if k != "out_dir"},
                "long": {k: v for k, v in long_.items() if k != "out_dir"},
                "state_bound_ratio": round(
                    short["max_state_rows"] / max(1, long_["max_state_rows"]), 3
                ),
                "exact": True,
            }
        )
    )


if __name__ == "__main__":
    main()
