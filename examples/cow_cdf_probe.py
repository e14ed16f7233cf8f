#!/usr/bin/env python3
"""Change-data-feed prune probe: numbers for the BENCH_NOTES CoW section.

Builds a 10M-key range-partitioned copy-on-write state (10 populated
1M-wide ranges — the same fixture the r6 range-vs-hash MERGE measurement
used), applies one clustered 10k-key update batch, then times the two
ways to answer "what changed between v0 and v1":

  1. partitioned_state_changes — the manifest-pruned CDF: reads ONLY
     buckets whose manifest pointer differs (here 1 of 10).
  2. full two-snapshot diff — read BOTH complete versions and full-outer
     join on key (the operators/warehouse.table_diff shape, the only
     option for unversioned tables).

Both produce the identical change set; the probe asserts that before
trusting the timings. The ratio is the point: the CDF's cost tracks the
touched fraction (GBs at 100 TB), the snapshot diff's cost tracks the
table. Usage:

    python examples/cow_cdf_probe.py [n_keys] [n_updates]

Prints one JSON line per variant.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.session import get_spark
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming import (
    partitioned_upsert as pu,
)


def timed(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def full_snapshot_diff(spark, state_dir):
    """The warehouse.table_diff shape: both versions read in FULL."""
    v0 = pu.read_partitioned_state_version(spark, state_dir, 0)
    v1 = pu.read_partitioned_state_version(spark, state_dir, 1)
    o, n = v0.alias("o"), v1.alias("n")
    j = o.join(n, F.col("o.key") == F.col("n.key"), "full_outer")
    return j.filter(
        F.col("o.key").isNull()
        | F.col("n.key").isNull()
        | (F.col("o.total") != F.col("n.total"))
        | (F.col("o.n_rows") != F.col("n.n_rows"))
    )


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_updates = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    spark = get_spark("cow_cdf_probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="cow_cdf_probe_")
    state = os.path.join(base, "state")
    try:
        # batch 0: the initial load — n_keys keys across n_keys/RANGE_WIDTH
        # contiguous ranges (deterministic amounts; no RNG by design)
        load = spark.range(n_keys).select(
            F.col("id").alias("key"),
            ((F.col("id") % 1000) / F.lit(100.0)).alias("amount"),
        )
        pu.merge_batch_into_partitioned_state(spark, state, load, 0)
        # batch 1: clustered CDC — n_updates keys inside ONE 1M range
        updates = spark.range(n_updates).select(
            (F.col("id") + (n_keys - pu.RANGE_WIDTH)).alias("key"),
            F.lit(5.0).alias("amount"),
        )
        pu.merge_batch_into_partitioned_state(spark, state, updates, 1)

        m0 = pu._manifest_for_batch(spark, state, 0)
        m1 = pu._manifest_for_batch(spark, state, 1)
        changed = pu.changed_bucket_ids(m0, m1)
        n_buckets = len(m1["buckets"])

        cdf_n = pu.partitioned_state_changes(spark, state, 0, 1).count()
        full_n = full_snapshot_diff(spark, state).count()
        assert cdf_n == full_n == n_updates, (cdf_n, full_n, n_updates)

        t_cdf = timed(
            lambda: pu.partitioned_state_changes(spark, state, 0, 1).count()
        )
        t_full = timed(lambda: full_snapshot_diff(spark, state).count())

        # zone-map bonus round: table aggregates from the manifest vs a scan
        def scan_summary():
            st = pu.read_latest_partitioned_state(spark, state)
            return st.agg(
                F.count(F.lit(1)),
                F.sum(F.col("total").cast("decimal(18,2)")).cast("double"),
                F.min("total"),
                F.max("total"),
            ).collect()[0]

        manifest_row = pu.partitioned_state_summary(spark, state).collect()[0]
        scan_row = scan_summary()
        assert manifest_row["n_keys"] == scan_row[0] and manifest_row["sum_total"] == scan_row[1]
        t_meta = timed(lambda: pu.partitioned_state_summary(spark, state).collect())
        t_scan = timed(scan_summary)
        for variant, sec in (("manifest_summary", t_meta), ("full_scan_aggregate", t_scan)):
            print(
                json.dumps(
                    {
                        "experiment": "cow_summary",
                        "variant": variant,
                        "n_keys": n_keys,
                        "buckets_total": n_buckets,
                        "buckets_read": 0 if variant == "manifest_summary" else n_buckets,
                        "sec": sec,
                    }
                )
            )
        for variant, sec in (("manifest_pruned_cdf", t_cdf), ("full_snapshot_diff", t_full)):
            print(
                json.dumps(
                    {
                        "experiment": "cow_cdf",
                        "variant": variant,
                        "n_keys": n_keys,
                        "n_updates": n_updates,
                        "buckets_total": n_buckets,
                        "buckets_read": len(changed) if variant.startswith("manifest") else n_buckets,
                        "changed_rows": cdf_n,
                        "sec": sec,
                    }
                )
            )

        # scattered-update round: every RANGE touched. CoW must rewrite
        # every bucket (its measured boundary); the merge-on-read append
        # writes O(|batch|). Both applied to a fresh copy of the v1 state.
        def du(path):
            total = 0
            for root, _, files in os.walk(path):
                total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
            return total

        scattered = spark.range(n_updates).select(
            (F.col("id") * (n_keys // n_updates)).alias("key"),
            F.lit(1.0).alias("amount"),
        )
        for variant in ("cow_merge", "mor_append"):
            s2 = os.path.join(base, f"state_{variant}")
            shutil.copytree(state, s2)
            before = du(s2)
            t0 = time.monotonic()
            if variant == "cow_merge":
                pu.merge_batch_into_partitioned_state(spark, s2, scattered, 2)
            else:
                pu.append_delta_batch(spark, s2, scattered, 2)
            sec = round(time.monotonic() - t0, 3)
            print(
                json.dumps(
                    {
                        "experiment": "scattered_update",
                        "variant": variant,
                        "n_keys": n_keys,
                        "n_updates": n_updates,
                        "mb_written": round((du(s2) - before) / 1e6, 1),
                        "sec": sec,
                    }
                )
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
