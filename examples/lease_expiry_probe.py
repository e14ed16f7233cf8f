#!/usr/bin/env python3
"""Lease-TTL expiry takeover rung (r12, VERDICT r11 ask #6).

Real wall-clock, real manifests, no backdating: a sequenced owner loads
two batches, then goes silent (simulated crash — the process just stops
committing). An unattended standby writer polls with `lease_ttl_ms`:

  1. while the owner's heartbeat (newest manifest mtime) is younger
     than the TTL, the claim is REFUSED naming the remaining lease;
  2. a heartbeat commit (no data touched) renews the lease and keeps
     the standby out for another TTL;
  3. once the heartbeat ages past the TTL, the SAME call — no manual
     takeover flag — claims the table under the manual-takeover safety
     rules (fresh batch id above the owner's newest + max_seq
     monotone), and the usurped owner is fenced loudly if it wakes up.

PASS = refused-then-claimed in that order, the fold is bit-exact
against the one-shot aggregate, and the woken owner cannot commit.

Usage: python examples/lease_expiry_probe.py SF_DIR [TTL_S]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    ttl_s = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0

    from pyspark.sql import functions as F

    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.catalog import load_table
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.session import get_spark
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming import (
        partitioned_upsert as pu,
    )
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming.logstore import (
        ConcurrentCommitError,
    )

    spark = get_spark("lease-expiry-probe")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.monotonic()

    work = f"/tmp/lease_probe_{os.path.basename(os.path.normpath(sf_dir))}_{int(time.time())}"
    state = os.path.join(work, "state")
    ttl_ms = int(ttl_s * 1000)

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.col("o_totalprice").alias("amount"),
        F.lit("upsert").alias("op"),
        F.col("o_orderkey").alias("seq"),
    )
    max_key = orders.agg(F.max("key")).first()[0]
    width = max(100, math.ceil((max_key + 1) / 16))
    mid = orders.approxQuantile("seq", [0.5], 0.0)[0]

    # the owner loads two sequenced batches, then "crashes"
    b0 = orders.filter(F.col("seq") <= mid)
    b1 = orders.filter(F.col("seq") > mid)
    pu.append_delta_batch(spark, state, b0, 0, range_width=width, writer_id="owner")

    def claim(batch_df, batch_id) -> str:
        try:
            pu.append_delta_batch(
                spark, state, batch_df, batch_id,
                range_width=width, writer_id="standby", lease_ttl_ms=ttl_ms,
            )
            return "claimed"
        except ConcurrentCommitError as e:
            if "lease is LIVE" not in str(e):
                raise
            return "refused"

    # (1) live lease: refused
    first = claim(b1, 1)
    if first != "refused":
        raise SystemExit(f"claim against a live lease was not refused: {first}")

    # (2) heartbeat renews it
    time.sleep(ttl_s * 0.6)
    pu.heartbeat_partitioned_state(spark, state)
    second = claim(b1, 1)
    if second != "refused":
        raise SystemExit("claim right after a heartbeat was not refused")

    # (3) silence past the TTL: the SAME call claims, no manual flag
    waited = 0.0
    verdicts = []
    while True:
        time.sleep(ttl_s / 4)
        waited += ttl_s / 4
        v = claim(b1, 1)
        verdicts.append(v)
        if v == "claimed":
            break
        if waited > 6 * ttl_s:
            raise SystemExit(f"lease never expired: {verdicts}")

    # the woken owner is fenced out and cannot clobber the new lineage
    # (fresh in-order seq so the FENCE is what rejects it, not the
    # monotone guard that runs first)
    max_seq = orders.agg(F.max("seq")).first()[0]
    wake = spark.createDataFrame(
        [(1, 1.0, "upsert", int(max_seq) + 1)],
        "key long, amount double, op string, seq long",
    )
    try:
        pu.append_delta_batch(
            spark, state, wake, 2, range_width=width, writer_id="owner"
        )
        raise SystemExit("usurped owner was allowed to commit")
    except ConcurrentCommitError:
        pass

    got = pu.read_latest_partitioned_state(spark, state)
    want = orders.groupBy("key").agg(
        F.sum(F.col("amount").cast("decimal(18,2)")).cast("double").alias("total"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    n_mismatch = got.exceptAll(want).count() + want.exceptAll(got).count()
    if n_mismatch:
        raise SystemExit(f"EXACTNESS FAILED: {n_mismatch} mismatching rows")

    print(
        json.dumps(
            {
                "rung": "lease_expiry",
                "sf_dir": sf_dir,
                "ttl_s": ttl_s,
                "pre_expiry_refusals": 2 + verdicts.count("refused"),
                "claimed_after_s": round(waited, 2),
                "owner_fenced_after_usurp": True,
                "exact": True,
                "wall_s": round(time.monotonic() - t0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
