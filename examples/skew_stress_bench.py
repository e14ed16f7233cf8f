#!/usr/bin/env python3
"""Skew-stress timing ladder (r5): numbers for the BENCH_NOTES skew section.

Measures, at two fixture scales (sf0.1-like 600k rows, sf1-like 6M rows,
one key owning 20% of rows):
  1. fact-to-fact join on the hot key: AQE skew-join ON vs OFF
  2. algebraic agg (sum/count): salted vs direct
  3. holistic agg (collect_list payload): salted vs direct

Usage: python examples/skew_stress_bench.py [n_rows ...]
Prints one JSON line per (scale, experiment, variant).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.session import get_spark
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.skewlab import (
    direct_payload_lists,
    direct_totals,
    make_skewed_facts,
    salted_payload_lists,
    salted_totals,
    skewed_join,
)

SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(8 * 1024 * 1024),
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(4 * 1024 * 1024),
}


def timed(fn, reps=None):
    # SPARK_GRAFT_SKEW_REPS trims repetitions for the large rungs (r6 runs
    # the ladder to 100M rows, where best-of-3 on every variant would cost
    # more wall-clock than the extra rep buys in stability)
    reps = reps or int(os.environ.get("SPARK_GRAFT_SKEW_REPS", "3"))
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main():
    scales = [int(x) for x in sys.argv[1:]] or [600_000, 6_000_000]
    spark = get_spark("skew-stress")
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in SKEW_CONFS.items():
        spark.conf.set(k, v)
    for n in scales:
        with tempfile.TemporaryDirectory(prefix="skewlab") as td:
            a_path, b_path = make_skewed_facts(spark, td, n)
            a = spark.read.parquet(a_path)

            def join_run():
                skewed_join(spark, a_path, b_path).collect()

            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            t_on = timed(join_run)
            probe = skewed_join(spark, a_path, b_path)
            joined_rows = probe.collect()[0]["n"]
            # executedPlan AFTER the action: isFinalPlan=true, AQE markers real
            plan = probe._jdf.queryExecution().executedPlan().toString()
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
            t_off = timed(join_run)
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            print(json.dumps({"n_rows": n, "exp": "join", "skew_on_sec": t_on,
                              "skew_off_sec": t_off,
                              "joined_rows": joined_rows,
                              "split_triggered": "skewed" in plan}))

            # consume via a checksum over ALL output columns — a bare
            # .count() lets Catalyst PRUNE the aggregate expressions (the
            # collect_list never runs and the timing measures a key count)
            def drain(df):
                # bit_xor: overflow-free (ANSI mode) and unprunable
                cols = [F.expr(f"bit_xor(xxhash64({c}))").alias(c) for c in df.columns]
                df.agg(*cols).collect()

            t_direct = timed(lambda: drain(direct_totals(a)))
            t_salted = timed(lambda: drain(salted_totals(a)))
            print(json.dumps({"n_rows": n, "exp": "algebraic_agg",
                              "direct_sec": t_direct, "salted_sec": t_salted}))

            t_directh = timed(lambda: drain(direct_payload_lists(a)))
            t_saltedh = timed(lambda: drain(salted_payload_lists(a)))
            print(json.dumps({"n_rows": n, "exp": "holistic_agg",
                              "direct_sec": t_directh, "salted_sec": t_saltedh}))


if __name__ == "__main__":
    main()
