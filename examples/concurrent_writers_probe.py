#!/usr/bin/env python3
"""N OS-process writers race the merge-on-read append on ONE table.

The commit protocol's guarantees are unit-proven at thread level
(tests/test_logstore.py contract matrix, the in-process optimistic-append
race in tests/test_partitioned_upsert.py) and the arbiter at process
level; this probe closes the remaining gap END-TO-END: separate Spark
DRIVERS (own JVMs, own sessions) concurrently committing real delta
batches to the same state dir through a multi-process store — the
token-owned FileLock file (SPARK_GRAFT_LOG_STORE=filelock, no external
service needed) or the remote commit arbiter — each using the
Delta-style optimistic loop (append_delta_batch_optimistic: next id
from the manifest head, retry on lost race with a refreshed basis).
Optionally a further MAINTENANCE process runs the housekeeping loop
(folds/compaction/retention) against the live writers.

PASS = (a) every slice committed exactly once under a distinct batch id
across all writers, (b) the folded read equals the one-shot batch
aggregate of all rows bit-exactly, (c) at least one ConcurrentCommitError
retry was observed (proof the writers actually raced — a clean-split run
would be vacuous; the parent re-runs on a fresh state path if no
conflict happened). This probe caught three live protocol bugs in r9
(see SCALE.md's concurrent-writers section).

Usage: python examples/concurrent_writers_probe.py SF_DIR [SLICES_PER_WRITER] [N_WRITERS] [STORE]
STORE: filelock (default) | arbiter — arbiter spins up the cross-process
commit-arbiter service (streaming/arbiter_server) and points every
writer at it, so BOTH multi-process deployment paths run the identical
racing workload.
Prints one JSON line. Writer-subprocess mode (internal):
  ... --writer STATE_DIR WIDTH SLICE_DIR [SLICE_DIR ...]
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def writer_main() -> None:
    """Subprocess entry: append each slice optimistically; one JSON line."""
    state_dir, width = sys.argv[2], int(sys.argv[3])
    slice_dirs = sys.argv[4:]
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.session import get_spark
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming.partitioned_upsert import (
        append_delta_batch_optimistic,
    )

    spark = get_spark(f"concurrent-writer-{os.getpid()}", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    stats: dict = {}
    commits = []
    t0 = time.monotonic()
    for d in slice_dirs:
        df = spark.read.parquet(d)
        commits.append(
            append_delta_batch_optimistic(
                spark, state_dir, df, range_width=width, stats=stats
            )
        )
    print(
        json.dumps(
            {
                "pid": os.getpid(),
                "commits": commits,
                "conflicts": stats.get("conflicts", 0),
                "wall_s": round(time.monotonic() - t0, 2),
            }
        )
    )


def maintenance_main() -> None:
    """Subprocess entry: the housekeeping loop a deployment schedules
    ALONGSIDE live writers — delta folds, bucket compaction, retention
    with the default debris age horizon (which is what keeps the racing
    writers' in-flight attempt dirs safe). Lost races against the
    writers are expected and retried next round; one JSON line."""
    state_dir, stopfile = sys.argv[2], sys.argv[3]
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.session import get_spark
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming.logstore import (
        ConcurrentCommitError,
    )
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming.partitioned_upsert import (
        maintain_partitioned_state,
    )

    spark = get_spark(f"concurrent-maint-{os.getpid()}", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rounds = conflicts = folded = compacted = expired = 0
    while not os.path.exists(stopfile):
        try:
            r = maintain_partitioned_state(spark, state_dir, max_pending_deltas=2)
            folded += r["deltas_folded"]
            compacted += r["buckets_compacted"]
            expired += r["versions_expired"]
        except ConcurrentCommitError:
            conflicts += 1
        rounds += 1
        time.sleep(0.3)
    # one final pass on the now-quiet table: the folds that lost races
    # against live writers land here, so the parent's exactness check
    # reads THROUGH a real compaction, not only pending deltas
    r = maintain_partitioned_state(spark, state_dir, max_pending_deltas=1)
    folded += r["deltas_folded"]
    compacted += r["buckets_compacted"]
    expired += r["versions_expired"]
    print(
        json.dumps(
            {
                "pid": os.getpid(),
                "maint_rounds": rounds,
                "maint_conflicts": conflicts,
                "deltas_folded": folded,
                "buckets_compacted": compacted,
                "versions_expired": expired,
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--writer":
        writer_main()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--maintenance":
        maintenance_main()
        return

    sf_dir = sys.argv[1]
    n_per_writer = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_writers = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    store = sys.argv[4] if len(sys.argv) > 4 else "filelock"
    with_maint = len(sys.argv) > 5 and sys.argv[5] == "maint"
    from pyspark.sql import functions as F

    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.catalog import load_table
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.session import get_spark

    spark = get_spark("concurrent-writers-probe")
    spark.sparkContext.setLogLevel("ERROR")

    work = f"/tmp/conc_writers_{os.path.basename(os.path.normpath(sf_dir))}_{int(time.time())}"
    state = os.path.join(work, "state")
    n_slices = n_writers * n_per_writer

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderkey").alias("okey"),
    )
    max_key = orders.agg(F.max("key")).first()[0]
    width = max(100, math.ceil((max_key + 1) / 16))

    slice_dirs = []
    for j in range(n_slices):
        d = os.path.join(work, f"slice{j}")
        orders.filter(F.col("okey") % n_slices == j).drop("okey").write.parquet(d)
        slice_dirs.append(d)

    env = dict(os.environ, SPARK_GRAFT_LOG_STORE=store)
    mgr = None
    if store == "arbiter":
        from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming.arbiter_server import (
            start_arbiter_server,
        )

        mgr, (host, port) = start_arbiter_server()
        env["SPARK_GRAFT_ARBITER_ENDPOINT"] = f"{host}:{port}"
    me = os.path.abspath(__file__)

    def launch(state_dir: str) -> tuple[list[dict], float]:
        t0 = time.monotonic()
        stopfile = os.path.join(work, f"stop_{int(t0)}")
        maint = None
        if with_maint:
            maint_err = open(os.path.join(work, "maint.stderr"), "w")
            maint = (
                subprocess.Popen(
                    [sys.executable, me, "--maintenance", state_dir, stopfile],
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=maint_err,
                    text=True,
                ),
                maint_err,
            )
        procs = []
        for k in range(n_writers):
            errlog = open(os.path.join(work, f"writer{k}.stderr"), "w")
            procs.append(
                (
                    subprocess.Popen(
                        [sys.executable, me, "--writer", state_dir, str(width)]
                        + slice_dirs[k::n_writers],
                        env=env,
                        stdout=subprocess.PIPE,
                        stderr=errlog,
                        text=True,
                    ),
                    errlog,
                )
            )
        outs = []
        for p, errlog in procs:
            out, _ = p.communicate(timeout=1200)
            errlog.close()
            if p.returncode != 0:
                raise SystemExit(
                    f"writer {p.pid} failed rc={p.returncode} — see {errlog.name}"
                )
            outs.append(json.loads(out.strip().splitlines()[-1]))
        if maint is not None:
            mp, merr = maint
            with open(stopfile, "w"):
                pass
            mout, _ = mp.communicate(timeout=600)
            merr.close()
            if mp.returncode != 0:
                raise SystemExit(
                    f"maintenance {mp.pid} failed rc={mp.returncode} — see {merr.name}"
                )
            outs.append(json.loads(mout.strip().splitlines()[-1]))
        return outs, time.monotonic() - t0

    try:
        reports, wall = launch(state)
        total_conflicts = sum(r.get("conflicts", 0) for r in reports if "commits" in r)
        attempt = 1
        while total_conflicts == 0 and attempt < 3:
            # clean split = vacuous race; re-run on a FRESH state path —
            # rmtree-and-reuse would deadlock the arbiter leg, whose
            # server still holds the old path's committed names (seed()
            # only adds) and would reject every fresh-basis CAS
            attempt += 1
            state = os.path.join(work, f"state_retry{attempt}")
            reports, wall = launch(state)
            total_conflicts = sum(
                r.get("conflicts", 0) for r in reports if "commits" in r
            )
    finally:
        if mgr is not None:
            mgr.shutdown()

    maint_report = next((r for r in reports if "maint_rounds" in r), None)
    reports = [r for r in reports if "commits" in r]
    all_ids = sorted(i for r in reports for i in r["commits"])
    if all_ids != list(range(n_slices)):
        raise SystemExit(f"commit ids not a clean 0..{n_slices-1}: {all_ids}")

    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming.partitioned_upsert import (
        read_latest_partitioned_state,
    )

    got = read_latest_partitioned_state(spark, state)
    want = (
        orders.drop("okey")
        .groupBy("key")
        .agg(
            F.sum(F.col("amount").cast("decimal(18,2)")).cast("double").alias("total"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    n_mismatch = got.exceptAll(want).count() + want.exceptAll(got).count()
    if n_mismatch:
        raise SystemExit(f"EXACTNESS FAILED: {n_mismatch} mismatching rows")

    print(
        json.dumps(
            {
                "rung": "concurrent_mor_writers",
                "sf_dir": sf_dir,
                "store": store,
                "writers": n_writers,
                "slices": n_slices,
                "commit_ids": all_ids,
                "conflicts": total_conflicts,
                "race_runs": attempt,
                "writer_walls_s": [r["wall_s"] for r in reports],
                "wall_s": round(wall, 2),
                "maintenance": maint_report,
                "exact": True,
            }
        )
    )


if __name__ == "__main__":
    main()
