#!/usr/bin/env python3
"""Journalled-arbiter THROUGHPUT rung (r13, VERDICT r12 ask #3): the
fsync-per-commit ceiling was asserted in r12, never measured. This rung
measures sustained commit traffic through JournalledCommitArbiter at two
scales a decade apart, in both journal modes, and times the restart
replay each mode leaves behind — the numbers a capacity plan needs:

  workload   One commit cycle = cas (1 fsync'd WAL line) + mark_complete
             (1 more) + a retention forget every RETAIN cycles — the
             exact mutation sequence ArbiterLogStore.commit + vacuum
             issue per micro-batch. The record table stays O(RETAIN)
             while the journal grows 2-3 lines/cycle: the churn shape
             that motivated size-triggered compaction.
  scales     N and 10N cycles (default 2,000 / 20,000). The per-commit
             cost must stay flat across the decade — the journal is
             append-only, so any superlinearity is a bug.
  modes      auto-compaction OFF (r12 behavior: WAL grows without
             bound until a restart) vs ON (r13: Redis-AOF-style size
             trigger, factor 4 over the last snapshot, min 128 KiB so
             both scales cross it). Same acknowledged state either way;
             ON must bound the file and cannot cost more than the
             snapshot rewrites it performs.
  floor      raw append+fsync of a journal-sized line on the same
             device — the hardware floor the arbiter can't beat.
  replay     time to construct a fresh arbiter from each mode's final
             journal: the compacted file must replay in O(live records),
             the unbounded one in O(total traffic) — this is the
             restart-latency argument for compaction, measured.

The arbiter serializes mutations under one lock, so in-process
single-thread traffic IS the service ceiling; HTTP transport overhead on
top is measured in SCALE.md r10 (network-auth arbiter) and r12 (durable
arbiter) sections. Prints one JSON line; findings go to SCALE.md.

Usage: python examples/journal_throughput_rung.py [N_SMALL] [WORKDIR]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming.logstore import (  # noqa: E402
    JournalledCommitArbiter,
)

RETAIN = 50  # keep the newest 50 commits; forget older (vacuum shape)
MIN_BYTES = 128 * 1024  # both scales cross this; prod default is 1 MiB


def run_mode(journal: str, n_cycles: int, compact: bool) -> dict:
    arb = JournalledCommitArbiter(
        journal,
        auto_compact_factor=4.0 if compact else None,
        auto_compact_min_bytes=MIN_BYTES,
    )
    staged = ".staged.v000000000.deadbeef.json"
    t0 = time.perf_counter()
    basis: list[str] = []
    for i in range(n_cycles):
        name = f"v{i:09d}"
        arb.cas("tbl", tuple(basis), name, staged)
        arb.mark_complete("tbl", name)
        basis.append(name)
        if len(basis) > RETAIN:
            arb.forget("tbl", basis.pop(0))
    wall = time.perf_counter() - t0
    live = len(arb.records("tbl"))
    compactions = arb.compactions
    arb.close()
    jbytes = os.path.getsize(journal)

    t1 = time.perf_counter()
    replayed = JournalledCommitArbiter(journal)
    replay_s = time.perf_counter() - t1
    assert len(replayed.records("tbl")) == live, "replay lost records"
    replayed.close()
    return {
        "cycles": n_cycles,
        "wall_s": round(wall, 3),
        "commits_per_s": round(n_cycles / wall, 1),
        "journal_bytes": jbytes,
        "compactions": compactions,
        "live_records": live,
        "replay_s": round(replay_s, 4),
    }


def fsync_floor(workdir: str, n: int) -> float:
    """Raw device floor: n append+fsync of one ~100 B line."""
    path = os.path.join(workdir, "floor.bin")
    line = b"x" * 100 + b"\n"
    t0 = time.perf_counter()
    with open(path, "ab") as fh:
        for _ in range(n):
            fh.write(line)
            fh.flush()
            os.fsync(fh.fileno())
    return time.perf_counter() - t0


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    workdir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="journal_rung_"
    )
    os.makedirs(workdir, exist_ok=True)
    floor_n = 1000
    floor_s = fsync_floor(workdir, floor_n)
    out: dict = {
        "rung": "journal_throughput",
        "retain": RETAIN,
        "min_bytes": MIN_BYTES,
        "fsync_floor_per_s": round(floor_n / floor_s, 1),
        "scales": {},
    }
    for n in (n_small, n_small * 10):
        row: dict = {}
        for mode, compact in (("nocompact", False), ("autocompact", True)):
            jp = os.path.join(workdir, f"arbiter_{n}_{mode}.journal")
            if os.path.exists(jp):
                os.remove(jp)
            row[mode] = run_mode(jp, n, compact)
        # the decade claims, asserted not eyeballed:
        # 1) compaction bounds the file (vs linear growth without)
        assert (
            row["autocompact"]["journal_bytes"]
            < row["nocompact"]["journal_bytes"]
        ), "auto-compaction did not shrink the journal"
        # 2) both modes acknowledged the same live state
        assert (
            row["autocompact"]["live_records"]
            == row["nocompact"]["live_records"]
            == RETAIN
        )
        out["scales"][str(n)] = row
    big, small = str(n_small * 10), str(n_small)
    # 3) compacted journal size is O(live records): flat across the decade
    ratio = (
        out["scales"][big]["autocompact"]["journal_bytes"]
        / out["scales"][small]["autocompact"]["journal_bytes"]
    )
    out["compacted_bytes_decade_ratio"] = round(ratio, 2)
    assert ratio < 5, f"compacted journal grew {ratio}x across the decade"
    print(json.dumps(out))
    if workdir.startswith(tempfile.gettempdir()):
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
