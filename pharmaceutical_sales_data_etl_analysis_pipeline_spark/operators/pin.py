"""Materialization of intermediates that downstream plan branches re-read.

Several plans reuse one computed relation across branches (a pair
self-join's two sides, an edge list read by every fixed-point iteration).
Leaving the lineage in place makes Spark re-derive the relation once per
consumer subtree (measured: 4 document scans in bm25, 9 in term_lift), so
these sites materialize it once. Two strategies:

- ``local`` (default): ``df.localCheckpoint()`` — executor-local blocks,
  no disk round-trip beyond shuffle files, lowest latency. The blocks are
  NOT replicated: a lost executor invalidates them and the job fails
  (acceptable in local[*], where losing the executor means losing the
  application anyway).
- ``table``: write the relation to a scratch parquet table and read it
  back — durable across executor loss, shareable by any number of
  branches, and the shape a long-running 1000-executor deployment should
  use (this is the "prefer persisting such intermediates to a table"
  escape hatch the registry's eager-execution note prescribed). On a
  real multi-node cluster the scratch base MUST be shared storage
  (HDFS/S3/NFS) visible to driver and executors: set SPARK_GRAFT_PIN_DIR
  to such a path — the driver-local tempdir default only works in
  local[*]. Read-back drops the in-memory partitioning metadata, so a
  downstream equi-join re-shuffles what localCheckpoint would have kept
  co-located — the durability/latency trade, measured in BENCH_NOTES.md.

Select with SPARK_GRAFT_PIN=local|table (read per call so tests can
toggle; any other value raises — a typo must not silently fall back and
turn a dual-mode verification run into local-vs-local). Scratch dirs
under the tempdir default are reclaimed at process exit; an explicit
SPARK_GRAFT_PIN_DIR is the caller's to manage (it may be remote storage
where atexit cleanup from the driver is wrong or impossible).

Loop-internal iterative states (label-propagation rounds, pagerank
ranks) stay localCheckpoint unconditionally: their purpose is lineage
truncation of a value that the next round immediately replaces — a
durable copy per round would trade O(rounds) table writes for recovery
the fixed point does not need (re-running the loop from the pinned edges
is the recovery path).

LINT VISIBILITY: pin() truncates lineage, so the repo-wide plan lint
(tests/test_plans.py) cannot see the producing plan in the final query
plan. When _LINT_CAPTURE is a list, pin() appends (label, executed-plan
string) of every incoming DataFrame so the lint can walk pre-
materialization plans too.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame

_SCRATCH_BASE: list = []  # lazily created singleton (tempdir default only)

# tests set this to a list to receive (label, plan_string) for every
# relation passed through pin() — see module docstring
_LINT_CAPTURE: list | None = None


def scratch_dir(prefix: str) -> str:
    """Per-invocation scratch directory under one shared base.

    Default base is a driver-local tempdir reclaimed at process exit
    (cleanup is deferred, not try/finally: callers hand the path to
    lazily-read DataFrames). SPARK_GRAFT_PIN_DIR overrides the base —
    required on multi-node clusters, left to the caller to manage.
    """
    base = os.environ.get("SPARK_GRAFT_PIN_DIR")
    if not base:
        if not _SCRATCH_BASE:
            tmp = tempfile.mkdtemp(prefix="spark_scratch_")
            atexit.register(shutil.rmtree, tmp, ignore_errors=True)
            _SCRATCH_BASE.append(tmp)
        base = _SCRATCH_BASE[0]
    return os.path.join(base, f"{prefix}_{uuid.uuid4().hex[:12]}")


def pin(df: DataFrame, label: str = "pin") -> DataFrame:
    """EAGER: runs Spark jobs at call time (see module docstring)."""
    if _LINT_CAPTURE is not None:
        _LINT_CAPTURE.append(
            (label, df._jdf.queryExecution().executedPlan().toString())
        )
    mode = os.environ.get("SPARK_GRAFT_PIN", "local")
    if mode == "table":
        path = scratch_dir(label)
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)
    if mode != "local":
        raise ValueError(
            f"SPARK_GRAFT_PIN={mode!r}: expected 'local' or 'table'"
        )
    return df.localCheckpoint()
