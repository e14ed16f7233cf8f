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
  escape hatch the registry's eager-execution note prescribed). Read-back
  drops the in-memory partitioning metadata, so a downstream equi-join
  re-shuffles what localCheckpoint would have kept co-located — the
  durability/latency trade, measured in BENCH_NOTES.md.

Select with SPARK_GRAFT_PIN=local|table (read per call so tests can
toggle). Scratch dirs are reclaimed at process exit. Loop-internal
iterative states (label-propagation rounds, pagerank ranks) stay
localCheckpoint unconditionally: their purpose is lineage truncation of
a value that the next round immediately replaces — a durable copy per
round would trade O(rounds) table writes for recovery the fixed point
does not need (re-running the loop from the pinned edges is the recovery
path).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame

_SCRATCH_BASE: list = []  # lazily created singleton


def _scratch_base() -> str:
    if not _SCRATCH_BASE:
        base = tempfile.mkdtemp(prefix="spark_pin_")
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        _SCRATCH_BASE.append(base)
    return _SCRATCH_BASE[0]


def pin(df: DataFrame, label: str = "pin") -> DataFrame:
    """EAGER: runs Spark jobs at call time (see module docstring)."""
    mode = os.environ.get("SPARK_GRAFT_PIN", "local")
    if mode == "table":
        path = os.path.join(_scratch_base(), f"{label}_{uuid.uuid4().hex[:12]}")
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)
    return df.localCheckpoint()
