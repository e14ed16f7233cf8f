"""Process-level memo keys for deterministic, expensive build-time
artifacts (k-means centroids, near-dup component labels).

These are caches in the strict sense — the cached value is a pure
function of the key, never a semantics change:

- the key starts with the EXACT backing file list (`df.inputFiles()`):
  parquet writers generate unique part names per write, so an overwritten
  table keys differently and can never serve a stale artifact;
- plus the semantic plan hash (exprId-normalized), so two different
  projections/filters over the same files key apart (e.g. pq_codes'
  per-subspace slices) while repeated identical loads share;
- plus any caller-supplied parameters the artifact depends on
  (K, iteration caps, pin mode, session identity for DataFrame-valued
  caches).

Non-file-backed inputs (test literals, in-memory frames) return None —
no caching. Kill switch: SPARK_GRAFT_BUILD_CACHE=0 disables every build
memo (the sweep-verification escape hatch).

GROWTH CAVEAT: the memo dicts are process-level; DataFrame-valued
entries strong-reference their SparkSession, so entries keyed to a
stopped session would keep its Python wrapper alive in a long-lived
multi-session process. memo_put() therefore bounds each cache with
FIFO eviction (insertion order == dict order) — correctness is
unaffected (eviction only forces a rebuild), and MEMO_CAP is far above
what one session's registered queries ever insert.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


MEMO_CAP = 64


def memo_put(cache: dict, key, value, cap: int = MEMO_CAP):
    """Insert with FIFO eviction so process-level memo dicts stay bounded
    (see GROWTH CAVEAT in the module docstring)."""
    while len(cache) >= cap:
        cache.pop(next(iter(cache)))
    cache[key] = value


def corpus_key(df: DataFrame, *extra):
    if os.environ.get("SPARK_GRAFT_BUILD_CACHE", "1") == "0":
        return None
    try:
        files = tuple(sorted(df.inputFiles()))
        if not files:
            return None
        return (files, df.semanticHash(), *extra)
    except Exception:
        return None
