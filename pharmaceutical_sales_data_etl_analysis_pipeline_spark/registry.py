"""Central query registry: merges every operator module's QUERIES/ORACLES.

__spark_entry__.queries()/oracle_sql() read from here. Invariant (checked in
tests): every queries() key has either an oracle twin or is explicitly
listed in NO_ORACLE (non-SQL-expressible ops → driver rows-only check).

MODULE_ORDER is the driver-sweep priority: the external correctness sweep
covers the first 50 registry entries in insertion order, so modules whose
queries still need (or recently changed and need fresh) driver-oracle rows
are emitted first; queries already driver-green in a previous round rotate
to the back, where the local harness (tests/test_oracle_parity.py — same
compare logic) keeps protecting them. Rotate per round until every query
has a driver row.

Round-2 order: tpch/scalarfuncs/corpusops/pythonudf/analytic had no driver
row in round 1 (registry positions 51-78); dedup/similarity/multimodal
contain the queries whose plans changed this round (simhash_near_dups,
embedding_near_dups, multimodal_features). relational/textops/eventsops
were all driver-green in CORRECTNESS_r01.json and rotate to the back.

Imports are deliberately NOT guarded: a broken operator module must fail
the whole registry loudly (a swallowed ImportError would silently shrink
the query surface and let the correctness gate pass on fewer queries).
tests/test_oracle_parity.py pins the exact query count as a second guard.
"""

from __future__ import annotations

import importlib

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

MODULE_ORDER = [
    "tpch",
    "scalarfuncs",
    "corpusops",
    "pythonudf",
    "analytic",
    "dedup",
    "similarity",
    "multimodal",
    "relational",
    "textops",
    "eventsops",
]


def _collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for name in MODULE_ORDER:
        mod = importlib.import_module(
            f"pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators.{name}"
        )
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles


def all_queries() -> dict[str, QueryFn]:
    return _collect()[0]


def all_oracles() -> dict[str, str]:
    return _collect()[1]


# non-SQL-expressible ops → rows-only check (currently none: even the
# mapInPandas feature extraction has a byte-arithmetic DuckDB twin)
NO_ORACLE: set[str] = set()
