"""Central query registry: merges every operator module's QUERIES/ORACLES.

__spark_entry__.queries()/oracle_sql() read from here. Invariant (checked in
tests): every queries() key has either an oracle twin or is explicitly
listed in NO_ORACLE (non-SQL-expressible ops → driver rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

def _collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    from .operators import relational

    modules = [relational]
    for name in ("textops", "dedup", "similarity", "eventsops", "multimodal", "analytic", "scalarfuncs", "corpusops", "tpch", "pythonudf"):
        try:
            mod = __import__(
                f"pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators.{name}",
                fromlist=[name],
            )
            modules.append(mod)
        except ImportError:
            pass
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in modules:
        queries.update(getattr(mod, "QUERIES", {}))
        oracles.update(getattr(mod, "ORACLES", {}))
    return queries, oracles


def all_queries() -> dict[str, QueryFn]:
    return _collect()[0]


def all_oracles() -> dict[str, str]:
    return _collect()[1]

# non-SQL-expressible ops (mapInPandas feature extraction) → rows-only check
NO_ORACLE: set[str] = {"multimodal_features"}
