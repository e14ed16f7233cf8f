"""Driver-mimic correctness gate: every queries() entry vs its DuckDB oracle
at sf0.001 (fast). The driver runs the same comparison at sf0.01."""

from __future__ import annotations

import pytest

from .oracle_harness import run_all


def _names():
    import __spark_entry__ as entrymod

    return sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", _names())
def test_oracle_parity(spark, sf_dir, name):
    res = run_all(spark, sf_dir, only=[name])[0]
    assert res.ok, f"{res.name}: {res.detail}"


def test_every_query_has_oracle_or_is_declared():
    import __spark_entry__ as entrymod

    from pharmaceutical_sales_data_etl_analysis_pipeline_spark import registry

    no_oracle = getattr(registry, "NO_ORACLE", set())
    missing = set(entrymod.queries()) - set(entrymod.oracle_sql()) - set(no_oracle)
    assert not missing, f"queries without oracle nor NO_ORACLE declaration: {missing}"
