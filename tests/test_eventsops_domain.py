"""Loud guard for the _vsum DATA-CONTRACT INVARIANT (eventsops.py).

The conversion-exact integer-units sum casts each value to
DECIMAL(18,10) — 8 integer digits. Under Spark's default non-ANSI
casts, |value| >= 1e8 becomes NULL and silently vanishes from the SUM
while the DuckDB oracle errors: a silent-wrong-answer mode. These
tests make that contract fail LOUDLY instead:

1. every driver sf rung (and the up-scaled rung if present) stays
   inside the domain with headroom, including the value*value term
   seasonal_decompose squares;
2. the overflow path RAISES under Spark 4's ANSI default (loud, and
   consistent with the DuckDB oracle erroring) — if a config change
   ever flips this back to the non-ANSI silent NULL-drop, this file
   is where it surfaces.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException  # noqa: F401  (doc import)

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.catalog import load_table
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators.eventsops import (
    VAL_DEC,
    _vsum,
)

# _vsum's DECIMAL(18,10) per-value cast: 8 integer digits.
VSUM_DOMAIN = 1e8
# seasonal_decompose squares value before the same cast.
VSUM_SQ_DOMAIN = 1e4


def _rungs() -> list[str]:
    rungs = [d for d in glob.glob("/root/testdata/sf*") if os.path.isdir(d)]
    # scaleup.py writes synthetic rungs under .scratch/ when generated
    rungs += [d for d in glob.glob("/root/repo/.scratch/sf*") if os.path.isdir(d)]
    return [d for d in rungs if os.path.exists(os.path.join(d, "events.parquet"))]


def test_events_value_within_vsum_domain(spark):
    """max |value| over every available rung < 1e4 (the tighter squared
    bound), i.e. >=4 orders of headroom on the 1e8 cast domain."""
    rungs = _rungs()
    assert rungs, "no events rungs found — testdata layout changed?"
    for d in rungs:
        mx = (
            load_table(spark, d, "events")
            .agg(F.max(F.abs(F.col("value"))).alias("m"))
            .first()["m"]
        )
        assert mx is not None and mx < VSUM_SQ_DOMAIN, (
            f"{d}: max |value| = {mx} violates the _vsum data contract "
            f"(< {VSUM_SQ_DOMAIN} required for the squared term; "
            f"< {VSUM_DOMAIN} for the linear term). Widen VAL_DEC and "
            f"every _vsum_sql twin in lockstep before accepting this data."
        )


def test_vsum_overflow_raises_under_ansi_default(spark):
    """Pin the loud failure mode: one in-domain row + one out-of-range
    row -> the DECIMAL(18,10) cast throws (Spark 4 ANSI default),
    matching the oracle's error rather than silently dropping the row
    from the sum. If this stops raising, someone disabled ANSI and the
    _vsum contract has regained its silent-wrong-answer mode — fix the
    config, don't relax this test."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    df = spark.createDataFrame(
        [Row(value=2.5), Row(value=1.5e8)]  # second row out of domain
    )
    with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE"):
        df.agg(_vsum("value", "s")).first()
    # VAL_DEC import stays load-bearing: the cast under test is the one
    # every _vsum consumer compiles in
    assert VAL_DEC == "decimal(18,10)"
