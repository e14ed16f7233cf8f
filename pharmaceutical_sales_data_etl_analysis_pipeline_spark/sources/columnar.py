"""ORC source/sink boundary — the second columnar format Spark ships
in-box (SURVEY.md §2.1 S6-S8 generalized beyond parquet).

Why it exists: interop. Hive-era warehouses hand over ORC; an engine
claiming the reference's "read any table, write any table" surface
(SURVEY §2.1) should cross that boundary without a converter job. The
reader supports the same predicate pushdown / column pruning / vectorized
batch path as parquet (asserted in tests/test_columnar_sources.py), so
query plans over ORC keep the §4.3 properties.

Kept deliberately thin: explicit schema on read (never inferSchema in
production paths — same rule as delimited.py), overwrite/append modes
mirroring S7/S8. Partitioned writes compose exactly as parquet
(partitionBy passes through).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema-explicit ORC scan (schema drift fails loudly at analysis,
    not silently at read)."""
    return spark.read.schema(schema).orc(path)
