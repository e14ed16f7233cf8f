"""Distributed exact order statistics: global rank / ntile without a
single-partition sort.

The canonical construction (same exchange a distributed ORDER BY uses):
repartitionByRange on the sort key, row_number within each range
partition, then global rank = broadcast cumulative partition offset +
local row number. Every stage is distributed; the only single-partition
work is the cumulative sum over the P per-partition counts (P rows, one
per shuffle partition — never base rows).

Built for the r3 rfm_segments fix (see operators/warehouse.py); shared
here so the quantile/percentile comparators in sketches.py and tpch.py
use the same scale-safe shape instead of a global row_number window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(df: DataFrame, order_cols: list, out: str) -> DataFrame:
    """Exact 1-based global rank under the total order `order_cols`
    (which must be tie-free) without a single-partition sort."""
    ranged = df.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = ranged.withColumn(
        "_rn", F.row_number().over(Window.partitionBy("_pid").orderBy(*order_cols))
    )
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out, (F.col("_off") + F.col("_rn")).cast("long"))
        .drop("_pid", "_rn", "_off")
    )


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """Exact ntile(k) bucket of 1-based `rank` among `n` rows: the first
    n%k buckets hold n/k+1 rows, the rest n/k (Spark's and DuckDB's rule)."""
    q = (n / k).cast("long")
    r = n % k
    big = r * (q + 1)  # rows covered by the size-(q+1) buckets
    return (
        F.when(rank <= big, ((rank - 1) / (q + 1)).cast("long") + 1)
        .otherwise(r + ((rank - 1 - big) / q).cast("long") + 1)
        .cast("int")
    )
