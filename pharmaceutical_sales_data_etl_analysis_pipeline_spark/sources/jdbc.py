"""JDBC source/sink (SURVEY.md §2.1 S6/S11): the reference's external-
database boundary — SQLite reads and the SQLite→MySQL warehouse hop
(LoadDataWarehouse.ChatterjeeP.R:29-32,80-83) — re-expressed as Spark's
generic JDBC connector.

The engine-side code is dialect-agnostic: any JDBC URL + driver class on
the executor classpath works (tests use embedded Derby, whose jars ship
inside pyspark; production would point at Postgres/MySQL with their
driver jars added to spark.jars).

Scale posture: a single-connection JDBC read is one partition — fine for
dimension tables (the reference's use), wrong for facts. read_jdbc exposes
the partitioned-read contract (partition_column/lower/upper/num_partitions
→ N parallel range queries, Spark pushes the per-partition WHERE down to
the database); writes batch per partition (controlled by the standard
batchsize option). Catalyst pushes filters/column pruning into the remote
query for both paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    driver: str,
    mode: str = "overwrite",
) -> None:
    """S11: persist a frame into an external database. mode='overwrite'
    replays the reference's DROP TABLE IF EXISTS + dbWriteTable."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .mode(mode)
        .save()
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """S6: scan an external database table. With partition bounds set, the
    scan fans out into num_partitions parallel range queries — the only
    JDBC shape that survives fact-sized tables."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()
