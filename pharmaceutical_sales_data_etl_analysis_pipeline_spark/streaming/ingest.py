"""Incremental multi-file ingest as a stream (SURVEY.md §2.10): the
reference's six-file append loop (LoadXML2DB.ChatterjeeP.R:202-452), but as
a file-arrival stream — each micro-batch appends to the fact table via
foreachBatch, preserving bag semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


TXN_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("txn_id", T.IntegerType()),
        T.StructField("product_name", T.StringType()),
        T.StructField("rep_id", T.StringType()),
        T.StructField("customer_name", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("sale_date", T.StringType()),
        T.StructField("sale_amount", T.DoubleType()),
    ]
)


def stream_append_ingest(
    spark: SparkSession, src_dir: str, dest_dir: str, checkpoint_dir: str,
    fmt: str = "json",
) -> int:
    """Watch src_dir, append every arriving file's rows to dest_dir parquet.

    Returns the number of micro-batches processed (availableNow → bounded).
    Duplicates across files are preserved — the reference's overwrite+append
    bag (U1). maxFilesPerTrigger=1 reproduces the one-file-per-load cadence.
    """
    stream = (
        spark.readStream.schema(TXN_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .format(fmt)
        .load(src_dir)
    )
    batches = {"n": 0}

    def append_batch(df: DataFrame, epoch_id: int) -> None:
        batches["n"] += 1
        df.write.mode("append").parquet(dest_dir)

    q = (
        stream.writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return batches["n"]
