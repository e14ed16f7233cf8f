"""Custom stateful streaming operator: per-user running totals via
applyInPandasWithState (SURVEY.md §2.10 planned surface).

The reference has no streaming state; this is the engine surface for
arbitrary per-key state machines (running aggregates, CDC-style upserts,
custom sessionization) that outgrow built-in windowed aggs. State lives in
the state store (RocksDB/HDFS-backed on a cluster), partitioned by key —
scales horizontally with executors; each micro-batch touches only keys
present in the batch.

The state function is defined inside the builder so cloudpickle serializes
it by value — Python workers never need this package importable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Cumulative per-user event count + value sum across micro-batches.

    Emits one updated row per user per batch in which the user appears.
    Use outputMode("update"); n_events/total_value are monotone per user.
    """

    def update(key, pdfs, state):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
