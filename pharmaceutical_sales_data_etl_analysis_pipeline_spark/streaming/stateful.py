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


RUNNING_CENTS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)

_CENTS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)


def running_user_totals_cents(events_stream: DataFrame) -> DataFrame:
    """Exact-arithmetic twin of running_user_totals: the input carries a
    pre-scaled integer `cents` column (computed JVM-side, so the float→int
    quantization is one Catalyst expression shared with the SQL oracle) and
    the state accumulates int64 — order- and batch-grouping-invariant, so
    the FINAL emit per key equals the batch groupBy exactly, bit-for-bit.
    This is the driver-verifiable face of the stateful surface: update-mode
    emits are cumulative and monotone per key, and the last emit per key is
    the full aggregate regardless of how the trigger grouped the input.
    """

    def update(key, pdfs, state):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += int(pdf["cents"].to_numpy(dtype="int64").sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_cents": [total]}
        )

    return (
        events_stream.select("user_id", "cents")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_CENTS_SCHEMA,
            stateStructType=_CENTS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
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
