"""Idempotent producer transactions + batch-source rename (r12).

- `producer_txn=(app_id, version)` is Delta's txnAppId/txnVersion
  contract: the manifest chain carries a per-app high-water version
  map; a resubmission at or below the recorded mark is SKIPPED with
  nothing written — exactly-once for multi-writer optimistic appends
  whose callers previously had only at-least-once. The map survives
  maintenance commits (compaction inherits it like the writer lease).
- `rename_batch_source` migrates the PRODUCER side of a value column's
  contract (batches deliver the values under a new column name) —
  the complement of rename_value_column's reader-side rename; together
  they cover both directions of the reference's rename-across-stages
  lineage (LoadXML2DB.ChatterjeeP.R:77,178-183).
"""

from __future__ import annotations

import pytest

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming import (
    partitioned_upsert as pu,
)
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming.logstore import (
    InProcessConditionalPutLogStore,
)


def _df(spark, rows, schema="key long, amount double"):
    return spark.createDataFrame(rows, schema)


def _fold(spark, state):
    return {
        r["key"]: (r["total"], r["n_rows"])
        for r in pu.read_latest_partitioned_state(spark, state).collect()
    }


def test_producer_txn_exactly_once_on_resubmission(spark, tmp_path):
    """The crash-and-resubmit flow: the same (app, version) submitted
    twice through the optimistic loop applies ONCE — the second call
    returns None and writes nothing; a higher version applies."""
    prev_store = pu.set_log_store(InProcessConditionalPutLogStore())
    try:
        state = str(tmp_path / "state")
        b = _df(spark, [(1, 10.0), (2, 20.0)])
        bid = pu.append_delta_batch_optimistic(
            spark, state, b, range_width=16, producer_txn=("ingestA", 1)
        )
        assert bid == 0
        n_manifests = len(pu._list_manifests(spark, state))
        # resubmission after a "crash": skipped, nothing written
        assert (
            pu.append_delta_batch_optimistic(
                spark, state, b, range_width=16, producer_txn=("ingestA", 1)
            )
            is None
        )
        assert len(pu._list_manifests(spark, state)) == n_manifests
        assert _fold(spark, state) == {1: (10.0, 1), 2: (20.0, 1)}
        # an OLDER version is equally dead (monotone high-water)
        assert (
            pu.append_delta_batch_optimistic(
                spark, state, b, range_width=16, producer_txn=("ingestA", 0)
            )
            is None
        )
        # the next version applies; an independent app is unaffected
        assert pu.append_delta_batch_optimistic(
            spark, state, _df(spark, [(1, 1.0)]), range_width=16,
            producer_txn=("ingestA", 2),
        ) == 1
        assert pu.append_delta_batch_optimistic(
            spark, state, _df(spark, [(2, 2.0)]), range_width=16,
            producer_txn=("ingestB", 1),
        ) == 2
        assert _fold(spark, state) == {1: (11.0, 2), 2: (22.0, 2)}
        newest = pu._read_manifest(spark, state, pu._list_manifests(spark, state)[-1])
        assert newest["txns"] == {"ingestA": 2, "ingestB": 1}
    finally:
        pu.set_log_store(prev_store)


def test_producer_txn_survives_maintenance_and_explicit_paths(spark, tmp_path):
    """The txn map rides maintenance commits (compaction would otherwise
    re-admit a replayed transaction) and both explicit write paths; the
    skip happens BEFORE any data is written on both."""
    state = str(tmp_path / "state")
    assert pu.merge_batch_into_partitioned_state(
        spark, state, _df(spark, [(1, 5.0)]), 0, range_width=16,
        producer_txn=("app", 7),
    ) is True
    # CoW resubmission: skipped
    assert pu.merge_batch_into_partitioned_state(
        spark, state, _df(spark, [(1, 5.0)]), 1, range_width=16,
        producer_txn=("app", 7),
    ) is False
    # MoR append with a new version commits, then compaction inherits
    assert pu.append_delta_batch(
        spark, state, _df(spark, [(1, 5.0)]), 1, range_width=16,
        producer_txn=("app", 8),
    ) is True
    assert pu.compact_deltas_into_base(spark, state) > 0
    newest = pu._read_manifest(spark, state, pu._list_manifests(spark, state)[-1])
    assert "x" in pu._list_manifests(spark, state)[-1]  # maintenance commit
    assert newest["txns"] == {"app": 8}
    # post-compaction, the resubmission is STILL dead
    assert pu.append_delta_batch(
        spark, state, _df(spark, [(1, 99.0)]), 2, range_width=16,
        producer_txn=("app", 8),
    ) is False
    assert _fold(spark, state) == {1: (10.0, 2)}
    # bad app ids are loud
    with pytest.raises(ValueError, match="app_id"):
        pu.append_delta_batch(
            spark, state, _df(spark, [(1, 1.0)]), 2, range_width=16,
            producer_txn=("", 1),
        )


def test_rename_batch_source_migrates_the_producer_contract(spark, tmp_path):
    """After rename_batch_source(total -> 'amt'), batches deliver under
    the NEW name; a stale producer still sending `amount` fails loudly
    (missing primary for the primary column / unknown column for an
    evolved one). Reader-side names never move."""
    from pyspark.sql import functions as F

    state = str(tmp_path / "state")
    pu.append_delta_batch(spark, state, _df(spark, [(1, 1.0)]), 0, range_width=16)
    fee = _df(
        spark, [(2, 2.0, 0.5)], "key long, amount double, fee double"
    ).withColumn("fee", F.col("fee").cast("decimal(18,2)"))
    pu.append_delta_batch(spark, state, fee, 1, range_width=16, merge_schema=True)

    v = pu.rename_batch_source(spark, state, "total", "amt")
    assert v == 3
    v = pu.rename_batch_source(spark, state, "fee", "charge")
    assert v == 4
    # the migrated producer commits under the new names
    b = spark.createDataFrame(
        [(1, 1.0, 0.25)], "key long, amt double, charge double"
    ).withColumn("charge", F.col("charge").cast("decimal(18,2)"))
    pu.append_delta_batch(spark, state, b, 2, range_width=16)
    df = pu.read_latest_partitioned_state(spark, state)
    assert df.columns == ["key", "total", "fee", "n_rows"]  # reader side fixed
    got = sorted(tuple(r) for r in df.collect())
    assert got == [(1, 2.0, 0.25, 2), (2, 2.0, 0.5, 1)]
    # a stale producer on the OLD primary name is loud
    with pytest.raises(ValueError, match="primary value column 'amt'"):
        pu.append_delta_batch(
            spark, state, _df(spark, [(9, 9.0)]), 3, range_width=16
        )
    # refusals: unknown column, source collision, reserved names
    with pytest.raises(ValueError, match="unknown value column"):
        pu.rename_batch_source(spark, state, "nope", "x")
    with pytest.raises(ValueError, match="another column's source or a"):
        pu.rename_batch_source(spark, state, "fee", "amt")
    with pytest.raises(ValueError, match="reserved"):
        pu.rename_batch_source(spark, state, "fee", "op")
    # no-op rename commits nothing
    n = len(pu._list_manifests(spark, state))
    assert pu.rename_batch_source(spark, state, "fee", "charge") == 4
    assert len(pu._list_manifests(spark, state)) == n
