"""Streaming incremental MERGE (CDC-to-warehouse): each micro-batch of
change rows is merged into a persistent keyed state table via foreachBatch
— the streaming twin of operators/warehouse.merge_upsert.

Plain parquet has no ACID MERGE, so state is maintained as immutable
versioned snapshots: foreachBatch(batch_id) reads the latest snapshot,
full-outer-merges the batch aggregate, and writes snapshot v{batch_id}.
Readers always see a complete snapshot (never a half-written overwrite);
the checkpoint ties batch ids to source offsets, so a replayed batch
rewrites the SAME version idempotently instead of double-applying. This
is a minimal honest version of what Delta/Iceberg MERGE does underneath
(their commit log replaces the version-directory listing).

Scale: the per-batch merge is one full-outer shuffle join on the key —
proportional to |state| + |batch|. For 100 TB state a real deployment
partitions snapshots by key range so a batch only rewrites touched
partitions; streaming/partitioned_upsert.py implements exactly that
(bucket-hashed copy-on-write with a manifest commit) and is the
scale-path successor of this module — this one stays as the minimal
readable form of the versioned-snapshot contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.maintenance import _fs_and_path

# Snapshot totals are stored as DECIMAL(18,2), not DOUBLE: the state is
# folded batch-over-batch, and a double accumulator would pick up
# batch-boundary-dependent FP error for keys updated across many
# micro-batches (the repo's money-sum discipline is exact decimal sums,
# double only at the read boundary). Readers get total as DOUBLE via
# read_latest_state/read_state_version; the merge reads the raw decimal.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("total", T.DecimalType(18, 2)),
        T.StructField("n_rows", T.LongType()),
    ]
)


def _as_read_view(df: DataFrame | None) -> DataFrame | None:
    """Public read contract: decimal state total -> DOUBLE at the boundary."""
    if df is None:
        return None
    return df.select("key", F.col("total").cast("double").alias("total"), "n_rows")


def _version_dirs(spark: SparkSession, state_dir: str) -> list[str]:
    # local/HDFS-agnostic listing via the JVM FileSystem API; only COMMITTED
    # snapshots count (_SUCCESS marker) — a reader racing a mid-write
    # directory must not see it as the latest version
    fs, path, jvm = _fs_and_path(spark, state_dir)
    if not fs.exists(path):
        return []
    out = []
    for s in fs.listStatus(path):
        name = str(s.getPath().getName())
        if s.isDirectory() and name.startswith("v"):
            if fs.exists(jvm.org.apache.hadoop.fs.Path(f"{state_dir}/{name}/_SUCCESS")):
                out.append(name)
    return sorted(out)


def _read_latest_raw(
    spark: SparkSession, state_dir: str, before_batch_id: int | None = None
) -> DataFrame | None:
    """Latest committed snapshot with the exact DECIMAL total (merge path);
    with before_batch_id, the latest one STRICTLY OLDER than that batch
    (the replay-safe read, see below)."""
    versions = _version_dirs(spark, state_dir)
    if before_batch_id is not None:
        versions = [v for v in versions if int(v[1:]) < before_batch_id]
    if not versions:
        return None
    return spark.read.schema(STATE_SCHEMA).parquet(f"{state_dir}/{versions[-1]}")


def read_latest_state(
    spark: SparkSession, state_dir: str, before_batch_id: int | None = None
) -> DataFrame | None:
    """Latest committed snapshot, total as DOUBLE (read boundary)."""
    return _as_read_view(_read_latest_raw(spark, state_dir, before_batch_id))


def merge_batch_into_state(
    spark: SparkSession, state_dir: str, batch_df: DataFrame, batch_id: int
) -> None:
    """foreachBatch body: aggregate the batch per key, merge into the
    latest snapshot OLDER than this batch, write snapshot v{batch_id}.

    The strictly-older read is what makes replay idempotent: if batch N
    fully wrote v{N} but crashed before the checkpoint committed, the
    re-run must NOT merge into its own half-applied output (that would
    double-count the delta) — it merges into v{N-1} again and rewrites
    v{N} to the identical result."""
    zero = F.lit(0).cast("decimal(18,2)")
    delta = batch_df.groupBy(F.col("key")).agg(
        # exact decimal all the way through the fold — never a double
        # accumulator (sum widens to decimal(28,2); narrowed on write)
        F.sum(F.col("amount").cast("decimal(18,2)")).alias("d_total"),
        F.count(F.lit(1)).cast("long").alias("d_rows"),
    )
    prev = _read_latest_raw(spark, state_dir, before_batch_id=batch_id)
    if prev is None:
        merged = delta.select(
            "key",
            F.col("d_total").cast("decimal(18,2)").alias("total"),
            F.col("d_rows").alias("n_rows"),
        )
    else:
        p, d = prev.alias("p"), delta.alias("d")
        joined = p.join(d, F.col("p.key") == F.col("d.key"), "full_outer")
        merged = joined.select(
            F.coalesce(F.col("p.key"), F.col("d.key")).alias("key"),
            (
                F.coalesce(F.col("p.total"), zero)
                + F.coalesce(F.col("d.d_total"), zero)
            ).cast("decimal(18,2)").alias("total"),
            (
                F.coalesce(F.col("p.n_rows"), F.lit(0))
                + F.coalesce(F.col("d.d_rows"), F.lit(0))
            ).cast("long").alias("n_rows"),
        )
    merged.write.mode("overwrite").parquet(f"{state_dir}/v{batch_id:09d}")


def run_incremental_merge(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
) -> None:
    """Stream (key, amount) parquet batch files from source_dir and fold
    each micro-batch into the versioned state table. availableNow drains
    all pending files then stops (deterministic for tests; on a live
    pipeline drop the trigger and let it run)."""
    src_schema = T.StructType(
        [T.StructField("key", T.LongType()), T.StructField("amount", T.DoubleType())]
    )
    stream = (
        spark.readStream.schema(src_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: merge_batch_into_state(spark, state_dir, df, bid)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_state_version(
    spark: SparkSession, state_dir: str, batch_id: int
) -> DataFrame | None:
    """Time travel: read the snapshot as of a specific micro-batch. Every
    version is immutable, so this is just a directory pick — the same
    contract table formats expose as VERSION AS OF."""
    name = f"v{batch_id:09d}"
    if name not in _version_dirs(spark, state_dir):
        return None
    return _as_read_view(spark.read.schema(STATE_SCHEMA).parquet(f"{state_dir}/{name}"))


def expire_state_versions(spark: SparkSession, state_dir: str, keep: int = 3) -> int:
    """Retention: drop all but the newest `keep` snapshots (the VACUUM
    twin). Returns how many were deleted.

    keep is clamped to >= 2: replay idempotence (merge_batch_into_state)
    needs the snapshot STRICTLY OLDER than a possibly-uncommitted latest
    batch — retaining only the latest would make a replayed batch find no
    predecessor and rewrite its version as the bare delta, silently
    discarding all accumulated state."""
    versions = _version_dirs(spark, state_dir)
    doomed = versions[: -max(keep, 2)]
    fs, _, jvm = _fs_and_path(spark, state_dir)
    for name in doomed:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{state_dir}/{name}"), True)
    return len(doomed)
