"""Bucket-partitioned copy-on-write MERGE: the 100 TB-shaped successor to
streaming/upsert.py's whole-table snapshots.

upsert.py's versioned-snapshot MERGE is correct but rewrites the ENTIRE
state table every micro-batch — the one component the r5 scale audit
flagged as not surviving 100 TB unmodified (SCALE.md "table formats"
decision). This module implements the fix its own docstring prescribed:
partition the state by key so a batch only rewrites touched partitions.

Layout (plain parquet + a JSON manifest, no Delta/Iceberg jars):

    state_dir/
      buckets/b{B}/v{batch_id:09d}/       bucket B's keys as of that batch
      manifests/v{batch_id:09d}.json      {"batch_id": N, "range_width": W,
                                           "buckets": {"B": "v...", ...}}

A key lives in bucket floor(key / RANGE_WIDTH) — RANGE, not hash: hash
bucketing scatters any delta bigger than the bucket count into EVERY
bucket (measured — see RANGE_WIDTH), while contiguous ranges let the
realistic clustered/CDC delta rewrite only the ranges it touches. The
bucket id space is sparse and unbounded, so the key domain needs no
up-front declaration. Each micro-batch:

  1. aggregates the batch per key (exact DECIMAL fold, the repo's
     money-sum discipline) and tags each key with its bucket;
  2. collects the TOUCHED bucket ids (bounded by the delta's key span
     over RANGE_WIDTH, and by the populated-range count — never by
     |state| rows or |batch| rows);
  3. full-outer-merges the delta against ONLY those buckets' current
     versions, in ONE Spark job, written partitioned by bucket to a
     staging dir, then moved into per-bucket version dirs (O(touched)
     metadata renames);
  4. writes the manifest LAST — the commit point. The new manifest
     inherits every untouched bucket's version pointer unchanged, so
     untouched data is never read, shuffled, or rewritten.

Per-batch cost is |batch| + |touched buckets|, not |state| + |batch|:
with B buckets and a batch touching t of them, the rewrite amplification
is t/B of the table instead of 1.0. At 100 TB with B sized so a bucket
is a few GB, a point-update batch rewrites GBs, not the table.

Replay idempotence matches upsert.py: a re-run of batch N merges into
the newest manifest STRICTLY OLDER than N (its own half-applied output
is invisible — the manifest commit never happened) and rewrites the same
bucket versions plus manifest to identical bytes-equivalent state.

Honest caveats at real scale (documented, not hidden): the manifest
rename is atomic on local FS/HDFS but copy+delete on S3 — a real
deployment fronts the manifest pointer with a conditional-put commit
(what Delta's log store / Iceberg's catalog provide); and there is one
writer per state table (micro-batches are serial within a stream — the
same single-writer contract upsert.py has).

Same read boundary as upsert.py: DECIMAL(18,2) in state, DOUBLE out.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.maintenance import _fs_and_path
from .upsert import STATE_SCHEMA, _as_read_view

# Contract parameter: keys per bucket (RANGE partitioning, not hash).
# The first cut of this module hash-bucketed keys, and the honest bench
# falsified it immediately: ANY delta larger than the bucket count
# scatters into EVERY bucket under a hash (a 10k-key batch over 16
# buckets rewrote MORE bytes than the full-rewrite baseline — 64 vs
# 55 MB/update). Range buckets have the same worst case for uniformly
# random deltas but let CLUSTERED deltas — the realistic CDC shape,
# where change keys concentrate in recent id ranges — touch only their
# few ranges. This is exactly why production table formats partition /
# data-skip on key ranges and reach for deletion vectors, not hashes,
# for update locality. Size so one bucket ~ a few GB at 100 TB.
RANGE_WIDTH = 1_000_000

_BUCKETED_SCHEMA = T.StructType(
    list(STATE_SCHEMA.fields) + [T.StructField("bucket", T.LongType())]
)


def bucket_of(key_col):
    """The partitioning function, shared by writer and any bucket-pruned
    point-lookup reader: contiguous key ranges of RANGE_WIDTH keys. The
    bucket id space is unbounded/sparse (only ranges that hold keys get a
    directory + manifest entry), so the key domain never needs declaring
    up front."""
    return F.floor(key_col / F.lit(RANGE_WIDTH)).cast("long")


# --- manifest I/O (JVM FileSystem API: works on any scheme) ---------------


def _manifest_dir(state_dir: str) -> str:
    return f"{state_dir}/manifests"


def _list_manifests(spark: SparkSession, state_dir: str) -> list[str]:
    fs, path, _ = _fs_and_path(spark, _manifest_dir(state_dir))
    if not fs.exists(path):
        return []
    out = []
    for s in fs.listStatus(path):
        name = str(s.getPath().getName())
        if s.isFile() and name.startswith("v") and name.endswith(".json"):
            out.append(name[: -len(".json")])
    return sorted(out)


def _read_manifest(spark: SparkSession, state_dir: str, version: str) -> dict:
    fs, _, jvm = _fs_and_path(spark, state_dir)
    p = jvm.org.apache.hadoop.fs.Path(f"{_manifest_dir(state_dir)}/{version}.json")
    stream = fs.open(p)
    try:
        raw = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    return json.loads(raw.decode("utf-8"))


def _write_manifest(spark: SparkSession, state_dir: str, manifest: dict) -> None:
    """Write tmp then rename: readers never observe a torn manifest. The
    rename is the commit (atomic on local FS/HDFS; see module caveat)."""
    fs, _, jvm = _fs_and_path(spark, state_dir)
    mdir = jvm.org.apache.hadoop.fs.Path(_manifest_dir(state_dir))
    fs.mkdirs(mdir)
    name = f"v{manifest['batch_id']:09d}.json"
    tmp = jvm.org.apache.hadoop.fs.Path(f"{_manifest_dir(state_dir)}/.{name}.tmp")
    final = jvm.org.apache.hadoop.fs.Path(f"{_manifest_dir(state_dir)}/{name}")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(manifest, sort_keys=True).encode("utf-8")))
    finally:
        out.close()
    if fs.exists(final):  # replay rewrites the same version: replace
        fs.delete(final, False)
    if not fs.rename(tmp, final):
        raise IOError(f"manifest commit failed: {final}")


def _latest_manifest(
    spark: SparkSession, state_dir: str, before_batch_id: int | None = None
) -> dict | None:
    versions = _list_manifests(spark, state_dir)
    if before_batch_id is not None:
        versions = [v for v in versions if int(v[1:]) < before_batch_id]
    if not versions:
        return None
    return _read_manifest(spark, state_dir, versions[-1])


# --- read path -------------------------------------------------------------


def _bucket_paths(state_dir: str, manifest: dict) -> list[str]:
    return [
        f"{state_dir}/buckets/b{int(b)}/{v}"
        for b, v in sorted(manifest["buckets"].items(), key=lambda kv: int(kv[0]))
    ]


def _read_manifest_state(
    spark: SparkSession, state_dir: str, manifest: dict | None
) -> DataFrame | None:
    if manifest is None or not manifest["buckets"]:
        return None
    return spark.read.schema(STATE_SCHEMA).parquet(*_bucket_paths(state_dir, manifest))


def read_latest_partitioned_state(
    spark: SparkSession, state_dir: str, before_batch_id: int | None = None
) -> DataFrame | None:
    """Latest committed state (union of per-bucket snapshots the newest
    manifest points at), total as DOUBLE at the read boundary."""
    return _as_read_view(
        _read_manifest_state(spark, state_dir, _latest_manifest(spark, state_dir, before_batch_id))
    )


def read_partitioned_state_version(
    spark: SparkSession, state_dir: str, batch_id: int
) -> DataFrame | None:
    """Time travel: the state exactly as committed by micro-batch batch_id
    (manifests, like bucket versions, are immutable once committed)."""
    name = f"v{batch_id:09d}"
    if name not in _list_manifests(spark, state_dir):
        return None
    return _as_read_view(
        _read_manifest_state(spark, state_dir, _read_manifest(spark, state_dir, name))
    )


# --- write path ------------------------------------------------------------


def merge_batch_into_partitioned_state(
    spark: SparkSession, state_dir: str, batch_df: DataFrame, batch_id: int
) -> None:
    """foreachBatch body: copy-on-write merge of one micro-batch.

    Only buckets that receive at least one delta key are read, merged and
    rewritten; every other bucket's manifest pointer carries over. The
    touched-bucket collect is bounded by the delta's key span over
    RANGE_WIDTH (and by the populated-range count), never by row volume."""
    delta = (
        batch_df.groupBy(F.col("key"))
        .agg(
            F.sum(F.col("amount").cast("decimal(18,2)")).alias("d_total"),
            F.count(F.lit(1)).cast("long").alias("d_rows"),
        )
        .withColumn("bucket", bucket_of(F.col("key")))
    )
    touched = sorted(r["bucket"] for r in delta.select("bucket").distinct().collect())
    prev = _latest_manifest(spark, state_dir, before_batch_id=batch_id)
    if prev is not None and prev["range_width"] != RANGE_WIDTH:
        # re-ranging is a rewrite-the-table migration, never an implicit
        # merge under a different partitioning — fail loudly
        raise ValueError(
            f"state ranged with range_width={prev['range_width']}, code has {RANGE_WIDTH}"
        )
    prev_buckets: dict[str, str] = dict(prev["buckets"]) if prev else {}

    prev_touched_paths = [
        f"{state_dir}/buckets/b{b}/{prev_buckets[str(b)]}"
        for b in touched
        if str(b) in prev_buckets
    ]
    if prev_touched_paths:
        prev_df = (
            spark.read.schema(STATE_SCHEMA)
            .parquet(*prev_touched_paths)
            .withColumn("bucket", bucket_of(F.col("key")))
        )
        zero = F.lit(0).cast("decimal(18,2)")
        p, d = prev_df.alias("p"), delta.alias("d")
        merged = p.join(d, F.col("p.key") == F.col("d.key"), "full_outer").select(
            F.coalesce(F.col("p.key"), F.col("d.key")).alias("key"),
            (F.coalesce(F.col("p.total"), zero) + F.coalesce(F.col("d.d_total"), zero))
            .cast("decimal(18,2)")
            .alias("total"),
            (F.coalesce(F.col("p.n_rows"), F.lit(0)) + F.coalesce(F.col("d.d_rows"), F.lit(0)))
            .cast("long")
            .alias("n_rows"),
            F.coalesce(F.col("p.bucket"), F.col("d.bucket")).alias("bucket"),
        )
    else:
        merged = delta.select(
            "key",
            F.col("d_total").cast("decimal(18,2)").alias("total"),
            F.col("d_rows").alias("n_rows"),
            "bucket",
        )

    # one job writes every touched bucket, partitioned by bucket id, to a
    # staging dir; per-bucket dirs then move into place with O(touched)
    # metadata renames. Data without a committed manifest is invisible.
    staging = f"{state_dir}/.staging/v{batch_id:09d}"
    merged.write.mode("overwrite").partitionBy("bucket").parquet(staging)

    fs, _, jvm = _fs_and_path(spark, state_dir)
    hpath = jvm.org.apache.hadoop.fs.Path
    vname = f"v{batch_id:09d}"
    for b in touched:
        src = hpath(f"{staging}/bucket={b}")
        dst_dir = hpath(f"{state_dir}/buckets/b{b}")
        dst = hpath(f"{state_dir}/buckets/b{b}/{vname}")
        fs.mkdirs(dst_dir)
        if fs.exists(dst):  # replay of a crashed attempt: replace its orphan
            fs.delete(dst, True)
        if fs.exists(src):
            if not fs.rename(src, dst):
                raise IOError(f"bucket move failed: {src} -> {dst}")
        else:
            # a touched bucket whose merged content is empty cannot happen
            # (full_outer keeps every prev and delta key) — fail loudly
            # rather than silently dropping a bucket from the manifest
            raise IOError(f"staging bucket missing for touched bucket {b}: {src}")
    fs.delete(hpath(staging), True)

    new_buckets = dict(prev_buckets)
    for b in touched:
        new_buckets[str(b)] = vname
    _write_manifest(
        spark,
        state_dir,
        {"batch_id": batch_id, "range_width": RANGE_WIDTH, "buckets": new_buckets},
    )


def run_partitioned_incremental_merge(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
) -> None:
    """Stream (key, amount) parquet batch files into the bucket-partitioned
    state table; availableNow drains pending files then stops."""
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
            lambda df, bid: merge_batch_into_partitioned_state(spark, state_dir, df, bid)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def expire_partitioned_versions(spark: SparkSession, state_dir: str, keep: int = 3) -> int:
    """Retention (VACUUM twin): keep the newest `keep` manifests plus every
    bucket version any of them references; delete the rest. Returns the
    number of deleted directories+manifests.

    keep clamps to >= 2 for the same replay-idempotence reason as
    upsert.expire_state_versions: a replayed latest batch must still find
    its strictly-older predecessor."""
    versions = _list_manifests(spark, state_dir)
    keep = max(keep, 2)
    doomed_manifests = versions[:-keep] if len(versions) > keep else []
    kept_manifests = versions[-keep:]
    live: set[str] = set()  # "bucket/version" pairs still referenced
    for v in kept_manifests:
        m = _read_manifest(spark, state_dir, v)
        for b, bv in m["buckets"].items():
            live.add(f"b{int(b)}/{bv}")

    fs, _, jvm = _fs_and_path(spark, state_dir)
    hpath = jvm.org.apache.hadoop.fs.Path
    deleted = 0
    broot = hpath(f"{state_dir}/buckets")
    if fs.exists(broot):
        for bstat in fs.listStatus(broot):
            if not bstat.isDirectory():
                continue
            bname = str(bstat.getPath().getName())
            for vstat in fs.listStatus(bstat.getPath()):
                vname = str(vstat.getPath().getName())
                if f"{bname}/{vname}" not in live:
                    fs.delete(vstat.getPath(), True)
                    deleted += 1
    for v in doomed_manifests:
        fs.delete(hpath(f"{_manifest_dir(state_dir)}/{v}.json"), False)
        deleted += 1
    return deleted
