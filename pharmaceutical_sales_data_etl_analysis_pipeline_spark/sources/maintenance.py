"""Table maintenance: small-file compaction.

Long-running ingest (streaming appends, per-batch writes) accretes many
small parquet files; at scale that turns every scan into a file-listing
and task-scheduling bottleneck (one task per tiny file, no vectorized
read amortization). Compaction rewrites a directory to ~target-sized
files: size-derived partition count, write to a temp sibling, atomic-ish
rename swap (single-FS metadata op on HDFS/local; object stores would
swap a manifest instead — the contract is the same).

The reference never needs this (one-shot load, LoadXML2DB.ChatterjeeP.R),
but its streaming twin (streaming/ingest.py appends one file per
micro-batch) is exactly the workload that does.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _fs_and_path(spark: SparkSession, dir_path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(dir_path)
    return path.getFileSystem(conf), path, jvm


def data_files(spark: SparkSession, dir_path: str) -> list[tuple[str, int]]:
    """(name, bytes) of the parquet data files in a table directory."""
    fs, path, _ = _fs_and_path(spark, dir_path)
    if not fs.exists(path):
        return []
    return [
        (str(s.getPath().getName()), int(s.getLen()))
        for s in fs.listStatus(path)
        if s.isFile() and str(s.getPath().getName()).endswith(".parquet")
    ]


def compact_parquet(
    spark: SparkSession,
    dir_path: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
) -> tuple[int, int]:
    """Rewrite dir_path to ceil(total_bytes / target) files; returns
    (files_before, files_after). Row content is preserved exactly (a pure
    repartition — no ordering or value changes).

    Concurrency contract: SINGLE WRITER, and readers must tolerate the
    brief swap window in which dir_path does not exist (between the two
    renames below) — plain filesystems have no atomic directory swap;
    table formats solve this with a commit log, which is out of scope
    here. A crash inside that window leaves the data only in
    '._compact_old'; the next compact call detects that state and
    restores it before doing anything else."""
    fs, path, jvm = _fs_and_path(spark, dir_path)
    tmp = jvm.org.apache.hadoop.fs.Path(dir_path + "._compact_tmp")
    old = jvm.org.apache.hadoop.fs.Path(dir_path + "._compact_old")
    # crash recovery: dir_path missing + ._compact_old present = a
    # previous run died between its two swap renames — restore the
    # original before compacting (otherwise data_files() would read the
    # missing dir as "nothing to compact" and strand the data)
    if not fs.exists(path) and fs.exists(old):
        if not fs.rename(old, path):
            raise IOError(f"compact: could not restore {dir_path} from ._compact_old")

    before = data_files(spark, dir_path)
    if not before:
        return 0, 0  # nothing to compact (empty/uncommitted dir) — no-op
    total = sum(b for _, b in before)
    n_out = max(1, -(-total // target_file_bytes))
    for stale in (tmp, old):
        if fs.exists(stale):
            fs.delete(stale, True)
    df = spark.read.parquet(dir_path)
    df.repartition(n_out).write.mode("overwrite").parquet(str(tmp))

    # swap via two renames so the original is never deleted before the
    # replacement is in place (HDFS rename reports failure via its return
    # value, not an exception — check it): dir -> .old, .tmp -> dir,
    # delete .old. A crash mid-swap leaves the data recoverable in .old.
    if not fs.rename(path, old):
        fs.delete(tmp, True)
        raise IOError(f"compact: could not move {dir_path} aside")
    if not fs.rename(tmp, path):
        fs.rename(old, path)  # roll back
        fs.delete(tmp, True)
        raise IOError(f"compact: could not move compacted data into {dir_path}")
    fs.delete(old, True)
    return len(before), len(data_files(spark, dir_path))
