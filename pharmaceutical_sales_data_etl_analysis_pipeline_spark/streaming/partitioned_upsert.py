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
      deltas/v{batch_id:09d}/             merge-on-read delta commits
      manifests/v{batch_id:09d}.json      {"batch_id": N, "range_width": W,
                                           "buckets": {"B": "v...", ...},
                                           "stats": {...}, "deltas": [...]}

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
     metadata renames). Version dir names are ATTEMPT-UNIQUE
     (v{batch_id}-{attempt}): a writer NEVER deletes or replaces an
     existing version dir, so no interleaving of writers — even two
     racing the SAME batch id — can touch a committed attempt's files
     (the r7 clobber window, now closed structurally);
  4. writes the manifest LAST — the commit point, naming exactly the
     winning attempt's dirs. The new manifest inherits every untouched
     bucket's version pointer unchanged, so untouched data is never
     read, shuffled, or rewritten. A crashed or losing attempt's dirs
     are unreferenced debris, reclaimed ONLY by retention once newer
     manifests supersede them (expire_partitioned_versions).

Per-batch cost is |batch| + |touched buckets|, not |state| + |batch|:
with B buckets and a batch touching t of them, the rewrite amplification
is t/B of the table instead of 1.0. At 100 TB with B sized so a bucket
is a few GB, a point-update batch rewrites GBs, not the table.

Replay idempotence matches upsert.py: a re-run of batch N merges into
the newest manifest STRICTLY OLDER than N (its own half-applied output
is invisible — the manifest commit never happened), writes FRESH
attempt dirs, and republishes the v{N} manifest to the identical
logical state; the crashed attempt's dirs are unreferenced debris for
retention.

Commit protocol at real scale: every manifest list/read/publish routes
through a pluggable ManifestLogStore (streaming/logstore.py — the seam
Delta's LogStore / Iceberg's catalog swap occupy). The default
HadoopRenameLogStore is the plain-FS optimistic check-then-rename:
atomic publish on local FS/HDFS, DETECTION (not exclusion) of
single-writer-contract violations — each writer snapshots the manifest
listing with its basis read and the commit rejects
(ConcurrentCommitError) if any foreign commit appears before its own.
InProcessConditionalPutLogStore makes the check+publish pair atomic
(per-table lock), giving true exclusion for every topology whose
commits share one driver process — Structured Streaming's actual
shape; FileLockLogStore extends that across PROCESSES on filesystems
with atomic create-if-absent (token-owned, TTL-bounded lock file);
ArbiterLogStore carries multi-DRIVER object-store deployments — its
compare-and-swap runs at an injectable external arbiter (the
S3 If-None-Match / DynamoDB / catalog-service seam), two-phase with
reader-side recovery. On S3A do not run the rename store multi-writer:
its rename is copy+delete. (See logstore.py; contract property-tested
across all four stores in tests/test_logstore.py.)

Same read boundary as upsert.py: DECIMAL(18,2) in state, DOUBLE out.

Beyond MERGE + time travel + retention, the module carries the remaining
primitives a production table format pairs with copy-on-write — each one
manifest-pruned so its cost scales with the CHANGE, not the table
(except re-ranging, a full rewrite by contract):

- DELETE tombstones: a batch row with op='delete' discards the key's
  prior state; upsert rows for the same key in the same batch re-insert
  from zero (orderless "replace" CDC semantics — deterministic under
  Spark's unordered batch evaluation, documented at
  merge_batch_into_partitioned_state). Batches that ALSO carry a `seq`
  column (the source log's total order) get the SEQUENCED contract
  instead: per key the last tombstone discards earlier same-batch
  upserts too, which makes the fold batch-grouping-invariant under
  uncontrolled multi-file micro-batch boundaries (r9; proof at
  _aggregate_batch, cross-batch order guarded by _require_seq_monotone
  via the manifest's max_seq high-water mark).
- Change data feed: partitioned_state_changes diffs two committed
  versions reading ONLY buckets whose manifest pointer differs — at
  100 TB a point-update CDC feed reads GBs, not the table (the generic
  snapshot diff, operators/warehouse.table_diff, must scan both full
  snapshots; this is its manifest-pruned successor).
- Compaction (OPTIMIZE): many small per-task files accumulate in a hot
  bucket's versions; compact_partitioned_state rewrites only
  over-fragmented buckets to one file each and commits a manifest with
  the SAME batch_id (suffix 'x{seq}' — logically the identical state,
  physically fewer files), so replay and time-travel semantics are
  untouched.
- Zone-map stats (file statistics): each commit records per-bucket
  n_keys / exact decimal sum / min-max of key and total, computed by one
  read-back job over only the touched buckets. They power
  partitioned_state_summary (COUNT/SUM/MIN/MAX answered from manifest
  kilobytes — Delta's stats-based aggregate shortcut) and
  read_partitioned_state_keyrange (point lookups and key-range scans
  read only the buckets whose zone maps overlap — GBs at 100 TB, not
  the table).
- Re-range migration (re-clustering twin): rerange_partitioned_state
  rewrites the latest state onto a new range width as an explicit,
  committed, full-table operation — the loud drift error's named
  migration path. Time travel to old-width commits keeps working;
  crash-replay interplay is pinned safe in tests.
- Merge-on-read (deletion-vector twin): append_delta_batch commits a
  scattered batch as a delta file — O(|batch|) bytes, ZERO bucket
  rewrites (the CoW path's measured boundary); readers fold base +
  pending deltas in batch order with one key-partitioned shuffle, and
  compact_deltas_into_base folds them in under an 'x' commit. The
  change feed is MoR-aware (each side folds its pending deltas, pruned
  to pointer-diff + one-side-delta-touched buckets); the remaining
  base-only readers (summary/keyrange/compaction/re-range/CoW merge)
  refuse loudly while deltas are pending rather than answering stale.
"""

from __future__ import annotations

import logging
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.maintenance import _fs_and_path
from .logstore import (
    ArbiterUnavailableError,
    ConcurrentCommitError,
    HadoopRenameLogStore,
    ManifestLogStore,
    is_commit_not_found,
)
from .upsert import STATE_SCHEMA, _as_read_view

_LOG = logging.getLogger(__name__)

# once-per-table advisory warnings from the sequenced-writer fence when
# running on the non-atomic rename store (see _require_seq_writer_fence)
_RENAME_FENCE_WARNED: set[str] = set()

# The commit-protocol seam (see logstore.py): every manifest list/read/
# publish below routes through this store. The default is the plain-FS
# optimistic rename; swap in InProcessConditionalPutLogStore (or an
# external-arbiter implementation of ManifestLogStore) to make the
# check+publish pair atomic — the table layer is contract-agnostic.
# Deployments pick without code via SPARK_GRAFT_LOG_STORE =
# rename | inprocess | filelock | arbiter (the same seam Delta exposes
# as spark.delta.logStore.class).


def _default_log_store() -> ManifestLogStore:
    import os as _os

    name = _os.environ.get("SPARK_GRAFT_LOG_STORE", "rename").lower()
    from .logstore import (
        FileLockLogStore,
        InProcessConditionalPutLogStore,
    )

    if name == "arbiter":
        # the multi-DRIVER deployment path: requires a running external
        # arbiter endpoint (SPARK_GRAFT_ARBITER_ENDPOINT) — constructing
        # a fresh in-memory CommitArbiter here would serialize only
        # within this process, silently giving a deployment that chose
        # 'arbiter' no cross-driver exclusion at all (ADVICE r8)
        from .arbiter_server import arbiter_store_from_env

        return arbiter_store_from_env()

    stores = {
        "rename": HadoopRenameLogStore,
        "inprocess": InProcessConditionalPutLogStore,
        "filelock": FileLockLogStore,
    }
    if name not in stores:
        raise ValueError(
            f"unknown SPARK_GRAFT_LOG_STORE={name!r}; one of "
            f"{sorted(stores) + ['arbiter']}"
        )
    return stores[name]()


_LOG_STORE: ManifestLogStore = _default_log_store()


def set_log_store(store: ManifestLogStore) -> ManifestLogStore:
    """Install a ManifestLogStore for every subsequent commit/read;
    returns the previous store (so tests/deployments can restore it)."""
    global _LOG_STORE
    prev, _LOG_STORE = _LOG_STORE, store
    return prev

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

# merge-on-read delta file schema: one row per (key, batch) carrying the
# batch's per-key fold plus the ordering column the sequenced read fold
# needs (base snapshots participate as batch_id = -1)
_DELTA_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("d_total", T.DecimalType(18, 2)),
        T.StructField("d_rows", T.LongType()),
        T.StructField("d_reset", T.BooleanType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("bucket", T.LongType()),
    ]
)


# --- table schema & evolution (r11, VERDICT ask #3) -------------------------
#
# The manifest optionally carries a `schema` field:
#     {"version": N, "values": [[state_col, batch_col, type], ...]}
# Each entry is one SUMMED VALUE COLUMN: the batch's `batch_col` folds per
# key into the state's `state_col` at decimal `type`. A manifest WITHOUT
# the field is the legacy single-value table — version 1,
# [["total", "amount", "decimal(18,2)"]] — and tables that never evolve
# keep writing field-free manifests byte-identical to r10's (no format
# bump for existing lineages). Evolution is METADATA-ONLY, the Delta/
# Iceberg contract:
#   - ADD COLUMN: append/merge with merge_schema=True adopts a batch's
#     extra numeric columns as new value columns (nullable); NO existing
#     bucket/delta file is rewritten — parquet read with the extended
#     explicit schema back-fills missing columns as NULL (verified on
#     pyspark 4.1: schema-on-read, the same mechanism Delta's mergeSchema
#     leans on), and the SUM fold skips NULLs, so keys untouched since
#     the evolution honestly read NULL for the new column.
#   - WIDEN TYPE: widen_value_column publishes a same-batch-id 'x' commit
#     recording a higher decimal precision (same scale); old files keep
#     their narrow physical type and read cleanly under the wider schema
#     (parquet decimal widening, verified on 4.1) — no rewrite.
#   - INCOMPATIBLE writes fail loudly: non-numeric new columns, unknown
#     columns without merge_schema, narrowing or scale changes, and
#     stale-schema writers (expected_schema_version mismatch).
# Reference anchor: the reference pipeline re-declares its schemas at two
# engines (LoadXML2DB.ChatterjeeP.R:29-63 vs
# LoadDataWarehouse.ChatterjeeP.R:42-77) — schema drift across pipeline
# stages is in-scope behavior, not gold-plating.

LEGACY_VALUES: list[list[str]] = [["total", "amount", "decimal(18,2)"]]

#: columns that can never be adopted as value columns
_RESERVED_BATCH_COLS = frozenset({"key", "op", "seq"})
_RESERVED_STATE_COLS = frozenset({"key", "n_rows", "bucket", "batch_id"})


def table_values(manifest: dict | None) -> list[list[str]]:
    """The table's value-column entries [state_col, batch_col, type] or —
    after a RENAME — [state_col, batch_col, type, physical_col] (r12
    column mapping, Delta's logical-name/physical-name split): state_col
    is the LOGICAL name readers see, batch_col the producer's batch
    column, physical_col the immutable parquet column name (defaults to
    state_col; files are NEVER rewritten to follow a rename). Legacy
    single-column contract when the manifest predates (or never needed)
    the schema field. Use _vphys() to address files, entry[0] for the
    read/API surface."""
    if manifest is None or "schema" not in manifest:
        return [list(v) for v in LEGACY_VALUES]
    return [list(v) for v in manifest["schema"]["values"]]


def _vphys(entry: list[str]) -> str:
    """The PHYSICAL parquet column name of a value entry — the 4th
    element when a rename recorded one, else the logical name."""
    return entry[3] if len(entry) > 3 else entry[0]


def table_retired(manifest: dict | None) -> list[str]:
    """Physical column names RETIRED by DROP COLUMN: still present in
    old files (never rewritten), hidden from every read, and permanently
    reserved so a later re-ADD of the same logical name gets a FRESH
    physical name — without this, re-adding a dropped column would
    resurrect its stale values out of pre-drop files."""
    if manifest is None or "schema" not in manifest:
        return []
    return list(manifest["schema"].get("retired", []))


def table_schema_version(manifest: dict | None) -> int:
    if manifest is None or "schema" not in manifest:
        return 1
    return int(manifest["schema"]["version"])


def _record_schema(
    manifest: dict,
    values: list[list[str]],
    version: int,
    retired: list[str] | None = None,
) -> None:
    """Stamp the schema field — only when the table has actually evolved,
    so never-evolved lineages keep emitting legacy manifests unchanged.
    Entries serialize 3-field unless a rename recorded a physical name
    (4-field), keeping pre-rename manifests byte-identical."""
    if version != 1 or values != LEGACY_VALUES or retired:
        out = [
            list(v[:3]) if _vphys(v) == v[0] else list(v[:4]) for v in values
        ]
        manifest["schema"] = {"version": version, "values": out}
        if retired:
            manifest["schema"]["retired"] = sorted(retired)


def _decimal_params(type_str: str) -> tuple[int, int]:
    """(precision, scale) of a 'decimal(p,s)' type string; loud on
    anything else — value columns are decimals by the module's exact-
    money discipline."""
    import re as _re

    m = _re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", type_str.strip().lower())
    if not m:
        raise ValueError(
            f"value-column type must be decimal(p,s), got {type_str!r}"
        )
    p, s = int(m.group(1)), int(m.group(2))
    if not (0 < p <= 38 and 0 <= s <= p):
        raise ValueError(f"invalid decimal parameters in {type_str!r}")
    return p, s


def _state_schema_for(values: list[list[str]]) -> T.StructType:
    """File-facing state schema: PHYSICAL column names — a renamed
    column keeps its original parquet name in every file."""
    fields = [T.StructField("key", T.LongType())]
    for v in values:
        p, s = _decimal_params(v[2])
        fields.append(T.StructField(_vphys(v), T.DecimalType(p, s)))
    fields.append(T.StructField("n_rows", T.LongType()))
    return T.StructType(fields)


def _delta_schema_for(values: list[list[str]]) -> T.StructType:
    """File-facing delta schema: d_{physical} columns."""
    fields = [T.StructField("key", T.LongType())]
    for v in values:
        p, s = _decimal_params(v[2])
        fields.append(T.StructField(f"d_{_vphys(v)}", T.DecimalType(p, s)))
    fields += [
        T.StructField("d_rows", T.LongType()),
        T.StructField("d_reset", T.BooleanType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("bucket", T.LongType()),
    ]
    return T.StructType(fields)


def _as_partitioned_read_view(
    df: DataFrame | None, values: list[list[str]]
) -> DataFrame | None:
    """Read boundary for the (possibly evolved) partitioned state: every
    decimal value column casts to DOUBLE; column order is key, values in
    recorded order, n_rows — identical to upsert._as_read_view for the
    legacy single-column table. This is ALSO the column-mapping
    boundary: files carry physical names, readers see logical names —
    the one alias that makes RENAME metadata-only."""
    if df is None:
        return None
    return df.select(
        "key",
        *[F.col(_vphys(v)).cast("double").alias(v[0]) for v in values],
        "n_rows",
    )


def _evolve_values_for_batch(
    batch_df: DataFrame,
    values: list[list[str]],
    merge_schema: bool,
    state_dir: str,
    retired: list[str] | None = None,
) -> tuple[list[list[str]], bool]:
    """Validate the batch's columns against the table's value schema and
    (only with merge_schema=True) adopt extra numeric columns as new
    value columns — Delta's mergeSchema contract. Returns (values,
    evolved). Loud failures:
      - extra columns without merge_schema (the stale-writer / typo
        guard: silently dropping a payload column would lose data);
      - a non-numeric extra column (no defined SUM fold);
      - an extra column colliding with a reserved state name.
    A batch MISSING an EVOLVED value column stays legal — it contributes
    NULL (nothing) to that column's fold, the back-fill semantics. The
    PRIMARY source column is mandatory: its NULL is the tombstone
    sentinel, so a batch without it would fold every key to NULL and
    silently DELETE them from the read (pre-evolution code failed this
    loudly at analysis; the parametrized fold must too)."""
    primary_src = values[0][1]
    if primary_src not in batch_df.columns:
        raise ValueError(
            f"batch for {state_dir} is missing the primary value column "
            f"{primary_src!r} — the primary's NULL means 'tombstoned', so "
            "folding an absent column would silently drop every key in "
            "the batch"
        )
    known_sources = {v[1] for v in values}
    extra = [
        c
        for c in batch_df.columns
        if c not in _RESERVED_BATCH_COLS and c not in known_sources
    ]
    if not extra:
        return values, False
    if not merge_schema:
        raise ValueError(
            f"batch for {state_dir} carries columns {sorted(extra)} unknown "
            f"to the table schema (value columns: {sorted(known_sources)}); "
            "pass merge_schema=True to ADD them as nullable value columns, "
            "or drop them — a silent drop would lose payload data"
        )
    evolved = [list(v) for v in values]
    for c in sorted(extra):
        if c in _RESERVED_STATE_COLS or c in {v[0] for v in evolved}:
            raise ValueError(
                f"cannot adopt batch column {c!r} as a value column of "
                f"{state_dir}: the name is reserved or already a state column"
            )
        dt = batch_df.schema[c].dataType
        if not isinstance(dt, T.NumericType):
            raise ValueError(
                f"cannot adopt batch column {c!r} ({dt.simpleString()}) as "
                f"a value column of {state_dir}: value columns are SUMMED "
                "per key, so only numeric types have defined fold semantics"
            )
        # physical-name assignment (r12 column mapping): a physical name
        # ever used by a DROPPED column, still used under a rename, or
        # reserved, can never be reused — old files hold its stale
        # values, and re-binding it would resurrect them. Deterministic
        # suffix search keeps replays byte-identical.
        used = (
            {_vphys(v) for v in evolved}
            | set(retired or [])
            | _RESERVED_STATE_COLS
        )
        phys, i = c, 2
        while phys in used:
            phys = f"{c}__{i}"
            i += 1
        typ = _adopted_decimal_type(c, dt, state_dir)
        evolved.append([c, c, typ] if phys == c else [c, c, typ, phys])
    return evolved, True


def _adopted_decimal_type(col: str, dt: T.DataType, state_dir: str) -> str:
    """The decimal width an ADOPTED column gets — derived from the batch
    column's own type so adoption is value-preserving, never an implicit
    quantization (ADVICE r11: the old blanket decimal(18,2) silently
    rounded sub-cent doubles at fold time and could not hold a full-range
    long — both against the layer's loud-failure doctrine):
      - integral types map to their EXACT decimal ranges (the same
        equivalences Spark's own DecimalType.forType uses), so every
        representable input round-trips;
      - an explicit DecimalType is adopted verbatim — the producer chose
        that width;
      - float/double are REFUSED: no decimal width preserves binary
        fractions exactly, so the producer must cast to an explicit
        decimal first and own the rounding, the same "by user choice"
        discipline the primary money column has."""
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    integral = {
        T.ByteType: "decimal(3,0)",
        T.ShortType: "decimal(5,0)",
        T.IntegerType: "decimal(10,0)",
        T.LongType: "decimal(20,0)",
    }
    for cls, typ in integral.items():
        if isinstance(dt, cls):
            return typ
    raise ValueError(
        f"cannot adopt batch column {col!r} ({dt.simpleString()}) as a "
        f"value column of {state_dir}: binary floating point has no "
        "exact decimal width, so adopting it would silently quantize — "
        "cast it to an explicit decimal(p,s) in the batch first (the "
        "producer chooses and owns the rounding)"
    )


def _require_schema_version(
    prev: dict | None, expected_schema_version: int | None, state_dir: str
) -> None:
    """Stale-schema writer fence: a writer that declares the schema
    version its code was built against must fail loudly when the table
    has evolved past it (its fold/projection may not know the new
    columns) — the same class of protection as Delta's protocol-version
    check."""
    if expected_schema_version is None:
        return
    actual = table_schema_version(prev)
    if actual != expected_schema_version:
        raise ConcurrentCommitError(
            f"table {state_dir} is at schema version {actual} but this "
            f"writer expected {expected_schema_version} — the schema "
            "evolved since the writer was configured; refresh the writer "
            "before it appends (a stale writer could silently drop or "
            "misfold evolved columns)"
        )


def widen_value_column(
    spark: SparkSession, state_dir: str, state_col: str, new_type: str
) -> int:
    """WIDEN TYPE, metadata-only: record a higher decimal precision for
    one value column (same scale) in a same-batch-id 'x' commit — no
    data file is rewritten; old narrow files read cleanly under the
    wider schema (parquet decimal widening, verified on pyspark 4.1).
    Narrowing or scale changes are refused — they would need a rewrite
    and can silently corrupt (scale) or overflow (precision). Returns
    the new schema version. Legal with pending deltas: delta files read
    through the same widened schema."""
    versions = _list_manifests(spark, state_dir)
    if not versions:
        raise ValueError(f"no committed state to widen in {state_dir}")
    manifest = _read_manifest(spark, state_dir, versions[-1])
    values = table_values(manifest)
    names = [v[0] for v in values]
    if state_col not in names:
        raise ValueError(
            f"unknown value column {state_col!r} in {state_dir}; have {names}"
        )
    new_p, new_s = _decimal_params(new_type)
    idx = names.index(state_col)
    old_p, old_s = _decimal_params(values[idx][2])
    if new_s != old_s or new_p < old_p:
        raise ValueError(
            f"widen_value_column only widens precision at the same scale: "
            f"{values[idx][2]} -> {new_type!r} is not a widening (old files "
            "cannot be reinterpreted; a narrowing/rescale needs the explicit "
            "rewrite migration — rewrite_value_column_type)"
        )
    if new_p == old_p:
        return table_schema_version(manifest)  # no-op, nothing to commit
    values[idx][2] = f"decimal({new_p},{new_s})"
    widened = dict(manifest)
    widened["compaction_seq"] = _next_compaction_seq(
        versions, manifest["batch_id"]
    )
    version = table_schema_version(manifest) + 1
    # through _record_schema so rename physicals and the retired list
    # survive a widen (a hand-rolled schema dict here dropped them)
    _record_schema(widened, values, version, table_retired(manifest))
    _write_manifest(spark, state_dir, widened, expected=tuple(versions))
    return version


def heartbeat_partitioned_state(spark: SparkSession, state_dir: str) -> str:
    """Renew the sequenced-writer lease WITHOUT appending data (r12,
    lease-TTL mode): republish the newest manifest's contents under the
    next 'x' commit name — same logical state (readers pick the newest
    commit per batch id), fresh file mtime, which is exactly the
    heartbeat the TTL expiry check reads. An owner whose source goes
    quiet for longer than the table's agreed TTL schedules this on a
    timer (a few bytes of manifest JSON per beat — no data touched at
    any scale). Optimistically checked like every commit, so a
    heartbeat racing a real append simply loses and is unnecessary
    (the append already renewed the lease). Returns the commit name."""
    versions = _list_manifests(spark, state_dir)
    if not versions:
        raise ValueError(f"no committed state to heartbeat in {state_dir}")
    manifest = _read_manifest(spark, state_dir, versions[-1])
    beat = dict(manifest)
    beat["compaction_seq"] = _next_compaction_seq(versions, manifest["batch_id"])
    _write_manifest(spark, state_dir, beat, expected=tuple(versions))
    return _manifest_name(beat)


def rename_value_column(
    spark: SparkSession, state_dir: str, old_name: str, new_name: str
) -> int:
    """RENAME COLUMN, metadata-only (r12, VERDICT r11 ask #4 — Delta's
    column-mapping semantics): record a new LOGICAL name for one value
    column in a same-batch-id 'x' commit. The PHYSICAL parquet name is
    immutable — every existing bucket/delta file keeps it, and future
    writes keep using it, so NO file is rewritten at any size; only the
    read boundary's alias changes. The BATCH source column is likewise
    untouched: it is a separate producer contract (the legacy table
    already reads batch `amount` into state `total`), so running
    producers keep working across the rename — rename changes what
    READERS see, exactly the reference pipeline's rename-across-stages
    (LoadXML2DB.ChatterjeeP.R:77,178-183: XML `prod`/`rID` become
    `product_name`/`rep_id` downstream). Refused loudly: unknown source
    column, a target that collides with a logical/physical/reserved/
    retired name. Returns the new schema version; renaming a column to
    itself is a no-op (no commit)."""
    versions = _list_manifests(spark, state_dir)
    if not versions:
        raise ValueError(f"no committed state to rename in {state_dir}")
    manifest = _read_manifest(spark, state_dir, versions[-1])
    values = table_values(manifest)
    names = [v[0] for v in values]
    if old_name not in names:
        raise ValueError(
            f"unknown value column {old_name!r} in {state_dir}; have {names}"
        )
    if new_name == old_name:
        return table_schema_version(manifest)  # no-op, nothing to commit
    taken = (
        set(names)
        | {_vphys(v) for v in values}
        | set(table_retired(manifest))
        | _RESERVED_STATE_COLS
        | _RESERVED_BATCH_COLS
    )
    if new_name in taken:
        raise ValueError(
            f"cannot rename {old_name!r} to {new_name!r} in {state_dir}: "
            "the target collides with an existing logical/physical "
            "column, a retired (dropped) column, or a reserved name"
        )
    idx = names.index(old_name)
    entry = values[idx]
    phys = _vphys(entry)
    values[idx] = [new_name, entry[1], entry[2]] + (
        [phys] if phys != new_name else []
    )
    renamed = dict(manifest)
    renamed["compaction_seq"] = _next_compaction_seq(
        versions, manifest["batch_id"]
    )
    version = table_schema_version(manifest) + 1
    _record_schema(renamed, values, version, table_retired(manifest))
    _write_manifest(spark, state_dir, renamed, expected=tuple(versions))
    return version


def rewrite_value_column_type(
    spark: SparkSession,
    state_dir: str,
    state_col: str,
    new_type: str,
    allow_rounding: bool = False,
) -> int:
    """TYPE REWRITE migration (r12): change one value column to a
    decimal type that old files CANNOT be reinterpreted as — narrowing
    precision, or any scale change — by rewriting the whole table, the
    explicit operation widen_value_column's refusal points at. This is
    O(table) BY CONTRACT, the same shape as rerange_partitioned_state
    (metadata-only widen covers the free direction; everything else is
    honestly a rewrite at any scale).

    Loud by doctrine, twice over:
      - RANGE: a value that cannot fit the new type raises the curated
        key-naming overflow error — never a silent NULL;
      - VALUE: unless `allow_rounding=True`, a value that would CHANGE
        under the new scale (sub-precision digits a rescale would
        round away) raises, naming the key — the producer must opt
        into lossiness explicitly, the same "owns the rounding"
        discipline adoption has.

    Requires a delta-free latest commit (compact first); commits the
    rewritten state under the same batch id's next 'x' name with the
    schema version bumped, so time travel to older commits reads the
    OLD type from the untouched old files (Delta's semantics). Future
    batch folds and the overflow guard use the new recorded type.
    Returns the new schema version; a same-type call is a no-op."""
    versions = _list_manifests(spark, state_dir)
    if not versions:
        raise ValueError(f"no committed state to rewrite in {state_dir}")
    manifest = _read_manifest(spark, state_dir, versions[-1])
    _require_no_pending_deltas(manifest, "rewrite_value_column_type")
    values = table_values(manifest)
    names = [v[0] for v in values]
    if state_col not in names:
        raise ValueError(
            f"unknown value column {state_col!r} in {state_dir}; have {names}"
        )
    idx = names.index(state_col)
    old_type = values[idx][2]
    new_p, new_s = _decimal_params(new_type)
    if (new_p, new_s) == _decimal_params(old_type):
        return table_schema_version(manifest)  # no-op, nothing to commit
    _old_p, old_s = _decimal_params(old_type)
    phys = _vphys(values[idx])
    width = manifest["range_width"]
    new_values = [list(v) for v in values]
    new_values[idx][2] = f"decimal({new_p},{new_s})"

    batch_id = manifest["batch_id"]
    seq = _next_compaction_seq(versions, batch_id)
    vname = _attempt_name(f"v{batch_id:09d}x{seq:04d}")

    if manifest["buckets"]:
        wide = f"decimal(38,{max(old_s, new_s)})"
        raw = F.col(phys)
        narrowed = _narrow_total_or_raise(
            raw, F.col("key"), f"type rewrite of {state_col!r}", new_values[idx][2]
        )
        if not allow_rounding:
            narrowed = F.when(
                raw.isNotNull()
                & (narrowed.cast(wide) != raw.cast(wide)),
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"type rewrite of {state_col!r} to "
                            f"{new_values[idx][2]} would CHANGE the value for key "
                        ),
                        F.col("key").cast("string"),
                        F.lit(" ("),
                        raw.cast("string"),
                        F.lit(" has digits the new scale rounds away) — pass "),
                        F.lit("allow_rounding=True to accept the loss"),
                    )
                ).cast(new_values[idx][2]),
            ).otherwise(narrowed)
        df = (
            spark.read.schema(_state_schema_for(values))
            .parquet(*_bucket_paths(state_dir, manifest))
            .select(
                "key",
                *[
                    narrowed.alias(phys) if i == idx else F.col(_vphys(v))
                    for i, v in enumerate(values)
                ],
                "n_rows",
            )
            .withColumn("bucket", bucket_of(F.col("key"), width))
        )
        staging = f"{state_dir}/.staging/{vname}"
        df.repartition(F.col("bucket")).write.mode("overwrite").partitionBy(
            "bucket"
        ).parquet(staging)

        fs, _, jvm = _fs_and_path(spark, state_dir)
        hpath = jvm.org.apache.hadoop.fs.Path
        new_buckets: dict[str, str] = {}
        for b in sorted(int(k) for k in manifest["buckets"]):
            src = hpath(f"{staging}/bucket={b}")
            dst = hpath(f"{state_dir}/buckets/b{b}/{vname}")
            fs.mkdirs(hpath(f"{state_dir}/buckets/b{b}"))
            if not fs.rename(src, dst):
                raise IOError(
                    f"type-rewrite move failed for bucket {b}: {src} -> {dst}"
                )
            new_buckets[str(b)] = vname
        fs.delete(hpath(staging), True)
        stats = _bucket_stats(
            spark,
            [f"{state_dir}/buckets/b{b}/{vname}" for b in sorted(map(int, new_buckets))],
            width,
            new_values,
        )
    else:
        new_buckets, stats = {}, {}

    rewritten = {
        "batch_id": batch_id,
        "compaction_seq": seq,
        "range_width": width,
        "buckets": new_buckets,
        "stats": {str(b): s for b, s in stats.items()},
        **_inherit_max_seq(manifest),
    }
    version = table_schema_version(manifest) + 1
    _record_schema(rewritten, new_values, version, table_retired(manifest))
    _write_manifest(spark, state_dir, rewritten, expected=tuple(versions))
    return version


def rename_batch_source(
    spark: SparkSession, state_dir: str, state_col: str, new_source: str
) -> int:
    """Rename the PRODUCER side of one value column's contract (r12):
    record that batches now deliver `state_col`'s values under the
    column `new_source`. The complement of rename_value_column (which
    renames what READERS see): together they cover both directions of
    the reference's rename-across-stages lineage (XML attr `rID` →
    `rep_id`, `prod` → `product_name`). Metadata-only 'x' commit; no
    file or state name changes. After the migration, a stale producer
    still sending the OLD source column fails loudly (unknown column —
    the merge_schema hint names it), and a producer that declares
    `expected_schema_version` is fenced even earlier. Refused: unknown
    state column, a source name already claimed by another column, and
    reserved batch columns (key/op/seq). Returns the new schema
    version; a no-op rename returns the current one."""
    versions = _list_manifests(spark, state_dir)
    if not versions:
        raise ValueError(f"no committed state in {state_dir}")
    manifest = _read_manifest(spark, state_dir, versions[-1])
    values = table_values(manifest)
    names = [v[0] for v in values]
    if state_col not in names:
        raise ValueError(
            f"unknown value column {state_col!r} in {state_dir}; have {names}"
        )
    idx = names.index(state_col)
    if values[idx][1] == new_source:
        return table_schema_version(manifest)  # no-op, nothing to commit
    other_sources = {v[1] for i, v in enumerate(values) if i != idx}
    if new_source in other_sources or new_source in _RESERVED_BATCH_COLS:
        raise ValueError(
            f"cannot move {state_col!r}'s batch source to {new_source!r} "
            f"in {state_dir}: the name is another column's source or a "
            "reserved batch column"
        )
    values[idx][1] = new_source
    moved = dict(manifest)
    moved["compaction_seq"] = _next_compaction_seq(versions, manifest["batch_id"])
    version = table_schema_version(manifest) + 1
    _record_schema(moved, values, version, table_retired(manifest))
    _write_manifest(spark, state_dir, moved, expected=tuple(versions))
    return version


def drop_value_column(
    spark: SparkSession, state_dir: str, name: str
) -> int:
    """DROP COLUMN, metadata-only: remove one EVOLVED value column from
    the schema in a same-batch-id 'x' commit. No file is rewritten —
    the physical column stays in old files but vanishes from every
    read (and the pruned parquet scan never even decodes its bytes, so
    a drop also makes scans cheaper immediately). The physical name is
    recorded as RETIRED: a later re-ADD of the same logical name binds
    a FRESH physical name, so pre-drop values can never resurrect.
    Refused loudly: the PRIMARY column (its NULL is the tombstone
    sentinel — dropping it would undefine the table's delete
    semantics), and unknown columns. Time travel to an OLDER batch id
    still reads the column (that commit's schema has it — Delta's
    semantics); the drop itself is an 'x' commit sharing the LATEST
    batch id, so version-reads of that batch see the post-drop schema,
    same newest-commit-wins rule as compaction. Returns the new schema
    version."""
    versions = _list_manifests(spark, state_dir)
    if not versions:
        raise ValueError(f"no committed state to drop from in {state_dir}")
    manifest = _read_manifest(spark, state_dir, versions[-1])
    values = table_values(manifest)
    names = [v[0] for v in values]
    if name not in names:
        raise ValueError(
            f"unknown value column {name!r} in {state_dir}; have {names}"
        )
    if name == names[0]:
        raise ValueError(
            f"cannot drop the PRIMARY value column {name!r} of "
            f"{state_dir}: its NULL is the tombstone sentinel, so the "
            "delete semantics of every existing file depend on it"
        )
    idx = names.index(name)
    retired = sorted(set(table_retired(manifest)) | {_vphys(values[idx])})
    values.pop(idx)
    dropped = dict(manifest)
    dropped["compaction_seq"] = _next_compaction_seq(
        versions, manifest["batch_id"]
    )
    version = table_schema_version(manifest) + 1
    _record_schema(dropped, values, version, retired)
    _write_manifest(spark, state_dir, dropped, expected=tuple(versions))
    return version


def _narrow_total_or_raise(wide, key_col, context: str, type_str: str = "decimal(18,2)"):
    """Cast a widened decimal fold back to the column's recorded state
    width, DISTINGUISHING overflow from the NULL tombstone sentinel.
    Under Spark's default non-ANSI mode the narrowing cast of an
    overflowing sum yields NULL — the same value this module uses to
    mean "only tombstones survived for this key" and then filters out,
    so an overflowing key's state would silently vanish as if deleted. A
    NULL that appears ONLY at the cast (wide value non-NULL, narrow
    NULL) is overflow, never a tombstone — raise loudly instead of
    filtering (ADVICE r6: partitioned_upsert 482/326). try_cast keeps
    the NULL-on-overflow probe mode-independent (Spark 4's ANSI default
    would otherwise throw inside the probe itself), so the error users
    see is THIS one — naming the key, the tombstone distinction, and
    the widen_value_column escape hatch — under both ANSI settings."""
    narrow = wide.try_cast(type_str)
    return F.when(
        wide.isNotNull() & narrow.isNull(),
        F.raise_error(
            F.concat(
                F.lit(f"{type_str} overflow in {context} for key "),
                key_col.cast("string"),
                F.lit(" (value "),
                wide.cast("string"),
                F.lit(") — not a tombstone; widen the state schema "),
                F.lit("(widen_value_column)"),
            )
        ).cast(type_str),
    ).otherwise(narrow)


def _cast_input_or_raise(raw, key_col, src: str, type_str: str):
    """Per-ROW input cast at the batch-fold boundary, loud on overflow.
    _narrow_total_or_raise guards the SUM-result narrowing, but the
    input cast inside the SUM (value.cast(typ)) silently NULL'd any
    single row whose value exceeds the column's recorded width under
    non-ANSI mode — losing that row's contribution without error
    (ADVICE r11). In-range values keep the recorded type's rounding
    (the producer chose the width — see _adopted_decimal_type); only
    the out-of-RANGE case, where try_cast yields NULL from a non-NULL
    input, raises."""
    narrow = raw.try_cast(type_str)
    return F.when(
        raw.isNotNull() & narrow.isNull(),
        F.raise_error(
            F.concat(
                F.lit(f"{type_str} overflow in per-row batch input of "),
                F.lit(f"{src!r} for key "),
                key_col.cast("string"),
                F.lit(" (input value "),
                raw.cast("string"),
                F.lit(") — a single row exceeds the column's recorded "),
                F.lit("width; widen the state schema (widen_value_column)"),
            )
        ).cast(type_str),
    ).otherwise(narrow)


def _is_upsert_or_raise():
    """op != 'delete' with NULL op a LOUD error instead of a silent drop:
    a NULL-op row is neither an upsert nor a tombstone under three-valued
    logic, so it would vanish from d_total/d_rows/d_reset without trace
    on both write paths (ADVICE r6: partitioned_upsert 366)."""
    return F.coalesce(
        F.col("op") != F.lit("delete"),
        F.raise_error(
            F.concat(
                F.lit("NULL op in CDC batch for key "),
                F.col("key").cast("string"),
                F.lit(" — op must be 'delete' or an upsert marker"),
            )
        ).cast("boolean"),
    )


def _require_seq_monotone(
    batch_df: DataFrame, prev: dict | None, batch_id: int
) -> tuple[int, int] | None:
    """Cross-batch half of the sequenced-CDC contract: the within-batch
    fold is batch-grouping-invariant ONLY for splits of the seq-ordered
    log into CONSECUTIVE batches, so a batch whose min seq does not lie
    strictly above the previous commit's recorded max seq means the
    source delivered files out of log order — a silently wrong fold.
    Raise loudly instead. Returns (min_seq, max_seq) for the manifest
    (None when the batch carries no seq column). Cost: one agg over the
    batch's seq column only (column-pruned scan of an in-cache
    micro-batch), O(|batch|) like the fold itself.

    Replay stays legal: a replayed batch N compares against the newest
    manifest STRICTLY OLDER than N (its own crashed commit is not its
    predecessor), so re-appending the same seq span passes."""
    if "seq" not in batch_df.columns:
        return None
    # bounds and the null count both use try_cast: a seq value that
    # fails the long cast (e.g. a non-numeric string) is exactly as
    # orderless as a literal NULL. Counting the RAW column would let it
    # slip past this guard wherever casts are non-ANSI (silent NULL), and
    # a plain cast under ANSI throws an opaque NumberFormatException from
    # inside the agg — try_cast gives the same loud, named error on
    # every session config
    seq_long = F.expr("try_cast(seq AS long)")
    # a fractional numeric seq (e.g. double 7.5) survives the long cast by
    # TRUNCATION, so bounds and the max_seq high-water mark would be
    # computed on silently shifted offsets — compare the long cast back
    # against the raw value through double and flag any drift as loudly
    # as a NULL (both sides NULL ⇒ not counted; that case is n_null's)
    seq_dbl = F.expr("try_cast(seq AS double)")
    row = batch_df.agg(
        F.min(seq_long).alias("lo"),
        F.max(seq_long).alias("hi"),
        F.count(F.when(seq_long.isNull(), F.lit(1))).alias("n_null"),
        F.count(
            F.when(seq_long.cast("double") != seq_dbl, F.lit(1))
        ).alias("n_frac"),
    ).first()
    if row["n_frac"]:
        raise ValueError(
            f"non-integer seq on {row['n_frac']} row(s) in sequenced CDC "
            f"batch {batch_id} — fractional log offsets would truncate "
            "under the long cast and mis-order the max_seq high-water mark"
        )
    if row["n_null"]:
        # checked HERE, driver-side, because an in-plan raise_error inside
        # the fold's conditionals can be short-circuited away (when()/OR
        # skip the value branch) — a NULL seq would then silently drop the
        # row from d_total exactly like the NULL-op hazard
        raise ValueError(
            f"NULL or non-integer seq on {row['n_null']} row(s) in "
            f"sequenced CDC batch {batch_id} — every row needs a log offset"
        )
    if row["lo"] is None:  # empty batch
        return None
    prev_hi = prev.get("max_seq") if prev else None
    if prev_hi is not None and row["lo"] <= prev_hi:
        raise ValueError(
            f"sequenced CDC order violation in batch {batch_id}: batch min "
            f"seq {row['lo']} <= previous commit's max seq {prev_hi} — the "
            "file source delivered batches out of log order; the fold "
            "would silently mis-sequence tombstones against upserts"
        )
    return (row["lo"], row["hi"])


def _record_max_seq(
    manifest: dict, prev: dict | None, seq_bounds: tuple[int, int] | None
) -> None:
    """Carry the sequenced-CDC high-water mark into a new manifest: the
    max of this batch's span and the predecessor's recorded mark (an
    empty or seq-free batch inherits the mark unchanged, so the monotone
    guard keeps working across it)."""
    prev_hi = prev.get("max_seq") if prev else None
    hi = seq_bounds[1] if seq_bounds else None
    mark = max(x for x in (prev_hi, hi) if x is not None) if (
        prev_hi is not None or hi is not None
    ) else None
    if mark is not None:
        manifest["max_seq"] = mark


def _inherit_max_seq(prev: dict) -> dict:
    """Maintenance commits (compaction, re-range, delta fold) reproduce
    the SAME logical state, so the sequenced-CDC high-water mark — and
    the sequenced-writer lease (`writer_id`, see
    _require_seq_writer_fence), the schema, and the producer-txn map —
    of the superseded manifest carry over unchanged. One spot for the
    idiom — it appears in every maintenance commit path, and a
    hand-copied conditional spread is exactly the kind a fifth path
    forgets (dropping writer_id in a compaction would silently unfence
    the table; dropping schema would roll the table back to the legacy
    single-column contract; dropping txns would re-admit a replayed
    producer transaction as new)."""
    return {
        k: prev[k]
        for k in ("max_seq", "writer_id", "schema", "txns")
        if k in prev
    }


# --- idempotent producer transactions (r12, Delta txnAppId/txnVersion) ------


def table_txns(manifest: dict | None) -> dict[str, int]:
    """The producer-transaction high-water map `app_id -> last applied
    version`, carried forward manifest to manifest (like writer_id and
    the schema). Delta's idempotent-writes contract: a producer that
    stamps each submission with a monotonically increasing version can
    resubmit after ANY crash or ambiguous outcome and the table applies
    it at most once."""
    if manifest is None:
        return {}
    return {str(k): int(v) for k, v in manifest.get("txns", {}).items()}


def _txn_already_applied(
    prev: dict | None, producer_txn: tuple[str, int] | None
) -> bool:
    if producer_txn is None:
        return False
    app, version = producer_txn
    if not app or not isinstance(app, str):
        raise ValueError(f"producer_txn app_id must be a non-empty string, got {app!r}")
    recorded = table_txns(prev).get(app)
    return recorded is not None and recorded >= int(version)


def _record_txns(
    manifest: dict, prev: dict | None, producer_txn: tuple[str, int] | None
) -> None:
    txns = table_txns(prev)
    if producer_txn is not None:
        app, version = producer_txn
        txns[app] = max(txns.get(app, int(version)), int(version))
    if txns:
        manifest["txns"] = txns


def seq_writer_id_for_checkpoint(checkpoint_dir: str) -> str:
    """Stable writer identity for a checkpointed sequenced stream: two
    processes can only share a checkpoint dir if they ARE the same
    logical writer (Spark's checkpoint holds the source offsets — a
    replay restarts from it), so the normalized path hashes to a token
    that survives restarts and distinguishes foreign writers. The same
    role as Delta's idempotent-writer txn appId."""
    import hashlib
    import os as _os

    p = checkpoint_dir.rstrip("/")
    if "://" not in p:
        # local paths: a replay that spells the SAME checkpoint
        # relatively vs absolutely must not fence itself out as a
        # foreign writer; scheme-qualified URIs are left verbatim
        p = _os.path.abspath(p)
    return "ckpt-" + hashlib.sha1(p.encode("utf-8")).hexdigest()[:12]


def _require_seq_writer_fence(
    spark: SparkSession,
    state_dir: str,
    listing_snapshot: tuple[str, ...],
    batch_id: int,
    prev: dict | None,
    basis_name: str | None,
    seq_bounds: tuple[int, int] | None,
    writer_id: str | None,
    takeover: bool,
    lease_ttl_ms: int | None = None,
) -> None:
    """Single-writer fence for SEQUENCED tables (called only when the
    batch carries a `seq` column). The sequenced-CDC fold depends on the
    producer's total order, so two independent writers on one table are
    a protocol error — but the per-writer guards alone cannot see each
    other: a foreign writer whose checkpointed batch ids restart at 0
    lands on the REPLAY path (same id already committed), reads a basis
    strictly older than 0 (i.e. none), sails past the max_seq monotone
    guard, and its manifest — built from an empty basis — silently drops
    every delta the real writer committed. Two fences close that:

    1. WRITER LEASE (when `writer_id` is given): the newest manifest's
       recorded writer_id IS the lease. A different writer must pass
       `takeover=True` and start a fresh batch id above the owner's
       newest (the legal handoff; seq continuity is then enforced by the
       monotone guard against the owner's max_seq). A fenced table also
       rejects anonymous sequenced appends — the owner declared
       single-writer. Fencing-token atomicity comes from the log store:
       losing a check-then-publish race flips the expected listing, so
       the publish fails ConcurrentCommitError rather than interleaving.
    2. REPLAY-BOUNDS TRIPWIRE (always): a same-id commit is only a legal
       replay if it reproduces the recorded max_seq high-water mark
       (same writer + same checkpoint => same batch content => same
       bounds). A foreign same-id batch with different bounds fails
       loudly even on anonymous lineages. (Identical bounds from
       different content is indistinguishable by construction — that
       residue is what the writer lease exists for.)

    Pinned cross-process by examples/concurrent_writers_probe.py --seq
    and tests/test_seq_writer_fence.py."""
    if writer_id is not None and isinstance(_LOG_STORE, HadoopRenameLogStore):
        # the fence's worst-case atomicity leans on the log store's
        # conditional publish; the rename store's check-then-rename is
        # NOT atomic, so two producers racing an EMPTY (or equally
        # stale) listing can both pass this fence and silently clobber.
        # The single checkpointed writer stays safe (no race to lose) —
        # warn loudly instead of breaking it, once per table
        key = f"rename-fence:{state_dir}"
        if key not in _RENAME_FENCE_WARNED:
            _RENAME_FENCE_WARNED.add(key)
            _LOG.warning(
                "sequenced-writer fence on %s is ADVISORY under the "
                "default HadoopRenameLogStore: its publish is not atomic, "
                "so simultaneous foreign producers racing the same stale "
                "listing are not excluded — set "
                "SPARK_GRAFT_LOG_STORE=filelock|arbiter for multi-writer "
                "fencing guarantees",
                state_dir,
            )
    if not listing_snapshot:
        return
    newest_name = listing_snapshot[-1]
    newest = (
        prev
        if basis_name == newest_name
        else _read_manifest(spark, state_dir, newest_name)
    )
    owner = newest.get("writer_id") if newest else None
    # the LEASE check runs first so a fenced foreigner gets the clear
    # diagnosis (who owns the table) even when its same-id batch would
    # also trip the bounds wire below
    if writer_id is None:
        if owner is not None:
            raise ConcurrentCommitError(
                f"sequenced table {state_dir} is fenced to writer "
                f"{owner!r}; anonymous sequenced appends are rejected — "
                "pass the owning writer_id (or takeover=True under a new "
                "writer_id to claim the table)"
            )
    elif owner is not None and owner != writer_id:
        if not takeover and lease_ttl_ms is not None:
            # LEASE-TTL EXPIRY (r12, VERDICT r11 ask #6, default-off):
            # the newest manifest's FILE MTIME is the owner's heartbeat
            # — every commit refreshes it, and a quiet owner can renew
            # with heartbeat_partitioned_state (a no-op 'x' commit). A
            # foreign writer that opts into a TTL may claim the lease
            # WITHOUT a manual takeover flag once the heartbeat is
            # older than the TTL; below it, the claim is refused with
            # the remaining time named. The takeover itself still obeys
            # the manual-takeover safety rules (fresh batch id above
            # the owner's newest + the max_seq monotone guard), and a
            # usurped owner that wakes up later is fenced loudly on its
            # next append — it cannot clobber the new lineage. Choose
            # the TTL well above the owner's worst-case commit gap: an
            # owner merely PAUSED past the TTL (GC, partition) is
            # evicted exactly like a dead one (the classic lease
            # trade, same as FileLockLogStore.LOCK_TTL_MS).
            fs, _, jvm = _fs_and_path(spark, state_dir)
            try:
                st = fs.getFileStatus(
                    jvm.org.apache.hadoop.fs.Path(
                        f"{_manifest_dir(state_dir)}/{newest_name}.json"
                    )
                )
            except Exception as stat_err:
                # heartbeat UNREADABLE (concurrent vacuum of the listed
                # manifest, or an FS hiccup): expiry cannot be PROVEN,
                # and the safe failure direction for a lease is to
                # refuse the claim — a retry re-lists and re-stats
                raise ConcurrentCommitError(
                    f"lease-TTL claim of {state_dir} by writer "
                    f"{writer_id!r} refused: the owner's heartbeat "
                    f"({newest_name}) could not be read ({stat_err}); "
                    "expiry is unprovable — retry with a fresh listing"
                ) from stat_err
            age_ms = jvm.java.lang.System.currentTimeMillis() - st.getModificationTime()
            if age_ms <= lease_ttl_ms:
                raise ConcurrentCommitError(
                    f"sequenced table {state_dir} is owned by writer "
                    f"{owner!r} and its lease is LIVE (last heartbeat "
                    f"{age_ms} ms ago, TTL {lease_ttl_ms} ms) — writer "
                    f"{writer_id!r} may claim it only once the heartbeat "
                    f"is older than the TTL (or with takeover=True after "
                    "the owner is verifiably stopped)"
                )
            _LOG.warning(
                "sequenced-writer lease on %s EXPIRED (owner %r silent "
                "for %d ms > TTL %d ms): writer %r is claiming the "
                "table under the takeover rules",
                state_dir,
                owner,
                age_ms,
                lease_ttl_ms,
                writer_id,
            )
        elif not takeover:
            raise ConcurrentCommitError(
                f"sequenced table {state_dir} is owned by writer "
                f"{owner!r}; writer {writer_id!r} must not append — a "
                "second sequenced producer cannot preserve the log's "
                "total order (pass takeover=True to claim the table "
                "after the owner is stopped, or lease_ttl_ms to claim "
                "automatically once the owner's heartbeat expires)"
            )
        newest_batch = _batch_id_of(newest_name)
        if batch_id <= newest_batch:
            raise ConcurrentCommitError(
                f"sequenced-writer takeover of {state_dir} must start a "
                f"new batch id above the owner's newest ({newest_batch}); "
                f"got {batch_id} — replaying the previous owner's ids "
                "would clobber its lineage"
            )
    same_id = [v for v in listing_snapshot if _batch_id_of(v) == batch_id]
    if same_id and seq_bounds is not None:
        existing = (
            newest
            if same_id[-1] == newest_name
            else _read_manifest(spark, state_dir, same_id[-1])
        )
        prev_hi = prev.get("max_seq") if prev else None
        mark = max(
            x for x in (prev_hi, seq_bounds[1]) if x is not None
        )
        if existing.get("max_seq") != mark:
            raise ConcurrentCommitError(
                f"sequenced batch id {batch_id} already committed in "
                f"{state_dir} with max_seq={existing.get('max_seq')} but "
                f"this append would record max_seq={mark} — not a replay "
                "of the same batch; a FOREIGN writer's id space collided "
                "with this lineage (replays reproduce their own bounds)"
            )


def _require_owner_for_seqfree_append(
    spark: SparkSession,
    state_dir: str,
    listing_snapshot: tuple[str, ...],
    prev: dict | None,
    basis_name: str | None,
    writer_id: str | None,
) -> None:
    """Fence check for batches WITHOUT a `seq` column: a table whose
    newest manifest carries writer_id was declared single-writer by a
    sequenced owner, and a seq-FREE append must not bypass that lease
    (ADVICE r10: the fence used to run only when the batch carried `seq`,
    so a misconfigured foreign writer appending plain batches interleaved
    silently — and the new manifest even INHERITED the owner's writer_id,
    laundering the foreign rows as the owner's). The owner itself may
    append seq-free batches (same writer_id); everyone else is rejected
    loudly. Takeover of a fenced table stays a SEQUENCED operation (the
    monotone guard needs seq bounds to hand the lineage over safely)."""
    if not listing_snapshot:
        return
    newest_name = listing_snapshot[-1]
    newest = (
        prev
        if basis_name == newest_name
        else _read_manifest(spark, state_dir, newest_name)
    )
    owner = newest.get("writer_id") if newest else None
    if owner is not None and writer_id != owner:
        raise ConcurrentCommitError(
            f"table {state_dir} is fenced to sequenced writer {owner!r}; "
            f"this seq-FREE append from writer_id={writer_id!r} is "
            "rejected — a fenced table accepts appends only from its "
            "owner (pass the owning writer_id, or claim the lease with a "
            "sequenced takeover batch)"
        )


def bucket_of(key_col, range_width: int | None = None):
    """The partitioning function, shared by writer and any bucket-pruned
    point-lookup reader: contiguous key ranges of RANGE_WIDTH keys. The
    bucket id space is unbounded/sparse (only ranges that hold keys get a
    directory + manifest entry), so the key domain never needs declaring
    up front. `range_width` overrides the module default — readers pass
    the width RECORDED IN THE MANIFEST so pruning arithmetic always
    matches the width the state was actually written with."""
    return F.floor(key_col / F.lit(range_width or RANGE_WIDTH)).cast("long")


# --- manifest I/O (JVM FileSystem API: works on any scheme) ---------------


def _manifest_dir(state_dir: str) -> str:
    return f"{state_dir}/manifests"


def _list_manifests(spark: SparkSession, state_dir: str) -> list[str]:
    return _LOG_STORE.list_commits(spark, _manifest_dir(state_dir))


def _read_manifest(spark: SparkSession, state_dir: str, version: str) -> dict:
    return _LOG_STORE.read_commit(spark, _manifest_dir(state_dir), version)


def _manifest_name(manifest: dict) -> str:
    """Commit name for a manifest. Zero-padded 'x' suffix: every consumer
    picks "the newest commit per batch id" by LEXICOGRAPHIC order, and an
    unpadded x10 would sort before x2. Ordering is load-bearing (readers,
    retention, replay all pick the lexicographic max per batch), so a seq
    past the pad width must be a loud error — 'x10000' would sort BEFORE
    'x9999' and silently roll every consumer back to the pre-compaction
    state."""
    seq = manifest.get("compaction_seq")
    if seq and seq > 9999:
        raise ValueError(
            f"compaction_seq {seq} exceeds the 4-digit zero-pad; name "
            "ordering would break — 10,000 compactions of ONE batch's "
            "state means the maintenance loop is misconfigured (merge "
            "commits reset the suffix); widening the pad requires "
            "renaming every existing manifest in lockstep"
        )
    suffix = f"x{seq:04d}" if seq else ""
    return f"v{manifest['batch_id']:09d}{suffix}"


def _write_manifest(
    spark: SparkSession,
    state_dir: str,
    manifest: dict,
    expected: tuple | None = None,
) -> None:
    """Publish a manifest through the installed log store. `expected` is
    the writer's basis listing snapshot: when given, the store must
    reject the commit (ConcurrentCommitError) if any foreign commit
    landed since — atomically, for a conditional-put store; optimistically
    check-then-publish for the default rename store. expected=None is the
    unconditional publish (tests, bootstrap paths)."""
    _LOG_STORE.commit(
        spark, _manifest_dir(state_dir), _manifest_name(manifest), manifest, expected
    )


def _next_compaction_seq(versions: list[str], batch_id: int) -> int:
    """Next 'x{seq}' suffix for a same-batch-id maintenance commit:
    max existing seq + 1, NOT a count of existing 'x' names — after
    retention vacuums superseded compactions (keeping only the newest
    per batch), a count would regress below the survivor and the new
    commit's name would sort BEFORE it, making the maintenance op a
    silent no-op (newest-per-batch readers would keep the old
    pointers)."""
    return 1 + max(
        (
            int(v.split("x")[1])
            for v in versions
            if _batch_id_of(v) == batch_id and "x" in v
        ),
        default=0,
    )


def _batch_id_of(manifest_name: str) -> int:
    """Manifest names are v{batch_id:09d} for merge commits and
    v{batch_id:09d}x{seq} for compaction commits of the same logical
    state; both sort lexicographically in commit order (the plain name is
    a strict prefix of its compactions)."""
    return int(manifest_name[1:].split("x")[0])


def _latest_manifest_name(
    spark: SparkSession, state_dir: str, before_batch_id: int | None = None
) -> str | None:
    versions = _list_manifests(spark, state_dir)
    if before_batch_id is not None:
        # compaction commits carry their source batch_id: a replayed batch N
        # may merge against a compaction of N-1 (same logical state)
        versions = [v for v in versions if _batch_id_of(v) < before_batch_id]
    return versions[-1] if versions else None


def _latest_manifest(
    spark: SparkSession, state_dir: str, before_batch_id: int | None = None
) -> dict | None:
    name = _latest_manifest_name(spark, state_dir, before_batch_id)
    return None if name is None else _read_manifest(spark, state_dir, name)


# ConcurrentCommitError now lives in logstore.py (imported above and
# re-exported here for the existing import surface).


def _attempt_name(base: str) -> str:
    """Attempt-unique version dir name. Every write path stages and
    renames into dirs named {base}-{attempt}, so no writer ever deletes
    or replaces an existing version dir — two writers racing the SAME
    batch id (the one interleaving the commit-time listing check could
    not protect, r7's documented clobber window) each land their own
    dirs and the log-store commit picks exactly one winner; the loser's
    dirs are unreferenced debris for retention. The manifest name keeps
    the plain v{batch}[x{seq}] form (replay/ordering semantics live
    there); only the DATA dir names carry the attempt suffix."""
    return f"{base}-{uuid.uuid4().hex[:8]}"


# --- read path -------------------------------------------------------------


def _bucket_paths(state_dir: str, manifest: dict) -> list[str]:
    return [
        f"{state_dir}/buckets/b{int(b)}/{v}"
        for b, v in sorted(manifest["buckets"].items(), key=lambda kv: int(kv[0]))
    ]


def _read_manifest_state(
    spark: SparkSession, state_dir: str, manifest: dict | None
) -> DataFrame | None:
    if manifest is None:
        return None
    values = table_values(manifest)
    base = (
        spark.read.schema(_state_schema_for(values))
        .parquet(*_bucket_paths(state_dir, manifest))
        if manifest["buckets"]
        else None
    )
    deltas = manifest.get("deltas", [])
    if not deltas:
        return base
    delta_rows = spark.read.schema(_delta_schema_for(values)).parquet(
        *[f"{state_dir}/deltas/{v}" for v in deltas]
    )
    return _fold_base_and_deltas(base, delta_rows, values)


def _fold_base_and_deltas(
    base: DataFrame | None,
    delta_rows: DataFrame,
    values: list[list[str]] | None = None,
) -> DataFrame | None:
    """Sequenced merge-on-read fold: the base snapshot participates as
    batch_id = -1; per key, the LAST reset batch (if any) discards every
    older contribution (including the base), then the surviving rows'
    folds sum. One hash shuffle on key — the window and the groupBy share
    the partitioning, so Catalyst plans a single exchange.

    Schema evolution: the fold runs per value column; delta/base files
    that predate an added column read it back-filled NULL, which SUM
    skips, so pre-evolution contributions honestly leave the new column
    NULL. Only the PRIMARY value column's NULL means "tombstoned" (the
    filter below) — evolved columns are nullable payload."""
    if values is None:
        values = [list(v) for v in LEGACY_VALUES]
    # file-facing fold: PHYSICAL names throughout (delta/bucket files
    # never follow a rename); the read view aliases to logical at the end
    phys = [_vphys(v) for v in values]
    primary = phys[0]
    d_cols = [f"d_{c}" for c in phys]
    u = delta_rows.select("key", *d_cols, "d_rows", "d_reset", "batch_id")
    if base is not None:
        u = u.unionByName(
            base.select(
                "key",
                *[F.col(c).alias(f"d_{c}") for c in phys],
                F.col("n_rows").alias("d_rows"),
                F.lit(False).alias("d_reset"),
                F.lit(-1).cast("long").alias("batch_id"),
            )
        )
    last_reset = F.max(
        F.when(F.col("d_reset"), F.col("batch_id"))
    ).over(Window.partitionBy("key"))
    return (
        u.withColumn("_r", last_reset)
        .filter(F.col("_r").isNull() | (F.col("batch_id") >= F.col("_r")))
        .groupBy("key")
        .agg(
            *[F.sum(f"d_{c}").alias(f"_{c}_wide") for c in phys],
            F.sum("d_rows").cast("long").alias("n_rows"),
        )
        .select(
            "key",
            *[
                _narrow_total_or_raise(
                    F.col(f"_{c}_wide"), F.col("key"), "merge-on-read fold", v[2]
                ).alias(c)
                for c, v in zip(phys, values)
            ],
            "n_rows",
        )
        .filter(F.col(primary).isNotNull())
    )


def read_latest_partitioned_state(
    spark: SparkSession, state_dir: str, before_batch_id: int | None = None
) -> DataFrame | None:
    """Latest committed state (union of per-bucket snapshots the newest
    manifest points at), value columns as DOUBLE at the read boundary."""
    manifest = _latest_manifest(spark, state_dir, before_batch_id)
    return _as_partitioned_read_view(
        _read_manifest_state(spark, state_dir, manifest), table_values(manifest)
    )


def read_partitioned_state_version(
    spark: SparkSession, state_dir: str, batch_id: int
) -> DataFrame | None:
    """Time travel: the state exactly as committed by micro-batch batch_id
    (manifests, like bucket versions, are immutable once committed). A
    compaction of that batch's state is the same logical state with fewer
    files — the newest commit for the batch_id wins, so time travel keeps
    working after the plain commit is vacuumed. Time travel to a
    pre-evolution commit reads with THAT commit's schema (the column
    simply doesn't exist yet — Delta's semantics)."""
    names = [v for v in _list_manifests(spark, state_dir) if _batch_id_of(v) == batch_id]
    if not names:
        return None
    manifest = _read_manifest(spark, state_dir, names[-1])
    return _as_partitioned_read_view(
        _read_manifest_state(spark, state_dir, manifest), table_values(manifest)
    )


# --- write path ------------------------------------------------------------


def _aggregate_batch(
    batch_df: DataFrame, width: int, values: list[list[str]] | None = None
) -> DataFrame:
    """Per-key fold of one micro-batch under the replace-CDC contract —
    shared by the copy-on-write merge and the merge-on-read append, so
    both paths have identical batch semantics. d_total is NULL when the
    key carries only tombstones in the batch; d_reset marks that the
    key's prior state is discarded before this batch's fold applies.

    TWO within-batch contracts, selected by the batch's columns:

    - op only (orderless "replace" CDC): ANY tombstone for a key
      discards its prior state, and ALL of the key's same-batch upserts
      then fold from zero — deterministic under Spark's unordered batch
      evaluation, but NOT batch-grouping-invariant: an upsert that
      PRECEDED the tombstone in the source log folds in when the two
      share a batch and is discarded when a batch boundary lands between
      them. Correct only when the producer guarantees no key carries a
      tombstone and an earlier upsert in one batch (e.g. one logical CDC
      batch per file, the oracle-fixture shape).
    - op + seq (sequenced CDC, r9): `seq` is the source log's total
      order (a Kafka offset, a CDC LSN, a file/row ordinal). Per key,
      the LAST tombstone (max seq among deletes) discards the prior
      state AND every same-batch upsert with seq <= it; only later
      upserts fold. A seq tie between a tombstone and an upsert resolves
      delete-first (the upsert is discarded) — deterministic without
      peeking at physical order. Under this contract the fold is
      BATCH-GROUPING-INVARIANT for every split of the seq-ordered log
      into consecutive batches (proof: the final state per key is
      "sum of upsert amounts with seq > last-delete seq"; the last reset
      batch B contributes exactly the post-delete upserts inside B, the
      cross-batch fold keeps batches after B in full and discards those
      before — the same set regardless of where the boundaries fall).
      Cross-batch, the writer guards that batches really are consecutive
      in seq (see _require_seq_monotone). NULL seq raises loudly, like
      NULL op.

    `values` is the table's value-column list (see table_values); the
    fold produces one summed d_{state_col} per entry. A batch missing a
    value column (pre-evolution producer) contributes NULL — nothing —
    to that column's fold, the ADD-COLUMN back-fill semantics.
    """
    if values is None:
        values = [list(v) for v in LEGACY_VALUES]

    def _src(batch_col: str, typ: str):
        if batch_col in batch_df.columns:
            return F.col(batch_col)
        return F.lit(None).cast(typ)

    def _sums(survives):
        # the input cast is guarded per SURVIVING row only: a tombstoned
        # row's payload contributes nothing, so junk in a discarded
        # row's value column must not abort the batch. Output columns
        # carry PHYSICAL names (the delta file schema).
        out = []
        for v in values:
            src, typ = v[1], v[2]
            guarded = _cast_input_or_raise(
                _src(src, typ), F.col("key"), src, typ
            )
            out.append(
                F.sum(
                    F.when(survives, guarded) if survives is not None
                    else guarded
                ).alias(f"d_{_vphys(v)}")
            )
        return out

    if "op" in batch_df.columns and "seq" in batch_df.columns:
        is_upsert = _is_upsert_or_raise()
        seq = F.coalesce(
            F.col("seq").cast("long"),
            F.raise_error(
                F.concat(
                    F.lit("NULL seq in sequenced CDC batch for key "),
                    F.col("key").cast("string"),
                    F.lit(" — every row needs a log offset"),
                )
            ).cast("long"),
        )
        last_del = F.max(F.when(~is_upsert, seq)).over(Window.partitionBy("key"))
        survives = is_upsert & (
            F.col("_last_del").isNull() | (seq > F.col("_last_del"))
        )
        return (
            batch_df.withColumn("_last_del", last_del)
            .groupBy(F.col("key"))
            .agg(
                *_sums(survives),
                F.count(F.when(survives, F.lit(1))).cast("long").alias("d_rows"),
                F.max(~is_upsert).alias("d_reset"),
            )
            .withColumn("bucket", bucket_of(F.col("key"), width))
        )
    if "op" in batch_df.columns:
        is_upsert = _is_upsert_or_raise()
        return (
            batch_df.groupBy(F.col("key"))
            .agg(
                *_sums(is_upsert),
                F.count(F.when(is_upsert, F.lit(1))).cast("long").alias("d_rows"),
                F.max(~is_upsert).alias("d_reset"),
            )
            .withColumn("bucket", bucket_of(F.col("key"), width))
        )
    return (
        batch_df.groupBy(F.col("key"))
        .agg(
            *_sums(None),
            F.count(F.lit(1)).cast("long").alias("d_rows"),
            F.lit(False).alias("d_reset"),
        )
        .withColumn("bucket", bucket_of(F.col("key"), width))
    )


def merge_batch_into_partitioned_state(
    spark: SparkSession,
    state_dir: str,
    batch_df: DataFrame,
    batch_id: int,
    range_width: int | None = None,
    writer_id: str | None = None,
    takeover: bool = False,
    merge_schema: bool = False,
    expected_schema_version: int | None = None,
    lease_ttl_ms: int | None = None,
    producer_txn: tuple[str, int] | None = None,
) -> bool:
    """foreachBatch body: copy-on-write merge of one micro-batch.

    Only buckets that receive at least one delta key are read, merged and
    rewritten; every other bucket's manifest pointer carries over. The
    touched-bucket collect is bounded by the delta's key span over
    RANGE_WIDTH (and by the populated-range count), never by row volume.

    DELETE tombstones: if the batch carries an `op` column, rows with
    op='delete' discard the key's prior state; the key's op!='delete'
    rows (if any) then fold from zero. The semantics are orderless WITHIN
    a batch by design — "replace" CDC, deterministic under Spark's
    unordered evaluation (ordered op logs need a sequence column and
    belong to a different contract). A delete of an absent key is a
    no-op; a key whose batch rows are all tombstones leaves the state.

    `range_width` sizes the key ranges for a NEW state table (defaults to
    the module contract constant); for an existing table it must match
    the width recorded in the manifest — re-ranging stays a loud error.

    Every commit also records per-bucket ZONE-MAP STATS in the manifest
    (n_keys, exact decimal sum_total, min/max of key and total), computed
    by one read-back job over ONLY the touched buckets' fresh files —
    O(|change|), never O(|state|). Untouched buckets inherit their stats
    pointer-style, so stats stay exact across commits and enable
    manifest-only aggregates (partitioned_state_summary) and stats-pruned
    scans (read_partitioned_state_keyrange) — the plain-parquet twin of
    Delta/Iceberg file statistics.

    `merge_schema`/`expected_schema_version`: ADD-COLUMN evolution and
    the stale-schema writer fence (see the table-schema section above)."""
    width = range_width or RANGE_WIDTH
    # one listing serves both the merge basis and the optimistic-commit
    # snapshot, so the two cannot disagree with each other
    listing_snapshot = tuple(_list_manifests(spark, state_dir))
    older = [v for v in listing_snapshot if _batch_id_of(v) < batch_id]
    basis_name = older[-1] if older else None
    prev = (
        None if basis_name is None else _read_manifest(spark, state_dir, basis_name)
    )
    if _txn_already_applied(prev, producer_txn):
        _LOG.info(
            "skipping producer txn %s: version already applied in %s",
            producer_txn,
            state_dir,
        )
        return False
    _require_schema_version(prev, expected_schema_version, state_dir)
    retired = table_retired(prev)
    values, evolved = _evolve_values_for_batch(
        batch_df, table_values(prev), merge_schema, state_dir, retired
    )
    schema_version = table_schema_version(prev) + (1 if evolved else 0)
    if prev is not None and prev["range_width"] != width:
        # re-ranging is a rewrite-the-table migration, never an implicit
        # merge under a different partitioning — fail loudly and name it
        # (checked BEFORE the batch aggregation runs any Spark job)
        raise ValueError(
            f"state ranged with range_width={prev['range_width']}, code has "
            f"{width}; migrate explicitly with rerange_partitioned_state"
        )
    if prev is not None:
        # a CoW merge on top of pending deltas would order the new batch
        # BEFORE them in the read fold (base participates as batch -1)
        _require_no_pending_deltas(prev, "merge_batch_into_partitioned_state")
    delta = _aggregate_batch(batch_df, width, values)
    touched = sorted(r["bucket"] for r in delta.select("bucket").distinct().collect())
    seq_bounds = _require_seq_monotone(batch_df, prev, batch_id)
    if "seq" in batch_df.columns:
        _require_seq_writer_fence(
            spark,
            state_dir,
            listing_snapshot,
            batch_id,
            prev,
            basis_name,
            seq_bounds,
            writer_id,
            takeover,
            lease_ttl_ms,
        )
    else:
        _require_owner_for_seqfree_append(
            spark, state_dir, listing_snapshot, prev, basis_name, writer_id
        )
    prev_buckets: dict[str, str] = dict(prev["buckets"]) if prev else {}

    prev_touched_paths = [
        f"{state_dir}/buckets/b{b}/{prev_buckets[str(b)]}"
        for b in touched
        if str(b) in prev_buckets
    ]
    primary = _vphys(values[0])
    if prev_touched_paths:
        # the EVOLVED schema read back-fills NULL for columns the old
        # bucket files predate (parquet schema-on-read) — no rewrite.
        # The merge runs on PHYSICAL names end to end (bucket files
        # never follow a rename).
        prev_df = (
            spark.read.schema(_state_schema_for(values))
            .parquet(*prev_touched_paths)
            .withColumn("bucket", bucket_of(F.col("key"), width))
        )
        p, d = prev_df.alias("p"), delta.alias("d")
        reset = F.coalesce(F.col("d.d_reset"), F.lit(False))
        merged_key = F.coalesce(F.col("p.key"), F.col("d.key"))

        # reset: prior state discarded, batch upserts fold from zero
        # (NULL primary if the batch held only tombstones — dropped
        # below); the widened sum narrows back through the overflow
        # guard so an overflowing key raises instead of "deleting"
        # itself. The PRIMARY column folds NULL-as-zero on both sides
        # (its NULL is the tombstone sentinel, never payload); evolved
        # columns fold NULL-preserving — two NULL sides stay NULL (the
        # honest back-fill), one-sided values carry through.
        def merged_value(col: str, typ: str):
            pv, dv = F.col(f"p.{col}"), F.col(f"d.d_{col}")
            if col == primary:
                zero = F.lit(0).cast(typ)
                wide = F.when(reset, dv).otherwise(
                    F.coalesce(pv, zero) + F.coalesce(dv, zero)
                )
            else:
                # keep BOTH operands at the delta's WIDE sum type all the
                # way to the guard: an early .cast(typ) on the one-sided
                # branch would narrow an overflowing batch fold to NULL
                # before _narrow_total_or_raise could distinguish it from
                # "no contribution" — silently dropping the value (or,
                # under ANSI, throwing a raw cast error instead of the
                # curated key-naming one). Spark widens pv + dv and
                # coalesce(dv, pv) to their common wide type on its own.
                both = pv + dv  # NULL if either side NULL
                one = F.coalesce(dv, pv)
                wide = F.when(reset, dv).otherwise(
                    F.when(pv.isNotNull() & dv.isNotNull(), both).otherwise(one)
                )
            return _narrow_total_or_raise(
                wide, merged_key, "copy-on-write merge", typ
            ).alias(col)

        merged = (
            p.join(d, F.col("p.key") == F.col("d.key"), "full_outer")
            .select(
                merged_key.alias("key"),
                *[merged_value(_vphys(v), v[2]) for v in values],
                F.when(reset, F.col("d.d_rows"))
                .otherwise(
                    F.coalesce(F.col("p.n_rows"), F.lit(0))
                    + F.coalesce(F.col("d.d_rows"), F.lit(0))
                )
                .cast("long")
                .alias("n_rows"),
                F.coalesce(F.col("p.bucket"), F.col("d.bucket")).alias("bucket"),
            )
            .filter(F.col(primary).isNotNull())
        )
    else:
        # fresh buckets (no prior state): the batch fold is still a
        # WIDENED sum, so it narrows through the same overflow-vs-
        # tombstone guard as the merge branch — a plain .cast(typ) here
        # silently NULL'd an overflowing fold into a fake tombstone
        # under non-ANSI mode (and _bucket_stats then serialized its
        # sum as the string 'None'), or threw a raw uncurated cast
        # error under ANSI (ADVICE r11). The tombstone filter runs on
        # the NARROWED primary: its NULL is identical to the wide
        # NULL because overflow raises instead of narrowing to NULL.
        merged = delta.select(
            "key",
            *[
                _narrow_total_or_raise(
                    F.col(f"d_{_vphys(v)}"),
                    F.col("key"),
                    "copy-on-write merge (fresh buckets)",
                    v[2],
                ).alias(_vphys(v))
                for v in values
            ],
            F.col("d_rows").alias("n_rows"),
            "bucket",
        ).filter(F.col(primary).isNotNull())

    # one job writes every touched bucket, partitioned by bucket id, to a
    # staging dir; per-bucket dirs then move into place with O(touched)
    # metadata renames. Data without a committed manifest is invisible,
    # and the attempt-unique vname means nothing existing is ever
    # deleted or replaced — a replay (or a same-batch-id racer) writes
    # fresh dirs and the log-store commit picks the one winner.
    vname = _attempt_name(f"v{batch_id:09d}")
    staging = f"{state_dir}/.staging/{vname}"
    merged.write.mode("overwrite").partitionBy("bucket").parquet(staging)

    fs, _, jvm = _fs_and_path(spark, state_dir)
    hpath = jvm.org.apache.hadoop.fs.Path
    new_buckets = dict(prev_buckets)
    for b in touched:
        src = hpath(f"{staging}/bucket={b}")
        dst_dir = hpath(f"{state_dir}/buckets/b{b}")
        dst = hpath(f"{state_dir}/buckets/b{b}/{vname}")
        fs.mkdirs(dst_dir)
        if fs.exists(src):
            if not fs.rename(src, dst):
                raise IOError(f"bucket move failed: {src} -> {dst}")
            new_buckets[str(b)] = vname
        elif "op" in batch_df.columns:
            # tombstones emptied the whole bucket: the range holds no keys
            # any more, so the manifest drops its pointer (the old version
            # dir stays for time travel until retention removes it)
            new_buckets.pop(str(b), None)
        else:
            # without tombstones an empty touched bucket cannot happen
            # (full_outer keeps every prev and delta key) — fail loudly
            # rather than silently dropping a bucket from the manifest
            raise IOError(f"staging bucket missing for touched bucket {b}: {src}")
    fs.delete(hpath(staging), True)

    # zone-map stats: one read-back job over ONLY the freshly written
    # bucket versions (their parquet is page-cache-hot); untouched buckets
    # inherit their stats entry exactly like they inherit their pointer
    prev_stats: dict[str, dict] = dict(prev.get("stats", {})) if prev else {}
    new_stats = {b: s for b, s in prev_stats.items() if b in new_buckets}
    written = sorted(b for b in touched if new_buckets.get(str(b)) == vname)
    if written:
        fresh = _bucket_stats(
            spark,
            [f"{state_dir}/buckets/b{b}/{vname}" for b in written],
            width,
            values,
        )
        # a written bucket with no stats row would mean an empty parquet
        # dir slipped past the tombstone branch — surface it
        missing = set(written) - set(fresh)
        if missing:
            raise IOError(f"stats read-back found no rows for buckets {sorted(missing)}")
        new_stats.update({str(b): fresh[b] for b in written})
    cow_manifest = {
        "batch_id": batch_id,
        "range_width": width,
        "buckets": new_buckets,
        "stats": new_stats,
    }
    _record_schema(cow_manifest, values, schema_version, retired)
    _record_max_seq(cow_manifest, prev, seq_bounds)
    _record_txns(cow_manifest, prev, producer_txn)
    if writer_id is not None and "seq" in batch_df.columns:
        cow_manifest["writer_id"] = writer_id
    elif prev and "writer_id" in prev:
        cow_manifest["writer_id"] = prev["writer_id"]  # keep the fence intact
    _write_manifest(
        spark,
        state_dir,
        cow_manifest,
        expected=listing_snapshot,
    )
    return True


def _bucket_stats(
    spark: SparkSession,
    version_dirs: list[str],
    width: int,
    values: list[list[str]] | None = None,
) -> dict[int, dict]:
    """Per-bucket zone-map stats over the given bucket-version dirs: one
    Spark job, O(given buckets). Decimal aggregates serialize as strings
    so the manifest JSON stays exact (sum of DECIMAL(18,2) widens to
    (28,2) under Spark's sum — no precision loss to record).

    The PRIMARY value column keeps its pinned legacy key names
    (sum_total/min_total/max_total — byte-identical manifests for
    never-evolved tables); EVOLVED columns get sum_{col}/min_{col}/
    max_{col} keys (r11). An all-NULL evolved column in a bucket stores
    null — and a stats entry computed BEFORE the column existed simply
    lacks the keys, which is the same statement (a bucket untouched
    since the evolution holds only NULLs for the new column), so
    inheritance stays exact with no back-fill pass. Reads with the
    table's recorded schema so a WIDENED column is never narrowed at
    the stats scan."""
    if values is None:
        values = [list(v) for v in LEGACY_VALUES]
    # stats are FILE-level metadata, so they key by PHYSICAL names —
    # which is what makes them rename-stable: a renamed column's
    # inherited stats entries stay correct with zero rewriting, and the
    # summary maps physical keys back to logical output names
    primary = _vphys(values[0])
    evolved = [_vphys(v) for v in values[1:]]
    aggs = [
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(primary).alias("sum_total"),
        F.min(primary).alias("min_total"),
        F.max(primary).alias("max_total"),
        F.min("key").alias("min_key"),
        F.max("key").alias("max_key"),
    ]
    for c in evolved:
        aggs += [
            F.sum(c).alias(f"sum_{c}"),
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
        ]
    rows = (
        spark.read.schema(_state_schema_for(values))
        .parquet(*version_dirs)
        .withColumn("bucket", bucket_of(F.col("key"), width))
        .groupBy("bucket")
        .agg(*aggs)
        .collect()
    )

    def _dec(v):
        return None if v is None else str(v)

    out: dict[int, dict] = {}
    for r in rows:
        entry = {
            "n_keys": int(r["n_keys"]),
            "sum_total": str(r["sum_total"]),
            "min_total": str(r["min_total"]),
            "max_total": str(r["max_total"]),
            "min_key": int(r["min_key"]),
            "max_key": int(r["max_key"]),
        }
        for c in evolved:
            entry[f"sum_{c}"] = _dec(r[f"sum_{c}"])
            entry[f"min_{c}"] = _dec(r[f"min_{c}"])
            entry[f"max_{c}"] = _dec(r[f"max_{c}"])
        out[int(r["bucket"])] = entry
    return out


def run_partitioned_incremental_merge(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    range_width: int | None = None,
    with_ops: bool = False,
) -> None:
    """Stream (key, amount) parquet batch files into the bucket-partitioned
    state table; availableNow drains pending files then stops.
    `range_width` sizes a NEW table's ranges (and must match an existing
    table's manifest) — same contract as the foreachBatch body.
    `with_ops=True` reads an additional `op` string column and streams
    replace-CDC batches (op='delete' tombstones, same orderless-within-
    batch contract as the merge body; the MoR twin
    run_partitioned_mor_ingest always carries ops)."""
    fields = [T.StructField("key", T.LongType()), T.StructField("amount", T.DoubleType())]
    if with_ops:
        fields.append(T.StructField("op", T.StringType()))
    src_schema = T.StructType(fields)
    stream = (
        spark.readStream.schema(src_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: merge_batch_into_partitioned_state(
                spark, state_dir, df, bid, range_width=range_width
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_partitioned_mor_ingest(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    range_width: int | None = None,
    compact_after: bool = True,
    max_files_per_trigger: int = 1,
    with_seq: bool = False,
    extra_value_columns: dict[str, str] | None = None,
    merge_schema: bool = False,
) -> dict:
    """Streaming merge-on-read ingest — the CDC mirror of
    run_partitioned_incremental_merge: every micro-batch (key, amount,
    op) commits as an O(|batch|) DELTA append (zero bucket reads or
    rewrites on the hot path — the scattered-update shape CoW cannot
    afford), and after the stream drains, the pending deltas fold into
    the base buckets in ONE amortized compaction that restores the
    manifest-pruned read surface. Replay idempotence is the table
    contract's (a delta commit's basis is strictly older than its batch
    id), so a crashed-and-replayed micro-batch rewrites the same delta
    file and manifest. At 100 TB this is the steady-state CDC topology:
    N appends + one fold instead of N full-spread rewrites; run the
    compaction on whatever cadence read latency demands (readers stay
    correct either way — read_latest folds pending deltas).

    `max_files_per_trigger` sizes micro-batches in source files (the
    oracle fixture keeps 1 — one logical CDC batch per file makes the
    tombstone sequencing deterministic; the scale rung runs multi-file
    batches, see SCALE.md). Returns per-batch progress — [{batch_id,
    input_rows, trigger_s}, ...] under "batches" plus the drain/compact
    wall seconds — so deployments and the rung probe can watch append
    latency without instrumenting the stream themselves. Progress is
    collected via a StreamingQueryListener, NOT q.recentProgress: the
    latter is a ring buffer capped at
    spark.sql.streaming.numRecentProgressUpdates (default 100), so a
    drain with more micro-batches would silently under-report its early
    batches (ADVICE r8).

    SCHEMA EVOLUTION across stream RESTARTS (r11): a file-stream source
    schema is fixed at query start, so adopting a new payload column is
    a restart operation — exactly Delta's streaming contract. Stop the
    stream, re-run with `extra_value_columns={"fee": "decimal(18,2)",
    ...}` and `merge_schema=True` (the producer publishes the column at
    an EXPLICIT decimal — adoption refuses binary floats, see
    _adopted_decimal_type): the source schema gains the columns (older
    files back-fill NULL at the source read — the same parquet
    schema-on-read the table layer uses), the checkpoint resumes batch
    ids where they left off, and the FIRST evolved batch commits the
    ADD-COLUMN manifest (see _evolve_values_for_batch). No old file —
    source or table — is rewritten."""
    import time as _time

    from .progress import ProgressLog

    # with_seq selects the SEQUENCED CDC contract (see _aggregate_batch):
    # rows carry the source log's total order, so tombstone-vs-upsert
    # resolution is batch-grouping-invariant under uncontrolled
    # multi-file micro-batch boundaries — the deployment shape; without
    # it, the orderless replace contract requires one logical CDC batch
    # per file. DDL string form so extra_value_columns can name any
    # Spark type ("double", "decimal(18,2)", "long", ...).
    src_schema = "key long, amount double, op string"
    if with_seq:
        src_schema += ", seq long"
    for name, typ in sorted((extra_value_columns or {}).items()):
        src_schema += f", {name} {typ}"
    stream = (
        spark.readStream.schema(src_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    collector = ProgressLog()
    spark.streams.addListener(collector)
    t0 = _time.monotonic()
    try:
        # sequenced ingest carries the checkpoint-derived writer lease: a
        # SECOND sequenced producer (its own checkpoint => its own ids,
        # restarting at 0) must fail loudly at the fence instead of
        # landing on the replay path and silently clobbering the lineage
        # (see _require_seq_writer_fence); replays of THIS stream keep
        # the same checkpoint hence the same writer_id — still legal
        wid = seq_writer_id_for_checkpoint(checkpoint_dir) if with_seq else None
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: append_delta_batch(
                    spark, state_dir, df, bid, range_width=range_width,
                    writer_id=wid, merge_schema=merge_schema,
                )
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        drain_s = _time.monotonic() - t0
        qid = str(q.id)
        # listener events are async to awaitTermination; a timed-out wait
        # means the tail of the progress list may be missing — surface
        # that instead of silently under-reporting (the exact failure
        # mode the listener replaced recentProgress to avoid)
        progress_complete = collector.wait_terminated(qid, 60)
        if not progress_complete:
            _LOG.warning(
                "streaming listener termination event not delivered within "
                "60s for query %s — the returned 'batches' list may be "
                "missing tail entries (progress_complete=False)",
                qid,
            )
    finally:
        spark.streams.removeListener(collector)
    batches = collector.batches(qid)
    t1 = _time.monotonic()
    compacted = compact_deltas_into_base(spark, state_dir) if compact_after else 0
    return {
        "batches": batches,
        "drain_s": drain_s,
        "compaction_s": _time.monotonic() - t1,
        "compacted_buckets": compacted,
        "progress_complete": progress_complete,
    }


# In-flight guard for retention: a dir that NO manifest has ever
# referenced is either a lost-race/crashed attempt (safe to reclaim) or a
# CONCURRENT writer's staged attempt whose manifest commit is seconds
# away — indistinguishable by listing alone. Deleting the latter would
# let the writer publish a manifest pointing at a vanished dir (its
# snapshot check only sees MANIFEST changes; retention that dooms no
# manifest changes none). So never-referenced dirs are reclaimed only
# past this age horizon — the same reason Delta's VACUUM refuses to
# delete young unreferenced files. Dirs referenced by a DOOMED manifest
# are committed history and vacuum immediately as before.
DEBRIS_MIN_AGE_MS = 60 * 60 * 1000  # 1 hour


def expire_partitioned_versions(
    spark: SparkSession,
    state_dir: str,
    keep: int = 3,
    debris_min_age_ms: int = DEBRIS_MIN_AGE_MS,
) -> int:
    """Retention (VACUUM twin): keep the newest `keep` manifests plus every
    bucket version any of them references; delete the rest. Returns the
    number of deleted directories+manifests.

    keep clamps to >= 2 for the same replay-idempotence reason as
    upsert.expire_state_versions: a replayed latest batch must still find
    its strictly-older predecessor.

    `keep` counts DISTINCT batch ids, not manifest files: a compaction
    commit shares its source batch's id, and keeping [vN, vNx1] while
    dropping vN-1 would leave a replayed batch N with no strictly-older
    predecessor — it would silently merge as an initial load. Within a
    kept batch only the newest commit survives (readers always pick the
    newest commit per batch id, so a plain manifest superseded by its
    compaction is unreachable — vacuuming it frees the fragmented
    pre-compaction files too).

    `debris_min_age_ms` guards NEVER-referenced dirs (see
    DEBRIS_MIN_AGE_MS above): under multi-writer optimistic appends a
    fresh unreferenced dir may be an IN-FLIGHT attempt, so it is
    reclaimed only once older than the horizon. Pass 0 from a context
    that provably has no concurrent writer (single-writer housekeeping,
    tests) to reclaim lost-race debris immediately."""
    import time as _time

    versions = _list_manifests(spark, state_dir)
    keep = max(keep, 2)
    newest_per_batch: dict[int, str] = {}
    for v in versions:  # lexicographic == (batch_id, compaction_seq) order
        newest_per_batch[_batch_id_of(v)] = v
    kept_batch_ids = sorted(newest_per_batch)[-keep:]
    kept_manifests = [newest_per_batch[b] for b in kept_batch_ids]
    doomed_manifests = [v for v in versions if v not in set(kept_manifests)]
    live: set[str] = set()  # "bucket/version" pairs a KEPT manifest references
    live_deltas: set[str] = set()  # delta commits a kept manifest still folds
    ever_referenced: set[str] = set()  # referenced by ANY current manifest
    for v in versions:
        m = _read_manifest(spark, state_dir, v)
        refs = {f"b{int(b)}/{bv}" for b, bv in m["buckets"].items()}
        deltas = set(m.get("deltas", []))
        ever_referenced |= refs | deltas
        if v in set(kept_manifests):
            live |= refs
            live_deltas |= deltas

    fs, _, jvm = _fs_and_path(spark, state_dir)
    hpath = jvm.org.apache.hadoop.fs.Path
    # Derive "now" from the FILESYSTEM's clock, not the driver's: the
    # mtimes compared below are stamped by the FS (HDFS/NFS), so driver
    # clock skew would silently shrink the in-flight horizon and reclaim
    # a live writer's fresh attempt dir early (Delta VACUUM shares the
    # caveat). Touch a probe file and read its mtime back; fall back to
    # driver wall-clock only if the probe itself fails (read-only FS).
    probe = hpath(f"{state_dir}/_clock_probe")
    try:
        fs.create(probe, True).close()
        now_ms = fs.getFileStatus(probe).getModificationTime()
        fs.delete(probe, False)
    except Exception:
        now_ms = int(_time.time() * 1000)

    def _reclaimable(ref: str, mtime_ms: int) -> bool:
        if ref in ever_referenced:
            return True  # committed history being vacuumed
        return now_ms - mtime_ms >= debris_min_age_ms  # possible in-flight
    deleted = 0
    broot = hpath(f"{state_dir}/buckets")
    if fs.exists(broot):
        for bstat in fs.listStatus(broot):
            if not bstat.isDirectory():
                continue
            bname = str(bstat.getPath().getName())
            for vstat in fs.listStatus(bstat.getPath()):
                vname = str(vstat.getPath().getName())
                ref = f"{bname}/{vname}"
                if ref not in live and _reclaimable(
                    ref, vstat.getModificationTime()
                ):
                    fs.delete(vstat.getPath(), True)
                    deleted += 1
    droot = hpath(f"{state_dir}/deltas")
    if fs.exists(droot):
        for dstat in fs.listStatus(droot):
            dname = str(dstat.getPath().getName())
            if (
                dstat.isDirectory()
                and dname not in live_deltas
                and _reclaimable(dname, dstat.getModificationTime())
            ):
                fs.delete(dstat.getPath(), True)
                deleted += 1
    for v in doomed_manifests:
        _LOG_STORE.delete_commit(spark, _manifest_dir(state_dir), v)
        deleted += 1
    return deleted


# --- change data feed (manifest-pruned) --------------------------------------


def _manifest_for_batch(spark: SparkSession, state_dir: str, batch_id: int) -> dict:
    names = [v for v in _list_manifests(spark, state_dir) if _batch_id_of(v) == batch_id]
    if not names:
        raise ValueError(f"no committed manifest for batch_id={batch_id} in {state_dir}")
    # a compaction of the batch is the same logical state — newest wins
    return _read_manifest(spark, state_dir, names[-1])


def changed_bucket_ids(from_manifest: dict, to_manifest: dict) -> list[int]:
    """Buckets whose version pointer differs between the two commits (or
    exists in only one) — the ONLY buckets a change feed must read. Pure
    so tests can assert the pruning set without touching the FS."""
    a, b = from_manifest["buckets"], to_manifest["buckets"]
    return sorted(int(k) for k in (set(a) | set(b)) if a.get(k) != b.get(k))


def partitioned_state_changes(
    spark: SparkSession, state_dir: str, from_batch_id: int, to_batch_id: int
) -> DataFrame:
    """Change data feed between two committed versions: one row per key
    whose state differs, classified insert/update/delete, with old/new
    values (totals as DOUBLE at the read boundary, like every reader).

    The manifest prune is the point: only buckets whose pointer changed
    between the two commits are read — a point-update batch's CDF costs
    O(touched buckets), never O(|state|). (Contrast
    operators/warehouse.table_diff, the generic two-full-snapshot diff.)
    A rewritten bucket can still contain untouched keys (a batch updates
    one key of a thousand in its range; compaction rewrites with zero
    changes) — those fall out of the per-key comparison below.

    MoR-aware (r7): a commit with PENDING DELTAS is a first-class side —
    each side folds base + its pending deltas (the same sequenced fold
    every reader runs; Delta's CDF reads through deletion vectors the
    same way). Pruning extends to buckets touched by a delta present in
    exactly ONE side (the symmetric difference — a delta common to both
    sides folds identically over identical base pointers and cancels in
    the per-key diff); the touched set costs one scan of those O(|batch|)
    delta files, never the table."""
    m_from = _manifest_for_batch(spark, state_dir, from_batch_id)
    m_to = _manifest_for_batch(spark, state_dir, to_batch_id)
    delta_sym = sorted(
        set(m_from.get("deltas", [])) ^ set(m_to.get("deltas", []))
    )
    changed = set(changed_bucket_ids(m_from, m_to))
    if delta_sym:
        changed |= {
            int(r["bucket"])
            # minimal projection schema: only `bucket` is needed, and it
            # exists at every delta schema version
            for r in spark.read.schema("bucket long")
            .parquet(*[f"{state_dir}/deltas/{v}" for v in delta_sym])
            .select("bucket")
            .distinct()
            .collect()
        }
    changed = sorted(changed)

    # schema-aware output with END-SCHEMA naming (r12 column mapping,
    # Delta CDF semantics): columns match by PHYSICAL identity, so a
    # pure RENAME between the commits emits no spurious updates (same
    # files, same values — only the label moved) and the output carries
    # the TO side's logical names. A column the to side DROPPED no
    # longer exists logically and is excluded (the drop is
    # metadata-only, not a data change); a column the to side ADDED
    # reads NULL on the from side. For never-evolved tables this is
    # exactly the legacy (old_total, new_total) layout, byte-identical.
    vals_from, vals_to = table_values(m_from), table_values(m_to)
    union_vals = [list(v) for v in vals_to]
    names = [v[0] for v in union_vals]
    value_fields: list[T.StructField] = []
    for c in names:
        value_fields.append(T.StructField(f"old_{c}", T.DoubleType()))
        value_fields.append(T.StructField(f"new_{c}", T.DoubleType()))
    schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("change_type", T.StringType()),
        ]
        + value_fields
        + [
            T.StructField("old_n_rows", T.LongType()),
            T.StructField("new_n_rows", T.LongType()),
        ]
    )
    if not changed:
        return spark.createDataFrame([], schema)

    changed_set = set(changed)

    def side(manifest: dict, values: list[list[str]]) -> DataFrame | None:
        paths = [
            f"{state_dir}/buckets/b{b}/{manifest['buckets'][str(b)]}"
            for b in changed
            if str(b) in manifest["buckets"]
        ]
        base = (
            spark.read.schema(_state_schema_for(values)).parquet(*paths)
            if paths
            else None
        )
        deltas = manifest.get("deltas", [])
        if deltas:
            delta_rows = (
                spark.read.schema(_delta_schema_for(values))
                .parquet(*[f"{state_dir}/deltas/{v}" for v in deltas])
                .filter(F.col("bucket").isin(list(changed_set)))
            )
            base = _fold_base_and_deltas(base, delta_rows, values)
        if base is None:
            return None
        # project onto the union's LOGICAL labels by PHYSICAL identity:
        # the fold/read above produced physical column names; a column
        # this commit predates (physical absent) is NULL
        by_phys = {_vphys(v): v for v in values}
        cols = []
        for u in union_vals:
            v = by_phys.get(_vphys(u))
            cols.append(
                F.lit(None).cast(u[2]).alias(u[0])
                if v is None
                else F.col(_vphys(v)).alias(u[0])
            )
        return base.select("key", *cols, "n_rows")

    old, new = side(m_from, vals_from), side(m_to, vals_to)
    if old is None and new is None:  # changed buckets but neither side has data
        return spark.createDataFrame([], schema)
    if old is None:
        return new.select(
            "key",
            F.lit("insert").alias("change_type"),
            *[
                x
                for c in names
                for x in (
                    F.lit(None).cast("double").alias(f"old_{c}"),
                    F.col(c).cast("double").alias(f"new_{c}"),
                )
            ],
            F.lit(None).cast("long").alias("old_n_rows"),
            F.col("n_rows").alias("new_n_rows"),
        )
    if new is None:
        return old.select(
            "key",
            F.lit("delete").alias("change_type"),
            *[
                x
                for c in names
                for x in (
                    F.col(c).cast("double").alias(f"old_{c}"),
                    F.lit(None).cast("double").alias(f"new_{c}"),
                )
            ],
            F.col("n_rows").alias("old_n_rows"),
            F.lit(None).cast("long").alias("new_n_rows"),
        )
    o, n = old.alias("o"), new.alias("n")
    j = o.join(n, F.col("o.key") == F.col("n.key"), "full_outer")
    differs = (~F.col("o.n_rows").eqNullSafe(F.col("n.n_rows")))
    for c in names:
        # null-SAFE per column: an evolved column moving NULL -> value
        # (or back) is a real update, which a plain != would miss under
        # three-valued logic
        differs = differs | (~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")))
    return j.select(
        F.coalesce(F.col("o.key"), F.col("n.key")).alias("key"),
        F.when(F.col("o.key").isNull(), F.lit("insert"))
        .when(F.col("n.key").isNull(), F.lit("delete"))
        .when(differs, F.lit("update"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
        *[
            x
            for c in names
            for x in (
                F.col(f"o.{c}").cast("double").alias(f"old_{c}"),
                F.col(f"n.{c}").cast("double").alias(f"new_{c}"),
            )
        ],
        F.col("o.n_rows").alias("old_n_rows"),
        F.col("n.n_rows").alias("new_n_rows"),
    ).filter(F.col("change_type") != "unchanged")


# --- zone-map readers (manifest stats) ---------------------------------------


def keyrange_bucket_ids(manifest: dict, key_lo: int, key_hi: int) -> list[str]:
    """The buckets a [key_lo, key_hi] scan must read: range arithmetic
    (bucket ids floor(lo/W)..floor(hi/W)) intersected with each
    candidate's min_key/max_key zone map; stats-less buckets are
    conservatively kept. Pure so tests can assert the pruning set without
    touching the FS (same pattern as changed_bucket_ids)."""
    width = manifest["range_width"]
    stats = manifest.get("stats", {})
    b_lo, b_hi = key_lo // width, key_hi // width
    return sorted(
        (
            b
            for b in manifest["buckets"]
            if b_lo <= int(b) <= b_hi
            and (
                b not in stats
                or (stats[b]["min_key"] <= key_hi and stats[b]["max_key"] >= key_lo)
            )
        ),
        key=int,
    )


def partitioned_state_summary(
    spark: SparkSession, state_dir: str, batch_id: int | None = None
) -> DataFrame:
    """Table-level aggregates answered from the MANIFEST, not the data:
    COUNT(*), exact SUM(total), MIN/MAX(total) fold over the per-bucket
    zone-map stats — kilobytes of JSON on the driver, zero data files
    read. At 100 TB this is the difference between a metadata lookup and
    a full table scan (Delta answers SELECT COUNT(*) the same way, from
    Add-file stats). The decimal fold uses Python's exact Decimal — same
    conversion-exact discipline as the engine's money sums — and casts to
    DOUBLE only at the read boundary.

    Buckets whose manifest entry predates zone-map stats (or a whole
    pre-stats manifest) fall back to ONE scan job over just those
    buckets, so the cost tracks the un-statted fraction — and a later
    commit or compaction of those buckets heals them forward."""
    from decimal import Decimal

    manifest = (
        _latest_manifest(spark, state_dir)
        if batch_id is None
        else _manifest_for_batch(spark, state_dir, batch_id)
    )
    values = table_values(manifest)
    # output columns carry LOGICAL names; stats entries key by PHYSICAL
    # (see _bucket_stats) — the zip below is the rename mapping. The
    # PRIMARY's output keys stay the pinned legacy sum_total/min_total/
    # max_total regardless of its logical name (they are the summary's
    # API, like `total` is the read view's).
    evolved = [(v[0], _vphys(v)) for v in values[1:]]
    fields = [
        T.StructField("n_keys", T.LongType()),
        T.StructField("sum_total", T.DoubleType()),
        T.StructField("min_total", T.DoubleType()),
        T.StructField("max_total", T.DoubleType()),
    ]
    for c_log, _c_phys in evolved:
        fields += [
            T.StructField(f"sum_{c_log}", T.DoubleType()),
            T.StructField(f"min_{c_log}", T.DoubleType()),
            T.StructField(f"max_{c_log}", T.DoubleType()),
        ]
    schema = T.StructType(fields)
    if manifest is not None:
        _require_no_pending_deltas(manifest, "partitioned_state_summary")
    if manifest is None or not manifest["buckets"]:
        return spark.createDataFrame(
            [(0,) + (None,) * (3 + 3 * len(evolved))], schema
        )
    stats = manifest.get("stats", {})
    missing = [b for b in manifest["buckets"] if b not in stats]
    folded = dict(stats)
    if missing:
        folded.update(
            {
                str(b): s
                for b, s in _bucket_stats(
                    spark,
                    [
                        f"{state_dir}/buckets/b{int(b)}/{manifest['buckets'][b]}"
                        for b in missing
                    ],
                    manifest["range_width"],
                    values,
                ).items()
            }
        )
    n = sum(s["n_keys"] for s in folded.values())
    total = sum(Decimal(s["sum_total"]) for s in folded.values())
    lo = min(Decimal(s["min_total"]) for s in folded.values())
    hi = max(Decimal(s["max_total"]) for s in folded.values())
    row = [n, float(total), float(lo), float(hi)]
    for _c_log, c in evolved:
        # a stats entry that PREDATES the column, or recorded null, means
        # that bucket holds only NULLs for it — both fold as "no
        # contribution"; all-absent folds to NULL (the honest back-fill,
        # matching what a full scan would aggregate)
        have = [
            s for s in folded.values() if s.get(f"sum_{c}") is not None
        ]
        row += [
            float(sum(Decimal(s[f"sum_{c}"]) for s in have)) if have else None,
            float(min(Decimal(s[f"min_{c}"]) for s in have)) if have else None,
            float(max(Decimal(s[f"max_{c}"]) for s in have)) if have else None,
        ]
    return spark.createDataFrame([tuple(row)], schema)


def read_partitioned_state_keyrange(
    spark: SparkSession,
    state_dir: str,
    key_lo: int,
    key_hi: int,
    batch_id: int | None = None,
) -> DataFrame:
    """Key-range scan pruned to the buckets that can hold [key_lo,
    key_hi]: first by range arithmetic (bucket ids floor(lo/W) ..
    floor(hi/W) — free, no stats needed), then by each candidate's
    min_key/max_key zone map (a populated range whose actual keys all
    fall outside the predicate is skipped even though its id overlaps).
    A point lookup at 100 TB reads ONE bucket — a few GB — instead of the
    table; this is the read-side payoff of range (not hash) bucketing.
    Buckets without stats are conservatively read (pre-stats manifests);
    the exact filter on `key` makes pruning a pure optimization either
    way. DOUBLE at the read boundary like every other reader."""
    if key_hi < key_lo:
        raise ValueError(f"empty key range: [{key_lo}, {key_hi}]")
    manifest = (
        _latest_manifest(spark, state_dir)
        if batch_id is None
        else _manifest_for_batch(spark, state_dir, batch_id)
    )
    if manifest is not None:
        _require_no_pending_deltas(manifest, "read_partitioned_state_keyrange")
    values = table_values(manifest)
    state_schema = _state_schema_for(values)
    if manifest is None or not manifest["buckets"]:
        return _as_partitioned_read_view(
            spark.createDataFrame([], state_schema), values
        )
    keep = keyrange_bucket_ids(manifest, key_lo, key_hi)
    if not keep:
        return _as_partitioned_read_view(
            spark.createDataFrame([], state_schema), values
        )
    paths = [f"{state_dir}/buckets/b{int(b)}/{manifest['buckets'][b]}" for b in keep]
    return _as_partitioned_read_view(
        spark.read.schema(state_schema)
        .parquet(*paths)
        .filter(F.col("key").between(F.lit(key_lo), F.lit(key_hi))),
        values,
    )


# --- compaction (OPTIMIZE twin) ----------------------------------------------


def _bucket_data_files(fs, jvm, bucket_version_dir: str) -> tuple[int, int]:
    """(parquet file count, total parquet bytes) of a bucket-version dir."""
    p = jvm.org.apache.hadoop.fs.Path(bucket_version_dir)
    if not fs.exists(p):
        return 0, 0
    n = total = 0
    for s in fs.listStatus(p):
        if s.isFile() and str(s.getPath().getName()).endswith(".parquet"):
            n += 1
            total += int(s.getLen())
    return n, total


def _bucket_data_file_count(fs, jvm, bucket_version_dir: str) -> int:
    return _bucket_data_files(fs, jvm, bucket_version_dir)[0]


def compact_partitioned_state(
    spark: SparkSession,
    state_dir: str,
    max_files: int = 1,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """OPTIMIZE twin: rewrite every bucket whose latest version holds more
    than `max_files` parquet data files down to ~`target_file_bytes`
    files, and commit a manifest with the SAME batch_id suffixed
    'x{seq}' — the identical logical state, physically defragmented.
    Untouched buckets keep their pointers; replay/time-travel semantics
    are unchanged because _batch_id_of treats the compaction as its
    source batch.

    BIN-PACKING (r7): a bucket at production width is a few GB — one
    file per bucket (the old contract) makes multi-GB parquet files
    that kill scan parallelism and retry granularity. The rewrite now
    targets `target_file_bytes` per output file, the real OPTIMIZE
    contract: bytes-per-row is measured from the fragmented buckets'
    own files (fixed schema → uniform rows), converted to ONE global
    maxRecordsPerFile, so each bucket lands ceil(bucket_rows / rpf)
    files — exactly 1 at test scale, ~bucket_bytes/target at 100 TB —
    without any per-bucket salting machinery.

    Returns the number of buckets compacted. Scale shape: the read is
    pruned to the fragmented buckets; one repartition(bucket) shuffle
    gives one writing task per bucket, maxRecordsPerFile splits within."""
    versions = _list_manifests(spark, state_dir)
    if not versions:
        return 0
    latest_name = versions[-1]
    manifest = _read_manifest(spark, state_dir, latest_name)
    _require_no_pending_deltas(manifest, "compact_partitioned_state")
    fs, _, jvm = _fs_and_path(spark, state_dir)
    fragmented: list[int] = []
    frag_bytes = 0
    for b, v in manifest["buckets"].items():
        n, nbytes = _bucket_data_files(fs, jvm, f"{state_dir}/buckets/b{int(b)}/{v}")
        if n > max_files:
            fragmented.append(int(b))
            frag_bytes += nbytes
    if not fragmented:
        return 0
    fragmented.sort()

    batch_id = manifest["batch_id"]
    seq = _next_compaction_seq(versions, batch_id)
    vname = _attempt_name(f"v{batch_id:09d}x{seq:04d}")

    src_paths = [
        f"{state_dir}/buckets/b{b}/{manifest['buckets'][str(b)]}" for b in fragmented
    ]
    df = (
        # the manifest's (possibly evolved) schema: a compaction that read
        # the legacy narrow schema would silently DROP evolved columns
        # from the rewritten buckets
        spark.read.schema(_state_schema_for(table_values(manifest)))
        .parquet(*src_paths)
        .withColumn("bucket", bucket_of(F.col("key"), manifest["range_width"]))
    )
    # rows in the fragmented set: prefer the manifest's zone-map stats
    # (free); scan-count only buckets predating stats
    stats = manifest.get("stats", {})
    frag_rows = 0
    unstatted = [b for b in fragmented if str(b) not in stats]
    for b in fragmented:
        if str(b) in stats:
            frag_rows += int(stats[str(b)]["n_keys"])
    if unstatted:
        frag_rows += (
            spark.read.schema(_state_schema_for(table_values(manifest)))
            .parquet(
                *[f"{state_dir}/buckets/b{b}/{manifest['buckets'][str(b)]}" for b in unstatted]
            )
            .count()
        )
    # measured bytes/row over the set -> global records-per-file target
    # (parquet re-encodes, but same schema+codec => same-order sizes)
    bytes_per_row = max(1.0, frag_bytes / max(frag_rows, 1))
    rpf = max(1, int(target_file_bytes / bytes_per_row))
    staging = f"{state_dir}/.staging/{vname}"
    # repartition BY bucket -> each bucket's rows land in exactly one task;
    # maxRecordsPerFile bin-packs within the task
    df.repartition(F.col("bucket")).write.mode("overwrite").option(
        "maxRecordsPerFile", rpf
    ).partitionBy("bucket").parquet(staging)

    hpath = jvm.org.apache.hadoop.fs.Path
    new_buckets = dict(manifest["buckets"])
    for b in fragmented:
        src = hpath(f"{staging}/bucket={b}")
        dst = hpath(f"{state_dir}/buckets/b{b}/{vname}")
        fs.mkdirs(hpath(f"{state_dir}/buckets/b{b}"))
        if not fs.exists(src) or not fs.rename(src, dst):
            raise IOError(f"compaction move failed for bucket {b}: {src} -> {dst}")
        new_buckets[str(b)] = vname
    fs.delete(hpath(staging), True)

    _write_manifest(
        spark,
        state_dir,
        {
            "batch_id": batch_id,
            "compaction_seq": seq,
            "range_width": manifest["range_width"],
            "buckets": new_buckets,
            # identical logical state -> stats carry over byte-for-byte
            # (a pre-stats manifest compacts to a pre-stats manifest;
            # partitioned_state_summary scan-falls-back per bucket)
            "stats": dict(manifest.get("stats", {})),
            # identical logical state -> the sequenced-CDC high-water
            # mark carries over too (same for every maintenance commit)
            **_inherit_max_seq(manifest),
        },
        expected=tuple(versions),
    )
    return len(fragmented)


def rerange_partitioned_state(
    spark: SparkSession, state_dir: str, new_width: int
) -> int:
    """Re-range migration (liquid-reclustering twin): rewrite the LATEST
    state onto a new range width and commit it — the explicit operation
    the merge's range_width drift error points at. This is a full-table
    rewrite BY CONTRACT (any key may change buckets when the width
    does): one shuffle partitioned by the new bucket id, the same shape
    a table format's re-clustering/OPTIMIZE FULL pays. Use it when the
    width chosen at table creation stops matching the key domain — the
    exact tuning the zone-map fixture derives automatically up front.

    Commits like a compaction: SAME batch_id under the next 'x{seq}'
    suffix — the identical logical state, physically re-partitioned —
    so time travel to older batches keeps reading the OLD-width
    manifests untouched, and retention eventually vacuums the old-width
    bucket dirs once no kept manifest references them. Zone-map stats
    are recomputed for every new bucket (one read-back job, same as a
    merge's — here O(table) because the rewrite is O(table)).

    Crash-replay interplay (test_replay_after_rerange): a replay of the
    final batch with the stream's OLD width merges against its old-width
    predecessor and recommits the plain manifest — which the re-range's
    'x{seq}' commit supersedes (newest-per-batch wins), so the state is
    untouched; a replay with the NEW width hits the old-width
    predecessor and fails with the drift error. Either way, never
    silent corruption. Returns the new bucket count."""
    if new_width < 1:
        raise ValueError(f"range_width must be >= 1, got {new_width}")
    versions = _list_manifests(spark, state_dir)
    if not versions:
        raise ValueError(f"no committed state to re-range in {state_dir}")
    manifest = _read_manifest(spark, state_dir, versions[-1])
    _require_no_pending_deltas(manifest, "rerange_partitioned_state")
    if manifest["range_width"] == new_width:
        return len(manifest["buckets"])
    if not manifest["buckets"]:
        # empty table: just commit the width change
        batch_id = manifest["batch_id"]
        seq = _next_compaction_seq(versions, batch_id)
        _write_manifest(
            spark,
            state_dir,
            {
                "batch_id": batch_id,
                "compaction_seq": seq,
                "range_width": new_width,
                "buckets": {},
                "stats": {},
                **_inherit_max_seq(manifest),
            },
            expected=tuple(versions),
        )
        return 0

    batch_id = manifest["batch_id"]
    seq = _next_compaction_seq(versions, batch_id)
    vname = _attempt_name(f"v{batch_id:09d}x{seq:04d}")

    df = (
        # evolved columns rewrite with the table (same schema note as
        # compact_partitioned_state)
        spark.read.schema(_state_schema_for(table_values(manifest)))
        .parquet(*_bucket_paths(state_dir, manifest))
        .withColumn("bucket", bucket_of(F.col("key"), new_width))
    )
    staging = f"{state_dir}/.staging/{vname}"
    df.repartition(F.col("bucket")).write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(staging)

    fs, _, jvm = _fs_and_path(spark, state_dir)
    hpath = jvm.org.apache.hadoop.fs.Path
    new_bucket_ids = sorted(
        int(str(s.getPath().getName()).split("=")[1])
        for s in fs.listStatus(hpath(staging))
        if s.isDirectory() and str(s.getPath().getName()).startswith("bucket=")
    )
    new_buckets: dict[str, str] = {}
    for b in new_bucket_ids:
        src = hpath(f"{staging}/bucket={b}")
        dst = hpath(f"{state_dir}/buckets/b{b}/{vname}")
        fs.mkdirs(hpath(f"{state_dir}/buckets/b{b}"))
        if not fs.rename(src, dst):
            raise IOError(f"re-range move failed for bucket {b}: {src} -> {dst}")
        new_buckets[str(b)] = vname
    fs.delete(hpath(staging), True)

    stats = _bucket_stats(
        spark,
        [f"{state_dir}/buckets/b{b}/{vname}" for b in new_bucket_ids],
        new_width,
        table_values(manifest),
    )
    _write_manifest(
        spark,
        state_dir,
        {
            "batch_id": batch_id,
            "compaction_seq": seq,
            "range_width": new_width,
            "buckets": new_buckets,
            "stats": {str(b): s for b, s in stats.items()},
            **_inherit_max_seq(manifest),
        },
        expected=tuple(versions),
    )
    return len(new_buckets)


# --- merge-on-read (deletion-vector-style scattered updates) -----------------
#
# The copy-on-write MERGE's measured boundary (SCALE.md): a SCATTERED
# delta touches every range bucket and rewrites more than the table.
# Production formats answer with merge-on-read — append the delta, make
# readers fold it, fold into the base occasionally. Same answer here on
# the same manifest machinery:
#
#     state_dir/deltas/v{batch_id:09d}/    the batch's per-key fold
#     manifest["deltas"] = [v..., ...]     ordered pending delta commits
#
# append_delta_batch writes O(|batch|) bytes regardless of how the keys
# scatter; read_latest/read_version fold base + pending deltas with one
# key-partitioned shuffle (window + groupBy share the exchange); and
# compact_deltas_into_base folds the pending deltas into the buckets
# they touch under a same-batch-id 'x' commit, restoring the zero-cost
# read path. Manifest-pruned readers whose guarantees are base-only
# (summary, keyrange, CDF, compaction, re-range) REFUSE while deltas are
# pending — the honest contract, loud rather than stale.


def append_delta_batch(
    spark: SparkSession,
    state_dir: str,
    batch_df: DataFrame,
    batch_id: int,
    range_width: int | None = None,
    expect_new: bool = False,
    writer_id: str | None = None,
    takeover: bool = False,
    merge_schema: bool = False,
    expected_schema_version: int | None = None,
    outage_retry_s: float = 0.0,
    lease_ttl_ms: int | None = None,
    producer_txn: tuple[str, int] | None = None,
    stats: dict | None = None,
) -> bool:
    """Merge-on-read write path: commit one micro-batch as a DELTA file —
    no bucket is read or rewritten, so a uniformly scattered batch costs
    O(|batch|) instead of CoW's O(all touched buckets). Same replace-CDC
    batch semantics as the merge (shared _aggregate_batch), same replay
    idempotence (basis strictly older than batch_id; the delta file and
    manifest rewrite to the same state), same optimistic concurrency
    check at the commit point.

    `expect_new=True` (the multi-writer optimistic path) turns an
    ALREADY-COMMITTED same batch id into a loud ConcurrentCommitError
    instead of a replay: replay idempotence assumes same id = same
    logical content (the single checkpointed writer's guarantee), but an
    optimistic writer allocating ids from a stale listing can collide
    with a FOREIGN batch under the same id — the expected-listing check
    alone cannot catch that, because by this function's own snapshot the
    foreign manifest already exists and a replay would OVERWRITE it
    (found live by examples/concurrent_writers_probe.py at 4 writers).

    `writer_id`/`takeover`: the sequenced-table single-writer fence (see
    _require_seq_writer_fence) — checked only when the batch carries a
    `seq` column. The checkpointed ingest passes
    seq_writer_id_for_checkpoint(checkpoint_dir) automatically.

    `merge_schema`/`expected_schema_version`: ADD-COLUMN evolution and
    the stale-schema writer fence (see the table-schema section above).
    An evolved append writes its delta under the NEW schema; older delta
    and bucket files are never rewritten — readers back-fill NULL.

    `outage_retry_s` (arbiter deployments): how long to keep retrying
    the ambiguity RECONCILIATION when the commit outcome is unknown and
    the arbiter is unreachable (service blip or restart). 0 = fail-stop
    immediately (default; the checkpointed streamed writer resolves on
    replay). See _reconcile_with_outage_retry for why the retry target
    is the reconciliation, never the append itself."""
    listing_snapshot = tuple(_list_manifests(spark, state_dir))
    if expect_new and any(_batch_id_of(v) == batch_id for v in listing_snapshot):
        raise ConcurrentCommitError(
            f"batch id {batch_id} already committed in {state_dir} — a "
            "foreign writer won the id between allocation and snapshot; "
            "reallocate from a fresh listing"
        )
    older = [v for v in listing_snapshot if _batch_id_of(v) < batch_id]
    basis_name = older[-1] if older else None
    prev = (
        None if basis_name is None else _read_manifest(spark, state_dir, basis_name)
    )
    width = range_width or (prev["range_width"] if prev else RANGE_WIDTH)
    if _txn_already_applied(prev, producer_txn):
        # idempotent resubmission (Delta txnAppId/txnVersion): this
        # producer transaction is already folded into the lineage —
        # a crash-and-resubmit or an ambiguous outcome resolved by the
        # producer retrying lands here and writes NOTHING
        _LOG.info(
            "skipping producer txn %s: version already applied in %s",
            producer_txn,
            state_dir,
        )
        return False
    if prev is not None and prev["range_width"] != width:
        raise ValueError(
            f"state ranged with range_width={prev['range_width']}, code has "
            f"{width}; migrate explicitly with rerange_partitioned_state"
        )
    _require_schema_version(prev, expected_schema_version, state_dir)
    retired = table_retired(prev)
    values, evolved = _evolve_values_for_batch(
        batch_df, table_values(prev), merge_schema, state_dir, retired
    )
    schema_version = table_schema_version(prev) + (1 if evolved else 0)

    seq_bounds = _require_seq_monotone(batch_df, prev, batch_id)
    if "seq" in batch_df.columns:
        _require_seq_writer_fence(
            spark,
            state_dir,
            listing_snapshot,
            batch_id,
            prev,
            basis_name,
            seq_bounds,
            writer_id,
            takeover,
            lease_ttl_ms,
        )
    else:
        _require_owner_for_seqfree_append(
            spark, state_dir, listing_snapshot, prev, basis_name, writer_id
        )

    # attempt-unique delta dir: a replay (or same-batch-id racer) writes
    # a fresh dir instead of overwriting — the committed manifest names
    # the winner; losers/orphans are retention debris
    vname = _attempt_name(f"v{batch_id:09d}")
    delta = _aggregate_batch(batch_df, width, values)
    # SUM widened the fold; store at each column's recorded state width
    # (same cast boundary as the CoW merge, same overflow-vs-tombstone
    # distinction: a batch whose own fold overflows the recorded type
    # raises instead of writing a fake tombstone)
    for v in values:
        dcol = f"d_{_vphys(v)}"
        delta = delta.withColumn(
            dcol,
            _narrow_total_or_raise(
                F.col(dcol), F.col("key"), "merge-on-read delta append", v[2]
            ),
        )
    delta = delta.withColumn("batch_id", F.lit(batch_id).cast("long"))
    delta.select([f.name for f in _delta_schema_for(values).fields]).write.mode(
        "overwrite"
    ).parquet(f"{state_dir}/deltas/{vname}")

    prev_deltas = list(prev.get("deltas", [])) if prev else []
    manifest = {
        "batch_id": batch_id,
        "range_width": width,
        "buckets": dict(prev["buckets"]) if prev else {},
        "stats": dict(prev.get("stats", {})) if prev else {},
        "deltas": sorted(set(prev_deltas) | {vname}),
    }
    _record_schema(manifest, values, schema_version, retired)
    _record_max_seq(manifest, prev, seq_bounds)
    _record_txns(manifest, prev, producer_txn)
    if writer_id is not None and "seq" in batch_df.columns:
        manifest["writer_id"] = writer_id
    elif prev and "writer_id" in prev:
        manifest["writer_id"] = prev["writer_id"]  # keep the fence intact
    try:
        _write_manifest(spark, state_dir, manifest, expected=listing_snapshot)
    except ArbiterUnavailableError as err:
        # observability (r13): an AMBIGUOUS publish (response lost; the
        # commit may or may not have landed) that the attempt-exact
        # reconciliation RESOLVED — either way: verified-committed
        # (return) or verified-not-committed (the retry-safe
        # ConcurrentCommitError). The arbiter-failover probe asserts on
        # this counter. Unresolved ambiguities raise
        # ArbiterUnavailableError and are NOT counted.
        try:
            _reconcile_with_outage_retry(
                spark, state_dir, batch_id, vname, err, outage_retry_s
            )
        except ConcurrentCommitError:
            if stats is not None:
                stats["ambiguities_resolved"] = (
                    stats.get("ambiguities_resolved", 0) + 1
                )
            raise
        if stats is not None:
            stats["ambiguities_resolved"] = (
                stats.get("ambiguities_resolved", 0) + 1
            )
    return True


def _reconcile_with_outage_retry(
    spark: SparkSession,
    state_dir: str,
    batch_id: int,
    vname: str,
    err: ArbiterUnavailableError,
    outage_retry_s: float,
) -> None:
    """Resolve an ambiguous publish, retrying the RECONCILIATION (never
    the append) while the arbiter is down — the writer behavior a real
    service blip or restart needs. Blindly re-appending after an
    unresolved ambiguity double-appends whenever the lost attempt had in
    fact committed (e.g. finalize ran, the mark_complete ack was lost);
    re-running _reconcile_ambiguous_append for the EXACT attempt vname
    is idempotent and converges to committed / retry-safe-conflict once
    the service answers.

    Terminal-unknowable verdicts (same-id compaction, vanished same-id
    manifest, below the retention keep window) re-raise the ORIGINAL
    error object; retrying those would re-derive the same verdict, so
    they propagate immediately — distinguished by object identity from
    a FRESH ArbiterUnavailableError raised by the store while the
    reconciliation itself was reading (arbiter still down), which is
    the retryable case."""
    import time as _time

    deadline = _time.monotonic() + outage_retry_s
    while True:
        try:
            _reconcile_ambiguous_append(spark, state_dir, batch_id, vname, err)
            return
        except ArbiterUnavailableError as still:
            if still is err:
                # terminal verdict: mark it so no outer retry loop ever
                # mistakes it for a transient read failure and re-appends
                # a batch that may already be folded into the base
                still.terminal_ambiguity = True
                raise
            if _time.monotonic() >= deadline:
                raise
            _LOG.warning(
                "arbiter unavailable during ambiguity reconciliation of "
                "batch %s in %s — retrying (%s)",
                batch_id,
                state_dir,
                still,
            )
            _time.sleep(min(1.0, max(0.1, outage_retry_s / 30)))


def _reconcile_ambiguous_append(
    spark: SparkSession,
    state_dir: str,
    batch_id: int,
    vname: str,
    err: ArbiterUnavailableError,
) -> None:
    """Resolve an AMBIGUOUS commit outcome on the arbiter path: the
    transport failed mid-call, so the CAS may or may not have been
    applied server-side (a real conditional-put service can apply the
    write and lose the response — modeled by FaultInjectingArbiter's
    fail_after). Deleting state or blindly retrying would both be wrong;
    instead, re-list (which runs the reader self-heal, finishing any
    CAS-won-but-unfinalized commit — possibly OURS) and inspect the
    manifest that actually holds this batch id:

    - it exists and references OUR attempt-unique delta dir -> the commit
      WON; return success (exactly-once, no duplicate append);
    - it exists referencing someone else's attempt -> we definitively
      lost to a foreign writer; ConcurrentCommitError (safe to retry
      with a fresh basis — nothing of ours was recorded);
    - no manifest for this batch id after self-heal -> the request never
      reached the arbiter; ConcurrentCommitError (equally safe to
      retry — the optimistic loop re-lists and re-attempts).

    If the reconciliation read ITSELF fails (arbiter still down), the
    original error propagates — fail-stop, resolve on the next replay.
    That includes PER-MANIFEST reads inside the scan: only a store
    NOT-FOUND (concurrent vacuum) may be skipped; any other read failure
    leaves that manifest's delta list unknown — it might name our
    attempt — so treating it as vacuumed could double-append (ADVICE
    r10). Two more unknowable negatives fail-stop for the same reason:
    a SAME-ID manifest that vanished between listing and read, and a
    batch id that has fallen below the retention keep window (plain
    manifests are deleted wholesale there, with no same-id 'x' commit
    left to prove anything).

    The positive proof scans EVERY current manifest's delta list, newest
    first, not just the newest same-id commit: a concurrent COMPACTION
    can supersede our won manifest with an empty-delta 'x' commit, and a
    LATER batch's manifest inherits our delta name — either would make a
    newest-same-id-only check misread a won commit as foreign and let
    the optimistic loop append the batch TWICE (caught by review in
    r10). Conversely, when same-id commits exist, none list our attempt,
    and one is a compaction, the outcome stays unknowable (our delta may
    be folded and its plain manifest vacuumed) — re-raise the original
    error rather than guess."""
    versions = _list_manifests(spark, state_dir)  # triggers self-heal
    vanished: set[str] = set()
    for v in reversed(versions):
        try:
            m = _read_manifest(spark, state_dir, v)
        except Exception as read_err:
            if is_commit_not_found(read_err):
                # vacuumed between the listing and this read (concurrent
                # retention): genuinely absent. Recorded, not ignored —
                # a vanished SAME-ID manifest may have listed our attempt,
                # so the negative branches below must treat it as
                # unknowable, not as foreign
                vanished.add(v)
                continue
            # ANY OTHER read failure (FS hiccup, arbiter still flaking —
            # exactly the regime this function runs in) leaves this
            # manifest's delta list UNKNOWN; it may reference our own
            # attempt, so falling through to "nothing landed — retry"
            # could publish the batch a second time (ADVICE r10).
            # Fail-stop as a FRESH unavailability (never `raise err`
            # itself — object identity marks TERMINAL verdicts for
            # _reconcile_with_outage_retry, and a transient read flake is
            # the retryable case, not a terminal one): re-running the
            # reconciliation is idempotent and resolves once reads work.
            raise ArbiterUnavailableError(
                f"manifest {v} unreadable during ambiguity reconciliation "
                f"of batch {batch_id} in {state_dir} ({read_err}); original "
                f"ambiguity: {err}"
            ) from read_err
        if vname in m.get("deltas", []):
            _LOG.warning(
                "ambiguous arbiter outcome for batch %s in %s reconciled "
                "as COMMITTED (own attempt %s found in manifest %s): %s",
                batch_id,
                state_dir,
                vname,
                v,
                err,
            )
            return
    same_id = [v for v in versions if _batch_id_of(v) == batch_id]
    if same_id:
        if any("x" in v for v in same_id) or any(v in vanished for v in same_id):
            # a compaction already superseded this batch id (our delta may
            # have been folded and its plain manifest vacuumed), or a
            # same-id manifest vanished before we could read its delta
            # list (it may have been OURS, mid-vacuum) — neither COMMITTED
            # nor LOST is provable; fail stop
            raise err
        raise ConcurrentCommitError(
            f"batch id {batch_id} in {state_dir} was committed by a "
            f"foreign attempt while our publish failed ambiguously "
            f"({err}); retry with a fresh basis"
        ) from err
    if versions and batch_id < _batch_id_of(versions[0]):
        # the batch id has fallen OUT of the retention keep window:
        # expire_partitioned_versions deletes plain manifests wholesale
        # once their batch id leaves the newest-`keep` set — no same-id
        # 'x' commit remains to route into the compaction branch above,
        # so an empty same_id no longer proves "nothing landed"; our
        # commit may have WON, been folded, and been vacuumed. Fail stop
        # rather than retry into a double-append (ADVICE r10).
        raise err
    raise ConcurrentCommitError(
        f"publish of batch {batch_id} in {state_dir} failed before the "
        f"arbiter recorded it ({err}); nothing landed — retry with a "
        "fresh basis"
    ) from err


def append_delta_batch_optimistic(
    spark: SparkSession,
    state_dir: str,
    batch_df: DataFrame,
    range_width: int | None = None,
    max_attempts: int = 20,
    stats: dict | None = None,
    outage_retry_s: float = 0.0,
    producer_txn: tuple[str, int] | None = None,
) -> int | None:
    """MULTI-WRITER merge-on-read append: allocate the next batch id from
    the current manifest head and retry on ConcurrentCommitError — the
    Delta-style optimistic concurrency loop (commit version = latest+1,
    re-read the basis and try again on a lost race). Returns the batch id
    that actually committed.

    Only valid for ORDER-COMMUTATIVE batches, and the contract is checked
    loudly up front:
    - a `seq` column is rejected (the sequenced-CDC contract requires the
      PRODUCER's total order; optimistic re-allocation would let a slower
      writer commit earlier log offsets under a later batch id and trip —
      or worse, silently violate — the max_seq high-water guard);
    - `op='delete'` tombstones are rejected (a delete discards prior
      state, so the fold depends on where the race lands this batch in
      commit order; pure upserts ADD to a key's running total and
      commute across batches).

    Delivery contract: AT-LEAST-ONCE by default — there is no
    checkpoint here, so a caller that crashes after the commit and
    re-submits the same batch appends it twice. Pass
    `producer_txn=(app_id, version)` for EXACTLY-ONCE (r12 — Delta's
    txnAppId/txnVersion idempotent-writes contract): the manifest chain
    carries a per-app high-water version map, a submission whose
    version is <= the recorded mark is SKIPPED (returns None, nothing
    written), and the check re-runs against the refreshed basis after
    every lost race — so a crashed-and-resubmitted batch, or one whose
    first attempt resolved ambiguously, applies at most once even
    across writer processes. Versions must increase monotonically per
    app_id; the map rides every manifest (maintenance commits inherit
    it like the writer lease). A lost race leaves that attempt's delta dir as
    debris — the same retention-reclaimed orphan class as a crashed
    writer's; the committed manifest never references it. The refreshed basis on each retry is
    what carries forward OTHER writers' delta lists, so concurrent
    appends accumulate instead of clobbering (exercised cross-process by
    examples/concurrent_writers_probe.py and in-process by
    tests/test_partitioned_upsert.py)."""
    if isinstance(_LOG_STORE, HadoopRenameLogStore):
        # The rename store's check-then-publish is NOT atomic: two
        # optimistic writers can both pass expect_new and the expected-
        # listing check in the gap and publish the same v{id} manifest via
        # overwrite-rename — the silent lost-update this API exists to
        # prevent. Refuse up front instead of racing; the single-writer
        # streamed path (append_delta_batch with checkpointed ids) stays
        # valid on the rename store.
        raise ValueError(
            "append_delta_batch_optimistic requires an atomic commit "
            "store; the default HadoopRenameLogStore's check-then-rename "
            "can publish two same-id manifests under a race. Set "
            "SPARK_GRAFT_LOG_STORE=filelock|inprocess|arbiter (or "
            "set_log_store(...)) for multi-writer tables"
        )
    if "seq" in batch_df.columns:
        raise ValueError(
            "append_delta_batch_optimistic: sequenced-CDC batches (seq "
            "column) need producer-ordered batch ids — use "
            "append_delta_batch with explicit ids"
        )
    # one filter+take(1) job per CALL (not per retry attempt) buys the
    # loud contract at the entry point; upsert-only batches pay a single
    # column-pruned scan before the aggregation scans the batch anyway
    if "op" in batch_df.columns and not batch_df.filter(
        F.col("op") == F.lit("delete")
    ).isEmpty():
        raise ValueError(
            "append_delta_batch_optimistic: delete tombstones are not "
            "order-commutative across a lost race — commit them through "
            "a single sequenced writer"
        )
    import time as _time

    last_err: ConcurrentCommitError | None = None
    deadline = _time.monotonic() + outage_retry_s
    conflicts = 0
    # conflicts consume max_attempts; outage retries consume ONLY the
    # time budget — counting them against max_attempts would cap outage
    # riding at ~max_attempts seconds regardless of outage_retry_s and
    # then blame "commit races" that never happened
    while conflicts < max_attempts:
        try:
            versions = _list_manifests(spark, state_dir)
            if producer_txn is not None and versions:
                newest = _read_manifest(spark, state_dir, versions[-1])
                if _txn_already_applied(newest, producer_txn):
                    _LOG.info(
                        "optimistic append of producer txn %s skipped: "
                        "already applied in %s",
                        producer_txn,
                        state_dir,
                    )
                    return None
            next_id = max((_batch_id_of(v) for v in versions), default=-1) + 1
            committed = append_delta_batch(
                spark,
                state_dir,
                batch_df,
                next_id,
                range_width,
                expect_new=True,
                outage_retry_s=outage_retry_s,
                producer_txn=producer_txn,
                stats=stats,
            )
            if not committed:
                # the inner append's own (fresher) basis showed the txn
                # already applied — a same-txn racer landed between our
                # listing and its snapshot
                return None
            return next_id
        except ConcurrentCommitError as err:
            last_err = err
            conflicts += 1
            if stats is not None:  # observability for probes/deployments
                stats["conflicts"] = stats.get("conflicts", 0) + 1
            # Randomized exponential backoff on a LOST RACE (r13): with
            # no delay, N writers re-list and re-CAS in lockstep and the
            # writer with the slowest retry cycle can starve — observed
            # live in the concurrent-writers probe as one writer losing
            # all 20 attempts while only 32 commits existed. Full jitter
            # (AWS-style: sleep ~ U[0, min(cap, base·2^k)]) desynchronizes
            # the herd; the cap keeps the worst single wait at 1.6 s.
            # Losing a race is DEFINITE (the arbiter answered), so the
            # sleep risks no double-apply — it only spaces the retries.
            # At cluster scale contention grows with writer count, which
            # makes backoff more load-bearing, not less.
            import random as _random

            _time.sleep(_random.uniform(0.0, min(1.6, 0.05 * (2 ** min(conflicts, 5)))))
            continue
        except ArbiterUnavailableError as exc:
            # Retrying here is SAFE only because the inner append already
            # exhausted its own reconciliation-retry budget for any
            # attempt that actually reached the arbiter (see
            # _reconcile_with_outage_retry) — the inner deadline starts
            # AFTER ours, so by the time an unresolved ambiguity
            # propagates to this handler our budget is spent too and we
            # re-raise rather than risk re-appending a maybe-committed
            # batch. Terminal-unknowable verdicts carry an explicit
            # marker and are never retried. What this handler actually
            # retries is the READ-ONLY failures: the basis listing, or a
            # commit the store raised on before anything was recorded.
            if (
                getattr(exc, "terminal_ambiguity", False)
                or outage_retry_s <= 0
                or _time.monotonic() >= deadline
            ):
                raise
            if stats is not None:
                stats["outage_retries"] = stats.get("outage_retries", 0) + 1
            _time.sleep(min(1.0, max(0.1, outage_retry_s / 30)))
            continue
    raise ConcurrentCommitError(
        f"lost {max_attempts} consecutive commit races in {state_dir}"
    ) from last_err


def compact_deltas_into_base(spark: SparkSession, state_dir: str) -> int:
    """Fold every pending delta into the base buckets it touches and
    commit the result under the latest batch's next 'x{seq}' name — the
    same logical state with an empty delta list, so the manifest-pruned
    readers work again. Cost is O(delta rows + touched buckets) — the
    amortization that makes merge-on-read pay: N scattered batches cost
    N appends plus ONE fold instead of N full-spread rewrites. Delta
    files stay on disk for older-manifest time travel until retention
    vacuums them. Returns the number of buckets rewritten."""
    versions = _list_manifests(spark, state_dir)
    if not versions:
        return 0
    manifest = _read_manifest(spark, state_dir, versions[-1])
    deltas = manifest.get("deltas", [])
    if not deltas:
        return 0
    width = manifest["range_width"]
    batch_id = manifest["batch_id"]
    seq = _next_compaction_seq(versions, batch_id)
    vname = _attempt_name(f"v{batch_id:09d}x{seq:04d}")

    values = table_values(manifest)
    delta_rows = spark.read.schema(_delta_schema_for(values)).parquet(
        *[f"{state_dir}/deltas/{v}" for v in deltas]
    )
    touched = sorted(
        r["bucket"] for r in delta_rows.select("bucket").distinct().collect()
    )
    base_paths = [
        f"{state_dir}/buckets/b{b}/{manifest['buckets'][str(b)]}"
        for b in touched
        if str(b) in manifest["buckets"]
    ]
    base = (
        spark.read.schema(_state_schema_for(values)).parquet(*base_paths)
        if base_paths
        else None
    )
    folded = _fold_base_and_deltas(base, delta_rows, values).withColumn(
        "bucket", bucket_of(F.col("key"), width)
    )
    staging = f"{state_dir}/.staging/{vname}"
    folded.repartition(F.col("bucket")).write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(staging)

    fs, _, jvm = _fs_and_path(spark, state_dir)
    hpath = jvm.org.apache.hadoop.fs.Path
    new_buckets = dict(manifest["buckets"])
    new_stats = dict(manifest.get("stats", {}))
    written = []
    for b in touched:
        src = hpath(f"{staging}/bucket={b}")
        dst = hpath(f"{state_dir}/buckets/b{b}/{vname}")
        fs.mkdirs(hpath(f"{state_dir}/buckets/b{b}"))
        if fs.exists(src):
            if not fs.rename(src, dst):
                raise IOError(f"delta compaction move failed for bucket {b}")
            new_buckets[str(b)] = vname
            written.append(b)
        else:  # tombstones emptied the bucket's fold entirely
            new_buckets.pop(str(b), None)
            new_stats.pop(str(b), None)
    fs.delete(hpath(staging), True)

    if written:
        fresh = _bucket_stats(
            spark,
            [f"{state_dir}/buckets/b{b}/{vname}" for b in written],
            width,
            values,
        )
        new_stats.update({str(b): fresh[b] for b in written})
    _write_manifest(
        spark,
        state_dir,
        {
            "batch_id": batch_id,
            "compaction_seq": seq,
            "range_width": width,
            "buckets": new_buckets,
            "stats": new_stats,
            "deltas": [],
            **_inherit_max_seq(manifest),
        },
        expected=tuple(versions),
    )
    return len(touched)


def _require_no_pending_deltas(manifest: dict, op: str) -> None:
    if manifest.get("deltas"):
        raise ValueError(
            f"{op} requires a delta-free commit (pending merge-on-read deltas "
            f"{manifest['deltas']}); run compact_deltas_into_base first"
        )


def maintain_partitioned_state(
    spark: SparkSession,
    state_dir: str,
    max_pending_deltas: int = 8,
    max_files_per_bucket: int = 4,
    keep_versions: int = 3,
    debris_min_age_ms: int = DEBRIS_MIN_AGE_MS,
) -> dict:
    """The table's housekeeping loop, composed in the only safe order —
    what a production deployment schedules between (or inside quiet
    windows of) the write stream, the way OPTIMIZE + VACUUM run against
    a Delta table:

      1. fold pending MoR deltas into the base once they exceed
         `max_pending_deltas` (bounds read-fold latency: each pending
         delta adds rows to every reader's sequenced fold);
      2. compact buckets fragmented past `max_files_per_bucket`
         (bounds file-count metadata + open costs; runs only on a
         delta-free latest commit, which step 1 just guaranteed when it
         ran);
      3. expire unreferenced versions beyond `keep_versions` LAST —
         retention after the maintenance commits, so the newly
         superseded plain commits and folded delta files become
         vacuumable in the same pass.

    Every step is individually optimistic-concurrency-checked and
    crash-replayable (same-batch 'x' commits), so a maintenance crash
    leaves the table readable at the prior commit. Thresholds are
    per-table policy knobs, not derived: they trade write amplification
    against read latency and the right point depends on the workload's
    read/write ratio — the caller owns that trade. Returns the work
    done: {"deltas_folded": buckets, "buckets_compacted": n,
    "versions_expired": n}."""
    if max_pending_deltas < 1:
        raise ValueError(f"max_pending_deltas must be >= 1, got {max_pending_deltas}")
    out = {"deltas_folded": 0, "buckets_compacted": 0, "versions_expired": 0}
    versions = _list_manifests(spark, state_dir)
    if not versions:
        return out
    latest = _read_manifest(spark, state_dir, versions[-1])
    if len(latest.get("deltas", [])) >= max_pending_deltas:
        out["deltas_folded"] = compact_deltas_into_base(spark, state_dir)
    if not _latest_manifest(spark, state_dir).get("deltas"):
        out["buckets_compacted"] = compact_partitioned_state(
            spark, state_dir, max_files=max_files_per_bucket
        )
    out["versions_expired"] = expire_partitioned_versions(
        spark, state_dir, keep=keep_versions, debris_min_age_ms=debris_min_age_ms
    )
    return out
