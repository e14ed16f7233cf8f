"""Deterministic corpus up-scaler: derive an sf-N dataset from a smaller
driver-generated sf directory by stride-replicating every table with
FK-consistent key remapping and content perturbation.

Purpose (r4 verdict ask #2): every 100 TB claim in this repo was
plan-shape-based; the scaling ladder needs a decade of measured data
(sf0.1 -> sf1.0) and the driver only ships sf <= 0.1. This module builds
the next rung locally — WITHOUT touching the read-only testdata — so
bench.py and the oracle harness run unmodified against the result (the
DuckDB oracles read the same parquet, so correctness stays verifiable at
the new scale, not just timed).

Construction, per replica r in 0..factor-1:
- every table key k becomes k + r * N_table (keys are dense 0..N-1 in the
  driver data; the stride keeps replicas disjoint and FK-exact: orders'
  o_custkey gets the same stride as customer's c_custkey, etc.);
- region/nation stay fixed (dimension vocabulary, like TPC-H's 25
  nations at every sf) — nationkey FKs are NOT remapped;
- entity names (c_name/s_name/p_name) get a replica suffix so name-keyed
  group-bys scale their group count like real data;
- document text mutates 50% of tokens per replica (hash-gated suffix) —
  replicas are NOT near-duplicates of their originals (3-word-shingle
  overlap collapses: P(shingle intact) = 0.5^3, Jaccard(orig, replica)
  ~ 0.07 and ~0.016 between sibling replicas — below every dedup
  threshold AND below LSH band-collision range). The first cut used 20%
  and was MEASURED pathological: minhash_lsh_candidates scaled 80x for
  10x data because every replica family formed a candidate clique;
- embeddings get per-(vec, replica, dim) deterministic jitter U(-0.25,
  0.25) per dim — ~1.15x the typical vector norm contribution, putting
  original-replica cosine at ~0.65-0.8, outside near-dup range while the
  coarse label geometry survives (the first cut, +/-0.05, left replicas
  at cosine ~0.97: 86k planted near-dup pairs at sf1 — measured, fixed);
- timestamps/prices/enums are untouched: event density per hour and
  per-key value distributions grow exactly x factor, which is what
  "same workload, more data" means.

Everything is a single narrow projection per table — no joins, no
shuffles; generation of sf1 takes ~20 s on local[32].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# base-table row counts at the SOURCE sf define the key strides; derived
# at runtime from the actual files so any source sf works
_KEYED = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def _strides(spark: SparkSession, src: str) -> dict[str, int]:
    out = {}
    for t in _KEYED:
        out[t] = spark.read.parquet(f"{src}/{t}.parquet").count()
    # user_id is its own keyspace inside events (not event_id's)
    out["user"] = (
        spark.read.parquet(f"{src}/events.parquet")
        .agg(F.max("user_id")).first()[0] + 1
    )
    return out


def _shift(col: str, r: int, stride: int):
    return (F.col(col) + F.lit(r * stride)).cast("long").alias(col)


def _suffix(col: str, r: int):
    c = F.col(col)
    return (c if r == 0 else F.concat(c, F.lit(f" c{r}"))).alias(col)


def _mutate_text(r: int):
    """~50% of tokens get a replica-specific suffix (hash-gated on token,
    position and replica; pmod(...,2)=0 gate) — deterministic,
    engine-independent output. 50% is deliberate: the first cut's 20%
    left replicas within simhash/minhash near-dup thresholds of their
    source (the measured pathology test_replicas_are_not_near_duplicates
    pins against)."""
    if r == 0:
        return F.col("text")
    toks = F.split(F.col("text"), r"\s+")
    mutated = F.expr(
        f"transform(split(text, '\\\\s+'), (t, i) -> "
        f"IF(pmod(xxhash64(t, i, {r}), 2) = 0, concat(t, '~{r}'), t))"
    )
    return F.when(F.size(toks) > 0, F.array_join(mutated, " ")).otherwise(F.col("text"))


def _jitter_embedding(r: int):
    if r == 0:
        return F.col("embedding")
    return F.expr(
        f"transform(embedding, (x, i) -> CAST(x + "
        f"(CAST(pmod(xxhash64(vec_id, i, {r}), 1000) AS DOUBLE) / 1000.0 - 0.5) * 0.5 "
        f"AS FLOAT))"
    ).alias("embedding")


def _replica(t: str, df: DataFrame, r: int, s: dict[str, int]) -> DataFrame:
    if t == "customer":
        return df.select(
            _shift("c_custkey", r, s["customer"]),
            _suffix("c_name", r), "c_nationkey", "c_acctbal", "c_mktsegment",
        )
    if t == "supplier":
        return df.select(
            _shift("s_suppkey", r, s["supplier"]),
            _suffix("s_name", r), "s_nationkey", "s_acctbal",
        )
    if t == "part":
        return df.select(
            _shift("p_partkey", r, s["part"]),
            _suffix("p_name", r), "p_brand", "p_type", "p_size", "p_retailprice",
        )
    if t == "orders":
        return df.select(
            _shift("o_orderkey", r, s["orders"]),
            _shift("o_custkey", r, s["customer"]),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        )
    if t == "lineitem":
        return df.select(
            _shift("l_orderkey", r, s["orders"]),
            _shift("l_partkey", r, s["part"]),
            _shift("l_suppkey", r, s["supplier"]),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        )
    if t == "events":
        return df.select(
            _shift("event_id", r, s["events"]),
            "ts",
            _shift("user_id", r, s["user"]),
            "event_type", "value", "props",
        )
    if t == "documents":
        mutated = _mutate_text(r)
        return df.select(
            _shift("doc_id", r, s["documents"]),
            mutated.alias("text"), "lang", "source",
            F.length(mutated).cast("long").alias("n_chars"),
        )
    if t == "embeddings":
        return df.select(
            _shift("vec_id", r, s["embeddings"]),
            _jitter_embedding(r), "label",
        )
    raise ValueError(t)


def upscale(spark: SparkSession, src_dir: str, out_dir: str, factor: int = 10) -> None:
    s = _strides(spark, src_dir)
    for t in TABLES:
        df = spark.read.parquet(f"{src_dir}/{t}.parquet")
        if t in ("region", "nation"):
            out = df
        else:
            parts = [_replica(t, df, r, s) for r in range(factor)]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


if __name__ == "__main__":  # pragma: no cover - thin CLI over upscale()
    import sys

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else ".scratch/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("scaleup")
        .getOrCreate()
    )
    upscale(spark, src, dst, factor)
    print(f"wrote {dst} = {factor}x {src}")
    spark.stop()
