"""Training-corpus preparation operators (north-star LLM-pipeline set):
PII scrubbing, deterministic sampling, shard assignment, and near-dup
clustering (connected components over the LSH candidate graph).

Portability: all hashes are md5-derived (identical hex in Spark and DuckDB);
sampling/sharding use the hash-int trick validated in dedup.simhash. The
connected-components operator is iterative (min-label propagation driven to
a fixpoint); its oracle is a DuckDB recursive CTE computing min reachable
node — one of the few genuinely non-single-query ops, still oracle-checked.

At 100 TB: scrub/sample/shard are narrow zero-shuffle projections (sharding
is exactly how a corpus gets split for distributed training jobs); label
propagation does one self-join shuffle per iteration and converges in
O(graph diameter) rounds — for billion-edge dedup graphs switch to the
large-star/small-star variant (same join primitive, fewer rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .dedup import minhash_lsh_candidates

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONGNUM_RE = r"\d{6,}"

SAMPLE_MOD = 10       # keep 1/10 of docs
N_SHARDS = 64
COMPONENT_MIN_J = 0.5


def _hash_int(col) -> F.Column:
    """First 32 bits of md5 of the column's string form, as BIGINT —
    engine-portable uniform hash (same trick as dedup.simhash)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


_HASH_INT_SQL = "('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8))::UBIGINT::BIGINT"


# ---------------------------------------------------------------------------
# PII scrub: redact emails and long digit runs.
# ---------------------------------------------------------------------------

def pii_scrub(documents: DataFrame) -> DataFrame:
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"),
        LONGNUM_RE,
        "<NUM>",
    )
    return documents.select(
        "doc_id",
        scrubbed.alias("clean_text"),
        (scrubbed != F.col("text")).alias("was_scrubbed"),
    )


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pii_scrub(load_table(spark, sf_dir, "documents"))


SQL_PII_SCRUB = f"""
SELECT doc_id,
       regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                      '{LONGNUM_RE}', '<NUM>', 'g') AS clean_text,
       regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                      '{LONGNUM_RE}', '<NUM>', 'g') <> text AS was_scrubbed
FROM documents
"""


# ---------------------------------------------------------------------------
# Deterministic sampling: md5-hash threshold on the key — reproducible on
# any engine/cluster, unlike TABLESAMPLE.
# ---------------------------------------------------------------------------

def deterministic_sample(documents: DataFrame, mod: int = SAMPLE_MOD) -> DataFrame:
    return documents.filter(_hash_int(F.col("doc_id")) % mod == 0).select("doc_id", "text")


def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return deterministic_sample(load_table(spark, sf_dir, "documents"))


SQL_DETERMINISTIC_SAMPLE = f"""
SELECT doc_id, text
FROM documents
WHERE {_HASH_INT_SQL.format(col='doc_id')} % {SAMPLE_MOD} = 0
"""


# ---------------------------------------------------------------------------
# Shard assignment + balance histogram: how a corpus splits across training
# workers. Zero-shuffle assignment; the histogram is one tiny agg.
# ---------------------------------------------------------------------------

def shard_histogram(documents: DataFrame, n_shards: int = N_SHARDS) -> DataFrame:
    shard = (_hash_int(F.col("doc_id")) % n_shards).cast("int")
    return (
        documents.select(shard.alias("shard"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def q_shard_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shard_histogram(load_table(spark, sf_dir, "documents"))


SQL_SHARD_HISTOGRAM = f"""
SELECT CAST({_HASH_INT_SQL.format(col='doc_id')} % {N_SHARDS} AS INT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Near-dup clustering: connected components of the LSH candidate graph
# (est_jaccard >= 0.5), component id = min doc_id in the component.
# Iterative min-label propagation with a driver-side convergence check —
# the Pregel shape. Oracle: DuckDB recursive CTE (min reachable node).
# ---------------------------------------------------------------------------

EDGE_ROWS_PER_PARTITION = 500_000  # ~tens of MB of (long, long) rows


def _graph_partitions(n_edge_rows: int, rows_per_partition: int) -> int:
    """Partition count sized to the GRAPH, not the corpus: the candidate
    graph is orders of magnitude smaller than the documents table, so its
    iterative joins should run at their own parallelism (1 for test-scale
    graphs, growing linearly with edge count, capped well below any
    realistic cluster's task ceiling)."""
    return max(1, min(4096, -(-n_edge_rows // rows_per_partition)))


def _sized(df: DataFrame, n_parts: int, key: str) -> DataFrame:
    """Resize to the graph-derived partition count: narrow coalesce when
    shrinking (no shuffle — the common case on small graphs), hash
    repartition on the join key when the graph needs more parallelism."""
    cur = df.rdd.getNumPartitions()
    if n_parts < cur:
        return df.coalesce(n_parts)
    if n_parts > cur:
        return df.repartition(n_parts, key)
    return df


def neardup_components(
    documents: DataFrame,
    max_iters: int = 50,
    rows_per_partition: int = EDGE_ROWS_PER_PARTITION,
) -> DataFrame:
    pairs = minhash_lsh_candidates(documents).filter(
        F.col("est_jaccard") >= COMPONENT_MIN_J
    )
    # Undirected edge list, both directions. localCheckpoint truncates the
    # growing iterative lineage (without it, plan analysis dominates after a
    # few rounds) and materializes the graph so the one count() that sizes
    # the partitioning is nearly free (narrow re-sizes then stack on the
    # checkpointed blocks without a second materialization).
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    n_parts = _graph_partitions(edges.count(), rows_per_partition)
    edges = _sized(edges, n_parts, "dst")
    labels = _sized(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node")),
        n_parts,
        "node",
    ).localCheckpoint()
    for _ in range(max_iters):
        # hook: take the min label over neighbors
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        hooked = labels.join(neighbor_min, labels.node == neighbor_min.src, "left").select(
            "node",
            F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias("label"),
        )
        # shortcut (pointer jumping): label(v) := label(label(v)) — drops
        # convergence from O(diameter) to O(log diameter) rounds
        lz = hooked.select(F.col("node").alias("z_node"), F.col("label").alias("z_label"))
        new_labels = (
            hooked.join(lz, hooked.label == lz.z_node, "left")
            .select(
                "node",
                F.coalesce(F.col("z_label"), F.col("label")).alias("label"),
            )
        )
        new_labels = _sized(new_labels, n_parts, "node").localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("component"))


def q_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    return neardup_components(load_table(spark, sf_dir, "documents"))


def _components_sql() -> str:
    from .dedup import SQL_MINHASH_LSH_CANDIDATES

    return f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({SQL_MINHASH_LSH_CANDIDATES}) c
  WHERE est_jaccard >= {COMPONENT_MIN_J}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(src, dst) AS (
  SELECT src, src AS dst FROM edges
  UNION
  SELECT r.src, e.dst
  FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id, min(dst) AS component
FROM reach
GROUP BY src
"""


SQL_NEARDUP_COMPONENTS = _components_sql()


QUERIES = {
    "pii_scrub": q_pii_scrub,
    "deterministic_sample": q_deterministic_sample,
    "shard_histogram": q_shard_histogram,
    "neardup_components": q_neardup_components,
}

ORACLES = {
    "pii_scrub": SQL_PII_SCRUB,
    "deterministic_sample": SQL_DETERMINISTIC_SAMPLE,
    "shard_histogram": SQL_SHARD_HISTOGRAM,
    "neardup_components": SQL_NEARDUP_COMPONENTS,
}
