"""Similarity search over `embeddings.embedding` (array<float>, 64-dim).

Baseline: brute-force cosine top-k via position-join + exact DECIMAL dot
products (order-independent → identical on any cluster layout AND in the
DuckDB oracle). Scale path: sign-LSH (random-hyperplane) bucketing — probe
only the query's bucket instead of the full corpus; buckets are md5-seeded
hyperplanes so both engines derive identical projections.

At 100 TB the brute-force variant distributes as: broadcast the (tiny) query
set, scan the corpus once, per-partition top-k then global top-k (Spark's
window-filter compiles to partial TakeOrdered); the LSH variant turns the
scan into an equi-join on bucket signature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.numeric import round_half_up

N_QUERIES = 5     # vec_id < 5 are the query vectors
TOP_K = 10
DEC = "decimal(38,18)"  # exact accumulator for dot products / norms

LSH_PLANES = 8    # sign-LSH signature bits


def _flat(embeddings: DataFrame, id_alias: str, val_alias: str) -> DataFrame:
    """(id, pos, val double): posexplode of the embedding array."""
    return embeddings.select(
        F.col("vec_id").alias(id_alias),
        F.posexplode(F.col("embedding")),
    ).select(
        id_alias,
        F.col("pos"),
        F.col("col").cast("double").alias(val_alias),
    )


def _norms(embeddings: DataFrame, id_alias: str, norm_alias: str) -> DataFrame:
    flat = _flat(embeddings, id_alias, "v")
    return flat.groupBy(id_alias).agg(
        F.sqrt(F.sum((F.col("v") * F.col("v")).cast(DEC)).cast("double")).alias(norm_alias)
    )


def cosine_topk(embeddings: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K) -> DataFrame:
    queries = embeddings.filter(F.col("vec_id") < n_queries)
    qf = _flat(queries, "q_id", "qv")
    df_ = _flat(embeddings, "d_id", "dv")
    dots = (
        qf.join(df_, "pos")
        .filter(F.col("q_id") != F.col("d_id"))
        .groupBy("q_id", "d_id")
        .agg(F.sum((F.col("qv") * F.col("dv")).cast(DEC)).cast("double").alias("dot"))
    )
    qn = _norms(queries, "qn_id", "q_norm")
    dn = _norms(embeddings, "dn_id", "d_norm")
    scored = (
        dots.join(F.broadcast(qn), dots.q_id == qn.qn_id)
        .join(dn, dots.d_id == dn.dn_id)
        .select(
            "q_id",
            "d_id",
            round_half_up(F.col("dot") / (F.col("q_norm") * F.col("d_norm")), 9).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("d_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "d_id", "cosine", F.col("rnk").cast("int").alias("rnk"))
    )


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk(load_table(spark, sf_dir, "embeddings"))


SQL_COSINE_TOPK = f"""
WITH flat AS (
  SELECT vec_id, unnest(range(0, len(embedding))) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
norms AS (
  SELECT vec_id, sqrt(CAST(sum(CAST(v * v AS DECIMAL(38,18))) AS DOUBLE)) AS nrm
  FROM flat GROUP BY vec_id
),
dots AS (
  SELECT q.vec_id AS q_id, d.vec_id AS d_id,
         CAST(sum(CAST(q.v * d.v AS DECIMAL(38,18))) AS DOUBLE) AS dot
  FROM flat q JOIN flat d ON q.pos = d.pos
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> d.vec_id
  GROUP BY 1, 2
),
scored AS (
  SELECT dots.q_id, dots.d_id, floor((dot / (qn.nrm * dn.nrm)) * 1000000000.0 + 0.5) / 1000000000.0 AS cosine
  FROM dots
  JOIN norms qn ON dots.q_id = qn.vec_id
  JOIN norms dn ON dots.d_id = dn.vec_id
)
SELECT q_id, d_id, cosine, CAST(rnk AS INT) AS rnk
FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, d_id ASC) AS rnk
  FROM scored
) t
WHERE rnk <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# Sign-LSH bucketing: hyperplane h_p = deterministic ±1 pattern derived from
# md5(p, pos) parity; signature bit p = sign(Σ_pos w * v). Candidates share
# the full signature (equi-join on bucket) — the ANN scale path.
# ---------------------------------------------------------------------------

def lsh_buckets(embeddings: DataFrame) -> DataFrame:
    flat = _flat(embeddings, "vec_id", "v")
    # weight w(p,pos) ∈ {-1,+1} from md5 parity — engine-portable randomness
    projections = [
        F.sum(
            ((F.ascii(F.substring(F.md5(F.concat(F.lit(f"{p}_"), F.col("pos").cast("string"))), 1, 1)) % 2)
             * 2 - 1).cast("double")
            * F.col("v")
        )
        for p in range(LSH_PLANES)
    ]
    sig = sum(
        F.when(projections[p] > 0, F.lit(2 ** p)).otherwise(F.lit(0))
        for p in range(LSH_PLANES)
    )
    return flat.groupBy("vec_id").agg(sig.cast("int").alias("bucket"))


def q_lsh_bucket_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = lsh_buckets(load_table(spark, sf_dir, "embeddings"))
    return b.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))


def _lsh_sql() -> str:
    projections = ",\n         ".join(
        f"sum(CAST(((ascii(substr(md5('{p}_' || CAST(pos AS VARCHAR)), 1, 1)) % 2) * 2 - 1) AS DOUBLE) * v) AS proj{p}"
        for p in range(LSH_PLANES)
    )
    sig = " + ".join(
        f"CASE WHEN proj{p} > 0 THEN {2 ** p} ELSE 0 END" for p in range(LSH_PLANES)
    )
    return f"""
WITH flat AS (
  SELECT vec_id, unnest(range(0, len(embedding))) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
proj AS (
  SELECT vec_id,
         {projections}
  FROM flat GROUP BY vec_id
),
buckets AS (
  SELECT vec_id, CAST({sig} AS INT) AS bucket FROM proj
)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_vectors
FROM buckets GROUP BY bucket
"""


SQL_LSH_BUCKET_SIZES = _lsh_sql()


# ---------------------------------------------------------------------------
# Embedding near-dup pairs: cosine ≥ threshold among LSH co-bucketed pairs
# (bounded subset for the exact check).
# ---------------------------------------------------------------------------

NEARDUP_SUBSET = 500
NEARDUP_MIN_COS = 0.9


def embedding_near_dups(embeddings: DataFrame) -> DataFrame:
    sub = embeddings.filter(F.col("vec_id") < NEARDUP_SUBSET)
    flat = _flat(sub, "vec_id", "v")
    a = flat.alias("a")
    b = flat.alias("b")
    dots = (
        a.join(b, (F.col("a.pos") == F.col("b.pos")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .groupBy(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .agg(F.sum((F.col("a.v") * F.col("b.v")).cast(DEC)).cast("double").alias("dot"))
    )
    n = _norms(sub, "n_id", "nrm")
    na, nb = n.alias("na"), n.alias("nb")
    cos = round_half_up(
        F.col("dot") / (F.col("na.nrm") * F.col("nb.nrm")), 9
    ).alias("cosine")
    return (
        dots.join(na, dots.vec_a == F.col("na.n_id"))
        .join(nb, dots.vec_b == F.col("nb.n_id"))
        .select("vec_a", "vec_b", cos)
        .filter(F.col("cosine") >= NEARDUP_MIN_COS)
    )


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_near_dups(load_table(spark, sf_dir, "embeddings"))


SQL_EMBEDDING_NEAR_DUPS = f"""
WITH flat AS (
  SELECT vec_id, unnest(range(0, len(embedding))) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
  WHERE vec_id < {NEARDUP_SUBSET}
),
norms AS (
  SELECT vec_id, sqrt(CAST(sum(CAST(v * v AS DECIMAL(38,18))) AS DOUBLE)) AS nrm
  FROM flat GROUP BY vec_id
),
dots AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         CAST(sum(CAST(a.v * b.v AS DECIMAL(38,18))) AS DOUBLE) AS dot
  FROM flat a JOIN flat b ON a.pos = b.pos AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT d.vec_a, d.vec_b, floor((dot / (na.nrm * nb.nrm)) * 1000000000.0 + 0.5) / 1000000000.0 AS cosine
FROM dots d
JOIN norms na ON d.vec_a = na.vec_id
JOIN norms nb ON d.vec_b = nb.vec_id
WHERE floor((dot / (na.nrm * nb.nrm)) * 1000000000.0 + 0.5) / 1000000000.0 >= {NEARDUP_MIN_COS}
"""


QUERIES = {
    "cosine_topk": q_cosine_topk,
    "lsh_bucket_sizes": q_lsh_bucket_sizes,
    "embedding_near_dups": q_embedding_near_dups,
}

ORACLES = {
    "cosine_topk": SQL_COSINE_TOPK,
    "lsh_bucket_sizes": SQL_LSH_BUCKET_SIZES,
    "embedding_near_dups": SQL_EMBEDDING_NEAR_DUPS,
}
