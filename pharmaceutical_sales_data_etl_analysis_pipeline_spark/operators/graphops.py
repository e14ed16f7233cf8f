"""Iterative graph analytics (r3): deterministic fixed-point PageRank over
the product co-purchase graph.

Complements `neardup_components` (label propagation): components answer
"which docs are the same", PageRank answers "which nodes are central" —
the standard importance prior for corpus curation (rank pages/products by
link centrality before sampling).

FP discipline: classic PageRank sums double contributions, whose value
depends on reduction order — unusable for a bit-exact oracle and for
run-to-run stability on a cluster. Here scores are BIGINT fixed-point
(SCALE = 10^12): the damping update is

    new(v) = (15 * SCALE) // (100 * N)  +  sum over in-edges (u,v) of
             (85 * score(u)) // (100 * outdeg(u))

— all integer multiply / floor-divide / sum, exact and order-independent,
so Spark and DuckDB produce identical scores bit-for-bit. 85 * SCALE
= 8.5e13 << 2^63, no overflow. Truncation loses mass (scores no longer
sum to exactly SCALE) but ranking semantics are preserved and the whole
computation is reproducible anywhere.

Scale: per-order pair expansion is bounded by order width (TPC-H ≤ 7
lines/order → ≤ 42 directed pairs), so edge generation is linear in
lineitem. Edges are DISTINCT (src,dst) — one shuffle — then
localCheckpoint'd: the three iterations re-read the materialized edge
partitions instead of re-deriving the self-join each pass (and the
checkpoint truncates the lineage that would otherwise double per
iteration). Each iteration is one equi-join edges ⋈ scores on src plus a
groupBy(dst) sum — the standard Pregel-style distributed PageRank; at
100 TB both shuffles key on partkey and AQE handles the skewed
best-seller parts.

Reference parity: the reference pipeline has no graph operator; this is
part of the large-scale training-data-pipeline extension surface
(centrality prior for corpus sampling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.numeric import round_half_up
from .pin import pin

PR_SCALE = 10**12
PR_ITERS = 3
PR_TOPK = 20


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Distinct directed (src, dst) part pairs co-occurring in an order.

    Symmetric by construction (both (a,b) and (b,a) appear), so every
    node has outdeg == indeg >= 1.
    """
    # groupBy + in-row pair expansion beats the orderkey self-join ~2x:
    # ONE shuffle (the groupBy) instead of shuffling both join sides, and
    # the width² expansion is bounded by lines-per-order (<= 7 in spec
    # TPC-H) so it's a cheap map-side flatMap, never a blow-up
    sets = lineitem.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    return (
        sets.select(F.explode("ps").alias("src"), "ps")
        .select("src", F.explode("ps").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def pagerank_fixedpoint(lineitem: DataFrame, iters: int = PR_ITERS, topk: int = PR_TOPK) -> DataFrame:
    """Top-k parts by fixed-point PageRank on the co-purchase graph.

    Returns (p_partkey, outdeg, pr_score) — pr_score is the exact BIGINT
    fixed-point score after `iters` damped iterations.
    """
    # one shuffle to build + dedup edges, then pin them: every iteration
    # re-reads these partitions instead of replaying the self-join
    edges = pin(copurchase_edges(lineitem).repartition("src"), "pagerank_edges")
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    nodes = pin(deg.select(F.col("src").alias("node"), "outdeg"), "pagerank_nodes")
    n = nodes.count()
    if n == 0:
        # edgeless input (no order has two distinct parts): empty result
        # with the stable output schema, not a ZeroDivisionError
        return nodes.sparkSession.createDataFrame(
            [], "p_partkey bigint, outdeg bigint, pr_score bigint"
        )

    base = (15 * PR_SCALE) // (100 * n)
    # scores carries outdeg so each iteration is exactly one join + one agg
    scores = nodes.select("node", "outdeg", F.lit(PR_SCALE // n).cast("long").alias("score"))
    for _ in range(iters):
        contrib = (
            edges.join(scores, edges.src == scores.node)
            .select(
                F.col("dst"),
                F.expr("(85 * score) div (100 * outdeg)").cast("long").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        # no per-iteration checkpoint: the 3-iteration DAG is a linear
        # chain executed by ONE action, so nothing is recomputed (measured:
        # checkpointing each pass only added its materialization cost).
        # Only `edges` is referenced once per iteration — that's what the
        # single localCheckpoint above pins.
        scores = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
            "node",
            "outdeg",
            (F.lit(base) + F.coalesce(F.col("in_sum"), F.lit(0))).cast("long").alias("score"),
        )
    return (
        scores.select(F.col("node").alias("p_partkey"), "outdeg", F.col("score").alias("pr_score"))
        .orderBy(F.desc("pr_score"), F.asc("p_partkey"))
        .limit(topk)
    )


def q_pagerank_fixedpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pagerank_fixedpoint(load_table(spark, sf_dir, "lineitem"))


SQL_PAGERANK_FIXEDPOINT = f"""
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey <> b.l_partkey
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
s0 AS (
  SELECT src AS node, outdeg,
         CAST({PR_SCALE} AS BIGINT) // (SELECT n FROM n) AS score
  FROM deg
),
s1 AS (
  SELECT d.src AS node, d.outdeg,
         (15 * CAST({PR_SCALE} AS BIGINT)) // (100 * (SELECT n FROM n))
         + COALESCE(c.in_sum, 0) AS score
  FROM deg d LEFT JOIN (
    SELECT e.dst, sum((85 * s.score) // (100 * s.outdeg)) AS in_sum
    FROM edges e JOIN s0 s ON e.src = s.node GROUP BY e.dst
  ) c ON d.src = c.dst
),
s2 AS (
  SELECT d.src AS node, d.outdeg,
         (15 * CAST({PR_SCALE} AS BIGINT)) // (100 * (SELECT n FROM n))
         + COALESCE(c.in_sum, 0) AS score
  FROM deg d LEFT JOIN (
    SELECT e.dst, sum((85 * s.score) // (100 * s.outdeg)) AS in_sum
    FROM edges e JOIN s1 s ON e.src = s.node GROUP BY e.dst
  ) c ON d.src = c.dst
),
s3 AS (
  SELECT d.src AS node, d.outdeg,
         (15 * CAST({PR_SCALE} AS BIGINT)) // (100 * (SELECT n FROM n))
         + COALESCE(c.in_sum, 0) AS score
  FROM deg d LEFT JOIN (
    SELECT e.dst, sum((85 * s.score) // (100 * s.outdeg)) AS in_sum
    FROM edges e JOIN s2 s ON e.src = s.node GROUP BY e.dst
  ) c ON d.src = c.dst
)
SELECT node AS p_partkey, outdeg, CAST(score AS BIGINT) AS pr_score
FROM s3
ORDER BY pr_score DESC, p_partkey ASC
LIMIT {PR_TOPK}
"""

QUERIES = {"pagerank_fixedpoint": q_pagerank_fixedpoint}
ORACLES = {"pagerank_fixedpoint": SQL_PAGERANK_FIXEDPOINT}


# ---------------------------------------------------------------------------
# Triangle / clustering-coefficient statistics (r3): the second classic
# graph kernel after PageRank — transitivity of the co-purchase graph
# (how often two parts bought with a common third are bought together).
#
# Orientation trick (the scale-critical part): counting each triangle once
# via a total order over nodes. Ordering by (degree, node) instead of raw
# node id is the standard power-law defense (compact-forward / Latapy):
# every edge points low-degree -> high-degree, so a hub with degree d
# contributes wedges bounded by its LOW-degree neighbors' forward degrees,
# not d² — the wedge join stays near-linear in edges times arboricity
# rather than quadratic in hub degree. The degree table is one tiny
# (node, deg) relation — broadcast both attachments.
#
# All outputs are integer counts (exact, order-independent); the global
# clustering coefficient is one integer-derived double division, identical
# in the oracle.
# ---------------------------------------------------------------------------


def graph_triangle_stats(lineitem: DataFrame) -> DataFrame:
    und = copurchase_edges(lineitem)  # symmetric directed, distinct
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).select(
        F.col("src").alias("node"), "deg"
    )
    # orient each undirected edge from the (deg, id)-smaller endpoint
    e = (
        und.join(F.broadcast(deg.withColumnRenamed("node", "src")
                             .withColumnRenamed("deg", "sdeg")), "src")
        .join(F.broadcast(deg.withColumnRenamed("node", "dst")
                          .withColumnRenamed("deg", "ddeg")), "dst")
        .filter(
            (F.col("sdeg") < F.col("ddeg"))
            | ((F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst")))
        )
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
    )
    # referenced three times below (e1/e2/closing e3): pin once instead
    # of replaying the edge-gen shuffle per reference (same eager-exec
    # contract as pagerank's edge pin — documented in registry.py)
    e = pin(e, "triangle_edges")
    # broadcast the oriented edges for BOTH the wedge-gen and closing
    # joins: the wedge expansion (sum of forward-deg², ~49M rows at sf0.1)
    # then streams map-side through two broadcast hash joins and collapses
    # into the count — the 49M-row intermediate is never shuffled. Valid
    # while the oriented edge list fits in executor memory (~16 B/edge);
    # past that, repartition on u and let AQE pick sort-merge. The closing
    # probe keys on ONE packed BIGINT (u·2³² + v, keys < 2³¹) instead of a
    # two-column composite — measured ~1.6x on the 49M-probe join.
    pack = F.lit(1 << 32)

    def _pack(a, b):
        # runtime guard (not just a comment contract): ids at or above 2^31
        # would alias packed keys and silently miscount triangles — fail
        # loudly instead. assert_true returns NULL when the predicate
        # holds (else throws); folding it into the consumed expression via
        # when() keeps column pruning from dropping the check.
        ok = F.assert_true(
            (a >= 0) & (a < F.lit(1 << 31)) & (b >= 0) & (b < F.lit(1 << 31)),
            F.lit("graph_triangle_stats: node id outside [0, 2^31) aliases packed join keys"),
        )
        return F.when(ok.isNull(), a * pack + b)

    w = e.alias("e1").join(
        F.broadcast(e.alias("e2")), F.col("e1.v") == F.col("e2.u")
    ).select(_pack(F.col("e1.u"), F.col("e2.v")).alias("ac"))
    ekeys = e.select(_pack(F.col("u"), F.col("v")).alias("ac"))
    tri = w.join(F.broadcast(ekeys), "ac")
    summary = (
        deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            # edgeless input: zero rows -> NULL sums; report 0 counts (the
            # same hardening pagerank got for this input class)
            F.coalesce((F.sum("deg") / F.lit(2)).cast("long"), F.lit(0)).alias("n_edges"),
            F.coalesce(
                F.sum(F.expr("deg * (deg - 1) div 2")).cast("long"), F.lit(0)
            ).alias("n_wedges"),
        )
        .join(tri.agg(F.count(F.lit(1)).alias("n_triangles")))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            # a wedge-free graph (every node degree <= 1) has no defined
            # transitivity: NULL, not a DIVIDE_BY_ZERO under ANSI mode
            # (edge case surfaced by the brute-force property test)
            F.when(
                F.col("n_wedges") > 0,
                round_half_up(
                    F.lit(3.0) * F.col("n_triangles").cast("double")
                    / F.col("n_wedges").cast("double"),
                    9,
                ),
            ).alias("global_clustering"),
        )
    )
    return summary


def q_graph_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph_triangle_stats(load_table(spark, sf_dir, "lineitem"))


SQL_GRAPH_TRIANGLE_STATS = """
WITH und AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey <> b.l_partkey
),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY src),
e AS (
  SELECT u.src AS u, u.dst AS v
  FROM und u
  JOIN deg ds ON u.src = ds.node
  JOIN deg dd ON u.dst = dd.node
  WHERE ds.deg < dd.deg OR (ds.deg = dd.deg AND u.src < u.dst)
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM e e1 JOIN e e2 ON e1.v = e2.u
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
summ AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(COALESCE(sum(deg) / 2, 0) AS BIGINT) AS n_edges,
         CAST(COALESCE(sum(deg * (deg - 1) // 2), 0) AS BIGINT) AS n_wedges
  FROM deg
)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
       CASE WHEN n_wedges > 0 THEN
         floor((CAST(3 AS DOUBLE) * CAST(n_triangles AS DOUBLE)
                / CAST(n_wedges AS DOUBLE)) * 1000000000.0 + 0.5)
           / 1000000000.0
       END AS global_clustering
FROM summ, tri
"""

QUERIES["graph_triangle_stats"] = q_graph_triangle_stats
ORACLES["graph_triangle_stats"] = SQL_GRAPH_TRIANGLE_STATS
