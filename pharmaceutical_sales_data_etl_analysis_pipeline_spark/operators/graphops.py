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

# graph_triangle_stats join-strategy bounds, derived per run from the
# directed-pair upper bound (sum of k·(k−1) over lines-per-order):
#   bound <= TRI_BROADCAST_PAIR_MAX: broadcast the oriented edge list for
#     wedge-gen AND closing (zero wedge shuffle). 32M pairs -> <= 16M
#     oriented edges ≈ 400–500 MB serialized, under the 1 GiB default
#     spark.driver.maxResultSize. Measured: sf1 bound 24.0M fits; sf10
#     bound 240M FAILED unconditionally broadcast (caught by the r6
#     decade probe).
#   bound <= TRI_BLOOM_PAIR_MAX: shuffled wedge-gen, but the closing
#     join's wedge side is first pruned map-side by a broadcast Bloom
#     filter over the packed edge keys (~bound/2 bytes ≈ 128 MB at the
#     sf10 rung — an order of magnitude smaller than the raw edge list),
#     then closed exactly. Caps where the bloom itself stops fitting the
#     broadcast budget (~512 MB).
#   above: plain shuffled closing join — linear per decade by
#     construction, needs cluster-aggregate (not single-box) spill disk.
TRI_BROADCAST_PAIR_MAX = 32_000_000
TRI_BLOOM_PAIR_MAX = 1_000_000_000

# Shuffled-tier parallelism (r7, VERDICT ask #4): the sf10 rung lost
# 1.5x to a static 32-partition conf (549 s vs 365 s at 256 — the wedge
# expansion is 4.9B rows; 32 sorts of 150M rows each spill). The SAME
# eager-parameter discipline that picks the tier now also sizes the
# shuffled tier's exchanges: one node-sized agg over the PINNED edge
# list computes the EXACT wedge-join output (sum over nodes of
# indeg*outdeg), and the heavy joins repartition their inputs to
# ceil(wedges / TRI_ROWS_PER_TASK) — ~16M rows per sort task, the
# hand-tuned sf10 sweet spot (4.9B/256 ≈ 19M). Clamped below at the
# session's shuffle.partitions (never REDUCE parallelism the cluster
# conf asked for) and above at 4096 (task-scheduling overhead floor).
TRI_ROWS_PER_TASK = 16_000_000
TRI_MAX_SHUFFLE_PARTITIONS = 4096


def derive_tri_shuffle_partitions(wedge_rows: int, session_parts: int) -> int:
    """Partition count for the shuffled triangle tier: rows-per-task
    target over the exact wedge volume, clamped to [session conf, cap].
    Pure so the ladder can pin the derivation (same pattern as
    derive_sim_blocks / derive_neardup_params)."""
    need = -(-int(wedge_rows) // TRI_ROWS_PER_TASK)  # ceil
    return max(session_parts, min(TRI_MAX_SHUFFLE_PARTITIONS, need))


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
# rather than quadratic in hub degree.
#
# Join strategy is DERIVED from the data (r6): a one-agg upper bound on
# the pair count picks broadcast joins (edge list collected once, wedge
# intermediate never shuffled) below TRI_BROADCAST_PAIR_MAX, and the
# shuffled compact-forward closing joins above it — the unconditional
# broadcast was measured failing at the sf10 rung (120M oriented edges
# vs the 1 GiB driver.maxResultSize).
#
# All outputs are integer counts (exact, order-independent); the global
# clustering coefficient is one integer-derived double division, identical
# in the oracle.
# ---------------------------------------------------------------------------


def graph_triangle_stats(lineitem: DataFrame) -> DataFrame:
    und = copurchase_edges(lineitem)  # symmetric directed, distinct
    # Join-strategy probe (one cheap agg, same eager-parameter class as
    # kmeans' corpus count): sum of k·(k−1) over lines-per-order is an
    # UPPER BOUND on the directed co-purchase pairs BEFORE the distinct,
    # hence on |und| and on the oriented edge list (|e| <= bound/2). The
    # broadcast plan below collects the edge list to the driver, so it is
    # only legal while that bound stays comfortably under
    # spark.driver.maxResultSize — the r6 sf10 rung caught the
    # unconditional broadcast failing at 239M pairs (~120M oriented edges,
    # ~3.6 GB serialized vs the 1 GiB default). Wrong-side cost of the
    # bound's slack is performance only, never a failure: an over-estimate
    # just takes the shuffle path early.
    pair_bound = (
        lineitem.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.coalesce(F.sum(F.expr("c * (c - 1)")), F.lit(0)).alias("b"))
        .first()["b"]
    )
    small = pair_bound <= TRI_BROADCAST_PAIR_MAX
    bc = F.broadcast if small else (lambda df: df)
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).select(
        F.col("src").alias("node"), "deg"
    )
    # orient each undirected edge from the (deg, id)-smaller endpoint.
    # deg is node-count-sized (smaller than edges but still data-sized):
    # broadcast only under the same derived bound; on the big path the
    # SMJ attach is AQE-convertible back to broadcast at runtime if deg's
    # actual shuffle stats turn out tiny.
    e = (
        und.join(bc(deg.withColumnRenamed("node", "src")
                    .withColumnRenamed("deg", "sdeg")), "src")
        .join(bc(deg.withColumnRenamed("node", "dst")
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
    # SMALL path: broadcast the oriented edges for BOTH the wedge-gen and
    # closing joins — the wedge expansion (sum of forward-deg², ~49M rows
    # at sf0.1) streams map-side through two broadcast hash joins and
    # collapses into the count without ever shuffling.
    # BIG path (bound above TRI_BROADCAST_PAIR_MAX): plain equi-joins —
    # sort-merge with the wedge intermediate shuffled on the packed key,
    # i.e. the standard distributed compact-forward/MapReduce triangle
    # closing (Cohen 2009; Park & Chung 2013 shape) that survives any
    # scale; AQE's skew split covers hub-heavy wedge partitions.
    # The closing probe keys on ONE packed BIGINT (u·2³² + v, keys < 2³¹)
    # instead of a two-column composite — measured ~1.6x on the 49M-probe
    # join.
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

    if small:
        w = e.alias("e1").join(
            F.broadcast(e.alias("e2")), F.col("e1.v") == F.col("e2.u")
        ).select(_pack(F.col("e1.u"), F.col("e2.v")).alias("ac"))
        wedge_parts = None
    else:
        # Shuffled tier: size the heavy exchanges from the data, not the
        # static conf. e is pinned, so the EXACT wedge-join output — sum
        # over nodes of indeg(x)*outdeg(x) — costs one node-sized agg
        # (one shuffle over 2|e| tagged endpoint rows), the same eager-
        # parameter class as the pair bound that picked this tier.
        wedge_rows = (
            e.select(F.col("u").alias("n"), F.lit(1).alias("o"), F.lit(0).alias("i"))
            .unionByName(
                e.select(F.col("v").alias("n"), F.lit(0).alias("o"), F.lit(1).alias("i"))
            )
            .groupBy("n")
            .agg(F.sum("o").alias("o"), F.sum("i").alias("i"))
            .agg(F.coalesce(F.sum(F.col("o") * F.col("i")), F.lit(0)).alias("w"))
            .first()["w"]
        )
        try:
            session_parts = int(e.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):  # e.g. "auto" under some platforms
            session_parts = e.sparkSession.sparkContext.defaultParallelism
        wedge_parts = derive_tri_shuffle_partitions(wedge_rows, session_parts)
        # repartition ON THE JOIN KEYS: these ARE the wedge join's
        # required distributions, so the explicit exchanges replace (not
        # add to) the SMJ's own — with the derived width instead of the
        # conf's. AQE never RAISES a join's partition count, so this is
        # the only seam that fixes undersized static confs at runtime.
        w = (
            e.repartition(wedge_parts, F.col("v")).alias("e1")
            .join(
                e.repartition(wedge_parts, F.col("u")).alias("e2"),
                F.col("e1.v") == F.col("e2.u"),
            )
            .select(_pack(F.col("e1.u"), F.col("e2.v")).alias("ac"))
        )
    ekeys = e.select(_pack(F.col("u"), F.col("v")).alias("ac"))
    if not small and pair_bound <= TRI_BLOOM_PAIR_MAX:
        # MEDIUM tier: the closing join's left side is the full wedge
        # expansion (10x the edge count per decade here; 4.9B rows at the
        # sf10 rung ≈ 40 GB of shuffle+spill — it filled the box's disk).
        # Pre-filter it MAP-SIDE with a broadcast Bloom filter over the
        # packed edge keys, the published distributed-triangle reducer
        # (semi-join pruning; Spark's own runtime bloom-filter join does
        # exactly this but caps the build side far below 100M+ keys).
        # Only ~FPR·|wedges| false positives plus the true closures reach
        # the exact closing join, which removes the false positives —
        # correctness never depends on the filter. Sizing: m ≈ 8 bits per
        # possible edge (pair_bound/2), k=2 hashes -> FPR ≈ 1-2%; the
        # packed (word -> 64-bit mask) table is m/8 bytes ≈ bound/2 B —
        # ~15 MB at sf1-scale bounds, 128 MB at the sf10 rung, broadcast-
        # able far beyond where the raw edge list (16+ B/edge) stopped.
        m_bits = 1 << max(20, min(31, (4 * int(pair_bound)).bit_length()))
        # the bit-set build is a hash aggregate whose MAP side inherits
        # the pinned edge list's (conf-width) partitioning: at the sf10
        # rung that was 32 tasks x ~15M-entry partial-agg hash tables —
        # 130 of the rung's 408 stage-seconds, all GC churn (event-log
        # breakdown in SCALE.md). Fan the input out to the derived width
        # first: one cheap round-robin exchange of packed longs buys
        # small per-task tables.
        words_src = ekeys.repartition(wedge_parts) if wedge_parts else ekeys
        words = (
            words_src.select(
                F.explode(
                    F.array(
                        F.pmod(F.xxhash64(F.col("ac"), F.lit(1)), F.lit(m_bits)),
                        F.pmod(F.xxhash64(F.col("ac"), F.lit(2)), F.lit(m_bits)),
                    )
                ).alias("bit")
            )
            .select(
                F.shiftright(F.col("bit"), 6).alias("w"),
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))").alias("mask"),
            )
            .groupBy("w")
            .agg(F.bit_or("mask").alias("bits"))
        )

        def _probe(wdf: DataFrame, seed: int) -> DataFrame:
            return (
                wdf.withColumn(
                    "bit", F.pmod(F.xxhash64(F.col("ac"), F.lit(seed)), F.lit(m_bits))
                )
                .withColumn("w", F.shiftright(F.col("bit"), 6))
                .withColumn("m", F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))"))
                .join(F.broadcast(words), "w")
                .filter(F.col("bits").bitwiseAND(F.col("m")) != 0)
                .select("ac")
            )

        w = _probe(_probe(w, 1), 2)
    if wedge_parts is not None:
        # the closing join's left exchange, at the derived width (w is
        # partitioned on e1.v here, so the join must re-shuffle it on ac
        # anyway — this names the count, it adds no exchange)
        w = w.repartition(wedge_parts, F.col("ac"))
    tri = w.join(bc(ekeys), "ac")
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
