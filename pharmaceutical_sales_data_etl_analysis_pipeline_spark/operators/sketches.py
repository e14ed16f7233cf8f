"""Deterministic sketch operators (r3): HyperLogLog cardinality and
Count-Min frequency estimation with md5-derived hashing, so BOTH engines
build the identical sketch — unlike `approx_count_distinct`, whose HLL++
implementation (and therefore estimates) is engine-private, these are
oracle-checkable bit-for-bit.

At 100 TB sketches are the only way to answer distinct/heavy-hitter
questions in one pass with bounded memory: the register/counter tables
are tiny fixed-size aggregation states (m=512 registers, d*w=3*1024
counters) with map-side partial combine — no shuffle of raw values, no
exact distinct state. The exact columns computed alongside here are the
calibration readout (they cost a real distinct; production at scale
drops them and keeps only the sketch).

FP discipline: register/counter updates are integer max/sum (exact,
order-independent). The HLL harmonic sum uses the 2^(SHIFT-M) integer
trick so Z is an exact BIGINT; the one double expression per group is
written with identical literal/operator order in both engines. ln()
appears only in the linear-counting branch (same libm caveat as
dsir_weights — rounded to 4dp, boundary risk negligible).
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .distrank import with_global_rank
from .textops import ws_words_col
from ..functions.numeric import round_half_up

HLL_M = 512          # registers (b=9); std error ~1.04/sqrt(512) = 4.6%
HLL_SHIFT = 40       # 2^(SHIFT-M) stays integral for rank M <= 33
_HLL_ALPHA_NUM = 0.7213
_HLL_ALPHA_DEN = 1.079


def _h32(col, lo: int) -> F.Column:
    """32-bit integer from md5 hex chars [lo, lo+8) of the column's string
    form — same value as the oracle's ('0x' || substr(...))::UBIGINT."""
    return F.conv(F.substring(F.md5(col.cast("string")), lo, 8), 16, 10).cast("long")


def hll_users_per_event_type(events: DataFrame) -> DataFrame:
    """(event_type, n_exact, n_est, rel_err): HLL distinct-user estimate
    per event type next to the exact count.

    Register index = h32a % m; rank = leading-zeros(h32b)+1 via
    33 - bitlength (bin() is minimal-width in both engines). Linear
    counting below the 2.5m threshold (the standard small-range branch).
    """
    reg = (_h32(F.col("user_id"), 1) % HLL_M).alias("reg")
    v = _h32(F.col("user_id"), 9)
    rank = F.when(v == 0, F.lit(33)).otherwise(F.lit(33) - F.length(F.bin(v)))
    regs = (
        events.select("event_type", reg, rank.alias("rank"))
        .groupBy("event_type", "reg")
        .agg(F.max("rank").alias("m_j"))
    )
    per = regs.groupBy("event_type").agg(
        F.sum(F.expr(f"shiftright(cast({1 << HLL_SHIFT} as bigint), m_j)"))
        .cast("long")
        .alias("z_present"),
        F.count(F.lit(1)).cast("long").alias("n_present"),
    )
    zeros = (F.lit(HLL_M) - F.col("n_present")).cast("long")
    z = F.col("z_present") + zeros * F.lit(1 << HLL_SHIFT).cast("long")
    raw = (
        (F.lit(_HLL_ALPHA_NUM) / (F.lit(1.0) + F.lit(_HLL_ALPHA_DEN) / F.lit(float(HLL_M))))
        * F.lit(float(HLL_M * HLL_M))
        * F.lit(float(1 << HLL_SHIFT))
        / z.cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(raw)
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    sk = per.select("event_type", round_half_up(est, 4).alias("n_est"))
    return exact.join(sk, "event_type").select(
        "event_type",
        "n_exact",
        "n_est",
        round_half_up(
            F.abs(F.col("n_est") - F.col("n_exact").cast("double"))
            / F.col("n_exact").cast("double"),
            4,
        ).alias("rel_err"),
    )


def q_hll_users_per_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hll_users_per_event_type(load_table(spark, sf_dir, "events"))


_M = HLL_M
_SHIFT_POW = 1 << HLL_SHIFT

SQL_HLL_USERS_PER_EVENT_TYPE = f"""
WITH hashed AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::UBIGINT::BIGINT % {_M} AS reg,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 9, 8))::UBIGINT::BIGINT AS v
  FROM events
),
regs AS (
  SELECT event_type, reg,
         max(CASE WHEN v = 0 THEN 33 ELSE 33 - length(bin(v)) END) AS m_j
  FROM hashed GROUP BY event_type, reg
),
per AS (
  SELECT event_type,
         CAST(sum(({_SHIFT_POW}::BIGINT >> m_j)) AS BIGINT) AS z_present,
         CAST(count(*) AS BIGINT) AS n_present
  FROM regs GROUP BY event_type
),
sk AS (
  SELECT event_type,
         floor((CASE WHEN ({_HLL_ALPHA_NUM} / (1.0 + {_HLL_ALPHA_DEN} / {float(_M)}))
                          * {float(_M * _M)} * {float(_SHIFT_POW)}
                          / CAST(z_present + ({_M} - n_present) * {_SHIFT_POW}::BIGINT AS DOUBLE)
                          <= {2.5 * _M}
                     AND ({_M} - n_present) > 0
                THEN {float(_M)} * ln({float(_M)} / CAST({_M} - n_present AS DOUBLE))
                ELSE ({_HLL_ALPHA_NUM} / (1.0 + {_HLL_ALPHA_DEN} / {float(_M)}))
                     * {float(_M * _M)} * {float(_SHIFT_POW)}
                     / CAST(z_present + ({_M} - n_present) * {_SHIFT_POW}::BIGINT AS DOUBLE)
                END) * 10000.0 + 0.5) / 10000.0 AS n_est
  FROM per
)
SELECT e.event_type, e.n_exact, sk.n_est,
       floor(abs(sk.n_est - CAST(e.n_exact AS DOUBLE)) / CAST(e.n_exact AS DOUBLE)
             * 10000.0 + 0.5) / 10000.0 AS rel_err
FROM (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY event_type) e
JOIN sk USING (event_type)
"""


QUERIES = {"hll_users_per_event_type": q_hll_users_per_event_type}
ORACLES = {"hll_users_per_event_type": SQL_HLL_USERS_PER_EVENT_TYPE}


# ---------------------------------------------------------------------------
# Count-Min sketch heavy hitters: d=3 hash rows x w=1024 counters over the
# token stream, probed for the exact top-10 words. The counter build
# groups by (row, hash % w) — BOUNDED 3072 keys with map-side combine, so
# the sketch never shuffles by word (word frequency is maximally skewed;
# the exact side's word groupBy exists only as the calibration readout).
# est >= exact always (collisions only add), asserted in tests.
# ---------------------------------------------------------------------------

CMS_D = 3
CMS_W = 1024
CMS_TOP = 10


def _cms_idx(row_col, word_col) -> F.Column:
    return (
        F.conv(
            F.substring(F.md5(F.concat(row_col.cast("string"), F.lit("|"), word_col)), 1, 8),
            16,
            10,
        ).cast("long")
        % CMS_W
    )


def cms_heavy_hitters(documents: DataFrame) -> DataFrame:
    toks = documents.select(
        F.explode(ws_words_col(F.col("text"))).alias("word")
    )
    rows3 = toks.select(
        "word", F.explode(F.array(*[F.lit(r) for r in range(CMS_D)])).alias("r")
    )
    counters = rows3.groupBy(
        "r", _cms_idx(F.col("r"), F.col("word")).alias("idx")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    top = (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("word"))
        .limit(CMS_TOP)
    )
    probes = top.select(
        "word",
        "n_exact",
        F.explode(F.array(*[F.lit(r) for r in range(CMS_D)])).alias("r"),
    ).select("word", "n_exact", "r", _cms_idx(F.col("r"), F.col("word")).alias("idx"))
    return (
        F.broadcast(probes)
        .join(counters, ["r", "idx"])
        .groupBy("word", "n_exact")
        .agg(F.min("c").cast("long").alias("n_est"))
        .select(
            "word",
            "n_exact",
            "n_est",
            (F.col("n_est") - F.col("n_exact")).cast("long").alias("overcount"),
        )
    )


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cms_heavy_hitters(load_table(spark, sf_dir, "documents", spread=True))


SQL_CMS_HEAVY_HITTERS = f"""
WITH toks AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
  FROM documents
),
rows3 AS (
  SELECT word, r FROM toks, range(0, {CMS_D}) t(r)
),
counters AS (
  SELECT r,
         ('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || word), 1, 8))::UBIGINT::BIGINT
           % {CMS_W} AS idx,
         CAST(count(*) AS BIGINT) AS c
  FROM rows3 GROUP BY 1, 2
),
top AS (
  SELECT word, CAST(count(*) AS BIGINT) AS n_exact
  FROM toks GROUP BY word
  ORDER BY n_exact DESC, word ASC LIMIT {CMS_TOP}
),
probes AS (
  SELECT word, n_exact, r,
         ('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || word), 1, 8))::UBIGINT::BIGINT
           % {CMS_W} AS idx
  FROM top, range(0, {CMS_D}) t(r)
)
SELECT p.word, p.n_exact,
       CAST(min(c.c) AS BIGINT) AS n_est,
       CAST(min(c.c) - p.n_exact AS BIGINT) AS overcount
FROM probes p JOIN counters c ON p.r = c.r AND p.idx = c.idx
GROUP BY p.word, p.n_exact
"""

QUERIES["cms_heavy_hitters"] = q_cms_heavy_hitters
ORACLES["cms_heavy_hitters"] = SQL_CMS_HEAVY_HITTERS


# ---------------------------------------------------------------------------
# Bloom-filter decontamination prefilter: the benchmark shingle set as a
# k=3 / m=16384-bit Bloom filter, probed by every corpus shingle — the
# broadcast structure that makes eval-set decontamination feasible at
# 100 TB (the full bench shingle set may not broadcast; its Bloom bits
# always do: m bits regardless of corpus size, tune m to the eval set).
# Reported per source: probe volume, Bloom hits, exact hits, and the
# realized false-positive rate. A Bloom filter NEVER misses a true member
# (asserted in tests: n_bloom >= n_exact per source); false positives
# only cost re-verification — exactly the contract a prefilter needs.
# ---------------------------------------------------------------------------

BLOOM_K = 3
BLOOM_M = 16384
_BLOOM_BENCH = 50  # same eval slice as corpusops.contamination_check


def _bloom_idx(r_col, shingle_col) -> F.Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(r_col.cast("string"), F.lit("|"), shingle_col)), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % BLOOM_M
    )


def bloom_prefilter_stats(documents: DataFrame) -> DataFrame:
    from .dedup import with_shingles

    # r4 single-pass restructure: the r3 form semi-joined hit/exact
    # subsets and LEFT-joined them back onto a third read of the corpus
    # relation (10 parquet scans). Marker left-joins keep every probe row
    # in ONE stream — (doc, shingle) is unique by construction
    # (array_distinct shingles), so the per-shingle groupBy reproduces
    # exactly one row per corpus shingle and the aggregate is
    # value-identical. The benchmark side never needs the source column,
    # so its branch skips the source join entirely.
    shing = with_shingles(documents)
    bench = shing.filter(F.col("doc_id") < _BLOOM_BENCH).select("shingle").distinct()
    ks = F.explode(F.array(*[F.lit(r) for r in range(BLOOM_K)])).alias("r")
    bits = bench.select(ks, "shingle").select(
        _bloom_idx(F.col("r"), F.col("shingle")).alias("idx"), "r"
    ).distinct()
    corpus = shing.filter(F.col("doc_id") >= _BLOOM_BENCH).join(
        documents.select("doc_id", "source"), "doc_id"
    )
    probes = corpus.select("doc_id", "source", "shingle", ks).select(
        "doc_id", "source", "shingle", "r", _bloom_idx(F.col("r"), F.col("shingle")).alias("idx")
    )
    per_shingle = (
        probes.join(F.broadcast(bits.withColumn("_b", F.lit(1))), ["r", "idx"], "left")
        .groupBy("doc_id", "source", "shingle")
        .agg(F.sum(F.coalesce(F.col("_b"), F.lit(0))).alias("k_hits"))
    )
    marked = per_shingle.join(
        F.broadcast(bench.withColumn("_e", F.lit(1))), "shingle", "left"
    )
    n = F.count(F.lit(1)).cast("long")
    nb = F.sum((F.col("k_hits") == BLOOM_K).cast("long")).cast("long")
    ne = F.sum(F.coalesce(F.col("_e"), F.lit(0))).cast("long")
    return marked.groupBy("source").agg(
        n.alias("n_probes"),
        nb.alias("n_bloom_hits"),
        ne.alias("n_exact_hits"),
        round_half_up((nb - ne).cast("double") / n.cast("double"), 6).alias("fp_rate"),
    )


def q_bloom_prefilter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bloom_prefilter_stats(load_table(spark, sf_dir, "documents", spread=True))


def _bloom_sql() -> str:
    from .dedup import SQL_SHINGLES_CTE

    return f"""
WITH {SQL_SHINGLES_CTE},
sh AS (
  SELECT s.doc_id, d.source, s.shingle
  FROM shingled s JOIN documents d ON s.doc_id = d.doc_id
),
bench AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id < {_BLOOM_BENCH}
),
bits AS (
  SELECT DISTINCT r,
         ('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || shingle), 1, 8))::UBIGINT::BIGINT
           % {BLOOM_M} AS idx
  FROM bench, range(0, {BLOOM_K}) t(r)
),
corpus AS (
  SELECT * FROM sh WHERE doc_id >= {_BLOOM_BENCH}
),
probes AS (
  SELECT doc_id, source, shingle, r,
         ('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || shingle), 1, 8))::UBIGINT::BIGINT
           % {BLOOM_M} AS idx
  FROM corpus, range(0, {BLOOM_K}) t(r)
),
hits AS (
  SELECT doc_id, source, shingle, 1 AS bloom_hit
  FROM probes p
  WHERE EXISTS (SELECT 1 FROM bits b WHERE b.r = p.r AND b.idx = p.idx)
  GROUP BY doc_id, source, shingle
  HAVING count(*) = {BLOOM_K}
),
exact AS (
  SELECT doc_id, source, shingle, 1 AS exact_hit
  FROM corpus WHERE shingle IN (SELECT shingle FROM bench)
)
SELECT c.source,
       CAST(count(*) AS BIGINT) AS n_probes,
       CAST(sum(coalesce(h.bloom_hit, 0)) AS BIGINT) AS n_bloom_hits,
       CAST(sum(coalesce(e.exact_hit, 0)) AS BIGINT) AS n_exact_hits,
       floor(CAST(sum(coalesce(h.bloom_hit, 0)) - sum(coalesce(e.exact_hit, 0)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS fp_rate
FROM corpus c
LEFT JOIN hits h ON c.doc_id = h.doc_id AND c.source = h.source AND c.shingle = h.shingle
LEFT JOIN exact e ON c.doc_id = e.doc_id AND c.source = e.source AND c.shingle = e.shingle
GROUP BY c.source
"""


SQL_BLOOM_PREFILTER_STATS = _bloom_sql()

QUERIES["bloom_prefilter_stats"] = q_bloom_prefilter_stats
ORACLES["bloom_prefilter_stats"] = SQL_BLOOM_PREFILTER_STATS


# ---------------------------------------------------------------------------
# Histogram quantile sketch + calibration (r3): the mergeable-quantile
# member of the sketch family (HLL=distinct, CMS=frequency, Bloom=member,
# MinHash=similarity, this=quantiles). A B-bucket equi-width histogram is
# the deterministic, order-independent, trivially mergeable sketch
# (bucket counts are integer sums); the approximate quantile is the lower
# edge of the first bucket whose cumulative count crosses ceil(p·n).
# Like minhash_calibration, the op reports the sketch estimate NEXT TO
# the exact order statistic and the error — the judge of whether B is
# adequate for the distribution. Bound: |approx − exact| < bucket width.
#
# Scale (r4 two-phase selection): histogram build is one map-side-
# combined agg (B=64 cells); min/max ride a first scalar pass. The EXACT
# comparator is the textbook distributed selection: the 64-row cumulative
# histogram (collected driver-side — the same tiny-driver-round-trip
# class as the k-means seeds) locates the bucket containing each target
# rank, and the distributed rank then runs only over that bucket's
# ~n/B rows instead of the whole relation. No full-table ordered pass
# exists at any scale; EAGER at build time (ext + 64-row histogram
# collect — registry eager-exec note).
# ---------------------------------------------------------------------------

QS_BUCKETS = 64
QS_PERCENTILES = (50, 90)


def histogram_quantile_calibration(orders: DataFrame) -> DataFrame:
    import math

    # count(o_totalprice), not count(*): n must range over the same
    # non-null subset the histogram below is built from, or the rank
    # target t = ceil(n*p/100) can exceed the filtered cumulative
    # histogram when NULL prices exist (empty exact-rank row). min/max
    # already ignore NULLs, so every phase agrees on the domain; the
    # oracle mirrors with count(o_totalprice) + IS NOT NULL filters.
    ext = orders.agg(
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
        F.count("o_totalprice").alias("n"),
    ).first()
    n = int(ext["n"]) if ext["n"] is not None else 0
    spark = orders.sparkSession
    schema = ("pct int, approx_value double, exact_value double, "
              "abs_err double, error_bound double")
    if n == 0:
        return spark.createDataFrame([], schema)
    mn, mx = float(ext["mn"]), float(ext["mx"])
    # literal arithmetic below mirrors the r3 column expressions operator-
    # for-operator (same IEEE ops on the same doubles), so every reported
    # value is bit-identical to the oracle's in-SQL computation
    width = (mx - mn) / float(QS_BUCKETS)
    x = F.col("o_totalprice")
    idx = F.least(
        F.lit(QS_BUCKETS - 1),
        F.floor((x - F.lit(mn)) / F.lit(width)).cast("int"),
    )
    # idx is NULL for NULL prices → drop those histogram rows (n above
    # counts only non-null prices, so the two stay consistent); without
    # the filter a NULL bucket row crashes int(r["b"]) driver-side with
    # a cryptic TypeError instead of producing a clean result.
    hist = sorted(
        (int(r["b"]), int(r["c"]))
        for r in orders.filter(x.isNotNull())
        .groupBy(idx.alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    )
    cum = []
    acc = 0
    for b, c in hist:
        acc += c
        cum.append((b, acc))

    outs = []
    for p in QS_PERCENTILES:
        t = int(math.ceil(float(n) * (p / 100.0)))
        before = 0
        bsel = cum[-1][0]
        for b, c_acc in cum:
            if c_acc >= t:
                bsel = b
                break
            before = c_acc
        k = t - before  # k-th smallest within bucket bsel
        approx = mn + float(bsel) * width
        # distributed rank over the ONE bucket holding the target rank
        # (~n/B rows); same idx expression as the histogram, so bucket
        # membership can never drift at a float boundary
        ranked = with_global_rank(
            orders.filter(idx == bsel).select("o_totalprice", "o_orderkey"),
            [F.asc("o_totalprice"), F.asc("o_orderkey")],
            "rn",
        )
        outs.append(
            ranked.filter(F.col("rn") == k)
            .agg(F.max("o_totalprice").alias("ex"))
            .select(
                F.lit(p).cast("int").alias("pct"),
                round_half_up(F.lit(approx), 6).alias("approx_value"),
                F.col("ex").alias("exact_value"),
                round_half_up(F.abs(F.lit(approx) - F.col("ex")), 6).alias("abs_err"),
                round_half_up(F.lit(width), 6).alias("error_bound"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def q_histogram_quantile_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    return histogram_quantile_calibration(load_table(spark, sf_dir, "orders"))


def _qs_sql_one(p: int) -> str:
    return f"""
SELECT CAST({p} AS INT) AS pct,
       floor((mn + CAST(ab AS DOUBLE) * ((mx - mn) / {QS_BUCKETS}.0)) * 1000000.0 + 0.5)
         / 1000000.0 AS approx_value,
       (SELECT o_totalprice FROM ranked
        WHERE rn = CAST(ceil(CAST((SELECT n FROM ext) AS DOUBLE) * {p / 100.0}) AS BIGINT))
         AS exact_value,
       floor(abs((mn + CAST(ab AS DOUBLE) * ((mx - mn) / {QS_BUCKETS}.0))
                 - (SELECT o_totalprice FROM ranked
                    WHERE rn = CAST(ceil(CAST((SELECT n FROM ext) AS DOUBLE) * {p / 100.0}) AS BIGINT)))
             * 1000000.0 + 0.5) / 1000000.0 AS abs_err,
       floor(((mx - mn) / {QS_BUCKETS}.0) * 1000000.0 + 0.5) / 1000000.0 AS error_bound
FROM ext,
     (SELECT MIN(b) AS ab FROM cum
      WHERE cumc >= CAST(ceil(CAST((SELECT n FROM ext) AS DOUBLE) * {p / 100.0}) AS BIGINT)) t
"""


SQL_HISTOGRAM_QUANTILE_CALIBRATION = f"""
WITH ext AS (
  SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx,
         count(o_totalprice) AS n FROM orders
),
hist AS (
  SELECT LEAST({QS_BUCKETS - 1},
               CAST(floor((o_totalprice - ext.mn)
                          / ((ext.mx - ext.mn) / {QS_BUCKETS}.0)) AS INT)) AS b,
         CAST(count(*) AS BIGINT) AS c
  FROM orders, ext
  WHERE o_totalprice IS NOT NULL
  GROUP BY 1
),
cum AS (
  SELECT b, SUM(c) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
  FROM hist
),
ranked AS (
  SELECT o_totalprice, row_number() OVER (ORDER BY o_totalprice) AS rn
  FROM orders WHERE o_totalprice IS NOT NULL
)
{_qs_sql_one(50)}
UNION ALL
{_qs_sql_one(90)}
"""

QUERIES["histogram_quantile_calibration"] = q_histogram_quantile_calibration
ORACLES["histogram_quantile_calibration"] = SQL_HISTOGRAM_QUANTILE_CALIBRATION
