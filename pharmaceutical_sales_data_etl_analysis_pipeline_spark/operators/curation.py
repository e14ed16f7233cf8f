"""Round-3 corpus-curation operators: the rule-based quality gate,
chunk-level (line-dedup analog) duplication, and DSIR-style importance
weighting a large-scale pretraining-data pipeline runs between raw crawl
and tokenizer.

Reference parity note: the reference pipeline (LoadXML2DB.ChatterjeeP.R /
AnalyzeData.ChatterjeeP.Rmd) has no corpus-curation surface; these extend
the engine per the LLM-training-pipeline mandate, same registry/oracle
contract as every other operator.

Scale posture:
- `gopher_quality_flags` — ONE scan of documents, all rules computed as
  JVM built-in column expressions, one map-side-combined groupBy(source).
  Output is |sources| rows. Trivially linear.
- `chunk_dedup` — explode disjoint 10-token chunks (linear in corpus
  tokens), one groupBy(chunk) for global doc-frequency, one join back on
  chunk (equi-join, AQE-skew-splittable), one groupBy(doc_id). No
  all-pairs anywhere; this is the RefinedWeb/CCNet "line-level dedup"
  shape with chunks standing in for lines (the synthetic corpus has no
  newlines).
- `dsir_weights` — vocabulary statistics are two tiny aggs (vocab is
  bounded; at 100 TB a hashed-vocab cap keeps it bounded too) broadcast
  back against the token stream; per-doc reduce is an exact DECIMAL sum,
  order-independent across any partition layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.numeric import round_half_up
from .textops import STOPWORD_RE, ws_words_col

# ---------------------------------------------------------------------------
# Gopher/C4-style rule flags. Thresholds tuned to be discriminative on the
# synthetic corpus while keeping the published shape of the rules
# (Rae et al. 2021 "Scaling Language Models" appendix A; C4 filters).
# ---------------------------------------------------------------------------

MIN_WORDS = 40
MAX_WORDS = 50_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MIN_DISTINCT_STOPWORDS = 2


def gopher_quality_flags(documents: DataFrame) -> DataFrame:
    """Per-source pass counts for the rule-based quality gate.

    Rules (each a pure column expression over one scan):
      r1 word-count window   — MIN_WORDS <= n_words <= MAX_WORDS
      r2 mean word length    — nonspace_chars / n_words in [3, 10]
      r3 stopword presence   — >= 2 DISTINCT stopwords from the shared list
    """
    t = F.col("text")
    words = ws_words_col(t)
    n_words = F.size(words).cast("double")
    nonspace = F.length(F.regexp_replace(t, r"\s", "")).cast("double")
    mean_len = nonspace / n_words
    n_stop = F.size(F.array_distinct(F.regexp_extract_all(F.lower(t), F.lit(STOPWORD_RE), 0)))
    r1 = (n_words >= MIN_WORDS) & (n_words <= MAX_WORDS)
    r2 = (mean_len >= MIN_MEAN_WORD_LEN) & (mean_len <= MAX_MEAN_WORD_LEN)
    r3 = n_stop >= MIN_DISTINCT_STOPWORDS
    flags = documents.select(
        "source",
        r1.cast("long").alias("p1"),
        r2.cast("long").alias("p2"),
        r3.cast("long").alias("p3"),
        (r1 & r2 & r3).cast("long").alias("pall"),
    )
    n = F.count(F.lit(1)).cast("long")
    return (
        flags.groupBy("source")
        .agg(
            n.alias("n_docs"),
            F.sum("p1").cast("long").alias("pass_wordcount"),
            F.sum("p2").cast("long").alias("pass_meanlen"),
            F.sum("p3").cast("long").alias("pass_stopwords"),
            F.sum("pall").cast("long").alias("pass_all"),
            round_half_up(F.sum("pall").cast("double") / n.cast("double"), 6).alias("pass_rate"),
        )
    )


def q_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_quality_flags(load_table(spark, sf_dir, "documents"))


SQL_GOPHER_QUALITY_FLAGS = f"""
WITH sig AS (
  SELECT source,
         CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE) AS n_words,
         CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) AS nonspace,
         len(list_distinct(regexp_extract_all(lower(text), '{STOPWORD_RE}'))) AS n_stop
  FROM documents
), flags AS (
  SELECT source,
         CAST(n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS} AS BIGINT) AS p1,
         CAST(nonspace / n_words >= {MIN_MEAN_WORD_LEN}
              AND nonspace / n_words <= {MAX_MEAN_WORD_LEN} AS BIGINT) AS p2,
         CAST(n_stop >= {MIN_DISTINCT_STOPWORDS} AS BIGINT) AS p3
  FROM sig
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(p1) AS BIGINT) AS pass_wordcount,
       CAST(sum(p2) AS BIGINT) AS pass_meanlen,
       CAST(sum(p3) AS BIGINT) AS pass_stopwords,
       CAST(sum(p1 * p2 * p3) AS BIGINT) AS pass_all,
       floor(CAST(sum(p1 * p2 * p3) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS pass_rate
FROM flags
GROUP BY source
"""


# ---------------------------------------------------------------------------
# Chunk-level dedup (line-level dedup analog): disjoint 10-token windows,
# a chunk is "duplicated" when it appears in >= 2 distinct documents.
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 10


def _chunks(documents: DataFrame) -> DataFrame:
    """(doc_id, chunk) — disjoint CHUNK_TOKENS-token windows, docs shorter
    than one chunk drop out (same convention as the shingle ops)."""
    words = ws_words_col(F.col("text"))
    k = CHUNK_TOKENS
    chunk_arr = F.expr(
        f"transform(sequence(1, size(words) div {k}), "
        f"          i -> concat_ws(' ', slice(words, (i-1)*{k} + 1, {k})))"
    )
    return (
        documents.select("doc_id", words.alias("words"))
        .filter(F.size("words") >= k)
        .select("doc_id", F.explode(chunk_arr).alias("chunk"))
    )


def chunk_dedup(documents: DataFrame) -> DataFrame:
    """Per-doc duplicated-chunk fraction.

    Global chunk doc-frequency via one groupBy(chunk); re-join on chunk
    (equi-join on the exploded stream — linear, no pairs); per-doc rollup.
    """
    chunks = _chunks(documents)
    docfreq = chunks.groupBy("chunk").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n = F.count(F.lit(1)).cast("long")
    ndup = F.sum((F.col("df") >= 2).cast("long")).cast("long")
    return (
        chunks.join(docfreq, "chunk")
        .groupBy("doc_id")
        .agg(
            n.alias("n_chunks"),
            ndup.alias("n_dup_chunks"),
            round_half_up(ndup.cast("double") / n.cast("double"), 6).alias("dup_chunk_frac"),
        )
    )


def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_dedup(load_table(spark, sf_dir, "documents"))


SQL_CHUNK_DEDUP = f"""
WITH w AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS words
  FROM documents
), chunks AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(words) // {CHUNK_TOKENS} + 1),
                i -> array_to_string(words[(i-1)*{CHUNK_TOKENS} + 1 : i*{CHUNK_TOKENS}], ' ')))
           AS chunk
  FROM w
  WHERE len(words) >= {CHUNK_TOKENS}
), docfreq AS (
  SELECT chunk, count(DISTINCT doc_id) AS df FROM chunks GROUP BY chunk
)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CAST(df >= 2 AS BIGINT)) AS BIGINT) AS n_dup_chunks,
       floor(CAST(sum(CAST(df >= 2 AS BIGINT)) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS dup_chunk_frac
FROM chunks c JOIN docfreq USING (chunk)
GROUP BY c.doc_id
"""


# ---------------------------------------------------------------------------
# DSIR-style importance weights (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): per-doc average log-
# likelihood ratio of a target unigram model (here: the English slice)
# vs the full-corpus model, add-one smoothed over the corpus vocabulary.
#
# FP discipline: each vocabulary word's log-ratio is computed ONCE from an
# exact BIGINT rational (identical double input in both engines), rounded
# half-up to 6dp and carried as DECIMAL(18,6); the per-doc reduce is then
# an exact decimal SUM — order-independent, bit-equal across engines and
# partition layouts. The only cross-engine FP exposure is libm `ln` on
# identical inputs landing within 1 ulp of a rounding boundary (~50-word
# vocab -> negligible).
# ---------------------------------------------------------------------------

DSIR_TARGET_LANG = "en"


def _doc_words(documents: DataFrame) -> DataFrame:
    return documents.select(
        "doc_id",
        "lang",
        F.explode(ws_words_col(F.col("text"))).alias("word"),
    )


def dsir_weights(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, dsir_logratio): exact-decimal sum of per-token
    ln(p_target / p_corpus) under add-one-smoothed unigram models."""
    toks = _doc_words(documents)
    # corpus-level stats: tiny (|vocab| rows), computed once, broadcast back
    vocab = toks.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("ca"),
        F.sum((F.col("lang") == DSIR_TARGET_LANG).cast("long")).cast("long").alias("ct"),
    )
    totals = vocab.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("ct").cast("long").alias("nt"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    lr = (
        vocab.crossJoin(F.broadcast(totals))
        .select(
            "word",
            round_half_up(
                F.log(
                    ((F.col("ct") + 1) * (F.col("na") + F.col("v"))).cast("double")
                    / ((F.col("ca") + 1) * (F.col("nt") + F.col("v"))).cast("double")
                ),
                6,
            ).cast("decimal(18,6)").alias("lr"),
        )
    )
    return (
        toks.join(F.broadcast(lr), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("lr").cast("decimal(28,6)").cast("double").alias("dsir_logratio"),
        )
    )


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dsir_weights(load_table(spark, sf_dir, "documents"))


SQL_DSIR_WEIGHTS = f"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
  FROM documents
), vocab AS (
  SELECT word,
         CAST(count(*) AS BIGINT) AS ca,
         CAST(sum(CAST(lang = '{DSIR_TARGET_LANG}' AS BIGINT)) AS BIGINT) AS ct
  FROM toks GROUP BY word
), totals AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(ct) AS BIGINT) AS nt,
         CAST(count(*) AS BIGINT) AS v
  FROM vocab
), lr AS (
  SELECT word,
         CAST(floor(ln(CAST((ct + 1) * (na + v) AS DOUBLE)
                       / CAST((ca + 1) * (nt + v) AS DOUBLE))
                    * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS lr
  FROM vocab, totals
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(CAST(sum(lr) AS DECIMAL(28,6)) AS DOUBLE) AS dsir_logratio
FROM toks JOIN lr USING (word)
GROUP BY doc_id
"""


QUERIES = {
    "gopher_quality_flags": q_gopher_quality_flags,
    "chunk_dedup": q_chunk_dedup,
    "dsir_weights": q_dsir_weights,
}
ORACLES = {
    "gopher_quality_flags": SQL_GOPHER_QUALITY_FLAGS,
    "chunk_dedup": SQL_CHUNK_DEDUP,
    "dsir_weights": SQL_DSIR_WEIGHTS,
}


# ---------------------------------------------------------------------------
# Quality-filter funnel: cumulative survivor counts through the
# training-corpus gate (raw -> lang -> quality -> min-tokens -> near-dedup)
# — the governance table a data release publishes next to dataset_cards.
# Same signal expressions and thresholds as training_corpus (textops is
# the single source of truth), so the funnel's last row always equals
# |training_corpus|. One scan computes every per-row flag as a column;
# the only join is the dedup-survivor attach; the aggregate is one row,
# exploded into 5 stage rows driver-side-free.
# ---------------------------------------------------------------------------


def quality_filter_funnel(documents: DataFrame) -> DataFrame:
    from .corpusops import CORPUS_MIN_QUALITY, CORPUS_MIN_TOKENS, dedup_survivors
    from .textops import predicted_lang_col, quality_score_col, ws_tokens_col

    t = F.col("text")
    b1 = predicted_lang_col(t) == "en"
    b2 = b1 & (quality_score_col(t) >= CORPUS_MIN_QUALITY)
    b3 = b2 & (ws_tokens_col(t) >= CORPUS_MIN_TOKENS)
    sig = documents.select(
        "doc_id",
        b1.cast("long").alias("b1"),
        b2.cast("long").alias("b2"),
        b3.cast("long").alias("b3"),
    )
    surv = dedup_survivors(documents).select("doc_id", F.col("keep").cast("long").alias("kp"))
    agg = sig.join(surv, "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("s0"),
        F.sum("b1").cast("long").alias("s1"),
        F.sum("b2").cast("long").alias("s2"),
        F.sum("b3").cast("long").alias("s3"),
        F.sum(F.col("b3") * F.col("kp")).cast("long").alias("s4"),
    )
    stages = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("stage_idx"),
                F.lit(name).alias("stage"),
                F.col(f"s{i}").alias("n_docs"),
            )
            for i, name in enumerate(
                ["raw", "lang_en", "quality", "min_tokens", "near_dedup"]
            )
        ]
    )
    return (
        agg.select(F.col("s0"), F.explode(stages).alias("st"))
        .select(
            F.col("st.stage_idx").alias("stage_idx"),
            F.col("st.stage").alias("stage"),
            F.col("st.n_docs").alias("n_docs"),
            round_half_up(
                F.col("st.n_docs").cast("double") / F.col("s0").cast("double"), 6
            ).alias("retained_frac"),
        )
    )


def q_quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_filter_funnel(load_table(spark, sf_dir, "documents", spread=True))


def _funnel_sql() -> str:
    from .corpusops import CORPUS_MIN_QUALITY, CORPUS_MIN_TOKENS, SQL_DEDUP_SURVIVORS
    from .textops import SQL_LANG_ID, SQL_TEXT_QUALITY, SQL_TOKEN_COUNTS

    rows = ",\n  ".join(
        f"({i}, '{name}', s{i})"
        for i, name in enumerate(["raw", "lang_en", "quality", "min_tokens", "near_dedup"])
    )
    return f"""
WITH surv AS ({SQL_DEDUP_SURVIVORS}),
lang AS ({SQL_LANG_ID}),
qual AS ({SQL_TEXT_QUALITY}),
toks AS ({SQL_TOKEN_COUNTS}),
flags AS (
  SELECT d.doc_id,
         CAST(lang.predicted_lang = 'en' AS BIGINT) AS b1,
         CAST(lang.predicted_lang = 'en'
              AND qual.quality_score >= {CORPUS_MIN_QUALITY} AS BIGINT) AS b2,
         CAST(lang.predicted_lang = 'en'
              AND qual.quality_score >= {CORPUS_MIN_QUALITY}
              AND toks.ws_tokens >= {CORPUS_MIN_TOKENS} AS BIGINT) AS b3,
         CAST(surv.keep AS BIGINT) AS kp
  FROM documents d
  JOIN lang ON d.doc_id = lang.doc_id
  JOIN qual ON d.doc_id = qual.doc_id
  JOIN toks ON d.doc_id = toks.doc_id
  JOIN surv ON d.doc_id = surv.doc_id
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS s0, CAST(sum(b1) AS BIGINT) AS s1,
         CAST(sum(b2) AS BIGINT) AS s2, CAST(sum(b3) AS BIGINT) AS s3,
         CAST(sum(b3 * kp) AS BIGINT) AS s4
  FROM flags
),
stages(stage_idx, stage, n_docs) AS (
  SELECT t.* FROM agg, (VALUES
  {rows}) t(stage_idx, stage, n_docs)
)
SELECT CAST(stage_idx AS INT) AS stage_idx, stage, n_docs,
       floor(CAST(n_docs AS DOUBLE) / CAST((SELECT s0 FROM agg) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS retained_frac
FROM stages
"""


SQL_QUALITY_FILTER_FUNNEL = _funnel_sql()

QUERIES["quality_filter_funnel"] = q_quality_filter_funnel
ORACLES["quality_filter_funnel"] = SQL_QUALITY_FILTER_FUNNEL


# ---------------------------------------------------------------------------
# Bigram LM score (perplexity proxy): per-doc mean -ln p(w_i | w_{i-1})
# under an add-one-smoothed corpus bigram model — the KenLM-style quality
# signal pretraining pipelines use to rank documents, expressed exactly.
# Model tables are corpus-level aggs over a BOUNDED vocabulary (unigram
# |V|, bigram <= |V|^2 — both broadcastable; at open-vocab scale, hash-
# bucket the tail as with dsir_weights). Per-token -ln p is computed once
# per DISTINCT bigram from exact BIGINT rationals, rounded to 6dp
# decimals; the per-doc reduce is an exact decimal sum — the dsir
# discipline, so results are bit-identical across engines and layouts.
# ---------------------------------------------------------------------------


def bigram_logprob(documents: DataFrame) -> DataFrame:
    words = ws_words_col(F.col("text"))
    bi = (
        documents.select("doc_id", words.alias("words"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "CASE WHEN size(words) >= 2 THEN "
                    "transform(sequence(1, size(words) - 1), "
                    "          i -> struct(words[i-1] AS w1, words[i] AS w2)) "
                    "ELSE array() END"
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    # model tables: bigram counts + unigram (context) counts + vocab size
    bigrams = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("cb"))
    unigrams = bigrams.groupBy("w1").agg(F.sum("cb").cast("long").alias("cu"))
    vsize = documents.select(
        F.explode(words).alias("w")
    ).agg(F.countDistinct("w").cast("long").alias("v"))
    # -ln p(w2|w1) = ln((cu + v) / (cb + 1)), one exact rational per bigram
    scores = (
        bigrams.join(unigrams, "w1")
        .crossJoin(F.broadcast(vsize))
        .select(
            "w1",
            "w2",
            round_half_up(
                F.log(
                    (F.col("cu") + F.col("v")).cast("double")
                    / (F.col("cb") + 1).cast("double")
                ),
                6,
            ).cast("decimal(18,6)").alias("nll"),
        )
    )
    return (
        bi.join(F.broadcast(scores), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            round_half_up(
                F.sum("nll").cast("decimal(28,6)").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mean_nll"),
        )
    )


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_logprob(load_table(spark, sf_dir, "documents"))


SQL_BIGRAM_LOGPROB = """
WITH w AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS words
  FROM documents
),
bi AS (
  SELECT doc_id,
         unnest(CASE WHEN len(words) >= 2 THEN
                  list_transform(range(1, len(words)),
                                 i -> struct_pack(w1 := words[i], w2 := words[i+1]))
                ELSE [] END) AS b
  FROM w
),
pairs AS (
  SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bi
),
bigrams AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM pairs GROUP BY w1, w2
),
unigrams AS (
  SELECT w1, CAST(sum(cb) AS BIGINT) AS cu FROM bigrams GROUP BY w1
),
vsize AS (
  SELECT CAST(count(DISTINCT word) AS BIGINT) AS v
  FROM (SELECT unnest(words) AS word FROM w) t
),
scores AS (
  SELECT w1, w2,
         CAST(floor(ln(CAST(cu + v AS DOUBLE) / CAST(cb + 1 AS DOUBLE))
                    * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS nll
  FROM bigrams JOIN unigrams USING (w1), vsize
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       floor(CAST(CAST(sum(nll) AS DECIMAL(28,6)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS mean_nll
FROM pairs JOIN scores USING (w1, w2)
GROUP BY doc_id
"""

QUERIES["bigram_logprob"] = q_bigram_logprob
ORACLES["bigram_logprob"] = SQL_BIGRAM_LOGPROB


# ---------------------------------------------------------------------------
# Entity resolution: near-matching part names by edit distance with
# blocking — the catalog-dedup step of a product-master pipeline. Two
# scale levers, both in the plan: (1) DEDUPE FIRST — pairs are generated
# over DISTINCT names (64 at sf0.01), never over the 2000-row part table;
# (2) BLOCKING — candidates come from an equi-join on the name's last
# token, so pair volume is sum of per-block squares, not |names|^2.
# levenshtein() is the same DP metric in Spark and DuckDB — exact integer
# parity. The blocked plan can only MISS cross-block pairs (documented
# recall bound of last-token blocking); everything emitted is verified by
# the true edit distance.
# ---------------------------------------------------------------------------

LEV_MAX = 4


def part_name_near_matches(part: DataFrame) -> DataFrame:
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    blocked = names.select(
        "p_name",
        "n_parts",
        F.element_at(F.split(F.col("p_name"), " "), -1).alias("block"),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    lev = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(lev <= LEV_MAX)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            lev.cast("int").alias("edit_dist"),
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
        )
    )


def q_part_name_near_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    return part_name_near_matches(load_table(spark, sf_dir, "part"))


SQL_PART_NAME_NEAR_MATCHES = f"""
WITH names AS (
  SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts FROM part GROUP BY p_name
),
blocked AS (
  SELECT p_name, n_parts,
         list_extract(string_split(p_name, ' '), len(string_split(p_name, ' '))) AS block
  FROM names
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
FROM blocked a
JOIN blocked b ON a.block = b.block AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {LEV_MAX}
"""

QUERIES["part_name_near_matches"] = q_part_name_near_matches
ORACLES["part_name_near_matches"] = SQL_PART_NAME_NEAR_MATCHES
