"""Central query registry: merges every operator module's QUERIES/ORACLES.

__spark_entry__.queries()/oracle_sql() read from here. Invariant (checked in
tests): every queries() key has either an oracle twin or is explicitly
listed in NO_ORACLE (non-SQL-expressible ops → driver rows-only check).

Ordering contract: the external correctness sweep covers the FIRST 50
registry entries in insertion order. PRIORITY lists, by name, every query
that still needs (or, after a plan change, needs a fresh) driver-oracle
row; those are emitted first, the rest follow in MODULE_ORDER. Queries
rotated out of the window stay protected by the local harness
(tests/test_oracle_parity.py — the same compare at sf0.001). Refresh
PRIORITY each round from the latest CORRECTNESS_r{N}.json.

Imports are deliberately NOT guarded: a broken operator module must fail
the whole registry loudly (a swallowed ImportError would silently shrink
the query surface and let the correctness gate pass on fewer queries).
tests/test_oracle_parity.py pins the exact query count as a second guard.

EAGER-EXECUTION NOTE: most entries are pure plan builders (calling the
function runs no Spark jobs until an action). Exceptions, documented at
their definitions, run jobs at BUILD time: queries whose plan reuses an
intermediate across branches via operators/pin.py (basket_affinity,
bm25_topk_terms, hybrid_retrieval_rrf, hybrid_retrieval_rrf_ann
(whose IVF-PQ dense side also derives codebooks/centroids from the
corpus), term_lift_pairs, pagerank_fixedpoint,
graph_triangle_stats, tfidf_topk_terms, neardup_components and its
dependents training_corpus/dedup_survivors/dedup_rate_by_source) and queries whose
parameters derive from the data via driver round-trips (kmeans_clusters,
semdedup_candidates, ivf_*: corpus count / seeds / centroid sums;
simhash_near_dups / embedding_near_dups and their _planted variants:
one count() that picks the corpus-derived LSH partition — block count /
mask width / table count; the oracle re-derives the same integers from
count(*), or is block-independent (simhash's all-pairs contract);
histogram_quantile_calibration: 3-scalar extent + 64-row histogram for
the two-phase exact-selection comparator; ann_recall_eval: the pinned
brute-force ground-truth pass it ranks every ANN variant against;
graph_triangle_stats: one pair-bound agg that derives the broadcast-vs-
shuffle join strategy — the unconditional edge broadcast failed at the
r6 sf10 rung); and the ingest-fixture queries that stage files and
drain a Structured Streaming query at build (stream_mor_ingest,
xml_stream_ingest — both memoized per corpus;
stream_stateful_user_totals — unmemoized, the 3-file fixture republish
is cheaper than a corpus hash; stream_session_event_expiry — one
bounded min/max round-trip sizes its time slices, then a 5-file publish
+ self-terminating availableNow drain; stream_session_expiry — unmemoized
4-batch publish + a listener-driven drain with explicit stop, because
ProcessingTimeTimeout keeps the engine scheduling batches and
availableNow would never terminate — sweep-cost budget in
BENCH_NOTES r10).
pin() defaults to localCheckpoint (executor-local blocks — fine in
local[*]); set SPARK_GRAFT_PIN=table to materialize those intermediates
to durable scratch parquet instead, the cluster-scale mode (survives
executor loss; read-back re-shuffles once where checkpoint blocks kept
partitioning — delta measured in BENCH_NOTES.md). Loop-internal
iterative states remain localCheckpoint by design (pin.py docstring).
"""

from __future__ import annotations

import importlib

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

MODULE_ORDER = [
    "tpch",
    "scalarfuncs",
    "corpusops",
    "pythonudf",
    "analytic",
    "dedup",
    "similarity",
    "multimodal",
    "relational",
    "textops",
    "eventsops",
    "clustering",
    "warehouse",
    "curation",
    "streamingq",
    "sketches",
    "graphops",
]

# Round-13 sweep priority. After r12 the union r1∪…∪r12 (latest-wins) is
# 218/218 green with zero standing failures and no row older than r8
# (histogram r12 50 / r11 41 / r10 43 / r9 43 / r8 41). The r13 window
# retires the ENTIRE r8 staleness cohort (VERDICT r12 ask #2):
#   (a) the FULL r8 staleness cohort, 41 rows in name order
#       (bigram_logprob .. xml_stream_ingest), honoring BENCH_NOTES'
#       candidates head (bigram_logprob is row 1 of the cohort);
#   (b) the 9 OLDEST r9 rows in name order (ann_recall_eval ..
#       fk_integrity_audit) to fill the window — 41 + 9 = 50 exactly.
# PREPENDED per the rotation invariant (outranks staleness): r13 NEW
# mor_time_travel (VERSION-AS-OF read through
# read_partitioned_state_version — the one table-format read path that
# had no registered query) and dq_constraint_report (Deequ-style
# declarative column-constraint suite, every metric a conditional
# aggregate over ONE shared scan). They displace the 9th and 8th r9
# fills (fk_integrity_audit, explode_roundtrip — next in line for
# r14). No other r13 work touched a registered plan (bench artifact
# format, WAL auto-compaction, probes, retry backoff — commit-protocol
# only).
# After this sweep no registered query's latest driver row predates r9.
PRIORITY = [
    "mor_time_travel",
    "dq_constraint_report",
    # (a) the full r8 staleness cohort, name order (41 rows)
    "bigram_logprob",
    "bloom_prefilter_stats",
    "bpe_pair_stats",
    "calendar_dim",
    "chunk_dedup",
    "cluster_label_purity",
    "cms_heavy_hitters",
    "conversation_assembly",
    "dsir_weights",
    "embedding_center",
    "event_dedup_tolerance",
    "fd_discovery",
    "hourly_anomalies",
    "incremental_neardup",
    "interpolate_hourly",
    "inverted_index",
    "ivf_list_sizes",
    "ivf_probe2_topk",
    "ivf_probe_topk",
    "kmeans_clusters",
    "multimodal_resize",
    "ngram_jaccard",
    "ntile_quartiles",
    "oov_rate",
    "pq_codes",
    "price_quantity_corr",
    "quality_deciles",
    "repetition_ratio",
    "rolling_7d_actives",
    "scd2_intervals",
    "semdedup_candidates",
    "sequence_packing",
    "session_conversion",
    "stratified_sample",
    "table_diff",
    "term_lift_pairs",
    "tpch_q1",
    "twap_per_user",
    "udtf_sentences",
    "weighted_sample",
    "xml_stream_ingest",
    # (b) the 7 oldest r9 rows, name order, filling the window to 50
    "ann_recall_eval",
    "array_agg_per_brand",
    "array_functions",
    "cheapest_supplier_per_part",
    "date_arithmetic",
    "deterministic_sample",
    "distribution_drift",
]
# r14 PRIORITY candidates (staleness head after the r13 sweep): the
# remaining 36 r9 rows in name order (explode_roundtrip and
# fk_integrity_audit — displaced from the r13 window by the two r13
# prepends — then gopher_quality_flags, grouped_agg_pandas,
# histogram_quantile_calibration, …), then the oldest r10 rows fill the
# window. Queries ADDED or PLAN-CHANGED during r13 must be PREPENDED
# here per the rotation invariant (they outrank staleness refreshes).


def _collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    merged_q: dict[str, QueryFn] = {}
    merged_o: dict[str, str] = {}
    for name in MODULE_ORDER:
        mod = importlib.import_module(
            f"pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators.{name}"
        )
        merged_q.update(mod.QUERIES)
        merged_o.update(mod.ORACLES)
    missing = [n for n in PRIORITY if n not in merged_q]
    if missing:
        raise RuntimeError(f"PRIORITY names not in any module's QUERIES: {missing}")
    queries: dict[str, QueryFn] = {n: merged_q[n] for n in PRIORITY}
    queries.update(merged_q)  # remaining keys keep module order
    oracles: dict[str, str] = {n: merged_o[n] for n in PRIORITY if n in merged_o}
    oracles.update(merged_o)
    return queries, oracles


def all_queries() -> dict[str, QueryFn]:
    return _collect()[0]


def all_oracles() -> dict[str, str]:
    return _collect()[1]


# non-SQL-expressible ops → rows-only check (currently none: even the
# mapInPandas feature extraction has a byte-arithmetic DuckDB twin)
NO_ORACLE: set[str] = set()
