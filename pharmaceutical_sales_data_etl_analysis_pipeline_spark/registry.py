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
xml_stream_ingest — both memoized per corpus).
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

# Round-8 sweep priority. After r7 the union r1∪…∪r7 (latest-wins) is
# 207/207 green with zero standing failures, so the r8 window is pure
# freshness plus the rotation-invariant prepends:
#   (c) PREPENDED: r8's two new queries (xml_stream_ingest — S5's
#       streaming twin; hybrid_retrieval_rrf_ann — BM25 fused with the
#       IVF-PQ dense side), ann_recall_eval (plan changed: +hybrid_rrf_pq
#       recall row, pinned ground truth keeps rnk), and the six
#       table-format queries whose build/write paths changed (r8's
#       non-destructive attempt-unique version dirs closed the
#       same-batch-id clobber window; stream_mor_ingest additionally
#       pins published source-file mtimes);
#   (a) the four queries displaced from the r7 window by the late
#       xml_scan/xml_xpath registrations: hourly_anomalies,
#       incremental_neardup, interpolate_hourly, inverted_index;
#   (b) the 22 remaining r3-rows, then the first 15 r4-rows in name
#       order — after this sweep no registered query's latest driver
#       row predates r4.
PRIORITY = [
    # (c) r8-new / r8-plan-changed (rotation invariant: outrank refreshes)
    "xml_stream_ingest",  # r8: ordered multi-file ingest as a file stream
    "hybrid_retrieval_rrf_ann",  # r8: fusion's dense side on the ANN path
    "ann_recall_eval",  # r8: +hybrid_rrf_pq ranking-recall row
    "ivf_pq_probe_topk",  # r8: corpus assignment vectorized (168s -> 16s at sf10)
    "pq_codes",  # r8: sub-kmeans assign kernel block-vectorized
    "cluster_label_purity",  # r8: same kernel change via kmeans training
    "stream_mor_ingest",  # r8: pinned source mtimes + attempt-unique dirs
    "mor_changes_feed",  # r8: fixture build writes attempt-unique dirs
    "mor_scattered_fold",
    "cow_merge_changes",
    "cow_manifest_summary",
    "cow_keyrange_lookup",
    # (a) displaced from the r7 window (oldest rows in the registry, r3)
    "hourly_anomalies",
    "incremental_neardup",
    "interpolate_hourly",
    "inverted_index",
    # (b) the 22 remaining r3-rows, name order
    "ivf_list_sizes",
    "ivf_probe2_topk",
    "ivf_probe_topk",
    "kmeans_clusters",
    "multimodal_resize",
    "ngram_jaccard",
    "ntile_quartiles",
    "oov_rate",
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
    "twap_per_user",
    "udtf_sentences",
    "weighted_sample",
    # (b) oldest r4-rows, first 15 in name order
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
]
# r9 PRIORITY candidates (staleness head after the r8 sweep): the three
# r4-rows displaced from the r8 window by the late vectorization
# prepends — fk_integrity_audit, gopher_quality_flags,
# grouped_agg_pandas — then the 24
# remaining r4-rows in name order — hll_users_per_event_type,
# holt_linear_forecast, id_gap_analysis, k_anonymity_audit,
# lang_id_confusion, leakage_safe_split, multi_touch_attribution,
# pagerank_fixedpoint, part_name_near_matches, percentile_cont_prices,
# pit_feature_join, pq_codes, quality_filter_funnel,
# range_frame_daily_sum, rank_fusion, session_paths_topk,
# source_overlap, sql_yearly_priority_share, stream_exact_dedup,
# stream_tumbling_hourly, supplier_hhi, token_gini_diversity,
# weekly_churn, zorder_bucket_stats — then the oldest r5 cohort.
# Queries ADDED or PLAN-CHANGED during r8 must be PREPENDED here per
# the rotation invariant (they outrank staleness refreshes).

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
