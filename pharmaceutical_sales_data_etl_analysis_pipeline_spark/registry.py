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
is cheaper than a corpus hash).
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

# Round-9 sweep priority. After r8 the union r1∪…∪r8 (latest-wins) is
# 209/209 green with zero standing failures and no row older than r4,
# so the r9 window is the rotation-invariant prepends plus the
# staleness ladder:
#   (c) PREPENDED: r9's new queries (stream_stateful_user_totals —
#       the applyInPandasWithState surface, int-cents state across three
#       pinned micro-batches; stream_mor_tombstone_seq — the
#       sequenced-CDC contract: tombstones batch-grouping-invariant
#       under uncontrolled multi-file micro-batch boundaries); the
#       three ANN queries whose PLANS changed (the IVF-PQ exact-rerank
#       budget now scales with nprobe — the r9 recall rung measured the
#       fixed window being crowded by ADC candidates); and the six
#       table-format queries whose build/write/commit paths changed
#       (r9: arbiter same-name CAS rule, seq-monotone guard + max_seq
#       high-water mark in both write paths, listener-based ingest
#       progress);
#   (a) the three queries displaced from the r8 window by the late
#       vectorization prepends: fk_integrity_audit,
#       gopher_quality_flags, grouped_agg_pandas;
#   (b) the 23 remaining r4-rows, then the first 13 r5-rows in name
#       order — after this sweep no registered query's latest driver
#       row predates r5 (null_handling, pii_scrub, profile_orders,
#       regexp_extract_parts cede their slots to the prepends and
#       head the r10 list).
PRIORITY = [
    # (c) r9-new / r9-plan-changed (rotation invariant)
    "stream_stateful_user_totals",  # r9 NEW: applyInPandasWithState surface
    "stream_mor_tombstone_seq",  # r9 NEW: sequenced tombstone CDC stream
    "ivf_pq_probe_topk",  # r9: rerank budget now scales with nprobe
    "ann_recall_eval",  # r9: ivf_pq/hybrid rows inherit the scaled budget
    "hybrid_retrieval_rrf_ann",  # r9: dense side inherits it too
    "stream_mor_ingest",  # r9: listener progress + seq guard in append path
    "mor_changes_feed",
    "mor_scattered_fold",
    "cow_merge_changes",
    "cow_manifest_summary",
    "cow_keyrange_lookup",
    # (a) displaced from the r8 window (r4 rows)
    "fk_integrity_audit",
    "gopher_quality_flags",
    "grouped_agg_pandas",
    # (b) the 23 remaining r4-rows, name order
    "hll_users_per_event_type",
    "holt_linear_forecast",
    "id_gap_analysis",
    "k_anonymity_audit",
    "lang_id_confusion",
    "leakage_safe_split",
    "multi_touch_attribution",
    "pagerank_fixedpoint",
    "part_name_near_matches",
    "percentile_cont_prices",
    "pit_feature_join",
    "quality_filter_funnel",
    "range_frame_daily_sum",
    "rank_fusion",
    "session_paths_topk",
    "source_overlap",
    "sql_yearly_priority_share",
    "stream_exact_dedup",
    "stream_tumbling_hourly",
    "supplier_hhi",
    "token_gini_diversity",
    "weekly_churn",
    "zorder_bucket_stats",
    # then the first 13 r5-rows, name order (slots ceded to the r9-new
    # and scaled-rerank prepends above)
    "array_agg_per_brand",
    "array_functions",
    "cheapest_supplier_per_part",
    "date_arithmetic",
    "deterministic_sample",
    "distribution_drift",
    "explode_roundtrip",
    "histogram_quantile_calibration",
    "json_extract_props",
    "key_skew_report",
    "map_functions",
    "math_functions",
    "neardup_components",
]
# r10 PRIORITY candidates (staleness head after the r9 sweep):
# null_handling, pii_scrub, profile_orders, regexp_extract_parts (r5-rows
# ceded to the r9 prepends), then the 26
# remaining r5-rows in name order — shard_histogram, skyline_parts,
# substring_dedup_spans, tpch_q10, tpch_q11, tpch_q12, tpch_q13,
# tpch_q14, tpch_q15, tpch_q16, tpch_q17, tpch_q18, tpch_q19, tpch_q2,
# tpch_q20, tpch_q21, tpch_q22, tpch_q3, tpch_q4, tpch_q5, tpch_q6,
# tpch_q7, tpch_q8, tpch_q9, variant_props, vocab_topk — then the
# oldest r6 cohort in name order.
# Queries ADDED or PLAN-CHANGED during r9 must be PREPENDED here per
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
