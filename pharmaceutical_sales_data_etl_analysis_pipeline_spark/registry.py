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
bm25_topk_terms, term_lift_pairs, pagerank_fixedpoint,
graph_triangle_stats, neardup_components and its dependents
training_corpus/dedup_survivors/dedup_rate_by_source) and queries whose
parameters derive from the data via driver round-trips (kmeans_clusters,
semdedup_candidates, ivf_*: corpus count / seeds / centroid sums;
histogram_quantile_calibration: 3-scalar extent + 64-row histogram for
the two-phase exact-selection comparator).
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

# Round-4 sweep priority (exactly fills the 50-slot window): the 50
# registered queries with NO driver row anywhere in r1 ∪ r2 ∪ r3 —
# computed as all_queries() minus the union of CORRECTNESS_r0{1,2,3}.json
# keys (verified exactly 50 at r4 start; the r3 comment's candidate list
# matched). Zero NEW queries were added in r4, per the r3 verdict's
# zero-spare-slots contract, so after this sweep all 192 registered
# queries have a green driver row.
# Three of these plans were ALSO de-globalized this round (r3 verdict
# ask #2): histogram_quantile_calibration and id_gap_analysis are in this
# window, so their r4 rows cover the new plans. key_skew_report is NOT —
# it has an r3 row (for the old plan) and the window had zero spare
# slots; it is the one r5 re-sweep candidate (see note below PRIORITY).
# Everything r1-r3 already verified and unchanged since is protected by
# the local harness (tests/test_oracle_parity.py, same compare, sf0.001).
PRIORITY = [
    # tpch / relational / scalar tail
    "distribution_drift",
    "sql_yearly_priority_share",
    "map_functions",
    # corpus ops tail
    "rank_fusion",
    "source_overlap",
    # python UDF surface
    "grouped_agg_pandas",
    # analytic tail
    "skyline_parts",
    "zorder_bucket_stats",
    "holt_linear_forecast",
    "multi_touch_attribution",
    "weekly_churn",
    "percentile_cont_prices",
    # dedup / similarity tail
    "minhash_calibration",
    "ann_recall_eval",
    "pq_codes",
    "embedding_center",
    "part_name_near_matches",
    # textops tail
    "bpe_pair_stats",
    "lang_id_confusion",
    "token_gini_diversity",
    "bigram_logprob",
    # event-time tail
    "session_paths_topk",
    "conversation_assembly",
    "seasonal_decompose",
    "ab_test_lift",
    "event_dedup_tolerance",
    "range_frame_daily_sum",
    # clustering tail
    "cluster_label_purity",
    # warehouse maintenance tail
    "fk_integrity_audit",
    "pit_feature_join",
    "leakage_safe_split",
    "incremental_agg_maintenance",
    "fd_discovery",
    "k_anonymity_audit",
    "calendar_dim",
    "table_content_hash",
    "id_gap_analysis",
    "supplier_hhi",
    # curation
    "gopher_quality_flags",
    "chunk_dedup",
    "dsir_weights",
    "quality_filter_funnel",
    # streaming-as-query
    "stream_tumbling_hourly",
    "stream_exact_dedup",
    # sketches
    "hll_users_per_event_type",
    "cms_heavy_hitters",
    "bloom_prefilter_stats",
    "histogram_quantile_calibration",
    # graph
    "pagerank_fixedpoint",
    "graph_triangle_stats",
]

# COUNT CONTRACT (checked at r4 freeze): r1∪r2∪r3 driver rows cover 142
# distinct queries; the 50 above are exactly the complement within the
# 192 registered. After the r4 sweep every registered query will have a
# driver row, so the r5 window is free for (a) re-sweeping any plan that
# changes and (b) new queries, in that priority order.
#
# r5 PRIORITY candidates (plans changed in r4 but NOT in this window —
# they have older driver rows; local harness re-verified the new plans
# at sf0.001 AND sf0.01 this round):
#   key_skew_report (tpch.py — percentiles via distrank.with_global_rank
#   instead of unpartitioned windows; r3 row covers the old plan).
# NOT needing re-sweep despite source edits: the pin() call sites
# (basket_affinity, bm25_topk_terms, term_lift_pairs, pagerank_fixedpoint,
# neardup_components + dependents) — default mode is byte-identical
# localCheckpoint, so the executed plan is unchanged; table_content_hash —
# _HASH_COLS now derives from catalog.SCHEMAS but the derived list is
# identical, so both engines' SQL/plan are unchanged.


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
