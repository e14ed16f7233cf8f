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
intermediate across branches via localCheckpoint (basket_affinity,
bm25_topk_terms, term_lift_pairs, neardup_components and its dependents
training_corpus/dedup_survivors/dedup_rate_by_source) and queries whose
parameters derive from the data via driver round-trips (kmeans_clusters,
semdedup_candidates, ivf_*: corpus count / seeds / centroid sums).
Checkpointed intermediates live in executor-local storage: plan-only
consumers pay the compute, and a lost executor invalidates the blocks —
at cluster scale prefer persisting such intermediates to a table.
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

# Round-3 sweep priority (exactly fills the 50-slot window):
# - the 45 queries with no driver row in r1 OR r2 (everything added after
#   the r2 PRIORITY freeze — the registry.py:112-125 list the r2 comment
#   named),
# - the 5 whose plans changed this round: simhash_near_dups /
#   embedding_near_dups / ngram_jaccard (subset caps lifted, Arrow
#   verify), ivf_probe_topk / ivf_list_sizes (learned k-means centroids).
#   kmeans_clusters / semdedup_candidates / rfm_segments /
#   embedding_quantize / ivf_probe2_topk also changed but already sit in
#   the never-swept 45.
# Everything r1/r2 already verified and unchanged since is protected by
# the local harness (tests/test_oracle_parity.py, same compare, sf0.001).
PRIORITY = [
    # never-swept: tpch tail
    "tpch_q17",
    "tpch_q21",
    "tpch_q2",
    "tpch_q9",
    "tpch_q20",
    # never-swept: corpus ops
    "repetition_ratio",
    "domain_mixture_weights",
    "sequence_packing",
    "quality_deciles",
    "incremental_neardup",
    "oov_rate",
    "dataset_cards",
    "inverted_index",
    "bm25_topk_terms",
    "term_lift_pairs",
    "weighted_sample",
    "dedup_rate_by_source",
    # never-swept: clustering / similarity
    "kmeans_clusters",
    "semdedup_candidates",
    "embedding_quantize",
    "ivf_probe2_topk",
    # never-swept: multimodal / python surface
    "multimodal_resize",
    "udtf_sentences",
    # never-swept: warehouse maintenance
    "merge_upsert",
    "scd2_intervals",
    "cohort_retention",
    "ohlc_bars",
    "stratified_sample",
    "doc_chunks",
    "table_diff",
    "rfm_segments",
    "basket_affinity",
    # never-swept: event-time tail
    "rolling_7d_actives",
    "twap_per_user",
    "interpolate_hourly",
    "event_transitions",
    "activity_heatmap",
    "hourly_anomalies",
    "session_conversion",
    # never-swept: analytic/scalar tail
    "unpivot_status_year",
    "ntile_quartiles",
    "array_functions",
    "variant_props",
    "price_quantity_corr",
    "key_skew_report",
    # changed plans this round (had r1/r2 rows; need fresh ones)
    "simhash_near_dups",
    "embedding_near_dups",
    "ngram_jaccard",
    "ivf_probe_topk",
    "ivf_list_sizes",
]

# r4 PRIORITY candidates (added late in r3, no driver row yet — rotate
# these in next round, plus any plan changed after this freeze).
# COUNT CONTRACT (checked end-of-r3): exactly 50 registered queries have
# no r1/r2 row and are not in this round's PRIORITY — the r4 window fits
# them EXACTLY (97 r1/r2-verified + 45 newly-verified-in-r3 + these 50 =
# all 192). Query additions in r4 should be balanced against re-sweep
# needs, since the window has zero spare slots. The list:
#   gopher_quality_flags, chunk_dedup, dsir_weights, quality_filter_funnel
#   (curation.py); ann_recall_eval, pq_codes (similarity.py);
#   minhash_calibration (dedup.py); stream_tumbling_hourly (streamingq.py);
#   hll_users_per_event_type, cms_heavy_hitters, bloom_prefilter_stats
#   (sketches.py); pagerank_fixedpoint (graphops.py); skyline_parts,
#   zorder_bucket_stats (analytic.py); fk_integrity_audit,
#   pit_feature_join, leakage_safe_split (warehouse.py);
#   cluster_label_purity (clustering.py); session_paths_topk,
#   conversation_assembly (eventsops.py); holt_linear_forecast (analytic.py);
#   incremental_agg_maintenance, fd_discovery (warehouse.py);
#   grouped_agg_pandas (pythonudf.py); bpe_pair_stats (textops.py);
#   embedding_center (similarity.py); graph_triangle_stats (graphops.py);
#   seasonal_decompose (eventsops.py); k_anonymity_audit, calendar_dim
#   (warehouse.py); rank_fusion, source_overlap (corpusops.py);
#   stream_exact_dedup (streamingq.py); distribution_drift (tpch.py);
#   lang_id_confusion, token_gini_diversity (textops.py); ab_test_lift,
#   event_dedup_tolerance, range_frame_daily_sum
#   (eventsops.py); table_content_hash, id_gap_analysis, supplier_hhi
#   (warehouse.py); histogram_quantile_calibration (sketches.py);
#   multi_touch_attribution, weekly_churn, percentile_cont_prices (analytic.py);
#   sql_yearly_priority_share (relational.py); map_functions (scalarfuncs.py);
#   kmeans_clusters / semdedup_candidates / ivf_* also
#   changed plans in r3 AFTER the sweep freeze (Arrow _assign) — they are
#   in this round's PRIORITY already, so their r3 rows cover the new plan.


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
