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
]

# Round-2 sweep priority:
# - the 28 queries with no driver row in CORRECTNESS_r01.json
#   (registry positions 51-78 last round),
# - the 3 whose plans/oracles changed this round
#   (simhash_near_dups, embedding_near_dups, multimodal_features),
# - every query added this round (tpch_q7..q22, corpus ops).
PRIORITY = [
    # new this round (no row ever)
    "tpch_q7",
    "tpch_q8",
    "tpch_q10",
    "tpch_q11",
    "tpch_q12",
    "tpch_q14",
    "tpch_q16",
    "tpch_q19",
    "tpch_q22",
    # r1-unswept: tpch
    "tpch_q1",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q18",
    "cheapest_supplier_per_part",
    "profile_orders",
    # r1-unswept: scalarfuncs
    "json_extract_props",
    "date_arithmetic",
    "null_handling",
    "regexp_extract_parts",
    "array_agg_per_brand",
    "explode_roundtrip",
    # r1-unswept: corpusops
    "pii_scrub",
    "deterministic_sample",
    "shard_histogram",
    "neardup_components",
    # r1-unswept: pythonudf
    "pandas_normalized_text",
    "grouped_pandas_topk",
    # r1-unswept: analytic tail
    "rank_functions",
    "asof_purchase_before_click",
    "events_within_5min",
    "percentile_disc_prices",
    "salted_user_totals",
    "distinct_counts",
    "conditional_aggregates",
    "string_functions",
    # changed plans/oracles this round
    "simhash_near_dups",
    "embedding_near_dups",
    "multimodal_features",
    # new corpus-prep ops this round
    "vocab_topk",
    "tfidf_topk_terms",
    "dedup_survivors",
    "training_corpus",
    "contamination_check",
    # new analytic/scalar surface this round
    "math_functions",
    "window_value_functions",
    "grouping_sets_sales",
]
# NOT in PRIORITY (window is at 48/50; tpch_q13/q15 fill slots 49-50 via
# module order): tpch_q17/q21/q2/q9/q20, repetition_ratio,
# domain_mixture_weights, sequence_packing, quality_deciles,
# multimodal_resize, incremental_neardup, kmeans_clusters,
# semdedup_candidates, and the warehouse module (merge_upsert,
# scd2_intervals, cohort_retention, ohlc_bars, stratified_sample,
# doc_chunks), udtf_sentences, rolling_7d_actives, twap_per_user,
# oov_rate, unpivot_status_year, ntile_quartiles, array_functions,
# dataset_cards, inverted_index, interpolate_hourly, embedding_quantize,
# table_diff, bm25_topk_terms, event_transitions, activity_heatmap,
# hourly_anomalies, price_quantity_corr, weighted_sample,
# term_lift_pairs, variant_props, session_conversion, key_skew_report, ivf_probe2_topk, dedup_rate_by_source, rfm_segments, basket_affinity —
# added late in r2, pass-local this round; rotate into
# PRIORITY for the r3 sweep.


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
