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

# Round-10 sweep priority. After r9 the union r1∪…∪r9 (latest-wins) is
# 211/211 green with zero standing failures and no row older than r5.
# The r10 window retires the ENTIRE r5 staleness cohort (VERDICT ask #1):
#   (c) PREPENDED per the rotation invariant: stream_session_expiry
#       (r10 NEW — gap sessionization through applyInPandasWithState
#       under GroupStateTimeout.ProcessingTimeTimeout, the state-expiry
#       surface); then the seven table-format queries whose write/commit
#       paths changed in r10 (sequenced-writer fence + writer_id in
#       manifests on both write paths; ambiguous-outcome reconciliation
#       around the manifest publish): stream_mor_tombstone_seq,
#       stream_mor_ingest, mor_changes_feed, mor_scattered_fold,
#       cow_merge_changes, cow_manifest_summary, cow_keyrange_lookup;
#   (a) the 4 r5-rows that ceded their r9 slots: null_handling,
#       pii_scrub, profile_orders, regexp_extract_parts;
#   (b) the 26 remaining r5-rows in name order — the full TPC-H block
#       plus shard_histogram, skyline_parts, substring_dedup_spans,
#       variant_props, vocab_topk;
#   (d) the oldest r6 cohort in name order (11 make the 50-window
#       after the second r10-new prepend; exact_dedup heads r11).
# After this sweep no registered query's latest driver row predates r6.
PRIORITY = [
    # (c) r10-new / r10-plan-changed (rotation invariant)
    "stream_session_event_expiry",  # r10 NEW: watermark-driven expiry
    "stream_session_expiry",  # r10 NEW: stateful expiry surface
    "stream_mor_tombstone_seq",  # r10: seq-writer fence in append path
    "stream_mor_ingest",  # r10: checkpoint-derived writer lease
    "mor_changes_feed",
    "mor_scattered_fold",
    "cow_merge_changes",
    "cow_manifest_summary",
    "cow_keyrange_lookup",
    # (a) the 4 ceded r5-rows
    "null_handling",
    "pii_scrub",
    "profile_orders",
    "regexp_extract_parts",
    # (b) the 26 remaining r5-rows, name order
    "shard_histogram",
    "skyline_parts",
    "substring_dedup_spans",
    "tpch_q10",
    "tpch_q11",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q2",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "variant_props",
    "vocab_topk",
    # (d) the oldest r6 cohort, name order (12 slots)
    "ab_test_lift",
    "binary_envelope",
    "conditional_aggregates",
    "corpus_counts",
    "cosine_topk",
    "cube_sales",
    "customers_with_orders",
    "customers_without_orders",
    "date_parse_roundtrip",
    "embedding_near_dups",
    "embedding_near_dups_planted",
]
# r11 PRIORITY candidates (staleness head after the r10 sweep): the 34
# remaining r6-rows in name order — filter_conjunction, fingerprints,
# first_order_per_customer, full_outer_reconciliation,
# funnel_signup_view_purchase, graph_triangle_stats, grouping_sets_sales,
# incremental_agg_maintenance, key_repair_join, merge_upsert,
# minhash_calibration, ohlc_bars, pivot_status_year, product_facts,
# product_facts_sql, quarterly_totals, rep_facts, rfm_segments,
# rollup_year_quarter, seasonal_decompose, session_stats,
# simhash_near_dups, simhash_near_dups_planted, sliding_hourly,
# stream_click_attribution, stream_dedup_within_watermark,
# table_content_hash, tfidf_topk_terms, top1_product,
# top3_parts_per_brand, top5_rep_years, top5_users_by_value,
# tumbling_hourly, unpivot_status_year — then the oldest r7 cohort.
# Queries ADDED or PLAN-CHANGED during r10 must be PREPENDED here per
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
