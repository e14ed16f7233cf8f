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

# Round-12 sweep priority. After r11 the union r1∪…∪r11 (latest-wins) is
# 216/216 green with zero standing failures and no row older than r7
# (histogram r11 50 / r10 43 / r9 43 / r8 41 / r7 39). The r12 window
# retires the ENTIRE r7 staleness cohort (VERDICT r11 ask #1):
#   (a) PREPENDED per the rotation invariant: mor_rename_column and
#       mor_drop_column (r12 NEW — RENAME/DROP COLUMN via column
#       mapping: logical/physical name split, metadata-only 'x'
#       commits, zero files rewritten, retired-physical-name
#       resurrection guards on DROP);
#       then the nine table-format queries whose read/write plans
#       changed in r12 (the physical-name fold/merge/stats/CDF —
#       never-renamed tables produce identical expressions by
#       construction, but the rotation invariant treats any touched
#       plan as changed, and the adopted-column typing fix changed
#       mor_schema_evolution's recorded fee type to decimal(20,0)):
#       mor_schema_evolution, mor_schema_evolution_summary,
#       cow_merge_changes, mor_changes_feed, mor_scattered_fold,
#       stream_mor_ingest, stream_mor_tombstone_seq,
#       cow_manifest_summary, cow_keyrange_lookup;
#   (b) the FULL r7 staleness cohort, 39 rows in name order
#       (contamination_check .. xml_xpath_roundtrip), honoring
#       BENCH_NOTES' candidates head (dataset_cards,
#       contamination_check are rows 2-3 of the cohort) — 2 new + 9
#       plan-changed + 39 staleness fill the window exactly.
# After this sweep no registered query's latest driver row predates r8.
PRIORITY = [
    "mor_rename_column",
    "mor_drop_column",
    "mor_schema_evolution",
    "mor_schema_evolution_summary",
    "cow_merge_changes",
    "mor_changes_feed",
    "mor_scattered_fold",
    "stream_mor_ingest",
    "stream_mor_tombstone_seq",
    "cow_manifest_summary",
    "cow_keyrange_lookup",
    # (b) the full r7 staleness cohort, name order (39 rows)
    "contamination_check",
    "dataset_cards",
    "dedup_rate_by_source",
    "dedup_survivors",
    "distinct_counts",
    "doc_chunks",
    "domain_mixture_weights",
    "embedding_quantize",
    "event_transitions",
    "events_within_5min",
    "grouped_pandas_topk",
    "hourly_gapfill",
    "hybrid_retrieval_rrf",
    "lang_id",
    "lookup_join_nulls",
    "lsh_bucket_sizes",
    "lsh_probe_topk",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "moving_avg_customer",
    "multimodal_features",
    "multimodal_frames",
    "pandas_normalized_text",
    "percentile_disc_prices",
    "product_surrogate_keys",
    "props_k_stats",
    "rank_functions",
    "salted_user_totals",
    "simhash",
    "status_set_ops",
    "string_functions",
    "text_quality",
    "token_counts",
    "training_corpus",
    "union_all_bag",
    "value_histogram",
    "window_value_functions",
    "xml_scan_roundtrip",
    "xml_xpath_roundtrip",
]
# r13 PRIORITY candidates (staleness head after the r12 sweep): the 41
# r8-rows in name order — bigram_logprob, bloom_prefilter_stats, bpe_pair_stats,
# calendar_dim, chunk_dedup, cluster_label_purity, cms_heavy_hitters,
# conversation_assembly, dsir_weights, embedding_center,
# event_dedup_tolerance, fd_discovery, hourly_anomalies,
# incremental_neardup, interpolate_hourly, inverted_index, ivf_list_sizes,
# ivf_probe2_topk, ivf_probe_topk, kmeans_clusters, multimodal_resize,
# ngram_jaccard, ntile_quartiles, oov_rate, pq_codes, price_quantity_corr,
# quality_deciles, repetition_ratio, rolling_7d_actives, scd2_intervals,
# semdedup_candidates, sequence_packing, session_conversion,
# stratified_sample, table_diff, term_lift_pairs, tpch_q1, twap_per_user,
# udtf_sentences, weighted_sample, xml_stream_ingest — then the oldest
# r9 rows fill the window (41 r8 rows + 9 r9 rows when nothing new lands).
# Queries ADDED or PLAN-CHANGED during r12 must be PREPENDED here per
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
