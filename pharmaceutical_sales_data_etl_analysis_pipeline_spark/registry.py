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
bm25_topk_terms, hybrid_retrieval_rrf, term_lift_pairs, pagerank_fixedpoint,
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
r6 sf10 rung).
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

# Round-7 sweep priority. After r6 the union r1∪…∪r6 (latest-wins) is
# 202/202 green with zero standing failures, so the r7 window is pure
# freshness plus the rotation-invariant prepends:
#   (c) PREPENDED: r7's one new query (stream_mor_ingest) and the four
#       table-format queries whose executed/build plans changed in r7
#       (the decimal-overflow guard entered the MoR fold and the CoW
#       merge write; the shared state fixture became memoized);
#   (a) the six queries displaced from the r6 window by r6's own late
#       registrations/plan changes (enumerated in the r6 candidates
#       note): hourly_gapfill, lang_id, lookup_join_nulls,
#       lsh_bucket_sizes, lsh_probe_topk, minhash_lsh_candidates;
#   (b) the 11 remaining r1-rows, then the whole 14-query r2 cohort,
#       then the first 14 r3-rows in name order — after this sweep no
#       registered query's latest driver row predates r3.
PRIORITY = [
    # (c) r7-new / r7-plan-changed (rotation invariant: outrank refreshes)
    "xml_scan_roundtrip",  # r7: S1-S3 driver-verified (native XML shred)
    "xml_xpath_roundtrip",  # r7: S4 driver-verified (fallback reader)
    "stream_mor_ingest",  # r7: streaming MoR ingest (readStream -> delta appends -> fold)
    "mor_changes_feed",  # r7: MoR-aware CDF (delta-era side folds pending deltas)
    "hybrid_retrieval_rrf",  # r7: BM25 posting join + cosine, RRF-fused
    "mor_scattered_fold",  # r7: read fold gained the overflow-vs-tombstone guard
    "cow_merge_changes",  # r7: merge write plan gained the guard; fixture memoized
    "cow_manifest_summary",
    "cow_keyrange_lookup",
    # (a) displaced from the r6 window (oldest rows in the registry, r1)
    "hourly_gapfill",
    "lang_id",
    "lookup_join_nulls",
    "lsh_bucket_sizes",
    "lsh_probe_topk",
    "minhash_lsh_candidates",
    # (b) the 11 remaining r1-rows, name order
    "minhash_signatures",
    "moving_avg_customer",
    "multimodal_frames",
    "product_surrogate_keys",
    "props_k_stats",
    "simhash",
    "status_set_ops",
    "text_quality",
    "token_counts",
    "union_all_bag",
    "value_histogram",
    # (b) the full r2 cohort, name order
    "asof_purchase_before_click",
    "contamination_check",
    "dedup_survivors",
    "distinct_counts",
    "events_within_5min",
    "grouped_pandas_topk",
    "multimodal_features",
    "pandas_normalized_text",
    "percentile_disc_prices",
    "rank_functions",
    "salted_user_totals",
    "string_functions",
    "training_corpus",
    "window_value_functions",
    # (b) oldest r3-rows, first 14 in name order
    "activity_heatmap",
    "basket_affinity",
    "bm25_topk_terms",
    "cohort_retention",
    "dataset_cards",
    "dedup_rate_by_source",
    "doc_chunks",
    "domain_mixture_weights",
    "embedding_quantize",
    "event_transitions",
]
# r8 PRIORITY candidates (staleness head after the r7 sweep):
# hourly_anomalies, incremental_neardup, interpolate_hourly and
# inverted_index (displaced from the r7 window
# by the late xml_scan_roundtrip/xml_xpath_roundtrip registrations),
# then the 22 remaining r3-rows in name order — ivf_list_sizes, ivf_probe2_topk,
# ivf_probe_topk, kmeans_clusters, multimodal_resize, ngram_jaccard,
# ntile_quartiles, oov_rate, price_quantity_corr, quality_deciles,
# repetition_ratio, rolling_7d_actives, scd2_intervals,
# semdedup_candidates, sequence_packing, session_conversion,
# stratified_sample, table_diff, term_lift_pairs, twap_per_user,
# udtf_sentences, weighted_sample — then the oldest r4 cohort.
# Queries ADDED or PLAN-CHANGED during r7 must be PREPENDED here per
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
