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

# Round-6 sweep priority. After r5 the union r1∪…∪r5 (latest-wins) is
# 196/196 green with zero standing failures, so the r6 window clears
# the one enumerated debt class and spends the rest on staleness:
#   (a) the 27 queries whose EXECUTED PLAN changed late in r5, after
#       the r5 sweep window was fixed — the conversion-exact
#       integer-units sum landed in the shared money helpers
#       (functions/numeric.money_sum, eventsops/analytic _vsum,
#       tpch._exact_sum), changing every consumer's physical plan.
#       All were locally hash-verified at sf0.001/sf0.01 AND sf1, but
#       the bar is a green driver row per executed plan (the r4
#       key_skew_report precedent, ×27);
#   (c) PREPENDED per the rotation invariant: the queries r6 itself
#       added or plan-changed — the two new streaming entries, and the
#       four near-dup queries whose index parameters became
#       corpus-derived (embedding_near_dups' ORACLE text changed too:
#       it now re-derives kbits/ntables/masks from count(*));
#   (b) the remaining 17 slots refresh the OLDEST driver rows: of the
#       28 queries whose newest row still dates from r1, the first 17
#       in name order. The 11 left over (minhash_signatures,
#       moving_avg_customer, multimodal_frames, product_surrogate_keys,
#       props_k_stats, simhash, status_set_ops, text_quality,
#       token_counts, union_all_bag, value_histogram) are the r7
#       refresh head — record them in the r7 candidates note below.
PRIORITY = [
    # (c) r6-new / r6-plan-changed (rotation invariant: outrank refreshes)
    "mor_scattered_fold",  # r6: merge-on-read delta append + sequenced fold read
    "cow_manifest_summary",  # r6: manifest-only aggregates from zone-map stats
    "cow_keyrange_lookup",  # r6: zone-map-pruned key-range scan
    "cow_merge_changes",  # r6: CoW MERGE change-data-feed (tombstones + prune)
    "graph_triangle_stats",  # r6: join strategy now derived from pair bound
    "tfidf_topk_terms",  # r6: tf pinned (kills Catalyst's duplicate df chain)
    "stream_click_attribution",
    "stream_dedup_within_watermark",
    "embedding_near_dups",
    "embedding_near_dups_planted",
    "simhash_near_dups",
    "simhash_near_dups_planted",
    # (a) exact-sum plan-changed late in r5 (registry walk, see above)
    "cube_sales",
    "pivot_status_year",
    "conditional_aggregates",
    "grouping_sets_sales",
    "unpivot_status_year",
    "product_facts",
    "product_facts_sql",
    "rep_facts",
    "quarterly_totals",
    "filter_conjunction",
    "top1_product",
    "top5_rep_years",
    "key_repair_join",
    "rollup_year_quarter",
    "top3_parts_per_brand",
    "tumbling_hourly",
    "sliding_hourly",
    "session_stats",
    "top5_users_by_value",
    "seasonal_decompose",
    "ab_test_lift",
    "merge_upsert",
    "ohlc_bars",
    "rfm_segments",
    "incremental_agg_maintenance",
    "table_content_hash",
    "minhash_calibration",
    # (b) oldest driver rows (latest row r1), first 23 in name order
    "binary_envelope",
    "corpus_counts",
    "cosine_topk",
    "customers_with_orders",
    "customers_without_orders",
    "date_parse_roundtrip",
    "exact_dedup",
    "fingerprints",
    "first_order_per_customer",
    "full_outer_reconciliation",
    "funnel_signup_view_purchase",
    # lsh_probe_topk and minhash_lsh_candidates were slots 49-50 until
    # the graph_triangle_stats (derived join strategy) and
    # tfidf_topk_terms (pinned tf) r6 plan changes claimed (c) slots per
    # the rotation invariant; lsh_bucket_sizes was slot 50 until the
    # late-r6 cow_merge_changes registration claimed it; lang_id,
    # lookup_join_nulls and hourly_gapfill held the last three slots
    # until the zone-map (cow_manifest_summary, cow_keyrange_lookup) and
    # merge-on-read (mor_scattered_fold) registrations claimed them. All
    # move to the r7 refresh head below.
]
# r7 PRIORITY candidates (staleness head after the r6 sweep):
# hourly_gapfill, lang_id, lookup_join_nulls, lsh_bucket_sizes,
# lsh_probe_topk and minhash_lsh_candidates (displaced from the r6
# window by the cow_merge_changes/cow_manifest_summary/
# cow_keyrange_lookup/mor_scattered_fold registrations and the
# graph_triangle_stats/tfidf_topk_terms plan changes), then the 11
# r1-rows that did not fit the r6 window — minhash_signatures,
# moving_avg_customer, multimodal_frames, product_surrogate_keys,
# props_k_stats, simhash, status_set_ops, text_quality, token_counts,
# union_all_bag, value_histogram — then the r2-row cohort
# (asof_purchase_before_click, contamination_check, dedup_survivors,
# distinct_counts, events_within_5min, …).
# Queries ADDED or PLAN-CHANGED during r6 must be PREPENDED here per
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
