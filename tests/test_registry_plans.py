"""Registry-wide physical-plan audit: the scale anti-pattern gate.

Every oracle-backed query in ``__spark_entry__.queries()`` is BUILT
(not executed) at sf0.001 and its physical plan is scanned for the
anti-patterns that kill 100 TB runs:

- ``CartesianProduct`` — never acceptable anywhere;
- ``BroadcastNestedLoopJoin`` — acceptable ONLY for the documented
  1-row broadcast-scalar crossJoins (total count / corpus mean /
  dangling mass / threshold tables), which are allowlisted BY QUERY
  with the reason inline.

Queries that eagerly execute jobs at build time (streaming replays,
index builds, iterative loops, driver-sampled quadtree) are skipped —
their plan discipline is asserted by their own dedicated tests — as
plan construction here must stay cheap enough to sweep the registry.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

#: queries whose CONSTRUCTION runs Spark jobs or writes state — their
#: plans are audited in their own test modules instead
SKIP_EAGER = {
    "streaming_dedup_replay",
    "streaming_skyline_replay",
    "streaming_interval_join_replay",
    "streaming_near_dup_replay",
    "streaming_session_replay",
    "streaming_enrich_replay",
    "streaming_rollup_replay",
    "streaming_moments_replay",
    "streaming_drift_replay",
    "ann_ivf_topk",  # builds/persists the IVF index
    "bm25_index_search_documents",  # builds/persists the inverted index
    "ann_recall_ivf",
    "kmeans_embeddings",  # iterative: collects k*d centroid rows per iter
    "kmeans_blobs_check",
    "bpe_merges_check",  # iterative: one TakeOrdered collect per merge
    "pagerank_dup_graph",  # iterative: localCheckpoint per round
    "pagerank_cycle_check",
    "dedup_star_clusters",  # fixed-point loop materializes per round
    "entity_resolution_partnames",  # star-CC fixed-point composition
    "decontaminate_fuzzy_documents",  # eager signature materialization
    "semantic_dedup_embeddings",
    "dedup_clusters_documents",
    "skyline_quadtree",  # driver-side sample -> broadcast tree
    "skyline_gsod_9dim",  # writes the fixed-width fixture file
    "jsonl_roundtrip_documents",  # writes the roundtrip file
    "knn_graph_sample",  # counts the corpus to size blocks
    "skyline_kband_events",  # phase-1 count chooses the phase-2 path
    "reverse_skyline_part",  # two-phase driver-coordinated
    "dynamic_skyline_part",
    "abc_parts",  # distributed prefix sum: collects #partitions-row offsets
    "percentile_ranks_lineitem",  # same prefix-sum shape (plan asserted
    # in tests/test_stats.py::test_percentile_ranks_no_global_window...)
    "bloom_semi_join_orders",  # builds the bitmap (bounded word collect);
    # its 1-row bitmap BNLJ + no-UDF plan discipline is asserted in
    # tests/test_bloom.py
    "embedding_near_dup",  # reads dim from first()
    "ann_lsh_topk",  # driver-side probe-set computation reads dim
    "ann_recall_lsh",
    "topk_similarity",  # query vector via first()
    "topk_batch_similarity",  # query batch collected by contract
    "mix_corpus_sources",  # proportions probe
    "bfs_hops_copurchase",  # iterative: localCheckpoint + isEmpty per level
    "shortest_paths_copurchase",  # iterative Bellman-Ford rounds
    "leakage_safe_split_documents",  # hash-min component fixed point
    "auc_purchase_events",  # prefix-sum offsets collect (percentile_ranks shape)
    "pca_invariant_check",  # dim^2-bounded covariance collect + driver eigh
    "ntile_buckets_lineitem",  # prefix-sum offsets collect
    "vocab_budget_documents",  # prefix-sum offsets collect
    "sorted_neighborhood_parts",  # prefix-sum offsets collect
    "balanced_shards_documents",  # prefix-sum offsets collect
    "ks_test_events",  # two-measure prefix-sum offsets collect
}

#: BroadcastNestedLoopJoin allowlist: every entry is a 1-row (or
#: k-row bounded) broadcast scalar join — the documented pattern for
#: riding a global aggregate along a lazy plan without an eager count
BNLJ_OK = {
    "heavy_hitters_tokens",  # 1-row total-count frame (sketches.py)
    "above_avg_orders",  # 1-row global mean
    "q11_important_brands",  # 1-row scalar-subquery threshold
    "q15_top_supplier",  # 1-row max-revenue CTE
    "unigram_logprob_documents",  # 1-row corpus-total frame
    "bigram_logprob_documents",  # 1-row vocabulary-size frame
    "repetition_stats_documents",  # 1-row total
    "equidepth_histogram_events",  # 1-row percentile-bounds frame
    "approx_distinct_check",  # tiny per-group sketch frame join
    "q22_sales_opportunity",  # 1-row above-mean threshold
    "funnel_users",  # step-count scalar
    "term_doc_freq_topk",  # 1-row doc-count
    "mix_corpus_sources",  # broadcast threshold table
    "temperature_mix_documents",  # 1-row scale-stratum (nm, wm) frame
    "q8_market_share",  # 1-row denominator
    "q14_promo_revenue",  # 1-row ratio denominators
    "bm25_search_documents",  # 1-row (n_docs, total_tokens) corpus frame
    "pmi_collocations_documents",  # 1-row total-bigrams frame
    "clustering_coefficient_copurchase",  # 1-row wedge-count frame
    "frequent_pairs_orders",  # 1-row basket-count frame
    "tfidf_keywords_documents",  # 1-row corpus-size (n_docs) frame
    "distribution_drift_orders",  # 1-row (total_base, total_cur) frame
    "mutual_information_events",  # 1-row (N, n_cells) total frame
    "vocab_growth_documents",  # 1-row max-doc-id checkpoint frame
    "skew_report_events",  # 1-row moments x 1-row top-k scalar join
    "rfm_segments_customers",  # 1-row customer-count (N) frame
    "kmv_overlap_check",  # per-type sketch-row theta self-join (5 rows)
    "kmv_setops_check",  # same 5-row sketch-frame theta self-join
    "class_scatter_embeddings",  # 1-row total-count (N) frame
    "rrf_fusion_documents",  # 1-row corpus frame (the bm25_topk scalar)
    # NOT a scalar join: ngram_jaccard_pairs is the repo's DECLARED
    # brute-force all-pairs baseline (the exactness twin of the
    # minhash/setsim sublinear paths — see COVERAGE.md); its nested
    # loop is the point of the operator, not an accident
    "ngram_jaccard_documents",
    "chi2_events",  # 1-row grand-total (N) frame
    "benford_orders",  # 1-row digit-total (N) frame
    "referential_integrity_check",  # 1-row orphan-count scalar frames
    "seasonality_orders",  # 1-row grand-total frame
    "seasonality_month_orders",  # same 1-row grand-total frame (month path)
    "leadlag_corr_events",  # 2L+1 unioned 1-row moment frames
    "transition_entropy_events",  # 1-row totals frame + sorted fold
    # bounded anchor-slate theta-join (label-inequality predicate over
    # a |query_ids|-row broadcast — the documented hard-negative shape;
    # the corpus side streams map-side, vectors never shuffle)
    "hard_negatives_embeddings",
    "ndcg_bm25_documents",  # 1-row DCG x 1-row IDCG scalar cross join
    "hard_positives_embeddings",  # same bounded anchor-slate theta-join
    # r16 split-aggregate ANALYZE: the exact-NDV pass crossJoins its
    # 1-row frame onto the 1-row plain-stats frame (keeps the
    # multi-distinct Expand off the 3|cols| plain aggregates — 3.2x)
    "analyze_orders",
    "analyze_approx_check",
}


def _all_query_names():
    qs = entrymod.queries()
    return [n for n in qs if n not in SKIP_EAGER]


@pytest.mark.parametrize("name", _all_query_names())
def test_no_scale_killers_in_plan(spark, name):
    qs = entrymod.queries()
    df = qs[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unexpected nested-loop join — if this is a new "
            "1-row broadcast scalar, allowlist it with its reason"
        )
