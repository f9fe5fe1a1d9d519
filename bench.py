"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timings are median-of-3 wall-clock per headline query, MIN-of-3 with
the [lo, mid, hi] spread recorded for extras (the plan is
deterministic, contention only adds time — r10's setsim benched 15.4s
at 1x vs its own 3.97s 10x probe run, a pure measurement race), and
best-of-2 for the 10x/30x scale probes (replica runs are expensive);
session startup is excluded. Any extra still slower than its own 10x
probe time after a warm re-measure is re-measured once more in a
FRESH process (--measure-single); only if inverted even then does it
land in measurement_inversions — an inversion is a measurement bug by
definition, never a plan fact. The same fresh-session rule gates the
30x probe tier: a 30x/10x ratio breaching its pre-declared band
(PROBE30_RATIO_BANDS) triggers a fresh-process re-measure of both
tiers, recorded side-by-side in band_breaches.

Output protocol (the round driver keeps only a ~2 KB tail of stdout,
which silently truncated the r6 record): the FULL detail blob — extra
queries, scale probe, errors — is written to BENCH_DETAIL.json and
printed first; the LAST line printed is a compact (<1.5 KB) JSON
summary with the headline total, guaranteed to fit in the tail.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from skylinemapreducehadoop_spark.session import get_session

BENCH_QUERIES = [
    "skyline_twophase",
    "skyline_quadtree",
    "skyline_gsod_volume",
    "skyline_grouped",
    "profile_lineitem",
    "q1_pricing_summary",
    "join_nation_revenue",
    "window_top2_orders",
    "events_hourly",
    "text_stats_documents",
    "dedup_minhash_documents",
    "dedup_simhash_documents",
    "topk_similarity",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q18_large_orders",
    "above_avg_orders",
    "token_bpe_documents",
    "asof_join_events",
    "sessionize_events",
    "curate_corpus",
]

# Scale probe: the same operators at 10x replicated data, so scaling
# regressions (like the r5 minhash compile-time-broadcast OOM the probe
# caught) land in the driver's BENCH artifact instead of prose.
# Best-of-2 per query (a cold 10x run measures Python-worker spawn and
# page-cache fill — twophase: 10.6s cold vs 0.5s warm — not scaling);
# disable with SPARK_GRAFT_SCALE_PROBE=0, run alone with --scale-probe.
PROBE_QUERIES = [
    "skyline_twophase",
    "skyline_quadtree",
    "dedup_minhash_documents",
    "token_entropy_documents",
    "segment_dedup_documents",
    "segment_dedup_shifted",  # CDC mode: per-doc window at 10x (r7)
    "heavy_hitters_tokens",
    "setsim_join_documents",
    "bigram_logprob_documents",  # corpus-wide bigram aggs at 10x (r7)
    # iterative fixed-point family at 10x (r8): replicated docs plant
    # ~n_rep^2 more dup pairs, so the star-CC rounds and the per-iter
    # PageRank shuffles both see a genuinely denser graph
    "dedup_star_clusters",
    "pagerank_dup_graph",
    # r9: the r8 graph/retrieval/BPE families — the O(m^1.5) wedge
    # closure, basket pair mining and the corpus-sized tokenizer pass
    # are exactly the shapes whose constants only show at volume
    # (replicated lineitem densifies each order's basket 10x, so the
    # co-purchase pair fan-out grows ~100x — deliberately adversarial)
    "triangle_count_copurchase",
    "clustering_coefficient_copurchase",
    "frequent_pairs_orders",
    "bpe_train_documents",
    "bm25_search_documents",  # direct path = the index BUILD's corpus shape
    "bm25_index_search_documents",  # partition-pruned probe path
    # r9 document-pipeline additions: replicated docs make EVERY
    # document fully duplicated, so duplicate_spans sees total span
    # coverage and incremental_dedup sees a worst-case all-dup batch
    "duplicate_spans_documents",
    "incremental_dedup_documents",
    "tfidf_keywords_documents",
    # events now replicated too (re-keyed event_id, timestamps kept):
    # 10x denser per-type interval overlap for the sweep line, 10x
    # longer per-user sequences for the session window
    "max_concurrency_events",
    "sessionize_events",
    # r10: the late-r9 families whose constants only show at volume
    # (the r9 verdict's probe list): the distinct-hash shuffle of the
    # KMV sketch columns, the |cols|x expand of exact ANALYZE, the
    # sort-based exact-percentile state of the MAD fence, the gram
    # explode of the novelty score, survivorship's melt+pivot, and
    # k-core peeling on a data-derived co-purchase graph (the planted
    # kcore_check fixture is data-independent, so the probe uses the
    # bench-only kcore_copurchase at genuine 10x edge density)
    "kmv_rollup_check",
    "analyze_orders",
    "mad_outliers_orders",
    "novelty_documents",
    "golden_records_customers",
    "kcore_copurchase",
    # late r10: the count-min cell explode (depth*width cells per
    # group through the merge) and the skipgram in-array pair fan-out
    # (3 pairs per token position, corpus-wide) are the new shapes
    # whose constants scale with volume; interval_union rides the 10x
    # denser per-user event timelines
    "cm_rollup_check",
    "skipgram_cooc_documents",
    "interval_union_events",
    # the array-rollup fold, the corpus-wide winnow HOFs and the
    # triple prefix-sum over a 10x customer key table
    "hist_quantile_rollup_check",
    "winnow_fingerprints_documents",
    "rfm_segments_customers",
    # end-r10: the session's new volume-sensitive shapes — the
    # boilerplate segment explode+groupBy (every replicated doc makes
    # every segment corpus-boilerplate: worst-case flagged-set size),
    # the strip's join-back + per-doc rebuild at that worst case, the
    # two-measure KS prefix sum over a 10x distinct-value frame, the
    # distributed NTILE CDF, the vocab-budget prefix sum over the
    # (unchanged-cardinality) vocabulary with 10x counts, KM's
    # duration frame under 10x subjects, and the per-image dHash
    # pipeline at 10x image count (pure map scaling)
    "boilerplate_documents",
    "strip_boilerplate_documents",
    "ks_test_events",
    "ntile_buckets_lineitem",
    "vocab_budget_documents",
    "survival_km_users",
    "image_dhash_check",
]
PROBE_REPLICAS = 10

# 30x tier (r10 verdict task 3): the 10 slowest 10x-probe members get a
# second probe at 30x replicas, with per-member 30x/10x ratios recorded
# in BENCH_DETAIL.json. Volume-dominated shapes should ratio ~3 (linear
# in replicas); the iterative/fixed-point members (star clusters,
# pagerank, kcore) are round-count-dominated and the dup-pair planting
# grows ~replicas^2, so their ratio target is documented per-member in
# PLANS.md, not assumed 3. Disable with SPARK_GRAFT_PROBE30=0.
PROBE30_QUERIES = [
    "dedup_star_clusters",
    "pagerank_dup_graph",
    "hist_quantile_rollup_check",
    "kcore_copurchase",
    "winnow_fingerprints_documents",
    "setsim_join_documents",
    "clustering_coefficient_copurchase",
    "analyze_orders",
    "duplicate_spans_documents",
    "max_concurrency_events",
]
PROBE30_REPLICAS = 30

# Pre-declared 30x/10x ratio UPPER bounds per member (PLANS.md §22):
# ~3-linear shapes get 3.4 (the documented linear band top), the
# planted-quadratic / iterative members get 9.0 ((30/10)^2 pair
# planting), hist is cell-bounded (flat) but gets the linear top. Only
# the upper side gates: sub-linear is a win, super-band is either a
# scaling regression or session drift — and the r11 kcore incident
# (19.98 in-session vs 6.04 fresh) showed drift must be ruled out by a
# FRESH-SESSION re-measure before the number is believed. That rule is
# now code: any member whose ratio breaches its band is re-measured at
# both replica tiers in a fresh process (--measure-single), and both
# observations land in the artifact (band_breaches).
PROBE30_RATIO_BANDS = {
    "dedup_star_clusters": 9.0,
    "pagerank_dup_graph": 9.0,
    "hist_quantile_rollup_check": 3.4,
    "kcore_copurchase": 9.0,
    "winnow_fingerprints_documents": 3.4,
    "setsim_join_documents": 3.4,
    "clustering_coefficient_copurchase": 9.0,
    "analyze_orders": 3.4,
    "duplicate_spans_documents": 9.0,
    "max_concurrency_events": 3.4,
}


def _measure_single_fresh(name: str, dirs: list[str], timeout: int = 1800) -> dict:
    """Re-measure `name` against each dir in a FRESH python process
    (new JVM/session — the drift-proof protocol of PLANS.md §22).
    Returns {dir: sec} (missing entries on subprocess failure)."""
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--measure-single", name, *dirs],
            capture_output=True,
            text=True,
            timeout=timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in reversed(out.stdout.strip().splitlines()):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("mode") == "measure_single" and rec.get("name") == name:
                return rec.get("times", {})
        return {}
    except Exception:  # noqa: BLE001
        return {}


def _measure_single_main(name: str, dirs: list[str]) -> None:
    """Child-process entry for --measure-single: one fresh session,
    prime + best-of-2 per dir (the probe discipline), one JSON line."""
    spark = get_session("skyline-bench-single")
    qs = entrymod.queries()
    qs["skyline_gsod_volume"] = _skyline_gsod_volume
    qs["bpe_train_documents"] = _bpe_train_documents
    qs["bpe_encode_documents"] = _bpe_encode_documents
    qs["kcore_copurchase"] = _kcore_copurchase
    times: dict[str, float] = {}
    for d in dirs:
        def once() -> float:
            t0 = time.time()
            qs[name](spark, d).write.format("noop").mode("overwrite").save()
            return time.time() - t0

        try:
            once()  # prime codegen/page cache like the probes
            times[d] = round(min(once() for _ in range(2)), 3)
        except Exception as e:  # noqa: BLE001
            times[d] = None
            print(f"measure-single error on {d}: {type(e).__name__}: {e}", file=sys.stderr)
    print(json.dumps({"mode": "measure_single", "name": name, "times": times}))
    sys.stdout.flush()
    try:
        spark.stop()
    except Exception:  # noqa: BLE001
        pass


def _build_scale_replicas(spark, sf_dir: str, base: str, n_rep: int) -> None:
    """Materialize n_rep-times replicated lineitem + documents +
    events + orders + customer tables (all the probe queries need)
    under ``base``, once — the
    content is deterministic, so an existing build is reused. Document
    ids are re-keyed unique; texts repeat, planting ~n_rep² more dup
    pairs (the adversarial shape for the near-dup path); event ids are
    re-keyed with timestamps kept, so per-type interval density grows
    10x (the sweep-line stress shape)."""
    from pyspark.sql import functions as F

    marker = os.path.join(base, "_BUILT")
    if os.path.exists(marker):
        return
    # repartition before writing: the source is a single file, and a
    # 1-task explode would produce ONE parquet file with ONE 10x-sized
    # row group — a row group is the minimum scan split, so every probe
    # query would run on a 1-thread scan and measure nothing but that
    par = spark.sparkContext.defaultParallelism
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    (
        li.withColumn("__r", F.explode(F.sequence(F.lit(1), F.lit(n_rep))))
        .drop("__r")
        .repartition(par)
        .write.mode("overwrite")
        .parquet(os.path.join(base, "lineitem.parquet"))
    )
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    (
        docs.withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(n_rep - 1)))
        )
        .withColumn("doc_id", F.col("doc_id") * n_rep + F.col("__r"))
        .drop("__r")
        .repartition(par)
        .write.mode("overwrite")
        .parquet(os.path.join(base, "documents.parquet"))
    )
    # replicate from the NORMALIZED table: the raw file stores ts as
    # TIMESTAMP(NANOS) (read as long under nanosAsLong) — writing that
    # long back would produce a plain int64 column the loader would not
    # recognize as a timestamp
    from skylinemapreducehadoop_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    (
        ev.withColumn("__r", F.explode(F.sequence(F.lit(0), F.lit(n_rep - 1))))
        .withColumn("event_id", F.col("event_id") * n_rep + F.col("__r"))
        .drop("__r")
        .repartition(par)
        .write.mode("overwrite")
        .parquet(os.path.join(base, "events.parquet"))
    )
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    (
        orders.withColumn("__r", F.explode(F.sequence(F.lit(0), F.lit(n_rep - 1))))
        .withColumn("o_orderkey", F.col("o_orderkey") * n_rep + F.col("__r"))
        .drop("__r")
        .repartition(par)
        .write.mode("overwrite")
        .parquet(os.path.join(base, "orders.parquet"))
    )
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    (
        cust.withColumn("__r", F.explode(F.sequence(F.lit(0), F.lit(n_rep - 1))))
        .withColumn("c_custkey", F.col("c_custkey") * n_rep + F.col("__r"))
        .drop("__r")
        .repartition(par)
        .write.mode("overwrite")
        .parquet(os.path.join(base, "customer.parquet"))
    )
    with open(marker, "w"):
        pass


# Non-gating second group (tracked, not part of the headline total):
# the events queries un-ERR'd in round 3 plus remaining heavy hitters.
EXTRA_QUERIES = [
    "skyline_events",
    "range_join_events",
    "distinct_users_by_type",
    "pivot_user_events",
    "percentile_value_by_type",
    "cube_events",
    "approx_distinct_users",
    "dedup_exact_documents",
    "embedding_near_dup",
    "skyline_blocked",
    "skyline_join_priority",
    "reverse_skyline_part",
    "window_analytics_events",
    "chunk_documents",
    "decontaminate_documents",
    "decontaminate_fuzzy_documents",
    "unigram_logprob_documents",
    "pack_sequences_documents",
    "mix_corpus_sources",
    "topk_batch_similarity",
    "dynamic_skyline_part",
    # new in round 6
    "knn_graph_sample",
    "q2_min_cost_supplier",
    "q21_waiting_orders",
    "q20_excess_suppliers",
    "approx_percentile_value",
    "semantic_dedup_embeddings",
    "dedup_star_clusters",
    # new mid-round 6
    "setsim_join_documents",
    "segment_dedup_documents",
    "heavy_hitters_tokens",
    "classifier_score_documents",
    "histogram_orders",
    "stratified_topk_documents",
    "equidepth_histogram_events",
    "events_daily_rollup",
    "gapfill_events_hourly",
    "kmeans_embeddings",
    "scd2_user_events",
    "pagerank_dup_graph",
    "fuzzy_pairs_partnames",
    "trailing_hour_events",
    "cohort_retention_users",
    "top_paths_users",
    # new in round 7 (streaming_near_dup_replay excluded like the
    # other streaming replays — it measures streaming machinery, not
    # an operator plan)
    "ann_recall_lsh",
    "ann_recall_ivf",
    "segment_dedup_shifted",
    "skyline_sql_lineitem",
    "approx_distinct_check",
    "approx_percentile_check",
    "pagerank_cycle_check",
    "kmeans_blobs_check",
    "bigram_logprob_documents",
    "image_header_check",
    "data_quality_orders",
    "entity_resolution_partnames",
    # new in round 8
    "linreg_lineitem",
    "corr_lineitem",
    "zscore_outliers_events",
    "triangle_count_copurchase",
    "bm25_search_documents",
    "event_transitions_markov",
    "bm25_index_search_documents",
    "pmi_collocations_documents",
    "bpe_merges_check",
    "clustering_coefficient_copurchase",
    "frequent_pairs_orders",
    "table_diff_orders",
    # new in round 9
    "tfidf_keywords_documents",
    "max_concurrency_events",
    "incremental_dedup_documents",
    "frame_sample_check",
    "duplicate_spans_documents",
    "distribution_drift_orders",
    "quantize_check_embeddings",
    "quantized_recall_check",
    "zorder_scan_check",
    "bpe_encode_check",
    "bpe_encode_documents",
    "audio_features_check",
    "mad_outliers_orders",
    "autocorr_events",
    "golden_records_customers",
    "incremental_rollup_check",
    "kmv_rollup_check",
    "fd_check_customer",
    "mutual_information_events",
    "novelty_documents",
    "resize_check",
    "twap_events",
    "abc_parts",
    "analyze_orders",
    "kcore_check",
    # new in round 10
    "analyze_approx_check",
    "salted_join_agg_nation",
    "bfs_hops_copurchase",
    "containment_pairs_documents",
    "shortest_paths_copurchase",
    "bloom_semi_join_orders",
    "seasonal_anomalies_events",
    "percentile_ranks_lineitem",
    "k_anonymity_customers",
    "length_buckets_documents",
    "vocab_coverage_documents",
    "temperature_mix_documents",
    # new mid-round 10
    "negative_pairs_documents",
    "target_encode_events",
    "embedding_dim_stats",
    "gram_matrix_embeddings",
    "vocab_growth_documents",
    "attribution_events",
    "covariance_embeddings",
    "skew_report_events",
    "props_stats_events",
    "leakage_safe_split_documents",
    # new late-round 10: mergeable sketch columns + analytics
    "cm_rollup_check",
    "hist_quantile_rollup_check",
    "kmv_overlap_check",
    "cusum_events",
    "rfm_segments_customers",
    "skipgram_cooc_documents",
    "interval_union_events",
    "rrf_fusion_documents",
    "item_cf_parts",
    "winnow_fingerprints_documents",
    "ab_test_events",
    "grouped_topk_orders",
    "impute_values_events",
    "bmp_pixel_check",
    "time_travel_check",
    "weighted_median_lineitem",
    "version_diff_check",
    "trend_by_type_events",
    "langid_confusion_documents",
    "kmv_setops_check",
    "class_scatter_embeddings",
    "weighted_deciles_lineitem",
    # new end-round 10: curation + analytics additions
    "boilerplate_documents",
    "strip_boilerplate_documents",
    "gini_orders",
    "ewma_orders",
    "auc_purchase_events",
    "chi2_events",
    "survival_km_users",
    "benford_orders",
    "trimmed_mean_orders",
    "position_attribution_events",
    "mix_diversity_documents",
    "l_diversity_customers",
    "ntile_buckets_lineitem",
    "pca_invariant_check",
    "calibration_documents",
    "vocab_budget_documents",
    "balanced_shards_documents",
    "normalize_nfc_documents",
    "referential_integrity_check",
    "ks_test_events",
    "mi_scan_events",
    "image_dhash_check",
    "leadlag_corr_events",
    "seasonality_orders",
    "interarrival_events",
    "winsorized_mean_orders",
    "theil_sen_orders",
    "unconverted_clicks_events",
    "rolling_active_events",
    "transition_entropy_events",
    "interpolate_missing_orders",
    "sorted_neighborhood_parts",
    "wilson_ci_events",
    "lang_purity_documents",
    "mojibake_documents",
    "fix_mojibake_check",
    "dedup_sweep_documents",
    "script_mix_documents",
    "ndcg_bm25_documents",
    "line_stats_documents",
    "hard_positives_embeddings",
    "byte_token_budget_documents",
    "hard_negatives_embeddings",
    # new in round 12
    "seasonality_month_orders",
]


def _skyline_gsod_volume(spark, sf_dir):
    """The reference's actual flagship (9-dim mixed-direction skyline
    over fixed-width GSOD text) at VOLUME: 500k rows through the full
    ingest path. Bench-only — an O(n²) SQL oracle is intractable at this
    size, so correctness is covered by the oracle-checked 1500-row
    `skyline_gsod_9dim` driver query instead. The fixture is latent-
    factor correlated (like real weather data); independent-uniform
    9-dim data is a skyline pathology where nearly every row is
    Pareto-optimal."""
    from skylinemapreducehadoop_spark.operators.skyline import skyline
    from skylinemapreducehadoop_spark.sources.gsod import (
        GSOD_SKYLINE_DIMS,
        make_gsod_fixture,
        read_gsod,
    )

    path = make_gsod_fixture(
        "/tmp/gsod_volume_500k.txt", n_rows=500_000, correlated=0.9
    )
    return skyline(read_gsod(spark, path), GSOD_SKYLINE_DIMS)


def _bpe_train_documents(spark, sf_dir):
    """Bench-only: BPE tokenizer training over the actual corpus (50
    merges). The corpus-sized explode+aggregate is the data-scaling
    stage; the merge loop itself is vocabulary-sized (driver-local fast
    path). The driver-checked known-answer twin is `bpe_merges_check`."""
    from skylinemapreducehadoop_spark.functions.text import bpe_train

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    merges = bpe_train(docs, n_merges=50)
    return spark.createDataFrame(
        merges or [(0, "", "", 0)], "rank int, left string, right string, cnt int"
    )


def _bpe_encode_documents(spark, sf_dir):
    """Bench-only: apply a 50-merge trained table to the whole corpus
    (the tokenize-everything pass of a training-data pipeline; map-only
    at any scale). The driver-checked known-answer twin is
    `bpe_encode_check`."""
    from pyspark.sql import functions as F

    from skylinemapreducehadoop_spark.functions.text import bpe_encode, bpe_train

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    merges = bpe_train(docs, n_merges=50)
    return bpe_encode(docs.select("doc_id", "text"), merges).select(
        "doc_id", F.size("bpe_tokens").alias("n_bpe_tokens")
    )


def _kcore_copurchase(spark, sf_dir):
    """Bench-only: k-core decomposition of the DATA-DERIVED co-purchase
    graph (parts sharing an order) — Matula-Beck peeling rounds on a
    graph whose 10x replica is ~100x denser per order. ``k`` is set to
    the ~60th degree percentile (one approx_percentile scalar pre-pass)
    so a real peeling CASCADE happens at every scale — a fixed k would
    either peel nothing (graph denser than k: 1-round convergence) or
    everything. The driver-checked known-answer twin is `kcore_check`
    (planted graph, analytically determined 3-core)."""
    from pyspark.sql import functions as F

    from skylinemapreducehadoop_spark.operators.graph import k_core
    from skylinemapreducehadoop_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    # distinct FIRST, checkpointed: the raw basket self-join fans out
    # ~(items/order)^2 rows and used to run TWICE (once under the
    # percentile pre-pass, once under k_core's own dedup). The distinct
    # edge set is orders of magnitude smaller; both consumers now read
    # the materialized copy, and the degree/percentile/k_core values
    # are unchanged (k_core dedups internally; count_distinct over raw
    # pairs == count over distinct pairs).
    edges = (
        a.join(b.hint("shuffle_hash"), "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    und = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = und.groupBy("src").agg(F.count_distinct("dst").alias("dg"))
    k = int(deg.agg(F.percentile_approx("dg", 0.6)).collect()[0][0] or 3)
    return k_core(edges, max(k, 3))


def _run_calibration(spark) -> float:
    """Machine-state calibration: a FIXED data-independent workload
    (generated rows -> hash aggregate shuffle -> Arrow round-trip)
    timed warm (prime + median-of-3) exactly like the extras. Its
    wall-clock tracks the session/machine drift that r9 showed now
    dominates cross-round extras comparison (byte-identical code
    measuring 2.9s one round and 4.6s the next): dividing an extra's
    time by ``calibration_sec`` separates drift from real plan
    regressions without re-measuring on a quiet machine."""
    from pyspark.sql import functions as F

    def once() -> float:
        t0 = time.time()
        base = spark.range(0, 6_000_000, 1, 64).select(
            (F.col("id") % 9973).alias("k"),
            ((F.col("id") * 2654435761) % 1000003).alias("v"),
        )
        agg = base.groupBy("k").agg(
            F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")
        )
        agg.mapInPandas(lambda it: it, agg.schema).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    once()  # prime codegen + Python workers for this exact job
    runs = sorted(once() for _ in range(3))
    return round(runs[1], 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)

    spark = get_session("skyline-bench")
    qs = entrymod.queries()
    qs["skyline_gsod_volume"] = _skyline_gsod_volume
    qs["bpe_train_documents"] = _bpe_train_documents
    qs["bpe_encode_documents"] = _bpe_encode_documents
    qs["kcore_copurchase"] = _kcore_copurchase

    # Warm up the session once (Python UDF worker spawn + imports, JVM
    # JIT, page cache) so timings measure queries, not cold start.
    warm = spark.range(0, 10_000, 1, spark.sparkContext.defaultParallelism)
    warm.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        lambda it: (pdf for pdf in it), warm.schema
    ).count()

    def _run_once(name: str) -> float:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        # noop sink: materializes EVERY output column without
        # shipping rows to the driver. (count() would let Catalyst
        # prune unused projection expressions, so projection-heavy
        # queries — md5/regex/token work — would never execute.)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # Per-query fault isolation: one failing query must never cost the
    # round its entire perf record — record the error, keep going, and
    # ALWAYS print the JSON line.
    probe_only = "--scale-probe" in sys.argv

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    extra: dict[str, float] = {}
    try:
        calibration_sec = _run_calibration(spark)
    except Exception as e:  # noqa: BLE001
        calibration_sec = None
        errors["__calibration__"] = f"{type(e).__name__}: {e}"[:300]
    def _runs3(name: str, prime: bool = False) -> list[float]:
        # prime=True adds one UNTIMED execution first: the session
        # warmup warms the JVM but not per-query codegen/page cache,
        # so the first of 3 timed runs could still dominate (r8:
        # skyline_twophase 1.18s recorded vs 0.71-0.80s warm).
        if prime:
            _run_once(name)
        return sorted(_run_once(name) for _ in range(3))

    def _median3(name: str, prime: bool = False) -> float:
        # median-of-3 for the HEADLINE: the documented single-VM
        # run-to-run variance (PLANS.md §10: 15.9s vs 28.6s on
        # identical code) makes a single sample — or even best-of-2 —
        # noisy; the median damps both a cold first run and a one-off
        # GC/scheduler stall, and keeps the headline metric comparable
        # with every prior round's artifact.
        return round(_runs3(name, prime)[1], 3)

    extra_spread: dict[str, list[float]] = {}

    if not probe_only:
        for name in BENCH_QUERIES:
            try:
                timings[name] = _median3(name, prime=True)
            except Exception as e:  # noqa: BLE001
                errors[name] = f"{type(e).__name__}: {e}"[:300]

        # extras: MIN-of-3 with the full spread recorded (r10 verdict
        # task 4). The r10 artifact benched setsim at 15.4s at 1x while
        # the SAME artifact's 10x probe ran it in 3.97s — the extras
        # pass races machine/session state, and a median still lets one
        # slow run plus one average run swamp the statistic. The plan
        # is deterministic; contention only ever ADDS time, so the min
        # is the faithful plan-cost estimate and the [lo, mid, hi]
        # spread makes the drift itself part of the artifact instead
        # of a per-round forensic exercise. (Primed for the same
        # page-cache/codegen reason as the headline.)
        for name in EXTRA_QUERIES:
            try:
                runs = _runs3(name, prime=True)
                extra[name] = round(runs[0], 3)
                extra_spread[name] = [round(r, 3) for r in runs]
            except Exception as e:  # noqa: BLE001
                errors[name] = f"{type(e).__name__}: {e}"[:300]

    scale_probe: dict = {}
    if probe_only or os.environ.get("SPARK_GRAFT_SCALE_PROBE", "1") != "0":
        # v3: replica set now includes orders + customer (a pre-v3
        # dir has a _BUILT marker but not these — never half-reuse it)
        base = "/tmp/scale_probe_%s_x%d_v3" % (
            os.path.basename(sf_dir.rstrip("/")),
            PROBE_REPLICAS,
        )
        probe_times: dict[str, float] = {}
        probe_errors: dict[str, str] = {}
        try:
            t0 = time.time()
            _build_scale_replicas(spark, sf_dir, base, PROBE_REPLICAS)
            build_sec = round(time.time() - t0, 3)
            for name in PROBE_QUERIES:
                try:
                    # best-of-2 like the headline: measured r6 —
                    # twophase at 10x is 10.6s cold / 0.5s warm, i.e.
                    # a single cold run measures Python-worker spawn +
                    # page-cache fill, not the operator's scaling
                    def _probe_once() -> float:
                        t0 = time.time()
                        qs[name](spark, base).write.format("noop").mode(
                            "overwrite"
                        ).save()
                        return time.time() - t0

                    probe_times[name] = round(
                        min(_probe_once() for _ in range(2)), 3
                    )
                except Exception as e:  # noqa: BLE001
                    probe_errors[name] = f"{type(e).__name__}: {e}"[:300]
            scale_probe = {
                "replicas": PROBE_REPLICAS,
                "build_sec": build_sec,
                "queries": probe_times,
            }
            if probe_errors:
                scale_probe["errors"] = probe_errors
        except Exception as e:  # noqa: BLE001
            scale_probe = {"error": f"{type(e).__name__}: {e}"[:300]}

    # Measurement-inversion gate (r10 verdict task 4, hardened r12 per
    # the r11 verdict task 5): a 1x extra that benched SLOWER than its
    # own 10x probe run is a measurement bug by definition — the probe
    # ran the identical plan on 10x the data in the same process. On
    # inversion: (1) re-measure warm in-process and keep the min;
    # (2) if STILL inverted, re-measure in a FRESH session (the same
    # drift-proof step the 30x band rule uses) and keep the min;
    # (3) every residual is recorded loudly in measurement_inversions
    # with its magnitude, but only inversions ABOVE the documented 15%
    # noise band count in n_inversions (r11 verdict task 5's widened
    # gate). The band is a PURE MAGNITUDE threshold, deliberately NOT
    # conditioned on curve shape (ADVICE r12): any <=15% inversion is
    # automatically "flat" in the only sense that matters — an
    # inverted pair satisfies t10x >= best/1.15, so a would-be
    # flatness gate (t10x within 2x of t1x) is vacuously true for
    # every banded member; the per-record flat_curve field documents
    # this rather than silently implying the band is flat-only. Minor
    # ones are tallied separately in n_inversions_minor, nothing is
    # dropped. The original 3-run
    # spread is kept INTACT (ADVICE r11: truncating it to the 3
    # smallest hid exactly the drift it documents); re-measured values
    # land separately in extra_remeasured.
    INVERSION_NOISE_BAND = 0.15
    inversions: dict[str, dict] = {}
    extra_remeasured: dict[str, list[float]] = {}
    probe_q0 = scale_probe.get("queries", {}) if isinstance(scale_probe, dict) else {}
    for name, t1x in list(extra.items()):
        t10x = probe_q0.get(name)
        if t10x is not None and t1x > t10x:
            try:
                warm = round(min(_run_once(name) for _ in range(2)), 3)
            except Exception:  # noqa: BLE001
                warm = t1x
            extra_remeasured[name] = [warm]
            best = min(t1x, warm)
            if best > t10x:
                fresh = _measure_single_fresh(name, [sf_dir]).get(sf_dir)
                if fresh is not None:
                    extra_remeasured[name].append(fresh)
                    best = min(best, fresh)
            extra[name] = best
            if best > t10x:
                inversions[name] = {
                    "extra_1x": best,
                    "probe_10x": t10x,
                    "pct": round((best - t10x) / t10x * 100, 1),
                    "significant": (best - t10x) > INVERSION_NOISE_BAND * t10x,
                    # overhead-dominated flat curve: 10x within 2x of
                    # 1x (always true for banded members — see comment)
                    "flat_curve": t10x >= best / 2.0,
                }

    # 30x tier over the 10 slowest 10x members (r10 verdict task 3):
    # same best-of-2 discipline, per-member 30x/10x ratio recorded so a
    # super-linear shape is a number in the artifact, not a hunch.
    scale_probe_30x: dict = {}
    if (
        isinstance(scale_probe, dict)
        and scale_probe.get("queries")
        and os.environ.get("SPARK_GRAFT_PROBE30", "1") != "0"
    ):
        base30 = "/tmp/scale_probe_%s_x%d_v3" % (
            os.path.basename(sf_dir.rstrip("/")),
            PROBE30_REPLICAS,
        )
        try:
            t0 = time.time()
            _build_scale_replicas(spark, sf_dir, base30, PROBE30_REPLICAS)
            build30_sec = round(time.time() - t0, 3)
            times30: dict[str, float] = {}
            errors30: dict[str, str] = {}
            for name in PROBE30_QUERIES:
                try:
                    def _p30_once() -> float:
                        t0 = time.time()
                        qs[name](spark, base30).write.format("noop").mode(
                            "overwrite"
                        ).save()
                        return time.time() - t0

                    times30[name] = round(min(_p30_once() for _ in range(2)), 3)
                except Exception as e:  # noqa: BLE001
                    errors30[name] = f"{type(e).__name__}: {e}"[:300]
            ratios = {
                k: round(v / probe_q0[k], 2)
                for k, v in times30.items()
                if probe_q0.get(k)
            }
            # Band gate (r11 verdict task 4, now code): any member
            # whose 30x/10x ratio breaches its pre-declared upper band
            # is re-measured at BOTH tiers in a fresh process before
            # the number is believed (the r11 kcore lesson: 19.98
            # in-session after ~50 min of state vs 6.04 fresh). Both
            # observations are recorded; ratio_vs_10x carries the
            # fresh value with the in-session one preserved alongside.
            band_breaches: dict[str, dict] = {}
            for k, r in list(ratios.items()):
                hi = PROBE30_RATIO_BANDS.get(k)
                if hi is None or r <= hi:
                    continue
                fresh = _measure_single_fresh(k, [base, base30])
                f10, f30 = fresh.get(base), fresh.get(base30)
                rec = {
                    "in_session_ratio": r,
                    "band_hi": hi,
                    "fresh_10x": f10,
                    "fresh_30x": f30,
                }
                if f10 and f30:
                    rec["fresh_ratio"] = round(f30 / f10, 2)
                    rec["in_band_fresh"] = rec["fresh_ratio"] <= hi
                    ratios[k] = rec["fresh_ratio"]
                band_breaches[k] = rec
            scale_probe_30x = {
                "replicas": PROBE30_REPLICAS,
                "build_sec": build30_sec,
                "queries": times30,
                "ratio_vs_10x": ratios,
                "ratio_bands": PROBE30_RATIO_BANDS,
            }
            if band_breaches:
                scale_probe_30x["band_breaches"] = band_breaches
            if errors30:
                scale_probe_30x["errors"] = errors30
        except Exception as e:  # noqa: BLE001
            scale_probe_30x = {"error": f"{type(e).__name__}: {e}"[:300]}

    total = round(sum(timings.values()), 3)
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "extra_queries": extra,
        # extras statistic changed r11: min-of-3 (was median-of-3);
        # the full sorted [lo, mid, hi] spread per extra is below, so
        # cross-round diffs vs r<=10 artifacts should compare against
        # the mid element, and the drift is visible per entry
        "extra_stat": "min_of_3",
        "extra_spread": extra_spread,
        # inversion re-measures live here, NOT folded into the spread
        # (ADVICE r11 — the spread documents the original 3 runs)
        "extra_remeasured": extra_remeasured,
        "extra_total": round(sum(extra.values()), 3),
        "calibration_sec": calibration_sec,
        # extras normalized to the calibration unit: compare THESE
        # across rounds — a ratio shift is a plan change, a uniform
        # absolute shift is machine drift
        "extra_queries_norm": (
            {k: round(v / calibration_sec, 2) for k, v in extra.items()}
            if calibration_sec
            else {}
        ),
        "sf": sf,
    }
    if scale_probe:
        detail["scale_probe"] = scale_probe
    if scale_probe_30x:
        detail["scale_probe_30x"] = scale_probe_30x
    detail["measurement_inversions"] = inversions
    # environment fingerprint in every artifact (r12 verdict task 6)
    try:
        from tools.envinfo import env_fingerprint

        detail["env"] = env_fingerprint(spark)
    except Exception:  # noqa: BLE001
        pass
    if errors:
        detail["errors"] = errors
    # Full record to disk (survives any stdout truncation) and to
    # stdout FIRST, so the compact line below is what lands at the
    # very end of the driver's ~2 KB output tail.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
            "w",
        ) as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass
    print(json.dumps(detail))
    sys.stdout.flush()
    probe_q = scale_probe.get("queries", {}) if isinstance(scale_probe, dict) else {}
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extra_total": detail["extra_total"],
        "calibration_sec": calibration_sec,
        "n_extra": len(extra),
        "n_errors": len(errors),
        # probe_ok: None = probe skipped, else ran-without-errors
        "probe_ok": (
            None
            if not scale_probe
            else bool(probe_q)
            and not (isinstance(scale_probe, dict) and scale_probe.get("errors"))
        ),
        "probe_total": round(sum(probe_q.values()), 3),
        "probe30_ok": (
            None
            if not scale_probe_30x
            else bool(scale_probe_30x.get("queries"))
            and not scale_probe_30x.get("errors")
            and not scale_probe_30x.get("error")
        ),
        "n_inversions": sum(
            1 for v in inversions.values() if v.get("significant")
        ),
        "n_inversions_minor": sum(
            1 for v in inversions.values() if not v.get("significant")
        ),
        "n_band_breaches": len(
            scale_probe_30x.get("band_breaches", {})
            if isinstance(scale_probe_30x, dict)
            else {}
        ),
        "detail": "BENCH_DETAIL.json",
    }
    line = json.dumps(compact)
    if len(line) > 1500:  # hard guarantee: never outgrow the tail again
        compact.pop("queries")
        line = json.dumps(compact)
    print(line)
    try:
        spark.stop()
    except Exception:
        pass


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--measure-single":
        _measure_single_main(sys.argv[2], sys.argv[3:])
    else:
        main()
