"""Plan-quality assertions — the 100 TB design gate.

A correct plan that force-broadcasts an SF-scaled table passes at
sf0.001 and OOMs executors at 100 TB, so these tests pin the *plan
shape*, not the results:

1. No broadcast HINT wraps an SF-scaled table anywhere in the corpus
   (hints are hard overrides of autoBroadcastJoinThreshold; only the
   fixed-cardinality dims nation/region may carry one).
2. Global top-k queries plan TakeOrderedAndProject, never a full sort.
"""

from __future__ import annotations

import pytest

from datapipeline_dags_spark.plans.all import QUERIES
from tests.conftest import SF_DIR

# Fixed-cardinality dims (nation=25, region=5 at every SF) — the only
# tables a broadcast hint is allowed to wrap.
FIXED_SIZE_TABLES = {"nation", "region"}
SCALED_TABLES = {
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
}


def _hinted_scan_paths(df) -> list[str]:
    """Collect parquet locations of every relation under a ResolvedHint
    (broadcast) node in the analyzed logical plan.

    NB: ``simpleString`` does NOT include the file location — the scan
    path must come from the relation's rootPaths (an earlier version of
    this test checked simpleString and was silently vacuous)."""
    paths: list[str] = []

    def walk(node, in_hint: bool) -> None:
        name = node.nodeName()
        if name == "ResolvedHint":
            in_hint = True
        if in_hint and "Relation" in name:
            try:
                paths.append(node.relation().location().rootPaths().mkString(","))
            except Exception:
                paths.append(node.toString())
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i), in_hint)

    walk(df._jdf.queryExecution().analyzed(), False)
    return paths


def test_watermark_predicate_pushes_to_parquet(spark):
    """The incremental scan must prune row groups by the raw ts column —
    a filter on the converted timestamp expression cannot."""
    plan = (
        QUERIES["q23_incremental_watermark_scan"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "GreaterThan(ts" in pushed[0], pushed


# A hint may wrap a *bounded-cardinality filter* of a scaled table: q45
# broadcasts `vec_id < 20` — 20 rows at every SF; q47 broadcasts the
# N_CENTROIDS-row quantizer and the N_QUERIES×NPROBE probe list, both
# fixed-size at every SF.  Nothing else may.
BOUNDED_FILTER_HINT_OK = {
    "q45_ann_topk_bruteforce",
    # broadcasts the SEMDECON_N-row (LIMIT) benchmark-struct row; the
    # screen itself is one map-only pass (the q45 discipline)
    "q303_semantic_decontamination",
    "q213_target_encoding",  # broadcasts the 1-row global-prior aggregate
    # broadcasts the NEG_POOL-row (LIMIT) random-negative pool
    "q214_triplet_mining",
    "q215_label_propagation",  # broadcasts the 1-row community count
    "q218_emd_drift",  # broadcasts the 1-row corpus total
    "q219_cuped",  # broadcasts the 1-row pooled theta/moments
    "q220_diff_in_diff",  # broadcasts the 1-row DiD estimate
    "q222_kcore_decomposition",  # broadcasts the 1-row core node/edge stats
    # broadcasts the ACF_LAGS-row lag grid + the 1-row global moments
    "q223_revenue_acf",
    # broadcasts the 13-row lag grid + the 1-row global moments
    "q239_ccf_lead_lag",
    "q224_fano_burstiness",  # broadcasts the 1-row calendar-span aggregate
    "q226_kmin_distinct_sketch",  # broadcasts the KMV_K-row salt grid
    "q228_degree_assortativity",  # broadcasts the 1-row node/edge counts
    # broadcasts the 1-row histogram bounds (min, width)
    "q241_histogram_selectivity",
    "q244_bottleneck_suppliers",  # broadcasts the 1-row multi-order total
    "q256_top_supplier",  # broadcasts the 1-row revenue-max aggregate
    # broadcasts the 1-row observed-difference aggregate
    "q265_randomization_test",
    "q266_seasonal_index",  # broadcasts the 1-row revenue total
    # broadcasts three 1-row count aggregates into the audit row
    "q272_runtime_filter_audit",
    # broadcasts three 1-row count aggregates into the estimate row
    "q273_capture_recapture",
    # broadcasts the 1-row exact-truth count onto the 4-config frame
    "q276_lsh_band_sweep",
    # broadcasts the 1-row bucket-occupancy aggregate
    "q278_feature_hash_audit",
    # broadcasts the 1-row grand-total aggregate over the bounded
    # per-part collapse (TPC-H Q11's scalar subquery)
    "q281_part_value_concentration",
    # shares q47's cell assignment: broadcasts the n_cent-row
    # quantizer (bounded-filter vec_id < n_cent), nothing else
    "q282_ivf_delta_refresh",
    # same n_cent-row quantizer broadcast as q282 (the delete-delta
    # twin shares the one assignment pass)
    "q300_ivf_delete_refresh",
    # broadcasts the |years|-row cohort-size collapse
    "q286_cohort_retention",
    # broadcasts the 1-row (n, avgdl) corpus-stats aggregate and the
    # BM25_QT-row (LIMIT) query-term table
    "q287_bm25_topk",
    # q287's attaches per sweep config + the 1-row overlap/score
    # attaches building the 3 sweep rows
    "q315_bm25_param_sweep",
    # broadcasts the 1-row token-total aggregate and the
    # SHUF_EPOCHS-row epoch grid
    "q288_epoch_shuffle_balance",
    # broadcasts the 1-row global matches_full audit aggregate
    "q293_bm25_stats_delta_refresh",
    # broadcasts the same 1-row matches_full audit aggregate (the
    # delete-delta twin of q293)
    "q302_bm25_stats_delete_refresh",
    # broadcasts the 1-row balance-threshold aggregate (Q22's scalar)
    "q249_idle_high_balance",
    # broadcasts the 1-row window aggregate + the bounded month-instant list
    "q245_littles_law",
    # broadcasts the 1-row totals/argmin aggregates over the month collapse
    "q231_structural_break",
    "q232_cohens_kappa",  # broadcasts the 1-row kappa moment aggregate
    # broadcasts the 1-row MI/entropy/purity aggregates over the
    # bounded (k x |labels|) contingency collapse
    "q234_cluster_purity_nmi",
    "q175_kaplan_meier",  # broadcasts the 1-row order-count aggregate
    "q176_cusum_changepoint",  # broadcasts the 1-row daily-mean aggregate
    # broadcasts the dim-bounded label centroid + the 1-row corpus count
    "q177_calibration_ece",
    "q178_pq_reconstruction",  # broadcasts the 1-row PQ_K codebook (cf. q75)
    # broadcasts |groups|-row bounds, the (groups x bins) histogram
    # ranks, and the needed-bin list — all bounded model tables
    "q186_distributed_exact_percentile",
    "q184_order_aging",  # broadcasts the 1-row snapshot date
    "q190_weekday_chisq",  # broadcasts the 1-row weekday totals
    # broadcasts the dim-bounded centroid + the 1-row base rate
    "q192_decile_lift",
    # broadcasts the |labels|-row centroid prototype table (cf. q64)
    "q185_label_silhouette",
    "q47_ann_ivf",
    "q63_tfidf_top_terms",  # broadcasts the 1-row corpus-count aggregate
    # broadcasts the per-block offset table: corpus/PACK_BLOCK rows, a
    # 1e-6 reduction of the scan at production block size
    "q71_sequence_packing",
    "q73_mixture_rebalance",  # broadcasts the 1-row global-min stratum size
    "q74_unigram_logprob",  # broadcasts the 1-row grand token total
    "q75_ann_pq",  # broadcasts the 1-row codebook and the fixed query-set LUT
    "q79_gapfill_forward",  # broadcasts the bounded (user_id < 5) series-key set
    # composes q45+q46+q47+q75 and inherits exactly their allowed
    # bounded-filter hints (fixed query set, quantizer, codebook/LUT)
    "q90_ann_recall",
    "q159_ann_ndcg",
    # shares q47's cell assignment: broadcasts the N_CENTROIDS-row
    # quantizer (fixed-size at every SF), nothing else
    "q96_semantic_dedup",
    "q97_dsir_importance",  # broadcasts the 1-row feature-count totals
    "q100_time_decay_engagement",  # broadcasts the 1-row reference timestamp
    "q101_bpe_merges",  # broadcasts the 1-row per-round top pair
    "q102_bpe_tokenize",  # same 1-row per-round top-pair broadcast as q101
    "q104_pmi_collocations",  # broadcasts the two 1-row corpus totals
    # broadcasts the |langs|-row rate table (fixed language set at any SF)
    "q105_alpha_mixture_sample",
    # broadcasts the |event_types|-row percentile-bounds table
    "q111_winsorized_stats",
    # q47's quantizer + q75's codebook/LUT/probe-list attaches, all
    # fixed-size at every SF (N_CENTROIDS / PQ_K / N_QUERIES x NPROBE)
    "q112_ann_ivfpq",
    # the same frozen-artifact attaches on q112's composition (coarse
    # quantizer + residual codebook), plus the 1-row global audit
    "q307_ivfpq_codes_refresh",
    # broadcasts the 1-row budget/cap aggregate, the 1-row bucket
    # waterline, and the 1-row global-take audit — all fixed-size
    # collapses of the corpus, never corpus rows
    "q309_token_budget_curriculum",
    # the waterfall's four stage rows are built from 1-row stage
    # aggregates (a0..a4, k1, ps, budget, waterline) broadcast onto
    # each other — every hinted frame is a 1-row collapse
    "q311_curation_token_waterfall",
    # q309's 1-row budget/waterline attaches inherited through
    # _curriculum_take on the pool slice
    "q312_take_coverage_audit",
    # 1-row cluster-count + 1-row status-audit attaches onto the
    # bounded |clusters| frame (succession report)
    "q313_keeper_succession",
    # q75's frozen-artifact attaches per sweep config (PQ_K-row
    # codebook, N_QUERIES-row LUT/query set) + 1-row mse/hits/truth
    # attaches building the 3 sweep rows
    "q314_pq_subspace_sweep",
    # broadcasts the FIXED CMS_D x CMS_W counter grid (256 cells at any SF)
    "q117_count_min_sketch",
    # broadcasts the |hours|-row prefix-sum offset table (q71 discipline)
    "q118_session_concurrency",
    "q120_mixing_schedule",  # broadcasts the 1-row corpus totals
    "q121_bigram_lm_score",  # broadcasts the 1-row grand token total
    # broadcasts the 1-row bigram-type total (the KN continuation
    # denominator — q121's grand-total discipline)
    "q317_kneser_ney_score",
    # broadcasts the 1-row time span + |types|-row value-range table
    "q123_psi_drift",
    # broadcasts the 1-row decile-edge vector + 1-row pos/neg totals
    "q124_woe_iv_binning",
    "q125_tfidf_sparse_cosine",  # broadcasts the 1-row corpus-count aggregate
    # broadcasts the |labels|-row centroid-array table + |labels|-row
    # mu/sd stats — both fixed by the label set at every SF
    "q126_embedding_outliers",
    # broadcasts the AUDIT_N-row bounded audit batch (vec_id < 50, the
    # q45 fixed-query-set discipline)
    "q127_knn_label_audit",
    # broadcasts the |sources|-row mu/sd stats (fixed source set)
    "q129_source_score_calibration",
    # broadcasts the 256-row hash-prefix block-offset table (q71 discipline)
    "q130_shard_assignment",
    # broadcasts the |sources|-row per-source doc-count table (fixed set)
    "q133_boilerplate_segments",
    "q136_length_histogram",  # broadcasts the 1-row corpus-count aggregate
    "q138_label_balance",  # broadcasts the 1-row (total, n_labels) aggregate
    "q142_basket_affinity",  # broadcasts the 1-row distinct-order count
    "q150_value_trend",  # broadcasts the 1-row corpus-min-hour aggregate
    # broadcasts the <=10^4-row per-quality frontier model (bounded by
    # the rounded-quality domain at any SF)
    "q146_pareto_frontier",
    "q151_key_skew_diagnosis",  # broadcasts the 1-row (n_rows, n_keys) totals
    "q160_zorder_layout",  # broadcasts the 1-row dimension min/max bounds
    "q161_incremental_rollup",  # broadcasts the 1-row midpoint timestamp
    # broadcasts the 1-row anchor date + the 1-row median edge table
    "q165_rfm_segments",
    # broadcasts the two bounded per-signal CDF tables + 1-row count
    "q166_ensemble_score_blend",
    "q168_json_props_profile",  # broadcasts the 1-row corpus count
    "q169_benford_audit",  # broadcasts the 1-row corpus count
    # broadcasts the 1-row midpoint + the bounded |types|x24 profile
    "q163_seasonal_anomalies",
    # broadcasts the |groups|-row bounds table + the 3-row percentile list
    "q154_quantile_sketch",
    # composes q46+q47 and inherits their declared tiny-side attaches
    "q153_rrf_fusion",
    "q195_token_yield_curve",  # broadcasts the 1-row token-total aggregate
    "q196_sample_allocation",  # broadcasts the 1-row total-weight aggregate
    # broadcasts the bounded |lengths|-row value/total tables + the
    # 1-row corpus total into the ECDF grid build
    "q200_ks_source_drift",
    # broadcasts the |event-types|-row med/MAD tables + q186's bounds
    # and percentile-list attaches (both medians run through
    # distributed_percentiles)
    "q202_mad_outliers",
    # broadcasts the N_QUERIES x HYB_QT query-term table (row_number
    # <= HYB_QT over the fixed query set — bounded at any SF), the
    # 1-row corpus stats, and inherits q46+q47's declared attaches
    "q295_hybrid_retrieval",
    # broadcasts the 1-row per-method MRR aggregate onto the 1-row
    # recall aggregate; inherits q45/q46/q47/q295's declared attaches
    "q296_hybrid_retrieval_audit",
    # broadcast the 1-row PQ codebook struct row (bounded-filter
    # vec_id < PQ_K — q75's frozen-codebook attach) plus the 1-row
    # global matches_full audit aggregate (q304/q305) / the 16-row
    # per-subspace distortion collapse (q306)
    "q304_pq_codes_delta_refresh",
    "q305_pq_codes_delete_refresh",
    "q306_pq_codebook_staleness",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_forced_broadcast_of_scaled_tables(name, spark):
    if name in BOUNDED_FILTER_HINT_OK:
        return
    df = QUERIES[name](spark, SF_DIR)
    for scan in _hinted_scan_paths(df):
        offenders = [t for t in SCALED_TABLES if f"{t}.parquet" in scan]
        assert not offenders, (
            f"{name}: broadcast hint wraps SF-scaled table(s) {offenders} — "
            f"would OOM at 100 TB. Hinted scan: {scan[:200]}"
        )


@pytest.mark.parametrize("name", ["q02_shipping_priority", "q05_returned_items", "q09_topk_orders"])
def test_topk_plans_take_ordered(name, spark):
    """Top-k must be a per-partition heap + driver merge, not a global sort."""
    df = QUERIES[name](spark, SF_DIR)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in physical, physical[:500]


# Nested-loop joins are allowed ONLY where they are the declared design:
# q34 is the cross-join surface itself; q45 broadcasts a tiny fixed query
# set against the corpus (one map-side pass — the intended ANN baseline).
# (q47's quantizer attach and q63's corpus-count attach are 1-row
# broadcast cross joins — model/scalar parameters shipped to every task,
# the intended map-side design.)
NESTED_LOOP_OK = {
    "q34_cross_join_status_grid",
    "q45_ann_topk_bruteforce",
    # broadcasts the SEMDECON_N-row (LIMIT) benchmark-struct row; the
    # screen itself is one map-only pass (the q45 discipline)
    "q303_semantic_decontamination",
    "q47_ann_ivf",
    "q63_tfidf_top_terms",
    # 1-row scalar attach (global-min stratum size / grand token total)
    "q73_mixture_rebalance",
    "q74_unigram_logprob",
    "q75_ann_pq",  # 1-row codebook attach + fixed query-set scoring pass
    "q79_gapfill_forward",  # generated spine x bounded series-key set
    # composes the ANN queries above and inherits their declared
    # tiny-side nested-loop attaches; adds none of its own
    "q90_ann_recall",
    "q159_ann_ndcg",
    "q96_semantic_dedup",  # q47's 1-row quantizer attach, per cells side
    "q97_dsir_importance",  # 1-row totals attach (cf. q74)
    "q100_time_decay_engagement",  # 1-row reference-timestamp attach
    "q101_bpe_merges",  # 1-row top-pair attach per merge round
    "q102_bpe_tokenize",  # same 1-row top-pair attach as q101
    # two 1-row total attaches (grand token total, grand bigram total)
    "q104_pmi_collocations",
    # 1-row weight-sum attach into the |langs|-row rate table
    "q105_alpha_mixture_sample",
    # inherits q47+q75's tiny-side attaches (quantizer, residual
    # codebook, probe list, per-query LUT)
    "q112_ann_ivfpq",
    # the same attaches on the q112 composition's IVM audit, plus the
    # 1-row global matches_full attach
    "q307_ivfpq_codes_refresh",
    # 1-row budget/cap + 1-row waterline + 1-row global-take attaches
    # (the curriculum's bounded control values, cf. q74's discipline)
    "q309_token_budget_curriculum",
    # the same 1-row attaches chained for four waterfall stage rows
    # (stage aggregates x stage aggregates, all 1-row frames)
    "q311_curation_token_waterfall",
    # q309's 1-row budget/waterline attaches inherited on the pool
    "q312_take_coverage_audit",
    # 1-row distinct-cluster count + 1-row audit attach (succession)
    "q313_keeper_succession",
    # q75/q45's tiny-side attaches per sweep config (codebook, LUT,
    # fixed query set) + the 1-row sweep-row attaches
    "q314_pq_subspace_sweep",
    # composes q109 + q303 and inherits q303's SEMDECON_N-row
    # benchmark-struct attach; the fusion itself adds only id-keyed
    # hash joins
    "q310_contamination_fusion",
    "q120_mixing_schedule",  # 1-row totals attach (cf. q74)
    "q121_bigram_lm_score",  # 1-row grand-total attach (cf. q74)
    # 1-row bigram-type-total attach (the KN continuation denominator)
    "q317_kneser_ney_score",
    # 1-row trained-metrics attach onto the 3-row coefficient frame
    "q321_logistic_irls",
    # 1-row global-nll + 1-row worst-pick attaches onto the bounded
    # |sources|-row metrics frame
    "q323_model_disparity_audit",
    # 1-row train-totals (t, v) + 1-row train-reference attaches
    # (q121's grand-total discipline on the split-tagged frame)
    "q324_perplexity_contamination",
    # 1-row Hessian attach onto the |sources|-bounded gradient frame
    "q326_group_influence",
    "q123_psi_drift",  # 1-row time-span attach (cf. q100)
    "q124_woe_iv_binning",  # 1-row edge-vector + totals attaches
    "q125_tfidf_sparse_cosine",  # 1-row corpus-count attach (cf. q63)
    # AUDIT_N-row bounded audit batch x corpus scoring pass (cf. q45)
    "q127_knn_label_audit",
    "q136_length_histogram",  # 1-row corpus-count attach (cf. q63)
    # 1-row totals attach into the bounded |labels|-row frame
    "q138_label_balance",
    "q142_basket_affinity",  # 1-row order-count attach (cf. q63)
    # |sources|-row theta self-join building the bounded pair grid
    # (cf. q34's tiny-dim grid)
    "q147_source_overlap_sketch",
    "q150_value_trend",  # 1-row min-hour attach (cf. q100)
    "q151_key_skew_diagnosis",  # 1-row totals attach onto the top-k rows
    "q160_zorder_layout",  # 1-row bounds attach (cf. q100/q150)
    "q161_incremental_rollup",  # 1-row midpoint attach (cf. q100)
    "q165_rfm_segments",  # 1-row anchor + 1-row median-edges attaches
    "q166_ensemble_score_blend",  # 1-row corpus-count attach (cf. q63)
    "q168_json_props_profile",  # 1-row corpus-count attach (cf. q63)
    "q169_benford_audit",  # 1-row corpus-count attach (cf. q63)
    "q163_seasonal_anomalies",  # 1-row midpoint attach (cf. q161)
    "q154_quantile_sketch",  # 3-row percentile-list attach onto the histogram
    "q153_rrf_fusion",  # inherits q47's quantizer / probe-list attaches
    "q175_kaplan_meier",  # 1-row order-count attach onto the life table
    "q176_cusum_changepoint",  # 1-row daily-mean attach (cf. q100)
    # 1-row centroid + 1-row corpus-count attaches (cf. q63/q64)
    "q177_calibration_ece",
    "q178_pq_reconstruction",  # 1-row codebook attach (cf. q75)
    "q184_order_aging",  # 1-row snapshot-date attach (cf. q100)
    "q190_weekday_chisq",  # 1-row totals attach onto the <=7-row frame
    "q192_decile_lift",  # 1-row base-rate attach onto the 10-row frame
    "q185_label_silhouette",  # |labels|-row prototype attach (cf. q64)
    # 3-row percentile-list attach onto the |groups|-row bounds table
    "q186_distributed_exact_percentile",
    "q195_token_yield_curve",  # 1-row token-total attach (cf. q63)
    "q196_sample_allocation",  # 1-row total-weight attach (cf. q63)
    # three 1-row aggregate attaches (node/edge/triangle counts) onto
    # the single summary row
    "q199_copurchase_triangles",
    # 1-row corpus-total attach + the bounded |sources| x |lengths|
    # ECDF grid build (cf. q147's bounded pair grid)
    "q200_ks_source_drift",
    # inherits q186's 1-row percentile-list attach (both medians run
    # through distributed_percentiles)
    "q202_mad_outliers",
    # 1-row corpus-stats attach onto the query-term join (cf. q63's
    # count attach); inherits q46+q47's declared tiny-side attaches
    "q295_hybrid_retrieval",
    # per-method 1-row x 1-row metric cross joins; inherits the
    # composed retrievals' (q45/q46/q47/q295) declared attaches
    "q296_hybrid_retrieval_audit",
    # bounded-frame range joins of the minimax identity: segments and
    # the (bin, segment) containment join both run on the
    # |price-domain/ISO_BIN_WIDTH|-row collapse, never the corpus
    "q212_isotonic_calibration",
    # 1-row global-prior attach onto the |brands| x TE_FOLDS frame
    "q213_target_encoding",
    # 1-row community-count attach onto the LPA_TOP-row frame
    "q215_label_propagation",
    # bounded |sources| x |length-buckets| grid build + 1-row total
    # attach (cf. q200's ECDF grid)
    "q218_emd_drift",
    # 1-row pooled-moments / DiD attaches onto the |arms|-row frame
    "q219_cuped",
    "q220_diff_in_diff",
    # two 1-row core-stat attaches onto the KCORE_TOP-row frame
    "q222_kcore_decomposition",
    # 1-row bounds attach before the bucket hash agg (cf. q100/q160)
    "q241_histogram_selectivity",
    # 1-row total attach onto the BOTTLENECK_TOP-row frame
    "q244_bottleneck_suppliers",
    # 1-row exact-count attach onto the 1-row estimate frame (both from
    # the checkpointed bounded value-stats collapse)
    "q248_mcv_selectivity",
    # 1-row threshold attach into the customer scan (Q22's scalar)
    "q249_idle_high_balance",
    # one 1-row (pair counts) x 1-row (doc counts) attach over the
    # checkpointed bounded pair table (the r8 single-pass sweep)
    "q252_dedup_threshold_sweep",
    # bounded |months| instant grid x interval containment (cf. q79's
    # spine x bounded key set) + 1-row attaches
    "q245_littles_law",
    # bounded |days| x ACF_LAGS lag-grid build + 1-row moment attach
    "q223_revenue_acf",
    # bounded |hours| x 13 lag-grid build + 1-row moment attach
    "q239_ccf_lead_lag",
    "q224_fano_burstiness",  # 1-row span attach onto the |types|-row frame
    # KMV_K-row salt grid x token collapse: the map-side sketch fan-out
    # (partial-combine MINs collapse it before the shuffle)
    "q226_kmin_distinct_sketch",
    # two 1-row count attaches onto the 1-row moment frame
    "q228_degree_assortativity",
    # 1-row totals/min-SSE attaches onto the bounded month frame
    "q231_structural_break",
    # 1-row (n, agree, pe) attach onto the <=|langs|-row frame
    "q232_cohens_kappa",
    # five 1-row attaches (purity, totals, MI, two entropies) onto the
    # KM_K-row majority frame
    "q234_cluster_purity_nmi",
    # 1-row observed-difference attach onto the K-row permutation frame
    "q265_randomization_test",
    # 1-row revenue-total attach onto the 12-row month frame
    "q266_seasonal_index",
    # four 1-row count attaches assembled into the single audit row
    "q272_runtime_filter_audit",
    # four 1-row count/estimate attaches assembled into the single row
    "q273_capture_recapture",
    # 1-row truth attach onto the 4-row config frame
    "q276_lsh_band_sweep",
    # 1-row occupancy-stats attach onto the 1-row feature count
    "q278_feature_hash_audit",
    # broadcasts the 1-row grand-total aggregate over the bounded
    # per-part collapse (TPC-H Q11's scalar subquery)
    "q281_part_value_concentration",
    # shares q47's cell assignment: broadcasts the n_cent-row
    # quantizer (bounded-filter vec_id < n_cent), nothing else
    "q282_ivf_delta_refresh",
    # same n_cent-row quantizer broadcast as q282 (the delete-delta
    # twin shares the one assignment pass)
    "q300_ivf_delete_refresh",
    # broadcasts the 1-row (n, avgdl) corpus-stats aggregate and the
    # BM25_QT-row (LIMIT) query-term table
    "q287_bm25_topk",
    # q287's attaches per sweep config + the 1-row overlap/score
    # attaches building the 3 sweep rows
    "q315_bm25_param_sweep",
    # broadcasts the 1-row token-total aggregate and the
    # SHUF_EPOCHS-row epoch grid
    "q288_epoch_shuffle_balance",
    # broadcasts the 1-row global matches_full audit aggregate
    "q293_bm25_stats_delta_refresh",
    # broadcasts the same 1-row matches_full audit aggregate (the
    # delete-delta twin of q293)
    "q302_bm25_stats_delete_refresh",
    # q75's 1-row frozen-codebook attach on the shared encode pass,
    # plus the 1-row global matches_full audit attach (q304/q305) /
    # the 16-row per-subspace base//live distortion join (q306)
    "q304_pq_codes_delta_refresh",
    "q305_pq_codes_delete_refresh",
    "q306_pq_codebook_staleness",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_or_accidental_nested_loop(name, spark):
    plan = QUERIES[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in NESTED_LOOP_OK:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: unexpected nested-loop join"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_global_sort_outside_topk(name, spark):
    """A global Sort (full-shuffle ordering) is a 100 TB red flag; every
    ordered output in the corpus is a bounded top-k (TakeOrderedAndProject)."""
    plan = QUERIES[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    if "TakeOrderedAndProject" in plan:
        return
    for line in plan.splitlines():
        if "Sort [" in line and "global=true" in line:
            raise AssertionError(f"{name}: global sort in plan: {line.strip()[:160]}")


# Unpartitioned (global) windows run in ONE WindowExec partition — a
# 100 TB red flag unless the window's input is a collapsed bounded
# domain.  Every query that plans one must be listed here with the
# bound that makes it safe; a NEW unlisted global window fails, and a
# listed query that stops planning one fails too (stale allowlist).
# (VERDICT r4 ask #5.)
GLOBAL_WINDOW_BOUNDED = {
    # prefix-moment cumsum over the bounded calendar collapse
    "q231_structural_break": "|months| collapse (~84 rows at any SF)",
    # two-phase distributed prefix sums: the global stage runs on the
    # tiny per-block/per-hour totals table, not the corpus
    "q71_sequence_packing": "per-PACK_BLOCK totals (corpus/PACK_BLOCK rows)",
    "q118_session_concurrency": "per-hour offsets table (|hours| rows)",
    "q130_shard_assignment": "per-shard totals prefix sum (|shards| rows)",
    # collapsed bounded domains
    "q87_growth_accounting": "|days| retention grid",
    "q128_zipf_vocab_audit": "top-500 term frame (rank cut upstream)",
    "q146_pareto_frontier": "bounded candidate-model frame",
    "q164_abc_brands": "|brands| cumulative-share frame",
    "q166_ensemble_score_blend": "bounded percentile-collapse frame",
    "q171_wow_growth": "|weeks| LAG frame",
    # rank assigned AFTER a TakeOrderedAndProject limit (20 rows)
    "q142_basket_affinity": "row_number over the BASKET_TOP-row limit",
    "q179_itemset_triples": "row_number over the TRIPLE_TOP-row limit",
    "q287_bm25_topk": "row_number over the BM25_TOP-row limit",
    # collapse-first day/life tables
    "q175_kaplan_meier": "life table <= KM_HORIZON_DAYS+1 rows",
    "q176_cusum_changepoint": "|days| CUSUM frame",
    "q182_order_backlog": "|days| running-balance frame",
    "q190_weekday_chisq": "<=7-row weekday frame",
    "q191_supplier_sla": "row_number over the SLA_TOP-row limit",
    "q194_mann_whitney_latency": "collapsed |transit-days| rank table",
    "q195_token_yield_curve": "<=101-bin quality yield curve",
    # oracle-parity NTILE below EXACT_AUDIT_MAX_ROWS only; above it
    # exact_audit='auto' selects the distributed tie-class cut
    # (bit-equal to NTILE, pinned in test_exact_audit_gate.py)
    "q192_decile_lift": "NTILE at fixture scale; auto-distributed above",
    "q204_bfs_reach": "<= BFS_MAX_LEVEL+1-row level histogram cumulative",
    "q212_isotonic_calibration": "|price-domain/ISO_BIN_WIDTH|-row prefix frame",
    "q277_hill_tail_index": "row_number over the HILL_K-row limit",
    # the waterline cumulative runs on the quality-BUCKET collapse
    # (score_u div CURR_BUCKET_W — <= 21 rows at any SF); the
    # per-source stage-1 window is partitioned, not global
    "q309_token_budget_curriculum": "<=21-row quality-bucket cumulative",
    # q309's waterline window inherited by the funnel's final stage
    "q311_curation_token_waterfall": "<=21-row quality-bucket cumulative",
    # q309's waterline window inherited by the coverage audit's take
    "q312_take_coverage_audit": "<=21-row quality-bucket cumulative",
}


def _global_windows(df) -> list[str]:
    """Window/WindowGroupLimit physical nodes with an EMPTY partition
    spec (walks sparkPlan: under AQE, executedPlan is an adaptive root
    whose children() are empty before execution)."""
    found: list[str] = []

    def walk(node) -> None:
        if "Window" in node.nodeName():
            try:
                if node.partitionSpec().size() == 0:
                    found.append(node.nodeName())
            except Exception:
                pass
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i))

    walk(df._jdf.queryExecution().sparkPlan())
    return found


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_global_windows_are_allowlisted_bounded(name, spark):
    gw = _global_windows(QUERIES[name](spark, SF_DIR))
    if gw and name not in GLOBAL_WINDOW_BOUNDED:
        raise AssertionError(
            f"{name}: unpartitioned window(s) {gw} not in "
            "GLOBAL_WINDOW_BOUNDED — single-partition WindowExec at scale; "
            "collapse to a bounded domain first or document the bound here"
        )
    if not gw and name in GLOBAL_WINDOW_BOUNDED:
        raise AssertionError(
            f"{name}: listed in GLOBAL_WINDOW_BOUNDED but plans no global "
            "window — remove the stale entry"
        )


def test_q246_disjunction_residuals_pushed(spark):
    """Q19's OR-of-conjunctions must leave per-table residuals in the
    scans: a quantity envelope on lineitem and a brand disjunction on
    part — the whole point of the disjunctive shape."""
    import re

    plan = (
        QUERIES["q246_disjunctive_revenue"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pushed = re.findall(r"PushedFilters: \[[^\]]*", plan)
    assert any("l_quantity" in p for p in pushed), pushed
    assert any("p_brand" in p for p in pushed), pushed
