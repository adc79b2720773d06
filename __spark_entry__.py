"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()``   — every implemented operator from SURVEY.md §2
                  (populated from datapipeline_dags_spark.plans).
``oracle_sql()``— matching DuckDB oracle SQL per query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datapipeline_dags_spark.plans.all import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


# Driver-gate rotation (VERDICT r3 ask #2): the driver's CORRECTNESS
# artifact samples the 50 most-recently-registered queries, so a corpus
# growing faster than the window leaves old queries perpetually
# unchecked.  41 of 124 queries had no driver row after r1-r3 (union in
# README.md "Driver correctness coverage").  ``queries()`` therefore
# returns the registry re-ordered so the tail-50 window = those 41
# never-checked queries + 9 queries whose implementation changed this
# round — closing the union at 124/124.  Rounds >= 5 rotate the tail to
# whatever is least-recently-checked.
_ROTATION_TAIL = [
    # New this round but OUTSIDE the 50-slot window (the 41 stale + the
    # changed q42 + 8 highest-risk new queries fill it): these 11 get
    # their driver rows next round and are covered by the full
    # check_oracle sweep meanwhile.
    "q128_zipf_vocab_audit",
    "q129_source_score_calibration",
    "q132_data_card",
    "q134_cross_source_dup_matrix",
    "q136_length_histogram",
    "q138_label_balance",
    "q139_normalization_audit",
    "q140_pit_tier_revenue",
    "q141_ship_latency_percentiles",
    "q142_basket_affinity",
    "q143_market_concentration",
    "q144_prefix_filter_jaccard",
    "q145_multitouch_attribution",
    "q146_pareto_frontier",
    "q147_source_overlap_sketch",
    "q148_train_val_test_split",
    "q149_session_paths",
    "q150_value_trend",
    "q151_key_skew_diagnosis",
    "q152_kgram_redundancy",
    "q153_rrf_fusion",
    "q154_quantile_sketch",
    "q155_bootstrap_ci",
    "q156_score_auc",
    "q157_nation_year_margin",
    "q158_token_weighted_median",
    "q159_ann_ndcg",
    "q160_zorder_layout",
    "q161_incremental_rollup",
    "q162_rolling_active_users",
    "q163_seasonal_anomalies",
    "q164_abc_brands",
    "q165_rfm_segments",
    "q166_ensemble_score_blend",
    "q167_conversion_latency",
    "q168_json_props_profile",
    "q169_benford_audit",
    "q170_total_reconciliation",
    "q171_wow_growth",
    "q172_cluster_size_distribution",
    "q173_cluster_cohesion",
    # ---- the driver's tail-50 window starts here ----
    # changed this round (q42's result set changed: 64-bit signatures):
    "q42_dedup_simhash",
    # new this round, highest-risk first (multi-stage plans / composed
    # operators / chunk-distributed blocking):
    "q125_tfidf_sparse_cosine",
    "q126_embedding_outliers",
    "q127_knn_label_audit",
    "q130_shard_assignment",
    "q131_containment_dedup",
    "q133_boilerplate_segments",
    "q135_minhash_calibration",
    "q137_survivorship_funnel",
    # the 41 with no CORRECTNESS_r01..r03 row, original order:
    "q90_ann_recall",
    "q93_duplicate_spans",
    "q94_pii_redaction",
    "q95_eval_decontamination",
    "q96_semantic_dedup",
    "q97_dsir_importance",
    "q98_bloom_incremental_dedup",
    "q99_quality_filter_chain",
    "q101_bpe_merges",
    "q102_bpe_tokenize",
    "q103_segment_dedup",
    "q104_pmi_collocations",
    "q105_alpha_mixture_sample",
    "q106_token_cleaning",
    "q107_token_entropy",
    "q109_lsh_decontamination",
    "q110_source_quota_cap",
    "q111_winsorized_stats",
    "q112_ann_ivfpq",
    "q114_column_profile",
    "q115_k_anonymity",
    "q116_random_projection",
    "q117_count_min_sketch",
    "q119_corpus_diff",
    "q120_mixing_schedule",
    "q121_bigram_lm_score",
    "q122_cluster_representatives",
    "q91_image_phash_neardup",
    "q32_right_outer_unused_parts",
    "q33_full_outer_yearly_spend",
    "q34_cross_join_status_grid",
    "q35_dense_rank_lead",
    "q36_approx_count_distinct",
    "q92_set_ops_keys",
    "q89_dq_checks",
    "q37_map_funcs",
    "q38_json_codec",
    "q39_extended_json_codec",
    "q67_binary_codec",
    "q82_value_histogram",
    "q83_stats_aggregates",
]


def _rotated(names: dict[str, object]) -> list[str]:
    tail = [n for n in _ROTATION_TAIL if n in names]
    head = [n for n in names if n not in set(tail)]
    return head + tail


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: QUERIES[n] for n in _rotated(QUERIES)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (absent ⇒ rows-only check)."""
    return {n: ORACLES[n] for n in _rotated(ORACLES)}
