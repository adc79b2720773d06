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


# Driver-gate rotation (VERDICT r4 ask #1): CORRECTNESS_r04.json proved
# the driver samples the FIRST 50 entries of ``queries()`` (positions
# 0-49 of the returned order), not the tail as round 4 assumed.  After
# r1-r4 the union of driver-checked queries is 83 of 173; the 90
# never-checked queries are split across BOTH ends so either sampling
# end adds coverage:
#
#   * ``_ROTATION_HEAD`` (positions 0-49) — 50 never-driver-checked
#     queries, ordered: the six whose implementations changed this
#     round (q173 pair cap, q154/q141/q167/q165 exact-audit gating,
#     q112 numpy-encode default) first, then the 11 rotation-overflow
#     queries from VERDICT r4 ask #7, then the highest-risk multi-stage
#     plans (semantic dedup, DSIR, prefix-filter join, ANN harnesses,
#     BPE, sketches).
#   * ``_ROTATION_TAIL`` (positions -50..-1) — the other 40
#     never-checked queries + 10 hedge slots (already-green queries
#     whose families changed recently) in case the sampling end flips
#     again.
#
# Round 6 rotates the head to whatever is least-recently-checked;
# README.md "Driver correctness coverage" tracks the union per round.
_ROTATION_HEAD = [
    # changed this round — need fresh driver rows:
    "q173_cluster_cohesion",
    "q154_quantile_sketch",
    "q141_ship_latency_percentiles",
    "q112_ann_ivfpq",
    "q167_conversion_latency",
    "q165_rfm_segments",
    # new this round (video frame-sample -> per-frame dHash near-dup):
    "q174_video_dhash_neardup",
    # VERDICT r4 ask #7 rotation-overflow queries:
    "q128_zipf_vocab_audit",
    "q129_source_score_calibration",
    "q132_data_card",
    "q134_cross_source_dup_matrix",
    "q136_length_histogram",
    "q138_label_balance",
    "q139_normalization_audit",
    "q140_pit_tier_revenue",
    "q142_basket_affinity",
    "q143_market_concentration",
    # highest-risk never-checked multi-stage plans:
    "q125_tfidf_sparse_cosine",
    "q137_survivorship_funnel",
    "q147_source_overlap_sketch",
    "q96_semantic_dedup",
    "q97_dsir_importance",
    "q144_prefix_filter_jaccard",
    "q159_ann_ndcg",
    "q91_image_phash_neardup",
    "q131_containment_dedup",
    "q133_boilerplate_segments",
    "q135_minhash_calibration",
    "q130_shard_assignment",
    "q126_embedding_outliers",
    "q127_knn_label_audit",
    "q109_lsh_decontamination",
    "q103_segment_dedup",
    "q98_bloom_incremental_dedup",
    "q99_quality_filter_chain",
    "q101_bpe_merges",
    "q102_bpe_tokenize",
    "q122_cluster_representatives",
    "q104_pmi_collocations",
    "q105_alpha_mixture_sample",
    "q106_token_cleaning",
    "q107_token_entropy",
    "q110_source_quota_cap",
    "q111_winsorized_stats",
    "q114_column_profile",
    "q115_k_anonymity",
    "q116_random_projection",
    "q117_count_min_sketch",
    "q119_corpus_diff",
    "q120_mixing_schedule",
]

_ROTATION_TAIL = [
    # the remaining 40 never-driver-checked queries (hedge: covered if
    # the driver samples the tail instead):
    "q145_multitouch_attribution",
    "q149_session_paths",
    "q150_value_trend",
    "q151_key_skew_diagnosis",
    "q160_zorder_layout",
    "q161_incremental_rollup",
    "q162_rolling_active_users",
    "q163_seasonal_anomalies",
    "q171_wow_growth",
    "q93_duplicate_spans",
    "q94_pii_redaction",
    "q95_eval_decontamination",
    "q90_ann_recall",
    "q146_pareto_frontier",
    "q148_train_val_test_split",
    "q152_kgram_redundancy",
    "q153_rrf_fusion",
    "q155_bootstrap_ci",
    "q156_score_auc",
    "q158_token_weighted_median",
    "q166_ensemble_score_blend",
    "q172_cluster_size_distribution",
    "q32_right_outer_unused_parts",
    "q33_full_outer_yearly_spend",
    "q34_cross_join_status_grid",
    "q35_dense_rank_lead",
    "q36_approx_count_distinct",
    "q92_set_ops_keys",
    "q89_dq_checks",
    "q157_nation_year_margin",
    "q164_abc_brands",
    "q169_benford_audit",
    "q170_total_reconciliation",
    "q37_map_funcs",
    "q38_json_codec",
    "q39_extended_json_codec",
    "q67_binary_codec",
    "q82_value_histogram",
    "q83_stats_aggregates",
    "q168_json_props_profile",
    # new-this-round queries (no driver row anywhere yet) + hedge
    # refreshers for recently-changed families:
    "q175_kaplan_meier",
    "q177_calibration_ece",
    "q178_pq_reconstruction",
    "q179_itemset_triples",
    "q180_gini_concentration",
    "q181_duplicate_baskets",
    "q182_order_backlog",
    "q183_part_pagerank",
    "q185_label_silhouette",
    "q121_bigram_lm_score",
]


def _rotated(names: dict[str, object]) -> list[str]:
    head = [n for n in _ROTATION_HEAD if n in names]
    tail = [n for n in _ROTATION_TAIL if n in names]
    placed = set(head) | set(tail)
    middle = [n for n in names if n not in placed]
    return head + middle + tail


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: QUERIES[n] for n in _rotated(QUERIES)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (absent ⇒ rows-only check)."""
    return {n: ORACLES[n] for n in _rotated(ORACLES)}
