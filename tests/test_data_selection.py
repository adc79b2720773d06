"""Semantic invariants of the data-selection operators (q96-q99).

The hash-parity suite (test_oracle_parity) pins exact values; these pin
the PROPERTIES a refactor must not break — Bloom filters never produce
false negatives, SemDeDup anchors precede their dups in the same
cluster, DSIR weights separate the target slice, the filter chain's
verdict agrees with its component flags.
"""

from __future__ import annotations

import math

from datapipeline_dags_spark.plans.all import QUERIES
from datapipeline_dags_spark.plans.llm_ops import (
    BLOOM_K,
    CHAIN_MIN_QUALITY,
    CHAIN_MIN_WORDS,
    DSIR_TARGET_LANG,
    SEMDEDUP_T,
    SEMDEDUP_TWO_LEVEL_AUTO_K,
    q96_semantic_dedup,
    resolve_semdedup_knobs,
)


def test_semdedup_auto_knobs():
    """The registered default flips to the scale-safe path exactly at
    the documented threshold: two-level routing above AUTO_K, BLAS pair
    backend whenever numpy imports (always, in this env), and explicit
    knobs always win over the auto choice."""
    k = SEMDEDUP_TWO_LEVEL_AUTO_K
    assert resolve_semdedup_knobs(k, None, None) == (False, "numpy")
    assert resolve_semdedup_knobs(k + 1, None, None) == (True, "numpy")
    assert resolve_semdedup_knobs(k * 10, None, None) == (True, "numpy")
    # explicit knobs are never overridden (the oracle A/B path)
    assert resolve_semdedup_knobs(k * 10, False, "jvm") == (False, "jvm")
    assert resolve_semdedup_knobs(2, True, "numpy") == (True, "numpy")


def test_bloom_no_false_negatives(spark, sf_dir):
    """The defining Bloom guarantee: a digest that IS in the base always
    probes all-K-set — exact_dup implies bloom_dup, for every row."""
    rows = QUERIES["q98_bloom_incremental_dedup"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.exact_dup:
            assert r.bloom_dup, f"false negative at doc {r.doc_id}"
        assert r.false_positive == (r.bloom_dup and not r.exact_dup)


def test_semdedup_anchor_invariants(spark, sf_dir):
    """Every pruned vector's anchor is a LOWER id in the SAME cell with
    cosine >= the threshold, and a vector is pruned at most once."""
    rows = QUERIES["q96_semantic_dedup"](spark, sf_dir).collect()
    assert rows, "fixture should contain semantic dups"
    seen = set()
    for r in rows:
        assert r.dup_of < r.vec_id
        assert r.cos_sim >= SEMDEDUP_T
        assert r.vec_id not in seen, "vector pruned twice"
        seen.add(r.vec_id)


def test_semdedup_blocking_is_subset_of_unblocked(spark, sf_dir):
    """With ONE cell (no blocking) every above-threshold vector is
    pruned — the maximal set.  Any blocking can only LOSE prunes (a
    vec's anchor lands in another cell), never invent them: the pruned
    vec set under the default quantizer must be a subset of the
    unblocked one.  (Cells from different n_centroids are NOT nested —
    the quantizer is a sample, not a hierarchy — so only the
    single-cell comparison is a sound invariant.)"""
    unblocked = {
        r.vec_id for r in q96_semantic_dedup(spark, sf_dir, n_centroids=1).collect()
    }
    blocked = {r.vec_id for r in QUERIES["q96_semantic_dedup"](spark, sf_dir).collect()}
    assert blocked <= unblocked
    assert unblocked, "threshold should fire somewhere"


def test_semdedup_two_level_is_valid_blocking(spark, sf_dir):
    """The hierarchical assignment is a different — but equally valid —
    blocking: its prunes still satisfy every per-row invariant and stay
    inside the unblocked (single-cell) maximal set."""
    rows = q96_semantic_dedup(spark, sf_dir, two_level=True).collect()
    unblocked = {
        r.vec_id for r in q96_semantic_dedup(spark, sf_dir, n_centroids=1).collect()
    }
    for r in rows:
        assert r.dup_of < r.vec_id
        assert r.cos_sim >= SEMDEDUP_T
        assert r.vec_id in unblocked
    # deterministic across invocations (same routing, same argmax ties)
    again = {(r.vec_id, r.dup_of) for r in q96_semantic_dedup(spark, sf_dir, two_level=True).collect()}
    assert {(r.vec_id, r.dup_of) for r in rows} == again


def test_semdedup_numpy_backend_matches_jvm(spark, sf_dir):
    """The BLAS pair backend must produce the same pruned set, anchors,
    and (6-dp rounded) cosines as the oracle-checked JVM backend on the
    fixture — the cheap guarantee that the fast path computes the same
    operator."""
    jvm = {
        (r.vec_id, r.dup_of, r.cell, r.cos_sim)
        for r in QUERIES["q96_semantic_dedup"](spark, sf_dir).collect()
    }
    npb = {
        (r.vec_id, r.dup_of, r.cell, r.cos_sim)
        for r in q96_semantic_dedup(spark, sf_dir, pair_backend="numpy").collect()
    }
    assert jvm == npb


def test_dsir_separates_target_slice(spark, sf_dir):
    """Mean importance weight of target-language docs must exceed the
    non-target mean — the whole point of the likelihood ratio."""
    docs = QUERIES["q97_dsir_importance"](spark, sf_dir)
    from datapipeline_dags_spark.catalog import table

    langs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    rows = docs.join(langs, "doc_id").collect()
    tgt = [r.avg_loglr for r in rows if r.lang == DSIR_TARGET_LANG]
    rest = [r.avg_loglr for r in rows if r.lang != DSIR_TARGET_LANG]
    assert tgt and rest
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    # the synthetic corpus shares one small vocabulary across langs, so
    # the separation is small — but its SIGN is the operator's contract
    assert mean(tgt) > mean(rest)
    assert all(math.isfinite(r.avg_loglr) for r in rows)


def test_filter_chain_verdict_consistency(spark, sf_dir):
    """keep == AND of the component flags; drop_reason is the FIRST
    failing stage in declared order; thresholds match the constants."""
    rows = QUERIES["q99_quality_filter_chain"](spark, sf_dir).collect()
    assert rows
    reasons = set()
    for r in rows:
        assert r.keep == (r.len_ok and r.quality_ok and r.repetition_ok and r.lang_ok)
        assert r.len_ok == (r.n_words >= CHAIN_MIN_WORDS)
        assert r.quality_ok == (r.quality >= CHAIN_MIN_QUALITY)
        expect = (
            "too_short"
            if not r.len_ok
            else "low_quality"
            if not r.quality_ok
            else "repetitive"
            if not r.repetition_ok
            else "lang_mismatch"
            if not r.lang_ok
            else "kept"
        )
        assert r.drop_reason == expect
        reasons.add(r.drop_reason)
    assert "kept" in reasons and len(reasons) >= 4, reasons
