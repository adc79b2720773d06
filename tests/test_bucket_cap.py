"""Candidate-bucket cap semantics (q41/q42/q69/q80 blocking family).

An oversized bucket must be TRUNCATED to its BUCKET_CAP smallest
members — never dropped wholesale (a dropped hot band loses ALL of its
pairs at scale) — and the cap firing must be observable via
``BUCKET_OBSERVATIONS``, not silent.
"""

from __future__ import annotations

import itertools

import pytest

from datapipeline_dags_spark.plans import llm_ops


@pytest.fixture()
def hot_corpus_dir(spark, tmp_path):
    """12 identical docs (one all-pairs bucket) + 2 distinct docs."""
    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, text, "en", "syn", len(text)) for i in range(1, 13)]
    rows += [
        (100, "one lonely document with completely different words here", "en", "syn", 55),
        (200, "another unrelated piece of text that matches nothing else", "en", "syn", 57),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "sf_hot")
    df.coalesce(1).write.parquet(out + "/documents.parquet")
    return out


def test_oversized_bucket_truncates_to_smallest_members(
    spark, hot_corpus_dir, monkeypatch
):
    monkeypatch.setattr(llm_ops, "BUCKET_CAP", 5)
    got = llm_ops.q41_dedup_minhash_lsh(spark, hot_corpus_dir)
    pairs = {(r.doc_a, r.doc_b) for r in got.collect()}
    # pairs survive among the 5 SMALLEST doc_ids of the hot bucket —
    # the bucket is truncated, not dropped (pre-fix: pairs == set())
    assert pairs == set(itertools.combinations(range(1, 6), 2))

    obs = llm_ops.BUCKET_OBSERVATIONS["q41_dedup_minhash_lsh"].get
    assert obs["capped_buckets"] >= 1
    assert obs["max_bucket_size"] == 12
    assert obs["buckets"] >= obs["capped_buckets"]


def test_cap_not_firing_reports_zero(spark, sf_dir):
    df = llm_ops.q41_dedup_minhash_lsh(spark, sf_dir)
    df.count()
    obs = llm_ops.BUCKET_OBSERVATIONS["q41_dedup_minhash_lsh"].get
    assert obs["capped_buckets"] == 0  # fixture buckets are tiny


def test_q42_oversized_bucket_chunks_without_recall_loss(
    spark, hot_corpus_dir, monkeypatch
):
    """q42 distributes oversized buckets across chunk-pair tasks instead
    of truncating: every pair among the 12 identical docs must survive a
    cap of 5 (pre-chunking: only pairs among the 5 smallest did)."""
    monkeypatch.setattr(llm_ops, "BUCKET_CAP", 5)
    got = llm_ops.q42_dedup_simhash(spark, hot_corpus_dir)
    pairs = {(r.doc_a, r.doc_b) for r in got.collect()}
    assert pairs >= set(itertools.combinations(range(1, 13), 2))
    obs = llm_ops.BUCKET_OBSERVATIONS["q42_dedup_simhash"].get
    assert obs["capped_buckets"] >= 1  # chunk fan-out observed
    assert obs["max_bucket_size"] == 12


def test_q42_emits_each_pair_exactly_once(spark, sf_dir):
    """Identical signatures match in all 4 bands; the first-match-band
    filter (not a distinct shuffle) must still emit each pair once."""
    df = llm_ops.q42_dedup_simhash(spark, sf_dir)
    total = df.count()
    assert df.select("doc_a", "doc_b").distinct().count() == total


def test_q69_truncated_bucket_keeps_transitive_clusters(
    spark, hot_corpus_dir, monkeypatch
):
    monkeypatch.setattr(llm_ops, "BUCKET_CAP", 4)
    got = llm_ops.q69_dedup_clusters(spark, hot_corpus_dir)
    rows = {r.doc_id: (r.cluster_id, r.cluster_size) for r in got.collect()}
    # docs 1..4 survive the anchor-bucket cap and still cluster together
    for d in range(1, 5):
        assert rows[d] == (1, 4)
    obs = llm_ops.BUCKET_OBSERVATIONS["q69_dedup_clusters"].get
    assert obs["capped_buckets"] >= 1
