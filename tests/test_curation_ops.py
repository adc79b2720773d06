"""Semantic pins for the round-4 curation operators (q125–q132).

The DuckDB oracles already pin cross-engine equivalence; these tests pin
the OPERATOR SEMANTICS on planted inputs (a contained document is
found, an embedding outlier is flagged, a mislabeled point disagrees
with its neighbors, shards fill to their token budget).
"""

from __future__ import annotations

import pytest

from datapipeline_dags_spark.plans import llm_ops
from datapipeline_dags_spark.plans.all import QUERIES


@pytest.fixture()
def planted_docs_dir(spark, tmp_path):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    host = base + " lambda mu nu xi omicron pi rho sigma tau upsilon"
    rows = [
        (1, base, "en", "web", len(base)),          # contained in 2
        (2, host, "en", "web", len(host)),          # superset of 1
        (3, "one two three four five six seven eight nine ten", "en", "web", 49),
        (4, "completely different words with no shared phrases at all", "en", "books", 57),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "sf_planted")
    df.coalesce(1).write.parquet(out + "/documents.parquet")
    return out


@pytest.fixture()
def planted_emb_dir(spark, tmp_path):
    # label 0: 10 tight vectors around e1; one far outlier (vec 9, along e2)
    # label 1: 5 tight vectors around e2
    rows = []
    for i in range(9):
        rows.append((i, [1.0, 0.01 * i, 0.0, 0.0], 0))
    rows.append((9, [0.0, 10.0, 0.0, 0.0], 0))  # outlier / mislabeled
    for i in range(5):
        rows.append((10 + i, [0.0, 1.0, 0.01 * i, 0.0], 1))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = str(tmp_path / "sf_emb")
    df.coalesce(1).write.parquet(out + "/embeddings.parquet")
    return out


def test_q131_finds_planted_containment(spark, planted_docs_dir):
    rows = {
        (r.doc_sub, r.doc_sup): r.containment
        for r in llm_ops.q131_containment_dedup(spark, planted_docs_dir).collect()
    }
    assert rows[(1, 2)] == 1.0  # every shingle of doc 1 appears in doc 2
    assert (2, 1) not in rows  # the superset is NOT contained in the subset
    assert not any(3 in k or 4 in k for k in rows)


def test_q126_flags_planted_outlier(spark, planted_emb_dir):
    rows = {r.vec_id: r for r in llm_ops.q126_embedding_outliers(spark, planted_emb_dir).collect()}
    assert rows[9].is_outlier
    flagged = [v for v, r in rows.items() if r.is_outlier]
    assert flagged == [9]
    assert rows[9].z > 0


def test_q127_flags_planted_mislabel(spark, planted_emb_dir):
    # all 15 planted vectors sit inside the bounded audit batch (id < 50)
    rows = {r.q_id: r for r in llm_ops.q127_knn_label_audit(spark, planted_emb_dir).collect()}
    assert not rows[9].agree  # vector 9 sits in label-1 space but carries label 0
    assert rows[9].pred_label == 1
    assert rows[0].agree and rows[10].agree


def test_q130_shard_invariants(spark, sf_dir):
    rows = llm_ops.q130_shard_assignment(spark, sf_dir).collect()
    n_shards = max(r.shard_id for r in rows) + 1
    assert all(0 <= r.shard_offset < llm_ops.SHARD_TOKENS for r in rows)
    assert {r.shard_id for r in rows} == set(range(n_shards))
    # total tokens accounted for exactly once
    total = sum(r.n_tokens for r in rows)
    assert total >= (n_shards - 1) * llm_ops.SHARD_TOKENS


def test_q128_zipf_shape(spark, sf_dir):
    row = llm_ops.q128_zipf_vocab_audit(spark, sf_dir).collect()[0]
    assert row.slope < 0  # frequency decreases with rank
    assert 0.0 <= row.r2 <= 1.0


def test_q129_calibration_ranges(spark, sf_dir):
    rows = llm_ops.q129_source_score_calibration(spark, sf_dir).collect()
    assert all(0.0 <= r.pct_rank <= 1.0 for r in rows)
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r.pct_rank)
    for pcts in by_source.values():
        assert max(pcts) == 1.0 and min(pcts) == 0.0


def test_q132_rollup_levels(spark, sf_dir):
    rows = llm_ops.q132_data_card(spark, sf_dir).collect()
    total = {(r.source, r.lang): r.n_docs for r in rows}[("ALL", "ALL")]
    per_source = sum(r.n_docs for r in rows if r.lang == "ALL" and r.source != "ALL")
    per_pair = sum(r.n_docs for r in rows if r.lang != "ALL" and r.source != "ALL")
    assert total == per_source == per_pair


def test_q137_funnel_is_monotone(spark, sf_dir):
    rows = sorted(
        llm_ops.q137_survivorship_funnel(spark, sf_dir).collect(),
        key=lambda r: r.stage,
    )
    assert [r.name for r in rows] == [
        "ingested", "exact_dedup", "neardup_dedup", "quality_chain"
    ]
    counts = [r.n_docs for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert rows[0].frac == 1.0


def test_q135_estimate_error_is_bounded(spark, sf_dir):
    rows = llm_ops.q135_minhash_calibration(spark, sf_dir).collect()
    assert rows  # LSH candidates exist on the fixture
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        # abs_err rounds the RAW difference; comparing rounded columns
        # reproduces it only to rounding precision
        assert abs(abs(r.est_jaccard - r.exact_jaccard) - r.abs_err) < 2e-6
    # 12-hash sketch: mean abs error should be well under one hash step
    mean_err = sum(r.abs_err for r in rows) / len(rows)
    assert mean_err < 2 / llm_ops.MINHASH_H


def test_q139_normalization_idempotent(spark, sf_dir):
    from pyspark.sql import functions as F

    out = llm_ops.q139_normalization_audit(spark, sf_dir)
    # normalizing an already-normalized doc must be a no-op: docs whose
    # text was unchanged keep identical before/after char counts
    bad = out.filter(
        (~F.col("changed")) & (F.col("n_chars_before") != F.col("n_chars_after"))
    ).count()
    assert bad == 0


def test_q134_matrix_totals_match_q41(spark, sf_dir):
    pairs = llm_ops.q41_dedup_minhash_lsh(spark, sf_dir).count()
    matrix = llm_ops.q134_cross_source_dup_matrix(spark, sf_dir)
    assert sum(r.n_pairs for r in matrix.collect()) == pairs


def test_q140_tier_progression(spark, sf_dir):
    rows = {r.tier: r for r in
            QUERIES["q140_pit_tier_revenue"](spark, sf_dir).collect()}
    assert set(rows) == {"bronze", "silver", "gold"}
    assert all(r.n_items > 0 for r in rows.values())


def test_q142_lift_properties(spark, sf_dir):
    rows = QUERIES["q142_basket_affinity"](spark, sf_dir).collect()
    assert 0 < len(rows) <= llm_ops.__dict__.get("BASKET_TOP", 20) or rows
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    assert all(r.part_a < r.part_b for r in rows)
    assert all(r.n_ab >= 2 for r in rows)


def test_q143_hhi_bounds(spark, sf_dir):
    rows = QUERIES["q143_market_concentration"](spark, sf_dir).collect()
    for r in rows:
        # HHI lies in [1/n, 1]
        assert 1.0 / r.n_suppliers - 1e-6 <= r.hhi <= 1.0 + 1e-6
