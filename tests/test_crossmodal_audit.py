"""q297 cross-modal duplicate consistency — both detector states.

The driver fixture's embeddings are text-independent, so the
registered query only ever exercises the DISAGREE band there.  These
fixtures pin both sides: text-derived embeddings put a text near-dup
pair in agree_high; replacing ONE member's vector with an orthogonal
one (a stale / poisoned feature-store row) flips exactly that pair to
disagree.
"""

from __future__ import annotations

import pytest

from datapipeline_dags_spark.plans import llm_ops

#: two documents sharing most shingles (a verified q41 near-dup) + two
#: unrelated documents
_NEAR_A = "the quick brown fox jumps over the lazy dog near the river bank today"
_NEAR_B = "the quick brown fox jumps over the lazy dog near the river bank tonight"
_OTHER1 = "completely different content about astronomy and the orbits of planets"
_OTHER2 = "unrelated words describing cooking recipes and kitchen utensils here"


def _write_fixture(spark, tmp_path, drift_doc: int | None) -> str:
    texts = [(0, _NEAR_A), (1, _NEAR_B), (2, _OTHER1), (3, _OTHER2)]
    docs = spark.createDataFrame(
        [(i, t, "en", "syn", len(t)) for i, t in texts],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # text-derived embeddings: same-ish text -> same-ish vector (simple
    # char-class histogram, deterministic); the drifted doc gets a
    # vector orthogonal to everything text-derived
    def vec(i: int, t: str) -> list[float]:
        if i == drift_doc:
            return [0.0] * 8 + [1.0]
        v = [0.0] * 9
        for w in t.split():
            v[hash_word(w)] += 1.0
        return v

    def hash_word(w: str) -> int:
        return (len(w) * 31 + ord(w[0])) % 8

    emb = spark.createDataFrame(
        [(i, vec(i, t), 0) for i, t in texts],
        "vec_id long, embedding array<float>, label int",
    )
    out = str(tmp_path / f"sf_cmx_{drift_doc}")
    docs.coalesce(1).write.parquet(out + "/documents.parquet")
    emb.coalesce(1).write.parquet(out + "/embeddings.parquet")
    return out


def test_healthy_embeddings_agree_high(spark, tmp_path):
    d = _write_fixture(spark, tmp_path, drift_doc=None)
    rows = {
        r.band: r for r in
        llm_ops.q297_crossmodal_dup_consistency(spark, d).collect()
    }
    assert set(rows) == {"agree_high"}
    assert rows["agree_high"].n_pairs == 1  # the (0, 1) near-dup pair
    assert rows["agree_high"].min_cos >= llm_ops.CMX_HI


def test_drifted_embedding_flips_pair_to_disagree(spark, tmp_path):
    d = _write_fixture(spark, tmp_path, drift_doc=1)
    rows = {
        r.band: r for r in
        llm_ops.q297_crossmodal_dup_consistency(spark, d).collect()
    }
    assert set(rows) == {"disagree"}
    assert rows["disagree"].n_pairs == 1
    assert rows["disagree"].max_cos < llm_ops.CMX_LO


def test_q298_manifest_and_representatives_partition_clusters(spark, sf_dir):
    """manifest ∪ representatives must be EXACTLY the clustered corpus:
    every clustered doc is either kept (q285) or dropped (q298), never
    both, and each drop row names its cluster's keeper."""
    clustered = {
        r.doc_id for r in llm_ops.q69_dedup_clusters(spark, sf_dir).collect()
    }
    kept = {
        r.kept_doc_id
        for r in llm_ops.q285_cluster_representatives(spark, sf_dir).collect()
    }
    manifest = llm_ops.q298_dedup_deletion_manifest(spark, sf_dir).collect()
    dropped = {r.drop_doc_id for r in manifest}
    assert kept | dropped == clustered
    assert not kept & dropped
    assert all(r.kept_doc_id in kept for r in manifest)
    assert all(r.drop_doc_id != r.kept_doc_id for r in manifest)
