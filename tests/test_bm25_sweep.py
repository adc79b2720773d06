"""q315 BM25 (k1, b) sweep — structure and q287 cross-check.

Hash parity is covered by test_oracle_parity; these pin (a) the sweep's
default config reproduces the REGISTERED q287 list exactly (same
quantization, same tiebreaks), and (b) the sweep surface is sane: every
config fills the top-k, the default row self-overlaps fully, and the
swept corners genuinely move the ranking on the fixture.
"""

from __future__ import annotations

from datapipeline_dags_spark.plans import llm_ops


def test_q315_default_config_equals_q287(spark, sf_dir):
    default_docs = {
        r["doc_id"] for r in llm_ops.q287_bm25_topk(spark, sf_dir).collect()
    }
    rows = {
        (r["k1_milli"], r["b_milli"]): r
        for r in llm_ops.q315_bm25_param_sweep(spark, sf_dir).collect()
    }
    dk, db = llm_ops.BM25_SWEEP[0]
    assert (dk, db) == (1200, 750)  # q287's production constants
    d = rows[(dk, db)]
    assert d["n_top"] == len(default_docs) == llm_ops.BM25_TOP
    assert d["n_overlap_default"] == llm_ops.BM25_TOP
    assert d["overlap_u"] == 1_000_000


def test_q315_sweep_surface_is_sane(spark, sf_dir):
    rows = llm_ops.q315_bm25_param_sweep(spark, sf_dir).collect()
    assert len(rows) == len(llm_ops.BM25_SWEEP)
    for r in rows:
        assert r["n_top"] == llm_ops.BM25_TOP
        assert 0 < r["n_overlap_default"] <= llm_ops.BM25_TOP
        assert r["overlap_u"] == (
            r["n_overlap_default"] * 1_000_000 // llm_ops.BM25_TOP
        )
        assert r["score_sum_micro"] > 0
    # the swept corners genuinely move the ranking on the fixture
    non_default = [
        r
        for r in rows
        if (r["k1_milli"], r["b_milli"]) != llm_ops.BM25_SWEEP[0]
    ]
    assert any(
        r["n_overlap_default"] < llm_ops.BM25_TOP for r in non_default
    ), "sweep corners did not change the top-k at all"
