"""q314 PQ subspace sweep — frontier structure.

Hash parity is covered by test_oracle_parity; these pin the TRADEOFF
the sweep exists to measure: on the fixture, more subspaces must mean
strictly lower reconstruction MSE and no worse pure-ADC recall, and
the production point (m=16) must agree with q178's distortion audit.
"""

from __future__ import annotations

from datapipeline_dags_spark.plans import llm_ops


def test_q314_frontier_is_monotone(spark, sf_dir):
    rows = sorted(
        llm_ops.q314_pq_subspace_sweep(spark, sf_dir).collect(),
        key=lambda r: r["m"],
    )
    assert [(r["m"], r["d"]) for r in rows] == list(llm_ops.PQ_SWEEP)
    for r in rows:
        assert r["m"] * r["d"] == 64  # full embedding covered
        assert 0 < r["recall_u"] <= 1_000_000
        assert r["mse"] > 0
    for a, b in zip(rows, rows[1:]):
        assert b["mse"] < a["mse"], "more subspaces must cut distortion"
        assert b["recall_u"] >= a["recall_u"], (
            "pure-ADC recall must not degrade with finer quantization"
        )


def test_q314_production_point_matches_q178(spark, sf_dir):
    """The m=16 sweep row re-derives q178's distortion on the same
    codebook: sweep per-vector MSE == sum over subspaces of q178's
    per-subspace MSE (both 6-dp rounded means over the same corpus)."""
    sweep = {
        r["m"]: r
        for r in llm_ops.q314_pq_subspace_sweep(spark, sf_dir).collect()
    }
    per_sub = llm_ops.q178_pq_reconstruction(spark, sf_dir).collect()
    assert len(per_sub) == llm_ops.PQ_M
    total = sum(float(r["mse"]) for r in per_sub)
    assert abs(float(sweep[16]["mse"]) - total) < 1e-4, (
        sweep[16]["mse"],
        total,
    )
