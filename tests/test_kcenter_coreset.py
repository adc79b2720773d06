"""q320 k-center greedy coreset — the farthest-point semantics.

Hash parity vs the DuckDB oracle is covered by test_oracle_parity;
these pin the GREEDY properties: the radius curve is monotone
non-increasing, picks are distinct, and on a planted three-cluster
fixture the first three picks land in three DIFFERENT clusters (the
diversity guarantee an MMR/centroid selection does not give) with the
radius collapsing once every cluster holds a center.
"""

from __future__ import annotations

import numpy as np

from datapipeline_dags_spark.plans import llm_ops


def test_q320_radius_monotone_and_picks_distinct(spark, sf_dir):
    rows = sorted(
        llm_ops.q320_kcenter_coreset(spark, sf_dir).collect(),
        key=lambda r: r["pick_rank"],
    )
    assert [r["pick_rank"] for r in rows] == list(
        range(1, llm_ops.KCENTER_K + 1)
    )
    assert len({r["vec_id"] for r in rows}) == len(rows)
    radii = [r["radius_u"] for r in rows]
    assert all(a >= b for a, b in zip(radii, radii[1:]))
    assert all(0 <= x <= 2_000_000 for x in radii)


def test_q320_three_clusters_covered_first(spark, tmp_path):
    """30 vectors in 3 orthogonal clusters (tight intra-cluster cones):
    picks 1-3 must land in 3 distinct clusters, and the radius after 3
    centers must be an order of magnitude below the radius after 1."""
    dim = 64
    rng_vectors = []
    vid = 0
    for c in range(3):
        base = np.zeros(dim)
        base[c] = 1.0
        for j in range(10):
            v = base.copy()
            # deterministic tiny perturbation inside the cluster cone
            v[10 + c * 10 + (j % 8)] += 0.05 + 0.003 * j
            v /= np.linalg.norm(v)
            rng_vectors.append((vid, [float(x) for x in v], c))
            vid += 1
    d = tmp_path / "fx"
    d.mkdir()
    spark.createDataFrame(
        rng_vectors, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))

    rows = sorted(
        llm_ops.q320_kcenter_coreset(spark, str(d)).collect(),
        key=lambda r: r["pick_rank"],
    )
    cluster_of = {v: lab for v, _, lab in rng_vectors}
    first3 = [cluster_of[r["vec_id"]] for r in rows[:3]]
    assert sorted(first3) == [0, 1, 2]
    # inter-cluster distance ~1e6 (orthogonal); intra ~ a few thousand
    assert rows[0]["radius_u"] > 900_000
    assert rows[2]["radius_u"] < 100_000


def test_q320_small_corpus_stops_at_n(spark, tmp_path):
    """Fewer vectors than KCENTER_K: one row per vector, no duplicate
    picks, loop terminates at n."""
    dim = 8
    vecs = []
    for i in range(3):
        v = np.zeros(dim)
        v[i] = 1.0
        vecs.append((i, [float(x) for x in v], 0))
    d = tmp_path / "fx"
    d.mkdir()
    spark.createDataFrame(
        vecs, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    rows = llm_ops.q320_kcenter_coreset(spark, str(d)).collect()
    assert len(rows) == 3
    assert len({r["vec_id"] for r in rows}) == 3
