"""q318 margin-based bitext mining — the hub-rejection semantics.

Hash parity vs the DuckDB oracle is covered by test_oracle_parity;
these pin the property the ratio margin exists for (Artetxe & Schwenk
2019): an absolute-cosine cut CANNOT separate a hub (a vector near
everything in the other pool) from a true translation pair, the margin
can.  The planted fixture builds both cases in one block: a true pair
(identical vectors) and a dense hub cluster whose best cosine is high
but whose neighborhood is FLAT (margin ~= 1).
"""

from __future__ import annotations

import numpy as np

from datapipeline_dags_spark.plans import llm_ops


def _planted_embeddings():
    """vec_ids 0..9, one label block.

    - 0 (even) / 1 (odd): identical basis vectors — the true pair.
    - 2,4,6,8 (even): four near-identical 'hub' sources, each at
      cosine ~0.699 to EVERY target 3,5,7,9 — high absolute cosine,
      flat neighborhood, margin ~= 1.
    - 3,5,7,9 (odd): the hub-cluster targets.
    """
    dim = 64
    ones = np.ones(dim) / np.sqrt(dim)
    e0 = np.zeros(dim)
    e0[0] = 1.0

    def pairdiff(i, j):
        v = np.zeros(dim)
        v[i], v[j] = 1.0, -1.0
        return v / np.sqrt(2)

    vecs = {0: e0, 1: e0.copy()}
    theta = 0.05
    for k, hub_id in enumerate((2, 4, 6, 8)):
        u = pairdiff(9 + 2 * k, 10 + 2 * k)
        vecs[hub_id] = np.cos(theta) * ones + np.sin(theta) * u
    for k, tgt_id in enumerate((3, 5, 7, 9)):
        w = pairdiff(1 + 2 * k, 2 + 2 * k)
        vecs[tgt_id] = 0.70 * ones + np.sqrt(1 - 0.49) * w
    return [
        (vid, [float(x) for x in v], 1) for vid, v in sorted(vecs.items())
    ]


def _write_fixture(spark, tmp_path):
    d = tmp_path / "fx"
    d.mkdir(exist_ok=True)
    spark.createDataFrame(
        _planted_embeddings(),
        "vec_id bigint, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_q318_true_pair_mined_mutual(spark, tmp_path):
    fx = _write_fixture(spark, tmp_path)
    out = {r["src_id"]: r for r in llm_ops.q318_bitext_margin_mining(spark, fx).collect()}
    assert 0 in out
    r = out[0]
    assert r["tgt_id"] == 1
    assert r["mutual"] == 1
    assert r["margin_u"] >= llm_ops.BITEXT_MARGIN_T
    assert r["cos_u"] == 1_000_000


def test_q318_hub_rejected_despite_high_cosine(spark, tmp_path):
    """Every hub's best candidate sits at cosine ~0.7 — far above the
    true pair's 4th-best — yet NO hub source passes the margin cut,
    because the hub's whole neighborhood is equally close."""
    fx = _write_fixture(spark, tmp_path)
    rows = llm_ops.q318_bitext_margin_mining(spark, fx).collect()
    mined_srcs = {r["src_id"] for r in rows}
    assert mined_srcs == {0}
    # sanity: the hubs DID have strong candidates (the cut was the
    # margin, not the cosine) — re-derive the raw best cosine per hub
    import itertools

    embs = {v: np.array(e) for v, e, _ in _planted_embeddings()}
    for hub, tgt in itertools.product((2, 4, 6, 8), (3, 5, 7, 9)):
        c = float(
            embs[hub] @ embs[tgt]
            / (np.linalg.norm(embs[hub]) * np.linalg.norm(embs[tgt]))
        )
        assert c > 0.65


def test_q318_fixture_output_shape(spark, sf_dir):
    rows = llm_ops.q318_bitext_margin_mining(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["src_id"] % 2 == 0 and r["tgt_id"] % 2 == 1
        assert r["margin_u"] >= llm_ops.BITEXT_MARGIN_T
        assert r["mutual"] in (0, 1)
    # one row per mined source
    assert len({r["src_id"] for r in rows}) == len(rows)
