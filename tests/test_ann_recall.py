"""ANN quality floors (q90): each approximate operator's recall@k vs the
exact q45 baseline must stay above its stated floor on the fixture.

The floors are the measured fixture values minus a small safety margin —
they pin the quality contract so a future "optimization" that quietly
destroys recall (the failure mode q90 exists to catch) fails CI.
"""

from __future__ import annotations

import pytest

from datapipeline_dags_spark.plans import llm_ops

#: method -> recall floor at the default operator settings (sf0.001 AND
#: sf0.01 both measured above these; near-isotropic synthetic vectors
#: are the worst case for sign-LSH, hence its lower tier).
FLOORS = {"lsh": 0.60, "ivf": 0.85, "pq": 0.90, "ivfpq": 0.85}


@pytest.fixture(scope="module")
def recalls(spark, sf_dir):
    rows = llm_ops.q90_ann_recall(spark, sf_dir).collect()
    return {r.method: (float(r.recall), r.k, r.n_queries) for r in rows}


@pytest.mark.parametrize("method", sorted(FLOORS))
def test_recall_floor(recalls, method):
    recall, k, n_queries = recalls[method]
    assert n_queries == llm_ops.N_QUERIES
    assert recall >= FLOORS[method], (
        f"{method} recall@{k} = {recall} below floor {FLOORS[method]}"
    )


def test_ivf_recall_monotone_in_nprobe(spark, sf_dir):
    """More probed cells may only widen the candidate set, so recall is
    monotone non-decreasing in nprobe — and reaches 1.0 when every cell
    is probed (the candidate set becomes the whole corpus)."""
    sweep = llm_ops.ivf_recall_sweep(
        spark, sf_dir, nprobes=(1, llm_ops.NPROBE, llm_ops.N_CENTROIDS)
    )
    vals = [sweep[n] for n in sorted(sweep)]
    assert vals == sorted(vals)
    assert sweep[llm_ops.N_CENTROIDS] == 1.0


def test_ivfpq_numpy_encode_matches_jvm(spark):
    """The BLAS encode fast path must produce the IDENTICAL final
    ranking as the oracle-checked JVM HOF encode (same codes, same ADC
    scores, same refine) — the q96 pair_backend discipline applied to
    the PQ encoder."""
    from datapipeline_dags_spark.plans.llm_ops import q112_ann_ivfpq
    from tests.conftest import SF_DIR

    a = (
        q112_ann_ivfpq(spark, SF_DIR)
        .toPandas()
        .sort_values(["q_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        q112_ann_ivfpq(spark, SF_DIR, encode_backend="numpy")
        .toPandas()
        .sort_values(["q_id", "rank"])
        .reset_index(drop=True)
    )
    assert a.equals(b)
