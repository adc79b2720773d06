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
FLOORS = {"lsh": 0.85, "ivf": 0.85, "pq": 0.90, "ivfpq": 0.85}


@pytest.mark.parametrize("n", [1, 100, 256, 500, 2000, 20000, 10**6, 10**9])
def test_ann_params_match_sql(n):
    """The Python parameter rule and the oracle's SQL fragment must
    derive IDENTICAL (n_centroids, nprobe, refine) for any corpus size
    — the cross-engine contract every IVF-family oracle rests on."""
    import duckdb

    con = duckdb.connect()
    # a stand-in `embeddings` view with exactly n rows
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM range({n})")
    row = con.execute(
        f"WITH {llm_ops._ANN_PARAMS_SQL} SELECT n_cent, nprobe, refine FROM ann_p"
    ).fetchone()
    assert tuple(row) == llm_ops.ann_params(n)
    con.close()


def test_ann_params_monotone_and_floored():
    """Parameters never shrink as the corpus grows, and tiny corpora
    stay at the documented floors."""
    assert llm_ops.ann_params(1) == (16, 8, 100)
    prev = None
    for n in (1, 50, 500, 2000, 50000, 10**6):
        cur = llm_ops.ann_params(n)
        if prev is not None:
            assert all(c >= p for c, p in zip(cur, prev))
        prev = cur


def test_q90_oracle_covers_every_roster_method():
    """The hash-checked q90 oracle must re-derive EVERY method in
    ANN_RECALL_METHODS — a method registered into the roster but
    missing from the oracle would silently drop out of the correctness
    gate (the import-order bug this file pins against)."""
    from datapipeline_dags_spark.plans.all import ORACLES

    sql = ORACLES["q90_ann_recall"]
    for name, qname, _k in llm_ops.ANN_RECALL_METHODS:
        assert f"m_{name} " in sql or f"m_{name}\n" in sql, name
        assert f"'{name}'" in sql, name


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
    n_cent, auto_nprobe, _ = llm_ops.ann_params(
        llm_ops.corpus_size(spark, sf_dir)
    )
    sweep = llm_ops.ivf_recall_sweep(
        spark, sf_dir, nprobes=(1, auto_nprobe, n_cent)
    )
    vals = [sweep[n] for n in sorted(sweep)]
    assert vals == sorted(vals)
    assert sweep[n_cent] == 1.0


def test_ivfpq_numpy_encode_matches_jvm(spark):
    """The BLAS encode fast path must produce the IDENTICAL final
    ranking as the oracle-checked JVM HOF encode (same codes, same ADC
    scores, same refine) — the q96 pair_backend discipline applied to
    the PQ encoder."""
    from datapipeline_dags_spark.plans.llm_ops import q112_ann_ivfpq
    from tests.conftest import SF_DIR

    a = (
        q112_ann_ivfpq(spark, SF_DIR, encode_backend="jvm")
        .toPandas()
        .sort_values(["q_id", "rank"])
        .reset_index(drop=True)
    )
    # default (None) auto-selects numpy when it imports — the
    # registered path must be bit-equal to the oracle-parity jvm encode
    b = (
        q112_ann_ivfpq(spark, SF_DIR)
        .toPandas()
        .sort_values(["q_id", "rank"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_audit_frames_injection_is_equal(spark, sf_dir):
    """VERDICT r8 ask #4: q90/q159 with a shared ann_audit_frames dict
    must return exactly the default self-contained results — the
    injection only changes WHERE the persisted inputs come from, never
    the plans that consume them."""
    frames = llm_ops.ann_audit_frames(spark, sf_dir)
    try:
        for fn in (llm_ops.q90_ann_recall, llm_ops.q159_ann_ndcg):
            shared = sorted(map(tuple, fn(spark, sf_dir, frames=frames).collect()))
            own = sorted(map(tuple, fn(spark, sf_dir).collect()))
            assert shared == own, fn.__name__
    finally:
        spark.catalog.clearCache()


def test_pair_scores_injection_is_equal(spark, sf_dir):
    """Optimization r13 (score once, slice five ways): every ANN frame
    built against the shared ``ann_pair_scores`` table (and the shared
    q47/q112 ``cells`` assignment) must return exactly the rows of its
    self-contained default — the injection replaces each frame's own
    re-scoring join with a keyed lookup of the SAME cosine over the
    SAME pairs, never a different score."""
    from pyspark.sql import functions as F

    ps = llm_ops.ann_pair_scores(spark, sf_dir).persist()
    n_cent, _, _ = llm_ops.ann_params(llm_ops.corpus_size(spark, sf_dir))
    cells = llm_ops.ivf_cell_assignment(
        spark, sf_dir, n_cent, backend="numpy"
    ).persist()
    cases = [
        (llm_ops.q45_ann_topk_bruteforce, {"pair_scores": ps}, {}),
        (llm_ops.q46_ann_lsh_bucketed, {"pair_scores": ps}, {}),
        (llm_ops.q47_ann_ivf, {"pair_scores": ps, "cells": cells}, {}),
        (llm_ops.q75_ann_pq, {"pair_scores": ps}, {}),
        (llm_ops.q112_ann_ivfpq, {"pair_scores": ps, "cells": cells}, {}),
    ]
    try:
        for fn, kw, default_kw in cases:
            shared = fn(spark, sf_dir, **kw).filter(
                F.col("q_id") < llm_ops.N_QUERIES
            )
            own = fn(spark, sf_dir, **default_kw).filter(
                F.col("q_id") < llm_ops.N_QUERIES
            )
            assert sorted(map(tuple, shared.collect())) == sorted(
                map(tuple, own.collect())
            ), fn.__name__
    finally:
        spark.catalog.clearCache()


def test_hits_routes_agree(spark, sf_dir, monkeypatch):
    """q294's collected numpy solve (default under HITS_COLLECT_EDGES)
    must be bit-identical to the distributed half-step loop — same L1
    floor renormalization, same (score DESC, id) top cut."""
    collected = sorted(
        tuple(r)
        for r in llm_ops.q294_hits_hubs_authorities(spark, sf_dir).collect()
    )
    monkeypatch.setattr(llm_ops, "HITS_COLLECT_EDGES", 0)
    distributed = sorted(
        tuple(r)
        for r in llm_ops.q294_hits_hubs_authorities(spark, sf_dir).collect()
    )
    assert collected == distributed
    assert len(collected) == 2 * llm_ops.HITS_TOP


def test_q295_hybrid_fusion_properties(spark, sf_dir):
    """q295 composes three retrieval legs via RRF: every fused neighbor
    must come from at least one leg (n_methods counts its memberships
    exactly), fused ranks are contiguous per query, and the lexical
    leg never retrieves the query document itself."""
    from pyspark.sql import functions as F

    rows = llm_ops.q295_hybrid_retrieval(spark, sf_dir).collect()
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r.q_id, []).append(r)
    assert len(per_q) == llm_ops.N_QUERIES
    for q, rs in per_q.items():
        assert sorted(r.fused_rank for r in rs) == list(range(1, len(rs) + 1))
        assert all(1 <= r.n_methods <= 3 for r in rs)

    legs = {}
    legs["lsh"] = {
        (r.q_id, r.neighbor_id)
        for r in llm_ops.q46_ann_lsh_bucketed(spark, sf_dir)
        .filter(F.col("q_id") < llm_ops.N_QUERIES)
        .collect()
    }
    legs["ivf"] = {
        (r.q_id, r.neighbor_id)
        for r in llm_ops.q47_ann_ivf(spark, sf_dir).collect()
    }
    dense = legs["lsh"] | legs["ivf"]
    for r in rows:
        k = (r.q_id, r.neighbor_id)
        # membership in >= n_methods - 1 dense legs implies the lexical
        # leg supplied at most one count; exact per-leg membership for
        # the lexical leg is covered by the DuckDB oracle, but a fused
        # row NO leg produced would show up here as n_methods > dense
        # memberships + 1
        in_dense = (k in legs["lsh"]) + (k in legs["ivf"])
        assert in_dense >= r.n_methods - 1, k
        if r.n_methods - in_dense == 1 and r.q_id == r.neighbor_id:
            raise AssertionError(
                f"lexical leg retrieved the query document itself: {k}"
            )


def test_q295_injected_legs_identical(spark, sf_dir):
    """q296 persists and injects the dense legs into q295's fusion;
    injection must only change WHERE the lists come from, never the
    fused output (the q90/q159 frame-injection contract)."""
    legs = llm_ops._hybrid_dense_legs(spark, sf_dir)
    try:
        legs = {m: df.persist() for m, df in legs.items()}
        shared = sorted(
            map(tuple, llm_ops.q295_hybrid_retrieval(
                spark, sf_dir, legs=legs).collect())
        )
        own = sorted(
            map(tuple, llm_ops.q295_hybrid_retrieval(spark, sf_dir).collect())
        )
        assert shared == own
    finally:
        spark.catalog.clearCache()
