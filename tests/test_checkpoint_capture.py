"""The iterative-plan audit hook (checkpoint.CAPTURE): per-round
pre-checkpoint plans are recorded for PLANS.md's ITER flag, and the
hook stays inert (None) outside audits."""

from __future__ import annotations

from datapipeline_dags_spark import checkpoint
from datapipeline_dags_spark.plans.all import QUERIES


def test_pagerank_rounds_captured(spark, sf_dir, monkeypatch):
    # force the distributed loop (the default collects-and-solves under
    # PR_COLLECT_EDGES, planning no checkpoint rounds at all)
    from datapipeline_dags_spark.plans import relational

    monkeypatch.setattr(relational, "PR_COLLECT_EDGES", 0)
    checkpoint.CAPTURE = []
    try:
        QUERIES["q183_part_pagerank"](spark, sf_dir)
        rounds = [c for c in checkpoint.CAPTURE if "round" in c[0]]
    finally:
        checkpoint.CAPTURE = None
    # Since r8 the loop checkpoints every SECOND round (plus the last),
    # so ceil(PR_ITERS/2) captures land, each carrying the REAL one- or
    # two-round structure (shuffles visible), not a checkpointed-RDD
    # scan.
    from datapipeline_dags_spark.plans.relational import PR_ITERS

    assert len(rounds) == (PR_ITERS + 1) // 2
    assert all("Exchange" in plan for _, plan in rounds)


def test_connected_components_rounds_captured(spark, sf_dir, monkeypatch):
    # force the distributed propagation (the r12 default collects-and-
    # solves under CC_COLLECT_EDGES, planning no checkpoint rounds)
    from datapipeline_dags_spark.operators import graph

    monkeypatch.setattr(graph, "CC_COLLECT_EDGES", 0)
    checkpoint.CAPTURE = []
    try:
        QUERIES["q69_dedup_clusters"](spark, sf_dir)
        rounds = [c for c in checkpoint.CAPTURE if "cc_round" in c[0]]
    finally:
        checkpoint.CAPTURE = None
    assert rounds, "no CC rounds captured"
    assert all("Exchange" in plan for _, plan in rounds)


def test_capture_off_by_default():
    assert checkpoint.CAPTURE is None
