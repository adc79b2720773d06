"""Batched BPE training (bpe_train) vs the merge-at-a-time greedy loop.

The production trainer applies the top-B pairwise non-interacting pairs
per round; on the fixture the batch condition holds, so the merge SET
must equal sequential greedy's, and batch_size=1 must reproduce q101's
oracled merge table exactly.
"""

from __future__ import annotations

from datapipeline_dags_spark.plans import llm_ops


def _rows(df):
    return [
        (r.merge_round, r.pair, r.merged, r.pair_count)
        for r in df.collect()
    ]


def test_batch_size_1_reproduces_q101_merge_table(spark, sf_dir):
    got = _rows(llm_ops.bpe_train(spark, sf_dir, llm_ops.BPE_ROUNDS, batch_size=1))
    want = sorted(_rows(llm_ops.q101_bpe_merges(spark, sf_dir)))
    assert sorted(got) == want


def test_batched_merge_set_matches_sequential_greedy(spark, sf_dir):
    seq = _rows(llm_ops.bpe_train(spark, sf_dir, 6, batch_size=1))
    bat = _rows(llm_ops.bpe_train(spark, sf_dir, 6, batch_size=3))
    # same merges, applied in fewer rounds
    assert {r[1:3] for r in seq} == {r[1:3] for r in bat}
    assert max(r[0] for r in bat) < max(r[0] for r in seq)
    # per-pair weighted counts agree wherever a pair was counted before
    # any interacting merge (the fixture batches are non-interacting)
    seq_counts = {r[1]: r[3] for r in seq}
    for _, pair, _, cnt in bat:
        assert seq_counts[pair] == cnt


def test_batch_rounds_apply_only_non_interacting_pairs(spark, sf_dir):
    bat = _rows(llm_ops.bpe_train(spark, sf_dir, 9, batch_size=3))
    by_round: dict[int, list[str]] = {}
    for rnd, pair, _, _ in bat:
        by_round.setdefault(rnd, []).append(pair)
    for pairs in by_round.values():
        symbols: list[str] = []
        for p in pairs:
            symbols += p.split(" ")
        assert len(symbols) == len(set(symbols)), f"interacting batch: {pairs}"
