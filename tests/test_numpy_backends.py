"""Bit-equality of the r12 numpy scoring backends vs their JVM twins.

The optimization round moved the ANN family's hottest per-row math
(pair cosines, the IVF argmax assignment, the PQ argmin encode) behind
backend knobs whose numpy side runs vectorized per Arrow batch but with
the SAME IEEE operation sequence as the HOF fold (dimension-index
accumulation, first-extremum ties over ascending cids, rounding left in
the JVM).  These tests pin that claim: both backends must produce
IDENTICAL rows — not approximately, exactly — so the driver's oracle
hash can never depend on which backend ran.
"""

from __future__ import annotations

from datapipeline_dags_spark.plans import llm_ops


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _assert_backends_equal(spark, a_df, b_df):
    ra, rb = _rows(a_df), _rows(b_df)
    spark.catalog.clearCache()
    assert ra == rb
    assert len(ra) > 0


def test_q45_score_backends_bit_equal(spark, sf_dir):
    _assert_backends_equal(
        spark,
        llm_ops.q45_ann_topk_bruteforce(spark, sf_dir, score_backend="numpy"),
        llm_ops.q45_ann_topk_bruteforce(spark, sf_dir, score_backend="jvm"),
    )


def test_q46_score_backends_bit_equal(spark, sf_dir):
    _assert_backends_equal(
        spark,
        llm_ops.q46_ann_lsh_bucketed(spark, sf_dir, score_backend="numpy"),
        llm_ops.q46_ann_lsh_bucketed(spark, sf_dir, score_backend="jvm"),
    )


def test_q47_score_backends_bit_equal(spark, sf_dir):
    _assert_backends_equal(
        spark,
        llm_ops.q47_ann_ivf(spark, sf_dir, score_backend="numpy"),
        llm_ops.q47_ann_ivf(spark, sf_dir, score_backend="jvm"),
    )


def test_ivf_assignment_backends_bit_equal(spark, sf_dir):
    _assert_backends_equal(
        spark,
        llm_ops.ivf_cell_assignment(spark, sf_dir, backend="numpy").select(
            "vec_id", "cell"
        ),
        llm_ops.ivf_cell_assignment(spark, sf_dir, backend="jvm").select(
            "vec_id", "cell"
        ),
    )


def test_q75_backends_bit_equal(spark, sf_dir):
    _assert_backends_equal(
        spark,
        llm_ops.q75_ann_pq(spark, sf_dir, backend="numpy"),
        llm_ops.q75_ann_pq(spark, sf_dir, backend="jvm"),
    )


def test_q42_sig_backends_bit_equal(spark, sf_dir):
    _assert_backends_equal(
        spark,
        llm_ops.q42_dedup_simhash(spark, sf_dir, sig_backend="numpy"),
        llm_ops.q42_dedup_simhash(spark, sf_dir, sig_backend="jvm"),
    )


def test_spread_small_gates_on_corpus_rows(spark):
    df = spark.range(100)
    # small regime: re-spread to defaultParallelism
    spread = llm_ops._spread_small(spark, df, corpus_rows=10)
    assert (
        spread.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # large regime: untouched frame (no extra shuffle at scale)
    assert llm_ops._spread_small(
        spark, df, corpus_rows=llm_ops.SPREAD_GATE_ROWS + 1
    ) is df


def test_q314_backends_bit_equal(spark, sf_dir):
    _assert_backends_equal(
        spark,
        llm_ops.q314_pq_subspace_sweep(spark, sf_dir, backend="numpy"),
        llm_ops.q314_pq_subspace_sweep(spark, sf_dir, backend="jvm"),
    )


def test_kmeans_assign_backends_bit_equal(spark, sf_dir):
    from datapipeline_dags_spark.plans import mining

    a, _ = mining._kmeans_final(spark, sf_dir, assign_backend="numpy")
    b, _ = mining._kmeans_final(spark, sf_dir, assign_backend="jvm")
    ra = sorted(map(tuple, a.select("vec_id", "cid", "dist").collect()))
    rb = sorted(map(tuple, b.select("vec_id", "cid", "dist").collect()))
    assert ra == rb and len(ra) > 0
