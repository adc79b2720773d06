"""Deletion half of the dedup/index lifecycle (VERDICT r10 ask #2).

q299 applies the q298 manifest (tombstone consumption); q300/q301/q302
extend the three IVM families to DELETE deltas.  Hash parity vs the
DuckDB oracle is covered by test_oracle_parity; these tests pin the
STRUCTURAL invariants the hashes can't express — conservation of the
corpus under apply, exact retraction algebra, and the tombstone-to-zero
transition additive-only maintenance can never produce.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipeline_dags_spark.plans import llm_ops


def test_q299_apply_conserves_the_corpus(spark, sf_dir):
    """Per-source and globally: retained + dropped == total, and the
    retained set is exactly corpus minus manifest ids."""
    rows = llm_ops.q299_deletion_manifest_apply(spark, sf_dir).collect()
    assert rows, "apply summary is empty"
    assert all(r["audit_ok"] == 1 for r in rows)
    n_manifest = llm_ops.q298_dedup_deletion_manifest(spark, sf_dir).count()
    assert sum(r["n_dropped"] for r in rows) == n_manifest
    assert sum(r["n_retained"] for r in rows) + n_manifest == sum(
        r["n_docs"] for r in rows
    )
    # dropping strictly shrinks the token volume on this fixture (the
    # manifest is non-empty at every test SF)
    assert n_manifest > 0
    assert sum(r["tokens_retained"] for r in rows) < sum(
        r["tokens_total"] for r in rows
    )


def test_q300_ivf_retraction_is_exact(spark, sf_dir):
    """Signed-partial merge equals the live-corpus recompute in every
    cell, and the live counts reconcile with the id-mod batches."""
    rows = llm_ops.q300_ivf_delete_refresh(spark, sf_dir).collect()
    assert rows and all(r["matches_full"] == 1 for r in rows)
    assert all(r["n_live"] == r["n_base"] + r["n_ins"] - r["n_del"] for r in rows)
    assert all(r["n_live"] > 0 for r in rows)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_live = emb.filter(
        (F.col("vec_id") % llm_ops.IVF_DELTA_MOD) != llm_ops.IVF_DELETE_REM
    ).count()
    assert sum(r["n_live"] for r in rows) == n_live
    # the fixture's deletion batch is non-empty, so retraction ran
    assert sum(r["n_del"] for r in rows) > 0


def test_q301_lsh_retraction_matches_rebuild(spark, sf_dir):
    """Pair-set algebra: incremental = base − retracted + delta, and it
    equals the independent live-corpus rebuild."""
    row = llm_ops.q301_lsh_delete_refresh(spark, sf_dir).collect()[0]
    assert row["matches_full"] == 1
    assert (
        row["n_incremental"]
        == row["n_base_pairs"] - row["n_retracted"] + row["n_delta_pairs"]
    )
    assert row["n_incremental"] == row["n_full"]


def test_q302_bm25_retraction_and_tombstones(spark, sf_dir):
    """df/cf subtraction is exact vs the live recompute, and no
    retracted-to-zero term survives in the reported state."""
    rows = llm_ops.q302_bm25_stats_delete_refresh(spark, sf_dir).collect()
    assert rows and all(r["matches_full"] == 1 for r in rows)
    assert all(r["df_merged"] > 0 for r in rows)
    assert all(
        r["df_merged"] == r["df_base"] + r["df_ins"] - r["df_del"] for r in rows
    )
    # the deletion batch touches the high-df head terms on this fixture,
    # so retraction is visibly non-zero in the report
    assert any(r["df_del"] > 0 for r in rows)


def test_manifest_drives_streaming_tombstones(spark, sf_dir, tmp_path):
    """End-to-end lifecycle: the q298 deletion manifest IS the
    tombstone feed — its drop ids retract from the maintained lexical
    index, and the resulting state equals a from-scratch recompute
    over exactly the corpus q299 retains."""
    from pyspark.sql import functions as F

    from datapipeline_dags_spark.streaming.index_maintenance import (
        LexicalStatsMaintainer,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    manifest = llm_ops.q298_dedup_deletion_manifest(spark, sf_dir).select(
        F.col("drop_doc_id").alias("doc_id")
    )
    m = LexicalStatsMaintainer(spark, str(tmp_path / "lex"))
    m.process_batch(docs.select("doc_id", "text"), 0)
    m.process_batch(
        spark.createDataFrame([], "doc_id bigint, text string"),
        1,
        deletes=manifest,
    )
    retained = docs.join(manifest, "doc_id", "left_anti").select(
        "doc_id", "text"
    )
    assert m.matches_full(1, retained)
    # and the retained cardinality is exactly q299's audit numbers
    rows = llm_ops.q299_deletion_manifest_apply(spark, sf_dir).collect()
    assert retained.count() == sum(r["n_retained"] for r in rows)


def test_q303_flags_planted_benchmark_copy(spark, tmp_path):
    """The positive decontamination case the synthetic fixture lacks:
    plant a train vector that IS a benchmark vector (cosine 1.0) and a
    near-copy, and check the WHOLE output against a pure-python
    mini-oracle of the operator's semantics (md5-order benchmark head,
    6-dp rounded cosine argmax, 0.9 flag floor)."""
    import hashlib
    import math

    dim = 8
    rows = []
    for i in range(70):
        v = [float((i * 31 + j * 17 + (i * j) % 13) % 97 - 48) for j in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        rows.append((i, [x / n for x in v], "base"))
    v7 = list(rows[7][1])
    rows.append((1000, v7, "copy"))
    v7b = [x + (0.001 if j == 0 else 0.0) for j, x in enumerate(v7)]
    n = math.sqrt(sum(x * x for x in v7b))
    rows.append((1001, [x / n for x in v7b], "near"))
    d = tmp_path / "fx"
    d.mkdir()
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label string"
    ).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))

    # ---- pure-python mini-oracle (float32 inputs, like parquet) ----
    import struct as _struct

    f32 = lambda x: _struct.unpack("f", _struct.pack("f", x))[0]  # noqa: E731
    vecs = {i: [f32(x) for x in v] for i, v, _ in rows}
    bench = sorted(
        vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )[: llm_ops.SEMDECON_N]
    bset = set(bench)

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(
            sum(x * x for x in b)
        )
        return round(num / den, 6)

    expect = {}
    for i, v in vecs.items():
        if i in bset:
            continue
        best = max((cos(v, vecs[t]), -t) for t in bench)
        expect[i] = (-best[1], best[0], 1 if best[0] >= llm_ops.SEMDECON_T else 0)

    out = {
        r["train_id"]: (r["matched_test_id"], r["cos_sim"], r["contaminated"])
        for r in llm_ops.q303_semantic_decontamination(spark, str(d)).collect()
    }
    assert set(out) == set(expect)
    for i in expect:
        assert out[i][0] == expect[i][0], (i, out[i], expect[i])
        assert abs(out[i][1] - expect[i][1]) < 1e-9, (i, out[i], expect[i])
        assert out[i][2] == expect[i][2], (i, out[i], expect[i])
    # the planted family flags whenever it is outside the benchmark
    for planted in (1000, 1001):
        if planted in expect:
            assert out[planted][2] == 1, planted
    assert any(f for _, _, f in expect.values()), "no positive case materialized"
