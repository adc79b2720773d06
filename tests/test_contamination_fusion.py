"""q310 contamination fusion — planted positives + precedence.

The synthetic fixture barely fires either channel, so these tests
plant (a) an exact cross-split duplicate (lexical channel, q109) that
is ALSO an embedding copy of a benchmark vector (semantic channel,
q303) — the fused verdict must be 'lexical' (precedence, counted
once) — and (b) a semantic-only leak; and pin the per-source partition
audit on the planted corpus.
"""

from __future__ import annotations

import hashlib

from datapipeline_dags_spark.plans import llm_ops


def _bucket(i: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % llm_ops.EVAL_MOD


def _fixture(spark, tmp_path):
    ids = list(range(100))
    bench = sorted(
        ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )[: llm_ops.SEMDECON_N]
    b0 = bench[0]
    # doc 1 is EVAL (md5 bucket 0) and outside the q303 benchmark;
    # doc 2 (and 0) are TRAIN and outside the benchmark
    assert _bucket(1) == 0 and _bucket(0) != 0 and _bucket(2) != 0
    assert 1 not in bench and 2 not in bench and 0 not in bench

    shared = " ".join(f"dup{j}" for j in range(30))
    docs = []
    for i in ids:
        src = "sa" if i < 50 else "sb"
        if i in (0, 1):
            text = shared  # exact cross-split duplicate: 1 (eval) vs 0
        else:
            text = " ".join(f"d{i}w{j}" for j in range(30))
        docs.append((i, text, "en", src, len(text)))
    dim = 128
    embs = []
    for i in ids:
        hot = b0 if i in (1, 2) else i  # 1: both channels; 2: semantic only
        embs.append((i, [1.0 if j == hot else 0.0 for j in range(dim)], 0))
    d = tmp_path / "fx"
    d.mkdir()
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    spark.createDataFrame(
        embs, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_q310_precedence_and_partition(spark, tmp_path):
    out = llm_ops.q310_contamination_fusion(
        spark, _fixture(spark, tmp_path)
    ).collect()
    per = {(r["source"], r["verdict"]): r for r in out}
    assert all(r["audit_ok"] == 1 for r in out)
    # doc 1 fires BOTH channels but is counted once, as lexical
    assert per[("sa", "lexical")]["n_docs"] == 1
    # doc 2 is the only semantic-only verdict
    assert per[("sa", "semantic")]["n_docs"] == 1
    assert per[("sa", "clean")]["n_docs"] == 48
    # sb is entirely clean and carries no other verdict rows
    assert per[("sb", "clean")]["n_docs"] == 50
    assert ("sb", "lexical") not in per and ("sb", "semantic") not in per
    # the partition is exhaustive: counts re-add to the corpus
    assert sum(r["n_docs"] for r in out) == 100


def test_q310_partition_exhaustive_on_fixture(spark, sf_dir):
    rows = llm_ops.q310_contamination_fusion(spark, sf_dir).collect()
    assert rows and all(r["audit_ok"] == 1 for r in rows)
    from datapipeline_dags_spark.catalog import table

    n = table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n
