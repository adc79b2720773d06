"""q323 per-source model disparity audit — the worst-group semantics.

Hash parity vs the DuckDB oracle is covered by test_oracle_parity;
these pin: exactly one worst group, the gap arithmetic is consistent,
the audit's model IS q321's model (shared fit), and a planted
out-of-distribution source (labels inverted relative to the pattern
the rest of the corpus teaches) is flagged as the worst group.
"""

from __future__ import annotations

from datapipeline_dags_spark.plans import llm_ops

_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def test_q323_one_worst_group_consistent_gaps(spark, sf_dir):
    rows = llm_ops.q323_model_disparity_audit(spark, sf_dir).collect()
    assert rows
    assert sum(r["is_worst"] for r in rows) == 1
    flagged = next(r for r in rows if r["is_worst"] == 1)
    assert float(flagged["mean_nll"]) == max(float(r["mean_nll"]) for r in rows)
    # gap consistency: nll_gap = mean_nll - global, so the doc-weighted
    # mean of (mean_nll - nll_gap) is constant across rows
    globs = {round(float(r["mean_nll"]) - float(r["nll_gap"]), 4) for r in rows}
    assert len(globs) == 1
    for r in rows:
        assert 0 <= r["acc_u"] <= 1_000_000
        assert r["n_docs"] > 0


def test_q323_flags_planted_ood_source(spark, tmp_path):
    """Majority sources teach "long => target language"; one planted
    source inverts the pattern (long docs NOT in the target language).
    The model learns the majority rule, so the inverted source must be
    the worst group with accuracy 0 there."""
    rows = []
    did = 0
    for s in range(4):
        for i in range(10):
            long = i % 2 == 0
            n = 80 if long else 20
            vocab = n - 2 - (i % 5)
            lang = llm_ops.IRLS_TARGET_LANG if long else "zz"
            text = " ".join(f"s{s}d{did}t{j % vocab}" for j in range(n))
            rows.append((did, text, lang, f"maj{s}", len(text)))
            did += 1
    # the inverted source: long docs are NOT target-language
    for i in range(10):
        long = i % 2 == 0
        n = 80 if long else 20
        vocab = n - 2 - (i % 5)
        lang = "zz" if long else llm_ops.IRLS_TARGET_LANG
        text = " ".join(f"ood{did}t{j % vocab}" for j in range(n))
        rows.append((did, text, lang, "inverted", len(text)))
        did += 1
    d = tmp_path / "fx"
    d.mkdir()
    spark.createDataFrame(rows, _SCHEMA).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    out = {r["source"]: r for r in llm_ops.q323_model_disparity_audit(spark, str(d)).collect()}
    assert out["inverted"]["is_worst"] == 1
    assert out["inverted"]["acc_u"] == 0
    assert all(out[f"maj{s}"]["acc_u"] == 1_000_000 for s in range(4))
    assert float(out["inverted"]["nll_gap"]) > 0


def test_q323_model_is_q321s(spark, sf_dir):
    """The audit's doc-weighted global accuracy equals q321's reported
    training accuracy — same feature frame, same fit."""
    q321 = llm_ops.q321_logistic_irls(spark, sf_dir).collect()
    acc_321 = q321[0]["acc_u"]
    per = llm_ops.q323_model_disparity_audit(spark, sf_dir).collect()
    ncorrect = sum(r["acc_u"] * r["n_docs"] for r in per)
    n = sum(r["n_docs"] for r in per)
    # per-source acc_u floors lose <1 per source; reconstruct bounds
    approx = ncorrect // n
    assert abs(approx - acc_321) < 1000
