"""q321 in-engine logistic regression — the training semantics.

Hash parity vs the DuckDB oracle is covered by test_oracle_parity;
these pin that the IRLS loop actually LEARNS: on a planted separable
fixture (target-language docs are long, others short) three Newton
steps reach perfect training accuracy with the right coefficient sign,
and on the corpus fixture the model is no worse than the null model.
"""

from __future__ import annotations

import math

from datapipeline_dags_spark.plans import llm_ops

_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def test_q321_learns_planted_separation(spark, tmp_path):
    rows = []
    for i in range(30):
        # target-language docs: 80 tokens; others: 20 tokens — and the
        # distinct-ratio feature VARIES per doc (modular token reuse)
        # so neither feature column is constant (nonsingular Gram)
        if i % 2 == 0:
            lang, n = llm_ops.IRLS_TARGET_LANG, 80
        else:
            lang, n = "zz", 20
        vocab = n - 2 - (i % 5)
        text = " ".join(f"w{i}t{j % vocab}" for j in range(n))
        rows.append((i, text, lang, "s", len(text)))
    d = tmp_path / "fx"
    d.mkdir()
    spark.createDataFrame(rows, _SCHEMA).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    out = {r["feature"]: r for r in llm_ops.q321_logistic_irls(spark, str(d)).collect()}
    assert set(out) == {"intercept", "tokens_per_100", "distinct_ratio"}
    # length fully separates the classes: perfect training accuracy,
    # positive length coefficient, log-loss far below the null model
    assert out["tokens_per_100"]["weight"] > 0
    for r in out.values():
        assert r["acc_u"] == 1_000_000
        assert float(r["mean_nll"]) < 0.2


def test_q321_no_worse_than_null_model(spark, sf_dir):
    rows = llm_ops.q321_logistic_irls(spark, sf_dir).collect()
    assert len(rows) == 3
    accs = {r["acc_u"] for r in rows}
    nlls = {float(r["mean_nll"]) for r in rows}
    assert len(accs) == 1 and len(nlls) == 1
    acc, nll = accs.pop(), nlls.pop()
    assert 0 <= acc <= 1_000_000
    # after 3 Newton steps the fit is at least as good as p = base rate
    # (IRLS from w=0 monotonically improves the likelihood here)
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = base.count()
    pos = base.filter(base.lang == llm_ops.IRLS_TARGET_LANG).count()
    q = pos / n
    null_nll = -(q * math.log(q) + (1 - q) * math.log(1 - q))
    assert nll <= null_nll + 1e-4
    # accuracy at least the majority class rate
    assert acc >= int(max(q, 1 - q) * 1_000_000) - 1
