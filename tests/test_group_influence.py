"""q326 per-source group influence — the data-valuation semantics.

Hash parity vs the DuckDB oracle is covered by test_oracle_parity;
these pin: self-influence is the PSD leverage form (nonnegative), a
planted inverted-label source dominates the leverage ranking by an
order of magnitude, and the first-order prediction agrees in
DIRECTION with an actual leave-that-source-out refit (removing the
source moves the coefficients opposite to its influence vector).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipeline_dags_spark.checkpoint import local_checkpoint
from datapipeline_dags_spark.plans import llm_ops

_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _planted(spark, tmp_path):
    """4 majority sources teaching 'long => target language' + one
    inverted source fighting the pattern (q323's fixture shape)."""
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
    return str(d)


def test_q326_inverted_source_dominates_leverage(spark, tmp_path):
    fx = _planted(spark, tmp_path)
    out = {r["source"]: r for r in llm_ops.q326_group_influence(spark, fx).collect()}
    assert set(out) == {"maj0", "maj1", "maj2", "maj3", "inverted"}
    si = {s: float(r["self_influence"]) for s, r in out.items()}
    assert all(v >= 0 for v in si.values())
    top = max(si, key=si.get)
    assert top == "inverted"
    others = max(v for s, v in si.items() if s != "inverted")
    assert si["inverted"] > 10 * max(others, 1e-9)


def test_q326_direction_matches_actual_loo_refit(spark, tmp_path):
    """First-order sanity: removing the inverted source must move the
    refit coefficients OPPOSITE to the source's influence vector
    (w_loo - w_full ~ -H^-1 g_s), at least for the dominant
    coefficient."""
    fx = _planted(spark, tmp_path)
    out = {r["source"]: r for r in llm_ops.q326_group_influence(spark, fx).collect()}
    infl = [
        float(out["inverted"]["infl_intercept"]),
        float(out["inverted"]["infl_tokens"]),
        float(out["inverted"]["infl_distinct"]),
    ]
    feats = llm_ops._irls_feats(spark, fx)
    w_full = llm_ops._irls_fit(feats)
    feats_loo = local_checkpoint(
        feats.filter(F.col("source") != "inverted"), "loo feats"
    )
    w_loo = llm_ops._irls_fit(feats_loo)
    deltas = [a - b for a, b in zip(w_loo, w_full)]
    # dominant coefficient by |influence| must move opposite to it
    k = max(range(3), key=lambda i: abs(infl[i]))
    assert abs(infl[k]) > 0
    assert deltas[k] * infl[k] < 0


def test_q326_fixture_shape(spark, sf_dir):
    rows = llm_ops.q326_group_influence(spark, sf_dir).collect()
    assert rows
    assert len({r["source"] for r in rows}) == len(rows)
    assert all(float(r["self_influence"]) >= 0 for r in rows)
    assert all(r["n_docs"] > 0 for r in rows)
