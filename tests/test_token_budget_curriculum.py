"""q309 token-budget curriculum — structural invariants.

Hash parity vs the DuckDB oracle is covered by test_oracle_parity;
these pin the POLICY semantics: the global budget and the per-source
cap both bind, a dominating source is capped (never the whole budget),
and the waterline is quality-monotone — no taken doc is lower-quality
(by bucket) than an excluded stage-1 survivor.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipeline_dags_spark.catalog import table
from datapipeline_dags_spark.plans import llm_ops


def test_q309_budget_and_cap_bind(spark, sf_dir):
    rows = llm_ops.q309_token_budget_curriculum(spark, sf_dir).collect()
    assert rows and all(r["audit_ok"] == 1 for r in rows)
    toks = (
        table(spark, sf_dir, "documents")
        .select(F.size(F.split("text", " ")).cast("long").alias("t"))
        .agg(F.sum("t"))
        .collect()[0][0]
    )
    b_total = toks * llm_ops.CURR_BUDGET_PCT // 100
    src_cap = b_total * llm_ops.CURR_SRC_CAP_PCT // 100
    assert sum(r["tokens_taken"] for r in rows) <= b_total
    assert all(r["tokens_taken"] <= src_cap for r in rows)
    # the selection is non-trivial on the fixture: something is taken,
    # something is left behind
    assert sum(r["tokens_taken"] for r in rows) > 0
    assert sum(r["tokens_taken"] for r in rows) < toks
    # budget_share_u is the integer micro-unit share of b_total
    for r in rows:
        assert r["budget_share_u"] == r["tokens_taken"] * 1_000_000 // b_total


def test_q309_dominating_source_is_capped(spark, tmp_path):
    """One source carries 90% of the tokens at top quality — the cap
    must stop it at CURR_SRC_CAP_PCT of the budget while the minority
    sources still get their high-quality docs in."""
    rows = []
    # source "big": 90 docs x 100 distinct words (score_u = 1e6)
    for i in range(90):
        rows.append((i, " ".join(f"b{i}w{j}" for j in range(100)), "en", "big", 0))
    # source "small": 10 docs x 100 distinct words (same quality)
    for i in range(10):
        rows.append(
            (1000 + i, " ".join(f"s{i}w{j}" for j in range(100)), "en", "small", 0)
        )
    d = tmp_path / "fx"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    out = {
        r["source"]: r
        for r in llm_ops.q309_token_budget_curriculum(spark, str(d)).collect()
    }
    total = 100 * 100
    b_total = total * llm_ops.CURR_BUDGET_PCT // 100
    src_cap = b_total * llm_ops.CURR_SRC_CAP_PCT // 100
    assert all(r["audit_ok"] == 1 for r in out.values())
    # big is capped at the per-source cap (maximal 100-token prefix)
    assert out["big"]["tokens_taken"] == src_cap // 100 * 100
    # small fits entirely under its cap and the budget
    assert out["small"]["tokens_taken"] == 10 * 100
    assert sum(r["tokens_taken"] for r in out.values()) <= b_total


def test_q309_waterline_is_quality_monotone(spark, sf_dir):
    """Every stage-1 survivor in a bucket ABOVE the waterline is taken;
    every survivor strictly below is not — re-derive the stage-1 set
    independently and compare cardinalities per side."""
    rows = llm_ops.q309_token_budget_curriculum(spark, sf_dir).collect()
    wl = rows[0]["waterline_bucket"]
    assert all(r["waterline_bucket"] == wl for r in rows)

    docs = table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("toks"),
        F.expr(
            "CAST(size(array_distinct(split(text, ' '))) AS BIGINT)"
            " * 1000000 div CAST(size(split(text, ' ')) AS BIGINT)"
        ).alias("score_u"),
    )
    toks = base.agg(F.sum("toks")).collect()[0][0]
    b_total = toks * llm_ops.CURR_BUDGET_PCT // 100
    src_cap = b_total * llm_ops.CURR_SRC_CAP_PCT // 100
    from pyspark.sql import Window as W

    cum = F.sum("toks").over(
        W.partitionBy("source")
        .orderBy(F.col("score_u").desc(), "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    surv = (
        base.withColumn("c", cum)
        .filter(F.col("c") <= src_cap)
        .withColumn("bkt", F.expr(f"score_u div {llm_ops.CURR_BUCKET_W}"))
    )
    expect_docs = surv.filter(F.col("bkt") >= wl).count()
    assert sum(r["docs_taken"] for r in rows) == expect_docs
    expect_toks = (
        surv.filter(F.col("bkt") >= wl).agg(F.sum("toks")).collect()[0][0]
    )
    assert sum(r["tokens_taken"] for r in rows) == expect_toks
