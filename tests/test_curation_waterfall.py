"""q311 curation token waterfall — planted all-stages fixture.

Hash parity vs the DuckDB oracle is covered by test_oracle_parity;
this plants a corpus where EVERY stage drops something and pins the
exact waterfall arithmetic: duplicates collapse at stage 1, the shared
template strips at stage 2 (tokens shrink inside surviving docs),
word-soup docs fall at the floor, and the budget truncates the rest —
with every chained docs_out == next docs_in and every audit green.
"""

from __future__ import annotations

from datapipeline_dags_spark.plans import llm_ops

BP = "nav home about contact login search footer terms privacy copy"


def _fixture(spark, tmp_path):
    rows = []
    # 3 exact copies of one doc (stage 1 keeps doc 0, drops 2 docs);
    # the survivor carries the BP template head (stage 2 strips it)
    dup_text = BP + " " + " ".join(f"q{j}" for j in range(20))
    for i in range(3):
        rows.append((i, dup_text, "en", "sa", 0))
    # another BP carrier so the template repeats across >= 2 docs
    rows.append((10, BP + " " + " ".join(f"r{j}" for j in range(20)), "en", "sa", 0))
    # low-quality word soup: 30 words, 3 distinct -> score 100000 < floor
    rows.append((20, " ".join(["la", "di", "da"] * 10), "en", "sa", 0))
    # high-quality unique docs that outsize the budget (forces stage 4
    # to truncate): 6 docs x 50 distinct words each
    for i in range(6):
        rows.append(
            (30 + i, " ".join(f"u{i}w{j}" for j in range(50)), "en", "sb", 0)
        )
    d = tmp_path / "fx"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_q311_every_stage_drops_and_audits_hold(spark, tmp_path):
    out = {
        r["stage"]: r
        for r in llm_ops.q311_curation_token_waterfall(
            spark, _fixture(spark, tmp_path)
        ).collect()
    }
    assert all(out[s]["audit_ok"] == 1 for s in (1, 2, 3, 4))
    # chained: stage k's docs_out == stage k+1's docs_in
    for k in (1, 2, 3):
        assert out[k]["docs_out"] == out[k + 1]["docs_in"]
        assert out[k]["tokens_out"] == out[k + 1]["tokens_in"]
    # stage 1: 11 docs in, the 3 exact copies collapse to 1
    assert out[1]["docs_in"] == 11 and out[1]["docs_out"] == 9
    # stage 2: docs unchanged; the two BP carriers each lose 10 words
    assert out[2]["docs_out"] == 9
    assert out[2]["tokens_in"] - out[2]["tokens_out"] == 2 * llm_ops.SEG_W
    # stage 3: only the word-soup doc falls (score 100000 < 400000)
    assert out[3]["docs_out"] == out[3]["docs_in"] - 1
    # stage 4: the budget binds (tokens_out < tokens_in) and respects
    # the 50% budget exactly
    total = out[4]["tokens_in"]
    b_total = total * llm_ops.CURR_BUDGET_PCT // 100
    assert 0 < out[4]["tokens_out"] <= b_total < total


def test_q311_waterfall_monotone_on_fixture(spark, sf_dir):
    rows = sorted(
        llm_ops.q311_curation_token_waterfall(spark, sf_dir).collect(),
        key=lambda r: r["stage"],
    )
    assert [r["stage"] for r in rows] == [1, 2, 3, 4]
    assert all(r["audit_ok"] == 1 for r in rows)
    for r in rows:
        assert r["docs_out"] <= r["docs_in"]
        assert r["tokens_out"] <= r["tokens_in"]
    for a, b in zip(rows, rows[1:]):
        assert a["docs_out"] == b["docs_in"]
        assert a["tokens_out"] == b["tokens_in"]
