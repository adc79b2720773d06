"""q308 boilerplate STRIP — the apply half of q133 (CCNet removal).

Hash parity vs the DuckDB oracle is covered by test_oracle_parity;
these tests pin the STRUCTURAL semantics the per-source hash can't
express: a planted cross-doc segment is stripped from every carrier
(including an all-boilerplate doc that strips to empty), the same
words in another source survive (per-SOURCE flagging), and the
three-path conservation audit holds on the planted fixture.
"""

from __future__ import annotations

from datapipeline_dags_spark.plans import llm_ops

BP = "nav home about contact login search footer terms privacy copy"
assert len(BP.split()) == llm_ops.SEG_W


def _fixture(spark, tmp_path):
    uniq = [f"u{i}w{j}" for i in range(8) for j in range(30)]
    rows = [
        # src a: the BP segment leads three docs at the boundary
        (1, BP + " " + " ".join(uniq[0:7]), "en", "a", 0),
        (2, BP + " " + " ".join(uniq[30:42]), "en", "a", 0),
        (3, BP, "en", "a", 0),  # all-boilerplate: strips to empty
        (4, " ".join(uniq[60:75]), "en", "a", 0),  # untouched
        # src b: carries the SAME words once — must survive (per-source)
        (5, BP + " " + " ".join(uniq[90:93]), "en", "b", 0),
    ]
    d = tmp_path / "fx"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_q308_strips_planted_boilerplate_per_source(spark, tmp_path):
    out = {
        r["source"]: r
        for r in llm_ops.q308_boilerplate_strip(
            spark, _fixture(spark, tmp_path)
        ).collect()
    }
    a, b = out["a"], out["b"]
    # every row passes the three-path conservation audit
    assert a["audit_ok"] == 1 and b["audit_ok"] == 1
    # src a: docs 1/2/3 each lose exactly the planted 10-word segment
    assert a["n_docs"] == 4
    assert a["docs_touched"] == 3
    assert a["segs_dropped"] == 3
    assert a["words_dropped"] == 3 * llm_ops.SEG_W
    assert a["words_total"] == 17 + 22 + 10 + 15
    assert a["words_kept"] == a["words_total"] - 3 * llm_ops.SEG_W
    # doc 3 strips to EMPTY and still conserves (the ws==wk leg of the
    # audit would fail if empty re-stitch miscounted as 1 word)
    # src b: same words, one doc, different source — untouched
    assert b["docs_touched"] == 0
    assert b["segs_dropped"] == 0
    assert b["words_dropped"] == 0
    assert b["words_kept"] == b["words_total"] == 13


def test_q308_audit_green_on_fixture(spark, sf_dir):
    rows = llm_ops.q308_boilerplate_strip(spark, sf_dir).collect()
    assert rows
    assert all(r["audit_ok"] == 1 for r in rows)
    # conservation also holds GLOBALLY (cross-source sums)
    assert sum(r["words_kept"] + r["words_dropped"] for r in rows) == sum(
        r["words_total"] for r in rows
    )
