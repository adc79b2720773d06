"""q319 padding-waste audit — the batching-policy semantics.

Hash parity vs the DuckDB oracle is covered by test_oracle_parity;
these pin the POLICY properties: length-sorted bucketing never wastes
more than arrival-order batching, the token accounting conserves, and
a planted bimodal source shows the full effect (arrival interleaving
of short/long pads every batch to the long mode; sorting collapses the
waste to the two boundary batches).
"""

from __future__ import annotations

from datapipeline_dags_spark.plans import llm_ops

_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def test_q319_sorted_never_worse_and_conserves(spark, sf_dir):
    rows = llm_ops.q319_padding_waste_audit(spark, sf_dir).collect()
    assert rows
    by = {(r["source"], r["policy"]): r for r in rows}
    sources = {s for s, _ in by}
    assert all((s, "arrival") in by and (s, "sorted") in by for s in sources)
    for s in sources:
        a, srt = by[(s, "arrival")], by[(s, "sorted")]
        # the corpus under both policies is the same corpus
        assert a["real_tokens"] == srt["real_tokens"]
        assert a["truncated_tokens"] == srt["truncated_tokens"]
        assert a["n_batches"] == srt["n_batches"]
        # sorting by length can only reduce per-batch max padding
        assert srt["padded_tokens"] <= a["padded_tokens"]
        assert srt["waste_u"] <= a["waste_u"]
        # padding accounting: padded >= real, waste matches
        assert a["padded_tokens"] >= a["real_tokens"]
        assert (
            a["waste_u"]
            == (a["padded_tokens"] - a["real_tokens"]) * 1_000_000 // a["padded_tokens"]
        )


def test_q319_bimodal_source_planted(spark, tmp_path):
    """Alternating 4-token / 64-token docs, batch size 8: arrival order
    pads every short doc to 64 (waste ~ 15/16 of the short mass per
    mixed batch); sorted order forms pure-short and pure-long batches
    with zero waste."""
    rows = []
    for i in range(32):
        if i % 2 == 0:
            text = " ".join(f"s{i}w{j}" for j in range(4))
        else:
            text = " ".join(f"l{i}w{j}" for j in range(llm_ops.PAD_MAXLEN))
        rows.append((i, text, "en", "bimodal", len(text)))
    d = tmp_path / "fx"
    d.mkdir()
    spark.createDataFrame(rows, _SCHEMA).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    out = {
        r["policy"]: r
        for r in llm_ops.q319_padding_waste_audit(spark, str(d)).collect()
    }
    a, s = out["arrival"], out["sorted"]
    real = 16 * 4 + 16 * llm_ops.PAD_MAXLEN
    assert a["real_tokens"] == s["real_tokens"] == real
    # arrival: every batch mixes modes -> pads all 8 rows to 64
    assert a["padded_tokens"] == 4 * 8 * llm_ops.PAD_MAXLEN
    # sorted: two pure-short batches + two pure-long batches, no waste
    assert s["padded_tokens"] == real
    assert s["waste_u"] == 0
    assert a["waste_u"] > 400_000  # >40% wasted under arrival order


def test_q319_truncation_counted(spark, tmp_path):
    """Docs longer than PAD_MAXLEN report the overflow as truncated
    tokens, and eff caps at PAD_MAXLEN in the padded accounting."""
    n = llm_ops.PAD_MAXLEN + 10
    rows = [(0, " ".join(f"w{j}" for j in range(n)), "en", "s", n)]
    d = tmp_path / "fx"
    d.mkdir()
    spark.createDataFrame(rows, _SCHEMA).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    out = llm_ops.q319_padding_waste_audit(spark, str(d)).collect()
    for r in out:
        assert r["truncated_tokens"] == 10
        assert r["real_tokens"] == llm_ops.PAD_MAXLEN
        assert r["padded_tokens"] == llm_ops.PAD_MAXLEN
        assert r["waste_u"] == 0
