"""q316 source acquisition ordering — planted dominance cases.

Hash parity is covered by test_oracle_parity; this plants a catalog
where the greedy order is forced: a big diverse source must rank
first, a source that is a strict SUBSET of it must rank last with
ZERO marginal gain (fully shadowed — the "don't buy this dump" signal
the query exists to produce), and the curve must be monotone.
"""

from __future__ import annotations

from datapipeline_dags_spark.plans import llm_ops


def test_q316_shadowed_source_ranks_last_with_zero_gain(spark, tmp_path):
    big = " ".join(f"b{j}" for j in range(40))  # 36 distinct 5-grams
    rows = [
        (1, big, "en", "big", 0),
        # subset: the first 10 words of big -> every gram already covered
        (2, " ".join(f"b{j}" for j in range(10)), "en", "shadow", 0),
        # mid: half fresh, half overlapping big's tail
        (3, " ".join(f"b{j}" for j in range(35, 40)) + " "
            + " ".join(f"m{j}" for j in range(10)), "en", "mid", 0),
    ]
    d = tmp_path / "fx"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    out = sorted(
        llm_ops.q316_source_acquisition_order(spark, str(d)).collect(),
        key=lambda r: r["pick_rank"],
    )
    assert [r["source"] for r in out] == ["big", "mid", "shadow"]
    assert out[0]["marginal_gain"] == 36
    assert out[2]["marginal_gain"] == 0  # fully shadowed
    # the curve is monotone non-increasing and ends at full coverage
    gains = [r["marginal_gain"] for r in out]
    assert gains == sorted(gains, reverse=True)
    assert out[-1]["coverage_u"] == 1_000_000


def test_q316_total_ordering_and_curve_on_fixture(spark, sf_dir):
    rows = sorted(
        llm_ops.q316_source_acquisition_order(spark, sf_dir).collect(),
        key=lambda r: r["pick_rank"],
    )
    assert len(rows) == 20  # every catalog source is ranked
    assert len({r["source"] for r in rows}) == 20
    # cumulative coverage is the running sum of marginal gains and
    # reaches exactly the full distinct-gram mass
    cum = 0
    for r in rows:
        cum += r["marginal_gain"]
        assert r["covered_cum"] == cum
    assert rows[-1]["coverage_u"] == 1_000_000
    # greedy is monotone in marginal gain
    gains = [r["marginal_gain"] for r in rows]
    assert all(a >= b for a, b in zip(gains, gains[1:]))
