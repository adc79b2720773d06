"""Extreme-value property tests for the integer fixed-point arithmetic
(VERDICT r10 ask #6 — extend the overflow-class audit from multiplies to
the remaining micro-unit sites, and pin the class with near-limit
operands so it stays closed as queries accrue).

Audit result (r11, recorded in PROGRESS.jsonl): the per-doc BM25 score
sums (q287/q295/LexicalStatsMaintainer.topk) are bounded by
|query terms| x ~6.6e7 micro-units (idf <= ln(1 + 2N) ~ 45 even at 1e19
docs, tf-component <= k1 + 1), the q296 MRR sum by N_QUERIES x 1e6, and
the RRF micro sums by |legs| x 16393 — none can approach int64.  The one
REACHABLE failure was q292's mixed_ppm: an INT multiply
((n_windows - n_majority) * 1_000_000 with both operands Spark INTs)
that throws ARITHMETIC_OVERFLOW under ANSI mode on any document with
more than 2147 non-majority windows (~43k words — ordinary in a web
corpus) while DuckDB's BIGINT len() computes it fine.  Fixed with exact
BIGINT `div`; this test pins the fix with a synthetic over-threshold
document.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipeline_dags_spark.plans import llm_ops


@pytest.fixture(scope="module")
def big_doc_dir(spark, tmp_path_factory):
    """A documents fixture whose single doc has > 2147 windows of a
    NON-majority language — the operand regime that overflowed INT32."""
    d = tmp_path_factory.mktemp("bigdoc")
    # 2500 windows of 20 words: majority 'de' (1300 windows), 1200 'en'
    # windows — (n_windows - n_majority) = 1200 < 2147 would not trip
    # the old code, so push to 3500/5500: majority 3500 'de', 2200 'en'
    # non-majority windows > 2147.
    de = ("der " * 20).strip()
    en = ("the " * 20).strip()
    text = " ".join([de] * 3500 + [en] * 2200)
    spark.createDataFrame(
        [(1, text, "de", "synthetic", len(text))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_q292_survives_over_threshold_window_counts(spark, big_doc_dir):
    """> 2147 non-majority windows: the old INT multiply threw
    ARITHMETIC_OVERFLOW here; the BIGINT div must compute the exact
    ppm."""
    row = llm_ops.q292_code_switch_mixture(spark, big_doc_dir).collect()[0]
    assert row["n_windows"] == 5700
    assert row["n_majority"] == 3500
    assert row["majority_lang"] == "de"
    # exact integer arithmetic: floor(2200 * 1e6 / 5700)
    assert row["mixed_ppm"] == 2200 * 1_000_000 // 5700


def test_q292_arithmetic_matches_duckdb_at_extremes(spark):
    """Cross-engine agreement of the EXACT arithmetic that used to
    diverge (Spark INT multiply throwing under ANSI where DuckDB's
    BIGINT len() computed fine), at near-limit operands.  (The full
    oracle on an 86k-word doc is O(windows x words) in DuckDB's list
    engine — minutes — so the check targets the divergent expression;
    the windowing/langID code is unchanged and oracle-covered at the
    driver SFs.)"""
    import duckdb

    cases = [(5700, 3500), (2**31 - 1, 1), (10**12, 10**6), (1, 1)]
    got = (
        spark.createDataFrame(cases, "n_windows bigint, n_majority bigint")
        .selectExpr(
            "CAST((CAST(n_windows - n_majority AS BIGINT) * 1000000)"
            " div n_windows AS BIGINT) AS mixed_ppm"
        )
        .collect()
    )
    want = duckdb.connect().execute(
        "SELECT CAST((n_windows - n_majority) * 1000000 // n_windows"
        " AS BIGINT) FROM (VALUES "
        + ", ".join(f"({a}, {b})" for a, b in cases)
        + ") t(n_windows, n_majority)"
    ).fetchall()
    assert [r["mixed_ppm"] for r in got] == [r[0] for r in want]


def test_bm25_micro_sum_headroom_static_bound():
    """Pin the audit's boundedness argument as executable arithmetic:
    even at a 1e19-document corpus with saturated tf, a per-doc BM25
    micro-unit sum cannot approach int64."""
    import math

    idf_max = math.log(1.0 + (1e19 + 0.5) / 0.5)  # df = 0 limit
    tfc_max = llm_ops.BM25_K1 + 1.0
    m_max = int(round(idf_max * tfc_max, 6) * 1_000_000 + 0.5)
    # q295 sums over HYB_QT terms; leave 6 orders of magnitude spare
    assert m_max * llm_ops.HYB_QT < 2**63 / 1e6
