"""q317 Kneser-Ney scoring — the continuation-probability semantics.

Hash parity vs the DuckDB oracle is covered by test_oracle_parity;
these pin the property that DISTINGUISHES Kneser-Ney from q121's
Jelinek-Mercer interpolation: two words with identical unigram
frequency but different left-context DIVERSITY must score differently
under KN (the context-locked word's backoff mass collapses) while JM
cannot tell them apart.  The fixtures are planted — the synthetic
word-soup corpus never produces a cleanly context-locked token.
"""

from __future__ import annotations

from datapipeline_dags_spark.plans import llm_ops

_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _write_docs(spark, tmp_path, texts):
    rows = [
        (i, t, "en", "src0", len(t)) for i, t in enumerate(texts)
    ]
    d = tmp_path / "fx"
    d.mkdir(exist_ok=True)
    spark.createDataFrame(rows, _SCHEMA).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def _planted_corpus():
    """``ctx`` and ``div`` both occur 11 times; ``ctx`` follows ONE
    distinct left word (plus the probe), ``div`` follows ten distinct
    left words (plus the probe).  The two probe docs are the scored
    subjects: same bigram count, same unigram mass, different
    continuation fan-in."""
    texts = ["of ctx"] * 10
    texts += [f"w{i} div" for i in range(10)]
    texts.append("q ctx")  # probe doc: context-locked continuation
    texts.append("q div")  # probe doc: context-diverse continuation
    return texts, len(texts) - 2, len(texts) - 1


def test_q317_continuation_diversity_separates_probes(spark, tmp_path):
    texts, locked_id, diverse_id = _planted_corpus()
    fx = _write_docs(spark, tmp_path, texts)
    out = {r["doc_id"]: r for r in llm_ops.q317_kneser_ney_score(spark, fx).collect()}
    locked, diverse = out[locked_id], out[diverse_id]
    # both probes carry exactly one bigram, and it is a hapax
    assert locked["n_bigrams"] == diverse["n_bigrams"] == 1
    assert locked["n_hapax_bigrams"] == diverse["n_hapax_bigrams"] == 1
    # KN: the context-diverse continuation is MORE predictable
    assert diverse["mean_nll_bits"] < locked["mean_nll_bits"]
    # exact closed form: p = (1-D)/2 + (D*2/2) * (n1m / btot) with
    # btot = 13 bigram types, n1m(ctx) = 2, n1m(div) = 11
    import math

    d = llm_ops.KN_DISCOUNT
    p_locked = (1 - d) / 2 + d * (2 / 13)
    p_diverse = (1 - d) / 2 + d * (11 / 13)
    assert abs(float(locked["mean_nll_bits"]) + math.log2(p_locked)) < 1e-3
    assert abs(float(diverse["mean_nll_bits"]) + math.log2(p_diverse)) < 1e-3


def test_q317_jm_baseline_cannot_separate_the_probes(spark, tmp_path):
    """The same planted corpus through q121 (Jelinek-Mercer): both
    probes score IDENTICALLY, because JM's backoff reads raw unigram
    frequency and the two continuations are frequency-matched — the
    regression guard that q317 stays KN and never silently degrades
    into another interpolated-frequency model."""
    texts, locked_id, diverse_id = _planted_corpus()
    fx = _write_docs(spark, tmp_path, texts)
    out = {r["doc_id"]: r for r in llm_ops.q121_bigram_lm_score(spark, fx).collect()}
    assert out[locked_id]["mean_nll_bits"] == out[diverse_id]["mean_nll_bits"]


def test_q317_hapax_count_reads_discounted_mass(spark, sf_dir):
    """On the fixture corpus: hapax bigrams are a subset of bigrams,
    every score is finite and positive, and at least one document
    carries discounted (count-1) mass."""
    rows = llm_ops.q317_kneser_ney_score(spark, sf_dir).collect()
    assert rows
    assert all(0 <= r["n_hapax_bigrams"] <= r["n_bigrams"] for r in rows)
    assert all(float(r["mean_nll_bits"]) > 0 for r in rows)
    assert any(r["n_hapax_bigrams"] > 0 for r in rows)
