"""q324 held-out perplexity contamination — the leak semantics.

Hash parity vs the DuckDB oracle is covered by test_oracle_parity;
these pin: a PLANTED leaked eval doc (a verbatim copy of a
many-times-repeated train doc, placed in the eval split by id choice)
is flagged while a fresh-vocabulary eval doc is not, and the OOV
accounting behaves (fresh text scores all-OOV, copied text none).
"""

from __future__ import annotations

import hashlib

from datapipeline_dags_spark.plans import llm_ops

_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % llm_ops.EVAL_MOD


def _ids_by_split(n_train=40, n_eval=2):
    train, ev, i = [], [], 0
    while len(train) < n_train or len(ev) < n_eval:
        if _bucket(i) == 0:
            if len(ev) < n_eval:
                ev.append(i)
        elif len(train) < n_train:
            train.append(i)
        i += 1
    return train, ev


def test_q324_planted_leak_flagged_fresh_not(spark, tmp_path):
    train_ids, eval_ids = _ids_by_split()
    leaked_id, fresh_id = eval_ids
    boiler = " ".join(f"c{j}" for j in range(40))
    rows = []
    # DIVERSE train: 35 unique-vocabulary docs keep the train mean NLL
    # high; 5 verbatim copies of the boilerplate make its bigrams
    # predictable without dominating the mean
    for k, tid in enumerate(train_ids):
        if k < 5:
            rows.append((tid, boiler, "en", "s", len(boiler)))
        else:
            uniq = " ".join(f"u{tid}w{j}" for j in range(40))
            rows.append((tid, uniq, "en", "s", len(uniq)))
    # leaked eval doc: the boilerplate verbatim -> every bigram is a
    # high-count train bigram, NLL far below the train mean
    rows.append((leaked_id, boiler, "en", "s", len(boiler)))
    # fresh eval doc: disjoint vocabulary -> all bigrams OOV
    fresh = " ".join(f"z{j}" for j in range(40))
    rows.append((fresh_id, fresh, "en", "s", len(fresh)))
    d = tmp_path / "fx"
    d.mkdir()
    spark.createDataFrame(rows, _SCHEMA).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    out = {r["doc_id"]: r for r in llm_ops.q324_perplexity_contamination(spark, str(d)).collect()}
    assert set(out) == {leaked_id, fresh_id}
    assert out[leaked_id]["leak_flag"] == 1
    assert out[leaked_id]["n_oov_bigrams"] == 0
    assert out[fresh_id]["leak_flag"] == 0
    assert out[fresh_id]["n_oov_bigrams"] == out[fresh_id]["n_bigrams"]
    assert float(out[fresh_id]["mean_nll_bits"]) > float(
        out[leaked_id]["mean_nll_bits"]
    )


def test_q324_fixture_scores_eval_split_only(spark, sf_dir):
    rows = llm_ops.q324_perplexity_contamination(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert _bucket(r["doc_id"]) == 0
        assert 0 <= r["n_oov_bigrams"] <= r["n_bigrams"]
        assert float(r["mean_nll_bits"]) > 0
        assert r["leak_flag"] in (0, 1)
