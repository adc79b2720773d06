"""q312 take-coverage audit — planted selection-bias positive.

Hash parity is covered by test_oracle_parity; this plants the exact
failure mode the audit exists to expose: an eval shingle whose ONLY
pool carrier is a low-quality doc that the budget take drops — so
pool-coverage sees it and take-coverage does not — next to a shingle
carried by a high-quality doc the take keeps.
"""

from __future__ import annotations

import hashlib

from datapipeline_dags_spark.plans import llm_ops


def _bucket(i: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % llm_ops.EVAL_MOD


def test_q312_selection_bias_surfaces(spark, tmp_path):
    # eval doc id (md5 bucket 0) carrying two probe shingles
    eval_id = next(i for i in range(100) if _bucket(i) == 0)
    pool_ids = [i for i in range(100) if _bucket(i) != 0]
    hi_id, lo_id = pool_ids[0], pool_ids[1]
    probe_hi = "alpha beta gamma delta epsilon"  # kept carrier (high quality)
    probe_lo = "zeta eta theta iota kappa"  # dropped carrier (low quality)
    assert len(probe_hi.split()) == llm_ops.SHINGLE_K

    rows = [
        (eval_id, probe_hi + " " + probe_lo, "en", "s", 0),
        # high-quality pool doc: all-distinct words -> score 1e6
        (hi_id, probe_hi + " " + " ".join(f"h{j}" for j in range(40)), "en", "s", 0),
        # low-quality pool doc: 3 distinct words repeated -> score ~ 66k
        (lo_id, probe_lo + " " + " ".join(["la", "di", "da"] * 15), "en", "s", 0),
    ]
    # filler pool docs so the budget binds BETWEEN the two carriers:
    # all high quality, enough tokens that the 50% budget + waterline
    # admits the top buckets only
    for k, i in enumerate(pool_ids[2:30]):
        rows.append(
            (i, " ".join(f"f{k}w{j}" for j in range(45)), "en", "s", 0)
        )
    d = tmp_path / "fx"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    out = {r["source"]: r for r in
           llm_ops.q312_take_coverage_audit(spark, str(d)).collect()}
    r = out["s"]
    assert r["audit_ok"] == 1
    assert r["n_eval_docs"] == 1
    # the full pool covers BOTH probe shingles; the take covers only
    # the high-quality carrier's
    assert r["grams_covered_full"] >= 2
    assert 1 <= r["grams_covered_take"] < r["grams_covered_full"]
    assert r["coverage_take_u"] < r["coverage_full_u"]


def test_q312_take_never_exceeds_pool_on_fixture(spark, sf_dir):
    rows = llm_ops.q312_take_coverage_audit(spark, sf_dir).collect()
    assert rows and all(r["audit_ok"] == 1 for r in rows)
    for r in rows:
        assert r["grams_covered_take"] <= r["grams_covered_full"]
        assert r["grams_covered_full"] <= r["n_eval_grams"]
