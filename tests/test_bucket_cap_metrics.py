"""Bucket-cap counters land in the metrics DB (SURVEY K8).

``BUCKET_OBSERVATIONS`` is process-local; ``record_bucket_observations``
persists each completed observation as a ``bucket_cap_stats`` row so cap
events (bounded recall loss in the blocking-family dedup operators) are
queryable next to task timings after the run.
"""

from __future__ import annotations

import duckdb
import pytest

from datapipeline_dags_spark.plans import llm_ops
from datapipeline_dags_spark.sinks.metrics import record_bucket_observations


@pytest.fixture()
def hot_corpus_dir(spark, tmp_path):
    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, text, "en", "syn", len(text)) for i in range(1, 13)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "sf_hot")
    df.coalesce(1).write.parquet(out + "/documents.parquet")
    return out


def test_capped_q42_run_writes_metrics_row(
    spark, hot_corpus_dir, tmp_path, monkeypatch
):
    monkeypatch.setattr(llm_ops, "BUCKET_CAP", 5)
    monkeypatch.setattr(llm_ops, "BUCKET_OBSERVATIONS", {})
    llm_ops.q42_dedup_simhash(spark, hot_corpus_dir).count()

    db = str(tmp_path / "stats.db")
    n = record_bucket_observations(db, run_id="r-test")
    assert n == 1

    con = duckdb.connect(db)
    rows = con.execute(
        "SELECT run_id, query, buckets, capped_buckets, max_bucket_size"
        " FROM bucket_cap_stats"
    ).fetchall()
    con.close()
    assert len(rows) == 1
    run_id, query, buckets, capped, max_size = rows[0]
    assert (run_id, query) == ("r-test", "q42_dedup_simhash")
    assert capped >= 1  # 12 identical docs >> cap of 5
    assert max_size == 12
    assert buckets >= capped


def test_unexecuted_observation_is_skipped_not_blocked(spark, sf_dir, tmp_path, monkeypatch):
    monkeypatch.setattr(llm_ops, "BUCKET_OBSERVATIONS", {})
    # Build the plan but run NO action: the observation never completes.
    llm_ops.q41_dedup_minhash_lsh(spark, sf_dir)
    db = str(tmp_path / "stats.db")
    # Must return immediately (not deadlock on Observation.get) and write 0 rows.
    assert record_bucket_observations(db, run_id="r-none") == 0
