"""Training-corpus pipeline: composed LLM ops end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipeline_dags_spark.pipeline.corpus_job import run_corpus_prep


def test_corpus_prep_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus")
    res = run_corpus_prep(spark, sf_dir, out)
    assert res.ok, {n: t.state for n, t in res.tasks.items()}

    corpus = spark.read.parquet(out)
    n_in = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_out = corpus.count()
    assert 0 < n_out <= n_in

    # no exact duplicates survive
    assert corpus.select("text").distinct().count() == n_out

    # split assignment is deterministic and total
    splits = dict(
        (r.split, r.n) for r in corpus.groupBy("split").agg(F.count("*").alias("n")).collect()
    )
    assert set(splits) <= {"train", "eval"} and splits.get("train", 0) > 0

    # stats task reports both docs and tokens per split
    stats = res.tasks["stats"].result
    assert all({"docs", "tokens"} <= set(v) for v in stats.values())
    assert sum(v["docs"] for v in stats.values()) == n_out

    # re-run: identical corpus (deterministic pipeline, overwrite persist)
    res2 = run_corpus_prep(spark, sf_dir, out)
    assert res2.ok
    assert spark.read.parquet(out).count() == n_out
    assert res2.tasks["stats"].result == stats
