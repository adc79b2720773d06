"""Training-corpus preparation pipeline — the LLM-data operators
(plans/llm_ops.py) composed into one scheduled job.

The canonical 100 TB corpus pass:

    quality filter → exact dedup → near-dup removal (MinHash-LSH)
      → deterministic train/eval split → persist + token accounting

Every stage is a lazy DataFrame transform (one logical plan up to each
persist); the DAG scheduler contributes retries, failure alerting, and
per-stage metrics.  Scale properties inherited from the operators:
digest-keyed dedup shuffle, banded LSH candidates (never all-pairs),
hash-bucket splits (reproducible under resharding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datapipeline_dags_spark.pipeline.scheduler import Pipeline, RunResult

MIN_WORDS = 10
MAX_STOP_RATIO = 0.6
JACCARD_T = 0.5
EVAL_MOD = 10  # 1/10th of docs → eval split


def quality_filter(docs: DataFrame) -> DataFrame:
    """Drop junk docs: too short or stopword-saturated (q50 metrics)."""
    words = F.split(F.col("text"), " ")
    nw = F.size(words)
    nstop = F.size(F.filter(words, lambda w: w.isin("the", "a", "of", "and", "to", "in")))
    return docs.filter((nw >= MIN_WORDS) & (nstop / nw <= MAX_STOP_RATIO))


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Keep the lowest doc_id per identical text (q40's rule), shuffling
    on the sha2 digest rather than the text."""
    w = W.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def neardup_filter(spark: SparkSession, docs: DataFrame, sf_dir: str) -> DataFrame:
    """Remove the higher-id member of every verified near-dup pair
    (q41's MinHash-LSH candidates + exact-Jaccard verification)."""
    from datapipeline_dags_spark.plans.llm_ops import q41_dedup_minhash_lsh

    pairs = q41_dedup_minhash_lsh(spark, sf_dir)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return docs.join(losers, "doc_id", "left_anti")


def split_column() -> F.Column:
    """Deterministic train/eval assignment by key hash (q58's pattern)."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % EVAL_MOD
    )
    return F.when(bucket == 0, "eval").otherwise("train")


def build_corpus_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    *,
    on_failure=None,
    metrics_sink=None,
) -> Pipeline:
    from datapipeline_dags_spark.catalog import table

    pipe = Pipeline("corpus_prep", on_failure=on_failure, metrics_sink=metrics_sink)

    pipe.task("read", lambda ctx: table(spark, sf_dir, "documents"))
    pipe.task("quality", lambda ctx: quality_filter(ctx["read"]), deps=["read"])
    pipe.task("exact_dedup", lambda ctx: exact_dedup(ctx["quality"]), deps=["quality"])
    pipe.task(
        "near_dedup",
        lambda ctx: neardup_filter(spark, ctx["exact_dedup"], sf_dir),
        deps=["exact_dedup"],
    )
    pipe.task(
        "split",
        lambda ctx: ctx["near_dedup"].withColumn("split", split_column()),
        deps=["near_dedup"],
    )

    def persist(ctx: dict) -> str:
        ctx["split"].write.mode("overwrite").partitionBy("split").parquet(out_dir)
        return out_dir

    pipe.task("persist", persist, deps=["split"], retries=1)

    def stats(ctx: dict) -> dict:
        """Corpus accounting over the PERSISTED output (one scan)."""
        out = spark.read.parquet(out_dir)
        rows = (
            out.groupBy("split")
            .agg(
                F.count("*").alias("docs"),
                F.sum(F.size(F.split("text", " "))).alias("tokens"),
            )
            .collect()
        )
        return {r.split: {"docs": r.docs, "tokens": r.tokens} for r in rows}

    pipe.task("stats", stats, deps=["persist"])
    return pipe


def run_corpus_prep(spark: SparkSession, sf_dir: str, out_dir: str, **kw) -> RunResult:
    pipe = build_corpus_pipeline(spark, sf_dir, out_dir, **kw)
    return pipe.run(run_id="corpus_prep", context={"run_id": "corpus_prep"})
