"""q144 prefix-filtering Jaccard: lossless vs q43 and strictly fewer
candidates — the PPJoin prefix-filter contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipeline_dags_spark.catalog import table
from datapipeline_dags_spark.operators import blocking
from datapipeline_dags_spark.plans.llm_ops import (
    JACCARD_T,
    _fanout,
    _shingles,
    q43_ngram_jaccard,
    q144_prefix_filter_jaccard,
)
from tests.conftest import SF_DIR


def _pairs(df):
    return {
        (r["doc_a"], r["doc_b"], float(r["jaccard"]))
        for r in df.collect()
    }


def test_q144_identical_to_q43(spark):
    """Prefix filtering is a candidate-generation optimization only:
    the verified output must equal q43's any-shared-shingle result."""
    assert _pairs(q144_prefix_filter_jaccard(spark, SF_DIR)) == _pairs(
        q43_ngram_jaccard(spark, SF_DIR)
    )


def test_q144_prefix_shrinks_candidates(spark):
    """The df-ascending prefix generates strictly fewer candidate pairs
    than any-shared-shingle blocking (q43's generator)."""
    docs = _fanout(spark, table(spark, SF_DIR, "documents")).select(
        "doc_id", F.transform(_shingles(F.col("text")), F.md5).alias("sh")
    )
    ex = docs.select("doc_id", F.explode("sh").alias("s"))
    q43_cands = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )
    dfc = ex.groupBy("s").agg(F.count("*").alias("df"))
    prefix_len = (
        F.col("n") - F.ceil(F.lit(JACCARD_T) * F.col("n")) + 1
    ).cast("int")
    pref = (
        ex.join(dfc, "s")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("df"), F.col("s")))
            ).alias("ord"),
            F.count("*").alias("n"),
        )
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.slice(F.col("ord"), F.lit(1), prefix_len), lambda x: x["s"]
                )
            ).alias("s"),
        )
    )
    q144_cands = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )
    assert q144_cands < q43_cands
    assert q144_cands > 0


def test_q43_hot_posting_chunking_lossless(spark, tmp_path, monkeypatch):
    """One boilerplate shingle shared by every doc — the crawl-data
    regime that made q43's raw postings self-join the scale-killer
    (VERDICT r6 ask #3).  Chunk-distributing the hot posting list must
    be output-IDENTICAL to the uncapped run (zero recall loss, exact
    intersection counts preserved across chunk boundaries) and fire
    the observable fan-out counters."""
    boiler = "terms of service apply to all content on this site"
    rows = [
        (
            i,
            f"{boiler} document number {i} carries its own distinct tail words",
            "en",
            "syn",
            80,
        )
        for i in range(1, 25)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "sf_boiler")
    df.coalesce(1).write.parquet(out + "/documents.parquet")
    baseline = _pairs(q43_ngram_jaccard(spark, out))
    monkeypatch.setattr(blocking, "BUCKET_CAP", 4)
    got = q43_ngram_jaccard(spark, out)
    assert _pairs(got) == baseline
    obs = blocking.BUCKET_OBSERVATIONS["q43_ngram_jaccard"].get
    assert obs["capped_buckets"] >= 1
    assert obs["max_bucket_size"] >= 24
