"""§2.10 UDTF extension point: a Python table function must reproduce
the JVM chunker exactly (the UDTF is the escape hatch for logic that
outgrows column expressions; the JVM version is the production path)."""

from __future__ import annotations

from pyspark.sql.functions import col, lit, udtf

from datapipeline_dags_spark.plans.advanced import CHUNK_STEP, CHUNK_WORDS
from datapipeline_dags_spark.plans.all import QUERIES


@udtf(returnType="chunk_idx: bigint, chunk_text: string, n_words: bigint")
class ChunkDoc:
    """Python UDTF twin of q60's JVM chunker."""

    def eval(self, text: str):  # noqa: D102
        words = text.split(" ")
        for idx, start in enumerate(range(0, len(words), CHUNK_STEP)):
            piece = words[start : start + CHUNK_WORDS]
            yield idx, " ".join(piece), len(piece)


def test_udtf_chunker_matches_jvm_chunker(spark, sf_dir):
    jvm = QUERIES["q60_chunk_documents"](spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    py = docs.lateralJoin(ChunkDoc(col("text").outer())).select(
        "doc_id", "chunk_idx", "chunk_text", "n_words"
    )
    sample_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    jvm_rows = sorted(
        tuple(r) for r in jvm.collect() if r.doc_id in sample_ids
    )
    py_rows = sorted(tuple(r) for r in py.collect())
    assert jvm_rows == py_rows
