"""Streaming index maintenance: the q282/q284 delta-refresh operators
wired into a ``foreachBatch`` loop so both index families stay fresh as
micro-batches land (VERDICT r8 ask #7 — the engine had ST1–ST6 ingest
and the audited delta refreshers; this is the end-to-end bridge).

Reference scope: the reference repo's sync DAGs re-run full loads per
trigger (postgresql_mysql_sync_dag.py:14-110); a 100 TB corpus cannot
re-index per ingest, so the engine maintains both ANN state (per-cell
integer centroid partials, q282's merge contract) and the text near-dup
pair set (band-bucket probe + verified union, q284's contract)
incrementally.

State layout (parquet, versioned by streaming batch id):

    <state_dir>/<table>/v<batch_id>/

Each ``foreachBatch`` invocation rebuilds ``v<batch_id>`` from
``v<batch_id - 1>`` plus the batch rows and OVERWRITES it — Structured
Streaming may replay a batch after a crash, and the rebuild is a pure
function of (previous version, batch), so the replay converges to the
same bytes (the sinks/sync.py idempotence discipline).  Batch ids are
contiguous under one checkpoint, so "previous" needs no listing scan.
After a successful write, versions older than ``STATE_VERSIONS_KEPT``
are pruned — without retention every batch leaves a FULL state copy
behind, which is unbounded storage growth at streaming cadence; the
floor of 2 keeps exactly the predecessor a crash-replay needs.

Parity: all state is integer (quantized component sums / counts / pair
ids), so merged-vs-full equality is exact, never float-tolerant — the
``matches_full`` audits here assert the SAME contract q282/q284 compute
in-query, but against parquet state that crossed micro-batch (and
session) boundaries.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_dags_spark.operators import blocking
from datapipeline_dags_spark.plans.helpers import dec
from datapipeline_dags_spark.plans.llm_ops import (
    BM25_B,
    BM25_K1,
    IVF_SUM_SCALE,
    JACCARD_T,
    _ivf_centroids,
    _minhash_bands,
    _nearest_id,
    _shingles,
)

__all__ = [
    "IvfIndexMaintainer",
    "LexicalStatsMaintainer",
    "LshIndexMaintainer",
    "run_maintenance_batch",
]


#: versions kept per state table after a successful write.  2 is the
#: safety floor: a crash AFTER v<batch_id> lands but BEFORE the stream
#: commits its offsets replays batch_id, whose rebuild reads
#: v<batch_id - 1> — so the predecessor must survive until the NEXT
#: batch's write proves the offset advanced.  Without retention every
#: batch leaves a FULL state copy behind (unbounded storage growth at
#: streaming cadence — the actual 100 TB killer in versioned-state
#: designs).
STATE_VERSIONS_KEPT = 2


def _version_dir(state_dir: str, tbl: str, batch_id: int) -> str:
    return os.path.join(state_dir, tbl, f"v{batch_id}")


def _prune_versions(
    state_dir: str, tbl: str, batch_id: int, keep: int = STATE_VERSIONS_KEPT
) -> None:
    """Delete version dirs older than the ``keep`` newest, called only
    AFTER v<batch_id> has been fully written.  Never touches
    v<batch_id> or v<batch_id - 1> (keep >= 2 is enforced), so a
    replay of the current batch always finds its input."""
    import shutil

    keep = max(keep, 2)
    root = os.path.join(state_dir, tbl)
    if not os.path.isdir(root):
        return
    for name in os.listdir(root):
        if not name.startswith("v"):
            continue
        try:
            vid = int(name[1:])
        except ValueError:
            continue
        if vid <= batch_id - keep:
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)


def _read_version(
    spark: SparkSession, state_dir: str, tbl: str, batch_id: int, schema: str
) -> DataFrame:
    """Previous-version read; batch 0 (or a missing predecessor) is an
    empty frame with the state schema."""
    path = _version_dir(state_dir, tbl, batch_id)
    if batch_id < 0 or not os.path.isdir(path):
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(path)


class IvfIndexMaintainer:
    """q282's merge contract as a streaming maintenance loop.

    State table ``ivf`` = (cell, pos, s, n): per-(cell, component)
    quantized-component sum and member count — the mergeable partials
    q47's centroids refresh from.  The coarse quantizer ``cents`` (one
    collected struct row, q47's ``_ivf_centroids``) is FIXED at
    construction: delta batches assign against the same broadcast
    quantizer as the base build, never a re-scan of prior batches.
    """

    STATE_SCHEMA = "cell bigint, pos int, s bigint, n bigint"

    def __init__(
        self, spark: SparkSession, state_dir: str, centroid_corpus: DataFrame
    ):
        self.spark = spark
        self.state_dir = state_dir
        # one broadcastable row; deterministic ids keep it auditable
        self.cents = _ivf_centroids(centroid_corpus).collect()[0]["cents"]

    def _partials(self, vectors: DataFrame) -> DataFrame:
        """(cell, pos, s, n) integer partials of a (vec_id, embedding)
        frame — map-side combinable, the only shuffle key is the
        bounded (cell, component) grid."""
        cents = self.spark.createDataFrame(
            [(self.cents,)], "cents array<struct<cid: bigint, ce: array<float>>>"
        )
        assigned = vectors.crossJoin(F.broadcast(cents)).select(
            "vec_id",
            _nearest_id(F.col("cents"), F.col("embedding"), "cid", "ce").alias(
                "cell"
            ),
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(
                    x.cast("double") * IVF_SUM_SCALE + F.lit(0.5)
                ).cast("long"),
            ).alias("qe"),
        )
        return (
            assigned.select("cell", F.posexplode("qe").alias("pos", "qv"))
            .groupBy("cell", "pos")
            .agg(F.sum("qv").alias("s"), F.count("*").alias("n"))
            .select(
                F.col("cell").cast("bigint"),
                F.col("pos").cast("int"),
                F.col("s").cast("bigint"),
                F.col("n").cast("bigint"),
            )
        )

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        """foreachBatch body: merge the batch's partials into the
        previous state version and overwrite ``v<batch_id>``."""
        prev = _read_version(
            self.spark, self.state_dir, "ivf", batch_id - 1, self.STATE_SCHEMA
        )
        delta = self._partials(batch.select("vec_id", "embedding"))
        merged = (
            prev.unionByName(delta)
            .groupBy("cell", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        )
        merged.write.mode("overwrite").parquet(
            _version_dir(self.state_dir, "ivf", batch_id)
        )
        _prune_versions(self.state_dir, "ivf", batch_id)

    def state(self, batch_id: int) -> DataFrame:
        return _read_version(
            self.spark, self.state_dir, "ivf", batch_id, self.STATE_SCHEMA
        )

    def matches_full(self, batch_id: int, all_vectors: DataFrame) -> bool:
        """q282's audit across the parquet state: the maintained
        partials must equal a from-scratch recompute over every vector
        ingested so far, bit-exactly (integer sums are
        order-independent)."""
        full = self._partials(all_vectors.select("vec_id", "embedding"))
        st = self.state(batch_id)
        bad = (
            st.join(full, ["cell", "pos"], "full_outer")
            .where(
                ~(st["s"].eqNullSafe(full["s"]) & st["n"].eqNullSafe(full["n"]))
            )
            .count()
        )
        return bad == 0


class LshIndexMaintainer:
    """q284's delta-refresh contract as a streaming maintenance loop.

    State tables: ``sh`` (doc_id, sh) shingle sets, ``bands``
    (doc_id, band, key) MinHash band rows, ``pairs`` (a, b) verified
    near-dup pairs.  A delta batch shingles ITS documents only, probes
    the stored band-bucket space for the buckets it touches, verifies
    the candidate pairs with exact Jaccard, and unions into the stored
    pair set — never a re-pairing of prior batches against themselves.
    """

    SH_SCHEMA = "doc_id bigint, sh array<string>"
    BANDS_SCHEMA = "doc_id bigint, band int, key string"
    PAIRS_SCHEMA = "a bigint, b bigint"

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir

    def _prev(self, tbl: str, batch_id: int, schema: str) -> DataFrame:
        return _read_version(self.spark, self.state_dir, tbl, batch_id - 1, schema)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = self.spark
        sh_prev = self._prev("sh", batch_id, self.SH_SCHEMA)
        bands_prev = self._prev("bands", batch_id, self.BANDS_SCHEMA)
        pairs_prev = self._prev("pairs", batch_id, self.PAIRS_SCHEMA)

        sh_new = batch.select(
            F.col("doc_id").cast("bigint"), _shingles(F.col("text")).alias("sh")
        )
        bands_new = _minhash_bands(sh_new).select(
            F.col("doc_id").cast("bigint"),
            F.col("band").cast("int"),
            F.col("key").cast("string"),
        )
        sh_all = sh_prev.unionByName(sh_new)
        bands_all = bands_prev.unionByName(bands_new)

        # buckets the delta touches: only these can yield NEW pairs —
        # an old-old pair in an untouched bucket is already stored
        touched = bands_all.join(
            bands_new.select("band", "key").distinct(), ["band", "key"], "left_semi"
        )
        bucketed = (
            touched.groupBy("band", "key")
            .agg(F.collect_list("doc_id").alias("ids"))
            .filter(F.size("ids") >= 2)
        )
        cand = (
            blocking.chunk_buckets(
                bucketed, f"lsh_maintenance_b{batch_id}", "ids"
            )
            .select(F.explode(blocking.chunk_pair_structs()).alias("p"))
            .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .distinct()
        )
        jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
            F.array_union("sh_a", "sh_b")
        )
        verified = (
            cand.join(
                sh_all.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a")),
                "a",
            )
            .join(
                sh_all.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b")),
                "b",
            )
            .filter(jac >= JACCARD_T)
            .select("a", "b")
        )
        pairs_all = pairs_prev.unionByName(verified).distinct()

        for tbl, df in (("sh", sh_all), ("bands", bands_all), ("pairs", pairs_all)):
            df.write.mode("overwrite").parquet(
                _version_dir(self.state_dir, tbl, batch_id)
            )
            _prune_versions(self.state_dir, tbl, batch_id)

    def pairs(self, batch_id: int) -> DataFrame:
        return _read_version(
            self.spark, self.state_dir, "pairs", batch_id, self.PAIRS_SCHEMA
        )

    def matches_full(self, batch_id: int, all_docs: DataFrame) -> bool:
        """q284's audit across the parquet state: the maintained pair
        set must equal a from-scratch LSH rebuild over every document
        ingested so far (set equality — the bucketing is lossless via
        ``chunk_buckets``, so no recall-loss excuse applies)."""
        sh = all_docs.select(
            F.col("doc_id").cast("bigint"), _shingles(F.col("text")).alias("sh")
        ).persist()
        bands = _minhash_bands(sh)
        bucketed = (
            bands.groupBy("band", "key")
            .agg(F.collect_list("doc_id").alias("ids"))
            .filter(F.size("ids") >= 2)
        )
        cand = (
            blocking.chunk_buckets(bucketed, f"lsh_maintenance_full_{batch_id}", "ids")
            .select(F.explode(blocking.chunk_pair_structs()).alias("p"))
            .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .distinct()
        )
        jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
            F.array_union("sh_a", "sh_b")
        )
        full = (
            cand.join(
                sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a")), "a"
            )
            .join(
                sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b")), "b"
            )
            .filter(jac >= JACCARD_T)
            .select("a", "b")
        )
        stored = self.pairs(batch_id)
        try:
            missing = full.join(stored, ["a", "b"], "left_anti").count()
            extra = stored.join(full, ["a", "b"], "left_anti").count()
        finally:
            sh.unpersist()
        return missing == 0 and extra == 0


class LexicalStatsMaintainer:
    """q293's contract as a streaming maintenance loop: the BM25/q86
    term statistics (document frequency, collection frequency) plus
    the corpus totals (N, Σdl) that q287's scorer needs, merged as
    integer partials per micro-batch — an arriving batch tokenizes
    ITS documents only.

    State tables: ``terms`` (term, df, cf), ``corpus``
    (n_docs, total_tokens) — one row — and ``postings``
    (doc_id, term, tf, dl), the inverted index itself: each document
    arrives ONCE, so the postings merge is a pure union of the
    previous version with the batch's rows (no re-aggregation), and
    ``topk`` can SERVE BM25 retrieval straight from the maintained
    parquet state — build → maintain → serve, the full lexical-index
    lifecycle."""

    TERMS_SCHEMA = "term string, df bigint, cf bigint"
    CORPUS_SCHEMA = "n_docs bigint, total_tokens bigint"
    POSTINGS_SCHEMA = "doc_id bigint, term string, tf bigint, dl bigint"

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        terms_prev = _read_version(
            self.spark, self.state_dir, "terms", batch_id - 1, self.TERMS_SCHEMA
        )
        corpus_prev = _read_version(
            self.spark,
            self.state_dir,
            "corpus",
            batch_id - 1,
            self.CORPUS_SCHEMA,
        )
        postings_prev = _read_version(
            self.spark,
            self.state_dir,
            "postings",
            batch_id - 1,
            self.POSTINGS_SCHEMA,
        )
        from pyspark.sql import Window as _W

        tf = (
            batch.select(
                "doc_id", F.explode(F.split("text", " ")).alias("term")
            )
            .groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf"))
            .withColumn("dl", F.sum("tf").over(_W.partitionBy("doc_id")))
        )
        delta_terms = tf.groupBy("term").agg(
            F.count("*").alias("df"), F.sum("tf").alias("cf")
        )
        postings = postings_prev.unionByName(
            tf.select(
                F.col("doc_id").cast("bigint"),
                F.col("term").cast("string"),
                F.col("tf").cast("bigint"),
                F.col("dl").cast("bigint"),
            )
        )
        terms = (
            terms_prev.unionByName(delta_terms)
            .groupBy("term")
            .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
        )
        delta_corpus = batch.agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).alias("total_tokens"),
        )
        corpus = corpus_prev.unionByName(delta_corpus).agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("total_tokens").alias("total_tokens"),
        )
        terms.write.mode("overwrite").parquet(
            _version_dir(self.state_dir, "terms", batch_id)
        )
        _prune_versions(self.state_dir, "terms", batch_id)
        corpus.write.mode("overwrite").parquet(
            _version_dir(self.state_dir, "corpus", batch_id)
        )
        _prune_versions(self.state_dir, "corpus", batch_id)
        postings.write.mode("overwrite").parquet(
            _version_dir(self.state_dir, "postings", batch_id)
        )
        _prune_versions(self.state_dir, "postings", batch_id)

    def terms(self, batch_id: int) -> DataFrame:
        return _read_version(
            self.spark, self.state_dir, "terms", batch_id, self.TERMS_SCHEMA
        )

    def postings(self, batch_id: int) -> DataFrame:
        return _read_version(
            self.spark,
            self.state_dir,
            "postings",
            batch_id,
            self.POSTINGS_SCHEMA,
        )

    def topk(
        self, batch_id: int, query_terms: list[str], k: int = 10
    ) -> DataFrame:
        """SERVE BM25 top-k from the maintained parquet state — q287's
        exact scoring discipline (6-dp round → integer micro-units, so
        per-doc sums are order-independent and ties break on doc_id)
        over the incrementally-maintained postings/stats instead of a
        from-scratch corpus pass.  This is the query-time half of the
        lexical index lifecycle; freshness equals the last maintenance
        tick, parity with a full recompute is pinned by
        tests/test_index_maintenance_stream.py."""
        postings = self.postings(batch_id)
        stats = _read_version(
            self.spark, self.state_dir, "terms", batch_id, self.TERMS_SCHEMA
        )
        corpus = _read_version(
            self.spark, self.state_dir, "corpus", batch_id, self.CORPUS_SCHEMA
        ).select(
            F.col("n_docs").alias("n"),
            (F.col("total_tokens") * F.lit(1.0) / F.col("n_docs")).alias(
                "avgdl"
            ),
        )
        qt = stats.filter(F.col("term").isin(list(query_terms))).select(
            "term", "df"
        )
        idf = F.log(
            F.lit(1.0)
            + (F.col("n") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
        tfc = (F.col("tf") * F.lit(BM25_K1 + 1.0)) / (
            F.col("tf")
            + F.lit(BM25_K1)
            * (
                F.lit(1.0 - BM25_B)
                + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
            )
        )
        return (
            postings.join(F.broadcast(qt), "term")
            .crossJoin(F.broadcast(corpus))
            .select(
                "doc_id",
                F.floor(dec(idf * tfc, 6) * F.lit(1_000_000.0) + F.lit(0.5))
                .cast("long")
                .alias("m"),
            )
            .groupBy("doc_id")
            .agg(F.sum("m").alias("score_micro"))
            .orderBy(F.col("score_micro").desc(), "doc_id")
            .limit(k)
        )

    def matches_full(self, batch_id: int, all_docs: DataFrame) -> bool:
        """q293's audit across the parquet state: maintained (df, cf)
        per term AND the corpus totals must equal a from-scratch
        recompute over every document ingested so far."""
        tf = (
            all_docs.select(
                "doc_id", F.explode(F.split("text", " ")).alias("term")
            )
            .groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf"))
        )
        full = tf.groupBy("term").agg(
            F.count("*").alias("df"), F.sum("tf").alias("cf")
        )
        st = self.terms(batch_id)
        bad = (
            st.join(full, "term", "full_outer")
            .where(
                ~(
                    st["df"].eqNullSafe(full["df"])
                    & st["cf"].eqNullSafe(full["cf"])
                )
            )
            .count()
        )
        if bad:
            return False
        from pyspark.sql import Window as _W

        full_p = (
            all_docs.select(
                "doc_id", F.explode(F.split("text", " ")).alias("term")
            )
            .groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf"))
            .withColumn("dl", F.sum("tf").over(_W.partitionBy("doc_id")))
        )
        sp = self.postings(batch_id)
        bad_p = (
            sp.join(full_p, ["doc_id", "term"], "full_outer")
            .where(
                ~(
                    sp["tf"].eqNullSafe(full_p["tf"])
                    & sp["dl"].eqNullSafe(full_p["dl"])
                )
            )
            .count()
        )
        if bad_p:
            return False
        cs = _read_version(
            self.spark, self.state_dir, "corpus", batch_id, self.CORPUS_SCHEMA
        ).collect()[0]
        fc = all_docs.agg(
            F.count("*").alias("n"),
            F.sum(F.size(F.split("text", " "))).alias("t"),
        ).collect()[0]
        return cs["n_docs"] == fc["n"] and cs["total_tokens"] == fc["t"]


def run_maintenance_batch(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    schema: str,
    on_batch,
) -> None:
    """Drain everything new in ``source_dir`` through ``on_batch`` as
    ONE checkpointed micro-batch (availableNow) — each call is one
    "maintenance tick"; the checkpoint hands contiguous batch ids to
    the maintainers across calls and sessions."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    q = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
