"""End-to-end streaming index maintenance (VERDICT r8 ask #7): the
q282 (IVF partials) and q284 (LSH pair set) delta-refresh contracts
driven by a CHECKPOINTED Structured Streaming query over a parquet
file source — files land, maintenance ticks run one micro-batch each,
and after every batch the maintained state equals a from-scratch
rebuild over everything ingested so far (``matches_full`` parity).

The second tick runs as a NEW streaming query against the SAME
checkpoint, so batch-id continuity and state chaining across query
restarts is exercised, not just within one run.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from datapipeline_dags_spark.catalog import table
from datapipeline_dags_spark.streaming.index_maintenance import (
    IvfIndexMaintainer,
    LshIndexMaintainer,
    run_maintenance_batch,
)
from tests.conftest import SF_DIR


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "source": str(tmp_path / "arrivals"),
        "ckpt": str(tmp_path / "ckpt"),
        "state": str(tmp_path / "state"),
    }
    (tmp_path / "arrivals").mkdir()
    return d


def _land(df, source_dir: str, name: str) -> None:
    """Simulate a file arrival: write one parquet slice into the
    watched directory (each slice becomes one micro-batch's content)."""
    tmp = f"{source_dir}__stage_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    import glob
    import os

    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(source_dir, f"{name}.parquet"))
    shutil.rmtree(tmp)


def test_ivf_maintenance_stream(spark, dirs):
    emb = table(spark, SF_DIR, "embeddings")
    m = IvfIndexMaintainer(spark, dirs["state"], centroid_corpus=emb)
    schema = "vec_id bigint, embedding array<float>"

    batches = [
        emb.filter(F.col("vec_id") % 3 == 0),
        emb.filter(F.col("vec_id") % 3 == 1),
        emb.filter(F.col("vec_id") % 3 == 2),
    ]
    seen = None
    for bid, b in enumerate(batches):
        _land(b.select("vec_id", "embedding"), dirs["source"], f"slice{bid}")
        run_maintenance_batch(
            spark, dirs["source"], dirs["ckpt"], schema, m.process_batch
        )
        seen = b if seen is None else seen.unionByName(b)
        assert m.matches_full(bid, seen), f"IVF state diverged at batch {bid}"
    # the maintained state must cover the whole corpus after the last tick
    n_total = m.state(len(batches) - 1).agg(F.max("n")).collect()[0][0]
    assert seen.count() == emb.count()
    assert n_total is not None and n_total > 0


def test_lsh_maintenance_stream(spark, dirs):
    docs = table(spark, SF_DIR, "documents")
    m = LshIndexMaintainer(spark, dirs["state"])
    schema = "doc_id bigint, text string"

    batches = [
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
    ]
    seen = None
    for bid, b in enumerate(batches):
        _land(b.select("doc_id", "text"), dirs["source"], f"slice{bid}")
        run_maintenance_batch(
            spark, dirs["source"], dirs["ckpt"], schema, m.process_batch
        )
        seen = b if seen is None else seen.unionByName(b)
        assert m.matches_full(bid, seen), f"LSH pairs diverged at batch {bid}"
    # the fixture corpus has near-dup pairs, so the final state is
    # non-trivial (parity on an empty pair set would prove nothing)
    assert m.pairs(len(batches) - 1).count() > 0


def test_lexical_stats_maintenance_stream(spark, dirs):
    from datapipeline_dags_spark.streaming.index_maintenance import (
        LexicalStatsMaintainer,
    )

    docs = table(spark, SF_DIR, "documents")
    m = LexicalStatsMaintainer(spark, dirs["state"])
    schema = "doc_id bigint, text string"

    batches = [
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
    ]
    seen = None
    for bid, b in enumerate(batches):
        _land(b.select("doc_id", "text"), dirs["source"], f"slice{bid}")
        run_maintenance_batch(
            spark, dirs["source"], dirs["ckpt"], schema, m.process_batch
        )
        seen = b if seen is None else seen.unionByName(b)
        assert m.matches_full(bid, seen), f"lexical stats diverged at batch {bid}"
    assert m.terms(len(batches) - 1).count() > 0


def test_ivf_batch_replay_is_idempotent(spark, dirs):
    """foreachBatch may replay a batch after a crash: re-running the
    same (batch, batch_id) must leave the state byte-for-byte
    equivalent (same rows), because each version is a pure function of
    its predecessor and the batch."""
    emb = table(spark, SF_DIR, "embeddings")
    m = IvfIndexMaintainer(spark, dirs["state"], centroid_corpus=emb)
    b0 = emb.filter(F.col("vec_id") % 2 == 0).select("vec_id", "embedding")
    b1 = emb.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    m.process_batch(b0, 0)
    m.process_batch(b1, 1)
    before = sorted(map(tuple, m.state(1).collect()))
    m.process_batch(b1, 1)  # replay
    after = sorted(map(tuple, m.state(1).collect()))
    assert before == after
    assert m.matches_full(1, b0.unionByName(b1))


# ---------------------------------------------------------------------------
# Crash-mid-overwrite chaos (VERDICT r9 ask #6): a writer killed
# mid-overwrite leaves a PARTIAL v<batch_id> directory — torn part
# files, _temporary droppings, no _SUCCESS.  Structured Streaming then
# replays the same batch id (the offset never committed).  The replay
# must converge to the exact same rows because the rebuild reads ONLY
# v<batch_id - 1> (never its own partial output) and overwrite-replaces
# the wreckage.  One helper corrupts the version dir; one test per
# maintainer family asserts convergence + matches_full.
# ---------------------------------------------------------------------------


def _wreck_version_dir(state_dir: str, tbl: str, batch_id: int) -> None:
    """Simulate a crash mid-overwrite: truncate every part file to half
    its bytes (a torn write), drop _SUCCESS, and leave a _temporary
    staging dir behind."""
    import glob
    import os

    vdir = os.path.join(state_dir, tbl, f"v{batch_id}")
    assert os.path.isdir(vdir), f"no version dir to wreck: {vdir}"
    success = os.path.join(vdir, "_SUCCESS")
    if os.path.exists(success):
        os.remove(success)
    parts = glob.glob(os.path.join(vdir, "part-*.parquet"))
    assert parts, f"no part files in {vdir}"
    for p in parts:
        size = os.path.getsize(p)
        with open(p, "r+b") as f:
            f.truncate(max(1, size // 2))
    os.makedirs(os.path.join(vdir, "_temporary", "0"), exist_ok=True)


def test_ivf_crash_mid_overwrite_replay_converges(spark, dirs):
    emb = table(spark, SF_DIR, "embeddings")
    m = IvfIndexMaintainer(spark, dirs["state"], centroid_corpus=emb)
    b0 = emb.filter(F.col("vec_id") % 2 == 0).select("vec_id", "embedding")
    b1 = emb.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    m.process_batch(b0, 0)
    m.process_batch(b1, 1)
    want = sorted(map(tuple, m.state(1).collect()))
    _wreck_version_dir(dirs["state"], "ivf", 1)
    m.process_batch(b1, 1)  # the replay Structured Streaming would run
    assert sorted(map(tuple, m.state(1).collect())) == want
    assert m.matches_full(1, b0.unionByName(b1))


def test_lsh_crash_mid_overwrite_replay_converges(spark, dirs):
    docs = table(spark, SF_DIR, "documents")
    m = LshIndexMaintainer(spark, dirs["state"])
    b0 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    m.process_batch(b0, 0)
    m.process_batch(b1, 1)
    want = {
        tbl: sorted(map(tuple, m.spark.read.parquet(
            f"{dirs['state']}/{tbl}/v1").collect()))
        for tbl in ("sh", "bands", "pairs")
    }
    # wreck ALL THREE state tables of the batch — a real crash tears
    # whichever table was mid-write; tearing every one is the worst case
    for tbl in ("sh", "bands", "pairs"):
        _wreck_version_dir(dirs["state"], tbl, 1)
    m.process_batch(b1, 1)
    got = {
        tbl: sorted(map(tuple, m.spark.read.parquet(
            f"{dirs['state']}/{tbl}/v1").collect()))
        for tbl in ("sh", "bands", "pairs")
    }
    assert got == want
    assert m.matches_full(1, b0.unionByName(b1))


def test_lexical_crash_mid_overwrite_replay_converges(spark, dirs):
    from datapipeline_dags_spark.streaming.index_maintenance import (
        LexicalStatsMaintainer,
    )

    docs = table(spark, SF_DIR, "documents")
    m = LexicalStatsMaintainer(spark, dirs["state"])
    b0 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    m.process_batch(b0, 0)
    m.process_batch(b1, 1)
    want = sorted(map(tuple, m.terms(1).collect()))
    want_p = sorted(map(tuple, m.postings(1).collect()))
    for tbl in ("terms", "corpus", "postings"):
        _wreck_version_dir(dirs["state"], tbl, 1)
    m.process_batch(b1, 1)
    assert sorted(map(tuple, m.terms(1).collect())) == want
    assert sorted(map(tuple, m.postings(1).collect())) == want_p
    assert m.matches_full(1, b0.unionByName(b1))


def test_version_retention_prunes_old_state(spark, dirs):
    """Versioned state must not grow one full copy per batch forever:
    after batch N, only the STATE_VERSIONS_KEPT newest versions remain,
    the predecessor a crash-replay needs is always among them, and
    replay + audit still work after pruning."""
    import os

    from datapipeline_dags_spark.streaming import index_maintenance as im

    emb = table(spark, SF_DIR, "embeddings")
    m = IvfIndexMaintainer(spark, dirs["state"], centroid_corpus=emb)
    batches = [
        emb.filter(F.col("vec_id") % 3 == r).select("vec_id", "embedding")
        for r in range(3)
    ]
    for bid, b in enumerate(batches):
        m.process_batch(b, bid)
    root = os.path.join(dirs["state"], "ivf")
    kept = sorted(os.listdir(root))
    assert kept == [
        f"v{i}"
        for i in range(3 - im.STATE_VERSIONS_KEPT, 3)
    ], kept
    # replay of the LAST batch still has its predecessor and converges
    want = sorted(map(tuple, m.state(2).collect()))
    m.process_batch(batches[2], 2)
    assert sorted(map(tuple, m.state(2).collect())) == want
    seen = batches[0].unionByName(batches[1]).unionByName(batches[2])
    assert m.matches_full(2, seen)


def test_lexical_serving_from_maintained_state(spark, dirs):
    """The maintained lexical index must SERVE: BM25 top-k scored from
    the incrementally-built postings/stats state equals the same
    scoring over a single-batch (from-scratch) state of the identical
    corpus — the maintenance merges change WHERE the index came from,
    never a score."""
    from datapipeline_dags_spark.streaming.index_maintenance import (
        LexicalStatsMaintainer,
    )

    docs = table(spark, SF_DIR, "documents")
    inc = LexicalStatsMaintainer(spark, dirs["state"] + "/inc")
    b0 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    inc.process_batch(b0, 0)
    inc.process_batch(b1, 1)
    # matches_full now audits postings (tf AND dl) against a
    # from-scratch tokenization as well as the stats tables
    assert inc.matches_full(1, b0.unionByName(b1))

    full = LexicalStatsMaintainer(spark, dirs["state"] + "/full")
    full.process_batch(docs.select("doc_id", "text"), 0)

    qterms = [
        r.term
        for r in inc.terms(1).orderBy(F.col("df").desc(), "term").limit(5).collect()
    ]
    got = sorted(map(tuple, inc.topk(1, qterms, k=20).collect()))
    want = sorted(map(tuple, full.topk(0, qterms, k=20).collect()))
    assert got == want
    assert len(got) == 20


# ---------------------------------------------------------------------------
# Deletion deltas (VERDICT r10 ask #2): each maintainer's process_batch
# takes a tombstone frame; retraction reads STATE (stored assignments /
# pairs / postings), never the corpus, and matches_full is asserted
# against the LIVE corpus (ingested minus deleted).
# ---------------------------------------------------------------------------


def test_ivf_maintenance_with_deletes(spark, dirs):
    emb = table(spark, SF_DIR, "embeddings")
    m = IvfIndexMaintainer(spark, dirs["state"], centroid_corpus=emb)
    b0 = emb.filter(F.col("vec_id") % 2 == 0).select("vec_id", "embedding")
    b1 = emb.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    dels = emb.filter(F.col("vec_id") % 4 == 0).select("vec_id")
    m.process_batch(b0, 0)
    m.process_batch(b1, 1, deletes=dels)
    live = b0.unionByName(b1).join(dels, "vec_id", "left_anti")
    assert m.matches_full(1, live)
    # the tombstoned ids are gone from the served assignment rows
    assert m.assign(1).join(dels, "vec_id", "left_semi").count() == 0
    assert dels.count() > 0
    # deleting ids NOT in the state is a no-op (idempotent deletes)
    before = sorted(map(tuple, m.state(1).collect()))
    m.process_batch(
        spark.createDataFrame([], "vec_id bigint, embedding array<float>"),
        2,
        deletes=spark.createDataFrame([(10**12,)], "vec_id bigint"),
    )
    assert sorted(map(tuple, m.state(2).collect())) == before


def test_lsh_maintenance_with_deletes(spark, dirs):
    docs = table(spark, SF_DIR, "documents")
    m = LshIndexMaintainer(spark, dirs["state"])
    b0 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    m.process_batch(b0, 0)
    # delete some batch-0 docs at the tick batch 1 arrives; choose a
    # modulus that hits docs participating in near-dup pairs
    dels = docs.filter(F.col("doc_id") % 8 == 0).select("doc_id")
    m.process_batch(b1, 1, deletes=dels)
    live = b0.unionByName(b1).join(dels, "doc_id", "left_anti")
    assert m.matches_full(1, live)
    pairs = m.pairs(1)
    hit = pairs.join(
        dels.select(F.col("doc_id").alias("a")), "a", "left_semi"
    ).count() + pairs.join(
        dels.select(F.col("doc_id").alias("b")), "b", "left_semi"
    ).count()
    assert hit == 0, "stored pairs still reference tombstoned docs"


def test_lexical_maintenance_with_deletes_and_term_tombstone(spark, dirs):
    """df/cf retraction against live recompute, plus the q302
    transition: a term occurring ONLY in deleted docs must vanish from
    the maintained stats (additive-only IVM can never produce this)."""
    from datapipeline_dags_spark.streaming.index_maintenance import (
        LexicalStatsMaintainer,
    )

    rows0 = [(1, "alpha beta gamma"), (2, "beta unique_zzz unique_zzz")]
    rows1 = [(3, "alpha delta"), (4, "beta gamma delta")]
    b0 = spark.createDataFrame(rows0, "doc_id bigint, text string")
    b1 = spark.createDataFrame(rows1, "doc_id bigint, text string")
    m = LexicalStatsMaintainer(spark, dirs["state"])
    m.process_batch(b0, 0)
    assert (
        m.terms(0).filter(F.col("term") == "unique_zzz").count() == 1
    )
    dels = spark.createDataFrame([(2,)], "doc_id bigint")
    m.process_batch(b1, 1, deletes=dels)
    live = b0.unionByName(b1).filter(F.col("doc_id") != 2)
    assert m.matches_full(1, live)
    # the term lived only in doc 2 — tombstoned out with it
    assert m.terms(1).filter(F.col("term") == "unique_zzz").count() == 0
    # corpus totals retracted too
    cs = spark.read.parquet(f"{dirs['state']}/corpus/v1").collect()[0]
    assert cs["n_docs"] == 3


def test_postings_writes_are_per_batch_deltas(spark, dirs):
    """ADVICE r10 #2: the postings store must not be rewritten in full
    per tick — each version dir holds ONLY its own batch's rows."""
    from datapipeline_dags_spark.streaming.index_maintenance import (
        LexicalStatsMaintainer,
    )

    docs = table(spark, SF_DIR, "documents")
    m = LexicalStatsMaintainer(spark, dirs["state"])
    b0 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    m.process_batch(b0, 0)
    m.process_batch(b1, 1)
    v1 = spark.read.parquet(f"{dirs['state']}/postings/v1")
    # v1 contains batch-1 docs only (odd ids) — not the whole corpus
    assert v1.filter(F.col("doc_id") % 2 == 0).count() == 0
    assert v1.count() > 0
    # and the union read still serves the complete live posting list
    assert m.postings(1).select("doc_id").distinct().count() == docs.count()


def test_ivf_serving_from_maintained_state(spark, dirs):
    """The maintained ANN index must SERVE: IVF top-k scored from the
    incrementally-built (insert + delete) assignment state equals the
    same probe over a single-batch state of the identical live corpus —
    maintenance changes WHERE the index came from, never a score."""
    emb = table(spark, SF_DIR, "embeddings")
    inc = IvfIndexMaintainer(spark, dirs["state"] + "/inc", centroid_corpus=emb)
    b0 = emb.filter(F.col("vec_id") % 2 == 0).select("vec_id", "embedding")
    b1 = emb.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    dels = emb.filter(F.col("vec_id") % 5 == 3).select("vec_id")
    inc.process_batch(b0, 0)
    inc.process_batch(b1, 1, deletes=dels)

    live = emb.join(dels, "vec_id", "left_anti")
    full = IvfIndexMaintainer(spark, dirs["state"] + "/full", centroid_corpus=emb)
    full.process_batch(live.select("vec_id", "embedding"), 0)

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    got = sorted(map(tuple, inc.topk(1, queries, k=5).collect()))
    want = sorted(map(tuple, full.topk(0, queries, k=5).collect()))
    assert got == want
    assert len(got) > 0


def test_hybrid_serving_from_maintained_state(spark, dirs):
    """VERDICT r10 ask #4: the full hybrid stack served from maintained
    state — maintained-IVF dense leg fused with the maintained-BM25
    lexical leg via integer micro-unit RRF.  Parity is pinned per leg
    (each equals its single-batch from-scratch twin, proven above) and
    the fusion against an independent pure-python RRF of the two served
    lists.  (q295 is the batch twin but fuses a THIRD leg — LSH — so
    leg-wise parity, not 3-leg output equality, is the right oracle.)"""
    from datapipeline_dags_spark.streaming.index_maintenance import (
        LexicalStatsMaintainer,
        hybrid_topk_from_state,
    )

    emb = table(spark, SF_DIR, "embeddings")
    docs = table(spark, SF_DIR, "documents")
    ivf = IvfIndexMaintainer(spark, dirs["state"] + "/ivf", centroid_corpus=emb)
    lex = LexicalStatsMaintainer(spark, dirs["state"] + "/lex")
    ivf.process_batch(
        emb.filter(F.col("vec_id") % 2 == 0).select("vec_id", "embedding"), 0
    )
    ivf.process_batch(
        emb.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding"), 1
    )
    lex.process_batch(
        docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text"), 0
    )
    lex.process_batch(
        docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text"), 1
    )
    q = emb.filter(F.col("vec_id") == 0).collect()[0]
    qterms = [
        r.term
        for r in lex.terms(1).orderBy(F.col("df").desc(), "term").limit(4).collect()
    ]
    k = 10
    fused = hybrid_topk_from_state(
        spark, ivf, lex, 1, 0, list(q["embedding"]), qterms, k=k
    ).collect()
    assert fused and all(r["fused_rank"] <= k for r in fused)

    # independent fusion of the two served leg lists, pure python
    qdf = spark.createDataFrame(
        [(0, list(q["embedding"]))], "q_id bigint, embedding array<float>"
    )
    dense = {
        r["neighbor_id"]: r["rank"]
        for r in ivf.topk(1, qdf, k=k).collect()
    }
    lex_rows = lex.topk(1, qterms, k=k).collect()
    lexical = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            sorted(lex_rows, key=lambda r: (-r["score_micro"], r["doc_id"]))
        )
    }
    scores: dict[int, tuple[int, int]] = {}
    for leg in (dense, lexical):
        for d, rk in leg.items():
            mic, n = scores.get(d, (0, 0))
            scores[d] = (mic + 1_000_000 // (60 + rk), n + 1)
    expect = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
    got = sorted(
        ((r["doc_id"], (r["rrf_micro"], r["n_methods"])) for r in fused),
        key=lambda kv: (-kv[1][0], kv[0]),
    )
    assert got == expect


def test_tombstones_through_checkpointed_stream(spark, dirs):
    """End-to-end: deletions ride the SAME checkpointed stream as
    arrivals (tombstone flag column, split inside foreachBatch), and
    the maintained lexical state matches the live corpus after each
    tick."""
    from datapipeline_dags_spark.streaming.index_maintenance import (
        LexicalStatsMaintainer,
    )

    docs = table(spark, SF_DIR, "documents")
    m = LexicalStatsMaintainer(spark, dirs["state"])
    schema = "doc_id bigint, text string, is_delete boolean"

    def on_batch(df, bid):
        m.process_batch(
            df.filter(~F.col("is_delete")).select("doc_id", "text"),
            bid,
            deletes=df.filter(F.col("is_delete")).select("doc_id"),
        )

    b0 = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "text", F.lit(False).alias("is_delete")
    )
    _land(b0, dirs["source"], "slice0")
    run_maintenance_batch(spark, dirs["source"], dirs["ckpt"], schema, on_batch)
    assert m.matches_full(0, b0.select("doc_id", "text"))

    # tick 2: odd docs arrive AND doc_id % 6 == 0 docs are tombstoned
    b1 = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "text", F.lit(False).alias("is_delete")
    )
    tomb = docs.filter(F.col("doc_id") % 6 == 0).select(
        "doc_id", F.lit("").alias("text"), F.lit(True).alias("is_delete")
    )
    _land(b1.unionByName(tomb), dirs["source"], "slice1")
    run_maintenance_batch(spark, dirs["source"], dirs["ckpt"], schema, on_batch)
    live = docs.filter(F.col("doc_id") % 6 != 0).select("doc_id", "text")
    assert m.matches_full(1, live)


# ---------------------------------------------------------------------------
# Delta compaction: the append-only delta layout accumulates one dir per
# tick (unbounded read fan-in at streaming cadence) — compact() folds
# the live rows into one _SUCCESS-marked dir, invisible until complete,
# after which superseded deltas (and consumed tombstones) are dropped.
# ---------------------------------------------------------------------------


def test_lexical_compaction_preserves_reads_and_bounds_dirs(spark, dirs):
    import os

    from datapipeline_dags_spark.streaming.index_maintenance import (
        LexicalStatsMaintainer,
    )

    docs = table(spark, SF_DIR, "documents")
    m = LexicalStatsMaintainer(spark, dirs["state"])
    b0 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    dels = docs.filter(F.col("doc_id") % 6 == 0).select("doc_id")
    m.process_batch(b0, 0)
    m.process_batch(b1, 1, deletes=dels)
    before = sorted(map(tuple, m.postings(1).collect()))
    m.compact(2)  # compaction folds deltas STRICTLY BEFORE the tick
    assert sorted(map(tuple, m.postings(1).collect())) == before
    # superseded delta dirs are gone; one compaction dir remains
    names = sorted(os.listdir(f"{dirs['state']}/postings"))
    assert names == ["compact_v1"], names
    # maintenance continues on top of the compaction
    live = docs.filter(F.col("doc_id") % 6 != 0).select("doc_id", "text")
    m.process_batch(spark.createDataFrame([], "doc_id bigint, text string"), 2)
    assert m.matches_full(2, live)
    # serving parity vs a never-compacted twin over the same corpus
    full = LexicalStatsMaintainer(spark, dirs["state"] + "/full")
    full.process_batch(live, 0)
    qterms = [
        r.term
        for r in m.terms(2).orderBy(F.col("df").desc(), "term").limit(5).collect()
    ]
    got = sorted(map(tuple, m.topk(2, qterms, k=15).collect()))
    want = sorted(map(tuple, full.topk(0, qterms, k=15).collect()))
    assert got == want


def test_torn_compaction_is_invisible_and_retry_converges(spark, dirs):
    import glob
    import os

    from datapipeline_dags_spark.streaming.index_maintenance import (
        LexicalStatsMaintainer,
    )

    docs = table(spark, SF_DIR, "documents")
    m = LexicalStatsMaintainer(spark, dirs["state"])
    b0 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    m.process_batch(b0, 0)
    m.process_batch(b1, 1)
    want = sorted(map(tuple, m.postings(1).collect()))
    # simulate a crash mid-compaction: torn part files, NO _SUCCESS,
    # and the delta dirs not yet pruned (pruning runs after the marker)
    cdir = f"{dirs['state']}/postings/compact_v1"
    os.makedirs(cdir, exist_ok=True)
    with open(os.path.join(cdir, "part-00000.parquet"), "wb") as f:
        f.write(b"\x00" * 16)
    assert sorted(map(tuple, m.postings(1).collect())) == want
    parts = glob.glob(os.path.join(cdir, "part-*.parquet"))
    assert parts  # the wreck is really there; readers just ignore it
    m.compact(2)  # the retry a scheduler would run
    assert sorted(map(tuple, m.postings(1).collect())) == want
    assert os.path.exists(os.path.join(cdir, "_SUCCESS"))


def test_completed_compaction_retry_is_idempotent(spark, dirs):
    """Re-invoking compact() for a tick whose compaction ALREADY landed
    (a foreachBatch replay after a crash between compaction and offset
    commit) must be a no-op — before the guard, the fold's input read
    compact_v<k> as its only source while overwriting that same path,
    so the replayed batch failed on every retry and wedged the stream
    (ADVICE r11 #1; the torn-compaction test only covers the
    no-_SUCCESS half of the crash window)."""
    import os

    from datapipeline_dags_spark.streaming.index_maintenance import (
        LexicalStatsMaintainer,
    )

    docs = table(spark, SF_DIR, "documents")
    m = LexicalStatsMaintainer(spark, dirs["state"])
    b0 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    dels = docs.filter(F.col("doc_id") % 6 == 0).select("doc_id")
    m.process_batch(b0, 0)
    m.process_batch(b1, 1, deletes=dels)
    m.compact(2)
    want = sorted(map(tuple, m.postings(1).collect()))
    mtimes = {
        n: os.path.getmtime(os.path.join(dirs["state"], "postings", n))
        for n in os.listdir(f"{dirs['state']}/postings")
    }
    m.compact(2)  # the replay — must neither throw nor rewrite
    assert sorted(map(tuple, m.postings(1).collect())) == want
    assert sorted(os.listdir(f"{dirs['state']}/postings")) == ["compact_v1"]
    for n, t in mtimes.items():
        got = os.path.getmtime(os.path.join(dirs["state"], "postings", n))
        assert got == t, f"replayed compact rewrote {n}"
    # and maintenance continues normally on top
    m.process_batch(spark.createDataFrame([], "doc_id bigint, text string"), 2)
    live = docs.filter(F.col("doc_id") % 6 != 0).select("doc_id", "text")
    assert m.matches_full(2, live)


def test_stale_read_older_than_compaction_raises(spark, dirs):
    """A snapshot read OLDER than the newest landed compaction is
    unrecoverable (its raw deltas were pruned) — it must raise loudly
    instead of silently returning empty/partial state (ADVICE r11 #2)."""
    from datapipeline_dags_spark.streaming.index_maintenance import (
        LexicalStatsMaintainer,
    )

    docs = table(spark, SF_DIR, "documents")
    m = LexicalStatsMaintainer(spark, dirs["state"])
    b0 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    m.process_batch(b0, 0)
    m.process_batch(b1, 1)
    m.compact(2)  # folds snapshots ≤ 1 into compact_v1
    # the replay window (reads at ≥ the compaction) stays open ...
    assert m.postings(1).count() > 0
    # ... but a historical read below it is loud, not silently empty
    with pytest.raises(ValueError, match="predates the newest compaction"):
        m.postings(0).count()


def test_ivf_compaction_with_subsequent_deletes(spark, dirs):
    """Retraction reads the assignment store THROUGH a compaction: a
    delete arriving after compact() must still find the stored rows."""
    emb = table(spark, SF_DIR, "embeddings")
    m = IvfIndexMaintainer(spark, dirs["state"], centroid_corpus=emb)
    b0 = emb.filter(F.col("vec_id") % 2 == 0).select("vec_id", "embedding")
    b1 = emb.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    m.process_batch(b0, 0)
    m.process_batch(b1, 1)
    m.compact(2)  # folds batches 0-1; tick 2 may still replay safely
    dels = emb.filter(F.col("vec_id") % 5 == 2).select("vec_id")
    m.process_batch(
        spark.createDataFrame([], "vec_id bigint, embedding array<float>"),
        2,
        deletes=dels,
    )
    live = emb.join(dels, "vec_id", "left_anti")
    assert m.matches_full(2, live)
    assert m.assign(2).join(dels, "vec_id", "left_semi").count() == 0


def test_same_tick_arrival_and_deletion_retracts(spark, dirs):
    """A doc/vector that ARRIVES and is tombstoned in the SAME tick
    must leave no trace in any state table — the batch's own
    contribution retracts too (found by a vanilla-session drive: the
    victim lookup used to read only the previous state)."""
    from datapipeline_dags_spark.streaming.index_maintenance import (
        LexicalStatsMaintainer,
    )

    docs = table(spark, SF_DIR, "documents")
    emb = table(spark, SF_DIR, "embeddings")
    # deletes hit BOTH a batch-0 doc (mod 18 == 0, even) and docs
    # arriving in batch 1 itself (mod 9 odd multiples: 9, 27, ...)
    dels = docs.filter(F.col("doc_id") % 9 == 0).select("doc_id")
    lex = LexicalStatsMaintainer(spark, dirs["state"] + "/lex")
    lex.process_batch(
        docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text"), 0
    )
    lex.process_batch(
        docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text"),
        1,
        deletes=dels,
    )
    live = docs.filter(F.col("doc_id") % 9 != 0).select("doc_id", "text")
    assert lex.matches_full(1, live)

    vdels = emb.filter(F.col("vec_id") % 9 == 0).select("vec_id")
    ivf = IvfIndexMaintainer(spark, dirs["state"] + "/ivf", centroid_corpus=emb)
    ivf.process_batch(
        emb.filter(F.col("vec_id") % 2 == 0).select("vec_id", "embedding"), 0
    )
    ivf.process_batch(
        emb.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding"),
        1,
        deletes=vdels,
    )
    assert ivf.matches_full(1, emb.join(vdels, "vec_id", "left_anti"))

    lsh = LshIndexMaintainer(spark, dirs["state"] + "/lsh")
    lsh.process_batch(
        docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text"), 0
    )
    lsh.process_batch(
        docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text"),
        1,
        deletes=dels,
    )
    assert lsh.matches_full(1, live)


def test_full_hybrid_serving_matches_q295(spark, dirs):
    """The COMPLETE q295 stack served from maintained state — BM25
    more-like-this + sign-LSH + IVF legs, integer micro-unit RRF — must
    BIT-COMPARE against the batch q295 over the same corpus (and each
    dense leg against its batch query), with the IVF maintainer built
    on q47's ann_params centroid count."""
    from datapipeline_dags_spark.plans import llm_ops
    from datapipeline_dags_spark.streaming.index_maintenance import (
        LexicalStatsMaintainer,
        SignLshIndexMaintainer,
        hybrid_full_from_state,
    )

    emb = table(spark, SF_DIR, "embeddings")
    docs = table(spark, SF_DIR, "documents")
    n_cent, _, _ = llm_ops.ann_params(llm_ops.corpus_size(spark, SF_DIR))
    ivf = IvfIndexMaintainer(
        spark, dirs["state"] + "/ivf", centroid_corpus=emb, n_centroids=n_cent
    )
    slsh = SignLshIndexMaintainer(spark, dirs["state"] + "/slsh")
    lex = LexicalStatsMaintainer(spark, dirs["state"] + "/lex")
    for bid, pred in ((0, 0), (1, 1)):
        ivf.process_batch(
            emb.filter(F.col("vec_id") % 2 == pred).select("vec_id", "embedding"),
            bid,
        )
        slsh.process_batch(
            emb.filter(F.col("vec_id") % 2 == pred).select("vec_id", "embedding"),
            bid,
        )
        lex.process_batch(
            docs.filter(F.col("doc_id") % 2 == pred).select("doc_id", "text"),
            bid,
        )
    queries = emb.filter(F.col("vec_id") < llm_ops.N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    # dense leg parity vs the batch queries
    got_lsh = sorted(
        map(tuple, slsh.topk(1, queries, k=llm_ops.LSH_K).collect())
    )
    want_lsh = sorted(
        map(
            tuple,
            llm_ops.q46_ann_lsh_bucketed(spark, SF_DIR)
            .filter(F.col("q_id") < llm_ops.N_QUERIES)
            .collect(),
        )
    )
    assert got_lsh == want_lsh and got_lsh
    got_ivf = sorted(
        map(tuple, ivf.topk(1, queries, k=llm_ops.IVF_K).collect())
    )
    want_ivf = sorted(map(tuple, llm_ops.q47_ann_ivf(spark, SF_DIR).collect()))
    assert got_ivf == want_ivf and got_ivf
    # full three-leg fusion parity vs the batch q295
    got = sorted(
        map(
            tuple,
            hybrid_full_from_state(spark, ivf, slsh, lex, 1, queries).collect(),
        )
    )
    want = sorted(
        map(tuple, llm_ops.q295_hybrid_retrieval(spark, SF_DIR).collect())
    )
    assert got == want and got


def test_sign_lsh_serving_with_deletes_and_compaction(spark, dirs):
    """Sign-LSH serving through tombstones and a compaction equals a
    single-batch maintainer over the live corpus (merge/layout
    invariance: maintenance changes WHERE the index came from, never a
    score)."""
    from datapipeline_dags_spark.plans import llm_ops
    from datapipeline_dags_spark.streaming.index_maintenance import (
        SignLshIndexMaintainer,
    )

    emb = table(spark, SF_DIR, "embeddings")
    inc = SignLshIndexMaintainer(spark, dirs["state"] + "/inc")
    inc.process_batch(
        emb.filter(F.col("vec_id") % 2 == 0).select("vec_id", "embedding"), 0
    )
    dels = emb.filter(F.col("vec_id") % 7 == 3).select("vec_id")
    inc.process_batch(
        emb.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding"),
        1,
        deletes=dels,
    )
    inc.compact(2)
    live = emb.join(dels, "vec_id", "left_anti")
    full = SignLshIndexMaintainer(spark, dirs["state"] + "/full")
    full.process_batch(live.select("vec_id", "embedding"), 0)
    queries = live.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    got = sorted(map(tuple, inc.topk(1, queries, k=llm_ops.LSH_K).collect()))
    want = sorted(map(tuple, full.topk(0, queries, k=llm_ops.LSH_K).collect()))
    assert got == want and got
    assert inc._live("vecs", 1, inc.VECS_SCHEMA).join(
        dels, "vec_id", "left_semi"
    ).count() == 0


# ---------------------------------------------------------------------------
# PQ code-table maintenance — the FOURTH index family's IVM contract
# (VERDICT r11 ask #2): frozen codebook, map-only delta encode, id-keyed
# delete retraction, matches_full vs full re-encode, q75-parity serving,
# q306 staleness trigger.
# ---------------------------------------------------------------------------


def test_pq_maintenance_stream(spark, dirs):
    from datapipeline_dags_spark.streaming.index_maintenance import (
        PqIndexMaintainer,
    )

    emb = table(spark, SF_DIR, "embeddings")
    m = PqIndexMaintainer(spark, dirs["state"], codebook_corpus=emb)
    schema = "vec_id bigint, embedding array<float>"
    batches = [
        emb.filter(F.col("vec_id") % 3 == 0),
        emb.filter(F.col("vec_id") % 3 == 1),
        emb.filter(F.col("vec_id") % 3 == 2),
    ]
    seen = None
    for bid, b in enumerate(batches):
        _land(b.select("vec_id", "embedding"), dirs["source"], f"slice{bid}")
        run_maintenance_batch(
            spark, dirs["source"], dirs["ckpt"], schema, m.process_batch
        )
        seen = b if seen is None else seen.unionByName(b)
        assert m.matches_full(bid, seen), f"PQ codes diverged at batch {bid}"
    assert m.codes(len(batches) - 1).count() == emb.count()


def test_pq_maintenance_with_deletes_and_reinsert(spark, dirs):
    """The q305 retraction through state: same-tick arrival+deletion,
    id-keyed drop (no re-encode), delete→re-insert visible again, and
    the whole thing THROUGH a compaction."""
    from datapipeline_dags_spark.streaming.index_maintenance import (
        PqIndexMaintainer,
    )

    emb = table(spark, SF_DIR, "embeddings")
    m = PqIndexMaintainer(spark, dirs["state"], codebook_corpus=emb)
    # deletes hit BOTH a batch-0 vector (mod 18 == 0, even) and vectors
    # arriving in batch 1 itself (odd multiples of 9)
    dels = emb.filter(F.col("vec_id") % 9 == 0).select("vec_id")
    m.process_batch(
        emb.filter(F.col("vec_id") % 2 == 0).select("vec_id", "embedding"), 0
    )
    m.process_batch(
        emb.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding"),
        1,
        deletes=dels,
    )
    live = emb.join(dels, "vec_id", "left_anti")
    assert m.matches_full(1, live)
    assert m.codes(1).join(dels, "vec_id", "left_semi").count() == 0
    m.compact(2)
    reins = emb.filter(F.col("vec_id") % 18 == 9).select("vec_id", "embedding")
    m.process_batch(reins, 2)  # the re-crawl of half the deleted ids
    live2 = emb.filter(
        (F.col("vec_id") % 9 != 0) | (F.col("vec_id") % 18 == 9)
    )
    assert m.matches_full(2, live2)
    assert (
        m.codes(2).join(reins.select("vec_id"), "vec_id", "left_semi").count()
        == reins.count()
    )


def test_pq_crash_mid_delta_write_replay_converges(spark, dirs):
    """A torn codes-delta write followed by a foreachBatch replay must
    converge (the delta dir is a pure function of the batch)."""
    import os

    from datapipeline_dags_spark.streaming.index_maintenance import (
        PqIndexMaintainer,
    )

    emb = table(spark, SF_DIR, "embeddings")
    m = PqIndexMaintainer(spark, dirs["state"], codebook_corpus=emb)
    b0 = emb.filter(F.col("vec_id") % 2 == 0).select("vec_id", "embedding")
    b1 = emb.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    m.process_batch(b0, 0)
    m.process_batch(b1, 1)
    # wreck batch 1's codes delta (simulated crash mid-overwrite) ...
    _wreck_version_dir(dirs["state"], "codes", 1)
    # ... and replay the batch, as Structured Streaming would
    m.process_batch(b1, 1)
    assert m.matches_full(1, emb)


def test_pq_serving_matches_batch_q75(spark, dirs):
    """The maintained PQ index SERVES q75's ADC + exact-refine path
    bit-equal to the batch query over the same corpus — the q296-style
    served-vs-batch parity for the ADC scoring path (VERDICT r11 ask
    #2's done-criterion)."""
    from datapipeline_dags_spark.plans import llm_ops
    from datapipeline_dags_spark.streaming.index_maintenance import (
        PqIndexMaintainer,
    )

    emb = table(spark, SF_DIR, "embeddings")
    m = PqIndexMaintainer(spark, dirs["state"], codebook_corpus=emb)
    m.process_batch(
        emb.filter(F.col("vec_id") % 2 == 0).select("vec_id", "embedding"), 0
    )
    m.process_batch(
        emb.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding"), 1
    )
    queries = emb.filter(F.col("vec_id") < llm_ops.N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    got = sorted(map(tuple, m.topk(1, queries, k=llm_ops.TOPK).collect()))
    want = sorted(map(tuple, llm_ops.q75_ann_pq(spark, SF_DIR).collect()))
    assert got == want and got


def test_pq_staleness_flags_planted_drift(spark, dirs):
    """q306's retrain trigger from maintained state: a live corpus
    equal to the base epoch reads drift 1.0 / no flags; planting a
    distribution-shifted batch (negated + offset embeddings, far from
    every frozen centroid relative to their energy) must raise the
    retrain flag on every subspace."""
    from datapipeline_dags_spark.streaming.index_maintenance import (
        PqIndexMaintainer,
    )

    emb = table(spark, SF_DIR, "embeddings")
    m = PqIndexMaintainer(spark, dirs["state"], codebook_corpus=emb)
    m.process_batch(emb.select("vec_id", "embedding"), 0)
    healthy = m.staleness(0).collect()
    assert healthy and all(r["retrain"] == 0 for r in healthy)
    assert all(abs(r["drift_ratio"] - 1.0) < 1e-4 for r in healthy)
    drifted = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x: (x.cast("double") * F.lit(-1.0) + F.lit(2.0)).cast(
                "float"
            ),
        ).alias("embedding"),
    )
    m.process_batch(drifted, 1)
    stale = m.staleness(1).collect()
    assert len(stale) == len(healthy)
    assert all(r["retrain"] == 1 for r in stale), stale
    assert all(r["drift_ratio"] > 1.5 for r in stale)


def test_compaction_cadence_policy_bounds_delta_dirs(spark, dirs):
    """VERDICT r11 ask #4: run_maintenance_batch(compact_every=K) must
    bound the per-table delta-dir count at K + 1 (plus one compaction
    dir) over a LONG drive with deletes — where the caller-driven-only
    design accumulated one dir per tick forever — with reads staying
    correct through every fold."""
    import os

    from datapipeline_dags_spark.streaming.index_maintenance import (
        LexicalStatsMaintainer,
    )

    docs = table(spark, SF_DIR, "documents")
    m = LexicalStatsMaintainer(spark, dirs["state"])
    schema = "doc_id bigint, text string, is_delete boolean"

    def on_batch(df, bid):
        m.process_batch(
            df.filter(~F.col("is_delete")).select("doc_id", "text"),
            bid,
            deletes=df.filter(F.col("is_delete")).select("doc_id"),
        )

    n_ticks, k = 30, 4
    arrived = None
    deleted = None
    for t in range(n_ticks):
        arr = docs.filter(F.col("doc_id") % n_ticks == t).select(
            "doc_id", "text", F.lit(False).alias("is_delete")
        )
        slice_t = arr
        if t > 0:
            # tombstone a third of the PREVIOUS tick's arrivals
            dels = docs.filter(
                (F.col("doc_id") % n_ticks == t - 1)
                & (F.col("doc_id") % 3 == 0)
            ).select(
                "doc_id", F.lit("").alias("text"), F.lit(True).alias("is_delete")
            )
            slice_t = arr.unionByName(dels)
            deleted = (
                dels.select("doc_id")
                if deleted is None
                else deleted.unionByName(dels.select("doc_id"))
            )
        _land(slice_t, dirs["source"], f"slice{t:03d}")
        run_maintenance_batch(
            spark,
            dirs["source"],
            dirs["ckpt"],
            schema,
            on_batch,
            maintainers=[m],
            compact_every=k,
        )
        arrived = (
            arr.select("doc_id", "text")
            if arrived is None
            else arrived.unionByName(arr.select("doc_id", "text"))
        )
    # dir bound: at most K deltas since the last cadence fold + 1
    # compaction dir (ticks n_ticks-1 down to the last multiple of K)
    for tbl in ("postings", "tombstones"):
        names = os.listdir(os.path.join(dirs["state"], tbl))
        n_deltas = sum(1 for n in names if not n.startswith("compact_"))
        n_compacts = sum(1 for n in names if n.startswith("compact_"))
        assert n_deltas <= k + 1, (tbl, sorted(names))
        assert n_compacts == 1, (tbl, sorted(names))
    live = arrived.join(deleted, "doc_id", "left_anti")
    assert m.matches_full(n_ticks - 1, live)


def test_manifest_to_serving_lifecycle(spark, dirs, tmp_path):
    """VERDICT r11 ask #5 — the lifecycle composed END TO END: build
    all three serving indexes over the full corpus, apply the q298
    dedup deletion manifest as streaming tombstones, and the SERVED
    three-leg hybrid (a) never returns a dropped document as query or
    neighbor and (b) BIT-MATCHES the batch q295 computed over the
    retained corpus.  The maintainers' model artifacts (IVF quantizer)
    are pinned to the retained corpus so the batch comparison is
    well-defined; the deletion itself flows purely through state —
    full-corpus build, manifest tombstones, no rebuild."""
    from datapipeline_dags_spark.plans import llm_ops
    from datapipeline_dags_spark.streaming.index_maintenance import (
        LexicalStatsMaintainer,
        SignLshIndexMaintainer,
        hybrid_full_from_state,
    )

    docs = table(spark, SF_DIR, "documents")
    emb = table(spark, SF_DIR, "embeddings")
    manifest = llm_ops.q298_dedup_deletion_manifest(spark, SF_DIR).select(
        F.col("drop_doc_id").alias("doc_id")
    )
    assert manifest.count() > 0
    retained_docs = docs.join(manifest, "doc_id", "left_anti")
    retained_emb = emb.join(
        manifest.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_anti"
    )
    # the retained corpus as a batch fixture dir (q295's ground truth)
    ret_dir = str(tmp_path / "retained_sf")
    retained_docs.write.parquet(f"{ret_dir}/documents.parquet")
    retained_emb.write.parquet(f"{ret_dir}/embeddings.parquet")
    n_cent, _, _ = llm_ops.ann_params(retained_emb.count())

    ivf = IvfIndexMaintainer(
        spark,
        dirs["state"] + "/ivf",
        centroid_corpus=retained_emb,
        n_centroids=n_cent,
    )
    slsh = SignLshIndexMaintainer(spark, dirs["state"] + "/slsh")
    lex = LexicalStatsMaintainer(spark, dirs["state"] + "/lex")
    # tick 0: the FULL corpus is indexed; tick 1: the manifest applies
    # as tombstones — deletion through state, never a re-index
    ivf.process_batch(emb.select("vec_id", "embedding"), 0)
    slsh.process_batch(emb.select("vec_id", "embedding"), 0)
    lex.process_batch(docs.select("doc_id", "text"), 0)
    no_vecs = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    no_docs = spark.createDataFrame([], "doc_id bigint, text string")
    ivf.process_batch(no_vecs, 1, deletes=manifest)
    slsh.process_batch(no_vecs, 1, deletes=manifest)
    lex.process_batch(no_docs, 1, deletes=manifest)

    queries = retained_emb.filter(F.col("vec_id") < llm_ops.N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    served = hybrid_full_from_state(spark, ivf, slsh, lex, 1, queries)
    served_rows = sorted(map(tuple, served.collect()))
    # (a) no dropped document is ever served
    assert (
        served.join(
            manifest.select(F.col("doc_id").alias("neighbor_id")),
            "neighbor_id",
            "left_semi",
        ).count()
        == 0
    )
    # (b) bit-parity with the batch q295 over the retained corpus
    want = sorted(
        map(tuple, llm_ops.q295_hybrid_retrieval(spark, ret_dir).collect())
    )
    assert served_rows == want and served_rows


def test_served_recall_floor_after_churn(spark, dirs):
    """VERDICT r11 ask #7: after a 10-tick insert/delete drive with
    compactions, each served ANN leg's recall vs the exact top-k over
    the live corpus must EQUAL the batch leg's floor (a fresh
    single-batch maintainer over the same live corpus) — heavy churn
    may not cost the maintained index a single point of recall."""
    from datapipeline_dags_spark.plans import llm_ops
    from datapipeline_dags_spark.streaming.index_maintenance import (
        PqIndexMaintainer,
        SignLshIndexMaintainer,
    )

    emb = table(spark, SF_DIR, "embeddings")
    n_cent, _, _ = llm_ops.ann_params(llm_ops.corpus_size(spark, SF_DIR))
    ivf = IvfIndexMaintainer(
        spark, dirs["state"] + "/ivf", centroid_corpus=emb, n_centroids=n_cent
    )
    pq = PqIndexMaintainer(spark, dirs["state"] + "/pq", codebook_corpus=emb)
    slsh = SignLshIndexMaintainer(spark, dirs["state"] + "/slsh")
    deleted = None
    for t in range(10):
        arr = emb.filter(F.col("vec_id") % 10 == t).select(
            "vec_id", "embedding"
        )
        dels = None
        if t in (3, 6, 9):
            # delete a slice of everything already arrived (mods < t)
            dels = emb.filter(
                (F.col("vec_id") % 10 < t) & (F.col("vec_id") % 17 == t)
            ).select("vec_id")
            deleted = dels if deleted is None else deleted.unionByName(dels)
        for m in (ivf, pq, slsh):
            m.process_batch(arr, t, deletes=dels)
        if t in (4, 8):
            for m in (ivf, pq, slsh):
                m.compact(t + 1)
    live = emb.join(deleted, "vec_id", "left_anti")
    assert ivf.matches_full(9, live) and pq.matches_full(9, live)

    queries = live.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    # exact ground truth over the live corpus
    from pyspark.sql import Window as _W

    exact = (
        queries.crossJoin(
            live.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("ne"),
            )
        )
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select(
            "q_id",
            "neighbor_id",
            F.round(llm_ops._cosine(F.col("embedding"), F.col("ne")), 6).alias(
                "cs"
            ),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                _W.partitionBy("q_id").orderBy(F.col("cs").desc(), "neighbor_id")
            ),
        )
    )

    def recall(served, k):
        truth = exact.filter(F.col("rank") <= k).select("q_id", "neighbor_id")
        hit = served.join(truth, ["q_id", "neighbor_id"], "left_semi").count()
        return hit / truth.count()

    fresh_ivf = IvfIndexMaintainer(
        spark, dirs["state"] + "/fivf", centroid_corpus=emb, n_centroids=n_cent
    )
    fresh_pq = PqIndexMaintainer(
        spark, dirs["state"] + "/fpq", codebook_corpus=emb
    )
    fresh_slsh = SignLshIndexMaintainer(spark, dirs["state"] + "/fslsh")
    for m in (fresh_ivf, fresh_pq, fresh_slsh):
        m.process_batch(live.select("vec_id", "embedding"), 0)
    for churned, fresh, k in (
        (ivf.topk(9, queries, k=5), fresh_ivf.topk(0, queries, k=5), 5),
        (pq.topk(9, queries, k=10), fresh_pq.topk(0, queries, k=10), 10),
        (
            slsh.topk(9, queries, k=llm_ops.LSH_K),
            fresh_slsh.topk(0, queries, k=llm_ops.LSH_K),
            llm_ops.LSH_K,
        ),
    ):
        r_churned = recall(churned, k)
        r_fresh = recall(fresh, k)
        assert r_churned == r_fresh, (k, r_churned, r_fresh)
        assert r_churned > 0.5, (k, r_churned)


def test_ivfpq_maintenance_with_deletes_and_reinsert(spark, dirs):
    """q307's contract through state: the IVF-PQ (cell, codes) rows
    maintain under same-tick arrival+deletion, survive a compaction,
    and a delete→re-insert is visible again — with matches_full
    auditing against a full re-encode over the live corpus."""
    from datapipeline_dags_spark.plans import llm_ops
    from datapipeline_dags_spark.streaming.index_maintenance import (
        IvfPqIndexMaintainer,
    )

    emb = table(spark, SF_DIR, "embeddings")
    n_cent, _, _ = llm_ops.ann_params(llm_ops.corpus_size(spark, SF_DIR))
    m = IvfPqIndexMaintainer(
        spark, dirs["state"], corpus=emb, n_centroids=n_cent
    )
    dels = emb.filter(F.col("vec_id") % 9 == 0).select("vec_id")
    m.process_batch(
        emb.filter(F.col("vec_id") % 2 == 0).select("vec_id", "embedding"), 0
    )
    m.process_batch(
        emb.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding"),
        1,
        deletes=dels,
    )
    live = emb.join(dels, "vec_id", "left_anti")
    assert m.matches_full(1, live)
    assert m.codes(1).join(dels, "vec_id", "left_semi").count() == 0
    m.compact(2)
    reins = emb.filter(F.col("vec_id") % 18 == 9).select("vec_id", "embedding")
    m.process_batch(reins, 2)
    live2 = emb.filter(
        (F.col("vec_id") % 9 != 0) | (F.col("vec_id") % 18 == 9)
    )
    assert m.matches_full(2, live2)


def test_ivfpq_serving_matches_batch_q112(spark, dirs):
    """The maintained IVF-PQ index SERVES q112's probe + residual-ADC +
    exact-refine path bit-equal to the batch query over the same corpus
    (with the maintainer handed q112's ann_params)."""
    from datapipeline_dags_spark.plans import llm_ops
    from datapipeline_dags_spark.streaming.index_maintenance import (
        IvfPqIndexMaintainer,
    )

    emb = table(spark, SF_DIR, "embeddings")
    n_cent, nprobe, refine = llm_ops.ann_params(
        llm_ops.corpus_size(spark, SF_DIR)
    )
    m = IvfPqIndexMaintainer(
        spark, dirs["state"], corpus=emb, n_centroids=n_cent
    )
    m.process_batch(
        emb.filter(F.col("vec_id") % 2 == 0).select("vec_id", "embedding"), 0
    )
    m.process_batch(
        emb.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding"), 1
    )
    queries = emb.filter(F.col("vec_id") < llm_ops.N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    got = sorted(
        map(
            tuple,
            m.topk(
                1, queries, k=llm_ops.TOPK, nprobe=nprobe, refine=refine
            ).collect(),
        )
    )
    want = sorted(map(tuple, llm_ops.q112_ann_ivfpq(spark, SF_DIR).collect()))
    assert got == want and got


def test_delete_then_reinsert_is_visible_again(spark, dirs):
    """Version-scoped tombstones: an id deleted at tick t and
    re-ingested at t' > t must be fully live again — in the aggregate
    state, the delta reads, AND the served lists (the review finding:
    permanent tombstones silently suppressed re-inserts from serving
    while the versioned aggregates counted them)."""
    from datapipeline_dags_spark.streaming.index_maintenance import (
        LexicalStatsMaintainer,
    )

    docs = table(spark, SF_DIR, "documents")
    m = LexicalStatsMaintainer(spark, dirs["state"] + "/lex")
    reins = docs.filter(F.col("doc_id") % 10 == 4).select("doc_id", "text")
    m.process_batch(docs.select("doc_id", "text"), 0)
    m.process_batch(
        spark.createDataFrame([], "doc_id bigint, text string"),
        1,
        deletes=reins.select("doc_id"),
    )
    live1 = docs.join(reins.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id", "text"
    )
    assert m.matches_full(1, live1)
    m.process_batch(reins, 2)  # the re-crawl
    assert m.matches_full(2, docs.select("doc_id", "text"))
    assert (
        m.postings(2).join(reins.select("doc_id"), "doc_id", "left_semi")
        .select("doc_id").distinct().count()
        == reins.count()
    )

    # same contract on the IVF side, THROUGH a compaction
    emb = table(spark, SF_DIR, "embeddings")
    ivf = IvfIndexMaintainer(spark, dirs["state"] + "/ivf", centroid_corpus=emb)
    vre = emb.filter(F.col("vec_id") % 10 == 4).select("vec_id", "embedding")
    ivf.process_batch(emb.select("vec_id", "embedding"), 0)
    ivf.process_batch(
        spark.createDataFrame([], "vec_id bigint, embedding array<float>"),
        1,
        deletes=vre.select("vec_id"),
    )
    ivf.compact(2)
    ivf.process_batch(vre, 2)
    assert ivf.matches_full(2, emb)
    assert (
        ivf.assign(2).join(vre.select("vec_id"), "vec_id", "left_semi").count()
        == vre.count()
    )
