"""GlmMaintainer — streaming model maintenance contracts.

Mirrors the index-maintainer test battery for the model family: state
parity after insert ticks, delete retraction, delete→re-insert
visibility, same-tick arrival+deletion, crash replay idempotence,
compaction invariance, and fit parity with the batch q321 trainer at
its 4-dp reporting precision.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipeline_dags_spark.catalog import table
from datapipeline_dags_spark.plans import llm_ops
from datapipeline_dags_spark.streaming.model_maintenance import GlmMaintainer
from tests.conftest import SF_DIR


@pytest.fixture()
def state(tmp_path):
    return str(tmp_path / "state")


def _docs(spark):
    return table(spark, SF_DIR, "documents")


def _w4(w):
    return [round(x, 4) for x in w]


def test_glm_state_and_fit_parity_after_inserts(spark, state):
    docs = _docs(spark)
    m = GlmMaintainer(spark, state)
    b0 = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    b2 = docs.filter(F.col("doc_id") % 3 == 2)
    for i, b in enumerate((b0, b1, b2)):
        m.process_batch(b, i)
    assert m.matches_full(2, docs)
    # refit from state == batch q321 fit at reporting precision
    batch_w = llm_ops._irls_fit(llm_ops._irls_feats(spark, SF_DIR))
    assert _w4(m.fit(2)) == _w4(batch_w)


def test_glm_delete_retraction_and_reinsert(spark, state):
    docs = _docs(spark)
    m = GlmMaintainer(spark, state)
    m.process_batch(docs, 0)
    dels = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    m.process_batch(docs.limit(0), 1, deletes=dels)
    live = docs.join(dels, "doc_id", "anti")
    assert m.matches_full(1, live)
    # the refit is the fit of the REMAINING corpus
    from datapipeline_dags_spark.checkpoint import local_checkpoint

    live_w = llm_ops._irls_fit(
        local_checkpoint(llm_ops._irls_featurize(live), "t live feats")
    )
    assert _w4(m.fit(1)) == _w4(live_w)
    # re-insert at a later tick: visible again (version-scoped tombs)
    back = docs.filter(F.col("doc_id") % 5 == 0)
    m.process_batch(back, 2)
    assert m.matches_full(2, docs)


def test_glm_same_tick_arrival_and_deletion(spark, state):
    docs = _docs(spark)
    m = GlmMaintainer(spark, state)
    m.process_batch(docs, 0)
    newb = docs.limit(0)
    dels = docs.filter(F.col("doc_id") < 10).select("doc_id")
    # tick 1: nothing arrives, first 10 retract
    m.process_batch(newb, 1, deletes=dels)
    # tick 2: doc 3 arrives AND is deleted in the same tick — the
    # version-scoped tombstone (v=2 >= row v=2) keeps it dead
    doc3 = docs.filter(F.col("doc_id") == 3)
    m.process_batch(doc3, 2, deletes=doc3.select("doc_id"))
    live = docs.filter(F.col("doc_id") >= 10)
    assert m.matches_full(2, live)


def test_glm_crash_replay_idempotent(spark, state):
    docs = _docs(spark)
    m = GlmMaintainer(spark, state)
    m.process_batch(docs.filter(F.col("doc_id") % 2 == 0), 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    m.process_batch(b1, 1)
    # crash before offset commit: the same batch id replays
    m.process_batch(b1, 1)
    assert m.matches_full(1, docs)


def test_glm_compaction_preserves_fit(spark, state):
    docs = _docs(spark)
    m = GlmMaintainer(spark, state)
    for i in range(4):
        m.process_batch(docs.filter(F.col("doc_id") % 4 == i), i)
    dels = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    m.process_batch(docs.limit(0), 4, deletes=dels)
    before = _w4(m.fit(4))
    m.compact(4)
    after = _w4(m.fit(4))
    assert before == after
    live = docs.join(dels, "doc_id", "anti")
    assert m.matches_full(4, live)


def test_glm_matches_full_detects_lost_rows(spark, state):
    """The audit must FAIL when state and corpus disagree — feed it a
    corpus containing a document the maintainer never saw."""
    docs = _docs(spark)
    m = GlmMaintainer(spark, state)
    m.process_batch(docs.filter(F.col("doc_id") > 0), 0)
    assert m.matches_full(0, docs.filter(F.col("doc_id") > 0))
    assert not m.matches_full(0, docs)


def test_glm_joins_manifest_lifecycle(spark, state, tmp_path):
    """The model family composed into the deletion lifecycle: index
    the full corpus, apply the q298 dedup deletion manifest as
    tombstones, and the REFIT model equals a batch q321 fit over the
    retained corpus (state row-parity exact; weights at the 4-dp
    reporting precision) — model freshness flows through the same
    manifest the serving indexes consume, no re-featurization."""
    from datapipeline_dags_spark.checkpoint import local_checkpoint

    docs = _docs(spark)
    manifest = llm_ops.q298_dedup_deletion_manifest(spark, SF_DIR).select(
        F.col("drop_doc_id").alias("doc_id")
    )
    assert manifest.count() > 0
    m = GlmMaintainer(spark, state)
    m.process_batch(docs, 0)
    m.process_batch(docs.limit(0), 1, deletes=manifest)
    retained = docs.join(manifest, "doc_id", "left_anti")
    assert m.matches_full(1, retained)
    want = llm_ops._irls_fit(
        local_checkpoint(llm_ops._irls_featurize(retained), "t retained feats")
    )
    assert _w4(m.fit(1)) == _w4(want)


def test_glm_drift_alarm_separates_benign_from_poisoned(spark, state):
    """The q306-for-models: benign churn (a delete-and-reinsert of a
    random slice) barely moves the refit, while a poisoned tick (a
    large batch with the label pattern INVERTED) moves coefficients by
    orders of magnitude more — the drift monitor separates the two."""
    docs = _docs(spark)
    m = GlmMaintainer(spark, state)
    m.process_batch(docs, 0)
    w0 = m.fit(0)
    # benign tick: re-crawl of an existing slice (delete + re-insert)
    slice_ = docs.filter(F.col("doc_id") % 11 == 0)
    m.process_batch(slice_, 1, deletes=slice_.select("doc_id"))
    m.process_batch(slice_, 2)
    w_benign = m.fit(2)
    benign = GlmMaintainer.drift_u(w0, w_benign)
    # poisoned tick: a same-sized corpus with length-label INVERTED
    # (long docs tagged non-target) lands as new ids
    inverted = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text",
        F.when(F.col("lang") == llm_ops.IRLS_TARGET_LANG, F.lit("zz"))
        .otherwise(F.lit(llm_ops.IRLS_TARGET_LANG))
        .alias("lang"),
        "source",
        "n_chars",
    )
    m.process_batch(inverted, 3)
    w_poisoned = m.fit(3)
    poisoned = GlmMaintainer.drift_u(w0, w_poisoned)
    assert benign < poisoned
    assert poisoned > 10 * max(benign, 1)


def test_glm_through_checkpointed_stream_with_cadence(spark, tmp_path):
    """End-to-end: the GLM maintainer rides run_maintenance_batch —
    arrivals and tombstone-flagged deletions in ONE checkpointed
    stream, the compact_every cadence invoking the maintainer's
    compaction — and the refit matches the batch fit of the live
    corpus after every tick (the index maintainers' ST integration,
    extended to the model family)."""
    import os as _os

    from datapipeline_dags_spark.streaming.index_maintenance import (
        run_maintenance_batch,
    )
    from tests.test_index_maintenance_stream import _land

    src = str(tmp_path / "arrivals")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    _os.makedirs(src)

    def land(df, name):
        _land(df, src, name)

    docs = _docs(spark)
    m = GlmMaintainer(spark, state)
    schema = (
        "doc_id bigint, text string, lang string, source string, "
        "is_delete boolean"
    )

    def on_batch(df, bid):
        m.process_batch(
            df.filter(~F.col("is_delete")).select(
                "doc_id", "text", "lang", "source"
            ),
            bid,
            deletes=df.filter(F.col("is_delete")).select("doc_id"),
        )

    cols = ["doc_id", "text", "lang", "source"]
    b0 = docs.filter(F.col("doc_id") % 2 == 0).select(
        *cols, F.lit(False).alias("is_delete")
    )
    land(b0, "slice0")
    run_maintenance_batch(
        spark, src, ckpt, schema, on_batch,
        maintainers=[m], compact_every=2,
    )
    assert m.matches_full(0, b0.select(*cols))

    # tick 1: odd docs arrive; tick 2 (cadence tick): doc_id%6==0
    # tombstoned — compaction fires inside the stream
    b1 = docs.filter(F.col("doc_id") % 2 == 1).select(
        *cols, F.lit(False).alias("is_delete")
    )
    land(b1, "slice1")
    run_maintenance_batch(
        spark, src, ckpt, schema, on_batch,
        maintainers=[m], compact_every=2,
    )
    tomb = docs.filter(F.col("doc_id") % 6 == 0).select(
        "doc_id", F.lit("x").alias("text"), F.lit("en").alias("lang"),
        F.lit("s").alias("source"), F.lit(True).alias("is_delete"),
    )
    land(tomb, "slice2")
    run_maintenance_batch(
        spark, src, ckpt, schema, on_batch,
        maintainers=[m], compact_every=2,
    )
    live = docs.filter(F.col("doc_id") % 6 != 0)
    assert m.matches_full(2, live)
    from datapipeline_dags_spark.checkpoint import local_checkpoint

    want = llm_ops._irls_fit(
        local_checkpoint(llm_ops._irls_featurize(live), "t stream live")
    )
    assert _w4(m.fit(2)) == _w4(want)
