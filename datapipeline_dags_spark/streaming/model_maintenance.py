"""Streaming MODEL maintenance — the q321/q323 GLM kept fresh under
insert/delete churn (the fifth maintained artifact family, after the
IVF / LSH / BM25 / PQ indexes of ``index_maintenance``).

The maintained state is the FEATURE frame, not the weights: logistic
IRLS is a constant number of passes over features, so keeping
(doc_id, source, y, x1, x2) as O(batch) per-tick deltas (with the
version-scoped tombstone / crash-replay / compaction lifecycle shared
with the index maintainers) makes every refit a fixed-cost job over
compact state — no re-tokenization of the corpus, delete-aware by
construction.  ``matches_full`` audits the STATE row-for-row against a
from-scratch featurization of the live corpus (features are
deterministic expressions of the text, so equality is exact), which
implies the refit weights agree with the batch q321 fit to float
noise; ``fit`` parity with batch q321 is additionally pinned at the
4-dp reporting precision by tests.

Reference parity: the reference (Airflow orchestration) has no model
layer; this extends the SURVEY §2.11 training-data mandate — a
production curation stack retrains its distilled quality model as the
corpus churns, and the audit trail (coefficient drift per tick) is the
retrain/rollback trigger, the q306-for-models.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_dags_spark.checkpoint import local_checkpoint
from datapipeline_dags_spark.plans.llm_ops import (
    IRLS_STEPS,
    _irls_featurize,
    _irls_fit,
)
from datapipeline_dags_spark.streaming.index_maintenance import (
    TOMBSTONES_SCHEMA,
    _live_delta,
    _normalize_deletes,
    _tomb_delta,
    _write_compaction,
    _write_delta,
)


class GlmMaintainer:
    """The q321 logistic trainer served from maintained feature state.

    Per tick: featurize the arriving documents ONCE (the registered
    ``_irls_featurize`` — one definition shared with the batch
    trainer), append as a delta, stamp tombstones for deletes.
    ``fit(batch_id)`` refits over the live state ({IRLS_STEPS} Newton
    steps, the shared solve).  The delta/tombstone/compaction
    lifecycle is the index maintainers' (version-scoped delete →
    re-insert works; compaction folds strictly before the tick so the
    replayable batch survives a crash)."""

    FEATS_SCHEMA = (
        "doc_id bigint, source string, y int, x1 double, x2 double, v bigint"
    )

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir

    def process_batch(
        self, batch: DataFrame, batch_id: int, deletes: DataFrame | None = None
    ) -> None:
        vlit = F.lit(batch_id).cast("bigint")
        feats = _irls_featurize(batch, keep=("doc_id", "source"))
        _write_delta(
            feats.withColumn("v", vlit), self.state_dir, "feats", batch_id
        )
        _write_delta(
            _tomb_delta(self.spark, _normalize_deletes(deletes), batch_id),
            self.state_dir,
            "tombstones",
            batch_id,
        )

    def feats(self, batch_id: int, keep_v: bool = False) -> DataFrame:
        """Live feature rows as of ``batch_id`` (deltas minus
        version-scoped tombstones)."""
        return _live_delta(
            self.spark,
            self.state_dir,
            "feats",
            batch_id,
            self.FEATS_SCHEMA,
            "doc_id",
            keep_v=keep_v,
        )

    def fit(self, batch_id: int) -> list[float]:
        """Refit the GLM over the live state — {IRLS_STEPS} constant
        map-side passes over O(live corpus) compact feature rows; the
        model state in flight is 3 doubles.  The live-delta frame is
        checkpointed ONCE so the delta-union + tombstone anti-join is
        not re-executed per IRLS pass (the batch path's _irls_feats
        contract)."""
        return _irls_fit(
            local_checkpoint(self.feats(batch_id), "glm live feats")
        )

    def compact(self, batch_id: int) -> None:
        """Fold deltas strictly before ``batch_id`` (the index
        maintainers' crash-replay-preserving compaction)."""
        k = batch_id - 1
        if k < 0:
            return
        _write_compaction(
            self.feats(k, keep_v=True), self.state_dir, "feats", k
        )
        _write_compaction(
            self.spark.createDataFrame([], TOMBSTONES_SCHEMA),
            self.state_dir,
            "tombstones",
            k,
        )

    @staticmethod
    def drift_u(w_old: list[float], w_new: list[float]) -> int:
        """Coefficient drift between two fits in integer micro-units
        (max absolute per-coefficient delta x 1e6, rounded) — the
        q306-for-models: a tick whose refit moves any coefficient past
        the caller's threshold is the retrain/rollback alarm (benign
        churn moves coefficients marginally; a poisoned or
        regime-shifted batch moves them by orders of magnitude —
        pinned by the drive test)."""
        return max(
            int(round(abs(a - b) * 1_000_000)) for a, b in zip(w_old, w_new)
        )

    def matches_full(self, batch_id: int, all_docs: DataFrame) -> bool:
        """The IVM audit: maintained live feature rows must equal a
        from-scratch featurization of every LIVE document, row for row
        over every feature column — features are deterministic
        expressions of the text, so ANY mismatch means the maintenance
        plumbing lost, duplicated, or failed to retract a document
        (and equal state makes the refit agree with batch q321 by
        construction)."""
        full = _irls_featurize(all_docs, keep=("doc_id", "source"))
        cols = [c for c in full.columns if c != "doc_id"]
        fullr = full.select(
            "doc_id", *[F.col(c).alias(f"{c}_f") for c in cols]
        )
        st = self.feats(batch_id)
        ok = None
        for c in cols:
            e = F.col(c).eqNullSafe(F.col(f"{c}_f"))
            ok = e if ok is None else (ok & e)
        bad = st.join(fullr, "doc_id", "full_outer").where(~ok).count()
        return bad == 0
