"""Custom stateful streaming operator — applyInPandasWithState.

The reference keeps application-level state (the sync watermark) in a
DB table between 5-minute runs (SURVEY ST4).  For arbitrary per-key
streaming state the Spark-native tool is ``applyInPandasWithState``:
state lives in the checkpointed state store (RocksDB-backed on a
cluster), survives restarts, and the update function sees each key's
micro-batch rows as Arrow-batched pandas frames.

``running_user_totals`` is the canonical example: per-user lifetime
event count/sum maintained across micro-batches — the streaming twin
of the batch sessionization/aggregation surface (q24, q54-q56).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user string, n bigint, total double"
STATE_SCHEMA = "n bigint, total double"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["v"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user": [key[0]], "n": [n], "total": [total]})


def running_user_totals(events: DataFrame, user_col: str = "user") -> DataFrame:
    """Lifetime per-user totals over a stream: emits one updated row per
    user per micro-batch; state persists in the checkpoint."""
    from datapipeline_dags_spark.shipping import ensure_package_shipped

    ensure_package_shipped(events.sparkSession)
    return events.groupBy(user_col).applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DEDUP_OUTPUT_SCHEMA = "fp string, keep_doc_id bigint"
DEDUP_STATE_SCHEMA = "keep_doc_id bigint"


def _keep_first(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        # fingerprint already admitted in an earlier micro-batch — every
        # arrival is a duplicate; drain and emit nothing.
        for _ in pdfs:
            pass
        return
    best = None
    for pdf in pdfs:
        m = int(pdf["doc_id"].min())
        best = m if best is None else min(best, m)
    state.update((best,))
    yield pd.DataFrame({"fp": [key[0]], "keep_doc_id": [best]})


def streaming_dedup_first_seen(docs: DataFrame, fp_col: str = "fp") -> DataFrame:
    """Incremental corpus dedup: admit a document only the FIRST time its
    fingerprint (q53's bottom-k sketch, or sha2 for exact dedup) is seen
    across the whole stream history — the streaming twin of q40.

    State is one row-id per distinct fingerprint in the checkpointed
    state store (RocksDB on a cluster): the historical corpus never
    rescans, and a restart resumes from the checkpoint with no
    re-admission.  In-batch duplicates collapse to the min doc_id before
    touching state.  At 100 TB the state is #distinct-fingerprints ×
    ~40 bytes, hash-partitioned across executors by the groupBy key.
    """
    from datapipeline_dags_spark.shipping import ensure_package_shipped

    ensure_package_shipped(docs.sparkSession)
    return docs.groupBy(fp_col).applyInPandasWithState(
        _keep_first,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DECAY_OUTPUT_SCHEMA = "user_id bigint, last_us bigint, score double"
DECAY_STATE_SCHEMA = "last_us bigint, score double"


def _make_decay_update(tau_us: float, weights: dict[str, float]):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math

        last_us, score = state.get if state.exists else (None, 0.0)
        for pdf in pdfs:
            pdf = pdf.sort_values("ev_us")
            for ev_us, etype in zip(pdf["ev_us"], pdf["event_type"]):
                ev_us = int(ev_us)
                if last_us is not None:
                    score *= math.exp(-(ev_us - last_us) / tau_us)
                score += weights.get(etype, 0.0)
                last_us = ev_us
        state.update((last_us, score))
        yield pd.DataFrame(
            {"user_id": [key[0]], "last_us": [last_us], "score": [score]}
        )

    return update


def streaming_decayed_engagement(
    events: DataFrame, tau_us: float, weights: dict[str, float]
) -> DataFrame:
    """Exponentially time-decayed per-user engagement over a stream —
    the streaming twin of the batch q100 (plans/event_time.py): on each
    arrival the accumulated score decays by exp(-dt/tau) and the
    event's weight folds in, so state is TWO numbers per user
    ((last_us, score) in the checkpointed store) yet the emitted score
    equals the full sum over history w_i * exp(-(t_last - t_i)/tau) —
    verified against an eager recomputation in
    tests/test_stateful_streaming.py.

    Expects ``ev_us`` (event-time microseconds), ``event_type`` and the
    grouping column ``user_id``; within-batch rows fold in event-time
    order (micro-batches are assumed event-time-ordered across batches
    — the ingest contract; a production variant buffers a watermark's
    worth of late rows in state before folding).
    """
    from datapipeline_dags_spark.shipping import ensure_package_shipped

    ensure_package_shipped(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        _make_decay_update(tau_us, weights),
        outputStructType=DECAY_OUTPUT_SCHEMA,
        stateStructType=DECAY_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# TTL'd streaming dedup — bounded state for unbounded streams
# ---------------------------------------------------------------------------

TTL_DEDUP_OUTPUT_SCHEMA = "fp string, keep_doc_id bigint"

#: keep_doc_id + the admit DEADLINE (processing-time ms).  The deadline
#: lets the duplicate branch re-register the REMAINING duration — the
#: GroupState contract says the timeout must be set on every invocation
#: that keeps state, and relying on Spark retaining an old timer when
#: nothing is written is implementation-specific behavior.
TTL_DEDUP_STATE_SCHEMA = "keep_doc_id bigint, deadline_ms bigint"


def streaming_dedup_with_ttl(
    docs: DataFrame, ttl_ms: int = 24 * 3600 * 1000
) -> DataFrame:
    """First-seen dedup over an UNBOUNDED stream with a TTL on the
    per-fingerprint state — the scale-correct variant of
    ``streaming_dedup_first_seen``: NoTimeout state grows with the
    number of distinct fingerprints ever seen, while a processing-time
    timeout bounds the state store to the dedup horizon the pipeline
    actually promises (e.g. "no re-crawl admitted within 24 h").  When
    a fingerprint's state times out it is evicted, and a later
    re-arrival is admitted as new.

    State: TWO bigints per live fingerprint (kept doc + admit
    deadline), RocksDB-backed and checkpoint-restored on a cluster.
    The deadline lets every invocation re-register the remaining
    timeout, per the documented set-each-call GroupState contract,
    while preserving the first-admit horizon.  Built on
    ``applyInPandasWithState`` + ``ProcessingTimeTimeout``; Spark 4's
    ``transformWithStateInPandas`` (ValueState with ttlDurationMs) is
    the successor API with identical semantics — its state-server
    protocol needs google.protobuf, absent in this sandbox, so the
    portable API is used here.

    Timeout semantics (Spark contract): a key that receives data in a
    batch does NOT fire its timeout that batch; expiry is observed on
    the first subsequent batch where the key is silent.  Run this
    operator with a PACED or continuous trigger — pending
    processing-time timers never let a ``Trigger.AvailableNow`` run
    terminate (observed on Spark 4.1: the engine keeps scheduling
    batches while any timer is registered), so bounded catch-up ticks
    must use the plain ``streaming_dedup_first_seen``.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # horizon lapsed: forget the fingerprint
            return
        if state.exists:
            for _ in pdfs:  # duplicate inside the horizon -> drop
                pass
            # Honor the set-the-timeout-every-call contract WITHOUT
            # extending the horizon: re-arm with the remaining duration
            # to the first-admit deadline stored in state.  (Spark 4.1
            # happens to retain the old timer when nothing is written,
            # but that behavior is undocumented — a version honoring
            # the documented contract would otherwise leave duplicated
            # fingerprints timer-less: unbounded state.)
            keep, deadline = state.get
            remaining = max(1, int(deadline) - state.getCurrentProcessingTimeMs())
            state.update((keep, deadline))
            state.setTimeoutDuration(remaining)
            return
        best = None
        for pdf in pdfs:
            m = int(pdf["doc_id"].min())
            best = m if best is None else min(best, m)
        if best is None:
            return
        deadline = state.getCurrentProcessingTimeMs() + ttl_ms
        state.update((best, deadline))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"fp": [key[0]], "keep_doc_id": [best]})

    from datapipeline_dags_spark.shipping import ensure_package_shipped

    ensure_package_shipped(docs.sparkSession)
    return docs.groupBy("fp").applyInPandasWithState(
        update,
        outputStructType=TTL_DEDUP_OUTPUT_SCHEMA,
        stateStructType=TTL_DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
