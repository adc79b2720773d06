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
