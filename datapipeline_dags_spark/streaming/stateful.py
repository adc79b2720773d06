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
    return events.groupBy(user_col).applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
