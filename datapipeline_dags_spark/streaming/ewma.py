"""Streaming EWMA anomaly detector — exponentially weighted mean and
variance in keyed state (ST11).

The batch surface has pointwise rolling z-scores (q108) and the CUSUM
level-shift statistic (q176); both need ordered history.  On an
unbounded stream the classic constant-state answer is the EWMA control
chart (Roberts 1959): per key keep (mean, var, n) and fold each
observation in event order —

    delta = x - mean
    mean += alpha * delta
    var   = (1 - alpha) * (var + alpha * delta^2)

flagging x when |x - mean_before| > k * sqrt(var_before) once warmed
up.  State is THREE numbers per key regardless of stream length (the
bounded-state discipline of streaming_dedup_with_ttl /
heavy_hitters), checkpointed via ``applyInPandasWithState``.

Determinism contract: rows are folded in (seq) order inside each
micro-batch, so after ANY partitioning of the stream into batches the
final state equals the single-pass fold over the whole ordered stream
— the same merge-equals-batch property the quantile sketch proves by
addition, proven here by order-preserving recurrence
(tests/test_ewma_stream.py)."""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_OUTPUT_SCHEMA = (
    "bucket string, n bigint, ewma double, ewvar double, n_anomalies bigint"
)
EWMA_STATE_SCHEMA = "mean double, var double, n long, n_anom long"


def _make_update(alpha: float, k: float, warmup: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        mean, var, n, n_anom = (
            state.get if state.exists else (0.0, 0.0, 0, 0)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("seq", kind="mergesort")
        for x in rows["value"].astype(float):
            if n >= warmup and abs(x - mean) > k * math.sqrt(var):
                n_anom += 1
            delta = x - mean
            mean = mean + alpha * delta
            var = (1.0 - alpha) * (var + alpha * delta * delta)
            n += 1
        state.update((mean, var, n, n_anom))
        yield pd.DataFrame(
            {
                "bucket": [key[0]],
                "n": [n],
                "ewma": [mean],
                "ewvar": [var],
                "n_anomalies": [n_anom],
            }
        )

    return update


def streaming_ewma_anomalies(
    values: DataFrame,
    alpha: float = 0.1,
    k: float = 3.0,
    warmup: int = 30,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Maintain per-group EWMA mean/variance over a stream of
    (bucket, seq, value) rows, emitting the running estimates and the
    cumulative anomaly count each micro-batch.  ``seq`` is the
    event-order key (an offset, an event id, an epoch) — folding in seq
    order is what makes the result independent of micro-batch
    boundaries."""
    from datapipeline_dags_spark.shipping import ensure_package_shipped

    ensure_package_shipped(values.sparkSession)
    return values.groupBy(bucket_col).applyInPandasWithState(
        _make_update(alpha, k, warmup),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
