"""Stream-stream interval join — watermarked two-sided state.

The reference's streaming surface is one-directional (queue -> rows ->
MERGE; `sqs_sensor_dag.py:127-140`); correlating TWO live streams is
the classic gap a Spark engine fills natively: ad impressions joined to
the clicks that landed within an attribution horizon, orders joined to
their shipment confirmations, sensor readings joined to alerts.

Spark's model (Structured Streaming stream-stream join):

- BOTH sides are watermarked, so the state store can evict rows whose
  match window has provably closed — state is bounded by
  ``rate x (horizon + watermark delay)``, not by stream length.
- The join condition carries an explicit event-time range
  (``right_ts`` in ``[left_ts, left_ts + horizon]``); Spark derives the
  state-cleanup predicate from exactly this range, which is why the
  helper REQUIRES it rather than accepting an arbitrary theta join.
- ``how="leftOuter"`` additionally emits unmatched left rows (null
  right columns) once the watermark passes their horizon — i.e. the
  "impression that never converted" record, impossible to emit from an
  unwatermarked join because you could never prove the negative.

Batch twin: the same join condition on static frames (q48's grid-
bucketed range join is the scale-tuned batch variant); parity between
the two is asserted in tests/test_interval_join.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    horizon_seconds: int,
    watermark_delay: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join ``right`` rows onto ``left`` rows with the same ``key``
    whose ``right_ts`` falls in ``[left_ts, left_ts + horizon]``.

    Works identically on static frames (batch twin) and on streaming
    frames, where both sides get ``withWatermark`` so join state is
    evicted once the horizon provably closed.  Column names other than
    ``key`` must be disjoint between the two sides (the time columns
    necessarily are).
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"unsupported join type: {how}")
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    if left.isStreaming or right.isStreaming:
        left = left.withWatermark(left_ts, watermark_delay)
        right = right.withWatermark(right_ts, watermark_delay)
    lk, rk = f"__lk_{key}", f"__rk_{key}"
    lf = left.withColumnRenamed(key, lk)
    rf = right.withColumnRenamed(key, rk)
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col(right_ts) >= F.col(left_ts))
        & (
            F.col(right_ts)
            <= F.col(left_ts) + F.expr(f"INTERVAL {int(horizon_seconds)} SECONDS")
        )
    )
    return (
        lf.join(rf, cond, how)
        .withColumnRenamed(lk, key)
        .drop(rk)
    )
