"""Streaming mergeable quantile sketch — q154's histogram in keyed state.

q154 computes percentiles from a fixed-width histogram and argues the
sketch is MERGEABLE (bin counts add).  This operator is that argument
made executable: per key group, the state is the 256-bin count vector
over FIXED, caller-supplied bounds; every micro-batch folds its rows in
by pure addition, and the group emits its current interpolated
percentile estimates each batch.  Because merge is addition, the final
estimate after any sequence of micro-batches equals the batch estimate
over the union of the data — asserted against the q154-style batch
computation in tests/test_quantile_stream.py.

Bounds must be fixed up front (the price of mergeability — a growing
[lo, hi] would re-bin history); production picks them from a prior
profile (q114) or domain knowledge, exactly as production HLL picks its
register count.  Error stays <= one bin width of (hi-lo)/256 for any
in-range data; out-of-range values clamp to the edge bins and are
counted in the emitted ``n_clamped`` so saturation is observable, not
silent (the BUCKET_OBSERVATIONS discipline).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

QSK_STREAM_BINS = 256

OUTPUT_SCHEMA = (
    "bucket string, n bigint, n_clamped bigint, "
    "p50 double, p90 double, p99 double"
)
STATE_SCHEMA = "counts array<long>, n_clamped long"


def _estimate(counts: list[int], lo: float, hi: float, p: float) -> float:
    n = sum(counts)
    if n == 0:
        return float("nan")
    if hi == lo:
        return lo
    w = (hi - lo) / QSK_STREAM_BINS
    target = p * n
    cum = 0
    for b, c in enumerate(counts):
        if cum + c >= target and c > 0:
            return lo + w * (b + (target - cum) / c)
        cum += c
    return hi


def _make_update(lo: float, hi: float):
    w = (hi - lo) / QSK_STREAM_BINS if hi > lo else 1.0

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        counts, clamped = (
            (list(state.get[0]), state.get[1]) if state.exists else ([0] * QSK_STREAM_BINS, 0)
        )
        for pdf in pdfs:
            for v in pdf["value"]:
                fv = float(v)
                b = int(math.floor((fv - lo) / w))
                if b < 0:
                    b, clamped = 0, clamped + 1
                elif b >= QSK_STREAM_BINS:
                    # v == hi is in-range boundary data (closed upper
                    # bound): last bin, NOT a saturation event; only
                    # v > hi counts as clamped.
                    b = QSK_STREAM_BINS - 1
                    if fv > hi:
                        clamped += 1
                counts[b] += 1
        state.update((counts, clamped))
        yield pd.DataFrame(
            {
                "bucket": [key[0]],
                "n": [sum(counts)],
                "n_clamped": [clamped],
                "p50": [_estimate(counts, lo, hi, 0.5)],
                "p90": [_estimate(counts, lo, hi, 0.9)],
                "p99": [_estimate(counts, lo, hi, 0.99)],
            }
        )

    return update


def streaming_quantile_sketch(
    values: DataFrame, lo: float, hi: float, bucket_col: str = "bucket"
) -> DataFrame:
    """Maintain per-group fixed-bound histogram quantile sketches over a
    stream of (bucket, value) rows; emits current p50/p90/p99 estimates
    every micro-batch.  Merge across batches is bin-count addition, so
    the running estimate always equals the batch estimate over all data
    seen — the mergeability q154 claims, executed."""
    from datapipeline_dags_spark.shipping import ensure_package_shipped

    ensure_package_shipped(values.sparkSession)
    return values.groupBy(bucket_col).applyInPandasWithState(
        _make_update(lo, hi),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
