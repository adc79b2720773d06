"""Streaming quantile sketch: cross-batch merge equals single-pass
batch estimate (the mergeability contract), error bounded by one bin
width, clamping observable."""

from __future__ import annotations

import json
import math
import os

import numpy as np
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from datapipeline_dags_spark.streaming.quantile_sketch import (
    QSK_STREAM_BINS,
    _estimate,
    streaming_quantile_sketch,
)

SCHEMA = StructType(
    [StructField("bucket", StringType()), StructField("value", DoubleType())]
)

LO, HI = 0.0, 100.0

rng = np.random.RandomState(7)
BATCH1 = list(rng.uniform(5, 95, 400))
# two out-of-range + the closed upper bound (in-range, must NOT clamp)
BATCH2 = list(rng.uniform(20, 80, 300)) + [-3.0, 104.0, HI]


def _drop(dirpath, name, vals):
    os.makedirs(dirpath, exist_ok=True)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as fh:
        for v in vals:
            fh.write(json.dumps({"bucket": "b0", "value": v}) + "\n")
    os.rename(tmp, os.path.join(dirpath, name))


def _run(spark, src, ckpt, out_dir):
    stream = spark.readStream.schema(SCHEMA).json(src)
    out = streaming_quantile_sketch(stream, LO, HI)
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out_dir).collect()
    # the emission with the largest n is the latest state snapshot
    return max(rows, key=lambda r: r["n"])


def _batch_reference(vals, p):
    counts = [0] * QSK_STREAM_BINS
    clamped = 0
    w = (HI - LO) / QSK_STREAM_BINS
    for v in vals:
        b = int(math.floor((v - LO) / w))
        if b < 0:
            b, clamped = 0, clamped + 1
        elif b >= QSK_STREAM_BINS:
            b = QSK_STREAM_BINS - 1
            if v > HI:
                clamped += 1
        counts[b] += 1
    return _estimate(counts, LO, HI, p), clamped


def test_cross_batch_merge_equals_batch_estimate(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    _drop(src, "b1.json", BATCH1)
    _run(spark, src, ckpt, out_dir)
    _drop(src, "b2.json", BATCH2)
    final = _run(spark, src, ckpt, out_dir)

    allv = BATCH1 + BATCH2
    assert final["n"] == len(allv)
    # exactly -3.0 and 104.0 clamp; v == HI is boundary data, not clamped
    assert final["n_clamped"] == 2
    bin_w = (HI - LO) / QSK_STREAM_BINS
    for p, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        ref, _ = _batch_reference(allv, p)
        # merge exactness: streaming result == single-pass histogram
        assert final[col] == ref
        # sketch accuracy: within one bin width of the true percentile
        true = float(np.quantile([v for v in allv if LO <= v <= HI], p))
        assert abs(final[col] - true) <= bin_w * 1.5
