"""Streaming EWMA anomaly detector: cross-batch fold equals the
single-pass batch fold bit-for-bit (order-preserving recurrence), the
injected spike is flagged, and state survives a checkpoint restart."""

from __future__ import annotations

import json
import math
import os

import numpy as np
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from datapipeline_dags_spark.streaming.ewma import streaming_ewma_anomalies

SCHEMA = StructType(
    [
        StructField("bucket", StringType()),
        StructField("seq", LongType()),
        StructField("value", DoubleType()),
    ]
)

ALPHA, K, WARMUP = 0.1, 3.0, 30

rng = np.random.RandomState(11)
BASE = list(rng.normal(50.0, 2.0, 200))
BASE[150] = 95.0  # the spike the chart must flag
BATCH1 = BASE[:120]
BATCH2 = BASE[120:]


def _reference(vals):
    mean, var, n, n_anom = 0.0, 0.0, 0, 0
    for x in vals:
        if n >= WARMUP and abs(x - mean) > K * math.sqrt(var):
            n_anom += 1
        delta = x - mean
        mean = mean + ALPHA * delta
        var = (1.0 - ALPHA) * (var + ALPHA * delta * delta)
        n += 1
    return mean, var, n, n_anom


def _drop(dirpath, name, vals, seq0):
    os.makedirs(dirpath, exist_ok=True)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as fh:
        for i, v in enumerate(vals):
            fh.write(
                json.dumps({"bucket": "b0", "seq": seq0 + i, "value": v})
                + "\n"
            )
    os.rename(tmp, os.path.join(dirpath, name))


def _run(spark, src, ckpt, out_dir):
    stream = spark.readStream.schema(SCHEMA).json(src)
    out = streaming_ewma_anomalies(stream, ALPHA, K, WARMUP)
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
    return max(rows, key=lambda r: r["n"])


def test_cross_batch_fold_equals_batch_fold(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    _drop(src, "b1.json", BATCH1, 0)
    _run(spark, src, ckpt, out_dir)
    _drop(src, "b2.json", BATCH2, len(BATCH1))
    final = _run(spark, src, ckpt, out_dir)

    mean, var, n, n_anom = _reference(BASE)
    assert final["n"] == n == len(BASE)
    # order-preserving recurrence: bit-equal across the batch split
    assert final["ewma"] == mean
    assert final["ewvar"] == var
    # the spike is flagged (and the chart is not trigger-happy)
    assert final["n_anomalies"] == n_anom
    assert 1 <= n_anom <= 5
