"""Streaming HLL distinct sketch (ST13): cross-batch register folds
equal the single-pass fold bit-for-bit (max is commutative +
idempotent), the estimate tracks the exact distinct count within the
HLL error regime, duplicate redelivery changes nothing, and state
survives a checkpoint restart."""

from __future__ import annotations

import json
import os

from pyspark.sql.types import StringType, StructField, StructType

from datapipeline_dags_spark.streaming.distinct_sketch import (
    HLL_M,
    _estimate,
    _fold,
    streaming_distinct_sketch,
)

SCHEMA = StructType(
    [
        StructField("bucket", StringType()),
        StructField("value", StringType()),
    ]
)

VALUES = [f"user-{i}" for i in range(3000)]
BATCH1 = VALUES[:1800]
# overlap 300 re-delivered values: at-least-once convergence
BATCH2 = VALUES[1500:]


def _drop(dirpath, name, vals):
    os.makedirs(dirpath, exist_ok=True)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as fh:
        for v in vals:
            fh.write(json.dumps({"bucket": "b0", "value": v}) + "\n")
    os.rename(tmp, os.path.join(dirpath, name))


def _run(spark, src, ckpt, out_dir):
    stream = spark.readStream.schema(SCHEMA).json(src)
    out = streaming_distinct_sketch(stream)
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
    return max(rows, key=lambda r: r["n_rows"])


def test_cross_batch_equals_single_pass_and_survives_restart(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    _drop(src, "b1.json", BATCH1)
    _run(spark, src, ckpt, out_dir)
    # second run restarts from the checkpoint (memory sink can't; the
    # parquet sink + read-back pattern from test_ewma_stream)
    _drop(src, "b2.json", BATCH2)
    final = _run(spark, src, ckpt, out_dir)

    import pandas as pd

    ref = _estimate(_fold([0] * HLL_M, pd.Series(VALUES)))
    assert final["n_rows"] == len(BATCH1) + len(BATCH2)
    # register max-folds: batch split + 300 duplicate redeliveries
    # land on the identical registers => identical estimate
    assert final["estimate"] == ref
    # HLL(P=12) is ~1.6% sigma; allow 5 sigma
    assert abs(final["estimate"] - 3000) / 3000 < 0.08


def test_fold_is_idempotent_and_commutative():
    import pandas as pd

    a = _fold([0] * HLL_M, pd.Series(VALUES[:500]))
    twice = _fold(list(a), pd.Series(VALUES[:500]))
    assert twice == a
    rev = _fold([0] * HLL_M, pd.Series(VALUES[:500][::-1]))
    assert rev == a


def test_estimate_exactness_small_range():
    """Linear counting regime: tiny cardinalities estimate within a
    fraction of a count."""
    import pandas as pd

    regs = _fold([0] * HLL_M, pd.Series([f"x{i}" for i in range(10)]))
    assert round(_estimate(regs)) == 10
