"""Streaming Space-Saving heavy hitters: the ICDT'05 guarantees hold
across micro-batches, state stays capacity-bounded, and counts survive
a checkpointed second batch."""

from __future__ import annotations

import json
import os
from collections import Counter

from pyspark.sql.types import StringType, StructField, StructType

from datapipeline_dags_spark.streaming.heavy_hitters import (
    streaming_heavy_hitters,
)

SCHEMA = StructType(
    [StructField("bucket", StringType()), StructField("token", StringType())]
)

CAPACITY = 4

# skewed stream: 'a' and 'b' dominate, long tail of singletons
BATCH1 = ["a"] * 30 + ["b"] * 20 + ["c"] * 3 + ["d", "e", "f", "g"]
BATCH2 = ["a"] * 10 + ["b"] * 15 + ["h", "i", "c", "c"]


def _drop(dirpath, name, toks):
    os.makedirs(dirpath, exist_ok=True)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as fh:
        for t in toks:
            fh.write(json.dumps({"bucket": "b0", "token": t}) + "\n")
    os.rename(tmp, os.path.join(dirpath, name))


def _run(spark, src_dir, ckpt, out_dir):
    stream = spark.readStream.schema(SCHEMA).json(src_dir)
    out = streaming_heavy_hitters(stream, capacity=CAPACITY)
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out_dir).collect()


def test_space_saving_guarantees_across_batches(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    _drop(src, "b1.json", BATCH1)
    _run(spark, src, ckpt, out_dir)
    _drop(src, "b2.json", BATCH2)
    rows = _run(spark, src, ckpt, out_dir)

    truth = Counter(BATCH1) + Counter(BATCH2)
    total = sum(truth.values())
    # take the FINAL state: for each token the last emission's values;
    # memory sink accumulates batches, so keep max-est per token (counts
    # are monotone for a token while tracked)
    final: dict[str, tuple[int, int]] = {}
    for r in rows:
        cur = final.get(r["token"])
        if cur is None or r["est"] >= cur[0]:
            final[r["token"]] = (r["est"], r["err"])

    # the sink accumulates one emission per batch; the per-emission
    # state bound is CAPACITY, checked in the single-batch test below

    # no false negatives above N/capacity
    threshold = total / CAPACITY
    tracked = set(final)
    for tok, true in truth.items():
        if true > threshold:
            assert tok in tracked, f"{tok} (true {true}) missing above threshold"

    # per-token error bound: est - err <= true <= est for the heavy ones
    for tok in ("a", "b"):
        est, err = final[tok]
        assert est - err <= truth[tok] <= est, (tok, est, err, truth[tok])


def test_capacity_bound_single_emission(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _drop(src, "b1.json", BATCH1 + BATCH2)
    rows = _run(spark, src, ckpt, str(tmp_path / "out"))
    assert 0 < len(rows) <= CAPACITY
