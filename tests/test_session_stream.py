"""Streaming sessionization (ST12): sessions merge across micro-batch
boundaries, the watermark finalizes them (append emits a session only
once it can no longer grow) and drops late events, and a finalized
streaming session equals the batch session_window aggregate over the
same on-time events."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType, TimestampType

from datapipeline_dags_spark.streaming.sessions import streaming_sessions

SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("ts", TimestampType()),
    ]
)

GAP, WM = "30 minutes", "2 hours"

BATCH1 = [("A", "2024-01-01 10:00:00"), ("A", "2024-01-01 10:10:00"),
          ("B", "2024-01-01 10:05:00")]
# A@10:25 lands inside the gap of batch1's open session -> MERGES;
# B@05:00 is behind the watermark (10:10 - 2h = 08:10) -> DROPPED
BATCH2 = [("A", "2024-01-01 10:25:00"), ("B", "2024-01-01 05:00:00")]
# far-future event advances the watermark past A/B session ends ->
# those sessions finalize; C's own session stays open (not emitted)
BATCH3 = [("C", "2024-01-01 20:00:00")]


def _drop(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as fh:
        for u, ts in rows:
            fh.write(json.dumps({"user_id": u, "ts": ts}) + "\n")
    os.rename(tmp, os.path.join(dirpath, name))


def _run(spark, src, ckpt, out_dir):
    stream = spark.readStream.schema(SCHEMA).json(src)
    out = streaming_sessions(stream, gap=GAP, watermark=WM)
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        (r["user_id"], str(r["session_start"])): r
        for r in spark.read.parquet(out_dir).collect()
    }


def test_sessions_merge_finalize_and_drop_late(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    _drop(src, "b1.json", BATCH1)
    _run(spark, src, ckpt, out_dir)
    _drop(src, "b2.json", BATCH2)
    _run(spark, src, ckpt, out_dir)
    _drop(src, "b3.json", BATCH3)
    got = _run(spark, src, ckpt, out_dir)

    # A's three events (split across two micro-batches) are ONE merged
    # session: [10:00, last event 10:25 + 30m gap)
    a = got[("A", "2024-01-01 10:00:00")]
    assert a["n_events"] == 3
    assert str(a["session_end"]) == "2024-01-01 10:55:00"
    assert a["duration_s"] == 55 * 60
    # B's late 05:00 event was dropped: one single-event session
    b = got[("B", "2024-01-01 10:05:00")]
    assert b["n_events"] == 1
    assert str(b["session_end"]) == "2024-01-01 10:35:00"
    assert ("B", "2024-01-01 05:00:00") not in got
    # C's session cannot be finalized yet (nothing advanced the
    # watermark past its end) — append mode must NOT have emitted it
    assert all(k[0] != "C" for k in got)

    # batch parity: the finalized sessions equal the batch
    # session_window aggregate over the same on-time events
    on_time = BATCH1 + [BATCH2[0]]
    batch = (
        spark.createDataFrame(on_time, "user_id string, ts string")
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .groupBy("user_id", F.session_window("ts", GAP).alias("w"))
        .agg(F.count("*").alias("n_events"))
    )
    expect = {
        (r["user_id"], str(r["w"]["start"])): (
            str(r["w"]["end"]),
            r["n_events"],
        )
        for r in batch.collect()
    }
    assert {
        k: (str(v["session_end"]), v["n_events"]) for k, v in got.items()
    } == expect
