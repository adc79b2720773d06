"""Streaming CEP pattern matcher (ST14): cross-batch fold equals the
single-pass fold, time-budget expiry counts, and checkpoint-restart
recovery — the ewma.py test discipline on the q187 funnel semantics."""

from __future__ import annotations

import json
import os

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from datapipeline_dags_spark.streaming.pattern import streaming_pattern_match

SCHEMA = StructType(
    [
        StructField("user", StringType()),
        StructField("seq", LongType()),
        StructField("ts_us", LongType()),
        StructField("channel", StringType()),
    ]
)

PATTERN = ("view", "click", "purchase")
WITHIN_S = 3600
US = 1_000_000


def _reference(rows):
    stage, start, matches, expired = 0, 0, 0, 0
    for _, ts, ch in sorted(rows):
        if stage > 0 and ts - start > WITHIN_S * US:
            stage, expired = 0, expired + 1
        if ch == PATTERN[stage]:
            if stage == 0:
                start = ts
            stage += 1
            if stage == len(PATTERN):
                matches, stage = matches + 1, 0
    return stage, matches, expired


def _drop(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as fh:
        for seq, ts, ch in rows:
            fh.write(
                json.dumps(
                    {"user": "u1", "seq": seq, "ts_us": ts, "channel": ch}
                )
                + "\n"
            )
    os.rename(tmp, os.path.join(dirpath, name))


def _run(spark, src, ckpt, out_dir):
    stream = spark.readStream.schema(SCHEMA).json(src)
    out = streaming_pattern_match(stream, PATTERN, WITHIN_S)
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
    return max(rows, key=lambda r: r["n_events"])


# one user's stream: two clean matches, one expired attempt, noise
EVENTS = [
    (0, 0 * US, "view"),
    (1, 60 * US, "error"),  # ignored
    (2, 120 * US, "click"),
    (3, 180 * US, "purchase"),  # match 1
    (4, 300 * US, "view"),  # attempt 2 starts
    (5, 400 * US, "click"),
    # purchase arrives past the 3600 s budget -> attempt expires; the
    # late purchase matches nothing (stage resets to 0 first)
    (6, (300 + 4000) * US, "purchase"),
    (7, 5000 * US, "view"),
    (8, 5100 * US, "view"),  # mid-pattern view does NOT restart
    (9, 5200 * US, "click"),
    (10, 5300 * US, "purchase"),  # match 2
]


def test_cross_batch_equals_single_pass(spark, tmp_path):
    ref = _reference(EVENTS)
    # single batch
    src1, out1 = str(tmp_path / "src1"), str(tmp_path / "out1")
    _drop(src1, "a.json", EVENTS)
    one = _run(spark, src1, str(tmp_path / "ck1"), out1)
    # split across two batches mid-attempt
    src2, out2 = str(tmp_path / "src2"), str(tmp_path / "out2")
    _drop(src2, "a.json", EVENTS[:5])
    two_ck = str(tmp_path / "ck2")
    _run(spark, src2, two_ck, out2)
    _drop(src2, "b.json", EVENTS[5:])
    two = _run(spark, src2, two_ck, out2)
    for got in (one, two):
        assert (got["stage"], got["n_matches"], got["n_expired"]) == ref
        assert got["n_events"] == len(EVENTS)
    assert one["n_matches"] == 2 and one["n_expired"] == 1


def test_checkpoint_restart_recovers_state(spark, tmp_path):
    """A fresh query on the same checkpoint continues from persisted
    state instead of recounting."""
    src, ckpt, out = (
        str(tmp_path / "src"),
        str(tmp_path / "ck"),
        str(tmp_path / "out"),
    )
    _drop(src, "a.json", EVENTS[:4])
    first = _run(spark, src, ckpt, out)
    assert first["n_matches"] == 1
    _drop(src, "b.json", EVENTS[4:])
    second = _run(spark, src, ckpt, out)
    assert second["n_matches"] == 2
    assert second["n_expired"] == 1
    assert second["n_events"] == len(EVENTS)
