"""Streaming tests (SURVEY §5.5): file-drop ingest with per-file
fan-out and exactly-once across ticks; event-time windowed aggregation
with watermark late-data discard across availableNow runs."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from datapipeline_dags_spark.streaming.ingest import (
    per_file_fanout,
    run_available_now,
    watch_json_directory,
)

SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("user", StringType()),
        StructField("v", DoubleType()),
    ]
)


def drop_file(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    os.rename(tmp, os.path.join(dirpath, name))  # atomic drop


def test_file_fanout_exactly_once_across_ticks(spark, tmp_path):
    drop = str(tmp_path / "drop")
    ckpt = str(tmp_path / "ckpt")
    seen: list[tuple[str, int]] = []

    def on_file(path: str, df) -> None:
        seen.append((os.path.basename(path), df.count()))

    drop_file(drop, "a.json", [{"ts": "2024-01-01T10:00:00Z", "user": "u1", "v": 1.0}])
    drop_file(drop, "b.json", [{"ts": "2024-01-01T10:01:00Z", "user": "u2", "v": 2.0},
                               {"ts": "2024-01-01T10:02:00Z", "user": "u2", "v": 3.0}])
    stream = watch_json_directory(spark, drop, SCHEMA)
    run_available_now(stream, ckpt, per_file_fanout(on_file))
    assert sorted(seen) == [("a.json", 1), ("b.json", 2)]

    # second tick: only the NEW file fans out (checkpoint = processed set)
    seen.clear()
    drop_file(drop, "c.json", [{"ts": "2024-01-01T10:05:00Z", "user": "u3", "v": 4.0}])
    stream = watch_json_directory(spark, drop, SCHEMA)
    run_available_now(stream, ckpt, per_file_fanout(on_file))
    assert seen == [("c.json", 1)]

    # idle tick: nothing re-processed
    seen.clear()
    stream = watch_json_directory(spark, drop, SCHEMA)
    run_available_now(stream, ckpt, per_file_fanout(on_file))
    assert seen == []


def test_event_time_window_with_watermark_discards_late_data(spark, tmp_path):
    drop = str(tmp_path / "drop")
    ckpt = str(tmp_path / "ckpt")
    emitted: list[tuple] = []

    def collect_batch(batch, batch_id):
        for r in batch.collect():
            emitted.append((r.w_start.isoformat(), r.n, r.sum_v))

    def run_tick():
        stream = watch_json_directory(spark, drop, SCHEMA)
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes").alias("w"))
            .agg(F.count("*").alias("n"), F.sum("v").alias("sum_v"))
            .select(F.col("w.start").alias("w_start"), "n", "sum_v")
        )
        q = (
            agg.writeStream.foreachBatch(collect_batch)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # tick 1: events 10:00-10:04 → watermark trails; window still open
    drop_file(drop, "t1.json", [
        {"ts": "2024-01-01T10:00:30Z", "user": "u1", "v": 1.0},
        {"ts": "2024-01-01T10:03:00Z", "user": "u1", "v": 2.0},
    ])
    run_tick()
    assert emitted == []  # append mode holds results until watermark passes

    # tick 2: an event at 10:40 pushes the watermark to 10:30, closing the
    # 10:00 window; a VERY late row (09:00) arrives in the same file and
    # must be dropped (watermark already beyond its window + allowed lag)
    drop_file(drop, "t2.json", [
        {"ts": "2024-01-01T10:40:00Z", "user": "u2", "v": 10.0},
        {"ts": "2024-01-01T09:00:00Z", "user": "u9", "v": 99.0},
    ])
    run_tick()
    # run a third idle-ish tick to flush anything pending
    drop_file(drop, "t3.json", [{"ts": "2024-01-01T11:00:00Z", "user": "u3", "v": 5.0}])
    run_tick()

    closed = dict((w, (n, s)) for w, n, s in emitted)
    assert closed.get("2024-01-01T10:00:00") == (2, 3.0)  # on-time rows only
    # the 09:00 late row never materializes in any emitted window
    assert "2024-01-01T09:00:00" not in closed
