"""applyInPandasWithState: per-key state persists across availableNow
drains through the checkpoint (ST4's state contract, Spark-native)."""

from __future__ import annotations

import json
import os

from datapipeline_dags_spark.streaming.stateful import running_user_totals

SCHEMA = "user string, v double"


def drop(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    os.rename(tmp, os.path.join(dirpath, name))


def test_state_accumulates_across_drains(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    emitted: list[tuple] = []

    def run_tick():
        stream = spark.readStream.schema(SCHEMA).json(src)
        q = (
            running_user_totals(stream)
            .writeStream.foreachBatch(
                lambda b, _id: emitted.extend((r.user, r.n, r.total) for r in b.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drop(src, "b1.json", [{"user": "u1", "v": 1.0}, {"user": "u1", "v": 2.0},
                          {"user": "u2", "v": 10.0}])
    run_tick()
    assert dict((u, (n, t)) for u, n, t in emitted) == {"u1": (2, 3.0), "u2": (1, 10.0)}

    # second drain: state from drain 1 must still be there
    emitted.clear()
    drop(src, "b2.json", [{"user": "u1", "v": 4.0}])
    run_tick()
    assert emitted == [("u1", 3, 7.0)]  # 2+1 events, 3.0+4.0 — not reset


DOC_SCHEMA = "doc_id long, fp string"


def test_streaming_dedup_admits_first_seen_only(spark, tmp_path):
    from datapipeline_dags_spark.streaming.stateful import streaming_dedup_first_seen

    src = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt2")
    admitted: list[tuple] = []

    def run_tick():
        stream = spark.readStream.schema(DOC_SCHEMA).json(src)
        q = (
            streaming_dedup_first_seen(stream)
            .writeStream.foreachBatch(
                lambda b, _id: admitted.extend((r.fp, r.keep_doc_id) for r in b.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: fpA twice (in-batch dup -> min doc_id), fpB once
    drop(src, "d1.json", [{"doc_id": 7, "fp": "A"}, {"doc_id": 3, "fp": "A"},
                          {"doc_id": 9, "fp": "B"}])
    run_tick()
    assert sorted(admitted) == [("A", 3), ("B", 9)]

    # batch 2: fpA again (historical dup -> dropped), fpC new -> admitted
    admitted.clear()
    drop(src, "d2.json", [{"doc_id": 11, "fp": "A"}, {"doc_id": 12, "fp": "C"}])
    run_tick()
    assert admitted == [("C", 12)]
