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


EV_SCHEMA = "user_id long, ev_us long, event_type string"


def test_streaming_decay_matches_batch_closed_form(spark, tmp_path):
    """The two-number state fold (decay + add) must equal the full
    closed-form sum w_i * exp(-(t_last - t_i)/tau) over the whole
    history — q100's math, restated at the user's own last event —
    and survive a checkpoint restart between micro-batches."""
    import math

    from datapipeline_dags_spark.streaming.stateful import (
        streaming_decayed_engagement,
    )

    tau = 1_000_000.0  # 1 s e-folding so decay is visible in the fixture
    weights = {"click": 1.0, "purchase": 5.0}
    src = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ckpt")
    final: dict[int, tuple] = {}

    def run_tick():
        stream = spark.readStream.schema(EV_SCHEMA).json(src)
        q = (
            streaming_decayed_engagement(stream, tau, weights)
            .writeStream.foreachBatch(
                lambda b, _id: final.update(
                    {r.user_id: (r.last_us, r.score) for r in b.collect()}
                )
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    batch1 = [
        {"user_id": 1, "ev_us": 0, "event_type": "click"},
        {"user_id": 1, "ev_us": 500_000, "event_type": "purchase"},
        {"user_id": 2, "ev_us": 100_000, "event_type": "click"},
    ]
    batch2 = [
        {"user_id": 1, "ev_us": 2_000_000, "event_type": "click"},
        {"user_id": 2, "ev_us": 3_100_000, "event_type": "purchase"},
    ]
    drop(src, "b1.json", batch1)
    run_tick()
    drop(src, "b2.json", batch2)
    run_tick()  # fresh query object; state must come from the checkpoint

    history: dict[int, list] = {}
    for ev in batch1 + batch2:
        history.setdefault(ev["user_id"], []).append(ev)
    for uid, evs in history.items():
        evs.sort(key=lambda e: e["ev_us"])
        t_last = evs[-1]["ev_us"]
        expect = sum(
            weights[e["event_type"]] * math.exp(-(t_last - e["ev_us"]) / tau)
            for e in evs
        )
        got_last, got_score = final[uid]
        assert got_last == t_last
        assert abs(got_score - expect) < 1e-9, (uid, got_score, expect)


def _poll(predicate, deadline_s=60):
    import time as _t

    end = _t.time() + deadline_s
    while _t.time() < end:
        if predicate():
            return True
        _t.sleep(0.2)
    return False


def test_ttl_dedup_live_query(spark, tmp_path):
    """TTL dedup runs as its natural shape — a continuously-triggered
    query (engine processing-time timers never terminate an
    availableNow trigger, so bounded ticks are not an option): first
    batch admits first-seen per fingerprint; an in-horizon duplicate is
    dropped; after the TTL lapses the engine evicts the key and a
    re-arrival is admitted as NEW."""
    from datapipeline_dags_spark.streaming.stateful import streaming_dedup_with_ttl

    src = str(tmp_path / "docs_ttl")
    ckpt = str(tmp_path / "ckpt_ttl")
    import os

    os.makedirs(src, exist_ok=True)
    admitted: list[tuple] = []
    stream = spark.readStream.schema(DOC_SCHEMA).json(src)
    q = (
        streaming_dedup_with_ttl(stream, ttl_ms=2000)
        .writeStream.foreachBatch(
            lambda b, _id: admitted.extend(
                (r.fp, r.keep_doc_id) for r in b.collect()
            )
        )
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        drop(src, "t1.json", [{"doc_id": 7, "fp": "A"}, {"doc_id": 3, "fp": "A"},
                              {"doc_id": 9, "fp": "B"}])
        assert _poll(lambda: sorted(admitted) == [("A", 3), ("B", 9)]), admitted

        # in-horizon duplicate dropped; new fingerprint admitted
        drop(src, "t2.json", [{"doc_id": 11, "fp": "A"}, {"doc_id": 12, "fp": "C"}])
        assert _poll(lambda: ("C", 12) in admitted), admitted
        assert ("A", 11) not in admitted

        # past the horizon the engine evicts A; its return is NEW
        import time as _t

        _t.sleep(3.0)  # > ttl_ms; eviction fires on an A-silent batch
        drop(src, "t3.json", [{"doc_id": 20, "fp": "A"}])
        assert _poll(lambda: ("A", 20) in admitted), admitted
    finally:
        q.stop()


def test_ttl_dedup_checkpoint_restart(spark, tmp_path):
    """State survives a stop/restart from the checkpoint: an in-horizon
    duplicate stays dropped across the restart."""
    from datapipeline_dags_spark.streaming.stateful import streaming_dedup_with_ttl

    src = str(tmp_path / "docs_ttl_r")
    ckpt = str(tmp_path / "ckpt_ttl_r")
    import os

    os.makedirs(src, exist_ok=True)
    admitted: list[tuple] = []

    def start_query():
        stream = spark.readStream.schema(DOC_SCHEMA).json(src)
        return (
            streaming_dedup_with_ttl(stream, ttl_ms=3_600_000)
            .writeStream.foreachBatch(
                lambda b, _id: admitted.extend(
                    (r.fp, r.keep_doc_id) for r in b.collect()
                )
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="300 milliseconds")
            .start()
        )

    q = start_query()
    try:
        drop(src, "r1.json", [{"doc_id": 5, "fp": "X"}])
        assert _poll(lambda: admitted == [("X", 5)]), admitted
    finally:
        q.stop()

    admitted.clear()
    q = start_query()
    try:
        drop(src, "r2.json", [{"doc_id": 6, "fp": "X"}, {"doc_id": 8, "fp": "Y"}])
        assert _poll(lambda: ("Y", 8) in admitted), admitted
        assert ("X", 6) not in admitted  # restored state still drops X
    finally:
        q.stop()
