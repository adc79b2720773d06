"""Entry-point-C flagship: ONE streaming query wiring queue source →
parse_verified_messages → apply_verified_updates, stopped mid-stream and
restarted from its checkpoint — proving no update is lost and no message
is replayed into a different epoch (re-runs of an uncommitted epoch are
absorbed by the set-based MERGE, which is the exactly-once contract).

Replicates sqs_sync_verified_data_dag.py:37-68 as a single continuous
pipeline instead of sensor + task hops.
"""

from __future__ import annotations

import json
import time

import duckdb
import pytest

from datapipeline_dags_spark.sinks.upsert import UpsertSink, apply_verified_updates
from datapipeline_dags_spark.sources.messages import parse_verified_messages
from datapipeline_dags_spark.streaming.queue_source import QueueDataSource, enqueue

N_KEYS = 6


def msg(i: int, round_: str) -> str:
    return json.dumps(
        {
            "entity": "contact",
            "company_id": "c1",
            "external_id": f"x{i % N_KEYS}",
            "verified_data": f"{round_}-{i}",
        }
    )


def q(db: str, sql: str):
    with duckdb.connect(db) as con:
        return con.execute(sql).fetchall()


def poll(predicate, timeout=60.0, every=0.25):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(every)
    return False


@pytest.fixture()
def db(spark, tmp_path):
    path = str(tmp_path / "target.duckdb")
    rows = [("c1", f"x{k}", f"name{k}", "init") for k in range(N_KEYS)]
    UpsertSink(path, "verified_contact", keys=["company_id", "external_id"]).write(
        spark.createDataFrame(
            rows, "company_id string, external_id string, name string, verified_data string"
        )
    )
    return path


def test_streaming_verified_updates_survive_checkpoint_restart(spark, tmp_path, db):
    spark.dataSource.register(QueueDataSource)
    spool, ckpt = str(tmp_path / "spool"), str(tmp_path / "ckpt")
    audit = str(tmp_path / "audit.duckdb")
    with duckdb.connect(audit) as con:
        con.execute("CREATE TABLE seen (batch_id BIGINT, seq BIGINT)")

    def apply_batch(batch, batch_id: int):
        # persist: the handler runs TWO actions over this batch, and each
        # action on a Python-DataSource stream batch re-reads the source
        # (a second un-persisted evaluation can even kill the stream
        # thread with a JVM StackOverflowError)
        b = batch.persist()
        try:
            rows = parse_verified_messages(b, keep=("seq",))
            # order_by=seq: a coalesced batch (restart replay) may carry
            # two updates for one key — last-write-wins like the
            # reference's in-order loop
            apply_verified_updates(
                db, rows, {"contact": "verified_contact"}, order_by="seq"
            )
            seqs = [int(r.seq) for r in b.select("seq").collect()]
            with duckdb.connect(audit) as con:
                con.executemany(
                    "INSERT INTO seen VALUES (?, ?)", [(batch_id, s) for s in seqs]
                )
        finally:
            b.unpersist()

    def start(trigger: dict):
        return (
            spark.readStream.format("msgqueue")
            .option("path", spool)
            .load()
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(**trigger)
            .start()
        )

    # phase 1: continuously-running query; round A fully applied
    stream = start({"processingTime": "200 milliseconds"})
    for i in range(6):
        enqueue(spool, i, msg(i, "A"))
    assert poll(
        lambda: q(db, "SELECT COUNT(*) FROM verified_contact "
                      "WHERE verified_data LIKE 'A-%'")[0][0] == N_KEYS
    ), "round A never fully applied"

    # round B enqueued, then the query is stopped MID-STREAM (some of B
    # may be in an uncommitted epoch — exactly the crash window)
    for i in range(6, 12):
        enqueue(spool, i, msg(i, "B"))
    stream.stop()
    stream.awaitTermination()

    # phase 2: restart from the same checkpoint; round C lands on top.
    # availableNow on a Python DataSource falls back to single-batch
    # execution, so drain with repeated restarts until idle — exactly the
    # recovery loop an operator would run after a crash.
    for i in range(12, 18):
        enqueue(spool, i, msg(i, "C"))
    for _ in range(4):
        resumed = start({"availableNow": True})
        resumed.awaitTermination()
        if q(audit, "SELECT COUNT(DISTINCT seq) FROM seen")[0][0] == 18:
            break

    # no lost updates: final value per key is the LAST message for it
    final = dict(
        (r[0], r[1])
        for r in q(db, "SELECT external_id, verified_data FROM verified_contact")
    )
    assert final == {f"x{i % N_KEYS}": f"C-{i}" for i in range(12, 18)}

    # every message processed, and never replayed into a DIFFERENT epoch
    seen = q(audit, "SELECT seq, COUNT(DISTINCT batch_id) FROM seen GROUP BY seq")
    assert sorted(s for s, _ in seen) == list(range(18))
    assert all(n_epochs == 1 for _, n_epochs in seen)
