"""Queue DataSource tests (S4) + the full entry-point-C replica:
queue → parse → set-based verified-data MERGE (SURVEY §3.3)."""

from __future__ import annotations

import json

import duckdb
import pytest

from datapipeline_dags_spark.sinks.upsert import UpsertSink, apply_verified_updates
from datapipeline_dags_spark.sources.messages import (
    parse_file_notifications,
    parse_verified_messages,
)
from datapipeline_dags_spark.streaming.queue_source import QueueDataSource, enqueue


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(QueueDataSource)
    return spark


def drain(spark, spool, ckpt, handler):
    q = (
        spark.readStream.format("msgqueue")
        .option("path", spool)
        .load()
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_queue_delivers_exactly_once_across_drains(registered, tmp_path):
    spark = registered
    spool, ckpt = str(tmp_path / "spool"), str(tmp_path / "ckpt")
    got: list[tuple[int, str]] = []

    def collect(batch, _bid):
        got.extend((r.seq, r.body) for r in batch.collect())

    enqueue(spool, 0, "alpha")
    enqueue(spool, 1, "beta")
    drain(spark, spool, ckpt, collect)
    assert sorted(got) == [(0, "alpha"), (1, "beta")]

    got.clear()
    enqueue(spool, 2, "gamma")
    drain(spark, spool, ckpt, collect)
    assert got == [(2, "gamma")]  # earlier messages not re-delivered

    got.clear()
    drain(spark, spool, ckpt, collect)  # idle drain
    assert got == []


def test_entry_point_c_queue_to_verified_merge(registered, tmp_path):
    spark = registered
    spool, ckpt = str(tmp_path / "spool"), str(tmp_path / "ckpt")
    db = str(tmp_path / "target.duckdb")

    # system of record rows (K4-style persist)
    UpsertSink(db, "verified_contact", keys=["company_id", "external_id"]).write(
        spark.createDataFrame(
            [("c1", "x1", "Ada", "{}"), ("c1", "x2", "Grace", "{}")],
            "company_id string, external_id string, name string, verified_data string",
        )
    )

    for seq, body in enumerate(
        [
            {"entity": "contact", "company_id": "c1", "external_id": "x1",
             "verified_data": '{"score": 0.9}'},
            {"entity": "contact", "company_id": "c1", "external_id": "zz",
             "verified_data": "{}"},  # unknown key: ignored
            "not-json-at-all",  # malformed: dropped by the parser
        ]
    ):
        enqueue(spool, seq, body if isinstance(body, str) else json.dumps(body))

    applied = {}

    def handle(batch, _bid):
        msgs = parse_verified_messages(batch)
        applied.update(apply_verified_updates(db, msgs, {"contact": "verified_contact"}))

    drain(spark, spool, ckpt, handle)
    assert applied == {"contact": 1}
    con = duckdb.connect(db)
    rows = dict(
        (r[1], r[3])
        for r in con.execute("SELECT * FROM verified_contact").fetchall()
    )
    con.close()
    assert rows == {"x1": '{"score": 0.9}', "x2": "{}"}


def test_parse_file_notifications_shapes_manifests(spark):
    msgs = spark.createDataFrame(
        [
            ('{"s3_bucket": "b1", "s3_file_path": "in/a.zip"}',),
            ("garbage",),
        ],
        "body string",
    )
    out = parse_file_notifications(msgs).collect()
    assert [(r.bucket, r.path, r.size) for r in out] == [("b1", "in/a.zip", -1)]


# ---------------------------------------------------------------------------
# SQS transport (fake client — boto3/network absent in the sandbox)
# ---------------------------------------------------------------------------


class FakeSqs:
    """Minimal SQS double: receive in batches of <= 2, delete by receipt."""

    def __init__(self, bodies):
        self.visible = [(f"r{i}", b) for i, b in enumerate(bodies)]
        self.deleted = []

    def receive_message(self, QueueUrl, MaxNumberOfMessages, WaitTimeSeconds):
        take, self.visible = self.visible[:2], self.visible[2:]
        return {
            "Messages": [
                {"ReceiptHandle": r, "Body": b} for r, b in take
            ]
        } if take else {}

    def delete_message(self, QueueUrl, ReceiptHandle):
        self.deleted.append(ReceiptHandle)


def test_sqs_reader_assigns_offsets_and_deletes_on_commit():
    from datapipeline_dags_spark.streaming.queue_source import SqsQueueStreamReader

    fake = FakeSqs(["a", "b", "c"])
    rd = SqsQueueStreamReader("https://sqs.example/q", client=fake)
    rows, end = rd.read(rd.initialOffset())
    assert list(rows) == [(0, "a"), (1, "b"), (2, "c")]
    assert end == {"pos": 3}

    # nothing deleted before commit (crash here -> SQS redelivers)
    assert fake.deleted == []
    rd.commit(end)
    assert sorted(fake.deleted) == ["r0", "r1", "r2"]

    # idle read keeps the offset; replay path is loudly unsupported
    rows2, end2 = rd.read(end)
    assert list(rows2) == [] and end2 == end
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        rd.readBetweenOffsets({"pos": 0}, {"pos": 3})


def test_sqs_reader_partial_commit_keeps_uncommitted_receipts():
    from datapipeline_dags_spark.streaming.queue_source import SqsQueueStreamReader

    fake = FakeSqs(["a", "b", "c", "d"])
    rd = SqsQueueStreamReader("https://sqs.example/q", client=fake)
    _, end = rd.read(rd.initialOffset())
    rd.commit({"pos": 2})  # only the first epoch committed
    assert sorted(fake.deleted) == ["r0", "r1"]
    rd.commit(end)  # later commit finishes the rest
    assert sorted(fake.deleted) == ["r0", "r1", "r2", "r3"]


def test_sqs_transport_client_bootstrap():
    """With boto3 importable a real client is built by default; without
    it the constructor raises a clear ImportError (simulated by hiding
    the module)."""
    import builtins
    import sys as _sys

    from datapipeline_dags_spark.streaming.queue_source import SqsQueueStreamReader

    # (with boto3 present, default construction additionally needs AWS
    # region/credential config — deployment concerns, not tested here)
    real_import = builtins.__import__

    def no_boto3(name, *a, **k):
        if name == "boto3":
            raise ImportError("No module named 'boto3'")
        return real_import(name, *a, **k)

    builtins.__import__ = no_boto3
    _sys.modules.pop("boto3", None)
    try:
        with pytest.raises(ImportError, match="boto3"):
            SqsQueueStreamReader("https://sqs.example/q")
    finally:
        builtins.__import__ = real_import
