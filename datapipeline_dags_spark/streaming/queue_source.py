"""Message-queue streaming source — SURVEY S4, "custom piece #4".

The reference's SQSSensor long-polls a queue and hands message batches
to Airflow tasks (sqs_sensor_dag.py:127-133,
sqs_sync_verified_data_dag.py:86-92).  The engine implements the queue
as a first-class **Spark 4 Python DataSource** stream: offsets live in
the query checkpoint (replacing SQS receive/ack bookkeeping), delivery
is exactly-once per micro-batch, and replay between committed offsets
is supported for recovery.

Transports (selected by option):
- spool directory (default; ``path``) — one file per message, named by
  a monotonically increasing sequence (``<seq>-<anything>``), the way
  an SQS→S3 bridge or a local producer would spool.  Fully tested here.
- real SQS (``queue_url``) — boto3 receive/delete behind the SAME
  offset/schema/planning contract: messages are received in ``read``,
  assigned engine-side sequence numbers, and DELETED only on ``commit``
  of their epoch, so an uncommitted crash leaves them in-flight and
  SQS redelivers after the visibility timeout (at-least-once from the
  queue, exactly-once downstream via the MERGE sink).  boto3 is not in
  this sandbox, so the transport is exercised with an injected fake
  client (tests/test_queue_source.py) and documented as such.

Usage::

    spark.dataSource.register(QueueDataSource)
    stream = (spark.readStream.format("msgqueue")
              .option("path", spool_dir).load())
    # rows: (seq long, body string)
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import LongType, StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("seq", LongType()),
        StructField("body", StringType()),
    ]
)


def _seq_of(fname: str) -> int:
    try:
        return int(fname.split("-", 1)[0])
    except ValueError:
        return -1


class QueueStreamReader(SimpleDataSourceStreamReader):
    """Offset = {"pos": <highest consumed seq + 1>}."""

    def __init__(self, path: str) -> None:
        self.path = path

    def _list(self, start_seq: int) -> list[tuple[int, str]]:
        if not os.path.isdir(self.path):
            return []
        out = []
        for fname in os.listdir(self.path):
            seq = _seq_of(fname)
            if seq >= start_seq:
                out.append((seq, os.path.join(self.path, fname)))
        return sorted(out)

    @staticmethod
    def _read_one(fpath: str) -> str:
        with open(fpath, encoding="utf-8") as fh:
            return fh.read()

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        msgs = self._list(start["pos"])
        if not msgs:
            return iter([]), start
        rows = [(seq, self._read_one(p)) for seq, p in msgs]
        return iter(rows), {"pos": msgs[-1][0] + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        """Deterministic replay for recovery: messages in [start, end)."""
        return iter(
            (seq, self._read_one(p))
            for seq, p in self._list(start["pos"])
            if seq < end["pos"]
        )


class SqsQueueStreamReader(SimpleDataSourceStreamReader):
    """Real-SQS transport (reference sqs_sensor_dag.py:127-133) behind
    the same offset contract as the spool reader.

    Lifecycle per micro-batch: ``read`` drains available messages
    (short-poll batches of 10, the SQS API maximum) and assigns them
    contiguous engine-side seqs from the current offset; ``commit``
    deletes exactly the messages of committed epochs.  A crash between
    read and commit leaves receipts undeleted — SQS redelivers them
    after the visibility timeout and they enter a later epoch, which
    the idempotent MERGE sink absorbs (same at-least-once → effectively
    exactly-once story as the sync protocol).

    ``readBetweenOffsets`` raises: a deleted SQS message cannot be
    re-served.  Spark's simple-reader WAL caches each prefetched batch
    in the checkpoint, so replay normally comes from that cache; if the
    cache is gone the loud failure here beats silently returning an
    empty (data-losing) replay.
    """

    def __init__(self, queue_url: str, client=None, max_drain: int = 100) -> None:
        if client is None:
            try:
                import boto3
            except ImportError as exc:  # sandbox: no boto3/network
                raise ImportError(
                    "the SQS transport needs boto3 (pip install boto3); "
                    "use the spool-directory transport ('path' option) here"
                ) from exc
            client = boto3.client("sqs")
        self.client = client
        self.queue_url = queue_url
        self.max_drain = max_drain
        self._receipts: dict[int, str] = {}

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        pos, rows = start["pos"], []
        while len(rows) < self.max_drain:
            resp = self.client.receive_message(
                QueueUrl=self.queue_url, MaxNumberOfMessages=10, WaitTimeSeconds=0
            )
            msgs = resp.get("Messages", [])
            if not msgs:
                break
            for m in msgs:
                rows.append((pos, m["Body"]))
                self._receipts[pos] = m["ReceiptHandle"]
                pos += 1
        if not rows:
            return iter([]), start
        return iter(rows), {"pos": pos}

    def commit(self, end: dict) -> None:
        done = [s for s in self._receipts if s < end["pos"]]
        for s in done:
            self.client.delete_message(
                QueueUrl=self.queue_url, ReceiptHandle=self._receipts.pop(s)
            )

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        raise NotImplementedError(
            "SQS cannot re-serve deleted messages; replay is served from "
            "the streaming checkpoint's prefetch cache"
        )


class QueueDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "msgqueue"

    def schema(self) -> StructType:
        return SCHEMA

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        queue_url = self.options.get("queue_url")
        if queue_url:
            return SqsQueueStreamReader(queue_url)
        path = self.options.get("path")
        if not path:
            raise ValueError("msgqueue source requires option 'path' or 'queue_url'")
        return QueueStreamReader(path)


def enqueue(spool_dir: str, seq: int, body: str) -> None:
    """Producer helper: atomically spool one message."""
    os.makedirs(spool_dir, exist_ok=True)
    tmp = os.path.join(spool_dir, f".{seq}.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(body)
    os.rename(tmp, os.path.join(spool_dir, f"{seq}-msg.json"))
