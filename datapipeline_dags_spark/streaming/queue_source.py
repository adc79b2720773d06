"""Message-queue streaming source — SURVEY S4, "custom piece #4".

The reference's SQSSensor long-polls a queue and hands message batches
to Airflow tasks (sqs_sensor_dag.py:127-133,
sqs_sync_verified_data_dag.py:86-92).  The engine implements the queue
as a first-class **Spark 4 Python DataSource** stream: offsets live in
the query checkpoint (replacing SQS receive/ack bookkeeping), delivery
is exactly-once per micro-batch, and replay between committed offsets
is supported for recovery.

Transport: a spool directory — one file per message, named by a
monotonically increasing sequence (``<seq>-<anything>``), the way an
SQS→S3 bridge or a local producer would spool.  A cloud deploy swaps
``_list``/``_read_one`` for boto3 receive/delete calls; offsets,
schema, and planning stay identical.

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


class QueueDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "msgqueue"

    def schema(self) -> StructType:
        return SCHEMA

    def simpleStreamReader(self, schema: StructType) -> QueueStreamReader:
        path = self.options.get("path")
        if not path:
            raise ValueError("msgqueue source requires option 'path'")
        return QueueStreamReader(path)


def enqueue(spool_dir: str, seq: int, body: str) -> None:
    """Producer helper: atomically spool one message."""
    os.makedirs(spool_dir, exist_ok=True)
    tmp = os.path.join(spool_dir, f".{seq}.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(body)
    os.rename(tmp, os.path.join(spool_dir, f"{seq}-msg.json"))
