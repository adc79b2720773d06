"""Streaming ingest — SURVEY ST1/ST2/ST6 (the SQS sensor's role).

The reference polls SQS every 2 minutes with ``max_active_runs=1`` and
fans out one pipeline run per arriving file
(sqs_sensor_dag.py:26-56,90-109,120-140).  The idiomatic Spark port is
a **file-arrival stream**: object-store notifications become new files
in a watched directory; Structured Streaming's source tracks processed
files exactly-once in the checkpoint (replacing both the SQS cursor and
Airflow's run bookkeeping), and a single ``availableNow`` pass per
scheduler tick reproduces the serialized micro-batch cadence.

Per-file fan-out happens inside ``foreachBatch``: the batch is grouped
by source file (``_metadata.file_path``) and a callback fires once per
new file — the TriggerMultiDagRunOperator analog.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def watch_json_directory(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-arrival stream over a drop directory (ST1).  Schema is
    declared (streams cannot infer), and every row carries its source
    file path for the fan-out."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path).withColumn("_source_file", F.col("_metadata.file_path"))


def run_available_now(
    stream: DataFrame,
    checkpoint: str,
    on_batch: Callable[[DataFrame, int], None],
) -> None:
    """Drain everything currently available, then stop (ST1/ST2).

    One call = one scheduler tick = one serialized run; the checkpoint
    guarantees each file is processed exactly once across ticks even
    after a crash (the reference needed SQS ack + max_active_runs=1 +
    Airflow state for the same guarantee).
    """
    q = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def per_file_fanout(
    on_file: Callable[[str, DataFrame], None],
) -> Callable[[DataFrame, int], None]:
    """Wrap a per-file callback as a foreachBatch handler (ST6).

    Files per micro-batch are few (they are *arrivals*, not the corpus),
    so the distinct-files listing is a small driver-side collect; each
    file's rows stay a DataFrame — the callback typically launches a
    pipeline run (pipeline/etl.py) on them.
    """

    def handle(batch: DataFrame, batch_id: int) -> None:
        files = [r[0] for r in batch.select("_source_file").distinct().collect()]
        for f in sorted(files):
            on_file(f, batch.filter(F.col("_source_file") == f))

    return handle
