"""Structured Streaming layer: file-arrival ingest, fan-out, event-time."""

from datapipeline_dags_spark.streaming.ingest import (
    per_file_fanout,
    run_available_now,
    watch_json_directory,
)
from datapipeline_dags_spark.streaming.queue_source import QueueDataSource, enqueue

__all__ = [
    "watch_json_directory",
    "run_available_now",
    "per_file_fanout",
    "QueueDataSource",
    "enqueue",
]
