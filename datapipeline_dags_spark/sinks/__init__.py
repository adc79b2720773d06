"""Sinks: keyed MERGE upsert, verified-data consumer, watermark CDC sync."""

from datapipeline_dags_spark.sinks.sync import (
    COMPLETED,
    NO_DATA,
    STARTED,
    Watermark,
    fetch_watermark,
    sync_all,
    sync_entity,
    watermark_scan,
)
from datapipeline_dags_spark.sinks.upsert import UpsertSink, apply_verified_updates

__all__ = [
    "UpsertSink",
    "apply_verified_updates",
    "sync_entity",
    "sync_all",
    "fetch_watermark",
    "watermark_scan",
    "Watermark",
    "STARTED",
    "COMPLETED",
    "NO_DATA",
]
