"""Queue-message parsing — SURVEY S5/S6 (the process_sqs_events pair).

The reference polls SQS and turns raw message bodies into either file
manifests (sqs_sensor_dag.py:59-82) or verified-data records
(sqs_sync_verified_data_dag.py:19-34) with driver-side json.loads
loops.  Engine version: messages are rows in a DataFrame (from any
source — the queue DataSource, a file stream, a Kafka topic) and both
parses are ONE JVM-side ``from_json`` + projection.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

#: file-notification body (FIXTURES §B3; sqs_sensor_dag.py:72-80)
FILE_NOTIFICATION_SCHEMA = StructType(
    [
        StructField("s3_bucket", StringType()),
        StructField("s3_file_path", StringType()),
    ]
)

#: verified-data body (FIXTURES §B3; sqs_sync_verified_data_dag.py:30-34)
VERIFIED_DATA_SCHEMA = StructType(
    [
        StructField("entity", StringType()),
        StructField("company_id", StringType()),
        StructField("external_id", StringType()),
        StructField("verified_data", StringType()),
    ]
)


def parse_file_notifications(
    messages: DataFrame,
    body_col: str = "body",
    size_of: Callable[[Column, Column], Column] | None = None,
) -> DataFrame:
    """Message bodies → file manifests (bucket, path, size).

    The reference issues a per-file S3 HEAD for the size
    (sqs_sensor_dag.py:77-80) — a driver-side N×RPC loop.  Here
    ``size_of(bucket, path)`` is an injectable column expression (e.g. a
    broadcast-joined listing, or -1 to defer to the binaryFile source's
    own length column); the default defers.
    """
    parsed = messages.withColumn("_m", F.from_json(F.col(body_col), FILE_NOTIFICATION_SCHEMA))
    bucket, path = F.col("_m.s3_bucket"), F.col("_m.s3_file_path")
    size = size_of(bucket, path) if size_of else F.lit(-1).cast(LongType())
    return (
        parsed.filter(bucket.isNotNull() & path.isNotNull())
        .select(
            bucket.alias("bucket"),
            path.alias("path"),
            size.alias("size"),
        )
    )


def parse_verified_messages(
    messages: DataFrame, body_col: str = "body", keep: tuple[str, ...] = ()
) -> DataFrame:
    """Message bodies → verified-data rows, dropping malformed bodies
    (the reference logs-and-skips them per row; here the null filter is
    part of the plan).  Output feeds sinks.apply_verified_updates.

    ``keep`` passes transport columns through (e.g. the queue ``seq``,
    which apply_verified_updates needs for last-write-wins ordering)."""
    parsed = messages.withColumn("_m", F.from_json(F.col(body_col), VERIFIED_DATA_SCHEMA))
    return parsed.filter(
        F.col("_m.entity").isNotNull()
        & F.col("_m.company_id").isNotNull()
        & F.col("_m.external_id").isNotNull()
    ).select(*keep, "_m.entity", "_m.company_id", "_m.external_id", "_m.verified_data")
