"""Relational-target helpers (DuckDB file = sandbox stand-in for the
reference's PostgreSQL/MySQL targets; no network in the sandbox).

The engine-side pattern is identical to a production JDBC warehouse
sink: executors write the batch to a parquet staging area (distributed,
partitioned), then ONE set-based SQL statement on the DB applies it —
never row-at-a-time round trips (the reference's per-row UPDATE loop at
sqs_sync_verified_data_dag.py:52-58 is the anti-pattern this replaces).
"""

from __future__ import annotations

import contextlib
import shutil
import tempfile

import duckdb
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    DataType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    TimestampType,
)


def duck_type(dt: DataType) -> str:
    if isinstance(dt, LongType):
        return "BIGINT"
    if isinstance(dt, IntegerType):
        return "INTEGER"
    if isinstance(dt, DoubleType):
        return "DOUBLE"
    if isinstance(dt, FloatType):
        return "FLOAT"
    if isinstance(dt, StringType):
        return "VARCHAR"
    if isinstance(dt, TimestampType):
        return "TIMESTAMP"
    if isinstance(dt, BooleanType):
        return "BOOLEAN"
    if isinstance(dt, DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    raise TypeError(f"unsupported sink type: {dt}")


def ddl_for(df: DataFrame, table: str, keys: list[str]) -> str:
    cols = ", ".join(f'"{f.name}" {duck_type(f.dataType)}' for f in df.schema.fields)
    pk = ", ".join(f'"{k}"' for k in keys)
    return f'CREATE TABLE IF NOT EXISTS "{table}" ({cols}, PRIMARY KEY ({pk}))'


@contextlib.contextmanager
def connect(db_path: str):
    con = duckdb.connect(db_path)
    try:
        yield con
    finally:
        con.close()


@contextlib.contextmanager
def staged_parquet(df: DataFrame):
    """Write a batch to a parquet staging dir from the executors and
    yield a read_parquet glob for the DB side.  This is the distributed
    half of the staging-table MERGE pattern."""
    staging = tempfile.mkdtemp(prefix="sink_stage_")
    try:
        df.write.mode("overwrite").parquet(staging)
        yield f"{staging}/*.parquet"
    finally:
        shutil.rmtree(staging, ignore_errors=True)
