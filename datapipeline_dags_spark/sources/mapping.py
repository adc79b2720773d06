"""Mapping-config → StructType → select/alias projection (SURVEY S7/S10).

The reference fetches a column-mapping schema per
``(workflow_system_name, company_id)`` and applies it inside its opaque
ReaderStep (reference: sqs_sensor_dag.py:100-103,
parallelized_data_pipeline_dag.py:183).  Here the mapping is explicit
data: a list of ``{"source": ..., "target": ..., "type": ...}`` entries
per entity, compiled into a Spark ``StructType`` and a column
projection — schema resolution happens once on the driver; executors
only ever see typed columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DataType,
    DecimalType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from datapipeline_dags_spark.functions.extended_json import oid_field

_TYPES: dict[str, DataType] = {
    "string": StringType(),
    "long": LongType(),
    "double": DoubleType(),
    "timestamp": TimestampType(),
    "decimal": DecimalType(38, 6),
}


def target_schema(mapping: list[dict[str, str]]) -> StructType:
    """Compile one entity's mapping entries into the canonical StructType.

    ``type: "oid"`` marks a Mongo ObjectId (string + metadata so the
    extended-JSON codec knows to unwrap {"$oid": ...}).
    """
    fields = []
    for m in mapping:
        if m["type"] == "oid":
            fields.append(oid_field(m["target"]))
        else:
            fields.append(StructField(m["target"], _TYPES[m["type"]], True))
    return StructType(fields)


def source_schema(mapping: list[dict[str, str]]) -> StructType:
    """Same types keyed by the *source* column names (wire-side names)."""
    fields = []
    for m in mapping:
        if m["type"] == "oid":
            fields.append(oid_field(m["source"]))
        else:
            fields.append(StructField(m["source"], _TYPES[m["type"]], True))
    return StructType(fields)


def projection(mapping: list[dict[str, str]]) -> list[Column]:
    """source → target select/alias list (the ReaderStep's rename pass)."""
    return [F.col(m["source"]).alias(m["target"]) for m in mapping]


def apply_mapping(df: DataFrame, mapping: list[dict[str, str]]) -> DataFrame:
    """Project wire-named columns to canonical names.  Pure select —
    Catalyst prunes unprojected source columns all the way to the scan."""
    return df.select(*projection(mapping))
