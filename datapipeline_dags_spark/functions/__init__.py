"""Custom column-function families (extended-JSON codec, …)."""

from datapipeline_dags_spark.functions.extended_json import (
    from_extended_json,
    oid_field,
    to_extended_json,
    wire_type,
)

__all__ = ["from_extended_json", "to_extended_json", "oid_field", "wire_type"]
