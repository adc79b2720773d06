"""MongoDB extended-JSON codec — SURVEY §2.4 T4, "custom piece #1".

The reference decodes/encodes its wire format with
``bson.json_util.object_hook`` / ``json_util.default``
(reference: parallelized_data_pipeline_dag.py:7,107,116,127,149), so
records carry ``{"$date": ...}``, ``{"$oid": ...}``,
``{"$numberDecimal": ...}`` wrappers that must revive into rich types.

Spark-first design: **schema-directed, fully JVM-side**.  The caller
declares the *target* schema (rich types); we derive the *wire* schema
(wrapper structs), parse with one ``from_json``, and rewrite wrapper
structs into typed columns with pure column expressions — no Python
UDF touches row data, so the codec runs inside whole-stage codegen and
scales with partitions.

Type mapping (both directions):

====================  =========================================
target type            wire form
====================  =========================================
TimestampType          ``{"$date": "yyyy-MM-ddTHH:mm:ss.SSSZ"}``
DecimalType(p, s)      ``{"$numberDecimal": "<string>"}``
StringType + oid meta  ``{"$oid": "<24-hex>"}``
StructType / ArrayType recursed element-wise
everything else        plain JSON value
====================  =========================================

ObjectId fields are plain strings in the target schema, marked with
``StructField(..., metadata={"ejson": "oid"})``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DataType,
    DecimalType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: canonical $date format (UTC, millisecond precision — Mongo's wire unit)
DATE_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"

_OID_META = "ejson"
_OID_VALUE = "oid"


def _is_oid(field: StructField) -> bool:
    return field.metadata is not None and field.metadata.get(_OID_META) == _OID_VALUE


def oid_field(name: str, nullable: bool = True) -> StructField:
    """A StructField declaring an ObjectId (wire: {"$oid": "24-hex"})."""
    return StructField(name, StringType(), nullable, metadata={_OID_META: _OID_VALUE})


# ---------------------------------------------------------------------------
# target schema -> wire schema
# ---------------------------------------------------------------------------


def wire_type(dt: DataType, is_oid: bool = False) -> DataType:
    if is_oid:
        return StructType([StructField("$oid", StringType())])
    if isinstance(dt, TimestampType):
        return StructType([StructField("$date", StringType())])
    if isinstance(dt, DecimalType):
        return StructType([StructField("$numberDecimal", StringType())])
    if isinstance(dt, StructType):
        return StructType(
            [StructField(f.name, wire_type(f.dataType, _is_oid(f)), True) for f in dt.fields]
        )
    if isinstance(dt, ArrayType):
        return ArrayType(wire_type(dt.elementType))
    return dt


# ---------------------------------------------------------------------------
# decode: wire struct column -> typed column
# ---------------------------------------------------------------------------


def _decode(col: Column, dt: DataType, is_oid: bool = False) -> Column:
    if is_oid:
        return col["$oid"]
    if isinstance(dt, TimestampType):
        return F.to_timestamp(col["$date"], DATE_FMT)
    if isinstance(dt, DecimalType):
        return col["$numberDecimal"].cast(dt)
    if isinstance(dt, StructType):
        return F.struct(
            *[
                _decode(col[f.name], f.dataType, _is_oid(f)).alias(f.name)
                for f in dt.fields
            ]
        )
    if isinstance(dt, ArrayType):
        return F.transform(col, lambda e: _decode(e, dt.elementType))
    return col.cast(dt)


def decode_wire(col: Column, target: DataType, is_oid: bool = False) -> Column:
    """Rewrite an already-parsed wire-shaped column into typed form —
    for callers that ran their own ``from_json`` against a composite
    wire schema (e.g. the entity reader parsing ``{"contact": [...]}``
    payloads in one pass)."""
    return _decode(col, target, is_oid)


def from_extended_json(col: Column | str, target: StructType) -> Column:
    """Parse an extended-JSON string column into a typed struct column.

    One JVM-side ``from_json`` against the derived wire schema, then
    wrapper-struct rewrites.  Reference parity: the read half of
    parallelized_data_pipeline_dag.py:107,127.
    """
    c = F.col(col) if isinstance(col, str) else col
    parsed = F.from_json(c, wire_type(target))
    return _decode(parsed, target)


# ---------------------------------------------------------------------------
# encode: typed column -> wire struct column / JSON string
# ---------------------------------------------------------------------------


def _encode(col: Column, dt: DataType, is_oid: bool = False) -> Column:
    if is_oid:
        return F.struct(col.alias("$oid"))
    if isinstance(dt, TimestampType):
        return F.struct(F.date_format(col, DATE_FMT).alias("$date"))
    if isinstance(dt, DecimalType):
        return F.struct(col.cast("string").alias("$numberDecimal"))
    if isinstance(dt, StructType):
        return F.struct(
            *[
                _encode(col[f.name], f.dataType, _is_oid(f)).alias(f.name)
                for f in dt.fields
            ]
        )
    if isinstance(dt, ArrayType):
        return F.transform(col, lambda e: _encode(e, dt.elementType))
    return col


def to_extended_json(col: Column, target: StructType) -> Column:
    """Serialize a typed struct column to an extended-JSON string —
    the write half (parallelized_data_pipeline_dag.py:116,149)."""
    return F.to_json(_encode(col, target))
