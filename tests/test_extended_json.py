"""Golden round-trip tests for the extended-JSON codec (SURVEY T4)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DecimalType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from datapipeline_dags_spark.functions.extended_json import (
    from_extended_json,
    oid_field,
    to_extended_json,
)

SCHEMA = StructType(
    [
        oid_field("_id"),
        StructField("created_at", TimestampType()),
        StructField("amount", DecimalType(38, 6)),
        StructField("n", LongType()),
        StructField("name", StringType()),
        StructField("tags", ArrayType(StringType())),
        StructField(
            "nested",
            StructType([StructField("when", TimestampType()), oid_field("ref")]),
        ),
    ]
)

WIRE = (
    '{"_id": {"$oid": "507f1f77bcf86cd799439011"},'
    ' "created_at": {"$date": "2026-01-01T12:30:45.123Z"},'
    ' "amount": {"$numberDecimal": "12.34"},'
    ' "n": 42, "name": "acme", "tags": ["x", "y"],'
    ' "nested": {"when": {"$date": "2026-02-01T00:00:00.000Z"},'
    ' "ref": {"$oid": "aaaaaaaaaaaaaaaaaaaaaaaa"}}}'
)


def test_decode_revives_rich_types(spark):
    df = spark.createDataFrame([(WIRE,)], "payload string")
    row = df.select(from_extended_json("payload", SCHEMA).alias("r")).collect()[0].r
    assert row._id == "507f1f77bcf86cd799439011"
    assert row.created_at == dt.datetime(2026, 1, 1, 12, 30, 45, 123000)
    assert row.amount == Decimal("12.340000")
    assert row.n == 42
    assert row.name == "acme"
    assert row.tags == ["x", "y"]
    assert row.nested.when == dt.datetime(2026, 2, 1)
    assert row.nested.ref == "aaaaaaaaaaaaaaaaaaaaaaaa"


def test_encode_emits_wire_wrappers(spark):
    df = spark.createDataFrame([(WIRE,)], "payload string")
    out = df.select(
        to_extended_json(from_extended_json("payload", SCHEMA), SCHEMA).alias("j")
    ).collect()[0].j
    assert '"_id":{"$oid":"507f1f77bcf86cd799439011"}' in out
    assert '"created_at":{"$date":"2026-01-01T12:30:45.123Z"}' in out
    assert '"amount":{"$numberDecimal":"12.340000"}' in out
    assert '"when":{"$date":"2026-02-01T00:00:00.000Z"}' in out


def test_roundtrip_is_fixed_point(spark):
    """decode∘encode must be the identity on already-canonical payloads."""
    df = spark.createDataFrame([(WIRE,)], "payload string")
    once = df.select(
        to_extended_json(from_extended_json("payload", SCHEMA), SCHEMA).alias("j")
    )
    twice = once.select(
        to_extended_json(from_extended_json("j", SCHEMA), SCHEMA).alias("j")
    )
    assert once.collect() == twice.collect()


def test_null_fields_survive(spark):
    df = spark.createDataFrame([('{"n": 7}',)], "payload string")
    row = df.select(from_extended_json("payload", SCHEMA).alias("r")).collect()[0].r
    assert row.n == 7
    assert row._id is None and row.created_at is None and row.amount is None


def test_no_python_udf_in_plan(spark):
    """The codec must stay inside codegen — no BatchEvalPython/ArrowEval."""
    df = spark.createDataFrame([(WIRE,)], "payload string")
    out = df.select(to_extended_json(from_extended_json("payload", SCHEMA), SCHEMA))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
