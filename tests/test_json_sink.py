"""K1/K2 JSON put: extended-JSON sink → source round trip."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql.types import DecimalType, StructField, StructType, TimestampType

from datapipeline_dags_spark.functions.extended_json import oid_field
from datapipeline_dags_spark.sinks.json_sink import write_extended_jsonl
from datapipeline_dags_spark.sources.archive import read_entity_jsonl

TARGET = StructType(
    [
        oid_field("_id"),
        StructField("created_at", TimestampType()),
        StructField("amount", DecimalType(38, 6)),
    ]
)

MAPPING = [
    {"source": "_id", "target": "external_id", "type": "oid"},
    {"source": "created_at", "target": "created_at", "type": "timestamp"},
    {"source": "amount", "target": "amount", "type": "decimal"},
]


def test_sink_source_roundtrip_preserves_rich_types(spark, tmp_path):
    out = str(tmp_path / "out")
    df = spark.createDataFrame(
        [
            ("a" * 24, dt.datetime(2026, 3, 1, 12, 0, 0, 500000), Decimal("10.500000")),
            ("b" * 24, dt.datetime(2026, 3, 2), Decimal("0.010000")),
        ],
        TARGET,
    )
    write_extended_jsonl(df, TARGET, out, entity="contact")

    # raw lines carry the wire wrappers
    raw = [r.value for r in spark.read.text(out).collect()]
    assert all('"$oid"' in line and '"$date"' in line for line in raw)

    back = read_entity_jsonl(spark, out, "contact", MAPPING)
    rows = {r.external_id: r for r in back.collect()}
    assert rows["a" * 24].amount == Decimal("10.500000")
    assert rows["a" * 24].created_at == dt.datetime(2026, 3, 1, 12, 0, 0, 500000)
    assert rows["b" * 24].created_at == dt.datetime(2026, 3, 2)


def test_entity_tag_with_quotes_stays_valid_json(spark, tmp_path):
    """The entity tag is spliced into the envelope as a literal — quotes
    and backslashes in it must be escaped or every line is broken."""
    import json

    out = str(tmp_path / "weird")
    df = spark.createDataFrame(
        [("c" * 24, dt.datetime(2026, 1, 1), Decimal("1.000000"))], TARGET
    )
    entity = 'we"ird\\tag'
    write_extended_jsonl(df, TARGET, out, entity=entity)
    raw = [r.value for r in spark.read.text(out).collect()]
    parsed = [json.loads(line) for line in raw]  # raises if escaping broke
    assert parsed[0]["entity"] == entity
    back = read_entity_jsonl(spark, out, entity, MAPPING)
    assert back.count() == 1
