"""End-to-end pipeline test (SURVEY §5.3, FIXTURES §B):

zip(metadata.json + extended-JSON batch) → manifest → read → entity
split → transform → enrich → persist, run twice (idempotent), plus the
failure path (alert hook + upstream_failed fan-in)."""

from __future__ import annotations

import datetime as dt
import json
import zipfile
from decimal import Decimal

import pytest

from datapipeline_dags_spark.pipeline.etl import run_ingest
from datapipeline_dags_spark.sources.archive import manifest_from_archive, read_entity

MAPPING = {
    "contact": [
        {"source": "_id", "target": "external_id", "type": "oid"},
        {"source": "full_name", "target": "name", "type": "string"},
        {"source": "email_address", "target": "email", "type": "string"},
        {"source": "created_at", "target": "created_at", "type": "timestamp"},
    ],
    "transaction": [
        {"source": "_id", "target": "external_id", "type": "oid"},
        {"source": "contact_id", "target": "contact_external_id", "type": "oid"},
        {"source": "amount", "target": "amount", "type": "decimal"},
        {"source": "txn_at", "target": "txn_ts", "type": "timestamp"},
    ],
}

BATCH = {
    "contact": [
        {
            "_id": {"$oid": "a" * 24},
            "full_name": "  Ada Lovelace ",
            "email_address": "Ada@Example.COM",
            "created_at": {"$date": "2026-01-05T10:00:00.000Z"},
        },
        {
            "_id": {"$oid": "b" * 24},
            "full_name": "Grace Hopper",
            "email_address": "grace@example.com",
            "created_at": {"$date": "2026-01-06T11:30:00.000Z"},
        },
    ],
    "transaction": [
        {
            "_id": {"$oid": "c" * 24},
            "contact_id": {"$oid": "a" * 24},
            "amount": {"$numberDecimal": "19.99"},
            "txn_at": {"$date": "2026-01-07T00:00:00.000Z"},
        },
        {
            "_id": {"$oid": "d" * 24},
            "contact_id": {"$oid": "b" * 24},
            "amount": {"$numberDecimal": "250.00"},
            "txn_at": {"$date": "2026-01-08T12:00:00.000Z"},
        },
        {
            "_id": {"$oid": "e" * 24},
            "contact_id": {"$oid": "a" * 24},
            "amount": {"$numberDecimal": "5.50"},
            "txn_at": {"$date": "2026-01-09T06:00:00.000Z"},
        },
    ],
}

METADATA = {"workflow_system_name": "crm", "company_id": "acme-1"}


@pytest.fixture()
def archive(tmp_path):
    zip_path = tmp_path / "input.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        zf.writestr("metadata.json", json.dumps(METADATA))
        zf.writestr("batch.json", json.dumps(BATCH))
    return str(zip_path)


def make_manifest(archive, tmp_path):
    m = manifest_from_archive(
        archive, str(tmp_path / "work"), lambda name, company: MAPPING
    )
    m.extra["processing_ts"] = "2026-02-01 00:00:00"
    return m


def test_read_entity_revives_types(spark, archive, tmp_path):
    m = make_manifest(archive, tmp_path)
    contacts = read_entity(spark, m.file_path.uri(), "contact", m.mapping["contact"])
    rows = {r.external_id: r for r in contacts.collect()}
    assert set(rows) == {"a" * 24, "b" * 24}
    assert rows["a" * 24].created_at == dt.datetime(2026, 1, 5, 10, 0)
    txns = read_entity(spark, m.file_path.uri(), "transaction", m.mapping["transaction"])
    assert txns.select("amount").schema[0].dataType.simpleString() == "decimal(38,6)"


def test_e2e_run_twice_is_idempotent(spark, archive, tmp_path):
    m = make_manifest(archive, tmp_path)
    out = str(tmp_path / "out")
    lookup = spark.createDataFrame(
        [("acme-1", "ACME Corp")], "company_id string, company_name string"
    )
    res = run_ingest(spark, m, out, enrich={"contact": (lookup, ["company_id"])})
    assert res.ok, res.tasks
    contacts = spark.read.parquet(f"{out}/contact")
    txns = spark.read.parquet(f"{out}/transaction")
    crows = {r.external_id: r for r in contacts.collect()}
    assert crows["a" * 24].email == "ada@example.com"  # transform normalized
    assert crows["a" * 24].name == "Ada Lovelace"
    assert crows["a" * 24].company_name == "ACME Corp"  # enrichment joined
    assert crows["a" * 24].processing_ts == dt.datetime(2026, 2, 1)
    trows = {r.external_id: r for r in txns.collect()}
    assert trows["c" * 24].amount == Decimal("19.990000")
    assert trows["c" * 24].contact_external_id == "a" * 24

    # the fan-in cleanup removed the extracted archive workdir (K3)
    import os

    assert not os.path.isdir(str(tmp_path / "work"))

    # re-run the same batch: counts unchanged (idempotent persist)
    m2 = make_manifest(archive, tmp_path)
    res2 = run_ingest(spark, m2, out, enrich={"contact": (lookup, ["company_id"])})
    assert res2.ok
    assert spark.read.parquet(f"{out}/contact").count() == 2
    assert spark.read.parquet(f"{out}/transaction").count() == 3

    # per-task timing metrics exist for every task (K8)
    assert set(res.metrics()) == {
        "read_contact", "transform_contact", "enrich_contact", "persist_contact",
        "read_transaction", "transform_transaction", "enrich_transaction",
        "persist_transaction", "complete",
    }


def test_e2e_failure_fires_alert_and_blocks_fanin(spark, archive, tmp_path):
    from datapipeline_dags_spark.pipeline.alerts import failure_hook
    from datapipeline_dags_spark.pipeline.etl import build_ingest_pipeline

    m = make_manifest(archive, tmp_path)
    m.mapping = {"contact": m.mapping["contact"]}
    posted = []
    pipe = build_ingest_pipeline(
        spark,
        m,
        str(tmp_path / "out2"),
        on_failure=failure_hook("ingest:crm", poster=posted.append),
    )

    def poison(ctx):
        raise RuntimeError("poison record")

    # inject a failing validation between enrich and persist
    pipe._tasks["persist_contact"].deps = ("validate",)
    pipe.task("validate", poison, deps=["enrich_contact"])
    res = pipe.run(run_id=m.run_id, context={"run_id": m.run_id})
    assert not res.ok
    assert res.tasks["validate"].state == "failed"
    assert res.tasks["persist_contact"].state == "upstream_failed"
    assert res.tasks["complete"].state == "upstream_failed"
    assert posted and posted[0]["task"] == "validate"
    assert posted[0]["pipeline"] == "ingest:crm"
