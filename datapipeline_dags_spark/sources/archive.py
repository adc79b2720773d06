"""Zip-archive ingest + schema-mapped entity reader (SURVEY S1-S3, S7).

The reference's sensor downloads a zip from S3, extracts
``metadata.json``, and hands the data file to the pipeline
(reference: sqs_sensor_dag.py:92-109); the pipeline's ReaderStep then
parses an entity-keyed extended-JSON batch file
``{"contact": [...], "transaction": [...]}``
(reference: parallelized_data_pipeline_dag.py:103-133,183-186).

Spark mapping:

- Archive handling is driver-side (zipfile) — archives are control
  plane: one small zip per run carrying metadata + one data member.
  The extracted data file lands on storage every executor can read.
- The entity read is ONE JVM-side ``from_json`` against a composite
  wire schema ``{entity: array<wire-struct>}`` + explode + typed
  rewrite via the extended-JSON codec.  No Python touches row data.
- A single big JSON object is unsplittable by construction; at 100 TB
  inputs arrive as many files (one stream partition per file) and/or
  JSONL — ``read_entity_jsonl`` is the splittable path.
"""

from __future__ import annotations

import json
import os
import zipfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructField, StructType

from datapipeline_dags_spark.functions.extended_json import decode_wire, wire_type
from datapipeline_dags_spark.pipeline.manifest import FileRef, RunManifest


@dataclass
class ExtractedArchive:
    metadata: dict
    data_path: str
    workdir: str


def extract_archive(zip_path: str, workdir: str) -> ExtractedArchive:
    """Unzip an input archive: returns the parsed ``metadata.json`` and
    the extracted data member's path (reference: sqs_sensor_dag.py:92-98).
    """
    os.makedirs(workdir, exist_ok=True)
    with zipfile.ZipFile(zip_path) as zf:
        names = zf.namelist()
        if "metadata.json" not in names:
            raise FileNotFoundError(f"{zip_path}: no metadata.json member")
        with zf.open("metadata.json") as fh:
            metadata = json.load(fh)
        data_members = [n for n in names if n != "metadata.json"]
        if len(data_members) != 1:
            raise ValueError(f"{zip_path}: expected exactly one data member, got {data_members}")
        data_path = zf.extract(data_members[0], workdir)
    return ExtractedArchive(metadata=metadata, data_path=data_path, workdir=workdir)


def manifest_from_archive(zip_path: str, workdir: str, mapping_lookup) -> RunManifest:
    """Build the run manifest from an archive: metadata.json supplies
    (workflow_system_name, company_id); ``mapping_lookup(name, company)``
    supplies the column mapping (reference: sqs_sensor_dag.py:100-109)."""
    ex = extract_archive(zip_path, workdir)
    name = ex.metadata["workflow_system_name"]
    company = ex.metadata["company_id"]
    return RunManifest(
        workflow_system_name=name,
        company_id=company,
        file_path=FileRef(bucket="", path=ex.data_path, size=os.path.getsize(ex.data_path)),
        mapping=mapping_lookup(name, company),
        extra={"metadata": ex.metadata, "workdir": ex.workdir},
    )


def read_entity(
    spark: SparkSession,
    path: str,
    entity: str,
    mapping: list[dict[str, str]],
) -> DataFrame:
    """Read one entity's records from an entity-keyed extended-JSON batch
    file — the ReaderStep + entity-split semantics (SURVEY S7 + P1).

    One ``wholetext`` scan, one ``from_json`` with wire schema
    ``{entity: array<wire>}``, one explode, one typed rewrite.  Each
    entity gets its own lineage over the same file — reproducing the
    reference's parallel per-entity branches
    (parallelized_data_pipeline_dag.py:185-186,433-434).
    """
    from datapipeline_dags_spark.sources.mapping import apply_mapping, source_schema

    src = source_schema(mapping)
    payload_schema = StructType([StructField(entity, ArrayType(wire_type(src)), True)])
    raw = spark.read.text(path, wholetext=True)
    rows = raw.select(
        F.explode(F.from_json(F.col("value"), payload_schema)[entity]).alias("w")
    )
    typed = rows.select(
        *[
            decode_wire(F.col("w")[f.name], f.dataType, bool(f.metadata.get("ejson")))
            .alias(f.name)
            for f in src.fields
        ]
    )
    return apply_mapping(typed, mapping)


def read_entity_jsonl(
    spark: SparkSession,
    path: str,
    entity: str,
    mapping: list[dict[str, str]],
) -> DataFrame:
    """Splittable variant: one extended-JSON record per line, each tagged
    ``{"entity": ..., "record": {...}}`` — the shape a 100 TB ingest
    actually uses (many files × many lines; full scan parallelism)."""
    from datapipeline_dags_spark.sources.mapping import apply_mapping, source_schema

    src = source_schema(mapping)
    from pyspark.sql.types import StringType

    line_schema = StructType(
        [
            StructField("entity", StringType(), True),
            StructField("record", wire_type(src), True),
        ]
    )
    raw = spark.read.text(path)
    parsed = raw.select(F.from_json("value", line_schema).alias("p")).filter(
        F.col("p.entity") == entity
    )
    typed = parsed.select(
        *[
            decode_wire(F.col("p.record")[f.name], f.dataType, bool(f.metadata.get("ejson")))
            .alias(f.name)
            for f in src.fields
        ]
    )
    return apply_mapping(typed, mapping)
