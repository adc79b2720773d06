"""Pipeline stages — the engine's Step contract (SURVEY §2.4, §2.10).

The reference's extension point is ``Step(metadata, data).process()``
(reference: parallelized_data_pipeline_dag.py:183,222,247,272,297,322);
the engine's is a ``Stage``: a named callable
``(RunManifest, DataFrame | None) -> DataFrame``.  Data stays a lazy
DataFrame between stages — the reference's temp-JSON staging files and
per-hop reparse (parallelized_data_pipeline_dag.py:196-201,220-224)
disappear into lineage; only Persist triggers execution.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from datapipeline_dags_spark.pipeline.manifest import RunManifest

Stage = Callable[[RunManifest, DataFrame], DataFrame]


def processing_ts(manifest: RunManifest) -> object:
    """The batch's processing timestamp column.

    Injectable via ``manifest.extra["processing_ts"]`` so tests and
    replays are deterministic; defaults to current_timestamp() like the
    reference's get_current_ts_string
    (parallelized_data_pipeline_dag.py:181).
    """
    fixed = manifest.extra.get("processing_ts")
    return F.to_timestamp(F.lit(fixed)) if fixed else F.current_timestamp()


# ---------------------------------------------------------------------------
# Read (SURVEY S7 + P1 entity split)
# ---------------------------------------------------------------------------


@dataclass
class EntityReadStage:
    """ReaderStep + entity split: one typed DataFrame per entity from the
    manifest's batch file (parallelized_data_pipeline_dag.py:183-186)."""

    entity: str
    spark: SparkSession

    def __call__(self, manifest: RunManifest, _df: DataFrame | None = None) -> DataFrame:
        from datapipeline_dags_spark.sources.archive import read_entity

        return read_entity(
            self.spark,
            manifest.file_path.uri(),
            self.entity,
            manifest.mapping[self.entity],
        )


# ---------------------------------------------------------------------------
# Transform (SURVEY T1/T2)
# ---------------------------------------------------------------------------


def contact_transform(manifest: RunManifest, df: DataFrame) -> DataFrame:
    """CustomerTransformationStep analog (T1): canonicalize contact rows —
    trimmed/lowercased identifiers, stamped company_id + processing_ts.
    Pure column expressions: runs inside codegen, scales with partitions."""
    return (
        df.withColumn("email", F.lower(F.trim("email")))
        .withColumn("name", F.trim("name"))
        .withColumn("company_id", F.lit(manifest.company_id))
        .withColumn("processing_ts", processing_ts(manifest))
    )


def transaction_transform(manifest: RunManifest, df: DataFrame) -> DataFrame:
    """TransactionTransformationStep analog (T2): typed amount, stamped
    company_id + processing_ts."""
    return (
        df.withColumn("amount", F.col("amount").cast(DecimalType(38, 6)))
        .withColumn("company_id", F.lit(manifest.company_id))
        .withColumn("processing_ts", processing_ts(manifest))
    )


# ---------------------------------------------------------------------------
# Enrichment (SURVEY T3) — lookup join against a small dimension
# ---------------------------------------------------------------------------


@dataclass
class EnrichmentStage:
    """EnrichmentStep analog: left join against a lookup dimension
    (reference call sites parallelized_data_pipeline_dag.py:272,297).

    The lookup is broadcast — enrichment dims are small by contract
    (config tables); the fact side never shuffles."""

    lookup: DataFrame
    on: list[str]

    def __call__(self, manifest: RunManifest, df: DataFrame) -> DataFrame:
        return df.join(F.broadcast(self.lookup), on=self.on, how="left")


# ---------------------------------------------------------------------------
# Persist (SURVEY K1/K2/K4 shape) + cleanup (K3)
# ---------------------------------------------------------------------------


@dataclass
class ParquetPersistStage:
    """PersistStep analog writing partitioned parquet.

    Idempotent by construction: the output path is deterministic per
    (pipeline, entity) and the write is mode=overwrite, so a re-run of
    the same batch replaces rather than duplicates — the lakehouse
    equivalent of the reference's keyed upsert goal (K4/K6).  The JDBC
    upsert sink (sinks/upsert.py) covers the RDBMS-target variant.
    """

    out_dir: str
    entity: str

    def path(self) -> str:
        return os.path.join(self.out_dir, self.entity)

    def __call__(self, manifest: RunManifest, df: DataFrame) -> str:
        df.write.mode("overwrite").parquet(self.path())
        return self.path()


def cleanup_workdir(manifest: RunManifest) -> None:
    """Remove extracted archive temp files (K3; reference deletes temp
    staging files at parallelized_data_pipeline_dag.py:350-373 — the
    only temp state the Spark engine has left is the zip extraction)."""
    import shutil

    workdir = manifest.extra.get("workdir")
    if workdir and os.path.isdir(workdir):
        shutil.rmtree(workdir, ignore_errors=True)
