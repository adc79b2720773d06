"""The main ETL pipeline — read → split → transform → enrich → persist.

A faithful re-expression of the reference's
PARALLELIZED_DATA_PIPELINE_DAG task graph
(parallelized_data_pipeline_dag.py:376-434):

    read ─┬─ transform_contact ── enrich_contact ── persist_contact ─┐
          └─ transform_transaction ── enrich_transaction ── persist_transaction ─┴─ complete

with two key Spark-first differences:

- Stages exchange lazy DataFrames, not temp JSON files; the per-entity
  chain is ONE logical plan and only `persist_*` runs a job.  The two
  persists are submitted from parallel scheduler threads, so Spark runs
  both entity branches concurrently (the reference's parallel
  PythonOperator branches).
- `complete` (ALL_SUCCESS fan-in) only deletes the zip-extraction
  workdir — there are no inter-stage temp files to clean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datapipeline_dags_spark.pipeline.manifest import RunManifest
from datapipeline_dags_spark.pipeline.scheduler import Pipeline, RunResult
from datapipeline_dags_spark.pipeline.stages import (
    EnrichmentStage,
    EntityReadStage,
    ParquetPersistStage,
    cleanup_workdir,
    contact_transform,
    transaction_transform,
)

TRANSFORMS = {
    "contact": contact_transform,
    "transaction": transaction_transform,
}


def build_ingest_pipeline(
    spark: SparkSession,
    manifest: RunManifest,
    out_dir: str,
    *,
    enrich: dict[str, tuple[DataFrame, list[str]]] | None = None,
    on_failure=None,
    metrics_sink=None,
) -> Pipeline:
    """Wire the reference's task graph for the manifest's entities.

    ``enrich`` maps entity -> (lookup DataFrame, join keys) for the
    EnrichmentStep analog; entities without a lookup pass through.
    """
    pipe = Pipeline(
        f"ingest:{manifest.workflow_system_name}",
        max_workers=4,
        on_failure=on_failure,
        metrics_sink=metrics_sink,
    )
    entities = list(manifest.mapping)
    persist_tasks = []
    for entity in entities:
        read = EntityReadStage(entity, spark)
        transform = TRANSFORMS.get(entity, lambda m, df: df)
        enrich_stage = None
        if enrich and entity in enrich:
            lookup, keys = enrich[entity]
            enrich_stage = EnrichmentStage(lookup, keys)
        persist = ParquetPersistStage(out_dir, entity)

        def make(read=read, transform=transform, enrich_stage=enrich_stage, persist=persist):
            def read_task(ctx: dict) -> DataFrame:
                return read(manifest)

            def transform_task(ctx: dict, dep=f"read_{persist.entity}") -> DataFrame:
                return transform(manifest, ctx[dep])

            def enrich_task(ctx: dict, dep=f"transform_{persist.entity}") -> DataFrame:
                df = ctx[dep]
                return enrich_stage(manifest, df) if enrich_stage else df

            def persist_task(ctx: dict, dep=f"enrich_{persist.entity}") -> str:
                return persist(manifest, ctx[dep])

            return read_task, transform_task, enrich_task, persist_task

        r, t, e, p = make()
        pipe.task(f"read_{entity}", r)
        pipe.task(f"transform_{entity}", t, deps=[f"read_{entity}"])
        pipe.task(f"enrich_{entity}", e, deps=[f"transform_{entity}"])
        pipe.task(f"persist_{entity}", p, deps=[f"enrich_{entity}"], retries=1)
        persist_tasks.append(f"persist_{entity}")

    def complete_task(ctx: dict) -> dict:
        cleanup_workdir(manifest)
        return {e: ctx[f"persist_{e}"] for e in entities}

    pipe.task("complete", complete_task, deps=persist_tasks)
    return pipe


def run_ingest(
    spark: SparkSession,
    manifest: RunManifest,
    out_dir: str,
    **kwargs,
) -> RunResult:
    pipe = build_ingest_pipeline(spark, manifest, out_dir, **kwargs)
    return pipe.run(run_id=manifest.run_id, context={"run_id": manifest.run_id})
