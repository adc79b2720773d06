"""Pipeline control plane: manifest, stages, scheduler, alerts, ETL wiring."""

from datapipeline_dags_spark.pipeline.manifest import FileRef, RunManifest
from datapipeline_dags_spark.pipeline.scheduler import (
    ALL_DONE,
    ALL_SUCCESS,
    Pipeline,
    RunResult,
    Task,
    TaskRun,
)

__all__ = [
    "FileRef",
    "RunManifest",
    "Pipeline",
    "RunResult",
    "Task",
    "TaskRun",
    "ALL_DONE",
    "ALL_SUCCESS",
]
