"""The scheduled incremental-sync job — SURVEY ST3 (entry point B).

The reference runs execute_sync_process_func on a 5-minute cron with
max_active_runs=1 (postgresql_mysql_sync_dag.py:128-133).  The engine
wires the same cycle as a one-task Pipeline (so it gets retries,
failure alerting, and metrics for free) and leaves the cadence to the
caller's scheduler tick — each ``run()`` is one serialized cycle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from datapipeline_dags_spark.pipeline.scheduler import Pipeline, RunResult
from datapipeline_dags_spark.sinks.sync import sync_all


def build_sync_pipeline(
    sources: dict[str, Callable[[], DataFrame]],
    db_path: str,
    tables: dict[str, str],
    *,
    ts_col: str = "processing_ts",
    id_col: str = "id",
    on_failure=None,
    metrics_sink=None,
) -> Pipeline:
    pipe = Pipeline("incremental_sync", on_failure=on_failure, metrics_sink=metrics_sink)

    def cycle(ctx: dict) -> list:
        return sync_all(
            sources, db_path, tables, run_id=str(ctx.get("run_id", "sync")),
            ts_col=ts_col, id_col=id_col,
        )

    pipe.task("sync_cycle", cycle, retries=1)
    return pipe


def run_sync_cycle(
    sources: dict[str, Callable[[], DataFrame]],
    db_path: str,
    tables: dict[str, str],
    run_id: str,
    **kwargs,
) -> RunResult:
    pipe = build_sync_pipeline(sources, db_path, tables, **kwargs)
    return pipe.run(run_id=run_id, context={"run_id": run_id})
