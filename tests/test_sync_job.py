"""Scheduled sync job wiring (ST3) + the K8 metrics sink."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from datapipeline_dags_spark.catalog import table
from datapipeline_dags_spark.pipeline.sync_job import run_sync_cycle
from datapipeline_dags_spark.sinks.metrics import metrics_to_db


def test_sync_cycle_pipeline_with_metrics(spark, sf_dir, tmp_path):
    db = str(tmp_path / "t.duckdb")

    def src():
        return (
            table(spark, sf_dir, "events")
            .filter(F.col("event_id") <= 200)
            .select("event_id", "ts", "user_id", "event_type", "value")
        )

    res = run_sync_cycle(
        {"events": src}, db, {"events": "sync_events"},
        run_id="cycle1", ts_col="ts", id_col="event_id",
        metrics_sink=metrics_to_db(db),
    )
    assert res.ok
    (sync,) = res.tasks["sync_cycle"].result
    assert sync.status == "COMPLETED" and sync.records > 0

    con = duckdb.connect(db)
    try:
        n = con.execute("SELECT COUNT(*) FROM sync_events").fetchone()[0]
        stats = con.execute(
            "SELECT task, state FROM pipeline_task_stats WHERE run_id='cycle1'"
        ).fetchall()
    finally:
        con.close()
    assert n == sync.records
    assert ("sync_cycle", "success") in stats
