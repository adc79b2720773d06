"""Metrics sink — SURVEY K8 (the reference's stats-DB step timings).

The reference opens a MySQL stats connection and writes per-step
timing rows keyed by a stats id
(parallelized_data_pipeline_dag.py:20,99-100,104-119,194).  The
engine's analog: a Pipeline ``metrics_sink`` that appends one row per
task run into a ``pipeline_task_stats`` table in the target DB —
same observability contract, one set-based insert per run.
"""

from __future__ import annotations

from datapipeline_dags_spark.sinks.db import connect

STATS_DDL = """
CREATE TABLE IF NOT EXISTS pipeline_task_stats (
  run_id VARCHAR, task VARCHAR, state VARCHAR,
  attempts INTEGER, seconds DOUBLE, error VARCHAR,
  logged_at TIMESTAMP DEFAULT now()
)
"""


def metrics_to_db(db_path: str):
    """Build a ``metrics_sink`` for pipeline.scheduler.Pipeline that
    persists every task's state/attempts/wall-seconds."""

    def sink(result) -> None:
        rows = [
            [result.run_id, t.name, t.state, t.attempts, round(t.seconds, 3), t.error]
            for t in result.tasks.values()
        ]
        with connect(db_path) as con:
            con.execute(STATS_DDL)
            con.executemany(
                "INSERT INTO pipeline_task_stats (run_id, task, state, attempts,"
                " seconds, error) VALUES (?, ?, ?, ?, ?, ?)",
                rows,
            )

    return sink
