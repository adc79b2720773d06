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


BUCKET_CAP_DDL = """
CREATE TABLE IF NOT EXISTS bucket_cap_stats (
  run_id VARCHAR, query VARCHAR, buckets BIGINT,
  capped_buckets BIGINT, max_bucket_size BIGINT,
  logged_at TIMESTAMP DEFAULT now()
)
"""


def record_bucket_observations(db_path: str, run_id: str, observations=None) -> int:
    """Persist the blocking-family candidate-bucket counters
    (llm_ops.BUCKET_OBSERVATIONS — buckets / capped_buckets /
    max_bucket_size per query) as rows in ``bucket_cap_stats``, next to
    the ``pipeline_task_stats`` timings, so a cap that fired (= bounded
    recall loss in q41/q42/q69/q80/q86) is queryable after the run, not
    just visible in process memory.

    Call AFTER the actions that execute the capped plans — an
    ``Observation`` whose plan never ran blocks on ``.get``; such
    entries are skipped (a registered-but-never-executed query is not an
    observation).  Returns the number of rows written.
    """
    if observations is None:
        from datapipeline_dags_spark.plans.llm_ops import BUCKET_OBSERVATIONS

        observations = BUCKET_OBSERVATIONS
    rows = []
    for query, obs in observations.items():
        # Observation.get blocks until the action completes; drain only
        # observations whose action already finished (JVM getRowOrEmpty
        # is the non-blocking completion probe).
        jo = getattr(obs, "_jo", None)
        if jo is None or jo.getRowOrEmpty().isEmpty():
            continue
        vals = obs.get
        rows.append(
            [
                run_id,
                query,
                vals.get("buckets"),
                vals.get("capped_buckets"),
                vals.get("max_bucket_size"),
            ]
        )
    if rows:
        with connect(db_path) as con:
            con.execute(BUCKET_CAP_DDL)
            con.executemany(
                "INSERT INTO bucket_cap_stats (run_id, query, buckets,"
                " capped_buckets, max_bucket_size) VALUES (?, ?, ?, ?, ?)",
                rows,
            )
    return len(rows)


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
