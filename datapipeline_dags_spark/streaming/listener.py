"""Streaming query listener → stats DB (SURVEY K8 + K9 streaming side).

The reference instruments every step with wall-clock timings into a
stats DB and posts failures to a webhook (parallelized_data_pipeline_
dag.py:99-119, dag_utils.py:8-35).  For streaming queries the engine
equivalent is a ``StreamingQueryListener``: per-micro-batch progress
rows into the target DB, and a pluggable alert callback on abnormal
termination.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql.streaming import StreamingQueryListener

from datapipeline_dags_spark.sinks.db import connect

PROGRESS_DDL = """
CREATE TABLE IF NOT EXISTS streaming_batch_stats (
  query_id VARCHAR, run_id VARCHAR, batch_id BIGINT,
  num_input_rows BIGINT, batch_duration_ms BIGINT,
  logged_at TIMESTAMP DEFAULT now()
)
"""


class DbProgressListener(StreamingQueryListener):
    """Persist per-micro-batch progress; alert on failed termination."""

    def __init__(
        self, db_path: str, on_failure: Callable[[str, str], None] | None = None
    ) -> None:
        self.db_path = db_path
        self.on_failure = on_failure

    def onQueryStarted(self, event) -> None:  # noqa: N802 — Spark API
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        duration = (p.durationMs or {}).get("triggerExecution", -1)
        with connect(self.db_path) as con:
            con.execute(PROGRESS_DDL)
            con.execute(
                "INSERT INTO streaming_batch_stats (query_id, run_id, batch_id,"
                " num_input_rows, batch_duration_ms) VALUES (?, ?, ?, ?, ?)",
                [str(p.id), str(p.runId), p.batchId, p.numInputRows, duration],
            )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        if event.exception is not None and self.on_failure is not None:
            self.on_failure(str(event.id), event.exception)
