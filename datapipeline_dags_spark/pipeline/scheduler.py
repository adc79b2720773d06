"""Thin DAG scheduler — the control plane replacing Airflow.

The reference's value here is orchestration semantics, not compute:
task dependencies, parallel branches, retries, ALL_SUCCESS fan-in,
failure alerting, and per-step timing metrics (reference:
parallelized_data_pipeline_dag.py:85-94,376-434; dag_utils.py:8-35).
This scheduler reproduces exactly those semantics in <300 LoC and
nothing more — Catalyst owns everything relational.

Tasks run on a thread pool: concurrently-ready tasks submit their
Spark actions in parallel, which Spark's scheduler interleaves across
the cluster (the idiomatic replacement for Airflow's parallel
PythonOperator branches, parallelized_data_pipeline_dag.py:433-434).
"""

from __future__ import annotations

import logging
import threading
import time
from collections.abc import Callable
from concurrent.futures import FIRST_COMPLETED, Future, ThreadPoolExecutor, wait
from dataclasses import dataclass, field
from typing import Any

log = logging.getLogger(__name__)

#: trigger rules (reference uses ALL_SUCCESS for the fan-in cleanup task
#: and ALL_DONE-like behavior in the failure callback)
ALL_SUCCESS = "all_success"
ALL_DONE = "all_done"


@dataclass
class Task:
    name: str
    fn: Callable[[dict[str, Any]], Any]  # receives {upstream task name: result}
    deps: tuple[str, ...] = ()
    retries: int = 0
    retry_delay_s: float = 0.0
    trigger: str = ALL_SUCCESS


@dataclass
class TaskRun:
    name: str
    state: str  # success | failed | upstream_failed | skipped
    attempts: int
    seconds: float
    error: str | None = None
    result: Any = None


@dataclass
class RunResult:
    run_id: str
    tasks: dict[str, TaskRun] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return all(t.state == "success" for t in self.tasks.values())

    def metrics(self) -> dict[str, float]:
        """Per-task wall seconds — the engine's analog of the reference's
        per-step timing rows (parallelized_data_pipeline_dag.py:104-119)."""
        return {t.name: round(t.seconds, 3) for t in self.tasks.values()}


class Pipeline:
    """A DAG of named tasks with retries, fan-in triggers, and hooks.

    ``on_failure(task_name, exc, context)`` is the pluggable alert
    callback (the reference posts to a Slack webhook and cleans temp
    files — dag_utils.py:8-35); ``metrics_sink(run_result)`` receives
    the finished run (the reference writes step timings to a stats DB,
    parallelized_data_pipeline_dag.py:99-100).
    """

    def __init__(
        self,
        name: str,
        *,
        max_workers: int = 4,
        on_failure: Callable[[str, BaseException, dict], None] | None = None,
        metrics_sink: Callable[[RunResult], None] | None = None,
    ) -> None:
        self.name = name
        self.max_workers = max_workers
        self.on_failure = on_failure
        self.metrics_sink = metrics_sink
        self._tasks: dict[str, Task] = {}

    def task(
        self,
        name: str,
        fn: Callable[[dict[str, Any]], Any],
        *,
        deps: tuple[str, ...] | list[str] = (),
        retries: int = 0,
        retry_delay_s: float = 0.0,
        trigger: str = ALL_SUCCESS,
    ) -> "Pipeline":
        if name in self._tasks:
            raise ValueError(f"duplicate task {name!r}")
        for d in deps:
            if d not in self._tasks:
                raise ValueError(f"task {name!r} depends on unknown task {d!r}")
        self._tasks[name] = Task(name, fn, tuple(deps), retries, retry_delay_s, trigger)
        return self

    # ------------------------------------------------------------------

    def _run_one(self, task: Task, context: dict[str, Any]) -> TaskRun:
        t0 = time.time()
        attempts = 0
        while True:
            attempts += 1
            try:
                result = task.fn(context)
                return TaskRun(task.name, "success", attempts, time.time() - t0, result=result)
            except Exception as exc:  # noqa: BLE001 — task isolation boundary
                if attempts <= task.retries:
                    log.warning("task %s attempt %d failed: %s — retrying", task.name, attempts, exc)
                    time.sleep(task.retry_delay_s)
                    continue
                if self.on_failure is not None:
                    try:
                        self.on_failure(task.name, exc, context)
                    except Exception:  # noqa: BLE001 — alert hook must not mask the task error
                        log.exception("on_failure hook raised")
                return TaskRun(task.name, "failed", attempts, time.time() - t0, error=str(exc))

    def run(self, run_id: str = "run", context: dict[str, Any] | None = None) -> RunResult:
        """Execute the DAG: topological order, ready tasks in parallel.

        A task with trigger ALL_SUCCESS runs only if every dependency
        succeeded (else it is marked upstream_failed); ALL_DONE runs
        once dependencies finished in any state (the cleanup pattern).
        """
        result = RunResult(run_id=run_id)
        ctx: dict[str, Any] = dict(context or {})
        lock = threading.Lock()
        pending = dict(self._tasks)
        running: dict[Future, str] = {}

        def ready(t: Task) -> bool:
            return all(d in result.tasks for d in t.deps)

        def runnable(t: Task) -> bool:
            if t.trigger == ALL_DONE:
                return True
            return all(result.tasks[d].state == "success" for d in t.deps)

        with ThreadPoolExecutor(max_workers=self.max_workers) as pool:
            while pending or running:
                progressed = False
                for name in [n for n, t in pending.items() if ready(t)]:
                    t = pending.pop(name)
                    progressed = True
                    if runnable(t):
                        running[pool.submit(self._run_one, t, ctx)] = name
                    else:
                        result.tasks[name] = TaskRun(name, "upstream_failed", 0, 0.0)
                if not running:
                    if pending and not progressed:
                        raise ValueError(
                            f"dependency cycle among tasks: {sorted(pending)}"
                        )
                    continue
                done, _ = wait(running, return_when=FIRST_COMPLETED)
                for fut in done:
                    name = running.pop(fut)
                    tr = fut.result()
                    with lock:
                        result.tasks[name] = tr
                        if tr.state == "success":
                            ctx[name] = tr.result
        if self.metrics_sink is not None:
            self.metrics_sink(result)
        return result
