"""Scheduler semantics: retries, fan-in triggers, failure hook, metrics
(SURVEY §2.9 ST2, §2.2 K8/K9 control-plane contract)."""

from __future__ import annotations

import threading
import time

import pytest

from datapipeline_dags_spark.pipeline.scheduler import ALL_DONE, Pipeline


def test_topological_order_and_context_passing():
    order = []
    p = Pipeline("t")
    p.task("a", lambda ctx: order.append("a") or 1)
    p.task("b", lambda ctx: order.append("b") or ctx["a"] + 1, deps=["a"])
    p.task("c", lambda ctx: order.append("c") or ctx["b"] + 1, deps=["b"])
    res = p.run()
    assert res.ok and order == ["a", "b", "c"]
    assert res.tasks["c"].result == 3


def test_retries_then_success():
    calls = {"n": 0}

    def flaky(ctx):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "done"

    p = Pipeline("t")
    p.task("flaky", flaky, retries=2)
    res = p.run()
    assert res.ok and res.tasks["flaky"].attempts == 3


def test_all_success_fanin_blocks_on_failure_and_hook_fires():
    alerts = []
    p = Pipeline("t", on_failure=lambda task, exc, ctx: alerts.append((task, str(exc))))
    p.task("ok", lambda ctx: 1)
    p.task("boom", lambda ctx: 1 / 0)
    p.task("fanin", lambda ctx: "ran", deps=["ok", "boom"])
    res = p.run()
    assert not res.ok
    assert res.tasks["boom"].state == "failed"
    assert res.tasks["fanin"].state == "upstream_failed"
    assert alerts and alerts[0][0] == "boom"


def test_all_done_cleanup_runs_despite_failure():
    ran = []
    p = Pipeline("t")
    p.task("boom", lambda ctx: 1 / 0)
    p.task("cleanup", lambda ctx: ran.append(True), deps=["boom"], trigger=ALL_DONE)
    res = p.run()
    assert res.tasks["cleanup"].state == "success" and ran


def test_independent_tasks_run_in_parallel():
    gate = threading.Barrier(2, timeout=10)

    def waiter(ctx):
        gate.wait()  # deadlocks unless both tasks run concurrently
        return True

    p = Pipeline("t", max_workers=2)
    p.task("x", waiter)
    p.task("y", waiter)
    assert p.run().ok


def test_unknown_dep_and_duplicate_rejected():
    p = Pipeline("t")
    p.task("a", lambda ctx: 1)
    with pytest.raises(ValueError):
        p.task("b", lambda ctx: 1, deps=["nope"])
    with pytest.raises(ValueError):
        p.task("a", lambda ctx: 1)


def test_metrics_sink_receives_timings():
    seen = {}
    p = Pipeline("t", metrics_sink=lambda r: seen.update(r.metrics()))
    p.task("a", lambda ctx: time.sleep(0.01))
    p.run()
    assert "a" in seen and seen["a"] >= 0.01
