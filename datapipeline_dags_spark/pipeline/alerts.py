"""Failure alerting — webhook callback (SURVEY K9; dag_utils.py:8-35).

The reference posts task/dag/run-id/timestamp/log-URL to a Slack
webhook on task failure and cleans temp files.  The engine keeps the
same payload contract but takes the HTTP poster as an injectable
callable, so tests (and the sandbox) run without network."""

from __future__ import annotations

import datetime as dt
import json
import logging
import urllib.request
from collections.abc import Callable

log = logging.getLogger(__name__)


def alert_payload(pipeline: str, task: str, run_id: str, error: str) -> dict:
    """The reference's alert fields (dag_utils.py:14-27): task, dag,
    execution time, run id, and the failure reason."""
    return {
        "pipeline": pipeline,
        "task": task,
        "run_id": run_id,
        "failed_at": dt.datetime.now(dt.timezone.utc).isoformat(),
        "error": error,
    }


def http_poster(webhook_url: str) -> Callable[[dict], None]:
    """POST JSON to a webhook (the production poster)."""

    def post(payload: dict) -> None:
        req = urllib.request.Request(
            webhook_url,
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        urllib.request.urlopen(req, timeout=10)  # noqa: S310 — caller-supplied webhook

    return post


def failure_hook(
    pipeline: str,
    poster: Callable[[dict], None] | None = None,
    cleanup: Callable[[], None] | None = None,
):
    """Build a Pipeline ``on_failure`` hook: post the alert, then run the
    cleanup (mirrors dag_utils.py:29-35 which deletes temp input files
    before posting)."""

    def hook(task: str, exc: BaseException, context: dict) -> None:
        payload = alert_payload(pipeline, task, str(context.get("run_id", "?")), repr(exc))
        if cleanup is not None:
            try:
                cleanup()
            except Exception:  # noqa: BLE001
                log.exception("alert cleanup failed")
        if poster is not None:
            poster(payload)
        else:
            log.error("pipeline failure: %s", payload)

    return hook
