"""Run manifest — the control metadata that flows between pipeline stages.

Replaces the reference's Airflow XCom pushes and DAG-run ``conf``
payloads (reference: parallelized_data_pipeline_dag.py:174,187-194,
215-218; sqs_sensor_dag.py:105-109).  In Spark there is one driver
process per run, so the manifest is a plain in-memory object handed to
every stage — no metadata-DB round trips, no re-parse per hop.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class FileRef:
    """A file location (reference message shape: {s3_bucket, s3_file_path,
    size} — sqs_sensor_dag.py:73-81).

    ``scheme`` selects the Hadoop filesystem: "s3a" against object
    storage (SURVEY S1), "" for local paths (S2) — the sandbox default.
    Every reader takes ``uri()`` so the S3/local split is one string.
    """

    bucket: str
    path: str
    size: int = -1
    scheme: str = ""

    def uri(self) -> str:
        if self.bucket:
            scheme = self.scheme or "s3a"
            return f"{scheme}://{self.bucket}/{self.path}"
        return self.path


@dataclass
class RunManifest:
    """Everything one pipeline run needs to know.

    ``mapping`` is the mapping-config fetched per
    (workflow_system_name, company_id) (reference:
    sqs_sensor_dag.py:100-103): entity -> list of
    {source, target, type} column mappings.
    """

    workflow_system_name: str
    company_id: str
    file_path: FileRef
    mapping: dict[str, list[dict[str, str]]] = field(default_factory=dict)
    run_id: str = field(default_factory=lambda: uuid.uuid4().hex)
    extra: dict[str, Any] = field(default_factory=dict)
