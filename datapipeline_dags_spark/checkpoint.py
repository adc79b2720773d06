"""Lineage-truncation helper for iterative loops, with plan capture.

Iterative operators (connected components, BPE training, PageRank)
MUST ``localCheckpoint`` each round or the logical plan and task
closures grow with the iteration count.  But checkpointing also hides
the per-round plan from audits: by the time ``tools/dump_plans.py``
inspects the returned DataFrame, every round is materialized and the
"plan" is a scan of checkpointed RDDs — 0 shuffles, 0 scans (the
PLANS.md blind spot VERDICT r5 ask #8 flags).

``local_checkpoint(df, label)`` is therefore the ONE call site for
iterative lineage cuts: normally identical to ``df.localCheckpoint()``,
but when an audit sets ``CAPTURE`` to a list, each round's
pre-checkpoint physical plan is appended as (label, plan_string) first
— so the audit sees the real per-round shuffle structure while the
loop still converges (observations and convergence probes keep riding
the checkpoint materialization exactly as before).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: When a list, every local_checkpoint() appends (label, physical plan
#: string) BEFORE materializing.  Audit-only; leave None in production.
CAPTURE: list[tuple[str, str]] | None = None


def local_checkpoint(df: DataFrame, label: str = "") -> DataFrame:
    if CAPTURE is not None:
        CAPTURE.append(
            (label, df._jdf.queryExecution().executedPlan().toString())
        )
    return df.localCheckpoint()
