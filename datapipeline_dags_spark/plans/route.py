"""Count-gated collect-and-solve routing (VERDICT r9 ask #4).

Several iterative solvers (q183 PageRank, q221 Bradley–Terry, q225
set-cover, q294 HITS) share one route shape: when the aggregated state
table fits a named row gate, the iteration solves DRIVER-SIDE (numpy /
pure-python over one collect of the checkpointed frame — bit-equal to
the distributed loop by integer floor arithmetic), and above the gate
the unchanged distributed join+agg loop runs.  Two smaller queries
(q207 Markov attribution, q217 IPF raking) collect state that is
bounded by CONSTRUCTION (|channels|² / |nations|×|segments| cells), so
they have no distributed fallback — but their collects should be just
as observable and bound-checked.

This module is the single home for both shapes so that:

- the route decision is uniform (`collect_gate`), recorded in
  ``ROUTE_GATES`` for tests/tools to introspect, and overridable with
  ONE env knob (``SPARK_GRAFT_COLLECT_ROUTE=collected|distributed``) —
  the lever tools/scaling.py uses to measure BOTH routes of one query
  in one session;
- the q294 r8 lesson is encoded once: a gate sized between the x1 and
  x10 stress-fixture cardinalities makes the 10x SCALING ratio measure
  a ROUTE TRANSITION, not the algorithm (6M edges crossing a 2M gate
  read as 8x when the both-collected truth was 1.5x).
  ``tests/test_route_gates.py`` pins every registered gate against the
  measured x10 cardinalities;
- per-query gate constants stay in their plan modules (tests
  monkeypatch them there), but every probe goes through one code path.

The gates are sized in BROADCAST-TABLE units — a collected frame is
never bigger than a large broadcast join side (~160 MB) — so "fits on
the driver" holds wherever a broadcast join would.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, Row

#: Route audit trail: label -> {"gate": int, "rows": int | None,
#: "route": "collected" | "distributed" | "bounded", "forced": bool}.
#: Refreshed on every probe; read by tests and tools, never by plans.
ROUTE_GATES: dict[str, dict] = {}


def _forced_route() -> str | None:
    v = os.environ.get("SPARK_GRAFT_COLLECT_ROUTE", "").strip().lower()
    return v if v in ("collected", "distributed") else None


def collect_gate(frame: DataFrame, gate_rows: int, label: str) -> bool:
    """True → the caller should take the collected (driver-solve)
    route.  One count of ``frame`` — callers pass an already-
    materialized (checkpointed/persisted) frame so the probe is a
    cached-scan count, not a recompute.  The decision and inputs are
    recorded in ``ROUTE_GATES[label]``.

    ``SPARK_GRAFT_COLLECT_ROUTE=collected|distributed`` overrides the
    gate — the scaling harness uses it to measure both routes of one
    query under identical conditions.  A forced ``distributed`` pays no
    probe count; a forced ``collected`` still probes and ROUTES
    DISTRIBUTED when the frame exceeds the gate (probe_collect's
    correctness-over-knob rule, ADVICE r11 #3): the collected backends
    assert their bounds via ``bounded_collect``, so honoring the knob
    over-gate would crash mid-query instead of measuring.
    """
    forced = _forced_route()
    if forced == "distributed":
        ROUTE_GATES[label] = {
            "gate": gate_rows, "rows": None, "route": forced, "forced": True,
        }
        return False
    n = frame.count()
    # over the gate the collected backend's bound assertion would
    # raise — route distributed even under a forced-collected override
    route = "collected" if n <= gate_rows else "distributed"
    ROUTE_GATES[label] = {
        "gate": gate_rows, "rows": n, "route": route,
        "forced": forced == "collected" and route == "collected",
    }
    return route == "collected"


def collect_and_solve(
    frame: DataFrame,
    gate_rows: int,
    label: str,
    solve_fn: Callable[[DataFrame], DataFrame],
    fallback_fn: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """Route ``frame`` through the driver-side ``solve_fn`` when it
    fits ``gate_rows``, else through the distributed ``fallback_fn``.
    Both callables take the same frame and MUST produce bit-equal
    results (the per-query route-equality tests pin this)."""
    if collect_gate(frame, gate_rows, label):
        return solve_fn(frame)
    return fallback_fn(frame)


def probe_collect(
    frame: DataFrame, max_rows: int, label: str
) -> list[Row] | None:
    """Probe-or-fallback collect (q186's histogram shape): collect
    ``frame`` if it fits ``max_rows``, else return None — exceeding the
    cap is a ROUTE decision (take the distributed path), not an error,
    which is what distinguishes this from ``bounded_collect``.  One
    limit(max_rows + 1) scan; the outcome is recorded in
    ``ROUTE_GATES`` like every other driver-side materialization."""
    forced = _forced_route()
    if forced == "distributed":
        ROUTE_GATES[label] = {
            "gate": max_rows, "rows": None, "route": forced, "forced": True,
        }
        return None
    rows = frame.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        # over the cap the collected answer would be TRUNCATED, so even
        # a forced 'collected' override cannot take it — correctness
        # over the measurement knob
        ROUTE_GATES[label] = {
            "gate": max_rows, "rows": len(rows), "route": "distributed",
            "forced": False,
        }
        return None
    ROUTE_GATES[label] = {
        "gate": max_rows, "rows": len(rows), "route": "collected",
        "forced": forced == "collected",
    }
    return rows


def bounded_collect(frame: DataFrame, max_rows: int, label: str) -> list[Row]:
    """Collect a frame whose size is bounded by CONSTRUCTION (a cells
    table over low-cardinality dimensions — q207's |channels|² Markov
    matrix, q217's |nations|×|segments| grid).  The bound is asserted,
    not assumed: a fixture or upstream change that breaks the
    construction argument fails loudly instead of silently growing the
    driver heap.  Recorded in ``ROUTE_GATES`` like the gated routes."""
    rows = frame.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"{label}: bounded_collect saw more than {max_rows} rows — "
            "the bounded-by-construction argument no longer holds"
        )
    ROUTE_GATES[label] = {
        "gate": max_rows, "rows": len(rows), "route": "bounded",
        "forced": False,
    }
    return rows
