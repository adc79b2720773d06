"""Driver-contract shape of ``__spark_entry__``: the rotation must place
every never-driver-checked query inside the tail-50 window the driver
samples, with no dangling names (a misspelled rotation entry silently
shrinks the window — exactly the failure this file exists to catch)."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry  # noqa: E402


def test_rotation_names_all_registered():
    from datapipeline_dags_spark.plans.all import QUERIES

    unknown = [n for n in entry._ROTATION_TAIL if n not in QUERIES]
    assert not unknown, f"rotation names not in registry: {unknown}"


def test_rotation_preserves_registry():
    from datapipeline_dags_spark.plans.all import ORACLES, QUERIES

    qs = entry.queries()
    assert set(qs) == set(QUERIES)
    assert list(entry.oracle_sql()) == [n for n in qs if n in ORACLES]


def test_every_query_has_an_oracle():
    """124/124 hash-checked: since q91 gained its integer-SQL oracle no
    registered query is rows-only."""
    from datapipeline_dags_spark.plans.all import ORACLES, QUERIES

    missing = [n for n in QUERIES if n not in ORACLES]
    assert not missing, f"queries without oracles: {missing}"


def test_tail_window_covers_never_checked_queries():
    """Every query registered BEFORE this round that has no driver row
    must sit inside the tail-50 window; queries REGISTERED this round
    may overflow (they rotate in next round, and the full check_oracle
    sweep covers them meanwhile) — but only as the window-head spillover
    explicitly listed at the top of _ROTATION_TAIL."""
    covered: set[str] = set()
    for r in (1, 2, 3):
        p = os.path.join(REPO, f"CORRECTNESS_r0{r}.json")
        if os.path.exists(p):
            with open(p) as f:
                covered |= set(json.load(f))
    if not covered:  # artifacts not present (fresh clone) — nothing to pin
        return
    qs = list(entry.queries())
    window = set(qs[-50:])
    import re

    new_this_round = {
        n for n in qs if int(re.match(r"q(\d+)", n).group(1)) >= 125
    }
    stale_old = [n for n in qs if n not in covered and n not in new_this_round]
    missing = [n for n in stale_old if n not in window]
    assert not missing, f"pre-round stale queries outside driver window: {missing}"
    overflow = [n for n in new_this_round if n not in window]
    assert all(n in entry._ROTATION_TAIL for n in overflow), overflow
