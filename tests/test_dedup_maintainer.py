"""ExactDedupMaintainer — keeper state under insert/delete churn.

Pins the two retractions a drop-only dedup pipeline cannot express:
DISPLACEMENT (a lower id arrives — the old keeper stays live but
leaves the retained corpus) and SUCCESSION (the keeper is deleted —
the lowest live duplicate is promoted, q313 from state), plus
version-scoped delete→re-insert, same-tick arrival+deletion, crash
replay, compaction invisibility, and the matches_full audit.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipeline_dags_spark.streaming.index_maintenance import (
    ExactDedupMaintainer,
)

TEXT_A = "alpha beta gamma delta epsilon zeta"
TEXT_B = "one two three four five six"


@pytest.fixture()
def m(spark, tmp_path):
    return ExactDedupMaintainer(spark, str(tmp_path / "dedup"))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _dels(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id bigint")


def _keepers(m, bid):
    return {
        r["digest"]: (r["keeper"], r["n_copies"])
        for r in m.keepers(bid).collect()
    }


def test_displacement_succession_and_reinsert(spark, m):
    # tick 0: ids 50 (A), 60 (B) — both keepers of their groups
    m.process_batch(_docs(spark, [(50, TEXT_A), (60, TEXT_B)]), 0)
    k0 = _keepers(m, 0)
    assert {v[0] for v in k0.values()} == {50, 60}
    # tick 1: id 7 arrives with TEXT_A — DISPLACES 50
    m.process_batch(_docs(spark, [(7, TEXT_A)]), 1)
    k1 = _keepers(m, 1)
    a_digest = next(d for d, v in k1.items() if v[1] == 2)
    assert k1[a_digest] == (7, 2)
    retained = {r["doc_id"] for r in m.retained(1).collect()}
    assert 7 in retained and 50 not in retained and 60 in retained
    tr = {r["digest"]: r["status"] for r in m.transitions(0, 1).collect()}
    assert tr[a_digest] == "displaced"
    # tick 2: keeper 7 deleted — 50 PROMOTED back (succession)
    m.process_batch(_docs(spark, []), 2, deletes=_dels(spark, [7]))
    k2 = _keepers(m, 2)
    assert k2[a_digest] == (50, 1)
    tr2 = {r["digest"]: r["status"] for r in m.transitions(1, 2).collect()}
    assert tr2[a_digest] == "succeeded"
    # tick 3: 50 deleted too — group dissolves
    m.process_batch(_docs(spark, []), 3, deletes=_dels(spark, [50]))
    assert a_digest not in _keepers(m, 3)
    tr3 = {r["digest"]: r["status"] for r in m.transitions(2, 3).collect()}
    assert tr3[a_digest] == "dissolved"
    # tick 4: 50 RE-INSERTED — version-scoped tombstone lets it back
    m.process_batch(_docs(spark, [(50, TEXT_A)]), 4)
    assert _keepers(m, 4)[a_digest] == (50, 1)
    tr4 = {r["digest"]: r["status"] for r in m.transitions(3, 4).collect()}
    assert tr4[a_digest] == "new_group"


def test_same_tick_arrival_and_deletion_never_retained(spark, m):
    m.process_batch(
        _docs(spark, [(5, TEXT_A), (9, TEXT_B)]), 0, deletes=_dels(spark, [5])
    )
    retained = {r["doc_id"] for r in m.retained(0).collect()}
    assert retained == {9}


def test_crash_replay_and_compaction_invisible(spark, m):
    m.process_batch(_docs(spark, [(50, TEXT_A), (60, TEXT_B)]), 0)
    m.process_batch(_docs(spark, [(7, TEXT_A)]), 1, deletes=_dels(spark, [60]))
    before = sorted(map(tuple, m.keepers(1).collect()))
    # crash replay: the SAME tick re-processes (foreachBatch contract)
    m.process_batch(_docs(spark, [(7, TEXT_A)]), 1, deletes=_dels(spark, [60]))
    assert sorted(map(tuple, m.keepers(1).collect())) == before
    # compaction folds ticks < 2; reads stay bit-identical
    m.compact(2)
    assert sorted(map(tuple, m.keepers(1).collect())) == before
    # and the next tick composes on top of the compacted state
    m.process_batch(_docs(spark, [(3, TEXT_A)]), 2)
    k2 = _keepers(m, 2)
    a_digest = next(d for d, v in k2.items() if v[1] == 3)
    assert k2[a_digest][0] == 3


def test_matches_full_audit_over_churn(spark, m, sf_dir):
    from datapipeline_dags_spark.catalog import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    deleted = None
    for t in range(6):
        arr = docs.filter(F.col("doc_id") % 6 == t)
        dels = None
        if t in (2, 4):
            dels = docs.filter(
                (F.col("doc_id") % 6 < t) & (F.col("doc_id") % 11 == t)
            ).select("doc_id")
            deleted = dels if deleted is None else deleted.unionByName(dels)
        m.process_batch(arr, t, deletes=dels)
        if t == 3:
            m.compact(t + 1)
    live = docs.filter(F.col("doc_id") % 6 < 6)
    if deleted is not None:
        live = live.join(deleted, "doc_id", "left_anti")
    assert m.matches_full(5, live)
    # the retained view is exactly one live doc per digest group
    n_groups = (
        live.select(F.sha2("text", 256).alias("d")).distinct().count()
    )
    assert m.retained(5).count() == n_groups
