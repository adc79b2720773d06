"""Sink + sync protocol tests (SURVEY §5.4, FIXTURES §B5):

- MERGE upsert: insert/update split, in-batch dedupe, idempotent re-apply
- verified-data consumer: set-based update, unknown keys ignored
- incremental sync: randomized arrival batches → exactly-once delivery,
  monotone watermark, STARTED/COMPLETED/NO_DATA rows, crash-rerun resume
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from datapipeline_dags_spark.sinks.sync import (
    COMPLETED,
    NO_DATA,
    STARTED,
    fetch_watermark,
    sync_entity,
)
from datapipeline_dags_spark.sinks.upsert import UpsertSink, apply_verified_updates


def q(db, sql):
    con = duckdb.connect(db)
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


@pytest.fixture()
def db(tmp_path):
    return str(tmp_path / "target.duckdb")


def contacts_df(spark, rows):
    return spark.createDataFrame(
        rows, "company_id string, external_id string, name string, verified_data string"
    )


def test_upsert_inserts_then_updates(spark, db):
    sink = UpsertSink(db, "verified_contact", keys=["company_id", "external_id"])
    n = sink.write(contacts_df(spark, [("c1", "x1", "Ada", "{}"), ("c1", "x2", "Grace", "{}")]))
    assert n == 2
    # update one, insert one — write() reports the MERGE's changes count
    n2 = sink.write(contacts_df(spark, [("c1", "x1", "Ada L.", "{}"), ("c1", "x3", "Edsger", "{}")]))
    assert n2 == 2
    rows = dict((r[1], r[2]) for r in q(db, "SELECT * FROM verified_contact ORDER BY external_id"))
    assert rows == {"x1": "Ada L.", "x2": "Grace", "x3": "Edsger"}


def test_upsert_dedupes_within_batch_and_is_idempotent(spark, db):
    sink = UpsertSink(db, "t", keys=["external_id"], order_by="name")
    df = spark.createDataFrame(
        [("x1", "a"), ("x1", "z"), ("x2", "m")], "external_id string, name string"
    )
    sink.write(df)
    assert q(db, "SELECT name FROM t WHERE external_id='x1'") == [("z",)]  # keep-highest
    sink.write(df)  # re-apply: no dupes, same state
    assert q(db, "SELECT COUNT(*) FROM t") == [(2,)]


def test_verified_updates_set_based(spark, db):
    sink = UpsertSink(db, "verified_contact", keys=["company_id", "external_id"])
    sink.write(contacts_df(spark, [("c1", "x1", "Ada", "{}"), ("c1", "x2", "Grace", "{}")]))
    msgs = spark.createDataFrame(
        [
            ("contact", "c1", "x1", '{"ok": true}'),
            ("contact", "c1", "nope", '{"ok": true}'),  # unknown key: ignored
            ("transaction", "c1", "x2", '{"ok": true}'),  # other entity: not applied here
        ],
        "entity string, company_id string, external_id string, verified_data string",
    )
    counts = apply_verified_updates(db, msgs, {"contact": "verified_contact"})
    assert counts == {"contact": 1}
    rows = dict((r[1], r[3]) for r in q(db, "SELECT * FROM verified_contact"))
    assert rows == {"x1": '{"ok": true}', "x2": "{}"}


# ---------------------------------------------------------------------------
# incremental watermark sync over the events fixture
# ---------------------------------------------------------------------------


def events_source(spark, sf_dir, upto_id):
    """Source visible up to event_id <= upto_id — simulates monotone
    appends to the system of record."""

    def read():
        from datapipeline_dags_spark.catalog import table

        ev = table(spark, sf_dir, "events").filter(F.col("event_id") <= upto_id)
        return ev.select("event_id", "ts", "user_id", "event_type", "value")

    return read


def test_incremental_sync_exactly_once_with_random_batches(spark, sf_dir, db):
    random.seed(7)
    cuts = sorted(random.sample(range(100, 900), 3)) + [1000]
    prev_wm = fetch_watermark(db, "events")
    synced = 0
    for i, cut in enumerate(cuts):
        res = sync_entity(
            events_source(spark, sf_dir, cut), db, "events", "sync_events",
            run_id=f"run{i}", ts_col="ts", id_col="event_id",
        )
        assert res.status == COMPLETED
        synced += res.records
        # watermark monotone
        assert (res.watermark.ts, res.watermark.last_id) >= (prev_wm.ts, prev_wm.last_id)
        prev_wm = res.watermark
        # exactly-once so far: target == source-so-far
        assert q(db, "SELECT COUNT(*), COUNT(DISTINCT event_id) FROM sync_events") == [
            (synced, synced)
        ]

    # NOTE: cuts are on event_id but the watermark is (ts, id); rows with
    # ts older than the watermark arriving late would be skipped — the
    # reference's protocol has the same contract (monotone appends).
    src_total = events_source(spark, sf_dir, 1000)().count()
    assert q(db, "SELECT COUNT(*) FROM sync_events")[0][0] <= src_total

    # no-new-data cycle: NO_DATA row, watermark unchanged
    res = sync_entity(
        events_source(spark, sf_dir, cuts[-1]), db, "events", "sync_events",
        run_id="run_idle", ts_col="ts", id_col="event_id",
    )
    assert res.status == NO_DATA
    assert (res.watermark.ts, res.watermark.last_id) == (prev_wm.ts, prev_wm.last_id)
    statuses = [r[0] for r in q(db, "SELECT status FROM data_sync_stats ORDER BY logged_at")]
    assert statuses.count(STARTED) == len(cuts)
    assert statuses.count(COMPLETED) == len(cuts)
    assert statuses[-1] == NO_DATA


def test_watermark_id_paired_with_max_ts_not_global_max(spark, db):
    """Update-style CDC: ids uncorrelated with processing_ts.  The
    watermark id must come from the row carrying the max ts (reference
    takes the ORDER-BY-id last row's own pair) — a GLOBAL max id would
    make the (ts == wm.ts AND id > last_id) branch permanently skip a
    row later committed with ts == max_ts and a smaller id."""
    import datetime as dt

    t1, t2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
    schema = "id long, processing_ts timestamp, payload string"

    def src(rows):
        return lambda: spark.createDataFrame(rows, schema)

    r1 = sync_entity(
        src([(10, t1, "a"), (5, t2, "b")]), db, "cdc", "sync_cdc", run_id="r1"
    )
    assert r1.status == COMPLETED
    # paired watermark: (t2, 5) — NOT (t2, 10)
    assert (r1.watermark.ts, r1.watermark.last_id) == (t2, 5)

    # a row committed later with ts == t2, id between 5 and 10 must sync
    r2 = sync_entity(
        src([(10, t1, "a"), (5, t2, "b"), (7, t2, "c")]),
        db, "cdc", "sync_cdc", run_id="r2",
    )
    assert r2.status == COMPLETED and r2.records == 1
    assert q(db, "SELECT COUNT(*) FROM sync_cdc") == [(3,)]


def test_crash_rerun_resumes_exactly_once(spark, sf_dir, db):
    # first cycle: crash after the upsert but before COMPLETED
    with pytest.raises(RuntimeError, match="simulated crash"):
        sync_entity(
            events_source(spark, sf_dir, 500), db, "events", "sync_events",
            run_id="crash", ts_col="ts", id_col="event_id", crash_after_upsert=True,
        )
    # bookkeeping shows STARTED without COMPLETED; data WAS written
    assert q(db, "SELECT status FROM data_sync_stats") == [(STARTED,)]
    n_after_crash = q(db, "SELECT COUNT(*) FROM sync_events")[0][0]
    assert n_after_crash > 0

    # re-run: re-reads the same window from the last COMPLETED (none ->
    # epoch), MERGE absorbs duplicates -> exactly once
    res = sync_entity(
        events_source(spark, sf_dir, 500), db, "events", "sync_events",
        run_id="rerun", ts_col="ts", id_col="event_id",
    )
    assert res.status == COMPLETED
    assert q(db, "SELECT COUNT(*), COUNT(DISTINCT event_id) FROM sync_events") == [
        (n_after_crash, n_after_crash)
    ]

    # subsequent cycle continues from the new watermark
    res2 = sync_entity(
        events_source(spark, sf_dir, 800), db, "events", "sync_events",
        run_id="next", ts_col="ts", id_col="event_id",
    )
    assert res2.status == COMPLETED
    total = q(db, "SELECT COUNT(*) FROM sync_events")[0][0]
    assert total == q(db, "SELECT COUNT(DISTINCT event_id) FROM sync_events")[0][0]
