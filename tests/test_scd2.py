"""SCD type-2 sink: history intervals, change detection, idempotency."""

from __future__ import annotations

import datetime

import duckdb

from datapipeline_dags_spark.sinks.scd2 import Scd2Sink


def ts(day: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, day)


def make_sink(tmp_path) -> Scd2Sink:
    return Scd2Sink(
        db_path=str(tmp_path / "dim.duckdb"),
        table="dim_customer",
        keys=["cust_id"],
        change_cols=["segment", "city"],
        ts_col="effective_ts",
    )


def rows(con_path: str):
    with duckdb.connect(con_path) as con:
        return con.execute(
            "SELECT cust_id, segment, city, valid_from, valid_to, is_current "
            "FROM dim_customer ORDER BY cust_id, valid_from"
        ).fetchall()


def test_scd2_history_and_idempotency(spark, tmp_path):
    sink = make_sink(tmp_path)
    schema = "cust_id long, segment string, city string, effective_ts timestamp"

    b1 = spark.createDataFrame(
        [(1, "GOLD", "OSLO", ts(1)), (2, "SILVER", "LIMA", ts(1))], schema
    )
    r1 = sink.write(b1)
    assert r1 == {"closed": 0, "opened": 2}

    # batch 2: cust 1 changes city; cust 2 unchanged; cust 3 is new.
    b2 = spark.createDataFrame(
        [
            (1, "GOLD", "BERGEN", ts(5)),
            (2, "SILVER", "LIMA", ts(5)),
            (3, "BRONZE", "PUNE", ts(5)),
        ],
        schema,
    )
    r2 = sink.write(b2)
    assert r2 == {"closed": 1, "opened": 2}  # close 1; open 1-v2 and 3-v1

    got = rows(sink.db_path)
    # cust 1: v1 closed at day 5, v2 current from day 5
    assert got[0] == (1, "GOLD", "OSLO", ts(1), ts(5), False)
    assert got[1] == (1, "GOLD", "BERGEN", ts(5), None, True)
    # cust 2: single untouched current version
    assert got[2] == (2, "SILVER", "LIMA", ts(1), None, True)
    # cust 3: new current version
    assert got[3] == (3, "BRONZE", "PUNE", ts(5), None, True)
    assert len(got) == 4

    # re-applying batch 2 is a no-op (at-least-once delivery safe)
    r3 = sink.write(b2)
    assert r3 == {"closed": 0, "opened": 0}
    assert rows(sink.db_path) == got


def test_scd2_in_batch_dupes_collapse_to_latest(spark, tmp_path):
    sink = make_sink(tmp_path)
    schema = "cust_id long, segment string, city string, effective_ts timestamp"
    b = spark.createDataFrame(
        [(1, "GOLD", "OSLO", ts(1)), (1, "GOLD", "BERGEN", ts(3))], schema
    )
    assert sink.write(b) == {"closed": 0, "opened": 1}
    got = rows(sink.db_path)
    assert got == [(1, "GOLD", "BERGEN", ts(3), None, True)]


def test_scd2_out_of_order_replay_is_ignored(spark, tmp_path):
    """Replaying an OLDER batch after a newer one must be a no-op:
    never close the newer current version (which would set valid_to <
    valid_from) nor reopen stale attributes as current."""
    sink = make_sink(tmp_path)
    schema = "cust_id long, segment string, city string, effective_ts timestamp"
    b_old = spark.createDataFrame([(1, "GOLD", "OSLO", ts(1))], schema)
    b_new = spark.createDataFrame([(1, "GOLD", "BERGEN", ts(5))], schema)
    sink.write(b_old)
    sink.write(b_new)
    snapshot = rows(sink.db_path)

    # stale replay: changed attrs but older effective_ts → ignored
    assert sink.write(b_old) == {"closed": 0, "opened": 0}
    assert rows(sink.db_path) == snapshot
    # current version is still the day-5 one with a valid interval
    cur = [r for r in snapshot if r[5]]
    assert cur == [(1, "GOLD", "BERGEN", ts(5), None, True)]


def test_scd2_null_safe_change_detection(spark, tmp_path):
    sink = make_sink(tmp_path)
    schema = "cust_id long, segment string, city string, effective_ts timestamp"
    sink.write(spark.createDataFrame([(1, "GOLD", None, ts(1))], schema))
    # NULL -> NULL is "unchanged"; NULL -> value is a change
    assert sink.write(spark.createDataFrame([(1, "GOLD", None, ts(2))], schema)) == {
        "closed": 0,
        "opened": 0,
    }
    assert sink.write(spark.createDataFrame([(1, "GOLD", "OSLO", ts(3))], schema)) == {
        "closed": 1,
        "opened": 1,
    }
