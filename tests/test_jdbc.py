"""JDBC transport unit tests — everything verifiable WITHOUT a server:
reader options, pushed-down watermark subqueries (cross-checked against
watermark_scan's DataFrame semantics via DuckDB), per-dialect MERGE SQL,
literal rendering, and backend selection by URL scheme."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from datapipeline_dags_spark.sinks.jdbc import (
    JdbcUpsertSink,
    dialect_of,
    is_jdbc,
    jdbc_read_options,
    merge_sql,
    quote_ident,
    sql_literal,
    upsert_sink_for,
    watermark_predicate,
)
from datapipeline_dags_spark.sinks.sync import Watermark, watermark_scan
from datapipeline_dags_spark.sinks.upsert import UpsertSink

PG = "jdbc:postgresql://db.example:5432/app"
MY = "jdbc:mysql://db.example:3306/app"


def test_scheme_detection_and_dialects():
    assert is_jdbc(PG) and is_jdbc(MY)
    assert not is_jdbc("/tmp/target.duckdb")
    assert dialect_of(PG) == "postgresql"
    assert dialect_of(MY) == "mysql"
    with pytest.raises(ValueError):
        dialect_of("jdbc:oracle:thin:@x")


def test_factory_selects_backend_by_scheme(tmp_path):
    j = upsert_sink_for(PG, "contacts", ["id"], "ts")
    assert isinstance(j, JdbcUpsertSink) and j.staging_table == "contacts__stage"
    d = upsert_sink_for(str(tmp_path / "t.duckdb"), "contacts", ["id"], "ts")
    assert isinstance(d, UpsertSink)


def test_read_options_partitioned_with_pushed_predicate():
    opts = jdbc_read_options(
        PG,
        "contacts",
        predicate='"processing_ts" > TIMESTAMP \'2024-01-01 00:00:00\'',
        partition_column="id",
        num_partitions=32,
        lower_bound=0,
        upper_bound=1_000_000,
    )
    # the DB sees the predicate inside the scan subquery (server-side)
    assert opts["dbtable"].startswith('(SELECT * FROM "contacts" WHERE ')
    assert "processing_ts" in opts["dbtable"]
    # and the scan is 32 parallel range queries, not one connection
    assert opts["numPartitions"] == "32"
    assert (opts["lowerBound"], opts["upperBound"]) == ("0", "1000000")
    with pytest.raises(ValueError):
        jdbc_read_options(PG, "t", partition_column="id")  # bounds required


def test_identifier_validation_blocks_injection():
    with pytest.raises(ValueError):
        quote_ident('x"; DROP TABLE y; --')
    with pytest.raises(ValueError):
        watermark_predicate("2024-01-01'; DROP", 0, "ts", "id")


def test_watermark_predicate_matches_dataframe_semantics(spark):
    """The SQL text shipped to the database must select EXACTLY the rows
    watermark_scan's DataFrame filter selects."""
    wm = Watermark(dt.datetime(2024, 1, 2), 5)
    rows = [
        (1, dt.datetime(2024, 1, 1)),   # older ts -> out
        (9, dt.datetime(2024, 1, 2)),   # ts == wm, id > 5 -> in
        (3, dt.datetime(2024, 1, 2)),   # ts == wm, id <= 5 -> out
        (2, dt.datetime(2024, 1, 3)),   # newer ts -> in
    ]
    df = spark.createDataFrame(rows, "id long, processing_ts timestamp")
    expect = sorted(
        r.id for r in watermark_scan(df, wm, "processing_ts", "id").collect()
    )

    pred = watermark_predicate(wm.ts.isoformat(sep=" "), wm.last_id, "processing_ts", "id")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, processing_ts TIMESTAMP)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got = sorted(r[0] for r in con.execute(f"SELECT id FROM t WHERE {pred}").fetchall())
    assert got == expect == [2, 9]


def test_merge_sql_per_dialect():
    pg = merge_sql("postgresql", "contacts", "contacts__stage", ["id", "name", "ts"], ["id"])
    assert 'ON CONFLICT ("id") DO UPDATE SET' in pg
    assert '"name" = excluded."name"' in pg and '"ts" = excluded."ts"' in pg
    assert pg.count("INSERT") == 1  # ONE set-based statement

    my = merge_sql("mysql", "contacts", "contacts__stage", ["id", "name"], ["id"])
    assert "ON DUPLICATE KEY UPDATE" in my and '"name" = new."name"' in my
    with pytest.raises(ValueError):
        merge_sql("sqlite", "t", "s", ["id"], ["id"])


def test_sql_literal_portable_forms():
    assert sql_literal(None) == "NULL"
    assert sql_literal(True) == "TRUE"
    assert sql_literal(42) == "42"
    assert sql_literal("O'Hara") == "'O''Hara'"
    assert (
        sql_literal(dt.datetime(2024, 1, 2, 3, 4, 5))
        == "TIMESTAMP '2024-01-02 03:04:05'"
    )
    with pytest.raises(TypeError):
        sql_literal(object())


def test_duckdb_sync_path_unaffected_by_factory(spark, tmp_path):
    """End-to-end guard: the factory-routed DuckDB backend still syncs."""
    from datapipeline_dags_spark.sinks.sync import COMPLETED, sync_entity

    db = str(tmp_path / "t.duckdb")
    src = lambda: spark.createDataFrame(  # noqa: E731
        [(1, dt.datetime(2024, 1, 1), "a")], "id long, processing_ts timestamp, v string"
    )
    res = sync_entity(src, db, "e", "sync_e", run_id="r1")
    assert res.status == COMPLETED and res.records == 1
