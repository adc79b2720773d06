"""Incremental watermark CDC sync — SURVEY ST3-ST5, S8/S9, K5/K7, P2/P3.

The reference's 5-minute PostgreSQL→MySQL sync
(postgresql_mysql_sync_dag.py:28-117):

  for each entity:
    (ts, id)  = last COMPLETED watermark from data_sync_stats   (S9)
    rows      = source WHERE ts > wm OR (ts = wm AND id > wm_id)
                ORDER BY id                                     (S8/P2)
    if rows:    STARTED → bulk upsert → COMPLETED(new watermark) (ST5)
    else:       NO_DATA                                          (P3)

Engine mapping: the watermark predicate is a pushed-down DataFrame
filter; the bulk insert is the set-based MERGE sink (idempotent), so
the protocol's at-least-once re-run after a crash is exactly-once in
effect; the bookkeeping table keeps the reference's observability.
The application-level watermark is deliberately kept (vs streaming
checkpoint offsets) — it is part of the reference's contract (ST4).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datapipeline_dags_spark.sinks.db import connect
from datapipeline_dags_spark.sinks.jdbc import (
    execute_statement,
    is_jdbc,
    query_rows,
    sql_literal,
    upsert_sink_for,
)

STARTED = "STARTED"
COMPLETED = "COMPLETED"
NO_DATA = "NO_DATA"

#: bookkeeping DDL — FIXTURES.md §B4 / postgresql_mysql_sync_dag.py:53-58
STATS_DDL = """
CREATE TABLE IF NOT EXISTS data_sync_stats (
  dag_run_id VARCHAR, entity_type VARCHAR, processing_ts TIMESTAMP,
  records_count BIGINT, from_id BIGINT, to_id BIGINT, status VARCHAR,
  logged_at TIMESTAMP DEFAULT now()
)
"""

EPOCH = dt.datetime(1970, 1, 1)


def _db_execute(db_path: str, sql: str) -> None:
    """Run bookkeeping DML on the sync-state store: a DuckDB file (the
    tested sandbox default) or, for a ``jdbc:`` target, the same target
    database the data lands in (the reference keeps data_sync_stats in
    the target MySQL — postgresql_mysql_sync_dag.py:53-58)."""
    if is_jdbc(db_path):
        from pyspark.sql import SparkSession

        execute_statement(SparkSession.getActiveSession(), db_path, sql)
    else:
        with connect(db_path) as con:
            con.execute(sql)


def _db_query(db_path: str, sql: str) -> list[tuple]:
    if is_jdbc(db_path):
        from pyspark.sql import SparkSession

        return query_rows(SparkSession.getActiveSession(), db_path, sql)
    with connect(db_path) as con:
        return con.execute(sql).fetchall()


@dataclass
class Watermark:
    ts: dt.datetime
    last_id: int


def fetch_watermark(db_path: str, entity: str) -> Watermark:
    """Last COMPLETED sync position for an entity (S9; reference
    fetch_latest_completed_sync_ts, postgresql_mysql_sync_dag.py:40)."""
    _db_execute(db_path, STATS_DDL)
    rows = _db_query(
        db_path,
        "SELECT processing_ts, to_id FROM data_sync_stats "
        f"WHERE entity_type = {sql_literal(entity)} "
        f"AND status = {sql_literal(COMPLETED)} "
        "ORDER BY logged_at DESC, processing_ts DESC LIMIT 1",
    )
    return Watermark(*rows[0]) if rows else Watermark(EPOCH, -1)


def _log(db_path: str, run_id: str, entity: str, status: str, *,
         ts: dt.datetime, count: int, from_id: int, to_id: int) -> None:
    _db_execute(db_path, STATS_DDL)
    values = ", ".join(
        sql_literal(v) for v in (run_id, entity, ts, count, from_id, to_id, status)
    )
    _db_execute(
        db_path,
        "INSERT INTO data_sync_stats (dag_run_id, entity_type, processing_ts,"
        f" records_count, from_id, to_id, status) VALUES ({values})",
    )


def watermark_scan(df: DataFrame, wm: Watermark, ts_col: str, id_col: str) -> DataFrame:
    """Strictly-newer rows with id tiebreak (P2/S8) — the predicate pushes
    to the source scan (parquet row-group pruning / JDBC subquery)."""
    return df.filter(
        (F.col(ts_col) > F.lit(wm.ts))
        | ((F.col(ts_col) == F.lit(wm.ts)) & (F.col(id_col) > wm.last_id))
    )


@dataclass
class SyncResult:
    entity: str
    status: str
    records: int
    watermark: Watermark


def sync_entity(
    source: Callable[[], DataFrame],
    db_path: str,
    entity: str,
    target_table: str,
    run_id: str,
    *,
    ts_col: str = "processing_ts",
    id_col: str = "id",
    crash_after_upsert: bool = False,
) -> SyncResult:
    """One sync cycle for one entity (reference execute_sync_process_func,
    postgresql_mysql_sync_dag.py:28-117).

    ``crash_after_upsert`` is a test hook simulating a crash between the
    data write and the COMPLETED bookkeeping row — the re-run re-reads
    the same window and the MERGE sink absorbs the duplicates (ST5).
    """
    wm = fetch_watermark(db_path, entity)
    batch = watermark_scan(source(), wm, ts_col, id_col)
    # batch statistics in ONE distributed aggregate (reference takes
    # len/first/last of the ordered row list, :51,61-62)
    stats = batch.agg(
        F.count("*").alias("n"),
        F.min(id_col).alias("from_id"),
        F.max(id_col).alias("to_id"),
        F.max(ts_col).alias("max_ts"),
        # watermark id PAIRED with the max ts (max id among rows whose ts
        # == max_ts), like the reference's ORDER-BY last row — a global
        # max id from a row with an older ts would make watermark_scan's
        # (ts == wm.ts AND id > last_id) branch skip legitimate rows when
        # ids are uncorrelated with processing_ts (update-style CDC)
        F.max_by(
            F.col(id_col), F.struct(F.col(ts_col), F.col(id_col))
        ).alias("wm_id"),
    ).collect()[0]
    if stats.n == 0:  # P3: non-empty guard
        _log(db_path, run_id, entity, NO_DATA,
             ts=wm.ts, count=0, from_id=wm.last_id, to_id=wm.last_id)
        return SyncResult(entity, NO_DATA, 0, wm)

    _log(db_path, run_id, entity, STARTED,
         ts=wm.ts, count=stats.n, from_id=stats.from_id, to_id=stats.to_id)
    sink = upsert_sink_for(db_path, target_table, keys=[id_col], order_by=ts_col)
    n = sink.write(batch)
    if crash_after_upsert:
        raise RuntimeError("simulated crash before COMPLETED")
    new_wm = Watermark(stats.max_ts, stats.wm_id)
    _log(db_path, run_id, entity, COMPLETED,
         ts=new_wm.ts, count=n, from_id=stats.from_id, to_id=new_wm.last_id)
    return SyncResult(entity, COMPLETED, n, new_wm)


def sync_all(
    sources: dict[str, Callable[[], DataFrame]],
    db_path: str,
    tables: dict[str, str],
    run_id: str,
    **kwargs,
) -> list[SyncResult]:
    """All entities in one cycle, isolating per-entity failures like the
    reference's broad try/except (postgresql_mysql_sync_dag.py:111-112)."""
    out = []
    for entity, src in sources.items():
        try:
            out.append(sync_entity(src, db_path, entity, tables[entity], run_id, **kwargs))
        except Exception as exc:  # noqa: BLE001 — per-entity isolation
            out.append(SyncResult(entity, f"ERROR: {exc}", 0, fetch_watermark(db_path, entity)))
    return out
