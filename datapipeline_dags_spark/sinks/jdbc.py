"""Production JDBC transport — the reference's system of record is
PostgreSQL/MySQL over real connections (postgresql_mysql_sync_dag.py:
29-31,48-50,75-81); this module is the engine's equivalent path.

Selection is by URL scheme: a ``jdbc:postgresql://`` / ``jdbc:mysql://``
target routes through ``spark.read.jdbc`` / ``df.write.jdbc`` +
driver-side MERGE statements; any other target (a file path) keeps the
DuckDB stand-in in sinks/db.py, which is what the sandbox integration
tests exercise (no network here).  Everything that can be verified
without a server IS unit-tested: generated reader options, pushed-down
watermark subqueries, and per-dialect MERGE SQL (tests/test_jdbc.py).

Scale notes (the parts that matter on a 1000-executor cluster):

- **Reads are partitioned.**  ``jdbc_source`` exposes
  partitionColumn/lowerBound/upperBound/numPartitions so the scan is N
  parallel range queries, not one connection streaming the table
  through a single task.
- **Predicates are pushed INTO the database.**  The watermark window is
  compiled to SQL and wrapped as a dbtable subquery, so the DB ships
  only the delta — the reference's ``WHERE processing_ts > %s ...``
  (postgresql_mysql_sync_dag.py:48-50) runs server-side, same as here.
- **Writes are append-to-staging + ONE set-based MERGE.**  Executors
  append the batch to a staging table in parallel over JDBC; the merge
  into the target is a single statement (ON CONFLICT / ON DUPLICATE
  KEY), never per-row round trips.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_JDBC_RE = re.compile(r"^jdbc:(postgresql|mysql):")


def is_jdbc(target: str) -> bool:
    """True when ``target`` is a JDBC URL rather than a local DB file."""
    return target.startswith("jdbc:")


def dialect_of(url: str) -> str:
    """'postgresql' or 'mysql' (the two reference backends)."""
    m = _JDBC_RE.match(url)
    if not m:
        raise ValueError(f"unsupported JDBC url: {url}")
    return m.group(1)


def quote_ident(name: str) -> str:
    """Validate-and-quote an identifier (table/column).  Identifiers come
    from config, not user data — reject anything that needs escaping."""
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        raise ValueError(f"invalid SQL identifier: {name!r}")
    return f'"{name}"'


def watermark_predicate(ts: str, last_id: int, ts_col: str, id_col: str) -> str:
    """The incremental-scan window as DATABASE-side SQL — the same
    (ts, id) lexicographic predicate as sinks.sync.watermark_scan, but
    compiled to text so the DB evaluates it (reference
    postgresql_mysql_sync_dag.py:48-50).  ``ts`` must be an ISO-8601
    timestamp literal."""
    t, i = quote_ident(ts_col), quote_ident(id_col)
    if not re.fullmatch(r"[0-9T:\-\. ]+", ts):
        raise ValueError(f"invalid timestamp literal: {ts!r}")
    return (
        f"({t} > TIMESTAMP '{ts}' OR "
        f"({t} = TIMESTAMP '{ts}' AND {i} > {int(last_id)}))"
    )


def jdbc_read_options(
    url: str,
    table: str,
    *,
    predicate: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 1,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetchsize: int = 10_000,
) -> dict[str, str]:
    """Options for a partitioned, predicate-pushed JDBC scan — pure
    function so the unit tests can check exactly what the DB will see.

    ``predicate`` is wrapped into a dbtable subquery (evaluated
    server-side); with ``partition_column`` + bounds the scan becomes
    ``num_partitions`` parallel range queries.
    """
    dbtable = (
        f"(SELECT * FROM {quote_ident(table)} WHERE {predicate}) AS src"
        if predicate
        else quote_ident(table)
    )
    opts = {"url": url, "dbtable": dbtable, "fetchsize": str(fetchsize)}
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned read requires lower/upper bounds")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def jdbc_source(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    properties: dict[str, str] | None = None,
    **read_kwargs,
) -> DataFrame:
    """Partitioned JDBC read (see jdbc_read_options for the knobs).
    Plugs into sync_entity as the ``source`` callable:

        source = lambda: jdbc_source(spark, url, "contacts",
                                     predicate=watermark_predicate(...),
                                     partition_column="id",
                                     num_partitions=32, ...)
    """
    reader = spark.read.format("jdbc")
    for k, v in jdbc_read_options(url, table, **read_kwargs).items():
        reader = reader.option(k, v)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def merge_sql(
    dialect: str, table: str, staging: str, cols: list[str], keys: list[str]
) -> str:
    """ONE set-based upsert from staging into target, per dialect —
    the JDBC twin of UpsertSink's DuckDB statement."""
    collist = ", ".join(quote_ident(c) for c in cols)
    non_keys = [c for c in cols if c not in keys] or keys[:1]
    t, s = quote_ident(table), quote_ident(staging)
    if dialect == "postgresql":
        updates = ", ".join(
            f"{quote_ident(c)} = excluded.{quote_ident(c)}" for c in non_keys
        )
        conflict = ", ".join(quote_ident(k) for k in keys)
        return (
            f"INSERT INTO {t} ({collist}) SELECT {collist} FROM {s} "
            f"ON CONFLICT ({conflict}) DO UPDATE SET {updates}"
        )
    if dialect == "mysql":
        updates = ", ".join(
            f"{quote_ident(c)} = new.{quote_ident(c)}" for c in non_keys
        )
        return (
            f"INSERT INTO {t} ({collist}) SELECT {collist} FROM {s} AS new "
            f"ON DUPLICATE KEY UPDATE {updates}"
        )
    raise ValueError(f"unsupported dialect: {dialect}")


def execute_statement(
    spark: SparkSession, url: str, sql: str, properties: dict[str, str] | None = None
) -> int:
    """Run one driver-side DML statement over JDBC via the JVM's
    DriverManager (PySpark exposes no SQL-execution API).  Returns the
    statement's update count.  Network-dependent — exercised only
    against a real database, never in the sandbox."""
    props = spark._jvm.java.util.Properties()  # noqa: SLF001 — no public API
    for k, v in (properties or {}).items():
        props.setProperty(k, v)
    con = spark._jvm.java.sql.DriverManager.getConnection(url, props)  # noqa: SLF001
    try:
        stmt = con.createStatement()
        try:
            return int(stmt.executeUpdate(sql))
        finally:
            stmt.close()
    finally:
        con.close()


def query_rows(
    spark: SparkSession, url: str, sql: str, properties: dict[str, str] | None = None
) -> list[tuple]:
    """Driver-side SELECT over JDBC (bounded result sets only — sync
    bookkeeping reads ONE watermark row; bulk data goes through
    jdbc_source).  Network-dependent like execute_statement."""
    props = spark._jvm.java.util.Properties()  # noqa: SLF001
    for k, v in (properties or {}).items():
        props.setProperty(k, v)
    con = spark._jvm.java.sql.DriverManager.getConnection(url, props)  # noqa: SLF001
    try:
        stmt = con.createStatement()
        try:
            rs = stmt.executeQuery(sql)
            ncols = rs.getMetaData().getColumnCount()
            out = []
            while rs.next():
                out.append(tuple(rs.getObject(i) for i in range(1, ncols + 1)))
            return out
        finally:
            stmt.close()
    finally:
        con.close()


def sql_literal(v) -> str:
    """Render a Python value as a portable SQL literal (DuckDB, Postgres
    and MySQL all accept these forms) — lets the sync bookkeeping build
    ONE statement text that runs on any backend."""
    import datetime as dt

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, dt.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise TypeError(f"no SQL literal form for {type(v).__name__}")


@dataclass
class JdbcUpsertSink:
    """MERGE into ``table`` keyed on ``keys`` over JDBC — same contract
    as sinks.upsert.UpsertSink (same dedupe, same one-statement apply),
    selected by ``upsert_sink_for`` when the target is a JDBC URL.

    write(): executors APPEND the batch to ``<table>__stage`` in
    parallel (df.write.jdbc), then one per-dialect MERGE applies it and
    the staging table is dropped.  Idempotent like the DuckDB sink: a
    re-applied batch merges to a no-op.
    """

    url: str
    table: str
    keys: list[str]
    order_by: str | None = None
    properties: dict[str, str] = field(default_factory=dict)

    @property
    def staging_table(self) -> str:
        return f"{self.table}__stage"

    def write(self, df: DataFrame) -> int:
        from datapipeline_dags_spark.sinks.upsert import dedupe_keyed

        batch = dedupe_keyed(df, self.keys, self.order_by)
        cols = [f.name for f in batch.schema.fields]
        spark = batch.sparkSession
        batch.write.mode("overwrite").jdbc(
            self.url, self.staging_table, properties=self.properties
        )
        try:
            return execute_statement(
                spark,
                self.url,
                merge_sql(
                    dialect_of(self.url), self.table, self.staging_table, cols, self.keys
                ),
                self.properties,
            )
        finally:
            execute_statement(
                spark,
                self.url,
                f"DROP TABLE IF EXISTS {quote_ident(self.staging_table)}",
                self.properties,
            )


def upsert_sink_for(
    target: str,
    table: str,
    keys: list[str],
    order_by: str | None = None,
    properties: dict[str, str] | None = None,
):
    """Backend factory: JDBC URL -> JdbcUpsertSink, file path -> the
    DuckDB UpsertSink.  sync_entity calls this, so the sync job runs
    unchanged against either backend."""
    if is_jdbc(target):
        return JdbcUpsertSink(target, table, keys, order_by, properties or {})
    from datapipeline_dags_spark.sinks.upsert import UpsertSink

    return UpsertSink(target, table, keys, order_by)
