"""Differential-testing harness: Spark result vs DuckDB oracle.

Emulates the driver's correctness gate (SURVEY.md §5.1): row count,
column-name set, and an order-insensitive value hash over the rows with
columns sorted by name.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import duckdb
import pandas as pd

from datapipeline_dags_spark.catalog import TABLES


def canonical(df: pd.DataFrame) -> tuple[int, list[str], str]:
    """(row_count, sorted_columns, order-insensitive value hash)."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(tuple(repr(v) for v in row) for row in df.itertuples(index=False, name=None))
    h = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    return len(df), cols, h


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the testdata tables registered as views,
    mirroring the driver's oracle setup."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str
    rows: int = 0

    def __bool__(self) -> bool:
        return self.ok


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    sn, sc, sh = canonical(spark_pdf)
    dn, dc, dh = canonical(oracle_pdf)
    if sc != dc:
        return CompareResult(name, False, f"columns spark={sc} duckdb={dc}")
    if sn != dn:
        return CompareResult(name, False, f"rows spark={sn} duckdb={dn}")
    if sh != dh:
        sset = set(map(tuple, spark_pdf[sc].astype(str).values))
        dset = set(map(tuple, oracle_pdf[dc].astype(str).values))
        sample = list(sset - dset)[:2] + [("---",)] + list(dset - sset)[:2]
        return CompareResult(name, False, f"value hash mismatch; diff sample: {sample}")
    return CompareResult(name, True, f"hash={sh}", rows=sn)
