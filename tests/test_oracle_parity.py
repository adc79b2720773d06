"""Differential test: every registered query with an oracle must match
DuckDB on row count, column names, and order-insensitive value hash —
the same contract as the driver's correctness gate (SURVEY.md §5.1)."""

from __future__ import annotations

import pytest

from datapipeline_dags_spark.oracle import compare_frames, duckdb_connection
from datapipeline_dags_spark.plans.all import ORACLES, QUERIES
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def oracle_con():
    return duckdb_connection(SF_DIR)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, oracle_con):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        # non-SQL-expressible operator: weaker check — runs and has stable schema
        assert sdf is not None
        return
    ddf = oracle_con.execute(ORACLES[name]).fetchdf()
    res = compare_frames(name, sdf, ddf)
    assert res.ok, res.detail
