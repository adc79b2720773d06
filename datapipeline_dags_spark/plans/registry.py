"""Query registry: every declared operator (SURVEY.md §2) registers here.

``QUERIES[name]``  -> Callable[(SparkSession, sf_dir str), DataFrame]
``ORACLES[name]``  -> equivalent ANSI SQL for the DuckDB oracle, or absent
                      for genuinely non-SQL-expressible operators.

Column names are aliased identically on both sides — the driver's
correctness compare sorts columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
