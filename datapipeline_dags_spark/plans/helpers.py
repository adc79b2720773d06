"""Helpers shared by the query corpus.

Float discipline for oracle parity: any aggregate over non-integral
doubles is rounded and cast to DECIMAL on BOTH the Spark and DuckDB
side, because floating-point summation is order-dependent and Spark's
partition-parallel sums visit rows in a different order than DuckDB's.
Raw column passthroughs stay untouched (bit-identical from parquet).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column, scale: int = 2) -> Column:
    """Round a float aggregate — Spark side of the parity rule.

    Kept as DOUBLE (not DECIMAL): DuckDB's pandas conversion turns
    wide DECIMALs into float64, so double-with-fixed-rounding is the
    representation both engines agree on bit-for-bit.
    """
    return F.round(col, scale) + F.lit(0.0)  # +0.0 normalizes IEEE -0.0


def sql_dec(expr: str, scale: int = 2) -> str:
    """DuckDB side of the parity rule."""
    return f"(ROUND({expr}, {scale}) + 0.0)"
