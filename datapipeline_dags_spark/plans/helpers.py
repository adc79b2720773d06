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


# ---------------------------------------------------------------------------
# Exact-percentile audit gate (VERDICT r4 ask #3)
#
# Spark's exact ``percentile`` buffers EVERY value of a group in one
# aggregation buffer; with a handful of groups (q154's 3 return flags,
# q141's 5 priorities) that is the whole corpus held in a handful of
# reducer tasks — fine at fixture scale, OOM at 100x.  The owners of
# that pattern take an ``exact_audit`` knob:
#
#   "exact"   — current behavior (the oracle-parity path; also what
#               "auto" resolves to at or below EXACT_AUDIT_MAX_ROWS,
#               so the driver gate at sf<=0.1 never changes plans)
#   "distributed" — the q186 ``distributed_percentiles`` route: still
#               EXACT (identical quantile_cont values) but max task
#               memory is one histogram bin, never the group; what
#               "auto" picks above the threshold for owners whose
#               inputs fit the (g, v) shape (q154, q141)
#   "sampled" — exact percentile over a deterministic md5-coin row
#               sample (the q58 coin: engine-reproducible, no RNG)
#               sized to ~EXACT_AUDIT_TARGET_ROWS rows; the auto scale
#               mode for entity-collapsed owners (q165, q167)
#   "auto"    — "exact" until the input exceeds EXACT_AUDIT_MAX_ROWS,
#               then the owner's scale_mode (the q96/q112 auto-select
#               pattern: the registered default IS the scale-safe path)
#
# q59 stays exempt by contract ("exact" is the operator; unbounded
# cardinality routes to q68), and the per-entity-collapsed medians
# (q165/q167) are bounded by |entities| before the percentile.
# ---------------------------------------------------------------------------

EXACT_AUDIT_MAX_ROWS = 5_000_000
EXACT_AUDIT_TARGET_ROWS = 1_000_000

_ROW_COUNT_CACHE: dict[tuple[str, str], int] = {}


def cached_count(df, cache_key: str) -> int:
    """One control-plane count per (session, key) — the corpus_size
    pattern (plans/llm_ops.py) for auto-mode scale decisions.

    Keyed on applicationId (stable for the session's lifetime, never
    reused the way a garbage-collected session object's ``id()`` can
    be).  ``clear_row_count_cache`` is the invalidation hook for
    callers that rewrite data at a cached path mid-session.
    """
    sess_key = (df.sparkSession.sparkContext.applicationId, cache_key)
    if sess_key not in _ROW_COUNT_CACHE:
        _ROW_COUNT_CACHE[sess_key] = df.count()
    return _ROW_COUNT_CACHE[sess_key]


def clear_row_count_cache() -> None:
    """Drop every cached auto-mode row count (e.g. after overwriting a
    parquet path whose count gates an ``exact_audit`` decision)."""
    _ROW_COUNT_CACHE.clear()


def resolve_exact_audit(
    mode: str, n_rows_fn, scale_mode: str = "sampled"
) -> str:
    """Resolve an ``exact_audit`` knob to 'exact', 'sampled', or
    'distributed'.

    ``scale_mode`` is what 'auto' picks ABOVE the threshold: owners
    whose percentile inputs fit the (g, v) shape route through the
    q186 ``distributed_percentiles`` machinery (still EXACT, bounded
    memory); the rest fall back to the md5-coin sample.  ``n_rows_fn``
    is called only in auto mode so pinned modes never pay the count
    job."""
    if mode == "auto":
        return scale_mode if n_rows_fn() > EXACT_AUDIT_MAX_ROWS else "exact"
    if mode not in ("exact", "sampled", "distributed"):
        raise ValueError(
            f"exact_audit must be auto|exact|sampled|distributed, got {mode!r}"
        )
    return mode


def exact_audit_frac(n_rows: int) -> float:
    """Keep-fraction sizing the sampled exact audit to
    ~EXACT_AUDIT_TARGET_ROWS rows (module global read at call time so
    tests can shrink it)."""
    return min(1.0, EXACT_AUDIT_TARGET_ROWS / max(n_rows, 1))


def md5_coin(key: Column, frac: float) -> Column:
    """Deterministic keep-coin: first 8 md5 hex chars of ``key`` as a
    uniform in [0, 2^32), kept when below ``frac`` of the range.  Same
    bytes both engines — the q58 sampling discipline.  The threshold
    rounds (not truncates) and clamps to >= 1 for any frac > 0, so a
    tiny keep-fraction can never produce the all-false coin whose
    empty sample would null out downstream percentiles."""
    u = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    if frac <= 0.0:
        return F.lit(False)
    return u < max(1, round(frac * 4294967296.0))
