"""Skew-handling join utility — the 100 TB hot-key escape hatch.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions.  It cannot help when
a SINGLE key's rows exceed what one task can process against the other
side — the classic hot-key join.  ``salted_join`` implements the
standard fix: spray the large side's hot keys across N salt buckets and
replicate the small side N× so every bucket can still match.

Cost model: small side inflates N×, large side gets an extra narrow
column — worth it only when a key's row count ≫ a task's capacity.
Result is EXACTLY the plain join's result for inner/left joins (salt
columns never leak).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_expr(columns: list[str], salt_n: int):
    """Deterministic per-row salt in [0, salt_n): a pure function of the
    row's column values, so a task retry / AQE repartition / speculative
    duplicate recomputes the SAME salt (F.rand(seed) is only stable for a
    fixed partition layout — a replay could mis-route rows mid-join)."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in columns], F.lit("salted_join")),
        F.lit(salt_n),
    ).cast("int")


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    how: str = "inner",
    salt_n: int = 16,
) -> DataFrame:
    """Join a skewed ``large`` side to ``small`` with N-way key salting.

    ``how`` may be "inner" or "left" (left = large side preserved);
    semantics are identical to ``large.join(small, on, how)``.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (large side preserved)")
    if SALT_COL in large.columns or SALT_COL in small.columns:
        raise ValueError(f"{SALT_COL} column name is reserved")
    # xxhash64 over all non-key columns spreads a hot key's rows uniformly;
    # keys are excluded so the spread is independent of the join key value.
    non_key = [c for c in large.columns if c not in on] or on
    salted_large = large.withColumn(SALT_COL, salt_expr(non_key, salt_n))
    replicated_small = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    return salted_large.join(replicated_small, [*on, SALT_COL], how).drop(SALT_COL)
