"""Candidate-bucket discipline for blocking-based near-dup operators.

Every pairwise near-dup operator in this engine (text MinHash/SimHash
bands, anchor blocking, image/video dHash bands) generates candidates
by grouping rows into buckets and pairing within each bucket.  At
100 TB the failure mode is always the same: one hot bucket (identical
docs, constant-color images, black video frames) goes quadratic in a
single task.  Two observable mitigations live here:

``cap_buckets``
    TRUNCATE an oversized bucket to its ``cap`` smallest members —
    bounded recall loss, observable, mirrored in the DuckDB oracle of
    the callers that use it (q41/q69-style contracts).

``chunk_buckets``
    DISTRIBUTE an oversized bucket's pair generation across ≤ cap²
    -sized chunk-pair tasks — zero recall loss, bounded per-task
    memory, the oracle needs no mirror (the exact pair set is
    unchanged; q42/q91/q174-style contracts).

Both attach {buckets, capped_buckets, max_bucket_size} counters via
``df.observe`` so a cap/fan-out firing is an observable event that
``sinks.metrics.record_bucket_observations`` persists as
``bucket_cap_stats`` rows — never a silent recall or latency cliff.

The default cap and the shared observation registry are module globals
here; ``plans.llm_ops`` re-exports both under its historical names and
passes its own (test-monkeypatchable) values through the thin wrappers
it keeps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

#: Default per-bucket member bound. Callers pass an explicit ``cap``
#: (plans.llm_ops forwards its own module global so tests can shrink
#: it); ``None`` falls back to this module's value at call time.
BUCKET_CAP = 1000

#: Observation per capped query, refreshed on every plan build — after
#: an action on the returned DataFrame, ``BUCKET_OBSERVATIONS[name].get``
#: yields {"buckets": n, "capped_buckets": n, "max_bucket_size": n}.
BUCKET_OBSERVATIONS: dict[str, Observation] = {}


def _observe(
    bucketed: DataFrame,
    name: str,
    size: Column,
    cap: int,
    observations: dict[str, Observation],
) -> DataFrame:
    obs = Observation()
    observations[name] = obs
    return bucketed.observe(
        obs,
        F.count(F.lit(1)).alias("buckets"),
        F.sum((size > cap).cast("long")).alias("capped_buckets"),
        F.max(size).alias("max_bucket_size"),
    )


def cap_buckets(
    bucketed: DataFrame,
    name: str,
    members_col: str,
    cap: int | None = None,
    observations: dict[str, Observation] | None = None,
) -> DataFrame:
    """Truncate oversized candidate buckets to their ``cap`` smallest
    members (natural array_sort order == doc-key order for the id /
    struct-with-leading-id members used here) and attach bucket counters
    via ``df.observe`` — computed as rows flow, no extra action/shuffle.
    """
    cap = BUCKET_CAP if cap is None else cap
    observations = BUCKET_OBSERVATIONS if observations is None else observations
    size = F.size(F.col(members_col))
    return _observe(bucketed, name, size, cap, observations).withColumn(
        members_col, F.slice(F.array_sort(F.col(members_col)), 1, cap)
    )


def chunk_buckets(
    bucketed: DataFrame,
    name: str,
    members_col: str,
    cap: int | None = None,
    observations: dict[str, Observation] | None = None,
) -> DataFrame:
    """Split each candidate bucket's (sorted) member array into chunks of
    ≤ cap and explode to one row per (chunk_i, chunk_j) pair with
    i ≤ j — so pair generation over an oversized bucket is DISTRIBUTED
    across ≤ cap² -sized tasks instead of truncated (zero recall loss,
    bounded per-task memory).  A bucket of m members becomes
    ceil(m/cap)·(ceil(m/cap)+1)/2 rows; small buckets (m ≤ cap) stay one
    row.  The same counters as ``cap_buckets`` attach via ``df.observe``
    — ``capped_buckets`` now counts buckets that *overflowed into
    chunks* (an observable fan-out event, no longer a recall event).

    Output columns: the bucket's grouping keys + ``ci``/``left`` and
    ``cj``/``right`` chunk arrays; ``ci == cj`` rows are intra-chunk
    (emit ordered pairs within ``left``), ``ci < cj`` rows are
    cross-chunk (emit the full left×right product — global member order
    is preserved because chunks are slices of one sorted array).
    Feed the result to ``chunk_pair_structs`` to materialize the pairs.
    """
    cap = BUCKET_CAP if cap is None else cap
    observations = BUCKET_OBSERVATIONS if observations is None else observations
    size = F.size(F.col(members_col))
    ids = F.array_sort(F.col(members_col))
    nchunks = F.ceil(size / F.lit(cap)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nchunks - 1),
        lambda i: F.slice(ids, i * cap + 1, cap),
    )
    observed = _observe(bucketed, name, size, cap, observations)
    keys = [c for c in bucketed.columns if c != members_col]
    lhs = observed.select(
        *keys, F.posexplode(chunks).alias("ci", "left"), chunks.alias("chunks")
    )
    return lhs.select(
        *keys, "ci", "left", F.posexplode("chunks").alias("cj", "right")
    ).filter(F.col("cj") >= F.col("ci"))


def chunk_pair_structs() -> Column:
    """Ordered member pairs of one ``chunk_buckets`` output row as an
    array of (a, b) structs: intra-chunk rows (ci == cj) pair within
    ``left`` preserving order; cross-chunk rows emit the full
    left×right product (a < b holds globally because chunks are slices
    of one sorted array).  Explode the result and read ``p.a``/``p.b``.
    """
    left, right = F.col("left"), F.col("right")
    intra = F.flatten(
        F.transform(
            left,
            lambda x, i: F.transform(
                F.slice(right, i + 2, F.size(right)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    cross = F.flatten(
        F.transform(
            left,
            lambda x: F.transform(right, lambda y: F.struct(x.alias("a"), y.alias("b"))),
        )
    )
    return F.when(F.col("ci") == F.col("cj"), intra).otherwise(cross)
