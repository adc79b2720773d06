"""Streaming heavy hitters — Space-Saving counters in keyed state.

The batch surface has exact vocabulary top-k (q62) and the count-min
sketch (q117); on an unbounded stream neither works as-is: exact
counting needs unbounded state, and count-min alone cannot enumerate
WHICH tokens are heavy.  The streaming answer is the Space-Saving
algorithm (Metwally, Agrawal, El Abbadi, ICDT'05): per key group keep at
most ``capacity`` counters; a new token evicts the MINIMUM counter and
inherits its count as over-estimation error.  Guarantees, per group,
with N = total stream count:

- every token with true count > N / capacity is tracked (no false
  negatives above the threshold);
- for each tracked token: est - err <= true <= est.

State lives in the checkpointed state store via
``applyInPandasWithState`` (Arrow-batched, RocksDB-backed on a
cluster) as three parallel arrays — tokens, counts, errors — bounded at
``capacity`` entries per group, so state size is O(groups * capacity)
regardless of stream length (the same bounded-state discipline as
streaming_dedup_with_ttl).  Output mode append: each micro-batch emits
the group's current counter table; downstream takes the latest batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HH_OUTPUT_SCHEMA = "bucket string, token string, est bigint, err bigint"
HH_STATE_SCHEMA = "tokens array<string>, counts array<long>, errs array<long>"


def _make_update(capacity: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        tokens, counts, errs = (
            (list(state.get[0]), list(state.get[1]), list(state.get[2]))
            if state.exists
            else ([], [], [])
        )
        idx = {t: i for i, t in enumerate(tokens)}
        for pdf in pdfs:
            for tok in pdf["token"]:
                i = idx.get(tok)
                if i is not None:
                    counts[i] += 1
                elif len(tokens) < capacity:
                    idx[tok] = len(tokens)
                    tokens.append(tok)
                    counts.append(1)
                    errs.append(0)
                else:
                    # evict the minimum counter (ties: lowest index —
                    # deterministic), inherit its count as error
                    m = min(range(len(counts)), key=lambda j: (counts[j], j))
                    del idx[tokens[m]]
                    idx[tok] = m
                    tokens[m] = tok
                    errs[m] = counts[m]
                    counts[m] += 1
        state.update((tokens, counts, errs))
        yield pd.DataFrame(
            {
                "bucket": [key[0]] * len(tokens),
                "token": tokens,
                "est": counts,
                "err": errs,
            }
        )

    return update


def streaming_heavy_hitters(
    tokens: DataFrame, capacity: int = 8, bucket_col: str = "bucket"
) -> DataFrame:
    """Maintain Space-Saving heavy-hitter counters per ``bucket_col``
    group over a stream of (bucket, token) rows; emits each group's
    counter table every micro-batch.  Works on static frames too (one
    "batch" = the whole frame) for A/B tests against exact counts.
    """
    from datapipeline_dags_spark.shipping import ensure_package_shipped

    ensure_package_shipped(tokens.sparkSession)
    return tokens.groupBy(bucket_col).applyInPandasWithState(
        _make_update(capacity),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
