"""Streaming ordered-pattern (CEP) matcher — ST14.

The batch surface has the window funnel (q187: deepest ordered prefix
of a stage sequence within a time budget).  On an unbounded stream the
same question is complex-event processing: per key, advance a cursor
through the pattern stages as matching events arrive IN EVENT ORDER,
count a match when the final stage lands within the time budget of the
first, and reset (counting an expiry) when the budget runs out
mid-pattern.

State is FOUR numbers per key regardless of stream length — cursor
stage, pattern-start timestamp, match count, expiry count — the
bounded-state discipline of streaming_dedup_with_ttl / ewma.py,
checkpointed via ``applyInPandasWithState``.  Idle-key eviction at
production scale follows stateful.py's TTL pattern (ProcessingTime
timeout); the op itself keeps NoTimeout so results are deterministic
under ``availableNow`` replays.

Determinism contract: rows fold in (seq) order inside each micro-batch,
so after ANY partitioning of the stream into batches the final state
equals the single-pass fold over the whole ordered stream — proven
cross-batch in tests/test_pattern_stream.py, the ewma.py property.

Non-matching events are ignored (they neither advance nor reset the
cursor); an event matching stage 0 while mid-pattern does NOT restart
the attempt — the cursor semantics of q187's "first qualifying chain".
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PATTERN_OUTPUT_SCHEMA = (
    "user string, stage int, n_matches bigint, n_expired bigint, n_events bigint"
)
PATTERN_STATE_SCHEMA = (
    "stage int, start_us long, n_matches long, n_expired long, n_events long"
)


def _make_update(pattern: tuple[str, ...], within_us: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        stage, start_us, n_matches, n_expired, n_events = (
            state.get if state.exists else (0, 0, 0, 0, 0)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("seq", kind="mergesort")
        for ch, ts_us in zip(rows["channel"], rows["ts_us"].astype(int)):
            n_events += 1
            if stage > 0 and ts_us - start_us > within_us:
                # budget ran out mid-pattern: this attempt expires, and
                # the current event starts fresh from stage 0
                stage = 0
                n_expired += 1
            if ch == pattern[stage]:
                if stage == 0:
                    start_us = ts_us
                stage += 1
                if stage == len(pattern):
                    n_matches += 1
                    stage = 0
        state.update((stage, start_us, n_matches, n_expired, n_events))
        yield pd.DataFrame(
            {
                "user": [str(key[0])],
                "stage": [stage],
                "n_matches": [n_matches],
                "n_expired": [n_expired],
                "n_events": [n_events],
            }
        )

    return update


def streaming_pattern_match(
    events: DataFrame,
    pattern: tuple[str, ...] = ("view", "click", "purchase"),
    within_seconds: int = 3600,
    key_col: str = "user",
) -> DataFrame:
    """Match an ordered channel ``pattern`` per key over a stream of
    (user, seq, ts_us, channel) rows within a ``within_seconds`` budget
    measured from the stage-0 event; emit the running cursor stage,
    completed-match count, and expiry count each micro-batch.  ``seq``
    is the event-order key — folding in seq order makes the result
    independent of micro-batch boundaries."""
    from datapipeline_dags_spark.shipping import ensure_package_shipped

    ensure_package_shipped(events.sparkSession)
    return events.groupBy(key_col).applyInPandasWithState(
        _make_update(tuple(pattern), within_seconds * 1_000_000),
        outputStructType=PATTERN_OUTPUT_SCHEMA,
        stateStructType=PATTERN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
