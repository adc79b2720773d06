"""SCD type-2 dimension sink — keyed history with [valid_from, valid_to)
effective intervals.

The reference's persist path overwrites rows in place (PersistStep /
keyed upsert, parallelized_data_pipeline_dag.py:322,345,
sqs_sync_verified_data_dag.py:52-58); warehouses that need to answer
"what did this dimension row look like when the order shipped?" keep
type-2 history instead.  This sink applies a batch of (key, attrs,
effective_ts) rows with the same distributed staging pattern as
UpsertSink (sinks/upsert.py): executors write parquet, then exactly TWO
set-based statements on the DB side —

1. CLOSE: current versions whose tracked attributes changed get
   ``valid_to = batch.effective_ts`` and lose the current flag.
2. OPEN: batch rows with no surviving current version (new keys, and
   the keys step 1 just closed) insert as the new current version.

Unchanged rows are untouched, so re-applying a batch is a no-op —
idempotent under the sync protocol's at-least-once re-runs (ST5).
Out-of-order replays are guarded: a batch row whose effective_ts is
older than the key's current ``valid_from`` is ignored (never closes a
newer version, never reopens stale attributes).
NULL-safe attribute comparison uses IS DISTINCT FROM.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datapipeline_dags_spark.sinks.db import connect, duck_type, staged_parquet


@dataclass
class Scd2Sink:
    """Type-2 history for ``table`` keyed on ``keys``; ``change_cols``
    are the tracked attributes; ``ts_col`` is the row's effective
    timestamp (becomes valid_from of the opened version)."""

    db_path: str
    table: str
    keys: list[str]
    change_cols: list[str]
    ts_col: str

    def _ddl(self, df: DataFrame) -> str:
        fields = {f.name: f for f in df.schema.fields}
        cols = ", ".join(
            f'"{c}" {duck_type(fields[c].dataType)}' for c in self.keys + self.change_cols
        )
        ts_t = duck_type(fields[self.ts_col].dataType)
        return (
            f'CREATE TABLE IF NOT EXISTS "{self.table}" ({cols}, '
            f'"valid_from" {ts_t}, "valid_to" {ts_t}, "is_current" BOOLEAN)'
        )

    def _dedupe(self, df: DataFrame) -> DataFrame:
        # One row per key per batch: keep the latest effective_ts.
        w = W.partitionBy(*self.keys).orderBy(F.col(self.ts_col).desc())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def write(self, df: DataFrame) -> dict[str, int]:
        """Apply one batch; returns {"closed": n, "opened": n}."""
        batch = self._dedupe(
            df.select(*self.keys, *self.change_cols, self.ts_col)
        )
        key_eq = " AND ".join(f't."{k}" = s."{k}"' for k in self.keys)
        changed = " OR ".join(
            f't."{c}" IS DISTINCT FROM s."{c}"' for c in self.change_cols
        )
        sel_cols = ", ".join(f's."{c}"' for c in self.keys + self.change_cols)
        with staged_parquet(batch) as glob:
            with connect(self.db_path) as con:
                con.execute(self._ddl(batch))
                # s.ts >= t.valid_from guards against out-of-order batches:
                # replaying an OLDER batch after a newer one must not close
                # the newer current version (valid_to < valid_from) nor
                # reopen stale attributes — stale rows are ignored, which is
                # the at-least-once re-run contract.
                closed = con.execute(
                    f'''
                    UPDATE "{self.table}" t
                    SET valid_to = s."{self.ts_col}", is_current = FALSE
                    FROM (SELECT * FROM read_parquet('{glob}')) s
                    WHERE {key_eq} AND t.is_current AND ({changed})
                      AND s."{self.ts_col}" >= t.valid_from
                    '''
                ).fetchone()
                opened = con.execute(
                    f'''
                    INSERT INTO "{self.table}"
                    SELECT {sel_cols}, s."{self.ts_col}" AS valid_from,
                           NULL AS valid_to, TRUE AS is_current
                    FROM (SELECT * FROM read_parquet('{glob}')) s
                    WHERE NOT EXISTS (
                      SELECT 1 FROM "{self.table}" t
                      WHERE {key_eq} AND t.is_current)
                      AND NOT EXISTS (
                      SELECT 1 FROM "{self.table}" t2
                      WHERE {key_eq.replace('t."', 't2."')}
                        AND t2.valid_from > s."{self.ts_col}")
                    '''
                ).fetchone()
        return {
            "closed": int(closed[0]) if closed else 0,
            "opened": int(opened[0]) if opened else 0,
        }
