"""Table catalog over the driver-generated parquet testdata.

One DataFrame per table; lazy, columnar, with Catalyst pushdown —
replacing the reference's whole-file-in-memory JSON batches
(reference: parallelized_data_pipeline_dag.py:103-133).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (parquet, pushdown-capable).

    ``events.parquet`` has shipped with two physical layouts for ``ts``:
    parquet TIMESTAMP(NANOS) (read as LONG via the session factory's
    ``spark.sql.legacy.parquet.nanosAsLong``) and plain TIMESTAMP(MICROS)
    (read as TIMESTAMP_NTZ). Both normalize here to a microsecond
    TimestampType under the UTC session zone — lossless either way and
    parity-exact with the DuckDB oracle, regardless of which fixture
    generation is on disk.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # The driver calls us on a VANILLA session (no get_session), so the
        # factory-level conf may be absent — ensure it here as well. This is
        # a session-wide flag, but it is only ever set to one value, so the
        # mutation is idempotent, not order-dependent.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_event_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to microsecond TimestampType.

    Handles every layout the fixtures have used: raw nanos LONG
    (integer-divided — float division loses µs precision at 1.7e18 ns),
    TIMESTAMP_NTZ (reinterpreted in the UTC session zone, wall-clock
    preserved), or already TimestampType (no-op).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) on its join key.

    Bucketing pre-shuffles the data ONCE at write time; every subsequent
    equi-join or aggregation on the bucket key between co-bucketed
    tables runs with NO Exchange — at 100 TB that turns the nightly
    fact⋈fact join from a full-cluster shuffle into a map-side zip.
    Size ``n_buckets`` so one bucket ≈ one task's comfortable input
    (128–512 MB compressed at cluster scale).
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(name)


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
