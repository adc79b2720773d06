"""SparkSession factory tuned for both local testing and cluster scale.

Local mode is a single JVM with N threads; on a real cluster the same
config keys hold, only sizing differs.  AQE is on so that at 100 TB the
runtime re-plans skewed joins and coalesces small shuffle partitions
without manual tuning.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_session(
    app_name: str = "datapipeline_dags_spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or return) a SparkSession with scale-aware defaults.

    - ``spark.sql.adaptive.*``: runtime re-planning (skew join split,
      partition coalescing) — essential at 100 TB, harmless locally.
    - ``spark.sql.session.timeZone=UTC``: deterministic timestamp
      semantics and parity with the DuckDB oracle.
    - Arrow on: vectorized Python<->JVM transfer for the Pandas-UDF
      operators (similarity search, multimodal decode).
    """
    cpus = DEFAULT_CPUS
    # Runtime-settable SQL confs: re-applied via spark.conf.set when
    # getOrCreate returns a pre-existing session (builder confs would be
    # silently ignored on the second call in a process).
    sql_confs = {
        "spark.sql.shuffle.partitions": str(shuffle_partitions or cpus),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # events.parquet stores TIMESTAMP(NANOS); read as LONG once,
        # globally, instead of mutating session config per table read.
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    }
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in sql_confs.items():
        builder = builder.config(k, v)
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate may have returned an existing session whose builder-time
    # confs won; re-apply every runtime-settable conf so the caller's
    # request (e.g. tests asking for shuffle_partitions=8) takes effect.
    for k, v in {**sql_confs, **(extra_conf or {})}.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a live session (e.g. spark.driver.memory)
    spark.sparkContext.setLogLevel("WARN")
    return spark
