"""Table-maintenance operators: small-file compaction and range-
clustered rewrites.

The reference stages every hop as one-file JSON blobs
(parallelized_data_pipeline_dag.py:196-201) — at lake scale the
equivalent failure mode is millions of small parquet files (one per
micro-batch per partition) that drown the driver in file listings and
the scan in per-file overhead.  Two standard maintenance passes fix it:

- ``compact_parquet``: bin-pack a directory into ~target-size files
  (OPTIMIZE-style).  Runs per partition directory at scale; the rewrite
  is a plain distributed read→repartition→write followed by a
  directory swap.  NOTE the swap is NOT atomic for concurrent readers
  (see the function docstring) — production lakes get atomicity from a
  table format's manifest commit (Delta/Iceberg OPTIMIZE), not from
  renames.
- ``write_clustered``: range-partition + sort by the cluster columns so
  every output file owns a disjoint key range — parquet min/max footer
  stats then prune whole files for range predicates (the poor man's
  Z-order; exact for single-column clustering).
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def _parquet_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        out.extend(os.path.join(root, f) for f in files if f.endswith(".parquet"))
    return out


def compact_parquet(
    spark: SparkSession, path: str, target_file_bytes: int = 128 << 20
) -> dict[str, int]:
    """Rewrite ``path`` (a local/posix parquet dir) into
    ceil(total_bytes / target) files.  Returns before/after file counts.

    The data path is fully distributed (scan → round-robin repartition →
    write); only the directory swap is driver-side.  The two-rename swap
    leaves a brief window where ``path`` does not exist, and the old
    files are deleted right after — a reader that listed the old layout
    mid-swap can fail.  Safe for quiesced/maintenance-window use only;
    for concurrent readers use a table format whose manifest commit is
    atomic (Delta/Iceberg OPTIMIZE — the Spark plan is identical).
    """
    files = _parquet_files(path)
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = f"{path}.compact-{uuid.uuid4().hex[:8]}.tmp"
    df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    # atomic-ish swap: old dir moves aside, new dir takes its place
    bak = f"{path}.compact.bak"
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    return {
        "files_before": len(files),
        "files_after": len(_parquet_files(path)),
        "bytes": total,
    }


def write_clustered(
    df: DataFrame, path: str, cluster_cols: list[str], n_files: int
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-clustered on
    ``cluster_cols``: repartitionByRange gives each file a disjoint key
    range, sortWithinPartitions orders rows inside it, so footer min/max
    stats skip whole files (and row groups) for selective predicates."""
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_day_partitioned(
    df: DataFrame, path: str, ts_col: str = "ts", mode: str = "overwrite"
) -> None:
    """Write a DataFrame day-partitioned (``day=YYYY-MM-DD`` dirs) so
    downstream scans partition-prune on date predicates."""
    from pyspark.sql import functions as F

    (
        df.withColumn("day", F.date_format(F.col(ts_col), "yyyy-MM-dd"))
        .write.mode(mode)
        .partitionBy("day")
        .parquet(path)
    )


def overwrite_days(df: DataFrame, path: str, ts_col: str = "ts") -> None:
    """Dynamic-partition overwrite: replace ONLY the day partitions
    present in ``df``, leaving every other partition byte-identical —
    the standard incremental-backfill primitive (re-run one late or
    corrected day without touching the rest of the table).

    Implemented with Spark's native
    ``spark.sql.sources.partitionOverwriteMode=dynamic``, scoped to
    this write and restored afterwards (the static default would TRUNCATE
    the whole table).  At lake scale the same call shape maps to
    ``INSERT OVERWRITE ... PARTITION`` / Delta ``replaceWhere``.
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "dynamic")
    try:
        write_day_partitioned(df, path, ts_col=ts_col, mode="overwrite")
    finally:
        spark.conf.set(key, prev)
