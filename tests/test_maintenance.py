"""Compaction + range-clustered writes: file counts, data fidelity,
and the disjoint min/max ranges that make footer-stat pruning work."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from datapipeline_dags_spark.operators.maintenance import (
    _parquet_files,
    compact_parquet,
    write_clustered,
)


def test_compact_parquet_binpacks_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    # 40 tiny files
    spark.range(0, 4000).repartition(40).write.parquet(path)
    assert len(_parquet_files(path)) == 40
    before = spark.read.parquet(path).groupBy().sum("id").first()[0]

    stats = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert stats["files_before"] == 40
    assert stats["files_after"] == 1
    assert len(_parquet_files(path)) == 1
    after = spark.read.parquet(path).groupBy().sum("id").first()[0]
    assert after == before
    # no leftover temp/backup dirs
    assert not [d for d in os.listdir(tmp_path) if "compact" in d]


def test_write_clustered_files_own_disjoint_ranges(spark, tmp_path):
    path = str(tmp_path / "c")
    df = spark.range(0, 10000).withColumnRenamed("id", "k")
    write_clustered(df, path, ["k"], n_files=4)

    ranges = []
    for f in _parquet_files(path):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) == 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping file ranges: {(lo1, hi1)} vs {(lo2, hi2)}"

    # fidelity
    assert spark.read.parquet(path).count() == 10000


def test_dynamic_partition_overwrite_touches_only_written_days(spark, tmp_path):
    """Re-running one day must leave every other day partition
    byte-identical, and must fully replace (not append to) the
    re-written day."""
    import os

    from pyspark.sql import functions as F

    from datapipeline_dags_spark.operators.maintenance import (
        overwrite_days,
        write_day_partitioned,
    )

    path = str(tmp_path / "days")
    base = spark.createDataFrame(
        [(i, f"2024-01-{1 + i % 3:02d} 12:00:00", float(i)) for i in range(30)],
        "id: long, ts_s: string, value: double",
    ).select("id", F.to_timestamp("ts_s").alias("ts"), "value")
    write_day_partitioned(base, path)

    def day_bytes(day: str) -> bytes:
        d = os.path.join(path, f"day={day}")
        return b"".join(
            open(os.path.join(d, f), "rb").read()
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        )

    before_d1 = day_bytes("2024-01-01")
    before_d3 = day_bytes("2024-01-03")

    # corrected re-run of day 2 only: fewer rows, new values
    fix = spark.createDataFrame(
        [(100, "2024-01-02 09:00:00", 9.5)], "id: long, ts_s: string, value: double"
    ).select("id", F.to_timestamp("ts_s").alias("ts"), "value")
    overwrite_days(fix, path)

    assert day_bytes("2024-01-01") == before_d1
    assert day_bytes("2024-01-03") == before_d3
    got = spark.read.parquet(path).filter(F.col("day") == "2024-01-02")
    assert [r["id"] for r in got.collect()] == [100]
    # conf restored
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode").lower() != "dynamic"
    total = spark.read.parquet(path).count()
    assert total == 21  # 10 rows each for day 1 & 3, 1 for day 2
