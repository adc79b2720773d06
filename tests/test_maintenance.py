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
