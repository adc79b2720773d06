"""Stream-stream interval join: batch parity, bounded-state eviction
semantics (late right rows beyond the watermark never match), and
leftOuter null-emission for never-matched left rows."""

from __future__ import annotations

import json
import os

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from datapipeline_dags_spark.streaming.interval_join import interval_join

IMP_SCHEMA = StructType(
    [
        StructField("ad", StringType()),
        StructField("imp_ts", TimestampType()),
        StructField("imp_id", LongType()),
    ]
)
CLK_SCHEMA = StructType(
    [
        StructField("ad", StringType()),
        StructField("click_ts", TimestampType()),
        StructField("click_id", LongType()),
    ]
)

T0 = "2026-01-01 00:00:00"


def _ts(minutes: int) -> str:
    return f"2026-01-01 00:{minutes:02d}:00"


IMPRESSIONS = [
    {"ad": "a", "imp_ts": _ts(0), "imp_id": 1},
    {"ad": "a", "imp_ts": _ts(10), "imp_id": 2},
    {"ad": "b", "imp_ts": _ts(5), "imp_id": 3},
    {"ad": "c", "imp_ts": _ts(1), "imp_id": 4},  # never clicked
]
CLICKS = [
    {"ad": "a", "click_ts": _ts(4), "click_id": 100},   # matches imp 1
    {"ad": "a", "click_ts": _ts(12), "click_id": 101},  # matches imps 1? (12>0+5min? horizon) see below
    {"ad": "b", "click_ts": _ts(6), "click_id": 102},   # matches imp 3
    {"ad": "b", "click_ts": _ts(40), "click_id": 103},  # outside horizon
]
HORIZON_S = 5 * 60  # 5 minutes


def _drop(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    os.rename(tmp, os.path.join(dirpath, name))


def _batch_pairs(spark):
    imp = spark.createDataFrame(
        [(r["ad"], r["imp_ts"], r["imp_id"]) for r in IMPRESSIONS],
        "ad string, imp_ts string, imp_id long",
    ).selectExpr("ad", "cast(imp_ts as timestamp) imp_ts", "imp_id")
    clk = spark.createDataFrame(
        [(r["ad"], r["click_ts"], r["click_id"]) for r in CLICKS],
        "ad string, click_ts string, click_id long",
    ).selectExpr("ad", "cast(click_ts as timestamp) click_ts", "click_id")
    out = interval_join(imp, clk, "ad", "imp_ts", "click_ts", HORIZON_S)
    return {(r["imp_id"], r["click_id"]) for r in out.collect()}


def test_batch_twin_semantics(spark):
    """Expected pairs by hand: click lands in [imp_ts, imp_ts+5min]."""
    assert _batch_pairs(spark) == {(1, 100), (2, 101), (3, 102)}


def test_streaming_matches_batch(spark, tmp_path):
    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    _drop(imp_dir, "i0.json", IMPRESSIONS)
    _drop(clk_dir, "c0.json", CLICKS)
    imp = spark.readStream.schema(IMP_SCHEMA).json(imp_dir)
    clk = spark.readStream.schema(CLK_SCHEMA).json(clk_dir)
    out = interval_join(imp, clk, "ad", "imp_ts", "click_ts", HORIZON_S)
    q = (
        out.writeStream.format("memory")
        .queryName("ij_inner")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["imp_id"], r["click_id"])
        for r in spark.sql("select * from ij_inner").collect()
    }
    assert got == _batch_pairs(spark)


def test_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """leftOuter: the never-clicked impression is emitted with null
    click columns once the watermark passes its horizon — which needs a
    second batch advancing event time past imp_ts + horizon + delay."""
    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    out_dir = str(tmp_path / "out")
    _drop(imp_dir, "i0.json", IMPRESSIONS)
    _drop(clk_dir, "c0.json", CLICKS)

    def run():
        imp = spark.readStream.schema(IMP_SCHEMA).json(imp_dir)
        clk = spark.readStream.schema(CLK_SCHEMA).json(clk_dir)
        out = interval_join(
            imp,
            clk,
            "ad",
            "imp_ts",
            "click_ts",
            HORIZON_S,
            watermark_delay="1 minutes",
            how="leftOuter",
        )
        q = (
            out.writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    # advance both watermarks far past every horizon
    _drop(imp_dir, "i1.json", [{"ad": "z", "imp_ts": _ts(59), "imp_id": 9}])
    _drop(clk_dir, "c1.json", [{"ad": "z", "click_ts": _ts(59), "click_id": 999}])
    run()
    rows = spark.read.parquet(out_dir).collect()
    unmatched = {r["imp_id"] for r in rows if r["click_id"] is None}
    assert 4 in unmatched  # ad "c" never clicked
    matched = {(r["imp_id"], r["click_id"]) for r in rows if r["click_id"] is not None}
    assert {(1, 100), (2, 101), (3, 102)} <= matched
