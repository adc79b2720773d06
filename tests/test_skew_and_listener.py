"""salted_join equivalence on skewed data + streaming progress listener."""

from __future__ import annotations

import json
import os
import time

import duckdb
import pytest
from pyspark.sql import functions as F

from datapipeline_dags_spark.operators.skew import SALT_COL, salt_expr, salted_join
from datapipeline_dags_spark.streaming.listener import DbProgressListener


@pytest.fixture()
def skewed(spark):
    # 90% of fact rows share one hot key
    fact = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 50).select(F.col("id").alias("k"), (F.col("id") * 100).alias("w"))
    return fact, dim


def canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_join_equals_plain(spark, skewed):
    fact, dim = skewed
    plain = fact.join(dim, ["k"], "inner").select("k", "v", "w")
    salted = salted_join(fact, dim, ["k"], how="inner", salt_n=8).select("k", "v", "w")
    assert canon(salted) == canon(plain)


def test_salted_left_join_equals_plain(spark, skewed):
    fact, dim = skewed
    sparse_dim = dim.filter(F.col("k") % 2 == 0)  # unmatched keys exercise null side
    plain = fact.join(sparse_dim, ["k"], "left").select("k", "v", "w")
    salted = salted_join(fact, sparse_dim, ["k"], how="left", salt_n=8).select("k", "v", "w")
    assert canon(salted) == canon(plain)


def test_salt_is_retry_stable_across_partition_layouts(spark, skewed):
    """Salt must be a pure function of row data: a task retry or AQE
    repartition replays the SAME salt per row (rand(seed) would not)."""
    fact, _ = skewed
    expr = salt_expr(["v"], 8)
    a = {r.v: r.s for r in fact.select("v", expr.alias("s")).collect()}
    b = {
        r.v: r.s
        for r in fact.repartition(13).select("v", expr.alias("s")).collect()
    }
    assert a == b
    assert set(a.values()) == set(range(8))  # hot key actually spreads


def test_salted_join_result_stable_under_repartition(spark, skewed):
    fact, dim = skewed
    one = salted_join(fact, dim, ["k"], salt_n=8).select("k", "v", "w")
    two = salted_join(fact.repartition(17), dim, ["k"], salt_n=8).select("k", "v", "w")
    assert canon(one) == canon(two)
    assert SALT_COL not in one.columns


def test_salted_join_rejects_unsupported_how(spark, skewed):
    fact, dim = skewed
    with pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], how="right")


def test_streaming_listener_records_batches(spark, tmp_path):
    db = str(tmp_path / "stats.duckdb")
    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    with open(os.path.join(drop, "a.json"), "w") as fh:
        fh.write(json.dumps({"v": 1}) + "\n")
    listener = DbProgressListener(db)
    spark.streams.addListener(listener)
    try:
        q = (
            spark.readStream.schema("v long")
            .json(drop)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = []
        # Listener events are delivered asynchronously; under heavy
        # machine load (parallel suites) delivery has been observed to
        # exceed 20 s (flaked at 20 s in the r11 full run with a
        # concurrent Spark session), so the budget is WALL-CLOCK 120 s
        # — the assertion is about delivery-at-all, not latency, and a
        # generous budget costs nothing when delivery is prompt.
        deadline = time.time() + 120
        while time.time() < deadline:
            if os.path.exists(db):
                con = duckdb.connect(db)
                try:
                    rows = con.execute(
                        "SELECT batch_id, num_input_rows FROM streaming_batch_stats"
                    ).fetchall()
                finally:
                    con.close()
                if rows:
                    break
            time.sleep(0.25)
        assert rows and rows[0][1] == 1
    finally:
        spark.streams.removeListener(listener)
