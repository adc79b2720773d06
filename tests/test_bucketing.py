"""Co-located bucketed joins: the write-once-shuffle-never contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipeline_dags_spark.catalog import table, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        8,
        sort_cols=["o_orderkey"],
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    o, li = bucketed_tables
    with_conf = spark.conf
    prev = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(li).join(spark.table(o), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:600]
        # results still correct vs the plain parquet join
        n = joined.count()
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert n == spark.table(li).count()  # every lineitem matches an order


def test_bucketed_aggregation_skips_shuffle(spark, bucketed_tables):
    o, _ = bucketed_tables
    agg = spark.table(o).groupBy("o_orderkey").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:600]
