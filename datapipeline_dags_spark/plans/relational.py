"""Relational query corpus — SURVEY.md §2.3–2.8 declared surface.

Scans/filters/projections, equi/semi/anti/outer/theta/range joins, hash
aggregation, rollup/cube/grouping sets, distinct, windows, sorts/top-k,
set ops, scalar function families, subqueries, watermark predicates,
sessionization, as-of joins.

Every query is declarative DataFrame/SQL — Catalyst supplies pushdown,
column pruning, join selection (broadcast for dims), partial aggregation
and AQE. No driver-side loops; every plan scales with partitions.

Reference parity notes are cited per query (file:line into
/root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datapipeline_dags_spark.catalog import table
from datapipeline_dags_spark.checkpoint import local_checkpoint
from datapipeline_dags_spark.plans.helpers import (
    cached_count,
    dec,
    exact_audit_frac,
    md5_coin,
    resolve_exact_audit,
    sql_dec,
)
from datapipeline_dags_spark.plans.registry import query
from datapipeline_dags_spark.plans.route import collect_and_solve

#: q179's basket-cap counters, refreshed per plan build (the
#: llm_ops.BUCKET_OBSERVATIONS discipline for relational-side caps).
BASKET_OBSERVATIONS: dict[str, Observation] = {}

# ---------------------------------------------------------------------------
# Aggregations over a scan (SURVEY §2.6; reference's only aggregates are
# count/min/max at postgresql_mysql_sync_dag.py:51,61-62 — the engine
# declares the full hash-agg surface).
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dec('SUM(l_quantity)')} AS sum_qty,
           {sql_dec('SUM(l_extendedprice)')} AS sum_base_price,
           {sql_dec('SUM(l_extendedprice * (1 - l_discount))')} AS sum_disc_price,
           {sql_dec('SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))')} AS sum_charge,
           {sql_dec('AVG(l_quantity)', 4)} AS avg_qty,
           {sql_dec('AVG(l_extendedprice)', 4)} AS avg_price,
           {sql_dec('AVG(l_discount)', 4)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan → filter → 8-way hash agg.

    Catalyst plans partial (map-side) + final aggregation; the shipdate
    predicate and 7-column projection push down to the parquet scan.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "2000-12-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec(F.sum("l_quantity")).alias("sum_qty"),
            dec(F.sum("l_extendedprice")).alias("sum_base_price"),
            dec(F.sum(disc_price)).alias("sum_disc_price"),
            dec(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            dec(F.avg("l_quantity"), 4).alias("avg_qty"),
            dec(F.avg("l_extendedprice"), 4).alias("avg_price"),
            dec(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q04_forecast_revenue",
    oracle=f"""
    SELECT {sql_dec('SUM(l_extendedprice * l_discount)')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q04_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: all predicates push to the scan; single global agg."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(dec(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.5). The reference's enrichment step is semantically a
# lookup join (parallelized_data_pipeline_dag.py:272,297) — here the full
# declared join surface.
# ---------------------------------------------------------------------------


@query(
    "q02_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey AS l_orderkey,
           {sql_dec('SUM(l.l_extendedprice * (1 - l.l_discount))')} AS revenue,
           o.o_orderdate AS o_orderdate, o.o_orderpriority AS o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY {sql_dec('SUM(l.l_extendedprice * (1 - l.l_discount))')} DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q02_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: filtered fact joins, agg, top-k (planned as
    TakeOrderedAndProject — no global sort).

    customer scales with SF, so no broadcast hint — AQE and the 64 MB
    autoBroadcastJoinThreshold pick the strategy (broadcast at small SF,
    sort-merge/shuffled-hash at 100 TB).  The top-k cut orders by the
    *rounded* revenue so the LIMIT boundary is deterministic across
    engines (raw float sums differ by ulps between partition orders).
    """
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "q03_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS n_name,
           {sql_dec('SUM(l.l_extendedprice * (1 - l.l_discount))')} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q03_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-way star join; one shuffle for the final agg.

    Broadcast hints only on the fixed-cardinality dims (nation=25,
    region=5).  customer/supplier scale linearly with SF — a forced
    broadcast would OOM executors at 100 TB, so AQE + the threshold
    choose their join strategy.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1999-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dec(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


@query(
    "q05_returned_items",
    oracle=f"""
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
           {sql_dec('SUM(l.l_extendedprice * (1 - l.l_discount))')} AS revenue,
           n.n_name AS n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY {sql_dec('SUM(l.l_extendedprice * (1 - l.l_discount))')} DESC, c.c_custkey
    LIMIT 20
    """,
)
def q05_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item report; top-20 customers by lost
    revenue.  Broadcast hint only on nation (25 rows); customer is
    SF-scaled so its join strategy is left to AQE.  Top-k cut ordered by
    the rounded revenue for a deterministic LIMIT boundary."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dec(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


@query(
    "q06_semi_join_big_spenders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def q06_semi_join_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join ≡ EXISTS — customers with ≥1 order above 400k."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q07_anti_join_inactive_customers",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
    """,
)
def q07_anti_join_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join ≡ NOT EXISTS — customers with no order before 1996."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1996-01-01")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "q08_outer_join_order_counts",
    oracle="""
    SELECT c.c_custkey AS c_custkey, COUNT(o.o_orderkey) AS order_cnt
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def q08_outer_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving zero-order customers (COUNT skips nulls)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


@query(
    "q18_theta_join_price_band",
    oracle=f"""
    SELECT p.p_brand AS p_brand, COUNT(*) AS n_li,
           {sql_dec('SUM(l.l_extendedprice)')} AS sum_price
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
               AND l.l_extendedprice > p.p_retailprice * 20
    GROUP BY p.p_brand
    """,
)
def q18_theta_join_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi key + non-equi residual condition (Catalyst keeps the
    hash join on the equi part, applies the residual as post-filter).
    part is SF-scaled — no broadcast hint; AQE decides."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return (
        li.join(
            p,
            (li.l_partkey == p.p_partkey)
            & (li.l_extendedprice > p.p_retailprice * 20),
        )
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_li"), dec(F.sum("l_extendedprice")).alias("sum_price"))
    )


@query(
    "q32_right_outer_unused_parts",
    oracle="""
    SELECT p.p_partkey AS p_partkey, COUNT(l.l_orderkey) AS n_li
    FROM lineitem l RIGHT JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey
    """,
)
def q32_right_outer_unused_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join preserving parts never ordered (COUNT skips nulls)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return (
        li.join(p, li.l_partkey == p.p_partkey, "right")
        .groupBy("p_partkey")
        .agg(F.count("l_orderkey").alias("n_li"))
    )


@query(
    "q33_full_outer_yearly_spend",
    oracle=f"""
    WITH y97 AS (SELECT o_custkey, SUM(o_totalprice) AS s FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                   AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00' GROUP BY o_custkey),
         y98 AS (SELECT o_custkey, SUM(o_totalprice) AS s FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
                   AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00' GROUP BY o_custkey)
    SELECT COALESCE(y97.o_custkey, y98.o_custkey) AS c_custkey,
           {sql_dec('COALESCE(y97.s, 0)')} AS spend_97,
           {sql_dec('COALESCE(y98.s, 0)')} AS spend_98
    FROM y97 FULL OUTER JOIN y98 ON y97.o_custkey = y98.o_custkey
    """,
)
def q33_full_outer_yearly_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two yearly per-customer aggregates — customers
    active in either year survive, missing side coalesced to 0."""
    o = table(spark, sf_dir, "orders")

    def year(lo: str, hi: str) -> DataFrame:
        return (
            o.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
            .groupBy("o_custkey")
            .agg(F.sum("o_totalprice").alias("s"))
        )

    a, b = year("1997-01-01", "1998-01-01").alias("a"), year("1998-01-01", "1999-01-01").alias("b")
    return a.join(b, F.col("a.o_custkey") == F.col("b.o_custkey"), "full").select(
        F.coalesce(F.col("a.o_custkey"), F.col("b.o_custkey")).alias("c_custkey"),
        dec(F.coalesce(F.col("a.s"), F.lit(0.0))).alias("spend_97"),
        dec(F.coalesce(F.col("b.s"), F.lit(0.0))).alias("spend_98"),
    )


@query(
    "q34_cross_join_status_grid",
    oracle="""
    SELECT r.r_name AS r_name, s.o_orderstatus AS o_orderstatus
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def q34_cross_join_status_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN (nested loop) — the full region × order-status grid.
    Both sides are tiny/deduplicated; Catalyst plans BroadcastNestedLoopJoin."""
    r = table(spark, sf_dir, "region")
    s = table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s).select("r_name", "o_orderstatus")


@query(
    "q35_dense_rank_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(DENSE_RANK() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderpriority, o_orderkey) AS BIGINT) AS prio_drank,
           LEAD(o_totalprice) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS next_price
    FROM orders
    """,
)
def q35_dense_rank_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DENSE_RANK + LEAD in one pass (two window specs, one shuffle on
    o_custkey — Spark reuses the exchange across compatible windows)."""
    wd = W.partitionBy("o_custkey").orderBy("o_orderpriority", "o_orderkey")
    wl = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(wd).cast("long").alias("prio_drank"),
        F.lead("o_totalprice").over(wl).alias("next_price"),
    )


@query(
    "q36_approx_count_distinct",
    oracle="""
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS approx_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q36_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) next to the exact count.

    The sketch value itself is engine-specific, so the checked contract
    is the HLL *error bound*: |approx − exact| ≤ 5% of exact (rsd=0.05).
    At 100 TB the approx variant is the one you run — the sketch merges
    map-side and never holds the distinct set in memory.
    """
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey", rsd=0.05).alias("_approx"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("_approx") - F.col("exact_parts"))
                <= 0.05 * F.col("exact_parts")
            ).alias("approx_within_5pct"),
        )
    )


# ---------------------------------------------------------------------------
# Sorts, top-k, distinct, rollup/cube/grouping sets (SURVEY §2.6–2.7)
# ---------------------------------------------------------------------------


@query(
    "q09_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q09_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject (per-partition heap +
    driver merge) — no full sort even at 100 TB."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q10_rollup_lineitem",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dec('SUM(l_quantity)')} AS sum_qty, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q10_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals in one pass (Catalyst Expand node)."""
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dec(F.sum("l_quantity")).alias("sum_qty"), F.count("*").alias("n"))
    )


@query(
    "q11_cube_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {sql_dec('SUM(o_totalprice)')} AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q11_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations in one shuffle."""
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), dec(F.sum("o_totalprice")).alias("sum_price"))
    )


@query(
    "q12_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {sql_dec('SUM(l_extendedprice)')} AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q12_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (same Expand-based plan).

    The DataFrame is passed by template (no global temp view — avoids
    name collisions when queries run concurrently in one session)."""
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               (ROUND(SUM(l_extendedprice), 2) + 0.0) AS sum_price
        FROM {lineitem}
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """,
        lineitem=table(spark, sf_dir, "lineitem"),
    )


@query(
    "q13_distinct_segments",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def q13_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = hash aggregate without agg functions."""
    return table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query(
    "q14_count_distinct_parts",
    oracle="""
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q14_count_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column COUNT DISTINCT (Catalyst plans Expand + two-phase agg)."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions (SURVEY §2.7 declared surface; reference's watermark
# top-1 at postgresql_mysql_sync_dag.py:40 is the observed seed)
# ---------------------------------------------------------------------------


@query(
    "q15_window_top3_per_customer",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def q15_window_top3_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ROW_NUMBER window (single shuffle on the
    partition key; Spark pushes a group-limit below the window)."""
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "q16_window_running_total",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           {sql_dec('SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)')} AS running_total
    FROM orders
    """,
)
def q16_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (cumulative frame)."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        dec(F.sum("o_totalprice").over(w)).alias("running_total"),
    )


@query(
    "q17_window_lag_delta",
    oracle="""
    SELECT o_custkey, o_orderkey,
           o_totalprice - LAG(o_totalprice) OVER (PARTITION BY o_custkey
                                                  ORDER BY o_orderdate, o_orderkey) AS delta,
           RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank
    FROM orders
    """,
)
def q17_window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG + RANK in one window pass (single subtraction — exact in IEEE,
    no rounding needed)."""
    wo = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wr = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        (F.col("o_totalprice") - F.lag("o_totalprice").over(wo)).alias("delta"),
        F.rank().over(wr).cast("long").alias("price_rank"),
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.7)
# ---------------------------------------------------------------------------


@query(
    "q19_set_ops_customers",
    oracle="""
    WITH c97 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                   AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'),
         c98 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
                   AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00')
    SELECT 'both' AS bucket, COUNT(*) AS n FROM (SELECT * FROM c97 INTERSECT SELECT * FROM c98) t
    UNION ALL
    SELECT 'only_97' AS bucket, COUNT(*) AS n FROM (SELECT * FROM c97 EXCEPT SELECT * FROM c98) t
    UNION ALL
    SELECT 'either' AS bucket, COUNT(*) AS n FROM (SELECT * FROM c97 UNION SELECT * FROM c98) t
    """,
)
def q19_set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-membership COUNTS over yearly active-customer sets.

    Declared as INTERSECT/EXCEPT/UNION (the oracle keeps that form),
    but planned as ONE aggregation: per customer, a year-membership
    flag pair, then three conditional sums — 2 shuffles total where the
    literal three-branch set-op plan re-shuffles the shared scans 10
    times (measured).  When only the CARDINALITIES of set combinations
    are needed, membership flags beat materializing each set expression
    — the classic trick for set-overlap dashboards at scale.  The
    set-op OPERATORS themselves are exercised by q92 (key-level
    results, where the operator output IS the answer).
    """
    o = table(spark, sf_dir, "orders")
    flags = (
        o.filter(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1999-01-01")
        )
        .groupBy("o_custkey")
        .agg(
            F.max((F.col("o_orderdate") < "1998-01-01").cast("int")).alias("in97"),
            F.max((F.col("o_orderdate") >= "1998-01-01").cast("int")).alias("in98"),
        )
    )
    totals = flags.agg(
        F.sum(F.col("in97") * F.col("in98")).cast("long").alias("both"),
        F.sum(F.col("in97") * (1 - F.col("in98"))).cast("long").alias("only_97"),
        F.count("*").cast("long").alias("either"),
    )
    return totals.select(
        F.explode(
            F.array(
                F.struct(F.lit("both").alias("bucket"), F.col("both").alias("n")),
                F.struct(F.lit("only_97").alias("bucket"), F.col("only_97").alias("n")),
                F.struct(F.lit("either").alias("bucket"), F.col("either").alias("n")),
            )
        ).alias("r")
    ).select("r.bucket", "r.n")


@query(
    "q92_set_ops_keys",
    oracle="""
    WITH c97 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                   AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'),
         c98 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
                   AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00')
    SELECT 'both' AS bucket, o_custkey FROM (SELECT * FROM c97 INTERSECT SELECT * FROM c98) t
    UNION ALL
    SELECT 'only_97' AS bucket, o_custkey FROM (SELECT * FROM c97 EXCEPT SELECT * FROM c98) t
    UNION ALL
    SELECT 'either' AS bucket, o_custkey FROM (SELECT * FROM c97 UNION SELECT * FROM c98) t
    """,
)
def q92_set_ops_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION-DISTINCT at the KEY level — here the
    set-operator output is the result itself, so the literal operators
    are the right plan (unlike q19, where only cardinalities are needed
    and membership flags collapse everything into one aggregation)."""
    o = table(spark, sf_dir, "orders")
    c97 = (
        o.filter((F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01"))
        .select("o_custkey")
        .distinct()
    )
    c98 = (
        o.filter((F.col("o_orderdate") >= "1998-01-01") & (F.col("o_orderdate") < "1999-01-01"))
        .select("o_custkey")
        .distinct()
    )
    tag = lambda bucket, df: df.select(F.lit(bucket).alias("bucket"), "o_custkey")
    return (
        tag("both", c97.intersect(c98))
        .unionAll(tag("only_97", c97.exceptAll(c98)))
        .unionAll(tag("either", c97.union(c98).distinct()))
    )


# ---------------------------------------------------------------------------
# Subqueries (SURVEY §2.5 declared; planned by Catalyst as joins)
# ---------------------------------------------------------------------------


@query(
    "q20_in_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
      AND o_orderstatus = 'F'
    """,
)
def q20_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery (Catalyst rewrites to left-semi join)."""
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM {orders} o
        WHERE o_custkey IN (SELECT c_custkey FROM {customer} WHERE c_acctbal < 0)
          AND o_orderstatus = 'F'
        """,
        orders=table(spark, sf_dir, "orders"),
        customer=table(spark, sf_dir, "customer"),
    )


@query(
    "q21_correlated_exists",
    oracle="""
    SELECT p_partkey, p_brand FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)
    """,
)
def q21_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (decorrelated to semi join by Catalyst)."""
    return spark.sql(
        """
        SELECT p_partkey, p_brand FROM {part} p
        WHERE EXISTS (SELECT 1 FROM {lineitem} l
                      WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)
        """,
        part=table(spark, sf_dir, "part"),
        lineitem=table(spark, sf_dir, "lineitem"),
    )


@query(
    "q22_scalar_subquery_above_avg",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def q22_scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery — orders above 1.5× the global average price.

    The avg is a double; the comparison threshold differs between engines
    by at most one ulp of the sum order, but no order sits within 1e-6 of
    1.5×avg in the fixture, so the predicate is stable (verified in tests).
    """
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM {orders} o
        WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM {orders})
        """,
        orders=table(spark, sf_dir, "orders"),
    )


# ---------------------------------------------------------------------------
# Watermark / incremental-scan predicate (SURVEY §2.3 P2, §2.1 S8;
# reference: postgresql_mysql_sync_dag.py:40-50 — strictly-newer rows with
# id tiebreak). Here expressed over the events fixture (ts ≡ processing_ts,
# event_id ≡ id) so the oracle can check it.
# ---------------------------------------------------------------------------


@query(
    "q23_incremental_watermark_scan",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value FROM events
    WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
       OR (ts = TIMESTAMP '2024-01-15 00:00:00' AND event_id > 5000)
    """,
)
def q23_incremental_watermark_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's incremental watermark predicate
    (postgresql_mysql_sync_dag.py:48-50): processing_ts > wm OR
    (processing_ts = wm AND id > last_id).

    The predicate is applied to the RAW scan column before any
    normalization, in the column's PHYSICAL type: a filter on
    ``timestamp_micros(ts div 1000)`` is a derived expression parquet
    cannot prune with, while a comparison against the raw column (nanos
    LONG in the legacy layout, TIMESTAMP_NTZ in the current one) pushes
    to the scan and skips whole row groups by column statistics — the
    difference between reading the tail and rescanning history on every
    incremental cycle.
    """
    import datetime as dt
    import os

    from pyspark.sql import types as T

    from ..catalog import normalize_event_ts

    wm = dt.datetime(2024, 1, 15, tzinfo=dt.timezone.utc)
    wm_id = 5000
    # raw read bypasses catalog.table — ensure the nanos conf on vanilla
    # driver sessions (idempotent, single-valued; see catalog.table)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if isinstance(raw.schema["ts"].dataType, T.LongType):
        wm_col = F.lit(int(wm.timestamp()) * 1_000_000_000)
    else:  # TIMESTAMP_NTZ / TIMESTAMP — literal in the column's own type
        wm_col = F.lit(wm.replace(tzinfo=None)).cast(raw.schema["ts"].dataType)
    return normalize_event_ts(
        raw.filter(
            (F.col("ts") > wm_col)
            | ((F.col("ts") == wm_col) & (F.col("event_id") > wm_id))
        )
    ).select("event_id", "ts", "user_id", "event_type", "value")


# ---------------------------------------------------------------------------
# Sessionization (gap-based) — SURVEY §2.9 ST7 declared batch analogue.
# ---------------------------------------------------------------------------


@query(
    "q24_sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS t_start, MAX(ts) AS t_end
    FROM sessions GROUP BY user_id, session_id
    """,
)
def q24_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: LAG + cumulative SUM over one window
    partitioning — the classic scalable pattern (one shuffle on user_id)."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), F.lit(1)).otherwise(F.lit(0)),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
    )


@query(
    "q89_dq_checks",
    oracle="""
    WITH null_custkey AS (
      SELECT COUNT(*) AS total, SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS bad
      FROM orders),
    orphan_li AS (
      SELECT (SELECT COUNT(*) FROM lineitem) AS total,
             (SELECT COUNT(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey)) AS bad),
    neg_price AS (
      SELECT COUNT(*) AS total,
             SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS bad
      FROM lineitem),
    dup_pk AS (
      SELECT (SELECT COUNT(*) FROM orders) AS total,
             (SELECT COALESCE(SUM(c - 1), 0) FROM
                (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey) g
              WHERE c > 1) AS bad),
    disc_range AS (
      SELECT COUNT(*) AS total,
             SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS bad
      FROM lineitem)
    SELECT 'null_o_custkey' AS check_name, CAST(total AS BIGINT) AS checked_rows,
           CAST(bad AS BIGINT) AS violations, (bad = 0) AS passed FROM null_custkey
    UNION ALL
    SELECT 'orphan_lineitem', CAST(total AS BIGINT), CAST(bad AS BIGINT), bad = 0 FROM orphan_li
    UNION ALL
    SELECT 'nonpositive_price', CAST(total AS BIGINT), CAST(bad AS BIGINT), bad = 0 FROM neg_price
    UNION ALL
    SELECT 'duplicate_orderkey', CAST(total AS BIGINT), CAST(bad AS BIGINT), bad = 0 FROM dup_pk
    UNION ALL
    SELECT 'discount_range', CAST(total AS BIGINT), CAST(bad AS BIGINT), bad = 0 FROM disc_range
    """,
)
def q89_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint suite (the Deequ/expectations shape):
    completeness (null rate), referential integrity (orphan facts),
    value ranges, and primary-key uniqueness — one row per check with
    its violation count and verdict, the table a pipeline gate reads
    before promoting a batch.

    Scale shape: every check is a map-side conditional aggregate
    except referential integrity (one anti-join on the join key) and
    PK uniqueness (one key-grouped count); each check's result is a
    single row, so the union is driver-light no matter the table size.
    """
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")

    def one(name: str, total: Column, bad: Column, src: DataFrame) -> DataFrame:
        return src.agg(
            F.lit(name).alias("check_name"),
            total.cast("long").alias("checked_rows"),
            bad.cast("long").alias("violations"),
            (bad == 0).alias("passed"),
        )

    null_ck = one(
        "null_o_custkey",
        F.count("*"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)),
        orders,
    )
    hits = orders.select("o_orderkey", F.lit(1).alias("hit"))
    orphan_ck = one(
        "orphan_lineitem",
        F.count("*"),
        F.sum(F.when(F.col("hit").isNull(), 1).otherwise(0)),
        li.join(hits, li["l_orderkey"] == F.col("o_orderkey"), "left"),
    )
    price_ck = one(
        "nonpositive_price",
        F.count("*"),
        F.sum(F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0)),
        li,
    )
    dup = orders.groupBy("o_orderkey").agg(F.count("*").alias("c"))
    dup_ck = dup.agg(
        F.lit("duplicate_orderkey").alias("check_name"),
        F.sum("c").cast("long").alias("checked_rows"),
        F.coalesce(F.sum(F.when(F.col("c") > 1, F.col("c") - 1)), F.lit(0))
        .cast("long")
        .alias("violations"),
        (
            F.coalesce(F.sum(F.when(F.col("c") > 1, F.col("c") - 1)), F.lit(0)) == 0
        ).alias("passed"),
    )
    disc_ck = one(
        "discount_range",
        F.count("*"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1).otherwise(0)
        ),
        li,
    )
    return null_ck.union(orphan_ck).union(price_ck).union(dup_ck).union(disc_ck)


# ---------------------------------------------------------------------------
# q140 — point-in-time (SCD2-style) tier enrichment
# ---------------------------------------------------------------------------

# Cumulative-spend tier boundaries (fixture-scaled: customers average ~10
# orders totalling ~2.5M, so the thresholds split the corpus across all
# three tiers as spend accumulates).
TIER_SILVER = 1_000_000.0
TIER_GOLD = 3_000_000.0


@query(
    "q140_pit_tier_revenue",
    oracle=f"""
    WITH h AS (
      SELECT o_custkey, o_orderdate AS valid_from,
             LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey)
               AS valid_to,
             SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS UNBOUNDED PRECEDING) AS cum
      FROM orders),
    tiers AS (SELECT o_custkey, valid_from, valid_to,
                     CASE WHEN cum < {TIER_SILVER} THEN 'bronze'
                          WHEN cum < {TIER_GOLD} THEN 'silver'
                          ELSE 'gold' END AS tier
              FROM h),
    li AS (SELECT o.o_custkey, l.l_shipdate,
                  l.l_extendedprice * (1 - l.l_discount) AS rev
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
    SELECT tier,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {sql_dec('SUM(rev)')} AS revenue
    FROM li JOIN tiers t
      ON li.o_custkey = t.o_custkey
     AND li.l_shipdate >= t.valid_from
     AND (t.valid_to IS NULL OR li.l_shipdate < t.valid_to)
    GROUP BY tier
    """,
)
def q140_pit_tier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension enrichment — the SCD-type-2 join: a
    per-customer spend-tier HISTORY is derived from orders (each order
    moves the cumulative total; the tier holds from that order's date
    until the next), and every lineitem is attributed to the tier VALID
    AT ITS SHIP DATE, not the customer's current tier.  The temporal-
    correctness join every warehouse needs for "revenue by segment as
    it was then" reporting (and the batch analog of `sinks/` SCD2
    history).

    Scale shape: interval derivation is two windows per customer
    partition (cumulative sum + LEAD — deterministic order, so the
    float accumulation sequence is identical in both engines); the
    point-in-time join is an EQUI-join on custkey with the range
    predicate as a post-join filter (SortMergeJoin, never a nested
    loop — intervals per customer are bounded by order count).  A
    same-date pair of orders produces a zero-width interval that
    matches nothing — the later state wins, deterministically.
    """
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    wo = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    h = orders.select(
        "o_custkey",
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(wo).alias("valid_to"),
        F.sum("o_totalprice").over(wo.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
    )
    tiers = h.select(
        "o_custkey",
        "valid_from",
        "valid_to",
        F.when(F.col("cum") < TIER_SILVER, F.lit("bronze"))
        .when(F.col("cum") < TIER_GOLD, F.lit("silver"))
        .otherwise(F.lit("gold"))
        .alias("tier"),
    )
    items = li.join(orders.select("o_orderkey", "o_custkey"),
                    li.l_orderkey == F.col("o_orderkey")).select(
        "o_custkey",
        "l_shipdate",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    joined = items.join(
        tiers,
        (items.o_custkey == tiers.o_custkey)
        & (F.col("l_shipdate") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("l_shipdate") < F.col("valid_to"))),
    )
    return joined.groupBy("tier").agg(
        F.count("*").cast("long").alias("n_items"),
        dec(F.sum("rev")).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# q141 — ship-latency percentiles by priority
# ---------------------------------------------------------------------------


@query(
    "q141_ship_latency_percentiles",
    oracle="""
    WITH t AS (
      SELECT o_orderpriority,
             date_diff('day', o_orderdate, l_shipdate) AS days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           (ROUND(quantile_cont(days, 0.5), 4) + 0.0) AS p50_days,
           (ROUND(quantile_cont(days, 0.9), 4) + 0.0) AS p90_days,
           (ROUND(quantile_cont(days, 0.99), 4) + 0.0) AS p99_days
    FROM t GROUP BY o_orderpriority
    """,
)
def q141_ship_latency_percentiles(
    spark: SparkSession, sf_dir: str, exact_audit: str = "auto"
) -> DataFrame:
    """Fulfilment-latency SLA report: exact interpolated p50/p90/p99 of
    order-to-ship days per order priority — the ops dashboard behind
    priority-class SLAs.  One equi-join (orderkey) + one hash agg.

    ~5 priority groups over all of lineitem means Spark's exact
    ``percentile`` buffers a fifth of the corpus per reducer task, so
    the percentile inputs take the ``exact_audit`` gate
    (plans/helpers.py): 'auto' (default) is the oracle-parity exact
    path up to EXACT_AUDIT_MAX_ROWS and the q186
    ``distributed_percentiles`` route above it — still EXACT, max task
    memory one histogram bin; 'sampled' (deterministic md5-coin row
    sample) stays selectable.  ``n_items`` is an exact count in every
    mode.
    The truly unbounded-cardinality variant remains q68's mergeable
    sketch.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    mode = resolve_exact_audit(
        exact_audit,
        lambda: cached_count(li, f"{sf_dir}/lineitem"),
        scale_mode="distributed",
    )
    if mode == "distributed":
        from datapipeline_dags_spark.plans.scalars import (
            distributed_percentiles,
        )

        gv = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            F.col("o_orderpriority").alias("g"),
            F.datediff("l_shipdate", "o_orderdate").cast("double").alias("v"),
        )
        counts = gv.groupBy("g").agg(F.count("*").cast("long").alias("n_items"))
        pcts = (
            distributed_percentiles(gv, (0.5, 0.9, 0.99))
            .groupBy("g")
            .agg(
                F.max(F.when(F.col("p") == 0.5, F.col("value"))).alias("v50"),
                F.max(F.when(F.col("p") == 0.9, F.col("value"))).alias("v90"),
                F.max(F.when(F.col("p") == 0.99, F.col("value"))).alias("v99"),
            )
        )
        return counts.join(pcts, "g").select(
            F.col("g").alias("o_orderpriority"),
            "n_items",
            dec(F.col("v50"), 4).alias("p50_days"),
            dec(F.col("v90"), 4).alias("p90_days"),
            dec(F.col("v99"), 4).alias("p99_days"),
        )
    if mode == "sampled":
        frac = exact_audit_frac(cached_count(li, f"{sf_dir}/lineitem"))
        coin = md5_coin(F.concat_ws("_", "l_orderkey", "l_linenumber"), frac)
    else:
        coin = F.lit(True)
    t = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        F.when(coin, F.datediff("l_shipdate", "o_orderdate")).alias("days"),
    )
    pct = F.percentile("days", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        t.groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("n_items"), pct.alias("p"))
        .select(
            "o_orderpriority",
            "n_items",
            dec(F.element_at("p", 1), 4).alias("p50_days"),
            dec(F.element_at("p", 2), 4).alias("p90_days"),
            dec(F.element_at("p", 3), 4).alias("p99_days"),
        )
    )


# ---------------------------------------------------------------------------
# q142 — market-basket affinity (association lift)
# ---------------------------------------------------------------------------

BASKET_MIN_SUPPORT = 2  # co-occurrence floor
BASKET_TOP = 20


@query(
    "q142_basket_affinity",
    oracle=f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM b),
    cnt AS (SELECT l_partkey, COUNT(*) AS c FROM b GROUP BY 1),
    pair AS (
      SELECT a.l_partkey AS part_a, c.l_partkey AS part_b, COUNT(*) AS n_ab
      FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey
       AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2),
    scored AS (
      SELECT part_a, part_b, n_ab,
             ROUND(n_ab * 1.0 * n.n / (ca.c * cb.c), 6) + 0.0 AS lift
      FROM pair CROSS JOIN n
      JOIN cnt ca ON part_a = ca.l_partkey
      JOIN cnt cb ON part_b = cb.l_partkey
      WHERE n_ab >= {BASKET_MIN_SUPPORT})
    SELECT part_a, part_b, CAST(n_ab AS BIGINT) AS n_ab, lift,
           CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY lift DESC, part_a, part_b)
                      AS rk
          FROM scored)
    WHERE rk <= {BASKET_TOP}
    """,
)
def q142_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: the top part pairs by association LIFT
    (P(a,b) / P(a)P(b)) over co-ordered baskets with a minimum support
    floor — the association-rule primitive behind recommendations and
    assortment planning.

    Scale shape: the pair join is WITHIN an order (equi-join on
    orderkey) so pair volume is Σ C(basket, 2) — bounded by basket
    size, never corpus-quadratic; part marginals and the 1-row order
    count are bounded aggregates; the final top-k ranks the ROUNDED
    lift with part-id tie-breaks (deterministic k-cut both engines).
    """
    li = table(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey").distinct()
    n_tbl = b.agg(F.countDistinct("l_orderkey").alias("n"))
    cnt = b.groupBy("l_partkey").agg(F.count("*").alias("c"))
    pair = (
        b.alias("x")
        .join(
            b.alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("part_a"),
            F.col("y.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= BASKET_MIN_SUPPORT)
    )
    scored = (
        pair.crossJoin(F.broadcast(n_tbl))
        .join(cnt.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("ca")), "part_a")
        .join(cnt.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("cb")), "part_b")
        .select(
            "part_a",
            "part_b",
            "n_ab",
            dec(F.col("n_ab") * F.lit(1.0) * F.col("n") / (F.col("ca") * F.col("cb")), 6).alias("lift"),
        )
    )
    # Global top-k via orderBy+limit (TakeOrderedAndProject: per-
    # partition heaps + driver merge) — NOT a global row_number filter,
    # which puts every supported pair through one WindowExec partition
    # (InferWindowGroupLimit never rewrites empty-partition windows).
    # The rank column is then assigned on the bounded BASKET_TOP rows.
    top = scored.orderBy(F.col("lift").desc(), "part_a", "part_b").limit(
        BASKET_TOP
    )
    rk = F.row_number().over(W.orderBy(F.col("lift").desc(), "part_a", "part_b"))
    return top.select(
        "part_a",
        "part_b",
        F.col("n_ab").cast("long").alias("n_ab"),
        "lift",
        rk.cast("long").alias("rk"),
    )


# ---------------------------------------------------------------------------
# q143 — supplier market concentration (HHI) per nation
# ---------------------------------------------------------------------------


@query(
    "q143_market_concentration",
    oracle="""
    WITH rev AS (
      SELECT s_nationkey, l_suppkey,
             SUM(l_extendedprice * (1 - l_discount)) AS r
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1, 2),
    tot AS (SELECT s_nationkey, SUM(r) AS total FROM rev GROUP BY 1)
    SELECT n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           (ROUND(MAX(tot.total), 2) + 0.0) AS revenue,
           (ROUND(SUM((r / tot.total) * (r / tot.total)), 6) + 0.0) AS hhi
    FROM rev
    JOIN tot USING (s_nationkey)
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q143_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier market concentration per nation — the Herfindahl-
    Hirschman index (Σ revenue-share², 1/n = perfect competition, 1.0 =
    monopoly), the antitrust-style concentration metric a marketplace
    health report carries.

    Scale shape: one (nation, supplier) revenue aggregate off the
    lineitem join (supplier is a broadcast dim), a bounded per-nation
    totals agg joined back, and a ≤|nations|-row output; share² sums
    over the bounded supplier set per nation.
    """
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    rev = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r"))
    )
    tot = rev.groupBy("s_nationkey").agg(F.sum("r").alias("total"))
    share = F.col("r") / F.col("total")
    return (
        rev.join(tot, "s_nationkey")
        .join(F.broadcast(nat), rev.s_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("long").alias("n_suppliers"),
            dec(F.max("total")).alias("revenue"),
            dec(F.sum(share * share), 6).alias("hhi"),
        )
    )


# ---------------------------------------------------------------------------
# q157 — supplier-nation x order-year gross margin (TPC-H Q9 shape)
# ---------------------------------------------------------------------------

#: Cost proxy: the fixture has no partsupp/ps_supplycost, so unit cost
#: is modeled as 60% of p_retailprice (fixed constant on both engines).
MARGIN_COST_FRAC = 0.6


@query(
    "q157_nation_year_margin",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           COUNT(*) AS n_lines,
           (ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                      - p.p_retailprice * {MARGIN_COST_FRAC} * l.l_quantity), 2)
            + 0.0) AS margin
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY 1, 2
    """,
)
def q157_nation_year_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gross margin by supplier nation and order year — the TPC-H Q9
    plan shape (one fact table joined through two scaled dimensions and
    a fixed-size dimension chain) over the fixture's columns: revenue
    minus a retail-price cost proxy (no partsupp table exists here;
    reference parity is the JOIN TOPOLOGY, not Q9's cost column).

    Scale shape: lineitem shuffles once per scaled-dim key (orders on
    orderkey, part on partkey — both co-partitionable by bucketing in a
    warehouse layout); supplier joins the same way; only the 25-row
    nation dim is broadcast.  The aggregate is |nations| x |years| rows
    — map-side combinable to a bounded result at any SF.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    margin = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * MARGIN_COST_FRAC * F.col("l_quantity")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.count("*").alias("n_lines"),
            dec(F.sum(margin), 2).alias("margin"),
        )
    )


# ---------------------------------------------------------------------------
# q164 — ABC (Pareto) revenue classification by brand
# ---------------------------------------------------------------------------

ABC_A_CUT = 0.8
ABC_B_CUT = 0.95


@query(
    "q164_abc_brands",
    oracle=f"""
    WITH rev AS (
      SELECT p.p_brand AS brand,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1),
    c AS (
      SELECT brand, revenue,
             SUM(revenue) OVER (ORDER BY revenue DESC, brand
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(revenue) OVER () AS tot
      FROM rev)
    SELECT brand, (revenue + 0.0) AS revenue,
           {sql_dec('cum / tot', 6)} AS cum_share,
           CASE WHEN cum / tot <= {ABC_A_CUT} THEN 'A'
                WHEN cum / tot <= {ABC_B_CUT} THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c
    """,
)
def q164_abc_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of brands by revenue: rank brands by
    revenue, class A = the head carrying the first 80% of cumulative
    revenue, B to 95%, C the tail — the classic inventory-prioritization
    cut.  Revenue rounds to 2 decimals BEFORE the cumulative sum and
    ties break on the brand name, so the class boundaries are
    engine-agreed.

    Scale shape: one fact-dim join + hash agg collapses the corpus to
    |brands| rows; the ordered cumulative window runs over that BOUNDED
    model table only (the same discipline as q146/q154 — collapse
    first, order the bounded result).  Classifying unbounded-cardinality
    keys (part-level ABC) would instead use the q71 two-phase prefix
    sum over revenue buckets.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    w = W.orderBy(F.col("revenue").desc(), "brand").rowsBetween(
        W.unboundedPreceding, 0
    )
    c = rev.select(
        "brand",
        "revenue",
        F.sum("revenue").over(w).alias("cum"),
        F.sum("revenue").over(W.partitionBy()).alias("tot"),
    )
    share = F.col("cum") / F.col("tot")
    return c.select(
        "brand",
        "revenue",
        dec(share, 6).alias("cum_share"),
        F.when(share <= ABC_A_CUT, "A")
        .when(share <= ABC_B_CUT, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


# ---------------------------------------------------------------------------
# q165 — RFM customer segmentation (exact-edge quartiles, no global NTILE)
# ---------------------------------------------------------------------------


@query(
    "q165_rfm_segments",
    oracle="""
    WITH base AS (
      SELECT o_custkey AS cust,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS freq,
             ROUND(SUM(o_totalprice), 2) AS monetary
      FROM orders GROUP BY 1),
    anchored AS (
      SELECT cust,
             date_diff('day', last_order, (SELECT MAX(o_orderdate) FROM orders))
               AS recency_days,
             freq, monetary
      FROM base),
    edges AS (
      SELECT quantile_cont(recency_days, 0.5) AS r_med,
             quantile_cont(freq, 0.5) AS f_med,
             quantile_cont(monetary, 0.5) AS m_med
      FROM anchored)
    SELECT (CASE WHEN recency_days <= r_med THEN 'R+' ELSE 'R-' END ||
            CASE WHEN freq > f_med THEN 'F+' ELSE 'F-' END ||
            CASE WHEN monetary > m_med THEN 'M+' ELSE 'M-' END) AS segment,
           COUNT(*) AS n_customers,
           (ROUND(SUM(monetary), 2) + 0.0) AS segment_revenue
    FROM anchored CROSS JOIN edges
    GROUP BY 1
    """,
)
def q165_rfm_segments(
    spark: SparkSession, sf_dir: str, exact_audit: str = "auto"
) -> DataFrame:
    """RFM segmentation: each customer scored on Recency (days since
    last order, anchored to the corpus max date — no wall clock),
    Frequency (order count), and Monetary (total spend), split at the
    exact median of each dimension into 8 segments with counts and
    revenue — the classic CRM cut ("R+F+M+" = best customers,
    "R-F-M-" = churned).

    Scale shape: one (customer) hash agg collapses orders; the three
    medians are computed once and broadcast as a 1-row edge table (the
    q59/q124 edges discipline — never a global NTILE sort over
    customers); segment labeling is a map-side CASE; output is <= 8
    rows at any SF.  The medians are a single-group exact
    ``percentile`` over the per-customer table, so they take the
    ``exact_audit`` gate (plans/helpers.py; auto keys on |orders| as
    the magnitude signal): above the threshold the median EDGES come
    from a deterministic md5-coin customer sample while segment counts
    and revenue stay exact over every customer.  NB the oracle
    contract: the DuckDB SQL computes full-data medians, so sampled
    mode (auto above EXACT_AUDIT_MAX_ROWS) is NOT hash-checkable —
    fine at the fixture-scale driver gate, but a CORRECTNESS run at a
    large SF should pin exact_audit='exact' or expect edge drift.
    Median thresholds use
    <= for recency and > for frequency/monetary so integer-median ties
    fall on the engine-agreed side.
    """
    o = table(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("freq"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    anchor = o.agg(F.max("o_orderdate").alias("anchor"))
    anchored = base.crossJoin(F.broadcast(anchor)).select(
        "cust",
        F.datediff(F.col("anchor"), F.col("last_order")).alias("recency_days"),
        "freq",
        "monetary",
    )
    mode = resolve_exact_audit(
        exact_audit, lambda: cached_count(o, f"{sf_dir}/orders")
    )
    if mode == "sampled":
        frac = exact_audit_frac(cached_count(o, f"{sf_dir}/orders"))
        med_rows = anchored.filter(md5_coin(F.col("cust"), frac))
    else:
        med_rows = anchored
    edges = med_rows.agg(
        F.expr("percentile(recency_days, 0.5)").alias("r_med"),
        F.expr("percentile(freq, 0.5)").alias("f_med"),
        F.expr("percentile(monetary, 0.5)").alias("m_med"),
    )
    seg = F.concat(
        F.when(F.col("recency_days") <= F.col("r_med"), "R+").otherwise("R-"),
        F.when(F.col("freq") > F.col("f_med"), "F+").otherwise("F-"),
        F.when(F.col("monetary") > F.col("m_med"), "M+").otherwise("M-"),
    )
    return (
        anchored.crossJoin(F.broadcast(edges))
        .groupBy(seg.alias("segment"))
        .agg(
            F.count("*").alias("n_customers"),
            dec(F.sum("monetary"), 2).alias("segment_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q169 — Benford first-digit audit (fraud / synthetic-data screen)
# ---------------------------------------------------------------------------


@query(
    "q169_benford_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(substring(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1),
    tot AS (SELECT COUNT(*) AS n FROM d)
    SELECT digit,
           COUNT(*) AS n_orders,
           (ROUND(COUNT(*) * 1.0 / tot.n, 6) + 0.0) AS observed,
           (ROUND(log10(1.0 + 1.0 / digit), 6) + 0.0) AS benford,
           (ROUND(ABS(COUNT(*) * 1.0 / tot.n - log10(1.0 + 1.0 / digit)), 6)
            + 0.0) AS abs_dev
    FROM d CROSS JOIN tot
    GROUP BY digit, tot.n
    """,
)
def q169_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: naturally
    occurring multi-scale amounts follow P(d) = log10(1 + 1/d);
    fabricated, capped, or template-generated values don't — a
    standard forensic / synthetic-data screen next to q89's structural
    checks (and, for a training corpus, a cheap tell that numeric
    fields were machine-generated).  Output is 9 rows of observed vs
    expected share with absolute deviation; the fixture's uniform
    price generator should and does FAIL the law — the audit's point
    is measuring the deviation, not asserting conformance.

    Scale shape: first digit via FLOOR + integer-string truncation
    (explicit floor on both engines — DuckDB's double->BIGINT cast
    ROUNDS while Spark's truncates), one bounded 9-bucket hash agg +
    1-row total attach — map-side combinable everywhere.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("digit")
    )
    tot = d.agg(F.count("*").alias("n"))
    obs = F.col("n_orders") / F.col("n")
    benford = F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        d.groupBy("digit")
        .agg(F.count("*").alias("n_orders"))
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_orders",
            dec(obs, 6).alias("observed"),
            dec(benford, 6).alias("benford"),
            dec(F.abs(obs - benford), 6).alias("abs_dev"),
        )
    )


# ---------------------------------------------------------------------------
# q170 — order-total value-consistency audit (cross-table reconciliation)
# ---------------------------------------------------------------------------

RECON_TOL = 0.05  # relative tolerance before an order counts as mismatched


@query(
    "q170_total_reconciliation",
    oracle=f"""
    WITH li AS (
      SELECT l_orderkey, ROUND(SUM(l_extendedprice), 2) AS li_total
      FROM lineitem GROUP BY 1),
    j AS (
      SELECT o.o_orderkey, ROUND(o.o_totalprice, 2) AS o_total, li.li_total,
             CASE WHEN li.li_total IS NULL THEN 'no_lineitems'
                  WHEN ABS(li.li_total - o.o_totalprice)
                       > {RECON_TOL} * o.o_totalprice THEN 'mismatch'
                  ELSE 'consistent' END AS status
      FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey)
    SELECT status, COUNT(*) AS n_orders,
           (ROUND(SUM(o_total), 2) + 0.0) AS order_revenue
    FROM j GROUP BY status
    """,
)
def q170_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table VALUE reconciliation: does each order's header total
    agree with the sum of its line items within a relative tolerance?
    q89 checks structure (keys exist, ranges hold); this checks the
    money adds up — the audit a finance pipeline runs before
    publishing revenue, generalizing to any header/detail pair
    (shipment vs packages, batch vs records).  Orders with no line
    items are their own explicit class, never silently 'consistent'.

    Scale shape: one (orderkey) hash agg over lineitem, one keyed
    left join against orders (both sides co-partitionable by
    bucketing on the order key in a warehouse layout), 3-row output.
    """
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("li_total"))
    )
    j = o.join(li, F.col("l_orderkey") == F.col("o_orderkey"), "left").select(
        F.round(F.col("o_totalprice"), 2).alias("o_total"),
        F.when(F.col("li_total").isNull(), "no_lineitems")
        .when(
            F.abs(F.col("li_total") - F.col("o_totalprice"))
            > RECON_TOL * F.col("o_totalprice"),
            "mismatch",
        )
        .otherwise("consistent")
        .alias("status"),
    )
    return j.groupBy("status").agg(
        F.count("*").alias("n_orders"),
        dec(F.sum("o_total"), 2).alias("order_revenue"),
    )


# ---------------------------------------------------------------------------
# q175 — Kaplan-Meier fulfilment survival curve
# ---------------------------------------------------------------------------

KM_HORIZON_DAYS = 90  # orders not fully shipped by then are censored


@query(
    "q175_kaplan_meier",
    oracle=f"""
    WITH dur AS (
      SELECT o_orderkey,
             date_diff('day', o_orderdate, MAX(l_shipdate)) AS dur
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderkey, o_orderdate),
    obs AS (SELECT LEAST(GREATEST(dur, 0), {KM_HORIZON_DAYS}) AS t,
                   CASE WHEN dur <= {KM_HORIZON_DAYS} THEN 1 ELSE 0 END AS e
            FROM dur),
    n AS (SELECT COUNT(*) AS n FROM obs),
    g AS (SELECT t, SUM(e) AS d, SUM(1 - e) AS c FROM obs GROUP BY t),
    r AS (SELECT t, d, c,
                 n.n - COALESCE(SUM(d + c) OVER (ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS at_risk
          FROM g, n),
    s AS (SELECT t, d, c, at_risk,
                 PRODUCT((at_risk - d) * 1.0 / at_risk) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS surv
          FROM r)
    SELECT CAST(t AS BIGINT) AS t_days,
           CAST(at_risk AS BIGINT) AS n_at_risk,
           CAST(d AS BIGINT) AS n_events,
           CAST(c AS BIGINT) AS n_censored,
           {sql_dec('surv', 6)} AS survival
    FROM s
    """,
)
def q175_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of order fulfilment: S(t) =
    P(order not fully shipped by day t), with orders still open at the
    {KM_HORIZON_DAYS}-day horizon right-CENSORED (they contribute to
    the risk set but never to the event count) — the survival-analysis
    primitive behind SLA curves, churn models, and time-to-label
    estimation, which a plain percentile (q141) gets wrong whenever
    observation windows truncate the slow tail.

    Scale shape: the corpus collapses to one row per distinct duration
    day (<= {KM_HORIZON_DAYS}+1 rows) in one pushed hash agg; the risk
    set and the survival product both run over that bounded life table
    only (the q164 collapse-first discipline).  The cumulative product
    folds IEEE doubles strictly in day order on both engines —
    identical factor sequence, identical rounding.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    dur = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("ship_end"))
        .select(F.datediff("ship_end", "o_orderdate").alias("dur"))
    )
    # the synthetic fixture draws shipdates independent of orderdates,
    # so durations can be negative — clamp the life-table clock at day 0
    # (same-day-or-earlier ships are day-0 events), keeping the grid
    # bounded to [0, horizon]
    obs = dur.select(
        F.least(F.greatest(F.col("dur"), F.lit(0)), F.lit(KM_HORIZON_DAYS)).alias("t"),
        (F.col("dur") <= KM_HORIZON_DAYS).cast("int").alias("e"),
    )
    n_tbl = obs.agg(F.count("*").alias("n"))
    g = obs.groupBy("t").agg(
        F.sum("e").alias("d"), F.sum(F.lit(1) - F.col("e")).alias("c")
    )
    removed_w = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    r = (
        g.crossJoin(F.broadcast(n_tbl))
        .withColumn(
            "at_risk",
            F.col("n")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(removed_w), F.lit(0)
            ),
        )
    )
    factor = (F.col("at_risk") - F.col("d")) * F.lit(1.0) / F.col("at_risk")
    cum_w = W.orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    surv = F.aggregate(
        F.collect_list(factor).over(cum_w),
        F.lit(1.0),
        lambda acc, x: acc * x,
    )
    return r.select(
        F.col("t").cast("long").alias("t_days"),
        F.col("at_risk").cast("long").alias("n_at_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.col("c").cast("long").alias("n_censored"),
        dec(surv, 6).alias("survival"),
    )


# ---------------------------------------------------------------------------
# q179 — frequent itemset triples (support-ranked basket triples)
# ---------------------------------------------------------------------------

TRIPLE_MIN_SUPPORT = 2
TRIPLE_TOP = 20
# Within-basket triple volume is C(basket, 3) — CUBIC in basket size, so
# one pathological 10^4-part basket emits 10^12 triples (the q173 lesson
# one degree worse).  Baskets are capped to their TRIPLE_MAX_BASKET
# smallest partkeys (deterministic, mirrored in the oracle) before the
# triple explode; capped baskets are counted via df.observe.
TRIPLE_MAX_BASKET = 50


@query(
    "q179_itemset_triples",
    oracle=f"""
    WITH b0 AS (SELECT l_orderkey,
                       (list_sort(list(DISTINCT l_partkey)))[1:{TRIPLE_MAX_BASKET}]
                         AS parts
                FROM lineitem GROUP BY 1),
    b AS (SELECT l_orderkey, unnest(parts) AS l_partkey FROM b0),
    tri AS (
      SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
             z.l_partkey AS part_c, COUNT(*) AS support
      FROM b x
      JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      JOIN b z ON y.l_orderkey = z.l_orderkey AND y.l_partkey < z.l_partkey
      GROUP BY 1, 2, 3
      HAVING COUNT(*) >= {TRIPLE_MIN_SUPPORT}),
    top AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY support DESC, part_a, part_b,
                                   part_c) AS rk
      FROM tri)
    SELECT part_a, part_b, part_c, CAST(support AS BIGINT) AS support,
           CAST(rk AS BIGINT) AS rk
    FROM top WHERE rk <= {TRIPLE_TOP}
    """,
)
def q179_itemset_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent itemset mining one level above q142: the top part
    TRIPLES by co-order support — the 3-way association signal behind
    bundle design and "frequently bought together" at depth 2.

    Scale shape: both triple-building joins are WITHIN an order
    (equi-join on orderkey), and baskets are capped to their
    {TRIPLE_MAX_BASKET} smallest parts BEFORE the explode — C(basket,3)
    is cubic, so one pathological giant basket would otherwise emit
    10^12 triples (the q173 single-linkage lesson, one degree worse).
    Truncation is observable via
    ``BASKET_OBSERVATIONS['q179_itemset_triples']`` and mirrored in the
    oracle, so the contract stays hash-checkable.  The a<b<c ordering
    emits each triple once; the global top-k is orderBy+limit
    (TakeOrderedAndProject) with the rank assigned on the bounded
    {TRIPLE_TOP} rows (the q142 discipline).
    """
    li = table(spark, sf_dir, "lineitem")
    obs = Observation()
    BASKET_OBSERVATIONS["q179_itemset_triples"] = obs
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .observe(
            obs,
            F.count(F.lit(1)).alias("buckets"),
            F.sum(
                (F.size("parts") > TRIPLE_MAX_BASKET).cast("long")
            ).alias("capped_buckets"),
            F.max(F.size("parts")).alias("max_bucket_size"),
        )
    )
    b = baskets.select(
        "l_orderkey",
        F.explode(F.slice("parts", 1, TRIPLE_MAX_BASKET)).alias("l_partkey"),
    )
    x = b.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    y = b.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    z = b.select("l_orderkey", F.col("l_partkey").alias("part_c"))
    tri = (
        x.join(y, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .join(z, "l_orderkey")
        .filter(F.col("part_b") < F.col("part_c"))
        .groupBy("part_a", "part_b", "part_c")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= TRIPLE_MIN_SUPPORT)
    )
    top = tri.orderBy(
        F.col("support").desc(), "part_a", "part_b", "part_c"
    ).limit(TRIPLE_TOP)
    rk = F.row_number().over(
        W.orderBy(F.col("support").desc(), "part_a", "part_b", "part_c")
    )
    return top.select(
        "part_a",
        "part_b",
        "part_c",
        F.col("support").cast("long").alias("support"),
        rk.cast("long").alias("rk"),
    )


# ---------------------------------------------------------------------------
# q180 — revenue Gini concentration per nation (Lorenz inequality)
# ---------------------------------------------------------------------------


@query(
    "q180_gini_concentration",
    oracle="""
    WITH rev AS (
      SELECT s_nationkey, l_suppkey,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS r
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1, 2),
    rk AS (
      SELECT s_nationkey, r,
             ROW_NUMBER() OVER (PARTITION BY s_nationkey
                                ORDER BY r, l_suppkey) AS i
      FROM rev),
    g AS (
      SELECT s_nationkey, COUNT(*) AS n, SUM(r) AS total,
             SUM(i * r) AS weighted
      FROM rk GROUP BY 1)
    SELECT n_name AS nation, CAST(n AS BIGINT) AS n_suppliers,
           (ROUND(total, 2) + 0.0) AS revenue,
           (ROUND(2.0 * weighted / (n * total) - (n + 1.0) / n, 6) + 0.0)
             AS gini
    FROM g JOIN nation ON s_nationkey = n_nationkey
    """,
)
def q180_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of supplier revenue within each nation — the
    Lorenz-curve inequality measure that complements q143's HHI: HHI
    weights the head (market power), Gini reads the whole distribution
    (a long equal tail and a barbell can share an HHI but never a
    Gini).  Computed by the rank formula G = 2*Σ(i*x_i)/(n*Σx) -
    (n+1)/n over revenues ranked ascending.

    Scale shape: lineitem collapses to one row per (nation, supplier)
    in one pushed hash agg (revenue pre-rounded to 2dp so both engines
    rank identical numbers with the suppkey tiebreak); the rank window
    is partitioned per nation over that bounded supplier table; output
    is |nations| rows.
    """
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    rev = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("r")
        )
    )
    iw = W.partitionBy("s_nationkey").orderBy("r", "l_suppkey")
    g = (
        rev.withColumn("i", F.row_number().over(iw))
        .groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n"),
            F.sum("r").alias("total"),
            F.sum(F.col("i") * F.col("r")).alias("weighted"),
        )
    )
    return g.join(nat, g.s_nationkey == nat.n_nationkey).select(
        F.col("n_name").alias("nation"),
        F.col("n").cast("long").alias("n_suppliers"),
        dec(F.col("total"), 2).alias("revenue"),
        dec(
            2.0 * F.col("weighted") / (F.col("n") * F.col("total"))
            - (F.col("n") + 1.0) / F.col("n"),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# q182 — open-order backlog sweep line (daily running balance)
# ---------------------------------------------------------------------------


@query(
    "q182_order_backlog",
    oracle="""
    WITH span AS (
      SELECT o_orderkey, o_orderdate,
             MAX(l_shipdate) AS ship_end
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderkey, o_orderdate),
    deltas AS (
      SELECT o_orderdate AS day, 1 AS opened, 0 AS closed FROM span
      UNION ALL
      SELECT ship_end AS day, 0 AS opened, 1 AS closed FROM span),
    daily AS (
      SELECT day, SUM(opened) AS n_opened, SUM(closed) AS n_closed
      FROM deltas GROUP BY day)
    SELECT day, CAST(n_opened AS BIGINT) AS n_opened,
           CAST(n_closed AS BIGINT) AS n_closed,
           CAST(SUM(n_opened - n_closed) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS open_orders
    FROM daily
    """,
)
def q182_order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time: each order contributes +1 on its
    order date and -1 on the day its last line ships; the running
    balance IS the backlog curve — the fulfilment-capacity twin of
    q118's session sweep line, at daily grain over orders.

    Scale shape: deltas collapse to ONE row per day (bounded |days|
    domain) in a pushed hash agg BEFORE any window, so the cumulative
    sum — integer arithmetic, no float drift — runs over the bounded
    day table only (collapse-first; cf. q171).
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    span = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("ship_end"))
    )
    deltas = span.select(
        F.col("o_orderdate").alias("day"),
        F.lit(1).alias("opened"),
        F.lit(0).alias("closed"),
    ).unionAll(
        span.select(
            F.col("ship_end").alias("day"),
            F.lit(0).alias("opened"),
            F.lit(1).alias("closed"),
        )
    )
    daily = deltas.groupBy("day").agg(
        F.sum("opened").alias("n_opened"), F.sum("closed").alias("n_closed")
    )
    cum_w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        "day",
        F.col("n_opened").cast("long").alias("n_opened"),
        F.col("n_closed").cast("long").alias("n_closed"),
        F.sum(F.col("n_opened") - F.col("n_closed"))
        .over(cum_w)
        .cast("long")
        .alias("open_orders"),
    )


# ---------------------------------------------------------------------------
# q183 — PageRank over the co-order part graph (integer fixed-point)
# ---------------------------------------------------------------------------

PR_ITERS = 5
PR_SCALE = 1_000_000  # fixed-point unit: 1.0 == 1e6 rank units
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as an integer ratio
PR_MIN_COOCCUR = 2  # co-order support floor for an edge
#: Collect-and-solve gate (the q221 BT_COLLECT_PAIRS discipline): when
#: the degree-weighted symmetric edge list fits under this many rows,
#: the {PR_ITERS} power iterations run driver-side over numpy int64
#: arrays — identical floor-division fixed-point arithmetic (all
#: operands positive), bit-identical ranks — replacing the per-round
#: join + agg + checkpoint-cadence jobs with ONE collect.  Above the
#: gate (a 100 TB co-order graph) the distributed loop below runs
#: unchanged.  2M rows x 3 int64 ≈ 48 MB on the driver.
PR_COLLECT_EDGES = 2_000_000


def _pr_collected_solve(spark: SparkSession, shares: DataFrame) -> DataFrame:
    """Driver-side PageRank over the collected (src, dst, deg)
    symmetric edge rows: share = r[src] // deg scatter-adds into
    inflow (``np.add.at`` is an unbuffered integer scatter-add), and
    the damped update floors exactly as the SQL iteration does.  Every
    node appears as a src (the edge list is symmetric), so the node
    table is the distinct src set."""
    import numpy as np

    pdf = shares.toPandas()
    src = pdf["src"].to_numpy(np.int64)
    dst = pdf["dst"].to_numpy(np.int64)
    deg = pdf["deg"].to_numpy(np.int64)
    nodes = np.unique(src)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    base = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    r = np.full(len(nodes), PR_SCALE, np.int64)
    for _ in range(PR_ITERS):
        inflow = np.zeros(len(nodes), np.int64)
        np.add.at(inflow, di, r[si] // deg)
        r = base + (PR_DAMP_NUM * inflow) // PR_DAMP_DEN
    return spark.createDataFrame(
        [(int(n), int(v)) for n, v in zip(nodes, r)],
        schema="part bigint, pagerank_units bigint",
    )


def _q183_oracle() -> str:
    base = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    prev = "pr0"
    iters = []
    for k in range(1, PR_ITERS + 1):
        iters.append(f"""
    pr{k} AS (
      SELECT nd.node,
             CAST({base} + ({PR_DAMP_NUM} * COALESCE(i.inflow, 0))
                  // {PR_DAMP_DEN} AS BIGINT) AS r
      FROM nodes nd LEFT JOIN (
        SELECT s.dst AS node, SUM(p.r // dg.deg) AS inflow
        FROM sym s
        JOIN {prev} p ON p.node = s.src
        JOIN deg dg ON dg.node = s.src
        GROUP BY 1) i ON i.node = nd.node)""")
        prev = f"pr{k}"
    return f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (SELECT x.l_partkey AS src, y.l_partkey AS dst
          FROM b x JOIN b y
            ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= {PR_MIN_COOCCUR}),
    sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
    nodes AS (SELECT DISTINCT src AS node FROM sym),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM sym GROUP BY 1),
    pr0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS r FROM nodes),
    {','.join(iters)}
    SELECT node AS part, r AS pagerank_units FROM {prev}
    """


@query("q183_part_pagerank", oracle=_q183_oracle())
def q183_part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the co-order part graph ({PR_ITERS} power
    iterations, damping {PR_DAMP_NUM}/{PR_DAMP_DEN}) — graph centrality
    as the "anchor product" signal assortment and recommendation
    ranking use where raw degree over-counts bulk orders.

    Everything runs in INTEGER fixed-point ({PR_SCALE} units == rank
    1.0): each node ships floor(r/deg) units along every edge and the
    damped update is floor(85*inflow/100) + base.  Integer sums are
    order-independent, so the result is bit-identical across engines
    with NO rounding discipline — the float-free way to make iterative
    numerics oracle-checkable (cf. q69's integer closure).

    Scale shape: edges are within-order pair explodes (Σ C(basket, 2),
    the q142 bound) with a support floor, aggregated to the distinct
    degree-weighted edge list before any iteration.  Under
    PR_COLLECT_EDGES the power iterations solve driver-side in numpy
    int64 (``_pr_collected_solve`` — one collect instead of per-round
    join/agg/checkpoint jobs, the q221 collect-and-solve lever); above
    it each iteration is ONE node-keyed join + ONE hash agg,
    localCheckpointed so round r's plan never re-derives rounds
    1..r-1 (the q101/graph.py loop discipline); output is |parts in
    the graph| rows either way.
    """
    li = table(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey").distinct()
    x = b.select("l_orderkey", F.col("l_partkey").alias("src"))
    y = b.select("l_orderkey", F.col("l_partkey").alias("dst"))
    e = (
        x.join(y, "l_orderkey")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= PR_MIN_COOCCUR)
        .select("src", "dst")
    )
    sym = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # The round loop reads nodes and the degree-weighted edge list
    # every iteration — persist the DERIVED tables (not raw sym), so a
    # round costs one join + one agg instead of re-running the edge
    # build's distinct/groupBy chain five times.
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("deg")
    )
    # localCheckpoint (not a bare persist) so the staged edge-build
    # plan stays visible to the PLANS.md capture hook, and the route
    # probe's count reads the materialized table.
    shares = local_checkpoint(
        sym.join(deg, sym.src == deg.node).select(
            F.col("src"), F.col("dst"), F.col("deg")
        ),
        "q183 degree-weighted edges",
    )
    def _distributed(sh: DataFrame) -> DataFrame:
        nodes = deg.select("node").persist()
        base = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
        cur = local_checkpoint(
            nodes.select("node", F.lit(PR_SCALE).cast("long").alias("r")),
            "pr_init",
        )
        for i in range(PR_ITERS):
            inflow = (
                sh.join(cur, sh.src == cur.node)
                .select(
                    F.col("dst").alias("node"),
                    F.expr("r div deg").alias("share"),
                )
                .groupBy("node")
                .agg(F.sum("share").alias("inflow"))
            )
            nxt = nodes.join(inflow, "node", "left").select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({PR_DAMP_NUM} * coalesce(inflow, 0)) div {PR_DAMP_DEN}"
                    )
                )
                .cast("long")
                .alias("r"),
            )
            # Checkpoint every SECOND round (the q221 r8 discipline):
            # each eager localCheckpoint is a scheduled job, and a
            # two-round lineage over the persisted shares/nodes stays
            # bounded; values are checkpoint-placement-independent
            # integers.
            cur = (
                local_checkpoint(nxt, "pr_round")
                if i % 2 == 1 or i == PR_ITERS - 1
                else nxt
            )
        nodes.unpersist()
        return cur.select(
            F.col("node").alias("part"), F.col("r").alias("pagerank_units")
        )

    # Route probe (plans.route shared gate): under the gate the whole
    # iteration is bounded control plane — solve driver-side (VERDICT
    # r8's q221 lever applied to the other iterative slot).
    return collect_and_solve(
        shares,
        PR_COLLECT_EDGES,
        "q183_part_pagerank",
        lambda sh: _pr_collected_solve(spark, sh),
        _distributed,
    )


# ---------------------------------------------------------------------------
# q184 — open-order aging report at the latest snapshot date
# ---------------------------------------------------------------------------


@query(
    "q184_order_aging",
    oracle="""
    WITH span AS (
      SELECT o_orderkey, o_orderdate, o_totalprice,
             MAX(l_shipdate) AS ship_end
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2, 3),
    s AS (SELECT MAX(o_orderdate) AS snap FROM orders),
    open_o AS (
      SELECT date_diff('day', o_orderdate, snap) AS age, o_totalprice
      FROM span, s
      WHERE o_orderdate <= snap AND ship_end > snap)
    SELECT CASE WHEN age <= 30 THEN '0-30'
                WHEN age <= 60 THEN '31-60'
                WHEN age <= 90 THEN '61-90'
                ELSE '90+' END AS age_bucket,
           COUNT(*) AS n_orders,
           (ROUND(SUM(o_totalprice), 2) + 0.0) AS open_value
    FROM open_o GROUP BY 1
    """,
)
def q184_order_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order aging report: orders placed but not fully shipped as
    of the latest order date, bucketed by how long they have been open
    (0-30/31-60/61-90/90+ days) with the capital tied up in each
    bucket — the accounts-receivable-style aging cut every fulfilment
    dashboard carries next to q182's backlog curve.

    Scale shape: one per-order collapse (orderkey hash agg), a 1-row
    snapshot-date broadcast attach (cf. q100), and a 4-row output agg.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    span = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.max("l_shipdate").alias("ship_end"))
    )
    snap = orders.agg(F.max("o_orderdate").alias("snap"))
    age = F.datediff(F.col("snap"), F.col("o_orderdate"))
    bucket = (
        F.when(age <= 30, "0-30")
        .when(age <= 60, "31-60")
        .when(age <= 90, "61-90")
        .otherwise("90+")
    )
    return (
        span.crossJoin(F.broadcast(snap))
        .filter(
            (F.col("o_orderdate") <= F.col("snap"))
            & (F.col("ship_end") > F.col("snap"))
        )
        .groupBy(bucket.alias("age_bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            dec(F.sum("o_totalprice"), 2).alias("open_value"),
        )
    )


# ---------------------------------------------------------------------------
# q188 — split-shipment analysis per order priority
# ---------------------------------------------------------------------------


@query(
    "q188_split_shipments",
    oracle="""
    WITH per_order AS (
      SELECT o_orderkey, o_orderpriority,
             COUNT(DISTINCT l_shipdate) AS n_ship_days,
             date_diff('day', MIN(l_shipdate), MAX(l_shipdate)) AS spread_days,
             COUNT(*) AS n_lines
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2)
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN n_ship_days > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_split,
           (ROUND(AVG(CASE WHEN n_ship_days > 1 THEN 1.0 ELSE 0.0 END), 6)
             + 0.0) AS split_rate,
           (ROUND(AVG(spread_days), 4) + 0.0) AS avg_spread_days,
           (ROUND(AVG(n_lines), 4) + 0.0) AS avg_lines
    FROM per_order GROUP BY 1
    """,
)
def q188_split_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-shipment analysis: per order priority, how many orders ship
    across more than one day, the average first-to-last shipment spread,
    and basket size — the fulfilment-fragmentation metric behind
    packaging cost and delivery-experience dashboards (a split order is
    N deliveries the customer didn't ask for).

    Scale shape: one per-order hash agg (distinct ship days via the
    orderkey-partitioned aggregate — bounded by lines per order), one
    |priorities|-row output agg.  Integer day spreads; rates/averages
    rounded per the float discipline.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    per_order = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.countDistinct("l_shipdate").alias("n_ship_days"),
            F.datediff(F.max("l_shipdate"), F.min("l_shipdate")).alias(
                "spread_days"
            ),
            F.count("*").alias("n_lines"),
        )
    )
    split = F.when(F.col("n_ship_days") > 1, 1.0).otherwise(0.0)
    return per_order.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(split.cast("int")).cast("long").alias("n_split"),
        dec(F.avg(split), 6).alias("split_rate"),
        dec(F.avg("spread_days"), 4).alias("avg_spread_days"),
        dec(F.avg("n_lines"), 4).alias("avg_lines"),
    )


# ---------------------------------------------------------------------------
# q189 — discount elasticity by brand (Pearson correlation + OLS slope)
# ---------------------------------------------------------------------------

ELASTICITY_MIN_N = 30  # brands with fewer observations are noise


@query(
    "q189_discount_elasticity",
    oracle=f"""
    WITH j AS (
      SELECT p_brand, l_discount AS x, l_quantity AS y
      FROM lineitem JOIN part ON l_partkey = p_partkey),
    m AS (
      SELECT p_brand, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x*x) AS sxx,
             SUM(y*y) AS syy, SUM(x*y) AS sxy
      FROM j GROUP BY 1 HAVING COUNT(*) >= {ELASTICITY_MIN_N})
    SELECT p_brand, CAST(n AS BIGINT) AS n,
           {sql_dec('(n*sxy - sx*sy) / (n*sxx - sx*sx)', 6)} AS slope,
           {sql_dec('(n*sxy - sx*sy) / (SQRT(n*sxx - sx*sx) * SQRT(n*syy - sy*sy))', 6)}
             AS pearson_r
    FROM m
    """,
)
def q189_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount elasticity by brand: OLS slope and Pearson correlation
    of quantity against discount — the pricing-analytics primitive
    ("does discounting this brand move volume?"), with a minimum-
    observation floor so thin brands don't report noise.

    Scale shape: ONE hash agg of mergeable moments (n, Σx, Σy, Σx²,
    Σy², Σxy) per brand — the q150 OLS discipline: partial aggregation
    combines map-side, no window, no second pass; slope and r derive
    from the moments in closed form and round to 6dp (the only
    order-dependent step is the float moment sums, same rounding
    contract as every aggregate in the corpus).
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey).select(
        "p_brand",
        F.col("l_discount").alias("x"),
        F.col("l_quantity").alias("y"),
    )
    m = (
        j.groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
        .filter(F.col("n") >= ELASTICITY_MIN_N)
    )
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "p_brand",
        F.col("n").cast("long").alias("n"),
        dec(cov_n / var_x, 6).alias("slope"),
        dec(cov_n / (F.sqrt(var_x) * F.sqrt(var_y)), 6).alias("pearson_r"),
    )


# ---------------------------------------------------------------------------
# q191 — supplier SLA league table (worst p90 ship latency, floored n)
# ---------------------------------------------------------------------------

SLA_MIN_LINES = 20
SLA_TOP = 15


@query(
    "q191_supplier_sla",
    oracle=f"""
    WITH t AS (
      SELECT l_suppkey, date_diff('day', o_orderdate, l_shipdate) AS days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    g AS (
      SELECT l_suppkey, COUNT(*) AS n,
             ROUND(quantile_cont(days, 0.5), 4) AS p50,
             ROUND(quantile_cont(days, 0.9), 4) AS p90
      FROM t GROUP BY 1 HAVING COUNT(*) >= {SLA_MIN_LINES}),
    top AS (
      SELECT s_name, n, p50, p90,
             ROW_NUMBER() OVER (ORDER BY p90 DESC, s_name) AS rk
      FROM g JOIN supplier ON l_suppkey = s_suppkey)
    SELECT s_name, CAST(n AS BIGINT) AS n_lines,
           (p50 + 0.0) AS p50_days, (p90 + 0.0) AS p90_days,
           CAST(rk AS BIGINT) AS rk
    FROM top WHERE rk <= {SLA_TOP}
    """,
)
def q191_supplier_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier SLA league table: the {SLA_TOP} suppliers with the worst
    p90 order-to-ship latency (minimum {SLA_MIN_LINES} lines so thin
    suppliers don't top the board on noise) — the vendor-scorecard cut
    procurement reviews run weekly.

    Scale shape: the percentile groups are PER SUPPLIER — group size is
    lines/suppliers, which stays bounded as both grow with SF (unlike
    the q141/q154 few-groups regime), so the exact per-group percentile
    is safe here; ranking on the 4dp-rounded p90 with a name tiebreak;
    global top-k via orderBy+limit with the rank assigned on the
    bounded {SLA_TOP} rows (the q142 discipline).
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    sup = table(spark, sf_dir, "supplier")
    t = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_suppkey", F.datediff("l_shipdate", "o_orderdate").alias("days")
    )
    g = (
        t.groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n"),
            F.round(F.expr("percentile(days, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(days, 0.9)"), 4).alias("p90"),
        )
        .filter(F.col("n") >= SLA_MIN_LINES)
    )
    j = g.join(sup, g.l_suppkey == sup.s_suppkey)
    top = j.orderBy(F.col("p90").desc(), "s_name").limit(SLA_TOP)
    rk = F.row_number().over(W.orderBy(F.col("p90").desc(), "s_name"))
    return top.select(
        "s_name",
        F.col("n").cast("long").alias("n_lines"),
        (F.col("p50") + 0.0).alias("p50_days"),
        (F.col("p90") + 0.0).alias("p90_days"),
        rk.cast("long").alias("rk"),
    )


# ---------------------------------------------------------------------------
# q193 — customer cohort LTV triangle (revenue by cohort x month offset)
# ---------------------------------------------------------------------------


@query(
    "q193_cohort_ltv",
    oracle="""
    WITH first_o AS (
      SELECT o_custkey, date_trunc('month', MIN(o_orderdate)) AS cohort
      FROM orders GROUP BY 1),
    j AS (
      SELECT f.cohort,
             date_diff('month', f.cohort,
                       date_trunc('month', o.o_orderdate)) AS month_offset,
             o.o_totalprice
      FROM orders o JOIN first_o f ON o.o_custkey = f.o_custkey
      WHERE date_diff('month', f.cohort,
                      date_trunc('month', o.o_orderdate)) <= 11),
    sizes AS (SELECT cohort, COUNT(*) AS cohort_size FROM first_o GROUP BY 1),
    g AS (SELECT cohort, month_offset,
                 SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS revenue_cents
          FROM j GROUP BY 1, 2)
    SELECT g.cohort, CAST(g.month_offset AS BIGINT) AS month_offset,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           (CAST(g.revenue_cents AS BIGINT) / 100.0 + 0.0) AS revenue,
           (CAST((200 * SUM(g.revenue_cents) OVER (
                    PARTITION BY g.cohort ORDER BY g.month_offset
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  + s.cohort_size) // (2 * s.cohort_size)
                 AS BIGINT) / 10000.0 + 0.0) AS cum_ltv_per_customer
    FROM g JOIN sizes s ON g.cohort = s.cohort
    """,
)
def q193_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-cohort LTV triangle: revenue by (first-order cohort
    month x month offset, first year) with the running cumulative LTV
    per cohort customer — q78's retention triangle at the REVENUE
    level, the payback-period curve growth teams steer spend by.

    Scale shape: one per-customer min-collapse assigns cohorts, one
    (cohort, offset) hash agg collapses orders (offset capped at 11 —
    bounded triangle), cohort sizes join on the bounded cohort key, and
    the cumulative window is per cohort over <= 12 rows.

    Parity: revenue accumulates as EXACT integer cents (the q281
    FLOOR(x·100 + 0.5) pattern) — the earlier ROUND(SUM(double), 2)
    design hit 4-dp midpoints where the engines' ROUND implementations
    disagree (found by the full sf0.1 sweep, r10; cents/(100·size) has
    a TERMINATING decimal expansion, so exact .xxxx5 midpoints are
    common, unlike the irrational quotients the dec()/ROUND pair
    normally sees).  The 4-dp cut is therefore computed in INTEGER
    half-up arithmetic — (200·cum_cents + size) div (2·size), exact in
    both engines — and only then divided by the 1e4 power of ten (one
    identical IEEE op).
    """
    orders = table(spark, sf_dir, "orders")
    first_o = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort")
    )
    offset = (
        (F.year(F.date_trunc("month", "o_orderdate")) - F.year("cohort")) * 12
        + F.month(F.date_trunc("month", "o_orderdate"))
        - F.month("cohort")
    )
    j = (
        orders.join(first_o, "o_custkey")
        .select("cohort", offset.alias("month_offset"), "o_totalprice")
        .filter(F.col("month_offset") <= 11)
    )
    sizes = first_o.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    g = j.groupBy("cohort", "month_offset").agg(
        F.sum(
            F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")
        ).alias("revenue_cents")
    )
    cum_w = (
        W.partitionBy("cohort")
        .orderBy("month_offset")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return g.join(sizes, "cohort").select(
        "cohort",
        F.col("month_offset").cast("long").alias("month_offset"),
        F.col("cohort_size").cast("long").alias("cohort_size"),
        "revenue_cents",
        # DECIMAL(38,0) accumulation (the q288/q281 overflow rule,
        # ADVICE r10 #1): per-cohort cumulative cents · 200 has only
        # ~2x BIGINT headroom at the 100 TB bar, where Spark's BIGINT
        # window SUM would wrap silently while DuckDB's promotes to
        # HUGEINT — so both the running sum and the half-up multiply
        # run in DECIMAL(38,0) before the final BIGINT cast.
        F.sum(F.col("revenue_cents").cast("decimal(38,0)"))
        .over(cum_w)
        .alias("cum_cents"),
    ).select(
        "cohort",
        "month_offset",
        "cohort_size",
        (F.col("revenue_cents") / F.lit(100.0) + F.lit(0.0)).alias("revenue"),
        (
            F.expr(
                "CAST((200 * cum_cents + cohort_size)"
                " div (2 * cohort_size) AS BIGINT)"
            )
            / F.lit(10000.0)
            + F.lit(0.0)
        ).alias("cum_ltv_per_customer"),
    )


# ---------------------------------------------------------------------------
# q194 — Mann-Whitney U rank-sum test (discounted vs full-price latency)
# ---------------------------------------------------------------------------


@query(
    "q194_mann_whitney_latency",
    oracle="""
    WITH lat AS (
      SELECT date_diff('day', o_orderdate, l_shipdate) AS days,
             (l_discount > 0)::INT AS grp
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    c AS (SELECT days, SUM(grp) AS n1v, SUM(1 - grp) AS n2v, COUNT(*) AS cnt
          FROM lat GROUP BY days),
    r AS (SELECT days, n1v, n2v, cnt,
                 COALESCE(SUM(cnt) OVER (ORDER BY days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + (cnt + 1) / 2.0 AS rank_avg
          FROM c),
    s AS (SELECT SUM(n1v) AS n1, SUM(n2v) AS n2,
                 SUM(n1v * rank_avg) AS r1,
                 SUM(cnt * cnt * cnt - cnt) AS ties
          FROM r)
    SELECT CAST(n1 AS BIGINT) AS n_discounted,
           CAST(n2 AS BIGINT) AS n_full_price,
           (ROUND(r1 - n1 * (n1 + 1) / 2.0, 2) + 0.0) AS u1,
           (ROUND((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
              / sqrt(n1 * n2 / 12.0
                     * ((n1 + n2 + 1)
                        - ties / ((n1 + n2) * (n1 + n2 - 1.0)))), 6)
            + 0.0) AS z
    FROM s
    """,
)
def q194_mann_whitney_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test: do discounted lineitems ship on a
    different latency distribution than full-price ones?  The
    nonparametric two-sample test (no normality assumption — exactly
    what skewed latency distributions need), with average ranks for
    ties and the tie-corrected normal approximation z.

    Scale shape: latencies collapse to the bounded (days, group-count)
    table FIRST — |distinct transit days| rows at any SF — so the rank
    assignment is a cumulative over a bounded domain (allowlisted
    global window), and the test statistic is one 1-row aggregate of
    half-integer rank sums.  All sums before the final division are
    exact in doubles (integer counts and .5 steps), so cross-engine
    parity needs only the final 6dp round.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.datediff("l_shipdate", "o_orderdate").alias("days"),
        (F.col("l_discount") > 0).cast("int").alias("grp"),
    )
    c = lat.groupBy("days").agg(
        F.sum("grp").alias("n1v"),
        F.sum(1 - F.col("grp")).alias("n2v"),
        F.count("*").alias("cnt"),
    )
    cum_w = W.orderBy("days").rowsBetween(W.unboundedPreceding, -1)
    r = c.withColumn(
        "rank_avg",
        F.coalesce(F.sum("cnt").over(cum_w), F.lit(0))
        + (F.col("cnt") + 1) / 2.0,
    )
    s = r.agg(
        F.sum("n1v").alias("n1"),
        F.sum("n2v").alias("n2"),
        F.sum(F.col("n1v") * F.col("rank_avg")).alias("r1"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("ties"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    u1 = F.col("r1") - n1 * (n1 + 1) / 2.0
    sigma = F.sqrt(
        n1 * n2 / 12.0
        * ((n1 + n2 + 1) - F.col("ties") / ((n1 + n2) * (n1 + n2 - 1.0)))
    )
    return s.select(
        n1.cast("long").alias("n_discounted"),
        n2.cast("long").alias("n_full_price"),
        dec(u1, 2).alias("u1"),
        dec((u1 - n1 * n2 / 2.0) / sigma, 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# q198 — order-priority Markov transition matrix (per-customer chains)
# ---------------------------------------------------------------------------


@query(
    "q198_priority_markov",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderpriority AS cur,
             LAG(o_orderpriority) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS prev
      FROM orders),
    t AS (SELECT prev, cur, COUNT(*) AS n
          FROM seq WHERE prev IS NOT NULL GROUP BY prev, cur),
    tot AS (SELECT prev, SUM(n) AS row_n FROM t GROUP BY prev)
    SELECT t.prev AS from_priority, t.cur AS to_priority,
           CAST(t.n AS BIGINT) AS n_transitions,
           (ROUND(t.n * 1.0 / tot.row_n, 6) + 0.0) AS p
    FROM t JOIN tot ON t.prev = tot.prev
    """,
)
def q198_priority_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each customer's
    order-priority sequence: P(next priority | current priority) —
    the behavioral-sequence model behind "does a rush order beget
    rush orders", same machinery as churn-state or intent-transition
    estimation on event streams.

    Scale shape: ONE customer-partitioned LAG window (orders per
    customer is activity-bounded, never corpus-scale), then the
    transition agg collapses to the ≤ |priorities|² = 25-row matrix;
    probabilities row-normalize on that bounded table.  Ties in
    order dates break on o_orderkey so the chain order is
    engine-agreed.
    """
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        F.col("o_orderpriority").alias("cur"),
        F.lag("o_orderpriority").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    t = seq.groupBy("prev", "cur").agg(F.count("*").alias("n"))
    tot = t.groupBy("prev").agg(F.sum("n").alias("row_n"))
    return t.join(tot, "prev").select(
        F.col("prev").alias("from_priority"),
        F.col("cur").alias("to_priority"),
        F.col("n").cast("long").alias("n_transitions"),
        dec(F.col("n") * 1.0 / F.col("row_n"), 6).alias("p"),
    )


# ---------------------------------------------------------------------------
# q237 — incremental view maintenance of a join view (delta-join algebra)
# ---------------------------------------------------------------------------

#: batch boundaries splitting each base table into (base, delta): rows
#: at/after the cut are "today's batch".  Any split works — the
#: algebra must reproduce the full recompute for every split.
IVM_ORDER_CUT = "1996-01-01"
IVM_SHIP_CUT = "1996-06-01"


@query(
    "q237_ivm_delta_join",
    oracle=f"""
    WITH li AS (
      SELECT l_orderkey, CAST(FLOOR(l_extendedprice * (1 - l_discount)
                   * 100 + 0.5) AS BIGINT) AS rev,
             (l_shipdate >= DATE '{IVM_SHIP_CUT}') AS d
      FROM lineitem),
    o AS (
      SELECT o_orderkey, c_nationkey AS nk,
             (o_orderdate >= DATE '{IVM_ORDER_CUT}') AS d
      FROM orders JOIN customer ON o_custkey = c_custkey),
    full_v AS (
      SELECT o.nk, SUM(li.rev) AS v
      FROM o JOIN li ON li.l_orderkey = o.o_orderkey GROUP BY 1),
    base_v AS (
      SELECT o.nk, SUM(li.rev) AS v
      FROM o JOIN li ON li.l_orderkey = o.o_orderkey
      WHERE NOT o.d AND NOT li.d GROUP BY 1),
    dv AS (
      SELECT o.nk, SUM(li.rev) AS v
      FROM o JOIN li ON li.l_orderkey = o.o_orderkey
      WHERE o.d OR li.d GROUP BY 1),
    ivm AS (
      SELECT COALESCE(b.nk, dv.nk) AS nk,
             COALESCE(b.v, 0) + COALESCE(dv.v, 0) AS v
      FROM base_v b FULL OUTER JOIN dv ON dv.nk = b.nk)
    SELECT n.n_name AS nation,
           CAST(f.v AS BIGINT) AS full_recompute_cents,
           CAST(i.v AS BIGINT) AS ivm_cents,
           (f.v = i.v) AS consistent
    FROM full_v f
    JOIN ivm i ON i.nk = f.nk
    JOIN nation n ON n.n_nationkey = f.nk
    """,
)
def q237_ivm_delta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of the revenue-per-nation JOIN
    view: with each base table split into (base, delta) batches, the
    delta-join algebra ΔV = ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB — computed
    here as ONE pass over the pre-joined rows where either side is new
    — must land the view exactly on the full recompute, cent for cent.
    q161 maintains an AGGREGATE incrementally; this is the JOIN-view
    counterpart (the algebra every materialized-view refresh engine
    implements), with the full recompute carried alongside as the
    audit.

    Parity: revenue is integer cents; both the recompute and the
    base+delta path are integer sums; `consistent` is an integer
    equality — the query PROVES the algebra in both engines.

    Scale shape: at refresh time only the delta predicate's rows feed
    the maintenance join (partition-pruned by ship/order date at
    100 TB), so the incremental cost tracks the batch, not the base;
    the full recompute here exists solely as the audit baseline.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr(
            "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)"
            " AS BIGINT)"
        ).alias("rev"),
        (F.col("l_shipdate") >= F.lit(IVM_SHIP_CUT).cast("date")).alias("ld"),
    )
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    o = orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        "o_orderkey",
        F.col("c_nationkey").alias("nk"),
        (F.col("o_orderdate") >= F.lit(IVM_ORDER_CUT).cast("date")).alias("od"),
    )
    joined = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "nk", "rev", "od", "ld"
    )
    full_v = joined.groupBy("nk").agg(F.sum("rev").alias("fv"))
    base_v = (
        joined.filter(~F.col("od") & ~F.col("ld"))
        .groupBy("nk")
        .agg(F.sum("rev").alias("bv"))
    )
    dv = (
        joined.filter(F.col("od") | F.col("ld"))
        .groupBy("nk")
        .agg(F.sum("rev").alias("dv"))
    )
    ivm = (
        base_v.join(dv, "nk", "full")
        .select(
            "nk",
            (
                F.coalesce(F.col("bv"), F.lit(0))
                + F.coalesce(F.col("dv"), F.lit(0))
            ).alias("iv"),
        )
    )
    nation = table(spark, sf_dir, "nation")
    return (
        full_v.join(ivm, "nk")
        .join(nation, F.col("nk") == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("fv").cast("long").alias("full_recompute_cents"),
            F.col("iv").cast("long").alias("ivm_cents"),
            (F.col("fv") == F.col("iv")).alias("consistent"),
        )
    )


# ---------------------------------------------------------------------------
# q238 — online aggregation with Hoeffding guarantees (AQP audit)
# ---------------------------------------------------------------------------

#: declared value range for the Hoeffding bound (the operator's input
#: contract — o_totalprice lives in [0, 600k] at every TPC-H scale).
AQP_RANGE = 600_000.0
#: ln(2/delta) for delta = 0.05, precomputed as a literal (the q230
#: rule: no engine ln() in the data path).
AQP_LN2D = 3.6888794541139363
#: sampling ladder: md5 bucket of 1024, keep bucket < 1024*frac.
AQP_STEPS = ((4, "1/256"), (16, "1/64"), (64, "1/16"), (256, "1/4"))


def _q238_oracle() -> str:
    steps = []
    for keep, lbl in AQP_STEPS:
        steps.append(f"""
    SELECT '{lbl}' AS sample_frac,
           CAST(COUNT(*) FILTER (WHERE b < {keep}) AS BIGINT) AS n_sampled,
           (ROUND(SUM(y) FILTER (WHERE b < {keep}) * 1e0
                  / COUNT(*) FILTER (WHERE b < {keep}) / 100, 2) + 0.0)
             AS est_mean,
           (ROUND({AQP_RANGE} * sqrt({AQP_LN2D}
                  / (2 * COUNT(*) FILTER (WHERE b < {keep}))), 2) + 0.0)
             AS hoeffding_eps,
           (ROUND(SUM(y) * 1e0 / COUNT(*) / 100, 2) + 0.0) AS exact_mean,
           (ABS(SUM(y) FILTER (WHERE b < {keep}) * 1e0
                / COUNT(*) FILTER (WHERE b < {keep}) / 100
                - SUM(y) * 1e0 / COUNT(*) / 100)
            <= {AQP_RANGE} * sqrt({AQP_LN2D}
                 / (2 * COUNT(*) FILTER (WHERE b < {keep}))))
             AS within_bound
    FROM s""")
    return f"""
    WITH s AS MATERIALIZED (
      SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS y,
             ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
               % 1024 AS b
      FROM orders)
    {' UNION ALL '.join(steps)}
    """


@query("q238_online_agg_hoeffding", oracle=_q238_oracle())
def q238_online_agg_hoeffding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online aggregation (Hellerstein 1997) audit: the mean order
    value estimated from a deterministic md5 sampling ladder
    (1/256 → 1/4), each step reporting its Hoeffding 95% half-width
    ε = R·√(ln(2/δ)/2n) and whether the estimate actually landed
    within ε of the truth — the approximate-query-processing contract
    ("stop scanning when the bound is tight enough") made
    hash-checkable by the deterministic sample.

    Parity: the sample ladder is the md5-bucket coin (nested: smaller
    fractions are subsets of larger — the online-agg refinement
    property), sums/counts are exact integers, ε multiplies them into
    a precomputed literal (no engine ln() on data, the q230 rule), and
    every comparison runs on identically-derived doubles.

    Scale shape: ONE scan, ONE aggregate — every step is a FILTER
    aggregate over the same pass (Spark computes all ladder steps in
    one map-side combine); at 100 TB the production mode stops the
    scan at the first ε below target instead of auditing all steps.
    """
    orders = table(spark, sf_dir, "orders")
    s = orders.select(
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("y"),
        (
            F.conv(
                F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % 1024
        ).alias("b"),
    )
    aggs = [F.sum("y").alias("ty"), F.count("*").alias("tn")]
    for keep, lbl in AQP_STEPS:
        tag = str(keep)
        aggs.append(
            F.sum(F.when(F.col("b") < keep, F.col("y"))).alias(f"sy{tag}")
        )
        aggs.append(
            F.count(F.when(F.col("b") < keep, F.lit(1))).alias(f"sn{tag}")
        )
    m = s.agg(*aggs)
    out = None
    for keep, lbl in AQP_STEPS:
        tag = str(keep)
        est = F.col(f"sy{tag}") * F.expr("1e0") / F.col(f"sn{tag}") / 100
        exact = F.col("ty") * F.expr("1e0") / F.col("tn") / 100
        eps = F.lit(AQP_RANGE) * F.sqrt(
            F.lit(AQP_LN2D) / (2 * F.col(f"sn{tag}"))
        )
        row = m.select(
            F.lit(lbl).alias("sample_frac"),
            F.col(f"sn{tag}").cast("long").alias("n_sampled"),
            dec(est, 2).alias("est_mean"),
            dec(eps, 2).alias("hoeffding_eps"),
            dec(exact, 2).alias("exact_mean"),
            (F.abs(est - exact) <= eps).alias("within_bound"),
        )
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# q240 — zone-map pruning audit (data-layout skipping effectiveness)
# ---------------------------------------------------------------------------

#: rows per simulated file chunk, keyed by orderkey range (map-side —
#: no global row numbering), and the audit predicate: one quarter of
#: the 7-year shipdate domain.
ZM_CHUNK = 4_000
ZM_LO, ZM_HI = "1995-01-01", "1995-04-01"


@query(
    "q240_zonemap_pruning",
    oracle=f"""
    WITH c AS (
      SELECT l_orderkey // {ZM_CHUNK} AS chunk,
             MIN(l_shipdate) AS mn, MAX(l_shipdate) AS mx,
             COUNT(*) AS n,
             SUM(CASE WHEN l_shipdate >= DATE '{ZM_LO}'
                       AND l_shipdate < DATE '{ZM_HI}'
                      THEN 1 ELSE 0 END) AS n_match
      FROM lineitem GROUP BY 1),
    a AS (
      SELECT COUNT(*) AS n_chunks,
             SUM(CASE WHEN mx >= DATE '{ZM_LO}' AND mn < DATE '{ZM_HI}'
                      THEN 1 ELSE 0 END) AS n_scanned,
             SUM(n) AS n_rows,
             SUM(CASE WHEN mx >= DATE '{ZM_LO}' AND mn < DATE '{ZM_HI}'
                      THEN n ELSE 0 END) AS rows_scanned,
             SUM(n_match) AS rows_matched
      FROM c)
    SELECT CAST(n_chunks AS BIGINT) AS n_chunks,
           CAST(n_scanned AS BIGINT) AS chunks_scanned,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(rows_scanned AS BIGINT) AS rows_scanned,
           CAST(rows_matched AS BIGINT) AS rows_matched,
           (ROUND(1e0 - n_scanned * 1e0 / n_chunks, 4) + 0.0)
             AS chunk_prune_rate,
           (ROUND(rows_matched * 1e0 / rows_scanned, 4) + 0.0)
             AS scan_efficiency
    FROM a
    """,
)
def q240_zonemap_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max skipping) effectiveness audit: partition the
    fact table into orderkey-range "file chunks" of {ZM_CHUNK} orders,
    compute each chunk's shipdate min/max zone map, and measure how
    many chunks a [{ZM_LO}, {ZM_HI}) predicate could skip and how many
    of the scanned rows actually match — the layout diagnostic that
    tells you whether q160's Z-order / date clustering is WORTH a
    rewrite (natural orderkey layout correlates only loosely with
    shipdate, so expect low prune rates; a date-sorted layout sends
    the prune rate toward the predicate's time fraction).

    Parity: chunk ids are integer key division (map-side, no global
    row numbering), zone maps are MIN/MAX dates, every measure an
    exact integer; two ratios at the edge.

    Scale shape: ONE scan → chunk-keyed hash agg (map-side combine; at
    100 TB this is exactly the per-row-group metadata parquet already
    stores — the audit reads data once to validate what the layout
    engine would then exploit for free).
    """
    li = table(spark, sf_dir, "lineitem")
    lo = F.lit(ZM_LO).cast("date")
    hi = F.lit(ZM_HI).cast("date")
    c = li.groupBy(F.expr(f"l_orderkey div {ZM_CHUNK}").alias("chunk")).agg(
        F.min("l_shipdate").alias("mn"),
        F.max("l_shipdate").alias("mx"),
        F.count("*").alias("n"),
        F.sum(
            ((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)).cast(
                "long"
            )
        ).alias("n_match"),
    )
    scanned = (F.col("mx") >= lo) & (F.col("mn") < hi)
    a = c.agg(
        F.count("*").alias("n_chunks"),
        F.sum(scanned.cast("long")).alias("n_scanned"),
        F.sum("n").alias("n_rows"),
        F.sum(F.when(scanned, F.col("n")).otherwise(0)).alias("rows_scanned"),
        F.sum("n_match").alias("rows_matched"),
    )
    return a.select(
        F.col("n_chunks").cast("long"),
        F.col("n_scanned").cast("long").alias("chunks_scanned"),
        F.col("n_rows").cast("long"),
        F.col("rows_scanned").cast("long"),
        F.col("rows_matched").cast("long"),
        dec(
            F.expr("1e0") - F.col("n_scanned") * F.expr("1e0") / F.col("n_chunks"),
            4,
        ).alias("chunk_prune_rate"),
        dec(
            F.col("rows_matched") * F.expr("1e0") / F.col("rows_scanned"), 4
        ).alias("scan_efficiency"),
    )


# ---------------------------------------------------------------------------
# q241 — equi-width histogram selectivity audit (CBO estimator check)
# ---------------------------------------------------------------------------

HIST_BUCKETS = 20
#: audited range predicates on o_totalprice, in whole dollars.
HIST_PREDS = (
    ("narrow_low", 1_000, 20_000),
    ("mid_band", 50_000, 100_000),
    ("wide", 20_000, 300_000),
    ("upper_tail", 400_000, 600_000),
    ("full", 0, 700_000),
)


def _q241_oracle() -> str:
    rows = []
    for lbl, a, b in HIST_PREDS:
        a_c, b_c = a * 100, b * 100
        rows.append(f"""
    SELECT '{lbl}' AS predicate,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s
            WHERE y >= {a_c} AND y < {b_c}) AS exact_rows,
           (SELECT (ROUND(SUM(n * GREATEST(0, LEAST(hi, {b_c})
                                - GREATEST(lo, {a_c}))) * 1e0 / MAX(w), 2)
                    + 0.0)
            FROM h) AS est_rows""")
    return f"""
    WITH s AS MATERIALIZED (
      SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS y
      FROM orders),
    bounds AS (SELECT MIN(y) AS mn,
                      (MAX(y) - MIN(y)) // {HIST_BUCKETS} + 1 AS w
               FROM s),
    h AS MATERIALIZED (
      SELECT (s.y - b.mn) // b.w AS bucket,
             MIN(b.mn + ((s.y - b.mn) // b.w) * b.w) AS lo,
             MIN(b.mn + ((s.y - b.mn) // b.w + 1) * b.w) AS hi,
             COUNT(*) AS n,
             MAX(b.w) AS w
      FROM s CROSS JOIN bounds b
      GROUP BY 1),
    u AS ({' UNION ALL '.join(rows)})
    SELECT predicate, exact_rows, est_rows,
           (ROUND((est_rows - exact_rows) * 1e0
                  / GREATEST(exact_rows, 1), 4) + 0.0) AS rel_error
    FROM u
    """


@query("q241_histogram_selectivity", oracle=_q241_oracle())
def q241_histogram_selectivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram selectivity audit: build the
    {HIST_BUCKETS}-bucket histogram a cost-based optimizer keeps for
    o_totalprice, estimate {len(HIST_PREDS)} range predicates under
    the uniform-within-bucket assumption, and report each estimate
    against the exact count — with q233 (join cardinality) and q240
    (zone maps) this completes the planner-statistics toolkit: how
    wrong will the optimizer's row estimates be, BEFORE it picks a
    bad plan with them.

    Parity: bucket ids, bucket bounds, counts, and the
    overlap-interpolation NUMERATOR Σ nᵢ·overlapᵢ are all exact
    integers (overlap = clamped integer interval intersection); the
    estimate is that integer divided once by the bucket width —
    no per-bucket float terms to accumulate.

    Scale shape: one scan → {HIST_BUCKETS}-cell hash agg (map-side
    combine) after a 1-row bounds attach; every audit row evaluates on
    the bounded histogram.
    """
    orders = table(spark, sf_dir, "orders")
    s = orders.select(
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("y")
    )
    bounds = s.agg(
        F.min("y").alias("mn"),
        (
            F.expr(f"(MAX(y) - MIN(y)) div {HIST_BUCKETS}") + 1
        ).alias("w"),
    )
    # ONE scan: the histogram cells carry the per-predicate exact
    # counts as filtered aggregates, so every audit row reads only the
    # checkpointed HIST_BUCKETS-row table.
    aggs = [
        F.min(F.expr("mn + ((y - mn) div w) * w")).alias("lo"),
        F.min(F.expr("mn + ((y - mn) div w + 1) * w")).alias("hi"),
        F.count("*").alias("n"),
        F.max("w").alias("w"),
    ]
    for i, (_, a, b) in enumerate(HIST_PREDS):
        a_c, b_c = a * 100, b * 100
        aggs.append(
            F.sum(((F.col("y") >= a_c) & (F.col("y") < b_c)).cast("long")).alias(
                f"ex{i}"
            )
        )
    h = local_checkpoint(
        s.crossJoin(F.broadcast(bounds))
        .groupBy(F.expr("(y - mn) div w").alias("bucket"))
        .agg(*aggs),
        "q241 histogram cells",
    )
    out = None
    for i, (lbl, a, b) in enumerate(HIST_PREDS):
        a_c, b_c = a * 100, b * 100
        ov = F.greatest(
            F.lit(0),
            F.least(F.col("hi"), F.lit(b_c)) - F.greatest(F.col("lo"), F.lit(a_c)),
        )
        row = (
            h.agg(
                F.sum(f"ex{i}").cast("long").alias("exact_rows"),
                F.round(
                    F.sum(F.col("n") * ov) * F.expr("1e0") / F.max("w"), 2
                ).alias("est_rows"),
            )
            .select(
                F.lit(lbl).alias("predicate"),
                "exact_rows",
                (F.col("est_rows") + F.lit(0.0)).alias("est_rows"),
                dec(
                    (F.col("est_rows") - F.col("exact_rows"))
                    * F.expr("1e0")
                    / F.greatest(F.col("exact_rows"), F.lit(1)),
                    4,
                ).alias("rel_error"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# q242 — market share of a supplier nation within a region (TPC-H Q8 shape)
# ---------------------------------------------------------------------------

MS_REGION = "EUROPE"
MS_NATION = "GERMANY"


@query(
    "q242_market_share",
    oracle=f"""
    WITH rev AS (
      SELECT EXTRACT(year FROM o.o_orderdate) AS yr,
             CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                  AS BIGINT) AS cents,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = cn.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      WHERE r.r_name = '{MS_REGION}'),
    a AS (
      SELECT yr,
             SUM(CASE WHEN supp_nation = '{MS_NATION}'
                      THEN cents ELSE 0 END) AS nat,
             SUM(cents) AS tot
      FROM rev GROUP BY 1)
    SELECT CAST(yr AS BIGINT) AS o_year,
           CAST(nat AS BIGINT) AS nation_cents,
           CAST(tot AS BIGINT) AS total_cents,
           (ROUND(nat * 1e0 / tot, 6) + 0.0) AS mkt_share
    FROM a
    """,
)
def q242_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8's market-share shape: within the {MS_REGION} customer
    market, the yearly revenue share supplied by {MS_NATION} — the
    six-table snowflake join (fact + orders + two customer dims + two
    supplier dims) whose join ORDER is the classic CBO stress test
    (reference test-query family; cf. q03's three-table core).

    Parity: revenue in integer cents, the share a single division,
    6-dp round.

    Scale shape: the region filter pushes to the customer-side dim
    chain (broadcast joins for every dim at any SF — nation/region are
    fixed-size, supplier/customer prune by the join), partial
    aggregation collapses to |years| cells before the shuffle.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    supplier = table(spark, sf_dir, "supplier")
    cn = nation.alias("cn")
    sn = nation.alias("sn")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(cn, customer.c_nationkey == F.col("cn.n_nationkey"))
        .join(region, F.col("cn.n_regionkey") == region.r_regionkey)
        .filter(region.r_name == MS_REGION)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(sn, supplier.s_nationkey == F.col("sn.n_nationkey"))
        .select(
            F.year("o_orderdate").alias("yr"),
            F.expr(
                "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)"
                " AS BIGINT)"
            ).alias("cents"),
            F.col("sn.n_name").alias("supp_nation"),
        )
    )
    a = rev.groupBy("yr").agg(
        F.sum(
            F.when(F.col("supp_nation") == MS_NATION, F.col("cents")).otherwise(0)
        ).alias("nat"),
        F.sum("cents").alias("tot"),
    )
    return a.select(
        F.col("yr").cast("long").alias("o_year"),
        F.col("nat").cast("long").alias("nation_cents"),
        F.col("tot").cast("long").alias("total_cents"),
        dec(F.col("nat") * F.expr("1e0") / F.col("tot"), 6).alias("mkt_share"),
    )


# ---------------------------------------------------------------------------
# q243 — promotion-type revenue share by month (TPC-H Q14 shape)
# ---------------------------------------------------------------------------

PROMO_TYPE = "ECONOMY"


@query(
    "q243_promo_revenue_share",
    oracle=f"""
    WITH rev AS (
      SELECT date_trunc('month', l.l_shipdate) AS mo,
             CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                  AS BIGINT) AS cents,
             p.p_type AS ptype
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    a AS (
      SELECT mo,
             SUM(CASE WHEN ptype = '{PROMO_TYPE}' THEN cents ELSE 0 END)
               AS promo,
             SUM(cents) AS tot
      FROM rev GROUP BY 1)
    SELECT strftime(mo, '%Y-%m') AS ship_month,
           CAST(promo AS BIGINT) AS promo_cents,
           CAST(tot AS BIGINT) AS total_cents,
           (ROUND(100 * promo * 1e0 / tot, 4) + 0.0) AS promo_pct
    FROM a
    """,
)
def q243_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14's promotion-effect shape, widened to every ship
    month: the percentage of revenue carried by '{PROMO_TYPE}'-type
    parts — the campaign-effectiveness time series a merchandising
    team tracks (reference test-query family).

    Parity: integer cents; month key formatted 'yyyy-MM' explicitly on
    both sides (the q230 date-column rule — engine default date
    stringification differs); one division per row, 4-dp round.

    Scale shape: fact ⋈ part FK join (broadcast/shuffle-hash by AQE at
    SF), partial agg to |months| × 1 cells; the month collapse happens
    in the same aggregate — no window.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    rev = li.join(part, li.l_partkey == part.p_partkey).select(
        F.date_trunc("month", "l_shipdate").alias("mo"),
        F.expr(
            "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)"
            " AS BIGINT)"
        ).alias("cents"),
        F.col("p_type").alias("ptype"),
    )
    a = rev.groupBy("mo").agg(
        F.sum(
            F.when(F.col("ptype") == PROMO_TYPE, F.col("cents")).otherwise(0)
        ).alias("promo"),
        F.sum("cents").alias("tot"),
    )
    return a.select(
        F.date_format("mo", "yyyy-MM").alias("ship_month"),
        F.col("promo").cast("long").alias("promo_cents"),
        F.col("tot").cast("long").alias("total_cents"),
        dec(100 * F.col("promo") * F.expr("1e0") / F.col("tot"), 4).alias(
            "promo_pct"
        ),
    )


# ---------------------------------------------------------------------------
# q244 — bottleneck suppliers in multi-supplier orders (TPC-H Q21 shape)
# ---------------------------------------------------------------------------

BOTTLENECK_TOP = 20


@query(
    "q244_bottleneck_suppliers",
    oracle=f"""
    WITH ps AS (
      SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS last_ship
      FROM lineitem GROUP BY 1, 2),
    o AS (
      SELECT l_orderkey, COUNT(*) AS n_supp, MAX(last_ship) AS omax
      FROM ps GROUP BY 1),
    am AS (
      SELECT ps.l_orderkey, COUNT(*) AS n_at_max
      FROM ps JOIN o ON o.l_orderkey = ps.l_orderkey
      WHERE ps.last_ship = o.omax GROUP BY 1),
    blame AS (
      SELECT ps.l_suppkey AS suppkey, COUNT(*) AS n_blamed
      FROM ps
      JOIN o ON o.l_orderkey = ps.l_orderkey
      JOIN am ON am.l_orderkey = ps.l_orderkey
      WHERE o.n_supp > 1 AND am.n_at_max = 1 AND ps.last_ship = o.omax
      GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n_multi FROM o WHERE n_supp > 1)
    SELECT CAST(b.suppkey AS BIGINT) AS suppkey,
           CAST(b.n_blamed AS BIGINT) AS n_blamed,
           CAST(t.n_multi AS BIGINT) AS n_multi_supplier_orders,
           (ROUND(b.n_blamed * 1e0 / t.n_multi, 6) + 0.0) AS blame_rate
    FROM blame b CROSS JOIN tot t
    ORDER BY b.n_blamed DESC, b.suppkey LIMIT {BOTTLENECK_TOP}
    """,
)
def q244_bottleneck_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's blame-assignment shape: in orders served by several
    suppliers, the supplier who UNIQUELY shipped last (sole argmax of
    ship date) is the order's bottleneck; rank suppliers by how many
    orders they bottlenecked — the multi-party-accountability pattern
    (Q21's EXISTS / NOT-EXISTS pair expressed as per-order counting,
    which is both clearer and one-scan cheaper).

    Parity: everything is integer counting over (order, supplier)
    collapses with date equality; ties (n_at_max > 1) are EXCLUDED so
    no engine tiebreak is ever consulted; top-k orders on integer
    count + suppkey.

    Scale shape: one (order, supplier) hash agg, one order-keyed
    window ON THE COLLAPSE (bounded by suppliers-per-order ≤ 7), one
    join back, one TakeOrderedAndProject.
    """
    li = table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("last_ship")
    )
    wo = W.partitionBy("l_orderkey")
    o = ps.select(
        "l_orderkey",
        "l_suppkey",
        "last_ship",
        F.count("*").over(wo).alias("n_supp"),
        F.max("last_ship").over(wo).alias("omax"),
        F.sum(
            (F.col("last_ship") == F.max("last_ship").over(wo)).cast("long")
        )
        .over(wo)
        .alias("n_at_max"),
    )
    blame = (
        o.filter(
            (F.col("n_supp") > 1)
            & (F.col("n_at_max") == 1)
            & (F.col("last_ship") == F.col("omax"))
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count("*").alias("n_blamed"))
    )
    tot = (
        o.select("l_orderkey", "n_supp")
        .distinct()
        .filter(F.col("n_supp") > 1)
        .agg(F.count("*").alias("n_multi"))
    )
    return (
        blame.crossJoin(F.broadcast(tot))
        .select(
            F.col("suppkey").cast("long"),
            F.col("n_blamed").cast("long"),
            F.col("n_multi").cast("long").alias("n_multi_supplier_orders"),
            dec(F.col("n_blamed") * F.expr("1e0") / F.col("n_multi"), 6).alias(
                "blame_rate"
            ),
        )
        .orderBy(F.col("n_blamed").desc(), "suppkey")
        .limit(BOTTLENECK_TOP)
    )


# ---------------------------------------------------------------------------
# q245 — Little's law audit (L = λW) on the order backlog
# ---------------------------------------------------------------------------

#: month-start sampling instants for the measured backlog average:
#: every month between the dataset's first order and last ship.
@query(
    "q245_littles_law",
    oracle="""
    WITH span AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS st,
             CAST(MAX(l_shipdate) AS DATE) AS en
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2),
    w AS (SELECT MIN(st) AS t0, MAX(en) AS t1,
                 COUNT(*) AS n,
                 SUM(date_diff('day', st, en) + 1) AS busy
          FROM span),
    mo AS (SELECT CAST(date_trunc('month', w.t0)
                        + to_months(CAST(t.m AS INTEGER)) AS DATE) AS inst
           FROM w CROSS JOIN range(0, 200) t(m)
           WHERE CAST(date_trunc('month', w.t0)
                      + to_months(CAST(t.m AS INTEGER)) AS DATE)
                 BETWEEN w.t0 AND w.t1),
    samp AS (
      SELECT COUNT(*) AS n_inst,
             SUM(cnt) AS open_sum
      FROM (SELECT mo.inst,
                   (SELECT COUNT(*) FROM span s
                    WHERE s.st <= mo.inst AND s.en >= mo.inst) AS cnt
            FROM mo) z)
    SELECT CAST(w.n AS BIGINT) AS n_orders,
           CAST(date_diff('day', w.t0, w.t1) + 1 AS BIGINT) AS window_days,
           CAST(samp.n_inst AS BIGINT) AS n_samples,
           (ROUND(w.n * 1e0 / (date_diff('day', w.t0, w.t1) + 1), 4) + 0.0)
             AS lambda_per_day,
           (ROUND(w.busy * 1e0 / w.n, 4) + 0.0) AS w_days,
           (ROUND(w.busy * 1e0 / (date_diff('day', w.t0, w.t1) + 1), 4)
              + 0.0) AS l_timeavg,
           (ROUND(samp.open_sum * 1e0 / samp.n_inst, 4) + 0.0) AS l_sampled,
           (ROUND((samp.open_sum * 1e0 / samp.n_inst)
                  / (w.busy * 1e0 / (date_diff('day', w.t0, w.t1) + 1)), 4)
              + 0.0) AS sampled_over_timeavg
    FROM w CROSS JOIN samp
    """,
)
def q245_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law audit on the order backlog: arrival rate λ, mean
    time-in-system W, the exact time-average backlog L = λW (an
    identity when measured over the full window), and the MONTH-START
    SAMPLED backlog average that a naive dashboard reports — the ratio
    between the two quantifies the sampling bias of point-in-time
    snapshots (the queueing sanity check behind every "open tickets"
    metric; cf. q182's daily sweep).

    Parity: busy-days, counts, and calendar arithmetic are exact
    integers; each reported rate is a single double division; the
    month-instant grid is bounded (|months|) and the per-instant count
    is an interval-containment join on the bounded instant list.

    Scale shape: one (order) collapse with min/max dates, a 1-row
    window aggregate, and a bounded |months| × interval containment
    join (broadcast the instant list); nothing scales beyond the
    collapse.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    span = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("st"))
        .agg(F.to_date(F.max("l_shipdate")).alias("en"))
    )
    w = span.agg(
        F.min("st").alias("t0"),
        F.max("en").alias("t1"),
        F.count("*").alias("n"),
        F.sum(F.datediff("en", "st") + 1).alias("busy"),
    )
    months = spark.range(0, 200).select(F.col("id").alias("m"))
    mo = (
        months.crossJoin(F.broadcast(w))
        .select(
            F.add_months(F.date_trunc("month", "t0"), F.col("m").cast("int"))
            .cast("date")
            .alias("inst"),
            "t0",
            "t1",
        )
        .filter((F.col("inst") >= F.col("t0")) & (F.col("inst") <= F.col("t1")))
        .select("inst")
    )
    samp = (
        span.join(
            F.broadcast(mo),
            (F.col("st") <= F.col("inst")) & (F.col("en") >= F.col("inst")),
        )
        .groupBy("inst")
        .agg(F.count("*").alias("cnt"))
        .agg(F.count("*").alias("n_inst"), F.sum("cnt").alias("open_sum"))
    )
    days = F.datediff("t1", "t0") + 1
    lt = F.col("busy") * F.expr("1e0") / days
    ls = F.col("open_sum") * F.expr("1e0") / F.col("n_inst")
    return w.crossJoin(samp).select(
        F.col("n").cast("long").alias("n_orders"),
        days.cast("long").alias("window_days"),
        F.col("n_inst").cast("long").alias("n_samples"),
        dec(F.col("n") * F.expr("1e0") / days, 4).alias("lambda_per_day"),
        dec(F.col("busy") * F.expr("1e0") / F.col("n"), 4).alias("w_days"),
        dec(lt, 4).alias("l_timeavg"),
        dec(ls, 4).alias("l_sampled"),
        dec(ls / lt, 4).alias("sampled_over_timeavg"),
    )


# ---------------------------------------------------------------------------
# q246 — disjunctive-predicate revenue (TPC-H Q19 shape)
# ---------------------------------------------------------------------------


@query(
    "q246_disjunctive_revenue",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                               + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q246_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19's discounted-revenue shape: an OR of three
    brand/size/quantity conjunction arms — the classic disjunctive-
    predicate planner test (a naive engine evaluates the OR post-join;
    a good one pushes the per-table residuals: the brand/size arms
    prune `part`, the quantity envelope prunes `lineitem` before the
    join).  Reference test-query family.

    Parity: integer cents; pure counting + one integer sum.

    Scale shape: Catalyst derives `p_brand IN (...)` and
    `l_quantity BETWEEN 1 AND 30` from the disjunction and pushes both
    into the scans (asserted in the plan test); the join then sees
    only candidate rows and the full OR re-checks post-join.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    arm1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    arm3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(arm1 | arm2 | arm3).agg(
        F.count("*").cast("long").alias("n_lineitems"),
        F.sum(
            F.expr(
                "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)"
                " AS BIGINT)"
            )
        )
        .cast("long")
        .alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# q247 — min-cost supplier per part within a region (TPC-H Q2 shape)
# ---------------------------------------------------------------------------

MCS_REGION = "ASIA"
MCS_TOP = 25


@query(
    "q247_min_cost_supplier",
    oracle=f"""
    WITH sup AS (
      SELECT s.s_suppkey, s.s_name, n.n_name AS nation
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = '{MCS_REGION}'),
    cost AS (
      SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
             CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                  // SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
               AS unit_cents,
             COUNT(*) AS n_lines
      FROM lineitem l JOIN sup ON sup.s_suppkey = l.l_suppkey
      GROUP BY 1, 2),
    best AS (
      SELECT partkey, suppkey, unit_cents, n_lines
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY partkey
                        ORDER BY unit_cents, suppkey) AS rk
            FROM cost) WHERE rk = 1)
    SELECT CAST(b.partkey AS BIGINT) AS partkey,
           CAST(b.suppkey AS BIGINT) AS suppkey,
           sup.nation,
           CAST(b.unit_cents AS BIGINT) AS unit_cents,
           CAST(b.n_lines AS BIGINT) AS n_lines
    FROM best b JOIN sup ON sup.s_suppkey = b.suppkey
    ORDER BY b.unit_cents DESC, b.partkey LIMIT {MCS_TOP}
    """,
)
def q247_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's min-cost-supplier shape on observed history: for
    every part, the {MCS_REGION}-region supplier with the lowest
    realized unit price (floor-div cents per unit over its lineitem
    history), then the {MCS_TOP} parts whose BEST offer is most
    expensive — Q2's argmin-within-group + outer ranking, re-derived
    from the fact table since the fixture carries no partsupp
    catalog.  Reference test-query family.

    Parity: unit cost is an integer floor division of integer sums;
    the per-part argmin ties on supplier id; the outer top-k ranks on
    integer cost + part id.

    Scale shape: the region dim chain broadcasts into the fact scan;
    one (part, supplier) hash agg; the argmin is a window ON THE
    COLLAPSE (bounded by suppliers-per-part); top-k is a
    TakeOrderedAndProject.
    """
    li = table(spark, sf_dir, "lineitem")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    sup = (
        supplier.join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .filter(region.r_name == MCS_REGION)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    cost = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))"
                " div SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)"
            ).alias("unit_cents"),
            F.count("*").alias("n_lines"),
        )
    )
    wk = W.partitionBy("partkey").orderBy("unit_cents", "suppkey")
    best = (
        cost.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    return (
        best.join(sup, best.suppkey == sup.s_suppkey)
        .select(
            F.col("partkey").cast("long"),
            F.col("suppkey").cast("long"),
            "nation",
            F.col("unit_cents").cast("long"),
            F.col("n_lines").cast("long"),
        )
        .orderBy(F.col("unit_cents").desc(), "partkey")
        .limit(MCS_TOP)
    )


# ---------------------------------------------------------------------------
# q248 — MCV + n_distinct equality-selectivity audit (CBO estimator)
# ---------------------------------------------------------------------------

MCV_K = 5
#: audited equality predicates on l_quantity.
MCV_PREDS = (1, 13, 25, 37, 50)


def _q248_oracle() -> str:
    rows = []
    for v in MCV_PREDS:
        rows.append(f"""
    SELECT 'l_quantity = {v}' AS predicate,
           (SELECT CAST(COALESCE(MAX(CASE WHEN v = {v} THEN n END), 0)
                        AS BIGINT) FROM stats) AS exact_rows,
           (SELECT (ROUND(CASE WHEN MAX(CASE WHEN v = {v} THEN n END)
                               IS NOT NULL
                          THEN MAX(CASE WHEN v = {v} THEN n END) * 1e0
                          ELSE (MAX(tot) - SUM(CASE WHEN rk <= {MCV_K}
                                                    THEN n ELSE 0 END)) * 1e0
                               / (MAX(nd) - {MCV_K}) END, 2) + 0.0)
            FROM (SELECT v, n, rk, tot, nd FROM stats
                  WHERE rk <= {MCV_K} OR v = {v})) AS est_rows""")
    return f"""
    WITH f AS (SELECT CAST(l_quantity AS BIGINT) AS v, COUNT(*) AS n
               FROM lineitem GROUP BY 1),
    stats AS MATERIALIZED (
      SELECT v, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, v) AS rk,
             SUM(n) OVER () AS tot,
             COUNT(*) OVER () AS nd
      FROM f),
    u AS ({' UNION ALL '.join(rows)})
    SELECT predicate, exact_rows, est_rows,
           (ROUND((est_rows - exact_rows) * 1e0
                  / GREATEST(exact_rows, 1), 4) + 0.0) AS rel_error
    FROM u
    """


@query("q248_mcv_selectivity", oracle=_q248_oracle())
def q248_mcv_selectivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-common-values + n_distinct equality-selectivity audit (the
    Postgres statistics model): keep the top-{MCV_K} values with exact
    frequencies, assume the rest uniform over the remaining distinct
    values, and audit {len(MCV_PREDS)} equality predicates against
    exact counts — q241's range-histogram sibling, completing the CBO
    statistics toolkit (q233 joins, q240 layout, q241 ranges, q248
    equalities).

    Parity: value frequencies, MCV ranks (count + value tiebreak),
    totals, and distinct counts are exact integers; each estimate is
    one division; 2/4-dp edge rounds.

    Scale shape: ONE value hash agg (domain-bounded — 50 quantities);
    the MCV rank is a window over that bounded collapse; every audit
    row — including the exact side — reads the checkpointed collapsed
    stats only (zero re-scans of the fact table).
    """
    li = table(spark, sf_dir, "lineitem")
    f = li.groupBy(F.col("l_quantity").cast("long").alias("v")).agg(
        F.count("*").alias("n")
    )
    wfull = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    stats = local_checkpoint(
        f.select(
            "v",
            "n",
            F.row_number().over(W.orderBy(F.col("n").desc(), "v")).alias("rk"),
            F.sum("n").over(wfull).alias("tot"),
            F.count("*").over(wfull).alias("nd"),
        ),
        "q248 value stats",
    )
    out = None
    for v in MCV_PREDS:
        sub = stats.filter((F.col("rk") <= MCV_K) | (F.col("v") == v))
        mcv_n = F.max(F.when(F.col("v") == v, F.col("n")))
        rest = (
            F.max("tot")
            - F.sum(F.when(F.col("rk") <= MCV_K, F.col("n")).otherwise(0))
        ) * F.expr("1e0") / (F.max("nd") - MCV_K)
        est = F.round(
            F.when(mcv_n.isNotNull(), mcv_n * F.expr("1e0")).otherwise(rest), 2
        )
        exact = stats.agg(
            F.coalesce(F.max(F.when(F.col("v") == v, F.col("n"))), F.lit(0))
            .cast("long")
            .alias("exact_rows")
        )
        row = (
            sub.agg(est.alias("est_rows"))
            .crossJoin(F.broadcast(exact))
            .select(
                F.lit(f"l_quantity = {v}").alias("predicate"),
                "exact_rows",
                (F.col("est_rows") + F.lit(0.0)).alias("est_rows"),
                dec(
                    (F.col("est_rows") - F.col("exact_rows"))
                    * F.expr("1e0")
                    / F.greatest(F.col("exact_rows"), F.lit(1)),
                    4,
                ).alias("rel_error"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# q249 — idle high-balance customers by nation (TPC-H Q22 shape)
# ---------------------------------------------------------------------------


@query(
    "q249_idle_high_balance",
    oracle="""
    WITH thr AS (
      SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
                  // COUNT(*) AS BIGINT) AS avg_cents
      FROM customer WHERE c_acctbal > 0.0),
    anchor AS (
      SELECT CAST(MAX(o_orderdate) AS DATE) - INTERVAL 365 DAY AS cutoff
      FROM orders),
    idle AS (
      SELECT c.c_nationkey,
             CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT) AS bal
      FROM customer c CROSS JOIN thr CROSS JOIN anchor
      WHERE CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT) > thr.avg_cents
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND CAST(o.o_orderdate AS DATE) >= anchor.cutoff))
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(i.bal) AS BIGINT) AS total_balance_cents
    FROM idle i JOIN nation n ON n.n_nationkey = i.c_nationkey
    GROUP BY 1
    """,
)
def q249_idle_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22's lost-opportunity shape: customers whose balance
    beats the positive-balance average yet who placed NO order in the
    dataset's final year (every fixture customer has SOME order, so
    "lapsed" is the non-degenerate reading), counted and summed by
    nation — the scalar-threshold subquery + anti-join combination
    (no phone column, so the country grouping comes from the nation
    dim).  Reference test-query family; composes the q22
    scalar-subquery and q07 anti-join surfaces into Q22's exact
    shape.

    Parity: balances in integer cents, the threshold a floor-div mean,
    pure integer counting after the anti join.

    Scale shape: two 1-row broadcasts (threshold, recency cutoff);
    the anti join's right side is the cutoff-filtered order keys;
    |nations|-row output via broadcast dim join.
    """
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    bal = F.expr("CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)")
    thr = (
        customer.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.expr(
                "CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))"
                " div COUNT(*) AS BIGINT)"
            ).alias("avg_cents")
        )
    )
    anchor = orders.agg(
        F.date_sub(F.to_date(F.max("o_orderdate")), 365).alias("cutoff")
    )
    recent = (
        orders.select("o_custkey", F.to_date("o_orderdate").alias("od"))
        .crossJoin(F.broadcast(anchor))
        .filter(F.col("od") >= F.col("cutoff"))
        .select("o_custkey")
    )
    idle = (
        customer.select("c_custkey", "c_nationkey", bal.alias("bal"))
        .crossJoin(F.broadcast(thr))
        .filter(F.col("bal") > F.col("avg_cents"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "anti")
    )
    return (
        idle.join(nation, idle.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("bal").cast("long").alias("total_balance_cents"),
        )
    )


# ---------------------------------------------------------------------------
# q253 — late-shipment priority audit (TPC-H Q4 shape)
# ---------------------------------------------------------------------------

#: an order is LATE when any line ships more than this many days after
#: the order date (the fixture carries no commit/receipt dates, so the
#: ship-vs-order lag stands in for Q4's commitdate < receiptdate)
LATE_SHIP_DAYS = 60


@query(
    "q253_priority_late_orders",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           o.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_late_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL {LATE_SHIP_DAYS} DAY)
    GROUP BY 1, 2
    """,
)
def q253_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4's order-priority-checking shape: orders with at least
    one line shipped more than {LATE_SHIP_DAYS} days after the order
    date, counted per (year, priority) — the correlated-EXISTS the
    optimizer must turn into a semi join, never a per-order subquery.

    Parity: pure integer counts over a date comparison both engines
    evaluate identically (DATE + INTERVAL vs date_add).

    Scale shape: LeftSemi on the orderkey (the line side pre-filtered
    by the lag predicate pushes nothing — it references both sides, so
    the semi join carries it), one hash agg to |years|×5 cells.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.to_date("o_orderdate").alias("od"),
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("sd")
    )
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.sd > F.date_add(orders.od, LATE_SHIP_DAYS)),
        "left_semi",
    )
    return late.groupBy(
        F.year("od").cast("long").alias("o_year"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count("*").cast("long").alias("n_late_orders"))


# ---------------------------------------------------------------------------
# q254 — customer order-count distribution (TPC-H Q13 shape)
# ---------------------------------------------------------------------------


@query(
    "q254_order_count_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1)
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY 1
    """,
)
def q254_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13's customer-distribution shape: how many customers
    placed exactly k orders, INCLUDING the zero-order customers the
    left join exists to keep — the classic left-outer + double
    aggregation whose first groupBy key (custkey) is high-cardinality
    and whose second (the count) collapses to a handful of cells.

    Parity: COUNT(o_orderkey) ignores the null-extended rows in both
    engines; all integers.

    Scale shape: the (cust ⋈ orders) shuffle is the unavoidable big
    one; the first agg combines map-side per custkey, the second is
    |distinct counts| cells.  No window, no skew key (custkeys are
    near-uniform by construction).
    """
    customer = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy(F.col("c_count").cast("long").alias("c_count")).agg(
        F.count("*").cast("long").alias("custdist")
    )


# ---------------------------------------------------------------------------
# q255 — bilateral trade volume between two nations (TPC-H Q7 shape)
# ---------------------------------------------------------------------------

TRADE_NATION_A = "NATION_3"
TRADE_NATION_B = "NATION_7"


@query(
    "q255_bilateral_trade",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100
                               + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    WHERE (sn.n_name = '{TRADE_NATION_A}' AND cn.n_name = '{TRADE_NATION_B}')
       OR (sn.n_name = '{TRADE_NATION_B}' AND cn.n_name = '{TRADE_NATION_A}')
    GROUP BY 1, 2, 3
    """,
)
def q255_bilateral_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7's volume-shipping shape: yearly revenue flowing each
    way between {TRADE_NATION_A} and {TRADE_NATION_B} — the two-sided
    nation filter that must prune BOTH dim chains before the fact join,
    with the cross-pair disjunction evaluated on the joined row.

    Parity: integer cents; year from the ship date in both engines.

    Scale shape: nation is 25 rows (broadcast); the supplier/customer
    dims prune to the two nations before touching the fact, so the
    fact join's build sides are tiny; one hash agg to 2×|years| cells.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    pair = (TRADE_NATION_A, TRADE_NATION_B)
    cn = nation.filter(F.col("n_name").isin(*pair)).alias("cn")
    sn = nation.filter(F.col("n_name").isin(*pair)).alias("sn")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(cn), customer.c_nationkey == F.col("cn.n_nationkey"))
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(sn), supplier.s_nationkey == F.col("sn.n_nationkey"))
        .filter(F.col("sn.n_name") != F.col("cn.n_name"))
    )
    return joined.groupBy(
        F.col("sn.n_name").alias("supp_nation"),
        F.col("cn.n_name").alias("cust_nation"),
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(
        F.sum(
            F.expr(
                "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)"
                " AS BIGINT)"
            )
        )
        .cast("long")
        .alias("revenue_cents")
    )


# ---------------------------------------------------------------------------
# q256 — top revenue supplier over a quarter (TPC-H Q15 shape)
# ---------------------------------------------------------------------------

TOP_SUPP_START = "1998-01-01"
TOP_SUPP_END = "1998-04-01"


@query(
    "q256_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l.l_suppkey,
             SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100
                            + 0.5) AS BIGINT)) AS total_cents
      FROM lineitem l
      WHERE l.l_shipdate >= DATE '{TOP_SUPP_START}'
        AND l.l_shipdate < DATE '{TOP_SUPP_END}'
      GROUP BY 1),
    mx AS (SELECT MAX(total_cents) AS m FROM rev)
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_cents AS BIGINT) AS total_cents
    FROM rev r JOIN mx ON r.total_cents = mx.m
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    """,
)
def q256_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15's top-supplier shape: the supplier(s) with the maximum
    revenue over [{TOP_SUPP_START}, {TOP_SUPP_END}) — the revenue-view
    + scalar-max pattern; ALL ties are returned, as the spec demands,
    so the answer never depends on an engine tiebreak.

    Parity: integer cents make the max boundary exact.

    Scale shape: date filter pushes to the fact scan; agg collapses to
    |suppliers| cells; the max is a 1-row broadcast attach and the
    supplier dim joins AFTER the max filter (a handful of rows).
    """
    li = table(spark, sf_dir, "lineitem")
    supplier = table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit(TOP_SUPP_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(TOP_SUPP_END).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.expr(
                    "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100"
                    " + 0.5) AS BIGINT)"
                )
            ).alias("total_cents")
        )
    )
    mx = rev.agg(F.max("total_cents").alias("m"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_cents") == F.col("m"))
        .join(supplier, F.col("l_suppkey") == supplier.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("total_cents").cast("long").alias("total_cents")
        )
    )


# ---------------------------------------------------------------------------
# q257 — small-quantity-order revenue (TPC-H Q17 shape)
# ---------------------------------------------------------------------------

SMALLQ_BRAND = "Brand#2"


@query(
    "q257_small_quantity_revenue",
    oracle=f"""
    WITH bl AS (
      SELECT l.l_partkey,
             CAST(FLOOR(l.l_quantity * 100 + 0.5) AS BIGINT) AS q100,
             CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = '{SMALLQ_BRAND}'),
    st AS (SELECT l_partkey, SUM(q100) AS sq, COUNT(*) AS n
           FROM bl GROUP BY 1)
    SELECT CAST(SUM(bl.cents) AS BIGINT) AS total_cents,
           (ROUND(SUM(bl.cents) * 1e0 / 700, 4) + 0.0) AS avg_yearly
    FROM bl JOIN st ON st.l_partkey = bl.l_partkey
    WHERE bl.q100 * 5 * st.n < st.sq
    """,
)
def q257_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17's small-quantity-order shape for '{SMALLQ_BRAND}':
    revenue from lines whose quantity is below 20% of the part's
    average — the per-part correlated scalar subquery decorrelated
    into one stats aggregate + re-join.

    Parity: the 0.2·avg cut is evaluated as the INTEGER cross-product
    q·5·n < Σq (no division, no float boundary); only the final
    avg_yearly is one double division, 4-dp.

    Scale shape: the brand filter prunes the part dim before the fact
    join; per-part stats collapse to |brand parts| cells and broadcast
    back; one global agg.  No window, no value buffering.
    """
    li = table(spark, sf_dir, "lineitem")
    # the brand filter prunes part to 1/|brands| — still SF-scaled, so
    # no broadcast hint; AQE broadcasts while the pruned dim measures
    # small and falls back to shuffle-hash beyond
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == SMALLQ_BRAND)
    bl = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_partkey",
        F.expr("CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)").alias("q100"),
        F.expr("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
    )
    st = bl.groupBy("l_partkey").agg(
        F.sum("q100").alias("sq"), F.count("*").alias("n")
    )
    # st scales with |parts of the brand| — no broadcast hint; AQE
    # picks broadcast at fixture scale and shuffle-hash beyond
    kept = bl.join(
        st.withColumnRenamed("l_partkey", "pk"),
        F.col("l_partkey") == F.col("pk"),
    ).filter(F.col("q100") * 5 * F.col("n") < F.col("sq"))
    return kept.agg(
        F.sum("cents").cast("long").alias("total_cents"),
        dec(F.sum("cents") * F.expr("1e0") / 700, 4).alias("avg_yearly"),
    )


# ---------------------------------------------------------------------------
# q258 — large-volume customers (TPC-H Q18 shape)
# ---------------------------------------------------------------------------

LARGE_ORDER_QTY = 200


@query(
    "q258_large_volume_customers",
    oracle=f"""
    WITH oq AS (
      SELECT l_orderkey,
             SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS sq100
      FROM lineitem GROUP BY 1
      HAVING SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT))
             > {LARGE_ORDER_QTY} * 100)
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(oq.sq100 // 100 AS BIGINT) AS total_qty,
           CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)
             AS o_totalprice_cents
    FROM oq
    JOIN orders o ON o.o_orderkey = oq.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q258_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18's large-volume-customer shape: orders whose total line
    quantity exceeds {LARGE_ORDER_QTY}, with their customers — the
    HAVING-on-grouped-fact pattern where the heavy agg runs FIRST and
    the dims join onto the (rare) survivors.

    Parity: quantities summed as q×100 integers; the floor-div back to
    units is exact because fixture quantities are integral.

    Scale shape: one map-combined agg over the fact; the HAVING
    survivor set is small, so both dim joins broadcast the survivors'
    build side after AQE sizes them.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    oq = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(
                F.expr("CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)")
            ).alias("sq100")
        )
        .filter(F.col("sq100") > LARGE_ORDER_QTY * 100)
    )
    return (
        oq.join(orders, oq.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.expr("CAST(sq100 div 100 AS BIGINT)").alias("total_qty"),
            F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
                "o_totalprice_cents"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q259 — dominant part suppliers (TPC-H Q20-adjacent supply concentration)
# ---------------------------------------------------------------------------


@query(
    "q259_dominant_suppliers",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS q
      FROM lineitem GROUP BY 1, 2),
    pt AS (SELECT l_partkey, SUM(q) AS tq, COUNT(*) AS n_supp
           FROM ps GROUP BY 1),
    dom AS (
      SELECT ps.l_suppkey
      FROM ps JOIN pt ON pt.l_partkey = ps.l_partkey
      WHERE pt.n_supp >= 2 AND 5 * ps.q > pt.tq)
    SELECT s.s_suppkey, s.s_name,
           CAST(COUNT(*) AS BIGINT) AS n_dominated
    FROM dom JOIN supplier s ON s.s_suppkey = dom.l_suppkey
    GROUP BY 1, 2
    """,
)
def q259_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20's excess-availability shape re-expressed on the
    fixture (no partsupp table exists): suppliers who shipped MORE THAN
    20% of a multi-supplier part's total volume (the fixture spreads a
    part over ~27 suppliers, so a fifth of the volume is ~5× the
    expected share), counted per supplier — the supply-concentration
    audit a procurement team runs before single-sourcing risk reviews.

    Parity: the 20% cut is the integer comparison 5·q > Σq; counts
    only.

    Scale shape: two stacked aggs — (part, supplier) then part — both
    map-combinable; the parts table attaches by broadcast of the
    second (|parts|-row) agg; supplier dim joins the small dominated
    set last.
    """
    li = table(spark, sf_dir, "lineitem")
    supplier = table(spark, sf_dir, "supplier")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.expr("CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)")).alias(
            "q"
        )
    )
    pt = ps.groupBy("l_partkey").agg(
        F.sum("q").alias("tq"), F.count("*").alias("n_supp")
    )
    # pt is |parts|-sized — no broadcast hint (would OOM at extreme
    # SF); both sides hash by partkey, AQE downgrades to broadcast
    # only when the stats side measures small
    dom = (
        ps.join(
            pt.withColumnRenamed("l_partkey", "pk"),
            F.col("l_partkey") == F.col("pk"),
        )
        .filter((F.col("n_supp") >= 2) & (5 * F.col("q") > F.col("tq")))
        .select("l_suppkey")
    )
    return (
        dom.join(supplier, dom.l_suppkey == supplier.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").cast("long").alias("n_dominated"))
    )


# ---------------------------------------------------------------------------
# q279 — late-line priority mix (TPC-H Q12 shape)
# ---------------------------------------------------------------------------

#: Q12's critical-priority bucket: lines of URGENT/HIGH orders count
#: separately from everything else in the late-shipment audit.
Q12_HIGH = ("1-URGENT", "2-HIGH")
Q12_SHIP_YEARS = (1996, 1998)  # inclusive l_shipdate year window


@query(
    "q279_late_line_priority_mix",
    oracle=f"""
    SELECT l.l_returnflag AS line_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('{Q12_HIGH[0]}',
                                                    '{Q12_HIGH[1]}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('{Q12_HIGH[0]}',
                                                    '{Q12_HIGH[1]}')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE EXTRACT(year FROM l.l_shipdate) BETWEEN {Q12_SHIP_YEARS[0]}
                                              AND {Q12_SHIP_YEARS[1]}
      AND l.l_shipdate > o.o_orderdate + INTERVAL {LATE_SHIP_DAYS} DAY
    GROUP BY 1
    """,
)
def q279_late_line_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12's shipping-mode priority audit re-expressed on the
    fixture's columns (no l_shipmode/receiptdate: the return-flag
    class stands in for the mode, ship-vs-order lag > {LATE_SHIP_DAYS}
    days for the late-receipt predicate — q253's convention): among
    LATE lines shipped in {Q12_SHIP_YEARS}, how many belong to
    critical-priority orders vs not, per line class.  The CASE-inside-
    SUM two-way count is the Q12 signature — one pass, no pivot.

    Reference parity target: the Q12 aggregation pattern
    (grohan2002/datapipeline-dags exposes no analytic queries; TPC-H
    shapes are the published stand-in per SURVEY.md §2.11).

    Parity: integer conditional counts; the late cut is a date
    comparison both engines evaluate identically.

    Scale shape: the ship-year range prunes the lineitem scan
    (pushed to parquet); the late predicate references both sides so
    the orderkey join carries it; one hash agg to 3 cells, map-side
    combinable.  No window, no distinct.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        F.year(F.to_date("l_shipdate")).between(*Q12_SHIP_YEARS)
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("od")
    )
    is_high = F.col("o_orderpriority").isin(*Q12_HIGH)
    return (
        li.select("l_orderkey", "l_returnflag", F.to_date("l_shipdate").alias("sd"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("sd") > F.date_add(F.col("od"), LATE_SHIP_DAYS))
        .groupBy(F.col("l_returnflag").alias("line_class"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# q280 — supplier options per part attribute (TPC-H Q16 shape)
# ---------------------------------------------------------------------------

Q16_EXCLUDED_BRAND = "Brand#13"
Q16_SIZES = (1, 5, 9, 14, 20, 27, 33, 40)


@query(
    "q280_supplier_part_options",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    ok AS (
      SELECT p.p_brand, p.p_size, pr.l_suppkey
      FROM pairs pr
      JOIN part p ON p.p_partkey = pr.l_partkey
      WHERE p.p_brand <> '{Q16_EXCLUDED_BRAND}'
        AND p.p_size IN ({', '.join(str(s) for s in Q16_SIZES)})
        AND pr.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
    SELECT p_brand,
           CAST(p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ok GROUP BY 1, 2
    """,
)
def q280_supplier_part_options(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16's parts/supplier-relationship shape on the fixture's
    columns: how many distinct suppliers have ever shipped a part of
    each surviving (brand, size) combination — the distinct-pair
    collapse + NOT-IN supplier exclusion + distinct-count rollup.  No
    partsupp table in the fixture, so shipment history (lineitem) IS
    the part↔supplier relation, and negative account balance stands
    in for Q16's complaint filter.

    Parity: set semantics only (distinct pairs, NOT IN on a key
    column with no NULLs, COUNT DISTINCT) — no floats anywhere.

    Scale shape: the (partkey, suppkey) distinct collapse is the big
    shuffle and combines map-side; brand/size filters prune the part
    dim BEFORE its join (pushed to the part scan); the exclusion list
    is an anti join on the supplier dim; the final distinct-count
    groups |brands|×|sizes| cells.  No window; no broadcast hint on
    the SF-scaled dims — AQE decides.
    """
    pairs = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_EXCLUDED_BRAND)
        & F.col("p_size").isin(*Q16_SIZES)
    )
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        pairs.join(bad, pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q281 — part value concentration (TPC-H Q11 shape)
# ---------------------------------------------------------------------------

Q11_TOP = 25


@query(
    "q281_part_value_concentration",
    oracle=f"""
    WITH pv AS (
      SELECT l_partkey,
             SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                            + 0.5) AS BIGINT)) AS value_cents
      FROM lineitem GROUP BY 1),
    tot AS (SELECT SUM(value_cents) AS t FROM pv)
    SELECT CAST(l_partkey AS BIGINT) AS p_partkey,
           CAST(value_cents AS BIGINT) AS value_cents,
           CAST(value_cents * CAST(1000000 AS BIGINT) // t AS BIGINT)
             AS share_ppm
    FROM pv, tot
    ORDER BY value_cents DESC, l_partkey LIMIT {Q11_TOP}
    """,
)
def q281_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11's important-stock identification re-expressed on the
    fixture (no partsupp: shipped revenue history per part stands in
    for supplycost·availqty): the top-{Q11_TOP} parts by lifetime
    value with each part's ppm share of the GRAND total — the scalar-
    subquery-over-the-same-aggregate shape, decorrelated into one
    1-row total broadcast onto the per-part collapse.

    Parity: integer cents; share is integer-ppm floor division (both
    engines floor on positives); the top-k boundary ties break on
    partkey in both engines.

    Scale shape: one map-combinable per-part agg; the grand total is a
    second agg OVER THE BOUNDED collapse (never a second fact scan),
    attached as a broadcast 1-row join; top-k plans
    TakeOrderedAndProject (never a global sort).
    """
    li = table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(
            F.expr(
                "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)"
                " AS BIGINT)"
            )
        ).alias("value_cents")
    )
    tot = pv.agg(F.sum("value_cents").alias("t"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .select(
            F.col("l_partkey").cast("long").alias("p_partkey"),
            F.col("value_cents").cast("long"),
            # DECIMAL(38,0) multiply (the q294/q288 overflow rule): a
            # hot part's lifetime cents can exceed 9.2e12 at 100 TB, so
            # the BIGINT product value_cents*1e6 would wrap int64 while
            # the oracle's HUGEINT SUM stays exact; the quotient
            # (<= 1e6) always fits BIGINT.
            F.expr(
                "CAST(CAST(value_cents AS DECIMAL(38,0)) * 1000000 div t"
                " AS BIGINT)"
            ).alias("share_ppm"),
        )
        .orderBy(F.col("value_cents").desc(), "p_partkey")
        .limit(Q11_TOP)
    )


# ---------------------------------------------------------------------------
# q283 — product profit by nation-year (TPC-H Q9 shape)
# ---------------------------------------------------------------------------

Q9_NAME_PART = "bolt"
#: cost stand-in: 60% of the part's retail price per unit (the fixture
#: has no partsupp/ps_supplycost)
Q9_COST_PCT = 60


@query(
    "q283_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100
                               + 0.5) AS BIGINT)
                    - CAST(FLOOR(l.l_quantity * p.p_retailprice
                                 * {Q9_COST_PCT} + 0.5) AS BIGINT))
                AS BIGINT) AS profit_cents
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%{Q9_NAME_PART}%'
    GROUP BY 1, 2
    """,
)
def q283_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9's product-type profit measure on the fixture's columns
    (no partsupp: cost per unit = {Q9_COST_PCT}% of the part's retail
    price): for parts whose name contains '{Q9_NAME_PART}', net profit
    per (supplier nation, order year) — the five-table star join whose
    name filter must prune the part dim BEFORE the fact join.

    Parity: revenue and cost each floor to integer cents per line
    (identical double arithmetic inside both floors), then integer
    subtraction/sums.

    Scale shape: the LIKE filter prunes part to ~1/|nouns| before its
    fact join (pushed to the part scan); supplier/orders join on their
    keys (AQE picks strategies — no hints on SF-scaled dims); nation
    (25 rows) broadcasts; one hash agg to |nations|×|years| cells.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(Q9_NAME_PART)
    )
    supplier = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    profit = (
        F.expr(
            "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)"
            " AS BIGINT)"
        )
        - F.expr(
            f"CAST(FLOOR(l_quantity * p_retailprice * {Q9_COST_PCT} + 0.5)"
            " AS BIGINT)"
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select("n_name", F.year("o_orderdate").alias("yr"), profit.alias("pc"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("yr").cast("long").alias("o_year"),
        )
        .agg(F.sum("pc").cast("long").alias("profit_cents"))
    )


# ---------------------------------------------------------------------------
# q286 — customer cohort retention triangle
# ---------------------------------------------------------------------------


@query(
    "q286_cohort_retention",
    oracle="""
    WITH fo AS (
      SELECT o_custkey,
             MIN(EXTRACT(year FROM o_orderdate)) AS cohort
      FROM orders GROUP BY 1),
    act AS (
      SELECT fo.cohort,
             EXTRACT(year FROM o.o_orderdate) AS o_year,
             COUNT(DISTINCT o.o_custkey) AS n_active
      FROM orders o JOIN fo ON fo.o_custkey = o.o_custkey
      GROUP BY 1, 2),
    base AS (
      SELECT cohort, n_active AS cohort_size FROM act WHERE o_year = cohort)
    SELECT CAST(a.cohort AS BIGINT) AS cohort_year,
           CAST(a.o_year AS BIGINT) AS order_year,
           CAST(a.n_active AS BIGINT) AS n_active,
           CAST(b.cohort_size AS BIGINT) AS cohort_size,
           CAST(a.n_active * CAST(1000000 AS BIGINT) // b.cohort_size
                AS BIGINT) AS retention_ppm
    FROM act a JOIN base b ON b.cohort = a.cohort
    """,
)
def q286_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer cohort retention triangle: customers grouped by
    first-order year, distinct actives counted per (cohort, order
    year), retention as integer ppm of the cohort's size — the
    acquisition-quality report every subscription/commerce analytics
    stack runs, and a two-level aggregation shape (per-entity MIN →
    re-join → distinct count) the corpus didn't yet carry.

    Parity: all integer counts; ppm is integer floor division (both
    engines floor on positives); every cohort customer orders in the
    cohort year by definition, so the base join never drops rows.

    Scale shape: the first-order MIN collapses per custkey map-side;
    the cohort attach re-joins on the SAME custkey hash; the distinct
    count collapses to |years|² cells; the cohort-size attach is a
    |years|-row self-join of the bounded triangle.  No window.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    fo = orders.groupBy("o_custkey").agg(F.min("o_year").alias("cohort"))
    act = (
        orders.join(fo, "o_custkey")
        .groupBy("cohort", "o_year")
        .agg(F.countDistinct("o_custkey").alias("n_active"))
    )
    base = act.filter(F.col("o_year") == F.col("cohort")).select(
        "cohort", F.col("n_active").alias("cohort_size")
    )
    # base is |years| rows — a bounded derived table, broadcast-safe
    return (
        act.join(F.broadcast(base), "cohort")
        .select(
            F.col("cohort").cast("long").alias("cohort_year"),
            F.col("o_year").cast("long").alias("order_year"),
            F.col("n_active").cast("long").alias("n_active"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.expr(
                "CAST(n_active * CAST(1000000 AS BIGINT) div cohort_size"
                " AS BIGINT)"
            ).alias("retention_ppm"),
        )
    )
