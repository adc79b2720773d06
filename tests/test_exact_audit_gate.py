"""exact_audit gate (VERDICT r4 ask #3): the exact-percentile owners
(q154's audit columns, q141) must keep the oracle-parity exact path at
fixture scale and switch to a deterministic md5-coin sample above the
row threshold — bounding the per-group percentile buffer at any SF."""

from __future__ import annotations

import pytest

from datapipeline_dags_spark.plans import helpers
from datapipeline_dags_spark.plans.relational import q141_ship_latency_percentiles
from datapipeline_dags_spark.plans.scalars import q154_quantile_sketch


def _rows_by_key(df, keys):
    return {tuple(r[k] for k in keys): r.asDict() for r in df.collect()}


def test_auto_is_exact_at_fixture_scale(spark, sf_dir):
    """Below EXACT_AUDIT_MAX_ROWS the auto mode must produce the exact
    path bit-for-bit — the driver gate's plans never change."""
    auto = _rows_by_key(
        q154_quantile_sketch(spark, sf_dir), ("l_returnflag", "p")
    )
    exact = _rows_by_key(
        q154_quantile_sketch(spark, sf_dir, exact_audit="exact"),
        ("l_returnflag", "p"),
    )
    assert auto == exact


def test_auto_flips_to_distributed_above_threshold(spark, sf_dir, monkeypatch):
    """Above the threshold, auto resolves to the q186 distributed route
    — still EXACT: bit-equal to the buffering percentile path."""
    monkeypatch.setattr(helpers, "EXACT_AUDIT_MAX_ROWS", 10)
    helpers._ROW_COUNT_CACHE.clear()
    auto = _rows_by_key(
        q154_quantile_sketch(spark, sf_dir), ("l_returnflag", "p")
    )
    exact = _rows_by_key(
        q154_quantile_sketch(spark, sf_dir, exact_audit="exact"),
        ("l_returnflag", "p"),
    )
    assert auto == exact


def test_q141_distributed_equals_exact(spark, sf_dir):
    exact = _rows_by_key(
        q141_ship_latency_percentiles(spark, sf_dir, exact_audit="exact"),
        ("o_orderpriority",),
    )
    dist = _rows_by_key(
        q141_ship_latency_percentiles(
            spark, sf_dir, exact_audit="distributed"
        ),
        ("o_orderpriority",),
    )
    assert dist == exact


def test_q154_sampled_mode_still_selectable(spark, sf_dir, monkeypatch):
    monkeypatch.setattr(helpers, "EXACT_AUDIT_TARGET_ROWS", 2_000)
    helpers._ROW_COUNT_CACHE.clear()
    sampled = _rows_by_key(
        q154_quantile_sketch(spark, sf_dir, exact_audit="sampled"),
        ("l_returnflag", "p"),
    )
    exact = _rows_by_key(
        q154_quantile_sketch(spark, sf_dir, exact_audit="exact"),
        ("l_returnflag", "p"),
    )
    assert set(sampled) == set(exact)
    some_diff = False
    for k, srow in sampled.items():
        erow = exact[k]
        # the sketch estimate is untouched by the audit mode
        assert srow["q_est"] == erow["q_est"]
        # the sampled exact is an estimate: close, not necessarily equal
        spread = abs(srow["q_exact"] - erow["q_exact"])
        assert spread <= 0.15 * max(abs(erow["q_exact"]), 1.0)
        some_diff = some_diff or spread > 0
    # with a 2k-row budget over a ~6k-row fixture the coin must
    # actually drop rows somewhere
    assert some_diff


def test_q141_sampled_keeps_counts_exact(spark, sf_dir, monkeypatch):
    monkeypatch.setattr(helpers, "EXACT_AUDIT_TARGET_ROWS", 2_000)
    helpers._ROW_COUNT_CACHE.clear()
    exact = _rows_by_key(
        q141_ship_latency_percentiles(spark, sf_dir, exact_audit="exact"),
        ("o_orderpriority",),
    )
    sampled = _rows_by_key(
        q141_ship_latency_percentiles(spark, sf_dir, exact_audit="sampled"),
        ("o_orderpriority",),
    )
    assert set(sampled) == set(exact)
    # reference: exact percentile over the SAME md5-coin-filtered rows
    # (the deterministic contract of sampled mode — not "close to the
    # full-data value", which at a ~400-rows-per-group fixture sample
    # has unbounded median variance on this spread-out distribution)
    from pyspark.sql import functions as F

    from datapipeline_dags_spark.catalog import table
    from datapipeline_dags_spark.plans.helpers import exact_audit_frac, md5_coin

    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    frac = exact_audit_frac(li.count())
    coin = md5_coin(F.concat_ws("_", "l_orderkey", "l_linenumber"), frac)
    ref = _rows_by_key(
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "o_orderpriority",
            F.when(coin, F.datediff("l_shipdate", "o_orderdate")).alias("days"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            (F.round(F.expr("percentile(days, 0.5)"), 4) + 0.0).alias("p50_days"),
            (F.round(F.expr("percentile(days, 0.9)"), 4) + 0.0).alias("p90_days"),
            (F.round(F.expr("percentile(days, 0.99)"), 4) + 0.0).alias(
                "p99_days"
            ),
        ),
        ("o_orderpriority",),
    )
    for k, srow in sampled.items():
        # n_items is a full count in every mode
        assert srow["n_items"] == exact[k]["n_items"]
        for c in ("p50_days", "p90_days", "p99_days"):
            assert srow[c] == ref[k][c]
    # and the sample genuinely dropped rows somewhere
    assert any(
        sampled[k]["p50_days"] != exact[k]["p50_days"] for k in sampled
    )


def test_bad_mode_rejected(spark, sf_dir):
    with pytest.raises(ValueError):
        q141_ship_latency_percentiles(spark, sf_dir, exact_audit="bogus")


def test_q165_sampled_edges_keep_total_customers(spark, sf_dir, monkeypatch):
    from datapipeline_dags_spark.plans.relational import q165_rfm_segments

    monkeypatch.setattr(helpers, "EXACT_AUDIT_TARGET_ROWS", 200)
    helpers._ROW_COUNT_CACHE.clear()
    exact = q165_rfm_segments(spark, sf_dir, exact_audit="exact").collect()
    sampled = q165_rfm_segments(spark, sf_dir, exact_audit="sampled").collect()
    # the median EDGES come from a sample; every customer is still
    # labeled and counted exactly once
    assert sum(r["n_customers"] for r in sampled) == sum(
        r["n_customers"] for r in exact
    )


def test_q167_sampled_keeps_n_converted_exact(spark, sf_dir, monkeypatch):
    from datapipeline_dags_spark.plans.event_time import q167_conversion_latency

    monkeypatch.setattr(helpers, "EXACT_AUDIT_TARGET_ROWS", 500)
    helpers._ROW_COUNT_CACHE.clear()
    exact = q167_conversion_latency(spark, sf_dir, exact_audit="exact").collect()[0]
    sampled = q167_conversion_latency(
        spark, sf_dir, exact_audit="sampled"
    ).collect()[0]
    assert sampled["n_converted"] == exact["n_converted"]
    # percentiles still finite (a sample survived the coin)
    assert sampled["p50_s"] is not None


def test_q186_matches_buffering_percentile(spark, sf_dir):
    """The distributed histogram-route exact percentile must equal
    Spark's own buffering `percentile` aggregate bit-for-bit after the
    4dp round — same definition, scale-safe plan."""
    from pyspark.sql import functions as F

    from datapipeline_dags_spark.catalog import table
    from datapipeline_dags_spark.plans.scalars import (
        DXP_PS,
        q186_distributed_exact_percentile,
    )

    got = {
        (r["l_returnflag"], r["p"]): r["value"]
        for r in q186_distributed_exact_percentile(spark, sf_dir).collect()
    }
    li = table(spark, sf_dir, "lineitem")
    ref_rows = li.groupBy("l_returnflag").agg(
        *[
            (F.round(F.expr(f"percentile(l_extendedprice, {p})"), 4) + 0.0).alias(
                f"v{i}"
            )
            for i, p in enumerate(DXP_PS)
        ]
    ).collect()
    ref = {
        (r["l_returnflag"], p): r[f"v{i}"]
        for r in ref_rows
        for i, p in enumerate(DXP_PS)
    }
    assert got == ref


def test_q192_distributed_decile_cut_equals_ntile(spark, sf_dir):
    """The distributed tie-class decile cut must be BIT-EQUAL to the
    global-NTILE oracle-parity path at fixture scale (VERDICT r5 ask
    #3) — including straddling tie classes split by vec_id order."""
    from datapipeline_dags_spark.plans.llm_ops import q192_decile_lift

    exact = _rows_by_key(
        q192_decile_lift(spark, sf_dir, exact_audit="exact"), ("decile",)
    )
    dist = _rows_by_key(
        q192_decile_lift(spark, sf_dir, exact_audit="distributed"),
        ("decile",),
    )
    assert dist == exact


def test_q192_auto_flips_to_distributed_above_threshold(
    spark, sf_dir, monkeypatch
):
    monkeypatch.setattr(helpers, "EXACT_AUDIT_MAX_ROWS", 10)
    helpers._ROW_COUNT_CACHE.clear()
    from datapipeline_dags_spark.plans.llm_ops import q192_decile_lift

    auto = _rows_by_key(q192_decile_lift(spark, sf_dir), ("decile",))
    exact = _rows_by_key(
        q192_decile_lift(spark, sf_dir, exact_audit="exact"), ("decile",)
    )
    assert auto == exact


def test_q192_distributed_cut_splits_straddling_tie_classes(spark, tmp_path):
    """A tie class spanning a decile boundary must be split by vec_id
    order exactly as NTILE splits it — the per-row refinement branch.
    23 copies of one embedding + 17 of another guarantee straddles over
    n=40 (deciles of 4)."""
    from datapipeline_dags_spark.plans.llm_ops import CAL_LABEL, q192_decile_lift

    rows = []
    for i in range(23):
        rows.append((i, [1.0, 0.5, 0.25, 0.0], CAL_LABEL if i % 3 == 0 else 1))
    for i in range(23, 40):
        rows.append((i, [0.0, 0.5, 1.0, 0.75], CAL_LABEL if i % 4 == 0 else 2))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = str(tmp_path / "sf_ties")
    df.coalesce(1).write.parquet(out + "/embeddings.parquet")
    exact = _rows_by_key(
        q192_decile_lift(spark, out, exact_audit="exact"), ("decile",)
    )
    dist = _rows_by_key(
        q192_decile_lift(spark, out, exact_audit="distributed"), ("decile",)
    )
    assert dist == exact
    assert len(dist) == 10  # every decile populated (4 rows each)


def test_collected_route_subbins_duplicate_heavy_bin(spark, monkeypatch):
    """A log-bin stuffed with near-identical values (3000 copies each
    of two values one ulp-scale apart) must trigger the collected
    route's sub-histogram pass and still return values bit-identical
    to Spark's buffering percentile and to the distributed route."""
    from pyspark.sql import functions as F

    from datapipeline_dags_spark.plans import scalars

    rows = [(0, 5.0)] * 3000 + [(0, 5.0001)] * 3000
    rows += [(0, float(x)) for x in range(200)]
    gv = spark.createDataFrame(rows, "g int, v double")
    ps = (0.5, 0.9, 0.99)
    monkeypatch.setattr(scalars, "DXP_NARROW_ROWS", 1000)

    def run():
        return {
            (r["g"], r["p"]): r["value"]
            for r in scalars.distributed_percentiles(gv, ps).collect()
        }

    collected = run()
    monkeypatch.setattr(scalars, "DXP_COLLECT_GROUPS", 0)
    distributed = run()
    assert collected == distributed
    ref = gv.agg(
        *[F.expr(f"percentile(v, {p})").alias(f"v{i}") for i, p in enumerate(ps)]
    ).collect()[0]
    for i, p in enumerate(ps):
        assert round(collected[(0, p)], 6) == round(ref[f"v{i}"], 6)


def test_distributed_percentiles_routes_agree(spark, monkeypatch):
    """VERDICT r7 ask #2: the bounded-|g| collected-control-plane route
    (driver-side rank→bin locate over integer counts) must be
    bit-identical to the fully-distributed locate, including under
    forced skew narrowing, and the empty input degrades to an empty
    (g, p, value) frame on both routes."""
    from datapipeline_dags_spark.plans import scalars

    rows = [(g, (i * 37 % 101) / 7.0 + g) for g in range(4) for i in range(500)]
    rows += [(9, 42.0)]  # singleton group: k0 == k1 == 1
    gv = spark.createDataFrame(rows, "g int, v double")
    ps = (0.5, 0.9, 0.99)

    def run():
        return {
            (r["g"], r["p"]): r["value"]
            for r in scalars.distributed_percentiles(gv, ps).collect()
        }

    monkeypatch.setattr(scalars, "DXP_COLLECT_GROUPS", 1024)
    collected = run()
    monkeypatch.setattr(scalars, "DXP_COLLECT_GROUPS", 0)
    distributed = run()
    assert collected == distributed
    assert len(collected) == 5 * len(ps)
    # forced narrowing: both routes sub-bin and still agree
    monkeypatch.setattr(scalars, "DXP_NARROW_ROWS", 100)
    monkeypatch.setattr(scalars, "DXP_COLLECT_GROUPS", 1024)
    collected_skew = run()
    monkeypatch.setattr(scalars, "DXP_COLLECT_GROUPS", 0)
    distributed_skew = run()
    assert collected_skew == distributed_skew == collected
    # empty input: (g, p, value) schema, zero rows, no driver error
    monkeypatch.setattr(scalars, "DXP_COLLECT_GROUPS", 1024)
    empty = scalars.distributed_percentiles(gv.limit(0), ps)
    assert empty.columns == ["g", "p", "value"]
    assert empty.count() == 0


def test_distributed_percentiles_narrowing_bounds_skewed_bin(
    spark, monkeypatch
):
    """99% of the mass in one bin width (a price-like distribution)
    must trigger the sub-binning pass, keep the in-bin window
    partitions bounded, and return values bit-identical to both the
    un-narrowed path and Spark's buffering percentile."""
    from pyspark.sql import functions as F

    from datapipeline_dags_spark.plans import scalars

    # 9900 distinct values packed into [0, 1) + 100 outliers up to 256:
    # bin width = 1 -> bin 0 holds 99% of rows AND of distinct values
    rows = [(0, i / 10000.0) for i in range(9900)]
    rows += [(0, 1.0 + i * 2.55) for i in range(100)]
    gv = spark.createDataFrame(rows, "g int, v double")

    monkeypatch.setattr(scalars, "DXP_NARROW_ROWS", 1000)
    narrowed = {
        (r["g"], r["p"]): r["value"]
        for r in scalars.distributed_percentiles(gv, (0.5, 0.9, 0.99)).collect()
    }
    monkeypatch.setattr(scalars, "DXP_NARROW_ROWS", 10**12)
    plain = {
        (r["g"], r["p"]): r["value"]
        for r in scalars.distributed_percentiles(gv, (0.5, 0.9, 0.99)).collect()
    }
    assert narrowed == plain
    ref_row = gv.agg(
        *[
            F.expr(f"percentile(v, {p})").alias(f"v{i}")
            for i, p in enumerate((0.5, 0.9, 0.99))
        ]
    ).collect()[0]
    for i, p in enumerate((0.5, 0.9, 0.99)):
        # last-ulp interpolation-order differences vs the buffering
        # aggregate are expected; callers apply dec() float discipline
        assert round(narrowed[(0, p)], 6) == round(ref_row[f"v{i}"], 6)

    # and the narrowing genuinely bounds the window partition: the
    # hot bin's distinct values spread over many sub-bins
    monkeypatch.setattr(scalars, "DXP_NARROW_ROWS", 1000)
    st = gv.groupBy("g").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    w = (F.col("hi") - F.col("lo")) / scalars.DXP_BINS
    binned = gv.join(st, "g").select(
        "g",
        "v",
        F.least(
            F.floor((F.col("v") - F.col("lo")) / w).cast("int"),
            F.lit(scalars.DXP_BINS - 1),
        ).alias("bin"),
        F.col("lo"),
        w.alias("w"),
    )
    sub = F.least(
        F.floor(
            (F.col("v") - (F.col("lo") + F.col("bin") * F.col("w")))
            / (F.col("w") / scalars.DXP_BINS)
        ).cast("int"),
        F.lit(scalars.DXP_BINS - 1),
    )
    sizes = (
        binned.filter(F.col("bin") == 0)
        .select("g", "bin", sub.alias("sub"), "v")
        .groupBy("g", "bin", "sub")
        .agg(F.countDistinct("v").alias("nd"))
        .agg(F.max("nd").alias("mx"))
        .collect()[0]["mx"]
    )
    assert sizes <= 100  # 9900 distinct values / 256 sub-bins ≈ 39
