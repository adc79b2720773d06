"""Collect-and-solve route discipline (VERDICT r9 ask #4).

The q294 r8 lesson, encoded once: a collect gate sized BETWEEN the x1
and x10 stress-fixture cardinalities makes the 10x SCALING ratio
measure a route TRANSITION, not the algorithm (6M edges crossing the
old 2M gate read as 8x when the both-collected truth was 1.5x).  Every
gated query must keep its gate above the x10 fixture's frame
cardinality — or explicitly re-measure both routes in SCALING.md.

Measured 2026-08-16 on the tools/scaling.py x10 derivative of sf0.1
(10 disjoint replicas; re-measure with plans.route.ROUTE_GATES after
running each query on /tmp/spark_graft_scale/x10).
"""

from __future__ import annotations

import pytest

from datapipeline_dags_spark.operators import graph
from datapipeline_dags_spark.plans import llm_ops, mining, modeling, relational
from datapipeline_dags_spark.plans import route

#: query -> (module, gate constant name, measured x10 frame rows)
GATED = {
    "q183_part_pagerank": (relational, "PR_COLLECT_EDGES", 71_460),
    # x10 = 10x the measured x1 anchor-pair edges (328 at sf0.1;
    # disjoint replicas) — the largest CC consumer's edge frame
    "connected_components": (graph, "CC_COLLECT_EDGES", 3_280),
    "q221_bradley_terry": (modeling, "BT_COLLECT_PAIRS", 453_549),
    "q222_kcore_decomposition": (mining, "KCORE_COLLECT_EDGES", 35_730),
    "q225_greedy_set_cover": (mining, "SC_COLLECT_TOKENS", 2_507_040),
    "q294_hits_hubs_authorities": (llm_ops, "HITS_COLLECT_EDGES", 5_993_510),
    "q316_source_acquisition_order": (llm_ops, "ACQ_COLLECT_TOKENS", 2_503_880),
    "q325_ppr_seed_expansion": (llm_ops, "PPR_COLLECT_EDGES", 6_326),
}


def test_gates_exceed_x10_fixture_cardinality():
    """No gate may sit inside the (x1, x10) cardinality interval —
    crossing it there turns the SCALING ratio into a route artifact."""
    for name, (mod, const, x10_rows) in GATED.items():
        gate = getattr(mod, const)
        assert gate > x10_rows, (
            f"{name}: {const}={gate} is at or below the x10 stress "
            f"fixture's {x10_rows} rows — the 10x SCALING row would "
            "measure a route transition, not the algorithm (q294 r8 "
            "lesson). Raise the gate or measure both routes."
        )


def test_collect_gate_records_and_routes(spark):
    df = spark.range(10).toDF("x")
    assert route.collect_gate(df, 100, "t_under") is True
    assert route.ROUTE_GATES["t_under"] == {
        "gate": 100, "rows": 10, "route": "collected", "forced": False,
    }
    assert route.collect_gate(df, 5, "t_over") is False
    assert route.ROUTE_GATES["t_over"]["route"] == "distributed"


def test_collect_route_env_force(spark, monkeypatch):
    df = spark.range(10).toDF("x")
    monkeypatch.setenv("SPARK_GRAFT_COLLECT_ROUTE", "distributed")
    assert route.collect_gate(df, 100, "t_forced") is False
    assert route.ROUTE_GATES["t_forced"]["forced"] is True
    assert route.ROUTE_GATES["t_forced"]["rows"] is None  # no probe paid
    monkeypatch.setenv("SPARK_GRAFT_COLLECT_ROUTE", "collected")
    assert route.collect_gate(df, 100, "t_forced2") is True
    assert route.ROUTE_GATES["t_forced2"]["forced"] is True
    # over-gate + forced collected: correctness wins — the collected
    # backends assert their bounds via bounded_collect, so honoring
    # the knob would crash mid-query instead of measuring; mirrors
    # probe_collect's rule (ADVICE r11 #3)
    assert route.collect_gate(df, 5, "t_forced3") is False
    assert route.ROUTE_GATES["t_forced3"]["route"] == "distributed"
    assert route.ROUTE_GATES["t_forced3"]["forced"] is False


def test_collect_and_solve_dispatch(spark):
    df = spark.range(3).toDF("x")
    got = route.collect_and_solve(
        df, 100, "t_cas",
        lambda d: d.selectExpr("x * 2 AS x"),
        lambda d: (_ for _ in ()).throw(AssertionError("wrong route")),
    )
    assert sorted(r.x for r in got.collect()) == [0, 2, 4]


def test_bounded_collect_asserts_bound(spark):
    df = spark.range(50).toDF("x")
    rows = route.bounded_collect(df, 50, "t_bc")
    assert len(rows) == 50
    assert route.ROUTE_GATES["t_bc"]["route"] == "bounded"
    with pytest.raises(ValueError, match="bounded-by-construction"):
        route.bounded_collect(df, 49, "t_bc_over")


def test_env_force_produces_identical_results(spark, sf_dir, monkeypatch):
    """The scaling harness's lever: forcing either route on a query
    whose gate would pick the other must not change a single value
    (q183 is the cheapest gated query at fixture scale)."""
    base = {
        tuple(r)
        for r in relational.q183_part_pagerank(spark, sf_dir).collect()
    }
    monkeypatch.setenv("SPARK_GRAFT_COLLECT_ROUTE", "distributed")
    forced = {
        tuple(r)
        for r in relational.q183_part_pagerank(spark, sf_dir).collect()
    }
    assert base == forced


def test_probe_collect_routes_and_records(spark, monkeypatch):
    """probe_collect (q186's histogram shape): under the cap →
    collected rows; over the cap → None (a ROUTE, not an error); a
    forced 'collected' override can never take a TRUNCATED collect."""
    df = spark.range(10).toDF("x")
    rows = route.probe_collect(df, 100, "t_pc_under")
    assert rows is not None and len(rows) == 10
    assert route.ROUTE_GATES["t_pc_under"]["route"] == "collected"
    assert route.probe_collect(df, 5, "t_pc_over") is None
    assert route.ROUTE_GATES["t_pc_over"]["route"] == "distributed"
    monkeypatch.setenv("SPARK_GRAFT_COLLECT_ROUTE", "distributed")
    assert route.probe_collect(df, 100, "t_pc_forced") is None
    assert route.ROUTE_GATES["t_pc_forced"]["forced"] is True
    monkeypatch.setenv("SPARK_GRAFT_COLLECT_ROUTE", "collected")
    # over-cap + forced collected: correctness wins, distributed route
    assert route.probe_collect(df, 5, "t_pc_forced2") is None


def test_q209_forced_collected_over_gate_routes_distributed(
    spark, sf_dir, monkeypatch
):
    """ADVICE r11 #3's exact scenario: SPARK_GRAFT_COLLECT_ROUTE=
    collected forced while the dense-cell count exceeds
    GRID_CC_DRIVER_MAX used to take the driver route and crash in
    bounded_collect mid-query; it must route distributed and produce
    identical rows, so a scaling-harness both-routes sweep measures
    instead of crashing."""
    base = {
        tuple(r)
        for r in modeling.q209_grid_density_clusters(spark, sf_dir).collect()
    }
    monkeypatch.setattr(modeling, "GRID_CC_DRIVER_MAX", 1)
    monkeypatch.setenv("SPARK_GRAFT_COLLECT_ROUTE", "collected")
    got = {
        tuple(r)
        for r in modeling.q209_grid_density_clusters(spark, sf_dir).collect()
    }
    assert got == base
    assert route.ROUTE_GATES["q209_grid_cc"]["route"] == "distributed"
    assert route.ROUTE_GATES["q209_grid_cc"]["forced"] is False


def test_q209_env_force_produces_identical_results(spark, sf_dir, monkeypatch):
    """q209's auto backend now routes through collect_gate: forcing the
    distributed CC must not change a single cluster row."""
    base = {
        tuple(r)
        for r in modeling.q209_grid_density_clusters(spark, sf_dir).collect()
    }
    monkeypatch.setenv("SPARK_GRAFT_COLLECT_ROUTE", "distributed")
    forced = {
        tuple(r)
        for r in modeling.q209_grid_density_clusters(spark, sf_dir).collect()
    }
    assert base == forced
    assert route.ROUTE_GATES["q209_grid_cc"]["forced"] is True


def test_q222_routes_produce_identical_results(spark, sf_dir, monkeypatch):
    """q222's r12 driver-side peel (collect_and_solve) must be
    bit-equal to the distributed 12-round peel — integer degree/set
    arithmetic, same (core_degree DESC, part) top-k boundary."""
    base = sorted(
        tuple(r)
        for r in mining.q222_kcore_decomposition(spark, sf_dir).collect()
    )
    assert route.ROUTE_GATES["q222_kcore_decomposition"]["route"] == "collected"
    monkeypatch.setenv("SPARK_GRAFT_COLLECT_ROUTE", "distributed")
    forced = sorted(
        tuple(r)
        for r in mining.q222_kcore_decomposition(spark, sf_dir).collect()
    )
    assert base == forced
