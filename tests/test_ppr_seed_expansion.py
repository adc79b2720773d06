"""q325 personalized PageRank seed expansion — the proximity
semantics and the route discipline.

Hash parity vs the DuckDB oracle is covered by test_oracle_parity;
these pin: restart mass reaches only the seed component (a planted
disconnected cluster scores exactly 0 — the personalization q183's
uniform restart cannot express), non-seed neighbors of seeds DO
score, and the collected/distributed routes are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipeline_dags_spark.plans import llm_ops

_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _write(spark, tmp_path, rows):
    d = tmp_path / "fx"
    d.mkdir(exist_ok=True)
    spark.createDataFrame(rows, _SCHEMA).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_q325_mass_stays_in_seed_component(spark, tmp_path):
    a_text = " ".join(f"alpha{j}" for j in range(30))
    b_text = " ".join(f"beta{j}" for j in range(30))
    rows = []
    # component A: docs 0..8 near-identical (doc 8 is NOT a seed —
    # seeds are the 8 smallest graph ids)
    for i in range(9):
        rows.append((i, a_text + f" tail{i}", "en", "s", 1))
    # component B: disconnected from A
    for i in (13, 14, 15, 16):
        rows.append((i, b_text + f" tail{i}", "en", "s", 1))
    fx = _write(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in llm_ops.q325_ppr_seed_expansion(spark, fx).collect()}
    assert set(out) == {0, 1, 2, 3, 4, 5, 6, 7, 8, 13, 14, 15, 16}
    assert {d for d, r in out.items() if r["is_seed"] == 1} == set(range(8))
    # the non-seed member of the seed component accumulates rank
    assert out[8]["ppr_units"] > 0
    # the disconnected component gets EXACTLY zero (no restart there)
    for d in (13, 14, 15, 16):
        assert out[d]["ppr_units"] == 0


def test_q325_routes_bit_identical(spark, sf_dir, monkeypatch):
    base = {tuple(r) for r in llm_ops.q325_ppr_seed_expansion(spark, sf_dir).collect()}
    monkeypatch.setenv("SPARK_GRAFT_COLLECT_ROUTE", "distributed")
    forced = {tuple(r) for r in llm_ops.q325_ppr_seed_expansion(spark, sf_dir).collect()}
    assert base == forced and base


def test_q325_fixture_shape(spark, sf_dir):
    rows = llm_ops.q325_ppr_seed_expansion(spark, sf_dir).collect()
    assert rows
    seeds = [r for r in rows if r["is_seed"] == 1]
    assert len(seeds) == min(llm_ops.PPR_NSEEDS, len(rows))
    assert all(r["ppr_units"] >= 0 for r in rows)
    # total mass stays bounded by the injected restart mass scaled by
    # the geometric series 1/(1-damp) (floors only lose mass)
    n = len(rows)
    injected = (llm_ops.PPR_SEED_NUM * n) // llm_ops.PPR_NSEEDS * min(
        llm_ops.PPR_NSEEDS, n
    )
    assert sum(r["ppr_units"] for r in rows) <= injected * llm_ops.PPR_DAMP_DEN // (
        llm_ops.PPR_DAMP_DEN - llm_ops.PPR_DAMP_NUM
    )
