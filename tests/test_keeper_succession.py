"""q313 keeper succession — planted promotion / dissolution cases.

Hash parity is covered by test_oracle_parity; this plants three exact
near-dup clusters (identical texts -> Jaccard 1 edges -> one q69
cluster each) whose ids are chosen against the house deletion batch
(doc_id % DOC_DELTA_MOD == DOC_DELETE_REM): one cluster loses its
keeper and must PROMOTE the next by the keep-rule, one dissolves
entirely, one is untouched.
"""

from __future__ import annotations

from datapipeline_dags_spark.plans import llm_ops

MOD, REM = llm_ops.DOC_DELTA_MOD, llm_ops.DOC_DELETE_REM


def _fixture(spark, tmp_path):
    def text(tag):
        return " ".join(f"{tag}w{j}" for j in range(12))

    rows = []
    # cluster A: keeper (lowest id, equal quality) id 2 is DELETED
    assert 2 % MOD == REM and 11 % MOD != REM and 19 % MOD != REM
    for i in (2, 11, 19):
        rows.append((i, text("a"), "en", "s", 0))
    # cluster B: every member deleted -> dissolved
    assert all(i % MOD == REM for i in (10, 18, 26))
    for i in (10, 18, 26):
        rows.append((i, text("b"), "en", "s", 0))
    # cluster C: untouched
    assert all(i % MOD != REM for i in (1, 9, 17))
    for i in (1, 9, 17):
        rows.append((i, text("c"), "en", "s", 0))
    # unique filler so nothing else clusters
    for k, i in enumerate((3, 4, 5, 6, 7, 12, 13)):
        rows.append((i, " ".join(f"f{k}x{j}" for j in range(12)), "en", "s", 0))
    d = tmp_path / "fx"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_q313_promotion_dissolution_unchanged(spark, tmp_path):
    out = llm_ops.q313_keeper_succession(
        spark, _fixture(spark, tmp_path)
    ).collect()
    assert out and all(r["audit_ok"] == 1 for r in out)
    by_old = {r["old_keeper"]: r for r in out}
    # cluster A: keeper 2 deleted -> 11 promoted (equal quality, lowest
    # live id wins the q298 tiebreak)
    a = by_old[2]
    assert a["status"] == "promoted"
    assert a["new_keeper"] == 11
    assert a["n_members"] == 3 and a["n_live"] == 2
    # cluster B: all members deleted -> dissolved, no new keeper
    b = by_old[10]
    assert b["status"] == "dissolved" and b["new_keeper"] == -1
    assert b["n_live"] == 0
    # cluster C: untouched
    c = by_old[1]
    assert c["status"] == "unchanged" and c["new_keeper"] == 1
    assert c["n_live"] == 3


def test_q313_statuses_partition_on_fixture(spark, sf_dir):
    rows = llm_ops.q313_keeper_succession(spark, sf_dir).collect()
    assert rows and all(r["audit_ok"] == 1 for r in rows)
    n = llm_ops.q69_dedup_clusters(spark, sf_dir).select(
        "cluster_id"
    ).distinct().count()
    assert len(rows) == n
    # the fixture exercises promotion AND dissolution (established by
    # the id-mod census; if the fixture generator changes, re-check)
    statuses = {r["status"] for r in rows}
    assert "promoted" in statuses and "dissolved" in statuses
    for r in rows:
        if r["status"] == "promoted":
            assert r["old_keeper"] % MOD == REM
            assert r["new_keeper"] % MOD != REM
        if r["status"] == "dissolved":
            assert r["n_live"] == 0 and r["new_keeper"] == -1
