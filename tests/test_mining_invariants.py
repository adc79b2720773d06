"""Metamorphic invariants of the r6 mining/statistics queries
(plans/mining.py): laws the math guarantees regardless of data, so a
violation is always an implementation bug — the complement of the
DuckDB hash oracle (which agrees with mirrored mistakes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipeline_dags_spark.plans.mining import (
    KM_K,
    MINING_OBSERVATIONS,
    TRI_MAX_BASKET,
    q199_copurchase_triangles,
    q200_ks_source_drift,
    q201_kmeans_fixed_point,
    q202_mad_outliers,
    q203_readability,
)


def test_triangles_bounded_by_wedges(spark, sf_dir):
    """Every triangle closes exactly 3 wedges, so 3*T <= W; clustering
    coefficient lands in [0, 1]; and the cap counter observes the
    basket pass."""
    r = q199_copurchase_triangles(spark, sf_dir).collect()[0]
    assert 3 * r["n_triangles"] <= r["n_wedges"]
    assert 0.0 <= r["global_clustering"] <= 1.0
    assert r["n_nodes"] >= 3 or r["n_triangles"] == 0
    obs = MINING_OBSERVATIONS["q199_copurchase_triangles"].get
    assert obs["baskets"] > 0
    assert obs["max_basket_size"] >= 1
    assert "capped_baskets" in obs


def test_triangle_census_on_known_graph(spark, tmp_path):
    """K4 plus a pendant edge, encoded as orders: 4 triangles, 4
    choose 2 + pendant wedges — exact closed-form check."""
    # orders: each order = one basket whose pairs (support>=2 needs
    # each pair in >=2 orders, so emit every basket twice)
    baskets = [
        [1, 2, 3, 4],  # K4: edges all 6 pairs, 4 triangles
        [4, 5],  # pendant edge 4-5, no new triangle
    ]
    rows = []
    ok = 0
    for rep in range(2):  # duplicate so every pair clears support 2
        for b in baskets:
            ok += 1
            for pk in b:
                rows.append((ok, pk))
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    p = str(tmp_path / "lineitem.parquet")
    df.write.parquet(p)
    # q199 reads the lineitem table from sf_dir: write a mini sf dir
    out = q199_copurchase_triangles(spark, str(tmp_path)).collect()[0]
    assert out["n_edges"] == 7
    assert out["n_triangles"] == 4
    # wedges: deg(1)=deg(2)=deg(3)=3, deg(4)=4, deg(5)=1 -> 3*3 + 6 + 0
    assert out["n_wedges"] == 15
    assert abs(out["global_clustering"] - round(12 / 15, 6)) < 1e-9


def test_ks_stat_in_unit_interval(spark, sf_dir):
    rows = q200_ks_source_drift(spark, sf_dir).collect()
    assert rows, "one row per source expected"
    for r in rows:
        assert 0.0 <= r["d_stat"] <= 1.0
        assert r["n_docs"] > 0
        assert r["at_len"] >= 0


def test_ks_identical_distribution_is_zero(spark, tmp_path):
    """Two sources with identical length multisets => D = 0 for both."""
    rows = [(i, "x" * (10 + i % 3), "en", f"src{i % 2}", 10 + i % 3)
            for i in range(60)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = q200_ks_source_drift(spark, str(tmp_path)).collect()
    assert len(out) == 2
    for r in out:
        assert r["d_stat"] == 0.0


def test_kmeans_partitions_the_corpus(spark, sf_dir):
    emb_n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    rows = q201_kmeans_fixed_point(spark, sf_dir).collect()
    assert sum(r["n_members"] for r in rows) == emb_n
    assert len(rows) <= KM_K
    assert all(r["n_members"] > 0 for r in rows)
    assert all(r["inertia_fp"] >= 0 for r in rows)
    # deterministic: second run bit-identical (md5 seeds, integer math)
    again = q201_kmeans_fixed_point(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_mad_outliers_are_minority(spark, sf_dir):
    """By construction |v - med| <= 3*MAD for >= half the rows of any
    distribution (MAD is the median deviation), so outliers < n/2;
    MAD and med are finite, MAD >= 0."""
    for r in q202_mad_outliers(spark, sf_dir).collect():
        assert r["mad"] >= 0.0
        assert r["n_outliers"] < r["n_events"] / 2
        assert r["n_outliers"] >= 0


def test_readability_buckets_partition_docs(spark, sf_dir):
    rows = q203_readability(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_src = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for r in rows:
        assert r["n_easy"] + r["n_college"] + r["n_graduate"] == r["n_docs"]
        assert r["n_docs"] == per_src[r["source"]]
        assert r["total_words"] > 0


def test_triangle_cap_fires_on_giant_basket(spark, tmp_path):
    """A basket above TRI_MAX_BASKET parts is truncated BEFORE the
    quadratic pair explode, and the cap counter reports it."""
    rows = [(1, pk) for pk in range(TRI_MAX_BASKET + 25)]
    rows += [(2, pk) for pk in range(TRI_MAX_BASKET + 25)]
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = q199_copurchase_triangles(spark, str(tmp_path)).collect()[0]
    # only the TRI_MAX_BASKET smallest parts form edges
    expected_edges = TRI_MAX_BASKET * (TRI_MAX_BASKET - 1) // 2
    assert out["n_edges"] == expected_edges
    obs = MINING_OBSERVATIONS["q199_copurchase_triangles"].get
    assert obs["capped_baskets"] == 2
    assert obs["max_basket_size"] == TRI_MAX_BASKET + 25


def test_bfs_levels_are_proper(spark, sf_dir):
    """Level 0 holds exactly the seed; cum_reached is the running sum
    and ends at the total reached; levels are contiguous from 0."""
    from datapipeline_dags_spark.plans.mining import q204_bfs_reach

    rows = sorted(q204_bfs_reach(spark, sf_dir).collect(),
                  key=lambda r: r["level"])
    assert rows[0]["level"] == 0 and rows[0]["n_nodes"] == 1
    assert [r["level"] for r in rows] == list(range(len(rows)))
    run = 0
    for r in rows:
        run += r["n_nodes"]
        assert r["cum_reached"] == run


def test_bfs_on_known_chain(spark, tmp_path):
    """A path graph 1-2-3-4-5 (each edge in 2 orders): whatever the
    md5 seed, level counts must match that seed's hop distances."""
    import hashlib

    pairs = [(1, 2), (2, 3), (3, 4), (4, 5)]
    rows, ok = [], 0
    for rep in range(2):
        for a, b in pairs:
            ok += 1
            rows += [(ok, a), (ok, b)]
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    from datapipeline_dags_spark.plans.mining import q204_bfs_reach

    seed = min(range(1, 6), key=lambda n: (hashlib.md5(str(n).encode()).hexdigest(), n))
    expect = {}
    for n in range(1, 6):
        lvl = abs(n - seed)
        expect[lvl] = expect.get(lvl, 0) + 1
    got = {r["level"]: r["n_nodes"] for r in q204_bfs_reach(spark, str(tmp_path)).collect()}
    assert got == expect


def test_label_propagation_partitions_nodes(spark, sf_dir):
    """Communities partition the node set; sizes are positive; the
    1-row community count matches the distinct labels; and every
    reported community id is a node id (labels only ever copy ids)."""
    from datapipeline_dags_spark.plans.mining import (
        LPA_TOP,
        q215_label_propagation,
    )

    rows = q215_label_propagation(spark, sf_dir).collect()
    assert rows
    nc = rows[0]["n_communities"]
    assert all(r["n_communities"] == nc for r in rows)
    assert len(rows) == min(nc, LPA_TOP)
    ids = [r["community"] for r in rows]
    assert len(ids) == len(set(ids))
    assert all(r["n_nodes"] >= 1 for r in rows)


def test_label_propagation_two_cliques(spark, tmp_path):
    """Two disjoint K4 cliques: LPA must find exactly the two cliques
    (each converges to its minimum node label)."""
    from datapipeline_dags_spark.plans.mining import q215_label_propagation

    rows = []
    ok = 0
    for rep in range(2):  # duplicate orders so pairs clear support 2
        for basket in ([1, 2, 3, 4], [10, 11, 12, 13]):
            ok += 1
            for pk in basket:
                rows.append((ok, pk))
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = q215_label_propagation(spark, str(tmp_path)).collect()
    got = sorted((r["community"], r["n_nodes"]) for r in out)
    assert got == [(1, 4), (10, 4)]
    assert all(r["n_communities"] == 2 for r in out)


def test_item_item_cf_invariants(spark, sf_dir):
    """Ranked lists: ranks are 1..k dense per part, cosines in (0, 1],
    nonincreasing within a part, and no self-recommendations."""
    from collections import defaultdict

    from datapipeline_dags_spark.plans.mining import CF_TOP, q216_item_item_cf

    rows = q216_item_item_cf(spark, sf_dir).collect()
    assert rows
    per = defaultdict(list)
    for r in rows:
        assert r["neighbor"] != r["part"]
        assert 0.0 < r["cosine"] <= 1.0
        assert 1 <= r["rec_rank"] <= CF_TOP
        per[r["part"]].append(r)
    for part, lst in per.items():
        lst.sort(key=lambda r: r["rec_rank"])
        assert [r["rec_rank"] for r in lst] == list(range(1, len(lst) + 1))
        cosines = [r["cosine"] for r in lst]
        assert cosines == sorted(cosines, reverse=True)


def test_item_item_cf_known_counts(spark, tmp_path):
    """Three orders {1,2},{1,2},{1,3},{1,3}: cos(1,2) = 2/sqrt(4*2),
    cos(1,3) = 2/sqrt(4*2), cos(2,3) unsupported (never co-occur)."""
    from datapipeline_dags_spark.plans.mining import q216_item_item_cf

    rows = []
    for ok, basket in enumerate(([1, 2], [1, 2], [1, 3], [1, 3]), start=1):
        for pk in basket:
            rows.append((ok, pk))
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = q216_item_item_cf(spark, str(tmp_path)).collect()
    want_cos = round(2 / (4 * 2) ** 0.5, 6)
    got = {(r["part"], r["neighbor"]): r for r in out}
    assert got[(1, 2)]["cooccur"] == 2 and got[(1, 2)]["cosine"] == want_cos
    assert got[(1, 3)]["cooccur"] == 2 and got[(1, 3)]["cosine"] == want_cos
    assert (2, 3) not in got and (3, 2) not in got
    # part 1's list ranks 2 before 3 only by the id tiebreak
    p1 = sorted(
        [r for r in out if r["part"] == 1], key=lambda r: r["rec_rank"]
    )
    assert [r["neighbor"] for r in p1] == [2, 3]


def test_kcore_converged_within_round_cap(spark, sf_dir):
    """Every returned core member must have core_degree >= KCORE_K —
    true ONLY if the fixed KCORE_ROUNDS peel reached the fixpoint
    (a cap that stops short leaves an under-degree node behind)."""
    from datapipeline_dags_spark.plans.mining import (
        KCORE_K,
        q222_kcore_decomposition,
    )

    rows = q222_kcore_decomposition(spark, sf_dir).collect()
    assert rows, "core emptied at fixture scale"
    assert all(r["core_degree"] >= KCORE_K for r in rows)
    n_nodes = rows[0]["n_core_nodes"]
    n_edges = rows[0]["n_core_edges"]
    # a K-core with n nodes has at least ceil(n*K/2) edges
    assert 2 * n_edges >= n_nodes * KCORE_K


def test_set_cover_greedy_invariants(spark, sf_dir):
    """Marginal gains are non-increasing (submodularity of coverage
    under a greedy argmax) and cumulative coverage is their prefix
    sum."""
    from datapipeline_dags_spark.plans.mining import q225_greedy_set_cover

    rows = sorted(
        q225_greedy_set_cover(spark, sf_dir).collect(),
        key=lambda r: r["pick_rank"],
    )
    assert rows
    gains = [r["marginal_gain"] for r in rows]
    assert all(a >= b for a, b in zip(gains, gains[1:]))
    run = 0
    for r in rows:
        run += r["marginal_gain"]
        assert r["covered_tokens"] == run


def test_set_cover_routes_agree(spark, sf_dir, monkeypatch):
    """The collected factorized-code greedy (default under
    SC_COLLECT_TOKENS) must reproduce the distributed loop's pick
    trajectory exactly — integer gains, same doc-id tiebreak."""
    from datapipeline_dags_spark.plans import mining

    def run():
        return sorted(
            tuple(r)
            for r in mining.q225_greedy_set_cover(spark, sf_dir).collect()
        )

    collected = run()
    monkeypatch.setattr(mining, "SC_COLLECT_TOKENS", 0)
    distributed = run()
    assert collected == distributed
    assert collected, "no picks on the fixture"


def test_kmin_sketch_within_tolerance(spark, sf_dir):
    """With k=64 permutations the k-mins estimator's relative error
    should stay inside ~4/sqrt(k) = 50% on every source (loose bound;
    typical is ~12%)."""
    from datapipeline_dags_spark.plans.mining import q226_kmin_distinct_sketch

    rows = q226_kmin_distinct_sketch(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r["rel_error"]) < 0.5, (r["source"], r["rel_error"])
        assert r["kmin_estimate"] > 0


def test_assortativity_in_range(spark, sf_dir):
    from datapipeline_dags_spark.plans.mining import q228_degree_assortativity

    row = q228_degree_assortativity(spark, sf_dir).collect()[0]
    assert -1.0 <= row["assortativity"] <= 1.0
    assert row["n_nodes"] > 0 and row["n_edges"] > 0


def test_good_turing_invariants(spark, sf_dir):
    """n1 + 2*n2 <= N, unseen mass in [0,1], and Chao1 >= observed
    vocabulary (the estimator only ever adds unseen species)."""
    from datapipeline_dags_spark.plans.mining import q229_good_turing_richness

    rows = q229_good_turing_richness(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_singletons"] + 2 * r["n_doubletons"] <= r["n_shingles"]
        assert 0.0 <= r["unseen_mass"] <= 1.0
        assert r["chao1_richness"] >= r["vocab"]


def test_kappa_bounds_and_margins(spark, sf_dir):
    from datapipeline_dags_spark.plans.llm_ops import q232_cohens_kappa

    rows = q232_cohens_kappa(spark, sf_dir).collect()
    assert rows
    n = sum(r["n_label"] for r in rows)
    assert sum(r["n_pred"] for r in rows) == n
    for r in rows:
        assert 0 <= r["n_agree"] <= min(r["n_label"], r["n_pred"])
        assert -1.0 <= r["kappa"] <= 1.0
        assert 0.0 <= r["expected_agreement"] <= 1.0


def test_purity_nmi_bounds(spark, sf_dir):
    """Purity and NMI live in (0, 1]; majority counts are consistent
    with member counts; purity >= 1/|labels| (majority beats uniform)."""
    from datapipeline_dags_spark.plans.mining import q234_cluster_purity_nmi

    rows = q234_cluster_purity_nmi(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["majority_n"] <= r["n_members"]
        assert 0.0 < r["purity"] <= 1.0
        assert 0.0 <= r["nmi"] <= 1.0 + 1e-9


def test_join_cardinality_exact_side(spark, sf_dir):
    """The 'exact' column must equal the true join size (checked by
    actually running one of the joins), and the estimate must carry
    the declared sign convention in rel_error."""
    from datapipeline_dags_spark.catalog import table as _t
    from datapipeline_dags_spark.plans.mining import (
        q233_join_cardinality_estimate,
    )

    rows = {
        r["join_name"]: r
        for r in q233_join_cardinality_estimate(spark, sf_dir).collect()
    }
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    true_n = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert rows["lineitem_orders"]["exact_rows"] == true_n
    for r in rows.values():
        assert r["est_rows"] >= 0
        got = round((r["est_rows"] - r["exact_rows"]) / r["exact_rows"], 4)
        assert abs(got - r["rel_error"]) < 1e-9


def test_centroid_drift_aa_calibration(spark, sf_dir):
    """The md5 A/A split draws both halves from the same distribution,
    so the mean-shift ratio should sit near its A/A expectation
    ~ 1/nA + 1/nB and norms should roughly agree."""
    from datapipeline_dags_spark.plans.llm_ops import (
        q235_embedding_centroid_drift,
    )

    rows = q235_embedding_centroid_drift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_half_a"] > 0 and r["n_half_b"] > 0
        assert -1.0 <= r["centroid_cosine"] <= 1.0
        assert 0.3 < r["norm_ratio"] < 3.0
        # A/A expectation is ~ 1/nA + 1/nB (dimension-free); allow a
        # generous sampling-noise factor
        bound = 8 * (1.0 / r["n_half_a"] + 1.0 / r["n_half_b"])
        assert 0.0 <= r["mean_shift_ratio"] < max(bound, 1.0), (
            r["label"],
            r["mean_shift_ratio"],
        )


def test_mmr_trajectory_properties(spark, sf_dir):
    """Pick 1 is the pure-relevance argmax; MMR scores never exceed
    REL_W x that pick's relevance; no duplicates."""
    from datapipeline_dags_spark.plans.llm_ops import (
        MMR_REL_W,
        q236_mmr_selection,
    )

    rows = sorted(
        q236_mmr_selection(spark, sf_dir).collect(),
        key=lambda r: r["pick_rank"],
    )
    assert rows
    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids))
    top_rel = rows[0]["rel_cos"]
    assert abs(rows[0]["mmr_score"] - round(MMR_REL_W * top_rel, 4)) < 1e-6
    assert all(r["rel_cos"] <= top_rel + 1e-9 for r in rows[:1])
    assert all(r["mmr_score"] <= rows[0]["mmr_score"] + 1e-9 for r in rows)
