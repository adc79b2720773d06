"""q173 member cap: the within-cluster pair audit must stay bounded on
the giant chained clusters the query exists to detect (VERDICT r4:
q69's bucket caps bound candidate *edges*, not component size, so an
uncapped audit is O(size²) exactly when it matters).

Fixture: a hub-and-spoke "boilerplate hub" cluster — one hub doc whose
four anchor shingles each appear verbatim in ~300 spoke docs.  Every
spoke shares an anchor with the hub (edge guaranteed: spokes have
exactly 4 shingles, all of which are anchors at ANCHOR_K=4), so
connected components merges all 1 201 docs into ONE cluster of
diameter 2, while spokes from different anchor groups share no shingle
at all (min pairwise Jaccard 0 — a maximally chained cluster)."""

from __future__ import annotations

import pandas as pd
import pytest

from datapipeline_dags_spark.plans import llm_ops

N_GROUPS = 4
SPOKES_PER_GROUP = 300
N_DOCS = 1 + N_GROUPS * SPOKES_PER_GROUP  # 1201


@pytest.fixture(scope="module")
def chained_dir(tmp_path_factory):
    hub_words = [f"g{i}" for i in range(8)]
    # the hub's 4 shingles (SHINGLE_K=5 over 8 words), each a verbatim
    # 5-word run the spokes embed:
    hub_shingles = [hub_words[i : i + 5] for i in range(4)]
    rows = [(0, " ".join(hub_words), "en", "hub")]
    did = 1
    for j in range(N_GROUPS):
        for _ in range(SPOKES_PER_GROUP):
            uniq = [f"u{did}a", f"u{did}b", f"u{did}c"]
            text = " ".join(uniq + hub_shingles[j])
            rows.append((did, text, "en", "spoke"))
            did += 1
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    d = tmp_path_factory.mktemp("chained")
    pdf.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_giant_chained_cluster_is_one_component(spark, chained_dir):
    cl = llm_ops.q69_dedup_clusters(spark, chained_dir)
    sizes = cl.groupBy("cluster_id").count().collect()
    assert len(sizes) == 1
    assert sizes[0]["count"] == N_DOCS


def test_cohesion_audit_is_capped_and_observable(spark, chained_dir):
    out = llm_ops.q173_cluster_cohesion(spark, chained_dir).collect()
    assert len(out) == 1
    row = out[0]
    k = llm_ops.COHESION_MAX_MEMBERS
    assert row["n_members_total"] == N_DOCS
    assert row["n_members_audited"] == k
    # pair count is C(K, 2), not C(1201, 2) = 720 600
    assert row["n_pairs"] == k * (k - 1) // 2
    # spokes from different anchor groups share nothing — the sampled
    # min Jaccard exposes the chaining regardless of which members the
    # md5 coin picked
    assert row["chained"] is True
    assert row["min_jaccard"] == 0.0
    obs = llm_ops.BUCKET_OBSERVATIONS["q173_cluster_cohesion"].get
    assert obs["buckets"] == 1
    assert obs["capped_buckets"] == 1
    assert obs["max_bucket_size"] == N_DOCS
