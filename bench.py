"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Methodology:
  - each query runs REPS (3) times; reported time is the MEDIAN;
  - materialization is a full noop-format write (every output expression
    is computed — df.count() would let Catalyst prune projections);
  - headline queries with no implementation are reported in "skipped",
    never silently dropped.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datapipeline_dags_spark.plans.all import QUERIES  # noqa: E402
from datapipeline_dags_spark.session import get_session  # noqa: E402

HEADLINE = [
    "q01_pricing_summary",
    "q02_shipping_priority",
    "q03_local_supplier_volume",
    "q05_returned_items",
    "q08_outer_join_order_counts",
    "q15_window_top3_per_customer",
    "q24_sessionize_events",
    "q31_pivot_event_types",
    # extension operators (SURVEY §2.11)
    "q40_dedup_exact",
    "q41_dedup_minhash_lsh",
    "q45_ann_topk_bruteforce",
    "q50_text_quality",
    # round-2 additions: cluster resolution + compressed-code ANN
    "q69_dedup_clusters",
    "q75_ann_pq",
    # round-3 additions: semantic dedup, DSIR selection, filter chain
    "q96_semantic_dedup",
    "q97_dsir_importance",
    "q99_quality_filter_chain",
    # round-3 (cont.): integer-signature SimHash, combined IVF-PQ
    "q42_dedup_simhash",
    "q112_ann_ivfpq",
    # round-4 additions: one representative per newest operator family —
    # BPE induction, sweep-line concurrency, PSI drift
    "q101_bpe_merges",
    "q118_session_concurrency",
    "q123_psi_drift",
    # round-4 (cont.): prefix-filter Jaccard, mergeable quantile sketch,
    # session path analysis
    "q144_prefix_filter_jaccard",
    "q154_quantile_sketch",
    "q149_session_paths",
    # round-5 additions: incremental rollup maintenance, RFM
    # segmentation, post-cap cluster cohesion audit (VERDICT r4 ask #8)
    "q161_incremental_rollup",
    "q165_rfm_segments",
    "q173_cluster_cohesion",
    # round-5 (cont.): the buffering-free exact percentile
    "q186_distributed_exact_percentile",
    # round-6 additions (VERDICT r5 ask #7): the newest heavy families —
    # video frame near-dup, itemset triple explode, iterative PageRank,
    # and the decile lift table post-distributed-cut
    "q174_video_dhash_neardup",
    "q179_itemset_triples",
    "q183_part_pagerank",
    "q192_decile_lift",
    # round-6 (cont.): the two heaviest new mining plans — degree-
    # oriented triangle census and fixed-point iterative k-means
    "q199_copurchase_triangles",
    "q201_kmeans_fixed_point",
    # round-6 batch 3 (this session): the two new model families with
    # non-trivial plans — Markov removal-effect attribution (journey
    # windows + driver-side fixed-point solve) and grid-density
    # clustering (map-side projection + cell CC)
    "q207_markov_attribution",
    "q209_grid_density_clusters",
    # the triplet miner exercises q41's shared LSH engine plus the
    # top-1 windows and the pool pick — the heaviest batch-5 plan
    "q214_triplet_mining",
    # item-item CF: the co-purchase pair explode + two aggs + per-part
    # ranking — the heaviest batch-6 plan
    "q216_item_item_cf",
    # round-6 batch 7: the three heaviest new plans — 8-round integer
    # Bradley-Terry MM, the 12-round k-core peel, and the 10-round
    # greedy set-cover (each round a full anti-join + argmax)
    "q221_bradley_terry",
    "q222_kcore_decomposition",
    "q225_greedy_set_cover",
    # round-7 additions (VERDICT r6 ask #8): the widest unbenched r6
    # plans — the 29-shuffle purity/NMI audit over the k-means
    # assignment and the single-pass dedup threshold sweep
    "q234_cluster_purity_nmi",
    "q252_dedup_threshold_sweep",
    # round-8 additions (VERDICT r7 ask #6): the audit queries were
    # the biggest round-over-round blind spot — the 4-variant ANN
    # recall and nDCG composites, the |sources|² sketch grid, the
    # two-sample capture-recapture estimate — plus the new
    # incremental IVF delta-refresh (ask #8)
    "q90_ann_recall",
    "q159_ann_ndcg",
    "q147_source_overlap_sketch",
    "q273_capture_recapture",
    "q282_ivf_delta_refresh",
    # round-9 additions (VERDICT r8 ask #6): q202 carries the
    # distributed_percentiles log-bin route whose wins were previously
    # invisible round-over-round; q286 is the widest new r8 relational
    # plan (cohort retention triangle); q284 tracks the LSH
    # delta-refresh after its pair-frame persists
    "q202_mad_outliers",
    "q286_cohort_retention",
    "q284_lsh_delta_refresh",
    # round-10 addition (VERDICT r9 ask #7): the hybrid lexical+dense
    # retrieval composition — BM25 more-like-this fused with the q46/
    # q47 dense lists via RRF, the production search-stack shape
    "q295_hybrid_retrieval",
    # round-11 additions (VERDICT r10 ask #2): the deletion half of the
    # lifecycle — the manifest APPLY (anti-join + conservation audit)
    # and the widest DELETE-delta IVM (signed IVF retraction)
    "q299_deletion_manifest_apply",
    "q300_ivf_delete_refresh",
    # round-12 additions (VERDICT r11 ask #2): the PQ code-table IVM
    # pair — insert-delta encode merge and id-keyed delete retraction —
    # and the IVF-PQ residual-code refresh (insert+delete in one tick,
    # the contract on q112's production composition)
    "q304_pq_codes_delta_refresh",
    "q305_pq_codes_delete_refresh",
    "q307_ivfpq_codes_refresh",
    # round-12 additions (second batch): the boilerplate STRIP (q133's
    # apply half — segment explode + re-stitch + conservation audit),
    # the token-budget curriculum take (per-source window + bounded
    # bucket waterline), and the fused contamination verdict (q109 ∪
    # q303 with lexical precedence)
    "q308_boilerplate_strip",
    "q309_token_budget_curriculum",
    "q310_contamination_fusion",
    # the end-to-end curation funnel (dedup → strip → floor → budget)
    # accounted in tokens, with per-stage independent audits
    "q311_curation_token_waterfall",
    # the selection-bias audit: eval-shingle coverage of the budget
    # take vs the full pool
    "q312_take_coverage_audit",
    # keeper succession under deletion (promotion / dissolution over
    # the q69 clusters)
    "q313_keeper_succession",
    # the PQ subspace-count sweep: 3 encode configs + pure-ADC recall
    # vs the exact truth (the m tuning frontier)
    "q314_pq_subspace_sweep",
    # the BM25 (k1, b) sweep: one tf/df build, 3 re-scorings
    "q315_bm25_param_sweep",
    # greedy source acquisition ordering (catalog-bounded rounds)
    "q316_source_acquisition_order",
    # round-12 additions (fourth batch): the Kneser-Ney continuation
    # scorer (bigram-type aggs + doc-keyed join, the q121 shape)
    "q317_kneser_ney_score",
    # the ratio-margin bitext miner (label-blocked pair join + two
    # partitioned top-k neighborhood aggs, exact integer margins)
    "q318_bitext_margin_mining",
    # the padding-waste audit (two per-source windows over a
    # 3-integer collapse; |sources| x 2 rows)
    "q319_padding_waste_audit",
    # the k-center greedy coreset (k map-side center attaches +
    # TakeOrdered(1) argmax rounds over the checkpointed state)
    "q320_kcenter_coreset",
    # the in-engine logistic trainer (3 map-side sufficient-statistic
    # passes + 1-row collects; model state = 3 doubles)
    "q321_logistic_irls",
    # the weighted multiset-Jaccard verifier (anchor-blocked
    # candidates x (doc, token)-keyed count joins, all integer)
    "q322_weighted_jaccard",
    # the worst-group disparity audit (q321's fit + one bounded
    # per-source agg + TakeOrdered(1) worst pick)
    "q323_model_disparity_audit",
    # the held-out perplexity contamination screen (train-split LM
    # counts + token-keyed eval scoring joins, q121's shuffle classes)
    "q324_perplexity_contamination",
    # personalized-PageRank seed expansion (q69's anchor graph +
    # q183's gated integer power iterations, seed-restart vector)
    "q325_ppr_seed_expansion",
    # per-source group influence (one Hessian agg + one bounded
    # gradient agg over the trained model's scores — no refits)
    "q326_group_influence",
]

REPS = 3


def materialize(df) -> None:
    """Execute the full plan: noop write computes every output column."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_session("bench")

    # JVM/codegen warmup on a trivial action so per-query numbers measure
    # the plan, not session bring-up.
    spark.range(1000).count()

    # The two ANN audit metrics share every expensive input (the exact
    # brute-force baseline + all four method retrievals); they are
    # timed as one sequence per rep via ann_audit_frames — q90's slot
    # pays the lazy frame build, q159's slot reuses the persisted
    # frames (VERDICT r8 ask #4) — so the pair's combined cost is
    # honest while the per-slot split shows where it lands.
    ANN_AUDIT_PAIR = ("q90_ann_recall", "q159_ann_ndcg")

    timings: dict[str, float] = {}
    # Per-query [min, median, max] of the REPS — the noise evidence the
    # headline median alone can't carry (VERDICT r11 ask #3): this VM's
    # wall clock swings 2-10x between reps (JVM/codegen warm-up, host
    # load), so a cross-session mover whose own spread straddles the
    # delta is variance, not a regression.  See BASELINE.md "Reading
    # the bench spread".
    spread: dict[str, list[float]] = {}
    skipped: list[str] = []

    def record(name: str, runs: list[float]) -> None:
        timings[name] = round(statistics.median(runs), 3)
        spread[name] = [
            round(min(runs), 3),
            round(statistics.median(runs), 3),
            round(max(runs), 3),
        ]

    for name in HEADLINE:
        if name not in QUERIES:
            skipped.append(name)
            continue
        if name in ANN_AUDIT_PAIR and all(n in QUERIES for n in ANN_AUDIT_PAIR):
            # timed as a shared-frame pair below; if only ONE member is
            # registered the pair block can't run, so fall through and
            # time it standalone here (frames=None rebuilds internally)
            # rather than silently dropping it from the report.
            continue
        runs = []
        for _ in range(REPS):
            t0 = time.time()
            materialize(QUERIES[name](spark, sf_dir))
            runs.append(time.time() - t0)
            # Queries that persist() intermediates (e.g. q41's shingle
            # table) would otherwise leak one cache per rep — each rep
            # must pay its own materialization, not inherit a warm cache
            # or the GC pressure of abandoned ones.
            spark.catalog.clearCache()
        record(name, runs)

    from datapipeline_dags_spark.plans import llm_ops

    if all(n in QUERIES for n in ANN_AUDIT_PAIR):
        r90: list[float] = []
        r159: list[float] = []
        for _ in range(REPS):
            frames = llm_ops.ann_audit_frames(spark, sf_dir)
            t0 = time.time()
            materialize(QUERIES[ANN_AUDIT_PAIR[0]](spark, sf_dir, frames=frames))
            t1 = time.time()
            materialize(QUERIES[ANN_AUDIT_PAIR[1]](spark, sf_dir, frames=frames))
            r159.append(time.time() - t1)
            r90.append(t1 - t0)
            spark.catalog.clearCache()
        record(ANN_AUDIT_PAIR[0], r90)
        record(ANN_AUDIT_PAIR[1], r159)
    total = round(sum(timings.values()), 3)

    # ANN quality: recall@k of each approximate operator vs the exact
    # top-k (q90), plus the IVF nprobe recall trade-off curve.  Quality
    # is reported next to latency so a fast-but-blind ANN config can't
    # look like a win.
    recall_rows = llm_ops.q90_ann_recall(spark, sf_dir).collect()
    ann_recall = {
        f"{r.method}@{r.k}": float(r.recall) for r in recall_rows
    }
    ann_recall["ivf_nprobe"] = {
        str(np_): r for np_, r in llm_ops.ivf_recall_sweep(spark, sf_dir).items()
    }

    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "skipped": skipped,
                "reps": REPS,
                "agg": "median",
                "sf": sf,
                "ann_recall": ann_recall,
            }
        )
    )


if __name__ == "__main__":
    main()
