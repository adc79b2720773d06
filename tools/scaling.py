"""Scale-stress harness: run the heavy dedup/ANN operators on a 10x
derivative of the sf0.1 fixture and record how wall time, q69 round
count, and bucket-cap counters move — evidence that the blocking-based
designs scale linearly, not quadratically.

The 10x corpus is built OUTSIDE the read-only /root/testdata: replica
r > 0 suffixes every word with ``_r<r>``, so every shingle is distinct
across replicas — 10 independent copies of the corpus's near-dup
structure, which is exactly the linear-scaling regime (no artificial
cross-replica pairs, no degenerate all-identical buckets).  Embeddings
replicate with offset vec_ids, keeping the q75 query set and codebook
(low ids) identical at both scales.

Usage: PYTHONPATH=/root/repo python tools/scaling.py   # writes SCALING.md
"""

from __future__ import annotations

import os
import statistics
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipeline_dags_spark.operators import graph  # noqa: E402
from datapipeline_dags_spark.plans import llm_ops, mining  # noqa: E402
from datapipeline_dags_spark.plans.all import QUERIES  # noqa: E402
from datapipeline_dags_spark.session import get_session  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/spark_graft_scale"
REPS = 2
TARGETS = (
    "q41_dedup_minhash_lsh",
    "q42_dedup_simhash",
    "q43_ngram_jaccard",
    "q144_prefix_filter_jaccard",
    "q69_dedup_clusters",
    "q75_ann_pq",
    "q112_ann_ivfpq",
    "q112_ann_ivfpq_jvm",
    "q96_semantic_dedup",
    "q96_semantic_dedup_flat_jvm",
    # the three widest plans in the corpus (VERDICT r4 ask #4):
    "q125_tfidf_sparse_cosine",  # 33 shuffles / 14 scans
    "q147_source_overlap_sketch",  # 23 shuffles
    "q137_survivorship_funnel",  # 16 shuffles (q40 . q69 . q99)
    # round-6 additions (VERDICT r5 ask #6): image/video dHash banding
    # post-chunking, and the iterative fixed-point PageRank
    "q91_image_phash_neardup",
    "q174_video_dhash_neardup",
    "q183_part_pagerank",
    # round-6 batch 2: degree-oriented triangle census (wedge join must
    # track edges, not degree^2), fixed-point Lloyd k-means (map-only
    # assignment + k*dim-cell update shuffle must stay flat per round),
    # BFS frontier expansion (per-round join bounded by edges), and the
    # audio fingerprint near-dup (banded blocking, q91's regime on
    # energy fingerprints)
    "q199_copurchase_triangles",
    "q201_kmeans_fixed_point",
    "q204_bfs_reach",
    "q205_audio_energy_neardup",
    # round-6 batch 3: grid-density clustering — the cell-table design
    # should keep the post-scan stages flat as the corpus grows (denser
    # cells, not more of them, on a replicated distribution)
    "q209_grid_density_clusters",
    # round-6 batches 5-6: the triplet miner rides q41's LSH engine
    # (ratio should track q41's), and item-item CF rides the q199
    # capped basket explode (ratio should track q199's)
    "q214_triplet_mining",
    "q216_item_item_cf",
    # round-6 batch 7: iterative Bradley-Terry MM (per-round cost must
    # track the pair table, not rounds x corpus), the 12-round k-core
    # peel (shrinking edge table), the 10-round greedy set-cover (each
    # round an anti-join + argmax over the shingle table), and the
    # k-mins sketch (map-side MINs; shuffle must stay |sources| x 64)
    "q221_bradley_terry",
    "q222_kcore_decomposition",
    "q225_greedy_set_cover",
    "q226_kmin_distinct_sketch",
    # round-8 additions (VERDICT r7 ask #4): the r7 graph/eval
    # newcomers — edge churn (per-window edge builds), common-neighbor
    # link prediction (chunked per-center neighbor lists, NOT q199's
    # wedge orientation), local clustering (per-node triangle/degree),
    # CF holdout eval (the checkpointed year-tagged pair build is the
    # cost center), the 4-config LSH band sweep (one signature pass),
    # and the incremental IVF delta refresh (one assignment pass +
    # mergeable integer partials)
    "q250_edge_churn",
    "q260_common_neighbor_links",
    "q261_local_clustering",
    "q267_cf_holdout_eval",
    "q276_lsh_band_sweep",
    "q282_ivf_delta_refresh",
    # r8: the two-scan log-bin collected percentile route (q186 is
    # the distributed_percentiles primitive under q154/q141/q202 too)
    "q186_distributed_exact_percentile",
    # r8: the incremental text-index refresh (chunk-lossless buckets)
    "q284_lsh_delta_refresh",
    # r9 (VERDICT r8 ask #5): the r8 newcomers without a row — the
    # TPC-H Q9 star (10x facts + 10x parts, same suppliers), the q69
    # composition (inherits its cap counters), and the cohort triangle
    "q283_product_profit",
    "q285_cluster_representatives",
    "q286_cohort_retention",
    # r9: the q154 sketch+audit pair now shares frames with
    # distributed_percentiles — its audit route is the scale story
    "q154_quantile_sketch",
    # r9 newcomers: BM25 (tf/df aggregates + broadcast query terms),
    # winnowing (posting-list blocking — the chunk counters must
    # absorb the 10x), duplicate runs (capped posting fan-out + the
    # per-pair-diagonal island window), epoch shuffle (map-only grid)
    "q287_bm25_topk",
    "q288_epoch_shuffle_balance",
    "q289_winnowing_fingerprints",
    "q290_duplicate_run_lengths",
    # r9 batch 2: the lexical-stats IVM (term-keyed partial merges)
    # and HITS (collected solve under the gate at both scales)
    "q293_bm25_stats_delta_refresh",
    "q294_hits_hubs_authorities",
    # r10 (VERDICT r9 ask #5): the two r9 newcomers without a row —
    # both map-only (q292 is 0-shuffle in PLANS.md), so these rows are
    # the cheap completeness of the book, not a risk retirement
    "q291_tokenizer_fertility",
    "q292_code_switch_mixture",
    # r10: the hybrid lexical+dense fusion (BM25 more-like-this posting
    # fan-out + the q46/q47 legs + RRF)
    "q295_hybrid_retrieval",
    # r11 (VERDICT r10 ask #5): rows for the r10 newcomers — the q296
    # audit composite (exact baseline + both dense legs + fusion; the
    # previous audits-measure-their-components exclusion is overridden
    # by the explicit ask), the cross-modal consistency audit (its x10
    # run IS the all-DISAGREE adversarial regime: scale-harness
    # embeddings are independent of the text, see the q297 section),
    # and the deletion manifest — plus the r11 deletion-lifecycle
    # queries (manifest apply, and the three DELETE-delta IVMs whose
    # retraction legs are filtered re-aggregations of the same
    # persisted frames their insert twins already stress)
    "q296_hybrid_retrieval_audit",
    "q297_crossmodal_dup_consistency",
    "q298_dedup_deletion_manifest",
    "q299_deletion_manifest_apply",
    "q300_ivf_delete_refresh",
    "q301_lsh_delete_refresh",
    "q302_bm25_stats_delete_refresh",
    # r11: the benchmark decon screen — map-only broadcast pass, the
    # cheapest shape in the corpus; its row is completeness, not risk
    "q303_semantic_decontamination",
    # r12 (VERDICT r11 ask #2): the PQ code-table IVM family — one
    # persisted map-only encode pass feeding filtered re-aggregations
    # (q304 insert merge, q305 delete retraction) and the per-subspace
    # distortion pass behind the q306 staleness trigger; all three
    # should track the q75 encode's scan cost
    "q304_pq_codes_delta_refresh",
    "q305_pq_codes_delete_refresh",
    "q306_pq_codebook_staleness",
    # r12: the q112-composition refresh (two broadcast passes + bounded
    # (cell, m, cid) merges; registered default = numpy encode backend)
    "q307_ivfpq_codes_refresh",
    # r12 (second batch): boilerplate strip (segment explode + re-stitch
    # — the word-count shape), the token-budget curriculum (per-source
    # window + <=21-row bucket waterline), and the fused contamination
    # verdict (composes q109's LSH screen + q303's map-only screen;
    # q109 measured standalone to attribute the composition's cost)
    "q109_lsh_decontamination",
    "q308_boilerplate_strip",
    "q309_token_budget_curriculum",
    "q310_contamination_fusion",
    # the end-to-end funnel chains the dedup digest agg, q308's strip,
    # the map-only floor and q309's take through persisted frames —
    # each stage's scale story is its component's
    "q311_curation_token_waterfall",
    # eval-gram coverage of the budget take vs the full pool: two
    # distinct-hash builds + two hash-keyed semi probes
    "q312_take_coverage_audit",
    # keeper succession: q69's CC rounds + two struct-max keeper picks
    # over the same joined frame
    "q313_keeper_succession",
    # PQ m-sweep: three map-only encode passes + fixed-query ADC joins
    # + one exact-truth pass (the q45 discipline)
    "q314_pq_subspace_sweep",
    # BM25 (k1,b) sweep: ONE persisted tf/df build + three bounded
    # re-scorings of the tf x query-term join
    "q315_bm25_param_sweep",
    # greedy acquisition ordering: one (source, tok) distinct build +
    # |catalog| rounds of anti-join + bounded agg (q225's loop)
    "q316_source_acquisition_order",
    # r12 (fourth batch): KN continuation scoring — bigram-type hash
    # aggs + the doc-keyed scoring join (should track q121's cost)
    "q317_kneser_ney_score",
    # r12 (fourth batch): margin bitext mining — the q44 label-blocked
    # pair join + two partitioned window top-k aggs over the SAME
    # persisted pair frame; block sizes govern, corpus never cross-joins
    "q318_bitext_margin_mining",
    # r12 (fourth batch): padding-waste audit — two per-source windows
    # over the 3-integer length collapse, two bounded hash aggs
    "q319_padding_waste_audit",
    # r12 (fourth batch): k-center coreset — KCENTER_K rounds of one
    # map-side 1-row center attach + TakeOrdered(1); rounds are
    # constant, so the ratio should read the linear scan term
    "q320_kcenter_coreset",
    # r12 (fourth batch): logistic IRLS — IRLS_STEPS constant map-side
    # 9-term aggs; the ratio should read the feature-scan term
    "q321_logistic_irls",
    # r12 (fourth batch): weighted Jaccard — q69's anchor blocking +
    # (doc, token)-keyed count joins on the bounded candidate table
    "q322_weighted_jaccard",
    # r12 (fourth batch): the disparity audit — q321's constant-pass
    # fit + one |sources|-bounded agg + TakeOrdered(1)
    "q323_model_disparity_audit",
    # r12 (fourth batch): held-out perplexity screen — train-split
    # count aggs + (a,b)-keyed eval scoring joins (the q121 shape)
    "q324_perplexity_contamination",
    # r12 (fourth batch): PPR seed expansion — q69's capped anchor
    # blocking + the q183 collect-and-solve iteration lever
    "q325_ppr_seed_expansion",
    # r12 (fourth batch): group influence — q321's fit + one Hessian
    # agg + one |sources|-bounded gradient agg (no refits)
    "q326_group_influence",
)

# Per-(target, scale) keyword overrides: the SemDeDup contract is that
# the quantizer grows WITH the corpus so cluster size stays constant —
# the x10 runs get 10x centroids (the paper's regime).  That keeps the
# PAIR stage linear; the plain q96 row runs the REGISTERED DEFAULT,
# which auto-selects two-level routing + the BLAS pair backend as soon
# as k crosses SEMDEDUP_TWO_LEVEL_AUTO_K — so its x10 ratio is the
# scale story of the query a user actually calls.  The _flat_jvm row
# pins both knobs to the oracle-parity configuration and measures the
# O(n*k) blowup the auto-default exists to avoid.
SCALE_KWARGS: dict[tuple[str, str], dict] = {
    ("q112_ann_ivfpq_jvm", "x1"): {"encode_backend": "jvm"},
    ("q112_ann_ivfpq_jvm", "x10"): {"encode_backend": "jvm"},
    ("q96_semantic_dedup", "x1"): {"n_centroids": llm_ops.N_CENTROIDS},
    ("q96_semantic_dedup", "x10"): {"n_centroids": llm_ops.N_CENTROIDS * 10},
    ("q96_semantic_dedup_flat_jvm", "x1"): {
        "n_centroids": llm_ops.N_CENTROIDS,
        "two_level": False,
        "pair_backend": "jvm",
    },
    ("q96_semantic_dedup_flat_jvm", "x10"): {
        "n_centroids": llm_ops.N_CENTROIDS * 10,
        "two_level": False,
        "pair_backend": "jvm",
    },
    # q318's contract (the q96 regime): blocking granularity grows with
    # the corpus so block size stays constant — the x10 fixture keeps
    # the x1 label count, so the knob sub-partitions each label 10x
    ("q318_bitext_margin_mining", "x1"): {"block_splits": 1},
    ("q318_bitext_margin_mining", "x10"): {"block_splits": 10},
}

# Harness-only labels resolve to a registered query + fixed kwargs.
TARGET_FN = {
    "q112_ann_ivfpq_jvm": "q112_ann_ivfpq",
    "q96_semantic_dedup_flat_jvm": "q96_semantic_dedup",
}


def build_fixtures() -> dict[str, str]:
    os.makedirs(WORK, exist_ok=True)
    dirs = {"x1": f"{WORK}/x1", "x10": f"{WORK}/x10"}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    con = duckdb.connect()
    for scale, n_reps in (("x1", 1), ("x10", 10)):
        con.execute(
            f"""
            COPY (
              SELECT doc_id + rep * 1000000 AS doc_id,
                     CASE WHEN rep = 0 THEN text
                          ELSE array_to_string(list_transform(
                                 string_split(text, ' '),
                                 w -> w || '_r' || rep), ' ')
                     END AS text,
                     lang, source, n_chars
              FROM read_parquet('{BASE}/documents.parquet'),
                   (SELECT unnest(generate_series(0, {n_reps - 1})) AS rep)
            ) TO '{dirs[scale]}/documents.parquet' (FORMAT PARQUET)
            """
        )
        con.execute(
            f"""
            COPY (
              SELECT vec_id + rep * 10000000 AS vec_id, embedding, label
              FROM read_parquet('{BASE}/embeddings.parquet'),
                   (SELECT unnest(generate_series(0, {n_reps - 1})) AS rep)
            ) TO '{dirs[scale]}/embeddings.parquet' (FORMAT PARQUET)
            """
        )
        # lineitem for the graph/basket targets: orderkey AND partkey
        # offset per replica -> 10 disjoint copies of the co-order
        # graph (linear regime, no artificial cross-replica edges)
        con.execute(
            f"""
            COPY (
              SELECT * REPLACE (
                l_orderkey + rep * 100000000 AS l_orderkey,
                l_partkey + rep * 100000000 AS l_partkey)
              FROM read_parquet('{BASE}/lineitem.parquet'),
                   (SELECT unnest(generate_series(0, {n_reps - 1})) AS rep)
            ) TO '{dirs[scale]}/lineitem.parquet' (FORMAT PARQUET)
            """
        )
        # orders for the duel/calendar targets: orderkey offset matches
        # lineitem's; suppliers are NOT offset, so 10x data = 10x duels
        # among the SAME players (the natural BT densification regime)
        con.execute(
            f"""
            COPY (
              SELECT * REPLACE (o_orderkey + rep * 100000000 AS o_orderkey)
              FROM read_parquet('{BASE}/orders.parquet'),
                   (SELECT unnest(generate_series(0, {n_reps - 1})) AS rep)
            ) TO '{dirs[scale]}/orders.parquet' (FORMAT PARQUET)
            """
        )
        # part replicated with partkeys matching lineitem's offset (the
        # part dim grows with the fact table in TPC-H); supplier/nation
        # copy verbatim — the same-players regime the duel targets use
        con.execute(
            f"""
            COPY (
              SELECT * REPLACE (p_partkey + rep * 100000000 AS p_partkey)
              FROM read_parquet('{BASE}/part.parquet'),
                   (SELECT unnest(generate_series(0, {n_reps - 1})) AS rep)
            ) TO '{dirs[scale]}/part.parquet' (FORMAT PARQUET)
            """
        )
        for dim in ("supplier", "nation", "region", "customer"):
            con.execute(
                f"""
                COPY (SELECT * FROM read_parquet('{BASE}/{dim}.parquet'))
                TO '{dirs[scale]}/{dim}.parquet' (FORMAT PARQUET)
                """
            )
    con.close()
    return dirs


def build_chained_fixture(spokes_per_group: int) -> str:
    """Hub-and-spoke 'boilerplate hub' corpus: one hub doc whose 4
    anchor shingles each appear verbatim in ``spokes_per_group`` spoke
    docs — connected components merges everything into ONE cluster
    (diameter 2) whose members from different groups share no shingle
    at all: the maximally chained cluster q173 exists to detect."""
    d = f"{WORK}/chained_{spokes_per_group}"
    os.makedirs(d, exist_ok=True)
    import pandas as pd

    hub_words = [f"g{i}" for i in range(8)]
    hub_shingles = [hub_words[i : i + 5] for i in range(4)]
    rows = [(0, " ".join(hub_words), "en", "hub")]
    did = 1
    for j in range(4):
        for _ in range(spokes_per_group):
            text = " ".join(
                [f"u{did}a", f"u{did}b", f"u{did}c"] + hub_shingles[j]
            )
            rows.append((did, text, "en", "spoke"))
            did += 1
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(f"{d}/documents.parquet", index=False)
    return d


def chained_cluster_rows(spark) -> list[str]:
    """q173 wall-clock on synthetic chained clusters of growing size:
    the member cap keeps audited pairs constant while the would-be
    uncapped pair count grows quadratically."""
    out = []
    for spokes in (250, 999):  # cluster sizes 1001 and 3997
        d = build_chained_fixture(spokes)
        n = 1 + 4 * spokes
        runs = []
        for _ in range(REPS):
            t0 = time.time()
            rows = QUERIES["q173_cluster_cohesion"](spark, d).collect()
            runs.append(time.time() - t0)
            spark.catalog.clearCache()
        obs = dict(llm_ops.BUCKET_OBSERVATIONS["q173_cluster_cohesion"].get)
        r = rows[0]
        out.append(
            f"| {n} | {n * (n - 1) // 2} | {r['n_pairs']} | "
            f"{r['n_members_audited']} | {str(r['chained']).lower()} | "
            f"{obs['capped_buckets']} | {round(statistics.median(runs), 2)} |"
        )
    return out


# Dense text (36+ shingles) -> identical NON-blank frames: the hot
# informative bucket the chunking must distribute.  The sparse text
# renders all-zero frames -> the zero-dHash class skip_zero_hash
# excludes from candidate generation entirely.
CF_DENSE = " ".join(f"w{i}" for i in range(48))
CF_BLANK = "the same boilerplate frame content repeated verbatim everywhere"


def build_constant_frame_fixture(n_docs: int, text: str, tag: str) -> str:
    """All-identical documents -> all-identical rendered videos ->
    every sampled frame shares ONE dHash: the black/constant-frame
    regime that used to put the whole corpus in one (f, band, key)
    bucket of the q174 candidate join."""
    d = f"{WORK}/constframe_{tag}_{n_docs}"
    os.makedirs(d, exist_ok=True)
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": range(1, n_docs + 1),
            "text": [text] * n_docs,
            "lang": ["en"] * n_docs,
            "source": ["syn"] * n_docs,
        }
    )
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(f"{d}/documents.parquet", index=False)
    return d


def constant_frame_rows(spark) -> list[str]:
    """q174 on all-identical-video corpora.  Dense rows: every pair is
    a genuine near-dup (inherently quadratic output), chunked buckets
    spread pair generation across ≤ BUCKET_CAP² tasks — wall-clock
    tracks the EMITTED pair count, no single task holds the corpus.
    Blank row: all-zero frames are excluded from candidate generation
    by skip_zero_hash, so the would-be quadratic class emits nothing
    (its Observation node is optimized away with the empty plan —
    counters report —)."""
    out = []
    for tag, text, n in (
        ("dense", CF_DENSE, 1200),
        ("dense", CF_DENSE, 2400),
        ("blank", CF_BLANK, 2400),
    ):
        d = build_constant_frame_fixture(n, text, tag)
        runs = []
        for _ in range(REPS):
            t0 = time.time()
            n_pairs = QUERIES["q174_video_dhash_neardup"](spark, d).count()
            runs.append(time.time() - t0)
            spark.catalog.clearCache()
        try:
            obs = dict(
                llm_ops.BUCKET_OBSERVATIONS["q174_video_dhash_neardup"].get
            )
            capped, mx = obs["capped_buckets"], obs["max_bucket_size"]
        except Exception:
            capped, mx = "—", "—"
        out.append(
            f"| {tag} | {n} | {n * (n - 1) // 2} | {n_pairs} | "
            f"{capped} | {mx} | {round(statistics.median(runs), 2)} |"
        )
    return out


def build_boilerplate_fixture(n_docs: int) -> str:
    """Every doc opens with the same boilerplate sentence (its shingles'
    posting lists hold the WHOLE corpus — the crawl-data hot-shingle
    regime) and closes with a distinct tail (so pairs fail the Jaccard
    threshold and the cost is pure candidate generation)."""
    d = f"{WORK}/boiler_{n_docs}"
    os.makedirs(d, exist_ok=True)
    import pandas as pd

    boiler = "terms of service apply to all content on this site"
    pdf = pd.DataFrame(
        {
            "doc_id": range(1, n_docs + 1),
            "text": [
                f"{boiler} document {i} body tail t{i}a t{i}b t{i}c t{i}d"
                for i in range(1, n_docs + 1)
            ],
            "lang": ["en"] * n_docs,
            "source": ["syn"] * n_docs,
        }
    )
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(f"{d}/documents.parquet", index=False)
    return d


def boilerplate_posting_rows(spark) -> list[str]:
    """q43 on boilerplate-heavy corpora: the hottest posting list holds
    the whole corpus, chunk_buckets spreads its pair generation across
    <= BUCKET_CAP^2 tasks, counters record the fan-out, and doubling
    the corpus must not square the wall-clock of a single task."""
    out = []
    for n in (2000, 4000):
        d = build_boilerplate_fixture(n)
        runs = []
        for _ in range(REPS):
            t0 = time.time()
            QUERIES["q43_ngram_jaccard"](spark, d).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.time() - t0)
            spark.catalog.clearCache()
        obs = dict(llm_ops.BUCKET_OBSERVATIONS["q43_ngram_jaccard"].get)
        out.append(
            f"| {n} | {n * (n - 1) // 2} | {obs['capped_buckets']} | "
            f"{obs['max_bucket_size']} | {round(statistics.median(runs), 2)} |"
        )
    return out


def winnow_boilerplate_rows(spark) -> list[str]:
    """q289 on boilerplate-heavy corpora: the shared template's
    winnowed fingerprints appear in EVERY document, so the hottest
    fingerprint posting holds the whole corpus and the true pair
    output is C(n, 2) — the regime chunk_buckets must spread across
    bounded tasks (q43's contract on the winnowing operator)."""
    out = []
    for n in (1000, 2000):
        d = build_boilerplate_fixture(n)
        runs = []
        for _ in range(REPS):
            t0 = time.time()
            QUERIES["q289_winnowing_fingerprints"](spark, d).write.format(
                "noop"
            ).mode("overwrite").save()
            runs.append(time.time() - t0)
            spark.catalog.clearCache()
        obs = dict(
            llm_ops.BUCKET_OBSERVATIONS["q289_winnowing_fingerprints"].get
        )
        out.append(
            f"| {n} | {n * (n - 1) // 2} | {obs['capped_buckets']} | "
            f"{obs['max_bucket_size']} | {round(statistics.median(runs), 2)} |"
        )
    return out


def dup_run_boilerplate_rows(spark) -> list[str]:
    """q290 on boilerplate-heavy corpora: every shared 10-gram occurs
    n_docs >> RUN_POSTING_CAP times, so the occurrence cap EXCLUDES
    the template grams in both engines — the would-be C(n, 2)
    pair-position explosion never materializes and wall-clock tracks
    the k-gram scan, not the square of the corpus."""
    out = []
    for n in (1000, 2000):
        d = build_boilerplate_fixture(n)
        runs = []
        n_pairs = 0
        for _ in range(REPS):
            t0 = time.time()
            df = QUERIES["q290_duplicate_run_lengths"](spark, d)
            n_pairs = df.count()
            runs.append(time.time() - t0)
            spark.catalog.clearCache()
        out.append(
            f"| {n} | {n * (n - 1) // 2} | {n_pairs} | "
            f"{round(statistics.median(runs), 2)} |"
        )
    return out


def strip_boilerplate_rows(spark) -> list[str]:
    """q308 on boilerplate-heavy corpora — its adversarial regime: the
    shared template segment is flagged for EVERY document (the hottest
    (source, seg) join key holds the whole corpus), every doc is
    touched, and the re-stitch runs corpus-wide.  The hot key joins a
    corpus-size stream side against ONE build row (hash join, linear)
    and the per-doc collect_list stays bounded by the doc's OWN segment
    count, so 2x docs must cost ~2x — never the square of the hot
    bucket.  The conservation audit must hold at full-touch volume."""
    out = []
    for n in (10000, 20000):
        d = build_boilerplate_fixture(n)
        runs = []
        touched = dropped = audit = 0
        for _ in range(REPS):
            t0 = time.time()
            rows = QUERIES["q308_boilerplate_strip"](spark, d).collect()
            runs.append(time.time() - t0)
            touched = sum(r["docs_touched"] for r in rows)
            dropped = sum(r["words_dropped"] for r in rows)
            audit = min(r["audit_ok"] for r in rows)
            spark.catalog.clearCache()
        out.append(
            f"| {n} | {touched} | {dropped} | {audit} | "
            f"{round(statistics.median(runs), 2)} |"
        )
    return out


def bm25_boilerplate_rows(spark) -> list[str]:
    """q287 on boilerplate-heavy corpora: the top-DF query terms are
    the template words, whose df = n_docs by construction — the
    broadcast query-term join fans out to BM25_QT rows PER DOCUMENT,
    the worst case the per-doc hash aggregate must absorb.  The join
    output is bounded by Σ df(query terms) <= corpus token count (a
    term matches a (doc, term) tf row at most once), so wall-clock
    must track the corpus linearly, never the df of a hot term times
    anything super-linear."""
    out = []
    for n in (2000, 4000):
        d = build_boilerplate_fixture(n)
        runs = []
        for _ in range(REPS):
            t0 = time.time()
            QUERIES["q287_bm25_topk"](spark, d).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.time() - t0)
            spark.catalog.clearCache()
        out.append(
            f"| {n} | {llm_ops.BM25_QT} | {n * llm_ops.BM25_QT} | "
            f"{round(statistics.median(runs), 2)} |"
        )
    return out


def build_giant_basket_fixture(basket: int, n_orders: int = 200) -> str:
    """Every order holds the same ``basket``-part set: C(basket, 3)
    triples per order uncapped — the cubic blowup q179's 50-part
    basket cap exists to bound."""
    d = f"{WORK}/basket_{basket}"
    os.makedirs(d, exist_ok=True)
    import pandas as pd

    rows = [
        (o, p, 1, 1.0, 100.0, 0.0)
        for o in range(1, n_orders + 1)
        for p in range(1, basket + 1)
    ]
    pdf = pd.DataFrame(
        rows,
        columns=[
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )
    pdf.to_parquet(f"{d}/lineitem.parquet", index=False)
    return d


def giant_basket_rows(spark) -> list[str]:
    from datapipeline_dags_spark.plans import relational

    out = []
    for basket in (100, 400):
        d = build_giant_basket_fixture(basket)
        runs = []
        for _ in range(REPS):
            t0 = time.time()
            QUERIES["q179_itemset_triples"](spark, d).write.format(
                "noop"
            ).mode("overwrite").save()
            runs.append(time.time() - t0)
            spark.catalog.clearCache()
        obs = dict(
            relational.BASKET_OBSERVATIONS["q179_itemset_triples"].get
        )
        c3 = basket * (basket - 1) * (basket - 2) // 6
        out.append(
            f"| {basket} | {c3} | {obs['capped_buckets']} | "
            f"{obs['max_bucket_size']} | {round(statistics.median(runs), 2)} |"
        )
    return out


def measure(spark, dirs: dict[str, str], targets) -> dict[str, dict[str, dict]]:
    results: dict[str, dict[str, dict]] = {q: {} for q in targets}
    for scale, sf_dir in dirs.items():
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        for qname in targets:
            runs = []
            info: dict = {}
            kwargs = SCALE_KWARGS.get((qname, scale), {})
            fn = QUERIES[TARGET_FN.get(qname, qname)]
            for _ in range(REPS):
                t0 = time.time()
                fn(spark, sf_dir, **kwargs).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.time() - t0)
                if qname in llm_ops.BUCKET_OBSERVATIONS:
                    info["buckets"] = dict(llm_ops.BUCKET_OBSERVATIONS[qname].get)
                if qname in mining.MINING_OBSERVATIONS:
                    info["baskets"] = dict(mining.MINING_OBSERVATIONS[qname].get)
                if qname == "q69_dedup_clusters":
                    info["cc_rounds"] = graph.LAST_ROUNDS
                spark.catalog.clearCache()
            info["sec"] = round(statistics.median(runs), 2)
            info["n_docs"] = n_docs
            results[qname][scale] = info
    return results


def format_row(qname: str, results: dict[str, dict[str, dict]]) -> str:
    r1, r10 = results[qname]["x1"], results[qname]["x10"]
    ratio = round(r10["sec"] / r1["sec"], 1) if r1["sec"] else float("nan")
    signals = []
    if "cc_rounds" in r10:
        signals.append(
            f"CC rounds {r1['cc_rounds']} -> {r10['cc_rounds']} (flat = "
            "diameter, not corpus size)"
        )
    if "buckets" in r10:
        b1, b10 = r1["buckets"], r10["buckets"]
        signals.append(
            f"buckets {b1['buckets']} -> {b10['buckets']}, capped "
            f"{b1['capped_buckets']} -> {b10['capped_buckets']}, max "
            f"{b1['max_bucket_size']} -> {b10['max_bucket_size']}"
        )
    if "baskets" in r10:
        m1, m10 = r1["baskets"], r10["baskets"]
        signals.append(
            f"baskets {m1['baskets']} -> {m10['baskets']}, capped "
            f"{m1['capped_baskets']} -> {m10['capped_baskets']}, max "
            f"{m1['max_basket_size']} -> {m10['max_basket_size']}"
        )
    kw1 = SCALE_KWARGS.get((qname, "x1"))
    kw10 = SCALE_KWARGS.get((qname, "x10"))
    if kw1 or kw10:
        signals.append(f"knobs {kw1 or {}} -> {kw10 or {}} (scaled with corpus)")
    return (
        f"| {qname} | {r1['sec']} | {r10['sec']} | {ratio}x | "
        f"{'; '.join(signals) or '—'} |"
    )


def update_rows(targets: list[str]) -> None:
    """Re-measure only *targets* and patch their rows in SCALING.md in
    place — for refreshing a query whose plan changed without paying the
    full ~45-min regeneration (the x1/x10 fixtures are rebuilt, so the
    measurement regime is identical to a full run)."""
    unknown = [t for t in targets if t not in TARGETS]
    if unknown:
        raise SystemExit(f"not in TARGETS: {unknown}")
    dirs = build_fixtures()
    spark = get_session("scaling")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    results = measure(spark, dirs, targets)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    with open(out) as f:
        lines = f.read().splitlines()
    for qname in targets:
        row = format_row(qname, results)
        hits = [i for i, ln in enumerate(lines) if ln.startswith(f"| {qname} |")]
        if len(hits) > 1:
            raise SystemExit(f"expected at most one row for {qname}, found {len(hits)}")
        if hits:
            lines[hits[0]] = row
        else:
            # new target: append to the main table (after its last row;
            # the slice bounds the search to the main table, which ends
            # well before line 120 — the first section header is later)
            last = max(
                i for i, ln in enumerate(lines[:120]) if ln.startswith("| q")
            )
            lines.insert(last + 1, row)
        print(row)
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> None:
    dirs = build_fixtures()
    spark = get_session("scaling")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()  # warm up

    results = measure(spark, dirs, TARGETS)

    # BPE trainer: per-round cost must stay FLAT as the merge count
    # grows 10x (localCheckpoint stops lineage growth), and batching
    # divides the round count — the production path to a 50k vocab.
    bpe_rows = []
    for n_merges, batch in ((llm_ops.BPE_ROUNDS, 1), (llm_ops.BPE_ROUNDS * 10, 1),
                            (llm_ops.BPE_ROUNDS * 10, 10)):
        t0 = time.time()
        n_out = llm_ops.bpe_train(spark, dirs["x1"], n_merges, batch_size=batch).count()
        sec = time.time() - t0
        bpe_rows.append(
            f"| bpe_train n={n_merges} batch={batch} | {n_out} | {round(sec, 2)} | "
            f"{round(sec / n_merges, 3)} |"
        )

    chained_rows = chained_cluster_rows(spark)
    constframe_rows = constant_frame_rows(spark)
    basket_rows = giant_basket_rows(spark)
    boiler_rows = boilerplate_posting_rows(spark)
    winnow_rows = winnow_boilerplate_rows(spark)
    duprun_rows = dup_run_boilerplate_rows(spark)
    bm25_rows = bm25_boilerplate_rows(spark)
    strip_rows = strip_boilerplate_rows(spark)

    lines = [
        "# SCALING — 10x stress evidence (generated by tools/scaling.py)",
        "",
        f"Base corpus: `{BASE}` (5 000 docs / 2 000 vectors); 10x derivative",
        "built per the harness docstring (distinct shingle space per replica",
        "-> 10 independent copies of the near-dup structure).  local[32],",
        f"median of {REPS} reps, full noop-write materialization.",
        "",
        "| query | x1 sec | x10 sec | ratio | scale signals |",
        "|---|---|---|---|---|",
    ]
    for qname in TARGETS:
        lines.append(format_row(qname, results))
    lines += [
        "",
        "Reading: a blocking-based operator scales in the number of",
        "(bucket, member) pairs, so a 10x corpus with 10x buckets should",
        "cost ~10x plus fixed overhead — wall-clock ratios well under 10x",
        "on local[32] mean per-run overhead (JVM, planning, small-stage",
        "scheduling) still dominates at this size, and nothing is",
        "super-linear.  The q69 round count staying flat and the q41/q69",
        "cap counters staying at zero are the structural signals that the",
        "same plans survive further scale-up.  q42 runs the 64-bit",
        "simhash with 16-bit band keys (65 536 buckets per band, vs the",
        "former 8-bit keyspace whose EVERY bucket held n/256 docs) and",
        "distributes any oversized bucket across chunk-pair tasks",
        "instead of truncating it — its capped counter now records chunk",
        "fan-out (bounded per-task memory), not recall loss, and the",
        "oracle checks the UNCAPPED exact pair set.  q91/q174 route",
        "their dHash (band, key) buckets through the same chunk-pair",
        "machinery (operators/blocking.py) since r6 — constant-color",
        "images and black frames share one hash, so their hot buckets",
        "are the image/video twin of q42's regime (see the",
        "constant-frame section below).  The all-zero dHash class",
        "(blank images / black frames) is excluded from candidate",
        "generation by default since r6 (skip_zero_hash, mirrored in",
        "the oracles: a match on no gradient information is dedup",
        "noise) — the blank-corpus row below emits ZERO pairs, and the",
        "x1 max buckets dropped (q174 745 -> 629).  Since r7 the",
        "REGISTERED DEFAULT also carries the min_hash_bits='auto'",
        "density floor (operators/multimodal.py): OFF at or below",
        "20k corpus rows (the oracle-parity regime — every x1 row and",
        "the driver gate), >= 4 set bits past it — so the x10 rows run",
        "with the floor ON and the <= 72 near-empty single-lit-cell",
        "dHash classes (whose genuine pair count grew ~100x when the",
        "class grew 10x, the r6 output-quadratic rows) are excluded",
        "from candidate generation entirely; what remains is the",
        "informative-content near-dup structure, linear in replicas.",
        "The floor is a documented recall trade on sparse-but-real",
        "media; callers pin min_hash_bits=None for the exhaustive",
        "contract or use the cluster-level q69 instead of pair lists.",
        "The q96",
        "pair runs the SemDeDup regime (quantizer scales with the corpus,",
        "so per-cell pair work stays constant).  The plain row is the",
        "REGISTERED DEFAULT: at x10 the scaled quantizer (k=160) crosses",
        "SEMDEDUP_TWO_LEVEL_AUTO_K, so the query auto-selects the",
        "hierarchical O(n*sqrt(k)) two-level assignment and the BLAS",
        "pair backend (one E @ E.T matmul per Arrow-batched cell) — the",
        "scale-safe path a caller gets without touching any knob.  The",
        "_flat_jvm row pins two_level=False, pair_backend='jvm' (the",
        "oracle-parity configuration, still the default below the auto",
        "threshold) and measures the O(n*k) = 100x-compute-at-10x",
        "blowup the auto-default avoids.  The numpy pair backend",
        "produces the identical pruned set / anchors / 6-dp cosines on",
        "the fixture (test_data_selection) and is hash-green against",
        "the DuckDB oracle at sf0.01.",
        "The ANN rows intentionally do MORE work at x10 than a fixed",
        "configuration would: ann_params scales centroids/nprobe/refine",
        "with corpus size so recall holds (BENCH ann_recall ivfpq@10",
        "0.96 at sf0.1 vs 0.84 under fixed params).  The plain q112 row",
        "is the REGISTERED DEFAULT, which since r5 auto-selects the",
        "numpy (BLAS mapInPandas) encode backend — near-flat at the same",
        "recall and identical codes; the _jvm row pins the pure-SQL",
        "fallback/oracle-parity backend, which carries the extra recall",
        "work through a per-row HOF argmin (the explicitly-avoided case,",
        "cf. q96_flat_jvm).",
        "q43 vs q144 measure the same exact-Jaccard contract with two",
        "candidate generators (any-shared-shingle vs df-ascending",
        "prefix).  On THIS fixture nearly every shingle is df=1, so the",
        "prefix prunes little and the pair track at the same ratio —",
        "the prefix filter's payoff is hot-shingle corpora (boilerplate,",
        "templates).  Since r7 q43's postings self-join is gone: posting",
        "lists route through blocking.chunk_buckets, so ONE hot shingle",
        "spreads its pair generation across <= cap^2 tasks with zero",
        "recall loss and observable fan-out counters (the boilerplate",
        "section below measures exactly that regime); q144 additionally",
        "excludes non-prefix shingles from candidate generation",
        "(tests/test_prefix_filter.py pins the candidate-count order",
        "and q43's chunking losslessness).",
        "The r6 graph/ML rows: q199's lineitem replicas offset both",
        "orderkey AND partkey, so x10 is 10 disjoint co-purchase",
        "graphs — edges/wedges/triangles each grow 10x while the",
        "degree-oriented wedge join's per-node fan-out is unchanged",
        "(basket caps flat at 0); q204 runs the same edge build plus",
        "6 frontier rounds whose joins are bounded by the edge table;",
        "q201's assignment is map-only against a k x dim literal and",
        "its update shuffle is <= k*dim cells per partition regardless",
        "of corpus size, so the 10x ratio is dominated by the scan;",
        "q205 is q91's banded-blocking regime on audio energy",
        "fingerprints — replicas suffix every word, so fingerprints",
        "differ across replicas and buckets grow linearly, with the",
        "same chunk-cap machinery bounding any hot (band, key) class.",
        "Its render CYCLES short documents to fill the sample window",
        "instead of zero-padding: a constant pad made every short",
        "doc's trailing band all-zero — one (band, key) bucket held",
        "44% of the corpus and the first x10 run went 33x — whereas",
        "cycling keeps all 64 fingerprint bits informative (max",
        "bucket 42 at x10, caps never fire).  Padding with a",
        "constant before fingerprinting is the blocking-key",
        "anti-pattern; wrap the input instead.",
        "q209's grid-density clustering is flat at 10x by design:",
        "after the map-only projection + cell assignment, every later",
        "stage (density filter, neighbor join, component resolve) runs",
        "on the CELL table, whose size is set by the data's spread",
        "over the grid, not the corpus — replicas land in the same",
        "cells, so 10x data means denser cells, not more of them.",
        "Its cell adjacency graph is chain-like BY CONSTRUCTION (a",
        "dense blob's diameter ~ its width in cells): plain min-label",
        "CC blew the 20-round budget at sf0.1, and the auto",
        "cc_backend resolves components with a driver-side exact",
        "union-find while the cell count stays bounded (zero",
        "iterative jobs — these rows), switching to the distributed",
        "pointer-jumping CC (label-of-label hop, O(log diameter)",
        "rounds — 5 at both scales) past GRID_CC_DRIVER_MAX.",
        "q214 rides q41's shared LSH engine (same band buckets, its",
        "own cap counters — flat at 0, max bucket 4 at both scales)",
        "plus per-anchor top-1 windows and the broadcast pool pick;",
        "its ratio tracks q41's.  q216 rides the q199 capped basket",
        "explode (caps flat, max basket 17) with two hash aggregates",
        "and a per-part ranking window; its ratio tracks q199's.",
        "q221's 8 MM rounds each join the checkpointed supplier-pair",
        "table twice — wall-clock tracks the duel explode (linear in",
        "orders), never rounds x corpus.  q222's peel shrinks its own",
        "input; the first round dominates.  q225's 10 greedy rounds",
        "re-scan the checkpointed (doc, shingle) table with a growing",
        "anti-join whose right side is bounded by picks x max-doc-vocab.",
        "q226 is two aggs; the x10 ratio is the scan, the sketch",
        "shuffle stays |sources| x 64 cells at both scales.",
        "",
        "## BPE trainer: merge-count scaling (x1 corpus)",
        "",
        "| run | merges | sec | sec/merge |",
        "|---|---|---|---|",
        *bpe_rows,
        "",
        "Per-merge cost stays flat as the merge count grows 10x (the",
        "driver loop localCheckpoints the symbol table, so round r's plan",
        "never re-derives rounds 1..r-1), and batch=10 applies the top-10",
        "non-interacting pairs per rewrite pass — ~10x fewer rounds, the",
        "same merge set on this corpus (tests/test_bpe_batched.py), which",
        "is how a 50k-merge production vocabulary stays ~vocab/B rounds.",
        "",
        "## q173 cohesion audit on synthetic chained clusters",
        "",
        "Hub-and-spoke corpus (one hub doc, 4 anchor groups): connected",
        "components merges everything into ONE diameter-2 cluster whose",
        "cross-group members share zero shingles — the single-linkage",
        "chaining failure mode q173 detects, at sizes where an uncapped",
        "within-cluster pair join would be quadratic.",
        "",
        "| cluster size | uncapped pairs (C(n,2)) | audited pairs | "
        "members audited | chained | capped_buckets | sec |",
        "|---|---|---|---|---|---|---|",
        *chained_rows,
        "",
        "The md5-rank member cap (COHESION_MAX_MEMBERS=50) keeps the",
        "audited pair count constant at 1 225 while the would-be pair",
        "count grows ~16x between the two sizes; wall-clock tracks the",
        "q69 clustering of the corpus, not the square of the cluster",
        "size, the chained verdict still fires (any cross-group sampled",
        "pair has Jaccard 0), and the truncation is observable both per",
        "row (n_members_total vs n_members_audited) and in the",
        "bucket_cap_stats metrics sink.",
        "",
        "## q174 video near-dup on all-identical (constant-frame) corpora",
        "",
        "Every document renders to the same video, so every sampled",
        "frame shares ONE dHash — the black/constant-frame regime that",
        "is ubiquitous in real video corpora and used to concentrate the",
        "whole corpus into one (f, band, key) bucket of the candidate",
        "join.",
        "",
        "| corpus | identical docs | all pairs C(n,2) | emitted pairs | "
        "capped_buckets | max_bucket_size | sec |",
        "|---|---|---|---|---|---|---|",
        *constframe_rows,
        "",
        "Dense rows: chunked buckets (BUCKET_CAP=1000) distribute pair",
        "generation across <= cap^2-sized tasks with the fan-out",
        "observable in capped_buckets — per-task memory is bounded by",
        "the cap, never the corpus, and the inherently quadratic OUTPUT",
        "(every pair genuinely is a near-dup) tracks wall-clock at 4x",
        "pairs ~ 2x time, not a single hot task.  Blank row: all-zero",
        "frames (the dedup-noise class) are excluded from candidate",
        "generation by skip_zero_hash, so the identical-blank corpus",
        "emits ZERO pairs in near-constant time — collapse byte-identical",
        "media with exact dedup (q40) when blank-blank grouping is",
        "actually wanted.",
        "",
        "## q179 itemset triples on giant-basket corpora",
        "",
        "200 orders, every basket the same N parts: C(N,3) triples per",
        "order uncapped — cubic in basket size.",
        "",
        "| basket size | uncapped triples/order C(N,3) | capped_buckets "
        "| max_bucket_size | sec |",
        "|---|---|---|---|---|",
        *basket_rows,
        "",
        "The 50-part basket cap (TRIPLE_MAX_BASKET, mirrored in the",
        "oracle) keeps triples/order constant at C(50,3) = 19 600, so",
        "wall-clock stays flat while the would-be uncapped work grows",
        "66x between basket sizes 100 and 400 — the cap firing is",
        "observable per run and persisted via bucket_cap_stats.",
        "",
        "## q43 exact Jaccard on boilerplate-heavy corpora",
        "",
        "Every document opens with the same boilerplate sentence, so its",
        "shingles' posting lists hold the ENTIRE corpus — one hot join",
        "key that made the r6 postings self-join quadratic in a single",
        "task (the crawl-data template regime).",
        "",
        "| corpus | all pairs C(n,2) | capped_buckets | max_bucket_size "
        "| sec |",
        "|---|---|---|---|---|",
        *boiler_rows,
        "",
        "chunk_buckets (BUCKET_CAP=1000) spreads each hot posting's pair",
        "generation across <= cap^2-sized tasks with ZERO recall loss",
        "(test_q43_hot_posting_chunking_lossless pins output equality)",
        "and the fan-out observable — 2x corpus means 4x candidate",
        "pairs across 4x chunk tasks, never one task holding C(n,2).",
        "",
        "## q289 winnowing fingerprints on boilerplate-heavy corpora",
        "",
        "The shared template's winnowed fingerprints appear in EVERY",
        "document, so the hottest posting holds the whole corpus and",
        "the TRUE pair output is C(n,2) — pair-volume-quadratic by",
        "construction, the same regime as q43 above.",
        "",
        "| corpus | all pairs C(n,2) | capped_buckets | max_bucket_size "
        "| sec |",
        "|---|---|---|---|---|",
        *winnow_rows,
        "",
        "The chunk fan-out counters record the spread; wall-clock",
        "tracks the emitted pair volume (~4x for 2x docs), never one",
        "task holding C(n,2) positions.",
        "",
        "## q290 duplicate runs on boilerplate-heavy corpora",
        "",
        "Every shared 10-gram occurs n_docs >> RUN_POSTING_CAP (64)",
        "times, so the occurrence cap EXCLUDES the template grams in",
        "BOTH engines (semantic, hash-checkable) and the would-be",
        "C(n,2) pair-position explosion never materializes:",
        "",
        "| corpus | would-be pairs C(n,2) | emitted pairs | sec |",
        "|---|---|---|---|",
        *duprun_rows,
        "",
        "Wall-clock tracks the positional k-gram scan; a crawl where",
        "every page shares a template paragraph costs O(corpus), and",
        "the template text itself is exactly what exact-substring",
        "dedup should NOT re-discover pairwise.",
        "",
        "## q287 BM25 on boilerplate-heavy corpora",
        "",
        "The top-DF query terms ARE the template words (df = n_docs by",
        "construction), so the broadcast query-term join fans out to",
        "BM25_QT rows per document — the hot-term worst case.  The join",
        "output is bounded by sum(df) over query terms <= corpus token",
        "count, and the per-doc hash aggregate (map-side combined)",
        "absorbs it; 2x docs must mean ~2x wall, never df^2.",
        "",
        "| corpus | query terms | qt-join rows | sec |",
        "|---|---|---|---|",
        *bm25_rows,
        "",
        "## q308 boilerplate strip on boilerplate-heavy corpora",
        "",
        "The shared template segment is flagged for EVERY document —",
        "the hottest (source, seg) join key holds the whole corpus and",
        "every doc gets re-stitched.  The hot key is a 1-build-row hash",
        "join (linear in the stream side) and the per-doc collect_list",
        "is bounded by the doc's own segments, so 2x docs ~ 2x wall;",
        "the three-path conservation audit must hold at full-touch",
        "volume (docs_touched == corpus).",
        "",
        "| corpus | docs_touched | words_dropped | audit_ok | sec |",
        "|---|---|---|---|---|",
        *strip_rows,
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--update":
        update_rows(sys.argv[2:])
    else:
        main()
