"""Deletion-heavy adversarial scale section (VERDICT r11 ask #6): the
maintained-index deletion regime at 50% of the corpus DELETED — the
tombstone table at corpus scale, not the fixture's ~12% share the main
SCALING rows measure.

Measured per scale (x1 / x10 of the standard derivative) on the two
state shapes deletion stresses differently:

- ``LexicalStatsMaintainer`` — the widest O(corpus) row store
  (postings): retraction re-aggregates the victims' stored rows, and
  every subsequent ``_live_delta`` read pays a tombstone anti-join
  whose right side is now half the corpus.  Compaction folds the
  tombstones into the store, so the post-compaction read is the
  "recovered" cost the cadence policy (compact_every) buys back.
- ``IvfIndexMaintainer`` — versioned integer partials: retraction is
  the signed re-aggregation of half the stored assignment rows (the
  algebraically-free path), plus the same tombstone-join story on the
  assignment delta reads.

Columns: ingest = tick-0 process_batch (full corpus) wall;
retract50 = tick-1 process_batch (empty arrivals + 50% tombstones);
read_live = state read with the corpus-scale tombstone anti-join
in the plan; read_compacted = the same read after compact() folded
the tombstones away.  ``matches_full`` is asserted (not reported) —
a timing row for a wrong answer would be worthless.

Usage: PYTHONPATH=. python tools/deletion_heavy.py
Prints the markdown rows for SCALING.md's deletion-heavy section.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datapipeline_dags_spark.session import get_session  # noqa: E402
from datapipeline_dags_spark.streaming.index_maintenance import (  # noqa: E402
    ExactDedupMaintainer,
    IvfIndexMaintainer,
    LexicalStatsMaintainer,
)
from tools.scaling import REPS, WORK, build_fixtures  # noqa: E402


def _timed(fn) -> float:
    runs = []
    for _ in range(REPS):
        t0 = time.time()
        fn()
        runs.append(time.time() - t0)
    return round(statistics.median(runs), 2)


def lexical_rows(spark, dirs) -> list[str]:
    out = []
    for scale, sf_dir in dirs.items():
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        dels = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id")
        n, nd = docs.count(), dels.count()
        state = f"{WORK}/delheavy_lex_{scale}_{int(time.time())}"
        m = LexicalStatsMaintainer(spark, state)
        t0 = time.time()
        m.process_batch(docs, 0)
        t_ingest = round(time.time() - t0, 2)
        empty = spark.createDataFrame([], "doc_id bigint, text string")
        t0 = time.time()
        m.process_batch(empty, 1, deletes=dels)
        t_retract = round(time.time() - t0, 2)
        live = docs.filter(F.col("doc_id") % 2 == 1)
        assert m.matches_full(1, live), f"lex diverged at {scale}"
        t_read = _timed(lambda: m.postings(1).count())
        m.compact(2)
        t_read_c = _timed(lambda: m.postings(1).count())
        out.append(
            f"| lexical postings | {scale} | {n} | {nd} | {t_ingest} | "
            f"{t_retract} | {t_read} | {t_read_c} |"
        )
    return out


def ivf_rows(spark, dirs) -> list[str]:
    out = []
    for scale, sf_dir in dirs.items():
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        dels = emb.filter(F.col("vec_id") % 2 == 0).select("vec_id")
        n, nd = emb.count(), dels.count()
        state = f"{WORK}/delheavy_ivf_{scale}_{int(time.time())}"
        m = IvfIndexMaintainer(spark, state, centroid_corpus=emb)
        t0 = time.time()
        m.process_batch(emb, 0)
        t_ingest = round(time.time() - t0, 2)
        empty = spark.createDataFrame(
            [], "vec_id bigint, embedding array<float>"
        )
        t0 = time.time()
        m.process_batch(empty, 1, deletes=dels)
        t_retract = round(time.time() - t0, 2)
        live = emb.filter(F.col("vec_id") % 2 == 1)
        assert m.matches_full(1, live), f"ivf diverged at {scale}"
        t_read = _timed(lambda: m.assign(1).count())
        m.compact(2)
        t_read_c = _timed(lambda: m.assign(1).count())
        out.append(
            f"| IVF assignments | {scale} | {n} | {nd} | {t_ingest} | "
            f"{t_retract} | {t_read} | {t_read_c} |"
        )
    return out


def dedup_rows(spark, dirs) -> list[str]:
    """``ExactDedupMaintainer`` — the narrowest store (doc_id, digest):
    deleting half the corpus stresses keeper PROMOTION (every digest
    group whose keeper fell must re-elect from live members inside the
    keepers() aggregate) on top of the shared tombstone-join story."""
    out = []
    for scale, sf_dir in dirs.items():
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        dels = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id")
        n, nd = docs.count(), dels.count()
        state = f"{WORK}/delheavy_dedup_{scale}_{int(time.time())}"
        m = ExactDedupMaintainer(spark, state)
        t0 = time.time()
        m.process_batch(docs, 0)
        t_ingest = round(time.time() - t0, 2)
        empty = spark.createDataFrame([], "doc_id bigint, text string")
        t0 = time.time()
        m.process_batch(empty, 1, deletes=dels)
        t_retract = round(time.time() - t0, 2)
        live = docs.filter(F.col("doc_id") % 2 == 1)
        assert m.matches_full(1, live), f"dedup diverged at {scale}"
        t_read = _timed(lambda: m.keepers(1).count())
        m.compact(2)
        t_read_c = _timed(lambda: m.keepers(1).count())
        out.append(
            f"| dedup keepers | {scale} | {n} | {nd} | {t_ingest} | "
            f"{t_retract} | {t_read} | {t_read_c} |"
        )
    return out


def glm_rows(spark, dirs) -> list[str]:
    """``GlmMaintainer`` — the model family's feature store: the
    "read" here is the full REFIT (IRLS_STEPS aggs over the live
    state), so read_live vs read_compacted measures what the 50%
    tombstone anti-join costs every retrain until compaction folds it
    away."""
    from datapipeline_dags_spark.streaming.model_maintenance import (
        GlmMaintainer,
    )

    out = []
    for scale, sf_dir in dirs.items():
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text", "lang", "source"
        )
        dels = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id")
        n, nd = docs.count(), dels.count()
        state = f"{WORK}/delheavy_glm_{scale}_{int(time.time())}"
        m = GlmMaintainer(spark, state)
        t0 = time.time()
        m.process_batch(docs, 0)
        t_ingest = round(time.time() - t0, 2)
        empty = spark.createDataFrame(
            [], "doc_id bigint, text string, lang string, source string"
        )
        t0 = time.time()
        m.process_batch(empty, 1, deletes=dels)
        t_retract = round(time.time() - t0, 2)
        live = docs.filter(F.col("doc_id") % 2 == 1)
        assert m.matches_full(1, live), f"glm diverged at {scale}"
        t_read = _timed(lambda: m.fit(1))
        m.compact(2)
        t_read_c = _timed(lambda: m.fit(1))
        out.append(
            f"| GLM features (read = refit) | {scale} | {n} | {nd} | "
            f"{t_ingest} | {t_retract} | {t_read} | {t_read_c} |"
        )
    return out


def main() -> None:
    dirs = build_fixtures()
    spark = get_session("deletion-heavy")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    rows = (
        lexical_rows(spark, dirs)
        + ivf_rows(spark, dirs)
        + dedup_rows(spark, dirs)
        + glm_rows(spark, dirs)
    )
    print(
        "| store | scale | rows | deleted (50%) | ingest s | retract50 s "
        "| read_live s | read_compacted s |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
