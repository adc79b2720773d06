"""q297 adversarial scale section (VERDICT r10 ask #5): the
all-DISAGREE (drifted-feature-store) regime at x1 / x10 with ALIGNED
ids, so every text near-dup pair actually attaches its embeddings and
lands in the `disagree` band.

The main SCALING table's x10 derivative offsets doc ids by 1e6·rep but
vec ids by 1e7·rep, so replica pairs silently drop out of q297's inner
join — fine for wall-clock, wrong for the band census.  This harness
replicates BOTH tables with the SAME 1e6·rep offset: 10 independent
copies of the near-dup structure, every pair id-resolvable, embeddings
independent of the text (the fixture's native state) — exactly the
poisoned/stale-store regime the audit exists to flag.

Usage: PYTHONPATH=. python tools/crossmodal_adversarial.py
Prints the markdown rows for SCALING.md's q297 section.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipeline_dags_spark.plans.all import QUERIES  # noqa: E402
from datapipeline_dags_spark.session import get_session  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/spark_graft_scale"
REPS = 2


def build(scale: str, n_reps: int) -> str:
    d = f"{WORK}/crossmodal_{scale}"
    os.makedirs(d, exist_ok=True)
    con = duckdb.connect()
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
        ) TO '{d}/documents.parquet' (FORMAT PARQUET)
        """
    )
    # SAME offset as documents — every pair id-resolvable at both scales
    con.execute(
        f"""
        COPY (
          SELECT vec_id + rep * 1000000 AS vec_id, embedding, label
          FROM read_parquet('{BASE}/embeddings.parquet'),
               (SELECT unnest(generate_series(0, {n_reps - 1})) AS rep)
        ) TO '{d}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return d


def main() -> None:
    spark = get_session("crossmodal-adversarial")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    for scale, reps in (("x1", 1), ("x10", 10)):
        d = build(scale, reps)
        runs, rows = [], []
        for _ in range(REPS):
            t0 = time.time()
            rows = QUERIES["q297_crossmodal_dup_consistency"](
                spark, d
            ).collect()
            runs.append(time.time() - t0)
            spark.catalog.clearCache()
        bands = {r["band"]: r["n_pairs"] for r in rows}
        total = sum(bands.values())
        print(
            f"| {scale} | {total} | {bands.get('disagree', 0)} | "
            f"{bands.get('agree_soft', 0) + bands.get('agree_high', 0)} | "
            f"{round(statistics.median(runs), 2)} |"
        )


if __name__ == "__main__":
    main()
