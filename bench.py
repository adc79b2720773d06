"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
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
    # extension operators (SURVEY §2.11) — appended as they land
    "q40_dedup_exact",
    "q41_dedup_minhash_lsh",
    "q45_ann_topk_bruteforce",
    "q50_text_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_session("bench")

    # JVM/codegen warmup on a trivial action so per-query numbers measure
    # the plan, not session bring-up.
    spark.range(1000).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        n = df.count()  # materialize the whole plan
        timings[name] = round(time.time() - t0, 3)
        _ = n
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
