"""In-session micro-bench for perf work: times the named queries with
bench.py's exact methodology (median of REPS noop-writes, clearCache
between reps) so route comparisons happen in ONE session.

Usage: PYTHONPATH=. python tools/microbench.py q154_quantile_sketch ...
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), REPS (3).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipeline_dags_spark.plans.all import QUERIES  # noqa: E402
from datapipeline_dags_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "3"))
    spark = get_session("microbench")
    spark.range(1000).count()
    for name in sys.argv[1:]:
        runs = []
        for _ in range(reps):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.time() - t0)
            spark.catalog.clearCache()
        print(
            f"{name}: median={statistics.median(runs):.3f} "
            f"runs={[round(r, 3) for r in runs]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
