"""Local differential harness: run every registered query on Spark AND its
DuckDB oracle, compare row count, column names, and an order-insensitive
value hash — emulating the driver's CORRECTNESS gate.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

# Hash-checked runs pin the min_hash_bits regime to the oracle-parity
# default BEFORE any plans import (ADVICE r7 #1): on a fixture larger
# than DHASH_MIN_BITS_AUTO_ROWS the 'auto' density floor would
# otherwise silently diverge q91/q174/q205 from their static oracles.
os.environ.setdefault("SPARK_GRAFT_PIN_MIN_HASH_BITS", "none")

from datapipeline_dags_spark.oracle import compare_frames, duckdb_connection
from datapipeline_dags_spark.plans.all import ORACLES, QUERIES
from datapipeline_dags_spark.session import get_session


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or sorted(QUERIES)
    spark = get_session("oracle-check")
    con = duckdb_connection(sf_dir)

    n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in ORACLES:
            print(f"SKIP {name}: no oracle (rows={len(sdf)}, {t_spark:.1f}s)")
            continue
        try:
            ddf = con.execute(ORACLES[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        res = compare_frames(name, sdf, ddf)
        if res:
            print(f"OK   {name}: {res.rows} rows, {res.detail} ({t_spark:.1f}s)")
        else:
            print(f"FAIL {name}: {res.detail}")
            n_fail += 1
        # Queries that persist() intermediates (q41/q96/q276, …) must
        # not accumulate caches across a 278-query sweep (ADVICE r7 #4)
        spark.catalog.clearCache()
    print(f"\n{len(names) - n_fail}/{len(names)} passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
