"""q123 PSI on a degenerate-but-legal input: an event type whose value
is CONSTANT (hi == lo makes the bin width 0).  Both engines must agree
— the explicit hi=lo -> bin 0 guard exists precisely because the
unguarded expressions diverge (Spark NaN->null->bin 0 silently vs
DuckDB FLOOR(x/0))."""

from __future__ import annotations

import datetime
import shutil

import pandas as pd

from datapipeline_dags_spark.oracle import compare_frames, duckdb_connection
from datapipeline_dags_spark.plans.all import ORACLES, QUERIES
from tests.conftest import SF_DIR


def test_psi_constant_value_type_matches_oracle(spark, tmp_path):
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(200):
        # 'flat' has one constant value; 'vary' a spread, in both halves
        rows.append((i, base + datetime.timedelta(hours=i), i % 7, "flat", 5.0, "{}"))
        rows.append(
            (1000 + i, base + datetime.timedelta(hours=i), i % 7, "vary",
             float(i % 13), "{}")
        )
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf_dir = str(tmp_path)
    # the oracle connection registers every table — borrow the fixture's
    # other files and swap in the degenerate events table
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"):
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{sf_dir}/{t}.parquet")
    pdf.to_parquet(f"{sf_dir}/events.parquet", index=False)

    sdf = QUERIES["q123_psi_drift"](spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    ddf = con.execute(ORACLES["q123_psi_drift"]).fetchdf()
    res = compare_frames("q123_psi_drift", sdf, ddf)
    assert res, res.detail
    flat = sdf[sdf.event_type == "flat"]
    assert len(flat) == 1 and not flat.iloc[0].drifted  # constant -> no drift
