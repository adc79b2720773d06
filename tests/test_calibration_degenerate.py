"""q126/q129 on degenerate-but-legal inputs: a group whose z-score
denominator is NULL (single member) or 0 (constant values).  Unguarded,
Spark's double division yields NaN/Infinity while DuckDB can differ —
the explicit sd IS NULL OR sd = 0 -> NULL pin exists for exactly this
case, mirroring q123's zero-width-bin guard."""

from __future__ import annotations

import shutil

import pandas as pd

from datapipeline_dags_spark.oracle import compare_frames, duckdb_connection
from datapipeline_dags_spark.plans.all import ORACLES, QUERIES
from tests.conftest import SF_DIR


def _fixture_with(tmp_path, name: str, pdf: pd.DataFrame) -> str:
    sf_dir = str(tmp_path)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings", "events"):
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{sf_dir}/{t}.parquet")
    pdf.to_parquet(f"{sf_dir}/{name}.parquet", index=False)
    return sf_dir


def test_q126_single_member_and_constant_labels_match_oracle(spark, tmp_path):
    rows = [
        (0, [1.0, 0.0], 0),            # label 0: single member -> sd NULL
        (1, [1.0, 0.0], 1),            # label 1: two identical -> sd 0
        (2, [1.0, 0.0], 1),
        (3, [0.0, 1.0], 2),            # label 2: healthy spread
        (4, [0.0, -1.0], 2),
        (5, [3.0, 0.0], 2),
    ]
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    sf_dir = _fixture_with(tmp_path, "embeddings", pdf)

    sdf = QUERIES["q126_embedding_outliers"](spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    ddf = con.execute(ORACLES["q126_embedding_outliers"]).fetchdf()
    res = compare_frames("q126_embedding_outliers", sdf, ddf)
    assert res, res.detail
    deg = sdf[sdf.label.isin([0, 1])]
    assert deg.z.isna().all() and not deg.is_outlier.any()


def test_q129_single_doc_and_constant_score_sources_match_oracle(spark, tmp_path):
    text40 = " ".join(["tok"] * 40)  # 40 words -> score depends only on nw
    rows = [
        (1, text40, "en", "lonely", len(text40)),       # 1-doc source
        (2, text40, "en", "flat", len(text40)),         # constant-score source
        (3, text40, "en", "flat", len(text40)),
        (4, " ".join(["tok"] * 10), "en", "vary", 39),  # varying source
        (5, " ".join(["tok"] * 60), "en", "vary", 239),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    sf_dir = _fixture_with(tmp_path, "documents", pdf)

    sdf = QUERIES["q129_source_score_calibration"](spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    ddf = con.execute(ORACLES["q129_source_score_calibration"]).fetchdf()
    res = compare_frames("q129_source_score_calibration", sdf, ddf)
    assert res, res.detail
    assert sdf[sdf.source.isin(["lonely", "flat"])].z.isna().all()
    assert sdf[sdf.source == "vary"].z.notna().all()
