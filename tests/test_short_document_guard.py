"""Short-document guard for the positional-k-gram queries (ADVICE r9 #1).

Spark's ``sequence(1, 0)`` is the DESCENDING array ``[1, 0]`` — not
empty like DuckDB's ``generate_series(1, 0)`` — so an unguarded
positional k-gram transform calls ``slice(words, 0, K)`` and crashes
with INVALID_PARAMETER_VALUE.START on ANY corpus containing a document
shorter than K tokens.  q289 shipped with the ``F.when(n >= 1, ...)``
guard; q290 originally used ``F.greatest(n, 0)`` and crashed.  These
tests pin the guard for both, with full oracle parity on a corpus that
contains sub-K documents.
"""

from __future__ import annotations

import duckdb
import pytest

from datapipeline_dags_spark.oracle import compare_frames
from datapipeline_dags_spark.plans import llm_ops


@pytest.fixture()
def short_doc_dir(spark, tmp_path):
    """Two documents sharing a long copied passage + three documents
    SHORTER than RUN_K (10) tokens, including a one-word doc."""
    passage = " ".join(f"tok{i}" for i in range(40))
    rows = [
        (1, f"intro one {passage} outro alpha", "en", "syn", 0),
        (2, f"different opening {passage} closing words beta", "en", "syn", 0),
        (3, "tiny", "en", "syn", 0),
        (4, "only three tokens", "en", "syn", 0),
        (5, "nine little words sit just under the kgram limit", "en", "syn", 0),
    ]
    rows = [(i, t, lg, s, len(t)) for (i, t, lg, s, _) in rows]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "sf_short")
    df.coalesce(1).write.parquet(out + "/documents.parquet")
    return out


def _oracle_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    return con


def test_q290_survives_and_matches_oracle_on_short_docs(spark, short_doc_dir):
    sdf = llm_ops.q290_duplicate_run_lengths(spark, short_doc_dir).toPandas()
    # the copied passage must surface as ONE maximal run between 1 and 2
    assert len(sdf) == 1
    row = sdf.iloc[0]
    assert (row.doc_a, row.doc_b) == (1, 2)
    assert row.n_runs == 1
    assert row.max_run_tokens == 40  # the full copied passage
    ddf = _oracle_con(short_doc_dir).execute(
        llm_ops._q290_oracle()
    ).fetchdf()
    assert compare_frames("q290_short_docs", sdf, ddf)


def test_q289_survives_and_matches_oracle_on_short_docs(spark, short_doc_dir):
    sdf = llm_ops.q289_winnowing_fingerprints(spark, short_doc_dir).toPandas()
    pairs = {(r.doc_a, r.doc_b) for r in sdf.itertuples(index=False)}
    assert (1, 2) in pairs  # the copied passage shares window minima
    ddf = _oracle_con(short_doc_dir).execute(
        llm_ops._q289_oracle()
    ).fetchdf()
    assert compare_frames("q289_short_docs", sdf, ddf)
