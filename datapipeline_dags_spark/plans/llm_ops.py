"""LLM-training-data pipeline operators — SURVEY.md §2.11 (extension).

Dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding-cosine),
similarity search (brute-force top-k + LSH-bucketed), and text analysis
(quality, language-ID, token counting, fingerprinting) over the
``documents`` / ``embeddings`` fixtures.

Scale design (the 100 TB bar):

- Dedup shuffles on *hashes* (64-char sha/md5 strings), never on full
  document text.
- Near-dup is **candidate-generation first** (LSH bands / shared-shingle
  blocks / sign-buckets), exact verification only on candidates —
  never an all-pairs cross join.
- Everything is JVM-side ``pyspark.sql.functions`` (higher-order array
  lambdas, md5, regexp) inside whole-stage codegen — zero Python UDFs.
- Oracle parity trick: MinHash / SimHash permutations are built from
  md5 *hex strings* (identical bytes in Spark and DuckDB), so even the
  probabilistic sketches are deterministically oracle-checkable.

Reference parity: the reference has no such operators (it is Airflow
orchestration — see SURVEY §0); these are mandated extensions.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datapipeline_dags_spark.catalog import table
from datapipeline_dags_spark.checkpoint import local_checkpoint
from datapipeline_dags_spark.operators import blocking
from datapipeline_dags_spark.operators.graph import connected_components
from datapipeline_dags_spark.plans.helpers import (
    cached_count,
    dec,
    resolve_exact_audit,
    sql_dec,
)
from datapipeline_dags_spark.plans.registry import ORACLES, QUERIES, query
from datapipeline_dags_spark.plans.route import bounded_collect, collect_and_solve

# ---------------------------------------------------------------------------
# Shared building blocks
# ---------------------------------------------------------------------------

# Word k-gram width. k=5 (not 3) because shorter shingles leave a high
# baseline Jaccard between unrelated docs, which blows up LSH band
# collisions into a quasi-all-pairs join (measured: 1.13M blocked pairs
# at sf0.1 with k=3 vs 1.5k with k=5, with IDENTICAL true-pair recall).
SHINGLE_K = 5

# DuckDB-side word-shingle fragment (parity twin of _shingles())
_W = "string_split(text, ' ')"
_SHINGLES_SQL = (
    f"CASE WHEN len({_W}) >= {SHINGLE_K} THEN "
    f"list_distinct(list_transform(generate_series(1, len({_W}) - {SHINGLE_K - 1}), "
    f"i -> array_to_string(({_W})[i:i+{SHINGLE_K - 1}], ' '))) "
    "ELSE [text] END"
)


def _fanout(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Spread a small scan across all cores for CPU-bound per-row hashing.

    The test fixtures are single-split parquet files, so Spark reads them
    as ONE partition and the md5/shingle work runs on one core.  At
    100 TB the scan has thousands of splits and this repartition is a
    no-op by construction (split count ≫ cores); locally it is a cheap
    round-robin shuffle of the raw rows that unlocks the other 31 cores.
    """
    return df.repartition(spark.sparkContext.defaultParallelism)


# Candidate-bucket cap shared by the blocking-based near-dup operators
# (q41 LSH bands, q42 SimHash bands, q69 anchors, q80 deletion variants).
# A bucket larger than this is TRUNCATED to its BUCKET_CAP smallest
# members (never silently dropped — a dropped hot band would lose ALL of
# its pairs at scale), and the truncation is mirrored in the DuckDB
# oracle SQL (row_number per bucket ordered by the doc key), so the
# contract stays hash-checkable at any scale.  The machinery itself
# lives in ``operators.blocking`` (the image/video dHash operators use
# it too); this module keeps its historical globals as the
# test-monkeypatchable knobs and forwards them per call.
BUCKET_CAP = blocking.BUCKET_CAP

#: Observation per capped query, refreshed on every plan build — after an
#: action on the returned DataFrame, ``BUCKET_OBSERVATIONS[name].get``
#: yields {"buckets": n, "capped_buckets": n, "max_bucket_size": n} so a
#: cap that fires is an observable recall event, not a silent one.
#: Shared with ``operators.blocking`` so metrics persistence sees every
#: blocking operator's counters in one place.
BUCKET_OBSERVATIONS: dict[str, Observation] = blocking.BUCKET_OBSERVATIONS


def _cap_buckets(bucketed: DataFrame, name: str, members_col: str) -> DataFrame:
    return blocking.cap_buckets(
        bucketed, name, members_col, cap=BUCKET_CAP, observations=BUCKET_OBSERVATIONS
    )


def _shingles(text: Column) -> Column:
    """Distinct word k-gram shingles, JVM-side (sequence + transform + slice)."""
    words = F.split(text, " ")
    n = F.size(words) - (SHINGLE_K - 1)
    return F.when(
        n >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.concat_ws(" ", F.slice(words, i, SHINGLE_K)),
            )
        ),
    ).otherwise(F.array(text))


def _cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two float arrays, computed in double with
    strict left-to-right accumulation — bit-compatible with DuckDB's
    list_cosine_similarity over DOUBLE[]."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

    def norm(v: Column) -> Column:
        return F.sqrt(
            F.aggregate(
                F.transform(v, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, z: acc + z,
            )
        )

    return dot / (norm(a) * norm(b))


_COS_SQL = "list_cosine_similarity({a}::DOUBLE[], {b}::DOUBLE[])"


# ---------------------------------------------------------------------------
# numpy scoring backends (optimization r12 — guide §4.2)
#
# The ANN family's per-row math (_cosine, the PQ/IVF argmin/argmax
# encodes) runs in Catalyst higher-order functions, which are
# CodegenFallback: every element is boxed and the lambda interpreted,
# measured ~20 µs per 64-dim cosine — the dominant term of every ANN
# bench slot, and a per-row cost that scales straight into the 100 TB
# corpus.  These backends run the same arithmetic vectorized per Arrow
# batch (the established q96 pair_backend / q112 encode_backend
# pattern).  BIT-EQUALITY is by construction, not by luck:
#
# - accumulations loop over the DIMENSION index (acc += a[:, i] * b[:, i]),
#   so each row's dot/norm/L2 is the SAME IEEE operation sequence as the
#   JVM aggregate's left-to-right fold (never np.sum, whose pairwise
#   blocks reorder additions);
# - products/differences of float32-valued doubles, sqrt and division
#   are correctly rounded identically in both engines;
# - ties: np.argmin/argmax take the FIRST extremum, and centroid rows
#   are sorted by ascending cid, which is exactly array_min/array_max's
#   struct tie-break on (metric, cid);
# - decimal rounding (``dec``) deliberately STAYS in the JVM on the
#   returned raw double, so the rounding engine is unchanged.
#
# tests/test_numpy_backends.py pins numpy-vs-jvm bit-equality per helper.
# ---------------------------------------------------------------------------


def _cos_pairs_numpy(
    spark: SparkSession,
    df: DataFrame,
    carry: tuple[str, ...],
    a: str,
    b: str,
) -> DataFrame:
    """Raw cosine over paired float-array columns in ONE Arrow pass:
    carry columns + ``cos_raw`` double, bit-equal to ``_cosine`` (see
    the section comment).  Only ``carry + (a, b)`` cross the Python
    boundary (guide §4.1)."""
    import numpy as np
    import pandas as pd

    from datapipeline_dags_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    src = df.select(*carry, a, b)
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        [src.schema[c] for c in carry] + [StructField("cos_raw", DoubleType())]
    )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ea = np.stack(pdf[a].to_numpy()).astype(np.float64)
            eb = np.stack(pdf[b].to_numpy()).astype(np.float64)
            dot = np.zeros(len(pdf))
            na = np.zeros(len(pdf))
            nb = np.zeros(len(pdf))
            for i in range(ea.shape[1]):
                x, y = ea[:, i], eb[:, i]
                dot += x * y
                na += x * x
                nb += y * y
            out = {c: pdf[c] for c in carry}
            out["cos_raw"] = dot / (np.sqrt(na) * np.sqrt(nb))
            yield pd.DataFrame(out)

    return src.mapInPandas(score, schema)


def _collect_centroids(
    corpus: DataFrame, n: int, label: str
) -> "list[tuple[int, list[float]]]":
    """The fixed-size quantizer (first ``n`` corpus vectors) as a sorted
    (cid, vector) list — the bounded control-plane collect the numpy
    assignment backend closes over (cf. _ivfpq_encode_numpy's codebook)."""
    rows = bounded_collect(
        corpus.filter(F.col("vec_id") < n).select("vec_id", "embedding"),
        n,
        label,
    )
    return sorted((int(r["vec_id"]), list(r["embedding"])) for r in rows)


def _nearest_centroid_numpy(
    spark: SparkSession,
    df: DataFrame,
    cents: "list[tuple[int, list[float]]]",
    carry: tuple[str, ...],
    emb: str = "embedding",
    out: str = "cell",
) -> DataFrame:
    """argmax-cosine centroid id per row (carry + ``emb`` + out long),
    bit-equal to the array_max(struct(cos, -cid)) HOF: cosines use the
    dimension-loop accumulation, and first-argmax over ascending-cid
    columns reproduces the smallest-cid tie-break (NaN ranks greatest
    in both engines)."""
    import numpy as np
    import pandas as pd

    from datapipeline_dags_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    cids = np.asarray([c for c, _ in cents], dtype=np.int64)
    cb = np.asarray([v for _, v in cents], dtype=np.float64)
    ncent = np.zeros(len(cents))
    for i in range(cb.shape[1]):
        ncent += cb[:, i] * cb[:, i]
    ncent = np.sqrt(ncent)
    src = df.select(*carry, emb) if emb not in carry else df.select(*carry)
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [src.schema[c] for c in src.columns] + [StructField(out, LongType())]
    )

    src_cols = list(src.columns)

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            e = np.stack(pdf[emb].to_numpy()).astype(np.float64)
            dots = np.zeros((len(pdf), len(cids)))
            ne = np.zeros(len(pdf))
            for i in range(e.shape[1]):
                dots += e[:, i : i + 1] * cb[None, :, i]
                ne += e[:, i] * e[:, i]
            cs = dots / (np.sqrt(ne)[:, None] * ncent[None, :])
            res = {c: pdf[c] for c in src_cols}
            res[out] = cids[np.argmax(cs, axis=1)]
            yield pd.DataFrame(res)

    return src.mapInPandas(assign, schema)


def _pq_encode_sweep_numpy(
    spark: SparkSession,
    corpus: DataFrame,
    cfgs: "tuple[tuple[int, int], ...]",
    cb_source: DataFrame,
) -> DataFrame:
    """ALL sweep configs encoded in ONE Arrow pass (optimization r13,
    guide §1.2/§4.2 — VERDICT r12 ask #5): per batch, each dimension's
    (x − c)² column grid is computed ONCE and added into every config's
    active subspace accumulator, so the corpus crosses the Python
    boundary once instead of once per config and the per-dim squared
    differences are never recomputed.  Bit-equality per config is
    unchanged: within a subspace the accumulation still runs dimension-
    at-a-time in ascending order from zeros (the exact _pq_l2 fold
    order), argmin takes the first minimum (lowest cid), err_total
    folds the per-subspace minima in m order from 0.0.  The codebook is
    collected ONCE here (ADVICE r12 #5 — the per-config re-collect is
    gone).  Output: (vec_id, codes_<mm> array<int>, err_<mm> double)
    per config."""
    import numpy as np
    import pandas as pd

    from datapipeline_dags_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    cents = _collect_centroids(cb_source, PQ_K, "pq_codebook")
    got = [c for c, _ in cents]
    if got != list(range(PQ_K)):
        raise ValueError(
            f"PQ codebook requires contiguous vec_ids 0..{PQ_K - 1}, got {got}"
        )
    cb = np.asarray([v for _, v in cents], dtype=np.float64)
    dim = cb.shape[1]
    for mm, dd in cfgs:
        if mm * dd != dim:
            raise ValueError(f"config ({mm}, {dd}) does not tile dim {dim}")
    fields = "vec_id long, " + ", ".join(
        f"codes_{mm} array<int>, err_{mm} double" for mm, _ in cfgs
    )

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            e = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            n = len(pdf)
            res = {"vec_id": pdf["vec_id"]}
            codes = {
                mm: np.empty((n, mm), dtype=np.int32) for mm, _ in cfgs
            }
            err = {mm: np.zeros(n) for mm, _ in cfgs}
            acc = {mm: np.zeros((n, PQ_K)) for mm, _ in cfgs}
            for i in range(dim):
                diff = e[:, i : i + 1] - cb[None, :, i]
                d2 = diff * diff
                for mm, dd in cfgs:
                    a = acc[mm]
                    a += d2
                    if (i + 1) % dd == 0:
                        m = i // dd
                        am = np.argmin(a, axis=1)
                        codes[mm][:, m] = am
                        err[mm] += a[np.arange(n), am]
                        a[:] = 0.0
            for mm, _ in cfgs:
                res[f"codes_{mm}"] = list(codes[mm])
                res[f"err_{mm}"] = err[mm]
            yield pd.DataFrame(res)

    return corpus.select("vec_id", "embedding").mapInPandas(encode, fields)


def _pq_adc_sweep_numpy(
    spark: SparkSession,
    enc_all: DataFrame,
    cfgs: "tuple[tuple[int, int], ...]",
    cb_source: DataFrame,
) -> DataFrame:
    """Pure-ADC scores for every (config, query, vector) pair from the
    sweep encode frame in ONE Arrow pass (optimization r13, guide §4.2)
    — the numpy twin of q314's per-config broadcast(lut) ⋈ codes +
    ``_pq_adc_score`` HOF fold.  The per-config LUTs are built driver-
    side from the bounded codebook and query collects with the same
    dimension-at-a-time accumulation as ``_pq_dot`` (left-to-right over
    each subspace block), and the per-pair score folds lut[m][code_m]
    in ascending m order from 0.0 — the exact ``_pq_adc_score``
    sequence, so raw doubles are bit-equal; the 6-dp rounding stays in
    the JVM on the returned double.  Self-pairs (vec == q) are dropped
    like the JVM join's ``vec_id != q_id``.  Output: (cfg, q_id,
    neighbor_id, sc_raw)."""
    import numpy as np
    import pandas as pd

    from datapipeline_dags_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    cents = _collect_centroids(cb_source, PQ_K, "pq_codebook")
    got = [c for c, _ in cents]
    if got != list(range(PQ_K)):
        raise ValueError(
            f"PQ codebook requires contiguous vec_ids 0..{PQ_K - 1}, got {got}"
        )
    cb = np.asarray([v for _, v in cents], dtype=np.float64)
    qcents = _collect_centroids(cb_source, N_QUERIES, "q314_adc_queries")
    qids = np.asarray([c for c, _ in qcents], dtype=np.int64)
    qe = np.asarray([v for _, v in qcents], dtype=np.float64)
    luts = {}
    for mm, dd in cfgs:
        lut = np.zeros((len(qids), mm, PQ_K))
        for m in range(mm):
            for i in range(m * dd, (m + 1) * dd):
                lut[:, m, :] += qe[:, i : i + 1] * cb[None, :, i]
        luts[mm] = lut
    code_cols = [f"codes_{mm}" for mm, _ in cfgs]

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vids = pdf["vec_id"].to_numpy(np.int64)
            n = len(vids)
            frames = []
            for mm, _ in cfgs:
                codes = np.stack(pdf[f"codes_{mm}"].to_numpy()).astype(np.int64)
                lut = luts[mm]
                acc = np.zeros((len(qids), n))
                for m in range(mm):
                    acc += lut[:, m, :][:, codes[:, m]]
                keep = vids[None, :] != qids[:, None]
                qq = np.repeat(qids, n).reshape(len(qids), n)
                nn = np.broadcast_to(vids, (len(qids), n))
                frames.append(
                    pd.DataFrame(
                        {
                            "cfg": np.int64(mm),
                            "q_id": qq[keep],
                            "neighbor_id": nn[keep],
                            "sc_raw": acc[keep],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return enc_all.select("vec_id", *code_cols).mapInPandas(
        score, "cfg long, q_id long, neighbor_id long, sc_raw double"
    )


def _pq_encode_cfg_numpy(
    spark: SparkSession,
    corpus: DataFrame,
    mm: int,
    dd: int,
    with_err: bool,
    cb_source: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, codes[, err_total]) against the frozen first-PQ_K
    codebook for an (mm, dd) subspace layout — the numpy twin of
    ``_pq_codes_col`` / q314's per-config encode.  Distances accumulate
    dimension-at-a-time (same IEEE sequence as _pq_l2's fold), argmin
    takes the first minimum (lowest cid), and err_total folds the
    per-subspace minima in m order from 0.0 — bit-equal throughout."""
    import numpy as np
    import pandas as pd

    from datapipeline_dags_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    cents = _collect_centroids(
        cb_source if cb_source is not None else corpus, PQ_K, "pq_codebook"
    )
    got = [c for c, _ in cents]
    if got != list(range(PQ_K)):
        raise ValueError(
            f"PQ codebook requires contiguous vec_ids 0..{PQ_K - 1}, got {got}"
        )
    cb = np.asarray([v for _, v in cents], dtype=np.float64)
    fields = "vec_id long, codes array<int>"
    if with_err:
        fields += ", err_total double"

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            e = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            n = len(pdf)
            codes = np.empty((n, mm), dtype=np.int32)
            err = np.zeros(n)
            for m in range(mm):
                d = np.zeros((n, PQ_K))
                for i in range(m * dd, (m + 1) * dd):
                    diff = e[:, i : i + 1] - cb[None, :, i]
                    d += diff * diff
                am = np.argmin(d, axis=1)
                codes[:, m] = am
                if with_err:
                    err += d[np.arange(n), am]
            res = {"vec_id": pdf["vec_id"], "codes": list(codes)}
            if with_err:
                res["err_total"] = err
            yield pd.DataFrame(res)

    return corpus.select("vec_id", "embedding").mapInPandas(encode, fields)


# ---------------------------------------------------------------------------
# q40 — exact dedup
# ---------------------------------------------------------------------------


@query(
    "q40_dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY text
    """,
)
def q40_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group on sha2(text) and keep the lowest doc_id.

    At 100 TB the shuffle key is the 64-char digest, not the document —
    constant-width exchange regardless of document size. (The oracle
    groups by raw text: identical partitions absent sha256 collisions.)
    """
    docs = table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.sha2(F.col("text"), 256).alias("h"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
        .select("keep_doc_id", "n_copies")
    )


# ---------------------------------------------------------------------------
# q41 — MinHash + LSH banding near-dup
# ---------------------------------------------------------------------------

MINHASH_H = 12  # signature length
LSH_R = 3  # rows per band
LSH_B = MINHASH_H // LSH_R  # 4 bands
JACCARD_T = 0.5


def _lsh_verified_ctes() -> str:
    """Shared WITH-body of the q41/q214 oracles: shingles -> minhash
    signatures -> capped band buckets -> candidate pairs -> exact
    Jaccard, UNFILTERED (q41 applies the >= threshold, q214 uses both
    sides of it).  One md5 per shingle; permutation i = h1 + i*h2 (h2
    is 32-bit so i*h2 never overflows BIGINT in either engine)."""
    sig_cols = ", ".join(
        f"list_min(list_transform(hp, p -> p.h1 + {i} * p.h2)) AS m{i}"
        for i in range(MINHASH_H)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS key FROM sig".format(
            b=b,
            key=" || '|' || ".join(f"CAST(m{b * LSH_R + r} AS VARCHAR)" for r in range(LSH_R)),
        )
        for b in range(LSH_B)
    )
    return f"""
    docs AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
    hp AS (SELECT doc_id, sh,
           list_transform(list_transform(sh, s -> md5(s)),
             h -> {{'h1': ('0x' || substr(h, 1, 15))::BIGINT,
                    'h2': ('0x' || substr(h, 17, 8))::BIGINT}}) AS hp
           FROM docs),
    sig AS (SELECT doc_id, {sig_cols} FROM hp),
    bands_raw AS ({band_selects}),
    bands AS (SELECT doc_id, band, key FROM bands_raw
              QUALIFY row_number() OVER (PARTITION BY band, key
                                         ORDER BY doc_id) <= {BUCKET_CAP}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    verified AS (
      SELECT c.doc_a, c.doc_b,
             len(list_intersect(da.sh, db.sh)) * 1.0
               / len(list_distinct(list_concat(da.sh, db.sh))) AS j
      FROM cand c
      JOIN docs da ON da.doc_id = c.doc_a
      JOIN docs db ON db.doc_id = c.doc_b)
    """


def _q41_oracle() -> str:
    return f"""
    WITH {_lsh_verified_ctes()}
    SELECT doc_a, doc_b, (ROUND(j, 6) + 0.0) AS jaccard
    FROM verified WHERE j >= {JACCARD_T}
    """


def _minhash_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, band, key) MinHash-LSH band rows of a (doc_id, sh)
    shingle table — the signature pipeline shared by
    ``_lsh_verified_candidates`` (q41/q214) and q284's incremental
    index refresh.  One md5 per shingle; permutation i = h1 + i·h2.

    NB: single-arg lambdas only — a two-arg lambda (e.g.
    ``lambda s, i=i``) makes Spark bind the second param to the
    element INDEX column."""
    hp = F.transform(
        F.transform(F.col("sh"), lambda s: F.md5(s)),
        lambda h: F.struct(
            F.conv(F.substring(h, 1, 15), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(h, 17, 8), 16, 10).cast("long").alias("h2"),
        ),
    )
    hashed = docs.select("doc_id", hp.alias("hp"))

    def minhash(i: int) -> Column:
        mult = F.lit(i).cast("long")
        return F.array_min(
            F.transform(F.col("hp"), lambda p: p["h1"] + mult * p["h2"])
        )

    sigs = hashed.select(
        "doc_id", *[minhash(i).alias(f"m{i}") for i in range(MINHASH_H)]
    )
    band_keys = [
        F.concat_ws("|", *[F.col(f"m{b * LSH_R + r}") for r in range(LSH_R)])
        for b in range(LSH_B)
    ]
    return sigs.select(
        "doc_id", F.posexplode(F.array(*band_keys)).alias("band", "key")
    )


def _lsh_verified_candidates(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame:
    """UNFILTERED MinHash-LSH candidate pairs with exact Jaccard —
    (doc_a, doc_b, j): the shared engine of q41 (which keeps j >=
    JACCARD_T) and q214's triplet miner (which also uses the same-bucket
    pairs BELOW threshold as hard negatives).  ``name`` keys the bucket
    observation so each caller's cap counters stay separate.

    MinHash(12)+LSH(4 bands × 3) near-dup, exact-Jaccard verified.

    Candidate generation is a self-join on (band, band_key) — each doc
    emits 4 constant-width band keys, so the join is hash-partitioned on
    short strings and NEVER all-pairs.  Exact Jaccard (array_intersect /
    array_union) runs only on candidates.

    Hashing: ONE md5 per shingle; permutation i = ``h1 + i*h2`` where
    h1/h2 are 60-/32-bit slices of the digest (the classic (a+ib) hash
    family) — 12 permutations for one digest pass, deterministic and
    engine-portable (no seeded RNG), overflow-free in signed 64-bit.
    """
    # The shingle table is read three times in one execution (signature
    # pass + both sides of the candidate verification) — persist it so
    # shingling runs once per job, not three times.  MEMORY_AND_DISK:
    # at 100 TB the executor caches spill instead of OOMing.
    from pyspark.storagelevel import StorageLevel

    docs = (
        _fanout(spark, table(spark, sf_dir, "documents"))
        .select("doc_id", _shingles(F.col("text")).alias("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bands = _minhash_bands(docs)
    # Candidate pairs via ONE aggregation instead of a band self-join: a
    # self-join would execute the whole signature pipeline twice (Spark
    # cannot reuse the exchange across the broadcast side).  Bucket size
    # is bounded by band selectivity; a pathological all-identical-docs
    # bucket (those pairs belong to exact dedup, q40) is TRUNCATED to
    # BUCKET_CAP members with an observed counter — see _cap_buckets.
    # members arrive SORTED from _cap_buckets — no second sort
    ids = F.col("ids")
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    bucketed = (
        bands.groupBy("band", "key")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    cand = (
        _cap_buckets(bucketed, name, "ids")
        .select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.doc_a"), F.col("p.doc_b"))
        .distinct()
    )
    sets = docs.select(F.col("doc_id"), F.col("sh"))
    j = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.join(sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
        .withColumn("j", j)
        .select("doc_a", "doc_b", "j")
    )


@query("q41_dedup_minhash_lsh", oracle=_q41_oracle())
def q41_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(12)+LSH(4 bands × 3) near-dup, exact-Jaccard verified —
    the >= JACCARD_T face of ``_lsh_verified_candidates`` (see its
    docstring for the candidate-generation and hashing design)."""
    v = _lsh_verified_candidates(spark, sf_dir, "q41_dedup_minhash_lsh")
    return v.filter(F.col("j") >= JACCARD_T).select(
        "doc_a", "doc_b", dec(F.col("j"), 6).alias("jaccard")
    )


# ---------------------------------------------------------------------------
# q42 — SimHash near-dup
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64
SIMHASH_BAND = 16  # 4 bands × 16 bits (Manku et al., WWW'07: 64-bit fingerprints)
HAMMING_T = 3  # 4 bands guarantee recall for ≤3 differing bits (pigeonhole)


def _simhash_bit_sql(d: int) -> str:
    """DuckDB predicate: bit ``d`` (1-based, 1..64) of the token's md5 is
    set.  Bits 1..32 = high bit of hex digit d; bits 33..64 = bit 2 of
    hex digit d−32 — two independent bits per digit give 64 signature
    bits from ONE md5 per token."""
    if d <= 32:
        return f"substr(md5(t), {d}, 1) >= '8'"
    p = d - 32
    return f"(substr(md5(t), {p}, 1) BETWEEN '4' AND '7' OR substr(md5(t), {p}, 1) >= 'c')"


def _q42_oracle() -> str:
    toks = "list_distinct(string_split(text, ' '))"
    bits = " || ".join(
        f"CASE WHEN COALESCE(list_sum(list_transform({toks}, "
        f"t -> CASE WHEN {_simhash_bit_sql(d)} THEN 1 ELSE -1 END)), 0) >= 0 "
        "THEN '1' ELSE '0' END"
        for d in range(1, SIMHASH_BITS + 1)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, sig, {b} AS band, substr(sig, {1 + SIMHASH_BAND * b}, {SIMHASH_BAND}) AS key FROM sigs"
        for b in range(SIMHASH_BITS // SIMHASH_BAND)
    )
    hamming = " + ".join(
        f"CASE WHEN substr(a.sig, {d}, 1) <> substr(b.sig, {d}, 1) THEN 1 ELSE 0 END"
        for d in range(1, SIMHASH_BITS + 1)
    )
    return f"""
    WITH sigs AS (SELECT doc_id, {bits} AS sig FROM documents),
    bands AS ({band_selects}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST({hamming} AS BIGINT) AS hamming
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= {HAMMING_T}
    """


def _chunk_buckets(bucketed: DataFrame, name: str, members_col: str) -> DataFrame:
    return blocking.chunk_buckets(
        bucketed, name, members_col, cap=BUCKET_CAP, observations=BUCKET_OBSERVATIONS
    )


#: Below this many corpus rows, post-aggregation frames that feed a
#: CPU-heavy pair explode are round-robin re-spread across cores: AQE
#: coalesces shuffle partitions by BYTES, so a few-hundred-KB bucket
#: table lands in ONE partition and the entire pair-explode + verify
#: runs serially in one task (measured: q42's verify stage = 1 task,
#: ~2 s CPU, while 31 cores idle).  Above the gate the coalesced
#: partition count is already >= the core count and the extra shuffle
#: would only re-move the posting lists, so the spread is skipped —
#: the gate keys on input size, not on the local core count.
SPREAD_GATE_ROWS = 1_000_000


def _spread_small(
    spark: SparkSession, df: DataFrame, corpus_rows: int
) -> DataFrame:
    """Round-robin repartition of a small post-agg frame so that the
    CPU-heavy explode downstream parallelizes (see SPREAD_GATE_ROWS)."""
    if corpus_rows > SPREAD_GATE_ROWS:
        return df
    return df.repartition(spark.sparkContext.defaultParallelism)


def _simhash_sigs_numpy(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """q42's 64-bit SimHash signature pass as one Arrow batch pass:
    (doc_id, sig 64-char bitstring).  ALL-INTEGER arithmetic, so the
    backend is trivially bit-exact with the HOF fold: hashlib.md5 hex
    digests are byte-identical to F.md5, the per-token ±1 votes sum in
    any order, and the bit rules mirror the JVM expression (hex digit d
    high bit for bits 1..32, nibble bit 2 for bits 33..64).  The JVM
    fold costs ~4.4 ms/doc interpreted (64-wide zip_with + two substr
    per token per bit); this runs the same math in ~tens of µs/doc."""
    import hashlib

    import numpy as np
    import pandas as pd

    from datapipeline_dags_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)

    # nibble value -> (+1/-1) vote per bit rule, precomputed for all 16
    # hex digits: bits 1..32 use the digit's high bit (>= '8'); bits
    # 33..64 use nibble bit 2 ('4'-'7' or >= 'c').
    hexd = "0123456789abcdef"
    hi_vote = {c: (1 if c >= "8" else -1) for c in hexd}
    lo_vote = {
        c: (1 if ("4" <= c <= "7") or (c >= "c") else -1) for c in hexd
    }

    def sigs(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for text in pdf["text"]:
                acc = np.zeros(SIMHASH_BITS, dtype=np.int64)
                for t in dict.fromkeys(text.split(" ")):
                    h = hashlib.md5(t.encode()).hexdigest()
                    acc[:32] += [hi_vote[c] for c in h]
                    acc[32:] += [lo_vote[c] for c in h]
                out.append("".join("1" if v >= 0 else "0" for v in acc))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sig": out})

    return docs.select("doc_id", "text").mapInPandas(
        sigs, "doc_id long, sig string"
    )


@query("q42_dedup_simhash", oracle=_q42_oracle())
def q42_dedup_simhash(
    spark: SparkSession, sf_dir: str, sig_backend: str | None = None
) -> DataFrame:
    """SimHash(64-bit) near-dup — the Manku et al. (WWW'07) web-dedup
    configuration: bit d = sign of Σ±1 token votes, 4×16-bit bands for
    candidate generation, Hamming distance ≤ 3 keeps near-dups.

    Two bits derive from each md5 hex digit (high bit → bits 1..32, bit
    2 → bits 33..64), so md5 still runs ONCE per token and all 64
    bit-sums accumulate in a single fold over the digest array.

    Scale shape (the 100 TB story, in order of importance):
    - 16-bit band keys: 65 536 buckets per band, so baseline bucket
      occupancy is n/65 536 per band — the previous 8-bit keyspace put
      n/256 docs in EVERY bucket, unusable past ~10⁵ docs.
    - Oversized buckets (genuinely similar signature mass) are CHUNKED
      and their pair generation distributed (``_chunk_buckets``), not
      truncated: recall loss from hot buckets is now zero by
      construction, per-task memory stays ≤ BUCKET_CAP².  (Collapse
      byte-identical docs with q40 first — an exact-dup class of size m
      is inherently m²/2 pairs for any pairwise contract.)
    - NO distinct shuffle on candidate pairs: a pair found in band b is
      emitted only if no earlier band also matched (the band segments
      are recomputable from the carried hi/lo signature halves with two
      shifts and a mask), so cross-band dedup is a map-side filter
      instead of a shuffle of every candidate pair.  Total: 2 shuffles
      (fan-out + one (band, key) agg).
    """
    toks = F.array_distinct(F.split(F.col("text"), " "))
    hexes = F.transform(toks, lambda t: F.md5(t))
    bit_sums = F.aggregate(
        hexes,
        F.array_repeat(F.lit(0), SIMHASH_BITS),
        lambda acc, h: F.zip_with(
            acc,
            F.sequence(F.lit(1), F.lit(SIMHASH_BITS)),
            lambda a, d: a
            + F.when(
                F.when(d <= 32, h.substr(d, F.lit(1)) >= "8").otherwise(
                    h.substr(d - 32, F.lit(1)).between("4", "7")
                    | (h.substr(d - 32, F.lit(1)) >= "c")
                ),
                1,
            ).otherwise(-1),
        ),
    )
    sig = F.concat_ws(
        "",
        F.transform(
            bit_sums, lambda s: F.when(s >= 0, F.lit("1")).otherwise(F.lit("0"))
        ),
    )
    # signature backend: "jvm" default — once the verify explode is
    # re-spread (_spread_small), the 32-way interpreted fold wins the
    # interleaved A/B at sf0.1 (1.59 s vs 1.86 s numpy: the Arrow text
    # transfer costs more than the fold saves at 5k docs); the
    # bit-exact numpy pass (test_numpy_backends.py) stays selectable
    # for corpora where the ~4.4 ms/doc interpreted fold dominates.
    if sig_backend is None:
        sig_backend = "jvm"
    if sig_backend == "numpy":
        sigs = _simhash_sigs_numpy(
            spark, _fanout(spark, table(spark, sf_dir, "documents"))
        )
    else:
        sigs = _fanout(spark, table(spark, sf_dir, "documents")).select(
            "doc_id", sig.alias("sig")
        )
    bands = sigs.select(
        "doc_id",
        # The 64-bit signature rides as two 32-bit longs (conv of a full
        # 64-char bitstring would overflow a signed long): hamming is
        # two bit_count(xor)s, band segments are shift+mask.
        F.conv(F.substring("sig", 1, 32), 2, 10).cast("long").alias("hi"),
        F.conv(F.substring("sig", 33, 32), 2, 10).cast("long").alias("lo"),
        F.posexplode(
            F.array(
                *[
                    F.substring("sig", 1 + SIMHASH_BAND * b, SIMHASH_BAND)
                    for b in range(SIMHASH_BITS // SIMHASH_BAND)
                ]
            )
        ).alias("band", "key"),
    )
    # Pairs via one aggregation (same rationale as q41: a band self-join
    # would run the 64-fold signature computation twice).  Structs sort
    # by field order, so array_sort in _chunk_buckets orders members by
    # doc_id and generated pairs are (lower, higher).
    bucketed = bands.groupBy("band", "key").agg(
        F.collect_list(F.struct("doc_id", "hi", "lo")).alias("ids")
    ).filter(F.size("ids") >= 2)
    pair_structs = blocking.chunk_pair_structs()

    def seg(side: str, k: int) -> Column:
        half = F.col(f"p.{side}.hi") if k < 2 else F.col(f"p.{side}.lo")
        shifted = F.shiftright(half, 16) if k % 2 == 0 else half
        return shifted.bitwiseAND(F.lit(0xFFFF))

    first_match = F.lit(True)
    for k in range(SIMHASH_BITS // SIMHASH_BAND):
        first_match = first_match & (
            (F.col("band") <= k) | (seg("a", k) != seg("b", k))
        )
    hamming = F.bit_count(
        F.col("p.a.hi").bitwiseXOR(F.col("p.b.hi"))
    ) + F.bit_count(F.col("p.a.lo").bitwiseXOR(F.col("p.b.lo")))
    chunked = _spread_small(
        spark,
        _chunk_buckets(bucketed, "q42_dedup_simhash", "ids"),
        cached_count(table(spark, sf_dir, "documents"), f"{sf_dir}/documents"),
    )
    return (
        chunked
        .select("band", F.explode(pair_structs).alias("p"))
        .filter(first_match & (hamming <= HAMMING_T))
        .select(
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.b.doc_id").alias("doc_b"),
            hamming.cast("long").alias("hamming"),
        )
    )


# ---------------------------------------------------------------------------
# q43 — exact n-gram Jaccard (shared-shingle blocking)
# ---------------------------------------------------------------------------


@query(
    "q43_ngram_jaccard",
    oracle=f"""
    WITH docs AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
    sizes AS (SELECT doc_id, len(sh) AS n FROM docs),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           (ROUND(i * 1.0 / (sa.n + sb.n - i), 6) + 0.0) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE i * 1.0 / (sa.n + sb.n - i) >= {JACCARD_T}
    """,
)
def q43_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-5-gram Jaccard ≥ 0.5 via shared-shingle blocking.

    Pairs materialize only for docs sharing ≥1 shingle, then |A∩B| is
    the number of posting lists a pair co-occurs in (shingles are
    distinct per doc) and |A∪B| = |A|+|B|−|A∩B| — set algebra instead
    of a cross join.  At 100 TB the risk is frequent-shingle skew: one
    boilerplate shingle's posting list going quadratic in a single join
    key (VERDICT r6 ask #3).  Hot postings are therefore
    CHUNK-DISTRIBUTED via ``blocking.chunk_buckets`` — pair generation
    over an oversized posting list spreads across ≤ cap²-sized tasks
    with ZERO recall loss and the fan-out observable under
    ``q43_ngram_jaccard`` counters (the q42/q91 machinery; no oracle
    mirror needed, the exact pair multiset is unchanged).  The q41 LSH
    path remains the cheaper scale route when approximate recall is
    acceptable; this is the exact reference semantics.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents")).select(
        "doc_id", _shingles(F.col("text")).alias("sh")
    )
    ex = docs.select("doc_id", F.explode("sh").alias("s"))
    sizes = docs.select("doc_id", F.size("sh").alias("n"))
    postings = ex.groupBy("s").agg(
        F.collect_list("doc_id").alias("ids")
    ).filter(F.size("ids") >= 2)
    inter = (
        blocking.chunk_buckets(postings, "q43_ngram_jaccard", "ids")
        .select(F.explode(blocking.chunk_pair_structs()).alias("p"))
        .groupBy(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .agg(F.count("*").alias("i"))
    )
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .filter(jac >= JACCARD_T)
        .select("doc_a", "doc_b", dec(jac, 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# q44 — embedding-cosine near-dup (label-blocked)
# ---------------------------------------------------------------------------

COS_T = 0.4


@query(
    "q44_embedding_cosine_neardup",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           (ROUND({_COS_SQL.format(a='a.embedding', b='b.embedding')}, 6) + 0.0) AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_COS_SQL.format(a='a.embedding', b='b.embedding')} >= {COS_T}
    """,
)
def q44_embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: cosine ≥ 0.4 within a coarse partition.

    Blocking key = ``label`` (an IVF-style cluster assignment), so the
    pair join is per-partition, not all-pairs.  Cosine runs JVM-side
    (zip_with + aggregate in double) — bit-compatible with the oracle's
    list_cosine_similarity over DOUBLE[].  At 100 TB: partitions are
    centroid assignments from a coarse quantizer; skewed clusters split
    by AQE or secondary salting.
    """
    emb = _fanout(spark, table(spark, sf_dir, "embeddings"))
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("label"), F.col("embedding").alias("ea")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("label"), F.col("embedding").alias("eb")
    )
    cos = _cosine(F.col("ea"), F.col("eb"))
    return (
        a.join(b, ["label"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("c", cos)
        .filter(F.col("c") >= COS_T)
        .select("vec_a", "vec_b", dec(F.col("c"), 6).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# q45 / q46 — similarity search (top-k ANN)
# ---------------------------------------------------------------------------

TOPK = 10


N_QUERIES = 20  # fixed query-set size — does NOT scale with the corpus


def ann_pair_scores(
    spark: SparkSession, sf_dir: str, score_backend: str | None = None
) -> DataFrame:
    """Every (q_id < N_QUERIES, neighbor_id ≠ q_id) pair scored with the
    exact rounded cosine — (q_id, neighbor_id, cos_sim).  THE one
    scoring pass all five ANN audit frames share (optimization r13,
    guide §1.2): q45 ranks it directly, and the method retrievals can
    join their candidate ids against it (``pair_scores=``) instead of
    each re-scoring its own candidate subset — every method's candidate
    set is a subset of this table by construction (q_id < N_QUERIES,
    neighbor ≠ q).  At 100 TB this is exactly the work the exact
    baseline already pays (N_QUERIES is fixed), so sharing it adds no
    scale cost."""
    emb = _fanout(spark, table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    raw_pairs = F.broadcast(q).join(emb, F.col("vec_id") != F.col("q_id"))
    # scoring backend: "jvm" HOF default — q45's pair volume (N_QUERIES
    # × n) is small enough that the Arrow roundtrip costs more than the
    # interpreted cosine saves (interleaved A/B at sf0.1: jvm 0.48 s vs
    # numpy 0.62 s); the bit-equal "numpy" path stays selectable for
    # larger regimes (see the numpy-backends section comment)
    if score_backend is None:
        score_backend = "jvm"
    if score_backend == "numpy":
        return _cos_pairs_numpy(
            spark,
            raw_pairs.select(
                "q_id", F.col("vec_id").alias("neighbor_id"), "qe", "embedding"
            ),
            ("q_id", "neighbor_id"),
            "qe",
            "embedding",
        ).select("q_id", "neighbor_id", dec(F.col("cos_raw"), 6).alias("cos_sim"))
    return raw_pairs.select(
        "q_id",
        F.col("vec_id").alias("neighbor_id"),
        dec(_cosine(F.col("qe"), F.col("embedding")), 6).alias("cos_sim"),
    )



@query(
    "q45_ann_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
    p AS (
      SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id,
             (ROUND({_COS_SQL.format(a='q.embedding', b='e.embedding')}, 6) + 0.0) AS cos_sim
      FROM q JOIN embeddings e ON e.vec_id <> q.vec_id),
    r AS (
      SELECT q_id, neighbor_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
      FROM p)
    SELECT q_id, neighbor_id, cos_sim, rank FROM r WHERE rank <= {TOPK}
    """,
)
def q45_ann_topk_bruteforce(
    spark: SparkSession,
    sf_dir: str,
    score_backend: str | None = None,
    pair_scores: DataFrame | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for a FIXED query set (20 ids).

    The query set has constant cardinality regardless of corpus size —
    that is what justifies the broadcast (a %-of-corpus query set would
    re-create the forced-broadcast-of-a-scaled-table antipattern); the
    corpus streams through map tasks — one pass, no corpus shuffle,
    then a per-query top-k window on (query, candidate) rows.  Ranking
    uses the *rounded* cosine with a vec_id tie-break so the k-boundary
    is deterministic across engines.  At 100 TB this is the
    exact-scoring baseline; q46 is the scale path.

    ``pair_scores`` (``ann_pair_scores``, usually persisted) injects a
    pre-scored all-pairs table shared with the other audit frames —
    identical pair construction and cosine expression, so the result
    is unchanged (route-equality test); None keeps the self-contained
    plan the driver gate runs.
    """
    pairs = (
        pair_scores
        if pair_scores is not None
        else ann_pair_scores(spark, sf_dir, score_backend)
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )


LSH_SIGN_BITS = 4  # bits per hash table (2^4 = 16 buckets)
LSH_TABLES = 8  # hash tables over disjoint dim groups (dims 1..32)
LSH_K = 3  # neighbors returned per vector
# Multi-probe (VERDICT r5 ask #5): each vector ALSO probes, as a
# query, the LSH_SIGN_BITS buckets at Hamming distance 1 from its own
# (one sign bit flipped) in every table — the standard recall lever
# for sign-LSH (Lv et al., VLDB'07): a missed true neighbor usually
# differs in exactly one near-boundary sign.  Probe 0 is the identity;
# the data side still indexes each vector once, so the candidate join
# stays (t, bucket)-keyed with a 1+LSH_SIGN_BITS-way query fan-out.
LSH_PROBES = 1 + LSH_SIGN_BITS


def lsh_sign_bucket(t: int, flip: int = 0) -> Column:
    """q46's sign-bucket key for hash table ``t`` (dims are 1-indexed
    groups of LSH_SIGN_BITS), with probe ``flip`` > 0 flipping that
    bit — THE single definition both the batch query and the streaming
    SignLshIndexMaintainer hash with, so the maintained index can
    never silently diverge from the batch bucketing.  Reads the
    column named ``embedding``."""
    bits = []
    for i in range(1, LSH_SIGN_BITS + 1):
        cond = F.element_at("embedding", t * LSH_SIGN_BITS + i) >= 0
        if i == flip:
            cond = ~cond
        bits.append(F.when(cond, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _bucket_sql(tbl: str, t: int, flip: int = 0) -> str:
    return " || ".join(
        "CASE WHEN {e} {op} 0 THEN '1' ELSE '0' END".format(
            e=f"{tbl}.embedding[{t * LSH_SIGN_BITS + i}]",
            op="<" if i == flip else ">=",
        )
        for i in range(1, LSH_SIGN_BITS + 1)
    )


def _q46_oracle() -> str:
    band_selects = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {_bucket_sql('embeddings', t)} AS bucket FROM embeddings"
        for t in range(LSH_TABLES)
    )
    probe_selects = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {_bucket_sql('embeddings', t, p)} AS bucket FROM embeddings"
        for t in range(LSH_TABLES)
        for p in range(LSH_PROBES)
    )
    return f"""
    WITH b AS ({band_selects}),
    pr AS ({probe_selects}),
    cand AS (
      SELECT DISTINCT a.vec_id AS q_id, c.vec_id AS neighbor_id
      FROM pr a JOIN b c ON a.t = c.t AND a.bucket = c.bucket
       AND a.vec_id <> c.vec_id),
    p AS (
      SELECT cand.q_id, cand.neighbor_id,
             (ROUND({_COS_SQL.format(a='qa.embedding', b='qc.embedding')}, 6) + 0.0) AS cos_sim
      FROM cand
      JOIN embeddings qa ON qa.vec_id = cand.q_id
      JOIN embeddings qc ON qc.vec_id = cand.neighbor_id),
    r AS (
      SELECT q_id, neighbor_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
      FROM p)
    SELECT q_id, neighbor_id, cos_sim, rank FROM r WHERE rank <= {LSH_K}
    """


@query("q46_ann_lsh_bucketed", oracle=_q46_oracle())
def q46_ann_lsh_bucketed(
    spark: SparkSession,
    sf_dir: str,
    score_backend: str | None = None,
    pair_scores: DataFrame | None = None,
) -> DataFrame:
    """Multi-table multi-probe LSH ANN: LSH_TABLES hash tables, each
    hashing a DISJOINT group of LSH_SIGN_BITS dimensions into sign
    buckets; a vector's top-LSH_K neighbors are searched within the
    union of its probed buckets across tables.  Two stacked recall
    levers, both deterministic: candidate union across independent
    tables (one 4-bit table: recall@3 ≈ 0.18 on the fixture; 8 tables:
    ≈ 0.73), and distance-1 multi-probe on the query side (each query
    also searches the LSH_SIGN_BITS buckets with one sign flipped —
    recall@3 ≈ 0.9+; near-isotropic synthetic vectors are sign-LSH's
    worst case, and a missed neighbor usually differs in one
    near-boundary sign).

    Scale shape: ONE posexplode per side emits the (table, bucket)
    keys — the signature pass runs once per side; the data side
    indexes each vector once and the query side fans out
    LSH_PROBES-fold, so the candidate equi-join stays keyed on the
    short (t, bucket) pair (AQE splits skewed buckets), pair ids are
    deduped BEFORE scoring so each surviving pair's cosine is computed
    once, and scoring re-joins the narrow (vec_id, embedding)
    projection on both sides.  Deterministic planes (no RNG) keep it
    oracle-checkable.

    ``pair_scores`` (``ann_pair_scores``) restricts the query side to
    q_id < N_QUERIES and swaps the candidate re-scoring for a
    (q_id, neighbor_id)-keyed join against the shared pre-scored pair
    table — same cosine expression over the same pairs, so the rows are
    identical on that query subset (the ann_audit_frames route); None
    keeps the self-contained all-queries plan the driver gate runs.
    """
    emb = table(spark, sf_dir, "embeddings")
    bucket = lsh_sign_bucket  # the shared definition (see its docstring)

    fanned = _fanout(spark, emb)
    b = fanned.select(
        "vec_id",
        F.posexplode(F.array(*[bucket(t) for t in range(LSH_TABLES)])).alias(
            "t", "bucket"
        ),
    )
    probes = F.array(
        *[
            F.struct(F.lit(t).alias("t"), bucket(t, p).alias("bucket"))
            for t in range(LSH_TABLES)
            for p in range(LSH_PROBES)
        ]
    )
    qside = (
        fanned if pair_scores is None else fanned.filter(F.col("vec_id") < N_QUERIES)
    )
    a = qside.select(
        F.col("vec_id").alias("q_id"), F.explode(probes).alias("tb")
    ).select("q_id", F.col("tb.t").alias("t"), F.col("tb.bucket").alias("bucket"))
    cand = (
        a.join(b, ["t", "bucket"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    if pair_scores is not None:
        # candidate ids look their cosine up in the shared pre-scored
        # pair table instead of re-joining embeddings and re-scoring
        pairs = cand.join(pair_scores, ["q_id", "neighbor_id"])
    else:
        vec = emb.select("vec_id", "embedding")
        joined = cand.join(
            vec.select(
                F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
            ),
            "q_id",
        ).join(
            vec.select(
                F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne")
            ),
            "neighbor_id",
        )
        # pair scoring: numpy Arrow pass by default (bit-equal raw
        # doubles; 6-dp rounding stays in the JVM), "jvm" HOF fallback
        if score_backend is None:
            score_backend = "numpy" if _numpy_available() else "jvm"
        if score_backend == "numpy":
            pairs = _cos_pairs_numpy(
                spark, joined, ("q_id", "neighbor_id"), "qe", "ne"
            ).select(
                "q_id", "neighbor_id", dec(F.col("cos_raw"), 6).alias("cos_sim")
            )
        else:
            pairs = joined.select(
                "q_id",
                "neighbor_id",
                dec(_cosine(F.col("qe"), F.col("ne")), 6).alias("cos_sim"),
            )
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= LSH_K)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# q47 — IVF-partitioned ANN (coarse quantizer + cell probing)
# ---------------------------------------------------------------------------

# Coarse-quantizer floor values.  The IVF family's ACTUAL parameters
# scale with the corpus via ``ann_params`` (sqrt-n centroids — the
# standard IVF sizing rule — with a fixed probe fraction and a refine
# depth proportional to n), because fixed parameters are exactly what
# made ivfpq recall drift below its floor when the corpus grew 4x
# (BENCH_r03: 0.84 at sf0.1 vs the 0.85 fixture floor).  The floors
# keep tiny fixtures away from degenerate quantizers.  The probe RATIO
# (1/2) looks high only because the synthetic vectors are
# near-isotropic — with a trained codebook on real clustered
# embeddings the same recall needs a far smaller nprobe/cells ratio
# (and production runs 2^10..2^16 cells).  The nprobe knob's measured
# trade-off is in BENCH ann_recall.ivf_nprobe.
N_CENTROIDS = 16  # floor; also the legacy fixed-k default for q96's quantizer
NPROBE = 8  # floor
ANN_MIN_REFINE = 100  # floor for the IVF-PQ exact-refine shortlist depth
IVF_K = 5


def ann_params(n: int) -> tuple[int, int, int]:
    """(n_centroids, nprobe, refine) for a corpus of ``n`` vectors.

    sqrt-n centroids keeps cells ~constant-sized as the corpus grows
    (so per-cell candidate work is flat); nprobe holds the probe
    FRACTION at 1/2 (untrained-codebook regime — see the constant-block
    comment); refine scales as n/20 so the exact-rescore shortlist
    keeps covering the same fraction of the corpus the ADC shortlist
    was drawn from.  The identical arithmetic runs in SQL inside
    ``_ANN_PARAMS_SQL`` — DuckDB and Python both evaluate FLOOR(SQRT)
    and CEIL on the same IEEE doubles, so both engines always agree on
    the derived parameters.
    """
    n_cent = max(N_CENTROIDS, int(math.floor(math.sqrt(n))))
    nprobe = max(NPROBE, math.ceil(n_cent / 2.0))
    refine = max(ANN_MIN_REFINE, math.ceil(n / 20.0))
    return n_cent, nprobe, refine


#: CTE fragment computing the same three parameters inside the oracle —
#: splice right after WITH.  ``ann_p`` exposes n_cent / nprobe / refine.
_ANN_PARAMS_SQL = f"""ann_n AS (SELECT COUNT(*) AS n FROM embeddings),
    ann_c AS (SELECT GREATEST({N_CENTROIDS}, CAST(FLOOR(SQRT(n)) AS BIGINT)) AS n_cent, n
              FROM ann_n),
    ann_p AS (SELECT n_cent,
                     GREATEST({NPROBE}, CAST(CEIL(n_cent / 2.0) AS BIGINT)) AS nprobe,
                     GREATEST({ANN_MIN_REFINE}, CAST(CEIL(n / 20.0) AS BIGINT)) AS refine
              FROM ann_c)"""


_CORPUS_N_CACHE: dict[str, int] = {}


def corpus_size(spark: SparkSession, sf_dir: str) -> int:
    """Row count of the embeddings corpus — the scale signal the ANN
    parameter rules key on.  One metadata-cheap count per (process,
    sf_dir); cached because every IVF-family query re-derives it."""
    if sf_dir not in _CORPUS_N_CACHE:
        _CORPUS_N_CACHE[sf_dir] = table(spark, sf_dir, "embeddings").count()
    return _CORPUS_N_CACHE[sf_dir]


def _q47_oracle() -> str:
    return f"""
    WITH {_ANN_PARAMS_SQL},
    cent AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
                  WHERE vec_id < (SELECT n_cent FROM ann_p)),
    scored AS (
      SELECT e.vec_id, e.embedding, c.cid,
             {_COS_SQL.format(a='e.embedding', b='c.ce')} AS cs
      FROM embeddings e CROSS JOIN cent c),
    cells AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT vec_id, embedding, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
        FROM scored) t
      WHERE rn = 1),
    probes AS (
      SELECT vec_id AS q_id, embedding AS qe, cid AS cell FROM (
        SELECT vec_id, embedding, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
        FROM scored WHERE vec_id < {N_QUERIES}) t
      WHERE rn <= (SELECT nprobe FROM ann_p)),
    p AS (
      SELECT pr.q_id, ce.vec_id AS neighbor_id,
             (ROUND({_COS_SQL.format(a='pr.qe', b='ce.embedding')}, 6) + 0.0) AS cos_sim
      FROM probes pr JOIN cells ce ON pr.cell = ce.cell AND ce.vec_id <> pr.q_id),
    r AS (
      SELECT q_id, neighbor_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
      FROM p)
    SELECT q_id, neighbor_id, cos_sim, rank FROM r WHERE rank <= {IVF_K}
    """


def _ivf_centroids(corpus: DataFrame, n_centroids: int = N_CENTROIDS) -> DataFrame:
    """The coarse quantizer as ONE broadcastable row: collect_list of
    (cid, vector) structs over the first ``n_centroids`` corpus vectors
    (a trained KMeans codebook in production — deterministic ids keep it
    oracle-checkable)."""
    return (
        corpus.filter(F.col("vec_id") < n_centroids)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
        .agg(F.collect_list(F.struct("cid", "ce")).alias("cents"))
    )


def ivf_cell_assignment(
    spark: SparkSession,
    sf_dir: str,
    n_centroids: int = N_CENTROIDS,
    backend: str | None = None,
) -> DataFrame:
    """Map-only nearest-centroid assignment of the whole corpus:
    (vec_id, embedding, cell).  NPROBE-independent — ``ivf_recall_sweep``
    persists ONE assignment and reuses it across every probe setting.
    ``n_centroids`` is THE scale knob: production grows it with the
    corpus so cells stay ~constant-sized (see q96).

    ``backend`` picks the argmax evaluator: "numpy" is one Arrow pass
    with the n×k cosine grid vectorized per batch, bit-equal to the
    "jvm" HOF by construction (tests/test_numpy_backends.py); "jvm"
    (default) keeps the pure-expression plan the oracle mirrors — at
    the bench SF the two are a wash inside q47 (interleaved A/B:
    1.01 s vs 1.04 s), so the default preserves the shared-definition
    plan the streaming IvfIndexMaintainer parity-checks against; the
    numpy path is the scale lever when n×k grows."""
    if backend is None:
        backend = "jvm"
    corpus = table(spark, sf_dir, "embeddings")
    if backend == "numpy":
        return _nearest_centroid_numpy(
            spark,
            _fanout(spark, corpus),
            _collect_centroids(corpus, n_centroids, "ivf_quantizer"),
            carry=("vec_id",),
        )
    cent = _ivf_centroids(corpus, n_centroids)

    def best_cell(emb: Column) -> Column:
        # argmax over (cosine, -cid): highest similarity, ties → lowest cid.
        top = F.array_max(
            F.transform(
                F.col("cents"),
                lambda c: F.struct(
                    _cosine(emb, c["ce"]).alias("cs"), (-c["cid"]).alias("ncid")
                ),
            )
        )
        return -top["ncid"]

    return (
        _fanout(spark, corpus)
        .crossJoin(F.broadcast(cent))
        .select("vec_id", "embedding", best_cell(F.col("embedding")).alias("cell"))
    )


def _nearest_id(structs: Column, emb: Column, id_field: str, vec_field: str) -> Column:
    """argmax over (cosine, -id): nearest centroid in ``structs``, ties
    to the lowest id — the shared primitive of both assignment passes."""
    top = F.array_max(
        F.transform(
            structs,
            lambda c: F.struct(
                _cosine(emb, c[vec_field]).alias("cs"), (-c[id_field]).alias("nid")
            ),
        )
    )
    return -top["nid"]


def ivf_cell_assignment_2level(
    spark: SparkSession,
    sf_dir: str,
    n_centroids: int = N_CENTROIDS,
    n_top: int | None = None,
) -> DataFrame:
    """Hierarchical nearest-centroid assignment: route each vector
    through ~sqrt(k) TOP centroids, then compare only against the
    sub-centroids of that top cell — O(2*sqrt(k)) cosines per vector
    instead of the flat pass's O(k).

    This is the production answer to the flat assignment's scaling
    wall: SemDeDup's regime grows k with the corpus (constant cell
    size), which makes flat assignment O(n*k) ~ O(n^2/cell) — the
    10x-stress harness MEASURES that blowup and this variant removing
    it.  The routing is approximate (a vector whose true nearest
    sub-centroid lives under a different top cell gets the best within
    its routed cell — the standard IMI/HNSW-coarse trade-off), which
    is why the oracle-checked q96/q47 default stays flat at fixture
    scale and the harness flips ``two_level`` only for the scale runs.

    Plan shape: two tiny broadcasts (top list, per-top sub-centroid
    lists) + ONE corpus map pass — no corpus shuffle, same contract as
    ``ivf_cell_assignment``.
    """
    if n_top is None:
        n_top = max(1, math.isqrt(n_centroids))
    corpus = table(spark, sf_dir, "embeddings")
    cent_rows = corpus.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    tops = (
        cent_rows.filter(F.col("cid") < n_top)
        .select(F.col("cid").alias("tid"), F.col("ce").alias("te"))
        .agg(F.collect_list(F.struct("tid", "te")).alias("tops"))
    )
    # centroid -> its top cell (k x sqrt(k) grid — constant-bounded)
    c_by_top = (
        cent_rows.crossJoin(F.broadcast(tops))
        .select(
            "cid",
            "ce",
            _nearest_id(F.col("tops"), F.col("ce"), "tid", "te").alias("tid"),
        )
        .groupBy("tid")
        .agg(F.collect_list(F.struct("cid", "ce")).alias("cents"))
    )
    routed = (
        _fanout(spark, corpus)
        .crossJoin(F.broadcast(tops))
        .select(
            "vec_id",
            "embedding",
            _nearest_id(F.col("tops"), F.col("embedding"), "tid", "te").alias("tid"),
        )
    )
    return routed.join(F.broadcast(c_by_top), "tid").select(
        "vec_id",
        "embedding",
        _nearest_id(F.col("cents"), F.col("embedding"), "cid", "ce").alias("cell"),
    )


@query("q47_ann_ivf", oracle=_q47_oracle())
def q47_ann_ivf(
    spark: SparkSession,
    sf_dir: str,
    nprobe: int | None = None,
    cells: DataFrame | None = None,
    score_backend: str | None = None,
    pair_scores: DataFrame | None = None,
) -> DataFrame:
    """IVF top-k ANN: a fixed coarse quantizer partitions the corpus into
    cells; each query probes only its NPROBE nearest cells.

    The quantizer here is the first N_CENTROIDS corpus vectors (a trained
    KMeans codebook in production — deterministic ids keep it
    oracle-checkable).  The centroid set is collapsed to ONE row
    (collect_list of (cid, vector) structs) and broadcast, so cell
    assignment is a map-only pass over the corpus: per row, an
    ``array_max`` over struct(cos, -cid) picks the nearest centroid with a
    smallest-cid tie-break — no corpus shuffle, no window.  Candidate
    scoring shuffles nothing either: the (q_id, cell) probe list
    (N_QUERIES × NPROBE rows) broadcast-hash-joins the assigned corpus on
    ``cell``, so each corpus row is scored against only the queries
    probing its cell — candidates shrink by ~NPROBE/N_CENTROIDS vs the
    q45 exact baseline.  The only shuffle is the final per-query top-k
    window over candidate rows.  At 100 TB: more centroids (2^10–2^16
    cells) + a real trained codebook; the structure is unchanged.
    Ranking uses the rounded cosine with a neighbor_id tie-break so the
    k-boundary is deterministic across engines (cf. q45).

    ``cells`` may carry a precomputed (persisted) cell assignment from
    ``ivf_cell_assignment`` — the sweep path (it must be built with the
    same ``ann_params`` quantizer size); None recomputes it.  ``nprobe``
    None resolves via ``ann_params(corpus_size)``.
    """
    corpus = table(spark, sf_dir, "embeddings")
    n_cent, auto_nprobe, _ = ann_params(corpus_size(spark, sf_dir))
    if nprobe is None:
        nprobe = auto_nprobe
    cent = _ivf_centroids(corpus, n_cent)
    if cells is None:
        cells = ivf_cell_assignment(spark, sf_dir, n_cent)

    # Probe list: per query, the NPROBE nearest cells by (cos desc, cid).
    ranked = F.array_sort(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                (-_cosine(F.col("embedding"), c["ce"])).alias("ncs"),
                c["cid"].alias("cid"),
            ),
        )
    )
    probes = (
        corpus.filter(F.col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(cent))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("qe"),
            F.explode(
                F.transform(F.slice(ranked, 1, nprobe), lambda s: s["cid"])
            ).alias("cell"),
        )
    )

    cand = cells.join(F.broadcast(probes), "cell").filter(
        F.col("vec_id") != F.col("q_id")
    )
    # candidate scoring: "jvm" HOF default — q47's candidate volume
    # (~N_QUERIES × nprobe/n_cent of the corpus) is small enough at the
    # bench SF that the Arrow roundtrip outweighs the interpreted cosine
    # (interleaved A/B at sf0.1: jvm 1.03 s vs numpy 1.23 s); the
    # bit-equal "numpy" path stays selectable for larger regimes.
    # ``pair_scores`` (ann_pair_scores — the audit-frames route) swaps
    # the re-scoring for a keyed lookup in the shared pre-scored table.
    if pair_scores is not None:
        scored = cand.select(
            "q_id", F.col("vec_id").alias("neighbor_id")
        ).join(pair_scores, ["q_id", "neighbor_id"])
    else:
        if score_backend is None:
            score_backend = "jvm"
        if score_backend == "numpy":
            scored = _cos_pairs_numpy(
                spark,
                cand.select(
                    "q_id", F.col("vec_id").alias("neighbor_id"), "qe", "embedding"
                ),
                ("q_id", "neighbor_id"),
                "qe",
                "embedding",
            ).select(
                "q_id", "neighbor_id", dec(F.col("cos_raw"), 6).alias("cos_sim")
            )
        else:
            scored = cand.select(
                "q_id",
                F.col("vec_id").alias("neighbor_id"),
                dec(_cosine(F.col("qe"), F.col("embedding")), 6).alias("cos_sim"),
            )
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= IVF_K)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# q50–q53 — text analysis
# ---------------------------------------------------------------------------

STOPWORDS = ("the", "a", "of", "and", "to", "in")


@query(
    "q50_text_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS nw,
             length(replace(text, ' ', '')) AS nc,
             len(list_filter(string_split(text, ' '),
                 w -> list_contains({list(STOPWORDS)!r}, w))) AS nstop,
             len(regexp_extract_all(text, '[0-9]')) AS ndig,
             length(text) AS nlen
      FROM documents)
    SELECT doc_id, lang,
           CAST(nw AS BIGINT) AS n_words,
           (ROUND(nc * 1.0 / nw, 4) + 0.0) AS avg_word_len,
           (ROUND(nstop * 1.0 / nw, 4) + 0.0) AS stop_ratio,
           (ROUND(ndig * 1.0 / nlen, 4) + 0.0) AS digit_ratio,
           (ROUND(LEAST(1.0, nw / 50.0) * (1 - nstop * 1.0 / nw), 4) + 0.0) AS quality
    FROM t
    """,
)
def q50_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring: token count, mean token length,
    stopword ratio, digit ratio, and a composite quality score — all
    JVM-side string/array/regexp functions, map-only (zero shuffles)."""
    docs = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    nw = F.size(words)
    nc = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    nstop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    ndig = F.regexp_count(F.col("text"), F.lit("[0-9]"))
    nlen = F.length("text")
    return docs.select(
        "doc_id",
        "lang",
        nw.cast("long").alias("n_words"),
        dec(nc / nw, 4).alias("avg_word_len"),
        dec(nstop / nw, 4).alias("stop_ratio"),
        dec(ndig / nlen, 4).alias("digit_ratio"),
        dec(F.least(F.lit(1.0), nw / F.lit(50.0)) * (1 - nstop / nw), 4).alias("quality"),
    )


LANG_MARKERS = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "que", "y"),
}


def _q51_oracle() -> str:
    scores = ", ".join(
        f"CAST(len(list_filter(string_split(text, ' '), "
        f"w -> list_contains({list(ms)!r}, w))) AS BIGINT) AS s_{lang}"
        for lang, ms in LANG_MARKERS.items()
    )
    return f"""
    WITH s AS (SELECT doc_id, lang, {scores} FROM documents)
    SELECT doc_id, lang, s_en, s_de, s_fr, s_es,
           CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                WHEN s_fr >= s_es THEN 'fr'
                ELSE 'es' END AS pred_lang
    FROM s
    """


@query("q51_lang_id", oracle=_q51_oracle())
def q51_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: per-language stopword hit counts with a
    deterministic argmax chain (ties resolve en>de>fr>es).  A real
    deployment swaps the marker lists for char-n-gram profiles; the
    plumbing (map-only scoring, no shuffle) is identical."""
    docs = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")

    def marker_score(markers: tuple[str, ...]) -> Column:
        values = list(markers)  # closure, NOT a lambda default (see q41 note)
        return F.size(F.filter(words, lambda w: w.isin(*values))).cast("long")

    sc = {lang: marker_score(ms) for lang, ms in LANG_MARKERS.items()}
    pred = (
        F.when(
            (sc["en"] >= sc["de"]) & (sc["en"] >= sc["fr"]) & (sc["en"] >= sc["es"]), "en"
        )
        .when((sc["de"] >= sc["fr"]) & (sc["de"] >= sc["es"]), "de")
        .when(sc["fr"] >= sc["es"], "fr")
        .otherwise("es")
    )
    return docs.select(
        "doc_id",
        "lang",
        sc["en"].alias("s_en"),
        sc["de"].alias("s_de"),
        sc["fr"].alias("s_fr"),
        sc["es"].alias("s_es"),
        pred.alias("pred_lang"),
    )


@query(
    "q52_token_count",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[a-z0-9]+'))) AS BIGINT) AS re_tokens,
           (ROUND(AVG(len(string_split(text, ' '))), 4) + 0.0) AS avg_tokens
    FROM documents GROUP BY lang
    """,
)
def q52_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per language: whitespace tokens and a
    BPE-ish regex token count ([a-z0-9]+ runs), partial-aggregated
    map-side before the single shuffle on lang."""
    docs = table(spark, sf_dir, "documents")
    ws = F.size(F.split(F.col("text"), " "))
    re_t = F.regexp_count(F.col("text"), F.lit("[a-z0-9]+"))
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(ws).cast("long").alias("ws_tokens"),
        F.sum(re_t).cast("long").alias("re_tokens"),
        dec(F.avg(ws), 4).alias("avg_tokens"),
    )


FP_K = 4


@query(
    "q53_doc_fingerprint",
    oracle=f"""
    WITH docs AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents)
    SELECT doc_id,
           array_to_string((list_sort(list_transform(sh, s -> md5(s))))[1:{FP_K}], '|') AS fingerprint
    FROM docs
    """,
)
def q53_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k document fingerprint: the k lexicographically-smallest
    md5(shingle) digests, joined with '|'.  This is a bottom-k MinHash
    sketch (the md5 ordering is the random permutation) — docs sharing a
    fingerprint are near-dup candidates; constant-width output per doc
    regardless of document size.  Map-only, no shuffle."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", _shingles(F.col("text")).alias("sh")
    )
    fp = F.concat_ws(
        "|", F.slice(F.array_sort(F.transform(F.col("sh"), lambda s: F.md5(s))), 1, FP_K)
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


# ---------------------------------------------------------------------------
# q62–q64 — vocabulary, TF-IDF, label centroids
# ---------------------------------------------------------------------------

VOCAB_K = 100


@query(
    "q62_vocab_topk",
    oracle=f"""
    WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    SELECT token, COUNT(*) AS n FROM t GROUP BY token
    ORDER BY n DESC, token LIMIT {VOCAB_K}
    """,
)
def q62_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary heavy hitters: the top-k tokens by frequency —
    the first pass of vocab/BPE construction.  explode → hash aggregate
    (map-side partial combine collapses each partition's token counts
    before the single shuffle) → top-k as TakeOrderedAndProject (per-
    partition heap + driver merge, never a global sort).  Ties break on
    the token so the k-cut is deterministic across engines."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(VOCAB_K)
    )


TFIDF_K = 3


@query(
    "q63_tfidf_top_terms",
    oracle=f"""
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n FROM documents),
    s AS (
      SELECT tf.doc_id, tf.term,
             (ROUND((tf.tf * 1.0 / SUM(tf.tf) OVER (PARTITION BY tf.doc_id))
                    * ln((n.n * 1.0) / df.df), 6) + 0.0) AS tfidf
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
    r AS (
      SELECT doc_id, term, tfidf,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, term) AS BIGINT) AS rank
      FROM s)
    SELECT doc_id, term, tfidf, rank FROM r WHERE rank <= {TFIDF_K}
    """,
)
def q63_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 terms by TF-IDF (keyword extraction for corpus
    curation).  One explode → (doc, term) hash aggregate; doc length via
    a window SUM over the same doc partitioning; document frequency is a
    second aggregate of the (doc, term) table (never re-reads raw text);
    N joins in as a broadcast 1-row aggregate, so the plan has no
    driver-side count.  Ranking is over the ROUNDED score with a term
    tie-break — ulp differences between the engines' ln() cannot move
    the k-cut.  Shuffles: terms (1), doc window (2), df + join-back
    (3, AQE-broadcast), final per-doc window (4)."""
    docs = table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dl = F.sum("tf").over(W.partitionBy("doc_id"))
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_tbl = docs.agg(F.count("*").alias("n"))
    scored = (
        tf.withColumn("dl", dl)
        .join(df_tbl, "term")
        .crossJoin(F.broadcast(n_tbl))
        .select(
            "doc_id",
            "term",
            dec(
                (F.col("tf") * F.lit(1.0) / F.col("dl"))
                * F.log((F.col("n") * F.lit(1.0)) / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TFIDF_K)
        .select("doc_id", "term", "tfidf", "rank")
    )


@query(
    "q64_label_centroids",
    oracle="""
    WITH u AS (
      SELECT label, us.u.pos AS pos, us.u.v AS v FROM (
        SELECT label,
               unnest(list_transform(embedding,
                 (x, i) -> {'pos': i - 1, 'v': x::DOUBLE})) AS u
        FROM embeddings) us)
    SELECT label, CAST(pos AS BIGINT) AS pos,
           (ROUND(SUM(v) / COUNT(*), 6) + 0.0) AS mean_v,
           COUNT(*) AS n_vectors
    FROM u GROUP BY label, pos
    """,
)
def q64_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid (element-wise mean), one output row
    per (label, dimension) — codebook training / cluster drift stats.
    posexplode → ONE hash aggregate on (label, pos): the scale-correct
    shape — collect_list-of-arrays per label would bound a whole label's
    vectors in one task's memory; (label, pos) cells never grow past
    #labels × dim groups, and partial aggregation collapses each
    partition before the shuffle."""
    emb = table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", F.col("pos").cast("long").alias("pos"))
        .agg(
            dec(F.sum(F.col("v").cast("double")) / F.count("*"), 6).alias("mean_v"),
            F.count("*").alias("n_vectors"),
        )
    )


# ---------------------------------------------------------------------------
# q65–q66 — corpus contamination / split leakage
# ---------------------------------------------------------------------------

# q53's bottom-k fingerprint as the near-dup group key: exact-dup
# grouping (sha2(text)) is vacuous on corpora whose duplicates are
# near-dups, which is the realistic contamination mode.
_FP_SQL = (
    f"array_to_string((list_sort(list_transform({_SHINGLES_SQL}, s -> md5(s))))"
    f"[1:{{k}}], '|')"
)


def _fingerprint(text: Column, k: int) -> Column:
    return F.concat_ws(
        "|", F.slice(F.array_sort(F.transform(_shingles(text), lambda s: F.md5(s))), 1, k)
    )


@query(
    "q65_cross_source_contamination",
    oracle=f"""
    WITH g AS (
      SELECT {_FP_SQL.format(k=FP_K)} AS fp, MIN(doc_id) AS first_doc,
             COUNT(DISTINCT source) AS n_sources, COUNT(*) AS n_docs
      FROM documents GROUP BY fp)
    SELECT first_doc, CAST(n_sources AS BIGINT) AS n_sources, n_docs
    FROM g WHERE n_sources > 1
    """,
)
def q65_cross_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination: near-dup documents (same q53 bottom-k
    fingerprint) appearing in more than one source — a benchmark leaked
    into a crawl, mirrored sites, boilerplate shared across crawls.  The
    shuffle key is the constant-width fingerprint, never the document;
    COUNT(DISTINCT source) is a partial-aggregated two-phase distinct,
    no extra corpus pass."""
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    return (
        docs.groupBy(_fingerprint(F.col("text"), FP_K).alias("fp"))
        .agg(
            F.min("doc_id").alias("first_doc"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.count("*").alias("n_docs"),
        )
        .filter(F.col("n_sources") > 1)
        .select("first_doc", "n_sources", "n_docs")
    )


SPLIT_MOD = 10  # doc_id-hash buckets; bucket 0 = eval, rest = train


@query(
    "q66_split_leakage",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, {_FP_SQL.format(k=FP_K)} AS fp,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % {SPLIT_MOD} = 0
                  THEN 'eval' ELSE 'train' END AS split
      FROM documents),
    g AS (
      SELECT fp, MIN(doc_id) AS first_doc,
             COUNT(DISTINCT split) AS n_splits, COUNT(*) AS n_copies
      FROM s GROUP BY fp)
    SELECT first_doc, n_copies FROM g WHERE n_splits = 2
    """,
)
def q66_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval leakage detection: near-dup groups (q53 fingerprint)
    with members on BOTH sides of the q58-style deterministic hash
    split — the check every training pipeline must run before an eval
    set is trusted.  One fingerprint-keyed aggregate over the corpus;
    the split label is computed map-side from the same md5 bucketing the
    sampler uses, so the split definition and the leakage check can
    never drift apart."""
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        % SPLIT_MOD
    )
    split = F.when(bucket == 0, F.lit("eval")).otherwise(F.lit("train"))
    return (
        docs.select("doc_id", F.col("text"), split.alias("split"))
        .groupBy(_fingerprint(F.col("text"), FP_K).alias("fp"))
        .agg(
            F.min("doc_id").alias("first_doc"),
            F.countDistinct("split").alias("n_splits"),
            F.count("*").alias("n_copies"),
        )
        .filter(F.col("n_splits") == 2)
        .select("first_doc", "n_copies")
    )


# ---------------------------------------------------------------------------
# q69 — dedup cluster resolution (connected components over candidate pairs)
# ---------------------------------------------------------------------------

ANCHOR_K = 4  # bottom-k md5(shingle) anchors emitted per document
CC_MAX_ITERS = 20  # label propagation rounds before declaring non-convergence


def _anchor_pair_candidates(docs: DataFrame, cap_name: str) -> DataFrame:
    """q69's bottom-{ANCHOR_K} MinHash anchor blocking as a reusable
    candidate generator: the distinct (doc_a < doc_b) pair frame of
    documents sharing ANY anchor, buckets capped through
    ``_cap_buckets`` under ``cap_name``'s observable counters.  The
    SQL twin is the docs/anch_raw/anch/cand CTE block the q322/q325
    oracles inline.  (``docs`` = the raw documents frame; shingling
    happens here so every consumer blocks on the SAME unit.)"""
    sh = docs.select("doc_id", _shingles(F.col("text")).alias("sh"))
    anchors = sh.select(
        "doc_id",
        F.explode(
            F.slice(
                F.array_sort(F.transform(F.col("sh"), lambda s: F.md5(s))),
                1,
                ANCHOR_K,
            )
        ).alias("a"),
    )
    ids = F.col("ids")
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    bucketed = (
        anchors.groupBy("a")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    return (
        _cap_buckets(bucketed, cap_name, "ids")
        .select(F.explode(pair_structs).alias("p"))
        .select(
            F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b")
        )
        .distinct()
    )


def _q69_oracle() -> str:
    return f"""
    WITH RECURSIVE
    docs AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
    anch_raw AS (SELECT doc_id,
             unnest((list_sort(list_transform(sh, s -> md5(s))))[1:{ANCHOR_K}]) AS a
             FROM docs),
    anch AS (SELECT doc_id, a FROM anch_raw
             QUALIFY row_number() OVER (PARTITION BY a
                                        ORDER BY doc_id) <= {BUCKET_CAP}),
    edges AS (SELECT DISTINCT x.doc_id AS src, y.doc_id AS dst
              FROM anch x JOIN anch y ON x.a = y.a AND x.doc_id < y.doc_id),
    sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
    reach AS (
      SELECT DISTINCT src AS doc_id, src AS node FROM sym
      UNION
      SELECT r.doc_id, s.dst FROM reach r JOIN sym s ON s.src = r.node
    ),
    lab AS (SELECT doc_id, MIN(node) AS cluster_id FROM reach GROUP BY doc_id)
    SELECT doc_id, cluster_id,
           CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
    FROM lab
    """


@query("q69_dedup_clusters", oracle=_q69_oracle())
def q69_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup cluster resolution: connected components over near-dup
    candidate pairs, assigning every clustered doc its canonical id
    (= the minimum doc_id reachable through the candidate graph).

    Candidate generation here is *anchor blocking*: each doc emits its
    ``ANCHOR_K`` smallest md5(shingle) digests (a bottom-k MinHash
    sketch, q53's fingerprint split into individual keys) and docs
    sharing ANY anchor become an edge.  Pairs chain — A~B on one anchor,
    B~C on another — which is exactly why per-group dedup (q65/q66's
    whole-fingerprint groupBy) under-merges and a transitive closure is
    required before picking canonical docs.

    Scale design: edges are built with the q41 bucket-explode pattern
    (groupBy anchor + in-bucket pair explode — never a shingle-table
    self-join), bucket size is capped, and the transitive closure runs
    through ``operators.graph.connected_components`` (iterative
    min-label propagation with per-round localCheckpoint; see that
    module for the scale analysis — it is also property-tested against
    a union-find reference on random graphs).

    The DuckDB oracle computes the same closure with a recursive CTE,
    so the *transitive* semantics (not just the pair list) are
    hash-checked.
    """
    from pyspark.storagelevel import StorageLevel

    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    edges = (
        _anchor_pair_candidates(docs, "q69_dedup_clusters")
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = connected_components(edges, max_iters=CC_MAX_ITERS)
    edges.unpersist()
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        F.count("*")
        .over(W.partitionBy("component"))
        .cast("long")
        .alias("cluster_size"),
    )


# ---------------------------------------------------------------------------
# q70 — repetition-based quality filter (Gopher-style)
# ---------------------------------------------------------------------------

# Thresholds sized to the synthetic small-vocab fixtures (see PLANS.md);
# the Gopher paper's production values (dup-line <= 0.30, top-2-gram
# <= 0.20) apply to natural text.
TOP_WORD_T = 0.125
TOP_BIGRAM_T = 0.05
DUP_WORD_T = 0.65


def _q70_oracle() -> str:
    return f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    uni AS (SELECT doc_id, unnest(words) AS tok FROM w),
    ucnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM uni GROUP BY doc_id, tok),
    ustat AS (SELECT doc_id, SUM(c) AS total, MAX(c) AS topc, COUNT(*) AS ndist
              FROM ucnt GROUP BY doc_id),
    bi AS (SELECT doc_id, words[i] || ' ' || words[i+1] AS bg
           FROM w, unnest(generate_series(1, len(words) - 1)) t(i)),
    bcnt AS (SELECT doc_id, bg, COUNT(*) AS c FROM bi GROUP BY doc_id, bg),
    bstat AS (SELECT doc_id, SUM(c) AS btotal, MAX(c) AS btopc
              FROM bcnt GROUP BY doc_id)
    SELECT doc_id,
           CAST(total AS BIGINT) AS n_words,
           {sql_dec('topc * 1.0 / total', 6)} AS top_word_frac,
           {sql_dec('1.0 - ndist * 1.0 / total', 6)} AS dup_word_frac,
           {sql_dec('btopc * 1.0 / btotal', 6)} AS top_bigram_frac,
           (topc * 1.0 / total <= {TOP_WORD_T}
            AND btopc * 1.0 / btotal <= {TOP_BIGRAM_T}
            AND 1.0 - ndist * 1.0 / total <= {DUP_WORD_T}) AS keep
    FROM ustat JOIN bstat USING (doc_id)
    """


@query("q70_repetition_filter", oracle=_q70_oracle())
def q70_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filter (the Gopher rules): per-doc
    most-frequent-word fraction, duplicate-word fraction, and
    most-frequent-bigram fraction, with a keep/drop verdict.

    Scale design: token frequencies come from explode + two-level
    hash aggregate (partial map-side combine on (doc_id, token) — the
    classic word-count shape, linear at any corpus size), NOT from
    per-row O(n * distinct) array scans.  Bigrams are zip_with over the
    word array (JVM-side, no Python).  One final doc_id-keyed join of
    the two stat tables; every shuffle key is doc_id or
    (doc_id, token) — never document text.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    words = F.split(F.col("text"), " ")
    w = docs.select("doc_id", words.alias("words"))
    ustat = (
        w.select("doc_id", F.explode("words").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("total"),
            F.max("c").alias("topc"),
            F.count("*").alias("ndist"),
        )
    )
    n1 = F.size(F.col("words")) - 1
    bigrams = F.zip_with(
        F.slice(F.col("words"), 1, n1),
        F.slice(F.col("words"), 2, n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bstat = (
        w.select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("btotal"), F.max("c").alias("btopc"))
    )
    top_w = F.col("topc") / F.col("total")
    dup_w = F.lit(1.0) - F.col("ndist") / F.col("total")
    top_b = F.col("btopc") / F.col("btotal")
    return ustat.join(bstat, "doc_id").select(
        "doc_id",
        F.col("total").cast("long").alias("n_words"),
        dec(top_w, 6).alias("top_word_frac"),
        dec(dup_w, 6).alias("dup_word_frac"),
        dec(top_b, 6).alias("top_bigram_frac"),
        (
            (top_w <= TOP_WORD_T)
            & (top_b <= TOP_BIGRAM_T)
            & (dup_w <= DUP_WORD_T)
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# q71 — sequence packing (concat-and-split into fixed context windows)
# ---------------------------------------------------------------------------

CTX_LEN = 2048  # tokens per packed training sequence
PACK_BLOCK = 100  # docs per prefix-sum block (>=1e6 at real scale)


def _q71_oracle() -> str:
    start = "(cum - n_tokens)"
    return f"""
    WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
    c AS (SELECT doc_id, n_tokens,
          SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
          FROM t)
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST({start} // {CTX_LEN} AS BIGINT) AS pack_id,
           CAST({start} % {CTX_LEN} AS BIGINT) AS pack_offset,
           ((cum - 1) // {CTX_LEN} != {start} // {CTX_LEN}) AS spans_boundary
    FROM c
    """


@query("q71_sequence_packing", oracle=_q71_oracle())
def q71_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: concatenate docs in doc_id order
    and split the token stream at CTX_LEN boundaries — each doc gets its
    pack id, its offset inside the pack, and whether it straddles a
    boundary (the rows a loader must split or mask).

    Scale design: the global running token total is NOT one giant
    window — a single ORDER BY window puts the whole corpus in one
    partition.  Instead, a two-phase distributed prefix sum:

      1. block-local cumulative sums, windowed per PACK_BLOCK bucket of
         doc_ids (parallel across blocks);
      2. per-block totals (tiny: corpus/PACK_BLOCK rows) prefix-summed
         and broadcast-joined back as block offsets.

    The oracle computes the same semantics with the naive global
    window, so the decomposition itself is hash-checked against the
    sequential definition.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    t = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.floor(F.col("doc_id") / PACK_BLOCK).alias("blk"),
    )
    local = t.withColumn(
        "local_cum",
        F.sum("n_tokens").over(
            W.partitionBy("blk").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    offsets = (
        t.groupBy("blk")
        .agg(F.sum("n_tokens").alias("blk_total"))
        .withColumn(
            "blk_offset",
            F.sum("blk_total")
            .over(W.orderBy("blk").rowsBetween(W.unboundedPreceding, -1)),
        )
        .select("blk", F.coalesce("blk_offset", F.lit(0)).alias("blk_offset"))
    )
    cum = F.col("blk_offset") + F.col("local_cum")
    start = cum - F.col("n_tokens")
    return local.join(F.broadcast(offsets), "blk").select(
        "doc_id",
        "n_tokens",
        F.floor(start / CTX_LEN).cast("long").alias("pack_id"),
        (start % CTX_LEN).cast("long").alias("pack_offset"),
        (F.floor((cum - 1) / CTX_LEN) != F.floor(start / CTX_LEN)).alias(
            "spans_boundary"
        ),
    )


# ---------------------------------------------------------------------------
# q72 — quality-weighted deterministic sampling
# ---------------------------------------------------------------------------

QW_BASE_RATE = 0.5  # acceptance rate for a perfect-quality doc


def _q72_oracle() -> str:
    q = "LEAST(1.0, nw / 50.0) * (1 - nstop * 1.0 / nw)"
    return f"""
    WITH t AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS nw,
             len(list_filter(string_split(text, ' '),
                 w -> list_contains({list(STOPWORDS)!r}, w))) AS nstop,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               / 4294967296.0 AS u
      FROM documents)
    SELECT doc_id, lang, (ROUND({q}, 4) + 0.0) AS weight
    FROM t WHERE u < {q} * {QW_BASE_RATE}
    """


@query("q72_quality_weighted_sample", oracle=_q72_oracle())
def q72_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted Bernoulli sampling: accept a doc with
    probability ``quality * QW_BASE_RATE``, where quality is q50's
    composite score and the coin is the md5 hash fraction of the key —
    the corpus-mixing primitive that up-samples good text without RNG
    state (reproducible across re-runs, resharding, and engines).
    Map-only: the accept predicate is an ordinary filter.
    """
    docs = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    nw = F.size(words)
    nstop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    q = F.least(F.lit(1.0), nw / F.lit(50.0)) * (1 - nstop / nw)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        / F.lit(4294967296.0)
    )
    return docs.filter(u < q * QW_BASE_RATE).select(
        "doc_id", "lang", dec(q, 4).alias("weight")
    )


# ---------------------------------------------------------------------------
# q73 — source-mixture rebalancing
# ---------------------------------------------------------------------------


def _q73_oracle() -> str:
    return """
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents),
    k AS (SELECT MIN(cnt) AS k FROM
          (SELECT COUNT(*) AS cnt FROM documents GROUP BY lang))
    SELECT doc_id, lang FROM ranked, k WHERE rn <= k.k
    """


@query("q73_mixture_rebalance", oracle=_q73_oracle())
def q73_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mixture rebalancing: downsample every language to the
    size of the smallest one (uniform target mixture; `en` is ~42% of
    the fixture corpus), picking each stratum's md5-first k docs —
    deterministic, exact per-stratum counts, no RNG.

    Scale shape: one shuffle on `lang` for the rank window; the
    per-stratum counts collapse to a 1-row global MIN that joins back
    as a broadcast scalar.  The same plan serves any target mixture —
    swap the scalar for a per-stratum rate table.
    """
    docs = table(spark, sf_dir, "documents")
    order = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    k = (
        docs.groupBy("lang")
        .agg(F.count("*").alias("cnt"))
        .agg(F.min("cnt").alias("k"))
    )
    return (
        docs.withColumn("rn", F.row_number().over(order))
        .join(F.broadcast(k))
        .filter(F.col("rn") <= F.col("k"))
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# q74 — unigram language-model scoring
# ---------------------------------------------------------------------------


def _q74_oracle() -> str:
    return """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    freq AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    n AS (SELECT SUM(c) AS n FROM freq)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           (ROUND(AVG(-LN(f.c / n.n)), 4) + 0.0) AS avg_neg_logp
    FROM tok JOIN freq f USING (w) CROSS JOIN n
    GROUP BY doc_id
    """


@query("q74_unigram_logprob", oracle=_q74_oracle())
def q74_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram LM scoring: per-doc mean negative log-probability under
    the corpus's own unigram distribution — the cheap perplexity proxy
    used for quality filtering (CCNet-style) before anything
    model-based runs.

    Scale shape: token frequencies are a (token)-keyed hash aggregate;
    the doc-token stream joins the frequency table ON TOKEN — a plain
    shuffle join, NOT a broadcast, because a real vocabulary (token ×
    count) is itself huge at 100 TB.  The grand total collapses to a
    1-row broadcast scalar.  Everything stays JVM-side.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
    freq = tok.groupBy("w").agg(F.count("*").alias("c"))
    n = freq.agg(F.sum("c").alias("n"))
    return (
        tok.join(freq, "w")
        .join(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            dec(F.avg(-F.log(F.col("c") / F.col("n"))), 4).alias("avg_neg_logp"),
        )
    )


# ---------------------------------------------------------------------------
# q75 — product-quantization ANN (ADC scoring)
# ---------------------------------------------------------------------------

PQ_M = 16  # subspaces
PQ_D = 4  # dims per subspace (embedding dim 64 / PQ_M)
PQ_K = 32  # centroids per subspace (sampled codebook, cf. q47's quantizer)
# ADC shortlist size for the exact-rerank refine step: ADC keeps the
# top-PQ_REFINE by approximate dot, then those candidates alone are
# scored with the TRUE cosine and re-ranked to TOPK — the standard
# IVF-PQ "refine" stage.  Measured on the fixture (q90): recall@10
# 0.17 without refine → 0.96 with it.
PQ_REFINE = 100


# --- shared PQ encode expressions (q75 / q178 / q304 / q305 / q306 and
# the streaming PqIndexMaintainer all read ONE definition, so the
# maintained codes can never silently diverge from the batch encode) ---


def _pq_sub(v: Column, m: Column) -> Column:
    """Subvector ``m`` (PQ_D dims) of a flat embedding array."""
    return F.slice(v, m * PQ_D + 1, PQ_D)


def _pq_l2(a: Column, b: Column) -> Column:
    """Squared L2 distance between two equal-length float arrays."""
    diff2 = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diff2, F.lit(0.0), lambda acc, v: acc + v)


def _pq_dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length float arrays (strict
    left-to-right double accumulation — matches the oracle's ordered
    list_reduce)."""
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def _pq_lut_col() -> Column:
    """Per-query ADC lookup table against the broadcast ``cbs`` row:
    lut[m][cid] = dot(query subvector m, centroid cid's subvector m) —
    PQ_M x PQ_K doubles per query, built from ``embedding``.  cbs is
    sorted by cid with contiguous ids 0..PQ_K-1, so position i holds
    cid i-1 and codes index the inner array directly."""
    ms = F.sequence(F.lit(0), F.lit(PQ_M - 1))
    return F.transform(
        ms,
        lambda m: F.transform(
            F.col("cbs"),
            lambda c: _pq_dot(_pq_sub(F.col("embedding"), m), _pq_sub(c["ce"], m)),
        ),
    )


#: ADC score = Σ_m lut[m][codes[m]] — strict left-to-right in m order
#: (matches the oracle's ORDER BY m reduce); shared by q75 and the
#: PqIndexMaintainer's served path.
def _pq_adc_score() -> Column:
    return F.aggregate(
        F.zip_with(
            "lut", "codes", lambda l, c: F.element_at(l, (c + 1).cast("int"))
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _pq_codebook_row(corpus: DataFrame) -> DataFrame:
    """The frozen PQ codebook as ONE broadcastable struct row: the
    first PQ_K corpus vectors sorted by cid (a trained per-subspace
    KMeans codebook in production — deterministic ids keep it
    oracle-checkable, cf. q47's quantizer)."""
    return (
        corpus.filter(F.col("vec_id") < PQ_K)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
        .agg(F.array_sort(F.collect_list(F.struct("cid", "ce"))).alias("cbs"))
    )


def _pq_codes_col() -> Column:
    """PQ_M argmin-L2 codes of ``embedding`` against the broadcast
    ``cbs`` codebook row — q75's encode, map-only.  The m/cid loops run
    inside higher-order functions so the plan stays constant-size at
    any (M, K); array_min on (dist, cid) structs ties to the lowest
    cid (the oracle's ORDER BY dist, cid)."""
    ms = F.sequence(F.lit(0), F.lit(PQ_M - 1))
    return F.transform(
        ms,
        lambda m: F.array_min(
            F.transform(
                F.col("cbs"),
                lambda c: F.struct(
                    _pq_l2(
                        _pq_sub(F.col("embedding"), m), _pq_sub(c["ce"], m)
                    ).alias("d"),
                    c["cid"].alias("cid"),
                ),
            )
        )["cid"],
    )


def _pq_energy(v: Column) -> Column:
    """Squared-norm (signal energy) of a float array."""
    return F.aggregate(
        F.transform(v, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_err_energy_col() -> Column:
    """Per-subspace (m, err, energy) structs of ``embedding`` against
    the broadcast ``cbs`` codebook row — q178's distortion pass (the
    chosen code's argmin distance IS the reconstruction error)."""
    ms = F.sequence(F.lit(0), F.lit(PQ_M - 1))
    return F.transform(
        ms,
        lambda m: F.struct(
            m.alias("m"),
            F.array_min(
                F.transform(
                    F.col("cbs"),
                    lambda c: F.struct(
                        _pq_l2(
                            _pq_sub(F.col("embedding"), m), _pq_sub(c["ce"], m)
                        ).alias("d"),
                        c["cid"].alias("cid"),
                    ),
                )
            )["d"].alias("err"),
            _pq_energy(_pq_sub(F.col("embedding"), m)).alias("energy"),
        ),
    )


def _pq_enc_sql() -> str:
    """DuckDB CTE chain (cb → ms → csub → enc0) shared by the PQ
    oracles: per (vec_id, m, cid) squared distances against the frozen
    codebook — q75's encode, oracle side."""
    d = PQ_D
    return f"""cb AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
                WHERE vec_id < {PQ_K}),
    ms AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m),
    csub AS (SELECT cid, m, ce[m*{d}+1 : m*{d}+{d}] AS cs FROM cb, ms),
    enc0 AS (SELECT e.vec_id, c.m, c.cid,
             list_reduce(list_transform(generate_series(1, {d}),
               i -> (e.embedding[c.m*{d}+i]::DOUBLE - c.cs[i]::DOUBLE)
                    * (e.embedding[c.m*{d}+i]::DOUBLE - c.cs[i]::DOUBLE)),
               (a, b) -> a + b) AS dist
             FROM embeddings e CROSS JOIN csub c),
    codes AS (SELECT vec_id, m, cid, dist FROM (
              SELECT vec_id, m, cid, dist,
                     ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                        ORDER BY dist, cid) AS rn
              FROM enc0) WHERE rn = 1)"""


def _q75_oracle() -> str:
    d = PQ_D
    return f"""
    WITH cb AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
                WHERE vec_id < {PQ_K}),
    ms AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m),
    csub AS (SELECT cid, m, ce[m*{d}+1 : m*{d}+{d}] AS cs FROM cb, ms),
    enc0 AS (SELECT e.vec_id, c.m, c.cid,
             list_reduce(list_transform(generate_series(1, {d}),
               i -> (e.embedding[c.m*{d}+i]::DOUBLE - c.cs[i]::DOUBLE)
                    * (e.embedding[c.m*{d}+i]::DOUBLE - c.cs[i]::DOUBLE)),
               (a, b) -> a + b) AS dist
             FROM embeddings e CROSS JOIN csub c),
    codes AS (SELECT vec_id, m, cid FROM (
              SELECT vec_id, m, cid,
                     ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                        ORDER BY dist, cid) AS rn
              FROM enc0) WHERE rn = 1),
    qs AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings
           WHERE vec_id < {N_QUERIES}),
    lut AS (SELECT q_id, m, cid,
            list_reduce(list_transform(generate_series(1, {d}),
              i -> qe[m*{d}+i]::DOUBLE * cs[i]::DOUBLE),
              (a, b) -> a + b) AS pd
            FROM qs CROSS JOIN csub),
    scored AS (SELECT l.q_id, c.vec_id AS neighbor_id,
               list_reduce(array_agg(l.pd ORDER BY l.m), (a, b) -> a + b) AS s
               FROM codes c JOIN lut l ON l.m = c.m AND l.cid = c.cid
               WHERE c.vec_id != l.q_id
               GROUP BY l.q_id, c.vec_id),
    r AS (SELECT q_id, neighbor_id,
          ROW_NUMBER() OVER (PARTITION BY q_id
                             ORDER BY ROUND(s, 6) DESC, neighbor_id) AS srank
          FROM scored),
    short AS (SELECT q_id, neighbor_id FROM r WHERE srank <= {PQ_REFINE}),
    ref AS (SELECT s.q_id, s.neighbor_id,
            (ROUND({_COS_SQL.format(a='qa.embedding', b='qc.embedding')}, 6) + 0.0) AS cos_sim
            FROM short s
            JOIN embeddings qa ON qa.vec_id = s.q_id
            JOIN embeddings qc ON qc.vec_id = s.neighbor_id),
    rr AS (SELECT q_id, neighbor_id, cos_sim,
           ROW_NUMBER() OVER (PARTITION BY q_id
                              ORDER BY cos_sim DESC, neighbor_id) AS rank
           FROM ref)
    SELECT q_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank
    FROM rr WHERE rank <= {TOPK}
    """


@query("q75_ann_pq", oracle=_q75_oracle())
def q75_ann_pq(
    spark: SparkSession,
    sf_dir: str,
    *,
    backend: str | None = None,
    pair_scores: DataFrame | None = None,
) -> DataFrame:
    """Product-quantization ANN: ADC shortlist + exact-cosine refine.

    Each 64-dim vector is encoded as PQ_M codes (argmin-L2 centroid per
    PQ_D-dim subspace); a query scores a corpus vector by summing PQ_M
    lookup-table entries — dot(query_sub, centroid) partials — never
    touching the original embedding.  The ADC top-PQ_REFINE shortlist is
    then re-scored with the TRUE cosine and re-ranked to TOPK (the
    standard IVF-PQ refine stage; measured recall@10 on the fixture:
    0.17 ADC-only → 0.96 refined, see q90).  The codebook is the first
    PQ_K corpus vectors' subvectors (a trained per-subspace KMeans
    codebook in production — deterministic ids keep it oracle-checkable,
    cf. q47's quantizer).

    Scale design: the corpus-wide pass reads ONLY (vec_id, codes) — a
    PQ_M-byte-per-vector structure, the compression that makes PQ the
    memory workhorse of billion-vector ANN.  Encoding is map-only
    (broadcast codebook); scoring broadcast-joins the N_QUERIES x PQ_M x
    PQ_K LUT (tiny, fixed-size) against the codes table; the refine
    joins broadcast the N_QUERIES×PQ_REFINE shortlist against the
    narrow (vec_id, embedding) projection, so full vectors are read for
    shortlisted candidates only.  The only shuffles are the two top-k
    windows.  All sums accumulate strictly left-to-right in double on
    both engines, so even the ADC scores hash-match the oracle.
    """
    corpus = table(spark, sf_dir, "embeddings")
    cb1 = _pq_codebook_row(corpus)

    # The m-loop and cid-loop run INSIDE higher-order functions
    # (transform over a sequence), not as PQ_M x PQ_K Python-unrolled
    # column expressions — an unrolled tree at M=16, K=32 is ~512
    # aggregate subtrees and its codegen/analysis time dwarfs the actual
    # scan; the HOF form keeps the plan constant-size at any (M, K).
    # (_pq_sub/_pq_l2/_pq_codes_col/_pq_lut_col/_pq_adc_score are the
    # shared module-level definitions the IVM family and the streaming
    # maintainer reuse.)  ``backend`` (default auto — the q112
    # encode_backend pattern) swaps the encode AND the refine cosine for
    # their bit-equal numpy Arrow passes; "jvm" keeps the HOF plan.
    if backend is None:
        backend = "numpy" if _numpy_available() else "jvm"
    if backend == "numpy":
        codes = _pq_encode_cfg_numpy(
            spark, _fanout(spark, corpus), PQ_M, PQ_D, False, cb_source=corpus
        )
    else:
        codes = (
            _fanout(spark, corpus)
            .crossJoin(F.broadcast(cb1))
            .select("vec_id", _pq_codes_col().alias("codes"))
        )
    # Per-query LUT: N_QUERIES x PQ_M x PQ_K doubles, broadcast to the
    # scorer (see _pq_lut_col).
    qlut = (
        corpus.filter(F.col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(cb1))
        .select(F.col("vec_id").alias("q_id"), _pq_lut_col().alias("lut"))
    )
    score = _pq_adc_score()
    scored = (
        F.broadcast(qlut)
        .join(codes, F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            dec(score, 6).alias("approx_dot"),
        )
    )
    # Refine: the ADC pass never touches a full vector; only the
    # top-PQ_REFINE shortlist (N_QUERIES × PQ_REFINE rows — tiny,
    # broadcastable) is re-scored with the exact cosine and re-ranked.
    w = W.partitionBy("q_id").orderBy(F.col("approx_dot").desc(), "neighbor_id")
    short = (
        scored.withColumn("srank", F.row_number().over(w))
        .filter(F.col("srank") <= PQ_REFINE)
        .select("q_id", "neighbor_id")
    )
    if pair_scores is not None:
        # the shortlist's exact cosines come from the shared pre-scored
        # pair table (ann_audit_frames) instead of a re-join + re-score
        refined = F.broadcast(short).join(pair_scores, ["q_id", "neighbor_id"])
    else:
        vec = corpus.select("vec_id", "embedding")
        rejoined = (
            F.broadcast(short)
            .join(
                vec.select(
                    F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
                ),
                "q_id",
            )
            .join(
                vec.select(
                    F.col("vec_id").alias("neighbor_id"),
                    F.col("embedding").alias("ne"),
                ),
                "neighbor_id",
            )
        )
        if backend == "numpy":
            refined = _cos_pairs_numpy(
                spark, rejoined, ("q_id", "neighbor_id"), "qe", "ne"
            ).select(
                "q_id", "neighbor_id", dec(F.col("cos_raw"), 6).alias("cos_sim")
            )
        else:
            refined = rejoined.select(
                "q_id",
                "neighbor_id",
                dec(_cosine(F.col("qe"), F.col("ne")), 6).alias("cos_sim"),
            )
    w2 = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        refined.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= TOPK)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# q76 — incremental corpus dedup (delta admitted against a base snapshot)
# ---------------------------------------------------------------------------

DELTA_MOD = 5  # doc_id % DELTA_MOD == 0 plays the newly-arrived batch


def _q76_oracle() -> str:
    fp = _FP_SQL.format(k=FP_K)
    return f"""
    WITH tagged AS (SELECT doc_id, text, (doc_id % {DELTA_MOD} = 0) AS is_delta
                    FROM documents),
    base AS (SELECT sha256(text) AS h, {fp} AS fp FROM tagged WHERE NOT is_delta),
    delta AS (SELECT doc_id, sha256(text) AS h, {fp} AS fp
              FROM tagged WHERE is_delta)
    SELECT d.doc_id,
           (d.h IN (SELECT h FROM base)) AS exact_dup,
           (d.fp IN (SELECT fp FROM base)) AS near_dup,
           (d.h NOT IN (SELECT h FROM base)
            AND d.fp NOT IN (SELECT fp FROM base)) AS admitted
    FROM delta d
    """


@query("q76_incremental_dedup", oracle=_q76_oracle())
def q76_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup: admit a delta batch against the
    existing base snapshot — drop delta docs that are exact dups
    (sha256) OR near-dups (q53 bottom-k fingerprint) of ANY base doc.
    This is the batch shape of every growing-corpus ingest: the base is
    never rescanned against itself, only the (small) delta probes it.

    Scale design: two LEFT ANTI joins keyed on constant-width digests —
    the base side reduces to its digest projection (64-char hash +
    fingerprint per doc, not text), the delta side is the arriving
    batch.  At 100 TB the base digest table is exactly the persisted
    state the streaming first-seen dedup (streaming/stateful.py) keeps
    in its checkpoint — same admission semantics, same keys, batch vs
    streaming execution.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    tagged = docs.select(
        "doc_id",
        "text",
        (F.col("doc_id") % DELTA_MOD == 0).alias("is_delta"),
        F.sha2(F.col("text"), 256).alias("h"),
        _fingerprint(F.col("text"), FP_K).alias("fp"),
    )
    base = tagged.filter(~F.col("is_delta")).select("h", "fp")
    delta = tagged.filter(F.col("is_delta")).select("doc_id", "h", "fp")
    # Distinct digest projections so the probe joins never multiply
    # delta rows (identical base docs share a digest).
    bh = base.select("h").distinct().withColumn("eh", F.lit(True))
    bf = base.select("fp").distinct().withColumn("ef", F.lit(True))
    exact_dup = F.coalesce(F.col("eh"), F.lit(False))
    near_dup = F.coalesce(F.col("ef"), F.lit(False))
    return (
        delta.join(bh, "h", "left")
        .join(bf, "fp", "left")
        .select(
            "doc_id",
            exact_dup.alias("exact_dup"),
            near_dup.alias("near_dup"),
            (~exact_dup & ~near_dup).alias("admitted"),
        )
    )


# ---------------------------------------------------------------------------
# q80 — fuzzy join via deletion-neighborhood blocking
# ---------------------------------------------------------------------------

FUZZY_KEY_CAP = 100  # fixed-size probe set (bounded at every SF)


def _q80_oracle() -> str:
    return f"""
    WITH c AS (SELECT c_custkey, c_name FROM customer
               WHERE c_custkey < {FUZZY_KEY_CAP}),
    v_raw AS (SELECT c_custkey, c_name, i AS pos,
                 substr(c_name, 1, i - 1) || substr(c_name, i + 1) AS var
          FROM c, unnest(generate_series(1, length(c_name))) t(i)),
    v AS (SELECT c_custkey, c_name, pos, var FROM v_raw
          QUALIFY row_number() OVER (PARTITION BY pos, var
                                     ORDER BY c_custkey) <= {BUCKET_CAP}),
    cand AS (SELECT DISTINCT a.c_custkey AS key_a, b.c_custkey AS key_b,
                    a.c_name AS name_a, b.c_name AS name_b
             FROM v a JOIN v b
               ON a.pos = b.pos AND a.var = b.var
              AND a.c_custkey < b.c_custkey)
    SELECT key_a, key_b, name_a, name_b
    FROM cand WHERE levenshtein(name_a, name_b) = 1
    """


@query("q80_fuzzy_name_join", oracle=_q80_oracle())
def q80_fuzzy_name_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join: pairs of names at edit distance exactly 1,
    found WITHOUT an all-pairs comparison — the entity-resolution
    blocking trick.

    Blocking key = (position, deletion variant): two equal-length
    strings differing by one substitution share the variant obtained by
    deleting that position from either, so every true pair lands in a
    block and candidates are verified with one exact ``levenshtein``
    call.  Blocks are bucket-exploded (q41's pattern, capped) — at any
    corpus size the shuffle carries (pos, n-1-char variant) keys, and
    the quadratic step runs only inside blocks whose size the key
    structure bounds (~alphabet size).
    """
    c = (
        _fanout(spark, table(spark, sf_dir, "customer"))
        .filter(F.col("c_custkey") < FUZZY_KEY_CAP)
        .select("c_custkey", "c_name")
    )
    n = F.length("c_name")
    # n >= 1 guard (the q289/q290 rule): Spark's sequence(1, 0) is the
    # DESCENDING [1, 0] while DuckDB's generate_series(1, 0) is empty —
    # an empty name would emit two "" variants here and none in the
    # oracle.  The fixture has no empty names; this pins the contract.
    variants = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat(
                F.col("c_name").substr(F.lit(1), i - F.lit(1)),
                F.col("c_name").substr(i + F.lit(1), F.length("c_name") - i),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    v = c.select(
        "c_custkey", "c_name", F.posexplode(variants).alias("pos0", "var")
    )
    # members arrive SORTED from _cap_buckets — no second sort
    members = F.col("ms")
    pair_structs = F.flatten(
        F.transform(
            members,
            lambda x, i: F.transform(
                F.slice(members, i + 2, F.size(members)),
                lambda y: F.struct(
                    x["c_custkey"].alias("key_a"),
                    y["c_custkey"].alias("key_b"),
                    x["c_name"].alias("name_a"),
                    y["c_name"].alias("name_b"),
                ),
            ),
        )
    )
    bucketed = (
        v.groupBy("pos0", "var")
        .agg(F.collect_list(F.struct("c_custkey", "c_name")).alias("ms"))
        .filter(F.size("ms") >= 2)
    )
    cand = (
        _cap_buckets(bucketed, "q80_fuzzy_name_join", "ms")
        .select(F.explode(pair_structs).alias("p"))
        .select("p.key_a", "p.key_b", "p.name_a", "p.name_b")
        .distinct()
    )
    return cand.filter(F.levenshtein("name_a", "name_b") == 1)


# ---------------------------------------------------------------------------
# q85 — weighted priority sampling (Efraimidis–Spirakis, deterministic)
# ---------------------------------------------------------------------------

PRIORITY_K = 10  # docs kept per stratum


def _q85_oracle() -> str:
    return f"""
    WITH t AS (SELECT doc_id, lang, n_chars,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                 / 4294967296.0 AS u
               FROM documents),
    p AS (SELECT doc_id, lang, n_chars,
          (ROUND(-LN(u) / n_chars, 9) + 0.0) AS priority FROM t),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                       ORDER BY priority, doc_id) AS rn
          FROM p)
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars, priority
    FROM r WHERE rn <= {PRIORITY_K}
    """


@query("q85_weighted_priority_sample", oracle=_q85_oracle())
def q85_weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis): per
    language, keep the PRIORITY_K docs with the smallest
    ``-ln(u) / weight`` priority — equivalent to sampling proportional
    to weight (here n_chars: longer docs preferred), u being the md5
    hash fraction instead of RNG state, so the sample is exactly
    reproducible across runs, resharding, and engines.

    This is the distributed-friendly form of weighted reservoir
    sampling: priorities are map-side per-row arithmetic, the per-
    stratum top-k is one window (rank + cut — no global sort), and
    merging partial samples from different partitions needs only
    "keep the k smallest priorities", which is what the window does.
    The priority is rounded (1e-9 grid, ~1e7x coarser than libm's ulp
    differences) with a doc_id tiebreak so the cut is deterministic.
    """
    docs = table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        / F.lit(4294967296.0)
    )
    p = docs.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        dec(-F.log(u) / F.col("n_chars"), 9).alias("priority"),
    )
    w = W.partitionBy("lang").orderBy("priority", "doc_id")
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PRIORITY_K)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# q86 — inverted index build
# ---------------------------------------------------------------------------

POSTINGS_CAP = 20  # doc ids materialized per term in the sample output


def _q86_oracle() -> str:
    return f"""
    WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents),
    g AS (SELECT term, COUNT(*) AS df,
                 array_to_string(list_sort(array_agg(doc_id))[1:{POSTINGS_CAP}], '|')
                   AS postings
          FROM tok GROUP BY term)
    SELECT term, CAST(df AS BIGINT) AS df, postings FROM g
    """


@query("q86_inverted_index", oracle=_q86_oracle())
def q86_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build: term -> document frequency + the first
    POSTINGS_CAP doc ids of the posting list — the retrieval-side
    structure a corpus search needs next to the embeddings ANN.

    Scale shape: distinct (doc, term) pairs first (map-side combine on
    the pair key), then ONE term-keyed aggregate building df and the
    bounded posting prefix.  Postings are capped in the output here;
    the full-list variant writes term-bucketed parquet (the posting
    files) instead of materializing lists through the driver.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).distinct()
    agg = tok.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.concat_ws(
            "|", F.slice(F.array_sort(F.collect_list("doc_id")), 1, POSTINGS_CAP)
        ).alias("postings"),
    )
    # surface the truncation (same pattern as _cap_buckets): the cap is
    # part of the output contract here, but how often it fires is the
    # signal for moving to term-bucketed posting files
    obs = Observation()
    BUCKET_OBSERVATIONS["q86_inverted_index"] = obs
    return agg.observe(
        obs,
        F.count(F.lit(1)).alias("buckets"),
        F.sum((F.col("df") > POSTINGS_CAP).cast("long")).alias("capped_buckets"),
        F.max("df").alias("max_bucket_size"),
    )


# ---------------------------------------------------------------------------
# q93 — exact duplicate-span detection (substring-level dedup)
# ---------------------------------------------------------------------------

SPAN_K = 20  # tokens per span — the "memorized span" unit


def _kgram_sql(k: int) -> str:
    w = "string_split(text, ' ')"
    return (
        f"CASE WHEN len({w}) >= {k} THEN "
        f"list_distinct(list_transform(generate_series(1, len({w}) - {k - 1}), "
        f"i -> array_to_string(({w})[i:i+{k - 1}], ' '))) "
        "ELSE [text] END"
    )


def _kgrams(text: Column, k: int) -> Column:
    """Distinct word k-grams (generalized _shingles — same short-doc
    fallback so both engines agree on degenerate inputs)."""
    words = F.split(text, " ")
    n = F.size(words) - (k - 1)
    return F.when(
        n >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.concat_ws(" ", F.slice(words, i, k)),
            )
        ),
    ).otherwise(F.array(text))


@query(
    "q93_duplicate_spans",
    oracle=f"""
    WITH g AS (SELECT doc_id, unnest({_kgram_sql(SPAN_K)}) AS span FROM documents),
    h AS (SELECT doc_id, md5(span) AS span_hash FROM g)
    SELECT span_hash,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM h GROUP BY span_hash HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def q93_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-SPAN detection: every {SPAN_K}-token span appearing
    in >= 2 distinct documents — substring-level dedup a la "Deduplicating
    Training Data Makes Language Models Better" (Lee et al.), the unit
    at which models memorize.  Document-level dedup (q40/q41) misses a
    copied paragraph inside otherwise-distinct documents; this catches
    it.

    Scale shape: the span table never leaves the executors as text —
    spans hash to md5 immediately and the single shuffle carries
    (span_hash, doc_id) pairs; the group-by is the word-count shape.
    Production removes the spans (or their docs) and uses a
    suffix-array sketch for arbitrary-length matches; the fixed-K scan
    is the standard streaming approximation.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    spans = docs.select(
        "doc_id", F.explode(_kgrams(F.col("text"), SPAN_K)).alias("span")
    ).select("doc_id", F.md5("span").alias("span_hash"))
    return (
        spans.groupBy("span_hash")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# q94 — PII scan + redaction (map-only, regex families)
# ---------------------------------------------------------------------------

ID_RUN_PAT = "[0-9]{6,}"  # long digit runs = account-number-like ids
EMAIL_PAT = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"


@query(
    "q94_pii_redaction",
    oracle=f"""
    SELECT c_custkey,
           CAST(len(regexp_extract_all(c_name, '{ID_RUN_PAT}')) AS BIGINT) AS n_id_runs,
           CAST(len(regexp_extract_all(lower(c_name), '{EMAIL_PAT}')) AS BIGINT) AS n_emails,
           regexp_replace(c_name, '{ID_RUN_PAT}', '#ID#', 'g') AS redacted
    FROM customer
    """,
)
def q94_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan + redaction: count sensitive-pattern hits per record and
    emit the redacted text — the pre-release privacy pass of a training
    corpus.  Two pattern families here (long digit runs standing in for
    account ids — the fixture's only PII-shaped content — and emails as
    a structurally-real negative class); production adds phone/SSN/
    address families to the same shape.  Map-only: regex families run
    inside one projection, no shuffle, no UDF (regexp_count /
    regexp_replace are JVM expressions; patterns restricted to syntax
    with identical Java/RE2 semantics so the oracle hash-matches).
    """
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_count(F.col("c_name"), F.lit(ID_RUN_PAT)).cast("long").alias("n_id_runs"),
        F.regexp_count(F.lower(F.col("c_name")), F.lit(EMAIL_PAT)).cast("long").alias("n_emails"),
        F.regexp_replace(F.col("c_name"), ID_RUN_PAT, "#ID#").alias("redacted"),
    )


# ---------------------------------------------------------------------------
# q95 — span-level decontamination (13-gram overlap vs a held-out split)
# ---------------------------------------------------------------------------

DECON_K = 13  # the GPT-3-style decontamination n-gram width
EVAL_MOD = 10  # eval split = md5(doc_id) % 10 == 0 (q58's bucket rule)


def _q95_oracle() -> str:
    bucket = f"('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % {EVAL_MOD}"
    return f"""
    WITH tagged AS (SELECT doc_id, text, {bucket} = 0 AS is_eval FROM documents),
    grams AS (SELECT doc_id, is_eval, md5(unnest({_kgram_sql(DECON_K)})) AS g
              FROM tagged),
    train AS (SELECT DISTINCT g FROM grams WHERE NOT is_eval),
    ev AS (SELECT doc_id, g FROM grams WHERE is_eval)
    SELECT ev.doc_id,
           CAST(SUM(CASE WHEN train.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_ngrams,
           (SUM(CASE WHEN train.g IS NOT NULL THEN 1 ELSE 0 END) > 0)
             AS contaminated
    FROM ev LEFT JOIN train ON ev.g = train.g
    GROUP BY ev.doc_id
    """


@query("q95_eval_decontamination", oracle=_q95_oracle())
def q95_eval_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination: for every held-out (eval) document,
    how many of its distinct {DECON_K}-grams appear anywhere in the
    training split — the GPT-3-style n-gram overlap check.  q65/q66
    catch whole-document leakage via fingerprints; this catches the
    partial overlaps that survive them (an eval answer pasted inside a
    training doc).

    Scale shape: grams hash to md5 at the scan; the train side reduces
    to DISTINCT hashes before the join, so the only shuffle carries
    (hash, doc) pairs for the 1/{EVAL_MOD} eval slice against a
    hash-keyed train set — at corpus scale the train set is the big
    side and the join stays hash-partitioned, never broadcast.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % EVAL_MOD
    )
    tagged = docs.select(
        "doc_id", (bucket == 0).alias("is_eval"),
        F.explode(_kgrams(F.col("text"), DECON_K)).alias("gram"),
    ).select("doc_id", "is_eval", F.md5("gram").alias("g"))
    train = tagged.filter(~F.col("is_eval")).select("g").distinct()
    ev = tagged.filter(F.col("is_eval")).select("doc_id", "g")
    hit = ev.join(train.select(F.col("g"), F.lit(1).alias("_hit")), "g", "left")
    return hit.groupBy("doc_id").agg(
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_shared_ngrams"),
        (F.sum(F.coalesce(F.col("_hit"), F.lit(0))) > 0).alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# q96 — semantic dedup (SemDeDup: cluster-blocked cosine pruning)
# ---------------------------------------------------------------------------

SEMDEDUP_T = 0.4  # within-cluster cosine above which the later doc is pruned


def _q96_oracle() -> str:
    cos = _COS_SQL.format(a="a.embedding", b="b.embedding")
    return f"""
    WITH cent AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
                  WHERE vec_id < {N_CENTROIDS}),
    scored AS (
      SELECT e.vec_id, e.embedding, c.cid,
             {_COS_SQL.format(a='e.embedding', b='c.ce')} AS cs
      FROM embeddings e CROSS JOIN cent c),
    cells AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT vec_id, embedding, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
        FROM scored) t
      WHERE rn = 1),
    pairs AS (
      SELECT b.vec_id, a.vec_id AS dup_of, a.cell,
             (ROUND({cos}, 6) + 0.0) AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY a.vec_id) AS rn
      FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE {cos} >= {SEMDEDUP_T})
    SELECT vec_id, dup_of, cell, cos_sim FROM pairs WHERE rn = 1
    """


def _numpy_available() -> bool:
    try:
        import numpy  # noqa: F401

        return True
    except ImportError:  # pragma: no cover - numpy is baked into this env
        return False


# Flat nearest-centroid assignment is O(n*k); SemDeDup's regime grows k
# with the corpus, so past this k the hierarchical O(n*sqrt(k)) routing
# is the only plan that survives scale-up (SCALING.md measures 13.3x vs
# 2-3x at 10x).  Below it, flat is both cheaper and bit-exact with the
# DuckDB oracle, so the auto-default keeps correctness-gate parity at
# fixture scale and flips to the production path exactly when the knob
# that breaks flat (k) is turned.
SEMDEDUP_TWO_LEVEL_AUTO_K = 32


def resolve_semdedup_knobs(
    n_centroids: int, two_level: bool | None, pair_backend: str | None
) -> tuple[bool, str]:
    """Resolve q96's auto knobs (None -> scale-appropriate choice)."""
    if two_level is None:
        two_level = n_centroids > SEMDEDUP_TWO_LEVEL_AUTO_K
    if pair_backend is None:
        pair_backend = "numpy" if _numpy_available() else "jvm"
    return two_level, pair_backend


@query("q96_semantic_dedup", oracle=_q96_oracle())
def q96_semantic_dedup(
    spark: SparkSession,
    sf_dir: str,
    n_centroids: int = N_CENTROIDS,
    two_level: bool | None = None,
    pair_backend: str | None = None,
) -> DataFrame:
    """Semantic dedup, SemDeDup-style (Abbas et al.): cluster the corpus
    with the coarse quantizer, then prune any vector whose cosine to a
    LOWER-id vector in the SAME cluster is >= {SEMDEDUP_T} — one row
    per pruned vector with its kept anchor (the smallest qualifying
    id).  q44 blocks on the ground-truth ``label``; this is the
    production variant where the blocking key is LEARNED (the same
    k-means cells q47 probes), so it needs no labels at 100 TB.

    Scale shape: cell assignment is the map-only pass shared with q47
    (``ivf_cell_assignment``); the pair join shuffles on ``cell``, so
    work is quadratic only within a cluster — and cluster size is held
    ~constant by scaling ``n_centroids`` with the corpus (the SemDeDup
    paper's regime — tools/scaling.py demonstrates exactly this), with
    AQE skew-split as the hot-cell backstop.  The per-vector min-anchor
    window partitions on vec_id — no global ordering anywhere.
    ``two_level`` (default auto): hierarchical O(sqrt(k)) assignment
    (``ivf_cell_assignment_2level``) — auto-selected whenever
    ``n_centroids > SEMDEDUP_TWO_LEVEL_AUTO_K``, i.e. exactly the
    large-k production regime where flat assignment's O(n*k) blows up
    (SCALING.md: 13.3x at 10x flat vs ~2-3x two-level).  At fixture k
    the auto-default stays flat, which is what the DuckDB oracle
    computes — pass ``two_level=True/False`` to force either side.

    ``pair_backend`` (default auto: "numpy" when numpy imports, the
    baked-in case) picks the within-cell pairwise stage:
    - "numpy": ONE Arrow batch per cell through ``applyInPandas``; the
      whole cell scores as a single BLAS matmul (E @ E.T) — the dense
      linear algebra the JVM expression engine can't vectorize, ~an
      order of magnitude faster at production cell sizes.  Produces
      the identical pruned set / anchors / 6-dp cosines as the JVM
      backend on the fixture (test_data_selection pins it; the driver
      oracle gate hash-checks it at sf0.01).
    - "jvm": cell-keyed self-join + HOF cosine — same expression shape
      as the DuckDB oracle, kept as the explicit A/B fallback.
    """
    two_level, pair_backend = resolve_semdedup_knobs(
        n_centroids, two_level, pair_backend
    )
    assign = ivf_cell_assignment_2level if two_level else ivf_cell_assignment
    cells = assign(spark, sf_dir, n_centroids)
    if pair_backend == "numpy":
        return _semdedup_pairs_numpy(spark, cells)
    a = cells.select(
        F.col("vec_id").alias("dup_of"), "cell", F.col("embedding").alias("ea")
    )
    b = cells.select("vec_id", "cell", F.col("embedding").alias("eb"))
    pairs = (
        a.join(b, "cell")
        .filter(F.col("dup_of") < F.col("vec_id"))
        .withColumn("c", _cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("c") >= SEMDEDUP_T)
    )
    w = W.partitionBy("vec_id").orderBy("dup_of")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "dup_of", "cell", dec(F.col("c"), 6).alias("cos_sim"))
    )


def _semdedup_pairs_numpy(spark: SparkSession, cells: DataFrame) -> DataFrame:
    """Within-cell SemDeDup pruning as one BLAS matmul per cell.

    Each cell arrives as one Arrow-batched pandas group; similarities
    come from a single E @ E.T over the L2-normalized matrix, and the
    min-anchor per pruned vector is a masked argmax — no per-pair
    Python, no per-pair JVM expression trees.  Output schema and
    semantics match the JVM backend (modulo last-ulp float ordering).
    Memory is O(cell^2) floats per task — bounded by the same
    constant-cell-size contract that bounds the join backend's work.
    """
    import numpy as np
    import pandas as pd

    from datapipeline_dags_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    t = SEMDEDUP_T

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        if len(pdf) < 2:
            return pd.DataFrame(
                {"vec_id": [], "dup_of": [], "cell": [], "cos_sim": []}
            ).astype({"vec_id": "int64", "dup_of": "int64", "cell": "int64"})
        e = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        sim = e @ e.T
        ids = pdf["vec_id"].to_numpy()
        lower = np.tril(sim >= t, k=-1)  # [j, i] True iff i < j qualifies
        has = lower.any(axis=1)
        first = lower.argmax(axis=1)  # smallest qualifying i (ids sorted)
        j = np.nonzero(has)[0]
        i = first[j]
        return pd.DataFrame(
            {
                "vec_id": ids[j],
                "dup_of": ids[i],
                "cell": pdf["cell"].to_numpy()[j],
                "cos_sim": np.round(sim[j, i], 6) + 0.0,
            }
        )

    schema = "vec_id long, dup_of long, cell long, cos_sim double"
    return cells.groupBy("cell").applyInPandas(prune, schema)


# ---------------------------------------------------------------------------
# q97 — DSIR importance weights (hashed n-gram log-likelihood ratio)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 1024  # hashed feature space size
DSIR_TARGET_LANG = "en"  # the "target distribution" slice


def _q97_oracle() -> str:
    b = DSIR_BUCKETS
    return f"""
    WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
                 FROM documents),
    feat AS (SELECT doc_id,
                    ('0x' || substr(md5(w), 1, 8))::BIGINT % {b} AS f,
                    (lang = '{DSIR_TARGET_LANG}') AS is_tgt
             FROM tok),
    cnt AS (SELECT f, COUNT(*) AS cr,
                   SUM(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS ct
            FROM feat GROUP BY f),
    tot AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM cnt)
    SELECT fe.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           (ROUND(AVG(LN(((c.ct + 1.0) / (t.nt + {b}))
                       / ((c.cr + 1.0) / (t.nr + {b})))), 4) + 0.0) AS avg_loglr
    FROM feat fe JOIN cnt c USING (f) CROSS JOIN tot t
    GROUP BY fe.doc_id
    """


@query("q97_dsir_importance", oracle=_q97_oracle())
def q97_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for Language
    Models via Importance Resampling"): per document, the mean hashed
    n-gram log-likelihood ratio between a TARGET distribution (here the
    '{DSIR_TARGET_LANG}' slice plays the high-quality target) and the
    RAW corpus — the score importance resampling then samples by
    (composable with q85's weighted priority sampler).  Laplace
    +1 smoothing on both sides over {DSIR_BUCKETS} hashed buckets.

    Scale shape: exactly q74's — ONE (bucket)-keyed aggregate computes
    raw and target counts together (a conditional sum, not two
    passes), the token stream joins it ON BUCKET (hash-partitioned,
    never broadcast: a real feature table is huge), totals collapse to
    a 1-row broadcast scalar, and the per-doc mean is a doc-keyed hash
    aggregate.  No global window anywhere; everything JVM-side.
    """
    b = DSIR_BUCKETS
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    feat = tok.select(
        "doc_id",
        (F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long") % b).alias("f"),
        (F.col("lang") == DSIR_TARGET_LANG).alias("is_tgt"),
    )
    cnt = feat.groupBy("f").agg(
        F.count("*").alias("cr"),
        F.sum(F.col("is_tgt").cast("long")).alias("ct"),
    )
    tot = cnt.agg(F.sum("cr").alias("nr"), F.sum("ct").alias("nt"))
    loglr = F.log(
        ((F.col("ct") + 1.0) / (F.col("nt") + b))
        / ((F.col("cr") + 1.0) / (F.col("nr") + b))
    )
    return (
        feat.join(cnt, "f")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            dec(F.avg(loglr), 4).alias("avg_loglr"),
        )
    )


# ---------------------------------------------------------------------------
# q98 — Bloom-filter incremental dedup (approximate q76)
# ---------------------------------------------------------------------------

BLOOM_M = 2048  # bits — deliberately tight so false positives are OBSERVED
BLOOM_K = 3  # hash functions


def _bloom_pos_sql(h: str, i: str) -> str:
    return f"('0x' || substr(md5({h} || '|' || {i}), 1, 8))::BIGINT % {BLOOM_M}"


def _q98_oracle() -> str:
    return f"""
    WITH tagged AS (SELECT doc_id, (doc_id % {DELTA_MOD} = 0) AS is_delta,
                           sha256(text) AS h
                    FROM documents),
    base_pos AS (SELECT DISTINCT {_bloom_pos_sql('h', 'i')} AS p
                 FROM tagged, unnest(generate_series(1, {BLOOM_K})) t(i)
                 WHERE NOT is_delta),
    base_h AS (SELECT DISTINCT h FROM tagged WHERE NOT is_delta),
    dpos AS (SELECT doc_id, h, {_bloom_pos_sql('h', 'i')} AS p
             FROM tagged, unnest(generate_series(1, {BLOOM_K})) t(i)
             WHERE is_delta),
    hits AS (SELECT doc_id, h,
                    SUM(CASE WHEN p IN (SELECT p FROM base_pos)
                        THEN 1 ELSE 0 END) AS nhit
             FROM dpos GROUP BY doc_id, h)
    SELECT doc_id,
           (nhit = {BLOOM_K}) AS bloom_dup,
           (h IN (SELECT h FROM base_h)) AS exact_dup,
           (nhit = {BLOOM_K} AND h NOT IN (SELECT h FROM base_h))
               AS false_positive
    FROM hits
    """


@query("q98_bloom_incremental_dedup", oracle=_q98_oracle())
def q98_bloom_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter admission for incremental dedup — the approximate
    scale path for q76's exact anti-joins.  The base corpus folds into
    a {BLOOM_M}-bit / {BLOOM_K}-hash Bloom set; a delta doc is
    ``bloom_dup`` iff ALL {BLOOM_K} of its digest positions are set.
    The exact digest check runs alongside, so every ``false_positive``
    (bloom says dup, digests say new — the price of the compressed
    filter) is OBSERVED in the output, not hidden.  M is deliberately
    undersized (~0.5 bits/key at fixture scale) so the fixture
    actually exercises that column; production sizes M at 10-20
    bits/key for <1% FP.

    Scale shape: the base side collapses to <= {BLOOM_M} DISTINCT
    positions — CONSTANT-bounded, so AQE broadcasts the probe join on
    its own (no forced broadcast); the delta side is map-only digest +
    position fan-out.  At 100 TB the position set packs into an
    M/64-long bitmap via per-partition OR-aggregation (bit_or over
    packed words) and ships as one scalar array — same semantics, one
    broadcast word-array instead of a position table; the reduction
    below IS that aggregation, pre-packing.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    tagged = docs.select(
        "doc_id",
        (F.col("doc_id") % DELTA_MOD == 0).alias("is_delta"),
        F.sha2(F.col("text"), 256).alias("h"),
    )

    def pos(i: int) -> Column:
        hashed = F.md5(F.concat(F.col("h"), F.lit(f"|{i}")))
        return F.conv(F.substring(hashed, 1, 8), 16, 10).cast("long") % BLOOM_M

    positions = F.array(*[pos(i) for i in range(1, BLOOM_K + 1)])
    base_pos = (
        tagged.filter(~F.col("is_delta"))
        .select(F.explode(positions).alias("p"))
        .distinct()
        .withColumn("_in", F.lit(1))
    )
    base_h = (
        tagged.filter(~F.col("is_delta"))
        .select("h")
        .distinct()
        .withColumn("_eh", F.lit(True))
    )
    delta = tagged.filter(F.col("is_delta"))
    hits = (
        delta.select("doc_id", "h", F.explode(positions).alias("p"))
        .join(base_pos, "p", "left")
        .groupBy("doc_id", "h")
        .agg(F.sum(F.coalesce(F.col("_in"), F.lit(0))).alias("nhit"))
    )
    bloom_dup = F.col("nhit") == BLOOM_K
    exact_dup = F.coalesce(F.col("_eh"), F.lit(False))
    return hits.join(base_h, "h", "left").select(
        "doc_id",
        bloom_dup.alias("bloom_dup"),
        exact_dup.alias("exact_dup"),
        (bloom_dup & ~exact_dup).alias("false_positive"),
    )


# ---------------------------------------------------------------------------
# q99 — quality filter chain (C4/FineWeb-style admission pipeline)
# ---------------------------------------------------------------------------

CHAIN_MIN_WORDS = 40  # Gopher word-count floor (fixture-scaled)
CHAIN_MIN_QUALITY = 0.8  # q50 composite floor (~p05 of len-ok fixture docs)


def _q99_oracle() -> str:
    from datapipeline_dags_spark.plans.registry import ORACLES

    # composed at decoration time — q50/q70/q51 are registered above
    return f"""
    WITH f50 AS ({ORACLES["q50_text_quality"]}),
    f70 AS ({ORACLES["q70_repetition_filter"]}),
    f51 AS ({ORACLES["q51_lang_id"]})
    SELECT f50.doc_id, f50.n_words, f50.quality,
           (f50.n_words >= {CHAIN_MIN_WORDS}) AS len_ok,
           (f50.quality >= {CHAIN_MIN_QUALITY}) AS quality_ok,
           f70.keep AS repetition_ok,
           (f51.pred_lang = f51.lang) AS lang_ok,
           (f50.n_words >= {CHAIN_MIN_WORDS}
            AND f50.quality >= {CHAIN_MIN_QUALITY}
            AND f70.keep
            AND f51.pred_lang = f51.lang) AS keep,
           CASE WHEN f50.n_words < {CHAIN_MIN_WORDS} THEN 'too_short'
                WHEN f50.quality < {CHAIN_MIN_QUALITY} THEN 'low_quality'
                WHEN NOT f70.keep THEN 'repetitive'
                WHEN f51.pred_lang <> f51.lang THEN 'lang_mismatch'
                ELSE 'kept' END AS drop_reason
    FROM f50 JOIN f70 USING (doc_id) JOIN f51 USING (doc_id)
    """


@query("q99_quality_filter_chain", oracle=_q99_oracle())
def q99_quality_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4/FineWeb-style admission chain: length floor -> composite
    quality floor (q50) -> Gopher repetition filter (q70) -> language
    consistency (q51's prediction must agree with the declared lang),
    evaluated in that fixed order so every dropped doc carries ONE
    deterministic ``drop_reason`` — the per-stage accounting a corpus
    curation run reports.  Built by COMPOSING the registered operators
    (their DataFrames join on doc_id), demonstrating that every filter
    in the chain is reusable outside its own query.

    Scale shape: each component is a map-only/doc-keyed aggregate over
    the same scan; the composition joins on doc_id — doc-partitioned,
    no skew (doc_id unique).  A fused production variant computes all
    component columns in one pass; the chain semantics (and this
    oracle) are unchanged by that fusion.
    """
    f50 = QUERIES["q50_text_quality"](spark, sf_dir).select(
        "doc_id", "n_words", "quality"
    )
    f70 = QUERIES["q70_repetition_filter"](spark, sf_dir).select(
        "doc_id", F.col("keep").alias("repetition_ok")
    )
    f51 = QUERIES["q51_lang_id"](spark, sf_dir).select(
        "doc_id", (F.col("pred_lang") == F.col("lang")).alias("lang_ok")
    )
    len_ok = F.col("n_words") >= CHAIN_MIN_WORDS
    quality_ok = F.col("quality") >= CHAIN_MIN_QUALITY
    keep = len_ok & quality_ok & F.col("repetition_ok") & F.col("lang_ok")
    reason = (
        F.when(~len_ok, F.lit("too_short"))
        .when(~quality_ok, F.lit("low_quality"))
        .when(~F.col("repetition_ok"), F.lit("repetitive"))
        .when(~F.col("lang_ok"), F.lit("lang_mismatch"))
        .otherwise(F.lit("kept"))
    )
    return (
        f50.join(f70, "doc_id")
        .join(f51, "doc_id")
        .select(
            "doc_id",
            "n_words",
            "quality",
            len_ok.alias("len_ok"),
            quality_ok.alias("quality_ok"),
            "repetition_ok",
            "lang_ok",
            keep.alias("keep"),
            reason.alias("drop_reason"),
        )
    )


# ---------------------------------------------------------------------------
# q101 — BPE tokenizer induction (distributed greedy pair merging)
# ---------------------------------------------------------------------------

BPE_ROUNDS = 3


def _bpe_sql_round(prev_s: str, p: str, carry: str = "") -> str:
    """One unrolled oracle round: top weighted pair of ``prev_s``, then
    the rewritten symbol table.  ``carry`` names extra columns to keep
    through the rewrite (q102 carries the word itself)."""
    arr = "string_split(trim(sym), ' ')"
    return f"""
    {p} AS (SELECT pr AS pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
         SELECT unnest(list_transform(generate_series(1, len({arr}) - 1),
                i -> {arr}[i] || ' ' || {arr}[i + 1])) AS pr, freq
         FROM {prev_s}) t
       GROUP BY pr ORDER BY cnt DESC, pair LIMIT 1),
    s_{p} AS (SELECT replace(sym, ' ' || {p}.pair || ' ',
                             ' ' || replace({p}.pair, ' ', '') || ' ') AS sym,
                     freq{carry}
              FROM {prev_s}, {p})"""


def _bpe_sql_chain(carry: str = "") -> str:
    """The shared WITH-clause prefix: tok → vocab → s0 → unrolled merge
    rounds p1/s_p1 .. p{BPE_ROUNDS}/s_p{BPE_ROUNDS}."""
    rounds = []
    prev = "s0"
    for r in range(1, BPE_ROUNDS + 1):
        rounds.append(_bpe_sql_round(prev, f"p{r}", carry))
        prev = f"s_p{r}"
    return f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                 FROM documents),
    vocab AS (SELECT w, COUNT(*) AS freq FROM tok GROUP BY w),
    s0 AS (SELECT ' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' ' AS sym,
                  freq{carry}
           FROM vocab),
    {",".join(rounds)}
    """


def _q101_oracle() -> str:
    selects = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_round, pair, "
        f"replace(pair, ' ', '') AS merged, cnt AS pair_count FROM p{r}"
        for r in range(1, BPE_ROUNDS + 1)
    )
    return _bpe_sql_chain() + selects


def _bpe_pairs(sym: Column) -> Column:
    arr = F.split(F.trim(sym), " ")
    n = F.size(arr) - 1
    return F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat_ws(
                " ", F.element_at(arr, i), F.element_at(arr, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


@query("q101_bpe_merges", oracle=_q101_oracle())
def q101_bpe_merges(
    spark: SparkSession, sf_dir: str, rounds: int = BPE_ROUNDS
) -> DataFrame:
    """Distributed BPE tokenizer induction: {BPE_ROUNDS} greedy merge
    rounds over the corpus word-frequency table — per round, the
    highest-weighted adjacent symbol pair (ties → lexicographically
    first) becomes one symbol everywhere, exactly how a BPE vocabulary
    is trained.  Output is the merge table (round, pair, merged,
    weighted count) — the artifact a tokenizer ships.

    Merging uses literal left-to-right non-overlapping string replace
    on the space-joined symbol string — verified bit-identical between
    the JVM and DuckDB (' a a a a ' + 'a a' merges greedily, the
    standard BPE tie behavior for repeated symbols).

    Scale shape: everything runs on the VOCAB table (|distinct words| ×
    avg word length — orders of magnitude smaller than the corpus; the
    corpus is touched ONCE for frequencies).  Each round is one explode
    + one hash agg + a global top-1 (TakeOrderedAndProject) broadcast
    back as a 1-row join — the q69-style driver loop with bounded
    per-round state, unrolled lazily here (rounds is small and fixed,
    so the whole merge table is ONE action; a 50k-merge production run
    collects each top-1 and localCheckpoints the symbol table, the CC
    pattern).
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    vocab = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    sym = vocab.select(
        F.concat(
            F.lit(" "),
            F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")),
            F.lit(" "),
        ).alias("sym"),
        "freq",
    ).persist()

    out = None
    for r in range(1, rounds + 1):
        top = (
            sym.select(F.explode(_bpe_pairs(F.col("sym"))).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "pair")
            .limit(1)
        )
        row = top.select(
            F.lit(r).cast("long").alias("merge_round"),
            "pair",
            F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias("merged"),
            F.col("cnt").alias("pair_count"),
        )
        out = row if out is None else out.unionAll(row)
        sym = sym.crossJoin(F.broadcast(top.select("pair"))).select(
            F.replace(
                F.col("sym"),
                F.concat(F.lit(" "), F.col("pair"), F.lit(" ")),
                F.concat(
                    F.lit(" "),
                    F.replace(F.col("pair"), F.lit(" "), F.lit("")),
                    F.lit(" "),
                ),
            ).alias("sym"),
            "freq",
        )
    return out

def bpe_train(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int,
    batch_size: int = 1,
    overprovision: int = 4,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Production-scale BPE trainer: the q101 greedy loop with BATCHED
    merges — per round, collect the top ``batch_size * overprovision``
    weighted pairs, greedily keep the top ``batch_size`` that are
    pairwise NON-INTERACTING (no shared symbol), and apply them all in
    ONE rewrite pass over the symbol table.  A 50k-merge production
    vocabulary then needs ~vocab/B rounds instead of vocab rounds, and
    per-round cost stays flat: one explode + one hash agg + one
    driver-side top-k collect (the merge table is the bounded tokenizer
    artifact — collecting it is control plane, not data plane) + one
    map-only batched replace, with ``localCheckpoint`` every few rounds
    so lineage does not grow with the round count.

    Greedy-equivalence caveat (tested on the fixture): batching equals
    merge-at-a-time greedy when the batch's pairs do not interact AND no
    merge in the batch creates a new pair outweighing a later batch
    member; corpora with flat pair-count tails (real ones) satisfy this
    for small B.  Disjointness alone always guarantees the REWRITE is
    order-independent — batching never corrupts the symbol table, it
    can only reorder which merges happen first.

    Returns the merge table (merge_round, pair, merged, pair_count) —
    ``merge_round`` is the batch round the pair was applied in.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    vocab = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    sym = vocab.select(
        F.concat(
            F.lit(" "),
            F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")),
            F.lit(" "),
        ).alias("sym"),
        "freq",
    )
    sym = local_checkpoint(sym, "bpe_init")

    merges: list[tuple[int, str, str, int]] = []
    rnd = 0
    while len(merges) < n_merges:
        rnd += 1
        want = min(batch_size, n_merges - len(merges))
        cand = bounded_collect(
            sym.select(F.explode(_bpe_pairs(F.col("sym"))).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "pair")
            .limit(want * overprovision),
            want * overprovision,
            "q101_bpe_merge_batch",
        )
        if not cand:
            break
        used: set[str] = set()
        batch: list[tuple[str, int]] = []
        for row in cand:
            a, b = row.pair.split(" ")
            if a in used or b in used:
                continue
            used.update((a, b))
            batch.append((row.pair, row.cnt))
            if len(batch) == want:
                break
        if not batch:
            # every candidate interacts with a higher-count one: fall
            # back to strict top-1 for this round (always applicable).
            batch = [(cand[0].pair, cand[0].cnt)]
        merges += [(rnd, p, p.replace(" ", ""), c) for p, c in batch]
        new_sym = F.col("sym")
        for p, _ in batch:
            new_sym = F.replace(
                new_sym,
                F.lit(f" {p} "),
                F.lit(f" {p.replace(' ', '')} "),
            )
        sym = sym.select(new_sym.alias("sym"), "freq")
        if rnd % checkpoint_every == 0:
            sym = local_checkpoint(sym, f"bpe_round_{rnd}")
    return spark.createDataFrame(
        merges, "merge_round long, pair string, merged string, pair_count long"
    )


def _q102_oracle() -> str:
    last = f"s_p{BPE_ROUNDS}"
    return _bpe_sql_chain(carry=", w") + f"""
    SELECT tok,
           CAST(COUNT(DISTINCT w) AS BIGINT) AS n_words,
           CAST(SUM(freq) AS BIGINT) AS total_freq
    FROM (SELECT w, freq, unnest(string_split(trim(sym), ' ')) AS tok
          FROM {last})
    GROUP BY tok
    """


@query("q102_bpe_tokenize", oracle=_q102_oracle())
def q102_bpe_tokenize(
    spark: SparkSession, sf_dir: str, rounds: int = BPE_ROUNDS
) -> DataFrame:
    """BPE tokenizer APPLICATION: segment every distinct corpus word with
    the merge table q101 learns, then report the resulting subword
    vocabulary — (token, n_words it appears in, corpus-weighted total
    frequency).  This is the other half of shipping a tokenizer: q101
    trains the merges, q102 measures what they do to the corpus
    (fertility / subword distribution), the standard pre-training sanity
    check before a tokenizer is frozen.

    Same lazy per-round top-1-broadcast loop as q101, but the symbol
    table carries the source word so the final explode can attribute
    tokens back to words.  Everything still runs on the VOCAB table (the
    corpus is touched once for frequencies); the final step is one
    explode + one hash agg.  At a production 50k-merge scale the merge
    table is collected (it is the bounded tokenizer artifact) and the
    segmentation becomes one broadcast map pass — the shape here differs
    only in keeping the whole 3-round chain lazy so the oracle contract
    stays a single action.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    vocab = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    sym = vocab.select(
        "w",
        F.concat(
            F.lit(" "),
            F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")),
            F.lit(" "),
        ).alias("sym"),
        "freq",
    ).persist()

    for _ in range(rounds):
        top = (
            sym.select(F.explode(_bpe_pairs(F.col("sym"))).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "pair")
            .limit(1)
        )
        sym = sym.crossJoin(F.broadcast(top.select("pair"))).select(
            "w",
            F.replace(
                F.col("sym"),
                F.concat(F.lit(" "), F.col("pair"), F.lit(" ")),
                F.concat(
                    F.lit(" "),
                    F.replace(F.col("pair"), F.lit(" "), F.lit("")),
                    F.lit(" "),
                ),
            ).alias("sym"),
            "freq",
        )

    return (
        sym.select(
            "w",
            "freq",
            F.explode(F.split(F.trim(F.col("sym")), " ")).alias("tok"),
        )
        .groupBy("tok")
        .agg(
            F.countDistinct("w").cast("long").alias("n_words"),
            F.sum("freq").cast("long").alias("total_freq"),
        )
    )


# ---------------------------------------------------------------------------
# q103 — segment-level corpus-wide dedup (line-dedup analog)
# ---------------------------------------------------------------------------

# Dedup unit width in words.  Real corpora dedup at line/paragraph
# boundaries (CCNet / FineWeb line-dedup); the synthetic fixture has no
# newlines, so the unit is a fixed non-overlapping word window — the
# same unit family as q93's duplicate spans, but *removal* instead of
# detection.
SEG_W = 10


def _q103_oracle() -> str:
    return f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    segs AS (
      SELECT doc_id, i AS seg_idx,
             array_to_string(w[(i - 1) * {SEG_W} + 1 : i * {SEG_W}], ' ') AS seg
      FROM words,
           unnest(generate_series(
             1, CAST(ceil(len(w) / {SEG_W}.0) AS INT))) AS t(i)),
    ranked AS (
      SELECT doc_id, seg_idx, seg,
             row_number() OVER (PARTITION BY seg
                                ORDER BY doc_id, seg_idx) AS rn
      FROM segs)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           COALESCE(string_agg(seg, ' ' ORDER BY seg_idx)
                    FILTER (WHERE rn = 1), '') AS clean_text
    FROM ranked GROUP BY doc_id
    """


@query("q103_segment_dedup", oracle=_q103_oracle())
def q103_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level corpus-wide dedup with document reconstruction —
    the CCNet/FineWeb "line dedup" operator: every {SEG_W}-word segment
    that already appeared anywhere earlier in the corpus (first
    occurrence = lowest (doc_id, seg_idx)) is REMOVED, and each document
    is rebuilt from its surviving segments.

    Scale shape: posexplode to (doc, idx, segment) → rank within
    segment-hash partitions (shuffle key = sha2 digest, constant width,
    never the document) → rebuild via one doc-keyed agg whose
    collect_list is array_sort-ed on the carried index, so reassembly is
    deterministic without a global sort.  Two hash shuffles total, both
    on bounded keys; no window over the whole corpus.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    words = docs.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    segs = words.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(1), F.ceil(F.size(F.col("w")) / F.lit(SEG_W)).cast("int")
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("w"), (i - F.lit(1)) * SEG_W + 1, SEG_W)
                ),
            )
        ).alias("idx0", "seg"),
    ).select("doc_id", (F.col("idx0") + 1).alias("seg_idx"), "seg")
    ranked = segs.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy(F.sha2(F.col("seg"), 256)).orderBy("doc_id", "seg_idx")
        ),
    )
    return ranked.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_segments"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).cast("long").alias("n_dropped"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("rn") == 1, F.struct("seg_idx", "seg"))
                    )
                ),
                lambda s: s["seg"],
            ),
        ).alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# q104 — PMI collocations (corpus-level bigram association mining)
# ---------------------------------------------------------------------------

PMI_MIN_COUNT = 5  # bigram support floor (drops noise pairs)
PMI_TOP_K = 50


def _q104_oracle() -> str:
    return f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    toks AS (SELECT unnest(words) AS tok FROM w),
    uni AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT SUM(c) AS t FROM uni),
    bi AS (SELECT words[i] AS a, words[i+1] AS b
           FROM w, unnest(generate_series(1, len(words) - 1)) t(i)),
    bcnt AS (SELECT a, b, COUNT(*) AS cab FROM bi GROUP BY a, b),
    btot AS (SELECT SUM(cab) AS bt FROM bcnt),
    scored AS (
      SELECT a, b, cab,
             (cab * 1.0 * t * t) / (ua.c * 1.0 * ub.c * bt) AS ratio
      FROM bcnt JOIN uni ua ON bcnt.a = ua.tok
                JOIN uni ub ON bcnt.b = ub.tok, tot, btot
      WHERE cab >= {PMI_MIN_COUNT})
    SELECT a, b, CAST(cab AS BIGINT) AS n_pair,
           {sql_dec('log2(ratio)', 6)} AS pmi
    FROM scored
    ORDER BY ratio DESC, a, b LIMIT {PMI_TOP_K}
    """


@query("q104_pmi_collocations", oracle=_q104_oracle())
def q104_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocation mining: the corpus-level
    bigram pairs that co-occur far more than their unigram frequencies
    predict — the classic multi-word-expression / tokenizer-seed signal
    (Church & Hanks 1990).

    Scale shape: ONE token explode feeds the unigram hash agg, one
    zip_with bigram explode feeds the pair agg; the two corpus totals
    are 1-row aggregates broadcast into the scoring join; the bigram →
    unigram joins shuffle on the token key only (never document text).
    The final TOP_K is TakeOrderedAndProject — no global sort.  The
    ranking key is the raw count ratio (monotone with PMI) rather than
    the PMI itself: it is one double multiply/divide chain evaluated in
    the same operand order by both engines — identical IEEE expression,
    NOT exact integer arithmetic (the products exceed 2^53 well below
    production scale) — which keeps the k-boundary engine-agreed while
    avoiding each engine's own log implementation; log2 is applied only
    to the reported column.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    words = F.split(F.col("text"), " ")
    w = docs.select(words.alias("words"))
    uni = (
        w.select(F.explode("words").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    tot = uni.agg(F.sum("c").alias("t"))
    n1 = F.size(F.col("words")) - 1
    pairs = F.zip_with(
        F.slice(F.col("words"), 1, n1),
        F.slice(F.col("words"), 2, n1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    bcnt = (
        w.select(F.explode(pairs).alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count("*").alias("cab"))
    )
    # total over ALL bigrams (the probability denominator) = Σ(len−1),
    # a map-only 1-row aggregate over the doc scan — avoids re-running
    # the bigram aggregation just for its sum; support floor applies
    # only to the scored candidates
    btot = w.agg(F.sum(F.greatest(n1, F.lit(0))).alias("bt"))
    bcnt = bcnt.filter(F.col("cab") >= PMI_MIN_COUNT)
    ua = uni.select(F.col("tok").alias("a"), F.col("c").alias("ca"))
    ub = uni.select(F.col("tok").alias("b"), F.col("c").alias("cb"))
    scored = (
        bcnt.join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .withColumn(
            "ratio",
            (F.col("cab") * 1.0 * F.col("t") * F.col("t"))
            / (F.col("ca") * 1.0 * F.col("cb") * F.col("bt")),
        )
    )
    return (
        scored.orderBy(F.desc("ratio"), "a", "b")
        .limit(PMI_TOP_K)
        .select(
            "a",
            "b",
            F.col("cab").cast("long").alias("n_pair"),
            dec(F.log2("ratio"), 6).alias("pmi"),
        )
    )


# ---------------------------------------------------------------------------
# q105 — temperature-smoothed multilingual mixture sampling
# ---------------------------------------------------------------------------

MIX_ALPHA = 0.3  # smoothing exponent (XLM-R / mT5 style)
MIX_TARGET_N = 250  # expected sample size at fixture scale


def _q105_oracle() -> str:
    rate = f"LEAST(1.0, (w / sw) * {MIX_TARGET_N} / nl)"
    return f"""
    WITH lc AS (SELECT lang, COUNT(*) AS nl FROM documents GROUP BY lang),
    wt AS (SELECT lang, nl, POW(nl, {MIX_ALPHA}) AS w FROM lc),
    sm AS (SELECT SUM(w) AS sw FROM wt),
    rates AS (SELECT lang, {rate} AS rate FROM wt, sm)
    SELECT d.doc_id, d.lang, {sql_dec('r.rate', 6)} AS rate
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
          / 4294967296.0 < r.rate
    """


@query("q105_alpha_mixture_sample", oracle=_q105_oracle())
def q105_alpha_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed language mixture sampling: acceptance rate
    per language ∝ n_l^α / n_l (α = 0.3), so low-resource languages are
    up-weighted relative to their corpus share — the standard
    multilingual rebalancing curve (XLM-R), generalizing q73's uniform
    rebalance.

    Scale shape: the per-language rate table is a tiny aggregate
    (|langs| rows) broadcast into a map-only accept filter over the
    corpus; the coin is the md5 fraction of the doc key (reproducible
    across re-runs, resharding, and engines — no RNG state).
    """
    docs = table(spark, sf_dir, "documents")
    lc = docs.groupBy("lang").agg(F.count("*").alias("nl"))
    wt = lc.withColumn("w", F.pow("nl", F.lit(MIX_ALPHA)))
    sm = wt.agg(F.sum("w").alias("sw"))
    rates = wt.crossJoin(F.broadcast(sm)).select(
        "lang",
        F.least(
            F.lit(1.0), (F.col("w") / F.col("sw")) * MIX_TARGET_N / F.col("nl")
        ).alias("rate"),
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        / F.lit(4294967296.0)
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(u < F.col("rate"))
        .select("doc_id", "lang", dec(F.col("rate"), 6).alias("rate"))
    )


# ---------------------------------------------------------------------------
# q106 — token-level text cleaning (stopword / short-token / stutter strip)
# ---------------------------------------------------------------------------

CLEAN_MIN_TOKEN_LEN = 3


def _q106_oracle() -> str:
    keep = (
        f"list_filter(w, x -> len(x) >= {CLEAN_MIN_TOKEN_LEN} "
        f"AND NOT list_contains({list(STOPWORDS)!r}, x))"
    )
    return f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    f AS (SELECT doc_id, len(w) AS n_before, {keep} AS kept FROM t),
    c AS (SELECT doc_id, n_before,
                 list_filter(kept, (x, i) -> i = 1 OR kept[i - 1] != x) AS cw
          FROM f)
    SELECT doc_id,
           CAST(n_before AS BIGINT) AS n_before,
           CAST(len(cw) AS BIGINT) AS n_after,
           array_to_string(cw, ' ') AS clean_text
    FROM c
    """


@query("q106_token_cleaning", oracle=_q106_oracle())
def q106_token_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level cleaning: drop stopwords and sub-length tokens, then
    collapse consecutive repeats ("a a a" → "a") — the C4-style
    normalization pass that runs before dedup so near-identical noise
    doesn't defeat exact hashing.

    Scale shape: map-only — every step is a higher-order array lambda
    (filter with index) inside whole-stage codegen; no shuffle, no UDF,
    trivially partition-parallel at any corpus size.
    """
    docs = table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    kept = F.filter(
        w,
        lambda x: (F.length(x) >= CLEAN_MIN_TOKEN_LEN) & ~x.isin(*STOPWORDS),
    )
    docs = docs.select("doc_id", F.size(w).alias("n_before"), kept.alias("kept"))
    collapsed = F.filter(
        F.col("kept"),
        lambda x, i: (i == 0) | (F.col("kept")[i - 1] != x),
    )
    return docs.select(
        "doc_id",
        F.col("n_before").cast("long").alias("n_before"),
        F.size(collapsed).cast("long").alias("n_after"),
        F.concat_ws(" ", collapsed).alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# q107 — per-document token entropy / lexical-diversity features
# ---------------------------------------------------------------------------


def _q107_oracle() -> str:
    ent = "log2(total * 1.0) - (slc / total)"
    return f"""
    WITH uni AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
    cnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM uni GROUP BY doc_id, tok),
    st AS (SELECT doc_id, SUM(c) AS total, COUNT(*) AS ndist,
                  SUM(c * log2(c * 1.0)) AS slc
           FROM cnt GROUP BY doc_id)
    SELECT doc_id,
           CAST(total AS BIGINT) AS n_tokens,
           CAST(ndist AS BIGINT) AS n_distinct,
           {sql_dec('ndist * 1.0 / total', 6)} AS type_token_ratio,
           {sql_dec(ent, 6)} AS entropy_bits
    FROM st
    """


@query("q107_token_entropy", oracle=_q107_oracle())
def q107_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram entropy and type-token ratio — the
    lexical-diversity quality features (low entropy = templated/spam
    text) used alongside q50's ratios and q70's repetition fractions.

    Entropy via the algebraic form H = log2(N) − Σc·log2(c)/N so both
    engines sum the SAME per-token terms (one two-level hash agg: token
    counts, then per-doc moments — the q70 shape, shuffle on (doc,tok)
    hash then doc).
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    cnt = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    st = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("total"),
        F.count("*").alias("ndist"),
        F.sum(F.col("c") * F.log2(F.col("c") * 1.0)).alias("slc"),
    )
    return st.select(
        "doc_id",
        F.col("total").cast("long").alias("n_tokens"),
        F.col("ndist").cast("long").alias("n_distinct"),
        dec(F.col("ndist") * 1.0 / F.col("total"), 6).alias("type_token_ratio"),
        dec(
            F.log2(F.col("total") * 1.0) - F.col("slc") / F.col("total"), 6
        ).alias("entropy_bits"),
    )


# ---------------------------------------------------------------------------
# q109 — fuzzy cross-split decontamination (MinHash-LSH eval-vs-train)
# ---------------------------------------------------------------------------


def _q109_oracle() -> str:
    bucket = f"('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % {EVAL_MOD}"
    sig_cols = ", ".join(
        f"list_min(list_transform(hp, p -> p.h1 + {i} * p.h2)) AS m{i}"
        for i in range(MINHASH_H)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, is_eval, {b} AS band, {key} AS key FROM sig".format(
            b=b,
            key=" || '|' || ".join(
                f"CAST(m{b * LSH_R + r} AS VARCHAR)" for r in range(LSH_R)
            ),
        )
        for b in range(LSH_B)
    )
    return f"""
    WITH docs AS (SELECT doc_id, {bucket} = 0 AS is_eval, {_SHINGLES_SQL} AS sh
                  FROM documents),
    hp AS (SELECT doc_id, is_eval, sh,
           list_transform(list_transform(sh, s -> md5(s)),
             h -> {{'h1': ('0x' || substr(h, 1, 15))::BIGINT,
                    'h2': ('0x' || substr(h, 17, 8))::BIGINT}}) AS hp
           FROM docs),
    sig AS (SELECT doc_id, is_eval, {sig_cols} FROM hp),
    bands AS ({band_selects}),
    tb AS (SELECT doc_id, band, key FROM bands WHERE NOT is_eval
           QUALIFY row_number() OVER (PARTITION BY band, key
                                      ORDER BY doc_id) <= {BUCKET_CAP}),
    eb AS (SELECT doc_id, band, key FROM bands WHERE is_eval),
    cand AS (SELECT DISTINCT eb.doc_id AS eval_id, tb.doc_id AS train_id
             FROM eb JOIN tb ON eb.band = tb.band AND eb.key = tb.key),
    verified AS (
      SELECT c.eval_id, c.train_id,
             len(list_intersect(de.sh, dt.sh)) * 1.0
               / len(list_distinct(list_concat(de.sh, dt.sh))) AS j
      FROM cand c
      JOIN docs de ON de.doc_id = c.eval_id
      JOIN docs dt ON dt.doc_id = c.train_id),
    hits AS (SELECT eval_id, COUNT(*) AS nc, MAX(j) AS mj
             FROM verified WHERE j >= {JACCARD_T} GROUP BY eval_id)
    SELECT d.doc_id,
           CAST(COALESCE(h.nc, 0) AS BIGINT) AS n_contaminating,
           (ROUND(COALESCE(h.mj, 0.0), 6) + 0.0) AS max_jaccard,
           COALESCE(h.nc, 0) > 0 AS contaminated
    FROM docs d LEFT JOIN hits h ON d.doc_id = h.eval_id
    WHERE d.is_eval
    """


@query("q109_lsh_decontamination", oracle=_q109_oracle())
def q109_lsh_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy cross-split decontamination: every held-out (eval) document
    checked for NEAR-duplicate training documents via MinHash-LSH band
    blocking + exact-Jaccard verify — catching the paraphrased /
    lightly-edited leaks that q95's exact 13-gram overlap misses
    (q41's machinery pointed across the q95 split instead of at itself).

    Scale shape: ONE signature pass over the tagged union corpus; the
    eval band table (1/{EVAL_MOD} of the corpus) joins the train band
    table hash-partitioned on constant-width (band, key) — never
    all-pairs; train buckets carry the q41 BUCKET_CAP; exact Jaccard
    touches candidates only.
    """
    from pyspark.storagelevel import StorageLevel

    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % EVAL_MOD
    )
    docs = (
        _fanout(spark, table(spark, sf_dir, "documents"))
        .select(
            "doc_id", (bucket == 0).alias("is_eval"),
            _shingles(F.col("text")).alias("sh"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    hp = F.transform(
        F.transform(F.col("sh"), lambda s: F.md5(s)),
        lambda h: F.struct(
            F.conv(F.substring(h, 1, 15), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(h, 17, 8), 16, 10).cast("long").alias("h2"),
        ),
    )
    hashed = docs.select("doc_id", "is_eval", hp.alias("hp"))

    def minhash(i: int) -> Column:
        mult = F.lit(i).cast("long")
        return F.array_min(
            F.transform(F.col("hp"), lambda p: p["h1"] + mult * p["h2"])
        )

    sigs = hashed.select(
        "doc_id", "is_eval", *[minhash(i).alias(f"m{i}") for i in range(MINHASH_H)]
    )
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|", *[F.col(f"m{b * LSH_R + r}") for r in range(LSH_R)]
                ).alias("key"),
            )
            for b in range(LSH_B)
        ]
    )
    bands = sigs.select(
        "doc_id", "is_eval", F.explode(band_entries).alias("bk")
    ).select("doc_id", "is_eval", "bk.band", "bk.key")
    tb = (
        bands.filter(~F.col("is_eval"))
        .withColumn(
            "rn",
            F.row_number().over(W.partitionBy("band", "key").orderBy("doc_id")),
        )
        .filter(F.col("rn") <= BUCKET_CAP)
        .select(F.col("doc_id").alias("train_id"), "band", "key")
    )
    eb = bands.filter(F.col("is_eval")).select(
        F.col("doc_id").alias("eval_id"), "band", "key"
    )
    cand = eb.join(tb, ["band", "key"]).select("eval_id", "train_id").distinct()
    de = docs.select(F.col("doc_id").alias("eval_id"), F.col("sh").alias("esh"))
    dt = docs.select(F.col("doc_id").alias("train_id"), F.col("sh").alias("tsh"))
    j = F.size(F.array_intersect("esh", "tsh")) * 1.0 / F.size(
        F.array_distinct(F.concat("esh", "tsh"))
    )
    hits = (
        cand.join(de, "eval_id")
        .join(dt, "train_id")
        .withColumn("j", j)
        .filter(F.col("j") >= JACCARD_T)
        .groupBy("eval_id")
        .agg(F.count("*").alias("nc"), F.max("j").alias("mj"))
    )
    return (
        docs.filter(F.col("is_eval"))
        .select("doc_id")
        .join(hits, docs.doc_id == hits.eval_id, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("nc"), F.lit(0)).cast("long").alias("n_contaminating"),
            dec(F.coalesce(F.col("mj"), F.lit(0.0)), 6).alias("max_jaccard"),
            (F.coalesce(F.col("nc"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# q110 — per-source quota cap (domain-cap admission)
# ---------------------------------------------------------------------------

SOURCE_QUOTA = 15  # max docs admitted per source (binds at every fixture SF)


def _q110_oracle() -> str:
    q = "LEAST(1.0, nw / 50.0) * (1 - nstop * 1.0 / nw)"
    return f"""
    WITH t AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS nw,
             len(list_filter(string_split(text, ' '),
                 w -> list_contains({list(STOPWORDS)!r}, w))) AS nstop
      FROM documents),
    ranked AS (
      SELECT doc_id, source, ROUND({q}, 4) + 0.0 AS score,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY ROUND({q}, 4) DESC, doc_id) AS rk
      FROM t)
    SELECT doc_id, source, score, CAST(rk AS BIGINT) AS source_rank
    FROM ranked WHERE rk <= {SOURCE_QUOTA}
    """


@query("q110_source_quota_cap", oracle=_q110_oracle())
def q110_source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota admission: keep only the SOURCE_QUOTA
    highest-quality documents from each source — the per-domain cap a
    web-crawl pipeline applies so no single site dominates the corpus
    (quality = q50/q72's composite; rounded BEFORE ranking so the
    cutoff is float-stable across engines; doc_id tiebreak makes the
    selection a total order).

    Scale shape: one window top-k per source key — a single shuffle on
    source, rank truncation map-side after it (no global sort).  A
    pathologically hot source is exactly the case the cap exists for;
    at extreme skew the q41 salting/AQE machinery applies upstream.
    """
    docs = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    nw = F.size(words)
    nstop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    score = dec(F.least(F.lit(1.0), nw / F.lit(50.0)) * (1 - nstop / nw), 4)
    ranked = docs.select("doc_id", "source", score.alias("score")).withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("source").orderBy(F.desc("score"), "doc_id")
        ),
    )
    return ranked.filter(F.col("rk") <= SOURCE_QUOTA).select(
        "doc_id", "source", "score", F.col("rk").cast("long").alias("source_rank")
    )


# ---------------------------------------------------------------------------
# q111 — winsorized (percentile-clipped) robust feature statistics
# ---------------------------------------------------------------------------

WINSOR_LO = 0.05
WINSOR_HI = 0.95


def _q111_oracle() -> str:
    return f"""
    WITH b AS (
      SELECT event_type,
             quantile_cont(value, {WINSOR_LO}) AS lo,
             quantile_cont(value, {WINSOR_HI}) AS hi
      FROM events GROUP BY event_type),
    c AS (
      SELECT e.event_type,
             GREATEST(b.lo, LEAST(b.hi, e.value)) AS cv,
             CASE WHEN e.value < b.lo OR e.value > b.hi THEN 1 ELSE 0 END AS clipped
      FROM events e JOIN b ON e.event_type = b.event_type)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(clipped) AS BIGINT) AS n_clipped,
           {sql_dec('AVG(cv)', 4)} AS clipped_mean,
           {sql_dec('STDDEV_SAMP(cv)', 4)} AS clipped_std
    FROM c GROUP BY event_type
    """


@query("q111_winsorized_stats", oracle=_q111_oracle())
def q111_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized feature statistics: per-type values clipped to the
    [p05, p95] band before mean/std — the outlier-robust normalization
    a feature pipeline applies before training (clipping bounds double
    as the serving-time clamp).

    Scale shape: pass 1 computes exact interpolated percentiles per
    bounded-cardinality type key (q59's pattern; approx_percentile is
    the same call shape when group counts explode); the |types|-row
    bounds table broadcasts into a map-only clip + one hash agg.
    """
    ev = table(spark, sf_dir, "events")
    pct = F.percentile("value", F.array(F.lit(WINSOR_LO), F.lit(WINSOR_HI)))
    bounds = ev.groupBy("event_type").agg(
        F.element_at(pct, 1).alias("lo"), F.element_at(pct, 2).alias("hi")
    )
    cv = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("value")))
    clipped = (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .select("event_type", cv.alias("cv"), clipped.cast("int").alias("clipped"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("clipped").cast("long").alias("n_clipped"),
            dec(F.avg("cv"), 4).alias("clipped_mean"),
            dec(F.stddev_samp("cv"), 4).alias("clipped_std"),
        )
    )


# ---------------------------------------------------------------------------
# q112 — IVF-PQ combined ANN (cell-restricted ADC over residual codes)
# ---------------------------------------------------------------------------


def _q112_oracle() -> str:
    d, dim = PQ_D, 64
    res = (
        f"list_transform(generate_series(1, {dim}), "
        "i -> embedding[i]::DOUBLE - ce[i]::DOUBLE)"
    )
    return f"""
    WITH {_ANN_PARAMS_SQL},
    cent AS (SELECT vec_id AS ccid, embedding AS ce FROM embeddings
                  WHERE vec_id < (SELECT n_cent FROM ann_p)),
    scored0 AS (
      SELECT e.vec_id, e.embedding, c.ccid,
             {_COS_SQL.format(a='e.embedding', b='c.ce')} AS cs
      FROM embeddings e CROSS JOIN cent c),
    cells AS (
      SELECT vec_id, embedding, ccid AS cell FROM (
        SELECT vec_id, embedding, ccid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, ccid) AS rn
        FROM scored0) t
      WHERE rn = 1),
    resid AS (
      SELECT cl.vec_id, cl.cell, {res} AS res
      FROM cells cl JOIN cent ON cent.ccid = cl.cell),
    cbres AS (SELECT vec_id AS cid, res AS re FROM resid WHERE vec_id < {PQ_K}),
    ms AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m),
    csub AS (SELECT cid, m, re[m*{d}+1 : m*{d}+{d}] AS cs FROM cbres, ms),
    enc0 AS (SELECT r.vec_id, r.cell, c.m, c.cid,
             list_reduce(list_transform(generate_series(1, {d}),
               i -> (r.res[c.m*{d}+i] - c.cs[i]) * (r.res[c.m*{d}+i] - c.cs[i])),
               (a, b) -> a + b) AS dist
             FROM resid r CROSS JOIN csub c),
    codes AS (SELECT vec_id, cell, m, cid FROM (
              SELECT vec_id, cell, m, cid,
                     ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                        ORDER BY dist, cid) AS rn
              FROM enc0) WHERE rn = 1),
    probes AS (
      SELECT vec_id AS q_id, embedding AS qe, ccid AS cell,
             list_reduce(list_transform(generate_series(1, {dim}),
               i -> embedding[i]::DOUBLE * ce[i]::DOUBLE),
               (a, b) -> a + b) AS base
      FROM (
        SELECT s.vec_id, s.embedding, s.ccid, c.ce,
               ROW_NUMBER() OVER (PARTITION BY s.vec_id
                                  ORDER BY s.cs DESC, s.ccid) AS rn
        FROM scored0 s JOIN cent c ON c.ccid = s.ccid
        WHERE s.vec_id < {N_QUERIES}) t
      WHERE rn <= (SELECT nprobe FROM ann_p)),
    lut AS (SELECT q.vec_id AS q_id, c.m, c.cid,
            list_reduce(list_transform(generate_series(1, {d}),
              i -> q.embedding[c.m*{d}+i]::DOUBLE * c.cs[i]),
              (a, b) -> a + b) AS pd
            FROM embeddings q CROSS JOIN csub c WHERE q.vec_id < {N_QUERIES}),
    adc AS (SELECT p.q_id, co.vec_id AS neighbor_id,
            ANY_VALUE(p.base) + list_reduce(array_agg(l.pd ORDER BY l.m),
                                            (a, b) -> a + b) AS s
            FROM probes p
            JOIN codes co ON co.cell = p.cell AND co.vec_id != p.q_id
            JOIN lut l ON l.q_id = p.q_id AND l.m = co.m AND l.cid = co.cid
            GROUP BY p.q_id, co.vec_id),
    r AS (SELECT q_id, neighbor_id,
          ROW_NUMBER() OVER (PARTITION BY q_id
                             ORDER BY ROUND(s, 6) DESC, neighbor_id) AS srank
          FROM adc),
    short AS (SELECT q_id, neighbor_id FROM r
              WHERE srank <= (SELECT refine FROM ann_p)),
    ref AS (SELECT s.q_id, s.neighbor_id,
            (ROUND({_COS_SQL.format(a='qa.embedding', b='qc.embedding')}, 6) + 0.0) AS cos_sim
            FROM short s
            JOIN embeddings qa ON qa.vec_id = s.q_id
            JOIN embeddings qc ON qc.vec_id = s.neighbor_id),
    rr AS (SELECT q_id, neighbor_id, cos_sim,
           ROW_NUMBER() OVER (PARTITION BY q_id
                              ORDER BY cos_sim DESC, neighbor_id) AS rank
           FROM ref)
    SELECT q_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank
    FROM rr WHERE rank <= {TOPK}
    """


# --- shared IVF-PQ expressions (q112 / q307 and the streaming
# IvfPqIndexMaintainer read ONE definition, the q75/_pq_* pattern on
# the residual-coding composition) ---


def _ivfpq_cents_row(corpus: DataFrame, n_cent: int) -> DataFrame:
    """The coarse quantizer as ONE broadcastable struct row, sorted by
    contiguous ccid so ``element_at(cents, cell+1)`` is the assigned
    centroid."""
    return (
        corpus.filter(F.col("vec_id") < n_cent)
        .select(F.col("vec_id").alias("ccid"), F.col("embedding").alias("ce"))
        .agg(F.array_sort(F.collect_list(F.struct("ccid", "ce"))).alias("cents"))
    )


def _ivfpq_best_cell(emb: Column) -> Column:
    """q47's argmax assignment (cosine, lowest-ccid tie) against the
    broadcast ``cents`` row."""
    top = F.array_max(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                _cosine(emb, c["ce"]).alias("cs"), (-c["ccid"]).alias("ncid")
            ),
        )
    )
    return -top["ncid"]


def _ivfpq_res_col() -> Column:
    """The residual embedding − centroid(cell) as double — reads the
    ``embedding``, ``cell`` and broadcast ``cents`` columns."""
    return F.zip_with(
        "embedding",
        F.element_at(F.col("cents"), (F.col("cell") + 1).cast("int"))["ce"],
        lambda x, y: x.cast("double") - y.cast("double"),
    )


def _ivfpq_res_codebook_row(resid: DataFrame) -> DataFrame:
    """The frozen residual codebook as ONE broadcastable struct row:
    the first PQ_K vectors' RESIDUALS, sorted by cid."""
    return (
        resid.filter(F.col("vec_id") < PQ_K)
        .select(F.col("vec_id").alias("cid"), F.col("res").alias("re"))
        .agg(F.array_sort(F.collect_list(F.struct("cid", "re"))).alias("cbs"))
    )


# subvector slicing is layout-identical for raw embeddings and
# residuals — one definition, not a stale twin
_ivfpq_res_sub = _pq_sub


def _ivfpq_res_l2(a: Column, b: Column) -> Column:
    # residuals are already double — NO cast, unlike _pq_l2 (casting
    # would be a no-op but the expression must mirror the oracle's)
    diff2 = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diff2, F.lit(0.0), lambda acc, v: acc + v)


def _ivfpq_codes_col() -> Column:
    """PQ_M argmin-L2 codes of the ``res`` column against the broadcast
    residual codebook ``cbs`` — q112's JVM encode."""
    ms = F.sequence(F.lit(0), F.lit(PQ_M - 1))
    return F.transform(
        ms,
        lambda m: F.array_min(
            F.transform(
                F.col("cbs"),
                lambda c: F.struct(
                    _ivfpq_res_l2(
                        _ivfpq_res_sub(F.col("res"), m),
                        _ivfpq_res_sub(c["re"], m),
                    ).alias("d"),
                    c["cid"].alias("cid"),
                ),
            )
        )["cid"],
    )


def _ivfpq_lut_col() -> Column:
    """Per-query residual-codebook LUT: lut[m][cid] = dot(query
    subvector m, residual centroid cid's subvector m) — reads the
    ``qe`` and broadcast ``cbs`` columns."""
    ms = F.sequence(F.lit(0), F.lit(PQ_M - 1))
    return F.transform(
        ms,
        lambda m: F.transform(
            F.col("cbs"),
            lambda c: _pq_dot(
                _ivfpq_res_sub(F.col("qe"), m), _ivfpq_res_sub(c["re"], m)
            ),
        ),
    )


def _ivfpq_encode_numpy(spark: SparkSession, resid: DataFrame) -> DataFrame:
    """PQ residual encoding as one BLAS distance matrix per Arrow batch.

    The codebook is PQ_K residual vectors — a fixed-size model
    parameter collected once to the driver (bounded control plane, cf.
    the 1-row broadcast aggregates) and closed over by the encoder.
    Per batch and subspace m: distances = ||R_m[:,None] - C_m[None]||²
    (n × PQ_K), codes = argmin — numpy's argmin takes the FIRST minimum,
    which is the lowest cid, matching the JVM/oracle tiebreak.
    """
    import numpy as np
    import pandas as pd

    from datapipeline_dags_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    cb_rows = bounded_collect(
        resid.filter(F.col("vec_id") < PQ_K).select("vec_id", "res"),
        PQ_K,
        "pq_codebook",
    )
    cb_rows = sorted(cb_rows, key=lambda r: r["vec_id"])
    # positional indexing below assumes vec_ids 0..PQ_K-1 are ALL present;
    # a fixture missing one id would silently shift every code, so fail
    # loudly instead (the JVM path's element_at(cell+1) shares this
    # contract).
    got = [r["vec_id"] for r in cb_rows]
    if got != list(range(PQ_K)):
        raise ValueError(
            f"PQ codebook requires contiguous vec_ids 0..{PQ_K - 1}, got {got}"
        )
    cb = np.array([r["res"] for r in cb_rows], dtype=np.float64)

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            r = np.stack(pdf["res"].to_numpy()).astype(np.float64)
            codes = np.empty((len(pdf), PQ_M), dtype=np.int32)
            for m in range(PQ_M):
                rm = r[:, m * PQ_D : (m + 1) * PQ_D]
                cm = cb[:, m * PQ_D : (m + 1) * PQ_D]
                d = ((rm[:, None, :] - cm[None, :, :]) ** 2).sum(-1)
                codes[:, m] = d.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cell": pdf["cell"],
                    "codes": list(codes),
                }
            )

    return resid.mapInPandas(encode, schema="vec_id long, cell long, codes array<int>")


@query("q112_ann_ivfpq", oracle=_q112_oracle())
def q112_ann_ivfpq(
    spark: SparkSession,
    sf_dir: str,
    *,
    encode_backend: str | None = None,
    cells: DataFrame | None = None,
    pair_scores: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ: the production billion-vector ANN layout (FAISS IVFPQ) —
    coarse cells restrict WHICH vectors a query scores (q47), residual
    product-quantization compresses HOW each one is scored (q75), and
    an exact-cosine refine fixes the shortlist.

    score(q, v) ≈ dot(q, cell_centroid) + Σ_m lut_m[code_m], where the
    codes quantize the RESIDUAL v − centroid(cell(v)) — residual coding
    is what separates IVF-PQ from naively stacking q47 on q75: residual
    magnitudes are much smaller than raw vectors, so the same PQ_K
    codebook spends its resolution on the within-cell detail.

    Scale design: corpus touched by exactly TWO map-only passes
    (assign+residual, then encode) against two broadcast 1-row
    codebooks; the ADC pass reads ONLY (vec_id, cell, codes) joined to
    the broadcast N_QUERIES×NPROBE probe list — each query scores only
    its probed cells' members (the IVF restriction the flat q75 pass
    lacks); full vectors are re-read only for the PQ_REFINE shortlist.
    Shuffles: the two top-k windows, nothing else.  Every double sum
    accumulates strictly left-to-right on both engines (ANY_VALUE(base)
    first, then the m-ordered LUT fold), so even the ADC scores
    hash-match the oracle.
    """
    corpus = table(spark, sf_dir, "embeddings")
    n_cent, nprobe, refine = ann_params(corpus_size(spark, sf_dir))
    # (_ivfpq_* are the shared module-level definitions q307 and the
    # streaming IvfPqIndexMaintainer reuse.)
    cent1 = _ivfpq_cents_row(corpus, n_cent)
    dot = _pq_dot

    # pass 1: cell assignment + residual (cents sorted by contiguous ccid,
    # so element_at(cell+1) is the assigned centroid).  ``cells`` may
    # carry a precomputed (persisted) assignment from
    # ``ivf_cell_assignment`` — bit-identical to the inline argmax (same
    # (cosine, lowest-cid) expression against the same first-n_cent
    # quantizer; the ann_audit_frames route shares ONE assignment pass
    # between q47 and q112); None keeps the fused assign+residual pass.
    if cells is not None:
        resid = cells.crossJoin(F.broadcast(cent1)).select(
            "vec_id", "cell", _ivfpq_res_col().alias("res")
        )
    else:
        resid = (
            _fanout(spark, corpus)
            .crossJoin(F.broadcast(cent1))
            .withColumn("cell", _ivfpq_best_cell(F.col("embedding")))
            .select("vec_id", "cell", _ivfpq_res_col().alias("res"))
        )
    cbres1 = _ivfpq_res_codebook_row(resid)
    codes_col = _ivfpq_codes_col()
    # pass 2: encode residuals against the residual codebook.
    # REGISTERED DEFAULT (None) auto-selects "numpy" when numpy imports
    # — the q96 pair_backend pattern; SCALING.md shows jvm encode at
    # 3.3x at 10x (it carries ann_params' extra recall work through a
    # per-row HOF argmin) vs numpy near-flat at identical recall and
    # identical codes (bit-equal on the fixture, asserted in tests;
    # hash-green vs the oracle).  "jvm" remains the pure-SQL fallback
    # and the plan the DuckDB oracle mirrors expression-for-expression.
    if encode_backend is None:
        encode_backend = "numpy" if _numpy_available() else "jvm"
    if encode_backend == "numpy":
        codes = _ivfpq_encode_numpy(spark, resid)
    else:
        codes = resid.crossJoin(F.broadcast(cbres1)).select(
            "vec_id", "cell", codes_col.alias("codes")
        )
    # probe list: top-NPROBE cells per query with the dot(q, centroid) base
    queries = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    pw = W.partitionBy("q_id").orderBy(F.col("cs").desc(), "cell")
    probes = (
        queries.crossJoin(F.broadcast(cent1))
        .select("q_id", "qe", F.explode("cents").alias("c"))
        .select(
            "q_id",
            "qe",
            F.col("c.ccid").alias("cell"),
            _cosine(F.col("qe"), F.col("c.ce")).alias("cs"),
            dot(F.col("qe"), F.col("c.ce")).alias("base"),
        )
        .withColumn("rn", F.row_number().over(pw))
        .filter(F.col("rn") <= nprobe)
        .select("q_id", "cell", "base")
    )
    # per-query LUT over the residual codebook
    qlut = queries.crossJoin(F.broadcast(cbres1)).select(
        "q_id", _ivfpq_lut_col().alias("lut")
    )
    adc_sum = F.aggregate(
        F.zip_with("lut", "codes", lambda l, c: F.element_at(l, (c + 1).cast("int"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        codes.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .join(F.broadcast(qlut), "q_id")
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            dec(F.col("base") + adc_sum, 6).alias("approx"),
        )
    )
    sw = W.partitionBy("q_id").orderBy(F.col("approx").desc(), "neighbor_id")
    short = (
        scored.withColumn("srank", F.row_number().over(sw))
        .filter(F.col("srank") <= refine)
        .select("q_id", "neighbor_id")
    )
    if pair_scores is not None:
        # the shortlist's exact cosines come from the shared pre-scored
        # pair table (ann_audit_frames) instead of a re-join + re-score
        refined = F.broadcast(short).join(pair_scores, ["q_id", "neighbor_id"])
    else:
        vec = corpus.select("vec_id", "embedding")
        refined = (
            F.broadcast(short)
            .join(
                vec.select(
                    F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
                ),
                "q_id",
            )
            .join(
                vec.select(
                    F.col("vec_id").alias("neighbor_id"),
                    F.col("embedding").alias("ne"),
                ),
                "neighbor_id",
            )
            .select(
                "q_id",
                "neighbor_id",
                dec(_cosine(F.col("qe"), F.col("ne")), 6).alias("cos_sim"),
            )
        )
    w2 = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        refined.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= TOPK)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# q90 — ANN recall measurement (approximate operators vs the exact baseline)
# ---------------------------------------------------------------------------

#: (method, query fn name, k) — each approximate ANN operator is measured
#: at ITS OWN k against the exact top-k (q45) truncated to the same k.
#: Built ONCE, here, after every member's registration (this section
#: deliberately sits below q112 in the file) — the roster, the q90
#: query, and its oracle registration are adjacent, so adding a method
#: means adding a line HERE and nothing else.
ANN_RECALL_METHODS = (
    ("lsh", "q46_ann_lsh_bucketed", LSH_K),
    ("ivf", "q47_ann_ivf", IVF_K),
    ("pq", "q75_ann_pq", TOPK),
    ("ivfpq", "q112_ann_ivfpq", TOPK),
)


def _recall_row(
    name: str, approx: DataFrame, exact: DataFrame, k: int
) -> DataFrame:
    """One (method, k, n_queries, recall) row: recall@k = fraction of the
    exact top-k pairs the approximate method recovered.  Both sides rank
    by (rounded score desc, neighbor_id), so the k-boundary — and hence
    the metric itself — is deterministic and oracle-checkable."""
    e = exact.filter(F.col("rank") <= k).select("q_id", "neighbor_id")
    a = approx.filter(
        (F.col("q_id") < N_QUERIES) & (F.col("rank") <= k)
    ).select("q_id", "neighbor_id")
    return (
        e.join(a, ["q_id", "neighbor_id"], "left_semi")
        .agg(F.count("*").alias("hits"))
        .crossJoin(
            e.agg(
                F.count("*").alias("total"),
                F.countDistinct("q_id").alias("nq"),
            )
        )
        .select(
            F.lit(name).alias("method"),
            F.lit(k).cast("long").alias("k"),
            F.col("nq").cast("long").alias("n_queries"),
            dec(F.col("hits") / F.col("total"), 6).alias("recall"),
        )
    )


def _q90_oracle() -> str:
    from datapipeline_dags_spark.plans.registry import ORACLES

    blocks = []
    for name, qname, k in ANN_RECALL_METHODS:
        rec = sql_dec(
            "SUM(CASE WHEN m.q_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*)",
            6,
        )
        blocks.append(
            f"""
      SELECT '{name}' AS method, CAST({k} AS BIGINT) AS k,
             CAST(COUNT(DISTINCT e.q_id) AS BIGINT) AS n_queries,
             {rec} AS recall
      FROM (SELECT q_id, neighbor_id FROM exact_full WHERE rank <= {k}) e
      LEFT JOIN (SELECT q_id, neighbor_id FROM m_{name}
                 WHERE q_id < {N_QUERIES} AND rank <= {k}) m
        ON m.q_id = e.q_id AND m.neighbor_id = e.neighbor_id"""
        )
    ctes = ",\n    ".join(
        f"m_{name} AS (SELECT * FROM ({ORACLES[qname]}) t)"
        for name, qname, _ in ANN_RECALL_METHODS
    )
    return f"""
    WITH exact_full AS (SELECT * FROM ({ORACLES["q45_ann_topk_bruteforce"]}) t),
    {ctes}
    {" UNION ALL ".join(blocks)}
    """


def ann_audit_frames(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """Build and PERSIST the exact top-k baseline plus every
    ``ANN_RECALL_METHODS`` retrieval once, for injection into both ANN
    audit metrics (``q90_ann_recall`` and ``q159_ann_ndcg`` — VERDICT
    r8 ask #4: the two audits otherwise duplicate the identical exact
    baseline and all four method retrievals back-to-back).  Every frame
    is bounded (~N_QUERIES × k rows) but costs a corpus pass to build;
    the caller owns release (``spark.catalog.clearCache()``).

    Each method frame persists PRE-FILTERED to the (q_id, rank ≤ k)
    window both consumers apply: a persist boundary would otherwise
    block that filter from pushing into the retrieval plan, where
    ``rank <= k`` is what lets InferWindowGroupLimit prune the
    candidate-pair ranking to a per-partition top-k — measured 3 s
    slower at sf0.1 when the unfiltered frames were cached.  The
    consumers re-apply the same predicates on the cached frame, a
    no-op.

    Optimization r13 (guide §1.2 — score once, slice five ways): the
    five frames previously each re-scored their own candidate pairs
    with the exact cosine (4–5 separate scoring stages).  Now ONE
    persisted ``ann_pair_scores`` table (every (q < N_QUERIES,
    neighbor ≠ q) pair — exactly the work the exact baseline pays
    anyway) feeds q45's ranking directly and the four method frames'
    final cosines by (q_id, neighbor_id) lookup; and ONE persisted
    ``ivf_cell_assignment`` is shared by q47 and q112 (bit-identical
    argmax — see q112's ``cells``).  Same expressions over the same
    pairs, so every frame's rows are unchanged (route-equality test).
    """
    # Backend pins (the r12 lesson that defaults are context-dependent:
    # every pin here is set by an interleaved A/B of THIS frame-build
    # sequence at sf0.1, r13 session): pair table on the JVM HOF (q90
    # slot 4.78 s jvm vs 5.17 s numpy — one fused codegen pipeline into
    # the persist beats the Arrow roundtrip at 40 k pairs); q75 keeps
    # its numpy ENCODE default (4.9–5.1 s vs 5.2 s jvm now that its
    # refine cosine is the shared lookup — the r12 jvm pin existed for
    # the refine, which no longer runs here); the shared cell
    # assignment runs numpy (4.5–4.8 s vs 4.9–5.1 s jvm across two
    # 4/6-rep A/Bs).  Old all-jvm-pinned build: 5.65 s median.
    pair_scores = ann_pair_scores(spark, sf_dir, score_backend="jvm").persist()
    n_cent, _, _ = ann_params(corpus_size(spark, sf_dir))
    cells = ivf_cell_assignment(spark, sf_dir, n_cent, backend="numpy").persist()
    shared_kw: dict[str, dict] = {
        "q46_ann_lsh_bucketed": {"pair_scores": pair_scores},
        "q47_ann_ivf": {"pair_scores": pair_scores, "cells": cells},
        "q75_ann_pq": {"pair_scores": pair_scores},
        "q112_ann_ivfpq": {"pair_scores": pair_scores, "cells": cells},
    }
    frames = {
        "exact": q45_ann_topk_bruteforce(
            spark, sf_dir, pair_scores=pair_scores
        ).persist()
    }
    for name, qname, k in ANN_RECALL_METHODS:
        fn = globals().get(qname) or QUERIES[qname]
        frames[name] = (
            fn(spark, sf_dir, **shared_kw.get(qname, {}))
            .filter((F.col("q_id") < N_QUERIES) & (F.col("rank") <= k))
            .persist()
        )
    return frames


@query("q90_ann_recall", oracle=_q90_oracle())
def q90_ann_recall(
    spark: SparkSession,
    sf_dir: str,
    *,
    frames: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Recall@k of each approximate ANN operator (q46 LSH, q47 IVF, q75
    PQ/ADC) against the exact brute-force top-k (q45) over the same
    embeddings — the measurement that turns "deterministic approximate
    operator" into "production ANN operator with a known quality floor".

    The DuckDB oracle recomputes the SAME recall from its own
    re-derivations of all four operators, so the metric itself is
    hash-checked, not just eyeballed.  ``ivf_recall_sweep`` (bench.py)
    reports the NPROBE recall/latency trade-off per round.

    The exact baseline is PERSISTED: its result is N_QUERIES x TOPK
    rows (constant, tiny) but computing it is a full corpus scan — the
    one expensive input every recall row shares.  Without the persist
    the three union branches each re-run the brute-force pass.

    ``frames`` (``ann_audit_frames``) injects pre-persisted exact +
    method retrievals shared with q159 — identical plans, so the
    result is unchanged (route-equality test); the default stays
    self-contained for the driver gate.
    """
    exact = (
        frames["exact"]
        if frames is not None
        else q45_ann_topk_bruteforce(spark, sf_dir).persist()
    )
    rows = [
        _recall_row(
            name,
            frames[name] if frames is not None else QUERIES[qname](spark, sf_dir),
            exact,
            k,
        )
        for name, qname, k in ANN_RECALL_METHODS
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


def ivf_recall_sweep(
    spark: SparkSession, sf_dir: str, nprobes: tuple[int, ...] = (1, 2, 4, 8)
) -> dict[int, float]:
    """Recall@IVF_K of q47 at each NPROBE setting — the knob a production
    deployment turns to trade candidate volume for recall.  Returns
    {nprobe: recall}; consumed by bench.py into the round artifact.

    The two NPROBE-independent inputs are persisted for the duration of
    the sweep and released before returning: the exact baseline (full
    corpus scan, tiny result) and the IVF cell assignment (the map-only
    corpus pass every probe setting shares)."""
    exact = q45_ann_topk_bruteforce(spark, sf_dir).persist()
    n_cent, _, _ = ann_params(corpus_size(spark, sf_dir))
    cells = ivf_cell_assignment(spark, sf_dir, n_cent).persist()
    out: dict[int, float] = {}
    try:
        for np_ in nprobes:
            row = bounded_collect(
                _recall_row(
                    "ivf",
                    q47_ann_ivf(spark, sf_dir, nprobe=np_, cells=cells),
                    exact,
                    IVF_K,
                ),
                1,
                "ivf_recall_sweep_row",
            )[0]
            out[np_] = float(row.recall)
    finally:
        exact.unpersist()
        cells.unpersist()
    return out




# ---------------------------------------------------------------------------
# q114 — one-pass column profiler (Deequ-style dataset profiling)
# ---------------------------------------------------------------------------

PROFILE_COLS = ("o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice")


def _q114_oracle() -> str:
    blocks = []
    for c in PROFILE_COLS:
        blocks.append(f"""
      SELECT '{c}' AS column_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             {sql_dec(f'AVG(CASE WHEN {c} IS NULL THEN 1.0 ELSE 0.0 END)', 6)}
               AS null_frac,
             CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
             CAST(MIN({c}) AS VARCHAR) AS min_repr,
             CAST(MAX({c}) AS VARCHAR) AS max_repr
      FROM orders""")
    return " UNION ALL ".join(blocks)


@query("q114_column_profile", oracle=_q114_oracle())
def q114_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiling: per-column row count, null fraction, distinct
    count, and min/max — the Deequ/Great-Expectations-style profile a
    pipeline materializes before writing constraints (q89 checks what
    this measures).

    Scale shape: ONE wide aggregate pass computes every column's
    moments simultaneously (the scan is touched once, not once per
    column); the per-column rows are unpivoted from that single result
    row driver-side — output is |columns| rows at any SF.  Distinct
    counts are exact here (bounded-cardinality profile columns); the
    unbounded variant swaps in approx_count_distinct (q36 discipline).
    """
    o = table(spark, sf_dir, "orders")
    aggs = []
    for c in PROFILE_COLS:
        aggs += [
            F.count("*").alias(f"{c}__n"),
            F.avg(F.when(F.col(c).isNull(), 1.0).otherwise(0.0)).alias(
                f"{c}__nullf"
            ),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    row = o.agg(*aggs)
    profile = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column_name"),
                    F.col(f"{c}__n").cast("long").alias("n_rows"),
                    dec(F.col(f"{c}__nullf"), 6).alias("null_frac"),
                    F.col(f"{c}__nd").cast("long").alias("n_distinct"),
                    F.col(f"{c}__min").alias("min_repr"),
                    F.col(f"{c}__max").alias("max_repr"),
                )
                for c in PROFILE_COLS
            ]
        )
    )
    return row.select(profile.alias("p")).select("p.*")


# ---------------------------------------------------------------------------
# q115 — k-anonymity audit (quasi-identifier group sizes)
# ---------------------------------------------------------------------------

KANON_K = 5  # minimum admissible group size
KANON_QI = ("c_nationkey", "c_mktsegment")  # quasi-identifier columns


def _q115_oracle() -> str:
    qi = ", ".join(KANON_QI)
    return f"""
    WITH g AS (SELECT {qi}, COUNT(*) AS group_size FROM customer GROUP BY {qi})
    SELECT {qi},
           CAST(group_size AS BIGINT) AS group_size,
           group_size < {KANON_K} AS below_k
    FROM g
    """


@query("q115_k_anonymity", oracle=_q115_oracle())
def q115_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: the size of every quasi-identifier
    combination, flagging groups smaller than k = {KANON_K} — the rows
    a privacy-preserving release must suppress or generalize
    (complements q94's direct-identifier PII scan with the
    re-identification-risk view).

    Scale shape: one hash aggregate on the QI key; output cardinality
    is the QI domain (bounded), never the row count.
    """
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy(*KANON_QI)
        .agg(F.count("*").alias("group_size"))
        .select(
            *KANON_QI,
            F.col("group_size").cast("long").alias("group_size"),
            (F.col("group_size") < KANON_K).alias("below_k"),
        )
    )


# ---------------------------------------------------------------------------
# q116 — random projection (Johnson–Lindenstrauss dimensionality reduction)
# ---------------------------------------------------------------------------

RP_IN_DIM = 64
RP_OUT_DIM = 16


def _rp_sign_py(i: int, j: int) -> int:
    """±1 sign for projection cell (i, j): high bit of md5("i_j")'s
    first hex digit — the same derivation the oracle does in SQL, so
    the matrix is identical bytes in both engines with no RNG state."""
    import hashlib

    return 1 if hashlib.md5(f"{i}_{j}".encode()).hexdigest()[0] >= "8" else -1


def _q116_oracle() -> str:
    scale = f"sqrt({RP_OUT_DIM}.0)"
    sign = (
        "(CASE WHEN substr(md5(CAST(i AS VARCHAR) || '_' || CAST(j - 1 AS VARCHAR)), 1, 1)"
        " >= '8' THEN 1.0 ELSE -1.0 END)"
    )
    comp = (
        f"list_reduce(list_transform(generate_series(1, {RP_IN_DIM}), "
        f"j -> embedding[j]::DOUBLE * {sign}), (a, b) -> a + b) / {scale}"
    )
    norm = (
        "sqrt(list_reduce(list_transform({v}, x -> x * x), (a, b) -> a + b))"
    )
    return f"""
    WITH p AS (
      SELECT vec_id, embedding,
             list_transform(generate_series(0, {RP_OUT_DIM - 1}),
                            i -> {comp}) AS proj
      FROM embeddings)
    SELECT vec_id,
           array_to_string(list_transform(proj,
             x -> CAST(CAST(ROUND(x * 1000000, 0) AS BIGINT) AS VARCHAR)),
             '|') AS proj_repr,
           {sql_dec(
               norm.format(v="proj")
               + " / "
               + norm.format(v="list_transform(embedding, e -> e::DOUBLE)"),
               4,
           )} AS norm_ratio
    FROM p
    """


@query("q116_random_projection", oracle=_q116_oracle())
def q116_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection: {RP_IN_DIM}-dim
    embeddings down to {RP_OUT_DIM} dims via a ±1 sign matrix scaled by
    1/√{RP_OUT_DIM} — the standard pre-reduction before LSH/clustering
    (Achlioptas 2003: sign matrices satisfy the JL lemma).  The
    reported norm_ratio ≈ 1 IS the lemma's distance-preservation check,
    computed per vector.

    Scale shape: map-only — the {RP_OUT_DIM}×{RP_IN_DIM} matrix is a
    plan literal folded into one nested higher-order expression (never
    a join); the matrix derives from md5 cell coordinates, so both
    engines build identical bytes with no RNG state or broadcast.
    """
    r_lit = F.array(
        *[
            F.array(
                *[
                    F.lit(float(_rp_sign_py(i, j)))
                    for j in range(RP_IN_DIM)
                ]
            )
            for i in range(RP_OUT_DIM)
        ]
    )

    def dotrow(row: Column) -> Column:
        return F.aggregate(
            F.zip_with("embedding", row, lambda x, r: x.cast("double") * r),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ) / F.sqrt(F.lit(float(RP_OUT_DIM)))

    def norm(v: Column) -> Column:
        return F.sqrt(
            F.aggregate(
                F.transform(v, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, z: acc + z,
            )
        )

    proj = F.transform(r_lit, dotrow)
    emb = _fanout(spark, table(spark, sf_dir, "embeddings"))
    return emb.withColumn("proj", proj).select(
        "vec_id",
        # components as integer micro-units: double->string formatting
        # (scientific vs plain) differs between engines, int64 doesn't
        F.concat_ws(
            "|",
            F.transform(
                "proj",
                lambda x: F.round(x * 1e6, 0).cast("long").cast("string"),
            ),
        ).alias("proj_repr"),
        dec(norm(F.col("proj")) / norm(F.col("embedding")), 4).alias("norm_ratio"),
    )


# ---------------------------------------------------------------------------
# q117 — count-min sketch frequency estimation (heavy hitters)
# ---------------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 64  # buckets per row
CMS_TOP = 20  # heavy hitters to audit


def _cms_bucket_sql(r: str, tok: str) -> str:
    return (
        f"('0x' || substr(md5(CAST({r} AS VARCHAR) || '_' || {tok}), 1, 8))::BIGINT"
        f" % {CMS_W}"
    )


def _q117_oracle() -> str:
    return f"""
    WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
    exact AS (SELECT tok, COUNT(*) AS exact_count FROM toks GROUP BY tok),
    rows_ AS (SELECT unnest(generate_series(0, {CMS_D - 1})) AS r),
    counters AS (
      SELECT r, {_cms_bucket_sql("r", "tok")} AS bucket,
             SUM(exact_count) AS cnt
      FROM exact, rows_ GROUP BY 1, 2),
    top AS (SELECT tok, exact_count FROM exact
            ORDER BY exact_count DESC, tok LIMIT {CMS_TOP}),
    est AS (
      SELECT t.tok, t.exact_count, MIN(c.cnt) AS cms_estimate
      FROM top t JOIN rows_ ON TRUE
      JOIN counters c
        ON c.r = rows_.r AND c.bucket = {_cms_bucket_sql("rows_.r", "t.tok")}
      GROUP BY t.tok, t.exact_count)
    SELECT tok, CAST(exact_count AS BIGINT) AS exact_count,
           CAST(cms_estimate AS BIGINT) AS cms_estimate,
           cms_estimate >= exact_count AS never_underestimates
    FROM est
    """


@query("q117_count_min_sketch", oracle=_q117_oracle())
def q117_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation: token counts folded into a
    {CMS_D}×{CMS_W} counter grid (md5-derived row hashes); a token's
    estimate is the MIN of its {CMS_D} counters — audited here against
    the exact counts of the top {CMS_TOP} heavy hitters, including the
    CMS guarantee (estimate ≥ truth, one-sided error).

    Scale shape: the counter grid is a FIXED {CMS_D * CMS_W}-cell
    aggregate regardless of vocabulary size — the structure you keep
    when the exact (token, count) table no longer fits; the grid and
    the audited top-k both broadcast.  Deterministic md5 row hashes
    make the sketch itself hash-checkable against the oracle (the q41
    discipline applied to a frequency sketch).
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    exact = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("exact_count"))
    )

    def bucket(r: Column, tok: Column) -> Column:
        return (
            F.conv(
                F.substring(F.md5(F.concat(r.cast("string"), F.lit("_"), tok)), 1, 8),
                16,
                10,
            ).cast("long")
            % CMS_W
        )

    rows = F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("r")
    counters = (
        exact.select("tok", "exact_count", rows)
        .select("r", bucket(F.col("r"), F.col("tok")).alias("bucket"), "exact_count")
        .groupBy("r", "bucket")
        .agg(F.sum("exact_count").alias("cnt"))
    )
    top = exact.orderBy(F.desc("exact_count"), "tok").limit(CMS_TOP)
    probes = top.select(
        "tok", "exact_count", rows
    ).withColumn("bucket", bucket(F.col("r"), F.col("tok")))
    est = (
        probes.join(F.broadcast(counters), ["r", "bucket"])
        .groupBy("tok", "exact_count")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    return est.select(
        "tok",
        F.col("exact_count").cast("long").alias("exact_count"),
        F.col("cms_estimate").cast("long").alias("cms_estimate"),
        (F.col("cms_estimate") >= F.col("exact_count")).alias("never_underestimates"),
    )


# ---------------------------------------------------------------------------
# q119 — corpus snapshot diff (dataset-versioning changelog)
# ---------------------------------------------------------------------------

DIFF_V1_MOD = 7  # v1 snapshot = docs with doc_id % 7 != 0
DIFF_V2_MOD = 5  # v2 snapshot = docs with doc_id % 5 != 0
DIFF_EDIT_MOD = 3  # v2 "edits" every doc_id % 3 == 0 (appended revision tag)


def _q119_oracle() -> str:
    return f"""
    WITH v1 AS (SELECT doc_id, sha256(text) AS dg FROM documents
                WHERE doc_id % {DIFF_V1_MOD} != 0),
    v2 AS (SELECT doc_id,
                  sha256(CASE WHEN doc_id % {DIFF_EDIT_MOD} = 0
                              THEN text || ' rev2' ELSE text END) AS dg
           FROM documents WHERE doc_id % {DIFF_V2_MOD} != 0),
    j AS (SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
                 v1.dg AS dg1, v2.dg AS dg2
          FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id),
    tagged AS (
      SELECT CASE WHEN dg1 IS NULL THEN 'added'
                  WHEN dg2 IS NULL THEN 'removed'
                  WHEN dg1 != dg2 THEN 'modified'
                  ELSE 'unchanged' END AS status,
             doc_id
      FROM j)
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM tagged GROUP BY status
    """


@query("q119_corpus_diff", oracle=_q119_oracle())
def q119_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff: the added / removed / modified / unchanged
    changelog between two dataset versions, keyed by document id and
    detected by content digest — the versioning primitive behind
    incremental re-training decisions (what actually changed since the
    last corpus build?).  The two "snapshots" derive deterministically
    from the one fixture table (disjoint drop rules + a simulated edit)
    so the contract stays oracle-checkable.

    Scale shape: each side reduces to its (doc_id, sha256) projection
    AT THE SCAN (the full-outer join shuffles 40-byte digests keyed by
    doc_id, never document text); status is a map-side CASE; output is
    4 rows at any corpus size.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    v1 = docs.filter(F.col("doc_id") % DIFF_V1_MOD != 0).select(
        "doc_id", F.sha2(F.col("text"), 256).alias("dg1")
    )
    v2 = docs.filter(F.col("doc_id") % DIFF_V2_MOD != 0).select(
        "doc_id",
        F.sha2(
            F.when(
                F.col("doc_id") % DIFF_EDIT_MOD == 0,
                F.concat(F.col("text"), F.lit(" rev2")),
            ).otherwise(F.col("text")),
            256,
        ).alias("dg2"),
    )
    status = (
        F.when(F.col("dg1").isNull(), "added")
        .when(F.col("dg2").isNull(), "removed")
        .when(F.col("dg1") != F.col("dg2"), "modified")
        .otherwise("unchanged")
    )
    return (
        v1.join(v2, "doc_id", "full_outer")
        .select(status.alias("status"), "doc_id")
        .groupBy("status")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        )
    )


# ---------------------------------------------------------------------------
# q120 — data-mixing schedule (per-source epochs under a token budget)
# ---------------------------------------------------------------------------

MIX_BUDGET_FRAC = 0.5  # training-token budget as a fraction of corpus tokens
MIX_SMOOTH_EXP = 0.5  # weight ∝ tokens^0.5 (sqrt smoothing)


def _q120_oracle() -> str:
    return f"""
    WITH s AS (
      SELECT source,
             COUNT(*) AS n_docs,
             SUM(len(string_split(text, ' '))) AS n_tokens
      FROM documents GROUP BY source),
    t AS (SELECT SUM(n_tokens) AS total,
                 SUM(POW(n_tokens, {MIX_SMOOTH_EXP})) AS wsum
          FROM s)
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           {sql_dec(f'POW(n_tokens, {MIX_SMOOTH_EXP}) / wsum', 6)} AS weight,
           CAST(ROUND(total * {MIX_BUDGET_FRAC}
                      * POW(n_tokens, {MIX_SMOOTH_EXP}) / wsum, 0) AS BIGINT)
             AS target_tokens,
           {sql_dec(
               f'total * {MIX_BUDGET_FRAC} * POW(n_tokens, {MIX_SMOOTH_EXP})'
               ' / wsum / n_tokens',
               4,
           )} AS epochs
    FROM s, t
    """


@query("q120_mixing_schedule", oracle=_q120_oracle())
def q120_mixing_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing schedule: allocate a training-token budget across
    sources with sqrt-smoothed weights (weight ∝ tokens^0.5, the
    up-weight-the-tail curve of published pretraining mixes) and report
    each source's target tokens and EPOCH count — epochs > 1 means the
    source repeats, < 1 means it is subsampled (the number q72/q85's
    samplers then enforce).

    Scale shape: one map-side token count + per-source hash agg; the
    corpus totals are a 1-row broadcast attach; output is |sources|
    rows.
    """
    docs = table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    t = s.agg(
        F.sum("n_tokens").alias("total"),
        F.sum(F.pow("n_tokens", F.lit(MIX_SMOOTH_EXP))).alias("wsum"),
    )
    w = F.pow("n_tokens", F.lit(MIX_SMOOTH_EXP)) / F.col("wsum")
    target = F.col("total") * MIX_BUDGET_FRAC * w
    return s.crossJoin(F.broadcast(t)).select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        dec(w, 6).alias("weight"),
        F.round(target, 0).cast("long").alias("target_tokens"),
        dec(target / F.col("n_tokens"), 4).alias("epochs"),
    )


# ---------------------------------------------------------------------------
# q121 — interpolated bigram LM scoring (perplexity-proxy quality filter)
# ---------------------------------------------------------------------------

LM_LAMBDA = 0.7  # bigram weight; (1-λ) backs off to the unigram model


def _q121_oracle() -> str:
    p = (
        f"({LM_LAMBDA} * (bc.cab * 1.0 / ua.c) "
        f"+ {1 - LM_LAMBDA} * (ub.c * 1.0 / t.t))"
    )
    return f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    uni AS (SELECT tok, COUNT(*) AS c
            FROM (SELECT unnest(words) AS tok FROM w) GROUP BY tok),
    t AS (SELECT SUM(c) AS t FROM uni),
    bcnt AS (SELECT a, b, COUNT(*) AS cab
             FROM (SELECT words[i] AS a, words[i+1] AS b
                   FROM w, unnest(generate_series(1, len(words) - 1)) s(i))
             GROUP BY a, b),
    db AS (SELECT doc_id, words[i] AS a, words[i+1] AS b
           FROM w, unnest(generate_series(1, len(words) - 1)) s(i)),
    scored AS (
      SELECT db.doc_id, -log2({p}) AS nll
      FROM db JOIN bcnt bc ON db.a = bc.a AND db.b = bc.b
              JOIN uni ua ON db.a = ua.tok
              JOIN uni ub ON db.b = ub.tok, t)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           (ROUND(AVG(nll), 4) + 0.0) AS mean_nll_bits
    FROM scored GROUP BY doc_id
    """


@query("q121_bigram_lm_score", oracle=_q121_oracle())
def q121_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram language-model scoring: per-document mean
    −log2 of λ·p(b|a) + (1−λ)·p(b) under the corpus's own counts — the
    CCNet-style perplexity filter one order up from q74's unigram
    model (low score = predictable in-distribution text, high =
    outlier/noise).

    Scale shape: corpus unigram/bigram counts are hash aggs on token
    keys; each document's bigram instances join those tables on the
    (a, b) / token keys — constant-width shuffle keys, never document
    text; the grand total is a 1-row broadcast attach; one final
    doc-keyed agg.  The unordered float mean is pinned by the 4-dp
    round (the q74 discipline).
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    words = F.split(F.col("text"), " ")
    w = docs.select("doc_id", words.alias("words"))
    uni = (
        w.select(F.explode("words").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    t = uni.agg(F.sum("c").alias("t"))
    n1 = F.size(F.col("words")) - 1
    pairs = F.zip_with(
        F.slice(F.col("words"), 1, n1),
        F.slice(F.col("words"), 2, n1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    db = w.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", "p.a", "p.b"
    )
    bcnt = db.groupBy("a", "b").agg(F.count("*").alias("cab"))
    ua = uni.select(F.col("tok").alias("a"), F.col("c").alias("ca"))
    ub = uni.select(F.col("tok").alias("b"), F.col("c").alias("cb"))
    prob = F.lit(LM_LAMBDA) * (F.col("cab") * 1.0 / F.col("ca")) + F.lit(
        1 - LM_LAMBDA
    ) * (F.col("cb") * 1.0 / F.col("t"))
    return (
        db.join(bcnt, ["a", "b"])
        .join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(t))
        .select("doc_id", (-F.log2(prob)).alias("nll"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            dec(F.avg("nll"), 4).alias("mean_nll_bits"),
        )
    )


# ---------------------------------------------------------------------------
# q122 — quality-arbitrated cluster representatives
# ---------------------------------------------------------------------------


def _q122_oracle() -> str:
    # q69's transitive closure, wrapped: within each cluster keep the
    # HIGHEST-quality member (q50/q72's composite), ties to lowest id.
    q = "LEAST(1.0, nw / 50.0) * (1 - nstop * 1.0 / nw)"
    return f"""
    WITH RECURSIVE
    docs AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
    anch_raw AS (SELECT doc_id,
             unnest((list_sort(list_transform(sh, s -> md5(s))))[1:{ANCHOR_K}]) AS a
             FROM docs),
    anch AS (SELECT doc_id, a FROM anch_raw
             QUALIFY row_number() OVER (PARTITION BY a
                                        ORDER BY doc_id) <= {BUCKET_CAP}),
    edges AS (SELECT DISTINCT x.doc_id AS src, y.doc_id AS dst
              FROM anch x JOIN anch y ON x.a = y.a AND x.doc_id < y.doc_id),
    sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
    reach AS (
      SELECT DISTINCT src AS doc_id, src AS node FROM sym
      UNION
      SELECT r.doc_id, s.dst FROM reach r JOIN sym s ON s.src = r.node
    ),
    lab AS (SELECT doc_id, MIN(node) AS cluster_id FROM reach GROUP BY doc_id),
    qual AS (
      SELECT doc_id,
             ROUND({q}, 4) + 0.0 AS score
      FROM (SELECT doc_id,
                   len(string_split(text, ' ')) AS nw,
                   len(list_filter(string_split(text, ' '),
                       w -> list_contains({list(STOPWORDS)!r}, w))) AS nstop
            FROM documents) t),
    ranked AS (
      SELECT lab.cluster_id, lab.doc_id, qual.score,
             ROW_NUMBER() OVER (PARTITION BY lab.cluster_id
                                ORDER BY qual.score DESC, lab.doc_id) AS rk
      FROM lab JOIN qual ON lab.doc_id = qual.doc_id)
    SELECT cluster_id,
           CAST(COUNT(*) AS BIGINT) AS cluster_size,
           CAST(MAX(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT) AS keep_doc_id,
           MAX(CASE WHEN rk = 1 THEN score END) AS keep_score
    FROM ranked GROUP BY cluster_id
    """


@query("q122_cluster_representatives", oracle=_q122_oracle())
def q122_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-arbitrated dedup: within each q69 near-dup cluster keep
    the HIGHEST-quality member (q50/q72's composite score, ties to the
    lowest id) instead of the arbitrary lowest-id canonical — the
    curation policy that preserves the best copy of duplicated content
    rather than whichever crawled first.

    Scale shape: composes two registered operators — q69's connected
    components (anchor-blocked, capped buckets, per-round checkpoint)
    joined to a map-only quality score — plus ONE window top-1 per
    cluster key.  Output is one row per cluster.
    """
    clusters = QUERIES["q69_dedup_clusters"](spark, sf_dir)
    docs = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    nw = F.size(words)
    nstop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    qual = docs.select(
        "doc_id",
        dec(F.least(F.lit(1.0), nw / F.lit(50.0)) * (1 - nstop / nw), 4).alias(
            "score"
        ),
    )
    ranked = clusters.join(qual, "doc_id").withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("cluster_id").orderBy(F.desc("score"), "doc_id")
        ),
    )
    return ranked.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("cluster_size"),
        F.max(F.when(F.col("rk") == 1, F.col("doc_id"))).cast("long").alias(
            "keep_doc_id"
        ),
        F.max(F.when(F.col("rk") == 1, F.col("score"))).alias("keep_score"),
    )


# ---------------------------------------------------------------------------
# q125 — sparse TF-IDF cosine similarity (rare-term blocking)
# ---------------------------------------------------------------------------

# Blocking key: candidate pairs must share at least one word-5-gram
# shingle (q43's blocking — rare by construction even when the unigram
# vocabulary is tiny, as in the fixture where every term has df >= 5%).
# On natural-vocabulary corpora the equivalent prefix-filter blocks on
# rare terms (Bayardo et al., WWW'07 "Scaling Up All Pairs Similarity
# Search"); either way the exact dot product runs over ALL shared terms.
SPARSE_COS_T = 0.5


def _q125_oracle() -> str:
    return f"""
    WITH sdocs AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sdocs),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id),
    t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n FROM documents),
    w AS (SELECT doc_id, term, tf.tf * ln(n.n * 1.0 / df.df) AS w
          FROM tf JOIN df USING (term) CROSS JOIN n),
    nrm AS (SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM w GROUP BY 1),
    dot AS (SELECT c.doc_a, c.doc_b, SUM(a.w * b.w) AS dot
            FROM cand c
            JOIN w a ON a.doc_id = c.doc_a
            JOIN w b ON b.doc_id = c.doc_b AND b.term = a.term
            GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           {sql_dec('dot / (na.nrm * nb.nrm)', 6)} AS cosine
    FROM dot
    JOIN nrm na ON doc_a = na.doc_id
    JOIN nrm nb ON doc_b = nb.doc_id
    WHERE dot / (na.nrm * nb.nrm) >= {SPARSE_COS_T}
    """


@query("q125_tfidf_sparse_cosine", oracle=_q125_oracle())
def q125_tfidf_sparse_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise document cosine similarity over sparse TF-IDF vectors —
    the lexical near-dup / template-detection complement to the dense
    q44 (docs can be lexically near-identical while their embeddings
    drift, and vice versa).

    Scale shape: candidates come from shared-shingle blocking (q43's
    join — rare keys by construction; hot shingles cap per that
    query's notes), then the exact dot product joins the two
    candidates' FULL unigram weight vectors on term (shuffle key =
    term / doc_id, never text).  All weights are (int tf) x ln(N/df)
    doubles; the only rounding is the final 6-dp cosine, same
    expression both engines.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_tbl = docs.agg(F.count("*").alias("n"))
    w = (
        tf.join(df_tbl, "term")
        .crossJoin(F.broadcast(n_tbl))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.col("n") * F.lit(1.0) / F.col("df"))).alias("w"),
        )
        .persist()
    )
    nrm = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    ex = docs.select("doc_id", F.explode(_shingles(F.col("text"))).alias("s"))
    cand = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    dot = (
        cand.join(w.alias("wa"), F.col("doc_a") == F.col("wa.doc_id"))
        .join(
            w.alias("wb"),
            (F.col("doc_b") == F.col("wb.doc_id"))
            & (F.col("wa.term") == F.col("wb.term")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa.w") * F.col("wb.w")).alias("dot"))
    )
    cos = F.col("dot") / (F.col("na.nrm") * F.col("nb.nrm"))
    return (
        dot.join(nrm.alias("na"), F.col("doc_a") == F.col("na.doc_id"))
        .join(nrm.alias("nb"), F.col("doc_b") == F.col("nb.doc_id"))
        .filter(cos >= SPARSE_COS_T)
        .select("doc_a", "doc_b", dec(cos, 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# q126 — embedding outlier audit (distance-to-centroid z-score)
# ---------------------------------------------------------------------------

OUTLIER_Z = 2.0


def _q126_oracle() -> str:
    # Distance accumulates in EMBEDDING ARRAY ORDER on both engines
    # (list_zip fold, not a row-order-dependent SUM), so dist is exact;
    # the per-label mean/std round to 6dp before the z-score so the
    # outlier verdict compares identically rounded values.
    return f"""
    WITH u AS (SELECT label, us.u.pos AS pos, us.u.v AS v FROM (
        SELECT label,
               unnest(list_transform(embedding,
                 (x, i) -> {{'pos': i - 1, 'v': x::DOUBLE}})) AS u
        FROM embeddings) us),
    cent AS (SELECT label, pos, SUM(v) / COUNT(*) AS m
             FROM u GROUP BY label, pos),
    carr AS (SELECT label, list(m ORDER BY pos) AS cm FROM cent GROUP BY label),
    d AS (SELECT vec_id, e.label,
                 (ROUND(sqrt(list_sum(list_transform(
                    list_zip(embedding, cm),
                    p -> (p[1]::DOUBLE - p[2]) * (p[1]::DOUBLE - p[2])))), 6) + 0.0)
                 AS dist
          FROM embeddings e JOIN carr USING (label)),
    s AS (SELECT label, ROUND(AVG(dist), 6) AS mu,
                 ROUND(stddev(dist), 6) AS sd
          FROM d GROUP BY label)
    SELECT vec_id, d.label, dist,
           CASE WHEN sd IS NULL OR sd = 0 THEN NULL
                ELSE (ROUND((dist - mu) / sd, 4) + 0.0) END AS z,
           CASE WHEN sd IS NULL OR sd = 0 THEN FALSE
                ELSE abs(ROUND((dist - mu) / sd, 4)) > {OUTLIER_Z} END AS is_outlier
    FROM d JOIN s ON d.label = s.label
    """


@query("q126_embedding_outliers", oracle=_q126_oracle())
def q126_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier audit: each vector's Euclidean distance to
    its label centroid, z-scored within the label — the curation filter
    that surfaces mislabeled / out-of-distribution points before they
    enter a training mix (the per-cluster analog of SemDeDup's pruning).

    Scale shape: centroids via posexplode + ONE (label, pos) hash agg
    (bounded #labels x dim cells), re-assembled into per-label arrays
    and broadcast; distance is a map-side fold over the embedding array
    (deterministic accumulation order — same fold both engines); label
    stats are a bounded second agg, broadcast back.  No corpus shuffle
    at any point.
    """
    emb = _fanout(spark, table(spark, sf_dir, "embeddings"))
    cent = (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg((F.sum(F.col("v").cast("double")) / F.count("*")).alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("cm")
        )
    )
    dist_sq = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("cm"),
            lambda x, m: (x.cast("double") - m) * (x.cast("double") - m),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    d = emb.join(F.broadcast(cent), "label").select(
        "vec_id", "label", dec(F.sqrt(dist_sq), 6).alias("dist")
    )
    s = d.groupBy("label").agg(
        F.round(F.avg("dist"), 6).alias("mu"),
        F.round(F.stddev("dist"), 6).alias("sd"),
    )
    # sd NULL (single-member label) or 0 (all members equidistant) would
    # divide to NaN/Infinity — and Spark and DuckDB disagree on double
    # division by zero, so the degenerate case is pinned to NULL / not
    # an outlier identically on both sides.
    degenerate = F.col("sd").isNull() | (F.col("sd") == 0)
    z = F.round((F.col("dist") - F.col("mu")) / F.col("sd"), 4)
    return d.join(F.broadcast(s), "label").select(
        "vec_id",
        "label",
        "dist",
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(z + F.lit(0.0))
        .alias("z"),
        F.when(degenerate, F.lit(False))
        .otherwise(F.abs(z) > OUTLIER_Z)
        .alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# q127 — kNN label-noise audit (leave-one-out majority vote)
# ---------------------------------------------------------------------------

KNN_K = 5
AUDIT_N = 50  # bounded audit batch — fixed size at every SF (q45 discipline)


def _q127_oracle() -> str:
    return f"""
    WITH q AS (SELECT vec_id, embedding, label FROM embeddings
               WHERE vec_id < {AUDIT_N}),
    p AS (SELECT q.vec_id AS q_id, q.label AS label, e.label AS n_label,
                 (ROUND({_COS_SQL.format(a='q.embedding', b='e.embedding')}, 6) + 0.0) AS cos_sim,
                 e.vec_id AS neighbor_id
          FROM q JOIN embeddings e ON e.vec_id <> q.vec_id),
    r AS (SELECT q_id, label, n_label,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                                    ORDER BY cos_sim DESC, neighbor_id) AS rk
          FROM p),
    votes AS (SELECT q_id, label, n_label, COUNT(*) AS votes
              FROM r WHERE rk <= {KNN_K} GROUP BY 1, 2, 3),
    top AS (SELECT q_id, label, n_label AS pred_label, votes,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY votes DESC, n_label) AS vr
            FROM votes)
    SELECT q_id, label, pred_label, CAST(votes AS BIGINT) AS votes,
           label = pred_label AS agree
    FROM top WHERE vr = 1
    """


@query("q127_knn_label_audit", oracle=_q127_oracle())
def q127_knn_label_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit via leave-one-out kNN: for a BOUNDED audit
    batch ({AUDIT_N} vectors — fixed size at every SF, the q45 query-set
    discipline; rotate the id window across runs to sweep the corpus),
    the majority label of the {KNN_K} nearest neighbors (exact cosine,
    self excluded) vs the vector's own label — the
    Confident-Learning-style screen for mislabeled training points.

    Scale shape: q45's pattern — the bounded batch broadcasts, the
    corpus streams through ONE map pass, then two bounded aggregates
    (per-query top-k window, vote count).  Ranking uses the rounded
    cosine + neighbor-id tie-break; votes tie-break on the smaller
    label — both k-cuts deterministic across engines.
    """
    emb = _fanout(spark, table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < AUDIT_N).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("label"),
        F.col("embedding").alias("qe"),
    )
    nbr = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("n_label"),
        F.col("embedding").alias("ne"),
    )
    pairs = (
        F.broadcast(q)
        .join(nbr, F.col("neighbor_id") != F.col("q_id"))
        .select(
            "q_id",
            "label",
            "n_label",
            "neighbor_id",
            dec(_cosine(F.col("qe"), F.col("ne")), 6).alias("cos_sim"),
        )
    )
    wk = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    votes = (
        pairs.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= KNN_K)
        .groupBy("q_id", "label", "n_label")
        .agg(F.count("*").alias("votes"))
    )
    wv = W.partitionBy("q_id").orderBy(F.col("votes").desc(), "n_label")
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select(
            "q_id",
            "label",
            F.col("n_label").alias("pred_label"),
            F.col("votes").cast("long").alias("votes"),
            (F.col("label") == F.col("n_label")).alias("agree"),
        )
    )


# ---------------------------------------------------------------------------
# q128 — Zipf power-law vocabulary audit
# ---------------------------------------------------------------------------

ZIPF_TOP_R = 500  # rank-frequency fit over the top-R vocabulary


def _q128_oracle() -> str:
    return f"""
    WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
    v AS (SELECT token, COUNT(*) AS freq FROM t GROUP BY token),
    r AS (SELECT freq,
                 ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rank
          FROM v QUALIFY rank <= {ZIPF_TOP_R}),
    x AS (SELECT ln(rank * 1.0) AS lx, ln(freq * 1.0) AS ly FROM r)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
           (ROUND(regr_slope(ly, lx), 4) + 0.0) AS slope,
           (ROUND(regr_intercept(ly, lx), 4) + 0.0) AS intercept,
           (ROUND(corr(ly, lx) * corr(ly, lx), 4) + 0.0) AS r2
    FROM x
    """


@query("q128_zipf_vocab_audit", oracle=_q128_oracle())
def q128_zipf_vocab_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf power-law audit of the corpus vocabulary: OLS fit of
    ln(freq) against ln(rank) over the top-{ZIPF_TOP_R} tokens — slope
    ~ −1 and high R² is the signature of natural text; synthetic,
    boilerplate-heavy, or scraped-junk corpora bend the curve (a cheap
    corpus-health gate before training).

    Scale shape: one word-count aggregate (map-side combine) → top-R
    cut (TakeOrderedAndProject-able ordering with a token tie-break —
    rank assignment over equal frequencies cannot move the fit, since
    the x-values are the fixed set ln(1..R) and tied y-values are
    interchangeable) → ONE bounded regression aggregate over R rows via
    the built-in regr_slope/regr_intercept/corr (mergeable partials,
    identical definitions in DuckDB).
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    v = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    r = (
        v.withColumn(
            "rank", F.row_number().over(W.orderBy(F.col("freq").desc(), "token"))
        )
        .filter(F.col("rank") <= ZIPF_TOP_R)
        .select(
            F.log(F.col("rank") * F.lit(1.0)).alias("lx"),
            F.log(F.col("freq") * F.lit(1.0)).alias("ly"),
        )
    )
    return r.agg(
        F.count("*").alias("n_terms"),
        dec(F.regr_slope("ly", "lx"), 4).alias("slope"),
        dec(F.regr_intercept("ly", "lx"), 4).alias("intercept"),
        dec(F.corr("ly", "lx") * F.corr("ly", "lx"), 4).alias("r2"),
    )


# ---------------------------------------------------------------------------
# q129 — per-source quality-score calibration
# ---------------------------------------------------------------------------


def _q129_oracle() -> str:
    q = "LEAST(1.0, nw / 50.0) * (1 - nstop * 1.0 / nw)"
    return f"""
    WITH t AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS nw,
             len(list_filter(string_split(text, ' '),
                 w -> list_contains({list(STOPWORDS)!r}, w))) AS nstop
      FROM documents),
    sc AS (SELECT doc_id, source, ROUND({q}, 4) AS score FROM t),
    st AS (SELECT source, ROUND(AVG(score), 6) AS mu,
                  ROUND(stddev(score), 6) AS sd
           FROM sc GROUP BY source)
    SELECT doc_id, sc.source, (score + 0.0) AS score,
           {sql_dec('percent_rank() OVER (PARTITION BY sc.source ORDER BY score, doc_id)', 6)} AS pct_rank,
           CASE WHEN sd IS NULL OR sd = 0 THEN NULL
                ELSE (ROUND((score - mu) / sd, 4) + 0.0) END AS z
    FROM sc JOIN st ON sc.source = st.source
    """


@query("q129_source_score_calibration", oracle=_q129_oracle())
def q129_source_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-score calibration: each doc's composite quality
    (q50's formula) re-expressed as a within-source percentile and
    z-score.  Raw quality scores are NOT comparable across sources
    (each crawl has its own score distribution); mixing and quota
    policies (q73/q110) should cut on the calibrated rank, not the raw
    score — this operator produces that rank.

    Scale shape: score is map-only; percent_rank partitions by source
    (parallel across sources — a single mega-source is the skew case:
    fall back to approx-quantile bucketing there); per-source mu/sd is
    a bounded agg broadcast back.  Rounded score + doc_id ordering and
    6-dp/4-dp outputs keep both engines' ranks identical.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    words = F.split(F.col("text"), " ")
    nw = F.size(words)
    nstop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    sc = docs.select(
        "doc_id",
        "source",
        F.round(F.least(F.lit(1.0), nw / F.lit(50.0)) * (1 - nstop / nw), 4).alias(
            "score"
        ),
    )
    st = sc.groupBy("source").agg(
        F.round(F.avg("score"), 6).alias("mu"),
        F.round(F.stddev("score"), 6).alias("sd"),
    )
    wp = W.partitionBy("source").orderBy("score", "doc_id")
    # degenerate source (one doc, or constant scores): sd NULL/0 — pin z
    # to NULL on both engines instead of NaN/Infinity divergence.
    degenerate = F.col("sd").isNull() | (F.col("sd") == 0)
    return (
        sc.join(F.broadcast(st), "source")
        .select(
            "doc_id",
            "source",
            (F.col("score") + F.lit(0.0)).alias("score"),
            dec(F.percent_rank().over(wp), 6).alias("pct_rank"),
            F.when(degenerate, F.lit(None).cast("double"))
            .otherwise(dec((F.col("score") - F.col("mu")) / F.col("sd"), 4))
            .alias("z"),
        )
    )


# ---------------------------------------------------------------------------
# q130 — token-balanced shard assignment (corpus writer)
# ---------------------------------------------------------------------------

SHARD_TOKENS = 8192  # target tokens per output shard


def _q130_oracle() -> str:
    start = "(cum - n_tokens)"
    return f"""
    WITH t AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
                      len(string_split(text, ' ')) AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, n_tokens,
          SUM(n_tokens) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum
          FROM t)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST({start} // {SHARD_TOKENS} AS BIGINT) AS shard_id,
           CAST({start} % {SHARD_TOKENS} AS BIGINT) AS shard_offset
    FROM c
    """


@query("q130_shard_assignment", oracle=_q130_oracle())
def q130_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced shard assignment for writing a training corpus:
    docs are laid out in a deterministic hash-shuffled order (md5 of
    doc_id — decorrelates shard fill from ingestion order, so every
    shard is an unbiased corpus sample) and cut into shards of
    {SHARD_TOKENS} tokens by cumulative token count.  The writer-side
    twin of q71's sequence packing.

    Scale shape: q71's two-phase distributed prefix sum, with the block
    key = the leading byte of the SAME md5 that orders the docs — a
    PREFIX of the global sort key, so ordering by (blk, h, doc_id)
    equals ordering by (h, doc_id) and block-local sums + prefix-summed
    block offsets compose to the exact global running total without any
    single-partition global window.  256 blocks here; widen the prefix
    to 2 bytes (65 536 blocks) at production scale.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    t = docs.select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    ).withColumn("blk", F.conv(F.substring("h", 1, 2), 16, 10).cast("int"))
    local = t.withColumn(
        "local_cum",
        F.sum("n_tokens").over(
            W.partitionBy("blk").orderBy("h", "doc_id").rowsBetween(
                W.unboundedPreceding, 0
            )
        ),
    )
    offsets = (
        t.groupBy("blk")
        .agg(F.sum("n_tokens").alias("blk_total"))
        .withColumn(
            "blk_offset",
            F.sum("blk_total").over(
                W.orderBy("blk").rowsBetween(W.unboundedPreceding, -1)
            ),
        )
        .select("blk", F.coalesce("blk_offset", F.lit(0)).alias("blk_offset"))
    )
    cum = F.col("blk_offset") + F.col("local_cum")
    start = cum - F.col("n_tokens")
    return local.join(F.broadcast(offsets), "blk").select(
        "doc_id",
        "n_tokens",
        F.floor(start / SHARD_TOKENS).cast("long").alias("shard_id"),
        (start % SHARD_TOKENS).cast("long").alias("shard_offset"),
    )


# ---------------------------------------------------------------------------
# q131 — containment dedup (asymmetric subset-duplication)
# ---------------------------------------------------------------------------

CONTAIN_T = 0.8  # |A ∩ B| / |A| — A is (mostly) contained in B


def _q131_oracle() -> str:
    return f"""
    WITH docs AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
    sizes AS (SELECT doc_id, len(sh) AS n FROM docs),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairstats AS (
      SELECT doc_a, doc_b, i, sa.n AS na, sb.n AS nb
      FROM inter JOIN sizes sa ON doc_a = sa.doc_id
                 JOIN sizes sb ON doc_b = sb.doc_id)
    SELECT doc_a AS doc_sub, doc_b AS doc_sup,
           {sql_dec('i * 1.0 / na', 6)} AS containment
    FROM pairstats WHERE i * 1.0 / na >= {CONTAIN_T}
    UNION ALL
    SELECT doc_b AS doc_sub, doc_a AS doc_sup,
           {sql_dec('i * 1.0 / nb', 6)} AS containment
    FROM pairstats WHERE i * 1.0 / nb >= {CONTAIN_T}
    """


@query("q131_containment_dedup", oracle=_q131_oracle())
def q131_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup (Broder's containment coefficient
    C(A,B) = |A∩B| / |A| over word-5-gram shingles): detects SUBSET
    duplication — quotes, excerpts, and wrapper pages that embed
    another document — which symmetric Jaccard (q43) misses when the
    host document is much longer than the embedded one.

    Scale shape: identical to q43 (shared-shingle blocking, set algebra
    on join counts, no cross join); each unordered candidate pair then
    emits up to two DIRECTED rows (A-in-B, B-in-A), a map-side union.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents")).select(
        "doc_id", _shingles(F.col("text")).alias("sh")
    )
    ex = docs.select("doc_id", F.explode("sh").alias("s"))
    sizes = docs.select("doc_id", F.size("sh").alias("n"))
    inter = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("i"))
    )
    both = (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .persist()
    )
    c_ab = F.col("i") / F.col("na")
    c_ba = F.col("i") / F.col("nb")
    fwd = both.filter(c_ab >= CONTAIN_T).select(
        F.col("doc_a").alias("doc_sub"),
        F.col("doc_b").alias("doc_sup"),
        dec(c_ab, 6).alias("containment"),
    )
    rev = both.filter(c_ba >= CONTAIN_T).select(
        F.col("doc_b").alias("doc_sub"),
        F.col("doc_a").alias("doc_sup"),
        dec(c_ba, 6).alias("containment"),
    )
    return fwd.unionAll(rev)


# ---------------------------------------------------------------------------
# q132 — corpus data card (source × lang rollup)
# ---------------------------------------------------------------------------


def _q132_oracle() -> str:
    return """
    SELECT COALESCE(source, 'ALL') AS source,
           COALESCE(lang, 'ALL') AS lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           (ROUND(AVG(n_chars), 2) + 0.0) AS avg_chars,
           (ROUND(1.0 - COUNT(DISTINCT md5(text)) * 1.0 / COUNT(*), 6) + 0.0)
             AS dup_rate
    FROM documents
    GROUP BY ROLLUP (source, lang)
    """


@query("q132_data_card", oracle=_q132_oracle())
def q132_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus data card: per (source, lang), per source, and overall
    — doc count, token total, mean char length, and exact duplicate
    rate (1 − distinct-digest/count).  The one-page summary a dataset
    release ships (datasheets-for-datasets), produced as ONE rollup
    pass.

    Scale shape: ROLLUP computes all three grouping levels in a single
    hash-aggregate tree (no re-scan per level); the dup-rate's COUNT
    DISTINCT shuffles md5 digests, never text.  Keys are never null in
    this schema, so COALESCE('ALL') marks only the rollup rows.
    """
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            "lang",
            "n_chars",
            F.size(F.split(F.col("text"), " ")).alias("nt"),
            F.md5("text").alias("digest"),
        )
        .rollup("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nt").cast("long").alias("total_tokens"),
            dec(F.avg("n_chars"), 2).alias("avg_chars"),
            dec(
                F.lit(1.0) - F.countDistinct("digest") * F.lit(1.0) / F.count("*"), 6
            ).alias("dup_rate"),
        )
        .select(
            F.coalesce("source", F.lit("ALL")).alias("source"),
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            "n_docs",
            "total_tokens",
            "avg_chars",
            "dup_rate",
        )
    )


# ---------------------------------------------------------------------------
# q133 — per-source boilerplate segment detection (CCNet-style)
# ---------------------------------------------------------------------------

BP_MIN_DOCS = 3  # a segment is boilerplate when >= this many docs repeat it
BP_TOP = 10  # report the top segments per source


def _q133_oracle() -> str:
    return f"""
    WITH words AS (SELECT doc_id, source, string_split(text, ' ') AS w
                   FROM documents),
    segs AS (
      SELECT DISTINCT doc_id, source,
             array_to_string(w[(i - 1) * {SEG_W} + 1 : i * {SEG_W}], ' ') AS seg
      FROM words,
           unnest(generate_series(
             1, CAST(ceil(len(w) / {SEG_W}.0) AS INT))) AS t(i)),
    src AS (SELECT source, COUNT(DISTINCT doc_id) AS src_docs
            FROM documents GROUP BY source),
    rep AS (SELECT source, seg, COUNT(*) AS n_docs
            FROM segs GROUP BY source, seg),
    ranked AS (
      SELECT rep.source, seg, n_docs,
             ROUND(n_docs * 1.0 / src_docs, 6) + 0.0 AS doc_frac,
             ROW_NUMBER() OVER (PARTITION BY rep.source
                                ORDER BY n_docs DESC, seg) AS rk
      FROM rep JOIN src ON rep.source = src.source
      WHERE n_docs >= {BP_MIN_DOCS})
    SELECT source, seg, CAST(n_docs AS BIGINT) AS n_docs, doc_frac,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {BP_TOP}
    """


@query("q133_boilerplate_segments", oracle=_q133_oracle())
def q133_boilerplate_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate detection (the CCNet insight: navigation /
    footer / template segments repeat across many documents OF THE SAME
    SOURCE): the top {BP_TOP} fixed-width word segments (q103's unit)
    appearing in >= {BP_MIN_DOCS} distinct docs, with the fraction of
    the source's docs that carry them — the removal list a curation run
    feeds back into q103-style rebuilding.

    Scale shape: segment explode → per-doc DISTINCT (a segment repeated
    inside one doc counts once) → (source, seg) hash agg shuffling only
    fixed-width segments, + a bounded per-source top-k window.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    words = docs.select("doc_id", "source", F.split(F.col("text"), " ").alias("w"))
    segs = words.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.ceil(F.size(F.col("w")) / F.lit(SEG_W)).cast("int")
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("w"), (i - F.lit(1)) * SEG_W + 1, SEG_W)
                ),
            )
        ).alias("seg"),
    ).distinct()
    src = docs.groupBy("source").agg(F.countDistinct("doc_id").alias("src_docs"))
    rep = segs.groupBy("source", "seg").agg(F.count("*").alias("n_docs"))
    rk = F.row_number().over(
        W.partitionBy("source").orderBy(F.col("n_docs").desc(), "seg")
    )
    return (
        rep.filter(F.col("n_docs") >= BP_MIN_DOCS)
        .join(F.broadcast(src), "source")
        .withColumn("doc_frac", dec(F.col("n_docs") / F.col("src_docs"), 6))
        .withColumn("rk", rk.cast("long"))
        .filter(F.col("rk") <= BP_TOP)
        .select("source", "seg", F.col("n_docs").cast("long").alias("n_docs"),
                "doc_frac", "rk")
    )


# ---------------------------------------------------------------------------
# q134 — cross-source duplication matrix
# ---------------------------------------------------------------------------


def _q134_oracle() -> str:
    return f"""
    WITH pairs AS (SELECT doc_a, doc_b FROM ({ORACLES["q41_dedup_minhash_lsh"]}) t)
    SELECT LEAST(da.source, db.source) AS source_a,
           GREATEST(da.source, db.source) AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs
    JOIN documents da ON doc_a = da.doc_id
    JOIN documents db ON doc_b = db.doc_id
    GROUP BY 1, 2
    """


@query("q134_cross_source_dup_matrix", oracle=_q134_oracle())
def q134_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: q41's verified near-dup pairs
    rolled up by (source, source) — which crawls/dumps overlap, and how
    much.  The number that decides whether two acquisitions are worth
    deduplicating against each other before a training run (and the
    denominator of inter-source contamination rates).

    Scale shape: composes the registered q41 (candidate-first, capped
    buckets) with two doc_id-keyed joins projecting ONLY (doc_id,
    source), then a bounded (source, source) agg — |sources|² output
    rows at any SF.
    """
    pairs = QUERIES["q41_dedup_minhash_lsh"](spark, sf_dir).select("doc_a", "doc_b")
    src = table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        pairs.join(
            src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")),
            "doc_a",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")),
            "doc_b",
        )
        .groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# q135 — MinHash estimate calibration (sketch accuracy audit)
# ---------------------------------------------------------------------------


def _q135_oracle() -> str:
    sig_cols = ", ".join(
        f"list_min(list_transform(hp, p -> p.h1 + {i} * p.h2)) AS m{i}"
        for i in range(MINHASH_H)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS key FROM sig".format(
            b=b,
            key=" || '|' || ".join(
                f"CAST(m{b * LSH_R + r} AS VARCHAR)" for r in range(LSH_R)
            ),
        )
        for b in range(LSH_B)
    )
    matches = " + ".join(
        f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END" for i in range(MINHASH_H)
    )
    return f"""
    WITH docs AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
    hp AS (SELECT doc_id, sh,
           list_transform(list_transform(sh, s -> md5(s)),
             h -> {{'h1': ('0x' || substr(h, 1, 15))::BIGINT,
                    'h2': ('0x' || substr(h, 17, 8))::BIGINT}}) AS hp
           FROM docs),
    sig AS (SELECT doc_id, {sig_cols} FROM hp),
    bands_raw AS ({band_selects}),
    bands AS (SELECT doc_id, band, key FROM bands_raw
              QUALIFY row_number() OVER (PARTITION BY band, key
                                         ORDER BY doc_id) <= {BUCKET_CAP}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    est AS (
      SELECT c.doc_a, c.doc_b, ({matches}) * 1.0 / {MINHASH_H} AS est
      FROM cand c JOIN sig sa ON sa.doc_id = c.doc_a
                  JOIN sig sb ON sb.doc_id = c.doc_b),
    ex AS (
      SELECT c.doc_a, c.doc_b,
             len(list_intersect(da.sh, db.sh)) * 1.0
               / len(list_distinct(list_concat(da.sh, db.sh))) AS j
      FROM cand c JOIN docs da ON da.doc_id = c.doc_a
                  JOIN docs db ON db.doc_id = c.doc_b)
    SELECT est.doc_a, est.doc_b,
           {sql_dec('est', 6)} AS est_jaccard,
           {sql_dec('j', 6)} AS exact_jaccard,
           {sql_dec('abs(est - j)', 6)} AS abs_err
    FROM est JOIN ex ON est.doc_a = ex.doc_a AND est.doc_b = ex.doc_b
    """


@query("q135_minhash_calibration", oracle=_q135_oracle())
def q135_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit: for every q41 LSH candidate pair, the
    MinHash ESTIMATE of Jaccard (matching signature fraction, the
    E[match] = J identity) next to the exact shingle Jaccard and the
    absolute error — the calibration evidence behind trusting the
    {MINHASH_H}-hash sketch at thresholds like q41's {JACCARD_T}
    (stderr ≈ sqrt(J(1-J)/{MINHASH_H})).

    Scale shape: one signature pass (q41's shapes: per-shingle md5,
    (a + i·b) permutations, capped band buckets), candidates joined
    back to the 12-value signatures and shingle sets by doc_id.
    """
    from pyspark.storagelevel import StorageLevel

    docs = (
        _fanout(spark, table(spark, sf_dir, "documents"))
        .select("doc_id", _shingles(F.col("text")).alias("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    hp = F.transform(
        F.transform(F.col("sh"), lambda s: F.md5(s)),
        lambda h: F.struct(
            F.conv(F.substring(h, 1, 15), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(h, 17, 8), 16, 10).cast("long").alias("h2"),
        ),
    )
    hashed = docs.select("doc_id", "sh", hp.alias("hp"))

    def minhash(i: int) -> Column:
        mult = F.lit(i).cast("long")
        return F.array_min(
            F.transform(F.col("hp"), lambda p: p["h1"] + mult * p["h2"])
        )

    sigs = hashed.select(
        "doc_id", "sh", *[minhash(i).alias(f"m{i}") for i in range(MINHASH_H)]
    ).persist(StorageLevel.MEMORY_AND_DISK)
    band_keys = [
        F.concat_ws("|", *[F.col(f"m{b * LSH_R + r}") for r in range(LSH_R)])
        for b in range(LSH_B)
    ]
    bands = sigs.select(
        "doc_id", F.posexplode(F.array(*band_keys)).alias("band", "key")
    )
    ids = F.col("ids")
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias("doc_a"), y.alias("b")),
            ),
        )
    )
    bucketed = (
        bands.groupBy("band", "key")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    cand = (
        _cap_buckets(bucketed, "q135_minhash_calibration", "ids")
        .select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sh_a"),
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(MINHASH_H)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("sh_b"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(MINHASH_H)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(MINHASH_H)
    )
    est = matches * F.lit(1.0) / MINHASH_H
    j = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            dec(est, 6).alias("est_jaccard"),
            dec(j, 6).alias("exact_jaccard"),
            dec(F.abs(est - j), 6).alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# q136 — sequence-length histogram (loader planning)
# ---------------------------------------------------------------------------


def _q136_oracle() -> str:
    return """
    WITH t AS (SELECT CAST(floor(log2(len(string_split(text, ' ')))) AS BIGINT)
                        AS bucket,
                      len(string_split(text, ' ')) AS nt
               FROM documents),
    n AS (SELECT COUNT(*) AS n FROM documents)
    SELECT bucket,
           CAST(2 ** bucket AS BIGINT) AS lo_tokens,
           CAST(2 ** (bucket + 1) - 1 AS BIGINT) AS hi_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS total_tokens,
           (ROUND(COUNT(*) * 1.0 / MAX(n.n), 6) + 0.0) AS doc_frac
    FROM t CROSS JOIN n
    GROUP BY bucket
    """


@query("q136_length_histogram", oracle=_q136_oracle())
def q136_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram in power-of-two buckets: doc and token
    mass per length class — the distribution a training loader needs to
    pick context length, packing strategy (q71), and length-bucketed
    batch shapes.  Map-only bucket assignment + ONE bounded hash agg
    (≤ ~40 buckets at any corpus size); the 1-row total attaches for
    the fraction column.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    nt = F.size(F.split(F.col("text"), " "))
    t = docs.select(
        F.floor(F.log2(nt)).cast("long").alias("bucket"), nt.alias("nt")
    )
    n_tbl = docs.agg(F.count("*").alias("n"))
    return (
        t.crossJoin(F.broadcast(n_tbl))
        .groupBy("bucket")
        .agg(
            F.pow(F.lit(2.0), F.col("bucket")).cast("long").alias("lo_tokens"),
            (F.pow(F.lit(2.0), F.col("bucket") + 1) - 1).cast("long").alias(
                "hi_tokens"
            ),
            F.count("*").cast("long").alias("n_docs"),
            F.sum("nt").cast("long").alias("total_tokens"),
            dec(F.count("*") * F.lit(1.0) / F.max("n"), 6).alias("doc_frac"),
        )
        .select("bucket", "lo_tokens", "hi_tokens", "n_docs", "total_tokens",
                "doc_frac")
    )


# ---------------------------------------------------------------------------
# q137 — curation survivorship funnel
# ---------------------------------------------------------------------------


def _q137_oracle() -> str:
    return f"""
    WITH total AS (SELECT COUNT(*) AS n FROM documents),
    s1 AS (SELECT keep_doc_id AS doc_id FROM ({ORACLES["q40_dedup_exact"]}) t40),
    cl AS (SELECT doc_id, cluster_id FROM ({ORACLES["q69_dedup_clusters"]}) t69),
    s2 AS (SELECT s1.doc_id FROM s1 LEFT JOIN cl ON s1.doc_id = cl.doc_id
           WHERE cl.doc_id IS NULL OR cl.cluster_id = s1.doc_id),
    q AS (SELECT doc_id, keep FROM ({ORACLES["q99_quality_filter_chain"]}) t99),
    s3 AS (SELECT s2.doc_id FROM s2 JOIN q ON s2.doc_id = q.doc_id WHERE q.keep),
    counts AS (
      SELECT 0 AS stage, 'ingested' AS name, n FROM total
      UNION ALL SELECT 1, 'exact_dedup', COUNT(*) FROM s1
      UNION ALL SELECT 2, 'neardup_dedup', COUNT(*) FROM s2
      UNION ALL SELECT 3, 'quality_chain', COUNT(*) FROM s3)
    SELECT CAST(stage AS BIGINT) AS stage, name,
           CAST(n AS BIGINT) AS n_docs,
           {sql_dec('n * 1.0 / (SELECT n FROM total)', 6)} AS frac
    FROM counts
    """


@query("q137_survivorship_funnel", oracle=_q137_oracle())
def q137_survivorship_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation survivorship funnel: how many docs remain after each
    stage of the standard pipeline — exact dedup (q40's keeper per text
    group), near-dup cluster resolution (q69: only a cluster's canonical
    member survives), then the quality-filter chain (q99's keep) — the
    per-stage accounting a curation run publishes.

    Scale shape: pure composition of three registered operators joined
    on doc_id projections, folded to FOUR output rows; each component
    keeps its own scale story (digest groupBy / capped-bucket CC /
    map-only filters).
    """
    docs = table(spark, sf_dir, "documents")
    n_total = docs.count()
    s1 = QUERIES["q40_dedup_exact"](spark, sf_dir).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    cl = QUERIES["q69_dedup_clusters"](spark, sf_dir).select("doc_id", "cluster_id")
    s2 = s1.join(cl, "doc_id", "left").filter(
        F.col("cluster_id").isNull() | (F.col("cluster_id") == F.col("doc_id"))
    ).select("doc_id")
    keep = QUERIES["q99_quality_filter_chain"](spark, sf_dir).select(
        "doc_id", "keep"
    )
    s3 = s2.join(keep, "doc_id").filter(F.col("keep")).select("doc_id")

    def stage(i: int, name: str, df_or_n) -> DataFrame:
        n = df_or_n if isinstance(df_or_n, DataFrame) else None
        base = (
            n.agg(F.count("*").alias("n"))
            if n is not None
            else docs.sparkSession.range(1).select(F.lit(df_or_n).alias("n"))
        )
        return base.select(
            F.lit(i).cast("long").alias("stage"),
            F.lit(name).alias("name"),
            F.col("n").cast("long").alias("n_docs"),
            dec(F.col("n") * F.lit(1.0) / n_total, 6).alias("frac"),
        )

    return (
        stage(0, "ingested", n_total)
        .unionAll(stage(1, "exact_dedup", s1))
        .unionAll(stage(2, "neardup_dedup", s2))
        .unionAll(stage(3, "quality_chain", s3))
    )


# ---------------------------------------------------------------------------
# q138 — label balance audit
# ---------------------------------------------------------------------------


def _q138_oracle() -> str:
    return """
    WITH c AS (SELECT label, COUNT(*) AS cnt FROM embeddings GROUP BY label),
    n AS (SELECT SUM(cnt) AS n, COUNT(*) AS k FROM c)
    SELECT CAST(MAX(n.k) AS BIGINT) AS n_labels,
           CAST(MAX(n.n) AS BIGINT) AS n_vectors,
           (ROUND(MAX(cnt * 1.0 / n.n), 6) + 0.0) AS max_frac,
           (ROUND(MIN(cnt * 1.0 / n.n), 6) + 0.0) AS min_frac,
           (ROUND(-SUM((cnt * 1.0 / n.n) * ln(cnt * 1.0 / n.n)), 4) + 0.0)
             AS entropy,
           (ROUND(-SUM((cnt * 1.0 / n.n) * ln(cnt * 1.0 / n.n))
                  / ln(MAX(n.k)), 4) + 0.0) AS balance
    FROM c CROSS JOIN n
    """


@query("q138_label_balance", oracle=_q138_oracle())
def q138_label_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balance audit of the labeled embedding corpus: label count,
    min/max label share, Shannon entropy, and normalized balance
    (entropy / ln k — 1.0 = perfectly uniform), the one-row health
    check before stratified sampling (q61) or per-label training mixes.

    Scale shape: one (label) hash agg → a ≤|labels|-row frame folded by
    a second bounded agg with the 1-row totals attached; entropy sums
    |labels| rounded terms (bounded cardinality, 4-dp output).
    """
    emb = table(spark, sf_dir, "embeddings")
    c = emb.groupBy("label").agg(F.count("*").alias("cnt"))
    n_tbl = c.agg(F.sum("cnt").alias("n"), F.count("*").alias("k"))
    p = F.col("cnt") * F.lit(1.0) / F.col("n")
    return (
        c.crossJoin(F.broadcast(n_tbl))
        .agg(
            F.max("k").cast("long").alias("n_labels"),
            F.max("n").cast("long").alias("n_vectors"),
            dec(F.max(p), 6).alias("max_frac"),
            dec(F.min(p), 6).alias("min_frac"),
            dec(-F.sum(p * F.log(p)), 4).alias("entropy"),
            dec(-F.sum(p * F.log(p)) / F.log(F.max("k") * F.lit(1.0)), 4).alias(
                "balance"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q139 — text normalization audit
# ---------------------------------------------------------------------------


def _q139_oracle() -> str:
    norm = (
        "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),"
        "' +', ' ', 'g'))"
    )
    return f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_before,
           CAST(length({norm}) AS BIGINT) AS n_chars_after,
           {norm} <> text AS changed,
           md5({norm}) AS norm_digest
    FROM documents
    """


@query("q139_normalization_audit", oracle=_q139_oracle())
def q139_normalization_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization (NFKC-lite for the ASCII fixture: lowercase,
    strip non-alphanumerics, collapse runs of spaces, trim) with the
    per-doc audit columns a cleaning pass reports — before/after char
    counts, whether the doc changed, and the digest of the normalized
    form (the key exact dedup runs on AFTER normalization, catching
    case/punctuation variants raw q40 misses).

    Map-only: lower/regexp_replace/trim/md5 are all JVM string
    expressions inside whole-stage codegen; regex semantics pinned
    global-replace on both engines (DuckDB needs the 'g' flag).
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_before"),
        F.length(norm).cast("long").alias("n_chars_after"),
        (norm != F.col("text")).alias("changed"),
        F.md5(norm).alias("norm_digest"),
    )


# ---------------------------------------------------------------------------
# q144 — prefix-filtering all-pairs Jaccard (PPJoin-style candidate gen)
# ---------------------------------------------------------------------------


def _q144_oracle() -> str:
    return f"""
    WITH docs AS (
      SELECT doc_id, list_transform({_SHINGLES_SQL}, x -> md5(x)) AS sh
      FROM documents),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
    dfc AS (SELECT s, COUNT(*) AS df FROM ex GROUP BY s),
    ranked AS (
      SELECT e.doc_id, e.s,
             ROW_NUMBER() OVER (PARTITION BY e.doc_id ORDER BY d.df, e.s) AS rn,
             COUNT(*) OVER (PARTITION BY e.doc_id) AS n
      FROM ex e JOIN dfc d USING (s)),
    pref AS (
      SELECT doc_id, s FROM ranked
      WHERE rn <= n - CEIL({JACCARD_T} * n) + 1),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM pref a JOIN pref b ON a.s = b.s AND a.doc_id < b.doc_id),
    ver AS (
      SELECT doc_a, doc_b,
             len(list_intersect(da.sh, db.sh)) AS i,
             len(da.sh) AS na, len(db.sh) AS nb
      FROM cand
      JOIN docs da ON da.doc_id = doc_a
      JOIN docs db ON db.doc_id = doc_b)
    SELECT doc_a, doc_b, {sql_dec('i * 1.0 / (na + nb - i)', 6)} AS jaccard
    FROM ver WHERE i * 1.0 / (na + nb - i) >= {JACCARD_T}
    """


@query("q144_prefix_filter_jaccard", oracle=_q144_oracle())
def q144_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-5-gram Jaccard >= 0.5 with PPJoin-style prefix
    filtering (Bayardo et al. WWW'07 "Scaling Up All Pairs", Xiao et
    al. WWW'08): each doc's shingles are canonically ordered by
    ASCENDING global document frequency, and only the first
    ``|d| - ceil(t*|d|) + 1`` shingles — the rarest ones — generate
    candidates.  Two sets with Jaccard >= t MUST share a prefix
    element, so recall is lossless; versus q43's any-shared-shingle
    blocking the candidate join touches a small fraction of the
    postings, and the df-hottest shingles are STRUCTURALLY excluded
    from candidate generation (they sort to the suffix), so the hot-
    bucket skew that forces q43's cap/salt discussion never forms.

    Scale shape: shingles are md5-hashed at the scan, so every shuffle
    key and array element is a fixed 32-char digest, never text.  One
    explode feeds the df hash agg; the per-doc prefix is one more hash
    agg (array_sort over (df, s) structs + slice — no window over a
    global sort); the candidate equi-join runs on prefix postings only;
    verification joins the two fixed-width digest arrays and takes
    ``array_intersect`` per candidate.  Output identical to q43 at the
    same threshold (asserted in tests/test_prefix_filter.py).
    """
    from pyspark.storagelevel import StorageLevel

    t = JACCARD_T
    # the digest-array table is map-only work consumed three times
    # (the df explode and both verification sides) — a map subtree is
    # never deduped by exchange reuse, so persist it (the q41 rule;
    # harness clearCache releases it)
    docs = (
        _fanout(spark, table(spark, sf_dir, "documents"))
        .select(
            "doc_id",
            F.transform(_shingles(F.col("text")), F.md5).alias("sh"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ex = docs.select("doc_id", F.explode("sh").alias("s"))
    dfc = ex.groupBy("s").agg(F.count("*").alias("df"))
    prefix_len = (
        F.col("n") - F.ceil(F.lit(t) * F.col("n")) + 1
    ).cast("int")
    pref = (
        ex.join(dfc, "s")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("df"), F.col("s")))
            ).alias("ord"),
            F.count("*").alias("n"),
        )
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.slice(F.col("ord"), F.lit(1), prefix_len), lambda x: x["s"]
                )
            ).alias("s"),
        )
    )
    cand = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    ver = (
        cand.join(
            docs.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa")),
            "doc_a",
        )
        .join(
            docs.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sa", "sb")).alias("i"),
            F.size("sa").alias("na"),
            F.size("sb").alias("nb"),
        )
    )
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return ver.filter(jac >= t).select(
        "doc_a", "doc_b", dec(jac, 6).alias("jaccard")
    )


# ---------------------------------------------------------------------------
# q146 — Pareto frontier (quality x length skyline)
# ---------------------------------------------------------------------------

_Q50_QUALITY_SQL = (
    "ROUND(LEAST(1.0, len(string_split(text, ' ')) / 50.0) * "
    "(1 - len(list_filter(string_split(text, ' '), "
    f"w -> list_contains({list(STOPWORDS)!r}, w))) * 1.0 / "
    "len(string_split(text, ' '))), 4) + 0.0"
)


@query(
    "q146_pareto_frontier",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, ({_Q50_QUALITY_SQL}) AS quality, n_chars
      FROM documents),
    per AS (SELECT quality, MAX(n_chars) AS qmax FROM b GROUP BY quality),
    p2 AS (
      SELECT quality, qmax,
             MAX(qmax) OVER (ORDER BY quality DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS above
      FROM per)
    SELECT doc_id, b.quality, n_chars
    FROM b JOIN p2 USING (quality)
    WHERE (above IS NULL OR above < n_chars) AND qmax = n_chars
    """,
)
def q146_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier selection: the documents not dominated
    in (quality, length) — doc A dominates B iff A >= B in both
    dimensions and strictly greater in at least one.  Curation use: the
    set of docs where trading quality for length is forced, i.e. the
    efficient frontier a mixture policy samples along.  Ties on both
    dimensions are mutually non-dominating and all survive.

    Scale shape (the reason this is not a quadratic NOT-EXISTS): the
    quality score is ROUNDED to 4 decimals, so the distinct-quality
    domain is <= 10^4 values at ANY corpus size.  Phase 1 is one hash
    agg to per-quality max length; phase 2 runs the strictly-above
    running max over that bounded domain (the single-partition window
    is over <= 10^4 rows — a broadcast-scale model, same discipline as
    q71/q118's offset tables); phase 3 is a broadcast join back to the
    corpus with a map-side filter:  on the frontier iff len equals its
    quality group's max AND strictly exceeds every higher-quality
    group's max.  The oracle states the identical 3-phase form (DuckDB
    evaluates NOT-EXISTS-free as well, keeping both engines O(n)).
    """
    docs = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    nw = F.size(words)
    nstop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    base = docs.select(
        "doc_id",
        dec(F.least(F.lit(1.0), nw / F.lit(50.0)) * (1 - nstop / nw), 4).alias(
            "quality"
        ),
        "n_chars",
    )
    per = base.groupBy("quality").agg(F.max("n_chars").alias("qmax"))
    p2 = per.withColumn(
        "above",
        F.max("qmax").over(
            W.orderBy(F.col("quality").desc()).rowsBetween(
                W.unboundedPreceding, -1
            )
        ),
    )
    return (
        base.join(F.broadcast(p2), "quality")
        .filter(
            (F.col("above").isNull() | (F.col("above") < F.col("n_chars")))
            & (F.col("qmax") == F.col("n_chars"))
        )
        .select("doc_id", "quality", "n_chars")
    )


# ---------------------------------------------------------------------------
# q147 — source-pair overlap via fixed-threshold (theta) hash sketches
# ---------------------------------------------------------------------------

#: Hashes whose first hex digit is '0' are retained — a fixed theta =
#: 1/16 sample of the md5 space, the same-for-every-source coin that
#: makes per-source samples intersectable (theta-sketch set operations).
THETA_HEX_PREFIX = "0"


def _q147_oracle() -> str:
    return f"""
    WITH ex AS (
      SELECT DISTINCT source, unnest(list_transform({_SHINGLES_SQL}, x -> md5(x))) AS h
      FROM documents),
    samp AS (SELECT source, h FROM ex WHERE substring(h, 1, 1) = '{THETA_HEX_PREFIX}'),
    fsz AS (SELECT source, COUNT(*) AS nf FROM ex GROUP BY source),
    ssz AS (SELECT source, COUNT(*) AS ns FROM samp GROUP BY source),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             a.nf AS nfa, b.nf AS nfb,
             COALESCE(sa.ns, 0) AS nsa, COALESCE(sb.ns, 0) AS nsb
      FROM fsz a JOIN fsz b ON a.source < b.source
      LEFT JOIN ssz sa ON sa.source = a.source
      LEFT JOIN ssz sb ON sb.source = b.source),
    fint AS (
      SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS fi
      FROM ex a JOIN ex b ON a.h = b.h AND a.source < b.source
      GROUP BY 1, 2),
    sint AS (
      SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS si
      FROM samp a JOIN samp b ON a.h = b.h AND a.source < b.source
      GROUP BY 1, 2)
    SELECT p.source_a, p.source_b,
           {sql_dec('COALESCE(fi, 0) * 1.0 / (nfa + nfb - COALESCE(fi, 0))', 6)}
             AS exact_jaccard,
           {sql_dec("CASE WHEN nsa + nsb - COALESCE(si, 0) = 0 THEN 0.0 ELSE "
                    "COALESCE(si, 0) * 1.0 / (nsa + nsb - COALESCE(si, 0)) END", 6)}
             AS est_jaccard,
           {sql_dec("ABS(COALESCE(fi, 0) * 1.0 / (nfa + nfb - COALESCE(fi, 0)) - "
                    "CASE WHEN nsa + nsb - COALESCE(si, 0) = 0 THEN 0.0 ELSE "
                    "COALESCE(si, 0) * 1.0 / (nsa + nsb - COALESCE(si, 0)) END)", 6)}
             AS abs_err
    FROM pairs p
    LEFT JOIN fint USING (source_a, source_b)
    LEFT JOIN sint USING (source_a, source_b)
    """


@query("q147_source_overlap_sketch", oracle=_q147_oracle())
def q147_source_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-set Jaccard between every SOURCE pair, estimated from
    fixed-threshold (theta) hash sketches and audited against the exact
    value — which crawls overlap, from sketches a fraction the size.

    A theta sketch keeps exactly the distinct hashes below a fixed
    threshold (here: md5 first hex digit '0', theta = 1/16).  Because
    the coin is a pure function of the VALUE, per-source sketches
    intersect/union meaningfully: Jaccard over the sampled subspace is
    an unbiased estimate of the true Jaccard, and the sketch is
    trivially MERGEABLE (union = set union, still threshold-bounded).

    Scale shape: the theta filter is a map-side predicate on the hash —
    no per-source sort or top-k (the failure mode of bottom-k MinHash
    at source granularity: a per-source rank window sorts each source's
    ENTIRE shingle set on |sources| partitions).  Sketch sizes are
    |distinct|/16 here, and at 100 TB theta tightens (first TWO hex
    digits, 1/256 ...) without changing the plan.  The exact-Jaccard
    audit columns are the fixture-scale evidence (same discipline as
    q36/q113/q117's error gates); at production scale you'd trust the
    sketch and drop the exact branch.  Output is |sources|^2 / 2 rows.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    ex = (
        docs.select(
            "source",
            F.explode(F.transform(_shingles(F.col("text")), F.md5)).alias("h"),
        )
        .distinct()
    )
    samp = ex.filter(F.substring("h", 1, 1) == THETA_HEX_PREFIX)
    fsz = ex.groupBy("source").agg(F.count("*").alias("nf"))
    ssz = samp.groupBy("source").agg(F.count("*").alias("ns"))

    def _pair_counts(side: DataFrame, out: str) -> DataFrame:
        a, b = side.alias("a"), side.alias("b")
        return (
            a.join(
                b,
                (F.col("a.h") == F.col("b.h"))
                & (F.col("a.source") < F.col("b.source")),
            )
            .groupBy(
                F.col("a.source").alias("source_a"),
                F.col("b.source").alias("source_b"),
            )
            .agg(F.count("*").alias(out))
        )

    pairs = (
        fsz.alias("a")
        .join(fsz.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.col("a.nf").alias("nfa"),
            F.col("b.nf").alias("nfb"),
        )
        .join(
            ssz.select(F.col("source").alias("source_a"), F.col("ns").alias("nsa")),
            "source_a",
            "left",
        )
        .join(
            ssz.select(F.col("source").alias("source_b"), F.col("ns").alias("nsb")),
            "source_b",
            "left",
        )
        .na.fill(0, ["nsa", "nsb"])
    )
    fi = F.coalesce(F.col("fi"), F.lit(0))
    si = F.coalesce(F.col("si"), F.lit(0))
    exact = fi / (F.col("nfa") + F.col("nfb") - fi)
    s_union = F.col("nsa") + F.col("nsb") - si
    est = F.when(s_union == 0, F.lit(0.0)).otherwise(si / s_union)
    return (
        pairs.join(_pair_counts(ex, "fi"), ["source_a", "source_b"], "left")
        .join(_pair_counts(samp, "si"), ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            dec(exact, 6).alias("exact_jaccard"),
            dec(est, 6).alias("est_jaccard"),
            dec(F.abs(exact - est), 6).alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# q148 — deterministic train/val/test split assignment
# ---------------------------------------------------------------------------

SPLIT_TRAIN_FRAC = 0.8
SPLIT_VAL_FRAC = 0.1


@query(
    "q148_train_val_test_split",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n_lang
      FROM documents)
    SELECT doc_id, lang,
           CASE WHEN rn <= CEIL(n_lang * {SPLIT_TRAIN_FRAC}) THEN 'train'
                WHEN rn <= CEIL(n_lang * {SPLIT_TRAIN_FRAC})
                         + CEIL(n_lang * {SPLIT_VAL_FRAC}) THEN 'val'
                ELSE 'test' END AS split
    FROM ranked
    """,
)
def q148_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified train/val/test assignment: within each
    language stratum, docs are md5-ranked (q61's engine-independent
    coin) and cut at exactly ceil(0.8n) / ceil(0.1n) — every stratum is
    proportionally represented in every split, the assignment is stable
    under re-runs, resharding, and engine changes, and adding a
    stratum never moves existing docs between splits.

    Scale shape: one shuffle on the stratum key; rank and count share
    the window exchange (q61's plan); the split label is a map-side
    CASE.  This is the assignment q66 (split leakage) audits.
    """
    docs = table(spark, sf_dir, "documents")
    order = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    counts = W.partitionBy("lang")
    train_cut = F.ceil(F.col("n_lang") * SPLIT_TRAIN_FRAC)
    val_cut = train_cut + F.ceil(F.col("n_lang") * SPLIT_VAL_FRAC)
    return (
        docs.withColumn("rn", F.row_number().over(order))
        .withColumn("n_lang", F.count("*").over(counts))
        .select(
            "doc_id",
            "lang",
            F.when(F.col("rn") <= train_cut, "train")
            .when(F.col("rn") <= val_cut, "val")
            .otherwise("test")
            .alias("split"),
        )
    )


# ---------------------------------------------------------------------------
# q152 — character-k-gram redundancy (compression-ratio proxy)
# ---------------------------------------------------------------------------

REDUN_K = 8  # character k-gram width
REDUN_T = 0.6  # distinct-fraction below which a doc is flagged repetitive


@query(
    "q152_kgram_redundancy",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             CASE WHEN length(text) >= {REDUN_K} THEN
               list_transform(generate_series(1, length(text) - {REDUN_K - 1}),
                              i -> text[i:i+{REDUN_K - 1}])
             ELSE [text] END AS grams
      FROM documents)
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_kgrams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
           {sql_dec('len(list_distinct(grams)) * 1.0 / len(grams)', 6)}
             AS distinct_frac,
           len(list_distinct(grams)) * 1.0 / len(grams) < {REDUN_T} AS repetitive
    FROM g
    """,
)
def q152_kgram_redundancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document redundancy via the distinct character-8-gram
    fraction — a cheap, model-free proxy for compression ratio (LZ
    compressors exploit exactly the repeated substrings this counts).
    Low distinct fraction = boilerplate / stutter / template text; the
    Gopher-adjacent signal q70 approximates at word level, here at
    character level where tokenizer-invisible repetition (markup,
    padding, ASCII art) shows up.

    Scale shape: map-only — one sequence/transform/array_distinct chain
    per row inside whole-stage codegen, zero shuffles, zero UDFs.  The
    per-row gram array is O(len * k) chars; at 100 TB feed this after
    q60 chunking so the per-row bound is the chunk width, not the
    document length.
    """
    docs = table(spark, sf_dir, "documents")
    n = F.length("text") - (REDUN_K - 1)
    grams = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n), lambda i: F.substring("text", i, REDUN_K)
        ),
    ).otherwise(F.array(F.col("text")))
    g = docs.select("doc_id", grams.alias("grams"))
    frac = F.size(F.array_distinct("grams")) / F.size("grams")
    return g.select(
        "doc_id",
        F.size("grams").cast("long").alias("n_kgrams"),
        F.size(F.array_distinct("grams")).cast("long").alias("n_distinct"),
        dec(frac, 6).alias("distinct_frac"),
        (frac < REDUN_T).alias("repetitive"),
    )


# ---------------------------------------------------------------------------
# q153 — reciprocal-rank fusion of the LSH and IVF retrieval lists
# ---------------------------------------------------------------------------

RRF_C = 60  # the standard RRF dampening constant (Cormack et al. SIGIR'09)
RRF_K = 5  # fused neighbors returned per query


def _q153_oracle() -> str:
    return f"""
    WITH lsh AS (SELECT * FROM ({ORACLES['q46_ann_lsh_bucketed']})),
    ivf AS (SELECT * FROM ({ORACLES['q47_ann_ivf']})),
    un AS (
      SELECT q_id, neighbor_id, "rank" FROM lsh WHERE q_id < {N_QUERIES}
      UNION ALL
      SELECT q_id, neighbor_id, "rank" FROM ivf),
    fused AS (
      SELECT q_id, neighbor_id,
             SUM(1000000 // ({RRF_C} + "rank")) AS rrf_micro,
             COUNT(*) AS n_methods
      FROM un GROUP BY q_id, neighbor_id),
    ranked AS (
      SELECT q_id, neighbor_id, CAST(rrf_micro AS BIGINT) AS rrf_micro,
             CAST(n_methods AS BIGINT) AS n_methods,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY rrf_micro DESC, neighbor_id) AS fused_rank
      FROM fused)
    SELECT q_id, neighbor_id, rrf_micro, n_methods,
           CAST(fused_rank AS BIGINT) AS fused_rank
    FROM ranked WHERE fused_rank <= {RRF_K}
    """


@query("q153_rrf_fusion", oracle=_q153_oracle())
def q153_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (RRF, Cormack et al. SIGIR'09) of the two
    cheap ANN retrieval lists: score(q, d) = sum over methods of
    1 / (60 + rank_method(q, d)).  Rank-based fusion needs no score
    calibration between methods (LSH cosine vs IVF cosine over
    different candidate sets), and a document surfaced by BOTH methods
    outranks either method's solo tail — the standard ensemble trick
    to buy recall without a deeper single-method search.

    Scale shape: composes q46 + q47 (each already scale-audited), adds
    one union + one (q_id, neighbor) hash agg + a per-query top-k
    window over <= LSH_K + IVF_K candidates per query.

    Parity: the fused score is an INTEGER micro-unit sum —
    floor(1e6 / (60 + rank)) per leg — so no float summation order
    exists at all (ADVICE r10 #3: 1/(60+rank) is NOT exactly
    representable in binary, so the earlier double-sum + 6-dp-round
    design was engine-order-dependent in principle; the q296 MRR
    discipline applied here).
    """
    # legs pinned to the jvm scorer: fused into one union plan the pure
    # JVM legs share a codegen pipeline (the q295 _hybrid_dense_legs
    # measurement — an Arrow node mid-leg costs more than it saves here)
    lsh = (
        q46_ann_lsh_bucketed(spark, sf_dir, score_backend="jvm")
        .filter(F.col("q_id") < N_QUERIES)
        .select("q_id", "neighbor_id", "rank")
    )
    ivf = q47_ann_ivf(spark, sf_dir).select("q_id", "neighbor_id", "rank")
    un = lsh.unionByName(ivf)
    fused = un.groupBy("q_id", "neighbor_id").agg(
        F.sum(F.expr(f"1000000 div ({RRF_C} + rank)"))
        .cast("long")
        .alias("rrf_micro"),
        F.count("*").cast("long").alias("n_methods"),
    )
    w = W.partitionBy("q_id").orderBy(F.col("rrf_micro").desc(), "neighbor_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("fused_rank") <= RRF_K)
        .select("q_id", "neighbor_id", "rrf_micro", "n_methods", "fused_rank")
    )


# ---------------------------------------------------------------------------
# q155 — Poisson-bootstrap confidence interval (distributed resampling)
# ---------------------------------------------------------------------------

BOOT_B = 32  # bootstrap replicas
#: Inverse-CDF ladder of Poisson(1): P(X <= k) literals shared by both
#: engines so the md5 coin maps to the identical weight everywhere.
_POIS1_CDF = (0.367879, 0.735759, 0.919699, 0.981012, 0.996340, 0.999406)


def _pois_sql(u: str) -> str:
    clauses = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS1_CDF)
    )
    return f"CASE {clauses} ELSE {len(_POIS1_CDF)} END"


def _q155_oracle() -> str:
    lo_rank = max(1, math.ceil(0.05 * BOOT_B))
    hi_rank = math.ceil(0.95 * BOOT_B)
    u = (
        "(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' "
        "|| CAST(b AS VARCHAR)), 1, 8)) AS UBIGINT) / 4294967296.0)"
    )
    return f"""
    WITH q AS (
      SELECT doc_id, lang,
             ROUND(LEAST(1.0, len(string_split(text, ' ')) / 50.0) *
               (1 - len(list_filter(string_split(text, ' '),
                  w -> list_contains({list(STOPWORDS)!r}, w))) * 1.0 /
                len(string_split(text, ' '))), 4) AS quality
      FROM documents),
    rep AS (
      SELECT q.lang, q.doc_id, q.quality, b.b,
             {_pois_sql(u)} AS w
      FROM q CROSS JOIN (SELECT unnest(generate_series(0, {BOOT_B - 1})) AS b) b),
    means AS (
      SELECT lang, b, ROUND(SUM(w * quality) / SUM(w), 6) AS m
      FROM rep GROUP BY lang, b HAVING SUM(w) > 0),
    ranked AS (
      SELECT lang, m,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY m, b) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS nb
      FROM means),
    ci AS (
      SELECT lang,
             MIN(CASE WHEN rn = {lo_rank} THEN m END) AS ci_lo,
             MIN(CASE WHEN rn = {hi_rank} THEN m END) AS ci_hi,
             CAST(MAX(nb) AS BIGINT) AS n_replicas
      FROM ranked GROUP BY lang),
    pt AS (SELECT lang, ROUND(AVG(quality), 6) AS point_mean FROM q GROUP BY lang)
    SELECT pt.lang, (pt.point_mean + 0.0) AS point_mean,
           (ci.ci_lo + 0.0) AS ci_lo, (ci.ci_hi + 0.0) AS ci_hi,
           ci.n_replicas
    FROM pt JOIN ci ON pt.lang = ci.lang
    """


@query("q155_bootstrap_ci", oracle=_q155_oracle())
def q155_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90% bootstrap confidence interval of mean document quality per
    language, via the POISSON bootstrap (Chamandy et al., 'Estimating
    Uncertainty for Massive Data Streams', Google TR 2012) — the
    resampling scheme that works when n is too large to sample n rows
    with replacement: each (row, replica) draws an independent
    Poisson(1) inclusion weight, which converges to classical
    bootstrap weights and needs ONE streaming pass.

    Determinism: the weight is an inverse-CDF ladder over an md5 coin
    keyed by (doc_id, replica) — the q58/q85 coin discipline — so both
    engines draw the identical resample.  Replica means round to 6
    decimals before rank-based CI selection (ties broken by replica id)
    to keep the order-statistic choice engine-agreed.

    Scale shape: the B={BOOT_B} explode is a constant-factor map-side
    fan-out (no shuffle of its own); one (lang, replica) hash agg over
    exact decimal-weighted sums; the CI rank window runs on B rows per
    lang.  Memory is O(B * |langs|) — replicas never materialize the
    corpus B times beyond the streaming pass.
    """
    lo_rank = max(1, math.ceil(0.05 * BOOT_B))
    hi_rank = math.ceil(0.95 * BOOT_B)
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    words = F.split(F.col("text"), " ")
    nw = F.size(words)
    nstop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    q = docs.select(
        "doc_id",
        "lang",
        F.round(
            F.least(F.lit(1.0), nw / F.lit(50.0)) * (1 - nstop / nw), 4
        ).alias("quality"),
    )
    rep = q.select(
        "lang",
        "doc_id",
        "quality",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("doc_id").cast("string"), F.col("b").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    w = F.lit(len(_POIS1_CDF))
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        w = F.when(u < _POIS1_CDF[k], F.lit(k)).otherwise(w)
    means = (
        rep.withColumn("w", w)
        .groupBy("lang", "b")
        .agg(
            F.round(
                F.sum(F.col("w") * F.col("quality")) / F.sum("w"), 6
            ).alias("m"),
            F.sum("w").alias("sw"),
        )
        .filter(F.col("sw") > 0)
    )
    wr = W.partitionBy("lang").orderBy("m", "b")
    ranked = means.select(
        "lang",
        "m",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(W.partitionBy("lang")).alias("nb"),
    )
    ci = ranked.groupBy("lang").agg(
        F.min(F.when(F.col("rn") == lo_rank, F.col("m"))).alias("ci_lo"),
        F.min(F.when(F.col("rn") == hi_rank, F.col("m"))).alias("ci_hi"),
        F.max("nb").cast("long").alias("n_replicas"),
    )
    pt = q.groupBy("lang").agg(F.round(F.avg("quality"), 6).alias("point_mean"))
    return pt.join(ci, "lang").select(
        "lang", "point_mean", "ci_lo", "ci_hi", "n_replicas"
    )


# ---------------------------------------------------------------------------
# q156 — per-source AUC of the quality score (Mann-Whitney rank-sum)
# ---------------------------------------------------------------------------


def _q156_oracle() -> str:
    return f"""
    WITH b AS (
      SELECT source,
             ROUND(LEAST(1.0, len(string_split(text, ' ')) / 50.0) *
               (1 - len(list_filter(string_split(text, ' '),
                  w -> list_contains({list(STOPWORDS)!r}, w))) * 1.0 /
                len(string_split(text, ' '))), 4) AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents),
    g AS (
      SELECT source, score, COUNT(*) AS n, SUM(pos) AS np
      FROM b GROUP BY source, score),
    r AS (
      SELECT source, score, n, np,
             COALESCE(SUM(n) OVER (PARTITION BY source ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM g),
    agg AS (
      SELECT source,
             SUM(np) AS n_pos, SUM(n - np) AS n_neg,
             SUM(np * (cb + (n + 1) / 2.0)) AS r_pos
      FROM r GROUP BY source
      HAVING SUM(np) > 0 AND SUM(n - np) > 0)
    SELECT source, CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
           {sql_dec('(r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)', 6)}
             AS auc
    FROM agg
    """


@query("q156_score_auc", oracle=_q156_oracle())
def q156_score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source AUC of the q50 quality score as a predictor of
    lang = 'en' — the Mann-Whitney rank-sum identity
    AUC = (R+ − n+(n+1)/2) / (n+ n−) with AVERAGE ranks for ties, i.e.
    the discrimination metric for any scorer (quality filters, LM
    perplexity, a teacher model's labels) without choosing a cutoff.
    Sources where either class is empty are excluded (AUC undefined).

    Scale shape — the two-level trick that avoids ranking raw rows:
    the score is ROUNDED to 4 decimals, so rows first collapse to a
    (source, score) frequency table (<= 10^4 rows per source at ANY
    corpus size); ranks are then reconstructed on the bounded table as
    cum_before + (n+1)/2 — the average rank every member of a tied
    score group shares.  One hash agg + one bounded window + one final
    agg; no per-row rank window, no global sort.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    words = F.split(F.col("text"), " ")
    nw = F.size(words)
    nstop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    b = docs.select(
        "source",
        F.round(
            F.least(F.lit(1.0), nw / F.lit(50.0)) * (1 - nstop / nw), 4
        ).alias("score"),
        (F.col("lang") == "en").cast("int").alias("pos"),
    )
    g = b.groupBy("source", "score").agg(
        F.count("*").alias("n"), F.sum("pos").alias("np")
    )
    r = g.withColumn(
        "cb",
        F.coalesce(
            F.sum("n").over(
                W.partitionBy("source").orderBy("score").rowsBetween(
                    W.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    )
    agg = (
        r.groupBy("source")
        .agg(
            F.sum("np").alias("n_pos"),
            F.sum(F.col("n") - F.col("np")).alias("n_neg"),
            F.sum(F.col("np") * (F.col("cb") + (F.col("n") + 1) / 2.0)).alias(
                "r_pos"
            ),
        )
        .filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
    )
    auc = (
        F.col("r_pos") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
    ) / (F.col("n_pos") * F.col("n_neg"))
    return agg.select(
        "source",
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        dec(auc, 6).alias("auc"),
    )


# ---------------------------------------------------------------------------
# q158 — token-weighted median quality (what the median TOKEN sees)
# ---------------------------------------------------------------------------


def _q158_oracle() -> str:
    return f"""
    WITH b AS (
      SELECT lang,
             ROUND(LEAST(1.0, len(string_split(text, ' ')) / 50.0) *
               (1 - len(list_filter(string_split(text, ' '),
                  w -> list_contains({list(STOPWORDS)!r}, w))) * 1.0 /
                len(string_split(text, ' '))), 4) AS q,
             len(string_split(text, ' ')) AS w
      FROM documents),
    g AS (SELECT lang, q, SUM(w) AS w FROM b GROUP BY lang, q),
    c AS (
      SELECT lang, q, w,
             SUM(w) OVER (PARTITION BY lang ORDER BY q) AS cm,
             SUM(w) OVER (PARTITION BY lang) AS tot
      FROM g)
    SELECT lang,
           (MIN(CASE WHEN cm * 2 >= tot THEN q END) + 0.0) AS weighted_median,
           CAST(MAX(tot) AS BIGINT) AS total_tokens
    FROM c GROUP BY lang
    """


@query("q158_token_weighted_median", oracle=_q158_oracle())
def q158_token_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted median quality per language: the quality level the
    MEDIAN TRAINING TOKEN experiences (type-1 weighted quantile:
    smallest q with cumulative token weight >= half the total).  A long
    tail of short high-quality docs can hide that most token MASS sits
    in low-quality pages — the document-median (q59 discipline) misses
    exactly this, and mixture decisions (q73/q105/q120) weigh tokens,
    not documents.

    Scale shape: the q156 two-level trick — rows collapse to a
    (lang, rounded-quality) weight table (<= 10^4 rows per lang at any
    SF) in one hash agg; the cumulative-weight selection runs windows
    over that bounded table only.  No per-row sort, no percentile over
    raw rows.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    words = F.split(F.col("text"), " ")
    nw = F.size(words)
    nstop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    b = docs.select(
        "lang",
        F.round(
            F.least(F.lit(1.0), nw / F.lit(50.0)) * (1 - nstop / nw), 4
        ).alias("q"),
        nw.cast("long").alias("w"),
    )
    g = b.groupBy("lang", "q").agg(F.sum("w").alias("w"))
    c = g.select(
        "lang",
        "q",
        F.sum("w")
        .over(
            W.partitionBy("lang").orderBy("q").rowsBetween(
                W.unboundedPreceding, 0
            )
        )
        .alias("cm"),
        F.sum("w").over(W.partitionBy("lang")).alias("tot"),
    )
    return c.groupBy("lang").agg(
        F.min(
            F.when(F.col("cm") * 2 >= F.col("tot"), F.col("q"))
        ).alias("weighted_median"),
        F.max("tot").cast("long").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# q159 — nDCG of each ANN method (graded retrieval quality)
# ---------------------------------------------------------------------------


def _idcg(k: int) -> float:
    return sum((k + 1 - i) / math.log2(i + 1) for i in range(1, k + 1))


def _q159_oracle() -> str:
    from datapipeline_dags_spark.plans.registry import ORACLES

    blocks = []
    for name, qname, k in ANN_RECALL_METHODS:
        blocks.append(
            f"""
      SELECT '{name}' AS method, CAST({k} AS BIGINT) AS k,
             CAST(COUNT(*) AS BIGINT) AS n_queries,
             {sql_dec('AVG(dcg / ' + repr(_idcg(k)) + ')', 6)} AS ndcg
      FROM (
        SELECT a.q_id,
               SUM(CASE WHEN e.rank IS NOT NULL
                        THEN ({k} + 1 - e.rank) / log2(a.rank + 1)
                        ELSE 0 END) AS dcg
        FROM (SELECT q_id, neighbor_id, rank FROM m_{name}
              WHERE q_id < {N_QUERIES} AND rank <= {k}) a
        LEFT JOIN (SELECT q_id, neighbor_id, rank FROM exact_full
                   WHERE rank <= {k}) e
          ON e.q_id = a.q_id AND e.neighbor_id = a.neighbor_id
        GROUP BY a.q_id) per_q"""
        )
    ctes = ",\n    ".join(
        f"m_{name} AS (SELECT * FROM ({ORACLES[qname]}) t)"
        for name, qname, _ in ANN_RECALL_METHODS
    )
    return f"""
    WITH exact_full AS (SELECT * FROM ({ORACLES["q45_ann_topk_bruteforce"]}) t),
    {ctes}
    {" UNION ALL ".join(blocks)}
    """


def _ndcg_row(
    name: str, approx: DataFrame, exact: DataFrame, k: int
) -> DataFrame:
    """One (method, k, n_queries, ndcg) row.  Relevance of a retrieved
    neighbor is GRADED by its exact rank — rel = k+1-exact_rank for
    exact-top-k members, 0 otherwise (integer gains, so the only floats
    are the shared log2 discount factors)."""
    a = approx.filter(
        (F.col("q_id") < N_QUERIES) & (F.col("rank") <= k)
    ).select("q_id", "neighbor_id", F.col("rank").alias("arank"))
    e = exact.filter(F.col("rank") <= k).select(
        "q_id", "neighbor_id", F.col("rank").alias("erank")
    )
    gain = F.when(
        F.col("erank").isNotNull(), (k + 1 - F.col("erank")) / F.log2(F.col("arank") + 1)
    ).otherwise(F.lit(0.0))
    per_q = (
        a.join(e, ["q_id", "neighbor_id"], "left")
        .groupBy("q_id")
        .agg(F.sum(gain).alias("dcg"))
    )
    return per_q.agg(
        F.lit(name).alias("method"),
        F.lit(k).cast("long").alias("k"),
        F.count("*").cast("long").alias("n_queries"),
        dec(F.avg(F.col("dcg") / _idcg(k)), 6).alias("ndcg"),
    )


@query("q159_ann_ndcg", oracle=_q159_oracle())
def q159_ann_ndcg(
    spark: SparkSession,
    sf_dir: str,
    *,
    frames: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """nDCG@k of each approximate ANN method against the exact top-k —
    the GRADED companion to q90's recall: recall counts how many true
    neighbors were found, nDCG also scores WHERE the method ranked
    them (a method that returns the true top-k in reverse order keeps
    recall 1.0 but loses nDCG).  Gains are integers derived from exact
    rank (k+1-erank), so engine agreement rests only on the shared
    log2 discount expression and the final 6-decimal rounding.

    Scale shape: identical to q90 — the exact baseline is persisted
    once (N_QUERIES x TOPK rows), each method contributes one
    (q_id, neighbor) join + one per-query agg + one 1-row mean.
    ``frames`` (``ann_audit_frames``) shares those inputs with q90 —
    result unchanged, default self-contained.
    """
    exact = (
        frames["exact"]
        if frames is not None
        else q45_ann_topk_bruteforce(spark, sf_dir).persist()
    )
    rows = [
        _ndcg_row(
            name,
            frames[name] if frames is not None else QUERIES[qname](spark, sf_dir),
            exact,
            k,
        )
        for name, qname, k in ANN_RECALL_METHODS
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


# ---------------------------------------------------------------------------
# q166 — ensemble score blending (average of per-signal percentiles)
# ---------------------------------------------------------------------------


def _q166_oracle() -> str:
    return f"""
    WITH b AS (
      SELECT doc_id,
             ROUND(LEAST(1.0, len(string_split(text, ' ')) / 50.0) *
               (1 - len(list_filter(string_split(text, ' '),
                  w -> list_contains({list(STOPWORDS)!r}, w))) * 1.0 /
                len(string_split(text, ' '))), 4) AS q,
             n_chars AS l
      FROM documents),
    nq AS (SELECT COUNT(*) AS n FROM b),
    gq AS (
      SELECT q, SUM(COUNT(*)) OVER (ORDER BY q) AS cle FROM b GROUP BY q),
    gl AS (
      SELECT l, SUM(COUNT(*)) OVER (ORDER BY l) AS cle FROM b GROUP BY l)
    SELECT b.doc_id,
           {sql_dec('gq.cle * 1.0 / nq.n', 6)} AS pct_quality,
           {sql_dec('gl.cle * 1.0 / nq.n', 6)} AS pct_length,
           {sql_dec('(gq.cle * 1.0 / nq.n + gl.cle * 1.0 / nq.n) / 2', 6)}
             AS blended
    FROM b JOIN gq ON b.q = gq.q JOIN gl ON b.l = gl.l CROSS JOIN nq
    """


@query("q166_ensemble_score_blend", oracle=_q166_oracle())
def q166_ensemble_score_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration-free ensemble of curation signals: each signal
    (q50 quality, document length) is converted to its empirical CDF
    percentile (fraction of corpus <= value) and the blended score is
    the mean percentile — the rank-averaging trick (a dense Borda
    count) that lets incommensurable scorers (a rule score, an LM
    perplexity, a teacher logit) combine WITHOUT scale calibration,
    exactly as q153 does for retrieval rank lists.

    Scale shape: the q156 two-level discipline twice — each signal
    collapses to its bounded distinct-value table (quality rounds to
    <= 10^4 values; length is integer-domain), the running CDF runs on
    those bounded tables only, and the corpus joins the two small CDF
    tables back broadcast-style.  No per-row rank window over raw
    documents.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    words = F.split(F.col("text"), " ")
    nw = F.size(words)
    nstop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    b = docs.select(
        "doc_id",
        F.round(
            F.least(F.lit(1.0), nw / F.lit(50.0)) * (1 - nstop / nw), 4
        ).alias("q"),
        F.col("n_chars").alias("l"),
    )
    n = b.agg(F.count("*").alias("n"))

    def cdf(col: str) -> DataFrame:
        return (
            b.groupBy(col)
            .agg(F.count("*").alias("c"))
            .withColumn(
                "cle",
                F.sum("c").over(
                    W.orderBy(col).rowsBetween(W.unboundedPreceding, 0)
                ),
            )
            .drop("c")
        )

    pq = F.col("q_cle") / F.col("n")
    pl = F.col("l_cle") / F.col("n")
    return (
        b.join(F.broadcast(cdf("q").withColumnRenamed("cle", "q_cle")), "q")
        .join(F.broadcast(cdf("l").withColumnRenamed("cle", "l_cle")), "l")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            dec(pq, 6).alias("pct_quality"),
            dec(pl, 6).alias("pct_length"),
            dec((pq + pl) / 2, 6).alias("blended"),
        )
    )


# ---------------------------------------------------------------------------
# q172 — duplicate-cluster size distribution
# ---------------------------------------------------------------------------


def _q172_oracle() -> str:
    return f"""
    WITH base AS (SELECT * FROM ({_q69_oracle()}) t)
    SELECT cluster_size,
           COUNT(DISTINCT cluster_id) AS n_clusters,
           COUNT(*) AS n_docs
    FROM base GROUP BY cluster_size
    """


@query("q172_cluster_size_distribution", oracle=_q172_oracle())
def q172_cluster_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size distribution of q69's duplicate clusters: how many clusters
    of 2, of 3, ... and how many documents each size class holds — the
    duplication power-law audit.  Web-crawl dedup decisions hinge on
    this shape (a fat tail of giant clusters means boilerplate/mirrors
    and argues for q133-style removal lists; mostly pairs means
    ordinary re-posting handled by q122's representatives), and a
    sudden shift between snapshots is a crawler regression signal.

    Scale shape: composes q69 (anchor blocking + distributed connected
    components, already scale-audited) and adds one bounded hash agg —
    output rows = number of DISTINCT cluster sizes (<= tens at any
    corpus, power-law or not).
    """
    return (
        q69_dedup_clusters(spark, sf_dir)
        .groupBy("cluster_size")
        .agg(
            F.countDistinct("cluster_id").alias("n_clusters"),
            F.count("*").alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# q173 — dedup cluster cohesion audit (single-linkage chaining detector)
# ---------------------------------------------------------------------------

COHESION_MIN_SIZE = 3
COHESION_T = 0.3  # a within-cluster pair below this marks the cluster chained
# Audit at most this many members per cluster (deterministic md5-rank
# sample).  Connected components is single-linkage, so the chained
# clusters this query exists to DETECT are exactly the ones whose size
# is unbounded (q69's bucket caps bound candidate *edges*, not component
# size — transitive unions merge buckets); an uncapped within-cluster
# self-join is O(size²) and a 10⁵-doc boilerplate cluster would emit
# 10¹⁰ pairs.  50 members ⇒ ≤ 1 225 pairs per cluster, and a min-Jaccard
# over a uniform 50-member sample of a chained cluster still sits far
# below COHESION_T (chaining is a property of the whole component, not
# of rare member pairs).
COHESION_MAX_MEMBERS = 50


def _q173_oracle() -> str:
    return f"""
    WITH cl0 AS (SELECT * FROM ({_q69_oracle()}) t WHERE cluster_size >= {COHESION_MIN_SIZE}),
    cl AS (
      SELECT cluster_id, doc_id, cluster_size FROM (
        SELECT cluster_id, doc_id, cluster_size,
               ROW_NUMBER() OVER (PARTITION BY cluster_id
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS mr
        FROM cl0) s
      WHERE mr <= {COHESION_MAX_MEMBERS}),
    sh AS (
      SELECT doc_id, list_transform({_SHINGLES_SQL}, x -> md5(x)) AS sh
      FROM documents),
    pairs AS (
      SELECT a.cluster_id, a.cluster_size,
             len(list_intersect(sa.sh, sb.sh)) AS i,
             len(sa.sh) AS na, len(sb.sh) AS nb
      FROM cl a JOIN cl b
        ON a.cluster_id = b.cluster_id AND a.doc_id < b.doc_id
      JOIN sh sa ON sa.doc_id = a.doc_id
      JOIN sh sb ON sb.doc_id = b.doc_id),
    scored AS (
      SELECT cluster_id, cluster_size, i * 1.0 / (na + nb - i) AS j FROM pairs)
    SELECT cluster_id,
           MAX(cluster_size) AS n_members_total,
           CAST(LEAST(MAX(cluster_size), {COHESION_MAX_MEMBERS}) AS BIGINT)
             AS n_members_audited,
           COUNT(*) AS n_pairs,
           {sql_dec('MIN(j)', 6)} AS min_jaccard,
           {sql_dec('AVG(j)', 6)} AS mean_jaccard,
           MIN(j) < {COHESION_T} AS chained
    FROM scored GROUP BY cluster_id
    """


@query("q173_cluster_cohesion", oracle=_q173_oracle())
def q173_cluster_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohesion audit of q69's duplicate clusters: for every cluster of
    >= {COHESION_MIN_SIZE} docs, the min/mean EXACT pairwise Jaccard
    over the pairs of a deterministic {COHESION_MAX_MEMBERS}-member
    sample — including pairs the blocking never proposed.  Connected
    components is single-linkage, so A~B~C chains can merge documents
    that are nothing alike (min pairwise similarity far below the
    near-dup threshold); a `chained` cluster is one to split or to
    route through q122's representative selection with suspicion.  This
    is the measured answer to the classic MinHash-dedup failure mode,
    not an assumption that transitive closure == semantic sameness.

    Scale shape: component size is NOT bounded by q69's bucket caps
    (transitive unions merge buckets), and giant chained clusters are
    this query's own target failure mode — so members are sampled to
    {COHESION_MAX_MEMBERS} per cluster by md5-rank (engine-agreed coin,
    mirrored in the oracle) BEFORE the within-cluster pair join, capping
    it at C({COHESION_MAX_MEMBERS},2) = 1 225 pairs per cluster.
    ``n_members_total`` vs ``n_members_audited`` makes truncation
    observable per row, and ``BUCKET_OBSERVATIONS['q173_cluster_cohesion']``
    counts capped clusters as the plan runs.  md5-digest arrays verify
    via array_intersect (q144's fixed-width-shuffle discipline); output
    is one row per audited cluster.
    """
    cl = q69_dedup_clusters(spark, sf_dir).filter(
        F.col("cluster_size") >= COHESION_MIN_SIZE
    )
    mw = W.partitionBy("cluster_id").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    sampled = (
        cl.withColumn("mr", F.row_number().over(mw))
        .filter(F.col("mr") <= COHESION_MAX_MEMBERS)
        .select("cluster_id", "doc_id", "cluster_size")
    )
    sh = _fanout(spark, table(spark, sf_dir, "documents")).select(
        "doc_id", F.transform(_shingles(F.col("text")), F.md5).alias("sh")
    )
    a = sampled.select(
        F.col("cluster_id"), F.col("doc_id").alias("da"), F.col("cluster_size")
    )
    b = sampled.select(F.col("cluster_id"), F.col("doc_id").alias("db"))
    pairs = (
        a.join(b, "cluster_id")
        .filter(F.col("da") < F.col("db"))
        .join(sh.select(F.col("doc_id").alias("da"), F.col("sh").alias("sa")), "da")
        .join(sh.select(F.col("doc_id").alias("db"), F.col("sh").alias("sb")), "db")
        .select(
            "cluster_id",
            "cluster_size",
            F.size(F.array_intersect("sa", "sb")).alias("i"),
            F.size("sa").alias("na"),
            F.size("sb").alias("nb"),
        )
    )
    j = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    obs = Observation()
    BUCKET_OBSERVATIONS["q173_cluster_cohesion"] = obs
    return (
        pairs.select("cluster_id", "cluster_size", j.alias("j"))
        .groupBy("cluster_id")
        .agg(
            F.max("cluster_size").alias("n_members_total"),
            F.least(F.max("cluster_size"), F.lit(COHESION_MAX_MEMBERS))
            .cast("long")
            .alias("n_members_audited"),
            F.count("*").alias("n_pairs"),
            dec(F.min("j"), 6).alias("min_jaccard"),
            dec(F.avg("j"), 6).alias("mean_jaccard"),
            (F.min("j") < COHESION_T).alias("chained"),
        )
        .observe(
            obs,
            F.count(F.lit(1)).alias("buckets"),
            F.sum(
                (F.col("n_members_total") > COHESION_MAX_MEMBERS).cast("long")
            ).alias("capped_buckets"),
            F.max("n_members_total").alias("max_bucket_size"),
        )
    )


# ---------------------------------------------------------------------------
# q177 — score calibration audit: reliability bins + ECE
# ---------------------------------------------------------------------------

CAL_LABEL = 1  # the "positive class" whose centroid-affinity is the score
CAL_BINS = 10


def _q177_oracle() -> str:
    return f"""
    WITH u AS (
      SELECT label, unnest(list_transform(embedding,
               (x, i) -> {{'pos': i - 1, 'v': x::DOUBLE}})) AS u
      FROM embeddings),
    cpos AS (SELECT u.pos AS pos, ROUND(SUM(u.v) / COUNT(*), 6) AS mv
             FROM u WHERE label = {CAL_LABEL} GROUP BY 1),
    cent AS (SELECT list(mv ORDER BY pos) AS c FROM cpos),
    scored AS (
      SELECT label,
             ROUND((1 + {_COS_SQL.format(a='embedding', b='c')}) / 2, 6) AS s
      FROM embeddings, cent),
    b AS (SELECT LEAST(CAST(FLOOR(s * {CAL_BINS}) AS BIGINT),
                       {CAL_BINS - 1}) AS bin,
                 s, CASE WHEN label = {CAL_LABEL} THEN 1 ELSE 0 END AS y
          FROM scored),
    n AS (SELECT COUNT(*) AS n FROM b),
    g AS (SELECT bin, COUNT(*) AS n_bin, ROUND(AVG(s), 6) AS avg_conf,
                 ROUND(AVG(y * 1.0), 6) AS frac_pos
          FROM b GROUP BY 1)
    SELECT bin, CAST(n_bin AS BIGINT) AS n,
           (avg_conf + 0.0) AS avg_conf, (frac_pos + 0.0) AS frac_pos,
           {sql_dec('ABS(avg_conf - frac_pos)', 6)} AS abs_gap,
           {sql_dec('n_bin * ABS(avg_conf - frac_pos) / n.n', 6)} AS ece_term
    FROM g, n
    """


@query("q177_calibration_ece", oracle=_q177_oracle())
def q177_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram calibration audit: score each vector by its
    affinity to the label-{CAL_LABEL} centroid ((1+cos)/2 in [0,1]),
    bin into {CAL_BINS} confidence buckets, and compare each bucket's
    mean confidence against its observed positive rate — the per-bin
    |gap| terms sum to the Expected Calibration Error.  This is the
    model-eval complement of q156's AUC: AUC measures ranking, ECE
    measures whether the scores MEAN what they say — the property
    quality-filter thresholds (q99) and mixture weights (q105) silently
    assume.

    Scale shape: the centroid is a (dim)-bounded agg broadcast as ONE
    row (q64's cell discipline), scoring is a single map-only pass, and
    everything downstream lives on the {CAL_BINS}-row bin table; the
    corpus-count attach is the q63 1-row pattern.  Scores round to 6dp
    before binning so both engines cut identical bin edges.
    """
    emb = table(spark, sf_dir, "embeddings")
    cpos = (
        emb.filter(F.col("label") == CAL_LABEL)
        .select(F.posexplode("embedding").alias("pos", "v"))
        .groupBy("pos")
        .agg(
            F.round(F.sum(F.col("v").cast("double")) / F.count("*"), 6).alias(
                "mv"
            )
        )
    )
    cent = cpos.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mv"))),
            lambda s: s["mv"],
        ).alias("c")
    )
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "label",
        F.round(
            (F.lit(1.0) + _cosine(F.col("embedding"), F.col("c"))) / 2, 6
        ).alias("s"),
    )
    b = scored.select(
        F.least(
            F.floor(F.col("s") * CAL_BINS).cast("long"), F.lit(CAL_BINS - 1)
        ).alias("bin"),
        "s",
        (F.col("label") == CAL_LABEL).cast("int").alias("y"),
    )
    n_tbl = b.agg(F.count("*").alias("n_total"))
    g = b.groupBy("bin").agg(
        F.count("*").alias("n_bin"),
        F.round(F.avg("s"), 6).alias("avg_conf"),
        F.round(F.avg(F.col("y") * 1.0), 6).alias("frac_pos"),
    )
    return g.crossJoin(F.broadcast(n_tbl)).select(
        "bin",
        F.col("n_bin").cast("long").alias("n"),
        dec(F.col("avg_conf"), 6).alias("avg_conf"),
        dec(F.col("frac_pos"), 6).alias("frac_pos"),
        dec(F.abs(F.col("avg_conf") - F.col("frac_pos")), 6).alias("abs_gap"),
        dec(
            F.col("n_bin")
            * F.abs(F.col("avg_conf") - F.col("frac_pos"))
            / F.col("n_total"),
            6,
        ).alias("ece_term"),
    )


# ---------------------------------------------------------------------------
# q178 — PQ reconstruction-error audit (quantization distortion per subspace)
# ---------------------------------------------------------------------------


def _q178_oracle() -> str:
    d = PQ_D
    return f"""
    WITH cb AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
                WHERE vec_id < {PQ_K}),
    ms AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m),
    csub AS (SELECT cid, m, ce[m*{d}+1 : m*{d}+{d}] AS cs FROM cb, ms),
    enc0 AS (SELECT e.vec_id, c.m, c.cid,
             list_reduce(list_transform(generate_series(1, {d}),
               i -> (e.embedding[c.m*{d}+i]::DOUBLE - c.cs[i]::DOUBLE)
                    * (e.embedding[c.m*{d}+i]::DOUBLE - c.cs[i]::DOUBLE)),
               (a, b) -> a + b) AS dist
             FROM embeddings e CROSS JOIN csub c),
    err AS (SELECT vec_id, m, dist FROM (
              SELECT vec_id, m, dist,
                     ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                        ORDER BY dist, cid) AS rn
              FROM enc0) WHERE rn = 1),
    eng AS (SELECT e.vec_id, mm.m,
            list_reduce(list_transform(generate_series(1, {d}),
              i -> e.embedding[mm.m*{d}+i]::DOUBLE
                   * e.embedding[mm.m*{d}+i]::DOUBLE),
              (a, b) -> a + b) AS energy
            FROM embeddings e CROSS JOIN ms mm)
    SELECT err.m AS subspace, COUNT(*) AS n,
           {sql_dec('AVG(err.dist)', 6)} AS mse,
           {sql_dec('MAX(err.dist)', 6)} AS max_err,
           {sql_dec('AVG(eng.energy)', 6)} AS mean_energy,
           {sql_dec('AVG(err.dist) / AVG(eng.energy)', 6)} AS rel_distortion
    FROM err JOIN eng ON err.vec_id = eng.vec_id AND err.m = eng.m
    GROUP BY err.m
    """


@query("q178_pq_reconstruction", oracle=_q178_oracle())
def q178_pq_reconstruction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ quantization-distortion audit: per subspace, the mean/max
    squared reconstruction error of q75's codebook assignment and the
    error relative to the subspace's signal energy — the codebook-
    health metric that explains (and predicts) ADC recall BEFORE
    running an expensive recall harness: a subspace whose
    rel_distortion drifts up is where the codebook stopped fitting the
    data (the retrain trigger in production PQ deployments).

    Scale shape: the chosen code's distance IS the reconstruction
    error, so the audit is q75's map-only encode pass (broadcast
    codebook, HOF argmin keeping the min distance) plus one
    ({PQ_M})-group hash agg; no pair joins, no windows over data.
    """
    corpus = table(spark, sf_dir, "embeddings")
    cb1 = _pq_codebook_row(corpus)
    rows = (
        _fanout(spark, corpus)
        .crossJoin(F.broadcast(cb1))
        .select(F.explode(_pq_err_energy_col()).alias("r"))
        .select(
            F.col("r.m").cast("long").alias("subspace"),
            F.col("r.err").alias("err"),
            F.col("r.energy").alias("energy"),
        )
    )
    return rows.groupBy("subspace").agg(
        F.count("*").alias("n"),
        dec(F.avg("err"), 6).alias("mse"),
        dec(F.max("err"), 6).alias("max_err"),
        dec(F.avg("energy"), 6).alias("mean_energy"),
        dec(F.avg("err") / F.avg("energy"), 6).alias("rel_distortion"),
    )


# ---------------------------------------------------------------------------
# q185 — embedding label-separation audit (centroid silhouette margin)
# ---------------------------------------------------------------------------


def _q185_oracle() -> str:
    return f"""
    WITH u AS (
      SELECT label, unnest(list_transform(embedding,
               (x, i) -> {{'pos': i - 1, 'v': x::DOUBLE}})) AS u
      FROM embeddings),
    cpos AS (SELECT label AS clabel, u.pos AS pos,
                    ROUND(SUM(u.v) / COUNT(*), 6) AS mv
             FROM u GROUP BY 1, 2),
    cent AS (SELECT clabel, list(mv ORDER BY pos) AS c FROM cpos GROUP BY 1),
    scored AS (
      SELECT e.vec_id, e.label, cent.clabel,
             ROUND({_COS_SQL.format(a='e.embedding', b='cent.c')}, 6) AS cs
      FROM embeddings e CROSS JOIN cent),
    margins AS (
      SELECT vec_id, label,
             MAX(CASE WHEN clabel = label THEN cs END) AS own,
             MAX(CASE WHEN clabel != label THEN cs END) AS best_other
      FROM scored GROUP BY vec_id, label)
    SELECT label, COUNT(*) AS n,
           {sql_dec('AVG(own - best_other)', 6)} AS mean_margin,
           {sql_dec('AVG(CASE WHEN own < best_other THEN 1.0 ELSE 0.0 END)', 6)}
             AS frac_misassigned
    FROM margins GROUP BY label
    """


@query("q185_label_silhouette", oracle=_q185_oracle())
def q185_label_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-separation audit (centroid silhouette): per vector, cosine
    to its OWN label centroid minus the best OTHER-label centroid; per
    label, the mean margin and the fraction of vectors that sit closer
    to a foreign centroid — the label-quality signal behind q127's kNN
    noise audit, computed against |labels| prototypes instead of a
    neighbor sample (silhouette-style, linear not quadratic).

    Scale shape: centroids are a (|labels| x dim)-bounded agg broadcast
    as |labels| rows (q64's cell discipline); scoring is ONE map-side
    pass per vector against the bounded prototype set; per-vector
    margins collapse in the same pass's hash agg, and the output is
    |labels| rows.  Cosines round to 6dp before the max so both
    engines pick identical margins.
    """
    emb = table(spark, sf_dir, "embeddings")
    cpos = (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy(F.col("label").alias("clabel"), "pos")
        .agg(
            F.round(F.sum(F.col("v").cast("double")) / F.count("*"), 6).alias(
                "mv"
            )
        )
    )
    cent = cpos.groupBy("clabel").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mv"))),
            lambda s: s["mv"],
        ).alias("c")
    )
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "clabel",
        F.round(_cosine(F.col("embedding"), F.col("c")), 6).alias("cs"),
    )
    margins = scored.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("clabel") == F.col("label"), F.col("cs"))).alias(
            "own"
        ),
        F.max(F.when(F.col("clabel") != F.col("label"), F.col("cs"))).alias(
            "best_other"
        ),
    )
    return margins.groupBy("label").agg(
        F.count("*").alias("n"),
        dec(F.avg(F.col("own") - F.col("best_other")), 6).alias("mean_margin"),
        dec(
            F.avg(
                F.when(F.col("own") < F.col("best_other"), 1.0).otherwise(0.0)
            ),
            6,
        ).alias("frac_misassigned"),
    )


# ---------------------------------------------------------------------------
# q181 — duplicate-basket detection (order-level near-dup, q41 cross-domain)
# ---------------------------------------------------------------------------

BASKET_ANCHOR_K = 2  # bottom-k md5(part) anchors emitted per basket
BASKET_JACCARD_T = 0.5


def _q181_oracle() -> str:
    return f"""
    WITH b AS (SELECT l_orderkey AS oid,
                      list_sort(list(DISTINCT l_partkey)) AS parts
               FROM lineitem GROUP BY 1),
    anch_raw AS (SELECT oid,
                 unnest((list_sort(list_transform(parts,
                   p -> md5('p' || p))))[1:{BASKET_ANCHOR_K}]) AS a
                 FROM b),
    anch AS (SELECT oid, a FROM anch_raw
             QUALIFY row_number() OVER (PARTITION BY a
                                        ORDER BY oid) <= {BUCKET_CAP}),
    cand AS (SELECT DISTINCT x.oid AS order_a, y.oid AS order_b
             FROM anch x JOIN anch y ON x.a = y.a AND x.oid < y.oid),
    j AS (SELECT order_a, order_b,
                 len(list_intersect(ba.parts, bb.parts)) AS n_common,
                 len(list_intersect(ba.parts, bb.parts)) * 1.0
                   / len(list_distinct(ba.parts || bb.parts)) AS jac
          FROM cand
          JOIN b ba ON ba.oid = order_a
          JOIN b bb ON bb.oid = order_b)
    SELECT order_a, order_b, CAST(n_common AS BIGINT) AS n_common,
           {sql_dec('jac', 6)} AS jaccard
    FROM j WHERE jac >= {BASKET_JACCARD_T}
    """


@query("q181_duplicate_baskets", oracle=_q181_oracle())
def q181_duplicate_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-order detection: q41's anchor-blocked near-dup pipeline
    applied to ORDER BASKETS (the set of parts on an order) instead of
    text shingles — the retry/fraud/double-submit signal in transaction
    streams, and the demonstration that the dedup machinery is
    domain-generic: bottom-{BASKET_ANCHOR_K} md5(part) anchors block,
    capped buckets explode pairs, exact set Jaccard >= {BASKET_JACCARD_T}
    verifies.

    Scale shape: identical to q69's edge build — groupBy anchor +
    in-bucket pair explode (never a basket self-join), buckets capped at
    {BUCKET_CAP} with the truncation observable in
    ``BUCKET_OBSERVATIONS['q181_duplicate_baskets']``; the verify join
    carries the two bounded part arrays per candidate pair only.
    """
    li = table(spark, sf_dir, "lineitem")
    b = li.groupBy(F.col("l_orderkey").alias("oid")).agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    anchors = b.select(
        "oid",
        F.explode(
            F.slice(
                F.array_sort(
                    F.transform(
                        F.col("parts"),
                        lambda p: F.md5(F.concat(F.lit("p"), p.cast("string"))),
                    )
                ),
                1,
                BASKET_ANCHOR_K,
            )
        ).alias("a"),
    )
    ids = F.col("ids")
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias("order_a"), y.alias("order_b")),
            ),
        )
    )
    bucketed = (
        anchors.groupBy("a")
        .agg(F.collect_list("oid").alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    cand = (
        _cap_buckets(bucketed, "q181_duplicate_baskets", "ids")
        .select(F.explode(pair_structs).alias("p"))
        .select("p.order_a", "p.order_b")
        .distinct()
    )
    ba = b.select(F.col("oid").alias("order_a"), F.col("parts").alias("pa"))
    bb = b.select(F.col("oid").alias("order_b"), F.col("parts").alias("pb"))
    inter = F.size(F.array_intersect("pa", "pb"))
    union = F.size(F.array_union("pa", "pb"))
    jac = inter * F.lit(1.0) / union
    return (
        cand.join(ba, "order_a")
        .join(bb, "order_b")
        .filter(jac >= BASKET_JACCARD_T)
        .select(
            "order_a",
            "order_b",
            inter.cast("long").alias("n_common"),
            dec(jac, 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# q192 — score decile lift table (campaign-targeting model eval)
# ---------------------------------------------------------------------------


def _q192_oracle() -> str:
    return f"""
    WITH u AS (
      SELECT label, unnest(list_transform(embedding,
               (x, i) -> {{'pos': i - 1, 'v': x::DOUBLE}})) AS u
      FROM embeddings),
    cpos AS (SELECT u.pos AS pos, ROUND(SUM(u.v) / COUNT(*), 6) AS mv
             FROM u WHERE label = {CAL_LABEL} GROUP BY 1),
    cent AS (SELECT list(mv ORDER BY pos) AS c FROM cpos),
    scored AS (
      SELECT vec_id,
             CASE WHEN label = {CAL_LABEL} THEN 1 ELSE 0 END AS y,
             ROUND((1 + {_COS_SQL.format(a='embedding', b='c')}) / 2, 6) AS s
      FROM embeddings, cent),
    ranked AS (
      SELECT y, s, NTILE(10) OVER (ORDER BY s DESC, vec_id) AS decile
      FROM scored),
    base AS (SELECT AVG(y * 1.0) AS base_rate FROM scored),
    g AS (SELECT decile, COUNT(*) AS n, SUM(y) AS n_pos,
                 ROUND(AVG(y * 1.0), 6) AS resp_rate,
                 ROUND(SUM(SUM(y)) OVER (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   * 1.0 / SUM(COUNT(*)) OVER (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                   AS cum_resp_rate
          FROM ranked GROUP BY decile)
    SELECT CAST(decile AS BIGINT) AS decile, CAST(n AS BIGINT) AS n,
           CAST(n_pos AS BIGINT) AS n_pos,
           (resp_rate + 0.0) AS resp_rate,
           {sql_dec('resp_rate / base_rate', 6)} AS lift,
           (cum_resp_rate + 0.0) AS cum_resp_rate,
           {sql_dec('cum_resp_rate / base_rate', 6)} AS cum_lift
    FROM g, base
    """


def _decile_of(r: Column, n: Column) -> Column:
    """NTILE(10) tile index of global rank ``r`` (1-based) over ``n``
    rows — the closed form of Spark/DuckDB NTILE semantics: the first
    n%10 tiles hold floor(n/10)+1 rows, the rest floor(n/10).  Pure
    integer arithmetic carried in doubles (exact below 2^53 rows)."""
    q = F.floor(n / 10).cast("long")
    r0 = (n % 10).cast("long")
    qp1 = q + 1
    d1 = F.floor((r + qp1 - 1) / qp1).cast("long")
    d2 = r0 + F.floor((r - r0 * qp1 + q - 1) / q).cast("long")
    return F.when(r <= r0 * qp1, d1).otherwise(d2)


@query("q192_decile_lift", oracle=_q192_oracle())
def q192_decile_lift(
    spark: SparkSession, sf_dir: str, exact_audit: str = "auto"
) -> DataFrame:
    """Decile lift table: rank the corpus by the q177 centroid-affinity
    score, split into 10 equal-size deciles, and report each decile's
    response rate and lift over the base rate plus the cumulative
    variants — THE campaign-targeting eval (q156's AUC says the ranking
    is good; the lift table says what you GET by mailing the top k
    deciles).

    Scale shape: scoring is one map-side pass against the broadcast
    centroid; everything downstream is a 10-row frame with a 1-row
    base-rate attach.  Scores round to 6dp before ranking with the
    vec_id tiebreak (engine-agreed decile edges).

    The decile CUT takes the ``exact_audit`` knob (plans/helpers.py):
    'auto' keeps the oracle-parity global NTILE up to
    EXACT_AUDIT_MAX_ROWS and switches to the 'distributed' cut above it
    — which is still BIT-EQUAL to NTILE, not an approximation: rows
    collapse to distinct 6dp scores (≤ 1e6+1 values by construction),
    one cumulative over that bounded table gives each tie class its
    global rank span, whole classes bin map-side via the closed-form
    NTILE tile formula, and only the ≤ 9 classes straddling a decile
    boundary are re-ranked per-row (row_number within the tie class by
    vec_id — the degenerate worst case is one giant all-equal-scores
    class, the regime where ranking itself is meaningless).  Pinned
    bit-equal to the NTILE path in tests/test_exact_audit_gate.py.
    """
    emb = table(spark, sf_dir, "embeddings")
    cpos = (
        emb.filter(F.col("label") == CAL_LABEL)
        .select(F.posexplode("embedding").alias("pos", "v"))
        .groupBy("pos")
        .agg(
            F.round(F.sum(F.col("v").cast("double")) / F.count("*"), 6).alias(
                "mv"
            )
        )
    )
    cent = cpos.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mv"))),
            lambda s: s["mv"],
        ).alias("c")
    )
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        (F.col("label") == CAL_LABEL).cast("int").alias("y"),
        F.round(
            (F.lit(1.0) + _cosine(F.col("embedding"), F.col("c"))) / 2, 6
        ).alias("s"),
    )
    mode = resolve_exact_audit(
        exact_audit,
        lambda: cached_count(emb, f"{sf_dir}/embeddings"),
        scale_mode="distributed",
    )
    if mode == "distributed":
        from pyspark.storagelevel import StorageLevel

        # scored feeds the class collapse, the straddle re-rank AND the
        # base rate — persist the one map-side scoring pass.
        scored = scored.persist(StorageLevel.MEMORY_AND_DISK)
        sgrp = scored.groupBy("s").agg(
            F.count("*").alias("cnt"), F.sum("y").alias("pos")
        )
        tot = sgrp.agg(F.sum("cnt").alias("n_total"))
        # global window over DISTINCT 6dp scores — bounded by 1e6+1
        # values by construction, not by the corpus
        cum = sgrp.crossJoin(F.broadcast(tot)).withColumn(
            "cum_before",
            F.coalesce(
                F.sum("cnt").over(
                    W.orderBy(F.col("s").desc()).rowsBetween(
                        W.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        marked = cum.withColumn(
            "d_lo", _decile_of(F.col("cum_before") + 1, F.col("n_total"))
        ).withColumn(
            "d_hi",
            _decile_of(
                F.col("cum_before") + F.col("cnt"), F.col("n_total")
            ),
        )
        whole = (
            marked.filter(F.col("d_lo") == F.col("d_hi"))
            .groupBy(F.col("d_lo").alias("decile"))
            .agg(F.sum("cnt").alias("n"), F.sum("pos").alias("n_pos"))
        )
        strad_keys = marked.filter(F.col("d_lo") != F.col("d_hi")).select(
            "s", "cum_before", "n_total"
        )
        strad = (
            scored.join(F.broadcast(strad_keys), "s")
            .withColumn(
                "r",
                F.col("cum_before")
                + F.row_number().over(W.partitionBy("s").orderBy("vec_id")),
            )
            .withColumn("decile", _decile_of(F.col("r"), F.col("n_total")))
            .groupBy("decile")
            .agg(F.count("*").alias("n"), F.sum("y").alias("n_pos"))
        )
        agg = (
            whole.unionByName(strad)
            .groupBy("decile")
            .agg(F.sum("n").alias("n"), F.sum("n_pos").alias("n_pos"))
        )
    else:
        ranked = scored.select(
            "y",
            F.ntile(10)
            .over(W.orderBy(F.col("s").desc(), "vec_id"))
            .alias("decile"),
        )
        agg = ranked.groupBy("decile").agg(
            F.count("*").alias("n"), F.sum("y").alias("n_pos")
        )
    base = scored.agg(F.avg(F.col("y") * 1.0).alias("base_rate"))
    cum_w = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    g = agg.withColumn(
        "resp_rate", F.round(F.col("n_pos") * 1.0 / F.col("n"), 6)
    ).withColumn(
        "cum_resp_rate",
        F.round(
            F.sum("n_pos").over(cum_w) * 1.0 / F.sum("n").over(cum_w), 6
        ),
    )
    return g.crossJoin(F.broadcast(base)).select(
        F.col("decile").cast("long").alias("decile"),
        F.col("n").cast("long").alias("n"),
        F.col("n_pos").cast("long").alias("n_pos"),
        dec(F.col("resp_rate"), 6).alias("resp_rate"),
        dec(F.col("resp_rate") / F.col("base_rate"), 6).alias("lift"),
        dec(F.col("cum_resp_rate"), 6).alias("cum_resp_rate"),
        dec(F.col("cum_resp_rate") / F.col("base_rate"), 6).alias("cum_lift"),
    )


# ---------------------------------------------------------------------------
# q195 — token yield curve over a quality cut (what a filter KEEPS)
# ---------------------------------------------------------------------------


@query(
    "q195_token_yield_curve",
    oracle="""
    WITH d AS (
      SELECT len(string_split(text, ' ')) AS n_tok,
             (len(list_distinct(string_split(text, ' '))) * 100)
               // len(string_split(text, ' ')) AS q
      FROM documents),
    b AS (SELECT q, COUNT(*) AS n_docs, SUM(n_tok) AS n_tokens
          FROM d GROUP BY q),
    tot AS (SELECT SUM(n_tokens) AS total_tokens FROM b),
    c AS (SELECT q, n_docs, n_tokens,
                 SUM(n_docs) OVER (ORDER BY q DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_docs,
                 SUM(n_tokens) OVER (ORDER BY q DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
          FROM b)
    SELECT CAST(q AS BIGINT) AS quality_pct,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_docs AS BIGINT) AS cum_docs,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           (ROUND(cum_tokens * 1.0 / tot.total_tokens, 6) + 0.0) AS cum_token_frac
    FROM c, tot
    """,
)
def q195_token_yield_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token yield curve: bin documents by a 2dp lexical-diversity
    quality score (type-token ratio) and report, from the highest bin
    down, how many documents and TOKENS a cut at that bin keeps — the
    curve every corpus-filtering decision actually trades on ("dropping
    the bottom 30% of docs costs how much training data?"), the
    data-budget companion to q99's boolean filter chain.

    Scale shape: one map-side score per doc collapses the corpus to
    ≤ 101 quality bins (integer percentage of the ratio — integer
    division, so the bin edge is engine-exact with no decimal-rounding
    ties); the cumulative runs on that bounded table (allowlisted
    global window) with a 1-row total attach.
    """
    docs = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    d = docs.select(
        F.size(toks).alias("n_tok"),
        F.expr(
            "(size(array_distinct(split(text, ' '))) * 100)"
            " div size(split(text, ' '))"
        ).alias("q"),
    )
    b = d.groupBy("q").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens")
    )
    tot = b.agg(F.sum("n_tokens").alias("total_tokens"))
    cum_w = W.orderBy(F.col("q").desc()).rowsBetween(W.unboundedPreceding, 0)
    c = b.withColumn("cum_docs", F.sum("n_docs").over(cum_w)).withColumn(
        "cum_tokens", F.sum("n_tokens").over(cum_w)
    )
    return c.crossJoin(F.broadcast(tot)).select(
        F.col("q").cast("long").alias("quality_pct"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("cum_docs").cast("long").alias("cum_docs"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        dec(F.col("cum_tokens") * 1.0 / F.col("total_tokens"), 6).alias(
            "cum_token_frac"
        ),
    )


# ---------------------------------------------------------------------------
# q196 — Neyman allocation for stratified corpus sampling
# ---------------------------------------------------------------------------

NEYMAN_BUDGET = 10_000


@query(
    "q196_sample_allocation",
    oracle=f"""
    WITH s AS (
      SELECT source, COUNT(*) AS n,
             SUM(n_chars) AS sx, SUM(n_chars * n_chars) AS sxx
      FROM documents GROUP BY source),
    sd AS (SELECT source, n,
                  ROUND(CASE WHEN n > 1
                        THEN sqrt((sxx - sx * 1.0 * sx / n) / (n - 1))
                        ELSE 0 END, 4) AS sd
           FROM s),
    w AS (SELECT source, n, sd, n * sd AS wt FROM sd),
    tot AS (SELECT SUM(wt) AS total_wt FROM w),
    sh AS (SELECT source, n, sd,
                  ROUND(wt / tot.total_wt, 6) AS share
           FROM w, tot)
    SELECT source, CAST(n AS BIGINT) AS n_docs, (sd + 0.0) AS len_stddev,
           (share + 0.0) AS share,
           CAST(ROUND({NEYMAN_BUDGET} * share) AS BIGINT) AS alloc
    FROM sh
    """,
)
def q196_sample_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman (optimal) allocation of a {NEYMAN_BUDGET}-document sample
    budget across source strata: sample ∝ N_h·S_h, so variable strata
    (high length-stddev sources) get proportionally more of the budget
    than uniform ones — THE sampling-design primitive behind corpus
    audits and eval-set construction (a uniform allocation wastes
    budget on homogeneous strata).

    Scale shape: one hash agg collapses the corpus to |sources| rows of
    INTEGER moment sums (Σx, Σx² — exact in both engines, so the
    stddev is bit-identical BEFORE its 4dp round); everything after
    runs on the bounded strata table with a 1-row total attach.  The
    allocation derives from the 6dp-rounded share so the final integer
    is engine-agreed.
    """
    docs = table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("n_chars").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("sxx"),
    )
    sd = F.when(
        F.col("n") > 1,
        F.round(
            F.sqrt(
                (F.col("sxx") - F.col("sx") * 1.0 * F.col("sx") / F.col("n"))
                / (F.col("n") - 1)
            ),
            4,
        ),
    ).otherwise(F.lit(0.0))
    w = s.withColumn("sd", sd).withColumn("wt", F.col("n") * F.col("sd"))
    tot = w.agg(F.sum("wt").alias("total_wt"))
    return w.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        dec(F.col("sd"), 4).alias("len_stddev"),
        dec(F.col("wt") / F.col("total_wt"), 6).alias("share"),
        F.round(NEYMAN_BUDGET * F.round(F.col("wt") / F.col("total_wt"), 6))
        .cast("long")
        .alias("alloc"),
    )


# ---------------------------------------------------------------------------
# q197 — per-source character entropy (boilerplate / junk detector)
# ---------------------------------------------------------------------------


@query(
    "q197_char_entropy",
    oracle="""
    WITH ch AS (
      SELECT source, substr(text, i, 1) AS c
      FROM documents,
           LATERAL (SELECT unnest(generate_series(1, length(text))) AS i)
      WHERE length(text) >= 1),
    cnt AS (SELECT source, c, COUNT(*) AS n FROM ch GROUP BY source, c),
    st AS (SELECT source, SUM(n) AS total, COUNT(*) AS ndist,
                  SUM(n * log2(n * 1.0)) AS sln
           FROM cnt GROUP BY source)
    SELECT source, CAST(total AS BIGINT) AS n_chars,
           CAST(ndist AS BIGINT) AS n_distinct_chars,
           (ROUND(log2(total * 1.0) - sln / total, 6) + 0.0) AS entropy_bits
    FROM st
    """,
)
def q197_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source character-level entropy: low bits/char flags
    boilerplate, templated, or binary-junk sources BEFORE tokenization
    — the source-granularity screen run ahead of q107's per-document
    token entropy (compression-ratio proxies are this statistic in
    disguise).

    Scale shape: the position explode emits one row per character (the
    exact contract — a corpus-bytes-sized map-side pass, combinable
    into the (source, char) hash agg whose output is bounded by
    |sources| × |alphabet|); entropy uses q107's algebraic form
    H = log2(N) − Σ c·log2(c)/N so both engines sum the SAME per-char
    terms.
    """
    docs = table(spark, sf_dir, "documents")
    ch = (
        docs.filter(F.length("text") >= 1)
        .select(
            "source",
            "text",
            F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i"),
        )
        .select(
            "source", F.col("text").substr(F.col("i"), F.lit(1)).alias("c")
        )
    )
    cnt = ch.groupBy("source", "c").agg(F.count("*").alias("n"))
    st = cnt.groupBy("source").agg(
        F.sum("n").alias("total"),
        F.count("*").alias("ndist"),
        F.sum(F.col("n") * F.log2(F.col("n") * 1.0)).alias("sln"),
    )
    return st.select(
        "source",
        F.col("total").cast("long").alias("n_chars"),
        F.col("ndist").cast("long").alias("n_distinct_chars"),
        dec(
            F.log2(F.col("total") * 1.0) - F.col("sln") / F.col("total"), 6
        ).alias("entropy_bits"),
    )


# ---------------------------------------------------------------------------
# q214 — contrastive triplet mining (anchor, positive, hard/random negative)
# ---------------------------------------------------------------------------

#: same-bucket pairs BELOW this Jaccard are "hard" negatives: the LSH
#: blocking thought they might match, exact verification says they
#: don't — exactly the near-miss band contrastive training wants.
HARD_NEG_T = 0.2
#: bounded random-negative pool: the NEG_POOL docs with the smallest
#: md5(doc_id).  A per-anchor pick from a broadcast pool replaces the
#: corpus-sized random join a naive sampler would do.
NEG_POOL = 64


def _q214_oracle() -> str:
    coin = (
        "(('0x' || substr(md5(CAST(p.anchor AS VARCHAR)), 1, 8))::BIGINT"
        f" % {NEG_POOL})"
    )
    return f"""
    WITH {_lsh_verified_ctes()},
    sym AS (SELECT doc_a AS anchor, doc_b AS other, j FROM verified
            UNION ALL SELECT doc_b, doc_a, j FROM verified),
    sym6 AS (SELECT anchor, other, j, ROUND(j, 6) AS pj6 FROM sym),
    pos AS (SELECT anchor, other AS positive, pj6 FROM sym6
            WHERE j >= {JACCARD_T}
            QUALIFY row_number() OVER (PARTITION BY anchor
                                       ORDER BY pj6 DESC, other) = 1),
    hard AS (SELECT anchor, other AS hard_neg, pj6 AS hj6 FROM sym6
             WHERE j < {HARD_NEG_T}
             QUALIFY row_number() OVER (PARTITION BY anchor
                                        ORDER BY pj6 DESC, other) = 1),
    pool AS (SELECT doc_id,
                    row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                       doc_id) - 1 AS idx
             FROM (SELECT doc_id FROM documents
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   LIMIT {NEG_POOL})),
    rnd AS (SELECT p.anchor, pl.doc_id AS rand_neg
            FROM pos p JOIN pool pl
              ON pl.doc_id <> p.anchor AND pl.doc_id <> p.positive
            QUALIFY row_number() OVER (PARTITION BY p.anchor
              ORDER BY (pl.idx - {coin} + {NEG_POOL}) % {NEG_POOL}) = 1)
    SELECT p.anchor, p.positive, (p.pj6 + 0.0) AS pos_jaccard,
           h.hard_neg, (h.hj6 + 0.0) AS hard_jaccard, r.rand_neg
    FROM pos p
    LEFT JOIN hard h ON p.anchor = h.anchor
    JOIN rnd r ON p.anchor = r.anchor
    """


@query("q214_triplet_mining", oracle=_q214_oracle())
def q214_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training triplets from the q41 LSH machinery: per
    anchor (any doc with a verified near-dup), the highest-Jaccard
    partner as POSITIVE, the highest same-bucket pair BELOW
    {HARD_NEG_T} as HARD negative (the blocking's near-misses — the
    band a contrastive objective learns the most from), and a
    deterministic md5-rotated pick from a bounded pool as RANDOM
    negative — the (anchor, positive, negative) generator an
    embedding-model training pipeline runs over the deduped corpus.

    Scale shape: candidate generation + verification IS q41's capped
    band-bucket engine (shared ``_lsh_verified_candidates``; its own
    observation key, so cap counters stay attributable); the two
    top-1-per-anchor windows rank on ROUNDED Jaccard + id (engine-
    agreed boundaries); the random pool is a {NEG_POOL}-row
    TakeOrderedAndProject collected to an array literal — the
    per-anchor pick is a pure map-side element_at over the rotated
    ring, never a corpus join (and no window).
    """
    v = _lsh_verified_candidates(spark, sf_dir, "q214_triplet_mining")
    sym = (
        v.select(F.col("doc_a").alias("anchor"), F.col("doc_b").alias("other"), "j")
        .unionAll(
            v.select(
                F.col("doc_b").alias("anchor"), F.col("doc_a").alias("other"), "j"
            )
        )
        .withColumn("pj6", F.round("j", 6))
    )
    wtop = W.partitionBy("anchor").orderBy(F.col("pj6").desc(), F.col("other"))
    pos = (
        sym.filter(F.col("j") >= JACCARD_T)
        .withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") == 1)
        .select(
            "anchor",
            F.col("other").alias("positive"),
            (F.col("pj6") + F.lit(0.0)).alias("pos_jaccard"),
        )
    )
    hard = (
        sym.filter(F.col("j") < HARD_NEG_T)
        .withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") == 1)
        .select(
            "anchor",
            F.col("other").alias("hard_neg"),
            (F.col("pj6") + F.lit(0.0)).alias("hard_jaccard"),
        )
    )
    # Map-side random-negative pick (VERDICT r6 ask #6): the pool is a
    # NEG_POOL-row TakeOrderedAndProject COLLECTED to an array literal
    # (bounded control plane), and the per-anchor pick is element_at on
    # the md5-rotated ring with anchor/positive skips — at most two
    # pool slots are excluded per anchor, so probing three consecutive
    # ring positions is exhaustive.  Replaces the |anchors|×NEG_POOL
    # inequality join + row_number window the r6 plan carried; the
    # ring-walk order is identical to the oracle's
    # (idx - h + NEG_POOL) % NEG_POOL ranking, so the hash is unchanged.
    md5_order = [F.md5(F.col("doc_id").cast("string")), F.col("doc_id")]
    pool_ids = [
        r["doc_id"]
        for r in bounded_collect(
            table(spark, sf_dir, "documents")
            .select("doc_id")
            .orderBy(*md5_order)
            .limit(NEG_POOL),
            NEG_POOL,
            "q214_negative_pool",
        )
    ]
    m = len(pool_ids)
    if m == 0:
        # Empty corpus: F.array()/F.coalesce() with zero args raise at
        # construction (ADVICE r7 #2) — degrade to the empty result the
        # pre-r7 join-based plan produced.
        return spark.createDataFrame(
            [],
            "anchor long, positive long, pos_jaccard double, "
            "hard_neg long, hard_jaccard double, rand_neg long",
        )
    arr = F.array(*[F.lit(i) for i in pool_ids])
    h = (
        F.conv(F.substring(F.md5(F.col("anchor").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % NEG_POOL
    )
    # the oracle walks idx = h, h+1, …, NEG_POOL-1, 0, …; positions ≥ m
    # don't exist when the corpus is smaller than the pool, so the walk
    # effectively starts at h when h < m, else at 0
    start = F.when(h < m, h).otherwise(F.lit(0))

    def probe(k: int):
        e = F.element_at(arr, ((start + k) % m + 1).cast("int"))
        return F.when((e != F.col("anchor")) & (e != F.col("positive")), e)

    pick = F.coalesce(*[probe(k) for k in range(min(3, m))])
    return (
        pos.withColumn("rand_neg", pick)
        .filter(F.col("rand_neg").isNotNull())
        .join(hard, "anchor", "left")
        .select(
            "anchor",
            "positive",
            "pos_jaccard",
            "hard_neg",
            "hard_jaccard",
            "rand_neg",
        )
    )


# ---------------------------------------------------------------------------
# q232 — Cohen's kappa agreement audit of the q51 language classifier
# ---------------------------------------------------------------------------


def _q232_oracle() -> str:
    return f"""
    WITH f51 AS ({ORACLES["q51_lang_id"]}),
    cm AS (SELECT lang, pred_lang, COUNT(*) AS n FROM f51 GROUP BY 1, 2),
    cls AS (SELECT lang AS c FROM cm UNION SELECT pred_lang FROM cm),
    lab AS (SELECT lang AS c, SUM(n) AS n_label FROM cm GROUP BY 1),
    prd AS (SELECT pred_lang AS c, SUM(n) AS n_pred FROM cm GROUP BY 1),
    dg AS (SELECT lang AS c, SUM(n) AS n_agree FROM cm
           WHERE lang = pred_lang GROUP BY 1),
    per AS (
      SELECT cls.c,
             COALESCE(lab.n_label, 0) AS n_label,
             COALESCE(prd.n_pred, 0) AS n_pred,
             COALESCE(dg.n_agree, 0) AS n_agree
      FROM cls
      LEFT JOIN lab ON lab.c = cls.c
      LEFT JOIN prd ON prd.c = cls.c
      LEFT JOIN dg ON dg.c = cls.c),
    tot AS (
      SELECT SUM(n_label) AS n, SUM(n_agree) AS agree,
             SUM(n_label * n_pred) AS pe_num
      FROM per)
    SELECT per.c AS lang_class,
           CAST(per.n_label AS BIGINT) AS n_label,
           CAST(per.n_pred AS BIGINT) AS n_pred,
           CAST(per.n_agree AS BIGINT) AS n_agree,
           (ROUND(t.agree * 1e0 / t.n, 4) + 0.0) AS accuracy,
           (ROUND(t.pe_num * 1e0 / (t.n * t.n), 6) + 0.0)
             AS expected_agreement,
           (ROUND((t.agree * 1e0 / t.n - t.pe_num * 1e0 / (t.n * t.n))
                  / (1e0 - t.pe_num * 1e0 / (t.n * t.n)), 6) + 0.0)
             AS kappa
    FROM per CROSS JOIN tot t
    """


@query("q232_cohens_kappa", oracle=_q232_oracle())
def q232_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the q51 marker-word language classifier
    and the labeled ``lang`` column: chance-corrected agreement
    κ = (p_o − p_e)/(1 − p_e) with the per-class confusion margins —
    the annotation-QA metric every labeling pipeline reports instead
    of raw accuracy (a classifier that always answers the majority
    class can score high accuracy but κ ≈ 0).  Composes the REGISTERED
    q51 operator (and its oracle) rather than re-deriving the
    classifier, so the two can never drift (the q99 composition rule).

    Parity: confusion counts and margins are exact integers; p_o, p_e,
    and κ are single double expressions over them with identical
    association order (1e0 literals — Spark SQL parses 1.0 as
    DECIMAL); 4/6-dp rounds at the edge.

    Scale shape: q51 is map-only; one (label, pred) hash agg collapses
    the corpus to ≤ |langs|² cells, everything downstream is
    bounded-frame joins and a 1-row attach.
    """
    d = q51_lang_id(spark, sf_dir)
    cm = d.groupBy("lang", "pred_lang").agg(F.count("*").alias("n"))
    cls = (
        cm.select(F.col("lang").alias("c"))
        .union(cm.select(F.col("pred_lang").alias("c")))
        .distinct()
    )
    lab = cm.groupBy(F.col("lang").alias("c")).agg(F.sum("n").alias("n_label"))
    prd = cm.groupBy(F.col("pred_lang").alias("c")).agg(
        F.sum("n").alias("n_pred")
    )
    dg = (
        cm.filter(F.col("lang") == F.col("pred_lang"))
        .groupBy(F.col("lang").alias("c"))
        .agg(F.sum("n").alias("n_agree"))
    )
    per = (
        cls.join(lab, "c", "left")
        .join(prd, "c", "left")
        .join(dg, "c", "left")
        .select(
            "c",
            F.coalesce("n_label", F.lit(0)).alias("n_label"),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("n_agree", F.lit(0)).alias("n_agree"),
        )
    )
    tot = per.agg(
        F.sum("n_label").alias("n"),
        F.sum("n_agree").alias("agree"),
        F.sum(F.col("n_label") * F.col("n_pred")).alias("pe_num"),
    )
    po = F.expr("agree * 1e0 / n")
    pe = F.expr("pe_num * 1e0 / (n * n)")
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("c").alias("lang_class"),
        F.col("n_label").cast("long"),
        F.col("n_pred").cast("long"),
        F.col("n_agree").cast("long"),
        dec(po, 4).alias("accuracy"),
        dec(pe, 6).alias("expected_agreement"),
        dec((po - pe) / (F.lit(1.0) - pe), 6).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# q235 — embedding centroid drift (A/A split, integer fixed-point)
# ---------------------------------------------------------------------------

#: quantization scale for drift sums (the q201 KM_FP discipline:
#: integer sums are order-independent, so centroid accumulation is
#: engine- and partitioning-exact).
DRIFT_FP = 1000


def _q235_oracle() -> str:
    return f"""
    WITH q AS (
      SELECT vec_id, label,
             ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS half,
             list_transform(embedding, x ->
               CAST(FLOOR(x::DOUBLE * {DRIFT_FP} + 0.5) AS BIGINT)) AS qa
      FROM embeddings),
    pos AS (
      SELECT label, half, us.u.pos AS pos, us.u.v AS qv
      FROM (SELECT label, half,
                   unnest(list_transform(qa,
                     (x, i) -> {{'pos': i - 1, 'v': x}})) AS u
            FROM q) us),
    s AS (
      SELECT label, half, pos, SUM(qv) AS sv, SUM(qv * qv) AS svv
      FROM pos GROUP BY 1, 2, 3),
    n AS (SELECT label, half, COUNT(*) AS nn FROM q GROUP BY 1, 2),
    m AS (
      SELECT s.label, s.half, s.pos,
             CAST(s.sv // n.nn AS BIGINT) AS mv
      FROM s JOIN n ON n.label = s.label AND n.half = s.half),
    tr AS (
      SELECT s.label, s.half,
             SUM(n.nn * s.svv - s.sv * s.sv) AS tr_num
      FROM s JOIN n ON n.label = s.label AND n.half = s.half
      GROUP BY 1, 2),
    pair AS (
      SELECT a.label, a.pos, a.mv AS av, b.mv AS bv
      FROM m a JOIN m b
        ON a.label = b.label AND a.pos = b.pos
       AND a.half = 0 AND b.half = 1),
    mom AS (
      SELECT label, SUM(av * bv) AS dot,
             SUM(av * av) AS na2, SUM(bv * bv) AS nb2,
             SUM((av - bv) * (av - bv)) AS gap2
      FROM pair GROUP BY 1)
    SELECT mom.label,
           CAST(x.nn AS BIGINT) AS n_half_a,
           CAST(y.nn AS BIGINT) AS n_half_b,
           (ROUND(mom.dot / (sqrt(mom.na2 * 1e0) * sqrt(mom.nb2 * 1e0)), 6)
              + 0.0) AS centroid_cosine,
           (ROUND(sqrt(mom.na2 * 1e0) / sqrt(mom.nb2 * 1e0), 4) + 0.0)
             AS norm_ratio,
           (ROUND(mom.gap2
                  / ((ta.tr_num * 1e0 / (x.nn * x.nn)
                      + tb.tr_num * 1e0 / (y.nn * y.nn)) / 2), 6) + 0.0)
             AS mean_shift_ratio
    FROM mom
    JOIN n x ON x.label = mom.label AND x.half = 0
    JOIN n y ON y.label = mom.label AND y.half = 1
    JOIN tr ta ON ta.label = mom.label AND ta.half = 0
    JOIN tr tb ON tb.label = mom.label AND tb.half = 1
    """


@query("q235_embedding_centroid_drift", oracle=_q235_oracle())
def q235_embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor: per label, the cosine between the
    centroid of md5-half A and md5-half B (plus the norm ratio) — run
    between yesterday's and today's embedding batches this catches an
    encoder change / re-normalization / pipeline bug BEFORE it poisons
    ANN indexes and dedup thresholds.  The primary statistic is the
    MEAN-SHIFT RATIO ||mA − mB||² / mean(trace varA/nA², varB/nB²·n²)
    — ≈ 1/nA + 1/nB under A/A, dimension-free; the centroid cosine is
    reported too but is only informative when label means are far from
    the origin (on this fixture they are nearly centered).

    Parity: embeddings quantize to {DRIFT_FP} fixed-point (the q201
    rule) so the per-(label, half, dim) centroid sums are exact
    integers; the mean is an engine-identical truncating div; dot and
    norms are integer sums over the dim-bounded frame; ONE double
    expression at the edge (6/4 dp).

    Scale shape: one map-side quantize + posexplode into a
    (label × 2 × dim)-cell hash agg (partial combine bounds the
    shuffle), then everything runs on the dim-bounded collapse.
    """
    emb = table(spark, sf_dir, "embeddings")
    q = emb.select(
        "label",
        (
            F.conv(
                F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10
            ).cast("long")
            % 2
        ).alias("half"),
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * DRIFT_FP + 0.5).cast("long"),
        ).alias("qa"),
    )
    s = (
        q.select("label", "half", F.posexplode("qa").alias("pos", "qv"))
        .groupBy("label", "half", "pos")
        .agg(
            F.sum("qv").alias("sv"),
            F.sum(F.col("qv") * F.col("qv")).alias("svv"),
        )
    )
    n = q.groupBy("label", "half").agg(F.count("*").alias("nn"))
    m = s.join(n, ["label", "half"]).select(
        "label", "half", "pos", F.expr("CAST(sv div nn AS BIGINT)").alias("mv")
    )
    a = m.filter(F.col("half") == 0).select(
        "label", "pos", F.col("mv").alias("av")
    )
    b = m.filter(F.col("half") == 1).select(
        "label", "pos", F.col("mv").alias("bv")
    )
    mom = (
        a.join(b, ["label", "pos"])
        .groupBy("label")
        .agg(
            F.sum(F.col("av") * F.col("bv")).alias("dot"),
            F.sum(F.col("av") * F.col("av")).alias("na2"),
            F.sum(F.col("bv") * F.col("bv")).alias("nb2"),
            F.sum(
                (F.col("av") - F.col("bv")) * (F.col("av") - F.col("bv"))
            ).alias("gap2"),
        )
    )
    tr = (
        s.join(n, ["label", "half"])
        .groupBy("label", "half")
        .agg(
            F.sum(
                F.col("nn") * F.col("svv") - F.col("sv") * F.col("sv")
            ).alias("tr_num")
        )
    )
    ta = tr.filter(F.col("half") == 0).select("label", F.col("tr_num").alias("tra"))
    tb = tr.filter(F.col("half") == 1).select("label", F.col("tr_num").alias("trb"))
    na = n.filter(F.col("half") == 0).select("label", F.col("nn").alias("n_half_a"))
    nb = n.filter(F.col("half") == 1).select("label", F.col("nn").alias("n_half_b"))
    return (
        mom.join(na, "label")
        .join(nb, "label")
        .join(ta, "label")
        .join(tb, "label")
        .select(
            "label",
            F.col("n_half_a").cast("long"),
            F.col("n_half_b").cast("long"),
            dec(
                F.col("dot")
                / (
                    F.sqrt(F.col("na2") * F.expr("1e0"))
                    * F.sqrt(F.col("nb2") * F.expr("1e0"))
                ),
                6,
            ).alias("centroid_cosine"),
            dec(
                F.sqrt(F.col("na2") * F.expr("1e0"))
                / F.sqrt(F.col("nb2") * F.expr("1e0")),
                4,
            ).alias("norm_ratio"),
            dec(
                F.col("gap2")
                / (
                    (
                        F.col("tra") * F.expr("1e0")
                        / (F.col("n_half_a") * F.col("n_half_a"))
                        + F.col("trb") * F.expr("1e0")
                        / (F.col("n_half_b") * F.col("n_half_b"))
                    )
                    / 2
                ),
                6,
            ).alias("mean_shift_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# q236 — MMR (maximal marginal relevance) diversity selection
# ---------------------------------------------------------------------------

MMR_PICKS = 10
#: λ = 7/10 as integer weights on the 6-dp-rounded cosines: the MMR
#: score is 7·sim(query, d) − 3·max_{p∈picked} sim(d, p) — small-int
#: scaling of identical doubles keeps every comparison engine-exact.
MMR_REL_W, MMR_DIV_W = 7, 3


def _q236_oracle() -> str:
    cos_q = _COS_SQL.format(a="e.embedding", b="q.qv")
    cos_p = _COS_SQL.format(a="c.embedding", b="pe.embedding")
    iters = []
    for r in range(1, MMR_PICKS + 1):
        prev_p, prev_m = f"picked{r - 1}", f"ms{r - 1}"
        iters.append(f"""
    sc{r} AS MATERIALIZED (
      SELECT c.vec_id, c.sq, COALESCE(m.ms, 0e0) AS ms,
             {MMR_REL_W} * c.sq - {MMR_DIV_W} * COALESCE(m.ms, 0e0) AS mmr
      FROM cand c LEFT JOIN {prev_m} m ON m.vec_id = c.vec_id
      WHERE c.vec_id NOT IN (SELECT vec_id FROM {prev_p})),
    p{r} AS MATERIALIZED (
      SELECT vec_id, sq, mmr FROM sc{r} ORDER BY mmr DESC, vec_id LIMIT 1),
    pe{r} AS MATERIALIZED (
      SELECT c.vec_id, c.embedding FROM cand c
      JOIN p{r} pp ON pp.vec_id = c.vec_id),
    ms{r} AS MATERIALIZED (
      SELECT c.vec_id,
             GREATEST(COALESCE(m.ms, 0e0),
                      ROUND({cos_p}, 6)) AS ms
      FROM cand c
      CROSS JOIN pe{r} pe
      LEFT JOIN {prev_m} m ON m.vec_id = c.vec_id),
    picked{r} AS MATERIALIZED (
      SELECT vec_id, sq, mmr, CAST({r} AS BIGINT) AS pick_rank FROM p{r}
      UNION ALL SELECT vec_id, sq, mmr, pick_rank FROM {prev_p})""")
    return f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    cand AS MATERIALIZED (
      SELECT e.vec_id, e.embedding,
             ROUND({cos_q}, 6) AS sq
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
    picked0 AS MATERIALIZED (
      SELECT CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS DOUBLE) AS sq,
             CAST(NULL AS DOUBLE) AS mmr, CAST(NULL AS BIGINT) AS pick_rank
      WHERE 1 = 0),
    ms0 AS MATERIALIZED (
      SELECT CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS DOUBLE) AS ms
      WHERE 1 = 0),
    {','.join(iters)}
    SELECT pick_rank, vec_id,
           (sq + 0.0) AS rel_cos,
           (ROUND(mmr, 4) + 0.0) AS mmr_score
    FROM picked{MMR_PICKS}
    ORDER BY pick_rank
    """


@query("q236_mmr_selection", oracle=_q236_oracle())
def q236_mmr_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance selection (Carbonell & Goldstein
    1998): greedily pick {MMR_PICKS} vectors maximizing
    {MMR_REL_W}/10·sim(query, d) − {MMR_DIV_W}/10·max sim(d, picked) —
    the relevance-vs-redundancy re-ranker behind diverse RAG retrieval
    and diverse few-shot exemplar choice; q225 diversifies by token
    coverage, this diversifies in embedding space.

    Parity: every cosine uses the strict left-to-right _cosine /
    list_cosine_similarity pair (bit-compatible, q45's contract) and
    is 6-dp rounded BEFORE the small-integer-weighted MMR arithmetic,
    so each round's argmax (vec_id tiebreak) — and hence the whole
    trajectory — is engine-identical; the oracle replays it as chained
    MATERIALIZED CTEs.

    Scale shape: the candidate table (vec_id, embedding, rel-cos) is
    computed once and checkpointed; each round is ONE map-side cosine
    vs the newly-picked vector (a driver-side literal — bounded
    control plane, the q201 centroid pattern), a running elementwise
    MAX, and a global top-1 TakeOrderedAndProject.
    """
    emb = table(spark, sf_dir, "embeddings")
    qvec = [
        float(v)
        for v in bounded_collect(
            emb.filter(F.col("vec_id") == 0).select("embedding"),
            1,
            "q236_mmr_query_vector",
        )[0][0]
    ]
    qcol = F.array(*[F.lit(v) for v in qvec])
    cand = local_checkpoint(
        emb.filter(F.col("vec_id") != 0).select(
            "vec_id",
            "embedding",
            F.round(_cosine(F.col("embedding"), qcol), 6).alias("sq"),
        ),
        "q236 mmr candidates",
    )
    ms: DataFrame | None = None
    picked: list[tuple[int, int, float, float]] = []
    for r in range(1, MMR_PICKS + 1):
        sc = cand
        if picked:
            sc = sc.filter(~F.col("vec_id").isin([p[1] for p in picked]))
        if ms is not None:
            sc = sc.join(ms, "vec_id", "left").withColumn(
                "msv", F.coalesce(F.col("msv"), F.lit(0.0))
            )
        else:
            sc = sc.withColumn("msv", F.lit(0.0))
        sc = sc.withColumn(
            "mmr", MMR_REL_W * F.col("sq") - MMR_DIV_W * F.col("msv")
        )
        top = bounded_collect(
            sc.select("vec_id", "sq", "mmr")
            .orderBy(F.col("mmr").desc(), "vec_id")
            .limit(1),
            1,
            "q236_mmr_pick",
        )
        if not top:
            break
        vid, sq, mmr = int(top[0]["vec_id"]), top[0]["sq"], top[0]["mmr"]
        picked.append((r, vid, float(sq), float(mmr)))
        pvec = [
            float(v)
            for v in bounded_collect(
                cand.filter(F.col("vec_id") == vid).select("embedding"),
                1,
                "q236_mmr_picked_vector",
            )[0][0]
        ]
        pcol = F.array(*[F.lit(v) for v in pvec])
        newcos = F.round(_cosine(F.col("embedding"), pcol), 6)
        base = (
            cand.join(ms, "vec_id", "left").withColumn(
                "prev", F.coalesce(F.col("msv"), F.lit(0.0))
            )
            if ms is not None
            else cand.withColumn("prev", F.lit(0.0))
        )
        ms = local_checkpoint(
            base.select(
                "vec_id", F.greatest(F.col("prev"), newcos).alias("msv")
            ),
            f"q236 mmr max-sim after pick {r}",
        )
    return spark.createDataFrame(
        picked, "pick_rank long, vec_id long, rel_cos double, mmr_score double"
    ).select(
        "pick_rank",
        "vec_id",
        (F.col("rel_cos") + F.lit(0.0)).alias("rel_cos"),
        (F.round(F.col("mmr_score"), 4) + F.lit(0.0)).alias("mmr_score"),
    )


# ---------------------------------------------------------------------------
# q252 — near-dup Jaccard-threshold sensitivity sweep
# ---------------------------------------------------------------------------

DEDUP_SWEEP_T = (0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)


def _q252_oracle() -> str:
    rows = []
    for t in DEDUP_SWEEP_T:
        rows.append(f"""
    SELECT {t} + 0.0 AS threshold,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pj WHERE j6 >= {t})
             AS n_pairs,
           (SELECT CAST(COUNT(DISTINCT d) AS BIGINT) FROM
             (SELECT doc_a AS d FROM pj WHERE j6 >= {t}
              UNION ALL SELECT doc_b FROM pj WHERE j6 >= {t}) z)
             AS n_docs_affected""")
    return f"""
    WITH docs AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
    sizes AS (SELECT doc_id, len(sh) AS n FROM docs),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pj AS MATERIALIZED (
      SELECT doc_a, doc_b,
             ROUND(i * 1.0 / (sa.n + sb.n - i), 6) AS j6
      FROM inter
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id)
    {' UNION ALL '.join(rows)}
    """


@query("q252_dedup_threshold_sweep", oracle=_q252_oracle())
def q252_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard-threshold sensitivity of near-dup detection: candidate
    pairs and affected documents at every threshold in
    {DEDUP_SWEEP_T}, from ONE exact pair computation (q43's
    shared-shingle blocking) — the calibration curve that decides what
    q41's LSH banding should target before anyone deletes documents
    (too low = collateral damage, too high = residual duplication;
    q135 calibrates the SKETCH against exact Jaccard, this calibrates
    the THRESHOLD against corpus impact).

    Parity: intersections and sizes are integers; the 6-dp-rounded
    Jaccard makes every threshold comparison engine-agreed (the q63
    rounded-cut rule); counts are integers.

    Scale shape: one q43-style blocked pair build (checkpointed),
    then the WHOLE sweep is two single-pass aggregates (VERDICT r7
    ask #3): seven filtered pair counts in one agg over the pair
    table, and seven filtered doc counts in one agg over the per-doc
    max-Jaccard collapse (a doc is affected at threshold t iff its
    best pair reaches t, so COUNT DISTINCT per threshold folds into
    one groupBy(doc).max(j6) + filtered counts).  One bounded 1-row
    × 1-row attach + an explode emits the seven output rows — seven
    thresholds for the price of one dedup pass and two aggregates.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents")).select(
        "doc_id", _shingles(F.col("text")).alias("sh")
    )
    ex = docs.select("doc_id", F.explode("sh").alias("s"))
    sizes = docs.select("doc_id", F.size("sh").alias("n"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("i"))
    )
    pj = local_checkpoint(
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 6
            ).alias("j6"),
        ),
        "q252 exact pair jaccards",
    )
    pair_counts = pj.agg(
        *[
            F.count(F.when(F.col("j6") >= t, F.lit(1)))
            .cast("long")
            .alias(f"np{i}")
            for i, t in enumerate(DEDUP_SWEEP_T)
        ]
    )
    doc_best = (
        pj.select(F.col("doc_a").alias("d"), "j6")
        .unionAll(pj.select(F.col("doc_b").alias("d"), "j6"))
        .groupBy("d")
        .agg(F.max("j6").alias("mj"))
    )
    doc_counts = doc_best.agg(
        *[
            F.count(F.when(F.col("mj") >= t, F.lit(1)))
            .cast("long")
            .alias(f"nd{i}")
            for i, t in enumerate(DEDUP_SWEEP_T)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                (F.lit(t) + F.lit(0.0)).alias("threshold"),
                F.col(f"np{i}").alias("n_pairs"),
                F.col(f"nd{i}").alias("n_docs_affected"),
            )
            for i, t in enumerate(DEDUP_SWEEP_T)
        ]
    )
    return (
        pair_counts.crossJoin(F.broadcast(doc_counts))
        .select(F.explode(rows).alias("r"))
        .select("r.threshold", "r.n_pairs", "r.n_docs_affected")
    )


# ---------------------------------------------------------------------------
# q276 — LSH band-configuration sweep (recall/precision calibration)
# ---------------------------------------------------------------------------

#: (bands, rows) partitions of the MINHASH_H=12 signature swept in one
#: signature pass; b·r = 12 for every config.
LSH_SWEEP_CONFIGS = ((6, 2), (4, 3), (3, 4), (2, 6))


def _q276_oracle() -> str:
    sig_cols = ", ".join(
        f"list_min(list_transform(hp, p -> p.h1 + {i} * p.h2)) AS m{i}"
        for i in range(MINHASH_H)
    )
    band_selects = " UNION ALL ".join(
        "SELECT {cfg} AS cfg, doc_id, {b} AS band, {key} AS key FROM sig".format(
            cfg=ci,
            b=b,
            key=" || '|' || ".join(
                f"CAST(m{b * r + k} AS VARCHAR)" for k in range(r)
            ),
        )
        for ci, (nb, r) in enumerate(LSH_SWEEP_CONFIGS)
        for b in range(nb)
    )
    cfg_rows = " UNION ALL ".join(
        f"SELECT {ci} AS cfg, {nb} AS b, {r} AS r"
        for ci, (nb, r) in enumerate(LSH_SWEEP_CONFIGS)
    )
    return f"""
    WITH docs AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
    hp AS (SELECT doc_id, sh,
           list_transform(list_transform(sh, s -> md5(s)),
             h -> {{'h1': ('0x' || substr(h, 1, 15))::BIGINT,
                    'h2': ('0x' || substr(h, 17, 8))::BIGINT}}) AS hp
           FROM docs),
    sig AS (SELECT doc_id, {sig_cols} FROM hp),
    bands AS ({band_selects}),
    cand AS (SELECT DISTINCT x.cfg, x.doc_id AS a, y.doc_id AS bb
             FROM bands x JOIN bands y
               ON x.cfg = y.cfg AND x.band = y.band AND x.key = y.key
              AND x.doc_id < y.doc_id),
    dp AS (SELECT DISTINCT a, bb FROM cand),
    ver AS (SELECT dp.a, dp.bb,
                   CASE WHEN len(list_intersect(da.sh, db.sh)) * 1.0
                             / len(list_distinct(list_concat(da.sh, db.sh)))
                             >= {JACCARD_T} THEN 1 ELSE 0 END AS is_true
            FROM dp
            JOIN docs da ON da.doc_id = dp.a
            JOIN docs db ON db.doc_id = dp.bb),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
    tp AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS bb
           FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id),
    truth AS (
      SELECT COUNT(*) AS total FROM tp
      JOIN docs da ON da.doc_id = tp.a
      JOIN docs db ON db.doc_id = tp.bb
      WHERE len(list_intersect(da.sh, db.sh)) * 1.0
            / len(list_distinct(list_concat(da.sh, db.sh))) >= {JACCARD_T}),
    per AS (
      SELECT cand.cfg, COUNT(*) AS n_candidates,
             SUM(ver.is_true) AS n_true
      FROM cand JOIN ver ON ver.a = cand.a AND ver.bb = cand.bb
      GROUP BY 1)
    SELECT c.b AS bands, c.r AS rows_per_band,
           CAST(COALESCE(per.n_candidates, 0) AS BIGINT) AS n_candidates,
           CAST(COALESCE(per.n_true, 0) AS BIGINT) AS n_true_pairs,
           CAST(t.total AS BIGINT) AS truth_total,
           (ROUND(COALESCE(per.n_true, 0) * 1e0 / t.total, 6) + 0.0)
             AS recall,
           (ROUND(COALESCE(per.n_true, 0) * 1e0
                  / NULLIF(per.n_candidates, 0), 6) + 0.0) AS precision
    FROM ({cfg_rows}) c
    LEFT JOIN per ON per.cfg = c.cfg
    CROSS JOIN truth t
    """


@query("q276_lsh_band_sweep", oracle=_q276_oracle())
def q276_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding calibration sweep: candidate volume, verified true
    pairs, recall and precision for every (bands, rows) partition of
    the 12-hash MinHash signature — computed from ONE signature pass
    (the sweep-as-filtered-aggregates discipline of q251/q252; q135
    calibrates the Jaccard ESTIMATE, this calibrates the BLOCKING).
    The S-curve tradeoff (more bands → higher recall, more candidates)
    is measured, not assumed, before a threshold ships to q41.

    Parity: candidates and hits are integer counts; truth is the
    exact shared-shingle pair set at Jaccard ≥ {JACCARD_T} (complete —
    a pair at J ≥ 0.5 shares a shingle); two 6-dp divisions.

    Scale shape: signatures compute once; each config's band keys
    explode map-side; hot (cfg, band, key) buckets chunk-distribute
    (zero recall loss, observable); exact verification touches only
    distinct candidate pairs; the truth pass rides q43's chunked
    postings machinery.  The two persisted intermediates (docs, sigs)
    are released by the harness's per-query ``spark.catalog
    .clearCache()`` (bench.py per-rep, check_oracle.py per-query) —
    they cannot be unpersisted here because the returned plan is lazy
    (ADVICE r7 #4).
    """
    from pyspark.storagelevel import StorageLevel

    docs = (
        _fanout(spark, table(spark, sf_dir, "documents"))
        .select("doc_id", _shingles(F.col("text")).alias("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    hp = F.transform(
        F.transform(F.col("sh"), lambda s: F.md5(s)),
        lambda h: F.struct(
            F.conv(F.substring(h, 1, 15), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(h, 17, 8), 16, 10).cast("long").alias("h2"),
        ),
    )
    hashed = docs.select("doc_id", hp.alias("hp"))

    def minhash(i: int) -> Column:
        mult = F.lit(i).cast("long")
        return F.array_min(
            F.transform(F.col("hp"), lambda p: p["h1"] + mult * p["h2"])
        )

    sigs = hashed.select(
        "doc_id", *[minhash(i).alias(f"m{i}") for i in range(MINHASH_H)]
    ).persist(StorageLevel.MEMORY_AND_DISK)
    per_cfg_bands = []
    for ci, (nb, r) in enumerate(LSH_SWEEP_CONFIGS):
        keys = [
            F.concat_ws(
                "|", *[F.col(f"m{b * r + k}") for k in range(r)]
            )
            for b in range(nb)
        ]
        per_cfg_bands.append(
            sigs.select(
                F.lit(ci).alias("cfg"),
                "doc_id",
                F.posexplode(F.array(*keys)).alias("band", "key"),
            )
        )
    bands = per_cfg_bands[0]
    for extra in per_cfg_bands[1:]:
        bands = bands.unionAll(extra)
    bucketed = (
        bands.groupBy("cfg", "band", "key")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    cand = (
        blocking.chunk_buckets(bucketed, "q276_lsh_band_sweep", "ids")
        .select("cfg", F.explode(blocking.chunk_pair_structs()).alias("p"))
        .select("cfg", F.col("p.a").alias("a"), F.col("p.b").alias("bb"))
        .distinct()
    )
    dp = cand.select("a", "bb").distinct()
    sets = docs.select("doc_id", "sh")
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    ver = (
        dp.join(
            sets.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a")),
            "a",
        )
        .join(
            sets.select(F.col("doc_id").alias("bb"), F.col("sh").alias("sh_b")),
            "bb",
        )
        .select("a", "bb", (jac >= JACCARD_T).cast("long").alias("is_true"))
    )
    per = (
        cand.join(ver, ["a", "bb"])
        .groupBy("cfg")
        .agg(
            F.count("*").alias("n_candidates"),
            F.sum("is_true").alias("n_true"),
        )
    )
    # exact truth: q43's chunked shared-shingle postings + J >= T verify
    ex = docs.select("doc_id", F.explode("sh").alias("s"))
    postings = (
        ex.groupBy("s")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    tp = (
        blocking.chunk_buckets(postings, "q276_lsh_band_sweep_truth", "ids")
        .select(F.explode(blocking.chunk_pair_structs()).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("bb"))
        .distinct()
    )
    truth = (
        tp.join(
            sets.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a")),
            "a",
        )
        .join(
            sets.select(F.col("doc_id").alias("bb"), F.col("sh").alias("sh_b")),
            "bb",
        )
        .filter(jac >= JACCARD_T)
        .agg(F.count("*").alias("total"))
    )
    cfgs = spark.createDataFrame(
        [(ci, nb, r) for ci, (nb, r) in enumerate(LSH_SWEEP_CONFIGS)],
        "cfg int, b int, r int",
    )
    return (
        cfgs.join(per, "cfg", "left")
        .crossJoin(F.broadcast(truth))
        .select(
            F.col("b").alias("bands"),
            F.col("r").alias("rows_per_band"),
            F.coalesce(F.col("n_candidates"), F.lit(0))
            .cast("long")
            .alias("n_candidates"),
            F.coalesce(F.col("n_true"), F.lit(0))
            .cast("long")
            .alias("n_true_pairs"),
            F.col("total").cast("long").alias("truth_total"),
            dec(
                F.coalesce(F.col("n_true"), F.lit(0))
                * F.expr("1e0")
                / F.col("total"),
                6,
            ).alias("recall"),
            dec(
                F.coalesce(F.col("n_true"), F.lit(0))
                * F.expr("1e0")
                / F.nullif(F.col("n_candidates"), F.lit(0)),
                6,
            ).alias("precision"),
        )
    )


# ---------------------------------------------------------------------------
# q282 — incremental IVF index maintenance (delta refresh, IVM audit)
# ---------------------------------------------------------------------------

#: the simulated ingest delta: vectors with vec_id % MOD == REM arrive
#: AFTER the base index was built (deterministic at every SF)
IVF_DELTA_MOD, IVF_DELTA_REM = 8, 5
#: per-component integer quantization of the mergeable centroid
#: partials (the q200/q201 floor(x*scale+0.5) rule — integer sums are
#: order-independent, so merged == full bit-exactly when the plumbing
#: is right)
IVF_SUM_SCALE = 1_000_000


def _q282_oracle() -> str:
    return f"""
    WITH {_ANN_PARAMS_SQL},
    cent AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
                  WHERE vec_id < (SELECT n_cent FROM ann_p)),
    scored AS (
      SELECT e.vec_id, e.embedding, c.cid,
             {_COS_SQL.format(a='e.embedding', b='c.ce')} AS cs
      FROM embeddings e CROSS JOIN cent c),
    cells AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT vec_id, embedding, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
        FROM scored) t
      WHERE rn = 1),
    comp AS (
      SELECT cell, vec_id,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)
                        * {IVF_SUM_SCALE} + 0.5) AS BIGINT) AS qv
      FROM cells),
    chk AS (SELECT cell, SUM(qv) AS centroid_checksum FROM comp GROUP BY 1),
    cnt AS (
      SELECT cell,
             SUM(CASE WHEN vec_id % {IVF_DELTA_MOD} = {IVF_DELTA_REM}
                      THEN 0 ELSE 1 END) AS n_base,
             SUM(CASE WHEN vec_id % {IVF_DELTA_MOD} = {IVF_DELTA_REM}
                      THEN 1 ELSE 0 END) AS n_delta
      FROM cells GROUP BY 1)
    SELECT CAST(cnt.cell AS BIGINT) AS cell,
           CAST(n_base AS BIGINT) AS n_base,
           CAST(n_delta AS BIGINT) AS n_delta,
           CAST(n_base + n_delta AS BIGINT) AS n_total,
           CAST(centroid_checksum AS BIGINT) AS centroid_checksum,
           CAST(1 AS BIGINT) AS matches_full
    FROM cnt JOIN chk ON chk.cell = cnt.cell
    """


@query("q282_ivf_delta_refresh", oracle=_q282_oracle())
def q282_ivf_delta_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance (VERDICT r7 ask #8 — the
    q161/q237 IVM discipline applied to q47's index): a delta ingest
    batch (vec_id % {IVF_DELTA_MOD} == {IVF_DELTA_REM}) is assigned
    against the SAME broadcast coarse quantizer as the base build —
    never a re-scan of the base corpus — and the per-cell centroid
    state refreshes by MERGING integer partials: (count, Σ quantized
    component) per (cell, component) from the base index plus the
    delta batch's partials.  A 100 TB corpus cannot re-index per
    ingest; this is the path that keeps q47's cells current between
    full rebuilds.

    The audit IS the result: an independent full recompute over all
    vectors joins the merged state per (cell, component), and
    ``matches_full`` certifies bit-equality (integer sums are
    order-independent, so any 0 means the merge plumbing lost or
    double-counted a vector — the q237 equality-column contract).
    Output is one row per cell: counts, the merged centroid-sum
    checksum, and the audit flag.

    Parity: assignment is q47's argmax (cosine, lowest-cid tie);
    components quantize with floor(x·{IVF_SUM_SCALE}+0.5) (the
    q200/q201 rule); everything else is integer counts/sums.

    Scale shape: ONE map-only assignment pass streaming into ONE
    fused conditional aggregation (base/delta/full partials are
    conditional sums of the same frame — r13, guide §2.4); partial
    aggregates are map-side combinable (cell, component) integer cells
    bounded by n_cent·dim; no window over unbounded rows, no corpus
    shuffle beyond the single partial agg.
    """
    n_cent, _, _ = ann_params(corpus_size(spark, sf_dir))
    is_delta = (F.col("vec_id") % IVF_DELTA_MOD) == IVF_DELTA_REM
    qcells = ivf_cell_assignment(spark, sf_dir, n_cent).select(
        "vec_id",
        "cell",
        is_delta.alias("d"),
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(
                x.cast("double") * IVF_SUM_SCALE + F.lit(0.5)
            ).cast("long"),
        ).alias("qe"),
    )
    comp = qcells.select(
        "cell", "d", F.posexplode("qe").alias("pos", "qv")
    )

    # Optimization r13 (guide §2.4/§1.2 — VERDICT r12 ask #6): the
    # base/delta/full partials are CONDITIONAL aggregates of one frame,
    # so they fuse into ONE map-side-combinable groupBy instead of
    # three filtered re-aggregations + two full-outer merges (plan: 4
    # Exchanges -> 1, and the persisted assignment pass is consumed
    # once, so its cache is gone too).  The audit stays three
    # INDEPENDENT EXPRESSION paths — merged = base-slice + delta-slice
    # vs full = unconditional sum/count — fused per-expression, not
    # per-job; any lost or double-counted row still fails ``ok``.
    z = F.lit(0)
    agg = comp.groupBy("cell", "pos").agg(
        F.sum(F.when(~F.col("d"), F.col("qv"))).alias("s_b"),
        F.count(F.when(~F.col("d"), F.lit(1))).alias("n_b"),
        F.sum(F.when(F.col("d"), F.col("qv"))).alias("s_del"),
        F.count(F.when(F.col("d"), F.lit(1))).alias("n_del"),
        F.sum("qv").alias("s_f"),
        F.count("*").alias("n_f"),
    )
    s_m = F.coalesce(F.col("s_b"), z) + F.coalesce(F.col("s_del"), z)
    audit = agg.select(
        "cell",
        "pos",
        s_m.alias("s_m"),
        F.col("n_b").alias("nb"),
        F.col("n_del").alias("nd"),
        (
            (s_m == F.coalesce(F.col("s_f"), F.lit(-1)))
            & (F.col("n_b") + F.col("n_del") == F.col("n_f"))
        ).cast("long").alias("ok"),
    )
    return audit.groupBy(F.col("cell").cast("long").alias("cell")).agg(
        (F.max("nb")).cast("long").alias("n_base"),
        (F.max("nd")).cast("long").alias("n_delta"),
        (F.max("nb") + F.max("nd")).cast("long").alias("n_total"),
        F.sum("s_m").cast("long").alias("centroid_checksum"),
        F.min("ok").cast("long").alias("matches_full"),
    )


# ---------------------------------------------------------------------------
# q284 — incremental MinHash-LSH index maintenance (delta refresh audit)
# ---------------------------------------------------------------------------

#: the simulated ingest delta for the text index (q282's convention on
#: the document corpus): doc_id % MOD == REM arrives after the base
#: index was built
DOC_DELTA_MOD, DOC_DELTA_REM = 8, 5


def _q284_oracle() -> str:
    # UNCAPPED pair derivation (the Spark side routes every bucket
    # through lossless chunking, so no QUALIFY cap here — contrast
    # _lsh_verified_ctes, whose BUCKET_CAP mirrors q41's _cap_buckets)
    sig_cols = ", ".join(
        f"list_min(list_transform(hp, p -> p.h1 + {i} * p.h2)) AS m{i}"
        for i in range(MINHASH_H)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS key FROM sig".format(
            b=b,
            key=" || '|' || ".join(
                f"CAST(m{b * LSH_R + r} AS VARCHAR)" for r in range(LSH_R)
            ),
        )
        for b in range(LSH_B)
    )
    return f"""
    WITH docs AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
    hp AS (SELECT doc_id, sh,
           list_transform(list_transform(sh, s -> md5(s)),
             h -> {{'h1': ('0x' || substr(h, 1, 15))::BIGINT,
                    'h2': ('0x' || substr(h, 17, 8))::BIGINT}}) AS hp
           FROM docs),
    sig AS (SELECT doc_id, {sig_cols} FROM hp),
    bands AS ({band_selects}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    ver AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c
      JOIN docs da ON da.doc_id = c.doc_a
      JOIN docs db ON db.doc_id = c.doc_b
      WHERE len(list_intersect(da.sh, db.sh)) * 1.0
              / len(list_distinct(list_concat(da.sh, db.sh))) >= {JACCARD_T}),
    f AS (
      SELECT doc_a, doc_b,
             CASE WHEN doc_a % {DOC_DELTA_MOD} = {DOC_DELTA_REM}
                    OR doc_b % {DOC_DELTA_MOD} = {DOC_DELTA_REM}
                  THEN 1 ELSE 0 END AS dlt
      FROM ver)
    SELECT CAST(COALESCE(SUM(1 - dlt), 0) AS BIGINT) AS n_base_pairs,
           CAST(COALESCE(SUM(dlt), 0) AS BIGINT) AS n_delta_pairs,
           CAST(COUNT(*) AS BIGINT) AS n_incremental,
           CAST(COUNT(*) AS BIGINT) AS n_full,
           CAST(1 AS BIGINT) AS matches_full
    FROM f
    """


@query("q284_lsh_delta_refresh", oracle=_q284_oracle())
def q284_lsh_delta_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash-LSH index maintenance — q282's IVM contract
    on the TEXT dedup index: the delta ingest batch (doc_id %
    {DOC_DELTA_MOD} == {DOC_DELTA_REM}) computes signatures for ITS
    documents only and probes the band-bucket space, and the refreshed
    near-dup pair set is the stored base-index pairs UNION the
    delta-involving pairs — never a re-pairing of the base corpus
    against itself.  A 100 TB text corpus re-shingles only what
    arrived; this is the path between q41 full rebuilds.

    The audit IS the result: base pairs derive from BASE-ONLY buckets
    and delta pairs from the full buckets (≥ 1 delta member), so their
    union equals a from-scratch rebuild ONLY if the bucketing is
    lossless — every bucket routes through ``blocking.chunk_buckets``
    (zero recall loss, unlike q41's observable truncation cap), and
    ``matches_full`` certifies the set equality pair-by-pair against
    an independent full rebuild.  Output is one summary row.

    Parity: set semantics + integer counts; verification keeps
    Jaccard ≥ {JACCARD_T} (the q63 rounded-cut rule is unnecessary —
    the comparison is the same double in both engines).

    Scale shape: ONE shingle pass (persisted — bands, both bucket
    builds, and verification read it; harness clearCache releases it);
    bucket collapses combine map-side; oversized buckets
    chunk-distribute; verification touches each distinct candidate
    pair once; the audit is one agg over the bounded verified-pair
    table with membership flags.
    """
    from pyspark.storagelevel import StorageLevel

    docs = (
        _fanout(spark, table(spark, sf_dir, "documents"))
        .select("doc_id", _shingles(F.col("text")).alias("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # both bucket builds (base-only, full) consume the band rows —
    # persist so the signature transform runs once per job
    bands = (
        _minhash_bands(docs.select("doc_id", "sh"))
        .withColumn(
            "dlt", (F.col("doc_id") % DOC_DELTA_MOD) == DOC_DELTA_REM
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def bucket_pairs(band_rows: DataFrame, name: str) -> DataFrame:
        bucketed = (
            band_rows.groupBy("band", "key")
            .agg(F.collect_list("doc_id").alias("ids"))
            .filter(F.size("ids") >= 2)
        )
        return (
            blocking.chunk_buckets(bucketed, name, "ids")
            .select(F.explode(blocking.chunk_pair_structs()).alias("p"))
            .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .distinct()
        )

    # base_pairs feeds the candidate union and the in_b membership
    # join; full_pairs additionally feeds the delta filter — persist
    # both so the bucket collapse + chunk explode + distinct shuffle
    # runs once per side, not once per reference (ADVICE r8 #3; the
    # harness clearCache releases them like the other intermediates)
    base_pairs = bucket_pairs(
        bands.filter(~F.col("dlt")), "q284_lsh_delta_refresh_base"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    full_pairs = bucket_pairs(
        bands, "q284_lsh_delta_refresh_full"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    is_d = lambda c: (F.col(c) % DOC_DELTA_MOD) == DOC_DELTA_REM  # noqa: E731
    delta_pairs = full_pairs.filter(is_d("a") | is_d("b"))
    # verify each distinct candidate once, then flag set membership
    cand = full_pairs.unionAll(base_pairs).distinct()
    sets = docs.select("doc_id", "sh")
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    ver = (
        cand.join(
            sets.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a")),
            "a",
        )
        .join(
            sets.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b")),
            "b",
        )
        .filter(jac >= JACCARD_T)
        .select("a", "b")
    )
    flags = (
        ver.join(base_pairs.withColumn("in_b", F.lit(1)), ["a", "b"], "left")
        .join(delta_pairs.withColumn("in_d", F.lit(1)), ["a", "b"], "left")
        .join(full_pairs.withColumn("in_f", F.lit(1)), ["a", "b"], "left")
        .select(
            F.coalesce(F.col("in_b"), F.lit(0)).alias("in_b"),
            F.coalesce(F.col("in_d"), F.lit(0)).alias("in_d"),
            F.coalesce(F.col("in_f"), F.lit(0)).alias("in_f"),
        )
    )
    inc = F.greatest(F.col("in_b"), F.col("in_d"))
    # COALESCE the empty-corpus aggregates (sum/min over zero verified
    # pairs are NULL, while a pair-free refresh is trivially consistent
    # — mirrored in the oracle)
    return flags.agg(
        F.coalesce(F.sum("in_b"), F.lit(0)).cast("long").alias("n_base_pairs"),
        F.coalesce(F.sum("in_d"), F.lit(0)).cast("long").alias("n_delta_pairs"),
        F.coalesce(F.sum(inc), F.lit(0)).cast("long").alias("n_incremental"),
        F.coalesce(F.sum("in_f"), F.lit(0)).cast("long").alias("n_full"),
        F.coalesce(F.min((inc == F.col("in_f")).cast("long")), F.lit(1))
        .cast("long")
        .alias("matches_full"),
    )


# ---------------------------------------------------------------------------
# q285 — dedup cluster representative selection (keep-best, drop rest)
# ---------------------------------------------------------------------------


def _q285_oracle() -> str:
    return f"""
    WITH c AS ({ORACLES['q69_dedup_clusters']}),
    f AS ({ORACLES['q50_text_quality']}),
    j AS (
      SELECT c.cluster_id, c.cluster_size, c.doc_id, f.quality,
             ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                ORDER BY f.quality DESC, c.doc_id) AS rn
      FROM c JOIN f ON f.doc_id = c.doc_id)
    SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
           CAST(doc_id AS BIGINT) AS kept_doc_id,
           (quality + 0.0) AS kept_quality,
           CAST(cluster_size AS BIGINT) AS n_members,
           CAST(cluster_size - 1 AS BIGINT) AS n_dropped
    FROM j WHERE rn = 1
    """


@query("q285_cluster_representatives", oracle=_q285_oracle())
def q285_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step between near-dup detection and deletion: per q69
    cluster, KEEP the member with the best q50 quality score (ties to
    the lowest doc_id) and count what gets dropped — production dedup
    never deletes blindly, it keeps the best representative of each
    duplicate group (the Gopher/RefinedWeb convention).

    Parity: ranks on the 4-dp-rounded quality (engine-agreed
    boundary, the q63 rule) with an id tiebreak.

    Scale shape: composes q69's capped CC clusters with q50's
    map-side per-doc metrics on the doc key; the keep-pick is a
    map-side-combinable struct-max AGGREGATE per cluster (never a
    window over cluster members — a boilerplate mega-cluster would
    make that partition the straggler); output is |clusters| rows.
    """
    c = q69_dedup_clusters(spark, sf_dir)
    f = q50_text_quality(spark, sf_dir).select("doc_id", "quality")
    j = c.join(f, "doc_id")
    best = F.max(
        F.struct(
            F.col("quality").alias("q"), (-F.col("doc_id")).alias("nid")
        )
    )
    return (
        j.groupBy(F.col("cluster_id").cast("long").alias("cluster_id"))
        .agg(best.alias("b"), F.max("cluster_size").alias("sz"))
        .select(
            "cluster_id",
            (-F.col("b.nid")).cast("long").alias("kept_doc_id"),
            (F.col("b.q") + F.lit(0.0)).alias("kept_quality"),
            F.col("sz").cast("long").alias("n_members"),
            (F.col("sz") - 1).cast("long").alias("n_dropped"),
        )
    )


# ---------------------------------------------------------------------------
# q287 — BM25 top-k retrieval (lexical ranking over the corpus)
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QT = 5  # query = the QT highest-document-frequency terms
BM25_TOP = 20


def _q287_oracle() -> str:
    idf = "ln(1e0 + (st.n - qt.df + 0.5e0) / (qt.df + 0.5e0))"
    tfc = (
        f"(tf.tf * ({BM25_K1}e0 + 1e0)) / "
        f"(tf.tf + {BM25_K1}e0 * (1e0 - {BM25_B}e0 + {BM25_B}e0 * tf.dl / st.avgdl))"
    )
    return f"""
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
               FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf,
                  SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS dl
           FROM t GROUP BY 1, 2),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    st AS (SELECT COUNT(*) AS n,
                  SUM(len(string_split(text, ' '))) * 1e0 / COUNT(*) AS avgdl
           FROM documents),
    qt AS (SELECT term, df FROM df ORDER BY df DESC, term LIMIT {BM25_QT}),
    s AS (
      SELECT tf.doc_id,
             CAST(FLOOR((ROUND({idf} * {tfc}, 6) + 0.0) * 1000000e0 + 0.5e0)
                  AS BIGINT) AS m
      FROM tf JOIN qt ON tf.term = qt.term CROSS JOIN st),
    sc AS (SELECT doc_id, SUM(m) AS score_micro FROM s GROUP BY 1)
    SELECT doc_id, CAST(score_micro AS BIGINT) AS score_micro,
           CAST(ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id)
                AS BIGINT) AS rank
    FROM sc ORDER BY score_micro DESC, doc_id LIMIT {BM25_TOP}
    """


@query("q287_bm25_topk", oracle=_q287_oracle())
def q287_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{BM25_TOP} retrieval: the Okapi ranking function over
    the corpus for a deterministic query (the {BM25_QT} highest-DF
    terms — a real deployment swaps in user queries; the plan is
    identical).  The lexical retrieval baseline every hybrid
    (BM25 + ANN rerank) training-data search stack starts from — q86
    builds the inverted index, this is the scorer on top of it.

    Parity: per-(doc, term) scores round to 6 dp (the q63 ln rule —
    ulp differences in the engines' ln cannot move a 6-dp boundary)
    then quantize to integer micro-units via floor(x·1e6 + 0.5) on the
    ROUNDED value (exact: the true product is an integer ± ulp), so
    the per-doc SUM is an order-independent integer and the top-k cut
    ties break on doc_id.

    Scale shape: one explode → (doc, term) hash aggregate (map-side
    combined); dl via the window SUM over the same partitioning (q63);
    the query-term table is a LIMIT-{BM25_QT} TakeOrderedAndProject
    broadcast back onto tf; corpus stats attach as a broadcast 1-row
    aggregate; the global top-{BM25_TOP} is TakeOrderedAndProject
    (per-partition heaps, never a global sort), with rank assigned
    over the {BM25_TOP} collected rows only.
    """
    docs = table(spark, sf_dir, "documents")
    ws = F.size(F.split(F.col("text"), " "))
    st = docs.agg(
        F.count("*").alias("n"),
        (F.sum(ws) * F.lit(1.0) / F.count("*")).alias("avgdl"),
    )
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("dl", F.sum("tf").over(W.partitionBy("doc_id")))
    )
    qt = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), "term")
        .limit(BM25_QT)
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tfc = (F.col("tf") * F.lit(BM25_K1 + 1.0)) / (
        F.col("tf")
        + F.lit(BM25_K1)
        * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl"))
    )
    sc = (
        tf.join(F.broadcast(qt), "term")
        .crossJoin(F.broadcast(st))
        .select(
            "doc_id",
            F.floor(dec(idf * tfc, 6) * F.lit(1_000_000.0) + F.lit(0.5))
            .cast("long")
            .alias("m"),
        )
        .groupBy("doc_id")
        .agg(F.sum("m").alias("score_micro"))
    )
    top = sc.orderBy(F.col("score_micro").desc(), "doc_id").limit(BM25_TOP)
    w = W.orderBy(F.col("score_micro").desc(), "doc_id")
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "doc_id", F.col("score_micro").cast("long"), "rank"
    )


# ---------------------------------------------------------------------------
# q288 — epoch shuffle shard balance (training-run data-order audit)
# ---------------------------------------------------------------------------

SHUF_EPOCHS = 2
SHUF_SHARDS = 8


def _shuf_shard_sql(epoch_expr: str) -> str:
    return (
        "('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '|' || "
        f"CAST({epoch_expr} AS VARCHAR)), 1, 15))::BIGINT % {SHUF_SHARDS}"
    )


def _q288_oracle() -> str:
    return f"""
    WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS tok
               FROM documents),
    tot AS (SELECT SUM(tok) AS t FROM d),
    e AS (SELECT unnest(generate_series(0, {SHUF_EPOCHS - 1})) AS epoch),
    a AS (
      SELECT e.epoch, d.tok,
             {_shuf_shard_sql('e.epoch')} AS shard,
             CASE WHEN e.epoch > 0
                    AND {_shuf_shard_sql('e.epoch')}
                        <> {_shuf_shard_sql('e.epoch - 1')}
                  THEN 1 ELSE 0 END AS moved
      FROM d CROSS JOIN e)
    SELECT CAST(epoch AS BIGINT) AS epoch,
           CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS tokens,
           CAST(SUM(tok) * 1000000 // tot.t AS BIGINT) AS share_ppm,
           CAST(SUM(moved) AS BIGINT) AS n_moved
    FROM a CROSS JOIN tot
    GROUP BY epoch, shard, tot.t
    """


@query("q288_epoch_shuffle_balance", oracle=_q288_oracle())
def q288_epoch_shuffle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch deterministic-shuffle shard audit: every training
    epoch reshuffles the corpus by hashing (doc_id, epoch) — the
    md5-coin discipline, so the "random" order is reproducible across
    reruns and engines — and this audit reports, per (epoch, shard),
    the document count, token count, token share (ppm of the corpus),
    and how many documents MOVED shard versus the previous epoch.  The
    imbalance a data loader actually feels (a shard 2x the others
    straggles every step) and the reshuffle churn (≈ 1 - 1/SHARDS of
    docs should move; ~0 means the shuffle key is broken) become
    numbers a training-infra dashboard can alert on.

    Parity: shard = md5(doc_id|epoch) as a 60-bit integer mod
    {SHUF_SHARDS}; shares are integer-ppm floor divisions of exact
    token sums; the previous-epoch shard recomputes the same md5 (no
    self-join).

    Scale shape: map-only per (doc, epoch) — the epoch grid is a
    {SHUF_EPOCHS}-row broadcast explode — then ONE hash aggregate on
    the bounded (epoch, shard) grid; the corpus token total attaches
    as a broadcast 1-row aggregate.
    """
    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("tok")
    )
    tot = d.agg(F.sum("tok").alias("t"))
    epochs = spark.range(SHUF_EPOCHS).select(F.col("id").alias("epoch"))

    def shard(epoch: Column) -> Column:
        h = F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit("|"),
                epoch.cast("string"),
            )
        )
        return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % SHUF_SHARDS

    a = d.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "tok",
        shard(F.col("epoch")).alias("shard"),
        F.when(
            (F.col("epoch") > 0)
            & (shard(F.col("epoch")) != shard(F.col("epoch") - 1)),
            1,
        )
        .otherwise(0)
        .alias("moved"),
    )
    return (
        a.groupBy("epoch", "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok").alias("tokens"),
            F.sum("moved").alias("n_moved"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("epoch").cast("long"),
            F.col("shard").cast("long"),
            F.col("n_docs").cast("long"),
            F.col("tokens").cast("long"),
            # DECIMAL(38,0) multiply (the q294 overflow rule): per-shard
            # token sums reach ~3e12 at a 25T-token corpus, so the
            # BIGINT product tokens*1e6 silently wraps int64 while the
            # oracle's HUGEINT SUM stays exact; decimal div is exact
            # and the quotient (<= 1e6) always fits BIGINT.
            F.expr(
                "CAST(CAST(tokens AS DECIMAL(38,0)) * 1000000 div t AS BIGINT)"
            ).alias("share_ppm"),
            F.col("n_moved").cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# q289 — winnowing fingerprints (MOSS local document fingerprinting)
# ---------------------------------------------------------------------------

WINNOW_K = 4  # tokens per k-gram
WINNOW_W = 4  # hashes per winnowing window
WINNOW_MIN_SHARED = 2  # report pairs sharing at least this many prints


def _q289_oracle() -> str:
    kg = (
        "list_transform(generate_series(1, len(ws) - {km1}), "
        "i -> ('0x' || substr(md5(array_to_string(ws[i:i+{km1}], ' ')), "
        "1, 15))::BIGINT)"
    ).format(km1=WINNOW_K - 1)
    return f"""
    WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws
               FROM documents),
    h AS (SELECT doc_id,
                 CASE WHEN len(ws) >= {WINNOW_K} THEN {kg}
                      ELSE [('0x' || substr(md5(text), 1, 15))::BIGINT]
                 END AS hs
          FROM w),
    f AS (SELECT doc_id,
                 list_distinct(
                   CASE WHEN len(hs) >= {WINNOW_W} THEN
                     list_transform(generate_series(1, len(hs) - {WINNOW_W - 1}),
                                    j -> list_min(hs[j:j+{WINNOW_W - 1}]))
                   ELSE [list_min(hs)] END) AS fps
          FROM h),
    p AS (SELECT DISTINCT doc_id, unnest(fps) AS fp FROM f)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM p a JOIN p b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= {WINNOW_MIN_SHARED}
    """


@query("q289_winnowing_fingerprints", oracle=_q289_oracle())
def q289_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint near-dup candidates: per document,
    hash every POSITIONAL {WINNOW_K}-gram (no dedup — position
    matters), slide a {WINNOW_W}-hash window and keep each window's
    MINIMUM; the distinct window-minima are the document's
    fingerprints.  Unlike q53's bottom-k MinHash (a global sample that
    can miss any given region), winnowing GUARANTEES every
    {WINNOW_K + WINNOW_W - 1}-token stretch contributes a fingerprint
    — the locality property that makes it the standard for code /
    plagiarism / contamination scanning.  Pairs sharing >=
    {WINNOW_MIN_SHARED} fingerprints are the audit output.

    Parity: hashes are 60-bit md5 slices (the q41 fragment); window
    minima and shared-print counts are integers; short docs fall back
    to the whole-text hash (q53's degenerate rule) and doc pairs order
    a < b.

    Scale shape: fingerprinting is map-only array work per document
    (sequence + slice + array_min — no UDF); the candidate join is
    shared-fingerprint blocking with hot posting lists
    CHUNK-DISTRIBUTED via ``blocking.chunk_buckets`` (the q43
    machinery — zero recall loss, observable fan-out counters); the
    shared-print count is one hash aggregate over emitted pairs.
    """
    words = F.split(F.col("text"), " ")
    n = F.size(words) - (WINNOW_K - 1)

    def h60(c: Column) -> Column:
        return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")

    hs = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: h60(F.concat_ws(" ", F.slice(words, i, WINNOW_K))),
        ),
    ).otherwise(F.array(h60(F.col("text"))))
    docs = _fanout(spark, table(spark, sf_dir, "documents")).select(
        "doc_id", hs.alias("hs")
    )
    m = F.size(F.col("hs")) - (WINNOW_W - 1)
    fps = F.array_distinct(
        F.when(
            m >= 1,
            F.transform(
                F.sequence(F.lit(1), m),
                lambda j: F.array_min(F.slice(F.col("hs"), j, WINNOW_W)),
            ),
        ).otherwise(F.array(F.array_min(F.col("hs"))))
    )
    p = docs.select("doc_id", F.explode(fps).alias("fp")).distinct()
    postings = (
        p.groupBy("fp")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    return (
        blocking.chunk_buckets(postings, "q289_winnowing_fingerprints", "ids")
        .select(F.explode(blocking.chunk_pair_structs()).alias("p"))
        .groupBy(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
    )


# ---------------------------------------------------------------------------
# q290 — maximal duplicate runs (exact-substring dedup beyond fixed K)
# ---------------------------------------------------------------------------

RUN_K = 10  # tokens per positional k-gram
#: occurrence cap per k-gram hash, mirrored in BOTH engines (a
#: boilerplate k-gram above it is excluded from run detection
#: everywhere — the q41 BUCKET_CAP discipline, semantic and
#: hash-checkable, not a silent Spark-side truncation)
RUN_POSTING_CAP = 64


def _q290_oracle() -> str:
    return f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    s AS (SELECT doc_id, i AS pos,
                 md5(array_to_string(ws[i:i+{RUN_K - 1}], ' ')) AS h
          FROM w, unnest(generate_series(1, greatest(len(ws) - {RUN_K - 1}, 0)))
               t(i)),
    keep AS (SELECT h FROM s GROUP BY h
             HAVING COUNT(DISTINCT doc_id) >= 2
                AND COUNT(*) <= {RUN_POSTING_CAP}),
    ss AS (SELECT s.* FROM s JOIN keep USING (h)),
    pr AS (SELECT a.doc_id AS a, b.doc_id AS b, a.pos AS pa, b.pos AS pb
           FROM ss a JOIN ss b ON a.h = b.h AND a.doc_id < b.doc_id),
    isl AS (SELECT a, b, pa - pb AS diag,
                   pa - ROW_NUMBER() OVER (PARTITION BY a, b, pa - pb
                                           ORDER BY pa) AS rid
            FROM pr),
    runs AS (SELECT a, b, COUNT(*) AS ln
             FROM isl GROUP BY a, b, diag, rid)
    SELECT CAST(a AS BIGINT) AS doc_a, CAST(b AS BIGINT) AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_runs,
           CAST(MAX(ln) + {RUN_K - 1} AS BIGINT) AS max_run_tokens,
           CAST(SUM(ln) + COUNT(*) * {RUN_K - 1} AS BIGINT) AS dup_tokens
    FROM runs GROUP BY a, b
    """


@query("q290_duplicate_run_lengths", oracle=_q290_oracle())
def q290_duplicate_run_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated substring RUNS between document pairs — the
    step past q93's fixed-{SPAN_K}-token span census toward Lee et
    al.'s exact-substring dedup: consecutive shared positional
    {RUN_K}-grams merge into maximal runs (the gaps-and-islands trick
    on the pair diagonal pa − pb), so a copied 300-token passage
    reports as ONE run of ~300 tokens instead of ~280 anonymous span
    hits, and per-pair ``dup_tokens`` measures how much text the pair
    actually shares — the number a dedup policy thresholds on.

    Parity: spans hash via md5 (text never shuffles); the occurrence
    cap {RUN_POSTING_CAP} is applied identically in both engines
    (semantic exclusion of boilerplate k-grams, the q41 cap rule);
    runs/lengths are integer counts; island ids are engine-agreed
    because pa is unique within (pair, diagonal).

    Scale shape: one positional-k-gram explode (map-only, hashes
    immediately); the keep-filter bounds every posting list to
    {RUN_POSTING_CAP} occurrences, so pair-position fan-out per hash
    is ≤ cap²; the island window partitions on (pair, diagonal) —
    bounded by the shared-span count of one pair, never corpus-wide;
    two hash aggregates close it out.
    """
    words = F.split(F.col("text"), " ")
    n = F.size(words) - (RUN_K - 1)
    # Guard n < 1 explicitly (the q289 rule): Spark's sequence(1, 0)
    # is the DESCENDING array [1, 0], whose transform would call
    # slice(words, 0, K) and crash on any document shorter than
    # RUN_K tokens — whereas DuckDB's generate_series(1, 0) is empty.
    grams = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.md5(F.concat_ws(" ", F.slice(words, i, RUN_K))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    s = (
        _fanout(spark, table(spark, sf_dir, "documents"))
        .select("doc_id", F.posexplode(grams).alias("p0", "h"))
        .select("doc_id", (F.col("p0") + 1).alias("pos"), "h")
    )
    keep = (
        s.groupBy("h")
        .agg(
            F.countDistinct("doc_id").alias("nd"), F.count("*").alias("occ")
        )
        .filter((F.col("nd") >= 2) & (F.col("occ") <= RUN_POSTING_CAP))
        .select("h")
    )
    ss = s.join(keep, "h")
    pr = (
        ss.select(F.col("doc_id").alias("a"), F.col("pos").alias("pa"), "h")
        .join(
            ss.select(F.col("doc_id").alias("b"), F.col("pos").alias("pb"), "h"),
            "h",
        )
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "pa", "pb")
    )
    iw = W.partitionBy("a", "b", F.col("pa") - F.col("pb")).orderBy("pa")
    isl = pr.select(
        "a",
        "b",
        (F.col("pa") - F.col("pb")).alias("diag"),
        (F.col("pa") - F.row_number().over(iw)).alias("rid"),
    )
    runs = isl.groupBy("a", "b", "diag", "rid").agg(F.count("*").alias("ln"))
    return runs.groupBy(
        F.col("a").cast("long").alias("doc_a"),
        F.col("b").cast("long").alias("doc_b"),
    ).agg(
        F.count("*").cast("long").alias("n_runs"),
        (F.max("ln") + (RUN_K - 1)).cast("long").alias("max_run_tokens"),
        (F.sum("ln") + F.count("*") * (RUN_K - 1))
        .cast("long")
        .alias("dup_tokens"),
    )


# ---------------------------------------------------------------------------
# q291 — tokenizer fertility audit (subtokens per word, per language)
# ---------------------------------------------------------------------------


@query(
    "q291_tokenizer_fertility",
    oracle="""
    WITH d AS (
      SELECT lang,
             len(string_split(text, ' ')) AS words,
             len(regexp_extract_all(text, '[a-z0-9]+')) AS subtoks,
             n_chars AS chars
      FROM documents)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(words) AS BIGINT) AS words,
           CAST(SUM(subtoks) AS BIGINT) AS subtokens,
           CAST(SUM(chars) AS BIGINT) AS chars,
           (ROUND(SUM(subtoks) * 1e0 / SUM(words), 6) + 0.0) AS fertility,
           (ROUND(SUM(chars) * 1e0 / SUM(subtoks), 6) + 0.0)
             AS chars_per_subtoken,
           CAST(SUM(CASE WHEN subtoks * 2 > words * 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_high_fertility_docs
    FROM d GROUP BY lang
    """,
)
def q291_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: subtokens-per-word and
    chars-per-subtoken — the numbers a multilingual pretraining team
    watches because a tokenizer with fertility 2x on some language
    doubles that language's effective sequence length (and cost) at
    the same text budget.  Whitespace words vs the BPE-ish [a-z0-9]+
    runs (q52's two token counts, here turned into the RATIOS that
    drive mix decisions), plus a per-doc high-fertility flag
    (subtoks/words > 1.5 as the integer cross-multiplication
    2·subtoks > 3·words — no float boundary).

    Parity: ratios are single double expressions over exact integer
    sums (the q203 rule); the flag is integer-exact.

    Scale shape: map-only per-doc counts, ONE hash aggregate on lang;
    partial aggregation collapses map-side.
    """
    docs = table(spark, sf_dir, "documents")
    words = F.size(F.split(F.col("text"), " "))
    subtoks = F.regexp_count(F.col("text"), F.lit("[a-z0-9]+"))
    d = docs.select(
        "lang",
        words.alias("words"),
        subtoks.alias("subtoks"),
        F.col("n_chars").alias("chars"),
    )
    return d.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("words").cast("long").alias("words"),
        F.sum("subtoks").cast("long").alias("subtokens"),
        F.sum("chars").cast("long").alias("chars"),
        dec(F.sum("subtoks") * F.expr("1e0") / F.sum("words"), 6).alias(
            "fertility"
        ),
        dec(F.sum("chars") * F.expr("1e0") / F.sum("subtoks"), 6).alias(
            "chars_per_subtoken"
        ),
        F.sum(
            (F.col("subtoks") * 2 > F.col("words") * 3).cast("long")
        )
        .cast("long")
        .alias("n_high_fertility_docs"),
    )


# ---------------------------------------------------------------------------
# q292 — code-switching detection (window-level language mixture)
# ---------------------------------------------------------------------------

CSW_WINDOW = 20  # words per language-ID window
_CSW_ORDER = ("en", "de", "fr", "es")  # argmax tie order (q51's chain)


def _q292_oracle() -> str:
    win = f"wl[i * {CSW_WINDOW} + 1 : i * {CSW_WINDOW} + {CSW_WINDOW}]"
    sc = {
        lang: f"len(list_filter({win}, t -> list_contains({list(ms)!r}, t)))"
        for lang, ms in LANG_MARKERS.items()
    }
    pred = f"""CASE WHEN {sc['en']} >= {sc['de']} AND {sc['en']} >= {sc['fr']}
                     AND {sc['en']} >= {sc['es']} THEN 'en'
                WHEN {sc['de']} >= {sc['fr']} AND {sc['de']} >= {sc['es']}
                     THEN 'de'
                WHEN {sc['fr']} >= {sc['es']} THEN 'fr'
                ELSE 'es' END"""
    counts = ", ".join(
        f"len(list_filter(preds, p -> p = '{lang}')) AS c_{lang}"
        for lang in _CSW_ORDER
    )
    maj = """CASE WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
                  WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
                  WHEN c_fr >= c_es THEN 'fr'
                  ELSE 'es' END"""
    nm = "GREATEST(GREATEST(c_en, c_de), GREATEST(c_fr, c_es))"
    return f"""
    WITH ws AS (SELECT doc_id, lang, string_split(text, ' ') AS wl
                FROM documents),
    p AS (
      SELECT doc_id, lang,
             list_transform(
               generate_series(0, (len(wl) - 1) // {CSW_WINDOW}),
               i -> {pred}) AS preds
      FROM ws),
    c AS (SELECT doc_id, lang, len(preds) AS n_windows, {counts} FROM p)
    SELECT doc_id, lang,
           CAST(n_windows AS BIGINT) AS n_windows,
           CAST({nm} AS BIGINT) AS n_majority,
           {maj} AS majority_lang,
           CAST((n_windows - {nm}) * 1000000 // n_windows AS BIGINT)
             AS mixed_ppm
    FROM c
    """


@query("q292_code_switch_mixture", oracle=_q292_oracle())
def q292_code_switch_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-level code-switching detection: each {CSW_WINDOW}-word
    window language-IDs independently (q51's marker argmax with the
    same tie chain), and a document's mixture = the ppm share of
    windows disagreeing with the majority window language.  Whole-doc
    langID (q51) averages a bilingual document into one confident
    wrong label; curation pipelines filter or route code-switched
    documents separately, and this is the signal they cut on.

    Parity: marker counts and window tallies are integers; the
    majority pick uses the identical fixed argmax order in both
    engines; mixed_ppm is an integer floor division on positives.

    Scale shape: map-only — windows, per-window scores, the argmax,
    and the per-doc tally are all array expressions inside one
    projection; NO shuffle at all (q51's shape, one level nested).
    """
    words = F.split(F.col("text"), " ")

    def wpred(w: Column) -> Column:
        sc = {}
        for lang, ms in LANG_MARKERS.items():
            values = list(ms)  # closure, NOT a lambda default (q41 note)
            sc[lang] = F.size(F.filter(w, lambda t: t.isin(*values)))
        return (
            F.when(
                (sc["en"] >= sc["de"])
                & (sc["en"] >= sc["fr"])
                & (sc["en"] >= sc["es"]),
                "en",
            )
            .when((sc["de"] >= sc["fr"]) & (sc["de"] >= sc["es"]), "de")
            .when(sc["fr"] >= sc["es"], "fr")
            .otherwise("es")
        )

    preds = F.transform(
        F.sequence(
            F.lit(0), F.floor((F.size(words) - 1) / CSW_WINDOW).cast("int")
        ),
        lambda i: wpred(F.slice(words, i * CSW_WINDOW + 1, CSW_WINDOW)),
    )
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", preds.alias("preds")
    )
    cnt = {}
    for lang in _CSW_ORDER:
        lit = lang  # closure over the loop variable (q41 note)
        cnt[lang] = F.size(F.filter(F.col("preds"), lambda p: p == lit))
    maj = (
        F.when(
            (cnt["en"] >= cnt["de"])
            & (cnt["en"] >= cnt["fr"])
            & (cnt["en"] >= cnt["es"]),
            "en",
        )
        .when((cnt["de"] >= cnt["fr"]) & (cnt["de"] >= cnt["es"]), "de")
        .when(cnt["fr"] >= cnt["es"], "fr")
        .otherwise("es")
    )
    nm = F.greatest(
        F.greatest(cnt["en"], cnt["de"]), F.greatest(cnt["fr"], cnt["es"])
    )
    nw = F.size(F.col("preds"))
    return docs.select(
        "doc_id",
        "lang",
        nw.cast("long").alias("n_windows"),
        nm.cast("long").alias("n_majority"),
        maj.alias("majority_lang"),
    ).withColumn(
        # exact BIGINT integer division (the r11 fixed-point SUM/multiply
        # audit): the earlier (nw - nm) * 1_000_000 was an INT multiply —
        # under ANSI it throws ARITHMETIC_OVERFLOW on any doc with more
        # than 2147 disagreeing windows (~43k words; reachable in a web
        # corpus) while DuckDB's BIGINT len() sails through — and the
        # / + FLOOR pair was double division where `div` is exact
        "mixed_ppm",
        F.expr(
            "CAST((CAST(n_windows - n_majority AS BIGINT) * 1000000)"
            " div n_windows AS BIGINT)"
        ),
    )


# ---------------------------------------------------------------------------
# q293 — incremental BM25 stats maintenance (lexical-index IVM audit)
# ---------------------------------------------------------------------------

BMIVM_TOP = 20  # report the top-N terms by merged document frequency


def _q293_oracle() -> str:
    return f"""
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
               FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf,
                  doc_id % {DOC_DELTA_MOD} = {DOC_DELTA_REM} AS dlt
           FROM t GROUP BY 1, 2),
    base AS (SELECT term, COUNT(*) AS df_b, SUM(tf) AS cf_b
             FROM tf WHERE NOT dlt GROUP BY 1),
    dl AS (SELECT term, COUNT(*) AS df_d, SUM(tf) AS cf_d
           FROM tf WHERE dlt GROUP BY 1),
    merged AS (
      SELECT COALESCE(b.term, d.term) AS term,
             COALESCE(df_b, 0) AS df_base, COALESCE(df_d, 0) AS df_delta,
             COALESCE(df_b, 0) + COALESCE(df_d, 0) AS df_merged,
             COALESCE(cf_b, 0) + COALESCE(cf_d, 0) AS cf_merged
      FROM base b FULL OUTER JOIN dl d ON b.term = d.term),
    full_r AS (SELECT term, COUNT(*) AS df_f, SUM(tf) AS cf_f
               FROM tf GROUP BY 1),
    audit AS (
      SELECT MIN(CASE WHEN m.df_merged = f.df_f AND m.cf_merged = f.cf_f
                      THEN 1 ELSE 0 END) AS ok
      FROM merged m FULL OUTER JOIN full_r f ON m.term = f.term)
    SELECT m.term,
           CAST(m.df_base AS BIGINT) AS df_base,
           CAST(m.df_delta AS BIGINT) AS df_delta,
           CAST(m.df_merged AS BIGINT) AS df_merged,
           CAST(m.cf_merged AS BIGINT) AS cf_merged,
           CAST(audit.ok AS BIGINT) AS matches_full
    FROM merged m CROSS JOIN audit
    ORDER BY m.df_merged DESC, m.term LIMIT {BMIVM_TOP}
    """


@query("q293_bm25_stats_delta_refresh", oracle=_q293_oracle())
def q293_bm25_stats_delta_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental lexical-index statistics maintenance — the q282/q284
    IVM contract applied to the THIRD index family: BM25/q86's term
    statistics (document frequency, collection frequency).  The delta
    ingest batch (doc_id % {DOC_DELTA_MOD} == {DOC_DELTA_REM})
    tokenizes ITS documents only; the refreshed stats are integer
    partial MERGES (df_base + df_delta), never a re-scan of the base
    corpus — so q287's scorer stays current between full index
    rebuilds at 100 TB.  ``matches_full`` certifies the merge against
    an independent full recompute over EVERY term (a global MIN, not
    just the reported rows).

    Parity: all integer counts; the top-{BMIVM_TOP} report ties on the
    term string.

    Scale shape: one explode → (doc, term) hash aggregate carrying the
    delta flag, streaming into ONE fused conditional term aggregation
    (base/delta/full partials as conditional sums — r13, guide §2.4);
    the report is TakeOrderedAndProject over the persisted bounded
    term table.
    """
    from pyspark.storagelevel import StorageLevel

    docs = table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn(
            "dlt", (F.col("doc_id") % DOC_DELTA_MOD) == DOC_DELTA_REM
        )
    )

    # Optimization r13 (guide §2.4/§1.2 — VERDICT r12 ask #6): the
    # base/delta/full partials fuse into ONE conditional groupBy(term)
    # (3 Exchanges + 2 full-outer merges -> 1 Exchange); the (doc,
    # term) table streams into it, so its persist moves to the bounded
    # term-level result the audit and the top-k report both read.
    # Audit independence stays per-expression: merged = base-slice +
    # delta-slice vs full = the unconditional count/sum.
    z = F.lit(0)
    merged = (
        tf.groupBy("term")
        .agg(
            F.count(F.when(~F.col("dlt"), F.lit(1))).alias("df_b"),
            F.sum(F.when(~F.col("dlt"), F.col("tf"))).alias("cf_b"),
            F.count(F.when(F.col("dlt"), F.lit(1))).alias("df_d"),
            F.sum(F.when(F.col("dlt"), F.col("tf"))).alias("cf_d"),
            F.count("*").alias("df_f"),
            F.sum("tf").alias("cf_f"),
        )
        .select(
            "term",
            F.col("df_b").alias("df_base"),
            F.col("df_d").alias("df_delta"),
            (F.col("df_b") + F.col("df_d")).alias("df_merged"),
            (F.coalesce("cf_b", z) + F.coalesce("cf_d", z)).alias("cf_merged"),
            "df_f",
            "cf_f",
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    audit = merged.agg(
        F.min(
            (
                (F.col("df_merged") == F.col("df_f"))
                & (F.col("cf_merged") == F.col("cf_f"))
            ).cast("long")
        ).alias("ok")
    )
    top = (
        merged.crossJoin(F.broadcast(audit))
        .orderBy(F.col("df_merged").desc(), "term")
        .limit(BMIVM_TOP)
    )
    return top.select(
        "term",
        F.col("df_base").cast("long"),
        F.col("df_delta").cast("long"),
        F.col("df_merged").cast("long"),
        F.col("cf_merged").cast("long"),
        F.col("ok").cast("long").alias("matches_full"),
    )


# ---------------------------------------------------------------------------
# q294 — HITS hubs & authorities on the customer→part purchase graph
# ---------------------------------------------------------------------------

HITS_ITERS = 4
HITS_UNIT = 1_000_000  # L1-normalized fixed point: Σ scores ≈ 1e6 per side
HITS_TOP = 10
#: the q221/q183 collect-and-solve gate on the distinct (customer,
#: part) edge list — 10M rows x 2 int64 ≈ 160 MB on the driver (the
#: size of a large broadcast table); above it the distributed loop
#: runs unchanged
HITS_COLLECT_EDGES = 10_000_000


def _q294_oracle() -> str:
    prev = "h0"
    iters = []
    for k in range(1, HITS_ITERS + 1):
        iters.append(f"""
    ar{k} AS MATERIALIZED (
      SELECT e.p, SUM(h.h) AS raw FROM e JOIN {prev} h ON h.c = e.c
      GROUP BY 1),
    a{k} AS MATERIALIZED (
      SELECT p, CAST(raw * {HITS_UNIT} // (SELECT SUM(raw) FROM ar{k})
                AS BIGINT) AS a
      FROM ar{k}),
    hr{k} AS MATERIALIZED (
      SELECT e.c, SUM(a.a) AS raw FROM e JOIN a{k} a ON a.p = e.p
      GROUP BY 1),
    h{k} AS MATERIALIZED (
      SELECT c, CAST(raw * {HITS_UNIT} // (SELECT SUM(raw) FROM hr{k})
                AS BIGINT) AS h
      FROM hr{k})""")
        prev = f"h{k}"
    return f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT o_custkey AS c, l_partkey AS p
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    h0 AS MATERIALIZED (
      SELECT DISTINCT c, CAST(1 AS BIGINT) AS h FROM e),
    {','.join(iters)}
    SELECT * FROM (
      SELECT 'authority' AS kind, CAST(p AS BIGINT) AS node_id,
             CAST(a AS BIGINT) AS score_units,
             CAST(ROW_NUMBER() OVER (ORDER BY a DESC, p) AS BIGINT) AS rank
      FROM a{HITS_ITERS} ORDER BY a DESC, p LIMIT {HITS_TOP})
    UNION ALL
    SELECT * FROM (
      SELECT 'hub' AS kind, CAST(c AS BIGINT) AS node_id,
             CAST(h AS BIGINT) AS score_units,
             CAST(ROW_NUMBER() OVER (ORDER BY h DESC, c) AS BIGINT) AS rank
      FROM h{HITS_ITERS} ORDER BY h DESC, c LIMIT {HITS_TOP})
    """


def _hits_collected_solve(spark: SparkSession, e: DataFrame) -> DataFrame:
    """Driver-side HITS over the collected (c, p) edge list: integer
    scatter-add rounds with L1 renormalization by floor division —
    identical arithmetic to the distributed loop (all operands
    positive), identical (score DESC, id) top-{HITS_TOP} cut."""
    import numpy as np

    pdf = e.toPandas()
    c = pdf["c"].to_numpy(np.int64)
    p = pdf["p"].to_numpy(np.int64)
    cn = np.unique(c)
    pn = np.unique(p)
    ci = np.searchsorted(cn, c)
    pi = np.searchsorted(pn, p)
    # h0 = 1, not HITS_UNIT: the uniform init factor cancels exactly in
    # the first floor renormalization (floor(d·U·U/(E·U)) = floor(d·U/E),
    # so output is bit-identical), and it removes the only half-step
    # where scores are unnormalized — with h0 = UNIT, raw_a*UNIT wraps
    # int64 (numpy AND Spark BIGINT) once a part has >9.2e6 distinct
    # buyers, while DuckDB's HUGEINT SUM stays exact.  After any renorm
    # Σscores ≤ UNIT, so every later product is ≤ UNIT² — always safe.
    h = np.ones(len(cn), np.int64)
    a = np.zeros(len(pn), np.int64)
    for _ in range(HITS_ITERS):
        raw_a = np.zeros(len(pn), np.int64)
        np.add.at(raw_a, pi, h[ci])
        a = raw_a * HITS_UNIT // max(int(raw_a.sum()), 1)
        raw_h = np.zeros(len(cn), np.int64)
        np.add.at(raw_h, ci, a[pi])
        h = raw_h * HITS_UNIT // max(int(raw_h.sum()), 1)

    def top(nodes, scores, kind):
        order = np.lexsort((nodes, -scores))[:HITS_TOP]
        return [
            (kind, int(nodes[i]), int(scores[i]), r + 1)
            for r, i in enumerate(order)
        ]

    return spark.createDataFrame(
        top(pn, a, "authority") + top(cn, h, "hub"),
        schema="kind string, node_id bigint, score_units bigint, rank bigint",
    )


@query("q294_hits_hubs_authorities", oracle=_q294_oracle())
def q294_hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg) on the bipartite customer→part purchase graph:
    hub customers are the broad high-signal buyers, authority parts
    the products those hubs concentrate on — the mutually-reinforcing
    centrality pair q183's PageRank (a single-mode random walk)
    cannot express, and the classic bipartite-recommendation prior.

    Parity: INTEGER fixed-point with L1 renormalization each half-step
    (score = raw · {HITS_UNIT} // Σraw — HITS is defined up to scale,
    and the floor renormalization keeps every value bounded and
    engine-exact); top-{HITS_TOP} per side ties on the node id.

    Scale shape: one distinct (customer, part) edge collapse
    (checkpointed).  Under HITS_COLLECT_EDGES the {HITS_ITERS} rounds
    solve driver-side in numpy int64 (the q221/q183 collect-and-solve
    lever); above it each half-step is one edge-keyed join + hash agg
    with the 1-row Σraw broadcast, localCheckpointed every second
    round; output is 2×{HITS_TOP} rows either way.
    """
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    e = local_checkpoint(
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct(),
        "q294 purchase edges",
    )

    def _distributed(e: DataFrame) -> DataFrame:
        # h0 = 1 (see _hits_collected_solve): bit-identical output, and
        # the first half-step's raw·UNIT product can no longer wrap
        # BIGINT under extreme in-degree skew.
        hs = local_checkpoint(
            e.select("c").distinct().select(
                "c", F.lit(1).cast("long").alias("h")
            ),
            "q294 hits init",
        )
        a = None
        for k in range(HITS_ITERS):
            raw_a = (
                e.join(hs, "c").groupBy("p").agg(F.sum("h").alias("raw"))
            )
            ta = raw_a.agg(F.sum("raw").alias("t"))
            a = raw_a.crossJoin(F.broadcast(ta)).select(
                "p", F.expr(f"CAST(raw * {HITS_UNIT} div greatest(t, 1) AS BIGINT)").alias("a")
            )
            raw_h = e.join(a, "p").groupBy("c").agg(F.sum("a").alias("raw"))
            th = raw_h.agg(F.sum("raw").alias("t"))
            nxt = raw_h.crossJoin(F.broadcast(th)).select(
                "c", F.expr(f"CAST(raw * {HITS_UNIT} div greatest(t, 1) AS BIGINT)").alias("h")
            )
            hs = (
                local_checkpoint(nxt, f"q294 hits round {k + 1}")
                if k % 2 == 1 or k == HITS_ITERS - 1
                else nxt
            )
        wa = W.orderBy(F.col("score_units").desc(), "node_id")
        tops = []
        for kind, df, idc, sc in (
            ("authority", a, "p", "a"),
            ("hub", hs, "c", "h"),
        ):
            t = (
                df.select(
                    F.col(idc).cast("long").alias("node_id"),
                    F.col(sc).cast("long").alias("score_units"),
                )
                .orderBy(F.col("score_units").desc(), "node_id")
                .limit(HITS_TOP)
            )
            tops.append(
                t.withColumn("rank", F.row_number().over(wa).cast("long"))
                .select(
                    F.lit(kind).alias("kind"), "node_id", "score_units", "rank"
                )
            )
        return tops[0].unionAll(tops[1])

    return collect_and_solve(
        e,
        HITS_COLLECT_EDGES,
        "q294_hits_hubs_authorities",
        lambda ed: _hits_collected_solve(spark, ed),
        _distributed,
    )


# ---------------------------------------------------------------------------
# q295 — hybrid retrieval: per-query BM25 (more-like-this) + the two
# dense ANN lists, fused with reciprocal-rank fusion (VERDICT r9 ask #7)
# ---------------------------------------------------------------------------

HYB_QT = 8  # most-distinctive (lowest-df) terms taken from each query doc
HYB_LEX_K = 10  # lexical candidates per query entering the fusion
HYB_K = 10  # fused neighbors returned per query


def _q295_oracle() -> str:
    idf = "ln(1e0 + (st.n - qt.df + 0.5e0) / (qt.df + 0.5e0))"
    tfc = (
        f"(tf.tf * ({BM25_K1}e0 + 1e0)) / "
        f"(tf.tf + {BM25_K1}e0 * (1e0 - {BM25_B}e0 + {BM25_B}e0 * tf.dl / st.avgdl))"
    )
    return f"""
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
               FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf,
                  SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS dl
           FROM t GROUP BY 1, 2),
    dfr AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    st AS (SELECT COUNT(*) AS n,
                  SUM(len(string_split(text, ' '))) * 1e0 / COUNT(*) AS avgdl
           FROM documents),
    qt AS (SELECT q_id, term, df FROM (
             SELECT tf.doc_id AS q_id, tf.term, dfr.df,
                    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                       ORDER BY dfr.df ASC, tf.term) AS rn
             FROM tf JOIN dfr USING (term)
             WHERE tf.doc_id < {N_QUERIES})
           WHERE rn <= {HYB_QT}),
    s AS (
      SELECT qt.q_id, tf.doc_id,
             CAST(FLOOR((ROUND({idf} * {tfc}, 6) + 0.0) * 1000000e0 + 0.5e0)
                  AS BIGINT) AS m
      FROM qt JOIN tf ON tf.term = qt.term CROSS JOIN st
      WHERE tf.doc_id <> qt.q_id),
    scb AS (SELECT q_id, doc_id, SUM(m) AS score_micro FROM s GROUP BY 1, 2),
    lex AS (SELECT q_id, neighbor_id, "rank" FROM (
              SELECT q_id, doc_id AS neighbor_id,
                     ROW_NUMBER() OVER (PARTITION BY q_id
                       ORDER BY score_micro DESC, doc_id) AS "rank"
              FROM scb)
            WHERE "rank" <= {HYB_LEX_K}),
    lsh AS (SELECT * FROM ({{Q46}})),
    ivf AS (SELECT * FROM ({{Q47}})),
    un AS (
      SELECT q_id, neighbor_id, "rank" FROM lex
      UNION ALL
      SELECT q_id, neighbor_id, "rank" FROM lsh WHERE q_id < {N_QUERIES}
      UNION ALL
      SELECT q_id, neighbor_id, "rank" FROM ivf),
    fused AS (
      SELECT q_id, neighbor_id,
             SUM(1000000 // ({RRF_C} + "rank")) AS rrf_micro,
             COUNT(*) AS n_methods
      FROM un GROUP BY q_id, neighbor_id),
    ranked AS (
      SELECT q_id, neighbor_id, CAST(rrf_micro AS BIGINT) AS rrf_micro,
             CAST(n_methods AS BIGINT) AS n_methods,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY rrf_micro DESC, neighbor_id) AS fused_rank
      FROM fused)
    SELECT q_id, neighbor_id, rrf_micro, n_methods,
           CAST(fused_rank AS BIGINT) AS fused_rank
    FROM ranked WHERE fused_rank <= {HYB_K}
    """.replace("{Q46}", ORACLES["q46_ann_lsh_bucketed"]).replace(
        "{Q47}", ORACLES["q47_ann_ivf"]
    )


def _hybrid_dense_legs(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """The two dense retrieval lists q295 fuses and q296 audits — built
    once here so q296 can persist and INJECT them instead of paying the
    q46/q47 passes three times (the q90/q159 ann_audit_frames lesson).

    The LSH leg pins score_backend="jvm": fused into q295's single
    union plan the Arrow roundtrip reads ~1.6 s SLOWER than the pure-
    expression leg (interleaved A/B at sf0.1: 4.41 vs 5.99 s for the
    whole q295), the opposite of q46's standalone result — pure JVM
    legs fuse into one codegen pipeline; a Python node in the middle
    forces an exchange-like boundary per leg."""
    return {
        "lsh": q46_ann_lsh_bucketed(spark, sf_dir, score_backend="jvm")
        .filter(F.col("q_id") < N_QUERIES)
        .select("q_id", "neighbor_id", "rank"),
        "ivf": q47_ann_ivf(spark, sf_dir).select("q_id", "neighbor_id", "rank"),
    }


@query("q295_hybrid_retrieval", oracle=_q295_oracle())
def q295_hybrid_retrieval(
    spark: SparkSession,
    sf_dir: str,
    legs: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Hybrid retrieval — the composition a production training-data
    search deployment actually runs: a per-query LEXICAL list (BM25
    more-like-this: each query document's {HYB_QT} most distinctive =
    lowest-df terms, scored with q287's Okapi discipline, self-match
    excluded) fused with BOTH dense ANN lists (q46 LSH, q47 IVF) by
    q153's reciprocal-rank fusion.  Rank-based fusion needs no score
    calibration between BM25 micro-units and cosine distances, and a
    neighbor surfaced by lexical AND dense legs outranks either leg's
    solo tail — the standard recall ensemble over heterogeneous
    retrievers.  The embeddings table is the documents' id-aligned
    embedding companion (vec_id ≡ doc_id by fixture construction), so
    all three legs rank the same id space.

    Parity: the lexical leg reuses q287's 6-dp-round → integer-micro
    quantization (order-independent per-doc sums, ties on doc_id);
    query-term selection orders by (df ASC, term) — both engine-exact;
    the fused score is an INTEGER micro-unit sum — floor(1e6 /
    (60 + rank)) per leg, the q296 MRR discipline — so no float
    summation order exists (ADVICE r10 #3: 1/(60+rank) is not exactly
    representable in binary, so the earlier double-sum design was
    engine-order-dependent in principle; q153 fixed the same way).

    Scale shape: the query-term table is N_QUERIES x {HYB_QT} rows
    (broadcast); its tf join fans out to Σ df(term) over DISTINCTIVE
    (low-df) terms — the cheapest posting lists in the index, the
    reason real retrieval stacks query on rare terms; one (q, doc)
    hash agg and a per-query top-{HYB_LEX_K} window close the lexical
    leg; the dense legs are q46/q47 unchanged (each already
    scale-audited); fusion adds one union + one bounded hash agg +
    a per-query top-{HYB_K} window over ≤ {HYB_LEX_K} + LSH_K + IVF_K
    candidates per query.
    """
    docs = table(spark, sf_dir, "documents")
    ws = F.size(F.split(F.col("text"), " "))
    st = docs.agg(
        F.count("*").alias("n"),
        (F.sum(ws) * F.lit(1.0) / F.count("*")).alias("avgdl"),
    )
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("dl", F.sum("tf").over(W.partitionBy("doc_id")))
    )
    dfr = tf.groupBy("term").agg(F.count("*").alias("df"))
    wq = W.partitionBy("q_id").orderBy(F.col("df").asc(), "term")
    qt = (
        tf.filter(F.col("doc_id") < N_QUERIES)
        .select(F.col("doc_id").alias("q_id"), "term")
        .join(dfr, "term")
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= HYB_QT)
        .select("q_id", "term", "df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tfc = (F.col("tf") * F.lit(BM25_K1 + 1.0)) / (
        F.col("tf")
        + F.lit(BM25_K1)
        * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl"))
    )
    s = (
        tf.join(F.broadcast(qt), "term")
        .filter(F.col("doc_id") != F.col("q_id"))
        .crossJoin(F.broadcast(st))
        .select(
            "q_id",
            "doc_id",
            F.floor(dec(idf * tfc, 6) * F.lit(1_000_000.0) + F.lit(0.5))
            .cast("long")
            .alias("m"),
        )
    )
    wl = W.partitionBy("q_id").orderBy(F.col("score_micro").desc(), "doc_id")
    lex = (
        s.groupBy("q_id", "doc_id")
        .agg(F.sum("m").alias("score_micro"))
        .withColumn("rank", F.row_number().over(wl).cast("long"))
        .filter(F.col("rank") <= HYB_LEX_K)
        .select("q_id", F.col("doc_id").alias("neighbor_id"), "rank")
    )
    if legs is None:
        legs = _hybrid_dense_legs(spark, sf_dir)
    un = lex.unionByName(legs["lsh"]).unionByName(legs["ivf"])
    fused = un.groupBy("q_id", "neighbor_id").agg(
        F.sum(F.expr(f"1000000 div ({RRF_C} + rank)"))
        .cast("long")
        .alias("rrf_micro"),
        F.count("*").cast("long").alias("n_methods"),
    )
    wf = W.partitionBy("q_id").orderBy(F.col("rrf_micro").desc(), "neighbor_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("fused_rank") <= HYB_K)
        .select("q_id", "neighbor_id", "rrf_micro", "n_methods", "fused_rank")
    )


# ---------------------------------------------------------------------------
# q296 — hybrid retrieval quality audit: recall@k + MRR of the fused
# list and each dense leg against the exact cosine baseline (the q90
# discipline applied to the q295 composition)
# ---------------------------------------------------------------------------

#: (method, k) audited — each list is cut at ITS OWN retrieval depth,
#: the q90 per-method-k rule
HYB_AUDIT_METHODS = (("lsh", LSH_K), ("ivf", IVF_K), ("hybrid", HYB_K))


def _q296_oracle() -> str:
    from datapipeline_dags_spark.plans.registry import ORACLES

    srcs = {
        "lsh": f"SELECT q_id, neighbor_id, \"rank\" FROM ({ORACLES['q46_ann_lsh_bucketed']}) t WHERE q_id < {N_QUERIES}",
        "ivf": f"SELECT q_id, neighbor_id, \"rank\" FROM ({ORACLES['q47_ann_ivf']}) t",
        "hybrid": f"SELECT q_id, neighbor_id, fused_rank AS \"rank\" FROM ({ORACLES['q295_hybrid_retrieval']}) t",
    }
    ctes = ",\n    ".join(f"m_{m} AS ({sql})" for m, sql in srcs.items())
    rec = sql_dec(
        "SUM(CASE WHEN m.q_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*)",
        6,
    )
    blocks = []
    for m, k in HYB_AUDIT_METHODS:
        blocks.append(
            f"""
      SELECT '{m}' AS method, CAST({k} AS BIGINT) AS k, r.n_queries,
             r.recall, s.mrr_micro
      FROM (
        SELECT CAST(COUNT(DISTINCT e.q_id) AS BIGINT) AS n_queries,
               {rec} AS recall
        FROM (SELECT q_id, neighbor_id FROM exact_full WHERE rank <= {k}) e
        LEFT JOIN (SELECT q_id, neighbor_id FROM m_{m}
                   WHERE "rank" <= {k}) m
          ON m.q_id = e.q_id AND m.neighbor_id = e.neighbor_id) r
      CROSS JOIN (
        SELECT CAST(COALESCE(SUM(1000000 // l."rank"), 0) // {N_QUERIES}
                    AS BIGINT) AS mrr_micro
        FROM (SELECT q_id, neighbor_id FROM exact_full WHERE rank = 1) t1
        LEFT JOIN (SELECT q_id, neighbor_id, "rank" FROM m_{m}
                   WHERE "rank" <= {k}) l
          ON l.q_id = t1.q_id AND l.neighbor_id = t1.neighbor_id) s"""
        )
    return f"""
    WITH exact_full AS (SELECT * FROM ({ORACLES["q45_ann_topk_bruteforce"]}) t),
    {ctes}
    {" UNION ALL ".join(blocks)}
    """


@query("q296_hybrid_retrieval_audit", oracle=_q296_oracle())
def q296_hybrid_retrieval_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality audit of the q295 hybrid stack: recall@k of
    each list against the exact cosine top-k (q45, self excluded) plus
    MRR of the exact TOP-1 neighbor — did the list surface the single
    best match, and how high — for the two dense legs and the fused
    list, each cut at its own retrieval depth (the q90 rule).  Fusion
    quality becomes a number next to its legs, so a fused list that
    silently degrades below its own inputs is visible in the audit,
    not just in anecdote.

    Parity: recall is the q90 integer-ratio / 6-dp pair; MRR is made
    engine-exact by integer micro-units — per query floor(1e6 / rank)
    of the exact-top-1 hit (0 when missed), summed and floor-divided
    by N_QUERIES, so no float summation order exists at all.

    Scale shape: composes q45 + q46 + q47 + q295 (each already
    scale-audited); the dense legs are built ONCE, persisted, and
    INJECTED into q295's fusion (the q90/q159 shared-frame rule — the
    naive composition pays the q46/q47 passes three times); every audit
    frame is bounded (N_QUERIES x k rows, persisted across its two
    metric consumers); the metrics are single-row aggregates
    cross-joined per method — {len(HYB_AUDIT_METHODS)} x 1-row
    attaches, never a corpus-wide operation.
    """
    from pyspark.storagelevel import StorageLevel

    exact = (
        q45_ann_topk_bruteforce(spark, sf_dir)
        .select("q_id", "neighbor_id", "rank")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    legs = {
        m: df.persist(StorageLevel.MEMORY_AND_DISK)
        for m, df in _hybrid_dense_legs(spark, sf_dir).items()
    }
    lists = {
        "lsh": legs["lsh"],
        "ivf": legs["ivf"],
        "hybrid": q295_hybrid_retrieval(spark, sf_dir, legs=legs).select(
            "q_id", "neighbor_id", F.col("fused_rank").alias("rank")
        ),
    }
    out = None
    for m, k in HYB_AUDIT_METHODS:
        lst = (
            lists[m]
            .filter(F.col("rank") <= k)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        e = exact.filter(F.col("rank") <= k).select("q_id", "neighbor_id")
        r = (
            e.join(lst.select("q_id", "neighbor_id", F.lit(1).alias("hit")),
                   ["q_id", "neighbor_id"], "left")
            .agg(
                F.countDistinct("q_id").cast("long").alias("n_queries"),
                dec(F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                    * F.lit(1.0) / F.count("*"), 6).alias("recall"),
            )
        )
        t1 = exact.filter(F.col("rank") == 1).select("q_id", "neighbor_id")
        s = (
            t1.join(lst.select("q_id", "neighbor_id",
                               F.col("rank").alias("lrank")),
                    ["q_id", "neighbor_id"], "left")
            .agg(
                F.expr(
                    f"CAST(coalesce(SUM(1000000 div lrank), 0) "
                    f"div {N_QUERIES} AS BIGINT)"
                ).alias("mrr_micro")
            )
        )
        row = (
            r.crossJoin(F.broadcast(s))
            .select(
                F.lit(m).alias("method"),
                F.lit(k).cast("long").alias("k"),
                "n_queries",
                "recall",
                "mrr_micro",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# q297 — cross-modal duplicate consistency (text near-dups vs embeddings)
# ---------------------------------------------------------------------------

CMX_HI = 0.9  # rounded-cosine floor for "embedding agrees strongly"
CMX_LO = 0.7  # rounded-cosine floor for "embedding agrees softly"


def _q297_oracle() -> str:
    cos = _COS_SQL.format(a="a.embedding", b="b.embedding")
    return f"""
    WITH pr AS (SELECT doc_a, doc_b, jaccard
                FROM ({ORACLES['q41_dedup_minhash_lsh']}) t),
    j AS (
      SELECT pr.doc_a, pr.doc_b, pr.jaccard,
             (ROUND({cos}, 6) + 0.0) AS cos
      FROM pr
      JOIN embeddings a ON a.vec_id = pr.doc_a
      JOIN embeddings b ON b.vec_id = pr.doc_b)
    SELECT CASE WHEN cos >= {CMX_HI} THEN 'agree_high'
                WHEN cos >= {CMX_LO} THEN 'agree_soft'
                ELSE 'disagree' END AS band,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           (MIN(cos) + 0.0) AS min_cos,
           (MAX(cos) + 0.0) AS max_cos,
           (MIN(jaccard) + 0.0) AS min_jaccard
    FROM j GROUP BY 1
    """


@query("q297_crossmodal_dup_consistency", oracle=_q297_oracle())
def q297_crossmodal_dup_consistency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-modal duplicate consistency audit: every VERIFIED text
    near-dup pair (q41's exact-Jaccard survivors) is scored against the
    embedding table's cosine for the same two ids, banded into
    agree_high (≥ {CMX_HI}), agree_soft (≥ {CMX_LO}) and DISAGREE — a
    text-duplicate whose embeddings are far apart means the embedding
    table is stale, built from different text, or poisoned, exactly the
    drift a semantic-dedup (q96) or ANN-retrieval (q46/q47/q295) stack
    silently inherits.  The id-aligned embeddings companion (vec_id ≡
    doc_id) is what a production feature store keys the same way.

    Parity: cosine rounds to 6 dp BEFORE banding and min/max (the q45
    rule — band edges compare the rounded value to a constant); the
    per-band aggregates are counts and MIN/MAX of already-rounded
    doubles, all order-independent; no float summation exists.

    Scale shape: q41's near-dup pair set (already blocking-audited) is
    output-bounded; two hash joins attach the embedding rows by id; one
    3-group hash aggregate closes it.  No new corpus-wide operation —
    the audit costs two id-keyed joins over the PAIR table.

    On the synthetic fixture the embeddings are generated independently
    of the text, so the audit reports every text near-dup as DISAGREE —
    the drifted-table state it exists to flag; the healthy agree_high
    state is pinned by tests/test_crossmodal_audit.py with text-derived
    embeddings.
    """
    pairs = q41_dedup_minhash_lsh(spark, sf_dir)
    emb = table(spark, sf_dir, "embeddings")
    ea = emb.select(F.col("vec_id").alias("doc_a"), F.col("embedding").alias("va"))
    eb = emb.select(F.col("vec_id").alias("doc_b"), F.col("embedding").alias("vb"))
    j = (
        pairs.join(ea, "doc_a")
        .join(eb, "doc_b")
        .select(
            "jaccard",
            dec(_cosine(F.col("va"), F.col("vb")), 6).alias("cos"),
        )
    )
    band = (
        F.when(F.col("cos") >= CMX_HI, "agree_high")
        .when(F.col("cos") >= CMX_LO, "agree_soft")
        .otherwise("disagree")
    )
    return j.groupBy(band.alias("band")).agg(
        F.count("*").cast("long").alias("n_pairs"),
        (F.min("cos") + F.lit(0.0)).alias("min_cos"),
        (F.max("cos") + F.lit(0.0)).alias("max_cos"),
        (F.min("jaccard") + F.lit(0.0)).alias("min_jaccard"),
    )


# ---------------------------------------------------------------------------
# q298 — dedup deletion manifest (the actionable drop list)
# ---------------------------------------------------------------------------


def _q298_oracle() -> str:
    return f"""
    WITH c AS ({ORACLES['q69_dedup_clusters']}),
    f AS ({ORACLES['q50_text_quality']}),
    j AS (
      SELECT c.cluster_id, c.doc_id, f.quality, d.source,
             ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                ORDER BY f.quality DESC, c.doc_id) AS rn
      FROM c
      JOIN f ON f.doc_id = c.doc_id
      JOIN documents d ON d.doc_id = c.doc_id),
    keep AS (SELECT cluster_id, doc_id AS kept_doc_id FROM j WHERE rn = 1)
    SELECT CAST(j.doc_id AS BIGINT) AS drop_doc_id,
           CAST(k.kept_doc_id AS BIGINT) AS kept_doc_id,
           CAST(j.cluster_id AS BIGINT) AS cluster_id,
           j.source,
           (j.quality + 0.0) AS dropped_quality
    FROM j JOIN keep k ON k.cluster_id = j.cluster_id
    WHERE j.rn > 1
    """


@query("q298_dedup_deletion_manifest", oracle=_q298_oracle())
def q298_dedup_deletion_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The deletion MANIFEST a dedup run actually ships: one row per
    document to DROP — (drop_doc_id, the kept representative it
    duplicates, its cluster, source, quality) — the doc-id-level
    artifact a 100 TB pipeline feeds to its tombstone/requeue step,
    where q285 reports the per-cluster summary and q271 the savings.
    Keep-rule identical to q285 (best 4-dp quality, id tiebreak), so
    manifest ∪ representatives = exactly the clustered corpus.

    Parity: the keeper is the q285 struct-max rule on the rounded
    quality; all joins are id-keyed; no float aggregation exists.

    Scale shape: composes q69's capped CC clusters with q50's map-side
    metrics and the documents source column on the doc key; the keeper
    pick is the q285 map-side-combinable struct-max AGGREGATE (never a
    window over cluster members — a boilerplate mega-cluster would
    make that partition the straggler); output is |clustered docs| −
    |clusters| rows, bounded by the true duplicate volume.
    """
    c = q69_dedup_clusters(spark, sf_dir)
    f = q50_text_quality(spark, sf_dir).select("doc_id", "quality")
    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    j = c.join(f, "doc_id").join(docs, "doc_id")
    best = F.max(
        F.struct(
            F.col("quality").alias("q"), (-F.col("doc_id")).alias("nid")
        )
    )
    keep = (
        j.groupBy("cluster_id")
        .agg(best.alias("b"))
        .select(
            "cluster_id", (-F.col("b.nid")).cast("long").alias("kept_doc_id")
        )
    )
    return (
        j.join(keep, "cluster_id")
        .filter(F.col("doc_id") != F.col("kept_doc_id"))
        .select(
            F.col("doc_id").cast("long").alias("drop_doc_id"),
            "kept_doc_id",
            F.col("cluster_id").cast("long").alias("cluster_id"),
            "source",
            (F.col("quality") + F.lit(0.0)).alias("dropped_quality"),
        )
    )


# ---------------------------------------------------------------------------
# q299 — deletion manifest APPLY (tombstone consumption; VERDICT r10 #2)
# ---------------------------------------------------------------------------


def _q299_oracle() -> str:
    return f"""
    WITH m AS ({ORACLES['q298_dedup_deletion_manifest']}),
    d AS (SELECT doc_id, source, len(string_split(text, ' ')) AS toks
          FROM documents),
    drops AS (SELECT source, COUNT(*) AS n_dropped FROM m GROUP BY 1),
    ret AS (
      SELECT d.source, COUNT(*) AS n_retained, SUM(d.toks) AS tokens_retained
      FROM d
      WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.drop_doc_id = d.doc_id)
      GROUP BY 1),
    tot AS (SELECT source, COUNT(*) AS n_docs, SUM(toks) AS tokens_total
            FROM d GROUP BY 1)
    SELECT t.source,
           CAST(t.n_docs AS BIGINT) AS n_docs,
           CAST(COALESCE(dr.n_dropped, 0) AS BIGINT) AS n_dropped,
           CAST(COALESCE(r.n_retained, 0) AS BIGINT) AS n_retained,
           CAST(t.tokens_total AS BIGINT) AS tokens_total,
           CAST(COALESCE(r.tokens_retained, 0) AS BIGINT) AS tokens_retained,
           CAST(CASE WHEN COALESCE(r.n_retained, 0)
                          + COALESCE(dr.n_dropped, 0) = t.n_docs
                THEN 1 ELSE 0 END AS BIGINT) AS audit_ok
    FROM tot t
    LEFT JOIN drops dr ON dr.source = t.source
    LEFT JOIN ret r ON r.source = t.source
    """


@query("q299_deletion_manifest_apply", oracle=_q299_oracle())
def q299_deletion_manifest_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the q298 deletion manifest — the tombstone-consumption
    step that was the missing half of the dedup lifecycle: the retained
    corpus is ``documents`` ANTI-JOINED against the manifest's
    ``drop_doc_id`` (the id-keyed subtraction a 100 TB pipeline runs
    before shipping a training shard), reported per source with an
    in-query conservation audit.  ``audit_ok`` certifies, per source,
    that retained + dropped == total where the three counts come from
    INDEPENDENT paths (anti-join scan, manifest aggregate, corpus
    aggregate) — a manifest with duplicate rows, or rows referencing
    ids outside the corpus, fails the audit instead of silently
    shipping the wrong document set.

    Parity: all integer counts and token sums; the manifest keep-rule
    is q298's (rounded-quality struct-max, id tiebreak).

    Scale shape: the manifest is output-bounded (true duplicate
    volume); the apply is ONE left-anti hash join on the doc key —
    broadcastable when the manifest is small relative to the corpus,
    shuffle-keyed otherwise (Spark/AQE picks); per-source rollups are
    map-side-combinable aggregates; no window, no corpus-squared
    anything.
    """
    m = q298_dedup_deletion_manifest(spark, sf_dir)
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).alias("toks"),
    )
    drops = m.groupBy("source").agg(F.count("*").alias("n_dropped"))
    ret = (
        d.join(
            m.select(F.col("drop_doc_id").alias("doc_id")), "doc_id", "left_anti"
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_retained"),
            F.sum("toks").alias("tokens_retained"),
        )
    )
    tot = d.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("toks").alias("tokens_total")
    )
    return (
        tot.join(drops, "source", "left")
        .join(ret, "source", "left")
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.coalesce("n_dropped", F.lit(0)).cast("long").alias("n_dropped"),
            F.coalesce("n_retained", F.lit(0)).cast("long").alias("n_retained"),
            F.col("tokens_total").cast("long").alias("tokens_total"),
            F.coalesce("tokens_retained", F.lit(0))
            .cast("long")
            .alias("tokens_retained"),
            (
                F.coalesce("n_retained", F.lit(0))
                + F.coalesce("n_dropped", F.lit(0))
                == F.col("n_docs")
            )
            .cast("long")
            .alias("audit_ok"),
        )
    )


# ---------------------------------------------------------------------------
# q300 — IVF index maintenance with DELETIONS (signed retraction merge)
# ---------------------------------------------------------------------------

#: the simulated deletion batch: vec_id % MOD == DELETE_REM leaves the
#: corpus at the same maintenance tick the insert delta (q282's
#: % MOD == IVF_DELTA_REM) arrives.  Disjoint remainders, so a doc is
#: never both inserted and deleted in one tick.
IVF_DELETE_REM = 2
DOC_DELETE_REM = 2


def _q300_oracle() -> str:
    return f"""
    WITH {_ANN_PARAMS_SQL},
    cent AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
                  WHERE vec_id < (SELECT n_cent FROM ann_p)),
    scored AS (
      SELECT e.vec_id, e.embedding, c.cid,
             {_COS_SQL.format(a='e.embedding', b='c.ce')} AS cs
      FROM embeddings e CROSS JOIN cent c),
    cells AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT vec_id, embedding, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
        FROM scored) t
      WHERE rn = 1),
    comp AS (
      SELECT cell, vec_id,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)
                        * {IVF_SUM_SCALE} + 0.5) AS BIGINT) AS qv
      FROM cells),
    chk AS (SELECT cell,
                   SUM(CASE WHEN vec_id % {IVF_DELTA_MOD} = {IVF_DELETE_REM}
                            THEN 0 ELSE qv END) AS centroid_checksum
            FROM comp GROUP BY 1),
    cnt AS (
      SELECT cell,
             SUM(CASE WHEN vec_id % {IVF_DELTA_MOD} = {IVF_DELTA_REM}
                      THEN 0 ELSE 1 END) AS n_base,
             SUM(CASE WHEN vec_id % {IVF_DELTA_MOD} = {IVF_DELTA_REM}
                      THEN 1 ELSE 0 END) AS n_ins,
             SUM(CASE WHEN vec_id % {IVF_DELTA_MOD} = {IVF_DELETE_REM}
                      THEN 1 ELSE 0 END) AS n_del
      FROM cells GROUP BY 1)
    SELECT CAST(cnt.cell AS BIGINT) AS cell,
           CAST(n_base AS BIGINT) AS n_base,
           CAST(n_ins AS BIGINT) AS n_ins,
           CAST(n_del AS BIGINT) AS n_del,
           CAST(n_base + n_ins - n_del AS BIGINT) AS n_live,
           CAST(centroid_checksum AS BIGINT) AS centroid_checksum,
           CAST(1 AS BIGINT) AS matches_full
    FROM cnt JOIN chk ON chk.cell = cnt.cell
    WHERE n_base + n_ins - n_del > 0
    """


@query("q300_ivf_delete_refresh", oracle=_q300_oracle())
def q300_ivf_delete_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index maintenance with DELETIONS — the retraction half of
    q282's IVM contract (VERDICT r10 ask #2): at one maintenance tick
    an insert delta arrives (vec_id % {IVF_DELTA_MOD} ==
    {IVF_DELTA_REM}) AND a deletion batch leaves (vec_id %
    {IVF_DELTA_MOD} == {IVF_DELETE_REM}, e.g. q298's manifest ids).
    Because the per-cell centroid state is SIGNED integer partials
    (count, Σ quantized component), retraction is algebraically free:
    merged = base + insert − delete, no rebuild, no re-scan of the
    base corpus.  A cell whose members are all deleted retracts to
    (0, 0) and drops from the live state.

    The audit IS the result: an independent full recompute over the
    LIVE corpus (all vectors minus the deletion batch) must equal the
    merged state bit-exactly per (cell, component) — ``matches_full``
    is ONE GLOBAL MIN over every component cell, attached to every
    output row (the q302 pattern), including cells that retracted to
    zero (those must be ABSENT from the live recompute and emit no
    report row, but still participate in the audit).

    Parity: assignment is q47's argmax (cosine, lowest-cid tie);
    components quantize with floor(x·{IVF_SUM_SCALE}+0.5); everything
    else is integer counts/sums and exact subtraction.

    Scale shape: ONE map-only assignment pass streaming into ONE
    fused conditional aggregation (base/insert/delete/full partials
    are conditional sums of the same frame — r13, guide §2.4);
    partials are map-side-combinable (cell, component) integer cells
    bounded by n_cent·dim; deletion costs one more conditional column,
    never a corpus re-index.
    """
    from pyspark.storagelevel import StorageLevel

    n_cent, _, _ = ann_params(corpus_size(spark, sf_dir))
    is_ins = (F.col("vec_id") % IVF_DELTA_MOD) == IVF_DELTA_REM
    is_del = (F.col("vec_id") % IVF_DELTA_MOD) == IVF_DELETE_REM
    qcells = ivf_cell_assignment(spark, sf_dir, n_cent).select(
        "vec_id",
        "cell",
        is_ins.alias("i"),
        is_del.alias("x"),
        F.transform(
            F.col("embedding"),
            lambda v: F.floor(
                v.cast("double") * IVF_SUM_SCALE + F.lit(0.5)
            ).cast("long"),
        ).alias("qe"),
    )
    comp = qcells.select("cell", "i", "x", F.posexplode("qe").alias("pos", "qv"))

    # Optimization r13 (guide §2.4/§1.2 — VERDICT r12 ask #6): the four
    # filtered partial aggregations (base/insert/delete/full) of one
    # exploded frame fuse into ONE conditional groupBy — 4 Exchanges +
    # 3 full-outer merges -> 1 Exchange; the assignment pass streams
    # straight into it, so its persist is gone too.  The audit keeps
    # its independent EXPRESSION paths: merged = base + ins − del
    # slices vs full = the unconditional ~x sum/count.
    z = F.lit(0)
    agg = comp.groupBy("cell", "pos").agg(
        F.sum(F.when(~F.col("i"), F.col("qv"))).alias("s_b"),
        F.count(F.when(~F.col("i"), F.lit(1))).alias("n_b"),
        F.sum(F.when(F.col("i"), F.col("qv"))).alias("s_i"),
        F.count(F.when(F.col("i"), F.lit(1))).alias("n_i"),
        F.sum(F.when(F.col("x"), F.col("qv"))).alias("s_x"),
        F.count(F.when(F.col("x"), F.lit(1))).alias("n_x"),
        F.sum(F.when(~F.col("x"), F.col("qv"))).alias("s_f"),
        F.count(F.when(~F.col("x"), F.lit(1))).alias("n_f"),
    )
    s_m = (
        F.coalesce("s_b", z) + F.coalesce("s_i", z) - F.coalesce("s_x", z)
    )
    audit = agg.select(
        "cell",
        "pos",
        s_m.alias("s_m"),
        F.col("n_b").alias("nb"),
        F.col("n_i").alias("ni"),
        F.col("n_x").alias("nx"),
        (
            (s_m == F.coalesce("s_f", z))
            & (F.col("n_b") + F.col("n_i") - F.col("n_x") == F.col("n_f"))
        )
        .cast("long")
        .alias("ok"),
    )
    per_cell = audit.groupBy(F.col("cell").cast("long").alias("cell")).agg(
        F.max("nb").cast("long").alias("n_base"),
        F.max("ni").cast("long").alias("n_ins"),
        F.max("nx").cast("long").alias("n_del"),
        (F.max("nb") + F.max("ni") - F.max("nx")).cast("long").alias("n_live"),
        F.sum("s_m").cast("long").alias("centroid_checksum"),
        F.min("ok").cast("long").alias("ok"),
    )
    from pyspark.storagelevel import StorageLevel as _SL

    per_cell = per_cell.persist(_SL.MEMORY_AND_DISK)
    # GLOBAL audit flag over EVERY cell — including cells that
    # retracted to zero, which the live report below excludes (the
    # q302 pattern; a broken retraction leaving residue in a
    # fully-deleted cell must fail matches_full even though that cell
    # has no output row)
    glob = per_cell.agg(
        F.coalesce(F.min("ok"), F.lit(1)).cast("long").alias("matches_full")
    )
    return (
        per_cell.filter(F.col("n_live") > 0)
        .drop("ok")
        .crossJoin(F.broadcast(glob))
    )


# ---------------------------------------------------------------------------
# q301 — MinHash-LSH index maintenance with DELETIONS (pair retraction)
# ---------------------------------------------------------------------------


def _q301_oracle() -> str:
    sig_cols = ", ".join(
        f"list_min(list_transform(hp, p -> p.h1 + {i} * p.h2)) AS m{i}"
        for i in range(MINHASH_H)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS key FROM sig".format(
            b=b,
            key=" || '|' || ".join(
                f"CAST(m{b * LSH_R + r} AS VARCHAR)" for r in range(LSH_R)
            ),
        )
        for b in range(LSH_B)
    )
    return f"""
    WITH docs AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
    hp AS (SELECT doc_id, sh,
           list_transform(list_transform(sh, s -> md5(s)),
             h -> {{'h1': ('0x' || substr(h, 1, 15))::BIGINT,
                    'h2': ('0x' || substr(h, 17, 8))::BIGINT}}) AS hp
           FROM docs),
    sig AS (SELECT doc_id, {sig_cols} FROM hp),
    bands AS ({band_selects}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    ver AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c
      JOIN docs da ON da.doc_id = c.doc_a
      JOIN docs db ON db.doc_id = c.doc_b
      WHERE len(list_intersect(da.sh, db.sh)) * 1.0
              / len(list_distinct(list_concat(da.sh, db.sh))) >= {JACCARD_T}),
    f AS (
      SELECT doc_a, doc_b,
             CASE WHEN doc_a % {DOC_DELTA_MOD} = {DOC_DELTA_REM}
                    OR doc_b % {DOC_DELTA_MOD} = {DOC_DELTA_REM}
                  THEN 1 ELSE 0 END AS ins,
             CASE WHEN doc_a % {DOC_DELTA_MOD} = {DOC_DELETE_REM}
                    OR doc_b % {DOC_DELTA_MOD} = {DOC_DELETE_REM}
                  THEN 1 ELSE 0 END AS del_p
      FROM ver)
    SELECT CAST(COALESCE(SUM(CASE WHEN ins = 0 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_base_pairs,
           CAST(COALESCE(SUM(CASE WHEN ins = 0 AND del_p = 1 THEN 1 ELSE 0 END),
                0) AS BIGINT) AS n_retracted,
           CAST(COALESCE(SUM(CASE WHEN ins = 1 AND del_p = 0 THEN 1 ELSE 0 END),
                0) AS BIGINT) AS n_delta_pairs,
           CAST(COALESCE(SUM(CASE WHEN del_p = 0 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_incremental,
           CAST(COALESCE(SUM(CASE WHEN del_p = 0 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_full,
           CAST(1 AS BIGINT) AS matches_full
    FROM f
    """


@query("q301_lsh_delete_refresh", oracle=_q301_oracle())
def q301_lsh_delete_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH index maintenance with DELETIONS — the retraction
    half of q284's IVM contract (VERDICT r10 ask #2): at one tick the
    insert delta (doc_id % {DOC_DELTA_MOD} == {DOC_DELTA_REM}) arrives
    AND a deletion batch (doc_id % {DOC_DELTA_MOD} == {DOC_DELETE_REM})
    leaves.  The stored pair set retracts every pair touching a deleted
    doc (an id-keyed filter — pair retraction needs no re-shingling),
    then unions the delta-involving pairs among surviving docs; the
    refreshed set must equal a from-scratch rebuild over the LIVE
    corpus only.

    The audit is structural, not circular: the surviving-base and
    added-delta sets derive from TWO independent bucket builds
    (base-only bands, all bands) while ``n_full`` derives from a THIRD
    (live-only bands) — ``matches_full`` certifies pair-by-pair set
    equality, which holds only because per-doc bucketing plus lossless
    ``chunk_buckets`` makes pair discovery independent of which other
    docs share the corpus.

    Parity: set semantics + integer counts; verification keeps
    Jaccard ≥ {JACCARD_T} (same double both engines).

    Scale shape: ONE shingle pass and ONE signature pass (persisted —
    all three bucket builds filter the same band rows); bucket
    collapses combine map-side; oversized buckets chunk-distribute;
    each distinct candidate pair verifies once; retraction itself is a
    map-side id-mod filter on the bounded pair table.
    """
    from pyspark.storagelevel import StorageLevel

    docs = (
        _fanout(spark, table(spark, sf_dir, "documents"))
        .select("doc_id", _shingles(F.col("text")).alias("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bands = (
        _minhash_bands(docs.select("doc_id", "sh"))
        .withColumn("ins", (F.col("doc_id") % DOC_DELTA_MOD) == DOC_DELTA_REM)
        .withColumn("dl", (F.col("doc_id") % DOC_DELTA_MOD) == DOC_DELETE_REM)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def bucket_pairs(band_rows: DataFrame, name: str) -> DataFrame:
        bucketed = (
            band_rows.groupBy("band", "key")
            .agg(F.collect_list("doc_id").alias("ids"))
            .filter(F.size("ids") >= 2)
        )
        return (
            blocking.chunk_buckets(bucketed, name, "ids")
            .select(F.explode(blocking.chunk_pair_structs()).alias("p"))
            .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .distinct()
        )

    base_pairs = bucket_pairs(
        bands.filter(~F.col("ins")), "q301_lsh_delete_refresh_base"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    all_pairs = bucket_pairs(
        bands, "q301_lsh_delete_refresh_all"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    live_pairs = bucket_pairs(
        bands.filter(~F.col("dl")), "q301_lsh_delete_refresh_live"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # all-docs buckets generate a superset of both filtered builds
    # (per-doc bucketing + lossless chunking), so all_pairs IS the
    # candidate set; verify each distinct pair exactly once
    sets = docs.select("doc_id", "sh")
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    ver = (
        all_pairs.join(
            sets.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a")),
            "a",
        )
        .join(
            sets.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b")),
            "b",
        )
        .filter(jac >= JACCARD_T)
        .select("a", "b")
    )
    is_ins = lambda c: (F.col(c) % DOC_DELTA_MOD) == DOC_DELTA_REM  # noqa: E731
    is_del = lambda c: (F.col(c) % DOC_DELTA_MOD) == DOC_DELETE_REM  # noqa: E731
    flags = (
        ver.join(base_pairs.withColumn("in_b", F.lit(1)), ["a", "b"], "left")
        .join(live_pairs.withColumn("in_f", F.lit(1)), ["a", "b"], "left")
        .select(
            F.coalesce("in_b", F.lit(0)).alias("in_b"),
            F.coalesce("in_f", F.lit(0)).alias("in_f"),
            (is_ins("a") | is_ins("b")).cast("int").alias("ins_p"),
            (is_del("a") | is_del("b")).cast("int").alias("del_p"),
        )
    )
    surv = (F.col("in_b") == 1) & (F.col("del_p") == 0)
    added = (F.col("ins_p") == 1) & (F.col("del_p") == 0)
    inc = (surv | added).cast("long")
    z = F.lit(0)
    return flags.agg(
        F.coalesce(F.sum("in_b"), z).cast("long").alias("n_base_pairs"),
        F.coalesce(F.sum(((F.col("in_b") == 1) & (F.col("del_p") == 1)).cast("long")), z)
        .cast("long")
        .alias("n_retracted"),
        F.coalesce(F.sum(added.cast("long")), z).cast("long").alias("n_delta_pairs"),
        F.coalesce(F.sum(inc), z).cast("long").alias("n_incremental"),
        F.coalesce(F.sum("in_f"), z).cast("long").alias("n_full"),
        F.coalesce(F.min((inc == F.col("in_f")).cast("long")), F.lit(1))
        .cast("long")
        .alias("matches_full"),
    )


# ---------------------------------------------------------------------------
# q302 — BM25 stats maintenance with DELETIONS (df/cf retraction)
# ---------------------------------------------------------------------------


def _q302_oracle() -> str:
    return f"""
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
               FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf,
                  doc_id % {DOC_DELTA_MOD} = {DOC_DELTA_REM} AS ins,
                  doc_id % {DOC_DELTA_MOD} = {DOC_DELETE_REM} AS del_d
           FROM t GROUP BY 1, 2),
    base AS (SELECT term, COUNT(*) AS df_b, SUM(tf) AS cf_b
             FROM tf WHERE NOT ins GROUP BY 1),
    insd AS (SELECT term, COUNT(*) AS df_i, SUM(tf) AS cf_i
             FROM tf WHERE ins GROUP BY 1),
    deld AS (SELECT term, COUNT(*) AS df_x, SUM(tf) AS cf_x
             FROM tf WHERE del_d GROUP BY 1),
    merged AS (
      SELECT term, df_base, df_ins, df_del,
             df_base + df_ins - df_del AS df_merged,
             cf_base + cf_ins - cf_del AS cf_merged
      FROM (
        SELECT COALESCE(b.term, i.term, x.term) AS term,
               COALESCE(df_b, 0) AS df_base, COALESCE(df_i, 0) AS df_ins,
               COALESCE(df_x, 0) AS df_del,
               COALESCE(cf_b, 0) AS cf_base, COALESCE(cf_i, 0) AS cf_ins,
               COALESCE(cf_x, 0) AS cf_del
        FROM base b
        FULL OUTER JOIN insd i ON b.term = i.term
        FULL OUTER JOIN deld x ON COALESCE(b.term, i.term) = x.term)
      WHERE df_base + df_ins - df_del > 0),
    full_r AS (SELECT term, COUNT(*) AS df_f, SUM(tf) AS cf_f
               FROM tf WHERE NOT del_d GROUP BY 1),
    audit AS (
      SELECT MIN(CASE WHEN m.df_merged = f.df_f AND m.cf_merged = f.cf_f
                      THEN 1 ELSE 0 END) AS ok
      FROM merged m FULL OUTER JOIN full_r f ON m.term = f.term)
    SELECT m.term,
           CAST(m.df_base AS BIGINT) AS df_base,
           CAST(m.df_ins AS BIGINT) AS df_ins,
           CAST(m.df_del AS BIGINT) AS df_del,
           CAST(m.df_merged AS BIGINT) AS df_merged,
           CAST(m.cf_merged AS BIGINT) AS cf_merged,
           CAST(audit.ok AS BIGINT) AS matches_full
    FROM merged m CROSS JOIN audit
    ORDER BY m.df_merged DESC, m.term LIMIT {BMIVM_TOP}
    """


@query("q302_bm25_stats_delete_refresh", oracle=_q302_oracle())
def q302_bm25_stats_delete_refresh(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BM25/lexical statistics maintenance with DELETIONS — the
    retraction half of q293's IVM contract (VERDICT r10 ask #2): at one
    tick the insert delta (doc_id % {DOC_DELTA_MOD} == {DOC_DELTA_REM})
    tokenizes its documents and a deletion batch (doc_id %
    {DOC_DELTA_MOD} == {DOC_DELETE_REM}) retracts ITS term
    contributions — both as integer partial merges: df/cf = base +
    insert − delete, never a re-scan of the base corpus.  A term whose
    document frequency retracts to zero is TOMBSTONED out of the index
    (the live recompute cannot contain it), which is exactly the state
    transition additive-only maintenance can never produce.

    ``matches_full`` certifies the merged stats against an independent
    full recompute over the LIVE corpus across EVERY term (a global
    MIN, not just the reported rows).

    Parity: all integer counts; the top-{BMIVM_TOP} report ties on the
    term string.

    Scale shape: one explode → (doc, term) hash aggregate carrying the
    insert/delete flags, streaming into ONE fused conditional term
    aggregation (base/insert/delete/full partials as conditional sums
    — r13, guide §2.4); the report is TakeOrderedAndProject over the
    persisted bounded term table.  The deleted docs' contributions
    come from the SAME stored posting rows an inverted index already
    holds — retraction reads state, not the corpus.
    """
    from pyspark.storagelevel import StorageLevel

    docs = table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("ins", (F.col("doc_id") % DOC_DELTA_MOD) == DOC_DELTA_REM)
        .withColumn(
            "del_d", (F.col("doc_id") % DOC_DELTA_MOD) == DOC_DELETE_REM
        )
    )

    # Optimization r13 (guide §2.4/§1.2 — VERDICT r12 ask #6): the four
    # filtered partials fuse into ONE conditional groupBy(term); audit
    # independence stays per-expression (merged slices vs the
    # unconditional live count/sum); the posting rows stream into the
    # single aggregation, whose bounded term-level result is persisted
    # for the audit + report reads.
    z = F.lit(0)
    stats_all = (
        tf.groupBy("term")
        .agg(
            F.count(F.when(~F.col("ins"), F.lit(1))).alias("df_b"),
            F.sum(F.when(~F.col("ins"), F.col("tf"))).alias("cf_b"),
            F.count(F.when(F.col("ins"), F.lit(1))).alias("df_i"),
            F.sum(F.when(F.col("ins"), F.col("tf"))).alias("cf_i"),
            F.count(F.when(F.col("del_d"), F.lit(1))).alias("df_x"),
            F.sum(F.when(F.col("del_d"), F.col("tf"))).alias("cf_x"),
            F.count(F.when(~F.col("del_d"), F.lit(1))).alias("df_f"),
            F.sum(F.when(~F.col("del_d"), F.col("tf"))).alias("cf_f"),
        )
        .select(
            "term",
            F.col("df_b").alias("df_base"),
            F.col("df_i").alias("df_ins"),
            F.col("df_x").alias("df_del"),
            (F.col("df_b") + F.col("df_i") - F.col("df_x")).alias("df_merged"),
            (
                F.coalesce("cf_b", z) + F.coalesce("cf_i", z)
                - F.coalesce("cf_x", z)
            ).alias("cf_merged"),
            "df_f",
            "cf_f",
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    merged = stats_all.filter(F.col("df_merged") > 0)
    audit = stats_all.agg(
        F.min(
            (
                (F.col("df_merged") == F.col("df_f"))
                & (F.col("cf_merged") == F.coalesce("cf_f", z))
            ).cast("long")
        ).alias("ok")
    )
    top = (
        merged.crossJoin(F.broadcast(audit))
        .orderBy(F.col("df_merged").desc(), "term")
        .limit(BMIVM_TOP)
    )
    return top.select(
        "term",
        F.col("df_base").cast("long"),
        F.col("df_ins").cast("long"),
        F.col("df_del").cast("long"),
        F.col("df_merged").cast("long"),
        F.col("cf_merged").cast("long"),
        F.col("ok").cast("long").alias("matches_full"),
    )


# ---------------------------------------------------------------------------
# q303 — semantic cross-split decontamination (embedding-cosine screen
# of the train corpus against a fixed benchmark set)
# ---------------------------------------------------------------------------

SEMDECON_N = 64  # benchmark-set size (fixed, corpus-independent)
SEMDECON_T = 0.9  # rounded-cosine contamination floor


def _q303_oracle() -> str:
    cos = _COS_SQL.format(a="e.embedding", b="b.te")
    return f"""
    WITH b AS (SELECT vec_id AS tid, embedding AS te FROM embeddings
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
               LIMIT {SEMDECON_N}),
    s AS (
      SELECT e.vec_id, b.tid, (ROUND({cos}, 6) + 0.0) AS cs
      FROM embeddings e CROSS JOIN b
      WHERE NOT EXISTS (SELECT 1 FROM b bb WHERE bb.tid = e.vec_id)),
    r AS (
      SELECT vec_id, tid, cs,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cs DESC, tid) AS rn
      FROM s)
    SELECT CAST(vec_id AS BIGINT) AS train_id,
           CAST(tid AS BIGINT) AS matched_test_id,
           cs AS cos_sim,
           CAST(CASE WHEN cs >= {SEMDECON_T} THEN 1 ELSE 0 END AS BIGINT)
             AS contaminated
    FROM r WHERE rn = 1
    """


@query("q303_semantic_decontamination", oracle=_q303_oracle())
def q303_semantic_decontamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Semantic cross-split decontamination — the embedding-space
    counterpart of q109's shingle-based screen, and the decon step a
    training run performs against its EVAL BENCHMARKS: every train
    document scores its maximum cosine against a FIXED benchmark set
    ({SEMDECON_N} docs picked by deterministic md5 order — in
    production, the actual benchmark suite), and documents at or above
    {SEMDECON_T} are flagged ``contaminated`` for the q299-style drop
    step.  Lexical screens (q109) miss paraphrases and translations;
    the embedding screen is how those leak cases are caught
    (GPT-3/LLaMA-class decon, at the representation level).

    Output is one row per train document (best match, similarity,
    flag) — the per-doc audit a curation dashboard ranks; on the
    synthetic fixture the embeddings carry no train-benchmark overlap,
    so every flag is 0 (the healthy state) — the positive case is
    pinned by tests/test_deletion_lifecycle.py with a planted copy.

    Parity: cosine rounds to 6 dp before the argmax and the flag
    compare; the argmax ties to the lowest benchmark id (array_max
    over (cs, -tid) == ROW_NUMBER ORDER BY cs DESC, tid); benchmark
    selection orders by (md5(id), id) — identical bytes both engines.

    Scale shape: the benchmark set is CORPUS-INDEPENDENT (LIMIT
    {SEMDECON_N} — eval suites do not grow with the train corpus), so
    the screen is ONE map-only pass: broadcast the benchmark structs,
    per-row transform + array_max, zero shuffles beyond the
    TakeOrderedAndProject that picks the benchmark (materialized ONCE
    — it feeds both the broadcast row and the train-side anti-join) —
    the q45 broadcast discipline pointed at the decon problem.  At
    100 TB this is the cheapest possible shape: one tiny anti-join,
    no agg, no candidate explosion.
    """
    emb = table(spark, sf_dir, "embeddings")
    # materialize the tiny benchmark pick once — it feeds BOTH the
    # broadcast struct row and the train-side anti-join, and without
    # this the corpus-wide TakeOrdered pre-pass would run twice
    bench = local_checkpoint(
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id").limit(
            SEMDECON_N
        ),
        "q303 benchmark pick",
    )
    tb = bench.agg(
        F.collect_list(
            F.struct(F.col("vec_id").alias("tid"), F.col("embedding").alias("te"))
        ).alias("ts")
    )
    best = F.array_max(
        F.transform(
            F.col("ts"),
            lambda t: F.struct(
                dec(_cosine(F.col("embedding"), t["te"]), 6).alias("cs"),
                (-t["tid"]).alias("ntid"),
            ),
        )
    )
    train = _fanout(spark, emb).join(
        bench.select("vec_id"), "vec_id", "left_anti"
    )
    return (
        train.crossJoin(F.broadcast(tb))
        .select("vec_id", best.alias("b"))
        .select(
            F.col("vec_id").cast("long").alias("train_id"),
            (-F.col("b.ntid")).cast("long").alias("matched_test_id"),
            (F.col("b.cs") + F.lit(0.0)).alias("cos_sim"),
            (F.col("b.cs") >= SEMDECON_T).cast("long").alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# q304/q305 — PQ code-table maintenance (insert delta / deletion
# retraction) + q306 — codebook-staleness retrain trigger.  The fourth
# index family's IVM contract (VERDICT r11 ask #2): IVF (q282/q300),
# LSH (q284/q301) and BM25 (q293/q302) maintain incrementally; the PQ
# codes table was still rebuilt from scratch each run.
# ---------------------------------------------------------------------------

#: retrain trigger: flag a subspace when its live-corpus relative
#: distortion exceeds the base epoch's by this factor — the q178
#: reconstruction audit wired to a threshold (codebook-staleness alarm)
PQ_RETRAIN_RATIO = 1.25


def _q304_oracle() -> str:
    return f"""
    WITH {_pq_enc_sql()},
    f AS (SELECT vec_id, m, cid,
          CASE WHEN vec_id % {IVF_DELTA_MOD} = {IVF_DELTA_REM}
               THEN 1 ELSE 0 END AS ins
          FROM codes)
    SELECT CAST(m AS BIGINT) AS subspace, CAST(cid AS BIGINT) AS cid,
           CAST(SUM(1 - ins) AS BIGINT) AS n_base,
           CAST(SUM(ins) AS BIGINT) AS n_delta,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(vec_id) AS BIGINT) AS member_checksum,
           CAST(1 AS BIGINT) AS matches_full
    FROM f GROUP BY m, cid
    """


@query("q304_pq_codes_delta_refresh", oracle=_q304_oracle())
def q304_pq_codes_delta_refresh(
    spark: SparkSession, sf_dir: str, *, encode_backend: str | None = None
) -> DataFrame:
    """Incremental PQ code-table maintenance — the q282 IVM contract
    applied to q75's index: a delta ingest batch (vec_id %
    {IVF_DELTA_MOD} == {IVF_DELTA_REM}) encodes map-only against the
    SAME frozen broadcast codebook as the base build — never a
    re-encode of the base corpus, never a codebook retrain — and the
    maintained codes table is the UNION of the stored base codes and
    the delta batch's codes.  This is how a production ANN stack keeps
    PQ/IVF-PQ codes current between codebook retrains: the codebook is
    a frozen MODEL artifact; only new vectors pay an encode.

    The audit IS the result: an independent full re-encode over all
    vectors must equal the merged table per (subspace, centroid) cell
    — member count AND an id checksum, so a lost or double-counted
    vector fails instead of shipping — with ``matches_full`` ONE
    GLOBAL MIN attached to every row (the q300 pattern: a cell present
    in only one side still fails the audit even though it may emit no
    report row).

    Parity: the encode is q75's argmin-L2 (lowest-cid tie) against the
    first-{PQ_K}-vectors codebook; everything downstream is integer
    counts/sums.  The checksum accumulates in DECIMAL(38,0) before the
    final BIGINT cast (the q193/q288 overflow rule — SUM(vec_id) over
    a cell wraps int64 at ~1e10 ids x 1e9 rows).

    Scale shape: ONE map-only encode pass over base+delta (PQ_M codes
    per vector, the {PQ_M}-byte-per-vector structure) streaming into
    ONE fused conditional aggregation (base/delta/full partials are
    conditional sums of the same code rows — r13, guide §2.4);
    partials are map-side-combinable (m, cid) integer cells bounded by
    {PQ_M}x{PQ_K}; no window, no corpus-squared anything.
    """
    from pyspark.storagelevel import StorageLevel

    corpus = table(spark, sf_dir, "embeddings")
    is_ins = (F.col("vec_id") % IVF_DELTA_MOD) == IVF_DELTA_REM
    # encode backend (the q75/q112/q307 pattern): auto-selects the
    # bit-equal numpy Arrow encode (tests/test_numpy_backends.py pins
    # the codes); "jvm" keeps the HOF plan the oracle mirrors.
    if encode_backend is None:
        encode_backend = "numpy" if _numpy_available() else "jvm"
    if encode_backend == "numpy":
        coded = _pq_encode_cfg_numpy(
            spark, _fanout(spark, corpus), PQ_M, PQ_D, False, cb_source=corpus
        )
    else:
        coded = (
            _fanout(spark, corpus)
            .crossJoin(F.broadcast(_pq_codebook_row(corpus)))
            .select("vec_id", _pq_codes_col().alias("codes"))
        )
    rows = coded.select(
        "vec_id", is_ins.alias("i"), F.posexplode("codes").alias("m", "cid")
    )

    # Optimization r13 (guide §2.4/§1.2 — VERDICT r12 ask #6): the
    # base/delta/full partials fuse into ONE conditional groupBy of the
    # exploded code rows (3 Exchanges + 2 full-outer merges -> 1
    # Exchange; the encode streams straight into it, so its persist is
    # gone).  The audit keeps independent EXPRESSION paths: merged =
    # base-slice + delta-slice vs full = the unconditional sum/count.
    zc = F.lit(0).cast("decimal(38,0)")
    dec_id = F.col("vec_id").cast("decimal(38,0)")
    agg = rows.groupBy("m", "cid").agg(
        F.count(F.when(~F.col("i"), F.lit(1))).alias("n_b"),
        F.sum(F.when(~F.col("i"), dec_id)).alias("c_b"),
        F.count(F.when(F.col("i"), F.lit(1))).alias("n_i"),
        F.sum(F.when(F.col("i"), dec_id)).alias("c_i"),
        F.count("*").alias("n_f"),
        F.sum(dec_id).alias("c_f"),
    )
    c_m = F.coalesce("c_b", zc) + F.coalesce("c_i", zc)
    audit = agg.select(
        "m",
        "cid",
        F.col("n_b").alias("nb"),
        F.col("n_i").alias("ni"),
        c_m.alias("c_m"),
        (
            c_m.eqNullSafe(F.coalesce("c_f", zc))
            & (F.col("n_b") + F.col("n_i") == F.col("n_f"))
        )
        .cast("long")
        .alias("ok"),
    )
    audit = audit.persist(StorageLevel.MEMORY_AND_DISK)
    glob = audit.agg(
        F.coalesce(F.min("ok"), F.lit(1)).cast("long").alias("matches_full")
    )
    return audit.crossJoin(F.broadcast(glob)).select(
        F.col("m").cast("long").alias("subspace"),
        F.col("cid").cast("long").alias("cid"),
        F.col("nb").cast("long").alias("n_base"),
        F.col("ni").cast("long").alias("n_delta"),
        (F.col("nb") + F.col("ni")).cast("long").alias("n_total"),
        F.col("c_m").cast("long").alias("member_checksum"),
        "matches_full",
    )


def _q305_oracle() -> str:
    return f"""
    WITH {_pq_enc_sql()},
    f AS (SELECT vec_id, m, cid,
          CASE WHEN vec_id % {IVF_DELTA_MOD} = {IVF_DELTA_REM}
               THEN 1 ELSE 0 END AS ins,
          CASE WHEN vec_id % {IVF_DELTA_MOD} = {IVF_DELETE_REM}
               THEN 1 ELSE 0 END AS del_f
          FROM codes),
    g AS (SELECT m, cid,
          SUM(1 - ins) AS n_base, SUM(ins) AS n_ins, SUM(del_f) AS n_del,
          SUM(CASE WHEN del_f = 0 THEN vec_id ELSE 0 END) AS member_checksum
          FROM f GROUP BY m, cid)
    SELECT CAST(m AS BIGINT) AS subspace, CAST(cid AS BIGINT) AS cid,
           CAST(n_base AS BIGINT) AS n_base,
           CAST(n_ins AS BIGINT) AS n_ins,
           CAST(n_del AS BIGINT) AS n_del,
           CAST(n_base + n_ins - n_del AS BIGINT) AS n_live,
           CAST(member_checksum AS BIGINT) AS member_checksum,
           CAST(1 AS BIGINT) AS matches_full
    FROM g WHERE n_base + n_ins - n_del > 0
    """


@query("q305_pq_codes_delete_refresh", oracle=_q305_oracle())
def q305_pq_codes_delete_refresh(
    spark: SparkSession, sf_dir: str, *, encode_backend: str | None = None
) -> DataFrame:
    """PQ code-table maintenance with DELETIONS — the retraction half
    of q304's contract (the q300/q301/q302 discipline on the fourth
    index family): at one maintenance tick an insert delta arrives
    (vec_id % {IVF_DELTA_MOD} == {IVF_DELTA_REM}) AND a deletion batch
    leaves (vec_id % {IVF_DELTA_MOD} == {IVF_DELETE_REM}, e.g. q298's
    manifest ids).  Retraction is an ID-KEYED DROP of the stored code
    rows — codes carry no cross-vector state, so deletion never
    touches the codebook, never re-encodes, never reads the corpus.
    Note the codebook keeps centroids sourced from since-DELETED
    vectors: it is a frozen model artifact, not live data — exactly
    the drift q306's staleness trigger watches.

    Audit: an independent re-encode over the LIVE corpus (all minus
    the deletion batch) must equal the maintained live table per
    (subspace, centroid) — count and DECIMAL(38,0)-accumulated id
    checksum — with ``matches_full`` one GLOBAL MIN over every cell
    including cells that retracted to zero (absent from the report,
    still audited — the q300 rule).

    Scale shape: the same single encode pass as q304 streaming into
    ONE fused conditional aggregation (never a second corpus read);
    bounded (m, cid) partial tables; deletion cost is one more
    conditional column — at serving time it is a tombstone anti-join
    on the O(corpus) codes table, the PqIndexMaintainer path.
    """
    from pyspark.storagelevel import StorageLevel

    corpus = table(spark, sf_dir, "embeddings")
    is_ins = (F.col("vec_id") % IVF_DELTA_MOD) == IVF_DELTA_REM
    is_del = (F.col("vec_id") % IVF_DELTA_MOD) == IVF_DELETE_REM
    # encode backend (the q75/q112/q307 pattern): auto-selects the
    # bit-equal numpy Arrow encode; "jvm" keeps the HOF oracle twin.
    if encode_backend is None:
        encode_backend = "numpy" if _numpy_available() else "jvm"
    if encode_backend == "numpy":
        coded = _pq_encode_cfg_numpy(
            spark, _fanout(spark, corpus), PQ_M, PQ_D, False, cb_source=corpus
        )
    else:
        coded = (
            _fanout(spark, corpus)
            .crossJoin(F.broadcast(_pq_codebook_row(corpus)))
            .select("vec_id", _pq_codes_col().alias("codes"))
        )
    rows = coded.select(
        "vec_id",
        is_ins.alias("i"),
        is_del.alias("x"),
        F.posexplode("codes").alias("m", "cid"),
    )

    # One fused conditional groupBy replaces the four filtered partials
    # + three full-outer merges (guide §2.4/§1.2 — VERDICT r12 ask #6);
    # audit independence stays per-expression (merged slices vs the
    # unconditional live sum/count).
    zc = F.lit(0).cast("decimal(38,0)")
    dec_id = F.col("vec_id").cast("decimal(38,0)")
    agg = rows.groupBy("m", "cid").agg(
        F.count(F.when(~F.col("i"), F.lit(1))).alias("n_b"),
        F.sum(F.when(~F.col("i"), dec_id)).alias("c_b"),
        F.count(F.when(F.col("i"), F.lit(1))).alias("n_i"),
        F.sum(F.when(F.col("i"), dec_id)).alias("c_i"),
        F.count(F.when(F.col("x"), F.lit(1))).alias("n_x"),
        F.sum(F.when(F.col("x"), dec_id)).alias("c_x"),
        F.count(F.when(~F.col("x"), F.lit(1))).alias("n_f"),
        F.sum(F.when(~F.col("x"), dec_id)).alias("c_f"),
    )
    c_m = (
        F.coalesce("c_b", zc) + F.coalesce("c_i", zc) - F.coalesce("c_x", zc)
    )
    audit = agg.select(
        "m",
        "cid",
        F.col("n_b").alias("nb"),
        F.col("n_i").alias("ni"),
        F.col("n_x").alias("nx"),
        c_m.alias("c_m"),
        (
            c_m.eqNullSafe(F.coalesce("c_f", zc))
            & (
                F.col("n_b") + F.col("n_i") - F.col("n_x") == F.col("n_f")
            )
        )
        .cast("long")
        .alias("ok"),
    )
    audit = audit.persist(StorageLevel.MEMORY_AND_DISK)
    glob = audit.agg(
        F.coalesce(F.min("ok"), F.lit(1)).cast("long").alias("matches_full")
    )
    return (
        audit.filter(F.col("nb") + F.col("ni") - F.col("nx") > 0)
        .crossJoin(F.broadcast(glob))
        .select(
            F.col("m").cast("long").alias("subspace"),
            F.col("cid").cast("long").alias("cid"),
            F.col("nb").cast("long").alias("n_base"),
            F.col("ni").cast("long").alias("n_ins"),
            F.col("nx").cast("long").alias("n_del"),
            (F.col("nb") + F.col("ni") - F.col("nx"))
            .cast("long")
            .alias("n_live"),
            F.col("c_m").cast("long").alias("member_checksum"),
            "matches_full",
        )
    )


def _q306_oracle() -> str:
    d = PQ_D
    drift = "(ml / el) / (mb / eb)"
    return f"""
    WITH {_pq_enc_sql()},
    eng AS (SELECT e.vec_id, mm.m,
            list_reduce(list_transform(generate_series(1, {d}),
              i -> e.embedding[mm.m*{d}+i]::DOUBLE
                   * e.embedding[mm.m*{d}+i]::DOUBLE),
              (a, b) -> a + b) AS energy
            FROM embeddings e CROSS JOIN ms mm),
    j AS (SELECT c.vec_id, c.m, c.dist, eng.energy,
          CASE WHEN c.vec_id % {IVF_DELTA_MOD} = {IVF_DELTA_REM}
               THEN 1 ELSE 0 END AS ins,
          CASE WHEN c.vec_id % {IVF_DELTA_MOD} = {IVF_DELETE_REM}
               THEN 1 ELSE 0 END AS del_f
          FROM codes c JOIN eng ON eng.vec_id = c.vec_id AND eng.m = c.m),
    b AS (SELECT m, COUNT(*) AS n_base, AVG(dist) AS mb, AVG(energy) AS eb
          FROM j WHERE ins = 0 GROUP BY m),
    l AS (SELECT m, COUNT(*) AS n_live, AVG(dist) AS ml, AVG(energy) AS el
          FROM j WHERE del_f = 0 GROUP BY m)
    SELECT CAST(b.m AS BIGINT) AS subspace,
           CAST(n_base AS BIGINT) AS n_base,
           CAST(n_live AS BIGINT) AS n_live,
           {sql_dec('mb', 6)} AS mse_base,
           {sql_dec('ml', 6)} AS mse_live,
           {sql_dec('mb / eb', 6)} AS rel_base,
           {sql_dec('ml / el', 6)} AS rel_live,
           {sql_dec(drift, 6)} AS drift_ratio,
           CAST(CASE WHEN {sql_dec(drift, 6)} > {PQ_RETRAIN_RATIO}
                THEN 1 ELSE 0 END AS BIGINT) AS retrain
    FROM b JOIN l ON b.m = l.m
    """


@query("q306_pq_codebook_staleness", oracle=_q306_oracle())
def q306_pq_codebook_staleness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PQ codebook-staleness retrain trigger — q178's reconstruction
    audit WIRED to the q304/q305 maintenance loop (VERDICT r11 ask #2's
    last clause): per subspace, the relative distortion (mean
    reconstruction error / mean signal energy) of the BASE epoch (the
    corpus the codebook was frozen against — everything except the
    later-arriving insert delta) is compared with the LIVE corpus
    (after the tick's inserts AND deletes), and a subspace whose live
    relative distortion exceeds {PQ_RETRAIN_RATIO}x the base epoch's
    raises ``retrain`` — the codebook-staleness alarm that schedules a
    retrain + re-encode in a production PQ deployment, instead of
    serving a drifted codebook until recall quietly decays.  On the
    stationary synthetic fixture every flag is 0 (the healthy state);
    the positive case is pinned by tests with a planted drifted batch.

    Parity: the encode is the shared q75 argmin (lowest-cid tie); the
    drift ratio divides UNROUNDED double averages and rounds once at 6
    dp on both engines; the flag compares the ROUNDED value, so both
    engines flag from identical bits.

    Scale shape: ONE map-only encode pass (the chosen code's distance
    IS the reconstruction error — no decode join), two filtered
    re-aggregations to {PQ_M} rows each, one {PQ_M}-row join; no
    window, no pair explosion — the audit costs one corpus scan
    regardless of index size.
    """
    corpus = table(spark, sf_dir, "embeddings")
    is_ins = (F.col("vec_id") % IVF_DELTA_MOD) == IVF_DELTA_REM
    is_del = (F.col("vec_id") % IVF_DELTA_MOD) == IVF_DELETE_REM
    rows = (
        _fanout(spark, corpus)
        .crossJoin(F.broadcast(_pq_codebook_row(corpus)))
        .select(
            is_ins.alias("i"),
            is_del.alias("x"),
            F.explode(_pq_err_energy_col()).alias("r"),
        )
        .select("i", "x", F.col("r.m").alias("m"), "r.err", "r.energy")
    )
    base = rows.filter(~F.col("i")).groupBy("m").agg(
        F.count("*").alias("n_base"),
        F.avg("err").alias("mb"),
        F.avg("energy").alias("eb"),
    )
    live = rows.filter(~F.col("x")).groupBy("m").agg(
        F.count("*").alias("n_live"),
        F.avg("err").alias("ml"),
        F.avg("energy").alias("el"),
    )
    drift = dec((F.col("ml") / F.col("el")) / (F.col("mb") / F.col("eb")), 6)
    return base.join(live, "m").select(
        F.col("m").cast("long").alias("subspace"),
        F.col("n_base").cast("long"),
        F.col("n_live").cast("long"),
        dec(F.col("mb"), 6).alias("mse_base"),
        dec(F.col("ml"), 6).alias("mse_live"),
        dec(F.col("mb") / F.col("eb"), 6).alias("rel_base"),
        dec(F.col("ml") / F.col("el"), 6).alias("rel_live"),
        drift.alias("drift_ratio"),
        (drift > F.lit(PQ_RETRAIN_RATIO)).cast("long").alias("retrain"),
    )


# ---------------------------------------------------------------------------
# q307 — IVF-PQ residual-code maintenance (insert delta + deletion
# retraction in one tick — the q304/q305 contract on q112's composition)
# ---------------------------------------------------------------------------


def _q307_oracle() -> str:
    d, dim = PQ_D, 64
    res = (
        f"list_transform(generate_series(1, {dim}), "
        "i -> embedding[i]::DOUBLE - ce[i]::DOUBLE)"
    )
    return f"""
    WITH {_ANN_PARAMS_SQL},
    cent AS (SELECT vec_id AS ccid, embedding AS ce FROM embeddings
                  WHERE vec_id < (SELECT n_cent FROM ann_p)),
    scored0 AS (
      SELECT e.vec_id, e.embedding, c.ccid,
             {_COS_SQL.format(a='e.embedding', b='c.ce')} AS cs
      FROM embeddings e CROSS JOIN cent c),
    cells AS (
      SELECT vec_id, embedding, ccid AS cell FROM (
        SELECT vec_id, embedding, ccid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, ccid) AS rn
        FROM scored0) t
      WHERE rn = 1),
    resid AS (
      SELECT cl.vec_id, cl.cell, {res} AS res
      FROM cells cl JOIN cent ON cent.ccid = cl.cell),
    cbres AS (SELECT vec_id AS cid, res AS re FROM resid WHERE vec_id < {PQ_K}),
    ms AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m),
    csub AS (SELECT cid, m, re[m*{d}+1 : m*{d}+{d}] AS cs FROM cbres, ms),
    enc0 AS (SELECT r.vec_id, r.cell, c.m, c.cid,
             list_reduce(list_transform(generate_series(1, {d}),
               i -> (r.res[c.m*{d}+i] - c.cs[i]) * (r.res[c.m*{d}+i] - c.cs[i])),
               (a, b) -> a + b) AS dist
             FROM resid r CROSS JOIN csub c),
    codes AS (SELECT vec_id, cell, m, cid FROM (
              SELECT vec_id, cell, m, cid,
                     ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                        ORDER BY dist, cid) AS rn
              FROM enc0) WHERE rn = 1),
    f AS (SELECT vec_id, cell, m, cid,
          CASE WHEN vec_id % {IVF_DELTA_MOD} = {IVF_DELTA_REM}
               THEN 1 ELSE 0 END AS ins,
          CASE WHEN vec_id % {IVF_DELTA_MOD} = {IVF_DELETE_REM}
               THEN 1 ELSE 0 END AS del_f
          FROM codes),
    g AS (SELECT cell, m, cid,
          SUM(1 - ins) AS nb, SUM(ins) AS ni, SUM(del_f) AS nx,
          SUM(CASE WHEN del_f = 0 THEN vec_id ELSE 0 END) AS chk
          FROM f GROUP BY cell, m, cid),
    r AS (SELECT m, cid,
          SUM(nb) AS n_base, SUM(ni) AS n_ins, SUM(nx) AS n_del,
          SUM(nb + ni - nx) AS n_live,
          SUM(CASE WHEN nb + ni - nx > 0 THEN 1 ELSE 0 END) AS n_cells_live,
          SUM(chk) AS member_checksum
          FROM g GROUP BY m, cid)
    SELECT CAST(m AS BIGINT) AS subspace, CAST(cid AS BIGINT) AS cid,
           CAST(n_base AS BIGINT) AS n_base,
           CAST(n_ins AS BIGINT) AS n_ins,
           CAST(n_del AS BIGINT) AS n_del,
           CAST(n_live AS BIGINT) AS n_live,
           CAST(n_cells_live AS BIGINT) AS n_cells_live,
           CAST(member_checksum AS BIGINT) AS member_checksum,
           CAST(1 AS BIGINT) AS matches_full
    FROM r WHERE n_live > 0
    """


@query("q307_ivfpq_codes_refresh", oracle=_q307_oracle())
def q307_ivfpq_codes_refresh(
    spark: SparkSession, sf_dir: str, *, encode_backend: str | None = None
) -> DataFrame:
    """IVF-PQ residual-code maintenance — the q304/q305 IVM contract on
    q112's production composition, closing the index-family book: at
    one maintenance tick an insert delta arrives (vec_id %
    {IVF_DELTA_MOD} == {IVF_DELTA_REM}) AND a deletion batch leaves
    (== {IVF_DELETE_REM}).  Delta vectors pay exactly TWO map-only
    passes against the FROZEN model artifacts — the broadcast coarse
    quantizer (cell + residual) and the broadcast residual codebook
    (codes) — never a retrain, never a base re-encode; deletion is an
    id-keyed drop of stored (cell, codes) rows.  Both artifacts keep
    centroids sourced from since-deleted vectors (frozen models, not
    live data) — the drift q306's staleness trigger watches.

    Audit: an independent re-encode over the LIVE corpus must equal
    the maintained live table per (cell, subspace, centroid) cell —
    count and DECIMAL(38,0)-accumulated id checksum — with
    ``matches_full`` one GLOBAL MIN over every cell including cells
    retracted to zero.  The report rolls up to (subspace, centroid)
    with ``n_cells_live`` carrying the coarse-cell structure (the
    bounded {PQ_M}x{PQ_K} table a dashboard reads).

    Parity: q112's exact expressions (q47 argmax assignment, residual
    subtraction in double, argmin-L2 lowest-cid codes); the encode
    backend auto-selects numpy (identical codes, pinned) with the
    pure-SQL JVM fallback the oracle mirrors.

    Scale shape: the same two broadcast passes as q112; the exploded
    code rows stream into ONE fused conditional aggregation
    (base/ins/del/full partials as conditional sums — r13, guide
    §2.4); partials are map-side-combinable (cell, m, cid) integer
    cells bounded by n_cent·{PQ_M}·{PQ_K}; no window over data, no
    pair joins — maintenance costs one encode of the DELTA plus
    bounded merges, the 100 TB contract.
    """
    from pyspark.storagelevel import StorageLevel

    corpus = table(spark, sf_dir, "embeddings")
    n_cent, _, _ = ann_params(corpus_size(spark, sf_dir))
    cent1 = _ivfpq_cents_row(corpus, n_cent)
    resid = (
        _fanout(spark, corpus)
        .crossJoin(F.broadcast(cent1))
        .withColumn("cell", _ivfpq_best_cell(F.col("embedding")))
        .select("vec_id", "cell", _ivfpq_res_col().alias("res"))
    )
    if encode_backend is None:
        encode_backend = "numpy" if _numpy_available() else "jvm"
    if encode_backend == "numpy":
        codes = _ivfpq_encode_numpy(spark, resid)
    else:
        codes = resid.crossJoin(F.broadcast(_ivfpq_res_codebook_row(resid))).select(
            "vec_id", "cell", _ivfpq_codes_col().alias("codes")
        )
    is_ins = (F.col("vec_id") % IVF_DELTA_MOD) == IVF_DELTA_REM
    is_del = (F.col("vec_id") % IVF_DELTA_MOD) == IVF_DELETE_REM
    rows = codes.select(
        "vec_id",
        "cell",
        is_ins.alias("i"),
        is_del.alias("x"),
        F.posexplode("codes").alias("m", "cid"),
    )

    # One fused conditional groupBy replaces the four filtered partials
    # + three full-outer merges (guide §2.4/§1.2 — VERDICT r12 ask #6);
    # audit independence stays per-expression (merged slices vs the
    # unconditional live sum/count); the encode streams straight into
    # the single aggregation, so the exploded-frame persist is gone.
    zc = F.lit(0).cast("decimal(38,0)")
    keys = ["cell", "m", "cid"]
    dec_id = F.col("vec_id").cast("decimal(38,0)")
    agg = rows.groupBy(*keys).agg(
        F.count(F.when(~F.col("i"), F.lit(1))).alias("n_b"),
        F.sum(F.when(~F.col("i"), dec_id)).alias("c_b"),
        F.count(F.when(F.col("i"), F.lit(1))).alias("n_i"),
        F.sum(F.when(F.col("i"), dec_id)).alias("c_i"),
        F.count(F.when(F.col("x"), F.lit(1))).alias("n_x"),
        F.sum(F.when(F.col("x"), dec_id)).alias("c_x"),
        F.count(F.when(~F.col("x"), F.lit(1))).alias("n_f"),
        F.sum(F.when(~F.col("x"), dec_id)).alias("c_f"),
    )
    c_m = (
        F.coalesce("c_b", zc) + F.coalesce("c_i", zc) - F.coalesce("c_x", zc)
    )
    audit = agg.select(
        *keys,
        F.col("n_b").alias("nb"),
        F.col("n_i").alias("ni"),
        F.col("n_x").alias("nx"),
        c_m.alias("c_m"),
        (
            c_m.eqNullSafe(F.coalesce("c_f", zc))
            & (
                F.col("n_b") + F.col("n_i") - F.col("n_x") == F.col("n_f")
            )
        )
        .cast("long")
        .alias("ok"),
    )
    audit = audit.persist(StorageLevel.MEMORY_AND_DISK)
    glob = audit.agg(
        F.coalesce(F.min("ok"), F.lit(1)).cast("long").alias("matches_full")
    )
    live = F.col("nb") + F.col("ni") - F.col("nx")
    report = (
        audit.groupBy("m", "cid")
        .agg(
            F.sum("nb").alias("n_base"),
            F.sum("ni").alias("n_ins"),
            F.sum("nx").alias("n_del"),
            F.sum(live).alias("n_live"),
            F.sum((live > 0).cast("long")).alias("n_cells_live"),
            F.sum("c_m").alias("chk"),
        )
        .filter(F.col("n_live") > 0)
    )
    return report.crossJoin(F.broadcast(glob)).select(
        F.col("m").cast("long").alias("subspace"),
        F.col("cid").cast("long").alias("cid"),
        F.col("n_base").cast("long"),
        F.col("n_ins").cast("long"),
        F.col("n_del").cast("long"),
        F.col("n_live").cast("long"),
        F.col("n_cells_live").cast("long"),
        F.col("chk").cast("long").alias("member_checksum"),
        "matches_full",
    )


# ---------------------------------------------------------------------------
# q308 — boilerplate STRIP (the apply half of q133; CCNet removal step)
# ---------------------------------------------------------------------------

#: strip threshold: a fixed-width segment repeated in >= this many
#: distinct docs OF THE SAME SOURCE is stripped.  2 (vs q133's report
#: threshold of 3) so the removal path is exercised at every fixture SF
#: (the sf0.001/sf0.01 corpora have zero 3-doc repeats at the SEG_W
#: alignment); production runs tune this per source.
BP_STRIP_MIN_DOCS = 2


def _q308_oracle() -> str:
    return f"""
    WITH words AS (SELECT doc_id, source, string_split(text, ' ') AS w
                   FROM documents),
    segs AS (
      SELECT doc_id, source, i,
             array_to_string(w[(i - 1) * {SEG_W} + 1 : i * {SEG_W}], ' ') AS seg,
             len(w[(i - 1) * {SEG_W} + 1 : i * {SEG_W}]) AS sw
      FROM words,
           unnest(generate_series(
             1, CAST(ceil(len(w) / {SEG_W}.0) AS INT))) AS t(i)),
    bp AS (SELECT source, seg FROM (
             SELECT source, seg, COUNT(DISTINCT doc_id) AS nd
             FROM segs GROUP BY 1, 2) WHERE nd >= {BP_STRIP_MIN_DOCS}),
    tagged AS (
      SELECT s.doc_id, s.source, s.i, s.seg, s.sw,
             (bp.seg IS NOT NULL) AS is_bp
      FROM segs s
      LEFT JOIN bp ON bp.source = s.source AND bp.seg = s.seg),
    per_doc AS (
      SELECT doc_id, source,
             string_agg(seg, ' ' ORDER BY i)
               FILTER (WHERE NOT is_bp) AS cleaned,
             COALESCE(SUM(sw) FILTER (WHERE NOT is_bp), 0) AS wk,
             COALESCE(SUM(sw) FILTER (WHERE is_bp), 0) AS wd,
             COUNT(*) AS st,
             SUM(CASE WHEN is_bp THEN 1 ELSE 0 END) AS sd
      FROM tagged GROUP BY 1, 2),
    joined AS (
      SELECT p.*, len(words.w) AS wt,
             CASE WHEN cleaned IS NULL OR cleaned = '' THEN 0
                  ELSE len(string_split(cleaned, ' ')) END AS ws
      FROM per_doc p JOIN words USING (doc_id))
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN sd > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_touched,
           CAST(SUM(st) AS BIGINT) AS segs_total,
           CAST(SUM(sd) AS BIGINT) AS segs_dropped,
           CAST(SUM(wt) AS BIGINT) AS words_total,
           CAST(SUM(wk) AS BIGINT) AS words_kept,
           CAST(SUM(wd) AS BIGINT) AS words_dropped,
           CAST(CASE WHEN SUM(wk) + SUM(wd) = SUM(wt)
                      AND SUM(ws) = SUM(wk)
                THEN 1 ELSE 0 END AS BIGINT) AS audit_ok
    FROM joined GROUP BY source
    """


def _strip_segments(docs: DataFrame) -> DataFrame:
    """q308's per-document core over an arbitrary (doc_id, source,
    text) frame: fixed-width segmentation, per-source boilerplate
    flagging (>= {BP_STRIP_MIN_DOCS} distinct docs), position-ordered
    re-stitch.  Returns one row per doc: (doc_id, source, wt raw words,
    st segments, sd segments dropped, wk kept words, wd dropped words,
    cleaned re-stitched text, ws re-stitched word count).  q308
    aggregates this per source; q311 feeds its stage-2 rewrite from it.
    """
    words = docs.select(
        "doc_id", "source", F.split(F.col("text"), " ").alias("w")
    )
    segs = words.select(
        "doc_id",
        "source",
        F.size("w").alias("wt"),
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.ceil(F.size(F.col("w")) / F.lit(SEG_W)).cast("int"),
                ),
                lambda i: F.slice(F.col("w"), (i - F.lit(1)) * SEG_W + 1, SEG_W),
            )
        ).alias("i", "seg_w"),
    ).select(
        "doc_id",
        "source",
        "wt",
        "i",
        F.concat_ws(" ", F.col("seg_w")).alias("seg"),
        F.size("seg_w").alias("sw"),
    )
    bp = (
        segs.select("source", "seg", "doc_id")
        .distinct()
        .groupBy("source", "seg")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= BP_STRIP_MIN_DOCS)
        .select("source", "seg", F.lit(True).alias("is_bp"))
    )
    tagged = segs.join(bp, ["source", "seg"], "left").withColumn(
        "is_bp", F.coalesce(F.col("is_bp"), F.lit(False))
    )
    kept_struct = F.when(~F.col("is_bp"), F.struct(F.col("i"), F.col("seg")))
    per_doc = tagged.groupBy("doc_id", "source", "wt").agg(
        F.count("*").alias("st"),
        F.sum(F.col("is_bp").cast("long")).alias("sd"),
        F.coalesce(
            F.sum(F.when(~F.col("is_bp"), F.col("sw"))), F.lit(0)
        ).alias("wk"),
        F.coalesce(
            F.sum(F.when(F.col("is_bp"), F.col("sw"))), F.lit(0)
        ).alias("wd"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s["seg"],
            ),
        ).alias("cleaned"),
    )
    return per_doc.withColumn(
        "ws",
        F.when(F.length("cleaned") == 0, F.lit(0)).otherwise(
            F.size(F.split(F.col("cleaned"), " "))
        ),
    )


@query("q308_boilerplate_strip", oracle=_q308_oracle())
def q308_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRIP the per-source boilerplate — the apply half of q133 (as
    q299 is to q298): every fixed-width word segment (q103/q133's unit)
    repeated in >= {BP_STRIP_MIN_DOCS} distinct docs of the same source
    is removed from every document carrying it, and the survivors are
    RE-STITCHED in original position order — the CCNet removal step
    that turns q133's report into a cleaned corpus.  Reported per
    source with a three-path conservation audit: ``audit_ok`` certifies
    (a) per-segment kept + dropped word counts == the raw pre-explode
    word count, and (b) the word count of the RE-STITCHED text == the
    per-segment kept sum — a mis-ordered stitch, a double-dropped
    segment, or a lossy segmentation fails the audit instead of
    silently shipping a corrupted corpus.

    Parity: segmentation, flagging and stitch order are integer/string
    exact on both sides; all outputs are integer counts.

    Scale shape: segment explode → (source, seg) hash agg on
    fixed-width segments (q133's shape) → one (source, seg)-keyed join
    tagging segments (the boilerplate list is the small side in any
    real corpus — AQE broadcasts it) → per-doc agg whose collect_list
    is bounded by the doc's own segment count (never cross-doc) → a
    per-source map-side-combinable rollup.  No window, no all-pairs.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    per_doc = _strip_segments(docs)
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum((F.col("sd") > 0).cast("long")).cast("long").alias("docs_touched"),
        F.sum("st").cast("long").alias("segs_total"),
        F.sum("sd").cast("long").alias("segs_dropped"),
        F.sum("wt").cast("long").alias("words_total"),
        F.sum("wk").cast("long").alias("words_kept"),
        F.sum("wd").cast("long").alias("words_dropped"),
        (
            (F.sum("wk") + F.sum("wd") == F.sum("wt"))
            & (F.sum("ws") == F.sum("wk"))
        )
        .cast("long")
        .alias("audit_ok"),
    )


# ---------------------------------------------------------------------------
# q310 helpers live further down; q309 — token-budget curriculum take
# ---------------------------------------------------------------------------

#: global training-token budget as a percent of the corpus
CURR_BUDGET_PCT = 50
#: per-source cap as a percent of the BUDGET (anti-domination)
CURR_SRC_CAP_PCT = 40
#: quality-bucket width in score micro-units (score_u in [0, 1e6] →
#: <= 21 buckets; the waterline admits WHOLE buckets, the granularity
#: at which the selection stays a bounded aggregate instead of a
#: corpus-wide ordered prefix)
CURR_BUCKET_W = 50_000


def _q309_oracle() -> str:
    return f"""
    WITH base AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
             (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                * 1000000)
               // CAST(len(string_split(text, ' ')) AS BIGINT) AS score_u
      FROM documents),
    budget AS (SELECT (SUM(toks) * {CURR_BUDGET_PCT}) // 100 AS b_total,
                      ((SUM(toks) * {CURR_BUDGET_PCT}) // 100
                        * {CURR_SRC_CAP_PCT}) // 100 AS src_cap
               FROM base),
    s1 AS (
      SELECT base.*, b_total, src_cap,
             SUM(toks) OVER (PARTITION BY source
                             ORDER BY score_u DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS src_cum
      FROM base CROSS JOIN budget),
    surv AS (SELECT *, score_u // {CURR_BUCKET_W} AS bkt
             FROM s1 WHERE src_cum <= src_cap),
    bcum AS (
      SELECT bkt,
             SUM(btoks) OVER (ORDER BY bkt DESC
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM (SELECT bkt, SUM(toks) AS btoks FROM surv GROUP BY 1)),
    wl AS (SELECT COALESCE(MIN(bkt), -1) AS waterline
           FROM bcum, budget WHERE cum <= b_total),
    taken AS (SELECT surv.* FROM surv, wl WHERE bkt >= waterline),
    g AS (SELECT COALESCE(SUM(toks), 0) AS g_toks FROM taken),
    srcs AS (SELECT source, COUNT(*) AS n_docs_src, SUM(toks) AS tokens_src
             FROM base GROUP BY 1),
    pt AS (SELECT source, COUNT(*) AS docs_taken, SUM(toks) AS tokens_taken
           FROM taken GROUP BY 1)
    SELECT s.source,
           CAST(s.n_docs_src AS BIGINT) AS n_docs_src,
           CAST(s.tokens_src AS BIGINT) AS tokens_src,
           CAST(COALESCE(pt.docs_taken, 0) AS BIGINT) AS docs_taken,
           CAST(COALESCE(pt.tokens_taken, 0) AS BIGINT) AS tokens_taken,
           CAST(COALESCE(pt.tokens_taken, 0) * 1000000
                  // budget.b_total AS BIGINT) AS budget_share_u,
           CAST(wl.waterline AS BIGINT) AS waterline_bucket,
           CAST(CASE WHEN g.g_toks <= budget.b_total
                      AND COALESCE(pt.tokens_taken, 0) <= budget.src_cap
                THEN 1 ELSE 0 END AS BIGINT) AS audit_ok
    FROM srcs s
    LEFT JOIN pt ON pt.source = s.source
    CROSS JOIN budget CROSS JOIN wl CROSS JOIN g
    """


def _curriculum_take(base: DataFrame):
    """q309's selection core over an arbitrary (doc_id, source, toks,
    score_u) frame: global budget + per-source cap from the frame's own
    totals, per-source maximal quality-ordered prefix, whole-bucket
    waterline.  Returns (taken, budget, wl, g): the taken per-doc frame
    (persisted, with bkt/src_cum attached), the 1-row budget frame
    (b_total, src_cap), the 1-row waterline frame, and the 1-row
    global-take aggregate.  q309 rolls these up per source; q311 feeds
    its final funnel stage from them."""
    from pyspark.storagelevel import StorageLevel

    budget = base.agg(F.sum("toks").alias("t")).select(
        F.expr(f"t * {CURR_BUDGET_PCT} div 100").alias("b_total"),
        F.expr(
            f"(t * {CURR_BUDGET_PCT} div 100) * {CURR_SRC_CAP_PCT} div 100"
        ).alias("src_cap"),
    )
    src_cum = F.sum("toks").over(
        W.partitionBy("source")
        .orderBy(F.col("score_u").desc(), "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    surv = (
        base.crossJoin(F.broadcast(budget))
        .withColumn("src_cum", src_cum)
        .filter(F.col("src_cum") <= F.col("src_cap"))
        .withColumn("bkt", F.expr(f"score_u div {CURR_BUCKET_W}"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bcum = (
        surv.groupBy("bkt")
        .agg(F.sum("toks").alias("btoks"))
        .withColumn(
            "cum",
            F.sum("btoks").over(
                W.orderBy(F.col("bkt").desc()).rowsBetween(
                    W.unboundedPreceding, W.currentRow
                )
            ),
        )
    )
    wl = (
        bcum.crossJoin(F.broadcast(budget))
        .filter(F.col("cum") <= F.col("b_total"))
        .agg(F.coalesce(F.min("bkt"), F.lit(-1)).alias("waterline"))
    )
    taken = surv.crossJoin(F.broadcast(wl)).filter(
        F.col("bkt") >= F.col("waterline")
    )
    g = taken.agg(F.coalesce(F.sum("toks"), F.lit(0)).alias("g_toks"))
    return taken, budget, wl, g


@query("q309_token_budget_curriculum", oracle=_q309_oracle())
def q309_token_budget_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-BUDGET curriculum take: select the highest-quality slice
    of the corpus under (a) a global training-token budget
    ({CURR_BUDGET_PCT}% of corpus tokens) and (b) a per-source
    anti-domination cap ({CURR_SRC_CAP_PCT}% of the budget) — the
    selection step that turns per-doc quality scores (q50's family)
    into the shard list a training run reads.  Two-stage waterline
    policy, every step integer-exact: stage 1 takes each source's
    maximal quality-ordered prefix under the cap (toks > 0 makes the
    inclusive cumsum monotone, so the filter IS the maximal prefix);
    stage 2 admits whole quality BUCKETS (score div {CURR_BUCKET_W})
    from the top while the bucket-cumulative fits the budget — the
    conservative waterline that keeps the global step a <= 21-row
    aggregate instead of a corpus-wide ordered prefix.  ``audit_ok``
    certifies from independent aggregation paths that the take respects
    both the budget and the cap.

    Parity: the quality score is pure integer micro-units
    (distinct-word ratio: nd * 1e6 div toks) — no float enters any
    ordering or sum; ties break on doc_id.

    Scale shape: one map pass computes (toks, score_u); the stage-1
    window is PARTITIONED BY SOURCE (parallel across sources; within a
    source it is the standard quota shape q110 uses); the global stage
    is a bounded bucket aggregate + a <= 21-row running sum; budget /
    waterline / audit attaches are 1-row broadcasts.  No corpus-wide
    window, no all-pairs.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("toks"),
        F.expr(
            "CAST(size(array_distinct(split(text, ' '))) AS BIGINT)"
            " * 1000000 div CAST(size(split(text, ' ')) AS BIGINT)"
        ).alias("score_u"),
    )
    taken, budget, wl, g = _curriculum_take(base)
    srcs = base.groupBy("source").agg(
        F.count("*").alias("n_docs_src"), F.sum("toks").alias("tokens_src")
    )
    pt = taken.groupBy("source").agg(
        F.count("*").alias("docs_taken"), F.sum("toks").alias("tokens_taken")
    )
    return (
        srcs.join(pt, "source", "left")
        .crossJoin(F.broadcast(budget))
        .crossJoin(F.broadcast(wl))
        .crossJoin(F.broadcast(g))
        .select(
            "source",
            F.col("n_docs_src").cast("long").alias("n_docs_src"),
            F.col("tokens_src").cast("long").alias("tokens_src"),
            F.coalesce("docs_taken", F.lit(0)).cast("long").alias("docs_taken"),
            F.coalesce("tokens_taken", F.lit(0))
            .cast("long")
            .alias("tokens_taken"),
            F.expr("coalesce(tokens_taken, 0) * 1000000 div b_total")
            .cast("long")
            .alias("budget_share_u"),
            F.col("waterline").cast("long").alias("waterline_bucket"),
            (
                (F.col("g_toks") <= F.col("b_total"))
                & (F.coalesce("tokens_taken", F.lit(0)) <= F.col("src_cap"))
            )
            .cast("long")
            .alias("audit_ok"),
        )
    )


# ---------------------------------------------------------------------------
# q310 — contamination verdict FUSION (lexical q109 ∪ semantic q303)
# ---------------------------------------------------------------------------


def _q310_oracle() -> str:
    return f"""
    WITH lex AS ({ORACLES['q109_lsh_decontamination']}),
    sem AS ({ORACLES['q303_semantic_decontamination']}),
    d AS (SELECT doc_id, source,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
          FROM documents),
    fused AS (
      SELECT d.doc_id, d.source, d.toks,
             CASE WHEN COALESCE(lex.contaminated, FALSE) THEN 'lexical'
                  WHEN COALESCE(sem.contaminated, 0) = 1 THEN 'semantic'
                  ELSE 'clean' END AS verdict
      FROM d
      LEFT JOIN lex ON lex.doc_id = d.doc_id
      LEFT JOIN sem ON sem.train_id = d.doc_id),
    per AS (
      SELECT source, verdict, COUNT(*) AS n_docs, SUM(toks) AS tokens
      FROM fused GROUP BY 1, 2),
    s2 AS (SELECT source, SUM(n_docs) AS fused_docs FROM per GROUP BY 1),
    srcs AS (SELECT source, COUNT(*) AS src_docs FROM d GROUP BY 1)
    SELECT per.source, per.verdict,
           CAST(per.n_docs AS BIGINT) AS n_docs,
           CAST(per.tokens AS BIGINT) AS tokens,
           CAST(per.n_docs * 1000000 // srcs.src_docs AS BIGINT) AS share_u,
           CAST(CASE WHEN s2.fused_docs = srcs.src_docs
                THEN 1 ELSE 0 END AS BIGINT) AS audit_ok
    FROM per
    JOIN s2 ON s2.source = per.source
    JOIN srcs ON srcs.source = per.source
    """


@query("q310_contamination_fusion", oracle=_q310_oracle())
def q310_contamination_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUSE the two decontamination channels into the one quarantine
    verdict a shipping pipeline acts on: per document, 'lexical' when
    q109's MinHash-LSH cross-split screen flags it (near-exact token
    overlap — the strongest evidence, so it takes precedence),
    'semantic' when only q303's embedding screen flags it (paraphrase /
    translation-class leaks the lexical channel can't see), else
    'clean'; rolled up per (source, verdict) with token volume and the
    per-source micro-unit share.  ``audit_ok`` certifies per source
    that the verdict partition is exhaustive and disjoint (fused doc
    count == an INDEPENDENT corpus count) — a doc double-counted by a
    duplicate flag row, or dropped by a bad join, fails the audit.

    Parity: composes the REGISTERED q109/q303 (both oracle-green);
    flags fuse via CASE precedence; all outputs are integer counts /
    micro-unit shares.

    Scale shape: both channels are candidate-generation-first (q109
    LSH-banded, q303 map-only vs a broadcast benchmark); the fusion
    adds two doc_id-keyed LEFT joins projecting only (id, flag) — the
    flag tables are bounded by the channels' screened populations —
    and a (source, verdict) agg bounded at |sources| x 3 rows.
    """
    lex = QUERIES["q109_lsh_decontamination"](spark, sf_dir).select(
        "doc_id", F.col("contaminated").alias("lex_c")
    )
    sem = QUERIES["q303_semantic_decontamination"](spark, sf_dir).select(
        F.col("train_id").alias("doc_id"),
        F.col("contaminated").alias("sem_c"),
    )
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("toks"),
    )
    fused = (
        d.join(lex, "doc_id", "left")
        .join(sem, "doc_id", "left")
        .select(
            "source",
            "toks",
            F.when(F.coalesce(F.col("lex_c"), F.lit(False)), "lexical")
            .when(F.coalesce(F.col("sem_c"), F.lit(0)) == 1, "semantic")
            .otherwise("clean")
            .alias("verdict"),
        )
    )
    per = fused.groupBy("source", "verdict").agg(
        F.count("*").alias("n_docs"), F.sum("toks").alias("tokens")
    )
    s2 = per.groupBy("source").agg(F.sum("n_docs").alias("fused_docs"))
    srcs = d.groupBy("source").agg(F.count("*").alias("src_docs"))
    return (
        per.join(s2, "source")
        .join(srcs, "source")
        .select(
            "source",
            "verdict",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("tokens").cast("long").alias("tokens"),
            F.expr("n_docs * 1000000 div src_docs").cast("long").alias("share_u"),
            (F.col("fused_docs") == F.col("src_docs"))
            .cast("long")
            .alias("audit_ok"),
        )
    )


# ---------------------------------------------------------------------------
# q311 — curation TOKEN waterfall (dedup → strip → floor → budget)
# ---------------------------------------------------------------------------

#: stage-3 quality floor in score micro-units (distinct-word ratio on
#: the STRIPPED text; the fixture median sits near 455k, so 400k drops
#: a real share at every SF without emptying the funnel)
Q_FLOOR_U = 400_000


def _q311_oracle() -> str:
    return f"""
    WITH d0 AS (SELECT doc_id, source, text,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
                FROM documents),
    a0 AS (SELECT COUNT(*) AS n0, SUM(toks) AS t0 FROM d0),
    keep AS (SELECT MIN(doc_id) AS doc_id FROM d0 GROUP BY text),
    d1 AS (SELECT d0.* FROM d0 JOIN keep USING (doc_id)),
    a1 AS (SELECT COUNT(*) AS n1, SUM(toks) AS t1 FROM d1),
    k1 AS (SELECT COUNT(*) AS nk FROM keep),
    words AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM d1),
    segs AS (
      SELECT doc_id, source, len(w) AS wt, i,
             array_to_string(w[(i - 1) * {SEG_W} + 1 : i * {SEG_W}], ' ') AS seg,
             len(w[(i - 1) * {SEG_W} + 1 : i * {SEG_W}]) AS sw
      FROM words,
           unnest(generate_series(
             1, CAST(ceil(len(w) / {SEG_W}.0) AS INT))) AS t(i)),
    bp AS (SELECT source, seg FROM (
             SELECT source, seg, COUNT(DISTINCT doc_id) AS nd
             FROM segs GROUP BY 1, 2) WHERE nd >= {BP_STRIP_MIN_DOCS}),
    tagged AS (
      SELECT s.doc_id, s.source, s.wt, s.i, s.seg, s.sw,
             (bp.seg IS NOT NULL) AS is_bp
      FROM segs s
      LEFT JOIN bp ON bp.source = s.source AND bp.seg = s.seg),
    pd2 AS (
      SELECT doc_id, source, MIN(wt) AS wt,
             string_agg(seg, ' ' ORDER BY i)
               FILTER (WHERE NOT is_bp) AS cleaned,
             COALESCE(SUM(sw) FILTER (WHERE NOT is_bp), 0) AS wk,
             COALESCE(SUM(sw) FILTER (WHERE is_bp), 0) AS wd
      FROM tagged GROUP BY 1, 2),
    pd2c AS (
      SELECT *, CASE WHEN cleaned IS NULL OR cleaned = '' THEN 0
                     ELSE len(string_split(cleaned, ' ')) END AS ws
      FROM pd2),
    a2 AS (SELECT COUNT(*) AS n2, SUM(wt) AS wt2, SUM(wk) AS wk2,
                  SUM(wd) AS wd2, SUM(ws) AS ws2 FROM pd2c),
    b3 AS (
      SELECT doc_id, source, CAST(ws AS BIGINT) AS toks,
             CASE WHEN ws = 0 THEN 0 ELSE
               (CAST(len(list_distinct(string_split(cleaned, ' '))) AS BIGINT)
                  * 1000000) // CAST(ws AS BIGINT) END AS score_u
      FROM pd2c),
    a3 AS (SELECT
             SUM(CASE WHEN score_u >= {Q_FLOOR_U} THEN 1 ELSE 0 END) AS n_ge,
             SUM(CASE WHEN score_u < {Q_FLOOR_U} THEN 1 ELSE 0 END) AS n_lt,
             COALESCE(SUM(CASE WHEN score_u >= {Q_FLOOR_U} THEN toks END), 0)
               AS t_ge
           FROM b3),
    d3 AS (SELECT * FROM b3 WHERE score_u >= {Q_FLOOR_U}),
    budget AS (SELECT (SUM(toks) * {CURR_BUDGET_PCT}) // 100 AS b_total,
                      ((SUM(toks) * {CURR_BUDGET_PCT}) // 100
                        * {CURR_SRC_CAP_PCT}) // 100 AS src_cap
               FROM d3),
    s1c AS (
      SELECT d3.*, b_total, src_cap,
             SUM(toks) OVER (PARTITION BY source
                             ORDER BY score_u DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS src_cum
      FROM d3 CROSS JOIN budget),
    surv AS (SELECT *, score_u // {CURR_BUCKET_W} AS bkt
             FROM s1c WHERE src_cum <= src_cap),
    bcum AS (
      SELECT bkt,
             SUM(btoks) OVER (ORDER BY bkt DESC
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM (SELECT bkt, SUM(toks) AS btoks FROM surv GROUP BY 1)),
    wl AS (SELECT COALESCE(MIN(bkt), -1) AS waterline
           FROM bcum, budget WHERE cum <= b_total),
    taken AS (SELECT surv.* FROM surv, wl WHERE bkt >= waterline),
    a4 AS (SELECT COUNT(*) AS n4, COALESCE(SUM(toks), 0) AS t4 FROM taken),
    ps AS (SELECT COALESCE(MAX(stoks), 0) AS max_src FROM
             (SELECT source, SUM(toks) AS stoks FROM taken GROUP BY 1))
    SELECT CAST(stage AS BIGINT) AS stage, name,
           CAST(docs_in AS BIGINT) AS docs_in,
           CAST(docs_out AS BIGINT) AS docs_out,
           CAST(tokens_in AS BIGINT) AS tokens_in,
           CAST(tokens_out AS BIGINT) AS tokens_out,
           CAST(audit_ok AS BIGINT) AS audit_ok
    FROM (
      SELECT 1 AS stage, 'exact_dedup' AS name, n0 AS docs_in, n1 AS docs_out,
             t0 AS tokens_in, t1 AS tokens_out,
             CASE WHEN n1 = nk THEN 1 ELSE 0 END AS audit_ok
      FROM a0, a1, k1
      UNION ALL
      SELECT 2, 'boilerplate_strip', n1, n2, t1, ws2,
             CASE WHEN n2 = n1 AND wk2 + wd2 = wt2 AND wt2 = t1
                   AND ws2 = wk2 THEN 1 ELSE 0 END
      FROM a1, a2
      UNION ALL
      SELECT 3, 'quality_floor', n2, n_ge, ws2, t_ge,
             CASE WHEN n_ge + n_lt = n2 THEN 1 ELSE 0 END
      FROM a2, a3
      UNION ALL
      SELECT 4, 'token_budget', n_ge, n4, t_ge, t4,
             CASE WHEN t4 <= b_total AND max_src <= src_cap
             THEN 1 ELSE 0 END
      FROM a3, a4, ps, budget)
    """


@query("q311_curation_token_waterfall", oracle=_q311_oracle())
def q311_curation_token_waterfall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The curation pipeline END TO END as one query, accounted in
    TOKENS: exact dedup (q40's keep-first) → boilerplate STRIP on the
    deduped corpus (q308's core — the stage that REWRITES text, so
    tokens shrink inside surviving docs) → quality floor scored on the
    STRIPPED text ({Q_FLOOR_U} micro-units) → token-budget take (q309's
    core on the survivors).  One waterfall row per stage with
    (docs_in, docs_out, tokens_in, tokens_out) and a PER-STAGE
    independent audit: stage 1 re-counts keepers from the digest
    aggregate vs the semi-joined corpus; stage 2 checks the explode
    path's raw word total against the direct pre-explode count AND the
    re-stitch total against the kept-segment sum; stage 3 certifies the
    floor partitions the corpus; stage 4 certifies budget + per-source
    cap from independent aggregates.  q137 publishes the doc-count
    survivorship of the FILTER-only pipeline; this is the
    token-accounted funnel whose middle stage mutates documents — the
    number a training-run capacity plan actually needs.

    Parity: every stage is integer-exact (digest keep-first, integer
    word counts, micro-unit scores, integer budget arithmetic).

    Scale shape (r13, guide §2.4/§1.2): each stage keeps its
    component's scale story (digest-window dedup; q308's segment agg +
    1-build-row hot-key join; map-only floor; q309's per-source window
    + <=21-row waterline), but sibling stage aggregates over the SAME
    frame are fused into one multi-aggregate pass each — stage 0+1's
    corpus totals, keeper totals and distinct-digest audit path ride
    one aggregation of the digest-flagged corpus (the keep-first
    groupBy + semi-join became a digest-partitioned min window: one
    shuffle instead of two, same keeper set); stage 2+3 share one
    aggregation of the stripped+scored frame; stage 4's take totals
    and per-source cap roll up from one per-source aggregate.  The
    waterfall is then ONE wide 1-row crossjoin exploded into 4 rows
    (the q114 unpivot), not four separately-built union branches.
    Audit independence is per-expression throughout (e.g. n1 =
    keeper-flag sum vs nk = countDistinct digest).
    """
    from pyspark.storagelevel import StorageLevel

    docs = _fanout(spark, table(spark, sf_dir, "documents")).select(
        "doc_id",
        "source",
        "text",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("toks"),
    )
    flagged = docs.withColumn("h", F.sha2(F.col("text"), 256)).withColumn(
        "keeper",
        F.col("doc_id") == F.min("doc_id").over(W.partitionBy("h")),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # one pass: corpus totals (stage-1 in), keeper totals (stage-1
    # out), and the INDEPENDENT distinct-digest count the audit
    # compares keepers against
    s1 = flagged.agg(
        F.count("*").alias("n0"),
        F.sum("toks").alias("t0"),
        F.sum(F.col("keeper").cast("long")).alias("n1"),
        F.sum(F.when(F.col("keeper"), F.col("toks"))).alias("t1"),
        F.countDistinct("h").alias("nk"),
    )
    d1 = flagged.filter(F.col("keeper"))

    pd2 = (
        _strip_segments(d1.select("doc_id", "source", "text"))
        .withColumn(
            "score_u",
            F.when(F.col("ws") == 0, F.lit(0))
            .otherwise(
                F.expr(
                    "CAST(size(array_distinct(split(cleaned, ' '))) AS BIGINT)"
                    " * 1000000 div CAST(ws AS BIGINT)"
                )
            )
            .cast("long"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # one pass: stage-2 conservation sums AND stage-3 floor partition
    s23 = pd2.agg(
        F.count("*").alias("n2"),
        F.sum("wt").alias("wt2"),
        F.sum("wk").alias("wk2"),
        F.sum("wd").alias("wd2"),
        F.sum("ws").alias("ws2"),
        F.sum((F.col("score_u") >= Q_FLOOR_U).cast("long")).alias("n_ge"),
        F.sum((F.col("score_u") < Q_FLOOR_U).cast("long")).alias("n_lt"),
        F.coalesce(
            F.sum(F.when(F.col("score_u") >= Q_FLOOR_U, F.col("ws").cast("long"))),
            F.lit(0),
        ).alias("t_ge"),
    )
    d3 = pd2.filter(F.col("score_u") >= Q_FLOOR_U).select(
        "doc_id",
        "source",
        F.col("ws").cast("long").alias("toks"),
        "score_u",
    )

    taken, budget, wl, g = _curriculum_take(d3)
    # one per-source rollup carries the take totals AND the
    # anti-domination cap check (integer sums — associative)
    s4 = (
        taken.groupBy("source")
        .agg(F.count("*").alias("ns"), F.sum("toks").alias("stoks"))
        .agg(
            F.coalesce(F.sum("ns"), F.lit(0)).alias("n4"),
            F.coalesce(F.sum("stoks"), F.lit(0)).alias("t4"),
            F.coalesce(F.max("stoks"), F.lit(0)).alias("max_src"),
        )
    )

    wide = (
        s1.crossJoin(F.broadcast(s23))
        .crossJoin(F.broadcast(s4))
        .crossJoin(F.broadcast(budget))
    )

    def srow(stage, name, din, dout, tin, tout, ok):
        return F.struct(
            F.lit(stage).cast("long").alias("stage"),
            F.lit(name).alias("name"),
            din.cast("long").alias("docs_in"),
            dout.cast("long").alias("docs_out"),
            tin.cast("long").alias("tokens_in"),
            tout.cast("long").alias("tokens_out"),
            ok.cast("long").alias("audit_ok"),
        )

    stages = F.array(
        srow(
            1,
            "exact_dedup",
            F.col("n0"),
            F.col("n1"),
            F.col("t0"),
            F.col("t1"),
            (F.col("n1") == F.col("nk")),
        ),
        srow(
            2,
            "boilerplate_strip",
            F.col("n1"),
            F.col("n2"),
            F.col("t1"),
            F.col("ws2"),
            (
                (F.col("n2") == F.col("n1"))
                & (F.col("wk2") + F.col("wd2") == F.col("wt2"))
                & (F.col("wt2") == F.col("t1"))
                & (F.col("ws2") == F.col("wk2"))
            ),
        ),
        srow(
            3,
            "quality_floor",
            F.col("n2"),
            F.col("n_ge"),
            F.col("ws2"),
            F.col("t_ge"),
            (F.col("n_ge") + F.col("n_lt") == F.col("n2")),
        ),
        srow(
            4,
            "token_budget",
            F.col("n_ge"),
            F.col("n4"),
            F.col("t_ge"),
            F.col("t4"),
            (
                (F.col("t4") <= F.col("b_total"))
                & (F.col("max_src") <= F.col("src_cap"))
            ),
        ),
    )
    return wide.select(F.explode(stages).alias("s")).select("s.*")


# ---------------------------------------------------------------------------
# q312 — curation-take COVERAGE audit (selection bias vs the eval slice)
# ---------------------------------------------------------------------------


def _q312_oracle() -> str:
    bucket = (
        f"('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
        f" % {EVAL_MOD}"
    )
    return f"""
    WITH d AS (
      SELECT doc_id, source, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
             (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                * 1000000)
               // CAST(len(string_split(text, ' ')) AS BIGINT) AS score_u,
             ({bucket}) = 0 AS is_eval
      FROM documents),
    eg AS (
      SELECT DISTINCT source, md5(g) AS h
      FROM (SELECT source, unnest({_SHINGLES_SQL}) AS g
            FROM d WHERE is_eval)),
    pool AS (SELECT * FROM d WHERE NOT is_eval),
    pg AS (
      SELECT DISTINCT md5(g) AS h
      FROM (SELECT unnest({_SHINGLES_SQL}) AS g FROM pool)),
    budget AS (SELECT (SUM(toks) * {CURR_BUDGET_PCT}) // 100 AS b_total,
                      ((SUM(toks) * {CURR_BUDGET_PCT}) // 100
                        * {CURR_SRC_CAP_PCT}) // 100 AS src_cap
               FROM pool),
    s1c AS (
      SELECT pool.*, b_total, src_cap,
             SUM(toks) OVER (PARTITION BY source
                             ORDER BY score_u DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS src_cum
      FROM pool CROSS JOIN budget),
    surv AS (SELECT *, score_u // {CURR_BUCKET_W} AS bkt
             FROM s1c WHERE src_cum <= src_cap),
    bcum AS (
      SELECT bkt,
             SUM(btoks) OVER (ORDER BY bkt DESC
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM (SELECT bkt, SUM(toks) AS btoks FROM surv GROUP BY 1)),
    wl AS (SELECT COALESCE(MIN(bkt), -1) AS waterline
           FROM bcum, budget WHERE cum <= b_total),
    taken AS (SELECT surv.* FROM surv, wl WHERE bkt >= waterline),
    tg AS (
      SELECT DISTINCT md5(g) AS h
      FROM (SELECT unnest({_SHINGLES_SQL}) AS g FROM taken)),
    ev AS (SELECT source, COUNT(*) AS n_grams FROM eg GROUP BY 1),
    cf AS (SELECT source, COUNT(*) AS c_full FROM eg
           WHERE EXISTS (SELECT 1 FROM pg WHERE pg.h = eg.h) GROUP BY 1),
    ct AS (SELECT source, COUNT(*) AS c_take FROM eg
           WHERE EXISTS (SELECT 1 FROM tg WHERE tg.h = eg.h) GROUP BY 1),
    ed AS (SELECT source, COUNT(*) AS n_eval_docs FROM d
           WHERE is_eval GROUP BY 1)
    SELECT ev.source,
           CAST(ed.n_eval_docs AS BIGINT) AS n_eval_docs,
           CAST(ev.n_grams AS BIGINT) AS n_eval_grams,
           CAST(COALESCE(cf.c_full, 0) AS BIGINT) AS grams_covered_full,
           CAST(COALESCE(ct.c_take, 0) AS BIGINT) AS grams_covered_take,
           CAST(COALESCE(cf.c_full, 0) * 1000000
                  // ev.n_grams AS BIGINT) AS coverage_full_u,
           CAST(COALESCE(ct.c_take, 0) * 1000000
                  // ev.n_grams AS BIGINT) AS coverage_take_u,
           CAST(CASE WHEN COALESCE(ct.c_take, 0) <= COALESCE(cf.c_full, 0)
                THEN 1 ELSE 0 END AS BIGINT) AS audit_ok
    FROM ev
    JOIN ed ON ed.source = ev.source
    LEFT JOIN cf ON cf.source = ev.source
    LEFT JOIN ct ON ct.source = ev.source
    """


@query("q312_take_coverage_audit", oracle=_q312_oracle())
def q312_take_coverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECTION-BIAS audit of the curation take: after q309's
    budget-constrained selection over the training pool, how much of
    the held-out (eval) slice's distinct shingle mass is still covered
    by what was KEPT, vs by the full pool — the number that says
    whether aggressive quality selection quietly narrowed the
    distribution the model will be evaluated on.  Per eval source:
    distinct eval shingles, covered-by-pool, covered-by-take, both as
    micro-unit coverage rates; ``audit_ok`` pins take-coverage <=
    pool-coverage (the take is a subset — a violation means the gram
    sets were built inconsistently).

    Parity: the eval split is the house md5 bucket (q58/q95/q109); the
    shingle unit is the registered 5-gram pair (_shingles /
    _SHINGLES_SQL); the take is q309's integer waterline core; all
    outputs are integer counts / micro-units.

    Scale shape: shingles hash to md5 at the scan and reduce to
    DISTINCT hashes before any join; coverage is two hash-keyed
    LEFT-SEMI probes of the 1/{EVAL_MOD} eval gram set against the
    pool/take gram sets (hash-partitioned, never broadcast at corpus
    scale); the take reuses q309's per-source window + <= 21-row
    waterline.  No text leaves the executors after the scan.
    """
    from pyspark.storagelevel import StorageLevel

    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % EVAL_MOD
    )
    d = docs.select(
        "doc_id",
        "source",
        "text",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("toks"),
        F.expr(
            "CAST(size(array_distinct(split(text, ' '))) AS BIGINT)"
            " * 1000000 div CAST(size(split(text, ' ')) AS BIGINT)"
        ).alias("score_u"),
        (bucket == 0).alias("is_eval"),
    )
    ev_docs = d.filter(F.col("is_eval")).persist(StorageLevel.MEMORY_AND_DISK)
    pool = d.filter(~F.col("is_eval")).persist(StorageLevel.MEMORY_AND_DISK)
    eg = (
        ev_docs.select(
            "source", F.explode(_shingles(F.col("text"))).alias("g")
        )
        .select("source", F.md5("g").alias("h"))
        .distinct()
    )
    taken, budget, wl, g = _curriculum_take(
        pool.select("doc_id", "source", "toks", "score_u")
    )
    # ONE gram pass over the pool carrying the take flag (take ⊆ pool,
    # so covered-by-take ≡ covered-by-a-flagged-pool-gram): replaces
    # the separate pool-gram and take-gram explodes + two semi-join
    # probes with one explode, one hash agg and one LEFT join — the
    # gram hash work roughly halves and two joins become one
    pgt = (
        pool.join(
            taken.select("doc_id", F.lit(True).alias("tk")), "doc_id", "left"
        )
        .select(F.explode(_shingles(F.col("text"))).alias("g"), "tk")
        .select(F.md5("g").alias("h"), "tk")
        .groupBy("h")
        .agg(F.max(F.coalesce("tk", F.lit(False))).alias("in_take"))
    )
    per = (
        eg.join(pgt, "h", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_grams"),
            # in_take is non-null exactly when the gram exists in the
            # pool; true when any pool doc containing it was taken
            F.count("in_take").alias("c_full"),
            F.sum(F.when(F.col("in_take"), 1).otherwise(0)).alias("c_take"),
        )
    )
    ed = ev_docs.groupBy("source").agg(F.count("*").alias("n_eval_docs"))
    return (
        per.join(ed, "source")
        .select(
            "source",
            F.col("n_eval_docs").cast("long").alias("n_eval_docs"),
            F.col("n_grams").cast("long").alias("n_eval_grams"),
            F.coalesce("c_full", F.lit(0))
            .cast("long")
            .alias("grams_covered_full"),
            F.coalesce("c_take", F.lit(0))
            .cast("long")
            .alias("grams_covered_take"),
            F.expr("coalesce(c_full, 0) * 1000000 div n_grams")
            .cast("long")
            .alias("coverage_full_u"),
            F.expr("coalesce(c_take, 0) * 1000000 div n_grams")
            .cast("long")
            .alias("coverage_take_u"),
            (
                F.coalesce("c_take", F.lit(0))
                <= F.coalesce("c_full", F.lit(0))
            )
            .cast("long")
            .alias("audit_ok"),
        )
    )


# ---------------------------------------------------------------------------
# q313 — keeper SUCCESSION under deletion (the re-crawl case)
# ---------------------------------------------------------------------------


def _q313_oracle() -> str:
    dele = f"% {DOC_DELTA_MOD} = {DOC_DELETE_REM}"
    return f"""
    WITH c AS ({ORACLES['q69_dedup_clusters']}),
    f AS ({ORACLES['q50_text_quality']}),
    j AS (SELECT c.cluster_id, c.doc_id, f.quality,
                 (c.doc_id {dele}) AS is_del
          FROM c JOIN f ON f.doc_id = c.doc_id),
    sizes AS (SELECT cluster_id, COUNT(*) AS n_members,
                     SUM(CASE WHEN is_del THEN 0 ELSE 1 END) AS n_live
              FROM j GROUP BY 1),
    okk AS (SELECT cluster_id, doc_id AS old_keeper FROM (
              SELECT cluster_id, doc_id,
                     ROW_NUMBER() OVER (PARTITION BY cluster_id
                                        ORDER BY quality DESC, doc_id) AS rn
              FROM j) WHERE rn = 1),
    nkk AS (SELECT cluster_id, doc_id AS new_keeper FROM (
              SELECT cluster_id, doc_id,
                     ROW_NUMBER() OVER (PARTITION BY cluster_id
                                        ORDER BY quality DESC, doc_id) AS rn
              FROM j WHERE NOT is_del) WHERE rn = 1),
    st AS (
      SELECT s.cluster_id, s.n_members, s.n_live, o.old_keeper,
             COALESCE(n.new_keeper, -1) AS new_keeper,
             CASE WHEN s.n_live = 0 THEN 'dissolved'
                  WHEN n.new_keeper = o.old_keeper THEN 'unchanged'
                  ELSE 'promoted' END AS status
      FROM sizes s
      JOIN okk o ON o.cluster_id = s.cluster_id
      LEFT JOIN nkk n ON n.cluster_id = s.cluster_id),
    tot AS (SELECT COUNT(DISTINCT cluster_id) AS n_clusters FROM j),
    aud AS (
      SELECT
        (SELECT COUNT(*) FROM st) =
          (SELECT n_clusters FROM tot)
        AND COALESCE((SELECT MIN(CASE WHEN old_keeper {dele}
                                       AND NOT (new_keeper {dele})
                                       AND new_keeper <> old_keeper
                                  THEN 1 ELSE 0 END)
                      FROM st WHERE status = 'promoted'), 1) = 1
        AND COALESCE((SELECT MIN(CASE WHEN NOT (old_keeper {dele})
                                       AND new_keeper = old_keeper
                                  THEN 1 ELSE 0 END)
                      FROM st WHERE status = 'unchanged'), 1) = 1
        AS ok)
    SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(n_live AS BIGINT) AS n_live,
           CAST(old_keeper AS BIGINT) AS old_keeper,
           CAST(new_keeper AS BIGINT) AS new_keeper,
           status,
           CAST(CASE WHEN aud.ok THEN 1 ELSE 0 END AS BIGINT) AS audit_ok
    FROM st, aud
    """


@query("q313_keeper_succession", oracle=_q313_oracle())
def q313_keeper_succession(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keeper SUCCESSION under deletion — the re-crawl case the
    manifest lifecycle (q298 drop / q299 apply) does not cover: when a
    dup cluster's KEPT representative is itself tombstoned (doc_id %
    {DOC_DELTA_MOD} == {DOC_DELETE_REM}, the house deletion batch), a
    retained duplicate must be PROMOTED by the same keep-rule (best
    quality, id tiebreak) or the whole group's content silently leaves
    the corpus.  One row per q69 cluster: members, live members, old
    keeper, new keeper (-1 when the cluster dissolves), and status in
    unchanged / promoted / dissolved.  ``audit_ok`` certifies globally
    that the status partition covers every cluster (independent
    distinct-cluster count), every promotion's old keeper is deleted
    and its new keeper is live and different, and every unchanged
    keeper is live.

    Parity: composes the registered q69 clusters + q50 quality with
    q298's exact keep-rule on both sides; all ids/counts integer.

    Scale shape: two keeper picks are per-cluster aggregates over the
    SAME joined frame (the q285/q298 struct-max shape, map-side
    combinable — never a window over an unbounded cluster); output is
    |clusters| rows (bounded by true duplicate volume); the audit is
    three conditional aggregates broadcast onto the cluster rows.
    """
    is_del = (F.col("doc_id") % DOC_DELTA_MOD) == DOC_DELETE_REM
    c = q69_dedup_clusters(spark, sf_dir)
    f = q50_text_quality(spark, sf_dir).select("doc_id", "quality")
    j = c.join(f, "doc_id").withColumn("is_del", is_del)
    best = F.max(
        F.struct(F.col("quality").alias("q"), (-F.col("doc_id")).alias("nid"))
    )
    okk = (
        j.groupBy("cluster_id")
        .agg(best.alias("b"))
        .select("cluster_id", (-F.col("b.nid")).cast("long").alias("old_keeper"))
    )
    nkk = (
        j.filter(~F.col("is_del"))
        .groupBy("cluster_id")
        .agg(best.alias("b"))
        .select("cluster_id", (-F.col("b.nid")).cast("long").alias("new_keeper"))
    )
    sizes = j.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"),
        F.sum((~F.col("is_del")).cast("long")).alias("n_live"),
    )
    st = (
        sizes.join(okk, "cluster_id")
        .join(nkk, "cluster_id", "left")
        .select(
            "cluster_id",
            "n_members",
            "n_live",
            "old_keeper",
            F.coalesce("new_keeper", F.lit(-1)).cast("long").alias("new_keeper"),
            F.when(F.col("n_live") == 0, "dissolved")
            .when(F.col("new_keeper") == F.col("old_keeper"), "unchanged")
            .otherwise("promoted")
            .alias("status"),
        )
    )
    from pyspark.storagelevel import StorageLevel

    st = st.persist(StorageLevel.MEMORY_AND_DISK)
    del_of = lambda col: (F.col(col) % DOC_DELTA_MOD) == DOC_DELETE_REM  # noqa: E731
    tot = j.agg(F.countDistinct("cluster_id").alias("n_clusters"))
    aud = (
        st.agg(
            F.count("*").alias("n_rows"),
            F.coalesce(
                F.min(
                    F.when(
                        F.col("status") == "promoted",
                        (
                            del_of("old_keeper")
                            & ~del_of("new_keeper")
                            & (F.col("new_keeper") != F.col("old_keeper"))
                        ).cast("long"),
                    )
                ),
                F.lit(1),
            ).alias("promo_ok"),
            F.coalesce(
                F.min(
                    F.when(
                        F.col("status") == "unchanged",
                        (
                            ~del_of("old_keeper")
                            & (F.col("new_keeper") == F.col("old_keeper"))
                        ).cast("long"),
                    )
                ),
                F.lit(1),
            ).alias("unch_ok"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            (
                (F.col("n_rows") == F.col("n_clusters"))
                & (F.col("promo_ok") == 1)
                & (F.col("unch_ok") == 1)
            )
            .cast("long")
            .alias("audit_ok")
        )
    )
    return st.crossJoin(F.broadcast(aud)).select(
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.col("n_members").cast("long").alias("n_members"),
        F.col("n_live").cast("long").alias("n_live"),
        "old_keeper",
        "new_keeper",
        "status",
        "audit_ok",
    )


# ---------------------------------------------------------------------------
# q314 — PQ subspace-count SWEEP (the m tradeoff: distortion vs recall)
# ---------------------------------------------------------------------------

#: swept (subspaces, dims-per-subspace) configs; m * d == embedding dim
PQ_SWEEP = ((8, 8), (16, 4), (32, 2))


def _q314_cfg_sql(mm: int, dd: int) -> str:
    """One sweep config's CTE chain (suffix _{mm}): parameterized twin
    of q75's encode + PURE-ADC top-k (no refine — the refine stage
    masks exactly the quantization tradeoff the sweep measures)."""
    s = mm
    return f"""
    ms_{s} AS (SELECT unnest(generate_series(0, {mm - 1})) AS m),
    csub_{s} AS (SELECT cid, m, ce[m*{dd}+1 : m*{dd}+{dd}] AS cs
                 FROM cb, ms_{s}),
    enc_{s} AS (SELECT e.vec_id, c.m, c.cid,
             list_reduce(list_transform(generate_series(1, {dd}),
               i -> (e.embedding[c.m*{dd}+i]::DOUBLE - c.cs[i]::DOUBLE)
                    * (e.embedding[c.m*{dd}+i]::DOUBLE - c.cs[i]::DOUBLE)),
               (a, b) -> a + b) AS dist
             FROM embeddings e CROSS JOIN csub_{s} c),
    codes_{s} AS (SELECT vec_id, m, cid, dist FROM (
              SELECT vec_id, m, cid, dist,
                     ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                        ORDER BY dist, cid) AS rn
              FROM enc_{s}) WHERE rn = 1),
    err_{s} AS (SELECT ROUND(SUM(dist) / COUNT(DISTINCT vec_id), 6) + 0.0
                  AS mse FROM codes_{s}),
    lut_{s} AS (SELECT q.q_id, c.m, c.cid,
            list_reduce(list_transform(generate_series(1, {dd}),
              i -> q.qe[c.m*{dd}+i]::DOUBLE * c.cs[i]::DOUBLE),
              (a, b) -> a + b) AS pd
            FROM qs q CROSS JOIN csub_{s} c),
    adc_{s} AS (SELECT l.q_id, c.vec_id AS neighbor_id, SUM(l.pd) AS sc
             FROM lut_{s} l
             JOIN codes_{s} c ON c.m = l.m AND c.cid = l.cid
             WHERE c.vec_id <> l.q_id
             GROUP BY l.q_id, c.vec_id),
    top_{s} AS (SELECT q_id, neighbor_id FROM (
              SELECT q_id, neighbor_id,
                     ROW_NUMBER() OVER (PARTITION BY q_id
                                        ORDER BY ROUND(sc, 6) DESC,
                                                 neighbor_id) AS rn
              FROM adc_{s}) WHERE rn <= {TOPK}),
    hit_{s} AS (SELECT COUNT(*) AS h FROM top_{s} t
                WHERE EXISTS (SELECT 1 FROM truth
                              WHERE truth.q_id = t.q_id
                                AND truth.neighbor_id = t.neighbor_id))"""


def _q314_oracle() -> str:
    cfg_blocks = ",".join(_q314_cfg_sql(mm, dd) for mm, dd in PQ_SWEEP)
    rows = " UNION ALL ".join(
        f"""SELECT CAST({mm} AS BIGINT) AS m, CAST({dd} AS BIGINT) AS d,
               (SELECT mse FROM err_{mm}) AS mse,
               CAST((SELECT h FROM hit_{mm}) * 1000000
                      // (SELECT nt FROM tc) AS BIGINT) AS recall_u"""
        for mm, dd in PQ_SWEEP
    )
    return f"""
    WITH cb AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
                WHERE vec_id < {PQ_K}),
    qs AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings
           WHERE vec_id < {N_QUERIES}),
    truth AS (SELECT q_id, vec_id AS neighbor_id FROM (
        SELECT q.q_id, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.q_id
                 ORDER BY ROUND({_COS_SQL.format(a='q.qe', b='e.embedding')},
                                6) DESC, e.vec_id) AS rn
        FROM qs q CROSS JOIN embeddings e WHERE e.vec_id <> q.q_id)
      WHERE rn <= {TOPK}),
    tc AS (SELECT COUNT(*) AS nt FROM truth),
    {cfg_blocks}
    SELECT * FROM ({rows})
    """


@query("q314_pq_subspace_sweep", oracle=_q314_oracle())
def q314_pq_subspace_sweep(
    spark: SparkSession, sf_dir: str, *, backend: str | None = None
) -> DataFrame:
    """PQ TUNING sweep over the subspace count — the axis q276 sweeps
    for LSH bands and q252 for dedup thresholds: for m in {PQ_SWEEP}
    subspaces (d = 64/m dims each, same {PQ_K}-centroid codebook),
    re-encode the corpus and report the per-vector reconstruction MSE
    against the PURE-ADC recall@{TOPK} vs the exact cosine truth — the
    distortion/recall frontier an ANN capacity plan reads before
    freezing m (the refine stage is deliberately OFF: it masks exactly
    the quantization loss the sweep measures; q75 carries the refined
    production path).

    Parity: parameterized twins of q75's encode/LUT/ADC expressions
    (module helpers stay frozen at the production m=16 — the sweep
    never perturbs the IVM family's shared definitions); the exact
    truth is the q45-style rounded-cosine top-k; recall is integer
    micro-units.

    Scale shape: per config, encoding is one map-only pass against the
    broadcast codebook row (HOF loops — constant plan size at any
    m, k); ADC joins the fixed N_QUERIES x m x k LUT against the codes;
    the exact-truth pass is the q45 fixed-query-set discipline.  Three
    configs = three bounded passes, no pass reads another's output.
    """
    from pyspark.storagelevel import StorageLevel

    # backend (default auto — the q112 encode_backend pattern): "numpy"
    # runs the truth cosines and each config's encode as bit-equal Arrow
    # passes; "jvm" keeps the HOF plan the oracle mirrors.
    if backend is None:
        backend = "numpy" if _numpy_available() else "jvm"
    corpus = table(spark, sf_dir, "embeddings")
    cb1 = _pq_codebook_row(corpus)
    queries = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    truth_pairs = queries.crossJoin(
        corpus.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("ne"),
        )
    ).filter(F.col("neighbor_id") != F.col("q_id"))
    if backend == "numpy":
        truth_scored = _cos_pairs_numpy(
            spark, truth_pairs, ("q_id", "neighbor_id"), "qe", "ne"
        ).select("q_id", "neighbor_id", dec(F.col("cos_raw"), 6).alias("cs"))
    else:
        truth_scored = truth_pairs.select(
            "q_id",
            "neighbor_id",
            dec(_cosine(F.col("qe"), F.col("ne")), 6).alias("cs"),
        )
    truth = (
        truth_scored
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("q_id").orderBy(
                    F.col("cs").desc(), "neighbor_id"
                )
            ),
        )
        .filter(F.col("rn") <= TOPK)
        .select("q_id", "neighbor_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tc = truth.agg(F.count("*").alias("nt"))

    def sub(v, m, dd):
        return F.slice(v, m * dd + 1, dd)

    # numpy route: ONE Arrow encode pass computes every config's codes
    # and reconstruction errors (the corpus crosses the Python boundary
    # once, per-dim squared diffs shared — r13, VERDICT r12 ask #5);
    # each config below slices its columns out of the persisted frame.
    enc_all = None
    adc_all = None
    if backend == "numpy":
        enc_all = _pq_encode_sweep_numpy(
            spark, _fanout(spark, corpus), PQ_SWEEP, corpus
        ).persist(StorageLevel.MEMORY_AND_DISK)
        # ...and ONE Arrow ADC pass scores every config (the per-config
        # broadcast-LUT join + interpreted _pq_adc_score fold was the
        # next-largest cost after the encode fuse — bit-equal raw
        # doubles, 6-dp rounding below stays in the JVM)
        adc_all = _pq_adc_sweep_numpy(spark, enc_all, PQ_SWEEP, corpus).persist(
            StorageLevel.MEMORY_AND_DISK
        )

    out = None
    for mm, dd in PQ_SWEEP:
        ms = F.sequence(F.lit(0), F.lit(mm - 1))
        enc_struct = lambda m: F.array_min(  # noqa: E731
            F.transform(
                F.col("cbs"),
                lambda c: F.struct(
                    _pq_l2(
                        sub(F.col("embedding"), m, dd), sub(c["ce"], m, dd)
                    ).alias("d"),
                    c["cid"].alias("cid"),
                ),
            )
        )
        # One argmin evaluation per (vector, m): materialize the
        # (d, cid) struct array in its OWN projection, then split codes
        # / err_total out of it.  Referencing enc_struct twice in a
        # single select (once for ["cid"], once for ["d"]) leaves TWO
        # full array_min(transform(...)) evaluations in the physical
        # plan — the whole encode pass ran twice (guide §1.2 step 2;
        # verified by counting array_min in executedPlan).  The struct
        # alias is expensive, so CollapseProject keeps the boundary.
        if backend == "numpy":
            enc = enc_all.select(
                "vec_id",
                F.col(f"codes_{mm}").alias("codes"),
                F.col(f"err_{mm}").alias("err_total"),
            )
        else:
            enc = (
                _fanout(spark, corpus)
                .crossJoin(F.broadcast(cb1))
                .select(
                    "vec_id", F.transform(ms, lambda m: enc_struct(m)).alias("es")
                )
                .select(
                    "vec_id",
                    F.transform("es", lambda s: s["cid"]).alias("codes"),
                    F.aggregate(
                        F.transform("es", lambda s: s["d"]),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    ).alias("err_total"),
                )
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
        mse = enc.agg(dec(F.avg("err_total"), 6).alias("mse"))
        if adc_all is not None:
            scored = adc_all.filter(F.col("cfg") == mm).select(
                "q_id",
                "neighbor_id",
                dec(F.col("sc_raw"), 6).alias("sc"),
            )
        else:
            lut = queries.crossJoin(F.broadcast(cb1)).select(
                "q_id",
                F.transform(
                    ms,
                    lambda m: F.transform(
                        F.col("cbs"),
                        lambda c: _pq_dot(
                            sub(F.col("qe"), m, dd), sub(c["ce"], m, dd)
                        ),
                    ),
                ).alias("lut"),
            )
            scored = F.broadcast(lut).join(
                enc.select("vec_id", "codes"),
                F.col("vec_id") != F.col("q_id"),
            ).select(
                "q_id",
                F.col("vec_id").alias("neighbor_id"),
                dec(_pq_adc_score(), 6).alias("sc"),
            )
        topk = (
            scored.withColumn(
                "rn",
                F.row_number().over(
                    W.partitionBy("q_id").orderBy(
                        F.col("sc").desc(), "neighbor_id"
                    )
                ),
            )
            .filter(F.col("rn") <= TOPK)
            .select("q_id", "neighbor_id")
        )
        hits = topk.join(truth, ["q_id", "neighbor_id"], "left_semi").agg(
            F.count("*").alias("h")
        )
        row = (
            mse.crossJoin(F.broadcast(hits))
            .crossJoin(F.broadcast(tc))
            .select(
                F.lit(mm).cast("long").alias("m"),
                F.lit(dd).cast("long").alias("d"),
                (F.col("mse") + F.lit(0.0)).alias("mse"),
                F.expr("h * 1000000 div nt").cast("long").alias("recall_u"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# q315 — BM25 (k1, b) parameter SWEEP (the lexical-leg tuning axis)
# ---------------------------------------------------------------------------

#: swept (k1, b) in milli-units; index 0 is q287's production default
BM25_SWEEP = ((1200, 750), (900, 400), (2000, 0))


def _q315_cfg_sql(k1m: int, bm: int) -> str:
    k1, b = k1m / 1000.0, bm / 1000.0
    idf = "ln(1e0 + (st.n - qt.df + 0.5e0) / (qt.df + 0.5e0))"
    tfc = (
        f"(tf.tf * ({k1}e0 + 1e0)) / "
        f"(tf.tf + {k1}e0 * (1e0 - {b}e0 + {b}e0 * tf.dl / st.avgdl))"
    )
    return f"""
    top_{k1m}_{bm} AS (
      SELECT doc_id, score_micro FROM (
        SELECT doc_id, SUM(m) AS score_micro FROM (
          SELECT tf.doc_id,
                 CAST(FLOOR((ROUND({idf} * {tfc}, 6) + 0.0)
                      * 1000000e0 + 0.5e0) AS BIGINT) AS m
          FROM tf JOIN qt ON tf.term = qt.term CROSS JOIN st)
        GROUP BY 1)
      ORDER BY score_micro DESC, doc_id LIMIT {BM25_TOP})"""


def _q315_oracle() -> str:
    cfg_blocks = ",".join(_q315_cfg_sql(k, b) for k, b in BM25_SWEEP)
    dk, db = BM25_SWEEP[0]
    rows = " UNION ALL ".join(
        f"""SELECT CAST({k} AS BIGINT) AS k1_milli, CAST({b} AS BIGINT) AS b_milli,
               CAST((SELECT COUNT(*) FROM top_{k}_{b}) AS BIGINT) AS n_top,
               CAST((SELECT COUNT(*) FROM top_{k}_{b} t
                     WHERE EXISTS (SELECT 1 FROM top_{dk}_{db} d
                                   WHERE d.doc_id = t.doc_id)) AS BIGINT)
                 AS n_overlap_default,
               CAST((SELECT COUNT(*) FROM top_{k}_{b} t
                     WHERE EXISTS (SELECT 1 FROM top_{dk}_{db} d
                                   WHERE d.doc_id = t.doc_id)) * 1000000
                      // {BM25_TOP} AS BIGINT) AS overlap_u,
               CAST((SELECT SUM(score_micro) FROM top_{k}_{b}) AS BIGINT)
                 AS score_sum_micro"""
        for k, b in BM25_SWEEP
    )
    return f"""
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
               FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf,
                  SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS dl
           FROM t GROUP BY 1, 2),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    st AS (SELECT COUNT(*) AS n,
                  SUM(len(string_split(text, ' '))) * 1e0 / COUNT(*) AS avgdl
           FROM documents),
    qt AS (SELECT term, df FROM df ORDER BY df DESC, term LIMIT {BM25_QT}),
    {cfg_blocks}
    SELECT * FROM ({rows})
    """


@query("q315_bm25_param_sweep", oracle=_q315_oracle())
def q315_bm25_param_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 TUNING sweep over (k1, b) — the lexical twin of q314's PQ
    sweep and q276's band sweep: for each config (saturation k1, length
    normalization b; index 0 = q287's production default) the
    top-{BM25_TOP} list is re-ranked and reported as overlap with the
    default config's list plus the integer score mass — the stability
    surface a retrieval stack reads before freezing its lexical leg
    (b=0 turns length normalization off entirely; low k1 saturates tf
    fast — the swept corners are the standard Okapi extremes).

    Parity: q287's exact quantization discipline per config (6-dp
    round then floor(x*1e6 + 0.5) — integer micro-unit sums, doc_id
    tiebreaks); configs carried as integer milli-units so no float
    column reaches the output.

    Scale shape: the tf / df / corpus-stats / query-term frames build
    ONCE (q287's shapes: one explode + hash aggs + a LIMIT broadcast);
    each config adds only a re-scoring of the tf x qt join (bounded by
    sum(df) over the {BM25_QT} query terms) and a
    TakeOrderedAndProject top-{BM25_TOP}; the sweep rows are 1-row
    aggregate attaches.
    """
    from pyspark.storagelevel import StorageLevel

    docs = table(spark, sf_dir, "documents")
    ws = F.size(F.split(F.col("text"), " "))
    st = docs.agg(
        F.count("*").alias("n"),
        (F.sum(ws) * F.lit(1.0) / F.count("*")).alias("avgdl"),
    )
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("dl", F.sum("tf").over(W.partitionBy("doc_id")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    qt = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), "term")
        .limit(BM25_QT)
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )

    def top_of(k1m: int, bm: int) -> DataFrame:
        k1, b = k1m / 1000.0, bm / 1000.0
        tfc = (F.col("tf") * F.lit(k1 + 1.0)) / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
        return (
            tf.join(F.broadcast(qt), "term")
            .crossJoin(F.broadcast(st))
            .select(
                "doc_id",
                F.floor(dec(idf * tfc, 6) * F.lit(1_000_000.0) + F.lit(0.5))
                .cast("long")
                .alias("m"),
            )
            .groupBy("doc_id")
            .agg(F.sum("m").alias("score_micro"))
            .orderBy(F.col("score_micro").desc(), "doc_id")
            .limit(BM25_TOP)
        )

    default_top = top_of(*BM25_SWEEP[0]).select("doc_id").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    out = None
    for k1m, bm in BM25_SWEEP:
        top = top_of(k1m, bm).persist(StorageLevel.MEMORY_AND_DISK)
        counts = top.agg(
            F.count("*").alias("n_top"),
            F.sum("score_micro").alias("score_sum_micro"),
        )
        ov = top.join(default_top, "doc_id", "left_semi").agg(
            F.count("*").alias("n_overlap_default")
        )
        row = counts.crossJoin(F.broadcast(ov)).select(
            F.lit(k1m).cast("long").alias("k1_milli"),
            F.lit(bm).cast("long").alias("b_milli"),
            F.col("n_top").cast("long").alias("n_top"),
            F.col("n_overlap_default").cast("long").alias("n_overlap_default"),
            F.expr(f"n_overlap_default * 1000000 div {BM25_TOP}")
            .cast("long")
            .alias("overlap_u"),
            F.col("score_sum_micro").cast("long").alias("score_sum_micro"),
        )
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# q316 — source ACQUISITION ordering (greedy marginal-novelty cover)
# ---------------------------------------------------------------------------

#: greedy rounds — the fixtures carry exactly 20 sources at every SF;
#: extra rounds are harmless no-ops on a smaller corpus (both engines
#: skip an empty remainder identically)
SRC_ACQ_ROUNDS = 20

#: collect gate for the (source, tok)-distinct incidence frame (q225's
#: SC_COLLECT_TOKENS discipline; measured x10 cardinality pinned in
#: tests/test_route_gates.py) — under it the whole greedy trajectory
#: is one driver-side numpy solve instead of SRC_ACQ_ROUNDS Spark jobs
ACQ_COLLECT_TOKENS = 5_000_000


def _acq_collected_solve(src_toks) -> list[tuple[int, str, int, int, int]]:
    """Driver-side greedy over the collected (source, tok) incidence
    rows: toks factorize to integer codes (exact string identity), per
    -round gains are an ``np.unique`` count over the uncovered-row
    mask, ties break (gain DESC, source ASC) exactly like the
    distributed round's ordering — bit-equal by construction."""
    import numpy as np
    import pandas as pd

    pdf = src_toks.toPandas()
    s_codes, s_names = pd.factorize(pdf["source"])
    t_codes, _ = pd.factorize(pdf["tok"])
    total = int(t_codes.max()) + 1 if len(t_codes) else 0
    covered = np.zeros(total, dtype=bool)
    remaining = sorted(map(str, s_names))
    code_of = {str(n): i for i, n in enumerate(s_names)}
    out: list[tuple[int, str, int, int, int]] = []
    cum = 0
    for r in range(1, min(SRC_ACQ_ROUNDS, len(remaining)) + 1):
        live = ~covered[t_codes]
        gains: dict[str, int] = {}
        if live.any():
            uniq, counts = np.unique(s_codes[live], return_counts=True)
            gains = {str(s_names[c]): int(n) for c, n in zip(uniq, counts)}
        best = min(remaining, key=lambda n: (-gains.get(n, 0), n))
        gain = gains.get(best, 0)
        cum += gain
        out.append((r, best, gain, cum, cum * 1_000_000 // total))
        covered[t_codes[s_codes == code_of[best]]] = True
        remaining.remove(best)
    return out


def _q316_oracle() -> str:
    iters = []
    for r in range(1, SRC_ACQ_ROUNDS + 1):
        prev_p, prev_c = f"picked{r - 1}", f"cov{r - 1}"
        iters.append(f"""
    rem{r} AS MATERIALIZED (
      SELECT source FROM srcs
      WHERE source NOT IN (SELECT source FROM {prev_p})),
    g{r} AS MATERIALIZED (
      SELECT s.source, COALESCE(c.cnt, 0) AS gain
      FROM rem{r} s LEFT JOIN (
        SELECT source, COUNT(*) AS cnt FROM tok
        WHERE tok NOT IN (SELECT tok FROM {prev_c})
        GROUP BY 1) c ON c.source = s.source),
    p{r} AS MATERIALIZED (
      SELECT source, gain FROM g{r} ORDER BY gain DESC, source LIMIT 1),
    picked{r} AS MATERIALIZED (
      SELECT source, gain, CAST({r} AS BIGINT) AS pick_rank FROM p{r}
      UNION ALL SELECT source, gain, pick_rank FROM {prev_p}),
    cov{r} AS MATERIALIZED (
      SELECT tok FROM {prev_c}
      UNION
      SELECT t.tok FROM tok t JOIN p{r} pp ON t.source = pp.source)""")
    return f"""
    WITH tok AS MATERIALIZED (
      SELECT DISTINCT source, tok FROM (
        SELECT source, unnest({_SHINGLES_SQL}) AS tok FROM documents) x),
    srcs AS MATERIALIZED (SELECT DISTINCT source FROM tok),
    tot AS (SELECT COUNT(DISTINCT tok) AS n FROM tok),
    picked0 AS MATERIALIZED (
      SELECT CAST(NULL AS VARCHAR) AS source, CAST(NULL AS BIGINT) AS gain,
             CAST(NULL AS BIGINT) AS pick_rank WHERE 1 = 0),
    cov0 AS MATERIALIZED (SELECT CAST(NULL AS VARCHAR) AS tok WHERE 1 = 0),
    {','.join(iters)}
    SELECT pick_rank, source,
           CAST(gain AS BIGINT) AS marginal_gain,
           CAST(SUM(gain) OVER (ORDER BY pick_rank) AS BIGINT)
             AS covered_cum,
           CAST(SUM(gain) OVER (ORDER BY pick_rank) * 1000000
                  // (SELECT n FROM tot) AS BIGINT) AS coverage_u
    FROM picked{SRC_ACQ_ROUNDS}
    ORDER BY pick_rank
    """


@query("q316_source_acquisition_order", oracle=_q316_oracle())
def q316_source_acquisition_order(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Source ACQUISITION ordering: rank every source by greedy
    marginal distinct-shingle novelty — pick the source adding the
    most not-yet-covered 5-gram mass, fold its grams into the covered
    set, repeat — q225's submodular maximum-coverage greedy
    ((1-1/e)-optimal, Nemhauser 1978) lifted from document grain to
    SOURCE grain: the "which dump to acquire / ingest next" order and
    its diminishing-returns curve, the artifact a data-acquisition
    budget reads next to q312's coverage audit.  Zero-marginal sources
    (fully shadowed by earlier picks) still rank — gain 0, name
    tiebreak — so the output is a TOTAL ordering of the catalog.

    Parity: the shingle unit is the registered pair (_shingles /
    _SHINGLES_SQL); picks tie on (gain DESC, source); coverage is
    integer micro-units of the global distinct-gram count; the oracle
    unrolls the same {SRC_ACQ_ROUNDS} rounds with MATERIALIZED CTEs.

    Scale shape: ONE (source, tok)-distinct build (grams md5-free here
    — tok strings stay executor-side; the per-round shuffle keys are
    constant-width), then <= {SRC_ACQ_ROUNDS} rounds of one anti-join +
    one |sources|-bounded hash agg + a 1-row gated pick (q225's loop
    discipline, localCheckpointed covered set so lineage stays flat);
    round count is the CATALOG size — never corpus-dependent.
    """
    docs = table(spark, sf_dir, "documents")
    src_toks = local_checkpoint(
        docs.select(
            "source", F.explode(_shingles(F.col("text"))).alias("tok")
        ).distinct(),
        "q316 source-shingle sets",
    )
    schema = (
        "pick_rank long, source string, marginal_gain long, "
        "covered_cum long, coverage_u long"
    )

    def _distributed(toks: DataFrame) -> DataFrame:
        total = toks.select("tok").distinct().count()
        sources = sorted(
            r["source"]
            for r in bounded_collect(
                toks.select("source").distinct(), 1024, "q316_sources"
            )
        )
        covered: DataFrame | None = None
        picked: list[tuple[int, str, int, int, int]] = []
        cum = 0
        for r in range(1, min(SRC_ACQ_ROUNDS, len(sources)) + 1):
            taken = {p[1] for p in picked}
            remaining = [s for s in sources if s not in taken]
            cand = toks.filter(F.col("source").isin(remaining))
            if covered is not None:
                cand = cand.join(covered, "tok", "anti")
            gains = {
                row["source"]: row["cnt"]
                for row in bounded_collect(
                    cand.groupBy("source").agg(F.count("*").alias("cnt")),
                    1024,
                    "q316_acq_gains",
                )
            }
            best = min(remaining, key=lambda s: (-gains.get(s, 0), s))
            gain = gains.get(best, 0)
            cum += gain
            picked.append((r, best, gain, cum, cum * 1_000_000 // total))
            newtoks = toks.filter(F.col("source") == best).select("tok")
            covered = local_checkpoint(
                newtoks
                if covered is None
                else covered.union(newtoks).distinct(),
                f"q316 covered after pick {r}",
            )
        return spark.createDataFrame(picked, schema)

    return collect_and_solve(
        src_toks,
        ACQ_COLLECT_TOKENS,
        "q316_source_acquisition_order",
        lambda toks: spark.createDataFrame(_acq_collected_solve(toks), schema),
        _distributed,
    )


# ---------------------------------------------------------------------------
# q317 — Kneser-Ney bigram scoring (continuation-probability smoothing)
# ---------------------------------------------------------------------------

#: absolute discount subtracted from every observed bigram count —
#: 0.75 is the standard fixed-D choice (Chen & Goodman 1999) and is
#: exactly representable in binary, so (cab - D) is bit-identical in
#: both engines
KN_DISCOUNT = 0.75


def _q317_oracle() -> str:
    p = (
        f"((bc.cab - {KN_DISCOUNT}) / lc.ca "
        f"+ ({KN_DISCOUNT} * lc.n1pa / lc.ca) * (rc.n1mb * 1.0 / bt.btot))"
    )
    return f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    db AS (SELECT doc_id, words[i] AS a, words[i+1] AS b
           FROM w, unnest(generate_series(1, len(words) - 1)) s(i)),
    bcnt AS (SELECT a, b, COUNT(*) AS cab FROM db GROUP BY a, b),
    lc AS (SELECT a, SUM(cab) AS ca, COUNT(*) AS n1pa FROM bcnt GROUP BY a),
    rc AS (SELECT b, COUNT(*) AS n1mb FROM bcnt GROUP BY b),
    bt AS (SELECT COUNT(*) AS btot FROM bcnt),
    scored AS (
      SELECT db.doc_id, -log2({p}) AS nll,
             CASE WHEN bc.cab = 1 THEN 1 ELSE 0 END AS hapax
      FROM db JOIN bcnt bc ON db.a = bc.a AND db.b = bc.b
              JOIN lc ON db.a = lc.a
              JOIN rc ON db.b = rc.b, bt)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(hapax) AS BIGINT) AS n_hapax_bigrams,
           (ROUND(AVG(nll), 4) + 0.0) AS mean_nll_bits
    FROM scored GROUP BY doc_id
    """


@query("q317_kneser_ney_score", oracle=_q317_oracle())
def q317_kneser_ney_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring: per-document mean −log2
    of P_KN(b|a) = (c(a,b) − D)/c(a·) + D·N1+(a·)/c(a·) · N1+(·b)/N1+(··)
    under the corpus's own counts — the smoothing the CCNet / kenlm
    perplexity filters actually run (Chen & Goodman 1999), one rung up
    from q121's Jelinek-Mercer interpolation: the backoff mass is the
    CONTINUATION probability (how many distinct left contexts a word
    completes), not the raw unigram frequency, so boilerplate tokens
    that are frequent but context-locked score as unpredictable instead
    of free.  ``n_hapax_bigrams`` counts the doc's count-1 bigrams —
    the mass the discount D removes entirely, the per-doc novelty
    signal a curation pass reads next to the score.

    Parity: D = 0.75 (binary-exact); the probability expression is
    written with the same association order in both engines; the
    unordered float mean is pinned by the 4-dp round (q74/q121's
    discipline).

    Scale shape (cf. q121): one bigram-type hash agg (constant-width
    (a, b) token keys, never document text), two token-keyed context
    aggs DERIVED from the type table (left-context totals + distinct
    continuation fan-outs), a 1-row broadcast bigram-type total, then
    one doc-keyed hash agg.  No new shuffle class over q121 — the
    continuation statistics fall out of the same bcnt frame.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    words = F.split(F.col("text"), " ")
    w = docs.select("doc_id", words.alias("words"))
    n1 = F.size(F.col("words")) - 1
    pairs = F.zip_with(
        F.slice(F.col("words"), 1, n1),
        F.slice(F.col("words"), 2, n1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    db = w.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", "p.a", "p.b"
    )
    bcnt = db.groupBy("a", "b").agg(F.count("*").alias("cab"))
    lc = bcnt.groupBy("a").agg(
        F.sum("cab").alias("ca"), F.count("*").alias("n1pa")
    )
    rc = bcnt.groupBy("b").agg(F.count("*").alias("n1mb"))
    bt = bcnt.agg(F.count("*").alias("btot"))
    prob = (F.col("cab") - KN_DISCOUNT) / F.col("ca") + (
        F.lit(KN_DISCOUNT) * F.col("n1pa") / F.col("ca")
    ) * (F.col("n1mb") * 1.0 / F.col("btot"))
    return (
        db.join(bcnt, ["a", "b"])
        .join(lc, "a")
        .join(rc, "b")
        .crossJoin(F.broadcast(bt))
        .select(
            "doc_id",
            (-F.log2(prob)).alias("nll"),
            F.when(F.col("cab") == 1, F.lit(1)).otherwise(F.lit(0)).alias("hapax"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("hapax").cast("long").alias("n_hapax_bigrams"),
            dec(F.avg("nll"), 4).alias("mean_nll_bits"),
        )
    )


# ---------------------------------------------------------------------------
# q318 — margin-based bitext mining (ratio margin, blocked)
# ---------------------------------------------------------------------------

#: neighbor depth of the margin denominators (the k in avg-of-top-k)
BITEXT_K = 4

#: ratio-margin acceptance threshold in micro-units (1.15 = the pair's
#: cosine must beat the mean of both endpoints' top-k neighborhoods by
#: >= 15% — the separation band where sf0.01 keeps ~70% of sources)
BITEXT_MARGIN_T = 1_150_000


def _q318_oracle() -> str:
    cos_u = (
        "CAST(ROUND(list_cosine_similarity(a.embedding::DOUBLE[], "
        "b.embedding::DOUBLE[]) * 1000000, 0) AS BIGINT)"
    )
    return f"""
    WITH a AS (SELECT vec_id, label, embedding FROM embeddings
               WHERE vec_id % 2 = 0),
    b AS (SELECT vec_id, label, embedding FROM embeddings
          WHERE vec_id % 2 = 1),
    pp AS (
      SELECT * FROM (
        SELECT a.vec_id AS src, b.vec_id AS tgt, {cos_u} AS cos_u
        FROM a JOIN b ON a.label = b.label) x
      WHERE cos_u > 0),
    rs AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                                        ORDER BY cos_u DESC, tgt) AS r
           FROM pp),
    asrc AS (SELECT src, SUM(cos_u) AS ssum, COUNT(*) AS sn
             FROM rs WHERE r <= {BITEXT_K} GROUP BY src),
    rt AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY tgt
                                        ORDER BY cos_u DESC, src) AS r
           FROM pp),
    atgt AS (SELECT tgt, SUM(cos_u) AS tsum, COUNT(*) AS tn
             FROM rt WHERE r <= {BITEXT_K} GROUP BY tgt),
    m AS (
      SELECT pp.src, pp.tgt, pp.cos_u,
             CAST((2 * pp.cos_u * sn * tn * 1000000)
                    // (ssum * tn + tsum * sn) AS BIGINT) AS margin_u
      FROM pp JOIN asrc ON pp.src = asrc.src
              JOIN atgt ON pp.tgt = atgt.tgt),
    best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                                          ORDER BY margin_u DESC, tgt) AS rb
             FROM m),
    best_t AS (SELECT tgt, src AS t_best_src FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY tgt
                                              ORDER BY margin_u DESC, src)
                        AS rt FROM m) y WHERE rt = 1)
    SELECT best.src AS src_id, best.tgt AS tgt_id, best.cos_u,
           best.margin_u,
           CAST(CASE WHEN bt.t_best_src = best.src THEN 1 ELSE 0 END
                AS BIGINT) AS mutual
    FROM best LEFT JOIN best_t bt ON best.tgt = bt.tgt
    WHERE rb = 1 AND margin_u >= {BITEXT_MARGIN_T}
    """


@query("q318_bitext_margin_mining", oracle=_q318_oracle())
def q318_bitext_margin_mining(
    spark: SparkSession, sf_dir: str, block_splits: int = 1
) -> DataFrame:
    """Margin-based parallel-pair mining (the CCMatrix / LASER ratio
    margin, Artetxe & Schwenk 2019): split the corpus into two pools
    (even/odd vec_id — the two "languages"), and for each source
    vector accept its best candidate only when the pair's cosine beats
    the MEAN of both endpoints' top-{BITEXT_K} neighborhoods by the
    ratio threshold — absolute-cosine cuts can't separate hubs (vectors
    near everything) from true translations; the margin can.
    ``mutual`` flags pairs that are ALSO the target's best source (the
    high-precision subset a bitext curation pass ships first).

    Parity: the margin is EXACT integer arithmetic — cosines quantize
    to micro-units (the q116 ROUND(x*1e6) idiom), the two top-k
    averages stay as (sum, count) integer pairs, and the ratio is one
    BIGINT floor division — no float averaging anywhere past the
    per-pair cosine round.

    Scale shape (the q44 discipline): candidates are label-blocked
    (coarse-quantizer cells), never all-pairs — the pair frame is one
    hash join on the cell key; both margin denominators are
    partitioned-window top-k aggs over that SAME persisted frame
    (constant-width (src, tgt, cos_u) rows, document text never
    shuffles); skewed cells split by AQE.  At 100 TB the pools are
    per-language corpora, the blocks are IVF cells from q47's
    quantizer, and the mining stays one cell-local join + two
    neighborhood aggs per direction.  The CONTRACT (q96's regime) is
    that blocking granularity grows WITH the corpus so block size
    stays constant — ``block_splits`` is that knob for the scaling
    harness (each pool sub-partitions s ways inside a label; the
    registered default s=1 is the oracle-exact configuration).
    """
    emb = _fanout(spark, table(spark, sf_dir, "embeddings"))
    salt = F.expr(f"(vec_id div 2) % {block_splits}")
    a = emb.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("src"),
        "label",
        salt.alias("salt"),
        F.col("embedding").alias("ea"),
    )
    b = emb.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("tgt"),
        "label",
        salt.alias("salt"),
        F.col("embedding").alias("eb"),
    )
    cos_u = F.round(_cosine(F.col("ea"), F.col("eb")) * 1_000_000, 0).cast(
        "long"
    )
    pp = local_checkpoint(
        a.join(b, ["label", "salt"])
        .select("src", "tgt", cos_u.alias("cos_u"))
        .filter(F.col("cos_u") > 0),
        "q318 blocked candidate pairs",
    )
    ws = W.partitionBy("src").orderBy(F.col("cos_u").desc(), "tgt")
    asrc = (
        pp.withColumn("r", F.row_number().over(ws))
        .filter(F.col("r") <= BITEXT_K)
        .groupBy("src")
        .agg(F.sum("cos_u").alias("ssum"), F.count("*").alias("sn"))
    )
    wt = W.partitionBy("tgt").orderBy(F.col("cos_u").desc(), "src")
    atgt = (
        pp.withColumn("r", F.row_number().over(wt))
        .filter(F.col("r") <= BITEXT_K)
        .groupBy("tgt")
        .agg(F.sum("cos_u").alias("tsum"), F.count("*").alias("tn"))
    )
    m = local_checkpoint(
        pp.join(asrc, "src")
        .join(atgt, "tgt")
        .withColumn(
            "margin_u",
            F.expr(
                "(2 * cos_u * sn * tn * 1000000) div (ssum * tn + tsum * sn)"
            ),
        )
        .select("src", "tgt", "cos_u", "margin_u"),
        "q318 margin-scored pairs",
    )
    wb = W.partitionBy("src").orderBy(F.col("margin_u").desc(), "tgt")
    best = (
        m.withColumn("rb", F.row_number().over(wb))
        .filter((F.col("rb") == 1) & (F.col("margin_u") >= BITEXT_MARGIN_T))
        .drop("rb")
    )
    wbt = W.partitionBy("tgt").orderBy(F.col("margin_u").desc(), "src")
    best_t = (
        m.withColumn("rt", F.row_number().over(wbt))
        .filter(F.col("rt") == 1)
        .select("tgt", F.col("src").alias("t_best_src"))
    )
    return (
        best.join(best_t, "tgt", "left")
        .select(
            F.col("src").alias("src_id"),
            F.col("tgt").alias("tgt_id"),
            "cos_u",
            "margin_u",
            F.when(F.col("t_best_src") == F.col("src"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("mutual"),
        )
    )


# ---------------------------------------------------------------------------
# q319 — padding-waste audit (arrival vs length-sorted batching)
# ---------------------------------------------------------------------------

#: training batch size (sequences per batch) for the padding audit
PAD_BATCH = 8

#: sequence-length cap — tokens past this truncate (the max_seq_len of
#: the training run the batches feed)
PAD_MAXLEN = 64


def _q319_oracle() -> str:
    base = f"""
      SELECT doc_id, source,
             LEAST(len(string_split(text, ' ')), {PAD_MAXLEN}) AS eff,
             len(string_split(text, ' '))
               - LEAST(len(string_split(text, ' ')), {PAD_MAXLEN}) AS trunc
      FROM documents"""
    return f"""
    WITH base AS ({base}),
    ranked AS (
      SELECT *,
             'arrival' AS policy,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM base
      UNION ALL
      SELECT *,
             'sorted' AS policy,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY eff, doc_id) AS rn
      FROM base),
    batches AS (
      SELECT source, policy, (rn - 1) // {PAD_BATCH} AS batch,
             COUNT(*) AS n, MAX(eff) AS mx,
             SUM(eff) AS real, SUM(trunc) AS trunc
      FROM ranked GROUP BY 1, 2, 3)
    SELECT source, policy,
           CAST(COUNT(*) AS BIGINT) AS n_batches,
           CAST(SUM(real) AS BIGINT) AS real_tokens,
           CAST(SUM(n * mx) AS BIGINT) AS padded_tokens,
           CAST(SUM(trunc) AS BIGINT) AS truncated_tokens,
           CAST((SUM(n * mx) - SUM(real)) * 1000000
                  // SUM(n * mx) AS BIGINT) AS waste_u
    FROM batches GROUP BY source, policy
    """


@query("q319_padding_waste_audit", oracle=_q319_oracle())
def q319_padding_waste_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste audit of the training batch layout: per source,
    form {PAD_BATCH}-sequence batches under the ARRIVAL order and
    under LENGTH-SORTED bucketing (each batch pads to its own longest
    member, capped at {PAD_MAXLEN}), and report real vs padded token
    mass, the truncated overflow, and the waste fraction in integer
    micro-units — the measured answer to "how much accelerator time
    does sorting by length actually buy", the audit run before q71's
    packing decides whether concat-packing is worth its attention-mask
    complexity.  Sorted bucketing is never worse per source (pinned by
    a pytest property).

    Scale shape: batching is PER SOURCE (the shard grain a real
    pipeline batches within), so both orderings are partitioned
    windows over a 3-integer-column collapse of the corpus — there is
    NO global sort and no corpus-wide ordered prefix anywhere; the
    per-batch and per-source rollups are two bounded hash aggs
    (|sources| x 2 output rows at any SF).  Entirely integer
    arithmetic end to end.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    ntok = F.size(F.split("text", " "))
    eff = F.least(ntok, F.lit(PAD_MAXLEN))
    base = local_checkpoint(
        docs.select(
            "doc_id",
            "source",
            eff.alias("eff"),
            (ntok - eff).alias("trunc"),
        ),
        "q319 effective-length collapse",
    )
    wa = W.partitionBy("source").orderBy("doc_id")
    wsrt = W.partitionBy("source").orderBy("eff", "doc_id")
    ranked = base.select(
        "source", "eff", "trunc",
        F.lit("arrival").alias("policy"),
        F.row_number().over(wa).alias("rn"),
    ).unionAll(
        base.select(
            "source", "eff", "trunc",
            F.lit("sorted").alias("policy"),
            F.row_number().over(wsrt).alias("rn"),
        )
    )
    batches = (
        ranked.withColumn("batch", F.expr(f"(rn - 1) div {PAD_BATCH}"))
        .groupBy("source", "policy", "batch")
        .agg(
            F.count("*").alias("n"),
            F.max("eff").alias("mx"),
            F.sum("eff").alias("real"),
            F.sum("trunc").alias("trunc"),
        )
    )
    return (
        batches.groupBy("source", "policy")
        .agg(
            F.count("*").cast("long").alias("n_batches"),
            F.sum("real").cast("long").alias("real_tokens"),
            F.sum(F.col("n") * F.col("mx")).cast("long").alias("padded_tokens"),
            F.sum("trunc").cast("long").alias("truncated_tokens"),
        )
        .withColumn(
            "waste_u",
            F.expr(
                "(padded_tokens - real_tokens) * 1000000 div padded_tokens"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q320 — k-center greedy coreset (farthest-point traversal)
# ---------------------------------------------------------------------------

#: coreset size — the number of greedy farthest-point centers
KCENTER_K = 8

_KC_DIST = (
    "1000000 - CAST(ROUND(list_cosine_similarity("
    "{a}.embedding::DOUBLE[], {b}.embedding::DOUBLE[]) * 1000000, 0) "
    "AS BIGINT)"
)


def _q320_oracle() -> str:
    steps = []
    rows = []
    for r in range(1, KCENTER_K + 1):
        if r == 1:
            steps.append(
                "c1 AS (SELECT vec_id, embedding FROM emb "
                "ORDER BY vec_id LIMIT 1)"
            )
            steps.append(
                f"m1 AS (SELECT e.vec_id, e.embedding, "
                f"{_KC_DIST.format(a='e', b='c')} AS mind "
                "FROM emb e, c1 c)"
            )
        else:
            p = r - 1
            steps.append(
                f"c{r} AS (SELECT e.vec_id, e.embedding "
                f"FROM emb e, t{p} WHERE e.vec_id = t{p}.vec_id)"
            )
            steps.append(
                f"m{r} AS (SELECT m.vec_id, m.embedding, "
                f"LEAST(m.mind, {_KC_DIST.format(a='m', b='c')}) AS mind "
                f"FROM m{p} m, c{r} c)"
            )
        steps.append(
            f"t{r} AS (SELECT vec_id, mind FROM m{r} "
            "ORDER BY mind DESC, vec_id LIMIT 1)"
        )
        rows.append(
            f"SELECT CAST({r} AS BIGINT) AS pick_rank, "
            f"(SELECT vec_id FROM c{r}) AS vec_id, "
            f"(SELECT mind FROM t{r}) AS radius_u "
            f"WHERE {r} <= (SELECT COUNT(*) FROM emb)"
        )
    return (
        "WITH emb AS (SELECT vec_id, embedding FROM embeddings),\n"
        + ",\n".join(steps)
        + "\n"
        + "\nUNION ALL ".join(rows)
    )


@query("q320_kcenter_coreset", oracle=_q320_oracle())
def q320_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-center greedy coreset (Gonzalez 1985 farthest-point
    traversal, the 2-approximation): seed with the minimum vec_id,
    then {KCENTER_K - 1} times pick the vector FARTHEST (max min
    cosine-distance) from the selected set — the diversity-first
    selection a curation pass uses to seed balanced fine-tuning pools
    or pick prototype documents, complementary to q236's MMR (which
    trades off against a relevance score) and q64's label centroids
    (which need labels).  Each output row carries the coverage
    ``radius_u`` — the max min-distance AFTER that pick — the
    diminishing-returns curve that says when the coreset is big
    enough.

    Parity: distances are integer micro-units (1e6 − the q116-rounded
    cosine), LEAST-folded per round; pick ties break on vec_id; the
    oracle unrolls the same {KCENTER_K} rounds and guards each output
    row at min(k, n), matching the loop's early stop on a sub-k
    corpus.  The monotone non-increasing radius is pinned by pytest.

    Scale shape: the state is one (vec_id, embedding, mind) frame,
    localCheckpointed per round so lineage stays flat; each round is
    ONE map-side pass (1-row broadcast center attach — no shuffle)
    plus a TakeOrdered(1) argmax; round count is the CONSTANT k, never
    corpus-dependent.  At 100 TB this is k linear scans — the same
    shape as q201's k-means assignment step — and the per-round argmax
    is a per-partition heap + driver merge, not a global sort.
    """
    emb = local_checkpoint(
        _fanout(spark, table(spark, sf_dir, "embeddings")).select(
            "vec_id", "embedding"
        ),
        "q320 embedding state",
    )
    n = emb.count()
    seed = bounded_collect(
        emb.select(F.min("vec_id").alias("v")), 1, "q320_kcenter_seed"
    )[0]["v"]
    d_u = F.lit(1_000_000) - F.round(
        _cosine(F.col("embedding"), F.col("ce")) * 1_000_000, 0
    ).cast("long")
    state = emb.withColumn("mind", F.lit(2_000_001).cast("long"))
    cur = seed
    out: list[tuple[int, int, int]] = []
    for r in range(1, min(KCENTER_K, n) + 1):
        cvec = emb.filter(F.col("vec_id") == cur).select(
            F.col("embedding").alias("ce")
        )
        state = local_checkpoint(
            state.crossJoin(F.broadcast(cvec)).select(
                "vec_id",
                "embedding",
                F.least(F.col("mind"), d_u).alias("mind"),
            ),
            f"q320 min-dist state after pick {r}",
        )
        top = bounded_collect(
            state.select("vec_id", "mind")
            .orderBy(F.col("mind").desc(), "vec_id")
            .limit(1),
            1,
            "q320_kcenter_pick",
        )[0]
        out.append((r, cur, top["mind"]))
        cur = top["vec_id"]
    return spark.createDataFrame(
        out, "pick_rank long, vec_id long, radius_u long"
    )


# ---------------------------------------------------------------------------
# q321 — in-engine logistic regression (IRLS / Newton, fixed steps)
# ---------------------------------------------------------------------------

#: fixed Newton (IRLS) step count — constant, never data-dependent
IRLS_STEPS = 3

#: the label the cheap structural model distills: lang == 'en'
IRLS_TARGET_LANG = "en"

#: Levenberg damping added to the Hessian diagonal — keeps the Newton
#: solve defined when a feature degenerates to a constant (singular
#: Gram matrix); applied TEXTUALLY identically in both engines
IRLS_RIDGE = 1e-06

# Closed-form symmetric-3x3 Newton update, shared TEXTUALLY by the
# DuckDB oracle and the Spark driver solve so both engines walk the
# same expression tree: H = [[a,b,c],[b,d,e],[c,e,f]], gradient
# (g1,g2,g3), det and adjugate cofactors spelled out.
_IRLS_DET = "(a*(d*f - e*e) - b*(b*f - c*e) + c*(b*e - c*d))"
_IRLS_DW = (
    "(((d*f - e*e)*g1 + (c*e - b*f)*g2 + (b*e - c*d)*g3) / {det})",
    "(((c*e - b*f)*g1 + (a*f - c*c)*g2 + (b*c - a*e)*g3) / {det})",
    "(((b*e - c*d)*g1 + (b*c - a*e)*g2 + (a*d - b*b)*g3) / {det})",
)


def _irls_sql_prefix() -> str:
    """The shared IRLS CTE chain: feats → wk0 → (p/s/wk)x{IRLS_STEPS}.
    q321 (the trainer's report) and q323 (the per-source disparity
    audit) both start from this prefix, so their fitted weights are
    definitionally the same model."""
    steps = [
        """feats AS (
      SELECT source,
             CASE WHEN lang = '{tgt}' THEN 1 ELSE 0 END AS y,
             len(string_split(text, ' ')) / 100.0 AS x1,
             len(list_distinct(string_split(text, ' ')))
               / len(string_split(text, ' ')) AS x2
      FROM documents)""".format(tgt=IRLS_TARGET_LANG),
        "wk0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2)",
    ]
    for t in range(1, IRLS_STEPS + 1):
        steps.append(
            f"""p{t} AS (
      SELECT y, x1, x2,
             1.0 / (1.0 + EXP(-(b0 + b1*x1 + b2*x2))) AS p
      FROM feats, wk{t - 1})"""
        )
        steps.append(
            f"""s{t} AS (
      SELECT SUM(p*(1-p)) + {IRLS_RIDGE} AS a, SUM(p*(1-p)*x1) AS b,
             SUM(p*(1-p)*x2) AS c,
             SUM(p*(1-p)*x1*x1) + {IRLS_RIDGE} AS d,
             SUM(p*(1-p)*x1*x2) AS e,
             SUM(p*(1-p)*x2*x2) + {IRLS_RIDGE} AS f,
             SUM(y - p) AS g1, SUM((y - p)*x1) AS g2,
             SUM((y - p)*x2) AS g3
      FROM p{t})"""
        )
        dws = [dw.format(det=_IRLS_DET) for dw in _IRLS_DW]
        steps.append(
            f"""wk{t} AS (
      SELECT b0 + {dws[0]} AS b0,
             b1 + {dws[1]} AS b1,
             b2 + {dws[2]} AS b2
      FROM s{t}, wk{t - 1})"""
        )
    return "WITH " + ",\n    ".join(steps)


def _q321_oracle() -> str:
    k = IRLS_STEPS
    return (
        _irls_sql_prefix()
        + f""",
    pred AS (
      SELECT y, 1.0 / (1.0 + EXP(-(b0 + b1*x1 + b2*x2))) AS p
      FROM feats, wk{k}),
    met AS (
      SELECT CAST(SUM(CASE WHEN (p >= 0.5) = (y = 1) THEN 1 ELSE 0 END)
                    * 1000000 // COUNT(*) AS BIGINT) AS acc_u,
             (ROUND(AVG(-(y*LN(p) + (1 - y)*LN(1 - p))), 4) + 0.0)
               AS mean_nll
      FROM pred)
    SELECT 'intercept' AS feature, (ROUND(b0, 4) + 0.0) AS weight,
           acc_u, mean_nll FROM wk{k}, met
    UNION ALL
    SELECT 'tokens_per_100', (ROUND(b1, 4) + 0.0), acc_u, mean_nll
    FROM wk{k}, met
    UNION ALL
    SELECT 'distinct_ratio', (ROUND(b2, 4) + 0.0), acc_u, mean_nll
    FROM wk{k}, met"""
    )


def _round_half_away(x: float, nd: int = 4) -> float:
    """Half-AWAY-from-zero rounding for driver-side floats that must
    hash-match the oracle's ROUND(): Python's round() is half-to-even,
    so an exact binary-representable 4-dp tie (any odd multiple of
    2^-5, e.g. 0.03125) rounds DOWN in Python and UP in both engines'
    SQL ROUND — the one rounding-mode mismatch in the dec() parity
    discipline (caught in the r12 self-review)."""
    q = math.floor(abs(x) * 10**nd + 0.5) / 10**nd
    return math.copysign(q, x)


def _irls_update(w: list[float], s: dict) -> list[float]:
    """One Newton step from the collected sufficient statistics —
    evaluates the SAME cofactor expressions as the oracle's wk CTE
    (same association order, IEEE doubles in both engines)."""
    a, b, c, d, e, f = s["a"], s["b"], s["c"], s["d"], s["e"], s["f"]
    g1, g2, g3 = s["g1"], s["g2"], s["g3"]
    det = a * (d * f - e * e) - b * (b * f - c * e) + c * (b * e - c * d)
    dw0 = ((d * f - e * e) * g1 + (c * e - b * f) * g2 + (b * e - c * d) * g3) / det
    dw1 = ((c * e - b * f) * g1 + (a * f - c * c) * g2 + (b * c - a * e) * g3) / det
    dw2 = ((b * e - c * d) * g1 + (b * c - a * e) * g2 + (a * d - b * b) * g3) / det
    return [w[0] + dw0, w[1] + dw1, w[2] + dw2]


def _irls_featurize(docs: DataFrame, keep: tuple[str, ...] = ("source",)) -> DataFrame:
    """THE single featurization both the batch trainer and the
    streaming ``GlmMaintainer`` apply (one definition — maintained
    feature state can never silently diverge from the batch model):
    y = target-language label, x1 = tokens/100, x2 = distinct ratio."""
    words = F.split(F.col("text"), " ")
    return docs.select(
        *keep,
        F.when(F.col("lang") == IRLS_TARGET_LANG, F.lit(1))
        .otherwise(F.lit(0))
        .alias("y"),
        (F.size(words) / F.lit(100.0)).alias("x1"),
        (F.size(F.array_distinct(words)) / F.size(words)).alias("x2"),
    )


def _irls_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared (source, y, x1, x2) feature frame, checkpointed —
    the Spark twin of the oracle prefix's ``feats`` CTE."""
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    return local_checkpoint(_irls_featurize(docs), "irls feature frame")


def _irls_p(w: list[float]) -> Column:
    """sigmoid(w·x) with the oracle's association order."""
    z = F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def _irls_fit(feats: DataFrame) -> list[float]:
    """{IRLS_STEPS} Newton steps over the shared feature frame — each
    one map-side sufficient-statistic agg + a 1-row gated collect +
    the shared cofactor solve."""
    w = [0.0, 0.0, 0.0]
    for _ in range(IRLS_STEPS):
        p = _irls_p(w)
        r = p * (1 - p)
        stats = bounded_collect(
            feats.agg(
                (F.sum(r) + F.lit(IRLS_RIDGE)).alias("a"),
                F.sum(r * F.col("x1")).alias("b"),
                F.sum(r * F.col("x2")).alias("c"),
                (F.sum(r * F.col("x1") * F.col("x1")) + F.lit(IRLS_RIDGE)).alias("d"),
                F.sum(r * F.col("x1") * F.col("x2")).alias("e"),
                (F.sum(r * F.col("x2") * F.col("x2")) + F.lit(IRLS_RIDGE)).alias("f"),
                F.sum(F.col("y") - p).alias("g1"),
                F.sum((F.col("y") - p) * F.col("x1")).alias("g2"),
                F.sum((F.col("y") - p) * F.col("x2")).alias("g3"),
            ),
            1,
            "q321_irls_stats",
        )[0].asDict()
        w = _irls_update(w, stats)
    return w


@query("q321_logistic_irls", oracle=_q321_oracle())
def q321_logistic_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine GLM training: logistic regression fit by {IRLS_STEPS}
    exact Newton (IRLS) steps — the engine TRAINS the model, not just
    scores one.  Label = (lang == '{IRLS_TARGET_LANG}'); features =
    intercept + token count (per 100) + distinct-token ratio — the
    "distill an expensive label into a cheap structural model" pattern
    a curation stack uses to replace a slow classifier with a scan-time
    scorer (q97 scores by likelihood RATIOS with no trained weights;
    q212's isotonic fit is 1-D and monotone; this is the multivariate
    discriminative trainer).  Output: the fitted coefficients plus the
    training accuracy (integer micro-units) and mean log-loss.

    Parity: both engines walk the same expression tree — the
    symmetric-3x3 Newton update is ONE shared cofactor formula
    (_IRLS_DET/_IRLS_DW, textually identical in the oracle SQL and the
    driver solve), sigmoid/log terms are written in the same
    association order, and the outputs round at the edge (4-dp
    weights/log-loss, micro-unit accuracy — the q97/q121 float
    discipline).

    Scale shape: each Newton step is ONE map-side pass (weights enter
    as literals — no join, no shuffle) into a 9-term hash agg; the
    step count is a CONSTANT; the solve is a 1-row collect + a 3x3
    closed form.  At 100 TB this is the canonical distributed-GLM
    shape: sufficient statistics reduce tree-style, the model state
    never exceeds 3 doubles.
    """
    feats = _irls_feats(spark, sf_dir)
    w = _irls_fit(feats)
    p = _irls_p(w)
    met = feats.agg(
        F.sum(
            F.when((p >= 0.5) == (F.col("y") == 1), F.lit(1)).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("ncorrect"),
        F.count("*").alias("n"),
        dec(
            F.avg(
                -(
                    F.col("y") * F.log(p)
                    + (F.lit(1) - F.col("y")) * F.log(F.lit(1.0) - p)
                )
            ),
            4,
        ).alias("mean_nll"),
    ).select(
        F.expr("CAST(ncorrect * 1000000 div n AS BIGINT)").alias("acc_u"),
        "mean_nll",
    )
    names = ["intercept", "tokens_per_100", "distinct_ratio"]
    coef = spark.createDataFrame(
        [(n, _round_half_away(wi)) for n, wi in zip(names, w)],
        "feature string, weight double",
    )
    return coef.crossJoin(F.broadcast(met))


# ---------------------------------------------------------------------------
# q322 — weighted (multiset) Jaccard verification
# ---------------------------------------------------------------------------

#: weighted-Jaccard acceptance threshold in micro-units (0.6 — the
#: band where repetition-inflated lookalikes fall out but true
#: near-dups at the fixture's >=0.9 mass overlap stay in)
WJ_T_U = 600_000


def _q322_oracle() -> str:
    return f"""
    WITH docs AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
    anch_raw AS (SELECT doc_id,
             unnest((list_sort(list_transform(sh, s -> md5(s))))[1:{ANCHOR_K}]) AS a
             FROM docs),
    anch AS (SELECT doc_id, a FROM anch_raw
             QUALIFY row_number() OVER (PARTITION BY a
                                        ORDER BY doc_id) <= {BUCKET_CAP}),
    cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
             FROM anch x JOIN anch y ON x.a = y.a AND x.doc_id < y.doc_id),
    tc AS (SELECT doc_id, w, COUNT(*) AS c FROM (
             SELECT doc_id, unnest(string_split(text, ' ')) AS w
             FROM documents) z GROUP BY 1, 2),
    tot AS (SELECT doc_id, SUM(c) AS n FROM tc GROUP BY 1),
    inter AS (
      SELECT cand.doc_a, cand.doc_b, SUM(LEAST(ta.c, tb.c)) AS i
      FROM cand JOIN tc ta ON ta.doc_id = cand.doc_a
                JOIN tc tb ON tb.doc_id = cand.doc_b AND tb.w = ta.w
      GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           CAST(i AS BIGINT) AS inter_tokens,
           CAST(i * 1000000 // (na.n + nb.n - i) AS BIGINT) AS wjaccard_u
    FROM inter JOIN tot na ON doc_a = na.doc_id
               JOIN tot nb ON doc_b = nb.doc_id
    WHERE i * 1000000 // (na.n + nb.n - i) >= {WJ_T_U}
    """


@query("q322_weighted_jaccard", oracle=_q322_oracle())
def q322_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (multiset) Jaccard near-dup verification:
    J_w = Σ_t min(cA_t, cB_t) / Σ_t max(cA_t, cB_t) over TOKEN
    MULTIPLICITIES — the verification q43's distinct-set Jaccard
    cannot express: a doc padded with a repeated filler token shares
    almost the full distinct-shingle SET with its source (set-J ~ 1.0)
    while barely half its token MASS matches (J_w ~ 0.5), so the
    weighted cut rejects repetition-inflated lookalikes that set
    semantics wave through (planted pytest pins exactly that pair,
    plus a true near-dup that passes both).  Candidates come from
    q69's bottom-{ANCHOR_K} MinHash anchor blocking (capped buckets,
    observable counters) — never an all-pairs join.

    Parity: everything is integer — token counts, LEAST fold, and one
    BIGINT floor division to micro-units; Σ max falls out of the
    multiset identity Σmax = nA + nB − Σmin, so only the intersection
    aggregates.

    Scale shape: the verification joins are (doc_id)- and
    (doc_id, token)-keyed hash joins between the bounded candidate
    pair table and the per-doc token-count frame (constant-width keys,
    text never shuffles); candidate cardinality is governed by the
    anchor-bucket cap exactly as in q69/q43.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    cand = _anchor_pair_candidates(docs, "q322_weighted_jaccard")
    tc = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    tot = tc.groupBy("doc_id").agg(F.sum("c").alias("n"))
    ta = tc.select(
        F.col("doc_id").alias("doc_a"), "w", F.col("c").alias("ca")
    )
    tb = tc.select(
        F.col("doc_id").alias("doc_b"), "w", F.col("c").alias("cb")
    )
    inter = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "w"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.least("ca", "cb")).alias("i"))
    )
    na = tot.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = tot.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "wjaccard_u", F.expr("i * 1000000 div (na + nb - i)")
        )
        .filter(F.col("wjaccard_u") >= WJ_T_U)
        .select(
            "doc_a",
            "doc_b",
            F.col("i").cast("long").alias("inter_tokens"),
            F.col("wjaccard_u").cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# q323 — per-source model disparity audit (worst-group evaluation)
# ---------------------------------------------------------------------------


def _q323_oracle() -> str:
    k = IRLS_STEPS
    return (
        _irls_sql_prefix()
        + f""",
    predq AS (
      SELECT source, y, 1.0 / (1.0 + EXP(-(b0 + b1*x1 + b2*x2))) AS p
      FROM feats, wk{k}),
    per AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN (p >= 0.5) = (y = 1) THEN 1 ELSE 0 END)
                    * 1000000 // COUNT(*) AS BIGINT) AS acc_u,
             (ROUND(AVG(-(y*LN(p) + (1 - y)*LN(1 - p))), 4) + 0.0)
               AS mean_nll
      FROM predq GROUP BY source),
    gmet AS (
      SELECT (ROUND(AVG(-(y*LN(p) + (1 - y)*LN(1 - p))), 4) + 0.0)
               AS gnll
      FROM predq),
    worst AS (
      SELECT source AS worst_source FROM per
      ORDER BY mean_nll DESC, source LIMIT 1)
    SELECT per.source, per.n_docs, per.acc_u, per.mean_nll,
           (ROUND(per.mean_nll - gmet.gnll, 4) + 0.0) AS nll_gap,
           CAST(CASE WHEN per.source = worst.worst_source
                THEN 1 ELSE 0 END AS BIGINT) AS is_worst
    FROM per, gmet, worst"""
    )


@query("q323_model_disparity_audit", oracle=_q323_oracle())
def q323_model_disparity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst-group evaluation of the q321 model: refit the SAME
    logistic model (shared feature frame, shared IRLS solve — the
    weights are definitionally q321's), then break the training metrics
    out PER SOURCE: accuracy, mean log-loss, the gap to the corpus
    log-loss, and the worst-group flag — the group-robustness audit
    (the Group-DRO question: "which slice is this model failing?") a
    curation stack runs before trusting a distilled quality model on a
    new crawl; a source whose gap blows out is out-of-distribution for
    the cheap model and must keep the expensive labeler.

    Parity: the model is the shared IRLS prefix (one expression tree in
    both engines); per-source accuracy is integer micro-units;
    log-losses round at 4dp and the gap is a difference of the two
    ROUNDED values (identical inputs in both engines); the worst pick
    tie-breaks on source.

    Scale shape: one extra |sources|-bounded hash agg and a
    TakeOrdered(1) worst pick on top of q321's constant-pass training —
    the audit costs one scan more than the fit, never a new shuffle
    class.
    """
    feats = _irls_feats(spark, sf_dir)
    w = _irls_fit(feats)
    p = _irls_p(w)
    nll = -(
        F.col("y") * F.log(p)
        + (F.lit(1) - F.col("y")) * F.log(F.lit(1.0) - p)
    )
    per = local_checkpoint(
        feats.groupBy("source").agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(
                F.when((p >= 0.5) == (F.col("y") == 1), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("ncorrect"),
            dec(F.avg(nll), 4).alias("mean_nll"),
        ).select(
            "source",
            "n_docs",
            F.expr("CAST(ncorrect * 1000000 div n_docs AS BIGINT)").alias(
                "acc_u"
            ),
            "mean_nll",
        ),
        "q323 per-source metrics",
    )
    glob = feats.agg(dec(F.avg(nll), 4).alias("gnll"))
    worst = per.orderBy(F.col("mean_nll").desc(), "source").limit(1).select(
        F.col("source").alias("worst_source")
    )
    return (
        per.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(worst))
        .select(
            "source",
            "n_docs",
            "acc_u",
            "mean_nll",
            dec(F.col("mean_nll") - F.col("gnll"), 4).alias("nll_gap"),
            F.when(F.col("source") == F.col("worst_source"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("is_worst"),
        )
    )


# ---------------------------------------------------------------------------
# q324 — held-out perplexity contamination screen
# ---------------------------------------------------------------------------

#: an eval doc whose mean NLL is below this fraction of the TRAIN
#: corpus's own mean NLL reads as "memorized" — the leak suspicion cut
LEAK_FRAC = 0.75

#: add-alpha smoothing mass — LIGHT (0.01, the kenlm-style regime),
#: because add-1 over a web-scale vocabulary flattens every
#: probability toward 1/V and erases the very predictability gap the
#: screen measures (both engines parse the literal to the same double)
LM_ALPHA = 0.01


def _q324_oracle() -> str:
    b = f"('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % {EVAL_MOD}"
    lam, oml, al = LM_LAMBDA, 1 - LM_LAMBDA, LM_ALPHA
    p = (
        f"({lam} * ((COALESCE(bc.cab, 0) + {al}) / "
        f"(COALESCE(ua.c, 0) + {al} * v.v)) "
        f"+ {oml} * ((COALESCE(ub.c, 0) + {al}) / (t.t + {al} * v.v)))"
    )
    return f"""
    WITH tagged AS (SELECT doc_id, text, {b} = 0 AS is_eval FROM documents),
    w AS (SELECT doc_id, is_eval, string_split(text, ' ') AS words FROM tagged),
    db AS (SELECT doc_id, is_eval, words[i] AS a, words[i+1] AS b
           FROM w, unnest(generate_series(1, len(words) - 1)) s(i)),
    uni AS (SELECT tok, COUNT(*) AS c FROM (
              SELECT unnest(words) AS tok FROM w WHERE NOT is_eval) z
            GROUP BY tok),
    t AS (SELECT SUM(c) AS t FROM uni),
    v AS (SELECT COUNT(*) AS v FROM uni),
    bcnt AS (SELECT a, b, COUNT(*) AS cab FROM db
             WHERE NOT is_eval GROUP BY a, b),
    scored AS (
      SELECT db.doc_id, db.is_eval, -log2({p}) AS nll,
             CASE WHEN bc.cab IS NULL THEN 1 ELSE 0 END AS oov
      FROM db LEFT JOIN bcnt bc ON db.a = bc.a AND db.b = bc.b
              LEFT JOIN uni ua ON db.a = ua.tok
              LEFT JOIN uni ub ON db.b = ub.tok, t, v),
    ref AS (SELECT (ROUND(AVG(nll), 4) + 0.0) AS train_nll
            FROM scored WHERE NOT is_eval)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(oov) AS BIGINT) AS n_oov_bigrams,
           (ROUND(AVG(nll), 4) + 0.0) AS mean_nll_bits,
           CAST(CASE WHEN ROUND(AVG(nll), 4) < {LEAK_FRAC} * ref.train_nll
                THEN 1 ELSE 0 END AS BIGINT) AS leak_flag
    FROM scored, ref WHERE is_eval GROUP BY doc_id, ref.train_nll
    """


@query("q324_perplexity_contamination", oracle=_q324_oracle())
def q324_perplexity_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out perplexity contamination screen: train the bigram LM
    on the TRAIN split only (q148's md5-bucket rule, add-{LM_ALPHA}
    smoothing over the train vocabulary so OOV eval bigrams stay
    finite WITHOUT flattening the predictability gap), score every
    EVAL document, and flag docs whose mean NLL is anomalously BELOW
    the train corpus's own mean — a held-out document the train-split
    model predicts better than its own training text is the
    statistical signature of leakage, catching paraphrased
    contamination that q95's exact 13-gram overlap misses and q303's
    embedding screen only sees if the encoder does.  The fourth
    decontamination modality (exact n-gram q95 / LSH q109 / semantic
    q303 / statistical LM q324).  ``n_oov_bigrams`` counts eval
    bigrams unseen in train — the coverage denominator a reviewer
    reads next to the flag.

    Parity: add-alpha-smoothed JM interpolation written in the same
    association order in both engines; the unordered float means pin
    at the 4-dp round (q121's discipline); the leak cut compares the
    ROUNDED doc score against {LEAK_FRAC} x the ROUNDED train mean.

    Scale shape: train counts are token-keyed hash aggs; eval scoring
    joins on (a, b)/token keys with constant-width keys; the train
    reference is a 1-row broadcast attach; output is |eval split|
    rows.  Identical shuffle classes to q121 — the split tag rides
    the scan.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("bigint") % EVAL_MOD
    words = F.split(F.col("text"), " ")
    w = docs.select(
        "doc_id", (bucket == 0).alias("is_eval"), words.alias("words")
    )
    n1 = F.size(F.col("words")) - 1
    pairs = F.zip_with(
        F.slice(F.col("words"), 1, n1),
        F.slice(F.col("words"), 2, n1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    db = w.select("doc_id", "is_eval", F.explode(pairs).alias("p")).select(
        "doc_id", "is_eval", "p.a", "p.b"
    )
    train_toks = w.filter(~F.col("is_eval")).select(
        F.explode("words").alias("tok")
    )
    uni = train_toks.groupBy("tok").agg(F.count("*").alias("c"))
    tv = uni.agg(
        F.sum("c").alias("t"), F.count("*").alias("v")
    )
    bcnt = (
        db.filter(~F.col("is_eval"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("cab"))
    )
    ua = uni.select(F.col("tok").alias("a"), F.col("c").alias("ca"))
    ub = uni.select(F.col("tok").alias("b"), F.col("c").alias("cb"))
    lam, al = F.lit(LM_LAMBDA), F.lit(LM_ALPHA)
    prob = lam * (
        (F.coalesce(F.col("cab"), F.lit(0)) + al)
        / (F.coalesce(F.col("ca"), F.lit(0)) + al * F.col("v"))
    ) + F.lit(1 - LM_LAMBDA) * (
        (F.coalesce(F.col("cb"), F.lit(0)) + al) / (F.col("t") + al * F.col("v"))
    )
    scored = local_checkpoint(
        db.join(bcnt, ["a", "b"], "left")
        .join(ua, "a", "left")
        .join(ub, "b", "left")
        .crossJoin(F.broadcast(tv))
        .select(
            "doc_id",
            "is_eval",
            (-F.log2(prob)).alias("nll"),
            F.when(F.col("cab").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("oov"),
        ),
        "q324 scored bigrams",
    )
    ref = scored.filter(~F.col("is_eval")).agg(
        dec(F.avg("nll"), 4).alias("train_nll")
    )
    return (
        scored.filter(F.col("is_eval"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("oov").cast("long").alias("n_oov_bigrams"),
            dec(F.avg("nll"), 4).alias("mean_nll_bits"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "doc_id",
            "n_bigrams",
            "n_oov_bigrams",
            "mean_nll_bits",
            F.when(
                F.col("mean_nll_bits") < F.lit(LEAK_FRAC) * F.col("train_nll"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("leak_flag"),
        )
    )


# ---------------------------------------------------------------------------
# q325 — seed-set expansion via personalized PageRank (integer)
# ---------------------------------------------------------------------------

PPR_ITERS = 5
PPR_SCALE = 1_000_000  # fixed-point unit: rank 1.0 == 1e6 units
PPR_DAMP_NUM, PPR_DAMP_DEN = 85, 100
PPR_NSEEDS = 8  # the curated seed set: the 8 smallest doc ids in graph

#: restart numerator: (1-damping) * SCALE, exact integer (= 150000)
PPR_SEED_NUM = PPR_SCALE * (PPR_DAMP_DEN - PPR_DAMP_NUM) // PPR_DAMP_DEN

#: under this edge count the power iterations solve driver-side in
#: numpy int64 (the q183 collect-and-solve lever); gate pinned above
#: the x10 fixture's edge cardinality in tests/test_route_gates.py
PPR_COLLECT_EDGES = 2_000_000


def _ppr_collected_solve(spark: SparkSession, shares) -> DataFrame:
    """Driver-side PPR over the collected (src, dst, deg) symmetric
    edges — identical floor-division fixed-point arithmetic to the
    distributed loop and the SQL oracle (all operands nonnegative
    int64), bit-identical ranks (the q183 _pr_collected_solve idiom
    with a seed-concentrated restart vector)."""
    import numpy as np

    pdf = shares.toPandas()
    src = pdf["src"].to_numpy(np.int64)
    dst = pdf["dst"].to_numpy(np.int64)
    deg = pdf["deg"].to_numpy(np.int64)
    nodes = np.unique(src)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    n = len(nodes)
    seed_base = (PPR_SEED_NUM * n) // PPR_NSEEDS
    sb = np.zeros(n, np.int64)
    sb[: min(PPR_NSEEDS, n)] = seed_base  # np.unique is sorted
    r = sb.copy()
    for _ in range(PPR_ITERS):
        inflow = np.zeros(n, np.int64)
        np.add.at(inflow, di, r[si] // deg)
        r = sb + (PPR_DAMP_NUM * inflow) // PPR_DAMP_DEN
    return spark.createDataFrame(
        [
            (int(nd), int(v), int(1 if s > 0 else 0))
            for nd, v, s in zip(nodes, r, sb)
        ],
        schema="doc_id bigint, ppr_units bigint, is_seed bigint",
    )


def _q325_oracle() -> str:
    prev = "pr0"
    iters = []
    for k in range(1, PPR_ITERS + 1):
        iters.append(f"""
    pr{k} AS (
      SELECT sv.node,
             CAST(sv.sb + ({PPR_DAMP_NUM} * COALESCE(i.inflow, 0))
                  // {PPR_DAMP_DEN} AS BIGINT) AS r
      FROM sv LEFT JOIN (
        SELECT s.dst AS node, SUM(p.r // dg.deg) AS inflow
        FROM sym s
        JOIN {prev} p ON p.node = s.src
        JOIN deg dg ON dg.node = s.src
        GROUP BY 1) i ON i.node = sv.node)""")
        prev = f"pr{k}"
    return f"""
    WITH docs AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
    anch_raw AS (SELECT doc_id,
             unnest((list_sort(list_transform(sh, s -> md5(s))))[1:{ANCHOR_K}]) AS a
             FROM docs),
    anch AS (SELECT doc_id, a FROM anch_raw
             QUALIFY row_number() OVER (PARTITION BY a
                                        ORDER BY doc_id) <= {BUCKET_CAP}),
    e AS (SELECT DISTINCT x.doc_id AS src, y.doc_id AS dst
          FROM anch x JOIN anch y ON x.a = y.a AND x.doc_id < y.doc_id),
    sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
    nodes AS (SELECT DISTINCT src AS node FROM sym),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM sym GROUP BY 1),
    cnt AS (SELECT COUNT(*) AS n FROM nodes),
    seeds AS (SELECT node FROM nodes ORDER BY node LIMIT {PPR_NSEEDS}),
    sv AS (SELECT nd.node,
                  CASE WHEN s.node IS NOT NULL
                       THEN ({PPR_SEED_NUM} * (SELECT n FROM cnt))
                              // {PPR_NSEEDS}
                       ELSE 0 END AS sb
           FROM nodes nd LEFT JOIN seeds s ON nd.node = s.node),
    pr0 AS (SELECT node, CAST(sb AS BIGINT) AS r FROM sv),
    {','.join(iters)}
    SELECT p.node AS doc_id, p.r AS ppr_units,
           CAST(CASE WHEN sv.sb > 0 THEN 1 ELSE 0 END AS BIGINT) AS is_seed
    FROM {prev} p JOIN sv ON p.node = sv.node
    """


@query("q325_ppr_seed_expansion", oracle=_q325_oracle())
def q325_ppr_seed_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed-set EXPANSION via personalized PageRank: {PPR_ITERS} power
    iterations over q69's anchor-blocked document similarity graph
    with the restart mass concentrated on a {PPR_NSEEDS}-doc seed set
    — the "grow a curated seed corpus by graph proximity" selector
    (seed-based data selection: rank the whole graph by proximity to
    trusted exemplars), which q183's global PageRank cannot express
    (its restart is uniform — centrality, not relevance-to-seeds) and
    q96/q303's embedding screens only approximate when the similarity
    signal is lexical.

    Everything runs in INTEGER fixed-point (the q183 discipline):
    restart = {PPR_SEED_NUM}·n/{PPR_NSEEDS} units on each seed and 0
    elsewhere, each node ships floor(r/deg) along every edge, damped
    update floors at {PPR_DAMP_NUM}/{PPR_DAMP_DEN} — integer sums are
    order-independent, so ranks are bit-identical across engines and
    across the collected/distributed routes.

    Scale shape: the edge build is q69's capped anchor blocking;
    under PPR_COLLECT_EDGES the iterations solve driver-side in numpy
    int64 (one collect, the q183/q221 lever); above it each round is
    ONE node-keyed join + ONE hash agg with two-round localCheckpoint
    cadence; output is |docs in the graph| rows either way.
    """
    docs = _fanout(spark, table(spark, sf_dir, "documents"))
    edges = _anchor_pair_candidates(docs, "q325_ppr_seed_expansion").select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    sym = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("deg")
    )
    shares = local_checkpoint(
        sym.join(deg, sym.src == deg.node).select("src", "dst", "deg"),
        "q325 degree-weighted edges",
    )

    def _distributed(shr: DataFrame) -> DataFrame:
        nodes = deg.select("node").persist()
        n = nodes.count()
        seed_base = (PPR_SEED_NUM * n) // PPR_NSEEDS
        seeds = [
            r["node"]
            for r in bounded_collect(
                nodes.orderBy("node").limit(PPR_NSEEDS),
                PPR_NSEEDS,
                "q325_ppr_seeds",
            )
        ]
        sv = local_checkpoint(
            nodes.select(
                "node",
                F.when(F.col("node").isin(seeds), F.lit(seed_base))
                .otherwise(F.lit(0))
                .cast("long")
                .alias("sb"),
            ),
            "q325 restart vector",
        )
        cur = sv.select("node", F.col("sb").alias("r"))
        for i in range(PPR_ITERS):
            inflow = (
                shr.join(cur, shr.src == cur.node)
                .select(
                    F.col("dst").alias("node"),
                    F.expr("r div deg").alias("share"),
                )
                .groupBy("node")
                .agg(F.sum("share").alias("inflow"))
            )
            nxt = sv.join(inflow, "node", "left").select(
                "node",
                "sb",
                (
                    F.col("sb")
                    + F.expr(
                        f"({PPR_DAMP_NUM} * coalesce(inflow, 0)) "
                        f"div {PPR_DAMP_DEN}"
                    )
                )
                .cast("long")
                .alias("r"),
            )
            cur = (
                local_checkpoint(nxt, "q325 ppr round")
                if i % 2 == 1 or i == PPR_ITERS - 1
                else nxt
            )
        nodes.unpersist()
        return cur.select(
            F.col("node").alias("doc_id"),
            F.col("r").alias("ppr_units"),
            F.when(F.col("sb") > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("is_seed"),
        )

    return collect_and_solve(
        shares,
        PPR_COLLECT_EDGES,
        "q325_ppr_seed_expansion",
        lambda shr: _ppr_collected_solve(spark, shr),
        _distributed,
    )


# ---------------------------------------------------------------------------
# q326 — per-source group influence (data valuation on the GLM)
# ---------------------------------------------------------------------------

# The per-source Newton influence components reuse the IRLS cofactor
# strings with the group-gradient columns substituted, so q321's
# training solve and q326's influence algebra are ONE expression tree.
_INFL_DW = tuple(
    dw.format(det=_IRLS_DET).replace("g1", "gs1").replace("g2", "gs2").replace("g3", "gs3")
    for dw in _IRLS_DW
)


def _q326_oracle() -> str:
    k = IRLS_STEPS
    d1, d2, d3 = _INFL_DW
    return (
        _irls_sql_prefix()
        + f""",
    pf AS (
      SELECT source, y, x1, x2,
             1.0 / (1.0 + EXP(-(b0 + b1*x1 + b2*x2))) AS p
      FROM feats, wk{k}),
    hess AS (
      SELECT SUM(p*(1-p)) + {IRLS_RIDGE} AS a, SUM(p*(1-p)*x1) AS b,
             SUM(p*(1-p)*x2) AS c,
             SUM(p*(1-p)*x1*x1) + {IRLS_RIDGE} AS d,
             SUM(p*(1-p)*x1*x2) AS e,
             SUM(p*(1-p)*x2*x2) + {IRLS_RIDGE} AS f
      FROM pf),
    g AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             SUM(y - p) AS gs1, SUM((y - p)*x1) AS gs2,
             SUM((y - p)*x2) AS gs3
      FROM pf GROUP BY source),
    infl AS (
      SELECT source, n_docs,
             {d1} AS i0, {d2} AS i1, {d3} AS i2,
             gs1, gs2, gs3
      FROM g, hess)
    SELECT source, n_docs,
           (ROUND(i0, 6) + 0.0) AS infl_intercept,
           (ROUND(i1, 6) + 0.0) AS infl_tokens,
           (ROUND(i2, 6) + 0.0) AS infl_distinct,
           (ROUND(gs1*i0 + gs2*i1 + gs3*i2, 6) + 0.0) AS self_influence
    FROM infl"""
    )


@query("q326_group_influence", oracle=_q326_oracle())
def q326_group_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source GROUP INFLUENCE on the q321 model (the Koh & Liang
    influence-function closed form at group grain): influence_s =
    H⁻¹·g_s, where H is the trained model's (ridged) Hessian and g_s
    the source's summed score gradient — the first-order answer to
    "how would the model move if this source were removed", WITHOUT
    refitting per source (a |sources|-fold refit sweep is the thing
    this approximation replaces at scale).  ``self_influence`` =
    g_sᵀH⁻¹g_s ≥ 0 is the scalar leverage each source exerts — the
    data-valuation score read next to q316's acquisition order and
    q323's disparity audit (a source with HIGH influence and BAD
    worst-group metrics is actively steering the model wrong).

    Parity: the model is the shared IRLS prefix; H and g_s are sums at
    the FULL model's p; the per-source solve reuses q321's cofactor
    strings verbatim with group-gradient columns substituted
    (_INFL_DW — one expression tree in both engines); outputs round at
    6dp.

    Scale shape: ONE extra map-side pass over the trained model's
    scores — a 6-term global Hessian agg (1-row broadcast) and a
    |sources|-bounded gradient agg; the influence algebra is
    expression-level on the joined bounded frame.  No refits, no new
    shuffle class over q321.
    """
    feats = _irls_feats(spark, sf_dir)
    w = _irls_fit(feats)
    p = _irls_p(w)
    r = p * (1 - p)
    hess = feats.agg(
        (F.sum(r) + F.lit(IRLS_RIDGE)).alias("a"),
        F.sum(r * F.col("x1")).alias("b"),
        F.sum(r * F.col("x2")).alias("c"),
        (F.sum(r * F.col("x1") * F.col("x1")) + F.lit(IRLS_RIDGE)).alias("d"),
        F.sum(r * F.col("x1") * F.col("x2")).alias("e"),
        (F.sum(r * F.col("x2") * F.col("x2")) + F.lit(IRLS_RIDGE)).alias("f"),
    )
    g = feats.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col("y") - p).alias("gs1"),
        F.sum((F.col("y") - p) * F.col("x1")).alias("gs2"),
        F.sum((F.col("y") - p) * F.col("x2")).alias("gs3"),
    )
    d1, d2, d3 = _INFL_DW
    return (
        g.crossJoin(F.broadcast(hess))
        .select(
            "source",
            "n_docs",
            F.expr(d1).alias("i0"),
            F.expr(d2).alias("i1"),
            F.expr(d3).alias("i2"),
            "gs1",
            "gs2",
            "gs3",
        )
        .select(
            "source",
            "n_docs",
            dec(F.col("i0"), 6).alias("infl_intercept"),
            dec(F.col("i1"), 6).alias("infl_tokens"),
            dec(F.col("i2"), 6).alias("infl_distinct"),
            dec(
                F.col("gs1") * F.col("i0")
                + F.col("gs2") * F.col("i1")
                + F.col("gs3") * F.col("i2"),
                6,
            ).alias("self_influence"),
        )
    )
