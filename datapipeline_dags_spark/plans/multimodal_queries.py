"""Multimodal queries over the fixture tables — the image-corpus twin
of the text dedup family (SURVEY §2.11 "multimodal columns").

No image files ship with the fixtures, so q91 RENDERS a deterministic
IMG1 image per document and then runs the real perceptual-hash dedup
pipeline on the binary column: decode → dHash (Arrow-batched Python,
the codec boundary) → banded blocking + Hamming verify (pure JVM).

The rendering is a bloom-style visual-bag-of-shingles: each word
5-gram (q41's shingle unit) lights NHASH deterministic pixels of a
32x32 grayscale buffer.  It is position-independent by construction —
a single text edit changes <= 2*NHASH pixels — so documents that are
near-duplicates as TEXT render as near-identical IMAGES, which is
precisely the regime perceptual hashing is built for.  Measured on the
fixture: dHash Hamming 0 recovers essentially q41's MinHash near-dup
pair set from pixels alone.

Oracle: the whole pipeline is integer arithmetic over md5 digests —
shingle -> lit pixels (max-composite), nearest-neighbor 9x8 resample,
adjacent-pixel comparison bits, banded blocking, bit_count(xor)
verify — so the DuckDB oracle re-derives the dHash pair list from the
documents table with NO byte-level codec involved: the IMG1
encode/decode round-trip is the identity on the pixel buffer, so the
SQL can skip it and still hash-check every downstream value.  (The
codec itself stays pinned by golden-row tests in
tests/test_multimodal.py.)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from datapipeline_dags_spark.catalog import table
from datapipeline_dags_spark.operators.multimodal import (
    DHASH_BANDS,
    DHASH_H,
    DHASH_W,
    dhash_images,
    dhash_near_dup,
    encode_img1,
)
from datapipeline_dags_spark.plans.llm_ops import _SHINGLES_SQL, SHINGLE_K, _fanout
from datapipeline_dags_spark.plans.registry import query

IMG_SIDE = 32
N_PIXEL_HASHES = 4  # pixels lit per shingle
HAMMING_T = 2


def _q91_oracle() -> str:
    """SQL re-derivation of render -> dHash -> banded near-dup.

    Mirrors, step by step: ``_render_one`` (one md5 per shingle, each
    digest split into {N_PIXEL_HASHES} little-endian (3-byte pixel,
    1-byte intensity) pairs, max-composited into a {IMG_SIDE}x{IMG_SIDE}
    buffer), ``_resample`` (nearest neighbor to {DHASH_W}x{DHASH_H}),
    ``_dhash64`` (MSB-first adjacent-pixel comparison bits), and
    ``dhash_near_dup`` (16-bit band keys, bit_count(xor) <= T).  All
    integer arithmetic — no float anywhere — so the hashes are
    bit-identical across engines.
    """
    side, n_px = IMG_SIDE, IMG_SIDE * IMG_SIDE
    return f"""
    WITH docs AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
    s AS (SELECT doc_id, unnest(sh) AS s FROM docs),
    dig AS (SELECT doc_id, md5(s) AS h FROM s),
    ks AS (SELECT unnest(generate_series(0, {N_PIXEL_HASHES - 1})) AS k),
    hits AS (
      SELECT doc_id,
             (('0x'||substr(h, 8*k+1, 2))::BIGINT
              + ('0x'||substr(h, 8*k+3, 2))::BIGINT * 256
              + ('0x'||substr(h, 8*k+5, 2))::BIGINT * 65536) % {n_px} AS pix,
             ('0x'||substr(h, 8*k+7, 2))::BIGINT AS v
      FROM dig, ks),
    lit AS (SELECT doc_id, pix, MAX(v) AS v FROM hits GROUP BY doc_id, pix),
    grid AS (SELECT x, y,
                    LEAST({side - 1}, (y*{side})//{DHASH_H}) * {side}
                    + LEAST({side - 1}, (x*{side})//{DHASH_W}) AS pos
             FROM (SELECT unnest(generate_series(0, {DHASH_W - 1})) AS x),
                  (SELECT unnest(generate_series(0, {DHASH_H - 1})) AS y)),
    small AS (
      SELECT d.doc_id, g.x, g.y, COALESCE(l.v, 0) AS v
      FROM (SELECT doc_id FROM documents) d
      CROSS JOIN grid g
      LEFT JOIN lit l ON l.doc_id = d.doc_id AND l.pix = g.pos),
    hsh AS (
      SELECT a.doc_id,
             BIT_OR(CASE WHEN a.v > b.v
                    THEN (CAST(1 AS UBIGINT) << (63 - (a.y*{DHASH_W - 1} + a.x)))
                    ELSE CAST(0 AS UBIGINT) END) AS u
      FROM small a JOIN small b
        ON a.doc_id = b.doc_id AND a.y = b.y AND b.x = a.x + 1
      WHERE a.x < {DHASH_W - 1}
      GROUP BY a.doc_id),
    bands AS (
      SELECT doc_id, u, bb.b AS band, (u >> (16*bb.b)) & 65535 AS key
      FROM hsh,
           (SELECT unnest(generate_series(0, {DHASH_BANDS - 1})) AS b) bb),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, a.u AS u_a,
                             c.doc_id AS id_b, c.u AS u_b
             FROM bands a JOIN bands c
               ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id)
    SELECT id_a, id_b, CAST(bit_count(xor(u_a, u_b)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(u_a, u_b)) <= {HAMMING_T}
    """

RENDER_SCHEMA = StructType(
    [StructField("id", LongType()), StructField("content", BinaryType())]
)


def _render_one(text: str, side: int) -> bytes:
    """Visual bag-of-shingles: ONE md5 per shingle, its 16-byte digest
    split into N_PIXEL_HASHES (3-byte pixel, 1-byte intensity) pairs;
    max-composite like a bloom filter.  Deterministic, dense (~NHASH x
    shingles lit pixels), position-independent.  (One digest per
    shingle instead of one per (shingle, k) — same statistical shape,
    4x fewer hash calls; the render dominates q91's runtime.)"""
    words = text.split(" ")
    shingles = (
        {" ".join(words[i : i + SHINGLE_K]) for i in range(len(words) - SHINGLE_K + 1)}
        if len(words) >= SHINGLE_K
        else {text}
    )
    n = side * side
    px = bytearray(n)
    for s in shingles:
        h = hashlib.md5(s.encode()).digest()
        for k in range(N_PIXEL_HASHES):
            b = int.from_bytes(h[4 * k : 4 * k + 3], "little") % n
            v = h[4 * k + 3]
            if v > px[b]:
                px[b] = v
    return encode_img1(side, side, bytes(px))


def render_doc_images(
    spark: SparkSession, sf_dir: str, side: int = IMG_SIDE
) -> DataFrame:
    """Deterministic per-document IMG1 image (see _render_one).  A
    stand-in for a real image column; everything downstream treats the
    bytes as opaque media."""

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf["id"].astype("int64"),
                    "content": [_render_one(t, side) for t in pdf["text"]],
                }
            )

    from datapipeline_dags_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    docs = table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "text"
    )
    return _fanout(spark, docs).mapInPandas(render, RENDER_SCHEMA)


@query("q91_image_phash_neardup", oracle=_q91_oracle())
def q91_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (dHash) image near-dup over the rendered corpus:
    one Arrow pass computes the 64-bit hash per image, then q41's banded
    blocking (4 x 16-bit keys) generates candidates and a single JVM
    expression (bit_count(xor)) verifies Hamming <= HAMMING_T.  Scale
    shape matches q41: the shuffle carries (band, 16-bit key) pairs and
    8-byte hashes, never pixel data.  Hash-checked end to end: the
    DuckDB oracle re-derives the pair list from documents with pure
    integer SQL (see ``_q91_oracle``)."""
    return dhash_near_dup(
        dhash_images(render_doc_images(spark, sf_dir)), hamming_t=HAMMING_T
    )
