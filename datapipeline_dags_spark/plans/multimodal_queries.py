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

Registered WITHOUT an oracle: byte-level codecs are the documented
non-SQL-expressible boundary, so the driver applies its rows-only
check — the value-level contract is pinned by golden-row tests instead
(tests/test_multimodal.py).
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
    dhash_images,
    dhash_near_dup,
    encode_img1,
)
from datapipeline_dags_spark.plans.llm_ops import SHINGLE_K, _fanout
from datapipeline_dags_spark.plans.registry import query

IMG_SIDE = 32
N_PIXEL_HASHES = 4  # pixels lit per shingle
HAMMING_T = 2

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


@query("q91_image_phash_neardup")
def q91_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (dHash) image near-dup over the rendered corpus:
    one Arrow pass computes the 64-bit hash per image, then q41's banded
    blocking (4 x 16-bit keys) generates candidates and a single JVM
    expression (bit_count(xor)) verifies Hamming <= HAMMING_T.  Scale
    shape matches q41: the shuffle carries (band, 16-bit key) pairs and
    8-byte hashes, never pixel data."""
    return dhash_near_dup(
        dhash_images(render_doc_images(spark, sf_dir)), hamming_t=HAMMING_T
    )
