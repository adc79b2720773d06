"""Multimodal columns — binary media + typed metadata (SURVEY §2.11).

Data model: media is an opaque ``binary`` column with a typed metadata
struct alongside (path, media_type, n_bytes, digest).  Ingest is the
``binaryFile`` source; decode / frame-sample / feature-extract run as
Arrow-batched Pandas UDFs over ``mapInPandas`` — the ONLY place Python
touches row data in this engine, used exactly where JVM expressions
cannot express the semantics (byte-level codecs).

Container note: real codecs (PIL/opencv/ffmpeg) are not available
here, so decoding understands a deterministic fake wire format and
raises ``NotImplementedError`` for real media — the Spark-side
plumbing (schemas, batch iteration, explode-shaped frame sampling,
partition parallelism) is real and tested, and a production deploy
swaps only the bytes→array function body.

Fake formats (little-endian):
  image: b"IMG1" + uint16 width + uint16 height + width*height bytes
  video: b"VID1" + uint16 n_frames + uint16 frame_len + frames
Scale design: one input file per row via binaryFile (many files ⇒ many
splits); decode is map-only (zero shuffles); Arrow batch size bounds
executor memory (spark.sql.execution.arrow.maxRecordsPerBatch).
"""

from __future__ import annotations

import hashlib
import struct as _struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMG_MAGIC = b"IMG1"
VID_MAGIC = b"VID1"


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Ingest a directory of media files as (path, content, metadata) —
    the binaryFile source; one file per row, splits scale with files."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return raw.select(
        F.col("path"),
        F.col("content"),
        F.struct(
            F.element_at(F.split("path", "\\."), -1).alias("media_type"),
            F.col("length").alias("n_bytes"),
            F.sha2("content", 256).alias("digest"),
        ).alias("meta"),
    )


DECODED_IMAGE_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("mean_intensity", FloatType()),
    ]
)


def _decode_image(content: bytes) -> tuple[int, int, bytes]:
    if content[:4] != IMG_MAGIC:
        raise NotImplementedError(
            "real image codecs (PIL/opencv) are not available in this "
            "container; only the IMG1 test format decodes"
        )
    w, h = _struct.unpack_from("<HH", content, 4)
    pixels = content[8 : 8 + w * h]
    return w, h, pixels


def decode_images(df: DataFrame) -> DataFrame:
    """Decode image bytes → dimensions + intensity stats via mapInPandas.

    Arrow streams (path, content) batches into Python; each batch maps
    to a same-length output batch — partition-parallel, map-only.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                w, h, pixels = _decode_image(bytes(content))
                mean = (sum(pixels) / len(pixels)) if pixels else 0.0
                out.append((path, w, h, w * h, mean))
            yield pd.DataFrame(
                out, columns=["path", "width", "height", "n_pixels", "mean_intensity"]
            )

    return df.select("path", "content").mapInPandas(decode, DECODED_IMAGE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Sample every n-th frame from video bytes — an explode-shaped
    mapInPandas (output rows ≠ input rows), one row per kept frame."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                b = bytes(content)
                if b[:4] != VID_MAGIC:
                    raise NotImplementedError(
                        "real video demuxers (ffmpeg) are not available; "
                        "only the VID1 test format decodes"
                    )
                n_frames, frame_len = _struct.unpack_from("<HH", b, 4)
                for i in range(0, n_frames, every_n):
                    off = 8 + i * frame_len
                    rows.append((path, i, b[off : off + frame_len]))
            yield pd.DataFrame(rows, columns=["path", "frame_idx", "frame"])

    return df.select("path", "content").mapInPandas(sample, FRAME_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize images to (out_w, out_h) by nearest-neighbor resampling,
    re-encoded in the same wire format — the thumbnail/normalization
    pass before a vision encoder.  Same-cardinality mapInPandas; on the
    IMG1 test format the resample is real (index mapping over the pixel
    buffer), a production deploy swaps in PIL/opencv with the identical
    signature and batch shape."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                w, h, pixels = _decode_image(bytes(content))
                out = bytearray(IMG_MAGIC)
                out += _struct.pack("<HH", out_w, out_h)
                for y in range(out_h):
                    sy = min(h - 1, (y * h) // out_h) if h else 0
                    for x in range(out_w):
                        sx = min(w - 1, (x * w) // out_w) if w else 0
                        out.append(pixels[sy * w + sx] if pixels else 0)
                rows.append((path, bytes(out), out_w, out_h))
            yield pd.DataFrame(rows, columns=["path", "content", "width", "height"])

    return df.select("path", "content").mapInPandas(resize, RESIZED_SCHEMA)


N_BINS = 16


def byte_histogram_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Feature extraction: L1-normalized 16-bin byte histogram as
    ``array<float>`` — shape-compatible with the ``embeddings`` table, so
    downstream ANN ops (q45/q46) apply unchanged.  A production deploy
    swaps the body for a real encoder; signature and batching stay."""

    @F.pandas_udf(ArrayType(FloatType()))
    def hist(content: pd.Series) -> pd.Series:
        def one(b: bytes) -> list[float]:
            counts = [0] * N_BINS
            for byte in bytes(b):
                counts[byte >> 4] += 1
            total = len(b) or 1
            return [c / total for c in counts]

        return content.map(one)

    return df.withColumn("features", hist(F.col(content_col)))


# ---------------------------------------------------------------------------
# §2.10 — the generic Pandas-UDF stage contract
# ---------------------------------------------------------------------------


def pandas_stage(fn, schema: StructType):
    """Lift a pandas batch function ``(pdf) -> pdf`` into a pipeline Stage
    (SURVEY §2.10: the reference's Step contract, batch-level custom
    logic → mapInPandas)."""

    def stage(manifest, df: DataFrame) -> DataFrame:
        def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield fn(pdf)

        return df.mapInPandas(apply, schema)

    return stage
