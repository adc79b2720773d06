"""Audio column operators — the third leg of the multimodal surface.

Audio rides the same opaque-``binary``-column contract as images
(`operators/multimodal.py`): ingest via ``read_binary_dir``, decode /
feature-extract / resample as Arrow-batched ``mapInPandas`` stages.
The container has no audio codec libraries, so decode follows the
IMG1/VID1 discipline: a deterministic test format decodes natively and
every other format raises an explicit NotImplementedError naming the
production dependency — a real deploy swaps the decoder body
(soundfile/librosa) and NOTHING else; schemas, batching, and the
feature math are codec-agnostic and real.

Test format (little-endian):

  audio: b"AUD1" + uint16 sample_rate + uint32 n_samples
         + n_samples x int16 PCM
"""

from __future__ import annotations

import struct as _struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from datapipeline_dags_spark.shipping import ensure_package_shipped

AUD_MAGIC = b"AUD1"


def encode_aud1(sample_rate: int, samples: "np.ndarray") -> bytes:
    """Serialize int16 PCM to the AUD1 test format (test fixture
    builder — the inverse of `_decode_audio`)."""
    pcm = np.asarray(samples, dtype=np.int16)
    return (
        AUD_MAGIC
        + _struct.pack("<HI", sample_rate, len(pcm))
        + pcm.tobytes()
    )


def _decode_audio(content: bytes) -> tuple[int, "np.ndarray"]:
    """Decode to (sample_rate, int16 numpy array).  AUD1 decodes
    natively; anything else needs a real codec library."""
    if content[:4] == AUD_MAGIC:
        rate, n = _struct.unpack_from("<HI", content, 4)
        pcm = np.frombuffer(content, dtype="<i2", count=n, offset=10)
        return rate, pcm
    raise NotImplementedError(
        "real audio codecs need soundfile/librosa; only the AUD1 test "
        "format decodes in this container"
    )


DECODED_AUDIO_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", FloatType()),
        StructField("rms", FloatType()),
        StructField("peak", FloatType()),
    ]
)


def decode_audio(df: DataFrame) -> DataFrame:
    """Decode audio bytes → rate / duration / clip-level loudness stats
    via mapInPandas (Arrow-batched, map-only, partition-parallel)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rate, pcm = _decode_audio(bytes(content))
                x = pcm.astype(np.float64) / 32768.0
                rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
                peak = float(np.max(np.abs(x))) if len(x) else 0.0
                out.append(
                    (path, rate, len(pcm), len(pcm) / rate if rate else 0.0, rms, peak)
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "path",
                    "sample_rate",
                    "n_samples",
                    "duration_s",
                    "rms",
                    "peak",
                ],
            )

    ensure_package_shipped(df.sparkSession)
    return df.select("path", "content").mapInPandas(decode, DECODED_AUDIO_SCHEMA)


FRAME_FEATURE_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("energy", FloatType()),
        StructField("zcr", FloatType()),
    ]
)


def frame_energy_features(
    df: DataFrame, frame_len: int = 256, hop: int = 128
) -> DataFrame:
    """Per-frame RMS energy + zero-crossing rate — the standard cheap
    acoustic features (VAD, silence trimming, segmentation).  One input
    clip fans out to n_frames rows; all math is vectorized numpy over
    an Arrow batch.  A production encoder (log-mel, wav2vec) replaces
    the two feature expressions; framing and batching stay."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                _, pcm = _decode_audio(bytes(content))
                x = pcm.astype(np.float64) / 32768.0
                n_frames = max(0, 1 + (len(x) - frame_len) // hop) if len(
                    x
                ) >= frame_len else 0
                for i in range(n_frames):
                    fr = x[i * hop : i * hop + frame_len]
                    energy = float(np.sqrt(np.mean(fr * fr)))
                    zcr = float(np.mean(np.abs(np.diff(np.sign(fr))) > 0))
                    out.append((path, i, energy, zcr))
            yield pd.DataFrame(
                out, columns=["path", "frame_idx", "energy", "zcr"]
            )

    ensure_package_shipped(df.sparkSession)
    return df.select("path", "content").mapInPandas(feats, FRAME_FEATURE_SCHEMA)


RESAMPLED_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("sample_rate", IntegerType()),
        StructField("content", BinaryType()),
    ]
)


def resample_audio(df: DataFrame, out_rate: int) -> DataFrame:
    """Linear-interpolation resample to ``out_rate``, re-encoded as AUD1
    — the audio twin of ``resize_images`` (real DSP on the test codec;
    a production deploy swaps in a polyphase resampler)."""

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rate, pcm = _decode_audio(bytes(content))
                if rate == out_rate or len(pcm) == 0:
                    y = pcm
                else:
                    n_out = max(1, int(round(len(pcm) * out_rate / rate)))
                    xi = np.linspace(0, len(pcm) - 1, n_out)
                    y = np.interp(xi, np.arange(len(pcm)), pcm).astype(np.int16)
                out.append((path, out_rate, encode_aud1(out_rate, y)))
            yield pd.DataFrame(out, columns=["path", "sample_rate", "content"])

    ensure_package_shipped(df.sparkSession)
    return df.select("path", "content").mapInPandas(rs, RESAMPLED_SCHEMA)


FINGERPRINT_SCHEMA = StructType(
    [StructField("id", LongType()), StructField("fp", LongType())]
)


def energy_fingerprints(df: DataFrame, frame_len: int = 100) -> DataFrame:
    """64-bit acoustic energy fingerprint per clip — the audio twin of
    the image dHash (`operators/multimodal.py _dhash64`): frame the PCM
    into ``frame_len``-sample windows, take each frame's INTEGER
    absolute-amplitude sum, and set bit i (MSB-first) when frame i is
    louder than frame i+1.  Sign-of-delta over coarse energies is the
    shape every audio fingerprinter shares (Shazam-style constellation
    and Chromaprint both quantize band-energy deltas); a production
    system swaps the energy row for a mel/chroma filterbank and keeps
    the comparison-bit + banded-blocking plumbing unchanged.

    All integer arithmetic (int16 |amplitude| sums) — bit-reproducible
    across engines and partitionings, which is what lets the DuckDB
    oracle re-derive the fingerprints with pure SQL.  Input: (path,
    content) AUD1 rows (numeric path); output: (id, fp) with fp a
    signed int64 reinterpretation of the 64-bit fingerprint.
    """

    def fps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                _, pcm = _decode_audio(bytes(content))
                n_frames = len(pcm) // frame_len
                e = (
                    np.abs(pcm[: n_frames * frame_len].astype(np.int64))
                    .reshape(n_frames, frame_len)
                    .sum(axis=1)
                )
                u = 0
                for i in range(min(n_frames - 1, 64)):
                    if e[i] > e[i + 1]:
                        u |= 1 << (63 - i)
                if u >= 1 << 63:
                    u -= 1 << 64
                out.append((int(path), u))
            yield pd.DataFrame(out, columns=["id", "fp"])

    ensure_package_shipped(df.sparkSession)
    return df.select("path", "content").mapInPandas(fps, FINGERPRINT_SCHEMA)
