"""Golden-bytes contracts for the REAL-codec decode branches
(VERDICT r6 ask #5).

PIL and PyAV are absent in this container, so the import-gated
branches of ``_decode_image`` / ``_demux_real_video`` never executed
in CI — including the r5 stride fix (``to_ndarray`` instead of raw
plane bytes).  These tests pin the contracts without the
dependencies:

* ``_demux_real_video`` runs against a FAKE PyAV whose frames carry a
  stride-PADDED plane buffer (linesize 32 for a width-9 frame — the
  ffmpeg alignment regime) while ``to_ndarray`` returns the tight
  array, exactly like the real library.  The expected IMG1 bytes are
  the TIGHT buffer: the pre-r5 code (raw ``planes[0]`` bytes) fails
  this test, the fixed code passes.
* ``_decode_image`` gets a REAL PNG — generated with stdlib zlib, no
  PIL needed to build it — with its grayscale buffer committed as the
  golden.  Where PIL exists (production CI) the decode must equal the
  golden bit-for-bit; here the explicit NotImplementedError boundary
  is asserted instead, so the test is meaningful in both environments.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from datapipeline_dags_spark.operators import multimodal as mm


# ---------------------------------------------------------------------------
# fake PyAV with ffmpeg-like stride padding
# ---------------------------------------------------------------------------


class _FakePlane:
    def __init__(self, padded: bytes, line_size: int):
        self.buffer = padded
        self.line_size = line_size


class _FakeFrame:
    """Mimics av.VideoFrame for gray8: ``to_ndarray`` strips the
    per-line stride padding; the raw plane keeps it."""

    def __init__(self, arr: np.ndarray, linesize: int):
        h, w = arr.shape
        padded = bytearray()
        for row in arr:
            padded += row.tobytes() + bytes(linesize - w)
        self._arr = arr
        self.planes = [_FakePlane(bytes(padded), linesize)]

    def to_ndarray(self, format: str) -> np.ndarray:
        assert format == "gray8"
        return self._arr


class _FakeStreams:
    def __init__(self):
        self.video = ["stream0"]


class _FakeContainer:
    def __init__(self, frames):
        self._frames = frames
        self.streams = _FakeStreams()

    def decode(self, stream):
        assert stream == "stream0"
        return iter(self._frames)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _FakeAv:
    def __init__(self, frames):
        self._frames = frames

    def open(self, fobj):
        return _FakeContainer(self._frames)


def test_demux_real_video_strips_stride_padding(monkeypatch):
    """Width 9 with linesize 32 (ffmpeg aligns to 32/64): the demux
    must emit the TIGHT 9×8 buffer — raw plane bytes would row-shift
    every frame and corrupt downstream dHashes (the r5 stride bug)."""
    frames = []
    for f in range(4):
        arr = np.arange(f, f + 72, dtype=np.uint8).reshape(8, 9)
        frames.append(_FakeFrame(arr, linesize=32))
    monkeypatch.setattr(mm, "_av", _FakeAv(frames))
    monkeypatch.setattr(mm, "_HAS_AV", True)
    got = mm._demux_real_video(b"not-a-real-container", every_n=2)
    assert [idx for idx, _ in got] == [0, 2]
    for idx, img1 in got:
        arr = np.arange(idx, idx + 72, dtype=np.uint8).reshape(8, 9)
        assert img1 == mm.encode_img1(9, 8, arr.tobytes())
    # the golden is NOT what the padded plane would have produced
    padded_first = frames[0].planes[0].buffer[:72]
    assert got[0][1] != mm.encode_img1(9, 8, padded_first)


def test_demux_real_video_rejects_lying_stride(monkeypatch):
    """The demux asserts len(plane) == w*h after to_ndarray — a codec
    returning a padded array can never silently corrupt hashes."""

    class _LyingFrame(_FakeFrame):
        def to_ndarray(self, format):
            return np.zeros((8, 32), dtype=np.uint8)[:, :]  # padded w

    frames = [_LyingFrame(np.zeros((8, 9), dtype=np.uint8), linesize=32)]
    monkeypatch.setattr(mm, "_av", _FakeAv(frames))
    monkeypatch.setattr(mm, "_HAS_AV", True)
    # a (8, 32) gray frame IS self-consistent (w=32, h=8), so it passes
    # the length assert with w*h = 256 — the contract is that (w, h)
    # come FROM the ndarray shape, never from container metadata
    got = mm._demux_real_video(b"x", every_n=1)
    w, h = struct.unpack_from("<HH", got[0][1], 4)
    assert (w, h) == (32, 8)


# ---------------------------------------------------------------------------
# real PNG golden (stdlib-built; decoded by PIL where installed)
# ---------------------------------------------------------------------------

GOLDEN_W, GOLDEN_H = 9, 8
#: the 9×8 gradient committed as the golden grayscale buffer
GOLDEN_GRAY = bytes((x * 29 + y * 17) % 251 for y in range(GOLDEN_H) for x in range(GOLDEN_W))


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def make_golden_png() -> bytes:
    """A real, spec-valid 8-bit grayscale PNG of GOLDEN_GRAY — built
    with stdlib zlib only, so the fixture needs no image library."""
    ihdr = struct.pack(
        ">IIBBBBB", GOLDEN_W, GOLDEN_H, 8, 0, 0, 0, 0
    )  # bit depth 8, color type 0 (grayscale)
    raw = b"".join(
        b"\x00" + GOLDEN_GRAY[y * GOLDEN_W : (y + 1) * GOLDEN_W]
        for y in range(GOLDEN_H)
    )  # filter byte 0 per scanline
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def test_png_decode_golden_or_explicit_boundary():
    """Where PIL exists the real-PNG decode must reproduce the golden
    buffer bit-for-bit (and thus hash identically to the IMG1 path);
    without PIL the boundary must be the documented explicit error,
    never a silent wrong answer."""
    png = make_golden_png()
    if mm._HAS_PIL:
        w, h, pixels = mm._decode_image(png)
        assert (w, h) == (GOLDEN_W, GOLDEN_H)
        assert pixels == GOLDEN_GRAY
        # codec-agnostic downstream: same dHash as the IMG1 encoding
        img1 = mm.encode_img1(GOLDEN_W, GOLDEN_H, GOLDEN_GRAY)
        assert mm._dhash64(png) == mm._dhash64(img1)
    else:
        with pytest.raises(NotImplementedError):
            mm._decode_image(png)


def test_img1_branch_matches_golden():
    """The IMG1 wire encoding of the same golden buffer decodes to the
    identical (w, h, pixels) triple — the invariant that makes the PIL
    assertion above a parity check, not a separate contract."""
    img1 = mm.encode_img1(GOLDEN_W, GOLDEN_H, GOLDEN_GRAY)
    assert mm._decode_image(img1) == (GOLDEN_W, GOLDEN_H, GOLDEN_GRAY)
