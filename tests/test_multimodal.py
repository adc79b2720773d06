"""Multimodal operator tests: binaryFile ingest, fake-codec decode,
frame sampling, histogram features, and the pandas_stage lift."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from datapipeline_dags_spark.operators.multimodal import (
    IMG_MAGIC,
    VID_MAGIC,
    byte_histogram_features,
    decode_images,
    pandas_stage,
    read_binary_dir,
    sample_frames,
)


def fake_image(w: int, h: int, fill: int = 7) -> bytes:
    return IMG_MAGIC + struct.pack("<HH", w, h) + bytes([fill]) * (w * h)


def fake_video(n_frames: int, frame_len: int) -> bytes:
    frames = b"".join(bytes([i]) * frame_len for i in range(n_frames))
    return VID_MAGIC + struct.pack("<HH", n_frames, frame_len) + frames


@pytest.fixture()
def media_dir(tmp_path):
    (tmp_path / "a.img").write_bytes(fake_image(4, 3))
    (tmp_path / "b.img").write_bytes(fake_image(2, 2, fill=255))
    (tmp_path / "c.vid").write_bytes(fake_video(6, 10))
    return str(tmp_path)


def test_binary_ingest_metadata(spark, media_dir):
    df = read_binary_dir(spark, media_dir, glob="*.img")
    rows = {r.meta.media_type: r for r in df.collect()}
    assert set(rows) == {"img"}
    assert rows["img"].meta.n_bytes in (8 + 12, 8 + 4)
    assert len(rows["img"].meta.digest) == 64


def test_decode_images_dimensions_and_plan(spark, media_dir):
    df = read_binary_dir(spark, media_dir, glob="*.img")
    decoded = decode_images(df)
    plan = decoded._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # Arrow-batched, not row-at-a-time
    rows = {r.width: r for r in decoded.collect()}
    assert rows[4].height == 3 and rows[4].n_pixels == 12
    assert rows[4].mean_intensity == pytest.approx(7.0)
    assert rows[2].mean_intensity == pytest.approx(255.0)


def test_decode_unknown_format_raises_not_implemented(spark, tmp_path):
    (tmp_path / "real.jpg").write_bytes(b"\xff\xd8\xff\xe0 not supported")
    df = read_binary_dir(spark, str(tmp_path), glob="*.jpg")
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        decode_images(df).collect()


def test_frame_sampling_explodes_rows(spark, media_dir):
    df = read_binary_dir(spark, media_dir, glob="*.vid")
    frames = sample_frames(df, every_n=2).collect()
    assert [f.frame_idx for f in sorted(frames, key=lambda r: r.frame_idx)] == [0, 2, 4]
    f0 = next(f for f in frames if f.frame_idx == 2)
    assert bytes(f0.frame) == bytes([2]) * 10


def test_byte_histogram_features_are_ann_ready(spark, media_dir):
    df = read_binary_dir(spark, media_dir, glob="*.img")
    feat = byte_histogram_features(df)
    row = feat.filter(F.col("path").endswith("b.img")).collect()[0]
    assert len(row.features) == 16
    assert sum(row.features) == pytest.approx(1.0)
    # fill=255 dominates bucket 15 (8 header bytes / 12 total vs 4 pixels)
    assert row.features[15] == pytest.approx(4 / 12, abs=1e-6)


def test_pandas_stage_lifts_batch_fn(spark):
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("shout", StringType())]
    )

    def upper(pdf):
        out = pdf.copy()
        out["shout"] = out["text"].str.upper()
        return out[["doc_id", "shout"]]

    stage = pandas_stage(upper, schema)
    df = spark.createDataFrame([(1, "abc"), (2, "xy")], "doc_id long, text string")
    rows = dict((r.doc_id, r.shout) for r in stage(None, df).collect())
    assert rows == {1: "ABC", 2: "XY"}


def test_resize_images_nearest_neighbor_roundtrip(spark, tmp_path):
    import struct as _s

    from datapipeline_dags_spark.operators.multimodal import (
        decode_images,
        read_binary_dir,
        resize_images,
    )

    # 4x4 gradient image: pixel value = row*4 + col
    px = bytes(range(16))
    (tmp_path / "g.img").write_bytes(IMG_MAGIC + _s.pack("<HH", 4, 4) + px)
    df = read_binary_dir(spark, str(tmp_path), glob="*.img")
    out = resize_images(df, 2, 2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.width, r.height) == (2, 2)
    b = bytes(r.content)
    assert b[:4] == IMG_MAGIC
    # nearest-neighbor from 4x4 -> 2x2 picks source pixels (0,0),(0,2),(2,0),(2,2)
    assert list(b[8:12]) == [0, 2, 8, 10]
    # the resized bytes are themselves decodable (same wire format)
    decoded = decode_images(resize_images(df, 2, 2)).collect()[0]
    assert (decoded.width, decoded.height, decoded.n_pixels) == (2, 2, 4)


# ---------------------------------------------------------------------------
# perceptual-hash dedup (dHash + banded near-dup)
# ---------------------------------------------------------------------------


def gradient_image(w: int, h: int, flips: tuple[tuple[int, int], ...] = ()) -> bytes:
    """Horizontal-gradient IMG1 image (rich dHash structure) with
    optional flipped pixels to create controlled near-duplicates."""
    from datapipeline_dags_spark.operators.multimodal import encode_img1

    px = bytearray((x * 255) // max(1, w - 1) for _ in range(h) for x in range(w))
    for (x, y) in flips:
        px[y * w + x] = 255 - px[y * w + x]
    return encode_img1(w, h, bytes(px))


def test_dhash_golden_values_and_invariance(spark):
    """Pinned dHash facts: identical images hash equal; a resized copy of
    the same gradient hashes equal (scale invariance); a heavily flipped
    copy differs."""
    from datapipeline_dags_spark.operators.multimodal import _dhash64

    a = gradient_image(18, 16)
    assert _dhash64(a) == _dhash64(gradient_image(18, 16))
    # same pattern at 2x resolution -> same downsampled hash
    assert _dhash64(a) == _dhash64(gradient_image(36, 32))
    # monotone horizontal gradient: every left < right -> all bits 0
    assert _dhash64(a) == 0
    heavy = gradient_image(18, 16, flips=tuple((x, y) for x in (4, 9, 14) for y in range(16)))
    assert _dhash64(heavy) != _dhash64(a)


def test_dhash_near_dup_blocks_and_verifies(spark):
    from datapipeline_dags_spark.operators.multimodal import (
        _dhash64,
        dhash_images,
        dhash_near_dup,
    )

    base = gradient_image(18, 16)
    near = gradient_image(18, 16, flips=((4, 2),))  # one flipped pixel
    far = gradient_image(18, 16, flips=tuple((x, y) for x in (2, 6, 10, 14) for y in range(0, 16, 2)))
    assert 0 < bin(_dhash64(near)).count("1") <= 4  # truly near
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, base)], "id long, content binary"
    )
    hashes = dhash_images(df)
    # skip_zero_hash=False: the uniform gradient's base dHash is exactly
    # 0, which the default contract excludes as the blank/constant-media
    # class (see test_dhash_bucket_cap.test_zero_hash_class_skipped_by_default)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dhash_near_dup(
            hashes, hamming_t=4, skip_zero_hash=False
        ).collect()
    }
    assert pairs[(1, 4)] == 0          # exact perceptual copy
    assert 0 < pairs[(1, 2)] <= 4      # near-dup caught with its distance
    assert (2, 4) in pairs             # transitively near base's copy
    assert not any(3 in p for p in pairs)  # far image excluded


def test_q91_image_neardup_query_recovers_text_neardups(spark, sf_dir):
    from datapipeline_dags_spark.plans.llm_ops import q41_dedup_minhash_lsh
    from datapipeline_dags_spark.plans.multimodal_queries import (
        HAMMING_T,
        q91_image_phash_neardup,
    )

    got = q91_image_phash_neardup(spark, sf_dir)
    rows = got.collect()
    assert got.columns == ["id_a", "id_b", "hamming"]
    assert len(rows) > 0
    assert all(0 <= r.hamming <= HAMMING_T for r in rows)
    # cross-modality sanity: most of q41's TEXT near-dup pairs are also
    # found from PIXELS alone (near-dup text -> near-identical render)
    text_pairs = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in q41_dedup_minhash_lsh(spark, sf_dir).collect()
    }
    img_pairs = {(r.id_a, r.id_b) for r in rows}
    if text_pairs:
        assert len(text_pairs & img_pairs) / len(text_pairs) >= 0.5


def test_q174_video_neardup_pipeline(spark, sf_dir):
    """Video near-dup: the real sample_frames operator feeds per-frame
    dHashes; output pairs are within VID_HAMMING_T on EVERY sampled
    frame, and the pipeline recovers text near-dups from frames alone
    (the q91 cross-modality property, per frame)."""
    from datapipeline_dags_spark.plans.llm_ops import q41_dedup_minhash_lsh
    from datapipeline_dags_spark.plans.multimodal_queries import (
        VID_FRAMES,
        VID_HAMMING_T,
        VID_SAMPLE_EVERY,
        q174_video_dhash_neardup,
        render_doc_videos,
    )
    from datapipeline_dags_spark.operators.multimodal import sample_frames

    # sample_frames really drops the odd frames of the rendered VID1s
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    frames = sample_frames(
        render_doc_videos(spark, sf_dir), every_n=VID_SAMPLE_EVERY
    )
    per_doc = frames.groupBy("path").count().collect()
    expected = -(-VID_FRAMES // VID_SAMPLE_EVERY)  # ceil
    assert len(per_doc) == n_docs
    assert all(r["count"] == expected for r in per_doc)

    got = q174_video_dhash_neardup(spark, sf_dir)
    rows = got.collect()
    assert got.columns == ["id_a", "id_b", "max_hamming", "total_hamming"]
    assert len(rows) > 0
    assert all(0 <= r.max_hamming <= VID_HAMMING_T for r in rows)
    assert all(r.max_hamming <= r.total_hamming for r in rows)
    text_pairs = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in q41_dedup_minhash_lsh(spark, sf_dir).collect()
    }
    vid_pairs = {(r.id_a, r.id_b) for r in rows}
    if text_pairs:
        assert len(text_pairs & vid_pairs) / len(text_pairs) >= 0.5
