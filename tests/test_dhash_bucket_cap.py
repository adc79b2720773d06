"""Hot-bucket discipline for the dHash banding family (q91/q174).

Constant-color images and black/constant video frames all hash to the
SAME 64-bit dHash — the most common content in real crawl/video
corpora — so every such row lands in ONE (band, key) bucket.  The
candidate join must CHUNK-DISTRIBUTE that bucket (zero recall loss,
bounded per-task pair generation, q42's machinery) and fire observable
counters, never go quadratic in a single task or silently drop pairs.
"""

from __future__ import annotations

import itertools

import pytest

from datapipeline_dags_spark.operators import blocking
from datapipeline_dags_spark.operators import multimodal as mm
from datapipeline_dags_spark.operators.multimodal import (
    DHASH_MIN_BITS_FLOOR,
    dhash_images,
    dhash_near_dup,
    encode_img1,
    resolve_min_hash_bits,
)
from datapipeline_dags_spark.plans import multimodal_queries as mq


@pytest.fixture()
def hot_corpus_dir(spark, tmp_path):
    """12 identical docs (identical renders -> one hot dHash bucket per
    band) + 2 distinct docs."""
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, text, "en", "syn", len(text)) for i in range(1, 13)]
    rows += [
        (100, "one lonely document with completely different words here today", "en", "syn", 62),
        (200, "another unrelated piece of text that matches nothing else at all", "en", "syn", 64),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "sf_hot")
    df.coalesce(1).write.parquet(out + "/documents.parquet")
    return out


def test_constant_image_bucket_chunks_without_recall_loss(
    spark, hot_corpus_dir, monkeypatch
):
    """All 66 pairs among 12 identical images must survive a cap of 5
    (chunk distribution, not truncation), with the fan-out observed."""
    monkeypatch.setattr(blocking, "BUCKET_CAP", 5)
    got = mq.q91_image_phash_neardup(spark, hot_corpus_dir)
    pairs = {(r.id_a, r.id_b) for r in got.collect()}
    assert pairs >= set(itertools.combinations(range(1, 13), 2))
    obs = blocking.BUCKET_OBSERVATIONS["q91_image_phash_neardup"].get
    assert obs["capped_buckets"] >= 1
    assert obs["max_bucket_size"] >= 12
    assert obs["buckets"] >= obs["capped_buckets"]


def test_constant_frame_video_bucket_chunks_without_recall_loss(
    spark, hot_corpus_dir, monkeypatch
):
    """q174's (f, band, key) buckets get the same treatment: 12
    identical videos (frame-identical) keep all 66 pairs under a cap of
    5 and the chunk fan-out is observable."""
    monkeypatch.setattr(blocking, "BUCKET_CAP", 5)
    got = mq.q174_video_dhash_neardup(spark, hot_corpus_dir)
    pairs = {(r.id_a, r.id_b) for r in got.collect()}
    assert pairs >= set(itertools.combinations(range(1, 13), 2))
    obs = blocking.BUCKET_OBSERVATIONS["q174_video_dhash_neardup"].get
    assert obs["capped_buckets"] >= 1
    assert obs["max_bucket_size"] >= 12


def test_dhash_pairs_emitted_exactly_once(spark):
    """Identical hashes match in all 4 bands; the first-match-band
    filter (not a distinct shuffle) must still emit each pair once —
    including across chunk boundaries of a distributed hot bucket."""
    blank = encode_img1(8, 8, bytes(64))
    speck = encode_img1(8, 8, bytes([9] + [0] * 63))
    rows = [(i, blank) for i in range(1, 8)] + [(10, speck)]
    df = spark.createDataFrame(rows, "id long, content binary")
    got = dhash_near_dup(
        dhash_images(df), hamming_t=4, name="t_once", skip_zero_hash=False
    )
    out = got.collect()
    pairs = [(r.id_a, r.id_b) for r in out]
    assert len(pairs) == len(set(pairs))
    # 7 blanks are pairwise hamming 0; the speck differs in >4 bits or
    # joins them — either way no duplicates and a < b ordering holds
    assert all(a < b for a, b in pairs)
    assert set(itertools.combinations(range(1, 8), 2)) <= set(pairs)


def test_dhash_chunked_hot_bucket_matches_uncapped(spark, monkeypatch):
    """Chunk distribution is pair-set-identical to the uncapped join."""
    imgs = [
        (i, encode_img1(8, 8, bytes([i % 3] * 64))) for i in range(1, 21)
    ]
    df = spark.createDataFrame(imgs, "id long, content binary")
    baseline = {
        (r.id_a, r.id_b, r.hamming)
        for r in dhash_near_dup(
            dhash_images(df), name="t_base", skip_zero_hash=False
        ).collect()
    }
    monkeypatch.setattr(blocking, "BUCKET_CAP", 3)
    capped = {
        (r.id_a, r.id_b, r.hamming)
        for r in dhash_near_dup(
            dhash_images(df), name="t_capped", skip_zero_hash=False
        ).collect()
    }
    assert capped == baseline
    assert blocking.BUCKET_OBSERVATIONS["t_capped"].get["capped_buckets"] >= 1


def test_zero_hash_class_skipped_by_default(spark):
    """Blank / constant-color images all map to dHash 0 — the one
    equivalence class whose genuine pair count is quadratic in the
    corpus.  The default contract excludes it from candidate
    generation (match on no gradient information = dedup noise);
    skip_zero_hash=False restores the exhaustive behavior."""
    blank = encode_img1(8, 8, bytes(64))
    df = spark.createDataFrame(
        [(i, blank) for i in range(1, 6)], "id long, content binary"
    )
    assert dhash_near_dup(dhash_images(df), name="t_zero").count() == 0
    assert (
        dhash_near_dup(
            dhash_images(df), name="t_zero_off", skip_zero_hash=False
        ).count()
        == 10
    )


def test_min_hash_bits_density_floor(spark):
    """min_hash_bits excludes low-information hashes (a single lit
    gradient cell -> few set bits) from candidate generation — the
    production density filter for the output-quadratic near-empty
    classes SCALING.md documents."""
    speck = encode_img1(9, 8, bytes([0, 200] + [0] * 70))  # one edge
    rich = encode_img1(
        9, 8, bytes([(x * 37 + y * 11) % 251 for y in range(8) for x in range(9)])
    )
    rows = [(i, speck) for i in range(1, 5)] + [(10, rich), (11, rich)]
    df = spark.createDataFrame(rows, "id long, content binary")
    dense_only = dhash_near_dup(
        dhash_images(df), name="t_dense", min_hash_bits=4
    )
    pairs = {(r.id_a, r.id_b) for r in dense_only.collect()}
    assert pairs == {(10, 11)}  # speck class filtered, rich pair kept
    # default keeps the speck class (its hash is nonzero)
    default = {(r.id_a, r.id_b) for r in dhash_near_dup(dhash_images(df), name="t_def").collect()}
    assert (1, 2) in default and (10, 11) in default


def test_resolve_min_hash_bits_modes():
    """'auto' keys on the corpus count (the exact_audit/cc_backend
    pattern); pinned modes never call the count fn."""
    big = mm.DHASH_MIN_BITS_AUTO_ROWS + 1
    small = mm.DHASH_MIN_BITS_AUTO_ROWS
    assert resolve_min_hash_bits("auto", lambda: small) is None
    assert resolve_min_hash_bits("auto", lambda: big) == DHASH_MIN_BITS_FLOOR
    assert resolve_min_hash_bits("auto", None) is None  # bare operator call
    def boom():
        raise AssertionError("pinned mode paid the count job")
    assert resolve_min_hash_bits(None, boom) is None
    assert resolve_min_hash_bits(7, boom) == 7
    with pytest.raises(ValueError):
        resolve_min_hash_bits("always", boom)


def test_resolve_min_hash_bits_env_pin(monkeypatch):
    """ADVICE r7 #1: a parity harness pins the regime via env var —
    'auto' then ignores corpus size entirely (never pays the count),
    so a hash-checked run on a >20k-row fixture stays in the
    oracle-default path.  Pinned int modes still win over the env."""
    big = mm.DHASH_MIN_BITS_AUTO_ROWS + 1

    def boom():
        raise AssertionError("env-pinned auto paid the count job")

    monkeypatch.setenv(mm.MIN_HASH_BITS_PIN_ENV, "none")
    assert resolve_min_hash_bits("auto", boom) is None
    monkeypatch.setenv(mm.MIN_HASH_BITS_PIN_ENV, "")
    assert resolve_min_hash_bits("auto", boom) is None
    monkeypatch.setenv(mm.MIN_HASH_BITS_PIN_ENV, "6")
    assert resolve_min_hash_bits("auto", boom) == 6
    # explicit int knob beats the env pin
    assert resolve_min_hash_bits(7, boom) == 7
    monkeypatch.delenv(mm.MIN_HASH_BITS_PIN_ENV)
    assert resolve_min_hash_bits("auto", lambda: big) == DHASH_MIN_BITS_FLOOR


def test_min_hash_bits_auto_switch_equality(spark):
    """The auto knob IS the two pinned modes at the two gate outcomes:
    below the row threshold auto == default (floor off, oracle-parity
    path — the driver-gate regime); above it auto == the explicit
    min_hash_bits floor (near-empty classes excluded).  Same equality
    discipline as test_exact_audit_gate / the cc_backend switch."""
    speck = encode_img1(9, 8, bytes([0, 200] + [0] * 70))
    rich = encode_img1(
        9, 8, bytes([(x * 37 + y * 11) % 251 for y in range(8) for x in range(9)])
    )
    rows = [(i, speck) for i in range(1, 5)] + [(10, rich), (11, rich)]
    df = spark.createDataFrame(rows, "id long, content binary")

    def run(name, **kw):
        return {
            (r.id_a, r.id_b, r.hamming)
            for r in dhash_near_dup(dhash_images(df), name=name, **kw).collect()
        }

    n = mm.DHASH_MIN_BITS_AUTO_ROWS
    below = run("t_auto_lo", min_hash_bits="auto", corpus_size_fn=lambda: n)
    assert below == run("t_off", min_hash_bits=None)
    assert {(1, 2), (10, 11)} <= {(a, b) for a, b, _ in below}
    above = run("t_auto_hi", min_hash_bits="auto", corpus_size_fn=lambda: n + 1)
    assert above == run("t_floor", min_hash_bits=DHASH_MIN_BITS_FLOOR)
    assert {(a, b) for a, b, _ in above} == {(10, 11)}


def test_q174_inline_floor_keeps_dense_frames(spark, tmp_path, monkeypatch):
    """q174 resolves the same auto floor inline (its banding is
    per-frame, not dhash_near_dup): with the gate forced ON, dense
    rendered frames (long texts -> ~20 set bits per frame) still pair
    up, while the near-empty frames of short texts (<= 1 set bit — the
    output-quadratic class) are shed from candidate generation."""
    long_text = " ".join(f"w{i}token{i * 7 % 13}" for i in range(120))
    short_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, long_text, "en", "syn", len(long_text)) for i in range(1, 7)]
    rows += [(i, short_text, "en", "syn", len(short_text)) for i in range(20, 26)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "sf_dense")
    df.coalesce(1).write.parquet(out + "/documents.parquet")
    baseline = {
        (r.id_a, r.id_b)
        for r in mq.q174_video_dhash_neardup(spark, out).collect()
    }
    assert baseline >= set(itertools.combinations(range(1, 7), 2))
    assert baseline >= set(itertools.combinations(range(20, 26), 2))
    monkeypatch.setattr(mm, "DHASH_MIN_BITS_AUTO_ROWS", 1)
    floored = {
        (r.id_a, r.id_b)
        for r in mq.q174_video_dhash_neardup(spark, out).collect()
    }
    assert floored >= set(itertools.combinations(range(1, 7), 2))
    assert not floored & set(itertools.combinations(range(20, 26), 2))
