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
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

import struct as _struct

from pyspark.storagelevel import StorageLevel

from datapipeline_dags_spark.catalog import table
from datapipeline_dags_spark.operators import blocking
from datapipeline_dags_spark.operators.audio import (
    encode_aud1,
    energy_fingerprints,
)
from datapipeline_dags_spark.operators.multimodal import (
    DHASH_BANDS,
    DHASH_H,
    DHASH_W,
    VID_MAGIC,
    dhash_band_keys,
    dhash_images,
    dhash_near_dup,
    encode_img1,
    resolve_min_hash_bits,
    sample_frames,
)
from datapipeline_dags_spark.plans.helpers import cached_count
from datapipeline_dags_spark.plans.llm_ops import _SHINGLES_SQL, SHINGLE_K, _fanout
from datapipeline_dags_spark.plans.registry import query


def _doc_corpus_size_fn(spark: SparkSession, sf_dir: str):
    """corpus_size_fn for the three media near-dup queries: all three
    render one media item per ``documents`` row, so the cached document
    count is the auto ``min_hash_bits`` gate input (one control-plane
    count per session, never a re-render of the media column)."""
    return lambda: cached_count(
        table(spark, sf_dir, "documents"), f"{sf_dir}/documents"
    )

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
           (SELECT unnest(generate_series(0, {DHASH_BANDS - 1})) AS b) bb
      WHERE u <> 0),
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


# ---------------------------------------------------------------------------
# q174 — video near-dup: frame-sample -> per-frame dHash -> banded blocking
# (VERDICT r4 ask #9: VID1 was the only modality without a feature/dedup
# query; this runs the real sample_frames operator end to end)
# ---------------------------------------------------------------------------

VID_FRAMES = 4  # frames rendered per document video
VID_SAMPLE_EVERY = 2  # sample_frames keeps frame_idx % 2 == 0
VID_HAMMING_T = 2  # every sampled frame must be within this Hamming
# Frames render at a smaller side than q91's single image: each frame
# holds ~1/VID_FRAMES of the document's shingles, so the pixel space
# shrinks with it to keep per-frame lit density in the regime where a
# 9x8 dHash is informative (a sparse 32x32 frame downsamples to a
# near-zero hash and EVERYTHING collides at small Hamming).
VID_SIDE = 16


def _q174_oracle() -> str:
    """q91's integer-SQL dHash derivation lifted to (doc, frame): each
    shingle lands in ONE frame (md5 byte 15 mod {VID_FRAMES} — the same
    digest the pixels come from, mirrored by ``_render_video``), frames
    with frame_idx % {VID_SAMPLE_EVERY} != 0 are dropped exactly as
    ``sample_frames`` drops them, every (doc, sampled frame) gets a
    64-bit dHash (all-zero frames included — their hash is 0), banding
    blocks on (frame, band, 16-bit key), and a candidate doc pair
    verifies over ALL its sampled frames.  As in q91, the VID1/IMG1
    encode/decode round-trips are the identity on the pixel buffers,
    so the SQL skips the codec and still checks every downstream value.
    """
    side, n_px = VID_SIDE, VID_SIDE * VID_SIDE
    return f"""
    WITH docs AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
    s AS (SELECT doc_id, unnest(sh) AS s FROM docs),
    dig AS (SELECT doc_id, md5(s) AS h,
                   ('0x'||substr(md5(s), 31, 2))::BIGINT % {VID_FRAMES} AS f
            FROM s),
    sampled AS (SELECT * FROM dig WHERE f % {VID_SAMPLE_EVERY} = 0),
    ks AS (SELECT unnest(generate_series(0, {N_PIXEL_HASHES - 1})) AS k),
    hits AS (
      SELECT doc_id, f,
             (('0x'||substr(h, 8*k+1, 2))::BIGINT
              + ('0x'||substr(h, 8*k+3, 2))::BIGINT * 256
              + ('0x'||substr(h, 8*k+5, 2))::BIGINT * 65536) % {n_px} AS pix,
             ('0x'||substr(h, 8*k+7, 2))::BIGINT AS v
      FROM sampled, ks),
    lit AS (SELECT doc_id, f, pix, MAX(v) AS v FROM hits GROUP BY doc_id, f, pix),
    fr AS (SELECT doc_id, fs.f
           FROM (SELECT doc_id FROM documents) d,
                (SELECT unnest(generate_series(0, {VID_FRAMES - 1})) AS f) fs
           WHERE fs.f % {VID_SAMPLE_EVERY} = 0),
    grid AS (SELECT x, y,
                    LEAST({side - 1}, (y*{side})//{DHASH_H}) * {side}
                    + LEAST({side - 1}, (x*{side})//{DHASH_W}) AS pos
             FROM (SELECT unnest(generate_series(0, {DHASH_W - 1})) AS x),
                  (SELECT unnest(generate_series(0, {DHASH_H - 1})) AS y)),
    small AS (
      SELECT d.doc_id, d.f, g.x, g.y, COALESCE(l.v, 0) AS v
      FROM fr d
      CROSS JOIN grid g
      LEFT JOIN lit l ON l.doc_id = d.doc_id AND l.f = d.f AND l.pix = g.pos),
    hsh AS (
      SELECT a.doc_id, a.f,
             BIT_OR(CASE WHEN a.v > b.v
                    THEN (CAST(1 AS UBIGINT) << (63 - (a.y*{DHASH_W - 1} + a.x)))
                    ELSE CAST(0 AS UBIGINT) END) AS u
      FROM small a JOIN small b
        ON a.doc_id = b.doc_id AND a.f = b.f AND a.y = b.y AND b.x = a.x + 1
      WHERE a.x < {DHASH_W - 1}
      GROUP BY a.doc_id, a.f),
    bands AS (
      SELECT doc_id, f, u, bb.b AS band, (u >> (16*bb.b)) & 65535 AS key
      FROM hsh,
           (SELECT unnest(generate_series(0, {DHASH_BANDS - 1})) AS b) bb
      WHERE u <> 0),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
             FROM bands a JOIN bands c
               ON a.f = c.f AND a.band = c.band AND a.key = c.key
              AND a.doc_id < c.doc_id),
    ham AS (
      SELECT cand.id_a, cand.id_b, ha.f,
             bit_count(xor(ha.u, hb.u)) AS hm
      FROM cand
      JOIN hsh ha ON ha.doc_id = cand.id_a
      JOIN hsh hb ON hb.doc_id = cand.id_b AND hb.f = ha.f)
    SELECT id_a, id_b,
           CAST(MAX(hm) AS BIGINT) AS max_hamming,
           CAST(SUM(hm) AS BIGINT) AS total_hamming
    FROM ham GROUP BY id_a, id_b
    HAVING MAX(hm) <= {VID_HAMMING_T}
    """


def _render_video(text: str, side: int, n_frames: int) -> bytes:
    """Deterministic VID1 video per document: each shingle's md5 digest
    picks ONE frame (byte 15 mod n_frames) and lights its q91 pixels in
    that frame's buffer — so near-duplicate TEXTS render as videos whose
    corresponding frames are near-identical IMAGES, the regime per-frame
    perceptual hashing is built for.  Frames are IMG1-encoded so the
    sampled frame blocks feed ``dhash_images`` unchanged."""
    words = text.split(" ")
    shingles = (
        {" ".join(words[i : i + SHINGLE_K]) for i in range(len(words) - SHINGLE_K + 1)}
        if len(words) >= SHINGLE_K
        else {text}
    )
    n = side * side
    bufs = [bytearray(n) for _ in range(n_frames)]
    for s in shingles:
        h = hashlib.md5(s.encode()).digest()
        px = bufs[h[15] % n_frames]
        for k in range(N_PIXEL_HASHES):
            b = int.from_bytes(h[4 * k : 4 * k + 3], "little") % n
            v = h[4 * k + 3]
            if v > px[b]:
                px[b] = v
    frames = [encode_img1(side, side, bytes(b)) for b in bufs]
    return (
        VID_MAGIC
        + _struct.pack("<HH", n_frames, len(frames[0]))
        + b"".join(frames)
    )


VIDEO_SCHEMA = StructType(
    [StructField("path", StringType()), StructField("content", BinaryType())]
)


def render_doc_videos(
    spark: SparkSession,
    sf_dir: str,
    side: int = VID_SIDE,
    n_frames: int = VID_FRAMES,
) -> DataFrame:
    """Deterministic per-document VID1 video (see _render_video); the
    ``path`` column carries the doc_id as the media key, matching the
    (path, content) contract of the video operators."""

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "content": [
                        _render_video(t, side, n_frames) for t in pdf["text"]
                    ],
                }
            )

    from datapipeline_dags_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    docs = table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("path"), "text"
    )
    return _fanout(spark, docs).mapInPandas(render, VIDEO_SCHEMA)


@query("q174_video_dhash_neardup", oracle=_q174_oracle())
def q174_video_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup over the rendered corpus: ``sample_frames`` (the
    real explode-shaped VID1 operator) keeps every {VID_SAMPLE_EVERY}th
    frame, ONE Arrow pass dHashes each sampled frame, and q91's banded
    blocking runs per (frame_idx, band, 16-bit key) — two videos are
    near-duplicates when EVERY sampled frame pair is within
    {VID_HAMMING_T} Hamming bits.

    Scale shape: pixel data exists only inside the two map-only Arrow
    passes (render, per-frame hash); the shuffle carries (frame, band,
    key) + 8-byte hashes, the verify join is per-candidate-pair x
    |sampled frames| rows, and the final agg is one bounded groupBy per
    pair.  Hot (f, band, key) buckets — black/constant frames all share
    one dHash, the ubiquitous real-video case — are CHUNK-DISTRIBUTED
    via ``blocking.chunk_buckets`` (zero recall loss, counters
    observable as ``q174_video_dhash_neardup``), the q42 machinery.
    The hash table is persisted: it feeds candidate generation AND both
    sides of the verify join, and recomputing it re-runs the render
    Arrow pass.  Hash-checked end to end: the DuckDB oracle re-derives
    the per-frame dHashes from documents with pure integer SQL
    (``_q174_oracle``).

    Candidate pruning (VERDICT r9 ask #3 — all three rules are LOSSLESS
    for the verified output, so the oracle is unchanged): a pair whose
    EVERY sampled frame is within Hamming {VID_HAMMING_T} must, on each
    frame where both dHashes survive the density filter, (a) differ by
    at most {VID_HAMMING_T} in total bit count (each differing bit
    moves the count by one — checked MAP-SIDE at pair-explode time via
    bitcounts carried in the posting structs, before anything
    shuffles), and (b) agree EXACTLY on at least DHASH_BANDS −
    {VID_HAMMING_T} of the bands (pigeonhole: {VID_HAMMING_T} bits can
    spoil at most that many bands) — so (pair, frame) rows need a band-
    match COUNT ≥ that, not the old any-band distinct; and (c) the
    number of such qualifying frames is at least max(1, dense_a +
    dense_b − |sampled frames|), the both-dense lower bound.  On the
    sf0.1 corpus this cuts verified candidates ~33x (1.32M → <40k):
    sparse frames share zero-valued 16-bit band keys in bulk, and the
    old single-band rule admitted all of those pairs to the verify
    join."""
    frames = sample_frames(
        render_doc_videos(spark, sf_dir), every_n=VID_SAMPLE_EVERY
    )
    fid = (
        F.col("path").cast("long") * VID_FRAMES + F.col("frame_idx")
    ).alias("id")
    hashes = dhash_images(
        frames.select(fid, F.col("frame").alias("content"))
    ).select(
        F.floor(F.col("id") / VID_FRAMES).cast("long").alias("doc_id"),
        (F.col("id") % VID_FRAMES).cast("int").alias("f"),
        "dhash",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # same auto density floor as dhash_near_dup (near-blank frames are
    # the measured output-quadratic class — SCALING.md q174 x10 row);
    # OFF at fixture scale so the oracle stays hash-checkable
    floor = resolve_min_hash_bits("auto", _doc_corpus_size_fn(spark, sf_dir))
    dense = (
        F.bit_count("dhash") >= floor
        if floor is not None
        else F.col("dhash") != 0
    )
    n_sampled = len(
        [i for i in range(VID_FRAMES) if i % VID_SAMPLE_EVERY == 0]
    )
    min_bands = DHASH_BANDS - VID_HAMMING_T
    dh = hashes.filter(dense)
    bands = dh.select(
        "doc_id",
        "f",
        F.bit_count("dhash").alias("bc"),
        F.posexplode(dhash_band_keys()).alias("band", "key"),
    )
    bucketed = (
        bands.groupBy("f", "band", "key")
        .agg(
            F.collect_list(
                F.struct(F.col("doc_id").alias("id"), F.col("bc").alias("bc"))
            ).alias("ids")
        )
        .filter(F.size("ids") >= 2)
    )
    from datapipeline_dags_spark.plans.llm_ops import _spread_small

    # AQE coalesces the small bucket aggregate into one partition, which
    # serializes the entire pair explode + band-count verify in a single
    # task (measured ~4.6 s CPU while 31 cores idle) — re-spread in the
    # small regime (llm_ops._spread_small; no-op above SPREAD_GATE_ROWS).
    pf = (
        _spread_small(
            spark,
            blocking.chunk_buckets(bucketed, "q174_video_dhash_neardup", "ids"),
            # gate on the row count of the table the bucket frame
            # actually derives from — the sampled-frame hash table
            # (docs x sampled frames), not bare documents: frames are a
            # fixed per-doc multiple here, but the gate's reasoning
            # (AQE partition count vs aggregated-input size) is about
            # the hash rows feeding the bucket aggregate
            cached_count(
                table(spark, sf_dir, "documents"), f"{sf_dir}/documents"
            )
            * n_sampled,
        )
        .select("f", F.explode(blocking.chunk_pair_structs()).alias("p"))
        # rule (a): map-side bitcount prefilter, before the shuffle
        .filter(
            F.abs(F.col("p.a.bc") - F.col("p.b.bc")) <= VID_HAMMING_T
        )
        .groupBy(
            F.col("p.a.id").alias("id_a"),
            F.col("p.b.id").alias("id_b"),
            "f",
        )
        # rule (b): count = exactly-matching bands for this frame (each
        # band emits a pair at most once, chunked or not)
        .agg(F.count("*").alias("nb"))
        .filter(F.col("nb") >= min_bands)
    )
    dc = dh.groupBy("doc_id").agg(F.count("*").alias("dcnt"))
    cand = (
        pf.groupBy("id_a", "id_b")
        .agg(F.count("*").alias("q"))
        .join(
            dc.select(F.col("doc_id").alias("id_a"), F.col("dcnt").alias("da")),
            "id_a",
        )
        .join(
            dc.select(F.col("doc_id").alias("id_b"), F.col("dcnt").alias("db")),
            "id_b",
        )
        # rule (c): every both-dense frame must have qualified
        .filter(
            F.col("q")
            >= F.greatest(
                F.lit(1), F.col("da") + F.col("db") - F.lit(n_sampled)
            )
        )
        .select("id_a", "id_b")
    )
    ha = hashes.select(
        F.col("doc_id").alias("id_a"), "f", F.col("dhash").alias("h_a")
    )
    hb = hashes.select(
        F.col("doc_id").alias("id_b"), "f", F.col("dhash").alias("h_b")
    )
    per_frame = (
        cand.join(ha, "id_a")
        .join(hb, ["id_b", "f"])
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).alias("hm"),
        )
    )
    return (
        per_frame.groupBy("id_a", "id_b")
        .agg(
            F.max("hm").cast("long").alias("max_hamming"),
            F.sum("hm").cast("long").alias("total_hamming"),
        )
        .filter(F.col("max_hamming") <= VID_HAMMING_T)
    )


@query("q91_image_phash_neardup", oracle=_q91_oracle())
def q91_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (dHash) image near-dup over the rendered corpus:
    one Arrow pass computes the 64-bit hash per image, then q41's banded
    blocking (4 x 16-bit keys) generates candidates and a single JVM
    expression (bit_count(xor)) verifies Hamming <= HAMMING_T.  Scale
    shape matches q41: the shuffle carries (band, 16-bit key) pairs and
    8-byte hashes, never pixel data.  Hash-checked end to end: the
    DuckDB oracle re-derives the pair list from documents with pure
    integer SQL (see ``_q91_oracle``).  Hot (band, key) buckets
    (constant-color images all share one dHash) are chunk-distributed
    with observable counters — see ``dhash_near_dup``."""
    return dhash_near_dup(
        dhash_images(render_doc_images(spark, sf_dir)),
        hamming_t=HAMMING_T,
        name="q91_image_phash_neardup",
        corpus_size_fn=_doc_corpus_size_fn(spark, sf_dir),
    )


# ---------------------------------------------------------------------------
# q205 — audio energy-fingerprint near-dup (the audio leg of the trio)
# ---------------------------------------------------------------------------

#: synthesized words per clip (=> AUD_FP_WORDS frames => 64 comparison
#: bits); shorter documents CYCLE their word list (a looped clip, not
#: silence padding — zero-padding put every short doc's trailing band
#: at key 0, one degenerate bucket holding ~half the corpus; cycling
#: keeps all 64 bits informative), longer ones truncate — mirrored
#: exactly in the oracle.
AUD_FP_WORDS = 65
#: samples per word/frame: the render emits one constant-amplitude
#: frame per word, so the fingerprint's integer frame energies are
#: AUD_FRAME * amplitude — no float DSP crosses the parity boundary.
AUD_FRAME = 100
AUD_RATE = 8000
AUD_HAMMING_T = 4


def _q205_oracle() -> str:
    """SQL re-derivation of render -> energy fingerprint -> banded
    near-dup.  Mirrors ``_render_audio_one`` (per-word amplitude =
    little-endian first two md5 bytes mod 32768, one constant frame
    per word, silence-padded to {AUD_FP_WORDS}),
    ``audio.energy_fingerprints`` (integer frame-energy sums -> MSB-
    first louder-than-next bits; constant frames make each energy
    AUD_FRAME*amp, so amp comparisons suffice), and ``dhash_near_dup``
    (16-bit band keys, zero-hash skip, bit_count(xor) <= T) — all
    integer, bit-identical across engines."""
    return f"""
    WITH pos AS (SELECT unnest(generate_series(0, {AUD_FP_WORDS - 1})) AS i),
    w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    amps AS (
      SELECT doc_id, pos.i AS i,
             (('0x' || substr(md5(ws[(pos.i % len(ws)) + 1]), 1, 2))::BIGINT
              + ('0x' || substr(md5(ws[(pos.i % len(ws)) + 1]), 3, 2))::BIGINT
                * 256) % 32768 AS amp
      FROM w, pos),
    hsh AS (
      SELECT a.doc_id,
             BIT_OR(CASE WHEN a.amp > b.amp
                    THEN CAST(1 AS UBIGINT) << (63 - a.i)
                    ELSE CAST(0 AS UBIGINT) END) AS u
      FROM amps a JOIN amps b
        ON b.doc_id = a.doc_id AND b.i = a.i + 1
      WHERE a.i < 64
      GROUP BY 1),
    bands AS (
      SELECT doc_id, u, bb.b AS band, (u >> (16*bb.b)) & 65535 AS key
      FROM hsh,
           (SELECT unnest(generate_series(0, {DHASH_BANDS - 1})) AS b) bb
      WHERE u <> 0),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, a.u AS u_a,
                             c.doc_id AS id_b, c.u AS u_b
             FROM bands a JOIN bands c
               ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id)
    SELECT id_a, id_b, CAST(bit_count(xor(u_a, u_b)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(u_a, u_b)) <= {AUD_HAMMING_T}
    """


def _render_audio_one(text: str) -> bytes:
    """Deterministic AUD1 synthesis: one {AUD_FRAME}-sample constant-
    amplitude frame per word (amplitude = little-endian first two md5
    bytes of the word mod 32768), the word list CYCLED/truncated to
    {AUD_FP_WORDS} words.  A word edit moves one frame's energy per
    cycle occurrence and so flips <= 2 adjacent fingerprint bits per
    occurrence — text near-dups synthesize to acoustic near-dups, the
    regime the fingerprint is built for.  Cycling (not silence
    padding) keeps every comparison bit informative: a zero-padded
    tail would give ALL short documents the same all-zero low band —
    one degenerate (band, key) bucket holding half a real corpus
    (measured: 2 219 of 5 000 fixture docs), the q42 hot-bucket
    regime created by the render itself."""
    import numpy as np

    words = text.split(" ")
    amps = [
        int.from_bytes(
            hashlib.md5(words[i % len(words)].encode()).digest()[:2], "little"
        )
        % 32768
        for i in range(AUD_FP_WORDS)
    ]
    pcm = np.repeat(np.array(amps, dtype=np.int16), AUD_FRAME)
    return encode_aud1(AUD_RATE, pcm)


def render_doc_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-document AUD1 clip (see _render_audio_one) —
    the audio stand-in column; everything downstream treats the bytes
    as opaque media."""

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "path": pdf["doc_id"].astype("int64").astype(str),
                    "content": [_render_audio_one(t) for t in pdf["text"]],
                }
            )

    from datapipeline_dags_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(
        render,
        StructType(
            [StructField("path", StringType()), StructField("content", BinaryType())]
        ),
    )


@query("q205_audio_energy_neardup", oracle=_q205_oracle())
def q205_audio_energy_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup over the synthesized corpus — the third modality
    leg (q91 images, q174 video, q205 audio): ONE Arrow pass decodes
    AUD1 PCM and computes the 64-bit integer energy fingerprint
    (``operators/audio.py energy_fingerprints``), then the SAME banded
    blocking + Hamming verify machinery as the image/video twins
    (``dhash_near_dup``: 16-bit band keys, chunk-distributed hot
    buckets with observable counters, zero-hash skip, bit_count(xor)
    verify in pure JVM).

    Scale shape: PCM exists only inside the two map-only Arrow passes
    (render, fingerprint); the shuffle carries (band, key) + 8-byte
    fingerprints.  Silence (all-zero fingerprint: monotone or constant
    energy) is excluded from candidate generation exactly like blank
    images — the quadratic no-information class.  Hash-checked end to
    end: the DuckDB oracle re-derives the fingerprints from documents
    with pure integer SQL (``_q205_oracle``)."""
    fps = energy_fingerprints(
        render_doc_audio(spark, sf_dir), frame_len=AUD_FRAME
    )
    return dhash_near_dup(
        fps.select("id", F.col("fp").alias("dhash")),
        hamming_t=AUD_HAMMING_T,
        name="q205_audio_energy_neardup",
        corpus_size_fn=_doc_corpus_size_fn(spark, sf_dir),
    )


# ---------------------------------------------------------------------------
# q275 — video keyframe (scene-change) detection
# ---------------------------------------------------------------------------

#: consecutive-frame dHash Hamming above this marks a scene change
KEYFRAME_T = 8


def _q275_oracle() -> str:
    """The q174 integer frame-dHash derivation with EVERY frame kept
    (every_n=1) + a per-document lag window: delta = Hamming between
    consecutive frame hashes, keyframe = first frame or delta >
    {KEYFRAME_T}."""
    side, n_px = VID_SIDE, VID_SIDE * VID_SIDE
    return f"""
    WITH docs AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
    s AS (SELECT doc_id, unnest(sh) AS s FROM docs),
    dig AS (SELECT doc_id, md5(s) AS h,
                   ('0x'||substr(md5(s), 31, 2))::BIGINT % {VID_FRAMES} AS f
            FROM s),
    ks AS (SELECT unnest(generate_series(0, {N_PIXEL_HASHES - 1})) AS k),
    hits AS (
      SELECT doc_id, f,
             (('0x'||substr(h, 8*k+1, 2))::BIGINT
              + ('0x'||substr(h, 8*k+3, 2))::BIGINT * 256
              + ('0x'||substr(h, 8*k+5, 2))::BIGINT * 65536) % {n_px} AS pix,
             ('0x'||substr(h, 8*k+7, 2))::BIGINT AS v
      FROM dig, ks),
    lit AS (SELECT doc_id, f, pix, MAX(v) AS v FROM hits GROUP BY doc_id, f, pix),
    fr AS (SELECT doc_id, fs.f
           FROM (SELECT doc_id FROM documents) d,
                (SELECT unnest(generate_series(0, {VID_FRAMES - 1})) AS f) fs),
    grid AS (SELECT x, y,
                    LEAST({side - 1}, (y*{side})//{DHASH_H}) * {side}
                    + LEAST({side - 1}, (x*{side})//{DHASH_W}) AS pos
             FROM (SELECT unnest(generate_series(0, {DHASH_W - 1})) AS x),
                  (SELECT unnest(generate_series(0, {DHASH_H - 1})) AS y)),
    small AS (
      SELECT d.doc_id, d.f, g.x, g.y, COALESCE(l.v, 0) AS v
      FROM fr d
      CROSS JOIN grid g
      LEFT JOIN lit l ON l.doc_id = d.doc_id AND l.f = d.f AND l.pix = g.pos),
    hsh AS (
      SELECT a.doc_id, a.f,
             BIT_OR(CASE WHEN a.v > b.v
                    THEN (CAST(1 AS UBIGINT) << (63 - (a.y*{DHASH_W - 1} + a.x)))
                    ELSE CAST(0 AS UBIGINT) END) AS u
      FROM small a JOIN small b
        ON a.doc_id = b.doc_id AND a.f = b.f AND a.y = b.y AND b.x = a.x + 1
      WHERE a.x < {DHASH_W - 1}
      GROUP BY a.doc_id, a.f),
    lagd AS (
      SELECT doc_id, f, u,
             lag(u) OVER (PARTITION BY doc_id ORDER BY f) AS pu
      FROM hsh)
    SELECT doc_id, CAST(f AS BIGINT) AS f,
           CAST(COALESCE(bit_count(xor(u, pu)), -1) AS BIGINT)
             AS delta_hamming,
           CAST(CASE WHEN f = 0
                       OR bit_count(xor(u, pu)) > {KEYFRAME_T}
                     THEN 1 ELSE 0 END AS BIGINT) AS is_keyframe
    FROM lagd
    """


@query("q275_video_keyframes", oracle=_q275_oracle())
def q275_video_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe (scene-change) detection over the rendered video
    corpus: EVERY frame is dHashed (``sample_frames`` with every_n=1 —
    the same explode-shaped operator q174 samples with), and a frame
    is a keyframe when it opens the video or its Hamming distance to
    the previous frame exceeds {KEYFRAME_T} — the shot-boundary pass a
    video-training pipeline runs before picking representative frames
    (q174 dedups across videos; this segments within one).

    Parity: the per-frame hash is q174's pure-integer derivation;
    delta = bit_count(xor) on consecutive frames via a per-document
    lag window; first-frame delta is the sentinel -1.

    Scale shape: pixels exist only inside the two Arrow passes; the
    lag window partitions per document over ≤ {VID_FRAMES} rows; no
    joins beyond the window.
    """
    frames = sample_frames(render_doc_videos(spark, sf_dir), every_n=1)
    fid = (
        F.col("path").cast("long") * VID_FRAMES + F.col("frame_idx")
    ).alias("id")
    hashes = dhash_images(
        frames.select(fid, F.col("frame").alias("content"))
    ).select(
        F.floor(F.col("id") / VID_FRAMES).cast("long").alias("doc_id"),
        (F.col("id") % VID_FRAMES).cast("long").alias("f"),
        "dhash",
    )
    w = W.partitionBy("doc_id").orderBy("f")
    delta = F.bit_count(F.col("dhash").bitwiseXOR(F.lag("dhash").over(w)))
    return hashes.select("doc_id", "f", delta.alias("d")).select(
        "doc_id",
        "f",
        F.coalesce(F.col("d"), F.lit(-1)).cast("long").alias("delta_hamming"),
        ((F.col("f") == 0) | (F.col("d") > KEYFRAME_T))
        .cast("long")
        .alias("is_keyframe"),
    )
