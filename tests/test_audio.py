"""Audio operators: AUD1 decode, frame features vs a numpy reference,
linear resample round-trip, and the explicit non-AUD1 codec boundary."""

from __future__ import annotations

import os

import numpy as np
import pytest

from datapipeline_dags_spark.operators.audio import (
    _decode_audio,
    decode_audio,
    encode_aud1,
    frame_energy_features,
    resample_audio,
)
from datapipeline_dags_spark.operators.multimodal import read_binary_dir

RATE = 8000


def _sine(freq: float, seconds: float, amp: float = 0.5) -> np.ndarray:
    t = np.arange(int(RATE * seconds)) / RATE
    return (np.sin(2 * np.pi * freq * t) * amp * 32767).astype(np.int16)


@pytest.fixture()
def audio_dir(tmp_path):
    d = tmp_path / "aud"
    d.mkdir()
    clips = {
        "tone440.aud1": _sine(440, 0.5),
        "tone880.aud1": _sine(880, 0.25, amp=0.25),
        "silence.aud1": np.zeros(RATE // 4, dtype=np.int16),
    }
    for name, pcm in clips.items():
        (d / name).write_bytes(encode_aud1(RATE, pcm))
    return str(d), clips


def test_decode_stats_match_numpy(spark, audio_dir):
    d, clips = audio_dir
    rows = {
        os.path.basename(r["path"]): r
        for r in decode_audio(read_binary_dir(spark, d)).collect()
    }
    assert set(rows) == set(clips)
    for name, pcm in clips.items():
        r = rows[name]
        x = pcm.astype(np.float64) / 32768.0
        assert r["sample_rate"] == RATE
        assert r["n_samples"] == len(pcm)
        assert r["rms"] == pytest.approx(float(np.sqrt(np.mean(x * x))), rel=1e-5)
        assert r["peak"] == pytest.approx(float(np.max(np.abs(x))), rel=1e-5)


def test_frame_features_silence_vs_tone(spark, audio_dir):
    d, clips = audio_dir
    rows = frame_energy_features(read_binary_dir(spark, d)).collect()
    by_clip: dict[str, list] = {}
    for r in rows:
        by_clip.setdefault(os.path.basename(r["path"]), []).append(r)
    # frame counts: 1 + (n - frame_len) // hop
    for name, pcm in clips.items():
        expect = 1 + (len(pcm) - 256) // 128
        assert len(by_clip[name]) == expect
    assert all(r["energy"] == 0.0 for r in by_clip["silence.aud1"])
    assert all(r["energy"] > 0.1 for r in by_clip["tone440.aud1"])
    # 880 Hz crosses zero ~2x as often as 440 Hz
    z440 = np.mean([r["zcr"] for r in by_clip["tone440.aud1"]])
    z880 = np.mean([r["zcr"] for r in by_clip["tone880.aud1"]])
    assert 1.5 < z880 / z440 < 2.5


def test_resample_halves_length_and_keeps_rms(spark, audio_dir):
    d, clips = audio_dir
    out = {
        os.path.basename(r["path"]): r
        for r in resample_audio(read_binary_dir(spark, d), RATE // 2).collect()
    }
    for name, pcm in clips.items():
        rate, y = _decode_audio(bytes(out[name]["content"]))
        assert rate == RATE // 2
        assert abs(len(y) - len(pcm) / 2) <= 1
        if name.startswith("tone440"):
            # 440 Hz is far below the new Nyquist (2 kHz): RMS preserved
            x = pcm.astype(np.float64) / 32768.0
            yr = y.astype(np.float64) / 32768.0
            assert np.sqrt(np.mean(yr * yr)) == pytest.approx(
                np.sqrt(np.mean(x * x)), rel=0.05
            )


def test_non_aud1_raises_explicit_boundary():
    with pytest.raises(NotImplementedError, match="soundfile"):
        _decode_audio(b"RIFF....WAVE")


def test_energy_fingerprint_golden(spark):
    """Known amplitudes -> known fingerprint: frames [3,1,2] at
    frame_len=2 give energies [6,2,4], bits (6>2)=1, (2>4)=0 -> only
    bit 63 set -> signed int64 -2^63."""
    import numpy as np

    from datapipeline_dags_spark.operators.audio import (
        encode_aud1,
        energy_fingerprints,
    )

    pcm = np.repeat(np.array([3, 1, 2], dtype=np.int16), 2)
    df = spark.createDataFrame(
        [("7", bytearray(encode_aud1(8000, pcm)))], "path string, content binary"
    )
    row = energy_fingerprints(df, frame_len=2).collect()[0]
    assert row["id"] == 7
    assert row["fp"] == -(1 << 63)


def test_audio_neardup_flips_few_bits(spark, tmp_path):
    """A one-word edit moves one frame's energy => <= 2 fingerprint
    bits flip => the pair survives the Hamming gate (the edited word recurs once
    per cycle: 40 words cycle into 65 frames, so frames 20 and 60 move
    => up to 4 bits)."""
    base = " ".join(f"w{i}" for i in range(40))
    edited = base.replace("w20", "zz")
    rows = [(1, base, "en", "s", len(base)), (2, edited, "en", "s", len(edited))]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    from datapipeline_dags_spark.plans.multimodal_queries import (
        q205_audio_energy_neardup,
    )

    out = q205_audio_energy_neardup(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0]["id_a"] == 1 and out[0]["id_b"] == 2
    assert out[0]["hamming"] <= 4
