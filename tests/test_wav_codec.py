"""Real-audio end-to-end: the pure-numpy 16-bit PCM WAV codec through
the Spark decode → featurize pipeline — no external codec."""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataslicer_spark.sources.multimodal import (
    decode_audio,
    extract_audio_features,
    read_binary_assets,
    wav_decoder,
    wav_encode,
)


def _tone(n, rate, hz, amp=10000, seed=None):
    t = np.arange(n) / rate
    x = amp * np.sin(2 * np.pi * hz * t)
    if seed is not None:
        x += np.random.default_rng(seed).normal(0, 50, n)
    return np.clip(x, -32768, 32767).astype(np.int16)


def test_wav_roundtrip_mono_and_stereo():
    mono = _tone(480, 8000, 440)
    rate, back = wav_decoder(wav_encode(mono, 8000))
    assert rate == 8000 and np.array_equal(back[:, 0], mono)
    stereo = np.stack([_tone(333, 16000, 220), _tone(333, 16000, 330)], 1)
    rate, back = wav_decoder(wav_encode(stereo, 16000))
    assert rate == 16000 and np.array_equal(back, stereo)


def test_wav_decoder_tolerates_extra_chunks():
    raw = wav_encode(_tone(100, 8000, 100), 8000)
    # splice a LIST chunk (odd size → word-aligned) between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = raw[:fmt_end] + extra + raw[fmt_end:]
    rate, back = wav_decoder(spliced)
    assert rate == 8000 and back.shape == (100, 1)


def test_wav_decoder_rejects_non_pcm16():
    raw = bytearray(wav_encode(_tone(10, 8000, 100), 8000))
    struct.pack_into("<H", raw, 20 + 14, 8)  # bits=8 inside fmt chunk
    with pytest.raises(ValueError):
        wav_decoder(bytes(raw))
    with pytest.raises(ValueError):
        wav_decoder(b"OggS not a wav ......................................")


def test_spark_pipeline_on_real_wav_files(spark, tmp_path):
    clips = {
        "a.wav": (_tone(8000, 8000, 440, seed=1), 8000),     # 1000 ms
        "b.wav": (_tone(4000, 16000, 880, seed=2), 16000),   # 250 ms
    }
    for name, (x, rate) in clips.items():
        (tmp_path / name).write_bytes(wav_encode(x, rate))
    (tmp_path / "corrupt.wav").write_bytes(b"RIFFxxxxWAVEjunk")

    assets = read_binary_assets(
        spark, str(tmp_path / "*.wav"), media_type="audio"
    )
    decoded = decode_audio(assets)  # default wav_decoder — REAL decode
    got = {os.path.basename(r.path): r for r in decoded.collect()}
    for name, (x, rate) in clips.items():
        r = got[name]
        assert (r.sample_rate, r.n_samples, r.n_channels) == (rate, len(x), 1)
        assert np.array_equal(np.array(r.samples, dtype=np.int16), x)
    assert got["corrupt.wav"].samples is None

    feats = {
        os.path.basename(r.path): r
        for r in extract_audio_features(decoded).collect()
    }
    for name, (x, rate) in clips.items():
        f = feats[name]
        assert f.duration_ms == len(x) * 1000 // rate
        assert f.rms == pytest.approx(
            float(np.sqrt(np.mean(x.astype(np.float64) ** 2)))
        )
        assert f.peak == int(np.max(np.abs(x)))
        assert 0.0 < f.zero_crossing_rate < 1.0
    assert feats["corrupt.wav"].rms is None
