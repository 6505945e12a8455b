"""FLAC codec (from-scratch, audio/transcode.py) and format dispatch.

The reference delegates transcode to libsndfile (`views.py:184-188`); here
flac is native and mp3/opus are gated behind optional backends.
"""

import numpy as np
import pytest

from fish_speech_tpu.audio.transcode import (
    TranscodeUnavailable,
    available_formats,
    crc8,
    crc16,
    decode_flac,
    encode_audio,
    encode_flac,
)


def roundtrip(x, sr=44100, **kw):
    data = encode_flac(x, sr, **kw)
    got, got_sr = decode_flac(data)
    assert got_sr == sr
    return data, got


def test_flac_roundtrip_mono_lossless():
    rng = np.random.default_rng(0)
    # tonal + noise: realistic speech-like signal
    t = np.arange(22050)
    x = (8000 * np.sin(t * 0.03) + rng.normal(0, 300, len(t))).astype(np.int16)
    data, got = roundtrip(x)
    np.testing.assert_array_equal(got[:, 0].astype(np.int16), x)


def test_flac_roundtrip_stereo():
    rng = np.random.default_rng(1)
    x = rng.integers(-2000, 2000, size=(10000, 2)).astype(np.int16)
    _, got = roundtrip(x, sr=24000)
    np.testing.assert_array_equal(got.astype(np.int16), x)


def test_flac_float_input_quantizes():
    t = np.arange(4096)
    f = (0.25 * np.sin(t * 0.01)).astype(np.float32)
    data = encode_flac(f, 44100)
    got, _ = decode_flac(data)
    want = (np.clip(f, -1, 1) * 32767).round().astype(np.int16)
    np.testing.assert_array_equal(got[:, 0].astype(np.int16), want)


@pytest.mark.parametrize("n", [1, 15, 4096, 4097, 8192, 9000])
def test_flac_frame_boundaries(n):
    rng = np.random.default_rng(n)
    x = np.cumsum(rng.integers(-50, 50, size=n)).astype(np.int16)
    _, got = roundtrip(x)
    assert got.shape == (n, 1)
    np.testing.assert_array_equal(got[:, 0].astype(np.int16), x)


def test_flac_constant_and_silence():
    _, got = roundtrip(np.zeros(5000, dtype=np.int16))
    assert not got.any()
    _, got = roundtrip(np.full(5000, -123, dtype=np.int16))
    assert (got == -123).all()


def test_flac_extreme_values_verbatim_path():
    rng = np.random.default_rng(3)
    # full-range white noise defeats prediction -> verbatim subframes
    x = rng.integers(-32768, 32767, size=5000).astype(np.int16)
    _, got = roundtrip(x)
    np.testing.assert_array_equal(got[:, 0].astype(np.int16), x)


def test_flac_actually_compresses():
    t = np.arange(44100)
    x = (12000 * np.sin(t * 0.02)).astype(np.int16)  # smooth -> predictable
    data = encode_flac(x, 44100)
    assert len(data) < 0.5 * x.nbytes  # at least 2x smaller than raw


def test_flac_empty():
    data = encode_flac(np.zeros(0, dtype=np.int16), 44100)
    got, sr = decode_flac(data)
    assert got.shape[0] == 0 and sr == 44100


def test_flac_header_fields():
    x = np.zeros(100, dtype=np.int16)
    data = encode_flac(x, 12345)
    assert data[:4] == b"fLaC"
    _, sr = decode_flac(data)
    assert sr == 12345


def test_crc_vectors():
    # CRC-8/ATM poly 0x07 and CRC-16/BUYPASS poly 0x8005 check values
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def test_dispatch_flac_and_gating():
    x = (1000 * np.sin(np.arange(4096) * 0.01)).astype(np.float32) / 32768
    body = encode_audio(x, 44100, "flac")
    assert body[:4] == b"fLaC"
    fmts = available_formats()
    assert {"wav", "pcm", "flac"} <= set(fmts)
    if "opus" not in fmts:
        with pytest.raises(TranscodeUnavailable):
            encode_audio(x, 44100, "opus")
    if "mp3" not in fmts:
        with pytest.raises(TranscodeUnavailable):
            encode_audio(x, 44100, "mp3")


def test_flac_corrupt_rejected():
    with pytest.raises(ValueError):
        decode_flac(b"RIFFxxxx")


def test_load_audio_accepts_flac():
    from fish_speech_tpu.audio.io import load_audio

    t = np.arange(8000)
    x = (5000 * np.sin(t * 0.02)).astype(np.int16)
    data = encode_flac(x, 16000)
    mono = load_audio(data, 16000)
    np.testing.assert_allclose(mono, x.astype(np.float32) / 32768.0, atol=1e-6)


def test_decode_flac_float_scaling():
    from fish_speech_tpu.audio.transcode import decode_flac_float

    x = np.array([16384, -16384, 32767], dtype=np.int16)
    out, sr = decode_flac_float(encode_flac(x, 8000))
    np.testing.assert_allclose(out[:, 0], x / 32768.0, atol=1e-7)
    assert sr == 8000
