"""Native mp3 / Ogg-Opus codecs (audio/libcodec.py).

The reference serves these formats via libsndfile (`views.py:184-188`);
here they bind the system libmp3lame / libopus directly and the Ogg
container is written from scratch (RFC 3533 + RFC 7845). Every test
round-trips through the library's own decoder, so a passing run proves
the emitted streams are real mp3 / Ogg-Opus, not just plausible bytes.
"""

import struct

import numpy as np
import pytest

from fish_speech_tpu.audio import libcodec
from fish_speech_tpu.audio.transcode import (
    TranscodeUnavailable,
    available_formats,
    encode_audio,
)


def _have(name: str) -> bool:
    try:
        if name == "mp3":
            libcodec._load_lame()
        else:
            libcodec._load_opus()
        return True
    except TranscodeUnavailable:
        return False


needs_lame = pytest.mark.skipif(not _have("mp3"), reason="libmp3lame absent")
needs_opus = pytest.mark.skipif(not _have("opus"), reason="libopus absent")


def tone(sr: int, seconds: float = 1.0, hz: float = 440.0) -> np.ndarray:
    t = np.arange(int(sr * seconds))
    return (0.5 * np.sin(2 * np.pi * hz * t / sr)).astype(np.float32)


def aligned_corr(dec: np.ndarray, ref: np.ndarray, max_lag: int) -> float:
    """Max normalized cross-correlation over decoder-delay lags."""
    n = min(len(ref), len(dec) - max_lag, 20000)
    ref = ref[:n].astype(np.float64)
    best = -1.0
    for lag in range(max_lag):
        seg = dec[lag:lag + n].astype(np.float64)
        denom = np.linalg.norm(seg) * np.linalg.norm(ref)
        if denom > 0:
            best = max(best, float(np.dot(seg, ref) / denom))
    return best


# ---------------------------------------------------------------------------
# MP3
# ---------------------------------------------------------------------------


@needs_lame
def test_mp3_roundtrip_mono():
    x = tone(44100)
    data = libcodec.encode_mp3(x, 44100)
    assert data[:2] in (b"\xff\xfb", b"\xff\xfa", b"ID3"[:2]) or data[0] == 0xFF
    dec, sr = libcodec.decode_mp3(data)
    assert sr == 44100
    assert dec.shape[1] == 1
    # lame pads with its decoder delay; lengths agree to within 2 frames
    assert abs(len(dec) - len(x)) < 2 * 1152 + 1152
    corr = aligned_corr(dec[:, 0] / 32768.0, x, max_lag=2500)
    assert corr > 0.99


@needs_lame
def test_mp3_roundtrip_stereo_int16():
    rng = np.random.default_rng(7)
    t = np.arange(24000)
    left = (6000 * np.sin(t * 0.05)).astype(np.int16)
    right = (4000 * np.sin(t * 0.08)).astype(np.int16)
    x = np.stack([left, right], axis=1)
    dec, sr = libcodec.decode_mp3(libcodec.encode_mp3(x, 24000))
    assert sr == 24000
    assert dec.shape[1] == 2
    corr = aligned_corr(dec[:, 0] / 32768.0, left / 32768.0, max_lag=2500)
    assert corr > 0.98


@needs_lame
def test_mp3_decode_rejects_garbage():
    with pytest.raises(ValueError):
        libcodec.decode_mp3(b"\x00" * 4096)


# ---------------------------------------------------------------------------
# Ogg-Opus
# ---------------------------------------------------------------------------


@needs_opus
def test_opus_roundtrip_mono_441k():
    x = tone(44100, seconds=1.3)
    data = libcodec.encode_opus(x, 44100)
    assert data[:4] == b"OggS"
    dec, sr = libcodec.decode_opus(data)
    assert sr == 48000
    assert dec.shape[1] == 1
    # pre-skip + granule trim give back exactly the resampled length
    n48 = int(round(len(x) * 48000 / 44100))
    assert len(dec) == n48
    # content survives 44.1k -> 48k -> opus -> 48k (compare vs resampled ref)
    ref = libcodec._resample_to_48k(x, 44100)
    num = float(np.dot(dec[: len(ref), 0], ref[: len(dec)]))
    den = float(np.linalg.norm(dec[:, 0]) * np.linalg.norm(ref)) + 1e-9
    assert num / den > 0.99


@needs_opus
def test_opus_roundtrip_native_48k_stereo():
    rng = np.random.default_rng(3)
    t = np.arange(48000)
    x = np.stack([
        0.4 * np.sin(2 * np.pi * 300 * t / 48000),
        0.4 * np.sin(2 * np.pi * 500 * t / 48000),
    ], axis=1).astype(np.float32)
    dec, sr = libcodec.decode_opus(libcodec.encode_opus(x, 48000))
    assert sr == 48000 and dec.shape == x.shape
    for c in range(2):
        num = float(np.dot(dec[:, c], x[:, c]))
        den = float(np.linalg.norm(dec[:, c]) * np.linalg.norm(x[:, c])) + 1e-9
        assert num / den > 0.99


@needs_opus
def test_ogg_pages_structurally_valid():
    data = libcodec.encode_opus(tone(44100, 0.5), 44100)
    pages = list(libcodec._ogg_pages(data))
    # BOS page with OpusHead alone, then OpusTags, then audio, EOS last
    assert pages[0][0] & 0x02 and pages[0][2][0][:8] == b"OpusHead"
    assert pages[1][2][0][:8] == b"OpusTags"
    assert pages[-1][0] & 0x04
    # granule positions are non-decreasing across audio pages
    granules = [g for h, g, p, c in pages[2:]]
    assert granules == sorted(granules)
    # CRC of every page verifies (recompute with field zeroed)
    pos = 0
    while pos < len(data):
        nseg = data[pos + 26]
        body_len = sum(data[pos + 27:pos + 27 + nseg])
        end = pos + 27 + nseg + body_len
        page = bytearray(data[pos:end])
        want = struct.unpack("<I", page[22:26])[0]
        page[22:26] = b"\x00\x00\x00\x00"
        assert libcodec._ogg_crc(bytes(page)) == want
        pos = end


@needs_opus
def test_opus_decode_rejects_garbage():
    with pytest.raises(ValueError):
        libcodec.decode_opus(b"\x00" * 64)


# ---------------------------------------------------------------------------
# Dispatch integration
# ---------------------------------------------------------------------------


@needs_lame
def test_available_formats_include_mp3():
    assert "mp3" in available_formats()


@needs_opus
def test_available_formats_include_opus():
    assert "opus" in available_formats()


@needs_lame
def test_encode_audio_mp3_dispatch():
    out = encode_audio(tone(44100, 0.3), 44100, "mp3")
    dec, sr = libcodec.decode_mp3(out)
    assert sr == 44100 and len(dec) > 10000


@needs_opus
def test_encode_audio_opus_dispatch():
    out = encode_audio(tone(44100, 0.3), 44100, "opus")
    dec, sr = libcodec.decode_opus(out)
    assert sr == 48000 and len(dec) > 10000
