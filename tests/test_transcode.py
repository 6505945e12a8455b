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


def test_native_flac_matches_python():
    """The C frame encoder (`native/flac_encode.c`) must be byte-identical
    to the numpy reference path on every subframe regime it can hit:
    constant, low-order-fixed (tonal), high-entropy (noise -> large rice k
    or verbatim), ramp, stereo, odd tail blocks, and empty input."""
    from fish_speech_tpu.audio.transcode import _flac_lib

    if _flac_lib() is None:
        pytest.skip("native FLAC encoder unavailable (no C toolchain)")

    rng = np.random.default_rng(7)
    t = np.arange(4096 * 2 + 777)
    cases = [
        np.full(5, 123, np.int16),                                 # constant
        np.zeros(4096, np.int16),                                  # silence
        (8000 * np.sin(t * 0.03)).astype(np.int16),                # tonal
        rng.integers(-32000, 32000, size=9000).astype(np.int16),   # noise
        (t % 2000 - 1000).astype(np.int16),                        # ramp
        rng.integers(-2000, 2000, size=(10000, 2)).astype(np.int16),
        np.int16([]),                                              # empty
        np.int16([-32768, 32767, 0]),                              # extremes
    ]
    for i, x in enumerate(cases):
        py = encode_flac(x, 44100, _force_python=True)
        nat = encode_flac(x, 44100)
        assert py == nat, f"case {i}: native/python byte mismatch"
        if x.size:  # lossless through the full decoder too
            got, _ = decode_flac(nat)
            np.testing.assert_array_equal(
                np.squeeze(got).astype(np.int16), np.squeeze(x)
            )


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


# ---------------------------------------------------------------------------
# Decoder paths our encoder never emits (LPC subframes, stereo decorrelation)
# -- exercised with hand-built conformant streams, since real-world FLAC
# uploads use them.
# ---------------------------------------------------------------------------

import struct

from fish_speech_tpu.audio.transcode import _pack_fields, _utf8_number


def _streaminfo(sr, n_ch, bps, n_total, block_size):
    import io
    si = io.BytesIO()
    si.write(struct.pack(">HH", block_size, block_size))
    si.write(b"\x00\x00\x00" * 2)
    packed = (sr << 44) | ((n_ch - 1) << 41) | ((bps - 1) << 36) | n_total
    si.write(packed.to_bytes(8, "big"))
    si.write(b"\x00" * 16)
    body = si.getvalue()
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _frame_header(bs, n_ch_code, bps_code=0b100, f_idx=0):
    hdr = bytearray([0xFF, 0xF8])
    hdr.append((0b0111 << 4) | 0b0000)
    hdr.append((n_ch_code << 4) | (bps_code << 1))
    hdr += _utf8_number(f_idx)
    hdr += struct.pack(">H", bs - 1)
    hdr.append(crc8(bytes(hdr)))
    return bytes(hdr)


def _rice0_fields(res, k):
    vals, nbits = [0b00, 0b0000, k], [2, 4, 4]
    for r in res:
        u = (int(r) << 1) ^ (int(r) >> 63)
        vals.append((1 << k) | (u & ((1 << k) - 1)))
        nbits.append((u >> k) + 1 + k)
    return vals, nbits


def _build_frame(header, vals, nbits):
    sub = _pack_fields(
        np.asarray(vals, dtype=np.uint64), np.asarray(nbits, dtype=np.int64)
    ).tobytes()
    frame = header + sub
    return frame + struct.pack(">H", crc16(frame))


def test_decode_lpc_subframe():
    bs, bps, order, prec, shift = 16, 16, 2, 12, 4
    qlp = [30, -14]  # x[i] ~ (30*x[i-1] - 14*x[i-2]) >> 4
    warm = [100, 110]
    res = list(range(-7, 7))
    # reconstruct expected
    want = list(warm)
    for i in range(order, bs):
        pred = (qlp[0] * want[i - 1] + qlp[1] * want[i - 2]) >> shift
        want.append(res[i - order] + pred)

    vals = [0, 0b100000 | (order - 1), 0]
    nbits = [1, 6, 1]
    for w in warm:
        vals.append(w & 0xFFFF)
        nbits.append(bps)
    vals += [prec - 1, shift & 0x1F]
    nbits += [4, 5]
    for c in qlp:
        vals.append(c & ((1 << prec) - 1))
        nbits.append(prec)
    rv, rb = _rice0_fields(res, k=2)
    frame = _build_frame(_frame_header(bs, n_ch_code=0), vals + rv, nbits + rb)

    data = _streaminfo(44100, 1, bps, bs, bs) + frame
    got, sr = decode_flac(data)
    np.testing.assert_array_equal(got[:, 0], want)


def _constant_subframe(value, bps):
    return [0, 0b000000, 0, value & ((1 << bps) - 1)], [1, 6, 1, bps]


@pytest.mark.parametrize(
    "ch_code,a,b,expect",
    [
        (8, 100, 30, (100, 70)),    # left/side: right = left - side
        (9, 30, 70, (100, 70)),     # right/side: left = right + side
        (10, 85, 30, (100, 70)),    # mid/side: mid=(l+r)>>1, side=l-r
    ],
)
def test_decode_stereo_decorrelation(ch_code, a, b, expect):
    bs, bps = 16, 16
    # second subframe of a decorrelated pair carries bps+1 bits
    bps_a = bps + (1 if ch_code == 9 else 0)
    bps_b = bps + (1 if ch_code in (8, 10) else 0)
    va, na = _constant_subframe(a, bps_a)
    vb, nb = _constant_subframe(b, bps_b)
    frame = _build_frame(_frame_header(bs, n_ch_code=ch_code), va + vb, na + nb)
    data = _streaminfo(44100, 2, bps, bs, bs) + frame
    got, _ = decode_flac(data)
    assert (got[:, 0] == expect[0]).all() and (got[:, 1] == expect[1]).all()


def test_decode_wasted_bits():
    bs, bps = 16, 16
    # constant subframe with 2 wasted bits: value stored >>2, output <<2
    vals = [0, 0b000000, 1, 0b01, 25 & 0x3FFF]  # wasted flag, unary 1 -> 2
    nbits = [1, 6, 1, 2, bps - 2]
    frame = _build_frame(_frame_header(bs, n_ch_code=0), vals, nbits)
    data = _streaminfo(44100, 1, bps, bs, bs) + frame
    got, _ = decode_flac(data)
    assert (got[:, 0] == 100).all()  # 25 << 2


def test_pack_fields_property():
    """Vectorized bit packer == naive bit-string reference on random
    variable-width fields."""
    rng = np.random.default_rng(11)
    for trial in range(20):
        n = int(rng.integers(1, 200))
        nbits = rng.integers(1, 48, size=n)
        vals = np.array(
            [int(rng.integers(0, 1 << int(b))) for b in nbits], dtype=np.uint64
        )
        got = _pack_fields(vals, nbits.astype(np.int64))
        bits = "".join(format(int(v), f"0{int(b)}b") for v, b in zip(vals, nbits))
        bits += "0" * (-len(bits) % 8)
        want = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
        assert got.tobytes() == want, f"trial {trial}"
