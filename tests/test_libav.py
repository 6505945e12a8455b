"""Cross-validation of the from-scratch encoders against ffmpeg's
independent decoders (libavformat/libavcodec via native/av_decode.c), plus
the libav input fallback in load_audio.

This closes the round-1 caveat "no external FLAC decoder exists in this
environment": ffmpeg's FLAC decoder shares no authorship with
audio/transcode.py, and its Ogg demuxer independently checks the RFC
3533/7845 container written by audio/libcodec.py (pre-skip and end-trim
granule included — the decoded length must be exact).
"""

import numpy as np
import pytest

from fish_speech_tpu.audio import libav

pytestmark = pytest.mark.skipif(
    not libav.available(), reason="libav shim unavailable on this system"
)


def _sig(n, sr, seed=0, ch=1):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    base = 0.5 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 733 * t)
    out = np.stack(
        [base + 0.02 * rng.standard_normal(n) for _ in range(ch)], axis=1
    ).astype(np.float32)
    return out if ch > 1 else out[:, 0]


def _to_i16(x):
    return np.clip(np.round(np.asarray(x) * 32767.0), -32768, 32767).astype(
        np.int64
    )


class TestFlacCrossValidation:
    @pytest.mark.parametrize("n", [1, 4095, 22050])
    def test_mono_sample_exact(self, n):
        from fish_speech_tpu.audio.transcode import encode_flac

        x = _sig(n, 44100, seed=n)
        data = encode_flac(x, 44100)
        pcm, sr = libav.decode_bytes(data)
        assert sr == 44100 and pcm.shape == (n, 1)
        # ffmpeg emits s16 scaled by 1/32768; undo exactly.
        dec = np.round(pcm[:, 0] * 32768.0).astype(np.int64)
        np.testing.assert_array_equal(dec, _to_i16(x))

    def test_stereo_sample_exact(self):
        from fish_speech_tpu.audio.transcode import encode_flac

        x = _sig(9001, 44100, seed=7, ch=2)
        data = encode_flac(x, 44100)
        pcm, sr = libav.decode_bytes(data)
        assert sr == 44100 and pcm.shape == (9001, 2)
        dec = np.round(pcm * 32768.0).astype(np.int64)
        np.testing.assert_array_equal(dec, _to_i16(x))

    def test_silence_and_constant(self):
        from fish_speech_tpu.audio.transcode import encode_flac

        for x in (np.zeros(5000, np.float32),
                  np.full(5000, 0.25, np.float32)):
            pcm, sr = libav.decode_bytes(encode_flac(x, 24000))
            assert sr == 24000
            dec = np.round(pcm[:, 0] * 32768.0).astype(np.int64)
            np.testing.assert_array_equal(dec, _to_i16(x))


class TestOggOpusCrossValidation:
    def test_length_exact_and_faithful(self):
        """ffmpeg must honor our OpusHead pre-skip and final-page granule:
        decoded length == exactly the 48 kHz-resampled input length."""
        from fish_speech_tpu.audio.io import resample
        from fish_speech_tpu.audio.libcodec import encode_opus

        x = _sig(44100, 44100, seed=3)
        ogg = encode_opus(x, 44100)
        pcm, sr = libav.decode_bytes(ogg)
        assert sr == 48000
        n48 = round(len(x) * 48000 / 44100)
        assert pcm.shape == (n48, 1)
        ref = resample(x, 44100, 48000)
        m = min(len(ref), len(pcm))
        corr = np.corrcoef(ref[:m], pcm[:m, 0])[0, 1]
        assert corr > 0.99

    def test_short_stream(self):
        from fish_speech_tpu.audio.libcodec import encode_opus

        x = _sig(480, 48000, seed=4)  # shorter than one 20 ms frame
        pcm, sr = libav.decode_bytes(encode_opus(x, 48000))
        assert sr == 48000 and pcm.shape == (480, 1)


class TestMp3CrossValidation:
    def test_decodes_and_aligns(self):
        """Raw LAME streams carry untrimmed codec delay (no container to
        record it), so align by cross-correlation before comparing."""
        from fish_speech_tpu.audio.libcodec import encode_mp3

        x = _sig(44100, 44100, seed=5)
        pcm, sr = libav.decode_bytes(encode_mp3(x, 44100))
        assert sr == 44100
        y = pcm[:, 0]
        assert len(y) >= len(x)
        lags = np.arange(0, 4000)
        best = max(
            lags,
            key=lambda d: float(np.dot(y[d:d + 10000], x[:10000])),
        )
        m = min(len(x), len(y) - best)
        corr = np.corrcoef(x[:m], y[best:best + m])[0, 1]
        assert corr > 0.95


class TestLoadAudioFallback:
    def test_mp3_bytes(self):
        from fish_speech_tpu.audio.io import load_audio
        from fish_speech_tpu.audio.libcodec import encode_mp3

        x = _sig(22050, 44100, seed=6)
        out = load_audio(encode_mp3(x, 44100), 16000)
        assert out.ndim == 1 and out.dtype == np.float32
        assert abs(len(out) - 22050 * 16000 / 44100) < 3000  # mp3 pads

    def test_ogg_opus_file(self, tmp_path):
        from fish_speech_tpu.audio.io import load_audio
        from fish_speech_tpu.audio.libcodec import encode_opus

        x = _sig(12000, 44100, seed=8)
        p = tmp_path / "ref.ogg"
        p.write_bytes(encode_opus(x, 44100))
        out = load_audio(p, 44100)
        n_expect = round(round(12000 * 48000 / 44100) * 44100 / 48000)
        assert abs(len(out) - n_expect) <= 2

    def test_garbage_raises(self):
        from fish_speech_tpu.audio.io import load_audio

        with pytest.raises(ValueError):
            load_audio(b"\x01\x02definitely-not-audio" * 40, 44100)

    def test_wav_path_unchanged(self, tmp_path):
        """WAV must keep using the self-contained reader (byte-identical
        result with the libav stack present or absent)."""
        from fish_speech_tpu.audio.io import load_audio, write_wav

        x = _sig(8000, 22050, seed=9)
        p = tmp_path / "a.wav"
        write_wav(p, x, 22050)
        out = load_audio(p, 22050)
        np.testing.assert_allclose(out, _to_i16(x) / 32767.0, atol=2e-4)
