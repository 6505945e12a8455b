import numpy as np

from fish_speech_tpu.audio.io import (
    load_audio,
    read_wav,
    resample,
    wav_chunk_header,
    write_wav,
)


def test_wav_roundtrip(tmp_path):
    sr = 16000
    t = np.linspace(0, 1, sr, endpoint=False)
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, x, sr)
    y, sr2 = read_wav(p)
    assert sr2 == sr
    assert y.shape == (1, sr)
    np.testing.assert_allclose(y[0], x, atol=1.5 / 32768)


def test_stereo_and_downmix(tmp_path):
    sr = 8000
    x = np.stack([np.ones(100, np.float32) * 0.5, np.zeros(100, np.float32)])
    p = tmp_path / "s.wav"
    write_wav(p, x, sr)
    y, _ = read_wav(p)
    assert y.shape == (2, 100)
    mono = load_audio(str(p), sr)
    np.testing.assert_allclose(mono, np.full(100, 0.25), atol=1e-3)


def test_resample_length():
    x = np.zeros(44100, np.float32)
    y = resample(x, 44100, 16000)
    assert abs(len(y) - 16000) <= 1
    assert resample(x, 44100, 44100) is x


def test_resample_preserves_tone():
    sr1, sr2 = 44100, 22050
    t = np.arange(sr1) / sr1
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = resample(x, sr1, sr2)
    # dominant frequency still ~1000 Hz
    spec = np.abs(np.fft.rfft(y[1000:-1000] * np.hanning(len(y) - 2000)))
    freq = np.fft.rfftfreq(len(y) - 2000, 1 / sr2)
    assert abs(freq[spec.argmax()] - 1000) < 10


def test_wav_chunk_header_parses():
    h = wav_chunk_header(44100, 16, 1)
    assert h[:4] == b"RIFF" and h[8:12] == b"WAVE"
    assert len(h) == 44


def test_read_wav_from_bytes(tmp_path):
    sr = 8000
    x = np.zeros(50, np.float32)
    p = tmp_path / "b.wav"
    write_wav(p, x, sr)
    y, sr2 = read_wav(p.read_bytes())
    assert sr2 == sr and y.shape == (1, 50)


def test_load_audio_fuzz_mutations_never_crash(tmp_path):
    """Seeded fuzz over the reference-upload decode surface: mutated
    WAV/FLAC bytes through `load_audio` must decode (finite mono
    samples) or raise a clean error — never crash or hang (clients
    upload arbitrary bytes to /v1/references)."""
    from fish_speech_tpu.audio.io import load_audio, write_wav
    from fish_speech_tpu.audio.transcode import encode_flac

    rng = np.random.default_rng(0)
    audio = (rng.normal(size=8000) * 0.1).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, audio, 8000)
    sources = [p.read_bytes(), encode_flac(audio[:, None], 8000)]

    decoded = errors = 0
    for trial in range(200):
        buf = bytearray(sources[trial % 2])
        kind = trial % 6
        if kind in (0, 1):
            for _ in range(int(rng.integers(1, 12))):
                i = int(rng.integers(0, len(buf)))
                buf[i] ^= int(rng.integers(1, 256))
        elif kind in (2, 3):
            buf = buf[: int(rng.integers(0, len(buf)))]
        else:
            i = int(rng.integers(0, len(buf)))
            buf[i:i] = bytes(rng.integers(
                0, 256, size=int(rng.integers(1, 64)), dtype=np.uint8))
        try:
            x = load_audio(bytes(buf), 8000)
            assert x.ndim == 1
            assert x.size == 0 or np.isfinite(x).all()
            decoded += 1
        except Exception:
            errors += 1
    assert decoded + errors == 200
