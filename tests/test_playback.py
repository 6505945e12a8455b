"""Client-side playback (tools/playback.py; reference plays streamed PCM
via pyaudio, `tools/api_client.py:140-239`). No audio device exists in
CI, so sinks are exercised through the injectable backend list and the
WAV stream parser / format decoders are tested directly.
"""

import io
import struct
import wave

import numpy as np
import pytest

from fish_speech_tpu.audio.transcode import encode_flac
from fish_speech_tpu.tools import playback


class FakeSink(playback.AudioSink):
    instances = []

    def __init__(self, rate, channels):
        self.rate, self.channels = rate, channels
        self.data = bytearray()
        self.closed = False
        FakeSink.instances.append(self)

    def write(self, pcm):
        self.data += pcm

    def close(self):
        self.closed = True


class BrokenSink(playback.AudioSink):
    def __init__(self, rate, channels):
        raise OSError("no device")


def wav_bytes(x: np.ndarray, sr: int = 44100) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(x.astype("<i2").tobytes())
    return buf.getvalue()


def test_open_sink_falls_through_broken_backends():
    sink = playback.open_sink(24000, 1, backends=[BrokenSink, FakeSink])
    assert isinstance(sink, FakeSink)
    assert sink.rate == 24000


def test_open_sink_raises_when_all_fail():
    with pytest.raises(playback.PlaybackUnavailable) as e:
        playback.open_sink(44100, 1, backends=[BrokenSink])
    assert "no playback backend" in str(e.value)


@pytest.mark.parametrize("chunk_size", [1, 7, 44, 8192])
def test_wav_stream_parser_any_chunking(chunk_size):
    x = (np.arange(1000) % 251 * 64).astype(np.int16)
    data = wav_bytes(x, sr=22050)
    parser = playback.WavStreamParser()
    pcm = bytearray()
    for i in range(0, len(data), chunk_size):
        pcm += parser.feed(data[i:i + chunk_size])
    assert parser.rate == 22050 and parser.channels == 1
    np.testing.assert_array_equal(np.frombuffer(bytes(pcm), "<i2"), x)


def test_wav_stream_parser_rejects_non_wav():
    parser = playback.WavStreamParser()
    with pytest.raises(ValueError):
        parser.feed(b"OggS" + b"\x00" * 64)


def test_decode_to_pcm_wav_and_flac():
    x = (2000 * np.sin(np.arange(5000) * 0.02)).astype(np.int16)
    pcm, rate, ch = playback.decode_to_pcm(wav_bytes(x), "wav")
    assert (rate, ch) == (44100, 1)
    np.testing.assert_array_equal(np.frombuffer(pcm, "<i2"), x)

    flac = encode_flac(x, 44100)
    pcm, rate, ch = playback.decode_to_pcm(flac, "flac")
    assert (rate, ch) == (44100, 1)
    np.testing.assert_array_equal(np.frombuffer(pcm, "<i2"), x)


def test_decode_to_pcm_mp3_opus_if_available():
    from fish_speech_tpu.audio.transcode import available_formats

    fmts = available_formats()
    x = (0.3 * np.sin(np.arange(44100) * 0.05)).astype(np.float32)
    from fish_speech_tpu.audio.transcode import encode_audio

    for fmt, rate_want in (("mp3", 44100), ("opus", 48000)):
        if fmt not in fmts:
            continue  # pragma: no cover
        body = encode_audio(x, 44100, fmt)
        pcm, rate, ch = playback.decode_to_pcm(body, fmt)
        assert rate == rate_want and ch == 1
        assert len(pcm) > 2 * 40000


def test_decode_to_pcm_unknown_format():
    with pytest.raises(ValueError):
        playback.decode_to_pcm(b"xx", "au")
