"""WSOLA time-stretch (`audio/stretch.py`): the OpenAI `speed` primitive.

Properties: output length tracks 1/rate exactly, pitch (dominant frequency)
is preserved while duration changes, energy is preserved, rate=1 is the
identity, out-of-contract rates are rejected, and sub-window inputs fall
back to resampling instead of crashing.
"""

import numpy as np
import pytest

from fish_speech_tpu.audio.stretch import time_stretch


def _sine(freq=220.0, seconds=1.5, sr=44100):
    t = np.arange(int(sr * seconds)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32), sr


@pytest.mark.parametrize("rate", [0.5, 0.8, 1.25, 2.0, 4.0])
def test_length_follows_rate_exactly(rate):
    x, _ = _sine()
    y = time_stretch(x, rate)
    assert len(y) == int(round(len(x) / rate))


@pytest.mark.parametrize("rate", [0.5, 2.0])
def test_pitch_preserved_while_duration_changes(rate):
    x, sr = _sine(freq=220.0)
    y = time_stretch(x, rate)
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak_hz = np.fft.rfftfreq(len(y), 1 / sr)[np.argmax(spec)]
    # a naive resample would move the peak to 220*rate (110 or 440)
    assert abs(peak_hz - 220.0) < 5.0


def test_energy_preserved():
    x, _ = _sine()
    y = time_stretch(x, 2.0)
    rms_x = np.sqrt((x**2).mean())
    rms_y = np.sqrt((y**2).mean())
    assert abs(rms_y - rms_x) / rms_x < 0.05


def test_rate_one_is_identity():
    x, _ = _sine(seconds=0.25)
    np.testing.assert_array_equal(time_stretch(x, 1.0), x)


def test_out_of_contract_rates_rejected():
    x, _ = _sine(seconds=0.1)
    with pytest.raises(ValueError):
        time_stretch(x, 0.1)
    with pytest.raises(ValueError):
        time_stretch(x, 5.0)
    with pytest.raises(ValueError):
        time_stretch(np.zeros((2, 100), np.float32), 2.0)


def test_short_input_falls_back_to_resample():
    x = np.sin(np.linspace(0, 20, 500)).astype(np.float32)
    y = time_stretch(x, 2.0)
    assert len(y) == 250 and np.isfinite(y).all()


def test_empty_input():
    assert time_stretch(np.zeros(0, np.float32), 2.0).size == 0
