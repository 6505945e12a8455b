import numpy as np
import pytest

from fish_speech_tpu.utils.file import braceexpand, get_latest_checkpoint, list_files


def test_braceexpand_list():
    assert list(braceexpand("a{b,c}d")) == ["abd", "acd"]
    assert list(braceexpand("x{1,2}{a,b}")) == ["x1a", "x1b", "x2a", "x2b"]
    assert list(braceexpand("plain")) == ["plain"]


def test_braceexpand_range():
    assert list(braceexpand("s{1..3}")) == ["s1", "s2", "s3"]
    assert list(braceexpand("s{01..03}")) == ["s01", "s02", "s03"]
    assert list(braceexpand("s{3..1}")) == ["s3", "s2", "s1"]


def test_get_latest_checkpoint(tmp_path):
    assert get_latest_checkpoint(tmp_path) is None
    import time

    (tmp_path / "step_00000001").mkdir()
    time.sleep(0.01)
    (tmp_path / "step_00000005").mkdir()
    assert get_latest_checkpoint(tmp_path).name == "step_00000005"


def test_concat_repeat_and_vqgan(tmp_path):
    from fish_speech_tpu.audio.io import write_wav
    from fish_speech_tpu.data.dataset import ConcatRepeatDataset, VQGANDataset

    class Count:
        def __init__(self, base):
            self.base = base

        def __iter__(self):
            i = 0
            while True:
                yield self.base + i
                i += 1

    mix = ConcatRepeatDataset([Count(0), Count(100)], repeats=2)
    it = iter(mix)
    assert [next(it) for _ in range(4)] == [0, 1, 100, 101]

    # vqgan dataset
    sr = 44100
    for i in range(2):
        write_wav(tmp_path / f"{i}.wav",
                  np.random.default_rng(i).normal(size=sr // 4).astype(np.float32) * 0.1,
                  sr)
    (tmp_path / "vq_train_filelist.txt").write_text("0.wav\n1.wav")
    ds = VQGANDataset(str(tmp_path / "vq_train_filelist.txt"), slice_frames=8)
    item = ds[0]
    assert item["audio"].dtype == np.float32
    assert len(item["audio"]) % 512 == 0
    it = iter(ds)
    assert next(it) is not None


def test_naive_transformer():
    import jax
    import jax.numpy as jnp

    from fish_speech_tpu.config import dual_ar_tiny
    from fish_speech_tpu.models.naive import forward_train_naive, init_naive

    cfg = dual_ar_tiny(semantic_begin_id=300, semantic_end_id=331, im_end_id=3)
    params = init_naive(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    inp = np.zeros((1, cfg.num_codebooks + 1, 8), dtype=np.int32)
    inp[0, 0] = np.arange(8) + 10
    tok, cb = forward_train_naive(params, cfg, jnp.asarray(inp))
    assert tok.shape == (1, 8, cfg.vocab_size)
    assert cb.shape == (1, 8, cfg.num_codebooks, cfg.codebook_size)
    assert np.isfinite(np.asarray(cb)).all()


def test_spectrograms():
    import jax.numpy as jnp

    from fish_speech_tpu.audio.spectrogram import (
        linear_spectrogram,
        log_mel_spectrogram,
    )

    t = 44100 // 4
    x = jnp.asarray(
        np.sin(2 * np.pi * 440 * np.arange(t) / 44100).astype(np.float32)
    )[None]
    mel = log_mel_spectrogram(x, n_mels=160)
    assert mel.shape[1] == 160
    assert np.isfinite(np.asarray(mel)).all()
    lin = linear_spectrogram(x)
    assert lin.shape[-1] == 1025
    # 440 Hz peak in the right bin neighbourhood
    spec = np.asarray(lin)[0].mean(axis=0)
    peak_bin = spec.argmax()
    assert abs(peak_bin - round(440 / (44100 / 2048))) <= 1


def test_ranked_logger(caplog):
    import logging

    from fish_speech_tpu.utils.logging import RankedLogger

    log = RankedLogger("test", rank_zero_only=True)
    with caplog.at_level(logging.INFO, logger="test"):
        log.info("hello")
    assert any("rank: 0" in r.message for r in caplog.records)
