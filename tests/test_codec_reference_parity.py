"""Executed full-codec parity vs the reference PyTorch modded-DAC.

The codec analogue of `tests/test_reference_parity.py`: instantiate the REAL
reference codec (`/root/reference/fish_speech/models/dac/modded_dac.py` +
`rvq.py`) on CPU with random weights, save `codec.pth` -> our converter ->
assert

  (a) `DAC.encode` produces IDENTICAL code indices (`modded_dac.py:874-923`),
  (b) `DAC.from_indices` waveforms match closely (`modded_dac.py:925-927`),
  (c) component-level parity: encoder latents, quantizer forward (z, codes,
      commitment/codebook losses, incl. the left-pad/crop glue,
      `rvq.py:323-333`), and decoder waveform,
  (d) the round trip encode -> from_indices matches end to end,
  (e) the decoder transformer layers declared in `modded_dac_vq.yaml` leave
      NO state-dict entries (constructed but never wired into the decoder
      Sequential, `modded_dac.py:741-742`) — pinning why our DACConfig has
      no decoder-transformer field.

The reference's `dac`/`audiotools` imports are not installed; a minimal
stand-in re-expressing those published-algorithm modules
(`tests/dac_standin.py`) is injected into sys.modules first. The reference
package itself is imported as untrusted read-only code — only the model
definitions are executed.
"""

import functools
import math
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

import dac_standin
from fish_speech_tpu.config import CodecTransformerConfig, DACConfig, RVQConfig
from fish_speech_tpu.convert.dac import convert_dac
from fish_speech_tpu.models.dac.model import (
    dac_encode,
    dac_from_indices,
    decoder_forward,
    encoder_forward,
)
from fish_speech_tpu.models.dac.rvq import downsample_rvq_encode

REF_ROOT = "/root/reference"

RTOL, ATOL = 2e-4, 3e-4


@pytest.fixture(scope="module")
def ref_dac():
    """Import the reference codec with its third-party deps stood in."""
    dac_standin.install()
    if "loguru" not in sys.modules:
        loguru = types.ModuleType("loguru")

        class _Logger:
            def __getattr__(self, name):
                return lambda *a, **k: None

        loguru.logger = _Logger()
        sys.modules["loguru"] = loguru
    if "loralib" not in sys.modules:
        sys.modules["loralib"] = types.ModuleType("loralib")
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import importlib

    mdac = importlib.import_module("fish_speech.models.dac.modded_dac")
    rvq = importlib.import_module("fish_speech.models.dac.rvq")
    return mdac, rvq


# ---------------------------------------------------------------------------
# Config matrix. "tiny" is a conv+RVQ-only layout (no transformers anywhere):
# it isolates the encoder/decoder/snake/RVQ/downsample glue. "s2pro_shape"
# reproduces every structural feature of the production layout
# (`fish_speech/configs/modded_dac_vq.yaml`) at reduced width: 4 encoder
# transformer layers -> 2, pre+post window-limited transformers with an
# ACTIVE window (window < T'), 9 residual codebooks, decoder transformer
# declared but unwired. head_dim stays 64 (dictated by the reference's
# partial-config closure, `modded_dac.py:638-649`).
# ---------------------------------------------------------------------------

TINY = dict(
    encoder_dim=8,
    encoder_rates=(2, 4, 4),
    decoder_dim=32,
    decoder_rates=(4, 4, 2),
    enc_tlayers=(0, 0, 0),
    dec_tlayers=(0, 0, 0),
    n_codebooks=3,
    codebook_size=32,
    semantic_codebook_size=64,
    codebook_dim=4,
    downsample_factor=(2, 2),
    pre_post_layers=0,
    pre_post_window=None,
)

S2PRO_SHAPE = dict(
    encoder_dim=4,
    encoder_rates=(2, 4, 8, 8),
    decoder_dim=64,
    decoder_rates=(8, 8, 4, 2),
    enc_tlayers=(0, 0, 0, 2),
    dec_tlayers=(1, 0, 0, 0),  # constructed but unwired in the reference
    n_codebooks=9,
    codebook_size=64,
    semantic_codebook_size=160,
    codebook_dim=8,
    downsample_factor=(2, 2),
    pre_post_layers=2,
    pre_post_window=4,
)


def _latent_dim(kw):
    return kw["encoder_dim"] * (2 ** len(kw["encoder_rates"]))


def _build_ref_codec(mdac, rvq_mod, kw, seed=0):
    latent = _latent_dim(kw)
    # the hydra `_partial_` ModelArgs closure from modded_dac_vq.yaml
    tgc = functools.partial(
        mdac.ModelArgs,
        block_size=2048,
        n_local_heads=-1,
        head_dim=64,
        rope_base=10000,
        norm_eps=1e-5,
        dropout_rate=0.1,
        attn_dropout_rate=0.1,
        channels_first=True,
    )

    def make_pre_post():
        if kw["pre_post_layers"] == 0:
            return None
        return mdac.WindowLimitedTransformer(
            causal=True,
            window_size=kw["pre_post_window"],
            input_dim=latent,
            config=mdac.ModelArgs(
                block_size=2048,
                n_layer=kw["pre_post_layers"],
                n_head=max(latent // 64, 1),
                dim=latent,
                intermediate_size=latent * 3,
                n_local_heads=-1,
                head_dim=64,
                rope_base=10000,
                norm_eps=1e-5,
                dropout_rate=0.1,
                attn_dropout_rate=0.1,
                channels_first=True,
            ),
        )

    torch.manual_seed(seed)
    quantizer = rvq_mod.DownsampleResidualVectorQuantize(
        input_dim=latent,
        n_codebooks=kw["n_codebooks"],
        codebook_dim=kw["codebook_dim"],
        quantizer_dropout=0.5,
        codebook_size=kw["codebook_size"],
        semantic_codebook_size=kw["semantic_codebook_size"],
        downsample_factor=kw["downsample_factor"],
        pre_module=make_pre_post(),
        post_module=make_pre_post(),
    )
    model = mdac.DAC(
        encoder_dim=kw["encoder_dim"],
        encoder_rates=list(kw["encoder_rates"]),
        decoder_dim=kw["decoder_dim"],
        decoder_rates=list(kw["decoder_rates"]),
        quantizer=quantizer,
        sample_rate=44100,
        causal=True,
        encoder_transformer_layers=list(kw["enc_tlayers"]),
        decoder_transformer_layers=list(kw["dec_tlayers"]),
        transformer_general_config=tgc,
    )
    # Give every parameter a nontrivial value (default init leaves norms at
    # exactly 1, layer scales at 1e-2/1e-6, biases at 0).
    gen = torch.Generator().manual_seed(seed + 1)

    def randn(shape):
        return torch.randn(shape, generator=gen)

    with torch.no_grad():
        for name, p in model.named_parameters():
            if "alpha" in name:  # snake frequencies: keep near 1
                p.copy_(1.0 + 0.1 * randn(p.shape))
            elif "gamma" in name:  # layer scales: make the branches matter
                p.copy_(0.2 + 0.05 * randn(p.shape))
            elif "codebook" in name:
                p.copy_(randn(p.shape))
            elif "norm" in name:
                if name.endswith("bias"):
                    p.copy_(0.05 * randn(p.shape))
                else:
                    p.copy_(1.0 + 0.1 * randn(p.shape))
            elif p.ndim == 1:  # biases
                p.copy_(0.05 * randn(p.shape))
            else:
                p.copy_(0.04 * randn(p.shape))
    model.eval()
    return model


def _native_cfg(kw) -> DACConfig:
    latent = _latent_dim(kw)
    pre_post = None
    if kw["pre_post_layers"]:
        pre_post = CodecTransformerConfig(
            n_layer=kw["pre_post_layers"],
            n_head=max(latent // 64, 1),
            dim=latent,
            intermediate_size=latent * 3,
            head_dim=64,
            window_size=kw["pre_post_window"],
        ).resolve()
    rvq = RVQConfig(
        input_dim=latent,
        n_codebooks=kw["n_codebooks"],
        codebook_dim=kw["codebook_dim"],
        codebook_size=kw["codebook_size"],
        semantic_codebook_size=kw["semantic_codebook_size"],
        downsample_factor=kw["downsample_factor"],
        quantizer_dropout=0.5,
        pre_transformer=pre_post,
        post_transformer=pre_post,
    )
    return DACConfig(
        sample_rate=44100,
        encoder_dim=kw["encoder_dim"],
        encoder_rates=kw["encoder_rates"],
        decoder_dim=kw["decoder_dim"],
        decoder_rates=kw["decoder_rates"],
        encoder_transformer_layers=kw["enc_tlayers"],
        rvq=rvq,
    )


def _convert(model, cfg, tmp_path):
    """torch.save(state_dict) -> codec.pth -> convert_dac (the user flow)."""
    path = tmp_path / "codec.pth"
    torch.save(model.state_dict(), str(path))
    return convert_dac(str(path), cfg)


def _random_audio(cfg, n_frames, b=2, seed=11, frac_last=0.5):
    """(B, 1, T) audio covering a non-multiple of frame_length."""
    rng = np.random.default_rng(seed)
    t = int(cfg.frame_length * (n_frames - 1 + frac_last))
    return (rng.normal(size=(b, 1, t)) * 0.3).astype(np.float32)


def _run_parity(ref_dac, tmp_path, kw, n_frames, wav_atol):
    mdac, rvq_mod = ref_dac
    model = _build_ref_codec(mdac, rvq_mod, kw)
    cfg = _native_cfg(kw)
    params = _convert(model, cfg, tmp_path)

    audio = _random_audio(cfg, n_frames)
    audio_t = torch.tensor(audio)

    # (a) encode: identical code indices + lengths
    with torch.no_grad():
        ref_codes, ref_lens = model.encode(audio_t)
    codes, lens = dac_encode(params, cfg, jnp.asarray(audio))
    np.testing.assert_array_equal(np.asarray(codes), ref_codes.numpy())
    # with audio_lengths=None the reference returns a single shared length
    # (`modded_dac.py:917-921`); ours is per-batch-element
    assert (np.asarray(lens) == int(ref_lens[0])).all()

    # (b) from_indices: waveform closeness on random (clamp-exercising) codes
    rng = np.random.default_rng(23)
    rand = np.zeros((2, 1 + kw["n_codebooks"], n_frames), dtype=np.int64)
    rand[:, 0] = rng.integers(0, kw["semantic_codebook_size"] + 4, rand.shape[-1:])
    rand[:, 1:] = rng.integers(
        0, kw["codebook_size"] + 4, (2, kw["n_codebooks"], n_frames)
    )
    with torch.no_grad():
        # the reference clamps indices IN PLACE (`rvq.py:355-361`); clone
        ref_wav = model.from_indices(torch.tensor(rand).clone())
    wav = dac_from_indices(params, cfg, jnp.asarray(rand))
    assert wav.shape == ref_wav.shape
    np.testing.assert_allclose(
        np.asarray(wav), ref_wav.numpy(), rtol=1e-3, atol=wav_atol
    )

    # (c) component-level parity on the padded batch
    t = audio.shape[-1]
    pad = math.ceil(t / cfg.frame_length) * cfg.frame_length - t
    padded = np.pad(audio, ((0, 0), (0, 0), (0, pad)))
    with torch.no_grad():
        ref_z = model.encoder(torch.tensor(padded))  # (B, D, T')
        ref_vq = model.quantizer(ref_z)
        ref_dec = model.decoder(ref_vq.z)
    z = encoder_forward(params["encoder"], cfg, jnp.asarray(padded).transpose(0, 2, 1))
    np.testing.assert_allclose(
        np.asarray(z), ref_z.numpy().transpose(0, 2, 1), rtol=RTOL, atol=ATOL
    )
    vq = downsample_rvq_encode(params["quantizer"], cfg.rvq, z)
    np.testing.assert_array_equal(np.asarray(vq["codes"]), ref_vq.codes.numpy())
    np.testing.assert_allclose(
        np.asarray(vq["z"]),
        ref_vq.z.numpy().transpose(0, 2, 1),
        rtol=1e-3,
        atol=wav_atol,
    )
    np.testing.assert_allclose(
        float(jnp.mean(vq["commitment_loss"])),
        float(ref_vq.commitment_loss),
        rtol=1e-3,
    )
    np.testing.assert_allclose(
        float(jnp.mean(vq["codebook_loss"])),
        float(ref_vq.codebook_loss),
        rtol=1e-3,
    )
    dec = decoder_forward(params["decoder"], cfg, vq["z"])
    np.testing.assert_allclose(
        np.asarray(dec).transpose(0, 2, 1), ref_dec.numpy(), rtol=1e-3, atol=wav_atol
    )

    # (d) round trip: encode -> from_indices through both frameworks
    with torch.no_grad():
        ref_rt = model.from_indices(ref_codes.clone())
    rt = dac_from_indices(params, cfg, codes)
    np.testing.assert_allclose(
        np.asarray(rt), ref_rt.numpy(), rtol=1e-3, atol=wav_atol
    )
    return model


def test_tiny_codec_parity(ref_dac, tmp_path):
    """Conv + snake + RVQ + down/upsample glue, no transformers."""
    _run_parity(ref_dac, tmp_path, TINY, n_frames=10, wav_atol=5e-4)


@pytest.mark.slow
def test_s2pro_shape_codec_parity(ref_dac, tmp_path):
    """The production layout (modded_dac_vq.yaml) at reduced width: encoder
    transformer, banded-window pre/post transformers, 9+1 codebooks."""
    model = _run_parity(ref_dac, tmp_path, S2PRO_SHAPE, n_frames=6, wav_atol=8e-4)
    # (e) the declared decoder transformer contributes NO parameters
    assert not any(
        "transformer" in k or "layers" in k.split("decoder.", 1)[-1]
        for k in model.state_dict()
        if k.startswith("decoder.")
    ), "decoder transformer unexpectedly registered parameters"


def test_semantic_quantizer_has_no_dropout(ref_dac, tmp_path):
    """The semantic RVQ is built with quantizer_dropout=0.0 (`rvq.py:226-233`)
    regardless of the residual dropout setting — pin that structural fact."""
    mdac, rvq_mod = ref_dac
    model = _build_ref_codec(mdac, rvq_mod, TINY)
    assert model.quantizer.semantic_quantizer.quantizer_dropout == 0.0
    assert model.quantizer.quantizer.quantizer_dropout == 0.5
