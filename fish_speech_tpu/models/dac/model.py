"""Modded-DAC codec: causal conv encoder -> semantic+residual RVQ -> causal
conv decoder, 44.1 kHz, ~21.5 tokens/s.

Reference: `fish_speech/models/dac/modded_dac.py` (DAC / Encoder / Decoder /
EncoderBlock / DecoderBlock / ResidualUnit). Channels-last (B, T, C); the
public API keeps the reference's (B, 1, T) audio and (B, N, T') code shapes.

Note: the reference's decoder "transformer layers" config is dead — the
module is constructed but never wired into the decoder Sequential nor
registered (`modded_dac.py:741-742`), so real checkpoints have no such
weights and this implementation omits them.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from fish_speech_tpu.config import CodecTransformerConfig, DACConfig
from fish_speech_tpu.models.dac.conv import (
    causal_conv1d,
    causal_conv_transpose1d,
    init_conv,
    init_conv_transpose,
    snake,
)
from fish_speech_tpu.models.dac.rvq import (
    downsample_rvq_decode,
    downsample_rvq_encode,
    init_downsample_rvq,
)
from fish_speech_tpu.models.dac.transformer import (
    codec_transformer,
    init_codec_transformer,
)

# ---------------------------------------------------------------------------
# Residual unit
# ---------------------------------------------------------------------------


def init_residual_unit(key, dim, dilation, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "alpha1": jnp.ones((dim,), dtype),
        "conv1": init_conv(k1, 7, dim, dim, dtype=dtype),
        "alpha2": jnp.ones((dim,), dtype),
        "conv2": init_conv(k2, 1, dim, dim, dtype=dtype),
    }


def residual_unit(params, x, dilation):
    y = snake(x, params["alpha1"])
    y = causal_conv1d(y, params["conv1"]["w"], params["conv1"]["b"], dilation=dilation)
    y = snake(y, params["alpha2"])
    y = causal_conv1d(y, params["conv2"]["w"], params["conv2"]["b"])
    return x + y


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def init_encoder(key, cfg: DACConfig, dtype=jnp.float32):
    keys = jax.random.split(key, 2 + len(cfg.encoder_rates))
    d = cfg.encoder_dim
    params = {"conv_in": init_conv(keys[0], 7, 1, d, dtype=dtype), "blocks": []}
    for bi, (stride, n_t) in enumerate(
        zip(cfg.encoder_rates, cfg.encoder_transformer_layers)
    ):
        d_out = d * 2
        bkeys = jax.random.split(keys[1 + bi], 6)
        block = {
            "units": [
                init_residual_unit(bkeys[i], d, dil, dtype)
                for i, dil in enumerate((1, 3, 9))
            ],
            "alpha": jnp.ones((d,), dtype),
            "conv": init_conv(bkeys[3], 2 * stride, d, d_out, dtype=dtype),
        }
        if n_t > 0:
            tcfg = _encoder_block_tcfg(cfg, d_out, n_t)
            block["transformer"] = init_codec_transformer(
                bkeys[4], tcfg, d_out, dtype=dtype
            )
        params["blocks"].append(block)
        d = d_out
    params["alpha_out"] = jnp.ones((d,), dtype)
    params["conv_out"] = init_conv(
        keys[-1], 3, d, cfg.resolved_latent_dim, dtype=dtype
    )
    return params


def _encoder_block_tcfg(cfg: DACConfig, d_out: int, n_t: int):
    """Per-block transformer config (`modded_dac.py:638-649`): n_head =
    dim // 64, intermediate = 3*dim, encoder window size."""
    return CodecTransformerConfig(
        n_layer=n_t,
        n_head=max(d_out // 64, 1),
        dim=d_out,
        intermediate_size=d_out * 3,
        head_dim=64 if d_out >= 64 else d_out,
        window_size=cfg.encoder_transformer_window,
    ).resolve()


def encoder_forward(params, cfg: DACConfig, x):
    """x: (B, T, 1) audio -> (B, T/hop, latent_dim)."""
    x = causal_conv1d(x, params["conv_in"]["w"], params["conv_in"]["b"])
    d = cfg.encoder_dim
    for block, stride, n_t in zip(
        params["blocks"], cfg.encoder_rates, cfg.encoder_transformer_layers
    ):
        d *= 2
        for unit, dil in zip(block["units"], (1, 3, 9)):
            x = residual_unit(unit, x, dil)
        x = snake(x, block["alpha"])
        x = causal_conv1d(x, block["conv"]["w"], block["conv"]["b"], stride=stride)
        if "transformer" in block:
            x = codec_transformer(
                block["transformer"], _encoder_block_tcfg(cfg, d, n_t), x
            )
    x = snake(x, params["alpha_out"])
    return causal_conv1d(x, params["conv_out"]["w"], params["conv_out"]["b"])


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def init_decoder(key, cfg: DACConfig, dtype=jnp.float32):
    keys = jax.random.split(key, 2 + len(cfg.decoder_rates))
    channels = cfg.decoder_dim
    params = {
        "conv_in": init_conv(keys[0], 7, cfg.resolved_latent_dim, channels, dtype=dtype),
        "blocks": [],
    }
    for i, stride in enumerate(cfg.decoder_rates):
        d_in = channels // (2**i)
        d_out = channels // (2 ** (i + 1))
        bkeys = jax.random.split(keys[1 + i], 4)
        params["blocks"].append(
            {
                "alpha": jnp.ones((d_in,), dtype),
                "conv": init_conv_transpose(bkeys[0], 2 * stride, d_in, d_out, dtype=dtype),
                "units": [
                    init_residual_unit(bkeys[1 + j], d_out, dil, dtype)
                    for j, dil in enumerate((1, 3, 9))
                ],
            }
        )
    params["alpha_out"] = jnp.ones((d_out,), dtype)
    params["conv_out"] = init_conv(keys[-1], 7, d_out, 1, dtype=dtype)
    return params


def decoder_forward(params, cfg: DACConfig, z):
    """z: (B, T', latent) -> (B, T'*hop, 1) waveform in [-1, 1]."""
    x = causal_conv1d(z, params["conv_in"]["w"], params["conv_in"]["b"])
    for block, stride in zip(params["blocks"], cfg.decoder_rates):
        x = snake(x, block["alpha"])
        x = causal_conv_transpose1d(
            x, block["conv"]["w"], block["conv"]["b"], stride=stride
        )
        for unit, dil in zip(block["units"], (1, 3, 9)):
            x = residual_unit(unit, x, dil)
    x = snake(x, params["alpha_out"])
    x = causal_conv1d(x, params["conv_out"]["w"], params["conv_out"]["b"])
    return jnp.tanh(x)


# ---------------------------------------------------------------------------
# Full codec
# ---------------------------------------------------------------------------


def init_dac(key, cfg: DACConfig, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "encoder": init_encoder(k1, cfg, dtype),
        "quantizer": init_downsample_rvq(k2, cfg.rvq, dtype),
        "decoder": init_decoder(k3, cfg, dtype),
    }


def dac_encode(params, cfg: DACConfig, audio, audio_lengths=None):
    """Encode audio to codes.

    Args:
      audio: (B, 1, T) or (B, T) waveform.
      audio_lengths: optional (B,) true lengths.

    Returns (codes (B, 1+N, T'), code_lengths (B,)).
    Reference: `modded_dac.py:874-923` — pad to a frame_length multiple,
    token count = ceil(len / frame_length).
    """
    if audio.ndim == 3:
        audio = audio[:, 0, :]
    b, t = audio.shape
    right_pad = math.ceil(t / cfg.frame_length) * cfg.frame_length - t
    x = jnp.pad(audio, ((0, 0), (0, right_pad)))[..., None]  # (B, T, 1)
    if audio_lengths is None:
        audio_lengths = jnp.full((b,), t + right_pad, dtype=jnp.int32)

    z = encoder_forward(params["encoder"], cfg, x)
    result = downsample_rvq_encode(params["quantizer"], cfg.rvq, z)
    code_lengths = jnp.ceil(audio_lengths / cfg.frame_length).astype(jnp.int32)
    return result["codes"], code_lengths


def dac_from_indices(params, cfg: DACConfig, codes):
    """codes (B, 1+N, T') -> audio (B, 1, T'*frame_length)."""
    z = downsample_rvq_decode(params["quantizer"], cfg.rvq, codes)
    audio = decoder_forward(params["decoder"], cfg, z)
    return jnp.transpose(audio, (0, 2, 1))  # (B, 1, T)


def dac_decode(params, cfg: DACConfig, z):
    """Latent (B, T', D) -> audio (B, 1, T)."""
    audio = decoder_forward(params["decoder"], cfg, z)
    return jnp.transpose(audio, (0, 2, 1))


def dac_forward(params, cfg: DACConfig, audio, key=None):
    """Training-style round trip: audio -> codes -> audio + VQ losses."""
    if audio.ndim == 3:
        audio = audio[:, 0, :]
    t = audio.shape[-1]
    right_pad = math.ceil(t / cfg.hop_length) * cfg.hop_length - t
    x = jnp.pad(audio, ((0, 0), (0, right_pad)))[..., None]
    z = encoder_forward(params["encoder"], cfg, x)
    result = downsample_rvq_encode(params["quantizer"], cfg.rvq, z, key=key)
    audio_out = decoder_forward(params["decoder"], cfg, result["z"])
    return jnp.transpose(audio_out, (0, 2, 1))[..., :t], result
