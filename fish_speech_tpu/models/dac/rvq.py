"""Residual vector quantization: semantic RVQ (1 codebook) + residual RVQ
(N codebooks) behind a x4 causal downsample, with pre/post window-limited
transformers.

Reference: `fish_speech/models/dac/rvq.py` (DownsampleResidualVectorQuantize)
plus the external descript-audio-codec `ResidualVectorQuantize` semantics it
builds on: each VectorQuantize projects input_dim -> codebook_dim (1x1 conv),
finds the nearest codebook entry by L2-normalized distance, and projects back;
the residual chain subtracts the *projected-back* quantized vector.

Channels-last (B, T, C) throughout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fish_speech_tpu.config import RVQConfig
from fish_speech_tpu.models.dac.conv import (
    causal_conv1d,
    causal_conv_transpose1d,
    init_conv,
    init_conv_transpose,
    layer_norm,
)
from fish_speech_tpu.models.dac.transformer import (
    codec_transformer,
    init_codec_transformer,
)

# ---------------------------------------------------------------------------
# Single vector quantizer (descript-style)
# ---------------------------------------------------------------------------


def init_vq(key, input_dim, codebook_size, codebook_dim, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "in_proj": {
            "w": (jax.random.normal(k1, (input_dim, codebook_dim), jnp.float32) * 0.02).astype(dtype),
            "b": jnp.zeros((codebook_dim,), dtype),
        },
        "out_proj": {
            "w": (jax.random.normal(k2, (codebook_dim, input_dim), jnp.float32) * 0.02).astype(dtype),
            "b": jnp.zeros((input_dim,), dtype),
        },
        "codebook": jax.random.normal(k3, (codebook_size, codebook_dim), jnp.float32).astype(dtype),
    }


def vq_encode(params, z):
    """Quantize z (B, T, D).

    Returns dict: z_q (B,T,D) straight-through + out-projected, codes (B,T),
    latents z_e (B,T,d), commitment/codebook losses (B,).
    """
    z_e = z @ params["in_proj"]["w"] + params["in_proj"]["b"]  # (B,T,d)
    codebook = params["codebook"]

    # nearest neighbour under L2-normalized euclidean distance
    e = _l2_normalize(z_e.astype(jnp.float32))
    c = _l2_normalize(codebook.astype(jnp.float32))
    # dist = 2 - 2 e.c (monotonic in -e.c); argmin dist == argmax similarity
    sim = jnp.einsum("btd,kd->btk", e, c)
    codes = jnp.argmax(sim, axis=-1).astype(jnp.int32)

    z_q_latent = jnp.take(codebook, codes, axis=0)  # raw codebook rows

    z_ef = z_e.astype(jnp.float32)
    z_qf = z_q_latent.astype(jnp.float32)
    commitment = jnp.mean((z_ef - jax.lax.stop_gradient(z_qf)) ** 2, axis=(1, 2))
    codebook_loss = jnp.mean((z_qf - jax.lax.stop_gradient(z_ef)) ** 2, axis=(1, 2))

    # straight-through estimator
    z_q_st = z_e + jax.lax.stop_gradient(z_q_latent.astype(z_e.dtype) - z_e)
    z_q = z_q_st @ params["out_proj"]["w"] + params["out_proj"]["b"]
    return {
        "z_q": z_q,
        "codes": codes,
        "latents": z_e,
        "commitment_loss": commitment,
        "codebook_loss": codebook_loss,
    }


def vq_decode(params, codes):
    """codes (B, T) -> (B, T, D)."""
    z = jnp.take(params["codebook"], codes, axis=0)
    return z @ params["out_proj"]["w"] + params["out_proj"]["b"]


def _l2_normalize(x, eps=1e-12):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


# ---------------------------------------------------------------------------
# Residual VQ
# ---------------------------------------------------------------------------


def init_rvq_stack(key, input_dim, n_codebooks, codebook_size, codebook_dim,
                   dtype=jnp.float32):
    keys = jax.random.split(key, n_codebooks)
    return [
        init_vq(k, input_dim, codebook_size, codebook_dim, dtype) for k in keys
    ]


def rvq_encode(stack, z, n_active=None, dropout_mask=None):
    """Residual quantization. z: (B, T, D).

    Args:
      n_active: optional int — use only the first n codebooks (eval).
      dropout_mask: optional (B, len(stack)) float mask for quantizer dropout
        during training (1 = active).

    Returns dict with z_q, codes (B, N, T), latents (B, T, N*d), losses (B,).
    """
    z_q = jnp.zeros_like(z)
    residual = z
    codes, latents = [], []
    commitment = 0.0
    codebook_loss = 0.0
    for i, vq in enumerate(stack):
        if n_active is not None and i >= n_active:
            break
        r = vq_encode(vq, residual)
        if dropout_mask is not None:
            m = dropout_mask[:, i][:, None, None].astype(z_q.dtype)
            z_q = z_q + r["z_q"] * m
            ml = dropout_mask[:, i].astype(jnp.float32)
            commitment = commitment + r["commitment_loss"] * ml
            codebook_loss = codebook_loss + r["codebook_loss"] * ml
        else:
            z_q = z_q + r["z_q"]
            commitment = commitment + r["commitment_loss"]
            codebook_loss = codebook_loss + r["codebook_loss"]
        residual = residual - r["z_q"]
        codes.append(r["codes"])
        latents.append(r["latents"])
    return {
        "z_q": z_q,
        "codes": jnp.stack(codes, axis=1),  # (B, N, T)
        "latents": jnp.concatenate(latents, axis=-1),
        "commitment_loss": commitment,
        "codebook_loss": codebook_loss,
    }


def rvq_decode(stack, codes):
    """codes (B, N, T) -> (B, T, D) summed over codebooks."""
    z_q = None
    for i, vq in enumerate(stack):
        zi = vq_decode(vq, codes[:, i])
        z_q = zi if z_q is None else z_q + zi
    return z_q


# ---------------------------------------------------------------------------
# ConvNeXt block (used in the down/upsample stacks)
# ---------------------------------------------------------------------------


def init_convnext(key, dim, mlp_ratio=4.0, kernel=7, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    hidden = int(mlp_ratio * dim)
    return {
        "dwconv": init_conv(k1, kernel, 1, dim, dtype=dtype),  # depthwise
        "norm_w": jnp.ones((dim,), dtype),
        "norm_b": jnp.zeros((dim,), dtype),
        "pw1": {
            "w": (jax.random.normal(k2, (dim, hidden), jnp.float32) * 0.02).astype(dtype),
            "b": jnp.zeros((hidden,), dtype),
        },
        "pw2": {
            "w": (jax.random.normal(k3, (hidden, dim), jnp.float32) * 0.02).astype(dtype),
            "b": jnp.zeros((dim,), dtype),
        },
        "gamma": jnp.full((dim,), 1e-6, dtype),
    }


def convnext_block(params, x):
    """x: (B, T, C). Causal depthwise conv k7 -> LN -> MLP -> layer scale."""
    inp = x
    c = x.shape[-1]
    x = causal_conv1d(x, params["dwconv"]["w"], params["dwconv"]["b"], groups=c)
    x = layer_norm(x, params["norm_w"], params["norm_b"], eps=1e-6)
    x = x @ params["pw1"]["w"] + params["pw1"]["b"]
    x = jax.nn.gelu(x, approximate=False)
    x = x @ params["pw2"]["w"] + params["pw2"]["b"]
    x = x * params["gamma"]
    return inp + x


# ---------------------------------------------------------------------------
# DownsampleResidualVectorQuantize
# ---------------------------------------------------------------------------


def init_downsample_rvq(key, cfg: RVQConfig, dtype=jnp.float32):
    keys = jax.random.split(key, 10)
    d = cfg.input_dim
    params = {
        "semantic": init_rvq_stack(
            keys[0], d, 1, cfg.semantic_codebook_size, cfg.codebook_dim, dtype
        ),
        "residual": init_rvq_stack(
            keys[1], d, cfg.n_codebooks, cfg.codebook_size, cfg.codebook_dim, dtype
        ),
        "downsample": [],
        "upsample": [],
    }
    dims = (d,) + tuple(d for _ in cfg.downsample_factor)
    kd = jax.random.split(keys[2], len(cfg.downsample_factor) * 2)
    for idx, f in enumerate(cfg.downsample_factor):
        params["downsample"].append(
            {
                "conv": init_conv(kd[2 * idx], f, dims[idx], dims[idx + 1], dtype=dtype),
                "convnext": init_convnext(kd[2 * idx + 1], dims[idx + 1], dtype=dtype),
            }
        )
    ku = jax.random.split(keys[3], len(cfg.downsample_factor) * 2)
    for j, (idx, f) in enumerate(reversed(list(enumerate(cfg.downsample_factor)))):
        params["upsample"].append(
            {
                "conv": init_conv_transpose(
                    ku[2 * j], f, dims[idx + 1], dims[idx], dtype=dtype
                ),
                "convnext": init_convnext(ku[2 * j + 1], dims[idx], dtype=dtype),
            }
        )
    if cfg.pre_transformer is not None:
        params["pre"] = init_codec_transformer(
            keys[4], cfg.pre_transformer, d, dtype=dtype
        )
    if cfg.post_transformer is not None:
        params["post"] = init_codec_transformer(
            keys[5], cfg.post_transformer, d, dtype=dtype
        )
    return params


def _downsample(params, cfg: RVQConfig, z):
    for stage, f in zip(params["downsample"], cfg.downsample_factor):
        z = causal_conv1d(z, stage["conv"]["w"], stage["conv"]["b"], stride=f)
        z = convnext_block(stage["convnext"], z)
    return z


def _upsample(params, cfg: RVQConfig, z):
    factors = list(reversed(cfg.downsample_factor))
    for stage, f in zip(params["upsample"], factors):
        z = causal_conv_transpose1d(z, stage["conv"]["w"], stage["conv"]["b"], stride=f)
        z = convnext_block(stage["convnext"], z)
    return z


def downsample_rvq_encode(params, cfg: RVQConfig, z, n_active=None, key=None):
    """Full quantizer forward. z: (B, T, D) at the encoder frame rate.

    Returns dict: z (B, T, D) reconstructed (padded/cropped to input length),
    codes (B, 1+N, T/downsample), losses.

    Quantizer dropout (training): when `key` is given, each sample uses a
    random number of residual codebooks with prob `quantizer_dropout`
    (descript semantics).
    """
    orig_t = z.shape[1]
    z = _downsample(params, cfg, z)
    if "pre" in params:
        z = codec_transformer(params["pre"], cfg.pre_transformer, z)

    sem = rvq_encode(params["semantic"], z)
    residual_in = z - sem["z_q"]

    dropout_mask = None
    if key is not None and cfg.quantizer_dropout > 0:
        b = z.shape[0]
        k1, k2 = jax.random.split(key)
        n_full = cfg.n_codebooks
        rand_n = jax.random.randint(k1, (b,), 1, n_full + 1)
        use_dropout = jax.random.uniform(k2, (b,)) < cfg.quantizer_dropout
        n_per_sample = jnp.where(use_dropout, rand_n, n_full)
        dropout_mask = (
            jnp.arange(n_full)[None, :] < n_per_sample[:, None]
        ).astype(jnp.float32)

    res = rvq_encode(params["residual"], residual_in, dropout_mask=dropout_mask)

    zq = sem["z_q"] + res["z_q"]
    codes = jnp.concatenate([sem["codes"], res["codes"]], axis=1)  # (B, 1+N, T')
    latents = jnp.concatenate([sem["latents"], res["latents"]], axis=-1)

    if "post" in params:
        zq = codec_transformer(params["post"], cfg.post_transformer, zq)
    zq = _upsample(params, cfg, zq)

    # pad/crop (on the LEFT) to the original length (`rvq.py:326-333`)
    diff = orig_t - zq.shape[1]
    if diff > 0:
        zq = jnp.pad(zq, ((0, 0), (diff, 0), (0, 0)))
    elif diff < 0:
        zq = zq[:, -diff:, :]

    return {
        "z": zq,
        "codes": codes,
        "latents": latents,
        "commitment_loss": sem["commitment_loss"] + res["commitment_loss"],
        "codebook_loss": sem["codebook_loss"] + res["codebook_loss"],
    }


def downsample_rvq_decode(params, cfg: RVQConfig, codes):
    """codes (B, 1+N, T') -> z (B, T'*downsample, D)."""
    semantic = jnp.clip(codes[:, :1], 0, cfg.semantic_codebook_size - 1)
    residual = jnp.clip(codes[:, 1:], 0, cfg.codebook_size - 1)
    z_q = rvq_decode(params["semantic"], semantic) + rvq_decode(
        params["residual"], residual
    )
    if "post" in params:
        z_q = codec_transformer(params["post"], cfg.post_transformer, z_q)
    return _upsample(params, cfg, z_q)
