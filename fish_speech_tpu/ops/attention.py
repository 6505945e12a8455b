"""Attention ops in (B, T, H, D) layout (no transposes; XLA/MXU-friendly).

A plain einsum attention with fp32 softmax. The Pallas flash kernels in
`fish_speech_tpu.ops.pallas` plug in behind the same signature on TPU.
"""

import math

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-negative instead of -inf: avoids NaN rows when a
# query has no visible keys (fully masked rows softmax to uniform garbage that
# is itself masked downstream)


def gqa_attention(q, k, v, mask=None, scale=None):
    """Grouped-query attention.

    Args:
      q: (B, T, H, D)
      k, v: (B, S, Hkv, D) with H % Hkv == 0
      mask: bool, broadcastable to (B, T, S) or (T, S); True = attend.
      scale: defaults to 1/sqrt(D).

    Returns: (B, T, H, D) in q's dtype.
    """
    b, t, h, d = q.shape
    s, hkv = k.shape[1], k.shape[2]
    g = h // hkv
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    qg = q.reshape(b, t, hkv, g, d)
    scores = jnp.einsum(
        "btkgd,bskd->bkgts", qg, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if mask is not None:
        while mask.ndim < 3:
            mask = mask[None]
        # (B?, T, S) -> (B?, 1, 1, T, S)
        mask = mask[:, None, None, :, :]
        scores = jnp.where(mask, scores, NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bkgts,bskd->btkgd", weights, v)
    return out.reshape(b, t, h, d).astype(q.dtype)


def causal_mask(t: int, dtype=bool):
    i = jnp.arange(t)[:, None]
    j = jnp.arange(t)[None, :]
    return (j <= i).astype(dtype)


def windowed_causal_mask(t: int, window: int):
    """Causal band: position i attends [max(0, i-window+1), i].

    Matches `modded_dac.py:380-398` without materializing a max_len^2 buffer.
    """
    i = jnp.arange(t)[:, None]
    j = jnp.arange(t)[None, :]
    return (j <= i) & (j >= i - (window - 1))
